package graft

import org.apache.spark.sql.functions._
import graft.ext.{Sampling, SkewJoin}

/** Sampling / splitting / skew-join invariants. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("assignSplit: partitioning-invariant, exhaustive, ~80/10/10") {
    val a = Sampling.assignSplit(docs).select("doc_id", "split")
    val b = Sampling.assignSplit(docs.repartition(7)).select("doc_id", "split")
    assert(a.collect().toSet == b.collect().toSet,
      "split must not depend on physical layout")
    val byPct = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(byPct.values.sum == n.toLong, "every row gets a split")
    assert(math.abs(byPct("train") / n - 0.8) < 0.1, byPct.toString)
    assert(byPct.keySet == Set("train", "val", "test"))
  }

  test("leakageSafeSplit: clusters split atomically, unpaired docs match assignSplit") {
    import spark.implicits._
    val docs = (0L to 99L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // pair graph: {1,2,3} chained, {40,41} — clusters keyed at 1 and 40
    val pairs = Seq((1L, 2L), (2L, 3L), (40L, 41L)).toDF("a_id", "b_id")
    val out = Sampling.leakageSafeSplit(docs, pairs)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 100)
    assert(out(1L) == out(2L) && out(2L) == out(3L), "cluster {1,2,3} splits together")
    assert(out(40L) == out(41L), "cluster {40,41} splits together")
    val plain = Sampling.assignSplit(docs)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clustered = Set(1L, 2L, 3L, 40L, 41L)
    out.filterNot(kv => clustered(kv._1)).foreach { case (id, s) =>
      assert(s == plain(id), s"unpaired doc $id must split as assignSplit")
    }
    // clustered docs take the CLUSTER key's split
    assert(out(2L) == plain(1L) && out(41L) == plain(40L))
  }

  test("stratifiedSample: per-stratum fractions honored, others dropped") {
    val out = Sampling.stratifiedSample(docs, "lang",
      Map("en" -> 1.0, "de" -> 0.0))
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"), s"only en at fraction 1.0 survives: $langs")
    assert(out.count() == docs.where(col("lang") === "en").count())
  }

  test("kfold: exhaustive, roughly balanced, clusters share folds") {
    import spark.implicits._
    val d = (0L to 199L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 51L)).toDF("a_id", "b_id")
    val out = Sampling.leakageSafeKfold(d, pairs, k = 5)
      .select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.size == 200 && out.values.toSet.subsetOf((0 until 5).toSet))
    // every fold populated, none dominant
    val sizes = out.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 5 && sizes.values.forall(s => s > 15 && s < 70))
    // near-dup clusters land in one fold
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(50L) == out(51L))
  }

  test("mixtureSample: output tracks target proportions, zero-weight groups dropped, layout-invariant") {
    val weights = Map("src0" -> 5, "src1" -> 3, "src2" -> 2)
    val out = Sampling.mixtureSample(docs, "source", weights)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet == weights.keySet,
      s"unweighted sources must be dropped: ${bySrc.keySet}")
    // output proportions approximate 5:3:2 (hash granularity 1/10000,
    // small-group noise allowed)
    val total = bySrc.values.sum.toDouble
    assert(math.abs(bySrc("src0") / total - 0.5) < 0.15, bySrc.toString)
    assert(math.abs(bySrc("src1") / total - 0.3) < 0.15, bySrc.toString)
    // no upsampling: each group's sample is a subset of its input
    weights.keys.foreach { s =>
      assert(bySrc(s) <= docs.where(col("source") === s).count())
    }
    // repartition-invariant (the keep rule is pure row arithmetic)
    val b = Sampling.mixtureSample(docs.repartition(7), "source", weights)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      b.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("saltedInner == plain inner join (salting is result-invariant)") {
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val r = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val salted = SkewJoin.saltedInner(l, r, "l_orderkey", salts = 5)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = l.join(r, "l_orderkey")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
  }

  test("packShards: budget-bounded exclusive prefix sums per bucket") {
    import spark.implicits._
    // one bucket (ids ≡ 0 mod 8): docs of 1000 tokens each, budget 2048
    // exclusive cumsum: 0,1000,2000,3000,4000 → shards 0,0,0,1,1
    val docs = Seq(0L, 8L, 16L, 24L, 32L).map(id => (id, 1000))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.packShards(docs, "n_tokens", budget = 2048, nBuckets = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((0L, 0L, 0L), (8L, 0L, 0L), (16L, 0L, 0L),
      (24L, 0L, 1L), (32L, 0L, 1L)))
    // buckets are independent: same ids shifted into bucket 1 restart at shard 0
    val mixed = (Seq(0L, 8L) ++ Seq(1L, 9L)).map(id => (id, 2000))
      .toDF("doc_id", "n_tokens")
    val m = Sampling.packShards(mixed, "n_tokens", budget = 2048, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(m == Seq((0L, 0L, 0L), (1L, 1L, 0L), (8L, 0L, 0L), (9L, 1L, 0L)))
  }

  test("packShards: default bucket fan-out tracks session parallelism") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val docs = (0L until (par * 4L)).map(id => (id, 100)).toDF("doc_id", "n_tokens")
    val nBuckets = Sampling.packShards(docs, "n_tokens", budget = 1000)
      .select("pack_bucket").distinct().count()
    assert(nBuckets == par.toLong,
      s"default fan-out must equal defaultParallelism ($par), got $nBuckets")
  }

  test("packShards: layout-invariant (repartition changes nothing)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.packShards(df, "n_tokens", budget = 2048)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(17)))
  }

  test("saltedInnerHotKeys == plain join on skewed data; salts only hot keys") {
    import spark.implicits._
    // key 1 holds 90% of the left rows (hot); keys 2..50 one row each
    val l = ((1 to 450).map(i => (1L, i)) ++ (2 to 50).map(k => (k.toLong, k)))
      .toDF("k", "payload")
    val r = (1 to 50).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val salted = SkewJoin.saltedInnerHotKeys(l, r, "k", salts = 4)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = l.join(r, "k")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
    // empty left must not blow up the mean computation
    assert(SkewJoin.saltedInnerHotKeys(l.limit(0), r, "k").count() == 0)
  }

  test("saltedInnerHotKeys: sampled hot-key detection, result-invariant") {
    import spark.implicits._
    val l = ((1 to 2000).map(i => (1L, i)) ++ (2 to 400).map(k => (k.toLong, k)))
      .toDF("k", "payload")
    val r = (1 to 400).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val sampled = SkewJoin.saltedInnerHotKeys(l, r, "k", salts = 4,
      sampleFraction = 0.1)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = l.join(r, "k")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(sampled == plain)
  }

  test("saltedInnerHotKeys: >100 hot keys switch to a broadcast flag join") {
    import spark.implicits._
    // 120 hot keys of 50 IDENTICAL rows each (the worst case for a
    // row-content-hash salt) over a one-row-per-key cold tail
    val l = ((1 to 120).flatMap(k => Seq.fill(50)((k.toLong, "dup"))) ++
      (121 to 3000).map(k => (k.toLong, "cold"))).toDF("k", "payload")
    val r = (1 to 3000).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val df = SkewJoin.saltedInnerHotKeys(l, r, "k", salts = 4)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"hot-key flag must be a broadcast join, not an IN literal:\n${p.take(1500)}")
    assert(!p.contains(" IN ("),
      "no giant IN-literal predicate in the many-hot-keys plan")
    val salted = df.collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    val plain = l.join(r, "k").collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
  }

  test("splitLeakageAudit: conserves pairs; cluster-keyed split has zero leaks") {
    val pairs = graft.ext.Dedup.minhashLshPairsPortable(docs)
    val nPairs = pairs.count()
    val naive = Sampling.splitLeakageAudit(
      Sampling.assignSplit(docs).select("doc_id", "split"), pairs).collect()
    assert(naive.map(_.getAs[Long]("n_pairs")).sum == nPairs,
      "every pair lands in exactly one split combination")
    val safe = Sampling.splitLeakageAudit(
      Sampling.leakageSafeSplit(docs, pairs).select("doc_id", "split"),
      pairs).collect()
    assert(safe.forall(!_.getAs[Boolean]("leaky")),
      "cluster-keyed split must produce zero cross-split near-dup pairs")
    assert(safe.map(_.getAs[Long]("n_pairs")).sum == nPairs)
  }

  test("lengthBatches: batches fill in length order, padding formula exact") {
    import spark.implicits._
    // lengths 1..10, batchSize 4 -> batches [1,2,3,4] [5,6,7,8] [9,10]
    val df = (1L to 10L).map(i => (i, i.toInt)).toDF("doc_id", "n_tokens")
    val got = Sampling.lengthBatches(df, batchSize = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got(0L) == ((4L, 4L, 10L, 6L)))   // max 4, sum 10, pad 4*4-10
    assert(got(1L) == ((4L, 8L, 26L, 6L)))   // 5+6+7+8
    assert(got(2L) == ((2L, 10L, 19L, 1L)))  // partial tail: 9+10
  }

  test("lengthBatches: layout-invariant and conserves docs on real data") {
    val df = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    val a = Sampling.lengthBatches(df).collect().map(_.toSeq).toSet
    val b = Sampling.lengthBatches(df.repartition(7)).collect().map(_.toSeq).toSet
    assert(a == b, "batch report must not depend on physical layout")
    val total = Sampling.lengthBatches(df).agg(sum("n_docs")).head.getLong(0)
    assert(total == docs.count())
  }

  test("systematicSample: selects exactly the docs whose span covers a multiple") {
    import spark.implicits._
    val df = (0L until 20L).map(i => (i, 7L)).toDF("doc_id", "n_tokens")
    val every = 10L
    val got = Sampling.systematicSample(df, every).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    // recompute expectation on the driver in the same (bucket, id) order
    val order = (0L until 20L).sortBy(i => (((i % 1000003L) * 2654435761L) % 64L, i))
    var pos = 0L
    val expect = scala.collection.mutable.Map.empty[Long, Long]
    order.foreach { id =>
      val r = pos % every
      if (r == 0 || r + 7 > every) expect(id) = pos
      pos += 7
    }
    assert(got == expect.toMap)
    // token-proportional size: 20*7=140 tokens / 10 = 14 multiples,
    // each doc spans at most one extra multiple -> |sample| in [7,14]
    assert(got.size >= 7 && got.size <= 14)
  }

  test("systematicSample: a giant doc cannot be missed, zero-length docs never picked mid-stride") {
    import spark.implicits._
    val df = Seq((0L, 3L), (1L, 100L), (2L, 3L)).toDF("doc_id", "n_tokens")
    val got = Sampling.systematicSample(df, every = 50L).collect()
      .map(_.getLong(0)).toSet
    assert(got.contains(1L), "a doc longer than the stride always samples")
  }

  test("weightedSample: A-ES keys reproduce exactly, heavy class dominates, layout-invariant") {
    import spark.implicits._
    val rows = (0L until 2000L).map(i => (i, if (i % 2 == 0) 100L else 1L))
    val df = rows.toDF("doc_id", "weight")
    val got = Sampling.weightedSample(df, "weight", 50).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sample_rank")))
    // independent reference implementation of the identical contract
    // (BigDecimal HALF_UP = Spark round's half-away-from-zero)
    def key(id: Long, w: Long): Double = {
      val b = ((id % 1000003L) * 2654435761L) % 1000000L
      BigDecimal(math.log((b + 1) / 1000000.0) * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong.toDouble / w
    }
    val exp = rows.sortBy { case (id, w) => (-key(id, w), id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => (id, (i + 1).toLong) }
    assert(got.sortBy(_._2).toSeq == exp, "engine must reproduce the A-ES ranking")
    // selection pressure: the weight-100 class must dominate the top-50
    val heavy = got.count(_._1 % 2 == 0)
    assert(heavy >= 40, s"heavy class should dominate, got $heavy/50")
    // repartition-invariance (the rand()-free contract)
    val re = Sampling.weightedSample(df.repartition(7), "weight", 50).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sample_rank"))).toSet
    assert(re == got.toSet)
  }

  test("weightedSampleByGroup: per-group quotas, same key contract, WindowGroupLimit") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, s"g${i % 3}", 1L + (i % 7)))
    val df = rows.toDF("doc_id", "grp", "weight")
    val q = Sampling.weightedSampleByGroup(df, "grp", "weight", 5)
    val got = q.collect().map(r => (r.getAs[String]("grp"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("sample_rank")))
    assert(got.groupBy(_._1).forall(_._2.length == 5), "each group keeps exactly k")
    def key(id: Long, w: Long): Double = {
      val b = ((id % 1000003L) * 2654435761L) % 1000000L
      BigDecimal(math.log((b + 1) / 1000000.0) * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong.toDouble / w
    }
    val exp = rows.groupBy(_._2).flatMap { case (g, rs) =>
      rs.sortBy { case (id, _, w) => (-key(id, w), id) }.take(5)
        .zipWithIndex.map { case ((id, _, _), i) => (g, id, (i + 1).toLong) }
    }.toSet
    assert(got.toSet == exp, "per-group ranking must match the reference")
    // the per-group top-k must prune map-side, not sort each group fully
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "per-group cut must be WindowGroupLimit-pruned")
  }

  test("epochsReport: integer floor requests, epoch ratios, zero-weight group visible") {
    import spark.implicits._
    val df = Seq((1L, "sA", 100L), (2L, "sA", 50L), (3L, "sB", 300L),
      (4L, "sC", 10L)).toDF("doc_id", "src", "n_tokens")
    val r = Sampling.epochsReport(df, "src", Map("sA" -> 2, "sB" -> 1),
      budget = 900L).collect()
      .map(x => x.getString(0) -> ((x.getAs[Long]("w"),
        x.getAs[Long]("n_tokens_available"),
        x.getAs[Long]("n_tokens_requested"),
        x.getAs[Double]("epochs")))).toMap
    // W=3: sA asked 900*2/3 = 600, has 150 -> 4 epochs (repetition!)
    assert(r("sA") == ((2L, 150L, 600L, 4.0)), r.toString)
    assert(r("sB") == ((1L, 300L, 300L, 1.0)), r.toString)
    // unweighted group stays visible with zero request
    assert(r("sC") == ((0L, 10L, 0L, 0.0)), r.toString)
  }

  test("negativeSamples: stride negatives are balanced, never self") {
    import spark.implicits._
    val df = (0L until 10L).map(i => Tuple1(i * 7)).toList.toDF("doc_id") // gappy ids
    val out = Sampling.negativeSamples(df, numNeg = 2).collect()
    assert(out.length == 20)
    // never the anchor itself
    assert(out.forall(r => r.getLong(0) != r.getAs[Long]("neg_doc_id")))
    // every doc serves as a negative exactly numNeg times (permutation per j)
    val asNeg = out.groupBy(_.getAs[Long]("neg_doc_id")).map(_._2.length)
    assert(asNeg.forall(_ == 2))
    // N=10, step=floor(10/3)=3: pos p's negatives sit at (p+3)%10, (p+6)%10
    val byDoc = out.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getAs[Long]("neg_rank")).map(_.getAs[Long]("neg_doc_id")).toSeq)
    assert(byDoc(0L) == Seq(21L, 42L))   // pos 0 -> pos 3 (id 21), pos 6 (id 42)
    assert(byDoc(63L) == Seq(14L, 35L))  // pos 9 -> pos 2 (id 14), pos 5 (id 35)
  }
}
