package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.ingest.{Compaction, Fixtures}

/** Scale-path operators: IVF ANN recall vs brute force, landing-zone
  * compaction, HLL vocabulary sketch error. */
class ScaleOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("ivfAssign: every vector lands in exactly one existing cell") {
    val assigned = Similarity.ivfAssign(emb, centroidMod = 10)
    assert(assigned.count() == emb.count())
    val cells = assigned.select("cell").distinct().collect().map(_.getLong(0)).toSet
    val cents = emb.where(col("vec_id") % 10 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(cents), "cells must be centroid ids")
  }

  test("kmeansAssign: separated blobs cluster together, exhaustive, layout-invariant") {
    // two tight blobs far apart; init = 2 lowest ids, one in each blob
    val blobA = (0L to 4L).map(i => (i, Seq(1.0f, 1.0f, 0.0f + i * 0.001f)))
    val blobB = (5L to 9L).map(i => (i, Seq(-1.0f, -1.0f, 0.0f + i * 0.001f)))
    // id 1 sits in blob B so init centroids {0, 1} straddle both blobs
    val rows = (blobA.take(1) ++ Seq((1L, Seq(-1.0f, -1.0f, 0.1f))) ++
      blobA.drop(2) ++ blobB).sortBy(_._1)
    val docs = rows.toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(docs, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == rows.size, "every vector assigned")
    val aCluster = got(0L)._1
    val bCluster = got(1L)._1
    assert(aCluster != bCluster, "two distinct clusters survive")
    Seq(2L, 3L, 4L).foreach(i => assert(got(i)._1 == aCluster, s"vec $i in blob A"))
    (5L to 9L).foreach(i => assert(got(i)._1 == bCluster, s"vec $i in blob B"))
    // distances are exact integers ≥ 0
    got.values.foreach { case (_, d) => assert(d >= 0) }
    // deterministic under repartitioning
    val rep = Similarity.kmeansAssign(docs.repartition(5), k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep == got)
  }

  test("semanticDedup: survivors = corpus minus non-min members of within-cell components") {
    val kept = Similarity.semanticDedup(emb, threshold = 0.4, centroidMod = 10)
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.subsetOf(all))
    assert(keptIds.size < all.size, "expected some semantic dedup on the fixtures")
    // independently recompute the within-cell >=0.4 pairs and union-find
    // them in the test; survivors must be exactly the component minima
    // plus everything unpaired
    val assigned = Similarity.ivfAssign(emb, centroidMod = 10)
    val a = assigned.select(col("cell"), col("vec_id").as("a_id"), col("q").as("qa"))
    val b = assigned.select(col("cell"), col("vec_id").as("b_id"), col("q").as("qb"))
    val pairs = a.join(b, "cell")
      .where(col("a_id") < col("b_id") &&
        Similarity.cosineQ(col("qa"), col("qb")) >= 0.4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should produce near-dup pairs")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    pairs.foreach { case (x, y) =>
      parent.getOrElseUpdate(x, x); parent.getOrElseUpdate(y, y)
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    val losers = parent.keys.filter(id => find(id) != id).toSet
    assert(keptIds == all -- losers)
  }

  test("ivfTopK: recall vs brute force is high at nprobe=3") {
    val probes = emb.where(col("vec_id") % 25 === 0)
    val ivf = Similarity.ivfTopK(emb, probes, k = 5, nprobe = 3, centroidMod = 10)
      .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force truth: per-probe top-5 by the same quantized cosine
    import org.apache.spark.sql.expressions.Window
    val e = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val p = probes.select(col("vec_id").as("probe_id"),
      Similarity.quantize(col("embedding")).as("pq"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cs").desc, col("vec_id").asc)
    val truth = p.crossJoin(e).where(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        Similarity.cosineQ(col("pq"), col("q")).as("cs"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"IVF recall@5 too low: $recall")
    assert(ivf.size <= truth.size, "IVF returns at most k per probe")
  }

  test("compaction: many landed JSON objects -> few parquet files, content intact") {
    val base = Files.createTempDirectory("compact").toString
    Fixtures.landBatch(spark, sf, base)
    val inDir = s"$base/topics/graft.pin/partition=0"
    val nIn = new java.io.File(inDir).listFiles().count(_.getName.endsWith(".json"))
    val nOut = Compaction.compactTopic(spark, inDir, s"$base/compacted")
    assert(nOut < nIn, s"must reduce file count ($nIn -> $nOut)")
    val before = Fixtures.readTopic(spark, base, "pin")
    val after = spark.read.parquet(s"$base/compacted")
    assert(after.count() == before.count())
    assert(after.columns.sorted.toSeq == before.columns.sorted.toSeq)
  }

  test("dot64 native expression == HOF formulation, and codegens") {
    val e = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .crossJoin(emb.limit(3).select(Similarity.quantize(col("embedding")).as("p")))
    val native = e.select(graft.functions.DotProduct64.dot64(col("q"), col("p")).as("d"))
    val hof = e.select(aggregate(zip_with(col("q"), col("p"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v).as("d"))
    assert(native.collect().map(_.getLong(0)).sorted.toSeq ==
      hof.collect().map(_.getLong(0)).sorted.toSeq)
    val cg = native.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(!cg.contains("Found 0 WholeStage"), cg.take(400))
  }

  test("simhash64 native expression == HOF formulation, and codegens") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val native = Dedup.simhash64(docs)
    val hof = Dedup.simhash64Hof(docs)
    assert(native.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      hof.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    // empty + whitespace-only text: split yields [""], both paths agree
    val edge = spark.createDataFrame(Seq((1L, ""), (2L, "   "), (3L, "one")))
      .toDF("doc_id", "text")
    assert(Dedup.simhash64(edge).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      Dedup.simhash64Hof(edge).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    val cg = native.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(!cg.contains("Found 0 WholeStage"), cg.take(400))
  }

  test("ivfAssign projection form == crossJoin+max_by aggregation form") {
    import graft.functions.DotProduct64.dot64
    // the pre-round-5 formulation: broadcast cross join + per-vector
    // max_by over (cs, -cent_id) — kept here as the semantic reference
    // for the native nearest_centroid_cos projection that replaced it
    val e = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .withColumn("nq", sqrt(dot64(col("q"), col("q")).cast("double")))
    val cents = e.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("nq").as("ncq"))
    val ref = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        (dot64(col("q"), col("cq")).cast("double") / (col("nq") * col("ncq"))).as("cs"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("cs"), (-col("cent_id")).as("nc"))).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val got = Similarity.ivfAssign(emb, centroidMod = 10)
      .select("vec_id", "cell")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == ref)
  }

  test("kmeansAssign projection form == crossJoin+min(struct) aggregation form") {
    import graft.functions.DotProduct64.dot64
    val e = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .select(col("vec_id"), col("q"), dot64(col("q"), col("q")).as("qq"))
    def assignRef(cents: org.apache.spark.sql.DataFrame) =
      e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("q"), col("cluster"),
          (col("qq") - lit(2L) * dot64(col("q"), col("cq")) + col("cqq")).as("d"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d"), col("cluster"), col("q"))).as("m"))
        .select(col("vec_id"), col("m.cluster").as("cluster"),
          col("m.d").as("dist"), col("m.q").as("q"))
    var cents = e.orderBy(col("vec_id").asc).limit(8)
      .select(col("vec_id").as("cluster"), col("q").as("cq"), col("qq").as("cqq"))
    for (_ <- 1 to 2) {
      cents = assignRef(cents)
        .select(col("cluster"), posexplode(col("q")).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .withColumn("c",
          floor(col("s").cast("double") / col("n").cast("double")).cast("long"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
          x => x.getField("c")).as("cq"))
        .select(col("cluster"), col("cq"), dot64(col("cq"), col("cq")).as("cqq"))
    }
    val ref = assignRef(cents).select("vec_id", "cluster", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val got = Similarity.kmeansAssign(emb, k = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == ref)
  }

  test("count-min token frequencies: upper-biased within eps*N of exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val probes = exact.toSeq.sortBy(-_._2).take(5).map(_._1) :+ "zz_absent_token"
    val est = graft.ext.Sketches.tokenCountMin(docs, probes, eps = 0.001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach { p =>
      val truth = exact.getOrElse(p, 0L)
      assert(est(p) >= truth, s"CMS must never undercount: $p")
      assert(est(p) <= truth + (0.001 * n).ceil.toLong,
        s"$p est=${est(p)} exact=$truth n=$n")
    }
  }

  test("approx quantiles track exact percentiles at test scale") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    def qmap(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Sketches.approxQuantiles(df, col("value"), col("event_id"),
        Seq(0.5, 0.99)).collect()
        .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val approx = qmap(ev)
    val exact = ev.agg(expr("percentile(value, array(0.5, 0.99))"))
      .head().getSeq[Double](0)
    // n <= k here, so the sample is the whole input: only the integer-
    // cent quantization separates approx from exact
    assert(math.abs(approx(0.5) - exact(0)) < 0.05 * math.abs(exact(0)) + 1.0,
      s"p50 approx=${approx(0.5)} exact=${exact(0)}")
    assert(math.abs(approx(0.99) - exact(1)) < 0.05 * math.abs(exact(1)) + 1.0,
      s"p99 approx=${approx(0.99)} exact=${exact(1)}")
    // deterministic under repartitioning (the property the retired
    // percentile_approx version could not guarantee: GK merge order)
    assert(qmap(ev.repartition(7)) == approx)
    // the bottom-k sample is a map-side partial top-k, not a global sort
    val plan = graft.ext.Sketches.approxQuantiles(ev, col("value"),
      col("event_id"), Seq(0.5)).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("per-group approx quantiles: exact when k covers the group, map-side limited") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Sketches.approxQuantilesByGroup(df, "event_type",
        col("value"), col("event_id"), Seq(0.5), k = 100000)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val got = rows(ev)
    // k >= every group size: the sample IS the group, so only the
    // integer-cent quantization separates the result from exact
    val exact = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (g, _, v) =>
      assert(math.abs(v - exact(g)) < 0.011, s"$g got=$v exact=${exact(g)}") }
    assert(rows(ev.repartition(5)) == got)
    // the per-group rank filter must prune map-side, not funnel each
    // group through one unbounded reducer
    val plan = graft.ext.Sketches.approxQuantilesByGroup(ev, "event_type",
      col("value"), col("event_id"), Seq(0.5), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(400))
  }

  test("lshSketch64 native expression == HOF formulation, and codegens") {
    val q = emb.select(col("vec_id"),
      Similarity.quantize(col("embedding")).as("q")).cache()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val native = q.select(col("vec_id"), Similarity.lshSketch(col("q"), 8).as("s"))
    val hof = q.select(col("vec_id"), Similarity.lshSketchHof(col("q"), 8).as("s"))
    assert(rows(native) == rows(hof))
    // planes != default, empty vector edge (all projections 0 => all bits set)
    val edge = Seq((1L, Seq.empty[Long]), (2L, Seq(5L, -3L)))
      .toDF("vec_id", "q")
    assert(rows(edge.select(col("vec_id"), Similarity.lshSketch(col("q"), 12).as("s"))) ==
      rows(edge.select(col("vec_id"), Similarity.lshSketchHof(col("q"), 12).as("s"))))
    assert(edge.where(col("vec_id") === 1L)
      .select(Similarity.lshSketch(col("q"), 12)).head().getLong(0) == (1L << 12) - 1)
    val cg = native.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(!cg.contains("Found 0 WholeStage"), cg.take(400))
    q.unpersist()
  }

  test("simhash64 poly mode == driver-side reference fold") {
    def polyRef(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))
    def simRef(tokens: Seq[String]): Long = {
      val cnt = new Array[Int](64)
      tokens.foreach { t =>
        val h = polyRef(t)
        (0 until 64).foreach(b => cnt(b) += ((h >>> b) & 1L).toInt)
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (cnt(b) * 2 > tokens.size) acc | (1L << b) else acc)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val got = docs.select(col("doc_id"),
      graft.functions.SimHash64.simhash64Poly(
        split(trim(col("text")), "\\s+")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      val want = simRef(r.getString(1).trim.split("\\s+").toSeq)
      assert(got(r.getLong(0)) == want, s"doc ${r.getLong(0)}")
    }
  }

  test("hashedShingles native == xxhash64 over string shingles, and codegens") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      // edge cases: fewer tokens than w, single token, empty, whitespace
      .union(Seq((900001L, "one two"), (900002L, "solo"), (900003L, ""),
        (900004L, "   ")).toDF("doc_id", "text"))
    val ws = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
    val native = ws.select(col("doc_id"),
      graft.functions.HashedShingles.hashedShingles(col("ws"), 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val viaStrings = ws
      .select(col("doc_id"), Dedup.shinglesFromWords(col("ws"), 3).as("sh"))
      .select(col("doc_id"), transform(col("sh"), s => xxhash64(s)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(native == viaStrings)
    val cg = ws.select(graft.functions.HashedShingles.hashedShingles(col("ws"), 3))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(!cg.contains("Found 0 WholeStage"), cg.take(400))
  }

  test("minhashSig native == HOF Kirsch-Mitzenmacher formulation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val hs = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), Dedup.shinglesFromWords(col("ws"), 3).as("sh"))
      .select(col("doc_id"), Dedup.shingleHashes(col("sh")).as("hs"))
    val native = hs.select(col("doc_id"),
      graft.functions.MinHashSig.minhashSig(col("hs"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = hs.select(col("doc_id"),
      Dedup.minhashSignature(col("hs"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == hof)
    // empty input -> all-null signature, matching array_min-of-empty
    val empty = Seq((1L, Seq.empty[Long])).toDF("doc_id", "hs")
    val row = empty.select(graft.functions.MinHashSig.minhashSig(col("hs"), 4)).head()
    assert(row.getSeq[Any](0) == Seq(null, null, null, null))
  }

  test("vocabSize: HLL sketch within its rsd bound of exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val r = TextAnalysis.vocabSize(docs, rsd = 0.05).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.15,
      s"HLL estimate off: exact=$exact approx=$approx")
  }

  test("embeddingDimStats: exact moments on a hand-computed fixture") {
    import spark.implicits._
    val e = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(3.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingDimStats(e).collect()
      .map(r => r.getAs[Long]("dim") -> r).toMap
    val d0 = out(0L)
    assert(d0.getAs[Long]("n_vecs") == 2 &&
      d0.getAs[Long]("min_q") == 1000 && d0.getAs[Long]("max_q") == 3000)
    assert(d0.getAs[Double]("mean_q") == 2000.0)
    // var = (s2 - s1^2/n)/n = ((1e6+9e6) - 4000^2/2)/2 = 1e6
    assert(d0.getAs[Double]("var_q") == 1.0e6)
    val d1 = out(1L)
    assert(d1.getAs[Double]("mean_q") == 500.0)
    // ((4e6+1e6) - 1000^2/2)/2 = 2.25e6
    assert(d1.getAs[Double]("var_q") == 2.25e6)
  }
}
