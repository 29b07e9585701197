package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the deterministic primitives (pure
  * driver-side checks mirroring the distributed expressions, plus
  * spot-checks through Spark itself). Uses scalacheck Gen directly
  * with a fixed seed (no scalatestplus bridge in the offline deps). */
class PropertySpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def polyRef(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))

  test("polyhash64 is a rolling hash: h(a++b) = h(a)*P^|b| + h(b)") {
    for ((a, b) <- samples(Gen.zip(Gen.asciiPrintableStr, Gen.asciiPrintableStr), 200)) {
      val pPow = b.getBytes("UTF-8").foldLeft(1L)((acc, _) => acc * 1000003L)
      assert(polyRef(a + b) == polyRef(a) * pPow + polyRef(b), s"a=$a b=$b")
    }
  }

  test("polyhash64 expression agrees with the reference fold on arbitrary strings") {
    import spark.implicits._
    val strs = samples(Gen.asciiPrintableStr, 64).filter(_.nonEmpty).distinct
    val got = strs.toDF("s")
      .select(graft.functions.PolyHash64.polyhash64(col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == strs.map(polyRef))
  }

  test("Sampling.bucket: in range, deterministic, matches driver-side reference") {
    val bucketRef: Long => Long = id =>
      math.floorMod(math.floorMod(id, 1000003L) * 2654435761L, 10000L)
    for (id <- samples(Gen.chooseNum(0L, Long.MaxValue / 2), 500)) {
      val b = bucketRef(id)
      assert(b >= 0 && b < 10000, s"id=$id -> $b")
    }
    import spark.implicits._
    val ids = samples(Gen.chooseNum(0L, Long.MaxValue / 2), 32).distinct
    val got = ids.toDF("doc_id")
      .select(graft.ext.Sampling.bucket(col("doc_id"), 10000))
      .collect().map(_.getLong(0)).toSeq
    assert(got == ids.map(bucketRef))
  }

  test("shingle count = max(|words|-w+1, 1) before dedup (w=3)") {
    import spark.implicits._
    val sizes = samples(Gen.chooseNum(1, 40), 12).distinct
    val texts = sizes.map(n => (1 to n).map(i => s"w$i").mkString(" "))
    val got = texts.toDF("text")
      .select(size(graft.ext.Dedup.shingles(col("text"))))
      .collect().map(_.getInt(0)).toSeq
    assert(got == sizes.map(n => math.max(n - 2, 1)))
  }

  test("hashedShingles == xxhash64 over string shingles on arbitrary unicode text") {
    import spark.implicits._
    // arbitrary unicode incl. whitespace runs, empty strings, CJK
    val gen = Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableStr, Gen.const("  "), Gen.const("\t"),
      Gen.const("文字"), Gen.const("ё"))).map(_.mkString(" "))
    val texts = samples(gen, 64).distinct
    val df = texts.toDF("text")
      .select(split(trim(col("text")), "\\s+").as("ws"))
    val native = df
      .select(graft.functions.HashedShingles.hashedShingles(col("ws"), 3))
      .collect().map(_.getSeq[Long](0).toSet).toSeq
    val viaStrings = df
      .select(transform(graft.ext.Dedup.shinglesFromWords(col("ws"), 3),
        s => xxhash64(s)))
      .collect().map(_.getSeq[Long](0).toSet).toSeq
    assert(native == viaStrings)
  }

  test("minhashSig == HOF formulation on arbitrary long arrays (incl. overflow)") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val arrays = samples(gen, 48).distinct.filter(_.nonEmpty)
    val df = arrays.toDF("hs")
    val native = df.select(graft.functions.MinHashSig.minhashSig(col("hs"), 16))
      .collect().map(_.getSeq[Long](0)).toSeq
    val hof = df.select(graft.ext.Dedup.minhashSignature(col("hs"), 16))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(native == hof)
  }

  // --- relational operators vs brute-force references on random data ---

  private val keyGen = Gen.chooseNum(0L, 4L)
  private val tsGen = Gen.chooseNum(0L, 40L)

  test("bloom prefilter never drops a true member (random long sets, tight filters)") {
    import org.apache.spark.util.sketch.BloomFilter
    for (xs <- samples(Gen.listOfN(64, Gen.chooseNum(Long.MinValue, Long.MaxValue)), 50)) {
      // deliberately undersized: fpp climbs, but membership must hold
      val bf = BloomFilter.create(8, 0.5)
      xs.foreach(bf.putLong)
      xs.foreach(x => assert(bf.mightContainLong(x), s"false negative for $x"))
    }
    // and through the expression itself
    import spark.implicits._
    val xs = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 64).distinct
    val bf = BloomFilter.create(xs.size.toLong.max(1), 0.01)
    xs.foreach(bf.putLong)
    val kept = xs.toDF("v")
      .where(graft.functions.BloomMightContainLong.mightContain(col("v"), bf))
      .count()
    assert(kept == xs.size, "expression must pass every inserted value")
  }

  test("lineDedup is idempotent and never invents text on random line corpora") {
    import spark.implicits._
    val lineGen = Gen.oneOf("alpha one", "beta two", "gamma three", "delta four",
      "epsilon five", "zeta six")
    val docGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, lineGen).map(_.mkString("\n")))
    val texts = samples(docGen, 20)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = graft.ext.Dedup.lineDedup(docs)
    val onceRows = once.collect().map(r => (r.getLong(0), r.getString(3))).toMap
    // idempotence: deduping the deduped corpus changes nothing
    val again = graft.ext.Dedup.lineDedup(
      once.select(col("doc_id"), col("text_dedup").as("text")))
    val againRows = again.collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(againRows == onceRows, "second pass must be a no-op")
    // conservation: every surviving line existed in the source doc
    onceRows.foreach { case (id, kept) =>
      val src = texts(id.toInt).split("\n").toSet
      kept.split("\n").filter(_.nonEmpty).foreach(l =>
        assert(src.contains(l), s"doc $id invented line '$l'"))
    }
    // global uniqueness: each distinct line survives exactly once corpus-wide
    val survivors = onceRows.values.flatMap(_.split("\n")).filter(_.nonEmpty).toSeq
    assert(survivors.size == survivors.distinct.size,
      "a line must survive at most once across the corpus")
  }

  test("mixtureSample: output proportions within hash granularity of targets") {
    import spark.implicits._
    // 3 groups with deliberately unequal sizes
    val rows = (0L until 600L).map(i =>
      (i, if (i % 6 < 3) "a" else if (i % 6 < 5) "b" else "c"))
    val df = rows.toDF("doc_id", "source")
    val weights = Map("a" -> 1, "b" -> 1, "c" -> 2)
    val out = graft.ext.Sampling.mixtureSample(df, "source", weights)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // c is the scarcest per weight unit (100 rows, weight 2) → c keeps
    // everything; a and b downsample toward 50 each (1:1:2 over n_out=200)
    assert(out("c") == 100, out.toString)
    assert(math.abs(out("a") - 50) <= 10 && math.abs(out("b") - 50) <= 10,
      s"a/b should downsample to ~50: $out")
    // never upsample
    assert(out("a") <= 300 && out("b") <= 200 && out("c") <= 100)
  }

  test("leakageSafeSplit: atomic per component on random pair graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 49L), Gen.chooseNum(0L, 49L)))
    for (raw <- samples(edgeGen, 5)) {
      val edges = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      if (edges.nonEmpty) {
        val docs = (0L to 49L).map(i => (i, s"t$i")).toDF("doc_id", "text")
        val out = graft.ext.Sampling
          .leakageSafeSplit(docs, edges.toDF("a_id", "b_id"))
          .select("doc_id", "split").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        // union-find the same edges; every component must be one split
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
        edges.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keys.foreach { id =>
          assert(out(id) == out(find(id)), s"doc $id split off its component")
        }
      }
    }
  }

  test("asofJoin == per-row argmax reference on random keyed event sets") {
    import spark.implicits._
    val rowGen = Gen.zip(keyGen, tsGen)
    val lRows = samples(Gen.listOfN(30, rowGen), 4)
    val rRows = samples(Gen.listOfN(20, rowGen), 4)
    for (((ls, rs), round) <- lRows.zip(rRows).zipWithIndex) {
      val l = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "ts")
      val r = rs.zipWithIndex.map { case ((k, t), i) => (1000L + i, k, t) }
        .toDF("rid", "k", "ts")
      val got = graft.ext.AsofJoin.asofJoin(l, r, Seq("k"), "ts",
        Seq("rid" -> "m_rid"), "rid")
        .collect().map(x => x.getLong(0) ->
          (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
      // reference: for each left row, max-(ts, rid) right row with ts <= l.ts
      val rSeq = rs.zipWithIndex.map { case ((k, t), i) => (1000L + i, k, t) }
      ls.zipWithIndex.foreach { case ((k, t), i) =>
        val want = rSeq.filter(x => x._2 == k && x._3 <= t)
          .sortBy(x => (x._3, x._1)).lastOption.map(_._1).getOrElse(-1L)
        assert(got(i.toLong) == want, s"round $round left=$i k=$k ts=$t")
      }
    }
  }

  test("intervalJoin == filtered cross product on random intervals") {
    import spark.implicits._
    val ptGen = Gen.listOfN(25, Gen.chooseNum(-50L, 50L))
    val ivGen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(-50L, 50L), Gen.chooseNum(0L, 30L)))
    for ((pts, ivsRaw) <- samples(Gen.zip(ptGen, ivGen), 5)) {
      val ivs = ivsRaw.zipWithIndex.map { case ((s, len), i) =>
        (i.toLong, s, s + len) } // len 0 => empty interval
      val pdf = pts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "ts")
      val idf = ivs.toDF("iid", "s", "e")
      val got = graft.ext.RangeJoin.intervalJoin(pdf, "ts", idf, "s", "e", 7L)
        .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for {
        (t, i) <- pts.zipWithIndex
        (iid, s, e) <- ivs if t >= s && t < e
      } yield (i.toLong, iid)).toSet
      assert(got == want)
    }
  }

  test("latestByKey == groupwise max-(ts, seq) reference on random logs") {
    import spark.implicits._
    val rowGen = Gen.zip(keyGen, tsGen)
    for (rows <- samples(Gen.listOfN(40, rowGen), 5)) {
      val log = rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val got = graft.ext.Changelog.latestByKey(
        log.toDF("k", "ts", "seq"), Seq("k"), "ts", "seq")
        .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
      val want = log.groupBy(_._1).view.mapValues(g =>
        g.map(x => (x._2, x._3)).max).toMap
      assert(got == want)
    }
  }

  test("winnowing guarantee: any shared >= w+window-1 token run yields a shared fingerprint") {
    import spark.implicits._
    val word = Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
    val wordsGen = Gen.listOfN(14, word)
    // 6 = w + window - 1 for the defaults (w=3, window=4)
    val runGen = Gen.listOfN(6, word)
    for ((run, (pre, post)) <- samples(
        Gen.zip(runGen, Gen.zip(wordsGen, wordsGen)), 12)) {
      val d = Seq(
        (0L, (pre ++ run).mkString(" ")),
        (1L, (run ++ post).mkString(" "))
      ).toDF("doc_id", "text")
      val fps = graft.ext.Dedup.winnowFingerprints(d).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      assert((fps(0L) & fps(1L)).nonEmpty,
        s"run=${run.mkString(" ")} must surface despite offsets")
    }
  }

  test("retrievalMetrics invariants: metrics bounded, perfect run scores 1") {
    import spark.implicits._
    val docsGen = Gen.listOfN(8, Gen.chooseNum(1L, 30L)).map(_.distinct)
    for (ids <- samples(docsGen, 10).filter(_.size >= 3)) {
      val run = ids.zipWithIndex.map { case (d, i) => (1L, d, (i + 1).toLong) }
      val gold = ids.map(d => (1L, d))
      val r = graft.ext.TextAnalysis.retrievalMetrics(
        run.toDF("query_id", "doc_id", "rank"),
        gold.toDF("query_id", "doc_id"), k = ids.size).head
      assert(r.getAs[Double]("recall_at_k") == 1.0)
      assert(r.getAs[Double]("mrr") == 1.0)
      assert(r.getAs[Double]("ndcg") == 1.0, "ideal order scores exactly 1")
    }
  }

  test("cms matrix row sums: every depth row sums to the token-instance count") {
    import spark.implicits._
    val docGen = Gen.listOfN(12, Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString))
    for ((words, i) <- samples(docGen, 6).zipWithIndex) {
      val d = Seq((i.toLong, words.mkString(" "))).toDF("doc_id", "text")
      val m = d.select(explode(split(trim(col("text")), "\\s+")).as("t"))
        .select(graft.functions.PolyHash64.polyhash64(col("t")).as("h"))
        .agg(graft.functions.CmsSketch.cmsSketch(col("h"), 4, 64).as("m"))
        .head.getSeq[Long](0)
      (0 until 4).foreach { row =>
        assert(m.slice(row * 64, (row + 1) * 64).sum == words.size.toLong,
          s"row $row must conserve mass")
      }
    }
  }

  test("upsertOrdered converges to max-rev-per-key for ANY batch split and order") {
    import spark.implicits._
    import graft.ingest.TxLog
    // a random multiset of (key, rev, payload) revisions…
    val rowGen = Gen.zip(Gen.chooseNum(0L, 7L), Gen.chooseNum(0L, 5L))
      .map { case (k, r) => (k, r, s"p$k-$r") }
    for ((rows, runIdx) <- samples(Gen.listOfN(24, rowGen), 4).zipWithIndex) {
      // …applied in a random number of batches in a random order must
      // leave exactly the highest-rev row per key (ties: the sequence
      // guard's content-hash tiebreak — here payload is a function of
      // (key, rev), so ties are literal duplicates and any winner is
      // the same row)
      val nBatches = 1 + runIdx % 3
      val batches = rows.zipWithIndex.groupBy(_._2 % nBatches)
        .toSeq.sortBy(-_._1).map(_._2.map(_._1)) // reversed batch order
      val t = java.nio.file.Files.createTempDirectory(s"txprop$runIdx").toString
      batches.foreach { b =>
        TxLog.upsertOrdered(spark, t,
          b.toDF("k", "rev", "p"), Seq("k"), "rev")
      }
      val got = TxLog.snapshot(spark, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
      val want = rows.groupBy(_._1).toSeq.map { case (_, rs) =>
        rs.maxBy(r => (r._2, r._3)) }.sortBy(_._1)
      assert(got == want, s"run $runIdx: $got vs $want (batches=$batches)")
    }
  }

  test("zOrderedN preserves content exactly for any dimension subset") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, i % 37, i % 11, s"x$i"))
      .toDF("a", "b", "c", "s")
    for (dims <- Seq(Seq("a"), Seq("a", "b"), Seq("b", "c", "a"))) {
      val z = graft.ingest.Layout.zOrderedN(df, dims, files = 8)
      assert(z.columns.toSeq == df.columns.toSeq, s"dims=$dims: schema")
      assert(z.exceptAll(df).isEmpty && df.exceptAll(z).isEmpty,
        s"dims=$dims: clustering must be content-neutral")
    }
  }

  test("avro round trip survives extreme values (Long bounds, NaN, ±Inf, unicode)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("x", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true)))
    val rows = Seq(
      Row(Long.MinValue, Double.NaN, " nul byte"),
      Row(Long.MaxValue, Double.PositiveInfinity, "emoji 😀"),
      Row(0L, Double.NegativeInfinity, ""),
      Row(-1L, java.lang.Double.MIN_VALUE, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("avro_extreme").toString
    graft.ingest.Avro.writeAvro(df, s"$dir/t")
    val back = graft.ingest.Avro.readAvro(spark, s"$dir/t", schema)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) "null" else String.valueOf(r.getDouble(1)),
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_._1).toSeq
    val want = rows.map(r => (r.getLong(0),
      if (r.isNullAt(1)) "null" else String.valueOf(r.getDouble(1)),
      r.getString(2))).sortBy(_._1)
    assert(back == want, back.toString)
  }

  test("snapshotWhere ≡ plain filter for random predicate conjunctions (nulls included)") {
    import spark.implicits._
    import graft.ingest.TxLog
    import graft.ingest.TxLog.Pred
    // a table with a long, a string and a NULL-bearing long column,
    // written as several range-clustered files so stats actually prune
    val rows = (0L until 400L).map { i =>
      (i, s"s${i % 13}", if (i % 5 == 0) None else Some(i % 97))
    }
    val df = rows.toDF("k", "tag", "v")
    val t = java.nio.file.Files.createTempDirectory("txlog_prop").toString
    TxLog.write(df.repartitionByRange(8, col("k")), t, "overwrite")
    val full = TxLog.snapshot(spark, t)
    val predGen: Gen[Pred] = Gen.oneOf(
      Gen.zip(Gen.chooseNum(0L, 400L), Gen.chooseNum(0L, 400L)).map {
        case (a, b) => Pred.Range("k", Some(math.min(a, b)), Some(math.max(a, b))) },
      Gen.chooseNum(0L, 96L).map(x => Pred.Range("v", Some(x), None)),
      Gen.chooseNum(0, 15).map(x => Pred.Eq("tag", s"s$x")),
      Gen.listOfN(3, Gen.chooseNum(0, 15)).map(xs =>
        Pred.In("tag", xs.distinct.map(x => s"s$x"))),
      Gen.const(Pred.IsNull("v")), Gen.const(Pred.NotNull("v")))
    def exact(p: Pred): org.apache.spark.sql.Column = p match {
      case Pred.Range(c, lo, hi) =>
        (lo.map(v => col(c) >= lit(v)) ++ hi.map(v => col(c) <= lit(v)))
          .reduceOption(_ && _).getOrElse(lit(true))
      case Pred.Eq(c, v) => col(c) === lit(v)
      case Pred.In(c, vs) => col(c).isin(vs: _*)
      case Pred.IsNull(c) => col(c).isNull
      case Pred.NotNull(c) => col(c).isNotNull
    }
    def key(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    for (preds <- samples(Gen.listOfN(2, predGen), 25)
        if preds.forall { case Pred.In(_, vs) => vs.nonEmpty; case _ => true }) {
      val pruned = key(TxLog.snapshotWhere(spark, t, preds))
      val plain = key(preds.foldLeft(full)((d, p) => d.where(exact(p))))
      assert(pruned == plain,
        s"snapshotWhere diverged for $preds: ${pruned.size} vs ${plain.size}")
    }
  }
}
