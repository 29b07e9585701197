package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.Layout

/** Storage-layout planning effects: partition pruning on date-
  * partitioned writes; exchange-free joins on co-bucketed tables. */
class LayoutSpec extends SparkSpec {

  test("z-ordered write: every file covers a tight rectangle of BOTH dims") {
    val base = Files.createTempDirectory("layout_z").toString
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("hour_b", expr("unix_micros(cast(ts as timestamp)) div 3600000000"))
      .select("event_id", "user_id", "hour_b")
    Layout.writeZOrdered(ev, s"$base/z", "user_id", "hour_b", files = 8)
    val files = new java.io.File(s"$base/z").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 4, s"expected several files, got ${files.length}")
    // content survives the rewrite
    assert(spark.read.parquet(s"$base/z").count() == ev.count())
    val global = ev.agg(
      max("user_id") - min("user_id"), max("hour_b") - min("hour_b")).head()
    val (gu, gh) = (global.getLong(0).toDouble, global.getLong(1).toDouble)
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(
        max("user_id") - min("user_id"), max("hour_b") - min("hour_b")).head()
      (r.getLong(0).toDouble / gu, r.getLong(1).toDouble / gh)
    }
    val (avgU, avgH) = (spans.map(_._1).sum / spans.length,
      spans.map(_._2).sum / spans.length)
    // a single-column sort would give ~1.0 span on the other column;
    // z-order must shrink BOTH well below the global range
    assert(avgU < 0.8 && avgH < 0.8,
      s"files must cluster both dims: avg user span=$avgU, hour span=$avgH")
  }

  test("IVF postings layout: probe join dynamic-prunes the cell-partitioned scan") {
    import graft.ext.Similarity
    val base = Files.createTempDirectory("layout_ivf").toString
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    Layout.writeIvfPostings(Similarity.ivfAssign(e), s"$base/postings")
    // one dir per cell on disk
    val cellDirs = new java.io.File(s"$base/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length >= 2, s"expected cell dirs, got ${cellDirs.length}")
    val q = Similarity.ivfTopKFromPostings(
      spark.read.parquet(s"$base/postings"), Similarity.ivfCentroids(e),
      e.where(col("vec_id") % 100 === 0), k = 5, nprobe = 3)
    // value parity with the self-building path
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val self = Similarity.ivfTopK(e, e.where(col("vec_id") % 100 === 0),
      k = 5, nprobe = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == self, s"postings path must equal self-building path")
    // the 100 TB claim: the probe side's broadcast cell join must
    // dynamically prune the partitioned scan (only probed cells read)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"cell-partitioned scan must carry a dynamic pruning predicate:\n${p.take(2000)}")
  }

  test("z-ordered write: empty and all-null-dim inputs degrade to a plain write") {
    import spark.implicits._
    val base = Files.createTempDirectory("layout_zdegen").toString
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    Layout.writeZOrdered(empty, s"$base/empty", "a", "b")
    assert(spark.read.parquet(s"$base/empty").count() == 0)
    val nullDim = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("a", "b")
    Layout.writeZOrdered(nullDim, s"$base/nulldim", "a", "b")
    assert(spark.read.parquet(s"$base/nulldim").count() == 2)
  }

  test("date-partitioned events: range filter prunes partitions at the scan") {
    val base = Files.createTempDirectory("layout_part").toString
    val events = spark.read.parquet(s"$sf/events.parquet")
    Layout.writeDatePartitioned(events, s"$base/events")
    val dirs = new java.io.File(s"$base/events").listFiles()
      .filter(_.getName.startsWith("event_date=")).map(_.getName).sorted
    assert(dirs.length > 1, s"expected multiple day partitions: ${dirs.toSeq}")
    val firstDay = dirs.head.stripPrefix("event_date=")
    val q = spark.read.parquet(s"$base/events")
      .where(col("event_date") === firstDay)
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PartitionFilters"), formatted.take(600))
    // pruning is observable: only one partition's files are scanned
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(q.count() == events.where(
      date_format(col("ts"), "yyyy-MM-dd")
        === firstDay).count())
  }

  test("co-bucketed tables join with no exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    Layout.writeBucketed(li, "bkt_lineitem", "l_orderkey")
    Layout.writeBucketed(ord, "bkt_orders", "l_orderkey")
    // disable broadcast: at test scale the planner would broadcast the
    // tiny side (and skip bucketing entirely); at 100 TB a fact-fact
    // join can't broadcast — force the merge path the layout targets.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layout.bucketedJoin(spark, "bkt_lineitem", "bkt_orders", "l_orderkey")
      joined.collect() // finalize AQE plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == li.join(ord, "l_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("N-ary z-order: 3-dim clustering prunes on every dimension") {
    import graft.ingest.TxLog
    val df = spark.range(0, 8000).select(
      (col("id") % 100).as("a"),
      ((col("id") / 100) % 80).as("b"),
      (col("id") % 997).as("c"),
      col("id").as("payload"))
    val t = java.nio.file.Files.createTempDirectory("zorder3").toString
    TxLog.write(Layout.zOrderedN(df, Seq("a", "b", "c"), files = 16), t,
      "overwrite")
    // every dimension's stats must prune alone, and the conjunction
    // tighter than any single dim
    val (ka, total) = TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Range("a", Some(10L), Some(19L))))
    val (kb, _) = TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Range("b", Some(10L), Some(19L))))
    val (kc, _) = TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Range("c", Some(100L), Some(199L))))
    val preds = Seq(TxLog.Pred.Range("a", Some(10L), Some(19L)),
      TxLog.Pred.Range("b", Some(10L), Some(19L)),
      TxLog.Pred.Range("c", Some(100L), Some(199L)))
    val (kAll, _) = TxLog.pruneFilesWhere(t, preds)
    assert(ka.size < total && kb.size < total && kc.size < total,
      s"each dim must prune: a=${ka.size} b=${kb.size} c=${kc.size} / $total")
    assert(kAll.size <= Seq(ka.size, kb.size, kc.size).min,
      "the conjunction can only be tighter than any single dimension")
    // and skipping must be invisible in the data
    val got = TxLog.snapshotWhere(spark, t, preds)
      .agg(org.apache.spark.sql.functions.sum(col("payload"))).head().getLong(0)
    val want = df.where(col("a").between(10, 19) && col("b").between(10, 19) &&
      col("c").between(100, 199))
      .agg(org.apache.spark.sql.functions.sum(col("payload"))).head().getLong(0)
    assert(got == want)
  }

  test("the 2-dim z-order is the n=2 case of the N-ary interleave, bit-identical") {
    val a = (lit(46341L) % 65536).cast("long") // arbitrary bucketed values
    val b = (lit(12345L) % 65536).cast("long")
    val two = spark.range(1).select(Layout.zValue(a, b, 16).as("z"))
      .head().getLong(0)
    val n = spark.range(1).select(Layout.zValueN(Seq(a, b), 16).as("z"))
      .head().getLong(0)
    assert(two == n, "zValueN(n=2) must reproduce zValue exactly")
  }
}
