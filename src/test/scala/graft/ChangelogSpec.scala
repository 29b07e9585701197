package graft

import org.apache.spark.sql.functions._
import graft.ext.Changelog

/** Changelog compaction: latest-per-key semantics and agg plan shape. */
class ChangelogSpec extends SparkSpec {

  import spark.implicits._

  test("latestByKey: max ts wins, ties break on greatest tieBreak") {
    val log = Seq(
      ("k1", 10L, 1L, "a"),
      ("k1", 20L, 2L, "b"),  // latest for k1
      ("k2", 30L, 3L, "c"),
      ("k2", 30L, 4L, "d"),  // ts tie: max tieBreak (4) wins
      ("k3", 5L, 5L, "e")
    ).toDF("key", "ts", "seq", "payload")
    val out = Changelog.latestByKey(log, Seq("key"), "ts", "seq")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      ("k1", 20L, 2L, "b"), ("k2", 30L, 4L, "d"), ("k3", 5L, 5L, "e")))
  }

  test("latestByKey: partial-aggregates (no per-key window sort), one shuffle") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
        col("event_id"), col("event_type"))
    val df = Changelog.latestByKey(ev, Seq("user_id"), "ts_us", "event_id")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"must aggregate, not window-sort:\n$p")
    // partial + final aggregate pair around a single exchange
    val aggs = p.linesIterator.count(l => l.contains("Aggregate"))
    assert(aggs >= 2, s"expected partial+final aggregation:\n$p")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(exchanges == 1, s"expected one shuffle:\n$p")
    // equivalence with the window formulation
    import org.apache.spark.sql.expressions.Window
    val viaWindow = ev.withColumn("__rk", row_number().over(
      Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").desc, col("event_id").desc)))
      .where(col("__rk") === 1).drop("__rk")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("user_id", "ts_us", "event_id", "event_type")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(df) == rows(viaWindow))
  }
}
