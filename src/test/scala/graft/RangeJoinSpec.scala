package graft

import org.apache.spark.sql.functions._
import graft.ext.RangeJoin

/** Bucketed range join: containment semantics, bucket-spanning
  * intervals, equivalence with the naive theta join, plan shape. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("intervalJoin: half-open containment, multi-bucket intervals match once") {
    val pts = Seq((1L, 0L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L))
      .toDF("pid", "ts")
    val ivs = Seq(
      (100L, 10L, 20L),  // [10,20): catches ts 10, 19; not 20
      (101L, 0L, 35L),   // spans 4 buckets of width 10; each point once
      (102L, 40L, 40L),  // empty [40,40) -> dropped
      (103L, 36L, 30L)   // degenerate end<start -> dropped
    ).toDF("iid", "start", "end")
    val out = RangeJoin.intervalJoin(pts, "ts", ivs, "start", "end", 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(
      (2L, 100L), (3L, 100L),
      (1L, 101L), (2L, 101L), (3L, 101L), (4L, 101L)))
  }

  test("intervalJoin == naive theta join on fixture events; no nested loop") {
    // ts arrives as TIMESTAMP_NTZ (parquet timestamp[us]); exact
    // integer epoch-µs under the UTC session
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val hourUs = 3600L * 1000000L
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val ivs = cust.select(col("c_custkey").as("interval_id"),
      (lit(baseUs) + (col("c_custkey") * 7919 % 720) * hourUs).as("start_us"),
      (lit(baseUs) + (col("c_custkey") * 7919 % 720) * hourUs
        + (col("c_custkey") % 12 + 1) * hourUs).as("end_us"))
    val bucketed = RangeJoin.intervalJoin(ev, "ts_us", ivs,
      "start_us", "end_us", hourUs)
    val naive = ev.join(ivs,
      col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "interval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs(bucketed) == pairs(naive) && pairs(bucketed).nonEmpty)
    val p = bucketed.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucketed range join must stay an equi-join:\n$p")
  }
}
