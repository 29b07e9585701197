package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.Layout

/** Storage-layout planning effects: partition pruning on date-
  * partitioned writes; exchange-free joins on co-bucketed tables. */
class LayoutSpec extends SparkSpec {

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
      date_format(timestamp_seconds(expr("ts div 1000000000")), "yyyy-MM-dd")
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
}
