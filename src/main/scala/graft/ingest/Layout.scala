package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest layout operators — the storage half of the 100 TB design.
  *
  * - `writeDatePartitioned`: hive-style `event_date=.../` partitioning
  *   so time-ranged queries prune whole directories at planning time
  *   (`PartitionFilters` in the scan, no data read outside the range).
  * - `writeBucketed`: hash-bucketed, sorted-within-bucket table layout;
  *   two tables bucketed on the same key join with ZERO exchange — the
  *   shuffle happens once at write time and is amortized over every
  *   subsequent join. This is the co-located-join strategy for fact ⋈
  *   fact joins too big to broadcast (lineitem ⋈ orders at scale).
  *
  * Bucketing requires catalog tables (bucket metadata lives in the
  * metastore), hence `saveAsTable`; the session's default in-process
  * catalog + local warehouse dir suffice offline. LayoutSpec asserts
  * the planning effects (pruned partitions, exchange-free join), not
  * just the data round-trip. */
object Layout {

  /** Land events partitioned by event date (ts arrives as long nanos;
    * day bucket via exact integer division). */
  def writeDatePartitioned(events: DataFrame, outDir: String): Unit =
    events
      .withColumn("event_date",
        date_format(timestamp_seconds(expr("ts div 1000000000")), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(outDir)

  /** Write a bucketed + sorted catalog table. Idempotent across JVMs:
    * the in-memory catalog forgets tables on restart but their
    * warehouse directories survive, so clear both first. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planner emits
    * a SortMergeJoin with no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
