package graft.ingest

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for the landing zone. The reference's
  * Kafka-Connect sink writes ONE S3 object per record
  * (`flush.size=1`, IMPL:71) — at any real volume that is millions of
  * KB-sized JSON objects, and every downstream scan pays per-file
  * open/list overhead. Compaction rewrites a landed topic dir into
  * size-targeted parquet (schema inferred once from the JSON, then
  * columnar + compressed at rest) — the standard operational fix
  * flagged in SURVEY.md §4.
  *
  * Partition-count math uses the INPUT byte size (cheap file-status
  * sum, no data read); `coalesce` avoids a shuffle — tasks just read
  * multiple files each. */
object Compaction {

  /** Compact one landed topic dir to parquet; returns output files
    * written. */
  def compactTopic(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    val inBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inDir)).getLength
    val parts = math.max(1, math.ceil(inBytes.toDouble / targetBytes).toInt)
    spark.read.option("inferSchema", "true").json(inDir)
      .coalesce(parts)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(_.getPath.getName.endsWith(".parquet"))
  }
}
