package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.RawDerive

/** Fixture landing-zone writer: materializes the deterministic raw
  * pin/geo/user tables (RawDerive) as JSON files in the reference's
  * Kafka-Connect S3 layout `topics/<topic>/partition=0/` (IMPL:69-82,
  * `flush.size=1` granularity approximated by multiple small part
  * files), plus a Kinesis-envelope stream directory for the streaming
  * path (EMIT:76-104: payload exposed as a string `data` column).
  *
  * This gives the batch entry point the same shape the reference reads
  * (S1: `spark.read.json` + schema inference over a topic dir) and the
  * streaming entry point a file-source stand-in for Kinesis (S3; no
  * kinesis connector jar exists locally — SURVEY.md §7.0).
  */
object Fixtures {

  val topicPrefix = "graft"

  /** Write the three raw tables as JSON topic dirs; returns base dir. */
  def landBatch(spark: SparkSession, sfDir: String, baseDir: String): String = {
    val (pin, geo, user) = RawDerive.tables(spark, sfDir)
    def land(df: DataFrame, topic: String): Unit =
      df.repartition(4).write.mode(SaveMode.Overwrite)
        .json(s"$baseDir/topics/$topicPrefix.$topic/partition=0")
    land(pin, "pin"); land(geo, "geo"); land(user, "user")
    baseDir
  }

  /** Read a landed topic dir with schema inference — reference S1
    * (`create_dataframe`, BATCH:49-61). */
  def readTopic(spark: SparkSession, baseDir: String, topic: String): DataFrame =
    spark.read.option("inferSchema", "true")
      .json(s"$baseDir/topics/$topicPrefix.$topic/partition=0")

  /** Write Kinesis-envelope JSON-lines for the streaming source: each
    * record is `{"data": "<record json>"}` — the landed shape after the
    * API-gateway base64 decode, matching STREAM:54's
    * `CAST(data AS STRING)` input contract. */
  def landStream(spark: SparkSession, sfDir: String, baseDir: String): String = {
    val (pin, geo, user) = RawDerive.tables(spark, sfDir)
    def land(df: DataFrame, stream: String): Unit =
      df.select(to_json(struct(df.columns.map(col): _*)).as("data"))
        .repartition(2).write.mode(SaveMode.Overwrite)
        .json(s"$baseDir/streams/streaming-$topicPrefix-$stream")
    land(pin, "pin"); land(geo, "geo"); land(user, "user")
    baseDir
  }
}
