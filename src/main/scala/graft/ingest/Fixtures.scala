package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
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
      df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("data"))
        .repartition(2).write.mode(SaveMode.Overwrite)
        .json(s"$baseDir/streams/streaming-$topicPrefix-$stream")
    land(pin, "pin"); land(geo, "geo"); land(user, "user")
    baseDir
  }

  // ---- wire envelopes (S7/S8): the emulators' exact message shapes ---

  /** Kafka-REST batch envelope (UPLOAD:74-108): one POST body per
    * record, `{"records": [{"value": {...row...}}]}`. */
  def toKafkaEnvelopes(df: DataFrame): DataFrame =
    df.select(to_json(struct(array(struct(
      struct(df.columns.toIndexedSeq.map(col): _*).as("value"))).as("records")))
      .as("body"))

  /** Parse Kafka-REST envelopes back to raw rows (declared schema:
    * every emulator field is a string — SURVEY §1.4). */
  def fromKafkaEnvelopes(env: DataFrame, fields: Seq[String]): DataFrame = {
    val valueSchema = StructType(fields.map(f => StructField(f, StringType)))
    val bodySchema = StructType(Seq(StructField("records",
      ArrayType(StructType(Seq(StructField("value", valueSchema)))))))
    env.select(explode(from_json(col("body"), bodySchema)
      .getField("records")).as("rec"))
      .select(col("rec.value.*"))
  }

  /** Kinesis PutRecord envelope (EMIT:76-104 + IMPL:211-217): the API
    * gateway maps `Data` through base64. */
  def toKinesisEnvelopes(df: DataFrame, streamName: String): DataFrame =
    df.select(to_json(struct(
      lit(streamName).as("StreamName"),
      base64(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).cast("binary")).as("Data"),
      lit("partition-1").as("PartitionKey"))).as("body"))

  /** Parse Kinesis envelopes: unwrap, base64-decode `Data`, parse the
    * inner payload — the engine-side twin of the Kinesis consumer's
    * `CAST(data AS STRING)` + from_json (S4/S5). */
  def fromKinesisEnvelopes(env: DataFrame, fields: Seq[String]): DataFrame = {
    val payloadSchema = StructType(fields.map(f => StructField(f, StringType)))
    val envSchema = StructType(Seq(
      StructField("StreamName", StringType),
      StructField("Data", StringType),
      StructField("PartitionKey", StringType)))
    env.select(from_json(col("body"), envSchema).as("e"))
      .select(unbase64(col("e.Data")).cast("string").as("data"))
      .select(from_json(col("data"), payloadSchema).as("parsed_data"))
      .select(col("parsed_data.*"))
  }
}
