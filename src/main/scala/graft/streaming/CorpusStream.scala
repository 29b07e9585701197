package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming ingest dedup against a STANDING corpus — the streaming
  * face of `Dedup.incrementalDedup`'s exact tier: documents arrive as
  * an unbounded stream and pass through only if their content digest
  * is absent from a static fingerprint index of everything already
  * ingested.
  *
  * Scale posture: the join is stream-static and keyed on the 32-byte
  * sha256 digest — STATELESS on the stream side (no watermark state at
  * all; nothing accumulates), with the index broadcast per micro-batch
  * when small or hash-joined in place when not. The index itself is
  * maintained by the batch side (append today's survivors' digests
  * after each ingest window) — the lambda-architecture split that
  * keeps the streaming path a pure filter. */
object CorpusStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).json(dir)

  /** Stream docs → drop rows whose sha256(text) is in `index`
    * (a static frame with column `text_sha`). */
  def dedupVsIndex(stream: DataFrame, index: DataFrame): DataFrame =
    stream.withColumn("text_sha", sha2(col("text"), 256))
      .join(broadcast(index), Seq("text_sha"), "left_anti")
      .drop("text_sha")

  def runDedupVsIndex(spark: SparkSession, inDir: String, index: DataFrame,
      outDir: String, checkpointDir: String): StreamingQuery =
    dedupVsIndex(source(spark, inDir), index)
      .writeStream
      .format("parquet")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming quality gate — the batch curation tier run UNMODIFIED
    * on a document stream: `TextAnalysis.gopherRules` is a pure
    * projection, so it lifts to Structured Streaming as a stateless
    * per-row filter (no watermark, no state) and must produce exactly
    * the rows the batch pass keeps. Filters on the corpus-shape rules
    * (word-count band, mean word length, symbol ratio, alphabetic
    * fraction — the signals that bind on any corpus). */
  def runShapeFilter(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, minWords: Int = 20): StreamingQuery = {
    import graft.ext.TextAnalysis
    TextAnalysis.gopherRules(source(spark, inDir), minWords)
      .where(col("n_words").between(minWords, 100000) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") <= 0.1 &&
        col("frac_alpha_words") >= 0.8)
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("frac_alpha_words"))
      .writeStream
      .format("parquet")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Streaming IVF index maintenance — newly arriving embeddings are
    * cell-assigned against the centroids of the EXISTING static index
    * (`Similarity.ivfCentroids`) and appended to the posting lists:
    * because assignment is a pure projection through one broadcast
    * centroid table (`ivfAssignAgainst`), it lifts to Structured
    * Streaming with ZERO state — each micro-batch's rows land in
    * exactly the cells a batch rebuild would put them in, so the
    * serving index stays fresh between full rebuilds (the standard
    * IVF freshness story: coarse quantizer fixed, postings grow).
    * Parquet file-stream source — feature-store drops arrive as
    * columnar files, and parquet landing keeps float round-trips
    * exact. */
  def runIvfAssign(spark: SparkSession, inDir: String, cents: DataFrame,
      outDir: String, checkpointDir: String): StreamingQuery = {
    import graft.ext.Similarity
    val stream = spark.readStream.schema(embSchema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    Similarity.ivfAssignAgainst(stream, cents)
      .select(col("vec_id"), col("cell"))
      .writeStream
      .format("parquet")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
