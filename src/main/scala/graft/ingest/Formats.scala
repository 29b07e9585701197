package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch interchange formats beyond JSON/parquet — the sibling
  * landing-zone encodings a lake ingests next to the reference's JSON
  * topic objects (BATCH:49-61): header'd CSV (the export format every
  * upstream system can produce) and ORC (the columnar format half the
  * Hadoop estate still writes). Both surfaces are round-trip entries
  * in the gate: raw rows written to the format, read back through
  * these readers, and cleaned must equal the parquet-path clean
  * bit-for-bit.
  *
  * CSV is the only lossy-by-default format in the set, so the options
  * here are the contract:
  *  - `nullValue = \N` (the classic dump sentinel) keeps NULL and
  *    empty string distinct through the round-trip — the default maps
  *    both to "" on write and "" to NULL on read, silently corrupting
  *    sentinel-cleaning semantics (C2 maps junk STRINGS to null; a
  *    format that invents nulls breaks parity);
  *  - `multiLine = true` on read + default quoting on write survives
  *    embedded newlines/commas/quotes in free-text columns;
  *  - reads take an EXPLICIT schema — inference on CSV is both a
  *    second full scan at 100 TB and a drift hazard (a column of
  *    numeric-looking strings silently becomes int).
  *
  * ORC readers/writers are Spark built-ins (orc-core is on the
  * classpath); the value of the entry is pinning that the engine's
  * cleaning layer is format-agnostic, not the codec itself. */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", "\\N")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("nullValue", "\\N")
      .option("multiLine", "true")
      .csv(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Permissive JSON ingest with corrupt-record quarantine — the
    * text-landing analog of the multimodal tier's `decodeStatsRobust`:
    * a real landing zone always carries some malformed lines
    * (truncated uploads, producer bugs), and FAILFAST kills the job
    * for one bad byte while default-PERMISSIVE silently null-fills.
    * This reader makes the split explicit: rows that parse land in
    * the main frame; malformed lines land in a quarantine frame AS
    * their raw text, queryable for repair/audit — nothing dropped
    * silently (the DLT-expectations discipline applied to the parse
    * step itself).
    *
    * The parsed frame is persisted before splitting: Spark refuses a
    * query that references ONLY the internal corrupt-record column of
    * a lazy JSON scan (SPARK-21610's guard), and the cache also makes
    * the two branches share one parse. Callers done with both frames
    * can `unpersist()` either one's parent via `.sparkSession`. Scale:
    * parse is scan-side; the split is two cached filters, work ∝
    * input, no shuffle. */
  def readJsonRobust(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    require(!schema.fieldNames.contains("_corrupt_record"),
      "readJsonRobust reserves the _corrupt_record column name")
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType, nullable = true)
    val parsed = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val main = parsed.where(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = parsed.where(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    (main, bad)
  }
}
