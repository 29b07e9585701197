package graft.ingest

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC row source — the reference's emulators read their three raw
  * tables from MySQL over a serial cursor, one random row per tick
  * (user_posting_emulation.py:56-72 selects by row offset); batch
  * parity for that source is a TABLE-parallel read, not a cursor.
  *
  * `readTable` is the Spark-native shape: ONE bounds query (min/max of
  * the numeric row-index column the reference tables all carry), then
  * `spark.read.jdbc`'s range-partitioned form — `numPartitions`
  * executors each issue an independent range query, so a 10^9-row
  * table lands as N parallel scans instead of one driver-side cursor.
  * Output DataFrames are schema-identical to the file/derive sources
  * (RawDerive), so everything downstream — Fixtures.land*, Cleaning,
  * the nine analytics queries — is source-agnostic.
  *
  * Works against any JDBC database (the reference's MySQL included);
  * exercised in CI against embedded Derby, the one JDBC engine present
  * in /opt/spark/jars (JdbcSourceSpec round-trips the derived raw
  * tables through a real database file).
  */
object JdbcSource {

  /** Range-partitioned JDBC table read on a numeric `idCol`.
    * `numPartitions <= 0` tracks the session's defaultParallelism.
    * Empty tables (null bounds) degrade to a single-partition read. */
  def readTable(spark: SparkSession, url: String, table: String,
      idCol: String = "index", numPartitions: Int = 0,
      props: Properties = new Properties): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    // dialect-correct quoting: `index` is a reserved word in most SQL
    // dialects, and the reference schema really does call it that
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier(idCol)
    val bounds = spark.read
      .jdbc(url, s"(SELECT MIN($q) AS mn, MAX($q) AS mx FROM $table) AS bounds_t", props)
      .head()
    if (bounds.isNullAt(0)) spark.read.jdbc(url, table, props)
    else spark.read.jdbc(url, table, idCol,
      bounds.getLong(0), bounds.getLong(1), parts, props)
  }

  /** The reference's three raw tables (UPLOAD:56-72 table names are
    * deployment-specific; defaults mirror its pin/geo/user trio) as one
    * partitioned-read call each. */
  def tables(spark: SparkSession, url: String,
      pinTable: String = "pinterest_data",
      geoTable: String = "geolocation_data",
      userTable: String = "user_data",
      numPartitions: Int = 0,
      props: Properties = new Properties): (DataFrame, DataFrame, DataFrame) =
    (readTable(spark, url, pinTable, "index", numPartitions, props),
      readTable(spark, url, geoTable, "index", numPartitions, props),
      readTable(spark, url, userTable, "index", numPartitions, props))
}
