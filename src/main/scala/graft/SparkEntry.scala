package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Cleaning, PinOracle, PinQueries, RawDerive}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked entry is paired with an independently written
  * DuckDB twin in `oracleSql`; column names and the deterministic total
  * output order are aligned on both sides (Engine.canonical ↔ explicit
  * ORDER BY ... ASC NULLS FIRST).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q1 (most popular category per country) exercises ~80% of the operator
    * inventory in one plan: scan, CASE-null projection, regex, casts,
    * dedup, join, groupBy-count, rank window, filter, sort. */
  def entry(spark: SparkSession): DataFrame =
    pinEntry((p, g, _) => PinQueries.q1(p, g))(spark, "/root/testdata/sf0.001")

  /** Cleaned pin/geo/user for a scale-factor dir. */
  private def tables(spark: SparkSession, sfDir: String): (DataFrame, DataFrame, DataFrame) = {
    Engine.prepare(spark)
    PinQueries.cleanedTables(spark, sfDir)
  }

  private def pinEntry(q: (DataFrame, DataFrame, DataFrame) => DataFrame)(
      spark: SparkSession, sfDir: String): DataFrame = {
    val (pin, geo, user) = tables(spark, sfDir)
    Engine.canonical(q(pin, geo, user))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- cleaning layer C1-C13, verified as full-table dumps ----------
    "pin_clean" -> ((s, dir) => {
      val (pin, _, _) = tables(s, dir)
      pin.orderBy("ind")
    }),
    "geo_clean" -> ((s, dir) => {
      val (_, geo, _) = tables(s, dir)
      geo.select(col("ind"), col("country"), col("coordinates"),
        col("timestamp").cast("string").as("timestamp_str")).orderBy("ind")
    }),
    "user_clean" -> ((s, dir) => {
      val (_, _, user) = tables(s, dir)
      user.select(col("ind"), col("user_name"), col("age"),
        col("date_joined").cast("string").as("date_joined_str")).orderBy("ind")
    }),
    // ---- the nine reference analytics queries (SURVEY §2.3) -----------
    "pin_q1" -> pinEntry((p, g, _) => PinQueries.q1(p, g)) _,
    "pin_q2" -> pinEntry((p, g, _) => PinQueries.q2(p, g)) _,
    "pin_q3" -> pinEntry((p, g, _) => PinQueries.q3(p, g)) _,
    "pin_q4" -> pinEntry((p, g, _) => PinQueries.q4(p, g)) _,
    "pin_q5" -> pinEntry((p, _, u) => PinQueries.q5(p, u)) _,
    "pin_q6" -> pinEntry((p, _, u) => PinQueries.q6(p, u)) _,
    "pin_q7" -> pinEntry((_, _, u) => PinQueries.q7(u)) _,
    "pin_q8" -> pinEntry((p, _, u) => PinQueries.q8(p, u)) _,
    "pin_q9" -> pinEntry((p, _, u) => PinQueries.q9(p, u)) _,
  )

  /** DuckDB twins for the driver's correctness gate. */
  def oracleSql: Map[String, String] = Map(
    "pin_clean" -> PinOracle.pinClean,
    "geo_clean" -> PinOracle.geoClean,
    "user_clean" -> PinOracle.userClean,
    "pin_q1" -> PinOracle.q1,
    "pin_q2" -> PinOracle.q2,
    "pin_q3" -> PinOracle.q3,
    "pin_q4" -> PinOracle.q4,
    "pin_q5" -> PinOracle.q5,
    "pin_q6" -> PinOracle.q6,
    "pin_q7" -> PinOracle.q7,
    "pin_q8" -> PinOracle.q8,
    "pin_q9" -> PinOracle.q9,
  )
}
