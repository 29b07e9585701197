package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivation of the reference's three raw tables
  * (pin / geo / user — schemas per SURVEY.md §1.4, dirty values per
  * FIXTURES.md §A) from the driver's read-only testdata parquet.
  *
  * Why derive instead of generating JSON fixtures: the DuckDB oracle can
  * only see the parquet tables in the scale-factor dir, so expressing the
  * dirtying as pure integer arithmetic + string concat over `orders` ⋈
  * `customer` ⋈ `nation` makes the ENTIRE pipeline — raw → C1-C13 clean →
  * the nine analytics queries — independently recomputable by the oracle
  * (graft.pipeline.PinOracle holds the DuckDB twins). Everything here is
  * modulo arithmetic on `o_orderkey`/`o_custkey` — bit-identical across
  * engines, sf-scaling with the row count, and shuffle-free (a pure
  * projection over the orders scan; the nation/customer lookups are
  * broadcast joins).
  *
  * Join contract: `index` = `o_orderkey` in all three tables, mirroring
  * the emulator's one-offset-per-tick sampling (UPLOAD:51-72) that makes
  * the `ind` equi-joins of BATCH:184-188 productive.
  *
  * Dirty-value coverage (FIXTURES.md §A.1-A.3): every sentinel string,
  * empty cells, "25k"/"2M" follower counts, '0'/'1' booleans, whitespace
  * countries, string lat/long, TZ-less ISO timestamps, and exact
  * duplicate rows (keys ≡ 0 mod 10 appear twice — pin/geo dedup removes
  * them, user dups survive per quirk Q-b).
  */
object RawDerive {

  private def k = col("o_orderkey")
  private def c = col("o_custkey")

  private def s(x: org.apache.spark.sql.Column) = x.cast("string")
  private def pad2(x: org.apache.spark.sql.Column) = lpad(s(x), 2, "0")

  /** TZ-less ISO-8601 string timestamp, e.g. "2021-04-19T17:37:03"
    * (emulator sends `.isoformat()` — UPLOAD:91). */
  private def isoTs(y: org.apache.spark.sql.Column, mo: org.apache.spark.sql.Column,
      d: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
      mi: org.apache.spark.sql.Column, se: org.apache.spark.sql.Column) =
    concat(s(y), lit("-"), pad2(mo), lit("-"), pad2(d), lit("T"),
      pad2(h), lit(":"), pad2(mi), lit(":"), pad2(se))

  /** Duplicate rows whose index ≡ 0 (mod 10) — exercises C1 dedup. */
  private def withDups(df: DataFrame): DataFrame =
    df.union(df.where(col("index") % 10 === 0))

  /** Raw pin: 12 all-string-ish columns (UPLOAD:77-83, STREAM:66-79). */
  def rawPin(orders: DataFrame): DataFrame = withDups(orders.select(
    k.as("index"),
    concat(lit("uid-"), s(k)).as("unique_id"),
    when(k % 13 === 0, "No Title Data Available")
      .when(k % 13 === 1, "")
      .otherwise(concat(lit("Title "), s(k % 50))).as("title"),
    when(k % 17 === 0, "No description available Story format")
      .when(k % 17 === 1, "")
      .otherwise(concat(lit("Desc "), s(k % 40))).as("description"),
    when(k % 19 === 0, "User Info Error")
      .otherwise(concat(lit("Poster "), s(c % 37))).as("poster_name"),
    when(k % 11 === 0, "User Info Error")
      .when(k % 11 === 1, concat(s(c % 90), lit("k")))
      .when(k % 11 === 2, concat(s(c % 9 + 1), lit("M")))
      .when(k % 11 === 3, "")
      .otherwise(s((c * 97) % 100000)).as("follower_count"),
    when(k % 23 === 0, "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e")
      .otherwise(concat(lit("tag"), s(k % 7), lit(",tag"), s(k % 5))).as("tag_list"),
    when(k % 3 === 0, "image").when(k % 3 === 1, "video")
      .otherwise("multi-video(story page format)").as("is_image_or_video"),
    when(k % 29 === 0, "Image src error")
      .otherwise(concat(lit("https://i.example.com/"), s(k), lit(".jpg"))).as("image_src"),
    s(k % 2).as("downloaded"),
    concat(lit("Local save in /data/cat-"), s(k % 12)).as("save_location"),
    concat(lit("cat-"), s(k % 12)).as("category")))

  /** Raw geo: 5 columns, string lat/long, whitespace-padded country on
    * keys ≡ 0 (mod 5) to exercise C12 trim (EMIT:90-93). Country comes
    * from orders→customer→nation (both lookups broadcast). */
  def rawGeo(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame = {
    val joined = orders
      .join(broadcast(customer), c === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
    withDups(joined.select(
      k.as("index"),
      isoTs(k % 9 + 2016, k % 12 + 1, k % 28 + 1, k % 24, k % 60, (k * 7) % 60)
        .as("timestamp"),
      s(k * 13 % 181 - 90).as("latitude"),
      s(k * 3 % 361 - 180).as("longitude"),
      when(k % 5 === 0, concat(lit("  "), col("n_name"), lit(" ")))
        .otherwise(col("n_name")).as("country")))
  }

  /** Raw user: 5 columns; ages 10-69 cover every CASE bucket incl. the
    * under-18 → '50+' quirk Q-f; join years 2014-2022 straddle the
    * 2015-2020 BETWEEN filters (EMIT:99-102). */
  def rawUser(orders: DataFrame): DataFrame = withDups(orders.select(
    k.as("index"),
    isoTs(k % 9 + 2014, (k * 3) % 12 + 1, (k * 5) % 27 + 1, (k * 11) % 24,
      (k * 13) % 60, (k * 17) % 60).as("date_joined"),
    concat(lit("F"), s(c % 40)).as("first_name"),
    concat(lit("L"), s(k % 60)).as("last_name"),
    s((k * 7) % 60 + 10).as("age")))

  /** All three raw tables from a scale-factor dir. rawGeo follows the
    * natural FK chain orders→customer→nation, so geo has the same
    * cardinality as pin and the `ind` equi-joins are total. */
  def tables(spark: SparkSession, sfDir: String): (DataFrame, DataFrame, DataFrame) = {
    // The testdata orders.parquet is one file / one row group = one
    // input split: without redistribution the ~20-expression derive
    // projection runs on a single task. Round-robin to the session's
    // parallelism first (cheap: rows are narrow pre-derive).
    // one wave of the session's cores (r19): the derive is uniform
    // per-row work, and the ×2 straggler fan only doubled the per-task
    // fixed cost of every consumer stage (the withDups union runs TWO
    // branches over this scan, so ×2 here meant 128-task stages on
    // 15000-row fixtures — measured strictly slower at 32 cores)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    (rawPin(orders), rawGeo(orders, customer, nation), rawUser(orders))
  }
}
