package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's nine analytics queries (BATCH:176-484, SURVEY.md
  * §2.3) re-expressed in idiomatic DataFrame DSL over the cleaned
  * pin/geo/user tables. Semantics are code-faithful, quirks included
  * (Q-c count², Q-d rank ties, Q-f age buckets).
  *
  * Scale notes: every query is a 2-table equi-join on `ind` followed by
  * hash aggregation and/or a window. At 100 TB the joins shuffle on
  * `ind` (or broadcast when a side is small — AQE decides); aggregates
  * get map-side partial aggregation for free; windows shuffle once on
  * their partition keys. `percentile` is Spark's built-in exact-median
  * ObjectHashAggregate — for approximate-at-scale use, swap in
  * `percentile_approx` (the code keeps the reference's exact semantics).
  */
object PinQueries {

  /** Age bucket CASE (BATCH:325-330). ELSE catches <18 too (quirk Q-f). */
  private def ageGroup(age: org.apache.spark.sql.Column) =
    when(age.between(18, 24), "18-24")
      .when(age.between(25, 35), "25-35")
      .when(age.between(36, 50), "36-50")
      .otherwise("50+")

  /** Q1 (BATCH:176-202): most popular category per country —
    * rank() over a grouped count. */
  def q1(pin: DataFrame, geo: DataFrame): DataFrame = {
    val counts = pin.join(geo, "ind")
      .groupBy(col("country"), col("category"))
      .agg(count("*").as("category_count"))
    counts
      .withColumn("ranking", rank().over(
        Window.partitionBy(col("country")).orderBy(col("category_count").desc)))
      .where(col("ranking") === 1)
      .select("country", "category", "category_count")
      .orderBy(col("category_count").desc)
  }

  /** Q2 (BATCH:211-239): posts per category and year, 2018-2022. The
    * outer GROUP BY repeats the inner grouping, so FIRST/SUM act on
    * singleton groups — reproduced faithfully. */
  def q2(pin: DataFrame, geo: DataFrame): DataFrame = {
    val yearDf = pin.join(geo, "ind")
      .groupBy(col("category"), year(col("timestamp")).as("post_year"))
      .agg(count("*").as("category_count"))
    yearDf
      .where(col("post_year").between(2018, 2022))
      .groupBy(col("category"), col("post_year"))
      .agg(first(col("category")).as("first_category"),
        sum(col("category_count")).as("category_count"))
      .select(col("post_year"), col("first_category").as("category"),
        col("category_count"))
      .orderBy(col("post_year").desc)
  }

  /** Shared CTE of Q3/Q4 (BATCH:249-260): per-country follower ranking
    * over raw joined rows. */
  private def followerRanked(pin: DataFrame, geo: DataFrame): DataFrame =
    pin.join(geo, "ind")
      .select(col("country"), col("poster_name"), col("follower_count"))
      .withColumn("ranking", rank().over(
        Window.partitionBy(col("country")).orderBy(col("follower_count").desc)))

  /** Q3 (BATCH:248-274): user with most followers per country; rank
    * ties all survive (quirk Q-d); final sort ASCENDING per reference. */
  def q3(pin: DataFrame, geo: DataFrame): DataFrame =
    followerRanked(pin, geo)
      .where(col("ranking") === 1)
      .groupBy(col("country"), col("poster_name"))
      .agg(max(col("follower_count")).as("follower_count"))
      .orderBy(col("follower_count"))

  /** Q4 (BATCH:283-310): the country whose top user has the most
    * followers — ORDER BY DESC LIMIT 1. Deviation (documented, SURVEY
    * §5.3): a tie-break on `country` is added inside the sort so the
    * single surviving row is deterministic for oracle hashing; value
    * semantics unchanged. */
  def q4(pin: DataFrame, geo: DataFrame): DataFrame =
    followerRanked(pin, geo)
      .where(col("ranking") === 1)
      .groupBy(col("country"), col("poster_name"))
      .agg(max(col("follower_count")).as("follower_count"))
      .select("country", "follower_count")
      .orderBy(col("follower_count").desc, col("country").asc)
      .limit(1)

  /** Q5 (BATCH:323-343): most popular category per age group. */
  def q5(pin: DataFrame, user: DataFrame): DataFrame =
    pin.join(user, "ind")
      .groupBy(ageGroup(col("age")).as("age_group"), col("category"))
      .agg(count("*").as("category_count"))
      .orderBy(col("category_count").desc)

  /** Q6 (BATCH:353-378): exact median follower count per age group
    * (built-in `percentile`, linear interpolation — matches DuckDB
    * `quantile_cont`). */
  def q6(pin: DataFrame, user: DataFrame): DataFrame =
    pin.join(user, "ind")
      .select(ageGroup(col("age")).as("age_group"), col("follower_count"))
      .groupBy(col("age_group"))
      .agg(expr("percentile(follower_count, 0.5)").as("median_follower_count"))
      .orderBy(col("median_follower_count").desc)

  /** Q7 (BATCH:388-406): users joined per year 2015-2020. Faithful to
    * the reference CODE, which sums a whole-partition windowed count
    * over every row and thus returns N² per year (quirk Q-c), not the
    * intended N. */
  def q7(user: DataFrame): DataFrame =
    user
      .select(year(col("date_joined")).as("join_year"))
      .withColumn("number_users_joined",
        count("*").over(Window.partitionBy(col("join_year"))))
      .where(col("join_year").between(2015, 2020))
      .groupBy(col("join_year"))
      .agg(sum(col("number_users_joined")).as("number_users_joined"))

  /** Q8 (BATCH:415-438): median follower count per join-year 2015-2020
    * — percentile as a window function, deduped by the outer GROUP BY
    * (≡ distinct, since the window value is constant per partition). */
  def q8(pin: DataFrame, user: DataFrame): DataFrame =
    user.join(pin, "ind")
      .select(year(col("date_joined")).as("join_year"), col("follower_count"))
      .withColumn("median_follower_count",
        expr("percentile(follower_count, 0.5)").over(
          Window.partitionBy(col("join_year"))))
      .where(col("join_year").between(2015, 2020))
      .select("join_year", "median_follower_count")
      .distinct()

  /** Q9 (BATCH:447-484): median follower count per join-year × age
    * group — window partitioned by two expressions, one a CASE. */
  def q9(pin: DataFrame, user: DataFrame): DataFrame =
    user.join(pin, "ind")
      .select(ageGroup(col("age")).as("age_group"),
        year(col("date_joined")).as("join_year"), col("follower_count"))
      .withColumn("median_follower_count",
        expr("percentile(follower_count, 0.5)").over(
          Window.partitionBy(col("join_year"), col("age_group"))))
      .where(col("join_year").between(2015, 2020))
      .select("age_group", "join_year", "median_follower_count")
      .distinct()

  /** Cleaned tables for a scale-factor dir (raw derivation → C1-C13). */
  def cleanedTables(spark: SparkSession, sfDir: String): (DataFrame, DataFrame, DataFrame) = {
    val (rp, rg, ru) = RawDerive.tables(spark, sfDir)
    (Cleaning.cleanPin(rp), Cleaning.cleanGeo(rg), Cleaning.cleanUser(ru))
  }
}
