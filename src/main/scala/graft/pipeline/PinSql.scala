package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The analyst surface: the reference's nine `%sql` cells, verbatim
  * (BATCH:176-484), run through `spark.sql` against the same temp-view
  * names the reference registers (`pin_df`/`geo_df`/`user_df`,
  * BATCH:165-167 — operator S11 in SURVEY.md §2.1).
  *
  * This is the second half of the dual query surface (SURVEY.md §3.3):
  * `PinQueries` holds the DataFrame-DSL builders; this object holds the
  * SQL texts an analyst would paste. `SqlParitySpec` proves the two
  * surfaces produce identical results — Catalyst compiles both to the
  * same logical shapes, so the parity also pins that our DSL rewrite is
  * semantics-preserving (quirks Q-c/Q-d/Q-f included).
  */
object PinSql {

  /** BATCH:165-167 — make the cleaned frames SQL-visible. */
  def registerViews(pin: DataFrame, geo: DataFrame, user: DataFrame): Unit = {
    pin.createOrReplaceTempView("pin_df")
    geo.createOrReplaceTempView("geo_df")
    user.createOrReplaceTempView("user_df")
  }

  def run(spark: SparkSession, name: String): DataFrame = spark.sql(all(name))

  /** Q1 (BATCH:176-202): most popular category per country. */
  val q1: String = """
    WITH count_df AS(
      SELECT
        geo_df.country AS country,
        pin_df.category AS category,
        COUNT(*) AS category_count,
        RANK() OVER(PARTITION BY geo_df.country ORDER BY COUNT(*) DESC) AS ranking
      FROM pin_df
      JOIN geo_df ON pin_df.ind = geo_df.ind
      GROUP BY geo_df.country, pin_df.category
    )
    SELECT country, category, category_count
    FROM count_df
    WHERE ranking = 1
    ORDER BY category_count DESC"""

  /** Q2 (BATCH:211-239): posts per category, 2018-2022. */
  val q2: String = """
    WITH year_df AS(
      SELECT
        category,
        EXTRACT(YEAR FROM timestamp) AS post_year,
        COUNT(*) AS category_count
      FROM pin_df
      JOIN geo_df ON pin_df.ind = geo_df.ind
      GROUP BY category, post_year
    )
    SELECT post_year, FIRST(category) AS category, SUM(category_count) AS category_count
    FROM year_df
    WHERE post_year BETWEEN 2018 AND 2022
    GROUP BY category, post_year
    ORDER BY post_year DESC"""

  /** Q3 (BATCH:248-274): user with most followers per country. */
  val q3: String = """
    WITH follower_df AS (
      SELECT
        geo_df.country AS country,
        pin_df.poster_name AS poster_name,
        pin_df.follower_count AS follower_count,
        RANK() OVER(PARTITION BY geo_df.country ORDER BY follower_count DESC) AS ranking
      FROM pin_df
      JOIN geo_df ON pin_df.ind = geo_df.ind
    )
    SELECT country, poster_name, MAX(follower_count) AS follower_count
    FROM follower_df
    WHERE ranking = 1
    GROUP BY country, poster_name
    ORDER BY follower_count"""

  /** Q4 (BATCH:283-310): country with the single most-followed user. */
  val q4: String = """
    WITH follower_df AS (
      SELECT
        geo_df.country AS country,
        pin_df.poster_name AS poster_name,
        pin_df.follower_count AS follower_count,
        RANK() OVER(PARTITION BY geo_df.country ORDER BY follower_count DESC) AS ranking
      FROM pin_df
      JOIN geo_df ON pin_df.ind = geo_df.ind
    )
    SELECT country, MAX(follower_count) AS follower_count
    FROM follower_df
    WHERE ranking = 1
    GROUP BY country, poster_name
    ORDER BY follower_count DESC
    LIMIT 1"""

  /** Q5 (BATCH:323-343): most popular category per age group. */
  val q5: String = """
    SELECT
      CASE
        WHEN user_df.age BETWEEN 18 AND 24 THEN '18-24'
        WHEN user_df.age BETWEEN 25 AND 35 THEN '25-35'
        WHEN user_df.age BETWEEN 36 AND 50 THEN '36-50'
        ELSE '50+'
      END AS age_group,
      pin_df.category,
      COUNT(*) AS category_count
    FROM pin_df
    JOIN user_df ON pin_df.ind = user_df.ind
    GROUP BY age_group, pin_df.category
    ORDER BY category_count DESC"""

  /** Q6 (BATCH:353-378): median follower count per age group. */
  val q6: String = """
    WITH age_groups_df AS (
      SELECT
        CASE
          WHEN user_df.age BETWEEN 18 AND 24 THEN '18-24'
          WHEN user_df.age BETWEEN 25 AND 35 THEN '25-35'
          WHEN user_df.age BETWEEN 36 AND 50 THEN '36-50'
          ELSE '50+'
        END AS age_group,
        pin_df.follower_count
      FROM pin_df
      JOIN user_df ON pin_df.ind = user_df.ind
    )
    SELECT age_group, PERCENTILE(follower_count, 0.5) AS median_follower_count
    FROM age_groups_df
    GROUP BY age_group
    ORDER BY median_follower_count DESC"""

  /** Q7 (BATCH:388-406): users joined per year, 2015-2020 (quirk Q-c:
    * the windowed count summed per-row yields count² — faithful). */
  val q7: String = """
    WITH year_df AS(
      SELECT
        EXTRACT(YEAR FROM date_joined) AS join_year,
        COUNT(*) OVER(PARTITION BY EXTRACT(YEAR FROM date_joined)) AS number_users_joined
      FROM user_df
    )
    SELECT join_year, SUM(number_users_joined) AS number_users_joined
    FROM year_df
    WHERE join_year BETWEEN 2015 AND 2020
    GROUP BY join_year"""

  /** Q8 (BATCH:415-438): median follower count per join-year. */
  val q8: String = """
    WITH year_df AS (
      SELECT
        EXTRACT(YEAR FROM user_df.date_joined) AS join_year,
        PERCENTILE(pin_df.follower_count, 0.5) OVER(
          PARTITION BY EXTRACT(YEAR FROM user_df.date_joined)
        ) AS median_follower_count
      FROM user_df
      JOIN pin_df ON user_df.ind = pin_df.ind
    )
    SELECT join_year, median_follower_count
    FROM year_df
    WHERE join_year BETWEEN 2015 AND 2020
    GROUP BY join_year, median_follower_count"""

  /** Q9 (BATCH:447-484): median follower count per join-year × age group. */
  val q9: String = """
    WITH cte AS(
      SELECT
        CASE
          WHEN user_df.age BETWEEN 18 AND 24 THEN '18-24'
          WHEN user_df.age BETWEEN 25 AND 35 THEN '25-35'
          WHEN user_df.age BETWEEN 36 AND 50 THEN '36-50'
          ELSE '50+'
        END AS age_group,
        EXTRACT(YEAR FROM user_df.date_joined) AS join_year,
        PERCENTILE(pin_df.follower_count, 0.5) OVER(
            PARTITION BY EXTRACT(YEAR FROM user_df.date_joined),
            CASE
              WHEN user_df.age BETWEEN 18 AND 24 THEN '18-24'
              WHEN user_df.age BETWEEN 25 AND 35 THEN '25-35'
              WHEN user_df.age BETWEEN 36 AND 50 THEN '36-50'
              ELSE '50+'
            END
          ) AS median_follower_count
      FROM user_df
      JOIN pin_df ON user_df.ind = pin_df.ind
    )
    SELECT age_group, join_year, median_follower_count
    FROM cte
    WHERE join_year BETWEEN 2015 AND 2020
    GROUP BY join_year, age_group, median_follower_count"""

  val all: Map[String, String] = Map(
    "q1" -> q1, "q2" -> q2, "q3" -> q3, "q4" -> q4, "q5" -> q5,
    "q6" -> q6, "q7" -> q7, "q8" -> q8, "q9" -> q9)
}
