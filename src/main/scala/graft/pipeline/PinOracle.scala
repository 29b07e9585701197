package graft.pipeline

/** DuckDB oracle twins for the pin/geo/user pipeline entries.
  *
  * Each SQL string is a self-contained WITH-query over the driver's
  * parquet tables (orders/customer/nation) that independently recomputes
  * raw derivation (RawDerive), cleaning (C1-C13, Cleaning) and the nine
  * analytics queries (PinQueries). Written in DuckDB dialect, NOT shared
  * text with the Spark side — an honest independent oracle.
  *
  * Cross-engine determinism rules used throughout:
  *  - only integer arithmetic / string concat in the derivation;
  *  - TRY_CAST mirrors Spark ANSI-off junk→NULL casts;
  *  - COUNT/SUM results cast to BIGINT (DuckDB sums to HUGEINT);
  *  - EXTRACT(YEAR) cast to INT (Spark `year()` is IntegerType);
  *  - quantile_cont ≡ Spark `percentile` (linear interpolation);
  *  - every query ends with an explicit total ORDER BY matching
  *    Engine.canonical (ASC NULLS FIRST per output column);
  *  - timestamps in dumped outputs are cast to VARCHAR ('yyyy-MM-dd
  *    HH:mm:ss' in both engines) to sidestep tz-encoding mismatches.
  */
object PinOracle {

  private val sentinelList = Cleaning.sentinels.map(s => s"'$s'").mkString(", ")

  /** C2 null-map for one string column. */
  private def nullmap(c: String): String =
    s"CASE WHEN $c = '' OR $c IN ($sentinelList) THEN NULL ELSE $c END"

  private def pad2(e: String) = s"lpad(CAST($e AS VARCHAR), 2, '0')"

  private def isoTs(y: String, mo: String, d: String, h: String, mi: String, se: String) =
    s"CAST($y AS VARCHAR) || '-' || ${pad2(mo)} || '-' || ${pad2(d)} || 'T' || " +
      s"${pad2(h)} || ':' || ${pad2(mi)} || ':' || ${pad2(se)}"

  /** Shared CTE prefix: raw derivation + cleaned pin_df/geo_df/user_df. */
  val ctes: String = s"""
raw_pin0 AS (
  SELECT
    o_orderkey AS idx,
    'uid-' || CAST(o_orderkey AS VARCHAR) AS unique_id,
    CASE WHEN o_orderkey % 13 = 0 THEN 'No Title Data Available'
         WHEN o_orderkey % 13 = 1 THEN ''
         ELSE 'Title ' || CAST(o_orderkey % 50 AS VARCHAR) END AS title,
    CASE WHEN o_orderkey % 17 = 0 THEN 'No description available Story format'
         WHEN o_orderkey % 17 = 1 THEN ''
         ELSE 'Desc ' || CAST(o_orderkey % 40 AS VARCHAR) END AS description,
    CASE WHEN o_orderkey % 19 = 0 THEN 'User Info Error'
         ELSE 'Poster ' || CAST(o_custkey % 37 AS VARCHAR) END AS poster_name,
    CASE WHEN o_orderkey % 11 = 0 THEN 'User Info Error'
         WHEN o_orderkey % 11 = 1 THEN CAST(o_custkey % 90 AS VARCHAR) || 'k'
         WHEN o_orderkey % 11 = 2 THEN CAST(o_custkey % 9 + 1 AS VARCHAR) || 'M'
         WHEN o_orderkey % 11 = 3 THEN ''
         ELSE CAST((o_custkey * 97) % 100000 AS VARCHAR) END AS follower_count,
    CASE WHEN o_orderkey % 23 = 0 THEN 'N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e'
         ELSE 'tag' || CAST(o_orderkey % 7 AS VARCHAR) || ',tag' || CAST(o_orderkey % 5 AS VARCHAR) END AS tag_list,
    CASE WHEN o_orderkey % 3 = 0 THEN 'image'
         WHEN o_orderkey % 3 = 1 THEN 'video'
         ELSE 'multi-video(story page format)' END AS is_image_or_video,
    CASE WHEN o_orderkey % 29 = 0 THEN 'Image src error'
         ELSE 'https://i.example.com/' || CAST(o_orderkey AS VARCHAR) || '.jpg' END AS image_src,
    CAST(o_orderkey % 2 AS VARCHAR) AS downloaded,
    'Local save in /data/cat-' || CAST(o_orderkey % 12 AS VARCHAR) AS save_location,
    'cat-' || CAST(o_orderkey % 12 AS VARCHAR) AS category
  FROM orders),
raw_pin AS (SELECT * FROM raw_pin0
            UNION ALL SELECT * FROM raw_pin0 WHERE idx % 10 = 0),
pin_df AS (
  SELECT
    CAST(idx AS INT) AS ind,
    ${nullmap("unique_id")} AS unique_id,
    ${nullmap("title")} AS title,
    ${nullmap("description")} AS description,
    TRY_CAST(regexp_replace(regexp_replace(${nullmap("follower_count")},
      '(\\d)k$$', '\\1'), '(\\d)M$$', '\\1000') AS INT) AS follower_count,
    ${nullmap("poster_name")} AS poster_name,
    ${nullmap("tag_list")} AS tag_list,
    ${nullmap("is_image_or_video")} AS is_image_or_video,
    ${nullmap("image_src")} AS image_src,
    regexp_replace(${nullmap("save_location")}, '^Local save in', '') AS save_location,
    ${nullmap("category")} AS category,
    TRY_CAST(${nullmap("downloaded")} AS BOOLEAN) AS downloaded
  FROM (SELECT DISTINCT * FROM raw_pin)),
raw_geo0 AS (
  SELECT
    o_orderkey AS idx,
    ${isoTs("o_orderkey % 9 + 2016", "o_orderkey % 12 + 1", "o_orderkey % 28 + 1",
      "o_orderkey % 24", "o_orderkey % 60", "(o_orderkey * 7) % 60")} AS ts,
    CAST(o_orderkey * 13 % 181 - 90 AS VARCHAR) AS latitude,
    CAST(o_orderkey * 3 % 361 - 180 AS VARCHAR) AS longitude,
    CASE WHEN o_orderkey % 5 = 0 THEN '  ' || n_name || ' '
         ELSE n_name END AS country
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey),
raw_geo AS (SELECT * FROM raw_geo0
            UNION ALL SELECT * FROM raw_geo0 WHERE idx % 10 = 0),
geo_df AS (
  SELECT
    CAST(idx AS INT) AS ind,
    trim(country) AS country,
    [latitude, longitude] AS coordinates,
    TRY_CAST(ts AS TIMESTAMP) AS "timestamp"
  FROM (SELECT DISTINCT * FROM raw_geo)),
raw_user0 AS (
  SELECT
    o_orderkey AS idx,
    ${isoTs("o_orderkey % 9 + 2014", "(o_orderkey * 3) % 12 + 1",
      "(o_orderkey * 5) % 27 + 1", "(o_orderkey * 11) % 24",
      "(o_orderkey * 13) % 60", "(o_orderkey * 17) % 60")} AS date_joined,
    'F' || CAST(o_custkey % 40 AS VARCHAR) AS first_name,
    'L' || CAST(o_orderkey % 60 AS VARCHAR) AS last_name,
    CAST((o_orderkey * 7) % 60 + 10 AS VARCHAR) AS age
  FROM orders),
raw_user AS (SELECT * FROM raw_user0
             UNION ALL SELECT * FROM raw_user0 WHERE idx % 10 = 0),
user_df AS (
  SELECT
    CAST(idx AS INT) AS ind,
    first_name || ' ' || last_name AS user_name,
    TRY_CAST(age AS INT) AS age,
    TRY_CAST(date_joined AS TIMESTAMP) AS date_joined
  FROM raw_user)
""".trim

  /** Age bucket CASE over user_df alias `u` (quirk Q-f: ELSE catches
    * under-18 and NULL). */
  private val ageCase: String =
    """CASE WHEN u.age BETWEEN 18 AND 24 THEN '18-24'
      |     WHEN u.age BETWEEN 25 AND 35 THEN '25-35'
      |     WHEN u.age BETWEEN 36 AND 50 THEN '36-50'
      |     ELSE '50+' END""".stripMargin

  private def ord(cols: Seq[String]): String =
    cols.map(c => s"$c ASC NULLS FIRST").mkString("ORDER BY ", ", ", "")

  /** Full cleaned-table dumps. `ind` is unique after dedup (pin/geo) and
    * user duplicates are whole-row-identical, so ORDER BY ind is a total
    * order on content. Timestamps stringified for comparison. */
  val pinClean: String = s"""WITH $ctes
SELECT * FROM pin_df
${ord(Seq("ind"))}"""

  /** The dump serializes the C10 array as 'lat|long' (gate checker runs
    * in pandas, which cannot sort/hash an array column); the engine-side
    * twin applies the same concat_ws to its internal Array[String]. */
  val geoClean: String = s"""WITH $ctes
SELECT ind, country,
  array_to_string(coordinates, '|') AS coordinates_str,
  CAST("timestamp" AS VARCHAR) AS timestamp_str
FROM geo_df
${ord(Seq("ind"))}"""

  val userClean: String = s"""WITH $ctes
SELECT ind, user_name, age, CAST(date_joined AS VARCHAR) AS date_joined_str
FROM user_df
${ord(Seq("ind"))}"""

  val q1: String = s"""WITH $ctes,
counts AS (
  SELECT g.country, p.category, CAST(COUNT(*) AS BIGINT) AS category_count
  FROM pin_df p JOIN geo_df g ON p.ind = g.ind
  GROUP BY g.country, p.category),
ranked AS (
  SELECT *, RANK() OVER (PARTITION BY country
    ORDER BY category_count DESC) AS ranking FROM counts)
SELECT country, category, category_count FROM ranked WHERE ranking = 1
${ord(Seq("country", "category", "category_count"))}"""

  val q2: String = s"""WITH $ctes,
year_df AS (
  SELECT p.category,
    CAST(EXTRACT(YEAR FROM g."timestamp") AS INT) AS post_year,
    CAST(COUNT(*) AS BIGINT) AS category_count
  FROM pin_df p JOIN geo_df g ON p.ind = g.ind
  GROUP BY p.category, post_year)
SELECT post_year, category, category_count FROM year_df
WHERE post_year BETWEEN 2018 AND 2022
${ord(Seq("post_year", "category", "category_count"))}"""

  private val followerCte: String = s"""
follower_df AS (
  SELECT g.country, p.poster_name, p.follower_count,
    RANK() OVER (PARTITION BY g.country
      ORDER BY p.follower_count DESC NULLS LAST) AS ranking
  FROM pin_df p JOIN geo_df g ON p.ind = g.ind)""".trim

  val q3: String = s"""WITH $ctes,
$followerCte
SELECT country, poster_name, MAX(follower_count) AS follower_count
FROM follower_df WHERE ranking = 1
GROUP BY country, poster_name
${ord(Seq("country", "poster_name", "follower_count"))}"""

  val q4: String = s"""WITH $ctes,
$followerCte
SELECT country, follower_count FROM (
  SELECT country, MAX(follower_count) AS follower_count
  FROM follower_df WHERE ranking = 1
  GROUP BY country, poster_name
  ORDER BY follower_count DESC NULLS LAST, country ASC
  LIMIT 1)
${ord(Seq("country", "follower_count"))}"""

  val q5: String = s"""WITH $ctes
SELECT $ageCase AS age_group, p.category,
  CAST(COUNT(*) AS BIGINT) AS category_count
FROM pin_df p JOIN user_df u ON p.ind = u.ind
GROUP BY age_group, p.category
${ord(Seq("age_group", "category", "category_count"))}"""

  val q6: String = s"""WITH $ctes
SELECT $ageCase AS age_group,
  CAST(quantile_cont(p.follower_count, 0.5) AS DOUBLE) AS median_follower_count
FROM pin_df p JOIN user_df u ON p.ind = u.ind
GROUP BY age_group
${ord(Seq("age_group", "median_follower_count"))}"""

  val q7: String = s"""WITH $ctes,
y AS (
  SELECT CAST(EXTRACT(YEAR FROM date_joined) AS INT) AS join_year,
    COUNT(*) AS n
  FROM user_df GROUP BY join_year)
SELECT join_year, CAST(n * n AS BIGINT) AS number_users_joined
FROM y WHERE join_year BETWEEN 2015 AND 2020
${ord(Seq("join_year", "number_users_joined"))}"""

  val q8: String = s"""WITH $ctes,
j AS (
  SELECT CAST(EXTRACT(YEAR FROM u.date_joined) AS INT) AS join_year,
    p.follower_count
  FROM user_df u JOIN pin_df p ON u.ind = p.ind)
SELECT join_year,
  CAST(quantile_cont(follower_count, 0.5) AS DOUBLE) AS median_follower_count
FROM j WHERE join_year BETWEEN 2015 AND 2020
GROUP BY join_year
${ord(Seq("join_year", "median_follower_count"))}"""

  val q9: String = s"""WITH $ctes,
j AS (
  SELECT $ageCase AS age_group,
    CAST(EXTRACT(YEAR FROM u.date_joined) AS INT) AS join_year,
    p.follower_count
  FROM user_df u JOIN pin_df p ON u.ind = p.ind)
SELECT age_group, join_year,
  CAST(quantile_cont(follower_count, 0.5) AS DOUBLE) AS median_follower_count
FROM j WHERE join_year BETWEEN 2015 AND 2020
GROUP BY age_group, join_year
${ord(Seq("age_group", "join_year", "median_follower_count"))}"""
}
