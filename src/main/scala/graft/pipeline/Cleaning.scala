package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, IntegerType}

/** The reference's cleaning layer (SURVEY.md §2.2, C1-C13) as pure
  * `DataFrame => DataFrame` transforms, ONE implementation shared by the
  * batch and streaming paths (the reference duplicates the code:
  * BATCH:76-155 ≡ STREAM:114-190 minus the batch-only `orderBy`).
  *
  * Fidelity notes (SURVEY.md §2.8 quirks, reproduced deliberately):
  *  - Q-a: `(\d)k$` → `$1` strips a trailing `k` with NO ×1000 ("25k"→25);
  *    `(\d)M$` → `$1000` ("2M"→2000). BATCH:90-91.
  *  - Q-b: the user table is NEVER deduplicated — the reference discards
  *    the `dropDuplicates()` result (BATCH:139). `cleanUser` mirrors that.
  *  - Q-e: the reference's sentinel list holds 6 entries with one
  *    duplicate; the distinct set of 5 is what matters.
  *  - Q-g: `coordinates` is an array of the *string* lat/long columns.
  *  - casts rely on ANSI-off null-on-bad-cast semantics (quirk Q-j);
  *    sessions must run with `spark.sql.ansi.enabled=false` (Engine.scala).
  *
  * Every op is a narrow, codegen'd projection (CASE WHEN / regexp / cast):
  * at 100 TB this whole layer is a single WholeStageCodegen stage fused
  * into the scan — no shuffle except the explicit `dropDuplicates` (a
  * hash-partitioned distinct) and the batch-only cosmetic `orderBy`.
  */
object Cleaning {

  /** Sentinel strings mapped to NULL by the per-column CASE projection
    * (BATCH:79, distinct set — quirk Q-e). */
  val sentinels: Seq[String] = Seq(
    "No description available Story format",
    "User Info Error",
    "Image src error",
    "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e",
    "No Title Data Available")

  /** C2: per-column null/empty/sentinel normalization (BATCH:79-86).
    * Applied to every column; on non-string columns the comparisons
    * null out under ANSI-off casts and the op is a no-op, exactly as in
    * the reference (which loops over all 12 inferred columns). */
  def nullifyErroneous(df: DataFrame): DataFrame =
    df.select(df.columns.toIndexedSeq.map { c =>
      when(col(c) === "", lit(null))
        .when(col(c).isNull, lit(null))
        .when(col(c).isin(sentinels: _*), lit(null))
        .otherwise(col(c))
        .as(c)
    }: _*)

  /** Clean the pin table (BATCH:76-103; streaming twin STREAM:114-143).
    * @param sort  batch applies a cosmetic global `orderBy("ind")`
    *              (BATCH:100); streams must not sort (append mode).
    * @param dedup disable when an upstream watermarked dedup already
    *              ran (StreamJob's bounded-state mode). */
  def cleanPin(raw: DataFrame, sort: Boolean = true, dedup: Boolean = true): DataFrame = {
    var df = if (dedup) raw.dropDuplicates() else raw // C1
    df = nullifyErroneous(df) // C2
    // C3-C5 regex normalizations (quirk Q-a semantics preserved).
    df = df.withColumn("save_location",
      regexp_replace(col("save_location"), "^Local save in", ""))
    df = df.withColumn("follower_count",
      regexp_replace(col("follower_count"), "(\\d)k$", "$1"))
    df = df.withColumn("follower_count",
      regexp_replace(col("follower_count"), "(\\d)M$", "$1000"))
    // C6 casts (ANSI-off: junk → NULL).
    df = df.withColumn("follower_count", col("follower_count").cast(IntegerType))
    df = df.withColumn("downloaded", col("downloaded").cast(BooleanType))
    // C7 rename + C8 fixed projection order (BATCH:98-99).
    df = df.withColumnRenamed("index", "ind")
    df = df.select("ind", "unique_id", "title", "description",
      "follower_count", "poster_name", "tag_list", "is_image_or_video",
      "image_src", "save_location", "category", "downloaded")
    if (sort) df = df.orderBy("ind") // C9 (batch only)
    df.withColumn("ind", col("ind").cast(IntegerType))
  }

  /** Clean the geo table (BATCH:112-130; STREAM:149-166). */
  def cleanGeo(raw: DataFrame, sort: Boolean = true, dedup: Boolean = true): DataFrame = {
    var df = if (dedup) raw.dropDuplicates() else raw // C1
    // C10 array column from *string* lat/long (quirk Q-g).
    df = df.withColumn("coordinates", array(col("latitude"), col("longitude")))
    df = df.drop("latitude", "longitude")
    df = df.withColumn("timestamp", to_timestamp(col("timestamp"))) // C11
    df = df.withColumnRenamed("index", "ind") // C7
    df = df.select("ind", "country", "coordinates", "timestamp") // C8
    if (sort) df = df.orderBy("ind") // C9
    df = df.withColumn("country", trim(col("country"))) // C12 (after select!)
    df.withColumn("ind", col("ind").cast(IntegerType))
  }

  /** Clean the user table (BATCH:139-155; STREAM:175-190).
    * NOTE: no dedup — reference quirk Q-b (BATCH:139 discards the
    * `dropDuplicates()` result, so duplicates survive downstream). */
  def cleanUser(raw: DataFrame, sort: Boolean = true): DataFrame = {
    var df = raw
    df = df.withColumn("user_name",
      concat(col("first_name"), lit(" "), col("last_name"))) // C13
    df = df.drop("first_name", "last_name")
    df = df.withColumn("date_joined", to_timestamp(col("date_joined"))) // C11
    df = df.withColumn("age", col("age").cast(IntegerType)) // C6
    df = df.withColumnRenamed("index", "ind") // C7
    df = df.select("ind", "user_name", "age", "date_joined") // C8
    if (sort) df = df.orderBy("ind") // C9
    df.withColumn("ind", col("ind").cast(IntegerType))
  }
}
