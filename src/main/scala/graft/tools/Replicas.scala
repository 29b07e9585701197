package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared staging for the scale harnesses (ScaleProbe trajectories,
  * ScaleVerify hash-invariance): replicate the sf0.1 corpus n× with
  * ids shifted per copy, every token tagged with the copy index and
  * embeddings circularly shifted — copies are cross-copy DISTINCT, so
  * the duplication RATE stays constant as the corpus grows (a
  * one-token salt would make every copy a near-duplicate of its
  * siblings and grow the true pair count quadratically in the
  * multiple — a workload shape real corpus growth doesn't have; the
  * first probe design did exactly that). Replicas are cached under
  * `out` and guarded on BOTH _SUCCESS markers: a prior run that wrote
  * docs_n but died before emb_n must re-stage. */
object Replicas {

  def docsPath(out: String, n: Int): String = s"$out/docs_$n"
  def embPath(out: String, n: Int): String = s"$out/emb_$n"
  def plainDocsPath(out: String, n: Int): String = s"$out/docsplain_$n"

  /** n× docs with ids shifted but text UNTOUCHED — copies are exact
    * duplicates. Not a trajectory corpus (the dup rate grows with n);
    * used by ScaleVerify for entries whose natural-language filters
    * (stopword ratios, lang id) a copy-tagged token stream fails
    * wholesale, where the exact-dup mass exercises the dedup tiers
    * instead. */
  def ensurePlainDocs(spark: SparkSession, sfDir: String, out: String,
      n: Int): Unit = {
    if (new java.io.File(s"${plainDocsPath(out, n)}/_SUCCESS").exists()) return
    spark.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(spark.range(n).toDF("__c"))
      .withColumn("doc_id", col("doc_id") + col("__c") * 10000000L)
      .drop("__c")
      .repartition(32).write.mode("overwrite")
      .parquet(plainDocsPath(out, n))
  }

  def ensure(spark: SparkSession, sfDir: String, out: String, n: Int): Unit = {
    if (new java.io.File(s"${docsPath(out, n)}/_SUCCESS").exists() &&
        new java.io.File(s"${embPath(out, n)}/_SUCCESS").exists()) return
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // keeps the __c copy-index column for the caller to fold into the
    // payload before dropping
    def replicate(base: DataFrame, idCol: String): DataFrame =
      base.crossJoin(spark.range(n).toDF("__c"))
        .withColumn(idCol, col(idCol) + col("__c") * 10000000L)
    replicate(docs0, "doc_id")
      .withColumn("text", regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("c"), col("__c").cast("string"), lit("_$1"))))
      .drop("__c")
      .repartition(32).write.mode("overwrite").parquet(docsPath(out, n))
    replicate(emb0, "vec_id")
      .withColumn("__s",
        pmod(col("__c"), size(col("embedding")).cast("long")).cast("int"))
      .withColumn("embedding",
        concat(
          slice(col("embedding"), col("__s") + 1,
            size(col("embedding")) - col("__s")),
          slice(col("embedding"), lit(1), col("__s"))))
      .drop("__c", "__s")
      .repartition(32).write.mode("overwrite").parquet(embPath(out, n))
  }
}
