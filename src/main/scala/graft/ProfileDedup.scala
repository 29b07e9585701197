package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev tool: sub-plan timings for the dedup pipelines. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.prepare(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    time("shingles")(sh.count())
    time("shingles_forced")(sh.select(explode(col("sh"))).count())
    val hs = sh.select(col("doc_id"), Dedup.shingleHashes(col("sh")).as("hs"))
    time("hashes")(hs.select(explode(col("hs"))).count())
    val sigs = hs.select(col("doc_id"), Dedup.minhashSignature(col("hs")).as("sig"))
    time("sigs")(sigs.select(explode(col("sig"))).count())
    time("lsh_full")(Dedup.minhashLshPairs(docs).count())
    val exploded = sh.withColumn("n_sh", size(col("sh")))
      .select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
    time("exploded")(exploded.count())
    val a = exploded.toDF("a_id", "a_n", "s")
    val b = exploded.toDF("b_id", "b_n", "s")
    time("pair_join")(a.join(b, "s").where(col("a_id") < col("b_id")).count())
    time("ngram_full")(Dedup.ngramJaccardPairs(docs).count())
    spark.stop()
  }
}
