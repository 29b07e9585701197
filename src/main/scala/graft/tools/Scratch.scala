package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.ext._

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = Engine.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    docs.count(); emb.count()

    def t(name: String)(f: => Long): Unit = {
      var best = Long.MaxValue
      var n = 0L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime(); n = f
        best = math.min(best, System.nanoTime() - t0)
      }
      println(f"[scratch] $name%-28s ${best / 1e9}%7.2f s  rows=$n")
    }

    t("kmeansAssign")(Similarity.kmeansAssign(emb).count())
    t("clusterBalancedSample")(Similarity.clusterBalancedSample(emb).count())
    t("ivfAssign")(Similarity.ivfAssign(emb).count())
    t("semanticDedup")(Similarity.semanticDedup(emb).count())
    t("semanticDupLosers")(Similarity.semanticDupLosers(emb).count())
    t("annIvfTopK")(Similarity.ivfTopK(emb, emb.where(col("vec_id") % 100 === 0)).count())
    t("neardupEmbeddings")(Similarity.nearDupPairs(emb).count())
    t("embeddingCentroids")(Similarity.labelCentroids(emb).count())
    t("pretrainingCorpus")(Curation.pretrainingCorpus(docs, emb).orderBy("doc_id").count())
    spark.stop()
  }
}
