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

    t("knnPageRank5")(Similarity.knnPageRank(emb).count())
    // pretraining_corpus phase anatomy (matches Curation.pretrainingCorpus)
    t("semanticDupLosers")(Similarity.semanticDupLosers(emb).count())
    t("splitMinhash")(
      Sampling.leakageSafeSplit(docs, Dedup.minhashLshPairsPortable(docs)).count())
    t("perRow (lang+qual+rep)")(TextAnalysis.withRepetition(
      TextAnalysis.withQuality(TextAnalysis.langId(docs)))
      .select(col("doc_id"), col("lang_pred"), col("quality"), col("repetition"))
      .where(col("quality") >= 0).count())
    t("lmQuality")(TextAnalysis.lmQuality(docs)
      .where(col("mean_logprob") <= 0).count())
    t("exactKeepers")(Dedup.exact(docs).count())
    t("pretrainingCorpus")(Curation.pretrainingCorpus(docs, emb).orderBy("doc_id").count())
    spark.stop()
  }
}
