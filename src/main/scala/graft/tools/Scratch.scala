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
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    // warm
    docs.count(); emb.count()
    def reuse(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.count() // let AQE finalize
      val s = df.queryExecution.executedPlan.toString
      println(s"[scratch] $name reusedExchange=" +
        "ReusedExchange".r.findAllIn(s).size +
        " exchanges=" + "Exchange".r.findAllIn(s).size)
    }
    reuse("ngramJaccardPairs", Dedup.ngramJaccardPairs(docs))
    val assigned0 = Similarity.ivfAssign(emb)
    val a0 = assigned0.select(col("cell"), col("vec_id").as("a_id"))
    val b0 = assigned0.select(col("cell"), col("vec_id").as("b_id"))
    reuse("cell self-join", a0.join(b0, "cell").where(col("a_id") < col("b_id")))
    t("full pretrainingCorpus")(Curation.pretrainingCorpus(docs, emb).orderBy("doc_id").count())
    t("ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs).count())
    t("leakageSafeSplit")(Sampling.leakageSafeSplit(docs, Dedup.ngramJaccardPairs(docs)).count())
    t("lmQuality")(TextAnalysis.lmQuality(docs).count())
    t("repetitionScore")(TextAnalysis.repetitionScore(docs).count())
    t("exact keepers")(Dedup.exact(docs).count())
    t("semanticDupLosers")(Similarity.semanticDupLosers(emb).count())
    t("perRow lang+quality")(TextAnalysis.withQuality(TextAnalysis.langId(docs)).count())
    t("full again")(Curation.pretrainingCorpus(docs, emb).orderBy("doc_id").count())
    t("full 3rd")(Curation.pretrainingCorpus(docs, emb).orderBy("doc_id").count())
    spark.stop()
  }
}
