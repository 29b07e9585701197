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

    t("lmQuality")(TextAnalysis.lmQuality(docs).count())
    // force real evaluation: filter on the signal so count can't prune
    t("quality eval")(TextAnalysis.withQuality(docs)
      .where(col("quality") >= -1).count())
    t("repetition eval")(TextAnalysis.withRepetition(docs)
      .where(col("repetition") >= -1).count())
    t("langId eval")(TextAnalysis.langId(docs)
      .where(col("lang_conf") >= -1).count())
    t("exact keepers")(Dedup.exact(docs).count())
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages.add((si.stageId, dur, si.name.take(60)))
      }
    }
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val pc = Curation.pretrainingCorpus(docs, emb)
      val t1 = System.nanoTime()
      if (i == 3) spark.sparkContext.addSparkListener(listener)
      val n = pc.orderBy("doc_id").count()
      val t2 = System.nanoTime()
      println(f"[scratch] pc construct ${(t1 - t0) / 1e9}%5.2f s  exec ${(t2 - t1) / 1e9}%5.2f s  rows=$n")
    }
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (id, dur, nm) =>
      println(f"[scratch-stage] $id%4d ${dur / 1000.0}%6.2f s  $nm")
    }
    spark.stop()
  }
}
