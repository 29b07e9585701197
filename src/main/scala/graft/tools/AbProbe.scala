package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.ext._

/** Throwaway A/B timing probe (not part of the library surface):
  * instance-joined vs counts-joined LM scoring, same session. */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = Engine.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$d/documents.parquet").cache()
    docs.count()
    def cpuNs(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
        case _ => -1L
      }
    def t(name: String)(f: => Long): Unit = {
      var bestW = Double.MaxValue; var bestC = Double.MaxValue
      var n = 0L
      for (_ <- 1 to 3) {
        val c0 = cpuNs(); val t0 = System.nanoTime(); n = f
        bestW = math.min(bestW, (System.nanoTime() - t0) / 1e9)
        bestC = math.min(bestC, (cpuNs() - c0) / 1e9)
      }
      println(f"[ab] $name%-24s wall=$bestW%6.2f cpu=$bestC%7.2f rows=$n")
    }

    // OLD shape: model joined against raw bigram instances.
    def bigramOld(docs: DataFrame): DataFrame = {
      val bi = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
        .where(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1).as("tok"),
          slice(col("ws"), lit(2), size(col("ws")) - 1).as("next"))).as("p"))
        .select(col("doc_id"), col("p.tok").as("tok"), col("p.next").as("next"))
      val bf = bi.groupBy(col("tok"), col("next")).agg(count(lit(1)).as("bf"))
      val cf = bi.groupBy(col("tok")).agg(count(lit(1)).as("cf"))
      val scored = bi.join(bf, Seq("tok", "next")).join(cf, Seq("tok"))
        .select(col("doc_id"),
          round(log(col("bf").cast("double") / col("cf").cast("double"))
            * 1000000).cast("long").as("q"))
      scored.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("sum_q_logprob"))
        .withColumn("mean_logprob",
          col("sum_q_logprob").cast("double") / col("n_bigrams").cast("double")
            / 1000000)
    }

    t("bigram OLD (instances)")(bigramOld(docs).where(col("mean_logprob") <= 0).count())
    t("bigram NEW (counts)")(TextAnalysis.bigramLmQuality(docs)
      .where(col("mean_logprob") <= 0).count())
    t("lmQuality NEW (counts)")(TextAnalysis.lmQuality(docs)
      .where(col("mean_logprob") <= 0).count())
    spark.stop()
  }
}
