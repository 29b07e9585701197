package graft

import org.apache.spark.sql.SparkSession

/** Throwaway experiment main (optimization round): wall time of two
  * consecutive invocations of entries (bench-like min-of-2 shape). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Engine.prepare(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.warmTables(spark, sfDir)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime(); fn(spark, sfDir).count()
      val w1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); fn(spark, sfDir).count()
      val w2 = (System.nanoTime() - t1) / 1e9
      println(f"[scratch] $name%-28s w1=$w1%6.2f w2=$w2%6.2f")
    }
    spark.stop()
  }
}
