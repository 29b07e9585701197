package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): write `explain("formatted")` output
  * for entries to plans/<tag>/<name>_<suffix>.txt — the judge checks
  * plan claims against these committed files. Usage:
  *   runMain graft.PlanSnap <tag> <suffix> <entry> [entry...]
  * e.g. runMain graft.PlanSnap r18 before knn_pagerank image_dup_verified */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val tag = args(0); val suffix = args(1); val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Engine.prepare(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(s"plans/$tag").mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute once so AQE's final plan is available alongside the
      // initial formatted plan (explain prints the pre-execution tree;
      // the executed plan carries the AQE-final join strategies)
      df.count()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val executed = df.queryExecution.executedPlan.toString
      val w = new java.io.PrintWriter(s"plans/$tag/${name}_$suffix.txt")
      try {
        w.println(s"== $name ($suffix) sf=$sfDir ==")
        w.println(formatted)
        w.println("== AQE-final executed plan ==")
        w.println(executed.take(120000))
      } finally w.close()
      println(s"wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
