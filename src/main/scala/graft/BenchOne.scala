package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual entries (args = names), printing as each
  * finishes — for isolating slow queries. Each entry runs twice (cold
  * then warm — the warm number is the comparable one) with the host
  * load stamped per line, so an isolated measurement carries the same
  * noise evidence as the full bench. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    // ambient stamp BEFORE the SparkSession exists (same first-class
    // noise evidence as Bench's load_avg.ambient_premain field)
    val ambient =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+").take(1).mkString
      catch { case _: Exception => "?" }
    println(s"[benchone] ambient_premain load1m=$ambient")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Engine.prepare(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def load(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+").take(1).mkString
      catch { case _: Exception => "?" }
    def cpuNs(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
        case _ => -1L
      }
    args.foreach { name =>
      (1 to 2).foreach { pass =>
        val c0 = cpuNs()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = if (c0 < 0) -1.0 else (cpuNs() - c0) / 1e9
        val tag = if (pass == 1) "cold" else "warm"
        println(f"[benchone] $name ($tag) rows=$n wall=$wall%.2f cpu=$cpu%.2f load1m=${load()}")
      }
    }
    spark.stop()
  }
}
