package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch experiment (r18): imageDupVerified recompute diagnosis. */
object ProfPR {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.Engine.prepare(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var runSum = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        if (ev.stageInfo.taskMetrics != null)
          runSum += ev.stageInfo.taskMetrics.executorRunTime
    })
    import spark.implicits._
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val variants = base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      expr("concat(upper(substring(text, 1, 12)), substring(text, 13))").as("text"))
    val assets = base.select(col("doc_id"), col("text"))
      .unionByName(variants)
      .select(col("doc_id").as("asset_id"),
        encode(col("text"), "UTF-8").as("media"),
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        lit(32).as("width"), lit(32).as("height"))

    def mad(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => abs(x - y)),
        lit(0L), (acc, v) => acc + v.cast("long"))

    // variant: 0 = current (cache + eager count), 1 = px+groups localCheckpoint
    def build(variant: Int): DataFrame = {
      val maxHamming = 3; val maxSumDiff = 1024L
      val rs0 = Multimodal.resize(spark, assets).toDF()
        .select(col("asset_id"), col("media"),
          graft.functions.AHash64.ahash64(col("media")).as("ahash"))
      val rs = if (variant == 0) { val c = rs0.cache(); c.count(); c }
               else rs0.localCheckpoint()
      val px0 = rs.select(col("asset_id"), col("media"))
        .as[(Long, Array[Byte])]
        .map { case (id, m) => (id, m.map(b => b & 0xff)) }
        .toDF("asset_id", "px")
      val px = if (variant == 0) px0 else px0.localCheckpoint()
      val groups0 = rs.groupBy(col("ahash"))
        .agg(min(col("asset_id")).as("rep_id"), count(lit(1)).as("n_members"))
      val groups = if (variant == 0) groups0 else groups0.localCheckpoint()
      val audit = rs.select(col("ahash"), col("asset_id"))
        .join(groups, "ahash")
        .join(px.toDF("asset_id", "pm"), "asset_id")
        .join(px.toDF("rep_id", "pr"), "rep_id")
        .groupBy(col("rep_id"))
        .agg(min(col("n_members")).as("n_members"),
          sum(when(mad(col("pm"), col("pr")) <= maxSumDiff, 1L)
            .otherwise(0L)).as("n_verified"))
      val pairs = Dedup.simhashPairsFrom(
        groups.select(col("rep_id").as("doc_id"), col("ahash").as("simhash")),
        maxHamming)
      pairs
        .join(audit.toDF("a_id", "n_a", "n_a_verified"), "a_id")
        .join(audit.toDF("b_id", "n_b", "n_b_verified"), "b_id")
        .join(px.toDF("a_id", "pa"), "a_id")
        .join(px.toDF("b_id", "pb"), "b_id")
        .withColumn("sum_abs_diff", mad(col("pa"), col("pb")))
        .where(col("sum_abs_diff") <= maxSumDiff)
        .select(col("a_id"), col("b_id"), col("hamming"),
          col("sum_abs_diff"), col("n_a"), col("n_a_verified"),
          col("n_b"), col("n_b_verified"))
    }

    def time(tag: String)(f: => Unit): Unit = {
      Thread.sleep(200); runSum = 0
      val t0 = System.nanoTime(); f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"  $tag: wall=$w%.3f s runSum=${runSum / 1000.0}%.1f s")
    }

    (1 to 3).foreach { i => time(s"v0-cache pass$i") { build(0).count() } }
    (1 to 3).foreach { i => time(s"v1-ckpt pass$i") { build(1).count() } }
    val a = build(0).orderBy("a_id", "b_id").collect()
    val b = build(1).orderBy("a_id", "b_id").collect()
    println(s"  equal=${a.sameElements(b)} rows=${a.length}")
    // what does v0's executed plan actually scan?
    val d0 = build(0); d0.count()
    val p0 = d0.queryExecution.executedPlan.toString
    println(s"  v0 InMemoryTableScan=${"InMemoryTableScan".r.findAllIn(p0).size} MapElements=${"MapElements".r.findAllIn(p0).size} Scan parquet=${"Scan parquet".r.findAllIn(p0).size}")
    spark.stop()
  }
}
