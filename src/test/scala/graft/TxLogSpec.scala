package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** The transactional-log contract, property by property: snapshot
  * semantics (append extends, overwrite resets, time travel reads
  * history), atomic version claim under collision, exactly-once batch
  * replay, vacuum safety, and restart-without-duplication through the
  * real streaming path. */
class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("append extends, overwrite resets, every version stays readable") {
    val t = tmp("txlog_basic")
    val v0 = TxLog.write(Seq(1L, 2L).toDF("id"), t, "overwrite")
    val v1 = TxLog.write(Seq(3L).toDF("id"), t, "append")
    val v2 = TxLog.write(Seq(9L).toDF("id"), t, "overwrite")
    assert(Seq(v0, v1, v2) == Seq(0L, 1L, 2L))
    assert(ids(TxLog.snapshot(spark, t, Some(0L))) == Seq(1L, 2L))
    assert(ids(TxLog.snapshot(spark, t, Some(1L))) == Seq(1L, 2L, 3L))
    assert(ids(TxLog.snapshot(spark, t)) == Seq(9L))
    assert(TxLog.latestVersion(t).contains(2L))
  }

  test("version collision: the loser retries upward, both commits land") {
    val t = tmp("txlog_race")
    TxLog.write(Seq(1L).toDF("id"), t, "append")
    // simulate a concurrent writer claiming version 1 out from under us
    Files.createDirectories(Paths.get(t, "_txlog"))
    Files.write(Paths.get(t, "_txlog", f"${1L}%010d.txt"),
      "mode=append\nbatch=-1\n".getBytes("UTF-8"))
    val v = TxLog.write(Seq(2L).toDF("id"), t, "append")
    assert(v == 2L, "loser must land at the next free version")
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L, 2L))
  }

  test("exactly-once: a replayed batch id commits nothing") {
    val t = tmp("txlog_once")
    assert(TxLog.write(Seq(1L).toDF("id"), t, "append", batchId = 7L) == 0L)
    assert(TxLog.write(Seq(1L).toDF("id"), t, "append", batchId = 7L) == -1L)
    assert(TxLog.write(Seq(2L).toDF("id"), t, "append", batchId = 8L) == 1L)
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L, 2L))
    assert(TxLog.committedBatches(t) == Set(7L, 8L))
  }

  test("vacuum removes only unreferenced files; history survives") {
    val t = tmp("txlog_vacuum")
    TxLog.write(Seq(1L).toDF("id"), t, "overwrite")
    TxLog.write(Seq(2L).toDF("id"), t, "overwrite") // v0's file now historical
    // orphan: a data file no commit references (failed-write debris)
    Files.write(Paths.get(t, "orphan-debris.parquet"), Array[Byte](1, 2))
    val deleted = TxLog.vacuum(t)
    assert(deleted >= 1)
    assert(!Files.exists(Paths.get(t, "orphan-debris.parquet")))
    // time travel still works: overwritten-but-referenced files kept
    assert(ids(TxLog.snapshot(spark, t, Some(0L))) == Seq(1L))
    assert(ids(TxLog.snapshot(spark, t)) == Seq(2L))
    // dropping history before v1 forgets v0 and reclaims its file
    TxLog.vacuum(t, dropHistoryBefore = 1L)
    assert(TxLog.commits(t).map(_.version) == Seq(1L))
    assert(ids(TxLog.snapshot(spark, t)) == Seq(2L))
  }

  test("append schema mismatch fails at commit; overwrite may evolve") {
    val t = tmp("txlog_schema")
    TxLog.write(Seq(1L).toDF("id"), t, "overwrite")
    def stagingDirs(): Long = {
      val p = Paths.get(t, "_staging")
      if (Files.isDirectory(p)) Files.list(p).count() else 0L
    }
    val stagedBefore = stagingDirs()
    intercept[IllegalArgumentException](
      TxLog.write(Seq("x").toDF("name"), t, "append"))
    // the guard fires before staging: no data was even written
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L))
    assert(TxLog.latestVersion(t).contains(0L))
    assert(stagingDirs() == stagedBefore)
    // overwrite legally starts a fresh live set with a fresh schema
    TxLog.write(Seq("x").toDF("name"), t, "overwrite")
    assert(TxLog.snapshot(spark, t).columns.toSeq == Seq("name"))
  }

  test("compact: many small commits -> one file set, content-neutral, history intact") {
    val t = tmp("txlog_compact")
    (1L to 6L).foreach(i => TxLog.write(Seq(i).toDF("id"), t, "append"))
    assert(TxLog.liveFiles(t).size >= 6)
    val before = ids(TxLog.snapshot(spark, t))
    val v = TxLog.compact(spark, t, targetFiles = 1)
    assert(v == 6L)
    assert(TxLog.liveFiles(t).size == 1, "live set must shrink to target")
    assert(ids(TxLog.snapshot(spark, t)) == before, "content-neutral")
    // pre-compaction versions still readable (overwrite kept the bytes)
    assert(ids(TxLog.snapshot(spark, t, Some(2L))) == Seq(1L, 2L, 3L))
  }

  test("snapshot reads keep parquet pushdown (the log is metadata-only)") {
    val t = tmp("txlog_pushdown")
    TxLog.write((1L to 100L).toDF("id"), t, "overwrite")
    val plan = TxLog.snapshot(spark, t).where(col("id") > 90L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,90)"),
      plan.take(600))
  }

  test("streaming restart: rerun on the same landing adds nothing") {
    val base = tmp("txlog_restart")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    docs.coalesce(1).write.mode("overwrite").json(s"$base/in")
    TxLog.runIngest(spark, s"$base/in", s"$base/table", s"$base/ckpt")
      .awaitTermination()
    val n1 = TxLog.snapshot(spark, s"$base/table").count()
    assert(n1 == docs.count())
    // restart against the same checkpoint: AvailableNow drains nothing
    // new; even if a batch were replayed, the id ledger would skip it
    TxLog.runIngest(spark, s"$base/in", s"$base/table", s"$base/ckpt")
      .awaitTermination()
    assert(TxLog.snapshot(spark, s"$base/table").count() == n1,
      "restart must not duplicate rows")
  }
}
