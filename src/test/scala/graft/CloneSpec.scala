package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** Zero-copy clone: hard-linked live files (inode-equal, no bytes
  * copied), full state carried (stats, dv masks, mapping,
  * constraints), independent divergence after, and — the property
  * path-sharing shallow clones lack — immunity to the SOURCE's
  * vacuum. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private def freshDir(p: String) = {
    val d = Files.createTempDirectory(p); Files.delete(d); d.toString
  }

  private def seed(t: String): Unit = {
    TxLog.write(
      spark.range(100).select(col("id"), (col("id") % 10).as("grp"),
        (col("id") * 10).as("v")).repartitionByRange(4, col("id")),
      t, "overwrite")
    ()
  }

  private def inode(p: String): Any =
    Files.readAttributes(Paths.get(p),
      classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()

  test("clone is hard-linked: same content, same inodes, zero bytes copied") {
    val s = tmp("clone_src"); val d = freshDir("clone_dst")
    seed(s)
    TxLog.cloneTable(spark, s, d)
    assert(TxLog.liveFiles(d) == TxLog.liveFiles(s))
    TxLog.liveFiles(s).foreach(f =>
      assert(inode(s"$s/$f") == inode(s"$d/$f"),
        s"$f must be a hard link, not a copy"))
    assert(TxLog.snapshot(spark, d).agg(sum("v")).head().getLong(0) ==
      TxLog.snapshot(spark, s).agg(sum("v")).head().getLong(0))
    // stats travelled: pruning works on the clone with no new scan
    assert(TxLog.pruneFiles(d, "id", Some(90L), Some(99L))._1.size == 1)
  }

  test("clone and source diverge independently") {
    val s = tmp("clone_div"); val d = freshDir("clone_div_dst")
    seed(s)
    TxLog.cloneTable(spark, s, d)
    TxLog.delete(spark, d, col("id") < 50L)
    TxLog.write(Seq((1000L, 0L, 1L)).toDF("id", "grp", "v"), s, "append")
    assert(TxLog.snapshot(spark, d).count() == 50)
    assert(TxLog.snapshot(spark, s).count() == 101)
    // the clone's history starts fresh at v0
    assert(TxLog.latestVersion(d).contains(1L))
    assert(TxLog.snapshot(spark, d, Some(0L)).count() == 100)
  }

  test("the source's vacuum cannot break the clone") {
    val s = tmp("clone_vac"); val d = freshDir("clone_vac_dst")
    seed(s)
    TxLog.cloneTable(spark, s, d)
    // source rewrites everything, checkpoints, and vacuums its old
    // files away with a history drop
    TxLog.write(Seq((1L, 1L, 1L)).toDF("id", "grp", "v"), s, "overwrite")
    TxLog.checkpointLog(s)
    val dropped = TxLog.vacuum(s,
      dropHistoryBefore = TxLog.latestVersion(s).get, retainMs = 0L)
    assert(dropped > 0, "vacuum must actually reclaim source files")
    // the clone still serves every row: the links kept the inodes alive
    assert(TxLog.snapshot(spark, d).count() == 100)
  }

  test("dv masks, column mapping and constraints travel with the clone") {
    val s = tmp("clone_state"); val d = freshDir("clone_state_dst")
    seed(s)
    TxLog.deleteVectored(spark, s, col("id") === 7L)
    TxLog.renameColumn(s, "v", "val")
    TxLog.addConstraint(spark, s, "val_nonneg", "val >= 0")
    TxLog.cloneTable(spark, s, d)
    val snap = TxLog.snapshot(spark, d)
    assert(snap.columns.toSeq == Seq("id", "grp", "val"))
    assert(snap.count() == 99, "the dv mask must hide id=7 in the clone")
    intercept[IllegalArgumentException] {
      TxLog.write(Seq((1L, 1L, -5L)).toDF("id", "grp", "val"), d, "append")
    }
    // clone of a time-travel snapshot: pre-mask, pre-rename world
    val d0 = freshDir("clone_state_v0")
    TxLog.cloneTable(spark, s, d0, asOf = Some(0L))
    assert(TxLog.snapshot(spark, d0).columns.toSeq == Seq("id", "grp", "v"))
    assert(TxLog.snapshot(spark, d0).count() == 100)
  }

  test("clone refuses an existing table and an empty source") {
    val s = tmp("clone_guard"); val d = tmp("clone_guard_dst")
    seed(s); seed(d)
    intercept[IllegalArgumentException] { TxLog.cloneTable(spark, s, d) }
  }
}
