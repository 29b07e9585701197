package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** Column mapping (Delta's columnMapping.mode=name): RENAME/DROP
  * COLUMN as metadata-only commits, physical-name indirection on
  * every read/write surface, the no-resurrection rule for re-added
  * columns, the format-2 declaration, and the loud boundaries. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def seed(t: String): Unit = {
    TxLog.write(
      spark.range(100).select(col("id"), (col("id") % 10).as("grp"),
        (col("id") * 10).as("v")).repartitionByRange(4, col("id")),
      t, "overwrite")
    ()
  }

  test("RENAME COLUMN is metadata-only: no file touched, data identical") {
    val t = tmp("cm_rename")
    seed(t)
    val files0 = TxLog.liveFiles(t)
    val mtimes0 = files0.map(f =>
      Files.getLastModifiedTime(Paths.get(t, f)).toMillis)
    val sum0 = TxLog.snapshot(spark, t).agg(sum("v")).head().getLong(0)
    TxLog.renameColumn(t, "v", "val")
    assert(TxLog.liveFiles(t) == files0, "no file may change")
    assert(files0.map(f =>
      Files.getLastModifiedTime(Paths.get(t, f)).toMillis) == mtimes0,
      "no file may be rewritten")
    val snap = TxLog.snapshot(spark, t)
    assert(snap.columns.toSeq == Seq("id", "grp", "val"))
    assert(snap.agg(sum("val")).head().getLong(0) == sum0,
      "renamed column must serve the same data")
    // time travel serves the OLD name (schema + mapping both as-of)
    val v0 = TxLog.snapshot(spark, t, Some(0L))
    assert(v0.columns.toSeq == Seq("id", "grp", "v"))
    assert(v0.agg(sum("v")).head().getLong(0) == sum0)
  }

  test("writes after a rename land under the ORIGINAL physical name") {
    val t = tmp("cm_phys")
    seed(t)
    TxLog.renameColumn(t, "v", "val")
    TxLog.write(Seq((1000L, 0L, 77L)).toDF("id", "grp", "val"), t, "append")
    // the new file's parquet footer must carry physical 'v', so ALL
    // files of the table share one physical schema
    val newest = TxLog.commits(t).last.adds.head
    val raw = spark.read.parquet(s"$t/$newest")
    assert(raw.columns.toSeq == Seq("id", "grp", "v"),
      s"append must stage physical names, was ${raw.columns.toSeq}")
    assert(TxLog.snapshot(spark, t).where(col("id") === 1000)
      .head().getLong(2) == 77L)
  }

  test("DROP COLUMN hides it now; time travel still serves it") {
    val t = tmp("cm_drop")
    seed(t)
    TxLog.dropColumn(t, "grp")
    assert(TxLog.snapshot(spark, t).columns.toSeq == Seq("id", "v"))
    assert(TxLog.snapshot(spark, t, Some(0L)).columns.toSeq ==
      Seq("id", "grp", "v"))
    assert(TxLog.snapshot(spark, t, Some(0L))
      .agg(sum("grp")).head().getLong(0) == (0L to 99L).map(_ % 10).sum)
  }

  test("re-adding a dropped column reads NULL, never the old bytes") {
    val t = tmp("cm_readd")
    seed(t)
    TxLog.dropColumn(t, "grp")
    // evolve re-adds 'grp': burned -> fresh physical name
    TxLog.write(Seq((1000L, 5L, 9L)).toDF("id", "v", "grp"),
      t, "append", evolve = true)
    val snap = TxLog.snapshot(spark, t)
    val old = snap.where(col("id") < 100).select("grp")
      .collect().map(r => r.isNullAt(0))
    assert(old.length == 100 && old.forall(identity),
      "old files must read the re-added column as NULL (no resurrection)")
    assert(snap.where(col("id") === 1000).select("grp")
      .head().getLong(0) == 9L)
  }

  test("rename there and back keeps serving the same bytes") {
    val t = tmp("cm_roundtrip")
    seed(t)
    val sum0 = TxLog.snapshot(spark, t).agg(sum("v")).head().getLong(0)
    TxLog.renameColumn(t, "v", "val")
    TxLog.renameColumn(t, "val", "v")
    val snap = TxLog.snapshot(spark, t)
    assert(snap.columns.toSeq == Seq("id", "grp", "v"))
    assert(snap.agg(sum("v")).head().getLong(0) == sum0)
  }

  test("stats skipping prunes on the RENAMED logical name") {
    val t = tmp("cm_prune")
    seed(t) // 4 range-clustered files on id
    TxLog.renameColumn(t, "id", "doc_id")
    val (kept, total) = TxLog.pruneFiles(t, "doc_id", Some(90L), Some(99L))
    assert(total == 4 && kept.size == 1,
      s"stats recorded under physical 'id' must prune logical " +
        s"'doc_id': kept ${kept.size}/$total")
    assert(TxLog.snapshotRange(spark, t, "doc_id", Some(90L), Some(99L))
      .count() == 10)
  }

  test("COW delete/update and MERGE upsert work on a mapped table") {
    val t = tmp("cm_rowops")
    seed(t)
    TxLog.renameColumn(t, "v", "val")
    TxLog.delete(spark, t, col("val") === 990L) // id 99
    TxLog.update(spark, t, col("id") === 0L, Map("val" -> lit(5L)))
    TxLog.upsert(spark, t,
      Seq((50L, 5L, 1L), (2000L, 0L, 2L)).toDF("id", "grp", "val"),
      Seq("id"))
    val got = TxLog.snapshot(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(!got.contains(99L) && got(0L) == 5L && got(50L) == 1L &&
      got(2000L) == 2L && got(7L) == 70L)
    assert(got.size == 100)
  }

  test("deletion vectors + CDF on a mapped table") {
    val t = tmp("cm_dv")
    seed(t)
    TxLog.renameColumn(t, "v", "val")
    val v = TxLog.deleteVectored(spark, t, col("val") === 130L) // id 13
    assert(TxLog.snapshot(spark, t).count() == 99)
    val ch = TxLog.changes(spark, t, v - 1, Some(v)).where(
      col("_change_type") === "delete")
    assert(ch.select("id").collect().map(_.getLong(0)).toSeq == Seq(13L),
      "the CDF dv-delete arm must resolve through the mapping")
    TxLog.compact(spark, t, targetFiles = 2) // OPTIMIZE materializes
    assert(TxLog.snapshot(spark, t).count() == 99)
    assert(TxLog.snapshot(spark, t).columns.toSeq ==
      Seq("id", "grp", "val"))
  }

  test("CHECK constraints block rename of a referenced column, and still gate writes") {
    val t = tmp("cm_check")
    seed(t)
    TxLog.addConstraint(spark, t, "v_nonneg", "v >= 0")
    val e = intercept[IllegalArgumentException] {
      TxLog.renameColumn(t, "v", "val")
    }
    assert(e.getMessage.contains("v_nonneg"))
    TxLog.dropConstraint(t, "v_nonneg")
    TxLog.renameColumn(t, "v", "val")
    TxLog.addConstraint(spark, t, "val_nonneg", "val >= 0")
    intercept[IllegalArgumentException] {
      TxLog.write(Seq((1L, 1L, -5L)).toDF("id", "grp", "val"), t, "append")
    }
    assert(TxLog.snapshot(spark, t).count() == 100)
    TxLog.write(Seq((5000L, 1L, 5L)).toDF("id", "grp", "val"), t, "append")
    assert(TxLog.snapshot(spark, t).count() == 101)
  }

  test("mapped commits declare format 2; untouched tables stay format 1") {
    val t = tmp("cm_format")
    seed(t)
    val raw0 = new String(Files.readAllBytes(
      Paths.get(t, "_txlog", f"${0L}%010d.txt")), "UTF-8")
    assert(raw0.startsWith("format=1\n"),
      "an unmapped table must stay readable by format-1 engines")
    TxLog.renameColumn(t, "v", "val")
    val v1 = TxLog.latestVersion(t).get
    val raw1 = new String(Files.readAllBytes(
      Paths.get(t, "_txlog", f"$v1%010d.txt")), "UTF-8")
    assert(raw1.startsWith("format=2\n") && raw1.contains("map="))
    // and the state carries forward on plain appends
    TxLog.write(Seq((1L, 1L, 1L)).toDF("id", "grp", "val"), t, "append")
    val v2 = TxLog.latestVersion(t).get
    val raw2 = new String(Files.readAllBytes(
      Paths.get(t, "_txlog", f"$v2%010d.txt")), "UTF-8")
    assert(raw2.startsWith("format=2\n") && raw2.contains("map="))
    // DESCRIBE DETAIL surfaces the posture
    val d = TxLog.detail(spark, t).head()
    assert(d.getAs[Long]("n_mapped_columns") == 1L &&
      d.getAs[Long]("n_burned_names") == 1L &&
      d.getAs[Long]("log_format") == 2L)
  }

  test("SQL reads serve mapped tables; stream + row-level DML refuse loudly") {
    val t = tmp("cm_bound")
    seed(t)
    TxLog.renameColumn(t, "v", "val")
    // plain SQL reads route through the mapping (logical names out)
    assert(spark.sql(s"SELECT sum(val) FROM graft.`$t` WHERE id >= 0")
      .head().getLong(0) == (0L to 99L).map(_ * 10).sum)
    assert(spark.sql(s"SELECT id, val FROM graft.`$t` WHERE val = 130")
      .head().getLong(0) == 13L)
    // time travel serves the PRE-rename name through the catalog too
    assert(spark.sql(s"SELECT sum(v) FROM graft.`$t` VERSION AS OF 0")
      .head().getLong(0) == (0L to 99L).map(_ * 10).sum)
    // INSERT INTO maps at stage time; DELETE FROM runs the mapped COW
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1000, 0, 7)")
    assert(spark.sql(s"SELECT val FROM graft.`$t` WHERE id = 1000")
      .head().getLong(0) == 7L)
    spark.sql(s"DELETE FROM graft.`$t` WHERE id = 1000")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`")
      .head().getLong(0) == 100L)
    // SQL UPDATE / MERGE rewrite through the mapping too: replacement
    // files land under PHYSICAL names (footer-verified by
    // replaceFiles), bounded by the runtime group filter
    val live0 = TxLog.liveFiles(t).toSet
    spark.sql(s"UPDATE graft.`$t` SET val = 777 WHERE id = 1")
    assert(spark.sql(s"SELECT val FROM graft.`$t` WHERE id = 1")
      .head().getLong(0) == 777L)
    assert(TxLog.liveFiles(t).toSet.intersect(live0).size >= 3,
      "the mapped UPDATE must still rewrite only matched files")
    val newest = TxLog.commits(t).last.adds.head
    assert(spark.read.parquet(s"$t/$newest").columns.toSeq ==
      Seq("id", "grp", "v"),
      "the SQL rewrite must stage PHYSICAL column names")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt
         |USING (SELECT 2 AS id, 9 AS grp, 888 AS val) src
         |ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET val = src.val""".stripMargin)
    assert(spark.sql(s"SELECT val FROM graft.`$t` WHERE id = 2")
      .head().getLong(0) == 888L)
    // and registerView (snapshot-backed) serves SQL as well
    // (base 49500, then UPDATE 10→777 and MERGE 20→888)
    TxLog.registerView(spark, t, "cm_bound_view")
    assert(spark.sql("SELECT sum(val) FROM cm_bound_view")
      .head().getLong(0) == (0L to 99L).map(_ * 10).sum - 30 + 777 + 888)
  }

  test("an append staged against a pre-rename mapping cannot revert it") {
    val t = tmp("cm_stage_race")
    seed(t)
    CmRaceHook.fired.set(false)
    // the rename lands WHILE the append's staging job runs (injected
    // through an expression evaluated during staging — local-mode
    // executors share the JVM, so the hook object is truly global):
    // letting the append commit anyway would revert the rename in the
    // logical schema via its stale schema= line while the burned name
    // persists, and a later evolve re-adding 'v' would bind a fresh
    // physical name that reads every older file as NULL — silent data
    // loss from a legal concurrent sequence
    val evil = udf { (x: Long) =>
      if (CmRaceHook.fired.compareAndSet(false, true))
        TxLog.renameColumn(t, "v", "val")
      x
    }
    val e = intercept[IllegalArgumentException] {
      TxLog.write(spark.range(5).toDF("id")
        .select(col("id"), (col("id") % 10).as("grp"),
          evil(col("id") * 10).as("v")), t)
    }
    assert(e.getMessage.contains("concurrent schema change") ||
      e.getMessage.contains("append schema mismatch"),
      s"got: ${e.getMessage}")
    // the rename survives intact — nothing reverted, data still served
    val snap = TxLog.snapshot(spark, t)
    assert(snap.columns.toSeq == Seq("id", "grp", "val"))
    assert(snap.agg(sum("val")).head().getLong(0) ==
      (0L until 100L).map(_ * 10).sum)
  }

  test("a concurrent mapping mutation conflicts loudly, not last-wins") {
    val t = tmp("cm_race")
    seed(t)
    val stale = TxLog.colMapAt(t) // plan against the unmapped state
    TxLog.renameColumn(t, "v", "val") // ...someone else lands first
    val e = intercept[IllegalArgumentException] {
      TxLog.writeCommit(t, "append", -1L, Nil,
        "id BIGINT, grp BIGINT, renamed BIGINT",
        colmapOverride = Some((Map("renamed" -> "v"), Set("v"))),
        colmapBase = Some(stale))
    }
    assert(e.getMessage.contains("concurrent schema change"))
  }

  test("restore across a rename boundary restores name AND keeps burns") {
    val t = tmp("cm_restore")
    seed(t) // v0
    TxLog.renameColumn(t, "v", "val") // v1
    TxLog.delete(spark, t, col("id") === 7L) // v2
    TxLog.restore(t, 0L) // back to the pre-rename world
    val snap = TxLog.snapshot(spark, t)
    assert(snap.columns.toSeq == Seq("id", "grp", "v"))
    assert(snap.count() == 100)
    // the burn survives the rollback: re-adding 'val' via evolve must
    // still bind fresh (old physical bytes never resurface)
    TxLog.write(Seq((3000L, 1L, 1L, 42L)).toDF("id", "grp", "v", "val"),
      t, "append", evolve = true)
    val vals = TxLog.snapshot(spark, t).where(col("id") < 100)
      .select("val").collect()
    assert(vals.forall(_.isNullAt(0)),
      "restored-then-re-added column must read NULL from old files")
  }

  test("rename validation: missing/duplicate/bad names refused") {
    val t = tmp("cm_valid")
    seed(t)
    intercept[IllegalArgumentException] { TxLog.renameColumn(t, "nope", "x") }
    intercept[IllegalArgumentException] { TxLog.renameColumn(t, "v", "grp") }
    intercept[IllegalArgumentException] { TxLog.renameColumn(t, "v", "bad name") }
    intercept[IllegalArgumentException] { TxLog.dropColumn(t, "nope") }
  }

  test("a mapped table serves as a streaming source with logical names") {
    val s = tmp("cm_stream_src")
    TxLog.write(Seq((1L, 1L, 10L), (2L, 2L, 20L)).toDF("id", "grp", "v"),
      s, "append")
    TxLog.publishAppends(s) // becomes a stream source
    // rename mid-life is allowed: physical file names never change
    TxLog.renameColumn(s, "v", "val")
    TxLog.write(Seq((3L, 3L, 30L)).toDF("id", "grp", "val"), s, "append")
    val base = java.nio.file.Files.createTempDirectory("cm_stream_out")
    val q = TxLog.streamSource(spark, s)
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$base/out")
    assert(out.columns.toSeq == Seq("id", "grp", "val"),
      "the consumer must see LOGICAL names")
    assert(out.select("val").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L))
    // exactly-once across a restart that spans ANOTHER rename
    TxLog.renameColumn(s, "val", "metric")
    TxLog.write(Seq((4L, 4L, 40L)).toDF("id", "grp", "metric"), s, "append")
    val q2 = TxLog.streamSource(spark, s)
      .toDF("id", "grp", "val") // keep the sink's column contract
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val out2 = spark.read.parquet(s"$base/out")
    assert(out2.count() == 4, "each row exactly once across renames")
    assert(out2.select("val").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L, 40L))
  }
}

/** JVM-global race-injection latch for the staging-race test — a
  * top-level object so the udf closure reaches it by static access
  * (a per-task deserialized copy would fire the rename once per
  * task). */
object CmRaceHook {
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
}
