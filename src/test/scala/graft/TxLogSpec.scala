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
    val deleted = TxLog.vacuum(t, retainMs = 0L)
    assert(deleted >= 1)
    assert(!Files.exists(Paths.get(t, "orphan-debris.parquet")))
    // time travel still works: overwritten-but-referenced files kept
    assert(ids(TxLog.snapshot(spark, t, Some(0L))) == Seq(1L))
    assert(ids(TxLog.snapshot(spark, t)) == Seq(2L))
    // dropping history before v1 forgets v0 and reclaims its file
    TxLog.vacuum(t, dropHistoryBefore = 1L, retainMs = 0L)
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

  test("snapshotWhere: the exact predicates reach the parquet scan as PushedFilters") {
    val t = tmp("txlog_wherepush")
    TxLog.write(spark.range(1, 101).select(col("id"),
      concat(lit("t"), col("id") % 3).as("tag")), t, "overwrite")
    val plan = TxLog.snapshotWhere(spark, t, Seq(
      TxLog.Pred.Range("id", Some(10L), Some(90L)),
      TxLog.Pred.In("tag", Seq("t1", "t2")),
      TxLog.Pred.NotNull("tag")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,10)") &&
      plan.contains("In(tag, [t1,t2])"),
      plan.take(800))
  }

  test("data skipping: commit-time footer stats prune non-overlapping files") {
    val t = tmp("txlog_skip")
    // range-clustered write: 4 files, each covering ~25 consecutive ids
    TxLog.write((1L to 100L).toDF("id")
      .repartitionByRange(4, col("id")), t, "overwrite")
    val stats = TxLog.fileStats(t)
    assert(TxLog.liveFiles(t).forall(f => stats.get(f).exists(_.contains("id"))),
      "every committed file must carry id stats")
    val (kept, total) = TxLog.pruneFiles(t, "id", Some(10L), Some(20L))
    assert(total == 4 && kept.size < total,
      s"a selective range must skip files ($kept of $total kept)")
    // pruning is invisible in the data: pruned read == full-scan filter
    val pruned = ids(TxLog.snapshotRange(spark, t, "id", Some(10L), Some(20L)))
    assert(pruned == (10L to 20L).toSeq)
    // a range below/above everything prunes ALL files, schema intact
    val none = TxLog.snapshotRange(spark, t, "id", Some(500L), None)
    assert(none.columns.toSeq == Seq("id") && none.count() == 0)
  }

  test("data skipping: string and timestamp bounds, null and no-stat safety") {
    val t = tmp("txlog_skip2")
    val df = Seq(
      ("alpha", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0)),
      ("beta", java.sql.Timestamp.valueOf("2024-01-10 12:00:00"), None))
      .toDF("name", "ts", "v")
    val df2 = Seq(
      ("omega", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
        Option.empty[Double]))
      .toDF("name", "ts", "v")
    TxLog.write(df.coalesce(1), t, "overwrite")
    TxLog.write(df2.coalesce(1), t, "append")
    // string prune: [a, c] keeps file 1 only
    assert(TxLog.pruneFiles(t, "name", Some("a"), Some("c"))._1.size == 1)
    // timestamp prune (tsmicros kind): Feb onward keeps file 2 only
    val (k2, _) = TxLog.pruneFiles(t, "ts",
      Some(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")), None)
    assert(k2.size == 1)
    val r = TxLog.snapshotRange(spark, t, "ts",
      Some(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")), None)
      .select("name").collect().map(_.getString(0)).toSeq
    assert(r == Seq("omega"))
    // all-null column: a range predicate can never match → file pruned
    val (k3, _) = TxLog.pruneFiles(t, "v", Some(0.0), Some(9.9))
    assert(k3.size == 1, "the all-null-v file must be skipped")
    assert(TxLog.snapshotRange(spark, t, "v", Some(0.0), Some(9.9))
      .count() == 1)
    // a column with no recorded stats anywhere → conservative full keep
    assert(TxLog.pruneFiles(t, "nope", Some(1L), None)._1.size == 2)
  }

  test("data skipping: a stats-free commit (older log version) is kept") {
    val t = tmp("txlog_skip3")
    TxLog.write(Seq(1L).toDF("id"), t, "overwrite")
    // hand-write a pre-stats commit referencing a real data file
    val dataFile = TxLog.liveFiles(t).head
    val copy = "legacy-" + dataFile
    Files.copy(Paths.get(t, dataFile), Paths.get(t, copy))
    Files.write(Paths.get(t, "_txlog", f"${1L}%010d.txt"),
      s"mode=append\nbatch=-1\nadd=$copy\n".getBytes("UTF-8"))
    val (kept, total) = TxLog.pruneFiles(t, "id", Some(100L), None)
    assert(total == 2 && kept == Seq(copy),
      "the stats-bearing file prunes, the legacy file survives")
  }

  test("row-level delete: only matching files rewrite, history intact") {
    val t = tmp("txlog_del")
    val v0 = TxLog.write((1L to 100L).toDF("id")
      .repartitionByRange(4, col("id")), t, "overwrite")
    val before = TxLog.liveFiles(t).toSet
    // deleteRange: log stats bound the discovery scan to 1 file
    TxLog.deleteRange(spark, t, "id", Some(10L), Some(20L))
    val c = TxLog.commits(t).last
    assert(c.mode == "rewrite" && c.removes.size == 1 && c.adds.size >= 1,
      s"one file overlaps [10,20]; got removes=${c.removes} adds=${c.adds}")
    assert((before -- TxLog.liveFiles(t).toSet).size == 1,
      "the other three files must pass through untouched")
    assert(ids(TxLog.snapshot(spark, t)) == ((1L to 9L) ++ (21L to 100L)))
    // time travel to before the delete still sees every row
    assert(ids(TxLog.snapshot(spark, t, Some(v0))) == (1L to 100L))
    // NULL cond rows are kept (SQL DELETE semantics); no-match = no-op
    val vNow = TxLog.latestVersion(t).get
    assert(TxLog.delete(spark, t, col("id") > 9999L) == vNow,
      "a no-match delete must not commit")
  }

  test("row-level update: values rewritten in place, schema bit-stable") {
    val t = tmp("txlog_upd")
    TxLog.write(Seq((1L, "web"), (2L, "api"), (3L, "web")).toDF("id", "src")
      .repartitionByRange(3, col("id")), t, "overwrite")
    TxLog.update(spark, t, col("src") === "web",
      Map("src" -> concat(col("src"), lit("-clean"))))
    val rows = TxLog.snapshot(spark, t).as[(Long, String)].collect().sorted
    assert(rows.toSeq == Seq((1L, "web-clean"), (2L, "api"), (3L, "web-clean")))
    // assignments cast to the COLUMN's type (SQL UPDATE semantics) —
    // the schema can't drift through an update
    TxLog.update(spark, t, col("id") === 2L, Map("src" -> lit(7L)))
    assert(TxLog.snapshot(spark, t).where(col("id") === 2L)
      .select("src").as[String].head() == "7")
    assert(TxLog.commits(t).map(_.schema).distinct.size == 1)
  }

  test("upsert: replace by key, insert new, one atomic commit") {
    val t = tmp("txlog_ups")
    TxLog.write(Seq((1L, "a"), (2L, "b"), (50L, "z")).toDF("k", "v")
      .repartitionByRange(2, col("k")), t, "overwrite")
    val before = TxLog.liveFiles(t).toSet
    TxLog.upsert(spark, t,
      Seq((2L, "B"), (9L, "new")).toDF("k", "v"), Seq("k"))
    val c = TxLog.commits(t).last
    assert(c.mode == "rewrite" && c.removes.nonEmpty)
    assert(before.intersect(TxLog.liveFiles(t).toSet).nonEmpty,
      "the file without a matched key must survive unrewritten")
    val rows = TxLog.snapshot(spark, t).as[(Long, String)].collect().sorted
    assert(rows.toSeq == Seq((1L, "a"), (2L, "B"), (9L, "new"), (50L, "z")))
    // upsert into keys nobody holds = pure insert, removes empty
    TxLog.upsert(spark, t, Seq((100L, "x")).toDF("k", "v"), Seq("k"))
    assert(TxLog.commits(t).last.removes.isEmpty)
    assert(TxLog.snapshot(spark, t).count() == 5)
  }

  test("checkpoint + history-drop vacuum reclaims tombstones, data intact") {
    val t = tmp("txlog_cp")
    TxLog.write((1L to 40L).toDF("id")
      .repartitionByRange(4, col("id")), t, "overwrite")
    TxLog.deleteRange(spark, t, "id", Some(1L), Some(10L))
    val tombstoned = TxLog.commits(t).last.removes
    assert(tombstoned.nonEmpty &&
      tombstoned.forall(f => Files.exists(Paths.get(t, f))),
      "removed files back time travel until vacuum")
    val cp = TxLog.checkpointLog(t)
    val expect = ids(TxLog.snapshot(spark, t))
    assert(TxLog.vacuum(t, dropHistoryBefore = cp, retainMs = 0L) > 0)
    assert(tombstoned.forall(f => !Files.exists(Paths.get(t, f))),
      "after the history cut the tombstoned bytes are reclaimed")
    assert(ids(TxLog.snapshot(spark, t)) == expect && expect == (11L to 40L))
    // the checkpoint carried the stats forward: pruning still works
    assert(TxLog.pruneFiles(t, "id", Some(35L), None)._1.size == 1)
  }

  test("z-ordered compaction restores skipping on both dimensions") {
    val t = tmp("txlog_zopt")
    val df = (1L to 400L).toDF("id")
      .withColumn("a", col("id") % 20)
      .withColumn("b", (col("id") * 7) % 20)
    // unclustered accretion: per-file stats cover the whole value
    // space, so nothing prunes
    TxLog.write(df.where(col("id") <= 200).repartition(4), t, "overwrite")
    TxLog.write(df.where(col("id") > 200).repartition(4), t, "append")
    assert(TxLog.pruneFiles(t, "a", Some(0L), Some(2L))._1.size == 8,
      "random layout: every file overlaps a in [0,2]")
    TxLog.compactZOrdered(spark, t, "a", "b", targetFiles = 8)
    val (ka, total) = TxLog.pruneFiles(t, "a", Some(0L), Some(2L))
    val (kb, _) = TxLog.pruneFiles(t, "b", Some(0L), Some(2L))
    assert(total == 8 && ka.size < 8 && kb.size < 8,
      s"z-order must restore pruning on BOTH dims (a=${ka.size}, b=${kb.size})")
    // content-neutral, pruned read included; history stays readable
    assert(ids(TxLog.snapshot(spark, t)) == (1L to 400L))
    assert(ids(TxLog.snapshotRange(spark, t, "a", Some(0L), Some(2L))
      .select("id")) == (1L to 400L).filter(_ % 20 <= 2))
    assert(TxLog.snapshot(spark, t, Some(1L)).count() == 400)
  }

  test("rewrite conflict: removing an already-removed file is rejected") {
    val t = tmp("txlog_occ")
    TxLog.write((1L to 20L).toDF("id").coalesce(1), t, "overwrite")
    val f = TxLog.liveFiles(t).head
    TxLog.delete(spark, t, col("id") === 5L) // legitimately rewrites f away
    // a stale writer that also planned to rewrite f must fail at
    // commit time, not land and resurrect its copy of f's rows
    val e = intercept[IllegalArgumentException] {
      TxLog.writeCommit(t, "rewrite", -1L, adds = Nil,
        schema = "", removes = Seq(f))
    }
    assert(e.getMessage.contains("concurrent modification"))
    assert(ids(TxLog.snapshot(spark, t)) == ((1L to 4L) ++ (6L to 20L)))
  }

  test("schema evolution: additive append, old files read new cols as NULL") {
    val t = tmp("txlog_evolve")
    TxLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, "overwrite")
    // a plain append with an extra column still rejects
    intercept[IllegalArgumentException] {
      TxLog.write(Seq((3L, "c", 7L)).toDF("id", "v", "w"), t, "append")
    }
    // evolve may ADD columns but never drop or retype existing ones
    intercept[IllegalArgumentException] {
      TxLog.write(Seq((3L, 7L)).toDF("id", "w"), t, "append", evolve = true)
    }
    TxLog.write(Seq((3L, "c", 7L)).toDF("id", "v", "w"), t, "append",
      evolve = true)
    val snap = TxLog.snapshot(spark, t)
    assert(snap.columns.toSeq == Seq("id", "v", "w"),
      "the widened DDL (from the log, not footers) is the table schema")
    val rows = snap.as[(Long, String, Option[Long])].collect().sortBy(_._1)
    assert(rows.toSeq ==
      Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(7L))))
    // time travel BEFORE the evolution keeps the era's own schema
    assert(TxLog.snapshot(spark, t, Some(0L)).columns.toSeq == Seq("id", "v"))
    // row ops cross the boundary: the pre-evolution file rewrites
    // under the evolved schema
    TxLog.update(spark, t, col("id") === 1L, Map("w" -> lit(5L)))
    assert(TxLog.snapshot(spark, t).where(col("id") === 1L)
      .select("w").as[Long].head() == 5L)
  }

  test("change feed: raw is file-granular, net cancels pass-through rows") {
    val t = tmp("txlog_cdf")
    TxLog.write((1L to 20L).toDF("id").coalesce(1), t, "overwrite") // v0
    TxLog.write((21L to 30L).toDF("id").coalesce(1), t, "append")   // v1
    TxLog.delete(spark, t, col("id") === 25L)                       // v2
    // raw feed since v0: the append's 10 inserts, then the rewrite's
    // 10 deletes + 9 inserts (file-granular: 21..30 leave, 21..30\25
    // come back)
    val raw = TxLog.changes(spark, t, fromV = 0L)
    assert(raw.where(col("_change_type") === "insert").count() == 19)
    assert(raw.where(col("_change_type") === "delete").count() == 10)
    assert(raw.select("_commit_version").distinct().count() == 2)
    // net feed: exactly what entered and left — 25 entered AND left
    // inside the window, so it cancels too
    val net = TxLog.netChanges(spark, t, fromV = 0L)
    assert(ids(net.where(col("_change_type") === "insert")) ==
      ((21L to 24L) ++ (26L to 30L)))
    assert(net.where(col("_change_type") === "delete").count() == 0)
    // window opened after the append: 25 was already in — its delete
    // survives the cancellation
    val net1 = TxLog.netChanges(spark, t, fromV = 1L)
    assert(ids(net1.where(col("_change_type") === "delete")) == Seq(25L))
    assert(net1.where(col("_change_type") === "insert").count() == 0)
    // an overwrite surfaces the whole prior live set as deletes
    TxLog.write(Seq(99L).toDF("id"), t, "overwrite")
    val v = TxLog.latestVersion(t).get
    val ow = TxLog.changes(spark, t, fromV = v - 1, toV = Some(v))
    assert(ow.where(col("_change_type") === "delete").count() == 29)
    assert(ids(ow.where(col("_change_type") === "insert")) == Seq(99L))
    // empty window: schema intact, zero rows
    assert(TxLog.changes(spark, t, fromV = v).count() == 0)
  }

  test("streaming CDC upsert: within-batch conflicts collapse to max rev") {
    val base = tmp("txlog_cdc")
    // ONE file = one micro-batch holding BOTH revisions of key 1 —
    // arrival order is meaningless, the sequence column must decide
    Seq((1L, "a", 0L), (1L, "b", 1L), (2L, "x", 0L)).toDF("k", "v", "rev")
      .coalesce(1).write.json(s"$base/in")
    def run(ckpt: String) = TxLog.streamUpsertSink(
      spark.readStream.schema("k BIGINT, v STRING, rev BIGINT")
        .json(s"$base/in"),
      s"$base/t", Seq("k"), "rev", ckpt).awaitTermination()
    run(s"$base/ckpt")
    val rows = TxLog.snapshot(spark, s"$base/t")
      .as[(Long, String, Long)].collect().sorted
    assert(rows.toSeq == Seq((1L, "b", 1L), (2L, "x", 0L)))
    // a lost checkpoint replays batch 0 — the table's own batch-id
    // ledger must skip it (the classic at-least-once window)
    val nCommits = TxLog.commits(s"$base/t").size
    run(s"$base/ckpt2")
    assert(TxLog.commits(s"$base/t").size == nCommits,
      "a replayed batch id must commit nothing")
    assert(TxLog.snapshot(spark, s"$base/t").count() == 2)
  }

  test("incremental aggregate over the net feed equals a recompute") {
    val t = tmp("txlog_incagg")
    val mk = (rows: Seq[(Long, String, Long)]) => rows.toDF("id", "g", "v")
    TxLog.write(mk(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)))
      .repartitionByRange(2, col("id")), t, "overwrite")
    val mark = TxLog.latestVersion(t).get
    val state0 = TxLog.aggState(TxLog.snapshot(spark, t), Seq("g"), Seq("v"))
    TxLog.write(mk(Seq((4L, "c", 7L))), t, "append")
    TxLog.delete(spark, t, col("g") === "b") // group b vanishes
    TxLog.upsert(spark, t, mk(Seq((1L, "a", 100L))), Seq("id")) // update
    val inc = TxLog.incrementalAgg(state0,
      TxLog.netChanges(spark, t, fromV = mark), Seq("g"), Seq("v"))
      .as[(String, Long, Long)].collect().sorted.toSeq
    val full = TxLog.aggState(TxLog.snapshot(spark, t), Seq("g"), Seq("v"))
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(inc == full, s"incremental $inc must equal recompute $full")
    assert(inc == Seq(("a", 2L, 120L), ("c", 1L, 7L)),
      "group b (fully deleted) must drop out of the state")
  }

  test("hardening: compact-then-append, history-cut guard, empty feeds") {
    val t = tmp("txlog_hard")
    // appends compare schema SHAPE: compaction records the parquet-
    // read (all-nullable) DDL, and the original NOT-NULL source must
    // still append afterwards
    TxLog.write(Seq(1L, 2L).toDF("id"), t, "overwrite")
    TxLog.compact(spark, t)
    TxLog.write(Seq(3L).toDF("id"), t, "append")
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L, 2L, 3L))
    // a history cut at a non-overwrite boundary would lose live files
    // on replay — rejected
    val eCut = intercept[IllegalArgumentException](
      TxLog.vacuum(t, dropHistoryBefore = TxLog.latestVersion(t).get, retainMs = 0L))
    assert(eCut.getMessage.contains("overwrite commit"))
    // a checkpoint commit changes zero rows → absent from the feed
    val preCp = TxLog.latestVersion(t).get
    TxLog.checkpointLog(t)
    assert(TxLog.changes(spark, t, fromV = preCp).count() == 0)
    // an unbounded deleteRange would silently skip all-null-stat files
    val eDr = intercept[IllegalArgumentException](
      TxLog.deleteRange(spark, t, "id", None, None))
    assert(eDr.getMessage.contains("at least one bound"))
    // a replayed batch id loses even at the version-claim level (the
    // zombie-driver race re-checks the ledger inside the retry loop)
    TxLog.write(Seq(9L).toDF("id"), t, "append", batchId = 41L)
    assert(TxLog.writeCommit(t, "append", 41L, Nil, "") == -1L)
    // deleting every row leaves an empty table whose feed and pruned
    // reads come back EMPTY with schema, not as a crash
    TxLog.delete(spark, t, lit(true))
    assert(TxLog.liveFiles(t).isEmpty)
    val feed = TxLog.changes(spark, t,
      fromV = TxLog.latestVersion(t).get)
    assert(feed.count() == 0 && feed.columns.contains("id"))
    val r = TxLog.snapshotRange(spark, t, "id", Some(1L), None)
    assert(r.count() == 0 && r.columns.toSeq.contains("id"))
  }

  test("upsertOrdered: a stale revision can never regress a key") {
    val t = tmp("txlog_ordup")
    val mk = (rows: Seq[(Long, String, Long)]) => rows.toDF("k", "v", "rev")
    TxLog.write(mk(Seq((1L, "new", 5L), (2L, "x", 1L)))
      .repartition(2), t, "overwrite")
    // the r13 ADVICE failure: an OLDER revision of key 1 arrives later
    // (clock skew / backfill). Unconditional last-writer-wins would
    // regress k=1 to "old"; the orderCol guard must keep rev 5
    TxLog.upsertOrdered(spark, t, mk(Seq((1L, "old", 3L), (3L, "c", 1L))),
      Seq("k"), "rev")
    val rows = TxLog.snapshot(spark, t)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(rows == Seq((1L, "new", 5L), (2L, "x", 1L), (3L, "c", 1L)))
    // a genuinely newer revision still replaces
    TxLog.upsertOrdered(spark, t, mk(Seq((1L, "newer", 9L))), Seq("k"), "rev")
    assert(TxLog.snapshot(spark, t).where(col("k") === 1L)
      .select("v").as[String].head() == "newer")
    // several source revisions of one key collapse to the max in the
    // same call; a NULL-rev revision loses to any sequenced one
    TxLog.upsertOrdered(spark, t,
      Seq((2L, Some("r7"), Some(7L)), (2L, Some("r6"), Some(6L)),
        (2L, Some("unseq"), None: Option[Long])).toDF("k", "v", "rev"),
      Seq("k"), "rev")
    assert(TxLog.snapshot(spark, t).where(col("k") === 2L)
      .select("v").as[String].head() == "r7")
  }

  test("streaming CDC upsert: an out-of-order LATER batch cannot regress") {
    val base = tmp("txlog_ooo")
    // batch 1 (mtime-ordered): rev 5 of key 1; batch 2: rev 3 (stale)
    def emit(rows: Seq[(Long, String, Long)], i: Int): Unit = {
      val stage = s"$base/stage$i"
      rows.toDF("k", "v", "rev").coalesce(1).write.json(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".json")).head
      val dst = Paths.get(s"$base/in", f"b$i%03d.json")
      Files.createDirectories(dst.getParent)
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 600000L); ()
    }
    emit(Seq((1L, "fresh", 5L), (2L, "x", 1L)), 0)
    emit(Seq((1L, "stale", 3L), (3L, "c", 2L)), 1)
    TxLog.streamUpsertSink(
      spark.readStream.schema("k BIGINT, v STRING, rev BIGINT")
        .option("maxFilesPerTrigger", "1").json(s"$base/in"),
      s"$base/t", Seq("k"), "rev", s"$base/ckpt").awaitTermination()
    val rows = TxLog.snapshot(spark, s"$base/t")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(rows == Seq((1L, "fresh", 5L), (2L, "x", 1L), (3L, "c", 2L)),
      s"stale cross-batch revision must lose: $rows")
  }

  test("checkpoint pointer: O(tail) replay, ledger survives history drop") {
    val t = tmp("txlog_ptr")
    (0L to 5L).foreach(i =>
      TxLog.write(Seq(i).toDF("id"), t, "append", batchId = i))
    val cp = TxLog.checkpointLog(t)
    assert(TxLog.lastCheckpoint(t).contains((cp, 5L)),
      "pointer must carry the checkpoint version and the max batch id")
    // replay-from-pointer must agree with full replay
    assert(ids(TxLog.snapshot(spark, t)) == (0L to 5L))
    // drop history before the checkpoint: the tail has no batch=0..5
    // commits anymore, but the pointer's max_batch keeps the
    // exactly-once ledger sound — a zombie replay of batch 3 is skipped
    TxLog.vacuum(t, dropHistoryBefore = cp, retainMs = 0L)
    assert(TxLog.isBatchCommitted(t, 3L), "ledger must survive the cut")
    assert(!TxLog.isBatchCommitted(t, 6L))
    assert(TxLog.write(Seq(99L).toDF("id"), t, "append", batchId = 3L) == -1L)
    assert(ids(TxLog.snapshot(spark, t)) == (0L to 5L))
    // a later checkpoint absorbs the previous pointer's max_batch
    TxLog.write(Seq(6L).toDF("id"), t, "append", batchId = 6L)
    val cp2 = TxLog.checkpointLog(t)
    assert(TxLog.lastCheckpoint(t).contains((cp2, 6L)))
    // time travel BEFORE the pointer still resolves (full replay path)
    assert(ids(TxLog.snapshot(spark, t, Some(cp))) == (0L to 5L))
  }

  test("auto-checkpoint: a long-running stream keeps the replay tail bounded") {
    val base = tmp("txlog_autocp")
    def emit(i: Int): Unit = {
      val stage = s"$base/stage$i"
      Seq(i.toLong).toDF("id").coalesce(1).write.json(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".json")).head
      val dst = Paths.get(s"$base/in", f"f$i%03d.json")
      Files.createDirectories(dst.getParent)
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L); ()
    }
    (0 until 6).foreach(emit)
    TxLog.streamSink(
      spark.readStream.schema("id BIGINT")
        .option("maxFilesPerTrigger", "1").json(s"$base/in"),
      s"$base/t", s"$base/ckpt", autoCheckpointEvery = 2).awaitTermination()
    val ptr = TxLog.lastCheckpoint(s"$base/t")
    assert(ptr.nonEmpty, "the sink must have checkpointed")
    assert(TxLog.latestVersion(s"$base/t").get - ptr.get._1 <= 2,
      "replay tail must stay bounded by the checkpoint cadence")
    assert(ids(TxLog.snapshot(spark, s"$base/t")) == (0L to 5L),
      "checkpoints are content-neutral")
  }

  test("snapshotRange: raw-micros Long bounds on a timestamp column") {
    val t = tmp("txlog_tsbound")
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-15 00:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-02-10 00:00:00")))
      .toDF("id", "ts")
    TxLog.write(df.repartitionByRange(3, col("id")), t, "overwrite")
    // r13 ADVICE: pruning compared micros while the exact filter
    // coerced the long as SECONDS (or failed analysis) — the documented
    // raw-micros input form must now work end to end
    val loMicros = 1704672000000000L // 2024-01-08 00:00:00 UTC
    val hiMicros = 1706745600000000L // 2024-02-01 00:00:00 UTC
    val got = TxLog.snapshotRange(spark, t, "ts",
      Some(loMicros), Some(hiMicros))
    assert(got.select("id").as[Long].collect().toSeq == Seq(2L),
      "only the mid-January row is inside the micros window")
    // Timestamp-typed bounds still work unchanged
    val got2 = TxLog.snapshotRange(spark, t, "ts",
      Some(java.sql.Timestamp.valueOf("2024-01-08 00:00:00")), None)
    assert(got2.count() == 2)
  }

  test("SQL through a registered view keeps parquet pushdown") {
    val t = tmp("txlog_viewpush")
    TxLog.write((1L to 100L).toDF("id"), t, "overwrite")
    TxLog.registerView(spark, t, "txsql_push_v")
    val plan = spark.sql("SELECT id FROM txsql_push_v WHERE id > 90")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,90)"),
      plan.take(600))
  }

  test("concurrent appends: real racing threads all land exactly once") {
    val t = tmp("txlog_race_mt")
    TxLog.write(Seq(-1L).toDF("id"), t, "overwrite")
    // 8 real threads race the optimistic version claim; every commit
    // must land (no lost updates) at a distinct version
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = TxLog.write(Seq(i.toLong).toDF("id"), t, "append")
        })
      }
      val versions = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(versions.toSet.size == 8, s"distinct versions: $versions")
      assert(versions.forall(_ >= 1L))
    } finally pool.shutdown()
    assert(ids(TxLog.snapshot(spark, t)) == (-1L to 7L),
      "every racing append must land exactly once")
    assert(TxLog.commits(t).size == 9)
  }

  test("restore: roll back to an earlier version as a new commit") {
    val t = tmp("txlog_restore")
    TxLog.write(Seq(1L, 2L).toDF("id"), t, "overwrite")      // v0: good
    TxLog.write(Seq(666L).toDF("id"), t, "append")           // v1: bad data
    TxLog.update(spark, t, col("id") === 2L,
      Map("id" -> lit(777L)))                                 // v2: bad patch
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L, 666L, 777L))
    val rv = TxLog.restore(t, 0L)
    assert(rv == 3L, "restore lands as a NEW commit")
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L, 2L),
      "the table is back at v0's content")
    // the bad era stays time-travel readable (nothing was deleted)
    assert(ids(TxLog.snapshot(spark, t, Some(2L))) == Seq(1L, 666L, 777L))
    // restore is metadata-only: no new data files were written
    assert(TxLog.liveFiles(t).toSet == TxLog.liveFiles(t, Some(0L)).toSet)
    // stats survive the restore: pruning still works off carried stats
    val (kept, total) = TxLog.pruneFiles(t, "id", Some(100L), None)
    assert(total > 0 && kept.size <= total)
    // a never-existed version fails loudly
    intercept[IllegalArgumentException](TxLog.restore(t, 99L))
  }

  test("merge discovery is stats-bounded for single-column keys") {
    val t = tmp("txlog_mergeprune")
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    TxLog.write(df.repartitionByRange(8, col("id")), t, "overwrite")
    val total = TxLog.liveFiles(t).size
    // the source touches only a narrow recent range: stats must bound
    // the candidate space to a strict subset of the live set
    val (kept, _) = TxLog.pruneFiles(t, "id", Some(900L), Some(949L))
    assert(kept.size < total, "range-clustered table must prune")
    // and the upsert through that path is still exactly correct
    TxLog.upsert(spark, t,
      (900L until 950L).map(i => (i, "patched")).toDF("id", "v"), Seq("id"))
    val out = TxLog.snapshot(spark, t).as[(Long, String)].collect().toMap
    assert(out.size == 1000)
    assert(out(925L) == "patched" && out(899L) == "v899" && out(950L) == "v950")
    // the rewrite touched only the pruned candidates' matching files
    assert(TxLog.commits(t).last.removes.size <= kept.size)
    // NULL-key source rows insert through the fallback path unchanged
    TxLog.upsert(spark, t,
      Seq((Option.empty[Long], "nullkey")).toDF("id", "v"), Seq("id"))
    assert(TxLog.snapshot(spark, t).count() == 1001)
    // ordered upsert rejects an orderCol absent from source or table
    intercept[IllegalArgumentException](TxLog.upsertOrdered(spark, t,
      Seq((1L, "x")).toDF("id", "v"), Seq("id"), "rev"))
  }

  test("TIMESTAMP AS OF: pre-15 logs without in-commit stamps fall back to mtimes") {
    val t = tmp("txlog_tsasof")
    TxLog.write(Seq(1L).toDF("id"), t, "overwrite") // v0
    TxLog.write(Seq(2L).toDF("id"), t, "append")    // v1
    TxLog.write(Seq(9L).toDF("id"), t, "overwrite") // v2
    // simulate a log written before in-commit timestamps existed:
    // strip the ts= lines, then control the clock via mtimes (the
    // fallback the old resolution scheme used exclusively)
    (0 to 2).foreach { v =>
      val p = Paths.get(t, "_txlog", f"$v%010d.txt")
      val txt = new String(Files.readAllBytes(p), "UTF-8")
        .linesIterator.filterNot(_.startsWith("ts=")).mkString("\n") + "\n"
      Files.write(p, txt.getBytes("UTF-8")); ()
    }
    TxLog.clearParseCache()
    val t0 = 1700000000000L
    (0 to 2).foreach(v => Paths.get(t, "_txlog", f"$v%010d.txt")
      .toFile.setLastModified(t0 + v * 3600000L))
    assert(TxLog.versionAt(t, t0 - 1).isEmpty)
    assert(TxLog.versionAt(t, t0).contains(0L))
    assert(TxLog.versionAt(t, t0 + 3600000L + 5).contains(1L))
    assert(TxLog.versionAt(t, Long.MaxValue).contains(2L))
    assert(ids(TxLog.snapshotAsOf(spark, t, t0 + 3600000L)) == Seq(1L, 2L))
    assert(ids(TxLog.snapshotAsOf(spark, t, t0 + 8000000L)) == Seq(9L))
    intercept[IllegalArgumentException](TxLog.snapshotAsOf(spark, t, t0 - 10))
  }

  test("change feed replays from the checkpoint pointer when it predates the window") {
    val t = tmp("txlog_cdfptr")
    TxLog.write(Seq(1L, 2L).toDF("id"), t, "overwrite")
    TxLog.write(Seq(3L).toDF("id"), t, "append")
    val cp = TxLog.checkpointLog(t) // pointer here
    val mark = cp
    TxLog.write(Seq(4L).toDF("id"), t, "append")
    TxLog.delete(spark, t, col("id") === 1L)
    // the feed over (mark, latest] must be exactly +4, -1 — identical
    // to what a from-zero replay yields, with the pointer in play
    val net = TxLog.netChanges(spark, t, fromV = mark)
      .select("id", "_change_type").as[(Long, String)].collect().sorted.toSeq
    assert(net == Seq((1L, "delete"), (4L, "insert")))
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

  test("in-commit timestamps: TIMESTAMP AS OF survives mtime disturbance") {
    val t = tmp("txlog_icts")
    TxLog.write(Seq(1L).toDF("id"), t, "append")      // v0
    TxLog.write(Seq(2L).toDF("id"), t, "append")      // v1
    val cs = TxLog.commits(t)
    val (ts0, ts1) = (cs(0).ts, cs(1).ts)
    assert(ts0 > 0)
    assert(ts1 > ts0, "strictly monotonic even within one clock ms")
    // a backup restore / file copy disturbs every mtime — resolution
    // must not care (the pre-15 mtime scheme broke exactly here)
    Seq(0L, 1L).foreach { v =>
      Paths.get(t, "_txlog", f"$v%010d.txt").toFile.setLastModified(7777777L)
    }
    TxLog.clearParseCache()
    assert(TxLog.versionAt(t, ts0).contains(0L))
    assert(TxLog.versionAt(t, ts1 - 1).contains(0L))
    assert(TxLog.versionAt(t, ts1).contains(1L))
    assert(TxLog.versionAt(t, ts0 - 1).isEmpty)
    assert(ids(TxLog.snapshotAsOf(spark, t, ts0)) == Seq(1L))
    // history reports the same in-commit clock
    val h = TxLog.history(spark, t).collect().sortBy(_.getLong(0))
    assert(h(0).getAs[Long]("commit_ts_ms") == ts0 &&
      h(1).getAs[Long]("commit_ts_ms") == ts1)
  }

  test("fan-in: two streams with distinct appIds share one table exactly-once") {
    val base = tmp("txlog_fanin")
    val t = s"$base/table"
    def land(dir: String, lo: Int, hi: Int): Unit = {
      Files.createDirectories(Paths.get(dir))
      (lo until hi).foreach(i => Files.write(Paths.get(dir, f"f$i%03d.json"),
        s"""{"id":$i}""".getBytes("UTF-8")))
      ()
    }
    land(s"$base/inA", 0, 8); land(s"$base/inB", 100, 108)
    def drain(in: String, ckpt: String, app: String): Unit =
      TxLog.streamSink(spark.readStream.schema("id LONG")
        .option("maxFilesPerTrigger", "1").json(in), t, s"$base/$ckpt",
        appId = app).awaitTermination()
    drain(s"$base/inA", "ckA", "streamA") // batch ids 0..7 under app A
    // stream B's ids ALSO start at 0 — without app scoping every one
    // of them would be skipped as A's replays
    drain(s"$base/inB", "ckB", "streamB")
    assert(ids(TxLog.snapshot(spark, t)) == ((0L to 7L) ++ (100L to 107L)))
    // restarts drain nothing (each app's own ledger)
    drain(s"$base/inA", "ckA", "streamA")
    drain(s"$base/inB", "ckB", "streamB")
    assert(TxLog.snapshot(spark, t).count() == 16L)
    assert(TxLog.committedBatches(t, "streamA") == (0L to 7L).toSet)
    assert(TxLog.committedBatches(t, "streamB") == (0L to 7L).toSet)
    assert(TxLog.committedBatches(t).isEmpty, "the legacy ledger is its own app")
    // the checkpoint pointer absorbs PER-APP maxes: after a history
    // drop, a zombie replay of either app's old batch is still skipped
    val cp = TxLog.checkpointLog(t)
    TxLog.vacuum(t, dropHistoryBefore = cp, retainMs = 0L)
    assert(TxLog.write(Seq(999L).toDF("id"), t, "append",
      batchId = 5L, appId = "streamA") == -1L)
    assert(TxLog.write(Seq(998L).toDF("id"), t, "append",
      batchId = 5L, appId = "streamB") == -1L)
    // a NEW app's id 5 is a different transaction and lands
    assert(TxLog.write(Seq(997L).toDF("id"), t, "append",
      batchId = 5L, appId = "streamC") >= 0L)
    assert(ids(TxLog.snapshot(spark, t)).contains(997L))
    assert(!ids(TxLog.snapshot(spark, t)).contains(999L))
  }

  test("a commit declaring a newer log format is refused, not misread") {
    val t = tmp("txlog_format")
    TxLog.write(Seq(1L).toDF("id"), t, "append")
    assert(TxLog.commits(t).nonEmpty) // format=1 reads fine
    Files.write(Paths.get(t, "_txlog", f"${1L}%010d.txt"),
      "format=3\nmode=append\nbatch=-1\nadd=future.parquet\n"
        .getBytes("UTF-8"))
    TxLog.clearParseCache()
    val e = intercept[IllegalStateException] { TxLog.commits(t) }
    assert(e.getMessage.contains("format 3"))
  }

  test("detail, vacuum dry run, size-targeted compaction") {
    val t = tmp("txlog_detail")
    TxLog.write(spark.range(0, 1000).select(col("id"))
      .repartition(4), t, "overwrite")
    TxLog.delete(spark, t, col("id") < 100L) // rewrite: tombstones appear
    Files.write(Paths.get(t, "orphan-x.parquet"), Array[Byte](1))
    val d = TxLog.detail(spark, t).head()
    assert(d.getAs[Long]("n_live_files") == TxLog.liveFiles(t).size.toLong)
    assert(d.getAs[Long]("n_tombstoned_files") > 0,
      "the delete must leave historical files visible as tombstones")
    assert(d.getAs[Long]("live_bytes") > 0 &&
      d.getAs[Long]("tombstoned_bytes") > 0)
    assert(d.getAs[Long]("latest_version") == 1L &&
      d.getAs[Long]("n_commits") == 2L)
    assert(!d.getAs[Boolean]("is_stream_source"))
    // dry run lists the orphan plus staging debris (exactly vacuum's
    // reclaim set) and deletes nothing
    val dry = TxLog.vacuumDryRun(t)
    assert(dry.contains("orphan-x.parquet"), dry.toString)
    assert(dry.forall(f =>
      f == "orphan-x.parquet" || f.startsWith("_staging/")), dry.toString)
    assert(Files.exists(Paths.get(t, "orphan-x.parquet")))
    // size-targeted OPTIMIZE: a generous byte target collapses the
    // live set to one file, content-neutral
    val before = ids(TxLog.snapshot(spark, t))
    TxLog.compactToSize(spark, t, targetBytes = 1L << 30)
    assert(TxLog.liveFiles(t).size == 1)
    assert(ids(TxLog.snapshot(spark, t)) == before)
  }

  test("deleteKeys: MERGE-delete by key set — matched rows go, NULL keys never match") {
    val t = tmp("txlog_delkeys")
    TxLog.write(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "s").repartitionByRange(2, col("id")), t, "overwrite")
    val keys = Seq(Some(2L), Some(4L), None: Option[Long], Some(99L))
      .toDF("id")
    val v = TxLog.deleteKeys(spark, t, Seq("id"), keys)
    assert(v == 1L)
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L, 3L))
    // no-hit key set: no commit lands
    assert(TxLog.deleteKeys(spark, t, Seq("id"),
      Seq(77L).toDF("id")) == 1L)
    assert(TxLog.latestVersion(t).contains(1L))
    // time travel still sees the pre-delete rows
    assert(ids(TxLog.snapshot(spark, t, Some(0L))) == Seq(1L, 2L, 3L, 4L))
  }

  test("history: one row per commit, modes and file counts exact") {
    val t = tmp("txlog_history")
    TxLog.write(Seq(1L, 2L).toDF("id").coalesce(2), t, "overwrite")
    TxLog.write(Seq(3L).toDF("id").coalesce(1), t, "append")
    TxLog.delete(spark, t, col("id") === 1L)
    val h = TxLog.history(spark, t)
      .select("version", "mode", "batch_id", "n_adds", "n_removes")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(h.map(r => (r._1, r._2, r._3)) ==
      Seq((0L, "overwrite", -1L), (1L, "append", -1L), (2L, "rewrite", -1L)))
    assert(h(1)._4 == 1L && h(1)._5 == 0L, "append: one add, no removes")
    assert(h(2)._5 == 1L, "the delete rewrote exactly the one hit file")
    val ts = TxLog.history(spark, t).select("commit_ts_ms")
      .as[Long].collect()
    assert(ts.forall(_ > 0L), "commit timestamps come from the log mtimes")
  }

  test("snapshotWhere: conjunctive skipping, tighter than either column") {
    val t = tmp("txlog_where")
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") % 10).as("bucket"),
        concat(lit("s"), (col("id") % 7)).as("tag"))
    TxLog.write(graft.ingest.Layout.zOrdered(df, "id", "bucket", 16),
      t, "overwrite")
    import TxLog.Pred
    val preds = Seq(Pred.Range("id", Some(100L), Some(199L)),
      Pred.Eq("bucket", 3L), Pred.In("tag", Seq("s1", "s2")))
    val (keptBoth, total) = TxLog.pruneFilesWhere(t, preds)
    val (keptId, _) = TxLog.pruneFilesWhere(t, preds.take(1))
    assert(keptBoth.size < total, "conjunction must prune")
    assert(keptBoth.size <= keptId.size,
      "an extra predicate can only shrink the kept set")
    val got = TxLog.snapshotWhere(spark, t, preds)
      .select("id").as[Long].collect().sorted.toSeq
    val want = df.where(col("id").between(100, 199) && col("bucket") === 3 &&
      col("tag").isin("s1", "s2"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want, "pruning must be invisible in the data")
  }

  test("snapshotWhere: IsNull/NotNull prune from recorded null counts") {
    val t = tmp("txlog_nulls")
    // three files: no-null, all-null, mixed — one commit each
    TxLog.write(Seq((1L, Some(10L)), (2L, Some(20L))).toDF("id", "v")
      .coalesce(1), t, "overwrite")
    TxLog.write(Seq((3L, None: Option[Long]), (4L, None: Option[Long]))
      .toDF("id", "v").coalesce(1), t, "append")
    TxLog.write(Seq((5L, Some(50L)), (6L, None: Option[Long]))
      .toDF("id", "v").coalesce(1), t, "append")
    import TxLog.Pred
    val (keptNull, total) = TxLog.pruneFilesWhere(t, Seq(Pred.IsNull("v")))
    assert(total == 3 && keptNull.size == 2,
      "IS NULL must drop the zero-null file")
    val (keptNotNull, _) = TxLog.pruneFilesWhere(t, Seq(Pred.NotNull("v")))
    assert(keptNotNull.size == 2, "IS NOT NULL must drop the all-null file")
    assert(ids(TxLog.snapshotWhere(spark, t, Seq(Pred.IsNull("v"))))
      == Seq(3L, 4L, 6L))
    assert(ids(TxLog.snapshotWhere(spark, t, Seq(Pred.NotNull("v"))))
      == Seq(1L, 2L, 5L))
    // NULL equality is a contradiction in SQL — refuse it loudly
    intercept[IllegalArgumentException] {
      TxLog.pruneFilesWhere(t, Seq(Pred.Eq("v", null)))
    }
  }

  test("constraints: violating writes abort before the commit, table unchanged") {
    val t = tmp("txlog_cons")
    TxLog.write(Seq((1L, 100L), (2L, 200L)).toDF("id", "n"), t, "overwrite")
    TxLog.addConstraint(spark, t, "n_positive", "n > 0")
    // a violating batch must not land — and must not leak staged files
    val ex = intercept[IllegalArgumentException] {
      TxLog.write(Seq((3L, -5L)).toDF("id", "n"), t, "append")
    }
    assert(ex.getMessage.contains("n_positive"))
    assert(TxLog.latestVersion(t).contains(0L), "no commit may land")
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L, 2L))
    val referenced = TxLog.commits(t).flatMap(_.adds).toSet
    val onDisk = Files.list(Paths.get(t)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).map(p => Paths.get(p).getFileName.toString)
    assert(onDisk.toSet == referenced, "staged files must be cleaned up")
    // NULL predicate = violation (CHECK must be TRUE)
    intercept[IllegalArgumentException] {
      TxLog.write(Seq((4L, None: Option[Long])).toDF("id", "n"), t, "append")
    }
    // rewrites are constrained too: an update can't poison the table
    intercept[IllegalArgumentException] {
      TxLog.update(spark, t, col("id") === 1L, Map("n" -> lit(-1L)))
    }
    assert(TxLog.snapshot(spark, t).where(col("n") <= 0).isEmpty)
    // a passing batch lands; after drop, the old violator lands too
    TxLog.write(Seq((5L, 500L)).toDF("id", "n"), t, "append")
    TxLog.dropConstraint(t, "n_positive")
    TxLog.write(Seq((3L, -5L)).toDF("id", "n"), t, "append")
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L, 2L, 3L, 5L))
  }

  test("constraints: adding one validates existing rows; IS NOT NULL rides stats") {
    val t = tmp("txlog_consadd")
    TxLog.write(Seq((1L, Some(10L)), (2L, None: Option[Long]))
      .toDF("id", "v"), t, "overwrite")
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, t, "v_set", "v IS NOT NULL")
    }
    assert(TxLog.constraints(t).isEmpty, "failed add must not register")
    TxLog.delete(spark, t, col("v").isNull)
    TxLog.addConstraint(spark, t, "v_set", "v IS NOT NULL")
    // the metadata fast path decides this from staged footer stats
    intercept[IllegalArgumentException] {
      TxLog.write(Seq((3L, None: Option[Long])).toDF("id", "v"), t, "append")
    }
    TxLog.write(Seq((3L, Some(30L))).toDF("id", "v"), t, "append")
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L, 3L))
  }

  test("writeExpect: clean rows commit, violators quarantine with names") {
    val t = tmp("txlog_expect"); val q = tmp("txlog_quarantine")
    val df = Seq((1L, 10L, "a"), (2L, -1L, "a"), (3L, 10L, ""),
      (4L, -2L, "")).toDF("id", "n", "s")
    val (v1, v2) = TxLog.writeExpect(df, t, q,
      Map("n_positive" -> "n > 0", "s_nonempty" -> "s <> ''"),
      batchId = 0L)
    assert(v1 == 0L && v2 == 0L)
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L))
    val bad = TxLog.snapshot(spark, q).select("id", "_violation")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(bad == Seq((2L, "n_positive"), (3L, "s_nonempty"),
      (4L, "n_positive,s_nonempty")),
      "violation names must be comma-joined in name order")
    // exactly-once rides BOTH commits
    val (r1, r2) = TxLog.writeExpect(df, t, q,
      Map("n_positive" -> "n > 0", "s_nonempty" -> "s <> ''"),
      batchId = 0L)
    assert(r1 == -1L && r2 == -1L, "replayed batch commits nothing")
    assert(TxLog.snapshot(spark, t).count() == 1L)
    assert(TxLog.snapshot(spark, q).count() == 3L)
  }

  test("streamExpectSink: per-batch split, exactly-once on both tables across restart") {
    val base = tmp("txlog_sexpect")
    Seq((1L, 10L), (2L, -1L)).toDF("id", "n")
      .coalesce(1).write.json(s"$base/in")
    def drain(): Unit =
      TxLog.streamExpectSink(
        spark.readStream.schema("id BIGINT, n BIGINT")
          .json(s"$base/in"),
        s"$base/main", s"$base/q", Map("n_pos" -> "n > 0"), s"$base/ckpt")
        .awaitTermination()
    drain()
    assert(ids(TxLog.snapshot(spark, s"$base/main")) == Seq(1L))
    assert(ids(TxLog.snapshot(spark, s"$base/q")) == Seq(2L))
    // restart on the same checkpoint: nothing drains, nothing doubles
    drain()
    assert(TxLog.snapshot(spark, s"$base/main").count() == 1L)
    assert(TxLog.snapshot(spark, s"$base/q").count() == 1L)
  }

  test("streaming source: an evolve append widens the schema on the next start") {
    val base = tmp("txlog_srcevolve")
    val t = s"$base/table"
    TxLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")
    def drain(tag: String): Unit = {
      val q = TxLog.streamSource(spark, t).writeStream
        .format("parquet").option("path", s"$base/out$tag")
        .option("checkpointLocation", s"$base/ckpt$tag")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain("1")
    assert(spark.read.parquet(s"$base/out1").columns.toSeq == Seq("id", "s"))
    TxLog.write(Seq((2L, "b", 7L)).toDF("id", "s", "extra"), t, "append",
      evolve = true)
    // a NEW consumer start sees the widened schema; the pre-evolution
    // file's rows null-fill the added column
    drain("2")
    val got = spark.read.parquet(s"$base/out2")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got == Seq((1L, "a", None), (2L, "b", Some(7L))), got.toString)
  }

  test("streaming source: snapshot-then-tail, exactly once, append-only enforced") {
    val base = tmp("txlog_source")
    val t = s"$base/table"
    // pre-source history may contain anything — the initial publish is
    // the CURRENT live set, Delta's initial-snapshot semantics
    TxLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, "overwrite")
    TxLog.write(Seq((3L, "c")).toDF("id", "s"), t, "append")
    TxLog.delete(spark, t, col("id") === 2L) // pre-source rewrite: fine
    def drain(): Unit = {
      val qy = TxLog.streamSource(spark, t).writeStream
        .format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      qy.awaitTermination()
    }
    drain()
    assert(ids(spark.read.parquet(s"$base/out")) == Seq(1L, 3L))
    // the live tail: a new append publishes at COMMIT time (no extra
    // publish call) and only the delta reaches the consumer's sink
    TxLog.write(Seq((4L, "d")).toDF("id", "s"), t, "append")
    assert(TxLog.publishAppends(t) == 0,
      "the commit hook must have published already")
    drain()
    assert(ids(spark.read.parquet(s"$base/out")) == Seq(1L, 3L, 4L),
      "restart drains exactly the new rows, no re-reads")
    // append-only from now on: the shapes a file-source consumer
    // cannot un-see are refused at commit time, table unchanged
    intercept[IllegalArgumentException] {
      TxLog.delete(spark, t, col("id") === 1L)
    }
    intercept[IllegalArgumentException] { TxLog.compact(spark, t) }
    assert(ids(TxLog.snapshot(spark, t)) == Seq(1L, 3L, 4L))
    // metadata-only checkpoints stay allowed and publish nothing new
    TxLog.checkpointLog(t)
    assert(TxLog.publishAppends(t) == 0)
    drain()
    assert(ids(spark.read.parquet(s"$base/out")) == Seq(1L, 3L, 4L))
  }

  test("an append staged while an evolve landed cannot revert the schema") {
    val t = tmp("evolve_race")
    TxLog.write(spark.range(10).select(col("id"), (col("id") * 2).as("v")),
      t, "overwrite")
    TxRaceHook.fired.set(false)
    // a concurrent evolve append (metadata-only: zero files, widened
    // schema=) lands WHILE this append's staging job runs — letting
    // the append commit anyway would silently revert the widened
    // schema with its stale schema= line
    val evil = udf { (x: Long) =>
      if (TxRaceHook.fired.compareAndSet(false, true))
        TxLog.writeCommit(t, "append", -1L, Nil,
          "id BIGINT, v BIGINT, extra BIGINT")
      x
    }
    val e = intercept[IllegalArgumentException] {
      TxLog.write(spark.range(5).toDF("id")
        .select(col("id"), evil(col("id") * 2).as("v")), t)
    }
    assert(e.getMessage.contains("append schema mismatch"),
      s"got: ${e.getMessage}")
    // the widened schema survives — nothing reverted
    assert(TxLog.schemaAt(t).contains("extra"))
    assert(TxLog.snapshot(spark, t).columns.toSeq == Seq("id", "v", "extra"))
  }
}

/** JVM-global race-injection latch (top-level: static access from the
  * udf closure — a per-task copy would fire once per task). */
object TxRaceHook {
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
}
