package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** Merge-on-read deletion vectors, property by property: a dv commit
  * masks rows WITHOUT touching the data files; every read path
  * (snapshot, time travel, range/where-pruned reads, CDF, COW row
  * ops) sees only visible rows; masks survive checkpoints and
  * restores, materialize away under OPTIMIZE, conflict loudly with
  * racing writers, and vacuum reclaims only unreferenced dv sets. */
class TxLogDvSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  /** 0..99 in 4 files, id + a payload column. */
  private def seed(t: String): Unit = {
    TxLog.write(
      spark.range(100).select(col("id"), (col("id") % 10).as("grp"))
        .repartitionByRange(4, col("id")),
      t, "overwrite")
    ()
  }

  test("deleteVectored masks rows without touching any data file") {
    val t = tmp("dv_del")
    seed(t)
    val filesBefore = TxLog.liveFiles(t)
    val mtimes = filesBefore
      .map(f => f -> Files.getLastModifiedTime(Paths.get(t, f))).toMap
    val v = TxLog.deleteVectored(spark, t, col("id") >= 10 && col("id") < 20)
    assert(v == 1L)
    assert(ids(TxLog.snapshot(spark, t)) == ((0L to 9L) ++ (20L to 99L)))
    // merge-on-read: live set identical, bytes untouched
    assert(TxLog.liveFiles(t) == filesBefore)
    filesBefore.foreach { f =>
      assert(Files.getLastModifiedTime(Paths.get(t, f)) == mtimes(f),
        s"data file $f must not be rewritten by a dv delete")
    }
    // time travel to v0 resurrects the masked rows
    assert(ids(TxLog.snapshot(spark, t, Some(0L))) == (0L to 99L))
    // only the file(s) actually holding 10..19 carry a mask
    val dvm = TxLog.dvAt(t)
    assert(dvm.nonEmpty && dvm.values.map(_._2).sum == 10L)
    // DESCRIBE DETAIL surfaces the mask posture (the OPTIMIZE signal)
    val d = TxLog.detail(spark, t).head()
    assert(d.getAs[Long]("n_dv_masked_files") == dvm.size.toLong)
    assert(d.getAs[Long]("dv_masked_rows") == 10L)
  }

  test("a second delete on the same file unions cumulatively") {
    val t = tmp("dv_cum")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 3L)
    TxLog.deleteVectored(spark, t, col("id") === 5L)
    assert(ids(TxLog.snapshot(spark, t)) ==
      (0L to 99L).filterNot(Set(3L, 5L)))
    // NULL predicate keeps rows (SQL DELETE), nothing matched → no-op
    val before = TxLog.latestVersion(t).get
    assert(TxLog.deleteVectored(spark, t, lit(null).cast("boolean")) == before)
    assert(TxLog.dvAt(t).values.map(_._2).sum == 2L)
  }

  test("updateVectored masks originals and re-lands updated rows") {
    val t = tmp("dv_upd")
    seed(t)
    val live0 = TxLog.liveFiles(t).toSet
    TxLog.updateVectored(spark, t, col("id") < 5L,
      Map("grp" -> lit(77L)))
    val snap = TxLog.snapshot(spark, t)
    assert(snap.count() == 100L)
    assert(snap.where(col("grp") === 77L).count() == 5L)
    assert(ids(snap.where(col("grp") === 77L)) == (0L to 4L))
    // original files still live (masked), new files appended
    assert(live0.subsetOf(TxLog.liveFiles(t).toSet))
    assert(TxLog.liveFiles(t).size > live0.size)
  }

  test("upsertVectored replaces matched keys and inserts the rest") {
    val t = tmp("dv_ups")
    seed(t)
    val src = Seq((1L, -1L), (2L, -1L), (200L, -1L)).toDF("id", "grp")
    TxLog.upsertVectored(spark, t, src, Seq("id"))
    val snap = TxLog.snapshot(spark, t)
    assert(snap.count() == 101L)
    assert(snap.where(col("grp") === -1L).count() == 3L)
    assert(ids(snap.where(col("grp") === -1L)) == Seq(1L, 2L, 200L))
    // upsert with no matched key is a plain append commit
    val t2 = tmp("dv_ups_nohit")
    seed(t2)
    TxLog.upsertVectored(spark, t2, Seq((500L, 0L)).toDF("id", "grp"),
      Seq("id"))
    assert(TxLog.commits(t2).last.mode == "append")
  }

  test("CDF: a dv commit emits exactly the newly-masked rows as deletes") {
    val t = tmp("dv_cdf")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 7L)          // v1
    TxLog.updateVectored(spark, t, col("id") === 8L,
      Map("grp" -> lit(99L)))                                  // v2
    val ch = TxLog.changes(spark, t, 0L)
    val dels = ch.where(col("_change_type") === "delete")
    val ins = ch.where(col("_change_type") === "insert")
    assert(ids(dels) == Seq(7L, 8L))
    assert(ids(ins) == Seq(8L))
    assert(dels.where(col("_commit_version") === 1L).count() == 1L)
    assert(dels.where(col("_commit_version") === 2L).count() == 1L)
    // net feed: 7 left, 8's old row left, 8's new row entered
    val net = TxLog.netChanges(spark, t, 0L)
    assert(net.where(col("_change_type") === "delete").count() == 2L)
    val netIns = net.where(col("_change_type") === "insert")
    assert(ids(netIns) == Seq(8L) &&
      netIns.head().getAs[Long]("grp") == 99L)
    // a second delete on the SAME file must not re-emit old masks
    TxLog.deleteVectored(spark, t, col("id") === 9L)          // v3
    val ch3 = TxLog.changes(spark, t, 2L)
    assert(ids(ch3.where(col("_change_type") === "delete")) == Seq(9L))
  }

  test("COW ops on a masked table never resurrect masked rows") {
    val t = tmp("dv_cow")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 1L)
    // COW update rewrites the file holding id=2 — id=1 (same file,
    // masked) must not come back
    TxLog.update(spark, t, col("id") === 2L, Map("grp" -> lit(55L)))
    assert(ids(TxLog.snapshot(spark, t)) == (0L to 99L).filterNot(_ == 1L))
    // the rewritten file dropped its mask entry
    assert(TxLog.dvAt(t).isEmpty,
      "rewriting a masked file retires its deletion vector")
    // same through COW upsert
    TxLog.deleteVectored(spark, t, col("id") === 3L)
    TxLog.upsert(spark, t, Seq((4L, -4L)).toDF("id", "grp"), Seq("id"))
    assert(ids(TxLog.snapshot(spark, t)) ==
      (0L to 99L).filterNot(Set(1L, 3L)))
  }

  test("OPTIMIZE materializes masks away; result unchanged") {
    val t = tmp("dv_opt")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") % 7L === 0L)
    val before = ids(TxLog.snapshot(spark, t))
    TxLog.compact(spark, t, targetFiles = 2)
    assert(TxLog.dvAt(t).isEmpty, "compaction lands a mask-free overwrite")
    assert(ids(TxLog.snapshot(spark, t)) == before)
  }

  test("checkpoint carries masks; restore re-establishes them") {
    val t = tmp("dv_ckpt")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 42L)         // v1
    val vCkpt = TxLog.checkpointLog(t)                        // v2
    assert(TxLog.dvAt(t).nonEmpty)
    assert(ids(TxLog.snapshot(spark, t)) == (0L to 99L).filterNot(_ == 42L))
    // replay from the checkpoint pointer alone still sees the mask
    TxLog.write(Seq((1000L, 0L)).toDF("id", "grp"), t, "append") // v3
    assert(!ids(TxLog.snapshot(spark, t)).contains(42L))
    // restore to v0 resurrects 42; restore forward to v1 re-masks it
    TxLog.restore(t, 0L)                                      // v4
    assert(ids(TxLog.snapshot(spark, t)) == (0L to 99L))
    TxLog.restore(t, 1L)                                      // v5
    assert(ids(TxLog.snapshot(spark, t)) == (0L to 99L).filterNot(_ == 42L))
    assert(vCkpt == 2L)
  }

  test("pruned reads (range / where) apply masks on the survivors") {
    val t = tmp("dv_prune")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 30L)
    assert(ids(TxLog.snapshotRange(spark, t, "id", Some(25L), Some(35L)))
      == Seq(25L, 26L, 27L, 28L, 29L, 31L, 32L, 33L, 34L, 35L))
    assert(ids(TxLog.snapshotWhere(spark, t,
      Seq(TxLog.Pred.Range("id", Some(25L), Some(35L)))))
      == Seq(25L, 26L, 27L, 28L, 29L, 31L, 32L, 33L, 34L, 35L))
  }

  test("a stale dv base is a loud conflict, not a lost mask") {
    val t = tmp("dv_conflict")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 1L)
    val f = TxLog.dvAt(t).keys.head
    // writer A planned against the CURRENT mask; writer B re-masks the
    // file first; A must fail at commit time
    intercept[IllegalArgumentException] {
      TxLog.writeCommit(t, "dv", -1L, Nil, "",
        dvs = Map(f -> ("bogus-set", 1L)),
        dvBase = Map(f -> None)) // stale: expects no mask
    }
    // ... and a rewrite planned before the mask landed fails too
    intercept[IllegalArgumentException] {
      TxLog.writeCommit(t, "rewrite", -1L, Nil, "", removes = Seq(f),
        dvBase = Map(f -> None))
    }
    // the honest base passes
    val cur = TxLog.dvAt(t)(f)._1
    val v = TxLog.writeCommit(t, "dv", -1L, Nil, "",
      dvs = Map(f -> (cur, 1L)), dvBase = Map(f -> Some(cur)))
    assert(v == 2L)
  }

  test("vacuum reclaims only unreferenced dv sets; dry run lists them") {
    val t = tmp("dv_vac")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 1L)          // v1
    TxLog.deleteVectored(spark, t, col("id") === 2L)          // v2: set B
    // the v1 set is still REFERENCED (by commit v1, backing time
    // travel): no dv set is reclaimable yet (staging leftovers are)
    assert(!TxLog.vacuumDryRun(t).exists(_.startsWith("_dv")))
    TxLog.vacuum(t, retainMs = 0L)
    val setsBefore = graft.ingest.TxLog.dvAt(t).values.map(_._1).toSet
    assert(Files.isDirectory(Paths.get(t, "_dv")) &&
      setsBefore.forall(s => Files.isDirectory(Paths.get(t, "_dv", s))))
    // checkpoint + drop history < v3: v1's set becomes unreferenced
    val ck = TxLog.checkpointLog(t)                           // v3
    assert(TxLog.vacuum(t, dropHistoryBefore = ck, retainMs = 0L) > 0)
    val dvSets = TxLog.commits(t).flatMap(_.dvs.values.map(_._1)).distinct
    dvSets.foreach(s => assert(
      Files.isDirectory(Paths.get(t, "_dv", s)),
      s"referenced dv set $s must survive vacuum"))
    // masked read still exact after the vacuum
    assert(ids(TxLog.snapshot(spark, t)) == (0L to 99L).filterNot(Set(1L, 2L)))
    // an orphan dv set (failed write) is listed and reclaimed
    val orphan = Paths.get(t, "_dv", "orphan-set")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    assert(TxLog.vacuumDryRun(t).exists(_.contains("orphan-set")))
    assert(TxLog.vacuum(t, retainMs = 0L) >= 1)
    assert(!Files.exists(orphan))
  }

  test("masks survive additive schema evolution; pushdown crosses the mask") {
    val t = tmp("dv_evolve")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 50L)
    // evolve: add a column; pre-evolution (masked) files null-fill it
    TxLog.write(
      spark.range(200, 210).select(col("id"), (col("id") % 10).as("grp"),
        lit("x").as("tag")),
      t, "append", evolve = true)
    val snap = TxLog.snapshot(spark, t)
    assert(snap.count() == 109L)
    assert(!ids(snap).contains(50L),
      "the mask applies across the evolve boundary")
    assert(snap.where(col("tag").isNull).count() == 99L)
    // data-column filters still reach the parquet scan THROUGH the
    // mask anti-join (left-side-only predicates push below LeftAnti)
    val filtered = snap.where(col("id") >= 90L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual"),
      s"filter must push through the masked read:\n$plan")
    assert(ids(filtered) == ((90L to 99L) ++ (200L to 209L)))
    // reserved provenance names are refused up front
    val t2 = tmp("dv_reserved")
    TxLog.write(spark.range(5).select(col("id"), lit(0L).as("_gdv_ri")),
      t2, "overwrite")
    intercept[IllegalArgumentException] {
      TxLog.deleteVectored(spark, t2, col("id") === 1L)
    }
  }

  test("a streaming-source table refuses merge-on-read ops") {
    val t = tmp("dv_stream")
    seed(t)
    TxLog.streamSource(spark, t) // establishes the append-only contract
    intercept[IllegalArgumentException] {
      TxLog.deleteVectored(spark, t, col("id") === 1L)
    }
    intercept[IllegalArgumentException] {
      TxLog.updateVectored(spark, t, col("id") === 1L,
        Map("grp" -> lit(0L)))
    }
  }

  test("upsertOrderedVectored: sequence guard, no rewrite, COW-identical") {
    val t = tmp("dv_upsord")
    val tCow = tmp("dv_upsord_cow")
    def seed100(p: String): Unit = {
      TxLog.write(spark.range(100)
        .select(col("id"), (col("id") % 10).as("grp"),
          lit(5L).as("rev"))
        .repartitionByRange(4, col("id")), p, "overwrite")
      ()
    }
    seed100(t); seed100(tCow)
    // batch 1: newer revision for ids 0-9, STALE revision for 10-19
    val b1 = spark.range(20)
      .select(col("id"), lit(-1L).as("grp"),
        when(col("id") < 10, lit(9L)).otherwise(lit(1L)).as("rev"))
    val filesBefore = TxLog.liveFiles(t)
    TxLog.upsertOrderedVectored(spark, t, b1, Seq("id"), "rev")
    TxLog.upsertOrdered(spark, tCow, b1, Seq("id"), "rev")
    val snap = TxLog.snapshot(spark, t)
    // newer revisions won, stale ones could not regress their keys
    assert(snap.where(col("rev") === 9L).count() == 10L)
    assert(ids(snap.where(col("grp") === -1L)) == (0L to 9L))
    assert(snap.count() == 100L)
    // merge-on-read: every pre-existing file still live (masked, not
    // rewritten)
    assert(filesBefore.toSet.subsetOf(TxLog.liveFiles(t).toSet))
    assert(TxLog.commits(t).last.mode == "dv")
    // bit-identical to the COW path — same pure-function winner rule
    def canon(p: String) = TxLog.snapshot(spark, p)
      .select("id", "grp", "rev").collect().map(_.toSeq).sortBy(_.toString)
    assert(canon(t).toSeq == canon(tCow).toSeq)
    // a second batch re-contests keys already masked once (cumulative
    // masks + the guard across batches)
    val b2 = spark.range(5)
      .select(col("id"), lit(-2L).as("grp"), lit(7L).as("rev"))
    TxLog.upsertOrderedVectored(spark, t, b2, Seq("id"), "rev")
    TxLog.upsertOrdered(spark, tCow, b2, Seq("id"), "rev")
    // rev 9 still beats rev 7; nothing duplicates
    assert(TxLog.snapshot(spark, t).count() == 100L)
    assert(canon(t).toSeq == canon(tCow).toSeq)
  }

  test("randomized op sequences: DV and COW paths converge identically") {
    val rnd = new scala.util.Random(20260815L)
    val t = tmp("dv_fuzz"); val tCow = tmp("dv_fuzz_cow")
    def seed(p: String): Unit = {
      TxLog.write(spark.range(200)
        .select(col("id"), (col("id") % 7).as("grp"), lit(0L).as("rev"))
        .repartitionByRange(5, col("id")), p, "overwrite")
      ()
    }
    seed(t); seed(tCow)
    def canon(p: String) = TxLog.snapshot(spark, p)
      .select("id", "grp", "rev").collect().map(_.toSeq).sortBy(_.toString)
    (1 to 8).foreach { step =>
      rnd.nextInt(3) match {
        case 0 => // point delete of a random id band
          val lo = rnd.nextInt(200).toLong
          val cond = col("id").between(lo, lo + rnd.nextInt(10))
          TxLog.deleteVectored(spark, t, cond)
          TxLog.delete(spark, tCow, cond)
        case 1 => // update of a random group
          val g = rnd.nextInt(7).toLong
          val cond = col("grp") === g && col("id") % 2 === 0
          val set = Map("rev" -> lit(step.toLong))
          TxLog.updateVectored(spark, t, cond, set)
          TxLog.update(spark, tCow, cond, set)
        case 2 => // ordered upsert of a random slice, mixed staleness
          val lo = rnd.nextInt(220).toLong
          val src = spark.range(lo, lo + 15)
            .select(col("id"), lit(-step.toLong).as("grp"),
              (col("id") % 3 * step).as("rev"))
          TxLog.upsertOrderedVectored(spark, t, src, Seq("id"), "rev")
          TxLog.upsertOrdered(spark, tCow, src, Seq("id"), "rev")
      }
      assert(canon(t).toSeq == canon(tCow).toSeq,
        s"diverged at step $step (seed fixed — deterministic repro)")
    }
    // and the DV table's masks all materialize away cleanly
    TxLog.compact(spark, t, targetFiles = 3)
    assert(TxLog.dvAt(t).isEmpty)
    assert(canon(t).toSeq == canon(tCow).toSeq)
  }

  test("compactRange: scoped OPTIMIZE touches only the selected range") {
    val t = tmp("dv_optrange")
    seed(t) // 4 range-clustered files over 0..99
    TxLog.deleteVectored(spark, t, col("id") === 10L) // mask in-range
    TxLog.deleteVectored(spark, t, col("id") === 90L) // mask out-of-range
    val before = ids(TxLog.snapshot(spark, t))
    val filesBefore = TxLog.liveFiles(t)
    val outOfScope = filesBefore.filterNot(f =>
      TxLog.fileStats(t).get(f).flatMap(_.get("id"))
        .exists(cs => cs.min.toLong <= 49L))
    val v = TxLog.compactRange(spark, t, "id", Some(0L), Some(49L))
    assert(TxLog.commits(t).find(_.version == v).exists(_.mode == "rewrite"))
    // out-of-scope files survive BY NAME; in-scope ones collapsed to 1
    val filesAfter = TxLog.liveFiles(t)
    assert(outOfScope.forall(filesAfter.contains))
    assert(filesAfter.size == outOfScope.size + 1)
    // content-neutral; the in-range mask materialized away, the
    // out-of-range mask is kept
    assert(ids(TxLog.snapshot(spark, t)) == before)
    val dvm = TxLog.dvAt(t)
    assert(dvm.keySet.subsetOf(outOfScope.toSet) && dvm.nonEmpty,
      "only the untouched file's mask remains")
    // nothing qualifies → no commit
    val latest = TxLog.latestVersion(t).get
    assert(TxLog.compactRange(spark, t, "id", Some(5000L), None) == latest)
  }

  test("auto-compaction bounds live files over a 100-batch stream") {
    val base = tmp("txlog_ac")
    val in = s"$base/in"; val t = s"$base/table"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(in))
    (0 until 100).foreach(i => Files.write(
      Paths.get(in, f"f$i%03d.json"), s"""{"id":$i}""".getBytes("UTF-8")))
    def drain(): Unit = TxLog.streamSink(
      spark.readStream.schema("id LONG")
        .option("maxFilesPerTrigger", "1").json(in),
      t, ckpt, autoCheckpointEvery = 16, autoCompactFiles = 8)
      .awaitTermination()
    drain()
    // one file per micro-batch would be ~100 live files; the threshold
    // bounds it (a batch may push the count to threshold+1 before the
    // compaction lands)
    assert(TxLog.liveFiles(t).size <= 9,
      s"live files must stay bounded, got ${TxLog.liveFiles(t).size}")
    assert(ids(TxLog.snapshot(spark, t)) == (0L to 99L),
      "compaction is content-neutral and exactly-once holds across it")
    // restart with new data: the batch ledger survives the interleaved
    // overwrite commits — no duplicates, bound still holds
    (100 until 110).foreach(i => Files.write(
      Paths.get(in, f"f$i%03d.json"), s"""{"id":$i}""".getBytes("UTF-8")))
    drain()
    assert(ids(TxLog.snapshot(spark, t)) == (0L to 109L))
    assert(TxLog.liveFiles(t).size <= 9)
    // a PUBLISHED (stream-source) table is never auto-compacted — the
    // append-only contract wins (design decision pinned)
    val t2 = s"$base/published"
    (0L to 11L).foreach(i =>
      TxLog.write(Seq(i).toDF("id"), t2, "append"))
    TxLog.streamSource(spark, t2) // publish: append-only from here on
    val filesBefore = TxLog.liveFiles(t2)
    TxLog.maybeCompact(spark, t2, maxFiles = 4)
    assert(TxLog.liveFiles(t2) == filesBefore,
      "published tables are exempt from auto-compaction")
  }

  test("exactly-once: a replayed dv batch id commits nothing") {
    val t = tmp("dv_once")
    seed(t)
    assert(TxLog.deleteVectored(spark, t, col("id") === 1L, batchId = 5L) == 1L)
    assert(TxLog.deleteVectored(spark, t, col("id") === 2L, batchId = 5L) == -1L)
    assert(ids(TxLog.snapshot(spark, t)) == (0L to 99L).filterNot(_ == 1L))
  }
}
