package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** SQL row-level DML over TxLog through the DSv2 row-level-operation
  * path: UPDATE and MERGE INTO as group-based copy-on-write rewrites,
  * runtime group filtering bounding the rewrite to matched files,
  * subquery DELETE falling back from the metadata path, `_file`
  * provenance reads, and the immutability refusals. */
class RowLevelSqlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def seed(t: String): Unit = {
    // 4 range-clustered files over id, so a selective statement has
    // non-matching files that MUST survive untouched
    TxLog.write(
      spark.range(100).select(col("id"), (col("id") % 10).as("grp"),
        (col("id") * 10).as("v")).repartitionByRange(4, col("id")),
      t, "overwrite")
    ()
  }

  private def rows(t: String): Map[Long, (Long, Long)] =
    spark.sql(s"SELECT id, grp, v FROM graft.`$t`").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("SQL UPDATE rewrites only the files holding matches") {
    val t = tmp("rl_upd")
    seed(t)
    val live0 = TxLog.liveFiles(t).toSet
    assert(live0.size == 4)
    spark.sql(s"UPDATE graft.`$t` SET v = v + 1000000 WHERE id >= 90")
    val got = rows(t)
    assert(got.size == 100)
    (0L to 99L).foreach { i =>
      assert(got(i) == ((i % 10, if (i >= 90) i * 10 + 1000000 else i * 10)),
        s"row $i")
    }
    // COW bounded by the runtime group filter: the three files with no
    // id >= 90 pass through untouched
    val live1 = TxLog.liveFiles(t).toSet
    assert(live1.intersect(live0).size == 3,
      s"expected 3 untouched files, was ${live1.intersect(live0).size}")
    val c = TxLog.commits(t).last
    assert(c.mode == "rewrite" && c.removes.size == 1,
      s"expected a 1-file rewrite commit, was ${c.mode}/${c.removes.size}")
    // history is intact
    assert(spark.sql(s"SELECT sum(v) FROM graft.`$t` VERSION AS OF 0")
      .head().getLong(0) == (0L to 99L).map(_ * 10).sum)
  }

  test("SQL UPDATE with no matches leaves the table version unchanged") {
    val t = tmp("rl_upd_none")
    seed(t)
    val v0 = TxLog.latestVersion(t)
    spark.sql(s"UPDATE graft.`$t` SET v = 0 WHERE id > 100000")
    assert(TxLog.latestVersion(t) == v0, "no-match UPDATE must not commit")
    assert(rows(t).size == 100)
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    val t = tmp("rl_merge")
    seed(t)
    Seq((5L, 1L, 555L), (17L, 2L, 777L), (200L, 3L, 2000L))
      .toDF("id", "grp", "v").createOrReplaceTempView("rl_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING rl_src src ON tgt.id = src.id
         |WHEN MATCHED AND src.v = 777 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = src.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = rows(t)
    assert(got.size == 100, s"100 - 1 delete + 1 insert, was ${got.size}")
    assert(got(5L) == ((5L, 555L)), "matched update (grp untouched)")
    assert(!got.contains(17L), "matched delete")
    assert(got(200L) == ((3L, 2000L)), "not-matched insert")
    assert(got(3L) == ((3L, 30L)), "unmatched rows pass through")
    assert(TxLog.commits(t).last.mode == "rewrite")
  }

  test("MERGE rewrite is bounded to matched files") {
    val t = tmp("rl_merge_bound")
    seed(t)
    val live0 = TxLog.liveFiles(t).toSet
    Seq((99L, 0L, 1L)).toDF("id", "grp", "v")
      .createOrReplaceTempView("rl_src_one")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING rl_src_one src ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET v = src.v""".stripMargin)
    assert(rows(t)(99L) == ((9L, 1L)))
    assert(TxLog.liveFiles(t).toSet.intersect(live0).size == 3,
      "only the one matched file may rewrite")
  }

  test("DELETE with a subquery predicate takes the row-level COW path") {
    val t = tmp("rl_del_sub")
    seed(t)
    spark.range(95, 120).toDF("id").createOrReplaceTempView("rl_del_ids")
    spark.sql(
      s"DELETE FROM graft.`$t` WHERE id IN (SELECT id FROM rl_del_ids)")
    assert(rows(t).keySet == (0L to 94L).toSet)
    assert(TxLog.commits(t).last.mode == "rewrite")
  }

  test("_file provenance reads: rows group by their table file") {
    val t = tmp("rl_file")
    seed(t)
    val perFile = spark.sql(
      s"SELECT _file, count(*) AS n FROM graft.`$t` GROUP BY _file")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perFile.keySet == TxLog.liveFiles(t).toSet)
    assert(perFile.values.sum == 100L)
    // provenance agrees with the row-level path: updating one id
    // rewrites exactly the file provenance named for it
    val target = spark.sql(
      s"SELECT _file FROM graft.`$t` WHERE id = 0").head().getString(0)
    spark.sql(s"UPDATE graft.`$t` SET v = 1 WHERE id = 0")
    assert(TxLog.commits(t).last.removes == Seq(target))
  }

  test("row-level operations against a time-travel pin are refused") {
    // SQL cannot even express `UPDATE ... VERSION AS OF` (parse
    // error), so the guard is pinned at the catalog API level
    val t = tmp("rl_pin")
    seed(t)
    val cat = new org.apache.spark.sql.graftx.GraftCatalog()
    val tbl = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], t), "0")
      .asInstanceOf[
        org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations]
    val info = new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
      override def options() =
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      override def command() =
        org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE
    }
    val e = intercept[IllegalArgumentException] {
      tbl.newRowLevelOperationBuilder(info)
    }
    assert(e.getMessage.contains("immutable"))
  }

  test("a conflicting rewrite fails the replace commit loudly") {
    // the SQL statement pins its snapshot at loadTable; if a
    // concurrent writer rewrites a pinned file before the statement's
    // commit, the rewrite conflict check must refuse — exercised at
    // the commit entry the SQL path uses
    val t = tmp("rl_conflict")
    seed(t)
    val victim = TxLog.liveFiles(t).head
    TxLog.compact(spark, t, targetFiles = 1) // files no longer live
    val staged = java.nio.file.Paths.get(t, "_staging", "x.parquet")
    java.nio.file.Files.createDirectories(staged.getParent)
    spark.range(1).select(col("id"), col("id").as("grp"),
      col("id").as("v")).coalesce(1).write.mode("overwrite")
      .parquet(staged.getParent.resolve("stage_df").toString)
    val part = java.nio.file.Files.list(staged.getParent.resolve("stage_df"))
      .iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq.head
    val e = intercept[IllegalArgumentException] {
      TxLog.replaceFiles(spark, t, Seq(victim), Seq(part),
        "id BIGINT, grp BIGINT, v BIGINT")
    }
    assert(e.getMessage.contains("concurrent modification"))
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`").head().getLong(0)
      == 100, "the conflicting replace must not land")
  }

  test("concurrent SQL UPDATEs: disjoint both land; overlapping loses loudly, never silently") {
    val t = tmp("rl_race")
    seed(t) // 4 range-clustered files on id
    // DISJOINT arm: two threads update ranges living in different
    // files, barrier-released — the rewrite commits touch disjoint
    // remove sets, so BOTH must land (no false conflicts)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def upd(lo: Int, hi: Int): () => Unit = () => {
      barrier.await()
      spark.sql(
        s"UPDATE graft.`$t` SET v = v + 1000000 WHERE id BETWEEN $lo AND $hi")
      ()
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val a = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = upd(0, 5)()
      })
      val b = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = upd(90, 95)()
      })
      a.get(); b.get()
      val got = rows(t)
      (0 to 5) ++ (90 to 95) foreach { i =>
        assert(got(i.toLong)._2 == i * 10 + 1000000, s"row $i must update")
      }
      assert(got(50L)._2 == 500L)
    } finally pool.shutdown()
    // OVERLAPPING arm: both threads hit the SAME file; whoever
    // commits second must fail the rewrite conflict check LOUDLY (the
    // winner's update survives; nothing is silently lost)
    val barrier2 = new java.util.concurrent.CyclicBarrier(2)
    val pool2 = java.util.concurrent.Executors.newFixedThreadPool(2)
    val outcomes = try {
      val fs = Seq(7, 8).map { i =>
        pool2.submit(new java.util.concurrent.Callable[Either[Throwable, Unit]] {
          def call(): Either[Throwable, Unit] = {
            barrier2.await()
            try Right {
              spark.sql(
                s"UPDATE graft.`$t` SET v = ${i * 111} WHERE id = $i")
              ()
            } catch { case e: Throwable => Left(e) }
          }
        })
      }
      fs.map(_.get())
    } finally pool2.shutdown()
    val wins = outcomes.count(_.isRight)
    assert(wins >= 1, "at least one overlapping UPDATE must land")
    val got2 = rows(t)
    // every SUCCESSFUL statement's effect is present — a reported
    // success whose write vanished would be the lost update
    outcomes.zip(Seq(7L, 8L)).foreach {
      case (Right(_), id) => assert(got2(id)._2 == id * 111,
        s"UPDATE of id=$id reported success; its write must be visible")
      case (Left(e), _) =>
        assert(e.getMessage != null, "loser must fail loudly")
    }
  }

  test("CHECK constraints gate the SQL UPDATE commit") {
    val t = tmp("rl_check")
    seed(t)
    TxLog.addConstraint(spark, t, "v_nonneg", "v >= 0")
    intercept[Exception] {
      spark.sql(s"UPDATE graft.`$t` SET v = -1 WHERE id = 3")
    }
    assert(rows(t)(3L) == ((3L, 30L)), "violating UPDATE must not land")
    spark.sql(s"UPDATE graft.`$t` SET v = 7 WHERE id = 3")
    assert(rows(t)(3L) == ((3L, 7L)))
  }

  test("merge-on-read mode: SQL DML lands dv commits, zero files rewritten") {
    val t = tmp("rl_mor")
    seed(t)
    TxLog.setTableProperty(t, TxLog.DmlModeProp, TxLog.DmlModeMor)
    val files0 = TxLog.liveFiles(t)
    val mtimes0 = files0.map(f =>
      Files.getLastModifiedTime(java.nio.file.Paths.get(t, f)).toMillis)
    // the full statement family: UPDATE, translatable DELETE,
    // subquery DELETE, MERGE with all three arms
    spark.sql(s"UPDATE graft.`$t` SET v = v + 1000 WHERE id BETWEEN 10 AND 19")
    spark.sql(s"DELETE FROM graft.`$t` WHERE id = 7")
    spark.sql(
      s"DELETE FROM graft.`$t` WHERE id IN (SELECT id FROM graft.`$t` WHERE id = 98)")
    spark.sql(s"""MERGE INTO graft.`$t` tgt
      USING (SELECT 3 AS id, 0 AS grp, 1L AS v
             UNION ALL SELECT 4, 0, 2L
             UNION ALL SELECT 2000, 0, 3L) src
      ON tgt.id = src.id
      WHEN MATCHED AND src.id = 3 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = src.v
      WHEN NOT MATCHED THEN INSERT *""")
    // no original file rewritten or removed — masks + new files only
    assert(TxLog.liveFiles(t).toSet.intersect(files0.toSet) == files0.toSet,
      "merge-on-read DML must never remove the original files")
    assert(files0.map(f => Files.getLastModifiedTime(
      java.nio.file.Paths.get(t, f)).toMillis) == mtimes0,
      "merge-on-read DML must never rewrite original file bytes")
    assert(TxLog.commits(t).count(_.mode == "dv") == 4,
      s"every statement lands one dv commit: " +
        s"${TxLog.commits(t).map(c => c.version -> c.mode)}")
    // semantics identical to the COW path on a twin table
    val c = tmp("rl_mor_twin")
    seed(c)
    spark.sql(s"UPDATE graft.`$c` SET v = v + 1000 WHERE id BETWEEN 10 AND 19")
    spark.sql(s"DELETE FROM graft.`$c` WHERE id = 7")
    spark.sql(
      s"DELETE FROM graft.`$c` WHERE id IN (SELECT id FROM graft.`$c` WHERE id = 98)")
    spark.sql(s"""MERGE INTO graft.`$c` tgt
      USING (SELECT 3 AS id, 0 AS grp, 1L AS v
             UNION ALL SELECT 4, 0, 2L
             UNION ALL SELECT 2000, 0, 3L) src
      ON tgt.id = src.id
      WHEN MATCHED AND src.id = 3 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = src.v
      WHEN NOT MATCHED THEN INSERT *""")
    assert(rows(t) == rows(c),
      "merge-on-read and copy-on-write must converge to the same table")
    assert(TxLog.commits(c).exists(_.mode == "rewrite") &&
      !TxLog.commits(t).exists(_.mode == "rewrite"))
    // masks accumulate until OPTIMIZE materializes them away
    assert(TxLog.dvAt(t).nonEmpty)
    TxLog.compact(spark, t, targetFiles = 2)
    assert(TxLog.dvAt(t).isEmpty && rows(t) == rows(c))
  }

  test("merge-on-read update stacks on an existing mask; CDF sees the delta") {
    val t = tmp("rl_mor_stack")
    seed(t)
    TxLog.setTableProperty(t, TxLog.DmlModeProp, TxLog.DmlModeMor)
    TxLog.deleteVectored(spark, t, col("id") === 12L) // pre-existing mask
    val v = spark.sql(
      s"UPDATE graft.`$t` SET v = 0 WHERE id BETWEEN 10 AND 14")
    val got = rows(t)
    assert(!got.contains(12L), "the old mask must survive the update")
    assert(Seq(10L, 11L, 13L, 14L).forall(got(_)._2 == 0L))
    assert(got.size == 99)
    // the change feed shows exactly the updated rows as delete+insert
    val latest = TxLog.latestVersion(t).get
    val ch = TxLog.changes(spark, t, latest - 1, Some(latest))
    val dels = ch.where(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ins = ch.where(col("_change_type") === "insert")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(dels == Seq(10L, 11L, 13L, 14L), s"got deletes $dels")
    assert(ins == Seq(10L, 11L, 13L, 14L), s"got inserts $ins")
  }


  test("merge-on-read SQL DML composes with column mapping") {
    val t = tmp("rl_mor_cm")
    seed(t)
    TxLog.renameColumn(t, "v", "val") // physical stays 'v'
    TxLog.setTableProperty(t, TxLog.DmlModeProp, TxLog.DmlModeMor)
    val files0 = TxLog.liveFiles(t)
    spark.sql(s"UPDATE graft.`$t` SET val = 0 WHERE id BETWEEN 10 AND 14")
    spark.sql(s"""MERGE INTO graft.`$t` tgt
      USING (SELECT 3L AS id, 0L AS grp, 333L AS val
             UNION ALL SELECT 3000L, 0L, 444L) src
      ON tgt.id = src.id
      WHEN MATCHED THEN UPDATE SET val = src.val
      WHEN NOT MATCHED THEN INSERT *""")
    assert(TxLog.liveFiles(t).toSet.intersect(files0.toSet) == files0.toSet,
      "MoR on a mapped table must not rewrite files")
    assert(TxLog.commits(t).count(_.mode == "dv") == 2)
    // the update's re-landed rows staged under the PHYSICAL name
    val newest = TxLog.commits(t).last.adds.head
    assert(spark.read.parquet(s"$t/$newest").columns.toSeq ==
      Seq("id", "grp", "v"),
      "MoR staged data must carry physical footer names")
    val got = spark.sql(s"SELECT id, val FROM graft.`$t`").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 14L).forall(got(_) == 0L))
    assert(got(3L) == 333L && got(3000L) == 444L && got(20L) == 200L)
    assert(got.size == 101)
  }

  test("merge-on-read DML conflicts loudly with a racing mask") {
    val t = tmp("rl_mor_race")
    seed(t)
    TxLog.setTableProperty(t, TxLog.DmlModeProp, TxLog.DmlModeMor)
    // plan a statement against the unmasked state, then let a dv land
    // first: commitDeltaDml must refuse the stale-planned commit
    val e = intercept[IllegalArgumentException] {
      TxLog.commitDeltaDml(spark, t,
        stagedDv = { // a fake staged dv addressing file 0 row 0
          val f = TxLog.liveFiles(t).head
          val p = java.nio.file.Files.createTempDirectory("mor_dv")
          Seq((f, 0L)).toDF("file", "row_index")
            .coalesce(1).write.mode("overwrite").parquet(p.toString)
          java.nio.file.Files.list(p).iterator().asScala
            .filter(_.toString.endsWith(".parquet")).toSeq
        },
        stagedData = Nil, ddl = "",
        plannedDv = { // the mapping we planned against...
          val planned = TxLog.dvAt(t)
          // ...before this commit landed:
          TxLog.deleteVectored(spark, t, col("id") === 1L)
          planned
        })
    }
    assert(e.getMessage.contains("concurrent modification") ||
      e.getMessage.contains("no longer live"), e.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION auto-adds source columns, both modes") {
    for (mor <- Seq(false, true)) {
      val t = tmp(s"rl_evo_$mor")
      seed(t)
      if (mor) TxLog.setTableProperty(t, TxLog.DmlModeProp, TxLog.DmlModeMor)
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$t` tgt
        USING (SELECT 5L AS id, 0L AS grp, 1L AS v, 'new' AS tag
               UNION ALL SELECT 2000L, 0L, 2L, 'ins') src
        ON tgt.id = src.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      // the widened schema landed as a metadata-only evolve: old rows
      // NULL, matched row updated with the new column, insert typed
      val got = spark.sql(s"SELECT id, tag FROM graft.`$t`").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got.size == 101)
      assert(got(5L).contains("new") && got(2000L).contains("ins"))
      assert(got(6L).isEmpty, "pre-evolution rows must read NULL")
      assert(TxLog.schemaAt(t).contains("tag"),
        "the widened DDL must be the table schema")
      if (mor)
        assert(!TxLog.commits(t).exists(_.mode == "rewrite"),
          "MoR evolution merge must not rewrite files")
    }
  }
}
