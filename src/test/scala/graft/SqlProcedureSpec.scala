package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** `CALL graft.system.<proc>(...)` — the DSv2 stored-procedure
  * maintenance surface: every TxLog maintenance op drivable from pure
  * SQL, each returning its summary row. */
class SqlProcedureSpec extends SparkSpec {
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

  test("CALL optimize compacts to the target and reports the new state") {
    val t = tmp("proc_opt")
    seed(t)
    assert(TxLog.liveFiles(t).size == 4)
    val row = spark.sql(s"CALL graft.system.optimize('$t', 2)").head()
    assert(row.getLong(1) <= 2, "files after optimize")
    assert(TxLog.liveFiles(t).size <= 2)
    assert(TxLog.snapshot(spark, t).count() == 100)
  }

  test("CALL zorder clusters on two dimensions") {
    val t = tmp("proc_z")
    seed(t)
    spark.sql(s"CALL graft.system.zorder('$t', 'id', 'v', 4)")
    assert(TxLog.commits(t).last.mode == "overwrite")
    assert(TxLog.snapshot(spark, t).count() == 100)
  }

  test("CALL checkpoint + restore + vacuum round trip") {
    val t = tmp("proc_cv")
    seed(t)                                       // v0
    TxLog.delete(spark, t, col("id") < 50L)       // v1
    val restored = spark.sql(
      s"CALL graft.system.restore('$t', 0)").head().getLong(0)
    assert(restored == 2L)
    assert(TxLog.snapshot(spark, t).count() == 100)
    val cp = spark.sql(s"CALL graft.system.checkpoint('$t')")
      .head().getLong(0)
    assert(cp == TxLog.latestVersion(t).get)
    val reclaimed = spark.sql(
      s"CALL graft.system.vacuum('$t', 0)").head().getLong(0)
    assert(reclaimed >= 0L)
    assert(TxLog.snapshot(spark, t).count() == 100)
  }

  test("CALL clone_table + rename_column + drop_column, read back via SQL") {
    val s = tmp("proc_clone_src"); val d = freshDir("proc_clone_dst")
    seed(s)
    val files = spark.sql(
      s"CALL graft.system.clone_table('$s', '$d')").head().getLong(1)
    assert(files == 4L)
    spark.sql(s"CALL graft.system.rename_column('$d', 'v', 'val')")
    spark.sql(s"CALL graft.system.drop_column('$d', 'grp')")
    assert(spark.sql(s"SELECT sum(val) FROM graft.`$d`")
      .head().getLong(0) == (0L to 99L).map(_ * 10).sum)
    assert(spark.sql(s"SELECT * FROM graft.`$d`").columns.toSeq ==
      Seq("id", "val"))
    // the source never noticed
    assert(TxLog.snapshot(spark, s).columns.toSeq == Seq("id", "grp", "v"))
  }

  test("CALL history and describe_detail return real row sets") {
    val t = tmp("proc_hist")
    seed(t)
    TxLog.delete(spark, t, col("id") < 10L)
    val hist = spark.sql(s"CALL graft.system.history('$t')").collect()
    assert(hist.length == 2)
    val modes = hist.map(_.getAs[String]("mode")).toSet
    assert(modes == Set("overwrite", "rewrite"))
    val detail = spark.sql(s"CALL graft.system.describe_detail('$t')")
    assert(detail.count() == 1)
    assert(detail.columns.contains("n_live_files"))
  }

  test("CALL add_constraint gates writes until dropped") {
    val t = tmp("proc_cons")
    seed(t)
    spark.sql(s"CALL graft.system.add_constraint('$t', 'v_pos', 'v >= 0')")
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$t` VALUES (1, 1, -5)")
    }
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`")
      .head().getLong(0) == 100)
    val left = spark.sql(
      s"CALL graft.system.drop_constraint('$t', 'v_pos')")
      .head().getLong(0)
    assert(left == 0L)
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1, 1, -5)")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`")
      .head().getLong(0) == 101)
  }

  test("CALL changes_view serves the CDF through SQL without collecting") {
    val t = tmp("proc_cdf")
    seed(t)                                   // v0
    TxLog.delete(spark, t, col("id") === 7L)  // v1 rewrite
    val n = spark.sql(
      s"CALL graft.system.changes_view('$t', 'proc_cdf_v', 0)")
      .head().getLong(0)
    assert(n > 0)
    val deleted = spark.sql(
      "SELECT id FROM proc_cdf_v WHERE _change_type = 'delete'")
      .collect().map(_.getLong(0)).toSet
    val inserted = spark.sql(
      "SELECT id FROM proc_cdf_v WHERE _change_type = 'insert'")
      .collect().map(_.getLong(0)).toSet
    assert(deleted.diff(inserted) == Set(7L),
      "net effect of the COW delete must be exactly id=7 leaving")
  }

  test("CALL vacuum_dry_run lists without deleting") {
    val t = tmp("proc_dry")
    seed(t)
    TxLog.write(Seq((1L, 1L, 1L)).toDF("id", "grp", "v"), t, "overwrite")
    TxLog.checkpointLog(t)
    val listed = spark.sql(
      s"CALL graft.system.vacuum_dry_run('$t')").count()
    assert(listed >= 4, "the replaced seed files must be listed")
    assert(TxLog.snapshot(spark, t, Some(0L)).count() == 100,
      "dry run must delete nothing — v0 still serves")
  }

  test("unknown procedures fail loudly with the available list") {
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.explode_table('/tmp/x')").collect()
    }
    // Spark wraps the catalog error (FAILED_TO_LOAD_ROUTINE); the
    // available-list message rides the cause
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("explode_table") &&
      msgs.contains("no such procedure") && msgs.contains("optimize"))
  }

  test("SHOW PROCEDURES lists the maintenance surface") {
    val names = spark.sql("SHOW PROCEDURES IN graft.system").collect()
      .map(_.toString).mkString(",")
    assert(names.contains("optimize") && names.contains("vacuum") &&
      names.contains("rename_column"))
  }

  test("set/unset_table_property manage the property sidecar via SQL") {
    val t = tmp("proc_props")
    seed(t)
    assert(spark.sql(s"""CALL graft.system.set_table_property(
      '$t', 'write.dml.mode', 'merge-on-read')""").head().getLong(0) == 1L)
    assert(TxLog.isMorDml(t))
    // DESCRIBE DETAIL surfaces the mode and the property map
    val d = TxLog.detail(spark, t).head()
    assert(d.getAs[String]("dml_mode") == "merge-on-read")
    assert(d.getSeq[String](d.fieldIndex("properties")).toSeq ==
      Seq("write.dml.mode=merge-on-read"))
    // SHOW TBLPROPERTIES serves the sidecar through the table
    val shown = spark.sql(s"SHOW TBLPROPERTIES graft.`$t`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("write.dml.mode").contains("merge-on-read"))
    assert(spark.sql(s"""CALL graft.system.unset_table_property(
      '$t', 'write.dml.mode')""").head().getLong(0) == 0L)
    assert(!TxLog.isMorDml(t))
    assert(TxLog.detail(spark, t).head()
      .getAs[String]("dml_mode") == "copy-on-write")
  }
}
