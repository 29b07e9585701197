package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** Atomic CTAS / RTAS / [CREATE OR] REPLACE TABLE through the staging
  * catalog (round 17): one overwrite commit carries schema + data, a
  * REPLACE preserves history (Spark's non-atomic fallback drops the
  * table and nukes its log), and REPLACE resets the unversioned
  * metadata sidecars the way Delta's REPLACE does. */
class ReplaceTableSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def seed(t: String): Unit = {
    TxLog.write(
      spark.range(100).select(col("id"), (col("id") % 10).as("grp"))
        .repartitionByRange(4, col("id")),
      t, "overwrite")
    ()
  }

  test("CTAS is atomic: one overwrite commit, v0 IS the data") {
    val t = tmp("rt_ctas")
    spark.sql(s"CREATE TABLE graft.`$t` AS SELECT id, id * 2 AS v FROM range(10)")
    assert(TxLog.commits(t).map(_.mode) == Seq("overwrite"))
    assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 0").count() == 10)
    // CREATE AS on an existing table refuses
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$t` AS SELECT 1L AS x")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"))
  }

  test("RTAS replaces data AND schema in one commit, history intact") {
    val t = tmp("rt_rtas")
    seed(t) // v0: (id, grp), 100 rows
    spark.sql(s"REPLACE TABLE graft.`$t` AS " +
      s"SELECT CAST(id AS STRING) AS name, id * 1.5 AS score FROM range(5)")
    assert(spark.table(s"graft.`$t`").columns.toSeq == Seq("name", "score"))
    assert(spark.table(s"graft.`$t`").count() == 5)
    // ONE commit for the whole replace; history before it intact
    assert(TxLog.commits(t).map(_.mode) == Seq("overwrite", "overwrite"))
    val v0 = spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 0")
    assert(v0.columns.toSeq == Seq("id", "grp") && v0.count() == 100,
      "REPLACE must keep the pre-replace version time-travelable")
    // REPLACE on a missing table refuses; CREATE OR REPLACE creates
    val m = tmp("rt_missing") + "/nope"
    val e = intercept[Exception] {
      spark.sql(s"REPLACE TABLE graft.`$m` AS SELECT 1L AS x")
    }
    assert(e.getMessage.toLowerCase.contains("table or view not found") ||
      e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("cannot be replaced"))
    spark.sql(s"CREATE OR REPLACE TABLE graft.`$m` AS SELECT 1L AS x")
    assert(spark.table(s"graft.`$m`").count() == 1)
    spark.sql(s"CREATE OR REPLACE TABLE graft.`$m` AS SELECT 2L AS y, 3L AS z")
    assert(spark.table(s"graft.`$m`").columns.toSeq == Seq("y", "z"))
    assert(TxLog.commits(m).size == 2)
  }

  test("plain REPLACE TABLE (no AS) lands an empty schema-only overwrite") {
    val t = tmp("rt_plain")
    seed(t)
    spark.sql(s"REPLACE TABLE graft.`$t` (a BIGINT, b STRING)")
    assert(spark.table(s"graft.`$t`").columns.toSeq == Seq("a", "b"))
    assert(spark.table(s"graft.`$t`").count() == 0)
    assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 0").count() == 100)
    // the emptied table accepts inserts under the new shape
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1, 'x')")
    assert(spark.table(s"graft.`$t`").count() == 1)
  }

  test("REPLACE resets unversioned metadata; statement properties land") {
    val t = tmp("rt_meta")
    seed(t)
    TxLog.setTableProperty(t, "owner.team", "old")
    TxLog.addConstraint(spark, t, "pos", "id >= 0")
    TxLog.addBloomIndex(spark, t, "id")
    spark.sql(s"REPLACE TABLE graft.`$t` (id BIGINT) " +
      s"TBLPROPERTIES ('fresh'='yes')")
    assert(!TxLog.tableProps(t).contains("owner.team"),
      "old properties describe the replaced table")
    assert(TxLog.tableProps(t).get("fresh").contains("yes"))
    assert(TxLog.constraints(t).isEmpty, "old constraints must not gate")
    assert(TxLog.bloomCols(t).isEmpty, "old bloom registry is gone")
    // the old constraint must not refuse rows the NEW table allows
    spark.sql(s"INSERT INTO graft.`$t` VALUES (-5)")
    assert(spark.table(s"graft.`$t`").count() == 1)
  }

  test("RTAS with CLUSTER BY records the layout property") {
    val t = tmp("rt_cluster")
    seed(t)
    spark.sql(s"REPLACE TABLE graft.`$t` CLUSTER BY (id) AS " +
      s"SELECT id, id % 4 AS g FROM range(64)")
    assert(TxLog.tableProps(t).get(TxLog.LayoutClusterProp).contains("id"))
    assert(spark.table(s"graft.`$t`").count() == 64)
  }

  test("a failed RTAS leaves the old table fully intact") {
    val t = tmp("rt_fail")
    seed(t)
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE graft.`$t` AS " +
        s"SELECT raise_error('boom') AS x FROM range(1)")
    }
    // no commit landed: same data, same schema, full history
    assert(TxLog.commits(t).map(_.mode) == Seq("overwrite"))
    assert(spark.table(s"graft.`$t`").count() == 100)
    assert(spark.table(s"graft.`$t`").columns.toSeq == Seq("id", "grp"))
  }
}
