package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** Generated columns (GENERATED ALWAYS AS): computed when a write
  * omits them, validated (null-safe equality at the constraint choke
  * point) when supplied — so skipping on the generated column never
  * lies. */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private def freshDir(p: String) = {
    val d = Files.createTempDirectory(p); Files.delete(d); d.toString
  }

  private def seed(t: String): Unit = {
    TxLog.write(
      spark.range(100).select(col("id"), (col("id") * 10).as("v"))
        .withColumn("v_h", expr("v div 100"))
        .repartitionByRange(4, col("v_h")),
      t, "overwrite")
    ()
  }

  test("an omitted generated column is computed; reads serve it") {
    val t = tmp("gen_fill")
    seed(t)
    TxLog.addGeneratedColumn(spark, t, "v_h", "v div 100")
    TxLog.write(Seq((1000L, 5550L)).toDF("id", "v"), t, "append")
    val got = TxLog.snapshot(spark, t).where(col("id") === 1000L).head()
    assert(got.getLong(2) == 55L, "v_h must be computed as v div 100")
    assert(TxLog.snapshot(spark, t).count() == 101)
  }

  test("a supplied value disagreeing with the generation aborts the commit") {
    val t = tmp("gen_check")
    seed(t)
    TxLog.addGeneratedColumn(spark, t, "v_h", "v div 100")
    val e = intercept[IllegalArgumentException] {
      TxLog.write(Seq((1L, 5550L, 99L)).toDF("id", "v", "v_h"), t, "append")
    }
    assert(e.getMessage.contains("generated:v_h"))
    assert(TxLog.snapshot(spark, t).count() == 100, "table unchanged")
    // agreeing values land fine
    TxLog.write(Seq((2000L, 5550L, 55L)).toDF("id", "v", "v_h"), t, "append")
    assert(TxLog.snapshot(spark, t).count() == 101)
  }

  test("registration demands schema presence and existing-row agreement") {
    val t = tmp("gen_reg")
    seed(t)
    intercept[IllegalArgumentException] {
      TxLog.addGeneratedColumn(spark, t, "nope", "v div 100")
    }
    intercept[IllegalArgumentException] {
      TxLog.addGeneratedColumn(spark, t, "v_h", "v div 7")
    }
  }

  test("rename/drop of a generated or referenced column is refused") {
    val t = tmp("gen_map")
    seed(t)
    TxLog.addGeneratedColumn(spark, t, "v_h", "v div 100")
    intercept[IllegalArgumentException] { TxLog.dropColumn(t, "v_h") }
    intercept[IllegalArgumentException] { TxLog.renameColumn(t, "v", "w") }
    TxLog.dropGeneratedColumn(t, "v_h")
    TxLog.renameColumn(t, "v", "w") // fine once unregistered
    assert(TxLog.snapshot(spark, t).columns.toSeq == Seq("id", "w", "v_h"))
  }

  test("skipping prunes on the generated column after computed appends") {
    val t = tmp("gen_prune")
    seed(t) // 4 files range-clustered on v_h (0..9 each ~250-wide)
    TxLog.addGeneratedColumn(spark, t, "v_h", "v div 100")
    val (kept, total) = TxLog.pruneFiles(t, "v_h", Some(0L), Some(1L))
    assert(total == 4 && kept.size < total,
      s"clustered generated column must prune: $kept of $total")
    assert(TxLog.snapshotRange(spark, t, "v_h", Some(0L), Some(1L))
      .count() == 20)
  }

  test("the generation registration travels with a clone; SQL procedures manage it") {
    val s = tmp("gen_clone"); val d = freshDir("gen_clone_dst")
    seed(s)
    spark.sql(
      s"CALL graft.system.add_generated_column('$s', 'v_h', 'v div 100')")
    TxLog.cloneTable(spark, s, d)
    intercept[IllegalArgumentException] {
      TxLog.write(Seq((1L, 100L, 42L)).toDF("id", "v", "v_h"), d, "append")
    }
    val left = spark.sql(
      s"CALL graft.system.drop_generated_column('$d', 'v_h')")
      .head().getLong(0)
    assert(left == 0L)
    TxLog.write(Seq((1L, 100L, 42L)).toDF("id", "v", "v_h"), d, "append")
    assert(TxLog.snapshot(spark, d).count() == 101)
    // the source keeps enforcing
    intercept[IllegalArgumentException] {
      TxLog.write(Seq((1L, 100L, 42L)).toDF("id", "v", "v_h"), s, "append")
    }
  }
}
