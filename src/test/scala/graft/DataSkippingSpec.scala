package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** Automatic planning-time data skipping on catalog SQL reads (round
  * 17): pushed filters translate to the engine's stats/bloom predicate
  * vocabulary and narrow the snapshot's FILE LIST before any scan is
  * built — Delta's data skipping, previously reachable only through
  * the explicit `TxLog.snapshotWhere` Scala surface. Pruning must be
  * invisible in results (it drops only files that provably hold no
  * admitted row) and visible in the plan (fewer files scanned). */
class DataSkippingSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Files actually scanned by the query's (single) batch scan. */
  private def scannedFiles(df: DataFrame): Int = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScanExec in plan")
    scans.map(_.scan.toBatch.planInputPartitions().map {
      case fp: FilePartition => fp.files.map(_.filePath.toString).distinct.length
      case _ => 1 // owned scan: one file per partition
    }.sum).sum
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def seedClustered(t: String): Unit = {
    // range-clustered on id: 8 files with tight, disjoint id ranges —
    // the layout stats pruning pays off on
    TxLog.write(
      spark.range(800).select(col("id"), (col("id") % 10).as("grp"),
        concat(lit("s"), (col("id") % 7).cast("string")).as("tag"))
        .repartitionByRange(8, col("id")),
      t, "overwrite")
    ()
  }

  test("point and range predicates prune files; results are exact") {
    val t = tmp("skip_base")
    seedClustered(t)
    val total = TxLog.liveFiles(t).size
    assert(total == 8)
    val point = spark.sql(s"SELECT id, grp FROM graft.`$t` WHERE id = 205")
    assert(ids(point) == Seq(205L))
    assert(scannedFiles(point) == 1,
      s"a point lookup on a range-clustered table must scan 1 file")
    val range = spark.sql(
      s"SELECT id FROM graft.`$t` WHERE id BETWEEN 150 AND 349")
    assert(ids(range) == (150L to 349L))
    assert(scannedFiles(range) <= 4, // ~2 covering files + boundaries
      s"got ${scannedFiles(range)} of $total")
    // strict bounds use their inclusive hull — still exact
    val strict = spark.sql(s"SELECT id FROM graft.`$t` WHERE id > 747")
    assert(ids(strict) == (748L to 799L))
    assert(scannedFiles(strict) <= 2)
    // an untranslatable disjunction prunes nothing and stays exact
    val or = spark.sql(
      s"SELECT id FROM graft.`$t` WHERE id = 5 OR id = 795")
    assert(ids(or) == Seq(5L, 795L))
    assert(scannedFiles(or) == total)
    // IN translates (overlap with ANY value keeps the file)
    val in = spark.sql(
      s"SELECT id FROM graft.`$t` WHERE id IN (5, 795)")
    assert(ids(in) == Seq(5L, 795L))
    assert(scannedFiles(in) == 2)
  }

  test("aggregate pushdown is never served from a pruned twin") {
    val t = tmp("skip_agg")
    seedClustered(t)
    // no filter: COUNT(*) may push to footers — full snapshot
    val c = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$t`")
    assert(c.collect()(0).getLong(0) == 800L)
    // with a filter: pruning applies, the count is exact
    val cf = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$t` WHERE id BETWEEN 0 AND 99")
    assert(cf.collect()(0).getLong(0) == 100L)
  }

  test("bloom tier prunes point lookups the min/max stats cannot") {
    val t = tmp("skip_bloom")
    // NON-clustered high-cardinality column: every file's tag range
    // spans the space, so stats keep everything — the bloom sidecar
    // is the only tier that can drop files
    TxLog.write(
      spark.range(800).select(col("id"), (col("id") % 8).as("grp"),
        concat(lit("u"), col("id").cast("string")).as("tag"))
        .repartition(8, col("grp")),
      t, "overwrite")
    TxLog.addBloomIndex(spark, t, "tag")
    val q = spark.sql(s"SELECT id FROM graft.`$t` WHERE tag = 'u205'")
    assert(ids(q) == Seq(205L))
    assert(scannedFiles(q) <= 2, // the holding file (+ ≤1 false positive)
      s"bloom must prune to ~the holding file; got ${scannedFiles(q)}")
  }

  test("pruning composes with dv masks, column mapping and time travel") {
    val t = tmp("skip_mor")
    seedClustered(t)
    TxLog.setTableProperty(t, TxLog.DmlModeProp, TxLog.DmlModeMor)
    spark.sql(s"DELETE FROM graft.`$t` WHERE id = 205") // dv mask
    TxLog.renameColumn(t, "grp", "bucket") // column mapping
    val q = spark.sql(
      s"SELECT id, bucket FROM graft.`$t` WHERE id BETWEEN 200 AND 299")
    assert(ids(q) == ((200L to 299L).filterNot(_ == 205L)),
      "mask and pruning must compose")
    assert(scannedFiles(q) <= 2, s"owned (masked+mapped) scan must still " +
      s"prune: ${scannedFiles(q)}")
    // time travel: stats tier prunes, bloom tier is skipped (sidecars
    // are present-day state) — result pinned to the old version
    val v0 = spark.sql(
      s"SELECT id FROM graft.`$t` VERSION AS OF 0 WHERE id BETWEEN 200 AND 299")
    assert(ids(v0) == (200L to 299L), "the pin predates the delete")
    assert(scannedFiles(v0) <= 2)
  }

  test("null-count stats prune IS NULL probes") {
    val t = tmp("skip_null")
    TxLog.write(
      spark.range(400).select(col("id"),
        when(col("id") < 50, lit(null).cast("long"))
          .otherwise(col("id")).as("v"))
        .repartitionByRange(4, col("id")),
      t, "overwrite")
    val q = spark.sql(s"SELECT id FROM graft.`$t` WHERE v IS NULL")
    assert(ids(q) == (0L until 50L))
    assert(scannedFiles(q) <= 2,
      s"only the null-bearing range recorded nulls: ${scannedFiles(q)}")
  }
}
