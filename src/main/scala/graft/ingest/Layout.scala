package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest layout operators — the storage half of the 100 TB design.
  *
  * - `writeDatePartitioned`: hive-style `event_date=.../` partitioning
  *   so time-ranged queries prune whole directories at planning time
  *   (`PartitionFilters` in the scan, no data read outside the range).
  * - `writeBucketed`: hash-bucketed, sorted-within-bucket table layout;
  *   two tables bucketed on the same key join with ZERO exchange — the
  *   shuffle happens once at write time and is amortized over every
  *   subsequent join. This is the co-located-join strategy for fact ⋈
  *   fact joins too big to broadcast (lineitem ⋈ orders at scale).
  *
  * Bucketing requires catalog tables (bucket metadata lives in the
  * metastore), hence `saveAsTable`; the session's default in-process
  * catalog + local warehouse dir suffice offline. LayoutSpec asserts
  * the planning effects (pruned partitions, exchange-free join), not
  * just the data round-trip. */
object Layout {

  /** Land events partitioned by event date (ts is timestamp-typed —
    * the fixture's TIMESTAMP_NTZ wall-clock date equals DuckDB's
    * strftime on the same parquet). */
  def writeDatePartitioned(events: DataFrame, outDir: String): Unit =
    events
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(outDir)

  /** IVF posting lists as a cell-partitioned parquet layout — the
    * serving-side persistence of the ANN index: each (vec_id, cell,
    * q, nq) row from `Similarity.ivfAssign` lands under cell=<id>/,
    * so a probe's broadcast join on `cell` reads ONLY its nprobe
    * cells' files through dynamic partition pruning (the declarative
    * analogue of FAISS's inverted lists; LayoutSpec pins the
    * dynamicpruning scan expression). Quantized columns are integer,
    * so the round-trip is bit-exact. */
  def writeIvfPostings(assigned: DataFrame, outDir: String): Unit =
    assigned.write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(outDir)

  /** Write a bucketed + sorted catalog table. Idempotent across JVMs:
    * the in-memory catalog forgets tables on restart but their
    * warehouse directories survive, so clear both first. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planner emits
    * a SortMergeJoin with no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Morton (Z-order) value of two non-negative integer dimensions:
    * bit-interleaved so rows close in BOTH dimensions get close
    * z-values. Pure bitwise built-ins — codegen'd, no UDF. `bits`
    * bounds each dimension at 2^bits. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 21): org.apache.spark.sql.Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    }

  /** Z-ordered write: normalize both dimensions to equal bit-width
    * buckets (what makes interleaving meaningful when raw ranges
    * differ by orders of magnitude — the same normalization Delta's
    * OPTIMIZE ZORDER applies), then range-partition + sort by the
    * interleaved z-value. Every output file covers a tight
    * hyper-rectangle of (dimA, dimB), so parquet min/max footer stats
    * let ANY reader skip files/row-groups for predicates on EITHER
    * dimension; single-column sorting only helps its own column. One
    * tiny min/max pre-pass; bucket math is exact integer division. The
    * z column is dropped before write — the clustering survives in the
    * file layout. */
  def writeZOrdered(df: DataFrame, outDir: String, dimA: String,
      dimB: String, files: Int = 8, bits: Int = 16): Unit =
    zOrdered(df, dimA, dimB, files, bits)
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  /** The clustering half of `writeZOrdered`, reusable by any sink
    * (TxLog's OPTIMIZE-ZORDER compaction routes the same plan through
    * its transactional staging): the input rows range-partitioned +
    * sorted by the normalized z-interleave, z column dropped. */
  def zOrdered(df: DataFrame, dimA: String, dimB: String,
      files: Int = 8, bits: Int = 16): DataFrame = {
    val r = df.agg(
      min(col(dimA).cast("long")), max(col(dimA).cast("long")),
      min(col(dimB).cast("long")), max(col(dimB).cast("long"))).head()
    if ((0 to 3).exists(r.isNullAt))
      // empty input or an all-null dimension: there is no range to
      // normalize — degrade to the plain (unclustered) plan instead
      // of NPE-ing on the null min/max
      return df
    def bucket(c: org.apache.spark.sql.Column, lo: Long, hi: Long) = {
      // Affine-map the dim's full range onto [0, 2^bits) — stretching
      // narrow dims up as well as scaling wide dims down, so both
      // contribute equally many effective bits to the interleave.
      val factor = ((1L << bits) - 1).toDouble / math.max(hi - lo, 1L).toDouble
      least(floor((c.cast("long") - lit(lo)) * lit(factor)).cast("long"),
        lit((1L << bits) - 1))
    }
    val z = zValue(
      bucket(col(dimA), r.getLong(0), r.getLong(1)),
      bucket(col(dimB), r.getLong(2), r.getLong(3)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
