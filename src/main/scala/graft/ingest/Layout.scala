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
      files: Int = 8, bits: Int = 16): DataFrame =
    zOrderedN(df, Seq(dimA, dimB), files, bits)

  /** N-ary Morton value: round-robin bit interleave of `dims` (dim j
    * contributes bit i at z-position n·i + j) — the 2-dim `zValue`
    * generalized, and for n = 2 bit-identical to it. */
  def zValueN(dims: Seq[org.apache.spark.sql.Column],
      bits: Int): org.apache.spark.sql.Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      dims.zipWithIndex.foldLeft(acc) { case (a, (d, j)) =>
        a.bitwiseOR(shiftleft(shiftright(d, i).bitwiseAND(1),
          dims.length * i + j))
      }
    }

  /** N-dimensional z-ordered clustering — the layout companion of
    * conjunctive data skipping (`TxLog.snapshotWhere`): every output
    * file covers a tight hyper-rectangle of ALL `dims`, so a
    * multi-predicate lookup prunes on every dimension at once. Dims
    * must be castable to long (the same scope as the 2-dim form;
    * Delta's OPTIMIZE ZORDER normalizes the same way). Per-dim bit
    * width shrinks as dimensions are added (n·bits ≤ 63 — interleave
    * resolution is the price of each extra dimension, which is why
    * z-ordering beyond 3-4 dims stops paying at any scale). Empty
    * input or an all-null dimension degrades to the plain plan. */
  def zOrderedN(df: DataFrame, dims: Seq[String], files: Int = 8,
      bits: Int = 16): DataFrame = {
    require(dims.nonEmpty, "zOrderedN needs at least one dimension")
    val perDim = math.min(bits, 63 / dims.length)
    val aggs = dims.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    if ((0 until 2 * dims.length).exists(r.isNullAt))
      // empty input or an all-null dimension: there is no range to
      // normalize — degrade to the plain (unclustered) plan instead
      // of NPE-ing on the null min/max
      return df
    def bucket(c: org.apache.spark.sql.Column, lo: Long, hi: Long) = {
      // Affine-map the dim's full range onto [0, 2^bits) — stretching
      // narrow dims up as well as scaling wide dims down, so all
      // contribute equally many effective bits to the interleave.
      val factor =
        ((1L << perDim) - 1).toDouble / math.max(hi - lo, 1L).toDouble
      least(floor((c.cast("long") - lit(lo)) * lit(factor)).cast("long"),
        lit((1L << perDim) - 1))
    }
    val z = zValueN(dims.zipWithIndex.map { case (c, j) =>
      bucket(col(c), r.getLong(2 * j), r.getLong(2 * j + 1)) }, perDim)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
