package org.apache.spark.sql.graftx

import java.nio.file.{Files, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.internal.connector.{PredicateUtils, SupportsPushDownCatalystFilters}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.ingest.TxLog

/** Group-based (copy-on-write) row-level SQL DML for TxLog tables —
  * the piece that makes `UPDATE graft.`t` SET ...` and
  * `MERGE INTO graft.`t` USING ...` first-class `spark.sql`
  * statements (the reference maintains its Delta tables with exactly
  * these shapes; REF STREAM:199-220). Spark's own rewrite rules
  * (`RewriteUpdateTable` / `RewriteMergeIntoTable` /
  * `RewriteDeleteFromTable`) turn the statement into a `ReplaceData`
  * plan over this operation:
  *
  *   - the SCAN ([[GraftFileScan]]) reads the pinned snapshot one
  *     file per task and exposes a per-row `_file` metadata column;
  *   - `RowLevelOperationRuntimeGroupFiltering` plans a dynamic
  *     subquery over a SECOND scan (the matching-rows plan) and hands
  *     the matched `_file` set back via
  *     [[SupportsRuntimeV2Filtering.filter]], so the group scan — and
  *     therefore the rewrite — touches ONLY files holding matches
  *     (Iceberg's COW shape; at 100 TB a selective UPDATE moves
  *     O(matched files), never the table);
  *   - the WRITE ([[GraftReplaceWrite]]) is a real distributed DSv2
  *     `BatchWrite`: executors stream replacement rows straight into
  *     staged parquet under `_staging/` (no driver materialization),
  *     and the driver-side `commit` promotes them through
  *     [[TxLog.replaceFiles]] — one atomic rewrite commit with footer
  *     stats, CHECK-constraint enforcement and the standard
  *     concurrent-rewrite conflict checks.
  *
  * The invariant the commit leans on: `replacedFiles` is exactly the
  * file set the group scan ENUMERATED (post runtime filter) — every
  * row of those files flowed through the replacement projection, so
  * removing them and adding the written files is a lossless swap. If
  * the runtime filter never fires (filter disabled, or a condition
  * Spark cannot build a subquery for), the scan read every pinned
  * file and the commit conservatively replaces them all — correct,
  * just unpruned. */
private[graftx] object GraftRowLevel {
  /** Name of the per-row provenance metadata column. */
  val FileCol = "_file"

  /** Name of the per-row within-file ORIGINAL row-index metadata
    * column (pre-mask position — what a deletion vector addresses).
    * Together (_file, _pos) is a stable row id: files are immutable
    * between rewrites, so it survives for the life of the file. */
  val PosCol = "_pos"

  /** Change-feed columns served by the `.changes` metadata table —
    * per-partition constants stamped by the reader (Delta's CDF
    * column names, so consumers port unchanged). */
  val CdfTypeCol = "_change_type"
  val CdfVerCol = "_commit_version"

  /** Log-recorded DDL → read schema, nullability relaxed exactly as
    * `TxLog.snapshot` reads it (schema evolution null-fills files
    * written before a column existed). */
  def relaxed(ddl: String): StructType =
    if (ddl.isEmpty) new StructType()
    else StructType(StructType.fromDDL(ddl).fields.map(_.copy(nullable = true)))

  /** Pushed V1 filters → the engine's data-skipping predicate
    * vocabulary ([[TxLog.Pred]]) for PLANNING-TIME file pruning on
    * catalog reads — the automatic twin of `TxLog.snapshotWhere`'s
    * explicit surface (Delta prunes its SQL scans from commit stats
    * the same way). Conjuncts that don't translate simply don't
    * prune; the stats/bloom tiers are themselves conservative
    * (un-normalizable bounds keep the file), so a translated
    * predicate can only ever DROP files that provably hold no
    * admitted row. Strict inequalities translate to their inclusive
    * hulls (a file whose max equals the strict bound is kept — rows
    * inside it just fail the post-scan filter). Nested fields and
    * dotted names are excluded: stats are keyed by top-level column. */
  def skippingPreds(fs: Seq[sources.Filter]): Seq[TxLog.Pred] = {
    def top(n: String): Boolean = !n.contains(".")
    fs.flatMap {
      case sources.EqualTo(a, v) if top(a) && v != null =>
        Seq(TxLog.Pred.Eq(a, v))
      case sources.EqualNullSafe(a, null) if top(a) =>
        Seq(TxLog.Pred.IsNull(a))
      case sources.EqualNullSafe(a, v) if top(a) =>
        Seq(TxLog.Pred.Eq(a, v))
      case sources.In(a, vs) if top(a) && vs.nonEmpty && !vs.contains(null) =>
        Seq(TxLog.Pred.In(a, vs.toIndexedSeq))
      case sources.GreaterThan(a, v) if top(a) && v != null =>
        Seq(TxLog.Pred.Range(a, Some(v), None))
      case sources.GreaterThanOrEqual(a, v) if top(a) && v != null =>
        Seq(TxLog.Pred.Range(a, Some(v), None))
      case sources.LessThan(a, v) if top(a) && v != null =>
        Seq(TxLog.Pred.Range(a, None, Some(v)))
      case sources.LessThanOrEqual(a, v) if top(a) && v != null =>
        Seq(TxLog.Pred.Range(a, None, Some(v)))
      case sources.IsNull(a) if top(a) => Seq(TxLog.Pred.IsNull(a))
      case sources.IsNotNull(a) if top(a) => Seq(TxLog.Pred.NotNull(a))
      // any string with prefix p sorts at or above p — a sound lower
      // bound for the lexical string tier
      case sources.StringStartsWith(a, p) if top(a) && p != null =>
        Seq(TxLog.Pred.Range(a, Some(p), None))
      case sources.And(l, r) => skippingPreds(Seq(l)) ++ skippingPreds(Seq(r))
      case _ => Nil // Or/Not/untranslatable: no pruning from this conjunct
    }
  }

  /** The dv-set parts that can hold table file `f`'s mask rows, via
    * the parts' `file`-column footer ranges (`memo` caches one listing
    * per set across the files of one planning pass): dv sets are
    * range-clustered on `file` at write, so each one-file task gets
    * 1-2 parts, not the whole commit's mask. An empty pruned list
    * under a mapping that SAYS `f` is masked means untrustworthy
    * stats — fall back to every part (a masked row must never be
    * served). */
  def prunedDvParts(path: String, f: String,
      dv: Map[String, (String, Long)],
      memo: scala.collection.mutable.Map[String,
        Seq[(String, Long, Long, String, String)]])
      : Seq[(String, Long, Long)] =
    dv.get(f).map { case (set, _) =>
      val all = memo.getOrElseUpdate(set, TxLog.dvSetParts(path, set))
      val pruned = all.collect {
        case (ap, len, mt, mn, mx)
            if (mn == null || mx == null) || (mn <= f && f <= mx) =>
          (ap, len, mt)
      }
      if (pruned.nonEmpty) pruned
      else all.map { case (ap, len, mt, _, _) => (ap, len, mt) }
    }.getOrElse(Nil)
}

/** One SQL statement's row-level operation: shared by its scans and
  * its write, which is what lets the commit know the scanned file
  * set. */
private[graftx] class GraftRowLevelOperation(path: String,
    pinnedFiles: Seq[String], ddl: String,
    cmd: RowLevelOperation.Command,
    cm: Map[String, String] = Map.empty,
    dv: Map[String, (String, Long)] = Map.empty) extends RowLevelOperation {

  // the scan that received the runtime group filter: its post-filter
  // file list is the set the replacement data was computed from
  @volatile private var groupScan: GraftFileScan = null
  private[graftx] def groupScanIs(s: GraftFileScan): Unit = groupScan = s
  private[graftx] def replacedFiles: Seq[String] =
    Option(groupScan).map(_.currentFiles).getOrElse(pinnedFiles)
  // the dv mapping every scan of this statement read through — the
  // commit hands it to replaceFiles as the planned-against base
  private[graftx] def plannedDv: Map[String, (String, Long)] = dv

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFileScanBuilder(path, pinnedFiles, ddl, Some(this), cm, dv)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraftReplaceWrite(path, GraftRowLevelOperation.this,
          info.schema(), cm)
    }

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftRowLevel.FileCol))

  override def description(): String = s"GraftTxCow[$cmd] $path"
}

/** Scan builder over a pinned TxLog file list. Filters push to the
  * parquet reader BEST-EFFORT (row-group stats skipping) and are all
  * reported residual, so Spark re-evaluates them post-scan — the same
  * contract as its own parquet source. */
private[graftx] class GraftFileScanBuilder(path: String,
    files: Seq[String], ddl: String, op: Option[GraftRowLevelOperation],
    cm: Map[String, String] = Map.empty,
    dv: Map[String, (String, Long)] = Map.empty)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private val dataSchema: StructType = GraftRowLevel.relaxed(ddl)
  private var required: StructType = dataSchema
  private var pushed: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val names = dataSchema.fieldNames.toSet
    pushed = filters.filter(_.references.forall(names))
    filters // every filter stays post-scan; parquet skipping is advisory
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan =
    new GraftFileScan(path, files, ddl, required, pushed, op, cm, dv)
}

private[graftx] case class GraftFilePartition(name: String,
    absPath: String, length: Long, mtime: Long,
    // the file's deletion-vector set parts (absPath, length, mtime);
    // empty = unmasked. The reader loads them executor-side and skips
    // masked positions with a sorted cursor.
    dvParts: Seq[(String, Long, Long)] = Nil,
    // change-feed stamps: when `changeType` is non-null the projection
    // serves `_change_type`/`_commit_version` as per-partition
    // constants (the `.changes` metadata table's arms)
    changeType: String = null, commitVersion: Long = -1L,
    // keep-list mode (a dv commit's CDF delete arm): emit ONLY the
    // positions in `dvParts` MINUS `oldDvParts` — the rows the commit
    // newly masked, exact row-level deletes with no diffing scan
    dvKeep: Boolean = false,
    oldDvParts: Seq[(String, Long, Long)] = Nil) extends InputPartition

/** One TxLog snapshot as a DSv2 batch: one input partition per table
  * file (a COW rewrite swaps whole files, so file = group = task),
  * each row optionally carrying its `_file` provenance. Runtime group
  * filtering narrows the file list in place — `planInputPartitions`
  * and the committing write both read the narrowed list. */
private[graftx] class GraftFileScan(path: String, files0: Seq[String],
    ddl: String, required: StructType, pushed: Array[sources.Filter],
    op: Option[GraftRowLevelOperation],
    cm: Map[String, String] = Map.empty,
    dv: Map[String, (String, Long)] = Map.empty,
    canStream: Boolean = false,
    maxVersionsPerTrigger: Option[Long] = None,
    startingVersion: Option[Long] = None) extends Scan with Batch
    with SupportsRuntimeV2Filtering {

  @volatile private var files: Seq[String] = files0
  private[graftx] def currentFiles: Seq[String] = files

  // column mapping: the files carry PHYSICAL names; this scan's
  // exterior (readSchema) stays logical and the reader projection
  // restores names positionally
  private def phys(s: StructType): StructType =
    if (cm.isEmpty) s
    else StructType(s.fields.map(f => f.copy(name = cm.getOrElse(f.name, f.name))))
  private def isMeta(n: String): Boolean =
    n == GraftRowLevel.FileCol || n == GraftRowLevel.PosCol
  private val dataSchema = phys(GraftRowLevel.relaxed(ddl))
  private val readDataSchema =
    phys(StructType(required.filterNot(f => isMeta(f.name))))

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftTxScan $path [${files.size}/${files0.size} files, " +
      s"${files.count(dv.contains)} masked] " +
      s"PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  override def filterAttributes(): Array[NamedReference] =
    // only when the projection actually carries _file: advertising it
    // on a scan that pruned _file away (e.g. a subquery's plain read)
    // makes PartitionPruning's resolveRefs fail at planning
    if (required.fieldNames.contains(GraftRowLevel.FileCol))
      Array(Expressions.column(GraftRowLevel.FileCol))
    else Array.empty

  /** Runtime group filter: `_file IN (...)` from the matching-rows
    * subquery. Unrecognized predicate shapes are ignored — that only
    * widens the scanned (and therefore replaced) set, never narrows
    * it, so correctness is preserved. */
  override def filter(predicates: Array[Predicate]): Unit = {
    val sets = predicates.toSeq.flatMap(p => PredicateUtils.toV1(p)).collect {
      case sources.In(c, vs) if c == GraftRowLevel.FileCol =>
        vs.map(String.valueOf(_: Any)).toSet
      case sources.EqualTo(c, v) if c == GraftRowLevel.FileCol =>
        Set(String.valueOf(v))
    }
    if (sets.nonEmpty) {
      val allowed = sets.reduce(_ intersect _)
      files = files.filter(allowed)
    }
    // filter() only ever lands on the group scan; record it even when
    // no predicate parsed (replaced = scanned either way)
    op.foreach(_.groupScanIs(this))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // dv-set parts listed (with footer `file` ranges) ONCE per set,
    // then pruned per table file: per-task mask read stays ∝ the
    // file's mask (see GraftRowLevel.prunedDvParts)
    val partsOf = scala.collection.mutable.Map
      .empty[String, Seq[(String, Long, Long, String, String)]]
    files.map { f =>
      val p = Paths.get(path, f)
      GraftFilePartition(f, p.toAbsolutePath.toString, Files.size(p),
        Files.getLastModifiedTime(p).toMillis,
        GraftRowLevel.prunedDvParts(path, f, dv, partsOf))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // shared with the catalog micro-batch stream — see GraftReaders
    GraftReaders.factory(ddl, required, pushed, cm,
      anyMasked = files.exists(dv.contains))

  /** `spark.readStream.table("graft.`t`")` on an owned-scan table
    * (column-mapped / masked / provenance projections) — the plain
    * delegate path streams through [[GraftStreamableScan]]. */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read
      .streaming.MicroBatchStream = {
    require(canStream,
      s"cannot stream $path from this scan (time-travel pins and " +
        s"row-level-operation scans are batch-only)")
    new GraftMicroBatchStream(path, ddl, required, cm,
      maxVersionsPerTrigger, startingVersion)
  }
}

private[graftx] object GraftFileReaderFactory {
  /** Schema of a deletion-vector sidecar dataset. */
  val DvSchema: StructType =
    StructType.fromDDL("file STRING, row_index BIGINT")
}

private[graftx] class GraftFileReaderFactory(
    readerFunc: PartitionedFile => Iterator[InternalRow],
    // no-pushed-filters variant (null when never needed): serves
    // masked files and _pos projections, where the within-file row
    // index is the iteration position and row-group skipping would
    // corrupt it
    unfilteredFunc: PartitionedFile => Iterator[InternalRow],
    dvFunc: PartitionedFile => Iterator[InternalRow],
    inputSchema: StructType, outputSchema: StructType)
    extends PartitionReaderFactory {

  private def flatten(base: Iterator[InternalRow]): Iterator[InternalRow] =
    // the reader yields rows, or ColumnarBatches typed as rows when
    // the vectorized path engages — flatten both shapes
    base.asInstanceOf[Iterator[Any]].flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r: InternalRow => Iterator.single(r)
    }

  /** The row positions `parts` mask for file `name`, sorted ascending
    * — read from the dv sidecar parts on the executor (cost ∝ mask
    * size, the same rows the anti-join path shuffles; here they never
    * leave the task). */
  private def positionsOf(name0: String,
      parts: Seq[(String, Long, Long)]): Array[Long] = {
    val name = UTF8String.fromString(name0)
    val out = Array.newBuilder[Long]
    parts.foreach { case (p, len, mtime) =>
      val pf = PartitionedFile(InternalRow.empty,
        SparkPath.fromPathString(p), 0L, len, Array.empty, mtime, len,
        Map.empty)
      flatten(dvFunc(pf)).foreach { r =>
        if (!r.isNullAt(0) && r.getUTF8String(0) == name)
          out += r.getLong(1)
      }
    }
    val arr = out.result()
    java.util.Arrays.sort(arr)
    arr
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[GraftFilePartition]
    val pf = PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString(fp.absPath), 0L, fp.length,
      Array.empty, fp.mtime, fp.length, Map.empty)
    val masked = fp.dvParts.nonEmpty || fp.dvKeep
    val needPos = outputSchema.fieldNames.contains(GraftRowLevel.PosCol)
    val rows = flatten(
      if (masked || needPos) unfilteredFunc(pf) else readerFunc(pf))
    // skip-list by default; keep-list (emit ONLY these positions) for
    // a change feed's dv-delete arm: new mask minus old mask = the
    // rows the commit newly deleted
    val keepMode = fp.dvKeep
    val mask: Array[Long] =
      if (fp.dvKeep) {
        val nw = positionsOf(fp.name, fp.dvParts)
        val old = positionsOf(fp.name, fp.oldDvParts)
        nw.filter(p => java.util.Arrays.binarySearch(old, p) < 0)
      } else if (masked) positionsOf(fp.name, fp.dvParts)
      else null
    // POSITIONAL binding: inputSchema is outputSchema minus the
    // metadata columns, possibly under physical (column-mapping)
    // names — order is preserved, names may differ. _pos rides a
    // one-slot row joined to the data row.
    val inAttrs = DataTypeUtils.toAttributes(inputSchema)
    val posAttr = org.apache.spark.sql.catalyst.expressions
      .AttributeReference(GraftRowLevel.PosCol,
        org.apache.spark.sql.types.LongType, nullable = false)()
    var di = 0
    val exprs: Seq[Expression] = outputSchema.map { f =>
      if (f.name == GraftRowLevel.FileCol)
        Literal(UTF8String.fromString(fp.name), StringType)
      else if (f.name == GraftRowLevel.PosCol) posAttr
      // change-feed stamps — per-partition constants; the null guard
      // keeps a USER column that happens to share the name bound as
      // data on plain (non-CDF) scans
      else if (f.name == GraftRowLevel.CdfTypeCol && fp.changeType != null)
        Literal(UTF8String.fromString(fp.changeType), StringType)
      else if (f.name == GraftRowLevel.CdfVerCol && fp.changeType != null)
        Literal(fp.commitVersion,
          org.apache.spark.sql.types.LongType)
      else { val a = inAttrs(di); di += 1; a }
    }.toSeq
    val proj = UnsafeProjection.create(exprs, inAttrs :+ posAttr)
    val posRow = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(1)
    val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      private var pos = -1L  // original (pre-mask) row index
      private var mi = 0     // cursor into the sorted mask
      override def next(): Boolean = {
        while (rows.hasNext) {
          val r = rows.next()
          pos += 1
          // positions arrive ascending: advance the cursor; skip hits
          // (skip-list) or emit ONLY hits (keep-list)
          if (mask != null) {
            while (mi < mask.length && mask(mi) < pos) mi += 1
            val hit = mi < mask.length && mask(mi) == pos
            if (hit) mi += 1
            if (hit == keepMode) {
              posRow.setLong(0, pos)
              cur = proj(joined(r, posRow))
              return true
            }
          } else {
            posRow.setLong(0, pos)
            cur = proj(joined(r, posRow))
            return true
          }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

private[graftx] case class GraftStagedFile(path: Option[String])
    extends WriterCommitMessage

/** The distributed COW write: executors stream replacement rows into
  * staged parquet files (lazily — an empty partition stages nothing),
  * the driver commit promotes them and removes the replaced group
  * files in one atomic TxLog rewrite commit. A statement that matched
  * nothing (empty group set, zero replacement rows) commits nothing
  * at all. */
private[graftx] class GraftReplaceWrite(path: String,
    op: GraftRowLevelOperation, writeSchema: StructType,
    cm: Map[String, String] = Map.empty)
    extends Write with BatchWrite {

  private val dataSchema = StructType(
    writeSchema.filterNot(_.name == GraftRowLevel.FileCol))
  // column mapping: the FILE schema carries physical names (row
  // values bind positionally; only the footer names change), so the
  // staged parquet lines up with every other file of the table
  private val fileSchema =
    if (cm.isEmpty) dataSchema
    else StructType(dataSchema.fields.map(f =>
      f.copy(name = cm.getOrElse(f.name, f.name))))
  private val stagingDir =
    Paths.get(path, "_staging", UUID.randomUUID().toString)

  override def toBatch: BatchWrite = this
  override def description(): String = s"GraftTxCowWrite $path"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Files.createDirectories(stagingDir)
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // INT64-micros timestamps inside the transactional path, exactly
    // like TxLog.stage: INT96 carries no column statistics, which
    // would silently disable skipping on every time column
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    val owf =
      try new ParquetFileFormat().prepareWrite(spark, job, Map.empty, fileSchema)
      finally spark.conf.set(tsKey, prev)
    GraftCowWriterFactory(owf,
      new SerializableConfiguration(job.getConfiguration),
      stagingDir.toAbsolutePath.toString, fileSchema, writeSchema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.toSeq
      .collect { case GraftStagedFile(Some(p)) => Paths.get(p) }
    val removes = op.replacedFiles
    if (staged.nonEmpty || removes.nonEmpty)
      TxLog.replaceFiles(SparkSession.active, path, removes, staged,
        dataSchema.toDDL.replace("\n", " "),
        // the dv mapping the statement's scans read through: a dv
        // commit racing between pin and here must conflict loudly,
        // not be resurrected by our mask-applied replacement rows
        plannedDv = Some(op.plannedDv))
    cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit =
    try {
      Files.list(stagingDir).iterator().asScala
        .foreach(f => Files.deleteIfExists(f))
      Files.deleteIfExists(stagingDir)
      ()
    } catch { case _: Exception => () }
}

private[graftx] case class GraftCowWriterFactory(owf: OutputWriterFactory,
    conf: SerializableConfiguration, stagingDir: String,
    fileSchema: StructType, writeSchema: StructType)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var out: OutputWriter = null
      private var file: String = null
      // the plan may carry metadata (_file) alongside the data
      // columns; strip to the table shape. POSITIONAL: dataSchema is
      // writeSchema minus _file (order preserved, names may be
      // physical under column mapping)
      private val proj: UnsafeProjection =
        if (!writeSchema.fieldNames.contains(GraftRowLevel.FileCol)) null
        else {
          val in = DataTypeUtils.toAttributes(writeSchema)
          UnsafeProjection.create(
            in.zip(writeSchema.fields).collect {
              case (a, f) if f.name != GraftRowLevel.FileCol =>
                a: Expression
            }.toSeq, in)
        }

      override def write(row: InternalRow): Unit = {
        if (out == null) {
          Files.createDirectories(Paths.get(stagingDir))
          file = s"$stagingDir/w-$partitionId-$taskId-${UUID.randomUUID()}.parquet"
          // conf copied per writer: Configuration mutation is not
          // thread-safe across an executor's task threads
          val ctx = new TaskAttemptContextImpl(new Configuration(conf.value),
            new TaskAttemptID(new TaskID(new JobID("graft", 0),
              TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt))
          out = owf.newInstance(file, fileSchema, ctx)
        }
        out.write(if (proj == null) row else proj(row))
      }

      override def commit(): WriterCommitMessage = {
        if (out != null) out.close()
        GraftStagedFile(Option(file))
      }

      override def abort(): Unit = {
        if (out != null) { try out.close() catch { case _: Exception => () } }
        if (file != null) { Files.deleteIfExists(Paths.get(file)); () }
      }

      override def close(): Unit = ()
    }
}

/** Plain-read scan builder for [[GraftTxTable]]: delegates everything
  * to Spark's parquet builder (full pushdown, vectorization, file
  * splitting), EXCEPT when the query references the `_file` metadata
  * column — provenance reads route to [[GraftFileScan]], the only
  * scan that can produce it. Safe to swap at build time because the
  * parquet delegate reports every data filter as residual (Spark
  * re-evaluates them post-scan regardless of which scan serves). */
private[graftx] class GraftDelegatingScanBuilder(delegate: ScanBuilder,
    path: String, files: Seq[String], ddl: String,
    cm: Map[String, String] = Map.empty,
    dv: Map[String, (String, Long)] = Map.empty,
    canStream: Boolean = false,
    maxVersionsPerTrigger: Option[Long] = None,
    startingVersion: Option[Long] = None,
    // the USER's time-travel pin (None on a current read) — gates the
    // bloom pruning tier, whose sidecars are present-day state
    asOf: Option[Long] = None,
    // rebuild the parquet delegate over a NARROWED file list when
    // stats pruning drops files (the prebuilt delegate is pinned to
    // the full snapshot); null = no pruning on the delegate path
    delegateFor: Seq[String] => ScanBuilder = null) extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  // a column-mapped table can never use the parquet delegate (it
  // would resolve LOGICAL names against physical file columns);
  // neither can a deletion-vector-masked snapshot (the delegate
  // would serve masked rows)
  private def mustOwn: Boolean = cm.nonEmpty || dv.nonEmpty

  private var wantsFile = false
  private var pruned: StructType = GraftRowLevel.relaxed(ddl)
  // advisory filters for the owned scan's parquet readers (row-group
  // skipping on UNMASKED files of a masked snapshot) — still reported
  // residual, so Spark re-evaluates them post-scan
  private var ownPushed: Array[sources.Filter] = Array.empty
  // planning-time data skipping (round 17): the pushed conjunction
  // translated to the engine's stats/bloom predicate vocabulary — the
  // snapshot's file list narrows BEFORE any scan is built, so a
  // selective read on a clustered 100 TB table schedules O(matching)
  // tasks instead of one per live file (filters stay post-scan
  // regardless: pruning only drops files that provably hold no match)
  private var skipPreds: Seq[TxLog.Pred] = Nil
  private var pushedExprs: Seq[Expression] = Nil
  private var aggPushed = false

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushedExprs = filters
    val v1 = filters.flatMap(
      org.apache.spark.sql.execution.datasources.DataSourceStrategy
        .translateFilter(_, supportNestedPredicatePushdown = true))
    // skipping predicates speak LOGICAL names (pruneGiven maps to the
    // physical stats keys itself), so column mapping composes here
    skipPreds = GraftRowLevel.skippingPreds(v1)
    delegate match {
      case d: SupportsPushDownCatalystFilters if !mustOwn =>
        d.pushFilters(filters)
      case _ =>
        if (cm.isEmpty) ownPushed = v1.toArray
        filters // all residual; Spark re-evaluates post-scan
    }
  }

  override def pushedFilters(): Array[Predicate] = delegate match {
    case d: SupportsPushDownCatalystFilters if !mustOwn => d.pushedFilters
    case _ => Array.empty
  }

  override def pushAggregation(agg: Aggregation): Boolean = delegate match {
    case d: SupportsPushDownAggregates if !mustOwn =>
      aggPushed = d.pushAggregation(agg)
      aggPushed
    case _ => false
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    delegate match {
      case d: SupportsPushDownAggregates if !mustOwn =>
        d.supportCompletePushDown(agg)
      case _ => false
    }

  override def pruneColumns(s: StructType): Unit = {
    wantsFile = s.fieldNames.exists(n =>
      n == GraftRowLevel.FileCol || n == GraftRowLevel.PosCol)
    pruned = s
    delegate match {
      case d: SupportsPushDownRequiredColumns =>
        d.pruneColumns(StructType(s.filterNot(f =>
          f.name == GraftRowLevel.FileCol ||
            f.name == GraftRowLevel.PosCol)))
      case _ => ()
    }
  }

  override def build(): Scan = {
    // data skipping runs once, at build: stats + bloom tiers over the
    // pinned list (driver-side log metadata only). Aggregate pushdown
    // answers from FULL-snapshot footers, so a pruned twin must never
    // serve it (parquet only pushes aggregates when no data filter is
    // pushed, so the flag co-occurring with skipPreds is defensive).
    val kept =
      if (skipPreds.isEmpty || aggPushed) files
      else TxLog.pruneGiven(path, files, skipPreds, asOf)
    if (wantsFile || mustOwn)
      new GraftFileScan(path, kept, ddl, pruned, ownPushed, None, cm, dv,
        canStream, maxVersionsPerTrigger, startingVersion)
    else {
      val b =
        if (kept.size < files.size && delegateFor != null) {
          // rebuild the parquet delegate over the narrowed list and
          // replay the pushdown dialogue — responses are schema-based
          // and deterministic, so the twin answers identically
          val b2 = delegateFor(kept)
          b2 match {
            case d: SupportsPushDownCatalystFilters =>
              d.pushFilters(pushedExprs); ()
            case _ => ()
          }
          b2 match {
            case d: SupportsPushDownRequiredColumns =>
              d.pruneColumns(StructType(pruned.filterNot(f =>
                f.name == GraftRowLevel.FileCol ||
                  f.name == GraftRowLevel.PosCol)))
            case _ => ()
          }
          b2.build()
        } else delegate.build()
      // the streamable veneer only where streaming is legal (not on
      // time-travel pins); batch behavior delegates verbatim
      if (canStream)
        new GraftStreamableScan(b, path, ddl, cm, maxVersionsPerTrigger,
          startingVersion)
      else b
    }
  }
}

/** Delta-based (merge-on-read) row-level SQL DML — the deletion-
  * vector write path behind `UPDATE/MERGE/DELETE graft.`t`` when the
  * table sets `write.dml.mode = merge-on-read` (Delta's
  * `enableDeletionVectors` analogue; Iceberg's position-delete MoR
  * shape). Spark's rewrite rules see [[SupportsDelta]] and plan a
  * `WriteDelta` instead of `ReplaceData`:
  *
  *   - the SCAN is the same [[GraftFileScan]], masks applied, with
  *     the (`_file`, `_pos`) row id;
  *   - DELETEs arrive per row as (file, original row index) — each
  *     task streams them into a staged dv parquet part;
  *   - updates are represented as DELETE + INSERT
  *     ([[SupportsDelta.representUpdateAsDeleteAndInsert]]); INSERT
  *     rows stream into staged data parquet;
  *   - the driver commit lands ONE atomic `dv` commit via
  *     [[TxLog.commitDeltaDml]]: cumulative per-file masks (old ∪
  *     new, deduped distributed), new data files censused like every
  *     internal write.
  *
  * Write cost ∝ touched rows — a selective UPDATE on a 100 TB table
  * moves its matched rows and mask bytes, never whole files (the COW
  * path re-copies every matched FILE). */
private[graftx] class GraftMorOperation(path: String,
    pinnedFiles: Seq[String], ddl: String,
    cmd: RowLevelOperation.Command,
    cm: Map[String, String] = Map.empty,
    dv: Map[String, (String, Long)] = Map.empty)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(GraftRowLevel.FileCol),
      Expressions.column(GraftRowLevel.PosCol))

  // updates = delete + reinsert: one writer shape serves all three
  // commands, and the commit stays a pure (masks, new files) pair
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFileScanBuilder(path, pinnedFiles, ddl, None, cm, dv)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(path, info.schema(),
          info.rowIdSchema().orElse(null), cm, dv)
    }

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftRowLevel.FileCol))

  override def description(): String = s"GraftTxMor[$cmd] $path"
}

private[graftx] case class GraftDeltaStaged(dataPath: Option[String],
    dvPath: Option[String]) extends WriterCommitMessage

/** The distributed merge-on-read write: each task lazily streams
  * DELETE row ids into a staged dv parquet part and INSERT rows into
  * a staged data part; the driver commit promotes both through ONE
  * atomic TxLog dv commit. A statement that matched nothing commits
  * nothing at all. */
private[graftx] class GraftDeltaWrite(path: String,
    writeSchema: StructType, rowIdSchema: StructType,
    cm: Map[String, String], plannedDv: Map[String, (String, Long)])
    extends DeltaWrite with DeltaBatchWrite {

  private val dataSchema = StructType(
    writeSchema.filterNot(f => f.name == GraftRowLevel.FileCol ||
      f.name == GraftRowLevel.PosCol))
  // column mapping: staged data files carry PHYSICAL footer names
  private val fileSchema =
    if (cm.isEmpty) dataSchema
    else StructType(dataSchema.fields.map(f =>
      f.copy(name = cm.getOrElse(f.name, f.name))))
  private val stagingDir =
    Paths.get(path, "_staging", UUID.randomUUID().toString)

  override def toBatch: DeltaBatchWrite = this
  override def description(): String = s"GraftTxMorWrite $path"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    val spark = SparkSession.active
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Files.createDirectories(stagingDir)
    // INT64-micros timestamps, like every transactional write path
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    val (dataOwf, dvOwf) =
      try {
        val job1 = Job.getInstance(spark.sessionState.newHadoopConf())
        val d = new ParquetFileFormat().prepareWrite(
          spark, job1, Map.empty, fileSchema)
        val job2 = Job.getInstance(spark.sessionState.newHadoopConf())
        val v = new ParquetFileFormat().prepareWrite(
          spark, job2, Map.empty, GraftFileReaderFactory.DvSchema)
        (SerializableOwf(d,
          new SerializableConfiguration(job1.getConfiguration)),
          SerializableOwf(v,
            new SerializableConfiguration(job2.getConfiguration)))
      } finally spark.conf.set(tsKey, prev)
    // the row-id columns' positions inside the id row handed to
    // delete(): resolved from the ACTUAL rowIdSchema (projection
    // order is Spark's, not ours)
    val ids = Option(rowIdSchema).getOrElse(new StructType())
    val fileIdx = ids.fieldNames.indexOf(GraftRowLevel.FileCol)
    val posIdx = ids.fieldNames.indexOf(GraftRowLevel.PosCol)
    require(fileIdx >= 0 && posIdx >= 0,
      s"merge-on-read DML needs the (_file, _pos) row id; got " +
        s"${ids.fieldNames.mkString(", ")}")
    GraftMorWriterFactory(dataOwf, dvOwf,
      stagingDir.toAbsolutePath.toString, fileSchema, writeSchema,
      fileIdx, posIdx)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq.collect { case m: GraftDeltaStaged => m }
    val data = msgs.flatMap(_.dataPath).map(Paths.get(_))
    val dvs = msgs.flatMap(_.dvPath).map(Paths.get(_))
    if (data.nonEmpty || dvs.nonEmpty)
      TxLog.commitDeltaDml(SparkSession.active, path, dvs, data,
        dataSchema.toDDL.replace("\n", " "), plannedDv)
    cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit =
    try {
      Files.list(stagingDir).iterator().asScala
        .foreach(f => Files.deleteIfExists(f))
      Files.deleteIfExists(stagingDir)
      ()
    } catch { case _: Exception => () }
}

/** An OutputWriterFactory + the hadoop conf it needs, serializable as
  * a unit (conf copied per writer — Configuration mutation is not
  * thread-safe across an executor's task threads). */
private[graftx] case class SerializableOwf(owf: OutputWriterFactory,
    conf: SerializableConfiguration) {
  def open(file: String, schema: StructType, partitionId: Int,
      taskId: Long): OutputWriter = {
    val ctx = new TaskAttemptContextImpl(new Configuration(conf.value),
      new TaskAttemptID(new TaskID(new JobID("graft", 0),
        TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt))
    owf.newInstance(file, schema, ctx)
  }
}

private[graftx] case class GraftMorWriterFactory(dataOwf: SerializableOwf,
    dvOwf: SerializableOwf, stagingDir: String, fileSchema: StructType,
    writeSchema: StructType, fileIdx: Int, posIdx: Int)
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private var dataOut: OutputWriter = null
      private var dataFile: String = null
      private var dvOut: OutputWriter = null
      private var dvFile: String = null
      // insert rows may carry metadata columns alongside the data
      // shape; strip positionally (order preserved)
      private val proj: UnsafeProjection = {
        val metaFree = writeSchema.fieldNames.forall(n =>
          n != GraftRowLevel.FileCol && n != GraftRowLevel.PosCol)
        if (metaFree) null
        else {
          val in = DataTypeUtils.toAttributes(writeSchema)
          UnsafeProjection.create(
            in.zip(writeSchema.fields).collect {
              case (a, f) if f.name != GraftRowLevel.FileCol &&
                  f.name != GraftRowLevel.PosCol => a: Expression
            }.toSeq, in)
        }
      }
      private val dvRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(2)

      override def delete(metadata: InternalRow, id: InternalRow): Unit = {
        if (dvOut == null) {
          Files.createDirectories(Paths.get(stagingDir))
          dvFile =
            s"$stagingDir/dv-$partitionId-$taskId-${UUID.randomUUID()}.parquet"
          dvOut = dvOwf.open(dvFile, GraftFileReaderFactory.DvSchema,
            partitionId, taskId)
        }
        require(!id.isNullAt(fileIdx) && !id.isNullAt(posIdx),
          "merge-on-read DELETE row id carries NULL _file/_pos")
        dvRow.update(0, id.getUTF8String(fileIdx).copy())
        dvRow.setLong(1, id.getLong(posIdx))
        dvOut.write(dvRow)
      }

      override def update(metadata: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        // unreachable with representUpdateAsDeleteAndInsert = true;
        // kept semantically correct anyway
        delete(metadata, id)
        insert(row)
      }

      override def insert(row: InternalRow): Unit = {
        if (dataOut == null) {
          Files.createDirectories(Paths.get(stagingDir))
          dataFile =
            s"$stagingDir/w-$partitionId-$taskId-${UUID.randomUUID()}.parquet"
          dataOut = dataOwf.open(dataFile, fileSchema, partitionId, taskId)
        }
        dataOut.write(if (proj == null) row else proj(row))
      }

      override def commit(): WriterCommitMessage = {
        if (dataOut != null) dataOut.close()
        if (dvOut != null) dvOut.close()
        GraftDeltaStaged(Option(dataFile), Option(dvFile))
      }

      override def abort(): Unit = {
        if (dataOut != null) {
          try dataOut.close() catch { case _: Exception => () }
        }
        if (dvOut != null) {
          try dvOut.close() catch { case _: Exception => () }
        }
        if (dataFile != null) { Files.deleteIfExists(Paths.get(dataFile)); () }
        if (dvFile != null) { Files.deleteIfExists(Paths.get(dvFile)); () }
      }

      override def close(): Unit = ()
    }
}
