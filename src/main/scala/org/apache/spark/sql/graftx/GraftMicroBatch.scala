package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.FileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.internal.connector.SupportsMetadata
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

import graft.ingest.TxLog

/** A catalog stream offset IS a TxLog commit version — the log is the
  * single source of truth, so the stream needs no side state at all
  * (no publication dir, no watermark file): Spark checkpoints the
  * version, and replay against the immutable log is deterministic. */
private[graftx] case class GraftStreamOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** TxLog tables as Structured Streaming micro-batch sources THROUGH
  * THE SQL CATALOG — `spark.readStream.table("graft.`t`")`, the read
  * twin of the reference's Delta `.table()` streaming sink (REF
  * STREAM:199-220; Delta users express the medallion bronze→silver
  * hop as exactly this pair). Semantics match [[TxLog.streamSource]]
  * (and Delta's source): the FIRST batch serves the live snapshot as
  * of its end offset — deletion-vector masks applied, one file per
  * task — and every later batch serves exactly the files appended by
  * commits in `(start, end]` ([[TxLog.streamTailFiles]]). Restart
  * replays from Spark's checkpointed version against the immutable
  * log, so exactly-once holds with ZERO source-side state. The table
  * must stay append-only past the first served offset: a
  * delete/update/rewrite/dv commit inside a batch's range fails that
  * batch loudly at planning time (Delta's posture without
  * ignoreChanges), never silently skips rows.
  *
  * 100 TB shape: `latestOffset` is a directory listing of version
  * FILE NAMES (no commit parsed), a batch plans O(its own commits)
  * via the parse cache, and each task reads one data file — the
  * driver never touches rows. Column-mapped tables stream under the
  * load-time logical names (physical footer names never change, so
  * the one positional restore the batch reader does is equally valid
  * on every file the stream will ever serve). */
private[graftx] class GraftMicroBatchStream(path: String, ddl: String,
    required: StructType, cm: Map[String, String],
    // reader option `maxVersionsPerTrigger` (Delta's maxFilesPerTrigger
    // analogue at this source's natural granularity): cap how many
    // commits one micro-batch absorbs, bounding batch size on a table
    // with a deep unconsumed tail. The INITIAL snapshot always lands
    // whole — splitting pre-stream history across versions could serve
    // files a later (pre-snapshot) rewrite tombstoned.
    maxVersionsPerTrigger: Option[Long] = None,
    // reader option `startingVersion` (Delta's option of the same
    // name): SKIP the initial snapshot and tail append commits from
    // this version INCLUSIVE — the consumer that already holds the
    // table's past (a restarted pipeline with external state, a
    // backfill handled elsewhere) and wants only the live tail
    startingVersion: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  require(maxVersionsPerTrigger.forall(_ > 0),
    s"maxVersionsPerTrigger must be positive; got $maxVersionsPerTrigger")

  private def latestV: Long = TxLog.latestVersion(path).getOrElse(-1L)

  require(startingVersion.forall(v => v >= 0 && v <= latestV + 1),
    s"startingVersion must be in [0, ${latestV + 1}] " +
      s"(latest committed version + 1); got $startingVersion")

  // offset -1 is ambiguous between "snapshot pending" (no
  // startingVersion) and "tail from version 0" (startingVersion=0) —
  // the flag, fixed per query start/restart, disambiguates
  private val snapshotAtStart = startingVersion.isEmpty

  // Trigger.AvailableNow: pin the target version at start, serve up
  // to it, stop — commits landing mid-run wait for the next run
  @volatile private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(latestV)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableTarget.getOrElse(latestV)
    val s = start.asInstanceOf[GraftStreamOffset].version
    GraftStreamOffset(maxVersionsPerTrigger match {
      // the initial snapshot (s = -1 under snapshotAtStart) always
      // lands whole; a pure tail (startingVersion) rate-limits from
      // its very first batch
      case Some(m) if s >= 0 || !snapshotAtStart => math.min(target, s + m)
      case _ => target
    })
  }

  override def reportLatestOffset(): Offset = GraftStreamOffset(latestV)

  override def latestOffset(): Offset =
    // the SupportsAdmissionControl overload above is the one Spark
    // calls once that interface is implemented
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) serves this source")

  override def initialOffset(): Offset =
    GraftStreamOffset(startingVersion.map(_ - 1).getOrElse(-1L))

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = () // the log IS the state

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].version
    val e = end.asInstanceOf[GraftStreamOffset].version
    if (e < 0 || e <= s) return Array.empty
    val (files, dvm) =
      if (s < 0 && snapshotAtStart) {
        // initial batch = the snapshot AS OF the end offset, masks
        // pinned at the same version (the one place dv is legal —
        // every later commit must be append-only)
        val fs = TxLog.liveFiles(path, Some(e))
        val live = fs.toSet
        (fs, TxLog.dvAt(path, Some(e)).filter(kv => live(kv._1)))
      } else (TxLog.streamTailFiles(path, s, e),
        Map.empty[String, (String, Long)])
    if (files.isEmpty) Array.empty
    // one file per task, dv parts pruned per file — the same planner
    // the batch scan uses
    else new GraftFileScan(path, files, ddl, required, Array.empty,
      None, cm, dvm).planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // anyMasked=true: the initial snapshot may carry masks; the extra
    // reader closures are a driver-side allocation, nothing per-task
    GraftReaders.factory(ddl, required, Array.empty, cm, anyMasked = true)

  override def toString: String = s"GraftTxStream $path"
}

/** Thin streamable veneer over the delegated parquet scan: batch
  * behavior — pushdown, vectorization, statistics, explain metadata,
  * exchange-reuse equality — stays the delegate's verbatim, and
  * `toMicroBatchStream` serves the table through
  * [[GraftMicroBatchStream]]. Only the plain-read delegate path needs
  * the veneer; the owned [[GraftFileScan]] (column-mapped / masked /
  * provenance reads) implements toMicroBatchStream itself. */
private[graftx] class GraftStreamableScan(val inner: Scan, path: String,
    ddl: String, cm: Map[String, String],
    maxVersionsPerTrigger: Option[Long] = None,
    startingVersion: Option[Long] = None) extends Scan
    with SupportsReportStatistics with SupportsMetadata {

  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = inner.toBatch
  override def description(): String = inner.description()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
  override def supportedCustomMetrics(): Array[CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    inner.reportDriverMetrics()

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def getMetaData(): Map[String, String] = inner match {
    case s: SupportsMetadata => s.getMetaData()
    case _ => Map.empty
  }

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(path, ddl, inner.readSchema(), cm,
      maxVersionsPerTrigger, startingVersion)

  // exchange/scan reuse must keep working across the veneer
  override def equals(o: Any): Boolean = o match {
    case g: GraftStreamableScan => inner == g.inner
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode()
}

/** The catalog streaming SINK — `df.writeStream.toTable("graft.`t`")`,
  * the reference's own Delta sink shape (REF STREAM:199-220), closing
  * the pure-catalog medallion pair with [[GraftMicroBatchStream]]:
  * per-epoch executor writers stream rows into staged parquet (the
  * COW writer factory, reused verbatim — no driver materialization),
  * and the driver's epoch commit promotes them through
  * [[TxLog.commitStreamingAppend]] — ONE atomic append commit per
  * micro-batch carrying the (appId = queryId, batchId = epochId)
  * ledger, so restarts replay nothing and independent queries fan in
  * under their own ledgers (the same exactly-once contract
  * `TxLog.streamSink` gives the Scala surface). Append output mode
  * only: complete/update would replace rows a downstream streaming
  * read of the same table already served. */
private[graftx] class GraftStreamingWrite(path: String,
    writeSchema: StructType, queryId: String, cm: Map[String, String])
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  // column mapping: staged files carry PHYSICAL footer names (values
  // bind positionally), like every external write path
  private val fileSchema =
    if (cm.isEmpty) writeSchema
    else StructType(writeSchema.fields.map(f =>
      f.copy(name = cm.getOrElse(f.name, f.name))))
  private val ddl = writeSchema.toDDL.replace("\n", " ")
  private val appId = s"catalog-sink-$queryId"
  private val stagingDir = java.nio.file.Paths.get(path, "_staging",
    java.util.UUID.randomUUID().toString)

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory = {
    val spark = SparkSession.active
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    java.nio.file.Files.createDirectories(stagingDir)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    // INT64-micros timestamps inside the transactional path, exactly
    // like TxLog.stage (INT96 carries no column statistics)
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    val owf =
      try new ParquetFileFormat().prepareWrite(spark, job, Map.empty,
        fileSchema)
      finally spark.conf.set(tsKey, prev)
    GraftStreamingWriterFactory(GraftCowWriterFactory(owf,
      new org.apache.spark.util.SerializableConfiguration(
        job.getConfiguration),
      stagingDir.toAbsolutePath.toString, fileSchema, writeSchema))
  }

  override def commit(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write
        .WriterCommitMessage]): Unit = {
    val staged = messages.toSeq.collect {
      case GraftStagedFile(Some(p)) => java.nio.file.Paths.get(p)
    }
    TxLog.commitStreamingAppend(SparkSession.active, path, staged, ddl,
      epochId, appId)
    cleanup()
  }

  override def abort(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write
        .WriterCommitMessage]): Unit = {
    messages.toSeq.foreach {
      case GraftStagedFile(Some(p)) =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p)); ()
      case _ => ()
    }
    cleanup()
  }

  /** Drop the epoch's (now promoted) staging dir — the next epoch's
    * writers recreate it lazily; epochs are serial, so nothing is
    * in-flight here. */
  private def cleanup(): Unit =
    try {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(stagingDir)) {
        val s = java.nio.file.Files.list(stagingDir)
        try s.iterator().asScala
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        finally s.close()
        java.nio.file.Files.deleteIfExists(stagingDir)
      }
      ()
    } catch { case _: Exception => () }
}

/** Epoch-agnostic veneer: each epoch's writers are the COW factory's
  * (UUID-named staged parts — no cross-epoch collision). */
private[graftx] case class GraftStreamingWriterFactory(
    inner: GraftCowWriterFactory)
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): org.apache.spark.sql.connector.write
        .DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    inner.createWriter(partitionId, taskId)
}

/** One-file-per-task parquet reader factory shared by the batch
  * [[GraftFileScan]] and the catalog micro-batch stream: Spark's own
  * vectorized reader closures, built once on the driver and
  * serialized to tasks (the FileSourceScanExec pattern), with the
  * mask/_pos-aware variants built only when they can be needed. */
private[graftx] object GraftReaders {

  def factory(ddl: String, required: StructType,
      pushed: Array[sources.Filter], cm: Map[String, String],
      anyMasked: Boolean, cdf: Boolean = false): PartitionReaderFactory = {
    // column mapping: files carry PHYSICAL names; the exterior stays
    // logical and the reader projection restores names positionally
    def phys(s: StructType): StructType =
      if (cm.isEmpty) s
      else StructType(s.fields.map(f =>
        f.copy(name = cm.getOrElse(f.name, f.name))))
    // CDF columns are reader-stamped constants, never file data — but
    // only a `.changes` scan treats them so (a user column sharing
    // the name stays data on plain scans)
    def isMeta(n: String): Boolean =
      n == GraftRowLevel.FileCol || n == GraftRowLevel.PosCol ||
        (cdf && (n == GraftRowLevel.CdfTypeCol ||
          n == GraftRowLevel.CdfVerCol))
    val dataSchema = phys(GraftRowLevel.relaxed(ddl))
    val readDataSchema = phys(StructType(required.filterNot(f => isMeta(f.name))))
    val spark = SparkSession.active
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val opts = Map(FileFormat.OPTION_RETURNING_BATCH -> "false")
    // ONE FRESH CONF PER READER: buildReaderWithPartitionValues
    // mutates the conf it is handed (requested parquet schema et al)
    // and local-mode broadcast shares the object — a conf reused
    // across builds would serve every reader the LAST builder's
    // schema, null-filling all data columns
    def freshConf() = spark.sessionState.newHadoopConf()
    val readerFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, new StructType(), readDataSchema,
      // pushed filters speak logical names — advisory only, so on a
      // mapped table (physical file schema) they are simply dropped
      if (cm.isEmpty) pushed.toIndexedSeq else Nil,
      opts, freshConf())
    val needPos = required.fieldNames.contains(GraftRowLevel.PosCol)
    // masked files (and _pos projections) need POSITIONAL integrity:
    // the within-file row index is the iteration position, so their
    // reader must not row-group-skip — built with NO pushed filters
    // (every filter is residual anyway; Spark re-evaluates post-scan)
    val unfilteredFunc =
      if (!anyMasked && !needPos) null
      else new ParquetFileFormat().buildReaderWithPartitionValues(
        spark, dataSchema, new StructType(), readDataSchema,
        Nil, opts, freshConf())
    // the dv-set reader: (file STRING, row_index BIGINT) sidecar parts
    val dvFunc =
      if (!anyMasked) null
      else new ParquetFileFormat().buildReaderWithPartitionValues(
        spark, GraftFileReaderFactory.DvSchema, new StructType(),
        GraftFileReaderFactory.DvSchema, Nil, opts, freshConf())
    new GraftFileReaderFactory(readerFunc, unfilteredFunc, dvFunc,
      readDataSchema, required)
  }
}
