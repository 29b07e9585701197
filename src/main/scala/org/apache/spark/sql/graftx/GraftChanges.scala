package org.apache.spark.sql.graftx

import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ingest.TxLog

/** The change data feed as a catalog-queryable METADATA TABLE —
  * `graft.`/path/t`.changes`, the `.history` shape applied to CDF
  * (the reference maintains Delta tables whose feed Delta serves via
  * the `readChangeFeed` reader option; this surface carries the same
  * columns — `_change_type`, `_commit_version` — as a table, so the
  * window options can't change the relation's schema):
  *
  *   -- batch: every change in commits [2, 5]
  *   spark.read.option("startingVersion", 2).option("endingVersion", 5)
  *     .table("graft.`/path/t`.changes")
  *   -- streaming: snapshot-as-inserts, then every later change —
  *   -- INCLUDING the dv/rewrite commits the plain stream refuses
  *   spark.readStream.table("graft.`/path/t`.changes")
  *
  * Semantics are [[TxLog.changes]]'s exactly — same replay, same
  * overwrite / merge-on-read / checkpoint-noop arms — but served
  * DSv2-native: [[TxLog.cdfArms]] turns the window into
  * file-granular arms, each file is ONE task, and the reader stamps
  * `_change_type`/`_commit_version` as per-partition constants. A dv
  * commit's delete arm is exact row-level: the task reads the file's
  * new and old masks from the dv sidecars (both pruned to the file's
  * 1-2 range-clustered parts) and emits ONLY the newly-masked
  * positions — no diffing scan, no shuffle, no driver rows. Rewrite
  * arms stay file-granular (a rewritten file's unchanged rows appear
  * as delete+insert pairs, `TxLog.netChanges` cancels them); the
  * merge-on-read DML path is the exact-feed path.
  *
  * Every arm reads under the table's CURRENT schema (the one this
  * table declares): pre-evolution files null-fill newer columns, and
  * a column-mapped table serves its current logical names. Removed
  * files back the feed until vacuum reclaims them — Delta's CDF
  * retention contract. */
private[graftx] class GraftChangesTable(table: String)
    extends Table with SupportsRead {

  private val ddl = TxLog.schemaAt(table)
  private val cm: Map[String, String] = TxLog.colMapAt(table)._1

  require(ddl.nonEmpty, s"no committed schema in $table")
  require(!GraftRowLevel.relaxed(ddl).fieldNames.exists(n =>
    n == GraftRowLevel.CdfTypeCol || n == GraftRowLevel.CdfVerCol),
    s"$table has a column named ${GraftRowLevel.CdfTypeCol} or " +
      s"${GraftRowLevel.CdfVerCol} — the changes metadata table " +
      "cannot serve it (the feed stamps those names)")

  override def name(): String = s"graft.`$table`.changes"

  override def schema(): StructType = StructType(
    GraftRowLevel.relaxed(ddl).fields ++ Array(
      StructField(GraftRowLevel.CdfTypeCol, StringType, nullable = false),
      StructField(GraftRowLevel.CdfVerCol, LongType, nullable = false)))

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftChangesScanBuilder(table, ddl, schema(), cm,
      // startingTimestamp resolves to the first commit at/after it
      startingVersion = GraftCatalog.startVersionOf(table, options),
      endingVersion = Option(options.get("endingVersion")).map(_.toLong),
      maxVersionsPerTrigger =
        Option(options.get("maxVersionsPerTrigger")).map(_.toLong))
}

private[graftx] class GraftChangesScanBuilder(table: String, ddl: String,
    full: StructType, cm: Map[String, String],
    startingVersion: Option[Long], endingVersion: Option[Long],
    maxVersionsPerTrigger: Option[Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(s: StructType): Unit = required = s

  override def build(): Scan =
    new GraftChangesScan(table, ddl, required, cm, startingVersion,
      endingVersion, maxVersionsPerTrigger)
}

private[graftx] class GraftChangesScan(table: String, ddl: String,
    required: StructType, cm: Map[String, String],
    startingVersion: Option[Long], endingVersion: Option[Long],
    maxVersionsPerTrigger: Option[Long]) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftTxChanges $table [${startingVersion.getOrElse("?")}, " +
      s"${endingVersion.getOrElse("latest")}]"

  override def toBatch: Batch = {
    // Delta's batch-CDF contract: the window start is explicit
    // (nothing sensible to default to — "everything since v0" on a
    // 100 TB table is never what a bounded query means)
    val sv = startingVersion.getOrElse(throw new IllegalArgumentException(
      s"batch read of $table.changes requires the startingVersion (or " +
        "startingTimestamp) reader option (endingVersion defaults to " +
        "the latest commit)"))
    val latest = TxLog.latestVersion(table).getOrElse(-1L)
    require(sv >= 0 && sv <= latest,
      s"startingVersion must be in [0, $latest] (the latest committed " +
        s"version); got $sv")
    endingVersion.foreach { ev =>
      require(ev >= sv && ev <= latest,
        s"endingVersion must be in [$sv, $latest]; got $ev")
    }
    this
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val to = endingVersion
      .orElse(TxLog.latestVersion(table)).getOrElse(-1L)
    GraftChanges.partitions(table,
      TxLog.cdfArms(table, startingVersion.get - 1, to))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftChanges.readerFactory(ddl, required, cm)

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream = {
    require(endingVersion.isEmpty,
      s"streaming read of $table.changes does not take endingVersion " +
        "— a stream has no end; bound a window with a batch read")
    new GraftCdfMicroBatchStream(table, ddl, required, cm,
      startingVersion, maxVersionsPerTrigger)
  }
}

/** The `.changes` metadata table as a micro-batch stream — the lift
  * of the plain catalog source's append-only restriction: a
  * delete/update/rewrite commit FAILS a `readStream.table("graft.`t`")`
  * batch loudly, while `readStream.table("graft.`t`.changes")` serves
  * it as change rows (Delta's streaming `readChangeFeed` posture).
  * Offsets are commit versions, exactly like the plain source; the
  * first batch serves the live snapshot as of its end offset as
  * `insert` changes (Delta: "the latest snapshot is returned as
  * INSERTs and future changes as change data"), unless
  * `startingVersion` says to tail from a version instead. */
private[graftx] class GraftCdfMicroBatchStream(path: String, ddl: String,
    required: StructType, cm: Map[String, String],
    startingVersion: Option[Long], maxVersionsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  require(maxVersionsPerTrigger.forall(_ > 0),
    s"maxVersionsPerTrigger must be positive; got $maxVersionsPerTrigger")

  private def latestV: Long = TxLog.latestVersion(path).getOrElse(-1L)

  require(startingVersion.forall(v => v >= 0 && v <= latestV + 1),
    s"startingVersion must be in [0, ${latestV + 1}] " +
      s"(latest committed version + 1); got $startingVersion")

  private val snapshotAtStart = startingVersion.isEmpty

  @volatile private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(latestV)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableTarget.getOrElse(latestV)
    val s = start.asInstanceOf[GraftStreamOffset].version
    GraftStreamOffset(maxVersionsPerTrigger match {
      // the initial snapshot always lands whole (splitting pre-stream
      // history could pair a file with the wrong mask state); a pure
      // tail rate-limits from its very first batch
      case Some(m) if s >= 0 || !snapshotAtStart => math.min(target, s + m)
      case _ => target
    })
  }

  override def reportLatestOffset(): Offset = GraftStreamOffset(latestV)

  override def latestOffset(): Offset =
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
    if (s < 0 && snapshotAtStart) {
      // initial batch: the live snapshot AS OF e as insert changes
      // stamped e — masks applied (a merge-on-read table's deleted
      // rows were never "changes" this stream saw)
      val fs = TxLog.liveFiles(path, Some(e))
      val live = fs.toSet
      val dvm = TxLog.dvAt(path, Some(e)).filter(kv => live(kv._1))
      GraftChanges.partitions(path,
        Seq(TxLog.CdfArm(e, "insert", fs, dvm)))
    } else GraftChanges.partitions(path, TxLog.cdfArms(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftChanges.readerFactory(ddl, required, cm)

  override def toString: String = s"GraftTxCdfStream $path"
}

private[graftx] object GraftChanges {

  /** File-granular arms → one [[GraftFilePartition]] per (arm, file),
    * dv parts pruned per file with one sidecar listing per set across
    * the whole pass. Driver cost: O(files in the window's commits)
    * metadata — never rows. */
  def partitions(path: String,
      arms: Seq[TxLog.CdfArm]): Array[InputPartition] = {
    val memo = scala.collection.mutable.Map
      .empty[String, Seq[(String, Long, Long, String, String)]]
    arms.iterator.flatMap { a =>
      a.files.iterator.map { f =>
        val p = Paths.get(path, f)
        GraftFilePartition(f, p.toAbsolutePath.toString, Files.size(p),
          Files.getLastModifiedTime(p).toMillis,
          dvParts = GraftRowLevel.prunedDvParts(path, f, a.dv, memo),
          changeType = a.changeType, commitVersion = a.version,
          dvKeep = a.keep,
          oldDvParts =
            GraftRowLevel.prunedDvParts(path, f, a.dvBefore, memo))
      }
    }.toArray
  }

  /** Shared by the batch scan and the CDF stream: the standard
    * one-file-per-task factory with mask readers always built (any
    * arm may carry masks) and the CDF columns excluded from the
    * parquet read schema (they are reader-stamped constants). */
  def readerFactory(ddl: String, required: StructType,
      cm: Map[String, String]): PartitionReaderFactory =
    GraftReaders.factory(ddl, required, Array.empty, cm,
      anyMasked = true, cdf = true)
}
