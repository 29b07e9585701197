package org.apache.spark.sql.graftx

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ingest.TxLog

/** DataSourceV2 `TableCatalog` over TxLog tables — the piece that
  * makes the jar-free Delta stand-in a first-class `spark.sql`
  * citizen (the reference queries its Delta tables straight from SQL,
  * REF STREAM:220 `.table()`): registered as catalog `graft` by
  * `Engine.prepare`, so
  *
  *   SELECT * FROM graft.`/path/to/table`
  *   SELECT * FROM graft.`/path/to/table` VERSION AS OF 3
  *   SELECT * FROM graft.`/path/to/table` TIMESTAMP AS OF '...'
  *   INSERT INTO graft.`/path/to/table` SELECT ...
  *   INSERT OVERWRITE graft.`/path/to/table` SELECT ...
  *   DELETE FROM graft.`/path/to/table` WHERE ...
  *
  * all work natively. The identifier's name is the table directory
  * (namespace parts, if any, join with '/'); the snapshot's FILE LIST
  * pins at `loadTable` time, so one SQL statement reads one consistent
  * version even while writers land commits (the same isolation
  * `registerView` gives, now without pre-registration).
  *
  * Reads delegate to Spark's own `ParquetTable` over the pinned live
  * files with the LOG-recorded schema — full DSv2 pushdown, pruning
  * and vectorized reading apply, no footer inference (SqlCatalogSpec
  * pins PushedFilters in the executed plan). Writes go through a
  * `V1Write` to `TxLog.write` (append; `INSERT OVERWRITE` maps to the
  * overwrite commit) — one transactional commit per statement, CHECK
  * constraints and schema guards included. `DELETE FROM` translates
  * the pushed predicates to a Column and runs the COW `TxLog.delete`
  * (work ∝ matching files; predicates outside the translatable set
  * are refused at analysis via `canDeleteWhere`, never half-applied).
  *
  * Snapshots carrying DELETION-VECTOR masks are served natively:
  * masked files route through [[GraftFileScan]], one file per task,
  * and each reader skips its file's masked row positions with a
  * sorted executor-side cursor (mask bytes never leave the task — no
  * shuffle, no driver state). Unmasked files in the same snapshot
  * keep the full parquet-delegate pushdown. Lives in an
  * `org.apache.spark.sql` subpackage to reach `ParquetTable` /
  * `PredicateUtils` (the `graftx/Bridge.scala` pattern — only this
  * package touches Spark internals). */
class GraftCatalog extends TableCatalog with ProcedureCatalog
    with StagingTableCatalog {

  private var catalogName = "graft"

  /** `CALL graft.system.<proc>(...)` — see [[GraftProcedures]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list()

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catalogName = name }

  override def name(): String = catalogName

  private def tablePath(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  private def load(ident: Identifier, asOf: Option[Long]): Table = {
    val t = tablePath(ident)
    if (TxLog.latestVersion(t).isEmpty) {
      // metadata-table fallback (Iceberg's `db.table.history` shape):
      // `SELECT * FROM graft.`/path/t`.history` parses as
      // namespace=[/path/t], name=history — when the FULL path is not
      // a table but the namespace prefix is, serve the read-only
      // metadata table. A real table literally named .../history wins
      // (checked first), so nothing existing changes meaning.
      if (ident.name() == "history" && ident.namespace().nonEmpty) {
        val baseT = ident.namespace().mkString("/")
        if (TxLog.latestVersion(baseT).nonEmpty) {
          require(asOf.isEmpty,
            "time travel over the history metadata table is not " +
              "supported — it already spans every version")
          return new GraftHistoryTable(baseT)
        }
      }
      // the change data feed, same metadata-table shape: batch reads
      // window with startingVersion/endingVersion reader options,
      // `readStream.table` serves snapshot-then-changes — including
      // the dv/rewrite commits the plain stream source refuses
      if (ident.name() == "changes" && ident.namespace().nonEmpty) {
        val baseT = ident.namespace().mkString("/")
        if (TxLog.latestVersion(baseT).nonEmpty) {
          require(asOf.isEmpty,
            "time travel over the changes metadata table is not " +
              "supported — pin the window with the startingVersion/" +
              "endingVersion reader options instead")
          return new GraftChangesTable(baseT)
        }
      }
      throw new NoSuchTableException(ident)
    }
    asOf.foreach { v =>
      if (!TxLog.latestVersion(t).exists(_ >= v))
        throw new NoSuchTableException(ident)
    }
    new GraftTxTable(t, asOf)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` — the version string must be a TxLog commit
    * version number. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v =
      try version.toLong
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"graft catalog versions are commit numbers; got '$version'")
      }
    load(ident, Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — DSv2 hands MICROseconds since epoch;
    * resolution is the commit-publish clock (`TxLog.versionAt`). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = tablePath(ident)
    val v = TxLog.versionAt(t, Math.floorDiv(timestamp, 1000L))
      .getOrElse(throw new NoSuchTableException(ident))
    load(ident, Some(v))
  }

  override def tableExists(ident: Identifier): Boolean =
    TxLog.latestVersion(tablePath(ident)).nonEmpty

  /** Tables are directories anywhere on storage — there is no listable
    * namespace (same posture as Delta's path-based tables). */
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  /** `CREATE TABLE graft.`t` (...)` and CTAS: version 0 lands as an
    * empty schema-recording commit, then CTAS's write appends into it
    * — each step its own atomic commit. `PARTITIONED BY (cols)` and
    * `CLUSTER BY (cols)` both record the LAYOUT-clustering property
    * (TxLog tables cluster by range/z-order layout + stats pruning,
    * never hive directories — Delta's liquid-clustering posture:
    * CLUSTER BY records intent, OPTIMIZE realizes it); non-identity
    * partition transforms (bucket/years/...) are refused loudly.
    * TBLPROPERTIES pass through to the property sidecar. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val clusterCols = GraftCatalog.clusterColsOf(schema, partitions)
    val t = tablePath(ident)
    GraftCatalog.refuseLocation(properties)
    TxLog.createTable(t, schema.toDDL.replace("\n", " "))
    GraftCatalog.applyTableMeta(t, clusterCols, properties)
    new GraftTxTable(t, None)
  }

  /** Atomic CTAS / RTAS / `[CREATE OR] REPLACE TABLE` — Spark plans
    * the Atomic*Exec variants when the catalog stages: the statement's
    * data lands as ONE overwrite commit (schema + files together, the
    * same `TxLog.write` commit every internal overwrite uses), so the
    * table is never visible half-created — and a REPLACE preserves
    * HISTORY (time travel to the pre-replace table keeps working),
    * where Spark's non-atomic fallback would drop the table and nuke
    * its log. See [[GraftStagedTable]]. */
  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    staged(ident, info, replace = false)
  }

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    staged(ident, info, replace = true)
  }

  override def stageCreateOrReplace(ident: Identifier,
      info: TableInfo): StagedTable =
    staged(ident, info, replace = tableExists(ident))

  private def staged(ident: Identifier, info: TableInfo,
      replace: Boolean): StagedTable = {
    GraftCatalog.refuseLocation(info.properties())
    new GraftStagedTable(tablePath(ident), info.schema(),
      GraftCatalog.clusterColsOf(info.schema(), info.partitions()),
      info.properties(), replace)
  }

  /** `ALTER TABLE graft.`t` ...`: ADD COLUMNS (metadata-only additive
    * evolve — every column of the statement in ONE commit, all-or-
    * nothing), RENAME/DROP COLUMN (column-mapping commits), SET/UNSET
    * TBLPROPERTIES. Anything else is refused loudly. Every change is
    * VALIDATED before the first one applies, so a statement that will
    * be refused refuses whole; the rare mixed statement (Spark's SQL
    * grammar sends one change kind per ALTER, but the API allows
    * mixes) applies non-add changes as separate commits — each commit
    * is individually atomic. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val t = tablePath(ident)
    // pure validation first — nothing applied yet
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "ADD COLUMN supports top-level columns only")
        // refuse what the additive evolve cannot honor, loudly:
        // NOT NULL (every pre-evolution file reads the new column as
        // NULL). FIRST/AFTER is honored — parquet readers resolve
        // columns by name, so schema position is pure DDL metadata.
        require(a.isNullable,
          "ADD COLUMN ... NOT NULL is not supported: rows written " +
            "before the evolution read the new column as NULL")
      case r: TableChange.RenameColumn =>
        require(r.fieldNames().length == 1,
          "RENAME COLUMN supports top-level columns only")
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames().length == 1,
          "DROP COLUMN supports top-level columns only")
      case _: TableChange.SetProperty => ()
      case _: TableChange.RemoveProperty => ()
      case other =>
        throw new UnsupportedOperationException(
          s"unsupported ALTER TABLE change: $other")
    }
    // ADD COLUMNS (a INT, b INT) arrives as N AddColumn changes but is
    // ONE statement: land all of them in one commit (r16 ADVICE)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    if (adds.nonEmpty)
      TxLog.addColumns(t,
        adds.map(a => (a.fieldNames()(0), a.dataType().sql)).toSeq,
        adds.flatMap { a =>
          a.position() match {
            case null => None
            case _: TableChange.First =>
              Some(a.fieldNames()(0) -> TxLog.AddPos.First)
            case af: TableChange.After =>
              Some(a.fieldNames()(0) -> TxLog.AddPos.After(af.column()))
            case other => throw new UnsupportedOperationException(
              s"unsupported column position: $other")
          }
        }.toMap)
    changes.foreach {
      case _: TableChange.AddColumn => () // landed above
      case r: TableChange.RenameColumn =>
        TxLog.renameColumn(t, r.fieldNames()(0), r.newName())
      case d: TableChange.DeleteColumn =>
        TxLog.dropColumn(t, d.fieldNames()(0))
      case p: TableChange.SetProperty =>
        TxLog.setTableProperty(t, p.property(), p.value())
      case p: TableChange.RemoveProperty =>
        TxLog.unsetTableProperty(t, p.property())
      case other =>
        throw new UnsupportedOperationException(
          s"unsupported ALTER TABLE change: $other")
    }
    new GraftTxTable(t, None)
  }

  /** `DROP TABLE graft.`t`` — deletes the table's engine-owned
    * artifacts (log, sidecars, referenced data files) and nothing
    * else; also Spark's failure-cleanup hook for non-atomic CTAS
    * (without it a failed CTAS would brick the name behind its empty
    * v0 commit). Returns false for a nonexistent table. */
  override def dropTable(ident: Identifier): Boolean = {
    val t = tablePath(ident)
    if (TxLog.latestVersion(t).isEmpty) false
    else { TxLog.dropTable(t); true }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported; move the table directory")
}

private[graftx] object GraftCatalog {

  /** `PARTITIONED BY` / `CLUSTER BY` → the layout-clustering columns
    * (TxLog tables cluster by range/z-order layout realized by
    * OPTIMIZE, never hive directories); non-identity transforms
    * refuse loudly. */
  def clusterColsOf(schema: StructType,
      partitions: Array[Transform]): Seq[String] = {
    val cols: Seq[String] = partitions.toSeq.flatMap {
      case c: org.apache.spark.sql.connector.expressions.ClusterByTransform =>
        c.columnNames.map(_.fieldNames().mkString("."))
      case t if t.name() == "identity" =>
        t.references().map(_.fieldNames().mkString("."))
      case other => throw new UnsupportedOperationException(
        s"unsupported partition transform '$other': graft tables " +
          "cluster by layout — use PARTITIONED BY (cols) / CLUSTER BY " +
          "(cols), realized by CALL graft.system.optimize")
    }
    cols.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"clustering column $c is not in the table schema")
      require(!c.contains("."),
        s"clustering supports top-level columns only; got $c")
    }
    cols
  }

  /** LOCATION/EXTERNAL would be silently wrong to accept: a graft
    * table LIVES at its identifier path. Refuse loudly (the catalog's
    * refuse-don't-half-apply posture) instead of landing the table at
    * the identifier path with the clause ignored. */
  def refuseLocation(properties: util.Map[String, String]): Unit =
    require(!properties.containsKey("location") &&
        !properties.containsKey("external"),
      "CREATE TABLE ... LOCATION/EXTERNAL is not supported: a graft " +
        "table lives at its identifier path — name it graft.`/the/dir`")

  /** The `startingVersion` / `startingTimestamp` reader options
    * resolved to ONE starting commit version (Delta's pair: a
    * timestamp resolves to the first commit AT OR AFTER it, in the
    * engine's UTC wall-clock contract). Both set at once refuses
    * loudly; a timestamp past the log's end likewise. */
  def startVersionOf(path: String,
      options: CaseInsensitiveStringMap): Option[Long] = {
    val sv = Option(options.get("startingVersion")).map(_.toLong)
    val st = Option(options.get("startingTimestamp"))
    require(sv.isEmpty || st.isEmpty,
      "set either startingVersion or startingTimestamp, not both")
    sv.orElse(st.map { s =>
      val ms = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      TxLog.versionAtOrAfter(path, ms).getOrElse(
        throw new IllegalArgumentException(
          s"startingTimestamp $s is after the last commit of $path"))
    })
  }

  /** Record the clustering property and the statement's
    * user-addressable TBLPROPERTIES (Spark stuffs reserved entries —
    * owner, provider, clusteringColumns — into the map). */
  def applyTableMeta(t: String, clusterCols: Seq[String],
      properties: util.Map[String, String]): Unit = {
    if (clusterCols.nonEmpty)
      TxLog.setTableProperty(t, TxLog.LayoutClusterProp,
        clusterCols.mkString(","))
    properties.asScala.foreach { case (k, v) =>
      if (!k.startsWith("option.") && k != "owner" && k != "provider" &&
        k != "clusteringColumns")
        TxLog.setTableProperty(t, k, v)
    }
  }
}

/** One staged `[CREATE OR] REPLACE TABLE [AS SELECT]` statement
  * (returned by [[GraftCatalog.stageCreate]] and friends): the
  * query's rows flow through the standard `TxLog.write(…,
  * "overwrite")` — executors stage, the driver lands ONE commit
  * carrying the new schema AND the new files, so visibility is
  * atomic by the log's own contract (a fresh table's v0, or version
  * n+1 of a replaced table with every prior version still
  * time-travelable). A plain REPLACE (no AS) commits an EMPTY
  * overwrite with the declared schema at `commitStagedChanges`.
  *
  * REPLACE resets the unversioned metadata sidecars (properties,
  * CHECK constraints, generated columns, bloom registry+sidecars) —
  * Delta's REPLACE resets metadata the same way — and it must happen
  * BEFORE the data write: the OLD table's constraints and generation
  * rules must not gate or rewrite the NEW table's rows. Sidecars are
  * documented-unversioned state, so a replace that fails mid-query
  * may have reset them already (the data, schema and history are
  * untouched in that case — the commit never landed).
  *
  * `abortStagedChanges` is a no-op by construction: either the single
  * commit landed (a complete, consistent table) or nothing did. */
private[graftx] class GraftStagedTable(path: String, declared: StructType,
    clusterCols: Seq[String], props: util.Map[String, String],
    replace: Boolean) extends StagedTable with SupportsWrite {

  @volatile private var wrote = false
  @volatile private var metaReset = false

  private def resetOnce(): Unit =
    if (replace && !metaReset) { TxLog.resetTableMetadata(path); metaReset = true }

  // must stay a parseable identifier: Spark's overwrite analysis runs
  // the name through its attribute parser for error rendering
  override def name(): String = s"graft.`$path`"

  override def schema(): StructType = declared

  override def capabilities(): util.Set[TableCapability] =
    // TRUNCATE: an RTAS write arrives as OverwriteByExpression(true)
    Set(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // the staged write IS the replace — truncate-vs-append carries
      // no extra signal, every staged statement lands one overwrite
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: sources.InsertableRelation =
          (data, _) => {
            resetOnce()
            TxLog.write(data, path, "overwrite")
            wrote = true
            ()
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    if (!wrote) {
      // plain [CREATE OR] REPLACE TABLE: an empty overwrite commit
      // carrying the declared schema — history preserved
      resetOnce()
      val spark = SparkSession.active
      TxLog.write(
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          declared),
        path, "overwrite")
      ()
    }
    GraftCatalog.applyTableMeta(path, clusterCols, props)
  }

  override def abortStagedChanges(): Unit = ()
}

/** The DESCRIBE HISTORY surface as a catalog-queryable METADATA TABLE
  * — `SELECT * FROM graft.`/path/t`.history` (Iceberg's `table.history`
  * shape): one row per commit with its mode, micro-batch id, add/remove
  * file counts, whether it recorded a schema, and the in-commit
  * timestamp (the clock `TIMESTAMP AS OF` resolves against). Read-only;
  * audit tooling needs no `CALL`. Log metadata only — O(commits) rows
  * collected through the same bounded [[GraftProcedures.scanOf]] the
  * procedure surface uses (never data-proportional). */
private[graftx] class GraftHistoryTable(table: String)
    extends Table with SupportsRead {

  override def name(): String = s"graft.`$table`.history"

  override def schema(): StructType =
    TxLog.historySchema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    () => GraftProcedures.scanOf(
      TxLog.history(SparkSession.active, table))
}

/** One pinned TxLog snapshot as a DSv2 table: reads delegate to
  * Spark's ParquetTable over the pinned file list; writes and DELETE
  * go through the transactional log (refused on a time-travel pin —
  * history is immutable). */
private[graftx] class GraftTxTable(path: String, asOf: Option[Long])
    extends Table with SupportsRead with SupportsWrite
    with SupportsDeleteV2 with SupportsMetadataColumns
    with SupportsRowLevelOperations {

  // pinned at load: one SQL statement = one consistent snapshot.
  // Resolve ONE version first and read files/schema/dv/mapping all AS
  // OF that version (r16 ADVICE): they are four separate log replays,
  // and a rewrite landing between a current-state liveFiles and a
  // current-state dvAt would leave a tombstoned file in the pin with
  // its mask gone — dv-deleted rows served back to the query.
  private val pinVersion: Option[Long] =
    asOf.orElse(TxLog.latestVersion(path))
  private val pinnedFiles: Seq[String] = TxLog.liveFiles(path, pinVersion)
  private val pinnedDdl: String = TxLog.schemaAt(path, pinVersion)
  // deletion-vector masks pinned WITH the snapshot: masked files
  // route through GraftFileScan, whose one-file-per-task readers skip
  // masked row positions executor-side (mask bytes never leave the
  // task) — SQL serves merge-on-read tables directly, no OPTIMIZE
  // materialization required
  private val pinnedDv: Map[String, (String, Long)] = {
    val m = TxLog.dvAt(path, pinVersion)
    val live = pinnedFiles.toSet
    m.filter(kv => live(kv._1))
  }
  // column mapping: reads route through GraftFileScan with the
  // logical→physical indirection; INSERT/DELETE go through TxLog
  // (which maps at stage time).
  private val colMap: Map[String, String] =
    TxLog.colMapAt(path, pinVersion)._1

  override def name(): String =
    s"graft.`$path`" + asOf.fold("")(v => s" VERSION AS OF $v")

  /** `SHOW TBLPROPERTIES graft.`t`` serves the property sidecar.
    * Properties are the one UN-versioned piece of table state (a
    * sidecar, not a commit), so a time-travel pin still shows the
    * CURRENT values — said in-band via a note entry rather than
    * implying the sidecar is part of the versioned snapshot. */
  override def properties(): util.Map[String, String] = {
    val cur = TxLog.tableProps(path)
    (if (asOf.isEmpty) cur
     else cur + ("graft.properties.note" ->
       ("table properties are unversioned; values shown are current, " +
         "not as-of the pinned version"))).asJava
  }

  // the LOG-recorded schema, nullability relaxed exactly as
  // TxLog.snapshot reads it (evolution null-fills old files)
  override def schema(): StructType =
    if (pinnedDdl.isEmpty) new StructType()
    else StructType(StructType.fromDDL(pinnedDdl)
      .fields.map(_.copy(nullable = true)))

  override def capabilities(): util.Set[TableCapability] =
    // AUTOMATIC_SCHEMA_EVOLUTION backs `MERGE WITH SCHEMA EVOLUTION`:
    // the analyzer computes the AddColumn changes from the source
    // schema and lands them through alterTable (the metadata-only
    // additive evolve), then re-resolves against the widened table.
    // MICRO_BATCH_READ backs `spark.readStream.table("graft.`t`")` and
    // STREAMING_WRITE backs `df.writeStream.toTable("graft.`t`")` —
    // the reference's Delta streaming pair (REF STREAM:199-220); see
    // GraftMicroBatchStream / GraftStreamingWrite.
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION).asJava

  private def spark: SparkSession = SparkSession.active

  private def delegateOver(fs: Seq[String]) = ParquetTable(
    name(), spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
    CaseInsensitiveStringMap.empty(),
    fs.map(f =>
      java.nio.file.Paths.get(path, f).toAbsolutePath.toString),
    Some(schema()), classOf[ParquetFileFormat])

  private lazy val delegate = delegateOver(pinnedFiles)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDelegatingScanBuilder(delegate.newScanBuilder(options),
      path, pinnedFiles, pinnedDdl, colMap, pinnedDv,
      canStream = asOf.isEmpty,
      // streaming rate limit (reader option): commits per micro-batch
      maxVersionsPerTrigger =
        Option(options.get("maxVersionsPerTrigger")).map(_.toLong),
      // streaming tail-only start (reader options, Delta's names):
      // skip the initial snapshot, consume appends from this version
      // (or the first commit at/after this timestamp) on
      startingVersion = GraftCatalog.startVersionOf(path, options),
      // data skipping (round 17): the user's pin gates the bloom tier;
      // the rebuild hook serves a stats-narrowed parquet delegate
      asOf = asOf,
      delegateFor = fs => delegateOver(fs).newScanBuilder(options))

  /** Per-row provenance: `SELECT _file, _pos, ... FROM graft.`t``
    * names the table file each row lives in and its original
    * within-file row index — `_file` is the group handle the COW SQL
    * DML path prunes rewrites with; (`_file`, `_pos`) is the row id
    * the merge-on-read delta path addresses deletion vectors with. */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(
      new MetadataColumn {
        override def name(): String = GraftRowLevel.FileCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        // NON-nullable, deliberately: Spark's RewriteRowLevelCommand
        // REFUSES nullable row-id attributes, and (_file, _pos) is
        // the merge-on-read row id. MERGE NOT MATCHED rows carry NULL
        // _file only inside the rewrite plan, where Spark handles the
        // metadata attribute's nullability itself (same posture as
        // Iceberg's required _file/_pos columns).
        override def isNullable: Boolean = false
        override def comment(): String =
          "name of the table file the row lives in"
      },
      new MetadataColumn {
        override def name(): String = GraftRowLevel.PosCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = false
        override def comment(): String =
          "original (pre-mask) row index within the row's file"
      })

  /** SQL UPDATE / MERGE INTO / non-translatable DELETE: group-based
    * copy-on-write by default ([[GraftRowLevelOperation]]), or the
    * deletion-vector delta path ([[GraftMorOperation]]) when the
    * table sets `write.dml.mode = merge-on-read` — same statements,
    * same results, different write-amplification class. Refused on
    * time-travel pins (history is immutable) and on stream-source
    * tables (append-only contract) — loudly, before any work runs. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(asOf.isEmpty,
      s"cannot run ${info.command} against a time-travel pin of $path " +
        s"— history is immutable")
    require(!TxLog.isStreamSource(path),
      s"$path serves as a streaming source (append-only): row-level " +
        s"${info.command} is not allowed")
    if (TxLog.isMorDml(path))
      () => new GraftMorOperation(path, pinnedFiles, pinnedDdl,
        info.command, colMap, pinnedDv)
    else
      () => new GraftRowLevelOperation(path, pinnedFiles, pinnedDdl,
        info.command, colMap, pinnedDv)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty,
      s"cannot write to a time-travel pin of $path — history is immutable")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: sources.InsertableRelation =
          (data, _) => {
            TxLog.write(data, path,
              if (overwrite) "overwrite" else "append")
            ()
          }
        /** `df.writeStream.toTable("graft.`t`")` — per-epoch atomic
          * append commits with the (queryId, epochId) exactly-once
          * ledger; see [[GraftStreamingWrite]]. */
        override def toStreaming: org.apache.spark.sql.connector.write
            .streaming.StreamingWrite = {
          require(!overwrite,
            s"streaming into graft.`$path` supports the APPEND output " +
              s"mode only — complete/update would replace rows " +
              s"consumers already saw")
          new GraftStreamingWrite(path, info.schema(), info.queryId(),
            colMap)
        }
      }
    }
  }

  /** Only predicates fully translatable to a Column are accepted —
    * Spark then refuses the DELETE at analysis instead of this table
    * half-applying it. */
  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    asOf.isEmpty &&
      predicates.forall(p =>
        PredicateUtils.toV1(p).flatMap(toColumn).isDefined)

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    require(asOf.isEmpty,
      s"cannot delete from a time-travel pin of $path — history is " +
        s"immutable")
    val cond = predicates.toSeq
      .map(p => toColumn(PredicateUtils.toV1(p).getOrElse(
        throw new UnsupportedOperationException(
          s"untranslatable DELETE predicate: $p"))).getOrElse(
        throw new UnsupportedOperationException(
          s"untranslatable DELETE predicate: $p")))
      .reduceOption(_ && _).getOrElse(lit(true))
    // COW by default; the merge-on-read table property routes the
    // translatable DELETE through deletion vectors too
    if (TxLog.isMorDml(path)) TxLog.deleteVectored(spark, path, cond)
    else TxLog.delete(spark, path, cond)
    ()
  }

  /** V1 `Filter` → `Column`, SQL semantics preserved (EqualTo never
    * matches NULL; TxLog.delete keeps NULL-condition rows). */
  private def toColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case sources.Not(c) => toColumn(c).map(!_)
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
