package org.apache.spark.sql.graftx

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.TxLog

/** The `CALL graft.system.<proc>(...)` maintenance surface — DSv2
  * stored procedures (the mechanism Iceberg ships its table
  * maintenance through; Delta spells the same ops OPTIMIZE/VACUUM/
  * RESTORE statements). One procedure per TxLog maintenance
  * operation, so a pure-SQL operator needs no Scala at all:
  *
  *   CALL graft.system.optimize('/path/t', 8)
  *   CALL graft.system.zorder('/path/t', 'user_id', 'ts', 16)
  *   CALL graft.system.vacuum('/path/t', 168)
  *   CALL graft.system.checkpoint('/path/t')
  *   CALL graft.system.restore('/path/t', 3)
  *   CALL graft.system.clone_table('/src/t', '/dst/t')
  *   CALL graft.system.rename_column('/path/t', 'a', 'b')
  *   CALL graft.system.drop_column('/path/t', 'a')
  *
  * Each returns one summary row (version landed / files / reclaimed
  * count) through a [[LocalScan]]. Loud failures surface as the
  * statement's error, never half-applied — every procedure body is
  * one TxLog call with its own atomicity. */
private[graftx] object GraftProcedures {

  private def p(n: String, t: DataType) = ProcedureParameter.in(n, t).build()
  private def pd(n: String, t: DataType, d: String) =
    ProcedureParameter.in(n, t).defaultValue(d).build()

  private abstract class Proc(procName: String, doc: String,
      params: Seq[ProcedureParameter], outCols: Seq[(String, DataType)])
      extends UnboundProcedure with BoundProcedure {
    private val out = outCols.foldLeft(new StructType()) {
      case (s, (n, t)) => s.add(n, t, nullable = false)
    }
    override def name(): String = procName
    override def description(): String = doc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    protected def spark: SparkSession = SparkSession.active
    protected def run(in: InternalRow): Seq[Any]
    override def call(in: InternalRow): java.util.Iterator[Scan] = {
      val vals = run(in).map {
        case s: String => UTF8String.fromString(s)
        case v => v
      }
      val row = InternalRow.fromSeq(vals)
      Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = out
      }).iterator()
    }
  }

  private def str(in: InternalRow, i: Int): String =
    in.getUTF8String(i).toString

  /** A bounded DataFrame (history / detail — O(commits) rows, log
    * metadata only) as a LocalScan — shared by the `DfProc` procedures
    * and the `graft.`t`.history` metadata table. */
  private[graftx] def scanOf(df: org.apache.spark.sql.DataFrame): Scan = {
    val schema = df.schema
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(schema)
    val out = df.collect().map(r => conv(r).asInstanceOf[InternalRow])
    new LocalScan {
      override def rows(): Array[InternalRow] = out
      override def readSchema(): StructType = schema
    }
  }

  /** Procedures whose result is a row SET rather than a summary row. */
  private abstract class DfProc(procName: String, doc: String,
      params: Seq[ProcedureParameter])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = doc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    protected def spark: SparkSession = SparkSession.active
    protected def run(in: InternalRow): org.apache.spark.sql.DataFrame
    override def call(in: InternalRow): java.util.Iterator[Scan] =
      Collections.singletonList[Scan](scanOf(run(in))).iterator()
  }

  val all: Map[String, UnboundProcedure] = Seq[Proc](
    new Proc("optimize",
      "compact the live set to ~target_files as one overwrite commit, " +
        "clustered on the table's recorded PARTITIONED BY / CLUSTER BY " +
        "columns when present",
      Seq(p("table", StringType), pd("target_files", IntegerType, "8")),
      Seq("version" -> LongType, "files" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val t = str(in, 0)
        val v = TxLog.optimizeClustered(spark, t,
          targetFiles = in.getInt(1))
        Seq(v, TxLog.liveFiles(t).size.toLong)
      }
    },
    new Proc("zorder",
      "OPTIMIZE ZORDER BY (dim_a, dim_b): interleaved-bit clustering",
      Seq(p("table", StringType), p("dim_a", StringType),
        p("dim_b", StringType), pd("target_files", IntegerType, "16")),
      Seq("version" -> LongType, "files" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val t = str(in, 0)
        val v = TxLog.compactZOrdered(spark, t, str(in, 1), str(in, 2),
          in.getInt(3))
        Seq(v, TxLog.liveFiles(t).size.toLong)
      }
    },
    new Proc("vacuum",
      "reclaim unreferenced files older than retain_hours (default 7 days)",
      Seq(p("table", StringType), pd("retain_hours", IntegerType, "168")),
      Seq("reclaimed" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = Seq(
        TxLog.vacuum(str(in, 0),
          retainMs = in.getInt(1).toLong * 3600L * 1000L).toLong)
    },
    new Proc("checkpoint",
      "land a metadata-only checkpoint commit; readers replay O(tail)",
      Seq(p("table", StringType)),
      Seq("version" -> LongType)) {
      def run(in: InternalRow): Seq[Any] =
        Seq(TxLog.checkpointLog(str(in, 0)))
    },
    new Proc("restore",
      "RESTORE TABLE ... TO VERSION AS OF v (a new commit; history intact)",
      Seq(p("table", StringType), p("version", LongType)),
      Seq("version" -> LongType)) {
      def run(in: InternalRow): Seq[Any] =
        Seq(TxLog.restore(str(in, 0), in.getLong(1)))
    },
    new Proc("clone_table",
      "zero-copy clone: hard-linked live files, carried stats/masks/" +
        "mapping/constraints, independent history",
      Seq(p("source", StringType), p("target", StringType)),
      Seq("version" -> LongType, "files" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val dst = str(in, 1)
        val v = TxLog.cloneTable(spark, str(in, 0), dst)
        Seq(v, TxLog.liveFiles(dst).size.toLong)
      }
    },
    new Proc("rename_column",
      "ALTER TABLE ... RENAME COLUMN: metadata-only via column mapping",
      Seq(p("table", StringType), p("from", StringType),
        p("to", StringType)),
      Seq("version" -> LongType)) {
      def run(in: InternalRow): Seq[Any] =
        Seq(TxLog.renameColumn(str(in, 0), str(in, 1), str(in, 2)))
    },
    new Proc("drop_column",
      "ALTER TABLE ... DROP COLUMN: metadata-only via column mapping",
      Seq(p("table", StringType), p("column", StringType)),
      Seq("version" -> LongType)) {
      def run(in: InternalRow): Seq[Any] =
        Seq(TxLog.dropColumn(str(in, 0), str(in, 1)))
    },
    new Proc("add_constraint",
      "ALTER TABLE ... ADD CONSTRAINT: a named CHECK predicate every " +
        "future write must satisfy (existing rows validated first)",
      Seq(p("table", StringType), p("name", StringType),
        p("expr", StringType)),
      Seq("constraints" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val t = str(in, 0)
        TxLog.addConstraint(spark, t, str(in, 1), str(in, 2))
        Seq(TxLog.constraints(t).size.toLong)
      }
    },
    new Proc("drop_constraint",
      "ALTER TABLE ... DROP CONSTRAINT",
      Seq(p("table", StringType), p("name", StringType)),
      Seq("constraints" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val t = str(in, 0)
        TxLog.dropConstraint(t, str(in, 1))
        Seq(TxLog.constraints(t).size.toLong)
      }
    },
    new Proc("add_generated_column",
      "mark an existing column GENERATED ALWAYS AS (expr): computed " +
        "when a write omits it, validated when supplied",
      Seq(p("table", StringType), p("name", StringType),
        p("expr", StringType)),
      Seq("generated" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val t = str(in, 0)
        TxLog.addGeneratedColumn(spark, t, str(in, 1), str(in, 2))
        Seq(TxLog.generatedCols(t).size.toLong)
      }
    },
    new Proc("drop_generated_column",
      "unregister a generated column (the data column stays)",
      Seq(p("table", StringType), p("name", StringType)),
      Seq("generated" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val t = str(in, 0)
        TxLog.dropGeneratedColumn(t, str(in, 1))
        Seq(TxLog.generatedCols(t).size.toLong)
      }
    },
    new Proc("add_bloom_index",
      "register + backfill a per-file bloom index on a BIGINT/STRING " +
        "column: point-lookup pruning where min/max stats cannot help",
      Seq(p("table", StringType), p("column", StringType),
        pd("expected_items", LongType, "1000000"),
        pd("fpp", org.apache.spark.sql.types.DoubleType, "0.01")),
      Seq("indexed_columns" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val t = str(in, 0)
        TxLog.addBloomIndex(spark, t, str(in, 1), in.getLong(2),
          in.getDouble(3))
        Seq(TxLog.bloomCols(t).size.toLong)
      }
    },
    new Proc("drop_bloom_index",
      "unregister a bloom index and reclaim its sidecars",
      Seq(p("table", StringType), p("column", StringType)),
      Seq("indexed_columns" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val t = str(in, 0)
        TxLog.dropBloomIndex(t, str(in, 1))
        Seq(TxLog.bloomCols(t).size.toLong)
      }
    },
    new Proc("set_table_property",
      "set one table property (e.g. write.dml.mode = merge-on-read)",
      Seq(p("table", StringType), p("key", StringType),
        p("value", StringType)),
      Seq("properties" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val t = str(in, 0)
        TxLog.setTableProperty(t, str(in, 1), str(in, 2))
        Seq(TxLog.tableProps(t).size.toLong)
      }
    },
    new Proc("unset_table_property",
      "remove one table property",
      Seq(p("table", StringType), p("key", StringType)),
      Seq("properties" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val t = str(in, 0)
        TxLog.unsetTableProperty(t, str(in, 1))
        Seq(TxLog.tableProps(t).size.toLong)
      }
    },
    new Proc("changes_view",
      "register the change data feed over (from_version, to_version] " +
        "as a temp view — the rows stay DISTRIBUTED (a CDF window is " +
        "data-proportional; a procedure result would collect it)",
      Seq(p("table", StringType), p("view", StringType),
        p("from_version", LongType), pd("to_version", LongType, "-1")),
      Seq("rows" -> LongType)) {
      def run(in: InternalRow): Seq[Any] = {
        val to = in.getLong(3)
        val df = TxLog.changes(spark, str(in, 0), in.getLong(2),
          if (to < 0) None else Some(to))
        df.createOrReplaceTempView(str(in, 1))
        Seq(df.count())
      }
    }
  ).map(x => x.name() -> (x: UnboundProcedure)).toMap ++ Seq[DfProc](
    new DfProc("history",
      "DESCRIBE HISTORY: one row per commit (log metadata only)",
      Seq(p("table", StringType))) {
      def run(in: InternalRow) = TxLog.history(spark, str(in, 0))
    },
    new DfProc("describe_detail",
      "DESCRIBE DETAIL: live/tombstoned sizes, versions, checkpoint, " +
        "constraint count, stream-source flag (log + file metadata)",
      Seq(p("table", StringType))) {
      def run(in: InternalRow) = TxLog.detail(spark, str(in, 0))
    },
    new DfProc("vacuum_dry_run",
      "the files vacuum WOULD reclaim — audit before the " +
        "irreversible maintenance, deletes nothing",
      Seq(p("table", StringType))) {
      def run(in: InternalRow) = {
        val s = spark
        import s.implicits._
        TxLog.vacuumDryRun(str(in, 0)).toDF("file")
      }
    }
  ).map(x => x.name() -> (x: UnboundProcedure)).toMap

  def load(ident: Identifier): UnboundProcedure =
    all.getOrElse(ident.name(),
      throw new RuntimeException(
        s"no such procedure: graft.${ident.namespace().mkString(".")}." +
          s"${ident.name()} — available: ${all.keys.toSeq.sorted.mkString(", ")}"))

  def list(): Array[Identifier] =
    all.keys.toSeq.sorted
      .map(n => Identifier.of(Array("system"), n)).toArray
}
