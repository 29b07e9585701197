package graft.ingest

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Jar-free transactional table log — the library's stand-in for the
  * reference's Delta Lake sink (REF STREAM:199-220 `writeStream
  * .format("delta")`, README:210), which is jar-blocked in this
  * environment. Same pattern as `ext/ImageCodec`: the blocked seam is
  * closed with an original implementation of the FORMAT'S essential
  * semantics rather than a stub — here: atomically versioned commits,
  * snapshot isolation for readers, time travel by version, and
  * exactly-once streaming ingest across restarts.
  *
  * Layout: `<table>/_txlog/<%010d-version>.txt` holds one commit each
  * (line format: `mode=append|overwrite`, `batch=<id|-1>`, then one
  * `add=<relative parquet file>` per data file); data files live flat
  * in `<table>/` under UUID-unique names. A snapshot at version V
  * replays commits 0..V in order — `overwrite` resets the live set,
  * `append` extends it. Overwrite never deletes bytes, so every
  * historical version stays readable until `vacuum`.
  *
  * Correctness properties, each spec-pinned (TxLogSpec):
  *  - **Atomic commit**: a commit becomes visible via one
  *    `ATOMIC_MOVE` rename of the complete log file; readers never
  *    see a partial commit, and a crash between data-file staging and
  *    commit leaves only orphaned data files (invisible to readers,
  *    reclaimed by `vacuum`), never a corrupt table.
  *  - **Optimistic version claim**: the rename fails if the version
  *    file exists, and the writer retries at the next version — two
  *    concurrent APPEND writers both land (in arbitrary order).
  *    Single-writer-per-table remains the deployment assumption for
  *    overwrite semantics (the reference runs one daily job —
  *    REF DAG:26), matching Delta's last-writer-wins there.
  *  - **Exactly-once streaming**: `streamSink` records the micro-batch
  *    id in the commit; a replayed batch (checkpoint committed but
  *    the foreachBatch write already done, or vice versa — the
  *    classic at-least-once failure window) is detected by id and
  *    skipped, so restart never duplicates rows.
  *
  * Scale posture: the log is metadata-only (bytes ∝ files per commit,
  * not rows); snapshot resolution reads the log sequentially on the
  * driver (fine into the tens of thousands of commits — compaction
  * into checkpoints would follow Delta's own design if ever needed)
  * and hands Spark a plain parquet file list, so reads keep full scan
  * parallelism, pushdown and pruning. */
object TxLog {

  private def logDir(table: String): Path = Paths.get(table, "_txlog")

  final case class Commit(version: Long, mode: String, batchId: Long,
    adds: Seq[String], schema: String = "")

  private def commitFile(table: String, v: Long): Path =
    logDir(table).resolve(f"$v%010d.txt")

  /** Snapshot a directory listing with the stream closed (Files.list
    * leaks a handle per call otherwise — a log poller would exhaust
    * fds). */
  private def ls(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.toArray.map(_.asInstanceOf[Path]).toSeq finally s.close()
  }

  /** All commits in version order (missing table → empty). */
  def commits(table: String): Seq[Commit] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return Seq.empty
    val files = ls(dir)
      .filter(_.getFileName.toString.matches("\\d{10}\\.txt")).sortBy(_.getFileName.toString)
    files.map { f =>
      val v = f.getFileName.toString.stripSuffix(".txt").toLong
      var mode = "append"; var batch = -1L; var schema = ""
      val adds = Seq.newBuilder[String]
      scala.io.Source.fromFile(f.toFile).getLines().foreach {
        case l if l.startsWith("mode=") => mode = l.stripPrefix("mode=")
        case l if l.startsWith("batch=") => batch = l.stripPrefix("batch=").toLong
        case l if l.startsWith("schema=") => schema = l.stripPrefix("schema=")
        case l if l.startsWith("add=") => adds += l.stripPrefix("add=")
        case _ => ()
      }
      Commit(v, mode, batch, adds.result(), schema)
    }
  }

  /** Claim the next version atomically; returns the version landed.
    * The complete record is written to a temp file first and renamed
    * in — a version collision (concurrent writer) retries upward. */
  private def writeCommit(table: String, mode: String, batchId: Long,
      adds: Seq[String], schema: String): Long = {
    Files.createDirectories(logDir(table))
    val body = (s"mode=$mode" +: s"batch=$batchId" +: s"schema=$schema" +:
      adds.map("add=" + _)).mkString("", "\n", "\n")
    var v = commits(table).lastOption.map(_.version + 1).getOrElse(0L)
    while (true) {
      val tmp = logDir(table).resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, body.getBytes("UTF-8"))
      try {
        Files.move(tmp, commitFile(table, v), StandardCopyOption.ATOMIC_MOVE)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); v += 1 // lost the race; retry above
      }
    }
    v
  }

  /** Batch ids already committed (the exactly-once ledger). */
  def committedBatches(table: String): Set[Long] =
    commits(table).map(_.batchId).filter(_ >= 0).toSet

  /** Write `df` as one transactional commit. Data files stage under a
    * UUID dir, move into the table under UUID-unique names, and become
    * visible only with the log rename. Returns the committed version;
    * a replayed `batchId` commits nothing and returns -1. */
  def write(df: DataFrame, table: String, mode: String = "append",
      batchId: Long = -1L): Long = {
    require(mode == "append" || mode == "overwrite", s"bad mode $mode")
    if (batchId >= 0 && committedBatches(table).contains(batchId)) return -1L
    // schema guard: an append whose schema differs from the table's
    // current one must fail at COMMIT time with the diff in hand —
    // letting it land would poison every later snapshot read with a
    // silent multi-schema union. Overwrite may change the schema (it
    // starts a fresh live set). The DDL lives in the log, so the check
    // costs one string compare, no file footer reads.
    val ddl = df.schema.toDDL.replace("\n", " ")
    if (mode == "append")
      commits(table).lastOption.filter(_.schema.nonEmpty).foreach { last =>
        require(last.schema == ddl,
          s"append schema mismatch:\n  table: ${last.schema}\n  batch: $ddl")
      }
    val staging = Paths.get(table, "_staging",
      java.util.UUID.randomUUID().toString)
    df.write.parquet(staging.toString)
    val parts = ls(staging)
      .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.getFileName.toString)
    val uuid = java.util.UUID.randomUUID().toString
    val adds = parts.zipWithIndex.map { case (p, i) =>
      val name = s"$uuid-$i.parquet"
      Files.move(p, Paths.get(table, name), StandardCopyOption.ATOMIC_MOVE)
      name
    }
    // staging leftovers (_SUCCESS, crc) are orphans below _staging —
    // never visible; vacuum reclaims them
    writeCommit(table, mode, batchId, adds.toSeq, ddl)
  }

  /** Live data files at `asOf` (default: latest). */
  def liveFiles(table: String, asOf: Option[Long] = None): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    commits(table).iterator
      .takeWhile(c => asOf.forall(c.version <= _))
      .foreach { c =>
        if (c.mode == "overwrite") live.clear()
        live ++= c.adds
      }
    live.toSeq
  }

  /** Snapshot read — latest by default, `asOf` for time travel. The
    * result is a plain parquet multi-file scan: full pushdown/pruning
    * apply. */
  def snapshot(spark: SparkSession, table: String,
      asOf: Option[Long] = None): DataFrame = {
    val files = liveFiles(table, asOf)
    require(files.nonEmpty,
      s"no live files in $table${asOf.fold("")(v => s" as of v$v")}")
    spark.read.parquet(files.map(f => s"$table/$f"): _*)
  }

  /** Latest committed version, if any. */
  def latestVersion(table: String): Option[Long] =
    commits(table).lastOption.map(_.version)

  /** Delete data files referenced by NO commit (failed-write orphans +
    * abandoned staging). Files removed from the live set by an
    * overwrite are KEPT — they back time travel; pass
    * `dropHistoryBefore` to also forget versions < that and delete
    * files only they referenced. Returns deleted count. */
  def vacuum(table: String, dropHistoryBefore: Long = 0L): Int = {
    val all = commits(table)
    if (dropHistoryBefore > 0)
      all.takeWhile(_.version < dropHistoryBefore)
        .foreach(c => Files.deleteIfExists(commitFile(table, c.version)))
    val kept = commits(table)
    val referenced = kept.flatMap(_.adds).toSet
    var n = 0
    val root = Paths.get(table)
    ls(root).foreach { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".parquet") && !referenced.contains(name)) {
        Files.delete(p); n += 1
      }
    }
    val staging = root.resolve("_staging")
    if (Files.isDirectory(staging)) {
      val w = Files.walk(staging)
      val all = try w.toArray.map(_.asInstanceOf[Path]).toSeq finally w.close()
      all.sortBy(-_.getNameCount).foreach { p =>
        if (Files.isRegularFile(p)) n += 1
        Files.deleteIfExists(p)
      }
    }
    n
  }

  /** Compaction (the OPTIMIZE analogue — and at 100 TB the essential
    * companion of a streaming sink: per-micro-batch commits accrete
    * thousands of small files, and scan cost follows file count, not
    * bytes): rewrite the CURRENT live set as one overwrite commit
    * with `targetFiles` parquet files. Content-neutral by
    * construction (the new commit holds exactly the old live rows);
    * history BEFORE the compaction stays time-travel-readable because
    * overwrite deletes no bytes. Returns the new version. */
  def compact(spark: SparkSession, table: String,
      targetFiles: Int = 1): Long = {
    val current = snapshot(spark, table)
    write(current.repartition(targetFiles), table, "overwrite")
  }

  /** Exactly-once streaming ingest: every micro-batch lands as one
    * transactional commit carrying its batch id; replays are skipped
    * by id. Stateless on the stream side — the ledger is the log. */
  def streamSink(df: DataFrame, table: String,
      checkpointDir: String): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        write(batch, table, "append", batchId = id); ()
      }
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Docs-stream → transactional table, end to end. */
  def runIngest(spark: SparkSession, inDir: String, table: String,
      checkpointDir: String): StreamingQuery =
    streamSink(graft.streaming.CorpusStream.source(spark, inDir),
      table, checkpointDir)
}
