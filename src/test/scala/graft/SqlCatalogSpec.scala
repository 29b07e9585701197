package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** The DSv2 catalog over TxLog (`graft.` identifiers): plain SQL
  * reads with pushdown, SQL time travel by version and timestamp,
  * INSERT INTO/OVERWRITE as transactional commits, DELETE FROM
  * through the COW row op, SQL ≡ Scala API on every surface, and the
  * loud deletion-vector boundary. */
class SqlCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def seed(t: String): Unit = {
    TxLog.write(
      spark.range(100).select(col("id"), (col("id") % 10).as("grp"))
        .repartitionByRange(4, col("id")),
      t, "overwrite")
    ()
  }

  test("SELECT through the catalog equals the Scala snapshot, with pushdown") {
    val t = tmp("cat_read")
    seed(t)
    val viaSql = spark.sql(s"SELECT id, grp FROM graft.`$t` WHERE id >= 90")
    assert(ids(viaSql) == (90L to 99L))
    assert(viaSql.collect().map(_.getLong(1)).sorted.toSeq ==
      ids(TxLog.snapshot(spark, t).where(col("id") >= 90)
        .select(col("grp").as("id"))))
    // the filter reaches the parquet scan (DSv2 pushdown through the
    // delegated ParquetTable)
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual"),
      s"filter must push to the scan:\n$plan")
  }

  test("VERSION AS OF / TIMESTAMP AS OF resolve through the log") {
    val t = tmp("cat_tt")
    seed(t)                                                       // v0
    val afterV0 = System.currentTimeMillis()
    Thread.sleep(1100) // versionAt resolves on file-mtime (ms) order
    TxLog.write(Seq((1000L, 0L)).toDF("id", "grp"), t, "append")  // v1
    assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 0").count() == 100)
    assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 1").count() == 101)
    assert(spark.sql(s"SELECT * FROM graft.`$t`").count() == 101)
    val ts = new java.sql.Timestamp(afterV0).toString
    assert(spark.sql(
      s"SELECT * FROM graft.`$t` TIMESTAMP AS OF '$ts'").count() == 100)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 99").collect()
    }
  }

  test("INSERT INTO appends one commit; INSERT OVERWRITE resets") {
    val t = tmp("cat_ins")
    seed(t)
    spark.sql(s"INSERT INTO graft.`$t` VALUES (500, 5), (501, 6)")
    assert(TxLog.latestVersion(t).contains(1L))
    assert(TxLog.commits(t).last.mode == "append")
    assert(spark.sql(s"SELECT * FROM graft.`$t`").count() == 102)
    spark.sql(s"INSERT OVERWRITE graft.`$t` VALUES (1, 1)")
    assert(TxLog.commits(t).last.mode == "overwrite")
    assert(ids(spark.sql(s"SELECT id, grp FROM graft.`$t`")) == Seq(1L))
    // history stays readable
    assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 1").count() == 102)
  }

  test("DELETE FROM runs the COW row op; untouched files stay") {
    val t = tmp("cat_del")
    seed(t)
    val live0 = TxLog.liveFiles(t).toSet
    spark.sql(s"DELETE FROM graft.`$t` WHERE id >= 75 AND grp = 5")
    assert(ids(spark.sql(s"SELECT id, grp FROM graft.`$t`")) ==
      (0L to 99L).filterNot(i => i >= 75 && i % 10 == 5))
    assert(TxLog.commits(t).last.mode == "rewrite")
    // only the file(s) holding matches were rewritten
    assert(TxLog.liveFiles(t).toSet.intersect(live0).nonEmpty,
      "non-matching files must pass through untouched")
    // unconditional delete clears the table
    spark.sql(s"DELETE FROM graft.`$t`")
    assert(TxLog.liveFiles(t).isEmpty)
  }

  test("a deletion-vector-masked snapshot serves through SQL, masks applied") {
    val t = tmp("cat_dv")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 7L)
    TxLog.deleteVectored(spark, t, col("id") === 50L) // mask stacking
    // the masked snapshot is served directly — no OPTIMIZE needed —
    // and equals the Scala read and the set algebra
    val got = spark.sql(s"SELECT id, grp FROM graft.`$t`")
    assert(ids(got) == (0L to 99L).filterNot(i => i == 7L || i == 50L))
    assert(ids(got) == ids(TxLog.snapshot(spark, t)))
    // the owned scan serves it (masked files can't use the parquet
    // delegate), with the filter still pushed to unmasked readers
    val filtered = spark.sql(
      s"SELECT id FROM graft.`$t` WHERE id >= 40")
    assert(ids(filtered) ==
      (40L to 99L).filterNot(_ == 50L))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTxScan") && plan.contains("masked"),
      s"masked snapshots must route through the owned scan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(id,40)"),
      s"advisory pushdown must survive on the owned scan:\n$plan")
    // time travel: pre-mask version serves ALL rows, the mid-mask
    // version applies exactly its own mask
    assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 0").count() == 100)
    assert(ids(spark.sql(s"SELECT id, grp FROM graft.`$t` VERSION AS OF 1")) ==
      (0L to 99L).filterNot(_ == 7L))
    // _file/_pos provenance: the masked positions are absent, the
    // survivors carry their ORIGINAL row index
    val pos = spark.sql(
      s"SELECT id, _pos FROM graft.`$t` WHERE id IN (6, 7, 8)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!pos.contains(7L) && pos.contains(6L) && pos.contains(8L))
    assert(pos(8L) == pos(6L) + 2,
      s"survivors must keep PRE-mask positions, got $pos")
    // OPTIMIZE still materializes to a mask-free layout; same rows
    TxLog.compact(spark, t, targetFiles = 2)
    assert(ids(spark.sql(s"SELECT id, grp FROM graft.`$t`")) ==
      (0L to 99L).filterNot(i => i == 7L || i == 50L))
  }

  test("SQL row-level DML on a masked table: masks respected, conflicts caught") {
    val t = tmp("cat_dv_dml")
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 7L)
    // UPDATE through the COW path must NOT resurrect the masked row
    spark.sql(s"UPDATE graft.`$t` SET grp = 99 WHERE id IN (6, 7)")
    val got = spark.sql(s"SELECT id, grp FROM graft.`$t`").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(7L), "the masked row must stay deleted")
    assert(got(6L) == 99L && got.size == 99)
    // the rewrite dropped the replaced file's mask entry with it
    assert(TxLog.dvAt(t).isEmpty ||
      TxLog.dvAt(t).keySet.subsetOf(TxLog.liveFiles(t).toSet))
    // and DELETE FROM on a masked table sees only visible rows
    TxLog.deleteVectored(spark, t, col("id") === 20L)
    spark.sql(s"DELETE FROM graft.`$t` WHERE id >= 20 AND id < 25")
    assert(ids(spark.sql(s"SELECT id, grp FROM graft.`$t`")) ==
      (0L to 99L).filterNot(i => i == 7L || (i >= 20 && i < 25)))
  }

  test("writes and deletes against a time-travel pin are refused") {
    val t = tmp("cat_pin")
    seed(t)
    TxLog.write(Seq((1000L, 0L)).toDF("id", "grp"), t, "append")
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$t` VERSION AS OF 0 VALUES (1, 1)")
    }
    intercept[Exception] {
      spark.sql(s"DELETE FROM graft.`$t` VERSION AS OF 0 WHERE id = 1")
    }
    assert(spark.sql(s"SELECT * FROM graft.`$t`").count() == 101)
  }

  test("missing tables and bad versions surface as analysis errors") {
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.`/nonexistent/table`").collect()
    }
    val t = tmp("cat_missing")
    seed(t)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 'abc'").collect()
    }
  }

  test("CREATE TABLE / CTAS / ALTER TABLE run end-to-end through SQL") {
    val base = tmp("cat_ddl")
    val t = s"$base/t"
    // CREATE TABLE with TBLPROPERTIES: v0 records the schema, zero rows
    spark.sql(s"""CREATE TABLE graft.`$t` (id BIGINT, grp BIGINT)
      TBLPROPERTIES ('write.dml.mode'='merge-on-read')""")
    assert(TxLog.latestVersion(t).contains(0L))
    assert(spark.sql(s"SELECT * FROM graft.`$t`").count() == 0)
    assert(TxLog.tableProps(t) == Map("write.dml.mode" -> "merge-on-read"))
    intercept[Exception] { // double create refused
      spark.sql(s"CREATE TABLE graft.`$t` (x BIGINT)")
    }
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1, 10), (2, 20)")
    // ALTER ADD COLUMN: metadata-only evolve, old rows read NULL
    val mtime0 = TxLog.liveFiles(t).map(f =>
      Files.getLastModifiedTime(java.nio.file.Paths.get(t, f)).toMillis)
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMN note STRING")
    assert(TxLog.liveFiles(t).map(f => Files.getLastModifiedTime(
      java.nio.file.Paths.get(t, f)).toMillis) == mtime0,
      "ADD COLUMN must be metadata-only")
    spark.sql(s"INSERT INTO graft.`$t` VALUES (3, 30, 'x')")
    val got = spark.sql(s"SELECT id, note FROM graft.`$t`").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> None, 2L -> None, 3L -> Some("x")))
    // ALTER RENAME / SET / UNSET properties
    spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN grp TO grp2")
    assert(TxLog.snapshot(spark, t).columns.toSeq == Seq("id", "grp2", "note"))
    spark.sql(s"ALTER TABLE graft.`$t` SET TBLPROPERTIES ('a'='1')")
    assert(TxLog.tableProps(t).get("a").contains("1"))
    spark.sql(s"ALTER TABLE graft.`$t` UNSET TBLPROPERTIES ('a')")
    assert(!TxLog.tableProps(t).contains("a"))
    // CTAS — ATOMIC via the staging catalog (round 17): schema and
    // data land as ONE overwrite commit, so v0 IS the data and the
    // table is never visible half-created
    val c = s"$base/ctas"
    spark.sql(
      s"CREATE TABLE graft.`$c` AS SELECT id, grp2 FROM graft.`$t` WHERE id <= 2")
    assert(spark.sql(s"SELECT * FROM graft.`$c`").count() == 2)
    assert(spark.sql(s"SELECT * FROM graft.`$c` VERSION AS OF 0").count() == 2)
    assert(TxLog.commits(c).map(_.mode) == Seq("overwrite"))
    // non-identity partition transforms are refused loudly
    val e = intercept[Exception] {
      spark.sql(
        s"CREATE TABLE graft.`$base/p` (id BIGINT) PARTITIONED BY (bucket(4, id))")
    }
    assert(e.getMessage.contains("transform") ||
      e.getMessage.contains("cluster"))
  }

  test("PARTITIONED BY / CLUSTER BY record layout clustering; OPTIMIZE realizes it") {
    val base = tmp("cat_cluster")
    val t = s"$base/t"
    // PARTITIONED BY maps onto the layout property — never hive dirs
    spark.sql(
      s"CREATE TABLE graft.`$t` (id BIGINT, grp BIGINT) PARTITIONED BY (grp)")
    assert(TxLog.clusterColsOf(t) == Seq("grp"))
    // and round-trips through SHOW TBLPROPERTIES
    val props = spark.sql(s"SHOW TBLPROPERTIES graft.`$t`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.layout.cluster").contains("grp"))
    // a scattered insert prunes nothing; the default OPTIMIZE clusters
    // on the RECORDED column and the same lookup prunes
    spark.sql(s"INSERT INTO graft.`$t` SELECT id, id % 16 FROM range(1600)")
    spark.sql(s"CALL graft.system.optimize('$t', 8)")
    val (kept, total) =
      TxLog.pruneFilesWhere(t, Seq(TxLog.Pred.Eq("grp", 3L)))
    assert(total == 8 && kept.size < total,
      s"clustered layout must prune: ${kept.size}/$total")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t` WHERE grp = 3")
      .head().getLong(0) == 100L)
    // CLUSTER BY on CTAS records multiple dimensions
    val c = s"$base/c"
    spark.sql(s"CREATE TABLE graft.`$c` CLUSTER BY (id, grp) AS " +
      s"SELECT id, grp FROM graft.`$t`")
    assert(TxLog.clusterColsOf(c) == Seq("id", "grp"))
    // RENAME carries the spec; DROP removes the column from it
    spark.sql(s"ALTER TABLE graft.`$c` RENAME COLUMN grp TO g2")
    assert(TxLog.clusterColsOf(c) == Seq("id", "g2"))
    spark.sql(s"ALTER TABLE graft.`$c` DROP COLUMN g2")
    assert(TxLog.clusterColsOf(c) == Seq("id"))
    // a clustering column missing from the schema is refused at CREATE
    intercept[Exception] {
      spark.sql(
        s"CREATE TABLE graft.`$base/bad` (id BIGINT) PARTITIONED BY (nope)")
    }
  }

  test("DROP TABLE deletes engine artifacts; failed CTAS cleans itself up") {
    val base = tmp("cat_drop_ddl")
    val t = s"$base/t"
    spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT)")
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1), (2)")
    spark.sql(s"DROP TABLE graft.`$t`")
    assert(TxLog.latestVersion(t).isEmpty, "the log must be gone")
    // the name is reusable
    spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT, v BIGINT)")
    assert(spark.sql(s"SELECT * FROM graft.`$t`").columns.length == 2)
    spark.sql(s"DROP TABLE graft.`$t`")
    // a failed CTAS must not brick the name: Spark's cleanup path
    // drops the empty v0 table, so the retry succeeds
    val c = s"$base/ctas_fail"
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$c` AS SELECT raise_error('boom') AS x")
    }
    assert(TxLog.latestVersion(c).isEmpty,
      "a failed CTAS must leave no table behind")
    spark.sql(s"CREATE TABLE graft.`$c` AS SELECT 1L AS x")
    assert(spark.sql(s"SELECT * FROM graft.`$c`").count() == 1)
    // refusal posture: a directory without a commit log is never
    // deleted through this path
    val e = intercept[IllegalArgumentException] {
      TxLog.dropTable(tmp("cat_not_a_table"))
    }
    assert(e.getMessage.contains("no commit log"))
  }

  test("ADD COLUMN FIRST/AFTER is a metadata-only reorder; NOT NULL stays refused") {
    val base = tmp("cat_addcol_pos")
    val t = s"$base/t"
    spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1, 10)")
    def mtimes() = TxLog.liveFiles(t).map(f => Files.getLastModifiedTime(
      java.nio.file.Paths.get(t, f)).toMillis)
    val m0 = mtimes()
    // position is pure DDL metadata: parquet readers resolve columns
    // by NAME, so no file is touched wherever the column lands
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMN x BIGINT FIRST")
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMN y BIGINT AFTER id")
    assert(mtimes() == m0, "FIRST/AFTER must be metadata-only")
    assert(spark.sql(s"SELECT * FROM graft.`$t`").columns.toSeq ==
      Seq("x", "id", "y", "v"))
    // old rows null-fill wherever the column sits; new writes land
    // under the new order
    spark.sql(s"INSERT INTO graft.`$t` VALUES (5, 2, 6, 20)")
    val rows = spark.sql(s"SELECT x, id, y, v FROM graft.`$t` ORDER BY id")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(0) && rows(0).getLong(1) == 1L &&
      rows(0).isNullAt(2) && rows(0).getLong(3) == 10L)
    assert(rows(1).getLong(0) == 5L && rows(1).getLong(1) == 2L &&
      rows(1).getLong(2) == 6L && rows(1).getLong(3) == 20L)
    // NOT NULL is the one thing additive evolution cannot honor
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMN z BIGINT NOT NULL")
    }
    assert(e2.getMessage.contains("NOT NULL"))
    // AFTER a missing column is refused (analyzer or log — loudly)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMN w BIGINT AFTER nope")
    }
    // one statement, several positioned columns, ONE commit
    val v0 = TxLog.latestVersion(t).get
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (a BIGINT FIRST, " +
      s"b BIGINT AFTER a)")
    assert(TxLog.latestVersion(t).contains(v0 + 1))
    assert(spark.sql(s"SELECT * FROM graft.`$t`").columns.toSeq ==
      Seq("a", "b", "x", "id", "y", "v"))
  }

  test("duplicate-column checks are case-insensitive, like Spark resolution") {
    // r16 ADVICE: `Note` landing next to `note` would make every later
    // `SELECT note` an ambiguous-reference analysis error — refuse at
    // DDL time, the way Delta does
    val base = tmp("cat_ci_dup")
    val t = s"$base/t"
    spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT, note STRING)")
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMN Note STRING")
    }
    assert(e1.getMessage.contains("already exists"))
    // a pure case change of the SAME column is a legitimate rename
    // (Spark's analyzer blocks it at the SQL surface under
    // case-insensitive resolution; the Scala API honors it)
    TxLog.renameColumn(t, "note", "Note")
    assert(spark.sql(s"SELECT * FROM graft.`$t`").columns.toSeq ==
      Seq("id", "Note"))
    // renaming ANOTHER column onto a case-colliding name is refused
    val e2 = intercept[Exception] { TxLog.renameColumn(t, "id", "NOTE") }
    assert(e2.getMessage.contains("already exists"))
    // the exact self-rename no-op is refused too
    intercept[Exception] { TxLog.renameColumn(t, "Note", "Note") }
  }

  test("ADD COLUMNS lands every column in ONE commit, all-or-nothing") {
    val base = tmp("cat_addcols")
    val t = s"$base/t"
    spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT)")
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (a BIGINT, b STRING)")
    assert(TxLog.latestVersion(t).contains(1L),
      "two added columns must be one metadata commit, not two")
    assert(spark.sql(s"SELECT * FROM graft.`$t`").columns.toSeq ==
      Seq("id", "a", "b"))
    // a statement with one bad column adds NOTHING (validated whole)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (ok BIGINT, id BIGINT)")
    }
    assert(TxLog.latestVersion(t).contains(1L) &&
      !TxLog.schemaAt(t).contains("ok"),
      "a refused ADD COLUMNS must leave the table untouched")
  }

  test("CREATE TABLE ... LOCATION is refused loudly, never half-applied") {
    val base = tmp("cat_loc")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$base/t` (id BIGINT) LOCATION '$base/elsewhere'")
    }
    assert(e.getMessage.contains("LOCATION"))
    assert(TxLog.latestVersion(s"$base/t").isEmpty,
      "a refused CREATE must leave nothing behind")
  }

  test("properties on a time-travel pin carry the unversioned-state note") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val t = tmp("cat_props_pin")
    seed(t)
    TxLog.write(Seq((1000L, 0L)).toDF("id", "grp"), t, "append")
    TxLog.setTableProperty(t, "k", "v")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array.empty, t)
    assert(cat.loadTable(ident).properties().get("k") == "v")
    assert(!cat.loadTable(ident).properties()
      .containsKey("graft.properties.note"))
    val pinned = cat.loadTable(ident, "0").properties()
    assert(pinned.get("k") == "v")
    assert(pinned.get("graft.properties.note") != null,
      "an asOf pin must say in-band that properties are unversioned")
  }

  test("readStream.table serves the snapshot, then exactly the appended tail") {
    // the catalog micro-batch source (Delta's readStream.table twin):
    // offsets are commit versions, the immutable log is the only state
    val base = tmp("cat_stream")
    val t = s"$base/t"
    seed(t)                                                    // v0
    def drain(): Unit = {
      val q = spark.readStream.table(s"graft.`$t`")
        .where(col("id") % 2 === 0)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    def got(): Seq[Long] = ids(spark.read.parquet(s"$base/out"))
    assert(got() == (0L until 100L by 2))
    TxLog.write(Seq((1000L, 0L), (1001L, 1L), (1002L, 2L))
      .toDF("id", "grp"), t, "append")                         // v1
    drain() // consumes EXACTLY the tail
    assert(got() == ((0L until 100L by 2) ++ Seq(1000L, 1002L)))
    drain() // restart replays nothing (exactly-once)
    assert(got() == ((0L until 100L by 2) ++ Seq(1000L, 1002L)))
  }

  test("readStream.table applies dv masks in the snapshot; breaks loudly after") {
    val base = tmp("cat_stream_dv")
    val t = s"$base/t"
    seed(t)
    TxLog.deleteVectored(spark, t, col("id") === 4L) // pre-stream mask
    def drain(): Unit = {
      val q = spark.readStream.table(s"graft.`$t`")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(ids(spark.read.parquet(s"$base/out")) ==
      (0L to 99L).filterNot(_ == 4L),
      "the initial snapshot must serve the MASKED live set")
    // any non-append commit past the served offset fails the NEXT
    // batch loudly — never a silent skip (Delta without ignoreChanges)
    TxLog.delete(spark, t, col("id") === 10L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
  }

  test("readStream.table on a column-mapped table serves logical names") {
    val base = tmp("cat_stream_cm")
    val t = s"$base/t"
    seed(t)
    TxLog.renameColumn(t, "grp", "bucket") // metadata-only
    def drain(): Unit = {
      val q = spark.readStream.table(s"graft.`$t`")
        .where(col("bucket") === 3)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    // an append THROUGH the mapping streams in on the second drain
    TxLog.write(Seq((1003L, 3L)).toDF("id", "bucket"), t, "append")
    drain()
    val out = spark.read.parquet(s"$base/out")
    assert(out.columns.toSeq == Seq("id", "bucket"))
    assert(ids(out) == ((3L until 100L by 10) :+ 1003L))
  }

  test("writeStream.toTable lands per-epoch atomic commits, exactly once") {
    val base = tmp("cat_sink")
    val t = s"$base/t"
    spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT, grp BIGINT)")
    spark.range(100).select(col("id"), (col("id") % 10).as("grp"))
      .coalesce(2).write.parquet(s"$base/in")
    def drain(): Unit = {
      val q = spark.readStream
        .schema("id BIGINT, grp BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$base/in")
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"graft.`$t`")
      q.awaitTermination()
    }
    drain()
    assert(ids(spark.sql(s"SELECT id, grp FROM graft.`$t`")) == (0L to 99L))
    // one atomic append commit per micro-batch, the ledger riding each
    val cs = TxLog.commits(t)
    assert(cs.count(_.batchId >= 0) >= 2,
      s"per-epoch commits expected, got ${cs.map(_.batchId)}")
    drain() // restart: the (queryId, epochId) ledger replays nothing
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`")
      .head().getLong(0) == 100L)
    // no staging leftovers after the drains
    val stg = java.nio.file.Paths.get(t, "_staging")
    assert(!Files.isDirectory(stg) || {
      val s = Files.list(stg); try !s.iterator().hasNext finally s.close()
    }, "staged files must be promoted or cleaned")
    // THE PURE-CATALOG MEDALLION HOP: readStream.table → toTable,
    // zero engine-specific code on either end
    val silver = s"$base/silver"
    spark.sql(s"CREATE TABLE graft.`$silver` (id BIGINT, grp BIGINT)")
    def hop(): Unit = {
      val q = spark.readStream.table(s"graft.`$t`")
        .where(col("grp") === 3)
        .writeStream
        .option("checkpointLocation", s"$base/ckpt2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"graft.`$silver`")
      q.awaitTermination()
    }
    hop()
    hop() // nothing new streamed: no duplicates
    assert(ids(spark.sql(s"SELECT id, grp FROM graft.`$silver`")) ==
      (3L until 100L by 10))
    // complete output mode is refused loudly (append-only contract)
    val t3 = s"$base/t3"
    spark.sql(s"CREATE TABLE graft.`$t3` (grp BIGINT, cnt BIGINT)")
    val e = intercept[Exception] {
      val q = spark.readStream.schema("id BIGINT, grp BIGINT")
        .parquet(s"$base/in")
        .groupBy(col("grp")).agg(count(lit(1)).as("cnt"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", s"$base/ckpt3")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"graft.`$t3`")
      q.awaitTermination()
    }
    assert(e.getMessage.contains("APPEND") ||
      Option(e.getCause).exists(_.getMessage.contains("APPEND")))
  }

  test("maxVersionsPerTrigger bounds each micro-batch to N commits") {
    val base = tmp("cat_rate")
    val t = s"$base/t"
    seed(t)                                                       // v0
    val silver = s"$base/silver"
    spark.sql(s"CREATE TABLE graft.`$silver` (id BIGINT, grp BIGINT)")
    def drain(): Unit = {
      val q = spark.readStream
        .option("maxVersionsPerTrigger", "1")
        .table(s"graft.`$t`")
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"graft.`$silver`")
      q.awaitTermination()
    }
    drain() // the initial snapshot always lands whole (1 batch)
    (1 to 3).foreach { i =>
      TxLog.write(Seq((200L + i, 0L)).toDF("id", "grp"), t, "append")
    }
    drain() // the tail rate-limits to ONE COMMIT PER BATCH
    val sinkBatches = TxLog.commits(silver).count(_.batchId >= 0)
    assert(sinkBatches == 4,
      s"snapshot + 3 rate-limited tail batches expected, got $sinkBatches")
    assert(ids(spark.sql(s"SELECT id, grp FROM graft.`$silver`")) ==
      ((0L to 99L) ++ Seq(201L, 202L, 203L)))
  }

  test("the history metadata table serves DESCRIBE HISTORY from plain SQL") {
    val base = tmp("cat_hist")
    val t = s"$base/t"
    seed(t)                                                        // v0
    TxLog.write(spark.range(5).select(col("id"), col("id").as("grp"))
      .repartition(2), t, "append")                                // v1
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMN note STRING")    // v2
    TxLog.checkpointLog(t)                                         // v3
    val got = spark.sql(
      s"SELECT version, mode, n_adds, n_removes, schema_recorded " +
        s"FROM graft.`$t`.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got.map(x => (x._1, x._2)) ==
      Seq((0L, "overwrite"), (1L, "append"), (2L, "append"),
        (3L, "overwrite")))
    assert(got(1)._3 == 2L, "the v1 append must record 2 adds")
    assert(got(2)._3 == 0L && got(2)._5,
      "the DDL commit is metadata-only and schema-recording")
    // equals the Scala API row-for-row
    assert(spark.sql(s"SELECT * FROM graft.`$t`.history").collect()
      .toSeq.map(_.toString).sorted ==
      TxLog.history(spark, t).collect().toSeq.map(_.toString).sorted)
    // timestamps ride the same clock TIMESTAMP AS OF resolves on:
    // strictly positive and non-decreasing across versions
    val ts = spark.sql(
      s"SELECT commit_ts_ms FROM graft.`$t`.history ORDER BY version")
      .collect().map(_.getLong(0)).toSeq
    assert(ts.forall(_ > 0) && ts == ts.sorted)
    // filters and aggregation compose like any table
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`.history " +
      s"WHERE mode = 'append'").head().getLong(0) == 2L)
    // a missing base table still errors
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$base/nope`.history").collect()
    }
    // a REAL table named .../history wins over the metadata fallback
    val h = s"$base/t2/history"
    TxLog.write(spark.range(3).toDF("id"), h, "overwrite")
    assert(spark.sql(s"SELECT * FROM graft.`$h`").count() == 3)
  }

  test("concurrent DDL never loses a column or a table silently") {
    // two ALTER ADDs racing from a shared base: either both columns
    // land, or the loser fails loudly — never a silently dropped
    // column (the schema-unmoved reguard, verified as a property)
    val base = tmp("cat_ddl_race")
    val t = s"$base/t"
    spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT)")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq("c1", "c2").map { c =>
      val th = new Thread(() => {
        barrier.await()
        try TxLog.addColumn(t, c, "BIGINT")
        catch { case e: Throwable => errs.add(e); () }
      })
      th.start(); th
    }
    ts.foreach(_.join())
    val shape = TxLog.schemaAt(t)
    val have = Seq("c1", "c2").count(shape.contains)
    assert(have == 2 - errs.size,
      s"every successful ADD must be in the schema: $shape, errs=${errs.size}")
    errs.forEach(e => assert(
      e.getMessage.contains("concurrent schema change") ||
        e.getMessage.contains("append schema mismatch"), e.getMessage))
    // racing CREATEs: one wins, the loser errors — and the winner's
    // rows survive (no empty overwrite lands on top)
    val t2 = s"$base/t2"
    val barrier2 = new java.util.concurrent.CyclicBarrier(2)
    val errs2 = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val mk = (0 until 2).map { _ =>
      val th = new Thread(() => {
        barrier2.await()
        try TxLog.createTable(t2, "id BIGINT")
        catch { case e: Throwable => errs2.add(e); () }
      })
      th.start(); th
    }
    mk.foreach(_.join())
    assert(errs2.size == 1,
      s"exactly one CREATE must win, got ${errs2.size} errors")
    assert(TxLog.latestVersion(t2).contains(0L))
  }

  test("SHOW CREATE TABLE round-trips schema, clustering and dml mode") {
    val base = tmp("cat_sct")
    spark.sql(s"CREATE TABLE graft.`$base/t` (id BIGINT, v STRING) " +
      "CLUSTER BY (id) TBLPROPERTIES ('write.dml.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO graft.`$base/t` VALUES (1,'a'),(2,'b')")
    val stmt = spark.sql(s"SHOW CREATE TABLE graft.`$base/t`")
      .head().getString(0)
    // clustering surfaces as the layout property (the catalog's CLUSTER
    // BY spelling — realized by OPTIMIZE, not hive dirs), and the dml
    // mode carries; both must survive EXECUTING the emitted statement
    assert(stmt.contains("id BIGINT") && stmt.contains("v STRING"))
    assert(stmt.contains("'graft.layout.cluster' = 'id'"), stmt)
    assert(stmt.contains("'write.dml.mode' = 'merge-on-read'"), stmt)
    val stmt2 = stmt.replace(s"graft.`$base/t`", s"graft.`$base/t2`")
    spark.sql(stmt2)
    val shown = spark.sql(s"SHOW TBLPROPERTIES graft.`$base/t2`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("graft.layout.cluster").contains("id"))
    assert(shown.get("write.dml.mode").contains("merge-on-read"))
    // the re-created table is a real table: writes land, dml mode holds
    spark.sql(s"INSERT INTO graft.`$base/t2` VALUES (3,'c')")
    spark.sql(s"DELETE FROM graft.`$base/t2` WHERE id = 3")
    assert(spark.sql(s"SELECT * FROM graft.`$base/t2`").count() == 0)
    assert(graft.ingest.TxLog.liveFiles(s"$base/t2").size == 1,
      "merge-on-read DELETE must not rewrite the data file")
  }

  test("DESCRIBE TABLE EXTENDED lists metadata columns and properties") {
    val t = tmp("cat_dte")
    seed(t)
    TxLog.setTableProperty(t, "write.dml.mode", "merge-on-read")
    val rows = spark.sql(s"DESCRIBE TABLE EXTENDED graft.`$t`")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byName = rows.toMap
    assert(byName.get("id").contains("bigint"))
    assert(byName.get("grp").contains("bigint"))
    // the provenance/position metadata columns surface with their types
    assert(byName.get("_file").contains("string"))
    assert(byName.get("_pos").contains("bigint"))
    assert(byName("Table Properties").contains("write.dml.mode=merge-on-read"))
  }
}
