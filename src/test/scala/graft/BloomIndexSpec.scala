package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.TxLog

/** Per-file bloom filter indexes: point-lookup pruning on
  * high-cardinality NON-clustered columns (where min/max stats are
  * useless), maintained per write, conservative by construction. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private def freshDir(p: String) = {
    val d = Files.createTempDirectory(p); Files.delete(d); d.toString
  }

  /** 8 files clustered on v — ids land hash-scattered, so every file
    * spans the whole id range and stats can never prune an id
    * lookup. */
  private def seed(t: String): Unit = {
    TxLog.write(
      spark.range(4000)
        .select(col("id"), (col("id") * 37 % 1000).as("v"),
          concat(lit("k"), col("id")).as("key"))
        .repartitionByRange(8, col("v")),
      t, "overwrite")
    ()
  }

  test("the index prunes a point lookup stats cannot, exactly") {
    val t = tmp("bf_prune")
    seed(t)
    // without the index: stats keep everything (scattered ids)
    val (kept0, total) =
      TxLog.pruneFilesWhere(t, Seq(TxLog.Pred.Eq("id", 42L)))
    assert(total == 8 && kept0.size == 8,
      "min/max stats must be useless on the scattered column")
    TxLog.addBloomIndex(spark, t, "id", expectedItems = 1000L)
    val (kept1, _) =
      TxLog.pruneFilesWhere(t, Seq(TxLog.Pred.Eq("id", 42L)))
    assert(kept1.size < 8, s"bloom must prune, kept ${kept1.size}")
    val got = TxLog.snapshotWhere(spark, t, Seq(TxLog.Pred.Eq("id", 42L)))
    assert(got.count() == 1 && got.head().getLong(0) == 42L)
    // absent value: possibly zero files — still exact (empty)
    assert(TxLog.snapshotWhere(spark, t,
      Seq(TxLog.Pred.Eq("id", 999999L))).count() == 0)
    // IN-set across files
    val in = TxLog.snapshotWhere(spark, t,
      Seq(TxLog.Pred.In("id", Seq(1L, 2000L, 3999L))))
    assert(in.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2000L, 3999L))
  }

  test("string columns index too; other types are refused") {
    val t = tmp("bf_types")
    seed(t)
    TxLog.addBloomIndex(spark, t, "key", expectedItems = 1000L)
    val got = TxLog.snapshotWhere(spark, t,
      Seq(TxLog.Pred.Eq("key", "k777")))
    assert(got.count() == 1 && got.head().getLong(0) == 777L)
    val (kept, total) =
      TxLog.pruneFilesWhere(t, Seq(TxLog.Pred.Eq("key", "k777")))
    assert(kept.size < total)
    val e = intercept[IllegalArgumentException] {
      TxLog.addBloomIndex(spark, t, "nope")
    }
    assert(e.getMessage.contains("no column"))
    // an int-typed column would hash differently than the Long probe
    val t2 = tmp("bf_int")
    TxLog.write(spark.range(10).select(col("id").cast("int").as("i")),
      t2, "overwrite")
    val e2 = intercept[IllegalArgumentException] {
      TxLog.addBloomIndex(spark, t2, "i")
    }
    assert(e2.getMessage.contains("BIGINT"))
  }

  test("executor-written sidecars are byte-identical to a driver-built filter") {
    // r16 review: the backfill used to collect every filter's bytes to
    // the driver (multi-GB at 100 TB — ~10⁶ files × KB filters ×
    // columns); tasks now write their own sidecars and the driver sees
    // a (file, byte-count) census. Bloom insertion is bit-OR —
    // order-independent for a fixed (items, fpp) sizing — so the bytes
    // must equal a filter built locally over the same values.
    val t = tmp("bf_bytes")
    seed(t)
    TxLog.addBloomIndex(spark, t, "id", expectedItems = 1000L)
    val hexCol = "id".getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    val dir = java.nio.file.Paths.get(t, "_bloomidx", hexCol)
    val files = TxLog.liveFiles(t)
    assert(files.nonEmpty && files.forall(f =>
      Files.isRegularFile(dir.resolve(s"$f.bf"))),
      "every live file must carry a sidecar after backfill")
    import org.apache.spark.util.sketch.BloomFilter
    val f0 = files.head
    val hashes = spark.read.parquet(s"$t/$f0")
      .select(xxhash64(col("id"))).collect().map(_.getLong(0))
    val expect = BloomFilter.create(1000L, 0.01)
    hashes.foreach(expect.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    expect.writeTo(bos)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(dir.resolve(s"$f0.bf")), bos.toByteArray),
      "task-written sidecar bytes must equal the driver-built filter")
    // the tmp+ATOMIC_MOVE protocol leaves no strays behind
    val names = {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSeq
      } finally s.close()
    }
    assert(names.forall(_.endsWith(".bf")), s"stray files: $names")
  }

  test("writes maintain the index; new values are findable and pruned") {
    val t = tmp("bf_maint")
    seed(t)
    TxLog.addBloomIndex(spark, t, "id", expectedItems = 1000L)
    TxLog.write(Seq((900000L, 1L, "knew")).toDF("id", "v", "key"),
      t, "append")
    val (kept, total) =
      TxLog.pruneFilesWhere(t, Seq(TxLog.Pred.Eq("id", 900000L)))
    assert(total == 9 && kept.size < 9,
      s"the append's own sidecar must serve, kept ${kept.size}")
    assert(TxLog.snapshotWhere(spark, t,
      Seq(TxLog.Pred.Eq("id", 900000L))).count() == 1)
  }

  test("the SQL UPDATE rewrite maintains the index for its new files") {
    val t = tmp("bf_sqlupd")
    seed(t)
    TxLog.addBloomIndex(spark, t, "id", expectedItems = 1000L)
    spark.sql(s"UPDATE graft.`$t` SET v = 0 WHERE id = 42")
    // every live file (incl. the rewrite's replacement) has a sidecar,
    // so the lookup still prunes AND still finds the updated row
    val (kept, total) =
      TxLog.pruneFilesWhere(t, Seq(TxLog.Pred.Eq("id", 42L)))
    assert(kept.size < total, s"kept ${kept.size}/$total")
    val got = TxLog.snapshotWhere(spark, t, Seq(TxLog.Pred.Eq("id", 42L)))
    assert(got.head().getLong(1) == 0L)
  }

  test("drop index stops pruning and reclaims sidecars; vacuum cleans with files") {
    val t = tmp("bf_drop")
    seed(t)
    TxLog.addBloomIndex(spark, t, "id", expectedItems = 1000L)
    assert(TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Eq("id", 42L)))._1.size < 8)
    TxLog.dropBloomIndex(t, "id")
    assert(TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Eq("id", 42L)))._1.size == 8)
    assert(!Files.isDirectory(
      java.nio.file.Paths.get(t, "_bloomidx").resolve(
        "id".getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString)))
    // vacuum: rewritten files take their sidecars along
    TxLog.addBloomIndex(spark, t, "id", expectedItems = 1000L)
    val before = Files.walk(java.nio.file.Paths.get(t, "_bloomidx"))
      .filter(Files.isRegularFile(_)).count()
    TxLog.write(Seq((1L, 1L, "x")).toDF("id", "v", "key"), t, "overwrite")
    TxLog.checkpointLog(t)
    TxLog.vacuum(t, dropHistoryBefore = TxLog.latestVersion(t).get,
      retainMs = 0L)
    val after = Files.walk(java.nio.file.Paths.get(t, "_bloomidx"))
      .filter(Files.isRegularFile(_)).count()
    assert(after < before, s"sidecars must vacuum with their files " +
      s"($before -> $after)")
  }

  test("clones carry the index; rename of an indexed column is refused") {
    val s = tmp("bf_clone"); val d = freshDir("bf_clone_dst")
    seed(s)
    TxLog.addBloomIndex(spark, s, "id", expectedItems = 1000L)
    TxLog.cloneTable(spark, s, d)
    assert(TxLog.bloomCols(d).contains("id"))
    assert(TxLog.pruneFilesWhere(d,
      Seq(TxLog.Pred.Eq("id", 42L)))._1.size < 8,
      "the linked sidecars must prune in the clone")
    val e = intercept[IllegalArgumentException] {
      TxLog.renameColumn(d, "id", "doc")
    }
    assert(e.getMessage.contains("bloom"))
    TxLog.dropBloomIndex(d, "id")
    TxLog.renameColumn(d, "id", "doc")
    assert(TxLog.snapshot(spark, d).columns.head == "doc")
  }

  test("a cross-typed probe value never prunes a file that matches") {
    val t = tmp("bf_xtyped")
    seed(t)
    TxLog.addBloomIndex(spark, t, "id", expectedItems = 1000L)
    TxLog.addBloomIndex(spark, t, "key", expectedItems = 1000L)
    // STRING probe against the BIGINT column: the Pred contract
    // accepts it (exactCol casts, boundLong parses) — the bloom tier
    // must normalize to the DECLARED type before hashing, or it
    // hashes the string and drops the file that holds id=42
    val got = TxLog.snapshotWhere(spark, t,
      Seq(TxLog.Pred.Eq("id", "42")))
    assert(got.count() == 1 && got.head().getLong(0) == 42L,
      "string probe against BIGINT must still find the row")
    // and it still PRUNES (normalized "42" hashes like 42L did)
    assert(TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Eq("id", "42")))._1.size < 8,
      "normalized probe must keep the bloom pruning power")
    // Int probe (boundLong's other normalization) prunes identically
    assert(TxLog.pruneFilesWhere(t, Seq(TxLog.Pred.Eq("id", 42)))._1 ==
      TxLog.pruneFilesWhere(t, Seq(TxLog.Pred.Eq("id", 42L)))._1)
    // a LONG probe against the STRING column cannot be normalized by
    // toString-guessing — BOTH tiers must keep everything: the exact
    // filter compares under Spark's numeric cast ("0777" would match
    // 777L), which neither lexical stats nor a toString bloom hash
    // can reproduce
    assert(TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Eq("key", 777L)))._1.size == 8,
      "unnormalizable probe must disable pruning, never guess")
    // a non-numeric string against BIGINT likewise keeps everything
    assert(TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Eq("id", "not-a-number")))._1.size == 8)
  }

  test("the SQL procedures manage the index") {
    val t = tmp("bf_sql")
    seed(t)
    val n = spark.sql(
      s"CALL graft.system.add_bloom_index('$t', 'id', 1000, 0.01)")
      .head().getLong(0)
    assert(n == 1L)
    assert(TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Eq("id", 42L)))._1.size < 8)
    assert(spark.sql(
      s"CALL graft.system.drop_bloom_index('$t', 'id')")
      .head().getLong(0) == 0L)
  }

  test("the bloom tier never prunes a time-travel read") {
    val t = tmp("bf_asof")
    seed(t)                                     // v0
    TxLog.addBloomIndex(spark, t, "id", expectedItems = 1000L)
    // current-version read: the index prunes
    assert(TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Eq("id", 42L)))._1.size < 8)
    // time-travel read of the SAME content: the registry, sidecars
    // and declared type are present-day state — the tier must stand
    // down (stats only), never consult them for a pinned version
    assert(TxLog.pruneFilesWhere(t,
      Seq(TxLog.Pred.Eq("id", 42L)), asOf = Some(0L))._1.size == 8,
      "bloom pruning must not engage on asOf reads")
    assert(TxLog.snapshotWhere(spark, t,
      Seq(TxLog.Pred.Eq("id", 42L)), asOf = Some(0L)).count() == 1)
  }
}
