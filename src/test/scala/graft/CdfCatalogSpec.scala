package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ingest.TxLog

/** The change data feed through the SQL catalog: the
  * `graft.`t`.changes` metadata table (batch windows via
  * startingVersion/endingVersion reader options; `readStream.table`
  * serving snapshot-then-changes INCLUDING the dv/rewrite commits the
  * plain source refuses), plus the plain source's `startingVersion`
  * tail-only option. The engine-side contract is TxLog.changes — the
  * catalog surface must be row-identical to it. */
class CdfCatalogSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def seed(t: String, n: Int = 100): Unit = {
    TxLog.write(
      spark.range(n.toLong).select(col("id"), (col("id") % 10).as("grp"),
        (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id")),
      t, "overwrite")
    ()
  }

  private def feedRows(df: DataFrame): Seq[(Long, Long, String, Long)] =
    df.select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sorted.toSeq

  private def catalogFeed(t: String, from: Long,
      to: Option[Long] = None): DataFrame = {
    val r = spark.read.option("startingVersion", from)
    to.fold(r)(v => r.option("endingVersion", v))
      .table(s"graft.`$t`.changes")
  }

  test("batch .changes equals TxLog.changes across COW + append + dv") {
    val t = tmp("cdf_batch")
    seed(t) // v0
    val mark = TxLog.latestVersion(t).get // 0
    TxLog.update(spark, t, col("grp") === 3, Map("v" -> lit(-1L))) // v1 COW
    TxLog.write(spark.range(100, 120).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 2).as("v")), t, "append") // v2
    TxLog.setTableProperty(t, TxLog.DmlModeProp, TxLog.DmlModeMor)
    spark.sql(s"DELETE FROM graft.`$t` WHERE id BETWEEN 50 AND 59") // v3 dv
    spark.sql(s"UPDATE graft.`$t` SET v = 0 WHERE id = 77") // v4 dv
    val latest = TxLog.latestVersion(t).get
    // full window through the catalog vs the engine feed — identical
    // multisets, including the COW rewrite's file-granular pairs
    val got = feedRows(catalogFeed(t, mark + 1))
    val want = feedRows(TxLog.changes(spark, t, mark))
    assert(got == want, s"catalog feed diverges: ${got.size} vs ${want.size}")
    assert(got.nonEmpty)
    // endingVersion bounds the window (drop the final update commit)
    val bounded = feedRows(catalogFeed(t, mark + 1, Some(latest - 1)))
    assert(bounded == feedRows(TxLog.changes(spark, t, mark,
      Some(latest - 1))))
    assert(bounded.size < got.size)
    // the dv delete arm is exact: rows 50-59 leave once at v3, as
    // deletes, masked-file reads notwithstanding
    val dels = got.filter(r => r._4 == mark + 3 && r._3 == "delete")
    assert(dels.map(_._1) == (50L to 59L),
      s"dv delete arm must carry exactly the deleted rows: $dels")
    // the dv update surfaces as delete(old v=154) + insert(v=0) at 77
    val u = got.filter(r => r._4 == mark + 4)
    assert(u.map(r => (r._1, r._3, r._2)).sorted ==
      Seq((77L, "delete", 154L), (77L, "insert", 0L)), s"update pair: $u")
  }

  test("batch .changes refuses missing/invalid windows and time travel") {
    val t = tmp("cdf_refuse")
    seed(t)
    val latest = TxLog.latestVersion(t).get
    val noStart = intercept[Exception] {
      spark.read.table(s"graft.`$t`.changes").collect()
    }
    assert(noStart.getMessage.contains("startingVersion"))
    val past = intercept[Exception] {
      catalogFeed(t, latest + 1).collect()
    }
    assert(past.getMessage.contains("startingVersion"))
    val inverted = intercept[Exception] {
      catalogFeed(t, 0, Some(latest + 5)).collect()
    }
    assert(inverted.getMessage.contains("endingVersion"))
    val tt = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft.`$t`.changes VERSION AS OF 0").collect()
    }
    assert(tt.getMessage.contains("time travel"))
  }

  test("keep-list is the NEW mask only: stacked dv commits don't resurrect") {
    val t = tmp("cdf_stack")
    seed(t)
    TxLog.setTableProperty(t, TxLog.DmlModeProp, TxLog.DmlModeMor)
    TxLog.deleteVectored(spark, t, col("id") === 12L) // v1: mask {12}
    val mark = TxLog.latestVersion(t).get
    spark.sql(s"UPDATE graft.`$t` SET v = 0 WHERE id BETWEEN 10 AND 14") // v2
    val got = feedRows(catalogFeed(t, mark + 1))
    assert(got.filter(_._3 == "delete").map(_._1) == Seq(10L, 11L, 13L, 14L),
      s"row 12 was deleted at v1, it must NOT reappear in v2's arm: $got")
    assert(got.filter(_._3 == "insert").map(_._1) == Seq(10L, 11L, 13L, 14L))
    assert(got.forall(_._4 == mark + 1))
  }

  test("overwrite = prior live set out, new set in; checkpoint noop silent") {
    val t = tmp("cdf_ow")
    seed(t, 20)
    val mark = TxLog.latestVersion(t).get
    TxLog.write(spark.range(500, 510).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 2).as("v")), t, "overwrite")
    val got = feedRows(catalogFeed(t, mark + 1))
    assert(got.filter(_._3 == "delete").map(_._1) == (0L until 20L),
      "an overwrite's delete arm is the entire prior live set")
    assert(got.filter(_._3 == "insert").map(_._1) == (500L until 510L))
    // a checkpoint (overwrite re-referencing the same files) changes
    // ZERO rows and must not appear in the feed
    val mark2 = TxLog.latestVersion(t).get
    TxLog.checkpointLog(t)
    assert(TxLog.latestVersion(t).get > mark2)
    assert(catalogFeed(t, mark2 + 1).count() == 0,
      "a metadata-only checkpoint must be feed-invisible")
  }

  test("streaming .changes: snapshot, then dv commits the plain source refuses") {
    val base = tmp("cdf_stream")
    val t = s"$base/table"
    seed(t)
    TxLog.setTableProperty(t, TxLog.DmlModeProp, TxLog.DmlModeMor)
    def drain(): Unit = {
      val q = spark.readStream.table(s"graft.`$t`.changes")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def plainDrain(): Unit = {
      val q = spark.readStream.table(s"graft.`$t`")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/ckpt_plain")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // initial snapshot as inserts stamped v0
    plainDrain() // the plain source's snapshot batch — fine so far
    val out0 = feedRows(spark.read.parquet(s"$base/out"))
    assert(out0.size == 100 && out0.forall(r => r._3 == "insert" && r._4 == 0L))
    spark.sql(s"DELETE FROM graft.`$t` WHERE id < 10")   // v1 (dv)
    spark.sql(s"UPDATE graft.`$t` SET v = 1 WHERE id = 42") // v2 (dv)
    TxLog.write(spark.range(200, 205).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 2).as("v")), t, "append") // v3
    // the PLAIN source refuses the dv commits now inside its tail…
    val plain = intercept[Exception] { plainDrain() }
    assert(plain.getMessage.contains("append-only") ||
      Option(plain.getCause).exists(_.getMessage.contains("append-only")))
    // …the CDF stream serves it as change rows, exactly once
    drain()
    val out1 = feedRows(spark.read.parquet(s"$base/out"))
    assert(out1.count(_._4 == 0L) == 100, "the snapshot must not replay")
    val tail = out1.diff(out0)
    assert(out1.size == out0.size + tail.size, "drains must not replay")
    assert(tail.filter(_._4 == 1L).map(r => (r._1, r._3)).sorted ==
      (0L until 10L).map(_ -> "delete"))
    assert(tail.filter(_._4 == 2L).map(r => (r._1, r._3, r._2)).sorted ==
      Seq((42L, "delete", 84L), (42L, "insert", 1L)))
    assert(tail.filter(_._4 == 3L).map(_._1) == (200L until 205L) &&
      tail.filter(_._4 == 3L).forall(_._3 == "insert"))
    // re-drain with nothing new: zero rows
    drain()
    assert(spark.read.parquet(s"$base/out").count() == out1.size)
  }

  test("streaming .changes with startingVersion tails without a snapshot") {
    val base = tmp("cdf_tailstream")
    val t = s"$base/table"
    seed(t)
    val next = TxLog.latestVersion(t).get + 1
    TxLog.write(spark.range(300, 310).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 2).as("v")), t, "append")
    val q = spark.readStream
      .option("startingVersion", next)
      .table(s"graft.`$t`.changes")
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = feedRows(spark.read.parquet(s"$base/out"))
    assert(got.map(_._1) == (300L until 310L),
      s"the snapshot must be skipped: $got")
    assert(got.forall(r => r._3 == "insert" && r._4 == next))
    // endingVersion on a stream is refused loudly
    val e = intercept[Exception] {
      spark.readStream.option("startingVersion", 0)
        .option("endingVersion", 1)
        .table(s"graft.`$t`.changes")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/ckpt2")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e.getMessage.contains("endingVersion") ||
      Option(e.getCause).exists(_.getMessage.contains("endingVersion")))
  }

  test("plain source startingVersion: tail-only consumption, restart-safe") {
    val base = tmp("cdf_plaintail")
    val t = s"$base/table"
    seed(t) // v0
    TxLog.write(spark.range(100, 110).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 2).as("v")), t, "append") // v1
    TxLog.write(spark.range(200, 210).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 2).as("v")), t, "append") // v2
    def drain(): Unit = {
      val q = spark.readStream
        .option("startingVersion", 2)
        .table(s"graft.`$t`")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val got0 = spark.read.parquet(s"$base/out")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got0 == (200L until 210L),
      s"startingVersion=2 must skip the snapshot and v1: $got0")
    // restart consumes only what landed after
    TxLog.write(spark.range(300, 305).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 2).as("v")), t, "append") // v3
    drain()
    val got1 = spark.read.parquet(s"$base/out")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got1 == ((200L until 210L) ++ (300L until 305L)),
      s"restart must drain exactly v3: $got1")
    // out-of-range startingVersion is refused loudly
    val e = intercept[Exception] {
      spark.readStream.option("startingVersion", 99)
        .table(s"graft.`$t`")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/ckpt_bad")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e.getMessage.contains("startingVersion") ||
      Option(e.getCause).exists(_.getMessage.contains("startingVersion")))
  }

  test("maxVersionsPerTrigger rate-limits the CDF tail per micro-batch") {
    val base = tmp("cdf_rate")
    val t = s"$base/table"
    seed(t) // v0
    (1 to 4).foreach { i =>
      TxLog.write(spark.range(i * 1000L, i * 1000L + 5).select(col("id"),
        (col("id") % 10).as("grp"), (col("id") * 2).as("v")), t, "append")
    } // v1..v4
    val q = spark.readStream
      .option("startingVersion", 1)
      .option("maxVersionsPerTrigger", 1)
      .table(s"graft.`$t`.changes")
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 20, "all four tail commits must drain")
    assert(out.select("_commit_version").distinct().count() == 4)
    // the rate limit shows in the checkpoint: four micro-batches, one
    // tail version each (unlimited would drain all four in one)
    val batches = new java.io.File(s"$base/ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 4, s"expected >=4 rate-limited batches, got $batches")
  }

  test("startingTimestamp resolves to the first commit at or after it") {
    val t = tmp("cdf_ts")
    seed(t) // v0
    TxLog.write(spark.range(100, 110).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 2).as("v")), t, "append") // v1
    TxLog.write(spark.range(200, 210).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 2).as("v")), t, "append") // v2
    // the v2 commit's own in-commit timestamp resolves to v2 exactly
    val ts2 = TxLog.commits(t).find(_.version == 2L).get.ts
    val s2 = java.time.Instant.ofEpochMilli(ts2)
      .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime.toString
    val got = spark.read.option("startingTimestamp", s2)
      .table(s"graft.`$t`.changes")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (200L until 210L), s"ts of v2 must window [v2, ..]: $got")
    // both options at once refuse loudly; a timestamp past the log too
    val both = intercept[Exception] {
      spark.read.option("startingVersion", 1)
        .option("startingTimestamp", s2)
        .table(s"graft.`$t`.changes").collect()
    }
    assert(both.getMessage.contains("not both"))
    val past = intercept[Exception] {
      spark.read.option("startingTimestamp", "2099-01-01T00:00:00")
        .table(s"graft.`$t`.changes").collect()
    }
    assert(past.getMessage.contains("after the last commit"))
  }

  test(".changes on a column-mapped table serves current logical names") {
    val t = tmp("cdf_cm")
    seed(t)
    TxLog.renameColumn(t, "v", "val") // physical stays 'v'
    val mark = TxLog.latestVersion(t).get
    TxLog.write(spark.range(100, 105).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 2).as("val")), t, "append")
    val df = catalogFeed(t, mark + 1)
    assert(df.columns.toSeq ==
      Seq("id", "grp", "val", "_change_type", "_commit_version"))
    val got = df.select("id", "val", "_change_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(got == (100L until 105L).map(i => (i, i * 2, "insert")))
    // column pruning composes (no CDF columns requested at all)
    assert(catalogFeed(t, mark + 1).select("id").count() == 5)
    assert(catalogFeed(t, mark + 1).count() == 5)
  }
}
