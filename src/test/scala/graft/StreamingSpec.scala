package graft

import java.nio.file.Files
import graft.ingest.Fixtures
import graft.pipeline.{Cleaning, PinQueries}
import graft.streaming.StreamJob

/** Streaming-path specs: parity with batch cleaning, checkpointed
  * restart without duplication, watermarked-dedup mode. */
class StreamingSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("stream clean == batch clean (minus sort) for all three tables") {
    val base = tmp("st_parity")
    Fixtures.landStream(spark, sf, base)
    StreamJob.runAll(spark, base, s"$base/out", s"$base/ckpt")
    val (bp, bg, bu) = PinQueries.cleanedTables(spark, sf)
    for ((t, batch) <- Seq(("pin", bp), ("geo", bg), ("user", bu))) {
      val streamed = spark.read.parquet(s"$base/out/$t")
      assert(streamed.count() == batch.count(), s"$t count")
      // content parity as multisets (cast arrays/ts to comparable form)
      val cols = batch.columns.map(c => org.apache.spark.sql.functions.col(c).cast("string"))
      val a = batch.select(cols.toIndexedSeq: _*).collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val b = streamed.select(cols.toIndexedSeq: _*).collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(a == b, s"$t content")
    }
  }

  test("checkpoint restart: rerun on same landing adds nothing") {
    val base = tmp("st_restart")
    Fixtures.landStream(spark, sf, base)
    StreamJob.runOne(spark, base, "user", s"$base/out", s"$base/ckpt")
    val n1 = spark.read.parquet(s"$base/out/user").count()
    // restart: same checkpoint, same landing dir -> no new rows
    StreamJob.runOne(spark, base, "user", s"$base/out", s"$base/ckpt")
    val n2 = spark.read.parquet(s"$base/out/user").count()
    assert(n1 == n2, "restart must be exactly-once (no re-ingestion)")
  }

  test("watermarked mode dedups pin with bounded state") {
    val base = tmp("st_wm")
    Fixtures.landStream(spark, sf, base)
    StreamJob.runOne(spark, base, "pin", s"$base/out", s"$base/ckpt",
      watermarked = true)
    val streamed = spark.read.parquet(s"$base/out/pin")
    val batch = Cleaning.cleanPin(graft.pipeline.RawDerive.tables(spark, sf)._1)
    // same dedup result as the unbounded reference mode on this data
    assert(streamed.count() == batch.count())
  }
}
