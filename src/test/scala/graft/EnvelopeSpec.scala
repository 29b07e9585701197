package graft

import graft.ingest.Fixtures
import graft.pipeline.RawDerive
import graft.streaming.StreamJob

/** Wire-envelope round-trips (operators S7/S8): the emulators' exact
  * message shapes survive encode → decode with no loss, for all three
  * tables. */
class EnvelopeSpec extends SparkSpec {

  test("readJsonRobust: malformed lines quarantine as raw text, the rest parse") {
    val dir = java.nio.file.Files.createTempDirectory("json_robust")
    java.nio.file.Files.write(dir.resolve("part.json"),
      ("""{"id": 1, "s": "ok"}""" + "\n" +
        """{"id": 2, "s": "truncat""" + "\n" + // malformed: unterminated
        """not json at all""" + "\n" +
        """{"id": 3, "s": null}""" + "\n").getBytes("UTF-8"))
    val (main, bad) = graft.ingest.Formats.readJsonRobust(spark,
      dir.toString,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, s STRING"))
    val ok = main.orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(ok.toSeq == Seq((1L, "ok"), (3L, null)))
    val raw = bad.collect().map(_.getString(0)).sorted.toSeq
    assert(raw == Seq("""not json at all""", """{"id": 2, "s": "truncat"""),
      raw.toString)
    // the reserved internal column name is refused up front
    intercept[IllegalArgumentException] {
      graft.ingest.Formats.readJsonRobust(spark, dir.toString,
        org.apache.spark.sql.types.StructType.fromDDL(
          "_corrupt_record STRING, id BIGINT"))
    }
  }

  private lazy val raw = RawDerive.tables(spark, sf)

  // compare as strings: the wire format is stringly-typed (SURVEY
  // §1.4), the raw derivation keeps `index` numeric
  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.select(df.columns.map(c =>
        org.apache.spark.sql.functions.col(c).cast("string")).toIndexedSeq: _*)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length)
      .toMap

  test("Kafka-REST envelope: {\"records\":[{\"value\":{...}}]} round-trips") {
    for ((df, table) <- Seq((raw._1, "pin"), (raw._2, "geo"), (raw._3, "user"))) {
      val env = Fixtures.toKafkaEnvelopes(df)
      // shape check on the wire format itself
      val one = env.head().getString(0)
      assert(one.startsWith("""{"records":[{"value":{"""), s"$table: $one")
      val back = Fixtures.fromKafkaEnvelopes(env, df.columns.toIndexedSeq)
      assert(back.columns.toSeq == df.columns.toSeq, s"$table columns")
      assert(multiset(back) == multiset(df), s"$table content differs")
    }
  }

  test("Kinesis envelope: base64 Data payload round-trips") {
    val df = raw._2 // geo — the stream the reference documents in detail
    val env = Fixtures.toKinesisEnvelopes(df, "streaming-graft-geo")
    val one = env.head().getString(0)
    assert(one.startsWith("""{"StreamName":"streaming-graft-geo","Data":""""), one)
    assert(!one.contains("latitude"), "payload must be base64, not clear text")
    val back = Fixtures.fromKinesisEnvelopes(env, df.columns.toIndexedSeq)
    assert(multiset(back) == multiset(df))
  }

  test("declared stream schemas match the raw derivation columns") {
    assert(StreamJob.pinSchema.fieldNames.toSeq == raw._1.columns.toSeq)
    assert(StreamJob.geoSchema.fieldNames.toSeq == raw._2.columns.toSeq)
    assert(StreamJob.userSchema.fieldNames.toSeq == raw._3.columns.toSeq)
  }

  test("Formats: CSV round-trip survives nulls, commas, quotes, newlines; ORC lossless") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain"),
      (2L, null.asInstanceOf[String]),
      (3L, "com,ma \"q\"\nnewline")).toDF("id", "s")
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    graft.ingest.Formats.writeCsv(df, s"$base/csv")
    val back = graft.ingest.Formats.readCsv(spark, s"$base/csv", df.schema)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back(1L) == "plain")
    assert(back(2L) == null, "NULL must survive as NULL, not empty string")
    assert(back(3L) == "com,ma \"q\"\nnewline")
    graft.ingest.Formats.writeOrc(df, s"$base/orc")
    val orc = graft.ingest.Formats.readOrc(spark, s"$base/orc")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(orc == back)
  }
}
