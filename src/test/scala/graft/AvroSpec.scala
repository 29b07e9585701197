package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ingest.Avro

/** The jar-free Avro container source/sink: lossless round trips over
  * the supported primitive scope (nullable unions included), the
  * partition-per-file layout, empty-frame survival, and the loud
  * rejection of types outside the scope. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n", IntegerType, nullable = true),
    StructField("x", DoubleType, nullable = true),
    StructField("ok", BooleanType, nullable = true),
    StructField("s", StringType, nullable = true)))

  test("round trip: all supported types, nulls, one file per partition") {
    val rows = Seq(
      Row(1L, Integer.valueOf(7), java.lang.Double.valueOf(1.5),
        java.lang.Boolean.TRUE, "héllo|wörld"),
      Row(2L, null, null, null, null),
      Row(3L, Integer.valueOf(-1), java.lang.Double.valueOf(-0.25),
        java.lang.Boolean.FALSE, ""))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp("avro_rt")
    assert(Avro.writeAvro(df, s"$dir/t") == 3L)
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 2, "one container per partition")
    val back = Avro.readAvro(spark, s"$dir/t", schema)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(_.toSeq).sortBy(_.head.toString.toLong).toSeq
    assert(key(back) == key(df), "content must round-trip losslessly")
  }

  test("an empty frame round-trips (schema-only containers)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 2), schema)
    val dir = tmp("avro_empty")
    assert(Avro.writeAvro(df, s"$dir/t") == 0L)
    assert(Avro.readAvro(spark, s"$dir/t", schema).count() == 0L)
  }

  test("types outside the scope are rejected loudly, not corrupted") {
    val dir = tmp("avro_bad")
    val ts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts")
    intercept[UnsupportedOperationException] {
      Avro.writeAvro(ts, s"$dir/t")
    }
  }

  test("the raw pin table cleans identically through the avro round trip") {
    val (rawPin, _, _) = graft.pipeline.RawDerive.tables(spark, sf)
    val dir = tmp("avro_pin")
    Avro.writeAvro(rawPin, s"$dir/pin")
    val direct = graft.pipeline.Cleaning.cleanPin(rawPin, sort = false)
    val viaAvro = graft.pipeline.Cleaning.cleanPin(
      Avro.readAvro(spark, s"$dir/pin", rawPin.schema), sort = false)
    assert(viaAvro.exceptAll(direct).isEmpty && direct.exceptAll(viaAvro).isEmpty,
      "avro-path clean must equal the direct clean as a multiset")
  }
}
