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

  test("a non-fresh output directory is refused, never silently merged") {
    val dir = tmp("avro_fresh")
    val df = Seq((1L, Integer.valueOf(1), java.lang.Double.valueOf(0.0),
      java.lang.Boolean.TRUE, "a")).map(t => Row(t._1, t._2, t._3, t._4, t._5))
    val d1 = spark.createDataFrame(spark.sparkContext.parallelize(df, 1), schema)
    assert(Avro.writeAvro(d1, s"$dir/t") == 1L)
    // a second run (fewer/more partitions) must FAIL, not leave a mix
    // of old and new containers for readAvro to silently union
    intercept[IllegalArgumentException] { Avro.writeAvro(d1, s"$dir/t") }
    assert(Avro.readAvro(spark, s"$dir/t", schema).count() == 1L)
    // no .inprogress temp survives a committed write
    assert(!new java.io.File(s"$dir/t").listFiles()
      .exists(_.getName.contains("inprogress")))
  }

  test("numeric narrowing is bounds-checked, absent fields refuse to null-fill") {
    val dir = tmp("avro_narrow")
    val wide = StructType(Seq(StructField("id", LongType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(java.lang.Long.MAX_VALUE - 1)), 1), wide)
    assert(Avro.writeAvro(df, s"$dir/t") == 1L)
    // long → int overflow throws instead of truncating
    val asInt = StructType(Seq(StructField("id", IntegerType, nullable = false)))
    val e = intercept[org.apache.spark.SparkException] {
      Avro.readAvro(spark, s"$dir/t", asInt).collect()
    }
    assert(e.getMessage.contains("ArithmeticException") ||
      Option(e.getCause).exists(_.toString.contains("Arithmetic")) ||
      e.toString.contains("overflow"))
    // long → double beyond 2^53 throws instead of rounding
    val asDouble = StructType(Seq(StructField("id", DoubleType, nullable = false)))
    intercept[org.apache.spark.SparkException] {
      Avro.readAvro(spark, s"$dir/t", asDouble).collect()
    }
    // a field the writer never had throws instead of reading all-NULL
    val typo = StructType(Seq(StructField("idd", LongType, nullable = true)))
    intercept[org.apache.spark.SparkException] {
      Avro.readAvro(spark, s"$dir/t", typo).collect()
    }
    // the honest read still works
    assert(Avro.readAvro(spark, s"$dir/t", wide).collect()
      .map(_.getLong(0)).toSeq == Seq(java.lang.Long.MAX_VALUE - 1))
  }

  test("one large container splits across tasks on sync markers") {
    val dir = tmp("avro_split")
    val n = 20000
    val wide = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val rows = (0 until n).map(i => Row(i.toLong, s"payload-$i-${"x" * 40}"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), wide) // ONE container
    assert(Avro.writeAvro(df, s"$dir/t") == n.toLong)
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 1)
    assert(files.head.length > 64 * 1024, "needs several sync blocks")
    // a split size far below the container forces many tasks; every
    // block lands in exactly one split → exact multiset round trip
    val back = Avro.readAvro(spark, s"$dir/t", wide, maxSplitBytes = 64 * 1024)
    assert(back.rdd.getNumPartitions > 1,
      "a large container must scan with more than one task")
    assert(back.count() == n.toLong)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until n.toLong))
    // degenerate geometries agree with the one-split read: a byte-
    // sized request floors to the 64 KB minimum (no million-split
    // fan-out) and every block is still claimed by exactly one task
    val one = Avro.readAvro(spark, s"$dir/t", wide)
    assert(one.count() == n.toLong)
    val tiny = Avro.readAvro(spark, s"$dir/t", wide, maxSplitBytes = 1L)
    assert(tiny.count() == n.toLong)
    assert(tiny.rdd.getNumPartitions <=
      (files.head.length / (64 * 1024) + 1))
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
