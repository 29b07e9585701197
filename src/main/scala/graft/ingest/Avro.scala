package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Jar-free Avro container-file source/sink — the interchange format
  * of the Kafka ecosystem the reference pipeline lives in (its
  * producers wrap records for the Kafka REST proxy, REF USER_POSTING:
  * 30-60; Confluent's wire default is Avro). The Spark Avro CONNECTOR
  * (`spark-avro`) is not on this classpath, but the Apache Avro core
  * library is (`/opt/spark/jars/avro-1.12.1.jar`), so the seam is
  * closed the ImageCodec way: a genuine implementation of the format
  * over public Avro APIs, not a stub.
  *
  * Scale shape — both directions stay fully distributed:
  *  - write: one Avro object-container file per partition, created ON
  *    THE EXECUTOR by a per-partition `DataFileWriter` (the same
  *    file-per-task layout every Spark file sink produces); no rows
  *    ever visit the driver.
  *  - read: `binaryFiles` hands each container to one task, whose
  *    `DataFileStream` decodes records straight into Spark rows — a
  *    narrow per-file map, parallelism = file count (Avro containers
  *    are block-compressed and splittable in principle; file-level
  *    granularity matches the many-files landing layout this engine
  *    compacts anyway, see `Compaction`).
  *
  * Type scope (spec-pinned): the JSON-ish landing schema the reference
  * moves — long/int/double/boolean/string, each nullable via the Avro
  * `[null, T]` union. Anything richer fails loudly at write time
  * rather than corrupting silently. */
object Avro {

  private def avroSchemaJson(schema: StructType): String = {
    val fields = schema.fields.map { f =>
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"avro field names are [A-Za-z_][A-Za-z0-9_]*: '${f.name}'")
      val t = f.dataType match {
        case LongType => "\"long\""
        case IntegerType => "\"int\""
        case DoubleType => "\"double\""
        case BooleanType => "\"boolean\""
        case StringType => "\"string\""
        case other => throw new UnsupportedOperationException(
          s"avro sink supports long/int/double/boolean/string; " +
            s"'${f.name}' is $other")
      }
      val typ = if (f.nullable) s"""["null", $t]""" else t
      s"""{"name":"${f.name}","type":$typ}"""
    }
    s"""{"type":"record","name":"row","namespace":"graft",""" +
      s""""fields":[${fields.mkString(",")}]}"""
  }

  /** Write `df` as one Avro object-container file per partition under
    * `path` (created fresh). Executor-side through the Hadoop
    * FileSystem API — the files land wherever `fs.defaultFS` points
    * (shared storage on a real cluster, local disk here), exactly like
    * every built-in Spark file sink. Returns row count. */
  def writeAvro(df: DataFrame, path: String): Long = {
    val schemaJson = avroSchemaJson(df.schema)
    val sparkSchema = df.schema
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val avroSchema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      val writer = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](avroSchema))
      val out = new org.apache.hadoop.fs.Path(f"$path/part-$pid%05d.avro")
      val fs = out.getFileSystem(new org.apache.hadoop.conf.Configuration())
      // a 0-row partition still writes a (schema-only) container, so
      // an empty frame round-trips instead of failing the read
      writer.create(avroSchema, fs.create(out, true))
      var n = 0L
      try rows.foreach { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
        var i = 0
        while (i < sparkSchema.length) {
          rec.put(i, if (row.isNullAt(i)) null else row.get(i))
          i += 1
        }
        writer.append(rec)
        n += 1
      } finally writer.close()
      Iterator.single(n)
    }.sum().toLong
  }

  /** Read every `*.avro` container under `path` into a DataFrame with
    * `schema` (fields resolved by NAME against the record, so column
    * order is free). One task per file. */
  def readAvro(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val sparkSchema = schema
    val rowRdd = spark.sparkContext
      .binaryFiles(s"$path/*.avro")
      .flatMap { case (_, pds) =>
        val stream = new org.apache.avro.file.DataFileStream(
          pds.open(),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        // rows stream LAZILY off the decoder — a container is
        // partition-sized, so buffering it whole in the heap is
        // exactly the spill-unsafe shape this engine avoids; the
        // stream closes when drained, and the task-completion hook
        // covers early termination (limit, take, failure)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try stream.close() catch { case _: Exception => () }))
        import scala.jdk.CollectionConverters._
        val recs = stream.iterator.asScala.map { rec =>
          Row.fromSeq(sparkSchema.fields.toSeq.map { f =>
            (rec.get(f.name), f.dataType) match {
              case (null, _) => null
              case (v, StringType) => v.toString // Utf8 → String
              case (v: Number, LongType) => v.longValue()
              case (v: Number, IntegerType) => v.intValue()
              case (v: Number, DoubleType) => v.doubleValue()
              case (v: java.lang.Boolean, BooleanType) => v.booleanValue()
              case (v, t) => throw new IllegalArgumentException(
                s"avro field '${f.name}': cannot read ${v.getClass} as $t")
            }
          })
        }
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = recs.hasNext
            if (!h) try stream.close() catch { case _: Exception => () }
            h
          }
          def next(): Row = recs.next()
        }
      }
    spark.createDataFrame(rowRdd, sparkSchema)
  }
}
