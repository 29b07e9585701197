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
    * `path` — which must hold NO `*.avro` files yet: the contract is
    * enforced (not just documented), because `readAvro` globs the
    * directory and stale containers from an earlier differently-
    * partitioned run would be silently consumed. Executor-side through
    * the Hadoop FileSystem API with the SESSION's Hadoop configuration
    * (shipped to tasks as plain key/value entries — `spark.hadoop.*`
    * settings apply here exactly as in the built-in sinks), so the
    * files land wherever the session's `fs.defaultFS` points.
    *
    * Task-commit protocol: each task writes to a `.inprogress` name
    * (invisible to the read glob) and renames into place only after a
    * clean close — a failed or speculative attempt can never leave a
    * partial container where `readAvro` finds it; the loser of a
    * speculative race sees the winner's committed file and discards
    * its own. Returns row count. */
  def writeAvro(df: DataFrame, path: String): Long = {
    val schemaJson = avroSchemaJson(df.schema)
    val sparkSchema = df.schema
    val sc = df.sparkSession.sparkContext
    // Hadoop Configuration is not serializable; ship its entries and
    // rebuild per task (defaults included — iterator covers them).
    val confEntries: Array[(String, String)] = {
      import scala.jdk.CollectionConverters._
      sc.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
    }
    val confBc = sc.broadcast(confEntries)
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val driverFs = dirPath.getFileSystem(sc.hadoopConfiguration)
    val existing =
      Option(driverFs.globStatus(new org.apache.hadoop.fs.Path(s"$path/*.avro")))
        .getOrElse(Array.empty)
    require(existing.isEmpty,
      s"avro sink requires a fresh directory: $path already holds " +
        s"${existing.length} *.avro file(s) readAvro would consume")
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confBc.value.foreach { case (k, v) => conf.set(k, v) }
      val avroSchema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      val writer = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](avroSchema))
      val out = new org.apache.hadoop.fs.Path(f"$path/part-$pid%05d.avro")
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val tmp = new org.apache.hadoop.fs.Path(
        f"$path/part-$pid%05d.avro.inprogress-$attempt")
      val fs = out.getFileSystem(conf)
      // a 0-row partition still writes a (schema-only) container, so
      // an empty frame round-trips instead of failing the read
      writer.create(avroSchema, fs.create(tmp, true))
      var n = 0L
      var ok = false
      try {
        rows.foreach { row =>
          val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
          var i = 0
          while (i < sparkSchema.length) {
            rec.put(i, if (row.isNullAt(i)) null else row.get(i))
            i += 1
          }
          writer.append(rec)
          n += 1
        }
        ok = true
      } finally {
        writer.close()
        if (ok) {
          // commit: first attempt to finish wins; a later (speculative
          // or retried) attempt finds the committed file and discards
          if (fs.exists(out) || !fs.rename(tmp, out))
            fs.delete(tmp, false)
        } else fs.delete(tmp, false)
      }
      Iterator.single(n)
    }.sum().toLong
  }

  /** Read every `*.avro` container under `path` into a DataFrame with
    * `schema` (fields resolved by NAME against the record, so column
    * order is free).
    *
    * Parallelism contract: ONE task per container — the scan's
    * parallelism is the file count, never finer. That matches the
    * file-per-task layout `writeAvro` itself produces (and the
    * many-small-files landing layout this engine compacts anyway), but
    * a few multi-GB third-party containers would serialize the scan:
    * keep containers under ~256 MB (re-shard upstream or via
    * `writeAvro(df.repartition(n), ...)`) when this reader is on the
    * critical path. Sync-marker block splitting would lift the limit;
    * it is deliberately not implemented until a real workload needs it.
    *
    * Fails loudly rather than corrupting silently — enforced, not just
    * promised: every requested field must exist in each container's
    * WRITER schema (absent fields throw instead of null-filling a
    * typo'd column), and numeric narrowing is bounds-checked (a long
    * read as int throws on overflow; a long too big for an exact
    * double throws rather than rounding). */
  def readAvro(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val sparkSchema = schema
    val rowRdd = spark.sparkContext
      .binaryFiles(s"$path/*.avro")
      .flatMap { case (file, pds) =>
        val stream = new org.apache.avro.file.DataFileStream(
          pds.open(),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        // by-name resolution must not silently null-fill a field the
        // writer never had (a misspelled column would read as all-NULL)
        val writerSchema = stream.getSchema
        sparkSchema.fields.foreach { f =>
          require(writerSchema.getField(f.name) != null,
            s"avro container $file has no field '${f.name}' " +
              s"(writer schema: ${writerSchema.getFields}); " +
              s"refusing to null-fill")
        }
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
              case (v: java.lang.Long, LongType) => v.longValue()
              case (v: java.lang.Integer, LongType) => v.longValue()
              case (v: java.lang.Integer, IntegerType) => v.intValue()
              case (v: java.lang.Long, IntegerType) =>
                // throws ArithmeticException on overflow instead of
                // truncating (the silent-corruption path this module
                // promises not to have)
                java.lang.Math.toIntExact(v.longValue())
              case (v: java.lang.Double, DoubleType) => v.doubleValue()
              case (v: java.lang.Float, DoubleType) => v.doubleValue()
              case (v: java.lang.Integer, DoubleType) => v.doubleValue()
              case (v: java.lang.Long, DoubleType) =>
                val d = v.doubleValue()
                if (d.toLong != v.longValue())
                  throw new ArithmeticException(
                    s"avro field '${f.name}': long $v is not exactly " +
                      s"representable as double")
                d
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
