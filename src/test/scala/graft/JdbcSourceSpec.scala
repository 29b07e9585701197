package graft

import java.nio.file.Files
import java.util.Properties
import graft.ingest.JdbcSource
import graft.pipeline.{Cleaning, RawDerive}

/** S6 letter-parity: the JDBC row source against a REAL embedded
  * database (Derby, the one JDBC engine shipped in /opt/spark/jars).
  * The derived raw tables round-trip through database tables and come
  * back partitioned, schema-identical, and cleaning-equivalent. */
class JdbcSourceSpec extends SparkSpec {

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  test("embedded-Derby round trip: partitioned JDBC read == derived raw table") {
    val dbDir = Files.createTempDirectory("graft_derby").toString + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = new Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val (rawPin, _, rawUser) = RawDerive.tables(spark, sf)
    // few writer connections: embedded Derby is a single-file database
    rawPin.coalesce(2).write.mode("overwrite").jdbc(url, "pinterest_data", props)
    rawUser.coalesce(2).write.mode("overwrite").jdbc(url, "user_data", props)

    val pin = JdbcSource.readTable(spark, url, "pinterest_data",
      numPartitions = 4, props = props)
    // range partitioning really split the scan
    assert(pin.rdd.getNumPartitions == 4)
    assert(pin.columns.toSeq == rawPin.columns.toSeq)
    assert(multiset(pin) == multiset(rawPin))

    // the source is interchangeable with the derive/file sources:
    // cleaning over JDBC rows == cleaning over the derived frame
    val user = JdbcSource.readTable(spark, url, "user_data",
      numPartitions = 3, props = props)
    assert(multiset(Cleaning.cleanUser(user, sort = false)) ==
      multiset(Cleaning.cleanUser(rawUser, sort = false)))
  }

  test("empty table degrades to a single-partition read") {
    val dbDir = Files.createTempDirectory("graft_derby_e").toString + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = new Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val (rawPin, _, _) = RawDerive.tables(spark, sf)
    rawPin.limit(0).coalesce(1).write.mode("overwrite")
      .jdbc(url, "empty_pin", props)
    val df = JdbcSource.readTable(spark, url, "empty_pin", props = props)
    assert(df.count() == 0)
  }
}
