package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.pipeline.Cleaning

/** Unit specs for the cleaning layer C1-C13 — every SURVEY §2.8 quirk
  * pinned on tiny in-memory frames. */
class CleaningSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val pinCols = Seq("index", "unique_id", "title", "description",
    "poster_name", "follower_count", "tag_list", "is_image_or_video",
    "image_src", "downloaded", "save_location", "category")

  private def pinRaw(rows: Seq[Seq[String]]) = {
    val schema = StructType(pinCols.map(StructField(_, StringType)))
    spark.createDataFrame(rows.map(r => Row(r: _*)).asJava, schema)
  }

  private def row(fc: String, title: String = "t") = Seq(
    "1", "uid-1", title, "desc", "poster", fc, "tags", "image",
    "src", "1", "Local save in /data/x", "cat")

  test("Q-a: follower_count 25k -> 25 (no x1000), 2M -> 2000") {
    val out = Cleaning.cleanPin(pinRaw(Seq(row("25k"), row("2M"), row("852"))), sort = false)
      .select("follower_count").collect().map(_.get(0)).toSet
    assert(out == Set(25, 2000, 852))
  }

  test("C2: sentinels and empty strings null out, junk casts null out") {
    val out = Cleaning.cleanPin(pinRaw(Seq(
      row("User Info Error", title = "No Title Data Available"),
      row("", title = ""))), sort = false)
      .select("follower_count", "title").collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("C3: save_location strips the prefix, keeps leading space") {
    val out = Cleaning.cleanPin(pinRaw(Seq(row("1"))), sort = false)
      .select("save_location").head().getString(0)
    assert(out == " /data/x")
  }

  test("C6: downloaded '1'/'0' cast to boolean") {
    val raw = pinRaw(Seq(row("1"), row("2").updated(9, "0").updated(1, "uid-2")))
    val out = Cleaning.cleanPin(raw, sort = false)
      .select("unique_id", "downloaded").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out("uid-1") && !out("uid-2"))
  }

  test("C1: pin dedup removes exact duplicates") {
    val raw = pinRaw(Seq(row("5"), row("5")))
    assert(Cleaning.cleanPin(raw, sort = false).count() == 1)
  }

  test("Q-b: user dedup is a no-op - duplicates survive") {
    val schema = StructType(Seq("index", "date_joined", "first_name",
      "last_name", "age").map(StructField(_, StringType)))
    val rows = Seq.fill(3)(Row("7", "2020-01-02T03:04:05", "A", "B", "33"))
    val raw = spark.createDataFrame(rows.asJava, schema)
    val out = Cleaning.cleanUser(raw, sort = false)
    assert(out.count() == 3)
    val r = out.head()
    assert(r.getAs[String]("user_name") == "A B")
    assert(r.getAs[Int]("age") == 33)
  }

  test("Q-g: coordinates stay an array of strings") {
    val schema = StructType(Seq("index", "timestamp", "latitude",
      "longitude", "country").map(StructField(_, StringType)))
    val raw = spark.createDataFrame(
      Seq(Row("1", "2021-04-19T17:37:03", "-89.97", "-173.2", "  Albania ")).asJava, schema)
    val out = Cleaning.cleanGeo(raw, sort = false)
    assert(out.schema("coordinates").dataType ==
      ArrayType(StringType, containsNull = true))
    val r = out.head()
    assert(r.getAs[scala.collection.Seq[String]]("coordinates").toSeq
      == Seq("-89.97", "-173.2"))
    assert(r.getAs[String]("country") == "Albania") // C12 trim
    assert(r.getAs[java.sql.Timestamp]("timestamp").toInstant.toString
      == "2021-04-19T17:37:03Z") // C11 under UTC session
  }

  test("cleaning is idempotent on its value domain (property)") {
    val raw = pinRaw(Seq(row("25k"), row("2M"), row(""), row("x")))
    val once = Cleaning.cleanPin(raw, sort = false)
    // re-running the value normalization on the already-clean string
    // columns changes nothing (the CASE projection is a fixpoint there;
    // typed columns ind/follower_count/downloaded can't host sentinels)
    val strCols = once.schema.fields
      .filter(_.dataType == StringType).map(_.name).toIndexedSeq
    val onceStr = once.select(strCols.map(org.apache.spark.sql.functions.col): _*)
    val again = Cleaning.nullifyErroneous(onceStr)
    assert(onceStr.collect().toSet == again.collect().toSet)
  }
}
