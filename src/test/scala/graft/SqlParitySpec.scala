package graft

import org.apache.spark.sql.DataFrame
import graft.pipeline.{PinQueries, PinSql}

/** Dual-surface parity: each of the reference's verbatim `%sql` texts
  * (PinSql, run via temp views + spark.sql — the analyst surface) must
  * return exactly the rows of its DataFrame-DSL counterpart
  * (PinQueries). Row-order-insensitive compare: both surfaces leave
  * ties unspecified, so results are compared as sorted multisets.
  * Q4 is value-compared only (its LIMIT 1 over a rank tie is
  * nondeterministic in the reference; the DSL adds a documented
  * tie-break). */
class SqlParitySpec extends SparkSpec {

  private lazy val tables = {
    val t = PinQueries.cleanedTables(spark, sf)
    PinSql.registerViews(t._1, t._2, t._3)
    t
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private val dsl: Map[String, ((DataFrame, DataFrame, DataFrame)) => DataFrame] = Map(
    "q1" -> (t => PinQueries.q1(t._1, t._2)),
    "q2" -> (t => PinQueries.q2(t._1, t._2)),
    "q3" -> (t => PinQueries.q3(t._1, t._2)),
    "q5" -> (t => PinQueries.q5(t._1, t._3)),
    "q6" -> (t => PinQueries.q6(t._1, t._3)),
    "q7" -> (t => PinQueries.q7(t._3)),
    "q8" -> (t => PinQueries.q8(t._1, t._3)),
    "q9" -> (t => PinQueries.q9(t._1, t._3)))

  dsl.keys.toSeq.sorted.foreach { name =>
    test(s"$name: verbatim SQL == DataFrame DSL") {
      val t = tables // forces view registration before spark.sql
      val sqlRows = rows(PinSql.run(spark, name))
      val dslRows = rows(dsl(name)(t))
      assert(sqlRows == dslRows)
    }
  }

  test("q4: verbatim SQL == DSL on the value (tie-break documented)") {
    val t = tables
    val sqlRow = PinSql.run(spark, "q4").head()
    val dslRow = PinQueries.q4(t._1, t._2).head()
    assert(sqlRow.getInt(1) == dslRow.getInt(1))
  }

  test("native expressions reachable from SQL == DSL surface") {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("documents_v")
    val viaSql = rows(spark.sql(
      """SELECT doc_id, polyhash64(text) AS ph,
        |  simhash64(split(trim(text), '\\s+')) AS sh,
        |  minhash_sig(hashed_shingles(split(trim(text), '\\s+'), 3), 8) AS sig
        |FROM documents_v""".stripMargin))
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val viaDsl = rows(docs.select(col("doc_id"),
      graft.functions.PolyHash64.polyhash64(col("text")).as("ph"),
      graft.functions.SimHash64.simhash64(split(trim(col("text")), "\\s+")).as("sh"),
      graft.functions.MinHashSig.minhashSig(
        graft.functions.HashedShingles.hashedShingles(
          split(trim(col("text")), "\\s+"), 3), 8).as("sig")))
    assert(viaSql == viaDsl && viaSql.nonEmpty)
  }

  test("SQL builders: arity/argument validation, BIGINT literals accepted") {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("documents_v")
    // a BIGINT-typed k literal is as valid as an INT one
    val bigintK = spark.sql(
      "SELECT minhash_sig(hashed_shingles(split(trim(text), '\\s+'), CAST(3 AS BIGINT)), CAST(8 AS BIGINT)) AS sig FROM documents_v")
      .head().getAs[scala.collection.Seq[Long]]("sig")
    assert(bigintK.length == 8)
    def failsWith(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(frag)),
        s"expected '$frag' in: ${msgs(e).mkString(" | ")}")
    }
    failsWith("SELECT polyhash64() FROM documents_v",
      "polyhash64 expects 1 argument(s), got 0")
    failsWith("SELECT dot64(array(1L)) FROM documents_v",
      "dot64 expects 2 argument(s), got 1")
    failsWith("SELECT minhash_sig(array(1L), 2, 3) FROM documents_v",
      "minhash_sig expects 1 to 2 argument(s), got 3")
    failsWith("SELECT minhash_sig(array(1L), -4) FROM documents_v",
      "must be a positive integer literal")
    failsWith("SELECT hashed_shingles(split(text, ' '), 0) FROM documents_v",
      "must be a positive integer literal")
  }
}
