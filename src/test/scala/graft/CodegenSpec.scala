package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen-compilation regression guard for every native Catalyst
  * expression in `graft.functions` (round-4 verdict, "What's wrong"
  * §1–2).
  *
  * The bug class this pins: an expression whose `doGenCode` assigns
  * `ev.isNull = true` while its children are NON-nullable inherits
  * `nullable = false`, so codegen allocates no isNull slot, janino
  * fails ("not an rvalue"), and Spark SILENTLY falls back to
  * interpreted eval — green tests, dead-slow hot loop. DotProduct64
  * shipped that way in round 4 (k-means centroid updates build exactly
  * the non-nullable `collect_list → array_sort → transform` shape).
  *
  * Guard design: two sibling sessions over the same SparkContext —
  * one with `factoryMode=CODEGEN_ONLY, fallback=false` (any compile
  * failure THROWS instead of falling back) and one with
  * `factoryMode=NO_CODEGEN, wholeStage=false` (pure interpreted).
  * Every expression runs in both, over BOTH a nullable and a
  * non-nullable input frame, and the results must match row-for-row.
  * That simultaneously proves (a) the generated Java compiles on both
  * nullability shapes and (b) compiled and interpreted eval agree.
  */
class CodegenSpec extends SparkSpec {

  /** Sibling session: own SQLConf, same executors/data. */
  private def sibling(confs: (String, String)*): SparkSession = {
    val s = spark.newSession()
    graft.functions.GraftFunctions.register(s)
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  private lazy val strict: SparkSession = sibling(
    "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
    "spark.sql.codegen.fallback" -> "false")

  private lazy val interpreted: SparkSession = sibling(
    "spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
    "spark.sql.codegen.wholeStage" -> "false")

  /** One frame with every input type the native expressions take.
    * `nullable = false` builds columns Catalyst KNOWS are non-null
    * (literals/sequence/transform over a non-null range id) — the
    * shape that broke round 4. `nullable = true` wraps each in a
    * `when`, flipping the schema flag and injecting real nulls. */
  private def inputs(s: SparkSession, nullable: Boolean): DataFrame = {
    val base = s.range(24).toDF("id")
    def mk(c: Column): Column =
      if (nullable) when(col("id") % 3 =!= 0, c) else c
    base.select(
      col("id"),
      mk(concat(lit("doc "), col("id").cast("string"), lit(" body")))
        .as("s"),
      mk(transform(sequence(lit(1L), lit(6L)),
        x => concat(lit("t"), ((x * (col("id") + 1L)) % 7L).cast("string"))))
        .as("toks"),
      mk(transform(sequence(lit(1L), lit(8L)),
        x => x * (col("id") + 1L) - 4L)).as("vec"),
      mk(transform(sequence(lit(1L), lit(8L)),
        x => x + col("id"))).as("vec2"),
      mk(array(
        struct(lit(1L).as("cluster"),
          transform(sequence(lit(1L), lit(8L)), x => x).as("cq"),
          lit(204L).as("cqq")),
        struct(lit(2L).as("cluster"),
          transform(sequence(lit(1L), lit(8L)), x => x * 2L).as("cq"),
          lit(816L).as("cqq")))).as("cents_l2"),
      mk(lit(3.5) + col("id").cast("double")).as("nqd"),
      mk(array(
        struct(lit(1L).as("cent_id"),
          transform(sequence(lit(1L), lit(8L)), x => x).as("cq"),
          lit(math.sqrt(204.0)).as("ncq")),
        struct(lit(2L).as("cent_id"),
          transform(sequence(lit(1L), lit(8L)), x => x * 2L).as("cq"),
          lit(math.sqrt(816.0)).as("ncq")))).as("cents_cos"),
      mk(array((col("id") % 3L).cast("long"), ((col("id") + 1L) % 3L).cast("long")))
        .as("pq_codes"),
      mk(array(
        transform(sequence(lit(1L), lit(3L)), x => x * 10L + col("id")),
        transform(sequence(lit(1L), lit(3L)), x => x * 100L - col("id"))))
        .as("pq_tables"),
      // cast (not encode): Cast string->binary keeps child nullability,
      // encode() is force-nullable and would break the non-null shape
      mk(concat(lit("px"), col("id").cast("string"),
        lit(" payload body with spread byte values \\u00ff")).cast("binary"))
        .as("bin"))
  }

  /** name → projection (arrays stringified so Row equality is flat). */
  private val surface: Seq[(String, String)] = Seq(
    "polyhash64" -> "polyhash64(s)",
    "lehmer_hash32" -> "lehmer_hash32(s)",
    "simhash64" -> "simhash64(toks)",
    "hashed_shingles" -> "concat_ws(',', hashed_shingles(toks, 2))",
    "minhash_sig" -> "concat_ws(',', minhash_sig(hashed_shingles(toks, 2), 8))",
    "lsh_sketch64" -> "lsh_sketch64(vec, 8)",
    "dot64" -> "dot64(vec, vec2)",
    "nearest_centroid_l2" -> "nearest_centroid_l2(vec, cents_l2)",
    "nearest_centroid_cos" -> "nearest_centroid_cos(vec, nqd, cents_cos)",
    "pq_adc" -> "pq_adc(pq_codes, pq_tables)",
    "nfc_normalize" -> "nfc_normalize(concat(s, 'e\\u0301'))",
    "ahash64" -> "ahash64(bin)")

  private def run(s: SparkSession, nullable: Boolean, e: String): Seq[String] =
    inputs(s, nullable).selectExpr("id", s"cast(($e) as string) as v")
      .orderBy("id").collect().map(r => s"${r.get(0)}|${r.get(1)}").toSeq

  for ((name, e) <- surface; nullable <- Seq(false, true)) {
    val shape = if (nullable) "nullable" else "non-nullable"
    test(s"$name compiles under CODEGEN_ONLY and matches interpreted ($shape)") {
      val schema = inputs(strict, nullable).schema
      // prove the frame really is the shape the test claims
      assert(schema.fields.filter(_.name != "id").forall(_.nullable == nullable),
        s"fixture must be $shape: $schema")
      assert(run(strict, nullable, e) == run(interpreted, nullable, e))
    }
  }

  test("bloom_might_contain compiles under CODEGEN_ONLY and matches interpreted (both shapes)") {
    val bf = BloomFilter.create(100, 0.03)
    Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L).foreach(bf.putLong)
    val bc = spark.sparkContext.broadcast(bf)
    def run(s: SparkSession, nullable: Boolean): Seq[String] = {
      val base = s.range(24).toDF("id")
      val in = if (nullable) when(col("id") % 3 =!= 0, col("id")) else col("id")
      base.select(col("id"),
          graft.functions.BloomMightContainLong.mightContain(in, bc).as("v"))
        .orderBy("id").collect().map(r => s"${r.get(0)}|${r.get(1)}").toSeq
    }
    for (nullable <- Seq(false, true))
      assert(run(strict, nullable) == run(interpreted, nullable))
  }

  test("dot64 compiles on the exact round-4 breaking shape (collect_list -> array_sort -> transform)") {
    // k-means centroid update builds non-nullable arrays through an
    // aggregate; pre-fix this threw under CODEGEN_ONLY (janino:
    // "project_isNull_N is not an rvalue") and silently ran
    // interpreted in default mode.
    import graft.functions.DotProduct64.dot64
    val cent = strict.range(40)
      .groupBy((col("id") % 4L).as("g"))
      .agg(collect_list(col("id")).as("xs"))
      .select(col("g"),
        transform(array_sort(col("xs")), x => x * 2L + 1L).as("c"))
    val got = cent.select(col("g"), dot64(col("c"), col("c")).as("d"))
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.size == 4 && got.forall(_._2 > 0L))
  }

  test("dot64 length mismatch throws (loud), not null") {
    val df = interpreted.range(1).select(
      transform(sequence(lit(1L), lit(3L)), x => x).as("a"),
      transform(sequence(lit(1L), lit(4L)), x => x).as("b"))
    val ex = intercept[Exception] {
      df.selectExpr("dot64(a, b)").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => Option(c.getMessage).exists(_.contains("length mismatch"))))
  }

  test("dot64: a null array ELEMENT throws loud — never silently reads as 0") {
    // array_remove's result type admits nulls, so this exercises the
    // null-admitting codegen branch; an UnsafeArrayData null element
    // would otherwise read as 0 from the value slot (and a Generic row
    // would NPE instead — two answers for one plan)
    import spark.implicits._
    val df = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(1L), Some(2L), Some(3L))))
      .toDF("a", "b")
    import graft.functions.DotProduct64.dot64
    val ex = intercept[Exception] {
      df.select(dot64(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("null element"))), ex.toString)
    // and the dense form of the same data still computes
    val ok = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("a", "b")
      .select(dot64(col("a"), col("b"))).head().getLong(0)
    assert(ok == 14L)
  }

  test("pq_adc: a null code element throws loud — 0 is a VALID code") {
    import spark.implicits._
    val df = Seq((Seq(Some(0L), None),
      Seq(Seq(10L, 20L), Seq(30L, 40L)))).toDF("codes", "tables")
    val ex = intercept[Exception] {
      df.select(graft.functions.PqAdc.pqAdc(col("codes"), col("tables")))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("null code"))), ex.toString)
  }
}
