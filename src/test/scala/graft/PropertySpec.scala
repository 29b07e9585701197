package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the deterministic primitives (pure
  * driver-side checks mirroring the distributed expressions, plus
  * spot-checks through Spark itself). Uses scalacheck Gen directly
  * with a fixed seed (no scalatestplus bridge in the offline deps). */
class PropertySpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def polyRef(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))

  test("polyhash64 is a rolling hash: h(a++b) = h(a)*P^|b| + h(b)") {
    for ((a, b) <- samples(Gen.zip(Gen.asciiPrintableStr, Gen.asciiPrintableStr), 200)) {
      val pPow = b.getBytes("UTF-8").foldLeft(1L)((acc, _) => acc * 1000003L)
      assert(polyRef(a + b) == polyRef(a) * pPow + polyRef(b), s"a=$a b=$b")
    }
  }

  test("polyhash64 expression agrees with the reference fold on arbitrary strings") {
    import spark.implicits._
    val strs = samples(Gen.asciiPrintableStr, 64).filter(_.nonEmpty).distinct
    val got = strs.toDF("s")
      .select(graft.functions.PolyHash64.polyhash64(col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == strs.map(polyRef))
  }

  test("Sampling.bucket: in range, deterministic, matches driver-side reference") {
    val bucketRef: Long => Long = id =>
      math.floorMod(math.floorMod(id, 1000003L) * 2654435761L, 10000L)
    for (id <- samples(Gen.chooseNum(0L, Long.MaxValue / 2), 500)) {
      val b = bucketRef(id)
      assert(b >= 0 && b < 10000, s"id=$id -> $b")
    }
    import spark.implicits._
    val ids = samples(Gen.chooseNum(0L, Long.MaxValue / 2), 32).distinct
    val got = ids.toDF("doc_id")
      .select(graft.ext.Sampling.bucket(col("doc_id"), 10000))
      .collect().map(_.getLong(0)).toSeq
    assert(got == ids.map(bucketRef))
  }

  test("shingle count = max(|words|-w+1, 1) before dedup (w=3)") {
    import spark.implicits._
    val sizes = samples(Gen.chooseNum(1, 40), 12).distinct
    val texts = sizes.map(n => (1 to n).map(i => s"w$i").mkString(" "))
    val got = texts.toDF("text")
      .select(size(graft.ext.Dedup.shingles(col("text"))))
      .collect().map(_.getInt(0)).toSeq
    assert(got == sizes.map(n => math.max(n - 2, 1)))
  }

  test("hashedShingles == xxhash64 over string shingles on arbitrary unicode text") {
    import spark.implicits._
    // arbitrary unicode incl. whitespace runs, empty strings, CJK
    val gen = Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableStr, Gen.const("  "), Gen.const("\t"),
      Gen.const("文字"), Gen.const("ё"))).map(_.mkString(" "))
    val texts = samples(gen, 64).distinct
    val df = texts.toDF("text")
      .select(split(trim(col("text")), "\\s+").as("ws"))
    val native = df
      .select(graft.functions.HashedShingles.hashedShingles(col("ws"), 3))
      .collect().map(_.getSeq[Long](0).toSet).toSeq
    val viaStrings = df
      .select(transform(graft.ext.Dedup.shinglesFromWords(col("ws"), 3),
        s => xxhash64(s)))
      .collect().map(_.getSeq[Long](0).toSet).toSeq
    assert(native == viaStrings)
  }

  test("minhashSig == HOF formulation on arbitrary long arrays (incl. overflow)") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val arrays = samples(gen, 48).distinct.filter(_.nonEmpty)
    val df = arrays.toDF("hs")
    val native = df.select(graft.functions.MinHashSig.minhashSig(col("hs"), 16))
      .collect().map(_.getSeq[Long](0)).toSeq
    val hof = df.select(graft.ext.Dedup.minhashSignature(col("hs"), 16))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(native == hof)
  }
}
