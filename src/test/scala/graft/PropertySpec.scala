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
}
