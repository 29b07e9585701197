package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftx.Bridge

/** SQL registration for the library's native expressions, so the
  * analyst SQL surface (`spark.sql`) reaches them exactly like
  * built-ins:
  *
  *   SELECT simhash64(split(text, '\\s+')) FROM documents
  *   SELECT minhash_sig(hashed_shingles(split(text,'\\s+'), 3), 32) ...
  *
  * Two wirings, same function table:
  *  - cluster deployment: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (injected before session state is built — the standard
  *    extension-library mechanism);
  *  - existing session (tests, notebooks): `GraftFunctions.register(spark)`.
  */
object GraftFunctions {

  /** Arity gate with an analysis-style message (surfaced at resolution
    * time) instead of a bare head/apply IndexOutOfBounds. */
  private def arity(fn: String, es: Seq[Expression], min: Int, max: Int): Unit =
    if (es.size < min || es.size > max) {
      val want = if (min == max) s"$min" else s"$min to $max"
      throw new IllegalArgumentException(
        s"$fn expects $want argument(s), got ${es.size}")
    }

  /** Positive-integer literal parameter: any foldable integral
    * expression is accepted — builders run BEFORE constant folding, so
    * a SQL `CAST(16 AS BIGINT)` arrives as a Cast over a literal, not a
    * Literal; evaluating the foldable subtree covers every integral
    * spelling. Non-positive values are rejected here rather than as a
    * NegativeArraySizeException at runtime. */
  private def posIntArg(e: Expression, fn: String, pos: Int): Int = {
    val folded: Option[Long] =
      if (!e.foldable) None
      else try e.eval(null) match {
        case i: Int   => Some(i.toLong)
        case l: Long  => Some(l)
        case s: Short => Some(s.toLong)
        case b: Byte  => Some(b.toLong)
        case _        => None
      } catch { case _: Exception => None }
    folded match {
      case Some(v) if v >= 1 && v <= Int.MaxValue => v.toInt
      case _ => throw new IllegalArgumentException(
        s"$fn: argument $pos must be a positive integer literal, got $e")
    }
  }

  /** name → (arity-checked builder, usage doc). */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("polyhash64",
      { es: Seq[Expression] =>
        arity("polyhash64", es, 1, 1); PolyHash64(es.head) },
      "polyhash64(str) - order-sensitive 64-bit polynomial rolling hash"),
    ("dot64",
      { es: Seq[Expression] =>
        arity("dot64", es, 2, 2); DotProduct64(es(0), es(1)) },
      "dot64(array<long>, array<long>) - integer dot product"),
    ("simhash64",
      { es: Seq[Expression] =>
        arity("simhash64", es, 1, 1); SimHash64(es.head) },
      "simhash64(array<string>) - 64-bit SimHash of a token array"),
    ("hashed_shingles",
      { es: Seq[Expression] =>
        arity("hashed_shingles", es, 1, 2)
        HashedShingles(es.head,
          if (es.length > 1) posIntArg(es(1), "hashed_shingles", 2) else 3) },
      "hashed_shingles(array<string>[, w]) - distinct xxhash64 of w-token shingles"),
    ("minhash_sig",
      { es: Seq[Expression] =>
        arity("minhash_sig", es, 1, 2)
        MinHashSig(es.head,
          if (es.length > 1) posIntArg(es(1), "minhash_sig", 2) else 32) },
      "minhash_sig(array<long>[, k]) - k-position MinHash signature"),
    ("lehmer_hash32",
      { es: Seq[Expression] =>
        arity("lehmer_hash32", es, 1, 1); LehmerHash32(es.head) },
      "lehmer_hash32(str) - portable char-level polynomial hash mod 2^31-1"),
    ("lsh_sketch64",
      { es: Seq[Expression] =>
        arity("lsh_sketch64", es, 1, 2)
        LshSketch64(es.head,
          if (es.length > 1) posIntArg(es(1), "lsh_sketch64", 2) else 8) },
      "lsh_sketch64(array<long>[, planes]) - sign-random-projection LSH sketch"),
    ("nearest_centroid_l2",
      { es: Seq[Expression] =>
        arity("nearest_centroid_l2", es, 2, 2)
        NearestCentroidL2(es(0), es(1)) },
      "nearest_centroid_l2(array<long>, array<struct<long,array<long>,long>>)" +
        " - struct(cluster, d) of the squared-L2-nearest centroid"),
    ("nearest_centroid_cos",
      { es: Seq[Expression] =>
        arity("nearest_centroid_cos", es, 3, 3)
        NearestCentroidCosine(es(0), es(1), es(2)) },
      "nearest_centroid_cos(array<long>, double, array<struct<long,array<long>,double>>)" +
        " - cent_id of the cosine-nearest centroid"),
    ("pq_adc",
      { es: Seq[Expression] =>
        arity("pq_adc", es, 2, 2); PqAdc(es(0), es(1)) },
      "pq_adc(array<long>, array<array<long>>) - product-quantization" +
        " asymmetric-distance lookup sum: sum_j tables[j][codes[j]]"),
    ("ahash64",
      { es: Seq[Expression] =>
        arity("ahash64", es, 1, 1); AHash64(es.head) },
      "ahash64(binary) - 64-bit perceptual average-hash of a thumbnail payload"),
    ("nfc_normalize",
      { es: Seq[Expression] =>
        arity("nfc_normalize", es, 1, 1); NfcNormalize(es.head) },
      "nfc_normalize(str) - Unicode NFC canonical-composition normalization"),
    ("unsigned_to_double",
      { es: Seq[Expression] =>
        arity("unsigned_to_double", es, 1, 1); UnsignedToDouble(es.head) },
      "unsigned_to_double(long) - reinterpret as unsigned 64-bit, " +
        "correctly-rounded conversion to double"),
    ("kmv_sketch",
      { es: Seq[Expression] =>
        arity("kmv_sketch", es, 1, 2)
        KmvSketch(es.head,
          if (es.length > 1) posIntArg(es(1), "kmv_sketch", 2) else 16)
          .toAggregateExpression() },
      "kmv_sketch(hash[, k]) - AGGREGATE: the k smallest distinct hash " +
        "values in unsigned order (KMV distinct-cardinality sketch state)"),
    ("cms_sketch",
      { es: Seq[Expression] =>
        arity("cms_sketch", es, 1, 3)
        CmsSketch(es.head,
          if (es.length > 1) posIntArg(es(1), "cms_sketch", 2) else 4,
          if (es.length > 2) posIntArg(es(2), "cms_sketch", 3) else 1024)
          .toAggregateExpression() },
      "cms_sketch(hash[, depth[, width]]) - AGGREGATE: Count-Min counter " +
        "matrix (row-major array<long>), mergeable constant state"),
    ("hll_sketch",
      { es: Seq[Expression] =>
        arity("hll_sketch", es, 1, 2)
        HllSketch(es.head,
          if (es.length > 1) posIntArg(es(1), "hll_sketch", 2) else 10)
          .toAggregateExpression() },
      "hll_sketch(hash[, p]) - AGGREGATE: HyperLogLog registers " +
        "(array<int> of 2^p, per-bucket max rank), mergeable constant " +
        "state; feed a full-avalanche hash (see HllSketch.mix64)"))

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", "", name, usage,
      "", "", "", "", "1.0.0", "", "scala_udf")

  /** Register into an already-running session's function registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder, usage) =>
      Bridge.registerFunction(spark, FunctionIdentifier(name),
        info(name, usage), builder)
    }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder, usage) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", "", name, usage,
          "", "", "", "", "1.0.0", "", "scala_udf"),
        builder))
    }
}
