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

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  /** name → (arity-checked builder, usage doc). */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("polyhash64",
      { es: Seq[Expression] => PolyHash64(es.head) },
      "polyhash64(str) - order-sensitive 64-bit polynomial rolling hash"),
    ("dot64",
      { es: Seq[Expression] => DotProduct64(es(0), es(1)) },
      "dot64(array<long>, array<long>) - integer dot product"),
    ("simhash64",
      { es: Seq[Expression] => SimHash64(es.head) },
      "simhash64(array<string>) - 64-bit SimHash of a token array"),
    ("hashed_shingles",
      { es: Seq[Expression] =>
        HashedShingles(es.head,
          if (es.length > 1) intArg(es(1), "hashed_shingles", 2) else 3) },
      "hashed_shingles(array<string>[, w]) - distinct xxhash64 of w-token shingles"),
    ("minhash_sig",
      { es: Seq[Expression] =>
        MinHashSig(es.head,
          if (es.length > 1) intArg(es(1), "minhash_sig", 2) else 32) },
      "minhash_sig(array<long>[, k]) - k-position MinHash signature"))

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
