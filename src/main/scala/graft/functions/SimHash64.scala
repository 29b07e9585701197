package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array (Charikar 2002, "Similarity
  * estimation techniques from rounding algorithms"): bit b of the
  * fingerprint is set iff more than half of the tokens have bit b set
  * in their 64-bit hash. Token hash = XXH64(seed 42) over the token's
  * UTF-8 bytes — bit-for-bit identical to Spark's builtin `xxhash64`,
  * so this expression is provably equivalent to the higher-order
  * function formulation (`Dedup.simhash64Hof`, equivalence-tested in
  * ScaleOpsSpec) while doing the whole O(tokens × 64) bit-count in one
  * tight primitive loop inside WholeStageCodegen instead of nested
  * `aggregate`/`zip_with` array churn (measured ~6× faster at sf0.1).
  *
  * Null array → null (nullIntolerant); empty array → 0L; null tokens
  * contribute no bits but do count toward the majority threshold
  * (token arrays from `split` contain no nulls, so this is unreachable
  * on the dedup path).
  */
case class SimHash64(child: Expression, poly: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (poly) "simhash64_poly" else "simhash64"

  /** Token hash: seeded XXH64 by default; `poly` switches to the
    * polyhash64 rolling hash — portable mod-2^64 arithmetic any SQL
    * engine reproduces (the oracle-checkable variant), same majority
    * vote on top. */
  private def tokenHash(s: org.apache.spark.unsafe.types.UTF8String): Long =
    if (!poly) XXH64.hashUTF8String(s, 42L)
    else {
      val bytes = s.getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = h * 1000003L + (bytes(i) & 0xffL)
        i += 1
      }
      h
    }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val bs = ctx.freshName("bs")
      val out = ctx.freshName("out")
      val hashCode =
        if (!poly) s"final long $h = $xxh.hashUTF8String($c.getUTF8String($i), 42L);"
        else s"""
           |byte[] $bs = $c.getUTF8String($i).getBytes();
           |long $h = 0L;
           |for (int $j = 0; $j < $bs.length; $j++) {
           |  $h = $h * 1000003L + ($bs[$j] & 0xffL);
           |}
         """.stripMargin
      s"""
         |final int $n = $c.numElements();
         |final int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    $hashCode
         |    for (int $b = 0; $b < 64; $b++) {
         |      $counts[$b] += (int) (($h >>> $b) & 1L);
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] * 2 > $n) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-level entry point: `simhash64($"tokens")` over an
    * `array<string>` column. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** Portable-hash variant (polyhash64 token hashes). */
  def simhash64Poly(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens), poly = true))
}
