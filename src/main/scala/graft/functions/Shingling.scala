package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expressions for the dedup tier's hottest per-row
  * loops. Both are provably equivalent to the pure-builtins
  * formulations they replace (equivalence-tested in ScaleOpsSpec) and
  * stay inside WholeStageCodegen via a single compiled-method call —
  * no UDF boxing, no CodegenFallback fence, no per-lambda-element
  * re-interpretation.
  */

/** Distinct 64-bit hashes of the w-token shingles of a token array —
  * the fused form of `shinglesFromWords` + `xxhash64` per shingle:
  *
  *   shingle_i = concat_ws(" ", tokens[i .. i+w-1])   for i ∈ [0, max(n-w, 0)]
  *   out       = distinct xxhash64(shingle_i)          (seed 42)
  *
  * exactly mirroring the string path's semantics: a doc with fewer
  * than w tokens yields ONE shingle of the available tokens
  * (out-of-range positions are skipped, as `concat_ws` skips the NULLs
  * `element_at` produces there), and distinct-on-hash ≡
  * distinct-on-string modulo xxhash64 collisions — the standard
  * shingle-hashing trade (~|sh|²/2⁶⁴ per doc).
  */
case class HashedShingles(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_shingles"

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val lastStart = math.max(n - w, 0)
    val seen = new java.util.HashSet[java.lang.Long](lastStart + 2)
    val out = new Array[Long](lastStart + 1)
    var m = 0
    val parts = new Array[UTF8String](w)
    var i = 0
    while (i <= lastStart) {
      var j = 0
      while (j < w) {
        parts(j) = if (i + j < n && !arr.isNullAt(i + j)) arr.getUTF8String(i + j)
                   else null // concatWs skips nulls, like concat_ws
        j += 1
      }
      val h = XXH64.hashUTF8String(UTF8String.concatWs(SPACE, parts: _*), 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  private val SPACE = UTF8String.fromString(" ")

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("shingler", this)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  /** `hashedShingles($"tokens", 3)` over an `array<string>` column. */
  def hashedShingles(tokens: Column, w: Int = 3): Column =
    Bridge.column(HashedShingles(Bridge.expression(tokens), w))
}

/** k-position MinHash signature over an array of shingle hashes, the
  * Kirsch–Mitzenmacher construction (`h_i = h·(2i+1) + i·φ` in
  * wrapping 64-bit arithmetic): one pass over the hashes updating k
  * running minima, replacing k separate `array_min(transform(...))`
  * interpreted passes. NULL hash elements are skipped (as `array_min`
  * skips them); an empty/all-null input yields an all-NULL signature —
  * both unreachable from `HashedShingles` output but kept for exact
  * equivalence with the HOF formulation.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  private val PHI = -7046029254386353131L

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](k)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        if (!any) {
          var b = 0
          while (b < k) { mins(b) = h * (2L * b + 1) + b * PHI; b += 1 }
          any = true
        } else {
          var b = 0
          while (b < k) {
            val v = h * (2L * b + 1) + b * PHI
            if (v < mins(b)) mins(b) = v
            b += 1
          }
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins)
  }

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("minhasher", this)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** `minhashSig($"shingle_hashes", 32)` over an `array<long>` column. */
  def minhashSig(hs: Column, k: Int = 32): Column =
    Bridge.column(MinHashSig(Bridge.expression(hs), k))
}
