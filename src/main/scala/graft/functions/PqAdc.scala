package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** ADC (asymmetric distance computation) lookup-sum for product
  * quantization: `(codes: array<bigint>, tables: array<array<bigint>>)`
  * → `Σ_j tables[j][codes[j]]` (codes 0-based).
  *
  * This is PQ search's hot loop — at scale it runs corpus×probes times,
  * and the composable formulation
  * `aggregate(zip_with(codes, tables, (c, t) -> element_at(t, c+1)), 0, _+_)`
  * is CodegenFallback (boxing + two intermediate arrays per row). Here
  * it is one fused primitive loop inside WholeStageCodegen, the same
  * discipline as DotProduct64. The HOF formulation is kept in
  * `Similarity.pqAdcHof` as the equivalence-test reference.
  *
  * Shape violations THROW rather than returning null (mismatched arity
  * or an out-of-range code means the codes and tables come from
  * different codebooks — silently nulling would drop the row from a
  * top-k instead of flagging the bug), which also keeps `nullable`
  * equal to the children's nullability so codegen compiles for both
  * nullability shapes (round-4 lesson, see DotProduct64). */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<array<bigint>>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  /** Shared by interpreted eval and generated code (called from janino-
    * compiled Java, hence public). */
  def compute(codes: ArrayData, tables: ArrayData): Long = {
    val m = codes.numElements()
    if (m != tables.numElements())
      throw PqAdc.arityMismatch(m, tables.numElements())
    var acc = 0L
    var j = 0
    while (j < m) {
      // explicit null-element guards: an UnsafeArrayData null code
      // would otherwise READ AS 0 — a VALID code — and corrupt the
      // distance silently (a GenericArrayData row would NPE instead:
      // two answers for one plan depending on row representation)
      if (codes.isNullAt(j) || tables.isNullAt(j))
        throw PqAdc.nullEntry(j)
      val t = tables.getArray(j)
      val c = codes.getLong(j)
      if (c < 0L || c >= t.numElements())
        throw PqAdc.codeOutOfRange(j, c, t.numElements())
      if (t.isNullAt(c.toInt)) throw PqAdc.nullEntry(j)
      acc += t.getLong(c.toInt)
      j += 1
    }
    acc
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("pqAdc", this)
      // never assigns ev.isNull — see class scaladoc
      s"${ev.value} = $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def pqAdc(codes: Column, tables: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(tables)))

  def arityMismatch(m: Int, t: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"pq_adc: $m codes but $t lookup tables; both must have one entry per subspace")

  def codeOutOfRange(j: Int, c: Long, k: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"pq_adc: code $c in subspace $j outside table size $k; " +
        "codes and tables must come from the same codebook")

  def nullEntry(j: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"pq_adc: null code/table entry in subspace $j; codebooks must be " +
        "dense (a null would otherwise silently read as code 0)")
}
