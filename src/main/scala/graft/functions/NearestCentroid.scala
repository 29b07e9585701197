package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/** Centroid-assignment argmin/argmax as native codegen expressions —
  * the structural fix that removes the corpus-wide shuffle from every
  * clustering pass (k-means, IVF cell assignment).
  *
  * The declarative formulation
  * `crossJoin(broadcast(cents)).groupBy(vec_id).agg(min/max_by(...))`
  * is semantically right but physically wasteful: after a broadcast
  * cross join every vector's k candidate rows are ALREADY co-located
  * in its partition, so the partial aggregate collapses them to one
  * row per vector map-side — and the exchange + final aggregate that
  * follow move the whole corpus (vectors included) to merge groups
  * that each have exactly one row. With the centroid table collected
  * to a single array row and broadcast, the argmin is a pure
  * scan-side PROJECTION: the corpus never shuffles at all, and a
  * Lloyd iteration's only exchange carries k·dim narrow partial sums.
  *
  * A HOF (`aggregate` over the centroid array) would express the same
  * projection but is CodegenFallback — the hot loop would run
  * interpreted with per-element struct boxing, the exact failure mode
  * the round-4 verdict flagged on DotProduct64. These expressions keep
  * the fused loop inside WholeStageCodegen via the compiled-`compute`
  * pattern of `HashedShingles` (one method call per row, no fallback
  * fence; neither assigns `ev.isNull` — see DotProduct64's scaladoc
  * for why that must never happen on possibly-non-nullable children).
  *
  * Both THROW on an empty centroid array or a dimension mismatch
  * (loud, like dot64) — null would flow silently into downstream
  * filters.
  */

/** argmin over squared L2: `(q, cents)` → `struct(cluster, d)` where
  * `cents: array<struct<cluster: bigint, cq: array<bigint>,
  * cqq: bigint>>` and `d = q·q − 2·q·cq + cqq`; ties on `d` break to
  * the lowest cluster id, so the result is independent of centroid
  * array order (collect_list order is scheduling-dependent). */
case class NearestCentroidL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("d", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid_l2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(StructType(Array(
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(LongType, _), _, _),
              StructField(_, LongType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, " +
          "array<struct<bigint, array<bigint>, bigint>>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  /** Query-vector null-element guard, consulted at plan time (see
    * DotProduct64.elemsNullable: a null element reads as 0 on Unsafe
    * rows but NPEs on Generic ones — two answers for one plan). The
    * centroid array is engine-built dense structs and needs no
    * check. */
  private lazy val qNullable: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  def compute(qd: ArrayData, cents: ArrayData): InternalRow = {
    if (qNullable) {
      var k = 0; val nn = qd.numElements()
      while (k < nn) {
        if (qd.isNullAt(k)) throw DotProduct64.nullElement(k); k += 1
      }
    }
    val q = qd.toLongArray()
    val n = q.length
    var qq = 0L
    var i = 0
    while (i < n) { qq += q(i) * q(i); i += 1 }
    val m = cents.numElements()
    if (m == 0) throw NearestCentroidL2.emptyCentroids()
    var found = false
    var bestD = 0L
    var bestC = 0L
    var ci = 0
    while (ci < m) {
      val c = cents.getStruct(ci, 3)
      val cluster = c.getLong(0)
      val cq = c.getArray(1)
      if (cq.numElements() != n)
        throw DotProduct64.lengthMismatch(n, cq.numElements())
      var dot = 0L
      var j = 0
      while (j < n) { dot += q(j) * cq.getLong(j); j += 1 }
      val d = qq - 2L * dot + c.getLong(2)
      if (!found || d < bestD || (d == bestD && cluster < bestC)) {
        bestD = d; bestC = cluster; found = true
      }
      ci += 1
    }
    new GenericInternalRow(Array[Any](bestC, bestD))
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("nearestL2", this)
      s"${ev.value} = $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidL2 =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidL2 {
  /** `struct(cluster, d)` of the nearest centroid by squared L2. */
  def nearestL2(q: Column, cents: Column): Column =
    Bridge.column(NearestCentroidL2(
      Bridge.expression(q), Bridge.expression(cents)))

  def emptyCentroids(): IllegalArgumentException =
    new IllegalArgumentException(
      "nearest_centroid: empty centroid array (no assignment possible)")
}

/** argmax over cosine: `(q, nq, cents)` → nearest `cent_id` where
  * `cents: array<struct<cent_id: bigint, cq: array<bigint>,
  * ncq: double>>` and `cs = double(q·cq) / (nq · ncq)` — the exact
  * arithmetic of `cosineN`, so assignments are bit-identical to the
  * `max_by(struct(cs, −cent_id))` formulation this replaces (double
  * comparison via `Double.compare`; ±0.0 is unreachable — `cs` is an
  * integer dot over a positive product — and NaN from a zero-norm
  * vector orders largest, as Spark's double ordering does). Ties on
  * `cs` break to the lowest cent_id. */
case class NearestCentroidCosine(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid_cos"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), DoubleType,
            ArrayType(StructType(Array(
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(LongType, _), _, _),
              StructField(_, DoubleType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, double, " +
          "array<struct<bigint, array<bigint>, double>>), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}," +
          s" ${third.dataType.simpleString})")
    }

  /** Same plan-time null-element guard as NearestCentroidL2. */
  private lazy val qNullable: Boolean = first.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  def compute(qd: ArrayData, nq: Double, cents: ArrayData): Long = {
    if (qNullable) {
      var k = 0; val nn = qd.numElements()
      while (k < nn) {
        if (qd.isNullAt(k)) throw DotProduct64.nullElement(k); k += 1
      }
    }
    val q = qd.toLongArray()
    val n = q.length
    val m = cents.numElements()
    if (m == 0) throw NearestCentroidL2.emptyCentroids()
    var found = false
    var bestCs = 0.0
    var bestC = 0L
    var ci = 0
    while (ci < m) {
      val c = cents.getStruct(ci, 3)
      val centId = c.getLong(0)
      val cq = c.getArray(1)
      if (cq.numElements() != n)
        throw DotProduct64.lengthMismatch(n, cq.numElements())
      var dot = 0L
      var j = 0
      while (j < n) { dot += q(j) * cq.getLong(j); j += 1 }
      val cs = dot.toDouble / (nq * c.getDouble(2))
      val cmp = if (found) java.lang.Double.compare(cs, bestCs) else 1
      if (cmp > 0 || (cmp == 0 && centId < bestC)) {
        bestCs = cs; bestC = centId; found = true
      }
      ci += 1
    }
    bestC
  }

  protected override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val ref = ctx.addReferenceObj("nearestCos", this)
      s"${ev.value} = $ref.compute($a, $b, $c);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): NearestCentroidCosine =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestCentroidCosine {
  /** `cent_id` of the nearest centroid by cosine similarity. */
  def nearestCos(q: Column, nq: Column, cents: Column): Column =
    Bridge.column(NearestCentroidCosine(Bridge.expression(q),
      Bridge.expression(nq), Bridge.expression(cents)))
}
