package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(child)` as a native codegen expression — the
  * broadcast-runtime-filter primitive: a driver-built Bloom filter over
  * the SMALL side of a semi-join rides into every task as one compact
  * bit array (size = O(bits), independent of the key count's hash-map
  * footprint) and prunes the LARGE side map-side, before any shuffle
  * or join sees the row. False positives pass through (and must be
  * removed by an exact verification join downstream); false negatives
  * never occur, so the filter is result-transparent.
  *
  * The filter object is attached via `ctx.addReferenceObj`, so
  * whole-stage codegen calls straight into the sketch's primitive
  * `mightContainLong` — no boxing, no UDF dispatch. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint, got $t")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  import org.apache.spark.sql.graftx.Bridge
  def mightContain(c: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(c), bloom))
}
