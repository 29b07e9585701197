package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(child)` as a native codegen expression — the
  * broadcast-runtime-filter primitive: a driver-built Bloom filter over
  * the SMALL side of a semi-join is shipped as a proper Spark
  * `Broadcast` (one torrent transfer per executor, cached in the block
  * manager) and prunes the LARGE side map-side, before any shuffle or
  * join sees the row. Holding the `Broadcast` handle — not the filter
  * itself — in the expression tree matters at scale: a multi-MB filter
  * embedded in the tree would be serialized into every task closure,
  * paying the transfer once per TASK instead of once per EXECUTOR.
  * False positives pass through (and must be removed by an exact
  * verification join downstream); false negatives never occur, so the
  * filter is result-transparent.
  *
  * Codegen dereferences the broadcast once per operator instance into a
  * mutable member (`addMutableState` init), so the per-row call goes
  * straight into the sketch's primitive `mightContainLong` — no boxing,
  * no UDF dispatch, no per-row `Broadcast.value()` lookup. */
case class BloomMightContainLong(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter = bloom.value

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint, got $t")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val ref = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[Broadcast[_]].getName)
    val local = ctx.addMutableState(bfClass, "graftBloom",
      v => s"$v = ($bfClass) $ref.value();")
    defineCodeGen(ctx, ev, c => s"$local.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  import org.apache.spark.sql.graftx.Bridge

  /** Wrap an already-broadcast filter (caller controls the broadcast
    * lifecycle — destroy it when the query is done). */
  def mightContain(c: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(c), bloom))

  /** Convenience: broadcasts `bloom` on the active session (one
    * broadcast per call — instantiate once per operator, not per row). */
  def mightContain(c: Column, bloom: BloomFilter): Column =
    mightContain(c, SparkSession.active.sparkContext.broadcast(bloom))
}
