package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit average-hash (aHash) of a thumbnail byte payload — the
  * perceptual-hash primitive under `Multimodal.imageDupCandidates`:
  * bit i of the fingerprint is set iff pixel i exceeds the thumbnail
  * mean, computed as the EXACT integer comparison `px_i · n > Σpx`
  * (no double rounding anywhere). Pixels are the payload bytes
  * unsigned; only the first min(n, 64) bytes can map to fingerprint
  * bits (the dedup path always feeds 8×8 = 64-byte thumbnails from
  * `Multimodal.resize`, where `n = 64` makes this bit-for-bit the
  * original typed-map formulation — equivalence is spec-pinned).
  *
  * Why an expression: the hash is pure per-row integer arithmetic —
  * as a typed `Dataset.map` it paid an encoder round-trip per row and
  * sat outside WholeStageCodegen (measured as the bench's #2 cpu
  * entry); as a unary expression it fuses into the projection that
  * consumes the codec seam's output, same trade as `SimHash64` /
  * `PolyHash64`.
  *
  * Null payload → null (nullIntolerant); empty payload → 0L.
  */
case class AHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ahash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ahash64 expects a binary payload, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
    var out = 0L
    val bits = if (n < 64) n else 64
    i = 0
    while (i < bits) {
      if ((bytes(i) & 0xff).toLong * n > sum) out |= (1L << i)
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      val bits = ctx.freshName("bits")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $c.length;
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ($c[$i] & 0xff);
         |}
         |long $out = 0L;
         |final int $bits = $n < 64 ? $n : 64;
         |for (int $i = 0; $i < $bits; $i++) {
         |  if ((long) ($c[$i] & 0xff) * $n > $sum) $out |= (1L << $i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

object AHash64 {
  /** Column-level entry point: `ahash64($"media")` over a `binary`
    * thumbnail column. */
  def ahash64(media: Column): Column =
    Bridge.column(AHash64(Bridge.expression(media)))
}
