package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash over a string's UTF-8 bytes:
  * `h = h * 1000003 + byte` (the multiplier is the FNV-style prime also
  * used by CPython's string hash — public domain arithmetic).
  *
  * A native Catalyst `Expression` with `doGenCode`, so document
  * fingerprinting stays inside WholeStageCodegen — no UDF boxing, no
  * codegen fence. Spark's built-in `hash`/`xxhash64` have a fixed seed
  * and murmur semantics; a polynomial hash is order-sensitive and
  * trivially composable for rolling-window fingerprints, which is what
  * the dedup pipeline wants (SURVEY.md §7.4 north-star ops).
  */
case class PolyHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "polyhash64"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $c.getBytes();
         |long ${ev.value}_h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  ${ev.value}_h = ${ev.value}_h * 1000003L + ($b[$i] & 0xffL);
         |}
         |${ev.value} = ${ev.value}_h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {
  /** Column-level entry point: `polyhash64($"text")`. The child is cast
    * to string here (the expression itself assumes UTF8String input). */
  def polyhash64(c: Column): Column =
    Bridge.column(PolyHash64(Bridge.expression(c.cast("string"))))
}
