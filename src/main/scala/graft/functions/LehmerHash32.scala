package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable char-level polynomial hash: `h = (h·31 + codepoint) mod
  * 2³¹−1`, seed 7 — the token hash behind
  * `TextAnalysis.featureHashVectors`. Lives inside WholeStageCodegen
  * (the HOF spelling `aggregate(split(tok,''), ...)` is
  * CodegenFallback and allocates a per-token char array — this is the
  * fused loop, same recurrence, equivalence-tested).
  *
  * Iterates CODE POINTS (not UTF-16 units or bytes): `ascii()`/DuckDB
  * `ord()` return code points, and every intermediate stays < 2⁴²,
  * so any engine reproduces the value from a 31^k power table — what
  * keeps the feature-hash pipeline oracle-checkable (unlike seeded
  * xxhash64). */
case class LehmerHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lehmer_hash32"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long ${ev.value}_h = 7L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  ${ev.value}_h = (${ev.value}_h * 31L + $cp) % 2147483647L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = ${ev.value}_h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LehmerHash32 =
    copy(child = newChild)
}

object LehmerHash32 {
  def lehmerHash32(c: Column): Column =
    Bridge.column(LehmerHash32(Bridge.expression(c.cast("string"))))
}
