package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization — the first step
  * of any text-normalization pipeline: visually identical strings with
  * different codepoint sequences (e.g. e + COMBINING ACUTE vs the
  * precomposed é) collapse to one canonical form, so downstream
  * hashing/dedup/tokenization see one representation. Wraps the JDK's
  * `java.text.Normalizer` (Unicode-conformant; DuckDB's
  * `nfc_normalize` implements the identical UAX #15 algorithm, which
  * is what keeps the pipeline oracle-checkable). Codegen emits a
  * direct static call — no UDF serialization, stays inside
  * WholeStageCodegen; the quick-check fast path inside the JDK makes
  * already-NFC text (the overwhelming majority) a near-no-op. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c.cast("string"))))
}
