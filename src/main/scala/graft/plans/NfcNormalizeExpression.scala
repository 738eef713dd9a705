package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared NFC kernel behind `nfc_normalize`. The
  * `Normalizer.isNormalized` quick-check makes already-normalized text
  * (all ASCII, most NFC web text) a zero-allocation pass-through — the
  * common case at scan speed; only strings that actually decompose pay the
  * normalize + re-encode. */
object Nfc {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(s)` — Unicode NFC normalization as a native codegen
  * expression (deliberately named after DuckDB's builtin so the oracle SQL
  * reads identically). NFC is the standard first step of every
  * multilingual LLM pre-clean (CCNet, Wenzek et al. 2020 normalizes before
  * anything else): composes e + U+0301 into é etc., so downstream
  * tokenize/gram/dedup operators see one canonical byte form per grapheme
  * — without it, visually identical documents hash differently and
  * near-dup/contamination screens silently miss.
  *
  * Both engines implement Unicode canonical composition per UAX #15, so
  * results are byte-identical cross-engine. Null in → null out. */
case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    Nfc.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Nfc.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}
