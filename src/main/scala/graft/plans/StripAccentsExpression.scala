package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared accent-fold kernel behind `strip_accents`: NFD canonical
  * decomposition, then drop nonspacing combining marks (category Mn), no
  * recomposition — é→e, Å→A, ñ→n, while ø and ß (no canonical
  * decomposition) pass through. This is exactly the semantics of DuckDB's
  * utf8proc-backed `strip_accents` builtin (probed r10: both precomposed
  * and decomposed inputs fold to the same base letters; ø/ß untouched).
  * The isNormalized(NFD)-free fast path: pure-ASCII (the overwhelmingly
  * common case) short-circuits without allocation. */
object StripAccents {
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val ch = nfd.charAt(j)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `strip_accents(s)` — diacritic folding as a native codegen expression,
  * named after the DuckDB builtin so oracle SQL reads identically. The
  * search/dedup normalizer one notch stronger than F21's NFC: where NFC
  * canonicalizes byte forms of the SAME text, this folds visually-close
  * variants ("café" vs "cafe") onto one key — the standard move before
  * fuzzy matching, gazetteer lookup, and cross-lingual dedup keys.
  * Null in → null out. */
case class StripAccentsExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpression =
    copy(child = newChild)

  override def prettyName: String = "strip_accents"
}
