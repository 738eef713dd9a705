package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The chrF clip kernel: per (candidate, reference) pair, the character-
  * trigram overlap statistics [m, cand_ngrams, ref_ngrams] where
  * m = Σ_g min(count_cand(g), count_ref(g)) — one compiled pass with a
  * per-pair hash map instead of exploding every gram into a
  * (pair_id, gram) hash aggregate (a 500-char doc emits ~500 gram rows;
  * at sf1 the exploded stream shuffles ~2.4 GB of partially-aggregated
  * gram rows, while the paired texts are ~250 MB).
  *
  * Gram definition matches the SQL spelling exactly: trigrams over CODE
  * POINTS (`split(text, '')` splits between code points; `substring` in
  * the DuckDB twin is code-point based), n = code-point count. Outputs
  * are integers — the float F-score stays in the ordinary column
  * projection, so cross-engine parity is untouched. */
object ChrfCounts {
  def counts(cand: UTF8String, ref: UTF8String): ArrayData = {
    val c = cand.toString
    val r = ref.toString
    // code-point offsets; trigram i = substring(off(i), off(i+3))
    def offsets(s: String): Array[Int] = {
      val n = s.codePointCount(0, s.length)
      val off = new Array[Int](n + 1)
      var i = 0; var p = 0
      while (p < s.length) { off(i) = p; i += 1; p += Character.charCount(s.codePointAt(p)) }
      off(n) = s.length
      off
    }
    val co = offsets(c)
    val ro = offsets(r)
    val cn = math.max(co.length - 1 - 2, 0)
    val rn = math.max(ro.length - 1 - 2, 0)
    val refCounts = new java.util.HashMap[String, Int](rn * 2 + 1)
    var i = 0
    while (i < rn) {
      val g = r.substring(ro(i), ro(i + 3))
      val prev = refCounts.get(g)
      refCounts.put(g, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var m = 0L
    i = 0
    while (i < cn) {
      val g = c.substring(co(i), co(i + 3))
      val left = refCounts.get(g)
      if (left != null && left > 0) { m += 1; refCounts.put(g, left - 1) }
      i += 1
    }
    new GenericArrayData(Array(m, cn.toLong, rn.toLong))
  }
}

/** `chrf_counts(cand, ref)` → array [m, cand_ngrams, ref_ngrams]. Null on
  * either side → null (a missing pair side drops downstream, matching the
  * exploded spelling where it contributes zero grams). */
case class ChrfCountsExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chrf_counts expects (string, string), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(cand: Any, ref: Any): Any =
    ChrfCounts.counts(cand.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.plans.ChrfCounts.counts($c, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ChrfCountsExpression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "chrf_counts"
}
