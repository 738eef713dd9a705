package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ta7 repetition-statistics kernel: per document, the bigram counts
  * [n_bigrams, top_cnt, dup_cnt] (total bigram instances, the modal
  * bigram's count, and the instances whose bigram occurs more than once)
  * in ONE compiled pass with a per-doc hash map — replacing the exploded
  * (doc_id, bigram) hash aggregate plus the per-doc rollup, two shuffles
  * of the near-full gram stream that every quality-gate consumer (ta7,
  * dq7's funnel, e2e1/e2e4's first stage) paid per run.
  *
  * Tokenization is Spark's own `split(text, ' ')` kernel; a bigram is
  * `tok[i] ++ ' ' ++ tok[i+1]` (wordNgrams' concat_ws over non-null
  * tokens). Outputs are integers; the fraction arithmetic stays in the
  * ordinary column projection, so cross-engine parity is untouched.
  * Callers guard `size(tokens) >= 2`; fewer tokens fails loudly. */
object RepStats {
  private val Space = UTF8String.fromString(" ")

  def stats(text: UTF8String): ArrayData = {
    val tk = text.split(Space, -1)
    require(tk.length >= 2, s"rep_stats requires >= 2 tokens, got ${tk.length}")
    val n = tk.length - 1
    val counts = new java.util.HashMap[String, Int](n * 2 + 1)
    var i = 0
    while (i < n) {
      val g = tk(i).toString + " " + tk(i + 1).toString
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericArrayData(Array(n.toLong, top, dup))
  }
}

/** `rep_stats(text)` → array [n_bigrams, top_cnt, dup_cnt]. Null in →
  * null out. */
case class RepStatsExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rep_stats expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    RepStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RepStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepStatsExpression =
    copy(child = newChild)

  override def prettyName: String = "rep_stats"
}
