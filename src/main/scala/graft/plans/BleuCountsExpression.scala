package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The BLEU-2 clip kernel: per (candidate, reference) pair, the clipped
  * unigram/bigram statistics [m1, c_len, r_len, m2, t2] — one compiled
  * pass with per-pair hash maps instead of exploding every token and
  * bigram into a (pair_id, n, gram) hash aggregate (the a23 shuffle
  * argument, on the token domain). Tokenization is Spark's own
  * `split(text, ' ')` kernel (UTF8String.split, empty tokens kept), and
  * a bigram exists only when the side has ≥ 2 tokens — exactly
  * `wordNgrams(tk, 2)`. Outputs are integers; the brevity penalty and
  * geometric mean stay in the ordinary column projection, so
  * cross-engine float parity is untouched. */
object BleuCounts {
  private val Space = UTF8String.fromString(" ")

  def counts(cand: UTF8String, ref: UTF8String): ArrayData = {
    val ct = cand.split(Space, -1)
    val rt = ref.split(Space, -1)
    // unigram clip: each cand token consumes one ref credit
    val uni = new java.util.HashMap[UTF8String, Int](rt.length * 2 + 1)
    var i = 0
    while (i < rt.length) {
      val prev = uni.get(rt(i))
      uni.put(rt(i), if (prev == null) 1 else prev + 1)
      i += 1
    }
    var m1 = 0L
    i = 0
    while (i < ct.length) {
      val left = uni.get(ct(i))
      if (left != null && left > 0) { m1 += 1; uni.put(ct(i), left - 1) }
      i += 1
    }
    // bigram clip over "tok[i] tok[i+1]" string keys
    val rBi = math.max(rt.length - 1, 0)
    val cBi = math.max(ct.length - 1, 0)
    val bi = new java.util.HashMap[String, Int](rBi * 2 + 1)
    i = 0
    while (i < rBi) {
      val g = rt(i).toString + " " + rt(i + 1).toString
      val prev = bi.get(g)
      bi.put(g, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var m2 = 0L
    i = 0
    while (i < cBi) {
      val g = ct(i).toString + " " + ct(i + 1).toString
      val left = bi.get(g)
      if (left != null && left > 0) { m2 += 1; bi.put(g, left - 1) }
      i += 1
    }
    new GenericArrayData(Array(m1, ct.length.toLong, rt.length.toLong, m2, cBi.toLong))
  }
}

/** `bleu_counts(cand, ref)` → array [m1, c_len, r_len, m2, t2]. Null on
  * either side → null (the pair drops downstream, matching the exploded
  * spelling's zero-count filter). */
case class BleuCountsExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bleu_counts expects (string, string), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(cand: Any, ref: Any): Any =
    BleuCounts.counts(cand.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.plans.BleuCounts.counts($c, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BleuCountsExpression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "bleu_counts"
}
