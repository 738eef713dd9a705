package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared Levenshtein kernel over token ARRAYS: unit-cost insert/delete/
  * substitute via the classic two-row DP — O(m·n) time, O(n) space. The
  * builtin `levenshtein` works on characters; WER needs distance in TOKEN
  * edits (Spark has no token-level variant, and mapping tokens to
  * surrogate chars caps the vocabulary — this kernel has no such cap). */
object EditDist {
  def dist(a: ArrayData, b: ArrayData): Int = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0) return n
    if (n == 0) return m
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      val x = a.getUTF8String(i - 1)
      cur(0) = i
      j = 1
      while (j <= n) {
        val sub = prev(j - 1) + (if (x.equals(b.getUTF8String(j - 1))) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        cur(j) = math.min(sub, math.min(del, ins))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }
}

/** `tok_edit_dist(a, b)` — token-level Levenshtein distance of two string
  * arrays as a native codegen expression (the WER kernel: WER =
  * edit_dist(hyp, ref) / |ref|, the ASR/generation-eval standard). Same
  * design as [[LcsLenExpression]]: the 2-D recurrence doesn't compose from
  * array HOFs without quadratic copying, so one static JVM kernel
  * ([[EditDist.dist]]) runs inside the projection. Callers bound both
  * arrays (a25 truncates to its token budget) — cost is m·n by nature.
  * Contract: elements non-null (tokenizer output). */
case class EditDistExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tok_edit_dist expects two array<string>, got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(aAny: Any, bAny: Any): Any =
    EditDist.dist(aAny.asInstanceOf[ArrayData], bAny.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.EditDist.dist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "tok_edit_dist"
}
