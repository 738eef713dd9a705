package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared LCS kernel: length of the longest common subsequence of two token
  * arrays via the classic two-row dynamic program —
  * dp(i)(j) = dp(i−1)(j−1)+1 if aᵢ=bⱼ else max(dp(i−1)(j), dp(i)(j−1)) —
  * O(m·n) time, O(n) space, one int-array allocation per pair. */
object Lcs {
  def len(a: ArrayData, b: ArrayData): Int = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0
    // prev(j) = dp(i−1)(j) over b-prefix length j; rolled per candidate token
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var i = 0
    while (i < m) {
      val x = a.getUTF8String(i)
      var j = 1
      while (j <= n) {
        cur(j) =
          if (x.equals(b.getUTF8String(j - 1))) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }
}

/** `lcs_len(a, b)` — longest-common-subsequence length of two string arrays
  * as a native codegen expression (the ROUGE-L kernel, Lin 2004 §3).
  *
  * LCS is inherently a per-pair dynamic program — no composition of
  * array HOFs expresses the two-dimensional recurrence without an O(n²)
  * array-copy blowup per row (`aggregate` + `array_append` copies the
  * growing row on every element), and HOFs are CodegenFallback anyway.
  * This expression is the [[DetHash60Expression]] pattern: one static
  * JVM kernel ([[Lcs.len]]), called from generated code, O(m·n) ints
  * with two rolling rows.
  *
  * Contract: array elements are non-null (tokenizer output). Callers
  * bound both arrays (a24 truncates to its token budget) — LCS cost is
  * m·n by nature, so the caller, not the kernel, owns the scale bound. */
case class LcsLenExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcs_len expects two array<string>, got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(aAny: Any, bAny: Any): Any =
    Lcs.len(aAny.asInstanceOf[ArrayData], bAny.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Lcs.len($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLenExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "lcs_len"
}
