package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The winnowing selection kernel (Schleimer, Wilkerson, Aiken 2003 —
  * MOSS): token k-gram det-hashes, minimum per sliding window of w,
  * SORTED DISTINCT selected hashes — in ONE compiled per-document loop.
  * Replaces ta5's four chained array HOFs (transform×3 + array_min over
  * slices), every one of them CodegenFallback, plus a per-gram md5 HEX
  * round-trip (the conv/substring spelling [[DetHash60]] exists to kill).
  *
  * Per gram i: hash = detHash(concat_ws(' ', toks[i..i+k-1]), seed 0) =
  * md5('0' ++ gram) top 60 bits — identical to the column spelling, so
  * the downstream fingerprint (md5 over the comma-joined sorted list,
  * left in ordinary Column projections for oracle parity) is unchanged
  * byte-for-byte; R19QueriesSpec pins the old spelling as witness.
  *
  * The window minimum uses the standard monotone deque, O(grams) total
  * rather than O(grams·w). Callers guard `size(tokens) >= k + w - 1`;
  * shorter input fails loudly (the ta5 filter) rather than silently
  * diverging from the oracle. */
object WinnowMins {
  private val Space = UTF8String.fromString(" ")

  def mins(text: UTF8String, k: Int, w: Int): ArrayData = {
    val tk = text.split(Space, -1)
    val nt = tk.length
    require(nt >= k + w - 1, s"winnow_mins requires >= ${k + w - 1} tokens, got $nt")
    val ng = nt - k + 1
    val hs = new Array[Long](ng)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      sb.append('0') // detHash seed-0 prefix
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tk(i + j).toString)
        j += 1
      }
      hs(i) = DetHash60.hash(UTF8String.fromString(sb.toString))
      i += 1
    }
    // monotone-deque sliding minimum over windows of w
    val sel = new java.util.TreeSet[java.lang.Long]()
    val dq = new Array[Int](ng)
    var head = 0
    var tail = 0 // deque of indices, hs increasing
    i = 0
    while (i < ng) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) sel.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }
}

/** `winnow_mins(text)` → sorted distinct window-min gram hashes (k and w
  * are class parameters, ta5 uses 4/4). Null in → null out. */
case class WinnowMinsExpression(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be positive, got ($k, $w)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_mins expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    WinnowMins.mins(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowMins.mins($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMinsExpression =
    copy(child = newChild)

  override def prettyName: String = "winnow_mins"
}
