package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vec_sqdist(a, b)` — Σ (aᵢ−bᵢ)² folded left-to-right in index order, as
  * a native codegen expression: the squared-L2 sibling of
  * [[VecDotExpression]].
  *
  * The composable spelling (`aggregate(zip_with(a, b, sub²), 0.0, add)`)
  * allocates an intermediate array and interprets two lambdas per
  * evaluation; the PQ encode (ss4) evaluates 8 subspaces × 16 codes of it
  * per corpus row, so the interpreted cost dominates
  * (`Similarity.pqEncode`). This expression emits one fused
  * subtract-multiply-add loop inside whole-stage codegen.
  *
  * Accumulation order and widths match the HOF spelling exactly (elements
  * cast to double, terms added left-to-right into a double accumulator), so
  * results are bit-identical — e9-rounded distances and oracle hashes do
  * not move.
  *
  * Contract: elements are non-null; the shorter length wins if lengths
  * differ (our subvector slices are fixed-width, so this never triggers).
  */
case class VecSqDistExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sqdist expects two array<float|double>, got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def get(arr: String, t: DataType): String = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${get(a, elemType(left))} - ${get(b, elemType(right))};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDistExpression =
    copy(left = newLeft, right = newRight)
}
