package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.AhoCorasick

/** FM1 as a native Catalyst expression:
  * `fast_match(text, array('cand', ...))` →
  * `array<struct<matched:string, start:int, end:int>>`.
  *
  * The candidate set must be foldable (a literal array): the Aho-Corasick
  * automaton is built once per expression instance, lazily on first eval —
  * i.e. once per executor after the expression tree ships with the task
  * closure, exactly the broadcast-trie plan SURVEY §2.8 calls for. Matching
  * is case-insensitive (reference `utils/fastmatch.py:10-11` lowercases both
  * sides).
  *
  * CodegenFallback is deliberate: the scan loop dominates cost and already
  * runs as tight JVM code inside the automaton; wholestage codegen around a
  * per-row automaton call buys nothing measurable at this operator's
  * arity. */
case class FastMatchExpression(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("matched", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val okTypes = left.dataType == StringType &&
      (right.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      })
    if (!okTypes)
      TypeCheckResult.TypeCheckFailure(
        s"fast_match expects (string, array<string>), got (${left.dataType.sql}, ${right.dataType.sql})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("fast_match candidates must be a literal (foldable) array")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val automaton: AhoCorasick = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val pats = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString.toLowerCase)
    AhoCorasick.build(pats)
  }

  override def nullSafeEval(textAny: Any, candidatesAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String].toString
    val hits = automaton.findAll(text.toLowerCase)
    new GenericArrayData(hits.map { case (m, s, e) =>
      InternalRow(UTF8String.fromString(m), s, e)
    }.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FastMatchExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "fast_match"
}
