package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SimHash kernel (Charikar 2002) as ONE compiled per-document loop —
  * replacing the explode → 64-column bit-sum aggregate spelling
  * (`Dedup.simhashGrouped`), which shuffles the full token stream and pays
  * a 65-column whole-stage-codegen compile (~11 s cold at sf0.1, the
  * dominant dd9 cost) before the first row flows.
  *
  * Per token: bit b < 60 comes from detHash(tok, 101) — md5("101" ++ tok)
  * top 60 bits, the repo-wide [[DetHash60]] kernel — and bits 60+ from
  * seed 102. A bit of the final signature is set iff the token-count with
  * that bit set exceeds half the tokens (2·Σbit > n, the sign test of the
  * ±1 sum). Bit-identical to the grouped spelling by construction — same
  * per-token hashes, same tie rule (sum exactly n/2 → 0) — pinned in
  * R19QueriesSpec; oracle SQL is unchanged.
  *
  * Tokenization is Spark's own `split(text, ' ')` kernel. Null text is
  * null out (the grouped spelling DROPS the row at explode — callers that
  * allow null text must filter; the shipped corpora are non-null). */
object Simhash {
  private val Space = UTF8String.fromString(" ")
  private val Seed101 = "101"
  private val Seed102 = "102"

  def hash(text: UTF8String, bits: Int): Long = {
    val tk = text.split(Space, -1)
    val n = tk.length
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val t = tk(i).toString
      val h = DetHash60.hash(UTF8String.fromString(Seed101 + t))
      val hi = if (bits > 60) DetHash60.hash(UTF8String.fromString(Seed102 + t)) else 0L
      var b = 0
      while (b < bits) {
        val src = if (b < 60) h >>> b else hi >>> (b - 60)
        counts(b) += (src & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) * 2L > n) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** `simhash(text, bits)` — per-document SimHash signature as one codegen
  * loop. `bits` is a class parameter (16 for dd5's compact sketch, 64 for
  * dd9's band keys), not a runtime argument. */
case class SimhashExpression(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    Simhash.hash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Simhash.hash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashExpression =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}
