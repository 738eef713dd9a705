package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared MD5-top-60-bits kernel: the value of
  * `conv(substring(md5(s), 1, 15), 16, 10)::long` computed without the hex
  * round-trip. The first 15 hex characters of the digest are exactly the
  * top 60 bits of its first 8 bytes (big-endian), so the hash is one digest
  * + one shift — no hex string allocation, no base-16 parse. */
object DetHash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    val hi =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    hi >>> 4
  }
}

/** `det_hash60(s)` — the repo-wide deterministic 60-bit hash
  * (graft.queries.Q.detHash) as a native codegen expression.
  *
  * The composable spelling
  * (`conv(substring(md5(cast(x as string)), 1, 15), 16, 10)::long`) runs
  * four expression nodes per row and materializes a 32-char hex UTF8String
  * plus a base-16 parse; this expression is one MD5 digest and a shift.
  * detHash sits in the hot path of every hash-driven operator — each
  * MinHash shingle, each Bloom position derivation, every deterministic
  * sample/split — so the per-row saving multiplies by corpus size.
  *
  * Bit-identical to the composable spelling (the hex prefix of a digest IS
  * its leading bits), so oracle hashes do not move; DetHashSpec pins the
  * equivalence property. Null in → null out, same as md5(null). */
case class DetHash60Expression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"det_hash60 expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    DetHash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DetHash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): DetHash60Expression =
    copy(child = newChild)

  override def prettyName: String = "det_hash60"
}
