package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The 16-way MinHash signature of a document in ONE compiled loop — the
  * kernel behind `graft.operators.Dedup.minhashSignatures`.
  *
  * The grouped spelling (explode distinct word-3-shingles → det_hash60 per
  * shingle → groupBy(doc) × 16 min aggregates) shuffles the whole exploded
  * shingle stream per serve — ~5M rows for a 50k-doc refresh — before the
  * map-side combine can crush it. The r18 per-row HOF trial
  * (array_min over 16 interpreted transform passes) measured ~60% SLOWER
  * at that scale because higher-order functions are CodegenFallback. This
  * expression keeps the one-MD5-per-shingle cost (the dominant term either
  * way, via the same [[DetHash60]] kernel) and does the 16 affine mins in
  * a tight compiled loop per document: no explode, no shuffle, no
  * interpreted eval.
  *
  * Bit-identical to the grouped form by construction:
  *   tokens   = UTF8String.split(" ", -1)  — Spark's own StringSplit kernel
  *   shingle  = concat_ws(' ', tok[i], tok[i+1], tok[i+2]) (no nulls ⇒
  *              plain space join; MD5 streamed over the parts, so no
  *              shingle string is ever materialized)
  *   h        = DetHash60("0" ++ shingle) % P  (seed-0 detHash convention)
  *   s_q      = min over shingles of (a_q·h + b_q) % P — duplicate
  *              shingles cannot move a min, so the grouped form's
  *              array_distinct is irrelevant here
  * Callers guard `size(split(text, ' ')) >= 3` (the shingles() row-drop);
  * shorter input fails loudly rather than silently diverging. */
object MinhashSigs {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Space = UTF8String.fromString(" ")

  def sigs(s: UTF8String, a: Array[Long], b: Array[Long], p: Long, n: Int): ArrayData = {
    val toks = s.split(Space, -1)
    require(toks.length >= n,
      s"minhash_sigs requires >= $n tokens, got ${toks.length}")
    val tb = new Array[Array[Byte]](toks.length)
    var t = 0
    while (t < toks.length) { tb(t) = toks(t).getBytes; t += 1 }
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    val d = md.get()
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      d.reset()
      d.update('0'.toByte)
      var j = 0
      while (j < n) {
        if (j > 0) d.update(' '.toByte)
        d.update(tb(i + j))
        j += 1
      }
      val dig = d.digest()
      val hi =
        (((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
         ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
         ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
         ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)) >>> 4
      val h = hi % p
      var q = 0
      while (q < k) {
        val v = (a(q) * h + b(q)) % p
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `minhash_sigs(text)` — array of the 16 MinHash signature values,
  * computed per row in one codegen loop. Null in → null out; fewer than 3
  * tokens is a caller contract violation (the shingles() filter). */
case class MinhashSigsExpression(child: Expression, a: Seq[Long], b: Seq[Long],
    p: Long, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects string, got ${child.dataType.sql}")

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def nullSafeEval(input: Any): Any =
    MinhashSigs.sigs(input.asInstanceOf[UTF8String], aArr, bArr, p, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinhashSigs.sigs($c, $aRef, $bRef, ${p}L, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigsExpression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}
