package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The perceptual-hash kernel behind `phash64` — the byte-stream pHash of
  * `graft.queries.MultimodalQueries.phashSigs` (Zauner 2010: 64-block
  * average-pool → separable 8×8 DCT-II in e4 fixed point → sign-vs-median
  * 64-bit hash) as ONE compact loop instead of a 64-wide unrolled
  * expression tree. The unrolled spelling blows janino's 64 KB method
  * limit, so whole-stage codegen fell back to INTERPRETED eval for every
  * hashed row — the multimodal family's dominant per-row cost at any
  * scale (a 50k-row refresh paid ~12 s at sf10 in it).
  *
  * Bit-identical to the SQL chain by construction, term order preserved:
  *   codes = per-code-point `ascii` (code point value — probed Spark 4
  *           semantics; `length` counts code points, matching `n`)
  *   gv(k) = sum(codes[k·n div 64, (k+1)·n div 64)) div blockLen
  *   tv(j) = Σ_r Ce4(j/8)(r) · gv(8r + j%8)      (row DCT pass)
  *   fv(j) = Σ_c tv((j/8)·8 + c) · Ce4(j%8)(c)   (column DCT pass)
  *   hash  = Σ_j (fv(j) > sorted(fv)(31)) · 2^j  (bit 63 = sign bit)
  * All arithmetic is Long and provably overflow-free (|fv| ≤ 8·10^4·8·
  * 10^4·max_cp·1 < 2^57), so ANSI addExact semantics agree everywhere.
  * Callers guard `length(text) >= 64`; shorter input fails loudly here
  * rather than silently diverging from the oracle's div-by-zero. */
object Phash64 {
  private val Ce4: Array[Long] = {
    val a = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var r = 0
      while (r < 8) {
        a(u * 8 + r) = math.round(1e4 * math.cos((2 * r + 1) * u * math.Pi / 16))
        r += 1
      }
      u += 1
    }
    a
  }

  /** Short-input probe for the registered SQL surface: ad-hoc SQL callers
    * get NULL for texts under 64 code points (ADVICE r18) instead of a
    * task-crashing require; the internal query paths keep the loud
    * contract (they guard with length(text) >= 64 and a silent null there
    * would hide a broken guard). */
  def tooShort(s: UTF8String): Boolean = {
    val str = s.toString
    str.codePointCount(0, str.length) < 64
  }

  def hash(s: UTF8String): Long = {
    val str = s.toString
    val nInt = str.codePointCount(0, str.length)
    require(nInt >= 64, s"phash64 requires >= 64 code points, got $nInt")
    val n = nInt.toLong
    val codes = new Array[Long](nInt)
    var i = 0
    var p = 0
    while (p < str.length) {
      val cp = str.codePointAt(p)
      codes(i) = cp.toLong
      i += 1
      p += Character.charCount(cp)
    }
    val gv = new Array[Long](64)
    var k = 0
    while (k < 64) {
      val lo = (k * n / 64).toInt
      val hi = ((k + 1) * n / 64).toInt
      var sum = 0L
      var j = lo
      while (j < hi) { sum += codes(j); j += 1 }
      gv(k) = sum / (hi - lo)
      k += 1
    }
    val tv = new Array[Long](64)
    var j = 0
    while (j < 64) {
      var acc = 0L
      var r = 0
      while (r < 8) { acc += Ce4((j / 8) * 8 + r) * gv(8 * r + j % 8); r += 1 }
      tv(j) = acc
      j += 1
    }
    val fv = new Array[Long](64)
    j = 0
    while (j < 64) {
      var acc = 0L
      var c = 0
      while (c < 8) { acc += tv((j / 8) * 8 + c) * Ce4((j % 8) * 8 + c); c += 1 }
      fv(j) = acc
      j += 1
    }
    val sorted = fv.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var h = 0L
    j = 0
    while (j < 64) {
      if (fv(j) > med) h |= (1L << j)
      j += 1
    }
    h
  }
}

/** `phash64(text)` — the perceptual hash as a native codegen expression.
  * Null in → null out; input shorter than 64 code points is a caller
  * contract violation and fails loudly (the serving kernels filter
  * `length(text) >= 64` first, mirroring the oracle SQL). */
/** @param nullOnShort the registered SQL surface passes true — ad-hoc
  *   callers get NULL for sub-64-code-point text; internal query paths
  *   keep the default false and the loud require behind their length
  *   guards (ADVICE r18). */
case class Phash64Expression(child: Expression, nullOnShort: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable || nullOnShort

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phash64 expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (nullOnShort && Phash64.tooShort(s)) null else Phash64.hash(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!nullOnShort) defineCodeGen(ctx, ev, c => s"graft.plans.Phash64.hash($c)")
    else nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if (graft.plans.Phash64.tooShort($c)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.Phash64.hash($c);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Phash64Expression =
    copy(child = newChild)

  override def prettyName: String = "phash64"
}
