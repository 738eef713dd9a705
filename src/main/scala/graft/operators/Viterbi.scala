package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** M2 — Viterbi decode (SURVEY §2.10): max-product dynamic program over a
  * per-token score matrix plus a tag-transition matrix, returning the best
  * tag path. Reimplements the dataflow surface of the reference's CRF decode
  * (`dataset_ner/crf.py:103-151`) as a deterministic pure function — no
  * model runtime, testable against brute-force path enumeration.
  *
  * Scoring convention (matching crf.py): path score = Σ_t emit[t][tag_t] +
  * Σ_t trans[tag_{t-1}][tag_t], with no start/stop augmentation; ties break
  * toward the lower tag index (argmax keeps the first maximum).
  */
object Viterbi {

  /** Best path through emissions [L][C] given transitions [C][C]. */
  def decode(emit: Array[Array[Double]], trans: Array[Array[Double]]): Array[Int] = {
    val L = emit.length
    if (L == 0) return Array.empty
    val C = emit(0).length
    val dp = Array.ofDim[Double](L, C)
    val bp = Array.ofDim[Int](L, C)
    var c = 0
    while (c < C) { dp(0)(c) = emit(0)(c); c += 1 }
    var t = 1
    while (t < L) {
      var j = 0
      while (j < C) {
        var best = Double.NegativeInfinity
        var arg = 0
        var i = 0
        while (i < C) {
          val sc = dp(t - 1)(i) + trans(i)(j)
          if (sc > best) { best = sc; arg = i }
          i += 1
        }
        dp(t)(j) = best + emit(t)(j)
        bp(t)(j) = arg
        j += 1
      }
      t += 1
    }
    var bestEnd = 0
    var bestScore = Double.NegativeInfinity
    c = 0
    while (c < C) {
      if (dp(L - 1)(c) > bestScore) { bestScore = dp(L - 1)(c); bestEnd = c }
      c += 1
    }
    val path = new Array[Int](L)
    path(L - 1) = bestEnd
    t = L - 1
    while (t > 0) { path(t - 1) = bp(t)(path(t)); t -= 1 }
    path
  }

  /** Total score of a fixed path (for tests / the LC strategies). */
  def pathScore(emit: Array[Array[Double]], trans: Array[Array[Double]], path: Array[Int]): Double = {
    var s = 0.0
    var t = 0
    while (t < path.length) {
      s += emit(t)(path(t))
      if (t > 0) s += trans(path(t - 1))(path(t))
      t += 1
    }
    s
  }

  /** M3 — forward algorithm: log Σ_paths exp(score(path)) under the same
    * scoring convention as [[decode]] (the CRF partition function,
    * `crf.py:59-102`). Sum-product counterpart of Viterbi's max-product:
    * α₀(c) = emit₀(c); α_t(j) = logΣexp_i(α_{t-1}(i) + trans(i)(j)) +
    * emit_t(j); result = logΣexp_c α_{L-1}(c). Max-shifted logΣexp keeps it
    * overflow-safe. Exactness vs brute-force path enumeration in
    * ViterbiSpec. */
  def forwardLogSum(emit: Array[Array[Double]], trans: Array[Array[Double]]): Double = {
    val L = emit.length
    if (L == 0) return Double.NegativeInfinity
    val C = emit(0).length
    def logSumExp(xs: Array[Double]): Double = {
      var m = Double.NegativeInfinity
      var i = 0
      while (i < C) { if (xs(i) > m) m = xs(i); i += 1 }
      if (m == Double.NegativeInfinity) return m
      var s = 0.0
      i = 0
      while (i < C) { s += math.exp(xs(i) - m); i += 1 }
      m + math.log(s)
    }
    var alpha = Array.tabulate(C)(c => emit(0)(c))
    val scratch = new Array[Double](C)
    var t = 1
    while (t < L) {
      val next = new Array[Double](C)
      var j = 0
      while (j < C) {
        var i = 0
        while (i < C) { scratch(i) = alpha(i) + trans(i)(j); i += 1 }
        next(j) = logSumExp(scratch) + emit(t)(j)
        j += 1
      }
      alpha = next
      t += 1
    }
    logSumExp(alpha)
  }

  /** UDF over an emissions column `array<array<double>>` with a transition
    * matrix fixed at construction (broadcast in the task closure). */
  def decoderUdf(trans: Array[Array[Double]]): UserDefinedFunction =
    udf { (emit: Seq[Seq[Double]]) =>
      if (emit == null) null
      else decode(emit.map(_.toArray).toArray, trans).toSeq
    }

  def decodePath(emissions: Column, trans: Array[Array[Double]]): Column =
    decoderUdf(trans)(emissions)

  /** Forward log-partition as a UDF (M3 twin of [[decoderUdf]]). */
  def forwardUdf(trans: Array[Array[Double]]): UserDefinedFunction =
    udf { (emit: Seq[Seq[Double]]) =>
      if (emit == null) None
      else Some(forwardLogSum(emit.map(_.toArray).toArray, trans))
    }

  def forwardLogProb(emissions: Column, trans: Array[Array[Double]]): Column =
    forwardUdf(trans)(emissions)
}
