package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** M2 exactness: DP decode vs brute-force enumeration of all C^L paths. */
class ViterbiSpec extends AnyFunSuite {

  private def bruteForce(emit: Array[Array[Double]], trans: Array[Array[Double]]): (Array[Int], Double) = {
    val L = emit.length
    val C = emit(0).length
    var best: Array[Int] = null
    var bestScore = Double.NegativeInfinity
    def rec(t: Int, path: List[Int]): Unit =
      if (t == L) {
        val p = path.reverse.toArray
        val s = Viterbi.pathScore(emit, trans, p)
        // strictly-greater keeps the FIRST maximum in lexicographic order —
        // same tie-break as the DP's argmax
        if (s > bestScore) { bestScore = s; best = p }
      } else (0 until C).foreach(c => rec(t + 1, c :: path))
    rec(0, Nil)
    (best, bestScore)
  }

  test("forward logsumexp equals brute-force path-sum on 200 random instances") {
    val rnd = new Random(13)
    for (_ <- 1 to 200) {
      val L = 1 + rnd.nextInt(5)
      val C = 2 + rnd.nextInt(3)
      val emit = Array.fill(L, C)(math.round(rnd.nextGaussian() * 100) / 100.0)
      val trans = Array.fill(C, C)(math.round(rnd.nextGaussian() * 100) / 100.0)
      // brute force: log Σ over all C^L paths of exp(score)
      var sum = 0.0
      def rec(t: Int, path: List[Int]): Unit =
        if (t == L) sum += math.exp(Viterbi.pathScore(emit, trans, path.reverse.toArray))
        else (0 until C).foreach(c => rec(t + 1, c :: path))
      rec(0, Nil)
      val want = math.log(sum)
      val got = Viterbi.forwardLogSum(emit, trans)
      assert(math.abs(got - want) < 1e-9, s"L=$L C=$C got=$got want=$want")
    }
  }

  test("forward of an empty sequence is -inf and dominates the best path") {
    assert(Viterbi.forwardLogSum(Array.empty, Array.empty).isNegInfinity)
    val emit = Array(Array(1.0, 2.0))
    val trans = Array(Array(0.0, 0.0), Array(0.0, 0.0))
    // partition ≥ best path score always
    assert(Viterbi.forwardLogSum(emit, trans) >=
      Viterbi.pathScore(emit, trans, Viterbi.decode(emit, trans)))
  }

  test("decode equals brute force on 200 random instances") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val L = 1 + rnd.nextInt(5)
      val C = 2 + rnd.nextInt(3)
      val emit = Array.fill(L, C)(math.round(rnd.nextGaussian() * 100) / 100.0)
      val trans = Array.fill(C, C)(math.round(rnd.nextGaussian() * 100) / 100.0)
      val got = Viterbi.decode(emit, trans)
      val (_, wantScore) = bruteForce(emit, trans)
      val gotScore = Viterbi.pathScore(emit, trans, got)
      assert(gotScore === wantScore,
        s"L=$L C=$C got=${got.mkString(",")} score=$gotScore want=$wantScore")
    }
  }

  test("empty and single-token sequences") {
    assert(Viterbi.decode(Array.empty, Array(Array(0.0))) === Array.empty[Int])
    val p = Viterbi.decode(Array(Array(0.1, 0.9)), Array(Array(0.0, 0.0), Array(0.0, 0.0)))
    assert(p === Array(1))
  }
}
