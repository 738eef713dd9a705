package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property pins for the native LCS kernel behind `lcs_len` (a24_rouge_l):
  * agreement with a brute-force reference DP on random token arrays, plus
  * the algebraic LCS identities the metric relies on. */
class LcsSpec extends SparkSpec {

  private def refLcs(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  private def sparkLcs(pairs: Seq[(Seq[String], Seq[String])]): Seq[Int] = {
    val spark0 = spark
    import spark0.implicits._
    GraftFunctions.register(spark)
    pairs.toDF("a", "b")
      .select(call_function("lcs_len", col("a"), col("b")).as("lcs"))
      .collect().map(_.getInt(0)).toSeq
  }

  private val tokArray: Gen[Seq[String]] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "xy")).map(_.toSeq))

  private val samples: Seq[(Seq[String], Seq[String])] = {
    val g = for { a <- tokArray; b <- tokArray } yield (a, b)
    // retryUntil(_ => true) never fails; seeded via listOfN sample for
    // deterministic-enough coverage — 200 random pairs over a 5-symbol
    // alphabet hit every match/skip branch of the DP
    Iterator.continually(Gen.listOfN(200, g).sample).flatten.next()
  }

  test("lcs_len agrees with the brute-force DP on random arrays") {
    val got = sparkLcs(samples)
    samples.zip(got).foreach { case ((a, b), l) =>
      assert(l === refLcs(a, b), s"a=$a b=$b")
    }
  }

  test("lcs identities: self, empty, symmetry, subsequence bound") {
    val flat = samples.take(50).flatMap { case (a, b) =>
      Seq((a, a), (a, b), (b, a), (a, Seq.empty[String])) }
    val got = sparkLcs(flat).grouped(4).toSeq
    samples.take(50).zip(got).foreach { case ((a, b), Seq(selfA, ab, ba, emptyA)) =>
      assert(selfA === a.length, s"self a=$a")
      assert(ab === ba, s"symmetry a=$a b=$b")
      assert(emptyA === 0, s"empty a=$a")
      assert(ab <= math.min(a.length, b.length), s"bound a=$a b=$b")
    }
  }

  // --- tok_edit_dist (a25's kernel) ---

  private def refEd(a: Seq[String], b: Seq[String]): Int = {
    var prev = (0 to b.length).toArray
    for (i <- 1 to a.length) {
      val cur = Array.fill(b.length + 1)(0); cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1),
          math.min(prev(j) + 1, cur(j - 1) + 1))
      prev = cur
    }
    prev(b.length)
  }

  private def sparkEd(pairs: Seq[(Seq[String], Seq[String])]): Seq[Int] = {
    val spark0 = spark
    import spark0.implicits._
    GraftFunctions.register(spark)
    pairs.toDF("a", "b")
      .select(call_function("tok_edit_dist", col("a"), col("b")).as("d"))
      .collect().map(_.getInt(0)).toSeq
  }

  test("tok_edit_dist agrees with the brute-force DP on random arrays") {
    val got = sparkEd(samples)
    samples.zip(got).foreach { case ((a, b), dGot) =>
      assert(dGot === refEd(a, b), s"a=$a b=$b")
    }
  }

  test("edit-distance identities: self 0, empty, symmetry, bounds, LCS duality") {
    val flat = samples.take(50).flatMap { case (a, b) =>
      Seq((a, a), (a, b), (b, a), (a, Seq.empty[String])) }
    val got = sparkEd(flat).grouped(4).toSeq
    val lcsAb = sparkLcs(samples.take(50))
    samples.take(50).zip(got).zip(lcsAb).foreach {
      case (((a, b), Seq(selfA, ab, ba, emptyA)), lcs) =>
        assert(selfA === 0, s"self a=$a")
        assert(ab === ba, s"symmetry a=$a b=$b")
        assert(emptyA === a.length, s"empty a=$a")
        assert(ab >= math.abs(a.length - b.length) &&
          ab <= math.max(a.length, b.length), s"bounds a=$a b=$b")
        // unit-cost duality: dist <= m + n − 2·LCS (delete/insert everything
        // outside one common subsequence; substitutions can only tighten it)
        assert(ab <= a.length + b.length - 2 * lcs, s"duality a=$a b=$b")
    }
  }
}
