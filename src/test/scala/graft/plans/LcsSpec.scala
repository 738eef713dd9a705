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
}
