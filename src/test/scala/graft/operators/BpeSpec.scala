package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private def words(xs: (String, Long)*) = {
    import spark.implicits._
    xs.toDF("word", "freq")
  }

  test("learns hand-computed merges: pair counts, merge application, symbol mass") {
    // abab(x2): [a,b,a,b]; abc(x3): [a,b,c]
    // round 1: (a,b) = 2*2 + 1*3 = 7 beats (b,a)=2, (b,c)=3
    //   -> abab=[ab,ab], abc=[ab,c]; mass = 2*2 + 3*2 = 10
    // round 2: (ab,ab) is a self-pair (skipped by contract); (ab,c)=3 wins
    //   -> abc=[abc]; mass = 2*2 + 3*1 = 7
    val got = Bpe.learnMerges(words("abab" -> 2L, "abc" -> 3L), 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, "a+b", 7L, 10L), (2, "ab+c", 3L, 7L)))
  }

  test("encode state: pieces concatenate back to each word, mass matches rounds") {
    val (rounds, state) = Bpe.learn(words("abab" -> 2L, "abc" -> 3L, "bca" -> 1L), 2)
    // lossless segmentation: every word's pieces rebuild the word exactly
    val bad = state.filter(
      concat_ws("", col("syms")) =!= col("word")).count()
    assert(bad === 0L)
    // the final round's reported symbol mass equals the state's actual mass
    val massReported = rounds.orderBy(desc("step")).select("n_symbols_after")
      .collect().head.getLong(0)
    val massActual = state.select(sum(col("freq") * size(col("syms"))))
      .collect().head.getLong(0)
    assert(massReported === massActual)
  }

  test("disjoint adjacent matches merge in the same round (abab case)") {
    // both (a,b) pairs of abab merge in round 1 — the shared-boundary case
    // a naive string replace would miss
    val (_, state) = Bpe.step(Bpe.initialState(words("abab" -> 1L)))
    val syms = state.select("syms").collect().head.getSeq[String](0)
    assert(syms === Seq("ab", "ab"))
  }

  test("repeated-character runs are untouched (self-pairs never selected)") {
    val (top, state) = Bpe.step(Bpe.initialState(words("aaaa" -> 5L, "xy" -> 1L)))
    val (pa, pb) = top.collect().headOption.map(r => (r.getString(0), r.getString(1))).get
    assert((pa, pb) === (("x", "y")), "self-pair (a,a) must be skipped")
    val syms = state.filter(col("word") === "aaaa")
      .select("syms").collect().head.getSeq[String](0)
    assert(syms === Seq("a", "a", "a", "a"))
  }

  test("merge results are independent of input partitioning") {
    val w = words("abab" -> 2L, "abc" -> 3L, "xyxy" -> 4L, "noon" -> 2L)
    val a = Bpe.learnMerges(w, 3).collect().toSeq
    val b = Bpe.learnMerges(w.repartition(7), 3).collect().toSeq
    assert(a === b)
  }
}
