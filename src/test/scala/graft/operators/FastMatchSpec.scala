package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** FM1 correctness: the Aho-Corasick matcher vs a naive scan oracle
  * (SURVEY §2.8 plan B), including the reference's word-boundary semantics
  * (`utils/fastmatch.py:56-59`: implicit boundaries at begin/end of text,
  * non-word chars elsewhere). */
class FastMatchSpec extends AnyFunSuite {

  /** Oracle: every occurrence of every pattern found by scanning positions,
    * kept only when flanked by non-word chars / text edges. */
  private def naive(text: String, patterns: Seq[String]): Set[(String, Int, Int)] = {
    def isWord(ch: Char) = Character.isLetterOrDigit(ch) || ch == '_'
    (for {
      p <- patterns.distinct if p.nonEmpty
      start <- 0 to (text.length - p.length)
      if text.regionMatches(start, p, 0, p.length)
      end = start + p.length
      if (start == 0 || !isWord(text.charAt(start - 1))) &&
        (end == text.length || !isWord(text.charAt(end)))
    } yield (p, start, end)).toSet
  }

  test("finds multi-word phrases with word boundaries") {
    val pats = Seq("table scan", "scan", "data")
    val ac = AhoCorasick.build(pats)
    val text = "a table scan over data; database scans"
    val got = ac.findAll(text).toSet
    assert(got === naive(text, pats))
    // 'database' must NOT yield a 'data' match (right flank is a word char)
    assert(got.count { case (m, _, _) => m == "data" } === 1)
    // overlapping: both 'table scan' and inner 'scan' reported
    assert(got.contains(("table scan", 2, 12)))
    assert(got.contains(("scan", 8, 12)))
  }

  test("boundaries at begin and end of text") {
    val ac = AhoCorasick.build(Seq("data"))
    assert(ac.findAll("data").toSet === Set(("data", 0, 4)))
    assert(ac.findAll("data!").toSet === Set(("data", 0, 4)))
    assert(ac.findAll("xdata").isEmpty)
    assert(ac.findAll("datax").isEmpty)
  }

  test("null and empty text") {
    val ac = AhoCorasick.build(Seq("a"))
    assert(ac.findAll(null).isEmpty)
    assert(ac.findAll("").isEmpty)
  }

  test("patterns that are substrings of each other all match") {
    val pats = Seq("sort merge join", "merge join", "join")
    val text = "sort merge join"
    assert(AhoCorasick.build(pats).findAll(text).toSet === naive(text, pats))
  }

  test("property: AC == naive oracle on 500 random corpora") {
    val rnd = new Random(42)
    val words = Seq("data", "set", "scan", "a", "ab", "data set", "x_y", "d")
    val seps = Seq(" ", ".", ",", "-", "")
    for (_ <- 1 to 500) {
      val text = (1 to rnd.nextInt(30)).map { _ =>
        if (rnd.nextBoolean()) words(rnd.nextInt(words.length))
        else seps(rnd.nextInt(seps.length))
      }.mkString(" ")
      val pats = rnd.shuffle(words).take(1 + rnd.nextInt(words.length))
      val ac = AhoCorasick.build(pats)
      assert(ac.findAll(text).toSet === naive(text, pats), s"text=[$text] pats=$pats")
    }
  }
}

/** Sharded matcher ≡ unsharded (SCALE.md rule 3: gazetteer outgrowing one
  * broadcast automaton splits into several broadcast passes). */
class FastMatchShardedSpec extends graft.SparkSpec {

  test("property: sharded == unsharded on random corpora, any shard size") {
    import spark.implicits._
    val rnd = new Random(11)
    val words = Seq("data", "set", "scan", "deep learning", "bench", "x_y", "coco")
    val texts = (1 to 40).map { _ =>
      (1 to 3 + rnd.nextInt(20)).map(_ => words(rnd.nextInt(words.length)))
        .mkString(rnd.nextInt(3) match { case 0 => " "; case 1 => ", "; case _ => ". " })
    }
    val df = texts.toDF("text")
    def collectMatches(c: org.apache.spark.sql.Column): Seq[Seq[(String, Int, Int)]] =
      df.select(c.as("m")).collect().map(r =>
        r.getSeq[org.apache.spark.sql.Row](0)
          .map(m => (m.getString(0), m.getInt(1), m.getInt(2))).sorted.toSeq).toSeq
    val whole = collectMatches(FastMatch.fastMatch(org.apache.spark.sql.functions.col("text"), words))
    for (shardSize <- Seq(1, 2, 3, 100)) {
      val sharded = collectMatches(
        FastMatch.fastMatchSharded(org.apache.spark.sql.functions.col("text"), words, shardSize))
      assert(sharded === whole, s"shardSize=$shardSize")
    }
  }
}
