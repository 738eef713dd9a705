package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the scalar layer, including pieces not exercised by
  * the oracle queries (F11 expandWords, F3, stemTokens wiring). */
class TextFunctionsSpec extends SparkSpec {

  import TextFunctions._

  private def one(c: org.apache.spark.sql.Column, input: String): String = {
    import spark.implicits._
    Seq(input).toDF("s").select(c.as("r")).collect()(0).getString(0)
  }

  test("F1 whitespace normalize") {
    assert(one(normalizeWhitespace(col("s")), "  a\n b\t\tc  ") === "a b c")
  }

  test("F2/F3 strip digits and parens") {
    assert(one(stripDigits(col("s")), "Alice1 Smith2") === "Alice Smith")
    assert(one(stripParens(col("s")), "Uni (CS Dept)") === "Uni CS Dept")
  }

  test("F13 lemma rules: irregulars, plurals, gerunds, past tense") {
    val cases = Seq(
      "were" -> "be", "has" -> "have", "children" -> "child",
      "matrices" -> "matrix", "indices" -> "index",
      "queries" -> "query", "classes" -> "class", "watches" -> "watch",
      "boxes" -> "box", "goes" -> "go", "tables" -> "table",
      "pass" -> "pass", "bus" -> "bus", "analysis" -> "analysis",
      "running" -> "run", "viewing" -> "view", "querying" -> "query",
      "stopped" -> "stop", "agreed" -> "agree", "tried" -> "try",
      "data" -> "data", "is" -> "be", "scan" -> "scan")
    cases.foreach { case (in, want) =>
      assert(one(lemma("s"), in) === want, s"lemma($in)")
    }
  }

  test("F11 whole-word expansion does not touch substrings") {
    val m = Seq("don't" -> "do not", "it's" -> "it is")
    assert(one(expandWords(col("s"), m), "don't say it's bandit's") === "do not say it is bandit's")
  }

  test("F18 stringified list round-trip with embedded spaces") {
    import spark.implicits._
    val got = Seq("['a b', 'c']").toDF("s")
      .select(parseStringifiedList(col("s")).as("r"))
      .collect()(0).getSeq[String](0)
    assert(got === Seq("a b", "c"))
  }

  test("F14 stemTokens maps over arrays and keeps nulls") {
    import spark.implicits._
    val got = Seq(Seq("running", "flies")).toDF("t")
      .select(stemTokens(col("t")).as("r")).collect()(0).getSeq[String](0)
    assert(got === Seq("run", "fli"))
  }

  test("F19 plus join collapses runs of whitespace") {
    assert(one(plusJoined(col("s")), " deep  learning survey ") === "deep+learning+survey")
  }

  test("F21 composes decomposed marks and strips invisibles") {
    graft.plans.GraftFunctions.register(spark)
    // e + U+0301 composes to single-codepoint \u00e9
    assert(one(unicodeNormalize(col("s")), "cafe\u0301") === "caf\u00e9")
    // ZWSP / BOM / soft hyphen / ZWJ vanish
    assert(one(unicodeNormalize(col("s")),
      "a\u200bb\ufeffc\u00add e\u200df") === "abcd ef")
    // \t and \n are whitespace the F1 chain owns -- NOT stripped here
    assert(one(unicodeNormalize(col("s")), "a\tb\nc") === "a\tb\nc")
    // already-composed text is untouched (NFC quick-check pass-through)
    assert(one(unicodeNormalize(col("s")), "caf\u00e9 plain") === "caf\u00e9 plain")
  }

  test("F21 is idempotent: normalize . normalize === normalize") {
    graft.plans.GraftFunctions.register(spark)
    val inputs = Seq(
      "cafe\u0301 au\u200b lait\ufeff", "plain ascii", "",
      "so\u00adft hy\u00adphen",
      "A\u030angstro\u0308m", // A+ring, o+diaeresis -- both compose
      "mixed caf\u00e9 cafe\u0301 \u200d zwj")
    inputs.foreach { in =>
      val once = one(unicodeNormalize(col("s")), in)
      val twice = one(unicodeNormalize(unicodeNormalize(col("s"))), in)
      assert(once === twice, s"idempotence broke on ${in.map(_.toInt)}")
    }
  }

  test("F22 folds decomposable accents, keeps the rest, idempotent") {
    graft.plans.GraftFunctions.register(spark)
    assert(one(stripAccents(col("s")), "caf\u00e9 cafe\u0301") === "cafe cafe")
    assert(one(stripAccents(col("s")), "\u00c5ngstr\u00f6m se\u00f1or \u00e7a") === "Angstrom senor ca")
    // no canonical decomposition -> untouched (matches DuckDB strip_accents)
    assert(one(stripAccents(col("s")), "\u00f8re stra\u00dfe") === "\u00f8re stra\u00dfe")
    // pure ASCII short-circuits unchanged
    assert(one(stripAccents(col("s")), "plain ascii!") === "plain ascii!")
    // idempotence: folding folded text is a no-op
    val in = "caf\u00e9 \u00c5 \u00f8"
    assert(one(stripAccents(stripAccents(col("s"))), in) ===
      one(stripAccents(col("s")), in))
  }
}
