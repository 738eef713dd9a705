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
}
