package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Vectors from M.F. Porter's published algorithm description (1980) —
  * exercising each rule step. */
class PorterStemmerSpec extends AnyFunSuite {

  private val vectors = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b (+cleanup)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "digitizer" -> "digit", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "homologou" -> "homolog", "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("published Porter vectors") {
    vectors.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) === want, s"stem($in)")
    }
  }

  test("short words and nulls pass through") {
    assert(PorterStemmer.stem("as") === "as")
    assert(PorterStemmer.stem("a") === "a")
    assert(PorterStemmer.stem(null) === null)
  }
}
