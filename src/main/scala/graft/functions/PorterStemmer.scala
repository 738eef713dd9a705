package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Porter stemmer (M.F. Porter, 1980, "An algorithm for suffix stripping") —
  * pure Scala, no deps. Replaces the reference's NLTK `PorterStemmer`
  * (`paper_classification/TM_1_DataCleaning.ipynb:cell 18`, F14 in SURVEY §2.3).
  *
  * Deterministic and driver-free: registered as a Scala UDF over token arrays.
  * (A UDF rather than a Catalyst Expression is acceptable here — stemming sits
  * in ETL paths, not hot aggregation loops; revisit if profiling disagrees.)
  */
object PorterStemmer {

  private def isConsonant(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isConsonant(w, i - 1)
    case _ => true
  }

  /** measure m of the stem w[0..j]: number of VC sequences. */
  private def measure(w: String, j: Int): Int = {
    var n = 0; var i = 0
    // skip initial consonants
    while (i <= j && isConsonant(w, i)) i += 1
    while (i <= j) {
      while (i <= j && !isConsonant(w, i)) i += 1
      if (i > j) return n
      n += 1
      while (i <= j && isConsonant(w, i)) i += 1
    }
    n
  }

  private def containsVowel(w: String, j: Int): Boolean =
    (0 to j).exists(i => !isConsonant(w, i))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isConsonant(w, w.length - 1)

  /** cvc with final c not w, x or y (enables -e restoration). */
  private def endsCvc(w: String): Boolean = {
    val l = w.length
    l >= 3 && isConsonant(w, l - 3) && !isConsonant(w, l - 2) && isConsonant(w, l - 1) &&
      !"wxy".contains(w.charAt(l - 1))
  }

  private def replaceSuffix(w: String, suffix: String, repl: String, minM: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stemEnd = w.length - suffix.length - 1
      if (stemEnd >= 0 && measure(w, stemEnd) > minM) Some(w.substring(0, w.length - suffix.length) + repl)
      else None
    } else None

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    var w = word.toLowerCase

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = w.dropRight(1)

    // Step 1b
    var extraStep1b = false
    if (w.endsWith("eed")) {
      if (measure(w, w.length - 4) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && containsVowel(w, w.length - 3)) {
      w = w.dropRight(2); extraStep1b = true
    } else if (w.endsWith("ing") && w.length > 3 && containsVowel(w, w.length - 4)) {
      w = w.dropRight(3); extraStep1b = true
    }
    if (extraStep1b) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
      else if (endsDoubleConsonant(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w, w.length - 1) == 1 && endsCvc(w)) w = w + "e"
    }

    // Step 1c
    if (w.endsWith("y") && containsVowel(w, w.length - 2)) w = w.dropRight(1) + "i"

    // Step 2 (m > 0)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.collectFirst { case (s, r) if w.endsWith(s) => (s, r) }.foreach { case (s, r) =>
      replaceSuffix(w, s, r, 0).foreach(w = _)
    }

    // Step 3 (m > 0)
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.collectFirst { case (s, r) if w.endsWith(s) => (s, r) }.foreach { case (s, r) =>
      replaceSuffix(w, s, r, 0).foreach(w = _)
    }

    // Step 4 (m > 1)
    val step4 = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.collectFirst { case s if w.endsWith(s) => s }.foreach { s =>
      replaceSuffix(w, s, "", 1).foreach(w = _)
    }
    // "ion" strips only when the remaining stem ends in s or t
    if (w.endsWith("ion") && w.length >= 4 && "st".contains(w.charAt(w.length - 4)))
      replaceSuffix(w, "ion", "", 1).foreach(w = _)

    // Step 5a
    if (w.endsWith("e")) {
      val m = measure(w, w.length - 2)
      if (m > 1 || (m == 1 && !endsCvc(w.dropRight(1)))) w = w.dropRight(1)
    }
    // Step 5b
    if (measure(w, w.length - 1) > 1 && endsDoubleConsonant(w) && w.endsWith("l"))
      w = w.dropRight(1)

    w
  }

  val stemUdf = udf((w: String) => stem(w))
  val stemArrayUdf = udf((ws: Seq[String]) => if (ws == null) null else ws.map(stem))

  def stemColumn(c: Column): Column = stemUdf(c)
}
