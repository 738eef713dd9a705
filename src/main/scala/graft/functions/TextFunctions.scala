package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar text functions F1–F20 from SURVEY.md §2.3, each a pure
  * `Column -> Column` built on `org.apache.spark.sql.functions` so the whole
  * layer stays inside whole-stage codegen (no UDFs except the Porter stemmer,
  * see [[PorterStemmer]]).
  *
  * Reference behaviors: `dataset_ner/paper_processing.py:99-128` (F1–F3),
  * `paper_classification/TM_1_DataCleaning.ipynb` cells 2–18 (F4–F14),
  * `scrapping/papers_download.py:121` (F19).
  */
object TextFunctions {

  /** F1 — whitespace normalize (`replace("\n"," ").replace("  "," ").strip()`). */
  def normalizeWhitespace(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** F2 — strip digits (`re.sub("[0-9]","",author)`). */
  def stripDigits(c: Column): Column = regexp_replace(c, "[0-9]", "")

  /** F3 — strip parens from affiliations. */
  def stripParens(c: Column): Column = translate(c, "()", "")

  /** F4 — lowercase. */
  def lowercased(c: Column): Column = lower(c)

  /** F5 — drop words shorter than `minLen` (TM_1 cell 3 drops len<3). */
  def dropShortWords(tokens: Column, minLen: Int = 3): Column =
    filter(tokens, w => length(w) >= minLen)

  /** F6 — URL removal (`https?://\S+|www\.\S+`). */
  def removeUrls(c: Column): Column =
    regexp_replace(c, "(https?://\\S+|www\\.\\S+)", "")

  /** F7 — remove tokens containing a digit (`\S*\d\S*`). */
  def removeDigitTokens(c: Column): Column = regexp_replace(c, "\\S*[0-9]\\S*", "")

  /** F8 — punctuation removal (`[^\w\s]`). */
  def removePunctuation(c: Column): Column = regexp_replace(c, "[^\\w\\s]", "")

  /** F9 — email removal (`\S*@\S*\s?`). */
  def removeEmails(c: Column): Column = regexp_replace(c, "\\S*@\\S*\\s?", "")

  /** F10 — newline collapse + quote strip (TM_1 cells 10-11). */
  def collapseNewlinesStripQuotes(c: Column): Column =
    regexp_replace(regexp_replace(c, "[\\n\\r]+", " "), "[\"']", "")

  /** F11 — dictionary word expansion (reference uses the `contractions` lib;
    * here a generic whole-word broadcast-map rewrite folded into
    * codegen-friendly `regexp_replace` chain — the map is tiny by contract).
    */
  def expandWords(c: Column, mapping: Seq[(String, String)]): Column =
    mapping.foldLeft(c) { case (col, (from, to)) =>
      regexp_replace(col, "\\b" + java.util.regex.Pattern.quote(from) + "\\b", to)
    }

  /** F12 — stopword removal over a token array (MLlib StopWordsRemover
    * semantics, expressed as a HOF so it composes inside one projection). */
  def removeStopwords(tokens: Column, stopwords: Seq[String]): Column =
    filter(tokens, w => !w.isin(stopwords.map(x => x: Any): _*))

  /** F14 — Porter stemming over a token array (pure-Scala UDF, see
    * [[PorterStemmer]]). */
  def stemTokens(tokens: Column): Column = PorterStemmer.stemArrayUdf(tokens)

  /** F16 — whitespace tokenize. */
  def tokenize(c: Column): Column = split(c, "\\s+")

  /** F17 — deterministic id: sha2 over key parts joined with U+0001 (an
    * unambiguous separator: ("ab","c") never collides with ("a","bc")).
    * Replaces the reference's uuid4 per its own TODO at
    * `paper_processing.py:147-150`. DuckDB twin: `sha256(a || chr(1) || b)`. */
  def deterministicId(parts: Column*): Column =
    sha2(concat_ws("\u0001", parts: _*), 256)

  /** F18 — parse a Python-stringified list (`ast.literal_eval` analogue). */
  def parseStringifiedList(c: Column): Column =
    from_json(regexp_replace(c, "'", "\""), ArrayType(StringType))

  /** F19 — '+'-joined query-string building (`'+'.join(title.split())`). */
  def plusJoined(c: Column): Column = regexp_replace(trim(c), "\\s+", "+")

  /** F20 — char length. */
  def charLength(c: Column): Column = length(c)
}
