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

  /** F13 — rule-based lemmatization (documented approximation of the
    * reference's WordNet + spaCy lemmatizer, `TM_1:cell 17`,
    * `TM_2:cells 10-12`, which needs a dictionary this library does not
    * ship): a small irregular-forms table plus deterministic suffix rules
    * (plural -ies/-es/-s, gerund -ing with doubled-consonant collapse,
    * past -ied/-eed/-ed). Dictionary-free, so forms like "agreed" that need
    * a lexicon to restore the final 'e' stay heuristic — the honest
    * stemming-adjacent fallback, strictly closer to lemma parity than
    * Porter alone.
    *
    * The rule text is ONE CASE expression valid in both Spark SQL and
    * DuckDB ([[lemmaCaseSql]]) — the oracle runs literally the same rules. */
  def lemma(colName: String): Column = expr(lemmaCaseSql(colName))

  /** The shared Spark-SQL/DuckDB CASE expression behind [[lemma]]. Only
    * engine-portable builtins: CASE/IN/right/length/substring/`||`. */
  def lemmaCaseSql(w: String): String = {
    // doubled-final-consonant collapse for a base ending at offset `k` from
    // the end of w (k=3 for -ing, k=2 for -ed): compare the last two base
    // chars, require non-vowel (RE2 has no backreferences, so no regex).
    def collapse(k: Int): String =
      s"""CASE WHEN substring($w, length($w) - $k, 1) = substring($w, length($w) - ${k + 1}, 1)
         |       AND substring($w, length($w) - $k, 1) NOT IN ('a','e','i','o','u')
         |  THEN substring($w, 1, length($w) - ${k + 1})
         |  ELSE substring($w, 1, length($w) - $k) END""".stripMargin
    s"""CASE
       |  WHEN $w IN ('is','are','was','were','been','am') THEN 'be'
       |  WHEN $w IN ('has','had') THEN 'have'
       |  WHEN $w IN ('did','done') THEN 'do'
       |  WHEN $w IN ('went','gone') THEN 'go'
       |  WHEN $w = 'children' THEN 'child'
       |  WHEN $w = 'men' THEN 'man'
       |  WHEN $w = 'women' THEN 'woman'
       |  WHEN $w = 'mice' THEN 'mouse'
       |  WHEN $w = 'feet' THEN 'foot'
       |  WHEN $w = 'teeth' THEN 'tooth'
       |  WHEN $w = 'indices' THEN 'index'
       |  WHEN $w = 'matrices' THEN 'matrix'
       |  WHEN $w = 'vertices' THEN 'vertex'
       |  WHEN length($w) > 4 AND right($w, 3) = 'ies' THEN substring($w, 1, length($w) - 3) || 'y'
       |  WHEN right($w, 4) = 'sses' THEN substring($w, 1, length($w) - 2)
       |  WHEN right($w, 4) IN ('shes','ches') OR right($w, 3) IN ('xes','zes','oes')
       |    THEN substring($w, 1, length($w) - 2)
       |  WHEN length($w) > 3 AND right($w, 1) = 's' AND right($w, 2) NOT IN ('ss','us','is')
       |    THEN substring($w, 1, length($w) - 1)
       |  WHEN length($w) > 5 AND right($w, 4) = 'ying' THEN substring($w, 1, length($w) - 4) || 'y'
       |  WHEN length($w) > 5 AND right($w, 3) = 'ing' THEN ${collapse(3)}
       |  WHEN length($w) > 4 AND right($w, 3) = 'ied' THEN substring($w, 1, length($w) - 3) || 'y'
       |  WHEN length($w) > 5 AND right($w, 3) = 'eed' THEN substring($w, 1, length($w) - 1)
       |  WHEN length($w) > 4 AND right($w, 2) = 'ed' THEN ${collapse(2)}
       |  ELSE $w
       |END""".stripMargin
  }

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

  /** Control chars (minus \t \n \r, which are whitespace the F1 chain
    * owns), DEL, soft hyphen, zero-width/bidi marks, word-joiner, BOM —
    * the invisible code points that survive NFC and poison tokenization,
    * dedup hashes, and gram counts. One RE2-safe character class, valid
    * verbatim in Java regex and DuckDB's regexp_replace. */
  private val ControlZeroWidth: String =
    "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}" +
      "\\x{00AD}\\x{200B}-\\x{200F}\\x{2060}\\x{FEFF}]"

  /** F21 — Unicode pre-clean (beyond the reference, which is ASCII-bound:
    * the CCNet/Gopher preprocessing step every multilingual pipeline runs
    * FIRST): NFC canonical composition (the codegen
    * [[graft.plans.NfcNormalizeExpression]]) then control/zero-width
    * strip, in that pinned order on both engines. Idempotent — NFC is a
    * closure, the strip class maps to the empty string, and re-normalizing
    * stripped text composes nothing new (property-pinned in
    * TextFunctionsSpec). Requires the graft function registry (every
    * `Tables` read registers it). */
  def unicodeNormalize(c: Column): Column =
    regexp_replace(call_function("nfc_normalize", c), ControlZeroWidth, "")

  /** The DuckDB twin of [[unicodeNormalize]] — same builtin name, same
    * RE2 class verbatim (single-quoted SQL strings keep backslashes
    * literal), global flag explicit (Spark replaces all by default). */
  def unicodeNormalizeSql(c: String): String =
    s"regexp_replace(nfc_normalize($c), '$ControlZeroWidth', '', 'g')"

  /** F22 — accent folding (é→e, Å→A, ñ→n; ø/ß pass through): the
    * search/dedup key normalizer one notch stronger than F21. The codegen
    * [[graft.plans.StripAccentsExpression]], semantics-matched to DuckDB's
    * `strip_accents` builtin (NFD + drop Mn, no recompose). Requires the
    * graft function registry (every `Tables` read registers it). */
  def stripAccents(c: Column): Column = call_function("strip_accents", c)
}
