package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.FastMatch
import Q._

/** FM1 — FastMatch queries (SURVEY §2.8): multi-pattern gazetteer matching
  * over the documents corpus with word-boundary semantics.
  *
  * The matcher is an Aho-Corasick automaton built once on the driver and
  * shipped in the task closure (broadcast-sized by contract — the reference
  * gazetteer is 2,948 names). Scan is O(|text| + matches) per document
  * regardless of candidate count; the DuckDB oracle is the O(n·m)
  * per-candidate regex plan (SURVEY §2.8 plan B) — same answer, test scale
  * only.
  */
object MatchQueries {

  /** Gazetteer stand-in: multi-word phrases + single words over the testdata
    * vocabulary (reference: `db/data_set_labels.json` dataset names). */
  val gazetteer: Seq[String] = Seq(
    "table scan", "hash join", "sort merge", "merge join", "data", "stream",
    "window", "fast scan")

  /** fm1_gazetteer_counts — per (doc, candidate) occurrence counts. */
  def fm1GazetteerCounts(s: SparkSession, dir: String): DataFrame = {
    val fm = FastMatch.matcher(gazetteer)
    t(s, dir, "documents")
      .select(col("doc_id"), explode(fm(col("text"))).as("m"))
      .groupBy(col("doc_id"), col("m.matched").as("matched"))
      .agg(count(lit(1)).as("n"))
      .orderBy("doc_id", "matched")
  }

  val fm1GazetteerCountsSql: String = {
    val arms = gazetteer.map { cand =>
      val esc = cand.replace("'", "''")
      s"""SELECT doc_id, '$esc' AS matched, len(regexp_extract_all(lower(text), '\\b${esc}\\b')) AS n FROM documents"""
    }
    s"""SELECT doc_id, matched, n FROM (${arms.mkString("\nUNION ALL\n")}) t
       |WHERE n > 0 ORDER BY doc_id, matched""".stripMargin
  }

  /** fm1_match_spans — full (matched, start, end) spans, 0-based end-exclusive
    * offsets. Oracle: the SURVEY §2.8 plan-B naive scan — enumerate every
    * start position (unnest over range(0, len)), test the substring plus both
    * word boundaries per candidate. O(chars × candidates), test scale only;
    * span correctness is additionally property-tested against a regex oracle
    * in FastMatchSpec. */
  def fm1MatchSpans(s: SparkSession, dir: String): DataFrame = {
    val fm = FastMatch.matcher(gazetteer)
    t(s, dir, "documents")
      .select(col("doc_id"), explode(fm(col("text"))).as("m"))
      .select(col("doc_id"), col("m.matched").as("matched"),
        col("m.start").as("start"), col("m.end").as("end"))
      .orderBy("doc_id", "start", "matched")
  }

  val fm1MatchSpansSql: String = {
    // boundary class mirrors FastMatch.isWordChar (Character.isLetterOrDigit
    // || '_') via Unicode \p{L}\p{N} — an ASCII-only [a-z0-9_] would accept
    // matches adjacent to non-ASCII letters that the Scala matcher rejects
    // (ADVICE r5). Offsets index the ORIGINAL text: lower() is applied for
    // comparison only, safe because no corpus char changes length under
    // lowercasing (ASCII vocabulary; a locale-sensitive 'İ' would not).
    val values = gazetteer.map(c => s"('${c.replace("'", "''")}')").mkString(", ")
    s"""WITH cands(cand) AS (VALUES $values),
       |pos AS (SELECT doc_id, lower(text) AS t, unnest(range(0, len(text))) AS s FROM documents)
       |SELECT p.doc_id, c.cand AS matched, p.s AS start, p.s + len(c.cand) AS "end"
       |FROM pos p CROSS JOIN cands c
       |WHERE substr(p.t, CAST(p.s + 1 AS INT), len(c.cand)) = c.cand
       |  AND (p.s = 0 OR NOT regexp_matches(substr(p.t, CAST(p.s AS INT), 1), '^[\\p{L}\\p{N}_]$$'))
       |  AND (p.s + len(c.cand) >= len(p.t)
       |       OR NOT regexp_matches(substr(p.t, CAST(p.s + len(c.cand) + 1 AS INT), 1), '^[\\p{L}\\p{N}_]$$'))
       |ORDER BY doc_id, start, matched""".stripMargin
  }

  val queries: Map[String, QueryFn] = Map(
    "fm1_gazetteer_counts" -> (fm1GazetteerCounts _),
    "fm1_match_spans" -> (fm1MatchSpans _))

  val oracles: Map[String, String] = Map(
    "fm1_gazetteer_counts" -> fm1GazetteerCountsSql,
    "fm1_match_spans" -> fm1MatchSpansSql)
}
