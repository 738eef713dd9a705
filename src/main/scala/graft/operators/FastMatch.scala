package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import scala.collection.mutable

/** Aho-Corasick automaton over a fixed candidate set — immutable and
  * serializable, built once on the driver and shipped to every executor
  * inside the task closure (Spark broadcasts task binaries; the automaton for
  * the reference's 2,948-name gazetteer is a few hundred KB).
  *
  * Scan cost is O(|text| + matches) per document, independent of candidate
  * count — same complexity class the reference claims for its hash-tree
  * matcher (`utils/fastmatch.py:29-32`), but with proper failure links so the
  * worst case never degrades to O(n·m).
  */
final class AhoCorasick private (
    gotoFn: Array[Map[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    patterns: Array[String]) extends Serializable {

  @inline private def isWordChar(ch: Char): Boolean =
    Character.isLetterOrDigit(ch) || ch == '_'

  /** All matches with word-boundary semantics (`utils/fastmatch.py:56-59`:
    * boundaries are implicit at begin/end of document, and any non-word char
    * otherwise — equivalent to the regex `\b` oracle used in tests).
    * Offsets are 0-based, end exclusive (the reference's 1-based scan
    * positions at `fastmatch.py:126` are normalized — deliberate fix).
    */
  def findAll(text: String): Seq[(String, Int, Int)] = {
    if (text == null) return Nil
    val res = mutable.ArrayBuffer.empty[(String, Int, Int)]
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !gotoFn(s).contains(c)) s = fail(s)
      state = gotoFn(s).getOrElse(c, 0)
      val hits = out(state)
      var k = 0
      while (k < hits.length) {
        val pat = patterns(hits(k))
        val end = i + 1
        val start = end - pat.length
        val okLeft = start == 0 || !isWordChar(text.charAt(start - 1))
        val okRight = end == n || !isWordChar(text.charAt(end))
        if (okLeft && okRight) res += ((pat, start, end))
        k += 1
      }
      i += 1
    }
    res.toSeq
  }
}

object AhoCorasick {
  def build(rawPatterns: Seq[String]): AhoCorasick = {
    val patterns = rawPatterns.distinct.filter(p => p != null && p.nonEmpty).toArray
    val gotoMut = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outMut = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        node = gotoMut(node).getOrElseUpdate(c, {
          gotoMut += mutable.HashMap.empty[Char, Int]
          outMut += mutable.ArrayBuffer.empty[Int]
          gotoMut.length - 1
        })
      }
      outMut(node) += pi
    }
    // failure links (BFS)
    val fail = Array.fill(gotoMut.length)(0)
    val queue = mutable.Queue.empty[Int]
    gotoMut(0).values.foreach(queue.enqueue)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMut(u).foreach { case (c, v) =>
        queue.enqueue(v)
        var f = fail(u)
        while (f != 0 && !gotoMut(f).contains(c)) f = fail(f)
        fail(v) = if (gotoMut(f).contains(c) && gotoMut(f)(c) != v) gotoMut(f)(c) else 0
        outMut(v) ++= outMut(fail(v))
      }
    }
    new AhoCorasick(gotoMut.map(_.toMap).toArray, fail, outMut.map(_.toArray).toArray, patterns)
  }
}

/** FM1 — FastMatch (SURVEY.md §2.8): exact multi-pattern matching of a
  * candidate set against a text column, word-boundary semantics, returning
  * `array<struct<matched:string, start:int, end:int>>`.
  *
  * Reference: `utils/fastmatch.py:65-134`; intended use tagging the dataset
  * gazetteer (`db/data_set_labels.json`) inside paragraphs
  * (`dataset_ner/paper_processing.py:143-147`).
  *
  * Case-insensitive by default, mirroring `fastmatch.py:10-11` (lowercase
  * both sides). Test oracle (SURVEY §2.8 plan B): per-candidate regex
  * `\bcandidate\b` counting — see the `fm1_*` queries and FastMatchSpec.
  */
object FastMatch {
  case class Match(matched: String, start: Int, end: Int)

  /** Build a reusable matcher UDF over a fixed candidate set. */
  def matcher(candidates: Seq[String], caseInsensitive: Boolean = true): UserDefinedFunction = {
    val pats = if (caseInsensitive) candidates.map(_.toLowerCase) else candidates
    val ac = AhoCorasick.build(pats)
    val ci = caseInsensitive
    udf { (text: String) =>
      if (text == null) null
      else ac.findAll(if (ci) text.toLowerCase else text).map { case (m, s, e) => Match(m, s, e) }
    }
  }

  /** `fast_match(text)` as a Column; builds the automaton once per call site. */
  def fastMatch(text: Column, candidates: Seq[String], caseInsensitive: Boolean = true): Column =
    matcher(candidates, caseInsensitive)(text)

  /** Sharded matcher for gazetteers too large for one broadcast automaton
    * (SCALE.md rule 3): split the candidate list into ⌈n/maxPerShard⌉
    * shards, ship one automaton per shard inside the same task closure, and
    * concatenate per-shard match arrays. One pass over each text per shard —
    * cost grows linearly with shard count, memory per automaton stays
    * bounded. Matches are the same multiset as the unsharded matcher but
    * grouped by shard; order-sensitive consumers should sort by start.
    * Property-tested ≡ unsharded in FastMatchSpec. */
  def fastMatchSharded(text: Column, candidates: Seq[String], maxPerShard: Int,
      caseInsensitive: Boolean = true): Column = {
    require(maxPerShard > 0, "maxPerShard must be positive")
    val shards = candidates.grouped(maxPerShard).toSeq
    if (shards.isEmpty) fastMatch(text, Nil, caseInsensitive)
    else shards.map(sh => fastMatch(text, sh, caseInsensitive))
      .reduce((a, b) => org.apache.spark.sql.functions.concat(a, b))
  }
}
