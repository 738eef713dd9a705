package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 query specs: tok8 byte fallback. */
class R12QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Decode a byte-fallback piece stream back to the original string:
    * `<0xXX>` pieces contribute raw bytes, every other piece its UTF-8
    * bytes — then one UTF-8 decode over the byte stream. This is the
    * inverse the tokenizer contract promises. */
  private def decode(pieces: Seq[String]): String = {
    val bytes = pieces.flatMap {
      case p if p.startsWith("<0x") && p.endsWith(">") && p.length == 6 =>
        Seq(Integer.parseInt(p.substring(3, 5), 16).toByte)
      case p => p.getBytes("UTF-8").toSeq
    }
    new String(bytes.toArray, "UTF-8")
  }

  test("tok8: a rare multi-byte char round-trips through byte pieces losslessly") {
    import spark.implicits._
    // "café" char-split state; alphabet covers ASCII letters only, so 'é'
    // (U+00E9, UTF-8 C3 A9) is out-of-alphabet and must become TWO byte
    // pieces; the in-alphabet "ca" merge must survive intact
    val state = Seq(("café", 7L, Seq("ca", "f", "é"))).toDF("word", "freq", "syms")
    val alphabet = ('a' to 'z').map(_.toString)
    val r = CorpusQueries.byteFallbackEncode(state, alphabet).collect().head
    val pieces = r.getAs[scala.collection.Seq[String]]("pieces").toSeq
    assert(pieces === Seq("ca", "f", "<0xC3>", "<0xA9>"))
    assert(r.getAs[Int]("n_pieces") === 4)
    assert(r.getAs[Int]("n_byte_pieces") === 2)
    assert(decode(pieces) === "café", "byte fallback must be lossless")
  }

  test("a34: alpha equals a brute-force pairwise re-derivation and hits the textbook poles") {
    import spark.implicits._
    // fixture with MISSING ratings: 5 units, up to 3 raters, m_u ∈ {2, 3};
    // unit 9 has a single rating and must be DROPPED as unpairable
    val ratings = Seq(
      (1L, 0, "a"), (1L, 1, "a"), (1L, 2, "a"),
      (2L, 0, "a"), (2L, 1, "b"),
      (3L, 0, "b"), (3L, 1, "b"), (3L, 2, "c"),
      (4L, 0, "c"), (4L, 2, "c"),
      (5L, 0, "a"), (5L, 1, "b"), (5L, 2, "b"),
      (9L, 0, "a"))
    val r = TextQueries.krippendorffCore(
      ratings.toDF("doc_id", "r", "label")).collect().head
    assert(r.getAs[Long]("n_units") === 5)
    assert(r.getAs[Long]("n_values") === 13)
    // brute force off-plan: D_o = (1/n)·Σ_u Σ_{c≠k} n_uc·n_uk/(m_u−1),
    // D_e = (1/(n(n−1)))·Σ_{c≠k} n_c·n_k — the textbook definition
    val pairable = ratings.filter(_._1 != 9L)
    val byUnit = pairable.groupBy(_._1).values.map(_.map(_._3))
    val n = pairable.size.toDouble
    val dO = byUnit.map { ls0 =>
      val ls = ls0.toIndexedSeq
      val m = ls.size.toDouble
      // all index pairs (combinations() would dedupe equal-label multiset
      // pairs and undercount)
      val disagree = (for (i <- ls.indices; j <- ls.indices if i < j)
        yield if (ls(i) != ls(j)) 1 else 0).sum
      disagree * 2.0 / (m - 1.0)
    }.sum / n
    val margins = pairable.groupBy(_._3).view.mapValues(_.size.toDouble).toMap
    // keys.toSeq: a for over Set would DEDUPE equal products (25 = 5·5
    // counted once instead of twice) and silently shrink Σ n_c·n_k
    val sumE = (for (c <- margins.keys.toSeq; k <- margins.keys.toSeq if c != k)
      yield margins(c) * margins(k)).sum
    val dE = sumE / (n * (n - 1.0))
    val expect = math.round(1e6 * (1.0 - dO / dE))
    assert(r.getAs[Long]("alpha_e6") === expect,
      s"query alpha ${r.getAs[Long]("alpha_e6")} != brute-force $expect")
    // poles: perfect agreement → 1; and the corpus face is in (0, 1]
    val perfect = TextQueries.krippendorffCore(
      Seq((1L, 0, "x"), (1L, 1, "x"), (2L, 0, "y"), (2L, 1, "y"))
        .toDF("doc_id", "r", "label")).collect().head
    assert(perfect.getAs[Long]("alpha_e6") === 1000000L)
    val corpus = TextQueries.a34Krippendorff(spark, dir).collect().head
    assert(corpus.getAs[Long]("alpha_e6") > 0L &&
      corpus.getAs[Long]("alpha_e6") <= 1000000L)
    // the 20% flip + missingness must land agreement well below perfect
    assert(corpus.getAs[Long]("alpha_e6") < 1000000L)
  }

  test("kg1: edge invariants hold (support bounds, NPMI range, unique ordered pairs)") {
    val rows = MatchQueries.kg1EntityGraph(spark, dir).collect()
    assert(rows.nonEmpty)
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    rows.foreach { r =>
      val (e1, e2) = (r.getAs[String]("e1"), r.getAs[String]("e2"))
      assert(e1 < e2)
      assert(seen.add((e1, e2)), s"duplicate edge $e1-$e2")
      val (nCo, n1, n2) = (r.getAs[Long]("n_co"), r.getAs[Long]("n_e1"), r.getAs[Long]("n_e2"))
      assert(nCo >= 1 && nCo <= math.min(n1, n2),
        s"co-support $nCo outside [1, min($n1, $n2)]")
      assert(r.getAs[Long]("npmi_e6") <= 1000000L)
    }
  }

  test("kg2: ranks match an off-plan integer power-iteration re-derivation") {
    val edges = MatchQueries.kg1EntityGraph(spark, dir).collect()
      .flatMap(r => Seq(
        (r.getAs[String]("e1"), r.getAs[String]("e2"), r.getAs[Long]("n_co")),
        (r.getAs[String]("e2"), r.getAs[String]("e1"), r.getAs[Long]("n_co"))))
    val wsum = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._3).sum }
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.length
    var r = nodes.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to 10) {
      val in = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      edges.foreach { case (src, dst, w) =>
        in(dst) += Math.floorDiv(r(src) * w, wsum(src)) // nonneg: div == floorDiv
      }
      r = nodes.map(e => e -> (150000L / n + Math.floorDiv(85L * in(e), 100L))).toMap
    }
    val got = MatchQueries.kg2EntityPagerank(spark, dir).collect()
      .map(x => x.getAs[String]("entity") -> x.getAs[Long]("rank_e6")).toMap
    assert(got === r, s"query ranks $got != off-plan $r")
    // teleport floor: every kept node gets at least the teleport mass
    got.values.foreach(v => assert(v >= 150000L / n))
  }

  test("el1: typo links to its entity, ambiguity resolves by prior, far forms drop") {
    import spark.implicits._
    val words = Seq(
      ("stream", 10L),  // exact
      ("stram", 3L),    // deletion typo -> stream
      ("strum", 2L),    // dist 2 from stream -> must NOT link
      ("dota", 1L))     // dist 1 of BOTH data (prior 9) and dots (prior 4)
      .toDF("w", "n_occ")
    val ents = Seq(("stream", 7L), ("data", 9L), ("dots", 4L)).toDF("entity", "prior")
    val got = MatchQueries.mentionLinkCore(words, ents).collect()
      .map(r => r.getAs[String]("w") -> (r.getAs[String]("entity"), r.getAs[Int]("dist"))).toMap
    assert(got("stream") === ("stream", 0))
    assert(got("stram") === ("stream", 1), "deletion typo must link at distance 1")
    assert(got("dota") === ("data", 1), "ambiguous form must resolve to the higher-prior entity")
    assert(!got.contains("strum"), "distance-2 form must not link")
  }

  test("el2: context coherence overrides prior in disambiguation") {
    import spark.implicits._
    // "dota" is distance 1 from BOTH "data" (prior 9) and "dots" (prior 4);
    // the document's other entity "grid" co-occurs strongly with "dots" —
    // context must flip the choice el1's prior-only rule would make
    val mentions = Seq((1L, "dota")).toDF("doc_id", "w")
    val cands = Seq(("dota", "data", 1, 9L), ("dota", "dots", 1, 4L))
      .toDF("w", "entity", "dist", "prior")
    val edges = Seq(("dots", "grid", 800000L), ("data", "grid", 10000L))
      .toDF("e1", "e2", "npmi_e6")
    val context = Seq((1L, "grid")).toDF("doc_id", "entity")
    val r = MatchQueries.contextLinkCore(mentions, cands, edges, context).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("entity") === "dots",
      "coherence with the doc's entities must beat raw prior")
    assert(r.head.getAs[Long]("ctx_e6") === 800000L)
  }

  test("el2: corpus scores are symmetric-consistent with kg1 edges") {
    val rows = MatchQueries.el2ContextScore(spark, dir).collect()
    assert(rows.nonEmpty)
    // every (doc, entity) with co-present company has n_ctx >= 1, and a
    // doc's total context mass is symmetric: sum over its entities of
    // ctx equals 2x the sum of its internal edge scores
    val edges = MatchQueries.kg1EntityGraph(spark, dir).collect()
      .map(r => (r.getAs[String]("e1"), r.getAs[String]("e2")) -> r.getAs[Long]("npmi_e6")).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val ents = rs.map(_.getAs[String]("entity")).sorted
      val internal = (for (i <- ents.indices; j <- ents.indices if i < j)
        yield edges.getOrElse((ents(i), ents(j)), 0L)).sum
      val total = rs.map(_.getAs[Long]("ctx_npmi_e6")).sum
      assert(total === 2 * internal, s"doc context mass $total != 2x internal $internal")
    }
  }

  test("tok9: pruning losses are non-negative and share one corpus baseline") {
    val rows = CorpusQueries.tok9VocabPrune(spark, dir).collect()
    assert(rows.nonEmpty, "the 3-merge inventory must yield multi-char candidates")
    val bases = rows.map(_.getAs[Long]("base_nll_e6")).distinct
    assert(bases.length === 1, "every candidate prices against the same baseline")
    rows.foreach { r =>
      // removing an option can never improve a minimum
      assert(r.getAs[Long]("loss_e6") >= 0L,
        s"negative pruning loss for ${r.getAs[String]("cand")}")
      assert(r.getAs[String]("cand").length >= 2, "single chars are never candidates")
      // a piece whose removal costs likelihood must have forced re-segmentation
      if (r.getAs[Long]("loss_e6") > 0L) assert(r.getAs[Long]("n_resegmented") > 0L)
    }
    // the output is sorted by the trainer's decision key: cheapest first
    val losses = rows.map(_.getAs[Long]("loss_e6"))
    assert(losses.sameElements(losses.sorted))
  }

  test("mm5: islands invariants hold on every audio asset") {
    val rows = graft.queries.MultimodalQueries.mm5SilenceTrim(spark, dir).collect()
    assert(rows.nonEmpty)
    var anySilent = false
    rows.foreach { r =>
      val (nf, ns) = (r.getAs[Long]("n_frames"), r.getAs[Long]("n_silent"))
      val (segs, longest) = (r.getAs[Long]("n_segments"), r.getAs[Long]("longest_seg"))
      assert(r.getAs[Long]("asset_id") % 3 === 1, "only audio-routed assets")
      assert(ns <= nf)
      // k silent frames split the timeline into at most k+1 speech islands
      assert(segs <= ns + 1, s"segments $segs > silent+1 ${ns + 1}")
      assert(longest <= nf - ns, s"longest $longest > active frames ${nf - ns}")
      // a fully-silent asset has zero segments; anything else at least one
      assert((segs == 0) === (ns == nf))
      anySilent ||= ns > 0
    }
    assert(anySilent, "threshold must mark some frames silent on real data")
  }

  test("tok8: corpus face emits only byte-affected words and replays tok2 merges") {
    val rows = CorpusQueries.tok8ByteFallback(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_byte_pieces") >= 1)
      val enc = r.getAs[String]("encoded")
      assert(enc.contains("<0x"), s"expected a byte piece in $enc")
      // every byte piece must decode back into the word (losslessness on
      // the corpus face too)
      assert(decode(enc.split('|').toSeq) === r.getAs[String]("word"))
    }
  }
}
