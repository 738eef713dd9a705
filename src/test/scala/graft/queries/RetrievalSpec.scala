package graft.queries

import graft.SparkSpec

/** Invariant checks for the r9 retrieval faces beyond the DuckDB replay:
  * PRF expansion must widen, never replace, the base ranking, and hybrid
  * fusion must respect the arm contracts. */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ir2: fusion is base-plus-bonus — fused >= bm25 with integer expansion steps") {
    val rows = TextQueries.ir2PrfExpansion(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (bm25, expTf, fused) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(expTf >= 0L)
      assert(fused === bm25 + expTf * 50000L,
        "fused score must be exactly bm25 + 50000 per expansion-term hit")
    }
    // the corpus must actually exercise the expansion (some doc gains)
    assert(rows.exists(_.getLong(2) > 0L), "no doc matched any expansion term")
  }

  test("ir6 == ta13: BM25 answered from the posting-list index is bit-equal to raw-text BM25") {
    // two physical plans, one logical result — the index-build correctness
    // proof: per-term doubles must round to the SAME e6 integer per doc
    val fromText = TextQueries.ta13Bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(), r.getLong(2))).toSeq
    val fromIndex = TextQueries.ir6PostingsBm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(), r.getLong(2))).toSeq
    assert(fromIndex === fromText)
  }

  test("ir5: index audit rows are internally consistent") {
    val rows = TextQueries.ir5InvertedIndex(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (df, totalTf, nBlocks) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(totalTf >= df, "every posting contributes at least one occurrence")
      assert(nBlocks >= 1L && nBlocks <= df, "blocks partition the postings")
    }
    val dfs = rows.map(_.getLong(1)).toSeq
    assert(dfs === dfs.sorted(Ordering[Long].reverse), "audit is ranked by df desc")
  }

  test("ir3: every fused doc carries 1 or 2 arm contributions, ordered by fused score") {
    val rows = SimilarityQueries.ir3HybridDense(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(n === 1L || n === 2L, s"n_arms must be 1 or 2, got $n")
      // one arm contributes at most round(1e6/61) per rank-1 hit
      assert(r.getLong(2) <= n * math.round(1e6 / 61.0))
    }
    val scores = rows.map(_.getLong(2)).toSeq
    assert(scores === scores.sorted(Ordering[Long].reverse), "must be ranked by rrf_e6 desc")
    // both arms must be represented somewhere in the fused top-20
    assert(rows.exists(_.getLong(1) === 2L), "no doc was found by both arms")
  }
}
