package graft.queries

import graft.SparkSpec

/** ss2 (IVF) is approximate by design — check recall@5 against the ss1
  * brute-force baseline rather than equality, plus basic invariants. */
class SimilarityQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("plan shape: ss2 corpus side reaches the probe join with no Exchange") {
    val plan = SimilarityQueries.ss2IvfTopk(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // assignment is a projection over the literal centroid index: the only
    // exchanges allowed are the broadcast of the probes and the per-query
    // top-k/order AFTER the join — never a shuffle of the corpus before it
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, s"expected a broadcast probe join:\n$plan")
    // the tree prints parents above children: everything below the join line
    // is its inputs (corpus side + broadcast side). The corpus side must
    // carry no hash-partitioning shuffle; the probe side ships as a
    // BroadcastExchange (allowed).
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"no corpus shuffle may sit between scan and probe join:\n$plan")
    assert(plan.contains("vec_dot"), s"codegen dot product expected in plan:\n$plan")
  }

  test("ivf recall@5 vs brute force is reasonable") {
    val exact = SimilarityQueries.ss1BruteforceTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SimilarityQueries.ss2IvfTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // n_probe=2 of ~6 cells on random vectors: expect a solid fraction, and
    // the bound documents the measured floor so regressions surface.
    assert(recall >= 0.3, s"recall@5 = $recall")
    assert(approx.nonEmpty)
  }

  test("lsh multi-probe top-k: valid shape and non-trivial overlap with exact") {
    val exact = SimilarityQueries.ss1BruteforceTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rows = SimilarityQueries.ss3LshTopk(spark, dir).collect()
    assert(rows.nonEmpty)
    // ≤ k rows per query (sparse buckets at sf0.001 may yield fewer)
    val perQuery = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.values.forall(_ <= 5))
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 8-bit buckets + 1-bit multi-probe on random vectors: a floor, not a
    // target — documents measured behavior so regressions surface
    assert(recall >= 0.05, s"recall@5 = $recall")
  }

  test("brute-force top-k is k rows per query with cos in [-1e6, 1e6]") {
    val rows = SimilarityQueries.ss1BruteforceTopk(spark, dir).collect()
    assert(rows.length === 50)
    assert(rows.forall(r => math.abs(r.getLong(3)) <= 1000000L))
    val perQuery = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.values.forall(_ === 5))
  }
}
