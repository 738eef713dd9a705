package graft.queries

import graft.SparkSpec

/** ir1_rrf_fusion invariants (the oracle pins exact values; this pins the
  * RRF semantics independently of either engine). */
class RrfFusionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fused output respects the RRF contribution algebra") {
    val rows = TextQueries.ir1RrfFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 20)
    // every contribution is round(1e6/(60+rank)) with rank in 1..50, so a
    // doc's fused score is a sum of 1 or 2 values from that closed set
    val valid = (1 to 50).map(r => math.round(1e6 / (60.0 + r))).toSet
    rows.foreach { case (id, nSys, rrf) =>
      assert(nSys === 1L || nSys === 2L, s"doc $id in $nSys systems")
      if (nSys == 1L) assert(valid.contains(rrf), s"doc $id rrf=$rrf not a single contribution")
      else {
        val ok = valid.exists(a => valid.contains(rrf - a))
        assert(ok, s"doc $id rrf=$rrf not a sum of two contributions")
      }
    }
    // descending fused order with doc_id tiebreak
    assert(rows.sliding(2).forall { case Array((ida, _, a), (idb, _, b)) =>
      a > b || (a == b && ida < idb) },
      "output must be ordered by rrf desc, doc_id")
  }

  test("a document ranked by both systems outscores its single-system rank twin") {
    // max single contribution is rank 1 in one system: 1e6/61 ≈ 16393;
    // min double contribution is rank 50 twice: 2·round(1e6/110) ≈ 18182 —
    // any doc in both top-50s beats any doc in just one. Verify on data.
    val rows = TextQueries.ir1RrfFusion(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val both = rows.filter(_._1 == 2L).map(_._2)
    val single = rows.filter(_._1 == 1L).map(_._2)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.min > single.max, "two-system docs must dominate")
  }
}
