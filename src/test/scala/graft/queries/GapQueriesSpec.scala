package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the eval-metric queries (exact values are oracle-checked
  * by the driver; these pin the semantic contracts). */
class GapQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a13: span-level confusion is consistent and non-degenerate") {
    val rows = GapQueries.a13SpanF1(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nGold, nPred, tp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tp <= math.min(nGold, nPred), s"tp can never exceed either span count: $r")
      val f1 = r.getLong(6)
      assert(f1 >= 0L && f1 <= 1000000L, s"f1_e6 out of [0, 1e6]: $r")
    }
    // the pred predicate is tuned so the metric is NOT degenerate: strict
    // span matching must produce hits somewhere and misses somewhere
    assert(rows.map(_.getLong(3)).sum > 0L, "no exact span matches at all")
    assert(rows.exists(r => r.getLong(3) < r.getLong(2)), "no false-positive spans")
    assert(rows.exists(r => r.getLong(3) < r.getLong(1)), "no false-negative spans")
  }

  test("a14/a15: confusion marginals are consistent and kappa is bounded") {
    val cm = TextQueries.a14ConfusionMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val kap = TextQueries.a15CohensKappa(spark, dir).collect()(0)
    val (nn, agree) = (kap.getLong(0), kap.getLong(1))
    assert(cm.map(_._3).sum === nn, "confusion cells sum to the held-out count")
    assert(cm.filter(c => c._1 == c._2).map(_._3).sum === agree, "diagonal = agreements")
    val kappa = kap.getLong(4)
    assert(kappa >= -1000000L && kappa <= 1000000L, s"kappa_e6 out of range: $kappa")
    // full-matrix sanity: predictions are spread over more than one class
    // (the unnormalized overlap score this caught used to predict ONE class)
    assert(cm.map(_._2).distinct.length > 1, "classifier predicts a single class")
  }

  test("a13: span-level recall can only be <= token-level recall's span proxy") {
    // sanity vs a7: both derive gold from d-words; span-strict matching is
    // a harder criterion, so span precision <= 1e6 trivially and the span
    // counts line up with the token flags' run structure (every gold span
    // is at least one token, so n_gold <= total gold tokens)
    val goldTokens = graft.Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").startsWith("d")).count()
    val nGoldSpans = GapQueries.a13SpanF1(spark, dir)
      .agg(sum("n_gold")).collect()(0).getLong(0)
    assert(nGoldSpans <= goldTokens)
    assert(nGoldSpans > 0L)
  }
}
