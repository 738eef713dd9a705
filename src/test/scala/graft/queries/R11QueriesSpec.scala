package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden/invariant checks for the r11 additions beyond the DuckDB oracle
  * replay: a30's bootstrap-test invariants. */
class R11QueriesSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)], tag: String): String = {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory(tag).toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("a30: identical systems give every-delta-zero and p = 1") {
    // identity rule for system B — the Koehn sanity anchor: a test that
    // can reject A == A is broken
    val r = TextQueries.bootstrapCore(spark, "/root/testdata/sf0.001",
      "filter(tk, (x, i) -> true)").collect().head
    assert(r.getAs[Long]("n_resamples") === 200L)
    assert(r.getAs[Long]("wins_a") === 0L)
    assert(r.getAs[Long]("wins_b") === 0L)
    assert(r.getAs[Long]("sum_delta_e6") === 0L)
    assert(r.getAs[Long]("ci_lo_e6") === 0L)
    assert(r.getAs[Long]("ci_hi_e6") === 0L)
    assert(r.getAs[Long]("p_a_e6") === 1000000L)
  }

  test("a30: a clearly-degraded system B loses significantly on real data") {
    val r = TextQueries.a30BootstrapCi(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getAs[Long]("n_resamples") === 200L)
    // dropping every 4th candidate token must cost BLEU-2 on (nearly)
    // every resample: demand a significant one-tailed result
    assert(r.getAs[Long]("wins_a") >= 190L, s"wins_a = ${r.getAs[Long]("wins_a")}")
    assert(r.getAs[Long]("p_a_e6") <= 50000L, s"p = ${r.getAs[Long]("p_a_e6")}")
    assert(r.getAs[Long]("sum_delta_e6") > 0L)
    // the CI must be ordered and, for a significant win, exclude zero
    val (lo, hi) = (r.getAs[Long]("ci_lo_e6"), r.getAs[Long]("ci_hi_e6"))
    assert(lo <= hi && lo > 0L, s"CI [$lo, $hi]")
  }

  test("a30: resample draws are deterministic across invocations") {
    val a = TextQueries.a30BootstrapCi(spark, "/root/testdata/sf0.001").collect()
    val b = TextQueries.a30BootstrapCi(spark, "/root/testdata/sf0.001").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("a30: a two-pair micro corpus exercises the with-replacement draw") {
    // candidate 0 == reference 1 (perfect pair 0); candidate 2 disjoint
    // from reference 3 (zero pair 1): every resample's corpus BLEU is a
    // mix decided by the seeded draw; identity-B must still tie exactly
    val dir = docsDir(Seq(
      (0L, "a b c d"), (1L, "a b c d"),
      (2L, "p q r s"), (3L, "w x y z")), "a30m")
    val r = TextQueries.bootstrapCore(spark, dir,
      "filter(tk, (x, i) -> true)").collect().head
    assert(r.getAs[Long]("wins_a") === 0L && r.getAs[Long]("wins_b") === 0L)
    assert(r.getAs[Long]("p_a_e6") === 1000000L)
  }
}
