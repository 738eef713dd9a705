package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx distinct is within 5% of exact per group, and a12 reports in-bound") {
    // a12's oracle-facing output carries (exact, within_bound); the raw HLL
    // estimate is recomputed here so the TIGHTER 5% drift assertion the
    // docstring promises stays a hard test
    val rows = Relational.a12ApproxDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_bound"), r.toString))
    val approx = graft.Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey").as("a")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.map(r => r.getString(0) -> r.getAs[Long]("exact_parts")).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx=$a exact=$e")
    }
  }

  test("approx quantile sketch tracks the exact quartiles within 1%, and t7 reports in-bound") {
    val t7 = Relational.t7ApproxQuantiles(spark, dir).collect()
    assert(t7.nonEmpty)
    t7.foreach(r => assert(r.getAs[Boolean]("within_bound"), r.toString))
    // t7's oracle-facing quartiles are the exact ones; recompute the raw
    // sketch here to keep the 1% value-drift assertion vs t6
    def byFlag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = byFlag(Relational.t6Quantiles(spark, dir))
    val approx = byFlag(graft.Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(cast(l_extendedprice as double), array(0.25, 0.5, 0.75), 10000)").as("q"))
      .select(col("l_returnflag"),
        expr("cast(round(1e6 * q[0]) as bigint)").as("p25_e6"),
        expr("cast(round(1e6 * q[1]) as bigint)").as("p50_e6"),
        expr("cast(round(1e6 * q[2]) as bigint)").as("p75_e6")))
    assert(exact.keySet === approx.keySet)
    for (k <- exact.keySet; (e, a) <- exact(k).zip(approx(k))) {
      assert(math.abs(a - e).toDouble / e <= 0.01, s"$k: approx=$a exact=$e")
    }
  }

  test("dq2: MAD outlier screen flags a strict minority per event type") {
    val rows = Relational.dq2OutlierMad(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, medE6, madE6, outliers) =>
      assert(outliers >= 0L && outliers < n / 2,
        s"$et: a robust screen can never flag a majority ($outliers of $n)")
      assert(medE6 > 0L && madE6 > 0L, s"$et: degenerate spread")
    }
  }

  test("rollup emits subtotal and grand-total rows") {
    val rows = Relational.r1Rollup(spark, dir).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n") === 6000)
    // flag-level subtotals: null linestatus, non-null flag
    val subtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(subtotals.map(_.getString(0)).sorted.toSeq === Seq("A", "N", "R"))
  }
}
