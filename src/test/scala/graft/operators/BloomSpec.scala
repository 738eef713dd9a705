package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  private def items(xs: Seq[String]) = {
    import spark.implicits._
    xs.toDF("item")
  }

  private val m = 1L << 14
  private val k = 4

  test("no false negatives: every built item probes positive (both probes)") {
    val xs = (1 to 500).map(i => s"item-$i")
    val filter = Bloom.build(items(xs), "item", m, k)
    for (probed <- Seq(
        Bloom.probe(items(xs), "item", filter, m, k),
        Bloom.probeLit(items(xs), "item", filter, m, k))) {
      assert(probed.filter(col("in_bloom") === 0).count() === 0L)
    }
  }

  test("join probe and literal probe agree on members and non-members") {
    val built = (1 to 300).map(i => s"in-$i")
    val mixed = built.take(50) ++ (1 to 200).map(i => s"out-$i")
    val filter = Bloom.build(items(built), "item", m, k)
    val a = Bloom.probe(items(mixed), "item", filter, m, k)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val b = Bloom.probeLit(items(mixed), "item", filter, m, k)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  test("probe keeps duplicate rows and returns null for null items, like probeLit") {
    import spark.implicits._
    val filter = Bloom.build(items(Seq("a", "b")), "item", m, k)
    val in = Seq(Some("a"), Some("a"), None, Some("zz")).toDF("item")
    for (probed <- Seq(
        Bloom.probe(in, "item", filter, m, k),
        Bloom.probeLit(in, "item", filter, m, k))) {
      val rows = probed.collect()
        .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getInt(1))))
      assert(rows.count(_ == (Some("a"), Some(1))) === 2, "duplicates must survive")
      assert(rows.contains((None, None)), "null item must yield null")
      assert(rows.count(_._1.contains("zz")) === 1)
    }
  }

  test("probeLit fails loudly when numBits is smaller than the build's") {
    val filter = Bloom.build(items((1 to 500).map("x" + _)), "item", 1L << 16, k)
    val ex = intercept[IllegalArgumentException] {
      Bloom.probeLit(items(Seq("x1")), "item", filter, 1L << 10, k).collect()
    }
    assert(ex.getMessage.contains("numBits"))
  }

  test("false-positive rate stays near the (1-e^(-kn/m))^k design point") {
    val built = (1 to 1000).map(i => s"in-$i")
    val strangers = (1 to 2000).map(i => s"out-$i")
    val filter = Bloom.build(items(built), "item", m, k)
    val fp = Bloom.probeLit(items(strangers), "item", filter, m, k)
      .filter(col("in_bloom") === 1).count()
    // kn/m ≈ 0.24 → FPR ≈ 2e-3; allow generous headroom for hash variance
    assert(fp <= 40, s"false positives: $fp / 2000")
  }

  test("dd10 is a superset of dd7's exact contamination, per doc") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.queries.DedupQueries.dd7Contamination(spark, dir)
      .select("doc_id", "n_contam").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = graft.queries.DedupQueries.dd10BloomContamination(spark, dir)
      .select("doc_id", "n_bloom_hits").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet === bloom.keySet)
    exact.foreach { case (doc, n) =>
      assert(bloom(doc) >= n, s"doc $doc: bloom ${bloom(doc)} < exact $n")
    }
  }

  test("requireMeta validates stored geometry and fails loudly on mismatch") {
    val meta = Bloom.metaFor(spark, m, k)
    assert(Bloom.requireMeta(meta, m, k) === ((m, k)))
    val wrongM = intercept[IllegalArgumentException] { Bloom.requireMeta(meta, m * 2, k) }
    assert(wrongM.getMessage.contains("geometry mismatch"))
    val wrongK = intercept[IllegalArgumentException] { Bloom.requireMeta(meta, m, k + 1) }
    assert(wrongK.getMessage.contains("geometry mismatch"))
  }

  test("plan shape: the literal probe is a pure projection — no join, no exchange") {
    val filter = Bloom.build(items((1 to 100).map("x" + _)), "item", m, k)
    val plan = Bloom.probeLit(items((1 to 100).map("y" + _)), "item", filter, m, k)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probeLit must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"probeLit must not shuffle:\n$plan")
  }
}
