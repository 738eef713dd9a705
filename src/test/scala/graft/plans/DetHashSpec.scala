package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** det_hash60 must be BIT-IDENTICAL to the composable md5/conv spelling —
  * every oracle in the suite derives sampling, minhash, bloom positions and
  * split membership from it, so a single differing bit silently flips
  * hash-compares everywhere. */
class DetHashSpec extends SparkSpec {

  test("native det_hash60 equals the md5/conv spelling on adversarial inputs") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val inputs = Seq(
      "", "a", "hello world", "δοκιμή unicode ✓", "0", "-1",
      "a" * 1000, "line\nbreak\ttab", "ÿ",
      "9223372036854775807") ++ (1 to 500).map(i => s"doc-$i-" + ("x" * (i % 37)))
    val df = inputs.toDF("s")
    for (seed <- Seq(0, 1, 17, 41, 53, 59, 61)) {
      val mismatches = df.select(
          graft.queries.Q.detHash(col("s"), seed).as("fast"),
          graft.queries.Q.detHashMd5(col("s"), seed).as("ref"))
        .filter(col("fast") =!= col("ref") || col("fast").isNull =!= col("ref").isNull)
        .count()
      assert(mismatches === 0L, s"seed $seed diverges")
    }
  }

  test("null in, null out — same as md5(null)") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val df = Seq[Option[String]](None, Some("x")).toDF("s")
    val rows = df.select(graft.queries.Q.detHash(col("s")).as("h")).collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    assert(rows.count(!_.isNullAt(0)) === 1)
  }

  test("range: always non-negative and below 2^60") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val rows = (1 to 2000).map(_.toString).toDF("s")
      .select(graft.queries.Q.detHash(col("s")).as("h"))
      .agg(min("h"), max("h")).collect()(0)
    assert(rows.getLong(0) >= 0L)
    assert(rows.getLong(1) < (1L << 60))
  }
}
