package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The dq6 streaming face: per-window PSI against literal reference bins
  * must flag a distribution flip and stay quiet on reference-like data. */
class PsiDriftStreamSpec extends SparkSpec {

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")

  /** Reference bin counts for a token multiset, via the same hash the
    * stream uses. */
  private def binCounts(tokens: Seq[String]): Seq[Long] = {
    val spark0 = spark
    import spark0.implicits._
    val hit = tokens.toDF("w")
      .select((graft.queries.Q.detHash(col("w"), 29) % 64).as("bin"))
      .groupBy("bin").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 64).map(i => hit.getOrElse(i.toLong, 0L))
  }

  test("a window speaking the reference vocabulary is stable; a flipped one is shifted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val refTokens = Seq.fill(40)(Seq("alpha", "beta", "gamma", "delta")).flatten
    val ref = binCounts(refTokens)

    val mem = MemoryStream[(Timestamp, String)]
    val q = EventStreams.psiDriftStream(
        mem.toDF().toDF("ts", "text"), ref, windowLen = "1 hour", horizon = "10 hours")
      .writeStream.format("memory").queryName("psidrift")
      .outputMode(OutputMode.Complete()).start()
    try {
      // hour 1: the reference distribution; hour 2: a disjoint vocabulary
      mem.addData((1 to 30).map(_ => (ts(1), "alpha beta gamma delta")): _*)
      mem.addData((1 to 30).map(_ => (ts(2), "zulu yankee xray whiskey")): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM psidrift ORDER BY window_start").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[String]("band") === "stable",
        s"reference-like window psi = ${rows(0).getAs[Long]("psi_e9")}")
      assert(rows(1).getAs[String]("band") === "shifted",
        s"flipped window psi = ${rows(1).getAs[Long]("psi_e9")}")
      assert(rows(0).getAs[Long]("n_tokens") === 120L)
    } finally q.stop()
  }
}
