package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.queries.{CurationQueries, Q}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity proof for the streaming Naive-Bayes quality gate: the
  * stream-static classifier face must score every document EXACTLY like
  * `ta17_nb_quality`, across arbitrary micro-batch cuts. The per-(window,
  * doc) aggregation is the only stateful operator (its checkpoint recovery
  * is pinned by BigramPplStreamSpec on the identical aggregate shape); the
  * class-count join is stateless per batch. */
class NbGateStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Base = 120_000L // hour-aligned minutes (EventStreamsSpec convention)
  private def ts(minutes: Long): Timestamp = new Timestamp((Base + minutes) * 60_000L)

  /** (wc, t1, t0, vv, d1, d0) trained exactly like ta17's batch face. */
  private def trainedNb() = {
    val train = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 < 4)
      .select(Q.tokens(col("text")).as("tk"),
        (col("n_chars") >= 256L).cast("int").as("label"))
    val wc = train.select(col("label"), explode(col("tk")).as("w"))
      .groupBy("w").agg(
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("label") === 0, 1L).otherwise(0L)).as("c0"))
      .localCheckpoint()
    val tot = wc.agg(sum("c1"), sum("c0"), count(lit(1))).collect().head
    val pri = train.agg(sum(col("label").cast("long")),
      sum(lit(1L) - col("label"))).collect().head
    (wc, tot.getLong(0), tot.getLong(1), tot.getLong(2), pri.getLong(0), pri.getLong(1))
  }

  test("stream face scores identically to batch ta17, across micro-batch cuts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (wc, t1, t0, vv, d1, d0) = trainedNb()
    val expected = CurationQueries.ta17NbQuality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("nll1_e6"),
          r.getAs[Long]("nll0_e6"), r.getAs[Int]("pred"))).toMap
    assert(expected.nonEmpty)

    val testDocs = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.nbGateStream(
        mem.toDF().toDF("doc_id", "ts", "text"), wc, t1, t0, vv, d1, d0)
      .writeStream.format("memory").queryName("nb_gate")
      .outputMode(OutputMode.Append()).start()
    val stamped = testDocs.zipWithIndex.map { case ((id, t), i) => (id, ts(i % 50), t) }
    val cuts = Seq(stamped.take(1), stamped.slice(1, 7), stamped.drop(7))
    cuts.filter(_.nonEmpty).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    // far-future sentinel advances the watermark so the real windows emit
    mem.addData((-1L, ts(100_000), "sentinel doc body")); q.processAllAvailable()
    q.stop()

    val got = spark.table("nb_gate")
      .filter(col("doc_id") >= 0)
      .select("doc_id", "n_tokens", "nll1_e6", "nll0_e6", "pred")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(got === expected,
      "stream-face scores must equal the batch ta17 face doc-for-doc")
  }

  test("flagged marks exactly the class-0 predictions; both classes occur") {
    val (wc, t1, t0, vv, d1, d0) = trainedNb()
    // batch execution of the same plan (watermark is a no-op in batch)
    val docs = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), lit(ts(0)).as("ts"), col("text"))
    val out = EventStreams.nbGateStream(docs, wc, t1, t0, vv, d1, d0)
      .select("pred", "flagged").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getInt(1) === (if (r.getInt(0) == 0) 1 else 0)))
    assert(out.map(_.getInt(0)).toSet.subsetOf(Set(0, 1)))
  }
}
