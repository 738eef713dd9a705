package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.queries.{CurationQueries, Q}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity proof for the bigram-LM perplexity gate (r10): the stream-static
  * join face must score every document EXACTLY like `ta14_bigram_ppl`,
  * across arbitrary micro-batch cuts. The per-(window, doc) aggregation is
  * the only stateful operator; the LM joins are stateless per batch. */
class BigramPplStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Base = 120_000L // hour-aligned minutes (EventStreamsSpec convention)
  private def ts(minutes: Long): Timestamp = new Timestamp((Base + minutes) * 60_000L)

  /** (uni, big, tt, vv) trained exactly like ta14's batch face: 80% split,
    * array-domain adjacent pairs. */
  private def trainedLm(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Long, Long) = {
    val trainTok = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 < 4)
      .select(col("doc_id"), Q.tokens(col("text")).as("tk"))
    val uni = trainTok.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("ucnt")).localCheckpoint()
    val big = trainTok.filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("bcnt")).localCheckpoint()
    val st = uni.agg(sum("ucnt"), count(lit(1))).collect().head
    (uni, big, st.getLong(0), st.getLong(1))
  }

  test("stream face scores identically to batch ta14, across micro-batch cuts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (uni, big, tt, vv) = trainedLm()
    val expected = CurationQueries.ta14BigramPpl(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(expected.nonEmpty)

    val testDocs = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.bigramPplStream(
        mem.toDF().toDF("doc_id", "ts", "text"), uni, big, tt, vv,
        gateMeanNllE6 = 10_000_000L)
      .writeStream.format("memory").queryName("bigram_ppl")
      .outputMode(OutputMode.Append()).start()
    // all real docs land in the same hour window; three uneven cuts
    val stamped = testDocs.zipWithIndex.map { case ((id, t), i) => (id, ts(i % 50), t) }
    val cuts = Seq(stamped.take(1), stamped.slice(1, 7), stamped.drop(7))
    cuts.filter(_.nonEmpty).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    // far-future sentinel advances the watermark so the real windows emit
    mem.addData((-1L, ts(100_000), "sentinel doc body")); q.processAllAvailable()
    q.stop()

    val got = spark.table("bigram_ppl")
      .filter(col("doc_id") >= 0)
      .select("doc_id", "n_trans", "nll_e6_sum", "mean_nll_e6")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expected,
      "stream-face scores must equal the batch ta14 face doc-for-doc")
  }

  test("per-doc aggregation state survives a checkpointed restart") {
    // The only stateful operator is the watermarked (window, doc) agg: docs
    // scored BEFORE a restart whose window is still open must emit AFTER
    // the restart, from recovered state, with scores equal to the batch
    // face — the recovery half of the parity contract.
    import java.nio.file.Files
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
    val (uni, big, tt, vv) = trainedLm()
    val expected = CurationQueries.ta14BigramPpl(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val base = Files.createTempDirectory("graft_bppl_restart").toString
    val (landing, out, ckpt) = (s"$base/landing", s"$base/out", s"$base/ckpt")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("ts", TimestampType), StructField("text", StringType)))

    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(landing)
      val q = EventStreams.bigramPplStream(stream, uni, big, tt, vv,
          gateMeanNllE6 = 10_000_000L)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val spark0 = spark
    import spark0.implicits._
    val testDocs = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), lit(ts(0)).as("ts"), col("text"))
    // run 1: all real docs land, window stays open — nothing may emit
    testDocs.write.mode("append").parquet(landing)
    drain()
    assert(spark.read.schema(
      "window_start timestamp, doc_id long, n_trans long, nll_e6_sum long, mean_nll_e6 long, flagged int")
      .parquet(out).count() === 0L, "window must still be open before the restart")
    // run 2 (fresh query, same checkpoint): the sentinel closes the window
    Seq((-1L, ts(100_000), "sentinel doc body")).toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(landing)
    drain()
    val got = spark.read.parquet(out)
      .filter(col("doc_id") >= 0)
      .select("doc_id", "n_trans", "nll_e6_sum", "mean_nll_e6")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expected,
      "post-restart emission must equal the batch face from recovered state")
  }

  test("the gate flags exactly the docs above threshold; LM misses stay finite") {
    val (uni, big, tt, vv) = trainedLm()
    // batch execution of the same plan (watermark is a no-op in batch)
    val docs = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), lit(ts(0)).as("ts"), col("text"))
    val scores = EventStreams.bigramPplStream(docs, uni, big, tt, vv, gateMeanNllE6 = 0L)
      .select("mean_nll_e6").collect().map(_.getLong(0)).sorted
    assert(scores.nonEmpty)
    // unigram back-off keeps every unseen transition finite
    assert(scores.forall(s => s > 0L && s < 100_000_000L))
    val gate = scores(scores.length / 2)
    val out = EventStreams.bigramPplStream(docs, uni, big, tt, vv, gateMeanNllE6 = gate)
      .select("mean_nll_e6", "flagged").collect()
    assert(out.forall(r => (r.getInt(1) == 1) == (r.getLong(0) > gate)))
    assert(out.exists(_.getInt(1) == 1) && out.exists(_.getInt(1) == 0))
  }
}
