package graft.streaming

import graft.SparkSpec
import graft.operators.Sketch
import graft.queries.CurationQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Parity proof for the CMS-LM perplexity gate: the stateless streaming
  * face must score every document EXACTLY like the batch oracle query
  * (`ta15_cms_ppl`), and — being stateless — must be invariant to how the
  * stream is cut into micro-batches. */
class PplGateStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** (sketch, totalTrainTokens) trained exactly like ta15's batch face. */
  private def trainedLm(): (org.apache.spark.sql.DataFrame, Long) = {
    val train = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 < 4)
      .select(explode(split(col("text"), " ")).as("w"))
    val sketch = Sketch.buildCms(train, col("w"),
      CurationQueries.CmsLmDepth, CurationQueries.CmsLmWidth).localCheckpoint()
    (sketch, train.count())
  }

  test("stream face scores identically to the batch ta15 oracle query, across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (sketch, tt) = trainedLm()
    val expected = CurationQueries.ta15CmsPpl(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(expected.nonEmpty)

    val testDocs = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.pplGateStream(
        mem.toDF().toDF("doc_id", "text"), sketch, tt, gateMeanNllE6 = 3000000L)
      .writeStream.format("memory").queryName("pplgate").start()
    // deliver in three uneven micro-batches — a stateless gate must not care
    val cuts = Seq(testDocs.take(1), testDocs.slice(1, 7), testDocs.drop(7))
    cuts.filter(_.nonEmpty).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val got = spark.table("pplgate")
      .select("doc_id", "n_tokens", "nll_e6_sum", "mean_nll_e6")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expected,
      "stream-face scores must equal the batch face doc-for-doc")
  }

  test("the gate flags exactly the docs above threshold and keeps the rest") {
    val (sketch, tt) = trainedLm()
    val docs = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 4).select("doc_id", "text")
    // pick the median score as the gate so both classes are non-empty
    val scores = EventStreams.pplGateStream(docs, sketch, tt, gateMeanNllE6 = 0L)
      .select("mean_nll_e6").collect().map(_.getLong(0)).sorted
    val gate = scores(scores.length / 2)
    val out = EventStreams.pplGateStream(docs, sketch, tt, gateMeanNllE6 = gate)
      .select("mean_nll_e6", "flagged").collect()
    assert(out.forall(r => (r.getInt(1) == 1) == (r.getLong(0) > gate)))
    assert(out.exists(_.getInt(1) == 1) && out.exists(_.getInt(1) == 0))
  }

  test("estimatorLit equals the join-path estimates for every distinct token") {
    val (sketch, _) = trainedLm()
    val toks = graft.Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w")).distinct()
    val viaJoin = Sketch.estimates(sketch, toks, "w",
        CurationQueries.CmsLmDepth, CurationQueries.CmsLmWidth)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketch.estimatorLit(sketch,
      CurationQueries.CmsLmDepth, CurationQueries.CmsLmWidth)
    val viaLit = toks.select(col("w"), est(col("w")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaLit === viaJoin)
  }
}
