package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity for kg1's streaming edge-emission face: the streamed
  * (doc, e1, e2) contribution SET over the union of micro-batches must
  * equal kg1's batch join derivation (distinct entity presence self-joined
  * per doc with e1 < e2) — including a doc injected mid-stream that
  * matches several gazetteer entries at once. */
class EntityEdgeStreamSpec extends SparkSpec {

  test("streamed entity edge contributions equal the batch join derivation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val gaz = graft.queries.MatchQueries.gazetteer
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1))) :+
      (900L, "the data stream feeds a window over a hash join plan")

    // batch derivation: kg1's shape — distinct presence, self-join, e1 < e2
    val fm = graft.operators.FastMatch.matcher(gaz)
    val ed = docs.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), explode(fm(col("text"))).as("m"))
      .select(col("doc_id"), col("m.matched").as("entity")).distinct()
    val expected = ed.as("a").join(ed.as("b"), Seq("doc_id"))
      .filter(col("a.entity") < col("b.entity"))
      .select(col("doc_id"), col("a.entity"), col("b.entity")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.entityEdgeStream(mem.toDF().toDF("doc_id", "text"), gaz)
      .writeStream.format("memory").queryName("entityedges")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a.toSeq); q.processAllAvailable()
      mem.addData(b.toSeq); q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT * FROM entityedges").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === expected)
      // the injected doc pairs all four of its matched entities
      assert(got.contains((900L, "data", "stream")))
      assert(got.contains((900L, "hash join", "window")))
      assert(got.contains((900L, "data", "window")))
      assert(got.contains((900L, "hash join", "stream")))
    } finally q.stop()
  }
}
