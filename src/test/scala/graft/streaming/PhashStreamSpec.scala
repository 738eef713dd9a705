package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity for the mm4 streaming hash face: streamed pHashes must be
  * bit-identical to the batch computation over the union of micro-batches —
  * the property that lets an ingest-time perceptual dedup share its hash
  * store with nightly batch audits. */
class PhashStreamSpec extends SparkSpec {

  test("streamed pHashes are bit-identical to the batch face") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = graft.queries.MultimodalQueries.phashSigs(
        docs.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.phashStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("phashes")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a.toSeq); q.processAllAvailable()
      mem.addData(b.toSeq); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM phashes").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
