package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity for the streaming postings emitter: the streamed (doc, word, tf)
  * set must equal the batch tf table for the same documents — the contract
  * that lets a stream sink maintain ir10's in-flight delta segment. */
class PostingsStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed postings equal the batch tf table row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val expected = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .join(docs.map(_._1).toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.postingsStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("postingsstream")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a.toSeq); q.processAllAvailable()
      mem.addData(b.toSeq); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM postingsstream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expected)
      // tf is a real count, not a presence flag
      assert(got.exists(_._3 > 1L), "some term must repeat within a document")
    } finally q.stop()
  }
}
