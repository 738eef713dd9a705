package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity for the ss7 streaming assign face: a vector must land in the
  * same cell whether it arrives in a batch refresh or on the stream. */
class IvfAssignStreamSpec extends SparkSpec {

  test("streamed assignments match the batch frozen-index assign row for row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    // frozen index, the ss2/ss7 stand-in geometry
    val idx = graft.operators.Similarity.centroidIndex(
      emb.filter(col("vec_id") % 97 === 0), "vec_id", "embedding")
    val batch = EventStreams.ivfAssignStream(emb, idx).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val streamed = EventStreams.ivfAssignStream(
      mem.toDF().toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")),
      idx)
    val q = streamed.writeStream.format("memory").queryName("ivfassign")
      .outputMode(OutputMode.Append()).start()
    try {
      // two micro-batches to prove statelessness across triggers
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toSeq); q.processAllAvailable()
      mem.addData(second.toSeq); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM ivfassign").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === batch.size)
      assert(got === batch)
    } finally q.stop()
  }
}
