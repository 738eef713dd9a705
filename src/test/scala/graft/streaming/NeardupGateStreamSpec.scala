package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity for dd18's streaming ingest gate: the streamed band-collision set
  * against a static signature store must equal the batch computation —
  * including an exact copy of a base document injected mid-stream, which
  * must collide on all four bands. */
class NeardupGateStreamSpec extends SparkSpec {

  test("streamed near-dup collisions equal the batch set; a copied doc hits all bands") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(40)
    val baseSigs = graft.operators.Dedup.minhashSignatures(base, "doc_id", "text")
      .localCheckpoint(true)
    val copiedText = base.orderBy("doc_id").limit(1).collect()(0).getString(1)
    val arriving = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy(desc("doc_id")).limit(30).collect()
      .map(r => (r.getLong(0) + 10000L, r.getString(1))) :+ (20000L, copiedText)
    val copiedBaseId = base.orderBy("doc_id").limit(1).collect()(0).getLong(0)

    def collisions(rows: Array[(Long, String)]) = EventStreams
      .neardupGateStream(rows.toSeq.toDF("doc_id", "text"), baseSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = collisions(arriving)

    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.neardupGateStream(
        mem.toDF().toDF("doc_id", "text"), baseSigs)
      .writeStream.format("memory").queryName("neardupgate")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = arriving.splitAt(arriving.length / 2)
      mem.addData(a.toSeq); q.processAllAvailable()
      mem.addData(b.toSeq); q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT * FROM neardupgate").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === expected)
      // the exact copy must collide with its base twin on every band
      val copiedHits = got.filter(c => c._1 == 20000L && c._2 == copiedBaseId)
      assert(copiedHits.map(_._3) === Set(0, 1, 2, 3))
    } finally q.stop()
  }
}
