package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity for el1's streaming candidate-generation face: the streamed
  * (doc, word, entity, dist) candidate SET over the union of micro-batches
  * must equal the batch computation — including a typo'd word linking at
  * distance 1 injected mid-stream. */
class AliasLinkStreamSpec extends SparkSpec {

  test("streamed alias candidates equal the batch candidate set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val aliases = Seq(("data", 9L), ("stream", 7L), ("window", 5L))
      .toDF("entity", "prior")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1))) :+
      (900L, "a stram of dota flows past the windw") // typos, all distance 1

    def batchCands(df: org.apache.spark.sql.DataFrame) =
      EventStreams.aliasLinkStream(df, aliases).distinct().collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    val expected = batchCands(docs.toSeq.toDF("doc_id", "text"))

    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.aliasLinkStream(
        mem.toDF().toDF("doc_id", "text"), aliases)
      .writeStream.format("memory").queryName("aliascands")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a.toSeq); q.processAllAvailable()
      mem.addData(b.toSeq); q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT * FROM aliascands").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
      assert(got === expected)
      // the injected typos must be found at distance 1
      assert(got.contains((900L, "stram", "stream", 1)))
      assert(got.contains((900L, "dota", "data", 1)))
      assert(got.contains((900L, "windw", "window", 1)))
    } finally q.stop()
  }
}
