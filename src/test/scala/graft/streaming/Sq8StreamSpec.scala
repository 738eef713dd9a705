package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity for the ss6 streaming encode face: streamed codes must equal an
  * independent Scala re-derivation of the SQ8 integer arithmetic. */
class Sq8StreamSpec extends SparkSpec {

  test("streamed SQ8 codes match the integer arithmetic re-derived off-plan") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    // frozen per-dimension stats from the e6-fixed corpus (the batch rule)
    def e6(v: Float): Long = math.round(v.toDouble * 1e6)
    val d = emb.head._2.length
    val lo = (0 until d).map(i => emb.map(e => e6(e._2(i))).min)
    val hi = (0 until d).map(i => emb.map(e => e6(e._2(i))).max)
    val span = (0 until d).map(i => hi(i) - lo(i))
    // out-of-envelope probes (ADVICE r11): the streaming face encodes NEW
    // vectors against FROZEN corpus stats, so values below lo / above hi are
    // the expected production case — standard SQ8 saturates them to 0 / 255
    val outLow = (900000L, (0 until d).map(i => (lo(i) - 5000000L) / 1e6).map(_.toFloat))
    val outHigh = (900001L, (0 until d).map(i => (hi(i) + 5000000L) / 1e6).map(_.toFloat))
    val all = emb :+ outLow :+ outHigh
    val expected = all.map { case (id, v) =>
      id -> (0 until d).map { i =>
        val n = math.min(math.max(e6(v(i)) - lo(i), 0L), span(i))
        if (span(i) == 0L) 0L else Math.floorDiv(n * 255L, span(i))
      }.toSeq
    }.toMap

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.sq8EncodeStream(
        mem.toDF().toDF("vec_id", "embedding")
          .withColumn("embedding", col("embedding").cast("array<float>")),
        lo, span)
      .writeStream.format("memory").queryName("sq8codes")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = all.map(e => (e._1, e._2)).splitAt(all.length / 2)
      mem.addData(a.toSeq); q.processAllAvailable()
      mem.addData(b.toSeq); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM sq8codes").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got.size === expected.size)
      assert(got === expected)
      got.values.foreach(code => code.foreach(c => assert(c >= 0L && c <= 255L)))
    } finally q.stop()
  }
}
