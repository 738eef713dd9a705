package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The hll1 streaming face: registers are a bounded streaming max-agg that
  * must converge to the batch build of everything seen. */
class HllStreamSpec extends SparkSpec {

  test("streaming registers converge to the batch registers of the union") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[String]
    val q = EventStreams.hllRegisterStream(mem.toDF().toDF("item"), "item")
      .writeStream.format("memory").queryName("hllregs")
      .outputMode(OutputMode.Complete()).start()
    try {
      val batch1 = (0 until 400).map(i => s"tok$i")
      val batch2 = (300 until 900).map(i => s"tok$i") // overlaps batch1
      mem.addData(batch1); q.processAllAvailable()
      val afterOne = spark.sql("SELECT * FROM hllregs").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      mem.addData(batch2); q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM hllregs").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      // registers only ever grow (max-monotone) and state stays m-bounded
      afterOne.foreach { case (b, rho) => assert(streamed(b) >= rho) }
      assert(streamed.size <= graft.operators.Sketch.HllM)
      val batch = graft.operators.Sketch.hllRegisters(
          (batch1 ++ batch2).toDF("item"), col("item"), Seq.empty)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
