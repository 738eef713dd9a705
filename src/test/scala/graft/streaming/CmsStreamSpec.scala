package graft.streaming

import graft.SparkSpec
import graft.operators.Sketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class CmsStreamSpec extends SparkSpec {

  private val depth = 3
  private val width = 64L

  test("streaming sketch in update mode converges to the batch sketch of the union") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[String]
    val q = EventStreams.sketchStream(mem.toDF().toDF("item"), "item", depth, width)
      .writeStream.format("memory").queryName("cms").outputMode(OutputMode.Complete()).start()
    val batch1 = Seq("a", "b", "a", "c")
    val batch2 = Seq("a", "d", "d", "b")
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cms")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketch.buildCms((batch1 ++ batch2).toDF("item"), col("item"), depth, width)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch, "stream-maintained cells must equal the batch build")

    // and the maintained table serves point queries through the same probe
    val est = Sketch.estimates(spark.table("cms"),
        Seq("a", "d", "zz").toDF("item"), "item", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") >= 3L)
    assert(est("d") >= 2L)
  }
}
