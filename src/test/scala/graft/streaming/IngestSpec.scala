package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files
import java.sql.Timestamp

/** File-source AvailableNow ingestion end-to-end: landing dir → windowed
  * counts → parquet sink, incremental across restarts via checkpoint. */
class IngestSpec extends SparkSpec {

  test("availableNow drains the landing dir and is incremental on restart") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ingest").toString
    val landing = s"$base/landing"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))

    def write(ids: Range, hour: Int): Unit =
      ids.map(i => (i.toLong, new Timestamp((120000L + hour * 60 + i % 10) * 60000L),
        i.toLong % 3, "click", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("append").parquet(landing)

    write(0 until 20, hour = 0)
    // first drain: watermark must pass hour-0's window before it emits, so
    // feed a far-future hour too
    write(100 until 105, hour = 50)
    EventStreams.ingestAvailableNow(spark, landing, schema, out, ckpt)
    val first = spark.read.parquet(out).collect()
    assert(first.exists(r => r.getAs[Long]("n") === 20), first.mkString(";"))

    // restart with new files only: checkpoint must skip the old ones
    write(200 until 210, hour = 100)
    EventStreams.ingestAvailableNow(spark, landing, schema, out, ckpt)
    val second = spark.read.parquet(out).collect()
    // hour-0 window emitted exactly once (no duplicates on restart)
    assert(second.count(r => r.getAs[Long]("n") === 20) === 1, second.mkString(";"))
    // hour-50 window now closed by the hour-100 data
    assert(second.exists(r => r.getAs[Long]("n") === 5))
  }

  test("dd15 flag stage's shingle state survives a checkpointed restart") {
    // The O(1)-per-shingle state (buffered first occurrence + count) must
    // persist across a full query restart: a shingle seen ONCE before the
    // restart and again after must emit BOTH occurrences, the first from
    // recovered state. This is the recovery half of the dd15 twin's
    // contract (EventStreamsSpec proves batch-split parity in one run).
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Files.createTempDirectory("graft_dd15_restart").toString
      val (landing, out, ckpt) = (s"$base/landing", s"$base/out", s"$base/ckpt")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val shared = (1 to 8).map(i => s"u$i").mkString(" ")

      def drain(): Unit = {
        val stream = spark.readStream.schema(schema).parquet(landing)
        val q = EventStreams.substrFlagStream(stream)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }

      // run 1: doc 1 carries the shared window once — nothing to flag yet
      Seq((1L, shared + " z1 z2")).toDF("doc_id", "text")
        .write.mode("append").parquet(landing)
      drain()
      assert(spark.read.parquet(out).count() === 0L,
        "no duplicate exists before the restart")

      // run 2 (fresh query, same checkpoint): doc 2 repeats the window —
      // doc 1's occurrence must surface from RECOVERED state
      Seq((2L, shared)).toDF("doc_id", "text")
        .write.mode("append").parquet(landing)
      drain()
      val flags = spark.read.parquet(out).as[EventStreams.FlaggedPos]
        .collect().map(f => (f.doc_id, f.pos)).toSet
      assert(flags === Set((1L, 1L), (2L, 1L)),
        s"recovered state must flag the pre-restart occurrence, got $flags")
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
