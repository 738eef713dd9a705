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
}
