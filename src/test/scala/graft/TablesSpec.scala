package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regression guard for the r8→r9 events-schema break: `events.parquet`'s
  * `ts` column has shipped as int64 nanos (read as LongType under
  * `nanosAsLong=true`), as TIMESTAMP(MICROS) adjusted-to-UTC (LTZ), and as
  * TIMESTAMP(MICROS) not-adjusted (NTZ, the r9 testdata refresh). All three
  * must surface from `Tables.events` as the identical session-UTC
  * microsecond TIMESTAMP column — the r8 driver round lost its entire bench
  * (rc=1) and 15 correctness queries to an unhandled layout change here. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val micros = Seq(0L, 1500000L, 86400000000L, 1721000000123456L)

  private def eventsDir(writeTs: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("tables-spec").toString
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
    writeTs(base).drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readMicros(dir: String): (org.apache.spark.sql.types.DataType, Seq[Long]) = {
    val df = Tables.events(spark, dir)
    (df.schema("ts").dataType,
      df.orderBy("event_id").select(unix_micros(col("ts"))).as[Long].collect().toSeq)
  }

  test("int64-nanos layout normalizes to micros TIMESTAMP") {
    val dir = eventsDir(_.withColumn("ts", col("us") * 1000L))
    val (dt, got) = readMicros(dir)
    assert(dt === TimestampType)
    assert(got === micros)
  }

  test("TIMESTAMP(MICROS) LTZ layout passes through unchanged") {
    val dir = eventsDir(_.withColumn("ts", timestamp_micros(col("us"))))
    val (dt, got) = readMicros(dir)
    assert(dt === TimestampType)
    assert(got === micros)
  }

  test("TIMESTAMP(MICROS) NTZ layout (r9 testdata) casts micros-identically") {
    val dir = eventsDir(_.withColumn("ts",
      timestamp_micros(col("us")).cast(org.apache.spark.sql.types.TimestampNTZType)))
    val (dt, got) = readMicros(dir)
    assert(dt === TimestampType)
    assert(got === micros)
  }

  test("NTZ layout accepts any UTC-equivalent session zone id (r9 advisory)") {
    val dir = eventsDir(_.withColumn("ts",
      timestamp_micros(col("us")).cast(org.apache.spark.sql.types.TimestampNTZType)))
    val orig = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("Etc/UTC", "GMT", "+00:00")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        val (dt, got) = readMicros(dir)
        assert(dt === TimestampType, s"zone $tz")
        assert(got === micros, s"zone $tz")
      }
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
      assert(e.getMessage.contains("UTC-equivalent"))
    } finally spark.conf.set("spark.sql.session.timeZone", orig)
  }

  test("an unhandled ts layout fails loud, not as NULLs in 15 queries") {
    val dir = eventsDir(_.withColumn("ts", col("us").cast("string")))
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unhandled type"))
  }
}
