package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming/batch parity for the volume-spike monitor: the streamed flags
  * over micro-batches must equal ev13's batch logic over the same events,
  * restricted to each type's CLOSED days (the open day sits in state). */
class AnomalyStreamSpec extends SparkSpec {

  private val DayUs = 86400L * 1000000L

  test("streamed spike flags equal the batch z² screen on closed days") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // type A: flat baseline then a 5x spike on day 9, a gap at day 11
      // (breaks the next baseline), then recovery; type B: steady drift,
      // never 8 consecutive days -> must emit nothing
      val aCounts = Map(1L -> 3, 2L -> 3, 3L -> 4, 4L -> 3, 5L -> 3, 6L -> 4,
        7L -> 3, 8L -> 3, 9L -> 15, 10L -> 3, 12L -> 3, 13L -> 4)
      val bCounts = Map(2L -> 2, 3L -> 3, 5L -> 2, 6L -> 3, 8L -> 2, 10L -> 2)
      val rows = (aCounts.toSeq.map("A" -> _) ++ bCounts.toSeq.map("B" -> _))
        .flatMap { case (tpe, (day, n)) =>
          (1 to n).map(i => (tpe, day * DayUs + i * 1000L))
        }.sortBy(_._2)
      val mem = MemoryStream[(String, Long)]
      val q = EventStreams.anomalyStream(mem.toDF().toDF("event_type", "us"))
        .writeStream.format("memory").queryName("anom")
        .outputMode(OutputMode.Append()).start()
      // split mid-baseline AND mid-day so state carries across boundaries
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 3)
      Seq(b1, b2, b3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val streamed = spark.table("anom")
        .select("event_type", "day", "n", "s7", "dev7", "var49", "spike")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))).toSet

      // batch twin (ev13's plan) over the same rows, minus each type's
      // open (= last) day which the stream cannot close
      val w = Window.partitionBy("event_type").orderBy("day").rangeBetween(-7, -1)
      val lastDay = Window.partitionBy("event_type")
      val batch = rows.toDF("event_type", "us")
        .groupBy(col("event_type"), expr(s"us div $DayUs").as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("s7", sum("n").over(w))
        .withColumn("q7", sum(col("n") * col("n")).over(w))
        .withColumn("d7", count(lit(1)).over(w))
        .withColumn("open", col("day") === max("day").over(lastDay))
        .filter(col("d7") === 7 && !col("open"))
        .withColumn("dev7", lit(7L) * col("n") - col("s7"))
        .withColumn("var49", lit(7L) * col("q7") - col("s7") * col("s7"))
        .select(col("event_type"), col("day"), col("n"), col("s7"), col("dev7"),
          col("var49"),
          when(col("dev7") > 0 && col("dev7") * col("dev7") > lit(4L) * col("var49"), 1)
            .otherwise(0).as("spike"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))).toSet

      assert(streamed === batch)
      // the fixture actually exercises both outcomes
      assert(streamed.exists(_._7 == 1), "fixture regression: no spike fired")
      assert(streamed.exists(_._7 == 0), "fixture regression: all days spiked")
      assert(!streamed.exists(_._1 == "B"), "B never has a full 7-day baseline")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("a late event from a past day is dropped, not treated as a day change") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // CODEGEN_ONLY: a private state case class (DayCount/AnomState) demotes
    // every state (de)serialize to interpreted projection with only a WARN;
    // this turns that silent fallback into a hard test failure
    val cgKey = "spark.sql.codegen.factoryMode"
    val cgPrior = spark.conf.getOption(cgKey)
    spark.conf.set(cgKey, "CODEGEN_ONLY")
    try {
      val mem = MemoryStream[(String, Long)]
      val q = EventStreams.anomalyStream(mem.toDF().toDF("event_type", "us"))
        .writeStream.format("memory").queryName("anom_late")
        .outputMode(OutputMode.Append()).start()
      // 8 in-order days build a full baseline, open day = 9
      (1L to 9L).foreach { d => mem.addData(("A", d * DayUs + 1000L)); q.processAllAvailable() }
      val before = spark.table("anom_late").count()
      // late event from day 3 (already closed): must NOT close day 9 early,
      // must NOT reopen day 3, must emit nothing
      mem.addData(("A", 3L * DayUs + 2000L)); q.processAllAvailable()
      assert(spark.table("anom_late").count() === before)
      // day 10 then closes day 9 with its count UNAFFECTED by the late row
      mem.addData(("A", 10L * DayUs + 1000L)); q.processAllAvailable()
      q.stop()
      val day9 = spark.table("anom_late").filter(col("day") === 9).collect()
      assert(day9.length === 1)
      assert(day9(0).getAs[Long]("n") === 1L)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
      cgPrior match {
        case Some(v) => spark.conf.set(cgKey, v)
        case None => spark.conf.unset(cgKey)
      }
    }
  }
}
