package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {

  import EventStreams._

  // base offset keeps the first event strictly above the initial watermark
  // (epoch 0): an event AT the watermark is dropped as late
  private val Base = 120_000L // hour-aligned (2000h) so window starts land on 0/60
  private def ts(minutes: Long): Timestamp = new Timestamp((Base + minutes) * 60_000L)

  test("windowed counts over a memory stream match the batch plan") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Append()).start()
    mem.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0))
    q.processAllAvailable()
    // watermark still open: force window closure with a far-future event
    mem.addData(Event(4, ts(600), 3, "click", 0.5))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wc")
      .select("window_start", "event_type", "n", "total_value").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000 - Base, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.contains((0L, "click", 2L, 3.0)))
    assert(got.contains((60L, "view", 1L, 3.0)))
    // batch parity: same plan over the same rows as a batch DataFrame
    val batch = windowedCounts(Seq(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0), Event(4, ts(600), 3, "click", 0.5)).toDF())
      .collect().map(r => (r.getTimestamp(0).getTime / 60000 - Base, r.getString(1), r.getLong(2)))
      .toSet
    assert(batch.contains((0L, "click", 2L)))
    assert(batch.contains((60L, "view", 1L)))
  }

  test("built-in session_window agrees with the custom stateful sessionizer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val data = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0), // 10 min gap: same session
      Event(3, ts(60), 1, "click", 4.0), // 50 min gap: NEW session
      Event(4, ts(5), 2, "view", 8.0), // other user: own session
      Event(5, ts(35), 2, "view", 16.0)) // EXACTLY the 30-min gap: must merge
    // like the custom sessionizer's <=-gap rule (gap+1us alignment)
    val mem = MemoryStream[Event]
    val q = sessionWindowCounts(mem.toDF())
      .writeStream.format("memory").queryName("sw").outputMode(OutputMode.Append()).start()
    mem.addData(data: _*)
    q.processAllAvailable()
    // push the watermark far past every session's close so all rows emit
    mem.addData(Event(99, ts(600), 99, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sw")
      .select("user_id", "session_start", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000 - Base, r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.contains((1L, 0L, 2L, 3.0)), s"user 1 first session: $got")
    assert(got.contains((1L, 60L, 1L, 4.0)), s"user 1 second session: $got")
    assert(got.contains((2L, 5L, 2L, 24.0)), s"user 2 boundary-merged session: $got")
    // cross-check (session starts, counts) against the custom state operator
    // on the same input — the two sessionizers must carve identical sessions
    val mem2 = MemoryStream[Event]
    val q2 = sessionize(mem2.toDS())
      .writeStream.format("memory").queryName("sw2").outputMode(OutputMode.Append()).start()
    mem2.addData(data: _*)
    q2.processAllAvailable()
    mem2.addData(Event(99, ts(600), 99, "click", 0.0))
    q2.processAllAvailable()
    q2.stop()
    val custom = spark.table("sw2")
      .select("user_id", "start_us", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 60000000L - Base, r.getLong(2)))
      .filter(_._1 != 99L).toSet
    assert(custom === got.filter(_._1 != 99L).map(t3 => (t3._1, t3._2, t3._3)))
  }

  test("streaming top-k users is a rolling leaderboard in complete mode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = topUsers(mem.toDF(), k = 2)
      .writeStream.format("memory").queryName("tu").outputMode(OutputMode.Complete()).start()
    mem.addData(
      Event(1, ts(1), 1, "purchase", 5.0),
      Event(2, ts(2), 2, "purchase", 3.0),
      Event(3, ts(3), 3, "purchase", 1.0),
      Event(4, ts(3), 3, "view", 100.0)) // non-purchase: excluded like ev3
    q.processAllAvailable()
    val first = spark.table("tu").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(first.toSeq === Seq((1L, 5.0), (2L, 3.0)))
    // user 3 overtakes: the leaderboard re-ranks on the next trigger
    mem.addData(Event(5, ts(4), 3, "purchase", 9.0))
    q.processAllAvailable()
    q.stop()
    val second = spark.table("tu").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(second.toSeq === Seq((3L, 10.0), (1L, 5.0)))
  }

  test("streaming exact dedup drops re-deliveries within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    case class Doc(doc_id: Long, text: String, ts: Timestamp)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = dedupStream(docs)
      .writeStream.format("memory").queryName("dds").outputMode(OutputMode.Append()).start()
    mem.addData(
      (1L, "Alpha Text", ts(1)),
      (2L, "  alpha text ", ts(2)), // same normalized content — duplicate
      (3L, "beta", ts(3)))
    q.processAllAvailable()
    mem.addData((4L, "ALPHA TEXT", ts(4))) // still a duplicate within horizon
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dds").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L))
  }

  test("stateful sessionizer closes sessions on gap and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()
    // user 1: two events 10 min apart (one session), then a 60-min gap event
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 1, "view", 3.0))
    q.processAllAvailable()
    // advance watermark far enough to time out user 1's open session; the
    // timeout fires on the batch AFTER the watermark advances, so feed two
    mem.addData(Event(9, ts(1000), 99, "click", 0.0))
    q.processAllAvailable()
    mem.addData(Event(10, ts(2000), 99, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sess").as[Session].collect()
    info("sessions table: " + all.mkString(" | "))
    val sessions = all.filter(_.user_id == 1).sortBy(_.start_us)
    assert(sessions.length === 2, s"got: ${sessions.mkString(";")}")
    assert(sessions(0).n_events === 2)
    assert(sessions(0).total_value === 3.0)
    assert(sessions(1).n_events === 1)
  }

  test("stream-static enrichment joins the dim per batch, stateless") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic"), (3L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[Event]
    val q = enrichedRevenue(mem.toDF(), dim)
      .writeStream.format("memory").queryName("er").outputMode(OutputMode.Append()).start()
    mem.addData(
      Event(1, ts(5), 1, "purchase", 10.0),
      Event(2, ts(10), 2, "purchase", 2.5),
      Event(3, ts(15), 3, "purchase", 1.5),
      Event(4, ts(20), 1, "view", 99.0), // non-purchase excluded
      Event(5, ts(25), 42, "purchase", 7.0)) // no dim row: inner join drops
    q.processAllAvailable()
    mem.addData(Event(6, ts(600), 3, "purchase", 0.5)) // close the window
    q.processAllAvailable()
    q.stop()
    val got = spark.table("er")
      .select("window_start", "tier", "n", "revenue").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000 - Base, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.contains((0L, "gold", 1L, 10.0)))
    assert(got.contains((0L, "basic", 2L, 4.0)))
  }

  test("streaming curation quarantines flagged docs and dedups the clean path") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val banned = graft.operators.Bloom.build(
      Seq("the secret eval").toDF("sh"), "sh")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val (clean, quarantined) = curationStreams(mem.toDF().toDF("doc_id", "ts", "text"), banned)
    val q1 = clean.writeStream.format("memory").queryName("cs_clean")
      .outputMode(OutputMode.Append()).start()
    val q2 = quarantined.writeStream.format("memory").queryName("cs_quar")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (1L, ts(1), "a clean document body here"),
      (2L, ts(2), "leaks the secret eval verbatim"), // gated to quarantine
      (3L, ts(3), "a clean document body here"), // duplicate of 1: dedup'd
      (4L, ts(4), "another clean and distinct body"))
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    val survivors = spark.table("cs_clean").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 4L))
    // flagged docs are held for exact re-check, never silently dropped
    val quar = spark.table("cs_quar").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(quar === Set(2L))
  }

  test("stream-stream attribution join matches views within the window only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vMem = MemoryStream[Event]
    val pMem = MemoryStream[Event]
    val q = attributionJoin(vMem.toDF(), pMem.toDF(), windowMinutes = 30)
      .select("purchase_id", "view_id")
      .writeStream.format("memory").queryName("attr").outputMode(OutputMode.Append()).start()
    vMem.addData(
      Event(10, ts(0), 1, "view", 0), // 25 min before purchase: in window
      Event(11, ts(50), 1, "view", 0), // 25 min AFTER purchase: excluded
      Event(12, ts(0), 2, "view", 0), // other user: excluded
      Event(13, ts(25), 1, "view", 0)) // SAME ts as purchase: excluded (strict <, matches batch ev8)
    pMem.addData(Event(20, ts(25), 1, "purchase", 9.99))
    q.processAllAvailable()
    // advance both watermarks so state is evictable (join results already
    // emitted incrementally in append mode for inner joins)
    vMem.addData(Event(98, ts(500), 98, "view", 0))
    pMem.addData(Event(99, ts(500), 99, "purchase", 0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((20L, 10L)))
  }

  test("transformWithState quota gate admits per-source caps across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // transformWithState requires a multi-column-family state store; scope
    // the RocksDB provider to this query and restore the session default
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val mem = MemoryStream[(Long, String)]
    val q = quotaGate(mem.toDF().toDF("doc_id", "source"), maxPerKey = 2)
      .writeStream.format("memory").queryName("qg").outputMode(OutputMode.Append()).start()
    mem.addData((1L, "srcA"), (2L, "srcA"), (10L, "srcB"))
    q.processAllAvailable()
    // second micro-batch: state must carry srcA's count of 2 forward
    mem.addData((3L, "srcA"), (11L, "srcB"), (12L, "srcB"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("qg").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getLong(3))).toMap
    assert(got(1L) === (("srcA", 1, 1L)))
    assert(got(2L) === (("srcA", 1, 2L)))
    assert(got(3L) === (("srcA", 0, 3L)), "third srcA doc must be over quota — state crossed the batch boundary")
    assert(got(10L) === (("srcB", 1, 1L)))
    assert(got(11L) === (("srcB", 1, 2L)))
    assert(got(12L) === (("srcB", 0, 3L)))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming SCD2 emits exactly the batch face's closed versions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // (user_id, event_id, us, event_type); user 1 changes A->B->A,
      // user 2 stays constant (no closed version ever)
      val all = Seq(
        (1L, 1L, 100L, "A"), (1L, 2L, 200L, "A"), (1L, 3L, 300L, "B"),
        (2L, 4L, 150L, "C"), (1L, 5L, 400L, "A"), (2L, 6L, 500L, "C"))
      val mem = MemoryStream[(Long, Long, Long, String)]
      val q = EventStreams.scd2Stream(
          mem.toDF().toDF("user_id", "event_id", "us", "event_type"))
        .writeStream.format("memory").queryName("scd")
        .outputMode(OutputMode.Append()).start()
      // split mid-version so state must carry across the boundary
      mem.addData(all.take(3): _*)
      q.processAllAvailable()
      mem.addData(all.drop(3): _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("scd")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(streamed === Set(
        (1L, 1L, "A", 100L, 300L),
        (1L, 2L, "B", 300L, 400L)))
      // parity with the batch face's closed intervals over the same rows
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
      val batchClosed = all.toDF("user_id", "event_id", "us", "event_type")
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to_us", lead("us", 1).over(w))
        .filter(col("valid_to_us").isNotNull)
        .select("user_id", "version", "event_type", "us", "valid_to_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(streamed === batchClosed)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming bloom gate flags banned n-grams at scan speed, stateless") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val banned = graft.operators.Bloom.build(
      Seq("the secret eval", "held out answer").toDF("sh"), "sh")
    val mem = MemoryStream[(Long, String)]
    val q = bloomGate(mem.toDF().toDF("doc_id", "text"), banned)
      .writeStream.format("memory").queryName("bg").outputMode(OutputMode.Append()).start()
    mem.addData(
      (1L, "this text leaks the secret eval verbatim"),
      (2L, "a perfectly clean document with no leaks"),
      (3L, "short"), // fewer tokens than the shingle width: must not fault
      (4L, "another held out answer slipped in here"))
    q.processAllAvailable()
    q.stop()
    val flags = spark.table("bg").select("doc_id", "flagged").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(flags === Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 1))
  }

  test("dd15 streaming twin: flag + merge stages reproduce the batch spans across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // transformWithState requires a multi-column-family state store; scope
    // the RocksDB provider to this query and restore the session default
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val dir = "/root/testdata/sf0.001"
    val batchSpans = graft.queries.DedupQueries.dd15ExactSubstr(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // stage 1: shingle flagger, corpus split mid-stream so duplicate pairs
    // straddle the micro-batch boundary (the state-carrying case)
    val memDocs = MemoryStream[(Long, String)]
    val q1 = substrFlagStream(memDocs.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dd15flags")
      .outputMode(OutputMode.Append()).start()
    val (half1, half2) = docs.splitAt(docs.length / 2)
    memDocs.addData(half1.toSeq: _*)
    q1.processAllAvailable()
    memDocs.addData(half2.toSeq: _*)
    q1.processAllAvailable()
    q1.stop()
    val flags = spark.table("dd15flags").as[FlaggedPos].collect()
    assert(flags.nonEmpty, "fixture regression: no duplicated shingles")
    // each flagged position is emitted exactly once, regardless of splits
    assert(flags.map(f => (f.doc_id, f.pos)).distinct.length === flags.length)

    // stage 2: per-doc interval merge, flags again split mid-stream; the
    // sink keeps every rev — the LATEST rev per doc is the upsert value
    val memFlags = MemoryStream[FlaggedPos]
    val q2 = spanMergeStream(memFlags.toDS())
      .writeStream.format("memory").queryName("dd15spans")
      .outputMode(OutputMode.Update()).start()
    val (f1, f2) = flags.splitAt(flags.length / 2)
    memFlags.addData(f1.toSeq: _*)
    q2.processAllAvailable()
    memFlags.addData(f2.toSeq: _*)
    q2.processAllAvailable()
    q2.stop()
    val latest = spark.table("dd15spans").as[DocSpans].collect()
      .groupBy(_.doc_id).view.mapValues(_.maxBy(_.rev).spans.toSet).toMap
    assert(latest === batchSpans,
      "latest-rev streamed spans must equal the batch dd15 face")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
