package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity for the streaming CDC classifier: the streamed op/payload rows
  * must equal the batch tombstone faces' change-set derivation — 'd'∪'u'
  * is exactly ir14/dd20's tombstone id set, 'u'∪'a' payload rows are
  * exactly the fresh segment (reversed re-crawls + appends). */
class CdcStreamSpec extends SparkSpec {

  test("streamed CDC ops and payloads equal the batch change-set derivation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val split = 90L
    val rows = (0L until 100L).map(i => (i, s"w$i x$i y$i")) ++
      Seq((95L, "late arrival text"), (7L, "recrawl of a deleted doc"))

    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.cdcStream(mem.toDF().toDF("doc_id", "text"), split)
      .writeStream.format("memory").queryName("cdcstream")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM cdcstream").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      // batch twin: the rules ir14/dd20/kg7/mm8 derive their sets from
      def opOf(i: Long): String =
        if (i > split) "a"
        else if (i % 13 == 7) "d"
        else if (i % 13 == 2) "u"
        else "s"
      got.foreach { case (id, op, payload) =>
        assert(op === opOf(id), s"doc $id")
        op match {
          case "d" | "s" =>
            assert(payload.isEmpty, s"doc $id: nothing downstream may index a $op row")
          case "u" =>
            assert(payload.nonEmpty && payload.get.split(" ").toSeq ===
              rows.filter(r => r._1 == id && opOf(id) == "u").head._2.split(" ").reverse.toSeq)
          case "a" => assert(payload.nonEmpty)
        }
      }
      // every op class fires, including the idempotent skip and the
      // re-crawl of an already-deleted doc (stays 'd' — tombstones are
      // idempotent)
      assert(got.map(_._2).toSet === Set("d", "u", "a", "s"))
      assert(got.count { case (id, op, _) => id == 7L && op == "d" } === 2)
    } finally q.stop()
  }
}
