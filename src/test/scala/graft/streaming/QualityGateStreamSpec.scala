package graft.streaming

import graft.SparkSpec
import graft.queries.{CurationQueries, TextQueries}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity for the streaming quality gate: per-doc verdicts streamed over
  * micro-batches must equal the batch projection, the admitted set must be
  * exactly the batch batteries' conjunction, and the admitted count must
  * equal dq7's end-of-funnel survivor count. */
class QualityGateStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed verdicts equal batch; admitted set is the funnel's survivor set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    def asTuples(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toSet
    val expected = asTuples(
      EventStreams.qualityGateStream(docs.toSeq.toDF("doc_id", "text")))

    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.qualityGateStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qualitygate")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a.toSeq); q.processAllAvailable()
      mem.addData(b.toSeq); q.processAllAvailable()
      val got = asTuples(spark.sql("SELECT DISTINCT * FROM qualitygate"))
      assert(got === expected)
    } finally q.stop()

    // the admitted set is exactly the batch batteries' conjunction
    val g = TextQueries.ta10GopherRules(spark, dir).filter(col("pass"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c = TextQueries.ta18C4Rules(spark, dir).filter(col("pass"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val e = CurationQueries.ta11EntropyGate(spark, dir).filter(col("keep") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r = CurationQueries.ta7Repetition(spark, dir).filter(col("keep") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val admitted = expected.filter(_._6).map(_._1)
    assert(admitted === (g & c & e & r))

    // and its size is dq7's end-of-funnel survivor count
    val funnelLast = CurationQueries.dq7FilterFunnel(spark, dir)
      .orderBy(desc("stage")).limit(1).collect()(0).getLong(3)
    assert(admitted.size.toLong === funnelLast)
  }
}
