package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the corpus suite's iterative operator (exact values are
  * oracle-checked by the driver). */
class CorpusQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a16: textrank emits positive, descending ranks over real graph words") {
    val rows = CorpusQueries.a16TextRank(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_._2 > 0L), "every rank carries teleport mass > 0")
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 >= b._2, s"ranks must descend: $a then $b")
      case _ =>
    }
    // every ranked word must actually occur in the corpus
    val vocab = graft.Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(rows.forall(r => vocab.contains(r._1)))
  }

  test("a16: rank order correlates with graph connectivity (hubs rise)") {
    // the top-ranked word should sit in the upper half of the word-frequency
    // distribution — PageRank with a count>=5 edge filter cannot crown a
    // rare word
    val freq = graft.Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val top = CorpusQueries.a16TextRank(spark, dir).collect()(0).getString(0)
    val counts = freq.values.toSeq.sorted
    val median = counts(counts.size / 2)
    assert(freq(top) >= median, s"top textrank word '$top' is rarer than the median word")
  }
}
