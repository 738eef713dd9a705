package graft.queries

import graft.SparkSpec
import graft.functions.PorterStemmer
import org.apache.spark.sql.functions._

/** Pins for the f14 VALUES oracle (exact values are oracle-checked by the
  * driver; these keep the hand-derived stem table honest). */
class TextQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("f14 oracle stem table agrees with the Scala stemmer word-for-word") {
    TextQueries.F14StemTable.foreach { case (w, want) =>
      assert(PorterStemmer.stem(w) === want, s"stem($w)")
    }
  }

  test("f14 oracle stem table covers the whole corpus vocabulary") {
    // the oracle INNER-joins tokens to the table, so a word outside it
    // would silently shorten the oracle string; this pins closure instead
    val vocab = graft.Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .distinct().collect().map(_.getString(0)).toSet
    val mapped = TextQueries.F14StemTable.map(_._1).toSet
    assert((vocab -- mapped).isEmpty,
      s"unmapped corpus words: ${(vocab -- mapped).toSeq.sorted.mkString(", ")}")
  }
}
