package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {

  private def wordsDf = {
    import spark.implicits._
    // zipfish frequencies with deliberate count ties to exercise the tiebreak
    (1 to 40).flatMap(i => Seq.fill(41 - i)(s"w${i % 25}")).toDF("word")
  }

  test("capped rank equals the naive global-window rank when vocab fits the cap") {
    val naive = wordsDf.groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("vocab_id", row_number().over(Window.orderBy(desc("cnt"), col("word"))))
      .select("word", "vocab_id")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val capped = Vocab.topWords(wordsDf, "word")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(capped === naive)
  }

  test("cap keeps the best-ranked words and preserves 1..V ranks") {
    val top = Vocab.topWords(wordsDf, "word", size = 5)
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(top.length === 5)
    assert(top.map(_._2).sorted.toSeq === (1 to 5))
    val naiveTop = Vocab.topWords(wordsDf, "word").collect()
      .map(r => (r.getString(0), r.getInt(1))).filter(_._2 <= 5).toSet
    assert(top.toSet === naiveTop)
  }

  test("plan shape: distributed top-K heap (TakeOrderedAndProject), not a global sort") {
    // a parquet scan (row count statically unknown) keeps the limit in the
    // plan; on a known-size LocalTableScan EliminateLimits would drop it
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(split(col("text"), " ")).as("word"))
    val plan = Vocab.topWords(docs, "word").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab cap should plan as TakeOrderedAndProject; got:\n$plan")
    // the window runs over the capped (≤V-row) side only — the full vocab
    // stream must not meet any single-partition exchange before the cap
    assert(!plan.contains("Exchange SinglePartition"),
      s"no single-partition exchange expected before the cap:\n$plan")
  }

  test("rank is stable under input repartitioning") {
    val a = Vocab.topWords(wordsDf.repartition(7), "word")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val b = Vocab.topWords(wordsDf.repartition(2), "word")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(a === b)
  }
}
