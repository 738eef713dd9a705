package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ALPipelineSpec extends SparkSpec {

  private val trans = MLFixtures.transition

  private lazy val paragraphs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"), col("source"))

  test("lc selection picks exactly the k lowest path scores, end-to-end") {
    val k = 20
    val out = ALPipeline.selectForAnnotation(paragraphs, col("source"), "lc", k, trans)
    val rows = out.collect()
    assert(rows.length === k)
    // Prodigy shape
    assert(out.schema.fieldNames.toSeq === Seq("text", "meta"))
    // winners == manual bottom-k of the scorer output
    val scores = BatchScorer.scoreParagraphs(
      paragraphs.select(col("id"), split(col("text"), " ").as("tokens")), trans)
      .collect().map(s => s.id -> s.score).toMap
    val expected = scores.toSeq.sortBy { case (id, s) => (s, id) }.take(k).map(_._1).toSet
    val got = rows.map(_.getStruct(1).getString(0).toLong).toSet
    assert(got === expected)
  }

  test("all strategies return k rows and are deterministic across runs") {
    Seq("random", "long", "lc", "nlc", "ltp", "mtp").foreach { st =>
      val a = ALPipeline.selectForAnnotation(paragraphs, col("source"), st, 10, trans)
        .collect().map(_.getStruct(1).getString(0)).sorted.toSeq
      val b = ALPipeline.selectForAnnotation(paragraphs, col("source"), st, 10, trans)
        .collect().map(_.getStruct(1).getString(0)).sorted.toSeq
      assert(a.length === 10, st)
      assert(a === b, st)
    }
  }
}
