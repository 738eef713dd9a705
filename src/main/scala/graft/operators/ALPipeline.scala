package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E2 — the active-learning selection loop end-to-end (SURVEY §3 E2 steps
  * 6): score the unannotated pool with the batched model boundary, rank by
  * an AL strategy, take k, semi-join the winners back to the catalog, and
  * project the Prodigy export shape.
  *
  * One declarative plan: scoring is mapPartitions (BatchScorer), strategy
  * ranking is a column expression over (score, path, probs), selection is
  * TakeOrderedAndProject, re-attachment is a left_semi join — the
  * `dat.loc[res]` of `wrapper_ner.py:59-66` with no driver round-trip.
  */
object ALPipeline {

  /** Strategy → (ranking column over BatchScorer.Scored output, ascending?).
    * Mirrors the reference registry (`ner_pipeline.py:410-419`). */
  def strategyColumn(name: String): (Column, Boolean) = name match {
    case "random" => (xxhash64(col("id")), true)
    case "long" => (size(col("path")).cast(LongType), false)
    case "lc" => (col("score"), true)
    case "nlc" => (col("score") / size(col("path")), true)
    case "ltp" =>
      // min over tokens of the chosen tag's emission score
      (expr("array_min(zip_with(probs, path, (row, tag) -> element_at(row, tag + 1)))"), true)
    case "mtp" =>
      (expr("array_min(transform(probs, row -> array_max(row)))"), true)
    case other => throw new IllegalArgumentException(s"unknown strategy: $other")
  }

  /** Select k paragraphs for annotation. Input: (id long, text string);
    * output: Prodigy shape (text, meta.paragraph_id, meta.paper_id). */
  def selectForAnnotation(paragraphs: DataFrame, paperIdCol: Column,
      strategy: String, k: Int,
      transition: Array[Array[Double]]): DataFrame = {
    val scored = BatchScorer.scoreParagraphs(
      paragraphs.select(col("id"), split(col("text"), " ").as("tokens")), transition)
      .toDF()
    val (rank, asc) = strategyColumn(strategy)
    val picked = scored
      .withColumn("__rank", rank)
      .orderBy(if (asc) col("__rank").asc else col("__rank").desc, col("id"))
      .limit(k)
      .select("id")
    paragraphs
      .join(picked, Seq("id"), "left_semi")
      .select(col("text"),
        struct(col("id").cast(StringType).as("paragraph_id"),
          paperIdCol.cast(StringType).as("paper_id")).as("meta"))
  }
}
