package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** UMass topic coherence — the model-selection criterion behind the
  * reference's coherence-vs-k sweep (`TM_2_Modeling.ipynb:cells 17-24`;
  * UMass instead of c_v because it aggregates plain document co-occurrence —
  * relational on any engine — rather than a sliding-window count).
  *
  * C(t) = Σ_{rank l < m} ln( (D(w_m, w_l) + 1) / D(w_l) )
  *
  * where D is document frequency over the corpus and words are the topic's
  * top-M terms ordered by rank (1 = most probable). Each ln term is
  * e6-rounded to BIGINT BEFORE summation, so the aggregate is
  * order-independent and engine-portable (Q.scala float rule).
  *
  * Scale shape: the incidence table is semi-joined down to topic vocabulary
  * (k·M words, broadcast-sized) before any pairing, so co-occurrence
  * counting touches ≤ docs·M² rows regardless of corpus vocabulary. */
object TopicCoherence {

  /** @param topics   (topic, word, rank), rank 1 = most probable, M small
    * @param docWords distinct (doc_id, word) incidence for the corpus
    * @return (topic, coherence_e6), one row per topic */
  def umassE6(topics: DataFrame, docWords: DataFrame): DataFrame = {
    val topicWords = topics.select("word").distinct()
    val inc = docWords.join(broadcast(topicWords), Seq("word"), "left_semi")
      .select("doc_id", "word").distinct()
    val dfreq = inc.groupBy("word").agg(count(lit(1)).as("df"))
    // doc co-occurrence is symmetric — count each unordered pair once
    // (halves the self-join product) and look it up canonicalized
    val cooc = inc.select(col("doc_id"), col("word").as("wa"))
      .join(inc.select(col("doc_id"), col("word").as("wb")), Seq("doc_id"))
      .filter(col("wa") < col("wb"))
      .groupBy("wa", "wb").agg(count(lit(1)).as("codf"))
    val pairs = topics.select(col("topic"), col("word").as("wl"), col("rank").as("rl"))
      .join(topics.select(col("topic"), col("word").as("wm"), col("rank").as("rm")), Seq("topic"))
      .filter(col("rl") < col("rm"))
    pairs
      .withColumn("wa", least(col("wl"), col("wm")))
      .withColumn("wb", greatest(col("wl"), col("wm")))
      .join(cooc, Seq("wa", "wb"), "left_outer")
      .drop("wa", "wb")
      .withColumn("codf", coalesce(col("codf"), lit(0L)))
      .join(dfreq.select(col("word").as("wl"), col("df")), Seq("wl"))
      .withColumn("term_e6",
        round(lit(1e6) * log((col("codf") + 1) / col("df"))).cast(LongType))
      .groupBy("topic").agg(sum("term_e6").as("coherence_e6"))
  }
}
