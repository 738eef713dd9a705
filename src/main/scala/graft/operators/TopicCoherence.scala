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

  /** Document-frequency + canonicalized unordered pair-co-occurrence counts
    * for `vocab` words over a (doc_id, word) incidence. Both counts are
    * VOCABULARY-INDEPENDENT — df(w) and codf(wa,wb) computed over a superset
    * vocabulary and filtered later are identical to computing them over the
    * exact topic vocabulary — which is what lets the a10 coherence family
    * share ONE materialized base across four queries (two topic sets).
    *
    * @return (dfreq(word, df), cooc(wa, wb, codf)) with wa < wb */
  def docStats(vocab: DataFrame, docWords: DataFrame): (DataFrame, DataFrame) = {
    val inc = docWords.join(broadcast(vocab.select("word").distinct()),
        Seq("word"), "left_semi")
      .select("doc_id", "word").distinct()
    val dfreq = inc.groupBy("word").agg(count(lit(1)).as("df"))
    // doc co-occurrence is symmetric — count each unordered pair once
    // (halves the self-join product) and look it up canonicalized
    val cooc = inc.select(col("doc_id"), col("word").as("wa"))
      .join(inc.select(col("doc_id"), col("word").as("wb")), Seq("doc_id"))
      .filter(col("wa") < col("wb"))
      .groupBy("wa", "wb").agg(count(lit(1)).as("codf"))
    (dfreq, cooc)
  }

  /** @param topics   (topic, word, rank), rank 1 = most probable, M small
    * @param docWords distinct (doc_id, word) incidence for the corpus
    * @return (topic, coherence_e6), one row per topic */
  def umassE6(topics: DataFrame, docWords: DataFrame): DataFrame = {
    val (dfreq, cooc) = docStats(topics, docWords)
    umassE6FromStats(topics, dfreq, cooc)
  }

  /** [[umassE6]] over precomputed (superset-ok) [[docStats]] frames. */
  def umassE6FromStats(topics: DataFrame, dfreq: DataFrame,
      cooc: DataFrame): DataFrame = {
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

  /** Röder/Both/Hinneburg 2015 smoothing epsilon on the joint probability. */
  val CvEps: Double = 1e-12

  /** c_v topic coherence (Röder, Both & Hinneburg 2015 — the metric the
    * reference's notebook sweep actually uses, `TM_2_Modeling.ipynb:cells
    * 17-24`): one-set segmentation, boolean sliding-window probabilities,
    * NPMI context vectors, cosine similarity, averaged per topic.
    *
    * Window semantics: c_v counts boolean windows of size 110. On a corpus
    * whose documents are ALL ≤ 110 tokens — true for the testdata (max 100)
    * and asserted by CoherenceSpec — every document is exactly one window,
    * so per-document booleans ARE the exact sliding-window counts and this
    * is the exact c_v, not an approximation. For longer documents,
    * pre-split each into its sliding windows and pass that incidence as
    * `docWords` (same plan downstream).
    *
    * Determinism: NPMI terms are e6-rounded to integers; context-vector
    * dots and norms are then exact integer arithmetic; the single
    * double-precision step per word (dot / (√n_i·√n_W)) is a fixed IEEE
    * sequence, e6-rounded — engine-portable like umassE6.
    *
    * Scale shape: identical to [[umassE6]] — incidence semi-joins to the
    * k·M topic vocabulary before any pairing; everything after the
    * co-occurrence aggregate is (k·M²)-row arithmetic.
    *
    * @param topics   (topic, word, rank), rank 1..nTop; words must occur in
    *                 the corpus (true by construction for frequency proxies
    *                 and CV-vocabulary LDA topics)
    * @param docWords (doc_id, word) incidence — one row per token is fine,
    *                 it is distinct'ed after the vocabulary semi-join
    * @param docTotal optional one-row (d_total) frame with the corpus
    *                 document count. Pass the cheap `docs.agg(count)` (a
    *                 metadata-speed count-star) — deriving it from docWords
    *                 would re-explode the whole corpus just to count docs.
    *                 The DEFAULT (countDistinct over docWords) counts only
    *                 documents with ≥1 token — equal to count(*) whenever
    *                 every document tokenizes non-empty, which holds for
    *                 the testdata; pass docTotal explicitly when a corpus
    *                 may carry empty-text rows
    * @return (topic, cv_e6), cosine ∈ [−1,1] scaled by 1e6 */
  def cvE6(topics: DataFrame, docWords: DataFrame, nTop: Int = 6,
      docTotal: Option[DataFrame] = None): DataFrame = {
    // D = total boolean windows = total documents (incl. docs with no topic
    // word) — a one-row broadcast, never a driver scalar in the plan
    val dTot = docTotal.getOrElse(docWords.agg(countDistinct("doc_id").as("d_total")))
    val (dfreq, cooc) = docStats(topics, docWords)
    cvE6FromStats(topics, dfreq, cooc, dTot, nTop)
  }

  /** [[cvE6]] over precomputed (superset-ok) [[docStats]] frames. */
  def cvE6FromStats(topics: DataFrame, dfreq: DataFrame, cooc: DataFrame,
      dTot: DataFrame, nTop: Int = 6): DataFrame = {
    // all nTop×nTop ordered pairs per topic; the diagonal's joint count is
    // the word's own document frequency
    val pairs = topics.select(col("topic"), col("word").as("wl"), col("rank").as("rl"))
      .join(topics.select(col("topic"), col("word").as("wm"), col("rank").as("rm")), Seq("topic"))
    val npmi = pairs
      .withColumn("wa", least(col("wl"), col("wm")))
      .withColumn("wb", greatest(col("wl"), col("wm")))
      .join(cooc, Seq("wa", "wb"), "left_outer")
      .drop("wa", "wb")
      .join(dfreq.select(col("word").as("wl"), col("df").as("dfl")), Seq("wl"))
      .join(dfreq.select(col("word").as("wm"), col("df").as("dfm")), Seq("wm"))
      .crossJoin(broadcast(dTot))
      .withColumn("pj",
        when(col("rl") === col("rm"), col("dfl").cast(DoubleType) / col("d_total"))
          .otherwise(coalesce(col("codf"), lit(0L)).cast(DoubleType) / col("d_total"))
          + lit(CvEps))
      .withColumn("e", round(lit(1e6) *
        log(col("pj") * col("d_total") * col("d_total") /
          (col("dfl").cast(DoubleType) * col("dfm"))) / -log(col("pj")))
        .cast(LongType))
      .select("topic", "rl", "rm", "e")
    // context-vector algebra on the e6 integers: column sums give the
    // one-set sum vector; dot/norms are exact integer aggregates
    val colSums = npmi.groupBy("topic", "rm").agg(sum("e").as("s"))
    val topicNorm = colSums.groupBy("topic").agg(sum(col("s") * col("s")).as("nw2"))
    val perWord = npmi.join(colSums, Seq("topic", "rm"))
      .groupBy("topic", "rl")
      .agg(sum(col("e") * col("s")).as("dot"), sum(col("e") * col("e")).as("ni2"))
      .join(topicNorm, Seq("topic"))
      .withColumn("phi_e6", round(lit(1e6) * col("dot") /
        (sqrt(col("ni2").cast(DoubleType)) * sqrt(col("nw2").cast(DoubleType))))
        .cast(LongType))
    perWord.groupBy("topic")
      .agg(round(sum("phi_e6") / lit(nTop.toDouble)).cast(LongType).as("cv_e6"))
  }
}
