package graft.queries

import graft.SparkSpec
import graft.operators.TopicCoherence
import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.CountVectorizer
import org.apache.spark.sql.functions._

/** The coherence-vs-k model-selection sweep (the reference's criterion for
  * picking k, `TM_2_Modeling.ipynb:cells 17-24`), demonstrated at sf0.001
  * with tiny maxIter: train one LDA per k, score each with the same UMass
  * aggregation the a10b/a10c queries use, pick the argmax. */
class CoherenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("umassE6 is 0 for a single-word topic set and negative for rare pairs") {
    import spark.implicits._
    // doc 1 has both words, docs 2-3 only 'a': D(a)=3, D(b)=1, D(a,b)=1
    val docWords = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "a")).toDF("doc_id", "word")
    val topics = Seq(("t0", "a", 1), ("t0", "b", 2)).toDF("topic", "word", "rank")
    val got = TopicCoherence.umassE6(topics, docWords).collect()
    assert(got.length === 1)
    // ln((1+1)/3) = ln(2/3) < 0
    assert(got.head.getLong(1) === math.round(1e6 * math.log(2.0 / 3.0)))
  }

  test("cvE6 matches a hand-computed c_v on a tiny fixture") {
    import spark.implicits._
    // D = 4 docs; topic words a, b: df(a)=3, df(b)=2, codf(a,b)=2
    val docWords = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
      (4L, "x")).toDF("doc_id", "word")
    val topics = Seq(("t0", "a", 1), ("t0", "b", 2)).toDF("topic", "word", "rank")
    val got = TopicCoherence.cvE6(topics, docWords, nTop = 2).collect()
    assert(got.length === 1)
    // replicate the pipeline in plain Scala: e6-rounded NPMI matrix, integer
    // vector algebra, one double cosine per word, mean over words
    val D = 4.0
    def npmiE6(joint: Double, pi: Double, pj: Double): Long = {
      val p = joint / D + TopicCoherence.CvEps
      math.round(1e6 * math.log(p * D * D / (pi * pj)) / -math.log(p))
    }
    val eAA = npmiE6(3, 3, 3); val eAB = npmiE6(2, 3, 2)
    val eBA = eAB; val eBB = npmiE6(2, 2, 2)
    val s1 = eAA + eBA; val s2 = eAB + eBB
    val nw = math.sqrt((s1 * s1 + s2 * s2).toDouble)
    def phi(e1: Long, e2: Long): Long = math.round(
      1e6 * (e1 * s1 + e2 * s2) / (math.sqrt((e1 * e1 + e2 * e2).toDouble) * nw))
    val expected = math.round((phi(eAA, eAB) + phi(eBA, eBB)) / 2.0)
    assert(got.head.getLong(1) === expected)
    // and both words fully co-occurring with themselves score NPMI ≈ 1
    assert(eAA > 990000 && eBB > 990000)
  }

  test("c_v window premise holds: every testdata document fits one 110-token window") {
    // cvE6 computes boolean sliding-window counts as per-document booleans,
    // which is EXACT c_v iff no document exceeds the window size. If this
    // assert ever fails (new testdata with longer docs), cvE6 callers must
    // pre-split documents into sliding windows first.
    val maxTok = graft.Tables(spark, dir, "documents")
      .select(size(split(col("text"), " ")).as("n"))
      .agg(max("n")).collect()(0).getInt(0)
    assert(maxTok <= 110, s"max doc tokens $maxTok exceeds the c_v window")
  }

  test("coherence-vs-k sweep runs and selects an argmax") {
    val docs = graft.Tables(spark, dir, "documents")
      .withColumn("tok", split(col("text"), " "))
    val cvModel = new CountVectorizer().setInputCol("tok").setOutputCol("bow")
      .setVocabSize(1 << 10).fit(docs)
    val bow = cvModel.transform(docs)
    val vocab = cvModel.vocabulary
    val docWords = docs.select(col("doc_id"), explode(col("tok")).as("word"))
    val scores = Seq(2, 3).map { k =>
      val model = new LDA().setK(k).setMaxIter(2).setSeed(42L).setFeaturesCol("bow").fit(bow)
      val topics = model.describeTopics(4)
        .select(col("topic"), posexplode(col("termIndices")).as(Seq("rk", "ti")))
        .select(col("topic"),
          element_at(typedLit(vocab.toSeq), col("ti") + 1).as("word"),
          (col("rk") + 1).as("rank"))
      val perTopic = TopicCoherence.umassE6(topics, docWords).collect()
      assert(perTopic.length === k, s"k=$k topics")
      k -> perTopic.map(_.getLong(1)).sum / k
    }
    val best = scores.maxBy(_._2)._1
    assert(Seq(2, 3).contains(best))
  }

  test("a10c/a10e pinned topic table matches the live seeded model at sf0.01") {
    // The golden half of the a10c/a10e oracles is a VALUES pin of the
    // seeded LDA topic table; this re-fits the model on the gate corpus and
    // asserts the pin row-for-row, so MLlib drift (version, tie-break
    // change) fails HERE instead of surfacing only as a driver-gate hash
    // mismatch (review r7: the pin had no local guard).
    val live = MLQueries.ldaTopicsForOracle(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.get(2).asInstanceOf[Number].intValue)).toSeq.sorted
    assert(live === MLQueries.LdaTopicRows.sorted,
      "seeded LDA topics drifted from the pinned a10c/a10e oracle table")
  }

  test("a9 doc-topic and a10 perplexity pins match the live model at sf0.01") {
    // ADVICE r7: the a10 oracle was a bare constant and A9DocTopicPin had
    // no local guard — MLlib drift in per-doc inference or perplexity
    // surfaced only at the driver gate. Both constants are now asserted
    // against a live fit here (the SessionShare'd model, so this shares
    // the fit with the topic-table test above).
    val dir = "/root/testdata/sf0.01"
    val gateKey = (500L, 149174L)
    graft.queries.SfPins.register(spark, dir)
    assert(graft.queries.SfPins.activeSf === gateKey,
      "sf0.01 corpus fingerprint changed — every seeded pin must be re-dumped")
    // the digit-string pin indexes topics BY doc_id — contiguity is the
    // precondition for both the pin and its range-join oracle (ADVICE r7)
    val ids = graft.Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 500L), "sf0.01 doc_ids must be exactly 0..499")
    val live = MLQueries.a9LdaDocTopics(spark, dir)
      .collect().map(_.getInt(1)).mkString
    assert(live === MLQueries.A9DocTopicPins(gateKey),
      "per-doc dominant topics drifted from the pinned a9 oracle string")
    val ppl = MLQueries.a10LdaPerplexity(spark, dir).collect()(0).getLong(1)
    assert(ppl === MLQueries.A10PerplexityPins(gateKey),
      "seeded perplexity drifted from the pinned a10 oracle constant")
  }
}
