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
}
