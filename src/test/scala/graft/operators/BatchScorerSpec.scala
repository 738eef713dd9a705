package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BatchScorerSpec extends SparkSpec {

  private val trans = MLFixtures.transition

  test("scoring is deterministic and batch-size independent") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), split(col("text"), " ").as("tokens"))
      .limit(100)
    val a = BatchScorer.scoreParagraphs(docs, trans, batchSize = 7)
      .collect().map(s => s.id -> (s.score, s.path)).toMap
    val b = BatchScorer.scoreParagraphs(docs.repartition(5), trans, batchSize = 256)
      .collect().map(s => s.id -> (s.score, s.path)).toMap
    assert(a === b)
    assert(a.size === 100)
  }

  test("scored shape matches the AL-pool contract and Viterbi agrees") {
    import spark.implicits._
    val one = Seq((1L, Seq("data", "set"))).toDF("id", "tokens")
    val s = BatchScorer.scoreParagraphs(one, trans).collect()(0)
    assert(s.path.length === 2)
    assert(s.probs.length === 2)
    assert(s.probs.head.length === BatchScorer.NumClasses)
    val model = new BatchScorer.LinearStandInModel(trans)
    val emit = model.emissions(Seq("data", "set"))
    assert(s.path === Viterbi.decode(emit, trans).toSeq)
    assert(math.abs(s.score - Viterbi.pathScore(emit, trans, s.path.toArray)) < 1e-12)
  }
}

object MLFixtures {
  val transition: Array[Array[Double]] =
    Array.tabulate(4, 4)((i, j) => ((i * 7 + j * 3) % 5 - 2) * 0.1)
}
