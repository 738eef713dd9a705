package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("bruteForceTopK agrees with the oracle-checked ss1 query") {
    val q = emb.filter(col("vec_id") < 10)
    val api = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val query = graft.queries.SimilarityQueries.ss1BruteforceTopk(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(api === query)
  }

  test("ivfTopK recall vs brute force, and cell blocking really restricts work") {
    val q = emb.filter(col("vec_id") < 10)
    val cent = emb.filter(col("vec_id") % 97 === 0)
    val ivf = Similarity.ivfTopK(emb, q, cent, "vec_id", "embedding", k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (ivf intersect bf).size.toDouble / bf.size
    assert(recall >= 0.3, s"recall=$recall")
    // raising nProbe to all cells recovers brute force exactly
    val all = Similarity.ivfTopK(emb, q, cent, "vec_id", "embedding", k = 5, nProbe = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(all === bf)
  }

  test("broadcast index path: identical results to the literal path, bounded plan") {
    // the contract allows ~2¹⁶ centroids; as expression literals that blows
    // up plan serialization/codegen, so above IndexInlineThreshold the index
    // rides a broadcast variable. Same values either way → same results.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centroids = (0 until 10000)
      .map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() - 0.5)))
      .toDF("vec_id", "embedding")
    val corpus = (0 until 200)
      .map(i => (100000L + i, Seq.fill(dim)(rnd.nextDouble() - 0.5)))
      .toDF("vec_id", "embedding")

    val lit = Similarity.centroidIndex(centroids, "vec_id", "embedding",
      inlineThreshold = Int.MaxValue)
    val bc = Similarity.centroidIndex(centroids, "vec_id", "embedding",
      inlineThreshold = 0)
    // 10k × 16-dim as a broadcast: the column expression stays tiny (the
    // literal spelling of the same index prints megabytes)
    val bcExpr = org.apache.spark.sql.GraftColumnBridge.expression(bc)
    assert(bcExpr.toString.length < 200, bcExpr.toString)

    val c = Similarity.withNorm(
      corpus.select(col("vec_id").as("id"), col("embedding").as("v")), "v")
    def cells(idx: org.apache.spark.sql.Column) =
      Similarity.assignCells(c, idx, "v", "norm")
        .select("id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cells(bc) === cells(lit))
    // and the physical plan of the broadcast path serializes within bounds
    val planStr = Similarity.assignCells(c, bc, "v", "norm")
      .queryExecution.executedPlan.toString
    assert(planStr.length < 100000, s"plan unexpectedly large: ${planStr.length} chars")

    // pqCodebook: same dual-path equivalence on codes
    val litCb = Similarity.pqCodebook(corpus, "vec_id", "embedding", 64,
      inlineThreshold = Int.MaxValue)
    val bcCb = Similarity.pqCodebook(corpus, "vec_id", "embedding", 64,
      inlineThreshold = 0)
    def codes(cb: org.apache.spark.sql.Column) =
      Similarity.pqEncode(corpus.select(col("vec_id").as("id"), col("embedding").as("v")),
          cb, "v", nSub = 4, subDim = 4)
        .select("id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(codes(bcCb) === codes(litCb))
  }

  test("nearDuplicatePairs is symmetric-free and thresholded") {
    val pairs = Similarity.nearDuplicatePairs(emb, "vec_id", "embedding", "label", 0.2)
      .collect()
    assert(pairs.forall(r => r.getLong(1) < r.getLong(2)))
    assert(pairs.forall(r => r.getDouble(3) >= 0.2))
  }
}
