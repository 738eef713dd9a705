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

  test("nearDuplicatePairs is symmetric-free and thresholded") {
    val pairs = Similarity.nearDuplicatePairs(emb, "vec_id", "embedding", "label", 0.2)
      .collect()
    assert(pairs.forall(r => r.getLong(1) < r.getLong(2)))
    assert(pairs.forall(r => r.getDouble(3) >= 0.2))
  }
}
