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

  test("trained k-means index beats the hash-sampled stand-in on clustered data") {
    // a corpus with REAL cluster structure (the regime k-means training is
    // for): 8 well-separated centers in 16-dim, 40 points each with small
    // noise, all from one seeded generator. On uniform data trained ≈
    // sampled; on clustered data the trained cells align with the true
    // clusters, so IVF probing the same nProbe recovers more of the exact
    // top-k — the VERDICT r6 #7 "Done" criterion.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val nClusters = 8
    val centers = Array.fill(nClusters, dim)(rnd.nextDouble() * 10 - 5)
    val corpus = (0 until nClusters * 40).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(_ + rnd.nextDouble() * 0.8 - 0.4).toSeq)
    }.toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    def recallWith(cent: org.apache.spark.sql.DataFrame): Double = {
      val hits = Similarity.ivfTopK(corpus, q, cent, "vec_id", "embedding",
        k = 5, nProbe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (hits intersect bf).size.toDouble / bf.size
    }
    // hash-sampled stand-in: every 37th corpus vector as a "centroid"
    val sampled = corpus.filter(col("vec_id") % 37 === 0)
    val trained = Similarity.trainedCentroids(corpus, "vec_id", "embedding",
      k = nClusters)
    val (rSampled, rTrained) = (recallWith(sampled), recallWith(trained))
    assert(rTrained >= rSampled,
      s"trained recall $rTrained < sampled recall $rSampled")
    // and trained cells on clustered data should be essentially lossless
    // at nProbe=1: every query's cluster is one trained cell
    assert(rTrained >= 0.9, s"trained recall unexpectedly low: $rTrained")
  }

  test("trained PQ codebook has lower quantization distortion than hash-sampled") {
    // The k-means training objective IS quantization MSE (Jégou et al.
    // 2011): encode every vector, reconstruct it from its per-subspace
    // codes, and compare mean squared reconstruction error. (Top-k recall
    // is the wrong metric here: a well-trained codebook collapses
    // same-cluster points onto identical codes, which is the point of PQ
    // compression but makes within-cluster rank a tiebreak.)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 16
    val nClusters = 6
    val centers = Array.fill(nClusters, dim)(rnd.nextDouble() * 10 - 5)
    val corpus = (0 until nClusters * 30).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(_ + rnd.nextDouble() * 0.6 - 0.3).toSeq)
    }.toDF("vec_id", "embedding")
    graft.plans.GraftFunctions.register(spark)
    val (nSub, subDim) = (4, 4)
    def distortion(cb: org.apache.spark.sql.Column): Double = {
      val enc = Similarity.pqEncode(
        corpus.select(col("vec_id").as("id"), col("embedding").as("v")),
        cb, "v", nSub, subDim)
      val recon = flatten(transform(sequence(lit(0), lit(nSub - 1)), s =>
        slice(element_at(cb, element_at(col("codes"), s + 1) + 1),
          s * subDim + 1, lit(subDim))))
      enc.withColumn("err", call_function("vec_sqdist", col("v"), recon))
        .agg(avg("err")).collect().head.getDouble(0)
    }
    val sampledCb = Similarity.pqCodebook(corpus, "vec_id", "embedding", 8)
    val trainedCb = Similarity.trainedPqCodebook(corpus, "embedding",
      nSub = nSub, subDim = subDim, ks = 8)
    val (dSampled, dTrained) = (distortion(sampledCb), distortion(trainedCb))
    assert(dTrained <= dSampled,
      s"trained distortion $dTrained > sampled $dSampled")
    // and not vacuously: the trained codebook should be substantially better
    // on clustered data (sampled picks arbitrary corpus points as codes)
    assert(dTrained <= dSampled * 0.8,
      s"trained $dTrained not clearly better than sampled $dSampled")
  }

  test("nearDuplicatePairs is symmetric-free and thresholded") {
    val pairs = Similarity.nearDuplicatePairs(emb, "vec_id", "embedding", "label", 0.2)
      .collect()
    assert(pairs.forall(r => r.getLong(1) < r.getLong(2)))
    assert(pairs.forall(r => r.getDouble(3) >= 0.2))
  }
}
