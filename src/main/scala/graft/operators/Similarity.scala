package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reusable similarity-search operators — the user-facing API behind the
  * ss* queries. Vectors are `array<float|double>` columns; norms are
  * computed once per row and carried through; all pairings are broadcast or
  * cell-blocked, never a shuffled cross join.
  */
object Similarity {

  /** Σ aᵢ·bᵢ folded in index order — the codegen'd
    * [[graft.plans.VecDotExpression]] (requires `vec_dot` registered on the
    * session; every DataFrame entry point here registers it). */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Adds an L2 `norm` column for `vecCol`. Registers the native vec_dot on
    * the session (idempotent). */
  def withNorm(df: DataFrame, vecCol: String): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.withColumn("norm", sqrt(dot(col(vecCol), col(vecCol))))
  }

  /** Exact cosine top-k: for each row of `queries` (idCol, vecCol), the k
    * nearest corpus rows. `queries` must be broadcast-sized. Output:
    * (query_id, rank, id, cosine). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "v")
    val q = withNorm(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv")
      .withColumnRenamed("norm", "qn")
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("id"))
    c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qv"), col("v")) / (col("qn") * col("norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
  }

  /** Centroid counts up to this inline as expression literals (readable
    * plans, constant-foldable); above it the index ships as a broadcast
    * variable behind [[graft.plans.BroadcastDataExpression]] — at the
    * contract bound (~2¹⁶ centroids × 128 dims ≈ 8M doubles) a literal tree
    * would blow up plan serialization and Janino constant pools. Both paths
    * carry identical values, so results (and oracle hashes) do not move. */
  val IndexInlineThreshold = 1024

  private val centroidStructType = StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("cv", ArrayType(DoubleType), nullable = true),
    StructField("cn", DoubleType, nullable = false)))

  /** IVF index build: collects `centroids` (idCol, vecCol) into ONE
    * array<struct<cent_id, cv, cn>> column, so that cell assignment and cell
    * probing are pure projections — zero joins, zero Exchange. The collect is
    * bounded by contract: centroid count is a knob (k-means k, typically
    * ≤ 2¹⁶ even for a 100 TB corpus), never proportional to the corpus.
    * Small indexes inline as literals; large ones ride a broadcast variable
    * (see [[IndexInlineThreshold]]). */
  def centroidIndex(centroids: DataFrame, idCol: String, vecCol: String,
      inlineThreshold: Int = IndexInlineThreshold): Column = {
    val rows = withNorm(centroids.select(
        col(idCol).cast(LongType).as("cent_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("cv")), "cv")
      .collect()
    if (rows.isEmpty)
      // array() of zero children is array<null> — typing it keeps the
      // downstream getField analysis valid and degrades to empty results
      array().cast("array<struct<cent_id:bigint,cv:array<double>,cn:double>>")
    else if (rows.length <= inlineThreshold) array(rows.map { r =>
      struct(lit(r.getLong(0)).as("cent_id"),
        typedLit(r.getSeq[Double](1)).as("cv"),
        lit(r.getDouble(2)).as("cn"))
    }: _*)
    else graft.plans.BroadcastDataExpression.column(
      centroids.sparkSession, rows.toSeq, ArrayType(centroidStructType),
      s"centroid_index[${rows.length}]")
  }

  /** Nearest-centroid cell per row as a pure projection: per-centroid cosine
    * via `transform` over the literal index, argmax via `array_max` on
    * struct(score, −cent_id) (ties → lowest cent_id). No crossJoin, no
    * per-row window, no shuffle of the corpus. `score(dot, cn, norm)` builds
    * the comparison value (raw cosine by default; the oracle-checked queries
    * pass the e6-rounded spelling so ties resolve identically on both
    * engines — it must see the raw factors to stay bit-exact). */
  def assignCells(df: DataFrame, index: Column, vecCol: String, normCol: String,
      score: (Column, Column, Column) => Column = (d, cn, n) => d / (cn * n)): DataFrame = {
    val scored = transform(index, c => struct(
      score(dot(c.getField("cv"), col(vecCol)), c.getField("cn"), col(normCol)).as("acos"),
      (-c.getField("cent_id")).as("neg_id")))
    df.withColumn("cell", -array_max(scored).getField("neg_id"))
  }

  /** IVF top-k: assign corpus rows to their nearest centroid, probe the
    * `nProbe` nearest cells per query. Assign and probe are projections over
    * the literal centroid index (see [[centroidIndex]]); the only wide ops
    * are the broadcast probe join and the final per-query top-k. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val idx = centroidIndex(centroids, idCol, vecCol)
    val c = withNorm(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "v")
    val assign = assignCells(c, idx, "v", "norm")
    val q = withNorm(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv")
      .withColumnRenamed("norm", "qn")
    // nProbe nearest cells per query: sort struct(−cos, cent_id) asc = cos
    // desc with cent_id tiebreak, then take the first nProbe.
    val probeArr = slice(array_sort(transform(idx, cc => struct(
        (-(dot(cc.getField("cv"), col("qv")) / (cc.getField("cn") * col("qn")))).as("neg_cos"),
        cc.getField("cent_id").as("cent_id")))), 1, nProbe)
    val probes = q.withColumn("pc", explode(probeArr))
      .select(col("query_id"), col("qv"), col("qn"), col("pc.cent_id").as("cell"))
    val wR = Window.partitionBy("query_id").orderBy(desc("cosine"), col("id"))
    assign.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qv"), col("v")) / (col("qn") * col("norm")))
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
  }

  /** TRAINED centroid set for [[centroidIndex]]/[[ivfTopK]]: MLlib k-means
    * over the corpus vectors, centers exported as an ordinary
    * (cent_id, vec) DataFrame so the downstream index build — literal or
    * broadcast — is byte-for-byte the same machinery as the hash-sampled
    * path. The hash-sampled variant stays the ORACLE face (k-means centers
    * are MLlib-numeric floats with no DuckDB twin); this is the production
    * face: on clustered data trained cells align with the real clusters, so
    * the same nProbe recovers more true neighbors (SimilaritySpec proves
    * trained ≥ hash-sampled recall on a clustered corpus). The fit runs at
    * index-BUILD time over a sample-able input — at 100 TB you train on a
    * bounded sample and ship k centers, which is exactly this contract:
    * only k rows ever leave the fit. */
  def trainedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val feats = corpus.select(
      array_to_vector(col(vecCol).cast(ArrayType(DoubleType))).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20).fit(feats)
    model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray.toSeq) }
      .toDF(idCol, vecCol)
  }

  /** TRAINED product-quantization codebook: one k-means PER SUBSPACE over
    * the corpus's subvector slices (the real PQ training loop — Jégou et
    * al. 2011), with subspace-s center j concatenated across subspaces into
    * code j's full-width vector, so it drops into [[pqEncode]]/[[pqTopK]]
    * unchanged (they slice per subspace anyway). Hash-sampled
    * [[pqCodebook]] remains the oracle face; on clustered data the trained
    * codebook's cells track the residual structure and asymmetric-distance
    * ranking improves (spec-proven). nSub fits at build time over bounded
    * slices; only nSub×ks small arrays leave the driver. */
  def trainedPqCodebook(corpus: DataFrame, vecCol: String, nSub: Int,
      subDim: Int, ks: Int, seed: Long = 42L,
      inlineThreshold: Int = IndexInlineThreshold): Column = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val perSub: Seq[Array[org.apache.spark.ml.linalg.Vector]] =
      (0 until nSub).map { sIx =>
        val feats = corpus.select(array_to_vector(
          slice(col(vecCol).cast(ArrayType(DoubleType)), sIx * subDim + 1, subDim))
          .as("features"))
        new KMeans().setK(ks).setSeed(seed + sIx).setMaxIter(20)
          .fit(feats).clusterCenters
      }
    // k-means may converge to fewer than ks centers (low-cardinality
    // subspace slices). PAD a short subspace by repeating its last center
    // (ADVICE r7: the r7 min-clamp truncated EVERY subspace to the worst
    // one's count — one degenerate slice silently collapsed the whole
    // codebook's resolution). Repeated centers are valid codes that simply
    // never win an argmin, so the other subspaces keep full resolution;
    // log the degradation so it is visible.
    perSub.zipWithIndex.foreach { case (centers, sIx) =>
      if (centers.length < ks) System.err.println(
        s"[trainedPqCodebook] subspace $sIx converged to ${centers.length} < $ks " +
          "centers - padding by repeating its last center")
    }
    val rows: Seq[Seq[Double]] = (0 until ks).map { j =>
      perSub.flatMap { centers =>
        centers(math.min(j, centers.length - 1)).toArray.toSeq
      }
    }
    if (rows.length <= inlineThreshold) array(rows.map(typedLit(_)): _*)
    else graft.plans.BroadcastDataExpression.column(
      corpus.sparkSession, rows, ArrayType(ArrayType(DoubleType)),
      s"trained_pq_codebook[${rows.length}]")
  }

  /** Product-quantization codebook: `ks` sample vectors in deterministic
    * detHash order, inlined as a literal array<array<double>> — the same
    * bounded-literal contract as [[centroidIndex]] (a k-means codebook
    * would drop in identically; the hash-sampled one keeps the whole path
    * oracle-replayable). Floats widen to double exactly, so both engines
    * see identical codebook values. */
  /** The hash-sampled codebook ROWS (code order = sample order) — the
    * bounded collect [[pqCodebook]] inlines, exposed so a persisted-index
    * build can also WRITE them as an artifact the probe reads back. */
  def pqCodebookRows(corpus: DataFrame, idCol: String, vecCol: String,
      ks: Int): Array[Seq[Double]] =
    corpus
      .select(col(idCol).as("id"), col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .withColumn("h", graft.queries.Q.detHash(col("id"), 97))
      .orderBy("h", "id")
      .limit(ks)
      .select("v").collect().map(_.getSeq[Double](0))

  /** Re-enter codebook rows as a plan literal (the inline/broadcast split
    * of [[pqCodebook]], for rows that came from an artifact read). */
  def pqCodebookColumn(s: org.apache.spark.sql.SparkSession, rows: Array[Seq[Double]],
      inlineThreshold: Int = IndexInlineThreshold): Column =
    if (rows.length <= inlineThreshold) array(rows.map(typedLit(_)).toSeq: _*)
    else graft.plans.BroadcastDataExpression.column(
      s, rows.toSeq, ArrayType(ArrayType(DoubleType)), s"pq_codebook[${rows.length}]")

  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String, ks: Int,
      inlineThreshold: Int = IndexInlineThreshold): Column =
    pqCodebookColumn(corpus.sparkSession,
      pqCodebookRows(corpus, idCol, vecCol, ks), inlineThreshold)

  /** e9-rounded squared L2 distance between two same-length slices, folded
    * in index order — the cross-engine-exact building block for encode and
    * distance tables (see Q scaladoc rule on rounding float-derived scores
    * BEFORE comparing). The fold is the native codegen
    * [[graft.plans.VecSqDistExpression]] — bit-identical accumulation to
    * the HOF spelling (and to the DuckDB oracle's list fold), without the
    * per-evaluation array allocation and interpreted lambdas that dominate
    * the 8×16-per-row PQ encode. (Round-3 measured dead end: unrolling the
    * loops into a literal expression tree instead was 2.1× SLOWER — codegen
    * method limits; the custom-Expression loop is the right fix.) */
  private def sqDistE9(a: Column, b: Column): Column =
    round(lit(1e9) * call_function("vec_sqdist", a, b)).cast(LongType)

  /** PQ encode: adds `codes` (array<int>, one code per subspace) — each
    * subspace's argmin over the literal codebook, ties to the lowest code.
    * A pure projection: zero joins, zero Exchange, 10⁹ rows encode at scan
    * speed and the result is nSub small ints per vector instead of the
    * full float payload. */
  def pqEncode(df: DataFrame, codebook: Column, vecCol: String,
      nSub: Int, subDim: Int): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val codes = transform(sequence(lit(0), lit(nSub - 1)), s => {
      val lo = s * subDim + 1
      // argmin with lowest-code tiebreak: min over struct(d, j), using
      // transform's (element, index) form for the code index
      val scored = transform(codebook, (cb, j) => struct(
        sqDistE9(slice(col(vecCol), lo, lit(subDim)), slice(cb, lo, lit(subDim))).as("d"),
        j.as("j")))
      array_min(scored).getField("j")
    })
    df.withColumn("codes", codes)
  }

  /** PQ asymmetric-distance top-k: per query, an nSub×ks table of
    * e9-rounded subspace distances to every code (one bounded projection
    * per query row), then each corpus row scores as the SUM of nSub table
    * lookups through its codes — integer adds, no float math per pair, no
    * full-vector access. The queries (with tables) broadcast; the corpus
    * streams its (id, codes) — at 100 TB that is the entire point: the
    * probe never touches the original vectors. The final per-query top-k
    * is [[TopK.smallestPerGroup]] — the k-bounded fold+merge aggregate
    * (r11; previously a Window.partitionBy(query_id) over the
    * corpus-proportional scored set, the bounded-parallelism corpus sort
    * PlanGateSpec now rejects). */
  /** The per-query ADC distance TABLE (nSub×ks e9-rounded subspace
    * distances to every code) added as a `dtab` column — the query-side
    * half of PQ scoring, split out so the cell-pruned IVFADC face
    * (ss11) composes it with a persisted code store. */
  def pqQueryTables(queries: DataFrame, codebook: Column, vecCol: String,
      nSub: Int, subDim: Int): DataFrame = {
    graft.plans.GraftFunctions.register(queries.sparkSession)
    val dtab = transform(sequence(lit(0), lit(nSub - 1)), s => {
      val lo = s * subDim + 1
      transform(codebook, cb =>
        sqDistE9(slice(col(vecCol), lo, lit(subDim)), slice(cb, lo, lit(subDim))))
    })
    queries.withColumn("dtab", dtab)
  }

  /** ADC score: the SUM of nSub table lookups of a row's `codes` through
    * a query's `dtab` — integer adds, no float math per pair. */
  def pqAdist(codes: Column, dtab: Column, nSub: Int): Column =
    aggregate(sequence(lit(0), lit(nSub - 1)), lit(0L),
      (acc, s) => acc + element_at(element_at(dtab, s + 1), element_at(codes, s + 1) + 1))

  def pqTopK(corpus: DataFrame, queries: DataFrame, codebook: Column,
      idCol: String, vecCol: String, k: Int, nSub: Int, subDim: Int): DataFrame = {
    val enc = pqEncode(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")), codebook, "v", nSub, subDim)
      .select("id", "codes")
    val q = pqQueryTables(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      codebook, "qv", nSub, subDim).drop("qv")
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adist_e9", pqAdist(col("codes"), col("dtab"), nSub))
    TopK.smallestPerGroup(scored, Seq("query_id"), k,
        col("adist_e9"), col("id"), keyName = "adist_e9", idName = "id")
      .select("query_id", "rank", "id", "adist_e9")
  }

  /** Near-duplicate pairs within `blockCol` blocks, cosine ≥ threshold.
    * `blockCol` must be a bounded-size blocking key — an IVF cell (see
    * [[assignCells]]) or LSH band key, whose block population stays O(1) as
    * the corpus grows. A metadata column (label, language) is NOT a valid
    * block: its blocks grow with the corpus and the within-block pairing
    * goes quadratic. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val e = withNorm(df.select(col(blockCol).as("block"), col(idCol).as("id"), col(vecCol).as("v")), "v")
    val a = e.select(col("block"), col("id").as("id_a"), col("v").as("va"), col("norm").as("na"))
    val b = e.select(col("block"), col("id").as("id_b"), col("v").as("vb"), col("norm").as("nb"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select("block", "id_a", "id_b", "cosine")
  }
}
