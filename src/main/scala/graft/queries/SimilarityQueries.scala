package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** Similarity search over the `embeddings` table (64-dim float vectors) —
  * the ANN layer of an LLM-data pipeline.
  *
  *  - ss1: brute-force cosine top-k — the exactness baseline. Queries are a
  *    broadcast side; the corpus scan parallelizes per-split and each
  *    executor keeps a local top-k.
  *  - ss2: IVF-style two-level search — deterministic coarse "centroids"
  *    (every 97th vector), invert the corpus by nearest centroid, probe the
  *    2 nearest cells per query. The scale path: probes touch O(corpus /
  *    n_cells · n_probe) instead of everything.
  *  - dd6: embedding near-duplicate pairs, blocked by label (the metadata
  *    blocking key) — equi-join within blocks, never O(n²) global.
  *
  * Perf shape: vector norms are computed ONCE per vector in a projection and
  * joined through — a pair evaluation is one dot-product HOF, not three.
  * Determinism: dot products fold in index order on both engines; compared
  * values are scaled+rounded to e6 BIGINT before ordering (float sums can
  * differ in the last ulp across engines), unique (query, id) tiebreaks.
  */
object SimilarityQueries {

  /** Σ aᵢ·bᵢ folded left-to-right in index order. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  private def dotSql(x: String, y: String): String =
    s"list_sum(list_transform(list_zip($x, $y), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  /** cos ×1e6 as BIGINT from a dot product and two precomputed norms. */
  private def cosE6(d: Column, na: Column, nb: Column): Column =
    round(lit(1e6) * d / (na * nb)).cast(LongType)

  private def cosE6Sql(d: String, na: String, nb: String): String =
    s"CAST(ROUND(1e6 * $d / ($na * $nb)) AS BIGINT)"

  /** embeddings + per-vector L2 norm (one HOF per vector, joined through). */
  private def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("norm", sqrt(dot(col("embedding"), col("embedding"))))

  private val withNormDuck: String =
    s"SELECT vec_id, label, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm FROM embeddings"

  private val NQueries = 10
  private val TopK = 5

  /** ss1_bruteforce_topk — exact cosine top-5 for the first 10 vectors as
    * queries, over the whole corpus (excluding self). */
  def ss1BruteforceTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = withNorm(t(s, dir, "embeddings"))
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("norm").as("qn"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_e6", cosE6(dot(col("qv"), col("embedding")), col("qn"), col("norm")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos_e6"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select("query_id", "rank", "vec_id", "cos_e6")
      .orderBy("query_id", "rank")
  }

  val ss1BruteforceTopkSql: String =
    s"""WITH emb AS ($withNormDuck),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, norm AS qn FROM emb WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id,
       |    ${cosE6Sql(dotSql("q.qv", "e.embedding"), "q.qn", "e.norm")} AS cos_e6
       |  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_e6,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_e6 DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos_e6 FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** ss2_ivf_topk — IVF with deterministic coarse centroids (every 97th
    * vector), n_probe=2. Same query set as ss1; recall vs ss1 measured in
    * SimilarityQueriesSpec. */
  def ss2IvfTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = withNorm(t(s, dir, "embeddings"))
    val cent = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"), col("norm").as("cn"))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("a_cos"), col("cent_id"))
    val assign = emb.crossJoin(broadcast(cent))
      .withColumn("a_cos", cosE6(dot(col("cv"), col("embedding")), col("cn"), col("norm")))
      .withColumn("ark", row_number().over(wAssign))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("embedding"), col("norm"), col("cent_id").as("cell"))
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("norm").as("qn"))
    val wProbe = Window.partitionBy("query_id").orderBy(desc("p_cos"), col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("p_cos", cosE6(dot(col("cv"), col("qv")), col("cn"), col("qn")))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= 2)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_id").as("cell"))
    val wRank = Window.partitionBy("query_id").orderBy(desc("cos_e6"), col("vec_id"))
    assign.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_e6", cosE6(dot(col("qv"), col("embedding")), col("qn"), col("norm")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= TopK)
      .select("query_id", "rank", "vec_id", "cos_e6")
      .orderBy("query_id", "rank")
  }

  val ss2IvfTopkSql: String =
    s"""WITH emb AS ($withNormDuck),
       |cent AS (SELECT vec_id AS cent_id, embedding AS cv, norm AS cn FROM emb WHERE vec_id % 97 = 0),
       |assign AS (
       |  SELECT vec_id, embedding, norm, cell FROM (
       |    SELECT e.vec_id, e.embedding, e.norm, c.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosE6Sql(dotSql("c.cv", "e.embedding"), "c.cn", "e.norm")} DESC, c.cent_id) AS ark
       |    FROM emb e CROSS JOIN cent c) t WHERE ark = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, norm AS qn FROM emb WHERE vec_id < $NQueries),
       |probes AS (
       |  SELECT query_id, qv, qn, cell FROM (
       |    SELECT q.query_id, q.qv, q.qn, c.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cosE6Sql(dotSql("c.cv", "q.qv"), "c.cn", "q.qn")} DESC, c.cent_id) AS prk
       |    FROM q CROSS JOIN cent c) t WHERE prk <= 2),
       |scored AS (
       |  SELECT p.query_id, a.vec_id,
       |    ${cosE6Sql(dotSql("p.qv", "a.embedding"), "p.qn", "a.norm")} AS cos_e6
       |  FROM assign a JOIN probes p USING (cell) WHERE a.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_e6,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_e6 DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos_e6 FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** dd6_embed_neardup — near-duplicate vector pairs within label blocks:
    * top-50 most-similar pairs. */
  def dd6EmbedNeardup(s: SparkSession, dir: String): DataFrame = {
    val emb = withNorm(t(s, dir, "embeddings"))
    val a = emb.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("ea"), col("norm").as("na"))
    val b = emb.select(col("label"), col("vec_id").as("vec_b"), col("embedding").as("eb"), col("norm").as("nb"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_e6", cosE6(dot(col("ea"), col("eb")), col("na"), col("nb")))
      .select("label", "vec_a", "vec_b", "cos_e6")
      .orderBy(desc("cos_e6"), col("vec_a"), col("vec_b"))
      .limit(50)
  }

  val dd6EmbedNeardupSql: String =
    s"""WITH emb AS ($withNormDuck)
       |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${cosE6Sql(dotSql("a.embedding", "b.embedding"), "a.norm", "b.norm")} AS cos_e6
       |FROM emb a JOIN emb b ON a.label = b.label AND a.vec_id < b.vec_id
       |ORDER BY cos_e6 DESC, vec_a, vec_b LIMIT 50""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "ss1_bruteforce_topk" -> (ss1BruteforceTopk _),
    "ss2_ivf_topk" -> (ss2IvfTopk _),
    "dd6_embed_neardup" -> (dd6EmbedNeardup _))

  val oracles: Map[String, String] = Map(
    "ss1_bruteforce_topk" -> ss1BruteforceTopkSql,
    "ss2_ivf_topk" -> ss2IvfTopkSql,
    "dd6_embed_neardup" -> dd6EmbedNeardupSql)
}
