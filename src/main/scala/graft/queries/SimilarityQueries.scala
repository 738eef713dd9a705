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
  *    executor keeps a local top-k (TakeOrderedAndProject after the window).
  *  - ss2: IVF-style two-level search — deterministic coarse "centroids"
  *    (every 97th vector), invert the corpus by nearest centroid, probe the
  *    2 nearest cells per query. The scale path: probes touch O(corpus /
  *    n_cells · n_probe) instead of everything.
  *  - dd6: embedding near-duplicate pairs, blocked by label (the metadata
  *    blocking key) — equi-join within blocks, never O(n²) global.
  *
  * Determinism: dot products fold in index order (aggregate / list_sum over
  * zip), all compared values scaled+rounded to e6 BIGINT before ordering
  * (float sums may differ in the last ulp across engines), unique (query,
  * id) tiebreaks everywhere.
  */
object SimilarityQueries {

  /** cosine(a, b) ×1e6 as BIGINT — Spark side. */
  private def cosE6(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast(DoubleType) * v.cast(DoubleType)))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast(DoubleType) * v.cast(DoubleType)))
    round(lit(1e6) * dot / (na * nb)).cast(LongType)
  }

  /** cosine(a, b) ×1e6 as BIGINT — DuckDB side (same fold order). */
  private def cosE6Sql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(list_zip($x, $y), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    s"CAST(ROUND(1e6 * ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))) AS BIGINT)"
  }

  private val NQueries = 10
  private val TopK = 5

  /** ss1_bruteforce_topk — exact cosine top-5 for the first 10 vectors as
    * queries, over the whole corpus (excluding self). */
  def ss1BruteforceTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_e6", cosE6(col("qv"), col("embedding")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos_e6"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select("query_id", "rank", "vec_id", "cos_e6")
      .orderBy("query_id", "rank")
  }

  val ss1BruteforceTopkSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, ${cosE6Sql("q.qv", "e.embedding")} AS cos_e6
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_e6,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_e6 DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos_e6 FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** ss2_ivf_topk — IVF with deterministic coarse centroids (every 97th
    * vector), n_probe=2. Same query set as ss1; results approximate ss1
    * (recall measured in SimilarityQueriesSpec). */
  def ss2IvfTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cent = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    // invert: each vector -> nearest centroid
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("a_cos"), col("cent_id"))
    val assign = emb.crossJoin(broadcast(cent))
      .withColumn("a_cos", cosE6(col("cv"), col("embedding")))
      .withColumn("ark", row_number().over(wAssign))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    // probe: each query -> 2 nearest centroids
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wProbe = Window.partitionBy("query_id").orderBy(desc("p_cos"), col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("p_cos", cosE6(col("cv"), col("qv")))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= 2)
      .select(col("query_id"), col("qv"), col("cent_id").as("cell"))
    // search only the probed cells
    val wRank = Window.partitionBy("query_id").orderBy(desc("cos_e6"), col("vec_id"))
    assign.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_e6", cosE6(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= TopK)
      .select("query_id", "rank", "vec_id", "cos_e6")
      .orderBy("query_id", "rank")
  }

  val ss2IvfTopkSql: String =
    s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0),
       |assign AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosE6Sql("c.cv", "e.embedding")} DESC, c.cent_id) AS ark
       |    FROM embeddings e CROSS JOIN cent c) t WHERE ark = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
       |probes AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT q.query_id, q.qv, c.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cosE6Sql("c.cv", "q.qv")} DESC, c.cent_id) AS prk
       |    FROM q CROSS JOIN cent c) t WHERE prk <= 2),
       |scored AS (
       |  SELECT p.query_id, a.vec_id, ${cosE6Sql("p.qv", "a.embedding")} AS cos_e6
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
    val emb = t(s, dir, "embeddings")
    val a = emb.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = emb.select(col("label"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_e6", cosE6(col("ea"), col("eb")))
      .select("label", "vec_a", "vec_b", "cos_e6")
      .orderBy(desc("cos_e6"), col("vec_a"), col("vec_b"))
      .limit(50)
  }

  val dd6EmbedNeardupSql: String =
    """SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  %s AS cos_e6
      |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      |ORDER BY cos_e6 DESC, vec_a, vec_b LIMIT 50""".stripMargin
      .format(cosE6Sql("a.embedding", "b.embedding"))

  val queries: Map[String, QueryFn] = Map(
    "ss1_bruteforce_topk" -> (ss1BruteforceTopk _),
    "ss2_ivf_topk" -> (ss2IvfTopk _),
    "dd6_embed_neardup" -> (dd6EmbedNeardup _))

  val oracles: Map[String, String] = Map(
    "ss1_bruteforce_topk" -> ss1BruteforceTopkSql,
    "ss2_ivf_topk" -> ss2IvfTopkSql,
    "dd6_embed_neardup" -> dd6EmbedNeardupSql)
}
