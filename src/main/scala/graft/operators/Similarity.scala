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

  /** Σ aᵢ·bᵢ folded in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Adds an L2 `norm` column for `vecCol`. */
  def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("norm", sqrt(dot(col(vecCol), col(vecCol))))

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

  /** IVF top-k: assign corpus rows to their nearest centroid, probe the
    * `nProbe` nearest cells per query. `centroids` (idCol, vecCol) must be
    * broadcast-sized; recall grows with nProbe. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val c = withNorm(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "v")
    val cent = withNorm(centroids.select(col(idCol).as("cent_id"), col(vecCol).as("cv")), "cv")
      .withColumnRenamed("norm", "cn")
    val q = withNorm(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv")
      .withColumnRenamed("norm", "qn")
    val wA = Window.partitionBy("id").orderBy(desc("acos"), col("cent_id"))
    val assign = c.crossJoin(broadcast(cent))
      .withColumn("acos", dot(col("cv"), col("v")) / (col("cn") * col("norm")))
      .withColumn("ark", row_number().over(wA))
      .filter(col("ark") === 1)
      .select(col("id"), col("v"), col("norm"), col("cent_id").as("cell"))
    val wP = Window.partitionBy("query_id").orderBy(desc("pcos"), col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("pcos", dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
      .withColumn("prk", row_number().over(wP))
      .filter(col("prk") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_id").as("cell"))
    val wR = Window.partitionBy("query_id").orderBy(desc("cosine"), col("id"))
    assign.join(probes, Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qv"), col("v")) / (col("qn") * col("norm")))
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
  }

  /** Near-duplicate pairs within `blockCol` blocks, cosine ≥ threshold. */
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
