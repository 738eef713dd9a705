package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r10, VERDICT r9 item 6): measure dd6's cell-assignment under
  * the hash-stride stand-in vs trained k-means centroids at the SAME
  * k = N/⌈√N⌉ geometry, on the bench-scale embeddings. Prints one JSON
  * line: per-face warm pair-query seconds, k-means training seconds, and
  * Σ cellsize² (the within-cell pair-join cost driver — balance matters as
  * much as count). The oracle face stays hash-stride either way (k-means
  * centers have no DuckDB twin); this decides whether dd6 should OFFER a
  * trained production face, and records the measurement in BASELINE.md. */
object Dd6Experiment {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(s)

    val emb0 = graft.Tables(s, dir, "embeddings")
    val n = emb0.count()
    val stride = math.max(2L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val k = math.max(2L, n / stride).toInt
    def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
    def cosE6(d: Column, na: Column, nb: Column): Column =
      round(lit(1e6) * d / (na * nb)).cast("long")
    val emb = emb0.withColumn("norm", sqrt(dot(col("embedding"), col("embedding"))))
      .localCheckpoint()

    def cellified(idx: Column): DataFrame =
      graft.operators.Similarity.assignCells(emb, idx, "embedding", "norm",
        (d, cn, nn) => cosE6(d, cn, nn))

    def pairCount(idx: Column): Long = {
      val c = cellified(idx)
      val a = c.select(col("cell"), col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("norm").as("na"))
      val b = c.select(col("cell"), col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("norm").as("nb"))
      a.join(b, Seq("cell")).filter(col("vec_a") < col("vec_b"))
        .withColumn("cos_e6", cosE6(dot(col("ea"), col("eb")), col("na"), col("nb")))
        .orderBy(desc("cos_e6"), col("vec_a"), col("vec_b")).limit(50)
        .count()
    }

    def sumSq(idx: Column): Long =
      cellified(idx).groupBy("cell").count()
        .agg(sum(col("count") * col("count"))).collect()(0).getLong(0)

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }

    val hashIdx = graft.operators.Similarity.centroidIndex(
      emb.filter(col("vec_id") % stride === 0), "vec_id", "embedding")
    val (h0, _) = time(pairCount(hashIdx)) // warm-up
    val (h1, _) = time(pairCount(hashIdx))
    val (h2, _) = time(pairCount(hashIdx))

    val (tTrain, cents) = time(
      graft.operators.Similarity.trainedCentroids(emb0, "vec_id", "embedding", k))
    val trainedIdx = graft.operators.Similarity.centroidIndex(cents, "vec_id", "embedding")
    val (t0v, _) = time(pairCount(trainedIdx)) // warm-up
    val (t1, _) = time(pairCount(trainedIdx))
    val (t2, _) = time(pairCount(trainedIdx))

    println(f"""{"tool":"dd6_experiment","sf_dir":"$dir","n":$n,"stride":$stride,"k":$k,""" +
      f""""hash":{"cold":$h0%.3f,"warm":[$h1%.3f,$h2%.3f],"sumsq":${sumSq(hashIdx)}},""" +
      f""""trained":{"train_sec":$tTrain%.3f,"cold":$t0v%.3f,"warm":[$t1%.3f,$t2%.3f],"sumsq":${sumSq(trainedIdx)}}}""")
    s.stop()
  }
}
