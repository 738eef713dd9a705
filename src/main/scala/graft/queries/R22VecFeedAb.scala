package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r22 measurement main (VERDICT r21 #3's Done clause): A/B of ss14's
  * windowed vector-feed generation —
  *   A: range-clustered `vec_feed` artifact (pushed vec_id range over
  *      disjoint file envelopes — [[SimilarityQueries.sizedVecFeed]])
  *   B: the r21 spelling (raw embeddings scan with the same pushed range)
  * on the SAME session; both sides counted twice (cold/warm file-index),
  * plus row-set equality. `runMain graft.queries.R22VecFeedAb` at
  * $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS. */
object R22VecFeedAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      graft.Launch.derivedShufflePartitions(dir, cpus.toInt).toString)
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.operators.CdcRules
    val embAll = graft.Tables(s, dir, "embeddings")
    val wStar = CdcRules.feedSplit(embAll, "vec_id")
    // build outside the timed region (the first-touch amortized job)
    SimilarityQueries.ensureVecFeedArtifact(s, dir)
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val rows = df.count()
        println(f"AB $tag pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
      }
    time("A_artifact")(SimilarityQueries.sizedVecFeed(s, dir, wStar))
    time("B_raw_scan")(CdcRules.sizedFeed(
      CdcRules.vecFeed(embAll, "vec_id", "embedding", wStar), "vec_id", wStar))
    val a = SimilarityQueries.sizedVecFeed(s, dir, wStar)
      .select(col("vec_id"), col("op")).orderBy("vec_id").collect().map(_.toSeq).toSeq
    val b = CdcRules.sizedFeed(
        CdcRules.vecFeed(embAll, "vec_id", "embedding", wStar), "vec_id", wStar)
      .select(col("vec_id"), col("op")).orderBy("vec_id").collect().map(_.toSeq).toSeq
    println(s"AB keysEqual=${a == b} nRows=${a.length}")
    s.stop()
  }
}
