package graft.tools
import org.apache.spark.sql.SparkSession

/** r22 plan capture: `runMain graft.tools.PlanDumpR22 <suffix> <name>...`
  * writes `plans/r22/<name>_<suffix>.txt` (explain formatted) per query.
  * Besides SparkEntry names it accepts the pseudo-name `ss14_feed` — the
  * windowed vector-feed FRAME of ss14, dumped separately because the serve
  * plan pins (checkpoints) the feed legs at construction time, so the
  * artifact scan this round moved is invisible in ss14's own dump. */
object PlanDumpR22 {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args.drop(1)
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (n <- names) {
      try {
        val df = n match {
          case "ss14_feed" =>
            val emb = graft.Tables(s, dir, "embeddings")
            val w = graft.operators.CdcRules.feedSplit(emb, "vec_id")
            graft.queries.SimilarityQueries.sizedVecFeed(s, dir, w)
          case _ => graft.SparkEntry.queries(n)(s, dir)
        }
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/root/repo/plans/r22/${n}_$suffix.txt"), txt)
        println("WROTE " + n)
      } catch { case e: Throwable => println("PLANFAIL " + n + ": " + e.getMessage) }
    }
    s.stop()
  }
}
