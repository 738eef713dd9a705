package graft.tools
import org.apache.spark.sql.SparkSession

/** r22 measurement (VERDICT r21 #6): split tok10/ta19's per-call cost into
  * DataFrame construction, Catalyst planning (executedPlan force), and
  * execution — to test the "deep-plan constant is planning-bound"
  * hypothesis before restructuring anything.
  * `runMain graft.tools.PlanSplitR22 <name>...` at $SPARK_GRAFT_SF_DIR. */
object PlanSplitR22 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.Tables(s, dir, "documents").count() // warm listing/session
    for (n <- args; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(s, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analyze+optimize+physical plan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"SPLIT $n pass$pass construct=${(t1 - t0) / 1e9}%.2f " +
        f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f")
    }
    s.stop()
  }
}
