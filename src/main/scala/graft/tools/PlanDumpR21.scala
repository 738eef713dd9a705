package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDumpR21 {
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
        val df = graft.SparkEntry.queries(n)(s, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/root/repo/plans/r21/${n}_$suffix.txt"), txt)
        println("WROTE " + n)
      } catch { case e: Throwable => println("PLANFAIL " + n + ": " + e.getMessage) }
    }
    s.stop()
  }
}
