package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: prints exchange counts and pruned read schemas
  * for the queries named in args (or a small default set). The quick check
  * that a new query's scans are column-pruned and its exchange count
  * matches the designed shuffle shape — the per-query sibling of the
  * suite-wide PlanGateSpec. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      val p = SparkEntry.queries(n)(s, dir).queryExecution.executedPlan.toString
      val scans = p.linesIterator.filter(_.contains("ReadSchema")).map(_.trim).toSeq
      val exch = p.linesIterator.count(_.contains("Exchange"))
      println(s"=== $n exchanges=$exch scans=${scans.size}")
      scans.foreach { x =>
        val i = x.indexOf("ReadSchema"); println("  " + x.substring(i).take(160))
      }
    }
    s.stop()
  }
}
