package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off pin dumper for [[graft.queries.SfPins]]-keyed oracles: fits the
  * shared seeded LDA at a given SF dir and prints the three pin artifacts
  * (a9 dominant-topic digit string, a10 perplexity e3 constant, a10c/a10e
  * topic table) as Scala literals to paste into MLQueries' pin tables.
  *
  * Run once per master to prove partition independence before pinning:
  * {{{
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.PinDump /root/testdata/sf0.1"
  *   SPARK_GRAFT_CPUS=8  sbt "runMain graft.tools.PinDump /root/testdata/sf0.1"
  * }}}
  * identical output ⇒ safe to pin (the a9/a10 justification chain). */
object PinDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.queries.SfPins.register(spark, dir)
    val n = graft.queries.SfPins.activeDocCount
    println(s"PIN fingerprint=${graft.queries.SfPins.activeSf}")

    val topics = graft.queries.MLQueries.a9LdaDocTopics(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    require(topics.map(_._1).toSeq == (0L until n).toSeq,
      s"doc_ids not contiguous 0..${n - 1} — digit-string pin invalid")
    require(topics.forall(t => t._2 >= 0 && t._2 <= 9), "topic out of digit range")
    val digits = topics.map(_._2).mkString
    println("PIN a9DocTopic (wrap at 62):")
    digits.grouped(62).foreach(g => println("  \"" + g + "\" +"))

    val ppl = graft.queries.MLQueries.a10LdaPerplexity(spark, dir).collect()(0).getLong(1)
    println(s"PIN a10 perplexity_e3 = $ppl")

    val rows = graft.queries.MLQueries.ldaTopicsForOracle(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    println("PIN ldaTopicRows:")
    rows.grouped(4).foreach { g =>
      println("    " + g.map { case (t, w, rk) => s"($t, \"$w\", $rk)" }.mkString(", ") + ",")
    }
    spark.stop()
  }
}
