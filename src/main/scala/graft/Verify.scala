package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter for fast targeted
    // iteration (oracle_sql.json is filtered to match, so check_local.py
    // reports rows-only/missing correctly on the subset)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    // fail fast on typos: a silently-empty filtered run would dump nothing
    // and read as "all pass" downstream
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    }
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // data-derived shuffle sizing, same derivation as Bench (r21): equals
    // the old `= cpus` at every protocol SF, scales at big SFs
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      Launch.derivedShufflePartitions(sfDir, cpus.toInt).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // register the corpus fingerprint BEFORE any oracle map is read: the
    // seeded-pin oracles (a9/a10/a10c/a10e) and the e1 goldens are SF-keyed
    // (SfPins, r8) and regenerate their SQL for this dir's corpus
    graft.queries.SfPins.register(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // GRAFT_DIFF: comma-separated query names whose Spark-side rows are ALSO
    // dumped as canonical sorted JSONL (<name>.rows.jsonl) — a human-diffable
    // artifact for hash mismatches the driver record can't localize. Default
    // covers the historically driver-divergent queries (sm7 r6; a29/a32 r11
    // decimal-hash divergence — fixed r12, kept here so any recurrence is
    // row-localizable from the driver artifacts alone).
    val diffNames: Set[String] = sys.env.getOrElse("GRAFT_DIFF",
      "sm7_temperature_sample,a29_brier,a32_rank_corr")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    SparkEntry.queries.filter(kv => wanted(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        if (diffNames.contains(name)) {
          val cols = df.columns.sorted.map(org.apache.spark.sql.functions.col)
          val rows = df.select(cols: _*).orderBy(cols: _*).toJSON.collect()
          Files.writeString(Paths.get(s"$outDir/$name.rows.jsonl"),
            rows.mkString("", "\n", "\n"))
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => wanted(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
