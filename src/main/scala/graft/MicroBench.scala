package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the FM1 implementations: native Catalyst expression
  * vs Scala UDF vs the naive per-candidate regexp plan (the oracle plan).
  * Prints one JSON line with seconds per variant over the sf dir's
  * documents. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cands = graft.queries.MatchQueries.gazetteer
    val docs = Tables(spark, sfDir, "documents")
    docs.count() // warm

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val candArray = "array(" + cands.map(c => s"'$c'").mkString(",") + ")"
    val (tExpr, nExpr) = time {
      docs.select(explode(expr(s"fast_match(text, $candArray)"))).count()
    }
    val fmUdf = graft.operators.FastMatch.matcher(cands)
    val (tUdf, nUdf) = time {
      docs.select(explode(fmUdf(col("text")))).count()
    }
    val (tRegex, nRegex) = time {
      // per-candidate regexp count — the O(n·m) plan
      cands.map(c => docs.select(
        size(regexp_extract_all(col("text"), lit("\\b" + c + "\\b"), lit(0))).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)).sum
    }
    println(s"""{"fm_expr_sec":$tExpr,"fm_udf_sec":$tUdf,"fm_regex_sec":$tRegex,"matches":[$nExpr,$nUdf,$nRegex],"sf":"$sfDir"}""")
    spark.stop()
  }
}
