package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AhoCorasick

/** fast_match registered via SparkSessionExtensions and driven through SQL
  * text — equivalence with the direct automaton. */
class FastMatchExpressionSpec extends AnyFunSuite {

  // getOrCreate may return a session built by another suite (no extensions
  // config applied then) — register on the live session, the same tuple the
  // GraftExtensions class injects at build time.
  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("FastMatchExpressionSpec")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("SQL fast_match equals AhoCorasick.findAll") {
    import spark.implicits._
    val texts = Seq("a table scan over data; database scans",
      "table scandal", "DATA at start", "")
    val df = texts.toDF("text")
    df.createOrReplaceTempView("docs_fm")
    val rows = spark.sql(
      "SELECT text, fast_match(text, array('table scan', 'scan', 'data')) AS m FROM docs_fm")
      .collect()
    val ac = AhoCorasick.build(Seq("table scan", "scan", "data"))
    rows.foreach { r =>
      val text = r.getString(0)
      val got = r.getSeq[org.apache.spark.sql.Row](1)
        .map(m => (m.getString(0), m.getInt(1), m.getInt(2))).toSet
      assert(got === ac.findAll(text.toLowerCase).toSet, s"text=[$text]")
    }
  }

  test("non-literal candidates are rejected at analysis") {
    import spark.implicits._
    Seq(("x", "y")).toDF("a", "b").createOrReplaceTempView("bad_fm")
    val e = intercept[Exception] {
      spark.sql("SELECT fast_match(a, array(b)) FROM bad_fm").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("foldable"))
  }

  test("case-insensitive matching with offsets into the original text") {
    import spark.implicits._
    Seq("The DATA set").toDF("text").createOrReplaceTempView("ci_fm")
    val m = spark.sql("SELECT fast_match(text, array('data')) FROM ci_fm")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(m.map(r => (r.getString(0), r.getInt(1), r.getInt(2))) === Seq(("data", 4, 8)))
  }
}
