package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FetchSpec extends SparkSpec {

  test("E4 flow: fetch with per-row status, resume skips completed ids") {
    import spark.implicits._
    val input = Seq(
      ("p1", "http://x/p1"), ("p2", "http://x/bad/p2"),
      ("p3", "http://x/corrupt/p3"), ("p4", "http://x/p4"))
      .toDF("id", "url")

    val m1 = Fetch.fetchAll(input, () => new Fetch.StubClient).toDF()
    val statuses = m1.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(statuses === Map("p1" -> "ok", "p2" -> "fail", "p3" -> "invalid", "p4" -> "ok"))

    // resume: only non-ok ids are retried (p2, p3); ok rows kept once each
    val m2 = Fetch.resumePass(input, m1, () => new Fetch.StubClient)
    val counts = m2.groupBy("id").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("p1" -> 1L, "p2" -> 2L, "p3" -> 2L, "p4" -> 1L))
    // latest pass still fails the same way (stub deterministic)
    assert(m2.filter(col("id") === "p2" && col("status") === "ok").count() === 0)
  }

  test("S3 link extraction: href/src attributes, dedup, urljoin-style resolution") {
    import spark.implicits._
    val html =
      """<a href="https://a.org/x.pdf">x</a>
        |<A HREF='http://b.org/y'>y</A>
        |<img src="/img/logo.png"/>
        |<a href="//cdn.org/lib.js">cdn</a>
        |<a href="papers/z.pdf">z</a>
        |<a href="/papers/z.pdf">z-root</a>
        |<a href="https://a.org/x.pdf">dup</a>""".stripMargin
    val df = Seq((html, "https://base.org/dir/")).toDF("html", "base")
    val links = df.select(Fetch.extractLinks(col("html"), col("base")).as("links"))
      .collect()(0).getSeq[String](0)
    assert(links === Seq(
      "https://a.org/x.pdf",
      "http://b.org/y",
      "https://base.org/img/logo.png", // root-relative → origin, not base dir
      "https://cdn.org/lib.js", // protocol-relative → base scheme
      "https://base.org/dir/papers/z.pdf",
      "https://base.org/papers/z.pdf"))
  }

  test("S3 link extraction: null base keeps relative links, same-URL spellings dedup") {
    import spark.implicits._
    val html = """<a href="x.pdf">a</a><a href="https://a.org/y">b</a>"""
    val df = Seq((html, null: String)).toDF("html", "base")
    val links = df.select(Fetch.extractLinks(col("html"), col("base")).as("links"))
      .collect()(0).getSeq[String](0)
    assert(links === Seq("x.pdf", "https://a.org/y"))
    // distinct runs AFTER absolutizing: two raw spellings of one URL collapse
    val html2 = """<a href="/x.pdf">a</a><a href="x.pdf">b</a>"""
    val df2 = Seq((html2, "https://a.org")).toDF("html", "base")
    val links2 = df2.select(Fetch.extractLinks(col("html"), col("base")).as("links"))
      .collect()(0).getSeq[String](0)
    assert(links2 === Seq("https://a.org/x.pdf"))
  }
}
