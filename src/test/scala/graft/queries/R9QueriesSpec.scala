package graft.queries

import graft.SparkSpec

/** Golden/invariant checks for the r9 additions beyond the DuckDB oracle
  * replay: ta14's interpolated bigram LM on a hand-computable corpus, and
  * a22's BLEU identities (perfect match, brevity penalty, disjoint zero). */
class R9QueriesSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)], tag: String): String = {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory(tag).toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("ta14: hand-computed interpolated bigram NLL on a closed corpus") {
    // train (ids 0..3, the 80% split): "a b a b" ×4 → uni a:8 b:8 (T=16,
    // V=2); bigram (a,b):8, (b,a):4. test (id 4): "a b" → one transition,
    // pb = 8/8 = 1, pu(b) = (8+1)/(16+2) = 0.5, p = 0.7 + 0.3·0.5 = 0.85,
    // term_e6 = round(-ln(0.85)·1e6) = 162519.
    val dir = docsDir((0L to 3L).map(i => (i, "a b a b")) :+ (4L, "a b"), "ta14g")
    val rows = CurationQueries.ta14BigramPpl(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 1L)
    assert(r.getLong(2) === 162519L)
    assert(r.getLong(3) === 162519L)
  }

  test("ta14: unseen transitions cost strictly more than trained ones") {
    val seen = docsDir((0L to 3L).map(i => (i, "a b a b")) :+ (4L, "a b"), "ta14s")
    val unseen = docsDir((0L to 3L).map(i => (i, "a b a b")) :+ (4L, "b b"), "ta14u")
    def mean(dir: String): Long =
      CurationQueries.ta14BigramPpl(spark, dir).collect().head.getLong(3)
    assert(mean(unseen) > mean(seen))
  }

  test("a22: candidate == reference scores perfect BLEU") {
    val dir = docsDir(Seq((0L, "x y z w"), (1L, "x y z w")), "a22p")
    val r = TextQueries.a22Bleu(spark, dir).collect().head
    val m = r.getValuesMap[Long](Seq("p1_e6", "p2s_e6", "bp_e6", "bleu_e6"))
    assert(m("p1_e6") === 1000000L && m("p2s_e6") === 1000000L)
    assert(m("bp_e6") === 1000000L && m("bleu_e6") === 1000000L)
  }

  test("a22: a truncated candidate pays exactly the brevity penalty") {
    // cand (id 0) = 3-token prefix of the 5-token ref (id 1): every cand
    // gram clips fully (p1 = p2s = 1), so bleu = bp = exp(1 − 5/3).
    val dir = docsDir(Seq((0L, "x y z"), (1L, "x y z w v")), "a22b")
    val r = TextQueries.a22Bleu(spark, dir).collect().head
    val expBp = math.round(math.exp(1.0 - 5.0 / 3.0) * 1e6)
    assert(r.getAs[Long]("p1_e6") === 1000000L)
    assert(r.getAs[Long]("p2s_e6") === 1000000L)
    assert(r.getAs[Long]("bp_e6") === expBp)
    assert(r.getAs[Long]("bleu_e6") === expBp)
  }

  test("a23: chrF is 1e6 on identical pairs, and recall-weighted when truncated") {
    val same = docsDir(Seq((0L, "the quick brown fox"), (1L, "the quick brown fox")), "a23p")
    val r1 = TextQueries.a23Chrf(spark, same).collect().head
    assert(r1.getAs[Long]("chrp_e6") === 1000000L)
    assert(r1.getAs[Long]("chrr_e6") === 1000000L)
    assert(r1.getAs[Long]("chrf_e6") === 1000000L)
    // truncated candidate: precision 1, recall < 1 — with beta = 2 the F
    // score must sit closer to recall than to precision
    val cut = docsDir(Seq((0L, "the quick"), (1L, "the quick brown fox")), "a23t")
    val r2 = TextQueries.a23Chrf(spark, cut).collect().head
    val (p, r, f) = (r2.getAs[Long]("chrp_e6"), r2.getAs[Long]("chrr_e6"),
      r2.getAs[Long]("chrf_e6"))
    assert(p === 1000000L && r < 1000000L)
    assert(math.abs(f - r) < math.abs(f - p), "chrF2 must weight recall double")
  }

  test("a22: disjoint candidate/reference scores zero") {
    val dir = docsDir(Seq((0L, "a b"), (1L, "c d")), "a22z")
    val r = TextQueries.a22Bleu(spark, dir).collect().head
    assert(r.getAs[Long]("p1_e6") === 0L)
    assert(r.getAs[Long]("bleu_e6") === 0L)
  }
}
