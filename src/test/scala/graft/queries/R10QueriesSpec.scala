package graft.queries

import graft.SparkSpec

/** Golden/invariant checks for the r10 additions beyond the DuckDB oracle
  * replay: a24's ROUGE-L identities and its truncation contract. */
class R10QueriesSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)], tag: String): String = {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory(tag).toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("a24: candidate == reference scores ROUGE-L 1e6 across the board") {
    val dir = docsDir(Seq((0L, "x y z w"), (1L, "x y z w")), "a24p")
    val r = TextQueries.a24RougeL(spark, dir).collect().head
    assert(r.getAs[Long]("lcs_len") === 4L)
    assert(r.getAs[Long]("rougel_p_e6") === 1000000L)
    assert(r.getAs[Long]("rougel_r_e6") === 1000000L)
    assert(r.getAs[Long]("rougel_f_e6") === 1000000L)
  }

  test("a24: disjoint candidate/reference scores zero") {
    val dir = docsDir(Seq((0L, "a b"), (1L, "c d")), "a24z")
    val r = TextQueries.a24RougeL(spark, dir).collect().head
    assert(r.getAs[Long]("lcs_len") === 0L)
    assert(r.getAs[Long]("rougel_f_e6") === 0L)
  }

  test("a24: LCS rewards order without requiring contiguity") {
    // "a X b Y c" vs "a b c Z" share the non-contiguous in-order run a,b,c
    val dir = docsDir(Seq((0L, "a X b Y c"), (1L, "a b c Z")), "a24o")
    val r = TextQueries.a24RougeL(spark, dir).collect().head
    assert(r.getAs[Long]("lcs_len") === 3L)
    assert(r.getAs[Long]("rougel_p_e6") === 600000L) // 3/5
    assert(r.getAs[Long]("rougel_r_e6") === 750000L) // 3/4
    // F1 = 2·(3/5)·(3/4)/(3/5 + 3/4) = 2/3
    assert(r.getAs[Long]("rougel_f_e6") === 666667L)
  }

  test("a24: reordering costs ROUGE-L but not BLEU-1/chrF precision") {
    // the discriminating case for the third metric: same bag of grams,
    // scrambled order — unigram-precision metrics can't see it, LCS can
    val dir = docsDir(Seq((0L, "c b a"), (1L, "a b c")), "a24r")
    val r = TextQueries.a24RougeL(spark, dir).collect().head
    assert(r.getAs[Long]("lcs_len") === 1L)
    assert(r.getAs[Long]("rougel_f_e6") === 333333L)
  }

  test("a24: both sides truncate to the token budget before the DP") {
    // 60-token candidate == 60-token reference: identical, but c_len/r_len
    // must report the truncated 40 — the bounded-cost contract
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq((0L, text), (1L, text)), "a24t")
    val r = TextQueries.a24RougeL(spark, dir).collect().head
    assert(r.getAs[Long]("c_len") === 40L)
    assert(r.getAs[Long]("r_len") === 40L)
    assert(r.getAs[Long]("lcs_len") === 40L)
    assert(r.getAs[Long]("rougel_f_e6") === 1000000L)
  }

  test("a23 consumes F21: decomposed candidate == composed reference scores 1e6") {
    // without the r10 normalization, "cafe"+U+0301 vs precomposed café
    // shares almost no char trigram; after NFC both sides are identical
    val dir = docsDir(Seq(
      (0L, "le cafe\u0301 chaud du matin"),
      (1L, "le caf\u00e9 chaud\u200b du matin")), "a23n")
    val r = TextQueries.a23Chrf(spark, dir).collect().head
    assert(r.getAs[Long]("chrf_e6") === 1000000L,
      "chrF must see NFC-normalized, invisible-stripped text")
  }

  test("a24: an unpaired trailing document drops out instead of scoring") {
    val dir = docsDir(Seq((0L, "a b"), (1L, "a b"), (2L, "orphan doc")), "a24u")
    val rows = TextQueries.a24RougeL(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("pair_id")).toSeq === Seq(0L))
  }

  test("a25: identical pair has WER 0 and match ratio 1e6") {
    val dir = docsDir(Seq((0L, "x y z w"), (1L, "x y z w")), "a25p")
    val r = TextQueries.a25Wer(spark, dir).collect().head
    assert(r.getAs[Long]("edit_dist") === 0L)
    assert(r.getAs[Long]("wer_e6") === 0L)
    assert(r.getAs[Long]("match_ratio_e6") === 1000000L)
  }

  test("a25: one substitution + one insertion price exactly 2 edits") {
    // cand "a X c d EXTRA" vs ref "a b c d": X substitutes b, EXTRA inserts
    val dir = docsDir(Seq((0L, "a X c d EXTRA"), (1L, "a b c d")), "a25e")
    val r = TextQueries.a25Wer(spark, dir).collect().head
    assert(r.getAs[Long]("edit_dist") === 2L)
    assert(r.getAs[Long]("wer_e6") === 500000L) // 2/4
  }

  test("a25: WER exceeds 1e6 when the candidate is much longer (raw convention)") {
    val dir = docsDir(Seq((0L, "p q r s t u"), (1L, "a b")), "a25l")
    val r = TextQueries.a25Wer(spark, dir).collect().head
    assert(r.getAs[Long]("edit_dist") === 6L) // 2 subs + 4 inserts
    assert(r.getAs[Long]("wer_e6") === 3000000L) // 6/2
    assert(r.getAs[Long]("match_ratio_e6") === 0L) // 1 - 6/6
  }
}
