package graft.queries

import graft.SparkSpec

/** Wiring guard for the SF-keyed pin oracles (r8): every generated corpus
  * must have a complete pin set and generate well-formed oracle SQL, and an
  * unknown corpus must DROP the pinned entries (rows-only) instead of
  * emitting a wrong-SF oracle. The content drift guards (live re-fit vs
  * pin) live in CoherenceSpec; this spec is pure wiring and costs no LDA
  * fit. */
class SfPinsSpec extends SparkSpec {

  private val gate = (500L, 149174L)

  private def withSf[T](fp: (Long, Long))(body: => T): T = {
    val prior = SfPins.activeSf
    SfPins.activeSf = fp
    try body finally SfPins.activeSf = prior
  }

  test("register derives the documented fingerprint of each generated SF") {
    val expected = Map(
      "/root/testdata/sf0.001" -> (500L, 153156L),
      "/root/testdata/sf0.01" -> gate,
      "/root/testdata/sf0.1" -> (5000L, 1485576L))
    for ((dir, fp) <- expected) {
      SfPins.register(spark, dir)
      assert(SfPins.activeSf === fp, s"$dir fingerprint moved — re-dump every pin")
    }
    SfPins.activeSf = gate
  }

  test("every pinned corpus generates a full oracle set with scaled constants") {
    for (fp <- Seq((500L, 153156L), gate, (5000L, 1485576L))) withSf(fp) {
      val o = MLQueries.oracles
      for (k <- Seq("a9_lda_doc_topics", "a10_lda_perplexity",
          "a10c_lda_coherence", "a10e_lda_cv"))
        assert(o.contains(k), s"$k missing at $fp")
      // the a9 oracle must unroll exactly docCount positions
      assert(o("a9_lda_doc_topics").contains(s"range(1, ${fp._1 + 1})"))
      // the digit pin must be exactly one digit per document
      assert(MLQueries.A9DocTopicPins(fp).length === fp._1)
      // the e1 golden scales with the registered corpus (papers = docs/2)
      val e1 = PipelineQueries.oracles("e1_ingest_files")
      assert(e1.startsWith("SELECT * FROM (VALUES"))
    }
  }

  test("an unpinned corpus drops the pinned entries instead of lying") {
    withSf((123L, 456L)) {
      val o = MLQueries.oracles
      for (k <- Seq("a9_lda_doc_topics", "a10_lda_perplexity",
          "a10c_lda_coherence", "a10e_lda_cv"))
        assert(!o.contains(k), s"$k must drop to rows-only on an unknown corpus")
      // non-pinned oracles are unaffected
      assert(o.contains("a10b_umass_coherence"))
      assert(o.contains("v1_pad_vectorize"))
    }
  }
}
