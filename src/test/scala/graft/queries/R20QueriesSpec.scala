package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-20 invariants: the LINEAR pHash counting scheme (population sums
  * + double-band overlap correction + sub-banded near enumeration) is
  * bit-equal to the r19 all-pairs spelling it replaces, on signature
  * shapes that exercise every branch — exact-duplicate clusters (k=4
  * overlap, heavy correction), near pairs at Hamming 1–3 sharing 3, 2 and
  * exactly 1 band, slice-straddling xor patterns, and the real
  * text-derived signatures. Also pins the v3 artifact contract: no pair
  * set is persisted and the post-compaction serve never touches the
  * corpus. */
class R20QueriesSpec extends SparkSpec {
  import spark.implicits._

  private def sigFrame(sigs: Seq[Long]) =
    sigs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("asset_id", "phash64")

  private def countsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet

  private def assertParity(sigs: Seq[Long], clue: String): Unit = {
    val f = sigFrame(sigs)
    val lin = countsOf(MultimodalQueries.phashCounts(f))
    val quad = countsOf(MultimodalQueries.phashCountsQuadratic(f))
    assert(lin === quad, clue)
  }

  test("phash linear counts ≡ all-pairs: crafted branch-coverage signatures") {
    val h = 0x5a3c96e1d24b78f0L
    val sigs = Seq(
      h,
      h,                          // exact duplicate (k=4, near at distance 0)
      h,                          // triple: correction weight (k−1)=3 per pair
      h ^ 1L,                     // distance 1 → k=3 common bands, near
      h ^ (1L | (1L << 16) | (1L << 32)), // distance 3 spread over 3 chunks → k=1, near
      h ^ ((1L << 12) | (1L << 13)),      // distance 2 inside chunk 0 → k=3, near;
                                          // xor bits straddle the 12-bit slice grid
      h ^ 0xFFFL,                 // distance 12 in chunk 0 → k=3 candidate, NOT near
      h ^ (0xFL | (0xFL << 16)),  // distance 8 over chunks 0,1 → k=2 candidate
      h ^ ((1L << 48) | (1L << 63)),      // distance 2 in chunk 3 → k=3 (bands 0,1,2), near
      h ^ 0x00FF00FF00FF00FFL,    // distance 32, no common band → NOT a candidate
      0x1122334455667788L,        // unrelated
      0x1122334455667788L ^ (7L << 49),   // its distance-3 partner, single band 0..2?
      -1L, 0L                     // extreme values
    )
    assertParity(sigs, "crafted signature set")
  }

  test("phash linear counts ≡ all-pairs: seeded random corpus with forced collisions") {
    val rnd = new scala.util.Random(42)
    val base = Seq.fill(150)(rnd.nextLong())
    // force band-sharing structure: clones at controlled xor patterns
    val derived = base.take(30).zipWithIndex.map { case (s, i) =>
      val flips = (i % 4) match {
        case 0 => 1L << (i % 64)
        case 1 => (1L << (i % 16)) | (1L << (16 + i % 16))
        case 2 => 0xFFFFL << (16 * (i % 4)) // kill exactly one chunk
        case 3 => 0L                        // exact duplicate
      }
      s ^ flips
    }
    assertParity(base ++ derived, "seeded random + forced collisions")
  }

  test("phash linear counts ≡ all-pairs on real text-derived signatures") {
    val payload = ("the quick brown fox jumps over the lazy dog " * 3).trim
    val docs = (0L until 80L).map { i =>
      val text =
        if (i == 7L || i == 55L) payload
        else s"asset $i " + (s"u${i}x" * 20) + " trailing content to clear the 64-char floor"
      (i, text, text.length.toLong)
    }.toDF("doc_id", "text", "n_chars")
    val sigs = MultimodalQueries.phashSigs(docs)
    val lin = countsOf(MultimodalQueries.phashCounts(sigs))
    val quad = countsOf(MultimodalQueries.phashCountsQuadratic(sigs))
    assert(lin === quad)
    assert(lin.nonEmpty)
  }

  test("phash v3 artifact persists no pair set; post-compaction serve is corpus-free") {
    val tmp = java.nio.file.Files.createTempDirectory("mm9v3").toString
    val payload = ("the quick brown fox jumps over the lazy dog " * 3).trim
    val docs = (0L until 130L).map { i =>
      val text =
        if (Set(10L, 33L, 28L, 50L, 120L).contains(i)) payload
        else s"asset $i " + (s"u${i}x" * 20) + " trailing content to clear the 64-char floor"
      (i, text, text.length.toLong)
    }.toDF("doc_id", "text", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val before = MultimodalQueries.mm8TombstonePhash(spark, tmp).collect().map(_.toSeq).toSeq
    val after = MultimodalQueries.mm9ExpungedPhash(spark, tmp).collect().map(_.toSeq).toSeq
    assert(after === before, "expunge-fold must be answer-invariant")
    val home = MultimodalQueries.ensurePhashIndex(spark, tmp)
    assert(!java.nio.file.Files.exists(home.resolve("pairs")),
      "v3 layout must not persist a pair artifact (the r19 sf100 disk exhaustion)")
    // the folded generation serves from rows alone: no corpus scan
    val served = MultimodalQueries.mm9ExpungedPhash(spark, tmp)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"post-expunge serve must not touch the corpus:\n$plan")
  }

  test("ir26 batched block-max ≡ ir24's exact batch, and pruning is real") {
    val dir = "/root/testdata/sf0.01"
    val (res, kept, bounds) =
      TextQueries.blockmaxBatchServe(spark, dir, TextQueries.Batch100,
        TextQueries.BatchTopK)
    val got = res.collect().map(_.toSeq).toSeq
    val want = TextQueries.ir24QueryBatch100(spark, dir).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === want, "block pruning must be invisible to the batch answer")
    val (nKept, nAll) = (kept.count(), bounds.count())
    assert(nKept <= nAll)
  }

  test("ir26 pruning does real work on a df-skewed corpus (the WAND shape)") {
    import spark.implicits._
    // the uniform testdata is WAND's worst case (30-word vocab — every
    // term in every block, bounds never separate; kept == bounds at both
    // oracle SFs). This fixture is the production shape: a stopword in
    // every doc, a rare term confined to ONE 64-doc block — θ for the
    // (stopword, rare) query is idf(rare)-dominated, stopword-only blocks
    // bound far below it and MUST be skipped.
    val tmp = java.nio.file.Files.createTempDirectory("ir26fix").toString
    val docs = (0L until 2048L).map { i =>
      val rare = if (i >= 192L && i < 256L) " rarezz" else ""
      val text = s"the w${i % 50}a w${i % 50}b w${i % 7}c filler$rare the data"
      (i, text, text.length.toLong)
    }.toDF("doc_id", "text", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val batch = Seq(0L -> Seq("the", "rarezz"), 1L -> Seq("the", "data"))
    val (res, kept, bounds) =
      TextQueries.blockmaxBatchServe(spark, tmp, batch, 10)
    val got = res.collect().map(_.toSeq).toSeq
    // exact reference: the ir16/ir24 batch kernel over the same fixture
    val want = TextQueries.ir16Internals(spark, tmp, batch, 10)
      .collect().map(_.toSeq).toSeq
    assert(got === want, "pruned batch must equal the exact batch kernel")
    val keptQ0 = kept.filter(col("query_id") === 0L).count()
    val allQ0 = bounds.filter(col("query_id") === 0L).count()
    assert(allQ0 === 32L, s"fixture should match all 32 blocks for q0, got $allQ0")
    assert(keptQ0 < allQ0 / 4,
      s"the rare-term query must skip most stopword-only blocks ($keptQ0/$allQ0)")
    // the rare block's docs must dominate q0's top-k
    val q0docs = got.filter(_.head == 0L).map(_(2).asInstanceOf[Long])
    assert(q0docs.forall(d => d >= 192L && d < 256L),
      "q0's top-k must come from the rare-term block")
  }

  test("sm11 star split only COARSENS sm10's verified clusters (never splits one)") {
    // the switch-point contract (VERDICT r19 #7): every sm10 component must
    // lie inside exactly ONE sm11 component — the star edges subsume every
    // verified pair via its bucket representative, so the leakage-safe
    // property is preserved by construction while the verify leg drops out
    val dir = "/root/testdata/sf0.001"
    val sm10 = DedupQueries.sm10LeakageSafeSplit(spark, dir)
      .select(col("doc_id"), col("cluster_id").as("c10"))
    val sm11 = DedupQueries.sm11StarSafeSplit(spark, dir)
      .select(col("doc_id"), col("cluster_id").as("c11"))
    val split10 = sm10.join(sm11, Seq("doc_id"))
      .groupBy("c10").agg(countDistinct("c11").as("n"))
      .filter(col("n") > 1).count()
    assert(split10 === 0L, "an sm10 cluster straddles sm11 clusters")
    // and the coarsening is real on this corpus OR the partitions are equal
    val n10 = sm10.select("c10").distinct().count()
    val n11 = sm11.select(col("c11")).distinct().count()
    assert(n11 <= n10, "star components must be a coarsening")
  }

  test("phash delta sub-leg re-derivation: tombstones subtract exactly (mm8 fixture)") {
    // the R13 mm8-shaped fixture: a near-cluster where one member is
    // DELETED and one UPDATED — the dead-touching counts must re-derive
    // from persisted signatures bit-equal to a full recompute
    val tmp = java.nio.file.Files.createTempDirectory("mm8v3").toString
    val payload = ("pack my box with five dozen liquor jugs extra " * 3).trim
    val docs = (0L until 130L).map { i =>
      val text =
        if (Set(10L, 33L, 28L, 50L, 120L).contains(i)) payload
        else s"asset $i " + (s"v${i}y" * 20) + " trailing content to clear the 64-char floor"
      (i, text, text.length.toLong)
    }.toDF("doc_id", "text", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = MultimodalQueries.mm8TombstonePhash(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // full recompute over the post-change corpus (the oracle's definition):
    // feedSplit(130 ids) = 117; i ≤ 117 ∧ i%13==7 deleted, i%13==2 updated
    // (token order reversed), exactly CdcRules' predicates
    val post = (0L until 130L)
      .filterNot(i => i <= 117L && i % 13L == 7L)
      .map { i =>
        val base =
          if (Set(10L, 33L, 28L, 50L, 120L).contains(i)) payload
          else s"asset $i " + (s"v${i}y" * 20) + " trailing content to clear the 64-char floor"
        val text =
          if (i <= 117L && i % 13L == 2L) base.split(" ").reverse.mkString(" ")
          else base
        (i, text, text.length.toLong)
      }.toDF("doc_id", "text", "n_chars")
    val want = MultimodalQueries.phashCounts(MultimodalQueries.phashSigs(post))
      .orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want, "served merge must equal the post-change recompute")
    val byId = got.map(r => r._1 -> r._4).toMap
    assert(!byId.contains(33L) && byId(10L) >= 2L,
      "fixture must exercise a real subtraction (near-cluster member deleted)")
  }
}
