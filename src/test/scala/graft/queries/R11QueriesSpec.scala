package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden/invariant checks for the r11 additions beyond the DuckDB oracle
  * replay: a30's bootstrap-test invariants. */
class R11QueriesSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)], tag: String): String = {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory(tag).toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("a30: identical systems give every-delta-zero and p = 1") {
    // identity rule for system B — the Koehn sanity anchor: a test that
    // can reject A == A is broken
    val r = TextQueries.bootstrapCore(spark, "/root/testdata/sf0.001",
      "filter(tk, (x, i) -> true)").collect().head
    assert(r.getAs[Long]("n_resamples") === 200L)
    assert(r.getAs[Long]("wins_a") === 0L)
    assert(r.getAs[Long]("wins_b") === 0L)
    assert(r.getAs[Long]("sum_delta_e6") === 0L)
    assert(r.getAs[Long]("ci_lo_e6") === 0L)
    assert(r.getAs[Long]("ci_hi_e6") === 0L)
    assert(r.getAs[Long]("p_a_e6") === 1000000L)
  }

  test("a30: a clearly-degraded system B loses significantly on real data") {
    val r = TextQueries.a30BootstrapCi(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getAs[Long]("n_resamples") === 200L)
    // dropping every 4th candidate token must cost BLEU-2 on (nearly)
    // every resample: demand a significant one-tailed result
    assert(r.getAs[Long]("wins_a") >= 190L, s"wins_a = ${r.getAs[Long]("wins_a")}")
    assert(r.getAs[Long]("p_a_e6") <= 50000L, s"p = ${r.getAs[Long]("p_a_e6")}")
    assert(r.getAs[Long]("sum_delta_e6") > 0L)
    // the CI must be ordered and, for a significant win, exclude zero
    val (lo, hi) = (r.getAs[Long]("ci_lo_e6"), r.getAs[Long]("ci_hi_e6"))
    assert(lo <= hi && lo > 0L, s"CI [$lo, $hi]")
  }

  test("a30: resample draws are deterministic across invocations") {
    val a = TextQueries.a30BootstrapCi(spark, "/root/testdata/sf0.001").collect()
    val b = TextQueries.a30BootstrapCi(spark, "/root/testdata/sf0.001").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("ta19: the KN continuation property discriminates Francisco-style words") {
    // francisco occurs 4x but ALWAYS after the same (b, san) context —
    // one continuation type; common occurs 4x after four DIFFERENT
    // contexts. Equal raw frequency, so a raw-count back-off scores the
    // two unseen-context test trigrams identically; Kneser-Ney must score
    // francisco strictly worse (fewer distinct contexts => lower
    // continuation probability). Seen-trigram doc 14 must beat both.
    val dir = docsDir(Seq(
      (0L, "b san francisco e1 f1 common g1"),
      (1L, "b san francisco e2 f2 common g2"),
      (2L, "b san francisco e3 f3 common g3"),
      (3L, "b san francisco e4 f4 common g4"),
      (4L, "zz qq francisco"),   // test: unseen ctx, low-continuation w
      (9L, "zz qq common"),      // test: unseen ctx, high-continuation w
      (14L, "b san francisco")), // test: fully seen trigram
      "ta19f")
    val rows = CurationQueries.ta19Kn3Ppl(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("mean_nll_e6")).toMap
    assert(rows.keySet === Set(4L, 9L, 14L))
    assert(rows(4L) > rows(9L),
      s"francisco ${rows(4L)} must score worse than common ${rows(9L)}")
    assert(rows(14L) < rows(9L),
      s"seen trigram ${rows(14L)} must beat unseen-context ${rows(9L)}")
  }

  test("ta19: transition count and backoff-ladder monotonicity on real data") {
    val rows = CurationQueries.ta19Kn3Ppl(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_trans") > 0)
      assert(r.getAs[Long]("mean_nll_e6") > 0, "every KN3 probability is < 1")
    }
    // the order-3 model must not be WORSE on average than ta16's bigram
    // KN on the same corpus by more than a smoothing margin — and on this
    // synthetic corpus (heavy trigram reuse) it should genuinely win
    val kn3 = rows.map(_.getAs[Long]("nll_e6_sum")).sum.toDouble /
      rows.map(_.getAs[Long]("n_trans")).sum
    val kn2rows = CurationQueries.ta16KnPpl(spark, "/root/testdata/sf0.001").collect()
    val kn2 = kn2rows.map(_.getAs[Long]("nll_e6_sum")).sum.toDouble /
      kn2rows.map(_.getAs[Long]("n_trans")).sum
    assert(kn3 < kn2 * 1.35,
      s"order-3 KN corpus NLL $kn3 implausibly worse than bigram $kn2")
  }

  test("ss7: delta refresh is exactly a full rebuild restricted to the delta") {
    // the correctness contract of incremental index maintenance: merging
    // the delta's frozen-index assignments into the existing cell table
    // must produce the identical (vec_id, cell) set as re-assigning the
    // whole post-delta corpus from scratch under the same index
    val dir = "/root/testdata/sf0.001"
    val merged = SimilarityQueries.ss7Merged(spark, dir)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = SimilarityQueries.ss7FullRebuild(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged === rebuilt)
    assert(merged.nonEmpty)
  }

  test("ss7: statuses partition the post-delta corpus and adds live above 1e6") {
    val rows = SimilarityQueries.ss7Merged(spark, "/root/testdata/sf0.001").collect()
    val byStatus = rows.groupBy(_.getAs[String]("status")).map { case (k, v) => k -> v.length }
    assert(byStatus.keySet === Set("kept", "updated", "added"))
    rows.filter(_.getAs[String]("status") == "added")
      .foreach(r => assert(r.getAs[Long]("vec_id") >= 1000000L))
    // kept rows never report a move; updated rows may
    rows.filter(_.getAs[String]("status") != "updated")
      .foreach(r => assert(!r.getAs[Boolean]("moved")))
  }

  test("hll1: raw-path accuracy inside 3 sigma on a crafted large vocabulary") {
    // the testdata vocabulary (31 tokens) only exercises linear counting;
    // the raw Flajolet estimator needs n >> m = 256. 5000 distinct tokens
    // across two langs: standard error is 1.04/sqrt(256) ~ 6.5%, assert 3x.
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hll1big").toString
    (0 until 5000).map { i =>
      (i.toLong, if (i % 2 == 0) "aa" else "bb", s"tok$i w${i % 911}")
    }.toDF("doc_id", "lang", "text").coalesce(2)
      .write.parquet(s"$tmp/documents.parquet")
    val rows = CorpusQueries.hll1Distinct(spark, tmp).collect()
      .map(r => r.getAs[String]("scope") ->
        (r.getAs[Long]("hll_est"), r.getAs[Long]("exact_distinct"), r.getAs[Long]("v_zero"))).toMap
    assert(rows.keySet === Set("aa", "bb", "ALL"))
    rows.foreach { case (scope, (est, exact, vZero)) =>
      assert(vZero === 0L, s"$scope: n >> m must fill every register")
      val err = math.abs(est - exact).toDouble / exact
      assert(err < 0.195, s"$scope: |err| ${err} vs 3-sigma 0.195 (est $est exact $exact)")
    }
    // merged ALL >= each part (union cardinality), and parts overlap in the
    // w-suffix tokens so ALL < sum of parts
    assert(rows("ALL")._2 >= rows("aa")._2 && rows("ALL")._2 >= rows("bb")._2)
    assert(rows("ALL")._2 < rows("aa")._2 + rows("bb")._2)
  }

  test("hll1: the linear-counting branch matches on the tiny real vocabulary") {
    val rows = CorpusQueries.hll1Distinct(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("v_zero") > 0L, "31-token vocab leaves empty registers")
      val (est, exact) = (r.getAs[Long]("hll_est"), r.getAs[Long]("exact_distinct"))
      // LC on v_zero > 0 is near-exact at n << m
      assert(math.abs(est - exact) <= math.max(3L, exact / 5),
        s"${r.getAs[String]("scope")}: LC estimate $est far from $exact")
    }
  }

  test("hll1: registers merge losslessly - ALL equals a from-scratch build") {
    // mergeability is THE property: max-merged per-lang registers must be
    // byte-identical to registers built over the un-grouped stream
    val tok = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("lang").as("scope"), explode(split(col("text"), " ")).as("w"))
    val perLang = graft.operators.Sketch.hllRegisters(tok, col("w"), Seq("scope"))
    val merged = perLang.groupBy("bucket").agg(max("rho").as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = graft.operators.Sketch.hllRegisters(
        tok.select(lit("g").as("g"), col("w")), col("w"), Seq("g"))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(merged === direct)
  }

  test("dq6: a genuinely shifted crawl trips the PSI band") {
    // old snapshot (ids not divisible by 3) speaks one vocabulary, the
    // new snapshot a disjoint one - the boilerplate-flood / language-flip
    // case the drift gate exists to catch
    val dir = docsDir(Seq(
      (1L, "alpha beta gamma alpha beta"), (2L, "alpha beta gamma gamma"),
      (4L, "alpha beta alpha gamma"), (5L, "beta gamma alpha beta"),
      (0L, "zulu yankee xray zulu"), (3L, "zulu xray yankee yankee")), "dq6s")
    val r = Relational.dq6PsiDrift(spark, dir).collect().head
    assert(r.getAs[Long]("n_bins") === 64L)
    assert(r.getAs[String]("band") === "shifted", s"psi = ${r.getAs[Long]("psi_e9")}")
    assert(r.getAs[Long]("psi_e9") > 250000000L)
    assert(r.getAs[Long]("worst_term_e9") > 0L)
  }

  test("dq6: the same generator distribution reads stable on real data") {
    val r = Relational.dq6PsiDrift(spark, "/root/testdata/sf0.001").collect().head
    assert(r.getAs[Long]("n_bins") === 64L)
    assert(r.getAs[String]("band") === "stable")
    assert(r.getAs[Long]("psi_e9") >= 0L && r.getAs[Long]("psi_e9") < 100000000L)
    assert(r.getAs[Long]("n_old") > 0L && r.getAs[Long]("n_new") > 0L)
  }

  test("a31: Wilson intervals contain the rate, stay in [0,1], and hit exact endpoints") {
    val rows = CurationQueries.a31WilsonGate(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var worstWidth = 0L
    var allWidth = Long.MaxValue
    rows.foreach { r =>
      val (lo, hi, rate) = (r.getAs[Long]("wilson_lo_e6"),
        r.getAs[Long]("wilson_hi_e6"), r.getAs[Long]("rate_e6"))
      assert(lo >= 0L && hi <= 1000000L, "Wilson never leaves [0,1] - the Wald flaw it fixes")
      assert(lo <= rate && rate <= hi, s"interval [$lo,$hi] must contain $rate")
      if (r.getAs[String]("lang") == "ALL") allWidth = hi - lo else worstWidth = math.max(worstWidth, hi - lo)
    }
    assert(allWidth < worstWidth, "the pooled interval must be narrower than the worst subgroup")
  }

  test("a31: degenerate rates give exact interval endpoints") {
    // Wilson with p-hat = 0 has lo exactly 0; with p-hat = 1, hi exactly 1
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("a31d").toString
    (Seq((1L, "xx", 10L), (2L, "xx", 20L), (3L, "yy", 900L), (4L, "yy", 900L)))
      .toDF("doc_id", "lang", "n_chars")
      .withColumn("text", lit("t")).withColumn("source", lit("s"))
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val rows = CurationQueries.a31WilsonGate(spark, tmp).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("wilson_lo_e6"), r.getAs[Long]("wilson_hi_e6"))).toMap
    assert(rows("xx")._1 === 0L, "all-fail group: lo must be exactly 0")
    assert(rows("yy")._2 === 1000000L, "all-pass group: hi must be exactly 1e6")
  }

  test("e2e5: the composed RAG pipeline selects from ir4's pool, relevance-first") {
    val dir = "/root/testdata/sf0.001"
    val sel = SimilarityQueries.e2e5RagPipeline(spark, dir).collect()
    assert(sel.length === 8)
    val ids = sel.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length === 8, "greedy must never re-select")
    val poolIds = SimilarityQueries.ir4HybridAnn(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    ids.foreach(id => assert(poolIds.contains(id), s"$id not in the ir4 pool"))
    // step 1 is pure relevance: the rank-normalized top doc (rel_e6 = 1e6)
    val first = sel.find(_.getAs[Int]("step") == 1).get
    assert(first.getAs[Long]("rel_e6") === 1000000L)
    assert(first.getAs[Long]("mmr_e6") === 750000L, "step 1 mmr = floor(3/4 * 1e6)")
    // the penalty term is bounded by the cosine range: a pick similar to
    // the selected set loses up to 250000 (floor(1e6/4)); an ANTI-similar
    // pick (negative cosine) may gain up to the same — MMR by the formula
    sel.foreach { r =>
      val relw = (r.getAs[Long]("rel_e6") * 3) / 4
      val mmr = r.getAs[Long]("mmr_e6")
      assert(mmr <= relw + 250000L && mmr >= relw - 250000L,
        s"step ${r.getAs[Int]("step")}: mmr $mmr outside [$relw ± 250000]")
    }
  }

  test("dd17: blocking finds substitutions/insertions, verify kills transpositions") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dd17f").toString
    // cat~bat: substitution (dist 1). cat~cart: insertion (dist 1).
    // ab~ba: transposition - shares deletion variants 'a'/'b' but dist 2:
    // the blocking FALSE POSITIVE the levenshtein verify must remove.
    // dog~fox: dist 3, never even blocked.
    Seq("cat bat", "cart ab", "ba dog", "fox cat")
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name").coalesce(1)
      .write.parquet(s"$tmp/part.parquet")
    val pairs = DedupQueries.dd17FuzzyNames(spark, tmp).collect()
      .map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b"))).toSet
    // ba~bat is also a genuine insertion pair the fixture happens to carry
    assert(pairs === Set(("bat", "cat"), ("cart", "cat"), ("ba", "bat")),
      s"got $pairs")
    assert(!pairs.contains(("ab", "ba")),
      "transposition ab~ba shares deletion variants but is distance 2 - verify must reject")
  }

  test("dd17: real part names yield verified distance-1 pairs with support") {
    val rows = DedupQueries.dd17FuzzyNames(spark, "/root/testdata/sf0.001").collect()
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("tok_a"), r.getAs[String]("tok_b"))
      assert(a < b)
      assert(r.getAs[Long]("n_parts_a") > 0 && r.getAs[Long]("n_parts_b") > 0)
      assert(r.getAs[Long]("shared_variants") >= 1)
    }
  }

  test("a32: rho reconstructs from its own sufficient statistics and stays in range") {
    val r = TextQueries.a32RankCorr(spark, "/root/testdata/sf0.001").collect().head
    val n = r.getAs[Long]("n_docs").toDouble
    // sum_d2 emits as a canonical digit string since r12 (decimal outputs
    // diverge at the driver's hash layer; see OutputSchemaGateSpec)
    val d2 = BigInt(r.getAs[String]("sum_d2")).toDouble
    val rho = r.getAs[Long]("rho_e6")
    assert(rho >= -1000000L && rho <= 1000000L)
    val expect = math.round(1e6 * (1.0 - 6.0 * d2 / (n * (n * n - 1.0))))
    assert(rho === expect, s"rho $rho != reconstructed $expect")
    val ov = r.getAs[Long]("top20_overlap")
    assert(ov >= 0L && ov <= 20L)
    // two lexical rankers over the same query must agree far above chance
    assert(rho > 0L && ov >= 10L)
  }

  test("ev14: rolled registers equal a from-scratch build over the 7-day union") {
    // the sketch-merge contract: max-merging daily registers must be
    // BYTE-identical to building one register table over the span's events
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val lastDay = ev.agg(max("day")).collect().head.getDate(0)
    val span = ev.filter(col("day") >= date_sub(lit(lastDay), 6))
    val direct = graft.operators.Sketch.hllRegisters(
        span.select(lit("s").as("g"), col("user_id")), col("user_id"), Seq("g"))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val daily = graft.operators.Sketch.hllRegisters(span, col("user_id"), Seq("day"))
    val merged = daily.groupBy("bucket").agg(max("rho").as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged === direct)
  }

  test("ev14: the rolling estimate dominates the daily and tracks the exact counts") {
    val rows = EventQueries.ev14HllRolling(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hll_7d") >= r.getAs[Long]("hll_1d"),
        "merged registers dominate daily registers pointwise")
      assert(r.getAs[Long]("exact_7d") >= r.getAs[Long]("exact_1d"))
      // 15-user corpus sits deep in the linear-counting regime: near-exact
      assert(math.abs(r.getAs[Long]("hll_1d") - r.getAs[Long]("exact_1d")) <= 3L)
    }
  }

  test("a33: the aggregated kappa equals the textbook per-unit computation") {
    val dir = "/root/testdata/sf0.001"
    val r = TextQueries.a33FleissKappa(spark, dir).collect().head
    // reimplement Fleiss 1971 the slow way from the same label model
    val docs = graft.Tables(spark, dir, "documents").select("doc_id")
      .withColumn("r", explode(expr("sequence(0, 2)")))
      .withColumn("true_c", graft.queries.Q.detHash(col("doc_id"), 41) % 4)
      .withColumn("label",
        when(graft.queries.Q.detHash(col("doc_id") * 3 + col("r"), 43) % 5 === 0,
          (col("true_c") + 1) % 4).otherwise(col("true_c")))
      .select("doc_id", "label").collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val byUnit = docs.groupBy(_._1).values.toSeq
    val n = 3.0
    val pis = byUnit.map { u =>
      val counts = u.groupBy(_._2).values.map(_.size)
      (counts.map(c => c * c).sum - n) / (n * (n - 1.0))
    }
    val pbar = pis.sum / pis.length
    val total = docs.length.toDouble
    val pjs = docs.groupBy(_._2).values.map(_.size / total)
    val pe = pjs.map(p => p * p).sum
    val kappa = (pbar - pe) / (1.0 - pe)
    assert(r.getAs[Long]("n_units") === byUnit.length.toLong)
    assert(math.abs(r.getAs[Long]("pbar_e6") - math.round(pbar * 1e6)) <= 1L)
    assert(math.abs(r.getAs[Long]("pe_e6") - math.round(pe * 1e6)) <= 1L)
    assert(math.abs(r.getAs[Long]("kappa_e6") - math.round(kappa * 1e6)) <= 1L,
      s"query ${r.getAs[Long]("kappa_e6")} vs textbook ${math.round(kappa * 1e6)}")
    // 20% per-rater flip noise puts agreement in the substantial band
    assert(r.getAs[Long]("kappa_e6") > 300000L && r.getAs[Long]("kappa_e6") < 900000L)
  }

  test("pk4: the crafted instance where best-fit-decreasing beats next-fit") {
    // budget 256. NF in doc order: [150][130+100][76+50] = 3 bins.
    // BFD desc: 150+100=250, 130+76+50=256 = 2 bins.
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val dir = docsDir(Seq(
      (0L, words(150)), (1L, words(130)), (2L, words(100)),
      (3L, words(76)), (4L, words(50))), "pk4f")
    val r = CurationQueries.pk4BfdPack(spark, dir).collect().head
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_tokens") === 506L)
    assert(r.getAs[Long]("bins_nf") === 3L)
    assert(r.getAs[Long]("bins_bfd") === 2L)
    assert(r.getAs[Long]("bins_saved") === 1L)
  }

  test("pk4: both packings respect the capacity lower bound on real data") {
    val rows = CurationQueries.pk4BfdPack(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lb = (r.getAs[Long]("n_tokens") + 255L) / 256L
      assert(r.getAs[Long]("bins_bfd") >= lb, "no packing beats ceil(tokens/budget)")
      assert(r.getAs[Long]("bins_nf") >= r.getAs[Long]("bins_bfd") - 1,
        "NF catastrophically better than BFD would mean a fold bug")
      assert(r.getAs[Long]("bins_saved") ===
        r.getAs[Long]("bins_nf") - r.getAs[Long]("bins_bfd"))
    }
  }

  test("tok7: the coverage curve hits exact hand-computed thresholds") {
    // chars: a x90, b x9, ' ' x1, c x1 (total 101, alphabet 4)
    // 90%: a alone covers 90/101 < 0.90 -> need 2; 99%: need 3; 99.95%: all 4
    val dir = docsDir(Seq((0L, "a" * 90), (1L, ("b" * 9) + " c")), "tok7f")
    val rows = CorpusQueries.tok7CharCoverage(spark, dir).collect()
      .map(r => r.getAs[Long]("thr_e4") ->
        (r.getAs[Int]("n_chars"), r.getAs[Long]("cum_cnt"))).toMap
    assert(rows(9000L) === ((2, 99L)))
    assert(rows(9900L) === ((3, 100L)))
    assert(rows(9995L) === ((4, 101L)))
  }

  test("tok7: monotone coverage on real data") {
    val rows = CorpusQueries.tok7CharCoverage(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 3)
    val byThr = rows.sortBy(_.getAs[Long]("thr_e4"))
    assert(byThr.sliding(2).forall { case Array(a, b) =>
      a.getAs[Int]("n_chars") <= b.getAs[Int]("n_chars") &&
        a.getAs[Long]("cum_cnt") <= b.getAs[Long]("cum_cnt") })
    rows.foreach(r => assert(r.getAs[Long]("cum_cnt") <= r.getAs[Long]("total_chars")))
  }

  test("a30: a two-pair micro corpus exercises the with-replacement draw") {
    // candidate 0 == reference 1 (perfect pair 0); candidate 2 disjoint
    // from reference 3 (zero pair 1): every resample's corpus BLEU is a
    // mix decided by the seeded draw; identity-B must still tie exactly
    val dir = docsDir(Seq(
      (0L, "a b c d"), (1L, "a b c d"),
      (2L, "p q r s"), (3L, "w x y z")), "a30m")
    val r = TextQueries.bootstrapCore(spark, dir,
      "filter(tk, (x, i) -> true)").collect().head
    assert(r.getAs[Long]("wins_a") === 0L && r.getAs[Long]("wins_b") === 0L)
    assert(r.getAs[Long]("p_a_e6") === 1000000L)
  }
}
