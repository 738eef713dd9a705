package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("ta16: hand-computed interpolated Kneser-Ney NLL on a closed corpus") {
    // train (ids 0..3): "a b a b" ×4 → bigrams (a,b):8, (b,a):4;
    // contexts c(a)=8, c(b)=4; N1+(a·)=N1+(b·)=1; N1+(·a)=N1+(·b)=1;
    // N1+(··)=2; V=2. test (id 4): "a b" → one transition (a,b):
    // p_cont(b) = (1+1)/(2+2) = 0.5
    // p = (8−0.75)/8 + 0.75·1/8·0.5 = 0.90625 + 0.046875 = 0.953125
    val dir = docsDir((0L to 3L).map(i => (i, "a b a b")) :+ (4L, "a b"), "ta16g")
    val rows = CurationQueries.ta16KnPpl(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 1L)
    val want = math.round(-math.log(0.953125) * 1e6)
    assert(r.getLong(2) === want)
    assert(r.getLong(3) === want)
  }

  test("ta16: the Francisco effect — high-frequency single-context words score low on new contexts") {
    // 'x' is FREQUENT but only ever follows 'san'; 'y' is rarer but appears
    // after many contexts. For the unseen transition (q, ·): JM (ta14)
    // backs off to raw frequency and prefers x; KN backs off to
    // continuation count and must prefer y.
    val train = (0L to 3L).map(i => (i,
      "san x san x san x san x a y b y c y d y q r"))
    def meanFor(test: String): Long =
      CurationQueries.ta16KnPpl(spark,
        docsDir(train :+ (4L, test), s"ta16f${test.hashCode.abs}")).collect()
        .head.getLong(3)
    val viaX = meanFor("q x")
    val viaY = meanFor("q y")
    assert(viaY < viaX,
      s"KN must score the many-context word cheaper after an unseen context: y=$viaY x=$viaX")
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

  private def labeledDocsDir(rows: Seq[(Long, String, Long)], tag: String): String = {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory(tag).toString
    rows.toDF("doc_id", "text", "n_chars").coalesce(1)
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("ta17: NB recovers a word-separable quality signal on held-out docs") {
    // class 1 (n_chars >= 256) speaks alpha/beta/gamma, class 0 zeta/eta/theta;
    // ids 0-3, 5-8 train, 4 and 9 are the held-out 20%
    val good = "alpha beta gamma alpha beta"
    val bad = "zeta eta theta zeta eta"
    val dir = labeledDocsDir(Seq(
      (0L, good, 300L), (1L, bad, 100L), (2L, good, 300L), (3L, bad, 100L),
      (5L, good, 300L), (6L, bad, 100L), (7L, good, 300L), (8L, bad, 100L),
      (4L, good, 300L), (9L, bad, 100L)), "ta17s")
    val rows = CurationQueries.ta17NbQuality(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(4L, 9L))
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(4L).getAs[Int]("label") === 1)
    assert(byId(4L).getAs[Int]("pred") === 1, "good-vocabulary doc must score as class 1")
    assert(byId(9L).getAs[Int]("label") === 0)
    assert(byId(9L).getAs[Int]("pred") === 0, "bad-vocabulary doc must score as class 0")
    // NLLs are sums of -ln p terms: strictly positive, and the chosen
    // class is strictly cheaper on this cleanly separable corpus
    assert(byId(4L).getAs[Long]("nll1_e6") > 0L)
    assert(byId(4L).getAs[Long]("nll1_e6") < byId(4L).getAs[Long]("nll0_e6"))
    assert(byId(9L).getAs[Long]("nll0_e6") < byId(9L).getAs[Long]("nll1_e6"))
  }

  test("pk3: bins respect the budget, number contiguously, and are greedily maximal") {
    val rows = CurationQueries.pk3NextfitPack(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._2, r._3)).foreach { case ((grp, bin), docs) =>
      val load = docs.map(_._4).sum
      // a bin holds the budget, or exactly one oversize doc
      assert(load <= 256L || docs.length === 1,
        s"multi-doc bin ($grp,$bin) over budget: $load")
    }
    rows.groupBy(_._2).foreach { case (grp, docs) =>
      val bins = docs.map(_._3).distinct.sorted.toSeq
      assert(bins === (0L until bins.length).toSeq,
        s"group $grp bins not contiguous from 0: $bins")
      // greedy maximality: the first doc of bin b+1 would not have fit in b
      val byBin = docs.groupBy(_._3)
      bins.sliding(2).foreach {
        case Seq(b1, b2) =>
          val load1 = byBin(b1).map(_._4).sum
          val firstNext = byBin(b2).minBy(_._1)._4
          assert(load1 + firstNext > 256L,
            s"group $grp: bin $b2 opened while $b1 had room")
        case _ =>
      }
    }
    // the packing is non-trivial on this corpus: some bin holds >1 doc,
    // and some group has >1 bin
    assert(rows.groupBy(r => (r._2, r._3)).values.exists(_.length > 1))
    assert(rows.groupBy(_._2).values.exists(_.map(_._3).distinct.length > 1))
  }

  test("a27: identical generations score Self-BLEU 1e6; disjoint ones score 0") {
    // mode collapse: two identical candidates (odd ids are references for
    // a22 and invisible to a27's even-id sample)
    val dup = docsDir(Seq((0L, "a b c d"), (2L, "a b c d")), "a27d")
    TextQueries.a27SelfBleu(spark, dup).collect().foreach { r =>
      assert(r.getAs[Long]("n_refs") === 1L)
      assert(r.getAs[Long]("self_bleu_e6") === 1000000L)
    }
    // full diversity: zero shared unigrams drives p1 (and so BLEU) to 0
    val div = docsDir(Seq((0L, "a b c d"), (2L, "w x y z")), "a27v")
    TextQueries.a27SelfBleu(spark, div).collect().foreach { r =>
      assert(r.getAs[Long]("self_bleu_e6") === 0L)
    }
  }

  test("a28: identical pair embeddings score cosine 1e6; orthogonal score 0") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("a28").toString
    def pad(v: Seq[Float]): Array[Float] = (v ++ Seq.fill(64 - v.length)(0.0f)).toArray
    Seq(
      (0L, pad(Seq(1.0f, 2.0f)), 0), (1L, pad(Seq(1.0f, 2.0f)), 0), // pair 0: same
      (2L, pad(Seq(1.0f, 0.0f)), 0), (3L, pad(Seq(0.0f, 1.0f)), 0)  // pair 1: orthogonal
    ).toDF("vec_id", "embedding", "label").coalesce(1)
      .write.parquet(s"$tmp/embeddings.parquet")
    val rows = SimilarityQueries.a28EmbedSim(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(0L -> 1000000L, 1L -> 0L))
  }

  test("al10: radii shrink monotonically and every center is distinct") {
    val rows = ALQueries.al10Kcenter(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[Long]("vec_id"), r.getAs[Long]("radius_e9")))
    assert(rows.length === 8)
    assert(rows.head === ((1, 0L, 0L)), "seed is vec 0 with radius 0")
    assert(rows.map(_._2).distinct.length === 8)
    val radii = rows.drop(1).map(_._3)
    assert(radii === radii.sorted(Ordering[Long].reverse),
      "max-min distance can only shrink as centers accumulate")
    assert(radii.forall(_ > 0L))
  }

  test("al10: three separated clusters are each covered before any is revisited") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("al10c").toString
    def pad(v: Seq[Float]): Array[Float] = (v ++ Seq.fill(64 - v.length)(0.0f)).toArray
    // cluster A near the origin (seed lives here), B on axis 0, C on axis 1
    Seq(
      (0L, pad(Seq(0.0f, 0.0f)), 0), (1L, pad(Seq(0.2f, 0.0f)), 0),
      (2L, pad(Seq(10.0f, 0.0f)), 0), (3L, pad(Seq(10.2f, 0.0f)), 0),
      (4L, pad(Seq(0.0f, 10.0f)), 0), (5L, pad(Seq(0.0f, 10.2f)), 0)
    ).toDF("vec_id", "embedding", "label").coalesce(1)
      .write.parquet(s"$tmp/embeddings.parquet")
    val rows = ALQueries.al10Kcenter(spark, tmp).collect()
      .map(r => r.getAs[Long]("vec_id"))
    assert(rows.length === 6, "pool exhaustion must stop the greedy cleanly")
    // the first three picks must hit all three clusters exactly once
    val cluster = Map(0L -> "A", 1L -> "A", 2L -> "B", 3L -> "B", 4L -> "C", 5L -> "C")
    assert(rows.take(3).map(cluster).toSet === Set("A", "B", "C"),
      s"first three centers must cover all clusters, got ${rows.take(3)}")
  }

  test("tok6: the declarative Viterbi equals exhaustive minimal segmentation") {
    val dir = "/root/testdata/sf0.001"
    val rows = CorpusQueries.tok6UnigramSeg(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 20)
    // rebuild the piece cost table exactly like the query does
    val pf = CorpusQueries.bpeLearned(spark, dir)._2
      .select(col("freq"), explode(col("syms")).as("p"))
      .groupBy("p").agg(sum("freq").as("pf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = pf.values.sum
    val lp = pf.map { case (p, f) =>
      p -> math.round(math.log(f.toDouble / tot.toDouble) * -1e6)
    }
    val unk = math.round(math.log((tot + 1).toDouble) * 1e6)
    // exhaustive enumeration of every piece decomposition (parts <= 4);
    // exponential, so only run it where it's cheap — which covers the
    // whole synthetic vocabulary
    def enum(w: String): Long =
      if (w.isEmpty) 0L
      else (1 to math.min(4, w.length)).flatMap { k =>
        val c = lp.get(w.take(k)).orElse(if (k == 1) Some(unk) else None)
        c.map(_ + enum(w.drop(k)))
      }.min
    rows.foreach { case (word, _, wlen, nll) =>
      assert(wlen <= 20L)
      if (wlen <= 14) {
        assert(nll === enum(word.take(20)),
          s"DP diverges from exhaustive enumeration on '$word'")
      }
      assert(nll > 0L, s"'$word' must have positive NLL")
    }
    assert(rows.exists(_._3 <= 14L), "fixture regression: no enumerable words")
  }

  test("e2e4: gate, leakage-safe folds, and packing compose consistently") {
    val dir = "/root/testdata/sf0.001"
    val rows = CurationQueries.e2e4PrepPipeline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = graft.Tables(spark, dir, "documents").count()
    assert(rows.nonEmpty && rows.length < total,
      "the quality gate must fire somewhere without emptying the corpus")
    assert(rows.map(_._1).distinct.length === rows.length, "one bin per doc")
    // fold assignment must agree with the standalone sm10 face
    val sm10 = DedupQueries.sm10LeakageSafeSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    rows.foreach { case (id, fold, _, _, _) =>
      assert(fold === sm10(id), s"doc $id fold diverges from sm10")
    }
    // packing invariants within each (fold, grp): budget and contiguity
    rows.groupBy(r => (r._2, r._3, r._4)).foreach { case ((f, g, b), docs) =>
      assert(docs.map(_._5).sum <= 256L || docs.length === 1,
        s"multi-doc bin ($f,$g,$b) over budget")
    }
    rows.groupBy(r => (r._2, r._3)).foreach { case ((f, g), docs) =>
      val bins = docs.map(_._4).distinct.sorted.toSeq
      assert(bins === (0L until bins.length).toSeq,
        s"($f,$g) bins not contiguous from 0: $bins")
    }
    // both folds survive the gate on this corpus
    assert(rows.map(_._2).toSet === Set("train", "test"))
  }

  test("sm11: caps saturate, the remainder splits equally, and nothing overspends") {
    val rows = CurationQueries.sm11Unimax(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val budget = rows.map(_._2).sum * 16L / 10L
    rows.foreach { case (lang, n, capacity, capped, alloc, e6) =>
      assert(capacity === n * 2L, s"$lang capacity")
      assert(alloc <= capacity, s"$lang exceeds its repeat cap")
      if (capped == 1) assert(alloc === capacity, s"$lang marked capped but unsaturated")
      assert(e6 <= 2_000_000L, s"$lang exceeds 2 epochs")
    }
    val spent = rows.map(_._5).sum
    assert(spent <= budget, "allocation overspends the budget")
    // unallocated = only the floor-division remainder (< #langs tokens)
    assert(budget - spent < rows.length.toLong, s"left $spent of $budget on the table")
    val uncapped = rows.filter(_._4 == 0)
    assert(uncapped.nonEmpty && rows.exists(_._4 == 1),
      "the 1.6-epoch budget must exercise both regimes on this corpus")
    assert(uncapped.map(_._5).distinct.length === 1,
      "water-filled languages must share equally")
    val share = uncapped.head._5
    rows.filter(_._4 == 1).foreach { c =>
      assert(c._3 <= share, "water level: every saturated cap sits at or below the share")
    }
  }

  test("ta17: unseen test-only words back off by add-one in both classes") {
    // the single test doc is entirely OOV: both class scores reduce to
    // prior + n·(-ln(1/(T_c+V))) — finite, and pred follows the prior side
    // of the tie-break chain rather than faulting
    val dir = labeledDocsDir(Seq(
      (0L, "alpha beta", 300L), (1L, "zeta eta", 100L),
      (2L, "alpha beta", 300L), (3L, "zeta eta", 100L),
      (4L, "unseen words only", 300L)), "ta17o")
    val r = CurationQueries.ta17NbQuality(spark, dir).collect().head
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Long]("nll1_e6") > 0L && r.getAs[Long]("nll0_e6") > 0L)
    assert(Set(0, 1).contains(r.getAs[Int]("pred")))
  }

  test("a29: bin placement, Murphy inequality, and base rate hold on real data") {
    val rows = ALQueries.a29Brier(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bin, n) = (r.getAs[Int]("bin"), r.getAs[Long]("n"))
      val meanF = r.getAs[Long]("mean_f_e6")
      val obs = r.getAs[Long]("obs_e6")
      assert(n > 0 && obs >= 0 && obs <= 1000000)
      // the floor-divided bin mean must live inside its own bin's range
      // (bin 9 absorbs everything above 900k incl. fe6 = 1e6)
      assert(meanF >= bin * 100000L && meanF < (if (bin == 9) 1000001L else (bin + 1) * 100000L),
        s"bin $bin mean $meanF out of range")
    }
    // Murphy: BS = REL − RES + UNC + within-bin-variance, WBV ≥ 0 — so the
    // summed integer components must satisfy the inequality up to the
    // documented floor-division slack (each of ~3 divs loses < 1 e6-unit,
    // amplified by the squared terms: ≤ ~2e6 per bin per term)
    // the e12 components accumulate in DECIMAL(38,0) internally (r11) but
    // emit as canonical digit strings (r12 — DecimalType outputs diverge at
    // the driver's hash layer; see OutputSchemaGateSpec)
    def dec(r: org.apache.spark.sql.Row, c: String): BigInt =
      BigInt(r.getAs[String](c))
    val sqErr = rows.map(dec(_, "sq_err_e12")).sum
    val rel = rows.map(dec(_, "rel_num_e12")).sum
    val res = rows.map(dec(_, "res_num_e12")).sum
    val nTot = rows.map(_.getAs[Long]("n")).sum
    val unc = rows.head.getAs[Long]("unc_e12")
    val slack = BigInt(rows.length) * 4L * 2000000L
    assert(sqErr >= rel - res + BigInt(nTot) * BigInt(unc) - slack,
      s"Murphy inequality violated: BS·N=$sqErr vs REL−RES+N·UNC=${rel - res + BigInt(nTot) * BigInt(unc)}")
    // synthetic tags are uniform over 4 classes → base rate near 250000 e6
    val obar = rows.head.getAs[Long]("obar_e6")
    assert(obar > 150000L && obar < 350000L, s"obar_e6 = $obar")
  }

  test("ta18: a clean long doc keeps exactly the 3 surviving lines and passes") {
    // doc_id 1 trips neither page-level injection (1 % 7 != 0, 1 % 11 != 3)
    val dir = docsDir(Seq((1L, "alpha beta gamma delta epsilon")), "ta18c")
    val r = TextQueries.ta18C4Rules(spark, dir).collect().head
    assert(r.getAs[Int]("n_lines") === 6)
    assert(r.getAs[Int]("n_kept") === 3, "real line + exclamation + question survive")
    assert(r.getAs[Boolean]("rule_lorem") && r.getAs[Boolean]("rule_brace")
      && r.getAs[Boolean]("rule_min_sent") && r.getAs[Boolean]("pass"))
  }

  test("ta18: a short doc loses its content line and fails min-sentences") {
    // "tiny doc." is 2 words — dropped by the ≥5-word line rule → 2 kept < 3
    val dir = docsDir(Seq((1L, "tiny doc")), "ta18s")
    val r = TextQueries.ta18C4Rules(spark, dir).collect().head
    assert(r.getAs[Int]("n_kept") === 2)
    assert(!r.getAs[Boolean]("rule_min_sent") && !r.getAs[Boolean]("pass"))
  }

  test("ta18: the doc_id-keyed page-level kills fire on their subsets") {
    val dir = docsDir(Seq(
      (0L, "alpha beta gamma delta epsilon"),   // 0 % 7 == 0 → lorem ipsum
      (3L, "alpha beta gamma delta epsilon"),   // 3 % 11 == 3 → curly brace
      (1L, "alpha beta gamma delta epsilon")), "ta18k")
    val rows = TextQueries.ta18C4Rules(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!rows(0L).getAs[Boolean]("rule_lorem") && !rows(0L).getAs[Boolean]("pass"))
    assert(rows(0L).getAs[Int]("n_kept") === 4, "the lorem line itself survives line rules")
    assert(!rows(3L).getAs[Boolean]("rule_brace") && !rows(3L).getAs[Boolean]("pass"))
    assert(rows(1L).getAs[Boolean]("pass"))
  }
}
