package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the curation suite (exact values are oracle-checked by the
  * driver; these pin the semantic contracts). */
class CurationQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dq7: funnel chains exactly, starts at the corpus census, and matches the standalone gates") {
    val rows = CurationQueries.dq7FilterFunnel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === (0 to 4))
    rows.foreach { case (_, _, nIn, nKept, nDropped) =>
      assert(nIn === nKept + nDropped)
      assert(nKept >= 0 && nKept <= nIn)
    }
    // each stage's input is the previous stage's survivors
    rows.sliding(2).foreach { case Array((_, _, _, kept0, _), (_, _, in1, _, _)) =>
      assert(in1 === kept0)
    }
    val nDocs = graft.Tables(spark, dir, "documents").count()
    assert(rows.head === ((0, "ingest", nDocs, nDocs, 0L)))
    // stage 1 must agree with the standalone gopher battery
    val gopherKept = TextQueries.ta10GopherRules(spark, dir)
      .filter(col("pass")).count()
    assert(rows(1)._4 === gopherKept)
    // the funnel must be non-degenerate at this SF: something gets dropped,
    // something survives to the end
    assert(rows.last._4 > 0, "survivors must remain after the whole battery")
    assert(rows.map(_._5).sum > 0, "at least one stage must drop documents")
  }

  test("ta7KeepCol: the per-row repetition verdict equals ta7Core's keep corpus-wide") {
    import spark.implicits._
    val batch = CurationQueries.ta7Repetition(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(4) == 1)).toMap
    val perRow = graft.Tables(spark, dir, "documents")
      .withColumn("__toks", split(col("text"), " "))
      .select(col("doc_id"), CurationQueries.ta7KeepCol("__toks").as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(perRow.nonEmpty)
    batch.foreach { case (id, k) =>
      assert(perRow(id) === k, s"per-row verdict diverges from ta7Core for doc $id")
    }
    // both branches must fire on crafted rows: heavy repetition fails, a
    // sub-2-token doc (outside ta7Core's frame) gates to false
    val crafted = Seq(
      (1L, ("spam ham " * 40).trim),
      // 30 distinct words → 29 distinct bigrams: top_frac 1/29 ≈ 3.4% sits
      // under the 6% keep threshold (a 10-word doc would fail on 1/9)
      (2L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (3L, "solo"))
      .toDF("doc_id", "text")
      .withColumn("__toks", split(col("text"), " "))
      .select(col("doc_id"), CurationQueries.ta7KeepCol("__toks").as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(crafted(1L) === false, "a doc of one repeated bigram must fail the gate")
    assert(crafted(2L) === true, "an all-distinct doc must pass")
    assert(crafted(3L) === false, "sub-2-token docs gate to false")
  }

  test("pk1: packing is an exact partition of the concatenated token stream") {
    val rows = CurationQueries.pk1SequencePack(spark, dir)
      .select("n_tokens", "start_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._2)
    assert(rows.head._2 === 0L)
    rows.sliding(2).foreach {
      case Array((n0, s0), (_, s1)) => assert(s1 === s0 + n0)
      case _ =>
    }
    val total = rows.map(_._1).sum
    assert(rows.last._2 + rows.last._1 === total)
  }

  test("pk1: seq ids cover floor(start/B) .. floor(end-1/B)") {
    val bad = CurationQueries.pk1SequencePack(spark, dir)
      .filter(col("seq_first") =!= expr("start_tok div 128") ||
        col("seq_last") =!= expr("(start_tok + n_tokens - 1) div 128") ||
        col("seq_last") < col("seq_first"))
      .count()
    assert(bad === 0L)
  }

  test("ta7: fractions are in [0, 1e6] and modal share ≤ duplicated share or no dups") {
    val rows = CurationQueries.ta7Repetition(spark, dir)
      .select("top_frac_e6", "dup_frac_e6").collect()
    rows.foreach { r =>
      val (top, dup) = (r.getLong(0), r.getLong(1))
      assert(top >= 0 && top <= 1000000L)
      assert(dup >= 0 && dup <= 1000000L)
      // the modal bigram either repeats (so its share counts into dup) or
      // everything is unique (dup = 0)
      assert(dup === 0L || top <= dup)
    }
  }

  test("ta8: every injected doc has its email/phone/ip found and redacted") {
    val rows = CurationQueries.ta8PiiRedact(spark, dir).collect()
    rows.foreach { r =>
      val injected = r.getLong(0) % 3 == 0
      assert(r.getInt(1) === (if (injected) 1 else 0), s"email@${r.getLong(0)}")
      assert(r.getInt(2) === (if (injected) 1 else 0), s"phone@${r.getLong(0)}")
      assert(r.getInt(3) === (if (injected) 1 else 0), s"ip@${r.getLong(0)}")
      if (injected) {
        val tail = r.getString(4)
        assert(tail.contains("<EMAIL>") && tail.contains("<PHONE>") && tail.contains("<IP>"))
        assert(!tail.contains("@mail.example.com"))
      }
    }
  }

  test("ta9: OOV-free in-vocab tokens score below the OOV floor") {
    // every term's nll is at most the OOV term -ln(1/(T+V)); means inherit it
    val stats = CurationQueries.ta9UnigramPpl(spark, dir)
      .agg(max("mean_nll_e6"), min("mean_nll_e6"), count(lit(1))).head()
    assert(stats.getLong(2) > 0)
    assert(stats.getLong(1) > 0L, "nll is positive (probabilities < 1)")
  }

  test("sm5: over-represented groups are downsampled toward the uniform target") {
    val rows = CurationQueries.sm5DomainMixture(spark, dir)
      .select("lang", "n_docs", "n_kept").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (lang, (n, k)) =>
      assert(k <= n, s"$lang keeps more than it has")
    }
    // 'en' dominates the synthetic corpus → must actually shed docs
    val (enN, enK) = rows("en")
    assert(enK < enN, "dominant group must be downsampled")
  }

  test("sm6: per-group sample is exactly min(5, group size), keys descending, repartition-stable") {
    val df = CurationQueries.sm6WeightedSample(spark, dir)
    val rows = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(4)))
    val sizes = graft.Tables(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.length === math.min(5L, sizes(lang)).toInt, lang)
      val keys = rs.sortBy(_._2).map(_._4)
      assert(keys.zip(keys.tail).forall { case (a, b) => a >= b }, s"$lang keys not descending")
      assert(keys.forall(_ <= 0L), "ln(u)/w keys must be non-positive")
    }
    // determinism: same rows regardless of physical layout
    val again = CurationQueries.sm6WeightedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(4)))
    assert(again.toSeq === rows.toSeq)
  }

  test("set2: statuses partition the merged catalog deterministically") {
    val byStatus = CurationQueries.set2Upsert(spark, dir)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Tables(spark, dir, "documents")
    val nDocs = docs.count()
    val nUpd = docs.filter(col("doc_id") % 7 === 0).count()
    val nAdd = docs.filter(col("doc_id") % 11 === 3).count()
    assert(byStatus("updated") === nUpd)
    assert(byStatus("added") === nAdd)
    assert(byStatus("kept") === nDocs - nUpd)
  }

  test("e2e1: the gate fires, re-crawl copies are dropped, packing stays exact") {
    val rows = CurationQueries.e2e1CurationPipeline(spark, dir)
      .select("doc_id", "n_tokens", "start_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = graft.Tables(spark, dir, "documents").count()
    assert(rows.length < total, "the repetition gate must reject some docs")
    assert(rows.length > 0)
    assert(!rows.exists(_._1 >= 2000000L), "injected re-crawl copies must dedup away")
    val byStart = rows.sortBy(_._3)
    assert(byStart.head._3 === 0L)
    byStart.sliding(2).foreach {
      case Array((_, n0, s0), (_, _, s1)) => assert(s1 === s0 + n0)
      case _ =>
    }
  }

  test("pk2: overlapping chunks tile every document end to end") {
    val docLens = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = CurationQueries.pk2ChunkOverlap(spark, dir)
      .select("doc_id", "chunk_idx", "start_tok", "n_chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1)
    assert(chunks.nonEmpty)
    chunks.foreach { case (doc, cs) =>
      val n = docLens(doc)
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === 0, "first chunk starts at token 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 - a._3 === 48, "stride is constant")
        case _ =>
      }
      assert(sorted.forall(_._4 <= 64), "no chunk exceeds the window")
      assert(sorted.last._3 + sorted.last._4 === n, "last chunk reaches the end")
      assert(sorted.length === ((n - 1) / 48 + 1), "chunk count = ceil(n/stride)")
    }
  }

  test("e2e2: chunk-index counts partition and cross-doc dedup fires") {
    val rows = CurationQueries.e2e2ChunkIndex(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, n, canon, dup) =>
      assert(canon + dup === n, s"doc $doc: counts must partition")
      assert(canon >= 0L && dup >= 0L)
    }
    val totalChunks = CurationQueries.pk2ChunkOverlap(spark, dir).count()
    assert(rows.map(_._2).sum === totalChunks, "index covers every chunk exactly once")
    assert(rows.map(_._4).sum > 0L, "the corpus's duplicate docs must collapse some chunks")
  }

  test("v7: hashed features reconstruct token counts with bounded signed sums") {
    val rows = MLQueries.v7FeatureHash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, bucket, cnt, signed) =>
      assert(bucket >= 0L && bucket < 64L)
      assert(math.abs(signed) <= cnt, "signed sum can never exceed the bucket count")
    }
    val tokTotal = graft.Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " "))).count()
    assert(rows.map(_._3).sum === tokTotal, "bucket counts partition the token stream")
  }

  test("sm7: temperature sampling keeps a larger fraction of smaller domains") {
    val rows = CurationQueries.sm7TemperatureSample(spark, dir)
      .groupBy("lang").agg(max("n_lang").as("n"), max("target").as("t"), count(lit(1)).as("got"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, t, got) => assert(got === t, "emits exactly target rows per group") }
    // flattening: sampled fraction decreases as group size increases
    val byN = rows.sortBy(_._1).map { case (n, t, _) => t.toDouble / n }
    byN.sliding(2).foreach {
      case Array(fSmall, fBig) => assert(fSmall >= fBig - 1e-9,
        s"smaller domain must keep >= fraction: $fSmall < $fBig")
      case _ =>
    }
  }

  test("sm7: the isqrt weight is exactly floor(1e6*sqrt(n)) across the int64 domain") {
    // replays the query's seed+correct spelling (decimal-wide x and squares)
    // over a dense range, adversarial perfect squares, and group sizes far
    // past the 9.2e6 int64-overflow point of the naive 1e12*n, checking
    // w*w <= 1e12*n < (w+1)^2 — the invariant that makes sm7 independent
    // of any engine's sqrt
    val spark0 = spark
    import spark0.implicits._
    val ns = ((1L to 4096L) ++ Seq(9409L, 1000000L, 4000000L, 9000000L,
      9300000L, 123456789L, 987654321012L, 4000000000000000L,
      9223372036854775L,
      // the top of the int64 domain, where the seed error approaches the
      // ±1 correction's limit, plus a perfect square up there and its
      // off-by-one neighbours
      9223372030926249001L, 9223372030926249000L, 9223372030926249002L,
      Long.MaxValue - 1, Long.MaxValue)).toDF("n")
    val checked = ns
      .withColumn("x", col("n").cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * lit(1000000000000L))
      .withColumn("c", floor(sqrt(col("n").cast("double") * lit(1e12))).cast("long"))
      .withColumn("w", expr(
        """CASE WHEN (CAST(c AS DECIMAL(38,0))+1)*(CAST(c AS DECIMAL(38,0))+1) <= x THEN c+1
          |     WHEN CAST(c AS DECIMAL(38,0))*CAST(c AS DECIMAL(38,0)) > x THEN c-1
          |     ELSE c END""".stripMargin))
      .filter(expr(
        """NOT (CAST(w AS DECIMAL(38,0))*CAST(w AS DECIMAL(38,0)) <= x
          |  AND (CAST(w AS DECIMAL(38,0))+1)*(CAST(w AS DECIMAL(38,0))+1) > x)""".stripMargin))
    assert(checked.count() === 0L)
  }

  test("ev9: bucketized containment join is an equi-join, never a nested loop") {
    val df = EventQueries.ev9RangeBucketJoin(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must bucketize to an equi-join:\n$plan")
    // every window contains at least its own opening event
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 1L))
  }

  test("v8: negative sampler is an equi-join and every draw matches one slice") {
    val df = graft.queries.MLQueries.v8NegativeSampling(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the draw->slice containment join must be a hash equi-join on the
    // bucket key (the only tolerated nested-loop is the 1-row scalar-stats
    // cross join that feeds total_w/bw)
    assert(plan.contains("HashJoin [bkt"),
      s"draw->slice lookup must bucketize to a hash equi-join:\n$plan")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).distinct.length === rows.length,
      "each draw must land in exactly one weight slice")
    assert(rows.length === 100)
  }

  test("ev8: the as-of view is strictly earlier than its purchase") {
    val bad = EventQueries.ev8AsofJoin(spark, dir)
      .filter(col("last_view_us").isNotNull &&
        (col("last_view_us") >= col("purchase_us") || col("gap_s") < 0))
      .count()
    assert(bad === 0L)
  }
}
