package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant checks for the dedup query faces that go beyond the DuckDB
  * oracle replay (which pins exact values at sf0.01): dd14's rebuild must
  * be consistent with the source text it filtered. */
class DedupQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("native, per-row and grouped MinHash signatures are bit-identical") {
    import graft.operators.Dedup
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val grouped = Dedup.minhashSignaturesGrouped(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val native = Dedup.minhashSignatures(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val perRow = Dedup.minhashSignaturesPerRow(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(native.nonEmpty)
    assert(native === grouped)
    assert(perRow === grouped)
  }

  test("dd15: spans are disjoint, at least window-wide, and inside their document") {
    val w = DedupQueries.SubstrW.toLong
    val spans = DedupQueries.dd15ExactSubstr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.nonEmpty)
    val lens = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spans.foreach { case (d, a, b) =>
      assert(a >= 1 && b <= lens(d), s"span outside doc: ($d, $a, $b)")
      assert(b - a + 1 >= w, s"span narrower than the window: ($d, $a, $b)")
    }
    // interval merge contract: consecutive spans never overlap or touch
    spans.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          assert(s2 > e1 + 1, s"spans must be disjoint and non-adjacent: end=$e1 next=$s2")
        case _ =>
      }
    }
  }

  test("dd15: overlapping duplicated windows merge into one maximal span") {
    // crafted corpus (the testdata has no multi-span docs, so the merge path
    // needs its own fixture): doc 0 = 20 unique tokens; doc 1 copies its
    // tokens 3..10 (window start 3), doc 2 copies tokens 6..13 (start 6).
    // Starts 3 and 6 are 3 apart (< w = 8): as text they jointly cover
    // tokens 3..13, so dd15 must emit ONE span (3, 13) for doc 0 — the
    // pre-fix islands logic emitted overlapping (3,10) and (6,13).
    val spark0 = spark
    import spark0.implicits._
    val base = (1 to 20).map(i => s"u$i")
    val docs = Seq(
      (0L, base.mkString(" ")),
      (1L, base.slice(2, 10).mkString(" ")),  // tokens 3..10
      (2L, base.slice(5, 13).mkString(" "))   // tokens 6..13
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("dd15merge").toString
    docs.coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val spans = DedupQueries.dd15ExactSubstr(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((0L, 3L, 13L), (1L, 1L, 8L), (2L, 1L, 8L)))
  }

  test("dd15: plan shape — dup flag is agg + semi-join, never a shingle-partitioned window") {
    // The scale contract from SCALE.md: under a hot boilerplate shingle,
    // every stage must have bounded partitions. A `count over (partition by
    // s)` window pins the hot shingle's entire group in one un-splittable
    // task (windows get no AQE skew rewrite); the agg+semi-join spelling is
    // bounded by map-side combine (agg) and AQE skew split (SMJ). This test
    // pins that spelling in the physical plan so it cannot silently regress.
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      // the bare lazy plan — the production dd15ExactSubstr face routes
      // through SessionShare.materialized (r8), whose executed plan is a
      // checkpoint scan; the structure being pinned lives in dd15SpansPlan
      val plan = DedupQueries.dd15SpansPlan(spark, dir).queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, "islands stage should still be a window")
      windows.foreach { w =>
        val keys = w.partitionSpec.flatMap(_.references.toSeq).map(_.name).toSet
        assert(keys == Set("doc_id"),
          s"window partition keys must be exactly doc_id (bounded by doc length), got $keys")
      }
      val semiJoins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(semiJoins.nonEmpty, "dup flag must join positions back onto the >1 set")
      val shingleAggs = plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.groupingExpressions.exists(_.references.exists(_.name == "s")) => a
      }
      assert(shingleAggs.nonEmpty,
        "dup counting must be a groupBy on the shingle (map-side combinable)")
    } finally prior match {
      case Some(v) => spark.conf.set(aqeKey, v)
      case None => spark.conf.unset(aqeKey)
    }
  }

  test("dd16: cut accounting is exact and untouched docs keep their text hash") {
    val spans = DedupQueries.dd15ExactSubstr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(s => s._3 - s._2 + 1).sum).toMap
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"),
        substring(md5(col("text")), 1, 16).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val out = DedupQueries.dd16SpanCut(spark, dir).collect()
    assert(out.length === docs.size, "every document must emit a row")
    out.foreach { r =>
      val (d, nTok, nKept, hash) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(nTok === docs(d)._1, s"token count mismatch for doc $d")
      // spans are disjoint (dd15 contract), so the cut size is their sum
      assert(nKept === nTok - spans.getOrElse(d, 0L),
        s"doc $d: kept $nKept != $nTok - ${spans.getOrElse(d, 0L)}")
      if (!spans.contains(d))
        assert(hash === docs(d)._2, s"untouched doc $d must keep its text hash")
    }
    assert(spans.nonEmpty, "fixture regression: nothing was cut")
  }

  test("dd14: untouched docs rebuild to exactly their original text") {
    val out = DedupQueries.dd14LineDedup(spark, dir)
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        substring(md5(col("text")), 1, 16).as("orig_hash"),
        size(split(col("text"), " ")).cast("long").as("orig_tokens"))
    val joined = out.join(docs, Seq("doc_id")).cache()
    try {
      // a doc whose segments all survive must hash to its original text —
      // proves segmentation+reassembly is lossless, not just plausible
      val untouched = joined.filter(col("n_kept") === col("n_segs"))
      assert(untouched.count() > 0, "fixture regression: no untouched docs")
      assert(untouched.filter(col("kept_hash") =!= col("orig_hash")).count() === 0L)
      assert(untouched.filter(col("kept_tokens") =!= col("orig_tokens")).count() === 0L)
      // and the filter actually fires somewhere (kept < segs for some doc)
      assert(joined.filter(col("n_kept") < col("n_segs")).count() > 0,
        "fixture regression: boilerplate filter never fired")
      // kept counts are sane everywhere
      assert(joined.filter(col("n_kept") > col("n_segs") ||
        col("kept_tokens") > col("orig_tokens")).count() === 0L)
    } finally joined.unpersist()
  }

  test("sm10: no Jaccard-verified near-dup pair ever straddles the fold boundary") {
    val folds = DedupQueries.sm10LeakageSafeSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // every doc gets exactly one fold, and both folds are populated
    assert(folds.size === graft.Tables(spark, dir, "documents").count())
    assert(folds.values.toSet === Set("train", "test"))
    // the contract: members of one dd8 cluster share one fold, so the
    // verified duplicate pairs (the edges) cannot cross it
    val clusters = DedupQueries.dd8Clusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.nonEmpty, "fixture regression: corpus has no dup clusters")
    clusters.groupBy(_._2).values.foreach { members =>
      val fs = members.map(m => folds(m._1)).distinct
      assert(fs.length === 1,
        s"cluster ${members.head._2} straddles folds: ${members.mkString(",")}")
    }
    // and a naive per-doc hash split WOULD have disagreed with the
    // cluster-keyed fold for some member — i.e. sm10 does real work here
    val multi = clusters.groupBy(_._2).values.filter(_.length > 1).toSeq
    assert(multi.nonEmpty, "fixture regression: no multi-doc clusters")
    val spark0 = spark
    import spark0.implicits._
    val ownTrain = multi.flatten.map(_._1).toDF("id")
      .select(col("id"), (Q.detHash(col("id"), 73) % 10 < 8).as("t")) // 73 = sm10's fold seed
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(multi.exists(_.exists(m => (folds(m._1) == "train") != ownTrain(m._1))),
      "fixture too weak: per-doc folds happen to equal cluster folds everywhere")
  }
}
