package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-22 (optimization round 2) invariants:
  *
  *  1. `phashDelta`'s window pair legs join ONE representative per DISTINCT
  *     live-store signature (VERDICT r21 #1 — the serve-side sibling of
  *     r21's phashCounts fix): a bounded window against an
  *     identical-signature store cluster costs O(window + distinct), not
  *     O(window·c). The spec serves a 5k-dead window against a
  *     100k-identical live cluster (≈7.6·10⁸ join rows under the r21
  *     asset-keyed spelling) and asserts exact equality with the linear
  *     witness over the post-change signature set.
  *
  *  2. al10's per-round checkpoint is LAZY (VERDICT r21 #5): the argmax
  *     TakeOrdered materializes the round's pool in the SAME job, so the
  *     walk runs ~2 jobs per round (argmax + the new center's broadcast)
  *     instead of ~3 — pinned by a job-group-scoped listener count.
  *
  *  3. ss14's windowed feed generation reads the range-clustered
  *     `vec_feed` artifact with a pushed vec_id range (VERDICT r21 #3) and
  *     produces exactly the rows of the raw-table spelling it replaces.
  */
class R22OptimizationSpec extends SparkSpec {
  import spark.implicits._

  test("phashDelta: 5k window against a 100k-identical-signature store is representative-joined and exact") {
    import graft.operators.PersistedIndex
    val h = 0x5a3c96e1d24b78f0L
    val c = 100000
    val baseSigs = ((0 until c).map(i => (i.toLong, h)) :+
      ((9000000L, 0x1122334455667788L))) // one unrelated singleton
      .toDF("asset_id", "phash64")
    // fabricate a published v3 home whose rows ARE the linear build kernel's
    // answer over the base signatures (exactly what ensurePhashIndex persists)
    val home = java.nio.file.Files.createTempDirectory("phashdelta").resolve("idx")
    PersistedIndex.buildIfAbsent(home) { tmp =>
      MultimodalQueries.phashCounts(baseSigs)
        .write.mode("overwrite").parquet(tmp.resolve("rows").toString)
      PersistedIndex.splitStats(spark, 9000000L)
        .write.mode("overwrite").parquet(tmp.resolve("stats").toString)
    }
    val deadIds = (0L until 5000L).toDF("asset_id") // 5k of the cluster dies
    val filler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    val fresh = (0 until 8).map(i => (9100000L + i, s"fresh document $i $filler"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = MultimodalQueries.phashDelta(spark, home, deadIds, fresh).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // generous bound: the property guarded is linear-vs-7.6e8-join-rows,
    // not absolute speed on a contended CI host
    assert(secs < 300.0,
      s"asset-keyed window legs are back? serve took $secs s against the identical cluster")
    // exactness: serve ≡ the (r21-pinned) linear kernel over the
    // post-change signature set — the mm8 ≡ mm4 contract on this fixture
    val postSigs = baseSigs.join(deadIds, Seq("asset_id"), "left_anti")
      .unionByName(MultimodalQueries.phashSigs(fresh))
    val want = MultimodalQueries.phashCounts(postSigs).collect()
    val gm = got.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val wm = want.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(gm.size === c - 5000 + 1 + 8)
    assert(gm === wm, "serve must equal the post-change linear witness")
    // the surviving cluster members kept ≥ their 94999 equal-hash partners
    assert(gm(5000L)._2 >= 94999L)
    assert(gm(5000L)._3 >= 94999L)
  }

  test("al10: lazy per-round checkpoint fuses update+argmax into one job per round") {
    val sc = spark.sparkContext
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if ("al10jobs" == j.properties.getProperty("spark.jobGroup.id"))
          n.incrementAndGet()
    }
    sc.addSparkListener(l)
    try {
      sc.setJobGroup("al10jobs", "al10 job count")
      val rows = ALQueries.al10Kcenter(spark, "/root/testdata/sf0.001").collect()
      sc.clearJobGroup()
      assert(rows.length === 8)
      Thread.sleep(1500) // listener bus is async
      val jobs = n.get()
      assert(jobs >= 8, s"counter must see the per-round jobs, saw $jobs")
      // new spelling: 7 argmax actions (each materializing the round's
      // lazily-checkpointed pool) + 7 center broadcasts ≈ 14; the eager
      // spelling added a checkpoint job per round (~21)
      assert(jobs <= 18,
        s"eager per-round checkpoints are back? $jobs jobs for K=8 (expect ~14)")
    } finally sc.removeSparkListener(l)
  }

  test("ss14's windowed feed rides the range-clustered vec_feed artifact, rows identical") {
    import graft.operators.CdcRules
    val dir = "/root/testdata/sf0.01"
    val embAll = graft.Tables(spark, dir, "embeddings")
    val wStar = CdcRules.feedSplit(embAll, "vec_id")
    val feed = SimilarityQueries.sizedVecFeed(spark, dir, wStar)
    val plan = feed.queryExecution.executedPlan.toString
    assert(plan.contains("vec_feed"),
      s"windowed feed must read the vec_feed artifact:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(vec_id"),
      s"the window must land as a pushed vec_id range on the artifact scan:\n$plan")
    val got = feed.orderBy("vec_id").collect().map(_.toSeq).toSeq
    val want = CdcRules.sizedFeed(
        CdcRules.vecFeed(embAll, "vec_id", "embedding", wStar), "vec_id", wStar)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === want, "artifact-backed feed must equal the raw-table spelling")
  }
}
