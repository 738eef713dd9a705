package graft.queries

import graft.SparkSpec

/** Results must not depend on the session's shuffle partitioning — the
  * failure class behind the r4 `sm7` flake (rank corruption when two
  * physical evaluations of a range partitioning diverged). Earlier rounds
  * verified this manually at 8 vs 32 partitions; this pins it as a test for
  * the queries built on the two-phase Rank operator plus a window-heavy
  * control group. Each query is built and collected under two different
  * `spark.sql.shuffle.partitions` settings and must return identical rows.
  *
  * (The Rank-internal partition count is an explicit argument, already
  * swept 1/3/8 in RankSpec — this spec covers the surrounding plan's
  * exchanges.) */
class PartitionIndependenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val names = Seq(
    "sm7_temperature_sample", "sm4_batch_shuffle", "pk1_sequence_pack",
    "a18_roc_auc", "a19_pr_auc", "v8_negative_sampling", "w1_grouped_topk",
    // the r15 tombstone faces: full-outer statistic merges + anti-joins +
    // the k-bounded TopK aggregate — every piece must be partition-blind
    "ir14_tombstone_index", "dd20_tombstone_neardup", "kg7_tombstone_graph",
    "ss10_tombstone_probe", "mm8_tombstone_phash", "e2e8_cdc_audit",
    // the r16 expunged faces: compaction fold + persisted-only serve
    "ir14b_expunged_serve", "dd21_expunged_neardup", "kg8_expunged_graph",
    "ss12_expunged_probe", "mm9_expunged_phash",
    // the r16 feed-table faces: serving from an explicit change table
    "ir15_feed_index", "dd22_feed_neardup", "kg9_feed_graph",
    "ss13_feed_probe", "mm10_feed_phash",
    // the positional family's CDC faces (sixth family)
    "ir18_tombstone_phrase", "ir18b_expunged_phrase", "ir19_feed_phrase",
    // the batch × CDC composition
    "ir20_cdc_query_batch")

  test("rank-consumer query results are identical at 3 and 12 shuffle partitions") {
    val key = "spark.sql.shuffle.partitions"
    val prior = spark.conf.get(key)
    def run(parts: String, name: String): Seq[String] = {
      spark.conf.set(key, parts)
      graft.SparkEntry.queries(name)(spark, dir)
        .collect().map(_.mkString("")).toSeq
    }
    try {
      names.foreach { name =>
        val a = run("3", name)
        val b = run("12", name)
        assert(a === b, s"$name differs between 3 and 12 shuffle partitions")
        assert(a.nonEmpty, s"$name returned no rows — vacuous comparison")
      }
    } finally spark.conf.set(key, prior)
  }
}
