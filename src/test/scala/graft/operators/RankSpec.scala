package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

class RankSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    val rnd = new Random(3)
    // duplicate keys exercise the unique-tiebreak requirement
    (1 to 500).map(i => (rnd.nextInt(40), i.toLong)).toDF("k", "id")
  }

  test("two-phase rank equals the un-partitioned window rank") {
    val naive = df.withColumn("rank",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select("id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (parts <- Seq(1, 3, 8)) {
      val got = Rank.globalRowNumber(df, parts, col("k"), col("id"))
        .select("id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive, s"parts=$parts")
    }
  }

  test("plan shape: the data-bearing window is partitioned, never global") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"))
    val plan = Rank.globalRowNumber(docs, 8, col("doc_id"))
      .queryExecution.executedPlan.toString
    // the only SinglePartition exchange allowed is the tiny per-partition
    // offsets aggregate (numPartitions rows), which sits under a broadcast
    val bIdx = plan.indexOf("BroadcastExchange")
    assert(bIdx >= 0, s"offsets must join back as a broadcast:\n$plan")
    val mainSide = plan.substring(0, bIdx)
    assert(!mainSide.contains("Exchange SinglePartition"),
      s"row-bearing side must not funnel through one partition:\n$plan")
  }

  test("two-phase exclusive prefix sum equals the un-partitioned window sum") {
    val withV = df.withColumn("v", (col("id") % 7) + 1)
    val naive = withV.withColumn("cum",
        coalesce(sum("v").over(Window.orderBy(col("k"), col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (parts <- Seq(1, 3, 8)) {
      val got = Rank.globalCumSum(withV, parts, col("v"), "cum", col("k"), col("id"))
        .select("id", "cum")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive, s"parts=$parts")
    }
  }

  test("fractional values sum in their own type — no silent floor to long") {
    val withV = df.withColumn("v", (col("id") % 7).cast("double") / 2.0 + 0.25)
    val got = Rank.globalCumSum(withV, 4, col("v"), "cum", col("k"), col("id"))
    assert(got.schema("cum").dataType.typeName === "double")
    val total = withV.agg(sum(col("v"))).collect()(0).getDouble(0)
    val lastBefore = got.orderBy(desc("k"), desc("id")).select("cum", "v")
      .limit(1).collect()(0)
    // exclusive prefix of the LAST row + its own value = the exact total;
    // a truncating cast would lose every .25/.5/.75 fraction on the way
    assert(math.abs(lastBefore.getDouble(0) + lastBefore.getDouble(1) - total) < 1e-9)
  }

  test("determinism: independent rank constructions agree row-for-row") {
    // regression for the r4 sm7 flake: before the ranked intermediate was
    // pinned (localCheckpoint), the repartitionByRange subtree was evaluated
    // once per join side and its sampled boundaries could diverge, silently
    // corrupting ranks. Two independent builds must agree exactly, and each
    // build must hand out a perfect permutation 1..N.
    import spark.implicits._
    val rnd = new Random(11)
    // heavy duplicate keys + skew, the adversarial case for range sampling
    val skewed = (1 to 2000).map(i => (if (i % 3 == 0) 0 else rnd.nextInt(5), i.toLong))
      .toDF("k", "id")
    def build() = Rank.globalRowNumber(skewed, 7, col("k"), col("id"))
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = build(); val b = build()
    assert(a.toMap === b.toMap)
    assert(a.map(_._2).sorted.toSeq === (1L to 2000L))
    // and the returned frame itself is pinned: re-collecting cannot re-derive
    val pinnedDf = Rank.globalRowNumber(skewed, 7, col("k"), col("id")).select("id", "rank")
    assert(pinnedDf.collect().toSet === pinnedDf.collect().toSet)
  }

  test("determinism: independent prefix-sum constructions agree row-for-row") {
    import spark.implicits._
    val rnd = new Random(12)
    val skewed = (1 to 2000).map(i => (if (i % 3 == 0) 0 else rnd.nextInt(5), i.toLong, (i % 13).toLong))
      .toDF("k", "id", "v")
    def build() = Rank.globalCumSum(skewed, 7, col("v"), "cum", col("k"), col("id"))
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = build(); val b = build()
    assert(a.toMap === b.toMap)
    // cross-check one absolute value: total of all v = last row's cum + its v
    val total = skewed.agg(sum("v")).collect()(0).getLong(0)
    val last = Rank.globalCumSum(skewed, 7, col("v"), "cum", col("k"), col("id"))
      .orderBy(desc("k"), desc("id")).select("cum", "v").limit(1).collect()(0)
    assert(last.getLong(0) + last.getLong(1) === total)
  }

  test("plan shape: prefix-sum rows never funnel through one partition") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), lit(1L).as("v"))
    val plan = Rank.globalCumSum(docs, 8, col("v"), "cum", col("doc_id"))
      .queryExecution.executedPlan.toString
    val bIdx = plan.indexOf("BroadcastExchange")
    assert(bIdx >= 0, s"offsets must join back as a broadcast:\n$plan")
    assert(!plan.substring(0, bIdx).contains("Exchange SinglePartition"),
      s"row-bearing side must not funnel through one partition:\n$plan")
  }
}
