package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalable global row numbering — a total-order rank WITHOUT the
  * un-partitioned window (`row_number().over(Window.orderBy(...))` funnels
  * every row through a single task; at 10⁸+ rows that is the classic
  * one-executor sort bottleneck).
  *
  * Two phases:
  *  1. range-partition on the sort key, rank locally inside each partition
  *     (the window is partitioned by `spark_partition_id()`, so it stays
  *     bounded);
  *  2. add the exclusive prefix sum of partition counts — one row per
  *     partition, joined back as a broadcast.
  *
  * Ranks do not depend on where the range boundaries fall as long as the
  * order is total — callers must include a unique tiebreak column.
  *
  * Determinism: the locally-ranked frame feeds BOTH the offsets branch and
  * the final join. `repartitionByRange` samples its boundaries per physical
  * evaluation (seeded by `rdd.id`), so if the subtree were evaluated twice
  * the two sides could land rows in different `__pid`s and silently corrupt
  * ranks. We therefore materialize the ranked intermediate ONCE
  * (`localCheckpoint`) and derive both branches from the same physical
  * partitioning. On a cluster, local checkpoints live on executors — an
  * executor loss fails (not corrupts) the job; swap for `checkpoint()` with
  * a reliable dir if that trade-off is wrong for a deployment. */
object Rank {

  /** Materialize the partitioned+ranked intermediate so every consumer sees
    * one physical evaluation. Eager, so the cost is paid exactly once.
    *
    * Two side effects callers accept (ADVICE r5, documented trade-off):
    * (1) construction runs a Spark job at PLAN time — building a rank is
    * not lazy like other DataFrame combinators; (2) each construction pins
    * checkpoint blocks for the session — they are deliberately NOT
    * unpersisted here because a caller may still hold (and re-evaluate) the
    * returned frame; dropping blocks under a live plan fails the plan, the
    * worse failure mode. Sessions that build many ranks over the same input
    * should memoize the result via [[SessionShare.materialized]] (keyed
    * reuse) rather than reconstructing; Verify/Bench build each rank a
    * bounded number of times per JVM, so accumulation is bounded there. */
  private def pinned(df: DataFrame): DataFrame = df.localCheckpoint()

  /** The session's configured shuffle parallelism — the right default range
    * partition count. A hardcoded literal here is a driver-chosen ceiling on
    * sort parallelism: 32 range partitions over 100 TB = 32 sort tasks of
    * ~3 TB each. Partition-independence is spec-proven (RankSpec + the
    * per-query dual-count specs), so following the conf is safe: output is
    * identical at any count, only task granularity changes. */
  private def defaultParts(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** [[globalRowNumber]] with the partition count taken from
    * `spark.sql.shuffle.partitions` — what production call sites should
    * use. */
  def globalRowNumber(df: DataFrame, sortCols: Column*): DataFrame =
    globalRowNumber(df, defaultParts(df), sortCols: _*)

  def globalRowNumber(df: DataFrame, numPartitions: Int, sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = pinned(parted.withColumn("__lrn",
      row_number().over(Window.partitionBy("__pid").orderBy(sortCols: _*))))
    // prefix offsets: numPartitions rows — the one place a global window is
    // fine, because its input is bounded by the partition count
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("rank", (col("__off") + col("__lrn")).cast(LongType))
      .drop("__pid", "__lrn", "__off")
  }

  /** Exclusive global prefix sum of `value` in total `sortCols` order,
    * added as column `cumBeforeCol` — same two-phase shape as
    * [[globalRowNumber]]: range-partition on the sort key, running sum
    * within each partition, then add the broadcast exclusive prefix of
    * per-partition totals. The window input stays bounded by the partition,
    * never the whole table. `value` must be non-null; callers must give a
    * total order (unique tiebreak).
    *
    * Typing: an integral `value` (byte/short/int/long) sums as LONG and
    * `cumBeforeCol` is LongType. A fractional or decimal `value` sums in its
    * OWN type — no silent floor-truncation to long — and `cumBeforeCol`
    * carries the sum's type; note double sums are addition-order-dependent,
    * so oracle-compared callers should pass decimals or pre-scaled
    * integers (the repo's e6 convention). */
  /** [[globalCumSum]] with the partition count taken from
    * `spark.sql.shuffle.partitions` — what production call sites should
    * use. */
  def globalCumSum(df: DataFrame, value: Column, cumBeforeCol: String,
                   sortCols: Column*): DataFrame =
    globalCumSum(df, defaultParts(df), value, cumBeforeCol, sortCols: _*)

  def globalCumSum(df: DataFrame, numPartitions: Int, value: Column,
                   cumBeforeCol: String, sortCols: Column*): DataFrame = {
    val integral = df.select(value.as("__v")).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val parted = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", if (integral) value.cast(LongType) else value)
    val zero = lit(0).cast(parted.schema("__v").dataType)
    val local = pinned(parted.withColumn("__lcs",
      coalesce(sum("__v").over(Window.partitionBy("__pid").orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, -1)), zero)))
    val offsets = local.groupBy("__pid").agg(sum("__v").as("__tot"))
      .withColumn("__off", coalesce(sum("__tot").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), zero))
      .select("__pid", "__off")
    val summed = local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(cumBeforeCol,
        if (integral) (col("__off") + col("__lcs")).cast(LongType)
        else col("__off") + col("__lcs"))
    summed.drop("__pid", "__v", "__lcs", "__off")
  }
}
