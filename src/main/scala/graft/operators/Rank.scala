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
  * order is total — callers must include a unique tiebreak column. */
object Rank {

  def globalRowNumber(df: DataFrame, numPartitions: Int, sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__lrn",
      row_number().over(Window.partitionBy("__pid").orderBy(sortCols: _*)))
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
    * total order (unique tiebreak). */
  def globalCumSum(df: DataFrame, numPartitions: Int, value: Column,
                   cumBeforeCol: String, sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast(LongType))
    val local = parted.withColumn("__lcs",
      coalesce(sum("__v").over(Window.partitionBy("__pid").orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets = local.groupBy("__pid").agg(sum("__v").as("__tot"))
      .withColumn("__off", coalesce(sum("__tot").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(cumBeforeCol, (col("__off") + col("__lcs")).cast(LongType))
      .drop("__pid", "__v", "__lcs", "__off")
  }
}
