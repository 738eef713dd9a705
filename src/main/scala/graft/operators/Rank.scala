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
}
