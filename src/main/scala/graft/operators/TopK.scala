package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bounded-state grouped top-k — the shape a per-group rank takes when the
  * group-key cardinality is SMALL (contract-bounded, e.g. an ANN query
  * batch) while the input is corpus-proportional.
  *
  * The naive spelling — `row_number().over(Window.partitionBy(group)
  * .orderBy(key))` — shuffles the ENTIRE input into #groups partitions and
  * fully sorts each one for a top-k: with 10 query ids over a 100 TB scored
  * set that is 10 tasks each sorting N rows — the bounded-parallelism
  * corpus sort the PlanGateSpec window rule now rejects. (When the group
  * count is itself corpus-proportional — w1's per-author top-k — the window
  * is fine: per-group inputs are small and parallelism is wide. This
  * operator exists for the opposite regime.)
  *
  * Here instead the top-k IS the aggregation state: the native
  * [[graft.plans.TopKSmallestAgg]] (a TypedImperativeAggregate — no
  * encoder round-trip, no runtime reflection) whose buffer holds at most k
  * (key, id) entries, so
  *
  *  - the map side folds each scan partition into ≤ #groups × k entries
  *    (partial aggregation — ObjectHashAggregate keeps one tiny buffer per
  *    group, never the partition's rows);
  *  - the shuffle moves only those bounded buffers (16·k bytes per group
  *    per map partition — KB, not the corpus);
  *  - the final merge k-way-merges bounded buffers.
  *
  * This is `TakeOrderedAndProject` generalized per group, expressed
  * through Spark's aggregate machinery so it composes with `groupBy`. The
  * scoring expression below it stays in whole-stage codegen; the aggregate
  * itself costs O(log k) comparisons per row.
  *
  * Ordering is ascending (key, id) — smallest-k with a unique integer
  * tiebreak, the cross-engine determinism convention (callers wanting
  * largest-k negate the key). */
object TopK {

  /** Per-group smallest-k of `(sortKey, tiebreak)` (both coerced to LONG),
    * returned exploded as one row per kept entry with a 1-based `rank`:
    * `groupCols..., rank, <idName>, <keyName>`. */
  def smallestPerGroup(df: DataFrame, groupCols: Seq[String], k: Int,
      sortKey: Column, tiebreak: Column,
      keyName: String, idName: String): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    // coercion contract (ADVICE r11): sortKey/tiebreak are cast to LONG
    // below, which would TRUNCATE a fractional key (silently changing the
    // order vs the row_number window this replaces) and null an uncastable
    // one (whose rows the aggregate's null-skip then drops). The suite's
    // keys are integral by the e6-fixed-point convention; a future caller
    // with a double score must e6-fix it first — fail loudly here instead.
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    def assertIntegral(c: Column, what: String): Unit = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = df.select(c).schema.head.dataType
      val ok = dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
      require(ok,
        s"TopK.smallestPerGroup $what must be an integral type (e6-fix " +
          s"fractional scores first); got ${dt.simpleString}")
    }
    assertIntegral(sortKey, "sortKey")
    assertIntegral(tiebreak, "tiebreak")
    val agg = column(graft.plans.TopKSmallestAgg(
      expression(sortKey.cast(LongType)), expression(tiebreak.cast(LongType)), k)
      .toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(agg.as("__topk"))
      .select(groupCols.map(col) :+ posexplode(col("__topk")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idName),
        col("col.k").as(keyName)): _*)
  }
}
