package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

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
  * Here instead the top-k IS the aggregation state: a typed Aggregator
  * whose buffer holds at most k (key, id) entries, so
  *
  *  - the map side folds each scan partition into ≤ #groups × k entries
  *    (partial aggregation — ObjectHashAggregate keeps one tiny buffer per
  *    group, never the partition's rows);
  *  - the shuffle moves only those bounded buffers (#groups × k rows per
  *    map partition — KB, not the corpus);
  *  - the final merge k-way-merges bounded buffers.
  *
  * This is `TakeOrderedAndProject` generalized per group: same bounded-heap
  * fold, same partial/final merge, expressed through Spark's aggregate
  * machinery so it composes with `groupBy`. The per-row cost is an encoder
  * round-trip (ScalaAggregator is not codegen'd) — acceptable because the
  * expensive part of the row (the scoring expression below it) stays in
  * whole-stage codegen and the aggregate itself is O(log k) comparisons.
  *
  * Ordering is ascending (key, id) — smallest-k with a unique integer
  * tiebreak, the cross-engine determinism convention (callers wanting
  * largest-k negate the key). */
object TopK {

  /** One ranked entry: `k` the sort key, `id` the unique tiebreak. */
  case class Entry(k: Long, id: Long)

  /** Aggregation buffer — a wrapper case class so `Encoders.product`
    * applies (there is no public top-level `Encoder[Seq[_]]` factory). */
  case class Buf(entries: Seq[Entry])

  private val asc: Ordering[Entry] = Ordering.by(e => (e.k, e.id))

  /** Keeps the k smallest (key, id) entries seen; buffer never exceeds k. */
  private class SmallestK(kk: Int) extends Aggregator[Entry, Buf, Buf] {
    def zero: Buf = Buf(Vector.empty)
    def reduce(b: Buf, a: Entry): Buf =
      // full buffer + a not beating the current worst → no-op (the common
      // case on sorted-ish data; keeps the fold O(1) amortized)
      if (b.entries.lengthCompare(kk) >= 0 && asc.gteq(a, b.entries.last)) b
      else Buf((b.entries :+ a).sorted(asc).take(kk))
    def merge(x: Buf, y: Buf): Buf =
      Buf((x.entries ++ y.entries).sorted(asc).take(kk))
    def finish(b: Buf): Buf = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: org.apache.spark.sql.Encoder[Buf] = Encoders.product[Buf]
  }

  /** Per-group smallest-k of `(sortKey, tiebreak)` (both LONG), returned
    * exploded as one row per kept entry with a 1-based `rank`:
    * `groupCols..., rank, <idName>, <keyName>`. */
  def smallestPerGroup(df: DataFrame, groupCols: Seq[String], k: Int,
      sortKey: Column, tiebreak: Column,
      keyName: String, idName: String): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    val agg = udaf(new SmallestK(k), Encoders.product[Entry])
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(sortKey, tiebreak).as("__topk"))
      .select(groupCols.map(col) :+ posexplode(col("__topk.entries")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idName),
        col("col.k").as(keyName)): _*)
  }
}
