package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join handling (on by default in Spark 4) covers sort-merge
  * joins at runtime; these helpers cover the two shapes AQE does not:
  * heavily-skewed AGGREGATIONS (one hot key overwhelming a single reducer)
  * and broadcast-infeasible skewed joins where one side must be exploded.
  *
  * Pattern (two-phase salted aggregation):
  *   groupBy(key)          →  groupBy(key, salt) partial  →  groupBy(key) final
  * The partial agg spreads the hot key over `saltBuckets` reducers; the
  * final agg combines `saltBuckets` rows per key — negligible.
  */
object Skew {

  /** Deterministic salt column in [0, buckets): hash of `tiebreak` so the
    * same row always lands in the same bucket (re-runs stay stable). */
  def salt(tiebreak: Column, buckets: Int): Column =
    pmod(xxhash64(tiebreak), lit(buckets)).cast("int")

  /** Two-phase salted count+sum per key. Equivalent to
    * `df.groupBy(key).agg(count, sum(valueCol))` for any data, but the first
    * shuffle distributes each key over `buckets` partitions. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      tiebreak: String, buckets: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(tiebreak), buckets))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("total"))

  /** Skewed join: replicate the small side `buckets` times, salt the big
    * side once — each hot-key row of the big side joins exactly one replica,
    * so no single task receives the whole hot key. Use when the small side
    * is too big to broadcast but far smaller than the big side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      tiebreak: String, buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(col(tiebreak), buckets))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<int>")))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
