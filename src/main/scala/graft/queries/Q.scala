package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared building blocks for the oracle-checked query suite.
  *
  * Two cross-engine determinism conventions (Spark vs the driver's DuckDB
  * oracle) used throughout:
  *
  *  1. '''Money math in DECIMAL.''' Double sums are order-dependent; the same
  *     query on 32 shuffle partitions vs DuckDB's single thread would differ
  *     in ulps. Casting 2-dp inputs to DECIMAL(18,2) makes every sum exact and
  *     order-independent on both engines; the final cast back to DOUBLE is
  *     deterministic IEEE. (`decSum`, `decAvg`.)
  *
  *  2. '''Deterministic hashing via md5.''' Spark's `xxhash64`/`hash` don't
  *     exist in DuckDB, and `rand()` seeds don't line up across engines, so
  *     every "random-ish" choice (splits, sampling, minhash, LSH) is driven by
  *     `detHash`: the first 15 hex chars of md5 as a non-negative BIGINT
  *     (60 bits — fits i64 on both engines).
  *     Spark:  `conv(substring(md5(x), 1, 15), 16, 10)::long`
  *     DuckDB: `('0x' || substr(md5(x), 1, 15))::BIGINT`
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables(s, dir, name)

  /** Deterministic 60-bit hash of an expression (+ seed), portable to
    * DuckDB. Computed by the native codegen [[graft.plans.DetHash60Expression]]
    * — one MD5 digest + shift instead of the four-node hex round-trip —
    * bit-identical to [[detHashMd5]] (property-pinned in DetHashSpec), so
    * the DuckDB oracle spelling in [[detHashSql]] is unchanged. Resolution:
    * every query reads through graft.Tables, which registers the function
    * on the live session. */
  def detHash(c: Column, seed: Int = 0): Column = {
    // build the expression node directly (no function-registry resolution)
    // so detHash works on ANY session — including specs and operators fed
    // raw in-memory DataFrames that never pass through graft.Tables
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.DetHash60Expression(
      org.apache.spark.sql.GraftColumnBridge.expression(
        concat(lit(seed.toString), c.cast(StringType)))))
  }

  /** The composable spelling det_hash60 replaced — kept as the equivalence
    * witness for DetHashSpec and for sessions without graft functions. */
  private[graft] def detHashMd5(c: Column, seed: Int = 0): Column =
    conv(substring(md5(concat(lit(seed.toString), c.cast(StringType))), 1, 15), 16, 10)
      .cast(LongType)

  /** DuckDB twin of [[detHash]] for splicing into oracle SQL. */
  def detHashSql(expr: String, seed: Int = 0): String =
    s"(('0x' || substr(md5('$seed' || CAST($expr AS VARCHAR)), 1, 15))::BIGINT)"

  /** Order-independent exact sum of a 2-dp money column, returned as double. */
  def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  def decSumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"

  /** Exact decimal average of a 2-dp money column, returned as double.
    * Computed as integer cents summed exactly, then ONE double division —
    * decimal/decimal division rounds differently across engines, int/int
    * division in IEEE double does not. */
  def decAvg(c: Column): Column =
    (sum(round(c * 100).cast(LongType)).cast(DoubleType) / (count(c) * 100).cast(DoubleType))

  def decAvgSql(expr: String): String =
    s"(CAST(SUM(CAST(ROUND($expr * 100) AS BIGINT)) AS DOUBLE) / CAST(COUNT($expr) * 100 AS DOUBLE))"

  /** Exact revenue term: price and discount are 2-dp; multiply in decimal. */
  def revenue(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) * (lit(1).cast(DecimalType(18, 2)) - discount.cast(DecimalType(18, 2))))
      .cast(DoubleType)

  def revenueSql(price: String, discount: String): String =
    s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST($discount AS DECIMAL(18,2)))) AS DOUBLE)"

  /** Whitespace tokens of the documents `text` column (single-space corpus). */
  def tokens(c: Column): Column = split(c, " ")

  /** Space-joined word n-grams of a token-array column named `arrName`,
    * SHORT-DOC SAFE: rows with fewer than n tokens get an empty array via a
    * lazily-evaluated branch. The guard is load-bearing — `sequence(1,
    * size-k)` DESCENDS when size < k+1, and ANSI `element_at` then faults
    * on index ≤ 0. This is the one shared implementation (ta7, the
    * streaming bloom gate, Dedup's shingles all build on it) so the trap is
    * solved exactly once. */
  def wordNgrams(arrName: String, n: Int): Column = {
    val parts = (0 until n).map(j => s"element_at($arrName, i + $j)").mkString(", ")
    when(size(col(arrName)) >= n,
      expr(s"transform(sequence(1, size($arrName) - ${n - 1}), i -> concat_ws(' ', $parts))"))
      .otherwise(expr("array()").cast("array<string>"))
  }
}
