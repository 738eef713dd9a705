package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Q.detHash

/** Distributed Count-Min sketch, fully declarative — no UDF, no UDAF, no
  * driver-side counter array (Cormode & Muthukrishnan 2005).
  *
  * The sketch is a table of (row_idx, col_idx, cell) counts: build explodes
  * each item into `depth` cell coordinates (row i, column = detHash(item,
  * seed=i) mod width) and count-reduces per coordinate. Map-side partial
  * aggregation means the shuffle carries at most depth·width rows per map
  * task regardless of input size; the finished sketch is ≤ depth·width rows
  * total (a few KB at the defaults), which [[estimates]] consumes as a
  * BROADCAST join — the probe side never shuffles the corpus.
  *
  * Estimates are the min over the depth cells a probe item maps to: always
  * ≥ the true count (cells only ever accumulate), with overcount ≤
  * 2n/width at probability 1 − 2^−depth. The point-query twin of [[Bloom]]:
  * where the bloom answers "seen at all?", the CMS answers "roughly how
  * often?" without holding the (at 100 TB, unboundedly large) exact
  * vocabulary — the exact groupBy this replaces keys on every distinct
  * item; the CMS shuffle is capped at depth·width cells no matter how many
  * distinct items exist.
  *
  * Positions derive from the md5-based detHash (seed = row index), so the
  * whole sketch is bit-for-bit reproducible in any engine with md5 and
  * integer ops — the DuckDB oracle replays build AND probe
  * (`cms1_heavy_hitters`).
  */
object Sketch {

  val DefaultDepth: Int = 4
  val DefaultWidth: Long = 8192L

  /** The depth cell coordinates of one item as an array column; index i of
    * the array is the column index in sketch row i. */
  private def positions(item: Column, depth: Int, width: Long): Column = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    require(width > 0, s"width must be positive, got $width")
    array((0 until depth).map(i => detHash(item, seed = i) % width): _*)
  }

  /** Builds the sketch table (row_idx INT, col_idx BIGINT, cell BIGINT) from
    * one item per input row. Only coordinates that were actually hit appear
    * (absent coordinate = 0), so sparse corpora stay sparse. The build
    * geometry rides along as column metadata on `cell` so a probe with a
    * DIFFERENT (depth, width) fails loudly instead of silently reading
    * mostly-zero cells (probing a 4x8192 sketch as 4x16384 passes every
    * coordinate bound but hashes into cells the build never wrote). */
  def buildCms(items: DataFrame, item: Column,
      depth: Int = DefaultDepth, width: Long = DefaultWidth): DataFrame = {
    val geom = new MetadataBuilder()
      .putLong(GeomDepthKey, depth.toLong).putLong(GeomWidthKey, width).build()
    items
      .select(posexplode(positions(item, depth, width)).as(Seq("row_idx", "col_idx")))
      .groupBy("row_idx", "col_idx")
      .agg(count(lit(1)).as("cell", geom))
  }

  private val GeomDepthKey = "graft.cms.depth"
  private val GeomWidthKey = "graft.cms.width"

  /** Asserts probe geometry == build geometry when the sketch still carries
    * its [[buildCms]] metadata. Sketches reconstructed from a sink (the
    * streaming upsert path) lose the stamp — for those the coordinate-bound
    * checks below remain the only guard, as before. */
  private def checkGeometry(sketch: DataFrame, depth: Int, width: Long): Unit =
    sketch.schema.fields.find(_.name == "cell").map(_.metadata)
      .filter(_.contains(GeomDepthKey)).foreach { m =>
        require(m.getLong(GeomDepthKey) == depth.toLong && m.getLong(GeomWidthKey) == width,
          s"probe geometry ${depth}x$width != build geometry " +
            s"${m.getLong(GeomDepthKey)}x${m.getLong(GeomWidthKey)} — " +
            "estimates are only valid under the geometry the sketch was built with")
      }

  /** The literal-probe ESTIMATE — the [[graft.operators.Bloom.memberLit]]
    * dual for point counts: the finished sketch inlined as one dense
    * depth×width long-array literal (bounded by GEOMETRY — depth·width
    * cells no matter how many distinct items the corpus holds; 256 KB at
    * the 4×8192 default), and the returned function maps any item Column
    * to its min-over-depth estimate as a pure projection. No explode, no
    * join, no Exchange, no state — it composes into `transform(...)`
    * lambdas and stateless Structured Streaming plans (the CMS-LM
    * perplexity gate). Collects the sketch once per call — the same
    * bounded-index contract as broadcasting it. */
  def estimatorLit(sketch: DataFrame,
      depth: Int = DefaultDepth, width: Long = DefaultWidth): Column => Column = {
    // the dense literal and its Int cell indices cap the literal geometry;
    // fail with the cause, not a wrapped index or a zero-length array
    require(depth.toLong * width <= Int.MaxValue,
      s"estimatorLit geometry ${depth}x$width exceeds the dense-literal bound " +
        s"(${Int.MaxValue} cells) — use the broadcast-join estimates() path")
    checkGeometry(sketch, depth, width)
    val dense = new Array[Long]((depth * width).toInt)
    sketch.select(col("row_idx").cast(IntegerType), col("col_idx").cast(LongType),
        col("cell").cast(LongType)).collect().foreach { r =>
      val (i, cix, cell) = (r.getInt(0), r.getLong(1), r.getLong(2))
      require(i >= 0 && i < depth && cix >= 0 && cix < width,
        s"sketch cell ($i, $cix) outside geometry ${depth}x$width — " +
          "probe must use the same (depth, width) the sketch was built with")
      dense(i * width.toInt + cix.toInt) = cell
    }
    val cellsLit = typedLit(dense.toSeq)
    item => (0 until depth)
      .map(i => element_at(cellsLit,
        (lit(i * width) + detHash(item, seed = i) % width).cast(IntegerType) + 1))
      .reduceLeft(least(_, _))
  }

  // ---------------------------------------------------------------- HLL

  /** HyperLogLog register precision: p=8 → m=256 registers, standard error
    * 1.04/√m ≈ 6.5%. Small by design so the synthetic corpora exercise the
    * estimator for real (n ≫ m); production cardinality work uses p=14+
    * (16 KB of registers) — the math below is p-generic. */
  val HllP: Int = 8
  val HllM: Int = 1 << HllP

  /** ρ cap: detHash yields 60 uniform bits, the bucket consumes [[HllP]],
    * so the geometric observable has 60−p bits; an all-zero suffix caps at
    * 60−p+1. */
  val HllCap: Int = 60 - HllP + 1

  /** Bit-position masks for the integer-only ρ: with lowbit = v & −v (an
    * exact power of two), position t = Σᵢ 2ⁱ·[lowbit ∧ maskᵢ ≠ 0] — the
    * classic branch-free bit-index, truncated to the 53 bits v can occupy.
    * Integer end to end: no log2 whose correct rounding at 2ᵏ−1 would be
    * engine-dependent. */
  private[graft] val HllMasks: Seq[(Int, Long)] = Seq(
    1 -> 3002399751580330L, 2 -> 3602879701896396L, 4 -> 4768517252509936L,
    8 -> 280379743338240L, 16 -> 8725728572932096L, 32 -> 9007194959773696L)

  /** α_m·m²·2⁶⁰ folded into ONE double literal (computed here, spliced
    * verbatim into the DuckDB oracle): the raw estimate is this constant
    * divided by the exactly-integer scaled register sum — a single float
    * division, so both engines agree to the last ulp before the final
    * round. */
  val HllRawC: Double = {
    val m = HllM.toDouble
    val alpha = 0.7213 / (1 + 1.079 / m) // Flajolet et al. 2007, m ≥ 128
    alpha * m * m * 1.152921504606846976e18
  }

  /** 2⁶⁰ — the scaling that turns Σ 2^(−ρⱼ) into an exact integer sum:
    * each register contributes 2^(60−ρ) (a BIGINT), empties contribute
    * 2⁶⁰, and the total (≤ m·2⁶⁰ ≈ 2.9e20) accumulates in DECIMAL(38,0)/
    * HUGEINT — the a29 overflow convention. */
  val HllScale: Long = 1152921504606846976L

  /** The ρ projection as a SQL fragment over a BIGINT value expression
    * (0 ≤ v < 2^(60−p)) — shared verbatim by the Spark face (via expr) and
    * the DuckDB oracle: CASE v = 0 → cap, else 1 + branch-free bit index
    * of the lowest set bit. */
  def hllRhoSql(v: String): String = {
    val terms = HllMasks.map { case (w, m) =>
      s"(CASE WHEN (($v) & (-($v))) & $m != 0 THEN $w ELSE 0 END)" }
    s"(CASE WHEN ($v) = 0 THEN $HllCap ELSE 1 + ${terms.mkString(" + ")} END)"
  }

  /** HLL register table: one row per (groupCols…, bucket) with the MAX ρ
    * observed — the whole sketch build is a projection + a map-side-
    * combined hash agg whose shuffle is capped at |groups|·m rows
    * regardless of input size (the CMS contract for cardinality instead
    * of counts). Registers MERGE by max — the distributed-union property
    * the hll1 query proves in-plan. No distinct, no exact vocabulary,
    * ever. */
  def hllRegisters(items: DataFrame, item: Column,
      groupCols: Seq[String]): DataFrame = {
    val g = items
      .withColumn("__h", detHash(item, seed = 11))
      .withColumn("bucket", col("__h") % HllM)
      .withColumn("rho", expr(hllRhoSql(s"__h div $HllM")))
    g.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("rho"))
  }

  /** Per-group HLL estimate from a register table: n_regs, v_zero, and
    * hll_est (the bias-corrected Flajolet estimate with the linear-
    * counting small-range branch). The only float ops are one division by
    * the exact integer register sum and (on the small-range branch) one
    * ln — everything else is integer/decimal. */
  def hllEstimate(regs: DataFrame, groupCol: String): DataFrame = {
    val sPresent = sum(expr(
      s"CAST(shiftleft(CAST(1 AS BIGINT), CAST(60 - rho AS INT)) AS DECIMAL(38,0))"))
    val agg = regs.groupBy(groupCol)
      .agg(count(lit(1)).as("n_regs"),
        (sPresent + (lit(HllM) - count(lit(1))).cast("decimal(38,0)") *
          lit(HllScale).cast("decimal(38,0)")).as("s_scaled"))
    val eRaw = lit(HllRawC) / col("s_scaled").cast(DoubleType)
    val vZero = (lit(HllM) - col("n_regs")).cast(LongType)
    val lc = lit(HllM.toDouble) * log(lit(HllM.toDouble) / vZero.cast(DoubleType))
    agg
      .withColumn("v_zero", vZero)
      .withColumn("hll_est",
        round(when(eRaw <= lit(2.5 * HllM) && col("v_zero") > 0, lc).otherwise(eRaw))
          .cast(LongType))
      .drop("s_scaled")
  }

  /** Point-query estimates for a (small, heavy-hitter-candidate) probe set:
    * returns `probes` plus an `est` column = min over the depth cells,
    * coalescing never-hit cells to 0. The sketch side broadcasts; the only
    * shuffle is the per-probe min, sized by the probe set. `itemCol` must be
    * a unique key in `probes` (the re-group key). */
  def estimates(sketch: DataFrame, probes: DataFrame, itemCol: String,
      depth: Int = DefaultDepth, width: Long = DefaultWidth): DataFrame = {
    checkGeometry(sketch, depth, width)
    val other = probes.columns.filter(_ != itemCol).map(c => first(col(c)).as(c))
    probes
      .select(col("*"),
        posexplode(positions(col(itemCol), depth, width)).as(Seq("row_idx", "col_idx")))
      .join(broadcast(sketch), Seq("row_idx", "col_idx"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cell"), lit(0L))).as("est"), other: _*)
  }
}
