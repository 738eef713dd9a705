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
