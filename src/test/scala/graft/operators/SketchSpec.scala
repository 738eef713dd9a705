package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  private def freqTable(xs: Seq[String]) = {
    import spark.implicits._
    xs.toDF("item")
  }

  /** Zipf-ish corpus: item-1 appears 100 times, item-2 50, item-k 100/k. */
  private val corpus: Seq[String] =
    (1 to 20).flatMap(k => Seq.fill(100 / k)(s"item-$k"))

  private def exactCounts: Map[String, Long] =
    corpus.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("estimates never undercount (CMS one-sided error guarantee)") {
    val items = freqTable(corpus)
    for ((d, w) <- Seq((2, 8L), (3, 64L), (4, 1024L))) {
      val sketch = Sketch.buildCms(items, col("item"), d, w)
      val probes = freqTable(corpus.distinct)
      val est = Sketch.estimates(sketch, probes, "item", d, w)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = exactCounts
      exact.foreach { case (item, cnt) =>
        assert(est(item) >= cnt, s"undercount for $item at depth=$d width=$w")
      }
    }
  }

  test("wide sketch is exact on a small vocabulary") {
    val items = freqTable(corpus)
    val sketch = Sketch.buildCms(items, col("item"), 4, 1 << 16)
    val est = Sketch.estimates(sketch, freqTable(corpus.distinct), "item", 4, 1 << 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === exactCounts)
  }

  test("width-1 sketch estimates every item at the total count") {
    val items = freqTable(corpus)
    val sketch = Sketch.buildCms(items, col("item"), 3, 1L)
    val est = Sketch.estimates(sketch, freqTable(corpus.distinct), "item", 3, 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.values.foreach(v => assert(v === corpus.size.toLong))
  }

  test("sketch and estimates are independent of input partitioning") {
    val a = Sketch.buildCms(freqTable(corpus), col("item"), 3, 64)
    val b = Sketch.buildCms(freqTable(corpus).repartition(7), col("item"), 3, 64)
    assert(a.orderBy("row_idx", "col_idx").collect().toSeq ===
      b.orderBy("row_idx", "col_idx").collect().toSeq)
  }

  test("never-built probe items estimate at 0 when their cells are empty") {
    // width large enough that ghost items miss every occupied cell
    val sketch = Sketch.buildCms(freqTable(Seq("a", "b")), col("item"), 4, 1 << 16)
    val est = Sketch.estimates(sketch, freqTable(Seq("ghost-1", "ghost-2")), "item", 4, 1 << 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.values.foreach(v => assert(v === 0L))
  }

  test("probing with a different geometry than the build fails loud") {
    val sketch = Sketch.buildCms(freqTable(corpus), col("item"), 3, 64)
    // larger width passes every coordinate bound but reads cells the build
    // never wrote — the silent mostly-zero-estimate failure mode (r9 advisory)
    val wider = intercept[IllegalArgumentException](
      Sketch.estimates(sketch, freqTable(Seq("item-1")), "item", 3, 128))
    assert(wider.getMessage.contains("geometry"))
    val deeper = intercept[IllegalArgumentException](
      Sketch.estimatorLit(sketch, 4, 64))
    assert(deeper.getMessage.contains("geometry"))
  }

  test("a sketch reconstructed without metadata keeps the coordinate guard") {
    // the streaming-upsert path rebuilds the cell table from a sink and
    // loses the build stamp: matching geometry works, out-of-bounds cells
    // still fail on the estimatorLit coordinate check
    val bare = Sketch.buildCms(freqTable(corpus), col("item"), 3, 64)
      .select(col("row_idx"), col("col_idx"),
        col("cell").as("cell", org.apache.spark.sql.types.Metadata.empty))
    val est = Sketch.estimates(bare, freqTable(Seq("item-1")), "item", 3, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("item-1") >= 100L)
    val narrow = intercept[IllegalArgumentException](Sketch.estimatorLit(bare, 3, 32))
    assert(narrow.getMessage.contains("outside geometry"))
  }

  test("probe-side extra columns survive estimates") {
    import spark.implicits._
    val sketch = Sketch.buildCms(freqTable(corpus), col("item"), 3, 64)
    val probes = Seq(("item-1", "keep-me")).toDF("item", "tag")
    val row = Sketch.estimates(sketch, probes, "item", 3, 64)
      .select("item", "tag", "est").collect().head
    assert(row.getString(1) === "keep-me")
    assert(row.getLong(2) >= 100L)
  }
}
