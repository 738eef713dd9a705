package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("asset table has the typed schema and non-null payloads") {
    val assets = Multimodal.documentsAsAssets(docs)
    assert(assets.schema.fieldNames.toSeq ===
      Seq("asset_id", "modality", "content", "meta"))
    assert(assets.filter(col("content").isNull).count() === 0)
    val mods = assets.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods === Set("image", "audio", "video"))
  }

  test("extractFeatures matches a direct computation") {
    val assets = Multimodal.documentsAsAssets(docs).limit(50)
    val feats = Multimodal.extractFeatures(assets).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val expect = assets.select("asset_id", "content").collect().map { r =>
      val bytes = r.getAs[Array[Byte]](1)
      r.getString(0) -> (bytes.length, bytes.map(_.toDouble).sum / bytes.length)
    }.toMap
    assert(feats.keySet === expect.keySet)
    expect.foreach { case (id, (n, mean)) =>
      assert(feats(id)._1 === n)
      assert(math.abs(feats(id)._2 - mean) < 1e-9)
    }
  }

  test("mm4 pHash: locally perturbed copy is near, unrelated asset is not") {
    import spark.implicits._
    // deterministic 512-char "image" with real contrast (checkerboard ×
    // gradient cell pattern, 8 chars per thumbnail cell): pHash stability
    // needs DCT coefficients well-separated from the median, which
    // low-contrast or pure-noise payloads don't give — the perceptual
    // contract is small-amplitude local change on a STRUCTURED image, not
    // full-dynamic-range overwrites
    def mk(cells: Seq[Int]): String =
      cells.flatMap(v => Seq.fill(8)(('a' + v).toChar)).mkString
    val baseCells = for (r <- 0 until 8; c <- 0 until 8)
      yield ((r * 3 + c * 5) % 2) * 20 + (r + c) % 5
    val base = mk(baseCells)
    // local perturbation: ONE thumbnail cell one step brighter (a small
    // local edit on the image — off-plan replication: Hamming 2)
    val perturbed = mk(baseCells.updated(1, baseCells(1) + 1))
    val unrelated = mk(for (r <- 0 until 8; c <- 0 until 8)
      yield ((r * 5 + c * 7) % 3) * 10 + (r * c) % 7)
    val sigs = graft.queries.MultimodalQueries.phashSigs(
        Seq((0L, base), (1L, perturbed), (2L, unrelated)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val near = hamming(sigs(0L), sigs(1L))
    val far = hamming(sigs(0L), sigs(2L))
    assert(near <= 3, s"perturbed copy should be within the pairing threshold, hamming=$near")
    assert(far > 3, s"unrelated asset must not pair, hamming=$far")
    // the banded pigeonhole then guarantees the near pair IS a candidate:
    // at hamming <= 3, at least one of the 4 16-bit bands is untouched
    val bandsEqual = (0 until 4).count(b =>
      ((sigs(0L) >> (b * 16)) & 0xffffL) == ((sigs(1L) >> (b * 16)) & 0xffffL))
    assert(bandsEqual >= 1)
  }

  test("frame sampling: every k-th frame, empty payload safe") {
    import spark.implicits._
    val df = Seq("0123456789abcdef0123456789abcdef0123", "01", "")
      .toDF("s").select(col("s").cast("binary").as("content"))
    val got = df.select(Multimodal.sampledFrameIndices(col("content"), 8, 2).as("idx"))
      .collect().map(_.getSeq[Int](0))
    // 36 bytes -> 4 frames -> indices 0,2 kept; 2 bytes -> 0 frames; empty -> 0
    assert(got(0) === Seq(0, 2))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
  }

  test("resize stub truncates binary") {
    import spark.implicits._
    val df = Seq("hello world").toDF("s").select(col("s").cast("binary").as("content"))
    val out = df.select(Multimodal.resizeStub(col("content"), 5).as("r"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(new String(out) === "hello")
  }
}
