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
