package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column layer — image/audio/video as opaque `binary` columns
  * with typed metadata, the shape a 100 TB training-data pipeline needs.
  *
  * The media codecs themselves are NOT in this container (prompt contract),
  * so the decode kernel is a deterministic stand-in clearly marked STUB —
  * but everything Spark-side is real and tested: the schema, the batch
  * iterator boundary (mapPartitions — the JVM analogue of mapInPandas:
  * per-partition kernel init, rows streamed through), and the rule that
  * binary payloads never enter a shuffle key (metadata columns do).
  */
object Multimodal {

  /** Typed media-asset schema (binary + metadata). */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Deterministic asset table derived from `documents`: the UTF-8 bytes of
    * the text stand in for a media payload (STUB payload, real binary
    * column + metadata plumbing). */
  def documentsAsAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast(StringType).as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("modality"),
      col("text").cast(BinaryType).as("content"),
      struct(
        (col("n_chars") % 640).cast(IntegerType).as("width"),
        (col("n_chars") % 480).cast(IntegerType).as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast(LongType).as("duration_ms")).as("meta"))

  /** STUB decode kernel: a real implementation calls an image/audio codec.
    * The stand-in extracts byte length and byte-moment features — the
    * signature and per-partition batching are the real contract. */
  private def decodeKernel(content: Array[Byte]): (Int, Double, Double) = {
    if (content == null) return (0, 0.0, 0.0)
    val n = content.length
    var sum = 0.0
    var sumSq = 0.0
    var i = 0
    while (i < n) { val v = content(i).toDouble; sum += v; sumSq += v * v; i += 1 }
    val mean = if (n == 0) 0.0 else sum / n
    (n, mean, if (n == 0) 0.0 else sumSq / n - mean * mean)
  }

  /** Feature extraction over the binary column via mapPartitions: one kernel
    * "session" per partition (where a real codec would init), rows
    * streamed — never a per-row init, never a driver collect. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    import assets.sparkSession.implicits._
    val bytesIdx = assets.schema.fieldIndex("content")
    val idIdx = assets.schema.fieldIndex("asset_id")
    assets.mapPartitions { rows =>
      // [STUB] real codec init goes here, once per partition
      rows.map { r =>
        val (len, mean, variance) = decodeKernel(
          if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx))
        (r.getString(idIdx), len, mean, variance)
      }
    }.toDF("asset_id", "n_bytes", "byte_mean", "byte_var")
  }

  /** Frame sampling: indices of every k-th fixed-size frame in the payload —
    * pure expression (stays in codegen; a real sampler would slice bytes per
    * kept index with `substring(content, idx*frameBytes+1, frameBytes)`). */
  def sampledFrameIndices(content: Column, frameBytes: Int, everyK: Int): Column = {
    val nFrames = (length(content).cast(IntegerType) / frameBytes).cast(IntegerType)
    // guard: Spark's sequence(0, -1) would DESCEND, not produce empty
    when(nFrames >= 1,
      filter(sequence(lit(0), nFrames - 1), i => i % everyK === 0))
      .otherwise(array().cast(ArrayType(IntegerType)))
  }

  /** Resize stub: binary→binary projection; STUB truncates bytes (a real
    * implementation re-encodes via codec). */
  def resizeStub(content: Column, targetBytes: Int): Column =
    substring(content, 1, targetBytes)
}
