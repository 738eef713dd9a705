package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Multimodal
import Q._

/** Multimodal-column queries — binary payloads + typed metadata derived
  * deterministically from `documents` (payload = UTF-8 text bytes; STUB for
  * real media, real plumbing). Oracle checks cover the relational facts
  * (byte lengths, frame counts, metadata math); byte-moment features are
  * covered in MultimodalSpec. */
object MultimodalQueries {

  /** mm1_asset_bytes — asset table projection: modality routing + payload
    * size + metadata arithmetic. */
  def mm1AssetBytes(s: SparkSession, dir: String): DataFrame =
    Multimodal.documentsAsAssets(t(s, dir, "documents"))
      .select(col("asset_id").cast(LongType).as("asset_id"), col("modality"),
        length(col("content")).as("n_bytes"),
        col("meta.width").as("width"), col("meta.duration_ms").as("duration_ms"))
      .orderBy("asset_id")

  val mm1AssetBytesSql: String =
    """SELECT doc_id AS asset_id,
      |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
      |  octet_length(encode(text)) AS n_bytes,
      |  CAST(n_chars % 640 AS INT) AS width,
      |  n_chars * 10 AS duration_ms
      |FROM documents ORDER BY asset_id""".stripMargin

  /** mm2_frame_sample — every-4th 32-byte frame of each payload: kept-frame
    * count (the sampling plan of a video pipeline, pure codegen). */
  def mm2FrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.documentsAsAssets(t(s, dir, "documents"))
      .select(col("asset_id").cast(LongType).as("asset_id"),
        size(Multimodal.sampledFrameIndices(col("content"), 32, 4)).as("n_sampled"))
      .orderBy("asset_id")

  val mm2FrameSampleSql: String =
    """SELECT doc_id AS asset_id,
      |  CAST((octet_length(encode(text)) // 32 + 3) // 4 AS INT) AS n_sampled
      |FROM documents ORDER BY asset_id""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "mm1_asset_bytes" -> (mm1AssetBytes _),
    "mm2_frame_sample" -> (mm2FrameSample _))

  val oracles: Map[String, String] = Map(
    "mm1_asset_bytes" -> mm1AssetBytesSql,
    "mm2_frame_sample" -> mm2FrameSampleSql)
}
