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

  /** mm3_frame_dedup — cross-asset binary frame deduplication: every
    * complete 32-byte frame of every payload hashes (md5 over the raw
    * bytes), identical frames collapse to one canonical copy (min
    * (asset_id, frame_idx)), and each asset reports owned vs deduped frame
    * counts — e2e2's chunk-index move at the BINARY level (video pipelines
    * dedup identical frames/segments exactly like this; the hash join never
    * touches the payload after the projection). The oracle replays the
    * hashes because the stub payload is the UTF-8 text bytes (ASCII ⇒ byte
    * positions = char positions); a real codec payload would swap the
    * derivation, not the plan. */
  def mm3FrameDedup(s: SparkSession, dir: String): DataFrame = {
    val frames = Multimodal.documentsAsAssets(t(s, dir, "documents"))
      .select(col("asset_id").cast(LongType).as("asset_id"), col("content"))
      .withColumn("nf", (length(col("content")) / 32).cast(IntegerType))
      .filter(col("nf") >= 1)
      .select(col("asset_id"), col("content"),
        explode(sequence(lit(0), col("nf") - 1)).as("fi"))
      .select(col("asset_id"), col("fi"),
        md5(expr("substring(content, fi * 32 + 1, 32)")).as("fh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fh").orderBy("asset_id", "fi")
    frames.withColumn("rn", row_number().over(w))
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_canonical"))
      .withColumn("n_dup", col("n_frames") - col("n_canonical"))
      .orderBy("asset_id")
  }

  val mm3FrameDedupSql: String =
    """WITH a AS (
      |  SELECT doc_id AS asset_id, text, CAST(len(text) // 32 AS INT) AS nf
      |  FROM documents WHERE len(text) >= 32),
      |f AS (SELECT asset_id, text, unnest(range(0, nf)) AS fi FROM a),
      |h AS (SELECT asset_id, fi,
      |  md5(substr(text, CAST(fi * 32 + 1 AS INT), 32)) AS fh FROM f),
      |r AS (SELECT asset_id,
      |  ROW_NUMBER() OVER (PARTITION BY fh ORDER BY asset_id, fi) AS rn FROM h)
      |SELECT asset_id, COUNT(*) AS n_frames,
      |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
      |  COUNT(*) - CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      |FROM r GROUP BY asset_id ORDER BY asset_id""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "mm3_frame_dedup" -> (mm3FrameDedup _),
    "mm1_asset_bytes" -> (mm1AssetBytes _),
    "mm2_frame_sample" -> (mm2FrameSample _))

  val oracles: Map[String, String] = Map(
    "mm3_frame_dedup" -> mm3FrameDedupSql,
    "mm1_asset_bytes" -> mm1AssetBytesSql,
    "mm2_frame_sample" -> mm2FrameSampleSql)
}
