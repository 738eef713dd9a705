package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scans and sinks (SURVEY §2.1) — every file format the reference touches,
  * as declarative Spark readers/writers so Catalyst keeps pushdown/pruning.
  *
  *  - S1 aminer JSONL scan: `spark.read.json` + projection + offset window
  *    (`scrapping/papers_download.py:37-65`).
  *  - S8 annotations CSV scan with stringified list columns
  *    (`dataset_ner/ner_pipeline.py:69`).
  *  - S9 CoNLL scan: blank-line-delimited sentences of `word TAB tag`
  *    (`dataset_ner/data_transformation.py:74-93`).
  *  - S11 Prodigy JSONL sink: `{text, meta{paragraph_id, paper_id}}`
  *    (`dataset_ner/prodigy_processing.py:20-30`).
  *  - S13/S14 CSV/JSON sinks.
  *  - P3/J4 manifest anti-join: the idempotent re-run pattern replacing
  *    offset-resume (`papers_download.py:49,61`).
  */
object Sources {

  /** S1 — JSONL scan with projection and resumable window. The reference's
    * byte-offset resume becomes offset/limit on an ordered id — at scale,
    * prefer the manifest anti-join (below) which parallelizes.
    *
    * Order contract: the offset/limit window is "file order, single input
    * file" — row windows over an unordered multi-file listing are not stable
    * across runs, exactly like the reference's byte offsets. Callers windowing
    * a directory must sort on an explicit id first (or use the manifest). */
  def readJsonl(spark: SparkSession, path: String, begin: Long = 0L, maxLines: Long = Long.MaxValue): DataFrame = {
    // offset/limit are Int-bounded in Spark; a silent .toInt would corrupt a
    // resume past 2³¹ lines — fail loudly and point at the scalable pattern
    require(begin <= Int.MaxValue && (maxLines == Long.MaxValue || maxLines <= Int.MaxValue),
      s"offset window [$begin, +$maxLines) exceeds Int range — use notYetMaterialized (manifest anti-join) for large resumes")
    val df = spark.read.json(path)
    val windowed = if (begin > 0) df.offset(begin.toInt) else df
    if (maxLines < Long.MaxValue) windowed.limit(maxLines.toInt) else windowed
  }

  /** JSONL scan with corrupt-record capture — the ingest-robustness
    * contract a web-scale crawl needs: malformed lines land in
    * `_corrupt_record` instead of failing the job (PERMISSIVE) or being
    * silently dropped (DROPMALFORMED). Callers split the result on
    * `_corrupt_record IS NULL` and route the rest to quarantine with full
    * line fidelity. The explicit schema matters twice at scale: it skips
    * the inference pass over 100 TB, and it is what makes PERMISSIVE
    * parsing well-defined. Note Spark's restriction: persist/cache the
    * parsed batch before filtering ON `_corrupt_record` alone (raw-scan
    * queries referencing only the internal corrupt column are refused). */
  def readJsonlQuarantine(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** S8 — annotations CSV: header + quoted fields; `entities` and `biluo`
    * are Python-stringified lists parsed into real arrays (the honest-types
    * upgrade, SURVEY §1.2). */
  def readAnnotationsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
      .select(
        col("text"),
        from_json(regexp_replace(col("entities"), "'", "\""),
          ArrayType(ArrayType(StringType))).as("entities_raw"),
        from_json(regexp_replace(col("biluo"), "'", "\""),
          ArrayType(StringType)).as("biluo"),
        (lower(col("has_entity")) === "true").as("has_entity"))

  /** S9 — CoNLL scan: wholetext read → split sentences on blank lines →
    * one row per sentence with aligned token/tag arrays; sentences with <2
    * tokens dropped (P5, `data_transformation.py:81-84`).
    *
    * `sentence_id` is the sentence's block index within its file (posexplode
    * over the per-file wholetext value) — a pure function of file content,
    * stable under any repartitioning, unlike `monotonically_increasing_id`
    * whose values depend on partition layout. `file` disambiguates ids
    * across a multi-file directory scan. */
  def readConll(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"),
        posexplode(split(col("value"), "\\n\\s*\\n")).as(Seq("sentence_id", "block")))
      .select(col("file"), col("sentence_id").cast(LongType),
        filter(split(col("block"), "\\n"), l => length(trim(l)) > 0).as("lines"))
      .select(
        expr("transform(lines, l -> split(l, '\\t')[0])").as("tokens"),
        expr("transform(lines, l -> split(l, '\\t')[1])").as("tags"),
        col("sentence_id"), col("file"))
      .filter(size(col("tokens")) >= 2)

  /** S11 — Prodigy JSONL sink: nested meta struct, one JSON object per line. */
  def writeProdigyJsonl(df: DataFrame, out: String): Unit =
    df.select(col("text"),
      struct(col("paragraph_id"), col("paper_id")).as("meta"))
      .write.mode(SaveMode.Overwrite).json(out)

  /** S13 — CSV sink with header. */
  def writeCsv(df: DataFrame, out: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(out)

  /** S14 — single-file JSON report sink (driver-side coalesce(1): report
    * rows are tiny by contract — metrics, not data). */
  def writeJsonReport(df: DataFrame, out: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(out)

  /** ORC round-trip (generalized source breadth — the other splittable
    * columnar format a lake migration meets; zlib is ORC's default codec).
    * Same pruning/pushdown behavior as parquet through the same DSv2 scan
    * machinery. */
  def writeOrc(df: DataFrame, out: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(out)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Gazetteer scan — `{"dataset_names": ["...", ...]}` (the reference's
    * `db/data_set_labels.json`, 2,948 names) → candidate list for FastMatch.
    * Collected to the driver BY CONTRACT: the gazetteer is broadcast-sized
    * (shard the file and union if it ever is not). */
  def readGazetteer(spark: SparkSession, path: String): Seq[String] =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("dataset_names")).as("name"))
      .collect().map(_.getString(0)).toSeq

  /** P3/J4 — manifest anti-join: keep only rows whose `idCol` is absent from
    * the sink manifest. The scalable replacement for file-exists checks. */
  def notYetMaterialized(input: DataFrame, manifest: DataFrame, idCol: String): DataFrame =
    input.join(manifest.select(idCol).distinct(), Seq(idCol), "left_anti")
}
