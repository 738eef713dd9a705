package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DataType, LongType, StringType}

import graft.operators.{CdcRules, PersistedIndex}
import graft.queries.TextQueries

/** The STREAMING index-maintenance loop (VERDICT r16 #3) — the piece that
  * DRIVES a persisted index family's CDC lifecycle from a live feed instead
  * of batch faces: a `foreachBatch` sink lands every micro-batch of an
  * (id, op, payload) change feed as an immutable DELTA SEGMENT next to
  * the persisted base index, and fires the compaction policy after each
  * batch — when it trips, the segments FOLD into a new base generation
  * (the family's compactCdc recipe applied to accumulated segments) and
  * are retired. [[probe]] serves the family's query over base ∖ dead ∪
  * fresh — at any moment, mid-stream or post-fold, the answer equals batch
  * feed serving over the cumulative feed (spec-pinned), which is the
  * segment-merge invariant that makes the loop safe to run continuously.
  *
  * GENERALIZED over a per-family adapter (VERDICT r17 #3): the segment
  * land / last-writer merge / policy / fold-and-retire kernel is family
  * blind; a [[Family]] supplies (ensure base, fold artifacts, serve,
  * census) — postings, positions, LSH, KG, pHash and IVF all ride the
  * same loop, each folding with the exact compactCdc* recipe its batch
  * faces already spec-pin.
  *
  * Idempotence/restart contract (the resumable ingestion of the
  * reference's `scrapping/papers_download.py:49-61,136-151`, whose
  * skip-marker convention this reuses): segments publish via
  * [[PersistedIndex.buildIfAbsent]]'s staging + atomic-rename, keyed by
  * the Structured Streaming batchId — a batch replayed after a
  * checkpointed restart finds its `_INDEX_COMPLETE` marker (or a fold
  * floor past its id) and skips; a batch that crashed mid-write left only
  * a dead staging dir the next build sweeps.
  *
  * Cross-batch semantics: the LAST op per doc wins (a re-crawled doc
  * supersedes its earlier version; an update then delete is a delete).
  * Serve- and fold-time both reduce the segment union with one
  * change-set-bounded max-struct aggregate, so multi-touch ids are
  * exact, never double-served. WITHIN one micro-batch ordering needs a
  * feed-supplied `seq` column (a Kafka offset, a crawl sequence number);
  * without one the loop REJECTS a batch that touches the same id twice
  * (ADVICE r17: resolving intra-batch multi-touch lexicographically on op
  * would silently resurrect an update-then-delete doc, and the answer
  * would change with trigger batching).
  *
  * Feed op contract: 'a' ids are NEW documents (never previously served);
  * a re-crawl of an existing document is 'u'; 'd' deletes an existing
  * document. This matches every cdcStream/vecFeed generator and is what
  * lets the reduced feed drop into [[CdcRules.feedFrames]] — the exact
  * frames the batch feed faces (ir15/dd22/kg9/ss13/mm10/ir19) serve.
  */
object IndexMaintenance {

  /** One persisted index family's hooks into the maintenance loop. All
    * methods take the SAME (dead, fresh) frames the family's batch feed
    * face derives via [[CdcRules.feedFrames]]. */
  trait Family {
    def name: String
    /** feed id column ("doc_id" / "vec_id"). */
    def idCol: String
    /** payload column the serve/fold consume ("text" / "embedding"). */
    def payloadCol: String
    /** payload type in the feed and segment parquet. */
    def payloadType: DataType
    /** resolve (building if absent) the family's published base index. */
    def ensureBase(s: SparkSession, dir: String): Path
    /** the serving-set size the compaction policy prices changes against. */
    def baseCount(s: SparkSession, base: Path): Long
    /** rewrite the family's artifacts under `tmp` as base ∖ dead ∪ fresh —
      * the compactCdc* recipe with the change set passed in. `split` is the
      * watermark to record in the folded stats (the loop keeps the base's:
      * folded appends' segments are deleted, so nothing re-applies). */
    def foldInto(s: SparkSession, tmp: Path, base: Path,
        dead: DataFrame, fresh: DataFrame, split: Long): Unit
    /** the family's query face over base ∖ dead ∪ fresh. */
    def serve(s: SparkSession, dir: String, base: Path,
        dead: DataFrame, fresh: DataFrame): DataFrame
  }

  /** The postings family — BM25 serving, the loop's original face. */
  object Postings extends Family {
    val name = "postings"
    val idCol = "doc_id"
    val payloadCol = "text"
    val payloadType: DataType = StringType
    def ensureBase(s: SparkSession, dir: String): Path =
      TextQueries.ensureBasePostingsIndex(s, dir)
    def baseCount(s: SparkSession, base: Path): Long =
      PersistedIndex.statsRow(s, base).getAs[Long]("n_docs")
    def foldInto(s: SparkSession, tmp: Path, base: Path,
        dead: DataFrame, fresh: DataFrame, split: Long): Unit =
      TextQueries.foldPostingsArtifacts(s, tmp, base, dead, fresh, split)
    def serve(s: SparkSession, dir: String, base: Path,
        dead: DataFrame, fresh: DataFrame): DataFrame =
      TextQueries.bm25Serve(s, base, dead, fresh, TextQueries.RetrievalQTerms)
  }

  private def segName(batchId: Long) = f"seg_$batchId%012d"
  private def foldName(batchId: Long) = f"base_$batchId%012d"

  private def idOf(p: Path, prefix: String): Long =
    p.getFileName.toString.stripPrefix(prefix).toLong

  private def list(root: Path, prefix: String): Seq[Path] = {
    if (!Files.exists(root)) return Nil
    val it = Files.list(root)
    try {
      val b = Seq.newBuilder[Path]
      it.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(prefix) && PersistedIndex.isBuilt(p)) b += p
      }
      b.result().sortBy(idOf(_, prefix))
    } finally it.close()
  }

  /** (serving base home, fold floor, live segments): the base is the
    * highest COMPLETE fold generation under `root` (else the family's
    * published base index), segments above the floor serve as the
    * in-flight change set. */
  def resolve(s: SparkSession, dir: String, root: Path,
      family: Family = Postings): (Path, Long, Seq[Path]) = {
    val folds = list(root, "base_")
    val (base, floor) =
      if (folds.nonEmpty) (folds.last, idOf(folds.last, "base_"))
      else (family.ensureBase(s, dir), -1L)
    (base, floor, list(root, "seg_").filter(idOf(_, "seg_") > floor))
  }

  /** Land one micro-batch as a segment (idempotent), then fire the
    * policy. The feed schema is (id, op, payload[, seq]); 's' rows (skip
    * markers — unchanged re-crawls) are dropped at the door. Without a
    * feed-supplied `seq`, a batch touching one id twice is rejected
    * loudly — there is no order to resolve it by (ADVICE r17). */
  def applyBatch(s: SparkSession, dir: String, root: Path,
      batch: DataFrame, batchId: Long, family: Family = Postings): Unit = {
    val (_, floor, _) = resolve(s, dir, root, family)
    if (batchId <= floor) return // replayed batch already folded in
    val seg = root.resolve(segName(batchId))
    if (PersistedIndex.isBuilt(seg)) return // replayed after restart
    val hasSeq = batch.columns.contains("seq")
    val rows = batch.filter(col("op") =!= "s")
      .select(col(family.idCol).cast(LongType).as(family.idCol), col("op"),
        col("payload").cast(family.payloadType).as("payload"),
        (if (hasSeq) col("seq").cast(LongType) else lit(0L)).as("seq"))
      .localCheckpoint(true)
    if (!hasSeq) {
      val multi = rows.groupBy(family.idCol).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1L).limit(1).count()
      require(multi == 0L, s"micro-batch $batchId touches one ${family.idCol} " +
        "more than once and the feed carries no seq column - intra-batch op " +
        "order is undefined; supply seq (ingest offset) or split the batch")
    }
    PersistedIndex.buildIfAbsent(seg) { tmp =>
      rows.write.mode("overwrite").parquet(tmp.resolve("feed").toString)
      // one bounded census row so the policy never recounts segments
      rows.agg(count(lit(1)).as("n_changes"))
        .write.mode("overwrite").parquet(tmp.resolve("stats").toString)
    }
    maybeFold(s, dir, root, family)
  }

  /** The cumulative change feed of `segs`, last-writer-wins — reduced to
    * one (id, op, payload) row per id. Change-set bounded: one max-struct
    * aggregate over the segment union; (batch, seq) orders writers. */
  private def changeFeed(s: SparkSession, segs: Seq[Path], family: Family): DataFrame = {
    val feed = segs.map { p =>
      s.read.parquet(p.resolve("feed").toString)
        .withColumn("batch", lit(idOf(p, "seg_")))
    }.reduce(_ unionByName _)
    // struct max is lexicographic on the leading fields: (batch, seq) is a
    // total writer order - batch ids are distinct per segment and seq
    // orders rows within one (or is constant 0 for single-touch batches)
    feed
      .groupBy(family.idCol)
      .agg(max(struct(col("batch"), col("seq"), col("op"), col("payload"))).as("w"))
      .select(col(family.idCol), col("w.op").as("op"), col("w.payload").as("payload"))
      .localCheckpoint(true)
  }

  /** The (dead ids, fresh payload rows) pair every family's serve/fold
    * consumes — [[CdcRules.feedFrames]] over the reduced cumulative feed,
    * exactly what the family's batch feed face derives. */
  private def changeSet(s: SparkSession, segs: Seq[Path], family: Family,
      appendFloor: Long): (DataFrame, DataFrame) =
    CdcRules.feedFrames(changeFeed(s, segs, family),
      family.idCol, family.payloadCol, appendFloor)

  /** Fire [[PersistedIndex.shouldCompact]] on the (base census, segment
    * census) pair; when it trips, fold and retire the segments. The
    * segment census is the summed per-segment change counts — an upper
    * bound when batches re-touch an id, the same over-count Lucene's
    * deletes-pct trigger carries for superseded versions. */
  def maybeFold(s: SparkSession, dir: String, root: Path,
      family: Family = Postings): Option[Path] = {
    sweepRetired(root)
    val (base, _, segs) = resolve(s, dir, root, family)
    if (segs.isEmpty) return None
    val nBase = family.baseCount(s, base)
    val nChanges = segs.map(p =>
      PersistedIndex.statsRow(s, p).getAs[Long]("n_changes")).sum
    if (!PersistedIndex.shouldCompact(nBase, 0L, nChanges)) return None
    Some(fold(s, dir, root, base, segs, family))
  }

  /** Fold the live segments into a new base generation — dead/updated-old
    * rows physically leave every artifact (the family's expunge-deletes
    * recipe), surviving payloads re-derive ONCE. Publish, then STAMP the
    * folded segments for retirement: actual deletion waits a grace window
    * (the two-phase sweepSuperseded contract, ADVICE r17 — a concurrent
    * probe that resolved the segments before the fold keeps its files).
    * The loop's steady state is one base + a short segment tail. */
  private def fold(s: SparkSession, dir: String, root: Path,
      base: Path, segs: Seq[Path], family: Family): Path = {
    val lastId = idOf(segs.last, "seg_")
    val target = root.resolve(foldName(lastId))
    val split = PersistedIndex.readSplit(s, base)
    PersistedIndex.buildIfAbsent(target) { tmp =>
      val (dead, fresh) = changeSet(s, segs, family, split)
      family.foldInto(s, tmp, base, dead, fresh, split)
    }
    segs.foreach { p =>
      val mark = p.resolve("_SUPERSEDED")
      if (!Files.exists(mark))
        Files.writeString(mark, System.currentTimeMillis().toString)
    }
    sweepRetired(root)
    target
  }

  /** Delete retired (stamped) segments and superseded fold generations
    * whose grace window has elapsed. A fold generation below the current
    * floor is stamped here too — generations stack during a long run and
    * only the highest serves. An unparsable stamp RESTARTS the grace
    * window instead of parsing to epoch 0 (immediate deletion — exactly
    * the no-grace hazard the stamp exists to prevent, ADVICE r17). */
  private[streaming] def sweepRetired(root: Path,
      graceMs: Long = PersistedIndex.SweepGraceMs): Unit = {
    val folds = list(root, "base_")
    val floor = if (folds.isEmpty) -1L else idOf(folds.last, "base_")
    val now = System.currentTimeMillis()
    def sweep(p: Path): Unit = {
      val mark = p.resolve("_SUPERSEDED")
      if (!Files.exists(mark)) {
        Files.writeString(mark, now.toString)
      } else {
        val at =
          try Files.readString(mark).trim.toLong
          catch { case _: NumberFormatException =>
            Files.writeString(mark, now.toString); now }
        if (now - at >= graceMs) PersistedIndex.deleteTree(p)
      }
    }
    list(root, "seg_").filter(idOf(_, "seg_") <= floor).foreach(sweep)
    folds.filter(idOf(_, "base_") < floor).foreach(sweep)
  }

  /** Serve the family's query over the loop's current state: the resolved
    * base (persisted artifacts) merged with the live segments' reduced
    * change set — bit-equal to batch feed serving over the cumulative
    * feed, before AND after any fold. */
  def probe(s: SparkSession, dir: String, root: Path,
      family: Family = Postings): DataFrame = {
    val (base, _, segs) = resolve(s, dir, root, family)
    val (dead, fresh) =
      if (segs.isEmpty)
        (CdcRules.emptyIds(s, family.idCol),
          CdcRules.emptyRows(s, family.idCol, family.payloadCol, family.payloadType))
      else changeSet(s, segs, family, PersistedIndex.readSplit(s, base))
    family.serve(s, dir, base, dead, fresh)
  }

  /** The ingestion loop itself: drain a streaming (id, op, payload[, seq])
    * feed through [[applyBatch]] with exactly-once segment landing via
    * the checkpoint + skip-marker pair. AvailableNow so batch-bounded
    * tests and cron-style drains terminate; a production deployment
    * passes a continuous trigger instead. */
  def ingestAvailableNow(s: SparkSession, dir: String, feed: DataFrame,
      root: Path, checkpoint: String, family: Family = Postings): Unit = {
    val q: StreamingQuery = feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(s, dir, root, batch, batchId, family)
      }
      .start()
    q.awaitTermination()
  }
}
