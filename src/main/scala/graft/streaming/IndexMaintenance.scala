package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

import graft.operators.PersistedIndex
import graft.queries.{Q, TextQueries}

/** The STREAMING index-maintenance loop (VERDICT r16 #3) — the piece that
  * DRIVES the postings family's CDC lifecycle from a live feed instead of
  * batch faces: a `foreachBatch` sink lands every micro-batch of an
  * (doc_id, op, payload) change feed as an immutable DELTA SEGMENT next to
  * the persisted base index, and fires the compaction policy after each
  * batch — when it trips, the segments FOLD into a new base generation
  * (the compactCdc recipe applied to accumulated segments) and are
  * retired. [[probe]] serves BM25 over base ∖ touched ∪ surviving — at
  * any moment, mid-stream or post-fold, the answer equals batch feed
  * serving over the cumulative feed (spec-pinned), which is the
  * segment-merge invariant that makes the loop safe to run continuously.
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
  * change-set-bounded `max_by(batch)` aggregate, so multi-touch ids are
  * exact, never double-served.
  */
object IndexMaintenance {

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
  def resolve(s: SparkSession, dir: String, root: Path): (Path, Long, Seq[Path]) = {
    val folds = list(root, "base_")
    val (base, floor) =
      if (folds.nonEmpty) (folds.last, idOf(folds.last, "base_"))
      else (TextQueries.ensureBasePostingsIndex(s, dir), -1L)
    (base, floor, list(root, "seg_").filter(idOf(_, "seg_") > floor))
  }

  /** Land one micro-batch as a segment (idempotent), then fire the
    * policy. The feed schema is (doc_id, op, payload); 's' rows (skip
    * markers — unchanged re-crawls) are dropped at the door. */
  def applyBatch(s: SparkSession, dir: String, root: Path,
      batch: DataFrame, batchId: Long): Unit = {
    val (_, floor, _) = resolve(s, dir, root)
    if (batchId <= floor) return // replayed batch already folded in
    val seg = root.resolve(segName(batchId))
    if (PersistedIndex.isBuilt(seg)) return // replayed after restart
    val rows = batch.filter(col("op") =!= "s")
      .select(col("doc_id").cast(LongType).as("doc_id"), col("op"),
        col("payload").cast("string").as("payload"))
      .localCheckpoint(true)
    PersistedIndex.buildIfAbsent(seg) { tmp =>
      rows.write.mode("overwrite").parquet(tmp.resolve("feed").toString)
      // one bounded census row so the policy never recounts segments
      rows.agg(count(lit(1)).as("n_changes"))
        .write.mode("overwrite").parquet(tmp.resolve("stats").toString)
    }
    maybeFold(s, dir, root)
  }

  /** The cumulative change set of `segs`, last-writer-wins:
    * (touched ids, surviving (doc_id, text) rows). Change-set bounded —
    * one max_by aggregate over the segment union. */
  private def changeSet(s: SparkSession, segs: Seq[Path]): (DataFrame, DataFrame) = {
    val feed = segs.map { p =>
      s.read.parquet(p.resolve("feed").toString)
        .withColumn("batch", lit(idOf(p, "seg_")))
    }.reduce(_ unionByName _)
    // struct max is lexicographic on the leading field: batch ids are
    // distinct per segment, so this IS last-writer-wins
    val last = feed
      .groupBy("doc_id")
      .agg(max(struct(col("batch"), col("op"), col("payload"))).as("w"))
      .select(col("doc_id"), col("w.op").as("op"), col("w.payload").as("payload"))
      .localCheckpoint(true)
    (last.select("doc_id"),
      last.filter(col("op").isin("u", "a")).select(col("doc_id"),
        col("payload").as("text")))
  }

  /** Fire [[PersistedIndex.shouldCompact]] on the (base census, segment
    * census) pair; when it trips, fold and retire the segments. The
    * segment census is the summed per-segment change counts — an upper
    * bound when batches re-touch an id, the same over-count Lucene's
    * deletes-pct trigger carries for superseded versions. */
  def maybeFold(s: SparkSession, dir: String, root: Path): Option[Path] = {
    val (base, _, segs) = resolve(s, dir, root)
    if (segs.isEmpty) return None
    val nBase = PersistedIndex.statsRow(s, base).getAs[Long]("n_docs")
    val nChanges = segs.map(p =>
      PersistedIndex.statsRow(s, p).getAs[Long]("n_changes")).sum
    if (!PersistedIndex.shouldCompact(nBase, 0L, nChanges)) return None
    Some(fold(s, dir, root, base, segs))
  }

  /** Fold the live segments into a new base generation — dead/updated-old
    * rows physically leave every artifact (the expunge-deletes recipe),
    * surviving payloads tokenize ONCE, stats recount from the folded
    * doclen (one id-only artifact pass). Publish, then retire the folded
    * segments: the loop's steady state is one base + a short segment
    * tail. */
  private def fold(s: SparkSession, dir: String, root: Path,
      base: Path, segs: Seq[Path]): Path = {
    val lastId = idOf(segs.last, "seg_")
    val target = root.resolve(foldName(lastId))
    PersistedIndex.buildIfAbsent(target) { tmp =>
      val nBk = TextQueries.readBuckets(s, base)
      val (touched, fresh) = changeSet(s, segs)
      val freshTf = fresh
        .select(col("doc_id"), explode(Q.tokens(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      graft.sources.Layout.writePartitioned(
        s.read.parquet(base.resolve("postings").toString)
          .select("doc_id", "word", "tf")
          .join(touched, Seq("doc_id"), "left_anti")
          .unionByName(freshTf)
          .withColumn("bucket", pmod(Q.detHash(col("word")), lit(nBk))),
        tmp.resolve("postings").toString, "bucket")
      val doclen = s.read.parquet(base.resolve("doclen").toString)
        .join(touched, Seq("doc_id"), "left_anti")
        .unionByName(freshTf.groupBy("doc_id").agg(sum("tf").as("dl")))
      doclen.write.mode("overwrite").parquet(tmp.resolve("doclen").toString)
      val oldSplit = PersistedIndex.readSplit(s, base)
      s.read.parquet(tmp.resolve("doclen").toString)
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum("dl"), lit(0L)).as("total_dl"))
        .withColumn("split_id", lit(oldSplit))
        .withColumn("n_buckets", lit(nBk))
        .write.mode("overwrite").parquet(tmp.resolve("stats").toString)
    }
    segs.foreach(PersistedIndex.deleteTree)
    target
  }

  /** Serve BM25 for `qterms` over the loop's current state: the resolved
    * base (bucket-pruned persisted artifacts) merged with the live
    * segments' last-writer change set — bit-equal to batch feed serving
    * over the cumulative feed, before AND after any fold. */
  def probe(s: SparkSession, dir: String, root: Path,
      qterms: Seq[String] = TextQueries.RetrievalQTerms): DataFrame = {
    val (base, _, segs) = resolve(s, dir, root)
    val (dead, fresh) =
      if (segs.isEmpty)
        (graft.operators.CdcRules.emptyIds(s, "doc_id"),
          graft.operators.CdcRules.emptyRows(s, "doc_id", "text",
            org.apache.spark.sql.types.StringType))
      else changeSet(s, segs)
    TextQueries.bm25Serve(s, base, dead, fresh, qterms)
  }

  /** The ingestion loop itself: drain a streaming (doc_id, op, payload)
    * feed through [[applyBatch]] with exactly-once segment landing via
    * the checkpoint + skip-marker pair. AvailableNow so batch-bounded
    * tests and cron-style drains terminate; a production deployment
    * passes a continuous trigger instead. */
  def ingestAvailableNow(s: SparkSession, dir: String, feed: DataFrame,
      root: Path, checkpoint: String): Unit = {
    val q: StreamingQuery = feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(s, dir, root, batch, batchId)
      }
      .start()
    q.awaitTermination()
  }
}
