package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, Trigger}

/** Structured Streaming layer — the streaming faces of the event analytics
  * (EventQueries runs the same logic over the bounded table; SURVEY §2.14:
  * the reference is batch-only, this is the declared Spark-native
  * extension).
  *
  *  - windowed counts: watermark + tumbling window — identical logical plan
  *    to ev2_tumbling_agg; incremental execution is Spark's job.
  *  - sessionize: gap-based sessions as a custom state operator
  *    (flatMapGroupsWithState + event-time timeout) — the streaming twin of
  *    ev1_sessionize. State per user is O(1): (start, last, count, sum).
  *  - file-source ingestion with Trigger.AvailableNow — incremental batch
  *    over a landing directory, the scalable replacement for the
  *    reference's resumable offset scans.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(startUs: Long, lastUs: Long, nEvents: Long, totalValue: Double)

  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long,
      total_value: Double)

  val GapMinutes = 30

  /** Tumbling 1-hour windowed counts per event type, 2-hour watermark.
    * Works identically on a streaming or batch DataFrame. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based sessionization as custom per-key state: a session closes when
    * event time advances past last-event + gap (event-time timeout). */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = GapMinutes * 60L * 1000000L

    def updateState(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      if (state.hasTimedOut) {
        val s = state.get
        out += Session(userId, s.startUs, s.lastUs, s.nEvents, s.totalValue)
        state.remove()
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var cur = state.getOption
        sorted.foreach { e =>
          val us = e.ts.getTime * 1000L
          cur match {
            case Some(s) if us - s.lastUs <= gapUs =>
              cur = Some(SessionState(s.startUs, us, s.nEvents + 1, s.totalValue + e.value))
            case Some(s) =>
              out += Session(userId, s.startUs, s.lastUs, s.nEvents, s.totalValue)
              cur = Some(SessionState(us, us, 1L, e.value))
            case None =>
              cur = Some(SessionState(us, us, 1L, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastUs / 1000L + GapMinutes * 60L * 1000L)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateState)
  }

  /** Gap-based sessionization via the BUILT-IN `session_window` aggregate —
    * the declarative twin of [[sessionize]]: same 30-minute gap semantics,
    * but the engine owns session state merging (Spark's session-window state
    * store merges overlapping windows per key as events arrive; watermark
    * evicts closed sessions). Prefer this when per-session output columns
    * are expressible as aggregates — drop to flatMapGroupsWithState (the
    * [[sessionize]] recipe) only for custom state machines the aggregate
    * surface can't express. Emits one row per closed session in Append
    * mode.
    *
    * Boundary alignment: the built-in merges only on STRICT overlap
    * (next.ts < last.ts + gap), while [[sessionize]] and batch ev1 keep an
    * event at EXACTLY last+gap in the same session (`us - lastUs <= gapUs`).
    * Passing gap+1µs to session_window makes the two semantics identical at
    * the data's microsecond granularity: an exactly-30-minute follower now
    * satisfies the strict bound, and the next representable instant still
    * splits — exercised at the boundary in EventStreamsSpec. */
  def sessionWindowCounts(events: DataFrame, gapMinutes: Int = GapMinutes): DataFrame =
    events
      .withWatermark("ts", "1 minute")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapMinutes * 60L * 1000000L + 1} microseconds"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming top-k users by purchase value — the streaming twin of
    * ev3_top_users (same filter, same DECIMAL money sum per Q.scala rule 1,
    * so near-tied totals never swap rank run-to-run). A running unwindowed
    * aggregate, so it must emit in Complete mode (the result set is a
    * rolling leaderboard, not append-only); state is one (count, sum) pair
    * per purchasing user. The sort+limit happens on the tiny aggregated
    * result each trigger, never on events. */
  def topUsers(events: DataFrame, k: Int = 10): DataFrame =
    events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        graft.queries.Q.decSum(col("value")).as("total"))
      .orderBy(desc("total"), col("user_id"))
      .limit(k)

  /** Streaming Count-Min sketch — the streaming face of
    * [[graft.operators.Sketch.buildCms]], and deliberately the SAME plan:
    * posexplode to (row, col) coordinates + incremental count aggregation.
    * In update mode each micro-batch emits only the cells it touched; the
    * sink upserts by (row_idx, col_idx) and [[graft.operators.Sketch
    * .estimates]] probes the maintained table at any moment. This is how a
    * 100 TB ingest keeps live approximate term frequencies without ever
    * re-scanning the corpus: state is capped at depth·width cells
    * regardless of stream length — no watermark needed because the key
    * space, not time, bounds it. CmsStreamSpec proves stream ≡ batch on
    * the union of all micro-batches. */
  def sketchStream(items: DataFrame, itemCol: String,
      depth: Int = graft.operators.Sketch.DefaultDepth,
      width: Long = graft.operators.Sketch.DefaultWidth): DataFrame =
    graft.operators.Sketch.buildCms(items, col(itemCol), depth, width)

  /** SQ8 encode — the streaming face of `ss6_sq8_topk`'s quantization
    * stage: arriving vectors compress to 8-bit codes against the FROZEN
    * per-dimension [lo, span] corpus statistics, which ride as two
    * d-element literals (the d-bounded stats contract of the batch face).
    * e6-fix → subtract lo → clamp to [0, span] → scale by 255/span, all
    * integer — ONE stateless projection, byte-identical codes to the
    * batch encode (Sq8StreamSpec), so the vector store ingests compressed
    * at scan speed and a stats refresh is a restart with new literals.
    * The clamp is the point of the streaming face (ADVICE r11): NEW
    * vectors routinely fall outside the FROZEN corpus [lo, lo+span]
    * envelope, and standard SQ8 saturates them to the range edges
    * (codes 0/255) rather than emitting out-of-range codes that corrupt
    * symmetric code-distance math downstream. */
  def sq8EncodeStream(vecs: DataFrame, lo: Seq[Long], span: Seq[Long],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(lo.length == span.length, "per-dimension stats must align")
    vecs
      .withColumn("__xi", expr(
        s"transform($vecCol, v -> CAST(ROUND(CAST(v AS DOUBLE) * 1e6) AS BIGINT))"))
      .withColumn("__lo", typedlit(lo))
      .withColumn("__span", typedlit(span))
      .withColumn("code", expr(
        """zip_with(zip_with(__xi, __lo, (x, l) -> x - l), __span,
          |  (n, sp) -> IF(sp = 0L, 0L,
          |    (LEAST(GREATEST(n, 0L), sp) * 255L) div sp))""".stripMargin))
      .select(col(idCol), col("code"))
  }

  /** HLL register maintenance — the streaming face of `hll1_distinct`'s
    * build: the register table is a running `max(ρ)` per bucket, which is
    * exactly a streaming aggregation with m-bounded state (256 rows at
    * p=8, REGARDLESS of how many distinct items the stream has carried) —
    * where the exact `count_distinct` this replaces grows state with
    * every distinct key. Update/complete mode; the estimate is read off
    * the registers by [[graft.operators.Sketch.hllEstimate]] at any
    * point, and registers from independent streams/partitions union by
    * max (spec-pinned against the batch build of the union). */
  def hllRegisterStream(items: DataFrame, itemCol: String): DataFrame =
    graft.operators.Sketch.hllRegisters(items, col(itemCol), Seq.empty)

  /** Streaming PSI drift monitor — the streaming face of `dq6_psi_drift`:
    * each watermarked window's token distribution (over the fixed 64-bin
    * hashed feature space) scores a Population Stability Index against a
    * REFERENCE distribution from the training snapshot, which rides in
    * the plan as 64 precomputed double literals (the sketch-literal
    * pattern) — so the only stateful operator is ONE windowed aggregate
    * whose state is 64 counters per in-horizon window, and the PSI
    * itself is a stateless projection (per-bin terms e9-rounded before an
    * integer sum, the dq6 convention). This is the alerting shape: a
    * crawler flipping language mix or flooding boilerplate trips the
    * `shifted` band within one window, long before corpus-level batch
    * audits run. Reference refresh = restart with new literals (the
    * Bloom/sketch convention). */
  def psiDriftStream(docs: DataFrame, refCounts: Seq[Long],
      windowLen: String = "1 hour", horizon: String = "2 hours"): DataFrame = {
    require(refCounts.length == 64, s"need 64 reference bins, got ${refCounts.length}")
    val tRef = refCounts.sum
    val po: IndexedSeq[Double] =
      (0 until 64).map(i => (refCounts(i) + 1).toDouble / (tRef + 64).toDouble)
    val counts = (0 until 64).map(i =>
      sum(when(col("bin") === i, 1L).otherwise(0L)).as(s"c$i"))
    val agg = docs
      .select(col("ts"), explode(graft.queries.Q.tokens(col("text"))).as("w"))
      .withColumn("bin", graft.queries.Q.detHash(col("w"), 29) % 64)
      .withWatermark("ts", horizon)
      .groupBy(window(col("ts"), windowLen))
      .agg(counts.head, counts.tail: _*)
    val tNew = (0 until 64).map(i => col(s"c$i")).reduce(_ + _)
    val terms = (0 until 64).map { i =>
      val pn = (col(s"c$i") + 1).cast("double") / (col("__t_new") + 64).cast("double")
      round((pn - lit(po(i))) * log(pn / lit(po(i))) * lit(1e9)).cast("long")
    }
    agg
      .withColumn("__t_new", tNew)
      .withColumn("psi_e9", terms.reduce(_ + _))
      .withColumn("band",
        when(col("psi_e9") < 100000000L, "stable")
          .when(col("psi_e9") < 250000000L, "moderate").otherwise("shifted"))
      .select(col("window.start").as("window_start"),
        col("__t_new").as("n_tokens"), col("psi_e9"), col("band"))
  }

  /** IVF delta-assign — the streaming face of `ss7_ivf_refresh`'s assign
    * stage: each arriving vector scores against the FROZEN centroid index,
    * which rides in the plan as a literal/broadcast array
    * ([[graft.operators.Similarity.centroidIndex]] — the ss2 probe
    * contract), so norm + nearest-cell argmax are ONE stateless projection:
    * no join, no watermark, no state store; index maintenance keeps up
    * with ingest at scan speed. The e6-rounded scorer is byte-identical to
    * the batch face (IvfAssignStreamSpec pins row-for-row parity), so a
    * vector lands in the same cell wherever it's assigned. The MERGE into
    * the persisted cell table is the sink's job (foreachBatch keyed
    * upsert — the set2 CDC shape ss7 proves in batch); a retrain swaps the
    * index literal on restart, exactly like a sketch or Bloom refresh. */
  def ivfAssignStream(vecs: DataFrame, index: Column,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.plans.GraftFunctions.register(vecs.sparkSession)
    val normed = vecs.withColumn("__norm",
      sqrt(call_function("vec_dot", col(vecCol), col(vecCol))))
    graft.operators.Similarity.assignCells(normed, index, vecCol, "__norm",
        (d, cn, n) => round(lit(1e6) * d / (cn * n)).cast("long"))
      .select(col(idCol), col("cell"))
  }

  /** Perceptual-hash ingest — the streaming face of `mm4_phash_neardup`'s
    * hash stage: every arriving asset (doc_id + payload text stand-in)
    * gets its 64-bit pHash in ONE stateless projection (thumbnail pooling
    * → fixed-point DCT → sign-vs-median — no join, no state), so the
    * perceptual near-dup check against the persisted hash store is a
    * foreachBatch banded lookup (the dd9 band equi-join on 16-bit keys),
    * exactly how a crawler dedups images at ingest instead of in nightly
    * batch. Bit-identical hashes to the batch face (PhashStreamSpec). */
  def phashStream(assets: DataFrame): DataFrame =
    graft.queries.MultimodalQueries.phashSigs(assets)

  /** Fuzzy alias-candidate generation — the streaming face of
    * `el1_mention_link`'s candidate stage: every arriving document's words
    * fan out into their deletion-neighborhood variants IN-PLAN (stateless),
    * equi-join the FROZEN alias catalog's (bounded, precomputed) variant
    * table as a stream-static join, and the exact levenshtein verify emits
    * (doc_id, w, entity, dist) candidate links at scan speed. The
    * lambda-architecture split is deliberate: candidate GENERATION is
    * stateless and runs at ingest; prior/context DISAMBIGUATION (el1/el2's
    * window) is a batch resolution over the accumulated candidates —
    * putting the argmin in the stream would demand per-(doc, word)
    * aggregation state for no freshness gain. Parity vs the batch
    * candidate set is spec-pinned (AliasLinkStreamSpec). */
  /** Entity co-occurrence edge contributions — kg1's EDGE EMISSION as a
    * stateless stream: each arriving document runs the broadcast
    * Aho-Corasick matcher in-plan, its distinct matched entities pair up
    * (e1 < e2) WITHIN the row (array_distinct + an indexed-transform
    * pair expansion — a streaming `distinct()` would be a stateful agg),
    * and the (doc_id, e1, e2) contributions stream out. The graph
    * AGGREGATION (co-document weights, NPMI, rank) deliberately stays
    * batch — the aliasLinkStream lambda split: edge weights need
    * all-time counts, per-doc emission needs none. One matcher pass per
    * doc; pair fan-out ≤ |G|² within a single document. */
  def entityEdgeStream(docs: DataFrame, gazetteer: Seq[String]): DataFrame = {
    val fm = graft.operators.FastMatch.matcher(gazetteer)
    docs
      .withColumn("ents", array_sort(array_distinct(
        transform(fm(col("text")), m => m.getField("matched")))))
      .withColumn("pair", explode(expr(
        "flatten(transform(ents, (x, i) -> " +
          "transform(slice(ents, i + 2, size(ents)), y -> struct(x AS e1, y AS e2))))")))
      .select(col("doc_id"), col("pair.e1").as("e1"), col("pair.e2").as("e2"))
  }

  /** neardupGateStream — dd18's ingest near-dup gate as a STREAM: each
    * arriving document is minhashed per row (no shuffle —
    * [[graft.operators.Dedup.minhashSignaturesPerRow]]), banded in the same
    * projection, and its band keys stream-static-joined against the
    * persisted base signature store (dd18's `sigs` artifact): one collision
    * row (new_id, base_id, band) per shared band. Stateless end to end — no
    * state store, no watermark; rolling collisions up to shared_bands
    * counts is the consumer's choice (a stateful agg, or dd18's batch
    * compactor at the next snapshot). The static side is banded once per
    * (micro-)batch from the broadcast-friendly signature frame. */
  def neardupGateStream(docs: DataFrame, baseSigs: DataFrame): DataFrame = {
    import graft.operators.Dedup
    val d = Dedup.bandedSignatures(
        Dedup.minhashSignaturesPerRow(docs, "doc_id", "text"), "doc_id")
      .withColumnRenamed("doc_id", "new_id")
    val base = Dedup.bandedSignatures(baseSigs, "doc_id")
      .select(col("doc_id").as("base_id"), col("band"), col("key"))
    d.join(base, Seq("band", "key"))
      .select(col("new_id"), col("base_id"), col("band"))
  }

  /** cdcStream — the ingest-side CLASSIFIER of the tombstone faces' change
    * feed (the shared [[graft.operators.CdcRules]] doc-keyed rules): each
    * arriving (re-)crawled row is tagged against the feed watermark — 'd'
    * (delete: tombstone only), 'u' (update: tombstone + re-add, carrying
    * the re-crawled reversed payload), 'a' (append: past the watermark),
    * or 's' (skip: an unchanged base re-crawl — the reference's
    * skip-marker idempotency, `scrapping/papers_download.py:49-61`).
    * Stateless — the op is a pure function of (doc_id, split) — so the
    * gate runs at scan speed with no state store; a sink routes 'd'/'u'
    * ids to the tombstone set and 'u'/'a' rows to the fresh segment, and
    * the batch tombstone faces consume exactly these ID sets
    * (spec-pinned). The 'u' PAYLOAD here is the text-family convention
    * ([[graft.operators.CdcRules.reversedTokens]], what dd20/kg7/mm8
    * re-derive from); the postings family re-crawls to the literal
    * 'redacted' and the vector family negates — a sink feeding those
    * segments applies its own family transform to the id sets, not this
    * payload. Rows classified 'd'/'s' carry a null payload: nothing
    * downstream may index them. */
  def cdcStream(docs: DataFrame, watermark: Long): DataFrame = {
    import graft.operators.CdcRules
    docs.select(col("doc_id"),
      CdcRules.opOf(col("doc_id"), watermark).as("op"),
      when(col("doc_id") > watermark, col("text"))
        .when(CdcRules.isUpdate(col("doc_id"), watermark),
          CdcRules.reversedTokens(col("text")))
        .otherwise(lit(null).cast("string")).as("payload"))
  }

  /** postingsStream — the streaming ingest arm of ir10's delta segment:
    * per-document (word, tf) postings rows emitted STATELESSLY (a
    * document's tokens all live in its own row, so term frequencies are a
    * run-length fold over the SORTED token array — no groupBy, no state
    * store; the explode afterwards is stateless). Output rows are exactly
    * the tfTable's rows for the same documents (spec-pinned), so a sink
    * appending them to the in-flight segment feeds ir10's merge unchanged.
    * Fold is O(len·log len) per doc; the accumulator array is
    * distinct-word-bounded. */
  def postingsStream(docs: DataFrame): DataFrame = {
    val sorted = sort_array(graft.queries.Q.tokens(col("text")))
    val accType = "array<struct<word:string,tf:bigint>>"
    val init = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), expr("array()").cast(accType).as("acc"))
    val folded = aggregate(sorted, init,
      (acc, x) => {
        val same = acc.getField("prev") === x
        struct(x.as("prev"),
          when(same, acc.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          when(same || acc.getField("prev").isNull, acc.getField("acc"))
            .otherwise(array_append(acc.getField("acc"),
              struct(acc.getField("prev").as("word"), acc.getField("run").as("tf"))))
            .as("acc"))
      },
      acc => when(acc.getField("prev").isNull, acc.getField("acc"))
        .otherwise(array_append(acc.getField("acc"),
          struct(acc.getField("prev").as("word"), acc.getField("run").as("tf")))))
    docs.select(col("doc_id"), explode(folded).as("wt"))
      .select(col("doc_id"), col("wt.word").as("word"), col("wt.tf").as("tf"))
  }

  /** qualityGateStream — dq7's whole gate battery as ONE stateless stream
    * projection: each arriving document gets its Gopher (ta10), C4 (ta18),
    * entropy (ta11), and repetition (ta7) verdicts plus the conjunction
    * (`admitted` — exactly dq7's stage-4 survivor predicate). Every rule is
    * per-row (the repetition gate rides [[graft.queries.CurationQueries
    * .ta7KeepCol]]'s sorted-run-length fold instead of ta7Core's doc-keyed
    * shuffle), so the ingest filter runs at scan speed with no state store,
    * no watermark, no join — and the expressions are the SAME columns the
    * batch batteries project, so a document is admitted at ingest iff the
    * batch funnel would keep it (spec-pinned corpus-wide). */
  def qualityGateStream(docs: DataFrame): DataFrame = {
    import graft.queries.{CurationQueries, TextQueries}
    val (_, rWc, rMwl, rSym, rAlpha, rStop) = TextQueries.ta10Rules(col("text"))
    val (_, _, _, _, _, c4Pass) = TextQueries.ta18FromNoisy(col("__noisy"))
    docs
      .withColumn("__noisy", TextQueries.ta18Noisy(col("doc_id"), col("text")))
      .withColumn("__toks", graft.queries.Q.tokens(col("text")))
      .withColumn("gopher", rWc && rMwl && rSym && rAlpha && rStop)
      .withColumn("c4", c4Pass)
      .withColumn("entropy",
        CurationQueries.ta11EntropyE6(col("text")) >= CurationQueries.Ta11KeepE6)
      .withColumn("repetition", CurationQueries.ta7KeepCol("__toks"))
      .select(col("doc_id"), col("gopher"), col("c4"), col("entropy"), col("repetition"),
        (col("gopher") && col("c4") && col("entropy") && col("repetition")).as("admitted"))
  }

  def aliasLinkStream(docs: DataFrame, aliases: DataFrame): DataFrame = {
    val av = graft.queries.MatchQueries.variantExplode(aliases, "entity")
      .select(col("v"), col("entity"))
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .transform(graft.queries.MatchQueries.variantExplode(_, "w"))
      .join(av, Seq("v"))
      .withColumn("dist", levenshtein(col("w"), col("entity")))
      .filter(col("dist") <= 1)
      .select("doc_id", "w", "entity", "dist")
  }

  /** CMS-LM perplexity gate — the streaming face of `ta15_cms_ppl`
    * (CurationQueries): score each arriving document's mean unigram NLL
    * under a TRAINED Count-Min-compressed LM and flag the high-perplexity
    * tail. The sketch rides in the plan as one dense depth×width literal
    * ([[graft.operators.Sketch.estimatorLit]], the Bloom-gate pattern), so
    * per-token estimates, the per-doc NLL fold, and the gate are ONE
    * stateless projection — no join, no watermark, no state store: the
    * quality filter runs at scan speed on an unbounded ingest stream.
    * Per-term e6 math is IDENTICAL to the batch face (spec-pinned parity),
    * so a document scores the same wherever it's evaluated. Flagged rows
    * are marked, never dropped (quarantine convention). */
  def pplGateStream(docs: DataFrame, sketch: DataFrame, totalTrainTokens: Long,
      gateMeanNllE6: Long,
      depth: Int = graft.queries.CurationQueries.CmsLmDepth,
      width: Long = graft.queries.CurationQueries.CmsLmWidth): DataFrame = {
    val est = graft.operators.Sketch.estimatorLit(sketch, depth, width)
    val denom = lit((totalTrainTokens + width).toDouble)
    docs
      .withColumn("terms_e6", transform(graft.queries.Q.tokens(col("text")), w =>
        round(log((est(w) + 1).cast("double") / denom) * lit(-1e6)).cast("long")))
      .withColumn("n_tokens", size(col("terms_e6")).cast("long"))
      .withColumn("nll_e6_sum",
        aggregate(col("terms_e6"), lit(0L), (a, x) => a + x))
      .withColumn("mean_nll_e6",
        round(col("nll_e6_sum") / col("n_tokens")).cast("long"))
      .withColumn("flagged", (col("mean_nll_e6") > gateMeanNllE6).cast("int"))
      .drop("terms_e6")
  }

  /** Bigram-LM perplexity gate — the streaming face of `ta14_bigram_ppl`
    * (r10, closing the r9 verdict item): score each arriving document's
    * mean transition NLL under the Jelinek-Mercer-interpolated bigram LM.
    *
    * Why this is NOT stateless like [[pplGateStream]]: ta9/ta15's unigram
    * LMs compress to a fixed depth×width literal, but a bigram table is
    * vocabulary²-bounded — far past the literal/broadcast budget at any
    * real vocabulary — so the honest shape is the [[enrichedRevenue]]
    * pattern: a STATELESS stream-static join per micro-batch against the
    * persisted LM tables (`uni`, `big` — re-read per trigger, so a
    * retrained LM picks up live), then one watermarked per-(window, doc)
    * aggregation, the only stateful operator, with state evicted at the
    * horizon. Per-term e6 math is byte-identical to the batch face
    * (BigramPplStreamSpec pins doc-for-doc parity); transitions explode in
    * the array domain exactly like ta14 — no per-token window.
    *
    * At scale: the per-batch joins key on tokens/token-pairs
    * (vocabulary-bounded, well-distributed; bucket the persisted LM on the
    * join keys to make them shuffle-free), and aggregation state is one
    * row per in-horizon document. Flagged rows are marked, never dropped
    * (quarantine convention). */
  def bigramPplStream(docs: DataFrame, uni: DataFrame, big: DataFrame,
      totalTrainTokens: Long, vocabSize: Long, gateMeanNllE6: Long,
      lambda: Double = graft.queries.CurationQueries.BigramLambda,
      horizon: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val pb = when(col("ucnt_w1").isNotNull && col("bcnt").isNotNull,
      col("bcnt").cast(DoubleType) / col("ucnt_w1").cast(DoubleType))
      .otherwise(lit(0.0))
    // identical widening order to ta14: (tt + vv) adds as longs, then casts
    val pu = (coalesce(col("ucnt_w2"), lit(0L)) + 1).cast(DoubleType) /
      lit(totalTrainTokens + vocabSize).cast(DoubleType)
    docs
      .withColumn("tk", graft.queries.Q.tokens(col("text")))
      .filter(size(col("tk")) >= 2)
      .withWatermark("ts", horizon)
      .select(col("doc_id"), col("ts"), explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"))
        .as("p"))
      .select(col("doc_id"), col("ts"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(big, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("ucnt").as("ucnt_w1")), Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("ucnt").as("ucnt_w2")), Seq("w2"), "left")
      .withColumn("term_e6",
        round(log(lit(lambda) * pb + lit(1.0 - lambda) * pu) * lit(-1e6))
          .cast(LongType))
      .groupBy(window(col("ts"), "1 hour"), col("doc_id"))
      .agg(count(lit(1)).as("n_trans"), sum("term_e6").as("nll_e6_sum"))
      .withColumn("mean_nll_e6", round(col("nll_e6_sum") / col("n_trans")).cast(LongType))
      .withColumn("flagged", (col("mean_nll_e6") > gateMeanNllE6).cast("int"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_trans"), col("nll_e6_sum"), col("mean_nll_e6"), col("flagged"))
  }

  /** Streaming Naive-Bayes quality gate — ta17's streaming face, the
    * classifier rung of the gate ladder (ta9 unigram → pplGateStream,
    * ta14 bigram → bigramPplStream, ta17 classifier → here): score each
    * arriving document under a TRAINED class-count table and flag the ones
    * the classifier calls low-quality. Same recipe as the bigram face: the
    * vocabulary-keyed `wc` table (w, c1, c0) is a stateless stream-static
    * LEFT join probed per micro-batch (class-conditional counts are
    * vocabulary-bounded — too wide for the literal-array trick, exactly
    * like the bigram LM); the scalar totals/priors ride as literals; the
    * ONLY stateful operator is the watermarked per-(window, doc) integer
    * sum — whose checkpoint-recovery behavior is pinned by
    * BigramPplStreamSpec's restart proof of the identical aggregate shape.
    * Every arithmetic step widens in the same order as
    * [[graft.queries.CurationQueries.ta17NbQuality]], so scores match the
    * batch face bit-for-bit (NbGateStreamSpec).
    *
    * `flagged` = classifier says class 0 (below the quality bar) — rows
    * are marked, never dropped, per the quotaGate convention. */
  def nbGateStream(docs: DataFrame, wc: DataFrame,
      t1: Long, t0: Long, vocabSize: Long, d1: Long, d0: Long,
      horizon: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    def termE6(cnt: Column, t: Long): Column =
      round(log((coalesce(cnt, lit(0L)) + 1).cast(DoubleType) /
        lit(t + vocabSize).cast(DoubleType)) * lit(-1e6)).cast(LongType)
    def priorE6(d: Long): Column =
      round(log(lit((d + 1).toDouble) / lit((d1 + d0 + 2).toDouble)) * lit(-1e6))
        .cast(LongType)
    docs
      .withColumn("tk", graft.queries.Q.tokens(col("text")))
      .withWatermark("ts", horizon)
      .select(col("doc_id"), col("ts"), explode(col("tk")).as("w"))
      .join(wc, Seq("w"), "left")
      .withColumn("l1_e6", termE6(col("c1"), t1))
      .withColumn("l0_e6", termE6(col("c0"), t0))
      .groupBy(window(col("ts"), "1 hour"), col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum("l1_e6").as("s1_e6"), sum("l0_e6").as("s0_e6"))
      .withColumn("nll1_e6", col("s1_e6") + priorE6(d1))
      .withColumn("nll0_e6", col("s0_e6") + priorE6(d0))
      .withColumn("pred", when(col("nll1_e6") <= col("nll0_e6"), 1).otherwise(0))
      .withColumn("flagged", (col("pred") === 0).cast("int"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_tokens"), col("nll1_e6"), col("nll0_e6"), col("pred"), col("flagged"))
  }

  /** Streaming exact dedup — the streaming twin of `Dedup.exact`/dd1 for a
    * continuously-arriving corpus: drop re-deliveries of the same normalized
    * content within the watermark horizon. Keyed on the content hash, so
    * state is one (hash, expiry) entry per distinct document inside the
    * horizon and is evicted as the watermark advances — a plain
    * `dropDuplicates` on an unbounded stream would grow state forever.
    * Exactly-once within the horizon; re-deliveries older than the horizon
    * are the batch dedup's job (run dd1 over the sink periodically). */
  def dedupStream(docs: DataFrame, horizon: String = "2 hours"): DataFrame =
    docs
      .withColumn("text_hash", md5(lower(trim(col("text")))))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Stream-static enrichment — purchases joined to a slowly-changing user
    * dimension, then watermark-windowed revenue per dimension attribute.
    * The stream-static inner join is STATELESS (each micro-batch probes the
    * static side; no join state accumulates), and broadcasting the dim keeps
    * the stream side un-shuffled — at scale the only Exchange is the windowed
    * aggregate's, keyed by (window, attribute). The dim is re-read per
    * trigger, which is exactly how a slowly-changing lookup should refresh. */
  def enrichedRevenue(events: DataFrame, userDim: DataFrame,
      attr: String = "tier"): DataFrame =
    events
      .filter(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
      .join(broadcast(userDim), Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour"), col(attr))
      .agg(count(lit(1)).as("n"),
        graft.queries.Q.decSum(col("value")).as("revenue"))
      .select(col("window.start").as("window_start"), col(attr), col("n"), col("revenue"))

  /** Streaming contamination gate — flag arriving documents whose word
    * n-grams hit a Bloom filter of banned/reference n-grams (eval-set
    * contamination, blocklists). The probe is a PURE PROJECTION
    * ([[graft.operators.Bloom.anyMemberLit]] — the filter rides in the plan
    * as a block literal), so the stream needs no watermark, no state store,
    * and no shuffle: the gate runs at scan speed on every micro-batch.
    * Bloom false positives (rate set by m,k) can only over-flag — route
    * flagged docs to quarantine for the exact re-check, never silent-drop. */
  def bloomGate(docs: DataFrame, filter: DataFrame, textCol: String = "text",
      n: Int = 3): DataFrame =
    docs
      .withColumn("__tok", split(col(textCol), " "))
      .withColumn("flagged",
        graft.operators.Bloom.anyMemberLit(
          graft.queries.Q.wordNgrams("__tok", n), filter).cast("int"))
      .drop("__tok")

  /** Streaming curation — the streaming face of e2e1_curation_pipeline for
    * a continuously-arriving corpus: contamination gate (stateless bloom
    * projection) → clean docs flow to watermarked exact dedup (bounded
    * state, evicted at the horizon), flagged docs flow to a QUARANTINE
    * stream. Returns (clean, quarantined): the caller sinks BOTH — bloom
    * false positives mean flagged ≠ contaminated, so quarantine holds them
    * for the exact re-check (dd7/dd10's semi-join); dropping them would
    * silently lose clean documents at the filter's FPR. */
  def curationStreams(docs: DataFrame, bannedFilter: DataFrame,
      horizon: String = "2 hours"): (DataFrame, DataFrame) = {
    val gated = bloomGate(docs, bannedFilter)
    (dedupStream(gated.filter(col("flagged") === 0).drop("flagged"), horizon),
      gated.filter(col("flagged") === 1).drop("flagged"))
  }

  /** Stream-STREAM interval join — purchases joined to views by the same
    * user within the preceding attribution window (the streaming face of
    * ev8's as-of attribution, for when BOTH sides arrive continuously).
    * The time-range predicate plus watermarks on both sides is what bounds
    * the join state: each side buffers only rows younger than its watermark
    * horizon, and Spark evicts as event time advances — without the range
    * condition this would be unbounded-state and Spark rejects it in
    * Append mode. One Exchange per side on user_id. */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val v = views.select(col("event_id").as("view_id"), col("user_id").as("v_user"),
      col("ts").as("view_ts")).withWatermark("view_ts", "1 hour")
    val p = purchases.select(col("event_id").as("purchase_id"), col("user_id"),
      col("ts").as("purchase_ts"), col("value")).withWatermark("purchase_ts", "1 hour")
    // strictly-earlier views only (view_ts < purchase_ts), matching batch
    // ev8AsofJoin's RANGE ... 1 PRECEDING frame — a same-timestamp view must
    // not attribute in one engine and not the other
    p.join(v,
      expr(s"""user_id = v_user AND
              |view_ts < purchase_ts AND
              |view_ts >= purchase_ts - INTERVAL $windowMinutes MINUTES""".stripMargin))
      .drop("v_user")
  }

  case class Admission(doc_id: Long, source: String, admitted: Int, n_seen: Long)

  /** Per-source admission decisions from [[quotaGate]]. */
  private class QuotaProcessor(maxPerKey: Long)
      extends StatefulProcessor[String, (Long, String), Admission] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(Long, String)],
        timers: TimerValues): Iterator[Admission] = {
      var n = if (seen.exists()) seen.get() else 0L
      // deterministic admission order within a batch: by doc_id, so replays
      // and micro-batch boundary shifts admit the same documents
      val out = rows.toSeq.sortBy(_._1).map { case (docId, source) =>
        n += 1
        Admission(docId, source, if (n <= maxPerKey) 1 else 0, n)
      }
      seen.update(n)
      out.iterator
    }
  }

  /** Per-source ingestion quota on the transformWithState API (Spark 4's
    * arbitrary-state successor to flatMapGroupsWithState — typed per-key
    * `ValueState`, explicit `TimeMode`, state-store TTL support): admit the
    * first `maxPerKey` documents per source, flag the rest. The streaming
    * face of sm5's domain capping — a crawl frontier applies exactly this
    * gate so one exploding domain cannot drown the mixture. State is ONE
    * long per source; rejected rows are flagged, never dropped silently
    * (quarantine convention, same as the bloom gate). */
  def quotaGate(docs: DataFrame, maxPerKey: Long = 100L): Dataset[Admission] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("source").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .transformWithState(new QuotaProcessor(maxPerKey),
        TimeMode.None(), OutputMode.Append())
  }

  case class ScdVersion(user_id: Long, version: Long, state: String,
      valid_from_us: Long, valid_to_us: Long)

  // NOT private: Janino-compiled state-encoder projections cannot bind
  // private accessors (same failure as the r4 PaperXml$Parsed fallback) —
  // a private state case class silently demotes every state (de)serialize
  // to interpreted projection. AnomalyStreamSpec pins CODEGEN_ONLY.
  case class CurState(tpe: String, fromUs: Long, version: Long)

  /** Closes a version whenever the key's tracked attribute changes. */
  private class Scd2Processor
      extends StatefulProcessor[Long, (Long, Long, Long, String), ScdVersion] {
    @transient private var cur: org.apache.spark.sql.streaming.ValueState[CurState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[CurState]("cur", Encoders.product[CurState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long, String)],
        timers: TimerValues): Iterator[ScdVersion] = {
      var st = if (cur.exists()) Option(cur.get()) else None
      val out = Seq.newBuilder[ScdVersion]
      // deterministic in-batch order: by (us, event_id) — replays and
      // micro-batch boundary shifts close the same versions
      rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, _, us, tpe) =>
        st match {
          case None =>
            st = Some(CurState(tpe, us, 1L))
          case Some(c) if c.tpe != tpe =>
            out += ScdVersion(key, c.version, c.tpe, c.fromUs, us)
            st = Some(CurState(tpe, us, c.version + 1L))
          case _ => ()
        }
      }
      st.foreach(cur.update)
      out.result().iterator
    }
  }

  /** Streaming SCD2 — the streaming twin of batch `set3_scd2`: maintains
    * each user's current (state, valid_from, version) in typed
    * `ValueState` and emits a version row the moment the tracked attribute
    * changes — append-mode CDC into the dimension table, no re-scan of
    * history. Emitted rows are exactly the batch face's CLOSED intervals
    * (valid_to_us set); the one open version per user lives in the state
    * store until its closing event arrives (queryable there, or via the
    * batch query over the union — EventStreamsSpec proves the parity
    * across micro-batch boundaries). State is O(1) per user. Input
    * contract: events arrive time-ordered across micro-batches (the usual
    * log-compaction guarantee); within a batch, rows are sorted. */
  def scd2Stream(events: DataFrame): Dataset[ScdVersion] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("us").cast("long"), col("event_type").cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new Scd2Processor, TimeMode.None(), OutputMode.Append())
  }

  case class AnomalyFlag(event_type: String, day: Long, n: Long, s7: Long,
      dev7: Long, var49: Long, spike: Int)

  // NOT private — see CurState
  case class DayCount(day: Long, n: Long)
  case class AnomState(hist: Seq[DayCount], openDay: Long, openN: Long)

  /** Closes a calendar day when a later day's first row arrives, then
    * scores it against the 7 strictly preceding days — the same integer z²
    * test as batch ev13: spike ⇔ dev7 > 0 ∧ dev7² > 4·var49 with
    * dev7 = 7n−S, var49 = 7Q−S². State per key is the open day's running
    * count plus ≤7 closed (day, n) pairs — O(1), trimmed on every close. */
  private class AnomalyProcessor
      extends StatefulProcessor[String, (String, Long), AnomalyFlag] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[AnomState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AnomState]("anom", Encoders.product[AnomState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def score(key: String, day: Long, n: Long,
        hist: Seq[DayCount]): Option[AnomalyFlag] = {
      val base = hist.filter(d => d.day >= day - 7 && d.day <= day - 1)
      if (base.size != 7) None
      else {
        val s7 = base.map(_.n).sum
        val q7 = base.map(d => d.n * d.n).sum
        val dev7 = 7L * n - s7
        val var49 = 7L * q7 - s7 * s7
        val spike = if (dev7 > 0 && dev7 * dev7 > 4L * var49) 1 else 0
        Some(AnomalyFlag(key, day, n, s7, dev7, var49, spike))
      }
    }

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timers: TimerValues): Iterator[AnomalyFlag] = {
      var s = if (st.exists()) st.get() else null
      val out = Seq.newBuilder[AnomalyFlag]
      // fold the iterator incrementally into per-day counts — per-batch
      // memory is O(distinct days per key), never O(events per key per
      // batch); a high-volume event type must not buffer its whole batch
      val counts = scala.collection.mutable.HashMap.empty[Long, Long]
      rows.foreach { case (_, day) =>
        counts.update(day, counts.getOrElse(day, 0L) + 1L)
      }
      // ascending — the cross-batch order contract is scd2Stream's: events
      // arrive time-ordered
      counts.toSeq.sortBy(_._1).foreach { case (day, n) =>
        if (s == null) s = AnomState(Nil, day, n)
        else if (day == s.openDay) s = s.copy(openN = s.openN + n)
        else if (day < s.openDay) {
          // defensive guard on the documented time-ordered contract: a late
          // event from a PAST day must not close the open day early and
          // reopen the past one (that would emit duplicate or wrongly-
          // counted flags). Dropped — the batch face (ev13) over the sink
          // is the recovery path for out-of-order history.
        }
        else {
          val closed = DayCount(s.openDay, s.openN)
          out ++= score(key, closed.day, closed.n, s.hist)
          s = AnomState((closed +: s.hist).filter(_.day >= day - 7), day, n)
        }
      }
      if (s != null) st.update(s)
      out.result().iterator
    }
  }

  /** Streaming volume-spike monitor — the streaming twin of batch
    * `ev13_anomaly`: per event type, each CLOSED calendar day is scored
    * against its trailing-7-day baseline the moment the next day's first
    * event arrives, in the same pure integer math as the batch face
    * (AnomalyStreamSpec proves row-level parity across micro-batch
    * boundaries). The one OPEN day per key sits in the state store until
    * its closing event — identical contract to [[scd2Stream]]'s open
    * version. Input: (event_type, us) rows, time-ordered across batches. */
  def anomalyStream(events: DataFrame): Dataset[AnomalyFlag] = {
    import events.sparkSession.implicits._
    val DayUs = 86400L * 1000000L
    events.select(col("event_type").cast("string"),
        expr(s"cast(us as long) div $DayUs").as("day"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new AnomalyProcessor, TimeMode.None(), OutputMode.Append())
  }

  case class FlaggedPos(doc_id: Long, pos: Long)

  // NOT private — see CurState (Janino cannot bind private state accessors)
  case class ShingleState(firstDoc: Long, firstPos: Long, count: Long)

  /** Flags every occurrence of a shingle whose corpus count exceeds one —
    * the streaming half of dd15's duplicate detection. The trick that keeps
    * state O(1) per shingle: only the FIRST occurrence ever needs
    * buffering. The moment a second arrives, both are known-duplicated and
    * emit right then; every later occurrence is known-duplicated ON ARRIVAL
    * and emits immediately, so the stored first is emitted exactly once and
    * the state never holds more than (firstDoc, firstPos, count). The
    * emitted SET is therefore independent of micro-batch boundaries —
    * exactly the batch face's "count > 1" flags (spec-proven). */
  private class SubstrFlagProcessor
      extends StatefulProcessor[String, (String, Long, Long), FlaggedPos] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[ShingleState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ShingleState]("sh", Encoders.product[ShingleState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
        timers: TimerValues): Iterator[FlaggedPos] = {
      // STREAMING single pass, no buffering of the group (review r7: a
      // sortBy here materialized a hot shingle's whole micro-batch group,
      // contradicting the O(1) contract). Arrival order is fine: the
      // emitted SET is order-independent — every occurrence of a >1
      // shingle emits exactly once (the buffered first when the second
      // arrives, all others on arrival), and when only one occurrence
      // exists there is no choice to make.
      var s = if (st.exists()) st.get() else ShingleState(-1L, -1L, 0L)
      val out = Seq.newBuilder[FlaggedPos]
      rows.foreach { case (_, docId, pos) =>
        s = s.copy(count = s.count + 1L)
        if (s.count == 1L) s = s.copy(firstDoc = docId, firstPos = pos)
        else {
          if (s.count == 2L) out += FlaggedPos(s.firstDoc, s.firstPos)
          out += FlaggedPos(docId, pos)
        }
      }
      st.update(s)
      out.result().iterator
    }
  }

  case class DocSpans(doc_id: Long, rev: Long, spans: Seq[(Long, Long)])

  case class MergeState(positions: Seq[Long], rev: Long)

  /** Interval merge of a document's flagged window starts into maximal
    * disjoint spans — dd15's gaps-and-islands tail, maintained per doc with
    * UPDATE semantics: each time a doc gains flagged positions, its full
    * current span set re-emits under a bumped `rev`; the sink upserts per
    * doc (latest rev wins), so once the horizon closes the sink row equals
    * the batch face's spans for that doc. State per doc = its flagged
    * starts — bounded by document length in windows, the same bound as the
    * batch face's per-doc island window. */
  private class SpanMergeProcessor(w: Int)
      extends StatefulProcessor[Long, FlaggedPos, DocSpans] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[MergeState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MergeState]("mg", Encoders.product[MergeState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FlaggedPos],
        timers: TimerValues): Iterator[DocSpans] = {
      val prev = if (st.exists()) st.get() else MergeState(Nil, 0L)
      val merged = (prev.positions ++ rows.map(_.pos)).distinct.sorted
      if (merged == prev.positions) Iterator.empty
      else {
        val next = MergeState(merged, prev.rev + 1L)
        st.update(next)
        val spans = Seq.newBuilder[(Long, Long)]
        var start = merged.head
        var last = merged.head
        merged.tail.foreach { p =>
          if (p - last > w) { spans += ((start, last + w - 1)); start = p }
          last = p
        }
        spans += ((start, last + w - 1))
        Iterator.single(DocSpans(key, next.rev, spans.result()))
      }
    }
  }

  /** Streaming twin of `dd15_exact_substr` — span-level exact-substring
    * dedup over a continuously-arriving corpus, completing the dedup
    * streaming set (dd1 exact → [[dedupStream]], dd7/dd10 bloom →
    * [[bloomGate]], dd15 spans → here). Two chained stateful stages,
    * composed through a durable topic/landing dir in production (each is an
    * independently-recoverable query — the same composition contract as
    * [[curationStreams]]):
    *
    *  1. [[substrFlagStream]]: explode docs into w-token shingles (pure
    *     projection — the batch face's explode verbatim), then flag
    *     occurrences of any shingle seen more than once. O(1) state per
    *     distinct shingle (first occurrence + count — see
    *     [[SubstrFlagProcessor]] for why nothing more ever buffers);
    *     production sets a state TTL for the dedup horizon, mirroring
    *     [[dedupStream]]'s within-horizon contract.
    *  2. [[spanMergeStream]]: per-doc interval merge of flagged starts into
    *     maximal disjoint spans, update-semantics re-emission under a
    *     monotone `rev` — "merge on close": when the horizon passes, the
    *     doc's latest rev IS the batch answer (EventStreamsSpec proves
    *     set-parity with `DedupQueries.dd15ExactSubstr` across micro-batch
    *     splits).
    *
    * Skew note: a hot boilerplate shingle is ONE state-store key with O(1)
    * state and per-arrival O(1) emission — the streaming face never
    * materializes the hot group at all, the same bounded-partition property
    * the r7 batch de-skew established. */
  def substrFlagStream(docs: DataFrame, w: Int = graft.queries.DedupQueries.SubstrW): Dataset[FlaggedPos] = {
    import docs.sparkSession.implicits._
    // the explode is the batch face's, shared verbatim — parity by
    // construction, not by copy (review r7)
    graft.queries.DedupQueries.substrShingles(docs, w)
      .select(col("s").cast("string"), col("doc_id"), col("pos"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SubstrFlagProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Stage 2 of the dd15 twin — see [[substrFlagStream]]. */
  def spanMergeStream(flags: Dataset[FlaggedPos],
      w: Int = graft.queries.DedupQueries.SubstrW): Dataset[DocSpans] = {
    import flags.sparkSession.implicits._
    flags.groupByKey(_.doc_id)
      .transformWithState(new SpanMergeProcessor(w), TimeMode.None(), OutputMode.Update())
  }

  /** Incremental file-source ingestion of a parquet landing directory,
    * processed with AvailableNow (drain-then-stop — the idempotent batch
    * refresh pattern; checkpoint carries the manifest). */
  def ingestAvailableNow(spark: SparkSession, landingDir: String,
      schema: org.apache.spark.sql.types.StructType,
      outDir: String, checkpointDir: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(landingDir)
    val q = windowedCounts(stream)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
