package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE session-scoped sharing recipe for expensive subplans and models
  * — previously re-implemented separately by the dedup signature cache, the
  * LDA model cache, and the langid prediction cache, with materialization
  * strategy drifting between copies (persist vs localCheckpoint).
  *
  * Key scheme: (identityHashCode(session), dir, tag) — one entry per live
  * SparkSession per scale directory per artifact. identityHashCode (not the
  * session object) keeps the map from pinning dead sessions' plans.
  *
  * Materialization: [[materialized]] uses EAGER `localCheckpoint()` —
  * executor-local, exchange-free on reuse, the measured winner for the
  * dedup signature reuse (a lazy persist leaves the first two concurrent
  * consumers racing to compute). The first toucher pays the build; every
  * later consumer reads the checkpointed blocks.
  *
  * Lifetime contract: entries live for the session (Verify/Bench run one
  * scale dir per JVM). A long-lived multi-dir session should manage
  * unpersist through its own lifecycle — this cache deliberately never
  * evicts, because dropping a checkpoint out from under a live consumer
  * plan would fail the consumer. */
object SessionShare {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String), Any]

  /** Memoize any per-(session, dir) artifact (fitted model, vocabulary,
    * tuple of frames). `build` runs at most once per key. */
  def cached[T](s: SparkSession, dir: String, tag: String)(build: => T): T =
    cache.getOrElseUpdate((System.identityHashCode(s), dir, tag), build)
      .asInstanceOf[T]

  /** Memoize + eagerly materialize a shared subplan. */
  def materialized(s: SparkSession, dir: String, tag: String)(build: => DataFrame): DataFrame =
    cached(s, dir, tag)(build.localCheckpoint())
}
