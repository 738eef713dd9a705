package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-factor registry for PIN-based oracles (VERDICT r7 item 5).
  *
  * Four oracle entries (a9/a10/a10c/a10e) are seeded-model constants: valid
  * only for the corpus they were dumped from. Through r7 they were keyed to
  * sf0.01 alone, so a `check_local` run at any other SF reported them red
  * by design. The pins are now tables keyed by a corpus FINGERPRINT, and
  * [[graft.Verify]] registers the active corpus before dumping
  * `oracle_sql.json`, so the dumped oracles match whatever SF the dump ran
  * against. A corpus with no pin drops those entries to the driver's
  * rows-only check — loudly (stderr), never silently wrong.
  *
  * The fingerprint is (documents row count, Σ n_chars): row count alone is
  * NOT an SF identity — the generated sf0.001 and sf0.01 dirs both hold
  * 500 documents with different text. The char-sum is a one-aggregate scan
  * and changes whenever any document's length changes; LDA pins are
  * content-functions, so that is the right sensitivity (a same-shape
  * regenerated corpus must invalidate the pin, and does).
  *
  * Every pinned constant is partition-count independent (verified at
  * local[8] ≡ local[32] when dumped — the a9 justification chain), so one
  * pin per corpus suffices regardless of parallelism. */
object SfPins {

  /** Fingerprint of the corpus the NEXT oracle dump is for; set by
    * [[register]] from Verify.main (and tests) before reading any `oracles`
    * map. Defaults to the driver's sf0.01 gate corpus. */
  @volatile var activeSf: (Long, Long) = (500L, 149174L)

  def activeDocCount: Long = activeSf._1

  /** Compute and register `dir`'s fingerprint (one count+sum aggregate). */
  def register(s: SparkSession, dir: String): Unit = {
    val r = graft.Tables(s, dir, "documents")
      .agg(count(lit(1)), sum("n_chars")).collect()(0)
    activeSf = (r.getLong(0), r.getLong(1))
  }

  /** True when `pins` covers the active corpus; callers omit the oracle
    * entry and warn otherwise. */
  def pinnedOrWarn(name: String, pins: Map[(Long, Long), _]): Boolean = {
    val ok = pins.contains(activeSf)
    if (!ok) System.err.println(
      s"[SfPins] $name has no pin for fingerprint=$activeSf — " +
        "dropping its oracle entry (rows-only check)")
    ok
  }
}
