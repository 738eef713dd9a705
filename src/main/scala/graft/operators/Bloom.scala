package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Q.detHash

/** Distributed Bloom filter, fully declarative — no UDF, no UDAF, no
  * driver-side bit array.
  *
  * The filter is a table of 63-bit blocks (63, not 64 — see [[build]]):
  * build explodes each item into its `numHashes` bit positions (double
  * hashing: pos_i = (h1 + i·h2) mod m — Kirsch & Mitzenmacher 2006 show two
  * hashes suffice) and `bit_or`-reduces `1 << (pos mod 63)` per block index.
  * Map-side partial aggregation means the shuffle carries at most m/63 rows
  * per map task regardless of input size; the result is ≤ m/63 rows total (a
  * few MB for m = 2²⁰ bits), which
  * the probe side consumes as a BROADCAST join — probes never shuffle.
  *
  * Spark's own BloomFilterAggregate is not SQL-registered (runtime-filter
  * internal), and df.stat.bloomFilter builds on the driver; this keeps both
  * sides distributed and — because positions derive from the md5-based
  * detHash — bit-for-bit reproducible in any engine with md5 and integer
  * ops (the DuckDB oracle replays the whole filter).
  *
  * Sizing: standard FPR ≈ (1 − e^(−kn/m))^k; the defaults (m = 2²², k = 4)
  * give ~2e-4 at n = 150k items, and m scales linearly with n at constant
  * FPR. h1 + i·h2 stays < 2⁶² for k ≤ 4 (detHash is 60-bit), so the
  * position math never overflows int64.
  */
object Bloom {

  val DefaultBits: Long = 1L << 22
  val DefaultHashes: Int = 4

  /** One-row (num_bits, num_hashes) companion table for a filter that
    * outlives the plan that built it. The block table itself carries no
    * geometry — probing with the wrong (m, k) yields silent false negatives
    * (probeLit catches only the smaller-m case via its block-index require)
    * — so a persisted filter should be written WITH this row next to it and
    * re-read through [[requireMeta]], which fails loudly on mismatch instead
    * of relying on the caller remembering the build constants. */
  def metaFor(spark: org.apache.spark.sql.SparkSession,
      numBits: Long = DefaultBits, numHashes: Int = DefaultHashes): DataFrame = {
    import spark.implicits._
    Seq((numBits, numHashes)).toDF("num_bits", "num_hashes")
  }

  /** Asserts a stored filter's companion metadata row matches the geometry a
    * probe is about to use; returns the validated (numBits, numHashes) so
    * callers can thread the STORED geometry instead of re-typing constants.
    * One collect of one row — negligible next to any probe. */
  def requireMeta(meta: DataFrame, numBits: Long, numHashes: Int): (Long, Int) = {
    val rows = meta.select(col("num_bits").cast(LongType), col("num_hashes").cast(IntegerType)).collect()
    require(rows.length == 1, s"bloom meta must be exactly one row, got ${rows.length}")
    val (m, k) = (rows(0).getLong(0), rows(0).getInt(1))
    require(m == numBits && k == numHashes,
      s"bloom geometry mismatch: filter was built with (numBits=$m, numHashes=$k), " +
        s"probe requested (numBits=$numBits, numHashes=$numHashes) — " +
        "probing with mismatched geometry yields silent false negatives")
    (m, k)
  }

  /** Bit positions of one item: (h1 + i·h2) mod m, i = 0..k−1. k ≤ 8 keeps
    * h1 + 7·h2 < 8·2⁶⁰ = 2⁶³ (detHash is 60-bit) — beyond that the sum
    * wraps negative and membership silently breaks, so it is a hard
    * require, not a doc note. */
  private def positions(item: Column, numBits: Long, numHashes: Int): Column = {
    require(numHashes >= 1 && numHashes <= 8,
      s"numHashes must be in [1, 8] (int64 overflow above 8), got $numHashes")
    require(numBits > 0, s"numBits must be positive, got $numBits")
    val h1 = detHash(item, 1)
    val h2 = detHash(item, 2)
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => (h1 + i.cast(LongType) * h2) % lit(numBits))
  }

  /** Build: the filter as (blk, bits) rows — block index and its OR-ed
    * word. Blocks hold 63 bits, not 64: the portable layout — a shift of 63
    * into a signed int64 is UB-adjacent (DuckDB raises on it), and one spare
    * bit per block costs 1.6% space. Rows with items absent entirely (blocks never touched)
    * are simply missing; probes treat missing blocks as all-zero. */
  def build(items: DataFrame, itemCol: String,
      numBits: Long = DefaultBits, numHashes: Int = DefaultHashes): DataFrame =
    items
      .select(explode(positions(col(itemCol), numBits, numHashes)).as("pos"))
      .groupBy((col("pos") / 63).cast(LongType).as("blk"))
      .agg(bit_or(call_function("shiftleft", lit(1L), (col("pos") % 63).cast(IntegerType))).as("bits"))

  /** Probe via broadcast join: adds `in_bloom` (1/0, or null for a null
    * item) to each row of `items` — 1 iff every one of the item's k bits is
    * set. Row fidelity: duplicate input rows stay duplicate (the per-item
    * AND groups on an internal per-row id and joins back), matching
    * [[probeLit]]'s per-row semantics exactly. The filter side is ≤ m/63
    * rows (broadcast); the shuffle carries one row per input row. Fully
    * lazy — use when the filter must stay a DataFrame. No false negatives.
    * `numBits`/`numHashes` MUST match the build call — this lazy join-based
    * probe cannot detect a mismatch at all (no block-index bound is ever
    * checked); for filters loaded from storage, validate through
    * [[requireMeta]] first. */
  def probe(items: DataFrame, itemCol: String, filter: DataFrame,
      numBits: Long = DefaultBits, numHashes: Int = DefaultHashes): DataFrame = {
    // ONE evaluation end-to-end: the row id is only ever used as a grouping
    // key inside this single plan (explode → group back), never to join two
    // independent evaluations of the input — monotonically_increasing_id is
    // not stable across re-evaluations, so a self-join on it could misalign
    // rows after a shuffle or task retry
    val withId = items.withColumn("__rid", monotonically_increasing_id())
    val grouping = col("__rid") +: items.columns.map(col)
    withId
      // explode_outer: a null item yields null positions but KEEPS its row
      .withColumn("__pos", explode_outer(positions(col(itemCol), numBits, numHashes)))
      .withColumn("__blk", (col("__pos") / 63).cast(LongType))
      .join(broadcast(filter.select(col("blk").as("__blk"), col("bits").as("__bits"))),
        Seq("__blk"), "left_outer")
      .withColumn("__hit",
        when(col("__pos").isNull, lit(null))
          .when(col("__bits").isNotNull &&
            (col("__bits").bitwiseAND(call_function("shiftleft", lit(1L), (col("__pos") % 63).cast(IntegerType))) =!= 0L),
            lit(1)).otherwise(lit(0)))
      .groupBy(grouping: _*)
      // min over the k bits; a null item's single null hit aggregates to
      // null — same null-in/null-out as probeLit
      .agg(min("__hit").as("in_bloom"))
      .drop("__rid")
  }

  /** Zero-shuffle probe: the filter inlined as a dense block-array literal
    * (m/63 longs — 8 MB at m = 2²⁶, fine to ship in the plan like a
    * broadcast var), membership as a pure `forall` projection over the k
    * positions. No explode, no join, no Exchange — the scan pipeline keeps
    * whole-stage codegen (same literal-index trick as the IVF centroid
    * argmax in ss2). Materializes the filter once per call via collect —
    * the same contract as broadcasting any bounded index. */
  def probeLit(items: DataFrame, itemCol: String, filter: DataFrame,
      numBits: Long = DefaultBits, numHashes: Int = DefaultHashes): DataFrame =
    items.withColumn("in_bloom",
      memberLit(col(itemCol), filter, numBits, numHashes).cast(IntegerType))

  /** The literal-probe membership PREDICATE — a pure Column, so it composes
    * into any projection, including Structured Streaming plans (stateless:
    * no watermark, no state store). Collects the filter blocks once per
    * call. */
  def memberLit(item: Column, filter: DataFrame,
      numBits: Long = DefaultBits, numHashes: Int = DefaultHashes): Column = {
    val blocksLit = denseBlocksLit(filter, numBits)
    hitAgainst(blocksLit, item, numBits, numHashes)
  }

  /** Any-element variant over an array<string> column — one doc row probes
    * its whole n-gram set without exploding. */
  def anyMemberLit(itemsArr: Column, filter: DataFrame,
      numBits: Long = DefaultBits, numHashes: Int = DefaultHashes): Column = {
    val blocksLit = denseBlocksLit(filter, numBits)
    exists(itemsArr, item => hitAgainst(blocksLit, item, numBits, numHashes))
  }

  private def denseBlocksLit(filter: DataFrame, numBits: Long): Column = {
    val nBlocks = ((numBits + 62) / 63).toInt
    val dense = new Array[Long](nBlocks)
    filter.select("blk", "bits").collect().foreach { r =>
      val blk = r.getLong(0)
      // the filter table carries no (m, k) metadata, so a probe called with
      // a smaller numBits than the build is detectable only here — fail
      // with the cause, not an ArrayIndexOutOfBounds. (The reverse mismatch
      // — probe m LARGER than build m — is undetectable and yields false
      // negatives: callers own keeping (m, k) with the stored filter.)
      require(blk < nBlocks,
        s"filter block $blk exceeds numBits=$numBits (${nBlocks} blocks) — " +
          "probe must use the same numBits the filter was built with")
      dense(blk.toInt) = r.getLong(1)
    }
    typedLit(dense.toSeq)
  }

  private def hitAgainst(blocksLit: Column, item: Column,
      numBits: Long, numHashes: Int): Column =
    forall(positions(item, numBits, numHashes),
      p => (element_at(blocksLit, (p / 63).cast(IntegerType) + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % 63).cast(IntegerType)))) =!= 0L)
}
