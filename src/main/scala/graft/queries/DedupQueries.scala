package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** Deduplication suite — the LLM-training-pipeline generalization the north
  * star asks for (BASELINE.json): exact, MinHash+LSH, n-gram Jaccard,
  * SimHash, all over `documents`.
  *
  * Scale design (the point of each):
  *  - dd1 exact: one hash-groupBy, no data movement beyond the agg shuffle.
  *  - dd2/dd3 MinHash+LSH: signatures are a per-doc agg (map-side combined);
  *    candidate pairs come from an equi-join on (band, key) — the classic
  *    O(n·collisions) LSH plan, never the O(n²) cross join.
  *  - dd4 exact-Jaccard verification runs only on dd3's candidate pairs.
  *  - dd5 SimHash: per-doc signature, pairwise check reduced to signature
  *    equality/hamming — join-friendly.
  *
  * Determinism: every hash is detHash (md5-based, engine-portable); Jaccard
  * ratios are int/int scaled to e6 BIGINT. MinHash seeds 0..15, 4 bands × 4
  * rows (reference for LSH banding: Leskovec/Rajaraman/Ullman, "Mining of
  * Massive Datasets" ch.3).
  */
object DedupQueries {

  private val NumHashes = 16
  private val Bands = 4
  private val RowsPerBand = NumHashes / Bands

  /** Affine MinHash family over one base hash: s_i = (a_i·h + b_i) mod P,
    * P = 2³¹−1. One md5 per shingle instead of 16 — a_i,b_i < P keeps every
    * product < 2⁶² so int64 math is exact on both engines. */
  private val P = 2147483647L
  private val hashA: IndexedSeq[Long] =
    (0 until NumHashes).map(i => (1103515245L * (i + 1) + 12345L) % P)
  private val hashB: IndexedSeq[Long] =
    (0 until NumHashes).map(i => (2654435761L * i + 1013904223L) % P)

  /** dd1_exact_dedup — canonical-row selection by normalized content hash. */
  def dd1ExactDedup(s: SparkSession, dir: String): DataFrame = {
    val h = md5(lower(trim(col("text"))))
    val w = Window.partitionBy("text_hash").orderBy("doc_id")
    t(s, dir, "documents")
      .withColumn("text_hash", h)
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("text_hash"), (col("rn") === 1).as("is_canonical"))
      .orderBy("doc_id")
  }

  val dd1ExactDedupSql: String =
    """SELECT doc_id, text_hash, rn = 1 AS is_canonical FROM (
      |  SELECT doc_id, md5(lower(trim(text))) AS text_hash,
      |    ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin

  /** Distinct word-3-shingles per doc (Spark side). */
  private def shingles(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .withColumn("tok", toks)
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, size(tok) - 2), i -> concat_ws(' ', element_at(tok, i), element_at(tok, i + 1), element_at(tok, i + 2)))"
        ))).as("sh"))
  }

  private val shinglesDuck: String =
    """SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text,' ')) >= 3""".stripMargin

  /** MinHash signature columns s0..s15 (Spark side). */
  private def minhashSigs(docs: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map(i =>
      min((lit(hashA(i)) * col("hb") + lit(hashB(i))) % P).as(s"s$i"))
    shingles(docs)
      .withColumn("hb", detHash(col("sh"), 0) % P)
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
  }

  private def minhashSigsDuck: String = {
    val aggs = (0 until NumHashes)
      .map(i => s"MIN((${hashA(i)} * hb + ${hashB(i)}) % $P) AS s$i").mkString(", ")
    s"""SELECT doc_id, $aggs
       |  FROM (SELECT doc_id, ${detHashSql("sh", 0)} % $P AS hb FROM ($shinglesDuck) sh0) sh
       |  GROUP BY doc_id""".stripMargin
  }

  /** dd2_minhash_sigs — per-doc MinHash signatures over word-3-shingles. */
  def dd2MinhashSigs(s: SparkSession, dir: String): DataFrame =
    minhashSigs(t(s, dir, "documents")).orderBy("doc_id")

  val dd2MinhashSigsSql: String =
    s"""SELECT * FROM ($minhashSigsDuck) sig ORDER BY doc_id""".stripMargin

  /** Banded signature rows (doc_id, band, key). */
  private def bandedSigs(docs: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { b =>
      val ks = (b * RowsPerBand until (b + 1) * RowsPerBand).map(i => col(s"s$i").cast(StringType))
      struct(lit(b).as("band"), concat_ws("_", ks: _*).as("key"))
    }
    minhashSigs(docs)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  private def bandedSigsDuck: String = {
    val arms = (0 until Bands).map { b =>
      val ks = (b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(i => s"CAST(s$i AS VARCHAR)").mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $ks AS key FROM sig"
    }
    arms.mkString("\nUNION ALL\n")
  }

  /** dd3_lsh_pairs — LSH candidate pairs: docs sharing ≥1 band key, with the
    * number of shared bands. Equi-join on (band, key) — no cross join. */
  def dd3LshPairs(s: SparkSession, dir: String): DataFrame = {
    val b = bandedSigs(t(s, dir, "documents"))
    val a = b.select(col("doc_id").as("doc_a"), col("band"), col("key"))
    val c = b.select(col("doc_id").as("doc_b"), col("band"), col("key"))
    a.join(c, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared_bands"))
      .orderBy("doc_a", "doc_b")
  }

  val dd3LshPairsSql: String =
    s"""WITH sig AS ($minhashSigsDuck),
       |band AS ($bandedSigsDuck)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_bands
       |FROM band a JOIN band b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin

  /** dd4_ngram_jaccard — exact 3-shingle Jaccard, computed ONLY on dd3's LSH
    * candidate pairs (the verify stage of the MinHash pipeline). */
  def dd4NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sh = shingles(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = dd3LshPairs(s, dir).select("doc_a", "doc_b")
    val inter = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_int"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .withColumn("jaccard_e6",
        round(lit(1e6) * col("n_int") / (col("na") + col("nb") - col("n_int"))).cast(LongType))
      .filter(col("jaccard_e6") >= 100000)
      .select("doc_a", "doc_b", "jaccard_e6")
      .orderBy("doc_a", "doc_b")
  }

  val dd4NgramJaccardSql: String =
    s"""WITH sig AS ($minhashSigsDuck),
       |band AS ($bandedSigsDuck),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM band a JOIN band b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sh AS ($shinglesDuck),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_int
       |  FROM pairs p
       |  JOIN sh sa ON sa.doc_id = p.doc_a
       |  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
       |  GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b,
       |  CAST(ROUND(1e6 * n_int / (za.n_sh + zb.n_sh - n_int)) AS BIGINT) AS jaccard_e6
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |WHERE CAST(ROUND(1e6 * n_int / (za.n_sh + zb.n_sh - n_int)) AS BIGINT) >= 100000
       |ORDER BY doc_a, doc_b""".stripMargin

  /** dd5_simhash — 16-bit SimHash over the token multiset (Charikar 2002):
    * bit b is the sign of the sum of ±1 votes from each token's hash. */
  def dd5Simhash(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .withColumn("h", detHash(col("word"), 101))
    val bitSums = (0 until 16).map(b =>
      sum(when(expr(s"(shiftright(h, $b) & 1) = 1"), 1).otherwise(-1)).as(s"b$b"))
    val simhash = (0 until 16).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    tok.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhash.as("simhash16"))
      .orderBy("doc_id")
  }

  val dd5SimhashSql: String = {
    val bitSums = (0 until 16)
      .map(b => s"SUM(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(", ")
    val simhash = (0 until 16)
      .map(b => s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
       |tok AS (SELECT doc_id, ${detHashSql("word", 101)} AS h FROM words),
       |sums AS (SELECT doc_id, $bitSums FROM tok GROUP BY doc_id)
       |SELECT doc_id, $simhash AS simhash16 FROM sums ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, QueryFn] = Map(
    "dd1_exact_dedup" -> (dd1ExactDedup _),
    "dd2_minhash_sigs" -> (dd2MinhashSigs _),
    "dd3_lsh_pairs" -> (dd3LshPairs _),
    "dd4_ngram_jaccard" -> (dd4NgramJaccard _),
    "dd5_simhash" -> (dd5Simhash _))

  val oracles: Map[String, String] = Map(
    "dd1_exact_dedup" -> dd1ExactDedupSql,
    "dd2_minhash_sigs" -> dd2MinhashSigsSql,
    "dd3_lsh_pairs" -> dd3LshPairsSql,
    "dd4_ngram_jaccard" -> dd4NgramJaccardSql,
    "dd5_simhash" -> dd5SimhashSql)
}
