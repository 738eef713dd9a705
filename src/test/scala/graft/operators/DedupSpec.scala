package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class DedupSpec extends SparkSpec {

  /** Local union-find oracle. */
  private def ufComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents matches union-find on random graphs") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 40
      val pairs = (1 to 30).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      import spark.implicits._
      val df = pairs.toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(df, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ufComponents(pairs)
      assert(got === want, s"trial $trial")
    }
  }

  test("connectedComponents closes a chain that direct pairs would miss") {
    import spark.implicits._
    // chain 1-2, 2-3, 3-4: one component rooted at 1
    val df = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(df, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("dropDuplicates keeps exactly the component minima") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val dups = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.dropDuplicates(docs, "doc_id", dups)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 5L, 7L, 8L, 9L, 10L))
  }

  test("simhashPairs finds exactly the pairs within the hamming bound") {
    import spark.implicits._
    val rnd = new Random(19)
    val sigs = (0L until 60L).map(i => (i, rnd.nextInt(1 << 16).toLong)).toDF("doc_id", "simhash16")
    val got = Dedup.simhashPairs(sigs, "doc_id", bits = 16, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force oracle over all pairs
    val rows = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got === want) // pigeonhole banding guarantees NO misses
  }

  test("LSH banding recall: high-Jaccard pairs become candidates (S-curve)") {
    import spark.implicits._
    val rnd = new Random(23)
    val vocab = (1 to 200).map(i => s"w$i")
    // 20 base docs of 40 words; each gets a near-duplicate with 1-2 words
    // swapped (3-shingle Jaccard ≈ 0.78–0.93) and the bases are mutually
    // unrelated (J ≈ 0)
    val docs = (0 until 20).flatMap { d =>
      val words = Array.fill(40)(vocab(rnd.nextInt(vocab.length)))
      val dup = words.clone()
      (0 until 1 + rnd.nextInt(2)).foreach(_ => dup(rnd.nextInt(40)) = vocab(rnd.nextInt(vocab.length)))
      Seq((d.toLong * 2, words.mkString(" ")), (d.toLong * 2 + 1, dup.mkString(" ")))
    }
    val df = docs.toDF("doc_id", "text")
    val cands = Dedup.lshCandidatePairs(Dedup.minhashSignatures(df, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // true Jaccard per planted pair, computed directly from shingle sets
    def shingleSet(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val planted = (0 until 20).map { d =>
      val a = docs(d * 2)._2; val b = docs(d * 2 + 1)._2
      val (sa, sb) = (shingleSet(a), shingleSet(b))
      val j = (sa intersect sb).size.toDouble / (sa union sb).size
      ((d.toLong * 2, d.toLong * 2 + 1), j)
    }
    val high = planted.filter(_._2 >= 0.8)
    assert(high.nonEmpty)
    val found = high.count(p => cands.contains(p._1))
    // 16 hashes / 4 bands / 4 rows: P(candidate | J=0.8) ≈ 0.88 analytically;
    // the seeded corpus must recover most planted high-J pairs
    assert(found.toDouble / high.size >= 0.7,
      s"LSH recall on J≥0.8 pairs: $found/${high.size}")
  }

  test("incremental LSH pairs == full re-pair restricted to delta-touching pairs") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = pairSet(Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id"))
    val deltaIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = full.filter(p => deltaIds(p._1) || deltaIds(p._2))
    val got = pairSet(Dedup.incrementalCandidatePairs(
      Dedup.minhashSignatures(corpus, "doc_id", "text"),
      Dedup.minhashSignatures(delta, "doc_id", "text"), "doc_id"))
    assert(got === expected)
    assert(got.nonEmpty, "testdata should produce at least one delta-touching pair")
  }

  test("dd13: minhash estimate is a bounded-error sketch of exact jaccard") {
    val rows = graft.queries.DedupQueries.dd13MinhashEstimate(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (exact, est, err) =>
      assert(est >= 0L && est <= 1000000L)
      assert(err === math.abs(est - exact))
    }
    // k=16 gives sigma <= 0.125; mean |error| across verified pairs should
    // sit well inside 3 sigma — a systematic estimator bug (wrong hash
    // family, misaligned components) blows far past this
    val meanErr = rows.map(_._3).sum.toDouble / rows.length
    assert(meanErr < 375000.0, s"mean |est - exact| = $meanErr")
  }

  test("connectedComponents on empty pairs returns empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() === 0L)
  }
}
