package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 query specs: tok8 byte fallback. */
class R12QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Decode a byte-fallback piece stream back to the original string:
    * `<0xXX>` pieces contribute raw bytes, every other piece its UTF-8
    * bytes — then one UTF-8 decode over the byte stream. This is the
    * inverse the tokenizer contract promises. */
  private def decode(pieces: Seq[String]): String = {
    val bytes = pieces.flatMap {
      case p if p.startsWith("<0x") && p.endsWith(">") && p.length == 6 =>
        Seq(Integer.parseInt(p.substring(3, 5), 16).toByte)
      case p => p.getBytes("UTF-8").toSeq
    }
    new String(bytes.toArray, "UTF-8")
  }

  test("tok8: a rare multi-byte char round-trips through byte pieces losslessly") {
    import spark.implicits._
    // "café" char-split state; alphabet covers ASCII letters only, so 'é'
    // (U+00E9, UTF-8 C3 A9) is out-of-alphabet and must become TWO byte
    // pieces; the in-alphabet "ca" merge must survive intact
    val state = Seq(("café", 7L, Seq("ca", "f", "é"))).toDF("word", "freq", "syms")
    val alphabet = ('a' to 'z').map(_.toString)
    val r = CorpusQueries.byteFallbackEncode(state, alphabet).collect().head
    val pieces = r.getAs[scala.collection.Seq[String]]("pieces").toSeq
    assert(pieces === Seq("ca", "f", "<0xC3>", "<0xA9>"))
    assert(r.getAs[Int]("n_pieces") === 4)
    assert(r.getAs[Int]("n_byte_pieces") === 2)
    assert(decode(pieces) === "café", "byte fallback must be lossless")
  }

  test("a34: alpha equals a brute-force pairwise re-derivation and hits the textbook poles") {
    import spark.implicits._
    // fixture with MISSING ratings: 5 units, up to 3 raters, m_u ∈ {2, 3};
    // unit 9 has a single rating and must be DROPPED as unpairable
    val ratings = Seq(
      (1L, 0, "a"), (1L, 1, "a"), (1L, 2, "a"),
      (2L, 0, "a"), (2L, 1, "b"),
      (3L, 0, "b"), (3L, 1, "b"), (3L, 2, "c"),
      (4L, 0, "c"), (4L, 2, "c"),
      (5L, 0, "a"), (5L, 1, "b"), (5L, 2, "b"),
      (9L, 0, "a"))
    val r = TextQueries.krippendorffCore(
      ratings.toDF("doc_id", "r", "label")).collect().head
    assert(r.getAs[Long]("n_units") === 5)
    assert(r.getAs[Long]("n_values") === 13)
    // brute force off-plan: D_o = (1/n)·Σ_u Σ_{c≠k} n_uc·n_uk/(m_u−1),
    // D_e = (1/(n(n−1)))·Σ_{c≠k} n_c·n_k — the textbook definition
    val pairable = ratings.filter(_._1 != 9L)
    val byUnit = pairable.groupBy(_._1).values.map(_.map(_._3))
    val n = pairable.size.toDouble
    val dO = byUnit.map { ls0 =>
      val ls = ls0.toIndexedSeq
      val m = ls.size.toDouble
      // all index pairs (combinations() would dedupe equal-label multiset
      // pairs and undercount)
      val disagree = (for (i <- ls.indices; j <- ls.indices if i < j)
        yield if (ls(i) != ls(j)) 1 else 0).sum
      disagree * 2.0 / (m - 1.0)
    }.sum / n
    val margins = pairable.groupBy(_._3).view.mapValues(_.size.toDouble).toMap
    // keys.toSeq: a for over Set would DEDUPE equal products (25 = 5·5
    // counted once instead of twice) and silently shrink Σ n_c·n_k
    val sumE = (for (c <- margins.keys.toSeq; k <- margins.keys.toSeq if c != k)
      yield margins(c) * margins(k)).sum
    val dE = sumE / (n * (n - 1.0))
    val expect = math.round(1e6 * (1.0 - dO / dE))
    assert(r.getAs[Long]("alpha_e6") === expect,
      s"query alpha ${r.getAs[Long]("alpha_e6")} != brute-force $expect")
    // poles: perfect agreement → 1; and the corpus face is in (0, 1]
    val perfect = TextQueries.krippendorffCore(
      Seq((1L, 0, "x"), (1L, 1, "x"), (2L, 0, "y"), (2L, 1, "y"))
        .toDF("doc_id", "r", "label")).collect().head
    assert(perfect.getAs[Long]("alpha_e6") === 1000000L)
    val corpus = TextQueries.a34Krippendorff(spark, dir).collect().head
    assert(corpus.getAs[Long]("alpha_e6") > 0L &&
      corpus.getAs[Long]("alpha_e6") <= 1000000L)
    // the 20% flip + missingness must land agreement well below perfect
    assert(corpus.getAs[Long]("alpha_e6") < 1000000L)
  }

  test("tok8: corpus face emits only byte-affected words and replays tok2 merges") {
    val rows = CorpusQueries.tok8ByteFallback(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_byte_pieces") >= 1)
      val enc = r.getAs[String]("encoded")
      assert(enc.contains("<0x"), s"expected a byte piece in $enc")
      // every byte piece must decode back into the word (losslessness on
      // the corpus face too)
      assert(decode(enc.split('|').toSeq) === r.getAs[String]("word"))
    }
  }
}
