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
