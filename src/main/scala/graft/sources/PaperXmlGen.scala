package graft.sources

import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.util.Random

/** Deterministic synthetic CERMINE-XML corpus generator — gives the S5/E1
  * file-ingest path (`PaperXml.ingest`) a benchable corpus at every scale
  * factor (VERDICT r4 item 8: the one path a catalog user runs first had a
  * golden spec but no number). The corpus is scaled off the sf dir's
  * `documents` row count (papers = docs/2), written once per size into the
  * JVM temp dir behind a completion marker, and reused by later runs.
  *
  * Content is seeded per paper index, so every run — and both engines of any
  * future oracle — sees byte-identical files. Roughly half the paragraphs
  * contain the literal "data", exercising the P1 candidate filter both ways.
  * Shape mirrors the reference fixture (title/authors/affiliation/abstract/
  * paragraphs — `dataset_ner/paper_processing.py:58-129`). */
object PaperXmlGen {

  private val words = Vector(
    "model", "corpus", "table", "index", "survey", "method", "result",
    "sample", "measure", "signal", "study", "field", "region", "window",
    "stream", "batch", "query", "plan", "join", "scan", "filter", "group",
    "order", "merge", "hash", "sort", "range", "limit", "count", "value")

  private def paragraph(rnd: Random, withData: Boolean): String = {
    val n = 20 + rnd.nextInt(21)
    val body = Seq.fill(n)(words(rnd.nextInt(words.length)))
    val all = if (withData) {
      val at = rnd.nextInt(body.length)
      body.patch(at, Seq("data"), 0)
    } else body
    all.mkString(" ")
  }

  private def paper(idx: Int): String = {
    val rnd = new Random(1000003L * idx + 17)
    val title = Seq.fill(4)(words(rnd.nextInt(words.length))).mkString(" ")
    val author = s"Author${idx} Name${rnd.nextInt(100)}"
    val nParas = 6 + rnd.nextInt(7)
    val paras = (0 until nParas)
      .map(i => paragraph(rnd, withData = (i + idx) % 2 == 0))
      .map(p => s"<p>$p</p>").mkString("\n    ")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<article>
       |  <front>
       |    <article-title>$title $idx</article-title>
       |    <contrib contrib-type="author"><string-name>$author</string-name></contrib>
       |    <aff><institution>University $idx (Dept. ${rnd.nextInt(40)})</institution></aff>
       |    <abstract>We study data in corpus $idx.</abstract>
       |  </front>
       |  <body>
       |    $paras
       |  </body>
       |</article>""".stripMargin
  }

  /** Version stamp baked into the cache directory name so ANY change to the
    * generated content invalidates shared-tmpdir corpora from earlier builds
    * (ADVICE r5: a count-only key silently reused stale files). Derived from
    * the actual bytes of paper(0) — editing the generator changes the hash
    * with no constant to remember to bump. */
  private lazy val contentVersion: String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(paper(0).getBytes(StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
  }

  /** Generate (once) and return the corpus directory for `sfDir`'s scale. */
  def ensureCorpus(s: SparkSession, sfDir: String): String = {
    val nDocs = graft.Tables(s, sfDir, "documents").count()
    val nPapers = math.max(20L, nDocs / 2).toInt
    val dir = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_cermxml_${contentVersion}_$nPapers")
    val marker = dir.resolve("_COMPLETE")
    if (!Files.exists(marker)) {
      Files.createDirectories(dir)
      (0 until nPapers).foreach { i =>
        Files.write(dir.resolve(f"paper_$i%06d.cermxml"),
          paper(i).getBytes(StandardCharsets.UTF_8))
      }
      Files.write(marker, nPapers.toString.getBytes(StandardCharsets.UTF_8))
    }
    dir.toString
  }

  /** Generate (once) the PACKED form of the same corpus: a parquet of
    * (paper_path, xml) rows built by reading the many-files corpus exactly
    * as [[graft.sources.PaperXml.ingest]] would — so paths and bytes are
    * identical between the two representations — coalesced to a handful of
    * files. This is the input shape a 100 TB ingest should arrive in. */
  def ensurePacked(s: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    val filesDir = ensureCorpus(s, sfDir)
    val packed = Paths.get(filesDir + "_packed")
    if (!Files.exists(packed.resolve("_SUCCESS"))) {
      s.read.option("wholetext", "true").text(filesDir + "/*.cermxml")
        .select(input_file_name().as("paper_path"), col("value").as("xml"))
        .coalesce(4)
        .write.mode("overwrite").parquet(packed.toString)
    }
    packed.toString
  }
}
