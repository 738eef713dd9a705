package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Golden E1 ingestion test over a miniature cermxml corpus (SURVEY §5.3 —
  * mirrors the reference's 12-paper/232-paragraph fixture in shape). */
class PaperXmlSpec extends SparkSpec {

  private def paper(title: String, author: String, paras: Seq[String]): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<article>
       |  <front>
       |    <article-title>$title</article-title>
       |    <contrib contrib-type="author"><string-name>$author</string-name></contrib>
       |    <contrib contrib-type="editor"><string-name>Not An Author</string-name></contrib>
       |    <aff><institution>Some University (Dept. of CS)</institution></aff>
       |    <abstract>We  study   data.</abstract>
       |  </front>
       |  <body>
       |    ${paras.map(p => s"<p>$p</p>").mkString("\n    ")}
       |  </body>
       |</article>""".stripMargin

  test("golden ingest: papers + candidate paragraphs") {
    val dir = Files.createTempDirectory("cermxml").toString
    Files.write(Paths.get(dir, "a.cermxml"), paper(
      "A Fine Long Title", "Alice1 Smith2",
      Seq("this paragraph mentions data sets", "this one does not", "more data here")).getBytes)
    Files.write(Paths.get(dir, "b.cermxml"), paper(
      "Too Short", "Bob Jones",
      Seq("no candidates at all")).getBytes)
    Files.write(Paths.get(dir, "broken.cermxml"), "<article><unclosed".getBytes)

    val (papers, paragraphs) = PaperXml.ingest(spark, dir)
    val p = papers.orderBy("paper_path").collect()
    assert(p.length === 2) // broken file filtered (P7 null guard)
    val a = p(0)
    assert(a.getAs[String]("title") === "A Fine Long Title")
    // title with <3 words nulled (P2)
    assert(p(1).getAs[String]("title") === null)
    // F2: digits stripped from authors; non-author contribs excluded
    assert(a.getSeq[String](p(0).fieldIndex("authors")) === Seq("Alice Smith"))
    // F3: parens stripped from affiliations
    assert(a.getSeq[String](p(0).fieldIndex("affiliations")) ===
      Seq("Some University Dept. of CS"))
    // F1: abstract whitespace normalized
    assert(a.getAs[String]("abstract") === "We study data.")

    val paras = paragraphs.collect()
    // P1: only 'data'-containing paragraphs survive — 2 from paper a, 0 from b
    assert(paras.length === 2)
    assert(paras.forall(_.getAs[String]("body_text").contains("data")))
    // deterministic ids: re-ingest yields identical ids (F17)
    val (_, paragraphs2) = PaperXml.ingest(spark, dir)
    assert(paragraphs2.select("paragraph_id").collect().map(_.getString(0)).sorted.toSeq ===
      paras.map(_.getAs[String]("paragraph_id")).sorted.toSeq)
  }

  test("packed ingest is row-identical to many-files ingest") {
    val dir = Files.createTempDirectory("cermxml_pk").toString
    (0 until 5).foreach { i =>
      Files.write(Paths.get(dir, f"p$i%02d.cermxml"), paper(
        s"Packed Parity Title $i", s"Dana$i Lee",
        Seq(s"paragraph $i with data inside", "filler without the keyword")).getBytes)
    }
    val packed = dir + "_packed"
    spark.read.option("wholetext", "true").text(dir + "/*.cermxml")
      .select(input_file_name().as("paper_path"), col("value").as("xml"))
      .coalesce(1).write.parquet(packed)

    val (papFiles, parFiles) = PaperXml.ingest(spark, dir)
    val (papPacked, parPacked) = PaperXml.ingestPacked(spark, packed)
    assert(papPacked.orderBy("paper_id").collect().toSeq ===
      papFiles.orderBy("paper_id").collect().toSeq)
    assert(parPacked.orderBy("paragraph_id").collect().toSeq ===
      parFiles.orderBy("paragraph_id").collect().toSeq)
  }

  test("ingest path codegens — no silent interpreted-projection fallback") {
    // r4 regression: Parsed was a private nested case class, Janino could not
    // bind its accessors, and every row fell back to interpreted projection
    // (WARN-only, invisible). CODEGEN_ONLY turns that fallback into a hard
    // failure, so this test goes red if the encoder ever stops codegen-ing.
    val dir = Files.createTempDirectory("cermxml_cg").toString
    Files.write(Paths.get(dir, "c.cermxml"), paper(
      "Another Fine Title", "Carol Chen",
      Seq("a paragraph with data in it")).getBytes)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val (papers, paragraphs) = PaperXml.ingest(spark, dir)
      assert(papers.count() === 1L)
      assert(paragraphs.count() === 1L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("ensurePacked recovers from a stale partial packed directory") {
    // review r7: an interrupted builder leaves <corpus>_packed with part
    // files but no _SUCCESS; the rename-based build must clear the stale
    // target and install a fresh complete copy, not delete its own staging
    // copy and return the broken directory forever
    val sfDir = "/root/testdata/sf0.001"
    val filesDir = PaperXmlGen.ensureCorpus(spark, sfDir)
    val packed = Paths.get(filesDir + "_packed")
    // wipe any complete build, then plant a stale partial dir
    if (Files.exists(packed))
      Files.walk(packed).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    Files.createDirectories(packed)
    Files.write(packed.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    assert(!Files.exists(packed.resolve("_SUCCESS")))

    val got = PaperXmlGen.ensurePacked(spark, sfDir)
    assert(got === packed.toString)
    assert(Files.exists(packed.resolve("_SUCCESS")),
      "rebuild must install a COMPLETE packed dir over the stale partial one")
    // and it is readable with the expected row count (one per paper)
    val n = spark.read.parquet(got).count()
    val nPapers = Files.list(Paths.get(filesDir)).iterator()
    var cnt = 0L
    while (nPapers.hasNext) { if (nPapers.next().toString.endsWith(".cermxml")) cnt += 1 }
    assert(n === cnt)
  }
}
