package graft.model

import graft.SparkSpec

class ModelSpec extends SparkSpec {

  test("typed documents and embeddings round-trip with honest types") {
    val docs = Model.documents(spark, "/root/testdata/sf0.001").collect()
    assert(docs.length === 500)
    assert(docs.forall(d => d.n_chars == d.text.length))
    val embs = Model.embeddings(spark, "/root/testdata/sf0.001").head(5)
    assert(embs.forall(_.embedding.length === 64))
  }

  test("typed papers/paragraphs from XML ingestion") {
    val dir = java.nio.file.Files.createTempDirectory("typed_xml").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "p.cermxml"),
      """<article><article-title>A Real Three Words</article-title>
        |<contrib contrib-type="author"><string-name>A B</string-name></contrib>
        |<abstract>x</abstract><p>some data here</p></article>""".stripMargin.getBytes)
    val (papersDf, parasDf) = graft.sources.PaperXml.ingest(spark, dir)
    val papers = Model.papers(papersDf).collect()
    assert(papers.length === 1)
    assert(papers(0).title.contains("A Real Three Words"))
    assert(papers(0).authors === Seq("A B"))
    val paras = Model.paragraphs(parasDf).collect()
    assert(paras.length === 1)
    assert(paras(0).paper_id === papers(0).paper_id)
  }
}
