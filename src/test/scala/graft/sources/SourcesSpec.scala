package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Scan/sink round-trips (SURVEY §2.1) on temp dirs. */
class SourcesSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_src").toString

  test("S1 jsonl scan with offset window") {
    val dir = tmp()
    val lines = (0 until 20).map(i => s"""{"id":"p$i","title":"title $i","n":$i}""")
    Files.write(java.nio.file.Paths.get(dir, "papers.jsonl"),
      lines.mkString("\n").getBytes)
    val df = Sources.readJsonl(spark, dir + "/papers.jsonl")
    assert(df.count() === 20)
    val win = Sources.readJsonl(spark, dir + "/papers.jsonl").orderBy("n").offset(5).limit(3)
    assert(win.select("id").collect().map(_.getString(0)).toSeq === Seq("p5", "p6", "p7"))
  }

  test("S9 conll scan: blank-line sentences, tab-separated, short dropped") {
    val dir = tmp()
    val conll = "The\tO\nCOCO\tU-DATASET_NAME\ndataset\tO\n\nShort\tO\n\nA\tO\nB\tO\n"
    Files.write(java.nio.file.Paths.get(dir, "x.conll"), conll.getBytes)
    val df = Sources.readConll(spark, dir + "/x.conll")
    val rows = df.orderBy("sentence_id").collect()
    assert(rows.length === 2) // 1-token sentence dropped
    assert(rows(0).getSeq[String](0) === Seq("The", "COCO", "dataset"))
    assert(rows(0).getSeq[String](1) === Seq("O", "U-DATASET_NAME", "O"))
    assert(rows(1).getSeq[String](0) === Seq("A", "B"))
  }

  test("S9 conll sentence_id is deterministic under repartition") {
    val dir = tmp()
    val conll = (0 until 12).map(i => s"tok${i}a\tO\ntok${i}b\tO").mkString("\n\n")
    Files.write(java.nio.file.Paths.get(dir, "y.conll"), conll.getBytes)
    def ids(n: Int): Seq[(Long, Seq[String])] = {
      val df = Sources.readConll(spark, dir + "/y.conll").repartition(n)
      df.collect().map(r => (r.getLong(2), r.getSeq[String](0))).sortBy(_._1).toSeq
    }
    val one = ids(1)
    assert(one === ids(7))
    assert(one.map(_._1) === (0L until 12L)) // in-file positions, not partition-derived
  }

  test("S11 prodigy jsonl sink shape round-trips") {
    val dir = tmp() + "/out"
    import spark.implicits._
    val df = Seq(("some text", "pid1", "paper1"), ("more text", "pid2", "paper2"))
      .toDF("text", "paragraph_id", "paper_id")
    Sources.writeProdigyJsonl(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() === 2)
    val r = back.orderBy("meta.paragraph_id").select("text", "meta.paragraph_id", "meta.paper_id")
      .collect()(0)
    assert(r.getString(0) === "some text")
    assert(r.getString(1) === "pid1")
    assert(r.getString(2) === "paper1")
  }

  test("P3/J4 manifest anti-join skips materialized ids") {
    import spark.implicits._
    val input = Seq("a", "b", "c", "d").toDF("id")
    val manifest = Seq("b", "d").toDF("id")
    val todo = Sources.notYetMaterialized(input, manifest, "id")
    assert(todo.select("id").collect().map(_.getString(0)).sorted.toSeq === Seq("a", "c"))
  }

  test("gazetteer json scan") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(dir, "labels.json"),
      """{"dataset_names": ["ANES 1952 Time Series Study", "COCO", "ImageNet"]}""".getBytes)
    val names = Sources.readGazetteer(spark, dir + "/labels.json")
    assert(names.toSet === Set("ANES 1952 Time Series Study", "COCO", "ImageNet"))
  }

  test("S8 annotations csv: stringified biluo parses to arrays") {
    val dir = tmp()
    val csv =
      """text,entities,biluo,has_entity
        |"uses the COCO dataset","[(9, 13, 'DATASET_NAME')]","['O', 'O', 'U-DATASET_NAME', 'O']",True
        |"no entities here","[]","['O', 'O', 'O']",False
        |""".stripMargin
    Files.write(java.nio.file.Paths.get(dir, "ann.csv"), csv.getBytes)
    val df = Sources.readAnnotationsCsv(spark, dir + "/ann.csv")
    val rows = df.orderBy(desc("has_entity")).collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Boolean]("has_entity"))
    assert(rows(0).getSeq[String](df.columns.indexOf("biluo")) ===
      Seq("O", "O", "U-DATASET_NAME", "O"))
    assert(!rows(1).getAs[Boolean]("has_entity"))
  }

  test("quarantine jsonl scan captures malformed lines without failing or dropping") {
    import org.apache.spark.sql.types._
    val dir = tmp()
    val lines = Seq(
      """{"id":"a","n":1}""",
      """{"id":"b","n":NOT_JSON}""",
      """{"id":"c","n":3}""",
      """{broken""")
    Files.write(java.nio.file.Paths.get(dir, "mixed.jsonl"), lines.mkString("\n").getBytes)
    val schema = StructType(Seq(StructField("id", StringType), StructField("n", LongType)))
    // Spark refuses queries whose only referenced column is the internal
    // corrupt-record column on a raw scan — persist the parsed batch first
    // (the documented split-then-route pattern)
    val df = Sources.readJsonlQuarantine(spark, dir + "/mixed.jsonl", schema).cache()
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() === 2)
    assert(good.select("id").collect().map(_.getString(0)).toSet === Set("a", "c"))
    // quarantined rows keep the raw line for replay
    assert(bad.count() === 2)
    assert(bad.select("_corrupt_record").collect().map(_.getString(0)).toSet ===
      Set("""{"id":"b","n":NOT_JSON}""", """{broken"""))
  }

  test("ORC round-trip preserves values and pushes filters into the scan") {
    val dir = tmp() + "/docs_orc"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    Sources.writeOrc(docs, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.count() === docs.count())
    val a = docs.select("doc_id", "n_chars").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = back.select("doc_id", "n_chars").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    val plan = back.filter(col("n_chars") > 200).select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,200)]"),
      s"ORC scan must push the predicate:\n$plan")
  }
}
