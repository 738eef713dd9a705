package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-18 pins: the native `phash64` loop must stay bit-identical to
  * the unrolled SQL spelling it replaced (including non-ASCII code-point
  * semantics), the clustered partitioned write must actually produce one
  * file per partition directory with rows sorted by the probe column,
  * and postings v2 rows must carry exactly the doclen artifact's `dl`. */
class R18QueriesSpec extends SparkSpec {

  /** The pre-r18 unrolled spelling of the pHash chain, kept here as the
    * parity witness (the production path is
    * [[graft.plans.Phash64Expression]]). Mirrors the e4 DCT-II tables via
    * the same round(1e4·cos) derivation. */
  private def oldSpellingPhash(df: org.apache.spark.sql.DataFrame) = {
    val ce4 = Array.tabulate(8, 8)((u, r) =>
      math.round(1e4 * math.cos((2 * r + 1) * u * math.Pi / 16)))
    def tvTerm(j: Int) =
      (0 until 8).map(r => s"(${ce4(j / 8)(r)}) * element_at(gv, ${8 * r + j % 8 + 1})")
        .mkString(" + ")
    def fvTerm(j: Int) =
      (0 until 8).map(c => s"element_at(tv, ${(j / 8) * 8 + c + 1}) * (${ce4(j % 8)(c)})")
        .mkString(" + ")
    df.filter(length(col("text")) >= 64)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n"))
      .withColumn("codes", expr(
        "transform(filter(split(text, ''), c -> c <> ''), c -> CAST(ascii(c) AS BIGINT))"))
      .withColumn("gv", expr(
        """transform(sequence(0, 63), k ->
          |  aggregate(slice(codes, CAST(k * n div 64 AS INT) + 1,
          |      CAST((k + 1) * n div 64 - k * n div 64 AS INT)),
          |    0L, (acc, x) -> acc + x)
          |  div ((k + 1) * n div 64 - k * n div 64))""".stripMargin))
      .withColumn("tv", expr(s"array(${(0 until 64).map(tvTerm).mkString(", ")})"))
      .withColumn("fv", expr(s"array(${(0 until 64).map(fvTerm).mkString(", ")})"))
      .withColumn("med", expr("element_at(array_sort(fv), 32)"))
      .withColumn("old64", expr((0 until 64).map { j =>
        val bit = if (j == 63) "(-9223372036854775807L - 1L)" else s"shiftleft(1L, $j)"
        s"IF(element_at(fv, ${j + 1}) > med, $bit, 0L)"
      }.mkString(" + ")))
      .select("doc_id", "old64")
  }

  test("phash64: the native loop is bit-identical to the unrolled SQL spelling") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog padded to length"
    val texts = Seq(
      0L -> (base * 3),
      1L -> (base * 3).replace("quick", "quirk"),           // perturbed copy
      2L -> ("z" * 64),                                     // degenerate flat blocks
      3L -> (1 to 40).map(i => s"tok$i").mkString(" "),     // varied lengths
      4L -> (base + " café élève résumé " + base), // non-ASCII code points
      5L -> ("a" * 63 + "b" * 63)                           // uneven block boundaries
    ).toDF("doc_id", "text")
    val native = graft.queries.MultimodalQueries.phashSigs(texts)
      .select(col("asset_id").as("doc_id"), col("phash64"))
    val old = oldSpellingPhash(texts)
    val joined = native.join(old, Seq("doc_id")).collect()
    assert(joined.length === 6)
    joined.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"doc ${r.getLong(0)}: native ${r.getLong(1)} != old spelling ${r.getLong(2)}")
    }
  }

  test("writePartitioned: one file per partition dir, rows sorted by the sort column") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("wp18").toString
    val df = (0L until 2000L)
      .map(i => (i, s"w${(i * 7) % 97}", i % 8))
      .toDF("doc_id", "word", "bucket")
      .repartition(16) // many upstream tasks — the naive write fans out
    graft.sources.Layout.writePartitioned(df, s"$tmp/p", "bucket", "word")
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(s"$tmp/p"))
      .filter(p => p.getFileName.toString.startsWith("bucket="))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
    assert(dirs.length === 8)
    dirs.foreach { d =>
      val files = java.nio.file.Files.list(d)
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toArray
      assert(files.length === 1,
        s"${d.getFileName}: expected ONE clustered file, got ${files.length}")
    }
    // within one partition file, rows arrive sorted by the sort column
    val one = spark.read.parquet(s"$tmp/p/bucket=3")
      .select("word").collect().map(_.getString(0)).toSeq
    assert(one === one.sorted, "rows inside a bucket file must be word-sorted")
    // round-trips the full row set
    assert(spark.read.parquet(s"$tmp/p").count() === 2000L)
  }

  test("postings v2: every posting row carries exactly its doc's doclen dl") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pv2").toString
    val docs = (0L until 100L)
      .map(i => (i, s"alpha beta doc$i gamma" + (" beta" * (i % 3).toInt), 0L))
      .toDF("doc_id", "text", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val home = TextQueries.ensureBasePostingsIndex(spark, tmp)
    val post = spark.read.parquet(home.resolve("postings").toString)
    assert(post.columns.contains("dl"), "v2 postings must carry dl")
    val dl = spark.read.parquet(home.resolve("doclen").toString)
      .withColumnRenamed("dl", "dl_artifact")
    val mismatch = post.join(dl, Seq("doc_id"))
      .filter(col("dl") =!= col("dl_artifact")).count()
    assert(mismatch === 0L, "postings dl must equal the doclen artifact")
    // and dl is consistent within a doc: sum(tf) per doc equals dl
    val bad = post.groupBy("doc_id", "dl").agg(sum("tf").as("s"))
      .filter(col("s") =!= col("dl")).count()
    assert(bad === 0L, "per-doc sum(tf) must equal the carried dl")
  }
}
