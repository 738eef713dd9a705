package graft.queries

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Round-19 invariants — the skew-realism round (VERDICT r18 #2).
  *
  * dd24_star_closure is the linear-candidate scale path for the near-dup
  * closure: star expansion within LSH buckets instead of clique expansion.
  * These specs pin (a) the linearity claim itself, (b) equivalence with
  * dd8's verified-clique closure on the template-cluster corpus shape the
  * face exists for, and (c) that the phrase-batch kernel's distinct-triple
  * dedup is invisible in results. */
class R19QueriesSpec extends SparkSpec {

  /** A corpus with ONE template near-dup cluster (the skew-corpus shape:
    * clones of a template, each mutating one token) plus unique filler. */
  private def templateCorpusDir(nClones: Int): String = {
    val spark0 = spark
    import spark0.implicits._
    val template = (1 to 30).map(i => s"t$i")
    val clones = (0 until nClones).map { k =>
      val toks = template.updated(k % template.length, s"mut$k")
      (k.toLong, toks.mkString(" "))
    }
    val filler = (0 until 20).map { k =>
      (1000L + k, (1 to 25).map(i => s"f${k}_$i").mkString(" "))
    }
    val docs = (clones ++ filler).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("r19tpl").toString
    docs.coalesce(1).write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("starCandidatePairs is linear where lshCandidatePairs is quadratic") {
    val dir = templateCorpusDir(nClones = 40)
    val sigs = Dedup.minhashSignatures(
      graft.Tables(spark, dir, "documents"), "doc_id", "text")
    val clique = Dedup.lshCandidatePairs(sigs, "doc_id")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = Dedup.starCandidatePairs(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 40-clone cluster collides across bands: clique blows up toward
    // B(B-1)/2, star stays within (B-1) per band
    assert(clique.size >= 40 * 39 / 4,
      s"fixture did not collide as intended: ${clique.size} clique pairs")
    assert(star.size <= 39 * Dedup.Bands,
      s"star emitted super-linear candidates: ${star.size}")
    // star edges are a subset of the clique candidate set (same buckets)
    assert(star.subsetOf(clique), "star edge outside the clique candidate set")
  }

  test("dd24 star closure equals dd8 clique closure on a template cluster") {
    val dir = templateCorpusDir(nClones = 25)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaClique = rows(DedupQueries.dd8Clusters(spark, dir))
    val viaStar = rows(DedupQueries.dd24StarClosure(spark, dir))
    assert(viaClique.nonEmpty)
    assert(viaStar === viaClique,
      "star closure diverged from clique closure on the uniform-verify shape")
  }

  test("native simhash loop is bit-identical to the grouped spelling (16 and 64 bits)") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    for (bits <- Seq(16, 64)) {
      val grouped = Dedup.simhashGrouped(docs, "doc_id", "text", bits)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val native = Dedup.simhash(docs, "doc_id", "text", bits)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(native.nonEmpty)
      assert(native === grouped, s"simhash$bits diverged")
    }
  }

  test("native winnow_mins kernel matches the chained-HOF ta5 spelling") {
    val dir = "/root/testdata/sf0.001"
    val hof = TextQueries.ta5WinnowFingerprintHof(spark, dir)
      .collect().map(_.toSeq).toSeq
    val native = TextQueries.ta5WinnowFingerprint(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(native.nonEmpty)
    assert(native === hof)
  }

  test("phash64 SQL surface: NULL on short input; internal path still loud") {
    val spark0 = spark
    import spark0.implicits._
    // the registered SQL function (nullOnShort = true): ad-hoc callers get
    // NULL for sub-64-code-point text instead of a task crash (ADVICE r18)
    val sqlExpr = org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.Phash64Expression(
        org.apache.spark.sql.GraftColumnBridge.expression(col("t")), nullOnShort = true))
    val long64 = ("x" * 64)
    val rows = Seq("short", long64).toDF("t").select(sqlExpr.as("h")).collect()
    assert(rows(0).isNullAt(0), "short input must be NULL on the SQL surface")
    assert(!rows(1).isNullAt(0))
    // internal constructor keeps the loud contract behind its guards
    val ex = intercept[Exception] {
      Seq("short").toDF("t").select(
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.plans.Phash64Expression(
            org.apache.spark.sql.GraftColumnBridge.expression(col("t")))).as("h"))
        .collect()
    }
    assert(ex.getMessage.contains("64 code points") ||
      Option(ex.getCause).exists(_.getMessage.contains("64 code points")))
  }

  test("phrase batch: repeated (w1, w2, slop) triples serve identical slices") {
    val dir = "/root/testdata/sf0.001"
    // duplicate the whole 12-query table under shifted query ids — the
    // kernel must evaluate 12 window tests, not 24, and each duplicate
    // query's slice must be row-identical to its twin's
    val batch = TextQueries.PhraseBatch ++
      TextQueries.PhraseBatch.map { case (q, w1, w2, sl) => (q + 100L, w1, w2, sl) }
    val out = TextQueries.ir21Internals(spark, dir, batch, 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val bySlice = out.groupBy(_._1).map { case (q, rs) =>
      q -> rs.map(r => (r._2, r._3, r._4)).sortBy(x => (x._1, x._2)).toSeq
    }
    TextQueries.PhraseBatch.foreach { case (q, _, _, _) =>
      assert(bySlice.get(q) === bySlice.get(q + 100L),
        s"duplicate query ${q + 100L} diverged from $q")
    }
  }
}
