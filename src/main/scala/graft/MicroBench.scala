package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the FM1 implementations: native Catalyst expression
  * vs Scala UDF vs the naive per-candidate regexp plan (the oracle plan).
  * Prints one JSON line with seconds per variant over the sf dir's
  * documents. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cands = graft.queries.MatchQueries.gazetteer
    val docs = Tables(spark, sfDir, "documents")
    docs.count() // warm

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val candArray = "array(" + cands.map(c => s"'$c'").mkString(",") + ")"
    val (tExpr, nExpr) = time {
      docs.select(explode(expr(s"fast_match(text, $candArray)"))).count()
    }
    val fmUdf = graft.operators.FastMatch.matcher(cands)
    val (tUdf, nUdf) = time {
      docs.select(explode(fmUdf(col("text")))).count()
    }
    val (tRegex, nRegex) = time {
      // per-candidate regexp count — the O(n·m) plan
      cands.map(c => docs.select(
        size(regexp_extract_all(col("text"), lit("\\b" + c + "\\b"), lit(0))).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)).sum
    }
    // vec_dot: native codegen expression vs the composable HOF spelling —
    // all-pairs within label blocks (the dd6-shaped workload)
    val emb = Tables(spark, sfDir, "embeddings")
    emb.count() // warm
    def pairSum(dot: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Long = {
      val a = emb.select(col("label"), col("vec_id").as("ia"), col("embedding").as("ea"))
      val b = emb.select(col("label"), col("vec_id").as("ib"), col("embedding").as("eb"))
      a.join(b, Seq("label")).filter(col("ia") < col("ib"))
        .select(dot(col("ea"), col("eb")).as("d"))
        .agg(sum(round(col("d") * 1000).cast("long"))).collect()(0).getLong(0)
    }
    val (tHof, nHof) = time {
      pairSum((x, y) => aggregate(zip_with(x, y,
        (p, q) => p.cast("double") * q.cast("double")), lit(0.0), (acc, v) => acc + v))
    }
    graft.plans.GraftFunctions.register(spark)
    val (tNative, nNative) = time {
      pairSum((x, y) => call_function("vec_dot", x, y))
    }
    // Bloom contamination screen vs the exact shingle semi-join (the dd7 vs
    // dd10 trade): flagged-shingle totals differ only by false positives
    import graft.queries.Q.{detHash, detHashSql}
    val docsAll = Tables(spark, sfDir, "documents")
    val train = docsAll.filter(detHash(col("doc_id"), 41) % 10 < 8)
    val test = docsAll.filter(detHash(col("doc_id"), 41) % 10 >= 8)
    val trainSh = graft.operators.Dedup.shingles(train, "doc_id", "text", n = 5)
      .select("sh").distinct().localCheckpoint()
    val testSh = graft.operators.Dedup.shingles(test, "doc_id", "text", n = 5)
      .localCheckpoint()
    val (tSemi, nSemi) = time {
      testSh.join(trainSh, Seq("sh"), "left_semi").count()
    }
    val bloomFilter = graft.operators.Bloom.build(trainSh, "sh").localCheckpoint()
    val (tBloom, nBloom) = time {
      graft.operators.Bloom.probeLit(testSh, "sh", bloomFilter)
        .filter(col("in_bloom") === 1).count()
    }
    // det_hash60: native digest+shift vs the md5/conv hex round-trip, over
    // the per-shingle workload every dedup/bloom stage runs (5 hashes per
    // shingle in bloom position math; here one per shingle, 3 rounds each)
    def hashSum(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Long =
      (1 to 3).map { _ =>
        testSh.select("sh").union(trainSh)
          .select(h(col("sh")).as("h")).agg(sum(col("h") % 97)).collect()(0).getLong(0)
      }.sum
    val (tHashMd5, nHashMd5) = time { hashSum(c => graft.queries.Q.detHashMd5(c, 7)) }
    val (tHashNat, nHashNat) = time { hashSum(c => graft.queries.Q.detHash(c, 7)) }
    // Skewed sort-merge join: one hot key carrying ~50% of the fact side,
    // joined to a 1001-row dim forced off the broadcast path (the
    // too-big-to-broadcast regime). Three plans over identical data:
    // AQE skew-split OFF (the single-task straggler), AQE skew-split ON
    // (thresholds lowered so the local data size trips the same logic the
    // 256 MB default trips at cluster scale), and the manual salted join.
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .withColumn("skey",
        when(col("l_orderkey") % 100 < 50, 0L).otherwise(col("l_orderkey") % 1000))
      .localCheckpoint()
    val dim = spark.range(0, 1001).select(col("id").as("skey"),
      (col("id") * 7 % 13).as("payload")).localCheckpoint()
    def joinSum(): Long = li.join(dim, Seq("skey"))
      .agg(sum(col("payload"))).collect()(0).getLong(0)
    def saltedSum(): Long = graft.operators.Skew
      .saltedJoin(li, dim, "skey", "l_orderkey", buckets = 32)
      .agg(sum(col("payload"))).collect()(0).getLong(0)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (tSkewOff, nSkewOff) = time { joinSum() }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val (tSkewAqe, nSkewAqe) = time { joinSum() }
    val (tSalted, nSalted) = time { saltedSum() }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    // n-gram derivation: per-position substring (UTF8String re-seeks the
    // char offset from the string start each call — O(len²) per doc) vs
    // ONE split('') pass + O(1) element_at over the materialized char
    // array (the r12 kernel rule; ta1/a23/tok7 all hit this class). Same
    // trigram multiset — the checksum proves it.
    def triSum(gramsExpr: String): Long =
      docsAll.filter(length(col("text")) >= 3)
        .select(explode(expr(gramsExpr)).as("g"))
        .agg(sum(crc32(col("g")) % 1000)).collect()(0).getLong(0)
    val (tSubstr, nSubstr) = time { triSum(
      "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))") }
    val (tSplit, nSplit) = time {
      docsAll.filter(length(col("text")) >= 3)
        .withColumn("cs", expr("filter(split(text, ''), c -> c <> '')"))
        .select(explode(expr(
          "transform(sequence(1, size(cs) - 2), i -> concat(element_at(cs, i), element_at(cs, i + 1), element_at(cs, i + 2)))")).as("g"))
        .agg(sum(crc32(col("g")) % 1000)).collect()(0).getLong(0)
    }
    require(nSubstr == nSplit, s"trigram checksum mismatch: $nSubstr vs $nSplit")
    // Three MinHash spellings (r18 ADVICE: the bench must time the SHIPPED
    // kernel, not only the rejected alternatives): `grouped` is the
    // explode -> groupBy(doc) shuffle form, `perRow` the HOF fold
    // (CodegenFallback — measured ~60% slower than grouped at refresh
    // scale, the r18 negative result), `native` the production
    // MinhashSigsExpression codegen loop. Same signatures — the checksums
    // prove it.
    val (tMhGrouped, nMhGrouped) = time {
      graft.operators.Dedup.minhashSignaturesGrouped(docsAll, "doc_id", "text")
        .agg(sum(col("s0") % 997)).collect()(0).getLong(0)
    }
    val (tMhPerRow, nMhPerRow) = time {
      graft.operators.Dedup.minhashSignaturesPerRow(docsAll, "doc_id", "text")
        .agg(sum(col("s0") % 997)).collect()(0).getLong(0)
    }
    val (tMhNative, nMhNative) = time {
      graft.operators.Dedup.minhashSignatures(docsAll, "doc_id", "text")
        .agg(sum(col("s0") % 997)).collect()(0).getLong(0)
    }
    require(nMhGrouped == nMhPerRow, s"minhash checksum mismatch: $nMhGrouped vs $nMhPerRow")
    require(nMhNative == nMhGrouped, s"native minhash checksum mismatch: $nMhNative vs $nMhGrouped")
    val (tTa7Grouped, nTa7Grouped) = time {
      graft.queries.CurationQueries.ta7Repetition(spark, sfDir)
        .agg(sum(when(col("keep") === 1, 1L).otherwise(0L))).collect()(0).getLong(0)
    }
    val (tTa7PerRow, nTa7PerRow) = time {
      docsAll.withColumn("__toks", split(col("text"), " "))
        .filter(size(col("__toks")) >= 2)
        .select(graft.queries.CurationQueries.ta7KeepCol("__toks").as("keep"))
        .agg(sum(when(col("keep"), 1L).otherwise(0L))).collect()(0).getLong(0)
    }
    require(nTa7Grouped == nTa7PerRow, s"ta7 verdict mismatch: $nTa7Grouped vs $nTa7PerRow")
    println(s"""{"fm_expr_sec":$tExpr,"mh_grouped_sec":$tMhGrouped,"mh_perrow_sec":$tMhPerRow,"mh_native_sec":$tMhNative,"ta7_grouped_sec":$tTa7Grouped,"ta7_perrow_sec":$tTa7PerRow,"ngram_substr_sec":$tSubstr,"ngram_split_sec":$tSplit,"ngram_sums":[$nSubstr,$nSplit],"fm_udf_sec":$tUdf,"fm_regex_sec":$tRegex,"matches":[$nExpr,$nUdf,$nRegex],"dot_hof_sec":$tHof,"dot_native_sec":$tNative,"dot_sums":[$nHof,$nNative],"semi_sec":$tSemi,"bloom_sec":$tBloom,"flagged":[$nSemi,$nBloom],"hash_md5_sec":$tHashMd5,"hash_native_sec":$tHashNat,"hash_sums":[$nHashMd5,$nHashNat],"skew_smj_noaqe_sec":$tSkewOff,"skew_smj_aqe_sec":$tSkewAqe,"skew_salted_sec":$tSalted,"skew_sums":[$nSkewOff,$nSkewAqe,$nSalted],"sf":"$sfDir"}""")
    spark.stop()
  }
}
