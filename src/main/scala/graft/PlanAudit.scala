package graft
import org.apache.spark.sql.SparkSession
/** Dumps formatted physical plans for headline queries — the scale audit
  * artifact (PushedFilters, join strategies, codegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q3_join_topk", "q5_multi_join", "dd3_lsh_pairs",
        "ss1_bruteforce_topk", "ta1_langid", "p1_candidate_filter", "ev1_sessionize",
        // round-2 scale fixes: projection-based IVF assign, cell-blocked
        // near-dup, capped vocab rank, two-phase global rank
        "ss2_ivf_topk", "dd6_embed_neardup", "j5_vocab_lookup", "sm4_batch_shuffle",
        // round-3 curation surface: zero-shuffle Bloom probe, two-phase
        // prefix-sum packing, one-Exchange redaction/as-of plans
        "dd10_bloom_contamination", "pk1_sequence_pack", "ta8_pii_redact",
        "ev8_asof_join", "set2_upsert", "ss4_pq_topk", "e2e1_curation_pipeline",
        // round-4 additions: zero-shuffle chunking, two-phase per-group
        // sampling rank, cell-blocked semantic prune, span islands
        "pk2_chunk_overlap", "sm7_temperature_sample", "dd12_semantic_dedup",
        "a13_span_f1", "dq2_outlier_mad")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
