package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-evaluation aggregates that need a GLOBAL order statistic, built
  * without a global per-row sort (the repo's two-phase Rank recipe).
  *
  * [[rocAuc]] — exact tie-aware ROC-AUC via the Mann–Whitney identity
  * AUC = U/(n⁺·n⁻) with U = Σ_pos rank-above-negatives, computed as:
  *   1. aggregate (n_pos, n_neg) per DISTINCT score — map-side combined,
  *      output bounded by score cardinality, not row count;
  *   2. exclusive prefix sum of negatives in ascending-score order via
  *      [[Rank.globalCumSum]] (range partitions + broadcast offsets — no
  *      single-partition window even at 10⁸ distinct scores);
  *   3. U2 = Σ np·(2·cum_neg + nn) keeps the ties/2 term integer-exact;
  *      AUC = U2 / (2·n⁺·n⁻), e6-rounded once at the end.
  *
  * The pairwise definition (for the spec's brute-force oracle):
  * AUC = [#(neg_score < pos_score) + ½·#(neg_score = pos_score)] / (n⁺·n⁻).
  */
object Eval {

  /** Per-distinct-score (np, nn) counts — the shared first stage of both
    * curves. Output bounded by score cardinality, not row count. */
  private def perScore(df: DataFrame, score: Column, label: Column): DataFrame =
    df.select(score.as("__s"), label.cast(LongType).as("__y"))
      .groupBy("__s")
      .agg(sum("__y").as("np"), sum(lit(1L) - col("__y")).as("nn"))

  /** One row: (n_pos, n_neg, u2, auc_e6). `label` must evaluate to 1/0
    * (long); rows with a null score or label are the caller's job to drop.
    * Degenerate inputs (no positives or no negatives) yield null auc_e6 —
    * AUC is undefined, and the zero-denominator rule (Q scaladoc) says
    * null, not NaN-rounded-to-0. */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame =
    Rank.globalCumSum(perScore(df, score, label), col("nn"), "cum_neg", col("__s"))
      .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
        sum(col("np") * (lit(2L) * col("cum_neg") + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(round(lit(1e6) * col("u2").cast(DoubleType) /
            (lit(2d) * col("n_pos").cast(DoubleType) * col("n_neg").cast(DoubleType))))
          .cast(LongType).as("auc_e6"))

  /** Average precision (area under the precision-recall curve, the
    * step-wise AP = Σ_k ΔR_k·P_k at each distinct threshold, descending —
    * the standard threshold-grouped definition, tie-exact). One row:
    * (n_pos, n_neg, ap_e6); null ap_e6 when there are no positives.
    *
    * Same scale shape as [[rocAuc]]: per-distinct-score counts, then TWO
    * two-phase prefix sums (cumulative TP and FP in descending-score
    * order — globalCumSum sorts ascending, so the key is the negated
    * score). Each threshold's ΔR·P term is e6-rounded BEFORE the integer
    * sum (Q's convention): float addition order never matters, so the
    * result is engine-exact under any partitioning. */
  def prAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val ps = perScore(df, score, label).withColumn("__negs", -col("__s"))
    val withTp = Rank.globalCumSum(ps, col("np"), "tp_before", col("__negs"))
    val withBoth = Rank.globalCumSum(withTp, col("nn"), "fp_before", col("__negs"))
    // term_k = (tp_k/P) · (cumTP_k/(cumTP_k+cumFP_k)); rounded to e6 per
    // threshold. cumTP_k ≥ np_k > 0 whenever the term contributes, so the
    // precision denominator is never zero for contributing rows.
    withBoth
      .withColumn("cum_tp", col("tp_before") + col("np"))
      .withColumn("cum_fp", col("fp_before") + col("nn"))
      .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
        sum(when(col("np") > 0L, round(lit(1e6) *
          col("np").cast(DoubleType) * col("cum_tp").cast(DoubleType) /
          (col("cum_tp") + col("cum_fp")).cast(DoubleType)).cast(LongType))
          .otherwise(0L)).as("num_e6"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L, lit(null))
          .otherwise(round(col("num_e6").cast(DoubleType) /
            col("n_pos").cast(DoubleType)))
          .cast(LongType).as("ap_e6"))
  }
}
