package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class EvalSpec extends SparkSpec {

  test("rocAuc equals the brute-force pairwise definition, ties included") {
    import spark.implicits._
    val rnd = new Random(11)
    for (trial <- 1 to 3) {
      // scores drawn from a SMALL integer range so ties are dense — the
      // nn/2 term is the part a rank-based shortcut usually gets wrong
      val data = (1 to 200 + trial).map { _ =>
        val y = if (rnd.nextBoolean()) 1L else 0L
        // positives get a slight shift so the AUC is away from 0.5
        (rnd.nextInt(15).toLong + y, y)
      }
      val pos = data.filter(_._2 == 1L).map(_._1)
      val neg = data.filter(_._2 == 0L).map(_._1)
      val u2Expected = pos.map(p =>
        2L * neg.count(_ < p) + neg.count(_ == p)).sum
      val aucExpected = math.round(1e6 * u2Expected / (2.0 * pos.size * neg.size))
      for (parts <- Seq(1, 4)) {
        val row = Eval.rocAuc(
          data.toDF("score", "y").repartition(parts), col("score"), col("y"))
          .collect().head
        assert(row.getAs[Long]("n_pos") === pos.size.toLong)
        assert(row.getAs[Long]("n_neg") === neg.size.toLong)
        assert(row.getAs[Long]("u2") === u2Expected, s"trial=$trial parts=$parts")
        assert(row.getAs[Long]("auc_e6") === aucExpected, s"trial=$trial parts=$parts")
      }
    }
  }

  test("perfect separation gives 1.0, reversed gives 0.0, all-ties 0.5") {
    import spark.implicits._
    val sep = Seq((10L, 1L), (11L, 1L), (1L, 0L), (2L, 0L)).toDF("score", "y")
    assert(Eval.rocAuc(sep, col("score"), col("y"))
      .collect().head.getAs[Long]("auc_e6") === 1000000L)
    val rev = Seq((1L, 1L), (2L, 1L), (10L, 0L), (11L, 0L)).toDF("score", "y")
    assert(Eval.rocAuc(rev, col("score"), col("y"))
      .collect().head.getAs[Long]("auc_e6") === 0L)
    val tie = Seq((5L, 1L), (5L, 1L), (5L, 0L)).toDF("score", "y")
    assert(Eval.rocAuc(tie, col("score"), col("y"))
      .collect().head.getAs[Long]("auc_e6") === 500000L)
  }

  test("prAuc equals the brute-force threshold-grouped average precision") {
    import spark.implicits._
    val rnd = new Random(13)
    for (trial <- 1 to 3) {
      val data = (1 to 150 + trial).map { _ =>
        val y = if (rnd.nextInt(4) == 0) 1L else 0L // imbalanced, AP ≠ AUC
        (rnd.nextInt(12).toLong + 2 * y, y)
      }
      // brute force: distinct thresholds descending; AP = Σ (tp_k/P)·prec_k
      // with each 1e6·tp_k·prec_k term rounded first (the operator's
      // documented e6 convention), then one final /P rounding
      val byScore = data.groupBy(_._1).map { case (s, xs) =>
        (s, xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong)
      }.toSeq.sortBy(-_._1)
      val p = byScore.map(_._2).sum
      var (cumTp, cumFp, numE6) = (0L, 0L, 0L)
      for ((_, np, nn) <- byScore) {
        cumTp += np; cumFp += nn
        if (np > 0)
          numE6 += math.round(1e6 * np.toDouble * cumTp.toDouble / (cumTp + cumFp).toDouble)
      }
      val apExpected = math.round(numE6.toDouble / p.toDouble)
      for (parts <- Seq(1, 4)) {
        val row = Eval.prAuc(
          data.toDF("score", "y").repartition(parts), col("score"), col("y"))
          .collect().head
        assert(row.getAs[Long]("n_pos") === p)
        assert(row.getAs[Long]("ap_e6") === apExpected, s"trial=$trial parts=$parts")
      }
    }
  }

  test("prAuc: perfect ranking gives 1.0; no positives gives null") {
    import spark.implicits._
    val sep = Seq((10L, 1L), (9L, 1L), (1L, 0L), (2L, 0L)).toDF("score", "y")
    assert(Eval.prAuc(sep, col("score"), col("y"))
      .collect().head.getAs[Long]("ap_e6") === 1000000L)
    val neg = Seq((1L, 0L), (2L, 0L)).toDF("score", "y")
    val row = Eval.prAuc(neg, col("score"), col("y")).collect().head
    assert(row.isNullAt(row.fieldIndex("ap_e6")))
  }

  test("single-class input yields null auc_e6, not NaN-rounded-to-zero") {
    import spark.implicits._
    val onlyPos = Seq((1L, 1L), (2L, 1L)).toDF("score", "y")
    val row = Eval.rocAuc(onlyPos, col("score"), col("y")).collect().head
    assert(row.isNullAt(row.fieldIndex("auc_e6")))
    assert(row.getAs[Long]("n_neg") === 0L)
  }
}
