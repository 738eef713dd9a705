package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** M1/M4 — the model-scoring boundary (SURVEY §2.10): batch inference over a
  * paragraph table, `mapPartitions` with per-partition model init and
  * fixed-size micro-batches — the JVM shape of the reference's
  * `eval()`/`model.predict` loops (`ner_pipeline.py:338-375`, batch 256) and
  * of mapInPandas in PySpark.
  *
  * The "model" here is a pinned deterministic stand-in (torch is out of
  * scope, SURVEY §7.3(5)): emissions are a fixed linear function of token
  * hashes, decoded with [[Viterbi]]. Contract shape is the real thing:
  *   (id, tokens)  →  (id, score double, path array<int>, probs [L][C])
  * Swap `LinearStandInModel` for a real runtime without touching the plan.
  */
object BatchScorer {

  val NumClasses = 4

  /** Pinned stand-in model: deterministic per-token class scores. */
  final class LinearStandInModel(transition: Array[Array[Double]]) extends Serializable {
    /** emissions [L][C] from token identities — stands in for a forward
      * pass; values in [-1, 1], fully deterministic. */
    def emissions(tokens: Seq[String]): Array[Array[Double]] =
      tokens.map { tok =>
        val h = tok.hashCode
        Array.tabulate(NumClasses)(c => ((h >>> (c * 8)) & 0xff) / 127.5 - 1.0)
      }.toArray

    def score(tokens: Seq[String]): (Double, Array[Int], Array[Array[Double]]) = {
      val emit = emissions(tokens)
      val path = Viterbi.decode(emit, transition)
      val s = Viterbi.pathScore(emit, transition, path)
      (s, path, emit)
    }
  }

  case class Scored(id: Long, score: Double, path: Seq[Int], probs: Seq[Seq[Double]])

  /** Batched inference: rows stream through in `batchSize` groups (a real
    * model would run one forward pass per group); model is constructed once
    * per partition. Input needs columns (id: long, tokens: array<string>). */
  def scoreParagraphs(input: DataFrame, transition: Array[Array[Double]],
      batchSize: Int = 256): Dataset[Scored] = {
    import input.sparkSession.implicits._
    val idIdx = input.schema.fieldIndex("id")
    val tokIdx = input.schema.fieldIndex("tokens")
    input.mapPartitions { rows =>
      val model = new LinearStandInModel(transition) // once per partition
      rows.grouped(batchSize).flatMap { batch =>      // micro-batch boundary
        batch.map { r =>
          val (s, path, emit) = model.score(r.getSeq[String](tokIdx))
          Scored(r.getLong(idIdx), s, path.toSeq, emit.map(_.toSeq).toSeq)
        }
      }
    }
  }
}
