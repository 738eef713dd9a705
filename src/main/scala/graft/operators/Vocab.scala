package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capped corpus vocabulary (SURVEY §2.9 V4 / §2.4 J5) — the scale-safe
  * replacement for ranking the *whole* distinct vocabulary through one
  * un-partitioned window.
  *
  * Every production vocab has an explicit budget (CountVectorizer
  * `vocabSize`, GloVe's 400k, classic top-10k setups); tokens outside it are
  * OOV → id 0 by the repo-wide contract (`coalesce(vocab_id, 0)` at the join
  * sites). With the cap, rank assignment is a constant-size problem:
  *
  *  - `orderBy(cnt desc, word).limit(V)` with V below
  *    `spark.sql.execution.topKSortFallbackThreshold` (default 10000) plans
  *    as `TakeOrderedAndProject` — each task keeps a local top-V heap and one
  *    merge of 32 candidate heaps follows; the full 10⁷–10⁸-row distinct
  *    vocabulary of a 100 TB corpus never flows through a single partition.
  *  - the `row_number` window then runs over ≤V rows — bounded by the vocab
  *    budget constant, not by data size.
  *
  * VocabSpec asserts both the plan shape (TakeOrderedAndProject feeding the
  * window) and rank equality with the naive global window.
  */
object Vocab {

  /** Default vocab budget — under the 10000 top-K-sort fallback threshold so
    * the cap stays a distributed heap-merge, never a global sort. */
  val DefaultSize = 8192

  /** Top-`size` words of `wordCol` in `words` ranked 1..size by
    * (frequency desc, word asc) — returns (wordCol, vocab_id). */
  def topWords(words: DataFrame, wordCol: String, size: Int = DefaultSize): DataFrame = {
    val ord: Seq[Column] = Seq(desc("cnt"), col(wordCol))
    words.groupBy(wordCol).agg(count(lit(1)).as("cnt"))
      .orderBy(ord: _*)
      .limit(size)
      .withColumn("vocab_id", row_number().over(Window.orderBy(ord: _*)))
      .select(col(wordCol), col("vocab_id"))
  }
}
