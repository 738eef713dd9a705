package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** Remaining SURVEY §2 operators not covered elsewhere: P2 (min-words
  * predicate), P4 (author-name projection), J2 (explicit-id positional
  * join), J6 (embedding lookup with fallback), A7 (classification metrics),
  * V6 (one-hot). */
object GapQueries {

  /** p2_min_words — accept names only with ≥2 words
    * (`paper_processing.py:79-94`: title min_words). */
  def p2MinWords(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(size(split(col("p_name"), " ")) >= 2)
      .groupBy("p_type")
      .agg(count(lit(1)).as("n_named"))
      .orderBy("p_type")

  val p2MinWordsSql: String =
    """SELECT p_type, COUNT(*) AS n_named FROM part
      |WHERE len(string_split(p_name, ' ')) >= 2
      |GROUP BY p_type ORDER BY p_type""".stripMargin

  /** p4_author_project — ≤5 "authors", each reduced to its longest token
    * (`papers_download.py:56-59`); authors here are 2-token phrases from the
    * text. Longest-token reduce is a pure HOF fold (ties → first). */
  def p4AuthorProject(s: SparkSession, dir: String): DataFrame = {
    val authors = expr(
      """transform(sequence(0, least(int(size(tok) / 2), 5) - 1),
        |  i -> concat_ws(' ', element_at(tok, 2*i + 1), element_at(tok, 2*i + 2)))""".stripMargin)
    val longestTok = expr(
      """transform(authors, a -> aggregate(split(a, ' '), '',
        |  (acc, w) -> CASE WHEN length(w) > length(acc) THEN w ELSE acc END))""".stripMargin)
    t(s, dir, "documents")
      .withColumn("tok", split(col("text"), " "))
      .filter(size(col("tok")) >= 2)
      .withColumn("authors", authors)
      .select(col("doc_id"), concat_ws(";", longestTok).as("author_keys"))
      .orderBy("doc_id")
  }

  val p4AuthorProjectSql: String =
    """SELECT doc_id, array_to_string(
      |  list_transform(
      |    list_transform(range(0, LEAST(len(string_split(text,' ')) // 2, 5)),
      |      i -> string_split(text,' ')[2*i + 1] || ' ' || string_split(text,' ')[2*i + 2]),
      |    a -> list_reduce(list_prepend('', string_split(a, ' ')),
      |      (acc, w) -> CASE WHEN len(w) > len(acc) THEN w ELSE acc END)),
      |  ';') AS author_keys
      |FROM documents WHERE len(string_split(text,' ')) >= 2
      |ORDER BY doc_id""".stripMargin

  /** j2_positional_join — the reference aligns frames positionally
    * (`TM_2:cells 30-33`); the scalable fix is carrying explicit ids and
    * equi-joining (SURVEY §7.3(2)). */
  def j2PositionalJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .join(t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("label"))
      .orderBy("doc_id")

  val j2PositionalJoinSql: String =
    """SELECT doc_id, lang, label FROM documents JOIN embeddings ON doc_id = vec_id
      |ORDER BY doc_id""".stripMargin

  /** j6_embedding_lookup — vocab→embedding left join with deterministic
    * fallback (`ner_pipeline.py:106-111,160-165`: GloVe lookup, random init
    * for misses → here a hash-derived constant, same coalesce shape). */
  def j6EmbeddingLookup(s: SparkSession, dir: String): DataFrame = {
    val vocab = graft.operators.Vocab.topWords(
      t(s, dir, "documents").select(explode(split(col("text"), " ")).as("word")), "word")
    val glove = t(s, dir, "embeddings")
      .select(col("vec_id"), element_at(col("embedding"), 1).cast(DoubleType).as("dim0"))
    vocab.join(glove, col("vocab_id") === col("vec_id"), "left_outer")
      .select(col("word"), col("vocab_id"),
        round(coalesce(col("dim0"),
          (detHash(col("word"), 31) % 1000).cast(DoubleType) / 1000.0) * 1e6).cast(LongType).as("dim0_e6"))
      .orderBy("vocab_id")
  }

  val j6EmbeddingLookupSql: String =
    s"""WITH words AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
       |vocab AS (
       |  SELECT word, ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS vocab_id
       |  FROM (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word
       |        ORDER BY cnt DESC, word LIMIT 8192) f),
       |glove AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS dim0 FROM embeddings)
       |SELECT word, vocab_id,
       |  CAST(ROUND(COALESCE(dim0, CAST(${detHashSql("word", 31)} % 1000 AS DOUBLE) / 1000.0) * 1e6) AS BIGINT) AS dim0_e6
       |FROM vocab LEFT JOIN glove ON vocab_id = vec_id
       |ORDER BY vocab_id""".stripMargin

  /** a7_eval_metrics — entity-level precision/recall/F1 from (gold, pred)
    * token labels (`ner_pipeline.py:294-334`): gold = token starts with 'd',
    * pred = token length ≥ 5; TP/FP/FN counts → e6-scaled ratios. */
  def a7EvalMetrics(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .withColumn("gold", col("w").startsWith("d").cast(IntegerType))
      .withColumn("pred", (length(col("w")) >= 5).cast(IntegerType))
    tok.groupBy("lang")
      .agg(sum(col("gold") * col("pred")).as("tp"),
        sum((lit(1) - col("gold")) * col("pred")).as("fp"),
        sum(col("gold") * (lit(1) - col("pred"))).as("fn"))
      .select(col("lang"), col("tp"), col("fp"), col("fn"),
        round(lit(1e6) * col("tp") / (col("tp") + col("fp"))).cast(LongType).as("precision_e6"),
        round(lit(1e6) * col("tp") / (col("tp") + col("fn"))).cast(LongType).as("recall_e6"),
        round(lit(2e6) * col("tp") / (lit(2) * col("tp") + col("fp") + col("fn"))).cast(LongType).as("f1_e6"))
      .orderBy("lang")
  }

  val a7EvalMetricsSql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text,' ')) AS w FROM documents),
      |flags AS (
      |  SELECT lang, CASE WHEN w LIKE 'd%' THEN 1 ELSE 0 END AS gold,
      |    CASE WHEN len(w) >= 5 THEN 1 ELSE 0 END AS pred FROM tok),
      |cm AS (
      |  SELECT lang, CAST(SUM(gold * pred) AS BIGINT) AS tp,
      |    CAST(SUM((1 - gold) * pred) AS BIGINT) AS fp,
      |    CAST(SUM(gold * (1 - pred)) AS BIGINT) AS fn
      |  FROM flags GROUP BY lang)
      |SELECT lang, tp, fp, fn,
      |  CAST(ROUND(1e6 * tp / (tp + fp)) AS BIGINT) AS precision_e6,
      |  CAST(ROUND(1e6 * tp / (tp + fn)) AS BIGINT) AS recall_e6,
      |  CAST(ROUND(1e6 * 2 * tp / (2 * tp + fp + fn)) AS BIGINT) AS f1_e6
      |FROM cm ORDER BY lang""".stripMargin

  /** v6_onehot — one-hot label encoding (`few_shot_learning.ipynb:cells
    * 16-17`) as a pure array expression. */
  def v6Onehot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        concat_ws(",", expr("transform(sequence(0, 9), i -> CASE WHEN i = label THEN 1 ELSE 0 END)")).as("onehot"))
      .orderBy("vec_id")

  val v6OnehotSql: String =
    """SELECT vec_id, label,
      |  array_to_string(list_transform(range(0, 10), i -> CASE WHEN i = label THEN 1 ELSE 0 END), ',') AS onehot
      |FROM embeddings ORDER BY vec_id""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "p2_min_words" -> (p2MinWords _),
    "p4_author_project" -> (p4AuthorProject _),
    "j2_positional_join" -> (j2PositionalJoin _),
    "j6_embedding_lookup" -> (j6EmbeddingLookup _),
    "a7_eval_metrics" -> (a7EvalMetrics _),
    "v6_onehot" -> (v6Onehot _))

  val oracles: Map[String, String] = Map(
    "p2_min_words" -> p2MinWordsSql,
    "p4_author_project" -> p4AuthorProjectSql,
    "j2_positional_join" -> j2PositionalJoinSql,
    "j6_embedding_lookup" -> j6EmbeddingLookupSql,
    "a7_eval_metrics" -> a7EvalMetricsSql,
    "v6_onehot" -> v6OnehotSql)
}
