package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the LLM-pipeline
    * generalizations: dedup, similarity search, text analysis). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextQueries.queries ++ CorpusQueries.queries ++
      MatchQueries.queries ++ ALQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ EventQueries.queries ++
      PipelineQueries.queries ++ MLQueries.queries ++
      MultimodalQueries.queries ++ GapQueries.queries ++ CurationQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextQueries.oracles ++ CorpusQueries.oracles ++
      MatchQueries.oracles ++ ALQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ EventQueries.oracles ++
      PipelineQueries.oracles ++ MLQueries.oracles ++
      MultimodalQueries.oracles ++ GapQueries.oracles ++ CurationQueries.oracles
}
