package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout helpers for the 100 TB path: bucketing for co-located
  * joins and hive-style partitioning for partition pruning.
  *
  * Bucketing pre-shuffles a table ONCE at write time: two tables bucketed by
  * the same key into the same bucket count join with zero Exchange — the
  * shuffle cost is paid once, not per query. Partitioned writes turn
  * predicate columns into directory structure, so scans touch only matching
  * partitions (PartitionFilters in the plan, not data-file reads).
  */
object Layout {

  /** Write `df` as a bucketed, sorted managed table (parquet). Bucket count
    * is a data-size knob: target ~128 MB per bucket file at scale. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Write hive-style partitioned parquet (one directory per value of
    * `partitionCol`); predicates on that column prune directories at plan
    * time. Keep partition cardinality modest (≤ thousands). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** True iff the physical plan of `df` contains no shuffle Exchange —
    * the assertion that bucketing actually co-located a join. */
  def hasNoShuffle(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Range-clustered write: repartitionByRange + sortWithinPartitions give
    * every output file a TIGHT, pairwise-disjoint min/max envelope on the
    * cluster column, so range predicates skip whole files/row-groups via
    * parquet statistics — single-dimension clustering, the complement of
    * [[writePartitioned]] for high-cardinality numeric columns where
    * directory-per-value would explode. `files` is a data-size knob
    * (~128 MB each at scale). LayoutSpec asserts the disjoint-envelope
    * property that makes the skipping real. */
  def writeRangeClustered(df: DataFrame, path: String, clusterCol: String,
      files: Int): Unit =
    df.repartitionByRange(files, org.apache.spark.sql.functions.col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
