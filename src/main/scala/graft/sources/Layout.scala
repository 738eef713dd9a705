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
    * time. Keep partition cardinality modest (≤ thousands).
    *
    * The write CLUSTERS on the partition column first (one shuffle at
    * build time), so each partition directory holds ONE file instead of
    * one per upstream task — at 1024 buckets × 32 tasks the naive write
    * costs ~32k files, and file listing was measurable at probe time even
    * with the per-session cache. Optional `sortCols` order rows inside
    * that file, giving parquet page/row-group statistics a tight envelope
    * on the probe column (e.g. postings sorted by `word` let an
    * `IN (terms…)` filter skip pages within a bucket). Row order is
    * answer-invariant everywhere (the serve kernels aggregate or top-k). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
      sortCols: String*): Unit =
    writePartitionedCapped(df, path, partitionCol, RowsPerFile, sortCols: _*)

  /** Rows above which a partition directory splits into multiple salted
    * files (and the per-file cap). 1M rows ≈ the ~128 MB file target for
    * postings-shaped rows; no bench-scale partition reaches it, so uniform
    * corpora keep the one-file-per-bucket layout byte-for-byte. */
  private[graft] val RowsPerFile = 1L << 20
  private[graft] val MaxFilesPerPartition = 32L

  /** [[writePartitioned]] with the skew cap explicit (ADVICE r18): a
    * Zipf-hot partition value — a stopword's postings bucket holds a
    * corpus-sized posting list — would otherwise funnel through ONE write
    * task (a build-time straggler at scale) and land as ONE file. Salting
    * is COUNT-GATED: one cheap per-partition aggregate over the build
    * frame (callers pin expensive frames already — tfTable et al. are
    * session-materialized), broadcast back, and only partitions above
    * `rowsPerFile` split, into ceil(n / rowsPerFile) ≤
    * [[MaxFilesPerPartition]] files via a deterministic row-hash salt.
    * Cold partitions keep exactly the old single-file layout; hot files
    * each remain internally sorted on (partitionCol, sortCols), so
    * page-level stats pruning is unchanged and row order stays
    * answer-invariant (the serve kernels aggregate or top-k). */
  def writePartitionedCapped(df: DataFrame, path: String, partitionCol: String,
      rowsPerFile: Long, sortCols: String*): Unit = {
    import org.apache.spark.sql.functions._
    // Hot-partition census runs as its own driver-side action, NOT a join:
    // fold writes derive `df` from a partitioned store read keyed by the
    // same column, and a (df ⋈ counts-over-df) join on the partition
    // column makes Spark inject a dynamic-partition-pruning subquery into
    // the store scan that fails with "has not finished" under plan reuse
    // (hit by ss12/e2e10's ivf folds). The census is bounded by the
    // documented partition cardinality (≤ thousands); the hot subset is
    // normally empty, in which case the write keeps the original
    // one-file-per-partition plan byte-for-byte.
    val hot = df.groupBy(partitionCol).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > rowsPerFile).collect()
    val clustered =
      if (hot.isEmpty) df.repartition(col(partitionCol))
      else {
        val nfExpr = hot.foldLeft(lit(1L)) { (acc, r) =>
          val nf = math.min(MaxFilesPerPartition,
            (r.getLong(1) + rowsPerFile - 1) / rowsPerFile)
          when(col(partitionCol) === lit(r.get(0)), lit(nf)).otherwise(acc)
        }
        val saltSrc = hash(df.columns.filterNot(_ == partitionCol).map(col): _*)
        df.withColumn("__salt", pmod(saltSrc, nfExpr.cast("int")))
          // explicit numPartitions: AQE would otherwise coalesce a small
          // build into one task and silently undo the salt split
          .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
            col(partitionCol), col("__salt"))
          .drop("__salt")
      }
    clustered
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)
  }

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

  /** 16-bit Morton (Z-order) interleave of two non-negative integer columns
    * already scaled into [0, 2¹⁶): bit i of `x` lands at position 2i, bit i
    * of `y` at 2i+1. Pure shift/and/or tree — whole-stage codegen, no UDF.
    * Callers with unbounded domains rank first (e.g. [[graft.operators
    * .Rank.globalRowNumber]] or a fixed quantile grid) so both inputs fit
    * 16 bits; the require-style masking here just truncates higher bits. */
  def zOrderKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    (0 until 16).map { i =>
      val xb = shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order-clustered write: range-partition + sort on the Morton key of
    * TWO columns, so every output file covers a small rectangle of the
    * (x, y) plane and parquet min/max statistics skip files for predicates
    * on EITHER column — the multi-dimension generalization of
    * [[writeRangeClustered]] (which clusters one dimension perfectly and
    * the others not at all). The written files carry the original columns
    * plus `zkey`; LayoutSpec asserts the per-file bounding boxes shrink on
    * both dimensions. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("zkey", zOrderKey(col(xCol), col(yCol)))
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
