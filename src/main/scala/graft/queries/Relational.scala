package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import Q._

/** Relational operator suite over the star-schema testdata — filters (§2.2),
  * joins J1/J3/J4 (§2.4), aggregations A1-shape (§2.5), top-k T2/T5 (§2.7),
  * window grouped top-k (§2.13), AL pool set algebra (§2.12).
  *
  * Every query is declarative DataFrame API so Catalyst plans it: filters and
  * projections push into the parquet scan, the dimension sides of J1/q3/q5 are
  * broadcast-hash joined (customer/orders dims ≪ lineitem at any SF), and all
  * aggregates run partial→final. Results carry an explicit ORDER BY with a
  * unique tiebreak so the DuckDB-oracle hash compare is order-stable.
  */
object Relational {

  /** q1_agg — TPC-H Q1 shape: scan-filter-agg over lineitem (A1 analogue:
    * accumulate→finalize ≙ Spark partial/final agg; SURVEY §2.5 A1). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        decAvg(col("l_quantity")).as("avg_qty"),
        decAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${decSumSql("l_quantity")} AS sum_qty,
       |  ${decSumSql("l_extendedprice")} AS sum_base_price,
       |  ${revenueSql("l_extendedprice", "l_discount")} AS sum_disc_price,
       |  ${decAvgSql("l_quantity")} AS avg_qty,
       |  ${decAvgSql("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
       |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q3_join_topk — TPC-H Q3 shape: selective dim filters, fact join, agg,
    * top-10 (T2: TakeOrderedAndProject). customer side is broadcast. */
  def q3JoinTopk(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"), col("o_orderpriority"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("rev"))
      .orderBy(desc("rev"), col("l_orderkey"))
      .limit(10)
  }

  val q3JoinTopkSql: String =
    s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
       |  ${revenueSql("l_extendedprice", "l_discount")} AS rev
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1999-01-01' AND l_shipdate > TIMESTAMP '1999-01-01'
       |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
       |ORDER BY rev DESC, l_orderkey LIMIT 10""".stripMargin

  /** q5_multi_join — TPC-H Q5 shape: 5-way join through region→nation→
    * customer→orders→lineitem→supplier with co-located nation keys. All dims
    * broadcast; only the fact tables shuffle. */
  def q5MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") =!= "")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = t(s, dir, "lineitem")
    val sp = t(s, dir, "supplier")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sp), col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("rev"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("rev"), col("n_name"))
  }

  val q5MultiJoinSql: String =
    s"""SELECT n_name, ${revenueSql("l_extendedprice", "l_discount")} AS rev, COUNT(*) AS n_items
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name <> '' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name ORDER BY rev DESC, n_name""".stripMargin

  /** j1_fk_join — FK equi-join orders⋈customer (SURVEY §2.4 J1: paragraphs
    * carry paper_id; here orders carry o_custkey). Dim side broadcast. */
  def j1FkJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total"))
      .orderBy("c_mktsegment")

  val j1FkJoinSql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_orders, ${decSumSql("o_totalprice")} AS total
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** j3_semi_join — keep customers having ≥1 urgent open order (SURVEY §2.4
    * J3: `dat.loc[res]` semi-join by selected ids). left_semi: no row
    * duplication, customer columns only. */
  def j3SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
    t(s, dir, "customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val j3SemiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** j4_anti_join — customers with no pending ('P') order (SURVEY §2.4 J4:
    * download-dedup — skip ids already materialized in the sink manifest).
    * The anti side is filtered first so the join stays selective. */
  def j4AntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_without_pending"))
      .orderBy("c_mktsegment")

  val j4AntiJoinSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_without_pending FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** p7_null_guards — conditional null projection (SURVEY §2.2 P7:
    * `when(...).otherwise(null)`), then null-aware aggregation. */
  def p7NullGuards(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        when(col("value") >= 100, col("value")).as("big_value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("big_value")).as("n_big"),
        decSum(coalesce(col("big_value"), lit(0))).as("sum_big"))
      .orderBy("event_type")

  val p7NullGuardsSql: String =
    s"""SELECT event_type, COUNT(*) AS n, COUNT(big_value) AS n_big,
       |  ${decSumSql("COALESCE(big_value, 0)")} AS sum_big
       |FROM (SELECT event_type, CASE WHEN value >= 100 THEN value END AS big_value FROM events) t
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** t2_topk — global top-k (SURVEY §2.7 T2: argpartition analogue; Spark
    * plans TakeOrderedAndProject — per-partition partial top-k, no full sort). */
  def t2Topk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  val t2TopkSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin

  /** t5_offset_scan — resumable offset/limit windowing (SURVEY §2.7 T5:
    * `begin`/`maxlines`). */
  def t5OffsetScan(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
      .offset(100)
      .limit(50)

  val t5OffsetScanSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin

  /** t6_quantiles — exact interpolated quartiles of the price distribution
    * per return flag (generalized §2.11 analytics: Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition, so
    * the values agree; e6-rounded per the float rule). Exact percentile is
    * a sort-based aggregate — at 100 TB swap in `percentile_approx` (t-digest)
    * per the same shape; exactness here is what the oracle can check. */
  def t6Quantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(cast(l_extendedprice as double), array(0.25, 0.5, 0.75))").as("q"))
      .select(col("l_returnflag"),
        expr("cast(round(1e6 * q[0]) as bigint)").as("p25_e6"),
        expr("cast(round(1e6 * q[1]) as bigint)").as("p50_e6"),
        expr("cast(round(1e6 * q[2]) as bigint)").as("p75_e6"))
      .orderBy("l_returnflag")

  val t6QuantilesSql: String =
    """SELECT l_returnflag,
      |  CAST(ROUND(1e6 * quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25)) AS BIGINT) AS p25_e6,
      |  CAST(ROUND(1e6 * quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50)) AS BIGINT) AS p50_e6,
      |  CAST(ROUND(1e6 * quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75)) AS BIGINT) AS p75_e6
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** t7_approx_quantiles — the sketch twin of t6: `approx_percentile`
    * (Greenwald–Khanna/t-digest family) at accuracy 10000 — mergeable
    * per-partition sketches, the shape that replaces t6's exact sort-based
    * percentile at 100 TB. Sketch values aren't portable across engines, so
    * the ORACLE-FACING output is (exact quartiles, within_bound): the exact
    * columns replay in DuckDB (the t6-proven expressions) and within_bound
    * asserts ON THE SPARK SIDE that each sketch estimate lands inside the
    * exact value band at rank ±0.02 — 200× looser than the sketch's
    * guaranteed ≤1e-4 rank error, so a pass is stable while any gross
    * sketch breakage flips the boolean and hash-fails against the oracle's
    * constant TRUE. Upgrades the r5 rows-only check to a hash check.
    *
    * The exact side (nine sort-based ranks) lives in a session-shared
    * 3-row frame so the BENCHED warm path is the sketch aggregate plus a
    * broadcast join — t7's number keeps measuring the mergeable-sketch
    * shape its docstring sells, not exact-percentile work the oracle
    * check added (review r6); one-time exact cost shows in pass 1, the
    * bench's documented steady-state convention. */
  def t7ApproxQuantiles(s: SparkSession, dir: String): DataFrame = {
    val bands = graft.operators.SessionShare.materialized(s, dir, "t7_bands") {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("""percentile(cast(l_extendedprice as double),
                  array(0.23, 0.25, 0.27, 0.48, 0.5, 0.52, 0.73, 0.75, 0.77))""").as("eq"))
    }
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(cast(l_extendedprice as double), array(0.25, 0.5, 0.75), 10000)").as("aq"))
      .join(broadcast(bands), Seq("l_returnflag"))
      .select(col("l_returnflag"),
        expr("cast(round(1e6 * eq[1]) as bigint)").as("p25_e6"),
        expr("cast(round(1e6 * eq[4]) as bigint)").as("p50_e6"),
        expr("cast(round(1e6 * eq[7]) as bigint)").as("p75_e6"),
        expr("""aq[0] between eq[0] and eq[2] and
                aq[1] between eq[3] and eq[5] and
                aq[2] between eq[6] and eq[8]""").as("within_bound"))
      .orderBy("l_returnflag")
  }

  val t7ApproxQuantilesSql: String =
    """SELECT l_returnflag,
      |  CAST(ROUND(1e6 * quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25)) AS BIGINT) AS p25_e6,
      |  CAST(ROUND(1e6 * quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50)) AS BIGINT) AS p50_e6,
      |  CAST(ROUND(1e6 * quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75)) AS BIGINT) AS p75_e6,
      |  TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** dq1_profile — the data-quality profiling staple (generalized pipeline
    * hygiene: the screen a 100 TB ingest runs before anything else): row
    * count, per-column null counts, distinct cardinalities, value ranges —
    * one aggregate pass (countDistinct expands, still a single shuffle). */
  def dq1Profile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").agg(
      count(lit(1)).as("n_rows"),
      sum(col("text").isNull.cast("int")).cast("long").as("null_text"),
      sum(col("lang").isNull.cast("int")).cast("long").as("null_lang"),
      countDistinct(col("lang")).as("d_lang"),
      countDistinct(col("source")).as("d_source"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"))

  val dq1ProfileSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
      |  CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_lang,
      |  COUNT(DISTINCT lang) AS d_lang,
      |  COUNT(DISTINCT source) AS d_source,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents""".stripMargin

  /** dq2_outlier_mad — robust outlier screen per event type: median + MAD
    * (median absolute deviation), flag |v − median| > 3·1.4826·MAD (1.4826
    * scales MAD to σ under normality — the standard robust z-score; unlike
    * mean/stddev, one bad ingest batch can't drag the threshold). Three
    * aggregate passes over events, every shuffle on the low-cardinality
    * event_type key, group stats joined back as broadcasts. The scale
    * constant is the SAME literal 4.4478 in both engines — computing
    * 3×1.4826 at runtime could round differently than parsing the product.
    * Deviations and thresholds are e6-rounded BIGINTs before the strict
    * comparison, per the cross-engine float rule. */
  def dq2OutlierMad(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), col("value").cast("double").as("v"))
    val med = ev.groupBy("event_type").agg(expr("percentile(v, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("v") - col("med")))
    val stats = dev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), expr("percentile(dev, 0.5)").as("mad"),
        max("med").as("med"))
      .withColumn("thr_e6", round(lit(1e6) * lit(4.4478) * col("mad")).cast("long"))
    val outliers = dev.join(broadcast(stats.select("event_type", "thr_e6")), Seq("event_type"))
      .withColumn("dev_e6", round(lit(1e6) * col("dev")).cast("long"))
      .groupBy("event_type")
      .agg(sum((col("dev_e6") > col("thr_e6")).cast("long")).as("n_outliers"))
    stats.join(outliers, Seq("event_type"))
      .select(col("event_type"), col("n"),
        round(lit(1e6) * col("med")).cast("long").as("med_e6"),
        round(lit(1e6) * col("mad")).cast("long").as("mad_e6"),
        col("n_outliers"))
      .orderBy("event_type")
  }

  val dq2OutlierMadSql: String =
    """WITH ev AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
      |med AS (SELECT event_type, quantile_cont(v, 0.5) AS med FROM ev GROUP BY event_type),
      |dev AS (SELECT e.event_type, abs(e.v - m.med) AS dev, m.med
      |  FROM ev e JOIN med m USING (event_type)),
      |stats AS (SELECT event_type, COUNT(*) AS n, quantile_cont(dev, 0.5) AS mad,
      |    MAX(med) AS med
      |  FROM dev GROUP BY event_type),
      |thr AS (SELECT event_type, n, med, mad,
      |    CAST(ROUND(1e6 * 4.4478 * mad) AS BIGINT) AS thr_e6 FROM stats),
      |outl AS (SELECT d.event_type,
      |    CAST(SUM(CASE WHEN CAST(ROUND(1e6 * d.dev) AS BIGINT) > t.thr_e6
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |  FROM dev d JOIN thr t USING (event_type) GROUP BY d.event_type)
      |SELECT t.event_type, t.n,
      |  CAST(ROUND(1e6 * t.med) AS BIGINT) AS med_e6,
      |  CAST(ROUND(1e6 * t.mad) AS BIGINT) AS mad_e6,
      |  o.n_outliers
      |FROM thr t JOIN outl o USING (event_type) ORDER BY event_type""".stripMargin

  /** w1_grouped_topk — per-group top-3 via window row_number (SURVEY §2.13;
    * grouped variant of T2, same shape as SM3 episode sampling). */
  def w1GroupedTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rk")
  }

  val w1GroupedTopkSql: String =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** set1_pool_update — AL pool algebra L∪{x*}, U−{x*} (SURVEY §2.11/§2.12):
    * union + left_anti over id sets. Labeled seed = deterministic 20% hash
    * split; x* = top-50 of the unlabeled pool by acctbal. */
  def set1PoolUpdate(s: SparkSession, dir: String): DataFrame = {
    val all = t(s, dir, "customer").select("c_custkey", "c_acctbal")
    val seed = all.filter(detHash(col("c_custkey"), 7) % 10 < 2)
    val unlabeled = all.join(seed, Seq("c_custkey"), "left_anti")
    val picked = unlabeled.orderBy(desc("c_acctbal"), col("c_custkey")).limit(50)
    val newLabeled = seed.select("c_custkey").unionByName(picked.select("c_custkey"))
    val newUnlabeled = all.select("c_custkey").join(newLabeled, Seq("c_custkey"), "left_anti")
    newLabeled.select(lit("L").as("pool"), col("c_custkey"))
      .unionByName(newUnlabeled.select(lit("U").as("pool"), col("c_custkey")))
      .orderBy("pool", "c_custkey")
  }

  val set1PoolUpdateSql: String =
    s"""WITH all_c AS (SELECT c_custkey, c_acctbal FROM customer),
       |seed AS (SELECT c_custkey FROM all_c WHERE ${detHashSql("c_custkey", 7)} % 10 < 2),
       |unlab AS (SELECT * FROM all_c WHERE c_custkey NOT IN (SELECT c_custkey FROM seed)),
       |picked AS (SELECT c_custkey FROM unlab ORDER BY c_acctbal DESC, c_custkey LIMIT 50),
       |newl AS (SELECT c_custkey FROM seed UNION ALL SELECT c_custkey FROM picked)
       |SELECT 'L' AS pool, c_custkey FROM newl
       |UNION ALL
       |SELECT 'U' AS pool, c_custkey FROM all_c WHERE c_custkey NOT IN (SELECT c_custkey FROM newl)
       |ORDER BY pool, c_custkey""".stripMargin

  /** r1_rollup — hierarchical aggregation with subtotal rows (grouping-sets
    * family; SURVEY §2.5 notes Spark built-ins cover these for the
    * generalized surface). */
  def r1Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), decSum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  val r1RollupSql: String =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${decSumSql("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** r2_cube — full grouping-sets lattice with subtotal provenance (the
    * rollup's 2^k generalization). The grouping id is composed from
    * single-column `grouping()` bits — portable by construction, where the
    * engines' native multi-column grouping-id bitmask orderings would have
    * to be trusted to agree. Same partial+final hash-agg as r1: Spark
    * expands the cube on the map side, so the shuffle carries one partial
    * row per (set, key) — no extra pass per grouping set. */
  def r2Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg((grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
          .cast(org.apache.spark.sql.types.IntegerType).as("gid"),
        count(lit(1)).as("n"), decSum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  val r2CubeSql: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
       |  COUNT(*) AS n, ${decSumSql("o_totalprice")} AS sum_price
       |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** p9_pivot — long-to-wide reshape: per-status order counts by priority
    * as one row per status (report-shaped output; the reference's notebook
    * crosstabs). Values are pinned explicitly so the plan is one
    * partial+final agg — `pivot` without a value list runs a separate
    * distinct job first, a hidden extra pass at 100 TB. Absent combinations
    * coalesce to 0 to match the oracle's FILTER counts. */
  def p9Pivot(s: SparkSession, dir: String): DataFrame = {
    val prio = Seq("1-URGENT" -> "n_urgent", "2-HIGH" -> "n_high",
      "3-MEDIUM" -> "n_medium", "4-NOT SPECIFIED" -> "n_not_specified",
      "5-LOW" -> "n_low")
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", prio.map(_._1))
      .agg(count(lit(1)))
      .select(col("o_orderstatus") +:
        prio.map { case (v, n) => coalesce(col(s"`$v`"), lit(0L)).as(n) }: _*)
      .orderBy("o_orderstatus")
  }

  val p9PivotSql: String =
    """SELECT o_orderstatus,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_not_specified,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** dq3_snapshot_drift — column-profile drift between two temporal
    * snapshots of `orders` (pre/post a pivot date): row count, key
    * cardinalities, mean price (integer cents), null counts — the
    * snapshot-diff a data-catalog runs when a new partition lands, long
    * format so new metrics append as rows, not schema changes. Both
    * snapshots profile in ONE pass (groupBy snap), then the 10 metric rows
    * pivot a-vs-b; at 100 TB the only shuffle is the 2-group agg (distinct
    * counts expand to (snap, value) partials — still key-bounded). */
  /** dq6_psi_drift — Population Stability Index between two crawl
    * snapshots (the model-monitoring standard for distribution shift;
    * Siddiqi 2006 credit-scoring convention: <0.1 stable, 0.1–0.25
    * moderate, >0.25 shifted): dq3 watches SCALAR drift (means, counts);
    * this watches the token DISTRIBUTION — the signal that catches a
    * crawler suddenly pulling a different language mix or boilerplate
    * flood even when row counts look healthy. PSI = Σ_bins
    * (p_new − p_old)·ln(p_new/p_old), symmetric KL-ish and additive per
    * bin, so the worst bin names the culprit.
    *
    * Scale honesty: tokens hash into a FIXED 64-bin feature space
    * (detHash mod 64 — the v7 hashing-trick geometry), so the rollup is
    * geometry-bounded at any vocabulary; all 64 bins materialize via a
    * range frame (absent bins carry the add-one smoothing floor on both
    * engines). Each bin's term e9-rounds BEFORE the sum (the ta14
    * per-term convention — no cross-engine float-sum ordering), totals
    * ride a 1-row broadcast, and the output is ONE row: psi_e9, the
    * worst bin, and the triage band. */
  def dq6PsiDrift(s: SparkSession, dir: String): DataFrame = {
    val d = DoubleType
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("snap", when(col("doc_id") % 3 === 0, "new").otherwise("old"))
      .withColumn("bin", detHash(col("w"), 29) % 64)
    val hit = tok.groupBy("bin").agg(
      sum(when(col("snap") === "old", 1L).otherwise(0L)).as("c_old"),
      sum(when(col("snap") === "new", 1L).otherwise(0L)).as("c_new"))
    val bins = s.range(64).select(col("id").as("bin"))
      .join(hit, Seq("bin"), "left")
      .withColumn("c_old", coalesce(col("c_old"), lit(0L)))
      .withColumn("c_new", coalesce(col("c_new"), lit(0L)))
    val tot = bins.agg(sum("c_old").as("t_old"), sum("c_new").as("t_new"))
    val po = (col("c_old") + 1).cast(d) / (col("t_old") + 64).cast(d)
    val pn = (col("c_new") + 1).cast(d) / (col("t_new") + 64).cast(d)
    // 64 rows, two consumers (total + worst-bin argmin) — pinned
    val terms = bins.crossJoin(broadcast(tot))
      .withColumn("term_e9", round((pn - po) * log(pn / po) * lit(1e9)).cast(LongType))
      .localCheckpoint()
    val a = terms.agg(count(lit(1)).as("n_bins"),
      max("t_old").as("n_old"), max("t_new").as("n_new"),
      sum("term_e9").as("psi_e9"), max("term_e9").as("worst_term_e9"))
    val wb = terms.crossJoin(broadcast(a.select("worst_term_e9")))
      .filter(col("term_e9") === col("worst_term_e9"))
      .agg(min("bin").as("worst_bin"))
    a.crossJoin(broadcast(wb))
      .withColumn("band",
        when(col("psi_e9") < 100000000L, "stable")
          .when(col("psi_e9") < 250000000L, "moderate").otherwise("shifted"))
      .select("n_bins", "n_old", "n_new", "psi_e9", "worst_bin", "worst_term_e9", "band")
  }

  val dq6PsiDriftSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |tagged AS (SELECT CASE WHEN doc_id % 3 = 0 THEN 'new' ELSE 'old' END AS snap,
       |  ${detHashSql("w", 29)} % 64 AS bin FROM tok),
       |hit AS (SELECT bin, SUM(CASE WHEN snap = 'old' THEN 1 ELSE 0 END) AS c_old,
       |  SUM(CASE WHEN snap = 'new' THEN 1 ELSE 0 END) AS c_new FROM tagged GROUP BY bin),
       |bins AS (SELECT b.bin, COALESCE(h.c_old, 0) AS c_old, COALESCE(h.c_new, 0) AS c_new
       |  FROM (SELECT unnest(range(64)) AS bin) b LEFT JOIN hit h USING (bin)),
       |tot AS (SELECT CAST(SUM(c_old) AS BIGINT) AS t_old, CAST(SUM(c_new) AS BIGINT) AS t_new FROM bins),
       |terms AS (SELECT bin, CAST(ROUND((pn - po) * ln(pn / po) * 1e9) AS BIGINT) AS term_e9 FROM (
       |  SELECT bin,
       |    CAST(c_old + 1 AS DOUBLE) / CAST(t_old + 64 AS DOUBLE) AS po,
       |    CAST(c_new + 1 AS DOUBLE) / CAST(t_new + 64 AS DOUBLE) AS pn
       |  FROM bins CROSS JOIN tot) x),
       |a AS (SELECT COUNT(*) AS n_bins, (SELECT t_old FROM tot) AS n_old,
       |  (SELECT t_new FROM tot) AS n_new,
       |  CAST(SUM(term_e9) AS BIGINT) AS psi_e9,
       |  CAST(MAX(term_e9) AS BIGINT) AS worst_term_e9 FROM terms),
       |wb AS (SELECT MIN(t.bin) AS worst_bin FROM terms t CROSS JOIN a WHERE t.term_e9 = a.worst_term_e9)
       |SELECT n_bins, n_old, n_new, psi_e9, worst_bin, worst_term_e9,
       |  CASE WHEN psi_e9 < 100000000 THEN 'stable'
       |       WHEN psi_e9 < 250000000 THEN 'moderate' ELSE 'shifted' END AS band
       |FROM a CROSS JOIN wb""".stripMargin

  def dq3SnapshotDrift(s: SparkSession, dir: String): DataFrame = {
    val stats = t(s, dir, "orders")
      .withColumn("snap",
        when(col("o_orderdate") < lit("1995-01-01").cast("timestamp"), "a").otherwise("b"))
      .groupBy("snap")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("price_cents"),
        sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L)).as("null_priority"))
    stats
      .select(col("snap"), expr(
        """stack(5,
          |  'mean_price_cents', price_cents div n_rows,
          |  'n_cust', n_cust,
          |  'n_rows', n_rows,
          |  'n_status', n_status,
          |  'null_priority', null_priority) AS (metric, value)""".stripMargin))
      .groupBy("metric")
      .agg(max(when(col("snap") === "a", col("value"))).as("snap_a"),
        max(when(col("snap") === "b", col("value"))).as("snap_b"))
      .withColumn("delta", col("snap_b") - col("snap_a"))
      .orderBy("metric")
  }

  val dq3SnapshotDriftSql: String =
    """WITH o AS (SELECT *,
      |  CASE WHEN o_orderdate < TIMESTAMP '1995-01-01' THEN 'a' ELSE 'b' END AS snap
      |  FROM orders),
      |s AS (SELECT snap, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT o_custkey) AS n_cust,
      |  COUNT(DISTINCT o_orderstatus) AS n_status,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
      |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_priority
      |  FROM o GROUP BY snap),
      |m AS (
      |  SELECT snap, 'mean_price_cents' AS metric, price_cents // n_rows AS value FROM s
      |  UNION ALL SELECT snap, 'n_cust', n_cust FROM s
      |  UNION ALL SELECT snap, 'n_rows', n_rows FROM s
      |  UNION ALL SELECT snap, 'n_status', n_status FROM s
      |  UNION ALL SELECT snap, 'null_priority', null_priority FROM s)
      |SELECT metric,
      |  MAX(CASE WHEN snap = 'a' THEN value END) AS snap_a,
      |  MAX(CASE WHEN snap = 'b' THEN value END) AS snap_b,
      |  MAX(CASE WHEN snap = 'b' THEN value END) - MAX(CASE WHEN snap = 'a' THEN value END) AS delta
      |FROM m GROUP BY metric ORDER BY metric""".stripMargin

  /** dq4_k_anonymity — re-identification audit over quasi-identifier
    * columns (Sweeney 2002): group sizes for the (mktsegment, nationkey)
    * QI tuple, flagging groups below k = 5 — the governance check a
    * training-data catalog runs before a release ships user-derived rows.
    * One hash-agg; at 100 TB the group count is bounded by the QI-domain
    * product, not the row count. */
  def dq4KAnonymity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", (col("n") < 5).cast("int"))
      .orderBy("c_mktsegment", "c_nationkey")

  val dq4KAnonymitySql: String =
    """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
      |  CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS at_risk
      |FROM customer GROUP BY c_mktsegment, c_nationkey
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** dq5_referential_integrity — orphan-FK audit across the star schema's
    * edges: per edge, child row count and rows whose FK misses every parent
    * key (left-anti). The constraint check a catalog runs on every load —
    * engines without enforced FKs (Spark, most lakes) need it as a query.
    * Each edge is one anti-join; orphan counts are expected 0 on
    * consistent data and the query proves it rather than assuming it. */
  def dq5ReferentialIntegrity(s: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame = {
      val nChild = child.agg(count(lit(1)).as("n_child"))
      val nOrphan = child.join(parent.select(col(pkey)),
          col(key) === col(pkey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      nChild.crossJoin(nOrphan).select(lit(name).as("fk_edge"),
        col("n_child"), col("n_orphans"))
    }
    edge("customer.nationkey->nation", t(s, dir, "customer"), "c_nationkey",
        t(s, dir, "nation"), "n_nationkey")
      .unionAll(edge("lineitem.orderkey->orders", t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders"), "o_orderkey"))
      .unionAll(edge("lineitem.suppkey->supplier", t(s, dir, "lineitem"), "l_suppkey",
        t(s, dir, "supplier"), "s_suppkey"))
      .unionAll(edge("orders.custkey->customer", t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer"), "c_custkey"))
      .orderBy("fk_edge")
  }

  val dq5ReferentialIntegritySql: String =
    """SELECT 'customer.nationkey->nation' AS fk_edge,
      |  (SELECT COUNT(*) FROM customer) AS n_child,
      |  (SELECT COUNT(*) FROM customer
      |   WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS n_orphans
      |UNION ALL SELECT 'lineitem.orderkey->orders',
      |  (SELECT COUNT(*) FROM lineitem),
      |  (SELECT COUNT(*) FROM lineitem
      |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |UNION ALL SELECT 'lineitem.suppkey->supplier',
      |  (SELECT COUNT(*) FROM lineitem),
      |  (SELECT COUNT(*) FROM lineitem
      |   WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
      |UNION ALL SELECT 'orders.custkey->customer',
      |  (SELECT COUNT(*) FROM orders),
      |  (SELECT COUNT(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      |ORDER BY fk_edge""".stripMargin

  /** a12_approx_distinct — HyperLogLog-family approximate distinct counts
    * (the 100 TB cardinality primitive). HLL registers differ across
    * engines, so the oracle-facing output is (exact distinct, n,
    * within_bound): within_bound asserts on the Spark side that the HLL
    * estimate sits within 15% of exact (3× the default 5% rsd — stable),
    * hash-compared against the oracle's constant TRUE; the exact columns
    * replay relationally. Upgrades the r5 rows-only check to a hash check;
    * RelationalSpec keeps the tighter ≤5% drift assertion. Like t7, the
    * exact side (countDistinct = a full distinct shuffle) is a
    * session-shared 3-row frame, so the benched warm path is HLL plus a
    * broadcast join — the sketch shape the query exists to price. */
  def a12ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val exact = graft.operators.SessionShare.materialized(s, dir, "a12_exact") {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
    }
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx"))
      .join(broadcast(exact), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_parts"), col("n"),
        (abs(col("approx") - col("exact_parts")) <=
          col("exact_parts").cast("double") * 0.15).as("within_bound"))
      .orderBy("l_returnflag")
  }

  val a12ApproxDistinctSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  COUNT(*) AS n, TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "r1_rollup" -> (r1Rollup _),
    "r2_cube" -> (r2Cube _),
    "p9_pivot" -> (p9Pivot _),
    "a12_approx_distinct" -> (a12ApproxDistinct _),
    "q1_agg" -> (q1Agg _),
    "q3_join_topk" -> (q3JoinTopk _),
    "q5_multi_join" -> (q5MultiJoin _),
    "j1_fk_join" -> (j1FkJoin _),
    "j3_semi_join" -> (j3SemiJoin _),
    "j4_anti_join" -> (j4AntiJoin _),
    "p7_null_guards" -> (p7NullGuards _),
    "t2_topk" -> (t2Topk _),
    "t5_offset_scan" -> (t5OffsetScan _),
    "t6_quantiles" -> (t6Quantiles _),
    "t7_approx_quantiles" -> (t7ApproxQuantiles _),
    "dq1_profile" -> (dq1Profile _),
    "dq2_outlier_mad" -> (dq2OutlierMad _),
    "dq3_snapshot_drift" -> (dq3SnapshotDrift _),
    "dq4_k_anonymity" -> (dq4KAnonymity _),
    "dq5_referential_integrity" -> (dq5ReferentialIntegrity _),
    "dq6_psi_drift" -> (dq6PsiDrift _),
    "w1_grouped_topk" -> (w1GroupedTopk _),
    "set1_pool_update" -> (set1PoolUpdate _))

  val oracles: Map[String, String] = Map(
    "r1_rollup" -> r1RollupSql,
    "r2_cube" -> r2CubeSql,
    "p9_pivot" -> p9PivotSql,
    "q1_agg" -> q1AggSql,
    "q3_join_topk" -> q3JoinTopkSql,
    "q5_multi_join" -> q5MultiJoinSql,
    "j1_fk_join" -> j1FkJoinSql,
    "j3_semi_join" -> j3SemiJoinSql,
    "j4_anti_join" -> j4AntiJoinSql,
    "p7_null_guards" -> p7NullGuardsSql,
    "t2_topk" -> t2TopkSql,
    "t5_offset_scan" -> t5OffsetScanSql,
    "t6_quantiles" -> t6QuantilesSql,
    "t7_approx_quantiles" -> t7ApproxQuantilesSql,
    "a12_approx_distinct" -> a12ApproxDistinctSql,
    "dq1_profile" -> dq1ProfileSql,
    "dq2_outlier_mad" -> dq2OutlierMadSql,
    "dq3_snapshot_drift" -> dq3SnapshotDriftSql,
    "dq4_k_anonymity" -> dq4KAnonymitySql,
    "dq5_referential_integrity" -> dq5ReferentialIntegritySql,
    "dq6_psi_drift" -> dq6PsiDriftSql,
    "w1_grouped_topk" -> w1GroupedTopkSql,
    "set1_pool_update" -> set1PoolUpdateSql)
}
