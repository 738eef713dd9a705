package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** Event-table analytics — the batch faces of the streaming shapes (SURVEY
  * §2.14 notes the reference is batch-only; these run the same logical plans
  * Structured Streaming would, over the bounded `events` table — the
  * streaming variants live in graft.streaming).
  *
  * ev1 is gap-based sessionization (lag + running sum — the classic
  * window-function sessionizer); ev2 is a tumbling-window aggregate
  * (date_trunc == window(ts, "1 hour") for bounded data). Timestamps are
  * compared as epoch seconds / formatted strings — integer math only.
  */
object EventQueries {

  private val GapMinutes = 30

  /** ev1_sessionize — per-user sessions split on >30 min inactivity:
    * session stats (events, duration). */
  def ev1Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = lit(GapMinutes * 60L * 1000000L)
    t(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        (col("prev_us").isNull || (unix_micros(col("ts")) - col("prev_us") > gapUs)).cast(IntegerType))
      .withColumn("session_idx", sum("new_sess").over(byUser))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))) / lit(1000000L)).cast(LongType).as("dur_s"),
        min(unix_micros(col("ts"))).as("start_us"))
      .select("user_id", "session_idx", "n_events", "dur_s", "start_us")
      .orderBy("user_id", "session_idx")
  }

  val ev1SessionizeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |  FROM events),
       |flag AS (
       |  SELECT user_id, event_id, us,
       |    CASE WHEN prev_us IS NULL OR us - prev_us > ${GapMinutes * 60L * 1000000L} THEN 1 ELSE 0 END AS new_sess
       |  FROM e),
       |sess AS (
       |  SELECT user_id, us,
       |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS session_idx
       |  FROM flag)
       |SELECT user_id, session_idx, COUNT(*) AS n_events,
       |  CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS dur_s,
       |  MIN(us) AS start_us
       |FROM sess GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin

  /** ev2_tumbling_agg — 1-hour tumbling windows per event_type. */
  def ev2TumblingAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("total_value"))
      .orderBy("hour", "event_type")

  val ev2TumblingAggSql: String =
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
       |  COUNT(*) AS n, ${decSumSql("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** ev3_top_users_by_value — purchase-value top-10 users (grouped agg +
    * top-k over events, the reference's T2 shape on event data). */
  def ev3TopUsers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"), decSum(col("value")).as("total"))
      .orderBy(desc("total"), col("user_id"))
      .limit(10)

  val ev3TopUsersSql: String =
    s"""SELECT user_id, COUNT(*) AS n_purchases, ${decSumSql("value")} AS total
       |FROM events WHERE event_type = 'purchase'
       |GROUP BY user_id ORDER BY total DESC, user_id LIMIT 10""".stripMargin

  /** ev4_props_json — semi-structured extraction: the `props` column is a
    * JSON string; pull `k`, aggregate by bucket (F18's modern sibling —
    * get_json_object stays codegen-friendly). */
  def ev4PropsJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .orderBy("k_bucket")

  val ev4PropsJsonSql: String =
    """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |  COUNT(*) AS n, CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin

  /** Microseconds per epoch week (integer week index = epoch_us div this —
    * pure integer math, no cross-engine date_trunc semantics). */
  private val WeekUs = 7L * 86400L * 1000000L

  /** ev5_retention — weekly cohort retention: of the users active in week
    * w, the fraction also active in week w+1. Weekly-active is one distinct
    * (user, week) projection; retention is a self left-semi equi-join on
    * (user, week+1) — both shuffle on user/week only, never on raw events.
    * The staple growth-analytics query the event suite lacked. */
  def ev5Retention(s: SparkSession, dir: String): DataFrame = {
    val wa = t(s, dir, "events")
      .select(col("user_id"), expr(s"unix_micros(ts) div $WeekUs").as("week"))
      .distinct()
    val counts = wa.groupBy("week").agg(count(lit(1)).as("n_active"))
    val retained = wa.as("a")
      .join(wa.as("b"),
        col("a.user_id") === col("b.user_id") && col("b.week") === col("a.week") + 1,
        "left_semi")
      .groupBy("week").agg(count(lit(1)).as("n_retained"))
    counts.join(retained, Seq("week"), "left_outer")
      .withColumn("n_retained", coalesce(col("n_retained"), lit(0L)))
      .withColumn("retention_e6",
        round(lit(1e6) * col("n_retained") / col("n_active")).cast(LongType))
      .select("week", "n_active", "n_retained", "retention_e6")
      .orderBy("week")
  }

  val ev5RetentionSql: String =
    s"""WITH wa AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS week FROM events),
       |counts AS (SELECT week, COUNT(*) AS n_active FROM wa GROUP BY week),
       |ret AS (
       |  SELECT a.week, COUNT(*) AS n_retained
       |  FROM wa a
       |  WHERE EXISTS (SELECT 1 FROM wa b WHERE b.user_id = a.user_id AND b.week = a.week + 1)
       |  GROUP BY a.week)
       |SELECT c.week, c.n_active, COALESCE(r.n_retained, 0) AS n_retained,
       |  CAST(ROUND(1e6 * COALESCE(r.n_retained, 0) / c.n_active) AS BIGINT) AS retention_e6
       |FROM counts c LEFT JOIN ret r USING (week) ORDER BY week""".stripMargin

  /** ev6_funnel — ordered conversion funnel view → click → purchase: a user
    * clears step 2 only with a click at-or-after their first view, step 3
    * only with a purchase at-or-after that click. Three aggregate passes
    * over events (first-view, first-qualifying-click, first-qualifying-
    * purchase), each a per-user hash agg — raw events shuffle on user_id
    * once per step, state per user is one timestamp. One summary row. */
  def ev6Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    // v is consumed by three downstream subtrees (c's join, p via c, and
    // its own count) — un-pinned, Catalyst re-evaluated its events
    // scan+agg three times (the no-CSE trap). One pin of the per-user
    // view table (one row per user, far smaller than events — the
    // scored-pool pinning contract) cuts the funnel to one full events
    // pass per stage. c/p stay lazy: each is consumed twice at most and
    // reads the pinned v, and a measured all-three-pinned variant paid
    // more in checkpoint jobs than it saved locally.
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t_view"))
      .localCheckpoint()
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") >= col("t_view"))
      .groupBy("user_id").agg(min("us").as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("us") >= col("t_click"))
      .groupBy("user_id").agg(min("us").as("t_purchase"))
    // one lazy plan (scalar aggregates cross-joined — the same shape as the
    // oracle's scalar subqueries), not eager driver-side counts; ratios go
    // NULL on an empty denominator exactly like DuckDB's x/0
    // countDistinct (not distinct().count): excludes NULL like the oracle's
    // COUNT(DISTINCT user_id) — distinct() would keep a NULL group and
    // hash-mismatch on the first null-bearing ingest
    val nAll = e.agg(countDistinct(col("user_id")).as("n_users"))
    val n1 = v.agg(count(lit(1)).as("n_view"))
    val n2 = c.agg(count(lit(1)).as("n_click_after"))
    val n3 = p.agg(count(lit(1)).as("n_purchase_after"))
    nAll.crossJoin(n1).crossJoin(n2).crossJoin(n3)
      .withColumn("click_conv_e6",
        when(col("n_view") === 0, lit(null))
          .otherwise(round(lit(1e6) * col("n_click_after") / col("n_view"))).cast(LongType))
      .withColumn("purchase_conv_e6",
        when(col("n_click_after") === 0, lit(null))
          .otherwise(round(lit(1e6) * col("n_purchase_after") / col("n_click_after"))).cast(LongType))
  }

  val ev6FunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (SELECT user_id, MIN(us) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.us) AS t_click FROM e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.us >= v.t_view GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.us) AS t_purchase FROM e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.us >= c.t_click GROUP BY e.user_id)
      |SELECT (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users,
      |  (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click_after,
      |  (SELECT COUNT(*) FROM p) AS n_purchase_after,
      |  CAST(ROUND(1e6 * (SELECT COUNT(*) FROM c) / (SELECT COUNT(*) FROM v)) AS BIGINT) AS click_conv_e6,
      |  CAST(ROUND(1e6 * (SELECT COUNT(*) FROM p) / (SELECT COUNT(*) FROM c)) AS BIGINT) AS purchase_conv_e6""".stripMargin

  /** ev7_moving_avg — trailing 7-CALENDAR-day average of daily purchase
    * totals (RANGE frame over the integer day index, so purchase-free days
    * shrink the frame rather than stretching it). Day totals become integer
    * CENTS before the rolling window, so the windowed sum is exact int64 on
    * both engines regardless of how each implements sliding frames
    * (incremental add/remove vs per-frame recompute would differ in ulps
    * over doubles); the single double division happens once per output row.
    * The rolling window runs over the per-day aggregate — one row per day,
    * bounded at any corpus scale — never over raw events. */
  def ev7MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400L * 1000000L
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(expr(s"unix_micros(ts) div $DayUs").as("day"))
      .agg(decSum(col("value")).as("day_total"))
      .withColumn("day_c", round(lit(100) * col("day_total")).cast(LongType))
    // RANGE over the integer day, not ROWS: days with zero purchases are
    // absent from `daily`, and a row frame would silently span more than 7
    // calendar days across gaps
    val w = Window.orderBy("day").rangeBetween(-6, 0)
    daily
      .withColumn("ma7_e6", round(lit(1e4) * avg(col("day_c")).over(w)).cast(LongType))
      .withColumn("day_total_e6", col("day_c") * 10000)
      .select("day", "day_total_e6", "ma7_e6")
      .orderBy("day")
  }

  val ev7MovingAvgSql: String =
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day,
       |    CAST(ROUND(100 * ${decSumSql("value")}) AS BIGINT) AS day_c
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
       |SELECT day,
       |  day_c * 10000 AS day_total_e6,
       |  CAST(ROUND(1e4 * AVG(day_c) OVER (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS BIGINT) AS ma7_e6
       |FROM daily ORDER BY day""".stripMargin

  /** ev8_asof_join — backward as-of join: each purchase picks up the most
    * recent strictly-earlier view by the same user (attribution — "which
    * impression led to this conversion"). Spark has no ASOF JOIN operator;
    * the scalable composition is a per-user ordered window over the UNION of
    * both sides — one Exchange on user_id, state bounded by a user's events,
    * never a range cross-product. The prior-view timestamp is
    * MAX(CASE WHEN view) over a RANGE frame ending 1 µs before the current
    * row — portable to engines without IGNORE NULLS, and the RANGE frame
    * (not ROWS) is what makes "strictly earlier" hold when a view and a
    * purchase share a timestamp: a ROWS (unbounded, -1] frame would let the
    * equal-ts view in. */
  def ev8AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(Window.unboundedPreceding, -1)
    t(s, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        col("last_view_us"),
        ((col("us") - col("last_view_us")) / lit(1000000L)).cast(LongType).as("gap_s"))
      .orderBy("event_id")
  }

  val ev8AsofJoinSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
      |  WHERE event_type IN ('view', 'purchase')),
      |m AS (
      |  SELECT event_id, user_id, event_type, us,
      |    MAX(CASE WHEN event_type = 'view' THEN us END) OVER (
      |      PARTITION BY user_id ORDER BY us
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_us
      |  FROM e)
      |SELECT event_id, user_id, us AS purchase_us, last_view_us,
      |  CAST((us - last_view_us) // 1000000 AS BIGINT) AS gap_s
      |FROM m WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** ev9's geometry: 30-minute windows, bucket width = window span, so a
    * window overlaps at most two buckets. */
  private val Win9Us = 30L * 60L * 1000000L

  /** ev9_range_bucket_join — interval containment join WITHOUT the
    * cross-product: every 50th event opens a 30-minute window; count/sum
    * the same-type events inside each window. A raw `e.us >= w.start AND
    * e.us < w.end` join has no equi-key, so Spark would pick
    * BroadcastNestedLoopJoin — O(|events|·|windows|) compares. The
    * bucketize trick restores an equi-join: windows explode to the (≤2)
    * fixed-width buckets they overlap, events map to exactly one bucket,
    * join on (event_type, bucket) then filter exact containment — each
    * qualifying pair meets exactly once (an event lives in ONE bucket), so
    * no dedup pass. Candidate volume is O(events·windows-per-bucket),
    * linear at fixed window density; both sides shuffle once on a
    * well-distributed key. The standard time-series/geospatial band-join
    * recipe, usable verbatim for numeric bands. */
  def ev9RangeBucketJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("bkt", expr(s"us div $Win9Us"))
    val win = t(s, dir, "events")
      .filter(col("event_id") % 50 === 0)
      .select(col("event_id").as("window_id"), col("event_type"),
        unix_micros(col("ts")).as("w_start"))
      .withColumn("w_end", col("w_start") + lit(Win9Us))
      .withColumn("bkt", explode(sequence(expr(s"w_start div $Win9Us"), expr(s"(w_end - 1) div $Win9Us"))))
    ev.join(win, Seq("event_type", "bkt"))
      .filter(col("us") >= col("w_start") && col("us") < col("w_end"))
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("total_value"))
      .orderBy("window_id")
  }

  val ev9RangeBucketJoinSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, epoch_us(ts) AS us, value FROM events),
       |win AS (
       |  SELECT event_id AS window_id, event_type, epoch_us(ts) AS w_start,
       |    epoch_us(ts) + $Win9Us AS w_end
       |  FROM events WHERE event_id % 50 = 0)
       |SELECT w.window_id, COUNT(*) AS n_events, ${decSumSql("e.value")} AS total_value
       |FROM ev e JOIN win w
       |  ON e.event_type = w.event_type AND e.us >= w.w_start AND e.us < w.w_end
       |GROUP BY w.window_id ORDER BY w.window_id""".stripMargin

  /** ev11_markov_transitions — first-order event-type transition matrix:
    * per-user event streams ordered by time, adjacent (type → next_type)
    * pairs counted, rows normalized to e6 probabilities. The sequence-
    * mining staple behind next-action prediction and funnel discovery
    * (ev6's funnel hand-picks one path; this surfaces all of them). The
    * lead window partitions by user — bounded by one user's history — and
    * the matrix is |types|², so normalization runs on a handful of rows. */
  def ev11MarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
    val wRow = Window.partitionBy("event_type")
    pairs
      .withColumn("p_e6", round(lit(1e6) * col("n") / sum("n").over(wRow)).cast(LongType))
      .orderBy("event_type", "next_type")
  }

  val ev11MarkovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
      |  FROM events),
      |cm AS (
      |  SELECT event_type, next_type, COUNT(*) AS n FROM seq
      |  WHERE next_type IS NOT NULL GROUP BY event_type, next_type)
      |SELECT event_type, next_type, n,
      |  CAST(ROUND(1e6 * n / SUM(n) OVER (PARTITION BY event_type)) AS BIGINT) AS p_e6
      |FROM cm ORDER BY event_type, next_type""".stripMargin

  /** set3_scd2 — slowly-changing-dimension (type 2) build from the event
    * log: each user's event_type stream collapses consecutive repeats into
    * versioned validity intervals — valid_from/valid_to micros, version
    * number, current flag (open interval). The standard CDC→dimension move:
    * change-point detection is one lag window, interval stitching one lead
    * window, both partitioned by user_id — shuffle is user-hash, no global
    * sort, so 100 TB of events scale by user cardinality. */
  def set3Scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val changes = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    changes
      .withColumn("version", row_number().over(w).cast(LongType))
      .withColumn("valid_to_us", lead("us", 1).over(w))
      .select(col("user_id"), col("version"), col("event_type").as("state"),
        col("us").as("valid_from_us"), col("valid_to_us"),
        when(col("valid_to_us").isNull, 1).otherwise(0).as("is_current"))
      .orderBy("user_id", "version")
  }

  val set3Scd2Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
      |  FROM events),
      |c AS (SELECT * FROM e WHERE prev_type IS NULL OR prev_type <> event_type),
      |v AS (SELECT user_id, event_type, us,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS version,
      |  LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us
      |  FROM c)
      |SELECT user_id, version, event_type AS state, us AS valid_from_us, valid_to_us,
      |  CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  /** ev12_streaks — longest consecutive-active-day streak per user: the
    * gaps-and-islands idiom (island id = day − dense row number; a13's
    * span trick applied to calendar days). Retention's sibling metric —
    * ev5 measures who comes back, this measures how persistently. Windows
    * partition by user (bounded by one user's distinct days); epoch-day
    * integer math is identical in both engines. */
  def ev12Streaks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    val days = t(s, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("streak"))
      .groupBy("user_id")
      .agg(sum("streak").as("n_active_days"), max("streak").as("longest_streak"))
      .orderBy("user_id")
  }

  val ev12StreaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |isl AS (SELECT user_id,
      |  day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days),
      |st AS (SELECT user_id, grp, COUNT(*) AS streak FROM isl GROUP BY user_id, grp)
      |SELECT user_id, CAST(SUM(streak) AS BIGINT) AS n_active_days,
      |  MAX(streak) AS longest_streak
      |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin

  /** ev13_anomaly — trailing-window volume-spike detection: per (event_type,
    * day), flag days whose count sits more than 2σ above the mean of the 7
    * STRICTLY PRECEDING calendar days (RANGE frame, not ROWS — absent days
    * must not stretch the baseline). The z² test is kept in pure integer
    * math — with S = Σ, Q = Σn² over the baseline, z² = (7n−S)²/(7Q−S²) —
    * so the flag is engine-exact with no sqrt/stddev float path; a
    * zero-variance baseline flags any positive deviation (the z→∞ limit).
    * Scale: the window runs on the daily PRE-AGGREGATE — |event types| ×
    * |days| rows regardless of corpus size — and the daily rollup itself is
    * one map-side-combined count. The monitoring face a streaming ingest
    * pipeline runs batch-side. */
  def ev13Anomaly(s: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400L * 1000000L
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), expr(s"unix_micros(ts) div $DayUs").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day").rangeBetween(-7, -1)
    daily
      .withColumn("s7", sum("n").over(w))
      .withColumn("q7", sum(col("n") * col("n")).over(w))
      .withColumn("d7", count(lit(1)).over(w))
      .filter(col("d7") === 7)
      .withColumn("dev7", lit(7L) * col("n") - col("s7"))
      .withColumn("var49", lit(7L) * col("q7") - col("s7") * col("s7"))
      .select(col("event_type"), col("day"), col("n"), col("s7"), col("dev7"), col("var49"),
        when(col("dev7") > 0 && col("dev7") * col("dev7") > lit(4L) * col("var49"), 1)
          .otherwise(0).as("spike"))
      .orderBy("event_type", "day")
  }

  val ev13AnomalySql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // ${86400L * 1000000L} AS day,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |w AS (
       |  SELECT *, SUM(n) OVER win AS s7, SUM(n * n) OVER win AS q7,
       |    COUNT(*) OVER win AS d7
       |  FROM daily
       |  WINDOW win AS (PARTITION BY event_type ORDER BY day
       |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
       |SELECT event_type, day, n, CAST(s7 AS BIGINT) AS s7,
       |  CAST(7 * n - s7 AS BIGINT) AS dev7,
       |  CAST(7 * q7 - s7 * s7 AS BIGINT) AS var49,
       |  CAST(CASE WHEN 7 * n - s7 > 0
       |    AND (7 * n - s7) * (7 * n - s7) > 4 * (7 * q7 - s7 * s7)
       |    THEN 1 ELSE 0 END AS INT) AS spike
       |FROM w WHERE d7 = 7 ORDER BY event_type, day""".stripMargin

  /** ev14_hll_rolling — rolling 7-day distinct users from DAILY HLL
    * registers (the register-algebra payoff no exact method has): exact
    * rolling distinct counts cannot be composed from daily exact counts —
    * every window needs a full re-deduplication over its span — but HLL
    * registers UNION by per-bucket max, so the 7-day estimate is a window
    * max over the (day × 256)-bounded register grid: day d's sketch costs
    * one corpus pass EVER, and any window over any span reuses it. This
    * is how every large-scale DAU/WAU/MAU pipeline works (the audit
    * columns carry the exact counts, the dd13 convention; production
    * drops them — at 100 TB the exact 7-day dedup is precisely the job
    * nobody wants to run daily).
    *
    * Scale shape: one events pass → (days × 256)-bounded register table
    * (pinned; three consumers); the rolling merge is a window over the
    * DENSE bounded grid (absent buckets materialized so the range frame
    * anchors every day), estimates are the hll1 integer-exact formula;
    * the exact-7d audit explodes each (day, user) to its ≤7 target days
    * — corpus×7 narrow rows, audit-only. */
  /** The register-only core of ev14/ev15, pinned once per (session, dir):
    * one events pass to the (days × 256)-bounded daily register grid, the
    * rolling merge as a window max over the dense grid, both estimates —
    * NOTHING here touches per-user rows after the register fold. Returns
    * (day, hll_1d, hll_7d). */
  private def hllRolledEstimates(s: SparkSession, dir: String): DataFrame =
    graft.operators.SessionShare.materialized(s, dir, "ev14_hll") {
      import graft.operators.Sketch
      val ev = t(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val dayRegs = Sketch.hllRegisters(ev, col("user_id"), Seq("day"))
        .localCheckpoint()
      val days = dayRegs.select("day").distinct()
      val grid = days.crossJoin(broadcast(
        s.range(Sketch.HllM.toLong).select(col("id").as("bucket"))))
      val wRoll = Window.partitionBy("bucket")
        .orderBy(datediff(col("day"), lit("2020-01-01").cast("date")))
        .rangeBetween(-6, 0)
      val rolled = grid
        .join(dayRegs.withColumnRenamed("rho", "rho0"), Seq("day", "bucket"), "left")
        .withColumn("rho", max("rho0").over(wRoll))
        .filter(col("rho").isNotNull)
        .select(col("day"), col("bucket"), col("rho").cast(IntegerType).as("rho"))
      val est1 = Sketch.hllEstimate(dayRegs, "day")
        .select(col("day"), col("hll_est").as("hll_1d"))
      val est7 = Sketch.hllEstimate(rolled, "day")
        .select(col("day"), col("hll_est").as("hll_7d"))
      est1.join(est7, Seq("day"))
    }

  /** ev15_hll_serve — the SERVING face of the rolling-distinct dashboard
    * (VERDICT r18 #6): register-bounded ONLY. ev14's exact_1d/exact_7d
    * audit arms replay the corpus×7 (day, user) explode — the precise job
    * a production deployment does NOT run daily; this face is the row it
    * watches instead, and its cost is one events pass + window algebra
    * over the (days × 256) grid, flat in corpus size by construction.
    * ev14 stays registered as the audit twin that proves the estimates
    * against exact dedup. */
  def ev15HllServe(s: SparkSession, dir: String): DataFrame =
    hllRolledEstimates(s, dir)
      .select("day", "hll_1d", "hll_7d")
      .orderBy("day")

  def ev14HllRolling(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val ests = hllRolledEstimates(s, dir)
    val days = ests.select("day")
    val du = ev.distinct()
    val exact1 = du.groupBy("day").agg(count(lit(1)).as("exact_1d"))
    val exact7 = du
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("tday"), col("user_id"))
      .distinct()
      .join(days.withColumnRenamed("day", "tday"), Seq("tday"))
      .groupBy(col("tday").as("day")).agg(count(lit(1)).as("exact_7d"))
    exact1.join(exact7, Seq("day")).join(ests, Seq("day"))
      .select("day", "exact_1d", "hll_1d", "exact_7d", "hll_7d")
      .orderBy("day")
  }

  /** Shared register-algebra CTE chain (through e1/e7) for the ev14 audit
    * and ev15 serving oracles. */
  private def hllCtesSql: String = {
    import graft.operators.Sketch.{HllM, HllRawC, HllScale, hllRhoSql}
    val c = java.lang.Double.toString(HllRawC)
    def estSql(src: String): String =
      s"""SELECT day, CAST(ROUND(
         |    CASE WHEN ($c / CAST(s_scaled AS DOUBLE)) <= ${2.5 * HllM}
         |           AND $HllM - n_regs > 0
         |      THEN ${HllM.toDouble} * ln(${HllM.toDouble} / CAST($HllM - n_regs AS DOUBLE))
         |      ELSE $c / CAST(s_scaled AS DOUBLE) END) AS BIGINT) AS hll_est
         |  FROM (
         |    SELECT day, COUNT(*) AS n_regs,
         |      SUM(CAST((CAST(1 AS BIGINT) << (60 - rho)) AS HUGEINT))
         |        + CAST($HllM - COUNT(*) AS HUGEINT) * CAST($HllScale AS HUGEINT) AS s_scaled
         |    FROM $src GROUP BY day) agg_$src""".stripMargin
    s"""WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
       |hx AS (SELECT day, ${Q.detHashSql("user_id", 11)} AS h FROM ev),
       |rr AS (SELECT day, h % $HllM AS bucket, ${hllRhoSql(s"h // $HllM")} AS rho FROM hx),
       |dayregs AS (SELECT day, bucket, MAX(rho) AS rho FROM rr GROUP BY day, bucket),
       |days AS (SELECT DISTINCT day FROM dayregs),
       |grid AS (SELECT d.day, b.bucket FROM days d
       |  CROSS JOIN (SELECT unnest(range($HllM)) AS bucket) b),
       |rolled0 AS (
       |  SELECT g.day, g.bucket,
       |    MAX(r.rho) OVER (PARTITION BY g.bucket ORDER BY g.day
       |      RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS rho
       |  FROM grid g LEFT JOIN dayregs r ON r.day = g.day AND r.bucket = g.bucket),
       |rolled AS (SELECT day, bucket, rho FROM rolled0 WHERE rho IS NOT NULL),
       |e1 AS (${estSql("dayregs")}),
       |e7 AS (${estSql("rolled")}),
       |du AS (SELECT DISTINCT day, user_id FROM ev),
       |x7 AS (
       |  SELECT t.tday AS day, COUNT(*) AS exact_7d FROM (
       |    SELECT DISTINCT CAST(unnest(generate_series(day, day + INTERVAL 6 DAYS, INTERVAL 1 DAY)) AS DATE) AS tday,
       |      user_id
       |    FROM du) t
       |  JOIN days d ON d.day = t.tday GROUP BY t.tday),
       |x1 AS (SELECT day, COUNT(*) AS exact_1d FROM du GROUP BY day)""".stripMargin
  }

  val ev14HllRollingSql: String =
    s"""$hllCtesSql
       |SELECT x1.day, x1.exact_1d, e1.hll_est AS hll_1d, x7.exact_7d, e7.hll_est AS hll_7d
       |FROM x1 JOIN e1 USING (day) JOIN x7 USING (day) JOIN e7 USING (day)
       |ORDER BY day""".stripMargin

  val ev15HllServeSql: String =
    s"""$hllCtesSql
       |SELECT e1.day, e1.hll_est AS hll_1d, e7.hll_est AS hll_7d
       |FROM e1 JOIN e7 USING (day)
       |ORDER BY day""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "ev13_anomaly" -> (ev13Anomaly _),
    "ev14_hll_rolling" -> (ev14HllRolling _),
    "ev15_hll_serve" -> (ev15HllServe _),
    "ev12_streaks" -> (ev12Streaks _),
    "set3_scd2" -> (set3Scd2 _),
    "ev1_sessionize" -> (ev1Sessionize _),
    "ev9_range_bucket_join" -> (ev9RangeBucketJoin _),
    "ev11_markov_transitions" -> (ev11MarkovTransitions _),
    "ev8_asof_join" -> (ev8AsofJoin _),
    "ev2_tumbling_agg" -> (ev2TumblingAgg _),
    "ev3_top_users" -> (ev3TopUsers _),
    "ev4_props_json" -> (ev4PropsJson _),
    "ev5_retention" -> (ev5Retention _),
    "ev6_funnel" -> (ev6Funnel _),
    "ev7_moving_avg" -> (ev7MovingAvg _))

  val oracles: Map[String, String] = Map(
    "ev13_anomaly" -> ev13AnomalySql,
    "ev14_hll_rolling" -> ev14HllRollingSql,
    "ev15_hll_serve" -> ev15HllServeSql,
    "set3_scd2" -> set3Scd2Sql,
    "ev12_streaks" -> ev12StreaksSql,
    "ev1_sessionize" -> ev1SessionizeSql,
    "ev9_range_bucket_join" -> ev9RangeBucketJoinSql,
    "ev11_markov_transitions" -> ev11MarkovTransitionsSql,
    "ev8_asof_join" -> ev8AsofJoinSql,
    "ev2_tumbling_agg" -> ev2TumblingAggSql,
    "ev3_top_users" -> ev3TopUsersSql,
    "ev4_props_json" -> ev4PropsJsonSql,
    "ev5_retention" -> ev5RetentionSql,
    "ev6_funnel" -> ev6FunnelSql,
    "ev7_moving_avg" -> ev7MovingAvgSql)
}
