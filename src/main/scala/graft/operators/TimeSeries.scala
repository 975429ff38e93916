package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Determinism.{r6, r6Sql}
import graft.streaming.StreamingStats

/** Time-series operators over the `events` fixture — the windowed /
  * temporal-join family a metrics or feature-engineering pipeline
  * needs beyond plain daily aggregation (reference has only the daily
  * batch loop, reference script.py:339-353).
  *
  * Both operators shuffle once on their natural key and stay
  * partitioned through every window — see each method's scale note.
  */
object TimeSeries {

  /** Rolling window span in days (current day + 6 preceding). */
  val RollDays = 6

  /** Exact integer-cent sum — ONE copy, shared with the daily stats
    * (the rounding rule is an oracle-parity invariant).
    */
  private def sumCents(c: Column) = StreamingStats.sumCents(c)

  // ------------------------------------------------------------------
  // ev_rolling — 7-day rolling aggregates per event type
  // ------------------------------------------------------------------

  /** 7-day rolling event counts / values per event type: the classic
    * trailing-window trend query (moving averages over daily metrics).
    *
    * Shape: one shuffle aggregates events to (event_type, day) — after
    * partial aggregation that shuffle carries one row per group — then
    * a RANGE window (`rangeBetween(-6, 0)` over an epoch-day ordinal,
    * so absent days do NOT contribute phantom rows) runs over the
    * per-day table. At 100 TB the window input is O(types × days),
    * thousands of rows regardless of event volume: the expensive data
    * never enters a window. Rolling sums stay in integer cents, so
    * every output is parallelism-stable.
    */
  def evRolling(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = StreamingStats.events(spark, sfDir)
      .groupBy(col("event_type"),
        unix_date(to_date(col("ts"))).as("day_num"))
      .agg(count(lit(1)).as("n_events"), sumCents(col("value")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-RollDays, 0)
    daily
      .withColumn("roll_events", sum(col("n_events")).over(w))
      .withColumn("roll_cents", sum(col("cents")).over(w))
      .select(
        col("event_type"),
        date_from_unix_date(col("day_num")).cast("string").as("day"),
        col("n_events"),
        r6(col("cents").cast("double") / 100.0).as("day_value"),
        col("roll_events"),
        r6(col("roll_cents").cast("double") / 100.0).as("roll_value"),
        r6(col("roll_cents").cast("double") / 100.0 / col("roll_events"))
          .as("roll_avg_value"))
      .orderBy(col("event_type"), col("day"))
  }

  lazy val evRollingSql: String = s"""
WITH daily AS (
  SELECT event_type,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_num,
    COUNT(*) AS n_events,
    SUM(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events
  GROUP BY 1, 2
), rolled AS (
  SELECT event_type, day_num, n_events, cents,
    SUM(n_events) OVER (PARTITION BY event_type ORDER BY day_num
      RANGE BETWEEN $RollDays PRECEDING AND CURRENT ROW) AS roll_events,
    SUM(cents) OVER (PARTITION BY event_type ORDER BY day_num
      RANGE BETWEEN $RollDays PRECEDING AND CURRENT ROW) AS roll_cents
  FROM daily
)
SELECT event_type,
  CAST(DATE '1970-01-01' + day_num AS VARCHAR) AS day,
  n_events,
  ${r6Sql("(CAST(cents AS DOUBLE) / 100.0)")} AS day_value,
  CAST(roll_events AS BIGINT) AS roll_events,
  ${r6Sql("(CAST(roll_cents AS DOUBLE) / 100.0)")} AS roll_value,
  ${r6Sql("(CAST(roll_cents AS DOUBLE) / 100.0 / roll_events)")}
    AS roll_avg_value
FROM rolled
ORDER BY event_type, day"""

  // ------------------------------------------------------------------
  // ev_asof — as-of (most-recent-prior) temporal join
  // ------------------------------------------------------------------

  /** Generic as-of join: every `left` row picks the latest `right` row
    * of the same `key` with `right.ts <= left.ts` (ties include the
    * equal-timestamp right row, matching SQL `ASOF JOIN ... ON l.ts >=
    * r.ts`); unmatched left rows survive with nulls (LEFT semantics).
    *
    * Spark has no as-of join operator; the scalable shape is NOT a
    * range theta-join (which plans a nested loop) but the tagged
    * union + running `last(ignoreNulls)` window used here: both sides
    * shuffle ONCE on the key, the window scans each partition's
    * time-sorted stream, and no row set is ever broadcast or
    * replicated. `rightCols` are carried through the window as one
    * struct so every payload column rides a single window expression.
    *
    * At 100 TB this is one shuffle of left+right and a sort within
    * partitions — the same cost as any keyed window; skewed keys
    * AQE-split like any other sort.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      tieBreak: String, rightCols: Seq[String]): DataFrame = {
    // `side`/`r`/`asof` are internal working columns introduced with
    // withColumn — a caller column of the same name would be silently
    // overwritten and produce wrong results; fail loudly instead.
    // `tieBreak` must exist on the right (it orders tied right rows in
    // the tagged union); a left frame without it gains a null-filled
    // copy in the output (left-left ordering is irrelevant: tied left
    // rows all carry null payloads, invisible to last(ignoreNulls)).
    for (c <- Seq("side", "r", "asof")) {
      require(!left.columns.contains(c),
        s"asofJoin: left already has internal column '$c' — rename it")
      require(!right.columns.contains(c),
        s"asofJoin: right already has internal column '$c' — rename it")
    }
    for (c <- Seq(key, ts)) {
      require(left.columns.contains(c), s"asofJoin: left lacks '$c'")
      require(right.columns.contains(c), s"asofJoin: right lacks '$c'")
    }
    require(right.columns.contains(tieBreak),
      s"asofJoin: right lacks tieBreak column '$tieBreak'")
    val payload = struct(rightCols.map(col): _*)
    // side=0 sorts right before left at an equal timestamp → `<=` match
    val l = left.withColumn("side", lit(1)).withColumn("r", lit(null)
      .cast(right.select(payload).schema.fields.head.dataType))
    val r = right.withColumn("side", lit(0)).withColumn("r", payload)
      .select(col(key), col(ts), col(tieBreak), col("side"), col("r"))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(l.columns.map(col): _*)
      .unionByName(r.select(col(key), col(ts), col(tieBreak), col("side"),
        col("r")), allowMissingColumns = true)
      .withColumn("asof", last(col("r"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .drop("side", "r")
  }

  /** Time-since-last-error per event: each non-error event as-of joins
    * to the user's most recent prior (or simultaneous) error event.
    * The archetypal feature-engineering temporal join (sensor readings
    * vs calibrations, trades vs quotes, requests vs deploys).
    *
    * Microsecond difference is integer arithmetic end-to-end, so the
    * output is exact; events with no prior error keep null (LEFT
    * semantics — dropping them would silently bias any downstream
    * model).
    *
    * Oracle caveat: among right rows TIED on (user, ts), [[asofJoin]]
    * deterministically picks the highest tieBreak while SQL ASOF JOIN
    * picks an arbitrary one — the engines agree because the fixture
    * has no such ties, an invariant TimeSeriesSpec pins at the gate
    * SF.
    */
  def evAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = StreamingStats.events(spark, sfDir)
    val left = ev.filter(col("event_type") =!= "error")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val right = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("err_id", col("event_id"))
      .withColumn("err_us", unix_micros(col("ts")))
    asofJoin(left, right, "user_id", "ts", "event_id",
        Seq("err_id", "err_us"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("asof.err_id").as("last_error_id"),
        (unix_micros(col("ts")) - col("asof.err_us")).as("us_since_error"))
      .orderBy(col("event_id"))
  }

  lazy val evAsofSql: String = """
SELECT l.event_id, l.user_id, l.event_type,
  r.event_id AS last_error_id,
  CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS us_since_error
FROM (SELECT * FROM events WHERE event_type <> 'error') l
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id"""

  // ------------------------------------------------------------------
  // ev_funnel — ordered-stage conversion funnel
  // ------------------------------------------------------------------

  /** Per-user view → click → purchase funnel: a stage counts only if
    * it happens strictly AFTER the previous stage's first qualifying
    * event (a click before any view is not funnel progress). The
    * classic event-sequence query.
    *
    * Single-shuffle shape: one partitioning on user_id carries three
    * chained window passes — running min of view time, then of
    * view-qualified click time, then the purchase test — and the final
    * per-user aggregation reuses the same partitioning. No self-joins:
    * the 3-pass join formulation (agg t1, join, agg t2, join, agg t3)
    * shuffles the events table three times for the same answer.
    * Timestamps stay integer micros end-to-end.
    */
  def evFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    StreamingStats.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("t1r",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("qclick", when(col("event_type") === "click" &&
        col("t1r") < col("us"), col("us")))
      .withColumn("t2r", min(col("qclick")).over(w))
      .withColumn("qpur", when(col("event_type") === "purchase" &&
        col("t2r") < col("us"), col("us")))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("us"))).as("view_us"),
        min(col("qclick")).as("click_us"),
        min(col("qpur")).as("purchase_us"))
      .select(col("user_id"), col("view_us"), col("click_us"),
        col("purchase_us"),
        when(col("purchase_us").isNotNull, 3)
          .when(col("click_us").isNotNull, 2)
          .when(col("view_us").isNotNull, 1)
          .otherwise(0).as("stage"))
      .orderBy(col("user_id"))
  }

  /** The funnel CTE chain through the final per-user row (`fin`) —
    * shared by [[evFunnelSql]] and [[evFunnelTimeSql]]: ONE copy of
    * the stage semantics.
    */
  private lazy val evFunnelCtes: String = """
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
), s1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
    OVER (PARTITION BY user_id ORDER BY us, event_id
      ROWS UNBOUNDED PRECEDING) AS t1r
  FROM base
), s2 AS (
  SELECT *, CASE WHEN event_type = 'click' AND t1r < us THEN us END
    AS qclick
  FROM s1
), s3 AS (
  SELECT *, MIN(qclick) OVER (PARTITION BY user_id ORDER BY us, event_id
    ROWS UNBOUNDED PRECEDING) AS t2r
  FROM s2
), s4 AS (
  SELECT *, CASE WHEN event_type = 'purchase' AND t2r < us THEN us END
    AS qpur
  FROM s3
), agg AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN us END) AS view_us,
    MIN(qclick) AS click_us,
    MIN(qpur) AS purchase_us
  FROM s4 GROUP BY user_id
), fin AS (
  SELECT user_id, view_us, click_us, purchase_us,
    CAST(CASE WHEN purchase_us IS NOT NULL THEN 3
         WHEN click_us IS NOT NULL THEN 2
         WHEN view_us IS NOT NULL THEN 1
         ELSE 0 END AS INTEGER) AS stage
  FROM agg
)"""

  lazy val evFunnelSql: String = evFunnelCtes + """
SELECT user_id, view_us, click_us, purchase_us, stage
FROM fin ORDER BY user_id"""

  // ------------------------------------------------------------------
  // ev_funnel_time — conversion-latency distribution
  // ------------------------------------------------------------------

  /** Time-to-convert readout over the [[evFunnel]] cohort: for every
    * fully-converted user (stage 3), the first-view → qualifying-
    * purchase latency, summarized as exact-count mean plus EXACT
    * integer-microsecond p50/p90 — rank-ceil selection (the
    * prof_outliers rule), never interpolation, so the percentile
    * micros hash bitwise.
    *
    * Scale: the funnel itself is the one user-partitioned shuffle; the
    * latency summary then reduces to a (delta, count) relation —
    * distinct observed latencies, not users — before the cumulative
    * rank. The mean's numerator is an exact BIGINT; BIGINT→double
    * conversion is correctly rounded on both engines at any magnitude.
    */
  def evFunnelTime(spark: SparkSession, sfDir: String): DataFrame = {
    val g = evFunnel(spark, sfDir)
      .filter(col("purchase_us").isNotNull)
      .select((col("purchase_us") - col("view_us")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // totals ride the SAME single-partition window pass as the
    // cumulative rank — a separate aggregate branch would re-evaluate
    // the whole funnel subtree (measured: 2 scans → 1)
    val wAll = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cw = g.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll).cast("long"))
      .withColumn("sum_d",
        sum(col("d") * col("cnt")).over(wAll).cast("long"))
    cw.agg(
      min(col("n")).as("n"), min(col("sum_d")).as("sum_d"),
      ExactRank.valueAt(1, 2, "n", col("d")).as("p50_us"),
      ExactRank.valueAt(9, 10, "n", col("d")).as("p90_us"))
      .select(col("n").as("n_converted"),
        graft.functions.Determinism.r6(
          col("sum_d").cast("double") / col("n") / lit(1000000.0))
          .as("mean_sec"),
        col("p50_us"), col("p90_us"))
  }

  lazy val evFunnelTimeSql: String = evFunnelCtes + s""", d AS (
  SELECT purchase_us - view_us AS d FROM fin WHERE purchase_us IS NOT NULL
), g AS (
  SELECT d, COUNT(*) AS cnt FROM d GROUP BY d
), cw AS (
  SELECT d, cnt, SUM(cnt) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum
  FROM g
), t AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
    CAST(SUM(d * cnt) AS BIGINT) AS sum_d
  FROM g
), q AS (
  SELECT MIN(n) AS n, MIN(sum_d) AS sum_d,
    ${ExactRank.valueAtSql(1, 2, "n", "d")} AS p50_us,
    ${ExactRank.valueAtSql(9, 10, "n", "d")} AS p90_us
  FROM cw, t
)
SELECT n AS n_converted,
  ${graft.functions.Determinism.r6Sql(
    "(CAST(sum_d AS DOUBLE) / n / 1000000.0)")} AS mean_sec,
  p50_us, p90_us
FROM q"""

  // ------------------------------------------------------------------
  // ev_session_stats — session-population summary
  // ------------------------------------------------------------------

  /** Population summary over the [[StreamingStats.evSessions]] rows —
    * the engagement readout a product team keeps on a dashboard:
    * session/user counts, bounce share (single-event sessions), exact
    * mean events-per-session, and EXACT rank-ceil p50/p90 session
    * durations. All counts are exact BIGINTs; the one float is the
    * mean division.
    *
    * Scale: rides the sessionizer's single user_id shuffle, then
    * reduces to a (duration, count) relation (distinct observed
    * durations — seconds, so domain-bounded) for the percentile rank;
    * the totals row is a broadcast. The float `session_value` column
    * is deliberately NOT re-aggregated — summing per-session rounded
    * floats is fold-order-dependent; a value rollup belongs on the
    * exact cents upstream of the rounding.
    */
  def evSessionStats(spark: SparkSession, sfDir: String): DataFrame = {
    // the totals pass needs countDistinct(user_id) — not derivable
    // from the (duration, count) relation — so the session rows feed
    // two branches; cache them rather than run the sessionizer twice
    // (the dd_minhash_lsh idiom; Verify/Bench clear the cache after
    // each query)
    val s = StreamingStats.evSessions(spark, sfDir)
      .select(col("user_id"), col("n_events"), col("duration_sec"))
      .cache()
    val g = s.groupBy(col("duration_sec").as("d"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cw = g.withColumn("cum", sum(col("cnt")).over(w))
    val t = s.agg(
      count(lit(1)).as("n_sessions"),
      countDistinct(col("user_id")).as("n_users"),
      sum(col("n_events")).as("sum_events"),
      sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("bounces"),
      max(col("duration_sec")).as("max_duration_sec"))
    cw.crossJoin(broadcast(t)).agg(
      min(col("n_sessions")).as("n_sessions"),
      min(col("n_users")).as("n_users"),
      min(col("sum_events")).as("sum_events"),
      min(col("bounces")).as("bounces"),
      min(col("max_duration_sec")).as("max_duration_sec"),
      ExactRank.valueAt(1, 2, "n_sessions", col("d"))
        .as("p50_duration_sec"),
      ExactRank.valueAt(9, 10, "n_sessions", col("d"))
        .as("p90_duration_sec"))
      .select(col("n_sessions"), col("n_users"), col("bounces"),
        graft.functions.Determinism.r6(
          col("sum_events").cast("double") / col("n_sessions"))
          .as("mean_events"),
        col("p50_duration_sec"), col("p90_duration_sec"),
        col("max_duration_sec"))
  }

  lazy val evSessionStatsSql: String = StreamingStats.evSessionsBody + s""", g AS (
  SELECT duration_sec AS d, COUNT(*) AS cnt FROM sess_rows GROUP BY 1
), cw AS (
  SELECT d, cnt, SUM(cnt) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum
  FROM g
), t AS (
  SELECT COUNT(*) AS n_sessions,
    COUNT(DISTINCT user_id) AS n_users,
    CAST(SUM(n_events) AS BIGINT) AS sum_events,
    CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS bounces,
    MAX(duration_sec) AS max_duration_sec
  FROM sess_rows
), q AS (
  SELECT MIN(n_sessions) AS n_sessions, MIN(n_users) AS n_users,
    MIN(sum_events) AS sum_events, MIN(bounces) AS bounces,
    MIN(max_duration_sec) AS max_duration_sec,
    ${ExactRank.valueAtSql(1, 2, "n_sessions", "d")} AS p50_duration_sec,
    ${ExactRank.valueAtSql(9, 10, "n_sessions", "d")} AS p90_duration_sec
  FROM cw, t
)
SELECT n_sessions, n_users, bounces,
  ${graft.functions.Determinism.r6Sql(
    "(CAST(sum_events AS DOUBLE) / n_sessions)")} AS mean_events,
  p50_duration_sec, p90_duration_sec, max_duration_sec
FROM q"""

  // ------------------------------------------------------------------
  // ev_range_join — bucketed interval join
  // ------------------------------------------------------------------

  /** Interval window for the shipped query: right events in the
    * half-open [left − 30 min, left). */
  val RangeLoUs: Long = -30L * 60L * 1000000L
  val RangeHiUs: Long = 0L

  /** Generic keyed interval join: every (left, right) pair with the
    * same `key` and `right.us ∈ [left.us + loUs, left.us + hiUs)`.
    *
    * A direct range predicate plans a nested-loop join; the scalable
    * shape buckets time by the window width W = hi − lo: each right
    * row lands in exactly one (key, bucket), each left row probes the
    * ≤2 buckets its window can span (an exploded literal range), and
    * the exact predicate filters the equi-join's candidates. Shuffle
    * ∝ |left|·2 + |right|, never |left|×|right|; the bucket id is a
    * partition key at rest for a storage-pruned variant.
    *
    * `left` must carry (`key`, `ts`); `right` (`key`, `ts`,
    * `rightCols`…). The right timestamp is emitted as `r_<ts>`; the
    * internal bucket column is `bkt` — collisions with caller columns
    * are rejected, not silently overwritten.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      loUs: Long, hiUs: Long, rightCols: Seq[String],
      ts: String = "us"): DataFrame = {
    val w = hiUs - loUs
    require(w > 0, "window must be non-empty")
    val rTs = s"r_$ts"
    require(!left.columns.contains("bkt") && !right.columns.contains("bkt"),
      "rangeJoin: 'bkt' is an internal column name — rename the caller's")
    require(!left.columns.contains(rTs) && !rightCols.contains(rTs),
      s"rangeJoin: '$rTs' is reserved for the right timestamp — rename")
    for (c <- Seq(key, ts)) {
      require(left.columns.contains(c), s"rangeJoin: left lacks '$c'")
      require(right.columns.contains(c), s"rangeJoin: right lacks '$c'")
    }
    // true floor division (`div` truncates toward zero, which would
    // misbucket pre-epoch timestamps): a - pmod(a, w) is exactly
    // divisible, so the `div` below is floor for any sign
    def fdiv(a: String) = expr(s"(($a) - pmod($a, $w)) div $w")
    val l = left.withColumn("bkt", explode(sequence(
      fdiv(s"`$ts` + $loUs"), fdiv(s"`$ts` + $hiUs"))))
    val r = right
      .select((col(key) +: col(ts).as(rTs) +: rightCols.map(col)): _*)
      .withColumn("bkt", fdiv(s"`$rTs`"))
    l.join(r, Seq(key, "bkt"))
      .filter(col(rTs) >= col(ts) + loUs &&
        col(rTs) < col(ts) + hiUs)
      .drop("bkt")
  }

  /** Purchases vs the same user's clicks in the preceding 30 minutes —
    * count and exact cent value — the attribution-window query, and
    * the operator family (interval join) Spark lacks natively.
    * LEFT semantics: purchases with no prior click stay at zero.
    */
  def evRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = StreamingStats.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("click_cents"))
    val paired = rangeJoin(purchases, clicks, "user_id",
        RangeLoUs, RangeHiUs, Seq("click_cents"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_prior_clicks"),
        sum(col("click_cents")).as("cents"))
    purchases.join(paired, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_prior_clicks"), lit(0L)).as("n_prior_clicks"),
        r6(coalesce(col("cents"), lit(0L)).cast("double") / 100.0)
          .as("clicks_value"))
      .orderBy(col("event_id"))
  }

  lazy val evRangeJoinSql: String = s"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS us,
    CAST(round(value * 100) AS BIGINT) AS click_cents
  FROM events WHERE event_type = 'click'
), agg AS (
  SELECT p.event_id, COUNT(c.us) AS n_prior_clicks,
    COALESCE(SUM(c.click_cents), 0) AS cents
  FROM p LEFT JOIN c ON c.user_id = p.user_id
    AND c.us >= p.us + $RangeLoUs AND c.us < p.us + $RangeHiUs
  GROUP BY p.event_id
)
SELECT a.event_id, p.user_id,
  CAST(a.n_prior_clicks AS BIGINT) AS n_prior_clicks,
  ${r6Sql("(CAST(a.cents AS DOUBLE) / 100.0)")} AS clicks_value
FROM agg a JOIN p ON p.event_id = a.event_id
ORDER BY a.event_id"""

  // ------------------------------------------------------------------
  // ev_retention — cohort retention matrix
  // ------------------------------------------------------------------

  /** Cohort retention: users grouped by first-active day, counted on
    * each later day they return — the (cohort, day-offset) matrix
    * every growth dashboard reads.
    *
    * Shape: distinct (user, day) activity first (partial-agg distinct:
    * the shuffle carries one row per user-day, not per event), then
    * the cohort day as a window min over the SAME user partitioning,
    * then the matrix aggregation. Because (user, day) rows are unique,
    * the final count is a plain COUNT(*) — no COUNT(DISTINCT) state.
    */
  def evRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val ud = StreamingStats.events(spark, sfDir)
      .select(col("user_id"), unix_date(to_date(col("ts"))).as("day_num"))
      .distinct()
      .withColumn("cohort", min(col("day_num")).over(byUser))
    ud.groupBy(col("cohort"), (col("day_num") - col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        date_from_unix_date(col("cohort")).cast("string").as("cohort_day"),
        col("day_offset").cast("long").as("day_offset"),
        col("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  lazy val evRetentionSql: String = """
WITH ud AS (
  SELECT DISTINCT user_id,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_num
  FROM events
), c AS (
  SELECT user_id, day_num,
    MIN(day_num) OVER (PARTITION BY user_id) AS cohort
  FROM ud
)
SELECT CAST(DATE '1970-01-01' + cohort AS VARCHAR) AS cohort_day,
  CAST(day_num - cohort AS BIGINT) AS day_offset,
  COUNT(*) AS n_users
FROM c GROUP BY cohort, day_num - cohort
ORDER BY cohort_day, day_offset"""

  // ------------------------------------------------------------------
  // ev_anomaly — trailing-baseline z-score flagging
  // ------------------------------------------------------------------

  /** Baseline window: the [[AnomalyBaselineDays]] days strictly before
    * the scored day (the day never baselines itself). */
  val AnomalyBaselineDays = 7
  /** Minimum baseline days for a defined score. */
  val AnomalyMinBaseline = 4
  /** |z| at or above this flags the day. */
  val AnomalyZ = 2.0

  private val M = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Daily-volume anomaly detection: each (event_type, day) scored
    * against the mean/stddev of the preceding 7 days — the monitoring
    * query that watches a pipeline's ingest volumes.
    *
    * Same scale shape as [[evRolling]] (the window input is the tiny
    * per-day aggregate); moments use exact integer sums in
    * decimal(38,0) (the q12/q13 overflow posture — DuckDB's HUGEINT
    * twin matches bitwise), so mean/variance are parallelism-stable;
    * population variance over the baseline window, z undefined (null,
    * not flagged) under [[AnomalyMinBaseline]] days or zero variance.
    */
  def evAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = StreamingStats.events(spark, sfDir)
      .groupBy(col("event_type"),
        unix_date(to_date(col("ts"))).as("day_num"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-AnomalyBaselineDays, -1)
    val cnt = count(col("n")).over(w)
    val s1 = sum(col("n").cast(M)).over(w)
    // cast BEFORE squaring: n*n in int64 wraps for n ≳ 3e9/day; the
    // decimal(38,0) product is exact at any daily volume
    val s2 = sum(col("n").cast(M) * col("n").cast(M)).over(w)
    val mean = col("s1").cast("double") / col("cnt")
    val varPop = (col("cnt").cast(M) * col("s2") - col("s1") * col("s1"))
      .cast("double") / (col("cnt") * col("cnt")).cast("double")
    val z = (col("n").cast("double") - mean) / sqrt(varPop)
    val defined = col("cnt") >= AnomalyMinBaseline && varPop > 0.0
    daily
      .withColumn("cnt", cnt).withColumn("s1", s1).withColumn("s2", s2)
      .select(
        col("event_type"),
        date_from_unix_date(col("day_num")).cast("string").as("day"),
        col("n").as("n_events"),
        col("cnt").as("baseline_days"),
        when(col("cnt") > 0, r6(mean)).as("baseline_mean"),
        when(defined, r6(z)).as("z_score"),
        coalesce(when(defined, abs(z) >= AnomalyZ), lit(false))
          .as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  lazy val evAnomalySql: String = {
    val mean = "(CAST(s1 AS DOUBLE) / cnt)"
    val varPop = "(CAST(cnt * s2 - s1 * s1 AS DOUBLE) / CAST(cnt * cnt AS DOUBLE))"
    val z = s"((CAST(n AS DOUBLE) - $mean) / sqrt($varPop))"
    val defined = s"(cnt >= $AnomalyMinBaseline AND $varPop > 0.0)"
    s"""
WITH daily AS (
  SELECT event_type,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_num,
    COUNT(*) AS n
  FROM events GROUP BY 1, 2
), base AS (
  SELECT event_type, day_num, n,
    COUNT(n) OVER (PARTITION BY event_type ORDER BY day_num
      RANGE BETWEEN $AnomalyBaselineDays PRECEDING AND 1 PRECEDING) AS cnt,
    SUM(n) OVER (PARTITION BY event_type ORDER BY day_num
      RANGE BETWEEN $AnomalyBaselineDays PRECEDING AND 1 PRECEDING) AS s1,
    SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) OVER (PARTITION BY event_type ORDER BY day_num
      RANGE BETWEEN $AnomalyBaselineDays PRECEDING AND 1 PRECEDING) AS s2
  FROM daily
)
SELECT event_type,
  CAST(DATE '1970-01-01' + day_num AS VARCHAR) AS day,
  n AS n_events,
  CAST(cnt AS BIGINT) AS baseline_days,
  CASE WHEN cnt > 0 THEN ${graft.functions.Determinism.r6Sql(mean)} END
    AS baseline_mean,
  CASE WHEN $defined THEN ${graft.functions.Determinism.r6Sql(z)} END
    AS z_score,
  COALESCE(CASE WHEN $defined THEN abs($z) >= $AnomalyZ END, false)
    AS is_anomaly
FROM base ORDER BY event_type, day"""
  }

  // ------------------------------------------------------------------
  // ev_mad — robust (median/MAD) trailing-baseline anomaly flagging
  // ------------------------------------------------------------------

  /** MAD multiplier: |n − median| > MadK·MAD flags the day. */
  val MadK = 3.0

  /** The robust twin of [[evAnomaly]]: a single spiked day corrupts a
    * trailing mean/stddev baseline but not a median/MAD one — the
    * monitoring query for bursty volumes. Same shape: the window input
    * is the tiny per-day aggregate; each row carries its ≤7-element
    * trailing window as a `collect_list` RANGE frame, and the exact
    * median / MAD come from sorted-array arithmetic on those few
    * integers (HOFs on ≤7 elements — never the raw stream, so the
    * CodegenFallback lambdas cost nothing at any corpus size).
    *
    * Both engines compute the median as s[(m+1)/2] (odd) or the mean
    * of the two middle elements (even) — each index division is exact
    * in its branch, so Spark's truncating cast and DuckDB's rounding
    * cast cannot diverge. Flags compare UNROUNDED doubles derived
    * from identical integers: bitwise-stable.
    */
  def evMad(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = StreamingStats.events(spark, sfDir)
      .groupBy(col("event_type"),
        unix_date(to_date(col("ts"))).as("day_num"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-AnomalyBaselineDays, -1)
    def medianOf(s: Column, m: Column): Column =
      when(m === 0, lit(null).cast("double"))
        .otherwise(when(m % 2 === 1,
          element_at(s, ((m + 1) / 2).cast("int")).cast("double"))
          .otherwise((element_at(s, (m / 2).cast("int")) +
            element_at(s, (m / 2).cast("int") + 1)).cast("double") / 2.0))
    val stats = daily
      .withColumn("s", array_sort(collect_list(col("n")).over(w)))
      .withColumn("cnt", size(col("s")))
      .withColumn("med", medianOf(col("s"), col("cnt")))
      .withColumn("devs",
        array_sort(transform(col("s"), v => abs(v - col("med")))))
      .withColumn("mad", medianOf(col("devs"), col("cnt")))
    val defined = col("cnt") >= AnomalyMinBaseline && col("mad") > 0.0
    stats.select(
      col("event_type"),
      date_from_unix_date(col("day_num")).cast("string").as("day"),
      col("n").as("n_events"),
      col("cnt").cast("long").as("baseline_days"),
      r6(col("med")).as("baseline_median"),
      r6(col("mad")).as("baseline_mad"),
      coalesce(
        when(defined,
          abs(col("n").cast("double") - col("med")) > lit(MadK) * col("mad")),
        lit(false)).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  lazy val evMadSql: String = {
    def medianOf(s: String, m: String): String = s"""
      CASE WHEN $m = 0 THEN NULL
        WHEN $m % 2 = 1 THEN CAST($s[CAST(($m + 1) / 2 AS INTEGER)] AS DOUBLE)
        ELSE CAST($s[CAST($m / 2 AS INTEGER)] + $s[CAST($m / 2 AS INTEGER) + 1]
          AS DOUBLE) / CAST(2.0 AS DOUBLE) END"""
    val defined = s"(cnt >= $AnomalyMinBaseline AND mad > CAST(0.0 AS DOUBLE))"
    s"""
WITH daily AS (
  SELECT event_type,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_num,
    COUNT(*) AS n
  FROM events GROUP BY 1, 2
), lists AS (
  SELECT event_type, day_num, n,
    list_sort(COALESCE(list(n) OVER (PARTITION BY event_type
      ORDER BY day_num
      RANGE BETWEEN $AnomalyBaselineDays PRECEDING AND 1 PRECEDING), []))
      AS s
  FROM daily
), sized AS (
  SELECT *, CAST(len(s) AS INTEGER) AS cnt FROM lists
), meds AS (
  SELECT *, ${medianOf("s", "cnt")} AS med FROM sized
), devd AS (
  SELECT *, list_sort(list_transform(s, v -> abs(v - med))) AS devs
  FROM meds
), mads AS (
  SELECT *, ${medianOf("devs", "cnt")} AS mad FROM devd
)
SELECT event_type,
  CAST(DATE '1970-01-01' + day_num AS VARCHAR) AS day,
  n AS n_events,
  CAST(cnt AS BIGINT) AS baseline_days,
  ${graft.functions.Determinism.r6Sql("med")} AS baseline_median,
  ${graft.functions.Determinism.r6Sql("mad")} AS baseline_mad,
  COALESCE(CASE WHEN $defined THEN
    abs(CAST(n AS DOUBLE) - med) > CAST($MadK AS DOUBLE) * mad END, false)
    AS is_anomaly
FROM mads ORDER BY event_type, day"""
  }

  // ------------------------------------------------------------------
  // ev_forecast — seasonal-naive forecast backtest
  // ------------------------------------------------------------------

  /** Seasonal-naive backtest: each (type, day)'s forecast is the same
    * weekday's count one week earlier, with per-day absolute and
    * percentage errors — the baseline every capacity forecast must
    * beat, as a reproducible query. The week-ago value is a
    * RANGE(-7,-7) window sum (NOT lag(7): days can be missing, and a
    * row-offset lag would silently read the wrong day). Same bounded
    * per-day window input as [[evRolling]]; errors are integer or
    * integer-derived doubles — parallelism-stable.
    */
  def evForecast(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = StreamingStats.events(spark, sfDir)
      .groupBy(col("event_type"),
        unix_date(to_date(col("ts"))).as("day_num"))
      .agg(count(lit(1)).as("n"))
    val wk = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-7, -7)
    daily
      .withColumn("n_hat", sum(col("n")).over(wk))
      .select(
        col("event_type"),
        date_from_unix_date(col("day_num")).cast("string").as("day"),
        col("n").as("n_events"),
        col("n_hat").as("forecast"),
        abs(col("n") - col("n_hat")).as("abs_err"),
        when(col("n_hat") > 0, r6(
          abs(col("n") - col("n_hat")).cast("double") / col("n_hat")))
          .as("pct_err"))
      .orderBy(col("event_type"), col("day"))
  }

  lazy val evForecastSql: String = s"""
WITH daily AS (
  SELECT event_type,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_num,
    COUNT(*) AS n
  FROM events GROUP BY 1, 2
), f AS (
  SELECT event_type, day_num, n,
    SUM(n) OVER (PARTITION BY event_type ORDER BY day_num
      RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS n_hat
  FROM daily
)
SELECT event_type,
  CAST(DATE '1970-01-01' + day_num AS VARCHAR) AS day,
  n AS n_events,
  CAST(n_hat AS BIGINT) AS forecast,
  CAST(abs(n - n_hat) AS BIGINT) AS abs_err,
  CASE WHEN n_hat > 0 THEN
    ${graft.functions.Determinism.r6Sql("(CAST(abs(n - n_hat) AS DOUBLE) / n_hat)")}
  END AS pct_err
FROM f ORDER BY event_type, day"""

  // ------------------------------------------------------------------
  // ev_active_users — DAU / trailing-7-day WAU / stickiness
  // ------------------------------------------------------------------

  /** Daily and trailing-7-day active users with the DAU/WAU
    * stickiness ratio — the growth metric every event pipeline
    * publishes. Spark windows cannot COUNT(DISTINCT) over a RANGE
    * frame; the scalable shape is the offset-explode: distinct
    * user-days first (partial-agg distinct — the shuffle carries one
    * row per user-day, not per event), each user-day then votes for
    * the 7 target days its activity keeps "weekly active"
    * (explode ×7, bounded), and WAU is a COUNT(DISTINCT user) per
    * target day. Shuffle ∝ 7 × user-days — never events, never a
    * per-user window.
    */
  def evActiveUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = StreamingStats.events(spark, sfDir)
      .select(col("user_id"), unix_date(to_date(col("ts"))).as("day_num"))
      .distinct()
    val dau = ud.groupBy(col("day_num"))
      .agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day_num"), col("day_num") + 6)).as("td"))
      .groupBy(col("td"))
      .agg(countDistinct(col("user_id")).as("wau7"))
    dau.join(wau, dau("day_num") === wau("td"))
      .select(
        date_from_unix_date(col("day_num")).cast("string").as("day"),
        col("dau"), col("wau7"),
        r6(col("dau").cast("double") / col("wau7")).as("stickiness"))
      .orderBy(col("day"))
  }

  lazy val evActiveUsersSql: String = s"""
WITH ud AS (
  SELECT DISTINCT user_id,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_num
  FROM events
), dau AS (
  SELECT day_num, COUNT(*) AS dau FROM ud GROUP BY day_num
), votes AS (
  SELECT ud.user_id, ud.day_num + r.off AS td
  FROM ud, range(0, 7) r(off)
), wau AS (
  SELECT td, COUNT(DISTINCT user_id) AS wau7 FROM votes GROUP BY td
)
SELECT CAST(DATE '1970-01-01' + dau.day_num AS VARCHAR) AS day,
  dau.dau, wau.wau7,
  ${graft.functions.Determinism.r6Sql("(CAST(dau.dau AS DOUBLE) / wau.wau7)")}
    AS stickiness
FROM dau JOIN wau ON wau.td = dau.day_num
ORDER BY day"""

  // ------------------------------------------------------------------
  // ev_paths — top event-sequence trigrams (path analysis)
  // ------------------------------------------------------------------

  /** How many path rows to report. */
  val PathTopK = 25

  /** Most common 3-step event-type sequences across user journeys —
    * the "what do users do next" product-analytics query, and the
    * event-stream cousin of [[TextAnalysis.taColloc]]'s bigram mining.
    *
    * Shape: ONE shuffle on user_id serves both lead() steps (same
    * window partitioning), trigram rows partial-agg to an
    * event-type³-bounded table, and the global top-k orders that tiny
    * aggregate — never the event stream. Ordering within a user is
    * (ts, event_id): a total order, so lead() is deterministic under
    * any parallelism (ts alone ties on same-second events). Ranking
    * ties break lexicographically on the path — counts are integers,
    * nothing float-ordered (the ta_colloc rule).
    */
  def evPaths(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = StreamingStats.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(byUser))
      .withColumn("e3", lead(col("event_type"), 2).over(byUser))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
    val counts = steps
      .groupBy(col("event_type").as("s1"), col("e2").as("s2"),
        col("e3").as("s3"))
      .agg(count(lit(1)).as("n_paths"))
    val w = Window.orderBy(col("n_paths").desc, col("s1"), col("s2"),
      col("s3"))
    counts
      .orderBy(col("n_paths").desc, col("s1"), col("s2"), col("s3"))
      .limit(PathTopK)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"),
        concat_ws(" > ", col("s1"), col("s2"), col("s3")).as("path"),
        col("n_paths"))
      .orderBy(col("rank"))
  }

  lazy val evPathsSql: String = s"""
WITH steps AS (
  SELECT event_type AS s1,
    lead(event_type, 1) OVER w AS s2,
    lead(event_type, 2) OVER w AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), paths AS (
  SELECT s1, s2, s3, COUNT(*) AS n_paths
  FROM steps WHERE s2 IS NOT NULL AND s3 IS NOT NULL
  GROUP BY s1, s2, s3
), ranked AS (
  SELECT s1, s2, s3, n_paths,
    row_number() OVER (ORDER BY n_paths DESC, s1, s2, s3) AS rank
  FROM paths
)
SELECT CAST(rank AS INTEGER) AS rank,
  s1 || ' > ' || s2 || ' > ' || s3 AS path, n_paths
FROM ranked WHERE rank <= $PathTopK ORDER BY rank"""

  // ------------------------------------------------------------------
  // ev_topk — top-k events per group via the CUSTOM physical operator
  // ------------------------------------------------------------------

  /** Rows kept per (event_type, day). */
  val TopKPerDay = 5

  /** The k highest-value events per (event_type, day) — executed by
    * the custom [[graft.plans.TopKPerGroup]] plan (logical node →
    * strategy → partial+final bounded-heap execs): the shuffle
    * carries ≤ k·groups rows per input partition and NO sort or
    * Window operator runs anywhere — Spark's own WindowGroupLimit
    * matches the shuffle bound but pays two full sorts + the Window
    * rank machinery (see plans/TopKPerGroup.scala; TopKSpec measures
    * the shuffle-row bound and pins equality with the declarative
    * window form; this oracle row hash-verifies the operator
    * end-to-end). Order is (cents DESC, event_id) — total, so ranks
    * are deterministic; cents (exact long) is the published value
    * column, the engine-wide float posture.
    */
  def evTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = StreamingStats.events(spark, sfDir)
      .select(col("event_type"),
        to_date(col("ts")).cast("string").as("day"),
        col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
    graft.plans.TopK.perGroup(ev, Seq("event_type", "day"),
        Seq("cents" -> true, "event_id" -> false), TopKPerDay)
      .select(col("event_type"), col("day"), col("rank"),
        col("event_id"), col("user_id"), col("cents"))
      .orderBy(col("event_type"), col("day"), col("rank"))
  }

  lazy val evTopkSql: String = s"""
WITH e AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
    event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type, day ORDER BY cents DESC, event_id) AS rank
  FROM e
)
SELECT event_type, day, CAST(rank AS INTEGER) AS rank,
  event_id, user_id, cents
FROM r WHERE rank <= $TopKPerDay ORDER BY event_type, day, rank"""

  // ------------------------------------------------------------------
  // ev_gaps — inter-arrival gap distribution per event type
  // ------------------------------------------------------------------

  /** Per-type inter-arrival profile: for each user's consecutive events
    * of the same type, the time gap — exact integer-microsecond mean
    * numerator and rank-ceil p50/p90 (the [[ExactRank]] rule, shared
    * with funnel-time/sessions/outliers). The cadence readout behind
    * retention windows and watermark sizing: a p90 gap near the
    * session gap means the sessionizer is splitting real visits.
    *
    * Shape: one exchange on (user_id, event_type) for the lag, one
    * partial-agg'd exchange of (type, gap, count) rows, then rank +
    * totals share the SAME per-type window partitioning (a separate
    * totals branch would re-run the lag subtree — the
    * duplicate-subtree trap). The quantile relation is bounded by
    * distinct gap values per type, not by events. Gap moments sum in
    * decimal(38,0) (a BIGINT micros sum overflows ~1e12 events×days).
    */
  def evGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = StreamingStats.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1)
          .over(byUserType)))
      .filter(col("gap_us").isNotNull)
    val g = gaps.groupBy(col("event_type"), col("gap_us"))
      .agg(count(lit(1)).as("cnt"))
    val byType = Window.partitionBy(col("event_type"))
    val cum = byType.orderBy(col("gap_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = byType
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n_gaps", sum(col("cnt")).over(full))
      .withColumn("sum_gap_us",
        sum((col("gap_us") * col("cnt")).cast("decimal(38,0)")).over(full))
      .withColumn("max_gap_us", max(col("gap_us")).over(full))
      .groupBy(col("event_type"))
      .agg(
        min(col("n_gaps")).as("n_gaps"),
        r6(min(col("sum_gap_us")).cast("double") / min(col("n_gaps")) /
          1000000.0).as("mean_gap_sec"),
        ExactRank.valueAt(1, 2, "n_gaps", col("gap_us")).as("p50_gap_us"),
        ExactRank.valueAt(9, 10, "n_gaps", col("gap_us")).as("p90_gap_us"),
        min(col("max_gap_us")).as("max_gap_us"))
      .orderBy(col("event_type"))
  }

  lazy val evGapsSql: String = s"""
WITH gaps AS (
  SELECT event_type,
    epoch_us(ts) - epoch_us(lag(ts) OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap_us
  FROM events
), gg AS (
  SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL
), g AS (
  SELECT event_type, gap_us, COUNT(*) AS cnt FROM gg GROUP BY 1, 2
), cw AS (
  SELECT event_type, gap_us, cnt,
    SUM(cnt) OVER (PARTITION BY event_type ORDER BY gap_us
      ROWS UNBOUNDED PRECEDING) AS cum,
    SUM(cnt) OVER (PARTITION BY event_type) AS n_gaps,
    SUM(gap_us * cnt) OVER (PARTITION BY event_type) AS sum_gap_us,
    MAX(gap_us) OVER (PARTITION BY event_type) AS max_gap_us
  FROM g
)
SELECT event_type,
  CAST(MIN(n_gaps) AS BIGINT) AS n_gaps,
  ${r6Sql("(CAST(MIN(sum_gap_us) AS DOUBLE) / MIN(n_gaps) / 1000000.0)")}
    AS mean_gap_sec,
  ${ExactRank.valueAtSql(1, 2, "n_gaps", "gap_us")} AS p50_gap_us,
  ${ExactRank.valueAtSql(9, 10, "n_gaps", "gap_us")} AS p90_gap_us,
  MIN(max_gap_us) AS max_gap_us
FROM cw GROUP BY event_type ORDER BY event_type"""

  // ------------------------------------------------------------------
  // ev_rfm — recency/frequency/monetary user segmentation
  // ------------------------------------------------------------------

  /** Bucket boundaries, set near the fixture's per-user quartiles so
    * every axis discriminates: recency ≤ 0 / ≤ 1 days since the corpus
    * anchor (its max event day — a data-derived anchor keeps the
    * segmentation reproducible, unlike wall-clock now()); frequency
    * ≥ 70 / ≥ 60 events; monetary ≥ 70000 / ≥ 45000 integer cents of
    * purchases. 3 = best.
    */
  val RfmRecencyDays: (Int, Int) = (0, 1)
  val RfmFreq: (Long, Long) = (70L, 60L)
  val RfmCents: (Long, Long) = (70000L, 45000L)

  /** The classic RFM segmentation rolled up to segment counts: every
    * user lands in an (r, f, m) bucket triple from exact integers —
    * days since last event vs the corpus anchor, event count, integer
    * purchase cents (the [[StreamingStats.sumCents]] rounding rule, one
    * copy) — and the output is the ≤27-row segment census a campaign
    * or cohort decision reads.
    *
    * Shape: one partial-agg'd groupBy(user), the anchor as a
    * full-frame window over the per-user rows (bounded by users, no
    * second scan — the duplicate-subtree rule), then a constant-size
    * roll-up. Nothing downstream scales with events.
    */
  def evRfm(spark: SparkSession, sfDir: String): DataFrame = {
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val perUser = StreamingStats.events(spark, sfDir)
      .select(col("user_id"), unix_date(to_date(col("ts"))).as("day"),
        col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(
        max(col("day")).as("last_day"),
        count(lit(1)).as("freq"),
        coalesce(sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long"))), lit(0L)).as("cents"))
      .withColumn("anchor", max(col("last_day")).over(whole))
      .withColumn("recency_days", col("anchor") - col("last_day"))
    perUser
      .withColumn("r_bucket",
        when(col("recency_days") <= RfmRecencyDays._1, 3)
          .when(col("recency_days") <= RfmRecencyDays._2, 2).otherwise(1))
      .withColumn("f_bucket",
        when(col("freq") >= RfmFreq._1, 3)
          .when(col("freq") >= RfmFreq._2, 2).otherwise(1))
      .withColumn("m_bucket",
        when(col("cents") >= RfmCents._1, 3)
          .when(col("cents") >= RfmCents._2, 2).otherwise(1))
      .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("freq")).as("sum_events"),
        sum(col("cents")).as("total_cents"))
      .orderBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
  }

  lazy val evRfmSql: String = s"""
WITH per_user AS (
  SELECT user_id,
    MAX(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER)) AS last_day,
    COUNT(*) AS freq,
    COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT),
      CAST(0 AS BIGINT)) AS cents
  FROM events GROUP BY user_id
), anchored AS (
  SELECT *, MAX(last_day) OVER () AS anchor FROM per_user
), b AS (
  SELECT
    CASE WHEN anchor - last_day <= ${RfmRecencyDays._1} THEN 3
         WHEN anchor - last_day <= ${RfmRecencyDays._2} THEN 2
         ELSE 1 END AS r_bucket,
    CASE WHEN freq >= ${RfmFreq._1} THEN 3
         WHEN freq >= ${RfmFreq._2} THEN 2 ELSE 1 END AS f_bucket,
    CASE WHEN cents >= ${RfmCents._1} THEN 3
         WHEN cents >= ${RfmCents._2} THEN 2 ELSE 1 END AS m_bucket,
    freq, cents
  FROM anchored
)
SELECT r_bucket, f_bucket, m_bucket,
  COUNT(*) AS n_users,
  CAST(SUM(freq) AS BIGINT) AS sum_events,
  CAST(SUM(cents) AS BIGINT) AS total_cents
FROM b GROUP BY r_bucket, f_bucket, m_bucket
ORDER BY r_bucket, f_bucket, m_bucket"""

  // ------------------------------------------------------------------
  // ev_coverage — per-type day-coverage / silent-gap audit
  // ------------------------------------------------------------------

  /** Did every day actually report? Per event type: first/last day,
    * calendar span, days with data, and days silently MISSING inside
    * the span — the pipeline-health readout that catches a feed that
    * stopped for a week (a daily-counts chart shows gaps only if
    * someone looks). Missing days are pure arithmetic
    * (span − present) on the types×days relation — no calendar
    * scaffold ever materializes.
    */
  def evCoverage(spark: SparkSession, sfDir: String): DataFrame =
    StreamingStats.events(spark, sfDir)
      .groupBy(col("event_type"),
        unix_date(to_date(col("ts"))).as("day_num"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(
        min(col("day_num")).as("mn"),
        max(col("day_num")).as("mx"),
        count(lit(1)).as("days_present"),
        sum(col("n")).as("n_events"),
        min(col("n")).as("min_day_events"))
      .select(col("event_type"),
        date_from_unix_date(col("mn")).cast("string").as("first_day"),
        date_from_unix_date(col("mx")).cast("string").as("last_day"),
        (col("mx") - col("mn") + 1).cast("long").as("span_days"),
        col("days_present"),
        ((col("mx") - col("mn") + 1).cast("long") - col("days_present"))
          .as("days_missing"),
        col("n_events"), col("min_day_events"))
      .orderBy(col("event_type"))

  lazy val evCoverageSql: String = """
WITH daily AS (
  SELECT event_type,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_num,
    COUNT(*) AS n
  FROM events GROUP BY 1, 2
), g AS (
  SELECT event_type, MIN(day_num) AS mn, MAX(day_num) AS mx,
    COUNT(*) AS days_present,
    CAST(SUM(n) AS BIGINT) AS n_events,
    MIN(n) AS min_day_events
  FROM daily GROUP BY event_type
)
SELECT event_type,
  CAST(DATE '1970-01-01' + mn AS VARCHAR) AS first_day,
  CAST(DATE '1970-01-01' + mx AS VARCHAR) AS last_day,
  CAST(mx - mn + 1 AS BIGINT) AS span_days,
  days_present,
  CAST(mx - mn + 1 AS BIGINT) - days_present AS days_missing,
  n_events, min_day_events
FROM g ORDER BY event_type"""

  // ------------------------------------------------------------------
  // ev_value_tiers — dense_rank value tiers on the custom TopK plan
  // ------------------------------------------------------------------

  /** Distinct value tiers kept per event type. */
  val TierK = 3

  /** Every event at one of its type's top-[[TierK]] DISTINCT cent
    * values — "the three best price points and everything that hit
    * them", the value-tier leaderboard `row_number`/`rank` cannot
    * express (they bound ROWS, not VALUES). Runs on the custom
    * [[graft.plans.TopKPerGroup]] operator in its `dense_rank` mode
    * (fourth oracle-hashed query through the custom plan, third rank
    * semantics); the oracle's DENSE_RANK window form hash-verifies the
    * whole mode end-to-end.
    */
  def evValueTiers(spark: SparkSession, sfDir: String): DataFrame = {
    val base = StreamingStats.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
    graft.plans.TopK.perGroupDenseRank(base, Seq("event_type"),
        Seq("cents" -> true), TierK)
      .select(col("event_type"), col("rank"), col("cents"),
        col("event_id"), col("user_id"))
      .orderBy(col("event_type"), col("rank"), col("event_id"))
  }

  lazy val evValueTiersSql: String = s"""
WITH base AS (
  SELECT event_type, event_id, user_id,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT *, dense_rank() OVER (
    PARTITION BY event_type ORDER BY cents DESC) AS rank
  FROM base
)
SELECT event_type, CAST(rank AS INTEGER) AS rank, cents,
  event_id, user_id
FROM r WHERE rank <= $TierK
ORDER BY event_type, rank, event_id"""

  // ------------------------------------------------------------------
  // ev_markov — first-order event-type transition matrix
  // ------------------------------------------------------------------

  /** The 1-step Markov view [[evPaths]]' top-k trigrams summarize:
    * per (from → to) event-type pair, the transition count and row
    * probability P(to | from). The full ≤types² matrix — journey
    * modeling, anomaly baselines, and the sanity check behind any
    * sequence feature.
    *
    * Shape: one (user) window for the lead, one partial-agg'd
    * (from, to) groupBy; the row-marginal is a full-frame window per
    * `from` over the matrix relation itself (types²-bounded, no second
    * pass over events).
    */
  def evMarkov(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val fromTotal = Window.partitionBy(col("from_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    StreamingStats.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("from_total", sum(col("n")).over(fromTotal))
      .select(col("from_type"), col("to_type"), col("n"), col("from_total"),
        r6(col("n").cast("double") / col("from_total")).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  lazy val evMarkovSql: String = s"""
WITH steps AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS to_type
  FROM events
), m AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM steps WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
  ${r6Sql("(CAST(n AS DOUBLE) / (SUM(n) OVER (PARTITION BY from_type)))")}
    AS p
FROM m ORDER BY from_type, to_type"""

  // ------------------------------------------------------------------
  // ev_type_overlap — cross-type user co-occurrence (adoption matrix)
  // ------------------------------------------------------------------

  /** Which event types share users: for each unordered type pair, the
    * distinct users doing BOTH, each side's audience, and the Jaccard
    * overlap — the unordered co-adoption matrix ([[evMarkov]] and
    * [[evFunnel]] are its ordered siblings; this one answers "do
    * searchers also purchase AT ALL", order-free). Pairs nobody
    * shares are absent (observed co-occurrence, not a scaffold).
    *
    * Shape: ONE distinct pass to the (user, type) relation (bounded
    * by users × type vocabulary), a self-equi-join on user_id whose
    * per-user fan-out is ≤ types², and a types²-row aggregate — no
    * window, no cartesian, corpus size only touches the first
    * distinct.
    */
  def evTypeOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val ut = StreamingStats.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct()
    val totals = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nu"))
    val both = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("users_both"))
    both
      .join(totals.select(col("event_type").as("type_a"),
        col("nu").as("users_a")), "type_a")
      .join(totals.select(col("event_type").as("type_b"),
        col("nu").as("users_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("users_both"),
        col("users_a"), col("users_b"),
        r6(col("users_both").cast("double") /
          (col("users_a") + col("users_b") - col("users_both")))
          .as("jaccard"))
      .orderBy(col("type_a"), col("type_b"))
  }

  lazy val evTypeOverlapSql: String = s"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), t AS (
  SELECT event_type, COUNT(*) AS nu FROM ut GROUP BY event_type
), p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    COUNT(*) AS users_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.users_both,
  ta.nu AS users_a, tb.nu AS users_b,
  ${r6Sql("(CAST(p.users_both AS DOUBLE) / " +
      "(ta.nu + tb.nu - p.users_both))")} AS jaccard
FROM p
JOIN t ta ON ta.event_type = p.type_a
JOIN t tb ON tb.event_type = p.type_b
ORDER BY type_a, type_b"""

  // ------------------------------------------------------------------
  // ev_cusum — integer-exact CUSUM change-point per event type
  // ------------------------------------------------------------------

  /** CUSUM change-point detection on daily volumes: for each event
    * type, the cumulative deviation of observed counts from a
    * constant-rate model peaks at the most likely rate-change day.
    * `ev_anomaly`/`ev_mad` flag single outlier DAYS against a trailing
    * baseline; this finds the LEVEL SHIFT those baselines silently
    * absorb — the "did the feed change on day X" readout.
    *
    * Determinism posture: with D days in the type's active range and
    * T total events, S_k = D·cum_k − k·T is INTEGER-exact (the mean
    * rate T/D never materializes as a float); the peak |S_k| and its
    * earliest day are integer comparisons, and `cusum` =
    * max|S_k|/(D·T) = max_k |cum_k/T − k/D| — the KS distance of the
    * event-time distribution from uniform — takes one final r6'd
    * division. D·T fits int64 through ~10^14 events×days; both
    * engines widen identically beyond (HUGEINT / decimal if ever
    * needed).
    *
    * Scale shape: one partial-agg'd shuffle of (type, day) counts —
    * the same tiny relation every ev_* monitor rides — then a
    * per-type day scaffold (missing days MUST count 0 or a silent
    * feed outage hides from the statistic), one window pass, and a
    * peak join all bounded by types × days, never by events.
    */
  def evCusum(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = StreamingStats.events(spark, sfDir)
      .groupBy(col("event_type"),
        unix_date(to_date(col("ts"))).as("day_num"))
      .agg(count(lit(1)).as("n"))
    val bounds = daily.groupBy(col("event_type"))
      .agg(min(col("day_num")).as("mn"), max(col("day_num")).as("mx"),
        sum(col("n")).as("total"))
    val scaffold = bounds.select(col("event_type"), col("mn"), col("mx"),
      col("total"), explode(sequence(col("mn"), col("mx"))).as("day_num"))
    val full = scaffold.join(daily, Seq("event_type", "day_num"), "left")
      .select(col("event_type"), col("mn"), col("mx"), col("total"),
        col("day_num"), coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
    val dev = full
      .select(col("event_type"), (col("mx") - col("mn") + 1).as("n_days"),
        col("total"), col("day_num"), col("mn"),
        sum(col("n")).over(w).as("cum"))
      .select(col("event_type"), col("n_days"), col("total"), col("day_num"),
        abs(col("n_days") * col("cum") -
          (col("day_num") - col("mn") + 1) * col("total")).as("dev"))
    val peaks = dev.groupBy(col("event_type"))
      .agg(max(col("n_days")).as("n_days"), max(col("total")).as("total"),
        max(col("dev")).as("peak_dev"))
    dev.select(col("event_type"), col("day_num"), col("dev"))
      .join(peaks, Seq("event_type"))
      .filter(col("dev") === col("peak_dev"))
      .groupBy(col("event_type"), col("n_days"), col("total"),
        col("peak_dev"))
      .agg(min(col("day_num")).as("cd"))
      .select(col("event_type"), col("n_days").cast("int").as("n_days"),
        col("total"), col("peak_dev"),
        date_from_unix_date(col("cd")).cast("string").as("change_day"),
        r6(col("peak_dev").cast("double") /
          (col("n_days").cast("double") * col("total"))).as("cusum"))
      .orderBy(col("event_type"))
  }

  lazy val evCusumSql: String = s"""
WITH daily AS (
  SELECT event_type,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_num,
    COUNT(*) AS n
  FROM events GROUP BY 1, 2
), b AS (
  SELECT event_type, MIN(day_num) AS mn, MAX(day_num) AS mx,
    CAST(SUM(n) AS BIGINT) AS total
  FROM daily GROUP BY 1
), scaf AS (
  SELECT b.event_type, b.mn, b.mx, b.total,
    unnest(generate_series(b.mn, b.mx)) AS day_num
  FROM b
), filled AS (
  SELECT s.event_type, s.mn, s.mx, s.total, s.day_num,
    COALESCE(d.n, 0) AS n
  FROM scaf s LEFT JOIN daily d
    ON d.event_type = s.event_type AND d.day_num = s.day_num
), c AS (
  SELECT event_type, (mx - mn + 1) AS n_days, total, day_num,
    ABS((mx - mn + 1) *
        SUM(n) OVER (PARTITION BY event_type ORDER BY day_num)
      - (day_num - mn + 1) * total) AS dev
  FROM filled
), p AS (
  SELECT event_type, MAX(n_days) AS n_days, MAX(total) AS total,
    MAX(dev) AS peak_dev
  FROM c GROUP BY 1
)
SELECT p.event_type, CAST(p.n_days AS INTEGER) AS n_days, p.total,
  CAST(p.peak_dev AS BIGINT) AS peak_dev,
  CAST(DATE '1970-01-01' + CAST(MIN(c.day_num) AS INTEGER) AS VARCHAR)
    AS change_day,
  ${r6Sql("(CAST(p.peak_dev AS DOUBLE) / " +
      "(CAST(p.n_days AS DOUBLE) * p.total))")} AS cusum
FROM p JOIN c ON c.event_type = p.event_type AND c.dev = p.peak_dev
GROUP BY p.event_type, p.n_days, p.total, p.peak_dev
ORDER BY p.event_type"""

  // ------------------------------------------------------------------
  // ev_survival — Kaplan–Meier user-lifetime curve
  // ------------------------------------------------------------------

  /** The conversion event whose first occurrence is the KM "death". */
  val SurvivalEvent = "purchase"

  /** Micro-nat quantum for the KM log-product (the
    * [[graft.operators.TextAnalysis]] `LmScale` discipline).
    */
  val KmScale = 1000000L

  /** Kaplan–Meier product-limit curve of time-to-first-purchase:
    * S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over conversion times (days from a
    * user's first event to their first [[SurvivalEvent]]); users who
    * never convert are right-censored at their last observed day and
    * leave the risk set without a death. `ev_funnel_time` reads the
    * latency distribution of COMPLETED funnels; this is the survival
    * CURVE — "what fraction of users remain unconverted past day t" —
    * with the never-converted handled by censoring instead of being
    * silently dropped (the bias every naive conversion-time average
    * has).
    *
    * Determinism posture: dᵢ/nᵢ come from exact integer counts; each
    * factor's ln quantizes to integer micro-nats (the `ta_ngram_lm`
    * rule: `round(ln((n−d)/n)·KmScale)` — ONE fixed-arity float op
    * per death time), so the running product is an INTEGER cumulative
    * sum — order-free, no float window accumulation on either engine
    * — with one exp at the end, r6'd. A d=n time (risk set wiped out)
    * pins S to exactly 0.0 from there on rather than routing −∞
    * through the quantizer.
    *
    * Scale shape: one partial-agg'd shuffle to (user, first, last,
    * first-conversion) — the `ev_retention` relation — then
    * everything lives on distinct conversion-time values, bounded by
    * the day span. The single-partition windows run over that
    * ≤days-sized relation only (the ev_gaps quantile posture); the
    * 1-row user-total broadcast is the prof_drift pattern.
    */
  def evSurvival(spark: SparkSession, sfDir: String): DataFrame = {
    val days = StreamingStats.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_date(to_date(col("ts"))).as("day"))
    val users = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("f"), max(col("day")).as("l"),
        min(when(col("event_type") === SurvivalEvent, col("day")))
          .as("fp"))
      .select(
        when(col("fp").isNotNull, col("fp") - col("f"))
          .otherwise(col("l") - col("f")).as("t_obs"),
        col("fp").isNull.as("censored"))
    val byT = users.groupBy(col("t_obs"))
      .agg(sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("cns"))
    val totals = byT.agg(sum(col("d") + col("cns")).as("nu"))
    val wOrd = Window.orderBy(col("t_obs"))
    val cumBefore = sum(col("d") + col("cns"))
      .over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    val risk = byT.crossJoin(broadcast(totals))
      .select(col("t_obs"), col("d"), col("cns"),
        (col("nu") - coalesce(cumBefore, lit(0L))).as("n_risk"))
    val lnQ = when(col("d") < col("n_risk"),
      round(log((col("n_risk") - col("d")).cast("double") / col("n_risk")) *
        KmScale).cast("long")).otherwise(lit(0L))
    val cum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val km = risk
      .select(col("t_obs"), col("d"), col("cns"), col("n_risk"),
        lnQ.as("ln_q"),
        when(col("d") === col("n_risk"), 1).otherwise(0).as("wiped"))
      .select(col("t_obs"), col("d"), col("cns"), col("n_risk"),
        sum(col("ln_q")).over(cum).as("cum_q"),
        max(col("wiped")).over(cum).as("dead"))
    km.filter(col("d") > 0)
      .select(col("t_obs").cast("int").as("t_days"),
        col("n_risk"), col("d").as("n_deaths"), col("cns").as("n_censored"),
        r6(when(col("dead") === 1, lit(0.0))
          .otherwise(exp(col("cum_q").cast("double") /
            KmScale.toDouble))).as("survival"))
      .orderBy(col("t_days"))
  }

  lazy val evSurvivalSql: String = s"""
WITH days AS (
  SELECT user_id, event_type,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day
  FROM events
), u AS (
  SELECT user_id, MIN(day) AS f, MAX(day) AS l,
    MIN(CASE WHEN event_type = '$SurvivalEvent' THEN day END) AS fp
  FROM days GROUP BY user_id
), users AS (
  SELECT CASE WHEN fp IS NOT NULL THEN fp - f ELSE l - f END AS t_obs,
    fp IS NULL AS censored
  FROM u
), by_t AS (
  SELECT t_obs,
    SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS d,
    SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS cns
  FROM users GROUP BY t_obs
), tot AS (
  SELECT SUM(d + cns) AS nu FROM by_t
), risk AS (
  SELECT t_obs, d, cns,
    nu - COALESCE(SUM(d + cns) OVER (ORDER BY t_obs
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM by_t CROSS JOIN tot
), km AS (
  SELECT t_obs, d, cns, n_risk,
    SUM(CASE WHEN d < n_risk THEN
        CAST(round(ln(CAST(n_risk - d AS DOUBLE) / n_risk) * $KmScale)
          AS BIGINT) ELSE 0 END)
      OVER (ORDER BY t_obs ROWS UNBOUNDED PRECEDING) AS cum_q,
    MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
      OVER (ORDER BY t_obs ROWS UNBOUNDED PRECEDING) AS dead
  FROM risk
)
SELECT CAST(t_obs AS INTEGER) AS t_days,
  CAST(n_risk AS BIGINT) AS n_risk,
  CAST(d AS BIGINT) AS n_deaths,
  CAST(cns AS BIGINT) AS n_censored,
  ${r6Sql(s"""CASE WHEN dead = 1 THEN CAST(0.0 AS DOUBLE)
    ELSE exp(CAST(cum_q AS DOUBLE) / CAST($KmScale AS DOUBLE)) END""")}
    AS survival
FROM km WHERE d > 0 ORDER BY t_days"""

  // ------------------------------------------------------------------
  // ev_lag_corr — lead–lag cross-correlation between event types
  // ------------------------------------------------------------------

  /** Largest day shift probed (lags 0..MaxLag). */
  val XcorrMaxLag = 7

  /** Lead–lag cross-correlation matrix: for every ordered type pair
    * (a, b) and lag ℓ, the Pearson correlation between a's daily
    * count series and b's series ℓ days later — "do errors on day t
    * predict purchases on day t+ℓ?" `prof_autocorr` reads each
    * series against itself at lag 1; this is the CROSS-series causal
    * screen (the readout behind alert routing and campaign-echo
    * analysis).
    *
    * Series are ZERO-FILLED on the complete global day scaffold —
    * cross-type alignment is meaningless over each type's present
    * days only — so every (pair, lag) correlates the same n = D − ℓ
    * aligned days. Moments are exact decimal(38,0) integers; corr is
    * one final guarded float expression (the q12/prof_autocorr
    * discipline).
    *
    * Scale shape: one partial-agg'd (type, day) shuffle — the shared
    * ev_* monitor relation — then scaffold × lags ≈ types·days·8 tiny
    * rows, self-joined on the shifted day and reduced to
    * types²·lags moment rows. Nothing here scales with events.
    */
  def evLagCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = StreamingStats.events(spark, sfDir)
      .groupBy(col("event_type"),
        unix_date(to_date(col("ts"))).as("day_num"))
      .agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min(col("day_num")).as("mn"),
      max(col("day_num")).as("mx"))
    val scaffold = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"))).as("day_num"))
    val filled = scaffold.join(daily, Seq("event_type", "day_num"), "left")
      .select(col("event_type"), col("day_num"),
        coalesce(col("n"), lit(0L)).as("x"))
    val a = filled
      .select(col("event_type").as("type_a"), col("day_num"),
        col("x").as("xa"))
      .withColumn("lag",
        explode(sequence(lit(0), lit(XcorrMaxLag))))
    val b = filled.select(col("event_type").as("type_b"),
      col("day_num").as("day_b"), col("x").as("xb"))
    a.join(b, col("day_b") === col("day_num") + col("lag"))
      .filter(col("type_a") =!= col("type_b"))
      .select(col("type_a"), col("type_b"), col("lag"),
        col("xa").cast(M).as("xa"), col("xb").cast(M).as("xb"))
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(count(lit(1)).cast(M).as("n"),
        sum(col("xa")).as("sx"), sum(col("xb")).as("sy"),
        sum(col("xa") * col("xa")).as("sxx"),
        sum(col("xb") * col("xb")).as("syy"),
        sum(col("xa") * col("xb")).as("sxy"))
      .select(col("type_a"), col("type_b"), col("lag").cast("int").as("lag"),
        col("n").cast("long").as("n_days"), {
          val num = col("n") * col("sxy") - col("sx") * col("sy")
          val d1 = col("n") * col("sxx") - col("sx") * col("sx")
          val d2 = col("n") * col("syy") - col("sy") * col("sy")
          when(d1 > 0 && d2 > 0, r6(num.cast("double") /
            sqrt(d1.cast("double") * d2.cast("double"))))
            .as("xcorr")
        })
      .orderBy(col("type_a"), col("type_b"), col("lag"))
  }

  lazy val evLagCorrSql: String = s"""
WITH daily AS (
  SELECT event_type,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_num,
    COUNT(*) AS n
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT MIN(day_num) AS mn, MAX(day_num) AS mx FROM daily
), scaffold AS (
  SELECT t.event_type, CAST(u.day_num AS INTEGER) AS day_num
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN (SELECT unnest(generate_series(mn, mx)) AS day_num
              FROM bounds) u
), filled AS (
  SELECT s.event_type, s.day_num, COALESCE(d.n, 0) AS x
  FROM scaffold s LEFT JOIN daily d
    ON d.event_type = s.event_type AND d.day_num = s.day_num
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
    a.x AS xa, b.x AS xb
  FROM filled a
  CROSS JOIN (SELECT unnest(generate_series(0, $XcorrMaxLag)) AS lag) l
  JOIN filled b ON b.day_num = a.day_num + l.lag
    AND b.event_type <> a.event_type
), g AS (
  SELECT type_a, type_b, lag, COUNT(*) AS n,
    SUM(xa) AS sx, SUM(xb) AS sy,
    SUM(xa * xa) AS sxx, SUM(xb * xb) AS syy, SUM(xa * xb) AS sxy
  FROM pairs GROUP BY 1, 2, 3
)
SELECT type_a, type_b, CAST(lag AS INTEGER) AS lag,
  CAST(n AS BIGINT) AS n_days,
  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
    ${r6Sql("(CAST(n * sxy - sx * sy AS DOUBLE) / " +
      "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * " +
      "CAST(n * syy - sy * sy AS DOUBLE)))")} END AS xcorr
FROM g ORDER BY type_a, type_b, lag"""

  // ------------------------------------------------------------------
  // ev_attribution — multi-touch attribution with exact cent allocation
  // ------------------------------------------------------------------

  /** Linear multi-touch attribution over the SAME 30-minute
    * click→purchase window as `ev_range_join`: every purchase's cents
    * split across its prior clicks and rolled up by click day — the
    * marketing readout behind spend decisions. The split is
    * LARGEST-REMAINDER INTEGER allocation, not a float division: with
    * n prior clicks, each gets `cents div n` and the `cents mod n`
    * leftover cents go one each to the most recent clicks
    * (recency-favoring, event_id tie-break). Every allocated unit is
    * an exact cent, the books balance to the cent by construction,
    * and there is NO cross-row float sum to make nondeterministic —
    * the allocation discipline any billing-grade pipeline needs
    * anyway.
    *
    * Scale shape: the pair stream is the shared bucketed [[rangeJoin]]
    * (shuffle ∝ inputs, never the cross product); the two windows
    * partition by purchase id over that pair stream; the rollup is a
    * days-bounded partial agg.
    */
  def evAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = StreamingStats.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id").as("click_id"))
    val byPurchase = Window.partitionBy(col("event_id"))
    val ranked = rangeJoin(purchases, clicks, "user_id",
        RangeLoUs, RangeHiUs, Seq("click_id"))
      .select(col("event_id"), col("cents"), col("click_id"),
        col("r_us"),
        count(lit(1)).over(byPurchase).as("n"),
        row_number().over(byPurchase
          .orderBy(col("r_us").desc, col("click_id"))).as("rk"))
    ranked
      .select(expr("(r_us - pmod(r_us, 86400000000)) div 86400000000")
          .cast("int").as("click_day_num"),
        (expr("cents div n") +
          when(col("rk") <= pmod(col("cents"), col("n")), 1L)
            .otherwise(0L)).as("w"),
        col("event_id"))
      .groupBy(col("click_day_num"))
      .agg(count(lit(1)).as("n_credits"),
        countDistinct(col("event_id")).as("n_purchases"),
        sum(col("w")).as("attributed_cents"))
      .select(date_from_unix_date(col("click_day_num")).cast("string")
          .as("click_day"),
        col("n_credits"), col("n_purchases"), col("attributed_cents"))
      .orderBy(col("click_day"))
  }

  lazy val evAttributionSql: String = s"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS us, event_id AS click_id
  FROM events WHERE event_type = 'click'
), pairs AS (
  SELECT p.event_id, p.cents, c.click_id, c.us AS r_us
  FROM p JOIN c ON c.user_id = p.user_id
    AND c.us >= p.us + $RangeLoUs AND c.us < p.us + $RangeHiUs
), ranked AS (
  SELECT event_id, cents, click_id, r_us,
    COUNT(*) OVER (PARTITION BY event_id) AS n,
    row_number() OVER (PARTITION BY event_id
      ORDER BY r_us DESC, click_id) AS rk
  FROM pairs
), w AS (
  SELECT CAST((r_us - (r_us % 86400000000)) // 86400000000 AS INTEGER)
      AS click_day_num,
    cents // n + (CASE WHEN rk <= cents % n THEN 1 ELSE 0 END) AS w,
    event_id
  FROM ranked
)
SELECT CAST(DATE '1970-01-01' + click_day_num AS VARCHAR) AS click_day,
  COUNT(*) AS n_credits,
  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_purchases,
  CAST(SUM(w) AS BIGINT) AS attributed_cents
FROM w GROUP BY click_day_num ORDER BY click_day"""

  // ------------------------------------------------------------------
  // ev_growth_accounting — new / retained / resurrected / churned
  // ------------------------------------------------------------------

  /** A returning gap ≤ this many days counts as retained; longer is
    * resurrected, and silence past it after a last-active day is the
    * churn event. */
  val GrowthGapDays = 7

  /** Daily growth accounting: every active (user, day) classifies as
    * NEW (first day ever), RETAINED (returned within
    * [[GrowthGapDays]]) or RESURRECTED (returned after a longer
    * silence); a user CHURNS on `last_active + gap + 1` when that day
    * is inside the observed range. The canonical DAU-decomposition
    * behind every growth dashboard — `ev_active_users` counts heads,
    * this explains the CHANGE in heads; all-integer, so hash-exact
    * with no float discipline needed.
    *
    * Scale shape: one partial-agg'd distinct (user, day) pass — the
    * `ev_retention` relation — one per-user lag window, then
    * day-bounded aggregates joined on the complete day scaffold
    * (days with zero events must still report their churn).
    */
  def evGrowthAccounting(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = StreamingStats.events(spark, sfDir)
      .select(col("user_id"), unix_date(to_date(col("ts"))).as("day"))
      .distinct()
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val classed = ud
      .withColumn("prev", lag(col("day"), 1).over(byUser))
      .select(col("day"),
        when(col("prev").isNull, "new")
          .when(col("day") - col("prev") <= GrowthGapDays, "retained")
          .otherwise("resurrected").as("cls"))
    val active = classed.groupBy(col("day"))
      .agg(sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    val bounds = ud.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val churn = ud.groupBy(col("user_id")).agg(max(col("day")).as("l"))
      .select((col("l") + GrowthGapDays + 1).as("day"))
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("mx"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_churned"))
    val scaffold = bounds.select(
      explode(sequence(col("mn"), col("mx"))).as("day"))
    scaffold.join(active, Seq("day"), "left")
      .join(churn, Seq("day"), "left")
      .select(date_from_unix_date(col("day")).cast("string").as("day"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        (coalesce(col("n_new"), lit(0L)) +
          coalesce(col("n_retained"), lit(0L)) +
          coalesce(col("n_resurrected"), lit(0L))).as("n_active"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy(col("day"))
  }

  lazy val evGrowthAccountingSql: String = s"""
WITH ud AS (
  SELECT DISTINCT user_id,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day
  FROM events
), classed AS (
  SELECT day,
    CASE WHEN prev IS NULL THEN 'new'
      WHEN day - prev <= $GrowthGapDays THEN 'retained'
      ELSE 'resurrected' END AS cls
  FROM (SELECT user_id, day,
          lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
        FROM ud)
), active AS (
  SELECT day,
    SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS n_new,
    SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS n_retained,
    SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
      AS n_resurrected
  FROM classed GROUP BY day
), b AS (
  SELECT MIN(day) AS mn, MAX(day) AS mx FROM ud
), churn AS (
  SELECT l + ${GrowthGapDays + 1} AS day, COUNT(*) AS n_churned
  FROM (SELECT user_id, MAX(day) AS l FROM ud GROUP BY user_id)
  CROSS JOIN b
  WHERE l + ${GrowthGapDays + 1} <= mx
  GROUP BY 1
), scaffold AS (
  SELECT CAST(unnest(generate_series(mn, mx)) AS INTEGER) AS day FROM b
)
SELECT CAST(DATE '1970-01-01' + s.day AS VARCHAR) AS day,
  CAST(COALESCE(a.n_new, 0) AS BIGINT) AS n_new,
  CAST(COALESCE(a.n_retained, 0) AS BIGINT) AS n_retained,
  CAST(COALESCE(a.n_resurrected, 0) AS BIGINT) AS n_resurrected,
  CAST(COALESCE(a.n_new, 0) + COALESCE(a.n_retained, 0) +
    COALESCE(a.n_resurrected, 0) AS BIGINT) AS n_active,
  CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
FROM scaffold s
LEFT JOIN active a ON a.day = s.day
LEFT JOIN churn c ON c.day = s.day
ORDER BY s.day"""

  // ------------------------------------------------------------------
  // ev_bot — superhuman-rate user audit
  // ------------------------------------------------------------------

  /** Suspects surfaced by [[evBot]]. */
  val BotTopK = 20

  /** Sub-second repeat threshold (µs). */
  val BotMinGapUs = 1000000L

  /** Volume floor for the bot flag. */
  val BotMinEvents = 50L

  /** Bot/script audit: the [[BotTopK]] users with the most
    * machine-like cadence — ranked by minimum inter-arrival gap (µs),
    * volume-desc, id — with their volume, active days, and median gap;
    * `is_bot` flags sub-second repeats at volume. The traffic-hygiene
    * gate a metrics pipeline runs before trusting ANY per-user
    * statistic upstream of it (a scripted user poisons retention,
    * stickiness and funnel numbers alike).
    *
    * Determinism: gaps are exact integer µs over the total per-user
    * event order (ts, event_id); the median is the [[ExactRank]]
    * rank-ceil selection; the ranking keys are all integers, so the
    * cut at k is engine-identical with no float anywhere but the one
    * r6'd rate. Single-event users carry no cadence signal and are
    * excluded by construction (the gap relation is empty for them).
    *
    * Scale shape: ONE shuffle partitions events by user for the lag
    * window (the ev_sessions posture); the quantile machinery then
    * runs on (user, distinct gap) rows and the final rank plans
    * TakeOrderedAndProject — no global sort materializes.
    */
  def evBot(spark: SparkSession, sfDir: String): DataFrame = {
    val e = StreamingStats.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val stats = e.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      countDistinct(expr("us div 86400000000")).as("n_days"))
    val wU = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val gaps = e.withColumn("prev", lag(col("us"), 1).over(wU))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), (col("us") - col("prev")).as("gap"))
    val gc = gaps.groupBy(col("user_id"), col("gap"))
      .agg(count(lit(1)).as("cnt"))
    val byUser = Window.partitionBy(col("user_id"))
    val q = gc
      .withColumn("cum", sum(col("cnt")).over(byUser.orderBy(col("gap"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ng", sum(col("cnt")).over(byUser
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy(col("user_id"))
      .agg(min(col("gap")).as("min_gap_us"),
        ExactRank.valueAt(1, 2, "ng", col("gap")).as("p50_gap_us"))
    stats.join(q, "user_id")
      .select(col("user_id"), col("n_events"), col("n_days"),
        r6(col("n_events").cast("double") / col("n_days"))
          .as("events_per_day"),
        col("min_gap_us"), col("p50_gap_us"),
        (col("min_gap_us") < BotMinGapUs &&
          col("n_events") >= BotMinEvents).as("is_bot"))
      .orderBy(col("min_gap_us"), col("n_events").desc, col("user_id"))
      .limit(BotTopK)
  }

  lazy val evBotSql: String = s"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
), stats AS (
  SELECT user_id, COUNT(*) AS n_events,
    COUNT(DISTINCT us // 86400000000) AS n_days
  FROM e GROUP BY user_id
), gaps AS (
  SELECT user_id, us - prev AS gap FROM (
    SELECT user_id, us,
      lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
    FROM e
  ) WHERE prev IS NOT NULL
), gc AS (
  SELECT user_id, gap, COUNT(*) AS cnt FROM gaps GROUP BY 1, 2
), cw AS (
  SELECT user_id, gap, cnt,
    SUM(cnt) OVER (PARTITION BY user_id ORDER BY gap
      ROWS UNBOUNDED PRECEDING) AS cum,
    SUM(cnt) OVER (PARTITION BY user_id) AS ng
  FROM gc
), q AS (
  SELECT user_id, MIN(gap) AS min_gap_us,
    ${ExactRank.valueAtSql(1, 2, "ng", "gap")} AS p50_gap_us
  FROM cw GROUP BY user_id
)
SELECT s.user_id, s.n_events, s.n_days,
  ${r6Sql("(CAST(s.n_events AS DOUBLE) / s.n_days)")} AS events_per_day,
  q.min_gap_us, q.p50_gap_us,
  (q.min_gap_us < $BotMinGapUs AND s.n_events >= $BotMinEvents)
    AS is_bot
FROM stats s JOIN q ON q.user_id = s.user_id
ORDER BY q.min_gap_us, s.n_events DESC, s.user_id
LIMIT $BotTopK"""

  // ------------------------------------------------------------------
  // ev_stickiness — DAU/MAU engagement ratio per day
  // ------------------------------------------------------------------

  /** Trailing MAU window span in days (current day + 27 preceding). */
  val MauDays = 27

  /** Daily DAU, trailing-28-day MAU, and the DAU/MAU stickiness ratio
    * on the complete day scaffold — the engagement-frequency readout
    * beside `ev_growth_accounting`'s flow decomposition ("how many of
    * the month's users show up on a given day").
    *
    * MAU is EXACT without a 28× row fan-out or a rolling distinct:
    * each user's presence days collapse into coverage intervals
    * [day, day+27] (consecutive-run merge via the lag-gap rule —
    * the `ev_sessions` idiom at day grain), and each interval becomes
    * two diff-array deltas (+1 at start, −1 past end). The trailing
    * distinct count is then a running sum of deltas over the day
    * scaffold — the classic interval-stabbing reduction, O(intervals)
    * rows instead of O(28·user-days).
    *
    * Determinism: DAU/MAU are exact integers; the ratio is the single
    * r6'd float, NULL-guarded for scaffold days whose trailing window
    * is empty (a >28-day silent gap).
    *
    * Scale shape: one distinct (user, day) partial agg — the
    * ev_growth_accounting relation — then per-user lag windows on
    * presence days, and everything after lives on days-bounded
    * relations (deltas, scaffold, one single-partition running sum
    * over ≤ days rows). Nothing downstream scales with events.
    */
  def evStickiness(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = StreamingStats.events(spark, sfDir)
      .select(col("user_id"), unix_date(to_date(col("ts"))).as("day"))
      .distinct()
    val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
    // a new coverage interval starts when the previous presence day's
    // window [prev, prev+27] no longer reaches this day
    val iv = ud
      .withColumn("brk",
        when(col("day") - lag(col("day"), 1).over(wU) <= MauDays, 0)
          .otherwise(1))
      .withColumn("iid", sum(col("brk")).over(wU))
    val intervals = iv.groupBy(col("user_id"), col("iid"))
      .agg(min(col("day")).as("s"), (max(col("day")) + MauDays).as("e"))
    val deltas = intervals.select(col("s").as("day"), lit(1L).as("d"))
      .unionAll(intervals.select((col("e") + 1).as("day"),
        lit(-1L).as("d")))
      .groupBy(col("day")).agg(sum(col("d")).as("d"))
    val bounds = ud.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val scaffold = bounds
      .select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wDay = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold
      .join(deltas, Seq("day"), "left")
      .join(dau, Seq("day"), "left")
      .withColumn("mau", sum(coalesce(col("d"), lit(0L))).over(wDay))
      .select(
        date_from_unix_date(col("day")).cast("string").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        col("mau"),
        when(col("mau") > 0,
          r6(col("dau").cast("double") / col("mau"))).as("stickiness"))
      .orderBy(col("day"))
  }

  lazy val evStickinessSql: String = s"""
WITH ud AS (
  SELECT DISTINCT user_id,
    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day
  FROM events
), iv AS (
  SELECT user_id, day,
    CASE WHEN day - lag(day) OVER (PARTITION BY user_id ORDER BY day)
      <= $MauDays THEN 0 ELSE 1 END AS brk
  FROM ud
), ivid AS (
  SELECT user_id, day,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY day) AS iid
  FROM iv
), intervals AS (
  SELECT user_id, iid, MIN(day) AS s, MAX(day) + $MauDays AS e
  FROM ivid GROUP BY 1, 2
), deltas AS (
  SELECT day, CAST(SUM(d) AS BIGINT) AS d FROM (
    SELECT s AS day, 1 AS d FROM intervals
    UNION ALL
    SELECT e + 1 AS day, -1 AS d FROM intervals
  ) GROUP BY day
), bounds AS (
  SELECT MIN(day) AS mn, MAX(day) AS mx FROM ud
), scaffold AS (
  SELECT UNNEST(generate_series(mn, mx)) AS day FROM bounds
), dau AS (
  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
), m AS (
  SELECT sc.day,
    COALESCE(dau.dau, 0) AS dau,
    SUM(COALESCE(dl.d, 0)) OVER (ORDER BY sc.day
      ROWS UNBOUNDED PRECEDING) AS mau
  FROM scaffold sc
  LEFT JOIN deltas dl ON dl.day = sc.day
  LEFT JOIN dau ON dau.day = sc.day
)
SELECT CAST(DATE '1970-01-01' + CAST(day AS INTEGER) AS VARCHAR) AS day,
  CAST(dau AS BIGINT) AS dau,
  CAST(mau AS BIGINT) AS mau,
  CASE WHEN mau > 0 THEN
    ${r6Sql("(CAST(dau AS DOUBLE) / mau)")} END AS stickiness
FROM m ORDER BY day"""
}
