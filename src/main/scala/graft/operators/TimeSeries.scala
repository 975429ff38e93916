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

  /** Exact integer-cent sum — same parallelism-stability contract as
    * [[graft.streaming.StreamingStats]]'s daily stats.
    */
  private def sumCents(c: Column) = sum(round(c * 100).cast("long"))

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

  val evRollingSql: String = s"""
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
}
