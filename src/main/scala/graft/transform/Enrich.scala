package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The T of the ETL: every derived-column formula of the reference's
  * `transform_data` (reference script.py:187-224), re-expressed as
  * codegen'd Catalyst expressions (`org.apache.spark.sql.functions`).
  * No UDFs anywhere — every transform stays inside whole-stage codegen.
  *
  * Semantics notes (SURVEY.md §2.4, §7.4):
  *  - `title_length` measures the RAW title; the stored title is the
  *    regex-cleaned one (script.py:198 vs :216). Order preserved here.
  *  - `day_of_week` uses the pandas convention Monday=0..Sunday=6
  *    (script.py:204, confirmed by analysis.sql:47-55); Spark's
  *    `weekday()` matches it directly.
  *  - `score_category` reproduces `pd.cut`'s right-closed bins
  *    (-inf,0] (0,10] (10,100] (100,1000] (1000,inf) (script.py:209-213).
  *  - `has_selftext`: pandas `NaN > 0` is False, so a NULL selftext
  *    yields false, not NULL (script.py:200).
  */
object Enrich {

  /** T1/T2 — string length (script.py:198-199). */
  def strLength(c: Column): Column = length(c)

  /** T3 — has_selftext; NULL-safe false like pandas NaN>0 (script.py:200). */
  def hasText(lenCol: Column): Column = coalesce(lenCol > 0, lit(false))

  /** T4 — hour of day (script.py:203). */
  def hourPosted(ts: Column): Column = hour(ts)

  /** T5 — weekday, Monday=0 (script.py:204). Spark `weekday` is already
    * Monday=0..Sunday=6 — do NOT use `dayofweek` (Sunday=1).
    */
  def dayOfWeekMon0(ts: Column): Column = weekday(ts)

  /** T6 — engagement rate with +1 guard (script.py:207). */
  def engagementRate(numComments: Column, score: Column): Column =
    numComments / (score + lit(1.0))

  /** T7 — pd.cut right-closed score bins (script.py:209-213). */
  def scoreCategory(score: Column): Column =
    when(score <= 0, "Negative")
      .when(score <= 10, "Low")
      .when(score <= 100, "Medium")
      .when(score <= 1000, "High")
      .otherwise("Viral")

  /** T8 — strip non-word/non-space chars, then trim (script.py:216).
    * `(?U)` makes Java's `\w` Unicode-aware like Python's re (§7.4.3).
    * ORACLE SEAM: DuckDB's RE2 `\w` is ASCII-only, so the oracle twin
    * (RefOracle posts CTE) agrees with this column only on ASCII
    * titles. The fixture synthesizes ASCII-only titles by construction
    * (RedditModel.rawPosts / RefOracle's posts_raw share the literal
    * templates); EnrichSpec pins that invariant so a fixture change
    * that introduces non-ASCII fails a spec instead of silently
    * hash-mismatching — this Unicode-aware side is the CORRECT
    * (Python-parity) one, pinned by the T8 non-ASCII test.
    */
  def cleanTitle(title: Column): Column =
    trim(regexp_replace(title, "(?U)[^\\w\\s]", ""))

  /** T9 — null selftext → empty string (script.py:217). */
  def fillSelftext(selftext: Column): Column = coalesce(selftext, lit(""))

  /** T10 — null author → '[deleted]' (script.py:134, :172). */
  def authorOrDeleted(author: Column): Column =
    coalesce(author, lit("[deleted]"))

  /** T11 — epoch seconds → timestamp (script.py:139, :175). Session TZ is
    * pinned UTC (deliberate divergence from the reference's local time).
    */
  def epochToTs(epoch: Column): Column = timestamp_seconds(epoch)

  /** T12 — load-time timestamp (script.py:71, :86). */
  def extractedAt(): Column = current_timestamp()

  /** Full post enrichment, in the reference's source order
    * (script.py:196-217). Input: the 15 raw extracted columns.
    */
  def enrichPosts(raw: DataFrame): DataFrame = raw
    .withColumn("title_length", strLength(col("title")))
    .withColumn("selftext_length", strLength(col("selftext")))
    .withColumn("has_selftext", hasText(col("selftext_length")))
    .withColumn("hour_posted", hourPosted(col("created_utc")))
    .withColumn("day_of_week", dayOfWeekMon0(col("created_utc")))
    .withColumn("engagement_rate", engagementRate(col("num_comments"), col("score")))
    .withColumn("score_category", scoreCategory(col("score")))
    // cleaning happens AFTER the length/derivation columns (order matters)
    .withColumn("title", cleanTitle(col("title")))
    .withColumn("selftext", fillSelftext(col("selftext")))
}
