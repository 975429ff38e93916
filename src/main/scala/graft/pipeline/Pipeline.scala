package graft.pipeline

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Determinism.r6
import graft.sink.Load
import graft.source.RedditSource
import graft.transform.Enrich

/** The orchestration layer: the reference's `run_pipeline` contract
  * (reference script.py:288-326) with its fail-soft semantics
  * (SURVEY.md §2.14) — each stage guards empty input, each subreddit is
  * isolated (one failure logs and continues, reference script.py:351-353).
  *
  * Stage shape per subreddit:
  *   extract (source fetch) → guard → transform (Enrich, lazy Catalyst
  *   plan) → load posts (K1) → top-10 by score → per-post comment fetch
  *   → load comments (K2) → daily stats agg → upsert (K3).
  *
  * The per-post comment fan-out is driver-side by design, mirroring the
  * API's sequential pagination (reference script.py:310-317); everything
  * else is distributed.
  */
class Pipeline(spark: SparkSession, source: RedditSource, warehouse: String) {

  /** Reproducible replacement for the reference's wall-clock
    * `DATE('now')` filter in the stats stage (SURVEY.md §7.4.4).
    */
  var statsDateRange: Option[(String, String)] = None

  def log(msg: String): Unit =
    Console.err.println(s"[pipeline] $msg")

  /** One subreddit end-to-end; returns the number of posts loaded. */
  def runPipeline(subreddit: String, limit: Int = 50, sort: String = "hot",
      extractComments: Boolean = false, commentLimit: Int = 20,
      topPosts: Int = 10): Try[Long] = Try {
    // E — extract (reference script.py:294)
    val raw = source.fetchPosts(spark, subreddit, limit, sort)
    if (raw.isEmpty) { // P10 guard (reference script.py:296-298)
      log(s"$subreddit: no posts extracted"); 0L
    } else {
      // T — transform (reference script.py:301); lazy column graph,
      // cached before fan-out: four downstream actions (load, count,
      // top-k, stats) must all see ONE extract — a live source would
      // otherwise be re-fetched per action with different results
      val posts = Enrich.enrichPosts(raw)
        .withColumn("extracted_at", Enrich.extractedAt())
        .dropDuplicates("id")
        .cache()
      try {
        // L — load posts (reference script.py:308)
        Load.appendPosts(posts, warehouse)
        val n = posts.count()
        log(s"$subreddit: loaded $n posts")
        if (extractComments) {
          // top-k fan-out (reference script.py:310-317): ids to the
          // driver deliberately — the comment fetch is a sequential API
          // call
          val top = posts.orderBy(col("score").desc, col("id"))
            .limit(topPosts).select(col("id")).collect()
            .map(_.get(0).toString)
          top.foreach { postId =>
            Try {
              val c = source.fetchComments(spark, postId, commentLimit)
              if (!c.isEmpty) {
                Load.appendComments(
                  c.withColumn("extracted_at", Enrich.extractedAt()),
                  warehouse)
              }
            }.failed.foreach(e => log(s"comments for $postId failed: $e"))
          }
        }
        // stats (reference script.py:320 → §2.9) + upsert K3
        Load.upsertStats(dailyStats(posts, subreddit), spark, warehouse)
        n
      } finally posts.unpersist()
    }
  } match {
    case s @ Success(_) => s
    case f @ Failure(e) => // per-subreddit isolation
      log(s"$subreddit: pipeline failed: $e"); f
  }

  /** The §2.9 aggregation over one freshly-extracted batch
    * (reference script.py:264-276).
    */
  def dailyStats(posts: DataFrame, subreddit: String): DataFrame = {
    val inRange = statsDateRange match {
      case Some((from, to)) =>
        posts.filter(col("created_utc") >= lit(from).cast("timestamp") &&
          col("created_utc") < lit(to).cast("timestamp"))
      case None => posts
    }
    inRange.filter(col("subreddit") === subreddit)
      .groupBy(col("subreddit"), to_date(col("created_utc")).as("date"))
      .agg(
        count(lit(1)).as("total_posts"),
        r6(sum(col("score")).cast("double") / count(col("score")))
          .as("avg_score"),
        r6(sum(col("num_comments")).cast("double") / count(col("num_comments")))
          .as("avg_comments"),
        max(col("score")).as("top_post_score"))
  }

  /** The reference's `main()` driver loop (reference script.py:328-356). */
  def runAll(subreddits: Seq[String], limit: Int = 50,
      extractComments: Boolean = true): Map[String, Try[Long]] =
    subreddits.map { sub =>
      sub -> runPipeline(sub, limit, extractComments = extractComments)
    }.toMap
}
