package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.RedditModel
import graft.schema.Schemas

/** Source abstraction for the extract stage (SURVEY.md §2.1 S1/S2).
  *
  * The reference extracts via the live Reddit HTTP API
  * (reference script.py:112-185) — a driver-side fetch by nature (API
  * pagination is sequential and rate-limited, reference script.py:150).
  * The engine therefore models a source as "something that yields a
  * DataFrame of raw posts/comments"; where the rows come from (HTTP,
  * JSON dumps, fixtures) is a binding:
  *
  *  - [[JsonDumpSource]] — offline dumps with the declared schema
  *    enforced at read (the reproducible path; a live PRAW-equivalent
  *    HTTP client would produce exactly these rows).
  *  - [[FixtureSource]] — the deterministic fixture derivation
  *    ([[RedditModel]]), playing the role of the API for tests/bench.
  *  - [[HttpApiSource]] — the live-listing binding with the HTTP
  *    transport injected; production passes a real client, tests pass
  *    a canned fake (no client library exists in this environment).
  */
trait RedditSource {

  /** S1: up to `limit` raw posts of one subreddit, sort ∈ {hot, new,
    * top}. Columns = the 15 extracted fields (reference script.py:131-147).
    */
  def fetchPosts(spark: SparkSession, subreddit: String, limit: Int,
      sort: String): DataFrame

  /** S2: up to `limit` raw comments of one post
    * (reference script.py:159-185).
    */
  def fetchComments(spark: SparkSession, postId: String, limit: Int): DataFrame
}

/** Reads newline-JSON dumps (one file/dir per table) with the declared
  * schema — malformed records become nulls rather than schema drift.
  */
class JsonDumpSource(postsPath: String, commentsPath: String)
    extends RedditSource {

  private def rawPostFields = Schemas.rawPosts.fields.map(_.name)

  override def fetchPosts(spark: SparkSession, subreddit: String, limit: Int,
      sort: String): DataFrame = {
    val raw = spark.read
      .schema(Schemas.rawPosts)
      .json(postsPath)
      .filter(col("subreddit") === subreddit)
    val sorted = sort match {
      case "new" => raw.orderBy(col("created_utc").desc, col("id"))
      case "top" => raw.orderBy(col("score").desc, col("id"))
      // "hot" has no offline definition; engagement is the stand-in
      case _ => raw.orderBy(col("num_comments").desc, col("id"))
    }
    sorted.limit(limit).select(rawPostFields.map(col): _*)
  }

  override def fetchComments(spark: SparkSession, postId: String,
      limit: Int): DataFrame =
    spark.read
      .schema(org.apache.spark.sql.types.StructType(Schemas.comments.fields.dropRight(1)))
      .json(commentsPath)
      .filter(col("post_id") === postId && col("body").isNotNull) // P9 guard
      .orderBy(col("id"))
      .limit(limit)
}

/** The deterministic fixture "API" over the shared TPC-H-ish parquet. */
class FixtureSource(sfDir: String) extends RedditSource {

  override def fetchPosts(spark: SparkSession, subreddit: String, limit: Int,
      sort: String): DataFrame = {
    val raw = RedditModel.rawPosts(spark, sfDir)
      .filter(col("subreddit") === subreddit)
    val sorted = sort match {
      case "new" => raw.orderBy(col("created_utc").desc, col("id"))
      case "top" => raw.orderBy(col("score").desc, col("id"))
      case _ => raw.orderBy(col("num_comments").desc, col("id"))
    }
    sorted.limit(limit)
  }

  override def fetchComments(spark: SparkSession, postId: String,
      limit: Int): DataFrame =
    RedditModel.comments(spark, sfDir)
      .filter(col("post_id").cast("string") === postId &&
        col("body").isNotNull)
      .orderBy(col("id"))
      .limit(limit)
}
