package graft

import org.apache.spark.sql.SparkSession
import graft.model.RedditModel
import graft.operators.{Multimodal, TextAnalysis}
import graft.streaming.StreamingStats

/** SQL surface: registers every engine table as a temp view so a user
  * of the reference — whose analytical workflow is running SQL text
  * against the warehouse (reference analysis.sql:1-184) — can point the
  * same habit at this engine:
  *
  * {{{
  * Catalog.registerAll(spark, sfDir)
  * spark.sql("SELECT subreddit, COUNT(*) FROM posts GROUP BY 1")
  * }}}
  *
  * Views are lazy logical plans — no materialization happens at
  * registration; Catalyst prunes/pushes through them like any subquery.
  */
object Catalog {

  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    RedditModel.posts(spark, sfDir).createOrReplaceTempView("posts")
    RedditModel.comments(spark, sfDir).createOrReplaceTempView("comments")
    TextAnalysis.docs(spark, sfDir).createOrReplaceTempView("documents")
    graft.operators.Dedup.embeddings(spark, sfDir)
      .createOrReplaceTempView("embeddings")
    StreamingStats.events(spark, sfDir).createOrReplaceTempView("events")
    Multimodal.mediaTable(spark, sfDir).createOrReplaceTempView("media")
    graft.sink.Load.createPerformanceView(spark,
      RedditModel.posts(spark, sfDir))
  }
}
