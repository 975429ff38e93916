package graft

import org.apache.spark.sql.functions._
import graft.model.RedditModel
import graft.sink.{Skew, Warehouse}

/** Physical-layout evidence: bucketed co-located joins really drop the
  * shuffle, and salted aggregation preserves results.
  */
class WarehouseSpec extends SparkSpec {

  test("bucketed posts/comments join plans with no input Exchange") {
    Warehouse.materializeBucketed(spark,
      RedditModel.posts(spark, sf()),
      RedditModel.comments(spark, sf()), buckets = 4)
    val q = Warehouse.commentCoverageBucketed(spark)
    val plan = q.queryExecution.executedPlan.toString
    // the join must consume bucket-partitioned scans directly: the only
    // allowed exchanges are the aggregation/order ones ABOVE the join
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a SortMergeJoin:\n$plan")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange"),
      s"join inputs must not shuffle:\n$plan")
    // and the result matches the unbucketed computation
    val expect = RedditModel.posts(spark, sf())
      .select(col("id"), col("subreddit"))
      .join(RedditModel.comments(spark, sf())
        .select(col("id").as("c_id"), col("post_id")),
        col("id") === col("post_id"), "left")
      .groupBy(col("subreddit"))
      .agg(count(col("c_id")).as("total_comments"))
      .orderBy(col("subreddit")).collect()
    assert(q.collect().toSeq == expect.toSeq)
  }

  test("salted aggregation equals direct groupBy count") {
    val posts = RedditModel.posts(spark, sf())
    val direct = posts.groupBy(col("subreddit"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("subreddit")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Skew.saltedCount(posts, "subreddit", salts = 7)
      .orderBy(col("subreddit")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted == direct)
  }
}
