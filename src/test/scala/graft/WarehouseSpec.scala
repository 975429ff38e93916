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

  test("bucketed q09-shaped inner join plans with no input Exchange") {
    Warehouse.materializeBucketed(spark,
      RedditModel.posts(spark, sf()),
      RedditModel.comments(spark, sf()), buckets = 4)
    val q = Warehouse.topCommentersBucketed(spark)
    val plan = q.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a SortMergeJoin:\n$plan")
    assert(!plan.substring(joinIdx).contains("Exchange"),
      s"join inputs must not shuffle:\n$plan")
    // result matches the same computation over the unbucketed reads
    val expect = RedditModel.posts(spark, sf())
      .select(col("id"), col("subreddit"))
      .join(RedditModel.comments(spark, sf())
        .filter(col("author") =!= "[deleted]")
        .select(col("id").as("c_id"), col("post_id"), col("author")),
        col("id") === col("post_id"))
      .groupBy(col("subreddit"), col("author"))
      .agg(count(col("c_id")).as("comment_count"))
      .filter(col("comment_count") >= 3)
      .orderBy(col("subreddit"), col("comment_count").desc, col("author"))
      .collect()
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

  test("salt assignment is deterministic across repartitionings") {
    val posts = RedditModel.posts(spark, sf())
    // the content-derived salt must give the SAME per-(key, salt)
    // partials no matter how the input is physically partitioned —
    // the old partition-id salt failed exactly this
    def partials(df: org.apache.spark.sql.DataFrame) =
      Skew.saltedCount(df, "subreddit", salts = 7)
        .orderBy(col("subreddit")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    val saltDist = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("_salt",
          pmod(hash(df.columns.map(col): _*), lit(7)))
        .groupBy(col("subreddit"), col("_salt")).count()
        .orderBy(col("subreddit"), col("_salt")).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(partials(posts) == partials(posts.repartition(13)))
    assert(saltDist(posts) == saltDist(posts.repartition(3)))
  }

  test("materialized posts: q13-style created_utc bound reaches the parquet scan") {
    // SCALE.md's known non-pushdown: over the FIXTURE model,
    // created_utc is derived in the plan, so a range filter cannot
    // reach parquet. Against a materialized posts table the same
    // predicate must push down — this pins that claim.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pushdown_").toString
    RedditModel.posts(spark, sf()).write.mode("overwrite").parquet(dir)
    val mat = spark.read.parquet(dir)
    // a cutoff strictly inside the fixture's date range, so the
    // filtered set is non-empty AND a strict subset
    val Array(lo, hi) = RedditModel.posts(spark, sf())
      .agg(min(col("created_utc")), max(col("created_utc")))
      .head().toSeq.map(_.asInstanceOf[java.time.LocalDateTime]).toArray
    val cut = lo.plusSeconds(
      java.time.Duration.between(lo, hi).getSeconds / 2)
    val q13Shaped = mat
      .filter(col("created_utc") >= lit(cut))
      .select(col("subreddit"), col("score"), col("created_utc"))
    val scan = q13Shaped.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("expected a parquet FileSourceScanExec"))
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(created_utc"),
      s"created_utc bound must reach the scan, got: $pushed")
    // column pruning rides along: the scan reads only the 3 columns
    val readSchema = scan.metadata("ReadSchema")
    assert(Seq("subreddit", "score", "created_utc")
        .forall(readSchema.contains) && !readSchema.contains("title"),
      s"scan must prune to the projected columns, got: $readSchema")
    // and the materialized path computes the same rows as the fixture
    val want = RedditModel.posts(spark, sf())
      .filter(col("created_utc") >= lit(cut))
      .select(col("subreddit"), col("score"), col("created_utc"))
      .collect().map(_.toSeq).toSet
    assert(q13Shaped.collect().map(_.toSeq).toSet == want && want.nonEmpty)
    assert(want.size < mat.count(), "cutoff must be a strict subset")
  }
}
