package graft

import org.apache.spark.sql.functions._
import graft.queries.RefQueries

/** Query-shape tests against the sf0.001 fixture (golden semantics from
  * the reference — SURVEY.md §5.2).
  */
class QueriesSpec extends SparkSpec {

  test("q09 matches the reference golden shape (example.csv:1-18)") {
    val df = RefQueries.q09TopCommenters(spark, sf())
    assert(df.columns.toSeq ==
      Seq("subreddit", "author", "comment_count", "avg_comment_score"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // HAVING >= 3 cutoff holds everywhere
    assert(rows.forall(_.getAs[Long]("comment_count") >= 3))
    // ordered by subreddit asc then comment_count desc
    val bySub = rows.groupBy(_.getAs[String]("subreddit"))
    bySub.values.foreach { g =>
      val counts = g.map(_.getAs[Long]("comment_count")).toSeq
      assert(counts == counts.sortBy(-_))
    }
  }

  test("q02 groupwise-max keeps ties (IN-subquery semantics, J3)") {
    val df = RefQueries.q02TopPosts(spark, sf())
    val perSub = df.groupBy("subreddit").agg(
      countDistinct(col("score")).as("distinct_scores"))
    // every subreddit's rows all share that subreddit's max score
    assert(perSub.collect().forall(_.getAs[Long]("distinct_scores") == 1L))
  }

  test("q15 RANK has ties-share-rank-with-gaps semantics (W1)") {
    val rows = RefQueries.q15PerformanceView(spark, sf())
      .filter(col("subreddit") === "1-URGENT")
      .orderBy(col("rank_in_subreddit"), col("id")).collect()
    val ranks = rows.map(_.getAs[Int]("rank_in_subreddit"))
    assert(ranks.head == 1)
    // rank of row i is i+1 unless tied with predecessor (gap rule)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        if (a.getAs[Int]("score") == b.getAs[Int]("score"))
          assert(a.getAs[Int]("rank_in_subreddit") == b.getAs[Int]("rank_in_subreddit"))
      case _ =>
    }
    // gaps: max rank equals row count only if no ties before it
    assert(ranks.zipWithIndex.forall { case (r, i) => r <= i + 1 })
  }

  test("q08 LEFT JOIN keeps zero-comment groups with count 0 (trap 7.4.7)") {
    val df = RefQueries.q08CommentCoverage(spark, sf())
    assert(df.columns.contains("total_comments"))
    assert(df.count() == 5) // all 5 subreddits present regardless of comments
  }

  test("q04 day_name CASE has no ELSE: all 7 days decode, none null") {
    val rows = RefQueries.q04ByWeekday(spark, sf()).collect()
    assert(rows.length == 7)
    assert(rows.forall(!_.isNullAt(1)))
    assert(rows.map(_.getAs[String]("day_name")).toSeq ==
      Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
        "Saturday", "Sunday"))
  }

  test("entry smoke: flagship daily-stats returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries twin") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o -- q}")
  }
}
