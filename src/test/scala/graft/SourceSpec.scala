package graft

import java.nio.file.{Files, Paths}

import graft.source.JsonDumpSource

/** The JSON-dump source binding: schema enforcement + sort/limit
  * semantics of the extract contract (S1/S2).
  */
class SourceSpec extends SparkSpec {

  private def writeDump(): (String, String) = {
    val dir = Files.createTempDirectory("graft_dump_")
    val posts = Seq(
      """{"id":"p1","title":"hot one","author":"a","subreddit":"r/x","score":50,"upvote_ratio":0.9,"num_comments":10,"created_utc":"2025-01-01T10:00:00.000Z","selftext":"body","url":"u","is_video":false,"is_original_content":true,"over_18":false,"stickied":false,"locked":false}""",
      """{"id":"p2","title":"top one","author":"b","subreddit":"r/x","score":99,"upvote_ratio":0.8,"num_comments":2,"created_utc":"2025-01-02T10:00:00.000Z","selftext":null,"url":"u","is_video":false,"is_original_content":false,"over_18":false,"stickied":false,"locked":false}""",
      """{"id":"p3","title":"other sub","author":"c","subreddit":"r/y","score":5,"upvote_ratio":0.5,"num_comments":1,"created_utc":"2025-01-03T10:00:00.000Z","selftext":"s","url":"u","is_video":true,"is_original_content":false,"over_18":false,"stickied":false,"locked":false}""")
    val comments = Seq(
      """{"id":"c1","post_id":"p1","author":"z","body":"hi","score":3,"created_utc":"2025-01-01T11:00:00.000Z","parent_id":"p1","is_submitter":false}""",
      """{"id":"c2","post_id":"p1","author":"z","body":null,"score":1,"created_utc":"2025-01-01T12:00:00.000Z","parent_id":"p1","is_submitter":false}""")
    val pPath = dir.resolve("posts.json")
    val cPath = dir.resolve("comments.json")
    Files.write(pPath, posts.mkString("\n").getBytes("UTF-8"))
    Files.write(cPath, comments.mkString("\n").getBytes("UTF-8"))
    (pPath.toString, cPath.toString)
  }

  test("fetchPosts filters subreddit, sorts, limits, keeps declared schema") {
    val (p, c) = writeDump()
    val src = new JsonDumpSource(p, c)
    val top = src.fetchPosts(spark, "r/x", 1, "top").collect()
    assert(top.length == 1 && top.head.getAs[String]("id") == "p2")
    val hot = src.fetchPosts(spark, "r/x", 10, "hot").collect()
    assert(hot.map(_.getAs[String]("id")).toSeq == Seq("p1", "p2"))
    // declared types enforced at read
    val df = src.fetchPosts(spark, "r/x", 10, "new")
    assert(df.schema("score").dataType.typeName == "integer")
    assert(df.schema("created_utc").dataType.typeName == "timestamp")
  }

  test("fetchComments drops body-less rows (P9 guard) and limits") {
    val (p, c) = writeDump()
    val src = new JsonDumpSource(p, c)
    val out = src.fetchComments(spark, "p1", 10).collect()
    assert(out.length == 1 && out.head.getAs[String]("id") == "c1")
  }
}
