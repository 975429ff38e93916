package graft

import java.nio.file.{Files, Paths}

import graft.source.{HttpApiSource, JsonDumpSource}

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

  // ---- HttpApiSource: the live-connector seam, driven by a fake ----

  private def post(id: String, score: Int): String =
    s"""{"kind":"t3","data":{"id":"$id","title":"t-$id","author":"a","subreddit":"python","score":$score,"upvote_ratio":0.9,"num_comments":3,"created_utc":1735725600,"selftext":null,"url":"u","is_video":false,"is_original_content":false,"over_18":false,"stickied":false,"locked":false}}"""

  test("HttpApiSource paginates via the after cursor and honors limit") {
    val calls = scala.collection.mutable.ArrayBuffer
      .empty[(String, Map[String, String])]
    val fake = (url: String, params: Map[String, String]) => {
      calls += ((url, params))
      params.get("after") match {
        case None => // page 1 of 2
          s"""{"kind":"Listing","data":{"after":"t3_p2","children":[${post("p1", 10)},${post("p2", 8)}]}}"""
        case Some("t3_p2") => // final page
          s"""{"kind":"Listing","data":{"after":null,"children":[${post("p3", 5)},${post("p4", 1)}]}}"""
        case other => fail(s"unexpected cursor $other")
      }
    }
    val src = new HttpApiSource(fake)
    val df = src.fetchPosts(spark, "python", 3, "top")
    assert(df.schema.fieldNames.length == 15)
    assert(df.schema("created_utc").dataType.typeName == "timestamp")
    assert(df.collect().map(_.getAs[String]("id")).toSeq ==
      Seq("p1", "p2", "p3")) // limit 3 stops mid-page-2
    assert(calls.length == 2)
    assert(calls.head._1.endsWith("/r/python/top.json"))
    assert(calls.head._2.get("t").contains("day")) // top => top(day)
    assert(calls(1)._2.get("after").contains("t3_p2"))
    // the seam contract: the same downstream transform stage composes
    val enriched = graft.transform.Enrich.enrichPosts(df)
    assert(enriched.collect().head.getAs[Int]("title_length") == 4)
  }

  test("HttpApiSource comments parse the two-listing envelope with P9 guard") {
    val fake = (url: String, _: Map[String, String]) => {
      assert(url.endsWith("/comments/p1.json"))
      """[{"kind":"Listing","data":{"children":[]}},
         {"kind":"Listing","data":{"children":[
           {"kind":"t1","data":{"id":"c1","author":"a","body":"hi","score":2,"created_utc":1735725601,"parent_id":"t3_p1","is_submitter":false}},
           {"kind":"t1","data":{"id":"c2","author":"b","body":null,"score":0,"created_utc":1735725602,"parent_id":"t3_p1","is_submitter":false}}
         ]}}]"""
    }
    val out = new HttpApiSource(fake).fetchComments(spark, "p1", 10).collect()
    assert(out.length == 1 && out.head.getAs[String]("id") == "c1")
    assert(out.head.getAs[String]("post_id") == "p1")
  }
}
