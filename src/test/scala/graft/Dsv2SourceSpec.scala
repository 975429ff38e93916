package graft

import java.nio.file.Files

/** The DataSource V2 connector: options → scan → rows through the real
  * DSv2 contract.
  */
class Dsv2SourceSpec extends SparkSpec {

  private def writeDump(): String = {
    val dir = Files.createTempDirectory("graft_dsv2_")
    val posts = Seq(
      """{"id":"p1","title":"one","author":"a","subreddit":"python","score":50,"upvote_ratio":0.9,"num_comments":10,"created_utc":1735725600,"selftext":"b","url":"u","is_video":false,"is_original_content":true,"over_18":false,"stickied":false,"locked":false}""",
      """{"id":"p2","title":"two","author":"b","subreddit":"python","score":9,"upvote_ratio":0.7,"num_comments":1,"created_utc":"2025-01-02T10:00:00Z","selftext":null,"url":"u","is_video":false,"is_original_content":false,"over_18":false,"stickied":false,"locked":false}""",
      """{"id":"p3","title":"other","author":"c","subreddit":"rust","score":5,"upvote_ratio":0.5,"num_comments":0,"created_utc":1735725700,"selftext":"s","url":"u","is_video":true,"is_original_content":false,"over_18":false,"stickied":false,"locked":false}""")
    val p = dir.resolve("posts.json")
    Files.write(p, posts.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("DSv2 read honors subreddit filter, limit, and declared schema") {
    val path = writeDump()
    val df = spark.read
      .format("graft.source.v2.RedditTableProvider")
      .option("path", path)
      .option("subreddit", "python")
      .load()
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("id")).toSet == Set("p1", "p2"))
    assert(df.schema("created_utc").dataType.typeName == "timestamp")
    // null selftext survives; epoch + ISO timestamps both decode
    assert(rows.find(_.getAs[String]("id") == "p2").get
      .isNullAt(df.schema.fieldIndex("selftext")))
    val limited = spark.read
      .format("graft.source.v2.RedditTableProvider")
      .option("path", path).option("limit", "1").load()
    assert(limited.count() == 1)
  }

  test("DSv2 pushes column pruning and subreddit/notnull filters to the reader") {
    import org.apache.spark.sql.functions.col
    val path = writeDump()
    val df = spark.read
      .format("graft.source.v2.RedditTableProvider")
      .option("path", path)
      .load()
      .where(col("subreddit") === "python" && col("selftext").isNotNull &&
        col("score") > 5)
      .select("id", "score")
    // pruning must reach the physical scan: 2 columns transported, not 15
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.output.map(_.name).toSet.subsetOf(
      Set("id", "score", "subreddit", "selftext")),
      scan.output.map(_.name).toString)
    assert(scan.output.length < 15)
    // p2 (python, score 9) has null selftext -> dropped by pushed IsNotNull;
    // p1 (python, score 50, selftext "b") survives; score>5 stays post-scan
    assert(df.collect().map(_.getAs[String]("id")).toSeq == Seq("p1"))
  }

  test("DSv2 applies ALL claimed-pushed equalities (option + conflicting WHERE)") {
    import org.apache.spark.sql.functions.col
    val path = writeDump()
    // option says python, WHERE says rust: both are claimed pushed, so
    // BOTH must apply — the conjunction is unsatisfiable => zero rows
    // (the bug this pins: reader honoring only the option returned
    // python rows for a rust query)
    val conflicting = spark.read
      .format("graft.source.v2.RedditTableProvider")
      .option("path", path).option("subreddit", "python")
      .load()
      .where(col("subreddit") === "rust")
    assert(conflicting.count() == 0)
    // agreeing option + WHERE behaves as one filter
    val agreeing = spark.read
      .format("graft.source.v2.RedditTableProvider")
      .option("path", path).option("subreddit", "rust")
      .load()
      .where(col("subreddit") === "rust")
    assert(agreeing.collect().map(_.getAs[String]("id")).toSeq == Seq("p3"))
  }

  test("DSv2 scan builder reports pushed vs residual filters") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, IsNotNull}
    val b = new graft.source.v2.RedditScanBuilder(Map("path" -> "/dev/null"))
    val residual = b.pushFilters(Array(
      EqualTo("subreddit", "python"), IsNotNull("selftext"),
      GreaterThan("score", 5)))
    assert(residual.toSeq == Seq(GreaterThan("score", 5)))
    assert(b.pushedFilters().toSeq ==
      Seq(EqualTo("subreddit", "python"), IsNotNull("selftext")))
  }

  test("DSv2 ISO-8601 timestamps keep sub-millisecond precision") {
    val dir = Files.createTempDirectory("graft_dsv2_us_")
    val p = dir.resolve("posts.json")
    Files.write(p,
      """{"id":"p1","title":"t","author":"a","subreddit":"python","score":1,"upvote_ratio":0.5,"num_comments":0,"created_utc":"2025-01-02T10:00:00.123456Z","selftext":"s","url":"u","is_video":false,"is_original_content":false,"over_18":false,"stickied":false,"locked":false}"""
        .getBytes("UTF-8"))
    val df = spark.read
      .format("graft.source.v2.RedditTableProvider")
      .option("path", p.toString).load()
    val micros = df.selectExpr("unix_micros(created_utc) % 1000000")
      .collect().head.getLong(0)
    assert(micros == 123456L) // toEpochMilli*1000 would give 123000
  }

  test("DSv2 source composes with the transform stage") {
    val path = writeDump()
    val raw = spark.read
      .format("graft.source.v2.RedditTableProvider")
      .option("path", path).option("subreddit", "python").load()
    val enriched = graft.transform.Enrich.enrichPosts(raw)
    val r = enriched.orderBy("id").collect().head
    assert(r.getAs[Int]("title_length") == 3)
    assert(r.getAs[String]("score_category") == "Medium") // score 50
  }
}
