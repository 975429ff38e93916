package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline
import graft.sink.Load
import graft.source.FixtureSource

/** Sink semantics (K1–K3) and pipeline orchestration (§2.14). */
class LoadPipelineSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_wh_").toString

  test("K3 upsert replaces on (subreddit, date) and re-runs idempotently") {
    import spark.implicits._
    val wh = tmpDir()
    val b1 = Seq(("r/a", "2025-01-01", 10L), ("r/b", "2025-01-01", 5L))
      .toDF("subreddit", "date", "total_posts")
    Load.upsertStats(b1, spark, wh)
    // replace r/a with new value, add r/c
    val b2 = Seq(("r/a", "2025-01-01", 99L), ("r/c", "2025-01-02", 1L))
      .toDF("subreddit", "date", "total_posts")
    Load.upsertStats(b2, spark, wh)
    val out = spark.read.parquet(s"$wh/subreddit_stats")
    assert(out.count() == 3) // keys: a@01, b@01, c@02 — no duplicates
    val a = out.filter(col("subreddit") === "r/a").collect().head
    assert(a.getAs[Long]("total_posts") == 99L) // latest wins
    // idempotency: re-upsert the identical batch changes nothing
    Load.upsertStats(b2, spark, wh)
    val again = spark.read.parquet(s"$wh/subreddit_stats")
    assert(again.count() == 3)
    assert(again.filter(col("subreddit") === "r/a").collect().head
      .getAs[Long]("total_posts") == 99L)
  }

  test("K3-partitioned upsert rewrites only dirty date partitions") {
    import spark.implicits._
    val wh = tmpDir()
    val b1 = Seq(("r/a", "2025-01-01", 10L), ("r/b", "2025-01-01", 5L),
      ("r/a", "2025-01-02", 7L))
      .toDF("subreddit", "date", "total_posts")
    Load.upsertStatsPartitioned(b1, spark, wh)
    val table = s"$wh/subreddit_stats_by_date"

    def partFiles(date: String): Map[String, (Long, Long)] = {
      val dir = new java.io.File(s"$table/date=$date")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val d1Before = partFiles("2025-01-01")
    assert(d1Before.nonEmpty)

    // batch touching ONLY 2025-01-02
    val b2 = Seq(("r/a", "2025-01-02", 99L), ("r/c", "2025-01-02", 1L))
      .toDF("subreddit", "date", "total_posts")
    Load.upsertStatsPartitioned(b2, spark, wh)

    // untouched partition: same files, same bytes, same mtimes
    assert(partFiles("2025-01-01") == d1Before)
    // dirty partition merged latest-wins
    val out = spark.read.parquet(table)
    assert(out.count() == 4) // a@01, b@01, a@02(updated), c@02
    assert(out.filter(col("subreddit") === "r/a" &&
        col("date") === "2025-01-02").collect().head
      .getAs[Long]("total_posts") == 99L)
    assert(out.filter(col("date") === "2025-01-01").count() == 2)
    // idempotent re-run
    Load.upsertStatsPartitioned(b2, spark, wh)
    assert(spark.read.parquet(table).count() == 4)
  }

  test("mergeInto: update/insert/delete, partition-scoped, emptied dirs removed") {
    import spark.implicits._
    val table = s"${tmpDir()}/items"
    val seed = Seq(
      (1L, "2025-01-01", "one"), (2L, "2025-01-01", "two"),
      (3L, "2025-01-02", "three"),
      (4L, "2025-01-03", "four"))
      .toDF("id", "date", "payload")
    Load.mergeInto(spark, table, seed, Seq("id"), "date")
    def partFiles(date: String): Map[String, (Long, Long)] = {
      val dir = new java.io.File(s"$table/date=$date")
      if (dir.listFiles() == null) Map.empty
      else dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val d1Before = partFiles("2025-01-01")
    assert(d1Before.nonEmpty)
    // MERGE: update id=3, insert id=5 (both on 01-02), delete ALL of
    // 01-03; 01-01 untouched
    val batch = Seq(
      (3L, "2025-01-02", "THREE", "upsert"),
      (5L, "2025-01-02", "five", "upsert"),
      (4L, "2025-01-03", "", "delete"))
      .toDF("id", "date", "payload", "op")
    Load.mergeInto(spark, table, batch, Seq("id"), "date", Some("op"))
    val out = spark.read.parquet(table)
    assert(out.count() == 4) // 1, 2, 3(updated), 5
    assert(out.filter(col("id") === 3L).collect().head
      .getAs[String]("payload") == "THREE") // matched → update
    assert(out.filter(col("id") === 5L).count() == 1) // not matched → insert
    assert(out.filter(col("id") === 4L).count() == 0) // matched → delete
    // untouched partition byte-identical; emptied partition dir gone
    assert(partFiles("2025-01-01") == d1Before)
    assert(!new java.io.File(s"$table/date=2025-01-03").exists())
    // idempotent re-merge
    Load.mergeInto(spark, table, batch, Seq("id"), "date", Some("op"))
    assert(spark.read.parquet(table).count() == 4)
  }

  test("mergeInto: NULL partition keeps survivors and cleans the Hive default dir") {
    import spark.implicits._
    val table = s"${tmpDir()}/nullpart"
    val seed = Seq(
      (1L, Option.empty[String], "n1"), (2L, Option.empty[String], "n2"),
      (3L, Option("2025-01-01"), "d1"))
      .toDF("id", "date", "payload")
    Load.mergeInto(spark, table, seed, Seq("id"), "date")
    val nullDir = new java.io.File(s"$table/date=__HIVE_DEFAULT_PARTITION__")
    assert(nullDir.exists())
    // upsert into the null partition: its OTHER row must survive
    // (isin(null-containing vals) alone would drop id=1 silently)
    val up = Seq((2L, Option.empty[String], "N2", "upsert"))
      .toDF("id", "date", "payload", "op")
    Load.mergeInto(spark, table, up, Seq("id"), "date", Some("op"))
    val out = spark.read.parquet(table)
    assert(out.count() == 3)
    assert(out.filter(col("id") === 1L).count() == 1) // null-part survivor
    assert(out.filter(col("id") === 2L).collect().head
      .getAs[String]("payload") == "N2")
    // delete every null-partition row: the default-partition dir must
    // be removed by name (not a literal "date=null" path)
    val del = Seq((1L, Option.empty[String], "", "delete"),
      (2L, Option.empty[String], "", "delete"))
      .toDF("id", "date", "payload", "op")
    Load.mergeInto(spark, table, del, Seq("id"), "date", Some("op"))
    assert(!nullDir.exists())
    val rest = spark.read.parquet(table)
    assert(rest.count() == 1 &&
      rest.collect().head.getAs[Long]("id") == 3L)
  }

  test("K5 JSONL export shards round-trip with bounded, ordered shards") {
    val dir = tmpDir()
    val docs = graft.operators.TextAnalysis.docs(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val shards = graft.sink.Export.exportJsonl(docs, "doc_id",
      s"$dir/corpus", maxPerShard = 100L)
    assert(shards == 5) // 500 docs / 100
    val shardDirs = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == shards)
    // round-trip: same rows, readable by any JSONL consumer
    val back = spark.read.schema(docs.schema).json(s"$dir/corpus/shard=*")
    assert(back.count() == 500)
    assert(back.select(sum(col("doc_id"))).collect().head.getLong(0) ==
      docs.select(sum(col("doc_id"))).collect().head.getLong(0))
    // shards are bounded, contiguous key ranges (resumable-loader
    // contract), gzip-compressed
    val ranges = shardDirs
      .sortBy(f => f.getName.stripPrefix("shard=").toInt)
      .map { d =>
        val fs = d.listFiles().filter(_.getName.endsWith(".json.gz"))
        assert(fs.nonEmpty, s"no gzip jsonl in ${d.getName}")
        val ids = spark.read.schema(docs.schema).json(d.getPath)
          .select(col("doc_id")).collect().map(_.getLong(0))
        assert(ids.length <= 100)
        (ids.min, ids.max)
      }
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo)
      case _ => ()
    }
    // determinism: re-export places every row in the same shard
    val dir2 = tmpDir()
    graft.sink.Export.exportJsonl(docs, "doc_id", s"$dir2/corpus", 100L)
    (0 until shards).foreach { k =>
      val a = spark.read.schema(docs.schema).json(s"$dir/corpus/shard=$k")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val b = spark.read.schema(docs.schema).json(s"$dir2/corpus/shard=$k")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(a == b, s"shard $k membership differs across exports")
    }
  }

  test("K1 append dedups the batch on id before write") {
    import spark.implicits._
    val wh = tmpDir()
    val batch = Seq(("p1", 5), ("p1", 5), ("p2", 7)).toDF("id", "score")
    Load.appendPosts(batch, wh)
    assert(spark.read.parquet(s"$wh/posts").count() == 2)
  }

  test("K1 append is idempotent across batches (table-wide PK contract)") {
    import spark.implicits._
    val wh = tmpDir()
    val batch = Seq(("p1", 5), ("p2", 7)).toDF("id", "score")
    Load.appendPosts(batch, wh)
    Load.appendPosts(batch, wh) // retry/re-run must not double-load
    assert(spark.read.parquet(s"$wh/posts").count() == 2)
    // a later batch with one new and one known id loads only the new row
    Load.appendPosts(Seq(("p2", 9), ("p3", 1)).toDF("id", "score"), wh)
    val out = spark.read.parquet(s"$wh/posts")
    assert(out.count() == 3)
  }

  test("pipeline runs end-to-end on the fixture source") {
    val wh = tmpDir()
    val p = new Pipeline(spark, new FixtureSource(sf()), wh)
    val n = p.runPipeline("1-URGENT", limit = 40, extractComments = true,
      topPosts = 3, commentLimit = 5).get
    assert(n == 40)
    assert(spark.read.parquet(s"$wh/posts").count() == 40)
    val stats = spark.read.parquet(s"$wh/subreddit_stats")
    assert(stats.count() > 0)
    assert(stats.columns.contains("avg_score"))
    // comments fetched for the top posts (some may legitimately be empty)
    val comments = spark.read.parquet(s"$wh/comments")
    assert(comments.count() > 0)
    assert(comments.select("extracted_at").collect().forall(!_.isNullAt(0)))
  }

  test("pipeline isolates per-subreddit failures (fail-soft, §2.14)") {
    val wh = tmpDir()
    val failing = new FixtureSource(sf()) {
      override def fetchPosts(spark: org.apache.spark.sql.SparkSession,
          subreddit: String, limit: Int, sort: String) =
        if (subreddit == "boom") throw new RuntimeException("api down")
        else super.fetchPosts(spark, subreddit, limit, sort)
    }
    val p = new Pipeline(spark, failing, wh)
    val results = p.runAll(Seq("1-URGENT", "boom", "5-LOW"), limit = 10,
      extractComments = false)
    assert(results("boom").isFailure)
    assert(results("1-URGENT").isSuccess && results("5-LOW").isSuccess)
    // the healthy subreddits still loaded
    assert(spark.read.parquet(s"$wh/posts").count() == 20)
  }

  test("empty extract short-circuits without writing (P10 guard)") {
    val wh = tmpDir()
    val p = new Pipeline(spark, new FixtureSource(sf()), wh)
    assert(p.runPipeline("no-such-subreddit").get == 0L)
    assert(!Files.exists(java.nio.file.Paths.get(s"$wh/posts")))
  }
}
