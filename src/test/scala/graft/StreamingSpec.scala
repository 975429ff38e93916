package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingStats

/** Structured-Streaming daily stats: incremental results must converge
  * to the batch twin's values (same transform, watermarked).
  */
class StreamingSpec extends SparkSpec {

  test("windowed agg emits closed day buckets as the watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val events = mem.toDF()
      .toDF("ts", "event_type", "user_id", "value")
    val q = StreamingStats.startMemorySink(events, "ev_test")
    try {
      mem.addData(
        (Timestamp.valueOf("2025-03-01 10:00:00"), "click", 1L, 2.0),
        (Timestamp.valueOf("2025-03-01 11:00:00"), "click", 2L, 3.0),
        (Timestamp.valueOf("2025-03-01 12:00:00"), "view", 1L, 1.0))
      q.processAllAvailable()
      // append mode: nothing emitted until the watermark passes day end
      assert(spark.table("ev_test").count() == 0)
      // an event 2 days later pushes the watermark past 2025-03-02 00:00
      mem.addData((Timestamp.valueOf("2025-03-03 09:00:00"), "click", 3L, 5.0))
      q.processAllAvailable()
      val out = spark.table("ev_test").collect()
      assert(out.length == 2) // click + view buckets for 03-01
      val click = out.find(_.getAs[String]("event_type") == "click").get
      assert(click.getAs[String]("day") == "2025-03-01")
      assert(click.getAs[Long]("n_events") == 2L)
      assert(click.getAs[Double]("total_value") == 5.0)
    } finally q.stop()
  }

  test("batch twin equals a direct aggregation over the events fixture") {
    val df = StreamingStats.evDailyStats(spark, sf())
    val direct = StreamingStats.events(spark, sf())
      .groupBy(to_date(col("ts")).cast("string").as("day"), col("event_type"))
      .count()
    assert(df.count() == direct.count())
    assert(df.columns.toSeq == Seq("day", "event_type", "n_events",
      "exact_users", "total_value", "avg_value"))
  }

  test("foreachBatch bridge upserts closed windows into the warehouse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft_swh_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val q = StreamingStats.startUpsertSink(
      mem.toDF().toDF("ts", "event_type", "user_id", "value"), wh, ckpt)
    try {
      mem.addData(
        (Timestamp.valueOf("2025-03-01 10:00:00"), "click", 1L, 2.0),
        (Timestamp.valueOf("2025-03-03 09:00:00"), "view", 2L, 1.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$wh/subreddit_stats")
      // the 03-01 click window closed (watermark passed via 03-03 event)
      assert(out.count() == 1)
      val r = out.collect().head
      assert(r.getAs[String]("subreddit") == "click" &&
        r.getAs[String]("date") == "2025-03-01")
    } finally q.stop()
  }

  test("streaming transform schema matches its batch twin's core columns") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val out = StreamingStats.dailyEventStats(
      mem.toDF().toDF("ts", "event_type", "user_id", "value"))
    assert(out.columns.toSeq == Seq("day", "event_type", "n_events",
      "approx_users", "total_value", "avg_value"))
  }
}
