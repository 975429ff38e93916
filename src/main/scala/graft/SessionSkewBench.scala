package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement harness for the LAST prose claim in SCALE.md's skew
  * story: that the streaming sessionizer turns the batch window's
  * monolithic hot-key sort into bounded per-micro-batch work. The
  * round-9 table measured the batch side (`ev_sessions` 1.9× under a
  * 90% single-user load, the hot task being one 900k-row sort while
  * 31 siblings idle); this main measures the streaming side of the
  * same trade on the same fixture.
  *
  * Method: the fixture's events are sliced into N equal time-ordered
  * files (offline, untimed) and replayed through [[graft.streaming
  * .StreamingStats.sessionizeStream]] with `maxFilesPerTrigger=1` —
  * the production rate-limit shape, one file per micro-batch. Wall
  * time to drain plus per-trigger durations come from the query's own
  * progress telemetry; the batch twin is timed Bench-style (min of
  * 3, toRdd.count) beside it. The comparison to read: the batch form
  * is bound below by its single hot task, while the stream's hot task
  * per trigger is hot-rows/N — latency an operator can DIAL with the
  * trigger size, at the cost of N state-store round-trips.
  *
  * Usage: `runMain graft.SessionSkewBench [fixtureDir] [nBatches]`.
  * Output: one JSON line {batch_sec, stream_total_sec, n_batches,
  * trigger_ms_max, trigger_ms_med, rows}. Results live in SCALE.md's
  * skew section.
  */
object SessionSkewBench {

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/scale10x_skew90"
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.StreamingStats

    // batch twin: min-of-3 full materialization (Bench discipline)
    val batchSec = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      StreamingStats.evSessions(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.min

    // offline prep (untimed): N time-ordered slices, one file each, in
    // slice order so the file source replays chronologically
    val ev = StreamingStats.events(spark, dir)
      .select(col("ts").cast("timestamp").as("ts"),
        col("user_id").cast("long").as("user_id"),
        col("value").cast("double").as("value"))
    val rows = ev.count()
    val in = java.nio.file.Files
      .createTempDirectory("graft_sessskew_in_").toString
    val staged = ev
      .withColumn("slice", ntile(nBatches).over(Window.orderBy(col("ts"))))
      .cache()
    (1 to nBatches).foreach { s =>
      val stage = s"$in/_stage_$s"
      staged.filter(col("slice") === s).drop("slice")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(f"$in/slice_$s%03d.parquet"))
    }
    staged.unpersist()

    val t0 = System.nanoTime()
    val q = StreamingStats.sessionizeStream(
        spark.readStream
          .schema("ts TIMESTAMP, user_id LONG, value DOUBLE")
          .option("maxFilesPerTrigger", "1").parquet(in))
      .toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.queryExecution.toRdd.count(); () }
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamSec = (System.nanoTime() - t0) / 1e9
    // in TRIGGER order (not sorted): the first trigger absorbs codegen
    // warm-up, which must be readable as such, not as a hot-key tail
    val trig = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(_.durationMs.get("triggerExecution").longValue())
    val sortedTail = trig.drop(1).sorted
    println(s"""{"metric":"session_skew","fixture":"$dir",""" +
      s""""rows":$rows,"batch_sec":$batchSec,""" +
      s""""stream_total_sec":$streamSec,"n_batches":${trig.size},""" +
      s""""trigger_ms":${trig.mkString("[", ",", "]")},""" +
      s""""warm_trigger_ms_max":${if (sortedTail.isEmpty) -1
        else sortedTail.max},""" +
      s""""warm_trigger_ms_med":${if (sortedTail.isEmpty) -1
        else sortedTail(sortedTail.size / 2)}}""")
    spark.stop()
  }
}
