package graft

import org.apache.spark.sql.SparkSession

/** Micro-benchmark for the bucketed warehouse layout (sink/Warehouse
  * .scala): times the q08/q09-shaped posts↔comments joins over the
  * plain parquet tables (both sides Exchange) vs the bucketed tables
  * (no input Exchange, WarehouseSpec pins the plans). Broadcast is
  * disabled and SortMergeJoin hinted on BOTH variants so the
  * comparison isolates the shuffle, which is what bucketing removes —
  * at test SF the optimizer would otherwise broadcast both sides and
  * hide the effect the layout exists for. Prints one JSON line;
  * numbers land in SCALE.md's reference-parity section.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.BenchJoins"
  */
object BenchJoins {

  val Iters = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // isolate the shuffle: no broadcast escape hatch on either side
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val posts = graft.model.RedditModel.posts(spark, sfDir)
    val comments = graft.model.RedditModel.comments(spark, sfDir)
    graft.sink.Warehouse.materializeBucketed(spark, posts, comments)

    def time(f: => Long): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to Iters) {
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }

    import org.apache.spark.sql.functions._
    def shuffled(): Long = { // q09 shape over plain parquet
      val p = posts.select(col("id"), col("subreddit"))
      val c = comments.filter(col("author") =!= "[deleted]")
        .select(col("id").as("c_id"), col("post_id"), col("author"))
      p.join(c.hint("merge"), p("id") === c("post_id"))
        .groupBy(col("subreddit"), col("author"))
        .agg(count(col("c_id")).as("comment_count"))
        .filter(col("comment_count") >= 3)
        .queryExecution.toRdd.count()
    }
    def bucketed(): Long =
      graft.sink.Warehouse.topCommentersBucketed(spark)
        .queryExecution.toRdd.count()

    val tShuffled = time(shuffled())
    val tBucketed = time(bucketed())
    println(s"""{"metric":"q09_join","unit":"sec","shuffled":$tShuffled,"bucketed":$tBucketed,"speedup":${tShuffled / tBucketed},"iters":$Iters,"sf":"$sfDir"}""")
    spark.stop()
  }
}
