package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the round-13 verdict's ThreadRollup watch
  * item: the aggregate's per-group buffer is the post's own comment
  * list, argued safe by the "human-bounded thread ≈ 10⁵ comments ≈
  * 1.2 MB serialized" note — this main MEASURES the adversarial case
  * instead of arguing it: one mega-thread holding the entire input
  * (every partial buffer merges into one group on one reducer task)
  * against a balanced control (1000-comment posts) at the same total
  * row counts.
  *
  * What to read from the numbers: the one-post shape is the aggregate's
  * worst case — map-side partials still parallelize the collect, but
  * the merge + the sort-then-one-pass eval of the full list land on a
  * single task, so wall-clock should degrade smoothly (sort is
  * O(n log n), memory one boxed (Long, Int) list) rather than cliff;
  * the balanced shape at the same n is the distributed baseline. The
  * documented posture (per-key windows skew section) stands if the
  * mega-thread completes in bounded memory with single-task O(n log n)
  * growth — the same contract as any per-key window.
  *
  * Usage: `runMain graft.ThreadSkewBench [sizes]` (default
  * 100000,1000000,4000000,16000000). Output: one JSON line per
  * (rows, shape): {"metric":"thread_skew","rows":n,"shape":s,"sec":t}.
  * Results live in SCALE.md's round-14 section.
  */
object ThreadSkewBench {

  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0)
      else "100000,1000000,4000000,16000000")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ThreadRollup.register(spark)

    def time(n: Long, posts: Long): Double = (1 to 2).map { _ =>
      // deterministic synthetic thread: ids unique, scores cycle a
      // small modulus (the parent formula consumes score mod position)
      val df = spark.range(n).select(
        (col("id") % posts).as("post_id"),
        col("id").as("cid"),
        (col("id") % 41).cast("int").as("score"))
      val t0 = System.nanoTime()
      df.groupBy(col("post_id"))
        .agg(graft.functions.ThreadRollup.rollup(col("cid"), col("score"))
          .as("r"))
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.min

    sizes.foreach { n =>
      Seq("one_post" -> 1L, "balanced" -> math.max(1L, n / 1000))
        .foreach { case (shape, posts) =>
          val t = time(n, posts)
          println(s"""{"metric":"thread_skew","rows":$n,""" +
            f""""shape":"$shape","sec":$t%.3f}""")
        }
    }
    spark.stop()
  }
}
