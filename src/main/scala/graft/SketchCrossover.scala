package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the exact-vs-sketch profile crossover
  * (`prof_summary` vs `prof_summary_approx`) — the round-8 watch-list
  * item: at bench scale the HLL sketch costs MORE than the exact
  * per-column distinct (its per-row ImperativeAggregate update
  * constant dominates while the exact form's shuffles are tiny), and
  * SCALE.md argued the ranking flips as data grows. This main turns
  * that argument into a measured table.
  *
  * Method: derive k× fixtures from the bench SF's lineitem by
  * unioning k copies with the high-cardinality key columns offset per
  * copy (orderkey/partkey/suppkey + quantity/extendedprice), so
  * DISTINCT cardinality scales ~k× with volume like a real ingest
  * (pure duplication would let the exact path's map-side partial
  * dedup absorb the growth for free); the enumeration-shaped columns
  * (flags, linenumber, discount, tax, shipdate) stay fixed, as
  * enumerations do. Each variant then times both profile queries with
  * Bench's discipline (N iters, per-query MIN, toRdd.count
  * materialization).
  *
  * Usage: `runMain graft.SketchCrossover [sfDir] [mults] [iters]`,
  * mults comma-separated (default 1,3,10,30). Output: one JSON line
  * per multiplier {mult, rows, exact_sec, approx_sec, ratio} — the
  * crossover is where ratio drops through 1.0. Results are recorded
  * in SCALE.md; fixtures live under /tmp and are rebuilt if absent.
  */
object SketchCrossover {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,3,10,30")
      .split(",").map(_.trim.toInt).toSeq
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def derive(m: Int): String = {
      val dir = s"/tmp/graft_crossover/x$m"
      val out = new java.io.File(s"$dir/lineitem.parquet")
      if (!out.exists()) {
        val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
        (0 until m).map { i =>
          base
            .withColumn("l_orderkey", col("l_orderkey") + i * 1000000000L)
            .withColumn("l_partkey", col("l_partkey") + i * 1000000000L)
            .withColumn("l_suppkey", col("l_suppkey") + i * 1000000000L)
            .withColumn("l_quantity", col("l_quantity") + i * 1.0e7)
            .withColumn("l_extendedprice",
              col("l_extendedprice") + i * 1.0e7)
        }.reduce(_.unionByName(_))
          .write.mode("overwrite").parquet(out.getPath)
      }
      dir
    }

    def time(fn: => DataFrame): Double = {
      val samples = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      samples.min
    }

    mults.foreach { m =>
      val dir = derive(m)
      val rows = spark.read.parquet(s"$dir/lineitem.parquet").count()
      // alternate the order so neither path inherits the other's
      // page-cache warmth asymmetrically; first call warms the footer
      val exact = time(graft.operators.Analytics.profSummary(spark, dir))
      val approx =
        time(graft.operators.Analytics.profSummaryApprox(spark, dir))
      val exact2 = time(graft.operators.Analytics.profSummary(spark, dir))
      val e = math.min(exact, exact2)
      println(s"""{"metric":"crossover","mult":$m,"rows":$rows,""" +
        s""""exact_sec":$e,"approx_sec":$approx,""" +
        s""""ratio_approx_over_exact":${approx / e}}""")
    }
    spark.stop()
  }
}
