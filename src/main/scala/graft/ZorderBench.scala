package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

/** Measurement main behind `wh_zorder`'s modeled pruning numbers: the
  * query models min/max file skipping over derived file stats; this
  * main WRITES the three candidate layouts as real parquet and
  * measures what Spark's parquet reader actually skips for the same
  * 24-query workload grid — rows surviving row-group pruning +
  * predicate pushdown (the FileSourceScan `numOutputRows` metric,
  * read from the executed plan) and scan wall time, per layout.
  *
  * Modeled-vs-measured is the point: the wh_zorder oracle proves the
  * geometry cross-engine; this main proves the geometry is what the
  * actual scanner exploits. Each layout writes
  * `repartitionByRange(Files, key) + sortWithinPartitions(key)` — the
  * range-partitioned sort a production z-order writer runs (this is
  * the balanced-file form of the query's equal-width model; both
  * expose the same min/max geometry to footers).
  *
  * Usage: sbt "runMain graft.ZorderBench [sfDir] [files]"
  * Output: one JSON line per (layout, workload) with rows-read and
  * scan-seconds sums over the workload's queries, plus the table
  * total for the fraction.
  */
object ZorderBench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val files = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // small row groups so sub-file skipping is visible at local SF;
      // at production block sizes the same geometry skips whole files
      .config("spark.hadoop.parquet.block.size", (1 << 20).toString)
      // single-stage scans; a plain executed plan keeps the scan
      // metrics directly collectable
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey").as("c"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
          .cast("long").as("d"))
    val Row(mnc: Long, mxc: Long, mnd: Long, mxd: Long) =
      base.agg(min(col("c")), max(col("c")), min(col("d")), max(col("d")))
        .head()
    val spanC = mxc - mnc + 1
    val spanD = mxd - mnd + 1
    // the same 8-bit interleave the query models (Analytics.whZorder)
    val bc = s"(((c - $mnc) * 256) div $spanC)"
    val bd = s"(((d - $mnd) * 256) div $spanD)"
    val z = (0 until 8).map { i =>
      s"(((($bc) div ${1L << i}) % 2) * ${1L << (2 * i + 1)}" +
        s" + ((($bd) div ${1L << i}) % 2) * ${1L << (2 * i)})"
    }.mkString("(", " + ", ")")

    val layouts: Seq[(String, DataFrame)] = Seq(
      "zorder" -> base.withColumn("k", expr(z)),
      "time_sorted" -> base.withColumn("k", col("d")),
      "key_sorted" -> base.withColumn("k", col("c")))
    val root = "/tmp/graft_zorder"
    layouts.foreach { case (name, df) =>
      val dir = s"$root/$name"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        df.repartitionByRange(files, col("k"))
          .sortWithinPartitions(col("k"))
          .drop("k")
          .write.mode("overwrite").parquet(dir)
      }
    }

    val total = base.count()
    def quart(mn: Long, span: Long, q: Int): (Long, Long) =
      (mn + span * q / 4, mn + span * (q + 1) / 4 - 1)
    // the wh_zorder workload grid: 16 both-dims + 4 per single dim
    val queries: Seq[(String, String)] =
      (for (i <- 0 until 4; j <- 0 until 4) yield {
        val (cl, ch) = quart(mnc, spanC, i); val (dl, dh) = quart(mnd, spanD, j)
        ("both", s"c >= $cl AND c <= $ch AND d >= $dl AND d <= $dh")
      }) ++ (0 until 4).map { i =>
        val (cl, ch) = quart(mnc, spanC, i)
        ("cust", s"c >= $cl AND c <= $ch")
      } ++ (0 until 4).map { j =>
        val (dl, dh) = quart(mnd, spanD, j)
        ("date", s"d >= $dl AND d <= $dh")
      }

    def scanRows(plan: SparkPlan): Long =
      plan.collectLeaves().flatMap(_.metrics.get("numOutputRows"))
        .map(_.value).sum

    layouts.foreach { case (name, _) =>
      val read = () => spark.read.parquet(s"$root/$name")
      // warm the footer/file-listing caches so timing is scan cost
      read().count()
      val agg = queries.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (workload, qs) =>
          var rows = 0L; var secs = 0.0
          qs.foreach { case (_, pred) =>
            val df = read().filter(pred).select(col("o_orderkey"))
            val t0 = System.nanoTime()
            df.queryExecution.toRdd.count()
            secs += (System.nanoTime() - t0) / 1e9
            rows += scanRows(df.queryExecution.executedPlan)
          }
          (workload, qs.size, rows, secs)
      }
      agg.foreach { case (w, nq, rows, secs) =>
        val frac = rows.toDouble / (nq * total)
        println(f"""{"metric":"zorder_bench","layout":"$name","workload":"$w","n_queries":$nq,"rows_read":$rows,"table_rows":$total,"read_fraction":$frac%.4f,"scan_sec":$secs%.3f}""")
      }
    }
    spark.stop()
  }
}
