package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print executed-plan summaries (scan/exchange/reuse counts,
  * or the full plan with `-v`) for named SparkEntry queries — the plan
  * audit SCALE.md's entries are written from.
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 q1,q2[,-v]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").filter(_ != "-v").toSeq
    val verbose = args.length > 2 && args(2) == "-v" ||
      args(1).split(",").contains("-v")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // audit the STATIC plan: an unexecuted AdaptiveSparkPlan prints
      // no WholeStageCodegen spans, which made that count read 0
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
    def c(re: String) = re.r.findAllIn(plan).size
      // codegen spans print as `*(n)` star prefixes in treeString, not
      // as a literal node name — count the DISTINCT span ids
      val spans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      println(s"[explain] $n scans=${c("Scan parquet")} " +
        s"exchanges=${c("Exchange ")} reused=${c("ReusedExchange")} " +
        s"windows=${c("Window ")} sorts=${c("Sort ")} " +
        s"wholestage=$spans")
      if (verbose) println(plan)
    }
    spark.stop()
  }
}
