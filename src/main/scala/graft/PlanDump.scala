package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write `.explain("formatted")` output for named SparkEntry
  * queries to files — the before/after plan evidence the optimization
  * rounds commit under `plans/rNN/`.
  *
  *   sbt "runMain graft.PlanDump <sfDir> <q1,q2,...|all> <outDir> <tag>"
  *
  * Emits `<outDir>/<query>_<tag>.txt`. Uses the bench session shape
  * (AQE on, shuffle.partitions = cpus) so the captured initial plan is
  * the one the bench compiles; eagerly-checkpointed training frames
  * appear as ExistingRDD scans, exactly as they execute.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val outDir = args(2)
    val tag = args(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val s = df.queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
          s.getBytes("UTF-8"))
        println(s"[plandump] wrote ${n}_$tag.txt")
      } catch { case e: Exception =>
        System.err.println(s"[plandump] $n FAILED: $e")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
