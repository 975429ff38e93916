package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Iterations per query; the reported number is the per-query MIN, so
    * a transiently contended machine can't fake a regression (BENCH_r02
    * recorded a 4.5× phantom under contention). The first iteration of
    * each query absorbs its codegen compilation, so N iters = N−1 warm
    * samples; 5 keeps consecutive-run parity drift inside ~10%.
    */
  val Iters = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same timestamp semantics as Verify: events' NTZ→LTZ cast must
      // resolve against UTC, not the host TZ, for stable timings/plans
      .config("spark.sql.session.timeZone", "UTC")
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
    // dev-only: SPARK_GRAFT_ONLY=a,b,c restricts the timed set for
    // single-query iteration; the driver never sets it
    val names = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(o) => SparkEntry.queries.keys.toSeq.filter(o.split(",").toSet)
      case None => SparkEntry.queries.keys.toSeq
    }
    val times = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to Iters; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // toRdd.count() materializes every InternalRow with all columns
      // computed — a bare df.count() lets Catalyst prune the aggregate
      // and projection expressions the query exists to measure.
      val ok =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      // a failed iteration must NOT enter the min — a fast crash would
      // masquerade as a speedup; a never-succeeding query reports -1
      if (ok && (!times.contains(name) || dt < times(name)))
        times(name) = dt
      // queries that cache (dd_minhash_lsh, dd_simhash_pairs) must not
      // leak their cache into the next query's memory budget or timing
      spark.catalog.clearCache()
    }
    val results = names.map(n => n -> times.getOrElse(n, -1.0))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // decomposition: the reference's own query surface (baseline-
    // comparable) vs the extension tier it has no counterpart for.
    // NOT k.startsWith("q"): that would misfile qf_decide/qf_redact.
    val isParity = (k: String) =>
      k.matches("q\\d\\d_.*") || k == "stats_daily" || k == "transform_posts"
    val parity = results.collect { case (k, v) if isParity(k) => v }.sum
    val full = s"""{"metric":"total","value":$total,"unit":"sec","parity_sec":$parity,"ext_sec":${total - parity},"iters":$Iters,"queries":$qs,"sf":"$sfDir"}"""
    println(full)
    // The one-line-with-per-query-map contract stands, but bounded log
    // tails truncated it two rounds running (BENCH_r06/r07 "parsed":
    // null — half the per-query numbers unauditable). Two mitigations:
    // (1) persist the complete JSON to a file inside the repo so the
    // artifact survives any log capture; (2) emit one SHORT line per
    // query before the final summary so even a tail-only capture holds
    // every number (142 lines ≈ 6 KB).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: $e") }
    results.foreach { case (k, v) =>
      println(s"""{"metric":"query","name":"$k","sec":$v}""")
    }
    // Repeat the headline numbers on their own short FINAL line so any
    // tail capture parses them directly.
    println(s"""{"metric":"summary","value":$total,"unit":"sec","parity_sec":$parity,"ext_sec":${total - parity},"iters":$Iters,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
