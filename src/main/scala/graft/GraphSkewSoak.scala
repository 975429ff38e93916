package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CrossHash
import graft.operators.Graph

/** Measures the graph tier under DEGREE SKEW — the distribution the
  * derived citation fixture cannot produce (constant out-degree ≤ 3
  * bounds every node's wedge count at 3·corpus-density) but the
  * tier's own stated use case (power-law web link graphs) is made of.
  * PairGuardSoak's family axis applied to graphs: a fixed synthetic
  * base graph (every node cites 3 affine-hash targets — the organic
  * shape) plus ONE hub of degree F injected at a mid-range id, F
  * swept as the family axis.
  *
  * Hub placement is the point: at a MID id, roughly half the hub's
  * spokes hold smaller ids and half larger, so the id-ordered wedge
  * plan (a<b<c) forms ~(F/2)² wedge candidates AT THE HUB KEY — a
  * single-key join blowup quadratic in F (and a skewed shuffle: all
  * of it lands in one task pre-AQE). The degree-oriented plan
  * (gr_triangles_deg) orients every hub edge INTO the hub — the hub
  * centers ZERO wedges, and each spoke's fan-out stays at its own
  * ~4² — so its cost must stay flat in F. pagerank and components run
  * the same axis to document that the fixpoint tier is skew-neutral
  * by construction (the dst-side sum is partial-aggregated — a hub's
  * F incoming masses combine map-side; star-CC hangs every spoke off
  * the hub's min-id label in O(1) rounds).
  *
  * Expected shape, stated up front: triangles_id rides F²,
  * triangles_deg / pagerank / components flat. Cutoff discipline:
  * a query whose last time exceeds `cutoffSec` skips larger F with an
  * explicit line (no silent caps).
  *
  * A second mode measures the WHOLE-distribution realism behind the
  * hub isolation: `zipf` draws every node's out-degree from a Pareto
  * tail (index s = family/100, capped), so the id-ordered plan faces
  * the aggregate Σ deg² of a power-law graph rather than one clean
  * hub, and the family axis sweeps tail heaviness mild→heavy (the
  * cutoff iterates in that order — cost grows as s shrinks).
  *
  * Caveat (single-JVM measurement): a query that dies of executor OOM
  * can poison the shared local[k] JVM for the queries AFTER it in the
  * same family round — a "failed" line following another failure is
  * suspect until re-measured alone. That is what the [only,queries]
  * filter exists for: re-run each suspect in its own JVM (the
  * round-15 zipf s=1.5 row was cleaned exactly this way; only
  * gr_triangles_id's failure was real).
  *
  * Usage: sbt "runMain graft.GraphSkewSoak
  *   [n] [fams] [iters] [cutoff] [hub|zipf] [only,queries]"
  * Output: one JSON line per (query, F):
  *   {"metric":"graph_skew_soak","mode":m,"query":q,"family":F,"sec":t}
  */
object GraphSkewSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 300000L
    val fams = (if (args.length > 1) args(1) else "0,4096,16384,65536")
      .split(",").map(_.trim.toInt).toSeq
    val iters = if (args.length > 2) args(2).toInt else 2
    val cutoffSec = if (args.length > 3) args(3).toDouble else 90.0
    // "hub" (default): inject ONE degree-F hub (F = the family axis).
    // "zipf": EVERY node draws Pareto out-degree with tail index
    // s = family/100 (family 300 → s=3.0 mild, 150 → s=1.5 heavy) —
    // the whole-distribution realism check behind the hub isolation.
    val mode = if (args.length > 4) args(4) else "hub"
    val only = if (args.length > 5)
      args(5).split(",").map(_.trim).toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      // measure the AT-SCALE plan: corpus-sized join sides are never
      // broadcast on a real cluster (static estimates put them far
      // over threshold), but the soak's mid-size heavy-tail fixtures
      // sit in AQE's mis-broadcast window — at zipf s=1.5 the wedge
      // side's runtime stats looked broadcastable and the build OOM'd
      // the shared JVM (measured round 15). Explicit 1-row
      // broadcast() anchors are hints and remain broadcast.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hub = n / 2

    // node universe once; (doc_id, source) so trustrank-style consumers
    // could run too (source only read by pagerank's node census here)
    val nodes = spark.range(n).select(col("id").as("doc_id"))
      .localCheckpoint(true)

    /** Base + hub-family edge set with per-src out_deg. Base: the
      * grEdges affine family applied to the node id itself (same
      * published constants; h = id so the targets are deterministic
      * and uniform). Family: F spokes at ids j·(n/F), each citing the
      * hub — mid-id placement splits them across the hub on the id
      * order.
      */
    def edges(f: Int): DataFrame = {
      val raw = mode match {
        case "zipf" =>
          // Pareto out-degree by inverse CDF: u ∈ (0,1] from the
          // affine hash, deg = min(cap, ceil(u^(-1/s))) so
          // P(deg ≥ d) = d^(-s); targets from a per-(node, j) second
          // affine pass. s = f/100; cap keeps |E| tractable while
          // leaving hubs 3 orders past the median.
          val s = f / 100.0
          val cap = math.min(n / 4, 100000L)
          val (a0, b0) = (CrossHash.MinHashAs(0), CrossHash.MinHashBs(0))
          val (a1, b1) = (CrossHash.MinHashAs(1), CrossHash.MinHashBs(1))
          nodes
            .select(col("doc_id").as("src"),
              expr(s"((doc_id * $a0 + $b0) % ${CrossHash.P} + 1)" +
                s" / (${CrossHash.P} + 1e0)").as("u"))
            .select(col("src"),
              expr(s"least(CAST($cap AS BIGINT)," +
                s" CAST(ceil(pow(1.0/u, ${1.0 / s})) AS BIGINT))")
                .as("dg"))
            .select(col("src"),
              explode(expr("sequence(CAST(0 AS BIGINT), dg - 1)")).as("j"))
            .select(col("src"),
              expr(s"(((src + j * 2654435761) % ${CrossHash.P})" +
                s" * $a1 + $b1) % ${CrossHash.P} % $n").as("dst"))
        case _ =>
          val base = (0 until Graph.GraphOutDeg).map { i =>
            val (a, b) = (CrossHash.MinHashAs(i), CrossHash.MinHashBs(i))
            nodes.select(col("doc_id").as("src"),
              expr(s"((doc_id * $a + $b) % ${CrossHash.P}) % $n").as("dst"))
          }.reduce(_ unionAll _)
          if (f == 0) base else {
            val step = math.max(1L, n / f)
            val spokes = spark.range(f)
              .select((col("id") * step).as("src"), lit(hub).as("dst"))
              .filter(col("src") =!= hub)
            base.unionAll(spokes)
          }
      }
      raw.filter(col("dst") =!= col("src")).distinct()
        .withColumn("out_deg",
          count(lit(1)).over(Window.partitionBy(col("src"))))
        .localCheckpoint(true)
    }

    val queries: Seq[(String, DataFrame => DataFrame)] = Seq(
      "gr_triangles_id" -> ((e: DataFrame) =>
        Graph.grTrianglesFromEdges(nodes, e)),
      "gr_triangles_deg" -> ((e: DataFrame) =>
        Graph.grTrianglesDegFromEdges(nodes, e)),
      "gr_clustering" -> ((e: DataFrame) =>
        Graph.grClusteringFromEdges(nodes, e)),
      "gr_pagerank" -> ((e: DataFrame) =>
        Graph.grPagerankFromEdges(nodes, e)),
      "gr_components" -> ((e: DataFrame) =>
        Graph.grComponentsFromEdges(nodes, e)),
      // the peel has no wedge join — a hub's F edges feed ONE
      // partial-agg'd degree key per round, so it must stay flat
      "gr_kcore" -> ((e: DataFrame) =>
        Graph.grKcoreFromEdges(nodes, e)),
      // LPA's combine key is (node, LABEL): the hub's F spokes carry
      // ~F distinct labels in round 1, so the hub's groupBy key set is
      // F — LINEAR in the hub degree (one row per label after the
      // map-side combine), never F² like a wedge join; the readout
      // says whether that linearity holds in practice
      "gr_lpa" -> ((e: DataFrame) =>
        Graph.grLpaFromEdges(nodes, e)))
      .filter { case (name, _) => only.isEmpty || only(name) }

    def time(fn: => DataFrame): Double =
      (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min

    // warm-up: absorb codegen/session cost (zipf mode has no f=0 —
    // warm on the mildest tail instead)
    {
      val e0 = edges(if (mode == "zipf") 300 else 0)
      queries.foreach { case (_, q) =>
        q(e0).queryExecution.toRdd.count()
      }
      spark.catalog.clearCache()
    }

    val results = scala.collection.mutable.Map
      .empty[String, List[(Int, Double)]].withDefaultValue(Nil)
    // cost grows with F in hub mode but with SHRINKING s (=f/100) in
    // zipf mode — iterate cheap→expensive so the cutoff skip is sound
    val ordered = if (mode == "zipf") fams.sorted.reverse else fams.sorted
    ordered.foreach { f =>
      val e = edges(f)
      queries.foreach { case (name, q) =>
        val last = results(name).headOption
        if (last.exists(_._2 > cutoffSec)) {
          println(s"""{"metric":"graph_skew_soak","mode":"$mode","query":"$name","family":$f,""" +
            s""""skipped":true,"reason":"t(f=${last.get._1})=""" +
            f"${last.get._2}%.1f" + "s > cutoff\"}")
        } else {
          // a failed run (OOM / spill exhaustion) IS the datapoint:
          // print it, then skip larger F loudly
          try {
            val t = time(q(e))
            results(name) = (f, t) :: results(name)
            println(s"""{"metric":"graph_skew_soak","mode":"$mode","query":"$name","family":$f,""" +
              f""""sec":$t%.3f}""")
          } catch { case e2: Exception =>
            results(name) = (f, cutoffSec + 1) :: results(name)
            val why = Option(e2.getMessage).getOrElse("")
              .replaceAll("[\"\\\\\n\t]", " ").take(160)
            println(s"""{"metric":"graph_skew_soak","mode":"$mode","query":"$name","family":$f,""" +
              s""""failed":"${e2.getClass.getSimpleName}","why":"$why"}""")
          }
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
