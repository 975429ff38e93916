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
  * Usage: sbt "runMain graft.GraphSkewSoak [n] [fams] [iters] [cutoff]"
  * Output: one JSON line per (query, F):
  *   {"metric":"graph_skew_soak","query":q,"family":F,"sec":t}
  */
object GraphSkewSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 300000L
    val fams = (if (args.length > 1) args(1) else "0,4096,16384,65536")
      .split(",").map(_.trim.toInt).toSeq
    val iters = if (args.length > 2) args(2).toInt else 2
    val cutoffSec = if (args.length > 3) args(3).toDouble else 90.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
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
      val base = (0 until Graph.GraphOutDeg).map { i =>
        val (a, b) = (CrossHash.MinHashAs(i), CrossHash.MinHashBs(i))
        nodes.select(col("doc_id").as("src"),
          expr(s"((doc_id * $a + $b) % ${CrossHash.P}) % $n").as("dst"))
      }.reduce(_ unionAll _)
      val withFam = if (f == 0) base else {
        val step = math.max(1L, n / f)
        val spokes = spark.range(f)
          .select((col("id") * step).as("src"), lit(hub).as("dst"))
          .filter(col("src") =!= hub)
        base.unionAll(spokes)
      }
      withFam.filter(col("dst") =!= col("src")).distinct()
        .withColumn("out_deg",
          count(lit(1)).over(Window.partitionBy(col("src"))))
        .localCheckpoint(true)
    }

    val queries: Seq[(String, DataFrame => DataFrame)] = Seq(
      "gr_triangles_id" -> ((e: DataFrame) =>
        Graph.grTrianglesFromEdges(nodes, e)),
      "gr_triangles_deg" -> ((e: DataFrame) =>
        Graph.grTrianglesDegFromEdges(nodes, e)),
      "gr_pagerank" -> ((e: DataFrame) =>
        Graph.grPagerankFromEdges(nodes, e)),
      "gr_components" -> ((e: DataFrame) =>
        Graph.grComponentsFromEdges(nodes, e)))

    def time(fn: => DataFrame): Double =
      (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min

    // warm-up on the base graph: absorb codegen/session cost
    {
      val e0 = edges(0)
      queries.foreach { case (_, q) =>
        q(e0).queryExecution.toRdd.count()
      }
      spark.catalog.clearCache()
    }

    val results = scala.collection.mutable.Map
      .empty[String, List[(Int, Double)]].withDefaultValue(Nil)
    fams.sorted.foreach { f =>
      val e = edges(f)
      queries.foreach { case (name, q) =>
        val last = results(name).headOption
        if (last.exists(_._2 > cutoffSec)) {
          println(s"""{"metric":"graph_skew_soak","query":"$name","family":$f,""" +
            s""""skipped":true,"reason":"t(f=${last.get._1})=""" +
            f"${last.get._2}%.1f" + "s > cutoff\"}")
        } else {
          // a failed run (OOM / spill exhaustion) IS the datapoint:
          // print it, then skip larger F loudly
          try {
            val t = time(q(e))
            results(name) = (f, t) :: results(name)
            println(s"""{"metric":"graph_skew_soak","query":"$name","family":$f,""" +
              f""""sec":$t%.3f}""")
          } catch { case e2: Exception =>
            results(name) = (f, cutoffSec + 1) :: results(name)
            println(s"""{"metric":"graph_skew_soak","query":"$name","family":$f,""" +
              s""""failed":"${e2.getClass.getSimpleName}"}""")
          }
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
