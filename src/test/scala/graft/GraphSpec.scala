package graft

import org.apache.spark.sql.functions._
import graft.functions.CrossHash
import graft.operators.Graph

/** Link-graph analytics: the derived citation graph's contract, an
  * INDEPENDENT local recompute of the integer PageRank fixpoint, the
  * brute-force triangle count, and the degree-census accounting
  * identities.
  */
class GraphSpec extends SparkSpec {

  /** Local, Spark-free rebuild of the derived graph: java MessageDigest
    * md5 → first-15-hex-chars parse → mod P → the three affine
    * transforms. Independent of CrossHash's Column implementation —
    * only the published constants are shared.
    */
  private def localGraph(): (Int, Map[Long, Seq[Long]]) = {
    val rows = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = rows.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val adj = rows.map { case (id, text) =>
      val hex = md.digest(text.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16) % CrossHash.P
      val dsts = (0 until Graph.GraphOutDeg).map { i =>
        ((h * CrossHash.MinHashAs(i) + CrossHash.MinHashBs(i)) %
          CrossHash.P) % n
      }.distinct.filter(_ != id)
      id -> dsts
    }.toMap
    (n, adj)
  }

  test("fixture contract: doc_ids are dense 0-based (mod-n targets resolve)") {
    val ids = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L &&
      ids.distinct.length == ids.length)
  }

  test("gr_pagerank equals an independent local integer recompute") {
    val (n, adj) = localGraph()
    // local fixpoint: BigInt-free long arithmetic, same published rule
    val base = Graph.PrScale * 15L / 100L / n
    var r: Map[Long, Long] =
      adj.keys.map(_ -> Graph.PrScale / n).toMap
    for (_ <- 1 to Graph.PrIters) {
      val recv = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      adj.foreach { case (u, dsts) =>
        if (dsts.nonEmpty) {
          val m = r(u) / dsts.length
          dsts.foreach(v => recv(v) += m)
        }
      }
      r = adj.keys.map(v => v -> (base + Graph.PrDampNum * recv(v) / 100L))
        .toMap
    }
    val got = Graph.grPagerank(spark, sf()).collect()
    assert(got.length == n)
    got.foreach { row =>
      val (id, outDeg, inDeg, rank) =
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      assert(rank == r(id), s"rank mismatch at doc $id")
      assert(outDeg == adj(id).length)
      assert(inDeg == adj.valuesIterator.map(_.count(_ == id)).sum)
    }
    // evaporation contract: total mass never exceeds the injected scale
    assert(got.map(_.getLong(3)).sum <= Graph.PrScale)
  }

  test("gr_triangles equals the brute-force count on the local edge set") {
    val (nDocs, adj) = localGraph()
    val und = adj.toSeq.flatMap { case (u, dsts) =>
      dsts.map(v => (math.min(u, v), math.max(u, v)))
    }.distinct
    val undSet = und.toSet
    val deg = und.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val nbrs = und.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val tris = und.map { case (a, b) =>
      (nbrs(a) & nbrs(b)).count(c => c > b)
    }.sum
    val row = Graph.grTriangles(spark, sf()).collect().head
    assert(row.getLong(0) == nDocs)
    assert(row.getLong(1) == und.length)
    assert(row.getLong(2) == deg.size)
    assert(row.getLong(3) == wedges)
    assert(row.getLong(4) == tris)
    // every counted triangle is really three edges
    assert(und.forall { case (a, b) => a < b && undSet.contains((a, b)) })
  }

  test("gr_degree accounting: both sides sum to |E| and cover every node") {
    val (n, adj) = localGraph()
    val nEdges = adj.valuesIterator.map(_.length.toLong).sum
    val rows = Graph.grDegree(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for (side <- Seq("in", "out")) {
      val s = rows.filter(_._1 == side)
      assert(s.map(r => r._2 * r._3).sum == nEdges, s"$side degree mass")
      assert(s.map(_._3).sum == n, s"$side node coverage")
      // census rows are distinct degrees
      assert(s.map(_._2).distinct.length == s.length)
    }
    // out-degree can never exceed the derivation's fan-out
    assert(rows.filter(_._1 == "out").forall(_._2 <= Graph.GraphOutDeg))
  }
}
