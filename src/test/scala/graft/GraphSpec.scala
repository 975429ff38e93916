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
    val (n, adj, _) = localGraphWithSources()
    (n, adj)
  }

  private def localGraphWithSources()
      : (Int, Map[Long, Seq[Long]], Map[Long, String]) = {
    val rows = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val n = rows.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val adj = rows.map { case (id, text, _) =>
      val hex = md.digest(text.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16) % CrossHash.P
      val dsts = (0 until Graph.GraphOutDeg).map { i =>
        ((h * CrossHash.MinHashAs(i) + CrossHash.MinHashBs(i)) %
          CrossHash.P) % n
      }.distinct.filter(_ != id)
      id -> dsts
    }.toMap
    (n, adj, rows.map(r => r._1 -> r._3).toMap)
  }

  test("checkpoint partitioning contract: AQE DROPS a repartitioned " +
    "frame's hashpartitioning at the checkpoint, so pre-partitioning " +
    "iterative edge frames buys nothing (the round-17 LPA negative)") {
    // Behavioral documentation for the round-17 experiment record in
    // SCALE.md: the 'repartition(key).localCheckpoint' idiom — meant
    // to let every fixpoint round's join reshuffle only the small
    // side — only works with AQE OFF (LogicalRDD then remembers its
    // hashpartitioning and the join plans ONE exchange). Under AQE
    // (production default) the checkpoint comes back partitioning-
    // less and the join plans BOTH exchanges, which is why the
    // lpa/pagerank/kcore pre-partition A/Bs read as washes and the
    // idiom is deliberately NOT used. If a Spark upgrade starts
    // preserving partitioning under AQE, this pin fails and the
    // experiment is worth re-running.
    import org.apache.spark.sql.functions._
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key)
    val aqeBefore = spark.conf.get(aqeKey)
    def exchanges(aqe: String): Int = {
      spark.conf.set(key, "-1")
      spark.conf.set(aqeKey, aqe)
      val sym = spark.range(1000)
        .select(col("id").as("u"), (col("id") * 2 % 1000).as("v"))
        .repartition(col("u"))
        .localCheckpoint(true)
      val labels = spark.range(1000)
        .select(col("id").as("u"), col("id").as("lbl"))
      "Exchange hashpartitioning".r.findAllIn(
        sym.join(labels, Seq("u"))
          .queryExecution.executedPlan.toString).size
    }
    try {
      assert(exchanges("false") == 1,
        "without AQE the checkpointed partitioning should survive")
      assert(exchanges("true") == 2,
        "AQE now preserves checkpointed partitioning — re-run the " +
          "round-17 pre-partition experiment (SCALE.md gr_lpa entry)")
    } finally {
      spark.conf.set(key, before)
      spark.conf.set(aqeKey, aqeBefore)
    }
  }

  test("fixture contract: doc_ids are dense 0-based (mod-n targets resolve)") {
    val ids = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L &&
      ids.distinct.length == ids.length)
  }

  test("grEdgesFrom map-side derivation: edge set, duplicate-freedom " +
    "and out_deg equal the local rebuild (round-18 shuffle removal)") {
    // the distinct+window form paid two exchanges for per-row facts;
    // this pins the zero-exchange rewrite to the Spark-free rebuild
    val (_, adj) = localGraph()
    val got = Graph.grEdges(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    val expPairs = adj.toSeq
      .flatMap { case (u, ds) => ds.map(d => (u, d)) }.toSet
    assert(gotPairs == expPairs, "edge set drifted")
    assert(got.length == gotPairs.size, "duplicate (src, dst) emitted")
    got.foreach { case (u, _, od) =>
      assert(od == adj(u).length.toLong, s"out_deg at $u")
    }
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

  test("gr_trustrank equals the local seeded fixpoint; trust reaches " +
    "exactly the seed-reachable set") {
    val (_, adj, srcs) = localGraphWithSources()
    val ssrc = srcs.values.min
    val seeds = srcs.filter(_._2 == ssrc).keySet
    assert(seeds.nonEmpty && seeds.size < srcs.size)
    val base: Map[Long, Long] = adj.keys.map { v =>
      v -> (if (seeds(v)) Graph.PrScale * 15L / 100L / seeds.size else 0L)
    }.toMap
    var r: Map[Long, Long] =
      adj.keys.map(v => v -> (if (seeds(v)) Graph.PrScale / seeds.size
        else 0L)).toMap
    for (_ <- 1 to Graph.PrIters) {
      val recv = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      adj.foreach { case (u, dsts) =>
        if (dsts.nonEmpty && r(u) > 0) {
          val m = r(u) / dsts.length
          dsts.foreach(v => recv(v) += m)
        }
      }
      r = adj.keys
        .map(v => v -> (base(v) + Graph.PrDampNum * recv(v) / 100L)).toMap
    }
    // seed-reachable set within PrIters hops (trust horizon)
    var reach = seeds.map(identity)
    for (_ <- 1 to Graph.PrIters)
      reach = reach ++ reach.flatMap(adj(_))
    val got = Graph.grTrustrank(spark, sf()).collect()
    got.foreach { row =>
      val (id, isSeed, rank) =
        (row.getLong(0), row.getBoolean(1), row.getLong(2))
      assert(rank == r(id), s"trustrank mismatch at doc $id")
      assert(isSeed == seeds(id))
      // the demotion contract: positive trust ⟺ seed-reachable
      // (up to integer-division mass starvation, which only zeroes)
      if (rank > 0) assert(reach(id), s"trust at unreachable doc $id")
      if (isSeed) assert(rank > 0, s"seed $id lost all mass")
    }
    // vacuity: some non-seed nodes hold trust, some hold none
    assert(got.exists(x => !x.getBoolean(1) && x.getLong(2) > 0))
    assert(got.exists(x => x.getLong(2) == 0))
  }

  test("gr_source_trust is exactly gr_trustrank rolled up to source grain") {
    val srcs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = Graph.grTrustrank(spark, sf()).collect()
      .map(r => (srcs(r.getLong(0)), r.getBoolean(1), r.getLong(2)))
    val want = perDoc.groupBy(_._1).map { case (s, rows) =>
      s -> (rows.length.toLong, rows.count(_._2).toLong,
        rows.map(_._3).sum)
    }
    val got = Graph.grSourceTrust(spark, sf()).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, seeds, trust) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == seeds &&
        r.getLong(3) == trust, s"rollup mismatch at ${r.getString(0)}")
      assert(r.getDouble(4) ==
        graft.functions.Determinism.r6Jvm(trust.toDouble / n))
    }
    // the decision signal is present: the seed feed holds the most
    // trust mass, and sources differ
    val bySrc = got.map(r => r.getString(0) -> r.getLong(3)).toMap
    val seedSrc = got.filter(_.getLong(2) > 0).map(_.getString(0))
    assert(seedSrc.length == 1 && bySrc(seedSrc.head) == bySrc.values.max)
    assert(bySrc.values.toSet.size > 1)
  }

  test("gr_reach equals a local BFS: min-dist counts and harmonic micro-sum") {
    val (n, adj) = localGraph()
    val got = Graph.grReach(spark, sf()).collect()
    assert(got.length == n)
    got.foreach { row =>
      val v = row.getLong(0)
      // local BFS to radius 3
      var dist = Map(v -> 0)
      var frontier = Seq(v)
      for (d <- 1 to Graph.ReachHops) {
        val next = frontier.flatMap(adj(_)).distinct
          .filterNot(dist.contains)
        next.foreach(u => dist += u.toLong -> d)
        frontier = next.map(_.toLong)
      }
      val byD = (1 to Graph.ReachHops)
        .map(d => dist.count { case (u, dd) => dd == d && u != v }.toLong)
      assert(row.getLong(1) == byD(0), s"n_d1 at $v")
      assert(row.getLong(2) == byD(1), s"n_d2 at $v")
      assert(row.getLong(3) == byD(2), s"n_d3 at $v")
      val harm = (1 to Graph.ReachHops)
        .map(d => byD(d - 1) * Graph.ReachMicro(d - 1)).sum
      assert(row.getLong(4) == harm, s"harmonic at $v")
    }
    // vacuity: radius-2/3 frontiers actually fire somewhere
    assert(got.exists(_.getLong(2) > 0) && got.exists(_.getLong(3) > 0))
  }

  test("gr_components equals a local union-find over the derived edges") {
    val (n, adj) = localGraph()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    adj.foreach { case (u, dsts) => dsts.foreach(v => union(u, v)) }
    val lbl = adj.keys.map(v => v -> find(v)).toMap
    val sizes = lbl.values.groupBy(identity).map { case (l, xs) =>
      l -> xs.size.toLong
    }
    val got = Graph.grComponents(spark, sf()).collect()
    assert(got.length == n)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == lbl(id), s"component rep at $id")
      assert(r.getLong(2) == sizes(lbl(id)), s"component size at $id")
      assert(r.getBoolean(3) == (id == lbl(id)))
    }
  }

  test("gr_triangles_deg equals gr_triangles on the fixture — one census, " +
    "two plans") {
    val a = Graph.grTriangles(spark, sf()).collect()
    val b = Graph.grTrianglesDeg(spark, sf()).collect()
    assert(a.length == 1 && a.sameElements(b))
  }

  /** Explicit (src, dst, out_deg) frame from an adjacency map — the
    * real-link entry shape every FromEdges seam consumes.
    */
  private def edgeFrame(adj: Map[Long, Seq[Long]])
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rows = adj.toSeq.flatMap { case (u, dsts) =>
      dsts.map(v => (u, v, dsts.length.toLong))
    }
    rows.toDF("src", "dst", "out_deg")
  }

  test("degree-oriented triangles equal id-ordered on a hub graph where " +
    "the two orientations genuinely differ") {
    import spark.implicits._
    // hub = HIGHEST id and HIGHEST degree — adversarial for the
    // id-ordered plan (the hub is the middle of every spoke wedge),
    // neutral for the degree-oriented one (all hub edges point in).
    // Spokes 0..19 each cite the hub; ring edges close 20 triangles.
    val hub = 100L
    val spokes = (0L until 20L)
    val adj: Map[Long, Seq[Long]] =
      spokes.map(i => i -> Seq(hub, (i + 1) % 20)).toMap + (hub -> Seq())
    val nodes = (spokes :+ hub).toDF("doc_id")
    val e = edgeFrame(adj.filter(_._2.nonEmpty))
    val byDeg = Graph.grTrianglesDegFromEdges(nodes, e).collect().head
    val byId = Graph.grTrianglesFromEdges(nodes, e).collect().head
    assert(byDeg == byId)
    // brute force: every triangle is (i, i+1, hub)
    assert(byDeg.getLong(4) == 20L, "triangles")
    assert(byDeg.getLong(0) == 21L && byDeg.getLong(1) == 40L)
    // wedge census: hub deg 20; each spoke deg 3 (hub + two ring sides)
    assert(byDeg.getLong(3) == 20L * 19 / 2 + 20L * (3L * 2 / 2))
  }

  test("gr_clustering equals a brute-force per-node recompute and " +
    "reconciles with the global census") {
    val (n, adj) = localGraph()
    val und = adj.toSeq.flatMap { case (u, dsts) =>
      dsts.map(v => (math.min(u, v), math.max(u, v)))
    }.distinct
    val nbrs = und.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val triAt = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    und.foreach { case (a, b) =>
      (nbrs(a) & nbrs(b)).filter(_ > b).foreach { c =>
        Seq(a, b, c).foreach(v => triAt(v) += 1)
      }
    }
    val got = Graph.grClustering(spark, sf()).collect()
    assert(got.length == n)
    got.foreach { r =>
      val v = r.getLong(0)
      val d = nbrs(v).size.toLong
      assert(r.getLong(1) == d, s"deg at $v")
      assert(r.getLong(2) == triAt(v), s"triangles at $v")
      val cc = if (d < 2) 0.0 else 2.0 * triAt(v) / (d * (d - 1))
      assert(r.getDouble(3) == graft.functions.Determinism.r6Jvm(cc),
        s"local_cc at $v")
    }
    // accounting identity: per-node participation sums to 3·Δ(global)
    val globalTri = Graph.grTriangles(spark, sf()).collect().head.getLong(4)
    assert(got.map(_.getLong(2)).sum == 3 * globalTri)
    // vacuity: the census separates — some node holds a triangle,
    // some linked node holds none
    assert(got.exists(_.getLong(2) > 0))
    assert(got.exists(r => r.getLong(1) > 0 && r.getLong(2) == 0))
  }

  test("gr_clustering on the hub graph: the star hub reads cc~0, ring " +
    "members read cc=2/3 — the spam-star separation") {
    import spark.implicits._
    val hub = 100L
    val spokes = (0L until 20L)
    val adj: Map[Long, Seq[Long]] =
      spokes.map(i => i -> Seq(hub, (i + 1) % 20)).toMap
    val nodes = (spokes :+ hub).toDF("doc_id")
    val e = edgeFrame(adj)
    val got = Graph.grClusteringFromEdges(nodes, e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // hub: deg 20, in 20 triangles, cc = 2·20/(20·19) ≈ 0.105
    assert(got(hub) == ((20L, 20L,
      graft.functions.Determinism.r6Jvm(2.0 * 20 / (20 * 19)))))
    // each spoke: deg 3, 2 triangles (with each ring side), cc = 2/3
    spokes.foreach { s =>
      assert(got(s) == ((3L, 2L,
        graft.functions.Determinism.r6Jvm(2.0 * 2 / (3 * 2)))), s"spoke $s")
    }
  }

  test("the real-link seam: pagerank and components over an explicit " +
    "edge fixture match a local recompute") {
    import spark.implicits._
    // 0→1→2→0 cycle, 3→0, 4 isolated; ids deliberately NOT dense-mod
    // material — the seam must not assume the text derivation
    val adj = Map(0L -> Seq(1L), 1L -> Seq(2L), 2L -> Seq(0L),
      3L -> Seq(0L))
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    val nodes = ids.toDF("doc_id")
    val e = edgeFrame(adj)
    // local integer fixpoint (the gr_pagerank rule)
    val n = ids.length
    val base = Graph.PrScale * 15L / 100L / n
    var r: Map[Long, Long] = ids.map(_ -> Graph.PrScale / n).toMap
    for (_ <- 1 to Graph.PrIters) {
      val recv = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      adj.foreach { case (u, dsts) =>
        val m = r(u) / dsts.length
        dsts.foreach(v => recv(v) += m)
      }
      r = ids.map(v => v -> (base + Graph.PrDampNum * recv(v) / 100L)).toMap
    }
    val got = Graph.grPagerankFromEdges(nodes, e).collect()
    assert(got.length == n)
    got.foreach { row =>
      assert(row.getLong(3) == r(row.getLong(0)),
        s"rank at doc ${row.getLong(0)}")
      assert(row.getLong(1) == adj.getOrElse(row.getLong(0), Seq()).length)
    }
    val cc = Graph.grComponentsFromEdges(nodes, e).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(cc(_) == 0L))
    assert(cc(4L) == 4L)
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

  test("gr_reciprocity equals a local mutual-edge recompute, and a " +
    "hand-built swap ring reads 1.0 where a chain reads 0") {
    val (_, adj) = localGraph()
    val srcOf = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val edges = adj.toSeq.flatMap { case (s, ds) => ds.map(s -> _) }.toSet
    val want = edges.groupBy(e => srcOf(e._1)).map { case (src, es) =>
      src -> (es.size.toLong,
        es.count(e => edges((e._2, e._1))).toLong)
    }
    val got = Graph.grReciprocity(spark, sf()).collect()
    assert(got.length == srcOf.values.toSet.size)
    got.foreach { r =>
      val (ne, nm) = want.getOrElse(r.getString(0), (0L, 0L))
      assert(r.getLong(1) == ne && r.getLong(2) == nm,
        s"census at ${r.getString(0)}")
      assert(r.getDouble(3) == graft.functions.Determinism.r6Jvm(
        if (ne == 0) 0.0 else nm.toDouble / ne))
    }
    // the decision signal, pinned where the fixture can't: a swap ring
    // (A↔B pairs) reads reciprocity 1.0; a one-way chain reads 0
    import spark.implicits._
    val ring = Seq(0L -> 1L, 1L -> 0L, 2L -> 3L, 3L -> 2L)
      .toDF("src", "dst")
    val chain = Seq(4L -> 5L, 5L -> 6L, 6L -> 7L).toDF("src", "dst")
    val nodes = (0L to 7L)
      .map(i => (i, if (i < 4) "ring" else "chain"))
      .toDF("doc_id", "source")
    val mixed = Graph.grReciprocityFromEdges(nodes,
      ring.unionAll(chain)).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(mixed("ring") == 1.0 && mixed("chain") == 0.0)
  }

  test("gr_assortativity equals a local Newman-r recompute") {
    val (_, adj) = localGraph()
    val und = adj.toSeq.flatMap { case (s, ds) =>
      ds.map(d => (math.min(s, d), math.max(s, d)))
    }.distinct
    val dg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    val stubs = und.flatMap { case (a, b) =>
      Seq((dg(a), dg(b)), (dg(b), dg(a)))
    }
    val n = BigInt(stubs.length)
    val sx = stubs.map(s => BigInt(s._1)).sum
    val sxx = stubs.map(s => BigInt(s._1) * s._1).sum
    val sxy = stubs.map(s => BigInt(s._1) * s._2).sum
    val (num, den) = (n * sxy - sx * sx, n * sxx - sx * sx)
    val got = Graph.grAssortativity(spark, sf()).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == und.length.toLong)
    assert(r.getLong(1) == stubs.length.toLong)
    assert(den > 0, "fixture degenerate: constant degree")
    assert(r.getDouble(2) == graft.functions.Determinism
      .r6Jvm(num.toDouble / den.toDouble))
    // the derived near-uniform-degree graph must sit near 0 — a
    // strongly signed r here would mean the moments are wrong
    assert(math.abs(r.getDouble(2)) < 0.5)
  }

  test("gr_hits equals a local floor-renormalized recompute and the " +
    "two sides read different structure") {
    val (n, adj) = localGraph()
    val scale = Graph.HitsScale
    val inAdj = adj.toSeq.flatMap { case (s, ds) => ds.map(_ -> s) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    def renorm(x: Map[Long, Long]): Map[Long, Long] = {
      val t = x.values.sum
      (0L until n.toLong).map { v =>
        val s = x.getOrElse(v, 0L)
        // widened multiply then floor-div — BigInt mirrors the
        // DECIMAL(38,0)/HUGEINT path exactly
        v -> (if (s == 0L) 0L
          else ((BigInt(s) * scale) / t).toLong)
      }.toMap
    }
    var h = (0L until n.toLong).map(v => v -> scale / n).toMap
    var a = h
    for (_ <- 1 to Graph.HitsIters) {
      a = renorm((0L until n.toLong).map { v =>
        v -> inAdj.getOrElse(v, Seq()).map(h).sum
      }.toMap)
      h = renorm((0L until n.toLong).map { v =>
        v -> adj.getOrElse(v, Seq()).map(a).sum
      }.toMap)
    }
    val got = Graph.grHits(spark, sf()).collect()
    assert(got.length == n)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == adj.getOrElse(id, Seq()).length.toLong)
      assert(r.getLong(2) == inAdj.getOrElse(id, Seq()).length.toLong)
      assert(r.getLong(3) == h(id), s"hub at $id")
      assert(r.getLong(4) == a(id), s"auth at $id")
    }
    // structure: no out-edges ⟹ hub exactly 0; no in-edges ⟹ auth
    // exactly 0 (the integer algebra makes the zeros assertable)
    got.foreach { r =>
      if (r.getLong(1) == 0L) assert(r.getLong(3) == 0L)
      if (r.getLong(2) == 0L) assert(r.getLong(4) == 0L)
    }
    // floor-renormalization: each side's mass is ≤ scale and > 0
    val (hs, as_) = (got.map(_.getLong(3)).sum, got.map(_.getLong(4)).sum)
    assert(hs > 0 && hs <= scale && as_ > 0 && as_ <= scale)
    // the two sides genuinely rank differently on this graph
    def top(i: Int) = got.sortBy(r => (-r.getLong(i), r.getLong(0)))
      .take(10).map(_.getLong(0)).toSeq
    assert(top(3) != top(4), "hub and authority rankings collapsed")
  }

  test("gr_kcore equals a local peel, reaches the fixpoint inside the " +
    "round bound, and the cores nest") {
    val (n, adj) = localGraph()
    // undirected adjacency off the derived directed edges
    val und = adj.toSeq.flatMap { case (s, ds) =>
      ds.map(d => (math.min(s, d), math.max(s, d)))
    }.distinct
    val nbrs = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    def peel(k: Int): Map[Long, Int] = {
      var alive = (0L until n.toLong).toSet
      var round = 0
      val out = scala.collection.mutable.Map.empty[Long, Int]
      var changed = true
      while (changed && round < Graph.KCoreRounds) {
        round += 1
        val drop = alive.filter(v =>
          nbrs.getOrElse(v, Set.empty).count(alive) < k)
        changed = drop.nonEmpty
        drop.foreach(out(_) = round)
        alive --= drop
      }
      // fixpoint reached strictly inside the bound — the published
      // constant is not a truncation on this fixture
      assert(alive.forall(v =>
        nbrs.getOrElse(v, Set.empty).count(alive) >= k),
        s"k=$k not converged within ${Graph.KCoreRounds} rounds")
      alive.foreach(out(_) = 0)
      out.toMap
    }
    val want = Graph.KCoreKs.map(k => k -> peel(k)).toMap
    val got = Graph.grKcore(spark, sf()).collect()
    assert(got.length == n * Graph.KCoreKs.size)
    got.foreach { r =>
      val (id, k) = (r.getLong(0), r.getInt(1))
      assert(r.getInt(2) == want(k)(id), s"peel_round at ($id, k=$k)")
      assert(r.getBoolean(3) == (want(k)(id) == 0))
    }
    // both verdicts on the fixture: k=4 keeps a large core, k=5 peels
    // the whole graph
    assert(want(4).values.count(_ == 0) > 0, "k=4 core empty")
    assert(want(5).values.forall(_ != 0), "k=5 core should be empty")
    // core nesting (theorem): the (k+1)-core sits inside the k-core
    val core4 = want(4).collect { case (v, 0) => v }.toSet
    val core5 = want(5).collect { case (v, 0) => v }.toSet
    assert(core5.subsetOf(core4))
  }

  test("gr_lpa equals a local synchronous majority-vote recompute " +
    "(self-vote damping, smallest-label ties) and genuinely splits " +
    "components") {
    val (n, adj) = localGraph()
    val und = adj.toSeq.flatMap { case (s, ds) =>
      ds.map(d => (math.min(s, d), math.max(s, d)))
    }.distinct
    val nbrs = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    var lbl = (0L until n.toLong).map(v => v -> v).toMap
    for (_ <- 1 to Graph.LpaRounds) {
      lbl = (0L until n.toLong).map { v =>
        val votes = nbrs.getOrElse(v, Seq.empty).map(lbl) :+ lbl(v)
        val best = votes.groupBy(identity).toSeq
          .map { case (l, xs) => (xs.length, -l) }.max
        v -> -best._2
      }.toMap
    }
    val sizes = lbl.values.toSeq.groupBy(identity).view
      .mapValues(_.length.toLong)
    val got = Graph.grLpa(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == n)
    got.foreach { case (id, comm, sz) =>
      assert(comm == lbl(id), s"community at $id")
      assert(sz == sizes(comm), s"size at $id")
    }
    // the detector does something CC can't: more than one community,
    // fewer than one-per-node (majority voting actually merged), and
    // at least one community that is a strict subset of its connected
    // component (LPA splits along dense cores)
    val nComms = lbl.values.toSet.size
    assert(nComms > 1 && nComms < n)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    und.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val commOfComp = lbl.keys.toSeq.groupBy(find)
      .map { case (c, vs) => c -> vs.map(lbl).toSet.size }
    assert(commOfComp.values.exists(_ > 1),
      "LPA never split a component — no finer than CC on this fixture")
  }

  test("gr_modularity equals a local BigInt Newman-Q recompute over " +
    "the LPA partition and the bookkeeping identities hold") {
    val (n, adj) = localGraph()
    val und = adj.toSeq.flatMap { case (s, ds) =>
      ds.map(d => (math.min(s, d), math.max(s, d)))
    }.distinct
    val nbrs = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    var lbl = (0L until n.toLong).map(v => v -> v).toMap
    for (_ <- 1 to Graph.LpaRounds) {
      lbl = (0L until n.toLong).map { v =>
        val votes = nbrs.getOrElse(v, Seq.empty).map(lbl) :+ lbl(v)
        val best = votes.groupBy(identity).toSeq
          .map { case (l, xs) => (xs.length, -l) }.max
        v -> -best._2
      }.toMap
    }
    val m = und.length.toLong
    val degOf = nbrs.view.mapValues(_.length.toLong).toMap
    val comms = lbl.keys.toSeq.groupBy(lbl)
    val want = comms.map { case (c, vs) =>
      val dC = vs.map(v => degOf.getOrElse(v, 0L)).sum
      val eC = und.count { case (a, b) => lbl(a) == c && lbl(b) == c }
        .toLong
      val num = BigInt(4) * m * eC - BigInt(dC) * dC
      val den = BigInt(4) * m * m
      c -> (vs.length.toLong, eC, dC,
        graft.functions.Determinism
          .r6Jvm(num.toDouble / den.toDouble))
    }
    val got = Graph.grModularity(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.length == want.size)
    got.foreach { case (c, nn, ec, dc, q) =>
      val (wn, we, wd, wq) = want(c)
      assert(nn == wn && ec == we && dc == wd, s"census at $c")
      assert(q == wq, s"contribution at $c")
    }
    // bookkeeping identities: degree sums cover every stub, internal
    // edges never exceed the graph
    assert(got.map(_._4).sum == 2 * m)
    assert(got.map(_._3).sum <= m)
    // the partition-quality signal: total Q in Newman's range and
    // positive on this fixture (LPA found denser-than-random blocks)
    val q = got.map(_._5).sum
    assert(q > -0.5 && q < 1.0)
    assert(q > 0.0, "LPA partition no better than random rewiring")
  }

  test("gr_kcore convergence seam: the drops==0 production form equals " +
    "the bounded unroll, and the rounds dial bites") {
    import org.apache.spark.sql.functions.col
    val nodes = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edges = Graph.grEdges(spark, sf())
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getBoolean(3))).toSet
    val shipped = rows(Graph.grKcore(spark, sf()))
    // the production swap: peel until a round drops nothing — same
    // output as any bounded unroll that reaches the fixpoint
    val converged = rows(Graph.grKcoreFromEdgesCfg(nodes, edges,
      rounds = 64, converge = true))
    assert(converged == shipped,
      "convergence-check peel diverges from the bounded unroll")
    // the dial is live: a truncating bound misclassifies late layers
    // as in-core (peel_round 0), so the outputs must differ
    val truncated = rows(Graph.grKcoreFromEdgesCfg(nodes, edges,
      rounds = 1))
    assert(truncated != shipped, "rounds dial does not bite")
    // and truncation errs only toward 0 (docs it failed to peel),
    // never invents a peel round
    truncated.foreach { case (id, k, pr, _) =>
      if (pr != 0)
        assert(shipped.contains((id, k, pr, false)),
          s"truncated peel invented a layer at ($id, $k)")
    }
  }

  test("gr_scc on a hand-built graph: cycles group, chains stay " +
    "singletons, and the witness radius truncates honestly") {
    import spark.implicits._
    // 3-cycle {0,1,2}, 2-cycle {3,4}, chain 5→6, isolated 7,
    // 4-cycle {8,9,10,11} (max witness distance 3 = SccHops — still
    // groups whole), 5-cycle {12..16} (adjacent pairs at forward
    // distance 1 need reverse distance 4 > SccHops, but distance-2
    // pairs reverse in 3 — the truncation reports the min-anchored
    // REFINEMENT {12,14,15} + {13,16}, every piece a genuine SCC
    // subset, the documented bounded-witness contract)
    val adj = Map[Long, Seq[Long]](
      0L -> Seq(1L), 1L -> Seq(2L), 2L -> Seq(0L),
      3L -> Seq(4L), 4L -> Seq(3L),
      5L -> Seq(6L), 6L -> Seq(), 7L -> Seq(),
      8L -> Seq(9L), 9L -> Seq(10L), 10L -> Seq(11L), 11L -> Seq(8L),
      12L -> Seq(13L), 13L -> Seq(14L), 14L -> Seq(15L),
      15L -> Seq(16L), 16L -> Seq(12L))
    val nodes = (0L to 16L).toDF("doc_id")
    val got = Graph.grSccFromEdges(nodes, edgeFrame(adj)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Seq(0L, 1L, 2L).foreach(v => assert(got(v) == (0L, 3L), s"at $v"))
    Seq(3L, 4L).foreach(v => assert(got(v) == (3L, 2L), s"at $v"))
    Seq(5L, 6L, 7L).foreach(v => assert(got(v) == (v, 1L), s"at $v"))
    Seq(8L, 9L, 10L, 11L).foreach(v =>
      assert(got(v) == (8L, 4L), s"at $v"))
    // the 5-cycle is ONE true SCC; the 3-hop witness keeps only the
    // distance-2/3 mutual pairs — a refinement, never a merge
    Seq(12L, 14L, 15L).foreach(v => assert(got(v) == (12L, 3L), s"at $v"))
    Seq(13L, 16L).foreach(v => assert(got(v) == (13L, 2L), s"at $v"))
  }

  test("gr_scc equals a local walk-closure recompute on the fixture, " +
    "and grouped nodes are genuinely mutually reachable") {
    val (n, adj) = localGraph()
    // forward ≤SccHops WALK closure (revisits allowed, self-pairs
    // kept — the operator's contract)
    val reach: Map[Long, Set[Long]] = (0L until n.toLong).map { v =>
      var fr: Set[Long] = adj(v).toSet
      var acc = fr
      for (_ <- 2 to Graph.SccHops) {
        fr = fr.flatMap(adj(_))
        acc ++= fr
      }
      v -> acc
    }.toMap
    val sccId = (0L until n.toLong).map { v =>
      val mut = reach(v).filter(u => reach(u).contains(v))
      v -> (mut + v).min
    }.toMap
    val sizes = sccId.values.groupBy(identity).map { case (id, vs) =>
      id -> vs.size.toLong }
    val got = Graph.grScc(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == n)
    got.foreach { case (v, id, sz) =>
      assert(id == sccId(v), s"scc_id at $v")
      assert(sz == sizes(sccId(v)), s"scc_size at $v")
    }
    // soundness spot-check: any two co-labeled nodes mutually reach
    // each other THROUGH the anchor (v→m→w real walks) — verify the
    // anchor witnesses exist
    got.filter(r => r._3 > 1).foreach { case (v, m, _) =>
      if (v != m)
        assert(reach(v).contains(m) && reach(m).contains(v),
          s"anchor witness missing at ($v, $m)")
    }
    // vacuity: the fixture genuinely holds non-trivial cycles
    assert(got.exists(_._3 > 1), "no non-trivial SCC in the fixture?")
  }
}
