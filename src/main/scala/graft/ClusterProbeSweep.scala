package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness for the LAST unmeasured ANN dial: the probe
  * setting of `sim_semantic_clusters_ann`'s pair discovery. The
  * shipped entry runs at exhaustive probe so the driver can
  * hash-verify banded == exact every round; at 100 TB the operator
  * runs at probe ≪ cells, and the cost of that dial at CLUSTER grain
  * is EDGE recall (a lost edge can split a cluster), which
  * `sim_ivf_tuning`'s serving-grain recall@k does not directly
  * answer. This main measures it: for each probe p, the
  * threshold-surviving pair set from the IVF candidate stream is
  * compared against the exhaustive set (pair recall; precision is 1
  * by construction — every candidate pays exact cosine before the
  * threshold).
  *
  * Usage: `runMain graft.ClusterProbeSweep [sfDir] [probes]`.
  * Output: one JSON line per probe {probe, n_pairs, n_exact, recall,
  * sec}. Results live in SCALE.md beside the crossover table.
  */
object ClusterProbeSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val probes = (if (args.length > 1) args(1) else "1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    def pairSet(p: Int): (Set[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val s = Similarity.semanticClusterPairsAnn(spark, sfDir, p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (s, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, _) = pairSet(Similarity.IvfCells) // warm + ground truth
    probes.foreach { p =>
      val (got, sec) = pairSet(p)
      val hit = got.count(exact.contains)
      println(s"""{"metric":"cluster_probe","probe":$p,""" +
        s""""n_pairs":${got.size},"n_exact":${exact.size},""" +
        s""""recall":${if (exact.isEmpty) 1.0
          else hit.toDouble / exact.size},"sec":$sec}""")
    }
    spark.stop()
  }
}
