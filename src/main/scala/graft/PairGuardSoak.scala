package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the ONE claim the round-13 100× soak left inferred: that
  * the LSH bucket-size guard converts the mega-bucket pair blowup into
  * a bounded run. ScaleSoak's multiplier axis grows the CORPUS (its
  * Caesar-decorrelated fixtures keep buckets organic by design, so the
  * guard never fires there); this main grows the other axis — the
  * size of ONE template family injected into a fixed base corpus, the
  * real-world mega-bucket analogue (boilerplate, spam, scaffold docs)
  * — and times each pair-tier query capped vs uncapped.
  *
  * Fixture (`/tmp/graft_clique/f{F}`): the base documents table plus F
  * byte-identical template docs with fresh ids above the base range
  * (one band bucket of size F per band on both streams — minhash and
  * char-gram signatures are both degenerate on identical text).
  * Embeddings copied unchanged (the semantic stream is not under
  * test).
  *
  * Expected shape, stated up front so the output reads as a check:
  * uncapped within-family candidate volume is F·(F−1)/2 pairs EACH
  * paying the verify merge (cost ∝ F², the spill driver); capped
  * drops the family's buckets at the census (F > cap ⟹ zero family
  * candidates), so cost stays at the base corpus's level — flat in F.
  *
  * Cutoff discipline: a query whose last measured time exceeds
  * `cutoffSec` skips larger F WITH AN EXPLICIT skip line — by then
  * the superlinear finding is made (no silent caps).
  *
  * Output: one JSON line per (query, F):
  *   {"metric":"pair_guard_soak","query":q,"family":F,"sec":t}
  */
object PairGuardSoak {

  /** (uncapped, capped) twins across the pair tier — both band
    * streams plus the clustering composition.
    */
  val Twins: Seq[(String, String)] = Seq(
    "dd_minhash_lsh" -> "dd_minhash_lsh_capped",
    "dd_ngram_jaccard_lsh" -> "dd_ngram_jaccard_lsh_capped",
    "dd_clusters_star" -> "dd_clusters_capped")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val fams = (if (args.length > 1) args(1) else "0,1024,4096,16384")
      .split(",").map(_.trim.toInt).toSeq
    val iters = if (args.length > 2) args(2).toInt else 2
    // low default: uncapped cost grows ∝ F², so a 60 s measurement at
    // F predicts ~16 min at 4F — the finding is made, skip loudly
    val cutoffSec = if (args.length > 3) args(3).toDouble else 60.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ~60 distinct words so the template is a realistic boilerplate
    // doc (non-trivial shingle/gram sets), constant so runs reproduce
    val template = (1 to 60).map(i => s"boilerplate$i").mkString(" ")

    def derive(f: Int): String = {
      if (f == 0) return sfDir
      val dir = s"/tmp/graft_clique/f$f"
      val done = new java.io.File(s"$dir/_DONE")
      if (done.exists()) return dir
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
      val fam = (1 to f).map(i => (maxId + i, template)).toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("tmpl").as("source"),
          length(col("text")).cast("long").as("n_chars"))
      base.select(fam.columns.map(col): _*).unionByName(fam)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      done.createNewFile()
      dir
    }

    def time(fn: => DataFrame): Double =
      (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min

    // warm-up: absorb session/codegen cost before the first timed run;
    // caches/checkpoints cleared per query — six cache-heavy plans
    // accumulated in one heap OOM'd an earlier version of this main
    Twins.flatMap(t => Seq(t._1, t._2)).foreach { q =>
      try SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Exception =>
        println(s"""{"metric":"pair_guard_soak","query":"$q","warmup_err":""" +
          s""""${e.getClass.getSimpleName}"}""") }
      spark.catalog.clearCache()
    }

    val results = scala.collection.mutable.Map
      .empty[String, List[(Int, Double)]].withDefaultValue(Nil)
    fams.sorted.foreach { f =>
      val dir = derive(f)
      Twins.flatMap(t => Seq(t._1, t._2)).foreach { q =>
        val last = results(q).headOption
        if (last.exists(_._2 > cutoffSec)) {
          println(s"""{"metric":"pair_guard_soak","query":"$q","family":$f,""" +
            s""""skipped":true,"reason":"t(f=${last.get._1})=""" +
            f"${last.get._2}%.1f" + "s > cutoff\"}")
        } else {
          // a failed run (OOM, disk-full spill — the uncapped blowup
          // manifests as either) IS a datapoint: print it, then treat
          // the query as over-cutoff so larger F skip loudly
          try {
            val t = time(SparkEntry.queries(q)(spark, dir))
            results(q) = (f, t) :: results(q)
            println(s"""{"metric":"pair_guard_soak","query":"$q","family":$f,""" +
              f""""sec":$t%.3f}""")
          } catch { case e: Exception =>
            results(q) = (f, cutoffSec + 1) :: results(q)
            println(s"""{"metric":"pair_guard_soak","query":"$q","family":$f,""" +
              s""""failed":"${e.getClass.getSimpleName}"}""")
          }
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
