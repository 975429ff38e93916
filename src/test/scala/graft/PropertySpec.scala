package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.functions.{CharGramHashSet, CrossHash}
import graft.operators.Dedup
import graft.transform.Enrich

/** Property-style invariants (SURVEY.md §5.2.4) over seeded random
  * inputs — deterministic, no generator-library dependency.
  */
class PropertySpec extends SparkSpec {

  private val rnd = new Random(42)

  test("score_category is total over Int (never null, one of 5 labels)") {
    import spark.implicits._
    val labels = Set("Negative", "Low", "Medium", "High", "Viral")
    val scores = Seq(Int.MinValue + 1, -1, 0, 1, 10, 11, 100, 1000, 1001,
      Int.MaxValue) ++ Seq.fill(200)(rnd.nextInt())
    val out = scores.toDF("score")
      .select(Enrich.scoreCategory(col("score")).as("c"))
      .collect().map(_.getString(0))
    assert(out.length == scores.length && out.forall(labels.contains))
  }

  test("engagement_rate is finite for all score != -1") {
    import spark.implicits._
    val xs = Seq.fill(300)((rnd.nextInt(2001) - 1000, rnd.nextInt(10000)))
      .filter(_._1 != -1)
    val out = xs.toDF("score", "num_comments")
      .select(Enrich.engagementRate(col("num_comments"), col("score")).as("e"))
      .collect().map(_.getDouble(0))
    assert(out.forall(e => !e.isNaN && !e.isInfinite))
  }

  test("JVM-side gram hash equals the SQL-side md5/conv formulation") {
    import spark.implicits._
    val ss = Seq.fill(100)(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
    val viaSql = ss.toDF("s").select(CrossHash.md5Mod(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val viaJvm = ss.map(s => CharGramHashSet.hash(md, s))
    assert(viaSql == viaJvm)
  }

  test("minhash of a superset never exceeds the subset's minimum") {
    // min over a larger set can only stay or decrease — the property
    // banded LSH relies on
    def mins(xs: Seq[Long]): Seq[Long] =
      Dedup.As.zip(Dedup.Bs).map { case (p, q) =>
        xs.map(h => ((h % CrossHash.P) * p + q) % CrossHash.P).min
      }
    (1 to 50).foreach { _ =>
      val a = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs)
      val b = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs)
      val ma = mins(a)
      val mab = mins(a ++ b)
      assert(ma.zip(mab).forall { case (x, y) => y <= x })
    }
  }

  test("upsert key invariant: distinct (subreddit, date) after any merge") {
    import spark.implicits._
    import java.nio.file.Files
    val wh = Files.createTempDirectory("graft_prop_").toString
    (1 to 3).foreach { i =>
      val batch = Seq.fill(20)((s"r/${rnd.nextInt(4)}",
        s"2025-01-0${1 + rnd.nextInt(5)}", rnd.nextInt(100).toLong))
        .toDF("subreddit", "date", "total_posts")
        .dropDuplicates("subreddit", "date")
      graft.sink.Load.upsertStats(batch, spark, wh)
      val out = spark.read.parquet(s"$wh/subreddit_stats")
      assert(out.count() ==
        out.select("subreddit", "date").distinct().count())
    }
  }
}
