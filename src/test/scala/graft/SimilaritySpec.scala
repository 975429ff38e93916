package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Similarity-search operators (the pieces not already pinned by
  * DedupSpec's ivfServe/recall coverage).
  */
class SimilaritySpec extends SparkSpec {

  test("sim_pq emits valid codes and a quantization win over the zero baseline") {
    val rows = Similarity.simPq(spark, sf("sf0.01")).collect()
    assert(rows.length == 500)
    val codeCols = 1 to 4
    rows.foreach { r =>
      codeCols.foreach { i =>
        val c = r.getLong(i)
        assert(c >= 0 && c < Similarity.PqK, s"code out of range: $r")
      }
      assert(r.getDouble(5) >= 0.0, s"negative mse: $r")
    }
    // the codebook is actually used: several distinct codes per block
    codeCols.foreach { i =>
      assert(rows.map(_.getLong(i)).distinct.length > 1, s"block $i collapsed")
    }
    // reconstruction must beat the zero-codebook baseline (mean |v|^2/Dim)
    val meanMse = rows.map(_.getDouble(5)).sum / rows.length
    val vecs = spark.read
      .parquet(sf("sf0.01") + "/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
      .collect().map(_.getSeq[Double](0))
    val meanNorm = vecs.map(v => v.map(x => x * x).sum / Similarity.Dim)
      .sum / vecs.length
    // random-ish 64-dim data quantizes modestly (8 codes × 16 dims):
    // the invariant is a strict win, not a compression miracle
    assert(meanMse < meanNorm,
      s"PQ mse $meanMse should beat the zero-codebook baseline $meanNorm")
  }
}
