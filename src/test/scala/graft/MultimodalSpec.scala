package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal decode-stage operators: signature determinism and the
  * completeness of the banded near-dup pairing.
  */
class MultimodalSpec extends SparkSpec {

  test("mm_phash matches an independent blockhash recompute") {
    val sigs = Multimodal.mmPhash(spark, sf("sf0.01")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("sig")).toMap
    val texts = graft.operators.TextAnalysis.docs(spark, sf("sf0.01"))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val sums = new Array[Long](Multimodal.PhashBits)
      bytes.zipWithIndex.foreach { case (b, i) =>
        sums(i % Multimodal.PhashBits) += (b & 0xff).toLong
      }
      val total = sums.sum
      val want = sums.zipWithIndex.collect {
        case (s, k) if Multimodal.PhashBits * s > total => 1L << k
      }.foldLeft(0L)(_ | _)
      assert(sigs(id) == want, s"doc $id")
    }
  }

  test("mm_near_dup finds EVERY pair within the hamming bound") {
    val sigs = Multimodal.mmPhash(spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("sig")))
    // brute-force ground truth over all pairs
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= Multimodal.PhashHammingMax
    } yield (ia, ib)).toSet
    val got = Multimodal.mmNearDup(spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want) // banding is pigeonhole-complete, not a heuristic
    assert(got.nonEmpty, "fixture should produce near-dup media pairs")
  }
}
