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

  test("mm_frames agrees with mm_features' per-video sampling geometry") {
    val feats = Multimodal.mmFeatures(spark, sf("sf0.01")).collect()
      .filter(_.getAs[String]("media_type") == "video")
      .map(r => r.getLong(0) ->
        (r.getAs[Int]("n_frames"), r.getAs[Int]("sampled_frames"))).toMap
    val frames = Multimodal.mmFrames(spark, sf("sf0.01")).collect()
      .groupBy(_.getLong(0))
    assert(frames.keySet == feats.keySet)
    frames.foreach { case (id, fs) =>
      val (nf, sampled) = feats(id)
      assert(fs.length == sampled, s"doc $id frame count")
      val idxs = fs.map(_.getAs[Int]("frame_idx")).sorted
      assert(idxs.head == 0 && idxs.last < nf, s"doc $id index range")
      // constant stride between consecutive sampled indices
      val strides = idxs.sliding(2).map { case Array(a, b) => b - a }.toSet
      assert(strides.size <= 1, s"doc $id stride drift")
      // digests are per-frame distinct
      assert(fs.map(_.getAs[String]("frame_md5")).distinct.length == fs.length)
    }
  }
}
