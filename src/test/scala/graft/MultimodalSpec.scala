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

  // ---- real javax.imageio decode path -------------------------------

  /** Deterministic 64×48 RGB test image: a seeded block pattern (each
    * 8×8 tile a flat color), PNG-encoded (lossless, so decode(encode)
    * reproduces pixels exactly).
    */
  private def pngBytes(seed: Int, perturb: Int = 0): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val im = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (ty <- 0 until 6; tx <- 0 until 8) {
      val c = rnd.nextInt(1 << 24)
      for (y <- ty * 8 until ty * 8 + 8; x <- tx * 8 until tx * 8 + 8)
        im.setRGB(x, y, c)
    }
    // perturbation: invert `perturb` tiles — enough to move a couple
    // of blockhash bits, not enough to break the hamming bound
    for (t <- 0 until perturb)
      for (y <- 0 until 8; x <- t * 8 until t * 8 + 8)
        im.setRGB(x, y, ~im.getRGB(x, y) & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    out.toByteArray
  }

  test("imageSig: decode(encode(x)) is stable; non-images fall back to byteSig") {
    val a1 = pngBytes(seed = 5)
    val a2 = pngBytes(seed = 5)
    // PNG is lossless and the generator deterministic: same pixels,
    // same signature — across independent encodes
    assert(Multimodal.imageSig(a1).isDefined)
    assert(Multimodal.imageSig(a1) == Multimodal.imageSig(a2))
    // re-encoding the decoded image must also fix the signature
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a1))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    assert(Multimodal.imageSig(out.toByteArray) == Multimodal.imageSig(a1))
    // different content, different signature
    assert(Multimodal.imageSig(a1) != Multimodal.imageSig(pngBytes(seed = 6)))
    // text bytes are not a decodable image → None (the stub boundary)
    assert(Multimodal.imageSig("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("real-PNG near-dup: perturbed copies pair, distinct images don't") {
    import spark.implicits._
    // 4 originals + a lightly perturbed copy of image 0
    val media = Seq(
      Multimodal.MediaRecord(0L, "image", pngBytes(seed = 10)),
      Multimodal.MediaRecord(1L, "image", pngBytes(seed = 11)),
      Multimodal.MediaRecord(2L, "image", pngBytes(seed = 12)),
      Multimodal.MediaRecord(3L, "image", pngBytes(seed = 13)),
      Multimodal.MediaRecord(100L, "image", pngBytes(seed = 10, perturb = 1)))
      .toDS()
    val sigs = Multimodal.signaturesOf(media)
    val sigMap = sigs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sig")).toMap
    // ground truth by brute force over the REAL decoded signatures
    val ids = sigMap.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(sigMap(a) ^ sigMap(b)) <=
        Multimodal.PhashHammingMax
    } yield (a, b)).toSet
    val got = Multimodal.nearDupPairsOf(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // the perturbed copy must be found, and only it
    assert(got == Set((0L, 100L)),
      s"wanted exactly the perturbed pair, got $got")
  }
}
