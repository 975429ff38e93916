package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Corpus-preparation operators: split stability, normalization
  * canonicalization, packing layout invariants.
  */
class CorpusSpec extends SparkSpec {

  test("cp_split covers ~80/10/10, is total, and is stable per doc") {
    val rows = Corpus.cpSplit(spark, sf("sf0.01")).collect()
    assert(rows.length == 500)
    val bySplit = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length)
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 350 && bySplit("train") < 450) // ~80%
    // stability: same assignment on re-run (pure function of doc_id)
    val again = Corpus.cpSplit(spark, sf("sf0.01")).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(2))).toSeq)
  }

  test("cp_normalize canonicalizes case/whitespace/NFC to one digest") {
    import spark.implicits._
    graft.functions.NfcNormalize.register(spark)
    // é as precomposed U+00E9 vs e + combining acute U+0301
    val df = Seq("Café  World", "café world").toDF("text")
    val norm = regexp_replace(
      trim(lower(graft.functions.NfcNormalize.nfc(col("text")))), "\\s+", " ")
    val out = df.select(md5(norm).as("d")).collect().map(_.getString(0))
    assert(out(0) == out(1)) // both normalize to "café world"
  }

  test("cp_pack tiles the token stream with no gaps or overlaps") {
    val rows = Corpus.cpPack(spark, sf("sf0.01"))
      .orderBy(col("doc_id")).collect()
    var expectedStart = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("start_off") == expectedStart)
      assert(r.getAs[Long]("pack_id") ==
        expectedStart / Corpus.PackBudget)
      assert(r.getAs[Long]("pack_offset") ==
        expectedStart % Corpus.PackBudget)
      expectedStart += r.getAs[Long]("n_tokens")
    }
  }
}
