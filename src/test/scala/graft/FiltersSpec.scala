package graft

import org.apache.spark.sql.functions._
import graft.operators.Filters

/** Quality-filter decisions and PII scrubbing. */
class FiltersSpec extends SparkSpec {

  test("qf_decide drops repetitive and too-short docs with audit flags") {
    val rows = Filters.qfDecide(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = r.getAs[Boolean]("ok_words") &&
        r.getAs[Boolean]("ok_mean_word_len") &&
        r.getAs[Boolean]("ok_symbols") && r.getAs[Boolean]("ok_repetition")
      assert(r.getAs[Boolean]("keep") == expect)
    }
    // the synthetic word-salad fixture must trip the repetition rule
    assert(rows.exists(!_.getAs[Boolean]("ok_repetition")))
    assert(rows.exists(_.getAs[Boolean]("keep")))
  }

  test("qf_redact scrubs emails, urls and phone spans to placeholders") {
    import spark.implicits._
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), Filters.EmailPattern, "<EMAIL>"),
        Filters.UrlPattern, "<URL>"),
      Filters.PhonePattern, "<PHONE>")
    val out = Seq(
      "mail me at jane.doe+x@example.org today",
      "see https://example.com/a?b=1 and http://x.io",
      "call +1 (555) 123-4567 now",
      "clean text with no pii at all")
      .toDF("text").select(redacted.as("r")).collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "see <URL> and <URL>")
    assert(out(2) == "call <PHONE> now")
    assert(out(3) == "clean text with no pii at all")
  }
}
