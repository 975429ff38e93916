package graft

import org.apache.spark.sql.functions._
import graft.functions.TokenRollingHash
import graft.operators.TextAnalysis

/** Text-analysis custom expressions: each pinned to its declarative
  * twin (the formula the DuckDB oracle evaluates).
  */
class TextAnalysisSpec extends SparkSpec {

  test("TokenRollingHash equals the declarative aggregate/transform fold") {
    import spark.implicits._
    TokenRollingHash.register(spark)
    // adversarial whitespace: Spark's trim strips only ' ', split keeps
    // a leading empty token after a leading tab and trailing empties
    // after a trailing tab;   is NOT regex-\s (ASCII classes)
    val adversarial = Seq("", " ", "a", "  a  b\tc  ", "\ta b",
      "a b\t", "a b", "ONE two THREE", "x " * 200,
      "a\u00a0b", "a\u2028b") // NBSP + LS are NOT regex-\s: one token each
    val fixture = graft.operators.TextAnalysis
      .docs(spark, sf("sf0.01")).select(col("text"))
      .collect().map(_.getString(0)).toSeq
    val rows = (adversarial ++ fixture).toDF("text")
      .select(
        TokenRollingHash.fp(lower(col("text"))).as("custom"),
        TextAnalysis.fingerprintDeclarative(lower(col("text")))
          .as("declarative"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
