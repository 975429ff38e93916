package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, expr, min, when}

/** Exact rank-ceil quantile selection over a (value, count, cumulative)
  * relation — the machinery behind `prof_outliers`, `ev_funnel_time`
  * and `ev_session_stats`: the q-quantile is the value at 1-based rank
  * `ceil(q·n)` with q = num/den, computed in PURE INTEGER arithmetic,
  * so both engines select the identical element (no interpolation, no
  * float near a rank boundary). ONE definition of the rank rule feeds
  * the Spark expression and the DuckDB oracle fragment — the
  * [[graft.functions.CrossHash]] shared-fragment rule applied to
  * quantiles.
  *
  * Consumers reduce to DISTINCT values first (the relation carries
  * (v, cnt)), then run the cumulative window — so the single-partition
  * sort is bounded by the value domain, not the corpus.
  */
object ExactRank {

  /** `ceil(num·n/den)` as integer arithmetic: `(num·n + den − 1) div den`.
    * Valid for n ≥ 0, num/den > 0.
    */
  def rankExpr(num: Int, den: Int, n: String): String =
    s"($num * $n + ${den - 1}) div $den"

  /** Oracle twin of [[rankExpr]] (DuckDB `//` ≡ Spark `div` here: all
    * operands non-negative).
    */
  def rankSql(num: Int, den: Int, n: String): String =
    s"($num * $n + ${den - 1}) // $den"

  /** Aggregate selecting the value whose cumulative range
    * `(cum − cnt, cum]` contains rank ceil(num·n/den) — exactly one
    * value qualifies, so MIN is pure selection.
    *
    * `n` is an expression string resolvable in the consumer's plan
    * (a column carrying the total count).
    */
  def valueAt(num: Int, den: Int, n: String, v: Column): Column = {
    val r = expr(rankExpr(num, den, n))
    min(when(col("cum") >= r && col("cum") - col("cnt") < r, v))
  }

  /** Oracle twin of [[valueAt]] over columns `cum`, `cnt` and `$v`. */
  def valueAtSql(num: Int, den: Int, n: String, v: String): String = {
    val r = rankSql(num, den, n)
    s"MIN(CASE WHEN cum >= $r AND cum - cnt < $r THEN $v END)"
  }
}
