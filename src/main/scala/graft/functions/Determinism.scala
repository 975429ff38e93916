package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Output canonicalization shared by every oracle-checked query. */
object Determinism {

  /** Round to 6 decimals AND normalize IEEE signed zero: DuckDB's round
    * keeps -0.0 while Spark's BigDecimal-based round emits +0.0 —
    * numerically equal but distinct under a value hash. `x + 0.0` maps
    * -0.0 → +0.0 in round-to-nearest; oracle SQL mirrors with
    * `(round(x, 6) + 0.0)`.
    */
  def r6(c: Column): Column = round(c, 6) + lit(0.0)

  /** Oracle-side (DuckDB) twin of [[r6]]. */
  def r6Sql(e: String): String = s"(round($e, 6) + 0.0)"

  /** Driver/JVM twin of [[r6]] for stateful streaming outputs that
    * must row-compare equal to an r6'd batch column: Spark's `Round`
    * on DOUBLE goes through `BigDecimal.valueOf(x).setScale(6,
    * HALF_UP)` — mirror that exactly, then the same signed-zero
    * normalization.
    */
  def r6Jvm(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
}
