package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access point for building a DataFrame from a custom LogicalPlan —
  * the established public pattern for third-party plan nodes (used by
  * Qbeast's DatasetFactory and Pathling's ColumnDataset, see
  * SNIPPETS.md [1]/[3]): a one-method object placed in
  * `org.apache.spark.sql` so the `private[sql]` Dataset factory is
  * reachable, keeping everything else of the engine outside Spark's
  * namespace.
  */
object GraftPlanApi {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → Catalyst Expression (Spark 4 keeps `Column` engine-
    * agnostic; the classic converter is `private[sql]`).
    */
  def expressionOf(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
