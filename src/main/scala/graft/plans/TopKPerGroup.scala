package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.types.IntegerType

/** Whole-operator custom planning (the SURVEY §2 preference ladder's
  * rung (c)): top-k rows per group as two bounded-heap passes:
  *
  *   partial: per input partition, one k-heap per group (no
  *            distribution requirement, runs map-side) → emits
  *            ≤ k rows per (partition, group);
  *   final:   requires ClusteredDistribution(g) (EnsureRequirements
  *            inserts the Exchange), merges the surviving rows
  *            through the same k-heaps, emits rank 1..k per group.
  *
  * Honest baseline (plan-pinned in TopKSpec): Spark 4's inferred
  * partial WindowGroupLimit already k-bounds the declarative
  * `row_number() <= k` shuffle — but only by FULLY SORTING every
  * input partition first, then sorting again and running the Window
  * rank machinery after the exchange. This operator's win is CPU and
  * memory, not shuffle volume: O(n log k) heap pushes replace both
  * sorts, no Window runs at all, and task memory is bounded at
  * (groups-in-partition)·k rows by construction.
  *
  * Rank semantics are `row_number` over the TOTAL order given by the
  * caller's SortOrders — callers must include a tiebreak (the
  * engine-wide determinism rule); `TopKSpec` pins equality with the
  * declarative window form on the fixture.
  */
case class TopKPerGroup(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {

  require(k >= 1, s"k must be >= 1, got $k") // k=0 would underflow heaps

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // rankAttr is PRODUCED here, not consumed — without this override it
  // lands in `references` and CheckAnalysis reports it missing from
  // the child (the Generate.generatorOutput pattern)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions
    .AttributeSet = org.apache.spark.sql.catalyst.expressions
    .AttributeSet(rankAttr :: Nil)

  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerGroup = copy(child = newChild)
}

/** Planner strategy: logical [[TopKPerGroup]] → partial + final
  * [[TopKPerGroupExec]]. Injected per-session by [[TopK.setup]]
  * (idempotent, the `experimental.extraStrategies` route that needs
  * no session-construction hook) and by `GraftExtensions` for
  * sessions built with `spark.sql.extensions`.
  */
object TopKStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(group, order, k, rankAttr, child) =>
      val partialExec = TopKPerGroupExec(group, order, k, rankAttr,
        partial = true, planLater(child))
      TopKPerGroupExec(group, order, k, rankAttr,
        partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

/** The bounded-heap physical operator (both phases — `partial` flags
  * the map-side pass, whose output order is irrelevant because the
  * final pass re-heaps after the exchange).
  */
case class TopKPerGroupExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  // rankAttr is a constructor expression in BOTH phases (the partial
  // phase just doesn't emit it) — keep it out of `references` or the
  // plan prints with a bogus missing-input marker
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions
    .AttributeSet = org.apache.spark.sql.catalyst.expressions
    .AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(group) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val sortOrders = order
    val limit = k
    val childOutput = child.output
    val isPartial = partial
    val outAttrs = output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // normalize input rows to UnsafeRow before copying into heaps
      val rowProj = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      // total order from the caller's SortOrders, codegen'd once per task
      val ord = GenerateOrdering.generate(sortOrders, childOutput)
      val heapOrd: Ordering[UnsafeRow] = ord.on(r => r: InternalRow)
      // max-heap on the total order: the heap head is the WORST kept
      // row, so a better incoming row evicts it in O(log k)
      val heaps = mutable.LinkedHashMap
        .empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      it.foreach { row =>
        val key = keyProj(row) // transient — copied only on first sight
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(rowProj(row).copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(rowProj(row).copy())
        }
      }
      if (isPartial) heaps.valuesIterator.flatMap(_.iterator)
      else {
        val toUnsafe = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
        val joined = new JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(1)
        heaps.valuesIterator.flatMap { heap =>
          val n = heap.size
          // dequeueAll pops worst-first: element i has rank n - i
          val rows: Seq[UnsafeRow] = heap.dequeueAll
          rows.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.update(0, n - i)
            toUnsafe(joined(row, rankRow))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerGroupExec = copy(child = newChild)
}

/** Column-API entry point. */
object TopK {

  /** Idempotently add [[TopKStrategy]] to the session (the public
    * `experimental.extraStrategies` seam — works on any session, no
    * extensions config needed).
    */
  def setup(spark: SparkSession): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!s.experimental.extraStrategies.contains(TopKStrategy))
      s.experimental.extraStrategies =
        TopKStrategy +: s.experimental.extraStrategies
  }

  /** Also enable the [[RankFilterToTopK]] optimizer rewrite, so
    * declarative `row_number() <= k` filters plan as TopKPerGroup
    * without code changes. Idempotent; [[disableRewrite]] undoes it.
    */
  def enableRewrite(spark: SparkSession): Unit = {
    setup(spark)
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!s.experimental.extraOptimizations.contains(RankFilterToTopK))
      s.experimental.extraOptimizations =
        RankFilterToTopK +: s.experimental.extraOptimizations
  }

  def disableRewrite(spark: SparkSession): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations.filterNot(_ == RankFilterToTopK)
  }

  /** Top-k rows per group as a DataFrame. `orderSpecs` are
    * (columnName, descending) pairs and must form a TOTAL order
    * (include a tiebreak) — ranks are `row_number` semantics over it;
    * computed sort keys are pre-materialized as named columns by the
    * caller (which also keeps them visible in the output, the
    * engine-wide auditability posture). Appends an integer `rank`
    * column (1 = best).
    */
  def perGroup(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      orderSpecs: Seq[(String, Boolean)], k: Int)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    setup(spark)
    val analyzed = df.queryExecution.analyzed
    val resolve = (n: String) => analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val orders = orderSpecs.map { case (n, desc) =>
      SortOrder(resolve(n),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    val rankAttr = AttributeReference("rank", IntegerType, nullable = false)()
    org.apache.spark.sql.GraftPlanApi.ofRows(spark,
      TopKPerGroup(groupCols.map(resolve), orders, k, rankAttr, analyzed))
  }
}
