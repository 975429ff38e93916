package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Whole-thread tree rollup as ONE aggregation — the engine shape for
  * `q16_thread_depth` (reference: the `comments.parent_id` capability
  * script.py:84 stores and analysis.sql never reads).
  *
  * The thread tree is PER-POST by construction: position 1 is the
  * root and position p > 1 parents to `pmod(score+20, p−1) + 1`, a
  * strictly lower position — so depth assignment never crosses a
  * post boundary and the global iterative frontier walk (depth-many
  * full-edge-set joins, one Spark job per level) is paying a
  * distributed-graph price for a problem that is local to each group.
  * This aggregate collects a post's (id, score) pairs — partial
  * buffers concatenate map-side, so the single shuffle moves exactly
  * one (id, score) pair per comment — and computes the entire rollup
  * (comment count, max depth, leaf count, min id at max depth) in one
  * O(n log n) pass at eval. Measured at sf0.1: 4.6 s → ~1 s for the
  * hash-identical result; the frontier-walk twin stays in
  * [[graft.queries.RefQueries.q16ThreadDepthFrontier]], spec-pinned
  * equal, as the shape that generalizes to CROSS-group graphs (CC).
  *
  * Scale posture: state is one buffer per post sized by that post's
  * comment count — thread sizes are human-bounded (a viral thread is
  * ~10⁵ comments ≈ 1.2 MB of buffer), so per-group memory is bounded
  * and groups parallelize across executors; there is no global state
  * and no iteration. Ordering ties on (id, score) are interchangeable
  * in every output (the shipped query's documented contract), so
  * buffer concatenation order never shows.
  *
  * Determinism: every output is an integer; the parent formula uses
  * the SAME positive-mod Int arithmetic as the declarative twin
  * (`pmod` on int columns), including Java wrap on score+20 overflow.
  * Inputs are contractually NON-NULL (update() fails loudly on a null
  * id or score): the positional oracle gives a null-score row a
  * row_number position, so dropping it silently would be an invisible
  * hash divergence — QueriesSpec pins the loud failure.
  */
case class ThreadRollup(idExpr: Expression, scoreExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Int)]] {

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a bigint id column")
    else if (scoreExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an int score column")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("n_comments", LongType, nullable = false),
    StructField("max_depth", IntegerType, nullable = false),
    StructField("n_leaves", LongType, nullable = false),
    StructField("deepest_id", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_thread_rollup"

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Int)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Long, Int)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Int)] = {
    val id = idExpr.eval(input)
    val sc = scoreExpr.eval(input)
    // NON-NULL input contract, enforced loudly: the positional oracle
    // (row_number over every row) assigns a position to a null-score
    // row — an orphaned child, not a removed one — so silently
    // dropping nulls here would be a SILENT hash divergence on any
    // nullable comments source. Fail instead; callers filter or
    // coalesce upstream if nulls are ever legitimate.
    require(id != null && sc != null,
      s"$prettyName requires non-null (id, score) inputs — a null row " +
        "would silently diverge from the positional oracle semantics")
    buf += ((id.asInstanceOf[Long], sc.asInstanceOf[Int]))
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Long, Int)],
      other: mutable.ArrayBuffer[(Long, Int)]): mutable.ArrayBuffer[(Long, Int)] = {
    buf ++= other
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Int)]): Any = {
    val n = buf.length
    if (n == 0) return null
    val arr = buf.toArray
    java.util.Arrays.sort(arr, (a: (Long, Int), b: (Long, Int)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Integer.compare(a._2, b._2)
    })
    val depth = new Array[Int](n)
    val isParent = new Array[Boolean](n)
    depth(0) = 1
    var maxd = 1
    var i = 1
    while (i < n) {
      // 0-based parent index = parent_pos − 1 = pmod(score+20, i);
      // Int arithmetic wraps exactly like the declarative twin's
      val s = arr(i)._2 + 20
      val p = ((s % i) + i) % i
      depth(i) = depth(p) + 1
      isParent(p) = true
      if (depth(i) > maxd) maxd = depth(i)
      i += 1
    }
    var leaves = 0L
    var deepest = Long.MaxValue
    i = 0
    while (i < n) {
      if (!isParent(i)) leaves += 1L
      if (depth(i) == maxd && arr(i)._1 < deepest) deepest = arr(i)._1
      i += 1
    }
    InternalRow(n.toLong, maxd, leaves, deepest)
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (id, sc) => out.writeLong(id); out.writeInt(sc) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Int)] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[(Long, Int)](n)
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readInt())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThreadRollup =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ThreadRollup =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThreadRollup =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}

object ThreadRollup {

  private val FnName = "graft_thread_rollup"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      { args: Seq[Expression] =>
        require(args.length == 2, s"$FnName expects 2 arguments")
        ThreadRollup(args.head, args(1)).toAggregateExpression()
      },
      "built-in")

  /** Per-group thread rollup:
    * `struct<n_comments, max_depth, n_leaves, deepest_id>`.
    */
  def rollup(id: Column, score: Column): Column =
    call_function(FnName, id, score)
}
