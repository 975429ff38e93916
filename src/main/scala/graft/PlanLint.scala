package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan

/** Dev tool: sweep EVERY SparkEntry query's physical plan for
  * scale-killer shapes and print one line per finding. The shapes the
  * per-round plan audits look for by hand, mechanized:
  *
  *   - `cartesian`: CartesianProductExec — an unpartitioned all-pairs
  *     join; never acceptable in a shipped query.
  *   - `bnlj`: BroadcastNestedLoopJoinExec — acceptable ONLY when the
  *     broadcast side is constant-size by construction (a 1-row scalar
  *     anchor or a fixed-size eval set); each instance must be
  *     allowlisted with its reason in PlanLintSpec.
  *   - `udf`: ScalaUDF anywhere — the engine's no-UDF rule.
  *   - `fallback`: a CodegenFallback expression inside a Project or
  *     Filter (the per-row hot path); interpreted + boxed evaluation.
  *     Aggregate-buffer internals are exempt — Spark's own sketch
  *     aggregates (HLL++) are ImperativeAggregates by design.
  *   - `global_window`: a WindowExec (or WindowGroupLimitExec) with NO
  *     partition spec — every input row moves to ONE partition.
  *     Acceptable ONLY when the window's input is bounded by
  *     construction (a value census, a sources/day-grain relation) or
  *     is a documented bit-parity baseline with a sharded 100 TB twin;
  *     each instance must be allowlisted with its reason in
  *     PlanLintSpec (the round-18 verdict's item 3, mechanized).
  *
  * Usage: sbt "runMain graft.PlanLint <sfDir> [namesCsv]"
  * PlanLintSpec pins the findings of this sweep; the tool exists for
  * interactive triage when the spec fails.
  */
object PlanLint {

  /** (kind, detail) findings for one physical plan. */
  def findings(plan: SparkPlan): Seq[(String, String)] = {
    val nodes = plan.collect { case p => p }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    nodes.foreach { n =>
      n.nodeName match {
        case "CartesianProduct" =>
          out += (("cartesian", n.simpleStringWithNodeId()))
        case "BroadcastNestedLoopJoin" =>
          out += (("bnlj", n.simpleStringWithNodeId()))
        case _ => ()
      }
      n match {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty =>
          out += (("global_window", n.simpleStringWithNodeId()))
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty =>
          out += (("global_window", n.simpleStringWithNodeId()))
        case _ => ()
      }
    }
    def exprTrees(e: Expression): Seq[Expression] = e.collect { case x => x }
    nodes.foreach { n =>
      val hot = n.nodeName == "Project" || n.nodeName == "Filter"
      n.expressions.flatMap(exprTrees).foreach {
        case u if u.nodeName == "ScalaUDF" =>
          out += (("udf", s"${n.nodeName}: ${u.sql}"))
        case f: CodegenFallback if hot =>
          out += (("fallback", s"${n.nodeName}: ${f.prettyName}"))
        case _ => ()
      }
    }
    out.toSeq.distinct
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        val fs =
          try findings(fn(spark, sfDir).queryExecution.sparkPlan)
          catch { case e: Throwable =>
            Seq(("error", e.getClass.getSimpleName + ": " + e.getMessage))
          }
        fs.foreach { case (kind, detail) =>
          flagged += 1
          println(s"[planlint] $name $kind $detail")
        }
      }
    }
    println(s"[planlint] total findings: $flagged")
    spark.stop()
  }
}
