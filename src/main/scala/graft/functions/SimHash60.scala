package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 60-bit token SimHash of a string: per token, the 60-bit md5 hash
  * votes +1/−1 on each bit position; signature bit j is set iff the
  * vote sum is positive — bitwise identical to dd_simhash's
  * declarative explode + 60-bit-sum formulation and its DuckDB twin
  * (DedupSpec pins the equivalence).
  *
  * Why an expression: the declarative signature is a Generate (one row
  * per token) feeding a 60-aggregate groupBy — a full shuffle of the
  * exploded token stream just to fold votes that are local to each
  * document. Here the whole signature is one eval per row: map-only,
  * ZERO shuffle (measured: dd_simhash 1.32 s → 0.52 s, and
  * dd_simhash_pairs — which builds on the signatures — 1.86 s →
  * 0.86 s at sf0.1). At 100 TB the difference is an entire exploded
  * shuffle stage. Tokenization shared via
  * [[TokenRollingHash.splitTokens]].
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = TokenRollingHash.splitTokens(input.toString)
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](SimHash60.Bits)
    var i = 0
    while (i < toks.length) {
      val h = CharGramHashSet.hash60(md, toks(i))
      var j = 0
      while (j < SimHash60.Bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < SimHash60.Bits) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  /** Signature width — md5Long's 60 bits (matches Dedup.SimhashBits). */
  val Bits = 60

  private val FnName = "graft_simhash"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      { args: Seq[Expression] =>
        require(args.length == 1, s"$FnName expects 1 argument")
        SimHash60(args.head)
      },
      "built-in")

  /** 60-bit token SimHash of a string column. */
  def sig(c: Column): Column = call_function(FnName, c)
}
