package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharGramHashSet, DotProduct, MinHash16, NfcNormalize,
  RepetitionStats, SimHash60, SortedIntersectCount, SortedJaccardGE,
  TokenRollingHash, WordGramHashes, WordShingleHashSet}

/** Spark extensions entry point: registers the engine's custom
  * Catalyst expressions so ANY session created with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`) can call them from SQL
  * text — `SELECT graft_dot(a, b)` — as well as via the Column API.
  * The per-session `register(spark)` helpers on each function object
  * remain for sessions created without extensions (the driver's
  * Verify/Bench path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
        "", "", "", "", "", "", "built-in")

    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two array<double>"),
      { args: Seq[Expression] => DotProduct(args.head, args(1)) }))

    ext.injectFunction((
      FunctionIdentifier("graft_intersect_sorted"),
      info("graft_intersect_sorted",
        "graft_intersect_sorted(a, b) - set-intersection count of sorted array<bigint>"),
      { args: Seq[Expression] => SortedIntersectCount(args.head, args(1)) }))

    ext.injectFunction((
      FunctionIdentifier("graft_gram_hashes"),
      info("graft_gram_hashes",
        "graft_gram_hashes(s) - sorted distinct md5-derived 5-gram hash set"),
      { args: Seq[Expression] => CharGramHashSet(args.head) }))

    ext.injectFunction((
      FunctionIdentifier("graft_jaccard_ge"),
      info("graft_jaccard_ge",
        "graft_jaccard_ge(a, b, min) - Jaccard of sorted array<bigint> sets, NULL below min"),
      { args: Seq[Expression] => SortedJaccardGE(args.head, args(1), args(2)) }))

    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(s) - Unicode NFC normalization"),
      { args: Seq[Expression] => NfcNormalize(args.head) }))

    ext.injectFunction((
      FunctionIdentifier("graft_rolling_fp"),
      info("graft_rolling_fp",
        "graft_rolling_fp(s) - rolling md5-token fingerprint mod P"),
      { args: Seq[Expression] => TokenRollingHash(args.head) }))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(s) - 60-bit token SimHash"),
      { args: Seq[Expression] => SimHash60(args.head) }))

    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(s) - sorted distinct word-3-gram hash set"),
      { args: Seq[Expression] => WordShingleHashSet(args.head) }))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash16"),
      info("graft_minhash16",
        "graft_minhash16(hs) - 16 MinHash values of a mod-P hash set " +
          "(e.g. graft_shingle_hashes output; full 60-bit hashes rejected)"),
      { args: Seq[Expression] => MinHash16(args.head) }))

    ext.injectFunction((
      FunctionIdentifier("graft_word_gram_hashes"),
      info("graft_word_gram_hashes",
        "graft_word_gram_hashes(s, n, modded[, dedup]) - word-n-gram " +
          "hashes; dedup=false keeps every gram in position order"),
      WordGramHashes.build _))

    ext.injectFunction((
      FunctionIdentifier("graft_rep_stats"),
      info("graft_rep_stats",
        "graft_rep_stats(s) - [n_tokens, top_count, n_2grams, " +
          "distinct_2grams, n_3grams, distinct_3grams] of a string"),
      RepetitionStats.build _))

    // whole-operator planning: logical TopKPerGroup → partial+final
    // bounded-heap execs (plans/TopKPerGroup.scala). Sessions built
    // without extensions get the same strategy via TopK.setup.
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // ...and the Rule[LogicalPlan] rung: declarative row_number()<=k /
    // rank()<=k (tie-aware) filters rewrite to the custom node
    // (plans/RankFilterToTopK.scala)
    ext.injectOptimizerRule(_ => graft.plans.RankFilterToTopK)
  }
}
