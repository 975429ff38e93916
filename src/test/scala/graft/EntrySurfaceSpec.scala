package graft

/** Regression net for the driver contract: every declared query must
  * EXECUTE at smoke scale (catching broken plans before the external
  * correctness gate does). Values are the oracle's job; this asserts
  * executability and the queries/oracle key pairing.
  */
class EntrySurfaceSpec extends SparkSpec {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"queries($name) executes at sf0.001") {
      val n = fn(spark, sf()).count()
      assert(n >= 0)
      // oracle-checked entries must produce rows at smoke scale unless
      // they are pair-finders (legitimately sparse at tiny SF)
      val sparseOk = name.endsWith("_pairs") || name.endsWith("_lsh") ||
        name.endsWith("_jaccard") || name.endsWith("_cosine")
      if (SparkEntry.oracleSql.contains(name) && !sparseOk)
        assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
