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

  test("ta_colloc matches a local brute-force collocation recompute") {
    val got = TextAnalysis.taColloc(spark, sf("sf0.01")).collect()
    assert(got.length == TextAnalysis.CollocTopK)
    def tok(s0: String): Seq[String] = {
      var b = 0; var e = s0.length
      while (b < e && s0.charAt(b) == ' ') b += 1
      while (e > b && s0.charAt(e - 1) == ' ') e -= 1
      java.util.regex.Pattern.compile("\\s+")
        .split(s0.substring(b, e), -1).toSeq
    }
    val texts = TextAnalysis.docs(spark, sf("sf0.01"))
      .select(col("text")).collect().map(r => tok(r.getString(0).toLowerCase))
    val uni = texts.flatten.filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val n = uni.values.sum
    val pairs = texts.flatMap(ts => ts.zip(ts.drop(1)))
      .filter(p => p._1.nonEmpty && p._2.nonEmpty)
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val want = pairs.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(TextAnalysis.CollocTopK)
    got.zip(want).foreach { case (r, ((a, b), cab)) =>
      assert(r.getAs[String]("bigram") == s"$a $b", s"rank ${r.getInt(0)}")
      assert(r.getAs[Long]("c_ab") == cab)
      assert(r.getAs[Long]("c_a") == uni(a) && r.getAs[Long]("c_b") == uni(b))
      val pmi = math.log(cab.toDouble * n / (uni(a).toDouble * uni(b)))
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-6)
    }
  }

  test("ta_rarity matches a local brute-force recompute") {
    val got = TextAnalysis.taRarity(spark, sf("sf0.01")).collect()
    // local mirror of split(trim(s), "\s+"): space-only trim, ASCII \s
    def tok(s0: String): Seq[String] = {
      var b = 0; var e = s0.length
      while (b < e && s0.charAt(b) == ' ') b += 1
      while (e > b && s0.charAt(e - 1) == ' ') e -= 1
      java.util.regex.Pattern.compile("\\s+")
        .split(s0.substring(b, e), -1).toSeq
    }
    val texts = TextAnalysis.docs(spark, sf("sf0.01"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> tok(r.getString(1).toLowerCase)
        .filter(_.nonEmpty))
    val dfreq = texts.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.length }
    val wt = dfreq.map { case (t, df) =>
      t -> TextAnalysis.RarityScale / df } // long div = floor on positives
    val want = texts.collect { case (id, ts) if ts.nonEmpty =>
      val n = ts.length.toLong
      val sumW = ts.map(wt).sum
      id -> ((n, ts.distinct.length.toLong, sumW, ts.map(wt).max,
        java.math.BigDecimal.valueOf(sumW.toDouble / n)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0))
    }.toMap
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, d, s, m, mean) = want(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == d &&
        r.getLong(3) == s && r.getLong(4) == m, s"ints: $r")
      assert(r.getDouble(5) == mean, s"mean: $r")
    }
  }

  test("ta_readability counters match a JVM regex recompute") {
    import java.util.regex.Pattern
    def count(p: Pattern, s: String): Int = {
      val m = p.matcher(s); var n = 0; while (m.find()) n += 1; n
    }
    val sentP = Pattern.compile("[.!?]+")
    val sylP = Pattern.compile("[aeiouy]+")
    val got = TextAnalysis.taReadability(spark, sf("sf0.01")).collect()
    val texts = TextAnalysis.docs(spark, sf("sf0.01"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length == texts.size)
    got.foreach { r =>
      val t = texts(r.getLong(0))
      val sentences = math.max(count(sentP, t), 1)
      val words = t.trim.split("\\s+").length
      val syllables = count(sylP, t.toLowerCase)
      assert(r.getAs[Int]("n_sentences") == sentences, s"sent: $r")
      assert(r.getAs[Int]("n_words") == words, s"words: $r")
      assert(r.getAs[Int]("n_syllables") == syllables, s"syl: $r")
      // the score is a pure function of the three counters
      val flesch = 206.835 - 1.015 * (words.toDouble / sentences) -
        84.6 * (syllables.toDouble / words)
      assert(math.abs(r.getAs[Double]("flesch") - flesch) < 1e-6, s"flesch: $r")
    }
  }

  test("ta_ttr counts types/hapax exactly per source") {
    val got = TextAnalysis.taTtr(spark, sf("sf0.01")).collect()
    val bySrc = TextAnalysis.docs(spark, sf("sf0.01"))
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (src, rs) =>
        val toks = rs.flatMap(
          _.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
        src -> toks
      }
    assert(got.length == bySrc.size)
    got.foreach { r =>
      val toks = bySrc(r.getString(0))
      val counts = toks.groupBy(identity).map(_._2.length)
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong, s"tok: $r")
      assert(r.getAs[Long]("n_types") == counts.size.toLong, s"typ: $r")
      assert(r.getAs[Long]("n_hapax") == counts.count(_ == 1).toLong,
        s"hapax: $r")
      assert(math.abs(r.getAs[Double]("ttr") -
        counts.size.toDouble / toks.length) < 1e-6)
      // diversity bounds: 0 < ttr <= 1, hapax is a subset of types
      assert(r.getAs[Double]("ttr") > 0 && r.getAs[Double]("ttr") <= 1.0)
      assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("n_types"))
    }
  }

  test("ta_entropy matches a local recompute and brackets [0, ln n]") {
    val got = TextAnalysis.taEntropy(spark, sf("sf0.01")).collect()
    val texts = TextAnalysis.docs(spark, sf("sf0.01"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty))
      .filter(_._2.nonEmpty).toMap
    assert(got.length == texts.size)
    got.foreach { r =>
      val toks = texts(r.getLong(0))
      val counts = toks.groupBy(identity).map(_._2.length.toLong)
      val clnc = counts.map(c => BigDecimal
        .decimal(c.toDouble * math.log(c.toDouble) * TextAnalysis.LmScale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong, s"n: $r")
      assert(r.getAs[Long]("n_types") == counts.size.toLong, s"t: $r")
      assert(r.getAs[Long]("clnc_micro") == clnc, s"clnc: $r")
      val h = math.log(toks.length.toDouble) -
        clnc.toDouble / TextAnalysis.LmScale / toks.length
      assert(math.abs(r.getAs[Double]("entropy") - h) < 1e-6, s"H: $r")
      // Shannon bounds: 0 <= H <= ln(n) (within quantization slack)
      assert(r.getAs[Double]("entropy") >= -1e-6)
      assert(r.getAs[Double]("entropy") <=
        math.log(toks.length.toDouble) + 1e-6)
    }
  }

  test("ta_ngram_lm surprisal matches an exact-integer local recompute") {
    val got = TextAnalysis.taNgramLm(spark, sf("sf0.01")).collect()
    val texts = TextAnalysis.docs(spark, sf("sf0.01"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty))
      .toMap
    val cnt = texts.values.flatten.toSeq
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = cnt.values.sum
    // the same quantization both engines apply: HALF_UP micro-nats.
    // NOT math.round (floor(x+0.5)): for doubles just below k+0.5 the
    // +0.5 addition can carry and round UP where the engines' decimal
    // HALF_UP does not — mirror them exactly via BigDecimal
    val wt = cnt.map { case (t, c) =>
      t -> BigDecimal
        .decimal(math.log(total.toDouble / c) * TextAnalysis.LmScale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    // both engines omit docs with zero tokens; keep the recompute's
    // universe identical so the count and lookups can't drift
    val nonEmpty = texts.filter(_._2.nonEmpty)
    assert(got.length == nonEmpty.size)
    got.foreach { r =>
      val toks = nonEmpty(r.getLong(0))
      val surprisal = toks.map(wt).sum // exact: integer adds commute
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong, s"n: $r")
      assert(r.getAs[Long]("surprisal_micro") == surprisal, s"s: $r")
      val mean = surprisal.toDouble / TextAnalysis.LmScale / toks.length
      assert(math.abs(r.getAs[Double]("mean_logprob") + mean) < 1e-6)
      assert(math.abs(r.getAs[Double]("ppl") - math.exp(mean)) < 1e-5)
      // the corpus's own MLE can't be beaten: mean surprisal ≥ entropy > 0
      assert(r.getAs[Double]("ppl") >= 1.0)
    }
  }

  test("ta_zipf slope matches an integer-micro-nat local regression") {
    val rows = TextAnalysis.taZipf(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    val terms = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
      .select(col("source"), explode(split(trim(lower(col("text"))), "\\s+"))
        .as("term"))
      .filter(col("term") =!= "").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = terms.groupBy(_._1)
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val src = r.getString(0)
      val cnt = bySource(src).groupBy(_._2).view.mapValues(_.length.toLong)
      // (count desc, term asc) ranking — the operator's tiebreak
      val ranked = cnt.toSeq.sortBy { case (t, c) => (-c, t) }
        .take(TextAnalysis.ZipfTopR)
      assert(r.getAs[Long]("n_terms") == ranked.length)
      assert(r.getString(2) == ranked.head._1, s"$src top term")
      assert(r.getAs[Long]("top_count") == ranked.head._2)
      def q(v: Double) = BigDecimal.decimal(v * TextAnalysis.LmScale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val pts = ranked.zipWithIndex.map { case ((_, c), i) =>
        (q(math.log(i + 1.0)), q(math.log(c.toDouble))) }
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-6, s"$src slope")
      // a frequency-ranked fit can never slope upward
      assert(r.getAs[Double]("slope") <= 0.0, s"$src sign")
    }
  }
}
