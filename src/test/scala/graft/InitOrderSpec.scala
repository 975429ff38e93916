package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Closes the object-initialization-cycle defect CLASS (the round-15
  * ScrubN incident): Scala object init is re-entrant, so an eager
  * `val` in object A whose initializer forces object B can — if B's
  * init transitively reads back into the still-initializing A —
  * observe A's unassigned vals as 0/null and bake that wrong value for
  * the JVM lifetime. The concrete incident: an eager `ddSemDedupSql`
  * forced Similarity during Dedup's init, which re-entered Dedup via
  * `Corpus.ScrubN = Dedup.SpanN`, baking ScrubN = 0 — visible ONLY
  * under the full-suite forcing order, never under Verify's.
  *
  * Two guards, the lint being the actual closure of the class:
  *
  *  1. SOURCE LINT — every object-level `*Sql`/`*Cte*` val in the
  *     operator/streaming/query layers must be `lazy`. Oracle-SQL
  *     builders are exactly the vals that reach across objects (either
  *     by naming another object's fragment or by calling its
  *     shared-fragment helper), so "all of them lazy" makes every
  *     cross-object edge demand-driven: by the time ANY lazy val body
  *     runs, someone outside the object graph's init is asking for it,
  *     so no object is suspended mid-init. Also forbids the ScrubN
  *     shape itself: an object-level EAGER val whose whole initializer
  *     is a bare alias of another operator object's member.
  *
  *  2. FORCING PROBE — touch the operator objects in the historical
  *     worst order and assert the cross-object constants survived
  *     non-zero. Belt-and-braces: only bites if this JVM's first touch
  *     of the cycle is here, but a baked-0 constant stays 0 for the
  *     JVM lifetime, so it also catches a cycle tripped earlier in the
  *     run.
  */
class InitOrderSpec extends AnyFunSuite {

  private val lintedDirs = Seq(
    "src/main/scala/graft/operators",
    "src/main/scala/graft/streaming",
    "src/main/scala/graft/queries",
    "src/main/scala/graft/sink")

  private val objectLevelVal =
    """^  (?:private\[graft\] |private )?val (\w+)(\s*[:=])""".r
  private val sqlName = """\w*(?:Sql|Cte|Ctes)\w*""".r
  private val operatorObjects =
    "Dedup|Similarity|Corpus|TextAnalysis|Filters|Analytics|" +
      "TimeSeries|Graph|Multimodal|StreamingStats|RefQueries"
  private val bareAlias =
    s"""^  (?:private\\[graft\\] |private )?val \\w+(?::\\s*[\\w\\[\\]]+)?\\s*=\\s*(?:graft\\.)?(?:$operatorObjects)\\.\\w+\\s*$$""".r

  private def sourceLines(): Seq[(String, Int, String)] =
    lintedDirs.flatMap { d =>
      val p = Paths.get(d)
      if (!Files.isDirectory(p)) Seq.empty
      else Files.list(p).iterator().asScala.toSeq
        .filter(_.toString.endsWith(".scala"))
        .flatMap { f =>
          Files.readAllLines(f).asScala.zipWithIndex
            .map { case (l, i) => (f.toString, i + 1, l) }
        }
    }

  test("source lint: every object-level *Sql/*Cte val is lazy") {
    val lines = sourceLines()
    assert(lines.nonEmpty, "lint must actually see the source tree")
    val offenders = lines.collect {
      case (f, n, l)
          if objectLevelVal.findFirstMatchIn(l)
            .exists(m => sqlName.pattern.matcher(m.group(1)).matches()) =>
        s"$f:$n  $l"
    }
    assert(offenders.isEmpty,
      "eager object-level *Sql/*Cte vals (must be `lazy val` — " +
        "cross-object init hazard):\n" + offenders.mkString("\n"))
  }

  test("source lint: no eager object-level alias of another operator object's member") {
    val offenders = sourceLines().collect {
      case (f, n, l) if bareAlias.findFirstIn(l).isDefined =>
        s"$f:$n  $l"
    }
    assert(offenders.isEmpty,
      "eager cross-object constant alias (the ScrubN shape — must be " +
        "`lazy val`):\n" + offenders.mkString("\n"))
  }

  test("forcing probe: worst-order object init leaves cross-object constants intact") {
    // The incident order: Dedup first (its init used to force
    // Similarity, which re-entered Dedup through Corpus); each assert
    // doubles as the forcing touch.
    assert(graft.operators.Dedup.SpanN > 0)
    assert(graft.operators.Similarity.IvfCells > 0)
    assert(graft.operators.Corpus.DsirBuckets > 0L)
    assert(graft.operators.Corpus.ScrubN === graft.operators.Dedup.SpanN)
    assert(graft.operators.Corpus.ScrubN > 0)
    assert(graft.operators.TextAnalysis.LmScale > 0L)
    // Force the heavyweight oracle builders through the lazy seams —
    // each must produce a non-empty string with its object fully
    // initialized (an init cycle here would either deadlock-free
    // produce a malformed fragment with baked 0s or throw).
    assert(graft.operators.Dedup.ddSemDedupSql.nonEmpty)
    assert(graft.operators.Corpus.cpDsirSql.nonEmpty)
    assert(graft.operators.Similarity.simLabelKnnSql.nonEmpty)
    assert(graft.operators.Graph.grComponentsSql.nonEmpty)
    assert(graft.operators.Corpus.cpScrubSpansSql
        .contains(s"range(0, ${graft.operators.Dedup.SpanN})"),
      "cpScrubSpansSql must carry the live ScrubN, not a baked 0")
  }
}
