package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empirical near-linearity regression for the headline plan families
  * (the Scale probe's pinned form): blow sf0.01 up ×10 with Scale's
  * deterministic key-disjoint perturbation and assert each family's 10×
  * wall time stays under a generous multiple of its 1× time. A plan that
  * regressed to a quadratic shape (global single-task sort, uncapped LSH
  * bucket join, per-day rescan) lands at ~100× and fails loudly; honest
  * noise on a shared 4-core test session stays far inside the bound.
  * The full 1×/10×/100× curves at sf0.1 live in SCALING.md (graft.Scale).
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class ScalingSpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val src = TestSpark.sf001

  // floor the denominator: sub-300ms 1× times are dominated by fixed
  // per-query overhead (plan analysis, job scheduling) that does not
  // scale with data, and would make the ratio meaninglessly strict
  private val Floor = 0.3
  private val MaxRatio = 25.0

  test("10x blow-up: every headline family stays near-linear") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale10").toString
    Scale.blowUp(s, src, dir, 10)
    val t1 = Scale.probe(s, src, runs = 2).toMap
    val t10 = Scale.probe(s, dir, runs = 2).toMap
    val report = Scale.families.map { case (key, what) =>
      val a = t1(key); val b = t10(key)
      val ratio = b / math.max(a, Floor)
      (key, what, a, b, ratio)
    }
    report.foreach { case (key, what, a, b, ratio) =>
      info(f"$key%-28s 1x ${a}%.2fs  10x ${b}%.2fs  ratio ${ratio}%.1fx ($what)")
      assert(ratio <= MaxRatio,
        f"$key went superlinear: 1x ${a}%.2fs -> 10x ${b}%.2fs " +
          f"(${ratio}%.1fx > ${MaxRatio}x bound) — $what")
    }
  }
}
