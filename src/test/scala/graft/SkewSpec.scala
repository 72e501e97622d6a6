package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Hot-key skew regression for the per-user plan families (the pinned
  * form of Scale's r12 skew experiment, SCALING.md "Round 12: hot-key
  * skew"). The uniform blow-up keeps per-key group size constant — the
  * shape where partitioned plans scale out cleanly; this suite builds the
  * OPPOSITE corpus (Scale.blowUpSkew: one user absorbing 10% of all
  * events — the bot/test-account shape every 100 TB event log contains)
  * and asserts each family's wall time on it stays within a generous band
  * of the same-factor uniform corpus. What it catches loudly: a plan
  * change that makes hot-key cost quadratic in the key's row count — a
  * per-user self-join losing its 5-min cell grain (q39), an uncapped
  * per-user collect, a window rewrite that re-sorts the hot partition per
  * row. The measured sf0.1 ratios are 0.6–1.25× across ×10/×100 (hot key
  * up to 1 M rows is absorbed by one O(h log h) task while 31 cores chew
  * the uniform 90%); a quadratic regression posts ≥50× at this corpus
  * size. Honest single-task serialization (the straggler onset measured
  * at ×1000 in SCALING.md) stays far inside the bound.
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class SkewSpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val src = TestSpark.sf001

  // floor the denominator: sub-300ms uniform times are dominated by fixed
  // per-query overhead (plan analysis, job scheduling) that is identical
  // on both corpora and would make the ratio meaninglessly strict
  private val Floor = 0.3
  private val MaxRatio = 10.0

  test("10x hot-key skew: one user holding 10% of all events stays in band of the uniform corpus") {
    val uni = Files.createTempDirectory("graft_skew_uni").toString
    val hot = Files.createTempDirectory("graft_skew_hot").toString
    Scale.blowUp(s, src, uni, 10, Set("events"))
    Scale.blowUpSkew(s, src, hot, 10)
    val keys = Scale.skewFamilies.map(_._1)
    val tU = Scale.probe(s, uni, runs = 2, keys = keys).toMap
    val tH = Scale.probe(s, hot, runs = 2, keys = keys).toMap
    Scale.skewFamilies.foreach { case (key, what) =>
      val u = tU(key); val h = tH(key)
      val ratio = h / math.max(u, Floor)
      info(f"$key%-28s uniform ${u}%.2fs  hot-key ${h}%.2fs  ratio ${ratio}%.1fx ($what)")
      assert(ratio <= MaxRatio,
        f"$key went quadratic in hot-key density: uniform ${u}%.2fs -> " +
          f"hot-key ${h}%.2fs (${ratio}%.1fx > ${MaxRatio}x bound) — $what")
    }
  }
}
