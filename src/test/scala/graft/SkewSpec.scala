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

  private lazy val uni: String = {
    val dir = Files.createTempDirectory("graft_skew_uni").toString
    Scale.blowUp(s, src, dir, 10, Set("events"))
    dir
  }
  private lazy val hot: String = {
    val dir = Files.createTempDirectory("graft_skew_hot").toString
    Scale.blowUpSkew(s, src, dir, 10)
    dir
  }

  test("10x hot-key skew: one user holding 10% of all events stays in band of the uniform corpus") {
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

  test("capPerKey mitigation: the capped q115 neutralizes the hot key (r13)") {
    // SCALING.md's x1000 experiment measured q115's 3-window chain at
    // 2.46x uniform when one user holds 10% of all events; the mitigation
    // recipe (Graft.capPerKey on user_id before the identical window
    // chain — Scale.extraProbes' q115_capped) flattens that curve. This
    // pins the recipe's two laws at suite scale:
    //  1. SEMANTICS — under organic per-user density the generous cap is
    //     the IDENTITY: q115_capped ≡ q115 exactly on the uniform corpus
    //     (disjoint users keep ~86 events each, far under 1000).
    val fCapped = Scale.extraProbes("q115_capped")
    val fPlain = SparkEntry.queries("q115_session_paths")
    val cappedUni = fCapped(s, uni)
    val plainUni = fPlain(s, uni)
    assert(cappedUni.except(plainUni).isEmpty && plainUni.except(cappedUni).isEmpty,
      "a cap above organic density must not change uniform-corpus results")
    //  2. STATE BOUND — on the hot corpus the cap BINDS: the hot user
    //     contributes exactly 1000 rows to the window chain (from 10k
    //     here, 10M at the x1000 probe), so the single-task sort cost is
    //     O(cap log cap) regardless of true key density.
    import org.apache.spark.sql.functions.col
    val hotRows = graft.api.Graft.capPerKey(
        Tables.events(s, hot), Seq("user_id"), 1000,
        Seq(col("ts"), col("event_id")))
      .filter(col("user_id") === 999000000000L).count()
    assert(hotRows == 1000L,
      s"hot user must be capped to exactly 1000 rows, saw $hotRows")
    // and the capped hot-key wall time sits in a tight band of the capped
    // uniform run (the x1000 flattening, pinned at suite scale)
    val tU = Scale.probe(s, uni, runs = 2, keys = Seq("q115_capped")).head._2
    val tH = Scale.probe(s, hot, runs = 2, keys = Seq("q115_capped")).head._2
    val ratio = tH / math.max(tU, Floor)
    info(f"q115_capped uniform ${tU}%.2fs  hot-key ${tH}%.2fs  ratio ${ratio}%.1fx")
    assert(ratio <= 3.0,
      f"capped q115 must stay near uniform cost on the hot corpus: ${ratio}%.1fx")
  }

  test("probePaired regenerates the skew band from ONE interleaved session (r14)") {
    // The paired mode (SPARK_GRAFT_SCALE_PAIRED=1) is how every deep-decade
    // skew number is quoted since r14 (SCALING.md: same-session pairs only),
    // so the code path itself needs a pin: probePaired must cover exactly
    // the requested keys IN ORDER (SCALING.md's tables are assembled
    // positionally from its output), measure both corpora (positive wall
    // on each side), and reproduce the same band law the two separate
    // probe() calls above establish — if the interleave ever stopped
    // alternating corpora (e.g. probed one dir twice), the hot side would
    // lose its straggler and a quadratic hot-key regression could hide.
    val keys = Seq("q32_window_sessionize", "q121_rolling_active_users",
      "q168_user_entropy")
    val t = Scale.probePaired(s, uni, hot, runs = 2, keys = keys)
    assert(t.map(_._1) == keys,
      s"probePaired must emit the requested keys in order, got ${t.map(_._1)}")
    t.foreach { case (key, u, h) =>
      assert(u > 0 && h > 0, s"$key: non-positive paired walls u=$u h=$h")
      val ratio = h / math.max(u, Floor)
      info(f"$key%-28s paired uniform ${u}%.2fs  hot-key ${h}%.2fs  ratio ${ratio}%.1fx")
      assert(ratio <= MaxRatio,
        f"$key paired hot/uniform ${ratio}%.1fx exceeds the ${MaxRatio}x band")
    }
  }
}
