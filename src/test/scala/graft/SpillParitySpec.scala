package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spill-path parity (r14): forcing the real plan families through the
  * disk-spill path must not change a single byte of output.
  *
  * Motivation: the r14 tallied scaling sweep (SCALING.md "the spill
  * regime, measured") found the published ×1000 window numbers carry
  * ~6 GB of spill per run — on one node the deep decade runs IN the
  * spill regime by default, so the spill path is not an edge case, it is
  * the steady state of every at-scale execution, and its correctness
  * deserves a pin rather than an assumption. The starved run executes on
  * an isolated child session (`newSession` — the Streaming.sized conf
  * discipline) with the WindowExec buffer thresholds dropped so every
  * window group buffer round-trips through spill files even at sf0.001;
  * Bench's TaskTally asserts spill bytes actually moved (non-vacuity — a
  * threshold rename in a Spark upgrade would otherwise turn this suite
  * into a silent no-op), and the result fingerprint must equal the
  * untouched session's in-memory run bit for bit.
  *
  * Keys chosen to span the spilling window shapes the sweep measured:
  * the 3-window session chain (q115, the ×1000 spiller), its 1-window
  * sibling (q32), and the prefix-scan family (q210, whose cumulative
  * windows ride the same buffer).
  */
class SpillParitySpec extends AnyFunSuite {
  private def s = TestSpark.spark
  private val d = TestSpark.sf001

  private def fp(df: org.apache.spark.sql.DataFrame): String = {
    val rows = df.collect().map(_.toSeq.mkString("")).sorted
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(rows.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  // Spill granularity is sized per key to the family's window-group rows
  // — tiny thresholds applied indiscriminately are NOT harmless: every
  // window spill file costs a 1 MB reader buffer per frame iterator at
  // replay, so a 16-row spill threshold on q210's ~250-row prefix-scan
  // window groups (× frames × 32 concurrent tasks) OOMs the test JVM
  // from reader buffers alone (measured: straight Java heap space at
  // threshold 16, green at 128 with 1–2 files per group). The per-user
  // chains' ≈10-row groups need the fine 16-row granularity to spill at
  // all. (The generic sorter force-spill knob is NOT usable here:
  // spark.shuffle.spill.numElementsForceSpillThreshold is a core conf,
  // CANNOT_MODIFY_CONFIG from a session.)
  private val starveConfs: Map[String, Seq[(String, String)]] = Map(
    "q115_session_paths" -> Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "2",
      "spark.sql.windowExec.buffer.spill.threshold" -> "16"),
    "q32_window_sessionize" -> Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "2",
      "spark.sql.windowExec.buffer.spill.threshold" -> "16"),
    "q210_spearman_corr" -> Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "2",
      "spark.sql.windowExec.buffer.spill.threshold" -> "128"))
  // Not covered here: the sort-merge-join match-group buffer
  // (spark.sql.sortMergeJoinExec.buffer.*). It is the SAME
  // ExternalAppendOnlyUnsafeRowArray the window tests drive through
  // spill, and the fat-match-group candidates (q76's capped shingle
  // buckets) never re-execute their join in a starved child session —
  // the pair grain rides the context-shared memo cache, so the starved
  // run reads InMemoryRelation and tallies zero spill (verified: the
  // non-vacuity assert fails). Driving it would need a cache release
  // mid-suite, which evicts every other suite's shared entries for one
  // duplicate code path.

  for ((key, confs) <- starveConfs) {
    test(s"$key: byte-identical results when every window buffer and sort spills") {
      val plain = fp(SparkEntry.queries(key)(s, d))
      val starved = s.newSession()
      confs.foreach { case (k, v) => starved.conf.set(k, v) }
      val tally = new Bench.TaskTally
      s.sparkContext.addSparkListener(tally)
      try {
        val got = fp(SparkEntry.queries(key)(starved, d))
        Bench.drainTallies(tally)
        assert(tally.spillBytes.get > 0,
          s"$key: starved run did not actually spill — parity check vacuous " +
            "(did a Spark upgrade rename the spill-threshold confs?)")
        assert(got == plain,
          s"$key: spill path produced different results than the in-memory path")
      } finally s.sparkContext.removeSparkListener(tally)
    }
  }
}
