package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's outlier self-diagnosis path (r13 verdict task #1).
  * Motivation: BENCH_r12 recorded q137 at 25.46 s min-of-2 (18.2x its
  * committed baseline) on the driver host while two independent local runs
  * of the same tree read 1.44–1.67 s — and the scored artifact could not
  * adjudicate itself. Bench now re-runs any out-of-band key a third time
  * under a task-metrics listener and emits a classified per-key line in
  * the archived tail; this suite covers selection (band + floor + missing
  * baseline), classification (host/gc/spill/code) and the instrumented
  * third pass end-to-end.
  */
class BenchDiagSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("parseBaseline reads the committed per-key file and skips comments") {
    val base = Bench.parseBaseline("src/test/resources/bench_baseline.txt")
    assert(base.size > 250, s"baseline unexpectedly small: ${base.size} keys")
    assert(base.contains("q137_covisit_decay"))
    assert(base.values.forall(_ > 0.0))
  }

  test("parseBaseline on a missing path degrades to empty, not an error") {
    assert(Bench.parseBaseline("/nonexistent/baseline.txt").isEmpty)
  }

  test("outlierKeys applies the band, the absolute floor, and skips unbaselined keys") {
    val base = Map("a" -> 1.0, "b" -> 0.05, "c" -> 2.0)
    val steady = Seq(
      ("a", 5.0, true),   // 5x > 4x band, above floor -> flagged
      ("b", 0.3, true),   // 6x ratio but under the 0.5 s floor -> noise, skipped
      ("c", 3.0, true),   // 1.5x -> in band
      ("d", 9.0, true))   // no baseline entry -> nothing to diagnose against
    val out = Bench.outlierKeys(steady, base, band = 4.0, floorSec = 0.5)
    assert(out == Seq(("a", 5.0, 1.0)))
  }

  test("outlierKeys orders worst-ratio first") {
    val base = Map("x" -> 1.0, "y" -> 0.5)
    val steady = Seq(("x", 5.0, true), ("y", 5.0, true)) // 5x vs 10x
    val out = Bench.outlierKeys(steady, base, band = 4.0, floorSec = 0.5)
    assert(out.map(_._1) == Seq("y", "x"))
  }

  test("classify separates host transients from reproduced gc/spill/code slowness") {
    // third pass back near baseline -> the min-of-2 reading was external
    assert(Bench.classify(p3Wall = 1.5, baseSec = 1.4, steadySec = 25.5,
      gcMs = 0, spillBytes = 0) == "host")
    // reproduces, >30% of wall in GC
    assert(Bench.classify(p3Wall = 20.0, baseSec = 1.4, steadySec = 25.5,
      gcMs = 8000, spillBytes = 0) == "gc")
    // reproduces with spill, GC quiet
    assert(Bench.classify(p3Wall = 20.0, baseSec = 1.4, steadySec = 25.5,
      gcMs = 100, spillBytes = 1L << 30) == "spill")
    // reproduces cleanly -> the plan itself
    assert(Bench.classify(p3Wall = 20.0, baseSec = 1.4, steadySec = 25.5,
      gcMs = 100, spillBytes = 0) == "code")
  }

  test("diagnose runs an instrumented third pass and emits a parseable fragment") {
    val dir = java.nio.file.Files.createTempDirectory("benchDiag").toString
    import s.implicits._
    (1L to 1000L).toDF("x").write.mode("overwrite").parquet(dir)
    val fn = (sp: org.apache.spark.sql.SparkSession, d: String) =>
      sp.read.parquet(d).groupBy(col("x") % 7).agg(sum("x").as("s"))
    // steady deliberately huge so a fast third pass classifies "host"
    val frag = Bench.diagnose(s, "probe_key", fn, dir, baseSec = 100.0,
      steadySec = 1000.0)
    assert(frag.startsWith("\"probe_key\":{"))
    for (f <- Seq("steady", "base", "p3_wall", "task_sec", "gc_ms",
        "spill_mb", "verdict"))
      assert(frag.contains("\"" + f + "\""), s"missing field $f in $frag")
    assert(frag.contains("\"verdict\":\"host\""))
    // the fragment must be valid JSON when wrapped as an object
    val parsed = s.range(1).select(
      from_json(lit("{" + frag + "}"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "probe_key STRUCT<steady: DOUBLE, base: DOUBLE, p3_wall: DOUBLE, " +
            "task_sec: DOUBLE, gc_ms: LONG, spill_mb: LONG, verdict: STRING>")
      ).as("j")).selectExpr("j.probe_key.verdict").head().getString(0)
    assert(parsed == "host")
  }

  test("diagnose classifies a query that errors as 'error' instead of crashing the bench") {
    val fn = (sp: org.apache.spark.sql.SparkSession, d: String) =>
      sp.read.parquet("/nonexistent/table.parquet")
    val frag = Bench.diagnose(s, "bad_key", fn, "/tmp", 1.0, 10.0)
    assert(frag.contains("\"verdict\":\"error\""))
  }
}
