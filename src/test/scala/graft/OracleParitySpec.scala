package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._
import java.nio.file.Files

/** The release gate (SURVEY §5.1): does locally exactly what the driver does
  * — run every `queries` entry, dump parquet + oracle_sql.json, and have
  * DuckDB re-run each oracle SQL and compare values AND dtypes (via
  * tools/check.py, which reads the Spark side through pyarrow like the
  * driver's harness). Skips cleanly if python/duckdb are unavailable. */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class OracleParitySpec extends AnyFunSuite {

  test("every oracle-backed query hash-matches DuckDB on sf0.001") {
    val pythonOk =
      try Process(Seq("python3", "-c", "import duckdb, pyarrow")).! == 0
      catch { case _: Throwable => false }
    assume(pythonOk, "python3 with duckdb+pyarrow not available — skipping")

    val out = Files.createTempDirectory("graft_verify").toString
    val failed = Verify.run(TestSpark.spark, TestSpark.sf0001, out)
    assert(failed.isEmpty, s"queries failed to execute: $failed")

    val log = new StringBuilder
    val rc = Process(Seq("python3", "tools/check.py", TestSpark.sf0001, out),
      new java.io.File("/root/repo"))
      .!(ProcessLogger(l => log.append(l).append('\n')))
    assert(rc == 0, s"oracle parity failures:\n${log.toString.linesIterator.filter(_.startsWith("FAIL")).mkString("\n")}")
  }
}
