package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Zero-row corpus robustness sweep (r11).
  *
  * At the 100 TB design point, any date slice, tenant filter, or source
  * split can make EVERY input of a query empty — a new partition before its
  * first ingest, a decontamination pass on a corpus with no benchmark
  * overlap, a backfill window with no events. An operator that throws on
  * zero rows (instead of returning its natural empty/identity result) kills
  * the whole pipeline run at exactly the moment the data is least
  * inspectable. The oracle gate never exercises this (the test SFs are all
  * non-empty), so this sweep is the only thing pinning it.
  *
  * Contract asserted: every `SparkEntry.queries` entry, fed a corpus where
  * all nine tables have their real schemas but zero rows, EXECUTES without
  * throwing (via the same full-width force action the bench uses). What the
  * empty result IS (zero rows vs a single all-null/zero aggregate row) is
  * each operator's own semantics — this sweep pins only "no crash", the
  * property a scheduler retry can't fix.
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class EmptyInputSpec extends AnyFunSuite {
  private def s = TestSpark.spark

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Zero-row copies of the sf0.001 tables, real schemas preserved
    * (written once per test run into a temp dir; the Tables memos key on
    * the directory, so nothing leaks into other suites' cached inputs). */
  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_emptycorpus").toString
    // events may ship as timestamp[ns]; the legacy flag makes the raw read
    // schema-preserving (long ns) so the copy round-trips like the source.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tableNames.foreach { n =>
      s.read.parquet(s"${TestSpark.sf0001}/$n.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("every query survives a zero-row corpus without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { Bench.force(fn(s, emptyDir)); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on an empty corpus:\n" +
        failures.mkString("\n"))
  }

  /** The empty-corpus result must have the SAME shape as the real one —
    * a guard path that short-circuits to a hand-built empty frame (q65/q66
    * ALS, q252's no-vectors branch) could silently drift its column names
    * or types, and a downstream union/write would then fail only on the
    * one empty slice. Schema building is lazy for the declarative keys
    * (no job on the sf0.001 side); the few driver-stepping keys (ALS,
    * the solver collects) do run their small fits. Nullability is
    * ignored: aggregates legitimately relax it on empty input. */
  test("empty-corpus result schema matches the real-corpus schema") {
    def shape(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      df.schema.fields.toSeq.map(f => (f.name, f.dataType.sql))
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val a = shape(fn(s, TestSpark.sf0001))
          val b = shape(fn(s, emptyDir))
          if (a == b) None
          else Some(s"$name: real $a vs empty $b")
        } catch { case e: Throwable =>
          Some(s"$name: threw ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries change schema on an empty corpus:\n" +
        failures.mkString("\n"))
  }
}
