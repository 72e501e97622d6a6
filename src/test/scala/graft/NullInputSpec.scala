package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, functions => F}
import java.nio.file.Files

/** Null-tolerance sweep (r11).
  *
  * The driver testdata carries ZERO nulls in any column of any table
  * (verified with DuckDB at survey and again this round), so ten rounds of
  * oracle gates have never fed a single null through the inventory. Real
  * 100 TB corpora are the opposite: missing user ids on anonymous events,
  * null text from failed extractions, absent props, null embeddings from a
  * crashed encoder shard. Spark's builtins null-propagate, but custom
  * Catalyst expressions, mapPartitions kernels (`Row.getX` on a null cell
  * throws or garbles) and driver-side `Row.get*` steps are exactly where a
  * null becomes a task-killing NPE three hours into a pipeline run.
  *
  * Method: copy sf0.001 with every column independently nulled on ~1/7 of
  * rows, chosen by a CONTENT hash of the full row + column name (zero RNG,
  * reproducible), then require every `SparkEntry.queries` entry to execute
  * under the full-width force action without throwing. What a null MEANS
  * to each operator (row dropped, null group, skipped term) is its own
  * semantics — this sweep pins only "no crash".
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class NullInputSpec extends AnyFunSuite {
  private def s = TestSpark.spark

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Every column nulled independently on ~1/7 of rows, content-keyed. */
  private def nullify(df: DataFrame): DataFrame = {
    val whole = F.struct(df.columns.map(F.col): _*)
    df.select(df.columns.map { c =>
      F.when(F.pmod(F.xxhash64(whole, F.lit(c)), F.lit(7)) === 0, F.lit(null))
        .otherwise(F.col(c)).as(c)
    }: _*)
  }

  private lazy val nullDir: String = {
    val dir = Files.createTempDirectory("graft_nullcorpus").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tableNames.foreach { n =>
      nullify(s.read.parquet(s"${TestSpark.sf0001}/$n.parquet"))
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("every query survives a 1-in-7-nulls corpus without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { Bench.force(fn(s, nullDir)); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on a nulls corpus:\n" +
        failures.mkString("\n"))
  }
}
