package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Corrupt semi-structured-payload sweep (r11).
  *
  * `events.props` is the one semi-structured column in the corpus, and the
  * driver testdata always ships it as clean `{"k": <int>}` JSON — so the
  * item-id extraction path (`get_json_object(props, '$.k')` + a cast to
  * BIGINT) has never seen what a real event stream delivers: truncated
  * JSON from a crashed producer, a renamed key, a non-numeric or
  * floating-point or overflowing id after a schema drift. Under Spark 4's
  * default ANSI mode a string→BIGINT CAST of "xyz"/"3.7"/10^20 THROWS
  * ([CAST_INVALID_INPUT]/[ARITHMETIC_OVERFLOW]) — one poisoned row kills
  * the whole scan. This sweep copies sf0.001 with ~4/9 of props rows
  * corrupted across those shapes (content-keyed, zero RNG) and requires
  * every query to execute without throwing; the correct engine behavior is
  * a null item id (the row drops out of item-keyed work), which is also
  * what DuckDB's TRY_CAST computes.
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class CorruptInputSpec extends AnyFunSuite {
  private def s = TestSpark.spark

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private lazy val corruptDir: String = {
    val dir = Files.createTempDirectory("graft_corruptprops").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tableNames.foreach { n =>
      val src = s.read.parquet(s"${TestSpark.sf0001}/$n.parquet")
      val out =
        if (n != "events") src
        else {
          val h = pmod(xxhash64(col("event_id")), lit(9))
          src.withColumn("props",
            when(h === 0, lit("""{"k": 12"""))                        // truncated JSON
              .when(h === 1, lit("""{"k": "not-a-number"}"""))        // non-numeric id
              .when(h === 2, lit("""{"j": 5}"""))                     // key renamed away
              .when(h === 3, lit("""{"k": 99999999999999999999}"""))  // BIGINT overflow
              .when(h === 4, lit("""{"k": 3.7}"""))                   // float after drift
              .otherwise(col("props")))
        }
      out.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("every query survives corrupt props payloads without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { Bench.force(fn(s, corruptDir)); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on corrupt props:\n" +
        failures.mkString("\n"))
  }
}
