package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Degenerate-text sweep (r11).
  *
  * Every document in the driver corpus is a well-behaved multi-word ASCII
  * sentence, so the text family has never seen the degenerate shapes a real
  * crawl emits constantly: empty extractions, whitespace-only pages, a
  * single character, a 2000-char single token (minified JS / base64 blob),
  * and pathological one-word repetition. Those are exactly the inputs that
  * zero a token count (an ANSI integer division away from a stage kill),
  * make a shingle window longer than its document, or explode a
  * repetition grain. This sweep copies sf0.001 with ~5/9 of documents
  * replaced by those shapes (content-keyed, zero RNG), recomputes n_chars,
  * and requires all 278 queries to execute under the full-width force
  * action without throwing.
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class TextEdgeCaseSpec extends AnyFunSuite {
  private def s = TestSpark.spark

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private lazy val edgeDir: String = {
    val dir = Files.createTempDirectory("graft_textedge").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tableNames.foreach { n =>
      val src = s.read.parquet(s"${TestSpark.sf0001}/$n.parquet")
      val out =
        if (n != "documents") src
        else {
          val h = pmod(xxhash64(col("doc_id")), lit(9))
          src.withColumn("text",
              when(h === 0, lit(""))                                // empty extraction
                .when(h === 1, lit(" \n\t  \r "))                   // whitespace-only page
                .when(h === 2, lit("x"))                            // single character
                .when(h === 3, expr("repeat('abcdefgh', 250)"))     // one 2000-char token
                .when(h === 4, expr("repeat('spam ', 400)"))        // extreme repetition
                .otherwise(col("text")))
            .withColumn("n_chars", length(col("text")).cast("long"))
        }
      out.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("every query survives degenerate document text without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { Bench.force(fn(s, edgeDir)); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(250)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on degenerate text:\n" +
        failures.mkString("\n"))
  }
}
