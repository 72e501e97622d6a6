package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, functions => F}
import java.nio.file.Files

/** Composed-adversity ("chaos corpus") sweep (r11 capstone).
  *
  * Each r11 robustness axis is pinned by its own suite — zero rows, layout,
  * nulls, corrupt props, degenerate text, non-ASCII — but real 100 TB
  * ingest hits them TOGETHER: a shard where the nulled user_id rows are
  * also the ones with truncated props, inside a file layout nothing chose.
  * Guards that pass each axis alone can still interact (a null gate that
  * assumes well-formed props, a try_cast that assumes non-null text). This
  * sweep composes every mutation into one corpus — degenerate + CJK text
  * overlays, corrupt props shapes, then every column independently nulled
  * on ~1/9 of rows, everything rewritten repartition(5) — and requires all
  * 278 queries to execute under the full-width force action without
  * throwing.
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class ChaosCorpusSpec extends AnyFunSuite {
  private def s = TestSpark.spark

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def nullify(df: DataFrame): DataFrame = {
    val whole = F.struct(df.columns.map(F.col): _*)
    df.select(df.columns.map { c =>
      F.when(F.pmod(F.xxhash64(whole, F.lit(c)), F.lit(9)) === 0, F.lit(null))
        .otherwise(F.col(c)).as(c)
    }: _*)
  }

  private lazy val chaosDir: String = {
    val dir = Files.createTempDirectory("graft_chaoscorpus").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tableNames.foreach { n =>
      val src = s.read.parquet(s"${TestSpark.sf0001}/$n.parquet")
      val mutated = n match {
        case "documents" =>
          val h = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(11))
          src.withColumn("text",
              F.when(h === 0, F.lit(""))
                .when(h === 1, F.lit(" \n\t "))
                .when(h === 2, F.expr("repeat('spam ', 400)"))
                .when(h === 3, F.expr("repeat('abcdefgh', 250)"))
                .when(h === 4,
                  F.concat(F.lit("Übung 東京タワー🚀 — "), F.col("text")))
                .otherwise(F.col("text")))
            .withColumn("n_chars", F.length(F.col("text")).cast("long"))
        case "events" =>
          val h = F.pmod(F.xxhash64(F.col("event_id")), F.lit(11))
          src.withColumn("props",
            F.when(h === 0, F.lit("""{"k": 12"""))
              .when(h === 1, F.lit("""{"k": "not-a-number"}"""))
              .when(h === 2, F.lit("""{"k": 99999999999999999999}"""))
              .when(h === 3, F.lit("""{"k": 3.7}"""))
              .otherwise(F.col("props")))
        case _ => src
      }
      nullify(mutated).repartition(5)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("every query survives the composed chaos corpus without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { Bench.force(fn(s, chaosDir)); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(250)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on the chaos corpus:\n" +
        failures.mkString("\n"))
  }
}
