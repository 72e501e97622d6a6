package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.sys.process._
import java.nio.file.Files

/** Non-ASCII cross-engine parity probe (r11).
  *
  * The driver corpus is pure ASCII (verified at survey:
  * octet_length(encode(text)) == length(text) on every row), so ten rounds
  * of oracle gates never fed a multi-byte character through the text
  * family. A real LLM-data corpus is the opposite — CJK, emoji
  * (supplementary-plane codepoints), RTL scripts, combining marks — and
  * char-level semantics are exactly where two engines can silently
  * diverge: length/substring must both count CODEPOINTS, regex classes
  * must both stay ASCII-literal, casing must not be locale-sensitive.
  * This probe reruns the ~50 documents-consuming oracle-backed keys
  * through the SAME differential gate the driver uses (Verify.run +
  * tools/check.py) on a corpus where a third of the documents gain
  * diacritics + CJK + emoji + Arabic/Hebrew text, a sixth are REPLACED by
  * pure-CJK-and-emoji text (no ASCII token at all), and n_chars is
  * recomputed to stay consistent.
  *
  * Excluded: the five byte-level multimodal stubs (q06/q09/q75/q95/q257) —
  * their oracles slice STRINGS as stand-ins for the engine's BYTE kernels,
  * an equivalence their scaladocs state holds only on ASCII payloads (on
  * multi-byte text the engine's byte semantics are the correct ones).
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class UnicodeParitySpec extends AnyFunSuite {
  private def s = TestSpark.spark

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Oracle-backed keys that read documents (directly or via the word/
    * shingle/signature memos) at CHAR level. */
  private val keyNums = Set(
    46, 49, 68, 69, 72, 74, 76, 78, 79, 83, 84, 86, 92, 93, 94, 96, 98, 99,
    100, 104, 105, 106, 109, 125, 129, 130, 138, 153, 155, 161, 167, 169,
    183, 199, 201, 217, 218, 219, 221, 223, 226, 234, 237, 239, 240, 241,
    242, 253, 263, 270)

  private lazy val uniDir: String = {
    val dir = Files.createTempDirectory("graft_unicorpus").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tableNames.foreach { n =>
      val src = s.read.parquet(s"${TestSpark.sf0001}/$n.parquet")
      val out =
        if (n != "documents") src
        else {
          val mixed = concat(lit("À l'œuvre — Übung naïve café, "),
            col("text"),
            lit(" 東京タワーで測試中 🚀🌍 العربية עברית n̈oël"))
          val pureCjk = concat(lit("数据清洗与重复检测——"),
            lit("大规模语料库的质量评估流程🧪テスト済み証明書発行済"),
            substring(col("text"), 1, 0)) // keeps the null gate: null text stays null
          src.withColumn("text",
              when(pmod(xxhash64(col("doc_id")), lit(6)) === 0, pureCjk)
                .when(pmod(xxhash64(col("doc_id")), lit(3)) === 1, mixed)
                .otherwise(col("text")))
            .withColumn("n_chars", length(col("text")).cast("long"))
        }
      out.repartition(1).write.mode("overwrite").parquet(s"$dir/$n.parquet")
      // check.py's DuckDB side reads `<table>.parquet` as a FLAT FILE (the
      // driver-testdata layout); replace Spark's directory with its single
      // part file
      val tableDir = new java.io.File(s"$dir/$n.parquet")
      val part = tableDir.listFiles().find(_.getName.endsWith(".parquet")).get
      val tmp = new java.io.File(s"$dir/$n.tmp")
      Files.move(part.toPath, tmp.toPath)
      tableDir.listFiles().foreach(_.delete())
      tableDir.delete()
      assert(tmp.renameTo(new java.io.File(s"$dir/$n.parquet")))
    }
    dir
  }

  test("char-level text keys hash-match DuckDB on a non-ASCII corpus") {
    val pythonOk =
      try Process(Seq("python3", "-c", "import duckdb, pyarrow")).! == 0
      catch { case _: Throwable => false }
    assume(pythonOk, "python3 with duckdb+pyarrow not available — skipping")

    val keys = SparkEntry.queries.keySet.filter { k =>
      k.drop(1).takeWhile(_.isDigit).toIntOption.exists(keyNums)
    }
    assert(keys.size == keyNums.size,
      s"key-number set drifted: matched ${keys.size} of ${keyNums.size}")

    val out = Files.createTempDirectory("graft_univerify").toString
    val failed = Verify.run(s, uniDir, out, only = keys)
    assert(failed.isEmpty, s"queries failed to execute: $failed")

    val log = new StringBuilder
    val rc = Process(Seq("python3", "tools/check.py", uniDir, out),
      new java.io.File("/root/repo"))
      .!(ProcessLogger(l => log.append(l).append('\n')))
    assert(rc == 0, "non-ASCII parity failures:\n" +
      log.toString.linesIterator.filter(_.startsWith("FAIL")).mkString("\n"))
  }
}
