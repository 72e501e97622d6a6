package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** Input-partitioning / shuffle-parallelism invariance sweep (r11).
  *
  * On a real cluster neither knob is under the query's control: the scan's
  * split layout follows file sizes and `maxPartitionBytes`, and
  * `spark.sql.shuffle.partitions` is a site config (or AQE's runtime
  * choice). A correct distributed operator must produce the SAME result set
  * under any of them — any dependence on row order within a partition, on
  * which partition a row lands in, or on partial-aggregation grouping is a
  * latent wrong-results bug that local[32] on one fixed file layout can
  * never surface. The oracle gate runs one layout only, so this sweep is
  * what pins the claim "results are content-determined, not
  * layout-determined".
  *
  * Method: rewrite the sf0.001 corpus `repartition(7)` (different file
  * count, different row order, different row→file assignment), run every
  * query on BOTH corpora — the copy under a different shuffle-partition
  * count (7 vs the suite's 4) and a 64 KiB `maxPartitionBytes` (maximally
  * split scans) — and compare full result MULTISETS via sorted row-JSON.
  *
  * Comparison is exact EXCEPT for one measured, bounded concession:
  * IEEE-754 addition is not associative, so a different partial-aggregation
  * tree can move a double SUM by ~1 ULP, and when the true value sits
  * within that of a rounding boundary the r2/r4/r5 output pin flips by one
  * unit in the last printed decimal (observed on exactly 4 of 275 keys at
  * sf0.001: q20/q89/q187/q255, each a one-unit flip). That is inherent to
  * floating-point aggregation on ANY distributed engine — not a layout
  * dependence a plan change could remove — so non-integer literals may
  * differ by at most 1.01 units of their coarser printed grain, while row
  * counts, shapes, strings and integer-printed values must match EXACTLY.
  * A genuine layout bug (lost/duplicated rows, tie-breaks resolved by
  * arrival order, first()/head() races) still fails: it changes row shapes,
  * integers, or values by more than one last-place unit.
  *
  * Documented exclusions (each bound elsewhere):
  *  - q59_agg_approx_quantiles: approx_percentile's QuantileSummaries
  *    compression is merge-order-dependent BY DESIGN (the mergeable-sketch
  *    trade its scaladoc states); bounded by rank-error tests instead.
  *  - q65/q66 (ALS): MLlib ALS's float factor solve depends on block
  *    partitioning; pinned by MlSpec's block-cohort fixture (top-1 recs
  *    stable across numUserBlocks 2 vs 4) + seeded RMSE threshold instead.
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class PartitionInvarianceSpec extends AnyFunSuite {
  private def s = TestSpark.spark

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private val excluded = Set(
    "q59_agg_approx_quantiles", "q65_als_recommend", "q66_als_rmse")

  /** The sf0.001 corpus rewritten with a deliberately different layout:
    * 7 files per table, round-robin row assignment (so both file COUNT and
    * row ORDER differ from the driver-written source). */
  private lazy val reparDir: String = {
    val dir = Files.createTempDirectory("graft_repart").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tableNames.foreach { n =>
      s.read.parquet(s"${TestSpark.sf0001}/$n.parquet").repartition(7)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  /** Canonical result multiset: one JSON string per row, sorted. Same
    * engine on both sides, so bit-identical values stringify identically. */
  private def canon(df: DataFrame): Seq[String] =
    df.toJSON.collect().sorted.toSeq

  /** Splits a row-JSON string into a shape (numbers outside string
    * literals replaced by '#') and the numeric literals with their
    * last-place tolerance: 0.0 for integer-printed values (exact), else
    * 1.01 × 10^(exponent − fraction digits). */
  private def tokenize(row: String): (String, Vector[(BigDecimal, Double)]) = {
    val shape = new StringBuilder
    val nums = Vector.newBuilder[(BigDecimal, Double)]
    var i = 0
    var inStr = false
    while (i < row.length) {
      val c = row.charAt(i)
      if (inStr) {
        shape.append(c)
        if (c == '\\' && i + 1 < row.length) { shape.append(row.charAt(i + 1)); i += 2 }
        else { if (c == '"') inStr = false; i += 1 }
      } else if (c == '"') { inStr = true; shape.append(c); i += 1 }
      else if (c.isDigit ||
          (c == '-' && i + 1 < row.length && row.charAt(i + 1).isDigit)) {
        val start = i
        if (c == '-') i += 1
        while (i < row.length && row.charAt(i).isDigit) i += 1
        var frac = 0
        var isInt = true
        if (i < row.length && row.charAt(i) == '.') {
          isInt = false; i += 1
          val fs = i
          while (i < row.length && row.charAt(i).isDigit) i += 1
          frac = i - fs
        }
        var exp = 0
        if (i < row.length && (row.charAt(i) == 'e' || row.charAt(i) == 'E')) {
          isInt = false
          val es = i + 1; i += 1
          if (i < row.length && (row.charAt(i) == '+' || row.charAt(i) == '-')) i += 1
          while (i < row.length && row.charAt(i).isDigit) i += 1
          exp = row.substring(es, i).toInt
        }
        val v = BigDecimal(row.substring(start, i))
        val tol = if (isInt) 0.0 else 1.01 * math.pow(10.0, (exp - frac).toDouble)
        nums += ((v, tol))
        shape.append('#')
      } else { shape.append(c); i += 1 }
    }
    (shape.toString, nums.result())
  }

  private def rowsTolerantEq(a: String, b: String): Boolean = {
    val (sa, na) = tokenize(a)
    val (sb, nb) = tokenize(b)
    sa == sb && na.size == nb.size &&
      na.zip(nb).forall { case ((va, ta), (vb, tb)) =>
        if (ta == 0.0 && tb == 0.0) va == vb
        else (va - vb).abs.toDouble <= math.max(ta, tb)
      }
  }

  test("every query's result multiset is invariant to input layout and shuffle partition count") {
    val keys = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (k, _) => excluded(k) }
    val failures = keys.flatMap { case (name, fn) =>
      try {
        val base = canon(fn(s, TestSpark.sf0001))
        val priorShuf = s.conf.get("spark.sql.shuffle.partitions")
        val priorMpb = s.conf.get("spark.sql.files.maxPartitionBytes")
        s.conf.set("spark.sql.shuffle.partitions", "7")
        s.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        val alt =
          try canon(fn(s, reparDir))
          finally {
            s.conf.set("spark.sql.shuffle.partitions", priorShuf)
            s.conf.set("spark.sql.files.maxPartitionBytes", priorMpb)
          }
        if (base == alt) None
        else {
          // exact-equal rows cancel multiset-wise; the residue must pair up
          // under the last-place tolerance
          val aRem = base.diff(alt)
          val bRem = scala.collection.mutable.ArrayBuffer(alt.diff(base): _*)
          val unmatched = aRem.filterNot { a =>
            val j = bRem.indexWhere(b => rowsTolerantEq(a, b))
            if (j >= 0) { bRem.remove(j); true } else false
          }
          if (unmatched.isEmpty && bRem.isEmpty) None
          else Some(s"$name: ${base.size} vs ${alt.size} rows; " +
            s"base-only ${unmatched.take(2).mkString(" | ")}; " +
            s"alt-only ${bRem.take(2).mkString(" | ")}")
        }
      } catch { case e: Throwable =>
        Some(s"$name: threw ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries depend on input layout:\n" + failures.mkString("\n"))
  }
}
