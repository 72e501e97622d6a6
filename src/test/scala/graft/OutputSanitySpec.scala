package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** No-NaN / no-Infinity output invariant (r11).
  *
  * The engine's degenerate-input policy is NULL, never NaN: every guarded
  * denominator nullifs, every ln/sqrt edge is fenced, and the DuckDB
  * differential gate would treat a NaN cell as just another value (both
  * engines can agree on a WRONG NaN, so the oracle cannot catch this
  * class). A NaN that escapes into a 100 TB output poisons every
  * downstream aggregate silently — the quiet cousin of the
  * divide-by-zero stage kill. This sweep runs every query at sf0.001 and
  * asserts no floating-point output cell (top-level, one struct level
  * deep, or inside a float/double array) is NaN or ±Infinity.
  */
/** Tagged Slow: part of the FULL adversarial profile (the round gate). The
  * fast iteration profile excludes these corpus-rewriting/multi-SF sweeps:
  * `sbt -batch "testOnly * -- -l org.scalatest.tags.Slow"` (see BASELINE.md
  * r12 notes). */
@org.scalatest.tags.Slow
class OutputSanitySpec extends AnyFunSuite {
  private def s = TestSpark.spark

  private val inf = lit(Double.PositiveInfinity)

  private def bad(c: Column): Column = isnan(c) || abs(c) === inf

  /** Predicates covering every float/double cell reachable in the output
    * schemas: scalars, struct members, and float/double arrays. */
  private def checks(df: DataFrame): Seq[Column] =
    df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case DoubleType | FloatType => Seq(bad(col(f.name)))
        case ArrayType(DoubleType | FloatType, _) =>
          Seq(exists(col(f.name), x => bad(x)))
        case st: StructType =>
          st.fields.toSeq.collect {
            case sf if sf.dataType == DoubleType || sf.dataType == FloatType =>
              bad(col(s"${f.name}.${sf.name}"))
          }
        case _ => Nil
      }
    }

  /** Runs the sweep at BOTH sf0.001 and sf0.01 (r11 verdict task #7): a
    * larger corpus has more groups and more degenerate slices, so it can
    * reach a NaN edge the small one never exercises — one decade up is
    * cheap insurance. */
  private def sweep(sfDir: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(s, sfDir)
          val cs = checks(df)
          if (cs.isEmpty) None
          else {
            val n = df.filter(cs.reduce(_ || _)).count()
            if (n == 0) None else Some(s"$name: $n rows with NaN/Inf cells")
          }
        } catch { case e: Throwable =>
          Some(s"$name: threw ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries leak NaN/Infinity at $sfDir:\n" +
        failures.mkString("\n"))
  }

  test("no query emits NaN or Infinity in any floating-point output cell (sf0.001)") {
    sweep(TestSpark.sf0001)
  }

  test("no query emits NaN or Infinity in any floating-point output cell (sf0.01)") {
    sweep(TestSpark.sf001)
  }
}
