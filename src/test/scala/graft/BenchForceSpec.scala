package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the defining property of the bench's timed action (Bench.force):
  * it must EVALUATE every terminal projection. A bare count() lets
  * Catalyst prune any column no downstream operator consumes — the r10
  * finding that q103's bucket column was never computed under the old
  * count() action (0.3 s benched vs ~10 s real). The accumulator probe
  * below is the direct regression test: if a future edit swaps force()
  * back to a pruning action, the evaluation count drops to zero and
  * this fails loudly.
  */
class BenchForceSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("force evaluates terminal projections that count() prunes") {
    val acc = s.sparkContext.longAccumulator("forceProbe")
    val probe = udf { (x: Long) => acc.add(1L); x * 2 }
    import s.implicits._
    // The probe must read from a file scan, as every bench query does: a
    // LocalRelation source would be folded eagerly by ConvertToLocalRelation
    // at optimization time, running the projection regardless of the action
    val dir = java.nio.file.Files.createTempDirectory("forceProbe").toString
    (1L to 100L).toDF("x").write.mode("overwrite").parquet(dir)
    val df = s.read.parquet(dir).select(col("x"), probe(col("x")).as("y"))

    df.count()
    assert(acc.value == 0L,
      s"count() unexpectedly evaluated the projection ${acc.value} times " +
        "— the pruning premise behind force() no longer holds; re-derive " +
        "the bench action rationale before trusting cross-round totals")

    Bench.force(df)
    assert(acc.value == 100L,
      s"force() must evaluate the projection once per row, saw ${acc.value}")
  }

  test("force handles map columns and nulls without erroring") {
    import s.implicits._
    val df = Seq((1L, Map("a" -> 1), Option("x")), (2L, Map.empty[String, Int], None))
      .toDF("id", "m", "o")
    Bench.force(df) // hash() on MapType throws; the to_json branch must kick in
  }

  test("force handles maps NESTED in structs/arrays and zero-column frames") {
    import s.implicits._
    // map inside a struct and inside an array: top-level-only MapType
    // detection misses both and xxhash64 throws on the map underneath
    val nested = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)))
      .toDF("id", "m")
      .select(col("id"), struct(col("m")).as("sm"), array(col("m")).as("am"))
    Bench.force(nested)
    // zero-column frame: cols.reduce on an empty array throws; the count()
    // fallback must keep this a timed force, not a bench failure
    Bench.force(Seq(1, 2, 3).toDF("x").select())
  }
}
