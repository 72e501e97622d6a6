package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GreaterThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{GeneratePredicate, GenerateUnsafeProjection}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{CosineSim, LevWithin, RefAngle}

/** The custom expressions' `doGenCode` must actually COMPILE — a Janino
  * parse error does not fail any query (UnsafeProjection/Predicate fall
  * back to interpreted mode with only a WARN), so without this suite a
  * template typo silently de-optimizes every plan the expression appears
  * in. `Generate*.generate` has no fallback: it throws on compile failure.
  *
  * Round-5 regression: RefAngle's template continued an `if` condition on
  * a line STARTING with `||`; Spark's codegen Block re-applies
  * stripMargin('|') downstream, ate the operator, and produced unparseable
  * Java — the banded similarity plan ran fully interpreted. */
class CodegenCompileSpec extends AnyFunSuite {

  private val arr0 = BoundReference(0, ArrayType(DoubleType), nullable = true)
  private val arr1 = BoundReference(1, ArrayType(DoubleType), nullable = true)
  private def row(a: Array[Double], b: Array[Double]): InternalRow =
    InternalRow(ArrayData.toArrayData(a), ArrayData.toArrayData(b))

  test("RefAngle codegen compiles and agrees with the interpreted path") {
    val proj = GenerateUnsafeProjection.generate(Seq(RefAngle(arr0)))
    val in = row(Array(1.0, 1.0), Array(1.0, 0.0))
    val got = proj(in).getDouble(0)
    val interp = RefAngle(arr0).eval(in).asInstanceOf[Double]
    assert(math.abs(got - interp) == 0.0)
    assert(math.abs(got - math.Pi / 4) < 1e-12) // angle of (1,1) to e0
    // NaN/zero-norm convention holds in the COMPILED path too
    val degenerate = row(Array(Double.NaN, 1.0), Array(0.0, 0.0))
    assert(proj(degenerate).getDouble(0) == 0.0)
  }

  test("CosineSim codegen compiles in projection AND predicate position") {
    val proj = GenerateUnsafeProjection.generate(Seq(CosineSim(arr0, arr1)))
    val in = row(Array(1.0, 0.0), Array(1.0, 0.0))
    assert(proj(in).getDouble(0) == 1.0)
    assert(proj(row(Array(1.0, 0.0), Array(0.0, 1.0))).getDouble(0) == 0.0)
    // predicate position is what the banded join's residual compiles into
    val pred = GeneratePredicate.generate(
      GreaterThanOrEqual(CosineSim(arr0, arr1), Literal(0.5, DoubleType)))
    pred.initialize(0)
    assert(pred.eval(in))
    assert(!pred.eval(row(Array(1.0, 0.0), Array(0.0, 1.0))))
  }

  test("LevWithin codegen compiles in predicate position and agrees with builtin levenshtein") {
    import org.apache.spark.sql.types.{IntegerType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val s0 = BoundReference(0, StringType, nullable = true)
    val s1 = BoundReference(1, StringType, nullable = true)
    def srow(a: String, b: String): InternalRow =
      InternalRow(UTF8String.fromString(a), UTF8String.fromString(b))
    val pred = GeneratePredicate.generate(
      LevWithin(s0, s1, Literal(2, IntegerType)))
    pred.initialize(0)
    assert(pred.eval(srow("kitten", "sitten")))       // dist 1
    assert(pred.eval(srow("kitten", "sittin")))       // dist 2
    assert(!pred.eval(srow("kitten", "sitting")))     // dist 3
    assert(pred.eval(srow("", "ab")) && !pred.eval(srow("", "abc")))
    // differential vs the builtin over corpus-like pairs for k in 0..4
    val words = Seq("cold rod", "bold rod", "cold rodd", "blue cap",
      "glue cap", "glue cup", "x", "", "abcdefgh", "abdcefhg")
    for (a <- words; b <- words; k <- 0 to 4) {
      val want = org.apache.spark.sql.catalyst.expressions.Levenshtein(
        s0, s1).eval(srow(a, b)).asInstanceOf[Int] <= k
      assert(LevWithin.within(a, b, k) == want,
        s"lev_within('$a','$b',$k) disagrees with builtin")
    }
  }

  test("RpBucket codegen compiles and agrees with the interpreted path (float and double)") {
    import org.apache.spark.sql.types.{FloatType, LongType}
    import graft.plans.RpBucket
    val planesT = ArrayType(ArrayType(LongType))
    val planes = ArrayData.toArrayData(Array(
      ArrayData.toArrayData(Array(1L, 1L, -1L)),
      ArrayData.toArrayData(Array(-1L, 1L, 1L)),
      ArrayData.toArrayData(Array(-1L, -1L, -1L))))
    // double vector path
    val vD = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val pRef = BoundReference(1, planesT, nullable = true)
    val exD = RpBucket(vD, pRef, Literal(1000.0, DoubleType))
    val projD = GenerateUnsafeProjection.generate(Seq(exD))
    val inD = InternalRow(
      ArrayData.toArrayData(Array(0.5, -0.25, 0.125)), planes)
    // qv = (500, -250, 125): dots = 125, -625, -375 -> bits {0} -> 1
    assert(projD(inD).getLong(0) == 1L)
    assert(exD.eval(inD).asInstanceOf[Long] == 1L)
    // float vector path widens exactly and agrees
    val vF = BoundReference(0, ArrayType(FloatType), nullable = true)
    val exF = RpBucket(vF, pRef, Literal(1000.0, DoubleType))
    val projF = GenerateUnsafeProjection.generate(Seq(exF))
    val inF = InternalRow(
      ArrayData.toArrayData(Array(0.5f, -0.25f, 0.125f)), planes)
    assert(projF(inF).getLong(0) == 1L)
    assert(exF.eval(inF).asInstanceOf[Long] == 1L)
    // zero dot counts as the positive side (>= 0), like the HOF form
    val inZ = InternalRow(
      ArrayData.toArrayData(Array(0.0, 0.0, 0.0)), planes)
    assert(projD(inZ).getLong(0) == 7L)
  }

  test("RpBucket null-propagates per-element nulls and rejects >62 planes (eval AND codegen)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.LongType
    import graft.plans.RpBucket
    // containsNull=true schemas — the only way null elements are representable
    val vRef = BoundReference(0, ArrayType(DoubleType, containsNull = true), nullable = true)
    val pRef = BoundReference(1,
      ArrayType(ArrayType(LongType, containsNull = true), containsNull = true),
      nullable = true)
    val ex = RpBucket(vRef, pRef, Literal(1000.0, DoubleType))
    assert(ex.nullable)
    val proj = GenerateUnsafeProjection.generate(Seq(ex))
    val planes = new GenericArrayData(Array[Any](
      new GenericArrayData(Array[Any](1L, 1L, -1L)),
      new GenericArrayData(Array[Any](-1L, 1L, 1L))))
    // clean row still computes (qv = (500,-250,125): dots 125, -625 -> 1)
    val clean = InternalRow(
      new GenericArrayData(Array[Any](0.5, -0.25, 0.125)), planes)
    assert(ex.eval(clean).asInstanceOf[Long] == 1L)
    assert(proj(clean).getLong(0) == 1L)
    // a null VECTOR element -> null bucket (the HOF's null-propagation)
    val nullVec = InternalRow(
      new GenericArrayData(Array[Any](0.5, null, 0.125)), planes)
    assert(ex.eval(nullVec) == null)
    assert(proj(nullVec).isNullAt(0))
    // a null PLANE -> null bucket
    val nullPlane = InternalRow(
      new GenericArrayData(Array[Any](0.5, -0.25, 0.125)),
      new GenericArrayData(Array[Any](null,
        new GenericArrayData(Array[Any](1L, 1L, -1L)))))
    assert(ex.eval(nullPlane) == null)
    assert(proj(nullPlane).isNullAt(0))
    // a null PLANE ELEMENT -> null bucket
    val nullPlaneElem = InternalRow(
      new GenericArrayData(Array[Any](0.5, -0.25, 0.125)),
      new GenericArrayData(Array[Any](
        new GenericArrayData(Array[Any](1L, null, -1L)))))
    assert(ex.eval(nullPlaneElem) == null)
    assert(proj(nullPlaneElem).isNullAt(0))
    // 63 planes: 1L << p wraps at 64 and would alias bucket bits — raises
    // in both paths (the rpLshBucket facade guard now also covers raw SQL)
    val deep = InternalRow(
      new GenericArrayData(Array[Any](1.0)),
      new GenericArrayData(
        Array.fill[Any](63)(new GenericArrayData(Array[Any](1L)))))
    intercept[IllegalArgumentException](ex.eval(deep))
    intercept[IllegalArgumentException](proj(deep))
    // 62 planes is the documented maximum and still computes
    val ok62 = InternalRow(
      new GenericArrayData(Array[Any](1.0)),
      new GenericArrayData(
        Array.fill[Any](62)(new GenericArrayData(Array[Any](1L)))))
    assert(ex.eval(ok62).asInstanceOf[Long] == (1L << 62) - 1) // bits 0..61
    assert(proj(ok62).getLong(0) == ex.eval(ok62).asInstanceOf[Long])
  }
}
