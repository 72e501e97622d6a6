package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `rp_bucket(vec, planes, quant_scale)` — the random-projection LSH bucket
  * of a vector, as a native codegen'd Catalyst expression.
  *
  * Semantics (bit-identical to the nested-HOF formulation it replaces):
  * quantize each component to the integer grid `floor(x·scale + 0.5)`,
  * then for plane p (an `array<long>` of ±1 signs) set bit p of the
  * result iff the integer dot product `Σᵢ planes[p][i]·qv[i] ≥ 0`.
  * Integer-exact throughout — engines cannot drift on it.
  *
  * Why an Expression: the HOF form
  * (`aggregate(sequence(0,P-1), .., aggregate(sequence(1,D), ..))`) walks
  * P·D interpreted lambda steps per row with boxed accumulators and
  * per-step `element_at` bounds checks — measured ~10 s for 2 k rows ×
  * 16 planes × 64 dims at sf0.1 once the bench action stopped letting
  * Catalyst prune the column (r10). This compiles to one fused integer
  * loop nest inside WholeStageCodegen, the same preference-order call as
  * [[CosineSim]]: builtin composition first, but when the builtin path is
  * an interpreted P·D lambda cascade, a native Expression IS the faster
  * Spark-first form. Accepts `array<float>` or `array<double>` vectors
  * (floats widen exactly, so prior CAST-then-transform plans and this
  * expression agree bit-for-bit); `quant_scale` must be a double;
  * `planes` is `array<array<long>>` (broadcast-joined from a one-row
  * derivation — dimension-bounded). Null if any input is null OR if any
  * ELEMENT (vector component, plane, or plane component) is null — the
  * same null-propagation the element_at/aggregate HOF form has, so the
  * bit-identity claim covers containsNull data too. A plane whose length
  * mismatches the vector raises; more than 62 planes raises (bit 63 is
  * the long's sign bit and `1L << p` wraps at 64 — the same bound the
  * `rpLshBucket` facade enforces, now also covering raw SQL callers).
  */
case class RpBucket(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType | FloatType, _),
            ArrayType(ArrayType(LongType, _), _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, p, q) => TypeCheckResult.TypeCheckFailure(
        "rp_bucket requires (array<double|float>, array<array<long>>, " +
          s"double), got ($v, $p, $q)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rp_bucket"

  private lazy val isFloat =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType
  // per-element null checks are generated only where the schema says null
  // elements are representable — containsNull=false keeps the original
  // check-free loop nest
  private lazy val vecCN = first.dataType.asInstanceOf[ArrayType].containsNull
  private lazy val planesOuterCN = second.dataType.asInstanceOf[ArrayType].containsNull
  private lazy val planesInnerCN = second.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean =
    children.exists(_.nullable) || vecCN || planesOuterCN || planesInnerCN

  override def nullSafeEval(v: Any, ps: Any, q: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val planes = ps.asInstanceOf[ArrayData]
    val scale = q.asInstanceOf[Double]
    val n = x.numElements()
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (vecCN && x.isNullAt(i)) return null
      val xd = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      qv(i) = math.floor(xd * scale + 0.5).toLong
      i += 1
    }
    require(planes.numElements() <= 62,
      "rp_bucket: at most 62 planes (1L << p wraps at 64)")
    var bucket = 0L
    var p = 0
    while (p < planes.numElements()) {
      if (planesOuterCN && planes.isNullAt(p)) return null
      val plane = planes.getArray(p)
      require(plane.numElements() == n, "rp_bucket: plane/vector length mismatch")
      var dot = 0L
      var j = 0
      while (j < n) {
        if (planesInnerCN && plane.isNullAt(j)) return null
        dot += plane.getLong(j) * qv(j)
        j += 1
      }
      if (dot >= 0L) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, ps, q) => {
      val n = ctx.freshName("n")
      val qv = ctx.freshName("qv")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val plane = ctx.freshName("plane")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val anyNull = ctx.freshName("anyNull")
      val get = if (isFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      // element-null plumbing only when the schema can represent it; when
      // any check is generated, `nullable` is true so ev.isNull is a real
      // variable (nullSafeCodeGen documents resultCode may change it)
      val anyCN = vecCN || planesOuterCN || planesInnerCN
      val vecNullChk =
        if (vecCN) s"if ($v.isNullAt($i)) { $anyNull = true; break; }" else ""
      val planeNullChk =
        if (planesOuterCN) s"if ($ps.isNullAt($p)) { $anyNull = true; break; }" else ""
      val elemNullChk =
        if (planesInnerCN) s"if ($plane.isNullAt($j)) { $anyNull = true; break; }" else ""
      val innerBreak = if (planesInnerCN) s"if ($anyNull) break;" else ""
      val declAnyNull = if (anyCN) s"boolean $anyNull = false;" else ""
      val loopGuard = if (anyCN) s" && !$anyNull" else ""
      val assign =
        if (anyCN) s"if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $bucket; }"
        else s"${ev.value} = $bucket;"
      s"""
         |int $n = $v.numElements();
         |long[] $qv = new long[$n];
         |$declAnyNull
         |for (int $i = 0; $i < $n; $i++) {
         |  $vecNullChk
         |  $qv[$i] = (long) java.lang.Math.floor($get($i) * $q + 0.5);
         |}
         |if ($ps.numElements() > 62) {
         |  throw new IllegalArgumentException("rp_bucket: at most 62 planes (1L << p wraps at 64)");
         |}
         |long $bucket = 0L;
         |for (int $p = 0; $p < $ps.numElements()$loopGuard; $p++) {
         |  $planeNullChk
         |  org.apache.spark.sql.catalyst.util.ArrayData $plane = $ps.getArray($p);
         |  if ($plane.numElements() != $n) {
         |    throw new IllegalArgumentException("rp_bucket: plane/vector length mismatch");
         |  }
         |  long $dot = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $elemNullChk
         |    $dot += $plane.getLong($j) * $qv[$j];
         |  }
         |  $innerBreak
         |  if ($dot >= 0L) $bucket |= 1L << $p;
         |}
         |$assign
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): RpBucket =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RpBucket {
  private val info = new ExpressionInfo(classOf[RpBucket].getName, "rp_bucket")
  private[plans] val builder = (args: Seq[Expression]) => {
    require(args.length == 3, "rp_bucket takes exactly 3 arguments")
    RpBucket(args.head, args(1), args(2))
  }

  /** Idempotent per-session registration (the [[CosineSim.register]]
    * pattern — callable from plain driver sessions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("rp_bucket"), info, builder)
}
