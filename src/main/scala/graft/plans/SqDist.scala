package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `sq_dist(array<double>, array<double>)` — squared L2 distance as a
  * native, codegen'd Catalyst expression (r14; the [[CosineSim]] pattern).
  *
  * Why: the HOF formulation `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)),
  * 0e0, (acc,x) -> acc+x)` materializes an intermediate array and walks it
  * through interpreted lambda plumbing per row — measured as the dominant
  * CPU of the kmeans/IVF assignment stages (q204/q85's kmAssign evaluates
  * it |vectors| × |centroids| times, in a subtree its plan references
  * twice). This compiles to one fused Java loop inside the surrounding
  * WholeStageCodegen span.
  *
  * Semantics: Σ (aᵢ−bᵢ)², accumulated left-to-right in IEEE doubles —
  * bit-identical to the sequential HOF fold it replaces (same per-element
  * expression, same accumulation order). Null if either side is null;
  * mismatched lengths raise (vectors are schema-fixed in this corpus —
  * the CosineSim convention). */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_dist requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n, "sq_dist: length mismatch")
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("sq_dist: length mismatch");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  private val info = new ExpressionInfo(classOf[SqDist].getName, "sq_dist")
  private[plans] val builder = (args: Seq[Expression]) => {
    require(args.length == 2, "sq_dist takes exactly 2 arguments")
    SqDist(args.head, args(1))
  }

  /** Idempotent per-session registration (the CosineSim convention). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("sq_dist"), info, builder)
}
