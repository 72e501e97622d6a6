package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `cosine_sim(array<double>, array<double>)` as a native, codegen'd Catalyst
  * expression (SURVEY §4 optional candidate 1).
  *
  * Why an `Expression` and not a UDF or HOF chain: the HOF formulation
  * (zip_with → aggregate for the dot product plus two aggregate passes for
  * the norms) walks each array three times through generic lambda plumbing,
  * and a Scala UDF would break whole-stage codegen entirely. This expression
  * compiles to ONE fused Java loop inside the surrounding WholeStageCodegen
  * span — the preference order mandated for custom operators: builtin
  * composition < native Expression < UDF.
  *
  * Semantics: dot(a,b) / (||a||·||b||), accumulated left-to-right in IEEE
  * doubles — bit-identical to the sequential HOF formulation it replaces.
  * Returns null if either side is null; mismatched lengths raise (vectors
  * are schema-fixed 64-dim in this corpus). A zero-norm side — and likewise
  * any NaN/Inf-poisoned input whose ratio would come out NaN — yields 0.0,
  * not NaN: Spark orders NaN above every double, so a NaN cosine would
  * satisfy any `>= t` threshold and turn degenerate rows into universal
  * matches in similarity joins — 0.0 ("no direction, no similarity") is the
  * safe convention and what SimilarityBandRewrite's exactness proof assumes
  * (a banded equi-join could otherwise drop NaN pairs the original
  * `NaN >= t` predicate admitted).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n, "cosine_sim: length mismatch")
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    val r = if (denom == 0.0) 0.0 else dot / denom
    if (java.lang.Double.isNaN(r)) 0.0 else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val den = ctx.freshName("den")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("cosine_sim: length mismatch");
         |}
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $den = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = $den == 0.0 ? 0.0 : $dot / $den;
         |if (java.lang.Double.isNaN(${ev.value})) { ${ev.value} = 0.0; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  private val info = new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim")
  private[plans] val builder = (args: Seq[Expression]) => {
    require(args.length == 2, "cosine_sim takes exactly 2 arguments")
    CosineSim(args.head, args(1))
  }

  /** Idempotent per-session registration. Queries call this so the function
    * exists even in sessions built WITHOUT the extensions config (the
    * driver's Verify/Bench sessions are plain `SparkSession.builder`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("cosine_sim"), info, builder)
}

/** `SparkSessionExtensions` hook for users who configure the library the
  * idiomatic way:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Registers the native functions and the brute-force→banded similarity
  * join rewrite ([[SimilarityBandRewrite]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Reuse the objects' arity-checked builders so a wrong-arity SQL call
    // fails with a clean message, not an IndexOutOfBoundsException.
    ext.injectFunction(
      (FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
        CosineSim.builder))
    ext.injectFunction(
      (FunctionIdentifier("ref_angle"),
        new ExpressionInfo(classOf[RefAngle].getName, "ref_angle"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "ref_angle takes exactly 1 argument")
          RefAngle(args.head)
        }))
    ext.injectFunction(
      (FunctionIdentifier("lev_within"),
        new ExpressionInfo(classOf[LevWithin].getName, "lev_within"),
        LevWithin.builder))
    ext.injectFunction(
      (FunctionIdentifier("rp_bucket"),
        new ExpressionInfo(classOf[RpBucket].getName, "rp_bucket"),
        RpBucket.builder))
    ext.injectFunction(
      (FunctionIdentifier("sq_dist"),
        new ExpressionInfo(classOf[SqDist].getName, "sq_dist"),
        SqDist.builder))
    ext.injectOptimizerRule(_ => SimilarityBandRewrite)
    ext.injectQueryStagePrepRule(BroadcastGuard(_))
  }
}
