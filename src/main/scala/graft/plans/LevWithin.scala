package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lev_within(a, b, k)` — is the Levenshtein distance of two strings ≤ k?
  * A native, codegen'd Catalyst predicate for fuzzy-join residuals.
  *
  * Why not `levenshtein(a, b) <= k`: the builtin computes the FULL O(n·m)
  * DP for every candidate pair and only then compares against k. Inside a
  * blocked fuzzy join the threshold is tiny (k ≤ 4) and most candidates
  * fail it, so the right primitive is Ukkonen's banded DP: only the
  * 2k+1-wide diagonal band is ever filled (O(k·n) work), a length-gap
  * check rejects in O(1), and the row minimum aborts the whole pair the
  * moment the band exceeds k — typically after 2–3 rows on a mismatch.
  * Same preference ladder as [[CosineSim]]: builtin composition can't
  * express the early exit, a UDF would break whole-stage codegen, so a
  * native Expression with `doGenCode` it is.
  *
  * Semantics: identical decision to `levenshtein(a, b) <= k` (asserted
  * differentially in ExpressionSpec over the corpus); distances count
  * UTF-16 code units like the builtin does for BMP text (this corpus is
  * ASCII). Nulls propagate; k must be a non-negative integer. */
case class LevWithin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lev_within requires (string, string, int), got ($a, $b, $c)")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "lev_within"

  override def nullSafeEval(a: Any, b: Any, kAny: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    val t = b.asInstanceOf[UTF8String].toString
    val k = kAny.asInstanceOf[Int]
    LevWithin.within(s, t, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) => {
      s"${ev.value} = graft.plans.LevWithin.within($a.toString(), $b.toString(), $k);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LevWithin =
    copy(first = f, second = s, third = t)
}

object LevWithin {

  /** Ukkonen banded check, shared by the interpreted and generated paths
    * (one body → the two paths cannot disagree; the codegen win is staying
    * inside the WholeStageCodegen span, not duplicating the loop). */
  def within(a: String, b: String, k: Int): Boolean = {
    require(k >= 0, s"lev_within: k must be >= 0, got $k")
    val n = a.length
    val m = b.length
    if (math.abs(n - m) > k) return false
    if (k == 0) return a == b
    if (n == 0 || m == 0) return math.max(n, m) <= k
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      if (lo == 1) cur(0) = if (i <= k) i else inf
      var rowMin = if (lo == 1) cur(0) else inf
      j = lo
      while (j <= hi) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > k) return false
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m) <= k
  }

  private val info = new ExpressionInfo(classOf[LevWithin].getName, "lev_within")
  private[plans] val builder = (args: Seq[Expression]) => {
    require(args.length == 3, "lev_within takes exactly 3 arguments")
    LevWithin(args.head, args(1), args(2))
  }

  /** Idempotent per-session registration (same contract as
    * [[CosineSim.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("lev_within"), info, builder)
}
