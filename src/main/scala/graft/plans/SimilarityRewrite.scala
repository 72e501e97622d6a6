package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** `ref_angle(array<double>)` — the angle (radians, in [0, π]) between a
  * vector and the fixed reference direction e₁ = (1, 0, …, 0):
  * `acos(v[0] / ||v||)`, clamped against fp drift. Zero-norm (or empty)
  * vectors return 0.0, mirroring CosineSim's zero-norm convention.
  *
  * This is the banding key for [[SimilarityBandRewrite]]: angular distance
  * θ(a,b) = acos(cos_sim(a,b)) is a metric on the sphere, so by the triangle
  * inequality |ref_angle(a) − ref_angle(b)| ≤ θ(a,b) — a 1-D exact bound on
  * how far apart two similar vectors' reference angles can be.
  */
case class RefAngle(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ref_angle requires array<double>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ref_angle"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); ss += x * x; i += 1 }
    // NaN/Inf-poisoned vectors fall back to 0.0 like zero-norm ones, matching
    // CosineSim's convention (its value for such inputs is also 0.0, so the
    // banding key being 0 is consistent with the pairs the residual keeps).
    if (n == 0 || ss == 0.0 || java.lang.Double.isNaN(ss) ||
      java.lang.Double.isInfinite(ss)) 0.0
    else {
      val c = a.getDouble(0) / math.sqrt(ss)
      math.acos(math.max(-1.0, math.min(1.0, c)))
    }
  }

  // Template constraint: no generated line may BEGIN with '|' (e.g. a
  // continuation line starting with "||"): Spark's codegen Block applies
  // stripMargin('|') again downstream, which silently eats the operator and
  // leaves unparseable Java — the whole plan then falls back to interpreted
  // evaluation (hit in round 5; CodegenCompileSpec guards it).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val ss = ctx.freshName("ss")
      val x = ctx.freshName("x")
      val c = ctx.freshName("c")
      s"""
         |double $ss = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = $a.getDouble($i);
         |  $ss += $x * $x;
         |}
         |if ($a.numElements() == 0 || $ss == 0.0 || java.lang.Double.isNaN($ss) ||
         |    java.lang.Double.isInfinite($ss)) {
         |  ${ev.value} = 0.0;
         |} else {
         |  double $c = $a.getDouble(0) / java.lang.Math.sqrt($ss);
         |  ${ev.value} = java.lang.Math.acos(
         |    java.lang.Math.max(-1.0, java.lang.Math.min(1.0, $c)));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RefAngle =
    copy(child = newChild)
}

/** SURVEY §4 optional candidate 3: rewrite a brute-force all-pairs cosine
  * similarity join into a banded equi join — the guardrail that stops a user
  * writing q77's naive shape from getting the quadratic plan at 100 TB.
  *
  * Matched shape (what Catalyst's pushdown leaves of
  * `a.join(b, cond).filter(cosine_sim(x, y) >= t)`):
  *
  *   Join(left, right, Inner, cond)  where cond's conjuncts contain
  *     `w(cosine_sim(x, y)) >= t`  (w a monotone wrapper, e.g. §2.9 rounding)
  *   and NO equi-join conjunct (an equi key means it is already hash-joinable).
  *
  * Rewrite (EXACT — an optimizer rule must never change results):
  *   1. Numerically invert the monotone wrapper to the raw bound b:
  *      w(c) ≥ t  ⟹  c ≥ b (bisection over [-1,1]; fires only when b > 0).
  *   2. Band both sides by reference angle: band = floor(ref_angle(v) / w)
  *      with bucket width w = acos(b). By the spherical triangle inequality,
  *      cos_sim(a,b) ≥ b ⟹ |ref_angle(a) − ref_angle(b)| ≤ acos(b) ⟹ the
  *      two band ids differ by at most 1.
  *   3. Explode the probe side to its 3 adjacent bands and EQUI-join on the
  *      band id, keeping the ENTIRE original condition as the residual
  *      filter — every original conjunct still runs, so the result set is
  *      identical; only the candidate-pair generation shrinks from |L|·|R|
  *      to adjacent-band pairs (a factor ≈ π/(3·acos(b)) — stronger the
  *      higher the threshold; near-dup thresholds ≥0.9 prune ≥4×, and the
  *      join becomes shuffle-partitionable on the band key instead of a
  *      broadcast nested loop).
  *
  * The rewrite fires only when BOTH sides' estimated size exceeds
  * `spark.graft.similarityRewrite.minSideBytes` (default 1 GiB): below that
  * the brute-force plan is cheaper than the extra shuffle. Introduced equi
  * keys make the rewritten join ineligible on the next pass — the natural
  * fixed-point guard.
  *
  * Injected via [[GraftExtensions]] (`spark.sql.extensions`) or ad hoc with
  * `spark.experimental.extraOptimizations = Seq(SimilarityBandRewrite)`.
  */
object SimilarityBandRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val MinSideBytesKey = "spark.graft.similarityRewrite.minSideBytes"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val minBytes = BigInt(
      SQLConf.get.getConfString(MinSideBytesKey, (1L << 30).toString))
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _)
          if left.stats.sizeInBytes >= minBytes &&
            right.stats.sizeInBytes >= minBytes =>
        rewrite(j, left, right, cond).getOrElse(j)
    }
  }

  /** Numeric literal → Double. */
  private object NumLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v, _: NumericType) => v match {
        case d: Double => Some(d)
        case f: Float => Some(f.toDouble)
        case l: Long => Some(l.toDouble)
        case i: Int => Some(i.toDouble)
        case s: Short => Some(s.toDouble)
        case b: Byte => Some(b.toDouble)
        case d: Decimal => Some(d.toDouble)
        case _ => None
      }
      case _ => None
    }
  }

  /** Is `e` CosineSim composed with only monotone-nondecreasing steps
    * (scaling by a positive literal, adding a literal, floor/ceil, casts)?
    * The whitelist guarantees a single CosineSim occurrence and that
    * threshold inversion by bisection is sound. */
  private def monotonePath(e: Expression): Boolean = e match {
    case _: CosineSim => true
    case Multiply(l, NumLit(v), _) if v > 0 => monotonePath(l)
    case Multiply(NumLit(v), r, _) if v > 0 => monotonePath(r)
    case Divide(l, NumLit(v), _) if v > 0 => monotonePath(l)
    case Add(l, _: Literal, _) => monotonePath(l)
    case Add(_: Literal, r, _) => monotonePath(r)
    case Subtract(l, _: Literal, _) => monotonePath(l)
    case Floor(c) => monotonePath(c)
    case Ceil(c) => monotonePath(c)
    case c: Cast if monotoneCast(c) => monotonePath(c.child)
    case _ => false
  }

  /** Casts are NOT universally monotone — legacy-mode overflow-wrapping
    * downcasts (e.g. long→int) and cast-to-boolean reorder values, which
    * would make the bisection bound unsound. Whitelist only value-preserving
    * or monotone-rounding numeric widenings. */
  private def monotoneCast(c: Cast): Boolean = {
    def rank(t: DataType): Int = t match {
      case ByteType => 1; case ShortType => 2; case IntegerType => 3
      case LongType => 4; case _ => 0
    }
    (c.child.dataType, c.dataType) match {
      case (_: NumericType, DoubleType) => true // exact or round-to-nearest: monotone
      // integral widening only (rank 0 = non-integral → rejected)
      case (f, to) => rank(f) > 0 && rank(to) > 0 && rank(f) <= rank(to)
    }
  }

  /** Smallest c ∈ [-1,1] (underestimated) such that the wrapped predicate can
    * hold, or None when inversion is impossible / gives no pruning power. */
  private def rawBound(wrapper: Expression, t: Double, strict: Boolean): Option[Double] = {
    def w(c: Double): Option[Double] = {
      val sub = wrapper.transform { case _: CosineSim => Literal(c, DoubleType) }
      if (sub.references.nonEmpty) None
      else Option(sub.eval(null)).flatMap {
        case d: java.lang.Double => Some(d.doubleValue)
        case f: java.lang.Float => Some(f.toDouble)
        case l: java.lang.Long => Some(l.toDouble)
        case i: java.lang.Integer => Some(i.toDouble)
        case d: Decimal => Some(d.toDouble)
        case _ => None
      }
    }
    def ok(c: Double): Boolean =
      w(c).exists(v => if (strict) v > t else v >= t)
    if (!ok(1.0)) None // predicate unsatisfiable — not our business, leave it
    else if (ok(-1.0)) None // bound ≤ −1: banding can't prune anything
    else {
      var lo = -1.0; var hi = 1.0 // invariant: !ok(lo) && ok(hi)
      var k = 0
      while (k < 80) { val m = (lo + hi) / 2; if (ok(m)) hi = m else lo = m; k += 1 }
      Some(lo) // lo strictly below the true bound → safe (inclusive) bands
    }
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def spansBoth(a: Expression, b: Expression): Boolean =
      (a.references.nonEmpty && b.references.nonEmpty &&
        a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
        (a.references.nonEmpty && b.references.nonEmpty &&
          a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))

    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b) => spansBoth(a, b)
      case EqualNullSafe(a, b) => spansBoth(a, b)
      case _ => false
    }
    if (hasEquiKey) return None

    val matched = conjuncts.collectFirst {
      case GreaterThanOrEqual(e, NumLit(t)) if monotonePath(e) => (e, t, false)
      case GreaterThan(e, NumLit(t)) if monotonePath(e) => (e, t, true)
      case LessThanOrEqual(NumLit(t), e) if monotonePath(e) => (e, t, false)
      case LessThan(NumLit(t), e) if monotonePath(e) => (e, t, true)
    }
    matched.flatMap { case (wrapper, t, strict) =>
      val cs = wrapper.collectFirst { case c: CosineSim => c }.get
      // Which cosine argument lives on which join side?
      val sides: Option[(Expression, Expression)] =
        if (cs.left.references.nonEmpty && cs.right.references.nonEmpty &&
          cs.left.references.subsetOf(left.outputSet) &&
          cs.right.references.subsetOf(right.outputSet))
          Some((cs.left, cs.right))
        else if (cs.left.references.nonEmpty && cs.right.references.nonEmpty &&
          cs.right.references.subsetOf(left.outputSet) &&
          cs.left.references.subsetOf(right.outputSet))
          Some((cs.right, cs.left))
        else None
      for {
        (xL, xR) <- sides
        b <- rawBound(wrapper, t, strict)
        if b > 0.0 // acos(b) < π/2 — at least ~6 bands over [0, π]
      } yield {
        val width = math.acos(b)
        val bandL = Alias(
          Floor(Divide(RefAngle(xL), Literal(width, DoubleType))), "graft_band")()
        val bandR = Alias(
          Floor(Divide(RefAngle(xR), Literal(width, DoubleType))), "graft_band_r")()
        val leftP = Project(left.output :+ bandL, left)
        val rightP = Project(right.output :+ bandR, right)
        val bR = bandR.toAttribute
        val probe = AttributeReference("graft_band_probe", LongType)()
        val gen = Generate(
          Explode(CreateArray(Seq(
            Subtract(bR, Literal(1L)), bR, Add(bR, Literal(1L))))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(probe), child = rightP)
        val banded = Join(leftP, gen, Inner,
          Some(And(cond, EqualTo(bandL.toAttribute, probe))), j.hint)
        Project(j.output, banded)
      }
    }
  }
}
