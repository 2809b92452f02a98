package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: scalar BAND theta-join → bucketed equi-join — the
  * third member of the banding family, next to [[CosineBandRule]]
  * (cosine threshold) and the as-of decomposition
  * ([[AsOfRewriteRule]]). `a.x BETWEEN b.y − w₁ AND b.y + w₂` is a
  * non-equi condition Spark can only plan as a broadcast nested loop
  * (or worse, a cartesian) — O(n·m) comparisons no matter how narrow
  * the band. But the band is a LOCALITY statement: with
  * W = max(w₁, w₂), every qualifying pair satisfies
  * |x/W − y/W| ≤ 1, so floor(x/W) and floor(y/W) differ by at most 1
  * in exact arithmetic (at most 2 after FP division). Bucketing the
  * left side on floor(x/W), exploding the right side onto its 5
  * adjacent probe buckets floor(y/W) ∈ {−2..+2}, and equi-joining on
  * the bucket turns the nested loop into a hash/sort-merge equi-join
  * whose work is proportional to input + near-band pair volume. The
  * ORIGINAL condition is kept as the exact verify, so semantics are
  * unchanged, and a pair meets in exactly one bucket (the left row
  * has ONE bucket), so no dedup is needed.
  *
  * Fires on inner joins whose condition contains a conjunct pair
  * bounding ONE side's numeric expression by the OTHER side's
  * expression ± foldable non-negative literals — the desugared
  * `between(y − w, y + w)` in any operand orientation, ≥/> and ≤/<
  * alike (a strict band is inside the non-strict cover). Bands
  * written in subtracted form (`x − y ≤ w`) are out of scope.
  * Idempotent: rewritten joins carry `__bandb` attributes and skip.
  *
  * CONFIG-GATED, default OFF (`spark.graft.bandJoinRewrite=true`):
  * the rewrite replicates the probe side ×5 and adds a shuffle, which
  * loses to a broadcast nested loop whenever one side is broadcast-
  * small — the common bench-scale case. It wins when BOTH sides are
  * fact-sized (the nested loop is then quadratic and the band keeps
  * bucket occupancy flat) — a cluster-scale property the local
  * optimizer cannot observe, so the user opts in, exactly like
  * `spark.graft.topkRewrite`.
  */
object BandJoinRule extends Rule[LogicalPlan] {

  private val BucketPrefix = "__bandb"

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** A conjunct's reading as a lower bound `x ≥ y − w` (w ≥ 0). */
  private def asLower(e: Expression): Option[(Expression, Expression, Double)] = {
    def sub(rhs: Expression): Option[(Expression, Double)] = rhs match {
      case Subtract(y, l: Literal, _) => litVal(l).map(y -> _)
      case _                          => None
    }
    e match {
      case GreaterThanOrEqual(x, rhs) => sub(rhs).map { case (y, w) => (x, y, w) }
      case GreaterThan(x, rhs)        => sub(rhs).map { case (y, w) => (x, y, w) }
      case LessThanOrEqual(lhs, x)    => sub(lhs).map { case (y, w) => (x, y, w) }
      case LessThan(lhs, x)           => sub(lhs).map { case (y, w) => (x, y, w) }
      case _                          => None
    }
  }

  /** A conjunct's reading as an upper bound `x ≤ y + w` (w ≥ 0). */
  private def asUpper(e: Expression): Option[(Expression, Expression, Double)] = {
    def add(rhs: Expression): Option[(Expression, Double)] = rhs match {
      case Add(y, l: Literal, _) => litVal(l).map(y -> _)
      case Add(l: Literal, y, _) => litVal(l).map(y -> _)
      case _                     => None
    }
    e match {
      case LessThanOrEqual(x, rhs)    => add(rhs).map { case (y, w) => (x, y, w) }
      case LessThan(x, rhs)           => add(rhs).map { case (y, w) => (x, y, w) }
      case GreaterThanOrEqual(lhs, x) => add(lhs).map { case (y, w) => (x, y, w) }
      case GreaterThan(lhs, x)        => add(lhs).map { case (y, w) => (x, y, w) }
      case _                          => None
    }
  }

  private def litVal(l: Literal): Option[Double] =
    if (l.dataType.isInstanceOf[NumericType] && l.value != null) {
      val d = l.value.toString.toDouble
      if (d >= 0.0 && !d.isNaN && !d.isInfinite) Some(d) else None
    } else None

  /** (x, y, W): x's side is bucketed, y's side probes ±2; W > 0. */
  private case class BandMatch(x: Expression, y: Expression, width: Double,
                               xOnLeft: Boolean)

  private def findBand(cond: Expression, left: LogicalPlan,
                       right: LogicalPlan): Option[BandMatch] = {
    def sided(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
        e.dataType.isInstanceOf[NumericType] && e.deterministic
    val cs = splitConjuncts(cond)
    val lowers = cs.flatMap(asLower)
    val uppers = cs.flatMap(asUpper)
    (for {
      (lx, ly, w1) <- lowers.iterator
      (ux, uy, w2) <- uppers.iterator
      if (lx semanticEquals ux) && (ly semanticEquals uy)
      w = math.max(w1, w2)
      if w > 0.0
      m <- if (sided(lx, left) && sided(ly, right))
             Some(BandMatch(lx, ly, w, xOnLeft = true))
           else if (sided(lx, right) && sided(ly, left))
             Some(BandMatch(lx, ly, w, xOnLeft = false))
           else None
    } yield m).nextOption()
  }

  private def bucketOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType)))

  /** [[bucketOf]] with the soundness guard. The ±2 probe slack covers
    * exact adjacency (±1) plus at most one FP-rounding bucket shift
    * per side — and a shift stays ≤1 only while the value error of
    * `x/W` is < 1, i.e. |x| / W · 2⁻⁵² < 1. Past |x| > W·2⁵⁰ (4×
    * margin) the double division can shift floor(x/W) by MORE than
    * the slack and qualifying pairs would be silently dropped, so the
    * bucket expression raises a descriptive error instead — loud
    * failure, never silent wrong results. NULL inputs pass through as
    * NULL buckets (they never equi-join), exactly as unguarded.
    */
  private def guardedBucket(e: Expression, w: Double): Expression = {
    val x = Cast(e, DoubleType)
    val ok = Or(IsNull(x),
      LessThanOrEqual(Abs(x), Literal(w * math.pow(2.0, 50), DoubleType)))
    If(ok, bucketOf(e, w),
      Cast(new RaiseError(Literal(
        "BandJoinRule: |value| exceeds band width * 2^50, so bucket " +
        "arithmetic cannot honor the ±2 probe slack; widen the band or " +
        "disable spark.graft.bandJoinRewrite")), LongType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.bandJoinRewrite", "false").toBoolean)
      return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.references.exists(_.name.startsWith(BucketPrefix)) =>
        findBand(cond, left, right) match {
          case Some(BandMatch(x, y, w, xOnLeft)) =>
            val (bSide, pSide) = if (xOnLeft) (left, right) else (right, left)
            // x always lives on bSide by construction
            val bl = Alias(guardedBucket(x, w), s"${BucketPrefix}_k")()
            val keyed = Project(bSide.output :+ bl, bSide)
            val py = Alias(guardedBucket(y, w), s"${BucketPrefix}_c")()
            val centered = Project(pSide.output :+ py, pSide)
            val probeAttr =
              AttributeReference(s"${BucketPrefix}_probe", LongType, nullable = true)()
            val probes = Generate(
              Explode(CreateArray((-2L to 2L).map(i =>
                Add(py.toAttribute, Literal(i))))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(probeAttr), child = centered)
            val newCond = And(EqualTo(bl.toAttribute, probeAttr), cond)
            val (nl, nr) = if (xOnLeft) (keyed, probes) else (probes, keyed)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }
}
