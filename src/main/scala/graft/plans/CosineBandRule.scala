package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.{VecDot, VecSum}

/** Optimizer rule: 1-D projection band for cosine-threshold joins —
  * the second SURVEY §4.3 similarity-join rewrite, next to
  * [[JaccardPrefilterRule]].
  *
  * For unit-normalized â, b̂ and ANY unit direction ĥ,
  * `cos(a,b) ≥ t` implies `‖â − b̂‖ = √(2 − 2·cos) ≤ √(2−2t)`, and by
  * Cauchy–Schwarz `|⟨â,ĥ⟩ − ⟨b̂,ĥ⟩| ≤ ‖â − b̂‖`. So with the fixed
  * direction ĥ = 1⃗/√d and projection `p(x) = Σxᵢ / (‖x‖·√d)`, every
  * qualifying pair satisfies `|p(a) − p(b)| ≤ w` where `w = √(2−2t)` —
  * a NECESSARY condition: bucketing both sides on `floor(p/w)` and
  * equi-joining on {bucket−1, bucket, bucket+1} loses no qualifying
  * pair and turns the O(n·m) nested-loop cosine join into a
  * hash/sort-merge equi-join whose per-bucket work shrinks as the
  * threshold rises. The original cosine predicate is kept as the exact
  * verify, so semantics are unchanged (the classic LSH
  * bucket-then-verify shape, expressed as a plan rewrite).
  *
  * Fires on inner joins whose condition contains
  * `vec_dot(a,b) / (na · nb) >|≥ t` with `0 < t < 1`, `a`/`na` from one
  * side and `b`/`nb` from the other, where each `n` is (possibly
  * through column aliases) `sqrt(vec_dot(x, x))` of the same side's
  * vector, AND the condition also pins `size(a) = size(b)` — anything
  * else is left untouched. Idempotent: rewritten joins carry the
  * `__cosb` bucket attributes and are skipped.
  *
  * The dimensionality guard is load-bearing, not cosmetic: `vec_dot`
  * truncates to the shorter operand, so the predicate is well-defined
  * for ragged pairs — but each side's projection normalizes by ITS OWN
  * `sqrt(size(v))`, i.e. a different unit direction per length, and
  * the Cauchy–Schwarz band bound only holds when both sides project
  * onto the SAME direction. Counterexample (round-2 advice): a=[1,0,0,0],
  * b=[1], t=0.9 has cos=1 yet |p(a)−p(b)| = 0.5 > w ≈ 0.447 — banding
  * would silently drop the pair. Requiring an explicit
  * `size(a) = size(b)` conjunct makes every joinable pair share one
  * dimension, under which the bound is exact; ragged-pair joins keep
  * their original nested-loop plan.
  *
  * Production note: one projection is the minimal member of the
  * family; k independent directions multiply pruning power at the cost
  * of 3^k probe buckets (or one composite band key per direction).
  */
object CosineBandRule extends Rule[LogicalPlan] {

  private val BucketPrefix = "__cosb"

  /** exprId → aliased expression, from every Project below `plan`. */
  private def aliasMap(plan: LogicalPlan): Map[ExprId, Expression] =
    plan.collect { case p: Project =>
      p.projectList.collect { case a: Alias => a.exprId -> a.child }
    }.flatten.toMap

  /** Substitute attributes by their defining alias expressions until
    * fixpoint (bounded) — lets the pattern see through
    * `withColumn("nv", sqrt(vec_dot(ve, ve)))`-style pre-computation.
    */
  private def dealias(e: Expression, m: Map[ExprId, Expression]): Expression = {
    var cur = e
    var i = 0
    while (i < 8) {
      val next = cur.transformUp {
        case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
      }
      if (next fastEquals cur) return cur
      cur = next
      i += 1
    }
    cur
  }

  private case class CosMatch(a: Expression, na: Expression,
                              b: Expression, nb: Expression, t: Double)

  /** True iff some conjunct pins `size(a) = size(b)` (either order,
    * seen through aliases) — the equal-dimensionality guarantee the
    * band bound needs (see the rule doc's counterexample).
    */
  private def hasSizeGuard(conjuncts: Seq[Expression], a: Expression,
                           b: Expression, m: Map[ExprId, Expression]): Boolean = {
    val da = dealias(a, m)
    val db = dealias(b, m)
    conjuncts.exists {
      case EqualTo(Size(x, _), Size(y, _)) =>
        val dx = dealias(x, m)
        val dy = dealias(y, m)
        ((dx semanticEquals da) && (dy semanticEquals db)) ||
          ((dx semanticEquals db) && (dy semanticEquals da))
      case _ => false
    }
  }

  /** Find a cosine-threshold conjunct with vector/norm sided left/right
    * and norms provably `sqrt(vec_dot(x,x))` of that side's vector.
    */
  private def findCosine(cond: Expression, left: LogicalPlan,
                         right: LogicalPlan): Option[CosMatch] = {
    val m = aliasMap(left) ++ aliasMap(right)
    def sided(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)
    def isNormOf(n: Expression, v: Expression): Boolean =
      dealias(n, m) match {
        case Sqrt(VecDot(x, y)) =>
          val dv = dealias(v, m)
          (x semanticEquals y) && (x semanticEquals dv)
        case _ => false
      }
    val conjuncts = splitConjunctivePredicates(cond)
    conjuncts.iterator.flatMap {
      case cmp @ (_: GreaterThan | _: GreaterThanOrEqual) =>
        val (lhs, rhs) = (cmp.children(0), cmp.children(1))
        (lhs, rhs) match {
          case (Divide(VecDot(a, b), Multiply(x, y, _), _), Literal(t: Double, DoubleType))
              if t > 0.0 && t < 1.0 =>
            // norms may appear in either order in the product
            val cands = Seq((x, y), (y, x))
            cands.collectFirst {
              case (na, nb)
                  if sided(a, left) && sided(b, right) &&
                     sided(na, left) && sided(nb, right) &&
                     isNormOf(na, a) && isNormOf(nb, b) &&
                     hasSizeGuard(conjuncts, a, b, m) =>
                CosMatch(a, na, b, nb, t)
            }
          case _ => None
        }
      case _ => None
    }.nextOption()
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  /** floor(p(x)/w) with p(x) = Σxᵢ / (norm · √d). */
  private def bucketExpr(v: Expression, norm: Expression, w: Double): Expression =
    Floor(Divide(
      Divide(VecSum(v), Multiply(norm, Sqrt(Cast(Size(v), DoubleType)))),
      Literal(w, DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith(BucketPrefix)) =>
      findCosine(cond, left, right) match {
        case Some(CosMatch(a, na, b, nb, t)) =>
          // the Cauchy–Schwarz bound holds in exact arithmetic; the
          // projections carry ~d·ulp FP error, so the band is inflated
          // by a relative epsilon to keep the necessary condition
          // necessary for COMPUTED values too
          val w = math.sqrt(2.0 - 2.0 * t) * (1.0 + 1e-9)
          val bl = Alias(bucketExpr(a, na, w), s"${BucketPrefix}_l")()
          val newLeft = Project(left.output :+ bl, left)
          val br = Alias(bucketExpr(b, nb, w), s"${BucketPrefix}_r")()
          val projR = Project(right.output :+ br, right)
          val probeAttr =
            AttributeReference(s"${BucketPrefix}_probe", LongType, nullable = true)()
          val probes = Generate(
            Explode(CreateArray(Seq(
              Subtract(br.toAttribute, Literal(1L)),
              br.toAttribute,
              Add(br.toAttribute, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(probeAttr), child = projR)
          val newCond = And(EqualTo(bl.toAttribute, probeAttr), cond)
          // restore the original output (drop the helper columns)
          Project(j.output, Join(newLeft, probes, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
