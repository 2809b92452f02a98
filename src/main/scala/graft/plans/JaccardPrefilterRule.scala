package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.SortedJaccard

/** Optimizer rule: size-ratio prefilter for Jaccard-threshold joins —
  * the first of the SURVEY §4.3 similarity-join pruning rules.
  *
  * `J(A,B) = |A∩B| / |A∪B| ≥ t` implies `min(|A|,|B|) / max(|A|,|B|)
  * ≥ t` (since `|A∩B| ≤ min` and `|A∪B| ≥ max`). That necessary
  * condition costs two integer reads per pair, while the Jaccard
  * itself is an O(|A|+|B|) merge — so this rule prepends
  * `size(a) ≥ t·size(b) AND size(b) ≥ t·size(a)` to every
  * `sorted_jaccard(a,b) ≥ t` conjunct. Conjuncts short-circuit
  * left-to-right in codegen, so mismatched-size pairs never run the
  * merge. At 100 TB this is the verify-phase analogue of prefix
  * filtering: it prunes candidate pairs inside LSH buckets too.
  *
  * Semantics-preserving by construction (a necessary condition is
  * conjoined, never substituted). Idempotence across the optimizer's
  * fixed-point iterations: a Filter that already contains a `Size`
  * comparison is left untouched.
  */
object JaccardPrefilterRule extends Rule[LogicalPlan] {

  private def hasSizeGuard(cond: Expression): Boolean =
    cond.exists { case _: Size => true; case _ => false }

  /** Conjoin the size-ratio necessary condition in front of every
    * `sorted_jaccard(a, b) >= t` comparison; None if nothing matched.
    */
  private def addGuards(cond: Expression): Option[Expression] = {
    val rewritten = cond.transformUp {
      case ge @ GreaterThanOrEqual(SortedJaccard(a, b), t @ Literal(thr: Double, DoubleType))
          if thr > 0.0 && thr <= 1.0 =>
        val sa = Cast(Size(a), DoubleType)
        val sb = Cast(Size(b), DoubleType)
        And(And(GreaterThanOrEqual(sa, Multiply(t, sb)),
                GreaterThanOrEqual(sb, Multiply(t, sa))),
            ge)
    }
    if (rewritten fastEquals cond) None else Some(rewritten)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // The threshold predicate can sit in a Filter or — after
    // PushPredicateThroughJoin — in a Join condition; guard both.
    case f @ Filter(cond, child) if !hasSizeGuard(cond) =>
      addGuards(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) if !hasSizeGuard(cond) =>
      addGuards(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
