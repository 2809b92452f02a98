package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: length-gap prefilter for edit-distance-threshold
  * predicates — the third SURVEY §4.3 similarity-join pruning rule
  * (after the Jaccard size-ratio and cosine band rules).
  *
  * `levenshtein(a, b) ≤ k` implies `| |a| − |b| | ≤ k`: every edit
  * changes the length by at most one, so the distance is bounded below
  * by the length gap. The necessary condition costs two length reads
  * per pair, while the distance itself is O(|a|·|b|) (O(k·min) in the
  * thresholded form) — so this rule conjoins
  * `abs(length(a) − length(b)) ≤ k` in front of
  *
  *  - `levenshtein(a, b) <= k` / `< k` (plain form), and
  *  - `levenshtein(a, b, k) >= 0` (thresholded form — Spark returns −1
  *    past the bound, so `≥ 0` means "within k"),
  *
  * letting codegen's left-to-right conjunct short-circuit skip the
  * distance entirely for length-mismatched pairs. At 100 TB this is
  * the same candidate-pruning family as prefix filtering: it applies
  * inside LSH/blocking buckets too.
  *
  * Semantics-preserving by construction (a necessary condition is
  * conjoined, never substituted). Idempotent across the optimizer's
  * fixed-point iterations: conditions already carrying a `Length`
  * comparison (including ones this rule produced) are left untouched.
  */
object LevenshteinPrefilterRule extends Rule[LogicalPlan] {

  private def hasLenGuard(cond: Expression): Boolean =
    cond.exists { case _: Length => true; case _ => false }

  private def gapGuard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  private def addGuards(cond: Expression): Option[Expression] = {
    val rewritten = cond.transformUp {
      case le @ LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_: Int, IntegerType)) =>
        And(gapGuard(a, b, k), le)
      case lt @ LessThan(Levenshtein(a, b, None), k @ Literal(_: Int, IntegerType)) =>
        And(gapGuard(a, b, k), lt)
      case ge @ GreaterThanOrEqual(Levenshtein(a, b, Some(k @ Literal(_: Int, IntegerType))),
                                   Literal(0, IntegerType)) =>
        And(gapGuard(a, b, k), ge)
    }
    if (rewritten fastEquals cond) None else Some(rewritten)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if !hasLenGuard(cond) =>
      addGuards(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) if !hasLenGuard(cond) =>
      addGuards(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
