package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max, Min}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: the declared as-of shape — an equi+range join
  * followed by a per-left-row `max(struct(r_ts, r_id))` argmax
  * aggregation — is rewritten onto the custom [[AsOfMergeJoin]]
  * operator (planned to AsOfMergeExec by the injected strategy).
  *
  * The natural 2-step formulation materializes every
  * (left, earlier-right) candidate pair before the struct-max —
  * quadratic per key, and the OOM shape at 100 TB when keys live for
  * years. The merge exec is the O(1)-state linear sweep (one shuffle +
  * sort per side, the SortMergeJoin contract). This rule routes users
  * who write the natural shape onto it automatically.
  *
  * CONFIG-GATED, default OFF (`spark.graft.asofRewrite=true` enables),
  * per the measured cost honesty of [[TopKRewriteRule]]: at bench
  * scale the hash-agg band join and the double-sort merge are both
  * scheduling-floor-bound (0.13 s vs 0.15 s at sf0.1) — the merge's
  * win is the avoided candidate blowup, a property of per-key history
  * length the local optimizer cannot observe. The user opts in.
  * MEASURED win condition (`ScaleBench rule`, PLANS.md round 9): with
  * 20% of a 200k/100k corpus on one hot key, the natural shape runs
  * 30.6 s (~4·10⁸ candidate pairs concentrated on ONE task) vs 1.63 s
  * rewritten — 18.8×, checksum-identical rows.
  *
  * Fires only on the exact shape whose semantics the exec reproduces:
  *
  *  - `Aggregate(G, A, [Project_attrs-only] Join(Inner|LeftOuter,
  *    lKey = rKey AND rTs <= lTs [AND rTs >/(>=) f(left) ...]))`;
  *  - every grouping expression a LEFT-side attribute; every
  *    aggregate output either a grouping attribute or
  *    `max(struct(rTs, p₁, …, pₖ)).field` (plain max — no
  *    DISTINCT/FILTER), where rTs is THE range-predicate timestamp
  *    and (p₁, …, pₖ) are ALL the right side's non-key non-ts columns
  *    IN right-output order (k ≥ 1 — the multi-column enrichment
  *    payload, round 10; previously k was pinned to 1);
  *  - why that exact field sequence: the exec keeps, per left row,
  *    the LAST candidate under its (key, ts, residuals-in-output-
  *    order)-ascending right sort — i.e. the lexicographic
  *    (ts, p₁, …, pₖ)-max of the candidate prefix. A struct whose
  *    comparison order equals that sort order makes the kept row THE
  *    struct-max row, timestamp ties included. A struct over a
  *    SUBSET or permutation of the payload columns would diverge on
  *    ties (the exec's winner need not maximize the user's struct),
  *    so those shapes are deliberately not matched;
  *  - key/ts types physically long (BIGINT / timestamp);
  *  - extra conjuncts only as LOWER bounds on rTs from left-side
  *    expressions (the tolerance band). Sound because they select a
  *    SUFFIX of each left row's candidate prefix: if the last-prior
  *    row fails the bound, every earlier candidate fails it too — so
  *    a post-join Filter on the exec's single winner is equivalent.
  *    Inner only: under LeftOuter a post-filter would drop the
  *    padded rows the outer contract keeps.
  *
  * Equivalence of keeping the Aggregate on top (rather than assuming
  * the grouping key unique per left row): for a group of left rows,
  * max over the UNION of their candidate prefixes equals max of the
  * per-row prefix-maxes the exec emits — so the rewrite is exact even
  * with duplicate grouping keys, and the surviving Aggregate costs one
  * row per left row.
  */
object AsOfRewriteRule extends Rule[LogicalPlan] {

  private def longPhysical(dt: DataType): Boolean = dt match {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** The (lKey, rKey, lTs, rTs, bounds, forward) decomposition of a
    * join condition, if it has exactly an as-of shape.
    *
    * BACKWARD (last-prior): range `rTs <= lTs`, leftover conjuncts
    * must be LOWER bounds on rTs from left-only expressions (the
    * tolerance band). FORWARD (first-after, round 10): range
    * `rTs > lTs` (strict — the declared next-event semantics),
    * leftover conjuncts must be UPPER bounds on rTs (the lookahead
    * window). Backward is tried first, so a condition carrying BOTH a
    * `<=` range and `>` conjuncts keeps its round-9 reading (band
    * last-prior) — the forward reading only applies when no `<=`
    * range exists.
    */
  private def decompose(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Attribute, Attribute, Attribute, Attribute, Seq[Expression], Boolean)] = {
    val conjuncts = {
      def split(e: Expression): Seq[Expression] = e match {
        case And(a, b) => split(a) ++ split(b)
        case x         => Seq(x)
      }
      split(cond)
    }
    def side(a: Attribute): Int =
      if (left.outputSet.contains(a)) 0 else if (right.outputSet.contains(a)) 1 else -1

    // a bound on rTs whose other side is computed from left columns
    // only; `upper = false` accepts rTs > / >= f(left) (backward
    // tolerance), `upper = true` accepts rTs < / <= f(left) (forward
    // window). GUARDS, not boolean bodies: an attribute-vs-attribute
    // comparison matches two of these patterns, and a failed guard
    // must fall through to the other orientation rather than return
    // false from whichever pattern listed first.
    def isBound(e: Expression, rTs: Attribute, upper: Boolean): Boolean = {
      def bnd(a: Attribute, b: Expression): Boolean =
        a.exprId == rTs.exprId && b.references.subsetOf(left.outputSet)
      e match {
        case GreaterThan(a: Attribute, b) if bnd(a, b)        => !upper
        case GreaterThan(b, a: Attribute) if bnd(a, b)        => upper
        case GreaterThanOrEqual(a: Attribute, b) if bnd(a, b) => !upper
        case GreaterThanOrEqual(b, a: Attribute) if bnd(a, b) => upper
        case LessThan(b, a: Attribute) if bnd(a, b)           => !upper
        case LessThan(a: Attribute, b) if bnd(a, b)           => upper
        case LessThanOrEqual(b, a: Attribute) if bnd(a, b)    => !upper
        case LessThanOrEqual(a: Attribute, b) if bnd(a, b)    => upper
        case _                                                => false
      }
    }

    def attempt(forward: Boolean)
        : Option[(Attribute, Attribute, Attribute, Attribute, Seq[Expression], Boolean)] = {
      var eq: Option[(Attribute, Attribute)] = None      // (lKey, rKey)
      var range: Option[(Attribute, Attribute)] = None   // (lTs, rTs)
      val rest = Seq.newBuilder[Expression]
      conjuncts.foreach {
        case EqualTo(a: Attribute, b: Attribute) if eq.isEmpty &&
            ((side(a), side(b)) == (0, 1) || (side(a), side(b)) == (1, 0)) =>
          eq = Some(if (side(a) == 0) (a, b) else (b, a))
        case LessThanOrEqual(r: Attribute, l: Attribute)
            if !forward && range.isEmpty && side(r) == 1 && side(l) == 0 =>
          range = Some((l, r))
        case GreaterThanOrEqual(l: Attribute, r: Attribute)
            if !forward && range.isEmpty && side(l) == 0 && side(r) == 1 =>
          range = Some((l, r))
        case GreaterThan(r: Attribute, l: Attribute)
            if forward && range.isEmpty && side(r) == 1 && side(l) == 0 =>
          range = Some((l, r))
        case LessThan(l: Attribute, r: Attribute)
            if forward && range.isEmpty && side(l) == 0 && side(r) == 1 =>
          range = Some((l, r))
        case other => rest += other
      }
      val bounds = rest.result()
      val ok = eq.isDefined && range.isDefined &&
        bounds.forall(e => isBound(e, range.get._2, upper = forward))
      if (!ok) None
      else {
        val (lKey, rKey) = eq.get
        val (lTs, rTs) = range.get
        if (longPhysical(lKey.dataType) && lKey.dataType == rKey.dataType &&
            longPhysical(lTs.dataType) && longPhysical(rTs.dataType) &&
            rTs.exprId != rKey.exprId)
          Some((lKey, rKey, lTs, rTs, bounds, forward))
        else None
      }
    }
    attempt(forward = false).orElse(attempt(forward = true))
  }

  /** True iff `e` is `max(struct(rTs, res₁, …, resₖ)).field` (backward)
    * or `min(struct(rTs, res₁, …, resₖ)).field` (forward), possibly
    * aliased, with plain aggregate semantics, the struct fields being
    * exactly the range timestamp followed by EVERY residual right
    * column in right-output order (see class doc for why the full
    * ordered sequence is the soundness condition; the forward exec's
    * descending sweep order makes its kept row the struct-MIN the same
    * way the backward ascending order yields the struct-max).
    */
  private def isArgmaxOf(e: Expression, rTs: Attribute,
                         residual: Seq[Attribute], forward: Boolean): Boolean = e match {
    case Alias(child, _) => isArgmaxOf(child, rTs, residual, forward)
    case GetStructField(ae: AggregateExpression, ord, _)
        if !ae.isDistinct && ae.filter.isEmpty &&
          ord >= 0 && ord <= residual.size =>
      val structArg = ae.aggregateFunction match {
        case Max(cns: CreateNamedStruct) if !forward => Some(cns)
        case Min(cns: CreateNamedStruct) if forward  => Some(cns)
        case _                                       => None
      }
      structArg.exists { cns =>
        val vals = cns.valExprs
        vals.sizeIs == residual.size + 1 && vals.forall(_.isInstanceOf[Attribute]) &&
        vals.head.asInstanceOf[Attribute].exprId == rTs.exprId &&
        vals.tail.asInstanceOf[Seq[Attribute]].map(_.exprId) == residual.map(_.exprId)
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.asofRewrite", "false").toBoolean) return plan
    plan.transformUp {
      case agg @ Aggregate(grouping, aggExprs, child, _) =>
        val joinOpt = child match {
          case j: Join => Some(j)
          case Project(pl, j: Join) if pl.forall(_.isInstanceOf[AttributeReference]) =>
            Some(j)
          case _ => None
        }
        val rewritten = joinOpt
          .filter(j => (j.joinType == Inner || j.joinType == LeftOuter) && j.condition.isDefined)
          .flatMap { j =>
            decompose(j.condition.get, j.left, j.right).flatMap {
              case (lKey, rKey, lTs, rTs, bounds, forward) =>
                val residual = j.right.output
                  .filterNot(a => a.exprId == rKey.exprId || a.exprId == rTs.exprId)
                val groupingOk = grouping.forall {
                  case a: Attribute => j.left.outputSet.contains(a)
                  case _            => false
                }
                val namesOk =
                  j.left.output.map(_.name).distinct.size == j.left.output.size &&
                  j.right.output.map(_.name).distinct.size == j.right.output.size
                val shapeOk = groupingOk && namesOk &&
                  residual.nonEmpty &&
                  (j.joinType == Inner || bounds.isEmpty) &&
                  aggExprs.forall {
                    case a: Attribute => grouping.exists {
                      case g: Attribute => g.exprId == a.exprId
                      case _            => false
                    }
                    case e => isArgmaxOf(e, rTs, residual, forward)
                  }
                if (!shapeOk) None
                else {
                  val asof = AsOfMergeJoin(j.left, j.right,
                    lKey.name, lTs.name, rKey.name, rTs.name,
                    leftOuter = j.joinType == LeftOuter, forward = forward)
                  val input: LogicalPlan =
                    if (bounds.isEmpty) asof else Filter(bounds.reduce(And), asof)
                  Some(Aggregate(grouping, aggExprs, input))
                }
            }
          }
        rewritten.getOrElse(agg)
    }
  }
}
