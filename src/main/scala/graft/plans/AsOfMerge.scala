package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** The whole-operator Catalyst tier (SURVEY §4.3 preference (c)): a
  * custom logical node + planner strategy + physical operator for the
  * LAST-PRIOR AS-OF JOIN — for each left row, the right row of the
  * same key with the greatest `ts <= left.ts` (ties by greatest id).
  *
  * Why a physical operator when the library already has two as-of
  * forms: the composed band join ([[graft.ops.Relational]])
  * materializes every (left, earlier-right) candidate pair before the
  * struct-max — quadratic per key; the cogroup form
  * ([[graft.ops.AsOf.asofLastPrior]]) is linear but buffers BOTH legs
  * of a key as arrays (hot-key memory) and pays Dataset
  * encode/decode. This exec is the textbook merge: both children
  * hash-clustered on key (`requiredChildDistribution` — the SAME
  * co-partitioning contract SortMergeJoin declares, so
  * EnsureRequirements/AQE plan it identically), sorted
  * `(key, ts[, id])` (`requiredChildOrdering` — Spark inserts
  * spill-safe external sorts), then ONE forward sweep per partition
  * holding exactly one buffered row: O(1) state, no per-key arrays,
  * no candidate blowup, any key skew bounded by the sort. That is the
  * 100 TB-safe shape.
  *
  * The logical node carries column NAMES, not Attribute refs: both
  * children usually derive from the same base relation (self-join
  * shape), and analyzer's DeduplicateRelations regenerates the right
  * child's exprIds — an expression-free node can never hold a stale
  * reference through that rewrite. Ordinals are re-resolved by name
  * against `child.output` at execution.
  *
  * Keys/timestamps/ids are BIGINT by contract (surrogate ids and
  * epoch-micros — the canonical as-of triple across the repo).
  *
  * `forward = true` (round 10) flips the operator to FIRST-AFTER: for
  * each left row, the right row of the same key with the SMALLEST
  * `ts > left.ts` (ties by smallest residuals) — the
  * `min(struct(ts, …))` / strict-`>` mirror of last-prior, i.e. the
  * "first purchase within the window after signup" hop of chained
  * reconciliation. Implementation is the SAME sweep with both sides'
  * ts (and right residuals) sorted DESCENDING: admissible candidates
  * (`rTs > lTs`) grow as the sweep walks left rows in decreasing ts,
  * and the last admitted row is the lexicographic (ts, residuals)
  * minimum — exactly the struct-min winner.
  */
case class AsOfMergeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeyCol: String,
    leftTsCol: String,
    rightKeyCol: String,
    rightTsCol: String,
    leftOuter: Boolean,
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] = {
    // the join key is emitted once, from the left side
    val r = right.output.filter(_.name != rightKeyCol)
    left.output ++ (if (leftOuter) r.map(_.withNullability(true)) else r)
  }

  // The node stores column NAMES (see class doc), so `expressions` is
  // empty — but ColumnPruning consults `references` to decide what the
  // children must keep. Declare the key/ts columns referenced,
  // resolved dynamically against the CURRENT children (immune to
  // DeduplicateRelations exprId regeneration).
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => a.name == leftKeyCol || a.name == leftTsCol) ++
      right.output.filter(a => a.name == rightKeyCol || a.name == rightTsCol))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfMergeJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfMergeJoin]] to [[AsOfMergeExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`.
  */
object AsOfMergeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfMergeJoin =>
      AsOfMergeExec(planLater(j.left), planLater(j.right),
        j.leftKeyCol, j.leftTsCol, j.rightKeyCol, j.rightTsCol,
        j.leftOuter, j.forward) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeyCol: String,
    leftTsCol: String,
    rightKeyCol: String,
    rightTsCol: String,
    leftOuter: Boolean,
    forward: Boolean = false) extends BinaryExecNode {

  private val lKey = () => left.output.find(_.name == leftKeyCol).get
  private val lTs = () => left.output.find(_.name == leftTsCol).get
  private val rKey = () => right.output.find(_.name == rightKeyCol).get
  private val rTs = () => right.output.find(_.name == rightTsCol).get

  override def output: Seq[Attribute] = {
    val r = right.output.filter(_.name != rightKeyCol)
    left.output ++ (if (leftOuter) r.map(_.withNullability(true)) else r)
  }

  // The SortMergeJoin contract: both children clustered on the key —
  // EnsureRequirements co-partitions them (and AQE coalesces the two
  // shuffles consistently, exactly as it must for SMJ).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(lKey())) ::
    ClusteredDistribution(Seq(rKey())) :: Nil

  // Right side additionally residual-ordered so the LAST admitted
  // candidate is the (ts, residuals…) extremum — the struct-max
  // (backward) or struct-min (forward) tiebreak — with no comparison
  // in the sweep. Forward mode flips ts and residuals to DESCENDING
  // (keys stay ascending): the sweep structure is identical, only the
  // direction candidates accumulate in changes.
  private def tsDir = if (forward) Descending else Ascending
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(lKey(), Ascending), SortOrder(lTs(), tsDir)),
    Seq(SortOrder(rKey(), Ascending), SortOrder(rTs(), tsDir)) ++
      right.output.filter(a => a.name != rightKeyCol && a.name != rightTsCol)
        .map(SortOrder(_, tsDir)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lKeyIdx = left.output.indexWhere(_.name == leftKeyCol)
    val lTsIdx = left.output.indexWhere(_.name == leftTsCol)
    val rKeyIdx = right.output.indexWhere(_.name == rightKeyCol)
    val rTsIdx = right.output.indexWhere(_.name == rightTsCol)
    val lOut = left.output
    val rOut = right.output
    val rWidth = rOut.length
    val leftIsOuter = leftOuter
    val fwd = forward
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      // One projection from the joined (left ++ right) row to the
      // declared output order (key once, left-rest, right-rest).
      // Under left-outer the right side MUST bind nullable: a
      // non-nullable input attribute (e.g. from spark.range) would
      // make the BoundReference skip the null check and read the
      // all-null padding row as garbage zeros (caught by the
      // PropertySpec generated-legs test — parquet-sourced columns
      // are nullable, which masked it in the oracled queries).
      val rBind = if (leftIsOuter) rOut.map(_.withNullability(true)) else rOut
      val joiner = UnsafeProjection.create(
        lOut ++ rBind.filter(_.name != rightKeyCol),
        lOut ++ rBind)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rWidth)
      var pending: InternalRow = if (ri.hasNext) ri.next() else null
      var best: InternalRow = null
      var bestKey = 0L
      li.flatMap { l =>
        // SQL join-null semantics: a null key or ts can never satisfy
        // the equality/range predicates, so a null-field left row is
        // unmatched (padded under outer, dropped under inner) and a
        // null-field right row is never a candidate. The inner-join
        // rewrite path never sees nulls (the optimizer pushes
        // isnotnull), but LeftOuter keeps null left rows — and with
        // NULLS FIRST sort order they arrive at the head, before any
        // comparable data.
        val lNull = l.isNullAt(lKeyIdx) || l.isNullAt(lTsIdx)
        var hit = false
        if (!lNull) {
          val lk = l.getLong(lKeyIdx)
          val lts = l.getLong(lTsIdx)
          var continue = true
          while (pending != null && continue) {
            if (pending.isNullAt(rKeyIdx) || pending.isNullAt(rTsIdx)) {
              pending = if (ri.hasNext) ri.next() else null
            } else {
              val rk = pending.getLong(rKeyIdx)
              // admission: same-key rows satisfying the range predicate
              // (backward: rTs <= lTs under ascending ts; forward:
              // rTs > lTs under descending ts — both are "the candidate
              // set grows as the sweep advances")
              val inRange =
                if (fwd) pending.getLong(rTsIdx) > lts
                else pending.getLong(rTsIdx) <= lts
              if (rk < lk || (rk == lk && inRange)) {
                if (rk == lk) { best = pending.copy(); bestKey = rk }
                pending = if (ri.hasNext) ri.next() else null
              } else continue = false
            }
          }
          hit = best != null && bestKey == lk
        }
        if (hit || leftIsOuter) {
          numOutputRows += 1
          Iterator.single(joiner(joined(l, if (hit) best else nullRight)))
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeExec =
    copy(left = newLeft, right = newRight)
}
