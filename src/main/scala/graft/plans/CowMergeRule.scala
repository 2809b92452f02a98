package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.StreamShim

import graft.sinks.{CowSqlTable, CowTable}

/** `MERGE INTO cow.ns.t` → the CowTable transactional write API. The
  * SQL face accepts the canonical row-level forms and lowers each onto
  * the format's native primitive — the same lowering Delta performs
  * with its own command nodes:
  *
  *   - `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *     → [[CowTable.merge]] (the upsert: touched files rewritten once,
  *     untouched files carried);
  *   - `WHEN MATCHED THEN UPDATE SET *` (no insert) → merge of the
  *     source rows whose keys exist (semi-join first — merge would
  *     otherwise insert the misses);
  *   - `WHEN NOT MATCHED THEN INSERT *` (no update) →
  *     [[CowTable.append]] of the anti-joined source;
  *   - `WHEN MATCHED THEN DELETE` → [[CowTable.deleteMorKeys]]
  *     (rewrite-free MoR sidecar).
  *
  * The ON condition must be a single-column key equality (the format's
  * merge key contract). Anything outside these forms — conditional
  * actions, partial SET lists, NOT MATCHED BY SOURCE — fails in
  * ANALYSIS with a message naming the supported shapes, never a silent
  * approximation. Resolution-rule + planner-strategy seam (the (c)
  * tier of SURVEY §4.3): the rule swaps the analyzed [[MergeIntoTable]]
  * for [[CowMergeCommand]] before Spark's row-level rewrite would
  * reject the table, and the strategy plans the side-effecting exec.
  */
object CowMergeIntoRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case m: MergeIntoTable if m.targetTable.resolved && m.sourceTable.resolved &&
        cowTarget(m.targetTable).isDefined =>
      val (path, targetCols) = cowTarget(m.targetTable).get
      require(m.notMatchedBySourceActions.isEmpty,
        "MERGE INTO a CowTable: WHEN NOT MATCHED BY SOURCE is not supported")
      val key = keyOf(m.mergeCondition, m.targetTable, m.sourceTable)
      val mode = (m.matchedActions, m.notMatchedActions) match {
        case (Seq(u), Seq(i)) if isUpdateStar(u, targetCols) &&
            isInsertStar(i, targetCols) => "upsert"
        case (Seq(u), Seq()) if isUpdateStar(u, targetCols) => "update"
        case (Seq(DeleteAction(None)), Seq())               => "delete"
        case (Seq(), Seq(i)) if isInsertStar(i, targetCols) => "insert"
        case other =>
          throw new UnsupportedOperationException(
            "MERGE INTO a CowTable supports exactly: unconditional " +
              "UPDATE SET * / INSERT * / DELETE combinations, got " + other)
      }
      CowMergeCommand(path, key, mode, targetCols.map(_.name),
        m.sourceTable)
  }

  private def cowTarget(plan: LogicalPlan): Option[(String, Seq[Attribute])] =
    plan match {
      case SubqueryAlias(_, child) => cowTarget(child)
      case r: DataSourceV2Relation => r.table match {
        case t: CowSqlTable => Some((t.path, r.output))
        case _              => None
      }
      case _ => None
    }

  /** The single-column equality key the ON clause must carry. */
  private def keyOf(cond: Expression, target: LogicalPlan,
                    source: LogicalPlan): String = cond match {
    case EqualTo(a: AttributeReference, b: AttributeReference) =>
      val (t, s) =
        if (target.outputSet.contains(a)) (a, b)
        else (b, a)
      require(target.outputSet.contains(t) && source.outputSet.contains(s),
        s"MERGE ON must equate a target column with a source column, got $cond")
      require(t.name == s.name,
        s"MERGE ON columns must share a name (the format's merge key), " +
          s"got ${t.name} = ${s.name}")
      t.name
    case other => throw new UnsupportedOperationException(
      "MERGE INTO a CowTable requires ON target.k = source.k " +
        s"(single-column key equality), got $other")
  }

  /** UPDATE SET * — either still a star action or already expanded by
    * the analyzer into one column-identical assignment per target
    * column.
    */
  private def isUpdateStar(a: MergeAction, targetCols: Seq[Attribute]): Boolean =
    a match {
      case UpdateStarAction(None) => true
      case UpdateAction(None, assigns, _) => fullColumnAssignment(assigns, targetCols)
      case _ => false
    }
  private def isInsertStar(a: MergeAction, targetCols: Seq[Attribute]): Boolean =
    a match {
      case InsertStarAction(None) => true
      case InsertAction(None, assigns) => fullColumnAssignment(assigns, targetCols)
      case _ => false
    }

  /** Every target column assigned from the IDENTICALLY-NAMED source
    * attribute (possibly under a cast the analyzer inserted).
    */
  private def fullColumnAssignment(assigns: Seq[Assignment],
                                   targetCols: Seq[Attribute]): Boolean = {
    def srcName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case c: org.apache.spark.sql.catalyst.expressions.Cast => srcName(c.child)
      case _ => None
    }
    assigns.lengthCompare(targetCols.length) == 0 && assigns.forall {
      case Assignment(t: AttributeReference, v) => srcName(v).contains(t.name)
      case _                                    => false
    }
  }
}

/** The analyzed MERGE, ready to run: `source` is the resolved source
  * plan; execution wraps it back into a DataFrame and calls the
  * format's transactional API on the driver (one commit; the merge /
  * sidecar machinery distributes the data work).
  */
case class CowMergeCommand(path: String, key: String, mode: String,
                           targetCols: Seq[String],
                           source: LogicalPlan) extends UnaryCommand {
  override def child: LogicalPlan = source
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(source = newChild)
}

object CowMergeStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case c: CowMergeCommand  => CowMergeExec(c) :: Nil
    case c: CowUpdateCommand => CowUpdateExec(c) :: Nil
    case _                   => Nil
  }
}

case class CowMergeExec(cmd: CowMergeCommand) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  private lazy val done: Unit = {
    val spark = SparkSession.active
    val src0 = StreamShim.ofRows(spark, cmd.source)
    // project to the target column set in target order (the source may
    // carry extra columns; MERGE semantics only move the shared shape).
    // Deferred: the delete form's source legitimately carries only the
    // key column.
    def src = src0.select(cmd.targetCols.map(col): _*)
    cmd.mode match {
      case "upsert" => CowTable.merge(spark, cmd.path, src, cmd.key)
      case "update" =>
        val existing = CowTable.read(spark, cmd.path).select(cmd.key)
        CowTable.merge(spark, cmd.path,
          src.join(existing, Seq(cmd.key), "left_semi"), cmd.key)
      case "insert" =>
        val existing = CowTable.read(spark, cmd.path).select(cmd.key)
        CowTable.append(spark, cmd.path,
          src.join(existing, Seq(cmd.key), "left_anti"))
      case "delete" =>
        CowTable.deleteMorKeys(spark, cmd.path,
          StreamShim.ofRows(spark, cmd.source).select(cmd.key), cmd.key)
    }
    ()
  }

  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.emptyRDD[InternalRow]
  }
}
