package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftshim.ColumnShim

import graft.sinks.{CowSqlTable, CowTable}

/** `UPDATE cow.ns.t SET c = expr, ... [WHERE pred]` → [[CowTable.update]]
  * (rewrite only the files containing matches; every other file carries
  * over by reference). Completes the catalog DML face next to INSERT /
  * INSERT OVERWRITE / DELETE FROM / MERGE INTO.
  *
  * Same resolution-rule + planner-strategy seam as [[CowMergeIntoRule]]
  * (the (c) tier of SURVEY §4.3): the rule swaps the analyzed
  * [[UpdateTable]] for [[CowUpdateCommand]] before Spark's row-level
  * rewrite machinery would reject the table (CowSqlTable does not
  * implement SupportsRowLevelOperations), and [[CowMergeStrategy]]
  * plans the side-effecting exec.
  *
  * Expression transport: the analyzed SET values / WHERE condition are
  * resolved against the DSv2 relation's attribute ids, which the
  * rewrite-time scan does not share — so the rule re-anchors each
  * expression BY NAME (`AttributeReference` → `UnresolvedAttribute`)
  * and carries it as an opaque [[Column]]; `CowTable.update` resolves
  * it against the rewrite scan. Exact — no SQL re-rendering round-trip.
  * Out-of-grammar shapes fail in ANALYSIS naming the limit: nested-
  * field assignment targets, subqueries in SET/WHERE, nondeterministic
  * expressions (a per-file rewrite would re-draw them per row placement).
  */
object CowUpdateRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case u: UpdateTable if u.table.resolved &&
        u.assignments.forall(_.resolved) && u.condition.forall(_.resolved) &&
        cowTarget(u.table).isDefined =>
      val path = cowTarget(u.table).get
      val sets = u.assignments.map {
        case Assignment(k: AttributeReference, v) =>
          checkSupported(v, s"SET ${k.name}")
          (k.name, ColumnShim.column(unresolve(v)))
        case Assignment(other, _) =>
          throw new UnsupportedOperationException(
            "UPDATE a CowTable supports top-level column assignment " +
              s"targets only, got SET $other (nested fields: rewrite the " +
              "whole struct column)")
      }
      val cond = u.condition.map { c =>
        checkSupported(c, "WHERE")
        ColumnShim.column(unresolve(c))
      }.getOrElse(lit(true))
      CowUpdateCommand(path, sets, cond)
  }

  private def cowTarget(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => cowTarget(child)
    case r: DataSourceV2Relation => r.table match {
      case t: CowSqlTable => Some(t.path)
      case _              => None
    }
    case _ => None
  }

  /** Re-anchor a resolved expression by NAME so it can resolve against
    * the rewrite-time scan (different attribute ids, same columns).
    * `With` common-subexpression nodes (the analyzer's BETWEEN/like
    * dedup form) are inlined first: their `CommonExpressionDef`s call
    * `dataType` while rebuilding, which an unresolved-by-name child
    * cannot answer — and the rewrite scan re-analyzes from scratch
    * anyway, re-deduplicating on its own.
    */
  private def unresolve(e: Expression): Expression = {
    val inlined = e.transformUp {
      case w: org.apache.spark.sql.catalyst.expressions.With =>
        val byId = w.defs.map(d => d.id -> d.child).toMap
        // a ref may point at an OUTER With's def (nested BETWEEN/like
        // shapes) — leave it in place; the enclosing With is visited
        // later by this same bottom-up pass and inlines it then
        // (ADVICE r15: Map.apply threw instead of the grammar error)
        w.child.transformUp {
          case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
            byId.getOrElse(r.id, r)
        }
    }
    inlined.foreach {
      case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
        throw new UnsupportedOperationException(
          s"UPDATE a CowTable: common-subexpression reference $r survived " +
            "inlining (no enclosing With carries its definition) — " +
            "rewrite the SET/WHERE expression without the shared shape")
      case _ =>
    }
    inlined.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }
  }

  private def checkSupported(e: Expression, where: String): Unit = {
    if (SubqueryExpression.hasSubquery(e))
      throw new UnsupportedOperationException(
        s"UPDATE a CowTable: subqueries are not supported in $where " +
          "(stage the source frame and MERGE INTO instead)")
    if (!e.deterministic)
      throw new UnsupportedOperationException(
        s"UPDATE a CowTable: nondeterministic expression in $where — the " +
          "per-file rewrite would re-draw values per row placement")
  }
}

/** The analyzed UPDATE, ready to run. `sets`/`cond` are name-anchored
  * [[Column]]s (opaque to catalyst traversal — the command is fully
  * resolved by construction).
  */
case class CowUpdateCommand(path: String, sets: Seq[(String, Column)],
                            cond: Column) extends LeafCommand {
  override def output: Seq[Attribute] = Nil
}

case class CowUpdateExec(cmd: CowUpdateCommand) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  private lazy val done: Unit = {
    CowTable.update(SparkSession.active, cmd.path, cmd.cond, cmd.sets)
    ()
  }

  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.emptyRDD[InternalRow]
  }
}
