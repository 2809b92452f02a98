package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.{CowSqlTable, CowTable}

/** Optimizer rule: DISTRIBUTED merge-on-read key deletes on the SQL
  * catalog face (round 17, VERDICT r16 task 4).
  *
  * The catalog scan's in-reader key-delete filter collects the
  * sidecar's distinct keys on the DRIVER and ships the set to every
  * task — bounded (loudly) at 100k keys because both the driver
  * memory and the per-task closure grow with the backlog. A
  * GDPR-scale delete batch (millions of keys) needs the relational
  * formulation instead: this rule rewrites
  *
  * {{{ scan(cow table with key-delete sidecars) }}}
  * into
  * {{{ scan(same table, sidecar filter OFF) LEFT ANTI JOIN
  *     distinct(sidecar parquet) ON key1 <=> key1' AND ... }}}
  *
  * which Spark executes as an ordinary shuffled (or broadcast, when
  * the sidecar is small and statistics say so) anti-join — no driver
  * collection, no per-task key set, spill-safe at any backlog size.
  * Null-safe equality mirrors the reader path's canonical-key
  * semantics (a null key tuple in the sidecar deletes null-keyed
  * rows).
  *
  * Routing: fires only above `spark.graft.morAntiJoinKeys` sidecar
  * rows (default 100000 — exactly the reader path's bound, so the
  * loud cap becomes unreachable when this rule is installed; footer
  * row counts only, no scan) or always under
  * `spark.graft.morAntiJoinForce=true` (tests). Idempotent: the
  * rewritten relation carries the `graft.skipKeyDeletes` option, which
  * both marks it and tells [[graft.sinks.CowScan]] not to apply the
  * in-reader filter. Aggregate/limit pushdown are unaffected — they
  * already decline on MoR-dirty snapshots, and the anti-join sits
  * above the (still manifest-pruned) scan.
  */
object CowMorAntiJoinRule extends Rule[LogicalPlan] {

  private[graft] val Flag = "graft.skipKeyDeletes"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[CowSqlTable] &&
        !r.options.containsKey(Flag) && shouldRewrite(r) =>
      rewrite(r)
  }

  private def shouldRewrite(r: DataSourceV2Relation): Boolean = {
    val t = r.table.asInstanceOf[CowSqlTable]
    val sidecars = CowTable.snapshotDeletes(t.path, t.asOf)
    if (sidecars.isEmpty) return false
    val spark = SparkSession.active
    if (spark.conf.getOption("spark.graft.morAntiJoinForce").contains("true"))
      return true
    val threshold = spark.conf.getOption("spark.graft.morAntiJoinKeys")
      .map { v =>
        try v.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"spark.graft.morAntiJoinKeys must be a long row-count threshold, " +
              s"got '$v' — e.g. SET spark.graft.morAntiJoinKeys=100000")
        }
      }.getOrElse(100000L)
    CowTable.sidecarRowCount(sidecars) > threshold
  }

  private def rewrite(r: DataSourceV2Relation): LogicalPlan = {
    val spark = SparkSession.active
    val t = r.table.asInstanceOf[CowSqlTable]
    val sidecars = CowTable.snapshotDeletes(t.path, t.asOf)
    // no distinct() on the sidecar: LEFT ANTI ignores right-side
    // duplicates, and a Deduplicate node introduced here (after the
    // optimizer's Replace-Operators batch) would never lower to an
    // aggregate
    val delPlan = spark.read.parquet(sidecars: _*)
      .queryExecution.analyzed
    val keyCols = delPlan.output.map(_.name)
    val leftKeys = keyCols.map(c =>
      r.output.find(a => conf.resolver(a.name, c)).getOrElse(
        throw new IllegalStateException(
          s"MoR key-delete column $c missing from ${t.name()}'s read schema — " +
            "fold sidecars (compact) before renaming/dropping a delete-key column")))
    val newOpts = new CaseInsensitiveStringMap(
      (r.options.asCaseSensitiveMap.asScala.toMap + (Flag -> "true")).asJava)
    val cond = leftKeys.zip(delPlan.output)
      .map { case (l, d) => EqualNullSafe(l, d) }
      .reduceLeft[org.apache.spark.sql.catalyst.expressions.Expression](And(_, _))
    Join(r.copy(options = newOpts), delPlan, LeftAnti, Some(cond), JoinHint.NONE)
  }
}
