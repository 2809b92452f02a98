package graft

import org.apache.spark.sql.functions._

/** Plan-regression guards: the physical properties PLANS.md documents,
  * asserted so a refactor can't silently lose them.
  */
class PlanSpec extends SparkSpecBase {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("direct parquet scans push filters and prune columns") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      p.take(400))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_shipdate"))
  }

  test("topk_global fuses into TakeOrderedAndProject (no full sort)") {
    assert(plan("topk_global").contains("TakeOrderedAndProject"))
  }

  test("q5 joins are all broadcast at this scale (no sort-merge)") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), p.take(600))
  }

  test("recon_leg_match is a single full-outer join (no anti-join recompute)") {
    val p = plan("recon_leg_match")
    assert(p.contains("FullOuter"), p.take(600))
    assert(!p.contains("LeftAnti"))
  }

  test("similarity kernel (VecDot) sits in the join hot path") {
    // execute first so AQE finalizes; codegen stages show as *(n)
    val df = q("sim_pairs_threshold")
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("vecdot"), "VecDot missing from physical plan:\n" + p.take(600))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }
}
