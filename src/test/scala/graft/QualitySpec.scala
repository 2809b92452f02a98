package graft

import org.apache.spark.sql.Row

/** Wave-11 suite: the data-quality / profiling layer. Golden values
  * measured via DuckDB on sf0.001 (the same oracle SQL the driver
  * runs); plan guards pin the anti-join audit shape.
  */
class QualitySpec extends SparkSpecBase {

  test("profile_table_stats: one-scan long-format profile of orders") {
    val rows = q("profile_table_stats").collect()
    assert(rows.length == 13)
    val m = rows.map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(m(("*", "n_rows")) == "1500")
    assert(m(("o_custkey", "n_distinct")) == "150")
    assert(m(("o_orderdate", "min_day")) == "1995-01-01")
    assert(m(("o_orderdate", "max_day")) == "2001-08-01")
    assert(m(("o_totalprice", "max_cents")) == "49970505")
    assert(m(("o_orderstatus", "n_distinct")) == "3")
  }

  test("dq_referential_orphans: all five FK edges clean at sf0.001, anti-join shape") {
    val rows = q("dq_referential_orphans").collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getLong(1) == 0L, r.toString))
    val p = q("dq_referential_orphans").queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("dq_duplicate_keys: the measured-non-unique lineitem key fires, the real keys don't") {
    assert(q("dq_duplicate_keys").collect().toSeq == Seq(
      Row("documents.text", 0L, 0L),
      Row("lineitem.(l_orderkey,l_linenumber)", 1161L, 1401L),
      Row("orders.o_orderkey", 0L, 0L)))
  }

  test("dq_domain_violations: rule battery — PASS rows prove execution, real rules fire") {
    val m = q("dq_domain_violations").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.size == 7)
    assert(m("lineitem.discount_range") == 0L)
    assert(m("lineitem.qty_integer") == 0L)
    assert(m("customer.acctbal_negative") == 11L)
    assert(m("lineitem.ship_before_order") == 2815L)
  }
}
