package graft

import org.apache.spark.sql.Row

/** Wave-11 suite: the data-quality / profiling layer. Golden values
  * measured via DuckDB on sf0.001 (the same oracle SQL the driver
  * runs); plan guards pin the anti-join audit shape.
  */
class QualitySpec extends SparkSpecBase {

  test("observe DQ counters: metrics piggyback on the consuming action, values exact") {
    import org.apache.spark.sql.functions._
    val o = graft.tables.Tables.t(spark, sf, "orders")
    val obs = new org.apache.spark.sql.Observation("dq")
    val observed = graft.ops.Quality.withDqObservation(
      o, obs, nullCols = Seq("o_orderstatus", "o_custkey"),
      nonNegativeCol = "o_totalprice")
    // the CONSUMING job is the pipeline's own work, not an audit scan
    val delivered = observed.filter(col("o_orderstatus") === "F").count()
    val m = obs.get
    assert(m("rows") == o.count())
    assert(m("nulls_o_orderstatus") == 0L && m("nulls_o_custkey") == 0L)
    assert(m("negative_o_totalprice") == 0L)
    assert(delivered > 0)
    // and the counters really track the data: a frame with planted
    // nulls/negatives reports them exactly
    import spark.implicits._
    val dirty = Seq((1L, "A", 10.0), (2L, null.asInstanceOf[String], -5.0),
                    (3L, "B", -1.0)).toDF("o_custkey", "o_orderstatus", "o_totalprice")
    val obs2 = new org.apache.spark.sql.Observation("dq2")
    graft.ops.Quality.withDqObservation(dirty, obs2,
      Seq("o_orderstatus"), "o_totalprice").count()
    val m2 = obs2.get
    assert(m2("rows") == 3L && m2("nulls_o_orderstatus") == 1L &&
           m2("negative_o_totalprice") == 2L, m2.toString)
  }

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
