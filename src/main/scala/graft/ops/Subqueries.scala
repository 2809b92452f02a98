package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.oracle.OracleSql
import graft.tables.Tables
import Util._

/** Round-4 wave 8: the decision-support subquery family — adapted
  * TPC-H shapes (correlated scalar subqueries, EXISTS / NOT EXISTS,
  * IN-subqueries, scalar-subquery thresholds, LATERAL) re-targeted at
  * the columns this corpus actually has (no partsupp / commitdate /
  * receiptdate / phone — FIXTURES.md), so every classic shape is
  * exercised without inventing data.
  *
  * Two deliberate API registers:
  *  - Genuinely correlated queries (`q2`, `q17`, `q21`, `q22`,
  *    `join_lateral_topk`) run through `spark.sql` ON PURPOSE: the
  *    DataFrame API cannot express a correlated scalar subquery, and
  *    routing them through the parser exercises Catalyst's
  *    decorrelation (RewriteCorrelatedScalarSubquery /
  *    RewritePredicateSubquery / DecorrelateInnerQuery) — the rewrite
  *    layer a 100 TB user hits the moment they hand us SQL. The text
  *    is engine-portable and shared verbatim with the DuckDB oracle
  *    (single source of truth in [[graft.oracle.OracleSql]]).
  *  - Everything else is declarative DataFrame composition with
  *    dimension broadcasts, so Catalyst sees the same plan space as
  *    the rest of the library.
  *
  * Scale posture: every query here shuffles on its natural key
  * (orderkey / custkey / suppkey) at most once per side; dimensions
  * (nation, region, supplier at this ratio, the 1-row scalar
  * aggregates) broadcast; the correlated predicates decorrelate to
  * semi/anti/left-outer equi-joins — no nested-loop re-execution per
  * outer row survives in any physical plan.
  */
object Subqueries {

  private def tb(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** Shared revenue-in-cents column (R2). */
  private def revCents: Column = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  /** Correlated-min selection (TPC-H Q2 shape without partsupp):
    * cheapest ECONOMY part per size bracket. Decorrelates to an
    * aggregate + self-equi-join on p_size; the double equality is on
    * stored (untouched) values, so it is exact on both engines.
    */
  val q2MinCostPart: Q = (s, d) =>
    Tables.sql(s, d, OracleSql.sql("q2_min_cost_part"))

  /** EXISTS shape (TPC-H Q4 adapted: late shipment = shipped > 60 days
    * after order date). The semi join carries the non-equi residual on
    * top of the orderkey equi-key — one shuffle per side, no
    * re-execution per order.
    */
  val q4LateOrders: Q = (s, d) => {
    val o = tb(s, d, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1997-01-01 00:00:00"))
    // the semi's build side is the 2-column lineitem projection —
    // broadcast-sized at bench scale only (a semi join can only build
    // right, and un-hinted both sides shuffle); planner/AQE decides at
    // production scale (see Util.benchBroadcast)
    val l = benchBroadcast(
      tb(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate")))
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
              l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
           "left_semi")
      .groupBy("o_orderpriority")
      .agg(cnt.as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Inter-region trade volume (TPC-H Q7 adapted to regions so sf0.001
    * stays non-empty): supplier-region ↔ customer-region pairs by ship
    * year. Fact tables join on their keys; all four dim hops
    * broadcast.
    */
  val q7VolumeShipping: Q = (s, d) => {
    val l = tb(s, d, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1998-01-01 00:00:00"))
    val o = tb(s, d, "orders").select("o_orderkey", "o_custkey")
    val c = tb(s, d, "customer").select("c_custkey", "c_nationkey")
    val sup = tb(s, d, "supplier").select("s_suppkey", "s_nationkey")
    val sr = regionOf(s, d, "supp_region")
    val cr = regionOf(s, d, "cust_region")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sr), col("s_nationkey") === col("supp_region_nk"))
      .join(broadcast(cr), col("c_nationkey") === col("cust_region_nk"))
      .filter((col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
              (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
      .groupBy(col("supp_region"), col("cust_region"),
               year(col("l_shipdate")).as("l_year"))
      .agg(sum(revCents).cast("long").as("rev_cents"))
      .orderBy("supp_region", "cust_region", "l_year")
  }

  /** nation⋈region collapsed to (<alias>_nk, <alias> region name) —
    * key renamed per call site so the double dim hop (supplier side +
    * customer side) never trips the ambiguous-self-join check.
    */
  private def regionOf(s: SparkSession, d: String, as: String): DataFrame =
    tb(s, d, "nation")
      .join(tb(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as(s"${as}_nk"), col("r_name").as(as))

  /** Market share (TPC-H Q8 adapted): EUROPE-supplier share of all
    * deliveries into ASIA customers, permille per order year. The
    * ratio is integer permille over integer-cents sums (R2/R6-safe:
    * `div` never touches FP).
    */
  val q8MarketShare: Q = (s, d) => {
    val l = tb(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"), revCents.as("cents"))
    val o = tb(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    val c = tb(s, d, "customer").select("c_custkey", "c_nationkey")
    val sup = tb(s, d, "supplier").select("s_suppkey", "s_nationkey")
    val sr = regionOf(s, d, "supp_region")
    val cr = regionOf(s, d, "cust_region")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(cr), col("c_nationkey") === col("cust_region_nk"))
      .filter(col("cust_region") === "ASIA")
      .join(broadcast(sr), col("s_nationkey") === col("supp_region_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(sum(when(col("supp_region") === "EUROPE", col("cents")).otherwise(0L)).as("eu"),
           sum(col("cents")).cast("long").as("total_cents"))
      .select(col("o_year"),
              expr("div(eu * 1000, total_cents)").as("share_pm"),
              col("total_cents"))
      .orderBy("o_year")
  }

  /** Returned-item revenue ranking (TPC-H Q10): top 20 customers by
    * refunded revenue in a quarter. Orders filter cuts the fact side
    * before the customer join; the final TopK is
    * `TakeOrderedAndProject`, never a global sort.
    */
  val q10ReturnedItems: Q = (s, d) => {
    val o = tb(s, d, "orders")
      .filter(col("o_orderdate") >= ts("1996-07-01 00:00:00") &&
              col("o_orderdate") < ts("1996-10-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    val l = tb(s, d, "lineitem").filter(col("l_returnflag") === "R")
    val c = tb(s, d, "customer").select("c_custkey", "c_name", "c_nationkey")
    val n = tb(s, d, "nation").select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(revCents).cast("long").as("rev_cents"))
      .orderBy(col("rev_cents").desc, col("c_custkey"))
      .limit(20)
  }

  /** Customer order-count distribution (TPC-H Q13): LEFT join with the
    * filter inside the join condition (customers with zero 'F' orders
    * must survive), then a distribution over the counts.
    */
  val q13OrderDistribution: Q = (s, d) => {
    val c = tb(s, d, "customer").select("c_custkey")
    val o = tb(s, d, "orders").filter(col("o_orderstatus") === "F")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(cnt.as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Promo revenue share (TPC-H Q14): permille of one month's revenue
    * coming from PROMO parts. part broadcasts; one agg, zero sorts.
    */
  val q14PromoRevenue: Q = (s, d) => {
    val l = tb(s, d, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1996-02-01 00:00:00"))
    val p = tb(s, d, "part").select("p_partkey", "p_type")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type").startsWith("PROMO"), revCents).otherwise(0L)).as("promo"),
           sum(revCents).cast("long").as("rev_cents"))
      .select(expr("div(promo * 1000, rev_cents)").as("promo_pm"), col("rev_cents"))
  }

  /** Top supplier by quarterly revenue (TPC-H Q15): the scalar-subquery
    * max — revenue per supplier, keep the max. The 1-row max aggregate
    * broadcasts; equality is on integer cents, so ties are exact (and
    * all tied suppliers surface, as the spec demands).
    */
  val q15TopSupplier: Q = (s, d) => {
    val rev = tb(s, d, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .groupBy("l_suppkey")
      .agg(sum(revCents).cast("long").as("total_rev"))
    val mx = rev.agg(max("total_rev").as("mx"))
    val sup = tb(s, d, "supplier").select("s_suppkey", "s_name")
    rev.join(broadcast(mx), col("total_rev") === col("mx"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  /** Correlated-avg filter (TPC-H Q17 shape): Brand#1 lineitems below
    * half their part's average quantity. Runs through the parser so
    * Catalyst decorrelates the scalar subquery into an aggregate +
    * equi-join (avg over integral-valued doubles is engine-exact, R6).
    */
  val q17SmallQtyRevenue: Q = (s, d) =>
    Tables.sql(s, d, OracleSql.sql("q17_small_qty_revenue"))

  /** IN-subquery with HAVING (TPC-H Q18): orders whose total quantity
    * tops 150, rolled up per (customer, order). The IN becomes a
    * left-semi join against the having-aggregate — both sides shuffle
    * on orderkey once.
    */
  val q18LargeOrders: Q = (s, d) => {
    val l = tb(s, d, "lineitem")
    // the >150 filter leaves a handful of orderkeys, but without AQE
    // the planner sizes the filtered aggregate at its child's estimate
    // and shuffle-joins everything; bench-gated broadcasts put the
    // tiny sides on the build side (production: planner/AQE decides)
    val big = benchBroadcast(l.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .filter(col("qty") > 150)
      .select(col("l_orderkey").as("big_ok")))
    val o = tb(s, d, "orders").select("o_orderkey", "o_custkey")
      .join(big, col("o_orderkey") === col("big_ok"), "left_semi")
    val c = tb(s, d, "customer").select("c_custkey")
    benchBroadcast(o.join(c, col("o_custkey") === col("c_custkey")))
      .join(l.select("l_orderkey", "l_quantity"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_custkey", "o_orderkey")
      .agg(sum(col("l_quantity").cast("long")).cast("long").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  /** Nested IN-subqueries (TPC-H Q20 shape): suppliers who moved > 90
    * units of some PROMO part. Inner IN prunes lineitem against the
    * part dim (broadcast semi), the HAVING aggregate groups on
    * (suppkey, partkey), and the outer IN is a semi join — linear
    * end to end.
    */
  val q20PromoSuppliers: Q = (s, d) => {
    val promoParts = tb(s, d, "part")
      .filter(col("p_type").startsWith("PROMO"))
      .select("p_partkey")
    val heavy = tb(s, d, "lineitem")
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .filter(col("qty") > 90)
      .select("l_suppkey")
    tb(s, d, "supplier")
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  /** EXISTS + NOT EXISTS (TPC-H Q21 shape): in finished multi-supplier
    * orders, the supplier whose shipment was strictly last. Parser
    * path: both correlated predicates decorrelate to one semi and one
    * anti equi-join on orderkey.
    */
  val q21LatestShipper: Q = (s, d) =>
    Tables.sql(s, d, OracleSql.sql("q21_latest_shipper"))

  /** Scalar-subquery threshold + NOT EXISTS (TPC-H Q22 shape):
    * above-average-balance customers with no open orders. The mean
    * compare is cross-multiplied onto integer cents — no FP division
    * anywhere (R2/R6).
    */
  val q22IdleBalance: Q = (s, d) =>
    Tables.sql(s, d, OracleSql.sql("q22_idle_balance"))

  /** LATERAL correlated subquery with ORDER BY + LIMIT: top-2
    * suppliers by balance per nation. Catalyst decorrelates the
    * lateral limit into a per-key ranking — the per-group-top-k that a
    * naive engine would re-execute per outer row.
    */
  val joinLateralTopk: Q = (s, d) =>
    Tables.sql(s, d, OracleSql.sql("join_lateral_topk"))

  /** Product-type profit (TPC-H Q9 adapted: no partsupp, so the unit
    * cost is a deterministic function of the part — retailprice/10):
    * per (supplier nation, order year), profit = revenue − cost, all
    * in integer cents (R2). lineitem shuffles once on orderkey for
    * the orders join; part / supplier / nation all broadcast.
    */
  val q9ProductProfit: Q = (s, d) => {
    val p = tb(s, d, "part").filter(col("p_name").contains("widget"))
      .select(col("p_partkey"),
              cents(col("p_retailprice") * 0.1).as("unit_cost_cents"))
    val sup = tb(s, d, "supplier").select("s_suppkey", "s_nationkey")
    val n = tb(s, d, "nation").select("n_nationkey", "n_name")
    val o = tb(s, d, "orders").select("o_orderkey", "o_orderdate")
    tb(s, d, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revCents - col("unit_cost_cents") * col("l_quantity").cast("long"))
             .cast("long").as("profit_cents"))
      .orderBy("nation", "o_year")
  }

  /** Important-stock share threshold (TPC-H Q11 adapted: flow value
    * from lineitem instead of partsupp stock): parts whose
    * EUROPE-supplied value exceeds 0.1% of the total. The scalar total
    * is a 1-row aggregate broadcast back; the compare is an integer
    * cross-multiply (no FP ratio, R6).
    */
  val q11ImportantStock: Q = (s, d) => {
    val euSup = tb(s, d, "supplier")
      .join(broadcast(regionOf(s, d, "r")), col("s_nationkey") === col("r_nk"))
      .filter(col("r") === "EUROPE")
      .select("s_suppkey")
    val value = tb(s, d, "lineitem")
      .join(broadcast(euSup), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(cents(col("l_extendedprice")) * col("l_quantity").cast("long"))
             .as("value_cents"))
    val total = value.agg(sum("value_cents").as("total_cents"))
    value.join(broadcast(total))
      .filter(col("value_cents") * 1000 > col("total_cents"))
      .select(col("l_partkey"), col("value_cents").cast("long").as("value_cents"))
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  /** Late-shipment priority split (TPC-H Q12 shape; l_linestatus
    * stands in for the shipmode this corpus lacks): per linestatus,
    * high- vs low-priority order counts among 1996 orders shipped
    * > 90 days after ordering. Conditional counts ride the one
    * orderkey shuffle — no second pass.
    */
  val q12PrioritySplit: Q = (s, d) => {
    val o = tb(s, d, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1997-01-01 00:00:00"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    tb(s, d, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey") &&
               col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("l_linestatus")
      .agg(sum(when(hi, 1L).otherwise(0L)).cast("long").as("high_count"),
           sum(when(hi, 0L).otherwise(1L)).cast("long").as("low_count"))
      .orderBy("l_linestatus")
  }

  /** Supplier variety (TPC-H Q16 shape): distinct suppliers able to
    * supply each (brand, size) bracket, excluding PROMO parts, one
    * brand, and suppliers in deficit (the NOT IN → broadcast anti
    * join). The distinct count shuffles on the (brand, size) group
    * key once.
    */
  val q16SupplierVariety: Q = (s, d) => {
    val p = tb(s, d, "part")
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").startsWith("PROMO") &&
              col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select("p_partkey", "p_brand", "p_size")
    val badSup = tb(s, d, "supplier").filter(col("s_acctbal") < 0).select("s_suppkey")
    tb(s, d, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(badSup), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** Disjunctive multi-clause revenue (TPC-H Q19 shape): three
    * brand/quantity/size clauses OR'd together. Exercises CNF
    * conversion — the common `p_partkey = l_partkey` stays in the
    * join, the per-brand residuals evaluate post-join, and the part
    * dim still broadcasts.
    */
  val q19DisjunctiveRevenue: Q = (s, d) => {
    val p = tb(s, d, "part").select("p_partkey", "p_brand", "p_size")
    val clause = (col("p_brand") === "Brand#2" &&
                    col("l_quantity").between(1, 15) && col("p_size").between(1, 10)) ||
                 (col("p_brand") === "Brand#3" &&
                    col("l_quantity").between(10, 25) && col("p_size").between(1, 20)) ||
                 (col("p_brand") === "Brand#4" &&
                    col("l_quantity").between(20, 35) && col("p_size").between(1, 30))
    tb(s, d, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(clause)
      .agg(sum(revCents).cast("long").as("rev_cents"), cnt.as("n_items"))
  }

  /** Recursive CTE (Spark 4 native `WITH RECURSIVE`): transitive
    * closure of the deterministic tripling chain `k → 3k+1` from ten
    * seed customers — depth grows with log₃(|customer|), so the
    * iteration count scales with the LOG of the data. x→3x+1 is
    * injective, so chains never merge and the working set stays ≤ 10
    * rows per level. Text shared verbatim with the DuckDB oracle.
    */
  /** Recursive-CTE contract query (k → 3k+1 chains through the
    * customer key space, depths 0..20). Spark's native `WITH
    * RECURSIVE` executes this as ~21 sequential driver-side UnionLoop
    * iterations, each paying a full job-scheduling floor (measured
    * 1.3 s at sf0.1 for microseconds of data work). Because the
    * recursion is a deterministic successor FUNCTION with a closed
    * form (k_d = 3^d·a + (3^d−1)/2), the optimizer-ideal plan is
    * direct: cross the 9 anchors with the 21 depths (one projection),
    * validate every candidate against the customer key set with ONE
    * inner join that BROADCASTS the 189 candidates and streams the
    * customer scan (never the reverse — customer is the data-sized
    * side at any scale), and keep each anchor's consecutive-depth
    * prefix via a row_number window over ≤189 rows. Three plan
    * barriers total, no iteration. [[sqlRecursiveCteDoubling]] keeps
    * the general technique for successors with no closed form, and
    * SubqueriesSpec proves closed-form == prefix-doubling == native
    * WITH RECURSIVE (which is also the DuckDB oracle text).
    */
  val sqlRecursiveCte: Q = (s, d) => {
    val cust = Tables.t(s, d, "customer")
      .select(col("c_custkey").cast("long").as("k"))
    val pow3: IndexedSeq[Long] = Iterator.iterate(1L)(_ * 3).take(21).toIndexedSeq
    val depths = array((0 to 20).map { i =>
      struct(lit(i.toLong).as("depth"), lit(pow3(i)).as("p3"),
             lit((pow3(i) - 1) / 2).as("h3"))
    }: _*)
    val cand = cust.filter(col("k") < 10).select(col("k").as("a"))
      .select(col("a"), explode(depths).as("dp"))
      .select(col("a"), col("dp.depth").as("depth"),
              (col("dp.p3") * col("a") + col("dp.h3")).as("k"))
    val matched = broadcast(cand).join(cust, "k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy("depth")
    matched
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("depth") === col("rn") - 1) // consecutive-from-0 prefix only
      .groupBy("depth")
      .agg(cnt.as("n"), sum("k").cast("long").as("sum_k"))
      .orderBy("depth")
  }

  /** General fixed-depth recursion by PREFIX DOUBLING — the technique
    * [[sqlRecursiveCte]]'s closed form specializes: f^(2c) = f^c ∘ f^c,
    * so the covered depth doubles per round and depth-20 recursion
    * costs 5 rounds of equi-joins (one lazily-planned job) instead of
    * 21 sequential driver iterations. Kept as the library path for
    * successor functions with no closed form; equality-tested against
    * both other formulations in SubqueriesSpec.
    */
  val sqlRecursiveCteDoubling: Q = (s, d) => {
    val cust = Tables.t(s, d, "customer")
      .select(col("c_custkey").cast("long").as("k"))
    // f^1: k -> 3k+1, kept only where the successor is a customer key
    val step1 = cust.select(col("k").as("src"), (col("k") * 3 + 1).as("dst"))
      .join(cust.select(col("k").as("dst")), "dst")
      .select("src", "dst")
    val maxDepth = 20L
    var p = cust.filter(col("k") < 10).select(col("k"), lit(0L).as("depth"))
    var f = step1
    var cover = 1L // p holds every chain row with depth < cover
    while (cover <= maxDepth) {
      p = p.unionByName(
        p.join(broadcast(f), p("k") === f("src"))
          .select(f("dst").as("k"), (p("depth") + cover).as("depth")))
      if (cover * 2 <= maxDepth) {
        val g = f.select(col("src").as("s2"), col("dst").as("d2"))
        f = f.join(broadcast(g), f("dst") === g("s2"))
          .select(f("src").as("src"), g("d2").as("dst"))
      }
      cover *= 2
    }
    p.filter(col("depth") <= maxDepth)
      .groupBy("depth")
      .agg(cnt.as("n"), sum("k").cast("long").as("sum_k"))
      .orderBy("depth")
  }

  val queries: Map[String, Q] = Map(
    "sql_recursive_cte" -> sqlRecursiveCte,
    "q9_product_profit" -> q9ProductProfit,
    "q11_important_stock" -> q11ImportantStock,
    "q12_priority_split" -> q12PrioritySplit,
    "q16_supplier_variety" -> q16SupplierVariety,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue,
    "q2_min_cost_part" -> q2MinCostPart,
    "q4_late_orders" -> q4LateOrders,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q8_market_share" -> q8MarketShare,
    "q10_returned_items" -> q10ReturnedItems,
    "q13_order_distribution" -> q13OrderDistribution,
    "q14_promo_revenue" -> q14PromoRevenue,
    "q15_top_supplier" -> q15TopSupplier,
    "q17_small_qty_revenue" -> q17SmallQtyRevenue,
    "q18_large_orders" -> q18LargeOrders,
    "q20_promo_suppliers" -> q20PromoSuppliers,
    "q21_latest_shipper" -> q21LatestShipper,
    "q22_idle_balance" -> q22IdleBalance,
    "join_lateral_topk" -> joinLateralTopk,
  )
}
