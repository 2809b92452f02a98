package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-15 wave 2 (SURVEY §2.19): churn label generation, revenue
  * concentration (top-k share within entity), printf-style formatting,
  * business-day arithmetic, weighted medians via cumulative-weight
  * windows, and Wilson lower-bound ranking. Exactness and scale
  * posture per §2.1.
  */
object Metrics8 {

  private def li(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def orders(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "orders")
  private def cust(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "customer")
  private def part(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "part")

  /** Churn LABEL generation — the supervised-training label a pipeline
    * derives before model training: a customer churns when their last
    * order sits >365 days before the corpus horizon (or they never
    * ordered). Emits the per-segment label distribution in exact ppm.
    * One keyed agg for last-order dates, broadcast horizon scalar,
    * LEFT join keeps the never-ordered.
    */
  val customerChurnLabels: Q = (s, d) => {
    val mx = orders(s, d).agg(max(to_date(col("o_orderdate"))).as("md"))
    val lastord = orders(s, d).groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("lo"))
    val churn = when(col("lo").isNull ||
      datediff(col("md"), col("lo")) > 365, 1L).otherwise(0L)
    cust(s, d).join(lastord, col("c_custkey") === col("o_custkey"), "left")
      .crossJoin(broadcast(mx))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(cnt.as("customers"), sum(churn).cast("long").as("churned"))
      .select(col("segment"), col("customers"), col("churned"),
        expr("div(1000000 * churned, customers)").as("churn_ppm"))
      .orderBy("segment")
  }

  /** Supplier revenue concentration: each supplier's top-3 customers'
    * share of its revenue (the single-buyer-risk audit), censused into
    * percent bands. Fact agg onto the (supplier, customer) domain,
    * rank window partitioned by supplier — fully parallel.
    */
  val supplierCustomerConcentration: Q = (s, d) => {
    // ONE exchange on l_suppkey after the join serves the whole ladder:
    // HashPartitioning(sk) satisfies the (sk, ck) aggregate's clustering
    // (subset rule) AND the rank window's partitioning, so the window
    // adds only a sort — the agg's own (sk, ck) exchange plus the
    // window's sk re-exchange both disappear (r16 triage: the two
    // exchanges were the measured floor, same row volume each)
    val sc = li(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .repartition(col("l_suppkey"))
      .groupBy(col("l_suppkey").as("sk"), col("o_custkey").as("ck"))
      .agg(sumCents(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("cents"))
    val wr = Window.partitionBy("sk").orderBy(col("cents").desc, col("ck"))
    sc.withColumn("rk", row_number().over(wr))
      .groupBy("sk")
      .agg(sum("cents").cast("long").as("tot"),
        sum(when(col("rk") <= 3, col("cents")).otherwise(0L)).cast("long")
          .as("top3"))
      .groupBy(expr("div(div(1000000 * top3, tot), 10000)").as("pct_band"))
      .agg(cnt.as("suppliers"), sum("top3").cast("long").as("top3_cents"))
      .orderBy("pct_band")
  }

  /** printf-style formatting surface: the SAME C-format string
    * (`%07d|%x|%o` — zero-pad, hex, octal) through Spark
    * `format_string` and DuckDB `printf`, verified by per-priority
    * min/max/distinct over the formatted keys. Binary collation on
    * ASCII keeps min/max engine-exact.
    */
  val strPrintfFuncs: Q = (s, d) =>
    orders(s, d)
      .select(col("o_orderpriority").as("priority"),
        format_string("%07d|%x|%o", col("o_orderkey"), col("o_orderkey"),
          col("o_orderkey")).as("f"))
      .groupBy("priority")
      .agg(min("f").as("mn"), max("f").as("mx"),
        countDistinct("f").as("nd"))
      .orderBy("priority")

  /** Business-day arithmetic in closed form: g(d) = 5·⌊d₀/7⌋ +
    * min(d₀ mod 7, 4) counts business days since a Monday epoch, so
    * the order→ship business-day lag is g(ship) − g(order) — no
    * calendar iteration, one codegen'd expression. Emits the per-
    * order-weekday lag profile (does ordering before a weekend cost
    * business days?); mean as exact-integer ppm.
    */
  val dateBusinessDays: Q = (s, d) => {
    // g(d) over day numbers from the Monday epoch; div (not /) so the
    // quotient stays integral — domains are non-negative here, where
    // truncation equals floor on both engines
    def g(dc: String) =
      s"(5 * div(datediff(to_date($dc), DATE '1970-01-05'), 7) " +
        s"+ least(datediff(to_date($dc), DATE '1970-01-05') % 7, 4))"
    li(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate"))
      .select(
        expr("(dayofweek(o_orderdate) + 5) % 7 + 1").cast("long").as("order_dow"),
        expr(s"${g("l_shipdate")} - ${g("o_orderdate")}").cast("long").as("bd"))
      .groupBy("order_dow")
      .agg(cnt.as("n"), sum("bd").cast("long").as("sum_bdays"))
      .select(col("order_dow"), col("n"), col("sum_bdays"),
        expr("div(1000000 * sum_bdays, n)").as("mean_bdays_ppm"))
      .orderBy("order_dow")
  }

  /** Weighted median (quantity-weighted unit price cents per brand):
    * pre-aggregate weights per distinct value so the cumulative-weight
    * window runs over a DETERMINISTIC total order, then the median is
    * the first value where 2·cumweight ≥ total. The exact analogue of
    * percentile_disc with weights — no interpolation, no doubles.
    */
  val aggWeightedMedian: Q = (s, d) => {
    val x = li(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), cents(col("l_extendedprice")).as("c"))
      .agg(sum(col("l_quantity").cast("long")).cast("long").as("w"))
    val wc = Window.partitionBy("p_brand").orderBy("c")
    val wt = Window.partitionBy("p_brand")
    x.withColumn("cw", sum("w").over(wc))
      .withColumn("tot", sum("w").over(wt))
      .groupBy(col("p_brand").as("brand"))
      .agg(min(when(lit(2) * col("cw") >= col("tot"), col("c")))
          .cast("long").as("wmedian_cents"),
        max("tot").cast("long").as("total_qty"))
      .orderBy("brand")
  }

  /** Wilson lower confidence bound (z=1.96) on per-brand return rates,
    * ranked — the "sort by lower bound, not by rate" best practice
    * that stops tiny-sample brands from topping the risk list. The
    * double math runs AFTER exact integer aggregation, one identical
    * expression tree per group on both engines (bit-exact), then
    * quantizes to ppm.
    */
  val liReturnWilsonRank: Q = (s, d) => {
    val a = li(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .cast("long").as("k"),
        cnt.as("n"))
    // literal suffix D throughout: Spark parses a bare `1.0` as
    // DECIMAL (DuckDB as DOUBLE), and decimal division rounds at
    // scale — ~1e-5 relative drift that breaks the hash
    a.withColumn("wilson_ppm", expr(
        """cast(round(1000000D * (
             (k*1.0D/n + 1.9208D/n - 1.96D * sqrt((k*1.0D/n)*(1D - k*1.0D/n)/n + 0.9604D/(n*n)))
             / (1D + 3.8416D/n))) as bigint)"""))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("wilson_ppm").desc, col("brand")))
          .cast("long"))
      .orderBy("brand")
  }

  /** Largest-remainder apportionment at FACT scale: each order's total
    * cents distribute across its lineitems proportional to extended
    * price, floor shares + remainder-ranked top-up inside an
    * order-partitioned window — so Σ alloc == order total EXACTLY for
    * every order (validated 0 mismatches at both SFs). The per-entity
    * windowed form of `alloc_largest_remainder`'s 25-row global shape:
    * millions of independent apportionments, fully parallel by key.
    */
  val liOrderCentsApportion: Q = (s, d) => {
    val x = li(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
        cents(col("l_extendedprice")).as("w"),
        cents(col("o_totalprice")).as("tot"))
    val wo = Window.partitionBy("ok")
    val wr = Window.partitionBy("ok")
      .orderBy(col("rem").desc, col("ln"), col("pk"), col("sk"))
    x.withColumn("wsum", sum("w").over(wo))
      .withColumn("base", expr("div(tot * w, wsum)"))
      .withColumn("rem", (col("tot") * col("w")) % col("wsum"))
      .withColumn("leftover", col("tot") - sum("base").over(wo))
      .withColumn("rk", row_number().over(wr))
      .select(col("ln").cast("long").as("linenumber"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc"))
      .groupBy("linenumber")
      .agg(cnt.as("lines"), sum("alloc").cast("long").as("alloc_cents"))
      .orderBy("linenumber")
  }

  /** ISO-8601 week calendar census: ISO week via `weekofyear` (ISO on
    * both engines) and ISO YEAR via the Thursday rule — the year of
    * d + (4 − isodow(d)) days — since neither engine shares an isoyear
    * spelling; same arithmetic both sides. Bounded (year, week) domain.
    */
  val dateIsoWeekCensus: Q = (s, d) =>
    orders(s, d)
      .select(to_date(col("o_orderdate")).as("dd"))
      .select(
        year(expr("date_add(dd, 4 - ((dayofweek(dd) + 5) % 7 + 1))"))
          .cast("long").as("iso_year"),
        weekofyear(col("dd")).cast("long").as("iso_week"))
      .groupBy("iso_year", "iso_week")
      .agg(cnt.as("n"))
      .orderBy("iso_year", "iso_week")

  /** Cohort LTV under ANNUAL HALF-LIFE discounting — present value with
    * an EXACT integer discount: cents // 2^(years since first order),
    * so both engines agree bit-for-bit where a pow(0.9, t) factor
    * would ride libm's not-correctly-rounded pow into cross-engine ULP
    * flips at round-half boundaries. Cohort = the customer's first
    * order month; one keyed min-agg + self-join + monthly census.
    */
  val ltvHalflifeCohort: Q = (s, d) => {
    val f = orders(s, d).groupBy(col("o_custkey").as("ck"))
      .agg(min(trunc(col("o_orderdate"), "month")).as("fm"))
    orders(s, d).join(f, col("o_custkey") === col("ck"))
      .select(col("fm").cast("string").as("cohort_month"),
        ((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) -
         (year(col("fm")) * 12 + month(col("fm")))).as("t"),
        cents(col("o_totalprice")).as("c"))
      .withColumn("dc", expr("div(c, shiftleft(1, div(t, 12)))"))
      .groupBy("cohort_month")
      .agg(cnt.as("n_orders"), sum("c").cast("long").as("nominal_cents"),
        sum("dc").cast("long").as("discounted_cents"))
      .orderBy("cohort_month")
  }

  val queries: Map[String, Q] = Map(
    "ltv_halflife_cohort" -> ltvHalflifeCohort,
    "li_order_cents_apportion" -> liOrderCentsApportion,
    "date_iso_week_census" -> dateIsoWeekCensus,
    "customer_churn_labels" -> customerChurnLabels,
    "supplier_customer_concentration" -> supplierCustomerConcentration,
    "str_printf_funcs" -> strPrintfFuncs,
    "date_business_days" -> dateBusinessDays,
    "agg_weighted_median" -> aggWeightedMedian,
    "li_return_wilson_rank" -> liReturnWilsonRank,
  )
}
