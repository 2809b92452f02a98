package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-13 wave 2 (SURVEY §2.17): margin interaction grids,
  * first-order cohorts, dispersion components, catalog spans,
  * nation×segment mixes, YoY growth, status-consistency audits, the
  * last_day/date-boundary SQL surface, acquisition curves, brand HHI,
  * clock-uniformity DQ, per-priority value quartiles, return-rate
  * bands, same-day-order audits, per-label norm gaps, and first-token
  * boilerplate censuses. Exactness and scale posture as §2.1 / wave 1.
  */
object Metrics4 {

  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def orders(s: SparkSession, d: String) = Tables.t(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.t(s, d, "customer")
  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  /** Margin interaction grid: mean per-line net revenue over the
    * bounded (discount bp × tax bp) domain — does tax band correlate
    * with discounting. Per-row `round(e·(1−d)·(1+t)·100)` is exact;
    * one fact pass into a ≤121-cell grid.
    */
  val liDiscountTaxInteraction: Q = (s, d) =>
    li(s, d).select(
        round(col("l_discount") * 100).cast("long").as("disc_pct"),
        round(col("l_tax") * 100).cast("long").as("tax_pct"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("net"))
      .groupBy("disc_pct", "tax_pct")
      .agg(cnt.as("n_lines"),
           expr("div(sum(net), count(1))").cast("long").as("avg_net_cents"))
      .orderBy("disc_pct", "tax_pct")

  /** First-order value cohorts: customers bucketed by their FIRST
    * order's value band; per band, the lifetime revenue multiple
    * (ppm) and repeat share — does a big first basket predict value.
    * First order via the deterministic struct-argmin; one orders
    * pass + a customer-grain join.
    */
  val ordersFirstOrderValueCohort: Q = (s, d) => {
    val o = orders(s, d).select(col("o_custkey").as("ck"),
      struct(to_date(col("o_orderdate")).as("dt"), col("o_orderkey").as("ok"),
             cents(col("o_totalprice")).as("c")).as("st"),
      cents(col("o_totalprice")).as("c"))
    val perCust = o.groupBy("ck")
      .agg(min("st").getField("c").as("first_c"),
           sum("c").cast("long").as("total_c"), cnt.as("n_orders"))
    perCust.groupBy(expr("div(first_c, 4194304)").as("first_band"))
      .agg(cnt.as("n_customers"),
           sum("total_c").cast("long").as("lifetime_cents"),
           sum("first_c").cast("long").as("first_cents"),
           sum(when(col("n_orders") > 1L, 1L).otherwise(0L)).cast("long")
             .as("n_repeat"))
      .select(col("first_band"), col("n_customers"),
        expr("div(lifetime_cents * 1000000, first_cents)").cast("long")
          .as("lifetime_multiple_ppm"),
        expr("div(n_repeat * 1000000, n_customers)").cast("long")
          .as("repeat_ppm"))
      .orderBy("first_band")
  }

  /** Purchase-value dispersion per event type, EXACT components only:
    * n, sum, and the scaled variance numerator n·Σx²−(Σx)² over
    * decimal(38) — the sqrt (CV) deliberately stays out of the
    * contract, like `ml_mcc_components`. One pass, keyed agg.
    */
  val eventsValueDispersion: Q = (s, d) =>
    ev(s, d).filter(col("event_type") === "purchase")
      .select(col("event_type").as("etype"), cents(col("value")).as("c"))
      .groupBy("etype")
      .agg(cnt.as("n"), sum("c").cast("long").as("sum_cents"),
           sum(expr("cast(c as decimal(38,0)) * c")).as("ssq"))
      .select(col("etype"), col("n"), col("sum_cents"),
        expr("cast(cast(n as decimal(38,0)) * ssq - " +
             "cast(sum_cents as decimal(38,0)) * sum_cents as decimal(38,0))")
          .cast("string").as("var_num"))
      .orderBy("etype")

  /** Catalog span per brand: distinct sizes and types carried, size
    * extremes, retail range in cents — assortment breadth at a
    * glance. Bounded brand domain, one pass.
    */
  val partBrandSizeSpan: Q = (s, d) =>
    Tables.t(s, d, "part")
      .groupBy(col("p_brand").as("brand"))
      .agg(cnt.as("n_parts"),
           countDistinct("p_size").cast("long").as("n_sizes"),
           countDistinct("p_type").cast("long").as("n_types"),
           min("p_size").cast("long").as("min_size"),
           max("p_size").cast("long").as("max_size"),
           min(cents(col("p_retailprice"))).cast("long").as("min_retail_cents"),
           max(cents(col("p_retailprice"))).cast("long").as("max_retail_cents"))
      .orderBy("brand")

  /** Nation × market-segment customer mix with within-nation shares
    * (ppm) — where each segment lives. Bounded 25×5 output; the share
    * window runs over the aggregate only.
    */
  val customerNationSegmentMix: Q = (s, d) =>
    cust(s, d)
      .join(broadcast(Tables.t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("c_mktsegment").as("segment"))
      .agg(cnt.as("n_customers"),
           sum(cents(col("c_acctbal"))).cast("long").as("bal_cents"))
      .withColumn("nation_share_ppm",
        expr("div(n_customers * 1000000, sum(n_customers) over (partition by nation))")
          .cast("long"))
      .orderBy("nation", "segment")

  /** Year-over-year growth of the SAME quarter (Q1 vs prior Q1, …),
    * signed ppm — seasonality-free growth, the YoY complement of
    * `ts_mom_growth`. Fact collapses to the bounded (year, quarter)
    * domain; the lag partitions by quarter.
    */
  val tsQuarterGrowthYoy: Q = (s, d) => {
    val q = orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
               quarter(col("o_orderdate")).cast("long").as("qtr"))
      .agg(sumCents(col("o_totalprice")).as("rev_cents"))
    val w = Window.partitionBy("qtr").orderBy("yr")
    q.withColumn("prev", lag("rev_cents", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("yr"), col("qtr"), col("rev_cents"),
        expr("cast(div((rev_cents - prev) * 1000000, prev) as bigint)")
          .as("yoy_ppm"))
      .orderBy("yr", "qtr")
  }

  /** Order-status ↔ line-status consistency census: the bounded
    * (o_orderstatus, l_linestatus) contingency with row shares — the
    * referential STATE audit next to `dq_referential_orphans`' key
    * audit ('F' orders should not carry 'O' lines). One fact join on
    * orderkey, ≤9-row output.
    */
  val dqStatusConsistency: Q = (s, d) =>
    li(s, d)
      .join(orders(s, d).select("o_orderkey", "o_orderstatus"),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus").as("ostatus"),
               col("l_linestatus").as("lstatus"))
      .agg(cnt.as("n_lines"))
      .withColumn("share_ppm",
        expr("div(n_lines * 1000000, sum(n_lines) over (partition by ostatus))")
          .cast("long"))
      .orderBy("ostatus", "lstatus")

  /** The last_day / date-boundary SQL surface: per order month, the
    * month-end date, days in month, and the share of orders landing
    * in the final 7 days — month-end loading detection. Bounded month
    * domain after one fact census.
    */
  val exprDateBoundaries: Q = (s, d) =>
    orders(s, d)
      .select(trunc(col("o_orderdate"), "month").as("mstart"),
              to_date(col("o_orderdate")).as("dt"))
      .withColumn("mend", last_day(col("dt")))
      .groupBy(col("mstart"))
      .agg(max(col("mend")).as("mend"),
           max(dayofmonth(col("mend"))).cast("long").as("days_in_month"),
           cnt.as("n_orders"),
           sum(when(datediff(col("mend"), col("dt")) < 7, 1L).otherwise(0L))
             .cast("long").as("n_final_week"))
      .select(col("mstart").cast("string").as("mstart"),
              col("mend").cast("string").as("mend"),
              col("days_in_month"), col("n_orders"),
              expr("div(n_final_week * 1000000, n_orders)").cast("long")
                .as("final_week_ppm"))
      .orderBy("mstart")

  /** Customer acquisition curve: NEW customers per first-order month
    * and the cumulative base — the top of every growth dashboard.
    * Customer grain collapses to the bounded month domain; the
    * cumulative window runs over months only.
    */
  val customerAcquisitionMonthly: Q = (s, d) => {
    val firstM = orders(s, d).groupBy(col("o_custkey"))
      .agg(min(trunc(col("o_orderdate"), "month")).as("fm"))
    val monthly = firstM.groupBy("fm").agg(cnt.as("new_customers"))
    monthly
      .withColumn("cum_customers", sum("new_customers")
        .over(Window.orderBy("fm")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .select(col("fm").cast("string").as("fm"), col("new_customers"),
              col("cum_customers"))
      .orderBy("fm")
  }

  /** Brand-concentration HHI per part TYPE (ppm of squared part-count
    * shares) — single-brand capture risk per category, the catalog
    * cousin of `supplier_hhi_concentration` (same decimal(38) exact
    * form). Bounded type×brand domain.
    */
  val partTypeBrandHhi: Q = (s, d) => {
    val tb = Tables.t(s, d, "part")
      .groupBy(col("p_type").as("ptype"), col("p_brand"))
      .agg(cnt.as("n"))
    tb.groupBy("ptype")
      .agg(cnt.as("n_brands"), sum("n").cast("long").as("np"),
           sum(expr("cast(n as decimal(38,0)) * n")).as("sq"))
      .select(col("ptype"), col("n_brands"),
        expr("cast(div(sq * 1000000, cast(np as decimal(38,0)) * np) as bigint)")
          .as("hhi_ppm"))
      .orderBy("ptype")
  }

  /** Clock-uniformity audit: event counts per minute-of-hour (0..59)
    * with the EXACT deviation test (60·n_m − N)² vs the uniform
    * expectation — batchy/synthetic timestamp detection (real traffic
    * is near-uniform in minute-of-hour; cron spikes are not). Bounded
    * 60-row domain + a 1-row total broadcast.
    */
  val dqClockUniformity: Q = (s, d) => {
    val m = ev(s, d).groupBy(minute(col("ts")).cast("long").as("moh"))
      .agg(cnt.as("n"))
    val tot = m.agg(sum("n").cast("long").as("nn"))
    m.crossJoin(broadcast(tot))
      .select(col("moh"), col("n"),
        expr("cast(cast(60 * n - nn as decimal(38,0)) * (60 * n - nn) as decimal(38,0))")
          .cast("string").as("dev_sq"))
      .orderBy("moh")
  }

  /** Exact order-value quartiles per order priority (the ceil-rank
    * contract of `corpus_length_outliers_by_source`) — do urgent
    * orders run bigger. Priority-partitioned windows, parallel.
    */
  val ordersPriorityValueQuartiles: Q = (s, d) => {
    val o = orders(s, d).select(col("o_orderpriority").as("prio"),
      cents(col("o_totalprice")).as("c"), col("o_orderkey").as("ok"))
    val w = Window.partitionBy("prio").orderBy("c", "ok")
    o.withColumn("rn", row_number().over(w))
      .withColumn("cn", count(lit(1)).over(Window.partitionBy("prio")))
      .groupBy("prio")
      .agg(cnt.as("n_orders"),
           max(when(col("rn") === expr("div(cn + 3, 4)"), col("c")))
             .cast("long").as("q1_cents"),
           max(when(col("rn") === expr("div(cn + 1, 2)"), col("c")))
             .cast("long").as("med_cents"),
           max(when(col("rn") === expr("div(3 * cn + 3, 4)"), col("c")))
             .cast("long").as("q3_cents"))
      .orderBy("prio")
  }

  /** Return rate (ppm) by quantity band: are big lines returned more —
    * the operating complement of `ml_brier_score`'s discount→return
    * probe. One pass into the bounded 1..50 quantity domain.
    */
  val liQtyReturnRate: Q = (s, d) =>
    li(s, d)
      .select(expr("div(cast(floor(l_quantity) as bigint) - 1, 5)").as("qty_band"),
              when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"))
      .groupBy("qty_band")
      .agg(cnt.as("n_lines"), sum("r").cast("long").as("n_returned"))
      .withColumn("return_ppm",
        expr("div(n_returned * 1000000, n_lines)").cast("long"))
      .orderBy("qty_band")

  /** Same-day multi-order audit: how many customers place k orders on
    * one calendar day — dedup-suspicion / split-order census. Two
    * bounded keyed aggs.
    */
  val dqSameDayOrders: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("dt"))
      .agg(cnt.as("k"))
      .groupBy(col("k").as("orders_per_day"))
      .agg(cnt.as("n_customer_days"),
           countDistinct("o_custkey").cast("long").as("n_customers"))
      .orderBy("orders_per_day")

  /** Per-label embedding SQUARED-norm gap vs the global mean, signed
    * ppm. Components quantize to integer milli BEFORE squaring (the
    * `embedding_norm_stats` staging — exact integers end-to-end, no
    * sqrt in the contract); 1-row global broadcast.
    */
  val embeddingLabelNormGap: Q = (s, d) => {
    val n = Tables.t(s, d, "embeddings")
      .select(col("label").cast("long").as("label"),
        expr("""aggregate(transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)),
               |          0L, (acc, x) -> acc + x * x)""".stripMargin).as("nrm"))
    val byLabel = n.groupBy("label")
      .agg(cnt.as("n_vecs"), sum("nrm").cast("long").as("snrm"))
    val g = byLabel.agg(sum("n_vecs").cast("long").as("tn"),
                        sum("snrm").cast("long").as("ts"))
    byLabel.crossJoin(broadcast(g))
      .select(col("label"), col("n_vecs"),
        expr("div(snrm, n_vecs)").cast("long").as("mean_sqnorm_milli2"),
        expr("cast(div((cast(snrm as decimal(38,0)) * tn - cast(ts as decimal(38,0)) * n_vecs) " +
             "* 1000000, cast(ts as decimal(38,0)) * n_vecs) as bigint)")
          .as("gap_ppm"))
      .orderBy("label")
  }

  /** First-token census per language: the most common document OPENING
    * tokens — boilerplate/template detection (`dedup_prefix_hash`'s
    * readable face). Top 30, deterministic order.
    */
  val textFirstTokenCensus: Q = (s, d) =>
    docs(s, d)
      .select(col("lang"), split(col("text"), " ").getItem(0).as("first_token"))
      .groupBy("lang", "first_token")
      .agg(cnt.as("n_docs"))
      .orderBy(col("n_docs").desc, col("lang"), col("first_token"))
      .limit(30)

  val queries: Map[String, Q] = Map(
    "li_discount_tax_interaction" -> liDiscountTaxInteraction,
    "orders_first_order_value_cohort" -> ordersFirstOrderValueCohort,
    "events_value_dispersion" -> eventsValueDispersion,
    "part_brand_size_span" -> partBrandSizeSpan,
    "customer_nation_segment_mix" -> customerNationSegmentMix,
    "ts_quarter_growth_yoy" -> tsQuarterGrowthYoy,
    "dq_status_consistency" -> dqStatusConsistency,
    "expr_date_boundaries" -> exprDateBoundaries,
    "customer_acquisition_monthly" -> customerAcquisitionMonthly,
    "part_type_brand_hhi" -> partTypeBrandHhi,
    "dq_clock_uniformity" -> dqClockUniformity,
    "orders_priority_value_quartiles" -> ordersPriorityValueQuartiles,
    "li_qty_return_rate" -> liQtyReturnRate,
    "dq_same_day_orders" -> dqSameDayOrders,
    "embedding_label_norm_gap" -> embeddingLabelNormGap,
    "text_first_token_census" -> textFirstTokenCensus,
  )
}
