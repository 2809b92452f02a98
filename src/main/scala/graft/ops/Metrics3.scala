package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-13 additions (SURVEY §2.17): gaps-and-islands, exact
  * variance-band anomaly days, stopword density, the nation×nation
  * trade matrix, inter-arrival and value-delta profiles, token
  * frequency over part names, discount leakage, tenure-value curves,
  * up/down run audits, per-group exact quartiles (the explicit
  * ceil-rank contract — engine-identical by construction), embedding
  * sign/argmax profiles, population drift bins, the VALUES-lookup SQL
  * surface, hour-profile L1 drift, priority transition matrices, top
  * minutes, weekend ratios, size×price heat, name-key consistency,
  * a second Spearman (supplier volume vs balance), order-span
  * quartiles, and line-number profiles. All integer-exact per §2.1
  * (cents / bp / ppm via truncating `div`); global scalars ride the
  * 1-row broadcast pattern; windows partition on keys or bounded
  * domains only.
  */
object Metrics3 {

  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def orders(s: SparkSession, d: String) = Tables.t(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.t(s, d, "customer")
  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  /** Gaps-and-islands over each customer's active ORDER MONTHS: an
    * island is a maximal run of consecutive months with ≥1 order. The
    * classic retention shape (streaks, churn-and-return) as pure
    * windows: month grid = year×12+month (no week-of-year — engine
    * divergent), break flag via lag, island id via running sum — all
    * partitioned by customer, parallel at any scale.
    */
  val winGapsIslands: Q = (s, d) => {
    val o = orders(s, d).select(col("o_custkey").as("ck"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m"))
      .distinct()
    val w = Window.partitionBy("ck").orderBy("m")
    val isl = o
      .withColumn("brk",
        when(lag("m", 1).over(w).isNull ||
             col("m") - lag("m", 1).over(w) =!= 1L, 1L).otherwise(0L))
      .withColumn("isl", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy("ck", "isl").agg(cnt.as("len"))
      .groupBy("ck")
      .agg(max("isl").cast("long").as("n_islands"),
           max("len").cast("long").as("longest_run"),
           sum("len").cast("long").as("n_months"))
      .orderBy(col("longest_run").desc, col("ck")).limit(1000)
  }

  /** Days whose event count sits outside the ±2σ band — with the
    * entire test in EXACT integer arithmetic: (N·n − S)² > 4·(N·SS − S²)
    * is (n − mean)² > 4·var scaled by N², so no engine ever divides or
    * roots. Squares ride decimal(38)/HUGEINT — at 100 TB daily counts
    * the int128 headroom is what keeps the audit exact. One daily agg +
    * a 1-row moment broadcast.
    */
  val eventsAnomalyDaily: Q = (s, d) => {
    val daily = ev(s, d).groupBy(to_date(col("ts")).as("dd")).agg(cnt.as("n"))
    // ss rides decimal(38,0) END TO END: summing LongType n*n wraps
    // silently (non-ANSI) once a day's count passes ~3.04e9 — the
    // decimal cast happens BEFORE the square so the promise in the
    // scaladoc is real, matching the oracle's HUGEINT ss
    val g = daily.agg(cnt.as("nd"), sum("n").cast("long").as("sn"),
                      sum(col("n").cast("decimal(38,0)") * col("n")).as("ss"))
    daily.crossJoin(broadcast(g))
      .withColumn("is_outlier",
        when(expr("cast(nd * n - sn as decimal(38,0)) * (nd * n - sn) > " +
                  "4 * (cast(nd as decimal(38,0)) * ss - cast(sn as decimal(38,0)) * sn)"),
             1L).otherwise(0L))
      .select(col("dd").cast("string").as("dd"), col("n"), col("is_outlier"))
      .orderBy("dd")
  }

  /** Stopword density per source: function-word hits per million
    * tokens — the fastest "is this prose or a token dump?" quality
    * signal, and the one whose LOW values flag boilerplate/code. One
    * explode-free pass: `filter` the split array against the fixed
    * list, `size` both — linear, no shuffle beyond the source agg.
    */
  val textStopwordDensity: Q = (s, d) => {
    val stop = Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")
    docs(s, d)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        size(filter(split(col("text"), " "), t => t.isin(stop: _*)))
          .cast("long").as("hits"))
      .groupBy("source")
      .agg(cnt.as("n_docs"), sum("toks").cast("long").as("tokens"),
           sum("hits").cast("long").as("stop_hits"))
      .withColumn("stop_ppm", expr("div(stop_hits * 1000000, tokens)").cast("long"))
      .orderBy("source")
  }

  /** The supplier-nation × customer-nation revenue matrix with each
    * cell's share of its exporter row (ppm) — TPC-H Q7's two-nation
    * filter widened to the full bounded 25×25 domain. One fact shuffle
    * on orderkey; every dimension broadcasts; the row-share window
    * runs over the ≤625-row AGGREGATE, never the fact.
    */
  val nationTradeMatrix: Q = (s, d) => {
    val n = Tables.t(s, d, "nation")
    val sup = Tables.t(s, d, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cus = cust(s, d)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val flow = li(s, d)
      .join(orders(s, d).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
      .groupBy("supp_nation", "cust_nation")
      .agg(cnt.as("n_lines"), sumCents(col("l_extendedprice")).as("rev_cents"))
    flow.withColumn("row_share_ppm",
        expr("div(rev_cents * 1000000, sum(rev_cents) over (partition by supp_nation))")
          .cast("long"))
      .orderBy("supp_nation", "cust_nation")
  }

  /** Histogram of per-customer inter-order gaps in whole weeks: the
    * purchase-cadence curve (reorder cycles show as modes). Gap = day
    * difference of consecutive order DATES per customer (ties broken
    * by orderkey); one keyed window + a bounded-bucket agg.
    */
  val ordersInterarrivalGaps: Q = (s, d) => {
    val o = orders(s, d).select(col("o_custkey").as("ck"),
      to_date(col("o_orderdate")).as("dt"), col("o_orderkey").as("ok"))
    val w = Window.partitionBy("ck").orderBy("dt", "ok")
    o.withColumn("gap", datediff(col("dt"), lag("dt", 1).over(w)).cast("long"))
      .filter(col("gap").isNotNull)
      .groupBy(expr("div(gap, 7)").as("gap_weeks"))
      .agg(cnt.as("n_gaps"), countDistinct("ck").cast("long").as("n_customers"),
           expr("div(sum(gap), count(1))").cast("long").as("avg_gap_days"))
      .orderBy("gap_weeks")
  }

  /** Histogram of consecutive-order VALUE deltas per customer: is the
    * next basket bigger or smaller, and by how much. Bucket width is a
    * power of two over integer cents (2²⁰ ≈ \$10.5k) so `floor(c/2²⁰)`
    * is FP-exact and negative deltas floor identically on both
    * engines. One keyed window + bounded-bucket agg.
    */
  val ordersValueDeltaBuckets: Q = (s, d) => {
    val o = orders(s, d).select(col("o_custkey").as("ck"),
      to_date(col("o_orderdate")).as("dt"), col("o_orderkey").as("ok"),
      cents(col("o_totalprice")).as("c"))
    val w = Window.partitionBy("ck").orderBy("dt", "ok")
    o.withColumn("delta", col("c") - lag("c", 1).over(w))
      .filter(col("delta").isNotNull)
      .groupBy(floor(col("delta") / 1048576.0).cast("long").as("bucket"))
      .agg(cnt.as("n_pairs"), sum("delta").cast("long").as("sum_delta_cents"))
      .orderBy("bucket")
  }

  /** Token frequency over part NAMES with brand spread: which words
    * the catalog is made of and how many brands share each — the
    * catalog-vocabulary profile. Explode + agg, top 50, fully
    * deterministic order.
    */
  val partNameTokenFreq: Q = (s, d) =>
    Tables.t(s, d, "part")
      .select(explode(split(col("p_name"), " ")).as("token"),
              col("p_brand"), cents(col("p_retailprice")).as("rc"))
      .groupBy("token")
      .agg(cnt.as("n_parts"), countDistinct("p_brand").cast("long").as("n_brands"),
           expr("div(sum(rc), count(1))").cast("long").as("avg_retail_cents"))
      .orderBy(col("n_parts").desc, col("token")).limit(50)

  /** Discount leakage by supplier nation: gross revenue, the discount
    * amount given away, and leakage in ppm of gross — the pricing-
    * policy audit a revenue team runs per geography. Per-row
    * `round(e·d·100)` keeps the discount amount integer-exact; one
    * fact pass, dims broadcast.
    */
  val supplierDiscountLeakage: Q = (s, d) => {
    val sup = Tables.t(s, d, "supplier")
      .join(broadcast(Tables.t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    li(s, d).join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy("nation")
      .agg(cnt.as("n_lines"),
           sumCents(col("l_extendedprice")).as("gross_cents"),
           sum(cents(col("l_extendedprice") * col("l_discount")))
             .cast("long").as("discount_cents"))
      .withColumn("leakage_ppm",
        expr("div(discount_cents * 1000000, gross_cents)").cast("long"))
      .orderBy("nation")
  }

  /** Tenure-vs-value curve: users bucketed by active-span days (first
    * to last event), each bucket's population and purchase revenue —
    * does engagement length buy revenue. One keyed agg to user grain,
    * then a bounded-bucket census.
    */
  val eventsUserTenureValue: Q = (s, d) =>
    ev(s, d)
      .groupBy(col("user_id"))
      .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
             .cast("long").as("tenure_days"),
           sum(when(col("event_type") === "purchase", cents(col("value")))
             .otherwise(0L)).cast("long").as("purch_cents"))
      .groupBy(col("tenure_days"))
      .agg(cnt.as("n_users"), sum("purch_cents").cast("long").as("purch_cents"),
           expr("div(sum(purch_cents), count(1))").cast("long").as("avg_cents"))
      .orderBy("tenure_days")

  /** Up/down RUN audit of daily order revenue, reported per year of
    * run start: run counts and the longest up / down streaks — the
    * randomness check behind `ts_record_highs` (too-long runs mean
    * trend or data fault). Fact collapses to the bounded day domain
    * first; the sign/run windows run over ~2.4k day rows (the
    * `ts_sma_crossover` allowlist class).
    */
  val tsRunsUpdown: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dd"))
      .agg(sumCents(col("o_totalprice")).as("rev"))
    val w = Window.orderBy("dd")
    val signed = daily
      .withColumn("prev", lag("rev", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("sign", when(col("rev") > col("prev"), 1L)
        .when(col("rev") < col("prev"), -1L).otherwise(0L))
    val runs = signed
      .withColumn("brk",
        when(lag("sign", 1).over(w).isNull ||
             col("sign") =!= lag("sign", 1).over(w), 1L).otherwise(0L))
      .withColumn("run_id", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("run_id")
      .agg(min("dd").as("start_dd"), min("sign").as("sign"), cnt.as("len"))
    runs.groupBy(year(col("start_dd")).cast("long").as("yr"))
      .agg(cnt.as("n_runs"),
           sum(when(col("sign") === 1L, 1L).otherwise(0L)).cast("long").as("n_up_runs"),
           sum(when(col("sign") === -1L, 1L).otherwise(0L)).cast("long").as("n_down_runs"),
           coalesce(max(when(col("sign") === 1L, col("len"))), lit(0L))
             .cast("long").as("longest_up"),
           coalesce(max(when(col("sign") === -1L, col("len"))), lit(0L))
             .cast("long").as("longest_down"))
      .orderBy("yr")
  }

  /** Exact quartiles + IQR outlier count of document length per
    * source. The quartile CONTRACT is explicit — the value at
    * row_number `ceil(q·n)` under (n_chars, doc_id) order — so both
    * engines compute the identical element with no interpolation-rule
    * coupling. Windows partition by source (parallel); outliers
    * counted against `2·x > 2·q3 + 3·iqr` (all-integer 1.5×IQR).
    */
  val corpusLengthOutliersBySource: Q = (s, d) => {
    val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    val ranked = docs(s, d).select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cn", count(lit(1)).over(Window.partitionBy("source")))
    val q = ranked.groupBy("source")
      .agg(cnt.as("n_docs"),
           max(when(col("rn") === expr("div(cn + 3, 4)"), col("n_chars")))
             .cast("long").as("q1"),
           max(when(col("rn") === expr("div(cn + 1, 2)"), col("n_chars")))
             .cast("long").as("med"),
           max(when(col("rn") === expr("div(3 * cn + 3, 4)"), col("n_chars")))
             .cast("long").as("q3"))
    docs(s, d).join(broadcast(q), "source")
      .groupBy(col("source"), col("n_docs"), col("q1"), col("med"), col("q3"))
      .agg(sum(when(col("n_chars") * 2 > col("q3") * 2 + (col("q3") - col("q1")) * 3, 1L)
        .otherwise(0L)).cast("long").as("n_outliers"))
      .orderBy("source")
  }

  /** Per-label sign profile of the first 16 embedding dimensions:
    * share of positive components in ppm — the cheapest "do labels
    * separate at all?" probe (a simhash-centroid reading). Posexplode
    * to a bounded labels×16 domain; float sign is exact.
    */
  val embeddingSignProfile: Q = (s, d) =>
    Tables.t(s, d, "embeddings")
      .select(col("label").cast("long").as("label"),
              posexplode(col("embedding")).as(Seq("pos", "v")))
      .filter(col("pos") < 16)
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(cnt.as("n"),
           sum(when(col("v") > 0f, 1L).otherwise(0L)).cast("long").as("n_pos"))
      .withColumn("pos_ppm", expr("div(n_pos * 1000000, n)").cast("long"))
      .orderBy("label", "pos")

  /** Argmax vector per embedding axis (first 16 dims): which document
    * maximizes each dimension — the axis-interpretation probe. NOT a
    * per-axis sort: `max(struct(v, −vec_id))` is a mergeable aggregate
    * (map-side combine, no window), the deterministic-argmax idiom.
    */
  val embeddingAxisExtremes: Q = (s, d) =>
    Tables.t(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .filter(col("pos") < 16)
      .select(col("pos").cast("long").as("pos"),
              col("v").cast("double").as("vd"), col("vec_id"))
      .groupBy("pos")
      .agg(max(struct(col("vd"), (-col("vec_id")).as("ni"))).as("m"))
      .select(col("pos"), (-col("m.ni")).cast("long").as("vec_id"),
              round(col("m.vd") * 1000000).cast("long").as("val_e6"))
      .orderBy("pos")

  /** Population drift of purchase values between the first and second
    * half of each month (day ≤ 15 vs rest), binned at \$100: per-bin
    * counts and the share drift in ppm — the feature-drift monitor's
    * exact-integer core (PSI's log ratio is deliberately NOT emitted;
    * the bin shares are the lossless part). 1-row totals broadcast.
    */
  val mlPopulationDriftBins: Q = (s, d) => {
    val e = ev(s, d).filter(col("event_type") === "purchase")
      .select(expr("div(cast(round(value * 100) as bigint), 10000)").as("band"),
              when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L).as("is_a"))
    val binned = e.groupBy("band")
      .agg(sum("is_a").cast("long").as("n_a"),
           sum(lit(1L) - col("is_a")).cast("long").as("n_b"))
    val tot = binned.agg(sum("n_a").cast("long").as("ta"),
                         sum("n_b").cast("long").as("tb"))
    binned.crossJoin(broadcast(tot))
      .withColumn("share_a_ppm", expr("div(n_a * 1000000, ta)").cast("long"))
      .withColumn("share_b_ppm", expr("div(n_b * 1000000, tb)").cast("long"))
      .withColumn("drift_ppm", abs(col("share_a_ppm") - col("share_b_ppm")))
      .select(col("band"), col("n_a"), col("n_b"),
              col("share_a_ppm"), col("share_b_ppm"), col("drift_ppm"))
      .orderBy("band")
  }

  /** The inline-VALUES lookup surface: a literal weight table joined
    * to the fact (broadcast by size) — the "small dim lives in the
    * query text" SQL idiom. Weighted revenue per order status.
    */
  val sqlValuesLookup: Q = (s, d) => {
    val sess = s
    import sess.implicits._
    val w = Seq(("1-URGENT", 5L), ("2-HIGH", 4L), ("3-MEDIUM", 3L),
                ("4-NOT SPECIFIED", 2L), ("5-LOW", 1L)).toDF("prio", "wt")
    orders(s, d).join(broadcast(w), col("o_orderpriority") === col("prio"))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(cnt.as("n_orders"),
           sum(col("wt") * cents(col("o_totalprice"))).cast("long")
             .as("weighted_cents"))
      .orderBy("status")
  }

  /** Per-day L1 distance between the day's hour-of-day profile and the
    * corpus-global one, in ppm — "which days behaved differently".
    * EXACT: |n_dh·N − N_h·n_d| cross-multiplies the shares. Missing
    * hours still contribute, so the day×24 grid is generated from the
    * bounded day domain; the global 24-row profile broadcasts.
    */
  val eventsHourShareDrift: Q = (s, d) => {
    val dh = ev(s, d).groupBy(to_date(col("ts")).as("dd"),
        hour(col("ts")).cast("long").as("h")).agg(cnt.as("n_dh"))
    val days = dh.groupBy("dd").agg(sum("n_dh").cast("long").as("n_d"))
    val hours = dh.groupBy("h").agg(sum("n_dh").cast("long").as("n_h"))
    val tot = hours.agg(sum("n_h").cast("long").as("nn"))
    val grid = days.select(col("dd"), col("n_d"),
        explode(sequence(lit(0L), lit(23L))).as("h"))
      .join(broadcast(hours), Seq("h"))
      .crossJoin(broadcast(tot))
      .join(dh, Seq("dd", "h"), "left")
      .withColumn("n_dh", coalesce(col("n_dh"), lit(0L)))
    grid.groupBy(col("dd"), col("n_d"), col("nn"))
      .agg(sum(abs(col("n_dh") * col("nn") - col("n_h") * col("n_d")))
        .cast("long").as("num"))
      .select(col("dd").cast("string").as("dd"), col("n_d"),
              expr("div(num * 1000000, n_d * nn)").cast("long").as("l1_ppm"))
      .orderBy("dd")
  }

  /** First→last order-priority transition matrix per customer: does
    * urgency escalate over a relationship. First/last are
    * deterministic struct-extreme argmins over (date, orderkey) —
    * mergeable aggregates, no window, 25-row output.
    */
  val ordersPriorityTransition: Q = (s, d) =>
    orders(s, d)
      .select(col("o_custkey").as("ck"),
              struct(to_date(col("o_orderdate")).as("dt"),
                     col("o_orderkey").as("ok"),
                     col("o_orderpriority").as("p")).as("st"))
      .groupBy("ck")
      .agg(min("st").getField("p").as("first_prio"),
           max("st").getField("p").as("last_prio"))
      .groupBy("first_prio", "last_prio")
      .agg(cnt.as("n_customers"))
      .orderBy("first_prio", "last_prio")

  /** Top 20 busiest minutes with traffic share in ppm — the burst
    * leaderboard (the all-types cousin of `events_error_burst_5m`).
    * Minute truncation + agg + 1-row total broadcast + TakeOrdered.
    */
  val eventsTopMinutes: Q = (s, d) => {
    val m = ev(s, d)
      .groupBy(date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm")
        .as("mm")).agg(cnt.as("n"))
    val tot = m.agg(sum("n").cast("long").as("nn"))
    m.crossJoin(broadcast(tot))
      .select(col("mm"), col("n"),
              expr("div(n * 1000000, nn)").cast("long").as("share_ppm"))
      .orderBy(col("n").desc, col("mm")).limit(20)
  }

  /** Weekend-vs-weekday shipped revenue per month, ratio in ppm — the
    * operating-calendar seasonality trend (`ts_dow_seasonality` gives
    * the static profile; this is its drift over months). Weekend
    * membership is a filter only, so the Spark-1(Sun)/ISO dow
    * divergence never reaches the output.
    */
  val tsWeekendRatioMonthly: Q = (s, d) =>
    li(s, d).select(
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("ym"),
        when(dayofweek(col("l_shipdate")).isin(1, 7), 1L).otherwise(0L).as("we"),
        cents(col("l_extendedprice")).as("c"))
      .groupBy("ym")
      .agg(sum(when(col("we") === 1L, col("c")).otherwise(0L))
             .cast("long").as("weekend_cents"),
           sum(when(col("we") === 0L, col("c")).otherwise(0L))
             .cast("long").as("weekday_cents"))
      .withColumn("ratio_ppm",
        expr("div(weekend_cents * 1000000, nullif(weekday_cents, 0))").cast("long"))
      .orderBy("ym")

  /** Part size × retail-price-band heat grid: catalog structure at a
    * glance. Band width 2¹⁴ cents is FP-exact; bounded two-key agg.
    */
  val partSizePriceHeat: Q = (s, d) =>
    Tables.t(s, d, "part")
      .select(col("p_size").cast("long").as("psize"),
              cents(col("p_retailprice")).as("rc"))
      .groupBy(col("psize"), expr("div(rc, 16384)").as("price_band"))
      .agg(cnt.as("n_parts"), sum("rc").cast("long").as("sum_retail_cents"))
      .orderBy("psize", "price_band")

  /** Name↔key consistency audit: does the digit payload of `c_name`
    * equal `c_custkey`, per segment — the surrogate-key/display-name
    * drift check (regexp_extract + exact compare; a NON-match is the
    * data fault). Linear single pass.
    */
  val dqNameKeyConsistency: Q = (s, d) =>
    cust(s, d)
      .select(col("c_mktsegment").as("segment"),
        (regexp_extract(col("c_name"), "Customer#([0-9]+)", 1).cast("long")
          === col("c_custkey")).as("ok"))
      .groupBy("segment")
      .agg(cnt.as("n_customers"),
           sum(when(col("ok"), 1L).otherwise(0L)).cast("long").as("n_match"),
           sum(when(col("ok"), 0L).otherwise(1L)).cast("long").as("n_mismatch"))
      .orderBy("segment")

  /** Spearman rank correlation between a supplier's shipped VOLUME and
    * its account BALANCE — "do big movers hold big balances". Same
    * declared semantics as `part_qty_price_spearman` (row_number ranks
    * with the pinned (value, key) tiebreak, ρ_ppm over decimal(38));
    * both rankings ride ONE bucket-parallel
    * [[Scale.globalRankFused]] pass — no single-partition sort.
    * Suppliers with no lineitems are excluded (inner join) — declared.
    */
  val supplierVolumeBalanceSpearman: Q = (s, d) => {
    val vol = li(s, d).groupBy(col("l_suppkey").as("sk"))
      .agg(sum(col("l_quantity").cast("long")).cast("long").as("vol"))
    val sup = Tables.t(s, d, "supplier")
      .select(col("s_suppkey").as("sk"), cents(col("s_acctbal")).as("bal_c"))
    val both = vol.join(broadcast(sup), "sk")
    graft.ops.Scale.globalRankFused(both, col("sk"), Seq(
        ("rv", floor(col("vol") / lit(100L)), col("vol")),
        ("rb", floor(col("bal_c") / lit(10000L)), col("bal_c"))))
      .agg(cnt.as("n_suppliers"),
           sum(expr("cast(rv - rb as decimal(38,0)) * (rv - rb)")).as("sd2"))
      .select(col("n_suppliers"),
        expr("cast(1000000 - div(6 * sd2 * 1000000, " +
          "cast(n_suppliers as decimal(38,0)) * n_suppliers * n_suppliers - n_suppliers) as bigint)")
          .as("spearman_ppm"))
  }

  /** Exact quartiles of customer ORDER SPAN (first→last order, days)
    * per market segment — how long relationships last, by segment.
    * Same explicit ceil-rank quartile contract as
    * `corpus_length_outliers_by_source`; windows partition by segment.
    */
  val customerOrderSpanQuartiles: Q = (s, d) => {
    val span = orders(s, d).groupBy(col("o_custkey").as("ck"))
      .agg(datediff(max(to_date(col("o_orderdate"))),
                    min(to_date(col("o_orderdate")))).cast("long").as("span"))
      .join(broadcast(cust(s, d).select(col("c_custkey").as("ck"),
        col("c_mktsegment").as("segment"))), "ck")
    val w = Window.partitionBy("segment").orderBy("span", "ck")
    span.withColumn("rn", row_number().over(w))
      .withColumn("cn", count(lit(1)).over(Window.partitionBy("segment")))
      .groupBy("segment")
      .agg(cnt.as("n_customers"),
           max(when(col("rn") === expr("div(cn + 3, 4)"), col("span")))
             .cast("long").as("q1_days"),
           max(when(col("rn") === expr("div(cn + 1, 2)"), col("span")))
             .cast("long").as("med_days"),
           max(when(col("rn") === expr("div(3 * cn + 3, 4)"), col("span")))
             .cast("long").as("q3_days"))
      .orderBy("segment")
  }

  /** Line-number profile: per position-in-order (l_linenumber), line
    * count, average quantity (×100) and average price — does position
    * in the order correlate with size. Bounded 7-row output, one pass.
    */
  val liLinenumberProfile: Q = (s, d) =>
    li(s, d)
      .select(col("l_linenumber").cast("long").as("ln"),
              floor(col("l_quantity")).cast("long").as("q"),
              cents(col("l_extendedprice")).as("c"))
      .groupBy("ln")
      .agg(cnt.as("n_lines"),
           expr("div(sum(q) * 100, count(1))").cast("long").as("avg_qty_x100"),
           expr("div(sum(c), count(1))").cast("long").as("avg_price_cents"))
      .orderBy("ln")

  val queries: Map[String, Q] = Map(
    "win_gaps_islands" -> winGapsIslands,
    "events_anomaly_daily" -> eventsAnomalyDaily,
    "text_stopword_density" -> textStopwordDensity,
    "nation_trade_matrix" -> nationTradeMatrix,
    "orders_interarrival_gaps" -> ordersInterarrivalGaps,
    "orders_value_delta_buckets" -> ordersValueDeltaBuckets,
    "part_name_token_freq" -> partNameTokenFreq,
    "supplier_discount_leakage" -> supplierDiscountLeakage,
    "events_user_tenure_value" -> eventsUserTenureValue,
    "ts_runs_updown" -> tsRunsUpdown,
    "corpus_length_outliers_by_source" -> corpusLengthOutliersBySource,
    "embedding_sign_profile" -> embeddingSignProfile,
    "embedding_axis_extremes" -> embeddingAxisExtremes,
    "ml_population_drift_bins" -> mlPopulationDriftBins,
    "sql_values_lookup" -> sqlValuesLookup,
    "events_hour_share_drift" -> eventsHourShareDrift,
    "orders_priority_transition" -> ordersPriorityTransition,
    "events_top_minutes" -> eventsTopMinutes,
    "ts_weekend_ratio_monthly" -> tsWeekendRatioMonthly,
    "part_size_price_heat" -> partSizePriceHeat,
    "dq_name_key_consistency" -> dqNameKeyConsistency,
    "supplier_volume_balance_spearman" -> supplierVolumeBalanceSpearman,
    "customer_order_span_quartiles" -> customerOrderSpanQuartiles,
    "li_linenumber_profile" -> liLinenumberProfile,
  )
}
