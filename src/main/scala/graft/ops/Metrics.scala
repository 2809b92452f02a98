package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.vec_dot
import graft.tables.Tables
import Util._

/** Round-11 additions (SURVEY §2.15): distribution-comparison
  * statistics (KS, χ², profile cosine), pricing/discount
  * reconciliation audits, systematic sampling, corpus budget deciles,
  * embedding drift, and the GROUP BY ALL SQL face. All integer-exact
  * per §2.1 (cents / basis points / ppm via truncating `div`,
  * DECIMAL(38) staging where intermediates exceed 2⁶³); every global
  * ranking/prefix-sum rides the bucket-parallel [[Scale]] machinery.
  */
object Metrics {

  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")

  /** Line-price vs catalog reconciliation: per ship-year census of
    * lines priced below / at / above `quantity × retail`, with the
    * summed signed deviation in cents. One fact⋈dimension equi-join
    * (part broadcasts at bench scale; hash-shuffles co-partitioned at
    * 100 TB) + one keyed aggregate — the pricing-policy audit next to
    * `dq_order_total_recon`'s invoice arithmetic.
    */
  val reconUnitPriceVsRetail: Q = (s, d) =>
    li(s, d)
      .join(Tables.t(s, d, "part").select(col("p_partkey"), col("p_retailprice")),
            col("l_partkey") === col("p_partkey"))
      .select(year(col("l_shipdate")).cast("long").as("yr"),
              (cents(col("l_extendedprice")) -
                round(col("l_quantity") * col("p_retailprice") * 100).cast("long"))
                .as("dev"))
      .withColumn("bucket",
        when(col("dev") < 0, "a_below")
          .when(col("dev") === 0, "b_at").otherwise("c_above"))
      .groupBy("yr", "bucket")
      .agg(cnt.as("n_lines"), sum("dev").cast("long").as("dev_cents"))
      .orderBy("yr", "bucket")

  /** Exact two-sample Kolmogorov–Smirnov statistic (ppm) between the
    * weekday and weekend purchase-value distributions. D = max over
    * value levels of |F_wd − F_we| is computed integer-exactly as
    * max |cum_wd·n_we − cum_we·n_wd| · 10⁶ div (n_wd·n_we); the
    * cumulative runs through [[Scale.globalPrefixSum]] (bucket-parallel
    * — value levels never single-partition), and the only centralized
    * rows are the 1-row totals broadcast and the 1-row final max.
    */
  val mlKsWeekdayWeekend: Q = (s, d) => {
    val p = ev(s, d).filter(col("event_type") === "purchase")
      .select(cents(col("value")).as("v"),
              when(dayofweek(col("ts")).isin(1, 7), 1L).otherwise(0L).as("we"))
    val g = p.groupBy("v")
      .agg(sum(lit(1L) - col("we")).as("cw"), sum("we").as("ce"))
    val tot = p.agg(sum(lit(1L) - col("we")).cast("long").as("nw"),
                    sum("we").cast("long").as("ne"))
    val diffs = g.crossJoin(broadcast(tot))
      .select(col("v"), (col("cw") * col("ne") - col("ce") * col("nw")).as("dv"),
              col("nw"), col("ne"))
    Scale.globalPrefixSum(diffs, expr("div(v, 2000)"), Seq(col("v")), col("dv"))
      .agg(max("nw").as("nw"), max("ne").as("ne"),
           max(abs(col("__ps"))).as("dmax"))
      .select(col("nw").as("n_weekday"), col("ne").as("n_weekend"),
              expr("div(dmax * 1000000, nw * ne)").cast("long").as("ks_ppm"))
  }

  /** Embedding drift per label: squared distance between the label's
    * centroid and the global centroid over fixed-scale quantized
    * values (floor(x·1000+0.5), the `embedding_dim_variance`
    * convention), emitted as Σ_d (μ_l,d − μ_g,d)²·10⁶ in milli² units
    * via one staged DECIMAL(38) division — integer-exact on both
    * engines. One posexplode + two keyed aggregates + a 64-row
    * broadcast join; nothing is ever label²- or dim²-sized.
    */
  val embeddingCentroidShift: Q = (s, d) => {
    val q = Tables.t(s, d, "embeddings")
      .select(col("label").cast("long").as("lab"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast("double") * 1000.0 + 0.5).cast("long")))
          .as(Seq("dim", "q")))
    val perLab = q.groupBy("lab", "dim")
      .agg(sum("q").cast("long").as("sl"), cnt.as("nl"))
    val glob = q.groupBy("dim")
      .agg(sum("q").cast("long").as("sg"), cnt.as("ng"))
    perLab.join(broadcast(glob), "dim")
      .select(col("lab"), col("nl"), col("ng"),
        expr("cast(sl as decimal(38,0)) * ng - cast(sg as decimal(38,0)) * nl").as("num"))
      .groupBy("lab")
      .agg(max("nl").cast("long").as("n_vecs"), max("ng").as("ng2"),
           sum(expr("num * num")).as("dist2"))
      .select(col("lab"), col("n_vecs"),
        expr("cast(div(dist2 * 1000000, cast(n_vecs as decimal(38,0)) * n_vecs * ng2 * ng2) as bigint)")
          .as("shift2_micro"))
      .orderBy("lab")
  }

  /** Systematic (every-k-th) sampling in deterministic md5 order — the
    * interval-sampling sibling of `sample_reservoir_group` /
    * `sample_stratified` / `sample_weighted`: rows rank globally by
    * md5(doc_id) via the bucket-parallel [[Scale.globalRank]] (coarse
    * bucket = first hash byte, 256 buckets) and every 20th rank is
    * kept. RNG-free and reshuffle-stable like the other samplers; no
    * single-partition sort at any scale.
    */
  val sampleSystematic: Q = (s, d) => {
    val keyed = Tables.t(s, d, "documents").select(col("doc_id"))
      .withColumn("k", md5(col("doc_id").cast("string")))
    Scale.globalRank(keyed,
        expr("conv(substring(k, 1, 2), 16, 10)").cast("long"),
        Seq(col("k"), col("doc_id")))
      .filter(col("__rn") % 20 === 1)
      .select(col("doc_id"), col("__rn").as("rn"))
      .orderBy("rn")
      .limit(2000)
  }

  /** Pairwise similarity of event types' hour-of-day activity
    * profiles: cos²·10⁶ between the 24-dim count vectors, computed
    * integer-exactly as (Σ_h c_a·c_b)²·10⁶ div (Σc_a²·Σc_b²) in
    * DECIMAL(38). The profile table is (types×24) rows — everything
    * after the first keyed aggregate is bounded and broadcast.
    */
  val eventsTypeHourCosine: Q = (s, d) => {
    val c = ev(s, d)
      .groupBy(col("event_type").as("t"), hour(col("ts")).as("h"))
      .agg(cnt.as("c"))
    val dots = c.select(col("t").as("ta"), col("h"), col("c").as("ca"))
      .join(c.select(col("t").as("tb"), col("h"), col("c").as("cb")), Seq("h"))
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb")
      .agg(sum(expr("cast(ca as decimal(38,0)) * cb")).as("dot"))
    val norms = c.groupBy("t").agg(sum(expr("cast(c as decimal(38,0)) * c")).as("n2"))
    dots
      .join(broadcast(norms.select(col("t").as("ta"), col("n2").as("na2"))), "ta")
      .join(broadcast(norms.select(col("t").as("tb"), col("n2").as("nb2"))), "tb")
      .select(col("ta"), col("tb"),
        expr("cast(div(dot * dot * 1000000, na2 * nb2) as bigint)").as("cos2_ppm"))
      .orderBy("ta", "tb")
  }

  /** Pearson χ² test of independence for order priority × status —
    * the declared statistic is the integer-exact per-cell sum
    * Σ ((O·N − R·C)²·10⁶ div (N·R·C)) over the FULL contingency grid
    * (absent combinations count as O = 0), staged in DECIMAL(38).
    * Marginals are two keyed aggregates; the grid is a bounded
    * (priorities × statuses) broadcast cross — never data-sized.
    */
  val mlChi2PriorityStatus: Q = (s, d) => {
    val o = Tables.t(s, d, "orders")
      .select(col("o_orderpriority").as("pr"), col("o_orderstatus").as("st"))
    val cells = o.groupBy("pr", "st").agg(cnt.as("n"))
    val rowsM = o.groupBy("pr").agg(cnt.as("r"))
    val colsM = o.groupBy("st").agg(cnt.as("c"))
    val tot = o.agg(cnt.as("nn"))
    rowsM.crossJoin(broadcast(colsM))
      .join(cells, Seq("pr", "st"), "left")
      .withColumn("nij", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("nn"),
        expr("cast(div((cast(nij as decimal(38,0)) * nn - cast(r as decimal(38,0)) * c) * " +
          "(cast(nij as decimal(38,0)) * nn - cast(r as decimal(38,0)) * c) * 1000000, " +
          "cast(nn as decimal(38,0)) * r * c) as bigint)").as("term"))
      .agg(sum("term").cast("long").as("chi2_ppm"), cnt.as("n_cells"),
           max("nn").cast("long").as("n"))
  }

  /** Local-maximum detection on the daily purchase-revenue series: a
    * day is a peak iff its revenue strictly exceeds every revenue in
    * the 3 rows before and after (series edges compare against the
    * rows that exist). The series is the bounded day domain — the
    * global-order window ranges over ~30 rows, the `ts_sma_crossover`
    * pattern, never over event-sized data.
    */
  val tsPeakDays: Q = (s, d) => {
    val daily = ev(s, d).filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("dd"))
      .agg(sumCents(col("value")).as("rev_cents"))
    val w = Window.orderBy("dd")
    daily
      .withColumn("mxp", max("rev_cents").over(w.rowsBetween(-3, -1)))
      .withColumn("mxn", max("rev_cents").over(w.rowsBetween(1, 3)))
      .select(col("dd").cast("string").as("dd"), col("rev_cents"),
        when(col("rev_cents") > coalesce(col("mxp"), lit(Long.MinValue)) &&
             col("rev_cents") > coalesce(col("mxn"), lit(Long.MinValue)), 1L)
          .otherwise(0L).as("is_peak"))
      .orderBy("dd")
  }

  /** Discount-policy audit per quantity band (1–10, 11–20, …): line
    * count, mean discount in basis points (truncating div — the
    * integer-exact declared statistic), and the zero-discount share in
    * ppm. Volume discounts should rise with the band; a flat profile
    * is the policy violation this surfaces. One keyed aggregate.
    */
  val dqDiscountBandAudit: Q = (s, d) =>
    li(s, d)
      .select(expr("div(cast(floor(l_quantity) as bigint) - 1, 10)").as("qty_band"),
              round(col("l_discount") * 10000).cast("long").as("bp"))
      .groupBy("qty_band")
      .agg(cnt.as("n_lines"),
           expr("div(sum(bp), count(1))").cast("long").as("avg_disc_bp"),
           expr("div(sum(case when bp = 0 then 1 else 0 end) * 1000000, count(1))")
             .cast("long").as("zero_disc_ppm"))
      .orderBy("qty_band")

  /** Token-budget curve of the corpus by document-length decile: how
    * many documents and tokens each n_chars decile contributes — the
    * "what does the top X% buy me" planning number for corpus
    * selection. Rides [[Scale.globalNtileCensus]]: interior length
    * buckets aggregate without per-row ranking; only tile-boundary
    * buckets window. The aggregate-pushdown ntile's first consumer
    * beyond `win_ntile`.
    */
  val corpusLengthTokenDeciles: Q = (s, d) => {
    val docs = Tables.t(s, d, "documents")
      .select(col("doc_id"), col("n_chars"),
              size(split(col("text"), " ")).cast("long").as("toks"))
    Scale.globalNtileCensus(docs, 10,
        expr("div(n_chars, 20)"), Seq(col("n_chars"), col("doc_id")),
        aggs = Seq(cnt.as("n_docs"), sum("toks").cast("long").as("tokens"),
                   min("n_chars").cast("long").as("min_chars")))
      .select(col("__tile").as("decile"), col("n_docs"), col("tokens"),
              col("min_chars"))
      .orderBy("decile")
  }

  /** The GROUP BY ALL SQL surface (Spark 3.4+ grammar; DuckDB shares
    * it — the oracle states the explicit column list, semantics being
    * the contract as with `sql_pivot_syntax`).
    */
  val sqlGroupByAll: Q = (s, d) =>
    Tables.sql(s, d,
      """SELECT l_returnflag, l_linestatus, CAST(count(1) AS BIGINT) n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) rev_cents
        |FROM lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus""".stripMargin)

  /** Repeat-purchase share per month: an order is REPEAT iff its
    * customer has a strictly earlier order date (first-day ties stay
    * "first" — day granularity is the declared contract). One keyed
    * min-aggregate + equi-join + monthly census; linear, co-partitioned
    * on the customer key at any scale.
    */
  val ordersRepeatShareMonthly: Q = (s, d) => {
    val o = Tables.t(s, d, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("dt"))
    val first = o.groupBy("o_custkey").agg(min("dt").as("fd"))
    o.join(first, "o_custkey")
      .groupBy(expr("cast(year(dt) * 100 + month(dt) as bigint)").as("ym"))
      .agg(cnt.as("n_orders"),
           sum(when(col("dt") > col("fd"), 1L).otherwise(0L)).cast("long").as("n_repeat"))
      .withColumn("repeat_ppm", expr("div(n_repeat * 1000000, n_orders)").cast("long"))
      .orderBy("ym")
  }

  /** Mean time between failures per user: whole-second gaps between a
    * user's consecutive error events (lag over the user partition —
    * keyed, parallel), per-gap truncation THEN truncating mean, the
    * declared integer statistic. The reliability census beside
    * `events_fano_burstiness`'s all-event timing dispersion.
    */
  val eventsErrorMtbf: Q = (s, d) => {
    val e = ev(s, d).filter(col("event_type") === "error")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e.withColumn("prev", lag("us", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), expr("div(us - prev, 1000000)").as("gap_s"))
      .groupBy("user_id")
      .agg(cnt.as("n_gaps"),
           expr("div(sum(gap_s), count(1))").cast("long").as("mean_gap_s"),
           max("gap_s").cast("long").as("max_gap_s"))
      .orderBy("user_id")
  }

  /** Nearest-neighbor label purity — the clustering-quality EVAL: for
    * every 10th vector, does its exact cosine 1-NN share its label?
    * Purity ppm per label. Contract-quadratic by declaration (the
    * exact eval, like `sim_knn_per_query`); the serving path at scale
    * is `ann_ivf_topk`'s bucketed candidates.
    */
  val mlKnnLabelPurity: Q = (s, d) => {
    val e = Tables.t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label").cast("long").as("lab"))
      .withColumn("nrm", sqrt(vec_dot(col("embedding"), col("embedding"))))
    val qs = e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("q"), col("embedding").as("vq"),
              col("nrm").as("nq"), col("lab").as("ql"))
    val cs = e.select(col("vec_id").as("n"), col("embedding").as("vn"),
                      col("nrm").as("nn"), col("lab").as("nl"))
    val w = Window.partitionBy("q").orderBy(col("s").desc, col("n"))
    qs.join(cs, col("q") =!= col("n"))
      .withColumn("s", vec_dot(col("vq"), col("vn")) / (col("nq") * col("nn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("ql").as("lab"))
      .agg(cnt.as("n_queries"),
           sum(when(col("nl") === col("ql"), 1L).otherwise(0L)).cast("long").as("n_same"))
      .withColumn("purity_ppm", expr("div(n_same * 1000000, n_queries)").cast("long"))
      .orderBy("lab")
  }

  /** Winsorized vs raw daily mean purchase value: per day, values
    * clamp to the day's exact [p10, p90] (integer-cents percentile,
    * the `agg_percentiles` exactness pattern) before the truncating
    * mean — outlier-robust revenue tracking beside `ts_outlier_iqr`'s
    * flagging. Day-bounded percentile table broadcasts back.
    */
  val tsWinsorizedDailyMean: Q = (s, d) => {
    val p = ev(s, d).filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("dd"), cents(col("value")).as("v"))
    val bounds = p.groupBy("dd")
      .agg(round(expr("percentile(v, 0.1)")).cast("long").as("lo"),
           round(expr("percentile(v, 0.9)")).cast("long").as("hi"))
    p.join(broadcast(bounds), "dd")
      .select(col("dd"), col("v"),
              greatest(col("lo"), least(col("hi"), col("v"))).as("wv"))
      .groupBy("dd")
      .agg(cnt.as("n"),
           expr("div(sum(v), count(1))").cast("long").as("mean_cents"),
           expr("div(sum(wv), count(1))").cast("long").as("wins_mean_cents"))
      .select(col("dd").cast("string").as("dd"), col("n"),
              col("mean_cents"), col("wins_mean_cents"))
      .orderBy("dd")
  }

  /** Token-length profile per language: token count, mean length in
    * centi-chars (truncating div), and the ≥8-char long-token share in
    * ppm — the morphology-ish corpus diagnostic beside
    * `text_lang_stats`' document-level counts. One explode + keyed agg.
    */
  val textWordLengthProfile: Q = (s, d) =>
    Tables.t(s, d, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("lang")
      .agg(cnt.as("n_tokens"),
           expr("div(sum(length(tok)) * 100, count(1))").cast("long").as("avg_len_centi"),
           expr("div(sum(case when length(tok) >= 8 then 1 else 0 end) * 1000000, count(1))")
             .cast("long").as("long_tok_ppm"))
      .orderBy("lang")

  /** Per-type retail-price median vs the global median, signed gap in
    * ppm — exact integer-cents percentiles throughout; the global
    * median is a 1-row broadcast. Catalog pricing-structure audit
    * beside `part_brand_price_dispersion`'s within-brand variance.
    */
  val partTypePriceMedianGap: Q = (s, d) => {
    val p = Tables.t(s, d, "part")
      .select(col("p_type"), cents(col("p_retailprice")).as("c"))
    val med = p.groupBy("p_type")
      .agg(cnt.as("n_parts"), round(expr("percentile(c, 0.5)")).cast("long").as("med_cents"))
    val gmed = p.agg(round(expr("percentile(c, 0.5)")).cast("long").as("gmed"))
    med.crossJoin(broadcast(gmed))
      .select(col("p_type"), col("n_parts"), col("med_cents"),
              expr("div((med_cents - gmed) * 1000000, gmed)").cast("long").as("gap_ppm"))
      .orderBy("p_type")
  }

  /** Peak concurrent user-sessions per day — the capacity-planning
    * number: a user's session on a day is their [first, last] active
    * minute; the sweep turns sessions into +1/−1 deltas at the
    * boundary minutes and takes the max of the running sum. Fact rows
    * collapse to per-(user, day) bounds first; the cumulative window
    * partitions BY DAY (parallel, bounded ≤1440 minutes per
    * partition) — the keyed cousin of `orders_backlog_sweep`'s global
    * sweep, no single-partition exchange anywhere.
    */
  val eventsPeakConcurrencyDaily: Q = (s, d) => {
    val sess = ev(s, d)
      .select(to_date(col("ts")).as("dd"), col("user_id"),
              expr("div(unix_micros(ts), 60000000)").as("minute"))
      .groupBy("dd", "user_id")
      .agg(min("minute").as("mn"), max("minute").as("mx"))
    val deltas = sess
      .select(col("dd"), explode(array(
        struct(col("mn").as("m"), lit(1L).as("delta")),
        struct((col("mx") + 1).as("m"), lit(-1L).as("delta")))).as("x"))
      .select(col("dd"), col("x.m").as("m"), col("x.delta").as("delta"))
      .groupBy("dd", "m").agg(sum("delta").as("delta"))
    val w = Window.partitionBy("dd").orderBy("m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("conc", sum("delta").over(w))
      .groupBy("dd")
      .agg(max("conc").cast("long").as("peak_concurrent"))
      .join(sess.groupBy("dd").agg(cnt.as("n_sessions")), "dd")
      .select(col("dd").cast("string").as("dd"), col("n_sessions"),
              col("peak_concurrent"))
      .orderBy("dd")
  }

  /** Foreign-key fan-out profile — the data-modeling staple: for each
    * declared parent→child relation, the min / truncating-mean (in
    * centi-units) / max children per parent over parents that HAVE
    * children (orphan-side coverage is `dq_referential_orphans`). Two
    * keyed aggregates unioned; relation names sort the output.
    */
  val dqFkFanoutProfile: Q = (s, d) => {
    def profile(rel: String, child: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      child.groupBy("pk").agg(cnt.as("c"))
        .agg(lit(rel).as("relation"), cnt.as("n_parents"),
             min("c").cast("long").as("min_fanout"),
             expr("div(sum(c) * 100, count(1))").cast("long").as("avg_fanout_centi"),
             max("c").cast("long").as("max_fanout"))
    val o = Tables.t(s, d, "orders").select(col("o_custkey").as("pk"))
    val l = li(s, d).select(col("l_orderkey").as("pk"))
    profile("customer->orders", o).unionByName(profile("orders->lineitem", l))
      .orderBy("relation")
  }

  /** Weekly revenue volatility: per ISO-ish week (year, week-of-year
    * is engine-divergent — the declared key is day-epoch div 7, an
    * absolute 7-day grid), exact integer variance of the daily
    * purchase cents series: (n·Σx² − (Σx)²) div n² in DECIMAL(38) —
    * the dispersion companion to `ts_dow_seasonality`'s means.
    */
  val tsRevenueVolatilityWeekly: Q = (s, d) =>
    ev(s, d).filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("dd"))
      .agg(sumCents(col("value")).as("x"))
      .groupBy(expr("div(datediff(dd, date'1970-01-01'), 7)").as("wk"))
      .agg(cnt.as("n_days"), sum("x").cast("long").as("week_cents"),
           expr("cast(div(count(1) * sum(cast(x as decimal(38,0)) * x) - " +
             "cast(sum(x) as decimal(38,0)) * sum(x), " +
             "cast(count(1) as decimal(38,0)) * count(1)) as bigint)").as("day_var_cents2"))
      .orderBy("wk")

  /** New-vs-returning users per day: a user's first-ever active day is
    * NEW, every later active day RETURNING — the acquisition-mix
    * dashboard line beside `events_dau_wau`'s volume counts. Keyed
    * min-aggregate + equi-join, user-co-partitioned.
    */
  val eventsNewVsReturningDaily: Q = (s, d) => {
    val a = ev(s, d).select(col("user_id"), to_date(col("ts")).as("dd")).distinct()
    val first = a.groupBy("user_id").agg(min("dd").as("fd"))
    a.join(first, "user_id")
      .groupBy("dd")
      .agg(sum(when(col("dd") === col("fd"), 1L).otherwise(0L)).cast("long").as("new_users"),
           sum(when(col("dd") > col("fd"), 1L).otherwise(0L)).cast("long").as("returning_users"))
      .select(col("dd").cast("string").as("dd"), col("new_users"), col("returning_users"))
      .orderBy("dd")
  }

  /** Customer engagement-breadth histogram: distinct active order
    * months per customer, then the census of customers by that count —
    * two keyed aggregates, the loyalty-depth profile beside
    * `customer_rfm`'s value deciles.
    */
  val customerActiveMonthsHistogram: Q = (s, d) =>
    Tables.t(s, d, "orders")
      .select(col("o_custkey"),
              expr("cast(year(o_orderdate) * 100 + month(o_orderdate) as bigint)").as("ym"))
      .distinct()
      .groupBy("o_custkey").agg(cnt.as("m"))
      .groupBy(col("m").as("active_months"))
      .agg(cnt.as("n_customers"))
      .orderBy("active_months")

  /** Order-status vs line-status consistency matrix — the lifecycle
    * referential audit: TPC-H declares o_orderstatus F iff every line
    * is F, O iff every line is O, P otherwise; this emits the full
    * (status × derived-line-profile) census with the consistency flag,
    * so a drifted ETL shows up as mass on an inconsistent cell. One
    * keyed aggregate + equi-join.
    */
  val reconOrderLifecycle: Q = (s, d) => {
    val prof = li(s, d)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("nf"),
           cnt.as("nl"))
      .select(col("ok"),
        when(col("nf") === col("nl"), "all_F")
          .when(col("nf") === 0, "all_O").otherwise("mixed").as("profile"))
    Tables.t(s, d, "orders")
      .select(col("o_orderkey").as("ok"), col("o_orderstatus").as("status"))
      .join(prof, Seq("ok"), "left")
      .withColumn("profile", coalesce(col("profile"), lit("no_lines")))
      .groupBy("status", "profile")
      .agg(cnt.as("n_orders"))
      .withColumn("is_consistent",
        when(col("status") === "F" && col("profile") === "all_F", 1L)
          .when(col("status") === "O" && col("profile") === "all_O", 1L)
          .when(col("status") === "P" && col("profile") === "mixed", 1L)
          .otherwise(0L))
      .orderBy("status", "profile")
  }

  /** Round-number bias in order totals — the pricing-data forensic
    * beside `dq_benford_first_digit`: per status, the ppm share of
    * totals landing on exact cents-00 and exact $100 multiples
    * (uniform expectations: 10,000 / 10 ppm — heavy excess means
    * hand-entered or synthesized amounts).
    */
  val ordersPriceRoundBias: Q = (s, d) =>
    Tables.t(s, d, "orders")
      .select(col("o_orderstatus").as("status"), cents(col("o_totalprice")).as("c"))
      .groupBy("status")
      .agg(cnt.as("n_orders"),
           expr("div(sum(case when c % 100 = 0 then 1 else 0 end) * 1000000, count(1))")
             .cast("long").as("cents00_ppm"),
           expr("div(sum(case when c % 10000 = 0 then 1 else 0 end) * 1000000, count(1))")
             .cast("long").as("dollar100_ppm"))
      .orderBy("status")

  /** Share-of-wallet by market segment: each segment's slice of total
    * account balance vs its slice of order revenue (both ppm, signed
    * cents kept exact) — the mix question "does balance concentration
    * match spend concentration". Totals are a 1-row broadcast; the
    * segment table is bounded.
    */
  val segmentWalletShare: Q = (s, d) => {
    val c = Tables.t(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"),
              cents(col("c_acctbal")).as("bal"))
    val rev = Tables.t(s, d, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sumCents(col("o_totalprice")).as("rev"))
    val seg = c.join(rev, Seq("c_custkey"), "left")
      .groupBy("segment")
      .agg(cnt.as("n_customers"), sum("bal").cast("long").as("bal_cents"),
           sum(coalesce(col("rev"), lit(0L))).cast("long").as("rev_cents"))
    val tot = seg.agg(sum("bal_cents").cast("long").as("tb"),
                      sum("rev_cents").cast("long").as("tr"))
    seg.crossJoin(broadcast(tot))
      .select(col("segment"), col("n_customers"), col("bal_cents"), col("rev_cents"),
        expr("div(bal_cents * 1000000, tb)").cast("long").as("bal_share_ppm"),
        expr("div(rev_cents * 1000000, tr)").cast("long").as("rev_share_ppm"))
      .orderBy("segment")
  }

  /** Peak activity hour per event type, first vs second half of the
    * month, and the signed shift — the load-pattern drift check
    * beside `events_heatmap_dow_hour`'s static matrix. Ties break to
    * the LATER hour via lexicographic (count, hour) max; the profile
    * table is bounded at types × 24 × 2.
    */
  val eventsPeakHourShift: Q = (s, d) => {
    val h = ev(s, d)
      .groupBy(col("event_type").as("t"),
               when(dayofmonth(col("ts")) <= 15, "h1").otherwise("h2").as("half"),
               hour(col("ts")).cast("long").as("h"))
      .agg(cnt.as("c"))
      .groupBy("t", "half")
      .agg(max(struct(col("c"), col("h"))).getField("h").as("peak"))
    h.filter(col("half") === "h1").select(col("t"), col("peak").as("peak_h1"))
      .join(h.filter(col("half") === "h2").select(col("t"), col("peak").as("peak_h2")), "t")
      .select(col("t"), col("peak_h1"), col("peak_h2"),
              (col("peak_h2") - col("peak_h1")).as("shift_hours"))
      .orderBy("t")
  }

  val queries: Map[String, Q] = Map(
    "events_peak_concurrency_daily" -> eventsPeakConcurrencyDaily,
    "recon_order_lifecycle" -> reconOrderLifecycle,
    "orders_price_round_bias" -> ordersPriceRoundBias,
    "segment_wallet_share" -> segmentWalletShare,
    "events_peak_hour_shift" -> eventsPeakHourShift,
    "dq_fk_fanout_profile" -> dqFkFanoutProfile,
    "ts_revenue_volatility_weekly" -> tsRevenueVolatilityWeekly,
    "events_new_vs_returning_daily" -> eventsNewVsReturningDaily,
    "customer_active_months_histogram" -> customerActiveMonthsHistogram,
    "orders_repeat_share_monthly" -> ordersRepeatShareMonthly,
    "events_error_mtbf" -> eventsErrorMtbf,
    "ml_knn_label_purity" -> mlKnnLabelPurity,
    "ts_winsorized_daily_mean" -> tsWinsorizedDailyMean,
    "text_word_length_profile" -> textWordLengthProfile,
    "part_type_price_median_gap" -> partTypePriceMedianGap,
    "recon_unit_price_vs_retail" -> reconUnitPriceVsRetail,
    "ml_ks_weekday_weekend" -> mlKsWeekdayWeekend,
    "embedding_centroid_shift" -> embeddingCentroidShift,
    "sample_systematic" -> sampleSystematic,
    "events_type_hour_cosine" -> eventsTypeHourCosine,
    "ml_chi2_priority_status" -> mlChi2PriorityStatus,
    "ts_peak_days" -> tsPeakDays,
    "dq_discount_band_audit" -> dqDiscountBandAudit,
    "corpus_length_token_deciles" -> corpusLengthTokenDeciles,
    "sql_group_by_all" -> sqlGroupByAll,
  )
}
