package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-12 additions (SURVEY §2.16): window/function SQL surface
  * (cume_dist/percent_rank, width_bucket, DISTINCT ON), record-day
  * detection, key-vs-time monotonicity audit, Brier calibration,
  * k-fold split census, bigram surprisal, fan-out histograms,
  * supplier latency, quadrant segmentation, log2 histograms,
  * month-over-month growth, label-affinity matrix, prefix dedup,
  * corpus mix matrices, and price indices. All integer-exact per §2.1
  * (cents / bp / ppm via truncating `div`); day/month-domain windows
  * only over bounded domains; global medians/totals ride the 1-row
  * broadcast pattern.
  */
object Metrics2 {

  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def orders(s: SparkSession, d: String) = Tables.t(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.t(s, d, "customer")
  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  /** The cume_dist / percent_rank window surface: each customer's
    * balance percentile INSIDE its market segment, ppm-floored. Both
    * functions are rank-ratio divisions — one IEEE division per row,
    * identical on both engines; ordering on integer cents keeps ties
    * engine-identical. Partitioned by segment: parallel, never a
    * global sort.
    */
  val winCumeDist: Q = (s, d) => {
    val c = cust(s, d).select(col("c_mktsegment").as("segment"),
      col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"))
    val w = Window.partitionBy("segment").orderBy("bal_cents")
    c.withColumn("cd_ppm", floor(cume_dist().over(w) * 1000000.0).cast("long"))
      .withColumn("pr_ppm", floor(percent_rank().over(w) * 1000000.0).cast("long"))
      .select(col("segment"), col("c_custkey"), col("bal_cents"),
              col("cd_ppm"), col("pr_ppm"))
      .orderBy("segment", "c_custkey").limit(2000)
  }

  /** The width_bucket SQL surface as an order-value histogram. Bounds
    * are chosen FP-exact: [0, 2²⁶) cents with 16 buckets gives a 2²²
    * width, so every division in either engine's formula is an exact
    * power-of-two scale and boundary cents land identically (the
    * oracle emulates with floor(c/2²²)+1 — algebraically equal and
    * step-for-step exact).
    */
  val exprWidthBucket: Q = (s, d) =>
    orders(s, d).select(cents(col("o_totalprice")).as("c"))
      .select(expr("width_bucket(c, 0, 67108864, 16)").as("bucket"), col("c"))
      .groupBy("bucket")
      .agg(cnt.as("n_orders"), sum("c").cast("long").as("sum_cents"))
      .orderBy("bucket")

  /** Record revenue days: purchase days whose daily cents strictly
    * exceed every prior day's — the running-all-time-high audit. Fact
    * collapses to the bounded day domain first; the cumulative max
    * window runs over ~hundreds of day rows (the `ts_sma_crossover`
    * allowlist class).
    */
  val tsRecordHighs: Q = (s, d) => {
    val daily = ev(s, d).filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("dd"))
      .agg(sum(cents(col("value"))).cast("long").as("rev_cents"))
    val w = Window.orderBy("dd").rowsBetween(Window.unboundedPreceding, -1)
    daily.withColumn("pm", max("rev_cents").over(w))
      .filter(col("pm").isNull || col("rev_cents") > col("pm"))
      .select(col("dd").cast("string").as("dd"), col("rev_cents"),
              coalesce(col("pm"), lit(0L)).as("prev_max_cents"))
      .orderBy("dd")
  }

  /** Key-vs-time monotonicity audit: within each order month, count
    * adjacent (in orderkey order) pairs whose order date DECREASES —
    * the "are surrogate keys time-ordered?" data-contract check that
    * decides whether key ranges can prune time predicates. Partitioned
    * by month: parallel, bounded per-partition sorts.
    */
  val dqKeyDateInversions: Q = (s, d) => {
    val o = orders(s, d).select(
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("ym"),
      col("o_orderkey"), col("o_orderdate"))
    val w = Window.partitionBy("ym").orderBy("o_orderkey")
    o.withColumn("prev_d", lag("o_orderdate", 1).over(w))
      .groupBy("ym")
      .agg(cnt.as("n_orders"),
           sum(when(col("prev_d") > col("o_orderdate"), 1L).otherwise(0L))
             .cast("long").as("n_inversions"))
      .orderBy("ym")
  }

  /** Brier score of "discount predicts return": probability = discount
    * ×10 in basis points (integer), outcome = returnflag='R' in bp;
    * mean squared error per line status in 1e-8 units — exact integer
    * arithmetic end-to-end (squares ≤ 10⁸, sums well under 2⁶³). The
    * proper-scoring-rule face next to `ml_calibration_bins`.
    */
  val mlBrierScore: Q = (s, d) =>
    li(s, d).select(col("l_linestatus").as("status"),
        round(col("l_discount") * 100000).cast("long").as("p_bp"),
        when(col("l_returnflag") === "R", 10000L).otherwise(0L).as("y_bp"))
      .withColumn("sq", (col("p_bp") - col("y_bp")) * (col("p_bp") - col("y_bp")))
      .groupBy("status")
      .agg(cnt.as("n"),
           expr("div(sum(sq), count(1))").cast("long").as("brier_e8"))
      .orderBy("status")

  /** Deterministic 5-fold split census — the cross-validation
    * assignment every training pipeline needs, RNG-free (md5 hash mod,
    * reshuffle-stable like `sample_systematic`): per fold, document
    * count, total/mean chars, and language coverage. Balanced folds +
    * full language coverage = the split is usable.
    */
  val splitKfold: Q = (s, d) =>
    docs(s, d).select(col("lang"), col("n_chars"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 5).as("fold"))
      .groupBy("fold")
      .agg(cnt.as("n_docs"), sum("n_chars").cast("long").as("sum_chars"),
           countDistinct("lang").cast("long").as("n_langs"),
           expr("div(sum(n_chars), count(1))").cast("long").as("mean_chars"))
      .orderBy("fold")

  /** Per-document BIGRAM surprisal — the conditional sibling of
    * `text_unigram_surprisal`: each bigram contributes
    * floor(log2 c(w₁·)) − floor(log2 c(w₁w₂)) (how surprising is w₂
    * given w₁), with floor(log2) as bit length − 1 (exact integers on
    * both engines — the `text_zipf_slope` idiom). Bigram extraction is
    * a per-doc lead window (partitioned by doc — parallel); the count
    * dimension folds c(w₁·) into the bigram table first so the fact
    * side pays ONE shuffle-hash join (string keys — the 4.1 SMJ
    * hazard).
    */
  val textBigramSurprisal: Q = (s, d) => {
    val t = docs(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bi = t.withColumn("w2", lead("tok", 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("tok").as("w1"), col("w2"))
    val c2 = bi.groupBy("w1", "w2").agg(cnt.as("c2"))
    val c1 = bi.groupBy("w1").agg(cnt.as("c1"))
    val dim = c2.join(c1.hint("shuffle_hash"), "w1")
      .select(col("w1"), col("w2"),
        ((length(bin(col("c1"))) - 1) - (length(bin(col("c2"))) - 1))
          .cast("long").as("sbits"))
    bi.join(dim.hint("shuffle_hash"), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(cnt.as("n_bigrams"), sum("sbits").cast("long").as("surprisal"))
      .orderBy("doc_id")
      .limit(2000)
  }

  /** Lines-per-order fan-out histogram — the full distribution behind
    * `dq_fk_fanout_profile`'s min/mean/max: how many orders carry k
    * lines. Two keyed aggregates, no broadcast, no window.
    */
  val ordersFanoutHistogram: Q = (s, d) =>
    li(s, d).groupBy("l_orderkey").agg(cnt.as("lines"))
      .groupBy("lines").agg(cnt.as("n_orders"))
      .orderBy("lines")

  /** Supplier shipping latency: whole-day lag from order date to ship
    * date per supplier — count, truncating mean, max — worst 100 by
    * mean (deterministic suppkey tiebreak, TakeOrdered cut). One fact
    * equi-join + keyed aggregate.
    */
  val supplierShipLatency: Q = (s, d) =>
    li(s, d).join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"),
              datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_d"))
      .groupBy("l_suppkey")
      .agg(cnt.as("n_lines"),
           expr("div(sum(lag_d), count(1))").cast("long").as("mean_lag_days"),
           max("lag_d").as("max_lag_days"))
      .orderBy(col("mean_lag_days").desc, col("l_suppkey"))
      .limit(100)

  /** Balance×spend quadrant census over customers WITH orders: above/
    * below the exact global median on each axis (medians ride the
    * 1-row broadcast — the `part_type_price_median_gap` pattern). The
    * 2×2 segmentation every CRM runs.
    */
  val customerBalanceSpendQuadrant: Q = (s, d) => {
    val spend = orders(s, d).groupBy("o_custkey")
      .agg(sum(cents(col("o_totalprice"))).cast("long").as("sp"))
    val c = cust(s, d).select(col("c_custkey"), cents(col("c_acctbal")).as("bal"))
      .join(spend, col("c_custkey") === col("o_custkey"))
    val med = c.agg(round(expr("percentile(bal, 0.5)")).cast("long").as("mb"),
                    round(expr("percentile(sp, 0.5)")).cast("long").as("ms"))
    c.crossJoin(broadcast(med))
      .select(when(col("bal") > col("mb"), "hi_bal").otherwise("lo_bal").as("bal_side"),
              when(col("sp") > col("ms"), "hi_spend").otherwise("lo_spend").as("spend_side"))
      .groupBy("bal_side", "spend_side")
      .agg(cnt.as("n_customers"))
      .orderBy("bal_side", "spend_side")
  }

  /** Reconstruction error of `embedding_quantize`'s int8 scheme, per
    * label: per-component error round((x − q·m/127)·10⁵) as an exact
    * integer (same expression tree both engines — per-row IEEE doubles
    * are bit-identical, the §2.1 R2 rule), summed squares in 1e-10
    * units. The "is int8 good enough for this corpus" audit a
    * quantized ANN deployment runs before switching.
    */
  val embeddingQuantizeError: Q = (s, d) => {
    val ve = transform(col("embedding"), x => x.cast("double"))
    Tables.t(s, d, "embeddings").select(col("label"), ve.as("ve"))
      .withColumn("m", array_max(transform(col("ve"), x => abs(x))))
      .withColumn("e", transform(col("ve"),
        x => round((x - floor(x * 127.0 / col("m") + 0.5) * col("m") / 127.0)
          * 100000).cast("long")))
      .select(col("label").cast("long").as("label"),
              aggregate(col("e"), lit(0L), (a, x) => a + x * x).as("sse"))
      .groupBy("label")
      .agg(cnt.as("n_vecs"), sum("sse").cast("long").as("sse_e10"),
           expr("div(sum(sse), count(1))").cast("long").as("mse_e10"))
      .orderBy("label")
  }

  /** Log2-bucketed (bit-length) value histogram per event type — the
    * long-tail money histogram `agg_histogram`'s equi-width buckets
    * flatten. Bucket = bit length of integer cents: exact on both
    * engines, no float log.
    */
  val aggHistogramLog2: Q = (s, d) =>
    ev(s, d).select(col("event_type"), cents(col("value")).as("c"))
      .withColumn("bucket", length(bin(col("c"))).cast("long"))
      .groupBy("event_type", "bucket")
      .agg(cnt.as("n"), sum("c").cast("long").as("sum_cents"))
      .orderBy("event_type", "bucket")

  /** Supplier redundancy census: how many parts have k distinct
    * suppliers — the single-source-risk distribution behind
    * `part_supply_risk`'s per-part flags.
    */
  val partSupplierRedundancy: Q = (s, d) =>
    li(s, d).select("l_partkey", "l_suppkey").distinct()
      .groupBy("l_partkey").agg(cnt.as("n_suppliers"))
      .groupBy("n_suppliers").agg(cnt.as("n_parts"))
      .orderBy("n_suppliers")

  /** The DISTINCT ON grammar face (DuckDB's Postgres-ism): latest
    * order per customer — Spark expresses it as the row_number()=1
    * argmax window (per-customer partitions, parallel), the oracle as
    * native DISTINCT ON; semantics is the contract, as with
    * `sql_pivot_syntax`.
    */
  val sqlDistinctOn: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
              col("o_orderdate").cast("date").cast("string").as("last_date"),
              cents(col("o_totalprice")).as("last_cents"))
      .orderBy("o_custkey").limit(2000)
  }

  /** Month-over-month purchase revenue growth (signed ppm, truncating
    * div): fact collapses to the bounded month domain first, then one
    * lag window over ~tens of month rows.
    */
  val tsMomGrowth: Q = (s, d) => {
    val m = ev(s, d).filter(col("event_type") === "purchase")
      .groupBy((year(col("ts")) * 100 + month(col("ts"))).cast("long").as("ym"))
      .agg(sum(cents(col("value"))).cast("long").as("rev_cents"))
    val w = Window.orderBy("ym")
    m.withColumn("prev", lag("rev_cents", 1).over(w))
      .select(col("ym"), col("rev_cents"),
              when(col("prev").isNull, lit(null).cast("long"))
                .otherwise(expr("div((rev_cents - prev) * 1000000, prev)")).as("growth_ppm"))
      .orderBy("ym")
  }

  /** Inter-label centroid affinity matrix: squared L2 distance (milli²
    * units) between every label pair's quantized mean embedding —
    * values quantize to integer milli BEFORE averaging (floor(x·1000
    * + 0.5), the `embedding_centroid_shift` staging) so the means are
    * truncating integer divisions, exact on both engines. The
    * label-structure audit run before trusting labels as
    * stratification keys. Bounded: labels × 64 dims.
    */
  val embeddingLabelAffinity: Q = (s, d) => {
    val m = Tables.t(s, d, "embeddings")
      .select(col("label").cast("long").as("label"),
              posexplode(transform(col("embedding"),
                x => floor(x.cast("double") * 1000 + 0.5).cast("long")))
                .as(Seq("pos", "q")))
      .groupBy("label", "pos")
      .agg(expr("div(sum(q), count(1))").as("mq"))
    val a = m.select(col("label").as("label_a"), col("pos"), col("mq").as("ma"))
    val b = m.select(col("label").as("label_b"), col("pos"), col("mq").as("mb"))
    a.join(b, Seq("pos")).filter(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(sum((col("ma") - col("mb")) * (col("ma") - col("mb")))
        .cast("long").as("d2_milli2"))
      .orderBy("label_a", "label_b")
  }

  /** CCNet-style PREFIX dedup census: documents sharing an identical
    * 64-char prefix (md5-keyed) — catches boilerplate-header
    * duplication whole-document hashing misses. Histogram of duplicate
    * group sizes.
    */
  val dedupPrefixHash: Q = (s, d) =>
    docs(s, d).select(md5(substring(col("text"), 1, 64)).as("h"))
      .groupBy("h").agg(cnt.as("k")).filter(col("k") > 1)
      .groupBy("k").agg(cnt.as("n_groups"))
      .orderBy("k")

  /** Language × source corpus mix: doc counts, char budgets, and each
    * source's share of its language (ppm) — the mixture table a
    * curation run rebalances against. Share rides a window over the
    * bounded lang domain (partitioned, never global).
    */
  val corpusLangSourceMatrix: Q = (s, d) =>
    docs(s, d).groupBy("lang", "source")
      .agg(cnt.as("n_docs"), sum("n_chars").cast("long").as("sum_chars"))
      .withColumn("tot", sum("n_docs").over(Window.partitionBy("lang")))
      .select(col("lang"), col("source"), col("n_docs"), col("sum_chars"),
              expr("div(n_docs * 1000000, tot)").cast("long").as("lang_share_ppm"))
      .orderBy("lang", "source")

  /** Supplier-nation price index: mean line price per supplier nation
    * vs the global mean, ppm (truncating div at every stage — exact
    * both engines). One fact⋈dim join + 1-row total broadcast.
    */
  val supplierNationPriceIndex: Q = (s, d) => {
    val t = li(s, d)
      .join(Tables.t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"), cents(col("l_extendedprice")).as("c"))
    val byN = t.groupBy("s_nationkey")
      .agg(cnt.as("n_lines"), sum("c").cast("long").as("sum_cents"))
    val tot = t.agg(sum("c").cast("long").as("gc"), cnt.as("gn"))
    byN.crossJoin(broadcast(tot))
      .select(col("s_nationkey").cast("long").as("nationkey"), col("n_lines"),
              expr("div(sum_cents, n_lines)").cast("long").as("mean_cents"),
              expr("div(div(sum_cents, n_lines) * 1000000, div(gc, gn))")
                .cast("long").as("index_ppm"))
      .orderBy("nationkey")
  }

  /** Market-segment × order-priority mix (share ppm within segment) —
    * the cross-table contingency audit beside `ml_chi2_priority_status`
    * but joined through the customer dimension; window over the
    * bounded segment domain.
    */
  val customerSegmentPriorityMix: Q = (s, d) =>
    cust(s, d).select(col("c_custkey"), col("c_mktsegment").as("segment"))
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("segment"), col("o_orderpriority").as("priority"))
      .agg(cnt.as("n_orders"))
      .withColumn("tot", sum("n_orders").over(Window.partitionBy("segment")))
      .select(col("segment"), col("priority"), col("n_orders"),
              expr("div(n_orders * 1000000, tot)").cast("long").as("share_ppm"))
      .orderBy("segment", "priority")

  /** SLA latency bands: order→ship lag bucketed per order priority —
    * the "are urgent orders actually faster" census. One fact join +
    * keyed aggregate.
    */
  val dqSlaLatencyBands: Q = (s, d) =>
    li(s, d).join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
              datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_d"))
      .withColumn("band",
        when(col("lag_d") <= 30, "a_0_30")
          .when(col("lag_d") <= 60, "b_31_60")
          .when(col("lag_d") <= 90, "c_61_90")
          .otherwise("d_over_90"))
      .groupBy("priority", "band")
      .agg(cnt.as("n_lines"))
      .orderBy("priority", "band")

  /** Feature-breadth histogram: how many users exercise k distinct
    * event types — the adoption-depth census every product team
    * tracks. Two keyed aggregates.
    */
  val eventsFeatureBreadth: Q = (s, d) =>
    ev(s, d).groupBy("user_id")
      .agg(countDistinct("event_type").cast("long").as("k"))
      .groupBy("k").agg(cnt.as("n_users"))
      .orderBy("k")

  /** Hour-of-day regularity census: per user, integer entropy score
    * Σ c·(bitlen(n) − bitlen(c)) over their 24-hour activity profile
    * (floor-log2 as bit length — exact both engines), banded by
    * truncating per-event average bits. Low bands = clockwork
    * (bot-like) activity, high = human spread — the behavioral-
    * regularity screen beside `events_fano_burstiness`. The hour
    * profile is bounded (users × 24); the total rides a user-
    * partitioned window (parallel).
    */
  val eventsUserHourEntropy: Q = (s, d) => {
    val c = ev(s, d)
      .groupBy(col("user_id"), hour(col("ts")).as("h")).agg(cnt.as("c"))
      .withColumn("n", sum("c").over(Window.partitionBy("user_id")))
    c.groupBy("user_id")
      .agg(sum(col("c") * (length(bin(col("n"))) - length(bin(col("c")))))
             .cast("long").as("score"),
           max("n").cast("long").as("n"))
      .select(expr("div(score, n)").cast("long").as("band"))
      .groupBy("band").agg(cnt.as("n_users"))
      .orderBy("band")
  }

  /** Per-group ntile: supplier balance quartiles WITHIN each nation
    * (partitioned windows — parallel by construction, unlike the
    * global `win_ntile` that needs the census machinery); quartile
    * census with min/max bounds. Ties broken by explicit suppkey
    * order, so tile assignment is engine-identical.
    */
  val winNtileByGroup: Q = (s, d) => {
    val w = Window.partitionBy("nationkey")
      .orderBy(col("bal"), col("s_suppkey"))
    Tables.t(s, d, "supplier")
      .select(col("s_nationkey").cast("long").as("nationkey"),
              col("s_suppkey"), cents(col("s_acctbal")).as("bal"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy("nationkey", "quartile")
      .agg(cnt.as("n_suppliers"), min("bal").as("min_bal"), max("bal").as("max_bal"))
      .orderBy("nationkey", "quartile")
  }

  /** Per-language Gini coefficient of document lengths (ppm): corpus
    * budget inequality inside each language — the equity diagnostic
    * behind `corpus_domain_cap`. Gini = (2·Σ(rank·x) − (n+1)·Σx) /
    * (n·Σx), rank ascending within language (explicit doc_id
    * tiebreak); windows partition by lang — parallel, never global.
    */
  val corpusLengthGini: Q = (s, d) => {
    val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    docs(s, d).select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("r", row_number().over(w).cast("long"))
      .groupBy("lang")
      .agg(cnt.as("n_docs"),
           sum(col("r") * col("n_chars")).as("s1"),
           sum(col("n_chars")).as("s0"))
      .select(col("lang"), col("n_docs"),
              expr("div((2 * s1 - (n_docs + 1) * s0) * 1000000, n_docs * s0)")
                .cast("long").as("gini_ppm"))
      .orderBy("lang")
  }

  /** Matthews-correlation components for "deep discount predicts
    * return" (pred = discount > 5%, label = returnflag='R'), per line
    * status: TP/TN/FP/FN census + the exact integer MCC numerator
    * TP·TN − FP·FN (the denominator is a √ — kept OUT of the contract
    * so every output stays integer-exact; callers finish the division
    * in their own precision). Beside `ml_confusion_matrix` /
    * `ml_cohen_kappa`.
    */
  val mlMccComponents: Q = (s, d) =>
    li(s, d).select(col("l_linestatus").as("status"),
        (col("l_discount") > 0.05).as("p"),
        (col("l_returnflag") === "R").as("y"))
      .groupBy("status")
      .agg(cnt.as("n"),
           sum(when(col("p") && col("y"), 1L).otherwise(0L)).cast("long").as("tp"),
           sum(when(!col("p") && !col("y"), 1L).otherwise(0L)).cast("long").as("tn"),
           sum(when(col("p") && !col("y"), 1L).otherwise(0L)).cast("long").as("fp"),
           sum(when(!col("p") && col("y"), 1L).otherwise(0L)).cast("long").as("fn"))
      .withColumn("mcc_num", col("tp") * col("tn") - col("fp") * col("fn"))
      .orderBy("status")

  /** 2-D histogram: quantity band × price band census over lineitem —
    * the joint-distribution heat grid (quantity in 5 bands of 10,
    * price in $20k bands capped at 4). All integer bucketing.
    */
  val aggHistogram2d: Q = (s, d) =>
    li(s, d).select(
        floor((col("l_quantity") - 1) / 10).cast("long").as("qband"),
        least(expr("div(cast(round(l_extendedprice * 100) as bigint), 2000000)"),
              lit(4L)).cast("long").as("pband"),
        cents(col("l_extendedprice")).as("c"))
      .groupBy("qband", "pband")
      .agg(cnt.as("n_lines"), sum("c").cast("long").as("sum_cents"))
      .orderBy("qband", "pband")

  /** The ORDER BY ALL grammar face (Spark 4 + DuckDB both support it;
    * the oracle states it natively, like `sql_group_by_all`): priority
    * × status order census sorted by every output column.
    */
  val sqlOrderByAll: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("orders_oba")
    s.sql("""SELECT o_orderpriority AS priority, o_orderstatus AS status,
                    CAST(count(1) AS BIGINT) AS n_orders
             FROM orders_oba GROUP BY ALL ORDER BY ALL""")
  }

  /** Session-depth histogram: sessions by event count (30-minute gap
    * sessionization, the `events_sessionize_stats` convention) — the
    * engagement-depth distribution. Per-user windows (parallel), then
    * two keyed aggregates.
    */
  val eventsSessionDepthHistogram: Q = (s, d) => {
    val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d).select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(wo)))
      .withColumn("new_sess",
        when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .withColumn("sid", sum("new_sess").over(wrun))
      .groupBy("user_id", "sid").agg(cnt.as("depth"))
      .groupBy("depth").agg(cnt.as("n_sessions"))
      .orderBy("depth")
  }

  /** Cross-language duplicates on the NORMALIZED form (sorted distinct
    * token set — the `text_dedup_normalized` convention; this corpus
    * has no byte-exact dups but plenty of J=1.0 reorderings): the same
    * content under more than one language tag — the mislabeled-langid /
    * contamination audit a multilingual curation run needs (a same-lang
    * dup is ordinary; a cross-lang one means the language tag lied).
    */
  val dedupCrossLangExact: Q = (s, d) =>
    docs(s, d).select(
        md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " "))
          .as("h"),
        col("lang"), col("doc_id"))
      .groupBy("h")
      .agg(countDistinct("lang").cast("long").as("n_langs"),
           cnt.as("n_docs"), min("doc_id").as("first_doc"))
      .filter(col("n_langs") > 1)
      .select(col("n_langs"), col("n_docs"), col("first_doc"))
      .orderBy("first_doc")

  /** Pairwise language vocabulary overlap (Jaccard ppm over distinct
    * token sets) — the language-similarity matrix that catches
    * mislabeled languages at the corpus level (high overlap between
    * two tags = the langid confuses them). Token-keyed equi-join on
    * the bounded (token, lang) vocab — linear, never all-pairs;
    * shuffle-hash hinted (string keys).
    */
  val textVocabOverlapLangs: Q = (s, d) => {
    val v = docs(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
    val sizes = v.groupBy("lang").agg(cnt.as("n"))
    val inter = v.select(col("lang").as("lang_a"), col("tok"))
      .join(v.select(col("lang").as("lang_b"), col("tok")).hint("shuffle_hash"), "tok")
      .filter(col("lang_a") < col("lang_b"))
      .groupBy("lang_a", "lang_b").agg(cnt.as("i"))
    inter
      .join(broadcast(sizes.select(col("lang").as("lang_a"), col("n").as("na"))), "lang_a")
      .join(broadcast(sizes.select(col("lang").as("lang_b"), col("n").as("nb"))), "lang_b")
      .select(col("lang_a"), col("lang_b"),
              expr("div(i * 1000000, na + nb - i)").cast("long").as("jaccard_ppm"))
      .orderBy("lang_a", "lang_b")
  }

  /** Revenue concentration per market segment: the top spend-decile's
    * share of segment revenue (ppm) — the Pareto census. Deciles via
    * percent_rank WITHIN segment (partitioned windows, parallel;
    * explicit custkey tiebreak).
    */
  val customerTopDecileShare: Q = (s, d) => {
    val spend = orders(s, d).groupBy("o_custkey")
      .agg(sum(cents(col("o_totalprice"))).cast("long").as("sp"))
    val c = cust(s, d).select(col("c_custkey"), col("c_mktsegment").as("segment"))
      .join(spend, col("c_custkey") === col("o_custkey"))
    val w = Window.partitionBy("segment").orderBy(col("sp"), col("c_custkey"))
    c.withColumn("pr", percent_rank().over(w))
      .groupBy("segment")
      .agg(cnt.as("n_customers"),
           sum(when(col("pr") >= 0.9, 1L).otherwise(0L)).cast("long").as("n_top"),
           expr("div(sum(CASE WHEN pr >= 0.9 THEN sp ELSE 0 END) * 1000000, sum(sp))")
             .cast("long").as("top_share_ppm"))
      .orderBy("segment")
  }

  /** Day-of-month purchase seasonality: per-day-of-month revenue share
    * vs the uniform expectation, signed ppm deviation — the
    * month-shape sibling of `ts_dow_seasonality` (payday/billing-cycle
    * detection). Bounded 31-row domain after the fact collapse; totals
    * ride a bounded-domain window.
    */
  val tsDomSeasonality: Q = (s, d) =>
    ev(s, d).filter(col("event_type") === "purchase")
      .groupBy(dayofmonth(col("ts")).cast("long").as("dom"))
      .agg(cnt.as("n"), sum(cents(col("value"))).cast("long").as("rev_cents"))
      .withColumn("tot", sum("rev_cents").over(Window.partitionBy()))
      .withColumn("days", count(lit(1)).over(Window.partitionBy()))
      .select(col("dom"), col("n"), col("rev_cents"),
              (expr("div(rev_cents * 1000000, tot)") -
               expr("div(1000000, days)")).cast("long").as("dev_ppm"))
      .orderBy("dom")

  /** Supplier revenue-rank shift quarter-over-quarter: rank within
    * each quarter (partitioned windows), adjacent quarters joined on a
    * continuous quarter index, top-50 movers by absolute shift
    * (deterministic tiebreaks) — the leaderboard-churn analytic.
    */
  val supplierRankShiftQuarterly: Q = (s, d) => {
    val rev = li(s, d)
      .select(col("l_suppkey"),
              (year(col("l_shipdate")) * 4 + quarter(col("l_shipdate")) - 1)
                .cast("long").as("qi"),
              cents(col("l_extendedprice")).as("c"))
      .groupBy("l_suppkey", "qi").agg(sum("c").cast("long").as("rev"))
    val w = Window.partitionBy("qi").orderBy(col("rev").desc, col("l_suppkey"))
    val ranked = rev.withColumn("rk", row_number().over(w).cast("long"))
    val prev = ranked.select(col("l_suppkey"), (col("qi") + 1).as("qi"),
                             col("rk").as("rk_prev"))
    ranked.join(prev, Seq("l_suppkey", "qi"))
      .select(col("l_suppkey"), col("qi"), col("rk_prev"), col("rk"),
              (col("rk_prev") - col("rk")).as("shift"))
      .orderBy(abs(col("shift")).desc, col("qi"), col("l_suppkey"))
      .limit(50)
  }

  /** Maximum intra-month revenue drawdown (ppm below the month's
    * running peak) — the `ts_record_highs` complement. Running peak
    * partitions BY MONTH (parallel, bounded ≤31 days/partition).
    */
  val tsMaxDrawdown: Q = (s, d) => {
    val daily = ev(s, d).filter(col("event_type") === "purchase")
      .groupBy((year(col("ts")) * 100 + month(col("ts"))).cast("long").as("ym"),
               to_date(col("ts")).as("dd"))
      .agg(sum(cents(col("value"))).cast("long").as("rev"))
    val w = Window.partitionBy("ym").orderBy("dd")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("peak", max("rev").over(w))
      .select(col("ym"),
              expr("div((peak - rev) * 1000000, peak)").as("dd_ppm"))
      .groupBy("ym")
      .agg(cnt.as("n_days"), max("dd_ppm").cast("long").as("max_drawdown_ppm"))
      .orderBy("ym")
  }

  /** F1 sweep over discount thresholds for "deep discount predicts
    * return": per threshold (bp), TP/FP/FN and F1 in ppm —
    * 2·TP·10⁶ div (2·TP+FP+FN), exact integers (the PR-curve shape
    * beside `ml_mcc_components`' single operating point).
    */
  val mlF1ThresholdSweep: Q = (s, d) =>
    li(s, d).select(round(col("l_discount") * 10000).cast("long").as("disc_bp"),
                    (col("l_returnflag") === "R").as("y"))
      .select(explode(lit(Array(200L, 300L, 400L, 500L, 600L, 700L, 800L)))
                .as("thr_bp"),
              col("disc_bp"), col("y"))
      .withColumn("p", col("disc_bp") > col("thr_bp"))
      .groupBy("thr_bp")
      .agg(sum(when(col("p") && col("y"), 1L).otherwise(0L)).cast("long").as("tp"),
           sum(when(col("p") && !col("y"), 1L).otherwise(0L)).cast("long").as("fp"),
           sum(when(!col("p") && col("y"), 1L).otherwise(0L)).cast("long").as("fn"))
      .select(col("thr_bp"), col("tp"), col("fp"), col("fn"),
              expr("div(2 * tp * 1000000, 2 * tp + fp + fn)").cast("long").as("f1_ppm"))
      .orderBy("thr_bp")

  val queries: Map[String, Q] = Map(
    "supplier_rank_shift_quarterly" -> supplierRankShiftQuarterly,
    "ts_max_drawdown" -> tsMaxDrawdown,
    "ml_f1_threshold_sweep" -> mlF1ThresholdSweep,
    "text_vocab_overlap_langs" -> textVocabOverlapLangs,
    "customer_top_decile_share" -> customerTopDecileShare,
    "ts_dom_seasonality" -> tsDomSeasonality,
    "sql_order_by_all" -> sqlOrderByAll,
    "events_session_depth_histogram" -> eventsSessionDepthHistogram,
    "dedup_cross_lang_exact" -> dedupCrossLangExact,
    "corpus_length_gini" -> corpusLengthGini,
    "ml_mcc_components" -> mlMccComponents,
    "agg_histogram_2d" -> aggHistogram2d,
    "dq_sla_latency_bands" -> dqSlaLatencyBands,
    "events_feature_breadth" -> eventsFeatureBreadth,
    "events_user_hour_entropy" -> eventsUserHourEntropy,
    "win_ntile_by_group" -> winNtileByGroup,
    "dedup_prefix_hash" -> dedupPrefixHash,
    "corpus_lang_source_matrix" -> corpusLangSourceMatrix,
    "supplier_nation_price_index" -> supplierNationPriceIndex,
    "customer_segment_priority_mix" -> customerSegmentPriorityMix,
    "agg_histogram_log2" -> aggHistogramLog2,
    "part_supplier_redundancy" -> partSupplierRedundancy,
    "sql_distinct_on" -> sqlDistinctOn,
    "ts_mom_growth" -> tsMomGrowth,
    "embedding_label_affinity" -> embeddingLabelAffinity,
    "text_bigram_surprisal" -> textBigramSurprisal,
    "orders_fanout_histogram" -> ordersFanoutHistogram,
    "supplier_ship_latency" -> supplierShipLatency,
    "customer_balance_spend_quadrant" -> customerBalanceSpendQuadrant,
    "embedding_quantize_error" -> embeddingQuantizeError,
    "win_cume_dist" -> winCumeDist,
    "expr_width_bucket" -> exprWidthBucket,
    "ts_record_highs" -> tsRecordHighs,
    "dq_key_date_inversions" -> dqKeyDateInversions,
    "ml_brier_score" -> mlBrierScore,
    "split_kfold" -> splitKfold,
  )
}
