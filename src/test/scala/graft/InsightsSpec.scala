package graft

import org.apache.spark.sql.functions._

/** Wave-18 (ops/Insights.scala) semantic cross-checks — each test pins
  * a property the DuckDB oracle can't see (cross-operator consistency,
  * mathematical bounds), complementing the hash gate.
  */
class InsightsSpec extends SparkSpecBase {

  test("graph_cc_minlabel: 6 bounded rounds have converged to the true components") {
    // The fixed-round census must equal the convergence-detected
    // iterative operator on the same graph — i.e. at this corpus's
    // diameter, 6 rounds IS connected components, not an approximation.
    import graft.ops.Scale
    val e = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val cc = Scale.connectedComponents(e, "a", "b")
      .groupBy("label").agg(count(lit(1)).as("sz"))
      .orderBy(col("sz").desc, col("label")).limit(100)
      .select(col("label").as("lbl"), col("sz"))
    val fixed = q("graph_cc_minlabel")
    assert(fixed.exceptAll(cc).isEmpty && cc.exceptAll(fixed).isEmpty)
  }

  test("ml_precision_recall_k: rel_at_10 agrees with ml_mrr_hits' hits_at_10") {
    // Same probe set, same ranking, same relevance definition — the two
    // eval operators must count the same top-10 relevant neighbors.
    val pr = q("ml_precision_recall_k").select(col("q_id"), col("rel_at_10"))
    val mrr = q("ml_mrr_hits").select(col("q_id"), col("hits_at_10").as("rel_at_10"))
    assert(pr.exceptAll(mrr).isEmpty && mrr.exceptAll(pr).isEmpty)
  }

  test("events_dau_wau: wau bounds dau and stickiness is a valid ratio") {
    val bad = q("events_dau_wau")
      .filter(col("n_wau") < col("n_dau") ||
              col("stickiness_ppm") < 0 || col("stickiness_ppm") > 1000000)
      .count()
    assert(bad == 0L)
  }

  test("ts_acf_lags: Cauchy-Schwarz bound |acf| <= 1") {
    val bad = q("ts_acf_lags")
      .filter(abs(col("acf_ppm")) > 1000000).count()
    assert(bad == 0L)
  }

  test("graph_jaccard_neighbors: co-degree bounded by both degrees, ppm in range") {
    val bad = q("graph_jaccard_neighbors")
      .filter(col("c") > least(col("d1"), col("d2")) ||
              col("jac_ppm") < 0 || col("jac_ppm") > 1000000)
      .count()
    assert(bad == 0L)
  }

  test("ml_gini_split: impurity within [0, 1 - 1/k] for 10 labels") {
    val bad = q("ml_gini_split")
      .filter(col("gini_ppm") < 0 || col("gini_ppm") > 900000).count()
    assert(bad == 0L)
  }

  test("ml_hist_drift: L1 ppm distance bounded by 2, halves partition the month") {
    val r = q("ml_hist_drift")
    assert(r.filter(col("l1_ppm") < 0 || col("l1_ppm") > 2000000).count() == 0L)
    val byType = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val halves = r.select(col("event_type"), (col("n_a") + col("n_b")).as("n"))
    assert(halves.exceptAll(byType).isEmpty && byType.exceptAll(halves).isEmpty)
  }

  test("corpus_domain_cap: at most 5 docs kept per (lang, source)") {
    val over = q("corpus_domain_cap")
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .filter(col("n") > 5).count()
    assert(over == 0L)
  }

  test("ts_forecast_wape: a perfect 7-day-periodic series scores zero") {
    // Sanity on the metric itself: WAPE of the seasonal-naive forecast
    // over a series that repeats with period 7 must be exactly 0.
    import spark.implicits._
    val daily = (0 until 28).map(i => (java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 3, 1).plusDays(i)), (i % 7 + 1) * 100L))
      .toDF("dd", "c")
    val f = daily.select(expr("date_add(dd, 7)").as("dd"), col("c").as("fc"))
    val absErr = daily.join(f, Seq("dd"))
      .agg(sum(abs(col("c") - col("fc"))).as("w"))
      .head.getLong(0)
    assert(absErr == 0L)
  }

  test("agg_bottomk_quantiles: 256-sample estimates land near the exact quantiles") {
    // Rank accuracy: the true rank of each estimate must sit within a
    // few standard errors (sqrt(q(1-q)/k) ~ 3%) of the target quantile.
    val est = q("agg_bottomk_quantiles")
    val vals = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag").as("grp"),
              (round(col("l_extendedprice") * 100)).cast("long").as("v"))
    val checks = est.join(vals, "grp")
      .groupBy("grp", "n_exact", "est_p50", "est_p90")
      .agg(sum(when(col("v") <= col("est_p50"), 1L).otherwise(0L)).as("r50"),
           sum(when(col("v") <= col("est_p90"), 1L).otherwise(0L)).as("r90"))
      .withColumn("q50", col("r50") * 1000 / col("n_exact"))
      .withColumn("q90", col("r90") * 1000 / col("n_exact"))
    val bad = checks.filter(
      col("q50") < 350 || col("q50") > 650 ||
      col("q90") < 780 || col("q90") > 980).count()
    assert(bad == 0L, checks.collect().mkString("\n"))
  }

  test("text_bpe_train_merges: greedy merge counts are non-increasing and round 1 is the census top") {
    val merges = q("text_bpe_train_merges").orderBy("merge_round").collect()
    assert(merges.length == 3)
    val counts = merges.map(_.getAs[Long]("c"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2), counts.mkString(","))
    // round-1 selection == the standalone pair census's top row
    val top = q("text_bpe_pair_census").orderBy(col("c").desc, col("pair")).collect().head
    assert(merges(0).getAs[String]("pair") == top.getAs[String]("pair") &&
           counts(0) == top.getAs[Long]("c"))
  }

  test("events_markov_stationary: mass stays within truncation loss of 1e6") {
    val v = q("events_markov_stationary").collect()
    val total = v.map(_.getAs[Long]("v_ppm")).sum
    // each of 4 rounds truncates <=1 ppm per (i,j) term (<=25 terms)
    assert(total <= 1000000L && total >= 1000000L - 4 * 25, s"total=$total")
    assert(v.forall(_.getAs[Long]("v_ppm") >= 0L))
  }

  test("ts_outlier_iqr: quartiles ordered, outliers bounded by the domain") {
    val bad = q("ts_outlier_iqr")
      .filter(col("q1") > col("q3") || col("n_outliers") > col("m")).count()
    assert(bad == 0L)
  }

  test("events_bounce_rate: bounces bounded by sessions, ppm valid") {
    val bad = q("events_bounce_rate")
      .filter(col("n_bounce") > col("n_sessions") ||
              col("bounce_ppm") < 0 || col("bounce_ppm") > 1000000).count()
    assert(bad == 0L)
  }

  test("array_hof_funcs: lambda results consistent with the array extremes") {
    val bad = q("array_hof_funcs").filter(
      (col("has_gt40") === 1L) =!= (col("max_qty") > 40L) ||
      col("min_qty") > col("max_qty") || col("n_ge25") > col("n_items")).count()
    assert(bad == 0L)
  }

  test("str_collation_distinct: UTF8_LCASE collapses the synthesized case variants") {
    val r = q("str_collation_distinct").head
    assert(r.getAs[Long]("n_case_insensitive") <= r.getAs[Long]("n_case_sensitive"))
    // both parities exist among 150+ customers over 25 nations, so the
    // cased distinct count must strictly exceed the collated one
    assert(r.getAs[Long]("n_case_sensitive") > r.getAs[Long]("n_case_insensitive"))
  }

  test("supplier_abc_class: classes partition all suppliers and all revenue") {
    val r = q("supplier_abc_class")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val nSup = li.select("l_suppkey").distinct().count()
    val total = li.agg(sum(round(col("l_extendedprice") * 100).cast("long")))
      .head.getLong(0)
    assert(r.agg(sum("n_suppliers")).head.getLong(0) == nSup)
    assert(r.agg(sum("cents")).head.getLong(0) == total)
    val classes = r.select("cls").collect().map(_.getString(0)).toSet
    assert(classes.subsetOf(Set("A", "B", "C")))
  }

  test("basket_apriori_pairs: confidences valid, lift positive, support floor holds") {
    val bad = q("basket_apriori_pairs").filter(
      col("conf12_ppm") > 1000000 || col("conf21_ppm") > 1000000 ||
      col("conf12_ppm") <= 0 || col("conf21_ppm") <= 0 ||
      col("lift_ppm") <= 0 || col("c_xy") < 3).count()
    assert(bad == 0L)
  }

  test("ltv_cohort_revenue: cumulative LTV is monotone within each cohort") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort_w").orderBy("week_offset")
    val bad = q("ltv_cohort_revenue")
      .withColumn("prev_cum", lag(col("cum_cents"), 1).over(w))
      .filter(col("prev_cum").isNotNull &&
        (col("cum_cents") < col("prev_cum") ||
         col("cum_cents") =!= col("prev_cum") + col("cents"))).count()
    assert(bad == 0L)
  }

  test("customer_order_gaps: median bounded by max, gaps non-negative") {
    val bad = q("customer_order_gaps").filter(
      col("median_gap_d") > col("max_gap_d") || col("median_gap_d") < 0).count()
    assert(bad == 0L)
  }

  test("agg_bitmap_union_all: the OR-merged ALL row equals the exact global distinct") {
    val r = q("agg_bitmap_union_all")
    val exact = spark.read.parquet(s"$sf/orders.parquet")
      .select(countDistinct("o_custkey")).head.getLong(0)
    val allRow = r.filter(col("grp") === "ALL").head.getAs[Long]("n_cust")
    assert(allRow == exact)
    // per-group counts each bounded by the ALL row
    assert(r.filter(col("grp") =!= "ALL" && col("n_cust") > allRow).count() == 0L)
  }

  test("date_make_funcs: constructed dates bracket the source date") {
    val bad = q("date_make_funcs").filter(
      col("month_start") > col("month_end") ||
      col("doy") < 1 || col("doy") > 366 ||
      col("iso_week") < 1 || col("iso_week") > 53 ||
      col("qtr") < 1 || col("qtr") > 4).count()
    assert(bad == 0L)
  }

  test("text_chunk_sliding: chunks cover every token with exact 8-token overlap") {
    val c = q("text_chunk_sliding")
    // spans tile the doc: first starts at 1, consecutive starts differ
    // by the stride (24), and the last chunk reaches the final token
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("chunk_idx")
    val chunks = c.withColumn("prev_to", lag(col("tok_to"), 1).over(w))
      .withColumn("prev_from", lag(col("tok_from"), 1).over(w))
    assert(chunks.filter(col("chunk_idx") === 0 && col("tok_from") =!= 1).count() == 0L)
    assert(chunks.filter(col("prev_from").isNotNull &&
      col("tok_from") - col("prev_from") =!= 24).count() == 0L)
    // no gap between consecutive chunks (overlap >= 0 ⇔ coverage)
    assert(chunks.filter(col("prev_to").isNotNull &&
      col("tok_from") > col("prev_to") + 1).count() == 0L)
    // chunk text really is the token span
    val bad = c.filter(col("n_toks") =!=
      (size(split(col("chunk"), " "))).cast("long")).count()
    assert(bad == 0L)
  }

  test("text_dedup_normalized: fingerprint invariant to case, whitespace, order, repeats") {
    import spark.implicits._
    val fp = md5(expr(
      """array_join(array_sort(array_distinct(
        |  split(trim(lower(text)), '\\s+'))), ' ')""".stripMargin))
    val docs = Seq(
      (1L, "select from where"), (2L, "  WHERE   SELECT   FROM "),
      (3L, "from select  From\twhere where"), (4L, "totally different text"))
      .toDF("doc_id", "text")
    val groups = docs.select(col("doc_id"), fp.as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"), min("doc_id").as("c"))
    val collapsed = groups.filter(col("n") === 3).collect()
    assert(collapsed.length == 1 && collapsed.head.getAs[Long]("c") == 1L)
    // and the real query finds this corpus's J=1.0 near-dups
    assert(q("text_dedup_normalized").count() > 0)
  }

  test("events_step_latency: latencies are non-negative and only for signup users") {
    val r = q("events_step_latency")
    assert(r.filter(col("latency_s") < 0).count() == 0L)
    val signups = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "signup").select("user_id").distinct()
    assert(r.join(signups, Seq("user_id"), "left_anti").count() == 0L)
  }
}
