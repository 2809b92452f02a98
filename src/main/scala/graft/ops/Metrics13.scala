package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-17 query wave 2 (SURVEY §2.21): Holt linear smoothing,
  * Kaplan–Meier survival with right-censoring, nDCG@5 ranking quality,
  * Chao1 species-richness estimation, Kendall's W concordance,
  * Sainte-Laguë apportionment, Weibull median-rank fitting, Bartlett's
  * variance-homogeneity K², ABC-XYZ inventory classification, and the
  * newsvendor quantile. Exactness per §2.1: integer cents/counts feed
  * every ratio; the sequential Holt fold runs in the SAME order on
  * both engines (one bounded array fold ↔ recursive CTE);
  * month-boundary arithmetic is integer (year·12+month), never a
  * fractional months_between.
  */
object Metrics13 {

  private def orders(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "orders")
  private def customer(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "customer")
  private def nation(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "nation")
  private def li(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "lineitem")
  private def part(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "part")
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "events")
  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "documents")

  /** Holt's linear trend (α=0.3, β=0.1) over the daily order-count
    * series: level/trend initialized from the first two days, then ONE
    * sequential fold over the sorted day array (identical operation
    * order to the oracle's recursive CTE — FP-deterministic), with the
    * 7-day-ahead forecast. The fold runs on a bounded ~2.4k-element
    * array collected from the day aggregate, never on fact rows.
    */
  val tsHoltLinear: Q = (s, d) => {
    orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(cnt.cast("double").as("x"))
      .agg(expr("transform(array_sort(collect_list(struct(dy, x))), e -> e.x)")
        .as("xs"))
      .select(
        expr("size(xs)").cast("long").as("n_days"),
        expr("""aggregate(slice(xs, 3, size(xs) - 2),
             named_struct('lv', element_at(xs, 2),
                          'tr', element_at(xs, 2) - element_at(xs, 1)),
             (acc, x) -> named_struct(
               'lv', 0.3d * x + 0.7d * (acc.lv + acc.tr),
               'tr', 0.1d * ((0.3d * x + 0.7d * (acc.lv + acc.tr)) - acc.lv)
                       + 0.9d * acc.tr),
             acc -> acc)""").as("hw"))
      .select(col("n_days"),
        floor(col("hw.lv") * 1000 + 0.5).cast("long").as("level_milli"),
        floor(col("hw.tr") * 1000 + 0.5).cast("long").as("trend_milli"),
        floor((col("hw.lv") + lit(7) * col("hw.tr")) * 1000 + 0.5)
          .cast("long").as("forecast7_milli"))
  }

  /** Kaplan–Meier survival of customer lifetimes (months between first
    * and last order, integer month-boundary arithmetic); customers
    * whose last order falls within a year of the corpus horizon are
    * right-censored. At-risk counts come from a descending cumulative
    * sum over the bounded month domain; S(t) = exp(Σ ln(1−d/n)) over
    * the ordered death months. First 24 months.
    */
  val customerKaplanMeier: Q = (s, d) => {
    val o = orders(s, d)
    val horizon = o.agg((max(col("o_orderdate")) - expr("INTERVAL 365 DAYS"))
      .as("hz"))
    val u = o.groupBy("o_custkey")
      .agg(min("o_orderdate").as("a"), max("o_orderdate").as("b"))
      .crossJoin(broadcast(horizon))
      .select(
        ((year(col("b")) * 12 + month(col("b"))) -
          (year(col("a")) * 12 + month(col("a")))).cast("long").as("t"),
        when(col("b") <= col("hz"), 1L).otherwise(0L).as("died"))
    val byT = u.groupBy("t")
      .agg(cnt.as("total"), sum("died").as("d"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n", sum("total").over(wDesc))
      .filter(col("d") > 0)
      .withColumn("surv",
        exp(sum(log(lit(1.0) - col("d").cast("double") / col("n"))).over(wAsc)))
      .filter(col("t") <= 24)
      .select(col("t").as("month"), col("n").cast("long").as("at_risk"),
        col("d").cast("long").as("deaths"),
        floor(col("surv") * 1000000 + 0.5).cast("long").as("survival_micro"))
      .orderBy("month")
  }

  /** nDCG@5 of each user's event-type ranking — predicted order by
    * event count (type tiebreak), graded relevance = exact value
    * cents per type; ideal order by relevance. Censused by 20-event
    * activity bands. Per-user windows over the bounded type domain.
    */
  val mlNdcgAtK: Q = (s, d) => {
    val g = ev(s, d).groupBy(col("user_id"), col("event_type"))
      .agg(cnt.as("c"), sumCents(col("value")).as("rel"))
    val wp = Window.partitionBy("user_id")
      .orderBy(col("c").desc, col("event_type"))
    val wi = Window.partitionBy("user_id")
      .orderBy(col("rel").desc, col("event_type"))
    g.withColumn("r_pred", row_number().over(wp))
      .withColumn("r_ideal", row_number().over(wi))
      .groupBy("user_id")
      .agg(
        sum(when(col("r_pred") <= 5,
          col("rel").cast("double") / log2(col("r_pred") + 1.0)).otherwise(0.0))
          .as("dcg"),
        sum(when(col("r_ideal") <= 5,
          col("rel").cast("double") / log2(col("r_ideal") + 1.0)).otherwise(0.0))
          .as("idcg"),
        sum("c").cast("long").as("events"))
      .select(expr("events div 20").cast("long").as("activity_band"),
        when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(lit(1.0))
          .as("nd"))
      .groupBy("activity_band")
      .agg(cnt.as("users"),
        floor(avg("nd") * 1000 + 0.5).cast("long").as("avg_ndcg_milli"))
      .orderBy("activity_band")
  }

  /** Chao1 species-richness estimate of each language's BIGRAM
    * vocabulary — bias-corrected, PURE INTEGER:
    * S_obs + F1(F1−1) // (2(F2+1)) from the singleton/doubleton counts.
    */
  val textChao1Richness: Q = (s, d) =>
    docs(s, d)
      .select(col("lang"), split(col("text"), " ").as("ws"))
      .select(col("lang"), explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
        .as("bg"))
      .groupBy("lang", "bg").agg(cnt.as("c"))
      .groupBy("lang")
      .agg(cnt.as("s_obs"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).cast("long").as("f2"))
      .withColumn("chao1_est", (col("s_obs") +
        expr("(f1 * (f1 - 1)) div (2 * (f2 + 1))")).cast("long"))
      .orderBy("lang")

  /** Kendall's W concordance of three nation rankings (revenue,
    * balance, customer count) — distinct integer ranks over the
    * bounded 25-row nation domain, PURE INTEGER result via the 4S
    * half-integer trick: W·1000 = 3000·Σ(2R−3(n+1))² // 36(n³−n).
    */
  val nationKendallW: Q = (s, d) => {
    val m = nation(s, d)
      .join(customer(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sumCents(col("o_totalprice")).as("rev"),
        sumCents(col("c_acctbal")).as("bal"),
        countDistinct("c_custkey").as("ncust"))
    val r = m.withColumn("rsum",
      row_number().over(Window.orderBy(col("rev").desc, col("nation"))) +
        row_number().over(Window.orderBy(col("bal").desc, col("nation"))) +
        row_number().over(Window.orderBy(col("ncust").desc, col("nation"))))
    val nn = r.agg(cnt.as("nn"))
    r.crossJoin(broadcast(nn))
      .agg(max("nn").as("n"),
        sum((lit(2) * col("rsum") - lit(3) * (col("nn") + 1)) *
          (lit(2) * col("rsum") - lit(3) * (col("nn") + 1))).as("four_s"))
      .select(col("n").cast("long").as("nations"),
        expr("(3000 * four_s) div (36 * (n * n * n - n))")
          .cast("long").as("w_milli"))
  }

  /** Sainte-Laguë (odd-divisor) apportionment of 1000 seats by nation
    * revenue — the divisor-method contrast to `alloc_dhondt`'s
    * 1..n quotients; same deterministic (quotient, nation, divisor)
    * tiebreak over the 25×1000 divisor domain. Quotients are exact
    * integer floor divisions of cent totals (divisors ≤ 1999, so the
    * sub-cent truncation cannot reorder a real seat gap) — no FP
    * surface, matching the dhondt twin's discipline.
    */
  val allocSainteLague: Q = (s, d) => {
    val v = nation(s, d)
      .join(customer(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sumCents(col("o_totalprice")).as("votes"))
    val q = v.crossJoin(broadcast(
        s.range(0, 1000).select(col("id").as("i"))))
      .withColumn("quot", expr("votes div (2 * i + 1)"))
    val w = Window.orderBy(col("quot").desc, col("nation"), col("i"))
    q.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 1000)
      .groupBy("nation")
      .agg(cnt.as("seats"), max("votes").cast("long").as("votes_cents"))
      .orderBy("nation")
  }

  /** Weibull shape/scale of the order→ship lag per return flag, via
    * median-rank regression: deterministic per-flag ranks (lag,
    * orderkey, linenumber), Bernard plot positions (i−0.3)/(n+0.4),
    * OLS on (ln t, ln(−ln(1−F))). Per-flag windows shuffle on the
    * 3-value flag domain; the OLS is one aggregate.
    */
  val liLeadtimeWeibull: Q = (s, d) => {
    val lt = li(s, d).join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate"))
      .select(col("l_returnflag").as("flag"),
        (datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) + 1)
          .cast("long").as("t"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val w = Window.partitionBy("flag").orderBy(col("t"), col("ok"), col("ln"))
    val wn = Window.partitionBy("flag")
    lt.withColumn("i", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .select(col("flag"), log(col("t").cast("double")).as("x"),
        log(-log(lit(1.0) - (col("i") - 0.3) / (col("n") + 0.4))).as("y"))
      .groupBy("flag")
      .agg(cnt.as("n"),
        ((avg(col("x") * col("y")) - avg("x") * avg("y")) /
          (avg(col("x") * col("x")) - avg("x") * avg("x"))).as("k"),
        avg("y").as("my"), avg("x").as("mx"))
      .select(col("flag").as("returnflag"), col("n").cast("long").as("lines"),
        floor(col("k") * 1000 + 0.5).cast("long").as("shape_milli"),
        floor(exp(col("mx") - col("my") / col("k")) * 1000 + 0.5)
          .cast("long").as("scale_milli"))
      .orderBy("returnflag")
  }

  /** Bartlett's K² for variance homogeneity of the order→ship lag
    * across return flags — per-group variance from EXACT integer
    * sums/sums-of-squares, the pooled/ln steps terminal.
    */
  val liBartlettK2: Q = (s, d) => {
    val g = li(s, d).join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_returnflag").as("flag"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("t"))
      .groupBy("flag")
      .agg(cnt.as("n"), sum("t").cast("long").as("s"),
        sum(col("t") * col("t")).cast("long").as("q"))
      .withColumn("s2", (col("q").cast("double") -
        col("s").cast("double") * col("s") / col("n")) / (col("n") - 1))
    g.agg(sum("n").cast("long").as("nn"), cnt.as("k"),
        (sum((col("n") - 1) * col("s2")) / sum(col("n") - 1)).as("sp2"),
        sum((col("n") - 1) * log(col("s2"))).as("lnsum"),
        sum(lit(1.0) / (col("n") - 1)).as("invsum"))
      .select(col("k").cast("long").as("groups"), col("nn").as("n_lines"),
        floor(((col("nn") - col("k")) * log(col("sp2")) - col("lnsum")) /
          (lit(1.0) + (col("invsum") - lit(1.0) / (col("nn") - col("k"))) /
            (lit(3.0) * (col("k") - 1))) * 1000 + 0.5)
          .cast("long").as("k2_milli"))
  }

  /** ABC-XYZ inventory classification: ABC by cumulative revenue share
    * (exact cents cross-multiplication over the descending-revenue
    * prefix — the running sum rides `Scale.globalPrefixSum`, never a
    * single-partition window over parts), XYZ by monthly-demand CV
    * bands via PURE INTEGER cross-multiplication on n·Σq² vs (Σq)².
    *
    * ONE aggregation chain (r18, VERDICT r17 task 5): revenue and the
    * monthly-demand moments come out of the same (pk, month) partial →
    * pk rollup, so both letters are columns of the SAME row — the
    * former rev ⋈ xyz shuffle join (a second full lineitem pass plus a
    * pk-keyed join) is gone; only the prefix sum over the pk-level
    * rows remains between the rollup and the 9-cell final aggregate.
    */
  val liAbcXyz: Q = (s, d) => {
    // integer month key (y·16+m) — date_format's per-row formatter is
    // the scan's hottest expression and the key never surfaces.
    // No separate grand-total branch since r19: the revenue total
    // reads off the prefix sum's bucket-sums table (`totals = true`).
    val per = li(s, d)
      .groupBy(col("l_partkey").as("pk"),
        (year(col("l_shipdate")) * 16 + month(col("l_shipdate"))).as("mo"))
      .agg(sumCents(col("l_extendedprice")).as("rm"),
        sum(round(col("l_quantity"))).cast("long").as("q"))
      .groupBy("pk")
      .agg(sum("rm").cast("long").as("r"), cnt.as("n"),
        sum("q").cast("long").as("sq"),
        sum(col("q") * col("q")).cast("long").as("qq"))
      // LAZY checkpoint (r19): the prefix sum's histogram branch prunes
      // to (__cb, value), so its exchange can't unify with the
      // full-width main exchange (ReuseExchange needs identical
      // schemas) and the (pk, month) rollup — the query's only heavy
      // pass — would replay. Lazy (eager=false) cuts the lineage
      // without the blocking materialization job the old eager
      // checkpoint paid at plan-construction time.
      .transform(Scale.materialize(_))
    val cum = Scale.globalPrefixSums(per,
        coarse = expr("-(r div 1000000)"),
        sortCols = Seq(col("r").desc, col("pk")),
        values = Seq("cr" -> col("r")), totals = true)
      .withColumn("tr", col("cr_tot").cast("long"))
    cum
      .select(
        when(lit(100) * col("cr") <= lit(80) * col("tr"), "A")
          .when(lit(100) * col("cr") <= lit(95) * col("tr"), "B")
          .otherwise("C").as("abc"),
        when(lit(4) * (col("n") * col("qq") - col("sq") * col("sq")) <=
          col("sq") * col("sq"), "X")
          .when(col("n") * col("qq") - col("sq") * col("sq") <=
            col("sq") * col("sq"), "Y")
          .otherwise("Z").as("xyz"))
      .groupBy("abc", "xyz").agg(cnt.as("parts"))
      .orderBy("abc", "xyz")
  }

  /** Newsvendor order quantity at the 0.8 critical ratio: EXACT
    * discrete quantile (the smallest observed daily demand with
    * cumulative probability ≥ 0.8) of daily brand demand.
    */
  val liNewsvendorQty: Q = (s, d) =>
    li(s, d).join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), to_date(col("l_shipdate")).as("dy"))
      .agg(sum(round(col("l_quantity"))).cast("long").as("q"))
      .groupBy("brand")
      .agg(cnt.as("n_days"),
        sort_array(collect_list("q")).as("qs"),
        max("q").cast("long").as("peak"))
      // DuckDB quantile_disc(0.8) = the element at ceil(0.8·n) in sorted
      // order (1-based) — computed exactly from the sorted per-brand
      // day list (bounded: days per brand)
      .select(col("brand"), col("n_days"),
        expr("element_at(qs, cast(ceil(0.8 * size(qs)) as int))")
          .cast("long").as("q80"),
        col("peak"))
      .orderBy("brand")

  val queries: Map[String, Q] = Map(
    "ts_holt_linear" -> tsHoltLinear,
    "customer_kaplan_meier" -> customerKaplanMeier,
    "ml_ndcg_at_k" -> mlNdcgAtK,
    "text_chao1_richness" -> textChao1Richness,
    "nation_kendall_w" -> nationKendallW,
    "alloc_sainte_lague" -> allocSainteLague,
    "li_leadtime_weibull" -> liLeadtimeWeibull,
    "li_bartlett_k2" -> liBartlettK2,
    "li_abc_xyz" -> liAbcXyz,
    "li_newsvendor_qty" -> liNewsvendorQty,
  )
}
