package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-17 query wave (SURVEY §2.21): inequality indices (Theil,
  * Atkinson), time-series diagnostics (rescaled-range Hurst statistic,
  * Ljung–Box Q, Parkinson volatility, Wald–Wolfowitz runs test),
  * categorical association (Cramér's V), one-way ANOVA F, the Josephus
  * closed form, and ISO 7064 mod 97-10 check digits. Exactness per
  * §2.1: every sum feeding a ratio is integer (cents / counts /
  * cross-multiplication); transcendental steps (ln, exp, sqrt) run on
  * identical doubles on both engines with milli/micro round-half-up
  * terminal scaling — the established entropy/surprisal posture.
  * Global windows below rank bounded domains only (order DATES, ~2.4k
  * rows) — the documented single-partition-window policy.
  */
object Metrics12 {

  private def orders(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "orders")
  private def customer(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "customer")
  private def part(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "part")

  /** One-column literal frame for broadcastable parameter lists. */
  private def longsDF(s: org.apache.spark.sql.SparkSession, name: String,
                      xs: Seq[Long]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    xs.toDF(name)
  }

  /** Theil T inequality index of per-customer spend within each order
    * priority: T = (1/n)·Σ (x/μ)·ln(x/μ) over customers. Spend sums are
    * exact cents; one shuffle to the customer grain, the per-priority
    * mean rides a broadcast join.
    */
  val aggTheilIndex: Q = (s, d) => {
    val sp = orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"), col("o_custkey"))
      .agg(sumCents(col("o_totalprice")).cast("double").as("x"))
    val m = sp.groupBy("priority").agg(avg("x").as("mu"), cnt.as("n"))
    sp.join(broadcast(m), Seq("priority"))
      .groupBy("priority")
      .agg(max("n").as("customers"),
        floor(sum((col("x") / col("mu")) * log(col("x") / col("mu")))
          / max("n") * 1000 + 0.5).cast("long").as("theil_milli"))
      .orderBy("priority")
  }

  /** Atkinson inequality index (ε = 1): 1 − geomean/mean of customer
    * spend per market segment — geomean via exp∘avg∘ln, mean from the
    * same exact cents sums.
    */
  val customerAtkinsonIndex: Q = (s, d) => {
    val sp = orders(s, d).join(customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
      .agg(sumCents(col("o_totalprice")).cast("double").as("x"))
    sp.groupBy("segment")
      .agg(cnt.as("customers"),
        floor((lit(1.0) - exp(avg(log(col("x")))) / avg(col("x"))) * 1000000 + 0.5)
          .cast("long").as("atkinson_micro"))
      .orderBy("segment")
  }

  /** Rescaled-range statistic of the daily order-count series at block
    * sizes 8/16/32/64: per consecutive block (remainder dropped),
    * R = range of the cumulative deviation from the block mean and
    * S = population stddev, both derived from EXACT integer sums (an
    * incremental stddev accumulates engine-specific rounding); report
    * mean R/S per window size. The ranking window orders the bounded
    * date domain.
    */
  val tsHurstRs: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(cnt.cast("long").as("x"))
    val idx = daily
      .withColumn("i", row_number().over(Window.orderBy("dy")).cast("long") - 1)
      .select("i", "x")
    val tot = idx.agg(cnt.as("nn"))
    val blk = idx.crossJoin(broadcast(tot))
      .crossJoin(broadcast(longsDF(s, "wsz", Seq(8L, 16L, 32L, 64L))))
      .filter(col("i") < expr("(nn div wsz) * wsz"))
      .withColumn("b", expr("i div wsz"))
    val st = blk.groupBy("wsz", "b")
      .agg(cnt.as("nb"), sum("x").cast("long").as("sb"),
        sum(col("x") * col("x")).cast("long").as("qb"))
    val wb = Window.partitionBy("wsz", "b").orderBy("i")
    val cum = blk.join(st, Seq("wsz", "b"))
      .withColumn("cd", sum("x").over(wb).cast("double") -
        row_number().over(wb) * (col("sb").cast("double") / col("nb")))
    val rs = cum.groupBy("wsz", "b")
      .agg((max("cd") - min("cd")).as("r"))
    rs.join(st, Seq("wsz", "b"))
      .filter(col("qb") * col("nb") > col("sb") * col("sb"))
      .withColumn("rsv", col("r") / sqrt(col("qb").cast("double") / col("nb") -
        (col("sb").cast("double") / col("nb")) * (col("sb").cast("double") / col("nb"))))
      .groupBy(col("wsz").cast("long").as("window_size"))
      .agg(cnt.as("blocks"),
        floor(avg("rsv") * 1000 + 0.5).cast("long").as("rs_milli"))
      .orderBy("window_size")
  }

  /** Ljung–Box Q over lags 1..7 of the daily order-count series:
    * Q = n(n+2)·Σ_k r_k²/(n−k) with r_k the lag-k autocorrelation
    * around the exact integer mean. Lag pairs come from a self-join on
    * the day index (bounded domain).
    */
  val tsLjungBox: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(cnt.cast("long").as("x"))
      .withColumn("i", row_number().over(Window.orderBy("dy")).cast("long"))
      .select("i", "x")
    val tot = daily.agg(sum("x").cast("long").as("tx"), cnt.as("n"))
    val e = daily.crossJoin(broadcast(tot))
      .select(col("i"), (col("x").cast("double") -
        col("tx").cast("double") / col("n")).as("e"), col("n"))
    val den = e.agg(sum(col("e") * col("e")).as("s2"), max("n").as("n"))
    val lagged = e.as("a").join(
        broadcast(longsDF(s, "k", Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))), lit(true))
      .join(e.as("b"), col("b.i") === col("a.i") + col("k"))
      .groupBy("k").agg(sum(col("a.e") * col("b.e")).as("sk"))
    lagged.crossJoin(broadcast(den))
      .withColumn("r", col("sk") / col("s2"))
      .agg(max("n").cast("long").as("n_days"),
        floor(max("n") * (max("n") + 2) *
          sum(col("r") * col("r") / (col("n") - col("k"))) * 1000 + 0.5)
          .cast("long").as("q_milli"))
  }

  /** Cramér's V association between part brand and size:
    * V = √(χ²/(n·(min(r,c)−1))) with χ² from the observed/expected
    * contingency counts. Marginals ride broadcasts (bounded domains).
    */
  val mlCramersV: Q = (s, d) => {
    val o = part(s, d).groupBy(col("p_brand").as("r"), col("p_size").as("c"))
      .agg(cnt.cast("double").as("n"))
    val tot = o.agg(sum("n").as("nn"))
    val rt = o.groupBy("r").agg(sum("n").as("nr"))
    val ct = o.groupBy("c").agg(sum("n").as("nc"))
    val dims = rt.agg(cnt.as("brands")).crossJoin(ct.agg(cnt.as("sizes")))
    o.join(broadcast(rt), Seq("r")).join(broadcast(ct), Seq("c"))
      .crossJoin(broadcast(tot))
      .withColumn("ex", col("nr") * col("nc") / col("nn"))
      .agg(sum(pow(col("n") - col("ex"), 2) / col("ex")).as("x2"),
        max("nn").as("nn"))
      .crossJoin(broadcast(dims))
      .select(col("brands"), col("sizes"), col("nn").cast("long").as("parts"),
        floor(col("x2") * 1000 + 0.5).cast("long").as("chi2_milli"),
        floor(sqrt(col("x2") / (col("nn") *
          (least(col("brands"), col("sizes")) - 1))) * 1000000 + 0.5)
          .cast("long").as("cramers_v_micro"))
  }

  /** One-way ANOVA F of order value (cents) across ISO weekdays. Sums
    * and sums-of-squares are exact (long / decimal(38,0)); the two
    * variance ratios are the only FP steps.
    */
  val ordersWeekdayAnova: Q = (s, d) => {
    val x = cents(col("o_totalprice"))
    val g = orders(s, d)
      .groupBy(expr("(dayofweek(o_orderdate) + 5) % 7 + 1").as("dow"))
      .agg(cnt.as("n"), sum(x).cast("long").as("s"),
        sum(x.cast("decimal(19,0)") * x.cast("decimal(19,0)")).as("q"))
    val t = g.agg(sum("n").as("nn"), sum("s").cast("double").as("ss"), cnt.as("k"))
    g.crossJoin(broadcast(t))
      .agg(
        (sum(col("s").cast("double") * col("s") / col("n")) -
          max(col("ss") * col("ss") / col("nn"))).as("ssb"),
        (sum(col("q").cast("double")) -
          sum(col("s").cast("double") * col("s") / col("n"))).as("ssw"),
        max("k").as("k"), max("nn").as("nn"))
      .select(col("k").cast("long").as("weekdays"),
        col("nn").cast("long").as("n_orders"),
        floor((col("ssb") / (col("k") - 1)) / (col("ssw") / (col("nn") - col("k")))
          * 1000 + 0.5).cast("long").as("f_milli"))
  }

  /** Josephus survivor position (k = 2) for the 1000 key-derived ring
    * sizes 2..1001, via the closed form J(n) = 2·(n − 2^⌊log2 n⌋) + 1;
    * the power of two comes from a pure-integer bit smear (a float log
    * could round wrong at exact powers). Censused into 100-wide bands.
    */
  val exprJosephus: Q = (s, d) =>
    orders(s, d).select(expr("o_orderkey % 1000 + 2").as("n")).distinct()
      .withColumn("sm", expr(
        "n | shiftright(n, 1) | shiftright(n, 2) | shiftright(n, 4) | " +
          "shiftright(n, 8) | shiftright(n, 16)"))
      .withColumn("pos", expr("2 * (n - (shiftright(sm, 1) + 1)) + 1"))
      .groupBy(expr("pos div 100").cast("long").as("band"))
      .agg(cnt.as("seeds"), min("n").cast("long").as("min_n"),
        max("n").cast("long").as("max_n"))
      .orderBy("band")

  /** ISO 7064 mod 97-10 check digits over order keys (the IBAN
    * algorithm): check = 98 − (n·100 mod 97), verified in place —
    * (n·100 + check) mod 97 must be 1 for every key. Pure integer.
    */
  val dqCheckdigitMod97: Q = (s, d) =>
    orders(s, d)
      .select(col("o_orderkey").as("n"),
        (lit(98) - (col("o_orderkey") * 100) % 97).as("ck"))
      .groupBy(col("ck").cast("long").as("check_digit"))
      .agg(cnt.as("keys"),
        sum(when((col("n") * 100 + col("ck")) % 97 === 1, 1L).otherwise(0L))
          .cast("long").as("verified"))
      .orderBy("check_digit")

  /** Wald–Wolfowitz runs test of daily order counts vs their MEAN
    * (above-or-equal via integer cross-multiplication — a double mean
    * could round a tied day differently across engines): observed run
    * count against the normal approximation, z in milli units.
    */
  val ordersRunsTest: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(cnt.cast("long").as("x"))
    val tot = daily.agg(sum("x").cast("long").as("tx"), cnt.as("nd"))
    val sides = daily.crossJoin(broadcast(tot))
      .withColumn("side",
        when(col("x") * col("nd") >= col("tx"), 1L).otherwise(0L))
      .withColumn("brk",
        when(col("side") =!= lag("side", 1).over(Window.orderBy("dy")), 1L)
          .otherwise(0L))
    sides.agg(
        (sum("brk") + 1).cast("double").as("runs"),
        sum("side").cast("double").as("n1"),
        sum(lit(1L) - col("side")).cast("double").as("n2"))
      .select(col("runs").cast("long").as("runs"),
        col("n1").cast("long").as("days_above"),
        col("n2").cast("long").as("days_below"),
        floor((col("runs") - (lit(2) * col("n1") * col("n2") /
            (col("n1") + col("n2")) + 1)) /
          sqrt(lit(2) * col("n1") * col("n2") *
            (lit(2) * col("n1") * col("n2") - col("n1") - col("n2")) /
            ((col("n1") + col("n2")) * (col("n1") + col("n2")) *
              (col("n1") + col("n2") - 1))) * 1000 + 0.5)
          .cast("long").as("z_milli"))
  }

  /** Parkinson volatility of the daily order-value range, monthly:
    * σ_P = √(Σ ln(hi/lo)² / (4·ln2·n)) over the month's days — hi/lo
    * are exact max/min, the log-range sum is the only FP accumulation.
    */
  val tsParkinsonVol: Q = (s, d) =>
    orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dy"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(max("o_totalprice").as("hi"), min("o_totalprice").as("lo"))
      .groupBy("month")
      .agg(cnt.as("n_days"),
        floor(sqrt(sum(pow(log(col("hi") / col("lo")), 2)) /
          (lit(4) * log(lit(2.0)) * cnt)) * 1000000 + 0.5)
          .cast("long").as("parkinson_micro"))
      .orderBy("month")

  val queries: Map[String, Q] = Map(
    "agg_theil_index" -> aggTheilIndex,
    "customer_atkinson_index" -> customerAtkinsonIndex,
    "ts_hurst_rs" -> tsHurstRs,
    "ts_ljung_box" -> tsLjungBox,
    "ml_cramers_v" -> mlCramersV,
    "orders_weekday_anova" -> ordersWeekdayAnova,
    "expr_josephus" -> exprJosephus,
    "dq_checkdigit_mod97" -> dqCheckdigitMod97,
    "orders_runs_test" -> ordersRunsTest,
    "ts_parkinson_vol" -> tsParkinsonVol,
  )
}
