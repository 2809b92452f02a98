package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-18 query wave (SURVEY §2.22): rank/order statistics and
  * operational metrics — Mann-Whitney U, two-sample Kolmogorov-Smirnov,
  * h-index, Lorenz deciles, Jensen-Shannon divergence, MAD, trimmed
  * means, Bowley skewness, Nelson-Aalen hazard, Page-Hinkley drift,
  * log-log elasticity, Cohen's d, Gini-Simpson diversity, Little's law,
  * quartile dispersion, PACF(2), weekday effect, RFM quintile census.
  *
  * Exactness per §2.1: rank statistics stay INTEGER by shipping scaled
  * forms (2·R keeps average-tie ranks integral; KS D scales by n1·n2;
  * Page-Hinkley scales cents by n) or (num, den) pairs where a sign
  * could split floor- vs truncate-division; discrete quantiles are the
  * element at ceil(p·n) under a fully deterministic (value, key) order;
  * FP-derived outputs round once via floor(x·K + 0.5). Global
  * cumulations ride [[Scale.globalPrefixSum]] — never a one-partition
  * window over a data-sized frame; the windows that remain partition by
  * bounded-cardinality keys (segment, flag, priority, nation) or rank
  * aggregated frames (distinct days, customer summaries).
  */
object Metrics14 {

  private def orders(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "orders")
  private def customer(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "customer")
  private def nation(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "nation")
  private def region(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "region")
  private def li(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "lineitem")
  private def part(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "part")

  /** The two-segment order-value sample shared by the MW / KS / Cohen's
    * d trio: (segment, exact cents).
    */
  private def twoSeg(s: org.apache.spark.sql.SparkSession, d: String) =
    orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("seg"), cents(col("o_totalprice")).as("v"))

  /** Per-distinct-value counts with the bucketed cumulative totals the
    * rank statistics need: (v, c1, c2, ct, cumLE) where cumLE is the
    * inclusive prefix of ct in value order — a distributed prefix sum,
    * not a single-partition window.
    */
  private def perValue(s: org.apache.spark.sql.SparkSession, d: String) =
    // LAZY checkpoint (r19, replacing the old eager one): the prefix
    // sum's histogram + window passes both consume this frame, and the
    // orders ⋈ customer aggregation would replay per pass; eager=false
    // materializes it on the first consumer's job instead of a
    // separate blocking job at plan-construction time
    twoSeg(s, d).groupBy("v")
      .agg(sum(when(col("seg") === "BUILDING", 1L).otherwise(0L)).as("c1"),
        sum(when(col("seg") === "MACHINERY", 1L).otherwise(0L)).as("c2"))
      .withColumn("ct", col("c1") + col("c2"))
      .transform(Scale.materialize(_))

  private def rankFrame(s: org.apache.spark.sql.SparkSession, d: String) =
    Scale.globalPrefixSums(perValue(s, d), coarse = expr("v div 1000000"),
        sortCols = Seq(col("v")), values = Seq("cumLE" -> col("ct")))

  /** Mann-Whitney rank-sum between BUILDING and MACHINERY order values,
    * average-tie ranks kept integral as 2R: each value's rows
    * contribute c1·(2·cntLT + ct + 1), u2 = 2R1 − n1(n1+1). Pure
    * integers end to end.
    */
  val mwUSegments: Q = (s, d) => {
    rankFrame(s, d)
      .agg(sum("c1").cast("long").as("n1"), sum("c2").cast("long").as("n2"),
        sum(col("c1") * (lit(2) * (col("cumLE") - col("ct")) + col("ct") + 1))
          .as("r2"))
      .select(col("n1"), col("n2"),
        (col("r2") - col("n1") * (col("n1") + 1)).cast("long").as("u2"))
  }

  /** Two-sample Kolmogorov-Smirnov D scaled by n1·n2 (exact integer):
    * max over values of |n2·F1 − n1·F2|, cumulatives by a second
    * bucketed prefix sum over the same per-value frame.
    */
  val ksPriceSegments: Q = (s, d) => {
    // both cumulatives (all-rows cumLE and BUILDING-only f1) ride ONE
    // fused prefix-sum pass (r19) — one shuffle, one window — and the
    // n1/n2 totals read off its bucket-sums table for free
    // (`totals = true`), replacing the former second pass + checkpoint
    // + totals-aggregate branch
    val withF1 = Scale.globalPrefixSums(perValue(s, d),
        coarse = expr("v div 1000000"), sortCols = Seq(col("v")),
        values = Seq("cumLE" -> col("ct"), "f1" -> col("c1")),
        totals = true)
      .select(col("f1_tot").cast("long").as("n1"),
        (col("cumLE_tot") - col("f1_tot")).cast("long").as("n2"),
        col("cumLE"), col("f1"))
    withF1
      .select(col("n1"), col("n2"),
        abs(col("n2") * col("f1") - col("n1") * (col("cumLE") - col("f1")))
          .as("dv"))
      .groupBy("n1", "n2")
      .agg(max("dv").cast("long").as("d_scaled"))
  }

  /** h-index of customers by order count per market segment — the
    * largest h such that h customers place ≥ h orders. Windows
    * partition by the 5-value segment key.
    */
  val custHIndex: Q = (s, d) => {
    val oc = orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
      .agg(cnt.as("n"))
    val w = Window.partitionBy("segment").orderBy(col("n").desc, col("o_custkey"))
    oc.withColumn("r", row_number().over(w))
      .groupBy("segment")
      .agg(coalesce(max(when(col("n") >= col("r"), col("r"))), lit(0L))
          .cast("long").as("h_index"),
        cnt.as("customers"))
      .orderBy("segment")
  }

  /** Lorenz curve: cumulative revenue share (milli, exact floor of
    * cents) at each customer decile per segment; deciles by ntile(10)
    * over the deterministic (revenue, custkey) order.
    */
  val lorenzDecileShare: Q = (s, d) => {
    val cr = orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey").as("ck"))
      .agg(sumCents(col("o_totalprice")).as("r"))
    val dW = Window.partitionBy("segment").orderBy(col("r"), col("ck"))
    val g = cr.withColumn("dc", ntile(10).over(dW))
      .groupBy("segment", "dc").agg(sum("r").as("dr"))
    val t = cr.groupBy("segment").agg(sum("r").as("tot"))
    val cum = Window.partitionBy("segment").orderBy("dc")
    g.join(broadcast(t), "segment")
      .withColumn("cum", sum("dr").over(cum))
      .select(col("segment"), col("dc").cast("long").as("decile"),
        expr("(1000 * cum) div tot").cast("long").as("cum_share_milli"))
      .orderBy("segment", "decile")
  }

  /** Jensen-Shannon divergence between two nations' order-value
    * distributions over 50k-dollar buckets (micro; zero-mass terms
    * contribute nothing).
    */
  val jsDivNationPrices: Q = (s, d) => {
    val src = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("NATION_3", "NATION_7"))
      .select(col("n_name").as("nat"), cents(col("o_totalprice")).as("cv"))
      .select(col("nat"), expr("cv div 5000000").as("b"))
    val pb = src.groupBy("b")
      .agg(sum(when(col("nat") === "NATION_3", 1L).otherwise(0L)).as("cg"),
        sum(when(col("nat") === "NATION_7", 1L).otherwise(0L)).as("cf"))
    val n = pb.agg(sum("cg").cast("long").as("ng"), sum("cf").cast("long").as("nf"))
    pb.crossJoin(broadcast(n))
      .select(col("ng"), col("nf"),
        (col("cg").cast("double") / col("ng")).as("p"),
        (col("cf").cast("double") / col("nf")).as("q"))
      .select(col("ng"), col("nf"),
        (lit(0.5) * when(col("p") > 0,
            col("p") * log(col("p") / ((col("p") + col("q")) / 2))).otherwise(0.0)
          + lit(0.5) * when(col("q") > 0,
            col("q") * log(col("q") / ((col("p") + col("q")) / 2))).otherwise(0.0))
          .as("term"))
      .groupBy("ng", "nf")
      .agg(floor(sum("term") * 1000000 + 0.5).cast("long").as("js_micro"))
      .select(col("ng").as("n_a"), col("nf").as("n_b"), col("js_micro"))
  }

  /** Median absolute deviation of quantity per return flag — both
    * medians are the exact discrete element at (n+1) div 2 under the
    * per-flag value order.
    *
    * r19 rework: quantity rounds to a BOUNDED integer domain (~50
    * values), so the medians read off a per-(flag, value) COUNT frame
    * (~150 rows) instead of row-ranking the fact table twice through
    * 3-partition windows (flag cardinality capped the old windows at
    * 3-way parallelism and each median was a full-data pass). The
    * element at position k = the smallest value whose cumulative count
    * reaches k — identical to the row_number formulation for any
    * duplicate multiset; the AD counts derive from the SAME value
    * counts (no second fact pass at all).
    */
  val liMadQuantity: Q = (s, d) => {
    val counts = li(s, d).select(col("l_returnflag").as("flag"),
        round(col("l_quantity")).cast("long").as("v"))
      .groupBy("flag", "v").agg(cnt.as("c"))
      .transform(Scale.materialize(_)) // two consumers; upstream is the only fact pass
    def discreteMedian(df: org.apache.spark.sql.DataFrame, c: String) = {
      val w = Window.partitionBy("flag").orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("flag")
      df.withColumn("cum", sum("c").over(w))
        .withColumn("n", sum("c").over(wn))
        .filter(col("cum") - col("c") < expr("(n + 1) div 2") &&
          col("cum") >= expr("(n + 1) div 2")) // integral division
        .select(col("flag"), col(c).as("med"))
    }
    val m = discreteMedian(counts, "v").withColumnRenamed("med", "median_qty")
    val adCounts = counts.join(broadcast(m), "flag")
      .select(col("flag"), abs(col("v") - col("median_qty")).as("a"), col("c"))
      .groupBy("flag", "a").agg(sum("c").as("c"))
    discreteMedian(adCounts, "a").withColumnRenamed("med", "mad_qty")
      .join(broadcast(m), "flag")
      .select(col("flag").as("returnflag"), col("median_qty").cast("long"),
        col("mad_qty").cast("long"))
      .orderBy("returnflag")
  }

  /** 10%-trimmed acctbal per nation: drop floor(n/10) customers from
    * each end of the (cents, custkey) order; ship the exact
    * (count, sum) pair — cents can be negative, so no integer division
    * crosses the floor-vs-truncate engine gap.
    */
  val nationTrimmedMeanBal: Q = (s, d) => {
    val b = customer(s, d).join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("c_custkey").as("ck"),
        cents(col("c_acctbal")).as("v"))
    val w = Window.partitionBy("nation").orderBy(col("v"), col("ck"))
    val wn = Window.partitionBy("nation")
    b.withColumn("i", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .filter(col("i") > expr("n div 10") &&
        col("i") <= col("n") - expr("n div 10"))
      .groupBy("nation")
      .agg(cnt.as("kept"), sum("v").cast("long").as("kept_cents"))
      .orderBy("nation")
  }

  /** Bowley quartile skewness of order value per priority: exact
    * discrete quartiles at ceil(p·n), shipped as the (num, den) pair.
    */
  val ordersBowleySkew: Q = (s, d) => {
    val v = orders(s, d).select(col("o_orderpriority").as("priority"),
      cents(col("o_totalprice")).as("v"))
    val w = Window.partitionBy("priority").orderBy(col("v"))
    val wn = Window.partitionBy("priority")
    v.withColumn("i", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("priority")
      .agg(
        max(when(col("i") === ceil(lit(0.25) * col("n")).cast("long"), col("v")))
          .cast("long").as("q1"),
        max(when(col("i") === ceil(lit(0.50) * col("n")).cast("long"), col("v")))
          .cast("long").as("q2"),
        max(when(col("i") === ceil(lit(0.75) * col("n")).cast("long"), col("v")))
          .cast("long").as("q3"))
      .select(col("priority"), col("q1"), col("q3"),
        (col("q3") + col("q1") - lit(2) * col("q2")).cast("long").as("bowley_num"),
        (col("q3") - col("q1")).cast("long").as("bowley_den"))
      .orderBy("priority")
  }

  /** Nelson-Aalen cumulative hazard of the order→ship lag per return
    * flag at lag ≤ 30 days: H = Σ d_t / n_t with n_t the suffix count
    * (t' ≥ t), a per-flag descending cumulative over distinct lags.
    */
  val nelsonAalenHazard: Q = (s, d) => {
    val t = li(s, d).join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate"))
      .select(col("l_returnflag").as("flag"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("t"))
    val g = t.groupBy("flag", "t").agg(cnt.as("d"))
    val w = Window.partitionBy("flag").orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("n", sum("d").over(w))
      .groupBy("flag")
      .agg(floor(sum(when(col("t") <= 30,
          col("d").cast("double") / col("n")).otherwise(0.0)) * 1000000 + 0.5)
        .cast("long").as("na30_micro"))
      .select(col("flag").as("returnflag"), col("na30_micro"))
      .orderBy("returnflag")
  }

  /** Page-Hinkley drift statistic on daily order revenue, exactly:
    * M_t = n·cumsum(x) − t·S (cents scaled by n, all integers),
    * PH = max drawup of M in day order. Windows run over the
    * aggregated day frame (thousands of rows), not raw orders.
    */
  val pageHinkleyRevenue: Q = (s, d) => {
    val day = orders(s, d).groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sumCents(col("o_totalprice")).as("x"))
    val n = day.agg(cnt.as("n"), sum("x").cast("long").as("s"))
    val w = Window.orderBy("dy")
    val wc = Window.orderBy("dy")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    day.crossJoin(broadcast(n))
      .withColumn("mt",
        col("n") * sum("x").over(wc) - row_number().over(w) * col("s"))
      .withColumn("u", col("mt") - min("mt").over(wc))
      .agg(max("n").cast("long").as("n_days"),
        max("u").cast("long").as("ph_scaled"))
  }

  /** Log-log demand elasticity per brand: OLS slope of ln(quantity) on
    * ln(unit price) across lineitems (milli).
    */
  val elasticityBrandLoglog: Q = (s, d) => {
    li(s, d).join(part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(col("l_quantity") >= 1)
      .select(col("p_brand").as("brand"),
        log(col("l_extendedprice").cast("double") / col("l_quantity")).as("lx"),
        log(round(col("l_quantity")).cast("double")).as("ly"))
      .groupBy("brand")
      .agg(cnt.as("n"),
        floor((avg(col("lx") * col("ly")) - avg("lx") * avg("ly")) /
          (avg(col("lx") * col("lx")) - avg("lx") * avg("lx")) * 1000 + 0.5)
          .cast("long").as("slope_milli"))
      .orderBy("brand")
  }

  /** Cohen's d between BUILDING and MACHINERY order values (pooled
    * unbiased variance, micro).
    */
  val cohensDSegments: Q = (s, d) => {
    val g = twoSeg(s, d).groupBy("seg")
      .agg(cnt.as("n"), avg(col("v").cast("double")).as("m"),
        ((sum(col("v").cast("double") * col("v")) -
          cnt * avg(col("v").cast("double")) * avg(col("v").cast("double"))) /
          (cnt - 1)).as("s2"))
    g.agg(
        max(when(col("seg") === "BUILDING", col("n"))).as("n1"),
        max(when(col("seg") === "MACHINERY", col("n"))).as("n2"),
        max(when(col("seg") === "BUILDING", col("m"))).as("m1"),
        max(when(col("seg") === "MACHINERY", col("m"))).as("m2"),
        max(when(col("seg") === "BUILDING", col("s2"))).as("s21"),
        max(when(col("seg") === "MACHINERY", col("s2"))).as("s22"))
      .select(col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
        floor((col("m1") - col("m2")) /
          sqrt(((col("n1") - 1) * col("s21") + (col("n2") - 1) * col("s22")) /
            (col("n1") + col("n2") - 2)) * 1000000 + 0.5)
          .cast("long").as("d_micro"))
  }

  /** Gini-Simpson diversity of market segments within each region —
    * exact integer micro: (N² − Σn_i²)·10⁶ div N² (all positive, so
    * floor- and truncate-division agree).
    */
  val giniSimpsonRegion: Q = (s, d) => {
    customer(s, d)
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("c_mktsegment").as("seg"))
      .agg(cnt.as("n"))
      .groupBy("region")
      .agg(sum("n").cast("long").as("customers"),
        sum(col("n") * col("n")).as("s2"))
      .select(col("region"), col("customers"),
        expr("(1000000 * (customers * customers - s2)) div (customers * customers)")
          .cast("long").as("gs_micro"))
      .orderBy("region")
  }

  /** Little's law: average open orders per day over the corpus span —
    * each order open o_orderdate → its last shipdate (inclusive),
    * L·1000 = 1000·Σdur div span (positive, engine-agreed division).
    */
  val littleLawOpenorders: Q = (s, d) => {
    val o = orders(s, d).join(li(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg((datediff(to_date(max(col("l_shipdate"))), to_date(col("o_orderdate"))) + 1)
        .cast("long").as("dur"))
    val sp = orders(s, d).agg(
      (datediff(to_date(max(col("o_orderdate"))), to_date(min(col("o_orderdate")))) + 1)
        .cast("long").as("span"))
    o.crossJoin(broadcast(sp))
      .groupBy("span")
      .agg(cnt.as("n_orders"), sum("dur").as("sd"))
      .select(col("span").as("span_days"), col("n_orders"),
        expr("(1000 * sd) div span").cast("long").as("l_milli"))
  }

  /** Quartile coefficient of dispersion of order value per priority —
    * exact discrete quartiles, positive milli division.
    */
  val ordersQuartileDispersion: Q = (s, d) => {
    val v = orders(s, d).select(col("o_orderpriority").as("priority"),
      cents(col("o_totalprice")).as("v"))
    val w = Window.partitionBy("priority").orderBy(col("v"))
    val wn = Window.partitionBy("priority")
    v.withColumn("i", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("priority")
      .agg(
        max(when(col("i") === ceil(lit(0.25) * col("n")).cast("long"), col("v")))
          .cast("long").as("q1"),
        max(when(col("i") === ceil(lit(0.75) * col("n")).cast("long"), col("v")))
          .cast("long").as("q3"))
      .select(col("priority"), col("q1"), col("q3"),
        expr("(1000 * (q3 - q1)) div (q3 + q1)").cast("long").as("qcd_milli"))
      .orderBy("priority")
  }

  /** Partial autocorrelation at lag 2 of daily revenue via
    * Durbin-Levinson: pacf2 = (r2 − r1²)/(1 − r1²), Pearson autocorrs
    * over the full-population denominator (milli). Day-frame windows.
    */
  val pacf2DailyRevenue: Q = (s, d) => {
    val day = orders(s, d).groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sumCents(col("o_totalprice")).cast("double").as("x"))
      .localCheckpoint() // tiny day frame, four consumers below
    val w = Window.orderBy("dy")
    val lagged = day.withColumn("x1", lag("x", 1).over(w))
      .withColumn("x2", lag("x", 2).over(w))
    val m = day.agg(avg("x").as("mu"), cnt.as("n"))
    val mu = m.head().getDouble(0)
    val den = day.agg(sum((col("x") - mu) * (col("x") - mu))).head().getDouble(0)
    val r = lagged.agg(
      (sum(when(col("x1").isNotNull, (col("x") - mu) * (col("x1") - mu))
        .cast("double")) / den).as("r1"),
      (sum(when(col("x2").isNotNull, (col("x") - mu) * (col("x2") - mu))
        .cast("double")) / den).as("r2"))
    r.crossJoin(broadcast(m.select(col("n"))))
      .select(col("n").cast("long").as("n_days"),
        floor(col("r1") * 1000 + 0.5).cast("long").as("acf1_milli"),
        floor((col("r2") - col("r1") * col("r1")) /
          (lit(1.0) - col("r1") * col("r1")) * 1000 + 0.5)
          .cast("long").as("pacf2_milli"))
  }

  /** Weekday effect via the engine-neutral epoch-day mod 7 (both
    * engines compute days-since-1970 % 7 on non-negative values):
    * order count and exact truncated-average cents per weekday.
    */
  val ordersWeekdayEffect: Q = (s, d) => {
    orders(s, d)
      .groupBy((datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01"))) % 7)
        .cast("long").as("wd"))
      .agg(cnt.as("n"), sumCents(col("o_totalprice")).as("sc"))
      .select(col("wd"), col("n"), expr("sc div n").cast("long").as("avg_cents"))
      .orderBy("wd")
  }

  /** RFM quintile cell census: recency/frequency/monetary ntile(5)
    * scores under deterministic (metric, custkey) orders, 125-cell
    * grid. All three rankings ride ONE [[Scale.globalNtileFused]] pass
    * (r19): one shuffle of 3·n narrow (dim, bucket, sort) records, one
    * offsets broadcast, one window — replacing the former sequential
    * 3-level globalRank fold whose per-level checkpoints cost ~12 tiny
    * stages. Orders are identical: recency ranks DESC via the negated
    * sort value (its coarse bucket negated to stay monotone), ties by
    * custkey; the fused tile formula is SQL ntile's closed form, so the
    * oracle pins bit-equality.
    */
  val custRfmCells: Q = (s, d) => {
    val h = orders(s, d).agg(max(to_date(col("o_orderdate"))).as("h"))
    val cm = orders(s, d).groupBy(col("o_custkey").as("ck"))
      .agg(max(to_date(col("o_orderdate"))).as("last"),
        cnt.as("freq"), sumCents(col("o_totalprice")).as("mon"))
      .crossJoin(broadcast(h))
      .select(col("ck"), datediff(col("h"), col("last")).cast("long").as("rec"),
        col("freq"), col("mon"))
    Scale.globalNtileFused(cm, 5, col("ck"), Seq(
        ("r", -expr("rec div 64"), -col("rec")),
        ("f", expr("freq div 4"), col("freq")),
        ("m", expr("mon div 100000000"), col("mon"))))
      .groupBy(col("r"), col("f"), col("m"))
      .agg(cnt.as("customers"))
      .orderBy("r", "f", "m")
  }

  val queries: Map[String, Q] = Map(
    "mw_u_segments" -> mwUSegments,
    "ks_price_segments" -> ksPriceSegments,
    "cust_h_index" -> custHIndex,
    "lorenz_decile_share" -> lorenzDecileShare,
    "js_div_nation_prices" -> jsDivNationPrices,
    "li_mad_quantity" -> liMadQuantity,
    "nation_trimmed_mean_bal" -> nationTrimmedMeanBal,
    "orders_bowley_skew" -> ordersBowleySkew,
    "nelson_aalen_hazard" -> nelsonAalenHazard,
    "page_hinkley_revenue" -> pageHinkleyRevenue,
    "elasticity_brand_loglog" -> elasticityBrandLoglog,
    "cohens_d_segments" -> cohensDSegments,
    "gini_simpson_region" -> giniSimpsonRegion,
    "little_law_openorders" -> littleLawOpenorders,
    "orders_quartile_dispersion" -> ordersQuartileDispersion,
    "pacf2_daily_revenue" -> pacf2DailyRevenue,
    "orders_weekday_effect" -> ordersWeekdayEffect,
    "cust_rfm_cells" -> custRfmCells)
}
