package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-16 query wave (SURVEY §2.20): divisor-method apportionment,
  * Pareto coverage, harmonic centrality over bounded min-plus
  * distances, closed-form Easter computus, interarrival dispersion,
  * price-ladder gaps, trade reciprocity, bit-reversal/Gray expressions,
  * rank autocorrelation, and cohort retention triangles. Exactness per
  * §2.1: integer cents / ppm everywhere; the one double ratio
  * (interarrival CV²) runs IEEE-deterministic ops on exact integer
  * aggregates and floors to milli units.
  */
object Metrics9 {

  private def li(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def orders(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "orders")
  private def cust(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "customer")
  private def supp(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "supplier")
  private def nation(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "nation")
  private def part(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "part")
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "events")

  /** D'Hondt (highest-quotient divisor) apportionment: 1000 seats
    * across nations by revenue cents. Quotients are INTEGER floors
    * (`cents div d`) so both engines rank the same exact values; ties
    * break (quotient desc, nation, divisor). The divisor table is a
    * bounded 25×1000 domain — the rank window rides the
    * [[alloc_largest_remainder]] allowlist class, never fact data.
    * Contrast query to the largest-remainder method: divisor methods
    * favor large parties; the two differ on this corpus.
    */
  val allocDhondt: Q = (s, d) => {
    val w = orders(s, d)
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sumCents(col("o_totalprice")).as("cents"))
    val q = w.select(col("nation"), col("cents"),
        explode(sequence(lit(1), lit(1000))).as("d"))
      .withColumn("quot", expr("cents div d"))
    q.withColumn("rk", row_number().over(
        Window.orderBy(col("quot").desc, col("nation"), col("d"))))
      .filter(col("rk") <= 1000)
      .groupBy("nation").agg(cnt.as("seats"))
      .orderBy("nation")
  }

  /** Pareto coverage (the 80/20 audit): per market segment, the number
    * of customers whose descending-revenue prefix first covers 80% of
    * the segment's revenue (threshold = ceil(0.8·total) in exact
    * cents). Fact collapses to customer grain first; the cumulative
    * window is segment-partitioned — fully parallel.
    */
  val ordersPareto8020: Q = (s, d) => {
    val cr = orders(s, d)
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_custkey").as("ck"))
      .agg(sumCents(col("o_totalprice")).as("cents"))
    val t = cr.groupBy("seg")
      .agg(sum("cents").cast("long").as("tot"), cnt.as("customers"))
    val run = sum("cents").over(Window.partitionBy("seg")
      .orderBy(col("cents").desc, col("ck"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cr.join(broadcast(t), Seq("seg")) // 5-row segment totals: never SMJ
      .withColumn("run", run.cast("long"))
      .groupBy(col("seg").as("segment"))
      .agg(max("customers").cast("long").as("customers"),
        sum(when(col("run") - col("cents") < expr("(tot*4 + 4) div 5"), 1L)
          .otherwise(0L)).cast("long").as("n80"))
      .withColumn("n80_ppm", expr("(1000000 * n80) div customers"))
      .orderBy("segment")
  }

  /** Harmonic centrality over the ≤3-hop min-plus distance matrix of
    * the nation trade graph (edge weight = min supplier→customer ship
    * lag in days): H(v) = Σ_{u≠v} 1e6 // (d(v,u)+1), summed over nodes
    * reached within 3 hops. The matrix is ≤25×25 — every relaxation
    * join is a broadcast over the collapsed aggregate, the
    * [[graph_minplus_3hop]] scale shape.
    */
  val graphHarmonicCentrality: Q = (s, d) => {
    val sn = nation(s, d).select(col("n_nationkey").as("snk"), col("n_name").as("src"))
    val cn = nation(s, d).select(col("n_nationkey").as("cnk"), col("n_name").as("dst"))
    val e = li(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate"))
      .join(supp(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .join(broadcast(cn), col("c_nationkey") === col("cnk"))
      .groupBy("src", "dst")
      .agg(min(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
        .cast("long").as("w"))
      // LAZY checkpoint (r19): the <=625-row matrix feeds minPlus(e,e)
      // twice, minOf once and the second relaxation once - without
      // truncation the 4-way fact join (the query's only heavy pass)
      // replays up to 4x per action
      .transform(graft.ops.Scale.materialize(_))
    def minPlus(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame) =
      a.as("a").join(broadcast(b.as("b")), col("a.dst") === col("b.src"))
        .groupBy(col("a.src").as("src"), col("b.dst").as("dst"))
        .agg(min(col("a.w") + col("b.w")).as("w"))
    def minOf(a: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame) =
      a.select("src", "dst", "w").union(b.select("src", "dst", "w"))
        .groupBy("src", "dst").agg(min("w").as("w"))
    // w12 feeds both sides of the second relaxation; tiny, same idiom
    val w12 = minOf(e, minPlus(e, e)).transform(graft.ops.Scale.materialize(_))
    val dist = minOf(w12, minPlus(w12, e))
    dist.filter(col("src") =!= col("dst"))
      .groupBy(col("src").as("nation"))
      .agg(cnt.as("reached"),
        sum(expr("1000000 div (w + 1)")).cast("long").as("harmonic_ppm"))
      .orderBy("nation")
  }

  /** Gauss's Easter computus — the calendar algorithm as pure integer
    * arithmetic (mod-19 golden number, century corrections, the two
    * classical exception rules), no calendar iteration. Emits each
    * order-year's Easter date and the orders within ±7 days of it.
    * The 7-row year domain broadcasts into the census.
    */
  val dateEasterComputus: Q = (s, d) => {
    val ee = orders(s, d).select(year(col("o_orderdate")).as("y")).distinct()
      .withColumn("a", expr("y % 19"))
      .withColumn("b", expr("y % 4"))
      .withColumn("c", expr("y % 7"))
      .withColumn("k", expr("y div 100"))
      .withColumn("p", expr("(13 + 8*k) div 25"))
      .withColumn("q", expr("k div 4"))
      .withColumn("m", expr("(15 - p + k - q) % 30"))
      .withColumn("n", expr("(4 + k - q) % 7"))
      .withColumn("dd", expr("(19*a + m) % 30"))
      .withColumn("e2", expr("(2*b + 4*c + 6*dd + n) % 7"))
      .withColumn("easter", expr(
        """CASE WHEN dd = 29 AND e2 = 6 THEN make_date(y, 4, 19)
                WHEN dd = 28 AND e2 = 6 AND (11*m + 11) % 30 < 19 THEN make_date(y, 4, 18)
                ELSE date_add(make_date(y, 3, 22), cast(dd + e2 as int)) END"""))
      .select(col("y"), col("easter"))
    orders(s, d).join(broadcast(ee), year(col("o_orderdate")) === col("y"))
      .groupBy(col("y").cast("long").as("yr"),
        month(col("easter")).cast("long").as("easter_month"),
        dayofmonth(col("easter")).cast("long").as("easter_day"))
      .agg(sum(when(abs(datediff(col("easter"), to_date(col("o_orderdate")))) <= 7, 1L)
        .otherwise(0L)).cast("long").as("orders_within_7d"))
      .orderBy("yr")
  }

  /** Interarrival-time dispersion per event type: CV² of the
    * per-(type, user) gap sequence (micros-exact gaps floored to
    * minutes, day-capped). The moments are exact integer sums; the one
    * ratio runs IEEE-deterministic double ops on those exact inputs
    * and floors to milli units — the li_return_wilson_rank discipline.
    * CV² ≈ 1 is Poisson; < 1 regular; > 1 bursty (the Fano complement
    * to events_fano_burstiness, on gaps instead of counts).
    */
  val eventsInterarrivalCv: Q = (s, d) => {
    val w = Window.partitionBy("event_type", "user_id")
      .orderBy(col("ts"), col("event_id"))
    val g = ev(s, d)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("gap_us", col("us") - lag("us", 1).over(w))
      .filter(col("gap_us").isNotNull && col("gap_us") <= 86400000000L)
      .select(col("event_type"), expr("gap_us div 60000000").as("m"))
    g.groupBy("event_type")
      .agg(cnt.as("n"), sum("m").cast("long").as("s"),
        sum(col("m") * col("m")).cast("long").as("s2"))
      .filter(col("s") > 0)
      .select(col("event_type"), col("n"), col("s").as("sum_minutes"),
        expr("cast(floor(1000.0D * (cast(n as double)*cast(s2 as double) - " +
          "cast(s as double)*cast(s as double)) / " +
          "(cast(s as double)*cast(s as double))) as bigint)").as("cv2_milli"))
      .orderBy("event_type")
  }

  /** Price-ladder gaps: per brand, the sorted distinct retail prices'
    * consecutive gaps (exact cents), censused into 100-cent bands
    * (capped at 10) — the assortment-coverage audit. Brand-partitioned
    * lag windows, distinct collapses the fact first.
    */
  val partPriceLadderGaps: Q = (s, d) => {
    val p = part(s, d).select(col("p_brand").as("brand"),
      cents(col("p_retailprice")).as("pc")).distinct()
    p.withColumn("gap", col("pc") - lag("pc", 1).over(
        Window.partitionBy("brand").orderBy("pc")))
      .filter(col("gap").isNotNull)
      .groupBy(expr("least(gap div 100, 10)").cast("long").as("band"))
      .agg(cnt.as("gaps"), min("gap").cast("long").as("min_gap"),
        max("gap").cast("long").as("max_gap"))
      .orderBy("band")
  }

  /** Trade reciprocity: for each nation's outgoing trade edges
    * (supplier nation → customer nation, revenue cents), the share
    * with a reverse edge and the reciprocated MIN-FLOW volume
    * (Σ least(v_ab, v_ba)) — the balanced-trade audit. The edge list
    * is the ≤625-row collapsed aggregate; the reverse lookup is a
    * self left-join on the swapped key.
    */
  val graphEdgeReciprocity: Q = (s, d) => {
    val sn = nation(s, d).select(col("n_nationkey").as("snk"), col("n_name").as("src"))
    val cn = nation(s, d).select(col("n_nationkey").as("cnk"), col("n_name").as("dst"))
    val e = li(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(supp(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .join(broadcast(cn), col("c_nationkey") === col("cnk"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst")
      .agg(sumCents(col("l_extendedprice")).as("v"))
    e.as("a").join(broadcast(e.as("b")),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"), "left")
      .groupBy(col("a.src").as("nation"))
      .agg(cnt.as("out_edges"),
        sum(when(col("b.v").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("reciprocated"),
        sum(when(col("b.v").isNotNull, least(col("a.v"), col("b.v")))
          .otherwise(0L)).cast("long").as("minflow_cents"))
      .withColumn("recip_ppm", expr("(1000000 * reciprocated) div out_edges"))
      .select("nation", "out_edges", "reciprocated", "recip_ppm", "minflow_cents")
      .orderBy("nation")
  }

  /** Bit-reversal (the FFT butterfly permutation) of the key's low 16
    * bits via the classical mask-and-swap ladder, plus the Gray code
    * k ⊕ (k≫1) — pure bitwise expressions with identical semantics in
    * both engines. Census over the reversed value's top-4-bit band:
    * reversal sends the LOW bits high, so a dense key range spreads
    * uniformly — the max_rev/min_rev per band pin the permutation.
    */
  val exprBitReverse: Q = (s, d) => {
    orders(s, d).select(expr("o_orderkey & 65535").as("k"))
      .withColumn("v", expr("shiftleft(k & 21845, 1) | (shiftright(k, 1) & 21845)"))
      .withColumn("v", expr("shiftleft(v & 13107, 2) | (shiftright(v, 2) & 13107)"))
      .withColumn("v", expr("shiftleft(v & 3855, 4) | (shiftright(v, 4) & 3855)"))
      .withColumn("v", expr("shiftleft(v & 255, 8) | (shiftright(v, 8) & 255)"))
      .withColumn("gray", expr("k ^ shiftright(k, 1)"))
      .groupBy(expr("v div 4096").cast("long").as("band"))
      .agg(cnt.as("cnt"),
        sum(expr("bit_count(gray & 255)")).cast("long").as("gray_low_bits"),
        min("v").cast("long").as("min_rev"), max("v").cast("long").as("max_rev"))
      .orderBy("band")
  }

  /** Lag-7 Spearman autocorrelation of the daily order-count series —
    * the rank complement to orders_daily_count_autocorr's Pearson:
    * ρ = 1 − 6Σd²/(n(n²−1)) over deterministic ranks (count, then day),
    * emitted as exact ppm. Fact collapses to the bounded day domain
    * first; the global rank windows run over ~2.4k rows (allowlisted
    * class), the final moment aggregate is 1 row.
    */
  val tsSpearmanAutocorr: Q = (s, d) => {
    val dc = orders(s, d).groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(cnt.as("c"))
    val p = dc.as("a").join(dc.as("b"), col("b.dy") === date_sub(col("a.dy"), 7))
      .select(col("a.dy").as("dy"), col("a.c").as("x"), col("b.c").as("y"))
    val r = p
      .withColumn("rx", row_number().over(Window.orderBy(col("x"), col("dy"))))
      .withColumn("ry", row_number().over(Window.orderBy(col("y"), col("dy"))))
    r.agg(cnt.as("n"),
        sum((col("rx") - col("ry")) * (col("rx") - col("ry"))).cast("long").as("sd2"))
      .select(col("n"), col("sd2"),
        expr("1000000 - (6000000 * sd2) div (n * (n*n - 1))").as("rho_ppm"))
  }

  /** Cohort retention triangle from ORDERS (the transactional
    * complement to events_retention_cohort): customers active per
    * (first-order cohort year, 6-month offset bucket, capped at 8) —
    * distinct-customer counts over the bounded triangle domain.
    */
  val customerCohortRetentionTriangle: Q = (s, d) => {
    val f = orders(s, d).groupBy(col("o_custkey").as("ck"))
      .agg(min(date_trunc("month", col("o_orderdate"))).as("fm"))
    orders(s, d).join(f, col("o_custkey") === col("ck"))
      .withColumn("t", (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) -
        (year(col("fm")) * 12 + month(col("fm"))))
      .groupBy(year(col("fm")).cast("long").as("cohort_year"),
        expr("least(t div 6, 8)").cast("long").as("t_bucket"))
      .agg(countDistinct(col("ck")).cast("long").as("active_customers"))
      .orderBy("cohort_year", "t_bucket")
  }

  val queries: Map[String, Q] = Map(
    "alloc_dhondt" -> allocDhondt,
    "orders_pareto_8020" -> ordersPareto8020,
    "graph_harmonic_centrality" -> graphHarmonicCentrality,
    "date_easter_computus" -> dateEasterComputus,
    "events_interarrival_cv" -> eventsInterarrivalCv,
    "part_price_ladder_gaps" -> partPriceLadderGaps,
    "graph_edge_reciprocity" -> graphEdgeReciprocity,
    "expr_bit_reverse" -> exprBitReverse,
    "ts_spearman_autocorr" -> tsSpearmanAutocorr,
    "customer_cohort_retention_triangle" -> customerCohortRetentionTriangle,
  )
}
