package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Util._
import graft.tables.Tables

/** Round-10 wave: reconciliation audits, bilateral netting, bounded
  * iterative graph analyses (k-core, BFS layers), robust trend and
  * burstiness statistics, corpus vocabulary-richness and
  * document-stitching detectors, survival analysis, and inter-rater
  * agreement — each oracled per SURVEY §2.1 (integer cents, ppm via
  * truncating div, bounded-domain windows only).
  */
object Audits {

  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def orders(s: SparkSession, d: String) = Tables.t(s, d, "orders")
  private def customer(s: SparkSession, d: String) = Tables.t(s, d, "customer")
  private def supplier(s: SparkSession, d: String) = Tables.t(s, d, "supplier")
  private def nation(s: SparkSession, d: String) = Tables.t(s, d, "nation")
  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  /** Order-total reconciliation audit — the invoice-vs-line-items
    * check every settlement pipeline runs: each order's stored total
    * vs the recomputed Σ extendedprice·(1−discount)·(1+tax) over its
    * lines, bucketed exact / within-1% / over-1% / no-lines, with the
    * summed absolute discrepancy in integer cents (R2: per-row double
    * products are bit-identical across engines, sums are integer).
    * The 1% boundary is integer arithmetic: |diff|·100 ≤ |stored|.
    */
  val dqOrderTotalRecon: Q = (s, d) => {
    val calc = li(s, d).groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
                     (lit(1.0) + col("l_tax")))).cast("long").as("calc_c"))
    orders(s, d)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("stored_c"))
      .join(calc, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .withColumn("diff", abs(col("stored_c") - col("calc_c")))
      .withColumn("bucket",
        when(col("calc_c").isNull, "d_no_lines")
          .when(col("diff") === 0, "a_exact")
          .when(col("diff") * 100 <= abs(col("stored_c")), "b_within_1pct")
          .otherwise("c_over_1pct"))
      .groupBy("bucket")
      .agg(cnt.as("n_orders"),
           sum(coalesce(col("diff"), lit(0L))).cast("long").as("abs_diff_cents"))
      .orderBy("bucket")
  }

  /** Bilateral trade netting — the settlement-netting census between
    * counterparty NATIONS: revenue flowing seller-nation → buyer-nation
    * per unordered pair, both gross directions plus the net position
    * (the amount one wire transfer would settle). Flows are integer
    * cents; dimension joins broadcast; top-20 pairs by gross.
    */
  val reconNationNetting: Q = (s, d) => {
    val n1 = nation(s, d).select(col("n_nationkey").as("bk"), col("n_name").as("buyer"))
    val n2 = nation(s, d).select(col("n_nationkey").as("sk"), col("n_name").as("seller"))
    val flows = li(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(col("c_nationkey").as("bn"), col("s_nationkey").as("sn"),
              cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"))
    flows
      .select(least(col("bn"), col("sn")).as("na"),
              greatest(col("bn"), col("sn")).as("nb"),
              when(col("sn") === least(col("bn"), col("sn")), col("c"))
                .otherwise(lit(0L)).as("ab"),
              when(col("sn") === greatest(col("bn"), col("sn")), col("c"))
                .otherwise(lit(0L)).as("ba"))
      .groupBy("na", "nb")
      .agg(sum("ab").cast("long").as("a_to_b_cents"),
           sum("ba").cast("long").as("b_to_a_cents"))
      .withColumn("gross_cents", col("a_to_b_cents") + col("b_to_a_cents"))
      .withColumn("net_a_cents", col("a_to_b_cents") - col("b_to_a_cents"))
      .join(broadcast(n1.select(col("bk").as("na"), col("buyer").as("nation_a"))), "na")
      .join(broadcast(n2.select(col("sk").as("nb"), col("seller").as("nation_b"))), "nb")
      .select("nation_a", "nation_b", "a_to_b_cents", "b_to_a_cents",
              "gross_cents", "net_a_cents")
      .orderBy(col("gross_cents").desc, col("nation_a"), col("nation_b"))
      .limit(20)
  }

  /** Bipartite part↔supplier edges (parts even node ids, suppliers
    * odd) — the shared substrate of the graph exemplars. */
  private def bipartite(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()

  /** The peel loop of [[graphKcore]] (2-core decomposition, ≤ 4 peel
    * rounds; declared semantics: the census after EXACTLY 4 rounds of
    * "recompute degrees over the surviving edges, drop every edge
    * touching a degree-<2 node" — the `graph_cc_minlabel` convention,
    * identical on both engines), over any (a, b) edge list —
    * extracted so AuditsKcoreSpec can drive it with synthetic graphs
    * that actually peel (the TPC-H bipartite graph is its own 2-core
    * at every SF: no node has degree < 2, so the corpus never
    * exercises rounds past the first fixpoint probe).
    *
    * r20 rework (VERDICT r19 #1, guide §1.2/§2.3):
    *  - INCREMENTAL DEGREES: the full-edge degree aggregate runs ONCE,
    *    before the loop; each round maintains the table by subtracting
    *    the peeled endpoints' contributions — the per-round aggregate
    *    is keyed on the edges the peel frontier touches, never the
    *    survivor edge set. The maintenance joins are all keyed on `n`:
    *    deg's aggregate partitioning carries through `materialize`, so
    *    the node table never re-shuffles round-over-round.
    *  - FIXPOINT EXIT: an empty peel cannot change any degree, so
    *    every remaining round is a provable no-op — the loop stops at
    *    the first empty frontier instead of running the declared 4
    *    rounds against an unchanged edge set (the census is identical
    *    BY CONSTRUCTION, at any scale; the declared "exactly 4 rounds"
    *    semantics only bound how far peeling may proceed). On this
    *    corpus that is round 1: the whole query collapses to one
    *    degree aggregate + the fixpoint probe + the census.
    */
  private[graft] def kcoreCensus(edges: DataFrame, rounds: Int = 4): DataFrame = {
    var e = edges.localCheckpoint()
    var deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(cnt.as("deg"))
      .transform(graft.ops.Scale.materialize(_))
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      // deg is materialized, so each peel probe below replays only a
      // filter over its blocks (the r19 canonicalization caveat — the
      // renamed probe subtrees never share a plan — costs nothing now)
      val peel = deg.filter(col("deg") < 2).select("n")
        .transform(graft.ops.Scale.materialize(_))
      if (peel.isEmpty) done = true
      else {
        // one edge pass per round: flag both endpoints against the
        // peel set (broadcast hash probes — the edges never shuffle),
        // checkpoint the flagged frame once; the survivors and the
        // frontier delta are FILTERS over its blocks, so the peel
        // broadcasts build once per round, not once per consumer
        val flagged = e
          .join(peel.select(col("n").as("a"), lit(true).as("__pa")), Seq("a"), "left_outer")
          .join(peel.select(col("n").as("b"), lit(true).as("__pb")), Seq("b"), "left_outer")
          .localCheckpoint(false)
        e = flagged.filter(col("__pa").isNull && col("__pb").isNull)
          .select("a", "b")
        if (r < rounds) {
          // degree maintenance: a surviving endpoint loses one degree
          // per incident edge whose OTHER endpoint peeled — exactly the
          // removed-edge incidences, a frontier-sized aggregate. (A
          // node whose edges all die keeps a 0-degree row; it peels
          // next round and its probes match nothing — census-neutral.)
          val delta = flagged.filter(col("__pa").isNotNull || col("__pb").isNotNull)
            .select(explode(array(
              when(col("__pa").isNull, col("a")),
              when(col("__pb").isNull, col("b")))).as("n"))
            .filter(col("n").isNotNull)
            .groupBy("n").agg(cnt.as("dd"))
          deg = deg.join(peel, Seq("n"), "left_anti")
            .join(delta, Seq("n"), "left_outer")
            .select(col("n"), (col("deg") - coalesce(col("dd"), lit(0L))).as("deg"))
            .transform(graft.ops.Scale.materialize(_))
        }
      }
      r += 1
    }
    val nodes = e.select(col("a").as("n")).union(e.select(col("b").as("n"))).distinct()
    e.agg(cnt.as("n_edges"))
      .crossJoin(broadcast(nodes.agg(
        cnt.as("n_nodes"),
        sum(when(col("n") % 2 === 0, 1L).otherwise(0L)).cast("long").as("n_parts"),
        sum(when(col("n") % 2 === 1, 1L).otherwise(0L)).cast("long").as("n_suppliers"))))
      .select("n_edges", "n_nodes", "n_parts", "n_suppliers")
  }

  val graphKcore: Q = (s, d) => kcoreCensus(bipartite(s, d))

  /** Multi-source BFS layers: distance (in hops, 4 rounds) from the
    * suppliers of nation 0 across the bipartite graph; census of node
    * counts per distance, unreached nodes at distance −1. Declared
    * semantics: distance = first round reached within 4 rounds. Each
    * round is one frontier equi-join + an anti-join against the
    * settled set; lineage truncates per round.
    */
  val graphBfsLayers: Q = (s, d) => {
    val e0 = bipartite(s, d)
    // pre-partitioned by the frontier-join key (a); hash(a) survives
    // the checkpoint, so no BFS round re-shuffles the adjacency (r19)
    val und = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("a"))
      .transform(graft.ops.Scale.materialize(_))
    val allNodes = und.select(col("a").as("n")).distinct()
    var settled = supplier(s, d).filter(col("s_nationkey") === 0)
      .select((col("s_suppkey") * 2 + 1).as("n"))
      .join(allNodes, Seq("n"), "left_semi") // seeds absent from the graph don't count
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    for (r <- 1 to 4) {
      val frontier = settled.filter(col("dist") === (r - 1))
      // NOTE (r20): anti-before-distinct (filter before the exchange,
      // guide §2.3) was A/B'd and REJECTED — moving the settled anti
      // probe below the raw neighbor fan-out re-planned it off the
      // broadcast path and the row went 1.0 → 2.0 s; the dedup-first
      // order keeps the anti probe settled×|next| instead of
      // settled×|neighbor fan-out|.
      val next = und.join(frontier, und("a") === frontier("n"))
        .select(und("b").as("n")).distinct()
        .join(settled, Seq("n"), "left_anti")
        .withColumn("dist", lit(r.toLong))
      settled = settled.union(next).localCheckpoint(false)
    }
    allNodes
      .join(settled, Seq("n"), "left_outer")
      .select(coalesce(col("dist"), lit(-1L)).as("dist"))
      .groupBy("dist").agg(cnt.as("n_nodes"))
      .orderBy("dist")
  }

  /** Theil–Sen robust trend of daily purchase revenue: the median of
    * all pairwise slopes — outlier days move the OLS slope
    * (`win_regr_slope` family) but barely move this. Slopes are exact
    * integer ppm (cents diff ·10⁶ div day gap); pairs come from an
    * EQUI-join on day+offset over the bounded ~30-day domain (the
    * `ts_acf_lags` idiom — never a BNLJ); the median reads off the
    * sorted bounded slope list (lower median, the `ts_outlier_iqr`
    * convention).
    */
  val tsTheilSenTrend: Q = (s, d) => {
    val daily = ev(s, d).filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("dd"))
      .agg(sumCents(col("value")).as("c"))
    val offsets = daily.select(col("dd"), col("c"),
      explode(sequence(lit(1), lit(29))).as("k"))
      .select(date_add(col("dd"), col("k")).as("d2"), col("dd").as("d1"),
              col("c").as("c1"), col("k"))
    val slopes = offsets
      .join(daily.select(col("dd").as("d2"), col("c").as("c2")), "d2")
      .select(expr("div(cast(c2 - c1 as bigint) * 1000000, k)").as("slope_ppm"))
    slopes.agg(cnt.as("n_pairs"),
               sort_array(collect_list(col("slope_ppm"))).as("sl"),
               sum("slope_ppm").cast("long").as("ssum"))
      .select(col("n_pairs"),
        element_at(col("sl"), ((col("n_pairs") + 1) / 2).cast("int")).as("median_slope_ppm"),
        expr("div(ssum, n_pairs)").cast("long").as("mean_slope_ppm"))
  }

  /** Vocabulary richness per (lang, source): token count, type count,
    * hapax legomena (count-1 types), type-token ratio and hapax share
    * in exact ppm — the lexical-diversity corpus-health battery
    * (complements `text_zipf_slope` / `text_vocab_growth`). One token
    * explode + two keyed aggregates, linear.
    */
  val textTtrHapax: Q = (s, d) =>
    docs(s, d)
      .select(col("lang"), col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "source", "tok").agg(cnt.as("c"))
      .groupBy("lang", "source")
      .agg(sum("c").cast("long").as("n_tokens"),
           cnt.as("n_types"),
           sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("n_hapax"))
      .select(col("lang"), col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("div(n_types * 1000000, n_tokens)").cast("long").as("ttr_ppm"),
        expr("div(n_hapax * 1000000, n_types)").cast("long").as("hapax_ppm"))
      .orderBy("lang", "source")

  /** Document-stitching detector: pairs where doc A's LAST 2 tokens
    * equal doc B's FIRST 2 tokens within a (lang, source) block — the
    * split-document signature a chunked crawl leaves behind (the
    * complement of dedup: these pairs should be RE-JOINED, not
    * dropped). A pure equi-join on the boundary shingle — linear in
    * docs; shuffle-hash per the string-key house rule. (Boundary
    * width 2: this corpus's vocabulary yields zero natural 3-gram
    * boundary collisions at the smallest SF — a vacuous query would
    * pass the hash gate without testing anything.)
    */
  val textBoundaryStitch: Q = (s, d) => {
    val t = docs(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
              split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 4)
    val tails = t.select(col("doc_id").as("a_id"), col("lang"), col("source"),
      array_join(slice(col("tk"), -2, 2), " ").as("g"))
    val heads = t.select(col("doc_id").as("b_id"), col("lang"), col("source"),
      array_join(slice(col("tk"), 1, 2), " ").as("g"))
    tails.hint("shuffle_hash")
      .join(heads, Seq("lang", "source", "g"))
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id", "g")
      .orderBy("a_id", "b_id")
      .limit(2000)
  }

  /** Empirical survival curve of user engagement: S(t) = share of
    * users whose first-to-last-event lifetime reaches ≥ t days, for
    * t = 0..29 (the corpus's bounded day domain). Lifetimes histogram
    * per user, then each lifetime bucket fans out to the offsets it
    * survives (a bounded sequence explode — no cumulative window and
    * no per-user work beyond one keyed aggregate); ppm vs the 1-row
    * user total.
    */
  val eventsSurvivalCurve: Q = (s, d) => {
    val lt = ev(s, d).groupBy("user_id")
      .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
             .cast("long").as("lt"))
    val hist = lt.groupBy("lt").agg(cnt.as("n"))
    val surv = hist
      .select(explode(sequence(lit(0L), col("lt"))).as("t_days"), col("n"))
      .groupBy("t_days").agg(sum("n").cast("long").as("n_surviving"))
    val total = lt.agg(cnt.as("n_users"))
    surv.crossJoin(broadcast(total))
      .select(col("t_days"), col("n_surviving"),
        expr("div(n_surviving * 1000000, n_users)").cast("long").as("survival_ppm"))
      .orderBy("t_days")
  }

  /** Cohen's kappa between two deterministic event flags (value ≥ 100
    * vs business-hours 9–17) — the inter-rater agreement statistic,
    * exact from the four counts: κ·10⁶ = (agree·n − pe·n²)·10⁶ div
    * (n² − pe·n²) with pe·n² = PA·PB + (n−PA)(n−PB), sign-split in
    * DECIMAL(38). One scan, one row.
    */
  val mlCohenKappa: Q = (s, d) =>
    ev(s, d)
      .select(when(col("value") >= 100.0, 1L).otherwise(0L).as("fa"),
              when(hour(col("ts")).between(9, 17), 1L).otherwise(0L).as("fb"))
      .agg(cnt.as("n"),
           sum("fa").cast("long").as("pa"),
           sum("fb").cast("long").as("pb"),
           sum(when(col("fa") === col("fb"), 1L).otherwise(0L)).cast("long").as("agree"))
      .select(col("n"), col("agree"),
        expr("""cast(CASE
          WHEN agree * n - (pa * pb + (n - pa) * (n - pb)) < 0 THEN
            -div(cast((pa * pb + (n - pa) * (n - pb)) - agree * n as decimal(38,0)) * 1000000,
                 cast(n as decimal(38,0)) * n - (pa * pb + (n - pa) * (n - pb)))
          ELSE div(cast(agree * n - (pa * pb + (n - pa) * (n - pb)) as decimal(38,0)) * 1000000,
                   cast(n as decimal(38,0)) * n - (pa * pb + (n - pa) * (n - pb)))
          END as bigint)""").as("kappa_ppm"))

  /** Temporal burstiness per user: the Fano factor of inter-event
    * gaps (whole seconds, R4) — var/mean as exact ppm,
    * (n·Σx² − (Σx)²)·10⁶ div (n·Σx) in DECIMAL(38). A Poisson
    * arrival process sits at ~gap-scale; bursty users blow past it.
    * Complements `events_activity_gini` (volume concentration) with
    * TIMING concentration. Top-20 burstiest (n ≥ 3 gaps, positive
    * total gap).
    */
  val eventsFanoBurstiness: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .filter(col("gap").isNotNull)
      .groupBy("user_id")
      .agg(cnt.as("n_gaps"),
           sum("gap").cast("long").as("sx"),
           sum(col("gap") * col("gap")).cast("long").as("sx2"))
      .filter(col("n_gaps") >= 3 && col("sx") > 0)
      .select(col("user_id"), col("n_gaps"),
        expr("cast(div((cast(n_gaps as decimal(38,0)) * sx2 - cast(sx as decimal(38,0)) * sx) " +
          "* 1000000, cast(n_gaps as decimal(38,0)) * sx) as bigint)").as("fano_ppm"))
      .orderBy(col("fano_ppm").desc, col("user_id"))
      .limit(20)
  }

  /** Supply-chain concentration risk: per part, how many distinct
    * supplier NATIONS it ships from, and the unit-price spread across
    * its lines (max − min cents of extendedprice/quantity — per-row
    * double division, bit-identical). Census by nation count: parts
    * sourced from one nation are the single-point-of-failure set.
    */
  val partSupplyRisk: Q = (s, d) => {
    val unit = li(s, d)
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("s_nationkey"),
              cents(col("l_extendedprice") / col("l_quantity")).as("uc"))
    unit.groupBy("l_partkey")
      .agg(countDistinct(col("s_nationkey")).as("n_nations"),
           (max("uc") - min("uc")).cast("long").as("spread_c"))
      .groupBy("n_nations")
      .agg(cnt.as("n_parts"), sum("spread_c").cast("long").as("sum_spread_cents"))
      .orderBy("n_nations")
  }

  /** SMA crossover signal over daily purchase revenue: trailing-7-row
    * vs trailing-28-row simple moving averages compared WITHOUT
    * division (4·sum7 > sum28 ⇔ sum7/7 > sum28/28 — exact integer
    * cross-multiplication), emitted for full-frame days only with the
    * crossover flag (signal ≠ previous signal). Both windows run over
    * the bounded ~30-day domain; the fact table collapses to daily
    * cents first.
    */
  val tsSmaCrossover: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, d).filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("dd"))
      .agg(sumCents(col("value")).as("c"))
    val w = Window.orderBy("dd")
    val full = daily
      .withColumn("sum7", sum("c").over(w.rowsBetween(-6, 0)).cast("long"))
      .withColumn("sum28", sum("c").over(w.rowsBetween(-27, 0)).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") >= 28)
      .withColumn("signal", when(col("sum7") * 4 > col("sum28"), 1L).otherwise(0L))
    full
      .withColumn("crossed",
        when(lag(col("signal"), 1).over(Window.orderBy("dd")).isNull, 0L)
          .when(col("signal") =!= lag(col("signal"), 1).over(Window.orderBy("dd")), 1L)
          .otherwise(0L))
      .select(col("dd").cast("string").as("dd"), col("sum7"), col("sum28"),
              col("signal"), col("crossed"))
      .orderBy("dd")
  }

  /** Order-priority composition shift: per (year, priority) the order
    * count, its share of the year in exact ppm, and the year-over-year
    * share delta (lag over the bounded year domain per priority).
    * Year totals ride a bounded-domain window partitioned by year.
    */
  val ordersPriorityMixShift: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val yp = orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
               col("o_orderpriority").as("priority"))
      .agg(cnt.as("n"))
    val share = yp
      .withColumn("yr_total", sum("n").over(Window.partitionBy("yr")).cast("long"))
      .withColumn("share_ppm", expr("div(n * 1000000, yr_total)").cast("long"))
    share
      .withColumn("delta_ppm",
        (col("share_ppm") -
          lag(col("share_ppm"), 1).over(Window.partitionBy("priority").orderBy("yr")))
          .cast("long"))
      .select("yr", "priority", "n", "share_ppm", "delta_ppm")
      .orderBy("yr", "priority")
  }

  /** Unit-price dispersion per brand: relative variance in exact ppm —
    * (n·Σx² − (Σx)²)·10⁶ div (Σx)², DECIMAL(38) throughout (Σx² over
    * millions of cents-squared rows crosses 2⁶³). The squared
    * coefficient of variation, sqrt-free so both engines agree
    * bit-for-bit. Top-20 most dispersed brands.
    */
  val partBrandPriceDispersion: Q = (s, d) => {
    val part = Tables.t(s, d, "part")
    li(s, d)
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), cents(col("l_extendedprice") / col("l_quantity")).as("uc"))
      .groupBy("p_brand")
      .agg(cnt.as("n"),
           sum("uc").cast("long").as("su"),
           sum(expr("cast(uc as decimal(38,0)) * uc")).as("sq"))
      .select(col("p_brand"), col("n"),
        expr("cast(div((cast(n as decimal(38,0)) * sq - cast(su as decimal(38,0)) * su) " +
          "* 1000000, cast(su as decimal(38,0)) * su) as bigint)").as("rel_var_ppm"))
      .orderBy(col("rel_var_ppm").desc, col("p_brand"))
      .limit(20)
  }

  /** Buyer-nation × seller-nation purchase AFFINITY: observed
    * directional line counts vs the independence expectation,
    * lift_ppm = n_ab·N·10⁶ div (n_a·n_b) (DECIMAL(38) — the triple
    * product crosses 2⁶³), support floor 50 lines. The trade-flow
    * sibling of `events_cooccur_lift`; pair counts shuffle once,
    * marginals are nation-domain tables riding broadcasts.
    */
  val customerNationAffinity: Q = (s, d) => {
    // ONE fact pass: the marginals and the total are exact sums of the
    // (bn, sn) pair counts, so everything downstream derives from the
    // ≤625-row pairs aggregate. Local wall clock is UNCHANGED (~0.34 s
    // best-of-5 either way — the old four-consumer shape already
    // reused the lineitem⋈orders exchange, so its extra aggregates ran
    // over cached shuffle blocks); the win is structural: three reduce
    // phases over the fact exchange become sums over 625 rows, which
    // is what survives when the exchange no longer fits one machine's
    // shuffle cache. The remaining local cost IS the fact join — the
    // canonical co-partitioned lineitem⋈orders shuffle (floor
    // attribution: PLANS.md round 15).
    val flows = li(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("bn"), col("s_nationkey").as("sn"))
    val pairs = flows.groupBy("bn", "sn").agg(cnt.as("n_ab")).localCheckpoint()
    val buyers = pairs.groupBy("bn").agg(sum("n_ab").cast("long").as("n_a"))
    val sellers = pairs.groupBy("sn").agg(sum("n_ab").cast("long").as("n_b"))
    val total = pairs.agg(sum("n_ab").cast("long").as("n_total"))
    pairs
      .join(broadcast(buyers), "bn")
      .join(broadcast(sellers), "sn")
      .crossJoin(broadcast(total))
      .filter(col("n_ab") >= 50)
      .select(col("bn"), col("sn"), col("n_ab"),
        expr("cast(div(cast(n_ab as decimal(38,0)) * n_total * 1000000, " +
          "cast(n_a as decimal(38,0)) * n_b) as bigint)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("bn"), col("sn"))
      .limit(20)
  }

  /** Supplier revenue concentration per nation — the Herfindahl–
    * Hirschman index in exact ppm: Σ rᵢ²·10⁶ div (Σ rᵢ)² over each
    * nation's supplier revenues (cents; squares in DECIMAL(38)).
    * 10⁶/n = perfectly even, 10⁶ = monopoly. Two keyed aggregates.
    */
  val supplierHhiConcentration: Q = (s, d) => {
    val rev = li(s, d)
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("l_suppkey"))
      .agg(sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
    rev.groupBy("s_nationkey")
      .agg(cnt.as("n_suppliers"),
           sum("r").cast("long").as("sr"),
           sum(expr("cast(r as decimal(38,0)) * r")).as("sq"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("n_suppliers"),
        expr("cast(div(sq * 1000000, cast(sr as decimal(38,0)) * sr) as bigint)")
          .as("hhi_ppm"))
      .orderBy("nation")
  }

  /** Error-burst detection: 5-minute tumbling buckets per day — how
    * many buckets saw any error, how many were BURSTS (≥ 3 errors),
    * and the worst bucket. Bucketing is integer epoch-seconds div 300
    * (identical on both engines); one keyed aggregate per level.
    */
  val eventsErrorBurst5m: Q = (s, d) => {
    val b = ev(s, d).filter(col("event_type") === "error")
      .groupBy(to_date(col("ts")).as("dd"),
               (unix_timestamp(col("ts")) / 300).cast("long").as("bucket"))
      .agg(cnt.as("n_err"))
    b.groupBy("dd")
      .agg(cnt.as("n_error_buckets"),
           sum(when(col("n_err") >= 3, 1L).otherwise(0L)).cast("long").as("n_burst_buckets"),
           max("n_err").cast("long").as("max_bucket_errors"))
      .select(col("dd").cast("string").as("dd"), col("n_error_buckets"),
              col("n_burst_buckets"), col("max_bucket_errors"))
      .orderBy("dd")
  }

  /** Exact-duplicate rate per source — the corpus-health dashboard
    * number a crawl pipeline watches: docs vs distinct texts (compared
    * through md5, engine-portable and far narrower than shuffling the
    * text bodies), duplicate share in exact ppm.
    */
  val corpusDedupRateBySource: Q = (s, d) =>
    docs(s, d)
      .select(col("source"), md5(col("text")).as("h"))
      .groupBy("source")
      .agg(cnt.as("n_docs"), countDistinct(col("h")).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        expr("div((n_docs - n_distinct) * 1000000, n_docs)").cast("long").as("dup_ppm"))
      .orderBy("source")

  /** Head-heaviness of the trigram distribution: what share of ALL
    * trigram occurrences the top-1,000 trigrams cover (count desc,
    * gram asc tiebreak) — with [[Pipeline.textZipfSlope]] the pair of
    * corpus-shape diagnostics (a boilerplate flood shows up as a
    * coverage spike before it bends the Zipf fit). Top-k plans as
    * TakeOrdered over the vocabulary table; totals are 1-row finals.
    */
  val textNgramCoverage: Q = (s, d) => {
    val grams = docs(s, d)
      .select(split(col("text"), " ").as("tk"))
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 2), i -> concat_ws(' ', tk[i-1], tk[i], tk[i+1]))"))
        .as("g"))
    val counts = grams.groupBy("g").agg(cnt.as("c"))
    val top = counts.orderBy(col("c").desc, col("g")).limit(1000)
      .agg(sum("c").cast("long").as("top_c"))
    counts.agg(cnt.as("n_distinct"), sum("c").cast("long").as("n_total"))
      .crossJoin(broadcast(top))
      .select(col("n_total"), col("n_distinct"), col("top_c"),
        expr("div(top_c * 1000000, n_total)").cast("long").as("top1000_share_ppm"))
  }

  /** Per-dimension embedding variance — the effective-dimensionality
    * audit (collapsed dimensions carry no information; a whitening
    * bug shows as one dominant dim). Values quantize per element at a
    * FIXED scale (floor(x·1000 + 0.5) on the double-cast float —
    * bit-identical on both engines), then n·Σq²−(Σq)² per dim in
    * DECIMAL(38). One posexplode + one keyed aggregate over 64 dims.
    */
  val embeddingDimVariance: Q = (s, d) =>
    Tables.t(s, d, "embeddings")
      .select(posexplode(transform(col("embedding"),
        x => floor(x.cast("double") * 1000.0 + 0.5).cast("long")))
        .as(Seq("dim", "q")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(cnt.as("n"), sum("q").cast("long").as("sq"),
           sum(expr("cast(q as decimal(38,0)) * q")).as("sq2"))
      .select(col("dim"), col("n"),
        expr("div(sq, n)").cast("long").as("q_mean_milli"),
        expr("cast(div(cast(n as decimal(38,0)) * sq2 - cast(sq as decimal(38,0)) * sq, " +
          "cast(n as decimal(38,0)) * n) as bigint)").as("q_var"))
      .orderBy("dim")

  /** Degree assortativity of the part↔supplier graph — do high-degree
    * parts ship through high-degree suppliers? Signed r² in exact ppm
    * (sign(cov)·cov²·10⁶ div (varx·vary), staged divisions in
    * DECIMAL(38) — sqrt-free, so both engines agree bit-for-bit; the
    * DECLARED statistic is r²·sign, order-isomorphic to r). Per-edge
    * endpoint degrees join from the two degree tables; one edge-sized
    * aggregate.
    */
  val graphAssortativity: Q = (s, d) => {
    val e = bipartite(s, d)
    val degA = e.groupBy("a").agg(cnt.as("dx"))
    val degB = e.groupBy("b").agg(cnt.as("dy"))
    e.join(degA, "a").join(degB, "b")
      .agg(cnt.as("n_edges"),
           sum("dx").cast("long").as("sx"), sum("dy").cast("long").as("sy"),
           sum(expr("cast(dx as decimal(38,0)) * dy")).as("sxy"),
           sum(expr("cast(dx as decimal(38,0)) * dx")).as("sxx"),
           sum(expr("cast(dy as decimal(38,0)) * dy")).as("syy"))
      .select(col("n_edges"),
        expr("""cast(CASE WHEN n_edges * sxx - cast(sx as decimal(38,0)) * sx = 0
                       OR n_edges * syy - cast(sy as decimal(38,0)) * sy = 0 THEN 0
          ELSE CASE WHEN n_edges * sxy - cast(sx as decimal(38,0)) * sy < 0 THEN -1 ELSE 1 END *
            div(div((n_edges * sxy - cast(sx as decimal(38,0)) * sy) *
                    (n_edges * sxy - cast(sx as decimal(38,0)) * sy),
                    n_edges * sxx - cast(sx as decimal(38,0)) * sx) * 1000000,
                n_edges * syy - cast(sy as decimal(38,0)) * sy)
          END as bigint)""").as("assort_r2_ppm"))
  }

  /** Day-of-week seasonal strength of daily purchase revenue:
    * 1 − SSres/SStot in exact ppm, where SSres sums each weekday
    * group's n·Σx²−(Σx)² div n and SStot is the same over all days
    * (staged truncating divisions — the declared integer statistic).
    * Near 10⁶ = revenue is pure weekday pattern; near 0 = no weekly
    * seasonality. Complements `ts_dow_seasonality`'s per-day means
    * with the single variance-explained number.
    */
  val tsSeasonalStrength: Q = (s, d) => {
    val daily = ev(s, d).filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("dd"))
      .agg(sumCents(col("value")).as("c"))
      .withColumn("dow", dayofweek(col("dd")).cast("long"))
    val res = daily.groupBy("dow")
      .agg(cnt.as("ng"), sum("c").cast("long").as("sg"),
           sum(expr("cast(c as decimal(38,0)) * c")).as("qg"))
      .agg(sum(expr("div(cast(ng as decimal(38,0)) * qg - cast(sg as decimal(38,0)) * sg, ng)"))
             .as("ssres"))
    val tot = daily.agg(cnt.as("n"), sum("c").cast("long").as("sc"),
           sum(expr("cast(c as decimal(38,0)) * c")).as("qc"))
      .select(col("n"),
        expr("div(cast(n as decimal(38,0)) * qc - cast(sc as decimal(38,0)) * sc, n)")
          .as("sstot"))
    tot.crossJoin(broadcast(res))
      .select(col("n").as("n_days"),
        expr("cast(CASE WHEN sstot = 0 THEN 0 " +
          "ELSE 1000000 - div(ssres * 1000000, sstot) END as bigint)")
          .as("seasonal_strength_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "graph_assortativity" -> graphAssortativity,
    "ts_seasonal_strength" -> tsSeasonalStrength,
    "corpus_dedup_rate_by_source" -> corpusDedupRateBySource,
    "text_ngram_coverage" -> textNgramCoverage,
    "embedding_dim_variance" -> embeddingDimVariance,
    "ts_sma_crossover" -> tsSmaCrossover,
    "orders_priority_mix_shift" -> ordersPriorityMixShift,
    "part_brand_price_dispersion" -> partBrandPriceDispersion,
    "customer_nation_affinity" -> customerNationAffinity,
    "supplier_hhi_concentration" -> supplierHhiConcentration,
    "events_error_burst_5m" -> eventsErrorBurst5m,
    "dq_order_total_recon" -> dqOrderTotalRecon,
    "recon_nation_netting" -> reconNationNetting,
    "graph_kcore" -> graphKcore,
    "graph_bfs_layers" -> graphBfsLayers,
    "ts_theil_sen_trend" -> tsTheilSenTrend,
    "text_ttr_hapax" -> textTtrHapax,
    "text_boundary_stitch" -> textBoundaryStitch,
    "events_survival_curve" -> eventsSurvivalCurve,
    "ml_cohen_kappa" -> mlCohenKappa,
    "events_fano_burstiness" -> eventsFanoBurstiness,
    "part_supply_risk" -> partSupplyRisk,
  )
}
