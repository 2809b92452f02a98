package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-16 query wave 2 (SURVEY §2.20): majority run-lengths,
  * calendar superstition census, Katz walk centrality, the Damm
  * check-digit quasigroup, Mann-Kendall trend counts, clustering
  * coefficients, Kendall concordance via exact cross-multiplication,
  * next-event entropy, bounded Collatz iteration as a codegen HOF, and
  * greedy knapsack by integer value density. Exactness per §2.1 —
  * sign/concordance counts stay integers precisely so no signed
  * integer division (floor vs truncate differs cross-engine) is ever
  * emitted.
  */
object Metrics10 {

  private def li(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def orders(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "orders")
  private def cust(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "customer")
  private def supp(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "supplier")
  private def nation(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "nation")
  private def part(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "part")
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "events")

  /** The distinct directed nation trade edges (supplier nation →
    * customer nation), the shared input of the walk/triangle queries —
    * a ≤625-row collapsed aggregate.
    */
  private def tradeEdges(s: org.apache.spark.sql.SparkSession, d: String) = {
    val sn = nation(s, d).select(col("n_nationkey").as("snk"), col("n_name").as("src"))
    val cn = nation(s, d).select(col("n_nationkey").as("cnk"), col("n_name").as("dst"))
    li(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(supp(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .join(broadcast(cn), col("c_nationkey") === col("cnk"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
  }

  /** Gaps-and-islands run-length encoding of each day's MAJORITY order
    * priority (count desc, priority tiebreak): runs, longest run, and
    * days held per priority. Fact collapses to the bounded day domain;
    * the island windows ride the ts_runs_updown allowlist class.
    */
  val ordersPriorityRunlength: Q = (s, d) => {
    val day = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dy"), col("o_orderpriority").as("pr"))
      .agg(cnt.as("c"))
    val m = day.withColumn("rk", row_number().over(
        Window.partitionBy("dy").orderBy(col("c").desc, col("pr"))))
      .filter(col("rk") === 1).select("dy", "pr")
    val runs = m
      .withColumn("grp",
        row_number().over(Window.orderBy("dy")) -
          row_number().over(Window.partitionBy("pr").orderBy("dy")))
      .groupBy("pr", "grp").agg(cnt.as("len"))
    runs.groupBy(col("pr").as("priority"))
      .agg(cnt.as("runs"), max("len").cast("long").as("longest"),
        sum("len").cast("long").as("total_days"))
      .orderBy("priority")
  }

  /** Friday-the-13th census: orders landing on one, per year, in exact
    * ppm of the year's orders — the calendar-selection audit shape
    * (weekday × day-of-month predicates agreeing across engines:
    * Spark's Monday-0 `weekday` = 4 ↔ DuckDB's `isodow` = 5).
    */
  val dateFriday13Census: Q = (s, d) => {
    orders(s, d)
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        when(dayofmonth(col("o_orderdate")) === 13 &&
          weekday(col("o_orderdate")) === 4, 1L).otherwise(0L).as("f13"))
      .groupBy("yr")
      .agg(sum("f13").cast("long").as("fri13_orders"), cnt.as("total_orders"))
      .withColumn("f13_ppm", expr("(1000000 * fri13_orders) div total_orders"))
      .orderBy("yr")
  }

  /** Katz centrality truncated at 2 hops with attenuation 1/2, in
    * exact milli units: 1000·(#1-walks) + 500·(#2-walks) from each
    * nation over the distinct trade edges — the walk-count complement
    * to the distance-based harmonic centrality.
    */
  val graphKatz2hop: Q = (s, d) => {
    val e = tradeEdges(s, d)
    val p1 = e.groupBy("src").agg(cnt.as("c1"))
    val p2 = e.as("a").join(broadcast(e.as("b")), col("a.dst") === col("b.src"))
      .groupBy(col("a.src").as("src")).agg(cnt.as("c2"))
    p1.join(broadcast(p2), Seq("src"), "left")
      .select(col("src").as("nation"), col("c1").as("walks1"),
        coalesce(col("c2"), lit(0L)).as("walks2"))
      .withColumn("katz_milli", expr("1000 * walks1 + 500 * walks2"))
      .orderBy("nation")
  }

  /** Damm check digit: fold the key's 12 arithmetic digits through the
    * standard totally-antisymmetric quasigroup table (one codegen'd
    * `aggregate` HOF indexing a 100-entry literal — the dq_luhn_mod10
    * discipline; unlike Luhn, Damm catches all adjacent transpositions).
    */
  val dqCheckdigitDamm: Q = (s, d) => {
    val damm: Seq[Int] = Seq(
      0,3,1,7,5,9,8,6,4,2,
      7,0,9,2,1,5,4,8,6,3,
      4,2,0,6,8,7,1,3,5,9,
      1,7,5,0,9,8,3,4,2,6,
      6,1,2,3,0,4,5,9,7,8,
      3,6,7,4,2,0,9,5,8,1,
      5,8,6,9,7,2,0,1,3,4,
      8,9,4,5,3,6,2,0,1,7,
      9,4,3,8,6,1,7,2,0,5,
      2,5,8,1,4,3,6,7,9,0)
    orders(s, d).select(col("o_orderkey").as("kk"))
      .withColumn("__t", typedLit(damm))
      .withColumn("i", expr(
        """aggregate(sequence(11, 0, -1), 0,
           (acc, i) -> element_at(__t,
             acc*10 + cast((kk div cast(pow(10, i) as bigint)) % 10 as int) + 1))"""))
      .groupBy(col("i").cast("long").as("check_digit"))
      .agg(cnt.as("keys"), min("kk").cast("long").as("min_key"))
      .orderBy("check_digit")
  }

  /** Mann-Kendall trend counts for 1996's daily revenue: concordant /
    * discordant / S = Σ sign(x_j − x_i) over all i<j day pairs — the
    * nonparametric trend test's exact integer core (τ derivable; no
    * signed division is emitted, floor-vs-truncate differs across
    * engines). The all-pairs join is a 366-row bounded day domain.
    */
  val tsMannKendall: Q = (s, d) => {
    val dd = orders(s, d).filter(year(col("o_orderdate")) === 1996)
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sumCents(col("o_totalprice")).as("v"))
    val n = dd.agg(cnt.as("n"))
    val p = dd.as("a").join(broadcast(dd.as("b")), col("b.dy") > col("a.dy"))
      .select(when(col("b.v") > col("a.v"), 1L)
        .when(col("b.v") < col("a.v"), -1L).otherwise(0L).as("sg"))
    p.agg(
        sum(when(col("sg") === 1L, 1L).otherwise(0L)).cast("long").as("concordant"),
        sum(when(col("sg") === -1L, 1L).otherwise(0L)).cast("long").as("discordant"),
        sum("sg").cast("long").as("s"))
      .crossJoin(broadcast(n))
      .select("n", "concordant", "discordant", "s")
  }

  /** Local clustering coefficient per nation over the UNDIRECTED
    * co-trade graph: triangles through each node vs deg·(deg−1)/2, in
    * exact ppm — the neighborhood-density complement to the global
    * triangle count. All joins run on the ≤625-row collapsed edge set.
    */
  val graphClusteringCoefficient: Q = (s, d) => {
    val und = tradeEdges(s, d)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val nb = und.select(col("a").as("v"), col("b").as("u"))
      .union(und.select(col("b").as("v"), col("a").as("u")))
    val deg = nb.groupBy("v").agg(cnt.as("dg"))
    val tri = nb.as("n1")
      .join(broadcast(nb.as("n2")),
        col("n1.v") === col("n2.v") && col("n1.u") < col("n2.u"))
      .join(broadcast(und.as("e")),
        col("e.a") === col("n1.u") && col("e.b") === col("n2.u"))
      .groupBy(col("n1.v").as("v")).agg(cnt.as("t"))
    deg.join(broadcast(tri), Seq("v"), "left")
      .select(col("v").as("nation"), col("dg").as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"))
      .withColumn("coeff_ppm", expr(
        "CASE WHEN degree >= 2 THEN (2000000 * triangles) div (degree * (degree - 1)) ELSE 0L END"))
      .orderBy("nation")
  }

  /** Kendall concordance between nations' MEAN customer balance and
    * total revenue: mean comparisons run as exact integer
    * cross-multiplications (balᵃ·nᵇ vs balᵇ·nᵃ — no double division
    * anywhere), summed over the 300 nation pairs.
    */
  val mlKendallTauNation: Q = (s, d) => {
    val a = cust(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sumCents(col("c_acctbal")).as("bal"), cnt.as("nc"))
    val r = orders(s, d)
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sumCents(col("o_totalprice")).as("rev"))
    val j = a.join(broadcast(r), Seq("nation"), "left")
      .select(col("nation"), col("bal"), col("nc"),
        coalesce(col("rev"), lit(0L)).as("rev"))
    val nn = j.agg(cnt.as("nations"))
    // sign of each comparison separately, THEN multiply — the raw
    // difference product needs int128 (sf0.1 overflowed BIGINT; DuckDB
    // silently promotes, Spark's ANSI mode rightly refuses)
    val p = j.as("x").join(broadcast(j.as("y")), col("x.nation") < col("y.nation"))
      .select((signum(col("x.bal") * col("y.nc") - col("y.bal") * col("x.nc"))
          .cast("long") *
        signum(col("x.rev") - col("y.rev")).cast("long")).as("sg"))
    p.agg(
        sum(when(col("sg") === 1L, 1L).otherwise(0L)).cast("long").as("concordant"),
        sum(when(col("sg") === -1L, 1L).otherwise(0L)).cast("long").as("discordant"),
        sum("sg").cast("long").as("s"))
      .crossJoin(broadcast(nn))
      .select("nations", "concordant", "discordant", "s")
  }

  /** Shannon entropy (milli-bits) of each event type's NEXT-event
    * distribution — the predictability readout over the Markov
    * transition rows (the agg_entropy_sources double discipline:
    * exact integer counts, one log2 reduction, half-up milli floor).
    */
  val eventsTransitionEntropy: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .withColumn("nxt", lead("event_type", 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type"), col("nxt")).agg(cnt.as("c"))
      .withColumn("tot", sum("c").over(Window.partitionBy("event_type")))
      .withColumn("p", col("c") / col("tot"))
      .groupBy("event_type")
      .agg(sum("c").cast("long").as("transitions"),
        floor(-sum(col("p") * log2(col("p"))) * 1000 + 0.5)
          .cast("long").as("h_milli"))
      .orderBy("event_type")
  }

  /** Collatz stopping times for the key-derived seeds 2..1001, computed
    * by the native codegen [[graft.functions.CollatzSteps]] bounded
    * loop (≤300 iterations; the oracle is DuckDB's native WITH
    * RECURSIVE — same trajectory, engine-appropriate control flow on
    * each side). Censused into 20-step bands. The interpreted
    * `aggregate` HOF twin this replaced ran the 300-step lambda per
    * row at 13.5× DuckDB (VERDICT r16); the compiled loop is the
    * PqEncode fix pattern, and FuncsSpec gates the two bit-identical.
    */
  val exprCollatzSteps: Q = (s, d) => {
    orders(s, d).select(expr("o_orderkey % 1000 + 2").as("k")).distinct()
      .withColumn("st", graft.functions.FoldFunctions.collatz_steps(col("k")))
      .filter(col("st") >= 0)
      .groupBy(expr("st div 20").cast("long").as("band"))
      .agg(cnt.as("keys"), min("st").cast("long").as("min_steps"),
        max("st").cast("long").as("max_steps"))
      .orderBy("band")
  }

  /** Greedy 0/1 knapsack over part types: items ranked by INTEGER value
    * density (1e4·value // weight, item tiebreak), prefix-packed while
    * the running weight fits half the total — chosen count / weight /
    * value. The rank window runs over the bounded ~150-row type domain;
    * capacity rides a 1-row broadcast.
    */
  val allocGreedyKnapsack: Q = (s, d) => {
    val it = part(s, d)
      .groupBy(col("p_type").as("item"))
      .agg(sum("p_size").cast("long").as("w"), sumCents(col("p_retailprice")).as("v"))
      .filter(col("w") > 0)
    val cap = it.agg((sum("w") / 2).cast("long").as("cp"),
      cnt.as("items"))
    val o = it.withColumn("run", sum("w").over(
      Window.orderBy(expr("(10000 * v) div w").desc, col("item"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
    o.crossJoin(broadcast(cap)).filter(col("run") <= col("cp"))
      .groupBy()
      .agg(cnt.as("chosen"), sum("w").cast("long").as("weight_used"),
        sum("v").cast("long").as("value_cents"),
        max("items").cast("long").as("items"),
        max("cp").cast("long").as("capacity"))
  }

  val queries: Map[String, Q] = Map(
    "orders_priority_runlength" -> ordersPriorityRunlength,
    "date_friday13_census" -> dateFriday13Census,
    "graph_katz_2hop" -> graphKatz2hop,
    "dq_checkdigit_damm" -> dqCheckdigitDamm,
    "ts_mann_kendall" -> tsMannKendall,
    "graph_clustering_coefficient" -> graphClusteringCoefficient,
    "ml_kendall_tau_nation" -> mlKendallTauNation,
    "events_transition_entropy" -> eventsTransitionEntropy,
    "expr_collatz_steps" -> exprCollatzSteps,
    "alloc_greedy_knapsack" -> allocGreedyKnapsack,
  )
}
