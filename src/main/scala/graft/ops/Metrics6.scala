package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-14 wave (SURVEY §2.18): JSON-payload profiling, an exact
  * linear intra-label embedding-coherence census (the sum-vector
  * identity), integer lag-1 autocorrelation, character-trigram
  * language profiles, day-of-week revenue shares, debit-share
  * matrices, per-quarter customer leaderboards, and the
  * EXISTS-in-projection (ExistenceJoin) SQL surface. Exactness and
  * scale posture per §2.1.
  */
object Metrics6 {

  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def orders(s: SparkSession, d: String) = Tables.t(s, d, "orders")
  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  /** JSON payload profiling: BOTH engines extract `k` with the SAME
    * regex (`"k": (\d+)` — the pinned textual contract: non-negative
    * integer, exactly that spacing), so the extraction domain is
    * identical by construction; on the non-negative domain Spark `div`
    * and DuckDB `//` agree (both truncate = floor there). ADVICE r14:
    * the earlier get_json_object form parsed ANY JSON number while the
    * oracle regex did not — silently divergent off this corpus. The
    * regex is as codegen-friendly as the JSON path (one string op per
    * row); non-matching rows band as NULL on both sides. One scan +
    * one keyed agg.
    */
  val eventsPropsValueBands: Q = (s, d) =>
    ev(s, d).select(col("event_type"),
        regexp_extract(col("props"), """"k": (\d+)""", 1)
          .cast("long").as("k"))
      .groupBy(col("event_type"), expr("div(k, 10)").as("band"))
      .agg(cnt.as("n"), sum("k").cast("long").as("sum_k"))
      .orderBy("event_type", "band")

  /** Intra-label embedding coherence WITHOUT the pairwise join: for a
    * set of vectors, Σ_{i≠j} qᵢ·qⱼ = ‖Σq‖² − Σ‖q‖² — so the mean
    * pairwise dot of every label's members comes from per-(label, pos)
    * component sums: strictly LINEAR where the naive census is
    * quadratic per label. Components quantize to integers (×1000,
    * floor(x+0.5) — the cross-engine-exact rounding) and the squares
    * ride decimal(38)/HUGEINT, so the census is hash-exact. Emits the
    * exact numerator and the pair count; the consumer divides.
    */
  val embeddingLabelCoherence: Q = (s, d) => {
    val v = Tables.t(s, d, "embeddings")
    val q = v.select(col("label").as("lbl"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("qv", floor(col("x").cast("double") * 1000 + 0.5).cast("long"))
    val sp = q.groupBy("lbl", "pos")
      .agg(sum("qv").cast("long").as("sv"),
           sum(col("qv").cast("decimal(38,0)") * col("qv")).as("ss"))
    val pl = sp.groupBy("lbl")
      .agg(sum(col("sv").cast("decimal(38,0)") * col("sv")).as("s2"),
           sum("ss").as("ssall"))
    val n = v.groupBy(col("label").as("lbl")).agg(cnt.as("n_vecs"))
    pl.join(n, Seq("lbl"))
      .select(col("lbl"), col("n_vecs"),
        (col("s2") - col("ssall")).cast("long").as("coh_num"),
        (col("n_vecs") * (col("n_vecs") - 1)).cast("long").as("pair_count"))
      .orderBy("lbl")
  }

  /** Lag-1 autocorrelation of the daily order count, with numerator
    * and denominators as EXACT integers (n·Σxy − Σx·Σy staged through
    * decimal(38)/HUGEINT) — the seasonality-strength primitive without
    * a single engine-divergent division or root. The lead window runs
    * over the bounded day domain AFTER aggregation.
    */
  val ordersDailyCountAutocorr: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dd")).agg(cnt.as("n"))
    val w = Window.orderBy("dd")
    val dec = (c: String) => col(c).cast("decimal(38,0)")
    daily.withColumn("y", lead("n", 1).over(w))
      .filter(col("y").isNotNull)
      .select(col("n").as("x"), col("y"))
      .agg(cnt.as("n_pairs"),
        (count(lit(1)).cast("decimal(38,0)") * sum(dec("x") * col("y"))
          - sum("x").cast("decimal(38,0)") * sum("y")).cast("long").as("num"),
        (count(lit(1)).cast("decimal(38,0)") * sum(dec("x") * col("x"))
          - sum("x").cast("decimal(38,0)") * sum("x")).cast("long").as("den_x"),
        (count(lit(1)).cast("decimal(38,0)") * sum(dec("y") * col("y"))
          - sum("y").cast("decimal(38,0)") * sum("y")).cast("long").as("den_y"))
  }

  /** Character-trigram profile per language over each document's first
    * 120 chars (the language-ID feature family one level below
    * `text_langid`'s heuristic): explode the fixed window's trigrams —
    * a ≤118× linear map, codepoint-based on BOTH engines — census,
    * and rank top-30 per language (vocab-bounded window only).
    */
  val textCharTrigramTopk: Q = (s, d) => {
    val h = docs(s, d).select(col("lang"), substring(col("text"), 1, 120).as("h"))
      .filter(length(col("h")) >= 3)
    val grams = h.select(col("lang"), explode(expr(
        "transform(sequence(1, length(h) - 2), i -> substring(h, i, 3))")).as("gram"))
    val cts = grams.groupBy("lang", "gram").agg(cnt.as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("gram"))
    cts.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 30)
      .select("lang", "rn", "gram", "n")
      .orderBy("lang", "rn")
  }

  /** Shipped-revenue share per day-of-week (exact cents + ppm shares
    * against a 1-row broadcast total). The dow VALUE is output, so the
    * Spark/ISO divergence is mapped explicitly (`isodow % 7 + 1` on
    * the oracle = Spark's Sunday-1 convention).
    */
  val liShipDowProfile: Q = (s, d) => {
    val a = li(s, d)
      .select(dayofweek(col("l_shipdate")).cast("long").as("dow"),
        cents(col("l_extendedprice")).as("c"))
      .groupBy("dow").agg(cnt.as("n_lines"), sum("c").cast("long").as("rev_cents"))
    val tot = a.agg(sum("rev_cents").cast("decimal(38,0)").as("tr"))
    a.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_lines"), col("rev_cents"),
        expr("cast(div(cast(rev_cents as decimal(38,0)) * 1000000, tr) as bigint)")
          .as("share_ppm"))
      .orderBy("dow")
  }

  /** Credit-risk matrix: per (nation, market segment), how many
    * customers sit at a negative balance, their share ppm, and the
    * total debit cents — one dim broadcast + one keyed agg over the
    * bounded 25×5 domain.
    */
  val customerDebitShareMatrix: Q = (s, d) =>
    Tables.t(s, d, "customer")
      .join(broadcast(Tables.t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("c_mktsegment").as("seg"),
        cents(col("c_acctbal")).as("c"))
      .groupBy("nation", "seg")
      .agg(cnt.as("n_customers"),
        sum(when(col("c") < 0, 1L).otherwise(0L)).cast("long").as("n_debit"),
        expr("cast(sum(case when c < 0 then 1 else 0 end) * 1000000 div count(1) as bigint)")
          .as("debit_ppm"),
        sum(when(col("c") < 0, col("c")).otherwise(0L)).cast("long").as("debit_cents"))
      .orderBy("nation", "seg")

  /** Top-3 customers per quarter by order revenue — the periodic
    * leaderboard shape: one fact agg onto the (quarter, customer)
    * domain, then a quarter-partitioned rank window over the AGGREGATE
    * (never the fact rows), deterministic tiebreak on custkey.
    */
  val ordersQuarterTopCustomers: Q = (s, d) => {
    val a = orders(s, d)
      .groupBy((year(col("o_orderdate")) * 10 + quarter(col("o_orderdate")))
          .cast("long").as("yq"),
        col("o_custkey").as("ck"))
      .agg(sum(cents(col("o_totalprice"))).cast("long").as("rev"))
    val w = Window.partitionBy("yq").orderBy(col("rev").desc, col("ck"))
    a.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("yq", "rn", "ck", "rev")
      .orderBy("yq", "rn")
  }

  /** EXISTS in the SELECT list — the ExistenceJoin operator surface
    * (neither semi nor left: the match BIT survives as a column).
    * Catalyst plans the correlated EXISTS as an ExistenceJoin feeding
    * the aggregate; the same ANSI text runs on both engines.
    */
  val subqExistsSelectList: Q = (s, d) =>
    Tables.sql(s, d,
      """WITH t AS (SELECT o_orderpriority pri,
        |    CAST(EXISTS(SELECT 1 FROM lineitem
        |                WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |      AS BIGINT) has_return
        |  FROM orders)
        |SELECT pri, has_return, CAST(count(*) AS BIGINT) n
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** Census of within-user inter-event gaps in whole minutes (capped
    * at 120): the session-gap histogram that justifies a sessionization
    * threshold (the 30-minute industry default is exactly a valley in
    * this curve). One user-keyed lag window + bounded ≤121-row census.
    */
  val eventsSessionGapCensus: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("ts"))
      .withColumn("gap_us", col("us") - lag("us", 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(least(expr("div(gap_us, 60000000)"), lit(120L)).as("gap_min"))
      .agg(cnt.as("n"))
      .orderBy("gap_min")
  }

  /** Month-end loading audit: share of each month's orders landing in
    * its last 3 days vs the calendar expectation (3/days-in-month) —
    * the billing-cycle / quota-stuffing detector, exact ppm integers.
    */
  val ordersMonthEndEffect: Q = (s, d) =>
    orders(s, d)
      .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        when(datediff(last_day(col("o_orderdate")), col("o_orderdate")) < 3, 1L)
          .otherwise(0L).as("tail3"),
        dayofmonth(last_day(col("o_orderdate"))).cast("long").as("dim"))
      .groupBy("ym")
      .agg(cnt.as("n_orders"), sum("tail3").cast("long").as("n_tail3"),
        expr("cast(sum(tail3) * 1000000 div count(1) as bigint)").as("tail3_ppm"),
        expr("cast(3 * 1000000 div max(dim) as bigint)").as("expected_ppm"))
      .orderBy("ym")

  val queries: Map[String, Q] = Map(
    "events_session_gap_census" -> eventsSessionGapCensus,
    "orders_month_end_effect" -> ordersMonthEndEffect,
    "events_props_value_bands" -> eventsPropsValueBands,
    "embedding_label_coherence" -> embeddingLabelCoherence,
    "orders_daily_count_autocorr" -> ordersDailyCountAutocorr,
    "text_char_trigram_topk" -> textCharTrigramTopk,
    "li_ship_dow_profile" -> liShipDowProfile,
    "customer_debit_share_matrix" -> customerDebitShareMatrix,
    "orders_quarter_top_customers" -> ordersQuarterTopCustomers,
    "subq_exists_select_list" -> subqExistsSelectList)
}
