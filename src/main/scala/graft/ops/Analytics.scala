package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-4 event-analytics operators (SURVEY.md §2.9): slowly-changing
  * dimensions, snapshot diffing, interval-overlap joins, time-series
  * resampling with forward fill, and integer-exact exponential decay —
  * the temporal-modeling layer a warehouse team runs daily on top of
  * the relational + streaming surface.
  *
  * Scale posture, per operator:
  *  - SCD2 / EWMA / sessionize-style windows partition by the entity
  *    key — each user's history ranks independently, nothing
  *    single-partitions.
  *  - `join_interval_overlap` is the canonical bucketed interval join:
  *    intervals explode into fixed-width time buckets (an interval of
  *    width ≤ W spans ≤ 2 buckets of width W), candidates come from an
  *    EQUI-join on (key, bucket), and the exact overlap predicate
  *    verifies — linear shuffle volume, never a per-key quadratic
  *    nested loop in the plan.
  *  - `ts_resample_ffill` is the union-and-fill linear shape: grid
  *    rows and event rows merge-sort per key and a running
  *    last-non-null fills forward — no band join whose width grows
  *    with history length.
  */
object Analytics {

  private def events(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def orders(s: SparkSession, d: String) = Tables.t(s, d, "orders")

  private def epochS(c: org.apache.spark.sql.Column) = unix_timestamp(c)

  /** SCD2 (type-2 slowly-changing dimension) build from an event log:
    * each event is a state change for its user, versioned with
    * [valid_from, valid_to) via `lead` over the per-user timeline —
    * the standard warehouse dimension-history shape. Output aggregates
    * the version table per state: version count, still-open count, and
    * total closed-version dwell (whole seconds, R4-safe — both engines
    * floor epoch seconds and sum over NULL valid_to skips open rows on
    * both).
    */
  val scd2UserState: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .groupBy("event_type")
      .agg(cnt.as("n_versions"),
           sum(when(col("valid_to").isNull, 1L).otherwise(0L)).cast("long").as("n_open"),
           sum(epochS(col("valid_to")) - epochS(col("ts"))).cast("long").as("dwell_s"))
      .orderBy("event_type")
  }

  /** Snapshot diff (the CDC / reconciliation-between-loads shape):
    * per-customer 1996 vs 1997 order activity, classified
    * added / removed / changed / same by a single full-outer join on
    * the key. Money compares are per-row integer cents summed as
    * integers (R2), so 'changed' vs 'same' is an exact integer
    * equality on both engines. Output: per-class customer count and
    * net cents delta (absent side counts as 0).
    */
  val snapshotDiff: Q = (s, d) => {
    def snap(year: Int, k: String, c: String) =
      orders(s, d)
        .filter(col("o_orderdate") >= ts(s"$year-01-01 00:00:00") &&
                col("o_orderdate") < ts(s"${year + 1}-01-01 00:00:00"))
        .groupBy(col("o_custkey").as(k))
        .agg(sumCents(col("o_totalprice")).as(c))
    val a = snap(1996, "a_key", "a_cents")
    val b = snap(1997, "b_key", "b_cents")
    a.join(b, col("a_key") === col("b_key"), "full_outer")
      .select(
        when(col("a_key").isNull, "added")
          .when(col("b_key").isNull, "removed")
          .when(col("a_cents") === col("b_cents"), "same")
          .otherwise("changed").as("diff_class"),
        (coalesce(col("b_cents"), lit(0L)) - coalesce(col("a_cents"), lit(0L)))
          .as("delta"))
      .groupBy("diff_class")
      .agg(cnt.as("n_custs"), sum("delta").cast("long").as("delta_cents"))
      .orderBy("diff_class")
  }

  /** Interval-overlap self-join, bucketed: same-customer order pairs
    * whose 30-day fulfillment windows [o_orderdate, o_orderdate+30d]
    * overlap. SEMANTICS: plain pairwise interval overlap (what the
    * oracle states directly). PLAN: each interval lands in the ≤ 2
    * 30-day epoch buckets it touches, candidates come from an
    * equi-join on (custkey, bucket), duplicates collapse on the bare
    * id pair, and the exact overlap predicate verifies — the shape
    * that keeps a 100 TB interval join linear in input + true-overlap
    * volume instead of quadratic per key per time range.
    */
  val joinIntervalOverlap: Q = (s, d) => {
    val W = 2592000L // 30 days in seconds = interval width = bucket width
    val iv = orders(s, d).select(
      col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
      epochS(col("o_orderdate")).as("st"),
      (epochS(col("o_orderdate")) + W).as("en"))
    val bucketed = iv.select(col("ck"), col("ok"), col("st"), col("en"),
      explode(sequence(floor(col("st") / W), floor(col("en") / W))).as("bk"))
    val a = bucketed.select(col("ck"), col("bk"), col("ok").as("a_ok"),
                            col("st").as("a_st"), col("en").as("a_en"))
    val b = bucketed.select(col("ck").as("b_ck"), col("bk").as("b_bk"),
                            col("ok").as("b_ok"), col("st").as("b_st"),
                            col("en").as("b_en"))
    a.join(b, col("ck") === col("b_ck") && col("bk") === col("b_bk") &&
              col("a_ok") < col("b_ok") &&
              col("a_st") <= col("b_en") && col("b_st") <= col("a_en"))
      .select("ck", "a_ok", "b_ok").dropDuplicates("ck", "a_ok", "b_ok")
      .groupBy("ck")
      .agg(cnt.as("n_pairs"))
      .orderBy("ck")
      .limit(2000)
  }

  /** Hourly resample with forward fill (gap-filling for dashboards /
    * feature grids): for users 0-9, every hour of the first week, the
    * cents value of their most recent event at or before the hour
    * (NULL until the first event). Implemented as the linear
    * union-and-fill: grid rows and event rows merge per user and a
    * running `last(value, ignoreNulls)` fills forward — each user's
    * timeline is one window partition, so the plan is a keyed sort,
    * not a band join that widens with history. Event rows sort BEFORE
    * the grid row of the same instant (k: 0 < 1), making the fill
    * inclusive (ts ≤ h), exactly the oracle's ASOF `e.ts <= h`.
    */
  val tsResampleFfill: Q = (s, d) => {
    val evs = events(s, d).filter(col("user_id") < 10)
      .select(col("user_id"), col("ts").as("t"), lit(0).as("k"),
              cents(col("value")).as("v"))
    val grid = events(s, d).filter(col("user_id") < 10)
      .select(col("user_id")).distinct()
      .select(col("user_id"),
              explode(sequence(ts("2024-01-01 01:00:00"), ts("2024-01-08 00:00:00"),
                               expr("INTERVAL 1 HOUR"))).as("t"),
              lit(1).as("k"), lit(null).cast("long").as("v"))
    val w = Window.partitionBy("user_id").orderBy("t", "k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evs.unionByName(grid)
      .withColumn("fv", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("k") === 1)
      .select(col("user_id"), epochS(col("t")).as("h_epoch"),
              col("fv").as("val_cents"))
      .orderBy("user_id", "h_epoch")
  }

  /** Integer-exact EWMA (α = 1/2, depth 8) over each user's event
    * stream — the exponential-decay feature every risk/monitoring
    * pipeline computes. The decayed sum is Σₖ cents·2^(7−k) over the
    * last 8 events: powers of two on integer cents, so the result is
    * EXACT integer arithmetic on any engine — no FP accumulation
    * order to disagree on (R2). Eight shifted lags beat a
    * collect-the-frame lambda: every term stays inside whole-stage
    * codegen.
    */
  val winEwma: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val decayed = (0 to 7).map(k =>
      coalesce(lag(cents(col("value")), k).over(w), lit(0L)) * (1L << (7 - k)))
      .reduce(_ + _)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("ewma_c128", decayed.cast("long"))
      .select(col("user_id"), col("event_id"), col("ewma_c128"))
      .orderBy("user_id", "event_id")
      .limit(1000)
  }

  /** Selective-dimension fact join — the shape Spark's RUNTIME BLOOM
    * FILTER optimizes at scale: the filtered dim side builds a Bloom
    * filter that prunes fact rows before the shuffle (see the PlanSpec
    * guard, which pins `bloom_filter_might_contain` in the physical
    * plan with broadcast disabled). The query body is declarative —
    * the runtime filter is Catalyst's to inject, results identical
    * either way.
    */
  val joinRuntimeBloom: Q = (s, d) => {
    val part = Tables.t(s, d, "part")
      .filter(col("p_brand") === "Brand#1" && col("p_size") < 10)
    Tables.t(s, d, "lineitem")
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_size")
      .agg(cnt.as("n_lines"),
           sum(col("l_quantity").cast("long")).cast("long").as("qty_sum"))
      .orderBy("p_size")
  }

  /** OHLC downsampling (the financial-tick / metrics compaction
    * shape): per user per 6-hour bucket, open/high/low/close cents +
    * tick count. Open/close are `min_by`/`max_by` on the event time —
    * (user, ts) is unique in this corpus (FIXTURES.md), so the pick is
    * deterministic; all four legs are integer cents (R2). One keyed
    * aggregate — partial aggregation and AQE apply as with any groupBy.
    */
  val tsDownsampleOhlc: Q = (s, d) => {
    val bucket = floor(epochS(col("ts")) / 21600).cast("long")
    events(s, d).filter(col("user_id") < 50)
      .select(col("user_id"), bucket.as("b"), col("ts"),
              cents(col("value")).as("c"))
      .groupBy("user_id", "b")
      .agg(min_by(col("c"), col("ts")).as("open_c"),
           max(col("c")).as("high_c"),
           min(col("c")).as("low_c"),
           max_by(col("c"), col("ts")).as("close_c"),
           cnt.as("n"))
      .orderBy("user_id", "b")
      .limit(5000)
  }

  /** CDC apply (change-data-capture materialization): the event log is
    * a change stream — `error` events delete the key, everything else
    * upserts its cents value — and the operator materializes the final
    * keyed state: last operation per key wins, deleted keys absent.
    * This is the KTable-from-changelog / MERGE-apply shape; the plan
    * is one keyed window (rank by recency) + filter, co-partitioned on
    * the key.
    */
  val streamCdcApply: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
              when(col("event_type") === "error", "delete")
                .otherwise("upsert").as("op"),
              cents(col("value")).as("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "upsert")
      .select(col("user_id"), col("c").as("val_cents"))
      .orderBy("user_id")
      .limit(2000)
  }

  /** Exact heavy hitters: event types whose share exceeds 5% of all
    * events, with integer-permille shares (`div` truncation — both
    * engines floor on positives, so no FP ratio ever materializes).
    * Two-phase: per-type counts (partial-agg'd) + a 1-row total
    * broadcast — the exact-counting base case the sketch variants
    * (approx_count_distinct etc.) approximate at higher cardinality.
    */
  val aggHeavyHitters: Q = (s, d) => {
    val counts = events(s, d).groupBy("event_type").agg(cnt.as("c"))
    val total = events(s, d).agg(cnt.as("total"))
    counts.crossJoin(broadcast(total))
      .filter(col("c") * 20 > col("total"))
      .select(col("event_type"), col("c"),
              expr("div(c * 1000, total)").as("share_pm"))
      .orderBy("event_type")
  }

  /** Table-integrity checksum (the cross-engine audit this repo's own
    * oracle gate runs, packaged as an operator): per order-status, row
    * count + XOR of a 60-bit md5 prefix over the canonicalized row
    * (integer and string columns only — doubles go through cents, so
    * the string form is bit-identical on any engine). XOR is
    * order-independent, so the checksum needs no sort and
    * parallelizes like any aggregate; equal checksums ⇒ equal row
    * multisets with overwhelming probability.
    */
  val auditTableChecksum: Q = (s, d) => {
    val rowStr = concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"), cents(col("o_totalprice")))
    orders(s, d)
      .select(col("o_orderstatus"),
              conv(substring(md5(rowStr), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy("o_orderstatus")
      .agg(cnt.as("n_rows"), expr("bit_xor(h)").as("checksum"))
      .orderBy("o_orderstatus")
  }

  /** Semi-structured access through Spark 4's VARIANT type: the JSON
    * payload parses once into the binary Variant encoding and typed
    * paths extract WITHOUT re-tokenizing the JSON per field — the
    * modern engine path for schema-on-read at scale (shredded columnar
    * variants at rest; one parse, many extractions). Results are plain
    * integers, so the SQL-JSON oracle pins the semantics.
    */
  val jsonVariantFuncs: Q = (s, d) => {
    val k = variant_get(parse_json(col("props")), "$.k", "int")
    events(s, d)
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(cnt.as("n"), sum("k").cast("long").as("k_sum"),
           max("k").cast("long").as("k_max"))
      .orderBy("event_type")
  }

  /** Mergeable-sketch rollup: per-day HLL sketches of the distinct
    * user set, unioned into period estimates — the pre-aggregation
    * pattern that makes 100 TB distinct-count dashboards O(days)
    * instead of O(events): daily sketches persist as bytes, any date
    * range is a cheap union of sketches, never a rescan. Estimates are
    * DataSketches-specific → no SQL oracle (R7); AnalyticsSpec gates
    * the estimate within 2% of exact and proves daily ∪ == global.
    */
  val aggHllUsers: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(to_date(col("ts")).as("w"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
           cnt.as("n_events"))
    daily.select(col("w"),
                 hll_sketch_estimate(col("sk")).as("est_users"),
                 col("n_events"))
      .orderBy("w")
  }

  /** Point-in-time (temporal) join against the SCD2 dimension — the
    * feature-store lookup: each purchase joins the state version that
    * was valid AT ITS TIMESTAMP ([valid_from, valid_to) half-open, one
    * open version per user). Equi-key on user + interval residual:
    * co-partitioned on user_id, candidates bounded by versions-per-user.
    * At extreme history depth the same semantics become a sort-merge
    * as-of probe (AsOf.scala family); the join shape here is the
    * declarative form AQE can reason about.
    */
  val joinScd2PointInTime: Q = (s, d) => {
    val e = events(s, d)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val v = e.select(col("user_id"), col("event_type").as("state"),
                     col("ts").as("valid_from"),
                     lead(col("ts"), 1).over(w).as("valid_to"))
    val f = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("f_user"), col("ts").as("f_ts"))
    f.join(v, col("f_user") === col("user_id") &&
              col("f_ts") >= col("valid_from") &&
              (col("valid_to").isNull || col("f_ts") < col("valid_to")))
      .select(col("event_id"), col("state"), unix_micros(col("valid_from")).as("vf_us"))
      .orderBy("event_id")
  }

  /** Sketch-based top-k: `approx_top_k` (Spark 4.1 native DataSketches
    * frequent-items) per event type value domain — the heavy-hitter
    * sketch whose state merges across partitions/days exactly like the
    * HLL path above. Sketch internals are engine-specific → no SQL
    * oracle (R7); AnalyticsSpec gates it against the EXACT top-k
    * (`agg_heavy_hitters` family) — with 5 distinct values the sketch
    * must be exact, and the test proves it is.
    */
  val aggApproxTopk: Q = (s, d) =>
    events(s, d)
      .agg(expr("approx_top_k(event_type, 3)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("event_type"), col("e.count").cast("long").as("c"))
      .orderBy(col("c").desc, col("event_type"))

  /** Co-purchase importance over the part↔supplier bipartite graph —
    * [[Scale.pagerankInt]] on the distinct lineitem (supplier, part)
    * pairs, edges in both directions (node ids: part·2, supplier·2+1).
    * Six fixed rounds, all-integer arithmetic; the oracle replays the
    * identical rounds as chained (non-recursive) CTEs. Top 50 by
    * (rank, node).
    */
  val graphPagerank: Q = (s, d) => {
    val li = Tables.t(s, d, "lineitem")
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
    val fwd = li.select((col("pk") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
    val bwd = li.select((col("sk") * 2 + 1).as("src"), (col("pk") * 2).as("dst"))
    Scale.pagerankInt(fwd.unionByName(bwd), 6)
      .orderBy(col("rank").desc, col("node"))
      .limit(50)
  }

  /** ANSI-safe error handling: `try_divide` / `try_cast` / `try_add`
    * turn division-by-zero, unparseable casts and long overflow into
    * NULLs instead of job-killing exceptions — the semantics a 100 TB
    * batch needs (one malformed row must not fail a 6-hour job).
    * Output counts the rescued NULLs per status plus the surviving
    * cents sum (null rows drop from sums on both engines).
    */
  val exprTryFuncs: Q = (s, d) =>
    orders(s, d)
      .select(col("o_orderstatus"),
              try_divide(col("o_totalprice"), (col("o_custkey") % 3).cast("double"))
                .as("dv"),
              expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("pc"),
              expr("try_add(9223372036854775807L, o_orderkey)").as("ov"))
      .groupBy("o_orderstatus")
      .agg(cnt.as("n"),
           sum(when(col("dv").isNull, 1L).otherwise(0L)).cast("long").as("n_div_null"),
           sumCents(col("dv")).as("div_cents"),
           sum("pc").cast("long").as("prio_sum"),
           sum(when(col("ov").isNull, 1L).otherwise(0L)).cast("long").as("n_overflow"))
      .orderBy("o_orderstatus")

  /** Exact triangle census — [[Scale.triangleCount]] over a
    * deterministic Erdős–Rényi-style graph derived from the order
    * keys: 512 nodes, one edge per order via two independent md5
    * digests (a LINEAR hash pair puts every edge on one line in Z² and
    * yields zero triangles — measured; md5 gives the generic random
    * graph). Degree orientation keeps the wedge join O(m^1.5) no
    * matter how skewed the degrees get; the oracle replays the
    * identical orientation as CTEs.
    */
  val graphTriangleCount: Q = (s, d) => {
    def node(salt: String) =
      conv(substring(md5(concat(col("o_orderkey").cast("string"), lit(salt))), 1, 8), 16, 10)
        .cast("long") % 512
    Scale.triangleCount(orders(s, d).select(node("s").as("src"), node("t").as("dst")))
  }

  /** KMV (k-minimum-values) distinct-count sketch — the ORACLED
    * mergeable sketch (unlike `agg_hll_users`, which is test-gated):
    * the hash is engine-portable integer arithmetic (two LCG rounds
    * mod 2³¹, every intermediate < 2⁶³), so DuckDB replays the exact
    * estimate. Per l_returnflag: the k = 128 smallest distinct hash
    * values of the (partkey, suppkey) composite via the mergeable
    * bounded-heap [[graft.functions.BottomK]] aggregate (map-side
    * partials carry ≤ k rows per group — the 100 TB shape), estimate
    * `(k−1)·2³¹ div h₍k₎`, exact truth alongside. The ALL row is the
    * sketch MERGE: k smallest of the deduped union of the per-group
    * sketch arrays — provably equal to the k smallest global distinct
    * hashes (each global minimum is in its own group's sketch), which
    * is what the oracle computes directly.
    *
    * Working in distinct-hash space makes the k-th smallest value ≥
    * k−1 > 0, so the estimator needs no division guard; the only edge
    * is n < k, where KMV's rule is estimate = exact (the sketch holds
    * the whole set).
    */
  val aggKmvDistinct: Q = (s, d) => {
    import graft.functions.TopKFunctions.bottom_k
    val k = 128
    val dh = Tables.t(s, d, "lineitem")
      .select(col("l_returnflag").as("grp"),
        expr("""pmod(pmod(pmod(l_partkey * 1000000 + l_suppkey, 2147483648)
               |          * 2654435761 + 1013904223, 2147483648)
               |     * 1597334677 + 12345, 2147483648)""".stripMargin).as("h"))
      .distinct()
      // dh feeds the per-group sketch AND the global truth count, and
      // Spark does not reuse identical non-exchange subtrees across
      // join branches (verified: no ReusedExchange in the plan) —
      // materialize once instead of re-scanning + re-distincting
      .localCheckpoint()
    val perGroup = dh.groupBy("grp")
      .agg(bottom_k(struct(col("h")), k).as("sk"), cnt.as("n_exact"))
      .withColumn("kth_h",
        when(size(col("sk")) >= k, expr("element_at(sk, " + k + ").h")).otherwise(0L)
          .cast("long"))
    val merged = perGroup
      .agg(expr("array_sort(array_distinct(flatten(collect_list(transform(sk, x -> x.h)))))")
             .as("hs"))
    val allExact = dh.select("h").distinct().agg(cnt.as("n_exact"))
    val allRow = merged.crossJoin(allExact)
      .withColumn("kth_h",
        when(size(col("hs")) >= k, expr("element_at(hs, " + k + ")")).otherwise(0L)
          .cast("long"))
      .select(lit("ALL").as("grp"), col("n_exact"), col("kth_h"))
    perGroup.select(col("grp"), col("n_exact"), col("kth_h"))
      .unionByName(allRow)
      .withColumn("est_distinct",
        when(col("n_exact") < k, col("n_exact"))
          .otherwise(expr(s"div(${k - 1}L * 2147483648L, kth_h)")).cast("long"))
      .orderBy("grp")
  }

  /** CUSUM change-point scan over daily purchase revenue — the
    * monitoring primitive that flags WHEN a metric's level shifted.
    * Deviations are kept integer by scaling cents by n_days instead of
    * subtracting the fractional mean (`dev = cents·n − total`), so the
    * running sum — and the argmax |cusum| flag — are exact on both
    * engines. The only unpartitioned window runs over the day-domain
    * table (bounded by the calendar, never by event volume); the two
    * scalars ride 1-row broadcasts.
    */
  val tsCusumChangepoint: Q = (s, d) => {
    val daily = Tables.t(s, d, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("dd"))
      .agg(sumCents(col("value")).as("cents"))
    val tot = daily.agg(cnt.as("n_days"), sum("cents").cast("long").as("total_cents"))
    val wcs = Window.orderBy("dd")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cs = daily.crossJoin(broadcast(tot))
      .withColumn("dev", (col("cents") * col("n_days") - col("total_cents")).cast("long"))
      .withColumn("cusum", sum("dev").over(wcs).cast("long"))
    val peak = cs.agg(max(abs(col("cusum"))).as("peak"))
    cs.crossJoin(broadcast(peak))
      .select(col("dd"), col("cents"), col("dev"), col("cusum"),
              when(abs(col("cusum")) === col("peak"), 1L).otherwise(0L).as("is_peak"))
      .orderBy("dd")
  }

  /** Session co-occurrence lift between event types — the
    * market-basket association census: for every unordered type pair,
    * how much more often they share a (user, day) session than
    * independence predicts, as the exact integer lift argument
    * `n_both·n_sessions·10⁶ div (n_a·n_b)` (DECIMAL(38) intermediates).
    * The pair join keys on (user_id, day) — numeric/date, never a
    * string merge — and each session contributes ≤ C(5,2) pairs, so
    * candidate volume is linear in sessions; the marginals are a
    * 5-row broadcast and the session total a 1-row scalar.
    */
  val eventsCooccurLift: Q = (s, d) => {
    val sess = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("dd"), col("event_type"))
      .distinct()
      // sess feeds both self-join sides, the marginals, and the session
      // total — four subtrees Spark would otherwise recompute
      .localCheckpoint()
    val a = sess.select(col("user_id"), col("dd"), col("event_type").as("a_type"))
    val b = sess.select(col("user_id").as("b_uid"), col("dd").as("b_dd"),
                        col("event_type").as("b_type"))
    val pairs = a.join(b, col("user_id") === col("b_uid") && col("dd") === col("b_dd") &&
                          col("a_type") < col("b_type"))
      .groupBy("a_type", "b_type").agg(cnt.as("n_both"))
    val cx = sess.groupBy("event_type").agg(cnt.as("c"))
    val n = sess.select("user_id", "dd").distinct().agg(cnt.as("ns"))
    pairs
      .join(broadcast(cx.select(col("event_type").as("a_type"), col("c").as("c_a"))), "a_type")
      .join(broadcast(cx.select(col("event_type").as("b_type"), col("c").as("c_b"))), "b_type")
      .crossJoin(broadcast(n))
      .withColumn("lift_ppm", expr(
        """cast(div(cast(n_both as decimal(38,0)) * ns * 1000000,
          |          cast(c_a as decimal(38,0)) * c_b) as bigint)""".stripMargin))
      .select("a_type", "b_type", "n_both", "lift_ppm")
      .orderBy("a_type", "b_type")
  }

  /** Day-of-week seasonality profile per event type — the weekly
    * pattern census a metric pipeline publishes: per (type, ISO dow),
    * volume, revenue cents, and the seasonal index (the dow's average
    * revenue as ppm of the type's overall average) computed exactly as
    * `(cents_dw·n_total·10⁶) div (n_dw·cents_total)` with DECIMAL(38)
    * intermediates (no fractional means, overflow-free at any scale;
    * all values positive so truncating and flooring division agree).
    * Two keyed aggs; the per-type totals join is a 5-row broadcast.
    */
  val tsDowSeasonality: Q = (s, d) => {
    val g = Tables.t(s, d, "events")
      .select(col("event_type"),
              (expr("weekday(to_date(ts))") + 1).cast("long").as("isodow"),
              cents(col("value")).as("c"))
      .groupBy("event_type", "isodow")
      .agg(cnt.as("n"), sum("c").cast("long").as("cents"))
    val t = g.groupBy("event_type")
      .agg(sum("n").cast("long").as("n_total"), sum("cents").cast("long").as("cents_total"))
    g.join(broadcast(t), "event_type")
      .withColumn("idx_ppm", expr(
        """cast(div(cast(cents as decimal(38,0)) * n_total * 1000000,
          |          cast(n as decimal(38,0)) * cents_total) as bigint)""".stripMargin))
      .select("event_type", "isodow", "n", "cents", "idx_ppm")
      .orderBy("event_type", "isodow")
  }

  /** Degree distribution of the bipartite part↔supplier graph: per
    * side, how many nodes have each distinct-partner count — the
    * shape statistic every graph pipeline profiles before choosing an
    * algorithm (skew here is why [[Scale.triangleCount]] orients by
    * degree). Two keyed aggregates over the deduped edge list; output
    * bounded by the distinct degree values.
    */
  val graphDegreeDistribution: Q = (s, d) => {
    // lazy checkpoint (r19): both union sides consume the edge list —
    // without truncation the lineitem distinct replays per side
    val e = Tables.t(s, d, "lineitem")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sp")).distinct()
      .transform(Scale.materialize(_))
    e.select(col("p").as("node"), lit("part").as("side"))
      .unionAll(e.select(col("sp").as("node"), lit("supplier").as("side")))
      .groupBy("side", "node").agg(cnt.as("deg"))
      .groupBy("side", "deg").agg(cnt.as("n_nodes"))
      .orderBy("side", "deg")
  }

  val queries: Map[String, Q] = Map(
    "ts_dow_seasonality" -> tsDowSeasonality,
    "events_cooccur_lift" -> eventsCooccurLift,
    "ts_cusum_changepoint" -> tsCusumChangepoint,
    "graph_degree_distribution" -> graphDegreeDistribution,
    "agg_kmv_distinct" -> aggKmvDistinct,
    "expr_try_funcs" -> exprTryFuncs,
    "graph_pagerank" -> graphPagerank,
    "graph_triangle_count" -> graphTriangleCount,
    "json_variant_funcs" -> jsonVariantFuncs,
    "agg_hll_users" -> aggHllUsers,
    "agg_approx_topk" -> aggApproxTopk,
    "join_scd2_pointintime" -> joinScd2PointInTime,
    "scd2_user_state" -> scd2UserState,
    "snapshot_diff" -> snapshotDiff,
    "join_interval_overlap" -> joinIntervalOverlap,
    "ts_resample_ffill" -> tsResampleFfill,
    "win_ewma" -> winEwma,
    "join_runtime_bloom" -> joinRuntimeBloom,
    "ts_downsample_ohlc" -> tsDownsampleOhlc,
    "stream_cdc_apply" -> streamCdcApply,
    "agg_heavy_hitters" -> aggHeavyHitters,
    "audit_table_checksum" -> auditTableChecksum,
  )
}
