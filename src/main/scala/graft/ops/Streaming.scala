package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Batch equivalents of the streaming topology surface (SURVEY.md
  * §2.3 `stream_*`, §1.1): tumbling / hopping / session windows, keyed
  * dedup, time-band stream-stream join, per-key running aggregation,
  * and the two-leg reconciliation flagship.
  *
  * Each body is written against plain `DataFrame` transforms that are
  * equally valid on a streaming DataFrame — the true-streaming twins
  * (watermarks, `MemoryStream`, append/update modes) live in
  * [[graft.streaming.StreamOps]] and reuse these shapes, which is the
  * capability-parity argument of SURVEY.md §2.5.
  */
object Streaming {

  private def events(s: SparkSession, d: String) = Tables.t(s, d, "events")

  private def typed(s: SparkSession, d: String, tpe: String, prefix: String): DataFrame =
    events(s, d).filter(col("event_type") === tpe)
      .select(col("event_id").as(s"${prefix}_id"),
              col("user_id").as(s"${prefix}_user"),
              col("ts").as(s"${prefix}_ts"))

  /** Tumbling 1-day window (streaming twin: `window($"ts", "1 day")`). */
  val tumblingDaily: Q = (s, d) =>
    events(s, d)
      .groupBy(to_date(col("ts")).as("w"), col("event_type"))
      .agg(cnt.as("c"), sumCents(col("value")).as("val_cents"))
      .orderBy("w", "event_type")

  /** Hopping window, 1h size / 30m slide, via the same `window()`
    * function a streaming query would use. The oracle's generate_series
    * starts at 2024-01-01, so windows opened before the series start
    * (Spark assigns boundary events to the 2023-12-31 23:30 window too)
    * are clipped to the series range.
    */
  val sliding1h30m: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "60 minutes", "30 minutes"))
      .agg(cnt.as("c"))
      .filter(col("window.start").between(ts("2024-01-01 00:00:00"),
                                          ts("2024-01-31 00:00:00")))
      .select(unix_timestamp(col("window.start")).as("w_start"), col("c"))
      .orderBy("w_start")
      .limit(2000)

  /** Session windows with a 30-minute gap. Spark opens a new session
    * when the next event's window [ts, ts+gap) does not overlap the
    * previous one — i.e. at gap ≥ 30 min, matching the oracle's
    * gaps-and-islands `>= INTERVAL 30 MINUTE` break condition.
    */
  val session30m: Q = (s, d) =>
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(cnt.as("len"))
      .groupBy("user_id")
      .agg(cnt.as("n_sessions"), max(col("len")).as("max_len"))
      .orderBy("user_id")

  /** Keyed dedup per (user, type, minute) — retransmit suppression.
    * Streaming twin: `dropDuplicatesWithinWatermark`.
    */
  val dedupKeys: Q = (s, d) =>
    events(s, d)
      .select(col("user_id"), col("event_type"),
              date_trunc("minute", col("ts")).as("mn"))
      .dropDuplicates("user_id", "event_type", "mn")
      .groupBy("user_id", "event_type")
      .agg(cnt.as("c"))
      .orderBy("user_id", "event_type")
      .limit(2000)

  /** Time-band join of two event legs (clicks → purchases within 1h).
    * Streaming twin adds `withWatermark` on both sides; the equi-key on
    * user_id keeps it a shuffled hash join, with the band predicate as
    * a post-join filter — no nested loop.
    */
  val streamStreamJoin1h: Q = (s, d) => {
    val a = typed(s, d, "click", "a")
    val b = typed(s, d, "purchase", "b")
    a.join(b, col("a_user") === col("b_user") &&
              col("b_ts") >= col("a_ts") &&
              col("b_ts") < col("a_ts") + expr("INTERVAL 60 MINUTES"))
      .select(col("a_id").as("click_id"), col("b_id").as("purch_id"))
      .orderBy("click_id", "purch_id")
      .limit(2000)
  }

  /** Per-key running aggregate — the KTable / update-mode analogue. */
  val runningCount: Q = (s, d) =>
    events(s, d)
      .groupBy("user_id")
      .agg(cnt.as("n_events"), sumCents(col("value")).as("total_cents"))
      .orderBy("user_id")

  /** Two-leg windowed reconciliation — the reference's flagship shape
    * (SURVEY.md §1.1): signups matched to purchases within 24h, plus
    * unmatched counts on both legs. ONE full-outer band join classifies
    * every row (matched = both legs present; null side = unmatched) —
    * the same single-pass shape as the streaming twin
    * [[graft.streaming.StreamOps.reconStream]], and 3× less join work
    * than the matched/anti/anti formulation.
    */
  val reconLegMatch: Q = (s, d) => {
    val a = typed(s, d, "signup", "a")
    // shuffle_hash: full outer is hash-joinable since Spark 3.1 —
    // the hint drops SortMergeJoin's two leg sorts (plan-verified:
    // ShuffledHashJoin FullOuter, zero Sort nodes). Locally the win
    // sits inside the host noise band (PLANS.md round 9); at scale
    // two saved fact-leg sorts are real, and the band residual
    // evaluates per probed key group either way. Build side = the
    // purchase leg (the smaller leg on this corpus).
    val b = typed(s, d, "purchase", "b").hint("shuffle_hash")
    a.join(b, col("a_user") === col("b_user") &&
              col("b_ts") >= col("a_ts") &&
              col("b_ts") < col("a_ts") + expr("INTERVAL 24 HOURS"),
           "full_outer")
      .select(when(col("a_id").isNotNull && col("b_id").isNotNull, "matched")
                .when(col("b_id").isNull, "unmatched_a")
                .otherwise("unmatched_b").as("status"))
      .groupBy("status")
      .agg(cnt.as("c"))
      .orderBy("status")
  }

  /** Tolerance-classified reconciliation — the value-matching layer on
    * top of [[reconLegMatch]]'s time-band pairing: each matched pair is
    * classified exact / near (within 1.00) / mismatch on its
    * integer-cents amounts. Cents make the money comparison bit-stable
    * on any engine (R2); the tolerance boundary is an integer compare,
    * so no FP edge exists.
    */
  val reconValueTolerance: Q = (s, d) => {
    val a = events(s, d).filter(col("event_type") === "signup")
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
              cents(col("value")).as("a_cents"))
    val b = events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
              cents(col("value")).as("b_cents"))
    a.join(b, col("a_user") === col("b_user") &&
              col("b_ts") >= col("a_ts") &&
              col("b_ts") < col("a_ts") + expr("INTERVAL 24 HOURS"))
      .select(when(col("a_cents") === col("b_cents"), "exact")
                .when(abs(col("a_cents") - col("b_cents")) <= 100, "near")
                .otherwise("mismatch").as("value_class"))
      .groupBy("value_class")
      .agg(cnt.as("c"))
      .orderBy("value_class")
  }

  /** Per-user inactivity-gap detection (the session-timeout /
    * keep-alive-loss shape): consecutive events more than 6h apart,
    * counted per user with the worst gap. Gaps are whole-second
    * integers (R4: both engines floor epoch seconds; the ns→µs
    * truncation can't move a second boundary), and the 6h threshold
    * sits on ns-random timestamps — an exact-boundary collision is
    * measure-zero.
    */
  val streamGapDetect: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .filter(col("gap_s") > 21600)
      .groupBy("user_id")
      .agg(cnt.as("n_gaps"), max("gap_s").cast("long").as("max_gap_s"))
      .orderBy("user_id")
  }

  /** Gaps-and-islands sessionization with per-user stats: sessions are
    * maximal event runs with inter-event gaps ≤ 30 min (the same gap
    * as `stream_session_30m`), identified by a running sum of boundary
    * markers; output per user = session count, event count, total
    * in-session dwell seconds. Exposes session STRUCTURE where the
    * session-window query exposes only per-window counts. Gap
    * classification compares INTEGER whole-second diffs that both
    * engines compute identically (R4), so the session assignment is
    * bit-stable even when a gap lands exactly on the threshold.
    */
  val eventsSessionizeStats: Q = (s, d) => {
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val wrun = wo.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(wo)))
      .withColumn("new_sess",
        when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .withColumn("sid", sum("new_sess").over(wrun))
      .groupBy("user_id", "sid")
      .agg(cnt.as("n_ev"),
           (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("dur_s"))
      .groupBy("user_id")
      .agg(cnt.as("n_sessions"), sum("n_ev").cast("long").as("n_events"),
           sum("dur_s").cast("long").as("dwell_s"))
      .orderBy("user_id")
  }

  /** Weekly retention cohorts: users bucketed by the week of their
    * first signup, counted distinct in every week they were active —
    * the standard cohort-retention matrix, built from one keyed
    * min-aggregation and one distinct count, both co-partitioned on
    * user_id. Week truncation is Monday-based on both engines (R4).
    */
  val eventsRetentionCohort: Q = (s, d) => {
    val first = events(s, d).filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min("ts").as("ft"))
      .select(col("user_id"), to_date(date_trunc("week", col("ft"))).as("cohort_w"))
    events(s, d)
      .join(first, Seq("user_id"))
      .select(col("cohort_w"), to_date(date_trunc("week", col("ts"))).as("active_w"),
              col("user_id"))
      .distinct()
      .groupBy("cohort_w", "active_w")
      .agg(cnt.as("n_users"))
      .orderBy("cohort_w", "active_w")
  }

  /** Pivot — per-user event-type counts as columns (the re-keyed
    * KTable.groupBy().aggregate() analogue in wide form). Explicit
    * value list keeps the plan single-pass (no distinct-values scan)
    * and the output schema fixed.
    */
  val aggPivot: Q = (s, d) =>
    events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "purchase", "signup", "view", "error"))
      .agg(cnt)
      .select(col("user_id"),
              coalesce(col("click"), lit(0L)).as("n_click"),
              coalesce(col("purchase"), lit(0L)).as("n_purchase"),
              coalesce(col("signup"), lit(0L)).as("n_signup"),
              coalesce(col("view"), lit(0L)).as("n_view"),
              coalesce(col("error"), lit(0L)).as("n_error"))
      .orderBy("user_id")
      .limit(2000)

  /** Ordered-funnel analysis: users who signed up, then clicked AFTER
    * their first signup, then purchased AFTER that first
    * qualifying click. Each stage is a keyed min-aggregation joined to
    * the previous stage's per-user frontier — three co-partitioned
    * shuffles on user_id, no per-user iteration, the standard
    * distributed funnel shape.
    */
  val eventFunnel: Q = (s, d) => {
    val e = events(s, d)
    def firstAfter(tpe: String, frontier: org.apache.spark.sql.DataFrame,
                   tcol: String, out: String) =
      e.filter(col("event_type") === tpe)
        .join(frontier, Seq("user_id"))
        .filter(col("ts") > col(tcol))
        .groupBy("user_id").agg(min("ts").as(out))
    val su = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("st"))
    val cl = firstAfter("click", su, "st", "ct")
    val pu = firstAfter("purchase", cl, "ct", "pt")
    su.agg(cnt.as("n_signup"))
      .crossJoin(cl.agg(cnt.as("n_click_after")))
      .crossJoin(pu.agg(cnt.as("n_purchase_after")))
  }

  /** Windowed top-k: the two most frequent event types per day (ties
    * break alphabetically). The Kafka Streams analogue is a windowed
    * count + per-window rank; in Structured Streaming the windowed
    * count is incremental (update mode) and the rank is the per-batch
    * post-process in `foreachBatch` — rank-over-window is not an
    * incremental operator, so the canonical streaming shape ranks each
    * emitted window snapshot, which this batch body mirrors exactly.
    */
  val topkPerDay: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy(col("c").desc, col("event_type"))
    events(s, d)
      .select(to_date(col("ts")).as("w"), col("event_type"))
      .groupBy("w", "event_type")
      .agg(cnt.as("c"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 2)
      .orderBy("w", "rk")
  }

  /** Batch twin of [[graft.streaming.StreamOps.chainedHourlyDaily]]:
    * window-on-window re-aggregation — hourly per-type counts fold
    * into daily totals carrying how many distinct hourly partials fed
    * each day. Same `window(window(...))` chaining Spark executes as
    * two stateful operators in streaming; here Catalyst collapses it
    * to two keyed aggregates (one shuffle each, partials map-side).
    */
  val chainedWindows: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(cnt.as("c_hour"))
      .groupBy(window(col("window"), "1 day"), col("event_type"))
      .agg(sum("c_hour").cast("long").as("c_day"), cnt.as("n_hours"))
      .select(to_date(col("window.start")).cast("string").as("w"),
              col("event_type"), col("c_day"), col("n_hours"))
      .orderBy("w", "event_type")

  /** Unmatched-leg aging report — the operational view a
    * reconciliation system publishes: signups with NO purchase from
    * the same user within 24h, bucketed by how long they have been
    * outstanding (relative to the corpus max timestamp = "now").
    * The anti band join is the complement of `recon_leg_match`'s
    * matched set; ages in whole seconds (R4). One user-key shuffle +
    * a 1-row broadcast "now".
    */
  val reconAgingBuckets: Q = (s, d) => {
    val e = events(s, d)
    val sg = typed(s, d, "signup", "s")
    val p = typed(s, d, "purchase", "p")
    val unmatched = sg.join(p,
      col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") < col("s_ts") + expr("INTERVAL 24 HOURS"),
      "left_anti")
    val now = e.agg(max(col("ts")).as("now_ts"))
    unmatched.crossJoin(broadcast(now))
      .withColumn("age_s", unix_timestamp(col("now_ts")) - unix_timestamp(col("s_ts")))
      .withColumn("bucket",
        when(col("age_s") < 7L * 86400, "lt7d")
          .when(col("age_s") < 21L * 86400, "lt21d")
          .otherwise("21d_plus"))
      .groupBy("bucket")
      .agg(cnt.as("n"), min("age_s").cast("long").as("min_age_s"),
           max("age_s").cast("long").as("max_age_s"))
      .orderBy("bucket")
  }

  /** Last-touch attribution: each purchase is credited to the most
    * recent PRECEDING non-purchase event of the same user (the
    * marketing-attribution census every event pipeline publishes).
    * One user-keyed window carries the last non-purchase type forward
    * (`last(..., ignoreNulls)` over an unbounded-to-1-preceding frame
    * — never a self-join), then one keyed agg; revenue follows the R2
    * integer-cents rule.
    */
  val eventsAttribution: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
             ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("none")).as("attributed"))
      .agg(cnt.as("n_purchases"), sumCents(col("value")).as("revenue_cents"))
      .orderBy("attributed")
  }

  /** Top-20 daily user journeys: the first five event types of each
    * (user, day), in (ts, event_id) order, joined into a path string —
    * sequence mining's frequent-prefix census. The per-key collect is
    * bounded by the day's events and the sort happens INSIDE each
    * group's array (array_sort over structs), so the only shuffles are
    * the (user, day) agg and the path census; top-20 plans as
    * TakeOrderedAndProject, never a global sort.
    */
  val eventsPathTopk: Q = (s, d) =>
    events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("dd"))
      .agg(expr(
        """array_join(
          |  transform(slice(array_sort(collect_list(struct(ts, event_id, event_type))), 1, 5),
          |            e -> e.event_type), '>')""".stripMargin).as("path"))
      .groupBy("path")
      .agg(cnt.as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)

  /** THREE-LEG chained reconciliation (round 9): each signup is
    * enriched with its FIRST purchase within 24 h, and each matched
    * purchase with the FIRST error within the following 24 h — the
    * chained forward-as-of shape of a multi-hop settlement pipeline
    * (order → shipment → confirmation). Each hop is the declared
    * band-join + min-struct argmin; left-outer keeps the broken
    * chains, and the census classifies no_purchase /
    * purchase_no_error / full_chain with whole-second end-to-end
    * latency for complete chains (R4: both engines floor epoch
    * seconds identically).
    */
  val reconChainFollowup: Q = (s, d) => {
    val e = events(s, d)
    def leg(t: String, p: String) = e.filter(col("event_type") === t)
      .select(col("event_id").as(s"${p}_id"), col("user_id").as(s"${p}_user"),
              col("ts").as(s"${p}_ts"))
    val sg = leg("signup", "s")
    val pu = leg("purchase", "p")
    val er = leg("error", "e")
    val firstP = sg
      .join(pu, col("s_user") === col("p_user") &&
                col("p_ts") > col("s_ts") &&
                col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOURS"),
            "left_outer")
      .groupBy("s_id", "s_user", "s_ts")
      .agg(min(struct(col("p_ts"), col("p_id"))).as("fp"))
      .select(col("s_id"), col("s_user"), col("s_ts"),
              col("fp.p_id").as("p_id"), col("fp.p_ts").as("p_ts"))
    firstP
      .join(er, col("s_user") === col("e_user") &&
                col("e_ts") > col("p_ts") &&
                col("e_ts") <= col("p_ts") + expr("INTERVAL 24 HOURS"),
            "left_outer")
      .groupBy("s_id", "s_ts", "p_id", "p_ts")
      .agg(min(struct(col("e_ts"), col("e_id"))).as("fe"))
      .select(
        when(col("p_id").isNull, "no_purchase")
          .when(col("fe.e_id").isNull, "purchase_no_error")
          .otherwise("full_chain").as("status"),
        when(col("fe.e_id").isNotNull,
          unix_timestamp(col("fe.e_ts")) - unix_timestamp(col("s_ts")))
          .otherwise(0L).as("lat"))
      .groupBy("status")
      .agg(cnt.as("n"), sum("lat").cast("long").as("latency_s_sum"))
      .orderBy("status")
  }

  val queries: Map[String, Q] = Map(
    "recon_chain_followup" -> reconChainFollowup,
    "events_attribution" -> eventsAttribution,
    "events_path_topk" -> eventsPathTopk,
    "recon_aging_buckets" -> reconAgingBuckets,
    "agg_chained_windows" -> chainedWindows,
    "event_funnel" -> eventFunnel,
    "stream_topk_per_day" -> topkPerDay,
    "agg_pivot" -> aggPivot,
    "stream_tumbling_daily" -> tumblingDaily,
    "stream_sliding_1h30m" -> sliding1h30m,
    "stream_session_30m" -> session30m,
    "stream_dedup_keys" -> dedupKeys,
    "stream_stream_join_1h" -> streamStreamJoin1h,
    "stream_running_count" -> runningCount,
    "recon_leg_match" -> reconLegMatch,
    "recon_value_tolerance" -> reconValueTolerance,
    "stream_gap_detect" -> streamGapDetect,
    "events_sessionize_stats" -> eventsSessionizeStats,
    "events_retention_cohort" -> eventsRetentionCohort,
  )
}
