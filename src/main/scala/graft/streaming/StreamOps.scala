package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** True-streaming twins of the batch shapes in [[graft.ops.Streaming]]
  * (SURVEY.md §2.5). Each takes a *streaming* DataFrame (from any
  * source — `MemoryStream` in tests; a Kafka `format("kafka")` source
  * in production, whose connector jar is absent in this environment,
  * SURVEY §0) and adds the streaming-only concerns: watermarks (grace
  * period / KIP-328 analogue), append-mode emit-final, state eviction.
  *
  * The aggregation bodies are the same expressions as the batch
  * equivalents — that shared shape is the capability-parity argument:
  * a user switches a batch pipeline to streaming by swapping the
  * source and adding a watermark, not by rewriting queries.
  */
object StreamOps {

  /** Event record mirroring the `events` table schema (FIXTURES.md). */
  case class Evt(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double, props: String)

  /** Tumbling 1-day window with late-data drop; append mode emits each
    * window once, when the watermark passes its end (emit-final /
    * suppress analogue).
    */
  def tumblingDaily(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("c"),
           sum(round(col("value") * 100).cast("long")).cast("long").as("val_cents"))

  /** CHAINED windowed aggregations — two stateful operators in one
    * streaming query (Spark ≥ 3.5 native support: `window(window_col,
    * ...)` re-windows the first aggregation's output by its window's
    * end): hourly per-type counts roll up into daily totals without an
    * intermediate sink. Each level holds only its own open windows in
    * state; the hourly partials emit (append, watermark-closed) and
    * immediately feed the daily fold — the two-tier rollup a metrics
    * pipeline otherwise builds as two jobs plus a topic between them.
    */
  def chainedHourlyDaily(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c_hour"))
      .groupBy(window(col("window"), "1 day"), col("event_type"))
      .agg(sum("c_hour").cast("long").as("c_day"),
           count(lit(1)).as("n_hours"))

  /** Hopping window: 60-minute windows sliding every 30 minutes. */
  def sliding1h30m(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "60 minutes", "30 minutes"))
      .agg(count(lit(1)).as("c"))

  /** Session windows with a 30-minute gap; sessions merge across
    * micro-batches until the watermark closes them.
    */
  def session30m(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("len"))

  /** Session windows with a PER-EVENT dynamic gap (round 11): the gap
    * an event contributes depends on its type — purchases hold the
    * session open 30 minutes, everything else 10 (the "a conversion
    * extends engagement" policy Kafka Streams expresses with
    * `SessionWindows.withGap` per-stream only; Spark's
    * `session_window(col, gapExpr)` makes it per-ROW). Batch and
    * streaming share the expression; sessions merge until no member's
    * own gap reaches the next event.
    */
  def sessionDynamicGap(events: DataFrame,
                        watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"),
                 when(col("event_type") === "purchase", "30 minutes")
                   .otherwise("10 minutes")),
               col("user_id"))
      .agg(count(lit(1)).as("len"))

  /** Keyed dedup with state eviction — retransmit suppression whose
    * state is bounded by the watermark (vs unbounded `dropDuplicates`).
    */
  def dedupKeys(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("mn", date_trunc("minute", col("ts")))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "mn")

  /** Stream-stream time-band join (clicks → purchases within 1h).
    * Watermarks on both sides bound join state; the equi-key keeps it
    * a streaming symmetric hash join, with the band as a post-filter.
    */
  def bandJoin1h(clicks: DataFrame, purchases: DataFrame,
                 watermark: String = "10 minutes"): DataFrame = {
    val a = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("a_user"),
              col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = purchases
      .select(col("event_id").as("purch_id"), col("user_id").as("b_user"),
              col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b, col("a_user") === col("b_user") &&
              col("b_ts") >= col("a_ts") &&
              col("b_ts") < col("a_ts") + expr("INTERVAL 60 MINUTES"))
      .select("click_id", "purch_id")
  }

  /** LEFT OUTER stream-stream band join: every click emits — matched
    * rows as matches arrive, UNMATCHED clicks with a NULL purchase
    * once the watermark proves no match can still come. The
    * click-side state eviction is exactly the unmatched-emission
    * trigger (between [[bandJoin1h]]'s inner join and
    * [[reconStream]]'s full-outer).
    */
  def bandJoinLeftOuter(clicks: DataFrame, purchases: DataFrame,
                        watermark: String = "10 minutes"): DataFrame = {
    val a = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("a_user"),
              col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = purchases
      .select(col("event_id").as("purch_id"), col("user_id").as("b_user"),
              col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b, col("a_user") === col("b_user") &&
              col("b_ts") >= col("a_ts") &&
              col("b_ts") < col("a_ts") + expr("INTERVAL 60 MINUTES"),
           "left_outer")
      .select("click_id", "purch_id")
  }

  /** Streaming two-leg reconciliation — the flagship topology
    * (SURVEY.md §1.1): full-outer stream-stream join of leg A (signups)
    * and leg B (purchases) on key + 24h band, with watermarks on both
    * sides. Within the window, matches emit as soon as both legs
    * arrive; once the watermark passes a row's join window, the row is
    * evicted and emitted null-padded — i.e. classified `unmatched_a` /
    * `unmatched_b` — exactly the reconciliation outcome stream.
    */
  def reconStream(legA: DataFrame, legB: DataFrame,
                  watermark: String = "10 minutes"): DataFrame = {
    val a = legA
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
              col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = legB
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"),
              col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b, col("a_user") === col("b_user") &&
              col("b_ts") >= col("a_ts") &&
              col("b_ts") < col("a_ts") + expr("INTERVAL 24 HOURS"),
           "full_outer")
      .select(
        when(col("a_id").isNotNull && col("b_id").isNotNull, "matched")
          .when(col("b_id").isNull, "unmatched_a")
          .otherwise("unmatched_b").as("status"),
        col("a_id"), col("b_id"))
  }

  /** Windowed top-k, streaming side (twin of `stream_topk_per_day`):
    * the per-window counts are the INCREMENTAL operator — update mode
    * refreshes exactly the windows a batch touches — while the rank is
    * applied per emitted snapshot via [[rankTopk]] in `foreachBatch`
    * (rank-over-window is not an incremental computation; the
    * canonical streaming shape re-ranks the serving view after each
    * merge, which is what the test does and what a real serving sink
    * would do).
    */
  def topkWindowCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day")("start").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))

  /** The per-snapshot rank step shared by the batch query and the
    * foreachBatch post-process: top-k event types per window, ties
    * alphabetical.
    */
  def rankTopk(counts: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy(col("c").desc, col("event_type"))
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Per-key running aggregate in update mode — the KTable analogue:
    * every micro-batch emits the refreshed per-key row.
    */
  def runningCount(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           sum(round(col("value") * 100).cast("long")).cast("long").as("total_cents"))

  /** Arbitrary stateful processing (Processor API analogue): a running
    * per-user event count via `flatMapGroupsWithState` — explicit
    * KeyValueStore-style state, one emitted row per key per batch.
    */
  def runningCountStateful(events: Dataset[Evt]): Dataset[(Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Evt], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((user, n))
      }
  }

  /** IDLE-KEY STATE RETENTION (round 11) — the Kafka Streams
    * store-retention analogue for `transformWithState` processors.
    * Every long-lived per-key state here previously pinned
    * `TTLConfig.NONE`: on an unbounded key space (user ids) the store
    * grows forever — the classic production OOM. Mixing this in gives
    * a processor one extra per-key ValueState (the armed idle
    * deadline) and one event-time timer, re-armed on every batch the
    * key appears in at `max(watermark, batch max event time) +
    * retentionMs`; when the watermark passes the deadline with no
    * newer activity, [[clearKeyState]] drops the key's entire state.
    * Eviction is WATERMARK-driven (deterministic — no processing-time
    * clock), and `retentionMs <= 0` keeps the prior keep-forever
    * behavior with zero extra state or timers.
    *
    * Semantics after eviction are BOUNDED STALENESS, documented per
    * processor: a key returning after the horizon restarts from empty
    * state (e.g. an as-of enrichment forgets a signup older than the
    * horizon), which is exactly the trade a retention-configured
    * Kafka Streams store makes.
    */
  trait IdleEviction[K, I, O] {
    self: org.apache.spark.sql.streaming.StatefulProcessor[K, I, O] =>
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimerValues, ValueState}

    /** Idle horizon in ms of event time; <= 0 disables eviction. */
    protected def retentionMs: Long

    @transient private var idleDeadline: ValueState[Long] = _

    /** Call from `init` after the processor's own states. */
    protected def initIdleEviction(): Unit =
      if (retentionMs > 0)
        idleDeadline = getHandle.getValueState[Long]("idleDeadline",
          E.scalaLong, TTLConfig.NONE)

    /** Call once per `handleInputRows`; `batchMaxEventMs` is the key's
      * max event time in this batch (Long.MinValue when the input
      * carries no event time — the deadline then rides the watermark
      * alone). One live timer per key: re-arming deletes the old one.
      */
    protected def touchIdleTimer(timers: TimerValues, batchMaxEventMs: Long): Unit =
      if (retentionMs > 0) {
        val base = math.max(timers.getCurrentWatermarkInMs(), batchMaxEventMs)
        // base == 0 means no event time AND the watermark hasn't moved
        // yet (a watermark-only processor's very first batch): arming
        // would set a near-epoch deadline that fires — and evicts —
        // immediately. Skip; the key arms on its next appearance.
        if (base > 0) {
          val next = base + retentionMs
          val prev = if (idleDeadline.exists()) idleDeadline.get() else Long.MinValue
          if (next > prev) {
            if (prev != Long.MinValue) getHandle.deleteTimer(prev)
            getHandle.registerTimer(next)
            idleDeadline.update(next)
          }
        }
      }

    /** Drop every named state the processor keeps for this key. */
    protected def clearKeyState(): Unit

    override def handleExpiredTimer(key: K, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[O] = {
      // only the CURRENTLY-armed deadline evicts: a stale timer (the
      // key was active again since) finds a newer deadline and no-ops
      if (retentionMs > 0 && idleDeadline.exists() &&
          expired.getExpiryTimeInMs() == idleDeadline.get()) {
        clearKeyState()
        idleDeadline.clear()
      }
      Iterator.empty
    }
  }

  /** Spark 4 `transformWithState` processor — the full Processor-API
    * analogue (named value states, timer surface available via the
    * handle). Keeps a per-user (count, cents) pair; emits the refreshed
    * totals per batch. Requires the RocksDB state store provider.
    */
  class RunningTotalsProcessor(override protected val retentionMs: Long = 0L)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (Long, Long, Long)]
      with IdleEviction[Long, Evt, (Long, Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var count: ValueState[Long] = _
    @transient private var cents: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", E.scalaLong, TTLConfig.NONE)
      cents = getHandle.getValueState[Long]("cents", E.scalaLong, TTLConfig.NONE)
      initIdleEviction()
    }

    override protected def clearKeyState(): Unit = { count.clear(); cents.clear() }

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(Long, Long, Long)] = {
      var n = if (count.exists()) count.get() else 0L
      var c = if (cents.exists()) cents.get() else 0L
      var maxMs = Long.MinValue
      rows.foreach { e =>
        n += 1; c += math.round(e.value * 100)
        if (e.ts.getTime > maxMs) maxMs = e.ts.getTime
      }
      count.update(n); cents.update(c)
      touchIdleTimer(timers, maxMs)
      Iterator((user, n, c))
    }
  }

  /** WALL-CLOCK PUNCTUATE (round 13, VERDICT r12 task 4 — the
    * `PunctuationType.WALL_CLOCK_TIME` half of the Processor API's
    * punctuate; the event-time half is the timers in [[IdleEviction]]
    * and the CEP/session processors): per key, a PROCESSING-TIME timer
    * armed `intervalMs` of WALL CLOCK after the key's latest activity
    * emits the key's running count REGARDLESS of whether data arrived
    * since — heartbeat/timeout emission, the shape Kafka Streams users
    * reach for when a downstream needs liveness ("say something N ms
    * after the last thing you saw, data or not"). Each firing is
    * ONE-SHOT and the next activity re-arms: under a steady input the
    * key beats once per quiet gap; a timer that re-armed ITSELF on
    * expiry would make the engine schedule empty micro-batches forever
    * (measured: >1000 epochs/4 min) and no idle point would ever
    * exist for `processAllAvailable`/graceful drains — the activity-
    * re-armed form is the punctuate that composes with micro-batching.
    *
    * Determinism contract (why the tests assert INVARIANTS, not
    * timings): data-driven emissions (`kind = "data"`) are a pure
    * function of the input batches; heartbeat emissions
    * (`kind = "hb"`) fire on the engine's wall clock, so their COUNT
    * varies run to run — but every heartbeat's payload is the key's
    * running count at some batch prefix, and the final data state
    * converges identically under any firing schedule.
    */
  class HeartbeatProcessor(intervalMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (Long, Long, String)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var count: ValueState[Long] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", E.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("hbDeadline", E.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(Long, Long, String)] = {
      var n = if (count.exists()) count.get() else 0L
      rows.foreach(_ => n += 1)
      count.update(n)
      // activity re-arms the one-shot deadline (stale timer deleted)
      val next = timers.getCurrentProcessingTimeInMs() + intervalMs
      if (armed.exists()) getHandle.deleteTimer(armed.get())
      getHandle.registerTimer(next)
      armed.update(next)
      Iterator((user, n, "data"))
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[(Long, Long, String)] = {
      // the punctuate body: emit NOW, data or not; one-shot — the
      // key's next activity re-arms
      val n = if (count.exists()) count.get() else 0L
      armed.clear()
      Iterator((user, n, "hb"))
    }
  }

  /** Per-user running count with a wall-clock heartbeat `intervalMs`
    * after each key's latest activity ([[HeartbeatProcessor]]):
    * `TimeMode.ProcessingTime`, update mode. Output
    * (user, runningCount, "data" | "hb").
    */
  def heartbeatTws(events: Dataset[Evt], intervalMs: Long): Dataset[(Long, Long, String)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new HeartbeatProcessor(intervalMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Running (count, cents) per user via `transformWithState`. With
    * `idleRetentionMs > 0`, a user idle past the horizon restarts the
    * running totals from zero (bounded staleness; the input must carry
    * a watermark — applied here on `ts`).
    */
  def runningTotalsTws(events: Dataset[Evt], idleRetentionMs: Long = 0L,
                       watermark: String = "0 seconds"): Dataset[(Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    if (idleRetentionMs <= 0)
      events.groupByKey(_.user_id)
        .transformWithState(new RunningTotalsProcessor, TimeMode.None(), OutputMode.Update())
    else
      events.withWatermark("ts", watermark).groupByKey(_.user_id)
        .transformWithState(new RunningTotalsProcessor(idleRetentionMs),
          TimeMode.EventTime(), OutputMode.Update())
  }

  /** Streaming twin of the batch `events_transition_counts` query: a
    * per-user `transformWithState` processor keeping the LAST event
    * ((ts, event_id, type)) as named state and emitting one
    * (prev_type, cur_type) pair per consecutive event — the Markov
    * transition stream. Within a batch, rows sort by (ts, event_id)
    * before pairing (the per-key buffer is batch-sized, same hot-key
    * bound as the as-of cogroup); across batches the stored last event
    * stitches the sequence, so on an in-order replay the aggregated
    * pair counts equal the batch operator exactly (StreamingSpec).
    */
  class TransitionProcessor(override protected val retentionMs: Long = 0L)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (String, String)]
      with IdleEviction[Long, Evt, (String, String)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var last: ValueState[(Long, Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      last = getHandle.getValueState[(Long, Long, String)]("last",
        E.tuple(E.scalaLong, E.scalaLong, E.STRING), TTLConfig.NONE)
      initIdleEviction()
    }

    override protected def clearKeyState(): Unit = last.clear()

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(String, String)] = {
      val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val out = Array.newBuilder[(String, String)]
      var prev: Option[String] = if (last.exists()) Some(last.get()._3) else None
      sorted.foreach { e =>
        prev.foreach(p => out += ((p, e.event_type)))
        prev = Some(e.event_type)
      }
      val lastEv = sorted.last
      last.update((lastEv.ts.getTime, lastEv.event_id, lastEv.event_type))
      touchIdleTimer(timers, lastEv.ts.getTime)
      out.result().iterator
    }
  }

  /** Transition pairs per user via `transformWithState`. With
    * `idleRetentionMs > 0`, the first event after an idle horizon
    * starts a fresh sequence (no pair against the pre-idle last event).
    */
  def transitionsTws(events: Dataset[Evt], idleRetentionMs: Long = 0L,
                     watermark: String = "0 seconds"): Dataset[(String, String)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    if (idleRetentionMs <= 0)
      events.groupByKey(_.user_id)
        .transformWithState(new TransitionProcessor, TimeMode.None(), OutputMode.Append())
    else
      events.withWatermark("ts", watermark).groupByKey(_.user_id)
        .transformWithState(new TransitionProcessor(idleRetentionMs),
          TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stateful last-touch attribution — the true-streaming twin of the
    * batch `events_attribution` query: one ValueState per user carries
    * the most recent non-purchase event type; each purchase emits
    * (attributedType, cents) against the state AS OF its position in
    * the per-user (ts, event_id) order. Rows inside a micro-batch are
    * sorted per user before applying (the in-order-replay contract the
    * parity test drives); state stitches sequences across batches.
    */
  class AttributionProcessor(override protected val retentionMs: Long = 0L)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (String, Long)]
      with IdleEviction[Long, Evt, (String, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var lastTouch: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastTouch = getHandle.getValueState[String]("lastTouch", E.STRING, TTLConfig.NONE)
      initIdleEviction()
    }

    override protected def clearKeyState(): Unit = lastTouch.clear()

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(String, Long)] = {
      val out = Seq.newBuilder[(String, Long)]
      var maxMs = Long.MinValue
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        if (e.ts.getTime > maxMs) maxMs = e.ts.getTime
        if (e.event_type == "purchase")
          out += ((if (lastTouch.exists()) lastTouch.get() else "none",
                   math.round(e.value * 100)))
        else lastTouch.update(e.event_type)
      }
      touchIdleTimer(timers, maxMs)
      out.result().iterator
    }
  }

  /** Per-purchase attribution stream: (attributed_type, cents) rows in
    * append mode — aggregate downstream for the census the batch
    * operator emits. Requires the RocksDB state store provider. With
    * `idleRetentionMs > 0`, a purchase after the idle horizon
    * attributes to "none" (the pre-idle touch is forgotten).
    */
  def attributionStream(events: Dataset[Evt], idleRetentionMs: Long = 0L,
                        watermark: String = "0 seconds"): Dataset[(String, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    if (idleRetentionMs <= 0)
      events.groupByKey(_.user_id)
        .transformWithState(new AttributionProcessor, TimeMode.None(), OutputMode.Append())
    else
      events.withWatermark("ts", watermark).groupByKey(_.user_id)
        .transformWithState(new AttributionProcessor(idleRetentionMs),
          TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming LAST-PRIOR AS-OF enrichment — the transformWithState
    * twin of the as-of family (band join / cogroup / AsOfMergeExec):
    * per user, ValueState holds the latest (ts, id)-max signup seen;
    * each purchase emits (purchase_id, last_signup_id). State is O(1)
    * per key — the streaming analogue of the merge exec's one buffered
    * row. CAVEAT (documented, inherent to true streaming): rows are
    * processed in per-batch event order, so a signup arriving in a
    * LATER batch than a purchase it precedes in event time cannot
    * retro-enrich it — exactly Kafka Streams' stream-table join
    * semantics. StreamingSpec proves parity with the batch as-of on
    * the in-order replay.
    */
  class AsofEnrichProcessor(override protected val retentionMs: Long = 0L)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (Long, Long)]
      with IdleEviction[Long, Evt, (Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var lastSignup: ValueState[(Long, Long)] = _ // (tsMicros, id)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastSignup = getHandle.getValueState[(Long, Long)]("lastSignup",
        E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
      initIdleEviction()
    }

    override protected def clearKeyState(): Unit = lastSignup.clear()

    // full micros, not getTime's millis: the batch as-of orders by
    // unix_micros and sub-millisecond ties must break identically
    private def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(Long, Long)] = {
      val out = Seq.newBuilder[(Long, Long)]
      var maxMs = Long.MinValue
      rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        if (e.ts.getTime > maxMs) maxMs = e.ts.getTime
        if (e.event_type == "signup") {
          val cand = (micros(e.ts), e.event_id)
          if (!lastSignup.exists() ||
              Ordering[(Long, Long)].gt(cand, lastSignup.get()))
            lastSignup.update(cand)
        } else if (e.event_type == "purchase" && lastSignup.exists()) {
          out += ((e.event_id, lastSignup.get()._2))
        }
      }
      touchIdleTimer(timers, maxMs)
      out.result().iterator
    }
  }

  /** Purchases enriched with the user's latest prior signup id, as a
    * stream. Requires the RocksDB state store provider. With
    * `idleRetentionMs > 0`, a user's signup state is dropped once the
    * watermark passes their last event + horizon: a purchase arriving
    * after that goes unenriched (bounded staleness — exactly a
    * retention-configured KTable forgetting a cold key).
    */
  def asofEnrichStream(events: Dataset[Evt], idleRetentionMs: Long = 0L,
                       watermark: String = "0 seconds"): Dataset[(Long, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    if (idleRetentionMs <= 0)
      events.groupByKey(_.user_id)
        .transformWithState(new AsofEnrichProcessor, TimeMode.None(), OutputMode.Append())
    else
      events.withWatermark("ts", watermark).groupByKey(_.user_id)
        .transformWithState(new AsofEnrichProcessor(idleRetentionMs),
          TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming KMV distinct-count sketch — the live distinct-value
    * estimate per key maintained as BOUNDED state: the k smallest
    * distinct hashes (the same engine-portable two-LCG-round hash as
    * the batch `agg_kmv_distinct`), merged with each batch exactly the
    * way the batch ALL-row merges per-group sketches (min-k of the
    * union). State is O(k) per key no matter how many events arrive;
    * the emitted estimate is monotone non-decreasing (the k-th
    * smallest hash only falls), so the latest emission per key IS the
    * current census.
    */
  class KmvDistinctProcessor(k: Int, override protected val retentionMs: Long = 0L)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), (String, Long, Long)]
      with IdleEviction[String, (String, Long), (String, Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TTLConfig, TimeMode, TimerValues}

    @transient private var hs: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      hs = getHandle.getListState[Long]("hs", E.scalaLong, TTLConfig.NONE)
      initIdleEviction()
    }

    override protected def clearKeyState(): Unit = hs.clear()

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
                                 timers: TimerValues): Iterator[(String, Long, Long)] = {
      val fresh = rows.map(r => StreamOps.kmvHash(r._2)).toArray
      // the tuple input carries no event time — the idle deadline rides
      // the watermark of the upstream `withWatermark` alone
      touchIdleTimer(timers, Long.MinValue)
      val merged = (hs.get().toArray ++ fresh).distinct.sorted.take(k)
      hs.clear()
      merged.foreach(hs.appendValue)
      val est =
        if (merged.length < k) merged.length.toLong
        else (k - 1).toLong * 2147483648L / merged.last
      Iterator((key, merged.length.toLong, est))
    }
  }

  /** The `agg_kmv_distinct` hash: two LCG rounds mod 2³¹. The input
    * reduction floors like SQL `pmod` (scala % is sign-preserving, so
    * a negative key would otherwise produce a negative hash and a
    * divergent sketch); identical to the batch hash for any input.
    */
  def kmvHash(v: Long): Long = {
    val m = 2147483648L
    val vm = ((v % m) + m) % m
    val h1 = (vm * 2654435761L + 1013904223L) % m
    (h1 * 1597334677L + 12345L) % m
  }

  /** (key, value) stream → (key, sketchSize, estimate) per micro-batch.
    * With `idleRetentionMs > 0`, the caller must have applied
    * `withWatermark` UPSTREAM (before projecting to the pair shape —
    * the watermark plan node survives the projection); a key idle past
    * the horizon drops its sketch and re-estimates from empty on
    * return.
    */
  def kmvDistinctStream(pairs: Dataset[(String, Long)], k: Int = 64,
                        idleRetentionMs: Long = 0L): Dataset[(String, Long, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import pairs.sparkSession.implicits._
    if (idleRetentionMs <= 0)
      pairs.groupByKey(_._1)
        .transformWithState(new KmvDistinctProcessor(k), TimeMode.None(), OutputMode.Append())
    else
      pairs.groupByKey(_._1)
        .transformWithState(new KmvDistinctProcessor(k, idleRetentionMs),
          TimeMode.EventTime(), OutputMode.Append())
  }

  /** The QUANTILE sketch as bounded streaming state — the
    * `agg_bottomk_quantiles` twin, as [[KmvDistinctProcessor]] is to
    * `agg_kmv_distinct`: ListState holds the k lexicographically
    * smallest (kmvHash(rowId), value) pairs per key (a MULTISET, like
    * the batch `bottom_k` — no distinct), each batch merges
    * state ++ fresh and re-truncates (the same min-k union the batch
    * map-side partials perform), and quantiles read off the sorted
    * sample exactly as the batch query indexes its array
    * (`min(m, m·q div 100 + 1)`, 1-based). O(k) state per key;
    * StreamingSpec proves batch parity on the real event log across a
    * micro-batch boundary.
    */
  class BottomkQuantilesProcessor(k: Int, override protected val retentionMs: Long = 0L)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Long), (String, Long, Long, Long)]
      with IdleEviction[String, (String, Long, Long), (String, Long, Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TTLConfig, TimeMode, TimerValues}

    @transient private var sk: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sk = getHandle.getListState[(Long, Long)]("sk",
        E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
      initIdleEviction()
    }

    override protected def clearKeyState(): Unit = sk.clear()

    override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
                                 timers: TimerValues): Iterator[(String, Long, Long, Long)] = {
      val fresh = rows.map(r => (StreamOps.kmvHash(r._2), r._3)).toArray
      touchIdleTimer(timers, Long.MinValue) // no event time in the tuple input
      val merged = (sk.get().toArray ++ fresh).sorted.take(k)
      sk.clear()
      merged.foreach(sk.appendValue)
      val vs = merged.map(_._2).sorted
      val m = vs.length
      def q(p: Int): Long = vs(math.min(m - 1, m * p / 100))
      Iterator((key, m.toLong, q(50), q(90)))
    }
  }

  /** (key, rowId, value) stream → (key, sampleSize, p50, p90) per
    * micro-batch; estimates converge as the sample fills.
    */
  def bottomkQuantilesStream(rows: Dataset[(String, Long, Long)], k: Int = 256,
                             idleRetentionMs: Long = 0L): Dataset[(String, Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import rows.sparkSession.implicits._
    if (idleRetentionMs <= 0)
      rows.groupByKey(_._1)
        .transformWithState(new BottomkQuantilesProcessor(k), TimeMode.None(), OutputMode.Append())
    else // watermark applied upstream, as in [[kmvDistinctStream]]
      rows.groupByKey(_._1)
        .transformWithState(new BottomkQuantilesProcessor(k, idleRetentionMs),
          TimeMode.EventTime(), OutputMode.Append())
  }

  /** EVENT-TIME TIMERS — the Processor-API `punctuate` analogue, and
    * the true-streaming twin of the batch `stream_gap_detect` query:
    * every input row re-arms a per-user timer at lastSeen + gap; when
    * the watermark passes an armed instant with no newer event having
    * arrived, the runtime invokes [[handleExpiredTimer]] and the
    * processor emits (user, lastSeenMillis). The output row is
    * produced by TIME PASSING, not by any input record — the one
    * topology shape only a timer surface can express (Kafka Streams:
    * `ProcessorContext.schedule` + `Punctuator`).
    */
  class GapTimeoutProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("lastSeen", E.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(Long, Long)] = {
      val maxTs = rows.map(_.ts.getTime).max
      val prev = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      if (maxTs > prev) {
        // re-arm: one live timer per user
        if (prev != Long.MinValue) getHandle.deleteTimer(prev + gapMs)
        lastSeen.update(maxTs)
        getHandle.registerTimer(maxTs + gapMs)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[(Long, Long)] =
      Iterator((user, lastSeen.get()))
  }

  /** Per-user inactivity timeouts via event-time timers: emits
    * (user_id, last_seen_millis) once the watermark passes
    * lastSeen + gapMs. Requires the RocksDB state store provider.
    */
  def gapTimeouts(events: Dataset[Evt], gapMs: Long,
                  watermark: String = "1 minute"): Dataset[(Long, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new GapTimeoutProcessor(gapMs),
                          TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming twin of the batch `ts_resample_ffill` operator, driven
    * entirely by EVENT-TIME TIMERS: per user, one output row per hour
    * boundary carrying the forward-filled value as of that boundary —
    * rows produced by time passing, not by input records (the
    * Punctuator-emits-grid shape). Events buffer in a ListState until
    * the boundary timer fires; the timer folds events ≤ boundary into
    * the carried value, emits (user, boundaryMs, cents), prunes the
    * buffer and re-arms for the next hour. Late events (behind the
    * watermark) are dropped by the engine before they reach the
    * buffer, so the carried value at a fired boundary is final.
    * The grid re-arms unconditionally; a production job adds an idle
    * cutoff (stop re-arming N hours past lastSeen, the
    * [[GapTimeoutProcessor]] condition).
    */
  class ResampleFfillProcessor(hourMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (Long, Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var pending: ListState[(Long, Long)] = _ // (tsMs, cents)
    @transient private var carried: ValueState[Long] = _
    @transient private var nextGrid: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[(Long, Long)]("pending",
        E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
      carried = getHandle.getValueState[Long]("carried", E.scalaLong, TTLConfig.NONE)
      nextGrid = getHandle.getValueState[Long]("nextGrid", E.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(Long, Long, Long)] = {
      var minTs = Long.MaxValue
      rows.foreach { e =>
        val t = e.ts.getTime
        pending.appendValue((t, math.round(e.value * 100)))
        if (t < minTs) minTs = t
      }
      if (!nextGrid.exists() && minTs != Long.MaxValue) {
        val g = (minTs / hourMs + 1) * hourMs // first boundary after first event
        nextGrid.update(g)
        getHandle.registerTimer(g)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
      val g = expired.getExpiryTimeInMs
      val (upto, after) = pending.get().toArray.partition(_._1 <= g)
      if (upto.nonEmpty) carried.update(upto.maxBy(_._1)._2)
      pending.clear()
      after.foreach(pending.appendValue)
      nextGrid.update(g + hourMs)
      getHandle.registerTimer(g + hourMs)
      Iterator((user, g, carried.get()))
    }
  }

  /** Hourly forward-filled grid per user, emitted by event-time timers
    * as the watermark crosses each boundary. Requires the RocksDB
    * state store provider.
    */
  def resampleFfillStream(events: Dataset[Evt],
                          watermark: String = "1 minute"): Dataset[(Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new ResampleFfillProcessor(3600 * 1000L),
                          TimeMode.EventTime(), OutputMode.Append())
  }

  /** INCREMENTAL SESSION MERGE — the streaming twin of the batch
    * `agg_session_window_native` operator, as an explicit stateful
    * processor (the one §2.5 symmetry hole the built-in
    * `session_window` groupBy ([[session30m]]) doesn't close: that
    * form emits per-session COUNTS; this one owns the session list, so
    * the merge across micro-batches is observable and the emitted
    * rows carry the exact half-open [start, last + gap) boundaries the
    * batch operator produces).
    *
    * State per user: the OPEN sessions as (startMs, lastMs, count),
    * plus the armed close-timer instant. Each batch's events merge
    * into the list under batch semantics (an event at exactly
    * last + gap starts a NEW session); one event-time timer per user
    * is armed at the earliest open-session close time, and when the
    * watermark crosses it the processor emits every session whose
    * close time the watermark passed — final, append-mode, state
    * bounded by open sessions only.
    */
  class SessionMergeProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (Long, Long, Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var open: ListState[(Long, Long, Long)] = _ // (startMs, lastMs, n)
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getListState[(Long, Long, Long)]("open",
        E.tuple(E.scalaLong, E.scalaLong, E.scalaLong), TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", E.scalaLong, TTLConfig.NONE)
    }

    /** Merge-coalesce: existing open sessions + the batch's events (as
      * unit sessions), sorted by start, folded with the half-open
      * overlap rule `next.start < cur.last + gap`.
      */
    private def merged(incoming: Seq[Long]): Seq[(Long, Long, Long)] = {
      val all = (open.get().toSeq ++ incoming.map(t => (t, t, 1L))).sortBy(s => (s._1, s._2))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      all.foreach { s =>
        if (out.nonEmpty && s._1 < out.last._2 + gapMs) {
          val c = out.remove(out.length - 1)
          out += ((c._1, math.max(c._2, s._2), c._3 + s._3))
        } else out += s
      }
      out.toSeq
    }

    private def rearm(sessions: Seq[(Long, Long, Long)]): Unit = {
      val next = if (sessions.isEmpty) Long.MinValue
                 else sessions.map(_._2 + gapMs).min
      val prev = if (armed.exists()) armed.get() else Long.MinValue
      if (next != prev) {
        if (prev != Long.MinValue) getHandle.deleteTimer(prev)
        if (next != Long.MinValue) { getHandle.registerTimer(next); armed.update(next) }
        else armed.clear()
      }
    }

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val sessions = merged(rows.map(_.ts.getTime).toSeq)
      open.clear()
      sessions.foreach(open.appendValue)
      rearm(sessions)
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
      val wm = timers.getCurrentWatermarkInMs()
      val (closed, stillOpen) = open.get().toSeq.partition(_._2 + gapMs <= wm)
      open.clear()
      stillOpen.foreach(open.appendValue)
      armed.clear() // the fired timer was the armed one
      rearm(stillOpen)
      closed.sortBy(_._1).iterator
        .map { case (start, last, n) => (user, start, last + gapMs, n) }
    }
  }

  /** STREAMING CEP — the true-streaming twin of the batch
    * `events_pattern_match` census: per (user, day) the ordered
    * event-type path is buffered in list state and, when the
    * watermark passes the day boundary, matched against the declared
    * regex patterns; one (user, day, pattern) row emits per match —
    * FINAL (the day can no longer change), produced by time passing.
    * Out-of-order arrivals WITHIN the day are absorbed by the sort at
    * emission; state is bounded by one open day per active user-day
    * key and cleared on fire.
    */
  class PatternCensusProcessor(patterns: Seq[(String, String)])
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Long, Long), Evt, (Long, String, String)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var buf: ListState[(Long, Long, String)] = _ // (tsMs, id, type)
    @transient private var armed: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[(Long, Long, String)]("buf",
        E.tuple(E.scalaLong, E.scalaLong, E.STRING), TTLConfig.NONE)
      armed = getHandle.getValueState[Boolean]("armed", E.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: (Long, Long), rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(Long, String, String)] = {
      rows.foreach(e => buf.appendValue((e.ts.getTime, e.event_id, e.event_type)))
      if (!armed.exists()) {
        // fire when the watermark passes the END of this key's day
        getHandle.registerTimer((key._2 + 1) * 86400000L)
        armed.update(true)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: (Long, Long), timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[(Long, String, String)] = {
      val path = buf.get().toSeq.sortBy(e => (e._1, e._2)).map(_._3).mkString(">")
      buf.clear(); armed.clear()
      val day = java.time.LocalDate.ofEpochDay(key._2).toString
      patterns.iterator.collect {
        case (name, re) if java.util.regex.Pattern.compile(re).matcher(path).find() =>
          (key._1, day, name)
      }
    }
  }

  /** The declared pattern set of the batch census. `browse_only` is
    * anchored (whole-path), the other two are contains-matches —
    * `Pattern.find` with the same regexes Spark's `rlike` uses.
    */
  val censusPatterns: Seq[(String, String)] = Seq(
    ("direct_buy", "signup(>click)*>purchase"),
    ("error_retry", "error>.*error"),
    ("browse_only", "^(view|click)(>(view|click))*$"))

  /** One final (user_id, day, pattern) row per matched pattern per
    * closed user-day — the CEP emission stream; aggregate it and you
    * reproduce the batch `events_pattern_match` census. Requires the
    * RocksDB state store provider.
    */
  def patternCensusStream(events: Dataset[Evt],
                          watermark: String = "1 minute"): Dataset[(Long, String, String)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, Math.floorDiv(e.ts.getTime, 86400000L)))
      .transformWithState(new PatternCensusProcessor(censusPatterns),
                          TimeMode.EventTime(), OutputMode.Append())
  }

  /** Final closed sessions per user as (user_id, startMs, endMs, n_ev)
    * with the batch operator's exact half-open boundaries — roll up
    * per user and it reproduces `agg_session_window_native`
    * (StreamingSpec proves parity across a batch boundary that
    * straddles a session merge). Requires the RocksDB state store
    * provider.
    */
  def sessionStatsStream(events: Dataset[Evt], gapMs: Long = 30 * 60 * 1000L,
                         watermark: String = "1 minute"): Dataset[(Long, Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionMergeProcessor(gapMs),
                          TimeMode.EventTime(), OutputMode.Append())
  }

  /** STREAMING THREE-LEG CHAIN RECONCILIATION (round 10) — the
    * true-streaming twin of the batch `recon_chain_followup` shape
    * (VERDICT r9 task 5): per user, each signup awaits its FIRST
    * purchase within `windowMs`, each matched purchase awaits the
    * FIRST error within `windowMs` after it, and every chain emits
    * exactly one FINAL outcome row:
    *
    *   ("full_chain", s_id, latency_s)  — error arrived (on arrival);
    *   ("purchase_no_error", s_id, 0)   — second window closed empty;
    *   ("no_purchase", s_id, 0)         — first window closed empty.
    *
    * The two no-match outcomes are produced by TIME PASSING (event-time
    * timers — the punctuator topology), not by any input row. State is
    * two ListStates bounded by OPEN chains; a resolved chain leaves
    * state immediately. One purchase can open several chains (it is
    * the first purchase of every signup whose window covers it) and a
    * later purchase never rematches a resolved signup — processing in
    * (ts, id) order reproduces the batch min-struct argmin, ties
    * included. Rows behind the watermark are dropped by the engine
    * (the same caveat as every streaming as-of here); the census
    * rolls up downstream (group by status), matching the batch query.
    *
    * ORDERING CONTRACT (ADVICE r10): matching is EAGER — events sort
    * (ts, id) only within a micro-batch, so the processor additionally
    * assumes cross-batch arrival respects event-time order per user. An
    * error arriving one batch BEFORE its in-window purchase (disorder
    * inside the watermark) resolves as purchase_no_error where the
    * batch twin says full_chain. Eagerness is what buys on-arrival
    * emission for the hot path; when in-watermark disorder must be
    * absorbed instead, use the watermark-finalized buffering shape of
    * [[AsofNextProcessor]] (every outcome emitted on watermark
    * passage, both sides buffered one horizon).
    */
  class ChainFollowupProcessor(windowMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (String, Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TTLConfig, TimeMode, TimerValues}

    @transient private var openSignups: ListState[(Long, Long)] = _ // (sId, sTsMicros)
    @transient private var openChains: ListState[(Long, Long, Long, Long)] = _ // (sId, sTs, pId, pTs) micros

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      openSignups = getHandle.getListState[(Long, Long)]("openSignups",
        E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
      openChains = getHandle.getListState[(Long, Long, Long, Long)]("openChains",
        E.tuple(E.scalaLong, E.scalaLong, E.scalaLong, E.scalaLong), TTLConfig.NONE)
    }

    private def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    private val windowMicros = windowMs * 1000L
    // fire strictly AFTER the deadline: an event AT the deadline is a
    // valid match and must be processable before the chain finalizes
    private def deadlineMs(tsMicros: Long): Long =
      math.floorDiv(tsMicros, 1000L) + windowMs + 1L

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(String, Long, Long)] = {
      val out = Seq.newBuilder[(String, Long, Long)]
      rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val m = micros(e.ts)
        e.event_type match {
          case "signup" =>
            openSignups.appendValue((e.event_id, m))
            getHandle.registerTimer(deadlineMs(m))
          case "purchase" =>
            val (matched, waiting) = openSignups.get().toSeq
              .partition { case (_, sTs) => m > sTs && m <= sTs + windowMicros }
            if (matched.nonEmpty) {
              openSignups.clear()
              waiting.foreach(openSignups.appendValue)
              matched.foreach { case (sId, sTs) =>
                openChains.appendValue((sId, sTs, e.event_id, m))
              }
              getHandle.registerTimer(deadlineMs(m))
            }
          case "error" =>
            val (matched, waiting) = openChains.get().toSeq
              .partition { case (_, _, _, pTs) => m > pTs && m <= pTs + windowMicros }
            if (matched.nonEmpty) {
              openChains.clear()
              waiting.foreach(openChains.appendValue)
              matched.foreach { case (sId, sTs, _, _) =>
                out += (("full_chain", sId,
                  math.floorDiv(m, 1000000L) - math.floorDiv(sTs, 1000000L)))
              }
            }
          case _ => ()
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[(String, Long, Long)] = {
      // sweep BOTH lists against the watermark: several deadlines may
      // share one fired timer, and a stale timer (its chain resolved
      // early) finds nothing expired and emits nothing
      val wm = timers.getCurrentWatermarkInMs()
      def due(tsMicros: Long): Boolean = deadlineMs(tsMicros) <= wm
      val out = Seq.newBuilder[(String, Long, Long)]
      val (deadS, liveS) = openSignups.get().toSeq.partition(s => due(s._2))
      if (deadS.nonEmpty) {
        openSignups.clear(); liveS.foreach(openSignups.appendValue)
        deadS.sortBy(s => (s._2, s._1))
          .foreach { case (sId, _) => out += (("no_purchase", sId, 0L)) }
      }
      val (deadC, liveC) = openChains.get().toSeq.partition(c => due(c._4))
      if (deadC.nonEmpty) {
        openChains.clear(); liveC.foreach(openChains.appendValue)
        deadC.sortBy(c => (c._4, c._1))
          .foreach { case (sId, _, _, _) => out += (("purchase_no_error", sId, 0L)) }
      }
      out.result().iterator
    }
  }

  /** Per-chain final outcomes (status, signup_id, latency_s) for the
    * signup→purchase→error chain; group by status downstream to
    * reproduce the batch `recon_chain_followup` census. Requires the
    * RocksDB state store provider.
    */
  def chainFollowupStream(events: Dataset[Evt],
                          windowMs: Long = 24 * 3600 * 1000L,
                          watermark: String = "1 minute"): Dataset[(String, Long, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new ChainFollowupProcessor(windowMs),
                          TimeMode.EventTime(), OutputMode.Append())
  }

  /** COMPOSED wall-clock + event-time reconciliation (round 14,
    * VERDICT r13 #7): ONE processor on the signup→purchase→error chain
    * that finalizes outcomes by EVENT TIME while emitting
    * unmatched-leg HEARTBEATS on PROCESSING-TIME timers — the
    * Kafka-Streams punctuate pairing (WALL_CLOCK_TIME punctuator
    * reporting stuck legs + STREAM_TIME-driven finalization) in one
    * `transformWithState`.
    *
    * HOW BOTH TIMER FLAVORS COEXIST: `TimeMode` is single-valued, so
    * the registered timers are all wall-clock — and event-time
    * semantics never needed the timer, only the WATERMARK: the
    * processor sweeps its open legs against
    * `timers.getCurrentWatermarkInMs()` on EVERY callback (each input
    * batch and each heartbeat firing), finalizing exactly the legs the
    * event-time twin's timers would have. Outcomes are therefore a
    * pure function of the batch sequence (the schedule-independent
    * invariant StreamingSpec pins: multiset-equal to
    * [[ChainFollowupProcessor]]); only heartbeat COUNT rides the wall
    * clock.
    *
    * HEARTBEAT LIVENESS: activity re-arms a one-shot deadline (the
    * composable form, per [[HeartbeatProcessor]]); a FIRING that still
    * sees open legs re-arms itself — bounded self-re-arming: it stops
    * the moment the key's legs resolve, which the very watermark sweep
    * it performs guarantees once the watermark passes their deadlines.
    * A key with open legs therefore beats every `hbIntervalMs` until
    * resolution and then goes silent (no empty-batch poll loop at
    * steady state).
    *
    * Output (kind, status, id, v): kind = "final" rows are the chain
    * outcomes (status ∈ full_chain / purchase_no_error / no_purchase,
    * v = latency seconds) — byte-equal to the event-time twin; kind =
    * "hb" rows name a leg still waiting (status ∈ open_signup /
    * open_chain, id = signup id, v = the wall-clock firing's batch
    * watermark ms — monotone per key).
    */
  class ReconPunctuateProcessor(windowMs: Long, hbIntervalMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (String, String, Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var openSignups: ListState[(Long, Long)] = _
    @transient private var openChains: ListState[(Long, Long, Long, Long)] = _
    @transient private var hbArmed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      openSignups = getHandle.getListState[(Long, Long)]("openSignups",
        E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
      openChains = getHandle.getListState[(Long, Long, Long, Long)]("openChains",
        E.tuple(E.scalaLong, E.scalaLong, E.scalaLong, E.scalaLong), TTLConfig.NONE)
      hbArmed = getHandle.getValueState[Long]("hbDeadline", E.scalaLong, TTLConfig.NONE)
    }

    private def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    private val windowMicros = windowMs * 1000L
    private def deadlineMs(tsMicros: Long): Long =
      math.floorDiv(tsMicros, 1000L) + windowMs + 1L

    /** The event-time半 of the composition: finalize every leg whose
      * deadline the watermark has passed — exactly what the twin's
      * event-time timers do, just driven from every callback.
      */
    private def sweep(wm: Long,
                      out: scala.collection.mutable.Builder[(String, String, Long, Long), Seq[(String, String, Long, Long)]]): Unit = {
      def due(tsMicros: Long): Boolean = deadlineMs(tsMicros) <= wm
      val (deadS, liveS) = openSignups.get().toSeq.partition(s => due(s._2))
      if (deadS.nonEmpty) {
        openSignups.clear(); liveS.foreach(openSignups.appendValue)
        deadS.sortBy(s => (s._2, s._1))
          .foreach { case (sId, _) => out += (("final", "no_purchase", sId, 0L)) }
      }
      val (deadC, liveC) = openChains.get().toSeq.partition(c => due(c._4))
      if (deadC.nonEmpty) {
        openChains.clear(); liveC.foreach(openChains.appendValue)
        deadC.sortBy(c => (c._4, c._1))
          .foreach { case (sId, _, _, _) =>
            out += (("final", "purchase_no_error", sId, 0L)) }
      }
    }

    private def reArm(timers: TimerValues): Unit = {
      val next = timers.getCurrentProcessingTimeInMs() + hbIntervalMs
      if (hbArmed.exists()) getHandle.deleteTimer(hbArmed.get())
      getHandle.registerTimer(next)
      hbArmed.update(next)
    }

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(String, String, Long, Long)] = {
      val out = Seq.newBuilder[(String, String, Long, Long)]
      sweep(timers.getCurrentWatermarkInMs(), out)
      rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val m = micros(e.ts)
        e.event_type match {
          case "signup" =>
            openSignups.appendValue((e.event_id, m))
          case "purchase" =>
            val (matched, waiting) = openSignups.get().toSeq
              .partition { case (_, sTs) => m > sTs && m <= sTs + windowMicros }
            if (matched.nonEmpty) {
              openSignups.clear()
              waiting.foreach(openSignups.appendValue)
              matched.foreach { case (sId, sTs) =>
                openChains.appendValue((sId, sTs, e.event_id, m))
              }
            }
          case "error" =>
            val (matched, waiting) = openChains.get().toSeq
              .partition { case (_, _, _, pTs) => m > pTs && m <= pTs + windowMicros }
            if (matched.nonEmpty) {
              openChains.clear()
              waiting.foreach(openChains.appendValue)
              matched.foreach { case (sId, sTs, _, _) =>
                out += (("final", "full_chain", sId,
                  math.floorDiv(m, 1000000L) - math.floorDiv(sTs, 1000000L)))
              }
            }
          case _ => ()
        }
      }
      // activity re-arms the wall-clock punctuate (one-shot)
      reArm(timers)
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[(String, String, Long, Long)] = {
      val out = Seq.newBuilder[(String, String, Long, Long)]
      val wm = timers.getCurrentWatermarkInMs()
      sweep(wm, out)
      hbArmed.clear()
      val sOpen = openSignups.get().toSeq
      val cOpen = openChains.get().toSeq
      sOpen.sortBy(s => (s._2, s._1)).foreach { case (sId, _) =>
        out += (("hb", "open_signup", sId, wm)) }
      cOpen.sortBy(c => (c._4, c._1)).foreach { case (sId, _, _, _) =>
        out += (("hb", "open_chain", sId, wm)) }
      // beat again while anything is still waiting; silent once clear
      if (sOpen.nonEmpty || cOpen.nonEmpty) reArm(timers)
      out.result().iterator
    }
  }

  /** The composed chain-reconciliation stream: final outcomes by event
    * time, unmatched-leg heartbeats by wall clock —
    * [[ReconPunctuateProcessor]]. Requires the RocksDB state store
    * provider.
    */
  def reconPunctuateStream(events: Dataset[Evt],
                           windowMs: Long = 24 * 3600 * 1000L,
                           hbIntervalMs: Long = 150L,
                           watermark: String = "1 minute"): Dataset[(String, String, Long, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new ReconPunctuateProcessor(windowMs, hbIntervalMs),
                          TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Streaming FORWARD (first-after) as-of — the true-streaming twin
    * of the batch `join_asof_merge_next_outer` family (AsOfMergeExec's
    * FORWARD mode), bounded by a horizon: for each purchase, the first
    * error of the same user with `p_ts < e_ts <= p_ts + horizon`, or a
    * null-match row when the horizon closes empty. The unbounded batch
    * form has no streaming face (a purchase could wait forever); the
    * horizon is what makes the wait finite — the same bound the chain
    * reconciliation uses for its second hop.
    *
    * Unlike the eager-matching processors ([[ChainFollowupProcessor]],
    * [[AsofEnrichProcessor]]), every outcome here is finalized by the
    * WATERMARK, never by arrival: purchases buffer in ListState until
    * the watermark passes their horizon, errors buffer until no
    * live-or-future purchase window can contain them (`e_ts + horizon`
    * behind the watermark — by then any unfinalized purchase satisfies
    * `p_ts >= e_ts`, outside the strictly-after window). So an error
    * arriving a batch BEFORE its in-window purchase — cross-batch
    * event-time disorder inside the watermark, the case the eager
    * processors document away — still matches. State per key is
    * bounded by one horizon of open purchases + one horizon of errors.
    * Output: (purchase_id, next_error_id | -1, matched 1|0).
    */
  class AsofNextProcessor(horizonMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, (Long, Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TTLConfig, TimeMode, TimerValues}

    @transient private var openPurchases: ListState[(Long, Long)] = _ // (pId, pTsMicros)
    @transient private var recentErrors: ListState[(Long, Long)] = _  // (eId, eTsMicros)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      openPurchases = getHandle.getListState[(Long, Long)]("openPurchases",
        E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
      recentErrors = getHandle.getListState[(Long, Long)]("recentErrors",
        E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
    }

    private def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    private val horizonMicros = horizonMs * 1000L
    // fire strictly AFTER the horizon end: an error AT p_ts + horizon
    // is a valid match and must be bufferable before finalization
    private def deadlineMs(tsMicros: Long): Long =
      math.floorDiv(tsMicros, 1000L) + horizonMs + 1L

    override def handleInputRows(user: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[(Long, Long, Long)] = {
      rows.foreach { e =>
        val m = micros(e.ts)
        e.event_type match {
          case "purchase" =>
            openPurchases.appendValue((e.event_id, m))
            getHandle.registerTimer(deadlineMs(m))
          case "error" =>
            recentErrors.appendValue((e.event_id, m))
            // its own purge timer: without one, a key seeing only
            // errors would buffer them forever
            getHandle.registerTimer(deadlineMs(m))
          case _ => ()
        }
      }
      Iterator.empty // outcomes only ever emit on watermark passage
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
      val wm = timers.getCurrentWatermarkInMs()
      val errs = recentErrors.get().toSeq
      val (due, live) = openPurchases.get().toSeq
        .partition(p => deadlineMs(p._2) <= wm)
      val out = due.sortBy(p => (p._2, p._1)).map { case (pId, pTs) =>
        // min (e_ts, e_id) in the window — the batch min-struct argmin
        val win = errs.filter(e => e._2 > pTs && e._2 <= pTs + horizonMicros)
        if (win.isEmpty) (pId, -1L, 0L)
        else { val (eId, _) = win.minBy(e => (e._2, e._1)); (pId, eId, 1L) }
      }
      if (due.nonEmpty) {
        openPurchases.clear(); live.foreach(openPurchases.appendValue)
      }
      // purge errors no unfinalized-or-future purchase window can
      // contain (they ride the same fired timers — no timer of their own)
      val keep = errs.filter(e => deadlineMs(e._2) > wm)
      if (keep.size != errs.size) {
        recentErrors.clear(); keep.foreach(recentErrors.appendValue)
      }
      out.iterator
    }
  }

  /** Horizon-bounded first-after enrichment per user as a stream:
    * (purchase_id, next_error_id | -1, matched). Outcomes emit when
    * the watermark passes the purchase's horizon — deterministic, and
    * disorder-tolerant inside the watermark. Requires the RocksDB
    * state store provider.
    */
  def asofNextStream(events: Dataset[Evt], horizonMs: Long,
                     watermark: String = "1 minute"): Dataset[(Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new AsofNextProcessor(horizonMs),
                          TimeMode.EventTime(), OutputMode.Append())
  }

  /** Interactive queries (Kafka Streams IQ / store.all() analogue):
    * read a streaming operator's STATE STORE as a DataFrame, straight
    * from the query's checkpoint, via Spark's state data source. Works
    * on a live query's checkpoint (last committed batch) or a stopped
    * one — the state is the queryable materialized view of the
    * topology, without routing an RPC to the running job. Columns:
    * `key` / `value` structs (operator-specific) + `partition_id`.
    *
    * At scale this reads the checkpoint's store files directly (HDFS/
    * S3), one task per state partition — the same parallelism the
    * store was written with.
    */
  def readStateStore(spark: org.apache.spark.sql.SparkSession,
                     checkpointDir: String,
                     storeName: String = "default",
                     operatorId: Int = 0,
                     stateVarName: String = null): DataFrame = {
    val r = spark.read.format("statestore")
      .option("storeName", storeName)
      .option("operatorId", operatorId)
    // transformWithState checkpoints hold NAMED state variables — pass
    // the variable to read (e.g. "lastSignup"); aggregation/dedup
    // operators have a single anonymous store and omit it
    (if (stateVarName == null) r else r.option("stateVarName", stateVarName))
      .load(checkpointDir)
  }
}
