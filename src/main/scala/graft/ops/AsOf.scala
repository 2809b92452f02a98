package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** As-of join, scale path. Spark has no native as-of operator; the
  * composed form in [[Relational.joinAsofLastSignup]] (equi+range join
  * → struct-max) is correct but materializes every (purchase, earlier
  * signup) pair first — quadratic in per-key event count. This variant
  * is the per-key linear-after-sort algorithm: co-group both legs by
  * key (one shuffle each), sort the key's events, and sweep purchases
  * with a moving pointer into signups — the classic merge-based as-of,
  * expressed with `KeyValueGroupedDataset.cogroup` (Spark's idiomatic
  * per-key imperative escape hatch; preference ladder (d) of the build
  * contract, justified because no built-in composition avoids the
  * pairwise blowup).
  *
  * Both implementations share one oracle — the driver hash-compares
  * them against the same DuckDB SQL.
  */
object AsOf {

  /** Generic as-of: for each left row, the right row with the greatest
    * `ts <= left.ts` (ties on ts broken by greatest id). Inner
    * semantics: left rows with no qualifying right row are dropped.
    * Rows: (id, key, tsMicros).
    *
    * Hot-key memory bound: both legs of ONE key are buffered as arrays
    * for the sort+sweep, ~24 B/row — a 100k-event key costs ~2.4 MB
    * (OperatorSpec proves this completes and stays exact), a 10M-event
    * key ~240 MB and is where this form stops being safe. Past that,
    * either the composed band-join ([[Relational.joinAsofLastSignup]],
    * no per-key buffering, pairs pruned by the range predicate) or
    * sub-bucketing the key by coarse time window bounds the buffer.
    */
  def asofLastPrior(left: DataFrame, right: DataFrame): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.select(col("id").as[Long], col("key").as[Long], col("ts").as[Long])
    val r = right.select(col("id").as[Long], col("key").as[Long], col("ts").as[Long])
    l.groupByKey(_._2).cogroup(r.groupByKey(_._2)) { (_, ls, rs) =>
      // Per-key: sort both legs once, sweep lefts in ts order while
      // advancing a pointer over rights; the running best is the
      // (ts, id)-max right row at or before the current left ts.
      val lefts = ls.toArray.sortBy(x => (x._3, x._1))
      val rights = rs.toArray.sortBy(x => (x._3, x._1))
      var j = 0
      var best: Option[(Long, Long, Long)] = None
      lefts.iterator.flatMap { case (lid, _, lts) =>
        while (j < rights.length && rights(j)._3 <= lts) {
          // rights are (ts, id)-ascending, so each admitted candidate
          // IS the new (ts, id)-max — matching the oracle's
          // latest-ts-then-greatest-id tiebreak.
          best = Some(rights(j))
          j += 1
        }
        best.map(b => (lid, b._1)).iterator
      }
    }.toDF("purchase_id", "last_signup_id")
  }

  /** The oracle query shape on the events table, via the cogroup path. */
  val joinAsofCogroup: Q = (s, d) => {
    val e = Tables.t(s, d, "events")
    def leg(tpe: String) = e.filter(col("event_type") === tpe)
      .select(col("event_id").as("id"), col("user_id").as("key"),
              unix_micros(col("ts")).as("ts"))
    asofLastPrior(leg("purchase"), leg("signup"))
      .orderBy("purchase_id")
      .limit(1000)
  }

  /** Nearest-neighbour as-of: for each purchase, the signup closest in
    * time within ±24h (EITHER direction) — the sensor-alignment
    * variant of the as-of family (last-prior / cogroup-merge /
    * nearest). Distance is whole seconds (R4: both engines floor epoch
    * seconds identically, so the integer distances — and therefore the
    * ranking — are engine-independent); ties break by earlier signup
    * ts then smaller id, a total order.
    */
  val joinAsofNearest: Q = (s, d) => {
    val e = Tables.t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
              col("ts").as("p_ts"))
    val sg = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
              col("ts").as("s_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_id").orderBy(col("diff_s"), col("s_ts"), col("s_id"))
    p.join(sg, col("p_user") === col("s_user") &&
               col("s_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
               col("s_ts") <= col("p_ts") + expr("INTERVAL 24 HOURS"))
      .withColumn("diff_s",
        abs(unix_timestamp(col("p_ts")) - unix_timestamp(col("s_ts"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_id").as("purchase_id"), col("s_id").as("nearest_signup_id"),
              col("diff_s").cast("long").as("diff_s"))
      .orderBy("purchase_id")
      .limit(2000)
  }

  /** FORWARD as-of: for each purchase, the FIRST subsequent error
    * event of the same user (strictly after; ties impossible at µs
    * grain, id tiebreak anyway) — the "next failure after action"
    * direction [[asofLastPrior]] doesn't cover. min-struct over the
    * future side rides the user-key shuffle; inner semantics.
    */
  val joinAsofNext: Q = (s, d) => {
    val e = Tables.t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
              col("ts").as("p_ts"))
    val er = e.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
              col("ts").as("e_ts"))
    p.join(er, col("p_user") === col("e_user") && col("e_ts") > col("p_ts"))
      .groupBy("p_id")
      .agg(min(struct(col("e_ts"), col("e_id"))).as("nxt"))
      .select(col("p_id").as("purchase_id"),
              col("nxt.e_id").as("next_error_id"),
              unix_micros(col("nxt.e_ts")).as("next_us"))
      .orderBy("purchase_id")
      .limit(2000)
  }

  /** Last-prior as-of via the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsOfMergeJoin]] → AsOfMergeExec, planned by the
    * injected [[graft.plans.AsOfMergeStrategy]]): both sides
    * hash-clustered on the key and sorted (key, ts[, id]) by
    * EnsureRequirements, then one O(1)-state forward sweep per
    * partition — no per-key arrays (cogroup form), no candidate pairs
    * (band-join form). Output: left columns + right columns minus the
    * right key. Keys/timestamps must be BIGINT (ids + epoch-micros).
    */
  def asofMergePlan(left: DataFrame, right: DataFrame,
                    leftKey: String, leftTs: String,
                    rightKey: String, rightTs: String,
                    leftOuter: Boolean = false,
                    forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    // Self-register the planner strategy for sessions built without
    // GraftExtensions (Verify/Bench use the plain Sessions.builder);
    // extraStrategies is session-mutable and this is idempotent.
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfMergeStrategy))
      spark.experimental.extraStrategies =
        graft.plans.AsOfMergeStrategy +: spark.experimental.extraStrategies
    org.apache.spark.sql.graftshim.DatasetShim.ofRows(spark,
      graft.plans.AsOfMergeJoin(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        leftKey, leftTs, rightKey, rightTs, leftOuter, forward))
  }

  /** The oracle shape on the events table through the custom operator
    * — same semantics as [[joinAsofCogroup]]/`join_asof_last_signup`,
    * hash-compared against the same-family DuckDB SQL; OperatorSpec
    * additionally asserts all three as-of forms agree row-for-row.
    */
  val joinAsofMergeExec: Q = (s, d) => {
    val e = Tables.t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("key"),
              unix_micros(col("ts")).as("p_ts"))
    val sg = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_key"),
              unix_micros(col("ts")).as("s_ts"))
    asofMergePlan(p, sg, "key", "p_ts", "s_key", "s_ts")
      .select(col("purchase_id"), col("signup_id").as("last_signup_id"))
      .orderBy("purchase_id")
      .limit(1200)
  }

  /** LEFT-OUTER through the custom exec: every purchase survives,
    * signup-less ones with NULL — the null-extension path of
    * AsOfMergeExec under the driver's hash gate.
    */
  val joinAsofMergeOuter: Q = (s, d) => {
    val e = Tables.t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("key"),
              unix_micros(col("ts")).as("p_ts"))
    val sg = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_key"),
              unix_micros(col("ts")).as("s_ts"))
    asofMergePlan(p, sg, "key", "p_ts", "s_key", "s_ts", leftOuter = true)
      .select(col("purchase_id"), col("signup_id").as("last_signup_id"),
              when(col("signup_id").isNull, 0L).otherwise(1L).as("matched"))
      .orderBy("purchase_id")
      .limit(1500)
  }

  /** FIRST-AFTER through the custom exec's FORWARD mode (round 10):
    * each purchase's next error — same semantics family as
    * [[joinAsofNext]]'s band-join form, but via the descending-sweep
    * AsOfMergeExec (O(1) state, no candidate pairs). The oracle is the
    * `join_asof_next` family SQL; OperatorSpec asserts the two forms
    * agree row-for-row.
    */
  val joinAsofMergeNext: Q = (s, d) => {
    val e = Tables.t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("key"),
              unix_micros(col("ts")).as("p_ts"))
    val er = e.filter(col("event_type") === "error")
      .select(col("user_id").as("e_key"), unix_micros(col("ts")).as("e_ts"),
              col("event_id").as("next_error_id"))
    asofMergePlan(p, er, "key", "p_ts", "e_key", "e_ts", forward = true)
      .select(col("purchase_id"), col("next_error_id"), col("e_ts").as("next_us"))
      .orderBy("purchase_id")
      .limit(2000)
  }

  /** Forward + LEFT-OUTER through the exec: every purchase survives,
    * error-less ones padded NULL — the forward mirror of
    * [[joinAsofMergeOuter]], exercising the descending sweep's
    * null-extension path under the driver's hash gate.
    */
  val joinAsofMergeNextOuter: Q = (s, d) => {
    val e = Tables.t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("key"),
              unix_micros(col("ts")).as("p_ts"))
    val er = e.filter(col("event_type") === "error")
      .select(col("user_id").as("e_key"), unix_micros(col("ts")).as("e_ts"),
              col("event_id").as("next_error_id"))
    asofMergePlan(p, er, "key", "p_ts", "e_key", "e_ts",
        leftOuter = true, forward = true)
      .select(col("purchase_id"), col("next_error_id"),
              when(col("next_error_id").isNull, 0L).otherwise(1L).as("matched"))
      .orderBy("purchase_id")
      .limit(2000)
  }

  val queries: Map[String, Q] = Map(
    "join_asof_next" -> joinAsofNext,
    "join_asof_cogroup" -> joinAsofCogroup,
    "join_asof_nearest" -> joinAsofNearest,
    "join_asof_merge" -> joinAsofMergeExec,
    "join_asof_merge_outer" -> joinAsofMergeOuter,
    "join_asof_merge_next" -> joinAsofMergeNext,
    "join_asof_merge_next_outer" -> joinAsofMergeNextOuter,
  )
}
