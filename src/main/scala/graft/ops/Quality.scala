package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-4 wave 11: the data-quality / profiling layer — the audits a
  * warehouse team runs before trusting a 100 TB ingest: column
  * profiling, referential-integrity orphan counts, duplicate-key
  * detection, and a domain-rule violation battery. Everything emits
  * integers or verbatim strings (SURVEY §2.1-R2/R6: no FP leaves any
  * operator), and every audit is a single linear pass or a semi/anti
  * equi-join — by construction nothing here can nest loops.
  *
  * Scale posture: `profile_table_stats` is ONE scan of the fact table
  * (the multi-count-distinct expands the scan 6-way before the partial
  * aggregate — the exact-answer cost; the sketch alternative is
  * `agg_hll_users`'s mergeable HLL path). The orphan/duplicate audits
  * shuffle on the audited key once; the domain battery is a scan plus
  * one orderkey equi-join for the cross-table rule.
  */
object Quality {

  private def tb(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** Long-format profile of `orders`: row count, per-column distinct
    * counts, min/max of the key/money/date columns — money in cents,
    * dates as DATE strings, everything stringified so one (col_name,
    * metric, value) schema carries all types.
    */
  val profileTableStats: Q = (s, d) => {
    val o = tb(s, d, "orders")
    val agg = o.agg(
      cnt.as("n_rows"),
      countDistinct(col("o_orderkey")).as("d_orderkey"),
      countDistinct(col("o_custkey")).as("d_custkey"),
      countDistinct(col("o_orderstatus")).as("d_orderstatus"),
      countDistinct(col("o_totalprice")).as("d_totalprice"),
      countDistinct(to_date(col("o_orderdate"))).as("d_orderdate"),
      countDistinct(col("o_orderpriority")).as("d_orderpriority"),
      min(col("o_orderkey")).as("min_orderkey"),
      max(col("o_orderkey")).as("max_orderkey"),
      min(cents(col("o_totalprice"))).as("min_price_cents"),
      max(cents(col("o_totalprice"))).as("max_price_cents"),
      min(to_date(col("o_orderdate"))).cast("string").as("min_orderdate"),
      max(to_date(col("o_orderdate"))).cast("string").as("max_orderdate"))
    def m(colName: String, metric: String, v: Column) =
      struct(lit(colName).as("col_name"), lit(metric).as("metric"),
             v.cast("string").as("value"))
    agg.select(explode(array(
        m("*", "n_rows", col("n_rows")),
        m("o_orderkey", "n_distinct", col("d_orderkey")),
        m("o_custkey", "n_distinct", col("d_custkey")),
        m("o_orderstatus", "n_distinct", col("d_orderstatus")),
        m("o_totalprice", "n_distinct", col("d_totalprice")),
        m("o_orderdate", "n_distinct_days", col("d_orderdate")),
        m("o_orderpriority", "n_distinct", col("d_orderpriority")),
        m("o_orderkey", "min", col("min_orderkey")),
        m("o_orderkey", "max", col("max_orderkey")),
        m("o_totalprice", "min_cents", col("min_price_cents")),
        m("o_totalprice", "max_cents", col("max_price_cents")),
        m("o_orderdate", "min_day", col("min_orderdate")),
        m("o_orderdate", "max_day", col("max_orderdate")))).as("r"))
      .select(col("r.col_name"), col("r.metric"), col("r.value"))
      .orderBy("col_name", "metric")
  }

  /** Referential-integrity audit: orphan counts across the five FK
    * edges of the schema, one row per edge. Each edge is a LEFT ANTI
    * equi-join (fact side shuffles/broadcast-probes once); the union
    * is of 1-row aggregates. documents→embeddings is the edge that
    * actually fires at sf0.1 (5,000 docs vs 2,000 vectors).
    */
  val dqReferentialOrphans: Q = (s, d) => {
    def orphans(edge: String, fact: DataFrame, fk: String,
                dim: DataFrame, pk: String): DataFrame =
      fact.select(col(fk)).join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
        .agg(cnt.as("n_orphans")).select(lit(edge).as("edge"), col("n_orphans"))
    val l = tb(s, d, "lineitem")
    orphans("lineitem.l_orderkey->orders", l, "l_orderkey", tb(s, d, "orders"), "o_orderkey")
      .unionAll(orphans("lineitem.l_partkey->part", l, "l_partkey", tb(s, d, "part"), "p_partkey"))
      .unionAll(orphans("lineitem.l_suppkey->supplier", l, "l_suppkey", tb(s, d, "supplier"), "s_suppkey"))
      .unionAll(orphans("orders.o_custkey->customer", tb(s, d, "orders"), "o_custkey",
                        tb(s, d, "customer"), "c_custkey"))
      .unionAll(orphans("documents.doc_id->embeddings", tb(s, d, "documents"), "doc_id",
                        tb(s, d, "embeddings"), "vec_id"))
      .orderBy("edge")
  }

  /** Duplicate-key audit: for each declared key, how many key values
    * repeat and how many surplus rows they carry. (l_orderkey,
    * l_linenumber) is the check that fires — measured non-unique in
    * this corpus (FIXTURES.md) — next to exact-duplicate document
    * texts. One shuffle per audited key.
    */
  val dqDuplicateKeys: Q = (s, d) => {
    def dups(check: String, df: DataFrame, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*).agg(cnt.as("c")).filter(col("c") > 1)
        .agg(coalesce(cnt, lit(0L)).as("n_dup_keys"),
             coalesce(sum(col("c") - 1), lit(0L)).cast("long").as("n_extra_rows"))
        .select(lit(check).as("check"), col("n_dup_keys"), col("n_extra_rows"))
    dups("orders.o_orderkey", tb(s, d, "orders"), Seq("o_orderkey"))
      .unionAll(dups("lineitem.(l_orderkey,l_linenumber)", tb(s, d, "lineitem"),
                     Seq("l_orderkey", "l_linenumber")))
      .unionAll(dups("documents.text", tb(s, d, "documents"), Seq("text")))
      .orderBy("check")
  }

  /** Domain-rule violation battery: one row per rule with its
    * violation count — the assertion set an ingest pipeline runs as a
    * gate. Single-table rules ride one scan each; the cross-table rule
    * (ship-before-order) is one orderkey equi-join. Counts of zero are
    * the point: the PASS rows prove the rule executed.
    */
  val dqDomainViolations: Q = (s, d) => {
    def rule(name: String, df: DataFrame, bad: Column): DataFrame =
      df.agg(sum(when(bad, 1L).otherwise(0L)).cast("long").as("n_violations"))
        .select(lit(name).as("rule"), col("n_violations"))
    val l = tb(s, d, "lineitem")
    val o = tb(s, d, "orders")
    val shipBeforeOrder = l.select("l_orderkey", "l_shipdate")
      .join(o.select("o_orderkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .agg(sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L))
             .cast("long").as("n_violations"))
      .select(lit("lineitem.ship_before_order").as("rule"), col("n_violations"))
    rule("lineitem.discount_range", l, col("l_discount") < 0 || col("l_discount") > 0.11)
      .unionAll(rule("lineitem.qty_integer", l,
                     col("l_quantity") =!= col("l_quantity").cast("long").cast("double")))
      .unionAll(rule("lineitem.price_positive", l, col("l_extendedprice") <= 0))
      .unionAll(rule("orders.status_domain", o, !col("o_orderstatus").isin("F", "O", "P")))
      .unionAll(rule("customer.acctbal_negative", tb(s, d, "customer"), col("c_acctbal") < 0))
      .unionAll(rule("events.type_domain", tb(s, d, "events"),
                     !col("event_type").isin("click", "error", "purchase", "signup", "view")))
      .unionAll(shipBeforeOrder)
      .orderBy("rule")
  }

  /** Rapid-repeat purchase audit (round 9): the double-submission /
    * double-charge screen — all same-user purchase pairs within 60
    * minutes, bucketed by gap (≤1 min / ≤10 min / ≤60 min) with the
    * affected-user count and the summed absolute amount difference.
    * The pair join is per-user banded (equi on user + time band) —
    * linear in per-user purchase density, never cross-user. Gaps are
    * whole floored seconds (R4) so the bucket boundaries are exact on
    * both engines; amounts compare in integer cents (R2). Pairs order
    * by (ts, event_id) lexicographically — NOT strictly by ts — so two
    * purchases at the SAME instant (the canonical double-submission
    * signature this audit screens for) still form one pair, landing in
    * the ≤1 min bucket with gap 0 (ADVICE r9).
    */
  val dqRapidRepeatPurchase: Q = (s, d) => {
    val p = tb(s, d, "events").filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), col("user_id").as("u"),
              col("ts"), cents(col("value")).as("c"))
    val a = p.select(col("id").as("a_id"), col("u"), col("ts").as("a_ts"),
                     col("c").as("a_c"))
    val b = p.select(col("id").as("b_id"), col("u").as("b_u"),
                     col("ts").as("b_ts"), col("c").as("b_c"))
    a.join(b, col("u") === col("b_u") &&
              (col("b_ts") > col("a_ts") ||
                (col("b_ts") === col("a_ts") && col("b_id") > col("a_id"))) &&
              col("b_ts") <= col("a_ts") + expr("INTERVAL 60 MINUTES"))
      .withColumn("gap_s",
        unix_timestamp(col("b_ts")) - unix_timestamp(col("a_ts")))
      .withColumn("gap_bucket",
        when(col("gap_s") <= 60, "a_under_1min")
          .when(col("gap_s") <= 600, "b_under_10min")
          .otherwise("c_under_60min"))
      .groupBy("gap_bucket")
      .agg(cnt.as("n_pairs"),
           countDistinct(col("u")).as("n_users"),
           sum(abs(col("a_c") - col("b_c"))).cast("long").as("abs_diff_cents"))
      .orderBy("gap_bucket")
  }

  /** ONE-PASS data-quality counters via `Dataset.observe` (round 11)
    * — the production pattern for DQ on a 100 TB pipeline: the metrics
    * piggyback on the job the data was ALREADY being read for (an
    * accumulator-backed side channel), instead of a second audit scan.
    * Attaches row count, per-column null counts, and a negative-value
    * counter to `df`; after ANY action on the returned frame,
    * `obs.get` yields the counters. Works identically on streaming
    * frames (metrics surface per micro-batch in
    * `StreamingQueryProgress.observedMetrics`).
    */
  def withDqObservation(df: DataFrame, obs: org.apache.spark.sql.Observation,
                        nullCols: Seq[String],
                        nonNegativeCol: String): DataFrame = {
    val nullCounts = nullCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    val neg = sum(when(col(nonNegativeCol) < 0, 1L).otherwise(0L))
      .as(s"negative_$nonNegativeCol")
    df.observe(obs, cnt.as("rows"), (nullCounts :+ neg): _*)
  }

  val queries: Map[String, Q] = Map(
    "profile_table_stats" -> profileTableStats,
    "dq_referential_orphans" -> dqReferentialOrphans,
    "dq_duplicate_keys" -> dqDuplicateKeys,
    "dq_domain_violations" -> dqDomainViolations,
    "dq_rapid_repeat_purchase" -> dqRapidRepeatPurchase,
  )
}
