package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Window-function surface (SURVEY.md §2.3 `win_*`). Ranking functions
  * are cast to long: Spark emits IntegerType for row_number/rank/ntile
  * while the oracle (DuckDB) emits BIGINT, and the driver compares
  * schemas.
  *
  * Scale note: all partitioned windows shuffle once on their partition
  * key and stream within the partition — fine at any scale given
  * non-degenerate key cardinality. `win_ntile` uses the bucket-parallel
  * two-phase global ranking ([[Scale.globalNtile]]) instead of a
  * single-partition ORDER BY window.
  */
object Windows {

  private def orders(s: SparkSession, d: String) = Tables.t(s, d, "orders")

  val winTopkPerGroup: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .orderBy("o_custkey", "rn")
      .limit(1000)
  }

  val winRankDense: Q = (s, d) => {
    val wr = Window.partitionBy("p_brand").orderBy(col("p_size").desc, col("p_partkey"))
    val wd = Window.partitionBy("p_brand").orderBy(col("p_size").desc)
    Tables.t(s, d, "part")
      .withColumn("rk", rank().over(wr).cast("long"))
      .withColumn("drk", dense_rank().over(wd).cast("long"))
      .filter(col("rk") <= 5)
      .select("p_brand", "p_partkey", "rk", "drk")
      .orderBy("p_brand", "rk", "p_partkey")
  }

  val winLagLead: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              lag("o_orderkey", 1).over(w).as("prev_ok"),
              lead("o_orderkey", 1).over(w).as("next_ok"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(1000)
  }

  val winRunningSum: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              sum(cents(col("o_totalprice"))).over(w).cast("long").as("run_cents"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(1000)
  }

  /** Global ntile WITHOUT the single-partition global sort that
    * `ntile(4).over(Window.orderBy(...))` plans — and, since the query
    * only consumes the per-tile CENSUS (count + min), without ranking
    * every row either: [[Scale.globalNtileCensus]] window-ranks only
    * the ≤ k−1 price buckets that straddle a tile boundary and pushes
    * the aggregate below the ranking for every interior bucket (one
    * map-side-combined pass). Output is bit-identical to the window
    * formulation — the oracle pins it.
    */
  val winNtile: Q = (s, d) =>
    Scale.globalNtileCensus(
        orders(s, d).select("o_totalprice", "o_orderkey"), 4,
        // bucket width 20k ≈ 28 price buckets: measured best at bench
        // scale (fewer window tasks + a 100× smaller B² offsets join
        // than width 5k). Bucket count should track cluster parallelism
        // at real scale; any width is semantically identical (the
        // oracle pins the output).
        floor(col("o_totalprice") / 20000),
        Seq(col("o_totalprice"), col("o_orderkey")),
        aggs = Seq(cnt.as("c"), cents(min(col("o_totalprice"))).as("mn")))
      .select(col("__tile").as("b"), col("c"), col("mn"))
      .orderBy("b")

  val winFirstLast: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              first(col("o_orderkey")).over(w).as("first_ok"),
              last(col("o_orderkey")).over(w).as("last_ok"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(1000)
  }

  /** percent_rank/cume_dist: ratios of exact integer ranks — identical
    * doubles across engines; integer-scaled per R2 anyway.
    */
  val winPctRank: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              round(percent_rank().over(w) * 1e6).cast("long").as("pr_micro"),
              round(cume_dist().over(w) * 1e6).cast("long").as("cd_micro"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(1000)
  }

  /** Interval RANGE frames (value-based, peers included) — no
    * DataFrame API for interval bounds, so this uses the SQL entry
    * point like `agg_grouping_sets` (SURVEY §3.2-E2).
    */
  val winRangeFrame: Q = (s, d) =>
    graft.tables.Tables.sql(s, d,
      """SELECT o_custkey, o_orderkey,
        |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND INTERVAL 30 DAYS FOLLOWING) AS BIGINT) n_near,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS BIGINT) cents_30d
        |FROM orders ORDER BY o_custkey, o_orderkey LIMIT 1000""".stripMargin)

  /** GLOBAL percent_rank without a single-partition sort — the second
    * consumer of [[Scale.globalRank]] (after `win_ntile`):
    * pr = (rn − 1)/(n − 1) from the bucket-parallel global row number.
    * Exact-integer division in double is engine-identical, so the
    * oracle's `percent_rank() OVER (ORDER BY ...)` pins it bit-for-bit.
    */
  val winPctRankGlobal: Q = (s, d) =>
    Scale.globalRank(
        orders(s, d).select("o_orderkey", "o_totalprice"),
        floor(col("o_totalprice") / 20000), // same width rationale as winNtile
        Seq(col("o_totalprice"), col("o_orderkey")))
      .select(col("o_orderkey"),
              round((col("__rn") - 1) * lit(1e6) / (col("__n") - 1))
                .cast("long").as("pr_micro"))
      .orderBy("o_orderkey")
      .limit(1000)

  /** Rows-frame moving average (last 4 orders per customer) — integer
    * cents averaged over an exact ≤4-element frame: the sum is exact in
    * long, the division is one deterministic IEEE op, so the double is
    * engine-identical without rounding tricks.
    */
  val winMovingAvg: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-3, Window.currentRow)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              round(avg(cents(col("o_totalprice"))).over(w))
                .cast("long").as("ma_cents"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(1000)
  }

  /** nth_value over the full partition frame: the 2nd order key and
    * 3rd order's cents per customer on every row — the "compare me to
    * the customer's nth event" shape. One keyed shuffle, one sort.
    */
  val winNthValue: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              nth_value(col("o_orderkey"), 2).over(w).as("second_ok"),
              nth_value(cents(col("o_totalprice")), 3).over(w).as("third_cents"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(1000)
  }

  /** IGNORE NULLS navigation: previous finished-order cents (lag
    * skipping non-F orders, which project to NULL) and the running
    * last non-null — the carry-forward idiom `ts_resample_ffill`
    * builds on, exercised as a declared query.
    */
  val winIgnoreNulls: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("v", when(col("o_orderstatus") === "F", cents(col("o_totalprice"))))
      .select(col("o_custkey"), col("o_orderkey"),
              lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_f_cents"),
              last(col("v"), ignoreNulls = true).over(wf).as("run_last_f_cents"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(1000)
  }

  /** Per-group top-k WITHOUT the window sort: the mergeable
    * bounded-heap aggregate [[graft.functions.BottomK]] reduces each
    * (map partition, customer) to ≤ 3 rows BEFORE the shuffle —
    * `row_number().over(...)` must shuffle and sort every order first.
    * Identical output to `win_topk_per_group` (same oracle shape), so
    * the driver hash-proves the rewrite on every run; WindowsSpec pins
    * the ObjectHashAggregate + partial_bottom_k plan.
    */
  val winTopkAgg: Q = (s, d) => {
    val sortKey = struct((-col("o_totalprice")).as("negp"), col("o_orderkey").as("ok"))
    orders(s, d)
      .groupBy("o_custkey")
      .agg(graft.functions.TopKFunctions.bottom_k(sortKey, 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), col("col.ok").as("o_orderkey"),
              (col("pos") + 1).cast("long").as("rn"))
      .orderBy("o_custkey", "rn")
      .limit(1000)
  }

  val queries: Map[String, Q] = Map(
    "win_topk_agg" -> winTopkAgg,
    "win_ignore_nulls" -> winIgnoreNulls,
    "win_nth_value" -> winNthValue,
    "win_moving_avg" -> winMovingAvg,
    "win_pct_rank_global" -> winPctRankGlobal,
    "win_topk_per_group" -> winTopkPerGroup,
    "win_range_frame" -> winRangeFrame,
    "win_rank_dense" -> winRankDense,
    "win_lag_lead" -> winLagLead,
    "win_running_sum" -> winRunningSum,
    "win_ntile" -> winNtile,
    "win_first_last" -> winFirstLast,
    "win_pct_rank" -> winPctRank,
  )
}
