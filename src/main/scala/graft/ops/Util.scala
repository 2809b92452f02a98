package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers encoding the determinism rules of SURVEY.md §2.1.
  * Centralizing them is what makes 58 oracle-matched queries safe:
  * every money/count/timestamp output goes through exactly one of
  * these, so a rule fix lands everywhere at once.
  */
object Util {
  /** Query signature used across the whole library: a pure function of
    * (session, scale-factor dir) → DataFrame. Batch and streaming share
    * these bodies — see [[graft.streaming.StreamOps]].
    */
  type Q = (SparkSession, String) => DataFrame

  /** R2: money → per-row integer cents. Per-row IEEE double ops are
    * bit-identical across engines and integer sums are order-exact, so
    * this is the only aggregation-safe way to emit money.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** R2+R3: sum of per-row integer cents, emitted as BIGINT. */
  def sumCents(c: Column): Column = sum(cents(c)).cast("long")

  /** count(*) — Spark already yields LongType (= DuckDB BIGINT). */
  def cnt: Column = count(lit(1))

  /** Timestamp literal (session timezone is pinned UTC). */
  def ts(s: String): Column = lit(s).cast("timestamp")

  /** Bench-session-gated broadcast hint (the [[graft.ops.Relational]]
    * q3/q5 idiom, shared since r19): a hard-coded broadcast of a
    * fact-derived side is an OOM hazard at production scale, so the
    * library default leaves join selection to the planner/AQE and only
    * the bench session (`spark.graft.benchHints=true`, where static
    * size estimates are wrong without AQE) opts in.
    */
  def benchBroadcast(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.benchHints", "false").toBoolean)
      broadcast(df)
    else df
}
