package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, AsOf, Audits, Funcs, Funcs2, Insights, LlmOps, Metrics, Metrics2, Metrics3, Metrics4, Metrics5, Metrics6, Metrics7, Metrics8, Metrics9, Metrics10, Metrics11, Metrics12, Metrics13, Metrics14, Metrics15, MlOps, Pipeline, Quality, Relational, Relevance, Streaming, Subqueries, Udfs, Windows}
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory (SURVEY.md §2.3) is assembled from the ops
  * modules; every key has a matching validated DuckDB oracle in
  * [[graft.oracle.OracleSql]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Windows.queries ++ Streaming.queries ++
      LlmOps.queries ++ Udfs.queries ++ Pipeline.queries ++ AsOf.queries ++
      Analytics.queries ++ Subqueries.queries ++ Funcs.queries ++
      Funcs2.queries ++ Quality.queries ++ Relevance.queries ++ MlOps.queries ++
      Insights.queries ++ Audits.queries ++ Metrics.queries ++ Metrics2.queries ++
      Metrics3.queries ++ Metrics4.queries ++ Metrics5.queries ++ Metrics6.queries ++
      Metrics7.queries ++ Metrics8.queries ++ Metrics9.queries ++ Metrics10.queries ++ Metrics11.queries ++ Metrics12.queries ++ Metrics13.queries ++ Metrics14.queries ++ Metrics15.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = OracleSql.sql
}
