package graft.ops

import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-16 query wave 3 (SURVEY §2.20): audience-overlap Jaccard,
  * Zeller's congruence, bipartite density, base-36 key rendering,
  * weighted mod-11 check digits, and weekday-detrended residual
  * bands. Exactness per §2.1 — ppm/ratio math via positive integer
  * division and cross-multiplication only.
  */
object Metrics11 {

  private def li(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def orders(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "orders")
  private def part(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "part")
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "events")

  /** Audience overlap between event types: exact Jaccard of the user
    * sets for every unordered type pair (|A∩B| via an equi-join on
    * user over the distinct (type, user) grain; |A∪B| by
    * inclusion-exclusion — no union materialized). The per-type counts
    * ride broadcasts; the intersection join is user-keyed and
    * parallel.
    */
  val eventsTypeUserJaccard: Q = (s, d) => {
    val u = ev(s, d).select(col("event_type").as("et"), col("user_id")).distinct()
    val n = u.groupBy("et").agg(cnt.as("c"))
    val i = u.as("a").join(u.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.et") < col("b.et"))
      .groupBy(col("a.et").as("type_a"), col("b.et").as("type_b"))
      .agg(cnt.as("users_both"))
    i.join(broadcast(n.select(col("et").as("type_a"), col("c").as("ca"))), Seq("type_a"))
      .join(broadcast(n.select(col("et").as("type_b"), col("c").as("cb"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("users_both"),
        (col("ca") + col("cb") - col("users_both")).as("users_either"))
      .withColumn("jaccard_ppm", expr("(1000000 * users_both) div users_either"))
      .orderBy("type_a", "type_b")
  }

  /** Zeller's congruence: the weekday of every order date from pure
    * integer arithmetic (the January/February year rollback, the
    * century terms), censused by the Zeller index h (0 = Saturday)
    * with per-row agreement against the engine's own weekday —
    * `agree_builtin == n_days` everywhere is the contract, pinning the
    * arithmetic AND the builtin to each other across engines.
    */
  val dateZellerCongruence: Q = (s, d) => {
    orders(s, d).select(to_date(col("o_orderdate")).as("dy")).distinct()
      .withColumn("m", expr("IF(month(dy) <= 2, month(dy) + 12, month(dy))"))
      .withColumn("y", expr("IF(month(dy) <= 2, year(dy) - 1, year(dy))"))
      .withColumn("zh", expr(
        """(day(dy) + (13*(m + 1)) div 5 + (y % 100) + (y % 100) div 4
           + (y div 100) div 4 + 5*(y div 100)) % 7"""))
      .groupBy(col("zh").cast("long").as("zeller_h"))
      .agg(cnt.as("n_days"),
        sum(when(expr("(zh + 5) % 7 + 1") === weekday(col("dy")) + 1, 1L)
          .otherwise(0L)).cast("long").as("agree_builtin"))
      .orderBy("zeller_h")
  }

  /** Bipartite (part × supplier) trade-graph density per brand: the
    * realized distinct edges over the complete bipartite capacity
    * |parts|·|suppliers|, exact ppm — the assortment-connectivity
    * audit. One distinct collapse, one grouped count-distinct pair.
    */
  val graphBipartiteDensity: Q = (s, d) => {
    li(s, d).join(part(s, d), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"), col("l_partkey").as("pk"),
        col("l_suppkey").as("sk")).distinct()
      .groupBy("brand")
      .agg(cnt.as("edges"), countDistinct("pk").cast("long").as("parts"),
        countDistinct("sk").cast("long").as("suppliers"))
      .withColumn("density_ppm", expr("(1000000 * edges) div (parts * suppliers)"))
      .orderBy("brand")
  }

  /** Base-36 key rendering (Spark `conv` ↔ DuckDB `to_base`, both
    * upper-case): census of (leading digit, rendered length) — the
    * radix-encoding surface, and a distribution check on the key
    * space's high-order structure.
    */
  val exprBase36Digits: Q = (s, d) => {
    orders(s, d).filter(col("o_orderkey") > 0)
      .select(conv(col("o_orderkey").cast("string"), 10, 36).as("s"))
      .groupBy(substring(col("s"), 1, 1).as("lead_digit"),
        length(col("s")).cast("long").as("len"))
      .agg(cnt.as("keys"))
      .orderBy("lead_digit", "len")
  }

  /** Weighted mod-11 check digit (the ISBN-10 weighting shape: digit i
    * carries weight i+2 from the units place): one codegen `aggregate`
    * HOF over the 10 arithmetic digits, censused per priority —
    * completing the checksum trio beside Luhn (doubling) and Damm
    * (quasigroup).
    */
  val dqCheckdigitMod11: Q = (s, d) => {
    orders(s, d).select(col("o_orderpriority").as("priority"),
        expr("""cast(aggregate(sequence(0, 9), 0L, (acc, i) -> acc +
          ((o_orderkey div cast(pow(10, i) as bigint)) % 10) * (i + 2)) % 11
          as bigint)""").as("check_digit"))
      .groupBy("priority", "check_digit")
      .agg(cnt.as("n"))
      .orderBy("priority", "check_digit")
  }

  /** Weekday-detrended daily revenue: each day's cents against its
    * OWN weekday's mean via exact cross-multiplication banding
    * (10·v·n_dow // tot_dow — never a double, never a signed
    * division), censused per (weekday, ratio band) — the seasonal
    * adjustment readout (band 10 = exactly at the weekday mean).
    */
  val tsDowResidualBands: Q = (s, d) => {
    val w = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dy"))
      .agg(sumCents(col("o_totalprice")).as("v"))
      .withColumn("dow", weekday(col("dy")) + 1)
    val g = w.groupBy("dow").agg(sum("v").cast("long").as("tot"), cnt.as("n"))
    w.join(broadcast(g), Seq("dow"))
      .select(col("dow").cast("long").as("dow"),
        least(expr("(10 * v * n) div tot"), lit(20L)).cast("long").as("ratio_band"))
      .groupBy("dow", "ratio_band")
      .agg(cnt.as("n_days"))
      .orderBy("dow", "ratio_band")
  }

  val queries: Map[String, Q] = Map(
    "events_type_user_jaccard" -> eventsTypeUserJaccard,
    "date_zeller_congruence" -> dateZellerCongruence,
    "graph_bipartite_density" -> graphBipartiteDensity,
    "expr_base36_digits" -> exprBase36Digits,
    "dq_checkdigit_mod11" -> dqCheckdigitMod11,
    "ts_dow_residual_bands" -> tsDowResidualBands,
  )
}
