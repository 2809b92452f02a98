package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-18 wave 2 (SURVEY §2.22): embedding-table analytics — the
  * least-covered table gets distributional shape (sign balance, dim
  * profiles), geometry (centroid cosine), quantization error, and a
  * fixed-hyperplane census — plus event-stream shape statistics
  * (burstiness, peak-to-mean).
  *
  * FP discipline follows the proven `sim_*` precedent: per-ROW vector
  * folds run in double with ONE coarse terminal rounding (centi/
  * milli/micro) that absorbs fold-order noise between engines;
  * everything crossing rows is either an exact integer after that
  * rounding (census counts, integer sums) or coarse-rounded once at
  * the end (centroid cosine, moments). Sign tests on floats are exact
  * — the sign-balance census has NO floating arithmetic at all.
  * Negative floor division is spelled out explicitly on both sides
  * (DuckDB `//` floors, Spark `div` truncates — the explicit form
  * agrees everywhere).
  */
object Metrics15 {

  private def events(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "events")
  private def embeddings(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "embeddings")

  /** Per-row (#positive − #negative) elements — an exact integer (no
    * arithmetic on the floats) — bucketed by explicit floor-4 bands.
    */
  val embSignBalanceCensus: Q = (s, d) => {
    val bal = expr("aggregate(embedding, 0L, (a, x) -> a + " +
      "CASE WHEN x > 0 THEN 1L WHEN x < 0 THEN -1L ELSE 0L END)")
    embeddings(s, d)
      .select(col("label").cast("long").as("lbl"), bal.as("bal"))
      .select(col("lbl"),
        when(col("bal") >= 0, expr("bal div 4"))
          .otherwise(-expr("(-bal + 3) div 4")).cast("long").as("band"))
      .groupBy("lbl", "band").agg(cnt.as("n"))
      .orderBy("lbl", "band")
  }

  /** Cosine similarity between label CENTROIDS (per-dimension means),
    * milli-rounded, ordered label pairs. The per-(label, dim) means
    * aggregate distributively; only the 10×10 centroid frame joins.
    */
  val embCentroidDist: Q = (s, d) => {
    val dims = embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("p", "x")))
      .groupBy("label", "p").agg(avg(col("x").cast("double")).as("m"))
    val a = dims.select(col("label").as("la"), col("p"), col("m").as("ma"))
    val b = dims.select(col("label").as("lb"), col("p").as("pb"), col("m").as("mb"))
    a.join(b, col("p") === col("pb") && col("la") < col("lb"))
      .groupBy(col("la").cast("long").as("label_a"),
        col("lb").cast("long").as("label_b"))
      .agg(sum(col("ma") * col("mb")).as("dot"),
        sum(col("ma") * col("ma")).as("na"),
        sum(col("mb") * col("mb")).as("nb"))
      .select(col("label_a"), col("label_b"),
        round(col("dot") / sqrt(col("na") * col("nb")) * 1000)
          .cast("long").as("cos_milli"))
      .orderBy("label_a", "label_b")
  }

  /** Mean and population stddev of the first 8 dimensions per label
    * (milli) — fixed dimensions (1-based to match the oracle's
    * generate_subscripts), no FP-sensitive ranking anywhere.
    */
  val embDimProfile: Q = (s, d) =>
    embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("p", "x0")))
      .filter(col("p") < 8)
      .select(col("label").cast("long").as("lbl"),
        (col("p") + 1).cast("long").as("dim"), col("x0").cast("double").as("x"))
      .groupBy("lbl", "dim")
      .agg(round(avg("x") * 1000).cast("long").as("mean_milli"),
        round(sqrt(avg(col("x") * col("x")) - avg("x") * avg("x")) * 1000)
          .cast("long").as("std_milli"))
      .orderBy("lbl", "dim")

  /** SQ8 per-row quantization error against the ROW's [min, max]:
    * reconstruction SSE per row rounded once to micro, then exact
    * integer sums per label.
    */
  val embQuantizeErr: Q = (s, d) => {
    val mn = expr("CAST(array_min(embedding) AS DOUBLE)")
    val mx = expr("CAST(array_max(embedding) AS DOUBLE)")
    val sse = expr(
      """aggregate(embedding, 0D, (a, x) ->
        |  a + pow(CAST(x AS DOUBLE) - (__mn + round((CAST(x AS DOUBLE) - __mn)
        |    / (__mx - __mn) * 255) * (__mx - __mn) / 255), 2))""".stripMargin)
    embeddings(s, d)
      .withColumn("__mn", mn).withColumn("__mx", mx)
      .select(col("label").cast("long").as("lbl"),
        when(col("__mx") > col("__mn"), round(sse * 1000000))
          .otherwise(lit(0L)).cast("long").as("e_micro"))
      .groupBy("lbl")
      .agg(cnt.as("n"), sum("e_micro").cast("long").as("sse_micro"))
      .orderBy("lbl")
  }

  /** Fixed-hyperplane balance: dot with the deterministic alternating
    * ±1 weight vector (+1 on odd 1-based positions), centi-rounded per
    * row; sign census per label.
    */
  val embHyperplaneBalance: Q = (s, d) => {
    val dot = expr(
      """aggregate(zip_with(embedding, sequence(1, size(embedding)),
        |    (x, i) -> IF(i % 2 = 1, CAST(x AS DOUBLE), -CAST(x AS DOUBLE))),
        |  0D, (a, v) -> a + v)""".stripMargin)
    embeddings(s, d)
      .select(col("label").cast("long").as("lbl"),
        round(dot * 100).cast("long").as("s"))
      .groupBy("lbl")
      .agg(sum(when(col("s") > 0, 1L).otherwise(0L)).cast("long").as("pos"),
        sum(when(col("s") < 0, 1L).otherwise(0L)).cast("long").as("neg"),
        sum(when(col("s") === 0, 1L).otherwise(0L)).cast("long").as("zero"))
      .orderBy("lbl")
  }

  /** Burstiness (σ−μ)/(σ+μ) of per-type inter-arrival micros — gaps
    * are exact integers under the deterministic (ts, event_id) order,
    * population moments in double, milli (5-value partition windows).
    */
  val eventsBurstiness: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
    events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("g", (col("us") - lag("us", 1).over(w)).cast("double"))
      .filter(col("g").isNotNull)
      .groupBy("event_type")
      .agg(cnt.as("n_gaps"),
        round((sqrt(avg(col("g") * col("g")) - avg("g") * avg("g")) - avg("g")) /
          (sqrt(avg(col("g") * col("g")) - avg("g") * avg("g")) + avg("g")) * 1000)
          .cast("long").as("b_milli"))
      .orderBy("event_type")
  }

  /** Peak-to-mean hourly load per event type — hour = epoch-micros div
    * 3600e6, ratio exact positive integer division.
    */
  val eventsPeakHourRatio: Q = (s, d) =>
    events(s, d)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(cnt.as("c"))
      .groupBy("event_type")
      .agg(cnt.as("n_hours"), max("c").cast("long").as("peak"),
        expr("(1000 * max(c) * count(1)) div sum(c)").cast("long").as("ptm_milli"))
      .orderBy("event_type")

  val queries: Map[String, Q] = Map(
    "emb_sign_balance_census" -> embSignBalanceCensus,
    "emb_centroid_dist" -> embCentroidDist,
    "emb_dim_profile" -> embDimProfile,
    "emb_quantize_err" -> embQuantizeErr,
    "emb_hyperplane_balance" -> embHyperplaneBalance,
    "events_burstiness" -> eventsBurstiness,
    "events_peak_hour_ratio" -> eventsPeakHourRatio)
}
