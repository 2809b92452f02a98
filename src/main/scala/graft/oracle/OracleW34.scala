package graft.oracle

/** Round-18 wave 2 (W34) oracles — validated by tools/draft_w34.py in
  * DuckDB at sf0.001 and sf0.01 before the Spark twins were written.
  * See graft.ops.Metrics15 for the FP discipline notes.
  */
object OracleW34 {
  val sql: Map[String, String] = Map(


    // Sign-balance census per label: per-row (#positive - #negative)
    // elements is an EXACT integer (float sign tests, no arithmetic),
    // bucketed by 4 — the distributional shape of normalized vectors
    // without any FP fold.
    "emb_sign_balance_census" ->
      """
WITH b AS (SELECT label,
    CAST(list_sum(list_transform(embedding::DOUBLE[],
      x -> CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END)) AS BIGINT) bal
  FROM embeddings)
SELECT CAST(label AS BIGINT) lbl,
  CAST(CASE WHEN bal >= 0 THEN bal // 4 ELSE -((-bal + 3) // 4) END AS BIGINT) band,
  CAST(count(*) AS BIGINT) n
FROM b GROUP BY 1, 2 ORDER BY lbl, band
""",

    // Cosine similarity between label CENTROIDS (per-dimension means),
    // milli-rounded, all ordered label pairs a < b.
    "emb_centroid_dist" ->
      """
WITH dims AS (SELECT label, u.d, u.x
  FROM embeddings, LATERAL (SELECT unnest(embedding::DOUBLE[]) x,
    generate_subscripts(embedding, 1) d) u),
 c AS (SELECT label, d, avg(x) m FROM dims GROUP BY 1, 2),
 p AS (SELECT a.label la, b.label lb,
    sum(a.m * b.m) dot, sum(a.m * a.m) na, sum(b.m * b.m) nb
  FROM c a JOIN c b ON a.d = b.d AND a.label < b.label
  GROUP BY 1, 2)
SELECT CAST(la AS BIGINT) label_a, CAST(lb AS BIGINT) label_b,
  CAST(round(dot / sqrt(na * nb) * 1000) AS BIGINT) cos_milli
FROM p ORDER BY label_a, label_b
""",

    // Mean and population stddev of the first 8 dimensions per label
    // (milli) — fixed dimensions, no FP-sensitive ranking.
    "emb_dim_profile" ->
      """
WITH dims AS (SELECT label, u.d, u.x
  FROM embeddings, LATERAL (SELECT unnest(embedding::DOUBLE[]) x,
    generate_subscripts(embedding, 1) d) u
  WHERE u.d <= 8)
SELECT CAST(label AS BIGINT) lbl, CAST(d AS BIGINT) dim,
  CAST(round(avg(x) * 1000) AS BIGINT) mean_milli,
  CAST(round(sqrt(avg(x * x) - avg(x) * avg(x)) * 1000) AS BIGINT) std_milli
FROM dims GROUP BY 1, 2 ORDER BY lbl, dim
""",

    // SQ8 per-row quantization error: quantize each element against the
    // ROW's [min, max] to 8 bits, reconstruction SSE per row rounded to
    // micro (one per-row rounding), exact integer sums per label.
    "emb_quantize_err" ->
      """
WITH e AS (SELECT label, embedding::DOUBLE[] v,
    list_min(embedding::DOUBLE[]) mn, list_max(embedding::DOUBLE[]) mx
  FROM embeddings),
 err AS (SELECT label,
    CAST(round(CASE WHEN mx > mn THEN list_sum(list_transform(v,
        x -> pow(x - (mn + round((x - mn) / (mx - mn) * 255)
                        * (mx - mn) / 255), 2)))
      ELSE 0 END * 1000000) AS BIGINT) e_micro
  FROM e)
SELECT CAST(label AS BIGINT) lbl, CAST(count(*) AS BIGINT) n,
  CAST(sum(e_micro) AS BIGINT) sse_micro
FROM err GROUP BY 1 ORDER BY lbl
""",

    // Fixed-hyperplane balance: dot with the deterministic +1/-1
    // alternating weight vector, centi-rounded per row; sign census per
    // label. Pure integers after the one rounding.
    "emb_hyperplane_balance" ->
      """
WITH d AS (SELECT label,
    CAST(round(list_sum(list_transform(
      list_zip(embedding::DOUBLE[],
               range(1, len(embedding) + 1)),
      z -> CASE WHEN z[2] % 2 = 1 THEN z[1] ELSE -z[1] END)) * 100)
      AS BIGINT) s
  FROM embeddings)
SELECT CAST(label AS BIGINT) lbl,
  CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) pos,
  CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) neg,
  CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) zero
FROM d GROUP BY 1 ORDER BY lbl
""",

    // Burstiness (sigma - mu)/(sigma + mu) of per-type inter-arrival
    // micros: gaps exact integers under the deterministic (ts, event_id)
    // order; population moments; milli.
    "events_burstiness" ->
      """
WITH o AS (SELECT event_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type
      ORDER BY ts, event_id) g
  FROM events),
 g AS (SELECT event_type, CAST(g AS DOUBLE) g FROM o WHERE g IS NOT NULL)
SELECT event_type, CAST(count(*) AS BIGINT) n_gaps,
  CAST(round((sqrt(avg(g * g) - avg(g) * avg(g)) - avg(g)) /
    (sqrt(avg(g * g) - avg(g) * avg(g)) + avg(g)) * 1000) AS BIGINT) b_milli
FROM g GROUP BY 1 ORDER BY event_type
""",

    // Peak-to-mean hourly load per event type — hour = epoch div 3600,
    // ratio exact: 1000 * max * n_hours // total (positive integers).
    "events_peak_hour_ratio" ->
      """
WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 hr,
    CAST(count(*) AS BIGINT) c
  FROM events GROUP BY 1, 2)
SELECT event_type, CAST(count(*) AS BIGINT) n_hours,
  CAST(max(c) AS BIGINT) peak,
  CAST((1000 * max(c) * count(*)) // sum(c) AS BIGINT) ptm_milli
FROM h GROUP BY 1 ORDER BY event_type
""")
}
