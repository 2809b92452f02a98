package graft.oracle

/** Round-16 oracle SQL (DuckDB) — every query in `ops/Metrics9.scala`.
  * Validated against sf0.001 and sf0.01 before the Spark
  * implementations were written (the §2.1 pre-validation loop).
  */
object OracleW28 {
  val sql: Map[String, String] = Map(

    "alloc_dhondt" ->
      """WITH w AS (SELECT n.n_name nation,
    CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY 1),
 q AS (SELECT nation, d.d, cents // d.d quot
   FROM w CROSS JOIN (SELECT unnest(range(1, 1001)) d) d),
 r AS (SELECT nation, row_number() OVER (ORDER BY quot DESC, nation, d) rk FROM q)
SELECT nation, CAST(count(*) AS BIGINT) seats
FROM r WHERE rk <= 1000 GROUP BY 1 ORDER BY nation""",

    "orders_pareto_8020" ->
      """WITH cr AS (SELECT c.c_mktsegment seg, o.o_custkey ck,
    CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1, 2),
 t AS (SELECT seg, CAST(sum(cents) AS BIGINT) tot,
        CAST(count(*) AS BIGINT) customers FROM cr GROUP BY 1),
 r AS (SELECT cr.seg, cr.cents, t.tot, t.customers,
    CAST(sum(cr.cents) OVER (PARTITION BY cr.seg
      ORDER BY cr.cents DESC, cr.ck
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) run
   FROM cr JOIN t ON cr.seg = t.seg)
SELECT seg AS segment, CAST(max(customers) AS BIGINT) customers,
  CAST(sum(CASE WHEN run - cents < (tot*4 + 4) // 5 THEN 1 ELSE 0 END) AS BIGINT) n80,
  CAST((1000000 * sum(CASE WHEN run - cents < (tot*4 + 4) // 5 THEN 1 ELSE 0 END))
    // max(customers) AS BIGINT) n80_ppm
FROM r GROUP BY seg ORDER BY segment""",

    "graph_harmonic_centrality" ->
      """WITH e AS (SELECT sn.n_name src, cn.n_name dst,
    CAST(min(datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS BIGINT) w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  WHERE l.l_shipdate >= o.o_orderdate GROUP BY 1, 2),
 w2 AS (SELECT a.src, b.dst, CAST(min(a.w + b.w) AS BIGINT) w
   FROM e a JOIN e b ON a.dst = b.src GROUP BY 1, 2),
 w12 AS (SELECT src, dst, CAST(min(w) AS BIGINT) w FROM
   (SELECT * FROM e UNION ALL SELECT * FROM w2) GROUP BY 1, 2),
 w3 AS (SELECT a.src, b.dst, CAST(min(a.w + b.w) AS BIGINT) w
   FROM w12 a JOIN e b ON a.dst = b.src GROUP BY 1, 2),
 d AS (SELECT src, dst, CAST(min(w) AS BIGINT) w FROM
   (SELECT * FROM w12 UNION ALL SELECT * FROM w3) GROUP BY 1, 2)
SELECT src AS nation, CAST(count(*) AS BIGINT) reached,
  CAST(sum(1000000 // (w + 1)) AS BIGINT) harmonic_ppm
FROM d WHERE src <> dst GROUP BY 1 ORDER BY nation""",

    "date_easter_computus" ->
      """WITH y AS (SELECT DISTINCT year(o_orderdate) y FROM orders),
 g AS (SELECT y, y % 19 a, y % 4 b, y % 7 c, y // 100 k FROM y),
 g2 AS (SELECT *, (13 + 8*k) // 25 p, k // 4 q FROM g),
 g3 AS (SELECT *, (15 - p + k - q) % 30 m, (4 + k - q) % 7 n FROM g2),
 g4 AS (SELECT *, (19*a + m) % 30 d, NULL FROM g3),
 g5 AS (SELECT *, (2*b + 4*c + 6*d + n) % 7 e FROM g4),
 ee AS (SELECT y, CASE
     WHEN d = 29 AND e = 6 THEN make_date(CAST(y AS INT), 4, 19)
     WHEN d = 28 AND e = 6 AND (11*m + 11) % 30 < 19 THEN make_date(CAST(y AS INT), 4, 18)
     ELSE make_date(CAST(y AS INT), 3, 22) + CAST((d + e) AS INT) END easter
   FROM g5)
SELECT CAST(ee.y AS BIGINT) yr,
  CAST(month(ee.easter) AS BIGINT) easter_month,
  CAST(day(ee.easter) AS BIGINT) easter_day,
  CAST(sum(CASE WHEN abs(datediff('day', ee.easter, CAST(o.o_orderdate AS DATE))) <= 7
       THEN 1 ELSE 0 END) AS BIGINT) orders_within_7d
FROM orders o JOIN ee ON year(o.o_orderdate) = ee.y
GROUP BY 1, 2, 3 ORDER BY yr""",

    "events_interarrival_cv" ->
      """WITH g AS (SELECT event_type et,
    CAST(epoch_us(ts) AS BIGINT) - lag(CAST(epoch_us(ts) AS BIGINT))
      OVER (PARTITION BY event_type, user_id ORDER BY ts, event_id) gap_us
  FROM events),
 f AS (SELECT et, CAST(gap_us // 60000000 AS BIGINT) m FROM g
   WHERE gap_us IS NOT NULL AND gap_us <= 86400000000),
 a AS (SELECT et, CAST(count(*) AS BIGINT) n, CAST(sum(m) AS BIGINT) s,
        CAST(sum(m*m) AS BIGINT) s2 FROM f GROUP BY 1)
SELECT et AS event_type, n, s AS sum_minutes,
  CAST(floor(1000.0 * (CAST(n AS DOUBLE)*CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE))
    / (CAST(s AS DOUBLE)*CAST(s AS DOUBLE))) AS BIGINT) cv2_milli
FROM a WHERE s > 0 ORDER BY event_type""",

    "part_price_ladder_gaps" ->
      """WITH p AS (SELECT DISTINCT p_brand brand,
    CAST(round(p_retailprice*100) AS BIGINT) cents FROM part),
 g AS (SELECT brand, cents - lag(cents) OVER (PARTITION BY brand ORDER BY cents) gap FROM p),
 f AS (SELECT CAST(least(gap // 100, 10) AS BIGINT) band, gap FROM g WHERE gap IS NOT NULL)
SELECT band, CAST(count(*) AS BIGINT) gaps, CAST(min(gap) AS BIGINT) min_gap,
  CAST(max(gap) AS BIGINT) max_gap
FROM f GROUP BY 1 ORDER BY band""",

    "graph_edge_reciprocity" ->
      """WITH e AS (SELECT sn.n_name src, cn.n_name dst,
    CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT) v
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  WHERE sn.n_name <> cn.n_name GROUP BY 1, 2)
SELECT a.src AS nation, CAST(count(*) AS BIGINT) out_edges,
  CAST(sum(CASE WHEN b.v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) reciprocated,
  CAST((1000000 * sum(CASE WHEN b.v IS NOT NULL THEN 1 ELSE 0 END)) // count(*) AS BIGINT) recip_ppm,
  CAST(sum(CASE WHEN b.v IS NOT NULL THEN least(a.v, b.v) ELSE 0 END) AS BIGINT) minflow_cents
FROM e a LEFT JOIN e b ON a.src = b.dst AND a.dst = b.src
GROUP BY 1 ORDER BY nation""",

    "expr_bit_reverse" ->
      """WITH x AS (SELECT o_orderkey & 65535 k FROM orders),
 r1 AS (SELECT k, ((k >> 1) & 21845) | ((k & 21845) << 1) v FROM x),
 r2 AS (SELECT k, ((v >> 2) & 13107) | ((v & 13107) << 2) v FROM r1),
 r3 AS (SELECT k, ((v >> 4) & 3855) | ((v & 3855) << 4) v FROM r2),
 r4 AS (SELECT k, ((v >> 8) & 255) | ((v & 255) << 8) v FROM r3),
 f AS (SELECT k, v rev16, xor(k, k >> 1) gray FROM r4)
SELECT CAST(rev16 // 4096 AS BIGINT) band, CAST(count(*) AS BIGINT) cnt,
  CAST(sum(bit_count(gray & 255)) AS BIGINT) gray_low_bits,
  CAST(min(rev16) AS BIGINT) min_rev, CAST(max(rev16) AS BIGINT) max_rev
FROM f GROUP BY 1 ORDER BY band""",

    "ts_spearman_autocorr" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy, CAST(count(*) AS BIGINT) c
   FROM orders GROUP BY 1),
 p AS (SELECT a.dy, a.c x, b.c y FROM d a JOIN d b ON b.dy = a.dy - 7),
 r AS (SELECT dy,
    row_number() OVER (ORDER BY x, dy) rx,
    row_number() OVER (ORDER BY y, dy) ry FROM p),
 s AS (SELECT CAST(count(*) AS BIGINT) n,
    CAST(sum((rx - ry)*(rx - ry)) AS BIGINT) sd2 FROM r)
SELECT n, sd2,
  CAST(1000000 - (6000000 * sd2) // (n * (n*n - 1)) AS BIGINT) rho_ppm
FROM s""",

    "customer_cohort_retention_triangle" ->
      """WITH f AS (SELECT o_custkey ck, min(date_trunc('month', o_orderdate)) fm FROM orders GROUP BY 1),
 x AS (SELECT o.o_custkey ck, f.fm,
    (year(o.o_orderdate)*12 + month(o.o_orderdate)) - (year(f.fm)*12 + month(f.fm)) t
   FROM orders o JOIN f ON o.o_custkey = f.ck),
 b AS (SELECT CAST(year(fm) AS BIGINT) cohort_year, CAST(least(t // 6, 8) AS BIGINT) t_bucket, ck FROM x)
SELECT cohort_year, t_bucket, CAST(count(DISTINCT ck) AS BIGINT) active_customers
FROM b GROUP BY 1, 2 ORDER BY cohort_year, t_bucket""",

  )
}
