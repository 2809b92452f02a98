package graft.oracle

/** Round-17 wave oracle SQL (DuckDB) — every query in
  * `ops/Metrics12.scala`. Validated against sf0.001 and sf0.01 before
  * the Spark implementations were written (the §2.1 pre-validation
  * loop; tools/draft_w31.py).
  */
object OracleW31 {
  val sql: Map[String, String] = Map(

    "agg_theil_index" ->
      """WITH s AS (SELECT o_orderpriority pr, o_custkey ck,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) x
  FROM orders GROUP BY 1, 2),
 m AS (SELECT pr, avg(x) mu, CAST(count(*) AS BIGINT) n FROM s GROUP BY 1)
SELECT s.pr AS priority, max(m.n) AS customers,
  CAST(floor(sum((s.x / m.mu) * ln(s.x / m.mu)) / max(m.n) * 1000 + 0.5) AS BIGINT) theil_milli
FROM s JOIN m ON s.pr = m.pr
GROUP BY 1 ORDER BY priority""",

    "customer_atkinson_index" ->
      """WITH s AS (SELECT c.c_mktsegment seg,
    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY seg, o.o_custkey)
SELECT seg AS segment, CAST(count(*) AS BIGINT) customers,
  CAST(floor((1.0 - exp(avg(ln(x))) / avg(x)) * 1000000 + 0.5) AS BIGINT) atkinson_micro
FROM s GROUP BY 1 ORDER BY segment""",

    "ts_hurst_rs" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy, CAST(count(*) AS BIGINT) x
  FROM orders GROUP BY 1),
 idx AS (SELECT x, row_number() OVER (ORDER BY dy) - 1 i FROM d),
 w AS (SELECT unnest([8, 16, 32, 64]) wsz),
 blk AS (SELECT w.wsz, idx.i // w.wsz b, idx.i, idx.x
   FROM idx JOIN w ON idx.i < (SELECT count(*) FROM idx) // w.wsz * w.wsz),
 -- block stats from EXACT integer sums (an incremental stddev_pop
 -- accumulates engine-specific rounding); cumdev = running integer
 -- sum minus j*mu, also deterministic
 st AS (SELECT wsz, b, CAST(count(*) AS BIGINT) nb,
     sum(x) sb, sum(x * x) qb FROM blk GROUP BY 1, 2),
 cum AS (SELECT blk.wsz, blk.b,
     CAST(sum(blk.x) OVER (PARTITION BY blk.wsz, blk.b ORDER BY blk.i) AS DOUBLE)
       - (row_number() OVER (PARTITION BY blk.wsz, blk.b ORDER BY blk.i))
         * (CAST(st.sb AS DOUBLE) / st.nb) cd
   FROM blk JOIN st ON blk.wsz = st.wsz AND blk.b = st.b),
 rs AS (SELECT cum.wsz, cum.b, (max(cum.cd) - min(cum.cd)) r FROM cum GROUP BY 1, 2),
 j AS (SELECT rs.wsz, rs.r / sqrt(CAST(st.qb AS DOUBLE) / st.nb
         - (CAST(st.sb AS DOUBLE) / st.nb) * (CAST(st.sb AS DOUBLE) / st.nb)) rsv
   FROM rs JOIN st ON rs.wsz = st.wsz AND rs.b = st.b
   WHERE st.qb * st.nb > st.sb * st.sb)
SELECT CAST(wsz AS BIGINT) window_size, CAST(count(*) AS BIGINT) blocks,
  CAST(floor(avg(rsv) * 1000 + 0.5) AS BIGINT) rs_milli
FROM j GROUP BY 1 ORDER BY window_size""",

    "ts_ljung_box" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy, CAST(count(*) AS DOUBLE) x
  FROM orders GROUP BY 1),
 c AS (SELECT x - (SELECT avg(x) FROM d) e, row_number() OVER (ORDER BY dy) i FROM d),
 den AS (SELECT sum(e * e) s2, CAST(count(*) AS BIGINT) n FROM c),
 lags AS (SELECT unnest(range(1, 8)) k),
 num AS (SELECT l.k, sum(a.e * b.e) sk
   FROM lags l JOIN c a ON true JOIN c b ON b.i = a.i + l.k GROUP BY 1),
 rk AS (SELECT num.k, num.sk / den.s2 r, den.n FROM num, den)
SELECT max(n) AS n_days,
  CAST(floor(max(n) * (max(n) + 2) * sum(r * r / (n - k)) * 1000 + 0.5) AS BIGINT) q_milli
FROM rk""",

    "ml_cramers_v" ->
      """WITH o AS (SELECT p_brand r, p_size c, CAST(count(*) AS DOUBLE) n
  FROM part GROUP BY 1, 2),
 tot AS (SELECT sum(n) n FROM o),
 rt AS (SELECT r, sum(n) nr FROM o GROUP BY 1),
 ct AS (SELECT c, sum(n) nc FROM o GROUP BY 1),
 chi AS (SELECT sum(pow(o.n - rt.nr * ct.nc / tot.n, 2) / (rt.nr * ct.nc / tot.n)) x2
   FROM rt JOIN o ON o.r = rt.r JOIN ct ON o.c = ct.c, tot)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM rt) AS brands,
  (SELECT CAST(count(*) AS BIGINT) FROM ct) AS sizes,
  CAST((SELECT n FROM tot) AS BIGINT) AS parts,
  CAST(floor(chi.x2 * 1000 + 0.5) AS BIGINT) chi2_milli,
  CAST(floor(sqrt(chi.x2 / ((SELECT n FROM tot) *
    (least((SELECT count(*) FROM rt), (SELECT count(*) FROM ct)) - 1))) * 1000000 + 0.5) AS BIGINT) cramers_v_micro
FROM chi""",

    "orders_weekday_anova" ->
      """WITH g AS (SELECT isodow(o_orderdate) dow,
    CAST(count(*) AS BIGINT) n,
    sum(CAST(round(o_totalprice * 100) AS BIGINT)) s,
    sum(CAST(round(o_totalprice * 100) AS HUGEINT) * CAST(round(o_totalprice * 100) AS HUGEINT)) q
  FROM orders GROUP BY 1),
 t AS (SELECT sum(n) nn, sum(s) ss, CAST(count(*) AS BIGINT) k FROM g),
 parts AS (SELECT
     sum(CAST(g.s AS DOUBLE) * g.s / g.n)
       - max(CAST(t.ss AS DOUBLE) * t.ss / t.nn) ssb,
     sum(CAST(g.q AS DOUBLE)) - sum(CAST(g.s AS DOUBLE) * g.s / g.n) ssw,
     max(t.k) k, max(t.nn) nn
   FROM g, t)
SELECT CAST(k AS BIGINT) weekdays, CAST(nn AS BIGINT) n_orders,
  CAST(floor((ssb / (k - 1)) / (ssw / (nn - k)) * 1000 + 0.5) AS BIGINT) f_milli
FROM parts""",

    "expr_josephus" ->
      """WITH s AS (SELECT DISTINCT o_orderkey % 1000 + 2 n FROM orders),
 p AS (SELECT n, n | (n >> 1) | (n >> 2) | (n >> 4) | (n >> 8) | (n >> 16) sm FROM s),
 j AS (SELECT n, 2 * (n - ((sm >> 1) + 1)) + 1 pos FROM p)
SELECT CAST(pos // 100 AS BIGINT) band, CAST(count(*) AS BIGINT) seeds,
  CAST(min(n) AS BIGINT) min_n, CAST(max(n) AS BIGINT) max_n
FROM j GROUP BY 1 ORDER BY band""",

    "dq_checkdigit_mod97" ->
      """WITH c AS (SELECT o_orderkey n, 98 - (o_orderkey * 100) % 97 ck FROM orders)
SELECT CAST(ck AS BIGINT) check_digit, CAST(count(*) AS BIGINT) keys,
  CAST(sum(CASE WHEN (n * 100 + ck) % 97 = 1 THEN 1 ELSE 0 END) AS BIGINT) verified
FROM c GROUP BY 1 ORDER BY check_digit""",

    "orders_runs_test" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy, CAST(count(*) AS BIGINT) x
  FROM orders GROUP BY 1),
 md AS (SELECT sum(x) tot, CAST(count(*) AS BIGINT) nd FROM d),
 -- above-the-mean via integer cross-multiplication (exact; an avg()
 -- double could round differently across engines at a tied boundary)
 s AS (SELECT dy, CASE WHEN x * (SELECT nd FROM md) >= (SELECT tot FROM md)
                       THEN 1 ELSE 0 END side FROM d),
 r AS (SELECT side, CASE WHEN side <> lag(side) OVER (ORDER BY dy) THEN 1 ELSE 0 END brk FROM s),
 agg AS (SELECT CAST(sum(brk) + 1 AS DOUBLE) runs,
     CAST(sum(side) AS DOUBLE) n1, CAST(sum(1 - side) AS DOUBLE) n2 FROM r)
SELECT CAST(runs AS BIGINT) runs, CAST(n1 AS BIGINT) days_above,
  CAST(n2 AS BIGINT) days_below,
  CAST(floor((runs - (2 * n1 * n2 / (n1 + n2) + 1)) /
    sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) /
         ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))) * 1000 + 0.5) AS BIGINT) z_milli
FROM agg""",

    "ts_parkinson_vol" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy,
    strftime(CAST(o_orderdate AS DATE), '%Y-%m') mo,
    max(o_totalprice) hi, min(o_totalprice) lo
  FROM orders GROUP BY 1, 2)
SELECT mo AS month, CAST(count(*) AS BIGINT) n_days,
  CAST(floor(sqrt(sum(pow(ln(hi / lo), 2)) / (4 * ln(2) * count(*))) * 1000000 + 0.5) AS BIGINT) parkinson_micro
FROM d GROUP BY 1 ORDER BY month""",

  )
}
