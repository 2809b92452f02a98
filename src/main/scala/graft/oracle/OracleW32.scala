package graft.oracle

/** Round-17 wave-2 oracle SQL (DuckDB) — every query in
  * `ops/Metrics13.scala`. Validated against sf0.001 and sf0.01 before
  * the Spark implementations were written (the §2.1 pre-validation
  * loop; tools/draft_w32.py).
  */
object OracleW32 {
  val sql: Map[String, String] = Map(

    "ts_holt_linear" ->
      """WITH RECURSIVE d AS (SELECT CAST(o_orderdate AS DATE) dy, CAST(count(*) AS DOUBLE) x
  FROM orders GROUP BY 1),
 idx AS (SELECT x, row_number() OVER (ORDER BY dy) i FROM d),
 n AS (SELECT CAST(count(*) AS BIGINT) n FROM idx),
 hw AS (
   SELECT 2 AS i,
     (SELECT x FROM idx WHERE i = 2) AS lv,
     (SELECT x FROM idx WHERE i = 2) - (SELECT x FROM idx WHERE i = 1) AS tr
   UNION ALL
   SELECT hw.i + 1,
     0.3 * idx.x + 0.7 * (hw.lv + hw.tr),
     0.1 * (0.3 * idx.x + 0.7 * (hw.lv + hw.tr) - hw.lv) + 0.9 * hw.tr
   FROM hw JOIN idx ON idx.i = hw.i + 1)
SELECT (SELECT n FROM n) n_days,
  CAST(floor(lv * 1000 + 0.5) AS BIGINT) level_milli,
  CAST(floor(tr * 1000 + 0.5) AS BIGINT) trend_milli,
  CAST(floor((lv + 7 * tr) * 1000 + 0.5) AS BIGINT) forecast7_milli
FROM hw WHERE i = (SELECT n FROM n)""",

    "customer_kaplan_meier" ->
      """WITH u AS (SELECT o_custkey,
    CAST(date_diff('month', min(o_orderdate), max(o_orderdate)) AS BIGINT) t,
    CASE WHEN max(o_orderdate) <=
           (SELECT max(o_orderdate) - INTERVAL 365 DAY FROM orders)
         THEN 1 ELSE 0 END died
  FROM orders GROUP BY 1),
 risk AS (SELECT u.t, CAST(count(*) AS BIGINT) d,
     (SELECT CAST(count(*) AS BIGINT) FROM u u2 WHERE u2.t >= u.t) n
   FROM u WHERE died = 1 GROUP BY u.t),
 km AS (SELECT t, n AS at_risk, d AS deaths,
     exp(sum(ln(1.0 - CAST(d AS DOUBLE) / n)) OVER (ORDER BY t)) s
   FROM risk)
SELECT t AS month, at_risk, deaths,
  CAST(floor(s * 1000000 + 0.5) AS BIGINT) survival_micro
FROM km WHERE t <= 24 ORDER BY month""",

    "ml_ndcg_at_k" ->
      """WITH g AS (SELECT user_id, event_type,
    CAST(count(*) AS BIGINT) c,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) rel
  FROM events GROUP BY 1, 2),
 pr AS (SELECT user_id, rel, c,
    row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type) r_pred,
    row_number() OVER (PARTITION BY user_id ORDER BY rel DESC, event_type) r_ideal
  FROM g),
 dcg AS (SELECT user_id,
    sum(CASE WHEN r_pred <= 5 THEN rel / log2(r_pred + 1.0) ELSE 0 END) dcg,
    sum(CASE WHEN r_ideal <= 5 THEN rel / log2(r_ideal + 1.0) ELSE 0 END) idcg,
    CAST(sum(c) AS BIGINT) events FROM pr GROUP BY 1),
 nd AS (SELECT user_id, events // 20 band,
    CASE WHEN idcg > 0 THEN dcg / idcg ELSE 1.0 END nd FROM dcg)
SELECT CAST(band AS BIGINT) activity_band, CAST(count(*) AS BIGINT) users,
  CAST(floor(avg(nd) * 1000 + 0.5) AS BIGINT) avg_ndcg_milli
FROM nd GROUP BY 1 ORDER BY activity_band""",

    "text_chao1_richness" ->
      """WITH w AS (SELECT lang, string_split(text, ' ') ws FROM documents),
 b AS (SELECT lang, ws[i] || ' ' || ws[i + 1] bg
   FROM w, unnest(range(1, len(ws))) AS t(i)),
 f AS (SELECT lang, bg, CAST(count(*) AS BIGINT) c FROM b GROUP BY 1, 2),
 s AS (SELECT lang, CAST(count(*) AS BIGINT) s_obs,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) f1,
    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) f2
  FROM f GROUP BY 1)
SELECT lang, s_obs, f1, f2,
  CAST(s_obs + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT) chao1_est
FROM s ORDER BY lang""",

    "nation_kendall_w" ->
      """WITH m AS (SELECT n.n_name nation,
    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) rev,
    sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) bal,
    CAST(count(DISTINCT c.c_custkey) AS BIGINT) ncust
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1),
 r AS (SELECT nation,
    row_number() OVER (ORDER BY rev DESC, nation) +
    row_number() OVER (ORDER BY bal DESC, nation) +
    row_number() OVER (ORDER BY ncust DESC, nation) rsum
  FROM m),
 agg AS (SELECT rsum, (SELECT CAST(count(*) AS BIGINT) FROM r) n FROM r)
SELECT max(n) AS nations,
  CAST((3000 * sum((2 * rsum - 3 * (n + 1)) * (2 * rsum - 3 * (n + 1))))
    // (36 * (max(n) * max(n) * max(n) - max(n))) AS BIGINT) w_milli
FROM agg""",

    "alloc_sainte_lague" ->
      """WITH v AS (SELECT n.n_name nation,
    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) votes
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey GROUP BY 1),
 q AS (SELECT nation, votes, votes // (2 * d.i + 1) quot, d.i
   FROM v JOIN (SELECT unnest(range(0, 1000)) i) d ON true),
 top AS (SELECT nation FROM q ORDER BY quot DESC, nation, i LIMIT 1000)
SELECT nation, CAST(count(*) AS BIGINT) seats,
  CAST(max(v.votes) AS BIGINT) AS votes_cents
FROM top JOIN v USING (nation) GROUP BY 1 ORDER BY nation""",

    "li_leadtime_weibull" ->
      """WITH lt AS (SELECT l.l_returnflag flag,
    CAST(date_diff('day', o.o_orderdate, l.l_shipdate) + 1 AS BIGINT) t,
    l.l_orderkey ok, l.l_linenumber ln
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= o.o_orderdate),
 rk AS (SELECT flag, t,
    row_number() OVER (PARTITION BY flag ORDER BY t, ok, ln) i,
    CAST(count(*) OVER (PARTITION BY flag) AS BIGINT) n
  FROM lt),
 xy AS (SELECT flag, ln(CAST(t AS DOUBLE)) x,
    ln(-ln(1.0 - (i - 0.3) / (n + 0.4))) y FROM rk),
 ols AS (SELECT flag, CAST(count(*) AS BIGINT) n,
    (avg(x * y) - avg(x) * avg(y)) / (avg(x * x) - avg(x) * avg(x)) k,
    avg(y) my, avg(x) mx FROM xy GROUP BY 1)
SELECT flag AS returnflag, n AS lines,
  CAST(floor(k * 1000 + 0.5) AS BIGINT) shape_milli,
  CAST(floor(exp(mx - my / k) * 1000 + 0.5) AS BIGINT) scale_milli
FROM ols ORDER BY returnflag""",

    "li_bartlett_k2" ->
      """WITH lt AS (SELECT l.l_returnflag flag,
    CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) t
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
 g AS (SELECT flag, CAST(count(*) AS BIGINT) n, sum(t) s, sum(t * t) q FROM lt GROUP BY 1),
 v AS (SELECT flag, n, (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1) s2 FROM g),
 tot AS (SELECT CAST(sum(n) AS BIGINT) nn, CAST(count(*) AS BIGINT) k,
    sum((n - 1) * s2) / sum(n - 1) sp2, sum((n - 1) * ln(s2)) lnsum FROM v)
SELECT k AS groups, nn AS n_lines,
  CAST(floor(((nn - k) * ln(sp2) - lnsum) /
    (1 + (CAST((SELECT sum(1.0 / (n - 1)) FROM v) AS DOUBLE) - 1.0 / (nn - k))
       / (3 * (k - 1))) * 1000 + 0.5) AS BIGINT) k2_milli
FROM tot""",

    "li_abc_xyz" ->
      """WITH rev AS (SELECT l_partkey pk,
    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) r
  FROM lineitem GROUP BY 1),
 tot AS (SELECT sum(r) tr FROM rev),
 abc AS (SELECT pk, CASE
     WHEN 100 * (sum(r) OVER (ORDER BY r DESC, pk)) <= 80 * (SELECT tr FROM tot) THEN 'A'
     WHEN 100 * (sum(r) OVER (ORDER BY r DESC, pk)) <= 95 * (SELECT tr FROM tot) THEN 'B'
     ELSE 'C' END cls FROM rev),
 mq AS (SELECT l_partkey pk, strftime(CAST(l_shipdate AS DATE), '%Y-%m') mo,
    sum(CAST(round(l_quantity) AS BIGINT)) q
  FROM lineitem GROUP BY 1, 2),
 cv AS (SELECT pk, CAST(count(*) AS BIGINT) n, sum(q) s, sum(q * q) qq FROM mq GROUP BY 1),
 xyz AS (SELECT pk, CASE
     WHEN 4 * (n * qq - s * s) <= s * s THEN 'X'       -- cv^2 <= 1/4
     WHEN n * qq - s * s <= s * s THEN 'Y'             -- cv^2 <= 1
     ELSE 'Z' END cls FROM cv)
SELECT abc.cls AS abc, xyz.cls AS xyz, CAST(count(*) AS BIGINT) parts
FROM abc JOIN xyz USING (pk) GROUP BY 1, 2 ORDER BY abc, xyz""",

    "li_newsvendor_qty" ->
      """WITH d AS (SELECT p.p_brand brand, CAST(l.l_shipdate AS DATE) dy,
    sum(CAST(round(l.l_quantity) AS BIGINT)) q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1, 2)
SELECT brand, CAST(count(*) AS BIGINT) n_days,
  CAST(quantile_disc(q, 0.8) AS BIGINT) q80,
  CAST(max(q) AS BIGINT) peak
FROM d GROUP BY 1 ORDER BY brand""",

  )
}
