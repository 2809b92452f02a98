package graft.oracle

/** Round-16 wave-2 oracle SQL (DuckDB) — every query in
  * `ops/Metrics10.scala`. Validated against sf0.001 and sf0.01 before
  * the Spark implementations were written (the §2.1 pre-validation loop).
  */
object OracleW29 {
  val sql: Map[String, String] = Map(

    "orders_priority_runlength" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy, o_orderpriority pr,
    CAST(count(*) AS BIGINT) c FROM orders GROUP BY 1, 2),
 m AS (SELECT dy, pr FROM (SELECT dy, pr,
     row_number() OVER (PARTITION BY dy ORDER BY c DESC, pr) rk FROM d) WHERE rk = 1),
 r AS (SELECT dy, pr,
    row_number() OVER (ORDER BY dy) - row_number() OVER (PARTITION BY pr ORDER BY dy) grp
   FROM m),
 runs AS (SELECT pr, grp, CAST(count(*) AS BIGINT) len FROM r GROUP BY 1, 2)
SELECT pr AS priority, CAST(count(*) AS BIGINT) runs,
  CAST(max(len) AS BIGINT) longest, CAST(sum(len) AS BIGINT) total_days
FROM runs GROUP BY 1 ORDER BY priority""",

    "date_friday13_census" ->
      """WITH t AS (SELECT year(o_orderdate) yr,
    CASE WHEN day(o_orderdate) = 13 AND isodow(CAST(o_orderdate AS DATE)) = 5
         THEN 1 ELSE 0 END f13 FROM orders)
SELECT CAST(yr AS BIGINT) yr, CAST(sum(f13) AS BIGINT) fri13_orders,
  CAST(count(*) AS BIGINT) total_orders,
  CAST((1000000 * sum(f13)) // count(*) AS BIGINT) f13_ppm
FROM t GROUP BY 1 ORDER BY yr""",

    "graph_katz_2hop" ->
      """WITH e AS (SELECT DISTINCT sn.n_name src, cn.n_name dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  WHERE sn.n_name <> cn.n_name),
 p1 AS (SELECT src, CAST(count(*) AS BIGINT) c1 FROM e GROUP BY 1),
 p2 AS (SELECT a.src, CAST(count(*) AS BIGINT) c2 FROM e a JOIN e b ON a.dst = b.src GROUP BY 1)
SELECT p1.src AS nation, p1.c1 AS walks1, COALESCE(p2.c2, 0) AS walks2,
  CAST(1000 * p1.c1 + 500 * COALESCE(p2.c2, 0) AS BIGINT) katz_milli
FROM p1 LEFT JOIN p2 ON p1.src = p2.src ORDER BY nation""",

    "dq_checkdigit_damm" ->
      """WITH dm AS (SELECT [0,3,1,7,5,9,8,6,4,2,
                    7,0,9,2,1,5,4,8,6,3,
                    4,2,0,6,8,7,1,3,5,9,
                    1,7,5,0,9,8,3,4,2,6,
                    6,1,2,3,0,4,5,9,7,8,
                    3,6,7,4,2,0,9,5,8,1,
                    5,8,6,9,7,2,0,1,3,4,
                    8,9,4,5,3,6,2,0,1,7,
                    9,4,3,8,6,1,7,2,0,5,
                    2,5,8,1,4,3,6,7,9,0] t),
 k AS (SELECT o_orderkey kk FROM orders),
 s0 AS (SELECT kk, 0 i FROM k),
 s1 AS (SELECT kk, t[i*10 + CAST((kk // 100000000000) % 10 AS INT) + 1] i FROM s0, dm),
 s2 AS (SELECT kk, t[i*10 + CAST((kk // 10000000000) % 10 AS INT) + 1] i FROM s1, dm),
 s3 AS (SELECT kk, t[i*10 + CAST((kk // 1000000000) % 10 AS INT) + 1] i FROM s2, dm),
 s4 AS (SELECT kk, t[i*10 + CAST((kk // 100000000) % 10 AS INT) + 1] i FROM s3, dm),
 s5 AS (SELECT kk, t[i*10 + CAST((kk // 10000000) % 10 AS INT) + 1] i FROM s4, dm),
 s6 AS (SELECT kk, t[i*10 + CAST((kk // 1000000) % 10 AS INT) + 1] i FROM s5, dm),
 s7 AS (SELECT kk, t[i*10 + CAST((kk // 100000) % 10 AS INT) + 1] i FROM s6, dm),
 s8 AS (SELECT kk, t[i*10 + CAST((kk // 10000) % 10 AS INT) + 1] i FROM s7, dm),
 s9 AS (SELECT kk, t[i*10 + CAST((kk // 1000) % 10 AS INT) + 1] i FROM s8, dm),
 sa AS (SELECT kk, t[i*10 + CAST((kk // 100) % 10 AS INT) + 1] i FROM s9, dm),
 sb AS (SELECT kk, t[i*10 + CAST((kk // 10) % 10 AS INT) + 1] i FROM sa, dm),
 sc AS (SELECT kk, t[i*10 + CAST(kk % 10 AS INT) + 1] i FROM sb, dm)
SELECT CAST(i AS BIGINT) check_digit, CAST(count(*) AS BIGINT) keys,
  CAST(min(kk) AS BIGINT) min_key
FROM sc GROUP BY 1 ORDER BY check_digit""",

    "ts_mann_kendall" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy,
    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) v
  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
 p AS (SELECT CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END sg
   FROM d a JOIN d b ON b.dy > a.dy)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) n,
  CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) concordant,
  CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) discordant,
  CAST(sum(sg) AS BIGINT) s
FROM p""",

    "graph_clustering_coefficient" ->
      """WITH e0 AS (SELECT DISTINCT sn.n_name src, cn.n_name dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  WHERE sn.n_name <> cn.n_name),
 und AS (SELECT DISTINCT least(src, dst) a, greatest(src, dst) b FROM e0),
 nb AS (SELECT a v, b u FROM und UNION ALL SELECT b v, a u FROM und),
 deg AS (SELECT v, CAST(count(*) AS BIGINT) dg FROM nb GROUP BY 1),
 tri AS (SELECT n1.v, CAST(count(*) AS BIGINT) t FROM nb n1
   JOIN nb n2 ON n1.v = n2.v AND n1.u < n2.u
   JOIN und e ON e.a = n1.u AND e.b = n2.u GROUP BY 1)
SELECT deg.v AS nation, deg.dg AS degree, COALESCE(tri.t, 0) AS triangles,
  CAST(CASE WHEN deg.dg >= 2
    THEN (2000000 * COALESCE(tri.t, 0)) // (deg.dg * (deg.dg - 1))
    ELSE 0 END AS BIGINT) coeff_ppm
FROM deg LEFT JOIN tri ON deg.v = tri.v ORDER BY nation""",

    "ml_kendall_tau_nation" ->
      """WITH a AS (SELECT n.n_name nation,
    CAST(sum(CAST(round(c.c_acctbal*100) AS BIGINT)) AS BIGINT) bal,
    CAST(count(*) AS BIGINT) nc
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY 1),
 r AS (SELECT n.n_name nation,
    CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY 1),
 j AS (SELECT a.nation, a.bal, a.nc, COALESCE(r.rev, 0) rev
   FROM a LEFT JOIN r ON a.nation = r.nation),
 p AS (SELECT CAST(sign(x.bal * y.nc - y.bal * x.nc) AS BIGINT)
          * CAST(sign(x.rev - y.rev) AS BIGINT) sg
   FROM j x JOIN j y ON x.nation < y.nation)
SELECT CAST((SELECT count(*) FROM j) AS BIGINT) nations,
  CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) concordant,
  CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) discordant,
  CAST(sum(sg) AS BIGINT) s
FROM p""",

    "events_transition_entropy" ->
      """WITH s AS (SELECT event_type et,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) nxt
  FROM events),
 c AS (SELECT et, nxt, CAST(count(*) AS BIGINT) c FROM s
   WHERE nxt IS NOT NULL GROUP BY 1, 2),
 p AS (SELECT et, c, c / (sum(c) OVER (PARTITION BY et)) p FROM c)
SELECT et AS event_type, CAST(sum(c) AS BIGINT) transitions,
  CAST(floor(-sum(p * log2(p)) * 1000 + 0.5) AS BIGINT) h_milli
FROM p GROUP BY 1 ORDER BY event_type""",

    "expr_collatz_steps" ->
      """WITH RECURSIVE seed AS (SELECT DISTINCT CAST(o_orderkey % 1000 + 2 AS BIGINT) k FROM orders),
 c AS (SELECT k, k v, 0 steps FROM seed
   UNION ALL
   SELECT k, CASE WHEN v % 2 = 0 THEN v // 2 ELSE 3*v + 1 END, steps + 1
   FROM c WHERE v <> 1 AND steps < 300),
 f AS (SELECT k, CAST(max(steps) AS BIGINT) st FROM c WHERE v = 1 GROUP BY 1)
SELECT CAST(st // 20 AS BIGINT) band, CAST(count(*) AS BIGINT) keys,
  CAST(min(st) AS BIGINT) min_steps, CAST(max(st) AS BIGINT) max_steps
FROM f GROUP BY 1 ORDER BY band""",

    "alloc_greedy_knapsack" ->
      """WITH it AS (SELECT p_type item, CAST(sum(p_size) AS BIGINT) w,
    CAST(sum(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT) v
  FROM part GROUP BY 1 HAVING sum(p_size) > 0),
 cap AS (SELECT CAST(sum(w) // 2 AS BIGINT) cp FROM it),
 o AS (SELECT item, w, v,
    CAST(sum(w) OVER (ORDER BY (10000 * v) // w DESC, item
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) run
   FROM it),
 ch AS (SELECT o.* FROM o, cap WHERE o.run <= cap.cp)
SELECT CAST(count(*) AS BIGINT) chosen, CAST(sum(w) AS BIGINT) weight_used,
  CAST(sum(v) AS BIGINT) value_cents,
  CAST((SELECT count(*) FROM it) AS BIGINT) items,
  CAST((SELECT cp FROM cap) AS BIGINT) capacity
FROM ch""",

  )
}
