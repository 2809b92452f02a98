package graft.oracle

/** Round-16 wave-3 oracle SQL (DuckDB) — every query in
  * `ops/Metrics11.scala`. Validated against sf0.001 and sf0.01 before
  * the Spark implementations were written (the §2.1 pre-validation loop).
  */
object OracleW30 {
  val sql: Map[String, String] = Map(

    "events_type_user_jaccard" ->
      """WITH u AS (SELECT DISTINCT event_type et, user_id FROM events),
 n AS (SELECT et, CAST(count(*) AS BIGINT) c FROM u GROUP BY 1),
 i AS (SELECT a.et ea, b.et eb, CAST(count(*) AS BIGINT) inter
   FROM u a JOIN u b ON a.user_id = b.user_id AND a.et < b.et GROUP BY 1, 2)
SELECT i.ea AS type_a, i.eb AS type_b, i.inter AS users_both,
  CAST(na.c + nb.c - i.inter AS BIGINT) users_either,
  CAST((1000000 * i.inter) // (na.c + nb.c - i.inter) AS BIGINT) jaccard_ppm
FROM i JOIN n na ON i.ea = na.et JOIN n nb ON i.eb = nb.et
ORDER BY type_a, type_b""",

    "date_zeller_congruence" ->
      """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) dy FROM orders),
 z AS (SELECT dy,
    CASE WHEN month(dy) <= 2 THEN month(dy) + 12 ELSE month(dy) END m,
    CASE WHEN month(dy) <= 2 THEN year(dy) - 1 ELSE year(dy) END y,
    day(dy) q FROM d),
 h AS (SELECT dy,
    (q + (13*(m + 1)) // 5 + (y % 100) + (y % 100) // 4
       + (y // 100) // 4 + 5*(y // 100)) % 7 zh
   FROM z)
SELECT CAST(zh AS BIGINT) zeller_h, CAST(count(*) AS BIGINT) n_days,
  CAST(sum(CASE WHEN (zh + 5) % 7 + 1 = isodow(dy) THEN 1 ELSE 0 END) AS BIGINT) agree_builtin
FROM h GROUP BY 1 ORDER BY zeller_h""",

    "graph_bipartite_density" ->
      """WITH e AS (SELECT DISTINCT p.p_brand brand, l.l_partkey pk, l.l_suppkey sk
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
 agg AS (SELECT brand, CAST(count(*) AS BIGINT) edges,
    CAST(count(DISTINCT pk) AS BIGINT) parts,
    CAST(count(DISTINCT sk) AS BIGINT) suppliers
   FROM e GROUP BY 1)
SELECT brand, edges, parts, suppliers,
  CAST((1000000 * edges) // (parts * suppliers) AS BIGINT) density_ppm
FROM agg ORDER BY brand""",

    "expr_base36_digits" ->
      """WITH b AS (SELECT to_base(o_orderkey, 36) s FROM orders WHERE o_orderkey > 0)
SELECT substr(s, 1, 1) lead_digit, CAST(length(s) AS BIGINT) len,
  CAST(count(*) AS BIGINT) keys
FROM b GROUP BY 1, 2 ORDER BY lead_digit, len""",

    "dq_checkdigit_mod11" ->
      """WITH s AS (SELECT o_orderkey kk, o_orderpriority pr,
    CAST((SELECT sum(((kk // CAST(pow(10, i) AS BIGINT)) % 10) * (i + 2))
          FROM (SELECT unnest(range(0, 10)) i)) AS BIGINT) wsum
  FROM orders)
SELECT pr AS priority, CAST(wsum % 11 AS BIGINT) check_digit,
  CAST(count(*) AS BIGINT) n
FROM s GROUP BY 1, 2 ORDER BY priority, check_digit""",

    "ts_dow_residual_bands" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dy,
    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) v
  FROM orders GROUP BY 1),
 w AS (SELECT dy, v, isodow(dy) dow FROM d),
 g AS (SELECT dow, CAST(sum(v) AS BIGINT) tot, CAST(count(*) AS BIGINT) n FROM w GROUP BY 1),
 r AS (SELECT w.dow, CAST((10 * w.v * g.n) // g.tot AS BIGINT) band
   FROM w JOIN g ON w.dow = g.dow)
SELECT CAST(dow AS BIGINT) dow, CAST(least(band, 20) AS BIGINT) ratio_band,
  CAST(count(*) AS BIGINT) n_days
FROM r GROUP BY 1, 2 ORDER BY dow, ratio_band""",

  )
}
