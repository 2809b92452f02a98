package graft.oracle

/** Round-15 wave oracle SQL (DuckDB) — every query in
  * `ops/Metrics7.scala`. Validated against sf0.001 and sf0.01 before
  * the Spark implementations were written (the §2.1 pre-validation
  * loop).
  */
object OracleW26 {
  val sql: Map[String, String] = Map(

    "privacy_k_anonymity" ->
      """WITH cls AS (SELECT c_nationkey, c_mktsegment,
      ((CAST(round(c_acctbal*100) AS BIGINT) + 100000) // 100000) bal_band,
      count(*) k FROM customer GROUP BY 1, 2, 3)
  SELECT least(k, 10) k_cap, CAST(count(*) AS BIGINT) classes,
    CAST(sum(k) AS BIGINT) n_rows
  FROM cls GROUP BY 1 ORDER BY k_cap""",

    "privacy_l_diversity" ->
      """WITH cls AS (SELECT date_trunc('month', o_orderdate) m, o_orderpriority,
      count(DISTINCT o_orderstatus) l, count(*) n FROM orders GROUP BY 1, 2)
  SELECT CAST(l AS BIGINT) l, CAST(count(*) AS BIGINT) classes,
    CAST(sum(n) AS BIGINT) n_orders
  FROM cls GROUP BY 1 ORDER BY l""",

    "corpus_softdedup_weights" ->
      """WITH c AS (SELECT md5(substr(text, 1, 64)) h, count(*) sz
       FROM documents GROUP BY 1),
  d AS (SELECT dd.source, CAST(round(1000000.0 / c.sz) AS BIGINT) w_ppm
        FROM documents dd JOIN c ON md5(substr(dd.text, 1, 64)) = c.h)
  SELECT source, CAST(count(*) AS BIGINT) docs,
    CAST(sum(w_ppm) AS BIGINT) eff_docs_ppm
  FROM d GROUP BY source ORDER BY source""",

    "orders_queue_backlog" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
      CAST(count(*) AS BIGINT) arr FROM orders GROUP BY 1),
  cap AS (SELECT (CAST(sum(arr) AS BIGINT) + count(*) - 1) // count(*) c FROM daily),
  s AS (SELECT d, arr, sum(arr - (SELECT c FROM cap)) OVER (ORDER BY d) cum FROM daily),
  b AS (SELECT d, arr, cum - least(min(cum) OVER (ORDER BY d), 0) backlog FROM s)
  SELECT CAST(CAST(date_trunc('month', d) AS DATE) AS VARCHAR) AS month,
    CAST(max(backlog) AS BIGINT) peak_backlog,
    CAST(sum(CASE WHEN backlog > 0 THEN 1 ELSE 0 END) AS BIGINT) backlogged_days
  FROM b GROUP BY 1 ORDER BY month""",

    "alloc_largest_remainder" ->
      """WITH rev AS (SELECT n.n_name nation,
      CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY 1),
  t AS (SELECT CAST(sum(cents) AS BIGINT) tot FROM rev),
  q AS (SELECT nation, cents,
        CAST((1000 * cents) // (SELECT tot FROM t) AS BIGINT) base,
        CAST((1000 * cents) % (SELECT tot FROM t) AS BIGINT) rem FROM rev),
  l AS (SELECT CAST(1000 - sum(base) AS BIGINT) leftover FROM q),
  r AS (SELECT nation, cents, base,
        row_number() OVER (ORDER BY rem DESC, nation) rk FROM q)
  SELECT nation, cents,
    CAST(base + CASE WHEN rk <= (SELECT leftover FROM l) THEN 1 ELSE 0 END AS BIGINT) seats
  FROM r ORDER BY nation""",

    "dq_luhn_mod10" ->
      """SELECT o_orderpriority priority,
    CAST((10 - list_sum([CASE WHEN i % 2 = 0
        THEN CASE WHEN 2*((o_orderkey // CAST(pow(10, i) AS BIGINT)) % 10) > 9
                  THEN 2*((o_orderkey // CAST(pow(10, i) AS BIGINT)) % 10) - 9
                  ELSE 2*((o_orderkey // CAST(pow(10, i) AS BIGINT)) % 10) END
        ELSE (o_orderkey // CAST(pow(10, i) AS BIGINT)) % 10 END
      FOR i IN range(0, 12)]) % 10) % 10 AS BIGINT) check_digit,
    CAST(count(*) AS BIGINT) n
  FROM orders GROUP BY 1, 2 ORDER BY priority, check_digit""",

    "expr_morton_interleave" ->
      """WITH z AS (SELECT
      list_sum([(((l_partkey % 256) >> i) & 1) * CAST(pow(2, 2*i) AS BIGINT)
                + (((l_suppkey % 256) >> i) & 1) * CAST(pow(2, 2*i+1) AS BIGINT)
                FOR i IN range(0, 8)]) zv,
      CAST(l_quantity AS BIGINT) q FROM lineitem)
  SELECT CAST(zv // 1024 AS BIGINT) bucket, CAST(count(*) AS BIGINT) n,
    CAST(sum(q) AS BIGINT) qty
  FROM z GROUP BY 1 ORDER BY bucket""",

    "graph_minplus_3hop" ->
      """WITH edge AS (SELECT sn.n_name src, cn.n_name dst,
      CAST(min(date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE))) AS BIGINT) w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      WHERE sn.n_nationkey <> cn.n_nationkey AND l.l_shipdate >= o.o_orderdate
      GROUP BY 1, 2),
  two AS (SELECT a.src, b.dst, min(a.w + b.w) w
          FROM edge a JOIN edge b ON a.dst = b.src WHERE a.src <> b.dst GROUP BY 1, 2),
  upto2 AS (SELECT src, dst, min(w) w FROM
            (SELECT * FROM edge UNION ALL SELECT * FROM two) GROUP BY 1, 2),
  three AS (SELECT a.src, b.dst, min(a.w + b.w) w
            FROM upto2 a JOIN edge b ON a.dst = b.src WHERE a.src <> b.dst GROUP BY 1, 2)
  SELECT src, dst, CAST(min(w) AS BIGINT) mincost
  FROM (SELECT * FROM upto2 UNION ALL SELECT * FROM three) GROUP BY 1, 2
  ORDER BY src, dst""",

    "date_tz_offset_hours" ->
      """SELECT tz_off, CAST(hr AS BIGINT) hr, CAST(count(*) AS BIGINT) n FROM (
    SELECT '+05:30' AS tz_off, extract(hour FROM ts + INTERVAL 330 MINUTE) hr FROM events
    UNION ALL
    SELECT '-08:00' AS tz_off, extract(hour FROM ts - INTERVAL 480 MINUTE) hr FROM events) u
  GROUP BY 1, 2 ORDER BY tz_off, hr""",

    "events_bot_flag_census" ->
      """WITH pm AS (SELECT user_id, date_trunc('minute', ts) m, count(*) c
       FROM events GROUP BY 1, 2),
  u AS (SELECT user_id, count(*) n, count(DISTINCT event_type) d
        FROM events GROUP BY 1),
  mx AS (SELECT user_id, max(c) maxpm FROM pm GROUP BY 1)
  SELECT CASE WHEN n >= 75 OR maxpm >= 2 THEN 1 ELSE 0 END is_bot,
    CAST(n // 10 AS BIGINT) band,
    CAST(count(*) AS BIGINT) users, CAST(sum(n) AS BIGINT) events
  FROM u JOIN mx USING (user_id) GROUP BY 1, 2 ORDER BY is_bot, band""",

    "li_fifo_allocation" ->
      """WITH x AS (SELECT l_linenumber, CAST(l_quantity AS BIGINT) q,
      coalesce(sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_orderkey
        ORDER BY l_linenumber, l_partkey, l_suppkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) bef
      FROM lineitem),
  a AS (SELECT l_linenumber, q, greatest(least(60 - bef, q), 0) alloc FROM x)
  SELECT CAST(l_linenumber AS BIGINT) linenumber, CAST(count(*) AS BIGINT) lines,
    CAST(sum(q) AS BIGINT) demanded, CAST(sum(alloc) AS BIGINT) allocated,
    CAST(sum(CASE WHEN alloc = q THEN 1 ELSE 0 END) AS BIGINT) fully_served
  FROM a GROUP BY 1 ORDER BY linenumber""",

    "embedding_bucket_label_simpson" ->
      """WITH b AS (SELECT
      (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
    + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
    + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
    + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
    + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END) bucket, "label"
      FROM embeddings),
  c AS (SELECT bucket, "label", count(*) nl FROM b GROUP BY 1, 2),
  s AS (SELECT bucket, CAST(sum(nl*(nl-1)) AS BIGINT) num,
        CAST(sum(nl) AS BIGINT) n FROM c GROUP BY 1)
  SELECT CAST(bucket AS BIGINT) bucket, n, num,
    CASE WHEN n > 1 THEN CAST((1000000 * num) // (n*(n-1)) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END simpson_ppm
  FROM s ORDER BY bucket""",
  )
}
