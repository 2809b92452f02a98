package graft.oracle

/** Round-14 wave oracle SQL (DuckDB) — every query in
  * `ops/Metrics6.scala`. Validated against sf0.001 before the Spark
  * implementations were written (the §2.1 pre-validation loop).
  */
object OracleW25 {
  val sql: Map[String, String] = Map(

    "events_props_value_bands" ->
      """WITH t AS (SELECT event_type,
    CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT) k FROM events)
  SELECT event_type, CAST(k // 10 AS BIGINT) band,
    CAST(count(*) AS BIGINT) n, CAST(sum(k) AS BIGINT) sum_k
  FROM t GROUP BY 1, 2 ORDER BY 1, 2""",

    "embedding_label_coherence" ->
      """WITH v AS (SELECT "label" lbl, embedding::DOUBLE[] ve FROM embeddings),
  q AS (SELECT lbl, r.i pos, CAST(floor(ve[r.i] * 1000 + 0.5) AS BIGINT) qv
        FROM v, range(1, 65) r(i)),
  sp AS (SELECT lbl, pos, CAST(sum(qv) AS BIGINT) s,
         sum(qv::HUGEINT * qv) ss FROM q GROUP BY 1, 2),
  pl AS (SELECT lbl, sum(s::HUGEINT * s) s2, sum(ss) ssall FROM sp GROUP BY 1),
  n AS (SELECT "label" lbl, CAST(count(*) AS BIGINT) n_vecs FROM embeddings GROUP BY 1)
  SELECT pl.lbl, n_vecs, CAST(s2 - ssall AS BIGINT) coh_num,
    CAST(n_vecs * (n_vecs - 1) AS BIGINT) pair_count
  FROM pl JOIN n ON pl.lbl = n.lbl ORDER BY 1""",

    "orders_daily_count_autocorr" ->
      """WITH d AS (SELECT o_orderdate dd, CAST(count(*) AS BIGINT) n
    FROM orders GROUP BY 1),
  p AS (SELECT n x, lead(n) OVER (ORDER BY dd) y FROM d),
  v AS (SELECT x, y FROM p WHERE y IS NOT NULL)
  SELECT CAST(count(*) AS BIGINT) n_pairs,
    CAST(count(*)::HUGEINT * sum(x::HUGEINT * y) - sum(x)::HUGEINT * sum(y) AS BIGINT) num,
    CAST(count(*)::HUGEINT * sum(x::HUGEINT * x) - sum(x)::HUGEINT * sum(x) AS BIGINT) den_x,
    CAST(count(*)::HUGEINT * sum(y::HUGEINT * y) - sum(y)::HUGEINT * sum(y) AS BIGINT) den_y
  FROM v""",

    "text_char_trigram_topk" ->
      """WITH s AS (SELECT lang, substr(text, 1, 120) h FROM documents
    WHERE len(substr(text, 1, 120)) >= 3),
  g AS (SELECT lang, substr(h, i, 3) gram
        FROM s, range(1, 119) t(i) WHERE len(h) >= i + 2),
  c AS (SELECT lang, gram, CAST(count(*) AS BIGINT) n FROM g GROUP BY 1, 2),
  r AS (SELECT lang, gram, n,
        row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram) rn FROM c)
  SELECT lang, CAST(rn AS BIGINT) rn, gram, n FROM r WHERE rn <= 30
  ORDER BY lang, rn""",

    "li_ship_dow_profile" ->
      """WITH t AS (SELECT CAST(isodow(l_shipdate) % 7 + 1 AS BIGINT) dow,
      CAST(round(l_extendedprice * 100) AS BIGINT) cents FROM lineitem),
  a AS (SELECT dow, CAST(count(*) AS BIGINT) n_lines,
        CAST(sum(cents) AS BIGINT) rev_cents FROM t GROUP BY 1),
  tot AS (SELECT sum(rev_cents) tr FROM a)
  SELECT dow, n_lines, rev_cents,
    CAST(rev_cents::HUGEINT * 1000000 // tr AS BIGINT) share_ppm
  FROM a, tot ORDER BY dow""",

    "customer_debit_share_matrix" ->
      """WITH t AS (SELECT n_name nation, c_mktsegment seg,
      CAST(round(c_acctbal * 100) AS BIGINT) c
    FROM customer JOIN nation ON c_nationkey = n_nationkey)
  SELECT nation, seg, CAST(count(*) AS BIGINT) n_customers,
    CAST(sum(CASE WHEN c < 0 THEN 1 ELSE 0 END) AS BIGINT) n_debit,
    CAST(sum(CASE WHEN c < 0 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) debit_ppm,
    CAST(sum(CASE WHEN c < 0 THEN c ELSE 0 END) AS BIGINT) debit_cents
  FROM t GROUP BY 1, 2 ORDER BY 1, 2""",

    "orders_quarter_top_customers" ->
      """WITH a AS (SELECT CAST(year(o_orderdate) * 10 + quarter(o_orderdate) AS BIGINT) yq,
      o_custkey ck,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) rev
    FROM orders GROUP BY 1, 2),
  r AS (SELECT yq, ck, rev,
        row_number() OVER (PARTITION BY yq ORDER BY rev DESC, ck) rn FROM a)
  SELECT yq, CAST(rn AS BIGINT) rn, ck, rev FROM r WHERE rn <= 3
  ORDER BY yq, rn""",

    "events_session_gap_census" ->
      """WITH g AS (SELECT user_id,
      CAST(epoch_us(ts) AS BIGINT) - lag(CAST(epoch_us(ts) AS BIGINT))
        OVER (PARTITION BY user_id ORDER BY ts, event_id) gap_us
    FROM events),
  b AS (SELECT CAST(least(gap_us // 60000000, 120) AS BIGINT) gap_min
        FROM g WHERE gap_us IS NOT NULL)
  SELECT gap_min, CAST(count(*) AS BIGINT) n FROM b
  GROUP BY 1 ORDER BY 1""",

    "orders_month_end_effect" ->
      """WITH t AS (SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) ym,
      CASE WHEN datediff('day', o_orderdate, last_day(o_orderdate)) < 3
           THEN 1 ELSE 0 END tail3,
      CAST(day(last_day(o_orderdate)) AS BIGINT) dim
    FROM orders)
  SELECT ym, CAST(count(*) AS BIGINT) n_orders,
    CAST(sum(tail3) AS BIGINT) n_tail3,
    CAST(sum(tail3) * 1000000 // count(*) AS BIGINT) tail3_ppm,
    CAST(3 * 1000000 // max(dim) AS BIGINT) expected_ppm
  FROM t GROUP BY 1 ORDER BY 1""",

    "subq_exists_select_list" ->
      """WITH t AS (SELECT o_orderpriority pri,
      CAST(EXISTS(SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        AS BIGINT) has_return
    FROM orders)
  SELECT pri, has_return, CAST(count(*) AS BIGINT) n
  FROM t GROUP BY 1, 2 ORDER BY 1, 2""")
}
