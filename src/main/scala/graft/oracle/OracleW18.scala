package graft.oracle

/** Wave-18 oracle SQL (graft.ops.Insights) — validated DuckDB
  * equivalents per SURVEY §2.4. Negative-numerator ratios are
  * sign-split around `//` exactly as the Spark side sign-splits `div`;
  * >2^63 products run in HUGEINT mirroring Spark's DECIMAL(38).
  */
object OracleW18 {

  val sql: Map[String, String] = Map(
    "events_heatmap_dow_hour" ->
      """SELECT CAST(isodow(ts) AS BIGINT) iso_dow, CAST(hour(ts) AS BIGINT) hh,
    CAST(count(*) AS BIGINT) n,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) cents
  FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "agg_session_window_native" ->
      """WITH o AS (SELECT user_id, event_id, ts,
      epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) gap_us
    FROM events),
  m AS (SELECT user_id,
      CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END new_sess,
      ts, event_id FROM o),
  sids AS (SELECT user_id,
      sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sid
    FROM m),
  per AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) n_ev FROM sids GROUP BY 1, 2)
  SELECT user_id, CAST(count(*) AS BIGINT) n_sessions, CAST(sum(n_ev) AS BIGINT) n_events
  FROM per GROUP BY 1 ORDER BY 1""",
    "text_chunk_sliding" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') tk FROM documents),
  c AS (SELECT doc_id, tk,
      unnest(generate_series(0, greatest(0, (len(tk) - 32 + 23) // 24))) ci FROM t)
  SELECT doc_id, CAST(ci AS BIGINT) chunk_idx,
    CAST(ci * 24 + 1 AS BIGINT) tok_from,
    CAST(least(ci * 24 + 32, len(tk)) AS BIGINT) tok_to,
    array_to_string(tk[(CAST(ci * 24 + 1 AS INTEGER)):(CAST(least(ci * 24 + 32, len(tk)) AS INTEGER))], ' ') chunk,
    CAST(least(ci * 24 + 32, len(tk)) - (ci * 24 + 1) + 1 AS BIGINT) n_toks
  FROM c WHERE ci * 24 + 1 <= len(tk)
  ORDER BY doc_id, chunk_idx LIMIT 3000""",
    "text_dedup_normalized" ->
      """WITH h AS (SELECT doc_id,
      md5(array_to_string(list_sort(list_distinct(
        string_split_regex(trim(lower(text)), '\s+'))), ' ')) h FROM documents)
  SELECT h, CAST(count(*) AS BIGINT) n_docs, CAST(min(doc_id) AS BIGINT) canonical_doc
  FROM h GROUP BY 1 HAVING count(*) >= 2
  ORDER BY n_docs DESC, canonical_doc LIMIT 500""",
    "events_decayed_score" ->
      """WITH a AS (SELECT max(CAST(ts AS DATE)) asof_d FROM events),
  p AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) c,
      date_diff('day', CAST(ts AS DATE), asof_d) age_d
    FROM events CROSS JOIN a WHERE event_type = 'purchase')
  SELECT user_id, CAST(count(*) AS BIGINT) n_purchases,
    CAST(sum(c * (1::BIGINT << (29 - age_d))) AS BIGINT) decayed_score
  FROM p GROUP BY 1 ORDER BY decayed_score DESC, user_id LIMIT 100""",
    "ship_lag_histogram" ->
      """WITH t AS (SELECT l_returnflag,
      date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) lag_d
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
  SELECT l_returnflag, CAST((lag_d + 150) // 15 AS BIGINT) bucket,
    CAST(count(*) AS BIGINT) n,
    CAST(min(lag_d) AS BIGINT) min_lag, CAST(max(lag_d) AS BIGINT) max_lag
  FROM t GROUP BY 1, 2 ORDER BY 1, 2""",
    "text_vocab_growth" ->
      """WITH fd AS (SELECT tok, min(doc_id) first_doc FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents) GROUP BY 1),
  g AS (SELECT (first_doc // 100 + 1) * 100 milestone, CAST(count(*) AS BIGINT) new_types
    FROM fd GROUP BY 1)
  SELECT CAST(milestone AS BIGINT) milestone, new_types,
    CAST(sum(new_types) OVER (ORDER BY milestone ROWS UNBOUNDED PRECEDING) AS BIGINT) vocab_size
  FROM g ORDER BY 1""",
    "embedding_norm_stats" ->
      """WITH s AS (SELECT CAST("label" AS BIGINT) AS "label",
      list_sum(list_transform(embedding::DOUBLE[],
        x -> CAST(round(x * 1000) AS BIGINT) * CAST(round(x * 1000) AS BIGINT))) sq_norm
    FROM embeddings)
  SELECT "label", CAST(count(*) AS BIGINT) n, CAST(min(sq_norm) AS BIGINT) min_sq,
    CAST(max(sq_norm) AS BIGINT) max_sq, CAST(sum(sq_norm) AS BIGINT) total_sq
  FROM s GROUP BY 1 ORDER BY 1""",
    "events_error_budget" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) dd, CAST(count(*) AS BIGINT) n_events,
      CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) n_errors
    FROM events GROUP BY 1)
  SELECT dd, n_events, n_errors,
    CAST(n_errors * 1000000 // n_events AS BIGINT) err_ppm,
    CAST(CASE WHEN n_errors * 1000000 // n_events > 10000 THEN 1 ELSE 0 END AS BIGINT) over_budget,
    CAST(sum(n_errors) OVER (ORDER BY dd ROWS UNBOUNDED PRECEDING) * 1000000
         // sum(n_events) OVER (ORDER BY dd ROWS UNBOUNDED PRECEDING) AS BIGINT) cum_err_ppm
  FROM daily ORDER BY dd""",
    "agg_filter_clause" ->
      """SELECT o_orderpriority,
    CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) n_f,
    CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) n_big,
    CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) cents_open,
    CAST(count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) n_cust_f
  FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_bitmap_union_all" ->
      """SELECT o_orderpriority grp, CAST(count(DISTINCT o_custkey) AS BIGINT) n_cust
  FROM orders GROUP BY 1
  UNION ALL
  SELECT 'ALL', CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
  ORDER BY grp""",
    "date_make_funcs" ->
      """SELECT o_orderkey,
    make_date(CAST(year(od) AS INTEGER), CAST(month(od) AS INTEGER), 1) month_start,
    last_day(od) month_end,
    CAST(dayofyear(od) AS BIGINT) doy,
    CAST(weekofyear(od) AS BIGINT) iso_week,
    CAST(quarter(od) AS BIGINT) qtr,
    CAST((year(od) - 1995) * 12 + month(od) - 1 AS BIGINT) months_since_1995
  FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) od FROM orders)
  ORDER BY o_orderkey LIMIT 1000""",
    "expr_hash_funcs" ->
      """SELECT doc_id, md5(text) md5_hex, sha256(text) sha256_hex
  FROM documents ORDER BY doc_id LIMIT 500""",
    "gen_posexplode" ->
      """SELECT doc_id, CAST(u.pos AS BIGINT) pos, u.tok
  FROM (SELECT doc_id,
      unnest(list_transform(generate_series(1, len(t)),
        i -> struct_pack(pos := i - 1, tok := t[CAST(i AS INTEGER)]))) u
    FROM (SELECT doc_id, string_split(text, ' ') t FROM documents))
  ORDER BY doc_id, pos LIMIT 2000""",
    "ltv_cohort_revenue" ->
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) cohort_w
    FROM events WHERE event_type = 'signup' GROUP BY 1),
  p AS (SELECT f.cohort_w,
      date_diff('day', f.cohort_w, CAST(date_trunc('week', e.ts) AS DATE)) // 7 week_offset,
      e.value
    FROM events e JOIN f USING (user_id)
    WHERE e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= f.cohort_w),
  g AS (SELECT cohort_w, week_offset, CAST(count(*) AS BIGINT) n_purchases,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) cents
    FROM p GROUP BY 1, 2)
  SELECT cohort_w, CAST(week_offset AS BIGINT) week_offset, n_purchases, cents,
    CAST(sum(cents) OVER (PARTITION BY cohort_w ORDER BY week_offset
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) cum_cents
  FROM g ORDER BY 1, 2""",
    "basket_apriori_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey o, l_partkey p FROM lineitem),
  cx AS (SELECT p, CAST(count(*) AS BIGINT) cp FROM b GROUP BY 1),
  n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) n_baskets FROM b),
  pr AS (SELECT x.p p1, y.p p2, CAST(count(*) AS BIGINT) c_xy
    FROM b x JOIN b y ON x.o = y.o AND x.p < y.p GROUP BY 1, 2)
  SELECT p1, p2, c_xy,
    CAST(c_xy * 1000000 // c1.cp AS BIGINT) conf12_ppm,
    CAST(c_xy * 1000000 // c2.cp AS BIGINT) conf21_ppm,
    CAST((c_xy::HUGEINT * n_baskets * 1000000) // (c1.cp::HUGEINT * c2.cp) AS BIGINT) lift_ppm
  FROM pr JOIN cx c1 ON pr.p1 = c1.p JOIN cx c2 ON pr.p2 = c2.p CROSS JOIN n
  WHERE c_xy >= 3
  ORDER BY lift_ppm DESC, p1, p2 LIMIT 20""",
    "supplier_abc_class" ->
      """WITH rev AS (SELECT l_suppkey s,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) cents
    FROM lineitem GROUP BY 1),
  t AS (SELECT CAST(sum(cents) AS BIGINT) total FROM rev),
  r AS (SELECT s, cents,
      (sum(cents) OVER (ORDER BY cents DESC, s ROWS UNBOUNDED PRECEDING))::HUGEINT
        * 1000000 // total cum_ppm
    FROM rev CROSS JOIN t)
  SELECT CASE WHEN cum_ppm <= 800000 THEN 'A'
              WHEN cum_ppm <= 950000 THEN 'B' ELSE 'C' END cls,
    CAST(count(*) AS BIGINT) n_suppliers, CAST(sum(cents) AS BIGINT) cents
  FROM r GROUP BY 1 ORDER BY 1""",
    "customer_order_gaps" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) od FROM orders),
  g AS (SELECT o_custkey,
      date_diff('day', lag(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey), od) gap_d
    FROM o),
  a AS (SELECT o_custkey, list_sort(list(CAST(gap_d AS BIGINT))) gs
    FROM g WHERE gap_d IS NOT NULL GROUP BY 1)
  SELECT o_custkey, CAST(len(gs) AS BIGINT) n_gaps,
    CAST(gs[least(len(gs), len(gs) * 50 // 100 + 1)] AS BIGINT) median_gap_d,
    CAST(gs[-1] AS BIGINT) max_gap_d
  FROM a ORDER BY o_custkey LIMIT 1000""",
    "sql_pivot_syntax" ->
      """SELECT CAST(ts AS DATE) dd,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) n_click,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) n_purchase,
    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) n_signup,
    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) n_view,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) n_error
  FROM events GROUP BY 1 ORDER BY 1""",
    "sql_unpivot_syntax" ->
      """WITH t AS (SELECT lang, CAST(count(*) AS BIGINT) n_docs,
      CAST(sum(length(text)) AS BIGINT) total_chars,
      CAST(max(n_chars) AS BIGINT) max_meta_chars
    FROM documents GROUP BY 1)
  SELECT lang, 'n_docs' metric, n_docs AS "value" FROM t
  UNION ALL SELECT lang, 'total_chars', total_chars FROM t
  UNION ALL SELECT lang, 'max_meta_chars', max_meta_chars FROM t
  ORDER BY lang, metric""",
    "str_collation_distinct" ->
      """WITH n AS (SELECT c_custkey,
      CASE WHEN c_custkey % 2 = 0 THEN upper(n_name) ELSE lower(n_name) END name_cased
    FROM nation JOIN customer ON n_nationkey = c_nationkey)
  SELECT CAST(count(DISTINCT name_cased) AS BIGINT) n_case_sensitive,
    CAST(count(DISTINCT lower(name_cased)) AS BIGINT) n_case_insensitive,
    CAST(count(*) AS BIGINT) n_rows
  FROM n""",
    "events_markov_stationary" ->
      """WITH tr AS (SELECT i, j, CAST(count(*) AS BIGINT) c FROM (
      SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) i,
        event_type j FROM events)
    WHERE i IS NOT NULL GROUP BY 1, 2),
  rs AS (SELECT i, CAST(sum(c) AS BIGINT) r FROM tr GROUP BY 1),
  tm AS (SELECT tr.i, tr.j, c, r FROM tr JOIN rs USING (i)),
  nodes AS (SELECT DISTINCT i t FROM tm UNION SELECT DISTINCT j FROM tm),
  v0 AS (SELECT t, CAST(200000 AS BIGINT) v FROM nodes),
  v1 AS (SELECT j t, CAST(sum(v * c // r) AS BIGINT) v FROM tm JOIN v0 ON tm.i = v0.t GROUP BY 1),
  v2 AS (SELECT j t, CAST(sum(v * c // r) AS BIGINT) v FROM tm JOIN v1 ON tm.i = v1.t GROUP BY 1),
  v3 AS (SELECT j t, CAST(sum(v * c // r) AS BIGINT) v FROM tm JOIN v2 ON tm.i = v2.t GROUP BY 1),
  v4 AS (SELECT j t, CAST(sum(v * c // r) AS BIGINT) v FROM tm JOIN v3 ON tm.i = v3.t GROUP BY 1)
  SELECT t event_type, v v_ppm FROM v4 ORDER BY 1""",
    "array_hof_funcs" ->
      """WITH a AS (SELECT l_orderkey, list_sort(list(CAST(l_quantity AS BIGINT))) arr
    FROM lineitem GROUP BY 1)
  SELECT l_orderkey, CAST(len(arr) AS BIGINT) n_items,
    CAST(CASE WHEN len(list_filter(arr, x -> x > 40)) > 0 THEN 1 ELSE 0 END AS BIGINT) has_gt40,
    CAST(len(list_filter(arr, x -> x >= 25)) AS BIGINT) n_ge25,
    CAST(list_sum(arr) AS BIGINT) total_qty,
    arr[1] min_qty, arr[-1] max_qty
  FROM a ORDER BY l_orderkey LIMIT 2000""",
    "events_bounce_rate" ->
      """WITH o AS (SELECT user_id, event_id, ts,
      CAST(floor(epoch(ts)) AS BIGINT) -
      CAST(floor(epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) gap_s
    FROM events),
  m AS (SELECT user_id, event_id, ts,
      CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END new_sess FROM o),
  sids AS (SELECT user_id, ts,
      sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sid FROM m),
  per AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) n_ev, CAST(min(ts) AS DATE) dd
    FROM sids GROUP BY 1, 2)
  SELECT dd, CAST(count(*) AS BIGINT) n_sessions,
    CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) n_bounce,
    CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) bounce_ppm
  FROM per GROUP BY 1 ORDER BY 1""",
    "ts_outlier_iqr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) dd,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) c
    FROM events GROUP BY 1, 2),
  g AS (SELECT event_type, list_sort(list(c)) cs FROM daily GROUP BY 1),
  q AS (SELECT event_type, cs, CAST(len(cs) AS BIGINT) m,
      cs[least(len(cs), len(cs) * 25 // 100 + 1)] q1,
      cs[least(len(cs), len(cs) * 75 // 100 + 1)] q3 FROM g)
  SELECT event_type, m, CAST(q1 AS BIGINT) q1, CAST(q3 AS BIGINT) q3,
    CAST(len(list_filter(cs, x -> x * 2 < q1 * 2 - (q3 - q1) * 3
                              OR x * 2 > q3 * 2 + (q3 - q1) * 3)) AS BIGINT) n_outliers
  FROM q ORDER BY 1""",
    "text_bpe_train_merges" ->
      """WITH tk0 AS (SELECT unnest(string_split(text, ' ')) tok FROM documents),
  p1 AS (SELECT pair, CAST(count(*) AS BIGINT) c FROM (
      SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
        i -> substr(tok, CAST(i AS INTEGER), 2))) pair FROM tk0 WHERE length(tok) >= 2)
    GROUP BY 1),
  b1 AS (SELECT pair, c FROM p1 ORDER BY c DESC, pair LIMIT 1),
  tk1 AS (SELECT replace(tok, (SELECT pair FROM b1), '¡') tok FROM tk0),
  p2 AS (SELECT pair, CAST(count(*) AS BIGINT) c FROM (
      SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
        i -> substr(tok, CAST(i AS INTEGER), 2))) pair FROM tk1 WHERE length(tok) >= 2)
    GROUP BY 1),
  b2 AS (SELECT pair, c FROM p2 ORDER BY c DESC, pair LIMIT 1),
  tk2 AS (SELECT replace(tok, (SELECT pair FROM b2), '¢') tok FROM tk1),
  p3 AS (SELECT pair, CAST(count(*) AS BIGINT) c FROM (
      SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
        i -> substr(tok, CAST(i AS INTEGER), 2))) pair FROM tk2 WHERE length(tok) >= 2)
    GROUP BY 1),
  b3 AS (SELECT pair, c FROM p3 ORDER BY c DESC, pair LIMIT 1)
  SELECT CAST(1 AS BIGINT) merge_round, pair, c FROM b1
  UNION ALL SELECT 2, pair, c FROM b2
  UNION ALL SELECT 3, pair, c FROM b3
  ORDER BY merge_round""",
    "agg_bottomk_quantiles" ->
      """WITH t AS (SELECT l_returnflag grp, CAST(round(l_extendedprice * 100) AS BIGINT) v,
      ((((l_orderkey * 100 + l_linenumber) * 2654435761 + 1013904223) % 2147483648)
       * 1597334677 + 12345) % 2147483648 h
    FROM lineitem),
  g AS (SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY h, v) rn,
      count(*) OVER (PARTITION BY grp) n FROM t),
  s AS (SELECT grp, CAST(max(n) AS BIGINT) n_exact,
      list_sort(list(v) FILTER (WHERE rn <= 256)) vs FROM g GROUP BY 1)
  SELECT grp, n_exact, CAST(len(vs) AS BIGINT) m,
    CAST(vs[least(len(vs), len(vs) * 50 // 100 + 1)] AS BIGINT) est_p50,
    CAST(vs[least(len(vs), len(vs) * 90 // 100 + 1)] AS BIGINT) est_p90,
    CAST(vs[least(len(vs), len(vs) * 99 // 100 + 1)] AS BIGINT) est_p99
  FROM s ORDER BY grp""",
    "join_asof_merge_outer" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
  s AS (SELECT event_id, user_id, ts FROM events WHERE event_type='signup'),
  m AS (SELECT p.event_id pid, max(s.event_id) sid
    FROM p JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts
    WHERE s.ts = (SELECT max(s2.ts) FROM s s2 WHERE s2.user_id = p.user_id AND s2.ts <= p.ts)
    GROUP BY 1)
  SELECT p.event_id purchase_id, m.sid last_signup_id,
    CAST(CASE WHEN m.sid IS NULL THEN 0 ELSE 1 END AS BIGINT) matched
  FROM p LEFT JOIN m ON p.event_id = m.pid ORDER BY 1 LIMIT 1500""",
    "join_asof_merge" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
  s AS (SELECT event_id, user_id, ts FROM events WHERE event_type='signup')
  SELECT p.event_id purchase_id, max(s.event_id) last_signup_id
  FROM p JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts
  WHERE s.ts = (SELECT max(s2.ts) FROM s s2 WHERE s2.user_id = p.user_id AND s2.ts <= p.ts)
  GROUP BY 1 ORDER BY 1 LIMIT 1200""",
    "ts_acf_lags" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) dd,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) c
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
  t AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(c) AS BIGINT) tot FROM daily),
  dev AS (SELECT dd, c * n - tot dev FROM daily CROSS JOIN t),
  den AS (SELECT sum(dev::HUGEINT * dev) den FROM dev),
  ks AS (SELECT unnest(generate_series(1, 7)) k),
  num AS (SELECT k, CAST(count(*) AS BIGINT) n_pairs, sum(a.dev::HUGEINT * b.dev) num
    FROM ks, dev a JOIN dev b ON b.dd = a.dd - CAST(k AS INTEGER) GROUP BY 1)
  SELECT CAST(k AS BIGINT) k, n_pairs,
    CAST(CASE WHEN num < 0 THEN -((-num) * 1000000 // den)
              ELSE num * 1000000 // den END AS BIGINT) acf_ppm
  FROM num CROSS JOIN den ORDER BY k""",
    "ts_forecast_wape" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) dd,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) c
    FROM events GROUP BY 1, 2),
  j AS (SELECT a.event_type, a.c, b.c fc FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.dd = a.dd - 7)
  SELECT event_type, CAST(count(*) AS BIGINT) n_days,
    CAST(sum(abs(c - fc)) AS BIGINT) abs_err_cents,
    CAST(sum(c) AS BIGINT) actual_cents,
    CAST(sum(abs(c - fc)) * 1000000 // sum(c) AS BIGINT) wape_ppm
  FROM j GROUP BY 1 ORDER BY 1""",
    "graph_cc_minlabel" ->
      """WITH e AS (SELECT DISTINCT l_partkey * 2 a, l_suppkey * 2 + 1 b FROM lineitem),
  u AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
  l0 AS (SELECT DISTINCT a node, a lbl FROM u),
  l1 AS (SELECT node, min(lbl) lbl FROM (SELECT node, lbl FROM l0
    UNION ALL SELECT u.a, l0.lbl FROM u JOIN l0 ON u.b = l0.node) GROUP BY 1),
  l2 AS (SELECT node, min(lbl) lbl FROM (SELECT node, lbl FROM l1
    UNION ALL SELECT u.a, l1.lbl FROM u JOIN l1 ON u.b = l1.node) GROUP BY 1),
  l3 AS (SELECT node, min(lbl) lbl FROM (SELECT node, lbl FROM l2
    UNION ALL SELECT u.a, l2.lbl FROM u JOIN l2 ON u.b = l2.node) GROUP BY 1),
  l4 AS (SELECT node, min(lbl) lbl FROM (SELECT node, lbl FROM l3
    UNION ALL SELECT u.a, l3.lbl FROM u JOIN l3 ON u.b = l3.node) GROUP BY 1),
  l5 AS (SELECT node, min(lbl) lbl FROM (SELECT node, lbl FROM l4
    UNION ALL SELECT u.a, l4.lbl FROM u JOIN l4 ON u.b = l4.node) GROUP BY 1),
  l6 AS (SELECT node, min(lbl) lbl FROM (SELECT node, lbl FROM l5
    UNION ALL SELECT u.a, l5.lbl FROM u JOIN l5 ON u.b = l5.node) GROUP BY 1)
  SELECT CAST(lbl AS BIGINT) lbl, CAST(count(*) AS BIGINT) sz
  FROM l6 GROUP BY 1 ORDER BY sz DESC, lbl LIMIT 100""",
    "graph_jaccard_neighbors" ->
      """WITH e AS (SELECT DISTINCT l_partkey p, l_suppkey s FROM lineitem),
  deg AS (SELECT s, CAST(count(*) AS BIGINT) deg FROM e GROUP BY 1),
  pr AS (SELECT x.s s1, y.s s2, CAST(count(*) AS BIGINT) c
    FROM e x JOIN e y ON x.p = y.p AND x.s < y.s GROUP BY 1, 2)
  SELECT s1, s2, c, da.deg d1, db.deg d2,
    CAST(c * 1000000 // (da.deg + db.deg - c) AS BIGINT) jac_ppm
  FROM pr JOIN deg da ON pr.s1 = da.s JOIN deg db ON pr.s2 = db.s
  ORDER BY jac_ppm DESC, s1, s2 LIMIT 20""",
    "ml_precision_recall_k" ->
      """WITH e AS (SELECT vec_id, label,
      list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) v
    FROM embeddings),
  p AS (SELECT a.vec_id q_id, a.label q_label, b.vec_id n_id, b.label n_label,
      CAST(list_dot_product(a.v::DOUBLE[], b.v::DOUBLE[]) AS BIGINT) dot
    FROM e a JOIN e b ON a.vec_id <> b.vec_id WHERE a.vec_id < 10),
  r AS (SELECT q_id, q_label, n_label,
      row_number() OVER (PARTITION BY q_id ORDER BY dot DESC, n_id) rn FROM p),
  m AS (SELECT q_id,
      CAST(sum(CASE WHEN q_label = n_label THEN 1 ELSE 0 END) AS BIGINT) n_rel,
      CAST(sum(CASE WHEN rn <= 10 AND q_label = n_label THEN 1 ELSE 0 END) AS BIGINT) rel_at_10
    FROM r GROUP BY 1),
  s AS (SELECT q_id, n_rel, rel_at_10,
      CAST(rel_at_10 * 1000000 // 10 AS BIGINT) p10_ppm,
      CAST(CASE WHEN n_rel > 0 THEN rel_at_10 * 1000000 // n_rel ELSE 0 END AS BIGINT) r10_ppm
    FROM m)
  SELECT q_id, n_rel, rel_at_10, p10_ppm, r10_ppm,
    CAST(CASE WHEN p10_ppm + r10_ppm > 0
              THEN 2 * p10_ppm * r10_ppm // (p10_ppm + r10_ppm)
              ELSE 0 END AS BIGINT) f1_ppm
  FROM s ORDER BY q_id""",
    "ml_hist_drift" ->
      """WITH b AS (SELECT event_type,
      CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15' THEN 'a' ELSE 'b' END period,
      CAST(round(value * 100) AS BIGINT) // 2000 bin FROM events),
  counts AS (SELECT event_type, bin,
      CAST(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT) ca,
      CAST(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT) cb
    FROM b GROUP BY 1, 2),
  totals AS (SELECT event_type,
      CAST(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT) na,
      CAST(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT) nb
    FROM b GROUP BY 1),
  j AS (SELECT counts.event_type, ca * 1000000 // na pa, cb * 1000000 // nb pb,
      na, nb FROM counts JOIN totals USING (event_type))
  SELECT event_type, CAST(max(na) AS BIGINT) n_a, CAST(max(nb) AS BIGINT) n_b,
    CAST(count(*) AS BIGINT) n_bins, CAST(sum(abs(pa - pb)) AS BIGINT) l1_ppm
  FROM j GROUP BY 1 ORDER BY 1""",
    "ml_gini_split" ->
      """WITH f AS (SELECT
      CAST(round(embedding[1]::DOUBLE * 1000) AS BIGINT) + 100000 f_off, label
    FROM embeddings),
  cl AS (SELECT f_off // 100 b, label, CAST(count(*) AS BIGINT) c FROM f GROUP BY 1, 2)
  SELECT CAST(b AS BIGINT) b, CAST(sum(c) AS BIGINT) n_b,
    CAST(count(*) AS BIGINT) n_labels,
    CAST(1000000 - sum(c * c) * 1000000 // (sum(c) * sum(c)) AS BIGINT) gini_ppm
  FROM cl GROUP BY 1 ORDER BY 1""",
    "text_bpe_pair_census" ->
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) tok FROM documents),
  pr AS (SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
      i -> substr(tok, CAST(i AS INTEGER), 2))) pair
    FROM tk WHERE length(tok) >= 2)
  SELECT pair, CAST(count(*) AS BIGINT) c
  FROM pr GROUP BY 1 ORDER BY c DESC, pair LIMIT 20""",
    "corpus_domain_cap" ->
      """WITH r AS (SELECT doc_id, lang, source, n_chars,
      row_number() OVER (PARTITION BY lang, source
                         ORDER BY n_chars DESC, doc_id) rk
    FROM documents)
  SELECT doc_id, lang, source, n_chars, CAST(rk AS BIGINT) rk
  FROM r WHERE rk <= 5 ORDER BY lang, source, rk""",
    "events_dau_wau" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) dd, user_id FROM events),
  mx AS (SELECT max(dd) maxd FROM du),
  dau AS (SELECT dd, CAST(count(*) AS BIGINT) n_dau FROM du GROUP BY 1),
  sh AS (SELECT du.dd + CAST(k AS INTEGER) dd, du.user_id
    FROM du, (SELECT unnest(generate_series(0, 6)) k) ks),
  wau AS (SELECT dd, CAST(count(DISTINCT user_id) AS BIGINT) n_wau
    FROM sh CROSS JOIN mx WHERE dd <= maxd GROUP BY 1)
  SELECT dau.dd, n_dau, n_wau,
    CAST(n_dau * 1000000 // n_wau AS BIGINT) stickiness_ppm
  FROM dau JOIN wau USING (dd) ORDER BY dd""",
    "events_step_latency" ->
      """WITH sg AS (SELECT user_id, min(ts) st FROM events
    WHERE event_type = 'signup' GROUP BY 1),
  m AS (SELECT e.user_id, min(e.ts) pt, max(sg.st) st
    FROM events e JOIN sg ON e.user_id = sg.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= sg.st GROUP BY 1)
  SELECT user_id, CAST((epoch_us(pt) - epoch_us(st)) // 1000000 AS BIGINT) latency_s
  FROM m ORDER BY user_id""",
    // round 9: the incremental (new-batch x index) ingest flags exactly
    // the exact-Jaccard near-dup pairs involving a batch doc (batch =
    // doc_id % 5 == 0), stated directly over the full corpus
    "dedup_incremental_ingest" ->
      """WITH toks AS (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) tk FROM documents)
  SELECT a.doc_id a_id, b.doc_id b_id FROM toks a JOIN toks b
  ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.tk,b.tk))::DOUBLE / len(list_distinct(a.tk || b.tk)) >= 0.9
    AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
  ORDER BY 1,2 LIMIT 2000""",
    // round 9: rolling 6-month OLS slope per supplier, exact integer ppm
    "win_regr_slope" ->
      """WITH m AS (SELECT l_suppkey s, CAST(year(l_shipdate)*12 + month(l_shipdate) AS BIGINT) mi,
    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) c
  FROM lineitem GROUP BY 1,2),
  w AS (SELECT s, mi,
    CAST(count(*) OVER f AS BIGINT) n,
    CAST(sum(mi) OVER f AS BIGINT) sx, CAST(sum(c) OVER f AS BIGINT) sy,
    CAST(sum(mi*c) OVER f AS BIGINT) sxy, CAST(sum(mi*mi) OVER f AS BIGINT) sxx
  FROM m WINDOW f AS (PARTITION BY s ORDER BY mi ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
  t AS (SELECT s, mi, n*sxy - sx*sy num, n*sxx - sx*sx den FROM w WHERE n = 6)
  SELECT s, mi, CAST(CASE WHEN num < 0 THEN -(((-num)::HUGEINT * 1000000) // den)
    ELSE ((num::HUGEINT * 1000000) // den) END AS BIGINT) slope_ppm
  FROM t ORDER BY s, mi LIMIT 1500""",
    // round 9: rolling 7-day purchase-revenue vs click-volume Pearson,
    // emitted as exact r^2 ppm + covariance sign (r itself is irrational)
    "ts_rolling_corr" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) dd,
    CAST(sum(CASE WHEN event_type='purchase' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) a,
    CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) b
  FROM events GROUP BY 1),
  w AS (SELECT dd, CAST(count(*) OVER f AS BIGINT) n,
    CAST(sum(a) OVER f AS BIGINT) sa, CAST(sum(b) OVER f AS BIGINT) sb,
    CAST(sum(a*b) OVER f AS BIGINT) sab, CAST(sum(a*a) OVER f AS BIGINT) saa,
    CAST(sum(b*b) OVER f AS BIGINT) sbb
  FROM daily WINDOW f AS (ORDER BY dd ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
  t AS (SELECT dd, n*sab - sa*sb num, n*saa - sa*sa denx, n*sbb - sb*sb deny FROM w WHERE n = 7)
  SELECT CAST(dd AS VARCHAR) dd,
    CAST((num::HUGEINT * num * 1000000) // (denx::HUGEINT * deny) AS BIGINT) r2_ppm,
    CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS BIGINT) corr_sign
  FROM t WHERE denx > 0 AND deny > 0 ORDER BY dd""",
    // round 9: Benford first-digit audit; expected shares are pinned
    // integer-ppm literals (floor(log10(1+1/d)*1e6)) on both engines
    "dq_benford_first_digit" ->
      """WITH o AS (SELECT CAST(substring(CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) digit FROM orders),
  tot AS (SELECT CAST(count(*) AS BIGINT) total FROM o),
  g AS (SELECT digit, CAST(count(*) AS BIGINT) n FROM o GROUP BY 1),
  e AS (SELECT g.digit, g.n,
      CAST((g.n * 1000000) // tot.total AS BIGINT) obs_ppm,
      CAST(list_value(301029,176091,124938,96910,79181,66946,57991,51152,45757)[CAST(g.digit AS INT)] AS BIGINT) benford_ppm
    FROM g, tot)
  SELECT digit, n, obs_ppm, benford_ppm, obs_ppm - benford_ppm dev_ppm
  FROM e ORDER BY digit""",
    // round 9: three-leg chained reconciliation — first purchase <= 24h
    // after signup, first error <= 24h after that purchase; broken
    // chains classified, end-to-end latency in floored whole seconds
    "recon_chain_followup" ->
      """WITH sg AS (SELECT event_id s_id, user_id u, ts s_ts FROM events WHERE event_type='signup'),
  pu AS (SELECT event_id p_id, user_id u, ts p_ts FROM events WHERE event_type='purchase'),
  er AS (SELECT event_id e_id, user_id u, ts e_ts FROM events WHERE event_type='error'),
  fp0 AS (SELECT sg.s_id, sg.u, sg.s_ts, pu.p_id, pu.p_ts,
      row_number() OVER (PARTITION BY sg.s_id ORDER BY pu.p_ts, pu.p_id) rn
    FROM sg LEFT JOIN pu ON sg.u = pu.u AND pu.p_ts > sg.s_ts
      AND pu.p_ts <= sg.s_ts + INTERVAL 24 HOURS),
  fp AS (SELECT * FROM fp0 WHERE rn = 1),
  fe0 AS (SELECT fp.s_id, fp.s_ts, fp.p_id, er.e_id, er.e_ts,
      row_number() OVER (PARTITION BY fp.s_id ORDER BY er.e_ts, er.e_id) rn
    FROM fp LEFT JOIN er ON fp.u = er.u AND er.e_ts > fp.p_ts
      AND er.e_ts <= fp.p_ts + INTERVAL 24 HOURS),
  fe AS (SELECT * FROM fe0 WHERE rn = 1),
  cl AS (SELECT CASE WHEN p_id IS NULL THEN 'no_purchase'
      WHEN e_id IS NULL THEN 'purchase_no_error' ELSE 'full_chain' END status,
    CASE WHEN e_id IS NOT NULL THEN epoch_us(e_ts) // 1000000 - epoch_us(s_ts) // 1000000
      ELSE 0 END lat FROM fe)
  SELECT status, CAST(count(*) AS BIGINT) n, CAST(sum(lat) AS BIGINT) latency_s_sum
  FROM cl GROUP BY 1 ORDER BY 1""",
    // round 9: CEP/MATCH_RECOGNIZE-style path-pattern census; both
    // engines regex the identical ordered path string
    "events_pattern_match" ->
      """WITH o AS (SELECT user_id, CAST(ts AS DATE) dd, event_type,
      row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) rn
    FROM events),
  p AS (SELECT user_id, dd, string_agg(event_type, '>' ORDER BY rn) path FROM o GROUP BY 1, 2),
  c AS (SELECT
    CAST(sum(CASE WHEN regexp_matches(path, 'signup(>click)*>purchase') THEN 1 ELSE 0 END) AS BIGINT) direct_buy,
    CAST(sum(CASE WHEN regexp_matches(path, 'error>.*error') THEN 1 ELSE 0 END) AS BIGINT) error_retry,
    CAST(sum(CASE WHEN regexp_matches(path, '^(view|click)(>(view|click))*$') THEN 1 ELSE 0 END) AS BIGINT) browse_only
  FROM p)
  SELECT 'browse_only' pattern, browse_only n_sessions FROM c
  UNION ALL SELECT 'direct_buy', direct_buy FROM c
  UNION ALL SELECT 'error_retry', error_retry FROM c
  ORDER BY 1""",
    // round 9: rapid-repeat purchase audit — same-user purchase pairs
    // within 60 min, gap-bucketed; whole floored seconds, integer cents
    "dq_rapid_repeat_purchase" ->
      """WITH p AS (SELECT event_id id, user_id u, ts, CAST(round(value*100) AS BIGINT) c
    FROM events WHERE event_type = 'purchase'),
  pr AS (SELECT a.u, epoch_us(b.ts) // 1000000 - epoch_us(a.ts) // 1000000 gap_s,
      abs(a.c - b.c) dc
    FROM p a JOIN p b ON a.u = b.u
      AND (b.ts > a.ts OR (b.ts = a.ts AND b.id > a.id))
      AND b.ts <= a.ts + INTERVAL 60 MINUTES),
  g AS (SELECT CASE WHEN gap_s <= 60 THEN 'a_under_1min'
      WHEN gap_s <= 600 THEN 'b_under_10min' ELSE 'c_under_60min' END gap_bucket, u, dc FROM pr)
  SELECT gap_bucket, CAST(count(*) AS BIGINT) n_pairs,
    CAST(count(DISTINCT u) AS BIGINT) n_users,
    CAST(sum(dc) AS BIGINT) abs_diff_cents
  FROM g GROUP BY 1 ORDER BY 1""",
    // round 9: per-doc novelty — share of 3-gram shingles first owned
    // (min doc_id) by this doc
    "text_novelty_ratio" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
  sh AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t)-2),
      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) g FROM tk),
  f AS (SELECT g, CAST(min(doc_id) AS BIGINT) first_doc FROM sh GROUP BY 1),
  p AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) n_grams,
      CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) n_novel
    FROM sh JOIN f ON sh.g = f.g GROUP BY 1)
  SELECT doc_id, n_grams, n_novel,
    CAST(n_novel * 1000000 // n_grams AS BIGINT) novelty_ppm
  FROM p ORDER BY doc_id LIMIT 2000""",
    // round 9: activity-concentration Gini in exact integer ppm
    "events_activity_gini" ->
      """WITH ux AS (SELECT user_id, CAST(count(*) AS BIGINT) x FROM events GROUP BY 1),
  r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) i FROM ux),
  t AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(x) AS BIGINT) sx,
      sum(i::HUGEINT * x) sixi FROM r)
  SELECT n n_users, sx n_events,
    CAST(((2 * sixi - (n::HUGEINT + 1) * sx) * 1000000) // (n::HUGEINT * sx) AS BIGINT) gini_ppm
  FROM t""",
    // round 9: Zipf-slope corpus-health fit; floor(log2) as bit length-1
    // (exact integers, no float log), sign-split slope ppm
    "text_zipf_slope" ->
      """WITH v AS (SELECT tok, CAST(count(*) AS BIGINT) c
    FROM (SELECT unnest(string_split(text, ' ')) tok FROM documents) GROUP BY 1),
  r AS (SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) rank, c FROM v),
  b AS (SELECT CAST(length(bin(rank)) - 1 AS BIGINT) x, CAST(length(bin(c)) - 1 AS BIGINT) y FROM r),
  t AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(x) AS BIGINT) sx, CAST(sum(y) AS BIGINT) sy,
      CAST(sum(x*y) AS BIGINT) sxy, CAST(sum(x*x) AS BIGINT) sxx FROM b)
  SELECT n n_vocab,
    CAST(CASE WHEN n * sxy - sx * sy < 0 THEN
        -(((sx * sy - n * sxy)::HUGEINT * 1000000) // (n * sxx - sx * sx))
      ELSE (((n * sxy - sx * sy)::HUGEINT * 1000000) // (n * sxx - sx * sx)) END AS BIGINT) slope_ppm
  FROM t""",
    // round 9: sweep-line open-order backlog curve over the day domain
    "orders_backlog_sweep" ->
      """WITH done AS (SELECT l_orderkey ok, CAST(max(l_shipdate) AS DATE) ed FROM lineitem GROUP BY 1),
  o AS (SELECT o_orderkey ok, CAST(o_orderdate AS DATE) sd FROM orders),
  dl AS (SELECT o.sd dd, 1 delta FROM o JOIN done ON o.ok = done.ok
    UNION ALL SELECT done.ed, -1 FROM o JOIN done ON o.ok = done.ok),
  g AS (SELECT dd, CAST(sum(delta) AS BIGINT) delta FROM dl GROUP BY 1),
  c AS (SELECT dd, delta,
      CAST(sum(delta) OVER (ORDER BY dd ROWS UNBOUNDED PRECEDING) AS BIGINT) backlog FROM g)
  SELECT CAST(dd AS VARCHAR) dd, delta, backlog FROM c ORDER BY dd LIMIT 2000""",
    // round 9: Spearman rank correlation (row_number ranks, pinned
    // tiebreak) between per-part revenue and quantity, exact ppm
    "part_qty_price_spearman" ->
      """WITH pp AS (SELECT l_partkey p,
      CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) price_c,
      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) qty
    FROM lineitem GROUP BY 1),
  r AS (SELECT p, CAST(row_number() OVER (ORDER BY price_c, p) AS BIGINT) rp,
      CAST(row_number() OVER (ORDER BY qty, p) AS BIGINT) rq FROM pp),
  t AS (SELECT CAST(count(*) AS BIGINT) n, sum((rp - rq)::HUGEINT * (rp - rq)) sd2 FROM r)
  SELECT n n_parts,
    CAST(1000000 - (6 * sd2 * 1000000) // (n::HUGEINT * n * n - n) AS BIGINT) spearman_ppm
  FROM t""",
  )
}
