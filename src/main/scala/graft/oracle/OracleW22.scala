package graft.oracle

/** Round-13 wave oracle SQL — validated DuckDB equivalents per SURVEY
  * §2.4. Same conventions as [[OracleW18]]–[[OracleW21]]: every
  * computed column aliased identically to the Spark side, money in
  * integer cents, ratios via truncating `//` on non-negative
  * integers, dates stringified, deterministic ORDER BY on every
  * row-limited output.
  */
object OracleW22 {

  val sql: Map[String, String] = Map(
    "win_gaps_islands" ->
      """WITH o AS (SELECT DISTINCT o_custkey ck,
      CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) m FROM orders),
  b AS (SELECT ck, m,
      CASE WHEN lag(m) OVER (PARTITION BY ck ORDER BY m) IS NULL
             OR m - lag(m) OVER (PARTITION BY ck ORDER BY m) <> 1
           THEN 1 ELSE 0 END brk FROM o),
  i AS (SELECT ck, m, sum(brk) OVER (PARTITION BY ck ORDER BY m
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) isl FROM b),
  g AS (SELECT ck, isl, CAST(count(*) AS BIGINT) len FROM i GROUP BY 1, 2)
  SELECT ck, CAST(max(isl) AS BIGINT) n_islands,
    CAST(max(len) AS BIGINT) longest_run, CAST(sum(len) AS BIGINT) n_months
  FROM g GROUP BY ck ORDER BY longest_run DESC, ck LIMIT 1000""",

    "events_anomaly_daily" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) dd, CAST(count(*) AS BIGINT) n
    FROM events GROUP BY 1),
  g AS (SELECT CAST(count(*) AS BIGINT) nd, CAST(sum(n) AS BIGINT) sn,
      sum(n::HUGEINT * n) ss FROM daily)
  SELECT CAST(dd AS VARCHAR) dd, n,
    CASE WHEN (nd * n - sn)::HUGEINT * (nd * n - sn)
           > 4 * (nd::HUGEINT * ss - sn::HUGEINT * sn)
         THEN 1 ELSE 0 END::BIGINT is_outlier
  FROM daily CROSS JOIN g ORDER BY dd""",

    "text_stopword_density" ->
      """WITH t AS (SELECT source,
      CAST(len(string_split(text, ' ')) AS BIGINT) toks,
      CAST(len(list_filter(string_split(text, ' '),
        x -> x IN ('the','and','of','to','a','in','is','it','for','on'))) AS BIGINT) hits
    FROM documents)
  SELECT source, CAST(count(*) AS BIGINT) n_docs,
    CAST(sum(toks) AS BIGINT) tokens, CAST(sum(hits) AS BIGINT) stop_hits,
    CAST(sum(hits) * 1000000 // sum(toks) AS BIGINT) stop_ppm
  FROM t GROUP BY source ORDER BY source""",

    "nation_trade_matrix" ->
      """WITH flow AS (
    SELECT ns.n_name supp_nation, nc.n_name cust_nation,
      CAST(count(*) AS BIGINT) n_lines,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) rev_cents
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    GROUP BY 1, 2)
  SELECT supp_nation, cust_nation, n_lines, rev_cents,
    CAST(rev_cents * 1000000 // sum(rev_cents) OVER (PARTITION BY supp_nation) AS BIGINT)
      row_share_ppm
  FROM flow ORDER BY supp_nation, cust_nation""",

    "orders_interarrival_gaps" ->
      """WITH o AS (SELECT o_custkey ck, CAST(o_orderdate AS DATE) dt, o_orderkey ok
    FROM orders),
  g AS (SELECT ck, CAST(datediff('day',
        lag(dt) OVER (PARTITION BY ck ORDER BY dt, ok), dt) AS BIGINT) gap FROM o)
  SELECT CAST(gap // 7 AS BIGINT) gap_weeks, CAST(count(*) AS BIGINT) n_gaps,
    CAST(count(DISTINCT ck) AS BIGINT) n_customers,
    CAST(sum(gap) // count(*) AS BIGINT) avg_gap_days
  FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1""",

    "orders_value_delta_buckets" ->
      """WITH o AS (SELECT o_custkey ck, CAST(o_orderdate AS DATE) dt, o_orderkey ok,
      CAST(round(o_totalprice * 100) AS BIGINT) c FROM orders),
  dl AS (SELECT c - lag(c) OVER (PARTITION BY ck ORDER BY dt, ok) delta FROM o)
  SELECT CAST(floor(delta / 1048576.0) AS BIGINT) bucket,
    CAST(count(*) AS BIGINT) n_pairs, CAST(sum(delta) AS BIGINT) sum_delta_cents
  FROM dl WHERE delta IS NOT NULL GROUP BY 1 ORDER BY 1""",

    "part_name_token_freq" ->
      """SELECT token, CAST(count(*) AS BIGINT) n_parts,
    CAST(count(DISTINCT p_brand) AS BIGINT) n_brands,
    CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) // count(*) AS BIGINT)
      avg_retail_cents
  FROM part, unnest(string_split(p_name, ' ')) u(token)
  GROUP BY token ORDER BY n_parts DESC, token LIMIT 50""",

    "supplier_discount_leakage" ->
      """WITH t AS (SELECT n_name nation,
      CAST(round(l_extendedprice * 100) AS BIGINT) g,
      CAST(round(l_extendedprice * l_discount * 100) AS BIGINT) dc
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey)
  SELECT nation, CAST(count(*) AS BIGINT) n_lines,
    CAST(sum(g) AS BIGINT) gross_cents, CAST(sum(dc) AS BIGINT) discount_cents,
    CAST(sum(dc) * 1000000 // sum(g) AS BIGINT) leakage_ppm
  FROM t GROUP BY nation ORDER BY nation""",

    "events_user_tenure_value" ->
      """WITH u AS (SELECT user_id,
      CAST(datediff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS BIGINT)
        tenure_days,
      CAST(sum(CASE WHEN event_type = 'purchase'
        THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END) AS BIGINT) pc
    FROM events GROUP BY user_id)
  SELECT tenure_days, CAST(count(*) AS BIGINT) n_users,
    CAST(sum(pc) AS BIGINT) purch_cents,
    CAST(sum(pc) // count(*) AS BIGINT) avg_cents
  FROM u GROUP BY 1 ORDER BY 1""",

    "ts_runs_updown" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) dd,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) rev
    FROM orders GROUP BY 1),
  sg AS (SELECT dd, CASE WHEN rev > prev THEN 1 WHEN rev < prev THEN -1 ELSE 0 END sign
    FROM (SELECT dd, rev, lag(rev) OVER (ORDER BY dd) prev FROM daily)
    WHERE prev IS NOT NULL),
  b AS (SELECT dd, sign,
      CASE WHEN lag(sign) OVER (ORDER BY dd) IS NULL
             OR sign <> lag(sign) OVER (ORDER BY dd) THEN 1 ELSE 0 END brk FROM sg),
  r AS (SELECT dd, sign, sum(brk) OVER (ORDER BY dd
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run_id FROM b),
  runs AS (SELECT run_id, min(dd) start_dd, min(sign) sign,
      CAST(count(*) AS BIGINT) len FROM r GROUP BY run_id)
  SELECT CAST(year(start_dd) AS BIGINT) yr, CAST(count(*) AS BIGINT) n_runs,
    CAST(sum(CASE WHEN sign = 1 THEN 1 ELSE 0 END) AS BIGINT) n_up_runs,
    CAST(sum(CASE WHEN sign = -1 THEN 1 ELSE 0 END) AS BIGINT) n_down_runs,
    CAST(coalesce(max(CASE WHEN sign = 1 THEN len END), 0) AS BIGINT) longest_up,
    CAST(coalesce(max(CASE WHEN sign = -1 THEN len END), 0) AS BIGINT) longest_down
  FROM runs GROUP BY 1 ORDER BY 1""",

    // quartile CONTRACT: the value at row_number ceil(q*n) under
    // (n_chars, doc_id) order — stated explicitly on both engines, no
    // interpolation-rule coupling (quantile_disc's position rule need
    // not match)
    "corpus_length_outliers_by_source" ->
      """WITH ranked AS (SELECT source, n_chars, doc_id,
      row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) rn,
      count(*) OVER (PARTITION BY source) cn FROM documents),
  q AS (SELECT source, CAST(count(*) AS BIGINT) n_docs,
      CAST(max(CASE WHEN rn = (cn + 3) // 4 THEN n_chars END) AS BIGINT) q1,
      CAST(max(CASE WHEN rn = (cn + 1) // 2 THEN n_chars END) AS BIGINT) med,
      CAST(max(CASE WHEN rn = (3 * cn + 3) // 4 THEN n_chars END) AS BIGINT) q3
    FROM ranked GROUP BY source)
  SELECT d.source, q.n_docs, q.q1, q.med, q.q3,
    CAST(sum(CASE WHEN d.n_chars * 2 > q.q3 * 2 + (q.q3 - q.q1) * 3
      THEN 1 ELSE 0 END) AS BIGINT) n_outliers
  FROM documents d JOIN q ON d.source = q.source
  GROUP BY 1, 2, 3, 4, 5 ORDER BY d.source""",

    "embedding_sign_profile" ->
      """SELECT CAST("label" AS BIGINT) "label", CAST(r.i - 1 AS BIGINT) pos,
    CAST(count(*) AS BIGINT) n,
    CAST(sum(CASE WHEN embedding[r.i] > 0 THEN 1 ELSE 0 END) AS BIGINT) n_pos,
    CAST(sum(CASE WHEN embedding[r.i] > 0 THEN 1 ELSE 0 END) * 1000000 // count(*)
      AS BIGINT) pos_ppm
  FROM embeddings, range(1, 17) r(i)
  GROUP BY 1, 2 ORDER BY 1, 2""",

    "embedding_axis_extremes" ->
      """SELECT pos, vec_id, val_e6 FROM (
    SELECT CAST(r.i - 1 AS BIGINT) pos, vec_id,
      CAST(round(embedding[r.i]::DOUBLE * 1000000) AS BIGINT) val_e6,
      row_number() OVER (PARTITION BY r.i
        ORDER BY embedding[r.i]::DOUBLE DESC, vec_id) rnk
    FROM embeddings, range(1, 17) r(i)) t
  WHERE rnk = 1 ORDER BY pos""",

    "ml_population_drift_bins" ->
      """WITH e AS (SELECT CAST(round("value" * 100) AS BIGINT) // 10000 band,
      CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END is_a
    FROM events WHERE event_type = 'purchase'),
  binned AS (SELECT band, CAST(sum(is_a) AS BIGINT) n_a,
      CAST(sum(1 - is_a) AS BIGINT) n_b FROM e GROUP BY band),
  tot AS (SELECT CAST(sum(n_a) AS BIGINT) ta, CAST(sum(n_b) AS BIGINT) tb FROM binned)
  SELECT band, n_a, n_b,
    CAST(n_a * 1000000 // ta AS BIGINT) share_a_ppm,
    CAST(n_b * 1000000 // tb AS BIGINT) share_b_ppm,
    CAST(abs(n_a * 1000000 // ta - n_b * 1000000 // tb) AS BIGINT) drift_ppm
  FROM binned CROSS JOIN tot ORDER BY band""",

    "sql_values_lookup" ->
      """SELECT o_orderstatus status, CAST(count(*) AS BIGINT) n_orders,
    CAST(sum(wt * CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) weighted_cents
  FROM orders JOIN (VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
    ('4-NOT SPECIFIED', 2), ('5-LOW', 1)) w(prio, wt)
    ON o_orderpriority = prio
  GROUP BY 1 ORDER BY 1""",

    "events_hour_share_drift" ->
      """WITH dh AS (SELECT CAST(ts AS DATE) dd, CAST(hour(ts) AS BIGINT) h,
      CAST(count(*) AS BIGINT) n_dh FROM events GROUP BY 1, 2),
  days AS (SELECT dd, CAST(sum(n_dh) AS BIGINT) n_d FROM dh GROUP BY dd),
  hours AS (SELECT h, CAST(sum(n_dh) AS BIGINT) n_h FROM dh GROUP BY h),
  tot AS (SELECT CAST(sum(n_h) AS BIGINT) nn FROM hours),
  grid AS (SELECT days.dd, days.n_d, hours.h, hours.n_h, tot.nn,
      coalesce(dh.n_dh, 0) n_dh
    FROM days CROSS JOIN range(0, 24) r(h0)
    JOIN hours ON hours.h = r.h0 CROSS JOIN tot
    LEFT JOIN dh ON dh.dd = days.dd AND dh.h = r.h0)
  SELECT CAST(dd AS VARCHAR) dd, n_d,
    CAST(sum(abs(n_dh * nn - n_h * n_d)) * 1000000 // (n_d * nn) AS BIGINT) l1_ppm
  FROM grid GROUP BY dd, n_d, nn ORDER BY dd""",

    "orders_priority_transition" ->
      """WITH c AS (SELECT o_custkey ck,
      struct_extract(min(struct_pack(dt := CAST(o_orderdate AS DATE),
        ok := o_orderkey, p := o_orderpriority)), 'p') first_prio,
      struct_extract(max(struct_pack(dt := CAST(o_orderdate AS DATE),
        ok := o_orderkey, p := o_orderpriority)), 'p') last_prio
    FROM orders GROUP BY o_custkey)
  SELECT first_prio, last_prio, CAST(count(*) AS BIGINT) n_customers
  FROM c GROUP BY 1, 2 ORDER BY 1, 2""",

    "events_top_minutes" ->
      """WITH m AS (SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') mm,
      CAST(count(*) AS BIGINT) n FROM events GROUP BY 1),
  tot AS (SELECT CAST(sum(n) AS BIGINT) nn FROM m)
  SELECT mm, n, CAST(n * 1000000 // nn AS BIGINT) share_ppm
  FROM m CROSS JOIN tot ORDER BY n DESC, mm LIMIT 20""",

    "ts_weekend_ratio_monthly" ->
      """WITH t AS (SELECT
      CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) ym,
      CASE WHEN isodow(l_shipdate) IN (6, 7) THEN 1 ELSE 0 END we,
      CAST(round(l_extendedprice * 100) AS BIGINT) c FROM lineitem)
  SELECT ym,
    CAST(sum(CASE WHEN we = 1 THEN c ELSE 0 END) AS BIGINT) weekend_cents,
    CAST(sum(CASE WHEN we = 0 THEN c ELSE 0 END) AS BIGINT) weekday_cents,
    CAST(sum(CASE WHEN we = 1 THEN c ELSE 0 END) * 1000000
      // nullif(sum(CASE WHEN we = 0 THEN c ELSE 0 END), 0) AS BIGINT) ratio_ppm
  FROM t GROUP BY ym ORDER BY ym""",

    "part_size_price_heat" ->
      """WITH p AS (SELECT CAST(p_size AS BIGINT) psize,
      CAST(round(p_retailprice * 100) AS BIGINT) rc FROM part)
  SELECT psize, CAST(rc // 16384 AS BIGINT) price_band,
    CAST(count(*) AS BIGINT) n_parts, CAST(sum(rc) AS BIGINT) sum_retail_cents
  FROM p GROUP BY 1, 2 ORDER BY 1, 2""",

    "dq_name_key_consistency" ->
      """WITH c AS (SELECT c_mktsegment segment,
      CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT) = c_custkey ok
    FROM customer)
  SELECT segment, CAST(count(*) AS BIGINT) n_customers,
    CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) n_match,
    CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) n_mismatch
  FROM c GROUP BY segment ORDER BY segment""",

    "supplier_volume_balance_spearman" ->
      """WITH v AS (SELECT l_suppkey sk, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) vol
    FROM lineitem GROUP BY 1),
  b AS (SELECT v.sk, v.vol, CAST(round(s_acctbal * 100) AS BIGINT) bal_c
    FROM v JOIN supplier ON v.sk = s_suppkey),
  r AS (SELECT sk, CAST(row_number() OVER (ORDER BY vol, sk) AS BIGINT) rv,
      CAST(row_number() OVER (ORDER BY bal_c, sk) AS BIGINT) rb FROM b),
  t AS (SELECT CAST(count(*) AS BIGINT) n, sum((rv - rb)::HUGEINT * (rv - rb)) sd2 FROM r)
  SELECT n n_suppliers,
    CAST(1000000 - (6 * sd2 * 1000000) // (n::HUGEINT * n * n - n) AS BIGINT) spearman_ppm
  FROM t""",

    "customer_order_span_quartiles" ->
      """WITH sp AS (SELECT o_custkey ck,
      CAST(datediff('day', min(CAST(o_orderdate AS DATE)),
        max(CAST(o_orderdate AS DATE))) AS BIGINT) span
    FROM orders GROUP BY 1),
  j AS (SELECT c_mktsegment segment, sp.span, sp.ck
    FROM sp JOIN customer ON sp.ck = c_custkey),
  ranked AS (SELECT segment, span,
      row_number() OVER (PARTITION BY segment ORDER BY span, ck) rn,
      count(*) OVER (PARTITION BY segment) cn FROM j)
  SELECT segment, CAST(count(*) AS BIGINT) n_customers,
    CAST(max(CASE WHEN rn = (cn + 3) // 4 THEN span END) AS BIGINT) q1_days,
    CAST(max(CASE WHEN rn = (cn + 1) // 2 THEN span END) AS BIGINT) med_days,
    CAST(max(CASE WHEN rn = (3 * cn + 3) // 4 THEN span END) AS BIGINT) q3_days
  FROM ranked GROUP BY segment ORDER BY segment""",

    "li_linenumber_profile" ->
      """WITH t AS (SELECT CAST(l_linenumber AS BIGINT) ln,
      CAST(floor(l_quantity) AS BIGINT) q,
      CAST(round(l_extendedprice * 100) AS BIGINT) c FROM lineitem)
  SELECT ln, CAST(count(*) AS BIGINT) n_lines,
    CAST(sum(q) * 100 // count(*) AS BIGINT) avg_qty_x100,
    CAST(sum(c) // count(*) AS BIGINT) avg_price_cents
  FROM t GROUP BY ln ORDER BY ln""",
  )
}
