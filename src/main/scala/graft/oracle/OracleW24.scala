package graft.oracle

/** Round-13 wave-3 oracle SQL — validated DuckDB equivalents per
  * SURVEY §2.4, conventions as [[OracleW22]]/[[OracleW23]].
  */
object OracleW24 {

  val sql: Map[String, String] = Map(
    "graph_cosupplier_census" ->
      """WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey sk FROM lineitem),
  co AS (SELECT a.sk, CAST(count(DISTINCT b.sk) AS BIGINT) codeg
    FROM ps a JOIN ps b ON a.p = b.p AND a.sk <> b.sk GROUP BY a.sk)
  SELECT CAST(codeg // 50 AS BIGINT) codeg_band,
    CAST(count(*) AS BIGINT) n_suppliers,
    CAST(min(codeg) AS BIGINT) min_codeg, CAST(max(codeg) AS BIGINT) max_codeg
  FROM co GROUP BY 1 ORDER BY 1""",

    "part_cross_supplier_price_spread" ->
      """WITH up AS (SELECT l_partkey pk, l_suppkey sk,
      sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 100
        // sum(CAST(floor(l_quantity) AS BIGINT)) up_cc
    FROM lineitem GROUP BY 1, 2),
  sp AS (SELECT pk, CAST(count(*) AS BIGINT) ns,
      min(up_cc) mn, max(up_cc) mx FROM up GROUP BY pk)
  SELECT CAST(((mx - mn) * 1000000 // mn) // 50000 AS BIGINT) spread_band,
    CAST(count(*) AS BIGINT) n_parts,
    CAST(max((mx - mn) * 1000000 // mn) AS BIGINT) max_spread_ppm
  FROM sp WHERE ns >= 2 GROUP BY 1 ORDER BY 1""",

    "customer_reactivation_monthly" ->
      """WITH o AS (SELECT o_custkey ck, CAST(o_orderdate AS DATE) dt, o_orderkey ok
    FROM orders),
  g AS (SELECT ck, dt,
      datediff('day', lag(dt) OVER (PARTITION BY ck ORDER BY dt, ok), dt) gap FROM o)
  SELECT CAST(year(dt) * 100 + month(dt) AS BIGINT) ym,
    CAST(count(*) AS BIGINT) n_reactivations,
    CAST(count(DISTINCT ck) AS BIGINT) n_customers
  FROM g WHERE gap > 90 GROUP BY 1 ORDER BY 1""",

    "events_rolling_wau" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) dd FROM events),
  days AS (SELECT DISTINCT dd FROM du),
  cov AS (SELECT du.user_id, CAST(g.rd AS DATE) rd
    FROM du, unnest(generate_series(du.dd::TIMESTAMP,
      (du.dd + 6)::TIMESTAMP, INTERVAL 1 DAY)) g(rd))
  SELECT CAST(rd AS VARCHAR) rd, CAST(count(DISTINCT user_id) AS BIGINT) wau
  FROM cov WHERE rd IN (SELECT dd FROM days)
  GROUP BY rd ORDER BY rd""",

    "customer_monthly_active_share" ->
      """WITH om AS (SELECT o_custkey ck, CAST(date_trunc('month', o_orderdate) AS DATE) m
    FROM orders),
  active AS (SELECT m, CAST(count(DISTINCT ck) AS BIGINT) active FROM om GROUP BY m),
  acq AS (SELECT m, CAST(count(*) AS BIGINT) nw
    FROM (SELECT ck, min(m) m FROM om GROUP BY ck) GROUP BY m),
  j AS (SELECT active.m, active.active, coalesce(acq.nw, 0) nw
    FROM active LEFT JOIN acq ON active.m = acq.m)
  SELECT CAST(m AS VARCHAR) m, active,
    CAST(sum(nw) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) base,
    CAST(active * 1000000 // sum(nw) OVER (ORDER BY m
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) active_ppm
  FROM j ORDER BY m""",

    "part_brand_revenue_rank" ->
      """WITH rev AS (SELECT p_brand brand,
      CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        AS BIGINT) net_cents,
      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) qty
    FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1)
  SELECT brand, net_cents, qty,
    CAST(row_number() OVER (ORDER BY net_cents DESC, brand) AS BIGINT) rev_rank
  FROM rev ORDER BY rev_rank""",

    // dow key through the pinned Sunday=1 mapping (Spark dayofweek ↔
    // isodow % 7 + 1) — §2.1's no-week-of-year rule's dow cousin
    "events_type_dow_mix" ->
      """WITH t AS (SELECT event_type etype, CAST(isodow(ts) % 7 + 1 AS BIGINT) dow,
      CAST(count(*) AS BIGINT) n FROM events GROUP BY 1, 2)
  SELECT etype, dow, n,
    CAST(n * 1000000 // sum(n) OVER (PARTITION BY etype) AS BIGINT) type_share_ppm
  FROM t ORDER BY etype, dow""",

    "dq_orderkey_gaps" ->
      """SELECT CAST(o_orderkey // 32768 AS BIGINT) block,
    CAST(count(*) AS BIGINT) n_keys,
    CAST(min(o_orderkey) AS BIGINT) min_key, CAST(max(o_orderkey) AS BIGINT) max_key,
    CAST(max(o_orderkey) - min(o_orderkey) + 1 - count(*) AS BIGINT) missing
  FROM orders GROUP BY 1 ORDER BY 1""",

    "dq_ship_before_order" ->
      """SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) ym,
    CAST(count(*) AS BIGINT) n_lines,
    CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) < CAST(o_orderdate AS DATE)
      THEN 1 ELSE 0 END) AS BIGINT) n_violations
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1 ORDER BY 1""",

    "nation_balance_gap" ->
      """WITH cb AS (SELECT c_nationkey nk, CAST(count(*) AS BIGINT) n_customers,
      CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) cust_bal_cents
    FROM customer GROUP BY 1),
  sb AS (SELECT s_nationkey nk, CAST(count(*) AS BIGINT) n_suppliers,
      CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) supp_bal_cents
    FROM supplier GROUP BY 1),
  j AS (SELECT coalesce(cb.nk, sb.nk) nk,
      coalesce(n_customers, 0) n_customers, coalesce(cust_bal_cents, 0) cust_bal_cents,
      coalesce(n_suppliers, 0) n_suppliers, coalesce(supp_bal_cents, 0) supp_bal_cents
    FROM cb FULL OUTER JOIN sb ON cb.nk = sb.nk)
  SELECT n_name nation, n_customers, cust_bal_cents, n_suppliers, supp_bal_cents,
    CAST(cust_bal_cents - supp_bal_cents AS BIGINT) gap_cents
  FROM j JOIN nation ON nk = n_nationkey ORDER BY nation""",

    "events_first_last_type_matrix" ->
      """WITH u AS (SELECT user_id,
      struct_extract(min(struct_pack(ts := ts, event_id := event_id,
        t := event_type)), 't') first_type,
      struct_extract(max(struct_pack(ts := ts, event_id := event_id,
        t := event_type)), 't') last_type
    FROM events GROUP BY user_id)
  SELECT first_type, last_type, CAST(count(*) AS BIGINT) n_users
  FROM u GROUP BY 1, 2 ORDER BY 1, 2""",

    "customer_one_and_done_monthly" ->
      """WITH c AS (SELECT o_custkey,
      CAST(min(date_trunc('month', o_orderdate)) AS DATE) fm,
      CAST(count(*) AS BIGINT) n_orders FROM orders GROUP BY 1)
  SELECT CAST(fm AS VARCHAR) fm, CAST(count(*) AS BIGINT) n_new,
    CAST(sum(CASE WHEN n_orders = 1 THEN 1 ELSE 0 END) AS BIGINT) n_single,
    CAST(sum(CASE WHEN n_orders = 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
      AS BIGINT) single_ppm
  FROM c GROUP BY fm ORDER BY fm""",

    "text_token_length_by_lang" ->
      """WITH t AS (SELECT lang,
      CAST(len(string_split(text, ' ')) AS BIGINT) toks,
      CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x)))
        AS BIGINT) chars,
      CAST(list_max(list_transform(string_split(text, ' '), x -> length(x)))
        AS BIGINT) maxlen
    FROM documents)
  SELECT lang, CAST(count(*) AS BIGINT) n_docs, CAST(sum(toks) AS BIGINT) n_tokens,
    CAST(sum(chars) * 100 // sum(toks) AS BIGINT) mean_len_x100,
    CAST(max(maxlen) AS BIGINT) max_token_len
  FROM t GROUP BY lang ORDER BY lang""",

    "agg_min_max_by" ->
      """WITH s AS (SELECT n_name nation, s_name,
      CAST(round(s_acctbal * 100) AS BIGINT) * 10000000 + s_suppkey ord
    FROM supplier JOIN nation ON s_nationkey = n_nationkey)
  SELECT nation, CAST(count(*) AS BIGINT) n_suppliers,
    arg_max(s_name, ord) richest, arg_min(s_name, ord) poorest
  FROM s GROUP BY nation ORDER BY nation""",

    "embedding_sign_bucket_census" ->
      """WITH b AS (SELECT vec_id, "label",
      CAST(sum(CASE WHEN embedding[r.i] > 0
        THEN (1::BIGINT << (r.i - 1)) ELSE 0 END) AS BIGINT) bucket
    FROM embeddings, range(1, 9) r(i) GROUP BY 1, 2)
  SELECT bucket, CAST(count(*) AS BIGINT) n_vecs,
    CAST(count(DISTINCT "label") AS BIGINT) n_labels
  FROM b GROUP BY bucket ORDER BY bucket""",
  )
}
