package graft.oracle

/** Round-12 wave oracle SQL — validated DuckDB equivalents per SURVEY
  * §2.4. Same conventions as [[OracleW18]]–[[OracleW20]].
  */
object OracleW21 {

  val sql: Map[String, String] = Map(
    // round 12: the SERVED-index face of ann_ivf_topk — the Spark side
    // probes a persistent CowTable index (built once per data dir by
    // the same seeded, 1e-3-quantized k-means), so the pair shares ONE
    // oracle verbatim: the index contract is identical, only where the
    // build cost is paid differs (per invocation vs per corpus
    // version).
    "ann_ivf_persistent" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] ve FROM embeddings),
  c0 AS (SELECT vec_id cid, embedding::DOUBLE[] ce FROM embeddings ORDER BY vec_id LIMIT 16),
  a1 AS (SELECT vec_id, cell FROM (
         SELECT v.vec_id, c0.cid cell,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY list_cosine_similarity(v.ve, c0.ce) DESC, c0.cid) rr
         FROM v CROSS JOIN c0) WHERE rr = 1),
  m1 AS (SELECT a1.cell, r.i pos, round(avg(v.ve[r.i])*1000)/1000 mval
         FROM a1 JOIN v USING (vec_id), range(1,65) r(i) GROUP BY a1.cell, r.i),
  c1 AS (SELECT cell cid, list(mval ORDER BY pos) ce FROM m1 GROUP BY cell),
  a2 AS (SELECT vec_id, cell FROM (
         SELECT v.vec_id, c1.cid cell,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY list_cosine_similarity(v.ve, c1.ce) DESC, c1.cid) rr
         FROM v CROSS JOIN c1) WHERE rr = 1),
  m2 AS (SELECT a2.cell, r.i pos, round(avg(v.ve[r.i])*1000)/1000 mval
         FROM a2 JOIN v USING (vec_id), range(1,65) r(i) GROUP BY a2.cell, r.i),
  c2 AS (SELECT cell cid, list(mval ORDER BY pos) ce FROM m2 GROUP BY cell),
  assign AS (SELECT vec_id, cell FROM (
             SELECT v.vec_id, c2.cid cell,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY list_cosine_similarity(v.ve, c2.ce) DESC, c2.cid) rr
             FROM v CROSS JOIN c2) WHERE rr = 1),
  q AS (SELECT vec_id qid, ve qe FROM v WHERE vec_id < 10),
  probes AS (
    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY list_cosine_similarity(qe, ce) DESC, cid) pr
    FROM q CROSS JOIN c2),
  cand AS (
    SELECT q.qid, a.vec_id n, list_cosine_similarity(q.qe, v.ve) s
    FROM q JOIN probes p ON p.qid = q.qid AND p.pr <= 4
    JOIN assign a ON a.cell = p.cid
    JOIN v ON v.vec_id = a.vec_id
    WHERE a.vec_id <> q.qid)
  SELECT qid q, n, rn FROM (SELECT qid, n, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, n) rn FROM cand) t
  WHERE rn <= 3 ORDER BY q, rn""",

    // round-12 wave A
    "win_cume_dist" ->
      """WITH c AS (SELECT c_mktsegment segment, c_custkey,
      CAST(round(c_acctbal * 100) AS BIGINT) bal_cents FROM customer)
  SELECT segment, c_custkey, bal_cents,
    CAST(floor(cume_dist() OVER (PARTITION BY segment ORDER BY bal_cents) * 1000000) AS BIGINT) cd_ppm,
    CAST(floor(percent_rank() OVER (PARTITION BY segment ORDER BY bal_cents) * 1000000) AS BIGINT) pr_ppm
  FROM c ORDER BY segment, c_custkey LIMIT 2000""",
    // width_bucket emulated: bounds [0, 2^26) cents, 16 buckets -> width
    // 2^22; floor(c/2^22)+1 is step-for-step FP-exact on both engines
    "expr_width_bucket" ->
      """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) c FROM orders)
  SELECT CAST(floor(c / 4194304.0) AS BIGINT) + 1 bucket,
    CAST(count(*) AS BIGINT) n_orders, CAST(sum(c) AS BIGINT) sum_cents
  FROM o GROUP BY 1 ORDER BY 1""",
    "ts_record_highs" ->
      """WITH dly AS (SELECT CAST(ts AS DATE) dd,
      CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) rev_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
  w AS (SELECT dd, rev_cents,
      max(rev_cents) OVER (ORDER BY dd ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pm
    FROM dly)
  SELECT CAST(dd AS VARCHAR) dd, rev_cents, coalesce(pm, 0) prev_max_cents
  FROM w WHERE pm IS NULL OR rev_cents > pm ORDER BY dd""",
    "dq_key_date_inversions" ->
      """WITH o AS (SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) ym,
      o_orderkey, o_orderdate FROM orders),
  l AS (SELECT ym, o_orderdate,
      lag(o_orderdate) OVER (PARTITION BY ym ORDER BY o_orderkey) prev_d FROM o)
  SELECT ym, CAST(count(*) AS BIGINT) n_orders,
    CAST(sum(CASE WHEN prev_d > o_orderdate THEN 1 ELSE 0 END) AS BIGINT) n_inversions
  FROM l GROUP BY 1 ORDER BY 1""",
    "ml_brier_score" ->
      """WITH t AS (SELECT l_linestatus status,
      CAST(round(l_discount * 100000) AS BIGINT) p_bp,
      CASE WHEN l_returnflag = 'R' THEN 10000 ELSE 0 END y_bp FROM lineitem),
  q AS (SELECT status, (p_bp - y_bp) * (p_bp - y_bp) sq FROM t)
  SELECT status, CAST(count(*) AS BIGINT) n,
    CAST(sum(sq) // count(*) AS BIGINT) brier_e8
  FROM q GROUP BY 1 ORDER BY 1""",
    "split_kfold" ->
      """WITH f AS (SELECT lang, n_chars,
      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 5 fold
    FROM documents)
  SELECT fold, CAST(count(*) AS BIGINT) n_docs, CAST(sum(n_chars) AS BIGINT) sum_chars,
    CAST(count(DISTINCT lang) AS BIGINT) n_langs,
    CAST(sum(n_chars) // count(*) AS BIGINT) mean_chars
  FROM f GROUP BY 1 ORDER BY 1""",

    // round-12 wave B
    "text_bigram_surprisal" ->
      """WITH g AS (SELECT doc_id,
      unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) bg
    FROM (SELECT doc_id, string_split(text, ' ') t FROM documents)),
  c2 AS (SELECT bg, CAST(count(*) AS BIGINT) c2 FROM g GROUP BY 1),
  c1 AS (SELECT split_part(bg, ' ', 1) w1, CAST(count(*) AS BIGINT) c1 FROM g GROUP BY 1),
  dim AS (SELECT c2.bg,
      (length(bin(c1.c1)) - 1) - (length(bin(c2.c2)) - 1) sbits
    FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.w1)
  SELECT g.doc_id, CAST(count(*) AS BIGINT) n_bigrams,
    CAST(sum(dim.sbits) AS BIGINT) surprisal
  FROM g JOIN dim ON g.bg = dim.bg
  GROUP BY 1 ORDER BY 1 LIMIT 2000""",
    "orders_fanout_histogram" ->
      """WITH f AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) lines FROM lineitem GROUP BY 1)
  SELECT lines, CAST(count(*) AS BIGINT) n_orders FROM f GROUP BY 1 ORDER BY 1""",
    "supplier_ship_latency" ->
      """WITH t AS (SELECT l_suppkey,
      CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) lag_d
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
  SELECT l_suppkey, CAST(count(*) AS BIGINT) n_lines,
    CAST(sum(lag_d) // count(*) AS BIGINT) mean_lag_days,
    CAST(max(lag_d) AS BIGINT) max_lag_days
  FROM t GROUP BY 1 ORDER BY mean_lag_days DESC, l_suppkey LIMIT 100""",
    "customer_balance_spend_quadrant" ->
      """WITH sp AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) sp
    FROM orders GROUP BY 1),
  c AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) bal, sp
    FROM customer JOIN sp ON c_custkey = o_custkey),
  m AS (SELECT CAST(round(quantile_cont(bal, 0.5)) AS BIGINT) mb,
      CAST(round(quantile_cont(sp, 0.5)) AS BIGINT) ms FROM c)
  SELECT CASE WHEN bal > mb THEN 'hi_bal' ELSE 'lo_bal' END bal_side,
    CASE WHEN sp > ms THEN 'hi_spend' ELSE 'lo_spend' END spend_side,
    CAST(count(*) AS BIGINT) n_customers
  FROM c CROSS JOIN m GROUP BY 1, 2 ORDER BY 1, 2""",
    "embedding_quantize_error" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] ve FROM embeddings),
  s AS (SELECT label, list_max(list_transform(ve, x -> abs(x))) m, ve FROM v),
  e AS (SELECT label,
      list_sum(list_transform(ve,
        x -> CAST(round((x - floor(x * 127.0 / m + 0.5) * m / 127.0) * 100000) AS BIGINT)
             * CAST(round((x - floor(x * 127.0 / m + 0.5) * m / 127.0) * 100000) AS BIGINT))) sse
    FROM s)
  SELECT CAST(label AS BIGINT) AS "label", CAST(count(*) AS BIGINT) n_vecs,
    CAST(sum(sse) AS BIGINT) sse_e10, CAST(sum(sse) // count(*) AS BIGINT) mse_e10
  FROM e GROUP BY 1 ORDER BY 1""",

    // round-12 wave C
    "agg_histogram_log2" ->
      """WITH t AS (SELECT event_type, CAST(round("value" * 100) AS BIGINT) c FROM events)
  SELECT event_type, CAST(length(bin(c)) AS BIGINT) bucket,
    CAST(count(*) AS BIGINT) n, CAST(sum(c) AS BIGINT) sum_cents
  FROM t GROUP BY 1, 2 ORDER BY 1, 2""",
    "part_supplier_redundancy" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
  k AS (SELECT l_partkey, CAST(count(*) AS BIGINT) n_suppliers FROM ps GROUP BY 1)
  SELECT n_suppliers, CAST(count(*) AS BIGINT) n_parts FROM k GROUP BY 1 ORDER BY 1""",
    "sql_distinct_on" ->
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey,
    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) last_date,
    CAST(round(o_totalprice * 100) AS BIGINT) last_cents
  FROM orders
  ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC LIMIT 2000""",
    "ts_mom_growth" ->
      """WITH m AS (SELECT CAST(year(ts) * 100 + month(ts) AS BIGINT) ym,
      CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) rev_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
  l AS (SELECT ym, rev_cents, lag(rev_cents) OVER (ORDER BY ym) prev FROM m)
  SELECT ym, rev_cents,
    CAST((rev_cents - prev) * 1000000 // prev AS BIGINT) growth_ppm
  FROM l ORDER BY ym""",
    "embedding_label_affinity" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] ve FROM embeddings),
  m AS (SELECT label, r.i pos,
      CAST(sum(CAST(floor(ve[r.i] * 1000 + 0.5) AS BIGINT)) AS BIGINT)
        // count(*) mq
    FROM v, range(1, 65) r(i) GROUP BY 1, 2)
  SELECT a.label label_a, b.label label_b,
    CAST(sum((a.mq - b.mq) * (a.mq - b.mq)) AS BIGINT) d2_milli2
  FROM m a JOIN m b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2 ORDER BY 1, 2""",

    // round-12 wave D
    "dedup_prefix_hash" ->
      """WITH h AS (SELECT md5(substr(text, 1, 64)) h FROM documents),
  g AS (SELECT h, CAST(count(*) AS BIGINT) k FROM h GROUP BY 1)
  SELECT k, CAST(count(*) AS BIGINT) n_groups FROM g WHERE k > 1
  GROUP BY 1 ORDER BY 1""",
    "corpus_lang_source_matrix" ->
      """WITH m AS (SELECT lang, source, CAST(count(*) AS BIGINT) n_docs,
      CAST(sum(n_chars) AS BIGINT) sum_chars FROM documents GROUP BY 1, 2)
  SELECT lang, source, n_docs, sum_chars,
    CAST(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) lang_share_ppm
  FROM m ORDER BY lang, source""",
    "supplier_nation_price_index" ->
      """WITH t AS (SELECT s_nationkey, CAST(round(l_extendedprice * 100) AS BIGINT) c
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
  n AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) n_lines, CAST(sum(c) AS BIGINT) sum_cents
    FROM t GROUP BY 1),
  g AS (SELECT CAST(sum(c) AS BIGINT) gc, CAST(count(*) AS BIGINT) gn FROM t)
  SELECT CAST(s_nationkey AS BIGINT) nationkey, n_lines,
    CAST(sum_cents // n_lines AS BIGINT) mean_cents,
    CAST((sum_cents // n_lines) * 1000000 // (gc // gn) AS BIGINT) index_ppm
  FROM n CROSS JOIN g ORDER BY nationkey""",
    "customer_segment_priority_mix" ->
      """WITH m AS (SELECT c_mktsegment segment, o_orderpriority priority,
      CAST(count(*) AS BIGINT) n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey GROUP BY 1, 2)
  SELECT segment, priority, n_orders,
    CAST(n_orders * 1000000 // sum(n_orders) OVER (PARTITION BY segment) AS BIGINT) share_ppm
  FROM m ORDER BY segment, priority""",

    // round-12 wave E
    "dq_sla_latency_bands" ->
      """WITH t AS (SELECT o_orderpriority priority,
      CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) lag_d
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
  SELECT priority,
    CASE WHEN lag_d <= 30 THEN 'a_0_30' WHEN lag_d <= 60 THEN 'b_31_60'
         WHEN lag_d <= 90 THEN 'c_61_90' ELSE 'd_over_90' END band,
    CAST(count(*) AS BIGINT) n_lines
  FROM t GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_feature_breadth" ->
      """WITH u AS (SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) k
    FROM events GROUP BY 1)
  SELECT k, CAST(count(*) AS BIGINT) n_users FROM u GROUP BY 1 ORDER BY 1""",
    "events_user_hour_entropy" ->
      """WITH c AS (SELECT user_id, hour(ts) h, CAST(count(*) AS BIGINT) c
    FROM events GROUP BY 1, 2),
  w AS (SELECT user_id, c, CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) n FROM c),
  u AS (SELECT user_id,
      CAST(sum(c * (length(bin(n)) - length(bin(c)))) AS BIGINT) score,
      CAST(max(n) AS BIGINT) n
    FROM w GROUP BY 1)
  SELECT CAST(score // n AS BIGINT) band, CAST(count(*) AS BIGINT) n_users
  FROM u GROUP BY 1 ORDER BY 1""",
    "win_ntile_by_group" ->
      """WITH s AS (SELECT CAST(s_nationkey AS BIGINT) nationkey, s_suppkey,
      CAST(round(s_acctbal * 100) AS BIGINT) bal FROM supplier),
  q AS (SELECT nationkey, bal,
      CAST(ntile(4) OVER (PARTITION BY nationkey ORDER BY bal, s_suppkey) AS BIGINT) quartile
    FROM s)
  SELECT nationkey, quartile, CAST(count(*) AS BIGINT) n_suppliers,
    CAST(min(bal) AS BIGINT) min_bal, CAST(max(bal) AS BIGINT) max_bal
  FROM q GROUP BY 1, 2 ORDER BY 1, 2""",

    // round-12 wave F
    "corpus_length_gini" ->
      """WITH r AS (SELECT lang, n_chars,
      CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) r
    FROM documents),
  g AS (SELECT lang, CAST(count(*) AS BIGINT) n_docs,
      CAST(sum(r * n_chars) AS BIGINT) s1, CAST(sum(n_chars) AS BIGINT) s0
    FROM r GROUP BY 1)
  SELECT lang, n_docs,
    CAST((2 * s1 - (n_docs + 1) * s0) * 1000000 // (n_docs * s0) AS BIGINT) gini_ppm
  FROM g ORDER BY lang""",
    "ml_mcc_components" ->
      """WITH t AS (SELECT l_linestatus status,
      (l_discount > 0.05) p, (l_returnflag = 'R') y FROM lineitem)
  SELECT status, CAST(count(*) AS BIGINT) n,
    CAST(sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS BIGINT) tp,
    CAST(sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) tn,
    CAST(sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) fp,
    CAST(sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS BIGINT) fn,
    CAST(sum(CASE WHEN p AND y THEN 1 ELSE 0 END) *
         sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) -
         sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) *
         sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS BIGINT) mcc_num
  FROM t GROUP BY 1 ORDER BY 1""",
    "agg_histogram_2d" ->
      """WITH t AS (SELECT CAST(floor((l_quantity - 1) / 10) AS BIGINT) qband,
      least(CAST(round(l_extendedprice * 100) AS BIGINT) // 2000000, 4) pband,
      CAST(round(l_extendedprice * 100) AS BIGINT) c
    FROM lineitem)
  SELECT qband, pband, CAST(count(*) AS BIGINT) n_lines, CAST(sum(c) AS BIGINT) sum_cents
  FROM t GROUP BY 1, 2 ORDER BY 1, 2""",

    // round-12 wave G
    "sql_order_by_all" ->
      """SELECT o_orderpriority AS priority, o_orderstatus AS status,
    CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY ALL ORDER BY ALL""",
    "events_session_depth_histogram" ->
      """WITH e AS (SELECT user_id, ts, event_id,
      CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           THEN 1 ELSE 0 END new_sess
    FROM events),
  sd AS (SELECT user_id,
      sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid
    FROM e),
  dep AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) depth FROM sd GROUP BY 1, 2)
  SELECT depth, CAST(count(*) AS BIGINT) n_sessions FROM dep GROUP BY 1 ORDER BY 1""",
    "dedup_cross_lang_exact" ->
      """WITH n AS (SELECT lang, doc_id,
      md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) h
    FROM documents),
  g AS (SELECT h, CAST(count(DISTINCT lang) AS BIGINT) n_langs,
      CAST(count(*) AS BIGINT) n_docs, CAST(min(doc_id) AS BIGINT) first_doc
    FROM n GROUP BY 1)
  SELECT n_langs, n_docs, first_doc FROM g WHERE n_langs > 1 ORDER BY first_doc""",

    // round-12 wave H
    "text_vocab_overlap_langs" ->
      """WITH v AS (SELECT DISTINCT lang, unnest(string_split(text, ' ')) tok FROM documents),
  sz AS (SELECT lang, CAST(count(*) AS BIGINT) n FROM v GROUP BY 1),
  i AS (SELECT a.lang lang_a, b.lang lang_b, CAST(count(*) AS BIGINT) i
    FROM v a JOIN v b ON a.tok = b.tok AND a.lang < b.lang GROUP BY 1, 2)
  SELECT lang_a, lang_b,
    CAST(i * 1000000 // (sa.n + sb.n - i) AS BIGINT) jaccard_ppm
  FROM i JOIN sz sa ON sa.lang = i.lang_a JOIN sz sb ON sb.lang = i.lang_b
  ORDER BY lang_a, lang_b""",
    "customer_top_decile_share" ->
      """WITH sp AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) sp
    FROM orders GROUP BY 1),
  c AS (SELECT c_mktsegment segment, c_custkey, sp
    FROM customer JOIN sp ON c_custkey = o_custkey),
  r AS (SELECT segment, sp,
      percent_rank() OVER (PARTITION BY segment ORDER BY sp, c_custkey) pr FROM c)
  SELECT segment, CAST(count(*) AS BIGINT) n_customers,
    CAST(sum(CASE WHEN pr >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) n_top,
    CAST(sum(CASE WHEN pr >= 0.9 THEN sp ELSE 0 END) * 1000000 // sum(sp) AS BIGINT) top_share_ppm
  FROM r GROUP BY 1 ORDER BY 1""",
    "ts_dom_seasonality" ->
      """WITH m AS (SELECT CAST(day(ts) AS BIGINT) dom, CAST(count(*) AS BIGINT) n,
      CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) rev_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
  t AS (SELECT dom, n, rev_cents,
      CAST(sum(rev_cents) OVER () AS BIGINT) tot, CAST(count(*) OVER () AS BIGINT) nd FROM m)
  SELECT dom, n, rev_cents,
    CAST(rev_cents * 1000000 // tot - 1000000 // nd AS BIGINT) dev_ppm
  FROM t ORDER BY dom""",

    // round-12 wave I
    "supplier_rank_shift_quarterly" ->
      """WITH rev AS (SELECT l_suppkey,
      CAST(year(l_shipdate) * 4 + quarter(l_shipdate) - 1 AS BIGINT) qi,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) rev
    FROM lineitem GROUP BY 1, 2),
  rk AS (SELECT l_suppkey, qi, rev,
      CAST(row_number() OVER (PARTITION BY qi ORDER BY rev DESC, l_suppkey) AS BIGINT) rk
    FROM rev)
  SELECT a.l_suppkey, a.qi, b.rk rk_prev, a.rk,
    CAST(b.rk - a.rk AS BIGINT) shift
  FROM rk a JOIN rk b ON a.l_suppkey = b.l_suppkey AND b.qi + 1 = a.qi
  ORDER BY abs(b.rk - a.rk) DESC, a.qi, a.l_suppkey LIMIT 50""",
    "ts_max_drawdown" ->
      """WITH dly AS (SELECT CAST(year(ts) * 100 + month(ts) AS BIGINT) ym, CAST(ts AS DATE) dd,
      CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) rev
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
  pk AS (SELECT ym,
      CAST(max(rev) OVER (PARTITION BY ym ORDER BY dd
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) peak, rev
    FROM dly)
  SELECT ym, CAST(count(*) AS BIGINT) n_days,
    CAST(max((peak - rev) * 1000000 // peak) AS BIGINT) max_drawdown_ppm
  FROM pk GROUP BY 1 ORDER BY 1""",
    "ml_f1_threshold_sweep" ->
      """WITH t AS (SELECT CAST(round(l_discount * 10000) AS BIGINT) disc_bp,
      (l_returnflag = 'R') y FROM lineitem),
  x AS (SELECT thr_bp, disc_bp > thr_bp p, y
    FROM t, unnest([200, 300, 400, 500, 600, 700, 800]) u(thr_bp)),
  g AS (SELECT CAST(thr_bp AS BIGINT) thr_bp,
      CAST(sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS BIGINT) tp,
      CAST(sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) fp,
      CAST(sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS BIGINT) fn
    FROM x GROUP BY 1)
  SELECT thr_bp, tp, fp, fn,
    CAST(2 * tp * 1000000 // (2 * tp + fp + fn) AS BIGINT) f1_ppm
  FROM g ORDER BY thr_bp""",
  )
}
