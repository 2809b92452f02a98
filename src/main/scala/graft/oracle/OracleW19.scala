package graft.oracle

/** Round-10 wave oracle SQL (graft.ops.Audits) — validated DuckDB
  * equivalents per SURVEY §2.4. Same conventions as [[OracleW18]]:
  * integer cents via round(x*100), ppm via truncating `//` (verified
  * to truncate toward zero exactly like Spark's `div`), HUGEINT
  * mirroring DECIMAL(38) for >2⁶³ products, bounded-domain lists for
  * medians.
  */
object OracleW19 {

  val sql: Map[String, String] = Map(
    // round 10: invoice-vs-lines reconciliation census
    "dq_order_total_recon" ->
      """WITH calc AS (SELECT l_orderkey,
      CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) calc_c
    FROM lineitem GROUP BY 1),
  j AS (SELECT o.o_orderkey, CAST(round(o.o_totalprice * 100) AS BIGINT) stored_c, c.calc_c
    FROM orders o LEFT JOIN calc c ON o.o_orderkey = c.l_orderkey),
  b AS (SELECT CASE WHEN calc_c IS NULL THEN 'd_no_lines'
      WHEN abs(stored_c - calc_c) = 0 THEN 'a_exact'
      WHEN abs(stored_c - calc_c) * 100 <= abs(stored_c) THEN 'b_within_1pct'
      ELSE 'c_over_1pct' END bucket,
      abs(stored_c - calc_c) diff FROM j)
  SELECT bucket, CAST(count(*) AS BIGINT) n_orders,
    CAST(sum(coalesce(diff, 0)) AS BIGINT) abs_diff_cents
  FROM b GROUP BY 1 ORDER BY 1""",
    // round 10: bilateral nation netting, top-20 pairs by gross
    "recon_nation_netting" ->
      """WITH f AS (SELECT c.c_nationkey bn, s.s_nationkey sn,
      CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) c
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE c.c_nationkey <> s.s_nationkey),
  p AS (SELECT least(bn, sn) na, greatest(bn, sn) nb,
      CASE WHEN sn = least(bn, sn) THEN c ELSE 0 END ab,
      CASE WHEN sn = greatest(bn, sn) THEN c ELSE 0 END ba FROM f),
  g AS (SELECT na, nb, CAST(sum(ab) AS BIGINT) a_to_b_cents,
      CAST(sum(ba) AS BIGINT) b_to_a_cents FROM p GROUP BY 1, 2)
  SELECT n1.n_name nation_a, n2.n_name nation_b, a_to_b_cents, b_to_a_cents,
    CAST(a_to_b_cents + b_to_a_cents AS BIGINT) gross_cents,
    CAST(a_to_b_cents - b_to_a_cents AS BIGINT) net_a_cents
  FROM g JOIN nation n1 ON g.na = n1.n_nationkey
  JOIN nation n2 ON g.nb = n2.n_nationkey
  ORDER BY gross_cents DESC, nation_a, nation_b LIMIT 20""",
    // round 10: 2-core after exactly 4 peel rounds. Every CTE is
    // MATERIALIZED: DuckDB inlines plain CTEs per reference, and each
    // round references its predecessor twice — inlining makes the
    // chain exponential (2⁴ copies of the edge scan; observed filling
    // the disk with spill at sf0.1). Semi-joins instead of IN for the
    // same reason.
    "graph_kcore" ->
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT l_partkey * 2 a, l_suppkey * 2 + 1 b FROM lineitem),
  d1 AS MATERIALIZED (SELECT n FROM (SELECT a n FROM e0 UNION ALL SELECT b FROM e0) t GROUP BY 1 HAVING count(*) >= 2),
  e1 AS MATERIALIZED (SELECT e0.a, e0.b FROM e0 SEMI JOIN d1 da ON e0.a = da.n SEMI JOIN d1 db ON e0.b = db.n),
  d2 AS MATERIALIZED (SELECT n FROM (SELECT a n FROM e1 UNION ALL SELECT b FROM e1) t GROUP BY 1 HAVING count(*) >= 2),
  e2 AS MATERIALIZED (SELECT e1.a, e1.b FROM e1 SEMI JOIN d2 da ON e1.a = da.n SEMI JOIN d2 db ON e1.b = db.n),
  d3 AS MATERIALIZED (SELECT n FROM (SELECT a n FROM e2 UNION ALL SELECT b FROM e2) t GROUP BY 1 HAVING count(*) >= 2),
  e3 AS MATERIALIZED (SELECT e2.a, e2.b FROM e2 SEMI JOIN d3 da ON e2.a = da.n SEMI JOIN d3 db ON e2.b = db.n),
  d4 AS MATERIALIZED (SELECT n FROM (SELECT a n FROM e3 UNION ALL SELECT b FROM e3) t GROUP BY 1 HAVING count(*) >= 2),
  e4 AS MATERIALIZED (SELECT e3.a, e3.b FROM e3 SEMI JOIN d4 da ON e3.a = da.n SEMI JOIN d4 db ON e3.b = db.n),
  nodes AS MATERIALIZED (SELECT DISTINCT n FROM (SELECT a n FROM e4 UNION ALL SELECT b FROM e4) t)
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM e4) n_edges,
    CAST(count(*) AS BIGINT) n_nodes,
    CAST(sum(CASE WHEN n % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) n_parts,
    CAST(sum(CASE WHEN n % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) n_suppliers
  FROM nodes""",
    // round 10: 4-round multi-source BFS layer census (unreached = -1).
    // MATERIALIZED + ANTI JOIN for the same inlining-blowup reason as
    // graph_kcore (each dN is referenced twice by the next round).
    "graph_bfs_layers" ->
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT l_partkey * 2 a, l_suppkey * 2 + 1 b FROM lineitem),
  e AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
  alln AS MATERIALIZED (SELECT DISTINCT a n FROM e),
  d0 AS MATERIALIZED (SELECT DISTINCT s.s_suppkey * 2 + 1 n, CAST(0 AS BIGINT) dist
    FROM supplier s SEMI JOIN alln ON s.s_suppkey * 2 + 1 = alln.n
    WHERE s.s_nationkey = 0),
  f1 AS MATERIALIZED (SELECT DISTINCT x.n FROM
    (SELECT e.b n FROM e JOIN d0 ON e.a = d0.n) x ANTI JOIN d0 ON x.n = d0.n),
  d1 AS MATERIALIZED (SELECT n, dist FROM d0 UNION ALL SELECT n, CAST(1 AS BIGINT) FROM f1),
  f2 AS MATERIALIZED (SELECT DISTINCT x.n FROM
    (SELECT e.b n FROM e JOIN d1 ON e.a = d1.n AND d1.dist = 1) x ANTI JOIN d1 ON x.n = d1.n),
  d2 AS MATERIALIZED (SELECT n, dist FROM d1 UNION ALL SELECT n, CAST(2 AS BIGINT) FROM f2),
  f3 AS MATERIALIZED (SELECT DISTINCT x.n FROM
    (SELECT e.b n FROM e JOIN d2 ON e.a = d2.n AND d2.dist = 2) x ANTI JOIN d2 ON x.n = d2.n),
  d3 AS MATERIALIZED (SELECT n, dist FROM d2 UNION ALL SELECT n, CAST(3 AS BIGINT) FROM f3),
  f4 AS MATERIALIZED (SELECT DISTINCT x.n FROM
    (SELECT e.b n FROM e JOIN d3 ON e.a = d3.n AND d3.dist = 3) x ANTI JOIN d3 ON x.n = d3.n),
  d4 AS MATERIALIZED (SELECT n, dist FROM d3 UNION ALL SELECT n, CAST(4 AS BIGINT) FROM f4)
  SELECT CAST(coalesce(d4.dist, -1) AS BIGINT) dist, CAST(count(*) AS BIGINT) n_nodes
  FROM alln LEFT JOIN d4 ON alln.n = d4.n GROUP BY 1 ORDER BY 1""",
    // round 10: Theil-Sen robust daily-revenue trend (lower median)
    "ts_theil_sen_trend" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) dd,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) c
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
  pr AS (SELECT CAST((b.c - a.c) * 1000000 // (b.dd - a.dd) AS BIGINT) slope_ppm
    FROM daily a JOIN daily b ON b.dd > a.dd),
  t AS (SELECT CAST(count(*) AS BIGINT) n_pairs, list_sort(list(slope_ppm)) sl,
      CAST(sum(slope_ppm) AS BIGINT) ssum FROM pr)
  SELECT n_pairs,
    CAST(sl[CAST((n_pairs + 1) // 2 AS INT)] AS BIGINT) median_slope_ppm,
    CAST(ssum // n_pairs AS BIGINT) mean_slope_ppm
  FROM t""",
    // round 10: lexical diversity per (lang, source)
    "text_ttr_hapax" ->
      """WITH tok AS (SELECT lang, source, unnest(string_split(text, ' ')) tok FROM documents),
  c AS (SELECT lang, source, tok, CAST(count(*) AS BIGINT) c FROM tok GROUP BY 1, 2, 3),
  a AS (SELECT lang, source, CAST(sum(c) AS BIGINT) n_tokens,
      CAST(count(*) AS BIGINT) n_types,
      CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) n_hapax
    FROM c GROUP BY 1, 2)
  SELECT lang, source, n_tokens, n_types, n_hapax,
    CAST(n_types * 1000000 // n_tokens AS BIGINT) ttr_ppm,
    CAST(n_hapax * 1000000 // n_types AS BIGINT) hapax_ppm
  FROM a ORDER BY lang, source""",
    // round 10: split-document stitching pairs (suffix 2-gram == prefix 2-gram)
    "text_boundary_stitch" ->
      """WITH t AS (SELECT doc_id, lang, source, string_split(text, ' ') tk FROM documents),
  f AS (SELECT doc_id, lang, source, tk, len(tk) n FROM t WHERE len(tk) >= 4),
  tails AS (SELECT doc_id a_id, lang, source, array_to_string(tk[n-1:n], ' ') g FROM f),
  heads AS (SELECT doc_id b_id, lang, source, array_to_string(tk[1:2], ' ') g FROM f)
  SELECT a_id, b_id, g FROM tails JOIN heads USING (lang, source, g)
  WHERE a_id <> b_id ORDER BY a_id, b_id LIMIT 2000""",
    // round 10: empirical engagement survival curve
    "events_survival_curve" ->
      """WITH lt AS (SELECT user_id,
      CAST(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS BIGINT) lt
    FROM events GROUP BY 1),
  h AS (SELECT lt, CAST(count(*) AS BIGINT) n FROM lt GROUP BY 1),
  s AS (SELECT unnest(generate_series(0, lt)) t_days, n FROM h),
  g AS (SELECT CAST(t_days AS BIGINT) t_days, CAST(sum(n) AS BIGINT) n_surviving
    FROM s GROUP BY 1),
  tot AS (SELECT CAST(count(*) AS BIGINT) n_users FROM lt)
  SELECT t_days, n_surviving,
    CAST(n_surviving * 1000000 // n_users AS BIGINT) survival_ppm
  FROM g, tot ORDER BY t_days""",
    // round 10: Cohen's kappa between two deterministic flags
    "ml_cohen_kappa" ->
      """WITH f AS (SELECT CASE WHEN value >= 100 THEN 1 ELSE 0 END fa,
      CASE WHEN hour(ts) BETWEEN 9 AND 17 THEN 1 ELSE 0 END fb FROM events),
  a AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(fa) AS BIGINT) pa,
      CAST(sum(fb) AS BIGINT) pb,
      CAST(sum(CASE WHEN fa = fb THEN 1 ELSE 0 END) AS BIGINT) agree FROM f)
  SELECT n, agree,
    CAST(CASE WHEN agree * n - (pa * pb + (n - pa) * (n - pb)) < 0 THEN
      -(((pa * pb + (n - pa) * (n - pb)) - agree * n)::HUGEINT * 1000000 //
        (n::HUGEINT * n - (pa * pb + (n - pa) * (n - pb))))
    ELSE ((agree * n - (pa * pb + (n - pa) * (n - pb)))::HUGEINT * 1000000 //
        (n::HUGEINT * n - (pa * pb + (n - pa) * (n - pb))))
    END AS BIGINT) kappa_ppm
  FROM a""",
    // round 10: Fano-factor burstiness of inter-event gaps, top-20
    "events_fano_burstiness" ->
      """WITH o AS (SELECT user_id,
      epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000, 1)
        OVER (PARTITION BY user_id ORDER BY ts, event_id) gap
    FROM events),
  g AS (SELECT user_id, CAST(count(*) AS BIGINT) n_gaps, CAST(sum(gap) AS BIGINT) sx,
      CAST(sum(gap * gap) AS BIGINT) sx2 FROM o WHERE gap IS NOT NULL GROUP BY 1
      HAVING count(*) >= 3 AND sum(gap) > 0)
  SELECT user_id, n_gaps,
    CAST((n_gaps::HUGEINT * sx2 - sx::HUGEINT * sx) * 1000000 //
         (n_gaps::HUGEINT * sx) AS BIGINT) fano_ppm
  FROM g ORDER BY fano_ppm DESC, user_id LIMIT 20""",
    // round 10: first-after as-of through the forward merge exec —
    // the join_asof_next family oracle (rn=1 == struct-min winner)
    "join_asof_merge_next" ->
      """WITH p AS (SELECT event_id p_id, user_id, ts FROM events WHERE event_type = 'purchase'),
  e AS (SELECT event_id e_id, user_id, ts e_ts FROM events WHERE event_type = 'error'),
  j AS (SELECT p.p_id, e.e_id, e.e_ts,
      row_number() OVER (PARTITION BY p.p_id ORDER BY e.e_ts, e.e_id) rn
    FROM p JOIN e ON p.user_id = e.user_id AND e.e_ts > p.ts)
  SELECT p_id purchase_id, e_id next_error_id, CAST(epoch_us(e_ts) AS BIGINT) next_us
  FROM j WHERE rn = 1 ORDER BY purchase_id LIMIT 2000""",
    // round 10 wave 2: forward-outer as-of through the exec
    "join_asof_merge_next_outer" ->
      """WITH p AS (SELECT event_id p_id, user_id, ts FROM events WHERE event_type = 'purchase'),
  e AS (SELECT event_id e_id, user_id, ts e_ts FROM events WHERE event_type = 'error'),
  j AS (SELECT p.p_id, e.e_id,
      row_number() OVER (PARTITION BY p.p_id ORDER BY e.e_ts, e.e_id) rn
    FROM p JOIN e ON p.user_id = e.user_id AND e.e_ts > p.ts),
  f AS (SELECT p_id, e_id FROM j WHERE rn = 1)
  SELECT p.p_id purchase_id, f.e_id next_error_id,
    CAST(CASE WHEN f.e_id IS NULL THEN 0 ELSE 1 END AS BIGINT) matched
  FROM p LEFT JOIN f ON p.p_id = f.p_id ORDER BY purchase_id LIMIT 2000""",
    // round 10 wave 2: SMA crossover without division (4*sum7 vs sum28)
    "ts_sma_crossover" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) dd,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) c
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
  w AS (SELECT dd,
      CAST(sum(c) OVER (ORDER BY dd ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) sum7,
      CAST(sum(c) OVER (ORDER BY dd ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT) sum28,
      row_number() OVER (ORDER BY dd) rn FROM daily),
  f AS (SELECT dd, sum7, sum28,
      CAST(CASE WHEN sum7 * 4 > sum28 THEN 1 ELSE 0 END AS BIGINT) signal
    FROM w WHERE rn >= 28),
  g AS (SELECT dd, sum7, sum28, signal,
      lag(signal, 1) OVER (ORDER BY dd) prev FROM f)
  SELECT CAST(dd AS VARCHAR) dd, sum7, sum28, signal,
    CAST(CASE WHEN prev IS NULL THEN 0 WHEN signal <> prev THEN 1 ELSE 0 END AS BIGINT) crossed
  FROM g ORDER BY dd""",
    // round 10 wave 2: priority mix shift with YoY share deltas
    "orders_priority_mix_shift" ->
      """WITH yp AS (SELECT CAST(year(o_orderdate) AS BIGINT) yr, o_orderpriority priority,
      CAST(count(*) AS BIGINT) n FROM orders GROUP BY 1, 2),
  s AS (SELECT yr, priority, n,
      CAST(sum(n) OVER (PARTITION BY yr) AS BIGINT) yr_total FROM yp),
  p AS (SELECT yr, priority, n, CAST(n * 1000000 // yr_total AS BIGINT) share_ppm FROM s)
  SELECT yr, priority, n, share_ppm,
    CAST(share_ppm - lag(share_ppm, 1) OVER (PARTITION BY priority ORDER BY yr) AS BIGINT) delta_ppm
  FROM p ORDER BY yr, priority""",
    // round 10 wave 2: per-brand relative variance (squared CV) ppm
    "part_brand_price_dispersion" ->
      """WITH u AS (SELECT p.p_brand, CAST(round(l.l_extendedprice / l.l_quantity * 100) AS BIGINT) uc
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
  a AS (SELECT p_brand, CAST(count(*) AS BIGINT) n, CAST(sum(uc) AS BIGINT) su,
      sum(uc::HUGEINT * uc) sq FROM u GROUP BY 1)
  SELECT p_brand, n,
    CAST((n::HUGEINT * sq - su::HUGEINT * su) * 1000000 // (su::HUGEINT * su) AS BIGINT) rel_var_ppm
  FROM a ORDER BY rel_var_ppm DESC, p_brand LIMIT 20""",
    // round 10 wave 2: nation-pair purchase lift vs independence
    "customer_nation_affinity" ->
      """WITH f AS (SELECT c.c_nationkey bn, s.s_nationkey sn
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey),
  pr AS (SELECT bn, sn, CAST(count(*) AS BIGINT) n_ab FROM f GROUP BY 1, 2),
  ba AS (SELECT bn, CAST(count(*) AS BIGINT) n_a FROM f GROUP BY 1),
  sb AS (SELECT sn, CAST(count(*) AS BIGINT) n_b FROM f GROUP BY 1),
  t AS (SELECT CAST(count(*) AS BIGINT) n_total FROM f)
  SELECT pr.bn, pr.sn, pr.n_ab,
    CAST(pr.n_ab::HUGEINT * t.n_total * 1000000 // (ba.n_a::HUGEINT * sb.n_b) AS BIGINT) lift_ppm
  FROM pr JOIN ba ON pr.bn = ba.bn JOIN sb ON pr.sn = sb.sn CROSS JOIN t
  WHERE pr.n_ab >= 50
  ORDER BY lift_ppm DESC, pr.bn, pr.sn LIMIT 20""",
    // round 10 wave 2: per-nation supplier-revenue HHI ppm
    "supplier_hhi_concentration" ->
      """WITH r AS (SELECT s.s_nationkey, l.l_suppkey,
      CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) r
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2),
  a AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) n_suppliers,
      CAST(sum(r) AS BIGINT) sr, sum(r::HUGEINT * r) sq FROM r GROUP BY 1)
  SELECT n.n_name nation, a.n_suppliers,
    CAST(a.sq * 1000000 // (a.sr::HUGEINT * a.sr) AS BIGINT) hhi_ppm
  FROM a JOIN nation n ON a.s_nationkey = n.n_nationkey ORDER BY nation""",
    // round 10 wave 2: 5-minute error-burst census per day
    "events_error_burst_5m" ->
      """WITH b AS (SELECT CAST(ts AS DATE) dd, epoch_us(ts) // 1000000 // 300 bucket,
      CAST(count(*) AS BIGINT) n_err
    FROM events WHERE event_type = 'error' GROUP BY 1, 2)
  SELECT CAST(dd AS VARCHAR) dd, CAST(count(*) AS BIGINT) n_error_buckets,
    CAST(sum(CASE WHEN n_err >= 3 THEN 1 ELSE 0 END) AS BIGINT) n_burst_buckets,
    CAST(max(n_err) AS BIGINT) max_bucket_errors
  FROM b GROUP BY 1 ORDER BY 1""",
    // round 10 wave 3: degree assortativity, signed r^2 ppm (staged divs)
    "graph_assortativity" ->
      """WITH e AS (SELECT DISTINCT l_partkey * 2 a, l_suppkey * 2 + 1 b FROM lineitem),
  da AS (SELECT a, CAST(count(*) AS BIGINT) dx FROM e GROUP BY 1),
  db AS (SELECT b, CAST(count(*) AS BIGINT) dy FROM e GROUP BY 1),
  j AS (SELECT da.dx, db.dy FROM e JOIN da ON e.a = da.a JOIN db ON e.b = db.b),
  t AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(dx) AS BIGINT) sx,
      CAST(sum(dy) AS BIGINT) sy, sum(dx::HUGEINT * dy) sxy,
      sum(dx::HUGEINT * dx) sxx, sum(dy::HUGEINT * dy) syy FROM j)
  SELECT n n_edges,
    CAST(CASE WHEN n::HUGEINT * sxx - sx::HUGEINT * sx = 0
           OR n::HUGEINT * syy - sy::HUGEINT * sy = 0 THEN 0
      ELSE (CASE WHEN n::HUGEINT * sxy - sx::HUGEINT * sy < 0 THEN -1 ELSE 1 END) *
        ((((n::HUGEINT * sxy - sx::HUGEINT * sy) * (n::HUGEINT * sxy - sx::HUGEINT * sy))
          // (n::HUGEINT * sxx - sx::HUGEINT * sx)) * 1000000
          // (n::HUGEINT * syy - sy::HUGEINT * sy))
      END AS BIGINT) assort_r2_ppm
  FROM t""",
    // round 10 wave 3: DOW seasonal strength, 1 - SSres/SStot ppm
    "ts_seasonal_strength" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) dd,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) c
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
  dw AS (SELECT isodow(dd) % 7 + 1 dow_x, c FROM daily),
  g AS (SELECT dow_x, CAST(count(*) AS BIGINT) ng, CAST(sum(c) AS BIGINT) sg,
      sum(c::HUGEINT * c) qg FROM dw GROUP BY 1),
  r AS (SELECT sum((ng::HUGEINT * qg - sg::HUGEINT * sg) // ng) ssres FROM g),
  t AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(c) AS BIGINT) sc,
      sum(c::HUGEINT * c) qc FROM daily),
  tt AS (SELECT n, (n::HUGEINT * qc - sc::HUGEINT * sc) // n sstot FROM t)
  SELECT tt.n n_days,
    CAST(CASE WHEN tt.sstot = 0 THEN 0
      ELSE 1000000 - (r.ssres * 1000000 // tt.sstot) END AS BIGINT) seasonal_strength_ppm
  FROM tt, r""",
    // round 10 wave 3: exact-duplicate rate per source (md5-compared)
    "corpus_dedup_rate_by_source" ->
      """WITH h AS (SELECT source, md5(text) h FROM documents),
  a AS (SELECT source, CAST(count(*) AS BIGINT) n_docs,
      CAST(count(DISTINCT h) AS BIGINT) n_distinct FROM h GROUP BY 1)
  SELECT source, n_docs, n_distinct,
    CAST((n_docs - n_distinct) * 1000000 // n_docs AS BIGINT) dup_ppm
  FROM a ORDER BY source""",
    // round 10 wave 3: top-1000 trigram coverage share
    "text_ngram_coverage" ->
      """WITH tk AS (SELECT string_split(text, ' ') t FROM documents),
  g AS (SELECT unnest(list_transform(generate_series(1, len(t) - 2),
      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) g FROM tk),
  c AS (SELECT g, CAST(count(*) AS BIGINT) c FROM g GROUP BY 1),
  top AS (SELECT CAST(sum(c) AS BIGINT) top_c FROM
    (SELECT c FROM c ORDER BY c DESC, g LIMIT 1000)),
  t AS (SELECT CAST(count(*) AS BIGINT) n_distinct, CAST(sum(c) AS BIGINT) n_total FROM c)
  SELECT t.n_total, t.n_distinct, top.top_c,
    CAST(top.top_c * 1000000 // t.n_total AS BIGINT) top1000_share_ppm
  FROM t, top""",
    // round 10 wave 3: per-dimension embedding variance (fixed-scale quantized)
    "embedding_dim_variance" ->
      """WITH q AS (SELECT unnest(list_transform(embedding::DOUBLE[],
      x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT))) q,
      CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) dim
    FROM embeddings),
  a AS (SELECT dim, CAST(count(*) AS BIGINT) n, CAST(sum(q) AS BIGINT) sq,
      sum(q::HUGEINT * q) sq2 FROM q GROUP BY 1)
  SELECT dim, n, CAST(sq // n AS BIGINT) q_mean_milli,
    CAST((n::HUGEINT * sq2 - sq::HUGEINT * sq) // (n::HUGEINT * n) AS BIGINT) q_var
  FROM a ORDER BY dim""",
    // round 10: supply-chain concentration census by supplier-nation count
    "part_supply_risk" ->
      """WITH u AS (SELECT l_partkey, s_nationkey,
      CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT) uc
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
  p AS (SELECT l_partkey, CAST(count(DISTINCT s_nationkey) AS BIGINT) n_nations,
      CAST(max(uc) - min(uc) AS BIGINT) spread_c FROM u GROUP BY 1)
  SELECT n_nations, CAST(count(*) AS BIGINT) n_parts,
    CAST(sum(spread_c) AS BIGINT) sum_spread_cents
  FROM p GROUP BY 1 ORDER BY 1""",
  )
}
