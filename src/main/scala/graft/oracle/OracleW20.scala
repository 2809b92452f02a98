package graft.oracle

/** Round-11 wave oracle SQL — validated DuckDB equivalents per SURVEY
  * §2.4. Same conventions as [[OracleW18]]/[[OracleW19]]: integer
  * cents via round(x*100), ppm via truncating `//` (truncates toward
  * zero exactly like Spark's `div`), HUGEINT mirroring DECIMAL(38)
  * for >2⁶³ intermediate products, bounded-domain lists for medians.
  */
object OracleW20 {

  val sql: Map[String, String] = Map(
    // round 11: like-for-like ingest-only face of the incremental
    // dedup component (VERDICT r10 task 6) — the SAME contract as
    // `dedup_incremental_ingest` (the prepared-environment Spark side
    // emits identical pairs; DuckDB's one restricted join never paid
    // the environment build either way, which is what made the
    // composite row misread)
    "dedup_ingest_only" ->
      """WITH toks AS (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) tk FROM documents)
  SELECT a.doc_id a_id, b.doc_id b_id FROM toks a JOIN toks b
  ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.tk,b.tk))::DOUBLE / len(list_distinct(a.tk || b.tk)) >= 0.9
    AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
  ORDER BY 1,2 LIMIT 2000""",
    // round 11: line price vs catalog (quantity × retail) census
    "recon_unit_price_vs_retail" ->
      """WITH d AS (SELECT CAST(year(l_shipdate) AS BIGINT) yr,
      CAST(round(l_extendedprice * 100) AS BIGINT)
        - CAST(round(l_quantity * p_retailprice * 100) AS BIGINT) dev
    FROM lineitem JOIN part ON l_partkey = p_partkey)
  SELECT yr, CASE WHEN dev < 0 THEN 'a_below' WHEN dev = 0 THEN 'b_at'
      ELSE 'c_above' END bucket,
    CAST(count(*) AS BIGINT) n_lines, CAST(sum(dev) AS BIGINT) dev_cents
  FROM d GROUP BY 1, 2 ORDER BY 1, 2""",
    // round 11: exact two-sample KS statistic, weekday vs weekend
    // purchase values (ppm; cum diffs scaled by opposite totals)
    "ml_ks_weekday_weekend" ->
      """WITH p AS (SELECT CAST(round(value * 100) AS BIGINT) v,
      CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END we
    FROM events WHERE event_type = 'purchase'),
  tot AS (SELECT CAST(sum(1 - we) AS BIGINT) nw, CAST(sum(we) AS BIGINT) ne FROM p),
  g AS (SELECT v, CAST(sum(1 - we) AS BIGINT) cw, CAST(sum(we) AS BIGINT) ce
    FROM p GROUP BY 1),
  c AS (SELECT CAST(sum(cw * (SELECT ne FROM tot) - ce * (SELECT nw FROM tot))
      OVER (ORDER BY v) AS BIGINT) dv FROM g)
  SELECT (SELECT nw FROM tot) n_weekday, (SELECT ne FROM tot) n_weekend,
    CAST(max(abs(dv)) * 1000000 // ((SELECT nw FROM tot) * (SELECT ne FROM tot)) AS BIGINT) ks_ppm
  FROM c""",
    // round 11: per-label centroid shift vs global centroid, quantized
    // milli² units ×10⁶ (HUGEINT mirror of the DECIMAL(38) staging)
    "embedding_centroid_shift" ->
      """WITH q AS (SELECT CAST("label" AS BIGINT) lab,
      unnest(list_transform(embedding::DOUBLE[],
        x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT))) q,
      CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) dim
    FROM embeddings),
  pl AS (SELECT lab, dim, CAST(sum(q) AS BIGINT) sl, CAST(count(*) AS BIGINT) nl
    FROM q GROUP BY 1, 2),
  gl AS (SELECT dim, CAST(sum(q) AS BIGINT) sg, CAST(count(*) AS BIGINT) ng
    FROM q GROUP BY 1),
  j AS (SELECT lab, nl, ng, sl::HUGEINT * ng - sg::HUGEINT * nl num
    FROM pl JOIN gl USING (dim))
  SELECT lab, CAST(max(nl) AS BIGINT) n_vecs,
    CAST(sum(num * num) * 1000000
      // (max(nl)::HUGEINT * max(nl) * max(ng) * max(ng)) AS BIGINT) shift2_micro
  FROM j GROUP BY 1 ORDER BY 1""",
    // round 11: systematic every-20th sample in md5(doc_id) order
    "sample_systematic" ->
      """SELECT doc_id, rn FROM (SELECT doc_id,
    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) rn
  FROM documents) WHERE rn % 20 = 1 ORDER BY rn LIMIT 2000""",
    // round 11: pairwise cos²·10⁶ of event types' hour-of-day profiles
    "events_type_hour_cosine" ->
      """WITH c AS (SELECT event_type t, hour(ts) h, CAST(count(*) AS BIGINT) c
    FROM events GROUP BY 1, 2),
  dots AS (SELECT a.t ta, b.t tb, sum(a.c::HUGEINT * b.c) dot
    FROM c a JOIN c b ON a.h = b.h AND a.t < b.t GROUP BY 1, 2),
  norms AS (SELECT t, sum(c::HUGEINT * c) n2 FROM c GROUP BY 1)
  SELECT ta, tb, CAST(dot * dot * 1000000 // (na.n2 * nb.n2) AS BIGINT) cos2_ppm
  FROM dots JOIN norms na ON dots.ta = na.t JOIN norms nb ON dots.tb = nb.t
  ORDER BY ta, tb""",
    // round 11: χ² independence of priority × status over the full
    // grid (absent cells count 0), per-cell truncating-div sum
    "ml_chi2_priority_status" ->
      """WITH o AS (SELECT o_orderpriority pr, o_orderstatus st FROM orders),
  cells AS (SELECT pr, st, CAST(count(*) AS BIGINT) n FROM o GROUP BY 1, 2),
  r AS (SELECT pr, CAST(count(*) AS BIGINT) r FROM o GROUP BY 1),
  c AS (SELECT st, CAST(count(*) AS BIGINT) c FROM o GROUP BY 1),
  t AS (SELECT CAST(count(*) AS BIGINT) nn FROM o),
  g AS (SELECT r.pr, c.st, r.r, c.c, coalesce(cells.n, 0) nij, (SELECT nn FROM t) nn
    FROM r CROSS JOIN c LEFT JOIN cells ON r.pr = cells.pr AND c.st = cells.st)
  SELECT CAST(sum(CAST((nij::HUGEINT * nn - r::HUGEINT * c)
        * (nij::HUGEINT * nn - r::HUGEINT * c) * 1000000
        // (nn::HUGEINT * r * c) AS BIGINT)) AS BIGINT) chi2_ppm,
    CAST(count(*) AS BIGINT) n_cells, CAST(max(nn) AS BIGINT) n
  FROM g""",
    // round 11: strict local maxima (±3 rows) of daily purchase revenue
    "ts_peak_days" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) dd,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) rev_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
  w AS (SELECT dd, rev_cents,
      max(rev_cents) OVER (ORDER BY dd ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) mxp,
      max(rev_cents) OVER (ORDER BY dd ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) mxn
    FROM daily)
  SELECT CAST(dd AS VARCHAR) dd, rev_cents,
    CASE WHEN rev_cents > coalesce(mxp, -9223372036854775808)
      AND rev_cents > coalesce(mxn, -9223372036854775808) THEN 1 ELSE 0 END is_peak
  FROM w ORDER BY dd""",
    // round 11: discount policy by quantity band (bp mean, zero share)
    "dq_discount_band_audit" ->
      """WITH l AS (SELECT (CAST(floor(l_quantity) AS BIGINT) - 1) // 10 qty_band,
      CAST(round(l_discount * 10000) AS BIGINT) bp FROM lineitem)
  SELECT qty_band, CAST(count(*) AS BIGINT) n_lines,
    CAST(sum(bp) // count(*) AS BIGINT) avg_disc_bp,
    CAST(sum(CASE WHEN bp = 0 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) zero_disc_ppm
  FROM l GROUP BY 1 ORDER BY 1""",
    // round 11: token budget per document-length decile
    "corpus_length_token_deciles" ->
      """WITH d AS (SELECT doc_id, n_chars,
      CAST(len(string_split(text, ' ')) AS BIGINT) toks,
      CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) decile
    FROM documents)
  SELECT decile, CAST(count(*) AS BIGINT) n_docs, CAST(sum(toks) AS BIGINT) tokens,
    CAST(min(n_chars) AS BIGINT) min_chars
  FROM d GROUP BY 1 ORDER BY 1""",
    // round 11: GROUP BY ALL face — explicit list states the semantics
    "sql_group_by_all" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) n,
    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) rev_cents
  FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    // round 11 wave 2: repeat-order share per month (strictly-earlier
    // order date = repeat; first-day ties stay first)
    "orders_repeat_share_monthly" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) dt FROM orders),
  f AS (SELECT o_custkey, min(dt) fd FROM o GROUP BY 1),
  j AS (SELECT CAST(year(dt) * 100 + month(dt) AS BIGINT) ym,
      CASE WHEN dt > fd THEN 1 ELSE 0 END rep FROM o JOIN f USING (o_custkey))
  SELECT ym, CAST(count(*) AS BIGINT) n_orders, CAST(sum(rep) AS BIGINT) n_repeat,
    CAST(sum(rep) * 1000000 // count(*) AS BIGINT) repeat_ppm
  FROM j GROUP BY 1 ORDER BY 1""",
    // round 11 wave 2: per-user mean/max whole-second gaps between
    // consecutive error events (per-gap truncation, then truncating mean)
    "events_error_mtbf" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) us, event_id FROM events
    WHERE event_type = 'error'),
  g AS (SELECT user_id,
      (us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)) // 1000000 gap_s
    FROM e)
  SELECT user_id, CAST(count(*) AS BIGINT) n_gaps,
    CAST(sum(gap_s) // count(*) AS BIGINT) mean_gap_s,
    CAST(max(gap_s) AS BIGINT) max_gap_s
  FROM g WHERE gap_s IS NOT NULL GROUP BY 1 ORDER BY 1""",
    // round 11 wave 2: exact cosine 1-NN label purity per label over
    // every 10th query vector (contract-quadratic eval)
    "ml_knn_label_purity" ->
      """WITH sims AS (SELECT e1.vec_id q, CAST(e1."label" AS BIGINT) ql,
      CAST(e2."label" AS BIGINT) nl, e2.vec_id n,
      list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) s
    FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id <> e2.vec_id
    WHERE e1.vec_id % 10 = 0),
  nn AS (SELECT q, ql, nl FROM (SELECT q, ql, nl,
      row_number() OVER (PARTITION BY q ORDER BY s DESC, n) rn FROM sims) t
    WHERE rn = 1)
  SELECT ql lab, CAST(count(*) AS BIGINT) n_queries,
    CAST(sum(CASE WHEN nl = ql THEN 1 ELSE 0 END) AS BIGINT) n_same,
    CAST(sum(CASE WHEN nl = ql THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) purity_ppm
  FROM nn GROUP BY 1 ORDER BY 1""",
    // round 11 wave 2: winsorized vs raw daily mean purchase cents
    "ts_winsorized_daily_mean" ->
      """WITH p AS (SELECT CAST(ts AS DATE) dd, CAST(round(value * 100) AS BIGINT) v
    FROM events WHERE event_type = 'purchase'),
  b AS (SELECT dd, CAST(round(quantile_cont(v, 0.1)) AS BIGINT) lo,
      CAST(round(quantile_cont(v, 0.9)) AS BIGINT) hi FROM p GROUP BY 1),
  w AS (SELECT p.dd, v, greatest(lo, least(hi, v)) wv FROM p JOIN b ON p.dd = b.dd)
  SELECT CAST(dd AS VARCHAR) dd, CAST(count(*) AS BIGINT) n,
    CAST(sum(v) // count(*) AS BIGINT) mean_cents,
    CAST(sum(wv) // count(*) AS BIGINT) wins_mean_cents
  FROM w GROUP BY 1 ORDER BY 1""",
    // round 11 wave 2: per-language token-length profile
    "text_word_length_profile" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) tok FROM documents)
  SELECT lang, CAST(count(*) AS BIGINT) n_tokens,
    CAST(sum(length(tok)) * 100 // count(*) AS BIGINT) avg_len_centi,
    CAST(sum(CASE WHEN length(tok) >= 8 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) long_tok_ppm
  FROM t WHERE tok <> '' GROUP BY 1 ORDER BY 1""",
    // round 11 wave 2: per-type median retail cents vs global median
    "part_type_price_median_gap" ->
      """WITH p AS (SELECT p_type, CAST(round(p_retailprice * 100) AS BIGINT) c FROM part),
  m AS (SELECT p_type, CAST(count(*) AS BIGINT) n_parts,
      CAST(round(quantile_cont(c, 0.5)) AS BIGINT) med_cents FROM p GROUP BY 1),
  g AS (SELECT CAST(round(quantile_cont(c, 0.5)) AS BIGINT) gmed FROM p)
  SELECT p_type, n_parts, med_cents,
    CAST((med_cents - gmed) * 1000000 // gmed AS BIGINT) gap_ppm
  FROM m CROSS JOIN g ORDER BY p_type""",
    // round 11 wave 2: peak concurrent user-sessions per day via the
    // +1/-1 boundary sweep over per-(user, day) active-minute bounds
    "events_peak_concurrency_daily" ->
      """WITH s AS (SELECT CAST(ts AS DATE) dd, user_id,
      min(epoch_us(ts) // 60000000) mn, max(epoch_us(ts) // 60000000) mx
    FROM events GROUP BY 1, 2),
  d AS (SELECT dd, m, CAST(sum(delta) AS BIGINT) delta FROM (
      SELECT dd, mn m, 1 delta FROM s UNION ALL SELECT dd, mx + 1, -1 FROM s)
    GROUP BY 1, 2),
  c AS (SELECT dd, sum(delta) OVER (PARTITION BY dd ORDER BY m
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) conc FROM d)
  SELECT CAST(p.dd AS VARCHAR) dd, n_sessions, peak_concurrent FROM
    (SELECT dd, CAST(max(conc) AS BIGINT) peak_concurrent FROM c GROUP BY 1) p
    JOIN (SELECT dd, CAST(count(*) AS BIGINT) n_sessions FROM s GROUP BY 1) n
    ON p.dd = n.dd ORDER BY 1""",
    // round 11 wave 3: FK fan-out profile (children per parent)
    "dq_fk_fanout_profile" ->
      """WITH co AS (SELECT o_custkey pk, CAST(count(*) AS BIGINT) c FROM orders GROUP BY 1),
  ol AS (SELECT l_orderkey pk, CAST(count(*) AS BIGINT) c FROM lineitem GROUP BY 1),
  a AS (SELECT 'customer->orders' relation, CAST(count(*) AS BIGINT) n_parents,
      CAST(min(c) AS BIGINT) min_fanout, CAST(sum(c) * 100 // count(*) AS BIGINT) avg_fanout_centi,
      CAST(max(c) AS BIGINT) max_fanout FROM co),
  b AS (SELECT 'orders->lineitem' relation, CAST(count(*) AS BIGINT) n_parents,
      CAST(min(c) AS BIGINT) min_fanout, CAST(sum(c) * 100 // count(*) AS BIGINT) avg_fanout_centi,
      CAST(max(c) AS BIGINT) max_fanout FROM ol)
  SELECT * FROM a UNION ALL SELECT * FROM b ORDER BY relation""",
    // round 11 wave 3: exact integer variance of daily purchase cents
    // per absolute 7-day grid week (epoch-day div 7)
    "ts_revenue_volatility_weekly" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) dd,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) x
    FROM events WHERE event_type = 'purchase' GROUP BY 1)
  SELECT CAST(datediff('day', DATE '1970-01-01', dd) // 7 AS BIGINT) wk,
    CAST(count(*) AS BIGINT) n_days, CAST(sum(x) AS BIGINT) week_cents,
    CAST((count(*)::HUGEINT * sum(x::HUGEINT * x) - sum(x)::HUGEINT * sum(x))
      // (count(*)::HUGEINT * count(*)) AS BIGINT) day_var_cents2
  FROM daily GROUP BY 1 ORDER BY 1""",
    // round 11 wave 3: new vs returning users per active day
    "events_new_vs_returning_daily" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) dd FROM events),
  f AS (SELECT user_id, min(dd) fd FROM a GROUP BY 1)
  SELECT CAST(a.dd AS VARCHAR) dd,
    CAST(sum(CASE WHEN a.dd = fd THEN 1 ELSE 0 END) AS BIGINT) new_users,
    CAST(sum(CASE WHEN a.dd > fd THEN 1 ELSE 0 END) AS BIGINT) returning_users
  FROM a JOIN f USING (user_id) GROUP BY 1 ORDER BY 1""",
    // round 11 wave 3: customers by distinct-active-month count
    "customer_active_months_histogram" ->
      """WITH m AS (SELECT DISTINCT o_custkey,
      CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) ym FROM orders),
  c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) m FROM m GROUP BY 1)
  SELECT m active_months, CAST(count(*) AS BIGINT) n_customers
  FROM c GROUP BY 1 ORDER BY 1""",
    // round 11 wave 4: order-status vs line-status consistency matrix
    "recon_order_lifecycle" ->
      """WITH p AS (SELECT l_orderkey ok,
      CASE WHEN sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) = count(*) THEN 'all_F'
        WHEN sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) = 0 THEN 'all_O'
        ELSE 'mixed' END profile
    FROM lineitem GROUP BY 1),
  j AS (SELECT o_orderstatus status, coalesce(profile, 'no_lines') profile
    FROM orders LEFT JOIN p ON o_orderkey = p.ok)
  SELECT status, profile, CAST(count(*) AS BIGINT) n_orders,
    CAST(CASE WHEN (status = 'F' AND profile = 'all_F')
      OR (status = 'O' AND profile = 'all_O')
      OR (status = 'P' AND profile = 'mixed') THEN 1 ELSE 0 END AS BIGINT) is_consistent
  FROM j GROUP BY 1, 2 ORDER BY 1, 2""",
    // round 11 wave 4: round-number bias in order totals
    "orders_price_round_bias" ->
      """WITH o AS (SELECT o_orderstatus status,
      CAST(round(o_totalprice * 100) AS BIGINT) c FROM orders)
  SELECT status, CAST(count(*) AS BIGINT) n_orders,
    CAST(sum(CASE WHEN c % 100 = 0 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) cents00_ppm,
    CAST(sum(CASE WHEN c % 10000 = 0 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) dollar100_ppm
  FROM o GROUP BY 1 ORDER BY 1""",
    // round 11 wave 4: balance-share vs revenue-share by market segment
    "segment_wallet_share" ->
      """WITH rev AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) r
    FROM orders GROUP BY 1),
  seg AS (SELECT c_mktsegment segment, CAST(count(*) AS BIGINT) n_customers,
      CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) bal_cents,
      CAST(sum(coalesce(r, 0)) AS BIGINT) rev_cents
    FROM customer LEFT JOIN rev ON c_custkey = o_custkey GROUP BY 1),
  t AS (SELECT CAST(sum(bal_cents) AS BIGINT) tb, CAST(sum(rev_cents) AS BIGINT) tr FROM seg)
  SELECT segment, n_customers, bal_cents, rev_cents,
    CAST(bal_cents * 1000000 // (SELECT tb FROM t) AS BIGINT) bal_share_ppm,
    CAST(rev_cents * 1000000 // (SELECT tr FROM t) AS BIGINT) rev_share_ppm
  FROM seg ORDER BY segment""",
    // round 11 wave 4: peak activity hour per type, first vs second
    // half of month (ties -> later hour via (count, hour) max)
    "events_peak_hour_shift" ->
      """WITH h AS (SELECT event_type t,
      CASE WHEN day(ts) <= 15 THEN 'h1' ELSE 'h2' END half,
      CAST(hour(ts) AS BIGINT) h, CAST(count(*) AS BIGINT) c
    FROM events GROUP BY 1, 2, 3),
  pk AS (SELECT t, half, max(struct_pack(c := c, h := h)).h peak FROM h GROUP BY 1, 2)
  SELECT a.t, a.peak peak_h1, b.peak peak_h2, b.peak - a.peak shift_hours
  FROM pk a JOIN pk b ON a.t = b.t AND a.half = 'h1' AND b.half = 'h2'
  ORDER BY a.t""",
  )
}
