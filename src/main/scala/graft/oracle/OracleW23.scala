package graft.oracle

/** Round-13 wave-2 oracle SQL — validated DuckDB equivalents per
  * SURVEY §2.4, conventions as [[OracleW22]].
  */
object OracleW23 {

  val sql: Map[String, String] = Map(
    "li_discount_tax_interaction" ->
      """WITH t AS (SELECT CAST(round(l_discount * 100) AS BIGINT) disc_pct,
      CAST(round(l_tax * 100) AS BIGINT) tax_pct,
      CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT) net
    FROM lineitem)
  SELECT disc_pct, tax_pct, CAST(count(*) AS BIGINT) n_lines,
    CAST(sum(net) // count(*) AS BIGINT) avg_net_cents
  FROM t GROUP BY 1, 2 ORDER BY 1, 2""",

    "orders_first_order_value_cohort" ->
      """WITH o AS (SELECT o_custkey ck,
      struct_pack(dt := CAST(o_orderdate AS DATE), ok := o_orderkey,
        c := CAST(round(o_totalprice * 100) AS BIGINT)) st,
      CAST(round(o_totalprice * 100) AS BIGINT) c FROM orders),
  pc AS (SELECT ck, struct_extract(min(st), 'c') first_c,
      CAST(sum(c) AS BIGINT) total_c, CAST(count(*) AS BIGINT) n_orders
    FROM o GROUP BY ck)
  SELECT CAST(first_c // 4194304 AS BIGINT) first_band,
    CAST(count(*) AS BIGINT) n_customers,
    CAST(sum(total_c) * 1000000 // sum(first_c) AS BIGINT) lifetime_multiple_ppm,
    CAST(sum(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
      repeat_ppm
  FROM pc GROUP BY 1 ORDER BY 1""",

    "events_value_dispersion" ->
      """WITH t AS (SELECT event_type etype, CAST(round("value" * 100) AS BIGINT) c
    FROM events WHERE event_type = 'purchase')
  SELECT etype, CAST(count(*) AS BIGINT) n, CAST(sum(c) AS BIGINT) sum_cents,
    CAST(count(*)::HUGEINT * sum(c::HUGEINT * c)
      - sum(c)::HUGEINT * sum(c) AS VARCHAR) var_num
  FROM t GROUP BY etype ORDER BY etype""",

    "part_brand_size_span" ->
      """SELECT p_brand brand, CAST(count(*) AS BIGINT) n_parts,
    CAST(count(DISTINCT p_size) AS BIGINT) n_sizes,
    CAST(count(DISTINCT p_type) AS BIGINT) n_types,
    CAST(min(p_size) AS BIGINT) min_size, CAST(max(p_size) AS BIGINT) max_size,
    CAST(min(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) min_retail_cents,
    CAST(max(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) max_retail_cents
  FROM part GROUP BY 1 ORDER BY 1""",

    "customer_nation_segment_mix" ->
      """WITH m AS (SELECT n_name nation, c_mktsegment segment,
      CAST(count(*) AS BIGINT) n_customers,
      CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) bal_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2)
  SELECT nation, segment, n_customers, bal_cents,
    CAST(n_customers * 1000000 // sum(n_customers) OVER (PARTITION BY nation)
      AS BIGINT) nation_share_ppm
  FROM m ORDER BY nation, segment""",

    "ts_quarter_growth_yoy" ->
      """WITH q AS (SELECT CAST(year(o_orderdate) AS BIGINT) yr,
      CAST(quarter(o_orderdate) AS BIGINT) qtr,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) rev_cents
    FROM orders GROUP BY 1, 2),
  l AS (SELECT yr, qtr, rev_cents,
      lag(rev_cents) OVER (PARTITION BY qtr ORDER BY yr) prev FROM q)
  SELECT yr, qtr, rev_cents,
    CAST((rev_cents - prev) * 1000000 // prev AS BIGINT) yoy_ppm
  FROM l WHERE prev IS NOT NULL ORDER BY yr, qtr""",

    "dq_status_consistency" ->
      """WITH t AS (SELECT o_orderstatus ostatus, l_linestatus lstatus,
      CAST(count(*) AS BIGINT) n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2)
  SELECT ostatus, lstatus, n_lines,
    CAST(n_lines * 1000000 // sum(n_lines) OVER (PARTITION BY ostatus) AS BIGINT)
      share_ppm
  FROM t ORDER BY ostatus, lstatus""",

    "expr_date_boundaries" ->
      """WITH o AS (SELECT date_trunc('month', o_orderdate) mstart,
      CAST(o_orderdate AS DATE) dt, last_day(CAST(o_orderdate AS DATE)) mend
    FROM orders)
  SELECT CAST(CAST(mstart AS DATE) AS VARCHAR) mstart,
    CAST(max(mend) AS VARCHAR) mend,
    CAST(max(day(mend)) AS BIGINT) days_in_month,
    CAST(count(*) AS BIGINT) n_orders,
    CAST(sum(CASE WHEN datediff('day', dt, mend) < 7 THEN 1 ELSE 0 END) * 1000000
      // count(*) AS BIGINT) final_week_ppm
  FROM o GROUP BY 1 ORDER BY 1""",

    "customer_acquisition_monthly" ->
      """WITH f AS (SELECT o_custkey, CAST(min(date_trunc('month', o_orderdate)) AS DATE) fm
    FROM orders GROUP BY 1),
  m AS (SELECT fm, CAST(count(*) AS BIGINT) new_customers FROM f GROUP BY fm)
  SELECT CAST(fm AS VARCHAR) fm, new_customers,
    CAST(sum(new_customers) OVER (ORDER BY fm
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum_customers
  FROM m ORDER BY fm""",

    "part_type_brand_hhi" ->
      """WITH tb AS (SELECT p_type ptype, p_brand, CAST(count(*) AS BIGINT) n
    FROM part GROUP BY 1, 2)
  SELECT ptype, CAST(count(*) AS BIGINT) n_brands,
    CAST((sum(n::HUGEINT * n) * 1000000) // (sum(n)::HUGEINT * sum(n)) AS BIGINT)
      hhi_ppm
  FROM tb GROUP BY ptype ORDER BY ptype""",

    "dq_clock_uniformity" ->
      """WITH m AS (SELECT CAST(minute(ts) AS BIGINT) moh, CAST(count(*) AS BIGINT) n
    FROM events GROUP BY 1),
  tot AS (SELECT CAST(sum(n) AS BIGINT) nn FROM m)
  SELECT moh, n,
    CAST((60 * n - nn)::HUGEINT * (60 * n - nn) AS VARCHAR) dev_sq
  FROM m CROSS JOIN tot ORDER BY moh""",

    "orders_priority_value_quartiles" ->
      """WITH o AS (SELECT o_orderpriority prio,
      CAST(round(o_totalprice * 100) AS BIGINT) c, o_orderkey ok FROM orders),
  ranked AS (SELECT prio, c,
      row_number() OVER (PARTITION BY prio ORDER BY c, ok) rn,
      count(*) OVER (PARTITION BY prio) cn FROM o)
  SELECT prio, CAST(count(*) AS BIGINT) n_orders,
    CAST(max(CASE WHEN rn = (cn + 3) // 4 THEN c END) AS BIGINT) q1_cents,
    CAST(max(CASE WHEN rn = (cn + 1) // 2 THEN c END) AS BIGINT) med_cents,
    CAST(max(CASE WHEN rn = (3 * cn + 3) // 4 THEN c END) AS BIGINT) q3_cents
  FROM ranked GROUP BY prio ORDER BY prio""",

    "li_qty_return_rate" ->
      """WITH t AS (SELECT (CAST(floor(l_quantity) AS BIGINT) - 1) // 5 qty_band,
      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END r FROM lineitem)
  SELECT qty_band, CAST(count(*) AS BIGINT) n_lines,
    CAST(sum(r) AS BIGINT) n_returned,
    CAST(sum(r) * 1000000 // count(*) AS BIGINT) return_ppm
  FROM t GROUP BY 1 ORDER BY 1""",

    "dq_same_day_orders" ->
      """WITH cd AS (SELECT o_custkey, CAST(o_orderdate AS DATE) dt,
      CAST(count(*) AS BIGINT) k FROM orders GROUP BY 1, 2)
  SELECT k orders_per_day, CAST(count(*) AS BIGINT) n_customer_days,
    CAST(count(DISTINCT o_custkey) AS BIGINT) n_customers
  FROM cd GROUP BY 1 ORDER BY 1""",

    "embedding_label_norm_gap" ->
      """WITH n AS (SELECT CAST("label" AS BIGINT) AS "label",
      list_sum(list_transform(embedding::DOUBLE[],
        x -> CAST(round(x * 1000) AS BIGINT) * CAST(round(x * 1000) AS BIGINT))) nrm
    FROM embeddings),
  bl AS (SELECT "label", CAST(count(*) AS BIGINT) n_vecs,
      CAST(sum(nrm) AS BIGINT) snrm FROM n GROUP BY 1),
  g AS (SELECT CAST(sum(n_vecs) AS BIGINT) tn, CAST(sum(snrm) AS BIGINT) ts FROM bl)
  SELECT "label", n_vecs, CAST(snrm // n_vecs AS BIGINT) mean_sqnorm_milli2,
    CAST(((snrm::HUGEINT * tn - ts::HUGEINT * n_vecs) * 1000000)
      // (ts::HUGEINT * n_vecs) AS BIGINT) gap_ppm
  FROM bl CROSS JOIN g ORDER BY 1""",

    "text_first_token_census" ->
      """SELECT lang, string_split(text, ' ')[1] first_token,
    CAST(count(*) AS BIGINT) n_docs
  FROM documents GROUP BY 1, 2
  ORDER BY n_docs DESC, lang, first_token LIMIT 30""",
  )
}
