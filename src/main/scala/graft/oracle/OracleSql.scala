package graft.oracle

/** The validated DuckDB oracle SQL for every declared query —
  * SURVEY.md Appendix A, verbatim (executed and validated against
  * DuckDB 1.0 on sf0.01/sf0.1 by the survey session). The driver runs
  * these over the same parquet tables and hash-compares against the
  * Spark results (column names must match — SURVEY §2.1).
  */
object OracleSql {

  /** PageRank oracle: the same six integer-exact rounds
    * [[graft.ops.Scale.pagerankInt]] runs, as chained non-recursive
    * CTEs (fixed iteration count is what keeps this plain SQL —
    * standard recursive CTEs forbid aggregation in the recursive
    * term).
    */
  private val pagerankSql: String = {
    val iters = (1 to 6).map { i =>
      s"""c$i AS (SELECT e.dst node, sum(r.rank // o.outdeg) s
    FROM edges e JOIN r${i - 1} r ON e.src = r.node JOIN outd o ON e.src = o.src
    GROUP BY 1),
  r$i AS (SELECT n.node, CAST(150000 + ((coalesce(c.s, 0) * 85) // 100) AS BIGINT) rank
    FROM nodes n LEFT JOIN c$i c ON n.node = c.node)"""
    }.mkString(",\n  ")
    s"""WITH li AS (SELECT DISTINCT l_suppkey sk, l_partkey pk FROM lineitem),
  edges AS (SELECT pk*2 src, sk*2+1 dst FROM li UNION ALL SELECT sk*2+1, pk*2 FROM li),
  outd AS (SELECT src, CAST(count(*) AS BIGINT) outdeg FROM edges GROUP BY 1),
  nodes AS (SELECT DISTINCT src node FROM edges),
  r0 AS (SELECT node, CAST(1000000 AS BIGINT) rank FROM nodes),
  $iters
  SELECT node, rank FROM r6 ORDER BY rank DESC, node LIMIT 50"""
  }

  /** Round-4 waves 8–9 (SURVEY §2.9): the subquery family + the
    * function-family surface. The correlated-subquery texts
    * (`q2/q17/q21/q22/join_lateral_topk`) are engine-portable and run
    * VERBATIM on both engines — [[graft.ops.Subqueries]] feeds them to
    * `spark.sql` so Catalyst's decorrelation is exercised on exactly
    * the SQL the oracle executes.
    */
  private val wave89: Map[String, String] = Map(
    "q2_min_cost_part" ->
      """SELECT p.p_partkey, p.p_name, p.p_size, CAST(round(p.p_retailprice*100) AS BIGINT) price_cents
  FROM part p
  WHERE p.p_type LIKE 'ECONOMY%'
    AND p.p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
                           WHERE p2.p_size = p.p_size AND p2.p_type LIKE 'ECONOMY%')
  ORDER BY p.p_partkey""",
    "q4_late_orders" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) n_orders
  FROM orders o
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
    AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
  GROUP BY 1 ORDER BY 1""",
    "q7_volume_shipping" ->
      """SELECT r1.r_name supp_region, r2.r_name cust_region, year(l.l_shipdate) l_year,
    CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS BIGINT) rev_cents
  FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
    JOIN customer c ON o.o_custkey=c.c_custkey
    JOIN supplier s ON l.l_suppkey=s.s_suppkey
    JOIN nation n1 ON s.s_nationkey=n1.n_nationkey JOIN region r1 ON n1.n_regionkey=r1.r_regionkey
    JOIN nation n2 ON c.c_nationkey=n2.n_nationkey JOIN region r2 ON n2.n_regionkey=r2.r_regionkey
  WHERE ((r1.r_name='ASIA' AND r2.r_name='EUROPE') OR (r1.r_name='EUROPE' AND r2.r_name='ASIA'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1,2,3 ORDER BY 1,2,3""",
    "q8_market_share" ->
      """WITH vol AS (
    SELECT year(o.o_orderdate) o_year,
      CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT) cents,
      r1.r_name supp_region
    FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
      JOIN customer c ON o.o_custkey=c.c_custkey
      JOIN nation n2 ON c.c_nationkey=n2.n_nationkey JOIN region r2 ON n2.n_regionkey=r2.r_regionkey
      JOIN supplier s ON l.l_suppkey=s.s_suppkey
      JOIN nation n1 ON s.s_nationkey=n1.n_nationkey JOIN region r1 ON n1.n_regionkey=r1.r_regionkey
    WHERE r2.r_name='ASIA')
  SELECT o_year,
    CAST(sum(CASE WHEN supp_region='EUROPE' THEN cents ELSE 0 END)*1000 // sum(cents) AS BIGINT) share_pm,
    CAST(sum(cents) AS BIGINT) total_cents
  FROM vol GROUP BY 1 ORDER BY 1""",
    "q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
    CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS BIGINT) rev_cents
  FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
    JOIN customer c ON o.o_custkey=c.c_custkey
    JOIN nation n ON c.c_nationkey=n.n_nationkey
  WHERE l.l_returnflag='R'
    AND o.o_orderdate >= TIMESTAMP '1996-07-01' AND o.o_orderdate < TIMESTAMP '1996-10-01'
  GROUP BY 1,2,3 ORDER BY rev_cents DESC, c_custkey LIMIT 20""",
    "q13_order_distribution" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) custdist FROM (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) c_count
    FROM customer c LEFT JOIN orders o ON c.c_custkey=o.o_custkey AND o.o_orderstatus='F'
    GROUP BY 1)
  GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",
    "q14_promo_revenue" ->
      """WITH j AS (
    SELECT CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT) cents, p.p_type
    FROM lineitem l JOIN part p ON l.l_partkey=p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1996-02-01')
  SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN cents ELSE 0 END)*1000 // sum(cents) AS BIGINT) promo_pm,
    CAST(sum(cents) AS BIGINT) rev_cents
  FROM j""",
    "q15_top_supplier" ->
      """WITH rev AS (
    SELECT l_suppkey, CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) total_rev
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1)
  SELECT s.s_suppkey, s.s_name, r.total_rev
  FROM supplier s JOIN rev r ON s.s_suppkey=r.l_suppkey
  WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
  ORDER BY s.s_suppkey""",
    "q17_small_qty_revenue" ->
      """SELECT CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT) rev_cents,
    CAST(count(*) AS BIGINT) n_lines
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#1'
    AND l.l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)""",
    "q18_large_orders" ->
      """SELECT c.c_custkey, o.o_orderkey, CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) total_qty
  FROM customer c JOIN orders o ON c.c_custkey=o.o_custkey
    JOIN lineitem l ON o.o_orderkey=l.l_orderkey
  WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY 1
                         HAVING sum(CAST(l_quantity AS BIGINT)) > 150)
  GROUP BY 1,2 ORDER BY total_qty DESC, o_orderkey LIMIT 50""",
    "q20_promo_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
  WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%')
    GROUP BY l_suppkey, l_partkey HAVING sum(CAST(l_quantity AS BIGINT)) > 90)
  ORDER BY s_suppkey""",
    "q21_latest_shipper" ->
      """SELECT s.s_name, CAST(count(*) AS BIGINT) numwait
  FROM supplier s JOIN lineitem l1 ON s.s_suppkey=l1.l_suppkey
    JOIN orders o ON o.o_orderkey=l1.l_orderkey
  WHERE o.o_orderstatus='F'
    AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey=l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey=l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > l1.l_shipdate)
  GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 25""",
    "q22_idle_balance" ->
      """SELECT cgroup, CAST(count(*) AS BIGINT) n_custs, CAST(sum(cents) AS BIGINT) bal_cents FROM (
    SELECT c.c_custkey % 7 AS cgroup, CAST(round(c.c_acctbal*100) AS BIGINT) cents
    FROM customer c
    WHERE c.c_acctbal > 0
      AND CAST(round(c.c_acctbal*100) AS BIGINT) *
          (SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0)
          > (SELECT CAST(sum(CAST(round(c2.c_acctbal*100) AS BIGINT)) AS BIGINT)
             FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'O'))
  GROUP BY 1 ORDER BY 1""",
    "join_lateral_topk" ->
      """SELECT n.n_name, t.s_suppkey, t.bal_cents FROM nation n,
  LATERAL (SELECT s_suppkey, CAST(round(s_acctbal*100) AS BIGINT) bal_cents
           FROM supplier s WHERE s.s_nationkey = n.n_nationkey
           ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
  ORDER BY n.n_name, t.s_suppkey""",
    // ---- wave 9: function families + composed analytics ----
    // (`map_funcs` — the shallow JSON form — predates this wave; the
    // MapType-exercising variant is `map_typed_funcs`.)
    "map_typed_funcs" ->
      """SELECT event_id, CAST(json_extract(props,'$.k') AS INTEGER) k_val,
    CAST(2 AS BIGINT) n_keys,
    CAST(CASE WHEN CAST(json_extract(props,'$.k') AS INTEGER) > 50 THEN 1 ELSE 0 END AS BIGINT) n_big,
    'k=' || CAST(json_extract(props,'$.k') AS VARCHAR) || ',u=' || CAST(user_id % 10 AS VARCHAR) enc
  FROM events ORDER BY event_id""",
    // DuckDB has no map HOFs: both oracles re-derive the Spark side's
    // sorted-entry string by hand from the known key set (R5 map-HOF
    // technique; keys sort 'K_'<'UU_' and 'k'<'u'<'z' for all inputs)
    "map_transform_funcs" ->
      """SELECT event_id,
    'K_' || CAST(k % 2 AS VARCHAR) || '=' || CAST(k*2+3 AS VARCHAR) ||
    ',UU_' || CAST(u % 2 AS VARCHAR) || '=' || CAST(u*2+4 AS VARCHAR) enc
  FROM (SELECT event_id, CAST(json_extract(props,'$.k') AS INTEGER) k,
    user_id % 10 u FROM events) t ORDER BY event_id""",
    "map_zip_funcs" ->
      """SELECT event_id,
    'k=' || CAST(k+u AS VARCHAR) || ',u=' || CAST(u AS VARCHAR) || ',z=5' enc
  FROM (SELECT event_id, CAST(json_extract(props,'$.k') AS INTEGER) k,
    user_id % 10 u FROM events) t ORDER BY event_id""",
    "struct_funcs" ->
      """WITH t AS (SELECT event_id, event_type, user_id % 7 ux,
    CAST(json_extract(props,'$.k') AS INTEGER) k FROM events)
  SELECT event_id,
    CAST(CASE WHEN ux < k % 7 OR (ux = k % 7 AND event_type <= 'k') THEN ux ELSE k % 7 END AS BIGINT) first_x,
    CASE WHEN ux < k % 7 OR (ux = k % 7 AND event_type <= 'k') THEN event_type ELSE 'k' END first_y,
    k deep_k
  FROM t ORDER BY event_id""",
    "regexp_funcs" ->
      """SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\b[a-z]{3}\b')) AS BIGINT) n3,
    coalesce(array_to_string(list_slice(regexp_extract_all(text, '\b[a-z]{3}\b'), 1, 5), ','), '') first5,
    CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) novowel_len
  FROM documents ORDER BY doc_id""",
    "agg_bitwise" ->
      """WITH t AS (SELECT event_type, CAST(json_extract(props,'$.k') AS BIGINT) k FROM events)
  SELECT event_type, CAST(bit_and(k) AS BIGINT) b_and, CAST(bit_or(k) AS BIGINT) b_or,
    CAST(bit_xor(k) AS BIGINT) b_xor, CAST(sum(bit_count(k)) AS BIGINT) bits
  FROM t GROUP BY 1 ORDER BY 1""",
    "win_time_range_7d" ->
      """SELECT event_id, user_id,
    CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id
      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT) roll_cents
  FROM events ORDER BY event_id""",
    "ml_feature_hash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) tk FROM documents),
  b AS (SELECT doc_id, CAST(('0x' || substr(md5(tk),1,8))::UBIGINT % 32 AS BIGINT) bucket FROM tok),
  c AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) c FROM b GROUP BY 1,2)
  SELECT doc_id, string_agg(lpad(CAST(bucket AS VARCHAR),2,'0') || ':' || CAST(c AS VARCHAR),
    ',' ORDER BY bucket) features
  FROM c GROUP BY 1 ORDER BY doc_id""",
    "anomaly_mad" ->
      """WITH c AS (SELECT event_type, CAST(round(value*100) AS BIGINT) cents FROM events),
  m AS (SELECT event_type, quantile_cont(cents, 0.5) med FROM c GROUP BY 1),
  d AS (SELECT c.event_type, c.cents, abs(c.cents - m.med) dev FROM c JOIN m USING (event_type)),
  m2 AS (SELECT event_type, quantile_cont(dev, 0.5) mad FROM d GROUP BY 1)
  SELECT d.event_type, CAST(round(min(m.med)*2) AS BIGINT) med2, CAST(round(min(m2.mad)*2) AS BIGINT) mad2,
    CAST(sum(CASE WHEN d.dev > 5*m2.mad THEN 1 ELSE 0 END) AS BIGINT) n_out
  FROM d JOIN m USING (event_type) JOIN m2 USING (event_type) GROUP BY 1 ORDER BY 1""",
    "seq_funnel_daily" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS DATE) dd,
    CAST(floor(epoch(ts)) AS BIGINT) es FROM events),
  s1 AS (SELECT dd, user_id, min(es) t1 FROM e WHERE event_type='view' GROUP BY 1,2),
  s2 AS (SELECT e.dd, e.user_id, min(e.es) t2 FROM e JOIN s1 ON e.dd=s1.dd AND e.user_id=s1.user_id
         WHERE e.event_type='click' AND e.es > s1.t1 GROUP BY 1,2),
  s3 AS (SELECT e.dd, e.user_id, min(e.es) t3 FROM e JOIN s2 ON e.dd=s2.dd AND e.user_id=s2.user_id
         WHERE e.event_type='purchase' AND e.es > s2.t2 GROUP BY 1,2)
  SELECT s1.dd, CAST(count(*) AS BIGINT) n_view, CAST(count(s2.t2) AS BIGINT) n_click,
    CAST(count(s3.t3) AS BIGINT) n_purchase
  FROM s1 LEFT JOIN s2 ON s1.dd=s2.dd AND s1.user_id=s2.user_id
    LEFT JOIN s3 ON s1.dd=s3.dd AND s1.user_id=s3.user_id
  GROUP BY 1 ORDER BY 1""",
    "corpus_shard_pack" ->
      """WITH o AS (SELECT lang, doc_id, n_chars, md5(text) mk FROM documents),
  w AS (SELECT lang, doc_id, n_chars,
    coalesce(sum(n_chars) OVER (PARTITION BY lang ORDER BY mk, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) before_chars FROM o)
  SELECT lang, CAST(before_chars // 20000 AS BIGINT) shard, CAST(count(*) AS BIGINT) n_docs,
    CAST(sum(n_chars) AS BIGINT) chars
  FROM w GROUP BY 1,2 ORDER BY 1,2""",
  )

  /** Round-4 wave 10: the remaining decision-support shapes (Q9 / Q11 /
    * Q12 / Q16 / Q19 adapted to this corpus — no partsupp/shipmode).
    */
  private val wave10: Map[String, String] = Map(
    "q9_product_profit" ->
      """SELECT n.n_name nation, year(o.o_orderdate) o_year,
    CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)
             - CAST(round(p.p_retailprice*0.1*100) AS BIGINT) * CAST(l.l_quantity AS BIGINT)) AS BIGINT) profit_cents
  FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2 ORDER BY 1, 2""",
    "q11_important_stock" ->
      """WITH v AS (
    SELECT l.l_partkey, sum(CAST(round(l.l_extendedprice*100) AS BIGINT) * CAST(l.l_quantity AS BIGINT)) value_cents
    FROM lineitem l
    WHERE l.l_suppkey IN (
      SELECT s.s_suppkey FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE')
    GROUP BY 1)
  SELECT l_partkey, CAST(value_cents AS BIGINT) value_cents FROM v
  WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM v)
  ORDER BY value_cents DESC, l_partkey""",
    "q12_priority_split" ->
      """SELECT l.l_linestatus,
    CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) high_count,
    CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) low_count
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  GROUP BY 1 ORDER BY 1""",
    "q16_supplier_variety" ->
      """SELECT p.p_brand, p.p_size, CAST(count(DISTINCT l.l_suppkey) AS BIGINT) supplier_cnt
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%'
    AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
  GROUP BY 1, 2 ORDER BY 3 DESC, 1, 2""",
    "q19_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) rev_cents,
    CAST(count(*) AS BIGINT) n_items
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 1 AND 15 AND p.p_size BETWEEN 1 AND 10)
     OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 10 AND 25 AND p.p_size BETWEEN 1 AND 20)
     OR (p.p_brand = 'Brand#4' AND l.l_quantity BETWEEN 20 AND 35 AND p.p_size BETWEEN 1 AND 30)""",
  )

  /** Round-4 wave 11: the data-quality / profiling layer
    * ([[graft.ops.Quality]]). Long-format outputs; all values integer
    * or verbatim-string so the hash-compare is exact.
    */
  private val wave11: Map[String, String] = Map(
    "profile_table_stats" ->
      """WITH a AS (SELECT count(*) n_rows,
      count(DISTINCT o_orderkey) d_orderkey, count(DISTINCT o_custkey) d_custkey,
      count(DISTINCT o_orderstatus) d_orderstatus, count(DISTINCT o_totalprice) d_totalprice,
      count(DISTINCT CAST(o_orderdate AS DATE)) d_orderdate,
      count(DISTINCT o_orderpriority) d_orderpriority,
      min(o_orderkey) min_ok, max(o_orderkey) max_ok,
      min(CAST(round(o_totalprice*100) AS BIGINT)) min_pc,
      max(CAST(round(o_totalprice*100) AS BIGINT)) max_pc,
      CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) min_day,
      CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) max_day
    FROM orders)
  SELECT col_name, metric, "value" FROM (
    SELECT '*' col_name, 'n_rows' metric, CAST(n_rows AS VARCHAR) "value" FROM a
    UNION ALL SELECT 'o_orderkey', 'n_distinct', CAST(d_orderkey AS VARCHAR) FROM a
    UNION ALL SELECT 'o_custkey', 'n_distinct', CAST(d_custkey AS VARCHAR) FROM a
    UNION ALL SELECT 'o_orderstatus', 'n_distinct', CAST(d_orderstatus AS VARCHAR) FROM a
    UNION ALL SELECT 'o_totalprice', 'n_distinct', CAST(d_totalprice AS VARCHAR) FROM a
    UNION ALL SELECT 'o_orderdate', 'n_distinct_days', CAST(d_orderdate AS VARCHAR) FROM a
    UNION ALL SELECT 'o_orderpriority', 'n_distinct', CAST(d_orderpriority AS VARCHAR) FROM a
    UNION ALL SELECT 'o_orderkey', 'min', CAST(min_ok AS VARCHAR) FROM a
    UNION ALL SELECT 'o_orderkey', 'max', CAST(max_ok AS VARCHAR) FROM a
    UNION ALL SELECT 'o_totalprice', 'min_cents', CAST(min_pc AS VARCHAR) FROM a
    UNION ALL SELECT 'o_totalprice', 'max_cents', CAST(max_pc AS VARCHAR) FROM a
    UNION ALL SELECT 'o_orderdate', 'min_day', min_day FROM a
    UNION ALL SELECT 'o_orderdate', 'max_day', max_day FROM a)
  ORDER BY col_name, metric""",
    "dq_referential_orphans" ->
      """SELECT edge, n_orphans FROM (
    SELECT 'lineitem.l_orderkey->orders' edge, CAST(count(*) AS BIGINT) n_orphans
      FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL SELECT 'lineitem.l_partkey->part', CAST(count(*) AS BIGINT)
      FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
    UNION ALL SELECT 'lineitem.l_suppkey->supplier', CAST(count(*) AS BIGINT)
      FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
    UNION ALL SELECT 'orders.o_custkey->customer', CAST(count(*) AS BIGINT)
      FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL SELECT 'documents.doc_id->embeddings', CAST(count(*) AS BIGINT)
      FROM documents WHERE doc_id NOT IN (SELECT vec_id FROM embeddings))
  ORDER BY edge""",
    "dq_duplicate_keys" ->
      """SELECT "check", n_dup_keys, n_extra_rows FROM (
    SELECT 'orders.o_orderkey' "check", CAST(count(*) AS BIGINT) n_dup_keys,
        CAST(coalesce(sum(c - 1), 0) AS BIGINT) n_extra_rows
      FROM (SELECT o_orderkey, count(*) c FROM orders GROUP BY 1 HAVING count(*) > 1)
    UNION ALL SELECT 'lineitem.(l_orderkey,l_linenumber)', CAST(count(*) AS BIGINT),
        CAST(coalesce(sum(c - 1), 0) AS BIGINT)
      FROM (SELECT l_orderkey, l_linenumber, count(*) c FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1)
    UNION ALL SELECT 'documents.text', CAST(count(*) AS BIGINT),
        CAST(coalesce(sum(c - 1), 0) AS BIGINT)
      FROM (SELECT text, count(*) c FROM documents GROUP BY 1 HAVING count(*) > 1))
  ORDER BY "check"""",
    "dq_domain_violations" ->
      """SELECT "rule", n_violations FROM (
    SELECT 'lineitem.discount_range' "rule", CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.11 THEN 1 ELSE 0 END) AS BIGINT) n_violations FROM lineitem
    UNION ALL SELECT 'lineitem.qty_integer', CAST(sum(CASE WHEN l_quantity <> CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
    UNION ALL SELECT 'lineitem.price_positive', CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
    UNION ALL SELECT 'orders.status_domain', CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) FROM orders
    UNION ALL SELECT 'customer.acctbal_negative', CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM customer
    UNION ALL SELECT 'events.type_domain', CAST(sum(CASE WHEN event_type NOT IN ('click','error','purchase','signup','view') THEN 1 ELSE 0 END) AS BIGINT) FROM events
    UNION ALL SELECT 'lineitem.ship_before_order', CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
  ORDER BY "rule"""",
  )

  /** Round-4 waves 13–14: relevance/indexing ([[graft.ops.Relevance]])
    * and integer-exact ML evaluation ([[graft.ops.MlOps]]). The k-means
    * oracle replays the identical two Lloyd iterations as chained CTEs
    * (same structure as `ann_ivf_topk` / `graph_pagerank`); vectors are
    * offset-quantized (`round(x·1000) + 1e6` — strictly positive so
    * DuckDB's floor `//` equals Spark's truncating `div`).
    */
  private val wave1314: Map[String, String] = Map(
    "text_tfidf_topk" ->
      """WITH tf AS (SELECT doc_id, tok, count(*) tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents) GROUP BY 1, 2),
  df AS (SELECT tok, CAST(count(*) AS BIGINT) df FROM tf GROUP BY 1),
  sc AS (SELECT tf.doc_id, tf.tok, CAST(tf.tf AS BIGINT) tf,
      CAST(tf.tf * (1000000 // df.df) AS BIGINT) score FROM tf JOIN df USING (tok)),
  r AS (SELECT doc_id, tok, tf, score,
      CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS BIGINT) rk FROM sc)
  SELECT doc_id, tok, tf, score, rk FROM r WHERE rk <= 3 ORDER BY doc_id, rk""",
    "text_bigram_cooccur" ->
      """WITH b AS (SELECT lang,
      unnest(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) bigram
    FROM (SELECT lang, string_split(text, ' ') t FROM documents)),
  g AS (SELECT lang, bigram, CAST(count(*) AS BIGINT) c FROM b GROUP BY 1, 2),
  r AS (SELECT lang, bigram, c,
      CAST(row_number() OVER (PARTITION BY lang ORDER BY c DESC, bigram) AS BIGINT) rk FROM g)
  SELECT lang, bigram, c, rk FROM r WHERE rk <= 10 ORDER BY lang, rk""",
    "text_inverted_postings" ->
      """WITH t AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) tok FROM documents),
  per AS (SELECT lang, tok, doc_id, count(*) tf FROM t GROUP BY 1, 2, 3),
  g AS (SELECT lang, tok, CAST(count(*) AS BIGINT) df, CAST(sum(tf) AS BIGINT) tf_total,
      min(doc_id) min_doc, max(doc_id) max_doc FROM per GROUP BY 1, 2)
  SELECT lang, tok, df, tf_total, min_doc, max_doc FROM g
  ORDER BY df DESC, lang, tok LIMIT 100""",
    "ml_kmeans_2iter" ->
      """WITH v AS (SELECT vec_id,
      list_transform(embedding::DOUBLE[], x -> CAST(round(x*1000) AS BIGINT) + 1000000) q FROM embeddings),
  c0 AS (SELECT vec_id cid, q c FROM v WHERE vec_id < 8),
  d1 AS (SELECT v.vec_id, c.cid, sum((v.q[r.i]-c.c[r.i])*(v.q[r.i]-c.c[r.i])) d2
    FROM v CROSS JOIN c0 c, range(1,65) r(i) GROUP BY 1, 2),
  a1 AS (SELECT vec_id, cid cell FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rr FROM d1) WHERE rr = 1),
  m1 AS (SELECT a1.cell, r.i pos, sum(v.q[r.i]) // count(*) cv
    FROM a1 JOIN v USING (vec_id), range(1,65) r(i) GROUP BY 1, 2),
  c1 AS (SELECT cell cid, list(cv ORDER BY pos) c FROM m1 GROUP BY cell),
  d2t AS (SELECT v.vec_id, c.cid, sum((v.q[r.i]-c.c[r.i])*(v.q[r.i]-c.c[r.i])) d2
    FROM v CROSS JOIN c1 c, range(1,65) r(i) GROUP BY 1, 2),
  a2 AS (SELECT vec_id, cid cell FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rr FROM d2t) WHERE rr = 1),
  m2 AS (SELECT a2.cell, r.i pos, sum(v.q[r.i]) // count(*) cv
    FROM a2 JOIN v USING (vec_id), range(1,65) r(i) GROUP BY 1, 2),
  c2 AS (SELECT cell cid, list(cv ORDER BY pos) c FROM m2 GROUP BY cell),
  d3 AS (SELECT v.vec_id, c.cid, sum((v.q[r.i]-c.c[r.i])*(v.q[r.i]-c.c[r.i])) d2
    FROM v CROSS JOIN c2 c, range(1,65) r(i) GROUP BY 1, 2),
  a3 AS (SELECT vec_id, cid cell FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rr FROM d3) WHERE rr = 1),
  census AS (SELECT cell, CAST(count(*) AS BIGINT) n_members FROM a3 GROUP BY 1),
  sums AS (SELECT cid cell, CAST(list_sum(c) AS BIGINT) centroid_sum FROM c2)
  SELECT CAST(census.cell AS BIGINT) cell, n_members, centroid_sum
  FROM census JOIN sums USING (cell) ORDER BY cell""",
    "ml_auc_rank" ->
      """WITH s AS (SELECT
      list_sum(list_transform(embedding::DOUBLE[], x -> CAST(round(x*1000) AS BIGINT))) score,
      CASE WHEN label < 5 THEN 1 ELSE 0 END pos FROM embeddings),
  g AS (SELECT score, count(*) n, sum(pos) np FROM s GROUP BY 1),
  w AS (SELECT score, n, np, sum(n) OVER (ORDER BY score) cum FROM g),
  acc AS (SELECT sum(np * (2*(cum - n) + n + 1)) sr2, sum(np) n_pos, sum(n) - sum(np) n_neg FROM w)
  SELECT CAST(n_pos AS BIGINT) n_pos, CAST(n_neg AS BIGINT) n_neg,
    CAST(sr2 - n_pos*(n_pos+1) AS BIGINT) u2,
    CAST((sr2 - n_pos*(n_pos+1)) * 500000 // (n_pos * n_neg) AS BIGINT) auc_ppm
  FROM acc""",
    "ml_confusion_matrix" ->
      """SELECT CAST(label AS BIGINT) "label",
    CAST(list_sum(list_transform(embedding::DOUBLE[], x -> abs(CAST(round(x*1000) AS BIGINT)))) % 10 AS BIGINT) pred,
    CAST(count(*) AS BIGINT) c
  FROM embeddings GROUP BY 1, 2 ORDER BY 1, 2""",
  )

  /** Round-7 wave 16: retrieval eval, calibration, attribution,
    * journey mining, PMI collocations, and the oracled KMV sketch.
    * Every score is exact integer arithmetic (SURVEY §2.1-R2/R6); the
    * quantized dot products stay < 2²⁶ so DuckDB's DOUBLE
    * `list_dot_product` is exact.
    */
  private val wave16: Map[String, String] = Map(
    "ml_mrr_hits" ->
      """WITH e AS (SELECT vec_id, label,
      list_transform(embedding::DOUBLE[], x -> CAST(round(x*1000) AS BIGINT)) v FROM embeddings),
  p AS (SELECT a.vec_id q_id, a.label q_label, b.vec_id n_id, b.label n_label,
      CAST(list_dot_product(a.v::DOUBLE[], b.v::DOUBLE[]) AS BIGINT) dot
    FROM e a JOIN e b ON a.vec_id <> b.vec_id WHERE a.vec_id < 10),
  r AS (SELECT q_id, q_label, n_label,
      row_number() OVER (PARTITION BY q_id ORDER BY dot DESC, n_id) rn FROM p),
  m AS (SELECT q_id,
      coalesce(min(CASE WHEN q_label = n_label THEN rn END), 0) frr,
      sum(CASE WHEN rn <= 10 AND q_label = n_label THEN 1 ELSE 0 END) h10,
      count(*) nc FROM r GROUP BY 1)
  SELECT q_id, CAST(frr AS BIGINT) first_rel_rank,
    CAST(CASE WHEN frr > 0 THEN 1000000 // frr ELSE 0 END AS BIGINT) rr_ppm,
    CAST(h10 AS BIGINT) hits_at_10, CAST(nc AS BIGINT) n_candidates
  FROM m ORDER BY q_id""",
    "ml_calibration_bins" ->
      """WITH s AS (SELECT
      list_sum(list_transform(embedding::DOUBLE[], x -> CAST(round(x*1000) AS BIGINT))) + 100000 score_off,
      CASE WHEN label >= 5 THEN 1 ELSE 0 END pos FROM embeddings)
  SELECT CAST(score_off // 1000 AS BIGINT) bin, CAST(count(*) AS BIGINT) n,
    CAST(sum(pos) AS BIGINT) n_pos,
    CAST(sum(pos) * 1000000 // count(*) AS BIGINT) pos_ppm
  FROM s GROUP BY 1 ORDER BY 1""",
    "events_attribution" ->
      """WITH t AS (SELECT event_type, value,
      last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) touch
    FROM events)
  SELECT coalesce(touch, 'none') attributed, CAST(count(*) AS BIGINT) n_purchases,
    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) revenue_cents
  FROM t WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1""",
    "events_path_topk" ->
      """WITH o AS (SELECT user_id, CAST(ts AS DATE) dd, event_type,
      row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) rn
    FROM events),
  p AS (SELECT user_id, dd, string_agg(event_type, '>' ORDER BY rn) path
    FROM o WHERE rn <= 5 GROUP BY 1, 2)
  SELECT path, CAST(count(*) AS BIGINT) n_sessions
  FROM p GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20""",
    "text_pmi_bigrams" ->
      """WITH b AS (SELECT split_part(bigram, ' ', 1) l, split_part(bigram, ' ', 2) r
    FROM (SELECT unnest(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) bigram
          FROM (SELECT string_split(text, ' ') t FROM documents))),
  cxy AS (SELECT l, r, CAST(count(*) AS BIGINT) c_xy FROM b GROUP BY 1, 2),
  cx AS (SELECT l, CAST(count(*) AS BIGINT) c_x FROM b GROUP BY 1),
  cy AS (SELECT r, CAST(count(*) AS BIGINT) c_y FROM b GROUP BY 1),
  n AS (SELECT CAST(count(*) AS BIGINT) n_total FROM b)
  SELECT l, r, c_xy,
    CAST((c_xy::HUGEINT * n_total * 1000000) // (c_x::HUGEINT * c_y) AS BIGINT) pmi_scaled
  FROM cxy JOIN cx USING (l) JOIN cy USING (r) CROSS JOIN n
  WHERE c_xy >= 5
  ORDER BY pmi_scaled DESC, l, r LIMIT 30""",
    "ml_lift_gain" ->
      """WITH s AS (SELECT vec_id,
      list_sum(list_transform(embedding::DOUBLE[], x -> CAST(round(x*1000) AS BIGINT))) score,
      CASE WHEN label >= 5 THEN 1 ELSE 0 END pos FROM embeddings),
  r AS (SELECT pos, row_number() OVER (ORDER BY score DESC, vec_id) rn, count(*) OVER () n FROM s),
  d AS (SELECT ((rn - 1) * 10) // n + 1 decile, CAST(count(*) AS BIGINT) n, CAST(sum(pos) AS BIGINT) n_pos
    FROM r GROUP BY 1),
  t AS (SELECT sum(n) total_n, sum(n_pos) total_pos FROM d),
  c AS (SELECT decile, n, n_pos, CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) cum_pos,
      total_n, total_pos FROM d CROSS JOIN t)
  SELECT CAST(decile AS BIGINT) decile, n, n_pos, cum_pos,
    CAST(cum_pos * 1000000 // total_pos AS BIGINT) gain_ppm,
    CAST(n_pos * total_n * 1000000 // (n * total_pos) AS BIGINT) lift_ppm
  FROM c ORDER BY decile""",
    "multimodal_embed_batch" ->
      """SELECT doc_id,
    CAST(octet_length(encode(text)) % 251 AS BIGINT) e0,
    CAST((octet_length(encode(text)) * 7 + doc_id) % 251 AS BIGINT) e1,
    CAST(CASE WHEN octet_length(encode(text)) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END AS BIGINT) e2,
    CAST((doc_id * 13) % 251 AS BIGINT) e3
  FROM documents ORDER BY doc_id LIMIT 500""",
    "events_cooccur_lift" ->
      """WITH sess AS (SELECT DISTINCT user_id, CAST(ts AS DATE) dd, event_type FROM events),
  n AS (SELECT CAST(count(*) AS BIGINT) ns FROM (SELECT DISTINCT user_id, dd FROM sess)),
  cx AS (SELECT event_type, CAST(count(*) AS BIGINT) c FROM sess GROUP BY 1),
  p AS (SELECT a.event_type a_type, b.event_type b_type, CAST(count(*) AS BIGINT) n_both
    FROM sess a JOIN sess b ON a.user_id = b.user_id AND a.dd = b.dd
      AND a.event_type < b.event_type
    GROUP BY 1, 2)
  SELECT a_type, b_type, n_both,
    CAST((n_both::HUGEINT * ns * 1000000) // (ca.c::HUGEINT * cb.c) AS BIGINT) lift_ppm
  FROM p JOIN cx ca ON p.a_type = ca.event_type JOIN cx cb ON p.b_type = cb.event_type
  CROSS JOIN n ORDER BY 1, 2""",
    "ts_dow_seasonality" ->
      """WITH e AS (SELECT event_type, isodow(CAST(ts AS DATE)) dw,
      CAST(round(value*100) AS BIGINT) c FROM events),
  g AS (SELECT event_type, dw, CAST(count(*) AS BIGINT) n, CAST(sum(c) AS BIGINT) cents
    FROM e GROUP BY 1, 2),
  t AS (SELECT event_type, CAST(sum(n) AS BIGINT) n_total, CAST(sum(cents) AS BIGINT) cents_total
    FROM g GROUP BY 1)
  SELECT g.event_type, CAST(dw AS BIGINT) isodow, n, cents,
    CAST((cents::HUGEINT * n_total * 1000000) // (n::HUGEINT * cents_total) AS BIGINT) idx_ppm
  FROM g JOIN t USING (event_type) ORDER BY 1, 2""",
    "ts_cusum_changepoint" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) dd,
      sum(CAST(round(value*100) AS BIGINT)) cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
  tot AS (SELECT count(*) n_days, sum(cents) total_cents FROM daily),
  cs AS (SELECT dd, cents, CAST(cents*n_days - total_cents AS BIGINT) dev,
      CAST(sum(cents*n_days - total_cents) OVER (ORDER BY dd) AS BIGINT) cusum
    FROM daily CROSS JOIN tot)
  SELECT dd, CAST(cents AS BIGINT) cents, dev, cusum,
    CAST(CASE WHEN abs(cusum) = (SELECT max(abs(cusum)) FROM cs) THEN 1 ELSE 0 END AS BIGINT) is_peak
  FROM cs ORDER BY dd""",
    "graph_degree_distribution" ->
      """WITH e AS (SELECT DISTINCT l_partkey p, l_suppkey sp FROM lineitem),
  deg AS (SELECT side, node, CAST(count(*) AS BIGINT) deg FROM (
      SELECT 'part' side, p node FROM e UNION ALL SELECT 'supplier', sp FROM e)
    GROUP BY 1, 2)
  SELECT side, deg, CAST(count(*) AS BIGINT) n_nodes
  FROM deg GROUP BY 1, 2 ORDER BY 1, 2""",
    "agg_kmv_distinct" ->
      """WITH dh AS (SELECT DISTINCT l_returnflag grp,
      (((((l_partkey * 1000000 + l_suppkey) % 2147483648) * 2654435761 + 1013904223) % 2147483648)
       * 1597334677 + 12345) % 2147483648 h
    FROM lineitem),
  g AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) rn,
      count(*) OVER (PARTITION BY grp) n FROM dh),
  pg AS (SELECT grp, CAST(max(n) AS BIGINT) n_exact,
      CAST(coalesce(max(CASE WHEN rn = 128 THEN h END), 0) AS BIGINT) kth_h
    FROM g GROUP BY 1),
  ga AS (SELECT h, row_number() OVER (ORDER BY h) rn, count(*) OVER () n
    FROM (SELECT DISTINCT h FROM dh)),
  pa AS (SELECT 'ALL' grp, CAST(max(n) AS BIGINT) n_exact,
      CAST(coalesce(max(CASE WHEN rn = 128 THEN h END), 0) AS BIGINT) kth_h FROM ga),
  u AS (SELECT * FROM pg UNION ALL SELECT * FROM pa)
  SELECT grp, n_exact, kth_h,
    CAST(CASE WHEN n_exact < 128 THEN n_exact
              ELSE (127 * 2147483648) // kth_h END AS BIGINT) est_distinct
  FROM u ORDER BY grp""",
  )

  /** Wave 15: degree-oriented triangle counting — the oracle replays
    * [[graft.ops.Scale.triangleCount]]'s orientation verbatim.
    */
  private val wave15: Map[String, String] = Map(
    "expr_decimal_exact" ->
      """SELECT o_orderstatus,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) sum_cents,
    CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) max_cents,
    CAST(count(*) AS BIGINT) c
  FROM orders GROUP BY 1 ORDER BY 1""",
    "recon_aging_buckets" ->
      """WITH sg AS (SELECT event_id s_id, user_id s_user, ts s_ts FROM events WHERE event_type = 'signup'),
  p AS (SELECT user_id p_user, ts p_ts FROM events WHERE event_type = 'purchase'),
  um AS (SELECT * FROM sg WHERE NOT EXISTS (
    SELECT 1 FROM p WHERE p.p_user = sg.s_user
      AND p.p_ts >= sg.s_ts AND p.p_ts < sg.s_ts + INTERVAL 24 HOUR)),
  m AS (SELECT max(ts) now_ts FROM events),
  aged AS (SELECT CAST(floor(epoch(m.now_ts)) - floor(epoch(um.s_ts)) AS BIGINT) age_s
    FROM um CROSS JOIN m)
  SELECT CASE WHEN age_s < 7*86400 THEN 'lt7d'
              WHEN age_s < 21*86400 THEN 'lt21d' ELSE '21d_plus' END bucket,
    CAST(count(*) AS BIGINT) n, CAST(min(age_s) AS BIGINT) min_age_s,
    CAST(max(age_s) AS BIGINT) max_age_s
  FROM aged GROUP BY 1 ORDER BY 1""",
    "win_topk_agg" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn
  FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 1000""",
    "join_asof_next" ->
      """WITH p AS (SELECT event_id p_id, user_id, ts FROM events WHERE event_type = 'purchase'),
  e AS (SELECT event_id e_id, user_id, ts e_ts FROM events WHERE event_type = 'error'),
  j AS (SELECT p.p_id, e.e_id, e.e_ts,
      row_number() OVER (PARTITION BY p.p_id ORDER BY e.e_ts, e.e_id) rn
    FROM p JOIN e ON p.user_id = e.user_id AND e.e_ts > p.ts)
  SELECT p_id purchase_id, e_id next_error_id, CAST(epoch_us(e_ts) AS BIGINT) next_us
  FROM j WHERE rn = 1 ORDER BY purchase_id LIMIT 2000""",
    "join_scd2_pointintime" ->
      """WITH v AS (SELECT user_id, event_type state, ts valid_from,
      lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) valid_to
    FROM events),
  f AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
  SELECT f.event_id, v.state, CAST(epoch_us(v.valid_from) AS BIGINT) vf_us
  FROM f JOIN v ON f.user_id = v.user_id AND f.ts >= v.valid_from
    AND (v.valid_to IS NULL OR f.ts < v.valid_to)
  ORDER BY f.event_id""",
    "udtf_explode_outer" ->
      """WITH d AS (SELECT doc_id,
      list_filter(string_split(text, ' '), x -> x IN ('vector', 'variant')) l
    FROM documents)
  SELECT d.doc_id, t.pos, t.tok
  FROM d LEFT JOIN LATERAL (
    SELECT unnest(d.l) tok, CAST(generate_subscripts(d.l, 1) - 1 AS BIGINT) pos) t ON true
  ORDER BY doc_id, pos""",
    "set_except_all" ->
      """SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
  ORDER BY o_orderpriority""",
    "set_intersect_all" ->
      """SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
  INTERSECT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
  ORDER BY o_orderpriority""",
    "embedding_pca_power" ->
      """WITH q AS (SELECT vec_id, r.i, CAST(round(e.embedding[r.i]::DOUBLE * 1000) AS BIGINT) qi
    FROM embeddings e, range(1, 65) r(i)),
  g AS (SELECT a.i, b.i j, sum(a.qi * b.qi) g
    FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
  b1 AS (SELECT i j, CAST(trunc(sum(g) / 4096.0) AS BIGINT) b FROM g GROUP BY 1)
  SELECT CAST(g.i AS BIGINT) dim, CAST(sum(g.g * b1.b) AS BIGINT) b2
  FROM g JOIN b1 ON g.j = b1.j GROUP BY 1 ORDER BY 1""",
    "sql_recursive_cte" ->
      """WITH RECURSIVE r(k, depth) AS (
    SELECT c_custkey, CAST(0 AS BIGINT) FROM customer WHERE c_custkey < 10
    UNION ALL
    SELECT c.c_custkey, r.depth + 1
    FROM r JOIN customer c ON c.c_custkey = r.k * 3 + 1
    WHERE r.depth < 20)
  SELECT depth, CAST(count(*) AS BIGINT) n, CAST(sum(k) AS BIGINT) sum_k
  FROM r GROUP BY depth ORDER BY depth""",
    "win_ignore_nulls" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
      CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice*100) AS BIGINT) END v
    FROM orders)
  SELECT o_custkey, o_orderkey,
    lag(v, 1 IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) prev_f_cents,
    last_value(v IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run_last_f_cents
  FROM o ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    "agg_grouping_id" ->
      """SELECT coalesce(o_orderstatus, 'ALL') status, coalesce(o_orderpriority, 'ALL') prio,
    CAST(count(*) AS BIGINT) n,
    CAST(GROUPING(o_orderstatus) AS BIGINT) g_status,
    CAST(GROUPING(o_orderpriority) AS BIGINT) g_prio
  FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
  ORDER BY g_status, g_prio, status, prio""",
    "sort_nulls_last" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') seg,
    CAST(round(c_acctbal*100) AS BIGINT) bal_cents
  FROM customer
  ORDER BY seg DESC NULLS LAST, bal_cents, c_custkey LIMIT 500""",
    "pivot_multi_agg" ->
      """SELECT o_orderpriority,
    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) "F_n",
    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN round(o_totalprice*100) ELSE 0 END) AS BIGINT) "F_cents",
    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) "O_n",
    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN round(o_totalprice*100) ELSE 0 END) AS BIGINT) "O_cents",
    CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) "P_n",
    CAST(sum(CASE WHEN o_orderstatus = 'P' THEN round(o_totalprice*100) ELSE 0 END) AS BIGINT) "P_cents"
  FROM orders GROUP BY 1 ORDER BY 1""",
    "win_nth_value" ->
      """SELECT o_custkey, o_orderkey,
    nth_value(o_orderkey, 2) OVER w second_ok,
    nth_value(CAST(round(o_totalprice*100) AS BIGINT), 3) OVER w third_cents
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
  ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    "expr_interval_arith" ->
      """SELECT o_orderkey,
    CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) plus3m,
    CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) mstart,
    CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) days_since,
    CAST(quarter(o_orderdate) AS BIGINT) qtr,
    CAST(isodow(o_orderdate) AS BIGINT) isodow,
    CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) month_end
  FROM orders ORDER BY o_orderkey LIMIT 1000""",
    "join_skew_salted" ->
      """WITH dim AS (SELECT DISTINCT event_type, CAST(length(event_type) AS BIGINT) weight FROM events)
  SELECT e.event_type, CAST(count(*) AS BIGINT) n, max(d.weight) weight,
    CAST(sum(CAST(round(e.value*100) AS BIGINT)) AS BIGINT) val_cents
  FROM events e JOIN dim d ON e.event_type = d.event_type
  GROUP BY 1 ORDER BY 1""",
    "typed_cogroup_stats" ->
      """SELECT c.c_custkey, CAST(round(c.c_acctbal*100) AS BIGINT) bal_cents,
    CAST(count(o.o_orderkey) AS BIGINT) n_orders,
    CAST(coalesce(sum(CAST(round(o.o_totalprice*100) AS BIGINT)), 0) AS BIGINT) sum_cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2 ORDER BY 1""",
    "typed_group_stats" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) n_orders,
    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) sum_cents,
    CAST(max(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) max_cents
  FROM orders GROUP BY 1 ORDER BY 1""",
    "agg_chained_windows" ->
      """WITH h AS (SELECT date_trunc('hour', ts) hw, event_type, count(*) c_hour
    FROM events GROUP BY 1, 2)
  SELECT CAST(CAST(date_trunc('day', hw) AS DATE) AS VARCHAR) w, event_type,
    CAST(sum(c_hour) AS BIGINT) c_day, CAST(count(*) AS BIGINT) n_hours
  FROM h GROUP BY 1, 2 ORDER BY 1, 2""",
    "graph_triangle_count" ->
      """WITH raw AS (SELECT
      CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || 's'), 1, 8)) AS BIGINT) % 512 src,
      CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || 't'), 1, 8)) AS BIGINT) % 512 dst
    FROM orders),
  und AS (SELECT DISTINCT least(src, dst) a, greatest(src, dst) b FROM raw WHERE src <> dst),
  deg AS (SELECT n, count(*) deg FROM (SELECT a n FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
  o AS (SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b) THEN u.a ELSE u.b END u,
               CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b) THEN u.b ELSE u.a END v
        FROM und u JOIN deg da ON u.a = da.n JOIN deg db ON u.b = db.n),
  o2 AS (SELECT o.u, o.v, d.deg dv FROM o JOIN deg d ON o.v = d.n),
  w AS (SELECT e1.v v1, e2.v v2 FROM o2 e1 JOIN o2 e2 ON e1.u = e2.u
        WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)),
  t AS (SELECT count(*) n_triangles FROM w JOIN o ON w.v1 = o.u AND w.v2 = o.v)
  SELECT CAST(t.n_triangles AS BIGINT) n_triangles,
    (SELECT CAST(count(*) AS BIGINT) FROM und) n_edges,
    (SELECT CAST(count(*) AS BIGINT) FROM deg) n_nodes
  FROM t""",
  )

  val sql: Map[String, String] = wave89 ++ wave10 ++ wave11 ++ wave1314 ++ wave15 ++ wave16 ++ OracleW18.sql ++ OracleW19.sql ++ OracleW20.sql ++ OracleW21.sql ++ OracleW22.sql ++ OracleW23.sql ++ OracleW24.sql ++ OracleW25.sql ++ OracleW26.sql ++ OracleW27.sql ++ OracleW28.sql ++ OracleW29.sql ++ OracleW30.sql ++ OracleW31.sql ++ OracleW32.sql ++ OracleW33.sql ++ OracleW34.sql ++ Map(
    "graph_pagerank" -> pagerankSql,
    // (l_orderkey, l_linenumber) is not unique in this corpus; LIMIT
    // queries extend the sort to the measured-unique 5-tuple so the cut
    // boundary is engine-independent (SURVEY §2.1-R1).
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
  FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice LIMIT 100""",
    "scan_filter" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) d
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-02-01'
  ORDER BY l_orderkey, l_linenumber""",
    "filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
  WHERE (o_orderstatus = 'F' OR o_totalprice > 300000) AND o_orderpriority IN ('1-URGENT','2-HIGH')
    AND NOT (o_custkey % 10 = 3) ORDER BY o_orderkey""",
    "expr_arithmetic" ->
      """SELECT l_orderkey, l_linenumber,
  CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT) charge_cents
  FROM lineitem
  ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount LIMIT 1000""",
    "expr_case_when" ->
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
         WHEN o_orderpriority = '3-MEDIUM' THEN 'mid' ELSE 'low' END pclass,
  count(*) c FROM orders GROUP BY 1 ORDER BY 1""",
    "expr_null_handling" ->
      """SELECT coalesce(nullif(l_returnflag,'N'),'NONE') f, count(*) c,
  CAST(count(nullif(l_discount, 0.0)) AS BIGINT) nonzero_disc
  FROM lineitem GROUP BY 1 ORDER BY 1""",
    "join_inner" ->
      """SELECT c_custkey, c_name, CAST(count(o_orderkey) AS BIGINT) n_orders,
  CAST(round(sum(o_totalprice)*100) AS BIGINT) total_cents
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY 1,2 ORDER BY c_custkey LIMIT 500""",
    "join_broadcast_dim" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) c
  FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1,2 ORDER BY 1,2""",
    "join_left_outer" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) n
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 400000
  GROUP BY 1 HAVING count(o_orderkey) = 0 ORDER BY c_custkey LIMIT 200""",
    "join_full_outer" ->
      """SELECT coalesce(a.k, b.k) k, a.ca, b.cb FROM
  (SELECT o_custkey k, CAST(count(*) AS BIGINT) ca FROM orders WHERE o_orderstatus='F' GROUP BY 1) a
  FULL JOIN (SELECT o_custkey k, CAST(count(*) AS BIGINT) cb FROM orders WHERE o_orderstatus='P' GROUP BY 1) b
  ON a.k = b.k ORDER BY k LIMIT 500""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
  ORDER BY c_custkey""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
  ORDER BY c_custkey LIMIT 200""",
    "join_theta_band" ->
      """SELECT s_suppkey, CAST(count(*) AS BIGINT) c
  FROM supplier JOIN customer ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
  GROUP BY 1 ORDER BY 1""",
    "join_cross_small" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY 1,2""",
    "join_asof_last_signup" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
  s AS (SELECT event_id, user_id, ts FROM events WHERE event_type='signup')
  SELECT p.event_id purchase_id, max(s.event_id) last_signup_id
  FROM p JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts
  WHERE s.ts = (SELECT max(s2.ts) FROM s s2 WHERE s2.user_id = p.user_id AND s2.ts <= p.ts)
  GROUP BY 1 ORDER BY 1 LIMIT 1000""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
  CAST(round(sum(l_quantity)) AS BIGINT) sum_qty,
  CAST(round(sum(l_extendedprice*100)) AS BIGINT) sum_base_cents,
  CAST(round(sum(round(l_extendedprice*(1-l_discount)*100))) AS BIGINT) sum_disc_cents,
  CAST(count(*) AS BIGINT) count_order
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01' GROUP BY 1,2 ORDER BY 1,2""",
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) rev_cents,
  CAST(o_orderdate AS DATE) od
  FROM customer JOIN orders ON c_custkey=o_custkey JOIN lineitem ON l_orderkey=o_orderkey
  WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
  GROUP BY 1,3 ORDER BY rev_cents DESC, od, l_orderkey LIMIT 10""",
    "q5_local_supplier" ->
      """SELECT n_name,
  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) rev_cents
  FROM customer JOIN orders ON c_custkey=o_custkey JOIN lineitem ON l_orderkey=o_orderkey
  JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
  JOIN nation ON s_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
  WHERE r_name='ASIA' GROUP BY 1 ORDER BY rev_cents DESC, n_name""",
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) rev_cents
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "agg_stats_multi" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) c,
  CAST(round(min(c_acctbal)*100) AS BIGINT) min_cents, CAST(round(max(c_acctbal)*100) AS BIGINT) max_cents,
  CAST(round(sum(CAST(round(c_acctbal*100) AS BIGINT))) AS BIGINT) sum_cents
  FROM customer GROUP BY 1 ORDER BY 1""",
    "agg_count_distinct" ->
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) custs,
  CAST(count(DISTINCT o_orderpriority) AS BIGINT) prios FROM orders""",
    "agg_having" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) n FROM orders GROUP BY 1
  HAVING count(*) >= 15 ORDER BY n DESC, o_custkey""",
    "agg_rollup" ->
      """SELECT coalesce(n_name,'ALL') nn, coalesce(c_mktsegment,'ALL') seg, CAST(count(*) AS BIGINT) c
  FROM customer JOIN nation ON c_nationkey=n_nationkey
  GROUP BY ROLLUP(n_name, c_mktsegment) ORDER BY 1,2""",
    "agg_cube" ->
      """SELECT coalesce(l_returnflag,'ALL') f, coalesce(l_linestatus,'ALL') s,
  CAST(round(sum(l_quantity)) AS BIGINT) q
  FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY 1,2""",
    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus,'ALL') st, coalesce(o_orderpriority,'ALL') pr, CAST(count(*) AS BIGINT) c
  FROM orders GROUP BY GROUPING SETS ((o_orderstatus),(o_orderpriority),()) ORDER BY 1,2""",
    "win_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn
  FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 1000""",
    "win_rank_dense" ->
      """SELECT p_brand, p_partkey, rk, drk FROM (
  SELECT p_brand, p_partkey, rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) rk,
  dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) drk FROM part) t
  WHERE rk <= 5 ORDER BY p_brand, rk, p_partkey""",
    "win_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
  lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) prev_ok,
  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) next_ok
  FROM orders ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey,
  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) run_cents
  FROM orders ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    "win_ntile" ->
      """SELECT b, CAST(count(*) AS BIGINT) c, CAST(round(min(o_totalprice)*100) AS BIGINT) mn FROM (
  SELECT o_totalprice, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) b FROM orders) t
  GROUP BY 1 ORDER BY 1""",
    "sort_multi_key" ->
      """SELECT o_orderkey, o_orderstatus, CAST(o_orderdate AS DATE) d FROM orders
  ORDER BY o_orderstatus ASC, o_orderdate DESC, o_orderkey ASC LIMIT 100""",
    "topk_global" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) cents FROM orders
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
    "set_union_all" ->
      """SELECT k FROM (
  SELECT o_custkey k FROM orders WHERE o_orderstatus='F'
  UNION ALL SELECT o_custkey k FROM orders WHERE o_orderstatus='P') t
  ORDER BY k LIMIT 1000""",
    "set_union_distinct" ->
      """SELECT c_nationkey k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k""",
    "set_intersect" ->
      """SELECT c_custkey k FROM customer INTERSECT SELECT o_custkey FROM orders ORDER BY k LIMIT 500""",
    "set_except" ->
      """SELECT o_custkey k FROM orders WHERE o_orderstatus='F' EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus='P' ORDER BY k LIMIT 500""",
    "str_funcs" ->
      """SELECT p_partkey, upper(p_brand) ub, lower(p_type) lt, length(p_name) ln,
  substr(p_name, 1, 5) s5, concat(p_brand, ':', p_type) bc, replace(p_brand,'Brand#','B') rb,
  CAST(regexp_extract(p_brand, '#(\d+)', 1) AS BIGINT) bnum
  FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey LIMIT 500""",
    "date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) y, CAST(month(o_orderdate) AS BIGINT) m,
  CAST(day(o_orderdate) AS BIGINT) d, CAST(o_orderdate AS DATE) + INTERVAL 30 DAY IS NOT NULL has30,
  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) dd
  FROM orders ORDER BY o_orderkey LIMIT 500""",
    "date_trunc_funcs" ->
      """SELECT CAST(date_trunc('week', o_orderdate) AS DATE) wk,
  CAST(date_trunc('quarter', o_orderdate) AS DATE) qt,
  CAST(count(*) AS BIGINT) c
  FROM orders GROUP BY 1,2 ORDER BY 1,2 LIMIT 500""",
    "array_funcs2" ->
      """SELECT vec_id,
  CAST(round(list_sum(embedding[1:8]::DOUBLE[])*1e6) AS BIGINT) head_sum_micro,
  CAST(len(list_concat(embedding[1:4], embedding[61:64])) AS BIGINT) cat_len,
  CAST(round(list_max(embedding::DOUBLE[])*1e6) AS BIGINT) mx_micro,
  CAST(round(list_min(embedding::DOUBLE[])*1e6) AS BIGINT) mn_micro
  FROM embeddings ORDER BY vec_id LIMIT 500""",
    "map_funcs" ->
      """SELECT event_type,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) sum_k,
  CAST(max(len(json_keys(props))) AS BIGINT) max_keys
  FROM events GROUP BY 1 ORDER BY 1""",
    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber, CAST(floor(l_extendedprice) AS BIGINT) f,
  CAST(ceil(l_extendedprice) AS BIGINT) c, abs(l_discount - 0.05) > 0.001 far,
  CAST(round(sqrt(l_quantity)*1000) AS BIGINT) sq, CAST(l_orderkey % 7 AS BIGINT) m7
  FROM lineitem
  ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount LIMIT 1000""",
    "json_funcs" ->
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) sum_k,
  CAST(count(*) AS BIGINT) c FROM events GROUP BY 1 ORDER BY 1""",
    "array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) dim,
  CAST(round(embedding[1]*1e6) AS BIGINT) e0_micro,
  CAST(round(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))*1e6) AS BIGINT) sq_norm_micro
  FROM embeddings ORDER BY vec_id LIMIT 500""",
    "agg_pivot" ->
      """SELECT user_id,
  CAST(count(CASE WHEN event_type='click' THEN 1 END) AS BIGINT) n_click,
  CAST(count(CASE WHEN event_type='purchase' THEN 1 END) AS BIGINT) n_purchase,
  CAST(count(CASE WHEN event_type='signup' THEN 1 END) AS BIGINT) n_signup,
  CAST(count(CASE WHEN event_type='view' THEN 1 END) AS BIGINT) n_view,
  CAST(count(CASE WHEN event_type='error' THEN 1 END) AS BIGINT) n_error
  FROM events GROUP BY 1 ORDER BY 1 LIMIT 2000""",
    "stream_tumbling_daily" ->
      """SELECT date_trunc('day', ts) w, event_type, CAST(count(*) AS BIGINT) c,
  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) val_cents
  FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "stream_sliding_1h30m" ->
      """WITH wins AS (SELECT ws FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31', INTERVAL 30 MINUTE) t(ws))
  SELECT CAST(floor(epoch(ws)) AS BIGINT) w_start, CAST(count(*) AS BIGINT) c
  FROM wins JOIN events e ON e.ts >= ws AND e.ts < ws + INTERVAL 60 MINUTE
  GROUP BY 1 ORDER BY 1 LIMIT 2000""",
    "stream_session_30m" ->
      """WITH d AS (SELECT user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END brk
  FROM events),
  s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) sid FROM d)
  SELECT user_id, CAST(count(DISTINCT sid) AS BIGINT) n_sessions, CAST(max(cnt) AS BIGINT) max_len
  FROM (SELECT user_id, sid, count(*) cnt FROM s GROUP BY 1,2) t
  GROUP BY 1 ORDER BY 1""",
    "stream_dedup_keys" ->
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) c FROM (
  SELECT user_id, event_type, min(event_id) FROM events GROUP BY user_id, event_type, date_trunc('minute', ts)) t
  GROUP BY 1,2 ORDER BY 1,2 LIMIT 2000""",
    "stream_stream_join_1h" ->
      """SELECT a.event_id click_id, b.event_id purch_id
  FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='click') a
  JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase') b
  ON a.user_id = b.user_id AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 60 MINUTE
  ORDER BY 1,2 LIMIT 2000""",
    "stream_running_count" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) n_events,
  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) total_cents
  FROM events GROUP BY 1 ORDER BY 1""",
    "recon_leg_match" ->
      """WITH a AS (SELECT event_id, user_id, ts FROM events WHERE event_type='signup'),
  b AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
  m AS (SELECT a.event_id a_id, b.event_id b_id FROM a JOIN b
        ON a.user_id=b.user_id AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 24 HOUR)
  SELECT 'matched' status, CAST(count(*) AS BIGINT) c FROM m
  UNION ALL SELECT 'unmatched_a', CAST(count(*) AS BIGINT) FROM a WHERE event_id NOT IN (SELECT a_id FROM m)
  UNION ALL SELECT 'unmatched_b', CAST(count(*) AS BIGINT) FROM b WHERE event_id NOT IN (SELECT b_id FROM m)
  ORDER BY 1""",
    "dedup_exact_hash" ->
      """SELECT CAST(count(*) AS BIGINT) n_docs, CAST(count(DISTINCT md5(text)) AS BIGINT) n_uniq
  FROM documents""",
    "dedup_near_jaccard" ->
      """WITH toks AS (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) tk FROM documents)
  SELECT a.doc_id a_id, b.doc_id b_id FROM toks a JOIN toks b
  ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.tk,b.tk))::DOUBLE / len(list_distinct(a.tk || b.tk)) >= 0.9
  ORDER BY 1,2 LIMIT 2000""",
    "event_funnel" ->
      """WITH s AS (SELECT user_id, min(ts) st FROM events WHERE event_type='signup' GROUP BY 1),
  c AS (SELECT e.user_id, min(e.ts) ct FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.st
        WHERE e.event_type='click' GROUP BY 1),
  p AS (SELECT e.user_id, min(e.ts) pt FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.ct
        WHERE e.event_type='purchase' GROUP BY 1)
  SELECT CAST((SELECT count(*) FROM s) AS BIGINT) n_signup,
         CAST((SELECT count(*) FROM c) AS BIGINT) n_click_after,
         CAST((SELECT count(*) FROM p) AS BIGINT) n_purchase_after""",
    "pack_token_shards" ->
      """WITH d AS (SELECT doc_id, len(string_split(text,' ')) n_tok FROM documents),
  ps AS (SELECT doc_id, n_tok, sum(n_tok) OVER (ORDER BY doc_id) ps FROM d)
  SELECT CAST(floor((ps - 1) / 2048) AS BIGINT) shard,
         CAST(count(*) AS BIGINT) n_docs, CAST(sum(n_tok) AS BIGINT) toks
  FROM ps GROUP BY 1 ORDER BY 1""",
    "sample_stratified" ->
      """SELECT lang, doc_id, rn FROM (
    SELECT lang, doc_id,
      CAST(row_number() OVER (PARTITION BY lang
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) rn
    FROM documents) t
  WHERE rn <= 10 ORDER BY lang, rn""",
    "pipeline_quality_dedup_split" ->
      """WITH q AS (
    SELECT doc_id, lang, text,
      CAST(round(1000*(0.5*(least(len(string_split(text,' ')),50)/50.0)
        + 0.5*(1.0 - len(list_filter(string_split(text,' '), t -> t IN ('a','the')))*1.0
          / len(string_split(text,' '))))) AS BIGINT) qm
    FROM documents),
  kept AS (
    SELECT arg_min(doc_id, doc_id) doc_id, arg_min(lang, doc_id) lang
    FROM q WHERE qm >= 600 GROUP BY md5(text))
  SELECT lang,
    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
         THEN 'train' ELSE 'holdout' END split,
    CAST(count(*) AS BIGINT) n
  FROM kept GROUP BY 1, 2 ORDER BY 1, 2""",
    "split_train_holdout" ->
      """SELECT lang,
  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
       THEN 'train' ELSE 'holdout' END split,
  CAST(count(*) AS BIGINT) n
  FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    "dedup_cluster_canonical" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) tk FROM documents),
  pairs AS (
    SELECT a.doc_id a_id, b.doc_id b_id FROM toks a JOIN toks b
    ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.tk,b.tk))::DOUBLE / len(list_distinct(a.tk || b.tk)) >= 0.9
    ORDER BY 1,2 LIMIT 2000),
  edges AS (SELECT a_id u, b_id v FROM pairs UNION SELECT b_id u, a_id v FROM pairs),
  reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
  SELECT u doc_id, least(u, min(v)) canonical_id FROM reach GROUP BY u ORDER BY u""",
    "dedup_cluster_keep_best" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) tk FROM documents),
  pairs AS (
    SELECT a.doc_id a_id, b.doc_id b_id FROM toks a JOIN toks b
    ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.tk,b.tk))::DOUBLE / len(list_distinct(a.tk || b.tk)) >= 0.9
    ORDER BY 1,2 LIMIT 2000),
  edges AS (SELECT a_id u, b_id v FROM pairs UNION SELECT b_id u, a_id v FROM pairs),
  reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
  labels AS (SELECT u doc_id, least(u, min(v)) lab FROM reach GROUP BY u),
  best AS (SELECT l.lab, max(d.n_chars * 1000000 + d.doc_id) bk
    FROM labels l JOIN documents d ON l.doc_id = d.doc_id GROUP BY 1)
  SELECT l.doc_id, CAST(b.bk % 1000000 AS BIGINT) keep_id
  FROM labels l JOIN best b ON l.lab = b.lab ORDER BY l.doc_id""",
    "sim_pairs_threshold" ->
      """SELECT e1.vec_id a, e2.vec_id b,
  CAST(round(list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[])*100) AS BIGINT) sim_pct
  FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
  WHERE list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) > 0.42
  ORDER BY 1,2 LIMIT 2000""",
    "sim_knn_per_query" ->
      """WITH sims AS (SELECT e1.vec_id q, e2.vec_id n,
    list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) s
  FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id <> e2.vec_id WHERE e1.vec_id < 10)
  SELECT q, n, rn FROM (SELECT q, n, s, row_number() OVER (PARTITION BY q ORDER BY s DESC, n) rn FROM sims) t
  WHERE rn <= 3 ORDER BY q, rn""",
    "text_token_counts" ->
      """SELECT tok, CAST(count(*) AS BIGINT) c FROM (
  SELECT unnest(string_split(text,' ')) tok FROM documents) t
  WHERE tok <> '' GROUP BY 1 ORDER BY c DESC, tok LIMIT 50""",
    "text_lang_stats" ->
      """SELECT lang, CAST(count(*) AS BIGINT) n_docs,
  CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) total_chars,
  CAST(round(avg(CAST(len(string_split(text,' ')) AS BIGINT))*1000) AS BIGINT) avg_toks_milli
  FROM documents GROUP BY 1 ORDER BY 1""",
    "multimodal_join" ->
      """SELECT d.lang, e.label, CAST(count(*) AS BIGINT) c,
  CAST(round(sum(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x)))*1000) AS BIGINT) sq_milli
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
  GROUP BY 1,2 ORDER BY 1,2""",
    "udf_scalar_bucket" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'S' WHEN o_totalprice < 300000 THEN 'M' ELSE 'L' END b,
  CAST(count(*) AS BIGINT) c FROM orders GROUP BY 1 ORDER BY 1""",
    "udaf_geomean" ->
      """SELECT c_mktsegment, CAST(round(exp(avg(ln(c_acctbal)))*100) AS BIGINT) geo_cents
  FROM customer WHERE c_acctbal > 0 GROUP BY 1 ORDER BY 1""",
    "udtf_explode_chars" ->
      """SELECT lang, tok, CAST(count(*) AS BIGINT) c FROM (
  SELECT lang, unnest(string_split(text, ' ')) tok FROM documents) t
  WHERE tok IN ('join','filter','window') GROUP BY 1,2 ORDER BY 1,2""",

    // Cogroup-based as-of (graft.ops.AsOf) — same semantics, same
    // oracle as the composed band-join formulation above.
    "join_asof_cogroup" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
  s AS (SELECT event_id, user_id, ts FROM events WHERE event_type='signup')
  SELECT p.event_id purchase_id, max(s.event_id) last_signup_id
  FROM p JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts
  WHERE s.ts = (SELECT max(s2.ts) FROM s s2 WHERE s2.user_id = p.user_id AND s2.ts <= p.ts)
  GROUP BY 1 ORDER BY 1 LIMIT 1000""",

    // ---- pipeline operators (graft.ops.Pipeline) ----
    // MinHash+LSH at 32 bands × 4 rows has recall > 1-1e-15 for J≥0.9,
    // so its verified output equals the exact blocked join's — it
    // shares dedup_near_jaccard's oracle. (dedup_simhash has no oracle:
    // the sketch is engine-specific; its verified output is asserted
    // equal to the exact join in PipelineSpec instead.)
    "dedup_minhash_lsh" ->
      """WITH toks AS (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) tk FROM documents)
  SELECT a.doc_id a_id, b.doc_id b_id FROM toks a JOIN toks b
  ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.tk,b.tk))::DOUBLE / len(list_distinct(a.tk || b.tk)) >= 0.9
  ORDER BY 1,2 LIMIT 2000""",
    "dedup_ngram_jaccard" ->
      """WITH tk AS (SELECT doc_id, lang, source, string_split(text,' ') t FROM documents),
  sh AS (SELECT doc_id, lang, source,
    list_distinct(list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s
    FROM tk)
  SELECT a.doc_id a_id, b.doc_id b_id FROM sh a JOIN sh b
  ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s,b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8
  ORDER BY 1,2 LIMIT 2000""",
    // banded twin pins the SAME result as the exact shingle join
    // (recall ~1 at 32x4 bands for J>=0.8), so it shares its oracle
    "dedup_ngram_banded" ->
      """WITH tk AS (SELECT doc_id, lang, source, string_split(text,' ') t FROM documents),
  sh AS (SELECT doc_id, lang, source,
    list_distinct(list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s
    FROM tk)
  SELECT a.doc_id a_id, b.doc_id b_id FROM sh a JOIN sh b
  ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s,b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8
  ORDER BY 1,2 LIMIT 2000""",
    "dedup_embedding_cosine" ->
      """WITH v AS (SELECT e.vec_id doc_id, d.lang, e.embedding::DOUBLE[] ve
    FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id)
  SELECT a.doc_id a_id, b.doc_id b_id,
    CAST(round(list_cosine_similarity(a.ve, b.ve)*100) AS BIGINT) sim_pct
  FROM v a JOIN v b ON a.lang = b.lang AND a.doc_id < b.doc_id AND len(a.ve) = len(b.ve)
  WHERE list_cosine_similarity(a.ve, b.ve) > 0.42
  ORDER BY 1,2 LIMIT 2000""",
    "ann_ivf_topk" ->
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
    "text_langid" ->
      """WITH sc AS (SELECT lang,
    len(list_filter(string_split(text,' '), t -> t IN ('table','query','join'))) s_en,
    len(list_filter(string_split(text,' '), t -> t IN ('window','group','sort'))) s_de,
    len(list_filter(string_split(text,' '), t -> t IN ('scan','filter','merge'))) s_es,
    len(list_filter(string_split(text,' '), t -> t IN ('stream','batch','row'))) s_fr,
    len(list_filter(string_split(text,' '), t -> t IN ('vector','hash','key'))) s_zh
  FROM documents),
  p AS (SELECT lang, CASE
    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
    WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END predicted
  FROM sc)
  SELECT lang, predicted, CAST(count(*) AS BIGINT) c FROM p GROUP BY 1,2 ORDER BY 1,2""",
    "text_quality_score" ->
      """WITH d AS (SELECT lang,
    len(string_split(text,' ')) n_tok,
    len(list_filter(string_split(text,' '), t -> t IN ('a','the'))) n_stop
  FROM documents)
  SELECT lang,
  CAST(count(*) AS BIGINT) n_docs,
  CAST(sum(CAST(round(1000*(0.5*(least(n_tok,50)/50.0) + 0.5*(1.0 - n_stop*1.0/n_tok))) AS BIGINT)) AS BIGINT) quality_milli
  FROM d GROUP BY 1 ORDER BY 1""",
    "text_token_bpe" ->
      """SELECT piece, CAST(count(*) AS BIGINT) c FROM (
  SELECT unnest(regexp_extract_all(text, '\w+|[^\w\s]')) piece FROM documents) t
  GROUP BY 1 ORDER BY c DESC, piece LIMIT 50""",
    "text_fingerprint" ->
      """WITH tk AS (SELECT doc_id, string_split(text,' ') t, md5(text) fp FROM documents)
  SELECT doc_id, fp,
  list_min(list_transform(generate_series(1, len(t)-2), i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) fp_shingle
  FROM tk ORDER BY doc_id LIMIT 500""",
    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey,
  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND INTERVAL 30 DAY FOLLOWING) AS BIGINT) n_near,
  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS BIGINT) cents_30d
  FROM orders ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
  first_value(o_orderkey) OVER w first_ok,
  last_value(o_orderkey) OVER w last_ok
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
  ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    "win_pct_rank" ->
      """SELECT o_custkey, o_orderkey,
  CAST(round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)*1e6) AS BIGINT) pr_micro,
  CAST(round(cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)*1e6) AS BIGINT) cd_micro
  FROM orders ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    "agg_arg_extremes" ->
      """SELECT o_custkey,
  arg_max(o_orderstatus, o_orderkey) last_status,
  arg_min(o_orderstatus, o_orderkey) first_status,
  CAST(count(*) AS BIGINT) n
  FROM orders GROUP BY 1 ORDER BY o_custkey LIMIT 1000""",
    "agg_string_agg" ->
      """SELECT c_mktsegment, array_to_string(list_sort(list(c_name)), ',') AS namecat, CAST(count(*) AS BIGINT) c
  FROM customer WHERE c_custkey < 40 GROUP BY 1 ORDER BY 1""",
    "agg_collect_set" ->
      """SELECT o_orderpriority, array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') statuses, CAST(count(*) AS BIGINT) c
  FROM orders GROUP BY 1 ORDER BY 1""",
    "join_right_outer" ->
      """SELECT n_name, CAST(count(c_custkey) AS BIGINT) n_cust
  FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey AND c_acctbal > 9000
  GROUP BY 1 ORDER BY 1 LIMIT 30""",
    "agg_percentiles" ->
      """SELECT o_orderstatus,
  CAST(round(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5)) AS BIGINT) p50,
  CAST(round(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.9)) AS BIGINT) p90
  FROM orders GROUP BY 1 ORDER BY 1""",
    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) bucket, CAST(count(*) AS BIGINT) c
  FROM orders GROUP BY 1 ORDER BY 1""",
    "agg_mode" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) c
    FROM orders GROUP BY 1, 2)
  SELECT o_orderstatus, o_orderpriority AS mode_p, c FROM (
    SELECT o_orderstatus, o_orderpriority, c,
      row_number() OVER (PARTITION BY o_orderstatus ORDER BY c DESC, o_orderpriority) rn
    FROM c) t
  WHERE rn = 1 ORDER BY o_orderstatus""",
    "subq_scalar" ->
      """SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) cents
  FROM orders
  WHERE CAST(round(o_totalprice * 100) AS BIGINT) >
        CAST(round(1.8 * (SELECT avg(o_totalprice) FROM orders) * 100) AS BIGINT)
  ORDER BY o_orderkey""",
    "subq_exists_correlated" ->
      """SELECT c_custkey, c_name FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
  ORDER BY c_custkey""",
    "agg_corr_stats" ->
      """SELECT l_returnflag,
  CAST(round(corr(l_quantity, l_extendedprice) * 1e6) AS BIGINT) corr_micro,
  CAST(round(covar_pop(l_quantity, l_extendedprice)) AS BIGINT) covar_units,
  CAST(round(stddev_samp(l_quantity) * 1000) AS BIGINT) sd_qty_milli
  FROM lineitem GROUP BY 1 ORDER BY 1""",
    "win_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
  CAST(round(avg(CAST(round(o_totalprice*100) AS BIGINT))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) AS BIGINT) ma_cents
  FROM orders ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    "win_pct_rank_global" ->
      """SELECT o_orderkey,
  CAST(round((row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1) * 1e6
             / (count(*) OVER () - 1)) AS BIGINT) pr_micro
  FROM orders ORDER BY o_orderkey LIMIT 1000""",
    "text_containment" ->
      """WITH toks AS (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) tk FROM documents)
  SELECT a.doc_id a_id, b.doc_id b_id,
    CAST(round(len(list_intersect(a.tk,b.tk))::DOUBLE / len(a.tk) * 1000) AS BIGINT) cont_milli
  FROM toks a JOIN toks b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
  WHERE len(list_intersect(a.tk,b.tk))::DOUBLE / len(a.tk) >= 0.7
  ORDER BY 1, 2 LIMIT 2000""",
    "expr_bitwise" ->
      """SELECT o_orderkey,
  CAST(o_orderkey & 255 AS BIGINT) b_and,
  CAST(o_orderkey | 4096 AS BIGINT) b_or,
  CAST(xor(o_orderkey, 1365) AS BIGINT) b_xor,
  CAST(o_orderkey << 2 AS BIGINT) b_shl,
  CAST(o_orderkey >> 3 AS BIGINT) b_shr
  FROM orders ORDER BY o_orderkey LIMIT 1000""",
    "str_funcs2" ->
      """SELECT c_custkey,
  split_part(c_name, '#', 2) name_num,
  CAST(instr(c_name, '#') AS BIGINT) pos,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') padded,
  reverse(c_name) rev,
  CAST(strpos(c_name, 'Customer') AS BIGINT) cpos
  FROM customer ORDER BY c_custkey LIMIT 500""",
    "multimodal_decode" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) n_bytes,
  CAST(octet_length(encode(text)) % 64 + 1 AS BIGINT) width,
  CAST((octet_length(encode(text)) // 64) % 64 + 1 AS BIGINT) height,
  CAST((doc_id * 7 + octet_length(encode(text))) % 256 AS BIGINT) mean_px
  FROM documents ORDER BY doc_id LIMIT 500""",
    "decontaminate_ngram" ->
      """WITH tk AS (SELECT doc_id, lang, string_split(text,' ') t,
    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
         THEN 'train' ELSE 'holdout' END split
    FROM documents),
  sh AS (SELECT doc_id, lang, split,
    unnest(list_transform(generate_series(1, len(t)-7),
      i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]||' '||t[i+5]||' '||t[i+6]||' '||t[i+7])) gram
    FROM tk),
  ev AS (SELECT DISTINCT lang, gram FROM sh WHERE split = 'holdout'),
  contam AS (SELECT DISTINCT s.lang, s.doc_id FROM sh s
             JOIN ev ON s.lang = ev.lang AND s.gram = ev.gram
             WHERE s.split = 'train')
  SELECT t.lang, CAST(count(*) AS BIGINT) n_train,
    CAST(coalesce(c.nc, 0) AS BIGINT) n_contaminated
  FROM tk t
  LEFT JOIN (SELECT lang, count(*) nc FROM contam GROUP BY 1) c ON t.lang = c.lang
  WHERE t.split = 'train'
  GROUP BY t.lang, c.nc ORDER BY t.lang""",
    "text_repetition_ratio" ->
      """WITH t AS (SELECT lang, string_split(text,' ') tk FROM documents)
  SELECT lang, CAST(count(*) AS BIGINT) n_docs,
    CAST(sum(CAST(round(1000*(1.0 - len(list_distinct(tk))*1.0/len(tk))) AS BIGINT)) AS BIGINT) rep_milli_sum
  FROM t GROUP BY 1 ORDER BY 1""",
    "embedding_quantize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] ve FROM embeddings),
  mv AS (SELECT vec_id, ve, list_max(list_transform(ve, x -> abs(x))) m FROM v),
  qv AS (SELECT vec_id, list_transform(ve, x -> CAST(floor(x*127.0/m + 0.5) AS BIGINT)) q FROM mv)
  SELECT vec_id, CAST(list_sum(q) AS BIGINT) q_sum,
    CAST(list_min(q) AS BIGINT) q_min, CAST(list_max(q) AS BIGINT) q_max
  FROM qv ORDER BY vec_id LIMIT 2000""",
    "embedding_cluster_sizes" ->
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
             FROM v CROSS JOIN c2) WHERE rr = 1)
  SELECT cell, CAST(count(*) AS BIGINT) n_vecs FROM assign GROUP BY 1 ORDER BY 1""",
    "corpus_shuffle_shards" ->
      """WITH r AS (SELECT doc_id,
    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) rn
    FROM documents)
  SELECT CAST((rn-1) % 16 AS BIGINT) shard, CAST(count(*) AS BIGINT) n_docs,
    CAST(sum(doc_id) AS BIGINT) id_sum
  FROM r GROUP BY 1 ORDER BY 1""",
    "text_pii_scrub" ->
      """WITH r AS (SELECT event_type, props, regexp_replace(props, '\d+', '#', 'g') red FROM events)
  SELECT event_type, CAST(count(*) AS BIGINT) n,
    CAST(sum(CASE WHEN red <> props THEN 1 ELSE 0 END) AS BIGINT) n_redacted,
    CAST(sum(length(red)) AS BIGINT) red_len
  FROM r GROUP BY 1 ORDER BY 1""",
    "join_asof_nearest" ->
      """WITH p AS (SELECT event_id p_id, user_id, ts p_ts FROM events WHERE event_type='purchase'),
  s AS (SELECT event_id s_id, user_id, ts s_ts FROM events WHERE event_type='signup'),
  j AS (SELECT p_id, s_id, s_ts,
    abs(CAST(floor(epoch(p_ts)) AS BIGINT) - CAST(floor(epoch(s_ts)) AS BIGINT)) diff_s
    FROM p JOIN s USING (user_id)
    WHERE s_ts >= p_ts - INTERVAL 24 HOUR AND s_ts <= p_ts + INTERVAL 24 HOUR),
  r AS (SELECT p_id, s_id, diff_s,
    row_number() OVER (PARTITION BY p_id ORDER BY diff_s, s_ts, s_id) rn FROM j)
  SELECT p_id purchase_id, s_id nearest_signup_id, CAST(diff_s AS BIGINT) diff_s
  FROM r WHERE rn = 1 ORDER BY 1 LIMIT 2000""",
    "events_sessionize_stats" ->
      """WITH o AS (SELECT user_id, event_id, ts,
    CAST(floor(epoch(ts)) AS BIGINT) -
    CAST(floor(epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) gap_s
    FROM events),
  m AS (SELECT user_id, event_id, ts,
    CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END new_sess FROM o),
  sids AS (SELECT user_id, ts,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sid FROM m),
  per AS (SELECT user_id, sid, count(*) n_ev,
    CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) dur_s
    FROM sids GROUP BY 1, 2)
  SELECT user_id, CAST(count(*) AS BIGINT) n_sessions, CAST(sum(n_ev) AS BIGINT) n_events,
    CAST(sum(dur_s) AS BIGINT) dwell_s
  FROM per GROUP BY 1 ORDER BY 1""",
    "recon_value_tolerance" ->
      """WITH a AS (SELECT user_id a_user, ts a_ts, CAST(round(value*100) AS BIGINT) a_cents
    FROM events WHERE event_type='signup'),
  b AS (SELECT user_id b_user, ts b_ts, CAST(round(value*100) AS BIGINT) b_cents
    FROM events WHERE event_type='purchase'),
  j AS (SELECT CASE WHEN a_cents = b_cents THEN 'exact'
               WHEN abs(a_cents - b_cents) <= 100 THEN 'near'
               ELSE 'mismatch' END value_class
        FROM a JOIN b ON a_user = b_user AND b_ts >= a_ts AND b_ts < a_ts + INTERVAL 24 HOUR)
  SELECT value_class, CAST(count(*) AS BIGINT) c FROM j GROUP BY 1 ORDER BY 1""",
    "stream_gap_detect" ->
      """WITH g AS (SELECT user_id,
    CAST(floor(epoch(ts)) AS BIGINT) -
    CAST(floor(epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) gap_s
    FROM events)
  SELECT user_id, CAST(count(*) AS BIGINT) n_gaps, CAST(max(gap_s) AS BIGINT) max_gap_s
  FROM g WHERE gap_s > 21600 GROUP BY 1 ORDER BY 1""",
    "events_retention_cohort" ->
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) cohort_w
    FROM events WHERE event_type='signup' GROUP BY 1),
  act AS (SELECT DISTINCT f.cohort_w, CAST(date_trunc('week', e.ts) AS DATE) active_w, e.user_id
    FROM events e JOIN f ON e.user_id = f.user_id)
  SELECT cohort_w, active_w, CAST(count(*) AS BIGINT) n_users
  FROM act GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_topk_per_day" ->
      """WITH c AS (SELECT CAST(date_trunc('day', ts) AS DATE) w, event_type, CAST(count(*) AS BIGINT) c
    FROM events GROUP BY 1, 2),
  r AS (SELECT w, event_type, c,
    CAST(row_number() OVER (PARTITION BY w ORDER BY c DESC, event_type) AS BIGINT) rk FROM c)
  SELECT w, event_type, c, rk FROM r WHERE rk <= 2 ORDER BY w, rk""",
    // ---- round-4 additions (SURVEY §2.9) ----
    "scd2_user_state" ->
      """WITH v AS (SELECT event_type,
    lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) vt,
    CAST(floor(epoch(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) -
    CAST(floor(epoch(ts)) AS BIGINT) dwell
    FROM events)
  SELECT event_type, CAST(count(*) AS BIGINT) n_versions,
    CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_open,
    CAST(sum(dwell) AS BIGINT) dwell_s
  FROM v GROUP BY 1 ORDER BY 1""",
    "snapshot_diff" ->
      """WITH a AS (SELECT o_custkey k, CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) c
    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1),
  b AS (SELECT o_custkey k, CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) c
    FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
  j AS (SELECT CASE WHEN a.k IS NULL THEN 'added' WHEN b.k IS NULL THEN 'removed'
               WHEN a.c = b.c THEN 'same' ELSE 'changed' END diff_class,
    coalesce(b.c, 0) - coalesce(a.c, 0) delta
    FROM a FULL JOIN b ON a.k = b.k)
  SELECT diff_class, CAST(count(*) AS BIGINT) n_custs, CAST(sum(delta) AS BIGINT) delta_cents
  FROM j GROUP BY 1 ORDER BY 1""",
    "join_interval_overlap" ->
      """WITH iv AS (SELECT o_custkey ck, o_orderkey ok,
    CAST(floor(epoch(o_orderdate)) AS BIGINT) st,
    CAST(floor(epoch(o_orderdate)) AS BIGINT) + 2592000 en FROM orders),
  p AS (SELECT a.ck ck, a.ok a_ok, b.ok b_ok FROM iv a JOIN iv b
    ON a.ck = b.ck AND a.ok < b.ok AND a.st <= b.en AND b.st <= a.en)
  SELECT ck, CAST(count(*) AS BIGINT) n_pairs FROM p GROUP BY 1 ORDER BY 1 LIMIT 2000""",
    "ts_resample_ffill" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
  grid AS (SELECT u.user_id, g.h FROM u CROSS JOIN generate_series(
    TIMESTAMP '2024-01-01 01:00:00', TIMESTAMP '2024-01-08 00:00:00', INTERVAL 1 HOUR) g(h))
  SELECT grid.user_id, CAST(floor(epoch(grid.h)) AS BIGINT) h_epoch,
    CAST(round(e.value*100) AS BIGINT) val_cents
  FROM grid ASOF LEFT JOIN events e ON grid.user_id = e.user_id AND e.ts <= grid.h
  ORDER BY 1, 2""",
    "win_ewma" ->
      """WITH c AS (SELECT user_id, event_id, ts, CAST(round(value*100) AS BIGINT) cents FROM events),
  e AS (SELECT user_id, event_id,
    coalesce(cents, 0)*128 + coalesce(lag(cents, 1) OVER w, 0)*64 +
    coalesce(lag(cents, 2) OVER w, 0)*32 + coalesce(lag(cents, 3) OVER w, 0)*16 +
    coalesce(lag(cents, 4) OVER w, 0)*8 + coalesce(lag(cents, 5) OVER w, 0)*4 +
    coalesce(lag(cents, 6) OVER w, 0)*2 + coalesce(lag(cents, 7) OVER w, 0) ewma
    FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
  SELECT user_id, event_id, CAST(ewma AS BIGINT) ewma_c128
  FROM e ORDER BY user_id, event_id LIMIT 1000""",
    "join_runtime_bloom" ->
      """SELECT p_size, CAST(count(*) AS BIGINT) n_lines,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) qty_sum
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1' AND p_size < 10
  GROUP BY 1 ORDER BY 1""",
    "corpus_mix_resample" ->
      """WITH f AS (SELECT doc_id,
    CASE WHEN CAST(substr(source, 4, 2) AS INT) < 10 THEN 'web'
         WHEN CAST(substr(source, 4, 2) AS INT) < 15 THEN 'books' ELSE 'code' END fam
    FROM documents),
  r AS (SELECT fam, doc_id, row_number() OVER (
    PARTITION BY fam ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) rn FROM f)
  SELECT fam, CAST(count(*) AS BIGINT) n_docs, CAST(sum(doc_id) AS BIGINT) id_sum
  FROM r WHERE rn <= CASE fam WHEN 'web' THEN 100 WHEN 'books' THEN 60 ELSE 40 END
  GROUP BY 1 ORDER BY 1""",
    "text_gopher_filters" ->
      """WITH t AS (SELECT lang, string_split(text, ' ') sp FROM documents),
  m AS (SELECT lang, len(sp) n,
    CAST(list_sum(list_transform(sp, x -> length(x))) AS BIGINT) sl,
    CAST(list_max(list_transform(sp, x -> length(x))) AS BIGINT) ml,
    len(list_distinct(sp)) nd FROM t),
  r AS (SELECT lang,
    CASE WHEN n BETWEEN 10 AND 1000 THEN 1 ELSE 0 END r_len,
    CASE WHEN sl*1000 >= n*2000 AND sl*1000 <= n*10000 THEN 1 ELSE 0 END r_mean,
    CASE WHEN nd*2 >= n THEN 1 ELSE 0 END r_rep,
    CASE WHEN ml <= 20 THEN 1 ELSE 0 END r_max FROM m)
  SELECT lang, CAST(count(*) AS BIGINT) n_docs,
    CAST(sum(r_len) AS BIGINT) p_len, CAST(sum(r_mean) AS BIGINT) p_mean,
    CAST(sum(r_rep) AS BIGINT) p_rep, CAST(sum(r_max) AS BIGINT) p_max,
    CAST(sum(r_len*r_mean*r_rep*r_max) AS BIGINT) p_all
  FROM r GROUP BY 1 ORDER BY 1""",
    "unpivot_metrics" ->
      """WITH m AS (SELECT lang, CAST(count(*) AS BIGINT) n_docs,
    CAST(sum(len(string_split(text, ' '))) AS BIGINT) n_tokens,
    CAST(sum(length(text)) AS BIGINT) n_chars FROM documents GROUP BY 1)
  SELECT lang, 'n_docs' metric, n_docs AS "value" FROM m
  UNION ALL SELECT lang, 'n_tokens', n_tokens FROM m
  UNION ALL SELECT lang, 'n_chars', n_chars FROM m
  ORDER BY 1, 2""",
    "multimodal_frame_sample" ->
      """SELECT doc_id, CAST(ceil(length(text)/64.0) AS BIGINT) n_frames,
  CAST(len(range(1, CAST(ceil(length(text)/64.0) AS BIGINT)+1, 4)) AS BIGINT) n_sampled,
  CAST(list_sum(list_transform(range(1, CAST(ceil(length(text)/64.0) AS BIGINT)+1, 4),
       i -> i * ascii(substr(text, CAST((i-1)*64+1 AS BIGINT), 1)))) AS BIGINT) checksum
  FROM documents ORDER BY doc_id LIMIT 500""",
    "ts_downsample_ohlc" ->
      """SELECT user_id, CAST(floor(floor(epoch(ts))/21600) AS BIGINT) b,
  CAST(arg_min(CAST(round(value*100) AS BIGINT), ts) AS BIGINT) open_c,
  CAST(max(CAST(round(value*100) AS BIGINT)) AS BIGINT) high_c,
  CAST(min(CAST(round(value*100) AS BIGINT)) AS BIGINT) low_c,
  CAST(arg_max(CAST(round(value*100) AS BIGINT), ts) AS BIGINT) close_c,
  CAST(count(*) AS BIGINT) n
  FROM events WHERE user_id < 50
  GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 5000""",
    "stream_cdc_apply" ->
      """WITH c AS (SELECT user_id, ts, event_id,
    CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END op,
    CAST(round(value*100) AS BIGINT) c FROM events),
  r AS (SELECT user_id, op, c,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM c)
  SELECT user_id, c val_cents FROM r WHERE rn = 1 AND op = 'upsert'
  ORDER BY user_id LIMIT 2000""",
    "agg_heavy_hitters" ->
      """WITH k AS (SELECT event_type, CAST(count(*) AS BIGINT) c FROM events GROUP BY 1),
  t AS (SELECT CAST(count(*) AS BIGINT) total FROM events)
  SELECT event_type, c, CAST(c*1000 // total AS BIGINT) share_pm
  FROM k CROSS JOIN t WHERE c*20 > total ORDER BY event_type""",
    "audit_table_checksum" ->
      """WITH h AS (SELECT o_orderstatus,
    CAST(('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
      o_orderpriority, CAST(round(o_totalprice*100) AS BIGINT))), 1, 15)) AS BIGINT) h
    FROM orders)
  SELECT o_orderstatus, CAST(count(*) AS BIGINT) n_rows, CAST(bit_xor(h) AS BIGINT) checksum
  FROM h GROUP BY 1 ORDER BY 1""",
    "dedup_editdist" ->
      """SELECT a.doc_id a_id, b.doc_id b_id,
  CAST(levenshtein(a.text, b.text) AS BIGINT) dist
  FROM documents a JOIN documents b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
   AND abs(length(a.text) - length(b.text)) <= 20
  WHERE levenshtein(a.text, b.text) <= 20
  ORDER BY a_id, b_id LIMIT 2000""",
    "text_unigram_surprisal" ->
      """WITH g AS (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents),
  v AS (SELECT tok, CAST(count(*) AS BIGINT) c FROM g GROUP BY 1),
  r AS (SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) rank FROM v)
  SELECT g.doc_id, CAST(count(*) AS BIGINT) n_tok, CAST(sum(r.rank) AS BIGINT) surprisal
  FROM g JOIN r ON g.tok = r.tok
  GROUP BY 1 ORDER BY 1 LIMIT 2000""",
    // try_add's overflow-to-NULL is mirrored structurally (DuckDB raises
    // on overflow): max_long + k overflows exactly when k > 0.
    "expr_try_funcs" ->
      """WITH t AS (SELECT o_orderstatus,
    o_totalprice / nullif(o_custkey % 3, 0) dv,
    TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) pc,
    CASE WHEN o_orderkey > 0 THEN NULL ELSE o_orderkey END ov
    FROM orders)
  SELECT o_orderstatus, CAST(count(*) AS BIGINT) n,
    CAST(sum(CASE WHEN dv IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_div_null,
    CAST(sum(CAST(round(dv*100) AS BIGINT)) AS BIGINT) div_cents,
    CAST(sum(pc) AS BIGINT) prio_sum,
    CAST(sum(CASE WHEN ov IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_overflow
  FROM t GROUP BY 1 ORDER BY 1""",
    "sample_weighted" ->
      """WITH m AS (SELECT max(n_chars) max_w FROM documents),
  k AS (SELECT lang, doc_id, n_chars,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) h
    FROM documents)
  SELECT lang, CAST(count(*) AS BIGINT) n_kept, CAST(sum(n_chars) AS BIGINT) w_kept
  FROM k CROSS JOIN m WHERE h * max_w < n_chars * 4294967296
  GROUP BY 1 ORDER BY 1""",
    "json_variant_funcs" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) n,
  CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) k_sum,
  CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) k_max
  FROM events GROUP BY 1 ORDER BY 1""",
    // ---- round-5 wave 2 ----
    "agg_bool_funcs" ->
      """SELECT o_orderpriority, bool_and(o_totalprice > 1000) all_over_1k,
  bool_or(o_totalprice > 400000) any_over_400k,
  CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) n_finished,
  CAST(count(*) AS BIGINT) c
  FROM orders GROUP BY 1 ORDER BY 1""",
    // hash-rank sampling: md5 hex of the id string is engine-agnostic
    "sample_reservoir_group" ->
      """SELECT lang, doc_id, rn FROM (
    SELECT lang, doc_id, CAST(row_number() OVER (
      PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) rn
    FROM documents) t WHERE rn <= 5 ORDER BY lang, rn""",
    "join_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
  s AS (SELECT event_id, user_id, ts FROM events WHERE event_type='signup')
  SELECT p.event_id purchase_id, max(s.event_id) last_signup_id
  FROM p JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts AND s.ts > p.ts - INTERVAL 7 DAY
  WHERE s.ts = (SELECT max(s2.ts) FROM s s2 WHERE s2.user_id = p.user_id
    AND s2.ts <= p.ts AND s2.ts > p.ts - INTERVAL 7 DAY)
  GROUP BY 1 ORDER BY 1 LIMIT 1000""",
    // exact floor(x*1000+0.5) quantization on both sides (no round():
    // half-mode differs between engines on dyadic-rational floats)
    "array_zip_covar" ->
      """SELECT vec_id, CAST(list_sum(list_transform(generate_series(1, 8),
    i -> CAST(floor(e[i]*1000 + 0.5) AS BIGINT) * CAST(floor(e[i+1]*1000 + 0.5) AS BIGINT))) AS BIGINT) zcov
  FROM (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings) t
  ORDER BY vec_id LIMIT 2000""",
    "date_extract_funcs" ->
      """SELECT o_orderkey, CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) isodow,
  CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) doy,
  CAST(week(CAST(o_orderdate AS DATE)) AS BIGINT) woy,
  CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) q,
  last_day(CAST(o_orderdate AS DATE)) eom
  FROM orders ORDER BY o_orderkey LIMIT 1000""",
    // the interpolation expression tree is written IDENTICALLY on both
    // sides (IEEE double ops are deterministic; only round()'s half
    // mode is not, hence floor(x*100+0.5))
    "ts_resample_interp" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
  grid AS (SELECT u.user_id, g.h FROM u CROSS JOIN generate_series(
    TIMESTAMP '2024-01-01 01:00:00', TIMESTAMP '2024-01-08 00:00:00', INTERVAL 1 HOUR) g(h)),
  prevj AS (SELECT grid.user_id, grid.h, e.ts pt, e.value pv
    FROM grid ASOF LEFT JOIN events e ON grid.user_id = e.user_id AND e.ts <= grid.h),
  nextj AS (SELECT grid.user_id, grid.h, e.ts nt, e.value nv
    FROM grid ASOF LEFT JOIN events e ON grid.user_id = e.user_id AND grid.h < e.ts)
  SELECT p.user_id, CAST(floor(epoch(p.h)) AS BIGINT) h_epoch,
    CASE WHEN p.pt IS NULL THEN NULL
         WHEN n.nt IS NULL THEN CAST(floor(p.pv*100 + 0.5) AS BIGINT)
         ELSE CAST(floor((p.pv + (n.nv - p.pv) *
           ((epoch_us(p.h) - epoch_us(p.pt))::DOUBLE / (epoch_us(n.nt) - epoch_us(p.pt))::DOUBLE))
           * 100 + 0.5) AS BIGINT) END val_cents
  FROM prevj p JOIN nextj n ON p.user_id = n.user_id AND p.h = n.h
  ORDER BY 1, 2""",
    "agg_regression" ->
      """SELECT l_returnflag,
  CAST(floor(regr_slope(l_extendedprice, l_quantity) * 1000 + 0.5) AS BIGINT) slope_milli,
  CAST(floor(regr_intercept(l_extendedprice, l_quantity) * 1000 + 0.5) AS BIGINT) icept_milli,
  CAST(floor(regr_r2(l_extendedprice, l_quantity) * 1e6 + 0.5) AS BIGINT) r2_micro,
  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) n,
  CAST(floor(regr_avgx(l_extendedprice, l_quantity) * 1e6 + 0.5) AS BIGINT) avgx_micro,
  CAST(floor(regr_avgy(l_extendedprice, l_quantity) * 100 + 0.5) AS BIGINT) avgy_cents
  FROM lineitem GROUP BY 1 ORDER BY 1""",
    // Spark's skewness/kurtosis are the POPULATION g1 / excess-g2
    // forms; DuckDB's builtins are sample-corrected, so the oracle
    // replicates the population formula from two-pass central moments
    "agg_skew_kurt" ->
      """WITH mu AS (SELECT o_orderpriority p, avg(o_totalprice) m FROM orders GROUP BY 1),
  mom AS (SELECT o.o_orderpriority p,
    avg(pow(o.o_totalprice - mu.m, 2)) m2,
    avg(pow(o.o_totalprice - mu.m, 3)) m3,
    avg(pow(o.o_totalprice - mu.m, 4)) m4,
    count(*) c
    FROM orders o JOIN mu ON o.o_orderpriority = mu.p GROUP BY 1)
  SELECT p o_orderpriority,
    CAST(floor(m3 / pow(m2, 1.5) * 1e6 + 0.5) AS BIGINT) skew_micro,
    CAST(floor((m4 / (m2 * m2) - 3) * 1e6 + 0.5) AS BIGINT) kurt_micro,
    c
  FROM mom ORDER BY 1""",
    "text_sim_funcs" ->
      """SELECT a.n_name a_name, b.n_name b_name,
  CAST(floor(jaro_winkler_similarity(a.n_name, b.n_name) * 1e6 + 0.5) AS BIGINT) jw_micro,
  CAST(hamming(rpad(substr(a.n_name, 1, 8), 8, '#'),
               rpad(substr(b.n_name, 1, 8), 8, '#')) AS BIGINT) ham8
  FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
  ORDER BY 1, 2""",
    "ts_merge_intervals" ->
      """WITH iv AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) d,
    CAST(o_orderdate AS DATE) + 30 iv_end FROM orders),
  flagged AS (SELECT o_custkey, o_orderkey, d, iv_end,
    max(iv_end) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) prev_end
    FROM iv),
  numbered AS (SELECT o_custkey, d, iv_end,
    sum(CASE WHEN prev_end IS NULL OR d > prev_end THEN 1 ELSE 0 END)
      OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) island
    FROM flagged)
  SELECT o_custkey, CAST(island AS BIGINT) island, min(d) start_date,
    max(iv_end) end_date, count(*) n_orders
  FROM numbered GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_transition_counts" ->
      """WITH t AS (SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_type
  FROM events)
  SELECT prev_type, event_type cur_type, count(*) n FROM t
  WHERE prev_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""",
    "skyline_pareto" ->
      """WITH pts AS (SELECT doc_id, CAST(n_chars AS BIGINT) n_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) n_toks FROM documents),
  gx AS (SELECT n_chars, max(n_toks) ymax FROM pts GROUP BY 1),
  fr AS (SELECT n_chars, ymax, max(ymax) OVER (ORDER BY n_chars DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) ycut FROM gx)
  SELECT p.doc_id, p.n_chars, p.n_toks
  FROM pts p JOIN fr f ON p.n_chars = f.n_chars AND p.n_toks = f.ymax
  WHERE f.ycut IS NULL OR f.ymax > f.ycut ORDER BY 1""",
    "customer_rfm" ->
      """WITH base AS (SELECT o_custkey, max(CAST(o_orderdate AS DATE)) last_date,
    count(*) f, sum(CAST(round(o_totalprice * 100) AS BIGINT)) m
    FROM orders GROUP BY 1),
  scored AS (SELECT o_custkey,
    CAST(ntile(5) OVER (ORDER BY last_date, o_custkey) AS BIGINT) r_score,
    CAST(ntile(5) OVER (ORDER BY f, o_custkey) AS BIGINT) f_score,
    CAST(ntile(5) OVER (ORDER BY m, o_custkey) AS BIGINT) m_score
    FROM base)
  SELECT o_custkey, r_score, f_score, m_score,
    r_score * 100 + f_score * 10 + m_score rfm
  FROM scored ORDER BY o_custkey""",
    "str_url_funcs" ->
      """WITH u AS (SELECT doc_id,
    'https://' || source || '.example.com/' || lang || '/doc/' ||
    CAST(doc_id AS VARCHAR) || '?q=' || lang || '&id=' ||
    CAST(doc_id AS VARCHAR) url FROM documents)
  SELECT doc_id,
    regexp_extract(url, '^([a-z]+)://', 1) proto,
    regexp_extract(url, '^[a-z]+://([^/]+)/', 1) host,
    regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) path,
    regexp_extract(url, '\?(.*)$', 1) query,
    regexp_extract(url, '[?&]id=([^&]*)', 1) qid
  FROM u ORDER BY doc_id""",
    "win_streak_longest" ->
      """WITH dd AS (SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) d FROM orders),
  g AS (SELECT o_custkey, d, d - CAST(row_number() OVER
    (PARTITION BY o_custkey ORDER BY d) AS INTEGER) grp FROM dd),
  s AS (SELECT o_custkey, grp, count(*) streak FROM g GROUP BY 1, 2)
  SELECT o_custkey, max(streak) max_streak,
    CAST(sum(streak) AS BIGINT) active_days
  FROM s GROUP BY 1 ORDER BY 1""",
    "win_cum_distinct" ->
      """WITH f AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) od,
    CASE WHEN row_number() OVER (PARTITION BY o_custkey, o_orderpriority
      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) = 1 THEN 1 ELSE 0 END fst
    FROM orders)
  SELECT o_custkey, o_orderkey,
    CAST(sum(fst) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) n_prio_seen
  FROM f ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    // IDENTICAL explicit tree on both engines (counts -> ratios ->
    // -sum p*log2 p); per-term log2 ulp skew ~1e-16 vs the 5e-4 band
    "agg_entropy_sources" ->
      """WITH c AS (SELECT lang, source, count(*) c FROM documents GROUP BY 1, 2),
  p AS (SELECT lang, c, c / (sum(c) OVER (PARTITION BY lang)) p FROM c)
  SELECT lang,
    CAST(floor(-sum(p * log2(p)) * 1000 + 0.5) AS BIGINT) h_milli,
    CAST(sum(c) AS BIGINT) n
  FROM p GROUP BY 1 ORDER BY 1""",
    "array_stats_funcs" ->
      """WITH e AS (SELECT vec_id, list_sort(embedding::DOUBLE[]) se,
    embedding::DOUBLE[] ed FROM embeddings)
  SELECT vec_id,
    CAST(floor(se[1] * 1000 + 0.5) AS BIGINT) emin_milli,
    CAST(floor(se[len(se)] * 1000 + 0.5) AS BIGINT) emax_milli,
    CAST(floor(se[(len(se) + 1) // 2] * 1000 + 0.5) AS BIGINT) emed_milli,
    CAST(floor(sqrt(list_dot_product(ed, ed)) * 1000 + 0.5) AS BIGINT) l2_milli
  FROM e ORDER BY vec_id LIMIT 2000""",
    "agg_bitmap_distinct" ->
      """SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) n_cust
  FROM orders GROUP BY 1 ORDER BY 1""",
    "str_funcs3" ->
      """SELECT p_partkey,
    split_part(p_name, ' ', 2) second_word,
    translate(p_brand, 'Brand#', 'brnd-') brand_tx,
    repeat(p_type, 2) type2,
    reverse(p_name) rev_name,
    left(p_name, 4) l4,
    right(p_name, 4) r4
  FROM part ORDER BY p_partkey LIMIT 1000""",
    "win_ratio_to_report" ->
      """WITH c AS (SELECT o_custkey, o_orderkey,
    CAST(round(o_totalprice * 100) AS BIGINT) c FROM orders)
  SELECT o_custkey, o_orderkey,
    CAST(floor(c * 1e6 / (sum(c) OVER (PARTITION BY o_custkey)) + 0.5) AS BIGINT) share_micro
  FROM c ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    "win_pct_change" ->
      """WITH c AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) od,
    CAST(round(o_totalprice * 100) AS BIGINT) c FROM orders),
  l AS (SELECT o_custkey, o_orderkey, c,
    lag(c) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey) prev FROM c)
  SELECT o_custkey, o_orderkey,
    CASE WHEN prev IS NULL THEN NULL
         ELSE CAST(floor((c - prev) * 1e4 / prev + 0.5) AS BIGINT) END chg_bp
  FROM l ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    "win_topk_with_ties" ->
      """WITH c AS (SELECT o_orderpriority, o_orderkey,
    CAST(round(o_totalprice * 100) AS BIGINT) c FROM orders),
  r AS (SELECT o_orderpriority, o_orderkey, c,
    CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY c DESC) AS BIGINT) rk FROM c)
  SELECT o_orderpriority, o_orderkey, c, rk FROM r WHERE rk <= 3
  ORDER BY o_orderpriority, rk, o_orderkey""",
    "join_null_safe" ->
      """WITH o AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') k FROM orders),
  d AS (SELECT DISTINCT k, coalesce(k, 'PENDING') k_label FROM o)
  SELECT d.k_label, count(*) n FROM o JOIN d ON o.k IS NOT DISTINCT FROM d.k
  GROUP BY 1 ORDER BY 1""",
    "expr_decimal_mul" ->
      """SELECT l_returnflag,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
    AS DECIMAL(28,4))) * 10000 AS BIGINT) revenue_x10k
  FROM lineitem GROUP BY 1 ORDER BY 1""",
    "agg_weighted_avg" ->
      """WITH t AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) c,
    CAST(l_quantity AS BIGINT) q FROM lineitem)
  SELECT l_returnflag,
    CAST(floor(CAST(sum(c * q) AS DOUBLE) / CAST(sum(q) AS DOUBLE) + 0.5) AS BIGINT) wavg_cents,
    CAST(sum(q) AS BIGINT) total_qty
  FROM t GROUP BY 1 ORDER BY 1""",
    "join_asof_left" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
  s AS (SELECT event_id, user_id, ts FROM events WHERE event_type='signup'),
  m AS (SELECT p.event_id pid, max(s.event_id) sid
    FROM p JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts
    WHERE s.ts = (SELECT max(s2.ts) FROM s s2 WHERE s2.user_id = p.user_id AND s2.ts <= p.ts)
    GROUP BY 1)
  SELECT p.event_id purchase_id, m.sid last_signup_id
  FROM p LEFT JOIN m ON p.event_id = m.pid ORDER BY 1 LIMIT 1000""",
    "ts_bucket_15m" ->
      """SELECT epoch_us(ts) // 1000000 // 900 * 900 bucket_epoch, event_type,
    count(*) n, CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) cents
  FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 2000""",
    // Spark runs the actual `inline` generator; the oracle states the
    // identical fan-out relationally
    "gen_inline_structs" ->
      """WITH t AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) c FROM orders)
  SELECT * FROM (
    SELECT o_orderkey, 'base' kind, c amt FROM t
    UNION ALL
    SELECT o_orderkey, 'tax' kind, c // 10 amt FROM t)
  ORDER BY o_orderkey, kind LIMIT 2000""",
    "win_rolling_median" ->
      """WITH t AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) od,
    CAST(round(o_totalprice * 100) AS BIGINT) c FROM orders),
  f AS (SELECT o_custkey, o_orderkey,
    list_sort(list(c) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey
      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) frame FROM t)
  SELECT o_custkey, o_orderkey, frame[(len(frame) + 1) // 2] med_cents
  FROM f ORDER BY o_custkey, o_orderkey LIMIT 1000""",
    // ORDER BY the full entry string, not the source: Spark's
    // array_sort compares whole entries, and 'src10=...' < 'src1=...'
    // ('0' < '=') while 'src1' < 'src10' as bare keys
    "agg_histogram_map" ->
      """SELECT lang, string_agg(e, ',' ORDER BY e) hist
  FROM (SELECT lang, source || '=' || CAST(count(*) AS VARCHAR) e
    FROM documents GROUP BY lang, source) t
  GROUP BY 1 ORDER BY 1""",
  )
}
