package graft.oracle

/** Round-18 wave (W33) oracles — validated by tools/draft_w33.py in
  * DuckDB at sf0.001 and sf0.01 before the Spark twins were written.
  * See graft.ops.Metrics14 for the exactness discipline notes.
  */
object OracleW33 {
  val sql: Map[String, String] = Map(


    // Mann-Whitney rank-sum between BUILDING and MACHINERY order values:
    // 2*R1 kept integral under average-tie ranks (2*avgrank = 2*min_rank +
    // cnt_eq - 1), u2 = 2*U1 = 2*R1 - n1*(n1+1). Pure integers.
    "mw_u_segments" ->
      """
WITH s AS (SELECT c.c_mktsegment seg,
    CAST(round(o.o_totalprice * 100) AS BIGINT) v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
 r AS (SELECT seg, 2 * rank() OVER (ORDER BY v)
         + count(*) OVER (PARTITION BY v) - 1 AS r2 FROM s),
 n AS (SELECT CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) n1,
              CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) n2
       FROM s)
SELECT n.n1, n.n2,
  CAST((SELECT sum(r2) FROM r WHERE seg = 'BUILDING') - n.n1 * (n.n1 + 1)
    AS BIGINT) u2
FROM n
""",


    // Two-sample Kolmogorov-Smirnov D between the same segments, scaled by
    // n1*n2 so the statistic is an exact integer: max |n2*F1 - n1*F2|.
    "ks_price_segments" ->
      """
WITH s AS (SELECT c.c_mktsegment seg,
    CAST(round(o.o_totalprice * 100) AS BIGINT) v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
 n AS (SELECT CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) n1,
              CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) n2
       FROM s),
 pv AS (SELECT v,
    CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) c1,
    CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) c2
  FROM s GROUP BY v),
 cum AS (SELECT sum(c1) OVER (ORDER BY v) f1, sum(c2) OVER (ORDER BY v) f2 FROM pv)
SELECT n.n1, n.n2,
  CAST((SELECT max(abs(n.n2 * f1 - n.n1 * f2)) FROM cum) AS BIGINT) d_scaled
FROM n
""",


    // h-index of customers by order count per market segment: the largest h
    // such that h customers place at least h orders each. Exact integers.
    "cust_h_index" ->
      """
WITH oc AS (SELECT c.c_mktsegment seg, o.o_custkey,
    CAST(count(*) AS BIGINT) n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1, 2),
 rk AS (SELECT seg, n,
    row_number() OVER (PARTITION BY seg ORDER BY n DESC, o_custkey) r FROM oc)
SELECT seg AS segment,
  CAST(coalesce(max(CASE WHEN n >= r THEN r END), 0) AS BIGINT) h_index,
  CAST(count(*) AS BIGINT) customers
FROM rk GROUP BY 1 ORDER BY segment
""",


    // Lorenz curve: cumulative revenue share (milli) at each customer
    // decile per segment, deciles by ntile(10) over (revenue asc, custkey).
    "lorenz_decile_share" ->
      """
WITH cr AS (SELECT c.c_mktsegment seg, o.o_custkey ck,
    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) r
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1, 2),
 d AS (SELECT seg, r, ntile(10) OVER (PARTITION BY seg ORDER BY r, ck) dc FROM cr),
 g AS (SELECT seg, dc, CAST(sum(r) AS BIGINT) dr FROM d GROUP BY 1, 2),
 t AS (SELECT seg, CAST(sum(r) AS BIGINT) tot FROM cr GROUP BY 1)
SELECT g.seg AS segment, CAST(g.dc AS BIGINT) decile,
  CAST((1000 * sum(g.dr) OVER (PARTITION BY g.seg ORDER BY g.dc)) // t.tot
    AS BIGINT) cum_share_milli
FROM g JOIN t ON g.seg = t.seg ORDER BY segment, decile
""",


    // Jensen-Shannon divergence between GERMANY's and FRANCE's order-value
    // distributions over 50k-dollar buckets (micro; zero-mass terms drop).
    "js_div_nation_prices" ->
      """
WITH s AS (SELECT n.n_name nat,
    CAST(round(o.o_totalprice * 100) AS BIGINT) // 5000000 b
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_7')),
 pb AS (SELECT b,
    CAST(sum(CASE WHEN nat = 'NATION_3' THEN 1 ELSE 0 END) AS BIGINT) cg,
    CAST(sum(CASE WHEN nat = 'NATION_7' THEN 1 ELSE 0 END) AS BIGINT) cf
  FROM s GROUP BY b),
 n AS (SELECT CAST(sum(cg) AS BIGINT) ng, CAST(sum(cf) AS BIGINT) nf FROM pb),
 term AS (SELECT
    CAST(cg AS DOUBLE) / n.ng p, CAST(cf AS DOUBLE) / n.nf q
  FROM pb, n)
SELECT (SELECT ng FROM n) n_a, (SELECT nf FROM n) n_b,
  CAST(floor(sum(
      0.5 * (CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0 END)
    + 0.5 * (CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0 END)
    ) * 1000000 + 0.5) AS BIGINT) js_micro
FROM term
""",


    // Median absolute deviation of lineitem quantity per return flag —
    // both medians exact discrete elements at ceil(n/2). Pure integers.
    "li_mad_quantity" ->
      """
WITH q AS (SELECT l_returnflag flag, CAST(round(l_quantity) AS BIGINT) v
  FROM lineitem),
 med AS (SELECT flag, v, row_number() OVER (PARTITION BY flag ORDER BY v) i,
    count(*) OVER (PARTITION BY flag) n FROM q),
 m AS (SELECT flag, CAST(max(CASE WHEN i = (n + 1) // 2 THEN v END) AS BIGINT) med
   FROM med GROUP BY flag),
 ad AS (SELECT q.flag, abs(q.v - m.med) a FROM q JOIN m ON q.flag = m.flag),
 adr AS (SELECT flag, a, row_number() OVER (PARTITION BY flag ORDER BY a) i,
    count(*) OVER (PARTITION BY flag) n FROM ad)
SELECT m.flag AS returnflag, m.med AS median_qty,
  CAST(max(CASE WHEN adr.i = (adr.n + 1) // 2 THEN adr.a END) AS BIGINT) mad_qty
FROM adr JOIN m ON adr.flag = m.flag GROUP BY 1, 2 ORDER BY returnflag
""",


    // 10%-trimmed acctbal per nation: drop floor(n/10) customers from each
    // end of the (cents, custkey) order; ship the exact (sum, count) pair
    // (acctbal cents can be negative — no integer division).
    "nation_trimmed_mean_bal" ->
      """
WITH b AS (SELECT n.n_name nation, c.c_custkey ck,
    CAST(round(c.c_acctbal * 100) AS BIGINT) v
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
 r AS (SELECT nation, v, row_number() OVER (PARTITION BY nation ORDER BY v, ck) i,
    count(*) OVER (PARTITION BY nation) n FROM b)
SELECT nation, CAST(count(*) AS BIGINT) kept,
  CAST(sum(v) AS BIGINT) kept_cents
FROM r WHERE i > n // 10 AND i <= n - n // 10
GROUP BY 1 ORDER BY nation
""",


    // Bowley quartile skewness of order value per priority — exact discrete
    // quartiles, shipped as the (numerator, denominator) integer pair.
    "orders_bowley_skew" ->
      """
WITH v AS (SELECT o_orderpriority pri,
    CAST(round(o_totalprice * 100) AS BIGINT) v FROM orders),
 r AS (SELECT pri, v, row_number() OVER (PARTITION BY pri ORDER BY v) i,
    count(*) OVER (PARTITION BY pri) n FROM v),
 q AS (SELECT pri,
    CAST(max(CASE WHEN i = CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS BIGINT) q1,
    CAST(max(CASE WHEN i = CAST(ceil(0.50 * n) AS BIGINT) THEN v END) AS BIGINT) q2,
    CAST(max(CASE WHEN i = CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS BIGINT) q3
  FROM r GROUP BY pri)
SELECT pri AS priority, q1, q3,
  CAST(q3 + q1 - 2 * q2 AS BIGINT) bowley_num,
  CAST(q3 - q1 AS BIGINT) bowley_den
FROM q ORDER BY priority
""",


    // Nelson-Aalen cumulative hazard of the order->ship lag per return
    // flag, evaluated at lag <= 30 days (micro).
    "nelson_aalen_hazard" ->
      """
WITH t AS (SELECT l.l_returnflag flag,
    CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) t
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= o.o_orderdate),
 d AS (SELECT flag, t, CAST(count(*) AS BIGINT) d FROM t GROUP BY 1, 2),
 risk AS (SELECT d.flag, d.t, d.d,
    (SELECT CAST(count(*) AS BIGINT) FROM t t2
      WHERE t2.flag = d.flag AND t2.t >= d.t) n FROM d)
SELECT flag AS returnflag,
  CAST(floor(sum(CASE WHEN t <= 30 THEN CAST(d AS DOUBLE) / n ELSE 0 END)
    * 1000000 + 0.5) AS BIGINT) na30_micro
FROM risk GROUP BY 1 ORDER BY returnflag
""",


    // Page-Hinkley drift statistic on daily order revenue, exactly: with
    // M_t = n*cumsum(x) - t*S (cents scaled by n), PH = max drawup of M.
    "page_hinkley_revenue" ->
      """
WITH d AS (SELECT CAST(o_orderdate AS DATE) dy,
    sum(CAST(round(o_totalprice * 100) AS BIGINT)) x
  FROM orders GROUP BY 1),
 n AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(x) AS BIGINT) s FROM d),
 m AS (SELECT d.dy, n.n * sum(d.x) OVER (ORDER BY d.dy)
         - (row_number() OVER (ORDER BY d.dy)) * n.s AS mt FROM d, n),
 du AS (SELECT mt - min(mt) OVER (ORDER BY dy ROWS BETWEEN UNBOUNDED
   PRECEDING AND CURRENT ROW) AS u FROM m)
SELECT (SELECT n FROM n) n_days,
  CAST((SELECT max(u) FROM du) AS BIGINT) ph_scaled
FROM n
""",


    // Log-log demand elasticity per brand: OLS slope of ln(quantity) on
    // ln(unit price) across lineitems (milli).
    "elasticity_brand_loglog" ->
      """
WITH x AS (SELECT p.p_brand brand,
    ln(CAST(l.l_extendedprice AS DOUBLE) / l.l_quantity) lx,
    ln(CAST(round(l.l_quantity) AS DOUBLE)) ly
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_quantity >= 1)
SELECT brand, CAST(count(*) AS BIGINT) n,
  CAST(floor((avg(lx * ly) - avg(lx) * avg(ly))
    / (avg(lx * lx) - avg(lx) * avg(lx)) * 1000 + 0.5) AS BIGINT) slope_milli
FROM x GROUP BY 1 ORDER BY brand
""",


    // Cohen's d effect size between BUILDING and MACHINERY order values
    // (pooled unbiased variance, milli).
    "cohens_d_segments" ->
      """
WITH s AS (SELECT c.c_mktsegment seg,
    CAST(round(o.o_totalprice * 100) AS BIGINT) v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
 g AS (SELECT seg, CAST(count(*) AS BIGINT) n, avg(CAST(v AS DOUBLE)) m,
    (sum(CAST(v AS DOUBLE) * v) - count(*) * avg(CAST(v AS DOUBLE)) *
      avg(CAST(v AS DOUBLE))) / (count(*) - 1) s2
  FROM s GROUP BY seg)
SELECT CAST(max(CASE WHEN seg = 'BUILDING' THEN n END) AS BIGINT) n1,
  CAST(max(CASE WHEN seg = 'MACHINERY' THEN n END) AS BIGINT) n2,
  CAST(floor(
    (max(CASE WHEN seg = 'BUILDING' THEN m END) -
     max(CASE WHEN seg = 'MACHINERY' THEN m END)) /
    sqrt(((max(CASE WHEN seg = 'BUILDING' THEN n END) - 1) *
          max(CASE WHEN seg = 'BUILDING' THEN s2 END) +
          (max(CASE WHEN seg = 'MACHINERY' THEN n END) - 1) *
          max(CASE WHEN seg = 'MACHINERY' THEN s2 END)) /
         (max(CASE WHEN seg = 'BUILDING' THEN n END) +
          max(CASE WHEN seg = 'MACHINERY' THEN n END) - 2))
    * 1000000 + 0.5) AS BIGINT) d_micro
FROM g
""",


    // Gini-Simpson diversity of market segments within each region —
    // exact integer micro: (N^2 - sum(n_i^2)) * 1e6 // N^2.
    "gini_simpson_region" ->
      """
WITH c AS (SELECT r.r_name region, c.c_mktsegment seg,
    CAST(count(*) AS BIGINT) n
  FROM customer c JOIN nation nt ON c.c_nationkey = nt.n_nationkey
  JOIN region r ON nt.n_regionkey = r.r_regionkey GROUP BY 1, 2)
SELECT region, CAST(sum(n) AS BIGINT) customers,
  CAST((1000000 * (sum(n) * sum(n) - sum(n * n))) // (sum(n) * sum(n))
    AS BIGINT) gs_micro
FROM c GROUP BY 1 ORDER BY region
""",


    // Little's law: average open orders per day over the corpus span —
    // order open from o_orderdate to its last receiptdate, L = sum(dur)/span
    // (positive integers, exact floor division agrees across engines).
    "little_law_openorders" ->
      """
WITH o AS (SELECT o.o_orderkey,
    CAST(date_diff('day', o.o_orderdate, max(l.l_shipdate)) + 1 AS BIGINT) dur
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate),
 sp AS (SELECT CAST(date_diff('day', min(o_orderdate), max(o_orderdate)) + 1
    AS BIGINT) span FROM orders)
SELECT (SELECT span FROM sp) span_days, CAST(count(*) AS BIGINT) n_orders,
  CAST((1000 * sum(dur)) // (SELECT span FROM sp) AS BIGINT) l_milli
FROM o
""",


    // Quartile coefficient of dispersion of order value per priority —
    // exact discrete quartiles, positive, milli by floor division.
    "orders_quartile_dispersion" ->
      """
WITH v AS (SELECT o_orderpriority pri,
    CAST(round(o_totalprice * 100) AS BIGINT) v FROM orders),
 r AS (SELECT pri, v, row_number() OVER (PARTITION BY pri ORDER BY v) i,
    count(*) OVER (PARTITION BY pri) n FROM v),
 q AS (SELECT pri,
    CAST(max(CASE WHEN i = CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS BIGINT) q1,
    CAST(max(CASE WHEN i = CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS BIGINT) q3
  FROM r GROUP BY pri)
SELECT pri AS priority, q1, q3,
  CAST((1000 * (q3 - q1)) // (q3 + q1) AS BIGINT) qcd_milli
FROM q ORDER BY priority
""",


    // Partial autocorrelation at lag 2 of daily order revenue via
    // Durbin-Levinson: pacf2 = (r2 - r1^2) / (1 - r1^2) (milli), Pearson
    // autocorrelations over the full-population denominator.
    "pacf2_daily_revenue" ->
      """
WITH d AS (SELECT CAST(o_orderdate AS DATE) dy,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) x
  FROM orders GROUP BY 1),
 l AS (SELECT x, lag(x, 1) OVER (ORDER BY dy) x1,
    lag(x, 2) OVER (ORDER BY dy) x2 FROM d),
 m AS (SELECT avg(x) mu, sum((x - (SELECT avg(x) FROM d)) *
      (x - (SELECT avg(x) FROM d))) den FROM d),
 r AS (SELECT
    (SELECT sum((l.x - m.mu) * (l.x1 - m.mu)) FROM l, m WHERE x1 IS NOT NULL)
      / (SELECT den FROM m) r1,
    (SELECT sum((l.x - m.mu) * (l.x2 - m.mu)) FROM l, m WHERE x2 IS NOT NULL)
      / (SELECT den FROM m) r2)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) n_days,
  CAST(floor(r1 * 1000 + 0.5) AS BIGINT) acf1_milli,
  CAST(floor((r2 - r1 * r1) / (1 - r1 * r1) * 1000 + 0.5) AS BIGINT) pacf2_milli
FROM r
""",


    // Weekday effect: order count and exact truncated-average order cents
    // per epoch-day-mod-7 (engine-neutral weekday: both engines compute
    // days-since-1970 % 7 on non-negative values).
    "orders_weekday_effect" ->
      """
SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate) % 7 AS BIGINT) wd,
  CAST(count(*) AS BIGINT) n,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
    // count(*) AS BIGINT) avg_cents
FROM orders GROUP BY 1 ORDER BY wd
""",


    // RFM quintile cell census: recency/frequency/monetary quintiles by
    // ntile(5) with deterministic (metric, custkey) orders; 125-cell grid.
    "cust_rfm_cells" ->
      """
WITH horizon AS (SELECT max(o_orderdate) h FROM orders),
 cm AS (SELECT o_custkey ck,
    CAST(date_diff('day', max(o_orderdate), (SELECT h FROM horizon)) AS BIGINT) rec,
    CAST(count(*) AS BIGINT) freq,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) mon
  FROM orders GROUP BY 1),
 sc AS (SELECT
    ntile(5) OVER (ORDER BY rec DESC, ck) r,
    ntile(5) OVER (ORDER BY freq, ck) f,
    ntile(5) OVER (ORDER BY mon, ck) m
  FROM cm)
SELECT CAST(r AS BIGINT) r, CAST(f AS BIGINT) f, CAST(m AS BIGINT) m,
  CAST(count(*) AS BIGINT) customers
FROM sc GROUP BY 1, 2, 3 ORDER BY r, f, m
""",
  )
}
