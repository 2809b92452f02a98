package graft.oracle

/** Round-15 wave-2 oracle SQL (DuckDB) — every query in
  * `ops/Metrics8.scala`. Validated against sf0.001 and sf0.01 before
  * the Spark implementations were written (the §2.1 pre-validation
  * loop).
  */
object OracleW27 {
  val sql: Map[String, String] = Map(

    "ltv_halflife_cohort" ->
      """WITH f AS (SELECT o_custkey ck, min(date_trunc('month', o_orderdate)) fm
       FROM orders GROUP BY 1),
  x AS (SELECT (year(o.o_orderdate)*12 + month(o.o_orderdate))
             - (year(f.fm)*12 + month(f.fm)) t,
        f.fm, CAST(round(o.o_totalprice*100) AS BIGINT) cents
        FROM orders o JOIN f ON o.o_custkey = f.ck),
  d AS (SELECT CAST(CAST(fm AS DATE) AS VARCHAR) cohort_month,
        cents, cents // (1 << (t // 12)) dc FROM x)
  SELECT cohort_month, CAST(count(*) AS BIGINT) n_orders,
    CAST(sum(cents) AS BIGINT) nominal_cents,
    CAST(sum(dc) AS BIGINT) discounted_cents
  FROM d GROUP BY 1 ORDER BY cohort_month""",

    "li_order_cents_apportion" ->
      """WITH x AS (SELECT l_orderkey ok, l_linenumber ln, l_partkey pk, l_suppkey sk,
      CAST(round(l_extendedprice*100) AS BIGINT) w,
      CAST(round(o_totalprice*100) AS BIGINT) tot
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
  s AS (SELECT *, CAST(sum(w) OVER (PARTITION BY ok) AS BIGINT) wsum FROM x),
  q AS (SELECT *, (tot * w) // wsum base, (tot * w) % wsum rem FROM s),
  l AS (SELECT *, CAST(tot - sum(base) OVER (PARTITION BY ok) AS BIGINT) leftover,
        row_number() OVER (PARTITION BY ok ORDER BY rem DESC, ln, pk, sk) rk FROM q),
  a AS (SELECT ln, base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END alloc FROM l)
  SELECT CAST(ln AS BIGINT) linenumber, CAST(count(*) AS BIGINT) lines,
    CAST(sum(alloc) AS BIGINT) alloc_cents
  FROM a GROUP BY 1 ORDER BY linenumber""",

    "date_iso_week_census" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) dd FROM orders),
  w AS (SELECT year(dd + INTERVAL (4 - isodow(dd)) DAY) iso_year,
        weekofyear(dd) iso_week FROM d)
  SELECT CAST(iso_year AS BIGINT) iso_year, CAST(iso_week AS BIGINT) iso_week,
    CAST(count(*) AS BIGINT) n
  FROM w GROUP BY 1, 2 ORDER BY iso_year, iso_week""",

    "customer_churn_labels" ->
      """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) md FROM orders),
  lastord AS (SELECT o_custkey, max(CAST(o_orderdate AS DATE)) lo FROM orders GROUP BY 1)
  SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) customers,
    CAST(sum(CASE WHEN lo IS NULL
                  OR date_diff('day', lo, (SELECT md FROM mx)) > 365
             THEN 1 ELSE 0 END) AS BIGINT) churned,
    CAST((1000000 * sum(CASE WHEN lo IS NULL
                  OR date_diff('day', lo, (SELECT md FROM mx)) > 365
             THEN 1 ELSE 0 END)) // count(*) AS BIGINT) churn_ppm
  FROM customer LEFT JOIN lastord ON c_custkey = o_custkey
  GROUP BY 1 ORDER BY segment""",

    "supplier_customer_concentration" ->
      """WITH sc AS (SELECT l_suppkey s, o_custkey c,
      CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
  r AS (SELECT s, cents, row_number() OVER (PARTITION BY s ORDER BY cents DESC, c) rk FROM sc),
  agg AS (SELECT s, CAST(sum(cents) AS BIGINT) tot,
          CAST(sum(CASE WHEN rk <= 3 THEN cents ELSE 0 END) AS BIGINT) top3 FROM r GROUP BY s)
  SELECT CAST(((1000000 * top3) // tot) // 10000 AS BIGINT) pct_band,
    CAST(count(*) AS BIGINT) suppliers, CAST(sum(top3) AS BIGINT) top3_cents
  FROM agg GROUP BY 1 ORDER BY pct_band""",

    "str_printf_funcs" ->
      """SELECT o_orderpriority priority,
    min(printf('%07d|%x|%o', o_orderkey, o_orderkey, o_orderkey)) mn,
    max(printf('%07d|%x|%o', o_orderkey, o_orderkey, o_orderkey)) mx,
    CAST(count(DISTINCT printf('%07d|%x|%o', o_orderkey, o_orderkey, o_orderkey)) AS BIGINT) nd
  FROM orders GROUP BY 1 ORDER BY priority""",

    "date_business_days" ->
      """WITH g AS (SELECT
      isodow(CAST(o_orderdate AS DATE)) dow,
      date_diff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE)) d0,
      date_diff('day', DATE '1970-01-05', CAST(l_shipdate AS DATE)) d1
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= o_orderdate),
  b AS (SELECT dow, ((d1 // 7) * 5 + least(d1 % 7, 4))
             - ((d0 // 7) * 5 + least(d0 % 7, 4)) bd FROM g)
  SELECT CAST(dow AS BIGINT) order_dow, CAST(count(*) AS BIGINT) n,
    CAST(sum(bd) AS BIGINT) sum_bdays,
    CAST((1000000 * sum(bd)) // count(*) AS BIGINT) mean_bdays_ppm
  FROM b GROUP BY 1 ORDER BY order_dow""",

    "agg_weighted_median" ->
      """WITH x AS (SELECT p_brand, CAST(round(l_extendedprice*100) AS BIGINT) c,
      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) w
      FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
  cc AS (SELECT p_brand, c, w,
      sum(w) OVER (PARTITION BY p_brand ORDER BY c) cw,
      sum(w) OVER (PARTITION BY p_brand) tot FROM x)
  SELECT p_brand brand,
    CAST(min(CASE WHEN 2*cw >= tot THEN c END) AS BIGINT) wmedian_cents,
    CAST(max(tot) AS BIGINT) total_qty
  FROM cc GROUP BY 1 ORDER BY brand""",

    "li_return_wilson_rank" ->
      """WITH a AS (SELECT p_brand,
      CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) k,
      CAST(count(*) AS BIGINT) n
      FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
  w AS (SELECT p_brand, k, n,
      CAST(round(1000000 * (
        (k*1.0/n + 1.9208/n - 1.96 * sqrt((k*1.0/n)*(1 - k*1.0/n)/n + 0.9604/(n*n)))
        / (1 + 3.8416/n))) AS BIGINT) wilson_ppm
      FROM a)
  SELECT p_brand brand, k, n, wilson_ppm,
    CAST(row_number() OVER (ORDER BY wilson_ppm DESC, p_brand) AS BIGINT) rk
  FROM w ORDER BY brand""",
  )
}
