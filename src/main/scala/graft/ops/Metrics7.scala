package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-15 wave (SURVEY §2.19): privacy audits (k-anonymity /
  * l-diversity censuses), SoftDeDup sampling weights, the Lindley
  * queue-backlog recursion in closed form, largest-remainder
  * apportionment, a pure-integer Luhn mod-10 checksum census, Morton
  * (z-order) bit interleaving, bounded-hop min-plus shortest paths,
  * fixed-offset timezone conversion, rule-based bot flagging, FIFO
  * capacity allocation, and an exact Simpson-diversity census.
  * Exactness and scale posture per §2.1.
  */
object Metrics7 {

  private def ev(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "events")
  private def li(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def orders(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "orders")
  private def cust(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "customer")
  private def supp(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "supplier")
  private def nation(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "nation")
  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "documents")
  private def emb(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "embeddings")

  /** k-anonymity census: group rows into quasi-identifier equivalence
    * classes (nation × segment × balance band) and histogram the class
    * sizes k (capped at 10) — the "how re-identifiable is this table"
    * audit a privacy review runs before release. Balance bands ride
    * shifted non-negative integer cents so truncating division equals
    * floor on both engines. One keyed agg + one tiny re-agg.
    */
  val privacyKAnonymity: Q = (s, d) =>
    cust(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        expr("div(cast(round(c_acctbal*100) as bigint) + 100000, 100000)")
          .as("bal_band"))
      .agg(cnt.as("k"))
      .groupBy(least(col("k"), lit(10L)).as("k_cap"))
      .agg(cnt.as("classes"), sum("k").cast("long").as("n_rows"))
      .orderBy("k_cap")

  /** l-diversity census: within each quasi-identifier class (order
    * month × priority) count DISTINCT sensitive values (order status);
    * classes with l=1 leak the sensitive attribute exactly. Emits the
    * class/row histogram per l. Month stays internal (no timestamp
    * output); exact integers throughout.
    */
  val privacyLDiversity: Q = (s, d) =>
    orders(s, d)
      .groupBy(trunc(col("o_orderdate"), "month").as("m"), col("o_orderpriority"))
      .agg(countDistinct("o_orderstatus").as("l"), cnt.as("n"))
      .groupBy(col("l").cast("long").as("l"))
      .agg(cnt.as("classes"), sum("n").cast("long").as("n_orders"))
      .orderBy("l")

  /** SoftDeDup sampling weights: instead of dropping near-duplicates,
    * weight each document by 1/|cluster| (prefix-64 hash clusters — the
    * corpus's real duplicate signal) so a sampler sees every cluster
    * once in expectation. Weights quantize per-row to ppm BEFORE the
    * sum (order-exact integers). Per-source effective corpus size
    * falls out as Σ weights. One hash-keyed self-join — the standard
    * dedup shuffle shape at 100 TB.
    */
  val corpusSoftdedupWeights: Q = (s, d) => {
    val d0 = docs(s, d).select(col("source"),
      md5(substring(col("text"), 1, 64)).as("h"))
    val c = d0.groupBy("h").agg(cnt.as("sz"))
    d0.join(c, "h")
      .select(col("source"),
        round(lit(1000000.0) / col("sz")).cast("long").as("w_ppm"))
      .groupBy("source")
      .agg(cnt.as("docs"), sum("w_ppm").cast("long").as("eff_docs_ppm"))
      .orderBy("source")
  }

  /** Queueing backlog via the Lindley recursion's closed form: with
    * daily arrivals aᵢ against fixed capacity c (the exact-integer
    * ceiling of mean daily arrivals), backlog Wₙ = Sₙ − min(0, min
    * prefix Sₖ) where S = Σ(a−c) — the reflection identity turns the
    * per-day recursion Wₙ = max(0, Wₙ₋₁ + aₙ − c) into two windows
    * over the bounded day domain. Emits per-month peak backlog and
    * backlogged-day counts.
    */
  val ordersQueueBacklog: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("d")).agg(cnt.as("arr"))
    val cap = daily.agg(
      expr("div(cast(sum(arr) as bigint) + count(1) - 1, count(1))").as("c"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(cap))
      .withColumn("cum", sum(col("arr") - col("c")).over(w))
      .withColumn("backlog", col("cum") - least(min("cum").over(w), lit(0L)))
      .groupBy(trunc(col("d"), "month").cast("string").as("month"))
      .agg(max("backlog").cast("long").as("peak_backlog"),
        sum(when(col("backlog") > 0, 1L).otherwise(0L)).cast("long")
          .as("backlogged_days"))
      .orderBy("month")
  }

  /** Largest-remainder (Hare quota) apportionment: distribute 1000
    * slots across nations proportionally to revenue cents so the seats
    * sum EXACTLY to 1000 — floor(1000·rev/total) each, then the
    * leftover seats go to the largest remainders (nation-name
    * tiebreak). All integer arithmetic; the fact agg collapses to 25
    * rows before the window.
    */
  val allocLargestRemainder: Q = (s, d) => {
    val rev = orders(s, d)
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sumCents(col("o_totalprice")).as("cents"))
    val tot = rev.agg(sum("cents").cast("long").as("tot"))
    val q = rev.crossJoin(broadcast(tot))
      .select(col("nation"), col("cents"),
        expr("div(1000 * cents, tot)").as("base"),
        ((lit(1000L) * col("cents")) % col("tot")).as("rem"))
      .localCheckpoint()
    val leftover = q.agg((lit(1000L) - sum("base")).cast("long").as("leftover"))
    q.withColumn("rk",
        row_number().over(Window.orderBy(col("rem").desc, col("nation"))))
      .crossJoin(broadcast(leftover))
      .select(col("nation"), col("cents"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .cast("long").as("seats"))
      .orderBy("nation")
  }

  /** Luhn mod-10 checksum census, digits extracted ARITHMETICALLY —
    * dᵢ = (key div 10ⁱ) mod 10 over 12 fixed positions, doubling
    * alternate digits (−9 past 9), so no string machinery and the
    * whole row stays inside one codegen'd `aggregate` HOF. Emits the
    * check-digit distribution per priority — the "are these IDs
    * checksum-valid / uniformly distributed" intake audit.
    */
  val dqLuhnMod10: Q = (s, d) =>
    orders(s, d).select(col("o_orderpriority").as("priority"),
        expr("""cast((10 - aggregate(sequence(0, 11), 0L, (acc, i) -> acc +
          CASE WHEN i % 2 = 0 THEN
            CASE WHEN 2*((o_orderkey div cast(pow(10, i) as bigint)) % 10) > 9
                 THEN 2*((o_orderkey div cast(pow(10, i) as bigint)) % 10) - 9
                 ELSE 2*((o_orderkey div cast(pow(10, i) as bigint)) % 10) END
          ELSE (o_orderkey div cast(pow(10, i) as bigint)) % 10 END) % 10) % 10
          as bigint)""").as("check_digit"))
      .groupBy("priority", "check_digit")
      .agg(cnt.as("n"))
      .orderBy("priority", "check_digit")

  /** Morton (z-order) code census: interleave the low 8 bits of part
    * and supplier keys — bit i of each lands at positions 2i / 2i+1 —
    * then histogram the 64 high-order buckets. The same bit math
    * `CowTable.cluster` uses for multi-column file clustering,
    * surfaced as a query; pure shifts/masks inside one `aggregate`
    * HOF, exact on both engines.
    */
  val exprMortonInterleave: Q = (s, d) =>
    li(s, d).select(
        expr("""aggregate(sequence(0, 7), 0L, (acc, i) -> acc
          + (shiftright(l_partkey % 256, i) & 1) * shiftleft(1L, 2*i)
          + (shiftright(l_suppkey % 256, i) & 1) * shiftleft(1L, 2*i+1))""")
          .as("zv"),
        col("l_quantity").cast("long").as("q"))
      .select(expr("div(zv, 1024)").as("bucket"), col("q"))
      .groupBy("bucket")
      .agg(cnt.as("n"), sum("q").cast("long").as("qty"))
      .orderBy("bucket")

  /** Bounded-hop weighted shortest paths as MIN-PLUS MATRIX POWERS:
    * nation→nation edge weight = minimum non-negative ship lag on
    * supplier→customer flows, then W≤2 = W ⊕ (W⊗W), W≤3 = W≤2 ⊕
    * (W≤2⊗W) where ⊗ is join-on-intermediate + min(sum). The fact
    * join collapses to a ≤625-row matrix FIRST; the relaxation
    * iterations are broadcast joins over that matrix — the
    * distributed Bellman-Ford step without per-path enumeration.
    */
  val graphMinplus3hop: Q = (s, d) => {
    val sn = nation(s, d).select(col("n_nationkey").as("sk"), col("n_name").as("src"))
    val cn = nation(s, d).select(col("n_nationkey").as("ck"), col("n_name").as("dst"))
    val edge = li(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate"))
      .join(broadcast(supp(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sk"))
      .join(broadcast(cn), col("c_nationkey") === col("ck"))
      .groupBy("src", "dst")
      .agg(min(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
        .cast("long").as("w"))
      .localCheckpoint()
    def minplus(a: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val l = a.select(col("src"), col("dst").as("mid"), col("w").as("w1"))
      val r = edge.select(col("src").as("mid"), col("dst"), col("w").as("w2"))
      val two = l.join(broadcast(r), "mid").filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"), (col("w1") + col("w2")).as("w"))
      a.unionByName(two).groupBy("src", "dst").agg(min("w").as("w"))
    }
    minplus(minplus(edge))
      .select(col("src"), col("dst"), col("w").cast("long").as("mincost"))
      .orderBy("src", "dst")
  }

  /** Fixed-offset timezone conversion census: local-hour histograms at
    * +05:30 and −08:00 through `from_utc_timestamp` (the tz API
    * surface); the oracle pins the SAME arithmetic as plain interval
    * shifts, so the contract is exact regardless of tzdata. Sub-day
    * output stays integral (hour buckets) per R4.
    */
  val dateTzOffsetHours: Q = (s, d) => {
    val e = ev(s, d).select(col("ts"))
    val a = e.select(lit("+05:30").as("tz_off"),
      hour(from_utc_timestamp(col("ts"), "+05:30")).cast("long").as("hr"))
    val b = e.select(lit("-08:00").as("tz_off"),
      hour(from_utc_timestamp(col("ts"), "-08:00")).cast("long").as("hr"))
    a.unionByName(b).groupBy("tz_off", "hr").agg(cnt.as("n"))
      .orderBy("tz_off", "hr")
  }

  /** Rule-based bot flagging: a user is flagged when their event count
    * or peak per-minute rate crosses the rule thresholds — the cheap
    * first-pass filter a training-data pipeline runs before expensive
    * model scoring. Emits users/events per (flag, activity band);
    * integer counts only, so the rule boundary is exact.
    */
  val eventsBotFlagCensus: Q = (s, d) => {
    val e = ev(s, d)
    val u = e.groupBy("user_id")
      .agg(cnt.as("n"), countDistinct("event_type").as("dt"))
    val mx = e.groupBy(col("user_id"), date_trunc("minute", col("ts")).as("m"))
      .agg(cnt.as("c"))
      .groupBy("user_id").agg(max("c").as("maxpm"))
    u.join(mx, "user_id")
      .groupBy(
        when(col("n") >= 75 || col("maxpm") >= 2, 1L).otherwise(0L).as("is_bot"),
        expr("div(n, 10)").as("band"))
      .agg(cnt.as("users"), sum("n").cast("long").as("events"))
      .orderBy("is_bot", "band")
  }

  /** FIFO capacity allocation: each order gets 60 units; lineitems
    * claim them in linenumber order, so alloc = clamp(60 − Σ earlier
    * qty, 0, qty) — running-sum windows turn the sequential allocation
    * into one partitioned scan (no iteration). Emits the per-position
    * fill profile: demand, allocation, fully-served counts.
    */
  val liFifoAllocation: Q = (s, d) => {
    // (l_orderkey, l_linenumber) is NOT unique in this corpus; the
    // 4-tuple is — the FIFO order pins the tie so the cumulative sums
    // agree across engines.
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_partkey", "l_suppkey")
      .rowsBetween(Window.unboundedPreceding, -1)
    li(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity").cast("long").as("q"))
      .withColumn("bef", coalesce(sum("q").over(w), lit(0L)))
      .select(col("l_linenumber").cast("long").as("linenumber"), col("q"),
        greatest(least(lit(60L) - col("bef"), col("q")), lit(0L)).as("alloc"))
      .groupBy("linenumber")
      .agg(cnt.as("lines"), sum("q").cast("long").as("demanded"),
        sum("alloc").cast("long").as("allocated"),
        sum(when(col("alloc") === col("q"), 1L).otherwise(0L)).cast("long")
          .as("fully_served"))
      .orderBy("linenumber")
  }

  /** Simpson diversity of labels within embedding sign-buckets (first
    * five dimension signs), EXACT: the index Σnₗ(nₗ−1) / N(N−1) rides
    * integer numerator + ppm truncating division — no floating
    * aggregation. Low diversity in a bucket means the coarse sign
    * hash already separates labels (the LSH-quality readout).
    */
  val embeddingBucketLabelSimpson: Q = (s, d) => {
    val b = emb(s, d).select(
      ((when(element_at(col("embedding"), 1) > 0, 1L).otherwise(0L)) +
       (when(element_at(col("embedding"), 2) > 0, 2L).otherwise(0L)) +
       (when(element_at(col("embedding"), 3) > 0, 4L).otherwise(0L)) +
       (when(element_at(col("embedding"), 4) > 0, 8L).otherwise(0L)) +
       (when(element_at(col("embedding"), 5) > 0, 16L).otherwise(0L))).as("bucket"),
      col("label"))
    b.groupBy("bucket", "label").agg(cnt.as("nl"))
      .groupBy("bucket")
      .agg(sum(col("nl") * (col("nl") - 1)).cast("long").as("num"),
        sum("nl").cast("long").as("n"))
      .select(col("bucket").cast("long").as("bucket"), col("n"), col("num"),
        when(col("n") > 1, expr("div(1000000 * num, n * (n - 1))"))
          .otherwise(0L).cast("long").as("simpson_ppm"))
      .orderBy("bucket")
  }

  val queries: Map[String, Q] = Map(
    "privacy_k_anonymity" -> privacyKAnonymity,
    "privacy_l_diversity" -> privacyLDiversity,
    "corpus_softdedup_weights" -> corpusSoftdedupWeights,
    "orders_queue_backlog" -> ordersQueueBacklog,
    "alloc_largest_remainder" -> allocLargestRemainder,
    "dq_luhn_mod10" -> dqLuhnMod10,
    "expr_morton_interleave" -> exprMortonInterleave,
    "graph_minplus_3hop" -> graphMinplus3hop,
    "date_tz_offset_hours" -> dateTzOffsetHours,
    "events_bot_flag_census" -> eventsBotFlagCensus,
    "li_fifo_allocation" -> liFifoAllocation,
    "embedding_bucket_label_simpson" -> embeddingBucketLabelSimpson,
  )
}
