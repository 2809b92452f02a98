package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}

import graft.tables.Tables
import Util._

/** Round-4 wave 9: the remaining function-family surface — MapType and
  * struct manipulation, regexp extraction, bitwise aggregates,
  * time-RANGE window frames — plus four pipeline/analytics operators
  * (feature hashing, MAD outlier detection, daily funnels, shard
  * packing) that compose them.
  *
  * Scale posture: everything here is either a single codegen scan
  * (map/struct/regexp rows), a mergeable aggregate (bitwise, MAD
  * counts), or a window partitioned by a real entity key (user, lang)
  * — nothing single-partitions, nothing re-scans its input.
  */
object Funcs {

  private def events(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  /** props parsed once into map<string,int> (the JSON column's natural
    * typed form).
    */
  private def kmap = from_json(col("props"), MapType(StringType, IntegerType))

  /** MapType surface: parse → concat → filter → element_at → sorted
    * entry encoding. The map value itself never leaves the plan (the
    * driver's differ can't hash maps) — it is exercised internally and
    * emitted as deterministic scalars + a sorted entries string.
    */
  val mapTypedFuncs: Q = (s, d) =>
    events(s, d)
      .withColumn("m", map_concat(kmap, map(lit("u"), (col("user_id") % 10).cast("int"))))
      .select(
        col("event_id"),
        element_at(col("m"), "k").as("k_val"),
        size(col("m")).cast("long").as("n_keys"),
        size(map_filter(col("m"), (_, v) => v > 50)).cast("long").as("n_big"),
        concat_ws(",", array_sort(transform(map_entries(col("m")),
          e => concat(e.getField("key"), lit("="), e.getField("value"))))).as("enc"))
      .orderBy("event_id")

  /** Map higher-order functions, part 1: `transform_keys` +
    * `transform_values` over a constructed map. DuckDB has no map HOFs,
    * so the oracle is HAND-BUILT: both map keys are known at plan time
    * ("k" and "uu"), so the sorted-entry string the Spark side emits
    * ("K_<k%2>=<2k+3>,UU_<u%2>=<2u+4>") is re-derivable in plain SQL —
    * the sorted-entries-string encoding is what makes a HOF result
    * hashable by an engine without the HOF.
    */
  val mapTransformFuncs: Q = (s, d) =>
    events(s, d)
      .withColumn("m", map_concat(kmap,
        map(lit("uu"), (col("user_id") % 10).cast("int"))))
      // key rewrite must keep keys unique: upper() + parity suffix does
      .withColumn("tk", transform_keys(col("m"),
        (k, v) => concat(upper(k), lit("_"), (v % 2).cast("string"))))
      .withColumn("tv", transform_values(col("tk"),
        (k, v) => v * 2 + length(k)))
      .select(
        col("event_id"),
        concat_ws(",", array_sort(transform(map_entries(col("tv")),
          e => concat(e.getField("key"), lit("="), e.getField("value"))))).as("enc"))
      .orderBy("event_id")

  /** Map higher-order functions, part 2: `map_zip_with` merging two
    * maps with overlapping key sets (outer-join semantics over keys:
    * absent side is NULL, coalesced to 0 here). Same hand-built-oracle
    * technique as [[mapTransformFuncs]].
    */
  val mapZipFuncs: Q = (s, d) =>
    events(s, d)
      .withColumn("u", (col("user_id") % 10).cast("int"))
      .withColumn("m1", map_concat(kmap, map(lit("u"), col("u"))))
      .withColumn("m2", map(lit("k"), col("u"), lit("z"), lit(5)))
      .withColumn("z", map_zip_with(col("m1"), col("m2"),
        (k, v1, v2) => coalesce(v1, lit(0)) + coalesce(v2, lit(0))))
      .select(
        col("event_id"),
        concat_ws(",", array_sort(transform(map_entries(col("z")),
          e => concat(e.getField("key"), lit("="), e.getField("value"))))).as("enc"))
      .orderBy("event_id")

  /** Struct surface: named_struct construction, lexicographic struct
    * ordering inside array_sort, and nested field access — emitted as
    * flat scalars for the differ.
    */
  val structFuncs: Q = (s, d) =>
    events(s, d)
      .withColumn("k", element_at(kmap, "k"))
      .withColumn("a", struct((col("user_id") % 7).cast("long").as("x"),
                              col("event_type").as("y")))
      .withColumn("b", struct((col("k") % 7).cast("long").as("x"), lit("k").as("y")))
      .withColumn("arr", array_sort(array(col("a"), col("b"))))
      .select(
        col("event_id"),
        element_at(col("arr"), 1).getField("x").as("first_x"),
        element_at(col("arr"), 1).getField("y").as("first_y"),
        struct(struct(col("k").as("kk")).as("inner")).getField("inner").getField("kk").as("deep_k"))
      .orderBy("event_id")

  /** Regexp surface: count / extract-all + slice / global replace, one
    * codegen scan over the corpus.
    */
  val regexpFuncs: Q = (s, d) =>
    docs(s, d)
      .withColumn("m3", regexp_extract_all(col("text"), lit("\\b[a-z]{3}\\b"), lit(0)))
      .select(
        col("doc_id"),
        size(col("m3")).cast("long").as("n3"),
        concat_ws(",", slice(col("m3"), 1, 5)).as("first5"),
        length(regexp_replace(col("text"), "[aeiou]", "")).cast("long").as("novowel_len"))
      .orderBy("doc_id")

  /** Bitwise aggregates over the JSON k-value: AND / OR / XOR fold plus
    * popcount sum. All four are commutative + associative → partial
    * aggregation applies on every partition (the mergeable-agg shape).
    */
  val aggBitwise: Q = (s, d) =>
    events(s, d)
      .select(col("event_type"), element_at(kmap, "k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(expr("bit_and(k)").cast("long").as("b_and"),
           expr("bit_or(k)").cast("long").as("b_or"),
           expr("bit_xor(k)").cast("long").as("b_xor"),
           sum(bit_count(col("k"))).cast("long").as("bits"))
      .orderBy("event_type")

  /** Time-RANGE window frame: per-user rolling 7-day revenue via
    * `rangeBetween` over epoch seconds — the frame is value-based
    * (peers by timestamp), not row-based, and the window partitions by
    * user so nothing single-partitions.
    */
  val winTimeRange7d: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("es")
      .rangeBetween(-604800L, Window.currentRow)
    events(s, d)
      .withColumn("es", unix_timestamp(col("ts")))
      .select(col("event_id"), col("user_id"),
              sum(cents(col("value"))).over(w).cast("long").as("roll_cents"))
      .orderBy("event_id")
  }

  /** Feature hashing (the hashing trick) with an engine-portable hash:
    * token → md5-prefix bucket (mod 32) → per-doc bucket counts →
    * sorted sparse-vector encoding. Linear: explode + two keyed aggs,
    * shuffle carries (doc_id, bucket) pairs only.
    */
  val mlFeatureHash: Q = (s, d) => {
    val tok = docs(s, d).select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
    tok
      .withColumn("bucket", conv(substring(md5(col("tk")), 1, 8), 16, 10).cast("long") % 32)
      .groupBy("doc_id", "bucket")
      .agg(cnt.as("c"))
      .groupBy("doc_id")
      .agg(concat_ws(",", array_sort(collect_list(
        concat(lpad(col("bucket").cast("string"), 2, "0"), lit(":"), col("c")))))
        .as("features"))
      .orderBy("doc_id")
  }

  /** MAD outlier detection (median absolute deviation): per event type,
    * median of integer cents, MAD, and the count beyond 5×MAD. Medians
    * interpolate identically on both engines over exact integers (the
    * only fraction is an exact .5 — `agg_percentiles` pins the
    * mechanism); emitted doubled so the output stays integral. The
    * 1-row-per-type median tables broadcast back onto the fact scan.
    */
  val anomalyMad: Q = (s, d) => {
    val c = events(s, d).select(col("event_type"), cents(col("value")).as("cents"))
    val m = c.groupBy("event_type").agg(expr("percentile(cents, 0.5)").as("med"))
    val dev = c.join(broadcast(m), "event_type")
      .withColumn("dev", abs(col("cents") - col("med")))
    val m2 = dev.groupBy("event_type").agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(m2), "event_type")
      .groupBy("event_type")
      .agg(round(min("med") * 2).cast("long").as("med2"),
           round(min("mad") * 2).cast("long").as("mad2"),
           sum(when(col("dev") > col("mad") * 5, 1L).otherwise(0L)).cast("long").as("n_out"))
      .orderBy("event_type")
  }

  /** Strict within-day funnel view → click → purchase: each step's
    * first instant must be strictly later than the previous step's.
    * Three keyed aggregates + two equi-joins on (day, user) — the
    * sequential-pattern query every product-analytics team runs, with
    * no window wider than one user-day.
    */
  val seqFunnelDaily: Q = (s, d) => {
    val e = events(s, d).select(
      col("user_id"), col("event_type"),
      to_date(col("ts")).as("dd"), unix_timestamp(col("ts")).as("es"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("dd", "user_id").agg(min("es").as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, Seq("dd", "user_id"))
      .filter(col("es") > col("t1"))
      .groupBy("dd", "user_id").agg(min("es").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("dd", "user_id"))
      .filter(col("es") > col("t2"))
      .groupBy("dd", "user_id").agg(min("es").as("t3"))
    s1.join(s2, Seq("dd", "user_id"), "left")
      .join(s3, Seq("dd", "user_id"), "left")
      .groupBy("dd")
      .agg(cnt.as("n_view"),
           count(col("t2")).as("n_click"),
           count(col("t3")).as("n_purchase"))
      .orderBy("dd")
  }

  /** Token-budget shard packing: docs in md5 order per language, shard
    * = running-chars-before `div` 20000 — the deterministic
    * training-shard layout pass. The prefix sum partitions by lang
    * (the global variant is `Scale.globalRank`'s range-partitioned
    * two-pass — PLANS.md).
    */
  val corpusShardPack: Q = (s, d) => {
    val w = Window.partitionBy("lang").orderBy("mk", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"), md5(col("text")).as("mk"))
      .withColumn("before_chars", coalesce(sum("n_chars").over(w), lit(0L)))
      .withColumn("shard", expr("div(before_chars, 20000)"))
      .groupBy("lang", "shard")
      .agg(cnt.as("n_docs"), sum("n_chars").cast("long").as("chars"))
      .orderBy("lang", "shard")
  }

  /** Calendar/interval arithmetic battery: month shift (with month-end
    * clamping — both engines clamp), month truncation, day deltas from
    * an epoch date, quarter, ISO day-of-week, month end. All outputs
    * integers or DATE strings (R2/R4-safe). One codegen scan.
    */
  val exprIntervalArith: Q = (s, d) =>
    Tables.t(s, d, "orders")
      .select(
        col("o_orderkey"),
        add_months(col("o_orderdate"), 3).cast("string").as("plus3m"),
        date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("mstart"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        (((dayofweek(col("o_orderdate")) + 5) % 7) + 1).cast("long").as("isodow"),
        last_day(col("o_orderdate")).cast("string").as("month_end"))
      .orderBy("o_orderkey")
      .limit(1000)

  /** Skew-defended equi-join as a first-class query:
    * [[Scale.saltedJoin]] splits each hot key (5 event types over 100k
    * rows — maximal skew) across 8 reducers by salting the fact side
    * and replicating the 5-row dim ×8. The oracle is the PLAIN join —
    * salting must be invisible in the result, and the driver's
    * hash-compare proves it on every run.
    */
  val joinSkewSalted: Q = (s, d) => {
    val ev = events(s, d).select("event_type", "event_id", "value")
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")).cast("long"))
    Scale.saltedJoin(ev, dim, "event_type", 8)
      .groupBy("event_type")
      .agg(cnt.as("n"), max("weight").as("weight"), sumCents(col("value")).as("val_cents"))
      .orderBy("event_type")
  }

  /** Typed-Dataset escape hatch exercised as a query: `groupByKey` +
    * `mapGroups` computing per-customer order stats. This is the API a
    * user reaches for when per-group logic outgrows SQL — and its cost
    * is real: no partial aggregation, every row shuffles (the
    * declarative twin `agg_stats_multi` map-side combines). The oracle
    * pins that the typed path computes exactly what SQL would.
    */
  val typedGroupStats: Q = (s, d) => {
    val sp = s
    import sp.implicits._
    Tables.t(s, d, "orders")
      .select(col("o_custkey"), cents(col("o_totalprice")).as("c"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        var n = 0L; var sm = 0L; var mx = Long.MinValue
        it.foreach { case (_, c) => n += 1; sm += c; if (c > mx) mx = c }
        (k, n, sm, mx)
      }
      .toDF("o_custkey", "n_orders", "sum_cents", "max_cents")
      .orderBy("o_custkey")
  }

  /** ROLLUP with `grouping()` indicators — the machine-readable way to
    * tell subtotal rows from data rows that happen to hold the
    * sentinel value. Coalesced labels + both grouping flags emitted.
    */
  val aggGroupingId: Q = (s, d) =>
    Tables.t(s, d, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(cnt.as("n"),
           grouping(col("o_orderstatus")).cast("long").as("g_status"),
           grouping(col("o_orderpriority")).cast("long").as("g_prio"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
              col("n"), col("g_status"), col("g_prio"))
      .orderBy("g_status", "g_prio", "status", "prio")

  /** Explicit NULL placement in sort order (DESC NULLS LAST) — nulls
    * manufactured via nullif (the corpus has none), full deterministic
    * tiebreak so the LIMIT cut is engine-independent (R1).
    */
  val sortNullsLast: Q = (s, d) =>
    Tables.t(s, d, "customer")
      .select(col("c_custkey"),
              expr("nullif(c_mktsegment, 'BUILDING')").as("seg"),
              cents(col("c_acctbal")).as("bal_cents"))
      .orderBy(col("seg").desc_nulls_last, col("bal_cents"), col("c_custkey"))
      .limit(500)

  /** Pivot with MULTIPLE aggregates per pivot value (count + cents sum
    * per order status) — Spark names the output `{value}_{aggAlias}`;
    * the oracle mirrors with conditional aggregation.
    */
  val pivotMultiAgg: Q = (s, d) =>
    Tables.t(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(cnt.as("n"), sumCents(col("o_totalprice")).as("cents"))
      // a (priority, status) combo absent from the data pivots to NULL,
      // while the oracle's conditional aggregation emits 0 — fill so
      // both engines agree when a combo is empty
      .na.fill(0)
      .orderBy("o_orderpriority")

  /** Typed two-input cogroup — `KeyValueGroupedDataset.cogroup` is the
    * API for per-key merge logic that joins can't express (here it CAN
    * be, which is what makes it oracle-checkable: a LEFT JOIN +
    * aggregate pins the semantics). Same caveat as `typed_group_stats`:
    * both inputs shuffle in full, no partial aggregation — the
    * escape hatch, not the default.
    */
  val typedCogroupStats: Q = (s, d) => {
    val sp = s
    import sp.implicits._
    val custs = Tables.t(s, d, "customer")
      .select(col("c_custkey"), col("c_acctbal")).as[(Long, Double)]
      .groupByKey(_._1)
    val ords = Tables.t(s, d, "orders")
      .select(col("o_custkey"), cents(col("o_totalprice")).as("c")).as[(Long, Long)]
      .groupByKey(_._1)
    custs.cogroup(ords) { (k, cs, os) =>
      val cl = cs.toSeq
      if (cl.isEmpty) Iterator.empty // orders without a customer row: none by FK audit
      else {
        var n = 0L; var sm = 0L
        os.foreach { case (_, v) => n += 1; sm += v }
        Iterator((k, math.round(cl.head._2 * 100), n, sm))
      }
    }.toDF("c_custkey", "bal_cents", "n_orders", "sum_cents")
      .orderBy("c_custkey")
  }

  /** Exact DECIMAL arithmetic — the money type the rest of the library
    * sidesteps via integer cents (R2). Both engines round the 2-decimal
    * double to DECIMAL(18,2) identically (the stored values ARE
    * 2-decimal money, so nearest-cent is unambiguous), and decimal
    * sums are exact — so this pins that the DECIMAL path, not just the
    * cents path, is engine-stable end to end. The aggregation runs
    * through DECIMAL, but the OUTPUT is exact BIGINT cents
    * (scale-2 × 100 is integral by construction): two rounds of driver
    * hash mismatches proved the engines' DECIMAL *physical
    * representations* hash differently even when the values and the
    * declared type agree, so no DECIMAL column may appear in an output
    * schema (enforced by Verify's schema lint).
    */
  val exprDecimalExact: Q = (s, d) =>
    Tables.t(s, d, "orders")
      .select(col("o_orderstatus"),
              col("o_totalprice").cast("decimal(18,2)").as("price_dec"))
      .groupBy("o_orderstatus")
      .agg(sum("price_dec").cast("decimal(38,2)").as("sum_dec"),
           max("price_dec").as("max_dec"),
           cnt.as("c"))
      .select(col("o_orderstatus"),
              (col("sum_dec") * lit(100)).cast("long").as("sum_cents"),
              (col("max_dec") * lit(100)).cast("long").as("max_cents"),
              col("c"))
      .orderBy("o_orderstatus")

  val queries: Map[String, Q] = Map(
    "expr_decimal_exact" -> exprDecimalExact,
    "typed_cogroup_stats" -> typedCogroupStats,
    "agg_grouping_id" -> aggGroupingId,
    "sort_nulls_last" -> sortNullsLast,
    "pivot_multi_agg" -> pivotMultiAgg,
    "expr_interval_arith" -> exprIntervalArith,
    "join_skew_salted" -> joinSkewSalted,
    "typed_group_stats" -> typedGroupStats,
    "map_typed_funcs" -> mapTypedFuncs,
    "map_transform_funcs" -> mapTransformFuncs,
    "map_zip_funcs" -> mapZipFuncs,
    "struct_funcs" -> structFuncs,
    "regexp_funcs" -> regexpFuncs,
    "agg_bitwise" -> aggBitwise,
    "win_time_range_7d" -> winTimeRange7d,
    "ml_feature_hash" -> mlFeatureHash,
    "anomaly_mad" -> anomalyMad,
    "seq_funnel_daily" -> seqFunnelDaily,
    "corpus_shard_pack" -> corpusShardPack,
  )
}
