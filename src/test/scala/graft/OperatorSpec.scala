package graft

import org.apache.spark.sql.Row

/** Layer-1 per-operator tests (SURVEY.md §5.2): every declared query
  * runs on sf0.001, returns rows, and a set of hand-pinned results
  * (measured via DuckDB on sf0.001 this session) match exactly.
  */
class OperatorSpec extends SparkSpecBase {

  test("every declared query returns rows; oracles and bench keys are consistent") {
    val keys = SparkEntry.queries.keySet
    // every oracle belongs to a declared query (no orphan oracle SQL)
    val orphans = SparkEntry.oracleSql.keySet -- keys
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
    // the only deliberately oracle-less queries are the engine-side
    // hash-family sketches
    val unoracled = keys -- SparkEntry.oracleSql.keySet
    assert(unoracled == Set("dedup_simhash", "ann_lsh_topk",
                            "agg_approx_percentiles", "agg_hll_users",
                            "agg_approx_topk"),
      s"unexpected oracle-less queries: $unoracled")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("bench battery keys all resolve to declared queries") {
    // guards against a rename silently dropping a query from BENCH_r{N}
    val src = scala.io.Source.fromFile("src/main/scala/graft/Bench.scala", "UTF-8").mkString
    val quoted = "\"([a-z0-9_]+)\"".r.findAllMatchIn(src).map(_.group(1)).toSet
    val benchKeys = quoted.intersect(SparkEntry.queries.keySet)
    assert(benchKeys.size == 58, s"expected 58 baseline keys, got ${benchKeys.size}")
  }

  test("bench harness surfaces a throwing query as an error row, never a silent time") {
    val timed = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "ok_query" -> ((s, dir) => s.read.parquet(s"$dir/region.parquet")),
      "boom_query" -> ((_, _) => throw new IllegalStateException("deliberate bench failure")))
    val run = BenchHarness.measure(spark, sf, timed, passes = 2)
    assert(run.best.contains("ok_query") && run.best("ok_query") > 0)
    assert(!run.best.contains("boom_query"),
      "a throwing query must not produce a timing row")
    assert(run.errors.keySet == Set("boom_query"))
    assert(run.errors("boom_query").contains("deliberate bench failure"))
    // and the emitted JSON line carries the errors map
    val out = java.nio.file.Files.createTempFile("bench_err", ".json")
    val prev = System.out
    try BenchHarness.emit(run, sf, out.toString) finally System.setOut(prev)
    val line = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
    assert(line.contains("\"errors\":{\"boom_query\":"), s"no errors field in: $line")
    assert(line.contains("\"ok_query\":"))
  }

  test("query keys are valid directory names (R8)") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("[a-z0-9_]+"), s"bad key: $k")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_pricing_summary pinned group") {
    // DuckDB sf0.001: l_returnflag='A', l_linestatus='F'
    val r = q("q1_pricing_summary")
      .filter("l_returnflag = 'A' and l_linestatus = 'F'").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("count_order") > 0)
    assert(row.getAs[Long]("sum_qty") > 0)
  }

  test("join semantics: semi + anti partition customers with/without big orders") {
    val semi = q("join_semi").count()
    val anti = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet")
              .filter("o_totalprice > 400000"),
            org.apache.spark.sql.functions.col("c_custkey") ===
              org.apache.spark.sql.functions.col("o_custkey"), "left_anti")
      .count()
    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(semi + anti == total)
  }

  test("set ops algebra: |A ∪all B| = |A| + |B|") {
    import org.apache.spark.sql.functions.col
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val a = o.filter(col("o_orderstatus") === "F").count()
    val b = o.filter(col("o_orderstatus") === "P").count()
    // set_union_all limits to 1000; recompute unlimited here
    assert(a + b > 0)
    val u = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .unionByName(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
      .count()
    assert(u == a + b)
  }

  test("win_topk_per_group: at most 3 rows per customer, rn in 1..3") {
    val rows = q("win_topk_per_group").collect()
    assert(rows.forall(r => { val rn = r.getAs[Long]("rn"); rn >= 1 && rn <= 3 }))
    val perKey = rows.groupBy(_.getAs[Long]("o_custkey")).values.map(_.length)
    assert(perKey.forall(_ <= 3))
  }

  test("dedup_exact_hash: n_uniq <= n_docs") {
    val Row(nDocs: Long, nUniq: Long) = q("dedup_exact_hash").collect().head
    assert(nUniq <= nDocs && nUniq > 0)
  }

  test("sim_knn_per_query: exactly 3 neighbours per query, none self") {
    val rows = q("sim_knn_per_query").collect()
    val byQ = rows.groupBy(_.getAs[Long]("q"))
    assert(byQ.size == 10)
    assert(byQ.values.forall(_.length == 3))
    assert(rows.forall(r => r.getAs[Long]("q") != r.getAs[Long]("n")))
  }

  test("recon_leg_match: three statuses, counts consistent with legs") {
    import org.apache.spark.sql.functions.col
    val rows = q("recon_leg_match").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
           Seq("matched", "unmatched_a", "unmatched_b"))
    val e = graft.tables.Tables.t(spark, sf, "events")
    val nA = e.filter(col("event_type") === "signup").count()
    val byStatus = rows.map(r => r.getString(0) -> r.getAs[Long]("c")).toMap
    // unmatched_a <= total signups
    assert(byStatus("unmatched_a") <= nA)
  }

  test("cogroup as-of equals composed band-join as-of") {
    val a = q("join_asof_last_signup").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("last_signup_id"))).toSet
    val b = q("join_asof_cogroup").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("last_signup_id"))).toSet
    assert(a == b)
  }

  test("forward merge as-of equals the band-join first-after form") {
    // round 10: AsOfMergeExec's forward (descending-sweep) mode vs the
    // natural join + min-struct shape — identical next-error rows
    def rows(n: String) = q(n).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("next_error_id"),
                 r.getAs[Long]("next_us"))).toSet
    assert(rows("join_asof_merge_next") == rows("join_asof_next"))
  }

  test("cogroup as-of completes and stays exact under a 100k-event hot key") {
    import org.apache.spark.sql.functions._
    // one pathological key holding BOTH legs' full 100k events: the
    // per-key buffer is ~2.4 MB — completion + exactness here pins the
    // hot-key bound the asofLastPrior scaladoc documents
    val n = 100000L
    val left = spark.range(n)
      .select(col("id"), lit(7L).as("key"), (col("id") * 2 + 1).as("ts"))
    val right = spark.range(n)
      .select((col("id") + 1000000L).as("id"), lit(7L).as("key"),
              (col("id") * 2).as("ts"))
    val res = graft.ops.AsOf.asofLastPrior(left, right).cache()
    // analytic oracle: left ts=2i+1 → greatest right ts<=2i+1 is 2i →
    // right id 1000000+i (equivalent to the band-join result, which is
    // infeasible to materialize at 1e10 candidate pairs)
    assert(res.count() == n)
    assert(res.filter(col("last_signup_id") =!= col("purchase_id") + 1000000L)
      .count() == 0L)
    res.unpersist()
    // and band-join equality on a slice of the same hot key, so the
    // analytic check above is itself cross-validated against the
    // composed form's semantics
    val sl = left.filter(col("id") < 2000)
    val sr = right.filter(col("id") < 1002000L)
    val band = sl.as("l")
      .join(sr.as("r"), col("l.key") === col("r.key") && col("r.ts") <= col("l.ts"))
      .groupBy(col("l.id").as("purchase_id"))
      .agg(max(struct(col("r.ts").as("ts"), col("r.id").as("id"))).as("m"))
      .select(col("purchase_id"), col("m.id").as("last_signup_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val swept = graft.ops.AsOf.asofLastPrior(sl, sr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(swept == band)
  }

  test("vec_dot matches interpreted higher-order fold bit-for-bit") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.vec_dot
    val e = graft.tables.Tables.t(spark, sf, "embeddings").limit(50)
    val hof = e.select(
      col("vec_id"),
      aggregate(zip_with(transform(col("embedding"), _.cast("double")),
                         transform(col("embedding"), _.cast("double")),
                         _ * _),
                lit(0.0), (acc, x) => acc + x).as("s"))
    val fast = e.select(col("vec_id"), vec_dot(col("embedding"), col("embedding")).as("s"))
    val diff = hof.as("a").join(fast.as("b"), "vec_id")
      .filter(col("a.s") =!= col("b.s")).count()
    assert(diff == 0, "vec_dot diverges from the reference fold")
  }

  test("agg_approx_percentiles within 1% of exact percentiles (R7)") {
    val approx = q("agg_approx_percentiles").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = q("agg_percentiles").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50).toDouble / p50 <= 0.01, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90).toDouble / p90 <= 0.01, s"$k p90: $a90 vs $p90")
    }
  }

  test("retention cohorts: weekly actives never exceed the cohort's size") {
    import org.apache.spark.sql.functions._
    val rows = q("events_retention_cohort").collect()
    assert(rows.nonEmpty)
    val cohortSizes = graft.tables.Tables.t(spark, sf, "events")
      .filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("ft"))
      .groupBy(to_date(date_trunc("week", col("ft"))).as("cohort_w"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val cw = r.getDate(0)
      assert(r.getAs[Long]("n_users") <= cohortSizes(cw),
        s"cohort $cw week ${r.getDate(1)} exceeds cohort size")
    }
  }

  test("reconciliation value classes partition the banded pair set") {
    val rows = q("recon_value_tolerance").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("c")).toMap
    assert(rows.keySet.subsetOf(Set("exact", "near", "mismatch")))
    assert(rows.values.sum > 0)
  }

  test("gap detection: every reported gap exceeds the threshold") {
    val rows = q("stream_gap_detect").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("max_gap_s") > 21600L &&
                            r.getAs[Long]("n_gaps") >= 1L))
  }

  test("sorted_jaccard matches array_intersect/array_union formulation") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.sorted_jaccard
    val toks = graft.tables.Tables.t(spark, sf, "documents").limit(40)
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("tk"))
    val a = toks.select(col("doc_id").as("a_id"), col("tk").as("a_tk"))
    val b = toks.select(col("doc_id").as("b_id"), col("tk").as("b_tk"))
    val pairs = a.join(b, col("a_id") < col("b_id"))
    val mismatch = pairs.filter(
      sorted_jaccard(col("a_tk"), col("b_tk")) =!=
        (size(array_intersect(col("a_tk"), col("b_tk"))).cast("double") /
         size(array_union(col("a_tk"), col("b_tk"))))).count()
    assert(mismatch == 0)
  }
}
