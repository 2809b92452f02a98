package graft

import org.apache.spark.sql.Row

/** Round-7 wave 16 suite: retrieval eval, calibration, attribution,
  * journey mining, PMI collocations, and the oracled KMV sketch.
  * Golden values measured via DuckDB on sf0.001 (the driver's oracle
  * SQL verbatim); structural assertions pin the properties the goldens
  * can't — estimator error bounds, metric self-consistency, and the
  * map-side-mergeable sketch plan.
  */
class Round7Spec extends SparkSpecBase {

  test("agg_kmv_distinct: estimates track exact counts; sketch partial-aggregates map-side") {
    val rows = q("agg_kmv_distinct").collect()
    assert(rows.length == 4)
    assert(rows.toSeq == Seq(
      Row("A", 1274L, 212120477L, 1285L),
      Row("ALL", 1905L, 138864364L, 1964L),
      Row("N", 1274L, 211916967L, 1286L),
      Row("R", 1251L, 225222281L, 1210L)))
    // KMV error bound: relative error concentrates around 1/sqrt(k) ≈ 9%
    // at k=128 — every group (and the merged ALL row) must land inside it
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(3))
      assert(math.abs(est - exact).toDouble / exact < 0.10, s"${r.getString(0)}: $est vs $exact")
    }
    // the whole point of BottomK over a window: ≤ k rows per group leave
    // the map side (partial_bottom_k BEFORE the exchange)
    val p = q("agg_kmv_distinct").queryExecution.executedPlan.toString
    assert(p.contains("partial_bottom_k"), p.take(1200))
  }

  test("ml_mrr_hits: golden ranks and internal metric consistency") {
    val rows = q("ml_mrr_hits").collect()
    assert(rows.length == 10)
    assert(rows.head == Row(0L, 7L, 142857L, 2L, 499L))
    rows.foreach { r =>
      val (frr, rr, h10) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rr == (if (frr > 0) 1000000L / frr else 0L)) // rr_ppm IS div(1e6, rank)
      assert(h10 >= 0 && h10 <= 10)
      if (h10 > 0) assert(frr >= 1 && frr <= 10) // a top-10 hit implies first rank ≤ 10
      assert(r.getLong(4) == 499L) // every probe ranks the full corpus minus itself
    }
  }

  test("ml_calibration_bins: bins partition the corpus") {
    val rows = q("ml_calibration_bins").collect()
    assert(rows.map(_.getLong(1)).sum == 500L)
    assert(rows.head == Row(96L, 1L, 0L, 0L))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_pos ≤ n
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
    }
  }

  test("events_attribution: every purchase attributed exactly once") {
    val rows = q("events_attribution").collect()
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("click" -> 49L, "error" -> 49L, "none" -> 3L, "signup" -> 52L, "view" -> 49L))
    val purchases = graft.tables.Tables.t(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == purchases)
  }

  test("events_path_topk: top-20 journeys, paths bounded at five steps") {
    val rows = q("events_path_topk").collect()
    assert(rows.length == 20)
    assert(rows.head == Row("click", 24L))
    // census is ordered and every path has ≤ 5 '>'-separated steps
    assert(rows.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).sortBy(-_).toSeq)
    rows.foreach(r => assert(r.getString(0).split('>').length <= 5))
  }

  test("ml_lift_gain: deciles partition the eval set, gain monotone, golden head") {
    val rows = q("ml_lift_gain").collect()
    assert(rows.length == 10)
    assert(rows.head == Row(1L, 50L, 26L, 26L, 103174L, 1031746L))
    assert(rows.map(_.getLong(1)).sum == 500L) // deciles cover every row once
    val cum = rows.map(_.getLong(3))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b }) // gain is cumulative
    assert(cum.last == rows.map(_.getLong(2)).sum) // last decile reaches all positives
    // no single-partition window over the data: the ranking is globalRank's
    val p = q("ml_lift_gain").queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(__cb"), p.take(1200))
  }

  test("ts_cusum_changepoint: deviations sum to zero, peak day(s) flagged") {
    val rows = q("ts_cusum_changepoint").collect()
    assert(rows.length == 30)
    assert(rows.map(_.getLong(2)).sum == 0L) // Σ(cents·n − total) = 0 by construction
    assert(rows.last.getLong(3) == 0L)       // cusum returns to zero
    assert(rows.map(_.getLong(4)).sum >= 1L) // at least one argmax flagged
    assert(rows.head.getDate(0).toString == "2024-01-01" && rows.head.getLong(1) == 5695L)
  }

  test("ts_dow_seasonality: full 5x7 profile, indices average to ~1e6 per type") {
    val rows = q("ts_dow_seasonality").collect()
    assert(rows.length == 35)
    assert(rows.head == Row("click", 1L, 29L, 149210L, 1047926L))
    // revenue-weighted indices reconstruct the type totals exactly:
    // sum over dows of n*idx/1e6*avg == total, checked loosely via
    // the count-weighted mean landing near parity
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val wmean = g.map(r => r.getLong(2) * r.getLong(4)).sum.toDouble /
        g.map(_.getLong(2)).sum
      assert(math.abs(wmean - 1000000.0) < 50000.0, wmean.toString)
    }
  }

  test("events_cooccur_lift: all 10 unordered type pairs, golden head") {
    val rows = q("events_cooccur_lift").collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    assert(rows.head == Row("click", "error", 64L, 968477L))
    rows.foreach(r => assert(r.getString(0) < r.getString(1))) // unordered, canonical
  }

  test("graph_degree_distribution: node census is conserved per side") {
    val rows = q("graph_degree_distribution").collect()
    assert(rows.toSeq.take(3) == Seq(Row("part", 8L, 19L), Row("part", 9L, 57L),
      Row("part", 10L, 124L)))
    // Σ deg·n_nodes must be identical on both sides (each edge counted once per side)
    val bySide = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getLong(1) * r.getLong(2)).sum).toMap
    assert(bySide("part") == bySide("supplier"))
  }

  test("text_pmi_bigrams: min-support respected, ordering exact") {
    val rows = q("text_pmi_bigrams").collect()
    assert(rows.length == 30)
    assert(rows.head == Row("order", "fast", 51L, 1621825L))
    assert(rows.forall(_.getLong(2) >= 5L))
    assert(rows.map(_.getLong(3)).toSeq == rows.map(_.getLong(3)).sortBy(-_).toSeq)
  }
}
