package graft

import org.apache.spark.sql.Row

/** Wave-13/14 suite: relevance/indexing + integer-exact ML evaluation.
  * Golden values measured via DuckDB on sf0.001 (the driver's oracle
  * SQL); plan guards pin the broadcast-centroid fan-out and the
  * absence of single-partition windows in the AUC rank accumulation.
  */
class MlOpsSpec extends SparkSpecBase {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("ml_kmeans_2iter: two Lloyd iterations, integer-exact, centroids broadcast") {
    val rows = q("ml_kmeans_2iter").collect()
    assert(rows.length == 8)
    assert(rows.take(2).toSeq == Seq(Row(0L, 68L, 63999812L), Row(1L, 51L, 63999833L)))
    assert(rows.map(_.getLong(1)).sum == 500L) // every vector assigned exactly once
    val p = plan("ml_kmeans_2iter")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("ml_auc_rank: exact Mann-Whitney AUC, no single-partition window") {
    assert(q("ml_auc_rank").collect().toSeq == Seq(Row(248L, 252L, 61764L, 494143L)))
    // u2/(2*np*nn) ~ 0.494 — near-random labels, as expected for synthetic data.
    // The rank window must hash-partition on the coarse bucket; the only
    // SinglePartition exchange allowed is the final 1-row scalar aggregate
    // (partial-agg rows, not data).
    val p = q("ml_auc_rank").queryExecution.executedPlan.toString
    val winIdx = p.indexOf("Window [sum")
    assert(winIdx >= 0, p.take(1200))
    assert(p.indexOf("hashpartitioning(__cb", winIdx) >= 0, p.slice(winIdx, winIdx + 1200))
  }

  test("ml_confusion_matrix: full 10x10 census, one scan") {
    val rows = q("ml_confusion_matrix").collect()
    assert(rows.length == 100)
    assert(rows.head == Row(0L, 0L, 3L))
    assert(rows.map(_.getLong(2)).sum == 500L)
  }

  test("embedding_pca_power: 64 exact components; Gram build partial-aggregates") {
    val rows = q("embedding_pca_power").collect()
    assert(rows.length == 64)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 64L))
    // the dominant direction is not degenerate: components differ
    assert(rows.map(_.getLong(1)).distinct.length > 32)
    val p = q("embedding_pca_power").queryExecution.executedPlan.toString
    // round-7 shape: the Gram matrix partial-combines as ONE array per
    // map partition (VecSumLong) — no per-cell (i, j) shuffle, no joins
    assert(p.contains("partial_vec_sum_long"), p.take(800))
    assert(!p.contains("partial_sum"), p.take(800))
  }

  test("text_tfidf_topk: exactly 3 ranked terms per document") {
    val rows = q("text_tfidf_topk").collect()
    assert(rows.length == 1500) // 500 docs x 3
    assert(rows.head == Row(0L, "dup", 1L, 40000L, 1L))
    rows.groupBy(_.getLong(0)).values.foreach(g =>
      assert(g.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L)))
  }

  test("text_bigram_cooccur: top-10 adjacent bigrams per language") {
    val rows = q("text_bigram_cooccur").collect()
    assert(rows.length == 50) // 5 langs x 10
    assert(rows.head == Row("de", "column merge", 13L, 1L))
  }

  test("text_inverted_postings: posting census ordered by df") {
    val rows = q("text_inverted_postings").collect()
    assert(rows.length == 100)
    assert(rows.head == Row("en", "merge", 157L, 359L, 6L, 498L))
    // df monotone non-increasing down the census
    val dfs = rows.map(_.getLong(2))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
  }
}
