package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Focused equivalence tests for the r20 graph_kcore rework: the
  * incremental-degree peel + fixpoint exit must census identically to
  * the naive per-round full recompute on graphs that ACTUALLY peel —
  * the TPC-H bipartite graph is its own 2-core at every SF, so the
  * oracle never exercises rounds past the first fixpoint probe and
  * this spec is the only coverage of the maintenance path.
  */
class AuditsKcoreSpec extends SparkSpecBase {

  /** The pre-r20 formulation, verbatim (full degree recompute per
    * round, exactly `rounds` rounds, no fixpoint exit) — the reference
    * the incremental version must match on every graph.
    */
  private def naiveKcore(edges: DataFrame, rounds: Int): DataFrame = {
    var e = edges.localCheckpoint()
    for (_ <- 1 to rounds) {
      val peel = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg")).filter(col("deg") < 2)
        .select("n").localCheckpoint()
      e = e.join(peel.withColumnRenamed("n", "a"), Seq("a"), "left_anti")
        .join(peel.withColumnRenamed("n", "b"), Seq("b"), "left_anti")
        .localCheckpoint(false)
    }
    val nodes = e.select(col("a").as("n")).union(e.select(col("b").as("n"))).distinct()
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(nodes.agg(
        count(lit(1)).as("n_nodes"),
        sum(when(col("n") % 2 === 0, 1L).otherwise(0L)).cast("long").as("n_parts"),
        sum(when(col("n") % 2 === 1, 1L).otherwise(0L)).cast("long").as("n_suppliers"))))
      .select("n_edges", "n_nodes", "n_parts", "n_suppliers")
  }

  private def census(df: DataFrame): Seq[Long] =
    df.collect().head.toSeq.map(_.asInstanceOf[Long])

  private def edgesOf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  test("kcore: multi-round cascade peels identically to the naive recompute") {
    // chain 10-8-6-4-2 hanging off a 4-cycle (0,1,2,3): each peel round
    // removes one chain link and exposes the next — degree maintenance
    // must propagate the frontier for 4 consecutive non-empty rounds
    val pairs = Seq[(Long, Long)](
      (0L, 1L), (2L, 1L), (2L, 3L), (0L, 3L), // 4-cycle (the 2-core)
      (2L, 5L), (4L, 5L), (4L, 7L), (6L, 7L), (6L, 9L)) // cascading chain
    for (rounds <- 1 to 4)
      assert(census(ops.Audits.kcoreCensus(edgesOf(pairs), rounds)) ==
        census(naiveKcore(edgesOf(pairs), rounds)),
        s"cascade mismatch at rounds=$rounds")
  }

  test("kcore: star graphs, isolated dyads and a fixpoint-from-round-1 core agree") {
    val cases = Seq(
      // star: center survives round 1 in neither (all leaves degree 1)
      Seq[(Long, Long)]((0L, 1L), (0L, 3L), (0L, 5L), (0L, 7L)),
      // two dyads: everything peels in one round
      Seq[(Long, Long)]((0L, 1L), (2L, 3L)),
      // complete-ish core, nothing peels: fixpoint at round 1 must
      // census the untouched edge set
      Seq[(Long, Long)]((0L, 1L), (0L, 3L), (2L, 1L), (2L, 3L), (4L, 1L), (4L, 3L)),
      // node losing ALL edges to peeled partners (0-degree row path):
      // 4 connects only to two degree-1-side chains
      Seq[(Long, Long)]((4L, 1L), (4L, 3L), (0L, 1L), (2L, 3L), (6L, 7L), (6L, 9L), (8L, 7L), (8L, 9L)))
    cases.zipWithIndex.foreach { case (pairs, i) =>
      assert(census(ops.Audits.kcoreCensus(edgesOf(pairs), 4)) ==
        census(naiveKcore(edgesOf(pairs), 4)), s"case $i mismatch")
    }
  }

  test("kcore: declared query matches the naive recompute on sf0.001") {
    val li = graft.tables.Tables.t(spark, sf, "lineitem")
    val bip = li.select((col("l_partkey") * 2).as("a"),
      (col("l_suppkey") * 2 + 1).as("b")).distinct()
    assert(census(q("graph_kcore")) == census(naiveKcore(bip, 4)))
  }
}
