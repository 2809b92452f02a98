package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** Round-4 wave 14: ML-evaluation / clustering primitives over the
  * embeddings table, all integer-exact (SURVEY §2.1-R2/R6):
  *
  *  - `ml_kmeans_2iter` — iterative exemplar #3 (after connected
  *    components and PageRank): two rounds of Lloyd's k-means on
  *    OFFSET-quantized integer vectors. Components map to
  *    `round(x·1000) + 1e6`: the +1e6 offset keeps every value — and
  *    therefore every centroid-mean dividend — strictly positive, so
  *    Spark's `div` (truncate toward zero) and DuckDB's `//` (floor)
  *    agree; distances are shift-invariant so the offset never changes
  *    an assignment.
  *  - `ml_auc_rank` — EXACT ROC-AUC via the Mann-Whitney rank-sum
  *    statistic: AUC = U/(n⁺·n⁻) with ties at the average rank.
  *    Doubling every rank term keeps tie midpoints integral, so `u2`
  *    (= 2U) is an exact integer and the final AUC is an integer
  *    parts-per-million `div`.
  *  - `ml_confusion_matrix` — label × deterministic-prediction counts.
  *
  * Scale posture: k-means evaluates all k centroid distances in ONE
  * codegen projection per vector (the centroid table — k·dim values,
  * bytes — is broadcast as a single array row), so each iteration is
  * one linear pass + one partially-aggregated (cell, dim) aggregate;
  * no k-way row fan-out, no per-vector window, nothing re-reads
  * history. The AUC rank accumulation runs over the DISTINCT-score
  * table via [[Scale.globalPrefixSum]]'s bucket-parallel prefix sum —
  * no single-partition window anywhere (plan-guarded in MlOpsSpec).
  */
object MlOps {

  private def emb(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")

  /** vec_id → positive integer vector (round(x·1000) + 1e6). */
  private def qvecs(s: SparkSession, d: String): DataFrame =
    emb(s, d).select(
      col("vec_id"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint) + 1000000)")
        .as("q"))

  /** Nearest centroid per vector; ties break to the smallest cid
    * (ADVICE round-3: quantized centroids can collide, so the
    * tiebreak must be explicit on both engines).
    *
    * One codegen projection per vector — the k centroids arrive as a
    * single broadcast 1-row array, every distance is computed inline
    * with `transform`/`zip_with`, and the argmin is `array_min` over
    * (d2, cid) structs (lexicographic struct ordering IS the explicit
    * smallest-cid tiebreak). No k-way row fan-out, no per-vector
    * window shuffle; `q` rides along so the centroid recompute needs
    * no join back to the vector table.
    */
  /** `c` must be a 1-row frame with a `cents` column of
    * array<struct<cid, c>> — see [[centsOf]] / [[recompute]].
    */
  private def assign(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"),
        graft.functions.VectorFunctions
          .nearest_centroid(col("q"), col("cents")).as("cell"))

  /** (cid, c) rows → the 1-row broadcastable centroid array. */
  private def centsOf(c: DataFrame): DataFrame =
    c.agg(collect_list(struct(col("cid"), col("c"))).as("cents"))

  /** Integer centroid recompute: per (cell, dim), floor-mean of the
    * (positive) member components, re-packed DIRECTLY into the 1-row
    * broadcastable centroid array for the next [[assign]]. The
    * (cell, pos) aggregate partial-combines map-side (the shuffle
    * carries ~k·dim rows per map partition regardless of n), and the
    * per-cell collapse happens INSIDE the final 1-row collect — one
    * shuffle barrier per iteration instead of two, which matters
    * because this query's cost is pure sequential-stage floor, not
    * data (the k·dim flat array is 512 elements).
    */
  private def recompute(a: DataFrame): DataFrame =
    a.select(col("cell"), posexplode(col("q")).as(Seq("pos", "qv")))
      .groupBy("cell", "pos")
      .agg(expr("div(sum(qv), count(1))").as("cv"))
      .agg(collect_list(struct(col("cell"), col("pos"), col("cv"))).as("flat"))
      .select(expr(
        """transform(
          |  array_sort(array_distinct(transform(flat, x -> x.cell))),
          |  cl -> named_struct(
          |    'cid', cl,
          |    'c', transform(filter(array_sort(flat), x -> x.cell = cl),
          |                   x -> x.cv)))""".stripMargin).as("cents"))

  /** Two Lloyd iterations, k = 8, seeded by the first 8 vectors
    * (deterministic — no RNG anywhere). Output: final cluster census +
    * the centroid component-sum checksum (offset space).
    */
  val mlKmeans2iter: Q = (s, d) => {
    val v = qvecs(s, d)
    val c0 = centsOf(
      v.filter(col("vec_id") < 8).select(col("vec_id").as("cid"), col("q").as("c")))
    val c1 = recompute(assign(v, c0))
    val c2 = recompute(assign(v, c1))
    val a3 = assign(v, c2)
    val census = a3.groupBy("cell").agg(cnt.as("n_members"))
    val sums = c2.select(explode(col("cents")).as("ct"))
      .select(col("ct.cid").as("cell"),
        expr("aggregate(ct.c, 0L, (acc, x) -> acc + x)").as("centroid_sum"))
    census.join(broadcast(sums), "cell")
      .select(col("cell").cast("long").as("cell"), col("n_members"), col("centroid_sum"))
      // k rows: a single-partition sort replaces orderBy's
      // range-boundary sampling job + range exchange (two of the ~10
      // sequential barriers this query's cost consists of)
      .coalesce(1).sortWithinPartitions("cell")
  }

  /** Exact AUC of the integer score `sum(q)` against the binary label
    * `label < 5`. Rank accumulation is a prefix sum over the DISTINCT
    * score table (bucket-parallel, never single-partition): for a
    * score group of size n starting after cumBefore rows, twice its
    * average rank is `2·cumBefore + n + 1`.
    */
  val mlAucRank: Q = (s, d) => {
    val scored = emb(s, d).select(
      expr("aggregate(transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)), 0L, (acc, x) -> acc + x)")
        .as("score"),
      when(col("label") < 5, 1L).otherwise(0L).as("pos"))
    val g = scored.groupBy("score")
      .agg(cnt.as("n"), sum("pos").cast("long").as("np"))
    val ps = Scale.globalPrefixSum(g, floor(col("score") / lit(1000L)),
        Seq(col("score")), col("n"))
    val acc = ps
      .select((col("np") * (lit(2L) * (col("__ps") - col("n")) + col("n") + 1L)).as("term"),
              col("np"), col("n"))
      .agg(sum("term").cast("long").as("sum_ranks2"),
           sum("np").cast("long").as("n_pos"),
           (sum("n") - sum("np")).cast("long").as("n_neg"))
    acc.select(
        col("n_pos"), col("n_neg"),
        (col("sum_ranks2") - col("n_pos") * (col("n_pos") + 1L)).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
              expr("div(u2 * 500000, n_pos * n_neg)").as("auc_ppm"))
  }

  /** Confusion matrix of the stored label against a deterministic
    * integer prediction (|component|-sum mod 10) — the evaluation-step
    * census every training pipeline emits. One scan + one keyed agg.
    */
  val mlConfusionMatrix: Q = (s, d) => {
    emb(s, d).select(
        col("label").cast("long").as("label"),
        expr("aggregate(transform(embedding, x -> abs(cast(round(cast(x as double) * 1000) as bigint))), 0L, (acc, x) -> acc + x) % 10")
          .as("pred"))
      .groupBy("label", "pred")
      .agg(cnt.as("c"))
      .orderBy("label", "pred")
  }

  /** Principal-direction power iteration (iterative exemplar #4):
    * two integer-exact multiplies of the 64×64 Gram matrix
    * G = Σ q·qᵀ against the all-ones start vector. The only
    * data-sized work is the outer-product aggregate (n·64² partial-
    * agg'd rows, shuffling on 4096 (i, j) keys — the standard
    * distributed covariance build); the iteration itself runs on the
    * 64-row vector. Between multiplies the vector rescales by
    * `div 2¹²` — truncation toward zero, matched in the oracle by
    * `trunc(x / 2^12.0)` (exact: dividing by a power of two is exact
    * in double below 2^53, and Gram/vector magnitudes stay < 2^46;
    * 2^24 underflowed every component to zero at these Gram
    * magnitudes — measured).
    * Output: the 64 raw components of G·(G·1 div 2¹²) — the dominant
    * eigendirection up to scale, bit-identical across engines.
    */
  val embeddingPcaPower: Q = (s, d) => {
    // Gram build: ONE row-level outer-product array per vector, summed
    // element-wise by the mergeable VecSumLong aggregate — each map
    // partition partial-combines to a single 64²-long array, so the
    // shuffle carries one array per partition instead of n·64² (i, j)
    // cell rows, and the whole query is scan → 1-row merge → one
    // projection (no joins, no per-cell shuffle). Round-7 rewrite of
    // the explode/groupBy formulation: same integers, 0.83 s → ~0.25 s
    // at sf0.1 (the cost was the 2M-row cell shuffle + 4 barriers).
    val g1 = emb(s, d)
      // quantize ONCE per row — inlining the transform into the nested
      // lambda re-evaluates it per outer element (64× redundant work)
      .select(expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("q"))
      .select(expr("flatten(transform(q, a -> transform(q, b -> a * b)))").as("op"))
      .agg(graft.functions.VectorFunctions.vec_sum_long(col("op")).as("g"))
    // both matrix-vector multiplies run on the single 4096-long row:
    // b1 = G·1 div 2¹² (b0 = ones), b2 = G·b1 — 64×64 inline loops.
    // b1 binds as a LAMBDA VARIABLE (transform over a 1-element array),
    // not a column: project collapse would otherwise inline the b1
    // expression into all 64 b2 elements — a 64× re-evaluation blowup
    // (measured 3.5 s; the same hoisted-lambda hazard as ml_kmeans).
    g1.withColumn("b2", expr(
        """element_at(transform(
          |  array(transform(sequence(0, 63), i ->
          |    aggregate(sequence(0, 63), 0L, (acc, j) -> acc + element_at(g, i * 64 + j + 1))
          |      div 4096)),
          |  b1 -> transform(sequence(0, 63), i ->
          |    aggregate(sequence(0, 63), 0L,
          |      (acc, j) -> acc + element_at(g, i * 64 + j + 1) * element_at(b1, j + 1)))),
          |1)""".stripMargin))
      .select(posexplode(col("b2")).as(Seq("i", "b2")))
      // posexplode is 0-based, the oracle's range(1,65) list index is
      // 1-based — emit 1-based dims to match
      .select((col("i") + 1).cast("long").as("dim"), col("b2").cast("long").as("b2"))
      .orderBy("dim")
  }

  /** Retrieval-evaluation metrics (MRR / hits@k) over the EXACT
    * brute-force ranking — the eval-set contract is the true ranking,
    * so this is deliberately all-pairs over the 10-query probe set
    * (the serving-path twin is `ann_ivf_topk`). Scores are exact
    * integer dot products of the `round(x·1000)` quantized vectors
    * (components < 2¹⁰, 64 dims → |dot| < 2²⁶, exactly representable
    * on both engines); relevance = label equality. Emits per query:
    * rank of the first relevant neighbor (0 = none), its reciprocal
    * as integer ppm (the MRR contribution), and hits@10.
    */
  val mlMrrHits: Q = (s, d) => {
    val e = emb(s, d).select(
      col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
    val qs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"), col("v").as("qv"))
    val cs = e.select(col("vec_id").as("n_id"), col("label").as("n_label"), col("v").as("nv"))
    val w = Window.partitionBy("q_id").orderBy(col("dot").desc, col("n_id"))
    qs.join(cs, col("q_id") =!= col("n_id"))
      .withColumn("dot",
        expr("aggregate(zip_with(qv, nv, (x, y) -> x * y), 0L, (acc, p) -> acc + p)"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rel", when(col("q_label") === col("n_label"), 1L).otherwise(0L))
      .groupBy("q_id")
      .agg(coalesce(min(when(col("rel") === 1L, col("rn"))), lit(0)).cast("long")
             .as("first_rel_rank"),
           sum(when(col("rn") <= 10, col("rel")).otherwise(0L)).cast("long")
             .as("hits_at_10"),
           cnt.as("n_candidates"))
      .withColumn("rr_ppm",
        when(col("first_rel_rank") > 0, expr("div(1000000, first_rel_rank)"))
          .otherwise(0L).cast("long"))
      .select("q_id", "first_rel_rank", "rr_ppm", "hits_at_10", "n_candidates")
      .orderBy("q_id")
  }

  /** Calibration table: the integer projection score (component sum of
    * the quantized vector, offset to stay strictly positive so `div`
    * truncation agrees across engines) bucketed into fixed-width bins,
    * with the positive rate per bin as integer ppm — the
    * reliability-diagram input every classifier eval emits. One scan +
    * one keyed agg; bin count is bounded by the score range, never n.
    */
  val mlCalibrationBins: Q = (s, d) =>
    emb(s, d)
      .select(
        (expr("aggregate(transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)), 0L, (acc, x) -> acc + x)")
           + 100000L).as("score_off"),
        when(col("label") >= 5, 1L).otherwise(0L).as("pos"))
      .withColumn("bin", expr("div(score_off, 1000)"))
      .groupBy("bin")
      .agg(cnt.as("n"), sum("pos").cast("long").as("n_pos"))
      .withColumn("pos_ppm", expr("div(n_pos * 1000000, n)"))
      .orderBy("bin")

  /** Decile lift/gain table — the campaign-targeting eval every scorer
    * ships: rank by score desc (bucket-parallel [[Scale.globalRank]],
    * never a single-partition window over the data), assign deciles by
    * the exact integer formula `(rn−1)·10 div n + 1`, then per decile:
    * size, positives, cumulative positives, gain (cum share of all
    * positives, ppm) and lift (decile positive rate over the base
    * rate, ppm). The only unpartitioned window runs over the 10-row
    * decile table — bounded by construction.
    */
  val mlLiftGain: Q = (s, d) => {
    val scored = emb(s, d).select(
      col("vec_id"),
      expr("aggregate(transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)), 0L, (acc, x) -> acc + x)")
        .as("score"),
      when(col("label") >= 5, 1L).otherwise(0L).as("pos"))
    val ranked = Scale.globalRank(
      scored.withColumn("neg_score", -col("score")),
      floor(col("neg_score") / lit(1000L)), Seq(col("neg_score"), col("vec_id")))
    val dec = ranked
      .withColumn("decile", expr("div((__rn - 1) * 10, __n) + 1"))
      .groupBy("decile")
      .agg(cnt.as("n"), sum("pos").cast("long").as("n_pos"))
    val tot = dec.agg(sum("n").cast("long").as("total_n"),
                      sum("n_pos").cast("long").as("total_pos"))
    val wcum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.crossJoin(broadcast(tot))
      .withColumn("cum_pos", sum("n_pos").over(wcum).cast("long"))
      .withColumn("gain_ppm", expr("div(cum_pos * 1000000, total_pos)"))
      .withColumn("lift_ppm", expr("div(n_pos * total_n * 1000000, n * total_pos)"))
      .select("decile", "n", "n_pos", "cum_pos", "gain_ppm", "lift_ppm")
      .orderBy("decile")
  }

  val queries: Map[String, Q] = Map(
    "ml_lift_gain" -> mlLiftGain,
    "embedding_pca_power" -> embeddingPcaPower,
    "ml_kmeans_2iter" -> mlKmeans2iter,
    "ml_auc_rank" -> mlAucRank,
    "ml_confusion_matrix" -> mlConfusionMatrix,
    "ml_mrr_hits" -> mlMrrHits,
    "ml_calibration_bins" -> mlCalibrationBins,
  )
}
