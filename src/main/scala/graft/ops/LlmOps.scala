package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{sorted_jaccard, sorted_overlap, vec_dot}
import graft.tables.Tables
import Util._

/** Training-data-pipeline operators over `documents` / `embeddings`
  * (SURVEY.md §2.3 LLM block): exact and near dedup, embedding cosine
  * similarity (threshold self-join + kNN), token statistics, and a
  * mixed-modality join. All vector math uses codegen'd higher-order
  * array functions (`transform` / `zip_with` / `aggregate`) — no UDFs
  * in the hot path — with float→double casts per SURVEY §2.1-R5.
  *
  * Scale posture: the near-dup join is blocked on (lang, source) and
  * the similarity joins are thresholded; at 100 TB the same shapes get
  * a MinHash-LSH / IVF prefilter in front (see
  * [[graft.ops.Pipeline]]) — blocking keys are the scale lever, the
  * verify step is unchanged.
  */
object LlmOps {

  private def documents(s: SparkSession, d: String)  = Tables.t(s, d, "documents")
  private def embeddings(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")

  /** embedding (float32) → double vector. */
  def vecD(c: Column): Column = transform(c, _.cast("double"))

  /** Σ x² over a double array (sequential left fold — deterministic). */
  def sqNorm(v: Column): Column = aggregate(v, lit(0.0), (acc, x) => acc + x * x)

  /** vec_id, raw float vector, and L2 norm — shared by the similarity
    * joins. The norm and all pairwise dots go through the codegen'd
    * [[graft.functions.VecDot]] kernel (identical double arithmetic to
    * the cast-then-fold chain, ~20× faster on the O(n²) join).
    */
  private def normed(s: SparkSession, d: String, id: String, v: String, n: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id").as(id), col("embedding").as(v))
      .withColumn(n, sqrt(vec_dot(col(v), col(v))))

  val dedupExactHash: Q = (s, d) =>
    documents(s, d)
      .agg(cnt.as("n_docs"), countDistinct(md5(col("text"))).as("n_uniq"))

  /** (lang, source)-blocked token-set self-join: one sorted-distinct
    * token array per document, candidate pairs constrained by
    * `idCond(a_id, b_id)` — the shared scaffolding of every blocked
    * pairwise text-similarity operator (Jaccard dedup, containment).
    * Output columns: a_id, b_id, a_tk, b_tk.
    */
  private def blockedTokenPairs(s: SparkSession, d: String,
                                idCond: (Column, Column) => Column): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
              array_sort(array_distinct(split(col("text"), " "))).as("tk"))
    val a = toks.select(col("doc_id").as("a_id"), col("lang"), col("source"),
                        col("tk").as("a_tk"))
    val b = toks.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
                        col("source").as("b_source"), col("tk").as("b_tk"))
    // SHUFFLE_HASH, not sort-merge: block keys are strings, and Spark
    // 4.1's UTF8String.compareTo pays a per-comparison isTesting()
    // env-var probe — a sorted merge over the pair volume is orders
    // slower than hash probes (measured: 102k-doc corpus, SMJ still
    // running at 12 min vs 43 s hashed). No sort is needed anyway, and
    // AQE bounds the per-partition build side at any corpus size.
    a.hint("shuffle_hash")
      .join(b, col("lang") === col("b_lang") && col("source") === col("b_source") &&
              idCond(col("a_id"), col("b_id")))
  }

  /** Near-dup detection: token-set Jaccard ≥ 0.9 within (lang, source)
    * blocks. Token sets are sorted+deduped ONCE per document, then each
    * candidate pair costs a single codegen'd merge pass
    * ([[graft.functions.SortedJaccard]]) instead of two per-pair hash
    * sets. Blocking keys bound the quadratic term — at 100 TB the same
    * shape takes MinHash-LSH band keys as the block
    * (see [[graft.ops.Pipeline]]); the verify pass is unchanged.
    */
  val dedupNearJaccard: Q = (s, d) =>
    blockedTokenPairs(s, d, _ < _)
      .filter(sorted_jaccard(col("a_tk"), col("b_tk")) >= 0.9)
      .select("a_id", "b_id")
      .orderBy("a_id", "b_id")
      .limit(2000)

  val simPairsThreshold: Q = (s, d) => {
    val e1 = normed(s, d, "a", "va", "na")
    val e2 = normed(s, d, "b", "vb", "nb")
    e1.join(e2, col("a") < col("b"))
      .withColumn("sim", vec_dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") > 0.42)
      .select(col("a"), col("b"), round(col("sim") * 100).cast("long").as("sim_pct"))
      .orderBy("a", "b")
      .limit(2000)
  }

  val simKnnPerQuery: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val q = normed(s, d, "q", "vq", "nq").filter(col("q") < 10)
    val n = normed(s, d, "n", "vn", "nn")
    val w = Window.partitionBy("q").orderBy(col("s").desc, col("n"))
    q.join(n, col("q") =!= col("n"))
      .withColumn("s", vec_dot(col("vq"), col("vn")) / (col("nq") * col("nn")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("q", "n", "rn")
      .orderBy("q", "rn")
  }

  val textTokenCounts: Q = (s, d) =>
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok")
      .agg(cnt.as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(50)

  val textLangStats: Q = (s, d) =>
    documents(s, d)
      .groupBy("lang")
      .agg(cnt.as("n_docs"),
           sum(length(col("text")).cast("long")).cast("long").as("total_chars"),
           round(avg(size(split(col("text"), " ")).cast("long")) * 1000)
             .cast("long").as("avg_toks_milli"))
      .orderBy("lang")

  /** Asymmetric containment near-dup (quote/subset detection):
    * directed pairs where ≥ 70% of a's token set appears in b —
    * `|A∩B| / |A|`, which Jaccard's symmetric union normalization
    * cannot express (a short doc quoted inside a long one has high
    * containment but low Jaccard). Same blocked-join scale shape as
    * [[dedupNearJaccard]]; the per-pair kernel is the codegen'd
    * [[graft.functions.SortedOverlap]] merge pass. Directed: (a,b) and
    * (b,a) are distinct findings.
    */
  val textContainment: Q = (s, d) =>
    blockedTokenPairs(s, d, _ =!= _) // directed: (a,b) and (b,a) distinct
      .withColumn("cont",
        sorted_overlap(col("a_tk"), col("b_tk")).cast("double") / size(col("a_tk")))
      .filter(col("cont") >= 0.7)
      .select(col("a_id"), col("b_id"),
              round(col("cont") * 1000).cast("long").as("cont_milli"))
      .orderBy("a_id", "b_id")
      .limit(2000)

  /** Near-dup pairs → dedup CLUSTERS: connected components over the
    * `dedup_near_jaccard` pair graph, each doc labeled with its
    * component's minimum doc_id (the canonical survivor — "keep one
    * per cluster" is the actual dedup decision a pipeline executes;
    * pair lists are just its input). Iterative min-label propagation,
    * see [[Scale.connectedComponents]].
    */
  val dedupClusterCanonical: Q = (s, d) =>
    Scale.connectedComponents(dedupNearJaccard(s, d), "a_id", "b_id")
      .select(col("node").as("doc_id"), col("label").as("canonical_id"))
      .orderBy("doc_id")

  /** Keep-policy variant of [[dedupClusterCanonical]]: instead of the
    * minimum doc_id, each cluster keeps its HIGHEST-QUALITY member
    * (max n_chars, doc_id tiebreak) — the policy real corpus dedup
    * actually wants (drop the shorter/truncated duplicates). Same
    * component labels; one extra broadcast-sized argmax join. The
    * (n_chars, doc_id) lexicographic argmax is encoded as a single
    * integer key (n_chars·10⁶ + doc_id, exact while doc_id < 10⁶) so
    * the DuckDB oracle's max_by matches bit-for-bit.
    */
  val dedupClusterKeepBest: Q = (s, d) => {
    val labels = Scale.connectedComponents(dedupNearJaccard(s, d), "a_id", "b_id")
      .select(col("node").as("doc_id"), col("label"))
    val quality = documents(s, d).select(col("doc_id"), col("n_chars"))
    val withQ = labels.join(quality, "doc_id")
    val best = withQ.groupBy("label")
      .agg(max(col("n_chars") * 1000000L + col("doc_id")).as("bk"))
      .select(col("label"), pmod(col("bk"), lit(1000000L)).as("keep_id"))
    withQ.join(best, "label")
      .select(col("doc_id"), col("keep_id"))
      .orderBy("doc_id")
  }

  val multimodalJoin: Q = (s, d) =>
    documents(s, d)
      .join(embeddings(s, d), col("doc_id") === col("vec_id"))
      .select(col("lang"), col("label"), sqNorm(vecD(col("embedding"))).as("sq"))
      .groupBy("lang", "label")
      .agg(cnt.as("c"), round(sum(col("sq")) * 1000).cast("long").as("sq_milli"))
      .orderBy("lang", "label")

  val queries: Map[String, Q] = Map(
    "dedup_exact_hash" -> dedupExactHash,
    "dedup_near_jaccard" -> dedupNearJaccard,
    "sim_pairs_threshold" -> simPairsThreshold,
    "sim_knn_per_query" -> simKnnPerQuery,
    "text_token_counts" -> textTokenCounts,
    "text_lang_stats" -> textLangStats,
    "text_containment" -> textContainment,
    "dedup_cluster_canonical" -> dedupClusterCanonical,
    "dedup_cluster_keep_best" -> dedupClusterKeepBest,
    "multimodal_join" -> multimodalJoin,
  )
}
