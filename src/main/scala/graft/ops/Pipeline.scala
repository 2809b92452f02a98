package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.{minhash, simhash}
import graft.functions.VectorFunctions.{sorted_jaccard, vec_dot}
import graft.tables.Tables
import Util._

/** Training-data-pipeline operators (the 100 TB story): sketch-based
  * dedup (MinHash+LSH, SimHash), n-gram Jaccard, IVF-style ANN,
  * language ID, quality scoring, document fingerprinting, and
  * multimodal binary-column plumbing.
  *
  * Scale posture, per operator:
  *  - MinHash+LSH: candidate generation is a shuffle on (band, bucket)
  *    — linear in corpus size — replacing the blocked O(n²) join of
  *    `dedup_near_jaccard`; the exact-Jaccard verify runs only inside
  *    buckets. Band/row parameters (32×4) put recall at J≥0.9 above
  *    1−1e-15, so its output equals the exact join's and shares its
  *    oracle.
  *  - SimHash: one 64-bit key per document — the cheapest near-dup
  *    cluster key at 100 TB; Hamming-ball candidate pairs verified
  *    exactly.
  *  - IVF ANN: assignment partitions the corpus by nearest centroid;
  *    queries probe a fixed number of cells, turning brute-force O(n)
  *    per query into O(n/cells · nprobe).
  */
object Pipeline {

  private def documents(s: SparkSession, d: String)  = Tables.t(s, d, "documents")
  private def embeddings(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")

  /** Ordered tokens (shingling needs order; corpus docs have ≥10 tokens). */
  private val toks = split(col("text"), " ")

  // ---- sketch-based dedup ------------------------------------------------

  private val NumHashes = 128
  private val Bands = 32
  private val RowsPerBand = 4

  /** MinHash + LSH banding + exact verify. Output: the same pair set as
    * `dedup_near_jaccard` (recall ≈ 1 at these parameters — asserted by
    * PipelineSpec), produced without the quadratic block join.
    */
  val dedupMinhashLsh: Q = (s, d) => {
    val docs = documents(s, d).select(
      col("doc_id"), col("lang"), col("source"),
      array_sort(array_distinct(toks)).as("tk"))
    // Band phase shuffles only (id, block, band, bucket) — never the
    // token arrays — and candidate pairs are dedup'd as bare id pairs
    // before the arrays are joined back for the verify.
    val banded = docs
      .withColumn("sig", minhash(col("tk"), NumHashes))
      .select(col("doc_id"), col("lang"), col("source"),
              posexplode(transform(sequence(lit(0), lit(Bands - 1)),
                b => hash(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)))))
                .as(Seq("band_idx", "band_key")))
    val a = banded.select(col("doc_id").as("a_id"), col("lang"), col("source"),
                          col("band_idx"), col("band_key"))
    val b = banded.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
                          col("source").as("b_source"), col("band_idx").as("b_bi"),
                          col("band_key").as("b_bk"))
    val candidates = a
      .join(b, col("lang") === col("b_lang") && col("source") === col("b_source") &&
               col("band_idx") === col("b_bi") && col("band_key") === col("b_bk") &&
               col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    candidates
      .join(docs.select(col("doc_id").as("a_id"), col("tk").as("a_tk")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("tk").as("b_tk")), "b_id")
      .filter(sorted_jaccard(col("a_tk"), col("b_tk")) >= 0.9)
      .select("a_id", "b_id")
      .orderBy("a_id", "b_id")
      .limit(2000)
  }

  /** SimHash near-dup: one 64-bit sketch per doc, Hamming ≤ 16 within
    * (lang, source) blocks as the candidate filter, exact Jaccard ≥ 0.9
    * as the verify. No SQL oracle (the sketch is engine-specific);
    * PipelineSpec asserts the verified output equals the exact join's.
    */
  val dedupSimhash: Q = (s, d) => {
    val base = documents(s, d).select(
      col("doc_id"), col("lang"), col("source"),
      array_sort(array_distinct(toks)).as("tk"))
      .withColumn("sh", simhash(col("tk")))
    val a = base.select(col("doc_id").as("a_id"), col("lang"), col("source"),
                        col("tk").as("a_tk"), col("sh").as("a_sh"))
    val b = base.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
                        col("source").as("b_source"), col("tk").as("b_tk"),
                        col("sh").as("b_sh"))
    a.join(b, col("lang") === col("b_lang") && col("source") === col("b_source") &&
              col("a_id") < col("b_id"))
      .filter(bit_count(col("a_sh").bitwiseXOR(col("b_sh"))) <= 16)
      .filter(sorted_jaccard(col("a_tk"), col("b_tk")) >= 0.9)
      .select("a_id", "b_id")
      .orderBy("a_id", "b_id")
      .limit(2000)
  }

  /** 3-gram shingle Jaccard ≥ 0.8 within (lang, source) blocks —
    * order-sensitive near-dup (token-set Jaccard misses reorderings;
    * shingles don't).
    */
  val dedupNgramJaccard: Q = (s, d) => {
    val sh = documents(s, d).select(
      col("doc_id"), col("lang"), col("source"),
      array_sort(array_distinct(
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
                         element_at(toks, i + 2))))).as("sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("lang"), col("source"),
                      col("sh").as("a_sh"))
    val b = sh.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
                      col("source").as("b_source"), col("sh").as("b_sh"))
    a.join(b, col("lang") === col("b_lang") && col("source") === col("b_source") &&
              col("a_id") < col("b_id"))
      .filter(sorted_jaccard(col("a_sh"), col("b_sh")) >= 0.8)
      .select("a_id", "b_id")
      .orderBy("a_id", "b_id")
      .limit(2000)
  }

  /** Embedding-cosine near-dup: document pairs (same language) whose
    * embeddings exceed the similarity threshold — the semantic-dedup
    * member of the dedup family (exact / MinHash / SimHash / n-gram /
    * embedding). Threshold per SURVEY §2.1-R5 (0.42 sits in a measured
    * gap of the distribution).
    */
  val dedupEmbeddingCosine: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"), col("lang"))
    val v = embeddings(s, d).select(col("vec_id"), col("embedding").as("ve"))
      .withColumn("nv", sqrt(vec_dot(col("ve"), col("ve"))))
      .join(docs, col("vec_id") === col("doc_id"))
    val a = v.select(col("doc_id").as("a_id"), col("lang"),
                     col("ve").as("va"), col("nv").as("na"))
    val b = v.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
                     col("ve").as("vb"), col("nv").as("nb"))
    a.join(b, col("lang") === col("b_lang") && col("a_id") < col("b_id"))
      .withColumn("sim", vec_dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") > 0.42)
      .select(col("a_id"), col("b_id"),
              round(col("sim") * 100).cast("long").as("sim_pct"))
      .orderBy("a_id", "b_id")
      .limit(2000)
  }

  // ---- similarity search: IVF + LSH --------------------------------------

  /** IVF-style ANN: centroids = vectors with id < 16 (a deterministic
    * stand-in for k-means output), every vector assigned to its nearest
    * centroid cell, queries (id < 10) probe their 4 nearest cells and
    * rank candidates exactly. The cell assignment is the partitioning
    * story at scale: each cell is a partition, a query touches nprobe
    * of them.
    */
  val annIvfTopk: Q = (s, d) => {
    val v = embeddings(s, d).select(col("vec_id"), col("embedding").as("ve"))
      .withColumn("nv", sqrt(vec_dot(col("ve"), col("ve"))))
    val c = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("ve").as("ce"), col("nv").as("nc"))
    val assign = v.join(broadcast(c), lit(true))
      .withColumn("s", vec_dot(col("ve"), col("ce")) / (col("nv") * col("nc")))
      .groupBy("vec_id")
      .agg(expr("max_by(cid, s)").as("cell"))
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("ve").as("qe"), col("nv").as("nq"))
    val wp = Window.partitionBy("qid").orderBy(col("ps").desc, col("cid"))
    val probes = q.join(broadcast(c), lit(true))
      .withColumn("ps", vec_dot(col("qe"), col("ce")) / (col("nq") * col("nc")))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= 4)
      .select("qid", "cid")
    val cand = q.join(broadcast(probes), Seq("qid"))
      .join(assign, col("cell") === col("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .join(v.select(col("vec_id"), col("ve").as("ne"), col("nv").as("nn")), Seq("vec_id"))
      .withColumn("s", vec_dot(col("qe"), col("ne")) / (col("nq") * col("nn")))
    val wr = Window.partitionBy("qid").orderBy(col("s").desc, col("vec_id"))
    cand
      .withColumn("rn", row_number().over(wr).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("qid").as("q"), col("vec_id").as("n"), col("rn"))
      .orderBy("q", "rn")
  }

  /** Random-hyperplane LSH ANN — the bucketed cosine scale path
    * alongside IVF: 4 fixed hyperplanes give a 4-bit sign bucket per
    * vector; queries probe their own bucket plus the 4 Hamming-1
    * neighbours, then rerank candidates exactly. No SQL oracle (the
    * hyperplane family is engine-side); PipelineSpec checks structure
    * and measures recall vs brute force — NOTE this corpus is
    * near-random (max cosine ≈ 0.51, FIXTURES.md), the regime where
    * sign-LSH recall is weakest; on clustered real embeddings the same
    * operator's recall rises with similarity.
    */
  val annLshTopk: Q = (s, d) => {
    val dims = 64
    val planes: Seq[Seq[Double]] = Seq.tabulate(4) { i =>
      Seq.tabulate(dims) { j =>
        // deterministic pseudo-random direction in [-1, 1)
        val z = graft.functions.TokenHash.mix64(i.toLong * dims + j)
        z.toDouble / Long.MaxValue.toDouble
      }
    }
    def bucketOf(v: org.apache.spark.sql.Column) =
      planes.zipWithIndex.map { case (p, i) =>
        when(vec_dot(v, typedLit(p)) >= 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    val v = embeddings(s, d).select(col("vec_id"), col("embedding").as("ve"))
      .withColumn("nv", sqrt(vec_dot(col("ve"), col("ve"))))
      .withColumn("bucket", bucketOf(col("ve")))
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("ve").as("qe"), col("nv").as("nq"),
              explode(array(col("bucket"), col("bucket").bitwiseXOR(1),
                            col("bucket").bitwiseXOR(2), col("bucket").bitwiseXOR(4),
                            col("bucket").bitwiseXOR(8))).as("probe"))
    val wr = Window.partitionBy("qid").orderBy(col("s").desc, col("vec_id"))
    q.join(v, col("probe") === col("bucket") && col("vec_id") =!= col("qid"))
      .withColumn("s", vec_dot(col("qe"), col("ve")) / (col("nq") * col("nv")))
      .withColumn("rn", row_number().over(wr).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("qid").as("q"), col("vec_id").as("n"), col("rn"))
      .orderBy("q", "rn")
  }

  // ---- text analysis -----------------------------------------------------

  private val markers = Seq(
    "en" -> Seq("table", "query", "join"),
    "de" -> Seq("window", "group", "sort"),
    "es" -> Seq("scan", "filter", "merge"),
    "fr" -> Seq("stream", "batch", "row"),
    "zh" -> Seq("vector", "hash", "key"))

  /** Marker-token language ID (the stopword-profile heuristic shape):
    * per-language marker counts, argmax with a fixed tiebreak order.
    * Output: confusion counts actual × predicted.
    */
  val textLangid: Q = (s, d) => {
    def score(ms: Seq[String]) =
      size(filter(toks, t => t.isin(ms.map(lit(_)): _*)))
    val scored = documents(s, d).select(
      col("lang") +: markers.map { case (l, ms) => score(ms).as(s"s_$l") }: _*)
    val predicted =
      when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
           col("s_de") >= col("s_fr") && col("s_de") >= col("s_zh"), "de")
        .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
              col("s_en") >= col("s_zh"), "en")
        .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), "es")
        .when(col("s_fr") >= col("s_zh"), "fr")
        .otherwise("zh")
    scored.select(col("lang"), predicted.as("predicted"))
      .groupBy("lang", "predicted")
      .agg(cnt.as("c"))
      .orderBy("lang", "predicted")
  }

  /** Quality scoring: doc-length saturation + stopword-density terms,
    * integer-milli per doc (R2-safe), aggregated per language.
    */
  val textQualityScore: Q = (s, d) => {
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin("a", "the")))
    val qualityMilli = round(lit(1000) *
      (lit(0.5) * (least(nTok, lit(50)) / lit(50.0)) +
       lit(0.5) * (lit(1.0) - nStop * lit(1.0) / nTok))).cast("long")
    documents(s, d)
      .select(col("lang"), qualityMilli.as("qm"))
      .groupBy("lang")
      .agg(cnt.as("n_docs"), sum(col("qm")).cast("long").as("quality_milli"))
      .orderBy("lang")
  }

  /** Token counting with a BPE-ish regex (word pieces + standalone
    * punctuation) instead of whitespace split — the tokenizer-shaped
    * counterpart of `text_token_counts`. On this corpus (no
    * punctuation) the piece set matches the whitespace tokens; on real
    * text the regex splits punctuation into its own pieces.
    */
  val textTokenBpe: Q = (s, d) =>
    documents(s, d)
      .select(explode(expr("regexp_extract_all(text, '\\\\w+|[^\\\\w\\\\s]', 0)")).as("piece"))
      .groupBy("piece")
      .agg(cnt.as("c"))
      .orderBy(col("c").desc, col("piece"))
      .limit(50)

  /** Document fingerprinting: whole-doc content hash + min-shingle
    * fingerprint (the MinHash-1 / winnowing shape over a rolling 3-gram
    * window).
    */
  val textFingerprint: Q = (s, d) =>
    documents(s, d).select(
      col("doc_id"),
      md5(col("text")).as("fp"),
      array_min(
        transform(sequence(lit(1), size(toks) - 2),
          i => md5(concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
                             element_at(toks, i + 2))))).as("fp_shingle"))
      .orderBy("doc_id")
      .limit(500)

  // ---- multimodal binary columns -----------------------------------------

  /** Multimodal plumbing: text → opaque `binary` payload column (the
    * image/audio stand-in) → per-partition batch "decode" via typed
    * `mapPartitions` — the real Spark shape for a media decoder (schema,
    * batching, partition-level processing). The decode itself is a
    * clearly-marked DETERMINISTIC FAKE (no media libs in this
    * environment): features are arithmetic on byte length + doc id. A
    * real deployment swaps `fakeDecode` for the actual codec; nothing
    * else changes.
    */
  val multimodalDecode: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    // STUB decoder: deterministic fake standing in for image decode.
    def fakeDecode(docId: Long, payload: Array[Byte]): (Long, Long, Long, Long, Long) = {
      val nBytes = payload.length.toLong
      val width = nBytes % 64 + 1
      val height = (nBytes / 64) % 64 + 1
      val meanPx = (docId * 7 + nBytes) % 256
      (docId, nBytes, width, height, meanPx)
    }
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => fakeDecode(id, bytes) })
      .toDF("doc_id", "n_bytes", "width", "height", "mean_px")
      .orderBy("doc_id")
      .limit(500)
  }

  val queries: Map[String, Q] = Map(
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_embedding_cosine" -> dedupEmbeddingCosine,
    "ann_ivf_topk" -> annIvfTopk,
    "ann_lsh_topk" -> annLshTopk,
    "text_langid" -> textLangid,
    "text_quality_score" -> textQualityScore,
    "text_token_bpe" -> textTokenBpe,
    "text_fingerprint" -> textFingerprint,
    "multimodal_decode" -> multimodalDecode,
  )
}
