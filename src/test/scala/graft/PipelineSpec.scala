package graft

import org.apache.spark.sql.functions._

/** Pipeline-operator tests: the sketch-based dedups must reproduce the
  * exact blocked-Jaccard join's pair set (recall 1 at these parameters
  * on this corpus), ANN results must be a subset-consistent ranking,
  * and the text/multimodal operators must be deterministic.
  */
class PipelineSpec extends SparkSpecBase {

  private def pairs(name: String): Set[(Long, Long)] =
    q(name).collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet

  test("minhash-LSH verified pairs == exact blocked-Jaccard pairs") {
    assert(pairs("dedup_minhash_lsh") == pairs("dedup_near_jaccard"))
  }

  test("simhash verified pairs == exact blocked-Jaccard pairs (this corpus)") {
    assert(pairs("dedup_simhash") == pairs("dedup_near_jaccard"))
  }

  test("banded ngram pairs == exact shingle-Jaccard pairs, with no BNLJ in the plan") {
    assert(pairs("dedup_ngram_banded") == pairs("dedup_ngram_jaccard"))
    val p = q("dedup_ngram_banded").queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(400))
  }

  test("incremental ingest == full recompute's pairs involving the batch; CDC-bounded work") {
    import graft.ops.IncrementalDedup
    import graft.sinks.CowTable
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_spec").toString
    val corpus = s"$dir/corpus"; val index = s"$dir/index"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "source", "text")
    val batch = docs.filter(col("doc_id") % 5 === 0)
    CowTable.create(docs.filter(col("doc_id") % 5 =!= 0), corpus)
    IncrementalDedup.buildIndex(spark, corpus, index, Seq("lang", "source"))
    val v1 = CowTable.currentVersion(corpus)
    CowTable.merge(spark, corpus, batch, "doc_id")
    val v2 = CowTable.currentVersion(corpus)
    // the CDC feed the ingest consumes carries EXACTLY the batch rows —
    // work is bounded by the changed files, never the corpus
    assert(CowTable.changes(spark, corpus, "doc_id", v1, v2).count() == batch.count())
    val flagged = IncrementalDedup.ingest(spark, corpus, index, Seq("lang", "source"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // == the full recompute restricted to pairs involving a batch doc
    // (dedup_near_jaccard is the exact blocked-Jaccard join, J >= 0.9)
    val full = pairs("dedup_near_jaccard")
    val expected = full.filter { case (a, b) => a % 5 == 0 || b % 5 == 0 }
    assert(flagged == expected, s"flagged ${flagged.size} vs expected ${expected.size}")
    assert(flagged.nonEmpty, "batch should contain known near-dups on this corpus")
    // idempotence: nothing changed since -> empty result, version stays
    assert(IncrementalDedup.ingest(spark, corpus, index, Seq("lang", "source")).count() == 0)
    // update path: rewrite one non-batch doc's text to duplicate another
    // doc -> next ingest flags exactly that new pair; stale bands of the
    // old text are replaced, so no pair from the OLD content appears
    val pair = expected.head
    val target = docs.filter(col("doc_id") % 5 =!= 0)
      .filter(!col("doc_id").isin(pair._1, pair._2))
      .orderBy("doc_id").limit(1).collect().head
    val src = docs.filter(col("doc_id") === pair._1).collect().head
    import spark.implicits._
    val upd = Seq((target.getLong(0), src.getString(1), src.getString(2), src.getString(3)))
      .toDF("doc_id", "lang", "source", "text")
    CowTable.merge(spark, corpus, upd, "doc_id")
    val flagged2 = IncrementalDedup.ingest(spark, corpus, index, Seq("lang", "source"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tid = target.getLong(0)
    assert(flagged2.nonEmpty && flagged2.forall { case (a, b) => a == tid || b == tid },
      s"update ingest must flag only pairs involving the updated doc: $flagged2")
    assert(flagged2.exists { case (a, b) => a == pair._1 || b == pair._1 },
      "the updated doc must pair with its new duplicate source")
    // delete path: removing the updated doc leaves no trace in output
    CowTable.delete(spark, corpus, s"doc_id = $tid")
    assert(IncrementalDedup.ingest(spark, corpus, index, Seq("lang", "source")).count() == 0)
  }

  test("staged ingest: marker advances only on commit; pre-commit crash re-derives pairs") {
    import graft.ops.IncrementalDedup
    import graft.sinks.CowTable
    val dir = java.nio.file.Files.createTempDirectory("inc_staged_spec").toString
    val corpus = s"$dir/corpus"; val index = s"$dir/index"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "source", "text")
    CowTable.create(docs.filter(col("doc_id") % 5 =!= 0), corpus)
    IncrementalDedup.buildIndex(spark, corpus, index, Seq("lang", "source"))
    CowTable.merge(spark, corpus, docs.filter(col("doc_id") % 5 === 0), "doc_id")
    val st1 = IncrementalDedup.ingestStaged(spark, corpus, index, Seq("lang", "source"))
    val p1 = st1.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1.nonEmpty)
    // "crash" before commit: the marker never advanced, so a retry
    // re-derives the SAME CDC window and the SAME pairs (the index
    // re-merge is an idempotent upsert) — the ADVICE r9 lost-pairs
    // window is gone
    val st2 = IncrementalDedup.ingestStaged(spark, corpus, index, Seq("lang", "source"))
    val p2 = st2.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 == p1, s"retry must re-derive identical pairs: ${p2.size} vs ${p1.size}")
    st2.commit()
    // committed: the window is consumed
    assert(IncrementalDedup.ingest(spark, corpus, index, Seq("lang", "source")).isEmpty)
  }

  test("selfPairs equals the exact blocked-Jaccard pairs of its batch") {
    import graft.ops.IncrementalDedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), concat_ws("", col("lang"), col("source")).as("block"),
              col("text"))
    val sp = IncrementalDedup.selfPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sp == pairs("dedup_near_jaccard"),
      s"selfPairs ${sp.size} vs exact ${pairs("dedup_near_jaccard").size}")
  }

  test("index compaction: >1,000 deletes clear without a rebuild; probes stay exact") {
    import graft.ops.IncrementalDedup
    import graft.sinks.CowTable
    val dir = java.nio.file.Files.createTempDirectory("inc_compact_spec").toString
    val corpus = s"$dir/corpus"; val index = s"$dir/index"
    // 2,500 docs over a 50k vocabulary (random pairs share ~0 tokens)
    val tokExpr = "transform(sequence(0, 29), j -> concat('w', cast(" +
      "pmod(cast(conv(substring(md5(concat(doc_id, '_', j)), 1, 8), 16, 10) as bigint), 50000) as string)))"
    val base = spark.range(2500L).select(col("id").as("doc_id"),
        lit("en").as("lang"), lit("web").as("source"))
      .withColumn("text", array_join(expr(tokExpr), " "))
    CowTable.create(base.repartition(4), corpus)
    IncrementalDedup.buildIndex(spark, corpus, index, Seq("lang", "source"))
    // delete 1,200 docs — beyond the retired 1,000-id literal bound
    CowTable.delete(spark, corpus, "doc_id >= 1000 AND doc_id < 2200")
    assert(IncrementalDedup.ingest(spark, corpus, index, Seq("lang", "source")).isEmpty)
    // the LOGICAL index already tracks the corpus (MoR sidecar applied)
    val corpusN = CowTable.read(spark, corpus).count()
    assert(CowTable.read(spark, index).count() == corpusN,
      "MoR delete must retire stale index rows logically, unbounded")
    // compaction folds the sidecars: the PHYSICAL rows track too
    IncrementalDedup.compactIndex(spark, corpus, index)
    assert(spark.read.parquet(CowTable.snapshotFiles(index): _*).count() == corpusN,
      "compactIndex must physically retire stale rows")
    // probes stay exact: a new near-copy of a SURVIVING doc flags its
    // pair; one of a DELETED doc flags nothing
    val t7 = base.filter(col("doc_id") === 7L).select("text").collect().head.getString(0)
    val t1500 = base.filter(col("doc_id") === 1500L).select("text").collect().head.getString(0)
    import spark.implicits._
    CowTable.merge(spark, corpus, Seq(
      (5000L, "en", "web", t7), (5001L, "en", "web", t1500))
      .toDF("doc_id", "lang", "source", "text"), "doc_id")
    val flagged = IncrementalDedup.ingest(spark, corpus, index, Seq("lang", "source"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == Set((7L, 5000L)),
      s"post-compaction probe must flag exactly the surviving pair: $flagged")
  }

  test("ngram jaccard pairs are a subset of token-set jaccard candidates' blocks") {
    val ng = pairs("dedup_ngram_jaccard")
    assert(ng.nonEmpty)
    assert(ng.forall { case (a, b) => a < b })
  }

  test("banded simhash == blocked pairwise on a tight-near-dup corpus (recall-1 regime)") {
    import graft.functions.HashFunctions.simhash
    import graft.functions.VectorFunctions.sorted_jaccard
    // 200 clusters x 2 docs: 98 shared tokens + 2 unique per doc
    // (pair Jaccard = 98/102 ~ 0.96; cross-cluster Jaccard = 0)
    val docs = spark.range(400).select(
      col("id").as("doc_id"),
      lit("b").as("block"),
      array_sort(array_distinct(concat(
        transform(sequence(lit(0), lit(97)),
          j => concat_ws("_", lit("w"), floor(col("id") / 2), j)),
        array(concat(lit("u"), col("id"), lit("_1")),
              concat(lit("u"), col("id"), lit("_2")))))).as("tk"))
      .cache()
    val banded = graft.ops.Pipeline
      .simhashBandedDf(docs, bands = 4, maxHamming = 3, jaccard = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: all pairs in the block, same verify predicates
    val a = docs.select(col("doc_id").as("a_id"), col("tk").as("a_tk"))
      .withColumn("a_sh", simhash(col("a_tk")))
    val b = docs.select(col("doc_id").as("b_id"), col("tk").as("b_tk"))
      .withColumn("b_sh", simhash(col("b_tk")))
    val exact = a.join(b, col("a_id") < col("b_id"))
      .filter(bit_count(col("a_sh").bitwiseXOR(col("b_sh"))) <= 3)
      .filter(sorted_jaccard(col("a_tk"), col("b_tk")) >= 0.9)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(exact.nonEmpty, "synthetic corpus produced no tight pairs")
    assert(banded == exact)
    docs.unpersist()
  }

  test("dedup clustering: pair endpoints share a label; canonical is the component min") {
    val labels = q("dedup_cluster_canonical").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    val prs = pairs("dedup_near_jaccard")
    assert(prs.nonEmpty)
    prs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (canonical, members) =>
      assert(members.keys.min == canonical,
        s"canonical $canonical is not the min of its cluster")
    }
  }

  test("ann_ivf_topk: 3 ranked neighbours per query, no self-matches") {
    val rows = q("ann_ivf_topk").collect()
    val byQ = rows.groupBy(_.getAs[Long]("q"))
    assert(byQ.size == 10)
    assert(byQ.values.forall(_.length == 3))
    assert(rows.forall(r => r.getAs[Long]("q") != r.getAs[Long]("n")))
  }

  test("ann_ivf recall vs brute-force top-3 is high on this corpus") {
    val ivf = q("ann_ivf_topk").collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("n"))).toSet
    val exact = q("sim_knn_per_query").collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("n"))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("ann_lsh_topk: valid ranked output, no self-matches, measured recall") {
    val rows = q("ann_lsh_topk").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("q") != r.getAs[Long]("n")))
    val byQ = rows.groupBy(_.getAs[Long]("q"))
    assert(byQ.values.forall(g => g.map(_.getAs[Long]("rn")).sorted.toSeq ==
      (1L to g.length).toSeq))
    // recall vs brute force is informational on this near-random corpus
    // (max cosine ~0.51 — the weakest regime for sign-LSH); just require
    // the probe found SOME true top-3 neighbours overall
    val exact = q("sim_knn_per_query").collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("n"))).toSet
    val lsh = rows.map(r => (r.getAs[Long]("q"), r.getAs[Long]("n"))).toSet
    assert(lsh.intersect(exact).nonEmpty)
  }

  test("sign-LSH 16 bits + multiprobe radius 2: recall >= 0.8 on clustered corpus") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.vec_dot
    val dims = 64
    val corpus = graft.ops.Pipeline
      .clusteredCorpus(spark, n = 2000, clusters = 50, dims = dims, noise = 0.05)
      .cache()
    val nQ = 20
    val lsh = graft.ops.Pipeline
      .lshTopkDf(corpus, col("vec_id") < nQ, dims, bits = 16, radius = 2, k = 3)
      .collect().map(r => (r.getAs[Long]("q"), r.getAs[Long]("n"))).toSet
    // brute-force truth
    val v = corpus.select(col("vec_id"), col("ve"))
    val q = v.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("ve").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("s").desc, col("vec_id"))
    val exact = q.join(v, col("vec_id") =!= col("qid"))
      .withColumn("s", vec_dot(col("qe"), col("ve")) /
        (sqrt(vec_dot(col("qe"), col("qe"))) * sqrt(vec_dot(col("ve"), col("ve")))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"clustered-corpus LSH recall too low: $recall")
    corpus.unpersist()
  }

  test("dedup_embedding_cosine pairs are same-language and above threshold") {
    val rows = q("dedup_embedding_cosine").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("sim_pct") >= 42))
  }

  test("langid confusion counts sum to doc count") {
    val total = q("text_langid").agg(sum("c")).collect().head.getLong(0)
    assert(total == graft.tables.Tables.t(spark, sf, "documents").count())
  }

  test("quality scores bounded: 0 <= per-doc milli <= 1000 implies sum bound") {
    val rows = q("text_quality_score").collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val s = r.getAs[Long]("quality_milli")
      assert(s >= 0 && s <= 1000 * n)
    }
  }

  test("fingerprints: md5 hex shape, min-shingle <= any shingle") {
    val rows = q("text_fingerprint").collect()
    assert(rows.forall(_.getAs[String]("fp").matches("[0-9a-f]{32}")))
    assert(rows.forall(_.getAs[String]("fp_shingle").matches("[0-9a-f]{32}")))
  }

  test("multimodal decode: n_bytes equals text byte length; dims in range") {
    val rows = q("multimodal_decode").collect()
    assert(rows.forall { r =>
      val w = r.getAs[Long]("width"); val h = r.getAs[Long]("height")
      w >= 1 && w <= 64 && h >= 1 && h <= 64
    })
    val d = graft.tables.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("nb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => r.getAs[Long]("n_bytes") == d(r.getAs[Long]("doc_id"))))
  }

  test("decontamination: contaminated is a subset of the train split") {
    val rows = q("decontaminate_ngram").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Long]("n_train"); val c = r.getAs[Long]("n_contaminated")
      assert(c >= 0 && c <= t, s"lang ${r.getAs[String]("lang")}: $c of $t")
    }
  }

  test("int8 quantization: components bounded, max component hits ±127") {
    val rows = q("embedding_quantize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mn = r.getAs[Long]("q_min"); val mx = r.getAs[Long]("q_max")
      assert(mn >= -127 && mx <= 127)
      // scale = 127/max|x|: the largest-magnitude component quantizes
      // to exactly ±127
      assert(mx == 127 || mn == -127, s"vec ${r.getAs[Long]("vec_id")}: [$mn,$mx]")
    }
  }

  test("cluster census accounts for every vector exactly once") {
    val total = q("embedding_cluster_sizes").agg(sum("n_vecs")).collect().head.getLong(0)
    assert(total == graft.tables.Tables.t(spark, sf, "embeddings").count())
  }

  test("shuffle shards are balanced round-robin over the whole corpus") {
    val rows = q("corpus_shuffle_shards").collect()
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(rows.map(_.getAs[Long]("shard")).toSet == (0L until 16L).toSet)
    assert(counts.max - counts.min <= 1, s"unbalanced: ${counts.toSeq}")
    assert(counts.sum == graft.tables.Tables.t(spark, sf, "documents").count())
  }

  test("windowed top-k emits at most k rows per window, ranked contiguously") {
    val rows = q("stream_topk_per_day").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Date]("w")).values.foreach { g =>
      assert(g.length <= 2)
      assert(g.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to g.length).toSeq)
    }
  }
}
