package graft

import org.apache.spark.sql.functions._

import graft.ops.IvfIndex
import graft.sinks.CowTable

/** Persistent IVF ANN index (round 12): the served index equals the
  * per-invocation query form, incremental refresh equals a full
  * reassignment under the frozen centroids, and drift past the
  * threshold re-seeds.
  */
class IvfIndexSpec extends SparkSpecBase {

  private def tmp = java.nio.file.Files.createTempDirectory("graft_ivf").toString

  // deterministic synthetic corpus: 8-dim positive vectors
  private def vecOf(i: Long): Array[Double] =
    Array.tabulate(8)(j => math.abs(math.sin(i.toDouble * 7 + j)) + 0.1)

  private def mkCorpus(path: String, n: Long): Unit = {
    import spark.implicits._
    CowTable.create((0L until n).map(i => (i, vecOf(i)))
      .toDF("vec_id", "ve").repartition(4), path)
  }

  private def assignRows(aPath: String): Seq[(Long, Long)] =
    CowTable.read(spark, aPath).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).sorted.toSeq

  test("served probe == per-invocation ann_ivf_topk (same index, same rows)") {
    val persistent = q("ann_ivf_persistent").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val perCall = q("ann_ivf_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(persistent == perCall)
    assert(persistent.nonEmpty)
  }

  test("refresh: upserts + deletes converge to full reassignment under frozen centroids") {
    import spark.implicits._
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    mkCorpus(corpus, 200L)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 4, iters = 2)
    val centroidsBefore = CowTable.read(spark, s"$index/centroids")
      .select("cid").as[Long].collect().sorted.toSeq

    // delta: 10 updates (vectors move mildly), 5 inserts, 7 deletes
    CowTable.merge(spark, corpus,
      (0L until 10L).map(i => (i * 3, vecOf(i * 3 + 1000)))
        .toDF("vec_id", "ve"), "vec_id")
    CowTable.append(spark, corpus,
      (500L until 505L).map(i => (i, vecOf(i))).toDF("vec_id", "ve"))
    CowTable.deleteMorKeys(spark, corpus,
      (100L until 107L).map(Tuple1(_)).toDF("vec_id"), "vec_id")

    val r = IvfIndex.refresh(spark, corpus, index, maxDrift = 1e9)
    assert(!r.rebuilt, "mild delta must not re-seed")
    assert(r.toVersion == CowTable.currentVersion(corpus))
    assert(IvfIndex.indexedVersion(index) == r.toVersion, "marker advances")
    // centroids FROZEN across the refresh
    assert(CowTable.read(spark, s"$index/centroids")
      .select("cid").as[Long].collect().sorted.toSeq == centroidsBefore)

    // the refresh invariant: assign table == argmax-cosine assignment
    // of EVERY live vector under the stored centroids
    val full = IvfIndex.assignTo(
      IvfIndex.withNorm(CowTable.read(spark, corpus).select(col("vec_id"), col("ve"))),
      CowTable.read(spark, s"$index/centroids"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell")))
      .sorted.toSeq
    assert(assignRows(s"$index/assign") == full)
    assert(!full.exists(t => t._1 >= 100L && t._1 < 107L), "deleted ids gone")
    assert(full.exists(_._1 == 504L), "inserted ids present")

    // a second refresh with no corpus movement is a no-op
    val r2 = IvfIndex.refresh(spark, corpus, index, maxDrift = 1e9)
    assert(!r2.rebuilt && r2.toVersion == r.toVersion)
  }

  test("refresh on a PQ index: the window re-encodes under FROZEN codebooks; drift re-seed retrains") {
    import spark.implicits._
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    mkCorpus(corpus, 240L)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 4, iters = 2,
      pq = 4, pqCodes = 16)
    def cbRows(): Seq[(Int, Int, Seq[Double])] =
      CowTable.read(spark, s"$index/codebooks").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
        .sortBy(t => (t._1, t._2)).toSeq
    val cbBefore = cbRows()
    // incremental window: updates move, inserts arrive, deletes retire
    CowTable.merge(spark, corpus,
      (0L until 8L).map(i => (i * 3, vecOf(i * 3 + 900))).toDF("vec_id", "ve"),
      "vec_id")
    CowTable.append(spark, corpus,
      (600L until 606L).map(i => (i, vecOf(i))).toDF("vec_id", "ve"))
    CowTable.deleteMorKeys(spark, corpus,
      (50L until 55L).map(Tuple1(_)).toDF("vec_id"), "vec_id")
    val r = IvfIndex.refresh(spark, corpus, index, maxDrift = 1e9, numCells = 4)
    assert(!r.rebuilt, "mild delta must not re-seed a PQ index")
    assert(cbRows() == cbBefore, "codebooks FROZEN across an incremental window")
    // every live row's STORED codes == the codegen encode of its float
    // vector under the FROZEN books (the window re-encoded only its own
    // rows, yet the whole table remains one consistent encoding)
    val (m, ks) = (4, 16)
    val byCode: Map[Int, Map[Int, Seq[Double]]] =
      cbBefore.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val dsub = cbBefore.head._3.size
    val encFlat = (0 until m).flatMap(s => (0 until ks).flatMap(c =>
      byCode(s).getOrElse(c, Seq.fill(dsub)(Double.PositiveInfinity)))).toArray
    val expected = CowTable.read(spark, corpus)
      .select(col("vec_id"), graft.functions.VectorFunctions.pq_encode(
        col("ve").cast("array<double>"), m, ks, dsub, encFlat).as("exp"))
    val stored = CowTable.read(spark, s"$index/assign")
      .select(col("vec_id"), col("pqc"))
    assert(stored.count() == expected.count())
    assert(stored.join(expected, Seq("vec_id"))
      .filter(expr("pqc <> exp")).count() == 0L,
      "stored codes must equal frozen-book encode for every live vector")
    // DRIFT: move essentially every vector far away — the gate re-seeds
    // and the re-seed RETRAINS the codebooks on the new distribution
    CowTable.merge(spark, corpus,
      (0L until 240L).map(i => (i, vecOf(i + 50000).map(_ * 5)))
        .toDF("vec_id", "ve"), "vec_id")
    val r2 = IvfIndex.refresh(spark, corpus, index, maxDrift = 0.01, numCells = 4)
    assert(r2.rebuilt, s"wholesale movement must trip the drift gate: $r2")
    assert(cbRows() != cbBefore, "a drift re-seed retrains the codebooks")
    assert(IvfIndex.indexedVersion(index) == CowTable.currentVersion(corpus))
  }

  test("ivfIngestStream: live vector upserts maintain the served index end-to-end") {
    // the streaming face (Sinks.ivfIngestStream): batch 1 bootstraps
    // corpus + index; batch 2's upserts + inserts fold via refresh.
    // Invariants after the stream drains: marker == corpus version,
    // and the assign table == argmax assignment of every live vector
    // under the stored centroids (refresh's parity law) — i.e. the
    // live-maintained index serves exactly what a rebuild would,
    // modulo centroid freezing.
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    val stream = MemoryStream[(Long, Array[Double])]
    val q = graft.sinks.Sinks.ivfIngestStream(
      stream.toDF().toDF("vec_id", "ve"), corpus, index,
      checkpoint = s"$dir/cp", numCells = 4, iters = 2, maxDrift = 1e9)
    try {
      stream.addData((0L until 120L).map(i => (i, vecOf(i))))
      q.processAllAvailable()
      assert(IvfIndex.exists(index), "first batch bootstraps the index")
      val centroids0 = CowTable.read(spark, s"$index/centroids")
        .select("cid").as[Long].collect().sorted.toSeq
      // batch 2: 6 vectors move, 4 new arrive
      stream.addData((0L until 6L).map(i => (i * 11, vecOf(i * 11 + 2000))) ++
        (200L until 204L).map(i => (i, vecOf(i))))
      q.processAllAvailable()
      assert(IvfIndex.indexedVersion(index) == CowTable.currentVersion(corpus),
        "index marker tracks the corpus head")
      // centroids frozen across the streamed refresh window
      assert(CowTable.read(spark, s"$index/centroids")
        .select("cid").as[Long].collect().sorted.toSeq == centroids0)
      val full = IvfIndex.assignTo(
        IvfIndex.withNorm(CowTable.read(spark, corpus).select(col("vec_id"), col("ve"))),
        CowTable.read(spark, s"$index/centroids"))
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell")))
        .sorted.toSeq
      assert(assignRows(s"$index/assign") == full,
        "live-maintained assignment == frozen-centroid argmax of the whole corpus")
      assert(full.exists(_._1 == 203L), "streamed inserts are indexed")
      assert(full.size == 124)
    } finally q.stop()
  }

  test("compactIndex folds refresh sidecars; probes identical before and after") {
    import spark.implicits._
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    mkCorpus(corpus, 200L)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 4, iters = 2)
    // two refresh windows, each with updates + deletes -> positional
    // sidecars accumulate on the assign table
    CowTable.merge(spark, corpus,
      (0L until 8L).map(i => (i * 5, vecOf(i * 5 + 777))).toDF("vec_id", "ve"), "vec_id")
    CowTable.deleteMorKeys(spark, corpus,
      Seq(Tuple1(42L), Tuple1(43L)).toDF("vec_id"), "vec_id")
    assert(!IvfIndex.refresh(spark, corpus, index, maxDrift = 1e9).rebuilt)
    CowTable.merge(spark, corpus,
      (0L until 4L).map(i => (i * 7 + 1, vecOf(i * 7 + 901))).toDF("vec_id", "ve"), "vec_id")
    assert(!IvfIndex.refresh(spark, corpus, index, maxDrift = 1e9).rebuilt)
    val aPath = s"$index/assign"
    assert(CowTable.snapshotPositionDeletes(aPath).nonEmpty,
      "refresh windows must have accumulated positional sidecars")
    val queries = CowTable.read(spark, corpus).filter(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("ve").as("qe")).localCheckpoint()
    val before = IvfIndex.probe(spark, index, queries, nprobe = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    IvfIndex.compactIndex(spark, index, files = 4)
    assert(CowTable.snapshotPositionDeletes(aPath).isEmpty,
      "compaction must fold the sidecars")
    assert(CowTable.fileStats(aPath).nonEmpty, "cluster rewrite re-records cell stats")
    val after = IvfIndex.probe(spark, index, queries, nprobe = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(before == after && before.nonEmpty)
    // the logical rows survived the physical rewrite
    assert(assignRows(aPath) == IvfIndex.assignTo(
      IvfIndex.withNorm(CowTable.read(spark, corpus).select(col("vec_id"), col("ve"))),
      CowTable.read(spark, s"$index/centroids"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).sorted.toSeq)
  }

  test("drift past the threshold re-seeds; rebuilt index == fresh build on the same corpus") {
    import spark.implicits._
    val dir = tmp
    val (corpus, index, fresh) = (s"$dir/corpus", s"$dir/index", s"$dir/fresh")
    mkCorpus(corpus, 200L)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 4, iters = 2)

    // massive movement: half the corpus relocates far away
    CowTable.merge(spark, corpus,
      (100L until 200L).map(i => (i, Array.tabulate(8)(j => 100.0 + j + (i % 3))))
        .toDF("vec_id", "ve"), "vec_id")

    val r = IvfIndex.refresh(spark, corpus, index,
      maxDrift = 0.05, numCells = 4, iters = 2)
    assert(r.rebuilt, "drifted cells must trigger a re-seed")
    assert(IvfIndex.indexedVersion(index) == CowTable.currentVersion(corpus))

    // the in-place rebuild equals a fresh build on the same snapshot
    IvfIndex.buildIndex(spark, corpus, fresh, numCells = 4, iters = 2)
    assert(assignRows(s"$index/assign") == assignRows(s"$fresh/assign"))
    def cents(p: String) = CowTable.read(spark, s"$p/centroids").collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Seq[Double]]("ce"))).sortBy(_._1).toSeq
    assert(cents(index) == cents(fresh))
  }

  test("crash between the atomic upsert and the stats merge: retry repairs exactly") {
    import spark.implicits._
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    mkCorpus(corpus, 200L)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 4, iters = 2)
    val fromV = IvfIndex.indexedVersion(index)
    // delta: moves + inserts + deletes
    CowTable.merge(spark, corpus,
      (0L until 8L).map(i => (i * 5, vecOf(i * 5 + 2000))).toDF("vec_id", "ve"),
      "vec_id")
    CowTable.deleteMorKeys(spark, corpus,
      (60L until 66L).map(Tuple1(_)).toDF("vec_id"), "vec_id")
    CowTable.append(spark, corpus,
      (700L until 704L).map(i => (i, vecOf(i))).toDF("vec_id", "ve"))
    val toV = CowTable.currentVersion(corpus)
    // replay refresh's TABLE write by hand and stop — the r12-advice
    // crash window: assign carries the (ivf_refresh, toV) watermark,
    // the centroid stats merge and the marker never happened
    val feed = CowTable.changes(spark, corpus, "vec_id", fromV, toV)
    val upserts = IvfIndex.withNorm(
      feed.filter(col("_change_type").isin("insert", "update"))
        .select(col("vec_id"), col("ve")))
    val deleted = feed.filter(col("_change_type") === "delete").select("vec_id")
    val stored = CowTable.read(spark, s"$index/centroids")
    val newAssign = IvfIndex.assignTo(upserts, stored)
      .join(upserts, Seq("vec_id")).localCheckpoint()
    val ids = upserts.select("vec_id").unionByName(deleted).localCheckpoint()
    CowTable.upsertMorPos(spark, s"$index/assign", ids, newAssign,
      txn = Some((IvfIndex.RefreshApp, toV.toLong)))
    assert(IvfIndex.indexedVersion(index) == fromV,
      "marker still behind — this IS the crash state")
    // the retried refresh must detect the landed upsert and REPAIR —
    // re-deriving preimage sums from a feed whose preimages are gone
    // would silently corrupt the running stats
    val r = IvfIndex.refresh(spark, corpus, index, maxDrift = 1e9)
    assert(!r.rebuilt && r.toVersion == toV)
    assert(IvfIndex.indexedVersion(index) == toV)
    // parity law: assign == full reassignment under the frozen centroids
    val v = IvfIndex.withNorm(
      CowTable.read(spark, corpus).select(col("vec_id"), col("ve")))
    val aFull = IvfIndex.assignTo(v, stored).join(v.select("vec_id", "ve"), Seq("vec_id"))
    assert(assignRows(s"$index/assign") ==
      aFull.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell")))
        .sorted.toSeq)
    // running stats equal what a frozen-centroid rebuild computes —
    // no double-added postimages, no unsubtracted preimages
    val want = aFull
      .groupBy(col("cell").as("cid"))
      .agg(count(lit(1)).as("cnt"),
           sum(aggregate(col("ve"), lit(0.0d), _ + _)).as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val got = CowTable.read(spark, s"$index/centroids")
      .select(col("cid"), col("cnt"),
        aggregate(col("vsum"), lit(0.0d), _ + _).as("tot"))
      .filter(col("cnt") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)),
      s"member counts must be rebuild-exact: $got vs $want")
    got.zip(want).foreach { case ((_, _, g), (_, _, w)) =>
      assert(math.abs(g - w) < 1e-9, s"vsum drifted: $g vs $w")
    }
    // and the repaired index keeps refreshing normally
    CowTable.merge(spark, corpus,
      Seq((3L, vecOf(5000L))).toDF("vec_id", "ve"), "vec_id")
    val r2 = IvfIndex.refresh(spark, corpus, index, maxDrift = 1e9)
    assert(!r2.rebuilt && IvfIndex.indexedVersion(index) == r2.toVersion)
  }

  test("crash repair when the corpus kept committing past the crashed window") {
    // the ADVICE r13 medium: the crashed window's watermark t1 sits
    // BEHIND the next refresh's toV = t2, so the >= toV gate alone
    // misses it — the preimage capture would then read assign lists
    // already holding the crashed window's postimages and permanently
    // corrupt the running stats. refresh must repair-and-advance to
    // the watermark FIRST, then process (t1, t2] against clean state.
    import spark.implicits._
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    mkCorpus(corpus, 200L)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 4, iters = 2)
    val fromV = IvfIndex.indexedVersion(index)
    // window 1: moves + inserts, upsert hand-replayed then "crash"
    CowTable.merge(spark, corpus,
      (0L until 8L).map(i => (i * 5, vecOf(i * 5 + 2000))).toDF("vec_id", "ve"),
      "vec_id")
    val t1 = CowTable.currentVersion(corpus)
    val feed1 = CowTable.changes(spark, corpus, "vec_id", fromV, t1)
    val up1 = IvfIndex.withNorm(
      feed1.filter(col("_change_type").isin("insert", "update"))
        .select(col("vec_id"), col("ve")))
    val stored = CowTable.read(spark, s"$index/centroids")
    val na1 = IvfIndex.assignTo(up1, stored)
      .join(up1, Seq("vec_id")).localCheckpoint()
    CowTable.upsertMorPos(spark, s"$index/assign", up1.select("vec_id"), na1,
      txn = Some((IvfIndex.RefreshApp, t1.toLong)))
    assert(IvfIndex.indexedVersion(index) == fromV, "crash state: marker behind")
    // window 2: the corpus moves ON before anyone retries — more moves
    // (including keys the crashed window touched), deletes, inserts
    CowTable.merge(spark, corpus,
      Seq((0L, vecOf(7000L)), (11L, vecOf(7011L))).toDF("vec_id", "ve"), "vec_id")
    CowTable.deleteMorKeys(spark, corpus,
      Seq(5L, 60L).map(Tuple1(_)).toDF("vec_id"), "vec_id")
    CowTable.append(spark, corpus,
      (800L until 804L).map(i => (i, vecOf(i))).toDF("vec_id", "ve"))
    val t2 = CowTable.currentVersion(corpus)
    assert(t2 > t1, "scenario premise: commits landed past the crash")
    // ONE retried refresh must absorb both windows
    val r = IvfIndex.refresh(spark, corpus, index, maxDrift = 1e9)
    assert(!r.rebuilt && r.toVersion == t2 && IvfIndex.indexedVersion(index) == t2)
    // parity law: assign == full frozen-centroid reassignment
    val v = IvfIndex.withNorm(
      CowTable.read(spark, corpus).select(col("vec_id"), col("ve")))
    val aFull = IvfIndex.assignTo(v, stored).join(v.select("vec_id", "ve"), Seq("vec_id"))
    assert(assignRows(s"$index/assign") ==
      aFull.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell")))
        .sorted.toSeq)
    // running stats rebuild-exact: no double-added window-1 postimages
    val want = aFull
      .groupBy(col("cell").as("cid"))
      .agg(count(lit(1)).as("cnt"),
           sum(aggregate(col("ve"), lit(0.0d), _ + _)).as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val got = CowTable.read(spark, s"$index/centroids")
      .select(col("cid"), col("cnt"),
        aggregate(col("vsum"), lit(0.0d), _ + _).as("tot"))
      .filter(col("cnt") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)),
      s"member counts must be rebuild-exact: $got vs $want")
    got.zip(want).foreach { case ((_, _, g), (_, _, w)) =>
      assert(math.abs(g - w) < 1e-9, s"vsum drifted: $g vs $w")
    }
  }

  test("maintenance policy: probe file-skip degrades under churn, one pass restores it, steady state is a no-op") {
    import spark.implicits._
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    mkCorpus(corpus, 200L)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 4, iters = 2)
    IvfIndex.compactIndex(spark, index, files = 4) // clustered baseline
    val aPath = s"$index/assign"
    val cell = CowTable.read(spark, aPath).select("cell").head().getLong(0)
    def filesForCell = CowTable.prunedFilesIn(spark, aPath, "cell", Seq(cell)).size
    def probeRows() = {
      val qs = CowTable.read(spark, corpus).filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("ve").as("qe"))
      IvfIndex.probe(spark, index, qs, nprobe = 2, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    }
    val baseFiles = filesForCell
    // churn: 6 refresh windows, each a scattered upsert → one pos
    // sidecar + one mixed-cell appended file per window
    (0 until 6).foreach { w =>
      CowTable.merge(spark, corpus,
        (0L until 12L).map(i => (w * 17L + i * 13L) % 200L).distinct
          .map(id => (id, vecOf(id + 3000L + w)))
          .toDF("vec_id", "ve"), "vec_id")
      assert(!IvfIndex.refresh(spark, corpus, index, maxDrift = 1e9,
        numCells = 4).rebuilt)
    }
    val churnFiles = filesForCell
    val churnSidecars = CowTable.snapshotPositionDeletes(aPath).size
    assert(churnFiles > baseFiles,
      s"churn must degrade the probe's file skip: $churnFiles vs $baseFiles")
    assert(churnSidecars > 4, s"churn must pile up sidecars: $churnSidecars")
    val beforeMaint = probeRows()
    // ONE policy pass: folds the sidecars, restores the clustering
    val rep = IvfIndex.maintainIndex(spark, corpus, index,
      IvfIndex.IndexPolicy(maxPosSidecars = 4, targetFiles = 4,
        maxDrift = 1e9, numCells = 4))
    assert(rep.compacted && rep.foldedPosSidecars == churnSidecars)
    assert(!rep.refreshed, "index was caught up — nothing to refresh")
    assert(CowTable.snapshotPositionDeletes(aPath).isEmpty)
    assert(filesForCell <= baseFiles + 1,
      s"maintenance must RESTORE the file skip: $filesForCell vs base $baseFiles")
    assert(probeRows() == beforeMaint, "maintenance must not change served rows")
    // an un-caught-up corpus is caught up by the same pass
    CowTable.merge(spark, corpus, Seq((7L, vecOf(9999L))).toDF("vec_id", "ve"),
      "vec_id")
    val rep2 = IvfIndex.maintainIndex(spark, corpus, index,
      IvfIndex.IndexPolicy(maxPosSidecars = 4, targetFiles = 4,
        maxDrift = 1e9, numCells = 4))
    assert(rep2.refreshed && !rep2.reseeded)
    // steady state: a third pass commits nothing
    val v0 = (CowTable.currentVersion(aPath), CowTable.currentVersion(s"$index/centroids"))
    val rep3 = IvfIndex.maintainIndex(spark, corpus, index,
      IvfIndex.IndexPolicy(maxPosSidecars = 4, targetFiles = 4,
        maxDrift = 1e9, numCells = 4))
    assert(!rep3.refreshed && !rep3.compacted && rep3.vacuumedFiles == 0)
    assert((CowTable.currentVersion(aPath),
      CowTable.currentVersion(s"$index/centroids")) == v0,
      "steady state must be a no-op")
  }

  test("served-index recall@10 ≥ 0.9 on the clustered corpus: fresh build, after 3 refresh windows, just below the drift threshold") {
    recallGates(sq8 = false)
  }

  test("IVF-SQ8: int8 lists keep every recall gate green (fresh / refreshed / near-drift)") {
    // the r13-verdict task 4 gate: quantized lists + exact rerank from
    // the corpus floats must hold the SAME three lifecycle recall
    // points as the float lists
    recallGates(sq8 = true)
  }

  test("IVF-PQ: m=8 code lists keep every recall gate green (fresh / refreshed / near-drift)") {
    // round 15: product-quantized lists (8 codes/vector vs 64 int8 vs
    // 64 doubles) through the same decode seam + exact rerank must
    // hold the same three lifecycle points — refresh windows encode
    // new vectors against the FROZEN codebooks, the serving behavior
    recallGates(sq8 = false, pq = 8)
  }

  private def recallGates(sq8: Boolean, pq: Int = 0): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.vec_dot
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    // the clustered corpus is where recall is MEANINGFUL (the sf
    // embeddings are near-random — max cosine ~0.5, any probe looks
    // fine at 0.5 recall); here true neighbours share a tight cluster
    CowTable.create(graft.ops.Pipeline
      .clusteredCorpus(spark, n = 2000, clusters = 50, dims = 64, noise = 0.05)
      .repartition(4), corpus)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 16, iters = 2,
      sq8 = sq8, pq = pq)
    if (sq8) {
      val a = CowTable.read(spark, s"$index/assign")
      assert(a.columns.contains("vq") && !a.columns.contains("ve"),
        s"sq8 lists must physically carry int8: ${a.columns.toSeq}")
      assert(a.schema("vq").dataType ==
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ByteType, containsNull = false) ||
        a.schema("vq").dataType.simpleString.startsWith("array<tinyint>"),
        a.schema("vq").dataType.simpleString)
    }
    if (pq > 0) {
      val a = CowTable.read(spark, s"$index/assign")
      assert(a.columns.contains("pqc") && !a.columns.contains("ve"),
        s"pq lists must physically carry codes only: ${a.columns.toSeq}")
      assert(a.schema("pqc").dataType.simpleString.startsWith("array<tinyint>"),
        a.schema("pqc").dataType.simpleString)
      assert(a.select(org.apache.spark.sql.functions.size(col("pqc")))
        .head().getInt(0) == pq, "one code per subspace")
      assert(CowTable.read(spark, s"$index/codebooks").count() <= pq.toLong * 256,
        "codebooks bounded by m x ks")
    }
    val nQ = 20
    def recallAt(nprobe: Int): Double = {
      val v = CowTable.read(spark, corpus).select(col("vec_id"), col("ve"))
      val queries = v.filter(col("vec_id") < nQ)
        .select(col("vec_id").as("qid"), col("ve").as("qe"))
      val served = IvfIndex.probe(spark, index, queries, nprobe, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy("qid").orderBy(col("s").desc, col("vec_id"))
      val exact = queries.join(v, col("vec_id") =!= col("qid"))
        .withColumn("s", vec_dot(col("qe"), col("ve")) /
          (sqrt(vec_dot(col("qe"), col("qe"))) * sqrt(vec_dot(col("ve"), col("ve")))))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
      served.intersect(exact).size.toDouble / exact.size
    }
    // point 1 — fresh build, swept over nprobe; gate the SERVING
    // nprobe (4, what ann_ivf_persistent probes with)
    val sweep = Seq(1, 2, 4, 8).map(np => np -> recallAt(np))
    info(s"fresh-build recall@10 sweep: $sweep")
    assert(sweep.toMap.apply(4) >= 0.9, s"fresh-build recall: $sweep")
    // exact-score rerank over a growing candidate set: recall is
    // monotone in nprobe — a sweep that ISN'T means the probe is broken
    assert(sweep.sliding(2).forall(p => p.head._2 <= p.last._2 + 1e-9),
      s"recall must not decrease with nprobe: $sweep")
    // point 2 — three refresh windows of SCATTERED upserts (in-cluster
    // jitter on every 7th id + fresh inserts near existing clusters)
    (0 until 3).foreach { w =>
      val moved = CowTable.read(spark, corpus)
        .filter(pmod(col("vec_id"), lit(7)) === w)
        .select(col("vec_id"),
          transform(col("ve"), x => x + lit(0.02) * sin(x * 31.0 + lit(w))).as("ve"))
      CowTable.merge(spark, corpus, moved, "vec_id")
      CowTable.append(spark, corpus,
        CowTable.read(spark, corpus)
          .filter(col("vec_id") >= 100 + w * 20 && col("vec_id") < 120 + w * 20)
          .select((col("vec_id") + 10000 + w * 100).as("vec_id"),
            transform(col("ve"), x => x + lit(0.01)).as("ve")))
      val r = IvfIndex.refresh(spark, corpus, index, numCells = 16)
      assert(!r.rebuilt, s"scattered jitter must stay under the threshold: $r")
    }
    val afterWindows = recallAt(4)
    info(s"recall@10 after 3 refresh windows: $afterWindows")
    assert(afterWindows >= 0.9, s"recall degraded after refresh windows: $afterWindows")
    // point 3 — drift JUST BELOW the declared threshold: a constant
    // offset on two whole clusters shifts their cells' running means
    // measurably but under maxDrift; the refresh must keep the frozen
    // centroids AND the served recall must still gate
    val shoved = CowTable.read(spark, corpus)
      .filter(pmod(col("vec_id"), lit(50)) < 2 && col("vec_id") < 2000)
      .select(col("vec_id"), transform(col("ve"), x => x + lit(0.15)).as("ve"))
    CowTable.merge(spark, corpus, shoved, "vec_id")
    val r3 = IvfIndex.refresh(spark, corpus, index, maxDrift = 0.25, numCells = 16)
    info(s"near-threshold window: $r3")
    assert(!r3.rebuilt, s"drift must stay under the 0.25 threshold: $r3")
    // PQ dampens MEASURED drift: shifted vectors snap to the nearest
    // frozen codeword, so sub-codeword movement under-registers in the
    // decoded-domain stats (the FAISS re-train-on-distribution-shift
    // caveat). The serving gate below is the real protection; the
    // drift floor here only proves the window moved something.
    val minShift = if (pq > 0) 0.01 else 0.05
    assert(r3.worstShift.exists(s => s > minShift),
      s"the window must produce REAL drift for this point to mean anything: $r3")
    val nearThreshold = recallAt(4)
    info(s"recall@10 just below the drift threshold: $nearThreshold")
    assert(nearThreshold >= 0.9,
      s"a drifted-but-not-rebuilt index must still serve: $nearThreshold")
  }

  test("interrupted drift re-seed resumes via the intent marker") {
    import spark.implicits._
    val dir = tmp
    val (corpus, index, fresh) = (s"$dir/corpus", s"$dir/index", s"$dir/fresh")
    mkCorpus(corpus, 200L)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 4, iters = 2)
    CowTable.merge(spark, corpus,
      (100L until 200L).map(i => (i, Array.tabulate(8)(j => 100.0 + j + (i % 3))))
        .toDF("vec_id", "ve"), "vec_id")
    // a drift-triggered re-seed crashed right after writing its intent
    java.nio.file.Files.write(java.nio.file.Paths.get(index, "_rebuilding"),
      "9".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val r = IvfIndex.refresh(spark, corpus, index,
      maxDrift = 1e9, numCells = 4, iters = 2)
    assert(r.rebuilt, "an interrupted re-seed must resume, never judge drift " +
      "against a half-rebuilt index")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(index, "_rebuilding")))
    assert(IvfIndex.indexedVersion(index) == CowTable.currentVersion(corpus))
    IvfIndex.buildIndex(spark, corpus, fresh, numCells = 4, iters = 2)
    assert(assignRows(s"$index/assign") == assignRows(s"$fresh/assign"))
  }

  test("IVF-PQ: drift re-seed rebuilds with the SAME codec and codebook config") {
    import spark.implicits._
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    mkCorpus(corpus, 200L)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 4, iters = 2,
      pq = 2, pqCodes = 16)
    val cfg0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(index, "_pq_config")))
    assert(cfg0.trim == "2 16")
    // shove everything far enough that refresh re-seeds
    CowTable.merge(spark, corpus,
      (0L until 200L).map(i => (i, vecOf(i).map(_ + 50.0)))
        .toDF("vec_id", "ve"), "vec_id")
    val r = IvfIndex.refresh(spark, corpus, index,
      maxDrift = 1e-6, numCells = 4, iters = 2)
    assert(r.rebuilt, s"the shove must re-seed: $r")
    val a = CowTable.read(spark, s"$index/assign")
    assert(a.columns.contains("pqc") && !a.columns.contains("ve"),
      s"rebuild must keep the pq codec: ${a.columns.toSeq}")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(index, "_pq_config"))).trim == "2 16")
    assert(CowTable.read(spark, s"$index/codebooks").count() <= 32L)
    // the rebuilt index still serves: k rows per query, exact rerank
    val q = CowTable.read(spark, corpus).filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("ve").as("qe"))
    val out = IvfIndex.probe(spark, index, q, nprobe = 2, k = 3).collect()
    assert(out.length == 9, s"3 queries x k=3: ${out.length}")
  }

  test("sq8 probe with zero rerank candidates returns empty, not an error (ADVICE r14)") {
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    // a 1-vector corpus: the only probed cell holds just the query
    // itself, so the self-filter empties the candidate set and the
    // rerank's literal-IN list would be zero-width
    mkCorpus(corpus, 1L)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 1, iters = 1, sq8 = true)
    val queries = CowTable.read(spark, corpus)
      .select(col("vec_id").as("qid"), col("ve").as("qe"))
    val out = IvfIndex.probe(spark, index, queries, nprobe = 1, k = 3)
    assert(out.columns.toSeq == Seq("q", "n", "rn"))
    assert(out.collect().isEmpty)
    // float-list parity on the same degenerate shape
    IvfIndex.buildIndex(spark, corpus, s"$dir/index_f", numCells = 1, iters = 1)
    assert(IvfIndex.probe(spark, s"$dir/index_f", queries, nprobe = 1, k = 3)
      .collect().isEmpty)
  }

  test("PQ codegen encoder: bit-identical codes to the interpreted HOF argmin on every row") {
    import spark.implicits._
    val (m, ks, dsub) = (4, 8, 4)
    // deterministic vectors spanning sign mixes, near-zeros and exact
    // codeword hits (the tiebreak shape)
    val vecs = (0L until 500L).map { i =>
      (i, Array.tabulate(m * dsub)(j =>
        math.sin(i * 13.0 + j * 7.0) * (if (i % 5 == 0) 1e-6 else 1.0)))
    }.toDF("vec_id", "ve")
    // codebook with one DEAD code per subspace (+Infinity sentinels —
    // both paths must skip it) and one exact duplicate pair (codes 2
    // and 5 identical in sub 0: strict < keeps the smaller code)
    val encCb: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      (0 until ks).map { c =>
        if (c == 6) IndexedSeq.fill(dsub)(Double.PositiveInfinity)
        else if (s == 0 && c == 5) IndexedSeq.tabulate(dsub)(j => math.cos(s * 31.0 + 2 * 5.0 + j))
        else if (s == 0 && c == 2) IndexedSeq.tabulate(dsub)(j => math.cos(s * 31.0 + 2 * 5.0 + j))
        else IndexedSeq.tabulate(dsub)(j => math.cos(s * 31.0 + c * 5.0 + j))
      }
    }
    val viaCodegen = vecs.withColumn("pqc",
      graft.functions.VectorFunctions.pq_encode(
        col("ve"), m, ks, dsub, encCb.flatten.flatten.toArray))
      .select("vec_id", "pqc").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val viaHof = IvfIndex.pqEncodeHof(vecs, m, dsub, encCb)
      .select("vec_id", "pqc").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(viaCodegen.keySet == viaHof.keySet)
    viaCodegen.foreach { case (id, codes) =>
      assert(codes == viaHof(id), s"vec $id: codegen $codes != hof ${viaHof(id)}")
    }
    // dead code 6 never emitted; the sub-0 duplicate resolves to the
    // smaller code 2 whenever it wins
    assert(!viaCodegen.values.exists(_.contains((6 - 128).toByte)))
    assert(!viaCodegen.values.exists(_.head == (5 - 128).toByte),
      "duplicate codeword must tie to the smaller code")
  }

  test("IVF-PQ: dead codebook codes are never emitted by encode (ADVICE r15)") {
    import spark.implicits._
    val dir = tmp
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")
    CowTable.create(graft.ops.Pipeline
      .clusteredCorpus(spark, n = 400, clusters = 8, dims = 16, noise = 0.05)
      .repartition(2), corpus)
    IvfIndex.buildIndex(spark, corpus, index, numCells = 4, iters = 2,
      pq = 4, pqCodes = 16)
    // simulate retraining emptying codes: keep ONLY the largest-norm
    // codeword per subspace; every other code id is now dead (absent
    // from the codebooks table but still addressable by old rows)
    val cbPath = s"$index/codebooks"
    val cb = CowTable.read(spark, cbPath).collect()
    val survivors: Map[Int, Int] = cb.groupBy(_.getInt(0)).map { case (s, rows) =>
      s -> rows.maxBy(r => r.getSeq[Double](2).map(x => x * x).sum).getInt(1)
    }
    val keep = survivors.map { case (s, c) => s"(sub = $s AND code = $c)" }
      .mkString(" OR ")
    CowTable.delete(spark, cbPath, s"NOT ($keep)")
    // near-zero new vectors: a zero-filled encode table would win the
    // argmin for every subspace (distance ~0 to the zero fill) and emit
    // an UNTRAINED code; the +Infinity sentinels force trained codes
    CowTable.append(spark, corpus,
      (1000L until 1020L).map(i => (i, Seq.fill(16)(0.001))).toDF("vec_id", "ve"))
    IvfIndex.refresh(spark, corpus, index, maxDrift = 1e9)
    val emitted = CowTable.read(spark, s"$index/assign")
      .filter(col("vec_id") >= 1000L)
      .select(posexplode(col("pqc"))).collect()
      .map(r => (r.getInt(0), r.getByte(1).toInt + 128))
    assert(emitted.length == 20 * 4, s"20 new vectors x 4 subspaces: ${emitted.length}")
    emitted.foreach { case (s, c) =>
      assert(c == survivors(s),
        s"subspace $s emitted dead code $c (only trained survivor: ${survivors(s)})")
    }
    // decode of the dead-coded OLD rows still works (zero-filled decode
    // is bounded by the exact rerank) — probe must serve without error
    val q = Seq((0L, Seq.fill(16)(0.5))).toDF("qid", "qe")
    assert(IvfIndex.probe(spark, index, q, nprobe = 4, k = 5).count() == 5)
  }
}
