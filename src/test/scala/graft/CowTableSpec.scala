package graft

import org.apache.spark.sql.functions._

import graft.sinks.{CowTable, Sinks}

/** Copy-on-write table format: MERGE/DELETE rewrite only touched data
  * files, snapshots are immutable (time travel), commits are atomic
  * manifest swaps.
  */
class CowTableSpec extends SparkSpecBase {

  private def tmp = java.nio.file.Files.createTempDirectory("graft_cow").toString

  test("create + read round-trips; merge upserts; old snapshot still readable") {
    import spark.implicits._
    val path = tmp
    val base = (0L until 1000L).map(i => (i, s"name_$i", i * 10)).toDF("id", "name", "score")
      .repartition(8) // several data files so copy-on-write has something to skip
    val v1 = CowTable.create(base, path)
    assert(v1 == 1)
    assert(CowTable.read(spark, path).count() == 1000)

    // upsert: 5 updates + 3 inserts
    val updates = Seq(
      (1L, "updated_1", -1L), (500L, "updated_500", -2L), (999L, "updated_999", -3L),
      (7L, "updated_7", -4L), (8L, "updated_8", -5L),
      (2000L, "new_2000", 1L), (2001L, "new_2001", 2L), (2002L, "new_2002", 3L)
    ).toDF("id", "name", "score")
    val v2 = CowTable.merge(spark, path, updates, "id")
    assert(v2 == 2)

    val now = CowTable.read(spark, path)
    assert(now.count() == 1003)
    assert(now.filter(col("id") === 500L).select("name").as[String].head() == "updated_500")
    assert(now.filter(col("id") === 2001L).count() == 1)
    assert(now.filter(col("id") === 3L).select("name").as[String].head() == "name_3")

    // TIME TRAVEL: v1 is untouched
    val old = CowTable.read(spark, path, asOf = Some(1))
    assert(old.count() == 1000)
    assert(old.filter(col("id") === 500L).select("name").as[String].head() == "name_500")

    // COPY-ON-WRITE: files not containing matched keys carried over by
    // reference (v2 reuses some of v1's files)
    val f1 = CowTable.snapshotFiles(path, Some(1)).toSet
    val f2 = CowTable.snapshotFiles(path, Some(2)).toSet
    assert((f1 & f2).nonEmpty, "no v1 files were reused — copy-on-write did not prune")
    assert((f2 -- f1).nonEmpty, "no files were rewritten")
  }

  test("pure-insert merge appends without rewriting anything") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, i * 2)).toDF("id", "v").repartition(4), path)
    val before = CowTable.snapshotFiles(path, Some(1)).toSet
    CowTable.merge(spark, path,
      Seq((500L, 1L), (501L, 2L)).toDF("id", "v"), "id")
    val after = CowTable.snapshotFiles(path, Some(2)).toSet
    assert(before.subsetOf(after), "an insert-only merge must not rewrite data files")
    assert(CowTable.read(spark, path).count() == 102)
  }

  test("single-key merge against a 64-file table rewrites exactly one file") {
    import spark.implicits._
    val path = tmp
    // range-partitioned by id → each file holds a disjoint id range,
    // so one key lives in exactly one file
    CowTable.create((0L until 6400L).map(i => (i, i * 3)).toDF("id", "v")
      .repartitionByRange(64, col("id")), path)
    val f1 = CowTable.snapshotFiles(path, Some(1)).toSet
    assert(f1.size == 64)
    CowTable.merge(spark, path, Seq((1234L, -1L)).toDF("id", "v"), "id")
    val f2 = CowTable.snapshotFiles(path, Some(2)).toSet
    assert((f1 & f2).size == 63, s"expected 63 files carried over, got ${(f1 & f2).size}")
    // the one touched file rewrites; union partitioning may split the
    // tiny rewrite across a couple of output files — the claim is that
    // 63/64 of the table was NOT rewritten
    assert((f2 -- f1).size <= 2, s"expected <=2 rewritten files, got ${(f2 -- f1).size}")
    val now = CowTable.read(spark, path)
    assert(now.count() == 6400)
    assert(now.filter(col("id") === 1234L).select("v").as[Long].head() == -1L)
  }

  test("schema evolution: merge with an added column widens readers, never rewrites old files") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, i * 2)).toDF("id", "v").repartition(4), path)
    val f1 = CowTable.snapshotFiles(path, Some(1)).toSet
    // updates carry a NEW column `tag`
    CowTable.merge(spark, path,
      Seq((1L, -1L, "hot"), (200L, 1L, "new")).toDF("id", "v", "tag"), "id")
    val f2 = CowTable.snapshotFiles(path, Some(2)).toSet
    assert((f1 & f2).size == 3, "untouched narrow-schema files must carry over unchanged")
    val now = CowTable.readEvolved(spark, path)
    assert(now.columns.toSet == Set("id", "v", "tag"))
    assert(now.count() == 101)
    assert(now.filter(col("id") === 1L).select("tag").as[String].head() == "hot")
    // pre-evolution rows read as null tag
    assert(now.filter(col("tag").isNull).count() == 99)
  }

  test("compaction bin-packs files, preserves rows AND time travel") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 1000L).map(i => (i, i % 7)).toDF("id", "m").repartition(16), path)
    val v2 = CowTable.compact(spark, path, files = 2)
    assert(CowTable.snapshotFiles(path, Some(v2)).size <= 2)
    assert(CowTable.read(spark, path).count() == 1000)
    val sums = (v: Int) => CowTable.read(spark, path, Some(v))
      .agg(sum("id"), sum("m")).collect().head
    assert(sums(1) == sums(v2))
    // the pre-compaction snapshot still reads its 16 small files
    assert(CowTable.snapshotFiles(path, Some(1)).size == 16)
  }

  test("delete keeps rows where the predicate is NULL, regardless of file layout") {
    import spark.implicits._
    val path = tmp
    // score is NULL for ids 10..19; co-locate nulls with true-matches in
    // some files and with non-matches in others so a layout-dependent
    // bug (rewrite path vs carry-over path disagreeing on NULL) shows up
    val rows = (0L until 40L).map { i =>
      (i, if (i >= 10 && i < 20) None else Some(i))
    }.toDF("id", "score").repartitionByRange(4, col("id"))
    CowTable.create(rows, path)
    // predicate is NULL on the null-score rows; TRUE only for score < 5
    CowTable.delete(spark, path, "score < 5")
    val now = CowTable.read(spark, path)
    assert(now.count() == 35, "only the 5 TRUE rows delete; 10 NULL rows are kept")
    assert(now.filter(col("score").isNull).count() == 10,
      "rows with a NULL predicate must survive DELETE (SQL three-valued semantics)")
    assert(now.filter(col("score") < 5).count() == 0)
  }

  test("post-evolution merge and compact preserve the added column across mixed-schema files") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, i * 2)).toDF("id", "v").repartition(4), path)
    // evolve: add `tag` via a merge
    CowTable.merge(spark, path,
      Seq((1L, -1L, "hot"), (200L, 1L, "new")).toDF("id", "v", "tag"), "id")
    // second merge touches keys spread over BOTH old-schema and
    // new-schema files; survivor read must widen, not sample one file
    CowTable.merge(spark, path,
      Seq((1L, -7L, "hot2"), (50L, -8L, "warm")).toDF("id", "v", "tag"), "id")
    val now = CowTable.read(spark, path)
    assert(now.columns.toSet == Set("id", "v", "tag"))
    assert(now.count() == 101)
    assert(now.filter(col("id") === 1L).select("tag").as[String].head() == "hot2")
    assert(now.filter(col("id") === 200L).select("tag").as[String].head() == "new",
      "survivor row from the evolved file must keep its tag through the rewrite")
    // compact the mixed-schema snapshot — the evolved column survives
    val vc = CowTable.compact(spark, path, files = 2)
    val compacted = CowTable.read(spark, path, Some(vc))
    assert(compacted.columns.toSet == Set("id", "v", "tag"))
    assert(compacted.filter(col("tag").isNotNull).count() == 3)
  }

  test("concurrent commits from the same base: exactly one wins, the other fails cleanly") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = tmp
    CowTable.create((0L until 1000L).map(i => (i, i)).toDF("id", "v").repartition(8), path)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    def racer(k: Long): Future[Either[Throwable, Int]] = Future {
      val updates = Seq((k, -k)).toDF("id", "v")
      gate.await() // both writers plan against base v1, then race the commit
      try Right(CowTable.merge(spark, path, updates, "id"))
      catch { case e: CowTable.ConcurrentCommitException => Left(e) }
    }
    val results = Await.result(Future.sequence(Seq(racer(3L), racer(700L))), 120.seconds)
    assert(results.count(_.isRight) == 1, s"exactly one commit must win: $results")
    assert(results.count(_.isLeft) == 1, s"the loser must fail with ConcurrentCommitException: $results")
    assert(CowTable.currentVersion(path) == 2, "the losing writer must not publish a version")
    // the table reflects exactly the winner's merge
    assert(CowTable.read(spark, path).filter(col("v") < 0).count() == 1)
  }

  test("concurrent appends all land via manifest rebase: no lost rows, no data rewrite") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, 0L)).toDF("id", "v"), path)
    val gate = new java.util.concurrent.CyclicBarrier(4)
    // 4 writers append DISJOINT batches from the same base; every one
    // must succeed (losers rebase their already-written files onto the
    // winner's manifest instead of failing or rewriting)
    val fs = (1 to 4).map { w =>
      Future {
        val batch = (0L until 10L).map(i => (1000L * w + i, w.toLong)).toDF("id", "v")
        gate.await()
        CowTable.append(spark, path, batch)
      }
    }
    val versions = Await.result(Future.sequence(fs), 120.seconds)
    assert(versions.toSet == Set(2, 3, 4, 5), s"all four must commit: $versions")
    val now = CowTable.read(spark, path)
    assert(now.count() == 140, "base 100 + 4 disjoint appends of 10")
    assert(now.filter(col("id") >= 1000L).count() == 40, "no append may be lost")
    // write-once: every appended file appears in the final manifest —
    // rebase re-linked the SAME files, it never rewrote them
    val files = CowTable.snapshotFiles(path).toSet
    (2 to 5).foreach { v =>
      val mine = CowTable.snapshotFiles(path, Some(v)).toSet --
        CowTable.snapshotFiles(path, Some(v - 1)).toSet
      assert(mine.nonEmpty && mine.subsetOf(files),
        s"v$v's fresh files must survive into the final manifest")
    }
  }

  test("withCommitRetry serializes racing merges: both land, last writer wins per key") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = tmp
    CowTable.create((0L until 200L).map(i => (i, 0L)).toDF("id", "v"), path)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    def racer(k: Long, stamp: Long): Future[Int] = Future {
      gate.await()
      CowTable.withCommitRetry() {
        CowTable.merge(spark, path, Seq((k, stamp)).toDF("id", "v"), "id")
      }
    }
    val vs = Await.result(Future.sequence(Seq(racer(3L, 31L), racer(7L, 71L))), 120.seconds)
    assert(vs.toSet == Set(2, 3), s"retry must let the loser recompute and land: $vs")
    val now = CowTable.read(spark, path)
    assert(now.count() == 200)
    assert(now.filter(col("id") === 3L).select("v").as[Long].head() == 31L)
    assert(now.filter(col("id") === 7L).select("v").as[Long].head() == 71L,
      "both merges must be visible — serializable, not lost-update")
  }

  test("append conforms to the table contract: pruning under the partition spec, no sidecar revive") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, i % 4)).toDF("id", "grp"), path,
      transforms = Seq(graft.sinks.PartitionTransform.identity("grp")))
    // MoR-delete a key, then append a row with the SAME key: sidecars
    // are table-wide by contract — the appended key stays deleted
    CowTable.deleteMorKeys(spark, path, Seq(5L).toDF("id"), "id")
    val v = CowTable.append(spark, path, Seq((5L, 1L), (500L, 2L)).toDF("id", "grp"))
    val now = CowTable.read(spark, path, Some(v))
    assert(now.count() == 100, "99 survivors + appended 500 (appended id=5 stays deleted)")
    assert(now.filter(col("id") === 500L).count() == 1)
    assert(now.filter(col("id") === 5L).count() == 0,
      "append must not revive a MoR-deleted key — that is merge's job")
    // appended file lands under the spec's directory layout and prunes
    val pruned = CowTable.prunedFilesEq(spark, path, "grp", 2L, Some(v))
    assert(pruned.exists(_.contains("=2")), s"appended file must prune by grp: $pruned")
    assert(CowTable.snapshotFiles(path, Some(v)).size > pruned.size,
      "equality pruning must skip the other partitions' files")
  }

  test("transactional append: (appId, version) watermark makes replays no-ops, survives other commits") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 20L).map(i => (i, 0L)).toDF("id", "v"), path)
    val v2 = CowTable.append(spark, path, Seq((100L, 1L)).toDF("id", "v"),
      txn = Some(("ingest-a", 0L)))
    assert(v2 == 2 && CowTable.txnVersion(path, "ingest-a") == 0L)
    // replay of version 0: no-op — no new version, no duplicate row
    val vr = CowTable.append(spark, path, Seq((100L, 1L)).toDF("id", "v"),
      txn = Some(("ingest-a", 0L)))
    assert(vr == 2, "replayed txn version must not commit")
    assert(CowTable.read(spark, path).filter(col("id") === 100L).count() == 1)
    // an unrelated RMW commit carries the watermark forward
    CowTable.merge(spark, path, Seq((3L, -3L)).toDF("id", "v"), "id")
    assert(CowTable.txnVersion(path, "ingest-a") == 0L,
      "merge must carry txn watermarks forward")
    // next version appends; a second app keeps an independent watermark
    CowTable.append(spark, path, Seq((101L, 2L)).toDF("id", "v"),
      txn = Some(("ingest-a", 1L)))
    CowTable.append(spark, path, Seq((200L, 9L)).toDF("id", "v"),
      txn = Some(("ingest-b", 0L)))
    assert(CowTable.txnVersion(path, "ingest-a") == 1L)
    assert(CowTable.txnVersion(path, "ingest-b") == 0L)
    assert(CowTable.read(spark, path).count() == 23)
    // stale replay BELOW the watermark is also a no-op
    CowTable.append(spark, path, Seq((100L, 1L)).toDF("id", "v"),
      txn = Some(("ingest-a", 0L)))
    assert(CowTable.read(spark, path).filter(col("id") === 100L).count() == 1)
  }

  test("appendStream batch body: replayed micro-batch leaves the table exactly as the first delivery") {
    import spark.implicits._
    val path = tmp + "/ingested"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val b1 = Seq((3L, "c")).toDF("id", "s")
    Sinks.appendBatch(b0, 0L, path, "docs")   // bootstrap + append
    Sinks.appendBatch(b0, 0L, path, "docs")   // post-commit replay
    Sinks.appendBatch(b1, 1L, path, "docs")
    Sinks.appendBatch(b1, 1L, path, "docs")   // replay of batch 1
    val rows = CowTable.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"replays must not duplicate: $rows")
    // two writers, one table: independent watermarks, concurrent appends
    Sinks.appendBatch(Seq((10L, "x")).toDF("id", "s"), 0L, path, "other")
    Sinks.appendBatch(Seq((10L, "x")).toDF("id", "s"), 0L, path, "other")
    assert(CowTable.read(spark, path).count() == 4)
    assert(CowTable.txnVersion(path, "docs") == 1L &&
           CowTable.txnVersion(path, "other") == 0L)
  }

  test("withCommitRetry: exhausting maxRetries rethrows the conflict instead of spinning") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 10L).map(i => (i, i)).toDF("id", "v"), path)
    var calls = 0
    intercept[CowTable.ConcurrentCommitException] {
      CowTable.withCommitRetry(maxRetries = 2) {
        calls += 1
        // an op that always loses: every attempt advances the table
        // out from under itself before committing against its base
        val base = CowTable.currentVersion(path)
        CowTable.merge(spark, path, Seq((99L + calls, 0L)).toDF("id", "v"), "id")
        throw new CowTable.ConcurrentCommitException(path, base + 1)
      }
    }
    assert(calls == 3, s"initial attempt + 2 retries, then rethrow: $calls")
  }

  test("incrementalJoin: two-sided dirty-key refresh equals the full join recompute") {
    import spark.implicits._
    val dir = tmp
    val (pa, pb) = (s"$dir/a", s"$dir/b")
    CowTable.create((0L until 100L).map(i => (i, s"tier${i % 3}")).toDF("id", "tier"), pa)
    CowTable.create((0L until 80L).flatMap(i => Seq((i, i * 10), (i, i * 10 + 1)))
      .toDF("id", "spend"), pb)
    def joinOf(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.join(b, Seq("id"), "full")
        .select(col("id"), col("tier"), col("spend"))
    val a1 = CowTable.currentVersion(pa)
    val b1 = CowTable.currentVersion(pb)
    val mv0 = joinOf(CowTable.read(spark, pa), CowTable.read(spark, pb))
      .localCheckpoint()
    // no window movement: the view returns untouched
    assert(CowTable.incrementalJoin(spark, pa, pb, "id", mv0, a1, a1, b1, b1)(joinOf)
      .collect().length == mv0.count())
    // BOTH sides move: A re-tiers key 5 and inserts key 200 (A-only →
    // null spend); B MoR-deletes key 7's rows and gains key 90 (which
    // A already had with no B rows — null→value transition)
    CowTable.merge(spark, pa, Seq((5L, "gold"), (200L, "new")).toDF("id", "tier"), "id")
    CowTable.deleteMorKeys(spark, pb, Seq(7L).toDF("id"), "id")
    CowTable.merge(spark, pb, Seq((90L, 900L)).toDF("id", "spend"), "id")
    val a2 = CowTable.currentVersion(pa)
    val b2 = CowTable.currentVersion(pb)
    val refreshed = CowTable.incrementalJoin(
      spark, pa, pb, "id", mv0, a1, a2, b1, b2)(joinOf)
    val full = joinOf(CowTable.read(spark, pa), CowTable.read(spark, pb))
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))
    assert(refreshed.collect().map(keyOf).sorted.toSeq ==
           full.collect().map(keyOf).sorted.toSeq,
      "incremental refresh must equal the full recompute")
    // the interesting transitions really happened:
    val m = refreshed.collect().map(keyOf)
    assert(m.exists(t => t._1 == 5L && t._2 == "gold"))
    assert(m.exists(t => t._1 == 200L && t._3 == -1L), "A-only key joins null")
    assert(!m.exists(t => t._1 == 7L && t._3 >= 0L), "B-deleted key loses its spend rows")
    assert(m.exists(t => t._1 == 90L && t._3 == 900L), "null->value transition")
  }

  test("incrementalJoinFk: dim dirty keys fan out through the fact FK index (KIP-213)") {
    import spark.implicits._
    val dir = tmp
    val (pf, pd) = (s"$dir/fact", s"$dir/dim")
    // fact: 600 orders over 30 customers (fan-out 20), keyed by oid,
    // FK = cust; dim: 40 customers (10 never referenced), keyed by cid
    CowTable.create((0L until 600L).map(i => (i, i % 30, i * 2))
      .toDF("oid", "cust", "amount").repartition(4), pf)
    CowTable.create((0L until 40L).map(c => (c, s"seg${c % 4}"))
      .toDF("cid", "segment").repartition(2), pd)
    def joinOf(f: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame) =
      f.join(d, f("cust") === d("cid"), "left")
        .select(col("oid"), col("cust"), col("amount"), col("segment"))
    val f1 = CowTable.currentVersion(pf)
    val d1 = CowTable.currentVersion(pd)
    val mv0 = joinOf(CowTable.read(spark, pf), CowTable.read(spark, pd))
      .localCheckpoint()
    // no window movement: the view returns untouched
    assert(CowTable.incrementalJoinFk(spark, pf, pd, "oid", "cust", "cid",
      mv0, f1, f1, d1, d1)(joinOf).count() == mv0.count())
    // the verdict's window: dim MERGE (re-segment cust 3, insert
    // unreferenced cust 100) + dim MoR DELETE (cust 7 — its 20 orders
    // fall to null segment) + fact APPEND (new orders for re-segmented
    // cust 3 and for untouched cust 8)
    CowTable.merge(spark, pd, Seq((3L, "vip"), (100L, "ghost"))
      .toDF("cid", "segment"), "cid")
    CowTable.deleteMorKeys(spark, pd, Seq(7L).toDF("cid"), "cid")
    CowTable.append(spark, pf, Seq((1000L, 3L, 5L), (1001L, 8L, 6L))
      .toDF("oid", "cust", "amount"))
    val f2 = CowTable.currentVersion(pf)
    val d2 = CowTable.currentVersion(pd)
    val refreshed = CowTable.incrementalJoinFk(spark, pf, pd, "oid", "cust", "cid",
      mv0, f1, f2, d1, d2)(joinOf)
    val full = joinOf(CowTable.read(spark, pf), CowTable.read(spark, pd))
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
       if (r.isNullAt(3)) "<null>" else r.getString(3))
    assert(refreshed.collect().map(keyOf).sorted.toSeq ==
           full.collect().map(keyOf).sorted.toSeq,
      "FK incremental refresh must equal the full recompute")
    val m = refreshed.collect().map(keyOf)
    // dim-dirty fan-out: every cust-3 order re-segmented to vip —
    // their oids were NOT dirty on the fact side
    assert(m.count(t => t._2 == 3L && t._4 == "vip") == 21, "20 old + 1 appended")
    // dim delete fans out to null enrichment
    assert(m.count(t => t._2 == 7L) == 20 && m.filter(_._2 == 7L).forall(_._4 == "<null>"))
    // fact append joins the CURRENT dim
    assert(m.exists(t => t._1 == 1001L && t._4 == "seg0"))
    // unreferenced dim insert adds no view rows
    assert(!m.exists(_._4 == "ghost"))
    assert(m.length == 602)
  }

  test("snapshot isolation: readers during a concurrent merge see only full versions") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = tmp
    CowTable.create((0L until 500L).map(i => (i, 0L)).toDF("id", "gen").repartition(8), path)
    // writer: 5 sequential merges, each stamping gen=version on 50 keys
    val writer = Future {
      (1 to 5).foreach { g =>
        CowTable.merge(spark, path,
          (0L until 50L).map(i => (i * 10, g.toLong)).toDF("id", "gen"), "id")
      }
    }
    // reader: every observed snapshot must be internally consistent —
    // 500 rows, and the stamped count is a multiple of 50 matching one
    // committed generation (never a partial merge)
    var checks = 0
    while (!writer.isCompleted && checks < 20) {
      val v = CowTable.currentVersion(path)
      val snap = CowTable.read(spark, path, Some(v))
      val n = snap.count()
      val stamped = snap.filter(col("gen") > 0).count()
      assert(n == 500, s"snapshot v$v saw $n rows")
      assert(stamped % 50 == 0 || stamped == 0, s"snapshot v$v saw partial merge: $stamped")
      checks += 1
    }
    Await.result(writer, 120.seconds)
    assert(CowTable.read(spark, path).filter(col("gen") === 5L).count() == 50)
  }

  test("expireSnapshots drops old manifests and vacuums unreferenced data files") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 200L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(4, col("id")), path)
    CowTable.merge(spark, path, Seq((10L, -1L)).toDF("id", "v"), "id")
    CowTable.merge(spark, path, Seq((110L, -2L)).toDF("id", "v"), "id")
    val beforeRows = CowTable.read(spark, path).collect().toSet
    val dataFiles = (root: String) => {
      val p = java.nio.file.Paths.get(root, "data")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala
        .count(f => f.toString.endsWith(".parquet"))
    }
    val before = dataFiles(path)
    val (manifests, vacuumed) = CowTable.expireSnapshots(path, keepLast = 1)
    assert(manifests == 2, "v1 and v2 expire; v3 is retained")
    assert(vacuumed > 0, "files referenced only by expired snapshots must be vacuumed")
    assert(dataFiles(path) == before - vacuumed)
    // current snapshot unaffected
    assert(CowTable.read(spark, path).collect().toSet == beforeRows)
    // expired versions are gone
    intercept[IllegalArgumentException](CowTable.read(spark, path, Some(1)).count())
  }

  test("delete rewrites only touched files; other rows intact") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, i % 10)).toDF("id", "bucket")
      .repartitionByRange(5, col("id")), path)
    val v2 = CowTable.delete(spark, path, "id >= 90")
    val now = CowTable.read(spark, path)
    assert(now.count() == 90)
    assert(now.agg(max("id")).head().getLong(0) == 89L)
    // range-partitioned layout → only the last file contained id>=90
    val f1 = CowTable.snapshotFiles(path, Some(1)).toSet
    val f2 = CowTable.snapshotFiles(path, Some(v2)).toSet
    assert((f1 & f2).size >= 3, s"expected most files reused, got ${(f1 & f2).size}")
    // time travel still sees the deleted rows
    assert(CowTable.read(spark, path, Some(1)).count() == 100)
  }

  test("update rewrites only touched files; old-row semantics, NULL keeps, casts back") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i =>
        (i, i % 10, if (i == 7) null else s"g${i % 3}"))
      .toDF("id", "v", "tag").repartitionByRange(5, col("id")), path)
    // assignments read the OLD row (simultaneous): swap id and v on a band
    val v2 = CowTable.update(spark, path, "id >= 90",
      Seq("id" -> "v", "v" -> "id"))
    val now = CowTable.read(spark, path)
    assert(now.count() == 100)
    assert(now.filter("v >= 90").count() == 10, "v carries the old ids")
    assert(now.filter("id >= 90").count() == 0, "id swapped down to old v")
    // range layout: only the last file contained id >= 90
    val f1 = CowTable.snapshotFiles(path, Some(1)).toSet
    val f2 = CowTable.snapshotFiles(path, Some(v2)).toSet
    assert((f1 & f2).size >= 3, s"expected most files reused, got ${(f1 & f2).size}")
    // NULL predicate keeps the row unchanged (tag is NULL on id=7)
    val v3 = CowTable.update(spark, path, "tag = 'gX'", Seq("v" -> "v + 1000"))
    assert(v3 == v2, "no match -> no version churn")
    val v4 = CowTable.update(spark, path, "substring(tag, 2, 1) = '1'",
      Seq("v" -> "v + 1000"))
    val after = CowTable.read(spark, path, Some(v4))
    assert(after.filter("id = 7 AND tag IS NULL").head().getLong(1) == 7L % 10,
      "NULL predicate row must be untouched (even though its group 'would' match)")
    // cast-back: a double-valued assignment lands as the declared LONG
    val v5 = CowTable.update(spark, path, "id = 0", Seq("v" -> "v + 0.5"))
    val sch = CowTable.read(spark, path, Some(v5)).schema
    assert(sch("v").dataType == org.apache.spark.sql.types.LongType)
    // time travel still sees every pre-update state
    assert(CowTable.read(spark, path, Some(1)).filter("id >= 90").count() == 10)
    // positional-sidecar interplay: pos-delete one row, then update a
    // DIFFERENT row in the same file — the deleted row must not resurrect
    val p2 = tmp
    CowTable.create((0L until 20L).map(i => (i, i)).toDF("k", "w").coalesce(1), p2)
    CowTable.deleteMorWhere(spark, p2, "k = 3")
    CowTable.update(spark, p2, "k = 5", Seq("w" -> "w * 10"))
    val r2 = CowTable.read(spark, p2)
    assert(r2.count() == 19, "pos-deleted row stays deleted through the rewrite")
    assert(r2.filter("k = 5").head().getLong(1) == 50L)
    // key-sidecar clash: SET on the sidecar key column is rejected loudly
    CowTable.deleteMor(spark, p2, "k = 9", "k")
    val err = intercept[IllegalArgumentException] {
      CowTable.update(spark, p2, "k = 5", Seq("k" -> "k + 100"))
    }
    assert(err.getMessage.contains("sidecar"), err.getMessage)
    // non-key assignment still fine with the sidecar present; hidden row stays hidden
    CowTable.update(spark, p2, "w >= 0", Seq("w" -> "w + 1"))
    assert(CowTable.read(spark, p2).count() == 18)
    assert(CowTable.read(spark, p2).filter("k = 9").count() == 0)
  }

  test("change feed: insert/update/delete between snapshots; survivor rewrites excluded") {
    import spark.implicits._
    val path = tmp
    CowTable.create(
      (0L until 100L).map(i => (i, s"name_$i", i * 10))
        .toDF("id", "name", "score").repartitionByRange(5, col("id")),
      path) // v1
    CowTable.merge(spark, path, Seq(
        (7L, "updated_7", -1L),          // update
        (200L, "new_200", 1L),           // insert
        (201L, "new_201", 2L)            // insert
      ).toDF("id", "name", "score"), "id") // v2
    CowTable.delete(spark, path, "id = 50 or id = 200") // v3

    // v1 -> v2: exactly the 1 update + 2 inserts — NOT the ~19 other
    // rows that shared rewritten files with id=7 and were carried with
    // identical content.
    val c12 = CowTable.changes(spark, path, "id", 1, 2)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"))).toSet
    assert(c12 == Set((7L, "update"), (200L, "insert"), (201L, "insert")), c12.toString)
    assert(CowTable.changes(spark, path, "id", 1, 2)
      .filter(col("id") === 7L).select("name").as[String].head() == "updated_7")

    // v2 -> v3: the two deletes, carrying PREIMAGE values
    val c23 = CowTable.changes(spark, path, "id", 2, 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"),
                           r.getAs[String]("name"))).toSet
    assert(c23 == Set((50L, "delete", "name_50"), (200L, "delete", "new_200")), c23.toString)

    // v1 -> v3 composes: insert-then-delete of 200 nets out entirely;
    // 50 (present in v1) surfaces as a delete; 7 stays an update.
    val c13 = CowTable.changes(spark, path, "id", 1, 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"))).toSet
    assert(c13 == Set((7L, "update"), (201L, "insert"), (50L, "delete")), c13.toString)

    // identical-manifest window (self-diff): empty, schema intact
    val self = CowTable.changes(spark, path, "id", 3, 3)
    assert(self.count() == 0)
    assert(self.columns.contains("_change_type") && self.columns.contains("id"))

    // CDC round-trip: applying the v1->v3 feed to the v1 snapshot
    // reproduces the v3 snapshot exactly (the consumer contract).
    val feed = CowTable.changes(spark, path, "id", 1, 3).persist()
    val applied = CowTable.read(spark, path, Some(1))
      .join(feed.filter(col("_change_type") === "delete").select("id"), Seq("id"), "left_anti")
      .join(feed.filter(col("_change_type") === "update").select("id"), Seq("id"), "left_anti")
      .unionByName(feed.filter(col("_change_type") =!= "delete")
        .drop("_change_type", "_commit_version"))
    val v3 = CowTable.read(spark, path, Some(3))
    assert(applied.exceptAll(v3).isEmpty && v3.exceptAll(applied).isEmpty)
    feed.unpersist()
  }

  test("incremental view maintenance: dirty-group refresh equals full recompute") {
    import spark.implicits._
    val path = tmp
    val base = (0L until 10000L).map(i => (i, s"g${i % 50}", i))
      .toDF("id", "grp", "v").repartition(16)
    val v1 = CowTable.create(base, path)
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("grp").agg(count(lit(1)).as("n"), sum("v").cast("long").as("s"))
    val mv1 = aggOf(CowTable.read(spark, path, Some(v1))).cache()
    mv1.count()

    // a merge that updates in-group, MOVES a row across groups, and
    // inserts a brand-new group; then a delete
    val updates = Seq(
      (5L, "g5", 999999L),     // in-group value change
      (7L, "g40", 7L),         // group move: g7 -> g40 (both dirty)
      (99999L, "g_new", 1L))   // new group
      .toDF("id", "grp", "v")
    CowTable.merge(spark, path, updates, "id")
    val v3 = CowTable.delete(spark, path, "grp = 'g13' AND v < 100")
    assert(v3 == 3)

    val incr = CowTable.incrementalAgg(spark, path, "grp", mv1, v1, v3)(aggOf)
    val full = aggOf(CowTable.read(spark, path, Some(v3)))
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty)
    // the moved-from group really shrank and the new group exists
    val m = incr.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("g7")._1 == 199 && m("g_new") == ((1L, 1L)))
    // no-op window returns the mv untouched
    assert(CowTable.incrementalAgg(spark, path, "grp", mv1, v1, v1)(aggOf) eq mv1)
    mv1.unpersist()
  }

  test("incremental refresh covers NULL-keyed groups (null-safe dirty join)") {
    import spark.implicits._
    val path = tmp
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("grp").agg(count(lit(1)).as("n"), sum("v").cast("long").as("s"))
    val base = (0L until 1000L)
      .map(i => (i, if (i % 10 == 0) null else s"g${i % 7}", i))
      .toDF("id", "grp", "v").repartition(8)
    val v1 = CowTable.create(base, path)
    val mv1 = aggOf(CowTable.read(spark, path, Some(v1)))
    // update a NULL-group row: the NULL group itself must go dirty
    val v2 = CowTable.merge(spark, path,
      Seq((20L, null.asInstanceOf[String], 999999L)).toDF("id", "grp", "v"), "id")
    val incr = CowTable.incrementalAgg(spark, path, "grp", mv1, v1, v2)(aggOf)
    val full = aggOf(CowTable.read(spark, path, Some(v2)))
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty)
    // the refreshed NULL-group row really carries the new value
    val nullRow = incr.filter(col("grp").isNull).collect().head
    assert(nullRow.getLong(2) == full.filter(col("grp").isNull).collect().head.getLong(2))
  }

  test("incremental refresh chains across versions without drift") {
    import spark.implicits._
    val path = tmp
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("grp").agg(count(lit(1)).as("n"), sum("v").cast("long").as("s"))
    var v = CowTable.create(
      (0L until 5000L).map(i => (i, s"g${i % 20}", i)).toDF("id", "grp", "v")
        .repartition(8), path)
    var mv = aggOf(CowTable.read(spark, path, Some(v)))
    // four CDC-style windows: the MV refreshes from its own previous
    // state each time — any systematic error would compound
    for (step <- 1 to 4) {
      val ups = (0L until 50L)
        .map(i => (i * 97 % 5300, s"g${(i + step) % 22}", i * step))
        .toDF("id", "grp", "v")
      val next = CowTable.merge(spark, path, ups, "id")
      mv = CowTable.incrementalAgg(spark, path, "grp", mv, v, next)(aggOf)
      val full = aggOf(CowTable.read(spark, path, Some(next)))
      assert(mv.exceptAll(full).isEmpty && full.exceptAll(mv).isEmpty, s"step $step")
      v = next
    }
  }

  test("z-order cluster: both dimensions prune files; linear sort prunes only one") {
    import spark.implicits._
    val path = tmp
    // two INDEPENDENT uniform dimensions (the base-200 digits of id) —
    // the case a single sort column cannot lay out well
    val rows = (0L until 40000L).map(i => (i, i % 200, i / 200))
      .toDF("id", "x", "y")
    CowTable.create(rows.repartition(8), path)

    // per-file [min, max] spans for a column, read file-by-file (what
    // footer-stat pruning sees)
    def spans(c: String): Seq[(String, Long, Long)] =
      CowTable.snapshotFiles(path).map { f =>
        val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
        (f, r.getLong(0), r.getLong(1))
      }
    def touched(c: String, lo: Long, hi: Long): Int =
      spans(c).count { case (_, mn, mx) => mx >= lo && mn <= hi }

    // linear layout: range-sorted by x via compact of an x-sorted rewrite
    CowTable.create(rows.repartitionByRange(16, col("x")), path + "_lin")
    def touchedLin(c: String, lo: Long, hi: Long): Int =
      CowTable.snapshotFiles(path + "_lin").map { f =>
        val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
        (r.getLong(0), r.getLong(1))
      }.count { case (mn, mx) => mx >= lo && mn <= hi }

    CowTable.cluster(spark, path, files = 16, zcols = Seq("x", "y"))
    assert(CowTable.read(spark, path).count() == 40000) // same rows, new layout

    val (zx, zy) = (touched("x", 0, 19), touched("y", 0, 19))
    val (lx, ly) = (touchedLin("x", 0, 19), touchedLin("y", 0, 19))
    // linear: leading column prunes hard, the other touches EVERY file
    assert(lx <= 3, s"x-sorted layout should prune x-boxes, touched $lx/16")
    assert(ly == 16, s"x-sorted layout cannot prune y, touched $ly/16")
    // z-order: BOTH dimensions prune to a sqrt-ish fraction
    assert(zx <= 8 && zy <= 8, s"z-order should prune both dims: x=$zx y=$zy of 16")

    // clustering is snapshot-safe: v1 (pre-cluster) still readable
    assert(CowTable.read(spark, path, asOf = Some(1)).count() == 40000)
  }

  test("branch: fork is zero-copy, writes stay invisible to main until publish") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 500L).map(i => (i, i * 10)).toDF("id", "score")
      .repartition(4), path)
    CowTable.createBranch(path, "audit")
    val bp = CowTable.branchPath(path, "audit")
    // forking copied no data: branch v1 references the parent's files
    assert(CowTable.snapshotFiles(bp).toSet == CowTable.snapshotFiles(path).toSet)

    // write on the branch through the NORMAL merge operator
    val upd = Seq((1L, -1L), (9000L, 1L)).toDF("id", "score")
    CowTable.merge(spark, bp, upd, "id")
    // audit reads see the branch state; main readers see none of it
    assert(CowTable.read(spark, bp).count() == 501)
    assert(CowTable.read(spark, bp).filter(col("id") === 1L)
      .select("score").as[Long].head() == -1L)
    assert(CowTable.read(spark, path).count() == 500)
    assert(CowTable.read(spark, path).filter(col("id") === 1L)
      .select("score").as[Long].head() == 10L)

    // publish fast-forwards main atomically
    val v = CowTable.publishBranch(path, "audit")
    assert(v == CowTable.currentVersion(path))
    assert(CowTable.read(spark, path).count() == 501)
    assert(CowTable.read(spark, path).filter(col("id") === 1L)
      .select("score").as[Long].head() == -1L)
    // pre-publish main still time-travelable
    assert(CowTable.read(spark, path, asOf = Some(1)).count() == 500)
  }

  test("cow_snapshot TVF: SQL time travel over the table format") {
    import spark.implicits._
    import org.apache.spark.sql.SparkSession
    val path = tmp
    CowTable.create((0L until 50L).map(i => (i, i)).toDF("id", "v"), path)
    CowTable.merge(spark, path, Seq((100L, 1L), (101L, 2L)).toDF("id", "v"), "id")
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      assert(ext.sql(s"SELECT count(*) FROM cow_snapshot('$path')")
        .head.getLong(0) == 52L)
      assert(ext.sql(s"SELECT count(*) FROM cow_snapshot('$path', 1)")
        .head.getLong(0) == 50L)
      // composes like any relation: joinable, filterable
      assert(ext.sql(
        s"""SELECT count(*) FROM cow_snapshot('$path') a
           |JOIN cow_snapshot('$path', 1) b ON a.id = b.id""".stripMargin)
        .head.getLong(0) == 50L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("cow_changes / cow_deletes TVFs: the CDC feed and MoR ledger from SQL") {
    import spark.implicits._
    import org.apache.spark.sql.SparkSession
    val path = tmp
    CowTable.create((0L until 50L).map(i => (i, i)).toDF("id", "v"), path)        // v1
    CowTable.merge(spark, path, Seq((100L, 1L), (3L, -3L)).toDF("id", "v"), "id") // v2
    CowTable.deleteMor(spark, path, "id = 7", "id")                               // v3
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val feed = ext.sql(
        s"SELECT id, _change_type FROM cow_changes('$path', 'id', 1, 3) ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(feed == Set((3L, "update"), (100L, "insert"), (7L, "delete")), feed.toString)
      val dels = ext.sql(s"SELECT * FROM cow_deletes('$path')")
        .collect().map(_.getLong(0)).toSet
      assert(dels == Set(7L), dels.toString)
      // pre-delete snapshot: empty ledger
      assert(ext.sql(s"SELECT * FROM cow_deletes('$path', 2)").isEmpty)
      // composes: the feed joins back to a snapshot
      assert(ext.sql(
        s"""SELECT count(*) FROM cow_changes('$path', 'id', 1, 2) c
           |JOIN cow_snapshot('$path') s ON c.id = s.id""".stripMargin)
        .head.getLong(0) == 2L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("cow_files / cow_history TVFs: the metadata tables from SQL") {
    import spark.implicits._
    import org.apache.spark.sql.SparkSession
    val path = tmp
    CowTable.create((0L until 50L).map(i => (i, i)).toDF("id", "v")
      .repartition(3), path)                                                       // v1: 3 data files
    CowTable.deleteMorKeys(spark, path, Seq(7L).toDF("id"), "id")                  // v2: +1 key sidecar
    CowTable.addColumn(spark, path, "tag", "string")                               // v3: schema line
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val kinds = ext.sql(
        s"SELECT kind, count(*) c FROM cow_files('$path') GROUP BY 1")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(kinds == Map("data" -> 3L, "delete_keys" -> 1L), kinds.toString)
      assert(ext.sql(s"SELECT * FROM cow_files('$path') WHERE size_bytes <= 0").isEmpty,
        "every referenced file exists with a positive size")
      // time travel: v1 has no sidecar yet
      assert(ext.sql(s"SELECT * FROM cow_files('$path', 1) WHERE kind <> 'data'").isEmpty)
      val hist = ext.sql(
        s"""SELECT version, n_data_files, n_delete_sidecars, has_schema
           |FROM cow_history('$path') ORDER BY version""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      assert(hist.toSeq == Seq((1L, 3L, 0L, false), (2L, 3L, 1L, false),
                               (3L, 3L, 1L, true)), hist.mkString(", "))
      // composes: history drives a maintenance decision in plain SQL
      assert(ext.sql(
        s"SELECT max(version) FROM cow_history('$path') WHERE n_delete_sidecars > 0")
        .head.getLong(0) == 3L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("cow_stats TVF: the per-file stats the manifest records, from SQL") {
    import spark.implicits._
    import org.apache.spark.sql.SparkSession
    val path = tmp
    CowTable.create((0L until 400L).map(i => (i, s"s$i")).toDF("id", "name")
      .repartitionByRange(4, col("id")), path)
    CowTable.setStatsColumns(spark, path, Seq("id", "name"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val rows = ext.sql(
        s"""SELECT column_name, count(*) n, sum(non_null_count) nn
           |FROM cow_stats('$path') GROUP BY 1 ORDER BY 1""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq(("id", 4L, 400L), ("name", 4L, 400L)), rows.mkString(", "))
      // the ranged layout shows in the recorded bounds: file min/max
      // ranges are disjoint, so max(min) > min(max) across files
      val idStats = ext.sql(
        s"""SELECT CAST(min_value AS BIGINT) mn, CAST(max_value AS BIGINT) mx
           |FROM cow_stats('$path') WHERE column_name = 'id' ORDER BY mn""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(idStats.length == 4 && idStats.sliding(2).forall {
        case Array(a, b) => a._2 < b._1
        case _ => true
      }, idStats.mkString(", "))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("cow_lookups TVF: the per-file lookup sidecars (dict vs bloom), from SQL") {
    import spark.implicits._
    import org.apache.spark.sql.SparkSession
    val path = tmp
    // 4 files: a LOW-NDV column (25 custs/file -> dict) and a HIGH-NDV
    // one (100 ids/file -> bloom under dictMax=32)
    CowTable.create((0L until 400L).map(i => (i, i % 100, s"s$i"))
      .toDF("id", "cust", "name").repartitionByRange(4, col("id")), path)
    CowTable.setLookupColumns(spark, path, Seq("id", "cust"),
      dictMax = 32, bloomBits = 4096)
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val byKind = ext.sql(
        s"""SELECT column_name, kind, count(*) n
           |FROM cow_lookups('$path') GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // cust repeats 0..99 per range file BUT 400/4=100 distinct per
      // file > 32 -> bloom; id is 100 distinct per file -> bloom too;
      // so shrink: check kinds are consistent with NDV vs dictMax
      assert(byKind.nonEmpty, "lookup sidecars recorded")
      val kinds = ext.sql(
        s"""SELECT column_name, kind, ndv_or_bits FROM cow_lookups('$path')
           |ORDER BY file, column_name""".stripMargin)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(kinds.forall { case (_, k, v) =>
        (k == "dict" && v <= 32) || (k == "bloom" && v == 4096) },
        kinds.mkString(", "))
      assert(kinds.map(_._1).toSet == Set("id", "cust"))
      // time travel: before the spec was declared there were no sidecars
      assert(ext.sql(s"SELECT * FROM cow_lookups('$path', 1)").isEmpty)
      // RETIRE (ADVICE r13): empty cols must drop the spec AND all B
      // lines — commit()'s mechanical carry must not re-add the base
      // snapshot's sidecars on the spec-less line set
      CowTable.setLookupColumns(spark, path, Seq.empty)
      assert(CowTable.lookupSpec(path).isEmpty, "spec retired")
      assert(ext.sql(s"SELECT * FROM cow_lookups('$path')").isEmpty,
        "retire must remove every B line, not just the L spec")
      // and a later data commit stays sidecar-free (no spec → no build)
      CowTable.append(spark, path,
        (400L until 410L).map(i => (i, i % 100, s"s$i")).toDF("id", "cust", "name"))
      assert(ext.sql(s"SELECT * FROM cow_lookups('$path')").isEmpty)
      // while the PRE-retire snapshot still time-travels its sidecars
      val retireV = CowTable.currentVersion(path) - 1
      assert(ext.sql(s"SELECT * FROM cow_lookups('$path', ${retireV - 1})")
        .count() > 0, "history keeps the sidecars")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("restore re-publishes an old snapshot as a new commit, history intact") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, i)).toDF("id", "v"), path)
    CowTable.merge(spark, path, Seq((1L, -1L), (500L, 5L)).toDF("id", "v"), "id")
    assert(CowTable.read(spark, path).count() == 101)
    val v3 = CowTable.restore(path, toVersion = 1)
    assert(v3 == 3 && CowTable.currentVersion(path) == 3)
    // current == v1 content; the "bad" v2 stays time-travelable
    assert(CowTable.read(spark, path).count() == 100)
    assert(CowTable.read(spark, path).filter(col("id") === 1L)
      .select("v").as[Long].head() == 1L)
    assert(CowTable.read(spark, path, asOf = Some(2)).count() == 101)
  }

  test("branch: publish refuses when main advanced past the fork point") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, i)).toDF("id", "v"), path)
    CowTable.createBranch(path, "wap")
    CowTable.merge(spark, CowTable.branchPath(path, "wap"),
      Seq((1L, -1L)).toDF("id", "v"), "id")
    // main advances independently -> fast-forward is impossible
    CowTable.merge(spark, path, Seq((2L, -2L)).toDF("id", "v"), "id")
    intercept[IllegalStateException] { CowTable.publishBranch(path, "wap") }
    // main unaffected by the failed publish
    assert(CowTable.read(spark, path).filter(col("id") === 1L)
      .select("v").as[Long].head() == 1L)
  }

  test("branch: expireSnapshots never vacuums files a live branch references") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 200L).map(i => (i, i)).toDF("id", "v")
      .repartition(4), path)
    CowTable.createBranch(path, "keepme")
    // rewrite EVERY main file so v1's files are unreferenced by main's
    // kept snapshot — only the branch still points at them
    CowTable.merge(spark, path,
      (0L until 200L).map(i => (i, -i)).toDF("id", "v"), "id")
    val (dropped, vacuumed) = CowTable.expireSnapshots(path, keepLast = 1)
    assert(dropped == 1 && vacuumed == 0) // branch holds every v1 file live
    assert(CowTable.read(spark, CowTable.branchPath(path, "keepme")).count() == 200)

    // dropping the branch releases them
    CowTable.dropBranch(path, "keepme")
    val (_, vacuumed2) = CowTable.expireSnapshots(path, keepLast = 1)
    assert(vacuumed2 > 0)
    assert(CowTable.read(spark, path).count() == 200) // main intact
  }

  test("branch: publish then drop never corrupts main (WAP full lifecycle)") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 300L).map(i => (i, i * 10)).toDF("id", "score")
      .repartition(4), path)
    CowTable.createBranch(path, "wap")
    val bp = CowTable.branchPath(path, "wap")
    // branch writes: an update (rewrites a file into the BRANCH's data
    // dir) and inserts
    CowTable.merge(spark, bp,
      Seq((5L, -5L), (900L, 1L), (901L, 2L)).toDF("id", "score"), "id")
    CowTable.publishBranch(path, "wap")
    // published manifest must reference NOTHING under _branches/
    val branchPrefix = java.nio.file.Paths.get(path, "_branches").toString
    assert(CowTable.snapshotFiles(path).forall(!_.startsWith(branchPrefix)),
      "published manifest still references branch-dir files")
    // the natural end of the WAP lifecycle: drop the branch, then read
    CowTable.dropBranch(path, "wap")
    val now = CowTable.read(spark, path)
    assert(now.count() == 302)
    assert(now.filter(col("id") === 5L).select("score").as[Long].head() == -5L)
    assert(now.filter(col("id") === 7L).select("score").as[Long].head() == 70L)
    // vacuum can manage the published files like any others: rewrite
    // everything, expire, and the relocated publish files get reclaimed
    CowTable.merge(spark, path,
      (0L until 300L).map(i => (i, -i)).toDF("id", "score"), "id")
    val (_, vac) = CowTable.expireSnapshots(path, keepLast = 1)
    assert(vac > 0, "expired publish-relocated files should vacuum")
    assert(CowTable.read(spark, path).count() == 302)
  }

  test("open cost is O(1) in commit count: _latest hint + direct manifest read") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 20L).map(i => (i, i)).toDF("id", "v"), path)
    // 99 further commits via restore (metadata-only, fast)
    (1 to 99).foreach(_ => CowTable.restore(path, 1))
    assert(CowTable.currentVersion(path) == 100)
    val hint = java.nio.file.Paths.get(path, "_snapshots", "_latest")
    assert(java.nio.file.Files.exists(hint))
    assert(new String(java.nio.file.Files.readAllBytes(hint)).trim == "100")
    // a STALE-LOW hint (crash between link and hint write) probes forward
    java.nio.file.Files.write(hint, "96".getBytes)
    assert(CowTable.currentVersion(path) == 100)
    // a corrupt hint falls back to the listing
    java.nio.file.Files.write(hint, "garbage".getBytes)
    assert(CowTable.currentVersion(path) == 100)
    assert(CowTable.read(spark, path).count() == 20)
    // time travel reads ONE manifest directly, no listing required
    assert(CowTable.snapshotFiles(path, Some(57)).nonEmpty)
  }

  test("schema evolution time-travels across the add-column boundary") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 50L).map(i => (i, i)).toDF("id", "v"), path)
    CowTable.merge(spark, path,
      Seq((1L, -1L, "tagged")).toDF("id", "v", "tag"), "id")
    // post-boundary: widened schema, pre-evolution rows null-filled
    assert(CowTable.read(spark, path).columns.toSet == Set("id", "v", "tag"))
    // pre-boundary snapshot keeps its ORIGINAL narrow schema
    val old = CowTable.read(spark, path, asOf = Some(1))
    assert(old.columns.toSet == Set("id", "v"))
    assert(old.count() == 50)
  }

  // ---- merge-on-read deletes (round 10) --------------------------------

  test("deleteMor: zero data-file churn, reads apply, time travel exact") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 1000L).map(i => (i, s"n_$i", i % 10))
      .toDF("id", "name", "g").repartitionByRange(8, col("id")), path)
    val f1 = CowTable.snapshotFiles(path, Some(1))
    val v2 = CowTable.deleteMor(spark, path, "id % 100 = 7", "id")
    assert(v2 == 2)
    // the whole point: the delete commit carries every data file over
    // by reference and writes only a key-list sidecar
    assert(CowTable.snapshotFiles(path, Some(2)) == f1,
      "a MoR delete must not touch data files")
    assert(CowTable.snapshotDeletes(path, Some(2)).size == 1)
    val now = CowTable.read(spark, path)
    assert(now.count() == 990)
    assert(now.filter(col("id") === 7L).isEmpty)
    // time travel: the pre-delete snapshot has no sidecar to apply
    assert(CowTable.read(spark, path, Some(1)).count() == 1000)
    // matching runs on the LOGICAL snapshot: re-delete is a no-commit
    assert(CowTable.deleteMor(spark, path, "id % 100 = 7", "id") == 2)
    // a second, disjoint delete stacks a second sidecar
    val v3 = CowTable.deleteMor(spark, path, "id % 100 = 8", "id")
    assert(v3 == 3 && CowTable.snapshotDeletes(path, Some(3)).size == 2)
    assert(CowTable.read(spark, path).count() == 980)
  }

  test("deleteMor: compact folds sidecars physically; old snapshots keep theirs") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 500L).map(i => (i, i * 2)).toDF("id", "v")
      .repartition(4), path)
    CowTable.deleteMor(spark, path, "id < 50", "id") // v2
    val v3 = CowTable.compact(spark, path, 2)
    assert(v3 == 3)
    assert(CowTable.snapshotDeletes(path, Some(3)).isEmpty,
      "compact must fold the sidecars into the data")
    assert(CowTable.read(spark, path).count() == 450)
    // physically gone: the raw data files of v3 no longer hold the rows
    val raw = spark.read.parquet(CowTable.snapshotFiles(path, Some(3)): _*)
    assert(raw.count() == 450)
    // sidecar-era snapshot still applies its sidecar; v1 still full
    assert(CowTable.read(spark, path, Some(2)).count() == 450)
    assert(CowTable.read(spark, path, Some(1)).count() == 500)
  }

  test("deleteMor: change feed emits preimage deletes; fold-only window is silent") {
    import spark.implicits._
    val path = tmp
    CowTable.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .repartition(1), path)
    CowTable.deleteMor(spark, path, "id <= 2", "id") // v2
    val feed = CowTable.changes(spark, path, "id", 1, 2)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("s"),
        r.getAs[String]("_change_type"))).toSet
    assert(feed == Set((1L, "a", "delete"), (2L, "b", "delete")),
      s"expected preimage deletes, got $feed")
    // compacting only RETIRES already-deleted rows: no logical change
    CowTable.compact(spark, path, 1) // v3
    assert(CowTable.changes(spark, path, "id", 2, 3).isEmpty)
    // and the full window collapses to the same two deletes
    val full = CowTable.changes(spark, path, "id", 1, 3)
      .select("id", "_change_type").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(full == Set((1L, "delete"), (2L, "delete")))
  }

  test("deleteMor: merge reinserting a deleted key revives it (and the feed says insert)") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, s"n_$i")).toDF("id", "s")
      .repartition(2), path)
    CowTable.deleteMor(spark, path, "id = 5", "id") // v2
    assert(CowTable.read(spark, path).filter(col("id") === 5L).isEmpty)
    CowTable.merge(spark, path, Seq((5L, "reborn")).toDF("id", "s"), "id") // v3
    val row5 = CowTable.read(spark, path).filter(col("id") === 5L)
      .select("s").as[String].collect().toSeq
    assert(row5 == Seq("reborn"), s"reinserted key must be live again: $row5")
    // the upsert cleared the key from the delete set entirely
    assert(CowTable.snapshotDeletes(path, Some(3)).isEmpty ||
      spark.read.parquet(CowTable.snapshotDeletes(path, Some(3)): _*)
        .filter(col("id") === 5L).isEmpty)
    // CDC: invisible at fromV, visible at toV → insert
    val feed = CowTable.changes(spark, path, "id", 2, 3)
      .filter(col("id") === 5L)
      .select("_change_type", "s").collect().map(r => (r.getString(0), r.getString(1)))
    assert(feed.toSeq == Seq(("insert", "reborn")), s"got ${feed.toSeq}")
  }

  test("deleteMor: incremental view maintenance refreshes the deleted rows' groups") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 400L).map(i => (i, i % 4, 1L)).toDF("id", "g", "x")
      .repartitionByRange(4, col("id")), path)
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(sum("x").as("n"))
    val mv1 = aggOf(CowTable.read(spark, path, Some(1)))
    // a pure-sidecar commit: no data-file diff for the dirty scan
    CowTable.deleteMor(spark, path, "g = 2 AND id < 100", "id") // v2
    val refreshed = CowTable.incrementalAgg(spark, path, "g", mv1, 1, 2)(aggOf)
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("n"))).toMap
    val full = aggOf(CowTable.read(spark, path, Some(2)))
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("n"))).toMap
    assert(refreshed == full,
      s"IVM missed the MoR-deleted groups: inc=$refreshed full=$full")
  }

  test("table maintenance: thresholds drive compact + sidecar fold + retention; steady state is a no-op") {
    import spark.implicits._
    import graft.sinks.TableMaintenance
    val path = tmp
    CowTable.create((0L until 2000L).map(i => (i, i)).toDF("id", "v")
      .repartition(4), path)
    // churn: 12 small merges (small files pile up) + 2 MoR deletes
    (1 to 12).foreach { k =>
      CowTable.merge(spark, path,
        Seq((10000L + k, k.toLong)).toDF("id", "v"), "id")
    }
    CowTable.deleteMor(spark, path, "id < 100", "id")
    CowTable.deleteMor(spark, path, "id >= 1900 AND id < 2000", "id")
    val before = CowTable.read(spark, path).count()
    assert(before == 2012 - 200)
    assert(CowTable.snapshotDeletes(path).size == 2)
    val files = CowTable.snapshotFiles(path).size
    val policy = TableMaintenance.Policy(
      maxDataFiles = 8, maxDeleteSidecars = 1, keepSnapshots = 2, targetFiles = 4)
    val r1 = TableMaintenance.runOnce(spark, path, policy)
    assert(r1.compacted && r1.foldedSidecars == 2, r1.toString)
    assert(r1.expiredManifests > 0, s"old manifests should expire: $r1")
    // the pre-compact snapshot is still inside the retention window, so
    // its small files legitimately survive this vacuum (time travel to
    // it stays exact); one more commit pushes it past retention and the
    // NEXT pass reclaims the churn
    assert(CowTable.read(spark, path).count() == before)
    assert(CowTable.snapshotDeletes(path).isEmpty)
    assert(CowTable.snapshotFiles(path).size <= 4)
    CowTable.merge(spark, path, Seq((20000L, 1L)).toDF("id", "v"), "id")
    val r1b = TableMaintenance.runOnce(spark, path, policy)
    assert(!r1b.compacted && r1b.vacuumedFiles > 0,
      s"second pass should vacuum the pre-compact files: $r1b (files before: $files)")
    assert(CowTable.read(spark, path).count() == before + 1)
    // steady state: a further pass commits and reclaims nothing
    val v = CowTable.currentVersion(path)
    val r2 = TableMaintenance.runOnce(spark, path, policy)
    assert(!r2.compacted && r2.foldedSidecars == 0 && r2.vacuumedFiles == 0 &&
      r2.version == v, r2.toString)
    assert(CowTable.read(spark, path).count() == before + 1)
  }

  test("gdpr delete stream: each batch is one sidecar commit, zero data-file churn, replay-safe") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmp
    CowTable.create((0L until 1000L).map(i => (i, s"u_$i")).toDF("id", "payload")
      .repartition(4), path)
    val dataFiles = CowTable.snapshotFiles(path).toSet
    val stream = MemoryStream[Long]
    val q = graft.sinks.Sinks.gdprDeleteStream(
      stream.toDF().toDF("id"), path, "id",
      java.nio.file.Files.createTempDirectory("gdpr_cp").toString)
    stream.addData(1L, 500L, 999L)
    q.processAllAvailable()
    assert(CowTable.read(spark, path).count() == 997)
    // batch 2: one new key + a REPLAYED key (already deleted — no-op share)
    stream.addData(500L, 7L)
    q.processAllAvailable()
    q.stop()
    assert(CowTable.read(spark, path).count() == 996)
    // the whole stream never touched a data file
    assert(CowTable.snapshotFiles(path).toSet == dataFiles,
      "GDPR stream must be sidecar-only")
    // time travel still shows the pre-delete world
    assert(CowTable.read(spark, path, Some(1)).count() == 1000)
  }

  test("MoR change feed: small delete sets reach the carried-file scan as a literal In") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 1000L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(4, col("id")), path)
    CowTable.deleteMor(spark, path, "id = 5 OR id = 900", "id") // v2
    val feed = CowTable.changes(spark, path, "id", 1, 2)
    // the preimage scan over CARRIED files (nothing moved — that is
    // deleteMor's point) must carry a literal In that reaches the
    // parquet footers, so a key-clustered layout skips the untouched
    // files instead of scanning the table
    val plan = feed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(id"),
      s"carried scan must push a literal In:\n${plan.take(1200)}")
    val rows = feed.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"))).toSet
    assert(rows == Set((5L, "delete"), (900L, "delete")), rows.toString)
  }

  test("shallow clone: zero-copy fork, fully independent writes, sidecars carried") {
    import spark.implicits._
    val src = tmp; val dest = tmp + "_clone"
    CowTable.create((0L until 300L).map(i => (i, i)).toDF("id", "v")
      .repartition(3), src)
    CowTable.deleteMor(spark, src, "id < 30", "id") // v2 with a sidecar
    CowTable.shallowClone(src, dest)
    // zero-copy: the clone's v1 IS the source's manifest content
    assert(CowTable.snapshotFiles(dest, Some(1)) == CowTable.snapshotFiles(src, Some(2)))
    assert(CowTable.snapshotDeletes(dest, Some(1)).nonEmpty)
    assert(CowTable.read(spark, dest).count() == 270)
    // independent: writes to the clone never touch the source...
    CowTable.merge(spark, dest, Seq((1000L, 1L)).toDF("id", "v"), "id")
    CowTable.delete(spark, dest, "id >= 290")
    assert(CowTable.read(spark, dest).count() == 260)
    assert(CowTable.read(spark, src).count() == 270)
    assert(CowTable.currentVersion(src) == 2)
    // ...and source-side writes never move the clone
    CowTable.merge(spark, src, Seq((2000L, 2L)).toDF("id", "v"), "id")
    assert(CowTable.read(spark, dest).count() == 260)
    // compacting the clone severs the file dependency on the source
    CowTable.compact(spark, dest, 2)
    val srcData = java.nio.file.Paths.get(src, "data").toString
    assert(CowTable.snapshotFiles(dest).forall(!_.startsWith(srcData)),
      "post-compact clone must own every file it references")
  }

  // ------------------------------------------------------------------
  // round 11: composite-key + positional MoR deletes, declared schema
  // evolution, hidden partitioning, exactly-once pair delivery replay
  // ------------------------------------------------------------------

  test("composite-key deleteMor: exact, sidecar-only, key contract enforced") {
    import spark.implicits._
    val path = tmp
    val base = (for { r <- Seq("eu", "us"); i <- 0L until 200L } yield (r, i, i * 2))
      .toDF("region", "id", "v").repartition(4)
    CowTable.create(base, path)
    val files = CowTable.snapshotFiles(path).toSet
    val v2 = CowTable.deleteMor(spark, path, "region = 'eu' AND id < 50", Seq("region", "id"))
    assert(v2 == 2)
    assert(CowTable.snapshotFiles(path).toSet == files,
      "composite MoR delete must be sidecar-only")
    val now = CowTable.read(spark, path)
    assert(now.count() == 350)
    assert(now.filter(col("region") === "eu" && col("id") < 50).count() == 0)
    // the OTHER region's rows with the same ids must survive — a
    // single-key sidecar on id alone would wrongly kill them
    assert(now.filter(col("region") === "us" && col("id") < 50).count() == 50)
    assert(CowTable.read(spark, path, Some(1)).count() == 400)
    // change feed joins on the SIDECAR'S OWN columns, not the caller key
    val feed = CowTable.changes(spark, path, "id", 1, 2)
    assert(feed.filter(col("_change_type") === "delete").count() == 50)
    // contract: a later delete with a DIFFERENT key set fails loudly
    intercept[IllegalArgumentException] {
      CowTable.deleteMor(spark, path, "id = 60", Seq("id"))
    }
    // a merge on a different key carries composite sidecars untouched
    CowTable.merge(spark, path, Seq(("us", 1000L, 1L)).toDF("region", "id", "v"), "id")
    assert(CowTable.read(spark, path).count() == 351)
    assert(CowTable.snapshotDeletes(path).nonEmpty, "composite sidecar must survive the merge")
    // compact folds them physically; time travel before it stays exact
    CowTable.compact(spark, path, 2)
    assert(CowTable.snapshotDeletes(path).isEmpty)
    assert(CowTable.read(spark, path).count() == 351)
    assert(CowTable.read(spark, path, Some(1)).count() == 400)
  }

  test("positional deleteMorWhere: range-bounded sidecar, reads/feed/TT/merge exact") {
    import spark.implicits._
    val path = tmp
    // layout clustered by id → the predicate's rows are contiguous runs
    val df = (0L until 2000L).map(i => (i, if (i < 200) "xx" else "en", i))
      .toDF("id", "lang", "v").repartitionByRange(8, col("id"))
    CowTable.create(df, path)
    val files = CowTable.snapshotFiles(path).toSet
    val v2 = CowTable.deleteMorWhere(spark, path, "lang = 'xx'") // 10% of the table
    assert(v2 == 2)
    assert(CowTable.snapshotFiles(path).toSet == files,
      "positional delete must write no data file")
    val pos = CowTable.snapshotPositionDeletes(path)
    assert(pos.nonEmpty)
    // the design bound: file-count × run-count, NOT deleted-row count —
    // 200 clustered rows collapse to a handful of ranges
    val sidecarRows = spark.read.parquet(pos: _*).count()
    assert(sidecarRows <= 8, s"expected <=8 ranges for a clustered 200-row delete, got $sidecarRows")
    val now = CowTable.read(spark, path)
    assert(now.count() == 1800 && now.filter(col("lang") === "xx").count() == 0)
    assert(CowTable.read(spark, path, Some(1)).count() == 2000)
    // change feed emits exactly the 200 preimage deletes
    val feed = CowTable.changes(spark, path, "id", 1, 2)
    assert(feed.count() == 200)
    assert(feed.filter(col("_change_type") === "delete").count() == 200)
    // a second predicate delete stacks (reads WITH existing positional
    // sidecars on the readWithPos path); re-deleting is a no-op commit
    val v3 = CowTable.deleteMorWhere(spark, path, "id >= 1900")
    assert(CowTable.read(spark, path).count() == 1700)
    assert(CowTable.deleteMorWhere(spark, path, "lang = 'xx'") == v3)
    // merge rewriting a touched file must NOT resurrect its deleted rows
    CowTable.merge(spark, path, Seq((100L, "en", -1L)).toDF("id", "lang", "v"), "id")
    val merged = CowTable.read(spark, path)
    assert(merged.count() == 1701, "upsert revives exactly its own row")
    assert(merged.filter(col("lang") === "xx").count() === 0,
      "rewrite must filter positionally-deleted rows, not resurrect them")
    // compact folds positions physically; the feed across a fold-only
    // window is silent (no logical change)
    val vPre = CowTable.currentVersion(path)
    CowTable.compact(spark, path, 4)
    assert(CowTable.snapshotPositionDeletes(path).isEmpty)
    assert(CowTable.read(spark, path).count() == 1701)
    assert(CowTable.changes(spark, path, "id", vPre, vPre + 1).count() == 0)
  }

  test("positional deletes: IVM refreshes exactly the deleted rows' groups") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 400L).map(i => (i, i % 4, 1L)).toDF("id", "g", "x")
      .repartitionByRange(4, col("id")), path)
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(sum("x").as("n"))
    val mv1 = aggOf(CowTable.read(spark, path, Some(1)))
    CowTable.deleteMorWhere(spark, path, "g = 2 AND id < 100") // v2, pure positional commit
    val refreshed = CowTable.incrementalAgg(spark, path, "g", mv1, 1, 2)(aggOf)
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("n"))).toMap
    val full = aggOf(CowTable.read(spark, path, Some(2)))
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("n"))).toMap
    assert(refreshed == full, s"IVM missed position-deleted groups: inc=$refreshed full=$full")
  }

  test("schema evolution: add/rename/widen/drop are metadata-only; reads + merge exact") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, s"n_$i", i.toInt)).toDF("id", "name", "score")
      .repartition(2), path) // v1
    val v1Files = CowTable.snapshotFiles(path, Some(1)).toSet

    // ADD: metadata-only; pre-evolution rows read null
    CowTable.addColumn(spark, path, "tag", "string") // v2
    assert(CowTable.snapshotFiles(path).toSet == v1Files, "addColumn must not write data")
    val r2 = CowTable.read(spark, path)
    assert(r2.columns.toSeq == Seq("id", "name", "score", "tag"))
    assert(r2.filter(col("tag").isNotNull).count() == 0)

    // merge rows THROUGH the evolved schema
    CowTable.merge(spark, path,
      Seq((5L, "upd_5", 50, "gold"), (200L, "new_200", 7, "fresh"))
        .toDF("id", "name", "score", "tag"), "id") // v3
    val r3 = CowTable.read(spark, path)
    assert(r3.count() == 101)
    assert(r3.filter(col("tag") === "gold").select("id").as[Long].head() == 5L)

    // RENAME: old files keep `score` physically; lineage resolves per row
    CowTable.renameColumn(spark, path, "score", "pts") // v4
    val r4 = CowTable.read(spark, path)
    assert(r4.columns.toSeq == Seq("id", "name", "pts", "tag"))
    assert(r4.filter(col("id") === 7L).select("pts").as[Int].head() == 7)
    assert(r4.filter(col("id") === 5L).select("pts").as[Int].head() == 50)

    // WIDEN int → bigint; narrowing refused
    CowTable.widenColumn(spark, path, "pts", "bigint") // v5
    assert(CowTable.read(spark, path).schema("pts").dataType ==
      org.apache.spark.sql.types.LongType)
    intercept[IllegalArgumentException] {
      CowTable.widenColumn(spark, path, "pts", "int")
    }
    // merge under the RENAMED + widened declared name
    CowTable.merge(spark, path, Seq((7L, "upd_7", 700L, "silver"))
      .toDF("id", "name", "pts", "tag"), "id") // v6
    val r6 = CowTable.read(spark, path)
    assert(r6.filter(col("id") === 7L).select("pts").as[Long].head() == 700L)
    assert(r6.filter(col("id") === 8L).select("pts").as[Long].head() == 8L,
      "carried pre-rename rows must resolve through the lineage")

    // DROP: invisible immediately; re-adding the name needs compact first
    CowTable.dropColumn(spark, path, "name") // v7
    assert(CowTable.read(spark, path).columns.toSeq == Seq("id", "pts", "tag"))
    intercept[IllegalArgumentException] {
      CowTable.addColumn(spark, path, "name", "string")
    }
    CowTable.compact(spark, path, 2) // physically retires `name`/`score`
    CowTable.addColumn(spark, path, "name", "string")
    val rf = CowTable.read(spark, path)
    assert(rf.columns.toSeq == Seq("id", "pts", "tag", "name"))
    assert(rf.filter(col("name").isNotNull).count() == 0,
      "re-added column must not leak retired physical data")

    // TIME TRAVEL: every snapshot reads through the schema IT declared
    assert(CowTable.read(spark, path, Some(1)).columns.toSeq == Seq("id", "name", "score"))
    assert(CowTable.read(spark, path, Some(3)).columns.toSeq == Seq("id", "name", "score", "tag"))
    assert(CowTable.read(spark, path, Some(4)).columns.toSeq == Seq("id", "name", "pts", "tag"))
  }

  test("schema evolution: change feed presents one declared schema across the boundary") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 50L).map(i => (i, i.toInt)).toDF("id", "score")
      .repartition(2), path) // v1
    CowTable.addColumn(spark, path, "tag", "string") // v2 (metadata only)
    CowTable.renameColumn(spark, path, "score", "pts") // v3 (metadata only)
    CowTable.merge(spark, path,
      Seq((1L, 100L, "hot"), (500L, 7L, "new")).toDF("id", "pts", "tag"), "id") // v4
    // a metadata-only window is silent
    assert(CowTable.changes(spark, path, "id", 1, 3).count() == 0)
    // the cross-evolution window projects preimages through v4's schema
    val feed = CowTable.changes(spark, path, "id", 1, 4)
    assert(feed.columns.contains("pts") && feed.columns.contains("tag") &&
      !feed.columns.contains("score"), feed.columns.mkString(","))
    val byType = feed.groupBy("_change_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byType == Map("update" -> 1L, "insert" -> 1L), byType.toString)
    assert(feed.filter(col("_change_type") === "update")
      .select("pts").as[Long].head() == 100L)
  }

  test("hidden partitioning: spec evolution is metadata-only; pruning across the boundary") {
    import spark.implicits._
    import graft.sinks.PartitionTransform
    val path = tmp
    val old = (0L until 300L).map(i => (i, s"2024-03-0${1 + i % 3} 10:00:00", i))
      .toDF("id", "ts", "v").repartition(2)
    CowTable.create(old, path) // v1: unpartitioned layout
    val v1Files = CowTable.snapshotFiles(path, Some(1))
    assert(CowTable.partitionSpec(path).isEmpty)
    val v2 = CowTable.setPartitionSpec(path, Seq(PartitionTransform.day("ts")))
    assert(v2 == 2)
    assert(CowTable.snapshotFiles(path, Some(2)) == v1Files,
      "partition-spec change must be metadata-only")
    // new writes lay out under the transform; queries never name it
    CowTable.merge(spark, path,
      (1000L until 1300L).map(i => (i, s"2024-03-0${4 + i % 3} 10:00:00", i))
        .toDF("id", "ts", "v"), "id") // v3, pure insert
    val newFiles = CowTable.snapshotFiles(path).filterNot(v1Files.contains)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("/p_day_ts=")),
      s"new files must carry the transform layout: ${newFiles.take(2)}")
    // the data schema is UNCHANGED — the transform column lives only in paths
    assert(CowTable.read(spark, path).columns.toSeq == Seq("id", "ts", "v"))
    assert(CowTable.read(spark, path).count() == 600)
    // pruning: old-layout files all survive (over-approximate, never
    // wrong); new-layout files prune to the matching day directory
    val pruned = CowTable.prunedFilesEq(spark, path, "ts", "2024-03-05 10:00:00")
    assert(v1Files.forall(pruned.contains), "pre-spec files must never be pruned")
    val prunedNew = pruned.filter(_.contains("/p_day_ts="))
    assert(prunedNew.nonEmpty && prunedNew.forall(_.contains("/p_day_ts=2024-03-05/")))
    assert(pruned.size < CowTable.snapshotFiles(path).size, "pruning must drop some files")
    // pruned read == unpruned filtered read
    val got = CowTable.readPrunedEq(spark, path, "ts", "2024-03-05 10:00:00")
    assert(got.count() == 100)
    assert(got.select(sum("v")).as[Long].head() ==
      CowTable.read(spark, path).filter(col("ts") === "2024-03-05 10:00:00")
        .select(sum("v")).as[Long].head())
  }

  test("hidden partitioning: bucket transform prunes type-stably; compact keeps the layout") {
    import spark.implicits._
    import graft.sinks.PartitionTransform
    val path = tmp
    CowTable.create((0L until 400L).map(i => (i, i * 3)).toDF("id", "v"),
      path, Seq(PartitionTransform.bucket(8, "id"))) // id is a LONG column
    assert(CowTable.partitionSpec(path) == Seq(PartitionTransform.bucket(8, "id")))
    val all = CowTable.snapshotFiles(path)
    assert(all.forall(_.contains("/p_bucket8_id=")))
    // an Int literal against the Long column must land in the SAME
    // bucket (canonical-string hashing) — a type-sensitive hash here
    // would WRONGLY prune the row away
    val got = CowTable.readPrunedEq(spark, path, "id", 5)
    assert(got.count() == 1 && got.select("v").as[Long].head() == 15L)
    val pruned = CowTable.prunedFilesEq(spark, path, "id", 5)
    assert(pruned.size < all.size, "bucket pruning must drop non-matching buckets")
    // compact rewrites under the current spec
    CowTable.compact(spark, path, 2)
    assert(CowTable.snapshotFiles(path).forall(_.contains("/p_bucket8_id=")))
    assert(CowTable.readPrunedEq(spark, path, "id", 5).count() == 1)
    assert(CowTable.read(spark, path).count() == 400)
  }

  test("incremental dedup pipeline: post-commit replay preserves delivered pairs") {
    import spark.implicits._
    import graft.sinks.Sinks
    val dir = java.nio.file.Files.createTempDirectory("inc_replay").toString
    val corpus = s"$dir/corpus"; val index = s"$dir/index"; val pairsOut = s"$dir/pairs"
    def pairsOf(id: Long) = spark.read.parquet(s"$pairsOut/batch_id=$id")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b0 = Seq((1L, "en", "web", "a b c d e f g h i j"),
      (2L, "en", "web", "k l m n o p q r s t")).toDF("doc_id", "lang", "source", "text")
    Sinks.incrementalDedupBatch(b0, 0L, corpus, index, pairsOut, Seq("lang", "source"))
    val b1 = Seq((10L, "en", "web", "a b c d e f g h i j"))
      .toDF("doc_id", "lang", "source", "text")
    Sinks.incrementalDedupBatch(b1, 1L, corpus, index, pairsOut, Seq("lang", "source"))
    assert(pairsOf(1L) == Set((1L, 10L)))
    // the ADVICE r10 high: a crash BETWEEN sink completion and the
    // stream's checkpoint commit replays the batch with the marker
    // already advanced — the CDC window is empty, and the old code
    // OVERWROTE the delivered pairs with that empty set
    Sinks.incrementalDedupBatch(b1, 1L, corpus, index, pairsOut, Seq("lang", "source"))
    assert(pairsOf(1L) == Set((1L, 10L)),
      "post-commit replay must preserve the first attempt's pairs")
    // the replayed merge was content-identical → no new flags downstream
    val b2 = Seq((20L, "de", "web", "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))
      .toDF("doc_id", "lang", "source", "text")
    Sinks.incrementalDedupBatch(b2, 2L, corpus, index, pairsOut, Seq("lang", "source"))
    assert(pairsOf(2L).isEmpty)
    assert(spark.read.parquet(pairsOut).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
  }

  test("gdpr delete stream: a missing target table fails the batch — requests retry, never drop") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("gdpr_retry").toString
    val path = s"$dir/table" // does not exist yet
    val cp = s"$dir/cp"
    val stream = MemoryStream[Long]
    val q1 = graft.sinks.Sinks.gdprDeleteStream(stream.toDF().toDF("id"), path, "id", cp)
    stream.addData(1L, 2L)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    // the checkpoint did NOT commit: creating the table and restarting
    // re-delivers the failed batch instead of having silently dropped it
    CowTable.create((0L until 10L).map(i => (i, i)).toDF("id", "v"), path)
    val q2 = graft.sinks.Sinks.gdprDeleteStream(stream.toDF().toDF("id"), path, "id", cp)
    q2.processAllAvailable()
    q2.stop()
    assert(CowTable.read(spark, path).count() == 8,
      "the failed batch's deletion requests must apply after the retry")
  }

  test("deleteMor: restore and vacuum preserve the sidecar set") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 200L).map(i => (i, i)).toDF("id", "v")
      .repartition(2), path)
    CowTable.deleteMor(spark, path, "id >= 150", "id") // v2: 150 rows
    CowTable.merge(spark, path, Seq((0L, -1L)).toDF("id", "v"), "id") // v3
    // restore to the MoR-delete snapshot: sidecar must come back too
    val v4 = CowTable.restore(path, 2)
    assert(v4 == 4)
    assert(CowTable.snapshotDeletes(path, Some(4)).nonEmpty)
    assert(CowTable.read(spark, path).count() == 150)
    // vacuum down to the last two snapshots: their sidecars stay live
    CowTable.expireSnapshots(path, keepLast = 2)
    assert(CowTable.read(spark, path).count() == 150)
    assert(CowTable.read(spark, path, Some(3)).count() == 150)
  }

  test("hidden partitioning: day transform is session-TZ-independent (write LA, prune Kolkata)") {
    import spark.implicits._
    import graft.sinks.PartitionTransform
    import java.time.Instant
    val path = tmp
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // writer session in LA: 2024-03-06T01:00Z is 2024-03-05 17:00 LOCAL —
      // a session-zone day transform would write p_day_ts=2024-03-05
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val probe = java.sql.Timestamp.from(Instant.parse("2024-03-06T01:00:00Z"))
      val rows = Seq(
        (1L, java.sql.Timestamp.from(Instant.parse("2024-03-05T23:30:00Z"))),
        (2L, probe),
        (3L, java.sql.Timestamp.from(Instant.parse("2024-03-04T22:00:00Z"))))
      CowTable.create(rows.toDF("id", "ts"), path, Seq(PartitionTransform.day("ts")))
      // the instant lands under its UTC calendar day, not the writer zone's
      val files = CowTable.snapshotFiles(path)
      assert(files.exists(_.contains("/p_day_ts=2024-03-06/")),
        s"instant must partition by UTC day: ${files.mkString("\n")}")
      // pruner session in Kolkata (UTC+5:30, the opposite shift): the same
      // instant literal must compute the same directory string — a
      // session-zone transform would compute 2024-03-06 vs the writer's
      // 2024-03-05 and silently prune the matching file away
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      val pruned = CowTable.prunedFilesEq(spark, path, "ts", probe)
      assert(pruned.size < files.size, "pruning must drop the other days")
      val got = CowTable.readPrunedEq(spark, path, "ts", probe)
      assert(got.count() == 1 && got.select("id").as[Long].head() == 2L,
        "cross-zone prune must keep the matching instant's file")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("hidden partitioning: pruner literal of another numeric family canonicalizes") {
    import spark.implicits._
    import graft.sinks.PartitionTransform
    val path = tmp
    // identity transform over a DOUBLE column writes directories like
    // v=5.0 — an Int literal 5 must still find them (the pruner casts
    // the literal to the SOURCE column type before transforming)
    CowTable.create(Seq((1L, 5.0d), (2L, 7.5d), (3L, 15.0d)).toDF("id", "v"),
      path, Seq(PartitionTransform.identity("v")))
    val all = CowTable.snapshotFiles(path)
    assert(all.exists(_.contains("/p_v=5.0/")))
    val got = CowTable.readPrunedEq(spark, path, "v", 5) // Int vs DOUBLE column
    assert(got.count() == 1 && got.select("id").as[Long].head() == 1L)
    assert(CowTable.prunedFilesEq(spark, path, "v", 5).size < all.size)
    // truncate over the same double family: Int literal 15 → bucket 10
    val path2 = tmp
    CowTable.create(Seq((1L, 5.0d), (2L, 15.0d)).toDF("id", "v"),
      path2, Seq(PartitionTransform.truncate(10, "v")))
    val t = CowTable.readPrunedEq(spark, path2, "v", 15)
    assert(t.count() == 1 && t.select("id").as[Long].head() == 2L)
  }

  test("change feed: distinct preimage rows sharing a key fail loudly, not collapse") {
    import spark.implicits._
    val path = tmp
    // nothing enforces key uniqueness on create/append — two DISTINCT
    // rows share id=1; deleting the key yields two distinct preimages
    CowTable.create(Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "payload"), path)
    CowTable.deleteMor(spark, path, "id = 1", "id") // v2: key sidecar for id=1
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    val e = intercept[Exception] {
      CowTable.changes(spark, path, "id", 1, 2).collect()
    }
    assert(msgs(e).contains("key-unique"),
      s"expected the loud key-unique contract error, got: ${msgs(e).take(400)}")
    // a clean key-unique table still feeds changes() normally
    val path2 = tmp
    CowTable.create(Seq((1L, "a"), (2L, "c")).toDF("id", "payload"), path2)
    CowTable.deleteMor(spark, path2, "id = 1", "id")
    val feed = CowTable.changes(spark, path2, "id", 1, 2).collect()
    assert(feed.length == 1 && feed.head.getAs[String]("_change_type") == "delete")
  }

  // ---- per-file column statistics (round 12, VERDICT r11 task 3) --------

  test("file stats: band predicate on a clustered table opens <half the files, identical rows") {
    import spark.implicits._
    val path = tmp
    // values shuffled across 16 files so the unclustered layout cannot prune
    CowTable.create((0L until 40000L).map(i => ((i * 7919L) % 40000L, i))
      .toDF("v", "payload").repartition(16), path)
    CowTable.setStatsColumns(spark, path, Seq("v"))
    // before clustering every file spans ~the whole domain: no skipping
    assert(CowTable.prunedFilesRange(spark, path, "v", Some(1000L), Some(3000L)).size
      == CowTable.snapshotFiles(path).size)
    CowTable.cluster(spark, path, files = 16, zcols = Seq("v"))
    val all = CowTable.snapshotFiles(path)
    val pruned = CowTable.prunedFilesRange(spark, path, "v", Some(1000L), Some(3000L))
    assert(pruned.size < all.size / 2,
      s"manifest stats skipped too little: ${pruned.size} of ${all.size} files open")
    val viaStats = CowTable.readPrunedRange(spark, path, "v", Some(1000L), Some(3000L))
      .orderBy("v", "payload").collect().toSeq
    val full = CowTable.read(spark, path)
      .filter(col("v") >= 1000L && col("v") <= 3000L)
      .orderBy("v", "payload").collect().toSeq
    assert(viaStats == full && full.size == 2001)
  }

  test("file stats: writes record, rewrites retire, MoR deletes stay over-approximate") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 1000L).map(i => (i, i % 7)).toDF("id", "g").repartition(4), path)
    CowTable.setStatsColumns(spark, path, Seq("id"))
    assert(CowTable.fileStats(path).keySet == CowTable.snapshotFiles(path).toSet)
    CowTable.append(spark, path, Seq((5000L, 1L), (5001L, 2L)).toDF("id", "g"))
    assert(CowTable.fileStats(path).keySet == CowTable.snapshotFiles(path).toSet,
      "appended files must carry fresh stats")
    CowTable.merge(spark, path, Seq((1L, 99L)).toDF("id", "g"), "id")
    assert(CowTable.fileStats(path).keySet == CowTable.snapshotFiles(path).toSet,
      "a rewrite must retire the rewritten file's stats line with the file")
    // MoR delete: stats untouched (bounds merely widen) and the deleted
    // row must NOT resurrect through the pruned read face
    CowTable.deleteMorKeys(spark, path, Seq(Tuple1(5000L)).toDF("id"), "id")
    val r = CowTable.readPrunedRange(spark, path, "id", Some(4999L), Some(5002L))
    assert(r.select("id").as[Long].collect().toSeq.sorted == Seq(5001L))
  }

  test("file stats: survive rename lineage; cross-family and string literals canonicalize") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 1000L).map(i => (i, i.toDouble / 4))
      .toDF("id", "score").repartitionByRange(4, col("id")), path)
    CowTable.setStatsColumns(spark, path, Seq("id", "score"))
    // DOUBLE column probed with Int literals: canonicalized, pruned, exact
    assert(CowTable.prunedFilesRange(spark, path, "score", Some(10), Some(20)).size
      < CowTable.snapshotFiles(path).size)
    assert(CowTable.readPrunedRange(spark, path, "score", Some(10), Some(20)).count()
      == CowTable.read(spark, path).filter(col("score").between(10, 20)).count())
    // rename: stats recorded under the OLD physical name keep pruning
    CowTable.renameColumn(spark, path, "id", "doc_id")
    assert(CowTable.prunedFilesRange(spark, path, "doc_id", Some(0L), Some(99L)).size
      < CowTable.snapshotFiles(path).size)
    assert(CowTable.readPrunedRange(spark, path, "doc_id", Some(0L), Some(99L))
      .select("doc_id").as[Long].collect().toSeq.sorted == (0L until 100L))

    // string column: UTF-8 byte-order bounds
    val sp = tmp
    CowTable.create((0 until 260).map(i => (i.toLong, f"k$i%03d")).toDF("id", "name")
      .repartitionByRange(4, col("name")), sp)
    CowTable.setStatsColumns(spark, sp, Seq("name"))
    assert(CowTable.prunedFilesRange(spark, sp, "name", Some("k100"), Some("k120")).size
      < CowTable.snapshotFiles(sp).size)
    assert(CowTable.readPrunedRange(spark, sp, "name", Some("k100"), Some("k120"))
      .count() == 21)
  }

  test("file stats: literal-IN skipping reaches the IVM dirty recompute") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 10000L).map(i => (i % 100, i))
      .toDF("g", "v").repartitionByRange(8, col("g")), path)
    CowTable.setStatsColumns(spark, path, Seq("g"))
    val v1 = CowTable.currentVersion(path)
    val mv1 = CowTable.read(spark, path).groupBy("g").agg(sum("v").as("s"))
      .localCheckpoint()
    CowTable.append(spark, path, Seq((3L, 1000000L), (4L, 2000000L)).toDF("g", "v"))
    val v2 = CowTable.currentVersion(path)
    // the dirty keys' recompute read opens a strict subset of the files
    assert(CowTable.prunedFilesIn(spark, path, "g", Seq(3L, 4L), Some(v2)).size
      < CowTable.snapshotFiles(path, Some(v2)).size)
    val mv2 = CowTable.incrementalAgg(spark, path, "g", mv1, v1, v2)(
      df => df.groupBy("g").agg(sum("v").as("s")))
    val full = CowTable.read(spark, path).groupBy("g").agg(sum("v").as("s"))
    assert(mv2.orderBy("g").collect().toSeq == full.orderBy("g").collect().toSeq)
  }

  test("deleteMorPosKeys: pins current rows only — a re-appended key stays live") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, s"v$i")).toDF("id", "x").repartition(4), path)
    val before = CowTable.snapshotFiles(path).toSet
    // positional retire of 3 keys: zero data files rewritten
    CowTable.deleteMorPosKeys(spark, path, Seq(7L, 8L, 9L).toDF("id"))
    assert(CowTable.snapshotFiles(path).toSet == before, "positional delete must not rewrite data")
    assert(CowTable.read(spark, path).filter(col("id").isin(7L, 8L, 9L)).count() == 0)
    // the key-sidecar trap this API exists to avoid: an APPEND of a
    // retired key must be visible (a key sidecar would hide it)
    CowTable.append(spark, path, Seq((8L, "reborn")).toDF("id", "x"))
    val back = CowTable.read(spark, path).filter(col("id") === 8L)
      .select("x").as[String].collect().toSeq
    assert(back == Seq("reborn"))
    assert(CowTable.read(spark, path).count() == 98)
  }

  test("upsertMorPos: delete + append land in ONE commit; txn makes replays no-ops") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, s"v$i")).toDF("id", "x")
      .repartition(4), path)
    val v0 = CowTable.currentVersion(path)
    val dataBefore = CowTable.snapshotFiles(path).toSet
    val keys = Seq(7L, 8L).toDF("id")
    val adds = Seq((7L, "v7b"), (8L, "v8b"), (200L, "new")).toDF("id", "x")
    val v1 = CowTable.upsertMorPos(spark, path, keys, adds, txn = Some(("app", 1L)))
    assert(v1 == v0 + 1, "preimage deletes + postimage appends must be ONE commit")
    assert(dataBefore.subsetOf(CowTable.snapshotFiles(path).toSet),
      "the upsert is rewrite-free: original data files carry over")
    val got = CowTable.read(spark, path)
    assert(got.count() == 101)
    assert(got.filter(col("id") === 7L).select("x").as[String].collect().toSeq
      == Seq("v7b"))
    // a replayed window (same appId, same version) is a complete no-op
    val v2 = CowTable.upsertMorPos(spark, path, keys, adds, txn = Some(("app", 1L)))
    assert(v2 == v1, "replay must not commit")
    assert(CowTable.read(spark, path).count() == 101)
    // empty adds degrades to a transactional positional delete
    val v3 = CowTable.upsertMorPos(spark, path, Seq(5L).toDF("id"),
      adds.limit(0), txn = Some(("app", 2L)))
    assert(v3 == v1 + 1 && CowTable.read(spark, path).count() == 100)
    assert(CowTable.txnVersion(path, "app") == 2L)
  }

  test("year transform pads to 4 digits; a pre-v2 spec line disables time pruning") {
    import spark.implicits._
    import graft.sinks.PartitionTransform
    val path = tmp
    val ancient = java.sql.Date.valueOf("0099-03-05")
    CowTable.create(
      Seq((1L, ancient), (2L, java.sql.Date.valueOf("2024-01-15"))).toDF("id", "d"),
      path, Seq(PartitionTransform.year("d")))
    val files = CowTable.snapshotFiles(path)
    assert(files.exists(_.contains("/p_year_d=0099/")),
      s"ancient years must zero-pad to the writer parity format: $files")
    assert(CowTable.prunedFilesEq(spark, path, "d", ancient).size < files.size)
    assert(CowTable.readPrunedEq(spark, path, "d", ancient).count() == 1)
    // simulate a table written BEFORE spec versioning: strip the specV
    // stamp from the manifest's T line — its directories may have been
    // computed under a non-UTC session zone / unpadded years, so the
    // pruner must stop trusting them and read everything
    val mf = java.nio.file.Paths.get(path, "_snapshots",
      s"v${CowTable.currentVersion(path)}.json")
    val stripped = new String(java.nio.file.Files.readAllBytes(mf),
        java.nio.charset.StandardCharsets.UTF_8)
      .replace("\"specV\":2,", "").replace(",\"specV\":2", "")
    java.nio.file.Files.write(mf,
      stripped.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(CowTable.partitionSpecVersion(path) == 0L,
      "the stamp must be gone for the scenario to be real")
    assert(CowTable.prunedFilesEq(spark, path, "d", ancient).size == files.size,
      "a pre-v2 time-transform spec must not prune (sound under-prune)")
    assert(CowTable.readPrunedEq(spark, path, "d", ancient).count() == 1)
  }

  test("file stats: cross-typed literal against a string column never prunes") {
    import spark.implicits._
    val path = tmp
    // numeric-looking strings whose lexicographic and numeric orders
    // disagree — the exact shape where byte-order stats pruning and
    // the residual's implicit numeric cast contradict each other
    CowTable.create(Seq((0L, "5")).toDF("id", "s"), path)
    CowTable.setStatsColumns(spark, path, Seq("s"))
    CowTable.append(spark, path, Seq((1L, "30")).toDF("id", "s"))
    CowTable.append(spark, path, Seq((2L, "400")).toDF("id", "s"))
    CowTable.append(spark, path, Seq((3L, "05")).toDF("id", "s"))
    val all = CowTable.snapshotFiles(path)
    assert(all.size == 4)
    // string literals prune normally
    assert(CowTable.prunedFilesIn(spark, path, "s", Seq("30")).size == 1)
    // Int literals CANNOT prune a string column: lexicographic "30" <
    // "5" while the residual matches numerically — every file survives
    assert(CowTable.prunedFilesIn(spark, path, "s", Seq(5)).size == all.size)
    // readPrunedIn carries no residual (callers apply their own) — a
    // numeric residual must still SEE both matching rows, which it
    // only can because the cross-typed values didn't prune their files
    assert(CowTable.readPrunedIn(spark, path, "s", Seq(5))
      .filter(col("s").cast("int") === 5)
      .select("id").as[Long].collect().toSet == Set(0L, 3L),
      "both \"5\" and \"05\" match 5 numerically and must be read")
    assert(CowTable.prunedFilesRange(spark, path, "s", Some(5), Some(31)).size
      == all.size)
    assert(CowTable.readPrunedRange(spark, path, "s", Some(5), Some(31))
      .select("id").as[Long].collect().toSet == Set(0L, 1L, 3L),
      "numeric range [5,31] matches 5, 30 and 05 — the \"30\" file must not be skipped")
  }

  test("lookup sidecars: IN on a NON-clustering key opens few files where range stats open all") {
    import spark.implicits._
    val path = tmp
    // clustered by v — ids are scattered, so every file's id [min,max]
    // spans ~the whole domain and range stats cannot skip anything
    CowTable.create((0L until 40000L).map(i => (i, (i * 7919L) % 40000L))
      .toDF("id", "v").repartition(8), path)
    CowTable.setStatsColumns(spark, path, Seq("v", "id"))
    CowTable.cluster(spark, path, files = 16, zcols = Seq("v"))
    val all = CowTable.snapshotFiles(path)
    val probe = Seq(123L, 31007L, 8888L)
    assert(CowTable.prunedFilesIn(spark, path, "id", probe).size == all.size,
      "range stats alone must be useless on the scattered key — the scenario premise")
    CowTable.setLookupColumns(spark, path, Seq("id"), dictMax = 128,
      bloomBits = 1 << 16)
    val opened = CowTable.prunedFilesIn(spark, path, "id", probe)
    assert(opened.size <= 6,
      s"bloom sidecars must skip to ~the 3 containing files: ${opened.size} of ${all.size}")
    // checksum-equal with the full scan
    val viaLookup = CowTable.readPrunedIn(spark, path, "id", probe)
      .filter(col("id").isin(probe: _*)).orderBy("id").collect().toSeq
    val full = CowTable.read(spark, path)
      .filter(col("id").isin(probe: _*)).orderBy("id").collect().toSeq
    assert(viaLookup == full && full.size == 3)
    // cross-typed literal: gate disabled, nothing wrongly pruned
    assert(CowTable.prunedFilesIn(spark, path, "id", Seq("123x")).size == all.size)
    // sidecars survive maintenance like C lines: a compact rewrite
    // re-records for the fresh files …
    CowTable.compact(spark, path, files = 8)
    val all2 = CowTable.snapshotFiles(path)
    // (compact bin-packs without re-clustering; the dict/bloom is
    // recomputed per fresh file so the gate stays sound)
    assert(CowTable.readPrunedIn(spark, path, "id", probe)
      .filter(col("id").isin(probe: _*)).orderBy("id").collect().toSeq == full)
    assert(CowTable.prunedFilesIn(spark, path, "id", probe).size <= all2.size)
    // … and consult through RENAME lineage: entries recorded under the
    // old physical name keep pruning after the column renames
    CowTable.renameColumn(spark, path, "id", "doc")
    val renamed = CowTable.prunedFilesIn(spark, path, "doc", probe)
    assert(renamed.size < all2.size,
      s"rename lineage must keep the sidecars consulted: ${renamed.size} of ${all2.size}")
    assert(CowTable.readPrunedIn(spark, path, "doc", probe)
      .filter(col("doc").isin(probe: _*)).select("doc").as[Long].collect().sorted
      .toSeq == probe.sorted)
  }

  test("lookup sidecars: array columns index their elements (band-probe shape)") {
    import spark.implicits._
    val path = tmp
    // 4 files, each carrying a disjoint band-key range inside an array
    CowTable.create((0L until 50L).map(i => (i, Array(i * 3, i * 3 + 1, i * 3 + 2)))
      .toDF("doc", "bands").coalesce(1), path)
    (1 to 3).foreach { g =>
      CowTable.append(spark, path,
        (0L until 50L).map(i => (g * 1000L + i,
          Array(g * 10000L + i * 3, g * 10000L + i * 3 + 1, g * 10000L + i * 3 + 2)))
          .toDF("doc", "bands").coalesce(1))
    }
    CowTable.setLookupColumns(spark, path, Seq("bands"), dictMax = 16,
      bloomBits = 1 << 14)
    val all = CowTable.snapshotFiles(path)
    assert(all.size == 4)
    // keys from one group's range: only that group's file may contain them
    val opened = CowTable.prunedFilesIn(spark, path, "bands",
      Seq(20001L, 20044L))
    assert(opened.size == 1,
      s"element lookup must open only the containing file: ${opened.size} of ${all.size}")
    val got = CowTable.readPrunedIn(spark, path, "bands", Seq(20001L, 20044L))
      .filter(arrays_overlap(col("bands"), array(lit(20001L), lit(20044L))))
      .select("doc").as[Long].collect().toSet
    assert(got == CowTable.read(spark, path)
      .filter(arrays_overlap(col("bands"), array(lit(20001L), lit(20044L))))
      .select("doc").as[Long].collect().toSet && got.nonEmpty)
    // a key present nowhere prunes everything
    assert(CowTable.prunedFilesIn(spark, path, "bands", Seq(999999999L)).isEmpty)
  }

  test("lookup sidecars reach the FK scan: dim-dirty refresh opens few fact files") {
    import spark.implicits._
    val dir = tmp
    val (pf, pd) = (s"$dir/fact", s"$dir/dim")
    // fact CLUSTERED BY oid — cust is scattered, range stats useless
    // on it; each of the 16 files holds ~every cust value's oid range
    // high-cardinality FK (the 100 TB shape): each file's cust set is
    // ~2000 values scattered over the whole [0, 32000) domain
    CowTable.create((0L until 32000L).map(i => (i, (i * 7919L) % 32000L, i * 2))
      .toDF("oid", "cust", "amount").repartition(8), pf)
    CowTable.setStatsColumns(spark, pf, Seq("oid", "cust"))
    CowTable.cluster(spark, pf, files = 16, zcols = Seq("oid"))
    CowTable.create((0L until 32000L).map(c => (c, s"seg${c % 4}"))
      .toDF("cid", "segment").repartition(2), pd)
    assert(CowTable.prunedFilesIn(spark, pf, "cust", Seq(123L)).size
      == CowTable.snapshotFiles(pf).size,
      "scenario premise: range stats cannot prune the scattered FK")
    CowTable.setLookupColumns(spark, pf, Seq("cust"), dictMax = 32,
      bloomBits = 1 << 16)
    // ~2000 distinct custs/file over 2^16 bits: far under saturation
    val opened = CowTable.prunedFilesIn(spark, pf, "cust", Seq(123L))
    assert(opened.size <= 3,
      s"FK bloom must skip to ~the containing file: ${opened.size}")
    // and the KIP-213 refresh path stays exact through the pruned scan
    def joinOf(f: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame) =
      f.join(d, f("cust") === d("cid"), "left")
        .select(col("oid"), col("cust"), col("amount"), col("segment"))
    val f1 = CowTable.currentVersion(pf)
    val d1 = CowTable.currentVersion(pd)
    val mv0 = joinOf(CowTable.read(spark, pf), CowTable.read(spark, pd))
      .localCheckpoint()
    CowTable.merge(spark, pd, Seq((123L, "vip")).toDF("cid", "segment"), "cid")
    val refreshed = CowTable.incrementalJoinFk(spark, pf, pd, "oid", "cust", "cid",
      mv0, f1, CowTable.currentVersion(pf), d1, CowTable.currentVersion(pd))(joinOf)
    val full = joinOf(CowTable.read(spark, pf), CowTable.read(spark, pd))
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
    assert(refreshed.collect().map(keyOf).sorted.toSeq ==
      full.collect().map(keyOf).sorted.toSeq)
    assert(refreshed.filter(col("segment") === "vip").count() == 1)
  }

  test("SQL catalog: CREATE/INSERT/MERGE/OVERWRITE/time-travel round trip; manifest pruning reaches the catalog scan") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s.implicits._
      // CREATE + INSERT (the V1Write append seam)
      s.sql("CREATE TABLE cowt.ns.t (id BIGINT, name STRING, v BIGINT)")
      s.sql("INSERT INTO cowt.ns.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
      assert(s.sql("SELECT sum(v) FROM cowt.ns.t").head().getLong(0) == 60L)
      val v2 = CowTable.currentVersion(s"$wh/ns/t")
      // MERGE (upsert onto CowTable.merge's transactional path)
      Seq((2L, "B", 200L), (4L, "d", 40L)).toDF("id", "name", "v")
        .createOrReplaceTempView("src")
      s.sql("""MERGE INTO cowt.ns.t t USING src ON t.id = src.id
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""")
      assert(s.sql("SELECT name, v FROM cowt.ns.t WHERE id = 2").head().toString
        == "[B,200]")
      assert(s.sql("SELECT count(*) FROM cowt.ns.t").head().getLong(0) == 4L)
      // MERGE delete form -> rewrite-free MoR sidecar, honored by the scan
      Seq(Tuple1(1L)).toDF("id").createOrReplaceTempView("dels")
      s.sql("MERGE INTO cowt.ns.t t USING dels ON t.id = dels.id WHEN MATCHED THEN DELETE")
      assert(s.sql("SELECT count(*) FROM cowt.ns.t").head().getLong(0) == 3L)
      assert(s.sql("SELECT count(name) FROM cowt.ns.t").head().getLong(0) == 3L,
        "key-delete filtering must hold when the projection pruned the key")
      // time travel reads the pre-merge snapshot
      assert(s.sql(s"SELECT count(*) FROM cowt.ns.t VERSION AS OF $v2")
        .head().getLong(0) == 3L)
      assert(s.sql(s"SELECT v FROM cowt.ns.t VERSION AS OF $v2 WHERE id = 2")
        .head().getLong(0) == 20L)
      // TIMESTAMP AS OF resolves through the commit stamps (micros in,
      // greatest commit at-or-before wins)
      val tsV2 = CowTable.commitTimeMs(s"$wh/ns/t", v2).get
      assert(s.sql("SELECT count(*) FROM cowt.ns.t " +
          s"TIMESTAMP AS OF timestamp_millis(${tsV2}L)").head().getLong(0) == 3L)
      // TVF parity: the catalog scan and cow_snapshot agree row-for-row
      val viaCatalog = s.sql("SELECT * FROM cowt.ns.t")
        .collect().map(_.toString).sorted.toSeq
      val viaTvf = s.sql(s"SELECT * FROM cow_snapshot('$wh/ns/t')")
        .collect().map(_.toString).sorted.toSeq
      assert(viaCatalog == viaTvf)
      // INSERT OVERWRITE replaces the snapshot, history stays exact
      s.sql("INSERT OVERWRITE cowt.ns.t VALUES (9, 'z', 90)")
      assert(s.sql("SELECT count(*), sum(v) FROM cowt.ns.t").head().toString == "[1,90]")
      assert(s.sql(s"SELECT count(*) FROM cowt.ns.t VERSION AS OF $v2")
        .head().getLong(0) == 3L)
      // manifest pruning THROUGH the catalog read path: id-clustered
      // files + declared stats; an id filter opens few of many files
      CowTable.create((0L until 8000L).map(i => (i, i % 97L)).toDF("id", "w")
        .repartitionByRange(8, org.apache.spark.sql.functions.col("id")), s"$wh/ns/big")
      CowTable.setStatsColumns(s, s"$wh/ns/big", Seq("id"))
      // fresh stats only cover post-declaration writes; cluster rewrites all
      CowTable.cluster(s, s"$wh/ns/big", files = 8, zcols = Seq("id"))
      val q = s.sql("SELECT w FROM cowt.ns.big WHERE id = 4242")
      val scanDesc = q.queryExecution.executedPlan.toString
      val filesRe = "files=(\\d+)".r
      val opened = filesRe.findFirstMatchIn(scanDesc).map(_.group(1).toInt)
      assert(opened.exists(n => n <= 2),
        s"id filter must prune the catalog scan to the containing file: $scanDesc")
      assert(q.head().getLong(0) == 4242L % 97L)
      // unsupported MERGE shapes fail loudly in analysis
      val err = intercept[Exception] {
        s.sql("MERGE INTO cowt.ns.t t USING src ON t.id = src.id " +
          "WHEN MATCHED AND src.v > 0 THEN UPDATE SET *")
      }
      assert(err.getMessage.contains("supports exactly"), err.getMessage)
      // DELETE FROM through SupportsDelete: translatable predicates
      // compile to CowTable.delete's copy-on-write rewrite
      s.sql("INSERT INTO cowt.ns.t VALUES (10, 'p', 5), (11, 'q', 6), (12, 'q', 7)")
      s.sql("DELETE FROM cowt.ns.t WHERE name = 'q' AND v >= 7")
      assert(s.sql("SELECT id FROM cowt.ns.t ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(9L, 10L, 11L),
        "only the (q, >=7) row deleted")
      s.sql("DELETE FROM cowt.ns.t WHERE id IN (10, 11)")
      assert(s.sql("SELECT count(*) FROM cowt.ns.t").head().getLong(0) == 1L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("SQL ALTER TABLE: add/rename/widen/drop lower onto metadata-only evolution") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      s.sql("CREATE TABLE cowt.ns.a (id BIGINT, v INT)")
      s.sql("INSERT INTO cowt.ns.a VALUES (1, 10), (2, 20)")
      val files1 = CowTable.snapshotFiles(s"$wh/ns/a").toSet
      // ADD: pre-evolution rows read NULL in the new column
      s.sql("ALTER TABLE cowt.ns.a ADD COLUMN tag STRING")
      assert(s.sql("SELECT count(*) FROM cowt.ns.a WHERE tag IS NULL")
        .head().getLong(0) == 2L)
      s.sql("INSERT INTO cowt.ns.a VALUES (3, 30, 'x')")
      // RENAME: metadata-only, old files resolve through the lineage
      s.sql("ALTER TABLE cowt.ns.a RENAME COLUMN v TO val")
      assert(s.sql("SELECT sum(val) FROM cowt.ns.a").head().getLong(0) == 60L)
      // WIDEN: int -> bigint up-cast
      s.sql("ALTER TABLE cowt.ns.a ALTER COLUMN val TYPE BIGINT")
      assert(s.sql("SELECT val FROM cowt.ns.a WHERE id = 1").head().getLong(0) == 10L)
      // DROP: disappears from reads, data files untouched
      s.sql("ALTER TABLE cowt.ns.a DROP COLUMN tag")
      assert(!s.sql("SELECT * FROM cowt.ns.a").columns.contains("tag"))
      assert((files1 -- CowTable.snapshotFiles(s"$wh/ns/a").toSet).isEmpty,
        "every ALTER is metadata-only: the original data files all survive")
      // narrowing is refused loudly — by Spark's own analysis check
      // (NOT_SUPPORTED_CHANGE_COLUMN) before our up-cast guard even runs
      val e1 = intercept[Exception] {
        s.sql("ALTER TABLE cowt.ns.a ALTER COLUMN val TYPE INT")
      }
      assert(e1.getMessage.contains("up-cast") ||
        e1.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e1.getMessage)
      // unsupported change classes fail naming themselves
      val e2 = intercept[Exception] {
        s.sql("ALTER TABLE cowt.ns.a SET TBLPROPERTIES ('k' = 'v')")
      }
      assert(e2.getMessage.contains("supports ADD/RENAME/DROP"), e2.getMessage)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("TIMESTAMP AS OF: commit stamps are monotone; resolution picks the visible snapshot") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 10L).map(i => (i, i)).toDF("k", "v"), path)
    CowTable.append(spark, path, Seq((100L, 100L)).toDF("k", "v"))
    CowTable.append(spark, path, Seq((200L, 200L)).toDF("k", "v"))
    val t = (1 to 3).map(v => CowTable.commitTimeMs(path, v).get)
    assert(t(0) < t(1) && t(1) < t(2), s"stamps must be strictly monotone: $t")
    assert(CowTable.versionAt(path, t(0)) == 1)
    assert(CowTable.versionAt(path, t(1)) == 2)
    assert(CowTable.versionAt(path, t(1) - 1) == 1,
      "an instant before v2's stamp sees v1")
    assert(CowTable.versionAt(path, t(2) + 1000000) == 3, "the future sees latest")
    val err = intercept[IllegalArgumentException] {
      CowTable.versionAt(path, t(0) - 1)
    }
    assert(err.getMessage.contains("precedes"), err.getMessage)
    // pre-feature manifests (no stamp line) inherit the previous stamp
    // (0 before any): strip v1's stamp and the whole pre-v2 range maps to v1
    val mf = java.nio.file.Paths.get(path, "_snapshots", "v1.json")
    val stripped = new String(java.nio.file.Files.readAllBytes(mf))
      .split("\n").filterNot(_.startsWith("W ")).mkString("\n")
    java.nio.file.Files.write(mf, stripped.getBytes)
    assert(CowTable.versionAt(path, 1L) == 1, "unstamped v1 reads as epoch 0")
    assert(CowTable.versionAt(path, t(1)) == 2)
    // history carries the stamp column
    val h = CowTable.history(spark, path)
      .select("version", "commit_time_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(2L) == t(1) && h(3L) == t(2) && h(1L) == 0L)
  }

  test("SQL UPDATE on the catalog: expressions, WHERE, grammar rejections, time travel") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      s.sql("CREATE TABLE cowt.ns.u (id BIGINT, name STRING, v BIGINT)")
      s.sql("INSERT INTO cowt.ns.u VALUES (1,'a',10),(2,'b',20),(3,'c',30),(4,'d',40)")
      val v1 = CowTable.currentVersion(s"$wh/ns/u")
      // expression SET + WHERE; multi-assignment reads the OLD row
      s.sql("UPDATE cowt.ns.u SET v = v * 10, name = concat(name, '!') WHERE id % 2 = 0")
      assert(s.sql("SELECT name, v FROM cowt.ns.u WHERE id = 2").head().toString
        == "[b!,200]")
      assert(s.sql("SELECT v FROM cowt.ns.u WHERE id = 3").head().getLong(0) == 30L,
        "non-matching rows untouched")
      // no WHERE -> every row
      s.sql("UPDATE cowt.ns.u SET v = v + 1")
      assert(s.sql("SELECT sum(v) FROM cowt.ns.u").head().getLong(0)
        == (10L + 200 + 30 + 400) + 4,
        "sum after: even rows *10, then every row +1")
      // CASE and functions in SET work (name-anchored Column transport)
      s.sql("UPDATE cowt.ns.u SET name = CASE WHEN v > 100 THEN upper(name) ELSE name END")
      assert(s.sql("SELECT name FROM cowt.ns.u WHERE id = 4").head().getString(0) == "D!")
      // BETWEEN parses into a With common-subexpression node — the
      // inline-before-unresolve path (ScaleBench upd regression)
      s.sql("UPDATE cowt.ns.u SET v = v + 100 WHERE id BETWEEN 3 AND 4")
      assert(s.sql("SELECT sum(v) FROM cowt.ns.u WHERE id IN (3, 4)").head().getLong(0)
        == (31L + 100) + (401 + 100))
      // NESTED With: a BETWEEN inside another BETWEEN's operand — a
      // CommonExpressionRef that resolves against an OUTER With's def
      // must inline when that With is visited, not crash on the inner
      // map lookup (ADVICE r15). SET v = v keeps values intact; the
      // statement still runs the full unresolve + rewrite path.
      s.sql("UPDATE cowt.ns.u SET v = v WHERE " +
        "(CASE WHEN id BETWEEN 1 AND 2 THEN v ELSE id END) BETWEEN 0 AND 1000000")
      assert(s.sql("SELECT sum(v) FROM cowt.ns.u WHERE id IN (3, 4)").head().getLong(0)
        == (31L + 100) + (401 + 100), "nested-With no-op UPDATE must not change rows")
      // time travel: pre-update snapshot intact
      assert(s.sql(s"SELECT sum(v) FROM cowt.ns.u VERSION AS OF $v1")
        .head().getLong(0) == 100L)
      // grammar rejections in ANALYSIS, naming the limit
      val e1 = intercept[Exception] {
        s.sql("UPDATE cowt.ns.u SET v = (SELECT max(v) FROM cowt.ns.u) WHERE id = 1")
      }
      assert(e1.getMessage.contains("subqueries"), e1.getMessage)
      val e2 = intercept[Exception] {
        s.sql("UPDATE cowt.ns.u SET v = cast(rand() * 10 AS BIGINT)")
      }
      assert(e2.getMessage.contains("nondeterministic"), e2.getMessage)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("storage-partitioned CowTable join: co-bucketed tables join and aggregate with ZERO exchanges") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .config("spark.sql.sources.v2.bucketing.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
      import s.implicits._
      import graft.sinks.PartitionTransform
      val n = 8
      CowTable.create((1L to 5000L).map(i => (i, i * 2)).toDF("id", "v").repartition(4),
        s"$wh/ns/a", Seq(PartitionTransform.bucket(n, "id")))
      CowTable.create((2000L to 9000L).map(i => (i, i * 7)).toDF("id", "w").repartition(4),
        s"$wh/ns/b", Seq(PartitionTransform.bucket(n, "id")))
      def q = s.sql(
        "SELECT a.id, a.v, b.w FROM cowt.ns.a a JOIN cowt.ns.b b ON a.id = b.id")
      def agg = s.sql("SELECT id, sum(v) sv FROM cowt.ns.a GROUP BY id")
      // gated ON: both scans report KeyGroupedPartitioning(bucket(8, id))
      // through the catalog's FunctionCatalog -> no exchange anywhere
      s.conf.set("spark.graft.cowSpj", "true")
      val spj = q
      val spjPlan = spj.queryExecution.executedPlan.toString
      assert(!spjPlan.contains("Exchange"), spjPlan.take(1500))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), aggPlan.take(1500))
      val spjRows = spj.collect().map(_.toString).sorted.toSeq
      val aggRows = agg.collect().map(_.toString).sorted.toSeq
      // gate OFF: same rows through the ordinary shuffled plan
      s.conf.set("spark.graft.cowSpj", "false")
      val shuffled = q
      assert(shuffled.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(spjRows == shuffled.collect().map(_.toString).sorted.toSeq)
      assert(aggRows == agg.collect().map(_.toString).sorted.toSeq)
      assert(spjRows.size == 3001)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("catalog scan honors MoR key deletes on DATE/TIMESTAMP/BINARY keys (ADVICE r14 high)") {
    import org.apache.spark.sql.SparkSession
    import spark.implicits._
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    // build the tables with the OUTER session (plain CowTable API), read
    // through a catalog session: the regression was collect()-side
    // EXTERNAL values (java.sql.Date) vs reader-side INTERNAL ones (Int
    // days) never matching, so deleted rows silently reappeared in SQL
    val d1 = java.sql.Date.valueOf("2020-01-01")
    val d2 = java.sql.Date.valueOf("2020-01-02")
    val d3 = java.sql.Date.valueOf("2020-01-03")
    val t1 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2020-01-02 12:30:00")
    val t3 = java.sql.Timestamp.valueOf("2020-01-03 23:59:59")
    CowTable.create(Seq((d1, t1, 10L), (d2, t2, 20L), (d3, t3, 30L))
      .toDF("d", "ts", "v"), s"$wh/ns/kd")
    CowTable.deleteMorKeys(spark, s"$wh/ns/kd", Seq(d1).toDF("d"), "d")
    // one key contract per table: timestamp key on its own table
    CowTable.create(Seq((t1, 10L), (t2, 20L), (t3, 30L))
      .toDF("ts", "v"), s"$wh/ns/kt")
    CowTable.deleteMorKeys(spark, s"$wh/ns/kt", Seq(t2).toDF("ts"), "ts")
    CowTable.create(Seq((Array[Byte](1, 2, 3), 1L), (Array[Byte](4, 5), 2L))
      .toDF("b", "v"), s"$wh/ns/kb")
    CowTable.deleteMorKeys(spark, s"$wh/ns/kb",
      Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("b"), "b")
    // null key vs the STRING "null": deleting the literal string must
    // not take the null-keyed row with it (the canon sentinel)
    CowTable.create(Seq((Option("null"), 1L), (Option.empty[String], 2L),
      (Option("x"), 3L)).toDF("name", "v"), s"$wh/ns/kn")
    CowTable.deleteMorKeys(spark, s"$wh/ns/kn", Seq("null").toDF("name"), "name")
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s.sql("SELECT v FROM cowt.ns.kd ORDER BY v").collect()
        .map(_.getLong(0)).toSeq == Seq(20L, 30L),
        "date MoR key deletes must hold through the catalog scan")
      assert(s.sql("SELECT v FROM cowt.ns.kt ORDER BY v").collect()
        .map(_.getLong(0)).toSeq == Seq(10L, 30L),
        "timestamp MoR key deletes must hold through the catalog scan")
      // projection that PRUNES the key columns still filters (the
      // extra-decode path)
      assert(s.sql("SELECT count(*) FROM cowt.ns.kd").head().getLong(0) == 2L)
      assert(s.sql("SELECT v FROM cowt.ns.kb ORDER BY v").collect()
        .map(_.getLong(0)).toSeq == Seq(2L),
        "binary MoR key deletes must hold through the catalog scan")
      assert(s.sql("SELECT v FROM cowt.ns.kn ORDER BY v").collect()
        .map(_.getLong(0)).toSeq == Seq(2L, 3L),
        "deleting the string 'null' must not delete the NULL-keyed row")
      // parity with the batch read path on every table
      Seq("kd", "kt", "kb", "kn").foreach { t =>
        val viaCatalog = s.sql(s"SELECT v FROM cowt.ns.$t").collect()
          .map(_.getLong(0)).sorted.toSeq
        val viaApi = CowTable.read(s, s"$wh/ns/$t").select("v").collect()
          .map(_.getLong(0)).sorted.toSeq
        assert(viaCatalog == viaApi, s"catalog vs CowTable.read diverge on $t")
      }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("lockfile provider: stale-lease takeover parks the old lock — no double-hold (ADVICE r14 medium)") {
    import scala.jdk.CollectionConverters._
    val snap = java.nio.file.Files.createTempDirectory("graft_lock")
    var sawPark = false
    (1 to 30).foreach { round =>
      val lock = snap.resolve("_commit.lock")
      // seed a STALE lock (crashed holder) so both racers judge staleness
      java.nio.file.Files.write(lock,
        s"99999 ${System.currentTimeMillis() - 600000L} $round".getBytes("UTF-8"))
      val target = snap.resolve(f"v$round%05d.manifest")
      val provider = new CowTable.LockFileProvider(leaseMs = 50L)
      val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = (1 to 2).map { t =>
        new Thread(() => {
          val tmpf = java.nio.file.Files.createTempFile(snap, "tmp", ".m")
          java.nio.file.Files.write(tmpf, s"writer-$t".getBytes("UTF-8"))
          try { provider.publish(snap.toString, target, tmpf, round); results.add(s"ok $t") }
          catch {
            case _: CowTable.ConcurrentCommitException => results.add(s"ccx $t")
            case e: Throwable => results.add(s"BAD ${e.getClass.getName}: ${e.getMessage}")
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val rs = results.asScala.toSeq.sorted
      // the r14 window (judge-stale A deletes, B recreates, A's delete
      // removes B's fresh lock) let BOTH proceed: the loser then died on
      // copy's FileAlreadyExistsException or clobbered the winner. Now:
      // exactly one publisher, exactly one ConcurrentCommitException.
      assert(rs.count(_.startsWith("ok")) == 1, s"round $round: $rs")
      assert(rs.count(_.startsWith("ccx")) == 1, s"round $round: $rs")
      val winner = rs.find(_.startsWith("ok")).get.stripPrefix("ok ")
      assert(new String(java.nio.file.Files.readAllBytes(target), "UTF-8")
        == s"writer-$winner", s"round $round: target must carry the winner's manifest")
      assert(!java.nio.file.Files.exists(lock), s"round $round: lease released")
      sawPark ||= scala.util.Using.resource(java.nio.file.Files.list(snap))(
        _.iterator().asScala.exists(
          _.getFileName.toString.startsWith("_commit.lock.stale.")))
    }
    assert(sawPark, "takeovers must park the stale lock, not delete it in place")
  }

  test("row-count manifest lines: exact per-file counts; backfill is a committed no-op when present") {
    import spark.implicits._
    val path = tmp
    CowTable.create((0L until 100L).map(i => (i, i * 2)).toDF("id", "v")
      .repartition(4), path)
    CowTable.append(spark, path, (100L until 130L).map(i => (i, i)).toDF("id", "v"))
    val counts = CowTable.fileRowCounts(path)
    val files = CowTable.snapshotFiles(path)
    assert(files.forall(counts.contains), "every data file carries an R line")
    assert(counts.values.sum == 130L)
    val v = CowTable.currentVersion(path)
    assert(CowTable.backfillRowCounts(spark, path) == v,
      "backfill with nothing missing must not commit")
    // rewrites retire + re-record counts mechanically
    CowTable.compact(spark, path, 2)
    val after = CowTable.fileRowCounts(path)
    assert(CowTable.snapshotFiles(path).forall(after.contains))
    assert(after.values.sum == 130L)
  }

  test("catalog DSv2 statistics: small dim AUTO-broadcasts with no hint; exact rowCount reported") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import s.implicits._
      CowTable.create((0L until 20000L).map(i => (i, i % 7)).toDF("id", "v")
        .repartition(4), s"$wh/ns/fact")
      CowTable.create((0L until 50L).map(i => (i, s"tag_$i")).toDF("id", "tag"),
        s"$wh/ns/dim")
      // exact numRows via the R lines, sizeInBytes from the manifest's files
      val dimStats = s.table("cowt.ns.dim").queryExecution.optimizedPlan.stats
      assert(dimStats.rowCount.contains(BigInt(50)), dimStats.toString)
      assert(dimStats.sizeInBytes < 10L * 1024 * 1024,
        s"dim must report a real (small) size: ${dimStats.sizeInBytes}")
      // DEFAULT autoBroadcastJoinThreshold, NO hint: the dim broadcasts
      // only because the scan reports honest statistics
      val j = s.sql("SELECT f.id, d.tag FROM cowt.ns.fact f " +
        "JOIN cowt.ns.dim d ON f.id = d.id")
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        j.queryExecution.executedPlan.toString.take(2000))
      assert(j.count() == 50L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("catalog runtime filtering: a filtered dim join re-prunes the fact FILE LIST at execution") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // AQE ON (the production default): its dynamic-pruning planner is
      // the one that materializes the broadcast before the V2 scan's
      // runtime filter is translated (the non-AQE path can't serve
      // InSubquery values to a DSv2 scan)
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import s.implicits._
      val fact = s"$wh/ns/fact"
      // range-clustered fact: 8 files with disjoint id ranges + stats
      CowTable.create((0L until 8000L).map(i => (i, i % 13)).toDF("id", "v")
        .repartitionByRange(8, org.apache.spark.sql.functions.col("id")), fact)
      CowTable.setStatsColumns(s, fact, Seq("id"))
      val nFiles = CowTable.snapshotFiles(fact).size
      assert(nFiles >= 8, s"want several fact files, got $nFiles")
      // dim keys all land in the LOWEST id band: the runtime IN filter
      // must prune the fact scan down to the file(s) covering that band
      CowTable.create((0L until 1000L by 50L).map(i => (i, i % 3))
        .toDF("id", "grp"), s"$wh/ns/dim")
      def q = s.sql("SELECT f.id, f.v FROM cowt.ns.fact f " +
        "JOIN cowt.ns.dim d ON f.id = d.id WHERE d.grp = 0")
      val rows = q.collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == (0L until 1000L by 50L).filter(_ % 3 == 0).sorted,
        s"join result wrong: ${rows.toSeq}")
      // the fact scan must carry a runtime (dynamic pruning) filter and
      // its executed RDD must read FEWER files than the snapshot holds
      val qe = q.queryExecution
      qe.toRdd.count() // force execution so the adaptive plan is final
      // AQE wraps operators in query stages; flatten through them
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(allNodes)) ++ (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            allNodes(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            allNodes(qs.plan)
          case _ => Seq.empty
        })
      val scans = allNodes(qe.executedPlan).collect {
        case b: BatchScanExec if b.scan.description().contains("fact") => b }
      assert(scans.nonEmpty, qe.executedPlan.toString.take(2000))
      assert(scans.head.runtimeFilters.nonEmpty,
        "no runtime filter planned against the fact scan:\n" +
          qe.executedPlan.toString.take(2000))
      val read = scans.head.inputRDD.getNumPartitions
      assert(read <= 2 && read < nFiles,
        s"runtime filter barely pruned: read $read of $nFiles files " +
          "(dim keys cover only the lowest range band)")
      // equality against the DPP-disabled plan
      s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      val expect = q.collect().map(_.getLong(0)).sorted
      assert(expect.toSeq == rows.toSeq, "runtime pruning changed results")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("catalog aggregate pushdown: COUNT/MIN/MAX answered from the manifest; MoR-dirty falls back") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import s.implicits._
      val t = s"$wh/ns/t"
      CowTable.create((0L until 500L).map(i =>
        (i, i * 3, s"n_${i % 10}")).toDF("id", "v", "name").repartition(3), t)
      CowTable.append(s, t,
        Seq((9999L, -5L, null.asInstanceOf[String])).toDF("id", "v", "name"))
      CowTable.setStatsColumns(s, t, Seq("id", "v", "name"))
      val v1 = CowTable.currentVersion(t)
      def agg = s.sql("SELECT count(*) AS c, min(v) AS mn, max(v) AS mx, " +
        "count(name) AS cn, min(name) AS mnn FROM cowt.ns.t")
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("CowAggScan"), plan.take(2000))
      val r = agg.head()
      assert(r.getLong(0) == 501L && r.getLong(1) == -5L &&
        r.getLong(2) == 499L * 3 && r.getLong(3) == 500L &&
        r.getString(4) == "n_0", r.toString)
      // a WHERE keeps filters residual -> no aggregate pushdown, same answer
      val f = s.sql("SELECT count(*) AS c FROM cowt.ns.t WHERE v >= 0")
      assert(!f.queryExecution.executedPlan.toString.contains("CowAggScan"))
      assert(f.head().getLong(0) == 500L)
      // MoR delete sidecar invalidates file stats: full scan, right answer
      CowTable.deleteMor(s, t, "id = 9999", "id")
      val dirty = s.sql("SELECT count(*) AS c, min(v) AS mn FROM cowt.ns.t")
      assert(!dirty.queryExecution.executedPlan.toString.contains("CowAggScan"),
        "MoR-dirty snapshot must NOT answer from stats")
      val dr = dirty.head()
      assert(dr.getLong(0) == 500L && dr.getLong(1) == 0L, dr.toString)
      // time travel to the clean snapshot still pushes down
      val tt = s.sql(s"SELECT count(*) AS c FROM cowt.ns.t VERSION AS OF $v1")
      assert(tt.queryExecution.executedPlan.toString.contains("CowAggScan"))
      assert(tt.head().getLong(0) == 501L)
      // compact folds the sidecar: pushdown returns, count reflects the delete
      CowTable.compact(s, t, 1)
      val clean = s.sql("SELECT count(*) AS c FROM cowt.ns.t")
      assert(clean.queryExecution.executedPlan.toString.contains("CowAggScan"))
      assert(clean.head().getLong(0) == 500L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("write distribution: SQL INSERT INTO produces the clustered layout the pushdowns need") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import graft.sinks.CowTable
      // identity-partitioned: CREATE via SQL, INSERT from a DELIBERATELY
      // scattered upstream (every upstream partition holds every grp) —
      // without write-side clustering this wrote tasks × values files
      s.sql("CREATE TABLE cowt.ns.wd (id BIGINT, grp BIGINT, v BIGINT) " +
        "PARTITIONED BY (grp)")
      s.sql("INSERT INTO cowt.ns.wd " +
        "SELECT id, id % 3 AS grp, id * 2 AS v FROM range(900)")
      val t = s"$wh/ns/wd"
      val files = CowTable.snapshotFiles(t)
      assert(files.size == 3, s"one file per grp value, got ${files.size}")
      // the layout is what the manifest machinery needs: declare stats,
      // and both the exact filter and the GROUP BY aggregate answer
      // manifest-only on SQL-WRITTEN data
      CowTable.setStatsColumns(s, t, Seq("grp", "v"))
      val g = s.sql("SELECT grp, count(*) AS c, sum(v) AS sv " +
        "FROM cowt.ns.wd GROUP BY grp")
      assert(g.queryExecution.executedPlan.toString.contains("CowAggScan"),
        g.queryExecution.executedPlan.toString.take(1500))
      assert(g.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq ==
        (0L until 900L).groupBy(_ % 3).toSeq.map { case (k, xs) =>
          (k, xs.size.toLong, xs.map(_ * 2).sum) }.sortBy(_._1))
      val f = s.sql("SELECT count(*) AS c FROM cowt.ns.wd WHERE grp = 1")
      assert(f.queryExecution.executedPlan.toString.contains("CowAggScan"),
        "exact filter + agg pushdown must fire on SQL-written layout")
      assert(f.head().getLong(0) == 300L)
      // bucket-clustered: INSERT INTO a bucket(4, id) table lands one
      // file per bucket, under the bucket=N directories SPJ groups by
      s.sql("CREATE TABLE cowt.ns.wb (id BIGINT, v BIGINT) " +
        "PARTITIONED BY (bucket(4, id))")
      s.sql("INSERT INTO cowt.ns.wb SELECT id, id AS v FROM range(400)")
      val bFiles = CowTable.snapshotFiles(s"$wh/ns/wb")
      assert(bFiles.size == 4, s"one file per bucket, got ${bFiles.size}")
      assert(bFiles.forall(_.contains("p_bucket4_id=")), bFiles.take(2).toString)
      assert(s.sql("SELECT count(*) AS c FROM cowt.ns.wb").head().getLong(0) == 400L)
      // days-partitioned timestamps cluster through the catalog's days()
      // function (UTC day), one file per calendar day
      s.sql("CREATE TABLE cowt.ns.wt (ts TIMESTAMP, v BIGINT) " +
        "PARTITIONED BY (days(ts))")
      s.sql("INSERT INTO cowt.ns.wt SELECT " +
        "timestamp_micros(cast(1700000000000000 + (id % 5) * 86400000000 + id AS bigint)) AS ts, " +
        "id AS v FROM range(500)")
      val tFiles = CowTable.snapshotFiles(s"$wh/ns/wt")
      assert(tFiles.size == 5, s"one file per UTC day, got ${tFiles.size}")
      assert(s.sql("SELECT count(DISTINCT v) AS c FROM cowt.ns.wt").head().getLong(0) == 500L)
      // a second INSERT appends its own per-value files (append never
      // rewrites); the layout stays file-constant so pushdown still fires
      s.sql("INSERT INTO cowt.ns.wd SELECT id, id % 3, id * 2 FROM range(900, 1200)")
      val files2 = CowTable.snapshotFiles(t)
      assert(files2.size == 6, s"3 + 3 per-value files, got ${files2.size}")
      val f2 = s.sql("SELECT count(*) AS c FROM cowt.ns.wd WHERE grp = 1")
      assert(f2.queryExecution.executedPlan.toString.contains("CowAggScan"))
      assert(f2.head().getLong(0) == 400L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("catalog aggregate pushdown SUM/AVG: manifest sum lines answer exactly; FP and pre-sum lines decline") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import s.implicits._
      val t = s"$wh/ns/sm"
      // long + decimal + double columns; one all-null-v file; appended
      // in parts so per-file partials must actually combine
      CowTable.create((0L until 400L).map(i =>
        (i, i * 7, BigDecimal(i).setScale(2), i / 2.0)).toDF("id", "v", "amt", "d")
        .repartition(3), t)
      CowTable.append(s, t, Seq(
        (9000L, null.asInstanceOf[java.lang.Long],
          new java.math.BigDecimal("0.25"), 0.5))
        .toDF("id", "v", "amt", "d"))
      CowTable.setStatsColumns(s, t, Seq("id", "v", "amt", "d"))
      def q = s.sql("SELECT sum(v) AS sv, avg(v) AS av, sum(amt) AS sa, " +
        "count(*) AS c FROM cowt.ns.sm")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("CowAggScan"), plan.take(2000))
      val r = q.head()
      val wantSum = (0L until 400L).map(_ * 7).sum
      assert(r.getLong(0) == wantSum, r.toString)
      assert(r.getDouble(1) == wantSum.toDouble / 400L, r.toString)
      assert(r.getDecimal(2).compareTo(new java.math.BigDecimal("79800.25")) == 0,
        r.toString)
      assert(r.getLong(3) == 401L)
      // double sums are never recorded (FP order-dependence): decline
      val fp = s.sql("SELECT sum(d) AS sd FROM cowt.ns.sm")
      assert(!fp.queryExecution.executedPlan.toString.contains("CowAggScan"),
        "double SUM must scan")
      assert(fp.head().getDouble(0) == ((0L until 400L).map(_ / 2.0).sum + 0.5))
      // DECIMAL AVG (round 18): exact sum / count under Spark's own
      // division + changePrecision rounding — manifest answer bit-equal
      // (value AND scale) to the real scan's
      val da = s.sql("SELECT avg(amt) AS aa FROM cowt.ns.sm")
      assert(da.queryExecution.executedPlan.toString.contains("CowAggScan"),
        "decimal AVG must answer from the manifest:\n" +
          da.queryExecution.executedPlan.toString.take(1200))
      val scanAvg = CowTable.read(s, t)
        .agg(org.apache.spark.sql.functions.avg("amt")).head().getDecimal(0)
      val gotAvg = da.head().getDecimal(0)
      assert(gotAvg.equals(scanAvg), s"manifest $gotAvg vs scan $scanAvg")
      // GROUP BY a file-constant key composes with SUM per group
      val tg = s"$wh/ns/smg"
      CowTable.create((0L until 300L).map(i =>
          (i, i % 3, i, BigDecimal(i * 11).setScale(2)))
        .toDF("id", "grp", "v", "amt").repartition(2),
        tg, Seq(graft.sinks.PartitionTransform.identity("grp")))
      CowTable.setStatsColumns(s, tg, Seq("grp", "v", "amt"))
      val g = s.sql("SELECT grp, sum(v) AS sv FROM cowt.ns.smg GROUP BY grp")
      assert(g.queryExecution.executedPlan.toString.contains("CowAggScan"),
        g.queryExecution.executedPlan.toString.take(1500))
      val got = g.collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq
      val want = (0L until 300L).groupBy(_ % 3)
        .map { case (k, xs) => (k, xs.sum) }.toSeq.sortBy(_._1)
      assert(got == want, s"got $got want $want")
      // grouped + filtered DECIMAL AVG stay manifest-only and bit-equal
      val gd = s.sql("SELECT grp, avg(amt) AS aa FROM cowt.ns.smg GROUP BY grp")
      assert(gd.queryExecution.executedPlan.toString.contains("CowAggScan"),
        "grouped decimal AVG must answer from the manifest")
      val gdScan = CowTable.read(s, tg).groupBy("grp")
        .agg(org.apache.spark.sql.functions.avg("amt").as("aa"))
        .collect().map(x => (x.getLong(0), x.getDecimal(1))).toMap
      gd.collect().foreach(x => assert(x.getDecimal(1).equals(gdScan(x.getLong(0))),
        s"grp ${x.getLong(0)}: manifest ${x.getDecimal(1)} vs scan ${gdScan(x.getLong(0))}"))
      val fd = s.sql("SELECT avg(amt) AS aa FROM cowt.ns.smg WHERE grp = 1")
      assert(fd.queryExecution.executedPlan.toString.contains("CowAggScan"),
        "exact-filtered decimal AVG must answer from the manifest")
      assert(fd.head().getDecimal(0).equals(gdScan(1L)))
      // pre-r17 stats lines (no 4th element) decline SUM but keep
      // MIN/MAX/COUNT: strip the sum element from the manifest in place
      val tOld = s"$wh/ns/smo"
      CowTable.create((1L to 100L).map(i => (i, i)).toDF("id", "v"), tOld)
      CowTable.setStatsColumns(s, tOld, Seq("v"))
      val mf = java.nio.file.Paths.get(tOld, "_snapshots",
        s"v${CowTable.currentVersion(tOld)}.json")
      val rewritten = new String(java.nio.file.Files.readAllBytes(mf))
        .split("\n").map { l =>
          if (!l.startsWith("C ")) l
          else l.replaceAll("""\[(-?[\d.]+),(-?[\d.]+),(\d+),[^\]]*\]""", "[$1,$2,$3]")
        }.mkString("\n")
      java.nio.file.Files.write(mf, rewritten.getBytes)
      val so = s.sql("SELECT sum(v) AS sv FROM cowt.ns.smo")
      assert(!so.queryExecution.executedPlan.toString.contains("CowAggScan"),
        "missing sum element must decline SUM pushdown")
      assert(so.head().getLong(0) == 5050L)
      val mo = s.sql("SELECT min(v) AS mn, count(v) AS c FROM cowt.ns.smo")
      assert(mo.queryExecution.executedPlan.toString.contains("CowAggScan"),
        "3-element lines still serve MIN/COUNT")
      assert(mo.head().getLong(0) == 1L && mo.head().getLong(1) == 100L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("concurrent SQL INSERTs: the V2 write face serializes via append-rebase, no lost rows") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import graft.sinks.CowTable
      s.sql("CREATE TABLE cowt.ns.race (id BIGINT, g BIGINT) PARTITIONED BY (g)")
      // 6 racing INSERT INTO statements on driver threads: losing the
      // manifest race must cost only a rebase (files written once),
      // never a lost or duplicated row
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val writes = (0 until 6).map { w =>
        scala.concurrent.Future {
          SparkSession.setActiveSession(s)
          s.sql(s"INSERT INTO cowt.ns.race SELECT id, id % 3 AS g " +
            s"FROM range(${w * 1000}, ${w * 1000 + 1000})")
          ()
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(writes),
        scala.concurrent.duration.Duration(120, "s"))
      pool.shutdown()
      assert(s.sql("SELECT count(*) FROM cowt.ns.race").head().getLong(0) == 6000L)
      assert(s.sql("SELECT count(DISTINCT id) FROM cowt.ns.race")
        .head().getLong(0) == 6000L, "no duplicates under the commit race")
      // versions are gap-free and serialized: one commit per insert
      assert(CowTable.currentVersion(s"$wh/ns/race") == 7, // create + 6 inserts
        s"expected 7 serialized versions, got ${CowTable.currentVersion(s"$wh/ns/race")}")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("atomic CTAS/RTAS: staged publish, clustered layout, history preserved, no half-tables") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import graft.sinks.CowTable
      // partitioned CTAS: the staged write runs the clustered V2 path,
      // so the published v1 carries one file per partition value
      s.sql("CREATE TABLE cowt.ns.c2 PARTITIONED BY (g) " +
        "AS SELECT id, id % 3 AS g FROM range(90)")
      val t = s"$wh/ns/c2"
      assert(CowTable.snapshotFiles(t).size == 3)
      assert(CowTable.currentVersion(t) == 1, "atomic CTAS publishes ONE version")
      assert(s.sql("SELECT count(*) FROM cowt.ns.c2").head().getLong(0) == 90L)
      // the published layout serves the manifest machinery
      CowTable.setStatsColumns(s, t, Seq("g"))
      val f = s.sql("SELECT count(*) AS c FROM cowt.ns.c2 WHERE g = 1")
      assert(f.queryExecution.executedPlan.toString.contains("CowAggScan"))
      assert(f.head().getLong(0) == 30L)
      // RTAS: the replace lands as the NEXT version of the SAME table —
      // pre-replace snapshots stay time-travelable (the non-staging
      // drop-and-recreate fallback destroyed them)
      s.sql("INSERT INTO cowt.ns.c2 SELECT id, id % 3 FROM range(90, 120)")
      s.sql("REPLACE TABLE cowt.ns.c2 AS SELECT id AS k, id * 2 AS v FROM range(10)")
      assert(s.table("cowt.ns.c2").columns.toSeq == Seq("k", "v"))
      assert(s.sql("SELECT count(*) FROM cowt.ns.c2").head().getLong(0) == 10L)
      assert(s.sql("SELECT count(*) FROM cowt.ns.c2 VERSION AS OF 3")
        .head().getLong(0) == 120L, "pre-replace snapshot must survive RTAS")
      // a failing CTAS aborts: no table, no staged leftovers
      intercept[Throwable] {
        s.sql("CREATE TABLE cowt.ns.bad AS " +
          "SELECT assert_true(id < 5) AS a, id FROM range(10)")
      }
      assert(!s.catalog.tableExists("cowt.ns.bad"))
      val leftovers = scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$wh/ns"))) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.count(_.getFileName.toString.startsWith("."))
      }
      assert(leftovers == 0, "aborted stage directories must be deleted")
      // staging dirs never leak into SHOW TABLES
      assert(s.sql("SHOW TABLES IN cowt.ns").collect()
        .map(_.getString(1)).toSet == Set("c2"))
      // CREATE OR REPLACE covers both arms
      s.sql("CREATE OR REPLACE TABLE cowt.ns.c3 AS SELECT id FROM range(5)")
      s.sql("CREATE OR REPLACE TABLE cowt.ns.c3 AS SELECT id FROM range(7)")
      assert(s.sql("SELECT count(*) FROM cowt.ns.c3").head().getLong(0) == 7L)
      assert(CowTable.currentVersion(s"$wh/ns/c3") == 2,
        "create-or-replace on an existing table is its next version")
      // a driver CRASH mid-CTAS (no abort call) strands its .stage-*
      // dir; the TTL sweep on listTables/stage reclaims it (ADVICE r17)
      val orphan = java.nio.file.Paths.get(s"$wh/ns/.stage-crashed-1")
      java.nio.file.Files.createDirectories(orphan)
      java.nio.file.Files.write(orphan.resolve("part-0.parquet"),
        Array[Byte](1, 2, 3))
      s.sql("SHOW TABLES IN cowt.ns").collect() // default 24h TTL: survives
      assert(java.nio.file.Files.isDirectory(orphan),
        "a fresh stage dir (a live CTAS) must NOT be swept")
      s.conf.set("spark.graft.stageOrphanTtlMs", "1")
      Thread.sleep(20)
      s.sql("SHOW TABLES IN cowt.ns").collect()
      assert(!java.nio.file.Files.exists(orphan),
        "a stage dir older than the TTL is a crashed CTAS: swept")
      s.conf.unset("spark.graft.stageOrphanTtlMs")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("schema evolution parity on the DSv2 identifier face: widen/drop/add/rename, mixed-era files") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import s.implicits._
      import graft.sinks.CowTable
      val t = s"$wh/ns/ev"
      CowTable.create(Seq((1, 10.0f, "a"), (2, 20.0f, "b")).toDF("id", "v", "name"), t)
      // WIDEN (int->bigint, float->double): old INT32/FLOAT pages read
      // at the declared type through the identifier face
      s.sql("ALTER TABLE cowt.ns.ev ALTER COLUMN id TYPE BIGINT")
      s.sql("ALTER TABLE cowt.ns.ev ALTER COLUMN v TYPE DOUBLE")
      val w = s.sql("SELECT * FROM cowt.ns.ev ORDER BY id").collect()
      assert(w.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ==
        Seq((1L, 10.0, "a"), (2L, 20.0, "b")))
      // DROP: the column vanishes from schema and reads
      s.sql("ALTER TABLE cowt.ns.ev DROP COLUMN name")
      assert(s.table("cowt.ns.ev").columns.toSeq == Seq("id", "v"))
      // ADD + INSERT: the snapshot now MIXES pre-widen (int/float) and
      // post-widen (bigint/double) physical files — the old
      // mergeSchema read threw CANNOT_MERGE_SCHEMAS here
      s.sql("ALTER TABLE cowt.ns.ev ADD COLUMN extra BIGINT")
      s.sql("INSERT INTO cowt.ns.ev VALUES (3, 30.0, 99)")
      val m = s.sql("SELECT * FROM cowt.ns.ev ORDER BY id").collect()
      assert(m.map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq ==
        Seq((1L, 10.0, -1L), (2L, 20.0, -1L), (3L, 30.0, 99L)))
      // RENAME across the mix: lineage coalesce still serves old files
      s.sql("ALTER TABLE cowt.ns.ev RENAME COLUMN v TO value")
      assert(s.sql("SELECT sum(value) AS sv FROM cowt.ns.ev").head().getDouble(0) == 60.0)
      // aggregates pushing down must NOT answer from stats recorded
      // under old physical names (rename-lineage decline) — but plain
      // counts still read correctly
      assert(s.sql("SELECT count(*) AS c FROM cowt.ns.ev").head().getLong(0) == 3L)
      // time travel shows each snapshot through ITS declared schema
      assert(s.sql("SELECT * FROM cowt.ns.ev VERSION AS OF 1").columns.toSeq ==
        Seq("id", "v", "name"))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("distributed MoR key deletes: large sidecars route through a LEFT ANTI JOIN, no driver cap") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      import s.implicits._
      // semantics under the FORCED join path: small sidecar, every read
      // shape (count, filter, projection pruning the key column)
      val t = s"$wh/ns/mj"
      CowTable.create((0L until 1000L).map(i => (i, i * 3, s"n_$i"))
        .toDF("id", "v", "name").repartition(3), t)
      CowTable.deleteMorKeys(s, t, (0L until 1000L by 100).toDF("id"), "id")
      s.conf.set("spark.graft.morAntiJoinForce", "true")
      def q = s.sql("SELECT count(*) AS c FROM cowt.ns.mj")
      assert(q.queryExecution.optimizedPlan.toString.contains("LeftAnti"),
        q.queryExecution.optimizedPlan.toString.take(1500))
      assert(q.head().getLong(0) == 990L)
      // projection that prunes the key column still deletes correctly
      val vs = s.sql("SELECT sum(v) AS sv FROM cowt.ns.mj").head().getLong(0)
      assert(vs == (0L until 1000L).filterNot(_ % 100 == 0).map(_ * 3).sum, vs)
      // filters compose above the anti-join
      assert(s.sql("SELECT count(*) AS c FROM cowt.ns.mj WHERE id < 250")
        .head().getLong(0) == 247L) // 0,100,200 deleted
      s.conf.unset("spark.graft.morAntiJoinForce")
      // the REAL trigger: a >100k-key sidecar — the reader path's loud
      // cap is unreachable because footer row counts route to the join
      val tb = s"$wh/ns/mjbig"
      CowTable.create(s.range(300000L).select(col("id"), (col("id") * 2).as("v")), tb)
      CowTable.deleteMorKeys(s, tb, s.range(130000L).select(col("id")), "id")
      val big = s.sql("SELECT count(*) AS c, sum(v) AS sv FROM cowt.ns.mjbig")
      assert(big.queryExecution.optimizedPlan.toString.contains("LeftAnti"),
        "a 130k-key sidecar must take the anti-join, not the capped reader path")
      val bigRow = big.head()
      assert(bigRow.getLong(0) == 170000L)
      assert(bigRow.getLong(1) == (130000L until 300000L).map(_ * 2).sum)
      // time travel to the pre-delete snapshot is untouched
      val v1 = 1
      assert(s.sql(s"SELECT count(*) AS c FROM cowt.ns.mjbig VERSION AS OF $v1")
        .head().getLong(0) == 300000L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("catalog LIMIT pushdown: the scan plans only the file prefix covering the limit") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import s.implicits._
      val t = s"$wh/ns/l"
      CowTable.create((0L until 4000L).map(i => (i, i * 3)).toDF("id", "v")
        .repartition(8), t)
      val nFiles = CowTable.snapshotFiles(t).size
      assert(nFiles >= 8)
      def scanFiles(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        def nodes(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] =
          (p +: p.children.flatMap(nodes)) ++ (p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              nodes(a.executedPlan)
            case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              nodes(qs.plan)
            case _ => Seq.empty
          })
        nodes(df.queryExecution.executedPlan).collectFirst {
          case b: BatchScanExec => b.inputRDD.getNumPartitions }.getOrElse(-1)
      }
      val q5 = s.sql("SELECT * FROM cowt.ns.l LIMIT 5")
      assert(q5.count() == 5)
      assert(scanFiles(s.sql("SELECT * FROM cowt.ns.l LIMIT 5")) == 1,
        "LIMIT 5 must plan exactly the first file")
      // a limit above one file's rows takes a longer prefix, still < all
      val big = s.sql("SELECT * FROM cowt.ns.l LIMIT 600")
      assert(big.count() == 600)
      val readBig = scanFiles(s.sql("SELECT * FROM cowt.ns.l LIMIT 600"))
      assert(readBig >= 2 && readBig < nFiles, s"read $readBig of $nFiles")
      // a limit beyond the table returns everything
      assert(s.sql("SELECT * FROM cowt.ns.l LIMIT 99999").count() == 4000)
      // filters keep the scan unpruned-by-limit (residual rows could
      // fall short of the limit)
      val f = s.sql("SELECT * FROM cowt.ns.l WHERE v % 2 = 0 LIMIT 5")
      assert(f.count() == 5)
      // MoR-dirty: declined — counts no longer cover the limit honestly
      CowTable.deleteMorKeys(s, t, Seq(0L, 1L).toDF("id"), "id")
      val m = s.sql("SELECT * FROM cowt.ns.l LIMIT 3999")
      assert(m.count() == 3998L, "2 deleted of 4000")
      assert(scanFiles(s.sql("SELECT * FROM cowt.ns.l LIMIT 3999")) == nFiles,
        "dirty snapshot must not limit-prune")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("catalog TopN pushdown: ORDER BY clustering key LIMIT n plans only the covering ORDERED prefix") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val t = s"$wh/ns/tn"
      // range-clustered on id (8 disjoint files); v deliberately
      // OVERLAPS across files (modular), so only id carries the proof
      CowTable.create((0L until 4000L).map(i => (i, (i * 7919) % 4000))
        .toDF("id", "v").repartitionByRange(8, col("id")), t)
      CowTable.setStatsColumns(s, t, Seq("id", "v"))
      val nFiles = CowTable.snapshotFiles(t).size
      assert(nFiles == 8)
      def scanFiles(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        def nodes(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] =
          (p +: p.children.flatMap(nodes)) ++ (p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              nodes(a.executedPlan)
            case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              nodes(qs.plan)
            case _ => Seq.empty
          })
        nodes(df.queryExecution.executedPlan).collectFirst {
          case b: BatchScanExec => b.inputRDD.getNumPartitions }.getOrElse(-1)
      }
      // ascending: the min-id file alone covers LIMIT 5, values exact
      val asc = s.sql("SELECT id FROM cowt.ns.tn ORDER BY id LIMIT 5")
      assert(asc.collect().map(_.getLong(0)).toSeq == (0L until 5L).toSeq)
      assert(scanFiles(s.sql("SELECT id FROM cowt.ns.tn ORDER BY id LIMIT 5")) == 1,
        "ascending top-5 must plan exactly the first file IN id ORDER")
      // descending: the max-id file alone
      val desc = s.sql("SELECT id FROM cowt.ns.tn ORDER BY id DESC LIMIT 5")
      assert(desc.collect().map(_.getLong(0)).toSeq ==
        (3999L to 3995L by -1L).toSeq)
      assert(scanFiles(s.sql("SELECT id FROM cowt.ns.tn ORDER BY id DESC LIMIT 5")) == 1,
        "descending top-5 must plan exactly the last file")
      // a limit spanning one file boundary takes a longer prefix
      val mid = scanFiles(s.sql("SELECT id FROM cowt.ns.tn ORDER BY id LIMIT 600"))
      assert(mid >= 2 && mid < nFiles, s"read $mid of $nFiles")
      // secondary sort keys ride the leading-key proof
      assert(scanFiles(s.sql("SELECT id FROM cowt.ns.tn ORDER BY id, v LIMIT 5")) == 1)
      // an OVERLAPPING column has no disjoint index: full scan
      assert(scanFiles(s.sql("SELECT v FROM cowt.ns.tn ORDER BY v LIMIT 5")) == nFiles,
        "overlapping file ranges must not TopN-prune")
      // COMPOSITION with an exact-pushed filter (r18): an identity-
      // partitioned table whose per-value files are id-disjoint — the
      // filtered subset keeps the disjointness proof, so
      // WHERE g = 1 ORDER BY id LIMIT plans ONE file of that value's
      val t3 = s"$wh/ns/tn3"
      CowTable.create((0L until 4000L).map(i => (i, i / 2000L))
        .toDF("id", "g").repartitionByRange(4, col("id")), t3,
        Seq(graft.sinks.PartitionTransform.identity("g")))
      CowTable.setStatsColumns(s, t3, Seq("id", "g"))
      val n3 = CowTable.snapshotFiles(t3).size
      assert(n3 >= 4, s"expected per-value id-range files, got $n3")
      val ft = s.sql("SELECT id FROM cowt.ns.tn3 WHERE g = 1 ORDER BY id LIMIT 5")
      assert(ft.collect().map(_.getLong(0)).toSeq == (2000L until 2005L).toSeq)
      assert(scanFiles(
        s.sql("SELECT id FROM cowt.ns.tn3 WHERE g = 1 ORDER BY id LIMIT 5")) == 1,
        "exact filter + ordered top-5 must plan one file of the kept value")
      // NULLs in the sort column anywhere: declined (ordering would
      // interleave arbitrary files)
      val t2 = s"$wh/ns/tn2"
      CowTable.create((0L until 400L)
        .map(i => (if (i == 7) None else Some(i), i))
        .toDF("id", "v").repartitionByRange(4, col("id")), t2)
      CowTable.setStatsColumns(s, t2, Seq("id"))
      val n2 = CowTable.snapshotFiles(t2).size
      assert(scanFiles(s.sql("SELECT id FROM cowt.ns.tn2 ORDER BY id LIMIT 5")) == n2,
        "a null in the sort column must decline the prefix proof")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("exact filter pushdown: file-constant equality unlocks filtered aggregate + limit pushdown") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import s.implicits._
      import graft.sinks.PartitionTransform
      val t = s"$wh/ns/e"
      CowTable.create((0L until 1200L).map(i => (i, i % 3, i * 2))
        .toDF("id", "grp", "v").repartition(4),
        t, Seq(PartitionTransform.identity("grp")))
      CowTable.setStatsColumns(s, t, Seq("grp", "v"))
      // filtered COUNT/MIN/MAX answers from the manifest: grp = 1 is
      // file-exact (identity partitioning), so the filter is FULLY
      // pushed and the aggregate rides the certified subset
      val q = s.sql("SELECT count(*) AS c, min(v) AS mn, max(v) AS mx " +
        "FROM cowt.ns.e WHERE grp = 1")
      assert(q.queryExecution.executedPlan.toString.contains("CowAggScan"),
        q.queryExecution.executedPlan.toString.take(1500))
      val r = q.head()
      val want = (0L until 1200L).filter(_ % 3 == 1).map(_ * 2)
      assert(r.getLong(0) == want.size.toLong && r.getLong(1) == want.min &&
        r.getLong(2) == want.max, r.toString)
      // IN over two exact values
      val q2 = s.sql("SELECT count(*) AS c FROM cowt.ns.e WHERE grp IN (0, 2)")
      assert(q2.queryExecution.executedPlan.toString.contains("CowAggScan"))
      assert(q2.head().getLong(0) == (0L until 1200L).count(i => i % 3 != 1).toLong)
      // a NON-file-constant column keeps its residual: no aggregate
      // pushdown, same answer
      val nf = s.sql("SELECT count(*) AS c FROM cowt.ns.e WHERE v = 4")
      assert(!nf.queryExecution.executedPlan.toString.contains("CowAggScan"))
      assert(nf.head().getLong(0) == 1L)
      // LIMIT under the exact filter: prefix-pruned within the kept files
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      def scanParts(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        def nodes(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] =
          (p +: p.children.flatMap(nodes)) ++ (p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              nodes(a.executedPlan)
            case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              nodes(qs.plan)
            case _ => Seq.empty
          })
        nodes(df.queryExecution.executedPlan).collectFirst {
          case b: BatchScanExec => b.inputRDD.getNumPartitions }.getOrElse(-1)
      }
      val lim = s.sql("SELECT * FROM cowt.ns.e WHERE grp = 1 LIMIT 5")
      assert(lim.count() == 5)
      assert(lim.collect().forall(_.getLong(1) == 1L), "every limited row matches")
      assert(scanParts(s.sql("SELECT * FROM cowt.ns.e WHERE grp = 1 LIMIT 5")) == 1,
        "limit under an exact filter plans one kept file")
      // rows equal the unfiltered-plan computation across the board
      assert(s.sql("SELECT sum(v) FROM cowt.ns.e WHERE grp = 1").head().getLong(0)
        == want.sum)
      // a null in the filter column anywhere breaks the certificate:
      // plans fall back, answers stay right
      CowTable.append(s, t,
        Seq((9999L, null.asInstanceOf[java.lang.Long], 0L))
          .toDF("id", "grp", "v"))
      val afterNull = s.sql("SELECT count(*) AS c FROM cowt.ns.e WHERE grp = 1")
      assert(afterNull.head().getLong(0) == want.size.toLong,
        "null rows never match the equality")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("catalog aggregate pushdown GROUP BY: file-constant group columns answer from the manifest") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import s.implicits._
      import graft.sinks.PartitionTransform
      val t = s"$wh/ns/g"
      // identity-partitioned by grp → each file carries ONE grp value
      CowTable.create((0L until 900L).map(i => (i, i % 3, i * 2))
        .toDF("id", "grp", "v").repartition(4),
        t, Seq(PartitionTransform.identity("grp")))
      CowTable.setStatsColumns(s, t, Seq("grp", "v"))
      def q = s.sql("SELECT grp, count(*) AS c, min(v) AS mn, max(v) AS mx " +
        "FROM cowt.ns.g GROUP BY grp")
      assert(q.queryExecution.executedPlan.toString.contains("CowAggScan"),
        q.queryExecution.executedPlan.toString.take(1500))
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
      val want = (0L until 900L).map(i => (i % 3, i * 2)).groupBy(_._1)
        .map { case (g, xs) => (g, xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max) }
        .toSeq.sortBy(_._1)
      assert(got == want, s"got $got want $want")
      // grouping by a NON-file-constant column declines → ordinary
      // aggregate over the scan, same answers
      val f = s.sql("SELECT v % 2 AS p, count(*) AS c FROM cowt.ns.g GROUP BY v % 2")
      assert(!f.queryExecution.executedPlan.toString.contains("CowAggScan"))
      assert(f.collect().map(_.getLong(1)).sum == 900L)
      // a non-file-constant group key (v varies within every file, and
      // its min != max stats prove it) also declines
      val m = s.sql("SELECT v, count(*) AS c FROM cowt.ns.g GROUP BY v")
      assert(!m.queryExecution.executedPlan.toString.contains("CowAggScan"),
        "v is not file-constant — pushdown must decline")
      assert(m.count() == 900L)
      // float/double group keys decline even when file-constant: -0.0
      // and 0.0 are distinct boxed values but ONE group under Spark's
      // NormalizeFloatingNumbers semantics (ADVICE r16)
      val tf = s"$wh/ns/gf"
      CowTable.create(Seq((1L, -0.0), (2L, -0.0)).toDF("id", "d"), tf)
      CowTable.append(s, tf, Seq((3L, 0.0), (4L, 0.0)).toDF("id", "d"))
      CowTable.setStatsColumns(s, tf, Seq("d"))
      val fq = s.sql("SELECT d, count(*) AS c FROM cowt.ns.gf GROUP BY d")
      assert(!fq.queryExecution.executedPlan.toString.contains("CowAggScan"),
        "double group key must decline manifest GROUP BY pushdown")
      val frows = fq.collect()
      assert(frows.length == 1 && frows.head.getLong(1) == 4L,
        s"-0.0 and 0.0 are one group: ${frows.mkString(",")}")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("rename lineage: lineage names can never be reused; compact retires the lineage") {
    import spark.implicits._
    val path = tmp
    CowTable.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), path)
    CowTable.renameColumn(spark, path, "v", "w")
    CowTable.renameColumn(spark, path, "w", "x")
    // "w" never reached a data file (the physical guard can't see it)
    // but x's lineage still claims it — re-adding would let the read
    // coalesce group silently substitute the new column's values
    // wherever x stores NULL (ADVICE r15, medium)
    val e = intercept[IllegalArgumentException] {
      CowTable.addColumn(spark, path, "w", "bigint")
    }
    assert(e.getMessage.contains("lineage"), e.getMessage)
    // renaming another column ONTO a lineage name is the same hole
    CowTable.addColumn(spark, path, "tmpc", "string")
    val eR = intercept[IllegalArgumentException] {
      CowTable.renameColumn(spark, path, "tmpc", "w")
    }
    assert(eR.getMessage.contains("lineage"), eR.getMessage)
    // "v" is claimed twice over: by x's lineage AND physically in the
    // original files — either guard must refuse it
    val e2 = intercept[IllegalArgumentException] {
      CowTable.addColumn(spark, path, "v", "bigint")
    }
    assert(e2.getMessage.contains("lineage") || e2.getMessage.contains("physically"),
      e2.getMessage)
    CowTable.dropColumn(spark, path, "tmpc")
    // compact rewrites every file under CURRENT names and strips the
    // lineage from the carried schema line: both names are genuinely
    // free afterwards
    CowTable.compact(spark, path, 1)
    assert(CowTable.declaredSchema(path).get.fields
      .forall(!_.metadata.contains("was")),
      "compact must strip rename lineage (no surviving file carries an old name)")
    CowTable.addColumn(spark, path, "v", "bigint")
    CowTable.addColumn(spark, path, "w", "string")
    val rows = CowTable.read(spark, path)
    assert(rows.columns.toSeq == Seq("id", "x", "v", "w"), rows.columns.toSeq)
    assert(rows.filter(col("v").isNotNull || col("w").isNotNull).count() == 0,
      "re-added columns read NULL; nothing leaks from the renamed column")
    assert(rows.agg(sum("x")).head().getLong(0) == 30L)
    // new writes land in the re-added columns without touching x
    CowTable.append(spark, path, Seq((3L, 30L, 99L, "t")).toDF("id", "x", "v", "w"))
    val after = CowTable.read(spark, path)
    assert(after.filter(col("id") === 3L).select("x", "v", "w")
      .head().toString == "[30,99,t]")
    assert(after.filter(col("id") === 1L).select("v").head().isNullAt(0))
    // time travel: the pre-compact snapshot still resolves x through
    // its own lineage (old manifests keep their own schema lines)
    assert(CowTable.read(spark, path, Some(3)).agg(sum("x")).head().getLong(0) == 30L)
  }

  test("alterSchema: multi-change is atomic — a failing later change applies nothing") {
    import spark.implicits._
    import graft.sinks.SchemaChange
    val path = tmp
    CowTable.create(Seq((1L, 10L)).toDF("id", "v"), path)
    val v0 = CowTable.currentVersion(path)
    // change 2 collides with a declared column: NOTHING commits
    val e = intercept[IllegalArgumentException] {
      CowTable.alterSchema(spark, path, Seq(
        SchemaChange.Add("tag", "string"), SchemaChange.Add("v", "bigint")))
    }
    assert(e.getMessage.contains("already declared"), e.getMessage)
    assert(CowTable.currentVersion(path) == v0,
      "failed multi-change must leave no commit behind")
    assert(!CowTable.read(spark, path).columns.contains("tag"),
      "the earlier change of a failed statement must not be applied")
    // a valid multi-change lands as ONE commit
    CowTable.alterSchema(spark, path, Seq(
      SchemaChange.Add("tag", "string"),
      SchemaChange.Rename("v", "val"),
      SchemaChange.Widen("id", "bigint")))
    assert(CowTable.currentVersion(path) == v0 + 1, "one commit for the statement")
    assert(CowTable.read(spark, path).columns.toSeq == Seq("id", "val", "tag"))
  }

  test("SQL ALTER TABLE atomicity + attribute rejection (NOT NULL / FIRST / COMMENT)") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      s.sql("CREATE TABLE cowt.ns.at (id BIGINT, v INT)")
      s.sql("INSERT INTO cowt.ns.at VALUES (1, 10)")
      // rename so a physically-retired name exists that Spark's own
      // analysis can't see (it checks the DECLARED schema only)
      s.sql("ALTER TABLE cowt.ns.at RENAME COLUMN v TO val")
      val v0 = CowTable.currentVersion(s"$wh/ns/at")
      // multi-change where the SECOND column fails our physical guard:
      // the whole statement must apply nothing
      val e = intercept[Exception] {
        s.sql("ALTER TABLE cowt.ns.at ADD COLUMNS (tag STRING, v BIGINT)")
      }
      assert(e.getMessage.contains("physically") || e.getMessage.contains("lineage"),
        e.getMessage)
      assert(CowTable.currentVersion(s"$wh/ns/at") == v0,
        "failed ALTER TABLE must leave no commit")
      assert(!s.sql("SELECT * FROM cowt.ns.at").columns.contains("tag"),
        "partial DDL application (ADVICE r15)")
      // attributes the format cannot honor are rejected loudly
      val eNN = intercept[Exception] {
        s.sql("ALTER TABLE cowt.ns.at ADD COLUMN y INT NOT NULL")
      }
      assert(eNN.getMessage.contains("NOT NULL"), eNN.getMessage)
      val ePos = intercept[Exception] {
        s.sql("ALTER TABLE cowt.ns.at ADD COLUMN y INT FIRST")
      }
      assert(ePos.getMessage.contains("FIRST/AFTER"), ePos.getMessage)
      val eCom = intercept[Exception] {
        s.sql("ALTER TABLE cowt.ns.at ADD COLUMN y INT COMMENT 'c'")
      }
      assert(eCom.getMessage.contains("COMMENT"), eCom.getMessage)
      // a multi-clause success is ONE commit
      s.sql("ALTER TABLE cowt.ns.at ADD COLUMNS (a INT, b STRING)")
      assert(CowTable.currentVersion(s"$wh/ns/at") == v0 + 1)
      assert(s.sql("SELECT * FROM cowt.ns.at").columns.toSeq ==
        Seq("id", "val", "a", "b"))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("SQL CALL procedures: compact / expire_snapshots / cluster / stats + zorder declarations") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import graft.sinks.CowTable
      s.sql("CREATE TABLE cowt.ns.p (id BIGINT, x BIGINT, y BIGINT)")
      (0 until 4).foreach(i => s.sql(
        s"INSERT INTO cowt.ns.p SELECT id, id % 97, (id * 31) % 89 FROM range(${i * 1000}, ${i * 1000 + 1000})"))
      val t = s"$wh/ns/p"
      val filesBefore = CowTable.snapshotFiles(t).size
      assert(filesBefore >= 4)
      // compact: fewer files, same rows, returns the new version
      val vc = s.sql("CALL cowt.system.compact(`table` => 'ns.p', files => 2)")
        .head().getLong(0)
      assert(vc == CowTable.currentVersion(t))
      assert(CowTable.snapshotFiles(t).size <= 2)
      assert(s.sql("SELECT count(*) FROM cowt.ns.p").head().getLong(0) == 4000L)
      // stats + zorder declarations through CALL
      s.sql("CALL cowt.system.set_stats_columns('ns.p', 'x,y')")
      s.sql("CALL cowt.system.set_zorder('ns.p', 'x,y')")
      assert(CowTable.zorderSpec(t).exists(_.cols.map(_._1) == Seq("x", "y")))
      // cluster (z-order rewrite) through CALL; same rows
      s.sql("CALL cowt.system.cluster('ns.p', 'x,y', 4)")
      assert(s.sql("SELECT count(*) FROM cowt.ns.p").head().getLong(0) == 4000L)
      // expire: keep last 2 snapshots, old manifests gone, data intact
      val r = s.sql("CALL cowt.system.expire_snapshots('ns.p', 2)").head()
      assert(r.getLong(0) > 0L, "must expire old manifests")
      assert(s.sql("SELECT count(*) FROM cowt.ns.p").head().getLong(0) == 4000L)
      // lookup sidecars + row-count backfill through CALL
      s.sql("CALL cowt.system.set_lookup_columns('ns.p', 'id', 64, 4096)")
      assert(CowTable.lookupSpec(t).isDefined)
      s.sql("CALL cowt.system.backfill_row_counts('ns.p')")
      assert(CowTable.fileRowCounts(t).values.sum == 4000L)
      intercept[Exception] {
        s.sql("CALL cowt.system.no_such_proc('ns.p')").collect() }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("metadata tables: t$history and t$files serve manifest rows from SQL, time-travelable files") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import graft.sinks.CowTable
      s.sql("CREATE TABLE cowt.ns.m (id BIGINT, g BIGINT) PARTITIONED BY (g)")
      s.sql("INSERT INTO cowt.ns.m SELECT id, id % 3 FROM range(30)")
      s.sql("INSERT INTO cowt.ns.m SELECT id, id % 3 FROM range(30, 60)")
      val t = s"$wh/ns/m"
      // history: one row per version, version/count columns live
      val h = s.sql("SELECT version, n_data_files, commit_time_ms " +
        "FROM cowt.ns.`m$history` ORDER BY version").collect()
      assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), h.mkString(","))
      assert(h.last.getLong(1) == 6L, "v3 carries both inserts' 3+3 files")
      assert(h.forall(_.getLong(2) > 0L), "commit stamps present")
      // files: inventory of the CURRENT snapshot with row counts
      val f = s.sql("SELECT kind, count(*) c, sum(row_count) r " +
        "FROM cowt.ns.`m$files` GROUP BY kind").collect()
      assert(f.length == 1 && f.head.getString(0) == "data" &&
        f.head.getLong(1) == 6L && f.head.getLong(2) == 60L, f.mkString(","))
      // VERSION AS OF on $files = that snapshot's inventory
      assert(s.sql("SELECT count(*) FROM cowt.ns.`m$files` VERSION AS OF 2")
        .head().getLong(0) == 3L)
      // $partitions: per-value census with row counts
      val parts = s.sql("SELECT partition, n_files, row_count " +
        "FROM cowt.ns.`m$partitions` ORDER BY partition").collect()
      assert(parts.length == 3 &&
        parts.map(_.getString(0)).toSeq == Seq("p_g=0", "p_g=1", "p_g=2") &&
        parts.forall(p => p.getLong(1) == 2L && p.getLong(2) == 20L),
        parts.mkString(","))
      assert(s.sql("SELECT sum(row_count) FROM cowt.ns.`m$partitions` VERSION AS OF 2")
        .head().getLong(0) == 30L)
      // a MoR delete shows as a sidecar row
      CowTable.deleteMorKeys(s, t, s.range(0, 2).toDF("id"), "id")
      val kinds = s.sql("SELECT DISTINCT kind FROM cowt.ns.`m$files`")
        .collect().map(_.getString(0)).toSet
      assert(kinds == Set("data", "delete_keys"), kinds.toString)
      // reserved names refuse creation; missing base refuses loading
      val eRes = intercept[Exception] {
        s.sql("CREATE TABLE cowt.ns.`x$files` (id BIGINT)") }
      assert(eRes.getMessage.contains("reserved"), eRes.getMessage)
      intercept[Exception] { s.sql("SELECT * FROM cowt.ns.`nope$history`").collect() }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("write-side z-order: INSERT range-shuffles on the stored curve; pruning fires on EVERY z column") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "16")
        // at test scale AQE would coalesce the z range-shuffle into one
        // fat partition (the CORRECT at-scale behavior — files track the
        // advisory size; 100k modular longs compress to a few KB of
        // shuffle bytes); shrink the advisory so the fan-out is visible
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import graft.sinks.CowTable
      // Z table: both columns declared; bounds from explicit spec (the
      // table is empty at declaration time)
      s.sql("CREATE TABLE cowt.ns.z (x BIGINT, y BIGINT, p BIGINT)")
      val t = s"$wh/ns/z"
      CowTable.setZorderBounds(s, t, Seq(("x", 0.0, 999.0), ("y", 0.0, 999.0)))
      CowTable.setStatsColumns(s, t, Seq("x", "y"))
      s.sql("INSERT INTO cowt.ns.z SELECT id % 1000, (id * 7919) % 1000, id FROM range(100000)")
      val zf = CowTable.snapshotFiles(t)
      assert(zf.size >= 8, s"ordered distribution must fan out: ${zf.size} files")
      assert(s.sql("SELECT count(*), sum(p) FROM cowt.ns.z").head().getLong(0) == 100000L,
        "z shuffle must not lose rows")
      // the curve gives BOTH columns tight per-file ranges: a 10%-of-
      // domain predicate on either column prunes most files
      val px = CowTable.prunedFilesRange(s, t, "x", Some(0L), Some(99L))
      val py = CowTable.prunedFilesRange(s, t, "y", Some(0L), Some(99L))
      assert(px.size <= zf.size / 2, s"x prune kept ${px.size}/${zf.size}")
      assert(py.size <= zf.size / 2, s"y prune kept ${py.size}/${zf.size} — " +
        "the SECOND z column must prune too")
      // single-column twin: same data, z-order on x alone — y pruning
      // keeps everything, which is exactly what the 2-D curve fixes
      s.sql("CREATE TABLE cowt.ns.z1 (x BIGINT, y BIGINT, p BIGINT)")
      val t1 = s"$wh/ns/z1"
      CowTable.setZorderBounds(s, t1, Seq(("x", 0.0, 999.0)))
      CowTable.setStatsColumns(s, t1, Seq("x", "y"))
      s.sql("INSERT INTO cowt.ns.z1 SELECT id % 1000, (id * 7919) % 1000, id FROM range(100000)")
      val f1 = CowTable.snapshotFiles(t1)
      val px1 = CowTable.prunedFilesRange(s, t1, "x", Some(0L), Some(99L))
      val py1 = CowTable.prunedFilesRange(s, t1, "y", Some(0L), Some(99L))
      assert(px1.size <= f1.size / 2, "leading column prunes under 1-D ordering")
      assert(py1.size == f1.size,
        s"non-leading column cannot prune a 1-D layout (${py1.size}/${f1.size})")
      // filtered result equality: pruned read ≡ full scan
      val exp = s.sql("SELECT sum(p) FROM cowt.ns.z WHERE y BETWEEN 0 AND 99")
        .head().getLong(0)
      val got = CowTable.readFiles(s, t, py, None)
        .filter(org.apache.spark.sql.functions.col("y").between(0, 99))
        .agg(org.apache.spark.sql.functions.sum("p")).head().getLong(0)
      assert(got == exp, "pruned file set must cover every matching row")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("INSERT OVERWRITE: dynamic replaces only written partitions, static PARTITION(col=v), inode-carried survivors") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    val wh = tmp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns"))
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    def fileKey(f: String): Object =
      java.nio.file.Files.readAttributes(java.nio.file.Paths.get(f),
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
    try {
      val s = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.cowt", classOf[graft.sinks.CowCatalog].getName)
        .config("spark.sql.catalog.cowt.root", wh)
        .getOrCreate()
      import graft.sinks.CowTable
      // days-partitioned table, three days of data
      s.sql("CREATE TABLE cowt.ns.ow (id BIGINT, d DATE) PARTITIONED BY (days(d))")
      s.sql("INSERT INTO cowt.ns.ow SELECT id, " +
        "date_add(DATE'2024-03-01', CAST(id % 3 AS INT)) FROM range(90)")
      val t = s"$wh/ns/ow"
      val vPre = CowTable.currentVersion(t)
      val preFiles = CowTable.snapshotFiles(t)
      assert(preFiles.size == 3, s"clustered insert: one file per day, got $preFiles")
      val survivors = preFiles.filterNot(_.contains("=2024-03-02"))
      val survivorKeys = survivors.map(f => f -> fileKey(f)).toMap
      // DYNAMIC: overwrite carrying only day 2024-03-02 rows
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      s.sql("INSERT OVERWRITE cowt.ns.ow SELECT id, DATE'2024-03-02' FROM range(1000, 1005)")
      assert(s.sql("SELECT count(*) FROM cowt.ns.ow").head().getLong(0) == 65L,
        "30 + 30 untouched days + 5 fresh rows")
      assert(s.sql("SELECT count(*) FROM cowt.ns.ow WHERE d = DATE'2024-03-02'")
        .head().getLong(0) == 5L, "replaced day holds ONLY the fresh rows")
      val postFiles = CowTable.snapshotFiles(t)
      survivors.foreach { f =>
        assert(postFiles.contains(f), s"untouched day's file must carry: $f")
        assert(fileKey(f) == survivorKeys(f), s"survivor rewritten (inode changed): $f")
      }
      // time travel: the pre-overwrite day is still there
      assert(s.sql(s"SELECT count(*) FROM cowt.ns.ow VERSION AS OF $vPre " +
        "WHERE d = DATE'2024-03-02'").head().getLong(0) == 30L)
      // dynamic overwrite with ZERO rows replaces nothing (not a truncate)
      val vNoop = CowTable.currentVersion(t)
      s.sql("INSERT OVERWRITE cowt.ns.ow SELECT id, DATE'2024-03-02' FROM range(0)")
      assert(s.sql("SELECT count(*) FROM cowt.ns.ow").head().getLong(0) == 65L)
      assert(CowTable.currentVersion(t) == vNoop, "zero-row dynamic overwrite is a no-op")
      // STATIC single-partition replace on an identity-partitioned table
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      s.sql("CREATE TABLE cowt.ns.ows (id BIGINT, g INT) PARTITIONED BY (g)")
      s.sql("INSERT INTO cowt.ns.ows SELECT id, CAST(id % 3 AS INT) FROM range(30)")
      val ts2 = s"$wh/ns/ows"
      val keep = CowTable.snapshotFiles(ts2).filterNot(_.contains("p_g=1"))
      s.sql("INSERT OVERWRITE cowt.ns.ows PARTITION (g = 1) SELECT id FROM range(500, 502)")
      assert(s.sql("SELECT count(*) FROM cowt.ns.ows WHERE g = 1").head().getLong(0) == 2L)
      assert(s.sql("SELECT count(*) FROM cowt.ns.ows").head().getLong(0) == 22L,
        "two untouched groups of 10 + 2 fresh rows")
      keep.foreach(f => assert(CowTable.snapshotFiles(ts2).contains(f),
        s"untouched static partition must carry: $f"))
      // STATIC with no PARTITION clause truncates the whole table
      s.sql("INSERT OVERWRITE cowt.ns.ows SELECT id, CAST(id AS INT) FROM range(4)")
      assert(s.sql("SELECT count(*) FROM cowt.ns.ows").head().getLong(0) == 4L)
      // guard: dynamic overwrite refuses while MoR key-delete sidecars live
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      CowTable.deleteMorKeys(s, t, s.range(0, 1).selectExpr("id"), Seq("id"))
      val eMor = intercept[Exception] {
        s.sql("INSERT OVERWRITE cowt.ns.ow SELECT id, DATE'2024-03-01' FROM range(3)")
      }
      assert(eMor.getMessage != null &&
        (eMor.getMessage.contains("merge-on-read") ||
          Option(eMor.getCause).exists(_.getMessage.contains("merge-on-read"))),
        s"MoR guard must fire loudly: ${eMor.getMessage}")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
