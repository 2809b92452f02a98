package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Minimal COPY-ON-WRITE table format — the seam
  * [[Sinks.scd2Parquet]]/[[Sinks.upsertParquet]] name as their
  * production upgrade (Delta/Iceberg-style), expressed in-repo so MERGE
  * semantics and time travel are testable without external formats:
  *
  *  - `data/` holds immutable parquet files; `_snapshots/v{N}.json` is
  *    a newline list of the files that constitute version N.
  *  - Readers list a SNAPSHOT, never the directory — a concurrent
  *    writer's half-written data file is invisible until its manifest
  *    commits.
  *  - `merge` rewrites ONLY the data files that contain matched keys
  *    (copy-on-write): unmatched files carry over into the new
  *    manifest by reference. At 100 TB this is the property that makes
  *    an upsert proportional to the TOUCHED partitions, not the table.
  *  - Commit = write `v{N+1}.json` to a temp name, then atomic rename;
  *    old manifests stay — `read(asOf = n)` is time travel. The
  *    single-writer assumption is documented (a real format arbitrates
  *    the rename through a catalog/lock service; the COMMIT PROTOCOL —
  *    immutable data + atomic manifest swap — is the same).
  *
  * File-level key pruning uses each file's min/max key footer stats via
  * a per-file aggregate, so "files containing matched keys" is computed
  * with one scan of the key columns, never a full-row read.
  */
object CowTable {

  /** An optimistic commit lost the race: the table advanced past the
    * snapshot this writer's rewrite was based on. The writer's data
    * files are orphans (cleaned by [[expireSnapshots]]); nothing the
    * loser wrote is visible to readers.
    */
  final class ConcurrentCommitException(path: String, attempted: Int)
    extends RuntimeException(
      s"concurrent commit: version $attempted already exists under $path " +
        "(table advanced past this writer's base snapshot)")

  private def snapDir(path: String): Path = Paths.get(path, "_snapshots")

  // ---- commit-publication seam (round 14, VERDICT r13 #6) -----------------

  /** How a fully-written manifest becomes version v — THE serialization
    * point of the whole format. The contract every provider must keep:
    * either v is published exclusively (no other writer has published
    * v) or [[ConcurrentCommitException]] is thrown; a committed version
    * is never clobbered, and readers never observe a partial manifest.
    */
  trait CommitLockProvider {
    def publish(path: String, target: Path, tmp: Path, v: Int): Unit
    def name: String
  }

  /** Default: POSIX link(2) / HDFS create-no-overwrite / ABFS-GCS
    * precondition PUT — one atomic fail-if-exists rename IS the lock.
    */
  object HardLinkProvider extends CommitLockProvider {
    override val name = "hardlink"
    override def publish(path: String, target: Path, tmp: Path, v: Int): Unit =
      try Files.createLink(target, tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(path, v)
      }
  }

  /** The object-store shape (S3): the data path offers NO atomic
    * fail-if-exists write, so exclusivity comes from an EXTERNAL lease
    * — the role DynamoDB plays for Delta's S3 LogStore. The lease here
    * is a lock file under the snapshot directory standing in for that
    * external service (created atomically — that is the lock service's
    * own guarantee, not the data path's); the manifest write itself is
    * a check-exists + plain clobber-capable copy, exactly an S3 PUT.
    * Stale leases (holder crashed between acquire and release) are
    * taken over after `leaseMs` — the same documented unsafe window a
    * wall-clock lease system has: a paused-then-resumed holder past its
    * lease could double-publish, which is why leaseMs must exceed any
    * plausible GC/IO stall.
    */
  final class LockFileProvider(leaseMs: Long = 30000L,
                               acquireTimeoutMs: Long = 120000L)
      extends CommitLockProvider {
    override val name = "lockfile"
    override def publish(path: String, target: Path, tmp: Path, v: Int): Unit = {
      val lock = target.getParent.resolve("_commit.lock")
      val deadline = System.nanoTime() + acquireTimeoutMs * 1000000L
      var held = false
      while (!held) {
        try {
          // pid + wall-clock + nanos: every lock INCARNATION has unique
          // content, so a takeover park name identifies one incarnation
          Files.write(lock,
            (s"${ProcessHandle.current().pid()} ${System.currentTimeMillis()} " +
              s"${System.nanoTime()}").getBytes(StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          held = true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            val body =
              try Some(new String(Files.readAllBytes(lock),
                StandardCharsets.UTF_8).trim)
              catch { case scala.util.control.NonFatal(_) => None }
            val stale = body.exists { b =>
              try System.currentTimeMillis() - b.split(" ")(1).toLong > leaseMs
              catch { case scala.util.control.NonFatal(_) => false }
            }
            if (stale) {
              // Stale-lease takeover by PARKING, never in-place delete
              // (ADVICE r14 medium: judge-stale A deletes, B recreates,
              // A's leftover delete then removes B's FRESH lock — two
              // holders). Rename the stale lock to a name derived from
              // ITS OWN content: exactly one racer's rename moves the
              // file; a racer still acting on that content finds the
              // park name occupied and its move fails loudly, sending
              // it back to re-read the (now fresh) lock. Nobody ever
              // deletes a live lock it doesn't hold.
              val park = lock.resolveSibling("_commit.lock.stale." +
                java.lang.Long.toHexString(
                  java.util.Arrays.hashCode(body.get.getBytes(
                    StandardCharsets.UTF_8)).toLong & 0xffffffffL))
              try { Files.move(lock, park); () }
              catch { case scala.util.control.NonFatal(_) => Thread.sleep(5) }
            }
            else if (System.nanoTime() > deadline)
              throw new IllegalStateException(
                s"commit lease acquisition timed out after ${acquireTimeoutMs}ms: $lock")
            else Thread.sleep(5)
        }
      }
      try {
        if (Files.exists(target)) throw new ConcurrentCommitException(path, v)
        Files.copy(tmp, target) // the non-atomic PUT, exclusive via the lease
      } finally {
        Files.deleteIfExists(lock)
        // Park-file GC: a parked stale lock is load-bearing only while
        // a racer might still act on its content — past lease+timeout
        // any such racer has itself timed out (the same paused-process
        // caveat the wall-clock lease already carries). Older parks go.
        try scala.util.Using.resource(Files.list(lock.getParent)) { st =>
          st.iterator().asScala
            .filter(_.getFileName.toString.startsWith("_commit.lock.stale."))
            .filter(p => try System.currentTimeMillis() -
                Files.getLastModifiedTime(p).toMillis > leaseMs + acquireTimeoutMs
              catch { case scala.util.control.NonFatal(_) => false })
            .toVector.foreach(Files.deleteIfExists(_))
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  /** JVM-wide provider: `-Dgraft.cow.lockProvider=lockfile` selects the
    * lease path at startup (how [[graft.RaceWriter]] forks choose);
    * [[setLockProvider]] overrides in-process. Mixing providers across
    * CONCURRENT writers of one table is unsafe by construction (the
    * hard-link writer doesn't honor the lease) — pick one per table.
    */
  @volatile private var commitLockProvider: CommitLockProvider =
    sys.props.get("graft.cow.lockProvider") match {
      case Some("lockfile") => new LockFileProvider()
      case _                => HardLinkProvider
    }
  def setLockProvider(p: CommitLockProvider): Unit = commitLockProvider = p
  def lockProvider: CommitLockProvider = commitLockProvider

  /** Best-effort O(1) open hint (the `_last_checkpoint` idea): commit
    * rewrites `_snapshots/_latest` with the new version AFTER the
    * manifest link lands, so the hint is possibly STALE-LOW but never
    * points past a committed manifest. Readers probe forward from it
    * (`v+1`, `v+2`, …) until the next manifest is missing — O(1)
    * manifest reads + O(staleness) existence checks at open, instead
    * of listing a directory that grows with every commit. Manifests
    * are each self-contained (a full file list — checkpoint-per-commit
    * by construction), so no log replay exists to compact; retention
    * of the manifest LOG itself is [[expireSnapshots]].
    */
  private def latestHint(path: String): Option[Int] = {
    val f = snapDir(path).resolve("_latest")
    if (!Files.exists(f)) None
    else
      // The hint is purely advisory: ANY failure to read it (corrupt
      // content, deleted/unreadable between the exists check and the
      // read) must fall back to the directory listing, never break
      // table reads.
      try Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toInt)
      catch { case scala.util.control.NonFatal(_) => None }
  }

  private def writeLatestHint(path: String, v: Int): Unit = {
    val d = snapDir(path)
    val tmp = d.resolve(s"._latest.${System.nanoTime()}.tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, d.resolve("_latest"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def listVersions(path: String): Seq[Int] = {
    val d = snapDir(path)
    if (!Files.exists(d)) return Seq.empty
    Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .toSeq.sorted
  }

  /** True once [[create]] has committed snapshot v1. */
  def exists(path: String): Boolean = listVersions(path).nonEmpty

  /** The OLDEST version whose manifest is still on disk (snapshot
    * expiry removes old ones) — the row-capped streaming source's
    * initial-snapshot anchor. 0 for a non-existent table.
    */
  def earliestVersion(path: String): Int =
    listVersions(path).headOption.getOrElse(0)

  /** MERGE-ON-READ delete sidecars (round 10, generalized round 11): a
    * manifest line starting with this prefix names a parquet file of
    * DELETED KEYS (one or more key columns — the composite-key form
    * landed round 11; every sidecar of a table carries the SAME column
    * set) rather than a data file. A [[deleteMor]] commit adds one
    * sidecar and carries every data file over by reference — zero
    * data-file writes, the property that makes a daily GDPR delete
    * affordable at 100 TB where the copy-on-write [[delete]] would
    * rewrite every key-intersecting file. Readers apply the union of a
    * snapshot's sidecars as an anti-join ON THE SIDECAR'S OWN COLUMN
    * NAMES (never a caller-supplied key — ADVICE r10);
    * [[compact]]/[[cluster]] fold them into the data (their rewrite
    * reads the LOGICAL rows); [[merge]] un-deletes keys its batch
    * reinserts. Old manifests contain no such lines, so pre-round-10
    * tables read unchanged.
    */
  private val DeletePrefix = "D "

  /** POSITIONAL delete sidecars (round 11, the Iceberg-v2 shape): a
    * parquet file of (`__file`, `__lo`, `__hi`) rows — consecutive-run
    * RANGES of 0-based row ordinals (`_metadata.row_index`) deleted
    * from each data file. A wide predicate delete ([[deleteMorWhere]])
    * commits a sidecar bounded by file-count × run-count, NOT by the
    * deleted-row count — on a layout clustered by the predicate column
    * a 10%-of-the-table delete collapses to a handful of ranges per
    * touched file. Readers apply them per file (broadcast of the range
    * list + an `exists` filter on the row index), never a table-wide
    * anti-join.
    */
  private val PosDeletePrefix = "P "

  /** SCHEMA-EVOLUTION spec (round 11): one line per manifest carrying
    * the declared schema as `StructType.json`, with each field's
    * rename lineage (prior physical names, newest first) in its
    * metadata under `was`. Reads project every snapshot file through
    * this schema — add/rename/drop/widen never rewrite data files.
    * Manifests without the line read raw (pre-evolution behavior).
    */
  private val SchemaPrefix = "S "

  /** PARTITION-TRANSFORM spec (round 11, hidden partitioning): one
    * line carrying the table's current partition transforms (e.g.
    * day(ts), bucket(16, id)) as metadata JSON. New data writes lay
    * files out under `<transform>=<value>` directories; reads prune
    * the FILE LIST from the path segments ([[readPrunedEq]]) without
    * the query ever naming the transform column. Changing the spec is
    * a metadata commit: old files keep their layout (they simply never
    * prune), new writes use the new transform.
    */
  private val PartitionPrefix = "T "

  /** TRANSACTION watermarks (round 11, the Delta `txn` appId/version
    * shape): a line `X <appId> <version>` records the highest writer
    * version an application has committed into this table. An
    * [[append]] carrying `txn = (appId, v)` with `v <=` the recorded
    * watermark is a NO-OP — which is exactly what makes a foreachBatch
    * append sink effectively-once: a replayed micro-batch (restart
    * between sink write and checkpoint commit) re-presents the same
    * (appId, batchId) and commits nothing. One line per appId; every
    * commit carries them forward ([[specLines]]).
    */
  private val TxnPrefix = "X "

  /** COMMIT TIMESTAMP (round 15): one line per manifest carrying the
    * commit wall-clock in epoch millis, clamped monotone against the
    * base snapshot's stamp (a regressed clock can never reorder time
    * travel against version order). `TIMESTAMP AS OF` resolves through
    * [[versionAt]]; manifests that predate the line inherit the
    * previous stamped time (0 before any stamp — an old table's
    * history is "before every timestamp" rather than a guess).
    */
  private val WhenPrefix = "W "

  /** PER-FILE COLUMN STATISTICS (round 12, the Iceberg/Delta file-stats
    * contract): a line `C <dataFile>\t<json>` carrying, for each
    * declared stats column, `[min, max, nonNullCount]` over that file's
    * rows. Which columns get stats is itself a spec line
    * (`K col1,col2`, [[setStatsColumns]]) carried forward by every
    * commit; data-writing paths compute fresh `C` lines for the files
    * they add, and [[commit]] mechanically carries/retires `C` lines
    * with the data-file set — a rewrite drops the old file's stats with
    * the file, a metadata commit carries both. Reads prune on any
    * range/equality/IN predicate over a stated column
    * ([[prunedFilesRange]]/[[prunedFilesIn]]): a file is SKIPPED only
    * when its [min, max] provably excludes every matching row — a file
    * without stats (written before the declaration, or a non-stats
    * column) is always read. MoR-deleted rows leave stats
    * over-approximate (wider bounds), never wrong.
    */
  private val StatsPrefix = "C "

  /** The declared stats-column spec line: `K col1,col2` (see
    * [[StatsPrefix]]); carried forward by [[specLines]].
    */
  private val StatsColsPrefix = "K "

  /** PER-FILE ROW COUNT (round 16): a line `R <dataFile>\t<count>`,
    * recorded by every data-writing path and carried/retired
    * mechanically with the file set like `C`/`B` lines. This is what
    * lets the catalog scan answer `COUNT(*)` from the manifest alone
    * and report exact `numRows` estimates to the planner
    * (SupportsReportStatistics / SupportsPushDownAggregates) — files
    * written before the line existed simply have no entry, and every
    * consumer falls back to scanning when ANY file lacks one.
    */
  private val RowsPrefix = "R "

  /** PER-FILE KEY LOOKUP SIDECARS (round 13, VERDICT r12 task 2 — the
    * Iceberg/Delta bloom-sidecar answer to point lookups): a line
    * `B <dataFile>\t<json>` carrying, for each declared LOOKUP column,
    * either the file's exact distinct-value dictionary (NDV ≤ the
    * declared threshold) or a fixed-size bloom filter over the
    * canonical key strings. Range `C` stats prune nothing for a
    * high-cardinality equality/IN on a column the table is NOT
    * clustered by — every file's [min,max] spans the key — which is
    * exactly the shape of every keyed lookup at 100 TB (FK scans,
    * band-index probes, IVF cell reads). Declared via
    * [[setLookupColumns]] (`L` spec line); data-writing paths record
    * fresh `B` lines; [[commit]] carries/retires them mechanically
    * with the file set, like `C` lines. Consulted by
    * [[prunedFilesIn]]: a file is skipped only when NO requested key
    * can be present (dictionary miss, or all bloom probe bits clear) —
    * files without an entry always survive; a value that cannot
    * canonicalize under the column type never prunes.
    */
  private val BloomPrefix = "B "

  /** The declared lookup-column spec: `L <dictMax> <bits> col1,col2`. */
  private val LookupPrefix = "L "

  /** WRITE-SIDE Z-ORDER spec (round 18, VERDICT r17 task 7):
    * `ZO <bits> <col>:<mn>:<mx>,…` — the clustering columns and the
    * FIXED normalization bounds every subsequent INSERT interleaves
    * under. [[cluster]] normalizes with a per-rewrite data pass, which
    * a streaming-in INSERT cannot do (each batch would normalize to
    * its own bounds and the curves would not compose); storing the
    * bounds once makes the z-value a PURE function of the row, so the
    * V2 write face can expose it to `RequiresDistributionAndOrdering`
    * through the function catalog. Out-of-bounds late data clamps to
    * the curve's edge cell — pruning stays sound because file-skipping
    * reads the real per-file `C` stats, never the spec.
    */
  private val ZOrderPrefix = "ZO "

  private def isMetaLine(l: String): Boolean =
    l.startsWith(DeletePrefix) || l.startsWith(PosDeletePrefix) ||
      l.startsWith(SchemaPrefix) || l.startsWith(PartitionPrefix) ||
      l.startsWith(TxnPrefix) || l.startsWith(StatsPrefix) ||
      l.startsWith(StatsColsPrefix) || l.startsWith(BloomPrefix) ||
      l.startsWith(LookupPrefix) || l.startsWith(WhenPrefix) ||
      l.startsWith(RowsPrefix) || l.startsWith(ZOrderPrefix)

  /** Parsed view of ONE immutable snapshot manifest. The text parse
    * and the per-file JSON stat/sum parses are each done at most once
    * per cached entry — at 10⁵–10⁶ manifest entries (the 100 TB shape)
    * the O(files) text+JSON parse per PLAN was the driver-side planner
    * bottleneck (VERDICT r16 missing #3): one query plans against the
    * same snapshot through snapshotFiles, fileRowCounts, fileStats,
    * fileSums, prunedFiles* … each of which re-read and re-parsed the
    * whole manifest.
    */
  private final class SnapshotMeta(val lines: Seq[String]) {
    lazy val dataFiles: Seq[String] = lines.filterNot(isMetaLine)
    lazy val rowCounts: Map[String, Long] =
      lines.filter(_.startsWith(RowsPrefix)).flatMap { l =>
        val body = l.stripPrefix(RowsPrefix)
        val i = body.indexOf('\t')
        if (i < 0) None
        else scala.util.Try(body.substring(0, i) -> body.substring(i + 1).trim.toLong)
          .toOption
      }.toMap
    lazy val stats: Map[String, Map[String, (org.json4s.JValue, org.json4s.JValue, Long)]] =
      parsedStatLines.view.mapValues(_.flatMap {
        case (c, org.json4s.JArray(mn :: mx :: nn :: _)) =>
          statBig(nn).map(n => c -> ((mn, mx, n.toLong)))
        case _ => None
      }.toMap).toMap
    lazy val sums: Map[String, Map[String, org.json4s.JValue]] =
      parsedStatLines.view.mapValues(_.flatMap {
        case (c, org.json4s.JArray(List(_, _, _, sm))) => Some(c -> sm)
        case _ => None
      }.toMap).toMap
    /** Pre-digested per-file stats: the JSON min/max converted ONCE per
      * snapshot into the comparison domains the pruning loops use
      * (BigDecimal for numerics, raw strings for UTF-8 order) — the
      * per-plan conversion was the remaining O(files) planner cost
      * after the parse cache (mft probe: 178 ms warm at 100k files,
      * nearly all BigDecimal churn).
      */
    lazy val digests: Map[String, Map[String, StatDigest]] =
      parsedStatLines.view.mapValues(_.flatMap {
        case (c, org.json4s.JArray(mn :: mx :: nn :: _)) =>
          statBig(nn).map { n =>
            c -> StatDigest(
              statBig(mn), statBig(mx),
              mn match { case org.json4s.JString(s) => Some(s); case _ => None },
              mx match { case org.json4s.JString(s) => Some(s); case _ => None },
              n.toLong, mn == org.json4s.JNull)
          }
        case _ => None
      }.toMap).toMap
    /** Per-column CONSTANT-VALUE index: `Some(value → files)` when
      * EVERY data file is provably constant (min == max, zero nulls —
      * nn equals the R row count) or all-null in the column — the
      * identity-partitioned / perfectly clustered layout. Point-filter
      * planning (`k = X`, `k IN (…)`) then costs O(values) map hits
      * instead of an O(files) loop: at 100k manifest entries the loop
      * was ~140 ms per plan even with the parse cached (mft probe).
      * `None` = some file is mixed/unproven → callers run the exact
      * per-file loop (which may still certify via disjointness).
      * Built lazily per column, memoized with the snapshot.
      */
    def constIndexFor(c: String): Option[ConstIndex] =
      constIdxCache.computeIfAbsent(c, buildConstIndex(_))
    private val constIdxCache =
      new java.util.concurrent.ConcurrentHashMap[String, Option[ConstIndex]]()
    private def buildConstIndex(c: String): Option[ConstIndex] = {
      val byBig = scala.collection.mutable.HashMap
        .empty[BigDecimal, scala.collection.mutable.ArrayBuffer[String]]
      val byStr = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[String]]
      val it = dataFiles.iterator
      while (it.hasNext) {
        val f = it.next()
        val dOpt = digests.get(f).flatMap(_.get(c))
        val rOpt = rowCounts.get(f)
        (dOpt, rOpt) match {
          case (Some(d), Some(rows)) =>
            if (d.nn == 0L) () // all-null file: member of no value group
            else {
              val strConst = d.loS.isDefined && d.loS == d.hiS && d.nn == rows
              val bigConst = d.loB.isDefined && d.loB == d.hiB && d.nn == rows
              if (strConst)
                byStr.getOrElseUpdate(d.loS.get,
                  scala.collection.mutable.ArrayBuffer.empty) += f
              if (bigConst)
                byBig.getOrElseUpdate(d.loB.get,
                  scala.collection.mutable.ArrayBuffer.empty) += f
              if (!strConst && !bigConst) return None
            }
          case _ => return None // missing stats or row count: unprovable
        }
      }
      Some(ConstIndex(
        byBig.view.mapValues(_.toVector).toMap,
        byStr.view.mapValues(_.toVector).toMap))
    }
    /** Per-column RANGE index: when every stats-carrying file's
      * [min, max] intervals are pairwise DISJOINT in the column (the
      * range-clustered layout `cluster`/`repartitionByRange` writes),
      * the files sort by min and a range/point query binary-searches
      * the overlap window in O(log files) instead of walking all
      * stats (~88 ms at 100k files, the mft probe's honest remainder).
      * Files without stats (or NaN bounds) ride an always-keep side
      * list — conservative, never wrong; all-null files match no
      * range and drop out. `None` = overlapping intervals somewhere →
      * callers run the exact O(files) loop.
      */
    def rangeIndexFor(c: String): Option[RangeIndex] =
      rangeIdxCache.computeIfAbsent(c, buildRangeIndex(_))
    private val rangeIdxCache =
      new java.util.concurrent.ConcurrentHashMap[String, Option[RangeIndex]]()
    private def buildRangeIndex(c: String): Option[RangeIndex] = {
      val keep = Vector.newBuilder[String]
      val entries = Vector.newBuilder[(BigDecimal, BigDecimal, String)]
      val it = dataFiles.iterator
      while (it.hasNext) {
        val f = it.next()
        digests.get(f).flatMap(_.get(c)) match {
          case None => keep += f // no stats: always read
          case Some(d) if d.allNull => () // matches no range
          case Some(d) => (d.loB, d.hiB) match {
            case (Some(lo), Some(hi)) => entries += ((lo, hi, f))
            case _ => keep += f // NaN marker: always read
          }
        }
      }
      val sorted = entries.result().sortBy(e => (e._1, e._3))
      var i = 1
      while (i < sorted.length) {
        if (sorted(i - 1)._2 >= sorted(i)._1) return None // overlap
        i += 1
      }
      Some(RangeIndex(sorted, keep.result()))
    }
    lazy val lookups: Map[String, Map[String, LookupEntry]] = {
      import org.json4s._
      lines.filter(_.startsWith(BloomPrefix)).flatMap { l =>
        val body = l.stripPrefix(BloomPrefix)
        val i = body.indexOf('\t')
        if (i < 0) None
        else scala.util.Try {
          val cols = org.json4s.jackson.JsonMethods.parse(body.substring(i + 1))
            .asInstanceOf[JObject].obj.flatMap {
              case (c, JObject(fields)) =>
                val m = fields.toMap
                m.get("d") match {
                  case Some(JArray(vs)) =>
                    Some(c -> DictEntry(vs.collect { case JString(s) => s }.toSet))
                  case _ => (m.get("b"), m.get("m")) match {
                    case (Some(JString(b64)), Some(mj)) =>
                      statBig(mj).map(mm => c -> BloomEntry(
                        java.util.Base64.getDecoder.decode(b64), mm.toInt))
                    case _ => None
                  }
                }
              case _ => None
            }.toMap
          body.substring(0, i) -> cols
        }.toOption
      }.toMap
    }
    private lazy val parsedStatLines: Map[String, List[(String, org.json4s.JValue)]] =
      lines.filter(_.startsWith(StatsPrefix)).flatMap { l =>
        val body = l.stripPrefix(StatsPrefix)
        val i = body.indexOf('\t')
        if (i < 0) None
        else scala.util.Try {
          body.substring(0, i) ->
            org.json4s.jackson.JsonMethods.parse(body.substring(i + 1))
              .asInstanceOf[org.json4s.JObject].obj
        }.toOption
      }.toMap
  }

  /** (manifest file, size, mtime) → parsed snapshot, small LRU. A
    * committed manifest is immutable (published by exclusive hard
    * link), so the key is sound; size+mtime guard the two mutation
    * edges that do exist — snapshot EXPIRY (file vanishes → the loud
    * "never committed, or expired" error must still fire, hence the
    * existence probe per hit) and out-of-band test/tooling edits.
    */
  private val metaCache =
    new java.util.LinkedHashMap[(String, Long, Long), SnapshotMeta](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), SnapshotMeta]): Boolean =
        size() > 48
    }

  private def snapshotMeta(path: String, asOf: Option[Int]): SnapshotMeta = {
    val v = asOf.getOrElse(currentVersion(path))
    val mf = snapDir(path).resolve(s"v$v.json")
    require(Files.exists(mf),
      s"version $v has no manifest under $path (never committed, or expired)")
    val attrs = Files.readAttributes(mf, classOf[java.nio.file.attribute.BasicFileAttributes])
    val key = (mf.toAbsolutePath.normalize.toString,
      attrs.size(), attrs.lastModifiedTime().toMillis)
    metaCache.synchronized(Option(metaCache.get(key))) match {
      case Some(m) => m
      case None =>
        val m = new SnapshotMeta(
          new String(Files.readAllBytes(mf), StandardCharsets.UTF_8)
            .split("\n").filter(_.nonEmpty).toSeq)
        metaCache.synchronized(metaCache.put(key, m))
        m
    }
  }

  private def manifestLines(path: String, asOf: Option[Int]): Seq[String] =
    snapshotMeta(path, asOf).lines

  /** DATA files constituting `asOf` (default: latest snapshot) —
    * sidecar/spec lines excluded. Reads the requested manifest
    * directly — never lists the snapshot directory, so open cost is
    * independent of the table's commit count.
    */
  def snapshotFiles(path: String, asOf: Option[Int] = None): Seq[String] =
    snapshotMeta(path, asOf).dataFiles

  /** The snapshot's merge-on-read key-delete sidecar files (often empty). */
  def snapshotDeletes(path: String, asOf: Option[Int] = None): Seq[String] =
    manifestLines(path, asOf).filter(_.startsWith(DeletePrefix))
      .map(_.stripPrefix(DeletePrefix))

  /** Per-file footer row counts, memoized forever: a committed sidecar
    * parquet is content-immutable (written once under a fresh name,
    * published by the manifest commit), so the path is a sound cache
    * key for the life of the JVM. Bounded LRU mirrors [[metaCache]].
    */
  private val sidecarCountCache =
    new java.util.LinkedHashMap[String, java.lang.Long](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
        size() > 1024
    }

  /** Total ROW count of sidecar parquet files from their footers alone
    * (pre-distinct — routing signal, not a semantic count): one footer
    * read per file on first sight, memoized after — the operator-
    * optimization batches run this rule to fixed point, so without the
    * cache every plan of a MoR-dirty table re-opens every footer per
    * batch iteration. Used by the MoR anti-join rule to decide
    * reader-set vs join formulation.
    */
  private[graft] def sidecarRowCount(sidecars: Seq[String]): Long =
    sidecars.map { f =>
      sidecarCountCache.synchronized(Option(sidecarCountCache.get(f))) match {
        case Some(n) => n.longValue()
        case None =>
          val n = scala.util.Using.resource(
            org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                new org.apache.hadoop.fs.Path(f),
                new org.apache.hadoop.conf.Configuration())))(_.getRecordCount)
          sidecarCountCache.synchronized(
            sidecarCountCache.put(f, java.lang.Long.valueOf(n)))
          n
      }
    }.sum

  /** The snapshot's positional-delete sidecar files (often empty). */
  def snapshotPositionDeletes(path: String, asOf: Option[Int] = None): Seq[String] =
    manifestLines(path, asOf).filter(_.startsWith(PosDeletePrefix))
      .map(_.stripPrefix(PosDeletePrefix))

  /** The snapshot's declared schema, if it has evolved ([[addColumn]] /
    * [[renameColumn]] / [[dropColumn]] / [[widenColumn]]). Field
    * metadata key `was` holds the column's prior physical names.
    */
  def declaredSchema(path: String, asOf: Option[Int] = None): Option[types.StructType] =
    manifestLines(path, asOf).find(_.startsWith(SchemaPrefix))
      .map(l => types.DataType.fromJson(l.stripPrefix(SchemaPrefix))
        .asInstanceOf[types.StructType])

  /** The snapshot's partition-transform spec ([[setPartitionSpec]]). */
  def partitionSpec(path: String, asOf: Option[Int] = None): Seq[PartitionTransform] =
    manifestLines(path, asOf).find(_.startsWith(PartitionPrefix))
      .map(l => PartitionTransform.decode(l.stripPrefix(PartitionPrefix)))
      .getOrElse(Seq.empty)

  /** The semantics version of the snapshot's partition-spec line
    * ([[PartitionTransform.SpecV]] when no spec is declared — nothing
    * to distrust).
    */
  def partitionSpecVersion(path: String, asOf: Option[Int] = None): Long =
    manifestLines(path, asOf).find(_.startsWith(PartitionPrefix))
      .map(l => PartitionTransform.decodeVersion(l.stripPrefix(PartitionPrefix)))
      .getOrElse(PartitionTransform.SpecV)

  /** Spec lines (schema + partition + transaction watermarks) that
    * every data/sidecar commit carries forward unchanged.
    */
  private def specLines(path: String, base: Int): Seq[String] =
    manifestLines(path, Some(base)).filter(l =>
      l.startsWith(SchemaPrefix) || l.startsWith(PartitionPrefix) ||
        l.startsWith(TxnPrefix) || l.startsWith(StatsColsPrefix) ||
        l.startsWith(LookupPrefix) || l.startsWith(ZOrderPrefix))

  /** The highest committed writer version for `appId` (−1 if this
    * application never committed) — the [[append]] `txn` watermark.
    */
  def txnVersion(path: String, appId: String,
                 asOf: Option[Int] = None): Long =
    manifestLines(path, asOf).collect {
      case l if l.startsWith(TxnPrefix + appId + " ") =>
        l.stripPrefix(TxnPrefix + appId + " ").trim.toLong
    }.foldLeft(-1L)(math.max)

  /** Current version via the [[latestHint]] + forward probe — O(1) in
    * the commit count. Falls back to a directory listing only for
    * pre-hint tables (or a corrupt hint).
    */
  def currentVersion(path: String): Int =
    latestHint(path) match {
      case Some(h) if Files.exists(snapDir(path).resolve(s"v$h.json")) =>
        var v = h
        while (Files.exists(snapDir(path).resolve(s"v${v + 1}.json"))) v += 1
        v
      case _ =>
        val vs = listVersions(path)
        require(vs.nonEmpty, s"no snapshots under $path")
        vs.max
    }

  /** OPTIMISTIC-CONCURRENCY commit: the manifest for version
    * `base + 1` is published via an exclusive hard link — link(2) is
    * atomic and fails with EEXIST if any other writer committed that
    * version first. A writer whose rewrite was computed against
    * snapshot `base` therefore either installs `base + 1` or fails
    * cleanly with [[ConcurrentCommitException]]; it can never clobber
    * a concurrent commit (the old ATOMIC_MOVE rename silently replaced
    * an existing target). Readers still only ever see fully-written
    * manifests: content lands in the tmp file before the link exists.
    */
  private def commit(path: String, files: Seq[String], base: Int): Int = {
    val d = snapDir(path)
    Files.createDirectories(d)
    val v = base + 1
    // Per-file stats maintenance is MECHANICAL so no committer can get
    // it wrong: carry the base snapshot's C lines for every data file
    // still referenced (metadata commits, carried-over files), keep
    // incoming C lines for fresh files (they win on a duplicate), and
    // retire C lines whose file left the manifest (rewrites, compaction).
    val dataSet = files.filterNot(isMetaLine).toSet
    // carry/retire per-file sidecar lines (C stats, B lookup filters)
    // mechanically with the data-file set: incoming lines win for
    // fresh files, the base snapshot's carry for surviving files,
    // departed files drop theirs
    def carried(prefix: String): Seq[String] = {
      val fromBase =
        if (base > 0 && Files.exists(d.resolve(s"v$base.json")))
          manifestLines(path, Some(base)).filter(_.startsWith(prefix))
        else Seq.empty
      val fileOf = (l: String) => l.stripPrefix(prefix).takeWhile(_ != '\t')
      (files.filter(_.startsWith(prefix)) ++ fromBase)
        .distinctBy(fileOf).filter(l => dataSet.contains(fileOf(l)))
    }
    // B lines exist only in service of an L spec: a committed line set
    // with NO spec (setLookupColumns' retire path) must not have the
    // base snapshot's B lines mechanically re-added, or cow_lookups
    // reports retired sidecars forever (pruning stayed sound — the
    // entries were accurate — but the retire was a no-op).
    val hasLookupSpec = files.exists(_.startsWith(LookupPrefix))
    // commit timestamp, monotone vs the base (never carried — each
    // manifest stamps its own commit instant)
    val prevStamp =
      if (base > 0 && Files.exists(d.resolve(s"v$base.json")))
        manifestLines(path, Some(base)).find(_.startsWith(WhenPrefix))
          .map(_.stripPrefix(WhenPrefix).trim.toLong).getOrElse(0L)
      else 0L
    val stamp = math.max(System.currentTimeMillis(), prevStamp + 1)
    val lines = files.filterNot(l =>
      l.startsWith(StatsPrefix) || l.startsWith(BloomPrefix) ||
        l.startsWith(WhenPrefix) || l.startsWith(RowsPrefix)) ++
      carried(StatsPrefix) ++
      carried(RowsPrefix) ++
      (if (hasLookupSpec) carried(BloomPrefix) else Seq.empty) ++
      Seq(WhenPrefix + stamp)
    val tmp = d.resolve(s".v$v.${System.nanoTime()}.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    // publication goes through the pluggable lock seam: hard link on
    // POSIX/HDFS-class stores, external-lease + plain PUT on S3-class
    try commitLockProvider.publish(path, d.resolve(s"v$v.json"), tmp, v)
    finally Files.deleteIfExists(tmp)
    // After the link: a crash here leaves the hint stale-low, which the
    // forward probe absorbs; a slow writer overwriting a newer hint is
    // absorbed the same way. Best-effort — an IO failure writing the
    // hint must NOT fail a commit whose manifest already landed (the
    // caller would retry and hit ConcurrentCommitException against its
    // own version).
    try writeLatestHint(path, v)
    catch { case scala.util.control.NonFatal(_) => () }
    v
  }

  /** Write `df` into `dir` as new immutable data files; returns them.
    * With a partition spec (data writes on a [[setPartitionSpec]]
    * table), rows land under `<transform>=<value>` subdirectories —
    * the hidden-partitioning layout [[readPrunedEq]] prunes on. The
    * synthetic transform columns live ONLY in the directory names
    * (partitionBy drops them from file content), so reads see the
    * original schema. Sidecar writes always pass an empty spec.
    */
  private def writeData(df: DataFrame, path: String,
                        spec: Seq[PartitionTransform] = Seq.empty): Seq[String] = {
    val stamp = s"${System.nanoTime()}"
    val dir = Paths.get(path, "data", stamp)
    if (spec.isEmpty) df.write.mode(SaveMode.ErrorIfExists).parquet(dir.toString)
    else spec.foldLeft(df)((d, t) =>
      d.withColumn(t.name, t.exprOf(col(t.src), df.schema(t.src).dataType)))
      .write.partitionBy(spec.map(_.name): _*)
      .mode(SaveMode.ErrorIfExists).parquet(dir.toString)
    Files.walk(dir).iterator().asScala.map(_.toString)
      .filter(f => f.endsWith(".parquet") && !f.contains("_SUCCESS")).toSeq
  }

  /** [[writeData]] plus fresh `C` stats lines for the written files
    * when the table declares stats columns ([[setStatsColumns]]) — the
    * call every DATA-writing path uses; sidecar writes keep plain
    * [[writeData]] (stats on delete-key/range files are meaningless).
    */
  private def writeDataWithStats(df: DataFrame, path: String,
                                 spec: Seq[PartitionTransform] = Seq.empty): Seq[String] = {
    val files = writeData(df, path, spec)
    files ++ statsLinesFor(df.sparkSession, path, files, statsColumns(path)) ++
      rowLinesFor(df.sparkSession, files) ++
      lookupSpec(path).toSeq.flatMap(s =>
        bloomLinesFor(df.sparkSession, path, files, s))
  }

  /** Create the table: data files + manifest v1. With `transforms`,
    * v1 is laid out under the hidden-partitioning spec and the spec is
    * recorded in the manifest ([[setPartitionSpec]] to evolve it
    * later).
    */
  def create(df: DataFrame, path: String,
             transforms: Seq[PartitionTransform] = Seq.empty): Int = {
    val spec =
      if (transforms.isEmpty) Seq.empty
      else Seq(PartitionPrefix + PartitionTransform.encode(transforms))
    val files = writeData(df, path, transforms)
    commit(path, files ++ rowLinesFor(df.sparkSession, files) ++ spec,
      base = (listVersions(path) :+ 0).max)
  }

  /** METADATA TABLE: one row per file a snapshot references — the
    * Iceberg `files` table shape. `kind` ∈ data / delete_keys /
    * position_deletes; `size_bytes` from the filesystem (−1 for a
    * vanished file — a vacuumed-under-time-travel read should surface
    * that, not hide it). Built from ONE manifest read — cost is
    * independent of table size and commit count.
    */
  def filesMeta(spark: SparkSession, path: String,
                asOf: Option[Int] = None): DataFrame = {
    import spark.implicits._
    filesTuples(path, asOf).toDF("file", "kind", "size_bytes")
  }

  /** [[filesMeta]]'s raw rows — shared with the catalog's `t$files`
    * metadata-table face. `row_count` consumers use [[fileRowCounts]].
    */
  private[sinks] def filesTuples(path: String, asOf: Option[Int])
      : Seq[(String, String, Long)] = {
    val v = asOf.getOrElse(currentVersion(path))
    manifestLines(path, Some(v)).flatMap { l =>
      val (kind, f) =
        if (l.startsWith(DeletePrefix)) ("delete_keys", l.stripPrefix(DeletePrefix))
        else if (l.startsWith(PosDeletePrefix)) ("position_deletes", l.stripPrefix(PosDeletePrefix))
        else if (isMetaLine(l)) (null, null)
        else ("data", l)
      Option(kind).map { k =>
        val p = Paths.get(f)
        (f, k, if (Files.exists(p)) Files.size(p) else -1L)
      }
    }
  }

  /** METADATA TABLE: one row per RETAINED snapshot (expired versions
    * drop out) — the Iceberg `history`/`snapshots` shape: per-version
    * data-file and sidecar counts plus whether the manifest declares a
    * schema / partition spec. Manifest reads only.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    historyTuples(path).toDF("version", "n_data_files", "n_delete_sidecars",
      "n_pos_sidecars", "has_schema", "has_partition_spec",
      "commit_time_ms")
  }

  /** [[history]]'s raw rows — shared with the catalog's `t$history`
    * metadata-table face, which builds InternalRows without a session.
    */
  private[sinks] def historyTuples(path: String)
      : Seq[(Long, Long, Long, Long, Boolean, Boolean, Long)] =
    listVersions(path).sorted.map { v =>
      val ls = manifestLines(path, Some(v))
      (v.toLong, ls.count(l => !isMetaLine(l)).toLong,
       ls.count(_.startsWith(DeletePrefix)).toLong,
       ls.count(_.startsWith(PosDeletePrefix)).toLong,
       ls.exists(_.startsWith(SchemaPrefix)),
       ls.exists(_.startsWith(PartitionPrefix)),
       commitTimeMs(path, v).getOrElse(0L))
    }

  /** The commit wall-clock (epoch millis) stamped on `v`'s manifest;
    * None on manifests that predate the stamp line.
    */
  def commitTimeMs(path: String, v: Int): Option[Long] =
    manifestLines(path, Some(v)).find(_.startsWith(WhenPrefix))
      .map(_.stripPrefix(WhenPrefix).trim.toLong)

  /** `TIMESTAMP AS OF` resolution: the snapshot a reader at wall-clock
    * `tsMillis` would have seen — the greatest version whose commit
    * stamp is ≤ `tsMillis`. Versions without a stamp inherit the
    * previous stamped time (0 before any — a pre-feature history sits
    * "before every timestamp", never guessed). Loud when the timestamp
    * precedes the first surviving commit.
    */
  def versionAt(path: String, tsMillis: Long): Int = {
    val vs = listVersions(path).sorted
    require(vs.nonEmpty, s"no snapshots under $path")
    var last = 0L
    var ans = -1
    for (v <- vs) {
      last = commitTimeMs(path, v).getOrElse(last)
      if (last <= tsMillis) ans = v
    }
    require(ans > 0,
      s"TIMESTAMP AS OF $tsMillis precedes the first surviving commit of " +
        s"$path (earliest stamp: ${commitTimeMs(path, vs.head).getOrElse(0L)})")
    ans
  }

  /** INSERT-ONLY APPEND with manifest-level REBASE (round 11) — the
    * concurrent-writer fast path. Data files are written exactly ONCE;
    * losing the commit race costs only a manifest recompute against
    * the new snapshot (base lines + the already-written files), never
    * a data rewrite — which is what makes N concurrent ingest writers
    * affordable on a 100 TB table (an append conflicts with NOTHING:
    * it reads no existing file and replaces no existing line, the
    * Iceberg fast-append). Contrast [[withCommitRetry]], which re-runs
    * the whole operation for read-modify-write commits.
    *
    * Semantics under concurrency: appends serialize in commit order;
    * rows land with the layout of the partition spec read at WRITE
    * time (a concurrently-evolved spec leaves these files in the old
    * layout — exactly the mixed-layout state partition evolution
    * already tolerates). A key present in a MoR delete sidecar stays
    * deleted even if appended here — sidecars are table-wide by
    * contract; reviving a key is [[merge]]'s job.
    *
    * `txn = Some((appId, version))` makes the append IDEMPOTENT per
    * application (the Delta `txn` action): if the table's
    * [[txnVersion]] watermark for `appId` is already `>= version`, the
    * call is a no-op — the foreachBatch replay contract
    * ([[Sinks.appendStream]]). The watermark line replaces the app's
    * previous one and every other commit carries it forward.
    */
  def append(spark: SparkSession, path: String, df: DataFrame,
             maxRetries: Int = 5,
             txn: Option[(String, Long)] = None): Int = {
    txn.foreach { case (app, _) =>
      require(!app.exists(_.isWhitespace), s"txn appId must not contain whitespace: '$app'")
    }
    // Idempotence gate BEFORE paying the data write: a replayed
    // (appId, version) at or below the table's watermark already
    // committed fully — its files are in the manifest; re-appending
    // would duplicate rows.
    def replayed: Boolean = txn.exists { case (app, v) =>
      txnVersion(path, app) >= v
    }
    if (replayed) return currentVersion(path)
    val fresh = writeDataWithStats(df, path, partitionSpec(path))
    var attempts = 0
    while (true) {
      val base = currentVersion(path)
      if (replayed) return base // another writer of the SAME app won the race
      val kept = txn.fold(manifestLines(path, Some(base))) { case (app, _) =>
        manifestLines(path, Some(base))
          .filterNot(_.startsWith(TxnPrefix + app + " "))
      }
      val mark = txn.map { case (app, v) => s"$TxnPrefix$app $v" }.toSeq
      try return commit(path, kept ++ fresh ++ mark, base)
      catch {
        case e: ConcurrentCommitException =>
          attempts += 1
          if (attempts > maxRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Commit data files the V2 batch writer ([[graft.sinks.CowBatchWrite]])
    * already wrote: fresh C/R/B sidecar lines are computed for them
    * (same helpers as every Scala write path), then the manifest
    * commits with [[append]]'s rebase semantics — losing a race costs
    * a manifest recompute, never a data rewrite — or, for INSERT
    * OVERWRITE, with [[overwrite]]'s replace-everything-carry-spec
    * semantics under the optimistic retry. An empty append (zero rows
    * wrote zero files) is a no-op, not an empty commit.
    */
  private[graft] def commitWrittenFiles(spark: SparkSession, path: String,
                                        files: Seq[String],
                                        overwrite: Boolean,
                                        txn: Option[(String, Long)] = None): Int = {
    // exactly-once for the STREAMING write face: a replayed epoch
    // (appId watermark already at/past this version) must not re-land
    // its rows — its files are orphans, reclaimed here immediately
    // (expireSnapshots would get them anyway)
    def replayed: Boolean = txn.exists { case (app, v) =>
      txnVersion(path, app) >= v
    }
    if (replayed) {
      files.foreach(f => scala.util.Try(
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f))))
      return currentVersion(path)
    }
    if (files.isEmpty && !overwrite && txn.isEmpty) return currentVersion(path)
    val mark = txn.map { case (app, v) => s"$TxnPrefix$app $v" }.toSeq
    val fresh = files ++
      statsLinesFor(spark, path, files, statsColumns(path)) ++
      rowLinesFor(spark, files) ++
      lookupSpec(path).toSeq.flatMap(s => bloomLinesFor(spark, path, files, s)) ++
      mark
    if (overwrite) withCommitRetry() {
      val base = currentVersion(path)
      val spec = specLines(path, base).filterNot(l =>
        txn.exists { case (app, _) => l.startsWith(TxnPrefix + app + " ") })
      commit(path, fresh ++ spec, base)
    } else {
      var attempts = 0
      while (true) {
        val base = currentVersion(path)
        if (replayed) return base // a same-app racer won
        val kept = txn.fold(manifestLines(path, Some(base))) { case (app, _) =>
          manifestLines(path, Some(base))
            .filterNot(_.startsWith(TxnPrefix + app + " "))
        }
        try return commit(path, kept ++ fresh, base)
        catch {
          case e: ConcurrentCommitException =>
            attempts += 1
            if (attempts > 5) throw e
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Per-spec partition-value tuple of a data file, parsed from its
    * `name=value` path segments — None when any current transform's
    * segment is missing (an old-layout file written before the spec).
    * Values stay in their ESCAPED directory form: every comparand came
    * through the same writer escaping, so raw segment strings compare
    * exactly.
    */
  private def partTupleOf(names: Seq[String], f: String): Option[Seq[String]] = {
    val m = f.split('/').iterator.flatMap { s =>
      val i = s.indexOf('=')
      if (i > 0) Some(s.take(i) -> s.drop(i + 1)) else None
    }.toMap
    val vals = names.map(m.get)
    if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None
  }

  /** Shared guards for partition-replacing commits: replacing "a
    * partition" is only sound when membership is decidable from file
    * PATHS alone, so (a) key-delete sidecars must be folded first (a
    * carried global key tombstone would hide same-keyed FRESH rows;
    * dropping it would resurrect rows in untouched partitions), and
    * (b) every live data file must carry the segments being matched
    * (an old-layout file may contain replaced-partition rows — keeping
    * it duplicates, dropping it loses other partitions' data).
    */
  private def requireReplaceSafe(path: String, base: Int, op: String,
                                 blind: Seq[String]): Unit = {
    require(snapshotDeletes(path, Some(base)).isEmpty,
      s"$op is ambiguous while merge-on-read key-delete sidecars are live " +
        s"on $path — compact the table to fold them first")
    require(blind.isEmpty,
      s"$op needs every live data file under the current partition layout; " +
        s"${blind.size} predate it (e.g. ${blind.take(3).mkString(", ")}) — " +
        "rewrite first: CowTable.cluster/compact")
  }

  /** Commit V2-written files with DYNAMIC partition-overwrite semantics
    * (`INSERT OVERWRITE` under partitionOverwriteMode=dynamic, via
    * [[graft.sinks.CowBatchWrite]]): base data files whose partition-
    * value tuple appears among the FRESH files' tuples are replaced;
    * every other partition's files carry over untouched — the fresh
    * files' directory segments themselves declare what is replaced, no
    * data pass needed. Zero rows written ⇒ zero partitions replaced ⇒
    * the table is unchanged (Hive/Spark dynamic semantics, NOT a
    * truncate). An unpartitioned table degrades to a full overwrite.
    * Positional-delete sidecars carry (entries for dropped files go
    * inert with their file; entries for kept files stay live); C/R/B
    * lines retire mechanically with the dropped files in [[commit]].
    */
  private[graft] def commitWrittenFilesDynamic(spark: SparkSession, path: String,
                                               files: Seq[String]): Int = {
    if (files.isEmpty) return currentVersion(path)
    // fresh-file sidecar lines are base-independent: compute once, not
    // per optimistic-retry round
    val freshMeta = statsLinesFor(spark, path, files, statsColumns(path)) ++
      rowLinesFor(spark, files) ++
      lookupSpec(path).toSeq.flatMap(s => bloomLinesFor(spark, path, files, s))
    withCommitRetry() {
      val base = currentVersion(path)
      val spec = partitionSpec(path, Some(base))
      if (spec.isEmpty)
        commit(path, files ++ freshMeta ++ specLines(path, base), base)
      else {
        val names = spec.map(_.name)
        val freshTuples = files.flatMap(partTupleOf(names, _)).toSet
        require(freshTuples.nonEmpty && files.forall(partTupleOf(names, _).isDefined),
          s"dynamic overwrite wrote files without the current partition segments " +
            s"under $path — writer/spec mismatch")
        val baseFiles = snapshotFiles(path, Some(base))
        requireReplaceSafe(path, base, "dynamic partition overwrite",
          baseFiles.filter(partTupleOf(names, _).isEmpty))
        val kept = baseFiles.filter(f => !freshTuples.contains(partTupleOf(names, f).get))
        commit(path, kept ++ files ++ freshMeta ++
          snapshotPositionDeletes(path, Some(base)).map(PosDeletePrefix + _) ++
          specLines(path, base), base)
      }
    }
  }

  /** True iff `src` is a partition-spec source whose equality filter
    * can soundly select whole files by directory segment — identity or
    * bucket/truncate always; time transforms only at spec semantics
    * ≥ v2 (older directories may be session-zone-dependent, the
    * [[prunedFilesEq]] hazard, which for an overwrite-DROP would lose
    * or duplicate rows rather than merely under-prune).
    */
  private[graft] def canOverwriteByEquality(path: String, src: String): Boolean =
    partitionSpec(path, None).exists(t => t.src == src &&
      (!Set("day", "month", "year").contains(t.kind) ||
        partitionSpecVersion(path, None) >= PartitionTransform.SpecV))

  /** Commit V2-written files with STATIC filter-overwrite semantics
    * (`INSERT OVERWRITE … PARTITION (col=v, …)`): base data files whose
    * directory segment for EVERY filtered transform equals the
    * transform of the literal are replaced; everything else carries
    * over. The literal→segment evaluation is [[prunedFilesEq]]'s own
    * (cast to the source type, same transform expression, same
    * escaping), so the dropped set is exactly the file set a read of
    * that partition would serve.
    */
  private[graft] def commitWrittenFilesFiltered(spark: SparkSession, path: String,
                                                files: Seq[String],
                                                eqs: Seq[(String, Any)]): Int = {
    require(eqs.nonEmpty, "filtered overwrite needs at least one equality")
    val freshMeta = statsLinesFor(spark, path, files, statsColumns(path)) ++
      rowLinesFor(spark, files) ++
      lookupSpec(path).toSeq.flatMap(s => bloomLinesFor(spark, path, files, s))
    withCommitRetry() {
      val base = currentVersion(path)
      val spec = partitionSpec(path, Some(base))
      val segs = eqs.map { case (src, value) =>
        val t = spec.find(_.src == src).getOrElse(throw new UnsupportedOperationException(
          s"INSERT OVERWRITE filter on '$src' which is not a partition source of $path"))
        require(canOverwriteByEquality(path, src),
          s"'$src' carries a pre-v2 time-transform spec — directories may be " +
            "session-zone-dependent; rewrite the table first")
        val srcType: types.DataType =
          declaredSchema(path, Some(base))
            .flatMap(_.fields.find(_.name == src).map(_.dataType))
            .orElse(files.headOption.flatMap(f =>
              scala.util.Try(spark.read.parquet(f).schema).toOption
                .flatMap(_.fields.find(_.name == src).map(_.dataType))))
            .getOrElse(spark.range(1).select(lit(value)).schema.head.dataType)
        val v = Option(value).map(_ =>
          spark.range(1).select(t.exprOf(lit(value), srcType).cast("string"))
            .head.getString(0))
        val dirVal = v match {
          case Some(s) if s != null =>
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(s)
          case _ => "__HIVE_DEFAULT_PARTITION__"
        }
        (s"/${t.name}=$dirVal/", s"/${t.name}=")
      }
      val baseFiles = snapshotFiles(path, Some(base))
      requireReplaceSafe(path, base, "static partition overwrite",
        baseFiles.filter(f => segs.exists { case (_, marker) => !f.contains(marker) }))
      val kept = baseFiles.filterNot(f => segs.forall { case (seg, _) => f.contains(seg) })
      commit(path, kept ++ files ++ freshMeta ++
        snapshotPositionDeletes(path, Some(base)).map(PosDeletePrefix + _) ++
        specLines(path, base), base)
    }
  }

  /** Publish a STAGED table (atomic CTAS / RTAS — see
    * [[CowCatalog.stageCreate]]) into `realPath`: the staged table's
    * data files hard-link into the real table's `data/` tree with
    * their partition-directory segments PRESERVED (the pruners parse
    * `p_x=v` path segments), every manifest line referencing them
    * rewrites to the new location, the staged S/T spec lines carry
    * (they ARE the new table definition), and the result commits as
    * ONE version — v1 for a create, or the next version of an existing
    * table for a replace (prior versions stay time-travelable; the
    * non-staged drop-and-recreate fallback destroyed history). The
    * real table's txn watermarks carry on replace (idempotent writers
    * stay guarded); the staged table's own watermarks do not (its
    * writer identity dies with the staging directory).
    */
  private[sinks] def publishStaged(spark: SparkSession, stagedPath: String,
                                   realPath: String): Int = {
    val stagedData = Paths.get(stagedPath, "data")
    val destRoot = Paths.get(realPath, "data", s"staged${System.nanoTime()}")
    val lines = manifestLines(stagedPath, None)
    val linked = scala.collection.mutable.Map.empty[String, String]
    def relocate(f: String): String = linked.getOrElseUpdate(f, {
      val p = Paths.get(f)
      val target =
        if (p.startsWith(stagedData)) destRoot.resolve(stagedData.relativize(p))
        else destRoot.resolve(p.getFileName)
      Files.createDirectories(target.getParent)
      Files.createLink(target, p)
      target.toString
    })
    val rewritten = lines.flatMap { line =>
      if (line.startsWith(WhenPrefix) || line.startsWith(TxnPrefix)) None
      else if (line.startsWith(SchemaPrefix) || line.startsWith(PartitionPrefix) ||
               line.startsWith(StatsColsPrefix) || line.startsWith(LookupPrefix))
        Some(line)
      else {
        val prefix = Seq(DeletePrefix, PosDeletePrefix, StatsPrefix,
          BloomPrefix, RowsPrefix).find(line.startsWith).getOrElse("")
        val rest = line.stripPrefix(prefix)
        val tab = rest.indexOf('\t')
        val (f, payload) =
          if (tab >= 0) (rest.substring(0, tab), rest.substring(tab))
          else (rest, "")
        Some(prefix + relocate(f) + payload)
      }
    }
    val v =
      if (exists(realPath)) withCommitRetry() {
        val base = currentVersion(realPath)
        val xLines = manifestLines(realPath, Some(base)).filter(_.startsWith(TxnPrefix))
        commit(realPath, rewritten ++ xLines, base)
      } else commit(realPath, rewritten, base = 0)
    CowCatalog.deleteTree(Paths.get(stagedPath))
    v
  }

  /** OPTIMISTIC RETRY for read-modify-write commits ([[merge]],
    * [[deleteMorKeys]], [[deleteMorWhere]], [[compact]], ...): re-runs
    * `op` until it commits or `maxRetries` conflicts. `op` MUST
    * re-read the current snapshot on each run (every CowTable
    * operation does — they open with `currentVersion`), so each retry
    * recomputes against the winner's snapshot and the result is
    * SERIALIZABLE: equivalent to the losers running strictly after the
    * winners. Full recompute is deliberately the only conflict policy
    * — cheaper rebases (e.g. disjoint-file detection) trade
    * correctness edge cases for speed the local scale cannot justify;
    * the insert-only case that CAN skip recompute safely has its own
    * fast path ([[append]]). A lost attempt's data files are orphans,
    * reclaimed by [[expireSnapshots]]'s vacuum like any dead write.
    */
  /** CREATE a zero-row table from a SCHEMA (the SQL `CREATE TABLE`
    * shape): no data files — the schema rides the manifest's `S` line
    * (exactly what schema evolution writes), so reads return an empty
    * frame of the declared shape and the first append materializes
    * files under the declared partition spec.
    */
  def createEmpty(path: String, schema: types.StructType,
                  transforms: Seq[PartitionTransform] = Seq.empty): Int = {
    require(!exists(path), s"table already exists at $path")
    val spec =
      if (transforms.isEmpty) Seq.empty
      else Seq(PartitionPrefix + PartitionTransform.encode(transforms))
    commit(path, (SchemaPrefix + schema.json) +: spec,
      base = (listVersions(path) :+ 0).max)
  }

  /** REPLACE the table's contents with `df` in one commit (the INSERT
    * OVERWRITE shape): fresh data files under the current partition
    * spec, every prior data file and delete sidecar dropped from the
    * manifest, schema/partition/txn spec lines carried. Time travel to
    * pre-overwrite snapshots stays exact (their manifests still
    * reference the old files until [[expireSnapshots]]).
    */
  def overwrite(spark: SparkSession, path: String, df: DataFrame): Int =
    withCommitRetry() {
      val base = currentVersion(path)
      commit(path,
        writeDataWithStats(df, path, partitionSpec(path, Some(base))) ++
          specLines(path, base), base)
    }

  def withCommitRetry(maxRetries: Int = 5)(op: => Int): Int = {
    var attempts = 0
    while (true) {
      try return op
      catch {
        case e: ConcurrentCommitException =>
          attempts += 1
          if (attempts > maxRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** PARTITION EVOLUTION (hidden partitioning): record a new partition
    * transform spec as a METADATA-ONLY commit. Existing files keep
    * their layout — they are never rewritten, they simply don't prune
    * under the new spec; every subsequent data write (merge rewrites
    * and inserts, compact, cluster, delete survivors) lays out under
    * the new transforms. Queries never name the transform column:
    * [[readPrunedEq]] derives the matching directories from the SOURCE
    * column predicate, which is what makes the layout changeable
    * without breaking a single reader — the Iceberg partition-evolution
    * contract.
    */
  def setPartitionSpec(path: String, transforms: Seq[PartitionTransform]): Int = {
    val base = currentVersion(path)
    val kept = manifestLines(path, Some(base)).filterNot(_.startsWith(PartitionPrefix))
    val spec =
      if (transforms.isEmpty) Seq.empty
      else Seq(PartitionPrefix + PartitionTransform.encode(transforms))
    commit(path, kept ++ spec, base)
  }

  /** Hidden-partition-PRUNED equality read: keep only the files whose
    * transform directory matches `src = value` — plus every file
    * written under an OLDER spec (no matching directory segment:
    * over-approximate, never wrong). The residual filter still
    * applies, so pruning is purely an IO optimization; correctness
    * never depends on the layout. Sidecars and the declared schema
    * apply as in [[read]].
    */
  def readPrunedEq(spark: SparkSession, path: String, src: String, value: Any,
                   asOf: Option[Int] = None): DataFrame =
    readFiles(spark, path, prunedFilesEq(spark, path, src, value, asOf),
      asOf).filter(col(src) <=> lit(value))

  /** The pruned file list behind [[readPrunedEq]] (exposed for tests /
    * observability). Files written before the current spec carry no
    * transform segment and always survive — pruning works ACROSS a
    * partition-evolution boundary by reading old-layout files
    * unpruned.
    */
  def prunedFilesEq(spark: SparkSession, path: String, src: String, value: Any,
                    asOf: Option[Int] = None): Seq[String] = {
    val files = snapshotFiles(path, asOf)
    partitionSpec(path, asOf).find(_.src == src) match {
      case None => files
      // a PRE-VERSIONED spec line's time-transform directories may
      // have been written under a non-UTC session zone or unpadded
      // years — the new expression can compute a directory name that
      // doesn't exist and WRONGLY prune; read everything instead
      // (sound under-prune; rewrite the table to re-enable)
      case Some(t) if Set("day", "month", "year").contains(t.kind) &&
          partitionSpecVersion(path, asOf) < PartitionTransform.SpecV => files
      case Some(t) =>
        // evaluate the transform of the literal exactly as the writer
        // did (one 1-row local projection), and escape the value the
        // way Spark's partitioned writer escapes directory names —
        // a mismatch here would WRONGLY prune, not just under-prune.
        // The literal is first cast to the SOURCE column's type
        // (declared schema, else a data-file footer, else the
        // literal's own type) so cross-family literals canonicalize
        // to the writer's directory string.
        val srcType: types.DataType =
          declaredSchema(path, asOf)
            .flatMap(_.fields.find(_.name == src).map(_.dataType))
            .orElse(files.headOption.flatMap(f =>
              scala.util.Try(spark.read.parquet(f).schema).toOption
                .flatMap(_.fields.find(_.name == src).map(_.dataType))))
            .getOrElse(spark.range(1).select(lit(value)).schema.head.dataType)
        val v = spark.range(1).select(t.exprOf(lit(value), srcType).cast("string"))
          .head.getString(0)
        if (v == null) files // null never equals; residual filter decides
        else {
          val seg = s"/${t.name}=" +
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .escapePathName(v) + "/"
          val marker = s"/${t.name}="
          files.filter(f => f.contains(seg) || !f.contains(marker))
        }
    }
  }

  // ---- per-file column statistics (round 12, VERDICT r11 task 3) --------

  /** The snapshot's declared stats columns ([[setStatsColumns]]). */
  def statsColumns(path: String, asOf: Option[Int] = None): Seq[String] =
    if (!exists(path)) Seq.empty
    else manifestLines(path, asOf).find(_.startsWith(StatsColsPrefix))
      .map(_.stripPrefix(StatsColsPrefix).split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Seq.empty)

  /** DECLARE the table's stats columns and BACKFILL: per-file
    * [min, max, nonNullCount] over every current data file are
    * computed in one column-pruned scan and committed as `C` manifest
    * lines; every subsequent data write (append, merge rewrite,
    * compact, cluster, CoW-delete survivors) records stats for its
    * fresh files automatically. Empty `cols` retires the spec and all
    * recorded stats. Unsupported column types (nested, binary,
    * boolean) are silently skipped — their files simply never prune.
    */
  def setStatsColumns(spark: SparkSession, path: String, cols: Seq[String]): Int = {
    require(cols.forall(c => !c.contains(",") && !c.contains("\t") && !c.contains("\n")),
      s"stats column names must not contain ',', TAB or newline: $cols")
    val base = currentVersion(path)
    val kept = manifestLines(path, Some(base)).filterNot(l =>
      l.startsWith(StatsColsPrefix) || l.startsWith(StatsPrefix))
    val k = if (cols.isEmpty) Seq.empty
            else Seq(StatsColsPrefix + cols.mkString(","))
    commit(path, kept ++ k ++
      statsLinesFor(spark, path, snapshotFiles(path, Some(base)), cols), base)
  }

  /** The declared write-side z-order spec (see [[ZOrderPrefix]]). */
  def zorderSpec(path: String, asOf: Option[Int] = None): Option[ZOrderSpec] =
    manifestLines(path, asOf).find(_.startsWith(ZOrderPrefix)).map { l =>
      val body = l.stripPrefix(ZOrderPrefix)
      val sp = body.indexOf(' ')
      ZOrderSpec(body.take(sp).toInt,
        body.drop(sp + 1).split(',').toIndexedSeq.map { e =>
          val Array(c, mn, mx) = e.split(':')
          (c, mn.toDouble, mx.toDouble)
        })
    }

  /** Declare write-side Z-ORDER clustering: every subsequent INSERT
    * through the V2 face range-shuffles and sorts on the interleaved
    * z-value of `cols` under bounds FIXED here (measured from the
    * current snapshot — one min/max aggregate), so each written file
    * covers a tight range in EVERY clustering column and min/max
    * pruning fires on any of them, not just a leading sort column.
    * This is [[cluster]]'s layout as a STANDING WRITE PROPERTY instead
    * of a one-shot rewrite: cluster() re-normalizes per rewrite (a
    * data pass new inserts can't repeat), the stored bounds make the
    * z-value a pure row function the function catalog can serve to
    * `RequiresDistributionAndOrdering`. Existing files are NOT
    * rewritten (run cluster() for that); late out-of-bounds values
    * clamp to the curve's edge — their files' real `C` stats keep
    * pruning sound, just less tight. Declare the same columns via
    * [[setStatsColumns]] to record those stats.
    */
  def setZorderColumns(spark: SparkSession, path: String, cols: Seq[String]): Int = {
    require(cols.nonEmpty && cols.size <= 3, "1-3 z-order columns")
    val base = currentVersion(path)
    val df = read(spark, path, Some(base))
    cols.foreach(c => require(df.columns.contains(c), s"no column '$c' in $path"))
    require(df.take(1).nonEmpty,
      s"cannot measure z-order bounds on empty $path — pass explicit bounds")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__mn_$c"),
      max(col(c)).cast("double").as(s"__mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    setZorderBounds(spark, path,
      cols.zipWithIndex.map { case (c, i) => (c, r.getDouble(2 * i), r.getDouble(2 * i + 1)) })
  }

  /** [[setZorderColumns]] with caller-declared normalization bounds
    * (empty table, or domain knowledge tighter than the measured
    * min/max). Values outside the bounds clamp to the curve edge.
    */
  def setZorderBounds(spark: SparkSession, path: String,
                      bounds: Seq[(String, Double, Double)]): Int = {
    require(bounds.nonEmpty && bounds.size <= 3, "1-3 z-order columns")
    bounds.foreach { case (c, mn, mx) =>
      require(!c.exists(ch => ch == ',' || ch == ':' || ch.isWhitespace),
        s"z-order column names must not contain ',', ':' or whitespace: $c")
      require(mn <= mx && !mn.isNaN && !mx.isNaN, s"bad bounds for $c: [$mn, $mx]")
    }
    val bits = math.min(20, 62 / bounds.size)
    val base = currentVersion(path)
    val kept = manifestLines(path, Some(base)).filterNot(_.startsWith(ZOrderPrefix))
    commit(path, kept ++ Seq(ZOrderPrefix + s"$bits " +
      bounds.map { case (c, mn, mx) => s"$c:$mn:$mx" }.mkString(",")), base)
  }

  /** Drop the write-side z-order declaration (inserts stop shuffling). */
  def clearZorderColumns(spark: SparkSession, path: String): Int = {
    val base = currentVersion(path)
    commit(path,
      manifestLines(path, Some(base)).filterNot(_.startsWith(ZOrderPrefix)), base)
  }

  /** One row's z-value under a spec: clamped min/max normalization to
    * `bits` quantiles per column, bits interleaved (bit i of column k →
    * position i·n + k — [[cluster]]'s exact layout). Shared by the V2
    * `zorder` catalog function.
    */
  private[sinks] def zValue(bits: Int, n: Int, k: Int, mn: Double, mx: Double,
                            x: Double, isNull: Boolean, acc: Long): Long = {
    val scale = (1L << bits) - 1
    val q: Long =
      if (isNull || mx <= mn) 0L
      else {
        val t = (x - mn) / (mx - mn) * scale
        if (t.isNaN || t < 0.0) 0L else if (t > scale) scale else t.toLong
      }
    var z = acc
    var i = 0
    while (i < bits) {
      z |= ((q >> i) & 1L) << (i * n + k)
      i += 1
    }
    z
  }

  /** Atomic types stats can order portably. Strings compare as UTF-8
    * bytes (Spark's UTF8String binary order) — java.lang.String
    * ordering differs on supplementary characters, so the prune side
    * compares bytes too.
    */
  private def statsSupported(t: types.DataType): Boolean = t match {
    case types.ByteType | types.ShortType | types.IntegerType |
         types.LongType | types.FloatType | types.DoubleType |
         types.StringType | types.DateType | types.TimestampType => true
    case _: types.DecimalType => true
    case _ => false
  }

  /** Fresh `C` lines for newly written `files` — one column-pruned
    * read of just those files, grouped by `_metadata.file_path`.
    */
  private def statsLinesFor(spark: SparkSession, path: String,
                            files: Seq[String], cols: Seq[String]): Seq[String] = {
    if (cols.isEmpty || files.isEmpty) return Seq.empty
    val df = spark.read.parquet(files: _*)
    val typed = cols.filter(df.columns.contains)
      .map(c => c -> df.schema(c).dataType).filter(ct => statsSupported(ct._2))
    if (typed.isEmpty) return Seq.empty
    // 4th element (round 17): the column's exact per-file SUM, recorded
    // for integral (wraps mod 2^64 — associative, so per-file partials
    // re-sum to the scan's answer) and decimal (exact string) columns —
    // the manifest lines behind SUM/AVG aggregate pushdown. Float /
    // double sums are NOT recorded: FP addition is order-dependent, so
    // a manifest answer could not be exact. Other types carry JNull.
    def summable(t: types.DataType): Boolean = t match {
      case types.ByteType | types.ShortType | types.IntegerType |
           types.LongType | _: types.DecimalType => true
      case _ => false
    }
    val aggs = typed.flatMap { case (c, t) =>
      Seq(min(col(c)), max(col(c)), count(col(c)),
        if (summable(t)) sum(col(c)) else lit(null))
    }
    def sumJson(v: Any, t: types.DataType): org.json4s.JValue = {
      import org.json4s._
      if (v == null) JNull
      else t match {
        case types.ByteType | types.ShortType | types.IntegerType | types.LongType =>
          JLong(v.asInstanceOf[Number].longValue)
        case _: types.DecimalType => JString(v.toString)
        case _ => JNull
      }
    }
    val byNorm = files.map(f => Paths.get(f).normalize.toString -> f).toMap
    df.groupBy(col("_metadata.file_path").as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.flatMap { r =>
        val norm = Paths.get(
          new org.apache.hadoop.fs.Path(r.getString(0)).toUri.getPath)
          .normalize.toString
        byNorm.get(norm).map { f =>
          import org.json4s._
          val obj = JObject(typed.zipWithIndex.map { case ((c, t), i) =>
            c -> JArray(List(
              statJson(r.get(1 + i * 4), t),
              statJson(r.get(2 + i * 4), t),
              JLong(r.getLong(3 + i * 4)),
              sumJson(r.get(4 + i * 4), t)))
          }.toList)
          StatsPrefix + f + "\t" + org.json4s.jackson.JsonMethods.compact(
            org.json4s.jackson.JsonMethods.render(obj))
        }
      }
  }

  /** Fresh `R <file>\t<count>` lines for newly written files — the
    * per-file row counts behind manifest-only `COUNT(*)` and the
    * planner's `numRows` estimate. One metadata-column-only read of
    * just those files: projecting nothing but `_metadata.file_path`
    * decodes ZERO data pages (the vectorized reader serves batch row
    * counts straight from parquet metadata), so this costs a listing,
    * not a scan.
    */
  private def rowLinesFor(spark: SparkSession, files: Seq[String]): Seq[String] = {
    if (files.isEmpty) return Seq.empty
    val byNorm = files.map(f => Paths.get(f).normalize.toString -> f).toMap
    spark.read.parquet(files: _*)
      .groupBy(col("_metadata.file_path").as("__f")).count()
      .collect().toSeq.flatMap { r =>
        val norm = Paths.get(
          new org.apache.hadoop.fs.Path(r.getString(0)).toUri.getPath)
          .normalize.toString
        byNorm.get(norm).map(f => RowsPrefix + f + "\t" + r.getLong(1))
      }
  }

  /** The snapshot's per-file row counts (`R` lines). Files written
    * before round 16 have no entry — consumers must fall back to
    * scanning when a referenced file is missing here.
    */
  def fileRowCounts(path: String, asOf: Option[Int] = None): Map[String, Long] =
    snapshotMeta(path, asOf).rowCounts

  /** BACKFILL `R` row-count lines for every current data file missing
    * one (tables created before round 16) — after this, manifest-only
    * COUNT(*) and exact numRows estimates apply to the whole snapshot.
    * No-op commit-free when nothing is missing.
    */
  def backfillRowCounts(spark: SparkSession, path: String): Int = {
    val base = currentVersion(path)
    val have = fileRowCounts(path, Some(base)).keySet
    val missing = snapshotFiles(path, Some(base)).filterNot(have.contains)
    if (missing.isEmpty) return base
    commit(path, manifestLines(path, Some(base)) ++
      rowLinesFor(spark, missing), base)
  }

  /** A collected min/max → portable JSON. Dates persist as epoch days,
    * timestamps as epoch MICROS (instant-based — session-timezone
    * independent, the partition-transform lesson), decimals as exact
    * strings; NaN/Infinity as strings the prune side treats as
    * "cannot prune".
    */
  private def statJson(v: Any, t: types.DataType): org.json4s.JValue = {
    import org.json4s._
    if (v == null) JNull
    else t match {
      case types.ByteType | types.ShortType | types.IntegerType | types.LongType =>
        JLong(v.asInstanceOf[Number].longValue)
      case types.FloatType | types.DoubleType =>
        val d = v.asInstanceOf[Number].doubleValue
        if (d.isNaN || d.isInfinite) JString(d.toString) else JDouble(d)
      case _: types.DecimalType => JString(v.toString)
      case types.StringType => JString(v.asInstanceOf[String])
      case types.DateType => v match {
        case d: java.sql.Date => JLong(d.toLocalDate.toEpochDay)
        case d: java.time.LocalDate => JLong(d.toEpochDay)
        case other => JString(String.valueOf(other))
      }
      case types.TimestampType => v match {
        case ts: java.sql.Timestamp =>
          val i = ts.toInstant
          JLong(i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case i: java.time.Instant =>
          JLong(i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case other => JString(String.valueOf(other))
      }
      case _ => JNull
    }
  }

  /** Parsed per-file stats of a snapshot:
    * file → column → (min, max, nonNullCount).
    */
  def fileStats(path: String, asOf: Option[Int] = None)
      : Map[String, Map[String, (org.json4s.JValue, org.json4s.JValue, Long)]] =
    snapshotMeta(path, asOf).stats

  /** Per-file exact column SUMS (the 4th `C`-line element, round 17):
    * file → column → sum JSON — `JLong` for integral columns (wraps
    * mod 2^64, associative), `JString` exact decimal, `JNull` when the
    * file's column is all-null. A column ABSENT from a file's map means
    * the line predates the sum element (or the type is unsummable) —
    * SUM/AVG pushdown must decline for that file; re-running
    * [[setStatsColumns]] backfills.
    */
  def fileSums(path: String, asOf: Option[Int] = None)
      : Map[String, Map[String, org.json4s.JValue]] =
    snapshotMeta(path, asOf).sums

  /** METADATA TABLE: one row per (data file, stats column) a snapshot
    * records — min/max rendered as strings (JSON encoding: epoch days
    * for dates, epoch micros for timestamps), nonNullCount exact. The
    * SQL face is the `cow_stats(path[, v])` TVF beside
    * cow_files/cow_history.
    */
  def statsMeta(spark: SparkSession, path: String,
                asOf: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val rows = fileStats(path, asOf).toSeq.flatMap { case (f, cols) =>
      cols.toSeq.map { case (c, (mn, mx, nn)) =>
        def render(j: org.json4s.JValue): String = j match {
          case org.json4s.JNull => null
          case org.json4s.JString(s) => s
          case other => org.json4s.jackson.JsonMethods.compact(
            org.json4s.jackson.JsonMethods.render(other))
        }
        (f, c, render(mn), render(mx), nn)
      }
    }.sorted
    rows.toDF("file", "column_name", "min_value", "max_value", "non_null_count")
  }

  /** Observability face of the `B` lookup sidecars, symmetric with
    * [[statsMeta]]: per (file, column), whether the file carries an
    * exact DICTIONARY (with its NDV) or a BLOOM (with its bit size) —
    * the "will my IN-list prune here?" planning view. SQL face:
    * `cow_lookups(path[, v])`.
    */
  def lookupsMeta(spark: SparkSession, path: String,
                  asOf: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val rows = fileLookups(path, asOf).toSeq.flatMap { case (f, cols) =>
      cols.toSeq.map {
        case (c, DictEntry(vs)) => (f, c, "dict", vs.size.toLong)
        case (c, BloomEntry(_, bits)) => (f, c, "bloom", bits.toLong)
      }
    }.sorted
    rows.toDF("file", "column_name", "kind", "ndv_or_bits")
  }

  /** A stats JSON value as a BigDecimal (numeric/date/timestamp
    * ordering); None = not comparable (NaN marker, corrupt) → the
    * prune side must keep the file.
    */
  // ---- per-file key lookup sidecars (round 13) ---------------------------

  /** The snapshot's lookup spec: (columns, dictMax, bloomBits). */
  def lookupSpec(path: String, asOf: Option[Int] = None)
      : Option[(Seq[String], Int, Int)] =
    if (!exists(path)) None
    else manifestLines(path, asOf).find(_.startsWith(LookupPrefix)).flatMap { l =>
      l.stripPrefix(LookupPrefix).split(" ", 3) match {
        case Array(d, b, cs) => scala.util.Try(
          (cs.split(",").toSeq.filter(_.nonEmpty), d.toInt, b.toInt)).toOption
        case _ => None
      }
    }

  /** DECLARE the table's point-lookup columns and BACKFILL: per data
    * file, each declared column gets either its exact distinct-value
    * DICTIONARY (NDV ≤ `dictMax`) or a `bloomBits`-bit BLOOM filter
    * over the canonical key strings, committed as `B` manifest lines.
    * Every subsequent data write records fresh `B` lines
    * automatically; rewrites retire them with the file. ARRAY columns
    * index their ELEMENTS (a band-index probe asks "may this file
    * contain any of these band keys?"). Unsupported types (nested
    * non-array, float/double — FP string forms are not canonical,
    * decimal) are skipped: their files simply never prune. Empty
    * `cols` retires the spec and all `B` lines.
    *
    * This is the 100 TB point-lookup complement to [[setStatsColumns]]:
    * range stats prune nothing for an equality/IN on a column the
    * table is NOT clustered by (every file's [min,max] covers the
    * key); a dictionary/bloom answers per file regardless of layout.
    */
  def setLookupColumns(spark: SparkSession, path: String, cols: Seq[String],
                       dictMax: Int = 128, bloomBits: Int = 8192): Int = {
    require(cols.forall(c => !c.contains(",") && !c.contains(" ") &&
      !c.contains("\t") && !c.contains("\n")),
      s"lookup column names must not contain ',', ' ', TAB or newline: $cols")
    require(dictMax >= 0 && bloomBits > 0 && bloomBits % 8 == 0,
      s"need dictMax >= 0 and bloomBits a positive multiple of 8, got $dictMax/$bloomBits")
    val base = currentVersion(path)
    val kept = manifestLines(path, Some(base)).filterNot(l =>
      l.startsWith(LookupPrefix) || l.startsWith(BloomPrefix))
    if (cols.isEmpty) return commit(path, kept, base)
    val spec = (cols, dictMax, bloomBits)
    commit(path,
      (kept :+ s"$LookupPrefix$dictMax $bloomBits ${cols.mkString(",")}") ++
        bloomLinesFor(spark, path, snapshotFiles(path, Some(base)), spec),
      base)
  }

  private[sinks] val BloomK = 4

  /** The k probe positions of a canonical key — double hashing
    * (Kirsch–Mitzenmacher) over two Murmur3 seeds. PLAIN SCALA on
    * purpose: the build pass (a UDF over the written rows) and the
    * prune side (driver, per literal) call the SAME function, so the
    * two can never disagree the way re-implemented hash chains do.
    */
  private[sinks] def bloomPositions(key: String, bits: Int): Array[Int] = {
    val bs = key.getBytes(StandardCharsets.UTF_8)
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bs, 0xb100f11e)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bs, 0x05eedca7)
    Array.tabulate(BloomK)(i => math.floorMod(h1 + (i + 1) * h2, bits))
  }

  /** Canonical key string of a column value, computed IN THE PLAN for
    * the build pass. Exact types only: integral → decimal string,
    * string → itself, date → epoch-day, timestamp → epoch-micros
    * (instant-based, session-zone independent). None = type
    * unsupported for lookup sidecars.
    */
  private def canonKeyCol(c: Column, t: types.DataType): Option[Column] = t match {
    case types.StringType => Some(c)
    case types.ByteType | types.ShortType | types.IntegerType | types.LongType =>
      Some(c.cast("long").cast("string"))
    case types.DateType =>
      Some(datediff(c, to_date(lit("1970-01-01"))).cast("long").cast("string"))
    case types.TimestampType => Some(unix_micros(c).cast("string"))
    case _ => None
  }

  /** The same canonical form for a caller LITERAL under the column's
    * key type — [[litBig]] canonicalization, then exact-integer
    * rendering. None = this value cannot prune (cross-typed against a
    * string column, non-integral against an integral one, …).
    */
  private def lookupKey(v: Any, t: types.DataType): Option[String] = t match {
    case types.StringType => v match { case s: String => Some(s); case _ => None }
    case types.ByteType | types.ShortType | types.IntegerType | types.LongType |
         types.DateType | types.TimestampType =>
      litBig(v, Some(t)).flatMap(_.toBigIntExact).map(_.toString)
    case _ => None
  }

  /** Fresh `B` lines for newly written `files` under `spec` — one
    * column-pruned, per-file-distinct pass per declared column. Dict
    * values and bloom positions are both BOUNDED per file (dictMax
    * values / bloomBits positions), so the driver-side collect is
    * metadata-sized no matter how many rows a file holds.
    */
  private def bloomLinesFor(spark: SparkSession, path: String,
                            files: Seq[String],
                            spec: (Seq[String], Int, Int)): Seq[String] = {
    import org.json4s._
    val (cols, dictMax, bits) = spec
    if (cols.isEmpty || files.isEmpty) return Seq.empty
    val df = spark.read.option("mergeSchema", "true").parquet(files: _*)
    val byNorm = files.map(f => Paths.get(f).normalize.toString -> f).toMap
    def fileOf(raw: String): Option[String] = byNorm.get(Paths.get(
      new org.apache.hadoop.fs.Path(raw).toUri.getPath).normalize.toString)
    val posOf = udf((v: String) => bloomPositions(v, bits).toSeq)
    val perFile = scala.collection.mutable.Map.empty[String, List[(String, JValue)]]
    cols.filter(df.columns.contains).foreach { c =>
      // generators can't nest inside the canonical cast: explode the
      // array into a raw column FIRST, then canonicalize it
      val (raw, keyT) = df.schema(c).dataType match {
        case types.ArrayType(el, _) =>
          (df.select(col("_metadata.file_path").as("__f"),
             explode(col(c)).as("__raw")), el)
        case t =>
          (df.select(col("_metadata.file_path").as("__f"),
             col(c).as("__raw")), t)
      }
      canonKeyCol(col("__raw"), keyT).foreach { canon =>
        // ONE read of the written files (r20): the NDV census, the
        // dictionary collect and the bloom-position aggregate below
        // all consume this distinct (file, key) table — without the
        // checkpoint each replayed the parquet scan + explode +
        // distinct exchange (2-3 full re-reads per declared column,
        // the dominant cost of every sidecar-writing commit).
        // Executor blocks spill to disk, so a table-wide backfill
        // stays bounded; the blocks free with the frame.
        val base = raw.select(col("__f"), canon.as("__v"))
          .filter(col("__v").isNotNull).distinct()
          .localCheckpoint()
        val ndv = base.groupBy("__f").agg(count(lit(1)).as("__n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val smallSet = ndv.filter(_._2 <= dictMax).keySet
        val entries: Seq[(String, JValue)] =
          (if (smallSet.isEmpty) Seq.empty
           else base
             .filter(col("__f").isin(smallSet.toIndexedSeq: _*))
             .groupBy("__f").agg(sort_array(collect_set(col("__v"))).as("__d"))
             .collect().toSeq.map { r =>
               r.getString(0) -> JObject("d" ->
                 JArray(r.getSeq[String](1).map(JString(_)).toList))
             }) ++
          (if (smallSet.size == ndv.size) Seq.empty
           else base
             .filter(!col("__f").isin(smallSet.toIndexedSeq: _*))
             .select(col("__f"), explode(posOf(col("__v"))).as("__p"))
             .groupBy("__f").agg(collect_set(col("__p")).as("__ps"))
             .collect().toSeq.map { r =>
               val bytes = new Array[Byte](bits / 8)
               r.getSeq[Int](1).foreach(p =>
                 bytes(p >> 3) = (bytes(p >> 3) | (1 << (p & 7))).toByte)
               r.getString(0) -> JObject(
                 "b" -> JString(java.util.Base64.getEncoder.encodeToString(bytes)),
                 "m" -> JLong(bits.toLong))
             })
        entries.foreach { case (raw, j) =>
          fileOf(raw).foreach { f =>
            perFile(f) = (c -> j) :: perFile.getOrElse(f, Nil)
          }
        }
      }
    }
    perFile.toSeq.map { case (f, colEntries) =>
      BloomPrefix + f + "\t" + org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(JObject(colEntries.reverse: _*)))
    }
  }

  private sealed trait LookupEntry
  private final case class DictEntry(vals: Set[String]) extends LookupEntry
  private final case class BloomEntry(bytes: Array[Byte], bits: Int) extends LookupEntry

  /** One file-column's stats in comparison-ready form: numeric bounds
    * (None = NaN marker / unparseable → cannot prune), string bounds,
    * non-null count, and whether the file is all-null in the column.
    */
  private final case class StatDigest(loB: Option[BigDecimal], hiB: Option[BigDecimal],
                                      loS: Option[String], hiS: Option[String],
                                      nn: Long, allNull: Boolean)

  /** Constant-column value index (see SnapshotMeta.constIndexFor):
    * value → the files constant at it, in the numeric (scala
    * BigDecimal — numeric equality) and string domains.
    */
  private final case class ConstIndex(byBig: Map[BigDecimal, Vector[String]],
                                      byStr: Map[String, Vector[String]])

  /** Disjoint-interval range index (see SnapshotMeta.rangeIndexFor):
    * stats-carrying files sorted by min with pairwise-disjoint
    * [min, max]; `alwaysKeep` = files with no usable bounds.
    */
  private final case class RangeIndex(
      sorted: Vector[(BigDecimal, BigDecimal, String)],
      alwaysKeep: Vector[String]) {
    /** Files possibly overlapping [lo, hi] (None = unbounded side):
      * the contiguous window via two binary searches, plus the
      * always-keep tail. Exact interval-overlap semantics — identical
      * keep/skip decisions to the per-file loop.
      */
    def overlapping(lo: Option[BigDecimal], hi: Option[BigDecimal]): Seq[String] = {
      // first index with fileHi >= lo (hi values are sorted too —
      // disjointness), end = last index with fileLo <= hi
      def lowerBound(p: Int => Boolean): Int = {
        var l = 0; var r = sorted.length
        while (l < r) { val m = (l + r) >>> 1; if (p(m)) r = m else l = m + 1 }
        l
      }
      val from = lo.fold(0)(q => lowerBound(i => sorted(i)._2 >= q))
      val until = hi.fold(sorted.length)(q => lowerBound(i => sorted(i)._1 > q))
      (if (from < until) sorted.slice(from, until).map(_._3) else Vector.empty) ++
        alwaysKeep
    }
  }

  private def fileDigests(path: String, asOf: Option[Int])
      : Map[String, Map[String, StatDigest]] =
    snapshotMeta(path, asOf).digests

  /** ORDERED-PREFIX LIMIT (round 18, VERDICT r17 task 8): for
    * `ORDER BY column [DESC] LIMIT n` on a range-clustered snapshot,
    * the shortest file run IN CLUSTERING ORDER that provably contains
    * the n extreme rows — `LIMIT 10` on a 100k-file table plans ONE
    * file, in value order rather than manifest order. Provable only
    * when: the column's range index exists (pairwise-disjoint file
    * intervals — every row outside the prefix is strictly beyond every
    * row inside, so the prefix holds the top-n under any secondary
    * sort keys), EVERY data file carries stats and a row count (a
    * blind file could hide extreme rows), no file holds a NULL in the
    * column (NULLS FIRST/LAST would interleave arbitrary files), and
    * no delete sidecar can shrink a file's contribution. Anything less
    * returns None and the scan plans normally.
    */
  private[sinks] def orderedCoveringPrefix(path: String, asOf: Option[Int],
                                           column: String, desc: Boolean,
                                           n: Long,
                                           subset: Seq[String]): Option[Seq[String]] = {
    if (snapshotDeletes(path, asOf).nonEmpty ||
        snapshotPositionDeletes(path, asOf).nonEmpty) return None
    val meta = snapshotMeta(path, asOf)
    meta.rangeIndexFor(column) match {
      case Some(idx) =>
        // the proof holds over any SUBSET of the disjoint index (an
        // exact-pushed filter's kept files are whole-matching, and a
        // subset of pairwise-disjoint intervals stays disjoint) — but
        // every subset member must be index-carried: a stats-less or
        // all-null-in-column file could hide extreme or NULL rows
        val want = subset.toSet
        val restricted = idx.sorted.filter { case (_, _, f) => want.contains(f) }
        if (restricted.size != want.size) return None
        val counts = fileRowCounts(path, asOf)
        val digests = fileDigests(path, asOf)
        val allCounted = restricted.forall { case (_, _, f) =>
          counts.get(f).exists(rc =>
            digests.get(f).flatMap(_.get(column)).exists(_.nn == rc))
        }
        if (!allCounted) None
        else {
          val ordered = if (desc) restricted.reverse else restricted
          var acc = 0L
          val out = Vector.newBuilder[String]
          ordered.foreach { case (_, _, f) =>
            if (acc < n) { out += f; acc += counts(f) }
          }
          Some(out.result())
        }
      case _ => None
    }
  }

  /** Parsed `B` sidecars of a snapshot: file → column → entry
    * (cached with the snapshot — base64 bloom decode is O(files)).
    */
  private def fileLookups(path: String, asOf: Option[Int])
      : Map[String, Map[String, LookupEntry]] =
    snapshotMeta(path, asOf).lookups

  private def mayContain(e: LookupEntry, key: String): Boolean = e match {
    case DictEntry(vs) => vs.contains(key)
    case BloomEntry(bytes, m) => bloomPositions(key, m).forall(p =>
      (p >> 3) < bytes.length && (bytes(p >> 3) & (1 << (p & 7))) != 0)
  }

  private def statBig(j: org.json4s.JValue): Option[BigDecimal] = j match {
    case org.json4s.JLong(v) => Some(BigDecimal(v))
    case org.json4s.JInt(v) => Some(BigDecimal(v))
    case org.json4s.JDouble(v) =>
      if (v.isNaN || v.isInfinite) None
      else Some(BigDecimal(new java.math.BigDecimal(v)))
    case org.json4s.JDecimal(v) => Some(v)
    case org.json4s.JString(s) => scala.util.Try(BigDecimal(s)).toOption
    case _ => None
  }

  /** A caller literal as a BigDecimal under the COLUMN's type — the
    * cross-family canonicalization lesson from partition pruning
    * (ADVICE r11): an Int 5 against a DOUBLE column must compare as
    * 5.0, a date string against a DATE column as its epoch day.
    */
  private def litBig(v: Any, t: Option[types.DataType]): Option[BigDecimal] = v match {
    case null => None
    case d: java.sql.Date => Some(BigDecimal(d.toLocalDate.toEpochDay))
    case d: java.time.LocalDate => Some(BigDecimal(d.toEpochDay))
    case ts: java.sql.Timestamp =>
      val i = ts.toInstant
      Some(BigDecimal(i.getEpochSecond) * 1000000 + i.getNano / 1000)
    case i: java.time.Instant =>
      Some(BigDecimal(i.getEpochSecond) * 1000000 + i.getNano / 1000)
    case d: Double =>
      if (d.isNaN) None else Some(BigDecimal(new java.math.BigDecimal(d)))
    case f: Float =>
      if (f.isNaN) None else Some(BigDecimal(new java.math.BigDecimal(f.toDouble)))
    case n: Byte => Some(BigDecimal(n.toInt))
    case n: Short => Some(BigDecimal(n.toInt))
    case n: Int => Some(BigDecimal(n))
    case n: Long => Some(BigDecimal(n))
    case n: BigDecimal => Some(n)
    case n: java.math.BigDecimal => Some(BigDecimal(n))
    case n: BigInt => Some(BigDecimal(n))
    case s: String => t match {
      case Some(types.DateType) =>
        scala.util.Try(BigDecimal(java.time.LocalDate.parse(s).toEpochDay)).toOption
      case Some(types.TimestampType) =>
        scala.util.Try {
          val i = java.sql.Timestamp.valueOf(s).toInstant
          BigDecimal(i.getEpochSecond) * 1000000 + i.getNano / 1000
        }.orElse(scala.util.Try {
          val i = java.time.Instant.parse(s)
          BigDecimal(i.getEpochSecond) * 1000000 + i.getNano / 1000
        }).toOption
      case _ => scala.util.Try(BigDecimal(s)).toOption
    }
    case _ => None
  }

  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** The requested column plus its rename lineage — stats recorded
    * under a PRIOR physical name keep pruning after a rename.
    */
  private def physicalNamesOf(path: String, column: String,
                              asOf: Option[Int]): Seq[String] =
    declaredSchema(path, asOf).flatMap(_.fields.find(_.name == column)).map { f =>
      val was =
        if (f.metadata.contains("was")) f.metadata.getStringArray("was").toSeq
        else Seq.empty
      f.name +: was
    }.getOrElse(Seq(column))

  private def statsColType(spark: SparkSession, path: String, column: String,
                           names: Seq[String], files: Seq[String],
                           asOf: Option[Int]): Option[types.DataType] =
    declaredSchema(path, asOf)
      .flatMap(_.fields.find(_.name == column).map(_.dataType))
      .orElse(files.headOption.flatMap(f =>
        scala.util.Try(spark.read.parquet(f).schema).toOption.flatMap(s =>
          names.collectFirst {
            case n if s.fieldNames.contains(n) => s(n).dataType
          })))

  /** Files of a snapshot that CAN contain rows with `column` in
    * [lo, hi] (inclusive; None = unbounded): a file is skipped only
    * when its recorded [min, max] provably excludes the whole range.
    * Files without stats — written before the declaration, a column
    * with no entry, an uncomparable marker (NaN) — always survive:
    * over-approximate, never wrong. MoR-deleted rows only WIDEN
    * bounds, same direction. Column resolves through rename lineage;
    * literals canonicalize to the column's type first.
    */
  def prunedFilesRange(spark: SparkSession, path: String, column: String,
                       lo: Option[Any], hi: Option[Any],
                       asOf: Option[Int] = None): Seq[String] =
    prunedFilesRange(spark, path, column, lo, hi, asOf, None)

  /** [[prunedFilesRange]] with the column type supplied by a caller
    * that already knows the table schema (the catalog scan) — skips
    * the footer-sampling `statsColType` fallback, a fresh
    * DataFrameReader per call (the same fixed overhead the r16 `dpp`
    * bench measured on the IN path).
    */
  def prunedFilesRange(spark: SparkSession, path: String, column: String,
                       lo: Option[Any], hi: Option[Any],
                       asOf: Option[Int],
                       colTypeHint: Option[types.DataType]): Seq[String] = {
    val files = snapshotFiles(path, asOf)
    if (lo.isEmpty && hi.isEmpty) return files
    val stats = fileDigests(path, asOf)
    if (stats.isEmpty) return files
    val names = physicalNamesOf(path, column, asOf)
    val colType = colTypeHint.orElse(
      statsColType(spark, path, column, names, files, asOf))
    val isString = colType.contains(types.StringType) ||
      (colType.isEmpty && lo.orElse(hi).exists(_.isInstanceOf[String]))
    // literal canonicalization hoisted out of the per-file loop (it was
    // re-run per file — O(files) BigDecimal churn per plan)
    val loB = lo.map(litBig(_, colType))
    val hiB = hi.map(litBig(_, colType))
    // FAST PATH (round 17): a range-clustered column (pairwise-disjoint
    // per-file intervals) answers from the sorted range index in
    // O(log files); identical keep/skip decisions to the loop below.
    if (!isString && names.length == 1 &&
        loB.forall(_.isDefined) && hiB.forall(_.isDefined)) {
      snapshotMeta(path, asOf).rangeIndexFor(names.head) match {
        case Some(idx) => return idx.overlapping(loB.flatten, hiB.flatten)
        case None =>
      }
    }
    files.filter { f =>
      stats.get(f).flatMap(m => names.collectFirst {
        case n if m.contains(n) => m(n)
      }) match {
        case None => true // no stats for this file/column: must read
        case Some(d) if d.allNull => false // zero non-null rows
        case Some(d) if isString =>
          (d.loS, d.hiS) match {
            case (Some(a), Some(b)) =>
              // only a STRING literal compares the way the stats were
              // recorded (UTF-8 bytes); a cross-typed literal (numeric
              // vs string column) compares NUMERICALLY in the residual
              // filter after Spark's implicit cast ("30" < "5" lexic.)
              // — it cannot prune, so it keeps the file
              lo.forall { case l: String => utf8Cmp(b, l) >= 0; case _ => true } &&
                hi.forall { case h: String => utf8Cmp(a, h) <= 0; case _ => true }
            case _ => true
          }
        case Some(d) =>
          (d.loB, d.hiB, loB, hiB) match {
            // an uncanonicalizable literal (NaN, unparseable) or stats
            // marker keeps every file — conservative by construction
            case (Some(a), Some(b), lB, hB)
              if lB.forall(_.isDefined) && hB.forall(_.isDefined) =>
              lB.flatten.forall(l => b >= l) && hB.flatten.forall(h => a <= h)
            case _ => true
          }
      }
    }
  }

  /** Files that can contain rows with `column` IN `values` (nulls in
    * `values` ignored — IN never matches null). Empty/all-null value
    * sets match nothing.
    */
  def prunedFilesIn(spark: SparkSession, path: String, column: String,
                    values: Seq[Any], asOf: Option[Int] = None): Seq[String] =
    prunedFilesIn(spark, path, column, values, asOf, None)

  /** [[prunedFilesIn]] with the column's type supplied by a caller that
    * already knows the table schema (the catalog scan) — skips the
    * footer-sampling `statsColType` fallback, which costs a fresh
    * DataFrameReader per call and was the measured fixed overhead of
    * the runtime-filter path (r16 `dpp` bench).
    */
  def prunedFilesIn(spark: SparkSession, path: String, column: String,
                    values: Seq[Any], asOf: Option[Int],
                    colTypeHint: Option[types.DataType]): Seq[String] = {
    val vs = values.filter(_ != null)
    if (vs.isEmpty) return Seq.empty
    val files = snapshotFiles(path, asOf)
    val stats = fileDigests(path, asOf)
    val lookups = fileLookups(path, asOf)
    if (stats.isEmpty && lookups.isEmpty) return files
    val names = physicalNamesOf(path, column, asOf)
    val colType = colTypeHint.orElse(
      statsColType(spark, path, column, names, files, asOf))
    val isString = colType.contains(types.StringType) ||
      (colType.isEmpty && vs.head.isInstanceOf[String])
    // dictionary/bloom gate (the point-lookup path): a file is skipped
    // when NO requested key can be present. Keys canonicalize under
    // the column's KEY type (array columns index their elements); any
    // uncanonicalizable value disables the gate — conservative
    val lookupKeys: Option[Seq[String]] =
      if (lookups.isEmpty) None
      else colType.map {
        case types.ArrayType(el, _) => el
        case t => t
      }.flatMap { kt =>
        val ks = vs.map(lookupKey(_, kt))
        if (ks.exists(_.isEmpty)) None else Some(ks.flatten)
      }
    def lookupGate(f: String): Boolean = lookupKeys match {
      case None => true
      case Some(keys) =>
        lookups.get(f).flatMap(m => names.collectFirst {
          case n if m.contains(n) => m(n)
        }) match {
          case None => true // no sidecar for this file/column: must read
          case Some(e) => keys.exists(mayContain(e, _))
        }
    }
    if (stats.isEmpty) return files.filter(lookupGate)
    // FAST PATH (round 17): a fully constant-or-all-null column answers
    // IN-pruning from the per-column value index in O(values) — exact,
    // not conservative, so the lookup gate has nothing left to prune.
    // Cross-typed / uncanonicalizable values fall through (the loop
    // keeps their files conservatively, as before). names.length != 1
    // (rename lineage) also falls through — stats may sit under old
    // physical names per file.
    if (colType.isDefined && names.length == 1) {
      snapshotMeta(path, asOf).constIndexFor(names.head) match {
        case Some(idx) if isString && vs.forall(_.isInstanceOf[String]) =>
          return vs.map(_.asInstanceOf[String]).distinct
            .flatMap(v => idx.byStr.getOrElse(v, Vector.empty))
        case Some(idx) if !isString =>
          val bigs = vs.map(v => litBig(v, colType))
          if (!bigs.exists(_.isEmpty))
            return bigs.flatten.distinct
              .flatMap(v => idx.byBig.getOrElse(v, Vector.empty))
        case _ =>
      }
      // not constant-per-file, but possibly RANGE-CLUSTERED: answer
      // each point from the disjoint-interval index in O(log files).
      // Only when the table carries no lookup sidecars — a dict/bloom
      // can prune INSIDE a kept interval, and skipping it here would
      // silently trade their IO win for planner speed
      if (!isString && lookups.isEmpty) {
        val bigs = vs.map(v => litBig(v, colType))
        if (!bigs.exists(_.isEmpty)) {
          snapshotMeta(path, asOf).rangeIndexFor(names.head) match {
            case Some(idx) =>
              return bigs.flatten.distinct
                .flatMap(v => idx.overlapping(Some(v), Some(v)))
                .distinct
            case None =>
          }
        }
      }
    }
    // canonicalize the requested values ONCE and sort, so the per-file
    // range gate is a binary search instead of an O(|values|) scan with
    // per-(file, value) re-canonicalization — runtime join filters
    // (SupportsRuntimeV2Filtering) routinely carry 10k+ keys, which
    // made the old shape a measurable driver stall (r16 `dpp` bench).
    // None = some value has no canonical form under the column type →
    // that value could match anywhere → the gate keeps every file,
    // exactly the old exists-with-None semantics.
    val sortedBigs: Option[Array[BigDecimal]] = {
      val bs = vs.map(v => litBig(v, colType))
      if (bs.exists(_.isEmpty)) None else Some(bs.flatten.sorted.toArray)
    }
    val sortedStrs: Option[Array[String]] = {
      // a cross-typed value matches via the residual's implicit numeric
      // cast, not UTF-8 order — it keeps the file (see prunedFilesRange)
      if (vs.exists(!_.isInstanceOf[String])) None
      else Some(vs.map(_.asInstanceOf[String]).toArray
        .sortWith(utf8Cmp(_, _) < 0))
    }
    def anyIn[T](arr: Array[T], lo: T, hi: T, cmp: (T, T) => Int): Boolean = {
      // first index with arr(i) >= lo, then check <= hi
      var l = 0; var r = arr.length
      while (l < r) {
        val m = (l + r) >>> 1
        if (cmp(arr(m), lo) < 0) l = m + 1 else r = m
      }
      l < arr.length && cmp(arr(l), hi) <= 0
    }
    // singleton-name fast lookup: the per-file collectFirst closure was
    // measurable at 100k files (mft probe); lineage (>1 name) keeps it
    val n0 = names.head
    val single = names.length == 1
    files.filter(lookupGate).filter { f =>
      (stats.get(f) match {
        case Some(m) if single => m.get(n0)
        case Some(m) => names.collectFirst { case n if m.contains(n) => m(n) }
        case None => None
      }) match {
        case None => true
        case Some(d) if d.allNull => false
        case Some(d) if isString =>
          (d.loS, d.hiS) match {
            case (Some(a), Some(b)) => sortedStrs.forall(anyIn(_, a, b, utf8Cmp))
            case _ => true
          }
        case Some(d) =>
          (d.loB, d.hiB) match {
            case (Some(a), Some(b)) =>
              sortedBigs.forall(anyIn[BigDecimal](_, a, b, _.compare(_)))
            case _ => true
          }
      }
    }
  }

  /** EXACT partition-equality certificate: `Some(keptFiles)` when the
    * manifest PROVES that filtering `column IN values` keeps exactly
    * the rows of `keptFiles` and no residual per-row check is needed —
    * i.e. every snapshot file either (a) is CONSTANT at one of the
    * requested values with zero nulls in the column (min == max ==
    * value, nonNullCount == the file's `R` row count), or (b) provably
    * excludes every requested value ([min, max] disjoint, or all-null).
    * Any file with a value strictly inside a non-constant range, any
    * missing stat/row line, a null-bearing constant file, or an
    * uncanonicalizable value → None (the caller keeps the ordinary
    * prune-plus-residual path). This is what lets the catalog scan
    * accept `day = X` on an identity-partitioned table as FULLY
    * pushed, unlocking aggregate/limit pushdown under the filter.
    */
  def exactConstantPrune(spark: SparkSession, path: String, column: String,
                         values: Seq[Any], asOf: Option[Int],
                         colType: types.DataType): Option[Seq[String]] = {
    if (values.isEmpty || values.contains(null)) return None
    if (!statsSupported(colType)) return None
    val files = snapshotFiles(path, asOf)
    val stats = fileDigests(path, asOf)
    val rowCounts = fileRowCounts(path, asOf)
    val names = physicalNamesOf(path, column, asOf)
    // rename lineage means stats could live under old names per file —
    // require the simple single-name world
    if (names.length != 1) return None
    val isString = colType == types.StringType
    val wantBig: Option[Seq[BigDecimal]] =
      if (isString) None
      else { val bs = values.map(litBig(_, Some(colType)))
             if (bs.exists(_.isEmpty)) return None else Some(bs.flatten) }
    val wantStr: Option[Seq[String]] =
      if (!isString) None
      else if (values.forall(_.isInstanceOf[String]))
        Some(values.map(_.asInstanceOf[String]))
      else return None
    // FAST PATH (round 17): on a fully constant-or-all-null layout the
    // per-column value index answers in O(values) — every non-matching
    // file is constant at a DIFFERENT value or all-null, i.e. provably
    // disjoint, so the certificate holds by construction. Result order
    // is value-major (deterministic); the scan builder re-imposes
    // snapshot order via its own files.filter.
    snapshotMeta(path, asOf).constIndexFor(names.head) match {
      case Some(idx) =>
        return Some(
          if (isString) wantStr.get.distinct.flatMap(v =>
            idx.byStr.getOrElse(v, Vector.empty))
          else wantBig.get.distinct.flatMap(v =>
            idx.byBig.getOrElse(v, Vector.empty)))
      case None => // mixed layout: the exact per-file loop below may
                   // still certify via range disjointness
    }
    val kept = Vector.newBuilder[String]
    for (f <- files) {
      val st = stats.get(f).flatMap(_.get(names.head))
      val rc = rowCounts.get(f)
      (st, rc) match {
        case (Some(d), Some(rows)) =>
          if (d.nn == 0L) () // all-null file: no value matches — exclude
          else if (isString) (d.loS, d.hiS) match {
            case (Some(a), Some(b)) =>
              if (a == b && wantStr.get.contains(a)) {
                if (d.nn != rows) return None // constant but null-bearing
                kept += f
              } else if (a == b) () // constant at a non-requested value
              else if (wantStr.get.forall(s =>
                utf8Cmp(s, a) < 0 || utf8Cmp(s, b) > 0)) () // disjoint
              else return None // a value inside a non-constant range
            case _ => return None
          } else (d.loB, d.hiB) match {
            case (Some(a), Some(b)) =>
              if (a == b && wantBig.get.contains(a)) {
                if (d.nn != rows) return None
                kept += f
              } else if (a == b) ()
              else if (wantBig.get.forall(x => x < a || x > b)) ()
              else return None
            case _ => return None // NaN marker / corrupt: not provable
          }
        case _ => return None // missing stats or row count
      }
    }
    Some(kept.result())
  }

  /** STATS-PRUNED range read: [[read]] restricted to
    * [[prunedFilesRange]]'s files, with the residual `lo <= column <=
    * hi` filter still applied — pruning is purely an IO optimization,
    * correctness never depends on the stats. Sidecars and the declared
    * schema apply as in [[read]].
    */
  def readPrunedRange(spark: SparkSession, path: String, column: String,
                      lo: Option[Any], hi: Option[Any],
                      asOf: Option[Int] = None): DataFrame = {
    val files = prunedFilesRange(spark, path, column, lo, hi, asOf)
    val residual = (d: DataFrame) => {
      val c1 = lo.fold(d)(l => d.filter(col(column) >= lit(l)))
      hi.fold(c1)(h => c1.filter(col(column) <= lit(h)))
    }
    if (files.isEmpty) residual(read(spark, path, asOf).limit(0))
    else residual(readFiles(spark, path, files, asOf))
  }

  /** Read a snapshot (latest, or `asOf` for time travel). Schemas are
    * merged across the snapshot's files so a snapshot mixing pre- and
    * post-evolution files never silently narrows to whichever file the
    * reader sampled first; a [[declaredSchema]] (if the table evolved)
    * then projects the merged frame into the declared column set —
    * renamed columns resolve per row through their lineage, dropped
    * columns vanish, added columns are null for pre-evolution rows.
    * Merge-on-read delete sidecars apply on the way: positional
    * sidecars as a per-file range filter, key sidecars as an anti-join
    * on the SIDECAR'S OWN columns. A sidecar-free unevolved snapshot
    * (the overwhelmingly common case) keeps the plain pruned scan plan.
    */
  def read(spark: SparkSession, path: String, asOf: Option[Int] = None): DataFrame =
    readFiles(spark, path, snapshotFiles(path, asOf), asOf)

  /** [[read]] restricted to a subset of the snapshot's data files —
    * the building block partition pruning ([[readPrunedEq]]) and the
    * internal rewrite paths share. All of the snapshot's delete
    * sidecars and its declared schema still apply.
    */
  private[graft] def readFiles(spark: SparkSession, path: String,
                               files: Seq[String],
                               asOf: Option[Int] = None): DataFrame = {
    if (files.isEmpty)
      // a zero-data-file snapshot ([[createEmpty]], or everything
      // deleted by rewrite): the declared schema is the only shape
      return declaredSchema(path, asOf).map(s =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s))
        .getOrElse(throw new IllegalStateException(
          s"snapshot of $path has no data files and no declared schema"))
    // An EVOLVED snapshot reads with an EXPLICIT schema — declared
    // fields plus each field's rename-lineage names, all at the
    // DECLARED type (parquet readers upcast a widened column's old
    // INT32/FLOAT pages; absent columns read null). Schema-merge
    // inference cannot merge a widen's mixed physical types
    // (CANNOT_MERGE_SCHEMAS on any post-widen append), and would
    // also open every footer — O(files) at 100 TB. Non-evolved
    // snapshots keep the merge (no declared shape to trust).
    val raw = declaredSchema(path, asOf) match {
      case Some(ds) =>
        val readFields = ds.fields.flatMap { f =>
          val was =
            if (f.metadata.contains("was")) f.metadata.getStringArray("was").toSeq
            else Seq.empty
          (f.name +: was).map(n => types.StructField(n, f.dataType, nullable = true))
        }
        spark.read.schema(types.StructType(readFields)).parquet(files: _*)
      case None => spark.read.option("mergeSchema", "true").parquet(files: _*)
    }
    val pos = applyPosDeletes(spark, raw, snapshotPositionDeletes(path, asOf))
    val projected = declaredSchema(path, asOf).fold(pos)(projectDeclared(pos, _))
    applyKeyDeletes(spark, projected, snapshotDeletes(path, asOf))
  }

  /** Anti-join `data` against the union of key-delete sidecars, joined
    * on the sidecar's own column names (composite keys join on all of
    * them). Sidecars are key lists bounded by the compaction cadence —
    * size-based estimation broadcasts them; not forced, so a
    * pathological backlog degrades to a shuffle join, never an OOM.
    * A sidecar column missing from the data schema fails loudly
    * (ADVICE r10): the one legitimate way to hit it is renaming the
    * delete-key column before folding the sidecars — [[compact]]
    * first.
    */
  private def applyKeyDeletes(spark: SparkSession, data: DataFrame,
                              dels: Seq[String]): DataFrame = {
    if (dels.isEmpty) return data
    // no mergeSchema: every sidecar of a table carries the SAME column
    // set ([[deleteMor]] contract, enforced at commit) — a mismatch
    // should fail loudly, not widen
    val dk = spark.read.parquet(dels: _*).distinct()
    val kcols = dk.columns.toSeq
    val missing = kcols.filterNot(data.columns.contains)
    require(missing.isEmpty,
      s"delete-sidecar key column(s) ${missing.mkString(", ")} not in the " +
        s"table's read schema ${data.columns.mkString("[", ", ", "]")} — " +
        "fold sidecars (compact) before renaming/dropping a delete-key column")
    val renamed = kcols.foldLeft(dk)((d, c) => d.withColumnRenamed(c, s"__del_$c"))
    data.join(renamed,
      kcols.map(c => col(c) === col(s"__del_$c")).reduce(_ && _), "left_anti")
  }

  /** Filter out rows whose (file, row-ordinal) lands in a positional
    * sidecar range. One broadcast of the per-file range lists (bounded
    * by file-count × run-count — the sidecar design bound) + a codegen
    * `exists` filter; rows from files with no ranges stream through the
    * left join untouched.
    */
  private def applyPosDeletes(spark: SparkSession, data: DataFrame,
                              pos: Seq[String]): DataFrame = {
    if (pos.isEmpty) return data
    // internal names are `__pd_`-prefixed so they can never collide
    // with the caller's own `__file`/`__pos` bookkeeping (readWithPos)
    val ranges = spark.read.parquet(pos: _*)
      .groupBy(col("__file").as("__pd_file"))
      .agg(collect_list(struct(col("__lo"), col("__hi"))).as("__pd_ranges"))
    data
      .withColumn("__pd_fp", col("_metadata.file_path"))
      .withColumn("__pd_ri", col("_metadata.row_index"))
      .join(broadcast(ranges), col("__pd_fp") === col("__pd_file"), "left_outer")
      .filter(col("__pd_ranges").isNull || !org.apache.spark.sql.functions.exists(col("__pd_ranges"),
        r => col("__pd_ri") >= r.getField("__lo") && col("__pd_ri") <= r.getField("__hi")))
      .drop("__pd_fp", "__pd_ri", "__pd_file", "__pd_ranges")
  }

  /** Keep rows whose (file, row-ordinal) IS in a sidecar range — the
    * preimage extraction [[changes]] uses for carried files.
    */
  private def keepPosDeleted(spark: SparkSession, data: DataFrame,
                             pos: Seq[String]): DataFrame = {
    val ranges = spark.read.parquet(pos: _*)
      .groupBy(col("__file").as("__pd_file"))
      .agg(collect_list(struct(col("__lo"), col("__hi"))).as("__pd_ranges"))
    data
      .withColumn("__pd_fp", col("_metadata.file_path"))
      .withColumn("__pd_ri", col("_metadata.row_index"))
      .join(broadcast(ranges), col("__pd_fp") === col("__pd_file"), "inner")
      .filter(org.apache.spark.sql.functions.exists(col("__pd_ranges"),
        r => col("__pd_ri") >= r.getField("__lo") && col("__pd_ri") <= r.getField("__hi")))
      .drop("__pd_fp", "__pd_ri", "__pd_file", "__pd_ranges")
  }

  /** Project a (schema-merged) frame through the declared schema: each
    * declared column resolves per row through its rename lineage
    * (coalesce over whichever physical names are present, newest
    * first), cast to the declared type (type widening). Physical
    * columns outside the declared set (dropped, or renamed-away names)
    * disappear; `keep` columns (internal bookkeeping like
    * `input_file_name`) survive the projection.
    */
  private def projectDeclared(df: DataFrame, schema: types.StructType,
                              keep: Seq[String] = Seq.empty): DataFrame = {
    val present = df.columns.toSet
    val cols = schema.fields.toIndexedSeq.map { f =>
      val was: Seq[String] =
        if (f.metadata.contains("was")) f.metadata.getStringArray("was").toIndexedSeq
        else Seq.empty
      val cands = (f.name +: was).filter(present)
      (cands match {
        case Seq()    => lit(null).cast(f.dataType)
        case Seq(one) => col(one).cast(f.dataType)
        case many     => coalesce(many.map(c => col(c).cast(f.dataType)): _*)
      }).as(f.name)
    }
    df.select(cols ++ keep.map(col): _*)
  }

  /** MERGE-ON-READ DELETE: commit the keys of rows matching
    * `predicate` as a delete sidecar — ZERO data files are written or
    * rewritten, the complement of the copy-on-write [[delete]] for the
    * high-frequency small-delete regime (GDPR / right-to-be-forgotten
    * sweeps). Rows vanish from [[read]]/[[changes]]/IVM immediately;
    * the physical rows persist until [[compact]]/[[cluster]] folds the
    * sidecars (which also keeps time travel exact — older snapshots
    * don't reference the sidecar, so they still see the rows).
    *
    * `key` must be the table's merge key (unique, and the SAME column
    * for every deleteMor on a table). Null-keyed rows are never
    * MoR-deleted (a null never equi-joins) — use [[delete]] for those.
    * Matching runs against the LOGICAL snapshot, so re-deleting an
    * already-deleted key is a no-op. Returns the new version (or the
    * current one unchanged when nothing matches).
    */
  def deleteMor(spark: SparkSession, path: String, predicate: String,
                key: String): Int = deleteMor(spark, path, predicate, Seq(key))

  /** Composite-key [[deleteMor]]: the sidecar carries every key column
    * and readers anti-join on all of them. All sidecars of a table
    * must use the same key column set (enforced at commit).
    */
  def deleteMor(spark: SparkSession, path: String, predicate: String,
                keys: Seq[String]): Int = {
    require(keys.nonEmpty, "at least one key column")
    val base = currentVersion(path)
    val matched = read(spark, path, Some(base))
      .filter(coalesce(expr(predicate), lit(false)))
      .select(keys.map(col): _*).na.drop("any", keys).distinct()
    commitDeleteKeys(path, matched, base)
  }

  /** [[deleteMor]] by an explicit key set instead of a predicate — the
    * shape CDC-driven cleanup produces (a DataFrame of ids to retire).
    * Keys not currently live are dropped (re-deleting is a no-op), so
    * the sidecar only ever lists rows the snapshot actually shows.
    *
    * Cost note: the liveness restriction is one KEY-COLUMN scan of the
    * snapshot per call — that is the price of replay-safety (a
    * re-delivered batch commits nothing, no version churn) and of
    * sidecars that never bloat with dead keys. A caller who batches
    * deletes on a maintenance cadence amortizes it; committing keys
    * unverified would shift the cost to sidecar growth between
    * [[compact]] folds without changing any read result.
    */
  def deleteMorKeys(spark: SparkSession, path: String, keys: DataFrame,
                    key: String): Int = deleteMorKeys(spark, path, keys, Seq(key))

  /** Composite-key [[deleteMorKeys]]. */
  def deleteMorKeys(spark: SparkSession, path: String, keys: DataFrame,
                    keyCols: Seq[String]): Int = {
    require(keyCols.nonEmpty, "at least one key column")
    val base = currentVersion(path)
    val matched = read(spark, path, Some(base)).select(keyCols.map(col): _*)
      .join(keys.select(keyCols.map(col): _*).na.drop("any", keyCols).distinct(),
        keyCols, "left_semi")
      .distinct()
    commitDeleteKeys(path, matched, base)
  }

  /** POSITIONAL merge-on-read delete (the Iceberg-v2 delete-file
    * shape): commit the (file, row-ordinal-range) positions of rows
    * matching `predicate` — no key column needed, no per-key sidecar
    * rows. Consecutive ordinals collapse into ranges, so the sidecar
    * is bounded by file-count × run-count: a wide predicate delete
    * (drop a language, a source, a date range — 10% of a 100 TB
    * table) costs a few ranges per touched file where the key-list
    * sidecar would materialize billions of keys and tax every
    * subsequent read with a giant anti-join. Zero data files written;
    * rows vanish from read/changes immediately; [[compact]] folds the
    * positions physically; time travel stays exact (old snapshots
    * don't reference the sidecar). Returns the new version (or the
    * current one unchanged when nothing matches).
    */
  def deleteMorWhere(spark: SparkSession, path: String, predicate: String): Int = {
    val base = currentVersion(path)
    val matched = readWithPos(spark, path, Some(base))
      .filter(coalesce(expr(predicate), lit(false)))
      .select(col("__file"), col("__pos"))
    commitPosRanges(spark, path, matched, base)
  }

  /** POSITIONAL MoR delete of the rows matching `keys` (semi-join on
    * the key frame's own columns) — the second half of the Iceberg-v2
    * "upsert = position-delete preimages + append postimages" shape.
    * Unlike [[deleteMorKeys]]'s KEY sidecar, which hides a key
    * everywhere — including rows APPENDED LATER, which is why
    * [[append]] must never be used to resurrect a key-sidecar-deleted
    * key — a positional sidecar pins exactly the rows that exist NOW,
    * so `deleteMorPosKeys(old keys)` then `append(new rows)` is a
    * rewrite-free upsert that stays correct under later appends of the
    * same keys. ([[IvfIndex.refresh]] is the in-repo consumer.)
    */
  def deleteMorPosKeys(spark: SparkSession, path: String, keys: DataFrame): Int = {
    val base = currentVersion(path)
    val matched = readWithPos(spark, path, Some(base))
      .join(broadcast(keys), keys.columns.toSeq, "left_semi")
      .select(col("__file"), col("__pos"))
    commitPosRanges(spark, path, matched, base)
  }

  /** ATOMIC MoR UPSERT — ONE commit carrying BOTH the positional
    * deletes of `keys`' current rows AND `adds` as new data files
    * (plus an optional `txn` watermark): the Iceberg-v2 snapshot shape
    * where delete files and data files land in the same snapshot.
    * Either everything is visible or nothing is — there is no crash
    * window with the preimages gone but the postimages absent (or
    * vice versa), unlike sequencing [[deleteMorPosKeys]] then
    * [[append]] as two commits. With `txn = (appId, v)` the whole
    * upsert is replay-idempotent per application (same gate as
    * [[append]]'s): a retried window whose watermark already committed
    * is a no-op, which is what lets a crash-interrupted incremental
    * maintainer ([[graft.ops.IvfIndex.refresh]]) detect "my table
    * write landed, only my derived state is missing" and repair
    * instead of double-applying. Empty `keys` degrades to a
    * transactional append; empty `adds` to a transactional positional
    * delete; both empty commits nothing (returns the current version).
    */
  def upsertMorPos(spark: SparkSession, path: String, keys: DataFrame,
                   adds: DataFrame, txn: Option[(String, Long)] = None,
                   maxRetries: Int = 5): Int = {
    txn.foreach { case (app, _) =>
      require(!app.exists(_.isWhitespace), s"txn appId must not contain whitespace: '$app'")
    }
    def replayed: Boolean = txn.exists { case (app, v) => txnVersion(path, app) >= v }
    if (replayed) return currentVersion(path)
    val fresh =
      if (adds.isEmpty) Seq.empty
      else writeDataWithStats(adds, path, partitionSpec(path))
    var attempts = 0
    while (true) {
      val base = currentVersion(path)
      if (replayed) return base // same-app concurrent writer won the race
      // positions recompute against each attempt's base: a concurrent
      // compact/cluster relocates rows, so the run ranges must be the
      // winner-snapshot's (withCommitRetry's serializable contract)
      val matched = readWithPos(spark, path, Some(base))
        .join(broadcast(keys), keys.columns.toSeq, "left_semi")
        .select(col("__file"), col("__pos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__file").orderBy("__pos")
      val ranges = matched
        .withColumn("__run", col("__pos") - row_number().over(w))
        .groupBy(col("__file"), col("__run"))
        .agg(min("__pos").as("__lo"), max("__pos").as("__hi"))
        .select("__file", "__lo", "__hi")
      val sidecar =
        if (matched.isEmpty) Seq.empty
        else writeData(ranges.coalesce(1), path)
      val kept = txn.fold(manifestLines(path, Some(base))) { case (app, _) =>
        manifestLines(path, Some(base))
          .filterNot(_.startsWith(TxnPrefix + app + " "))
      }
      val mark = txn.map { case (app, v) => s"$TxnPrefix$app $v" }.toSeq
      if (sidecar.isEmpty && fresh.isEmpty && mark.isEmpty) return base
      try return commit(path,
        kept ++ sidecar.map(PosDeletePrefix + _) ++ fresh ++ mark, base)
      catch {
        case e: ConcurrentCommitException =>
          attempts += 1
          if (attempts > maxRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def commitPosRanges(spark: SparkSession, path: String,
                              matched: DataFrame, base: Int): Int = {
    if (matched.isEmpty) return base
    // collapse consecutive ordinals into runs: pos - rank is constant
    // within a run (per file) — the classic gaps-and-islands grouping,
    // partitioned by file so no global sort
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__file").orderBy("__pos")
    val ranges = matched
      .withColumn("__run", col("__pos") - row_number().over(w))
      .groupBy(col("__file"), col("__run"))
      .agg(min("__pos").as("__lo"), max("__pos").as("__hi"))
      .select("__file", "__lo", "__hi")
    val sidecar = writeData(ranges.coalesce(1), path)
    commit(path, manifestLines(path, Some(base)) ++
      sidecar.map(PosDeletePrefix + _), base)
  }

  /** The logical snapshot with each row's physical address attached
    * (`__file` = `_metadata.file_path`, `__pos` = row ordinal) — what
    * [[deleteMorWhere]] filters. Key sidecars apply after projection
    * as in [[read]], so the positions of already-deleted rows never
    * re-commit.
    */
  private def readWithPos(spark: SparkSession, path: String,
                          asOf: Option[Int]): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(snapshotFiles(path, asOf): _*)
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
    val pos = applyPosDeletes(spark, raw, snapshotPositionDeletes(path, asOf))
    val projected = declaredSchema(path, asOf)
      .fold(pos)(projectDeclared(pos, _, keep = Seq("__file", "__pos")))
    applyKeyDeletes(spark, projected, snapshotDeletes(path, asOf))
  }

  private def commitDeleteKeys(path: String, matched: DataFrame, base: Int): Int = {
    if (matched.isEmpty) return base
    // sidecar key contract: every key sidecar of a table carries the
    // SAME column set — readers join on the sidecar's own columns, so
    // a drifting contract would silently join unrelated values
    val existing = snapshotDeletes(path, Some(base))
    if (existing.nonEmpty) {
      val cols = matched.sparkSession.read.parquet(existing.head).columns.toSeq
      require(cols.sorted == matched.columns.toSeq.sorted,
        s"delete-sidecar key contract violation: existing sidecars carry " +
          s"${cols.mkString("[", ", ", "]")}, this delete uses " +
          matched.columns.mkString("[", ", ", "]"))
    }
    val sidecar = writeData(matched.coalesce(1), path)
    commit(path, manifestLines(path, Some(base)) ++
      sidecar.map(DeletePrefix + _), base)
  }

  /** MERGE (upsert): rows in `updates` replace current rows with the
    * same `key`; unmatched update rows insert. Only data files whose
    * [min, max] key range intersects the update keys are rewritten —
    * every other file carries over by reference.
    */
  def merge(spark: SparkSession, path: String, updates: DataFrame, key: String): Int = {
    val base = currentVersion(path)
    val current = snapshotFiles(path, Some(base))
    val schema = declaredSchema(path, Some(base))
    val posDels = snapshotPositionDeletes(path, Some(base))
    // one key-column scan finds the files that contain matched keys —
    // the column-pruned generator analogue of footer-stat pruning.
    // The scan projects through the declared schema (rename lineage)
    // so `key` always means the DECLARED key column, whichever
    // physical name a file carries.
    val keys = updates.select(col(key)).distinct()
    val rawKeyed = spark.read.option("mergeSchema", "true").parquet(current: _*)
      .withColumn("__f", input_file_name())
    val keyed = schema.fold(rawKeyed)(projectDeclared(rawKeyed, _, keep = Seq("__f")))
    val touched = keyed
      .select(col("__f").as("f"), col(key))
      .join(broadcast(keys), key).select("f").distinct()
      .collect().map(_.getString(0)).toSet
    val isTouched = (f: String) => touched.exists(t => samePath(f, t))
    val untouched = current.filterNot(isTouched)
    val toRewrite = current.filter(isTouched)
    val pspec = partitionSpec(path, Some(base))
    val rewritten =
      if (toRewrite.isEmpty) writeDataWithStats(updates, path, pspec) // pure insert
      else {
        // mergeSchema: a touched set mixing pre- and post-evolution
        // files must not drop the added column from survivor rows.
        // Positionally-deleted rows are filtered BEFORE the rewrite —
        // reading them raw would resurrect them in the new file (its
        // fresh path makes the old range entries inert).
        val rawTouched = spark.read.option("mergeSchema", "true").parquet(toRewrite: _*)
        val logical0 = applyPosDeletes(spark, rawTouched, posDels)
        val logical = schema.fold(logical0)(projectDeclared(logical0, _))
        writeDataWithStats(logical
          .join(broadcast(keys), Seq(key), "left_anti") // survivors
          .unionByName(updates, allowMissingColumns = true), path, pspec)
      }
    // Merge-on-read key sidecars: an upserted key is LIVE again, so it
    // must leave the delete set (the update's row would otherwise
    // vanish at read). Surviving entries consolidate into one fresh
    // sidecar — merge doubles as sidecar compaction, bounding sidecar
    // count by the commits since the last merge/compact, not table
    // age. Sidecars keyed on something OTHER than the merge key
    // (composite-key deletes) carry over untouched: their deletes are
    // not addressed by this merge's key, so no un-delete applies.
    val sidecars = snapshotDeletes(path, Some(base))
    val delLines =
      if (sidecars.isEmpty) Seq.empty
      else if (spark.read.parquet(sidecars.head).columns.toSeq != Seq(key))
        sidecars.map(DeletePrefix + _)
      else {
        val remaining = spark.read.parquet(sidecars: _*).distinct()
          .join(broadcast(keys), Seq(key), "left_anti")
        if (remaining.isEmpty) Seq.empty
        else writeData(remaining.coalesce(1), path).map(DeletePrefix + _)
      }
    // Positional sidecars carry over: entries for carried files stay
    // live; entries for rewritten files point at paths no longer in
    // the manifest and are inert (compact retires them).
    commit(path, untouched ++ rewritten ++ delLines ++
      posDels.map(PosDeletePrefix + _) ++ specLines(path, base), base)
  }

  /** Implicit SCHEMA WIDENING: `merge` accepts updates with ADDED
    * columns — survivors and carried-over files keep their narrower
    * schema on disk and readers widen (`mergeSchema`), so old files
    * are never rewritten just to add a column. [[read]] always merges
    * schemas across the snapshot's files (nulls for pre-evolution
    * rows). Kept as the zero-ceremony path; the DECLARED evolution
    * contract below ([[addColumn]]/[[renameColumn]]/[[dropColumn]]/
    * [[widenColumn]]) adds manifest-tracked schema versions on top.
    */
  def readEvolved(spark: SparkSession, path: String, asOf: Option[Int] = None): DataFrame =
    read(spark, path, asOf)

  // ---------------------------------------------------------------
  // DECLARED SCHEMA EVOLUTION (round 11) — add / rename / drop /
  // widen as METADATA-ONLY commits: the manifest records the declared
  // schema (one `S` line, a StructType.json with rename lineage in
  // field metadata) and readers project every file through it. No
  // data file is ever rewritten for a schema change; old snapshots
  // keep their own schema line, so time travel and the change feed
  // show each version through the schema IT declared.
  // ---------------------------------------------------------------

  /** The declared schema at `base`, deriving one from the snapshot's
    * merged file schema on first evolution (metadata stripped — field
    * metadata is reserved for the rename lineage).
    */
  private def specOrDerived(spark: SparkSession, path: String, base: Int): types.StructType =
    declaredSchema(path, Some(base)).getOrElse(
      types.StructType(
        spark.read.option("mergeSchema", "true")
          .parquet(snapshotFiles(path, Some(base)): _*)
          .schema.fields.map(f => types.StructField(f.name, f.dataType))))

  /** All physical column names any snapshot file carries (current
    * names and renamed-away ones) — the collision domain for
    * [[addColumn]]/[[renameColumn]]. Names come from each footer
    * independently: schema-MERGE inference would throw on a widened
    * column's mixed physical types, and only the name set matters.
    */
  private def physicalCols(spark: SparkSession, path: String, base: Int): Set[String] =
    snapshotFiles(path, Some(base)).flatMap { f =>
      scala.util.Using.resource(org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f),
          new org.apache.hadoop.conf.Configuration()))) { r =>
        r.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSeq
      }
    }.toSet

  private def commitSchema(path: String, schema: types.StructType, base: Int): Int =
    commit(path,
      manifestLines(path, Some(base)).filterNot(_.startsWith(SchemaPrefix)) :+
        (SchemaPrefix + schema.json), base)

  /** All names any declared column's rename lineage still claims. A new
    * column may not take one of these: the read-side coalesce group for
    * the renamed column would silently absorb the new column's values
    * wherever the current name stores NULL (ADVICE r15, medium).
    */
  private def lineageCols(schema: types.StructType): Set[String] =
    schema.fields.iterator.flatMap(f =>
      if (f.metadata.contains("was")) f.metadata.getStringArray("was").toSeq
      else Seq.empty).toSet

  /** Schema with rename lineage dropped — committed by the full-rewrite
    * maintenance ops ([[compact]]/[[cluster]]): the rewrite emits every
    * row under the CURRENT names, so no surviving file carries a
    * renamed-away name and the lineage is dead weight that would
    * otherwise let a later [[addColumn]] re-introduce a lineage name
    * into live coalesce groups.
    */
  private[sinks] def stripLineage(schema: types.StructType): types.StructType =
    types.StructType(schema.fields.map { f =>
      if (!f.metadata.contains("was")) f
      else {
        val mb = new types.MetadataBuilder().withMetadata(f.metadata)
        mb.remove("was")
        f.copy(metadata = mb.build())
      }
    })

  /** [[specLines]] for a commit that REWRITES every data file under the
    * declared names: the schema line drops its rename lineage (see
    * [[stripLineage]]); partition/txn/stats lines carry unchanged.
    */
  private def specLinesRewritten(path: String, base: Int): Seq[String] =
    specLines(path, base).map { l =>
      if (!l.startsWith(SchemaPrefix)) l
      else SchemaPrefix + stripLineage(types.DataType
        .fromJson(l.stripPrefix(SchemaPrefix)).asInstanceOf[types.StructType]).json
    }

  /** ADD a column (type as a DDL string, e.g. "bigint", "decimal(12,2)").
    * Pre-evolution rows read null. The name must be genuinely new —
    * colliding with a physical column still present in any file (e.g.
    * a previously dropped or renamed-away name) would leak that old
    * data into the "new" column, so it fails loudly; [[compact]] first
    * to physically retire old names.
    */
  def addColumn(spark: SparkSession, path: String, name: String, ddl: String): Int =
    alterSchema(spark, path, Seq(SchemaChange.Add(name, ddl)))

  /** RENAME a column — metadata only. The field keeps its rename
    * lineage (`was`, newest first), so a snapshot mixing files written
    * under either name resolves per row; files are never rewritten.
    */
  def renameColumn(spark: SparkSession, path: String, from: String, to: String): Int =
    alterSchema(spark, path, Seq(SchemaChange.Rename(from, to)))

  /** DROP a column — metadata only; the data stays in old files
    * (invisible through the declared schema) until a rewrite retires
    * it. Re-adding the same name requires a [[compact]] first (see
    * [[addColumn]]).
    */
  def dropColumn(spark: SparkSession, path: String, name: String): Int =
    alterSchema(spark, path, Seq(SchemaChange.Drop(name)))

  /** WIDEN a column's declared type (int→long, float→double,
    * decimal precision growth — Iceberg's type-promotion lanes).
    * Readers cast every file's physical values to the declared type;
    * narrowing is refused (it would silently truncate old rows).
    */
  def widenColumn(spark: SparkSession, path: String, name: String, ddl: String): Int =
    alterSchema(spark, path, Seq(SchemaChange.Widen(name, ddl)))

  /** ATOMIC multi-change schema evolution: validate EVERY change against
    * the evolving declared schema, then commit ONCE — a later change
    * failing can never leave earlier changes durably applied (ADVICE
    * r15: per-change commits made a failed multi-change `ALTER TABLE`
    * a partially-applied DDL statement). All the single-change rules
    * hold per step: new names must not collide with declared names,
    * with names still physically present in any snapshot file, or with
    * any declared column's rename lineage (the coalesce-group leak);
    * widening must be an up-cast.
    */
  def alterSchema(spark: SparkSession, path: String,
                  changes: Seq[SchemaChange]): Int = {
    require(changes.nonEmpty, "alterSchema: no changes")
    val base = currentVersion(path)
    // computed lazily ONCE — only changes that introduce a name pay the
    // physical-schema listing
    lazy val phys = physicalCols(spark, path, base)
    def freshName(name: String, cur: types.StructType, what: String): Unit = {
      require(!cur.fieldNames.contains(name),
        s"$what: column $name already declared")
      require(!lineageCols(cur).contains(name),
        s"$what: column $name is still claimed by a renamed column's " +
          "lineage — compact to retire the lineage before reusing the name")
      require(!phys.contains(name),
        s"$what: column $name still exists physically in snapshot files " +
          "(dropped or renamed-away earlier) — compact before reusing the name")
    }
    val evolved = changes.foldLeft(specOrDerived(spark, path, base)) {
      case (cur, SchemaChange.Add(name, ddl)) =>
        freshName(name, cur, "ADD COLUMN")
        types.StructType(cur.fields :+
          types.StructField(name, types.DataType.fromDDL(ddl)))
      case (cur, SchemaChange.Rename(from, to)) =>
        require(cur.fieldNames.contains(from), s"no declared column $from")
        freshName(to, cur, "RENAME COLUMN")
        types.StructType(cur.fields.map { f =>
          if (f.name != from) f
          else {
            val was = if (f.metadata.contains("was")) f.metadata.getStringArray("was")
                      else Array.empty[String]
            types.StructField(to, f.dataType, f.nullable,
              new types.MetadataBuilder().withMetadata(f.metadata)
                .putStringArray("was", from +: was).build())
          }
        })
      case (cur, SchemaChange.Drop(name)) =>
        require(cur.fieldNames.contains(name), s"no declared column $name")
        types.StructType(cur.fields.filterNot(_.name == name))
      case (cur, SchemaChange.Widen(name, ddl)) =>
        val idx = cur.fieldNames.indexOf(name)
        require(idx >= 0, s"no declared column $name")
        val to = types.DataType.fromDDL(ddl)
        val from = cur.fields(idx).dataType
        require(org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to),
          s"cannot widen ${from.simpleString} to ${to.simpleString} (not an up-cast)")
        types.StructType(cur.fields.updated(idx, cur.fields(idx).copy(dataType = to)))
    }
    commitSchema(path, evolved, base)
  }

  /** COMPACT the current snapshot into `files` bin-packed data files —
    * a metadata-only change from the reader's view (same rows, new
    * manifest); old snapshots keep referencing the small files, so
    * time travel survives compaction. The maintenance half of the
    * format: merge keeps writes small, compact keeps reads fast.
    * Also FOLDS merge-on-read delete sidecars: the rewrite reads the
    * LOGICAL rows (sidecars applied) and the new manifest carries no
    * sidecar lines — physically retiring the deleted rows. Older
    * snapshots keep their sidecars, so time travel stays exact.
    * [[cluster]] folds identically (same read path).
    */
  def compact(spark: SparkSession, path: String, files: Int): Int = {
    val base = currentVersion(path)
    val rows = read(spark, path, Some(base)).coalesce(files)
    // folds D and P sidecars (the logical read applied them; no
    // sidecar lines carry over) and physically retires dropped /
    // renamed-away columns (the rewrite emits the declared schema).
    // Schema + partition spec lines carry forward, the schema with its
    // rename lineage STRIPPED — no surviving file carries an old name,
    // and live lineage would let addColumn re-introduce a lineage name
    // into the read-side coalesce groups (ADVICE r15).
    commit(path, writeDataWithStats(rows, path, partitionSpec(path, Some(base))) ++
      specLinesRewritten(path, base), base)
  }

  /** INCREMENTAL VIEW MAINTENANCE: refresh a grouped-aggregate
    * "materialized view" of this table from snapshot `fromV` (the
    * version `mv` was computed at) to `toV`, re-aggregating ONLY the
    * dirty groups. Dirty = any group appearing in a data file that the
    * window removed or added — a superset of the truly-changed groups
    * (rewrite survivors mark their group dirty too), which keeps the
    * rule correct for group-MOVING updates and deletes without
    * pre-image algebra, and correct for ANY aggregate (medians and
    * count-distincts refresh the same way as sums). Untouched groups
    * carry over from `mv` by reference; the recompute input is the
    * current snapshot semi-joined to the dirty set — a pushed-down
    * group filter that [[cluster]]-ed layouts turn into file pruning.
    * Work scales with the delta, not the table.
    *
    * `aggOf` computes the view from any subset of the base table and
    * must emit one row per `groupCol` value.
    *
    * Caveats: a layout-only rewrite ([[compact]]/[[cluster]]) inside
    * the window replaces every file, so EVERY group goes dirty and the
    * refresh degrades to a full recompute — schedule maintenance
    * immediately after an MV refresh, not between refreshes. The dirty
    * set's size follows the delta (no broadcast is forced here; AQE
    * picks the join strategy), and group joins are null-safe so a
    * NULL-keyed group refreshes like any other.
    */
  /** [[read]] restricted by [[prunedFilesIn]] manifest stats — the
    * dirty-literal recompute read the IVM refreshers use, and the
    * probe read [[graft.ops.IvfIndex]] uses for nprobe cell reads: on
    * a stats-declared clustered table the untouched files are skipped
    * WITHOUT opening their footers (manifest-level skipping, one tier
    * above parquet row-group stats). Falls back to the full snapshot
    * when stats are absent. Callers still apply their residual IN
    * filter, so pruning is purely IO.
    */
  def readPrunedIn(spark: SparkSession, path: String, column: String,
                   values: Seq[Any], asOf: Option[Int] = None): DataFrame = {
    val files = prunedFilesIn(spark, path, column, values, asOf)
    if (files.isEmpty) read(spark, path, asOf).limit(0)
    else readFiles(spark, path, files, asOf)
  }

  def incrementalAgg(spark: SparkSession, path: String, groupCol: String,
                     mv: DataFrame, fromV: Int, toV: Int,
                     dirtyLiteralMax: Int = 1024)
                    (aggOf: DataFrame => DataFrame): DataFrame = {
    require(fromV <= toV, s"fromV=$fromV must be <= toV=$toV")
    dirtyGroupsOf(spark, path, groupCol, fromV, toV, dirtyLiteralMax) match {
      case None => mv
      case Some(dirty) =>
        refreshDirty(spark, mv, dirty, groupCol, dirtyLiteralMax,
          lits => aggOf(readPrunedIn(spark, path, groupCol, lits, Some(toV))
            .filter(col(groupCol).isin(lits: _*))),
          d => aggOf(read(spark, path, Some(toV))
            .join(d, col(groupCol) <=> col("__dirty_g"), "left_semi")))
    }
  }

  /** The dirty-group discovery shared by [[incrementalAgg]] and
    * [[incrementalJoin]]: groups touched by the version window's data
    * file delta plus the groups of rows its new key/positional delete
    * sidecars removed (always a SUPERSET of truly-changed groups —
    * extra recompute, never staleness). None ⇔ the window changed
    * nothing.
    */
  private def dirtyGroupsOf(spark: SparkSession, path: String,
                            groupCol: String, fromV: Int, toV: Int,
                            dirtyLiteralMax: Int = 1024): Option[DataFrame] = {
    val fromFiles = snapshotFiles(path, Some(fromV))
    val toFiles = snapshotFiles(path, Some(toV))
    val delta = fromFiles.diff(toFiles) ++ toFiles.diff(fromFiles)
    // A merge-on-read delete commit moves NO data files — its dirty
    // groups come from the sidecar diff instead: the groups of the
    // fromV rows whose keys (or positions) the window's new sidecars
    // deleted. (A superset is fine, as with rewrite survivors: sidecar
    // consolidation re-flags still-deleted keys whose rows no longer
    // join — extra recompute, never staleness.)
    val newSidecars = snapshotDeletes(path, Some(toV))
      .diff(snapshotDeletes(path, Some(fromV)))
    val newPos = snapshotPositionDeletes(path, Some(toV))
      .diff(snapshotPositionDeletes(path, Some(fromV)))
    if (delta.isEmpty && newSidecars.isEmpty && newPos.isEmpty) return None
    val toSchema = declaredSchema(path, Some(toV))
    def projected(df: DataFrame): DataFrame = toSchema.fold(df)(projectDeclared(df, _))
    val fileDirty = if (delta.isEmpty) None else Some(
      projected(spark.read.option("mergeSchema", "true").parquet(delta: _*))
        .select(col(groupCol).as("__dirty_g")).distinct())
    val delDirty = if (newSidecars.isEmpty) None else {
      val dk = spark.read.parquet(newSidecars: _*).distinct()
      val kcols = dk.columns.toSeq
      val fromRows = read(spark, path, Some(fromV))
      val matched =
        if (kcols.size == 1) {
          val k = kcols.head
          // small delete sets become a literal In for the same
          // footer-pruning reason as the dirty-key recompute below
          val keys = dk.limit(dirtyLiteralMax + 1).collect().map(_.get(0))
          if (keys.length <= dirtyLiteralMax && !keys.contains(null))
            fromRows.filter(col(k).isin(keys.toIndexedSeq: _*))
          else fromRows.join(dk.withColumnRenamed(k, "__del_k"),
            col(k) === col("__del_k"), "left_semi")
        } else {
          val renamed = kcols.foldLeft(dk)((d, c) => d.withColumnRenamed(c, s"__del_$c"))
          fromRows.join(renamed,
            kcols.map(c => col(c) === col(s"__del_$c")).reduce(_ && _), "left_semi")
        }
      Some(matched.select(col(groupCol).as("__dirty_g")).distinct())
    }
    // positional sidecar diff: the deleted rows live in files that
    // never moved — address them by (file, ordinal) against fromV
    val posDirty = if (newPos.isEmpty) None else {
      val rawFrom = spark.read.option("mergeSchema", "true").parquet(fromFiles: _*)
      Some(projected(keepPosDeleted(spark, rawFrom, newPos))
        .select(col(groupCol).as("__dirty_g")).distinct())
    }
    Some(Seq(fileDirty, delDirty, posDirty).flatten
      .reduce(_ unionByName _).distinct())
  }

  /** The carry-over/recompute split shared by the view refreshers.
    * Small dirty sets become a LITERAL In predicate instead of a
    * semi-join: a literal reaches the parquet footers, so on a layout
    * clustered/sorted by the group column the recompute SKIPS the
    * untouched files entirely (ScaleBench `ivm` measures the
    * difference) — a semi-join can never file-prune. Null keys fall
    * back to the null-safe join path.
    */
  private def refreshDirty(spark: SparkSession, mv: DataFrame,
                           dirty: DataFrame, groupCol: String,
                           dirtyLiteralMax: Int,
                           freshOfLits: Seq[Any] => DataFrame,
                           freshOfSet: DataFrame => DataFrame): DataFrame = {
    val keys = dirty.limit(dirtyLiteralMax + 1).collect().map(_.get(0))
    if (keys.length <= dirtyLiteralMax && !keys.contains(null)) {
      val lits = keys.toIndexedSeq
      mv.filter(col(groupCol).isNull || !col(groupCol).isin(lits: _*))
        .unionByName(freshOfLits(lits))
    } else {
      mv.join(dirty, col(groupCol) <=> col("__dirty_g"), "left_anti")
        .unionByName(freshOfSet(dirty))
    }
  }

  /** INCREMENTALLY-MAINTAINED JOIN VIEW (round 11) — the KTable⋈KTable
    * analogue next to [[incrementalAgg]]'s grouped-aggregate views:
    * refresh a materialized view computed by `joinOf(a, b)` over the
    * two tables' snapshots when EITHER side advances, recomputing ONLY
    * the rows of dirty join keys. `joinOf` must be KEY-LOCAL: its
    * output carries `key`, and a key's output rows depend only on the
    * two sides' rows with that key (any inner/left/full equi-join
    * shape qualifies; so do key-local aggregations of one). Dirty keys
    * from each side discover exactly as in [[incrementalAgg]] (file
    * delta + key/positional sidecar diffs — a superset, never stale);
    * clean keys carry over from `mv` by reference; the recompute reads
    * both CURRENT snapshots filtered to the dirty keys (literal-IN
    * file pruning when small). A key deleted from both sides leaves
    * the view (joinOf of empty inputs emits nothing). Work scales with
    * the delta on either side, not with either table.
    */
  def incrementalJoin(spark: SparkSession, pathA: String, pathB: String,
                      key: String, mv: DataFrame,
                      fromA: Int, toA: Int, fromB: Int, toB: Int,
                      dirtyLiteralMax: Int = 1024)
                     (joinOf: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    require(fromA <= toA && fromB <= toB,
      s"version windows must be forward: A $fromA->$toA, B $fromB->$toB")
    val dA = dirtyGroupsOf(spark, pathA, key, fromA, toA, dirtyLiteralMax)
    val dB = dirtyGroupsOf(spark, pathB, key, fromB, toB, dirtyLiteralMax)
    if (dA.isEmpty && dB.isEmpty) return mv
    val dirty = (dA.toSeq ++ dB.toSeq).reduce(_ unionByName _).distinct()
    def a = read(spark, pathA, Some(toA))
    def b = read(spark, pathB, Some(toB))
    refreshDirty(spark, mv, dirty, key, dirtyLiteralMax,
      lits => joinOf(
        readPrunedIn(spark, pathA, key, lits, Some(toA))
          .filter(col(key).isin(lits: _*)),
        readPrunedIn(spark, pathB, key, lits, Some(toB))
          .filter(col(key).isin(lits: _*))),
      d => joinOf(a.join(d, col(key) <=> col("__dirty_g"), "left_semi"),
                  b.join(d, col(key) <=> col("__dirty_g"), "left_semi")))
  }

  /** INCREMENTALLY-MAINTAINED FOREIGN-KEY JOIN VIEW — the KIP-213
    * KTable⋈KTable FK-join analogue, completing [[incrementalJoin]]
    * (which requires a SHARED key). Here the view is keyed by the FACT
    * key while the join runs on `fact.fkCol = dim.dimKey`: a dim-side
    * update dirties fact rows whose join key is NOT the dirty key, so
    * dim dirty keys must first map through a fact-side FK scan to the
    * fact keys whose view rows recompute — KIP-213's "subscription"
    * inverse index, expressed as one key/FK-column scan of the current
    * fact snapshot (literal-IN pruned when the dim delta is small, so
    * a fact layout [[cluster]]-ed by `fkCol` turns it into file
    * skipping). Fact-side dirty keys discover exactly as in
    * [[incrementalAgg]].
    *
    * `joinOf(factSlice, dimSlice)` must be FACT-KEY-LOCAL: its output
    * carries `factKey`, and a fact key's output rows depend only on
    * that key's fact rows plus the dim rows they reference (inner and
    * left equi-joins on the FK qualify; the dim slice passed in is
    * always a superset of the referenced rows, restricted for IO, so
    * `joinOf` must not depend on unreferenced dim rows).
    *
    * Scale contract: refresh work is O(dim-delta × fan-out +
    * fact-delta), never O(fact table) — the property that makes a
    * daily-changing dimension against a 100 TB fact table maintainable
    * (ScaleBench `fkj` measures it). A dim key deleted in the window
    * dirties exactly its referencing fact keys (found in the CURRENT
    * fact snapshot; fact rows that moved off the key in the same
    * window are fact-side dirty already).
    */
  def incrementalJoinFk(spark: SparkSession, factPath: String, dimPath: String,
                        factKey: String, fkCol: String, dimKey: String,
                        mv: DataFrame,
                        fromF: Int, toF: Int, fromD: Int, toD: Int,
                        dirtyLiteralMax: Int = 1024)
                       (joinOf: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    require(fromF <= toF && fromD <= toD,
      s"version windows must be forward: fact $fromF->$toF, dim $fromD->$toD")
    val dF = dirtyGroupsOf(spark, factPath, factKey, fromF, toF, dirtyLiteralMax)
    val dDim = dirtyGroupsOf(spark, dimPath, dimKey, fromD, toD, dirtyLiteralMax)
    if (dF.isEmpty && dDim.isEmpty) return mv
    def fact = read(spark, factPath, Some(toF))
    def dim = read(spark, dimPath, Some(toD))
    // dim dirty keys → referencing fact keys, through the fact side's
    // FK column (the KIP-213 subscription step). NULL FKs reference no
    // dim row and are never dirtied from the dim side.
    val fkMapped: Option[DataFrame] = dDim.map { dd =>
      val keys = dd.limit(dirtyLiteralMax + 1).collect().map(_.get(0))
      val touched =
        if (keys.length <= dirtyLiteralMax && !keys.contains(null))
          readPrunedIn(spark, factPath, fkCol, keys.toIndexedSeq, Some(toF))
            .filter(col(fkCol).isin(keys.toIndexedSeq: _*))
        else fact.join(dd, col(fkCol) <=> col("__dirty_g"), "left_semi")
      touched.select(col(factKey).as("__dirty_g")).distinct()
    }
    // delta-sized by contract; checkpoint breaks the FK-scan lineage so
    // the carry-over anti-join and the recompute REUSE the key set
    // instead of re-scanning the fact table once per consumer
    val dirty = (dF.toSeq ++ fkMapped.toSeq).reduce(_ unionByName _).distinct()
      .localCheckpoint()
    // the dim slice a dirty fact slice needs: only the dim rows its FK
    // values reference (literal-IN when small — footer pruning on a
    // dim clustered by its key)
    def dimOf(f: DataFrame): DataFrame = {
      val fks = f.select(col(fkCol)).na.drop().distinct()
        .limit(dirtyLiteralMax + 1).collect().map(_.get(0))
      if (fks.length <= dirtyLiteralMax)
        readPrunedIn(spark, dimPath, dimKey, fks.toIndexedSeq, Some(toD))
          .filter(col(dimKey).isin(fks.toIndexedSeq: _*))
      else dim.join(f.select(col(fkCol).as("__fk")).na.drop().distinct(),
        col(dimKey) === col("__fk"), "left_semi")
    }
    // the dirty fact slice is delta-sized too: checkpoint it so
    // dimOf's FK-value discovery and the join both read the slice, not
    // the fact table again
    refreshDirty(spark, mv, dirty, factKey, dirtyLiteralMax,
      lits => { val f = readPrunedIn(spark, factPath, factKey, lits, Some(toF))
                  .filter(col(factKey).isin(lits: _*)).localCheckpoint()
                joinOf(f, dimOf(f)) },
      d => { val f = fact.join(d, col(factKey) <=> col("__dirty_g"), "left_semi")
               .localCheckpoint()
             joinOf(f, dimOf(f)) })
  }

  /** Z-ORDER CLUSTER the current snapshot: rewrite the data files so
    * each covers a tight range in EVERY clustering column, not just a
    * leading sort column — the layout that makes min/max footer
    * pruning (Spark skips row groups whose stats exclude the
    * predicate) effective for multi-dimensional filters. A linear sort
    * prunes only its leading column; interleaving the rank-normalized
    * bits of all clustering columns (the Z curve) gives every column
    * ~√-fraction file spans, so a selective predicate on ANY of them
    * skips most files.
    *
    * Like [[compact]] this is metadata-level from the reader's view:
    * same rows, new manifest; old snapshots keep the old layout for
    * time travel. Columns must be numeric (or numeric-castable);
    * values MIN/MAX-normalize via the 1-row broadcast — a single
    * extreme outlier therefore compresses the rest of that column's
    * domain into few distinct quantiles and weakens its pruning
    * (clip or bucket such columns first; true rank normalization
    * would need a per-column quantile pass). The z-value is
    * computed per row in one codegen projection and the only shuffle
    * is the range partition into `files` output files.
    */
  def cluster(spark: SparkSession, path: String, files: Int,
              zcols: Seq[String]): Int = {
    require(zcols.nonEmpty && zcols.size <= 3, "1-3 clustering columns")
    val base = currentVersion(path)
    val df = read(spark, path, Some(base))
    val n = zcols.size
    val bits = math.min(20, 62 / n)
    val scale = (1L << bits) - 1
    val aggs = zcols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__mn_$c"),
      max(col(c)).cast("double").as(s"__mx_$c")))
    val mm = df.agg(aggs.head, aggs.tail: _*)
    val normed = zcols.zipWithIndex.foldLeft(df.crossJoin(broadcast(mm))) {
      case (acc, (c, k)) =>
        acc.withColumn(s"__q$k",
          when(col(s"__mx_$c") > col(s"__mn_$c"),
            (col(c).cast("double") - col(s"__mn_$c")) /
              (col(s"__mx_$c") - col(s"__mn_$c")) * scale)
            .otherwise(lit(0.0)).cast("long"))
    }
    // interleave: bit i of column k lands at position i·n + k
    val zParts = (0 until n).map(k =>
      s"aggregate(sequence(0, ${bits - 1}), 0L, " +
        s"(acc, i) -> acc | shiftleft(shiftright(__q$k, i) & 1, i * $n + $k))")
    val clustered = normed
      .withColumn("__z", expr(zParts.mkString("(", ") | (", ")")))
      .repartitionByRange(files, col("__z"))
      .drop(("__z" +: (0 until n).map(s"__q" + _)) ++
        zcols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
    commit(path, writeDataWithStats(clustered, path, partitionSpec(path, Some(base))) ++
      specLinesRewritten(path, base), base)
  }

  /** DELETE rows matching `predicate`: rewrite only files containing
    * matches; the rest carry over. SQL DELETE semantics: a row is
    * deleted only where the predicate is TRUE — rows where it
    * evaluates NULL are KEPT, on both the touched-file scan and the
    * survivor rewrite (the same three-valued coalesce on both sides,
    * so the result is independent of which file a row happens to
    * live in).
    */
  def delete(spark: SparkSession, path: String, predicate: String): Int = {
    val base = currentVersion(path)
    val current = snapshotFiles(path, Some(base))
    val schema = declaredSchema(path, Some(base))
    val posDels = snapshotPositionDeletes(path, Some(base))
    val deleteCond = coalesce(expr(predicate), lit(false))
    // touched-file detection on the projected raw rows (predicate
    // names declared columns); already-deleted rows may over-flag a
    // file — an extra rewrite, never a wrong result
    val raw0 = spark.read.option("mergeSchema", "true").parquet(current: _*)
      .withColumn("__f", input_file_name())
    val probe = schema.fold(raw0)(projectDeclared(raw0, _, keep = Seq("__f")))
    val touched = probe.filter(deleteCond)
      .select(col("__f").as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    val untouched = current.filterNot(f => touched.exists(t => samePath(f, t)))
    val toRewrite = current.filter(f => touched.exists(t => samePath(f, t)))
    val files =
      if (toRewrite.isEmpty) untouched
      else {
        // rewrite from the LOGICAL rows w.r.t. positional sidecars: a
        // raw read would resurrect positionally-deleted rows in the new
        // file (whose fresh path old range entries can't address)
        val rawT = spark.read.option("mergeSchema", "true").parquet(toRewrite: _*)
        val logical0 = applyPosDeletes(spark, rawT, posDels)
        val logical = schema.fold(logical0)(projectDeclared(logical0, _))
        untouched ++ writeDataWithStats(logical.filter(not(deleteCond)), path,
          partitionSpec(path, Some(base)))
      }
    // MoR key sidecars carry over untouched: a sidecar-deleted row
    // stays deleted whether or not its physical row also matched here.
    // Positional entries for carried files stay live; entries for
    // rewritten files are inert (path left the manifest).
    commit(path, files ++
      snapshotDeletes(path, Some(base)).map(DeletePrefix + _) ++
      posDels.map(PosDeletePrefix + _) ++ specLines(path, base), base)
  }

  /** UPDATE rows matching `predicate`: apply `sets` (column → new
    * value, evaluated against the OLD row — all assignments are
    * simultaneous, so `SET a = b, b = a` swaps) and rewrite only the
    * files containing matches; every other file carries over by
    * reference, so the write cost is proportional to the TOUCHED data,
    * not the table. SQL UPDATE semantics throughout: a row changes
    * only where the predicate is TRUE (NULL keeps the row unchanged —
    * the same three-valued coalesce on the touched-file probe and the
    * rewrite, so the result is independent of file placement), and
    * each assignment casts back to the column's declared type.
    *
    * MoR interaction: positional sidecars are honored on the rewrite
    * (delete()'s discipline — carried files keep their entries live,
    * rewritten files leave theirs inert) and key-delete sidecars carry
    * over, which is only sound while no assignment TARGETS a sidecar
    * key column — rewriting a hidden row's key out from under the
    * sidecar would resurrect it, and rewriting a live row's key ONTO a
    * deleted key would silently hide it. That combination is rejected
    * loudly; `compact` folds the sidecars first.
    *
    * Returns the new version, or the current one unchanged when no
    * row matches (no version churn on a no-op).
    */
  def update(spark: SparkSession, path: String, predicate: Column,
             sets: Seq[(String, Column)]): Int = {
    require(sets.nonEmpty, "UPDATE needs at least one SET assignment")
    require(sets.map(_._1).distinct.lengthCompare(sets.length) == 0,
      "UPDATE SET assigns a column twice: " +
        sets.map(_._1).diff(sets.map(_._1).distinct).mkString(", "))
    val base = currentVersion(path)
    val current = snapshotFiles(path, Some(base))
    val schema = declaredSchema(path, Some(base))
    val posDels = snapshotPositionDeletes(path, Some(base))
    val keyDels = snapshotDeletes(path, Some(base))
    if (keyDels.nonEmpty) {
      val sidecarCols = spark.read.parquet(keyDels.head).columns.toSet
      val clash = sets.map(_._1).filter(sidecarCols.contains)
      require(clash.isEmpty,
        s"UPDATE SET targets delete-sidecar key column(s) " +
          s"${clash.mkString(", ")} — moving rows across the sidecar's " +
          "key-hiding contract could resurrect deleted rows or hide live " +
          "ones; fold the sidecars (compact) first")
    }
    val updateCond = coalesce(predicate, lit(false))
    val raw0 = spark.read.option("mergeSchema", "true").parquet(current: _*)
      .withColumn("__f", input_file_name())
    val probe = schema.fold(raw0)(projectDeclared(raw0, _, keep = Seq("__f")))
    val missing = sets.map(_._1).filterNot(n => probe.columns.contains(n))
    require(missing.isEmpty,
      s"UPDATE SET on unknown column(s) ${missing.mkString(", ")} — table " +
        s"columns are ${probe.columns.filterNot(_ == "__f").mkString("[", ", ", "]")}")
    val touched = probe.filter(updateCond)
      .select(col("__f").as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    if (touched.isEmpty) return base
    val untouched = current.filterNot(f => touched.exists(t => samePath(f, t)))
    val toRewrite = current.filter(f => touched.exists(t => samePath(f, t)))
    // rewrite from the LOGICAL rows w.r.t. positional sidecars (same
    // reason as delete(): a raw read would resurrect positionally-
    // deleted rows into the new file)
    val rawT = spark.read.option("mergeSchema", "true").parquet(toRewrite: _*)
    val logical0 = applyPosDeletes(spark, rawT, posDels)
    val logical = schema.fold(logical0)(projectDeclared(logical0, _))
    val byName = sets.toMap
    val out = logical.select(logical.schema.fields.map { f =>
      byName.get(f.name) match {
        case Some(v) =>
          when(updateCond, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
        case None => col(f.name)
      }
    }.toIndexedSeq: _*)
    val files = untouched ++
      writeDataWithStats(out, path, partitionSpec(path, Some(base)))
    commit(path, files ++ keyDels.map(DeletePrefix + _) ++
      posDels.map(PosDeletePrefix + _) ++ specLines(path, base), base)
  }

  /** String-expression convenience for [[update]] (the API twin of
    * [[delete]]'s predicate-string face).
    */
  def update(spark: SparkSession, path: String, predicate: String,
             sets: Seq[(String, String)])(implicit d: DummyImplicit): Int =
    update(spark, path, expr(predicate), sets.map { case (c, e) => (c, expr(e)) })

  /** CHANGE FEED (CDC-out): row-level changes between two snapshots —
    * `_change_type` ∈ insert / update (postimage) / delete (preimage),
    * plus `_commit_version = toV`. The copy-on-write layout makes this
    * cheap by construction: a file carried over between manifests
    * cannot contain a change, so only the manifest DIFFERENCE is read
    * (removed files = candidate deletes/preimages, added files =
    * candidate inserts/postimages), then one key-outer-join classifies
    * rows and a null-safe struct compare drops survivor rows that were
    * rewritten with identical content (merge rewrites whole touched
    * files, so most rewritten rows are unchanged). At 100 TB the scan
    * is proportional to the CHANGED partitions, never the table —
    * the same property merge itself has.
    *
    * Requires `key`-unique snapshots (the same contract merge keeps).
    * Works across schema evolution: both sides widen to the union
    * column set (nulls for pre-evolution rows).
    */
  def changes(spark: SparkSession, path: String, key: String,
              fromV: Int, toV: Int): DataFrame = {
    require(fromV <= toV, s"fromV=$fromV must be <= toV=$toV")
    val fromFiles = snapshotFiles(path, Some(fromV))
    val toFiles = snapshotFiles(path, Some(toV))
    val removed = fromFiles.filterNot(toFiles.contains)
    val added = toFiles.filterNot(fromFiles.contains)
    val carried = fromFiles.filter(toFiles.contains)
    // the feed presents every row through toV's DECLARED schema, so a
    // CDC consumer sees one column set across an evolution commit
    // (renames resolve through lineage, drops vanish, adds are null on
    // preimages)
    val toSchema = declaredSchema(path, Some(toV))
    def projected(df: DataFrame): DataFrame = toSchema.fold(df)(projectDeclared(df, _))
    def rd(fs: Seq[String]): Option[DataFrame] =
      if (fs.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(fs: _*))
    // Merge-on-read sidecars: each side of the compare must see the
    // LOGICAL rows of its version. The preimage side drops rows already
    // deleted at fromV and ADDS the carried-file rows whose keys (or
    // positions) the window's sidecars newly deleted (their data files
    // never moved — the whole point of deleteMor — so the file diff
    // alone would miss them); the postimage side drops rows deleted at
    // toV. A key reinserted after a MoR delete then classifies as
    // `insert` (its preimage wasn't visible at fromV) — the
    // semantically right call.
    def delKeys(fs: Seq[String]): Option[DataFrame] =
      if (fs.isEmpty) None else Some(spark.read.parquet(fs: _*).distinct())
    val fromDel = delKeys(snapshotDeletes(path, Some(fromV)))
    val toDel = delKeys(snapshotDeletes(path, Some(toV)))
    val newDel = (fromDel, toDel) match {
      case (_, None)          => None
      case (None, Some(t))    => Some(t)
      case (Some(f), Some(t)) => Some(t.except(f))
    }
    // join on the SIDECAR'S OWN column names (composite keys on all of
    // them) — never the caller's `key`, which classifies the feed but
    // need not be the delete key (ADVICE r10: a mismatched caller key
    // silently anti-joined unrelated values)
    def applyDel(df: DataFrame, del: Option[DataFrame], anti: Boolean): DataFrame =
      del match {
        case None => df
        case Some(dk) =>
          val kcols = dk.columns.toSeq
          val missing = kcols.filterNot(df.columns.contains)
          require(missing.isEmpty,
            s"delete-sidecar key column(s) ${missing.mkString(", ")} not in " +
              s"the change-feed schema ${df.columns.mkString("[", ", ", "]")}")
          val renamed = kcols.foldLeft(dk)((d, c) => d.withColumnRenamed(c, s"__del_$c"))
          df.join(renamed,
            kcols.map(c => col(c) === col(s"__del_$c")).reduce(_ && _),
            if (anti) "left_anti" else "left_semi")
      }
    val fromPos = snapshotPositionDeletes(path, Some(fromV))
    val toPos = snapshotPositionDeletes(path, Some(toV))
    val newPos = toPos.diff(fromPos)
    // The carried-file preimage scan is the one piece not bounded by
    // the manifest diff (deleteMor's whole point is that the files
    // never moved) — so, exactly like incrementalAgg's dirty keys,
    // small single-column delete sets become a LITERAL In predicate
    // that reaches the parquet footers and prunes carried files a
    // key-clustered layout never touches; composite keys (and a
    // pathological backlog) pay the semi-join scan of the carried
    // files' key columns only.
    val carriedKeyDeleted = newDel.flatMap { dk =>
      rd(carried).map { c0 =>
        val c = projected(applyPosDeletes(spark, c0, fromPos))
        val kcols = dk.columns.toSeq
        if (kcols.size == 1) {
          val keys = dk.limit(1025).collect().map(_.get(0))
          if (keys.length <= 1024 && !keys.contains(null))
            c.filter(col(kcols.head).isin(keys.toIndexedSeq: _*))
          else applyDel(c, Some(dk), anti = false)
        } else applyDel(c, Some(dk), anti = false)
      }
    }
    // carried-file preimages newly POSITION-deleted: addressed by
    // (file, ordinal) — visible at fromV unless already deleted there
    val carriedPosDeleted =
      if (newPos.isEmpty) None
      else rd(carried).map(c0 => projected(keepPosDeleted(spark, c0, newPos)))
    val sides = (
      rd(removed).map(r => applyDel(projected(applyPosDeletes(spark, r, fromPos)),
        fromDel, anti = true)),
      rd(added).map(r => applyDel(projected(applyPosDeletes(spark, r, toPos)),
        toDel, anti = true)))
    val carriedPieces = carriedKeyDeleted.toSeq ++ carriedPosDeleted.toSeq
    val pieces = Seq(sides._1, sides._2).flatten ++ carriedPieces
    if (pieces.isEmpty || (sides._1.isEmpty && sides._2.isEmpty &&
          carriedPieces.forall(_.isEmpty)))
      // identical manifests and no newly-deleted rows: no changes
      return read(spark, path, Some(toV))
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(toV))
        .limit(0)
    // union column set, key first, deterministic order
    val cols: Seq[String] =
      pieces.flatMap(_.columns.toSeq).distinct
    def conform(df: DataFrame): DataFrame =
      df.select(cols.map(c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)
    val payload = cols.filterNot(_ == key)
    def toSide(df: DataFrame, name: String): DataFrame =
      conform(df).select(col(key).as("__k"),
        struct(payload.map(col): _*).as(name))
    val oldPieces = (sides._1.toSeq ++ carriedPieces).map(toSide(_, "__old"))
    val oRaw = oldPieces.reduceOption(_ unionByName _)
      .getOrElse(toSide(pieces.head, "__old").limit(0))
      // a row both key- and position-deleted in the window must emit
      // ONE delete, not one per sidecar kind — but ONLY that case:
      // dedup on (key, payload) so the dual-sidecar copies of the SAME
      // row collapse while distinct preimage rows sharing a key (a
      // key-unique-contract violation — append ingests arbitrary rows)
      // survive to the loud check below instead of being silently
      // collapsed to one arbitrary delete/update
      .dropDuplicates("__k", "__old")
    val kWin = org.apache.spark.sql.expressions.Window.partitionBy("__k")
    val o = oRaw
      .withColumn("__kdup", count(lit(1)).over(kWin))
      .withColumn("__old",
        when(col("__kdup") > 1, raise_error(concat(
          lit("CowTable.changes: multiple distinct preimage rows for key "),
          col("__k").cast("string"),
          lit(" — the table violates the key-unique contract"))).cast(
            oRaw.schema("__old").dataType))
          .otherwise(col("__old")))
      .drop("__kdup")
    val n = sides._2.map(toSide(_, "__new"))
      .getOrElse(toSide(pieces.head, "__new").limit(0))
    o.join(n, Seq("__k"), "full_outer")
      .withColumn("_change_type",
        when(col("__new").isNull, "delete")
          .when(col("__old").isNull, "insert")
          .when(col("__old") <=> col("__new"), "none") // rewritten, identical
          .otherwise("update"))
      .filter(col("_change_type") =!= "none")
      .select(Seq(col("__k").as(key)) ++ payload.map { c =>
        when(col("_change_type") === "delete", col(s"__old.$c"))
          .otherwise(col(s"__new.$c")).as(c)
      } ++ Seq(col("_change_type"), lit(toV).as("_commit_version")): _*)
  }

  /** MAINTENANCE: expire all but the newest `keepLast` snapshots.
    * Each manifest is self-contained (a full file list), so log
    * compaction here is retention: drop the old manifest files, then
    * vacuum data files referenced by NO surviving snapshot (including
    * orphans from losers of concurrent commits). Time travel remains
    * exact within the retained window. Returns
    * (expired manifests, vacuumed data files).
    */
  def expireSnapshots(path: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val vs = listVersions(path)
    val (old, kept) = vs.splitAt(math.max(0, vs.size - keepLast))
    // Live = files referenced by kept MAIN snapshots plus EVERY branch
    // snapshot: branches share the parent's data files by manifest
    // reference, so vacuuming only against main would delete data out
    // from under an unpublished branch.
    // full manifest lines: MoR delete sidecars are parquet files under
    // data/ too — a live snapshot's sidecars must survive the vacuum
    def liveOf(p: String, v: Int): Seq[String] =
      snapshotFiles(p, Some(v)) ++ snapshotDeletes(p, Some(v)) ++
        snapshotPositionDeletes(p, Some(v))
    val live = (kept.flatMap(v => liveOf(path, v)) ++
      listBranches(path).flatMap { b =>
        val bp = branchPath(path, b)
        listVersions(bp).flatMap(v => liveOf(bp, v))
      }).toSet
    old.foreach(v => Files.deleteIfExists(snapDir(path).resolve(s"v$v.json")))
    val dataRoot = Paths.get(path, "data")
    var vacuumed = 0
    if (Files.exists(dataRoot)) {
      Files.walk(dataRoot).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet") &&
          !live.contains(p.toString))
        .toList // materialize before deleting out from under the walk
        .foreach { p => Files.delete(p); vacuumed += 1 }
    }
    (old.size, vacuumed)
  }

  // ---------------------------------------------------------------
  // Branches — the WRITE-AUDIT-PUBLISH workflow (Iceberg's branch/WAP
  // pattern, expressed in this manifest model). A branch IS a CowTable
  // whose meta lives under `<path>/_branches/<name>` and whose v1
  // manifest references the PARENT's data files (manifests hold
  // absolute paths — forking is a metadata copy, zero data movement).
  // Every existing operator (read / merge / delete / changes /
  // compact / incremental agg) therefore works on a branch unchanged:
  // pass `branchPath(path, name)` wherever a table path goes. Branch
  // rewrites land new data files under the BRANCH's own data dir;
  // parent files are never mutated (copy-on-write all the way down).
  // ---------------------------------------------------------------

  /** ROLL BACK as a new commit: re-publish an old snapshot's file list
    * as the current version (the Iceberg `rollback`/Delta `RESTORE`
    * shape). History is preserved — the bad intermediate versions stay
    * time-travelable until [[expireSnapshots]]; nothing is rewritten.
    */
  def restore(path: String, toVersion: Int): Int =
    // FULL manifest lines, not just data files: restoring past a MoR
    // delete must re-publish the old sidecar set exactly (dropping the
    // sidecar lines would resurrect rows deleted BEFORE toVersion)
    commit(path, manifestLines(path, Some(toVersion)), currentVersion(path))

  /** SHALLOW CLONE (the Delta `CLONE ... SHALLOW` shape): create an
    * INDEPENDENT table at `dest` whose v1 manifest references the
    * source snapshot's data files and sidecars by absolute path — a
    * metadata copy, zero data movement, unlike [[createBranch]] not
    * tied to the parent's publish/drop lifecycle. Writes to the clone
    * land under the clone's own data dir (copy-on-write as always);
    * the source is never touched.
    *
    * The standing caveat every shallow-clone design shares: the SOURCE
    * does not know its files are referenced elsewhere, so a source-side
    * [[expireSnapshots]] that vacuums the cloned snapshot's files
    * breaks the clone. Use clones as short-lived dev/test sandboxes
    * inside the source's retention window, or [[compact]] the clone
    * (which rewrites every row into clone-owned files) to sever the
    * dependency.
    */
  def shallowClone(src: String, dest: String, asOf: Option[Int] = None): Int = {
    require(!exists(dest), s"clone destination $dest already exists")
    val v = asOf.getOrElse(currentVersion(src))
    Files.createDirectories(Paths.get(dest))
    commit(dest, manifestLines(src, Some(v)), 0)
  }

  def branchPath(path: String, name: String): String =
    Paths.get(path, "_branches", name).toString

  def listBranches(path: String): Seq[String] = {
    val d = Paths.get(path, "_branches")
    if (!Files.exists(d)) Seq.empty
    else Files.list(d).iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted
  }

  /** Fork a branch at the parent's CURRENT snapshot. Records the fork
    * version so [[publishBranch]] can enforce fast-forward-only.
    */
  def createBranch(path: String, name: String): Int = {
    val bp = branchPath(path, name)
    require(!exists(bp), s"branch $name already exists under $path")
    Files.createDirectories(Paths.get(bp))
    Files.write(Paths.get(bp, "_fork"),
      currentVersion(path).toString.getBytes(StandardCharsets.UTF_8))
    // full lines: the fork inherits the parent's MoR sidecars too
    commit(bp, manifestLines(path, None), 0)
  }

  /** The fork point recorded at [[createBranch]]. */
  def branchForkVersion(path: String, name: String): Int =
    new String(Files.readAllBytes(Paths.get(branchPath(path, name), "_fork")),
      StandardCharsets.UTF_8).trim.toInt

  /** PUBLISH: atomically fast-forward the parent to the branch's
    * current snapshot — the "P" of write-audit-publish, run after the
    * audit queries pass on the branch. Fast-forward-only: if the
    * parent advanced past the fork point, publishing would silently
    * drop those commits, so it fails and the caller re-branches or
    * rebases. The final hard-link commit keeps the no-clobber
    * guarantee even against a racing parent writer.
    *
    * Data files the BRANCH wrote (anything outside the parent's own
    * `data/` tree) are hard-linked into `data/` and the published
    * manifest references the relocated paths — so the parent never
    * depends on the branch directory, [[dropBranch]] after publish is
    * always safe, and parent-side vacuum ([[expireSnapshots]] walks
    * only `data/`) manages the published files like any others.
    * Hard links keep the branch's own manifests valid too (same
    * inode, two names) until the branch is dropped.
    */
  def publishBranch(path: String, name: String): Int = {
    val bp = branchPath(path, name)
    val fork = branchForkVersion(path, name)
    val cur = currentVersion(path)
    if (cur != fork)
      throw new IllegalStateException(
        s"publish conflict: $path advanced v$fork -> v$cur since branch " +
          s"'$name' forked; re-branch and replay the branch's changes")
    val parentData = Paths.get(path, "data").toString + "/"
    val relocDir = Paths.get(path, "data", s"publish-$name-${System.nanoTime()}")
    // Positional sidecars address rows by data-file PATH; relocating a
    // branch-written data file would orphan its position entries
    // (silent row resurrection). Key sidecars and positions on
    // PARENT-owned files are path-stable, so only the combination
    // below is unsafe — fail it loudly; compact folds the positions.
    val blines = manifestLines(bp, None)
    val branchData = blines.filterNot(isMetaLine).exists(f => !f.startsWith(parentData))
    val branchPos = blines.filter(_.startsWith(PosDeletePrefix))
      .map(_.stripPrefix(PosDeletePrefix)).exists(f => !f.startsWith(parentData))
    if (branchData && branchPos)
      throw new IllegalStateException(
        s"publish: branch '$name' carries positional delete sidecars alongside " +
          "branch-written data files; relocation would invalidate the " +
          "file-path-addressed positions — compact the branch first")
    // relocate data files AND every line that references them by path —
    // MoR sidecar lines (key + positional) and per-file stat lines
    // (C stats / B lookups / R row counts, whose `<file>\t<payload>`
    // keeps its payload around the relocated path). Pure spec lines
    // (schema, partition, txn watermarks, stats/lookup specs) carry
    // verbatim; the branch's own commit stamp never relocates —
    // commit() below stamps the publish itself.
    // one physical link per branch file even when multiple lines
    // reference it (its data line + its C/B/R lines): memoized target
    val linked = scala.collection.mutable.Map.empty[String, String]
    def relocate(f: String): String =
      if (f.startsWith(parentData)) f
      else linked.getOrElseUpdate(f, {
        Files.createDirectories(relocDir)
        val p = Paths.get(f)
        // stamp-dir prefix keeps names unique across branch write
        // batches; relocDir is freshly stamped per publish, so a name
        // collision is always a bug — let createLink throw
        // FileAlreadyExistsException loudly rather than silently
        // pointing the manifest at the first file's content.
        val target = relocDir.resolve(s"${p.getParent.getFileName}-${p.getFileName}")
        Files.createLink(target, p)
        target.toString
      })
    val relocated = manifestLines(bp, None)
      .filterNot(_.startsWith(WhenPrefix)).map { line =>
      if (line.startsWith(SchemaPrefix) || line.startsWith(PartitionPrefix) ||
          line.startsWith(TxnPrefix) || line.startsWith(StatsColsPrefix) ||
          line.startsWith(LookupPrefix)) line
      else {
        val prefix = Seq(DeletePrefix, PosDeletePrefix, StatsPrefix,
          BloomPrefix, RowsPrefix).find(line.startsWith).getOrElse("")
        val rest = line.stripPrefix(prefix)
        val tab = rest.indexOf('\t')
        val (f, payload) =
          if (tab >= 0) (rest.substring(0, tab), rest.substring(tab))
          else (rest, "")
        prefix + relocate(f) + payload
      }
    }
    commit(path, relocated, cur)
  }

  /** Drop a branch's metadata and directory (manifests, fork marker,
    * branch-written data files). Safe after [[publishBranch]]: publish
    * relocates every branch-written file the parent references into
    * the parent's `data/` tree, so nothing under `_branches/<name>`
    * is ever reachable from a parent manifest.
    */
  def dropBranch(path: String, name: String): Unit = {
    val bp = Paths.get(branchPath(path, name))
    if (Files.exists(bp))
      Files.walk(bp).iterator().asScala.toList.reverse.foreach(Files.delete)
  }

  // input_file_name() returns a file URI; manifests store plain paths
  private def samePath(manifest: String, uri: String): Boolean =
    uri.stripPrefix("file:").stripPrefix("//") == manifest ||
      uri.endsWith(manifest) || manifest.endsWith(uri.stripPrefix("file:"))
}

/** One declared-schema evolution step, the unit of
  * [[CowTable.alterSchema]]'s atomic multi-change commit (ALTER TABLE
  * with several clauses validates every step, then commits once).
  */
sealed trait SchemaChange
object SchemaChange {
  /** Type as a DDL string, e.g. "bigint", "decimal(12,2)". */
  final case class Add(name: String, ddl: String) extends SchemaChange
  final case class Rename(from: String, to: String) extends SchemaChange
  final case class Drop(name: String) extends SchemaChange
  /** Up-cast only (int→long, float→double, decimal growth). */
  final case class Widen(name: String, ddl: String) extends SchemaChange
}

/** One hidden-partitioning transform (the Iceberg partition-spec
  * shape): data lays out by a value DERIVED from a source column —
  * `day(ts)`, `bucket(16, id)` — under a synthetic directory column
  * (`p_day_ts=2024-01-01/`) that never appears in the data schema, so
  * queries keep filtering on the source column and the layout can
  * evolve without touching a reader. `n` parameterizes bucket /
  * truncate; 0 otherwise.
  */
/** Write-side z-order declaration: `bits` bits of each column's
  * clamped [mn, mx] normalization, interleaved. See
  * [[CowTable.setZorderColumns]].
  */
final case class ZOrderSpec(bits: Int, cols: Seq[(String, Double, Double)])

final case class PartitionTransform(src: String, kind: String, n: Int = 0) {
  require(PartitionTransform.Kinds.contains(kind), s"unknown transform kind '$kind'")
  require(kind != "bucket" && kind != "truncate" || n > 0,
    s"$kind transform needs n > 0")

  /** The synthetic directory-column name — prefixed so it can never
    * collide with a data column, and carrying the parameters so two
    * specs on the same source stay distinguishable in paths.
    */
  def name: String = kind match {
    case "identity"             => s"p_$src"
    case "bucket" | "truncate"  => s"p_$kind${n}_$src"
    case _                      => s"p_${kind}_$src"
  }

  /** The transform applied to an arbitrary column or literal — shared
    * verbatim by the writer (layout) and the pruner (predicate →
    * directory), which is what makes pruning safe. `dt` is the SOURCE
    * column's data type: the value is cast to it first, so a pruner
    * literal of a different numeric family (Int 5 against a DOUBLE
    * column) canonicalizes to the writer's directory string ("5.0")
    * instead of wrongly pruning on "5".
    *
    * Time transforms are session-timezone-INDEPENDENT (the Iceberg
    * contract): a TIMESTAMP is an absolute instant and resolves to its
    * UTC calendar day via epoch-second arithmetic; DATE / NTZ / date
    * strings are calendar values and resolve through epoch-day
    * functions (`year`/`month` on DateType never consult the session
    * zone). A writer and a pruner running under different
    * `spark.sql.session.timeZone` settings therefore compute the SAME
    * directory string — `date_format` on a session-zone-cast timestamp
    * would not, and would silently drop matching files.
    */
  def exprOf(c: Column, dt: types.DataType): Column = {
    val cv = c.cast(dt)
    kind match {
      case "identity" => cv
      case "day" | "month" | "year" =>
        val d = dt match {
          case types.TimestampType =>
            date_add(to_date(lit("1970-01-01")),
              floor(unix_seconds(cv) / lit(86400.0d)).cast("int"))
          case _ => cv.cast("date")
        }
        kind match {
          case "day"   => d.cast("string")
          // year is 4-digit zero-padded ("0099", matching the pre-v2
          // date_format("yyyy") writer and date-cast's own padding) —
          // an unpadded year would silently change directory strings
          // for ancient dates
          case "month" => concat(lpad(year(d).cast("string"), 4, "0"), lit("-"),
                                 lpad(month(d).cast("string"), 2, "0"))
          case _       => lpad(year(d).cast("string"), 4, "0")
        }
      // hash the CANONICAL STRING form: murmur3 is type-sensitive, so
      // hashing the raw value would bucket an Int literal differently
      // from a Long column — and the pruner (which evaluates this on a
      // caller-supplied literal) would then WRONGLY prune, not
      // under-prune
      case "bucket"   => pmod(hash(cv.cast("string")), lit(n))
      case "truncate" => floor(cv.cast("long") / n).cast("long") * n
    }
  }
}

object PartitionTransform {
  val Kinds: Set[String] = Set("identity", "day", "month", "year", "bucket", "truncate")

  /** Partition-spec SEMANTICS version, stamped into every encoded spec
    * line. v2 = session-timezone-independent time transforms with
    * 4-digit-padded years. A spec line WITHOUT the stamp (pre-v2
    * writer) may cover directories computed under a non-UTC session
    * zone / unpadded years, so the pruner treats its time transforms
    * as non-pruning (reads all files) — rewrite the table
    * ([[CowTable.cluster]]/[[CowTable.compact]], or re-declare via
    * [[CowTable.setPartitionSpec]] AFTER a rewrite) to re-enable
    * directory pruning. Re-declaring the same spec without rewriting
    * upgrades the stamp but NOT the old directories — don't.
    */
  val SpecV = 2L

  def identity(src: String): PartitionTransform = PartitionTransform(src, "identity")
  def day(src: String): PartitionTransform = PartitionTransform(src, "day")
  def month(src: String): PartitionTransform = PartitionTransform(src, "month")
  def year(src: String): PartitionTransform = PartitionTransform(src, "year")
  def bucket(n: Int, src: String): PartitionTransform = PartitionTransform(src, "bucket", n)
  def truncate(n: Int, src: String): PartitionTransform = PartitionTransform(src, "truncate", n)

  /** Manifest encoding rides Spark's own Metadata JSON (stable, no
    * extra dependency, single line).
    */
  def encode(ts: Seq[PartitionTransform]): String =
    new types.MetadataBuilder().putLong("specV", SpecV)
      .putMetadataArray("transforms", ts.map(t =>
        new types.MetadataBuilder()
          .putString("src", t.src).putString("kind", t.kind)
          .putLong("n", t.n.toLong).build()).toArray).build().json

  def decode(json: String): Seq[PartitionTransform] =
    types.Metadata.fromJson(json).getMetadataArray("transforms").toIndexedSeq
      .map(m => PartitionTransform(m.getString("src"), m.getString("kind"),
        m.getLong("n").toInt))

  /** The semantics version a spec line was written under (0 when the
    * line predates versioning — the pre-v2 writers).
    */
  def decodeVersion(json: String): Long =
    scala.util.Try(types.Metadata.fromJson(json).getLong("specV")).getOrElse(0L)
}
