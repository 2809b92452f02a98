package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** MERGE-ON-READ delete sidecars (round 10): a manifest line starting
    * with this prefix names a parquet file of DELETED KEYS (one column,
    * named after the table's merge key) rather than a data file. A
    * [[deleteMor]] commit adds one sidecar and carries every data file
    * over by reference — zero data-file writes, the property that makes
    * a daily GDPR delete affordable at 100 TB where the copy-on-write
    * [[delete]] would rewrite every key-intersecting file. Readers
    * apply the union of a snapshot's sidecars as an anti-join;
    * [[compact]]/[[cluster]] fold them into the data (their rewrite
    * reads the LOGICAL rows); [[merge]] un-deletes keys its batch
    * reinserts. Old manifests contain no such lines, so pre-round-10
    * tables read unchanged.
    */
  private val DeletePrefix = "D "

  private def manifestLines(path: String, asOf: Option[Int]): Seq[String] = {
    val v = asOf.getOrElse(currentVersion(path))
    val mf = snapDir(path).resolve(s"v$v.json")
    require(Files.exists(mf),
      s"version $v has no manifest under $path (never committed, or expired)")
    new String(Files.readAllBytes(mf), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).toSeq
  }

  /** DATA files constituting `asOf` (default: latest snapshot) —
    * delete sidecars excluded. Reads the requested manifest directly —
    * never lists the snapshot directory, so open cost is independent
    * of the table's commit count.
    */
  def snapshotFiles(path: String, asOf: Option[Int] = None): Seq[String] =
    manifestLines(path, asOf).filterNot(_.startsWith(DeletePrefix))

  /** The snapshot's merge-on-read delete sidecar files (often empty). */
  def snapshotDeletes(path: String, asOf: Option[Int] = None): Seq[String] =
    manifestLines(path, asOf).filter(_.startsWith(DeletePrefix))
      .map(_.stripPrefix(DeletePrefix))

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
    val tmp = d.resolve(s".v$v.${System.nanoTime()}.tmp")
    Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    try Files.createLink(d.resolve(s"v$v.json"), tmp)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      throw new ConcurrentCommitException(path, v)
    } finally Files.deleteIfExists(tmp)
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

  /** Write `df` into `dir` as new immutable data files; returns them. */
  private def writeData(df: DataFrame, path: String): Seq[String] = {
    val stamp = s"${System.nanoTime()}"
    val dir = Paths.get(path, "data", stamp)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dir.toString)
    Files.list(dir).iterator().asScala.map(_.toString)
      .filter(f => f.endsWith(".parquet") && !f.contains("_SUCCESS")).toSeq
  }

  /** Create the table: data files + manifest v1. */
  def create(df: DataFrame, path: String): Int =
    commit(path, writeData(df, path), base = (listVersions(path) :+ 0).max)

  /** Read a snapshot (latest, or `asOf` for time travel). Schemas are
    * merged across the snapshot's files so a snapshot mixing pre- and
    * post-evolution files never silently narrows to whichever file the
    * reader sampled first. Merge-on-read delete sidecars apply as an
    * anti-join on the key column they carry; a sidecar-free snapshot
    * (the overwhelmingly common case, and every pre-round-10 snapshot)
    * keeps the plain pruned scan plan.
    */
  def read(spark: SparkSession, path: String, asOf: Option[Int] = None): DataFrame = {
    val data = spark.read.option("mergeSchema", "true")
      .parquet(snapshotFiles(path, asOf): _*)
    val dels = snapshotDeletes(path, asOf)
    if (dels.isEmpty) data
    else {
      // no mergeSchema: every sidecar of a table carries the SAME
      // single key column ([[deleteMor]] contract) — a mismatch should
      // fail loudly, not widen
      val dk = spark.read.parquet(dels: _*).distinct()
      val k = dk.columns.head
      // sidecars are key lists bounded by the compaction cadence —
      // size-based estimation broadcasts them; not forced, so a
      // pathological backlog degrades to a shuffle join, never an OOM
      data.join(dk.withColumnRenamed(k, "__del_k"),
        col(k) === col("__del_k"), "left_anti")
    }
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
                key: String): Int = {
    val base = currentVersion(path)
    val matched = read(spark, path, Some(base))
      .filter(coalesce(expr(predicate), lit(false)))
      .select(col(key)).filter(col(key).isNotNull).distinct()
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
                    key: String): Int = {
    val base = currentVersion(path)
    val matched = read(spark, path, Some(base)).select(col(key))
      .join(keys.select(col(key)).filter(col(key).isNotNull).distinct(),
        Seq(key), "left_semi")
      .distinct()
    commitDeleteKeys(path, matched, base)
  }

  private def commitDeleteKeys(path: String, matched: DataFrame, base: Int): Int = {
    if (matched.isEmpty) return base
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
    // one key-column scan finds the files that contain matched keys —
    // the column-pruned generator analogue of footer-stat pruning
    val keys = updates.select(col(key)).distinct()
    val touched = spark.read.option("mergeSchema", "true").parquet(current: _*)
      .select(input_file_name().as("f"), col(key))
      .join(broadcast(keys), key).select("f").distinct()
      .collect().map(_.getString(0)).toSet
    val isTouched = (f: String) => touched.exists(t => samePath(f, t))
    val untouched = current.filterNot(isTouched)
    val toRewrite = current.filter(isTouched)
    val rewritten =
      if (toRewrite.isEmpty) writeData(updates, path) // pure insert
      else writeData(
        // mergeSchema: a touched set mixing pre- and post-evolution
        // files must not drop the added column from survivor rows
        spark.read.option("mergeSchema", "true").parquet(toRewrite: _*)
          .join(broadcast(keys), Seq(key), "left_anti") // survivors
          .unionByName(updates, allowMissingColumns = true), path)
    // Merge-on-read sidecars: an upserted key is LIVE again, so it must
    // leave the delete set (the update's row would otherwise vanish at
    // read). Surviving entries consolidate into one fresh sidecar —
    // merge doubles as sidecar compaction, bounding sidecar count by
    // the commits since the last merge/compact, not table age.
    val sidecars = snapshotDeletes(path, Some(base))
    val delLines =
      if (sidecars.isEmpty) Seq.empty
      else {
        val remaining = spark.read.parquet(sidecars: _*).distinct()
          .join(broadcast(keys), Seq(key), "left_anti")
        if (remaining.isEmpty) Seq.empty
        else writeData(remaining.coalesce(1), path).map(DeletePrefix + _)
      }
    commit(path, untouched ++ rewritten ++ delLines, base)
  }

  /** SCHEMA EVOLUTION: `merge` accepts updates with ADDED columns —
    * survivors and carried-over files keep their narrower schema on
    * disk and readers widen (`mergeSchema`), so old files are never
    * rewritten just to add a column. [[read]] always merges schemas
    * across the snapshot's files (nulls for pre-evolution rows).
    */
  def readEvolved(spark: SparkSession, path: String, asOf: Option[Int] = None): DataFrame =
    read(spark, path, asOf)

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
    commit(path, writeData(rows, path), base)
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
  def incrementalAgg(spark: SparkSession, path: String, groupCol: String,
                     mv: DataFrame, fromV: Int, toV: Int,
                     dirtyLiteralMax: Int = 1024)
                    (aggOf: DataFrame => DataFrame): DataFrame = {
    require(fromV <= toV, s"fromV=$fromV must be <= toV=$toV")
    val fromFiles = snapshotFiles(path, Some(fromV))
    val toFiles = snapshotFiles(path, Some(toV))
    val delta = fromFiles.diff(toFiles) ++ toFiles.diff(fromFiles)
    // A merge-on-read delete commit moves NO data files — its dirty
    // groups come from the sidecar diff instead: the groups of the
    // fromV rows whose keys the window's new sidecars deleted. (A
    // superset is fine, as with rewrite survivors: sidecar
    // consolidation re-flags still-deleted keys whose rows no longer
    // join — extra recompute, never staleness.)
    val newSidecars = snapshotDeletes(path, Some(toV))
      .diff(snapshotDeletes(path, Some(fromV)))
    if (delta.isEmpty && newSidecars.isEmpty) return mv
    val fileDirty = if (delta.isEmpty) None else Some(
      spark.read.option("mergeSchema", "true").parquet(delta: _*)
        .select(col(groupCol).as("__dirty_g")).distinct())
    val delDirty = if (newSidecars.isEmpty) None else {
      val dk = spark.read.parquet(newSidecars: _*).distinct()
      val k = dk.columns.head
      // small delete sets become a literal In for the same
      // footer-pruning reason as the dirty-key recompute below
      val keys = dk.limit(dirtyLiteralMax + 1).collect().map(_.get(0))
      val fromRows = read(spark, path, Some(fromV))
      val matched =
        if (keys.length <= dirtyLiteralMax && !keys.contains(null))
          fromRows.filter(col(k).isin(keys.toIndexedSeq: _*))
        else fromRows.join(dk.withColumnRenamed(k, "__del_k"),
          col(k) === col("__del_k"), "left_semi")
      Some(matched.select(col(groupCol).as("__dirty_g")).distinct())
    }
    val dirty = (fileDirty, delDirty) match {
      case (Some(a), Some(b)) => a.unionByName(b).distinct()
      case (a, b)             => a.orElse(b).get
    }
    // Small dirty sets become a LITERAL In predicate instead of a
    // semi-join: a literal reaches the parquet footers, so on a layout
    // clustered/sorted by the group column the recompute SKIPS the
    // untouched files entirely (ScaleBench `ivm` measures the
    // difference) — a semi-join can never file-prune. Null keys fall
    // back to the null-safe join path.
    val keys = dirty.limit(dirtyLiteralMax + 1).collect().map(_.get(0))
    if (keys.length <= dirtyLiteralMax && !keys.contains(null)) {
      val lits = keys.toIndexedSeq
      val fresh = aggOf(
        read(spark, path, Some(toV)).filter(col(groupCol).isin(lits: _*)))
      mv.filter(col(groupCol).isNull || !col(groupCol).isin(lits: _*))
        .unionByName(fresh)
    } else {
      val fresh = aggOf(
        read(spark, path, Some(toV))
          .join(dirty, col(groupCol) <=> col("__dirty_g"), "left_semi"))
      mv.join(dirty, col(groupCol) <=> col("__dirty_g"), "left_anti")
        .unionByName(fresh)
    }
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
    commit(path, writeData(clustered, path), base)
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
    val deleteCond = coalesce(expr(predicate), lit(false))
    val touched = spark.read.option("mergeSchema", "true").parquet(current: _*)
      .filter(deleteCond)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    val untouched = current.filterNot(f => touched.exists(t => samePath(f, t)))
    val toRewrite = current.filter(f => touched.exists(t => samePath(f, t)))
    val files =
      if (toRewrite.isEmpty) untouched
      else {
        val kept = spark.read.option("mergeSchema", "true").parquet(toRewrite: _*)
          .filter(not(deleteCond))
        untouched ++ writeData(kept, path)
      }
    // MoR sidecars carry over untouched: a sidecar-deleted row stays
    // deleted whether or not its physical row also matched here
    commit(path, files ++
      snapshotDeletes(path, Some(base)).map(DeletePrefix + _), base)
  }

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
    def rd(fs: Seq[String]): Option[DataFrame] =
      if (fs.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(fs: _*))
    // Merge-on-read sidecars: each side of the compare must see the
    // LOGICAL rows of its version. The preimage side drops rows already
    // deleted at fromV and ADDS the carried-file rows whose keys the
    // window's sidecars newly deleted (their data files never moved —
    // the whole point of deleteMor — so the file diff alone would miss
    // them); the postimage side drops rows deleted at toV. A key
    // reinserted after a MoR delete then classifies as `insert` (its
    // preimage wasn't visible at fromV) — the semantically right call.
    def delKeys(fs: Seq[String]): Option[DataFrame] =
      if (fs.isEmpty) None else Some(spark.read.parquet(fs: _*).distinct())
    val fromDel = delKeys(snapshotDeletes(path, Some(fromV)))
    val toDel = delKeys(snapshotDeletes(path, Some(toV)))
    val newDel = (fromDel, toDel) match {
      case (_, None)          => None
      case (None, Some(t))    => Some(t)
      case (Some(f), Some(t)) => Some(t.except(f))
    }
    def applyDel(df: DataFrame, del: Option[DataFrame], anti: Boolean): DataFrame =
      del match {
        case None => df
        case Some(dk) =>
          val k = dk.columns.head
          df.join(dk.withColumnRenamed(k, "__del_k"),
            col(key) === col("__del_k"), if (anti) "left_anti" else "left_semi")
      }
    // The carried-file preimage scan is the one piece not bounded by
    // the manifest diff (deleteMor's whole point is that the files
    // never moved) — so, exactly like incrementalAgg's dirty keys,
    // small delete sets become a LITERAL In predicate that reaches the
    // parquet footers and prunes carried files a key-clustered layout
    // never touches; only a pathological backlog pays the semi-join
    // full scan (and only of the carried files' key column).
    val carriedDeleted = newDel.flatMap { dk =>
      rd(carried).map { c =>
        val keys = dk.limit(1025).collect().map(_.get(0))
        if (keys.length <= 1024 && !keys.contains(null))
          c.filter(col(key).isin(keys.toIndexedSeq: _*))
        else applyDel(c, Some(dk), anti = false)
      }
    }
    val sides = (rd(removed).map(applyDel(_, fromDel, anti = true)),
                 rd(added).map(applyDel(_, toDel, anti = true)))
    val pieces = Seq(sides._1, sides._2, carriedDeleted).flatten
    if (pieces.isEmpty || (sides._1.isEmpty && sides._2.isEmpty &&
          carriedDeleted.forall(_.isEmpty)))
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
    val oldPieces = (sides._1.toSeq ++ carriedDeleted.toSeq).map(toSide(_, "__old"))
    val o = oldPieces.reduceOption(_ unionByName _)
      .getOrElse(toSide(pieces.head, "__old").limit(0))
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
      snapshotFiles(p, Some(v)) ++ snapshotDeletes(p, Some(v))
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
    // relocate data files AND MoR delete sidecars the branch wrote —
    // a sidecar line keeps its prefix around the relocated path
    val relocated = manifestLines(bp, None).map { line =>
      val isDel = line.startsWith(DeletePrefix)
      val f = if (isDel) line.stripPrefix(DeletePrefix) else line
      val out =
        if (f.startsWith(parentData)) f
        else {
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
        }
      if (isDel) DeletePrefix + out else out
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
