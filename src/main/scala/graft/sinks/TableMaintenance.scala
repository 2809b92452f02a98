package graft.sinks

import org.apache.spark.sql.SparkSession

/** Policy-driven table maintenance — the scheduled job every
  * streaming-ingested / continuously-deleted 100 TB CowTable needs,
  * bundling the format's three maintenance levers behind thresholds so
  * an operator schedules ONE job instead of reasoning about each:
  *
  *  - COMPACT when the snapshot's data-file count exceeds the policy
  *    bound (micro-batch merges leave small files whose open/footer
  *    overhead dominates scans) OR when the merge-on-read delete
  *    backlog exceeds its bound (compact folds the sidecars, retiring
  *    deleted rows physically);
  *  - EXPIRE old snapshots past the retention window and vacuum data
  *    files (and sidecars) no surviving snapshot references.
  *
  * Scheduling caveat (inherited from [[CowTable.incrementalAgg]]): a
  * compact rewrites every file, so an IVM refresh window that spans a
  * maintenance run degrades to a full recompute — run maintenance
  * right AFTER materialized-view refreshes, not between them.
  */
object TableMaintenance {

  /** Thresholds; defaults suit the test-scale tables here — a real
    * deployment sizes `maxDataFiles` to its scan-latency budget and
    * `keepSnapshots` to its time-travel/audit retention.
    */
  final case class Policy(
      maxDataFiles: Int = 64,
      maxDeleteSidecars: Int = 8,
      keepSnapshots: Int = 10,
      targetFiles: Int = 16)

  /** What one pass did: whether it compacted (and how many sidecars
    * that folded), how much retention reclaimed, and the table version
    * after the pass.
    */
  final case class Report(
      compacted: Boolean,
      foldedSidecars: Int,
      expiredManifests: Int,
      vacuumedFiles: Int,
      version: Int)

  /** One maintenance pass. Idempotent at steady state: a table within
    * every bound commits nothing and reclaims nothing.
    */
  def runOnce(spark: SparkSession, path: String,
              policy: Policy = Policy()): Report = {
    val dataFiles = CowTable.snapshotFiles(path).size
    val sidecars = CowTable.snapshotDeletes(path).size
    val needCompact =
      dataFiles > policy.maxDataFiles || sidecars > policy.maxDeleteSidecars
    if (needCompact) CowTable.compact(spark, path, policy.targetFiles)
    val (expired, vacuumed) =
      CowTable.expireSnapshots(path, policy.keepSnapshots)
    Report(
      compacted = needCompact,
      foldedSidecars = if (needCompact) sidecars else 0,
      expiredManifests = expired,
      vacuumedFiles = vacuumed,
      version = CowTable.currentVersion(path))
  }
}
