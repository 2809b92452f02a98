package graft

import org.apache.spark.sql.SparkSession

import graft.sinks.CowTable

/** CROSS-PROCESS commit-race writer (round 13, VERDICT r12 task 3):
  * one REAL JVM worth of racing CowTable commits against a shared
  * table path. The in-process Future races (CowTableSpec) exercise the
  * hard-link commit protocol under one JVM's memory model; production
  * multi-writer is two UNRELATED processes on shared storage, where
  * the only serialization point is link(2) itself — this main is that
  * writer, and ForkRaceSpec spawns two of them concurrently and then
  * proves zero lost rows and gap-free versions.
  *
  * Args: <tablePath> <writerId> <nAppends> <nMerges> <nUpserts>. Every
  * row key is globally unique per (writer, op), so the success
  * criterion is exact: the table must hold ALL keys both writers
  * wrote, each once — and each upserted key must carry its POST-image
  * (the atomic delete+append either fully lands or fully retries;
  * a torn upsert would surface as a duplicate or a lost key).
  *
  * Object-store caveat (documented, not simulated here): the protocol
  * relies on an atomic, fail-if-exists link/rename on the shared
  * filesystem — POSIX link(2), HDFS create-no-overwrite, ABFS/GCS
  * preconditions all provide it; S3 does NOT, which is why Delta on S3
  * needs an external lock (DynamoDB LogStore) — the same deployment
  * note applies to CowTable.
  */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    val Array(path, writerId, nAppendsStr, nMergesStr, nUpsertsStr) = args.take(5)
    val (nAppends, nMerges) = (nAppendsStr.toInt, nMergesStr.toInt)
    val nUpserts = nUpsertsStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"cow-race-$writerId")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    import spark.implicits._
    try {
      // insert-only fast path: manifest-rebase appends
      (0 until nAppends).foreach { i =>
        CowTable.append(spark, path,
          Seq((s"$writerId-a$i", writerId, i)).toDF("k", "w", "i").coalesce(1),
          maxRetries = 64)
      }
      // read-modify-write path: optimistic-retry merges
      (0 until nMerges).foreach { i =>
        CowTable.withCommitRetry(maxRetries = 64) {
          CowTable.merge(spark, path,
            Seq((s"$writerId-m$i", writerId, i)).toDF("k", "w", "i"), "k")
        }
      }
      // atomic MoR upsert path (round 13): replace this writer's own
      // appended rows with post-images in ONE positional-delete+append
      // commit, racing the other JVM's commits on the same manifest
      (0 until nUpserts).foreach { i =>
        CowTable.upsertMorPos(spark, path,
          Seq(Tuple1(s"$writerId-a$i")).toDF("k"),
          Seq((s"$writerId-a$i", writerId, i + 1000)).toDF("k", "w", "i"),
          txn = Some((s"up-$writerId", i.toLong)), maxRetries = 64)
      }
      // SAME-KEY contention: both JVMs merge the ONE shared key —
      // last-writer-wins must hold ACROSS processes (exactly one row
      // survives, carrying exactly one writer's post-image; a torn
      // merge would leave zero or two rows)
      CowTable.withCommitRetry(maxRetries = 64) {
        CowTable.merge(spark, path,
          Seq(("shared-k", writerId, 9999)).toDF("k", "w", "i"), "k")
      }
    } finally spark.stop()
  }
}
