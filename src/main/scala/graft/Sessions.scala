package graft

import org.apache.spark.sql.SparkSession

/** Canonical session setup shared by Bench, Verify and the test base —
  * every conf the library's tables/operators rely on is set here at
  * build time, not mutated mid-session by whichever query first runs.
  *
  * In particular `spark.sql.legacy.parquet.nanosAsLong`: the driver's
  * `events.parquet` carries TIMESTAMP(NANOS), which Spark's reader
  * rejects unless this conf is on (the table registry then converts
  * nanos→micros in long space, see [[graft.tables.Tables]]).
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The generated-class cache defaults to 100 entries; a
      // many-query workload (Verify/Bench run 58-85 distinct plans,
      // several codegen units each) evicts and recompiles constantly
      // at that size. Static conf — must be set at builder time.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
}
