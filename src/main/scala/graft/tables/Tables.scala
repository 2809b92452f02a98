package graft.tables

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.storage.StorageLevel

/** Table registry: loads the driver-generated parquet tables
  * (`TESTDATA.md`) once per `(session, sfDir)` and caches them
  * `MEMORY_AND_DISK` — the Bench harness runs the whole query battery
  * against one sfDir in a single session, so re-reading parquet per
  * query would be the dominant avoidable cost (SURVEY.md §4.4).
  *
  * At cluster scale the same registry shape holds: tables become
  * catalog tables / DSv2 scans and the cache becomes optional, but the
  * query functions only ever see a `DataFrame`, so nothing else changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fact-sized tables get repartitioned at cache-load: the sf0.1
    * parquet files are single files under `maxPartitionBytes`, so
    * without this every downstream query runs its scan on 1–3
    * partitions regardless of available cores. The one-time shuffle
    * happens at cache materialization; dimensions stay as-read (they
    * are broadcast everywhere anyway).
    *
    * The partition count is capped at 16 regardless of core count:
    * measured at sf0.1, 32-way cached partitions cost more in task
    * scheduling than they buy in map parallelism (every scan stage =
    * one task per cached partition), and the battery's per-query work
    * is milliseconds per task either way. At real cluster scale the
    * cache is optional and partitioning comes from the source layout,
    * so this cap is bench-session sizing, not a library limit
    * (`SPARK_GRAFT_FACT_PARTS` overrides).
    */
  private val factTables = Set("lineitem", "orders", "events", "documents", "embeddings")

  private def factParts(spark: SparkSession): Int =
    sys.env.get("SPARK_GRAFT_FACT_PARTS").map(_.toInt)
      .getOrElse(math.min(spark.sparkContext.defaultParallelism, 16))

  private val cache = TrieMap.empty[(Int, String, String), DataFrame]
  private val viewsFor = TrieMap.empty[Int, String]

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // `spark.graft.tableCache=false` bypasses the registry entirely:
    // plain per-query parquet scans, no persist, no repartition — the
    // production path, where filters/projection must reach the reader
    // (plan-guarded in PlanSpec's pushdown battery). Default stays
    // cached: the bench/verify batteries re-read every table hundreds
    // of times.
    if (!spark.conf.get("spark.graft.tableCache", "true").toBoolean)
      loadRaw(spark, sfDir, name)
    else cache.getOrElseUpdate(
      (System.identityHashCode(spark), sfDir, name), {
        val df = loadRaw(spark, sfDir, name)
        val partitioned =
          if (factTables(name)) df.repartition(factParts(spark))
          else df
        partitioned.persist(StorageLevel.MEMORY_AND_DISK)
      })

  private def loadRaw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df =
          if (name == "events") {
            // events.ts arrives in whatever precision the driver's
            // generator used that round — TIMESTAMP(NANOS) in rounds
            // 1-6 (which Spark only reads via the `nanosAsLong` legacy
            // conf, as a raw-nanos BIGINT that we truncate to µs in
            // long space: ns values exceed double's 2^53 exact range,
            // so `DIV`, never `/`), TIMESTAMP(MICROS) from round 7
            // (read natively as TIMESTAMP_NTZ; the cast to session-UTC
            // TimestampType is an identity on the stored value). Branch
            // on the READ schema, not an assumption about the file.
            val raw = spark.read.parquet(s"$sfDir/$name.parquet")
            raw.schema("ts").dataType match {
              case org.apache.spark.sql.types.LongType =>
                raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
              case _ =>
                raw.withColumn("ts", expr("cast(ts as timestamp)"))
            }
          } else spark.read.parquet(s"$sfDir/$name.parquet")
    df
  }

  /** Run SQL with all tables registered as temp views over `sfDir`.
    * Needed where the DataFrame API has no equivalent (GROUPING SETS).
    */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    val key = System.identityHashCode(spark)
    if (!viewsFor.get(key).contains(sfDir)) {
      names.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
      viewsFor(key) = sfDir
    }
    spark.sql(query)
  }
}
