package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.StreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

import graft.sinks.CowTable

/** STREAMING CDC SOURCE face for [[graft.sinks.CowTable]] — the
  * changelog-topic analogue that closes the lakehouse loop: eleven
  * sinks already write streams INTO CowTables; this lets a downstream
  * pipeline `readStream` the table's row-level changes back OUT, so
  * table→table pipelines chain without batch glue.
  *
  * {{{
  * spark.readStream
  *   .format(classOf[CowCdcSourceProvider].getName)
  *   .option("path", tablePath)
  *   .option("key", "id")            // the CDC classification key
  *   .load()                          // … → _change_type/_commit_version
  * }}}
  *
  * OFFSETS ARE SNAPSHOT VERSIONS. Offset v means "every change up to
  * and including snapshot v has been emitted"; micro-batch (from, to]
  * is exactly `CowTable.changes(from, to)` — the same manifest-diff
  * feed the incremental operators consume in batch, so the scan cost
  * of a micro-batch is proportional to the CHANGED files, never the
  * table. Offsets live in the query's checkpoint offset log, so a
  * restart resumes from the committed version with no duplication and
  * no gap: `changes` is a pure function of two manifests, which makes
  * every batch REPLAY-DETERMINISTIC (the property the exactly-once
  * sinks' txn watermarks compose with — see
  * [[graft.sinks.Sinks.cdcMirrorBatch]]).
  *
  * FIRST BATCH: with `startingVersion=initial` (the default) the first
  * micro-batch is the full snapshot at the then-current version as
  * `insert` rows — the Delta/Iceberg "initial snapshot" convention —
  * and CDC follows from there. `startingVersion=<v>` skips the
  * snapshot and emits changes strictly after version v (the "resume a
  * known position" form).
  *
  * ADMISSION CONTROL: `maxVersionsPerBatch` (default unlimited) caps
  * how many table commits one micro-batch may span. Unlimited is the
  * scale-right default — a spanned window is ONE manifest diff, so a
  * backlog collapses into one linear catch-up batch rather than
  * replaying every intermediate version's files. The cap exists for
  * consumers that want bounded per-batch state growth. When capped,
  * the admission base rides `getBatch`/`commit` observations; after a
  * restart whose first `getOffset` lands before the engine has told us
  * the committed position, one empty self-heal batch realigns the base
  * (documented in `getBatch`) — never a duplicate, never a gap.
  *
  * WHY A V1 `Source` AND NOT A DSv2 `MicroBatchStream`: the CDC batch
  * is a multi-way JOIN over manifest diffs (preimage/postimage
  * classification, MoR sidecar application) — a DataFrame-level
  * computation with no per-partition reader decomposition. V1
  * `getBatch` returns a DataFrame; DSv2 readers return rows per
  * partition. FileStreamSource and Delta's own streaming source sit on
  * the same V1 seam for the same reason; the DSv2 micro-batch surface
  * is proven in-repo where it fits (SeqSource — generator partitions).
  */
class CowCdcSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "cow-cdc"

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), CowCdcSource.cdcSchema(
      sqlContext.sparkSession, CowCdcSource.required(parameters, "path"),
      CowCdcSource.required(parameters, "key")))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new CowCdcSource(sqlContext.sparkSession, parameters)
}

object CowCdcSource {
  private[sources] def required(parameters: Map[String, String], k: String): String =
    parameters.getOrElse(k,
      throw new IllegalArgumentException(s"cow-cdc source requires option '$k'"))

  /** The feed schema: key first, then the table's remaining declared
    * columns, then the two CDC metadata columns. Everything nullable —
    * a delete preimage carries nulls for post-evolution columns.
    */
  def cdcSchema(spark: SparkSession, path: String, key: String): StructType = {
    require(CowTable.exists(path), s"no CowTable at $path")
    val t = CowTable.read(spark, path).schema
    require(t.fieldNames.contains(key),
      s"key '$key' not in table schema ${t.fieldNames.mkString("[", ", ", "]")}")
    StructType(
      (t.fields.filter(_.name == key) ++ t.fields.filterNot(_.name == key))
        .map(f => StructField(f.name, f.dataType, nullable = true)).toIndexedSeq :+
        StructField("_change_type", StringType, nullable = true) :+
        StructField("_commit_version", IntegerType, nullable = true))
  }
}

class CowCdcSource(spark: SparkSession, parameters: Map[String, String])
    extends Source {
  private val path = CowCdcSource.required(parameters, "path")
  private val key = CowCdcSource.required(parameters, "key")
  private val startingVersion: Option[Int] =
    parameters.get("startingVersion").filterNot(_ == "initial").map(_.toInt)
  private val maxVersions: Long =
    parameters.get("maxVersionsPerBatch").map(_.toLong).getOrElse(Long.MaxValue)
  require(maxVersions > 0, "maxVersionsPerBatch must be positive")

  override val schema: StructType = CowCdcSource.cdcSchema(spark, path, key)

  /** Admission base for a capped source: the newest version this
    * process has planned or been told is committed. Never used for
    * correctness — only to bound how far `getOffset` advances.
    */
  @volatile private var base: Long = startingVersion.map(_.toLong).getOrElse(-1L)

  override def getOffset: Option[Offset] = {
    val cur = CowTable.currentVersion(path).toLong
    // saturating add: the unlimited default must not wrap negative
    val cap = base + maxVersions
    val anchored =
      if (base < 0 || cap < base) cur else math.min(cur, cap)
    // monotone: after a restart `base` may be behind the engine's
    // committed offset; never offer an offset below what we already
    // planned (the engine treats ANY change as new data and would plan
    // a backward batch)
    Some(LongOffset(math.max(anchored, base)))
  }

  private def v(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case other         => other.json.trim.toInt
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = v(end)
    base = math.max(base, endV.toLong)
    val batch = start match {
      case Some(s) =>
        val sv = v(s)
        if (endV <= sv) emptyBatch(endV) // capped-source self-heal realign
        else CowTable.changes(spark, path, key, sv, endV)
      case None =>
        startingVersion match {
          case Some(sv) =>
            if (endV <= sv) emptyBatch(endV)
            else CowTable.changes(spark, path, key, sv, endV)
          case None => // initial-snapshot convention: everything is an insert
            CowTable.read(spark, path, Some(endV))
              .withColumn("_change_type", lit("insert"))
              .withColumn("_commit_version", lit(endV))
        }
    }
    val conformed = batch.select(schema.fields.toIndexedSeq.map { f =>
      (if (batch.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
    // V1 batches must carry isStreaming=true; the plan underneath is
    // the ordinary batch CDC plan, executed lazily by the engine
    StreamShim.streamingDataFrame(spark, conformed.queryExecution.toRdd, schema)
  }

  private def emptyBatch(endV: Int): DataFrame =
    CowTable.read(spark, path, Some(endV))
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(endV))
      .limit(0)

  override def commit(end: Offset): Unit = base = math.max(base, v(end).toLong)
  override def stop(): Unit = ()
  override def toString: String = s"CowCdcSource[$path, key=$key]"
}
