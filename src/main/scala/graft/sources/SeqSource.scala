package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 demonstration source: a deterministic synthetic event
  * generator (`spark.read.format(classOf[SeqDataSource].getName)`),
  * showing the THIRD Catalyst extension surface this library uses
  * (next to native expressions and optimizer rules): a `TableProvider`
  * whose ScanBuilder implements BOTH pushdown traits —
  *
  *  - `SupportsPushDownRequiredColumns`: readers materialize ONLY the
  *    projected fields (a `select(user_id)` never formats the
  *    event_type string or builds the timestamp);
  *  - `SupportsPushDownFilters`: range predicates on `id` narrow the
  *    generated [lo, hi) interval BEFORE partition planning, so a
  *    `WHERE id >= N` plans only the partitions that can contain
  *    matching rows — the generator analogue of parquet row-group
  *    pruning.
  *
  * Rows are a pure function of `id` (no RNG): ts = 2024-01-01 + id s,
  * user_id = id mod users, event_type = 5-way mod pick,
  * value = (id mod 10000)/100 — so results are reproducible across
  * partitionings and assertable row-by-row in SourcesSpec.
  *
  * Options: `rows` (default 1000), `users` (default 100),
  * `slices` (max partitions, default 8), `partitionByUser` (default
  * false — see below).
  *
  * With `partitionByUser=true` the source additionally implements the
  * FOURTH V2 read trait, `SupportsReportPartitioning`: partitions are
  * planned one-per-user (each carrying its `HasPartitionKey` row) and
  * the scan reports `KeyGroupedPartitioning(identity(user_id))`. Under
  * `spark.sql.sources.v2.bucketing.enabled`, Catalyst then satisfies a
  * `ClusteredDistribution(user_id)` straight from the scan — a
  * `groupBy(user_id)` aggregates with NO shuffle, and two such scans
  * join storage-partitioned with NO shuffle on either side. This is
  * the generator analogue of the bucketed-table / Iceberg
  * partition-transform contract that makes 100 TB keyed pipelines
  * shuffle-free (SourcesSpec plan-guards both shapes).
  */
class SeqDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("users", "100").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("rowsPerBatch", "100").toLong,
      properties.getOrDefault("partitionByUser", "false").toBoolean,
      properties.getOrDefault("columnar", "false").toBoolean)
}

object SeqTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** 2024-01-01 00:00:00 UTC in epoch micros. */
  val baseMicros: Long = 1704067200L * 1000000L

  val eventTypes: Array[UTF8String] =
    Array("click", "error", "purchase", "signup", "view").map(UTF8String.fromString)
}

class SeqTable(rows: Long, users: Long, slices: Int, rowsPerBatch: Long,
               partitionByUser: Boolean = false, columnar: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_seq(rows=$rows)"
  override def schema(): StructType = SeqTable.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, users, slices, rowsPerBatch, partitionByUser, columnar)
}

class SeqScanBuilder(rows: Long, users: Long, slices: Int, rowsPerBatch: Long,
                     partitionByUser: Boolean = false, columnar: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var required: StructType = SeqTable.schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var aggPushed: Option[Array[aggregate.AggregateFunc]] = None

  /** SEVENTH V2 read trait (round 10), `SupportsPushDownAggregates`
    * with COMPLETE pushdown: ungrouped COUNT(*) / MIN(id) / MAX(id)
    * over the generated interval are CLOSED FORM — the scan answers
    * them from [lo, hi) arithmetic without generating a single row, so
    * `spark.read...count()` over a billion-row table is O(1). Complete
    * (not partial) pushdown means Spark plans NO aggregate exec at all
    * — just a projection over the one-row result. Only called once
    * every filter was pushed (the engine's contract), so [lo, hi)
    * already reflects the WHERE clause; anything else (group-bys,
    * other columns, other functions) is declined and planned normally.
    */
  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall(supportedAgg)

  private def isIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: org.apache.spark.sql.connector.expressions.NamedReference =>
        r.fieldNames.sameElements(Array("id"))
      case _ => false
    }

  private def supportedAgg(f: aggregate.AggregateFunc): Boolean = f match {
    case _: aggregate.CountStar => true
    case m: aggregate.Min       => isIdRef(m.column)
    case m: aggregate.Max       => isIdRef(m.column)
    case _                      => false
  }

  override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    aggPushed = Some(agg.aggregateExpressions)
    true
  }

  /** SIXTH V2 read trait (round 9), `SupportsPushDownLimit`: a LIMIT n
    * caps the generated interval to [lo, lo + n) BEFORE partition
    * planning — `spark.read...limit(7)` over a billion-row table
    * generates 7 rows, not a billion then discards. Sound because a
    * limit may return ANY n rows and the first n ids are as good as
    * any; Spark still applies its own Limit above the scan, so a
    * partial push could never over-return either.
    */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case IsNotNull("id")                   => true // nothing is null here
      case _                                 => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = aggPushed match {
    case Some(funcs) =>
      new SeqAggScan(funcs, lo, math.max(lo, hi))
    case None =>
      new SeqScan(required, lo, math.max(lo, hi), users, slices, rowsPerBatch,
        partitionByUser, columnar)
  }
}

/** The completely-pushed-aggregate scan: ONE partition, ONE row,
  * values computed from interval arithmetic (count = hi−lo; min = lo;
  * max = hi−1; empty interval → count 0, min/max NULL — SQL aggregate
  * semantics).
  */
class SeqAggScan(funcs: Array[aggregate.AggregateFunc], lo: Long, hi: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(funcs.map {
    case _: aggregate.CountStar => StructField("count_star", LongType, nullable = false)
    case _: aggregate.Min       => StructField("min_id", LongType, nullable = true)
    case _: aggregate.Max       => StructField("max_id", LongType, nullable = true)
    case f => throw new IllegalStateException(s"unpushable aggregate $f")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"SeqAggScan[lo=$lo, hi=$hi, ${funcs.map(_.describe).mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqInputPartition(0, 1)) // carrier for the single result row
  override def createReaderFactory(): PartitionReaderFactory = {
    val n = math.max(0L, hi - lo)
    val row = InternalRow.fromSeq(funcs.toIndexedSeq.map {
      case _: aggregate.CountStar => n
      case _: aggregate.Min       => if (n == 0) null else lo
      case _: aggregate.Max       => if (n == 0) null else hi - 1
      case f => throw new IllegalStateException(s"unpushable aggregate $f")
    })
    new SeqAggReaderFactory(row)
  }
}

class SeqAggReaderFactory(row: InternalRow) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var served = false
      override def next(): Boolean = { val r = !served; served = true; r }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

class SeqScan(required: StructType, lo: Long, hi: Long, users: Long, slices: Int,
              rowsPerBatch: Long, partitionByUser: Boolean = false,
              columnar: Boolean = false)
    extends Scan with Batch with SupportsReportPartitioning with SupportsReportOrdering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Key-grouped by `user_id` when the table opted in (one partition
    * per user, each tagged with its `HasPartitionKey` row below) —
    * otherwise honestly unknown. The reported partition count MUST
    * equal `planInputPartitions().length` or Catalyst rejects it.
    */
  override def outputPartitioning(): Partitioning =
    if (partitionByUser)
      new KeyGroupedPartitioning(
        Array(Expressions.identity("user_id")), users.toInt)
    else new UnknownPartitioning(planInputPartitions().length)

  /** In the key-grouped layout each partition holds ONE user and
    * generates ids ascending, so rows are sorted by (user_id, id)
    * within every partition — reporting it lets Catalyst drop the
    * Sort under a sort-merge join entirely (scan → SMJ, no exchange,
    * no sort: the fully co-located fact⋈fact shape). Range partitions
    * are sorted by id but NOT by user_id, so they honestly report
    * nothing.
    */
  override def outputOrdering(): Array[SortOrder] =
    if (partitionByUser)
      // only the prefix of (user_id, id) that survives column pruning
      // can be reported — an ordering on a pruned column won't resolve
      Array("user_id", "id").takeWhile(required.fieldNames.contains(_))
        .map(c => Expressions.sort(
          Expressions.column(c), SortDirection.ASCENDING, NullOrdering.NULLS_FIRST))
    else Array.empty

  /** Streaming face of the same generator: offsets are plain row
    * counts, each micro-batch serves the next `rowsPerBatch` ids until
    * `rows` is exhausted — a rate source with DETERMINISTIC content
    * (replayable: batch N is the same rows on every run/restart, which
    * is what makes the exactly-once file-sink test meaningful).
    */
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new SeqMicroBatchStream(required, lo, hi, users, rowsPerBatch)
  override def description(): String =
    s"SeqScan[lo=$lo, hi=$hi, cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    if (partitionByUser)
      // one key-group per user: partition u generates exactly the ids
      // with id % users == u inside [lo, hi) — possibly zero rows, but
      // the partition still exists so the reported count stays honest
      return (0L until users).map(u =>
        SeqUserPartition(u, lo, hi, users): InputPartition).toArray
    val n = hi - lo
    if (n <= 0) return Array.empty
    val parts = math.max(1, math.min(slices.toLong, n)).toInt
    val step = (n + parts - 1) / parts
    (0 until parts).iterator
      .map(i => SeqInputPartition(lo + i * step, math.min(hi, lo + (i + 1) * step)))
      .filter(p => p.end > p.start)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required, users, columnar)
}

case class SeqInputPartition(start: Long, end: Long) extends InputPartition

/** One user's slice of the id space: ids ≡ user (mod users) in
  * [lo, hi). Carries its partition-key row so Catalyst can key-group.
  */
case class SeqUserPartition(user: Long, lo: Long, hi: Long, users: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(user)
}

case class SeqOffset(n: Long) extends streaming.Offset {
  override def json(): String = n.toString
}

class SeqMicroBatchStream(required: StructType, lo: Long, hi: Long,
                          users: Long, rowsPerBatch: Long)
    extends streaming.MicroBatchStream with streaming.SupportsAdmissionControl {
  override def initialOffset(): streaming.Offset = SeqOffset(lo)
  /** Restart-safe admission control: the next batch end derives from
    * the RESTORED start offset the engine hands us, never from
    * driver-local state — after a checkpoint restart the first batch
    * is [committed, committed + limit), not [lo, lo + limit). A
    * driver-local cursor here would regress below the committed
    * offset on restart and serve empty/backward batches.
    */
  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(start: streaming.Offset,
                            limit: streaming.ReadLimit): streaming.Offset = {
    val s = start.asInstanceOf[SeqOffset].n
    val cap = limit match {
      case r: streaming.ReadMaxRows => r.maxRows()
      case _                        => rowsPerBatch
    }
    SeqOffset(math.min(hi, s + cap))
  }
  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "SeqMicroBatchStream uses SupportsAdmissionControl.latestOffset(start, limit)")
  override def deserializeOffset(json: String): streaming.Offset =
    SeqOffset(json.toLong)
  override def planInputPartitions(start: streaming.Offset,
                                   end: streaming.Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[SeqOffset].n, end.asInstanceOf[SeqOffset].n)
    if (e > s) Array(SeqInputPartition(s, e)) else Array.empty
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required, users)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

class SeqReaderFactory(required: StructType, users: Long,
                       columnar: Boolean = false)
    extends PartitionReaderFactory {

  /** Vectorized face: when the table opted in (`columnar=true`), range
    * partitions decode straight into `OnHeapColumnVector` batches of
    * 4096 — the same whole-batch shape the parquet reader hands
    * Tungsten, so the scan feeds `ColumnarToRow` / columnar-aware
    * operators without per-row boxing. Key-grouped partitions stay
    * row-based (their consumers join/aggregate, not scan-bound).
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && partition.isInstanceOf[SeqInputPartition]

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.ColumnarBatch
    val p = partition.asInstanceOf[SeqInputPartition]
    val batchCap = 4096
    new PartitionReader[ColumnarBatch] {
      private var cur = p.start
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        if (cur >= p.end) return false
        val n = math.min(batchCap.toLong, p.end - cur).toInt
        val vecs = required.fields.map(f => new OnHeapColumnVector(n, f.dataType))
        var i = 0
        while (i < n) {
          val id = cur + i
          var c = 0
          while (c < required.fields.length) {
            required.fields(c).name match {
              case "id"      => vecs(c).putLong(i, id)
              case "ts"      => vecs(c).putLong(i, SeqTable.baseMicros + id * 1000000L)
              case "user_id" => vecs(c).putLong(i, id % users)
              case "event_type" =>
                val s = SeqTable.eventTypes((id % 5).toInt)
                vecs(c).putByteArray(i, s.getBytes)
              case "value"   => vecs(c).putDouble(i, (id % 10000L) / 100.0)
            }
            c += 1
          }
          i += 1
        }
        cur += n
        batch = new ColumnarBatch(vecs.toArray, n)
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = if (batch != null) { batch.close(); batch = null }
    }
  }
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    // one generator lambda per projected column — the pruned schema
    // decides what gets computed at all
    val gens: Array[Long => Any] = required.fieldNames.map {
      case "id"         => (id: Long) => id
      case "ts"         => (id: Long) => SeqTable.baseMicros + id * 1000000L
      case "user_id"    => (id: Long) => id % users
      case "event_type" => (id: Long) => SeqTable.eventTypes((id % 5).toInt)
      case "value"      => (id: Long) => (id % 10000L) / 100.0
    }
    partition match {
      case p: SeqInputPartition =>
        new PartitionReader[InternalRow] {
          private var cur = p.start - 1
          override def next(): Boolean = { cur += 1; cur < p.end }
          override def get(): InternalRow =
            InternalRow.fromSeq(gens.map(g => g(cur)).toIndexedSeq)
          override def close(): Unit = ()
        }
      case p: SeqUserPartition =>
        // ids ≡ p.user (mod users), stepping by users from the first
        // such id ≥ lo
        val first = p.lo + (((p.user - p.lo % p.users) % p.users + p.users) % p.users)
        new PartitionReader[InternalRow] {
          private var cur = first - p.users
          override def next(): Boolean = { cur += p.users; cur < p.hi }
          override def get(): InternalRow =
            InternalRow.fromSeq(gens.map(g => g(cur)).toIndexedSeq)
          override def close(): Unit = ()
        }
    }
  }
}
