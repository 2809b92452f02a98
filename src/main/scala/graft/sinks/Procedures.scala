package graft.sinks

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` maintenance procedures (round 18): the table-format
  * operations a production operator runs on a schedule — compaction,
  * snapshot expiry + orphan vacuum, z-order rewrite, stats / z-order /
  * lookup declarations — addressable from plain SQL through Spark's
  * DSv2 ProcedureCatalog, Iceberg-style:
  *
  * {{{
  *   CALL cowt.system.compact(`table` => 'ns.t', files => 16)
  *   CALL cowt.system.expire_snapshots('ns.t', 3)
  *   CALL cowt.system.cluster('ns.t', 'x,y', 16)
  *   CALL cowt.system.set_stats_columns('ns.t', 'x,y')
  *   CALL cowt.system.set_zorder('ns.t', 'x,y')
  *   CALL cowt.system.set_lookup_columns('ns.t', 'k', 128, 8192)
  *   CALL cowt.system.backfill_row_counts('ns.t')
  * }}}
  *
  * Each call runs the corresponding [[CowTable]] API against the
  * catalog root and returns a one-row result set (new version /
  * counts) through the same single-partition scan machinery the
  * metadata tables use. The namespace in the CALL identifier is
  * ignored — procedures are catalog-global; the table is an argument.
  */
private[sinks] object CowProcedures {

  val Names: Seq[String] =
    Seq("compact", "expire_snapshots", "cluster", "set_stats_columns",
      "set_zorder", "set_lookup_columns", "backfill_row_counts")

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, dflt: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(dflt).build()

  private def str(row: InternalRow, i: Int): String = row.getUTF8String(i).toString
  private def cols(row: InternalRow, i: Int): Seq[String] =
    str(row, i).split(',').toSeq.map(_.trim).filter(_.nonEmpty)

  /** A one-row result served as the procedure's `LocalScan` (the only
    * scan shape Spark currently accepts as procedure output).
    */
  private def result(schema: StructType, values: Any*)
      : util.Iterator[Scan] = {
    val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
      override def readSchema(): StructType = schema
      override def description(): String = "CowProcedureResult"
      override def rows(): Array[InternalRow] =
        Array(InternalRow.fromSeq(values.map {
          case s: String => UTF8String.fromString(s)
          case v => v
        }))
    }
    util.List.of(scan).iterator()
  }

  private val versionResult = StructType(Seq(
    StructField("version", LongType, nullable = false)))

  private def bound(procName: String, params: Seq[ProcedureParameter])(
      body: InternalRow => util.Iterator[Scan]): BoundProcedure =
    new BoundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft cow maintenance: $procName"
      override def parameters(): Array[ProcedureParameter] = params.toArray
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): util.Iterator[Scan] = body(input)
    }

  def load(cat: CowCatalog,
           ident: org.apache.spark.sql.connector.catalog.Identifier)
      : UnboundProcedure = {
    val procName = ident.name()
    require(Names.contains(procName),
      s"unknown procedure '$procName' — available: ${Names.mkString(", ")}")
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft cow maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure = procName match {
        case "compact" => bound(procName, Seq(
            in("table", StringType), inDefault("files", IntegerType, "16"))) { r =>
          val v = CowTable.compact(SparkSession.active, cat.tablePath(str(r, 0)),
            r.getInt(1))
          result(versionResult, v.toLong)
        }
        case "expire_snapshots" => bound(procName, Seq(
            in("table", StringType), inDefault("keep_last", IntegerType, "1"))) { r =>
          val (manifests, files) =
            CowTable.expireSnapshots(cat.tablePath(str(r, 0)), r.getInt(1))
          result(StructType(Seq(
              StructField("expired_manifests", LongType, nullable = false),
              StructField("vacuumed_files", LongType, nullable = false))),
            manifests.toLong, files.toLong)
        }
        case "cluster" => bound(procName, Seq(
            in("table", StringType), in("zorder_by", StringType),
            inDefault("files", IntegerType, "16"))) { r =>
          val v = CowTable.cluster(SparkSession.active, cat.tablePath(str(r, 0)),
            r.getInt(2), cols(r, 1))
          result(versionResult, v.toLong)
        }
        case "set_stats_columns" => bound(procName, Seq(
            in("table", StringType), in("columns", StringType))) { r =>
          val v = CowTable.setStatsColumns(SparkSession.active,
            cat.tablePath(str(r, 0)), cols(r, 1))
          result(versionResult, v.toLong)
        }
        case "set_zorder" => bound(procName, Seq(
            in("table", StringType), in("columns", StringType))) { r =>
          val v = CowTable.setZorderColumns(SparkSession.active,
            cat.tablePath(str(r, 0)), cols(r, 1))
          result(versionResult, v.toLong)
        }
        case "set_lookup_columns" => bound(procName, Seq(
            in("table", StringType), in("columns", StringType),
            inDefault("dict_max", IntegerType, "128"),
            inDefault("bloom_bits", IntegerType, "8192"))) { r =>
          val v = CowTable.setLookupColumns(SparkSession.active,
            cat.tablePath(str(r, 0)), cols(r, 1), r.getInt(2), r.getInt(3))
          result(versionResult, v.toLong)
        }
        case "backfill_row_counts" => bound(procName, Seq(
            in("table", StringType))) { r =>
          val v = CowTable.backfillRowCounts(SparkSession.active,
            cat.tablePath(str(r, 0)))
          result(versionResult, v.toLong)
        }
      }
    }
  }
}
