package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` bridge this library uses: mark a computed
  * DataFrame `isStreaming = true` so a V1 streaming `Source` can
  * return it from `getBatch` (MicroBatchExecution asserts the flag on
  * every source batch).
  *
  * WHY THIS EXISTS: a table-format CDC micro-batch is a DataFrame-
  * level computation (manifest diff → outer join → change
  * classification), not a per-partition generator, so the natural
  * streaming seam is `Source#getBatch: DataFrame` — the same seam
  * Spark's own FileStreamSource and Delta Lake's DeltaSource sit on,
  * and the reason both live partly inside the `org.apache.spark.sql`
  * namespace. This object is the library's entire footprint in that
  * namespace: one call to `SparkSession.internalCreateDataFrame`, the
  * exact call `SQLContext.internalCreateDataFrame` documents for V1
  * sources. No other internal state is touched.
  */
object StreamShim {
  def streamingDataFrame(spark: org.apache.spark.sql.SparkSession,
                         rdd: RDD[InternalRow],
                         schema: StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Analyzed logical plan → DataFrame (`Dataset.ofRows`) — the MERGE
    * INTO command wraps its already-resolved source plan back into the
    * DataFrame API to drive the format's transactional merge.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
