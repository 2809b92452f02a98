package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Bridge from a hand-built [[LogicalPlan]] back to the public
  * DataFrame API. Spark 4's `Dataset.ofRows` is `private[sql]`
  * (Connect refactor), so the conversion lives in this in-hierarchy
  * shim — same pattern as [[ColumnShim]]. Needed by operators that
  * inject a CUSTOM logical node (graft.plans.AsOfMergeJoin) rather
  * than composing built-in ones.
  */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
