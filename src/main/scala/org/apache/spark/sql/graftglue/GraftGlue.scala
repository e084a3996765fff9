package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft needs: turning a custom
  * logical plan into a DataFrame. `Dataset.ofRows` is package-private
  * to `org.apache.spark.sql`, so this shim lives in a subpackage —
  * the standard pattern third-party Spark libraries use to mount
  * custom operators (no internals are modified; this calls one
  * factory method). Everything else about graft's custom-plan path
  * (the logical node, the strategy, the physical exec) uses public
  * developer APIs.
  */
object GraftGlue {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
