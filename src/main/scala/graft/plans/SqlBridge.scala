package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` classic Dataset factory: a
  * custom logical operator ([[graft.plans.AsOfJoinPlan]]) needs
  * `Dataset.ofRows` to become a user-facing DataFrame, and Spark exposes
  * no public equivalent. This is the ONLY member accessed through the
  * package trick; everything else the engine touches is public API.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
