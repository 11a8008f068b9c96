package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway this library needs: constructing a
  * DataFrame from a custom [[LogicalPlan]] node. Spark exposes plan
  * EXTENSION points publicly (`injectPlannerStrategy`, etc.) but not plan
  * CONSTRUCTION, so every library that adds a logical operator ships a
  * shim like this in the `org.apache.spark.sql` namespace. Nothing else
  * reaches into private API. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
