package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `classic.Dataset.ofRows`, which is `private[sql]`.
  * Standard extension-point technique for libraries that build
  * LogicalPlans directly (same access pattern Spark's own connectors
  * use); no Spark internals are modified.
  */
object PlanExec {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
