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

  /** Wrap a raw Catalyst Expression as a Column (Spark 4 routes this
    * through private[sql] ExpressionUtils). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  /** Inverse: the Catalyst Expression behind a Column. */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
