package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: wrapping a hand-built [[LogicalPlan]]
  * back into a DataFrame requires `Dataset.ofRows`, which Spark scopes to
  * the `org.apache.spark.sql` package — the standard extension-library
  * technique for libraries that inject custom logical operators (this
  * file is the ONLY code in the repo living under the Spark namespace,
  * and it contains no logic). */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Column ↔ catalyst Expression conversions (`ExpressionUtils` is
    * `private[sql]` in Spark 4's classic module). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
