package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Bridge into `private[sql]` surface: materialize a DataFrame from a
  * LogicalPlan mid-optimization (the join-rewrite rule needs to run the
  * probe side as a query while the optimizer is still running — same
  * pattern as the reference's AriadneInternalHelper,
  * src/main/spark4/scala/org/apache/spark/sql/AriadneInternalHelper.scala:14-16).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Wrap a raw Catalyst expression as a user-facing Column (for custom
    * codegen'd expressions like graft.functions.FloatVectorDot). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst expression. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
