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

  /** Unwrap a Column to a FULLY-CONVERTED Catalyst expression (recursively
    * resolves ColumnNode wrappers). [[expression]] defers conversion to the
    * Dataset API's central converter, which never runs for expression trees
    * returned by FunctionRegistry builders — SQL-function builders must
    * convert eagerly or custom expressions see void-typed children. */
  def convertedExpression(
      c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a named SQL function backed by an expression builder on an
    * ALREADY-BUILT session (the runtime twin of
    * `SparkSessionExtensions.injectFunction` — same registry, same
    * resolution; for sessions that did not load the extension). */
  def registerFunction(
      spark: SparkSession, name: String,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    spark.asInstanceOf[ClassicSparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
