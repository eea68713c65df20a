package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column/Dataset <-> Catalyst bridge. Spark 4's classic API keeps
  * these conversions `private[sql]`, so extension libraries (this one
  * included) provide the bridge from inside the package — the standard
  * pattern for Catalyst-native extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly-converted catalyst expression. `expression` may return a
    * lazy ColumnNodeExpression wrapper (non-serializable node graph —
    * tasks crash on ship) when the Column was built from the node API
    * (e.g. `.asc`/`.desc`); this forces the full conversion. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame from a (resolved) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
