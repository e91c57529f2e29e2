/*
 * Minimal interop bridge: Spark 4 hides the Expression<->Column
 * constructors behind `private[sql]` (org.apache.spark.sql.classic
 * .ExpressionUtils), so libraries that ship native Catalyst expressions
 * need one file inside the `org.apache.spark.sql` namespace to reach
 * them. This is the same pattern used by public Spark extension
 * libraries; nothing else in this project lives outside `graft`.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftSqlBridge {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic mode). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a raw logical plan as a DataFrame (classic mode) — needed by
    * libraries that ship custom logical operators.
    */
  def dataFrame(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan behind a DataFrame. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
