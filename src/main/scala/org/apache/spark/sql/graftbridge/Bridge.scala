package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]`, so third-party expression libraries expose it through
  * a shim inside the `org.apache.spark.sql` namespace — the standard
  * pattern for Catalyst extension libraries. */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a hand-built logical plan as a DataFrame — `Dataset.ofRows` is
    * `private[sql]`; custom-operator libraries reach it through the same
    * shim. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
