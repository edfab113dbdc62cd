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

  /** The cached RDD behind a `localCheckpoint`ed DataFrame (its plan is a
    * `LogicalRDD` leaf), so iterative operators can RELEASE per-round
    * checkpoint blocks when the iteration ends — localCheckpoint never
    * unpersists by itself, and a loop that checkpoints every round leaks
    * one cached RDD per round per call (measured: dd_cluster's warm
    * re-runs got SLOWER than its first pass as blocks accumulated). */
  def checkpointRdd(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
