package graft.ops

import graft.plans.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** DataFrame API over the native AS-OF join operator
  * ([[graft.plans.AsOfJoin]] → `AsOfJoinExec`): backward as-of with
  * tolerance, left outer.
  *
  * Every right column is suffixed (`_r` by default) BEFORE the plan is
  * built: the aliases mint fresh expression ids, so a self-join (the
  * common as-of shape: one event table against itself) cannot collide
  * attribute ids, and output names stay unambiguous without relying on
  * analyzer deduplication of a node it doesn't know.
  *
  * Contract: time columns are epoch LONGs (cast timestamps with
  * `unix_micros`), key/time values non-null, and the right side unique
  * per (keys, time) — see the operator's Scaladoc for why. */
object AsOfNative {
  def join(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      toleranceUs: Long,
      rightSuffix: String = "_r",
      forward: Boolean = false): DataFrame = {
    val renamed = right.select(right.columns.map(c => col(c).as(c + rightSuffix)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = renamed.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    Bridge.ofRows(left.sparkSession, AsOfJoin(
      lPlan, rPlan,
      keyCols.map(attr(lPlan, _)),
      keyCols.map(k => attr(rPlan, k + rightSuffix)),
      attr(lPlan, leftTimeCol),
      attr(rPlan, rightTimeCol + rightSuffix),
      toleranceUs, forward))
  }

  /** DataFrame API over the native interval join
    * ([[graft.plans.RangeJoin]] → `RangeJoinExec`): all pairs with
    * equal keys and `|leftTime − rightTime| ≤ toleranceUs`, inner.
    * Same right-suffix and epoch-long contracts as [[join]]. */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      toleranceUs: Long,
      rightSuffix: String = "_r"): DataFrame = {
    val renamed = right.select(right.columns.map(c => col(c).as(c + rightSuffix)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = renamed.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    Bridge.ofRows(left.sparkSession, graft.plans.RangeJoin(
      lPlan, rPlan,
      keyCols.map(attr(lPlan, _)),
      keyCols.map(k => attr(rPlan, k + rightSuffix)),
      attr(lPlan, leftTimeCol),
      attr(rPlan, rightTimeCol + rightSuffix),
      toleranceUs))
  }
}
