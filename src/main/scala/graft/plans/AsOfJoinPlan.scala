package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The full custom-operator extension ladder, demonstrated end to end:
  * a logical node ([[AsOfJoin]]), a planner strategy
  * ([[AsOfJoinStrategy]], injected via
  * `SparkSessionExtensions.injectPlannerStrategy` in
  * [[graft.functions.GraftExtensions]]), and a physical operator
  * ([[AsOfJoinExec]]) that executes a backward AS-OF join as a
  * per-partition two-pointer merge.
  *
  * Semantics (pandas `merge_asof` / kdb `aj`): for each left row, the
  * matching right row has equal keys and — backward (default) — the
  * LARGEST right time ≤ left time with `leftTime − rightTime ≤
  * tolerance`, or — `forward = true` — the SMALLEST right time ≥ left
  * time with `rightTime − leftTime ≤ tolerance`. Unmatched left rows
  * are emitted null-extended (left outer). Determinism contract:
  * callers make (keys, time) unique on the right side (else "the"
  * latest/earliest right row at a tied time is sort-order-dependent).
  *
  * Why a physical operator instead of the composed form
  * ([[graft.ops.BandJoin.asOf]], which buckets + explodes ×3 + windows):
  * with both children hash-partitioned on the keys and sorted by
  * (keys, time) — exactly what `requiredChildDistribution` /
  * `requiredChildOrdering` make EnsureRequirements plan — each
  * partition resolves in ONE O(|left| + |right|) forward sweep holding
  * a single buffered right row: no row multiplication, no window sort,
  * no candidate explosion on hot keys. At 100 TB that is the difference
  * between shuffling 4× the bytes (3× bucket explode + window
  * re-partition) and shuffling each side exactly once.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Long,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKeys, j.rightKeys, j.leftTime, j.rightTime, j.toleranceUs,
        j.forward) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Long,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // hash-cluster both sides on the join keys (the SortMergeJoin shape:
  // EnsureRequirements checks the two specs are co-partitioned and
  // inserts compatible exchanges when they aren't)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // sorted by (keys, time) inside each partition — the merge invariant
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val tol = toleranceUs
    val lSchema = left.output
    val rSchema = right.output
    val outSchema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lSchema)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rSchema)
      val lTimeBound = BindReferences.bindReference(lTimeExpr, lSchema)
      val rTimeBound = BindReferences.bindReference(rTimeExpr, rSchema)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rSchema.size)
      val resultProj = UnsafeProjection.create(outSchema, outSchema)
      if (forward) {
        // FORWARD: match = smallest right time ≥ left time within
        // tolerance. The candidate is always the right HEAD: advance
        // past rows whose key has been passed or whose time is already
        // behind the left cursor, then peek — never consume a possible
        // match (several left rows may share one future right row).
        lIter.map { l =>
          val lk = lKeyProj(l)
          val lt = lTimeBound.eval(l).asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            val cmp = keyOrd.compare(rk, lk)
            if (cmp < 0 || (cmp == 0 && rTimeBound.eval(r).asInstanceOf[Long] < lt)) {
              rBuf.next()
            } else {
              advance = false
            }
          }
          val matched = rBuf.hasNext && {
            val r = rBuf.head
            keyOrd.compare(rKeyProj(r), lk) == 0 &&
              rTimeBound.eval(r).asInstanceOf[Long] - lt <= tol
          }
          resultProj(joined(l, if (matched) rBuf.head else nullRight))
        }
      } else {
        // BACKWARD: the single buffered candidate — latest right row ≤
        // current left time for the key it was captured under
        var lastRight: InternalRow = null
        var lastRightKey: UnsafeRow = null
        var lastRightTime: Long = 0L

        lIter.map { l =>
          val lk = lKeyProj(l)
          val lt = lTimeBound.eval(l).asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            val cmp = keyOrd.compare(rk, lk)
            if (cmp < 0) {
              // right key already passed by the left cursor — discard
              rBuf.next()
            } else if (cmp == 0 && rTimeBound.eval(r).asInstanceOf[Long] <= lt) {
              lastRight = r.copy()
              lastRightKey = rk.copy()
              lastRightTime = rTimeBound.eval(lastRight).asInstanceOf[Long]
              rBuf.next()
            } else {
              advance = false
            }
          }
          val matched = lastRight != null &&
            keyOrd.compare(lastRightKey, lk) == 0 &&
            lt - lastRightTime <= tol
          resultProj(joined(l, if (matched) lastRight else nullRight))
        }
      }
    }
  }
}
