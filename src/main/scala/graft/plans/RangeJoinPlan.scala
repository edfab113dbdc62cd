package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native INTERVAL (band/range) join — the second whole-operator
  * extension next to [[AsOfJoin]]: emit every (left, right) pair with
  * equal keys and `|leftTime − rightTime| ≤ toleranceUs` (inner join).
  *
  * Why a physical operator: Spark plans a time-band predicate either as
  * the residual of a key-only sort-merge join (per-key quadratic — the
  * hot-key bomb) or, composed ([[graft.ops.BandJoin.bucketed]]), as a
  * bucket equi-join that explodes one side ×3 and shuffles the copies.
  * Here both children hash-partition on the keys and sort by
  * (keys, time) — EnsureRequirements does it from
  * `requiredChildDistribution`/`requiredChildOrdering` — and each
  * partition runs ONE forward sweep holding a sliding buffer of right
  * rows inside `[lt − tol, lt + tol]`: memory is bounded by
  * rows-per-(key × 2·tol window), the physical data rate, never table
  * size; each side shuffles exactly once with no row multiplication.
  */
case class RangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: RangeJoin =>
      RangeJoinExec(planLater(j.left), planLater(j.right),
        j.leftKeys, j.rightKeys, j.leftTime, j.rightTime, j.toleranceUs) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val (lKeyExprs, rKeyExprs) = (leftKeys, rightKeys)
    val (lTimeExpr, rTimeExpr) = (leftTime, rightTime)
    val tol = toleranceUs
    val (lSchema, rSchema, outSchema) = (left.output, right.output, output)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lSchema)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rSchema)
      val lTimeBound = BindReferences.bindReference(lTimeExpr, lSchema)
      val rTimeBound = BindReferences.bindReference(rTimeExpr, rSchema)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outSchema, outSchema)
      // sliding buffer: right rows of the CURRENT left key with time ≥
      // lt − tol, loaded up to lt + tol; bounded by the per-(key,
      // 2·tol) physical row rate
      val window = new scala.collection.mutable.ArrayDeque[(Long, InternalRow)]()
      var curKey: UnsafeRow = null

      lIter.flatMap { l =>
        val lk = lKeyProj(l)
        val lt = lTimeBound.eval(l).asInstanceOf[Long]
        if (curKey == null || keyOrd.compare(curKey, lk) != 0) {
          window.clear()
          curKey = lk.copy()
        }
        var advance = true
        while (advance && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKeyProj(r)
          val cmp = keyOrd.compare(rk, lk)
          if (cmp < 0) {
            rBuf.next() // right key already passed — discard
          } else if (cmp == 0) {
            val rt = rTimeBound.eval(r).asInstanceOf[Long]
            if (rt <= lt + tol) { window.append((rt, r.copy())); rBuf.next() }
            else advance = false
          } else {
            advance = false
          }
        }
        // evict rows that fell behind the band (left times ascend, so
        // they can never match a later left row either)
        while (window.nonEmpty && window.head._1 < lt - tol) window.removeHead()
        window.iterator
          .filter { case (rt, _) => math.abs(lt - rt) <= tol }
          .map { case (_, r) => resultProj(joined(l, r)) }
      }
    }
  }
}
