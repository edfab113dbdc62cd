package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Native grouped top-k — the third whole-operator extension: keep the
  * first `k` rows per group under a total order, WITHOUT sorting any
  * group.
  *
  * The window form (`row_number() ≤ k`) sorts every group's complete
  * row set inside each reducer partition; the typed-Aggregator form
  * ([[graft.ops.TopK]]) fixes the shuffle volume but pays
  * serialization in and out of the aggregation buffer and only carries
  * (value, id) pairs. This operator plans like partial aggregation —
  * a map-side [[TopKPerGroupExec]] with `partial = true` reduces each
  * input partition to ≤ k WHOLE ROWS per (group × partition) with a
  * bounded binary heap, the single hash exchange on the group keys
  * moves only those survivors, and the final exec re-applies the same
  * heap per group. No sort anywhere; shuffle volume is
  * O(groups × k × map partitions) rows, independent of fact size.
  *
  * Memory: heaps hold (groups-per-partition × k) row copies. The
  * partial stage additionally FLUSHES itself downstream whenever it is
  * tracking more than [[TopKPerGroupExec.FlushGroups]] groups — a
  * flushed superset is still a correct partial result (the final stage
  * re-filters), so group-cardinality explosions degrade to
  * pass-through instead of OOM, exactly the hash-aggregation fallback
  * contract.
  *
  * Determinism contract: the caller makes `order` a TOTAL order within
  * each group (append a unique tiebreak column, as with row_number),
  * else the k-th kept row is heap-order-dependent.
  */
case class TopKPerGroup(
    child: LogicalPlan,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerGroup =>
      val partial =
        TopKPerGroupExec(planLater(t.child), t.groupExprs, t.order, t.k, partial = true)
      TopKPerGroupExec(partial, t.groupExprs, t.order, t.k, partial = false) :: Nil
    case _ => Nil
  }
}

object TopKPerGroupExec {
  /** Partial-stage group cap before a self-flush (final never flushes). */
  val FlushGroups: Int = 1 << 18
}

case class TopKPerGroupExec(
    child: SparkPlan,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val gExprs = groupExprs
    val ord = order
    val kk = k
    val isPartial = partial
    val schema = child.output
    child.execute().mapPartitions({ it =>
      val groupProj = UnsafeProjection.create(gExprs, schema)
      // best-first total order; PriorityQueue's head is the MAX under
      // it, i.e. the worst kept row — the eviction candidate
      implicit val rowOrd: Ordering[InternalRow] = RowOrdering.create(ord, schema)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]

      def offer(row: InternalRow): Unit = {
        val key = groupProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kk) h.enqueue(row.copy())
            else if (rowOrd.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow]
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
        }
      }

      def drain(): Iterator[InternalRow] = {
        val snapshot = heaps.values.toArray
        heaps.clear()
        // emit best-first inside each group (dequeue order is worst-first)
        snapshot.iterator.flatMap(h => h.dequeueAll.reverseIterator)
      }

      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false
        override def hasNext: Boolean = {
          while (!out.hasNext && !inputDone) {
            var flush = false
            while (!flush && it.hasNext) {
              offer(it.next())
              if (isPartial && heaps.size >= TopKPerGroupExec.FlushGroups) flush = true
            }
            if (!it.hasNext && !flush) inputDone = true
            if (flush || inputDone) out = drain()
          }
          out.hasNext
        }
        override def next(): InternalRow = out.next()
      }
    }, preservesPartitioning = true)
  }
}
