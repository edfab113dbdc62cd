package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftbridge.Bridge

/** Partial-aggregable top-k: the scale path for "top k rows per group".
  *
  * The window-function form (`row_number` ≤ k, `w4_topn_group`) sorts
  * EVERY group's full row set inside each partition before discarding all
  * but k rows. This typed [[Aggregator]] instead keeps a k-element
  * bounded buffer per group on the MAP side; partials merge by merging
  * two k-buffers, so the shuffle carries O(groups × k) tuples no matter
  * how many fact rows feed it — at 100 TB that is the difference between
  * shuffling kilobytes and sorting terabytes. Results are identical
  * (same oracle shape as w4): descending by value, ties broken by
  * ascending id.
  */
object TopK {

  /** DataFrame API over the NATIVE grouped top-k operator
    * ([[graft.plans.TopKPerGroup]] → partial + final
    * `TopKPerGroupExec`): whole input rows, arbitrary multi-column
    * ordering, heap-bounded memory, no sort, one exchange.
    *
    * @param orderCols (column, descending?) pairs; make the order total
    *                  within a group (append a unique tiebreak column)
    *                  for deterministic results. */
  def nativePerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    Bridge.ofRows(df.sparkSession, graft.plans.TopKPerGroup(
      plan,
      groupCols.map(attr),
      orderCols.map { case (c, desc) =>
        SortOrder(attr(c), if (desc) Descending else Ascending)
      },
      k))
  }

  /** Bounded buffer as parallel arrays (product-encodable without
    * ExpressionEncoder plumbing); invariant: sorted desc by value, ties
    * asc by id, length ≤ k. */
  final case class Buf(vs: Seq[Double], ids: Seq[Long])

  final case class TopKByValue(k: Int)
      extends Aggregator[(Double, Long), Buf, Buf] {

    private def cap(pairs: Seq[(Double, Long)]): Buf = {
      val kept = pairs.sortBy(t => (-t._1, t._2)).take(k)
      Buf(kept.map(_._1), kept.map(_._2))
    }

    override def zero: Buf = Buf(Nil, Nil)

    override def reduce(b: Buf, a: (Double, Long)): Buf = {
      // skip the sort when the buffer is full and a is out of range
      if (b.vs.length >= k) {
        val worstV = b.vs.last
        val worstId = b.ids.last
        if (a._1 < worstV || (a._1 == worstV && a._2 > worstId)) return b
      }
      cap(b.vs.zip(b.ids) :+ a)
    }

    override def merge(b1: Buf, b2: Buf): Buf =
      cap(b1.vs.zip(b1.ids) ++ b2.vs.zip(b2.ids))

    override def finish(r: Buf): Buf = r

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
