package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketches (Apache DataSketches KLL) as native
  * Catalyst aggregates — the histogram analog of Spark's own
  * `hll_sketch_agg`/`hll_union_agg` pair, which Spark does not ship
  * for quantiles. The analyze pass aggregates one KLL sketch per
  * (file, column); plan time merges the kept files' sketches (KLL
  * merge is lossless in rank-error terms) and cuts equi-height
  * histogram bins from the merged quantiles for the CBO.
  *
  * Values are the column's CATALYST-INTERNAL numerics (dates as epoch
  * days, timestamps as epoch micros) cast to double — the same value
  * space `ColumnStat.min/max` and `FilterEstimation`'s literal
  * conversion use, so histogram bins compare directly against pushed
  * predicate bounds. At the default k=200 the normalized rank error is
  * ~1.65% — far inside CBO usefulness. */
private[graft] object KllSketches {
  val DefaultK = 200

  /** Column types a quantile histogram is defined over (matches what
    * Spark's own `ANALYZE ... FOR COLUMNS` histograms support). */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
        DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  def toDouble(dt: DataType): Any => Double = dt match {
    case DoubleType                                  => v => v.asInstanceOf[Double]
    case FloatType                                   => v => v.asInstanceOf[Float].toDouble
    case LongType | TimestampType | TimestampNTZType => v => v.asInstanceOf[Long].toDouble
    case IntegerType | DateType                      => v => v.asInstanceOf[Int].toDouble
    case ShortType                                   => v => v.asInstanceOf[Short].toDouble
    case ByteType                                    => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType                              => v => v.asInstanceOf[Decimal].toDouble
    case other => throw new UnsupportedOperationException(
      s"kll_sketch_agg over $other (supported: numeric/date/timestamp)")
  }
}

/** Aggregate raw column values into one serialized KLL doubles sketch.
  * NULL inputs are skipped; an all-null group evaluates to NULL (the
  * same contract as `hll_sketch_agg`, so sidecar coverage logic treats
  * both sketch kinds identically). */
case class KllSketchAgg(
    child: Expression,
    k: Int = KllSketches.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  @transient private lazy val asDouble = KllSketches.toDouble(child.dataType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(asDouble(v))
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }
  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_sketch_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union pre-serialized KLL sketches (binary column) — the
  * `hll_union_agg` analog, used by the DISTRIBUTED plan-time path to
  * merge a big sidecar's per-file sketches in executors so only one
  * merged sketch per column reaches the driver. */
case class KllMergeAgg(
    child: Expression,
    k: Int = KllSketches.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }
  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_merge_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}
