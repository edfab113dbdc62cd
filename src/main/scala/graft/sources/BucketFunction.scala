package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** The V2 `bucket` function backing storage-partitioned joins over
  * [[graft.store.SnapshotStore.bucketedCommit]] tables.
  *
  * Spark resolves a scan's `bucket(n, cols)` transform through the
  * table's FUNCTION catalog before it will key-group partitions; the
  * bound function must compute exactly the row→bucket route the WRITER
  * used, because Spark may evaluate it (partially-clustered
  * distributions, missing-partition fill-in). The writer routes via
  * `df.repartition(n, cols)` = Spark's own HashPartitioning, i.e.
  * `pmod(murmur3(cols, seed = 42), n)` with the multi-column hash
  * CHAINED (each column's hash seeds the next) — reproduced here on
  * the unsafe Murmur3 primitives.
  *
  * `canonicalName` is the compatibility token two join sides compare;
  * it is stable across catalog instances by construction. */
/** Shared write-side distribution for bucketed layouts — ONE home for
  * the "cluster by the bucket columns into EXACTLY n partitions"
  * requirement (HashPartitioning then makes the write-task id the
  * bucket id), so the CTAS staging path and the INSERT/streaming path
  * can never route rows differently while stamping the same
  * `bucket=` tag. */
private[sources] trait BucketDistribution
    extends org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  def bucketSpec: Option[(Seq[String], Int)]

  /** Partition-transform layout ([[graft.store.PartitionSpec]]): the
    * write requires a LOCAL sort by the source columns, so the rolling
    * partitioned writer sees each partition value as one contiguous
    * run and emits one file per (task, partition) — the same local
    * sort Spark's own FileFormatWriter plans for partitioned inserts.
    * By default no distribution requirement: appends are usually
    * day-aligned already, and a shuffle per insert would tax the
    * common case. Opt-in WRITE DISTRIBUTION MODES change that for the
    * restatement / backfill shapes where input partitioning is
    * adversarial (every task holds rows of every partition → #tasks ×
    * #partitions small files):
    *
    *  - `spark.graft.write.distribution = hash`: cluster the shuffle
    *    by the partition SOURCE columns, non-strict, with
    *    [[advisoryPartitionSizeInBytes]] — AQE's size-targeted
    *    rebalance then coalesces small clusters together and splits
    *    skewed ones, and the local sort turns each task into one file
    *    per contiguous partition run: total files ≈
    *    max(#partitions, bytes / target) instead of #tasks ×
    *    #partitions.
    *  - `= range`: globally ordered by the source columns — same file
    *    budget, plus cross-file non-overlap for range-predicate
    *    skipping.
    *  - `= none` (default): today's behavior.
    *
    * `spark.graft.write.targetFileSizeBytes` (default 128 MiB) is the
    * advisory — it measures UNCOMPRESSED shuffle bytes, so parquet
    * files land smaller by roughly the codec ratio. A bucketed layout
    * ignores the mode: its distribution is the bucket contract
    * (exactly n partitions, strict), and Spark refuses advisory sizes
    * alongside a required partition count. */
  def partSpec: Seq[graft.store.PartitionSpec.PartField] = Nil

  private def distributionMode: String =
    org.apache.spark.sql.SparkSession.active.conf
      .get("spark.graft.write.distribution", "none")

  override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
    bucketSpec match {
      case Some((cols, _)) =>
        org.apache.spark.sql.connector.distributions.Distributions.clustered(
          cols.map(c => org.apache.spark.sql.connector.expressions.Expressions.column(c)
            : org.apache.spark.sql.connector.expressions.Expression).toArray)
      case None => distributionMode match {
        case "hash" if partSpec.nonEmpty =>
          org.apache.spark.sql.connector.distributions.Distributions.clustered(
            partSpec.map(f => org.apache.spark.sql.connector.expressions.Expressions.column(f.col)
              : org.apache.spark.sql.connector.expressions.Expression).toArray)
        case "range" if partSpec.nonEmpty =>
          org.apache.spark.sql.connector.distributions.Distributions.ordered(
            partSpec.map(f => org.apache.spark.sql.connector.expressions.Expressions.sort(
              org.apache.spark.sql.connector.expressions.Expressions.column(f.col),
              org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)).toArray)
        case "none" | "hash" | "range" =>
          org.apache.spark.sql.connector.distributions.Distributions.unspecified()
        case other => throw new IllegalArgumentException(
          s"spark.graft.write.distribution must be none|hash|range, got '$other'")
      }
    }
  /** Strict only for the bucket contract (the task id IS the bucket
    * id); hash/range are throughput hints AQE may rebalance. */
  override def distributionStrictlyRequired(): Boolean = bucketSpec.isDefined
  override def requiredNumPartitions(): Int = bucketSpec.map(_._2).getOrElse(0)
  override def advisoryPartitionSizeInBytes(): Long =
    if (bucketSpec.isEmpty && partSpec.nonEmpty && distributionMode != "none")
      org.apache.spark.sql.SparkSession.active.conf
        .get("spark.graft.write.targetFileSizeBytes", (128L << 20).toString).toLong
    else 0L
  override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    partSpec.map(f => org.apache.spark.sql.connector.expressions.Expressions.sort(
      org.apache.spark.sql.connector.expressions.Expressions.column(f.col),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)).toArray
}

object BucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, cols...): pmod(murmur3(cols, 42), n) — the snapshot store's bucketed-commit route"

  /** Types whose hash we reproduce bit-for-bit from HashPartitioning.
    * Anything else refuses to bind: transform resolution then fails and
    * Spark simply plans without key grouping (correct, just shuffled). */
  private def hashable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DateType |
        TimestampType | TimestampNTZType | StringType | BooleanType => true
    case _ => false
  }

  override def bind(inputType: StructType): BoundFunction = {
    // every refusal is UnsupportedOperationException — the soft-failure
    // type Spark's function resolution treats as "plan without this",
    // so a direct SQL invocation gets the designed refusal, not a raw
    // IllegalArgumentException
    if (inputType.fields.length < 2) throw new UnsupportedOperationException(
      s"bucket expects (numBuckets, col, ...), got $inputType")
    if (inputType.fields.head.dataType != IntegerType) throw new UnsupportedOperationException(
      s"bucket's first argument is the bucket count (int), got ${inputType.fields.head.dataType}")
    val keyTypes = inputType.fields.tail.map(_.dataType)
    keyTypes.foreach(t => if (!hashable(t)) throw new UnsupportedOperationException(
      s"bucket: unsupported key type $t (supported: integral/date/timestamp/string/boolean)"))
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = IntegerType +: keyTypes
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.snapshot.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        var h = 42
        var i = 0
        while (i < keyTypes.length) {
          val ord = i + 1
          // null columns leave the seed unchanged — Murmur3Hash semantics
          if (!input.isNullAt(ord)) h = keyTypes(i) match {
            case LongType | TimestampType | TimestampNTZType =>
              Murmur3_x86_32.hashLong(input.getLong(ord), h)
            case IntegerType | DateType =>
              Murmur3_x86_32.hashInt(input.getInt(ord), h)
            case ShortType => Murmur3_x86_32.hashInt(input.getShort(ord).toInt, h)
            case ByteType => Murmur3_x86_32.hashInt(input.getByte(ord).toInt, h)
            case BooleanType => Murmur3_x86_32.hashInt(if (input.getBoolean(ord)) 1 else 0, h)
            case StringType =>
              val s = input.getUTF8String(ord)
              Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), h)
            case other => throw new IllegalStateException(s"unreachable: $other")
          }
          i += 1
        }
        ((h % n) + n) % n // pmod: HashPartitioning.partitionIdExpression
      }
    }
  }
}
