package graft.sources

import graft.store.SnapshotStore

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsDynamicOverwrite, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._

/** DSv2 write path for [[SnapshotDataSource]]: `INSERT OVERWRITE` /
  * `df.write.format("graft-snapshot").mode("overwrite")` becomes ONE
  * atomic snapshot commit through the store's CAS marker protocol —
  * tasks stage part files into a writer-unique `v=<n>__<token>` dir
  * (invisible to readers), and visibility flips at the no-overwrite
  * marker rename in [[SnapshotBatchWrite.commit]]. A lost CAS race
  * re-publishes the SAME staged data as the next version — staged bytes
  * are never rewritten.
  *
  * Plain append is REJECTED with guidance: a snapshot version has one
  * immutable data dir, so "append" means rewriting O(table) bytes —
  * the scale-honest paths are `INSERT OVERWRITE` (replace), a MERGE
  * ([[graft.ops.ChangeData.mergeCommit]]), or a delete commit; refusing
  * beats silently shipping a full-table copy per INSERT.
  *
  * Task failure/speculation safe: every task writes a UUID-unique file,
  * aborted tasks delete their own file, and an aborted JOB deletes the
  * whole staged dir — committed readers never see partial state.
  */
private[sources] final class SnapshotWriteBuilder(
    tablePath: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate with SupportsDynamicOverwrite {

  private var truncating = false

  override def truncate(): WriteBuilder = { truncating = true; this }

  /** Snapshot tables carry no partition columns, so "dynamic partition
    * overwrite" degenerates to a full replace — identical to truncate. */
  override def overwriteDynamicPartitions(): WriteBuilder = { truncating = true; this }

  override def build(): Write = {
    if (!truncating)
      throw new UnsupportedOperationException(
        "graft-snapshot: append would rewrite the whole snapshot; use INSERT OVERWRITE " +
          "(or SnapshotStore.commit / ChangeData.mergeCommit for incremental writes)")
    new SnapshotWrite(tablePath, info.schema())
  }
}

private[sources] final class SnapshotWrite(tablePath: String, schema: StructType) extends Write {
  override def toBatch: BatchWrite = new SnapshotBatchWrite(tablePath, schema)
}

private[sources] final class SnapshotBatchWrite(tablePath: String, schema: StructType)
    extends BatchWrite {

  private val spark = SparkSession.active
  private val stagedDir =
    s"$tablePath/v=${SnapshotStore.currentVersion(spark, tablePath).map(_ + 1).getOrElse(0L)}__${java.util.UUID.randomUUID.toString.take(8)}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // ensure the staged dir exists even for an all-empty write
    val p = new Path(stagedDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    new SnapshotWriterFactory(stagedDir, schema,
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var next = SnapshotStore.currentVersion(spark, tablePath).map(_ + 1).getOrElse(0L)
    while (!SnapshotStore.tryPublishManifest(
        spark, tablePath, next, SnapshotStore.Manifest(stagedDir, Nil, Nil,
          ts = System.currentTimeMillis())))
      next += 1 // lost the CAS race; the staged data is still valid as a later version
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(stagedDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}

private[sources] final class SnapshotWriterFactory(
    stagedDir: String, schema: StructType, conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SnapshotDataWriter(stagedDir, partitionId, schema, conf.conf)
}

private[sources] object SnapshotParquetSchema {
  /** Spark → parquet schema for the connector's atomic-type surface,
    * matching what Spark's own writer produces so connector-written and
    * engine-written snapshots interleave transparently. */
  def toMessageType(schema: StructType): MessageType = {
    val fields: Seq[Type] = schema.fields.toSeq.map { f =>
      def prim(t: PrimitiveTypeName): Types.PrimitiveBuilder[PrimitiveType] =
        if (f.nullable) Types.optional(t) else Types.required(t)
      f.dataType match {
        case LongType    => prim(PrimitiveTypeName.INT64).named(f.name)
        case IntegerType => prim(PrimitiveTypeName.INT32).named(f.name)
        case DoubleType  => prim(PrimitiveTypeName.DOUBLE).named(f.name)
        case FloatType   => prim(PrimitiveTypeName.FLOAT).named(f.name)
        case BooleanType => prim(PrimitiveTypeName.BOOLEAN).named(f.name)
        case StringType  => prim(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case TimestampType => prim(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.MICROS))
          .named(f.name)
        case TimestampNTZType => prim(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.MICROS))
          .named(f.name)
        case DateType => prim(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case other => throw new UnsupportedOperationException(
          s"graft-snapshot write: unsupported column type $other for '${f.name}'")
      }
    }
    new MessageType("spark_schema", fields: _*)
  }
}

private[sources] final class SnapshotDataWriter(
    stagedDir: String, partitionId: Int, schema: StructType, conf: Configuration)
    extends DataWriter[InternalRow] {

  private val file =
    s"$stagedDir/part-$partitionId-${java.util.UUID.randomUUID.toString.take(8)}.parquet"
  private val messageType = SnapshotParquetSchema.toMessageType(schema)
  private val factory = new SimpleGroupFactory(messageType)
  private val writer: ParquetWriter[Group] = {
    val c = new Configuration(conf)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(messageType, c)
    ExampleParquetWriter.builder(new Path(file)).withConf(c).build()
  }

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val name = schema(i).name
        schema(i).dataType match {
          case LongType | TimestampType | TimestampNTZType => g.add(name, row.getLong(i))
          case IntegerType | DateType                      => g.add(name, row.getInt(i))
          case DoubleType                                  => g.add(name, row.getDouble(i))
          case FloatType                                   => g.add(name, row.getFloat(i))
          case BooleanType                                 => g.add(name, row.getBoolean(i))
          case StringType                                  => g.add(name, row.getUTF8String(i).toString)
          case other => throw new UnsupportedOperationException(s"unsupported $other")
        }
      }
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    SnapshotCommitMessage(file)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, false)
  }

  override def close(): Unit = ()
}

private[sources] final case class SnapshotCommitMessage(file: String) extends WriterCommitMessage
