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

/** DSv2 write path for [[SnapshotDataSource]]: both `INSERT OVERWRITE`
  * and `INSERT INTO` become ONE atomic snapshot commit through the
  * store's CAS marker protocol — tasks stage part files into a
  * writer-unique `v=<n>__<token>` dir (invisible to readers), and
  * visibility flips at the no-overwrite marker rename in
  * [[SnapshotBatchWrite.commit]]. A lost CAS race re-links the SAME
  * staged files as the next version — staged bytes are never rewritten.
  *
  * `INSERT INTO` (append) publishes a FILE-GRANULAR manifest: the
  * predecessor's data files plus exactly the files this job's committed
  * tasks reported — an O(new-files) commit, the incremental-load shape
  * the reference's Silver layer runs daily (`bronze_to_silver.py:116`).
  * Append is refused only while deletion vectors are live (the store's
  * DVs are key-based and table-wide, so re-inserting a deleted key
  * would silently suppress the new row — compact first).
  *
  * Task failure/speculation safe at FILE granularity: the manifest
  * lists only the files named in the collected [[SnapshotCommitMessage]]s
  * (exactly one per committed task), and [[SnapshotBatchWrite.commit]]
  * deletes any stray file a lost task attempt left in the staged dir
  * before publishing. An aborted JOB deletes the whole staged dir —
  * committed readers never see partial state.
  */
private[sources] final class SnapshotWriteBuilder(
    tablePath: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate with SupportsDynamicOverwrite
    with org.apache.spark.sql.connector.write.SupportsOverwriteV2 {

  private var mode: String = "append"
  private var overwritePreds
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = Array.empty

  override def truncate(): WriteBuilder = { mode = "truncate"; this }

  /** Predicate-scoped overwrite (`df.writeTo(t).overwrite(cond)` —
    * REPLACE WHERE, round 15): atomically replace exactly the rows the
    * predicate matches ([[SnapshotMetadataDelete.overwriteWhere]]).
    * `canOverwrite` admits only predicates the sidecar classifier and
    * the survivor rewrite can BOTH reason about — anything else gets
    * Spark's loud table-does-not-support refusal instead of a guess.
    * (Spark routes the always-true case to [[truncate]] first.) */
  override def canOverwrite(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean = SnapshotMetadataDelete.translate(predicates).isDefined

  override def overwrite(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : WriteBuilder = {
    mode = "overwrite-where"; overwritePreds = predicates; this
  }

  /** Dynamic partition overwrite (round 15): on an internally
    * partitioned snapshot table, replace exactly the partitions the
    * batch touches ([[SnapshotStore.dynamicOverwriteCommit]]) — the
    * restatement workflow. On a table with no partition layout it
    * keeps Spark's unpartitioned-table contract: a full replace. */
  override def overwriteDynamicPartitions(): WriteBuilder = { mode = "dynamic"; this }

  override def build(): Write =
    new SnapshotWrite(tablePath, info.schema(), mode, overwritePreds)
}

private[sources] final class SnapshotWrite(
    tablePath: String, schema: StructType, mode: String,
    overwritePreds: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
      Array.empty) extends Write
    with BucketDistribution {

  private def append: Boolean = mode == "append"

  /** The head's bucketed layout, resolved ONCE at write build: when
    * present, [[BucketDistribution]] requires the input clustered by
    * the bucket columns into EXACTLY n partitions — the staged
    * `part-<id>` names then carry the bucket id and the committed
    * manifest keeps the `bucket=` tag, so `INSERT INTO` /
    * `INSERT OVERWRITE` / the streaming sink all PRESERVE co-location
    * instead of silently dropping it. */
  private val headManifest: Option[SnapshotStore.Manifest] =
    SnapshotStore.currentVersion(SparkSession.active, tablePath)
      .map(v => SnapshotStore.manifest(SparkSession.active, tablePath, v))

  override val bucketSpec: Option[(Seq[String], Int)] =
    headManifest.filter(_.bucketN > 0).map(m => (m.bucketCols, m.bucketN))

  /** The head's partition-transform layout: INSERT INTO / INSERT
    * OVERWRITE route rows into `__gpN=` partition dirs (the rolling
    * writer + the required local sort), so incremental SQL loads keep
    * partition pruning. A batch missing a source column writes
    * unrouted (files merely unprunable). */
  override val partSpec: Seq[graft.store.PartitionSpec.PartField] =
    headManifest.map(_.partSpec).getOrElse(Nil)
      .filter(f => schema.fieldNames.contains(f.col)) match {
      case s if headManifest.exists(_.partSpec.nonEmpty) &&
          s.size == headManifest.map(_.partSpec.size).getOrElse(0) => s
      case _ => Nil // partial source columns → no routing, no sort
    }

  /** Spec generation of [[partSpec]] — routed directories carry it in
    * their names (`__g<gen>pN=`), so files written under different
    * generations prune under exactly the spec that wrote them. */
  private val partGen: Int = headManifest.map(_.partGen).getOrElse(0)

  // dynamic overwrite on a PARTITIONED table must be able to route
  // every row — a batch missing a partition source column would fall
  // back to an unrouted stage, which on this path would silently
  // replace the whole table. Refuse at write build, not at commit.
  if (mode == "dynamic" && headManifest.exists(_.partSpec.nonEmpty) && partSpec.isEmpty)
    throw new UnsupportedOperationException(
      s"dynamic INSERT OVERWRITE on $tablePath: the batch is missing partition source " +
        s"column(s) of spec ${headManifest.map(_.partSpec.map(_.describe).mkString(", ")).getOrElse("")} " +
        "— rows cannot be routed to their partitions. Include the column(s), or use " +
        "static INSERT OVERWRITE for a full replace")

  override def toBatch: BatchWrite =
    new SnapshotBatchWrite(tablePath, schema,
      // dynamic mode on an UNpartitioned table keeps Spark's contract:
      // full replace, i.e. the truncate path
      if (mode == "dynamic" && partSpec.isEmpty) "truncate" else mode,
      bucketSpec, partSpec, partGen, overwritePreds)

  /** Structured Streaming SINK: each micro-batch commits as one
    * O(new-files) append version, EXACTLY-ONCE — the epoch id rides the
    * manifest's `src=` line (atomic with the data), so a replayed epoch
    * (crash between sink commit and checkpoint advance) is detected and
    * skipped instead of appending twice. Combined with the change-feed
    * SOURCE, snapshot tables now sit in the middle of a streaming
    * pipeline: stream in (append versions) and stream out ('insert'
    * deltas per commit). Append output mode only — complete/update
    * would need a rewrite per batch, which is the batch INSERT
    * OVERWRITE's job. Like every snapshot surface, the TABLE must be
    * born from a first commit before the stream starts (seed an empty
    * snapshot with the schema: `SnapshotStore.commit(df.limit(0), t)`)
    * — the provider resolves the sink schema from the table. */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    if (!append) throw new UnsupportedOperationException(
      "graft-snapshot streaming sink supports APPEND output mode only " +
        "(complete/update rewrite the table every batch — use batch INSERT OVERWRITE)")
    new SnapshotStreamingWrite(tablePath, schema, bucketSpec, partSpec, partGen)
  }
}

private[sources] final class SnapshotStreamingWrite(
    tablePath: String, schema: StructType,
    bucketSpec: Option[(Seq[String], Int)] = None,
    partSpec: Seq[graft.store.PartitionSpec.PartField] = Nil,
    partGen: Int = 0)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val spark = SparkSession.active
  // stable per sink instance: every task of an epoch stages into the
  // SAME deterministic dir; a restarted query gets a fresh token and its
  // replayed epoch's stray stage is vacuum-swept (never referenced)
  private val queryTok = java.util.UUID.randomUUID.toString.take(8)
  private def stagedDir(epochId: Long) = s"$tablePath/v=${epochId}__stream$queryTok"

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new SnapshotStreamingWriterFactory(tablePath, queryTok, schema,
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration), partSpec, partGen,
      // enforced CHECK constraints, resolved ONCE on the driver and
      // evaluated per row in the writers — the analyzer injects this
      // for batch V2 writes but not for streaming ones
      checks = graft.store.TableChecks.violationExprs(spark, tablePath, schema))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // exactly-once replay guard: the newest CURSOR commit's src=
    // records the last epoch this table applied; an at-least-once
    // re-delivery drops out here. Resolved through lastAppliedSrcV so
    // an interleaved maintenance commit (analyze/compact, srcV = -1)
    // or a write-audit-publish fastForward between the epoch commit
    // and its replay can neither reset the guard (double-append) nor
    // masquerade a table version as an applied epoch (skipped epoch).
    val applied = SnapshotStore.lastAppliedSrcV(spark, tablePath)
    val committed = SnapshotWriteUtil.committedFiles(messages)
    val sd = new Path(stagedDir(epochId))
    val fs = sd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (applied >= epochId) {
      if (fs.exists(sd)) fs.delete(sd, true) // replayed stage: drop, don't double-append
      return
    }
    SnapshotWriteUtil.sweepStaged(fs, sd, committed.map(f => new Path(f).getName).toSet)
    if (committed.nonEmpty)
      SnapshotStore.appendFilesCommit(spark, tablePath, committed,
        stagedExact = true, srcV = epochId, routedBucket = bucketSpec)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val sd = new Path(stagedDir(epochId))
    val fs = sd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(sd)) fs.delete(sd, true)
  }
}

private[sources] final class SnapshotStreamingWriterFactory(
    tablePath: String, queryTok: String, schema: StructType, conf: SerializableHadoopConf,
    partSpec: Seq[graft.store.PartitionSpec.PartField] = Nil,
    partGen: Int = 0,
    checks: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] = Nil)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    val dir = s"$tablePath/v=${epochId}__stream$queryTok"
    // streaming writers are FULLY lazy (an empty micro-batch must
    // commit no version), partitioned or not
    val inner: DataWriter[InternalRow] =
      if (partSpec.isEmpty)
        new SnapshotDataWriter(dir, partitionId, schema, conf.conf, eagerPartitionZero = false)
      else
        new SnapshotPartitionedDataWriter(dir, partitionId, schema, partSpec, conf.conf,
          eagerPartitionZero = false, gen = partGen)
    if (checks.isEmpty) inner
    else new CheckedDataWriter(inner, tablePath, schema, checks, partitionId)
  }
}

/** Per-row CHECK-constraint enforcement around a data writer: each
  * violation expression (TRUE exactly when the row violates — see
  * [[graft.store.TableChecks.violationExprs]]) compiles ONCE per task
  * into a codegen'd predicate; a violating row fails the task, which
  * fails the epoch before its stage can commit. */
private[sources] final class CheckedDataWriter(
    inner: DataWriter[InternalRow], tablePath: String, schema: StructType,
    checks: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    partitionId: Int)
    extends DataWriter[InternalRow] {
  private lazy val preds = checks.map { case (name, e) =>
    // expressions arrive pre-bound (ordinal BoundReferences over the
    // write schema) — codegen compiles them directly
    val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(e)
    p.initialize(partitionId)
    (name, p)
  }
  override def write(row: InternalRow): Unit = {
    preds.foreach { case (name, p) =>
      if (p.eval(row))
        throw new IllegalArgumentException(
          s"streaming write to $tablePath violates CHECK constraint '$name'")
    }
    inner.write(row)
  }
  override def commit(): WriterCommitMessage = inner.commit()
  override def abort(): Unit = inner.abort()
  override def close(): Unit = inner.close()
}

private[sources] final class SnapshotBatchWrite(
    tablePath: String, schema: StructType, mode: String,
    bucketSpec: Option[(Seq[String], Int)] = None,
    partSpec: Seq[graft.store.PartitionSpec.PartField] = Nil,
    partGen: Int = 0,
    overwritePreds: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
      Array.empty)
    extends BatchWrite {

  private def append: Boolean = mode == "append"

  private val spark = SparkSession.active
  private val stagedDir =
    s"$tablePath/v=${SnapshotStore.currentVersion(spark, tablePath).map(_ + 1).getOrElse(0L)}__${java.util.UUID.randomUUID.toString.take(8)}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // ensure the staged dir exists even for an all-empty write
    val p = new Path(stagedDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    new SnapshotWriterFactory(stagedDir, schema,
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration), partSpec, partGen)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // the COMMITTED task set defines the snapshot: only files named in
    // the collected messages ship; anything else in the staged dir is a
    // lost task attempt (executor crash before abort, defeated
    // speculative run) and is deleted before the publish
    val committed = SnapshotWriteUtil.committedFiles(messages)
    val fs = new Path(stagedDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SnapshotWriteUtil.sweepStaged(fs, new Path(stagedDir),
      committed.map(f => new Path(f).getName).toSet)

    // one shared home for the publish protocols (SnapshotDataWriter
    // never truncates stats, so the staged side is always exact)
    if (append)
      SnapshotStore.appendFilesCommit(spark, tablePath, committed, stagedExact = true,
        routedBucket = bucketSpec)
    else if (mode == "dynamic") {
      // empty batch touches no partitions — Spark's dynamic contract
      // makes that a no-op, never a truncate
      if (committed.nonEmpty)
        SnapshotStore.dynamicOverwriteCommit(spark, tablePath, committed,
          partSpec, partGen, stagedExact = true)
    } else if (mode == "overwrite-where")
      // REPLACE WHERE: an EMPTY batch still deletes the matching rows
      SnapshotMetadataDelete.overwriteWhere(spark, tablePath, committed, overwritePreds)
    else
      SnapshotStore.rewriteFilesCommit(spark, tablePath, committed, statsExact = true,
        bucketCols = bucketSpec.map(_._1).getOrElse(Nil),
        bucketN = bucketSpec.map(_._2).getOrElse(0),
        // a full overwrite re-routed every row under the current
        // generation — no history survives it
        partSpec = partSpec, partGen = partGen, schema = Some(schema))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(stagedDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}

private[sources] final class SnapshotWriterFactory(
    stagedDir: String, schema: StructType, conf: SerializableHadoopConf,
    partSpec: Seq[graft.store.PartitionSpec.PartField] = Nil,
    partGen: Int = 0)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    if (partSpec.isEmpty) new SnapshotDataWriter(stagedDir, partitionId, schema, conf.conf)
    else new SnapshotPartitionedDataWriter(stagedDir, partitionId, schema, partSpec, conf.conf,
      gen = partGen)
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
    stagedDir: String, partitionId: Int, schema: StructType, conf: Configuration,
    eagerPartitionZero: Boolean = true)
    extends DataWriter[InternalRow] {

  private val file =
    s"$stagedDir/part-$partitionId-${java.util.UUID.randomUUID.toString.take(8)}.parquet"
  private val messageType = SnapshotParquetSchema.toMessageType(schema)
  private val factory = new SimpleGroupFactory(messageType)
  private var writer: ParquetWriter[Group] = null
  private def openWriter(): ParquetWriter[Group] = {
    val c = new Configuration(conf)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(messageType, c)
    ExampleParquetWriter.builder(new Path(file)).withConf(c).build()
  }
  // partition 0 opens its file eagerly so even an all-empty BATCH write
  // ships one schema-bearing parquet file (readers infer schema from
  // data files); every OTHER empty partition stays fileless — an append
  // of a small batch commits O(non-empty partitions) files, not
  // O(partitions). Streaming writers are fully lazy instead: an empty
  // micro-batch must produce ZERO files so no version is committed
  if (eagerPartitionZero && partitionId == 0) writer = openWriter()

  override def write(row: InternalRow): Unit = {
    if (writer == null) writer = openWriter()
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
    if (writer == null) SnapshotCommitMessage(None)
    else { writer.close(); SnapshotCommitMessage(Some(file)) }
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close() catch { case _: Exception => () }
      val p = new Path(file)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }

  override def close(): Unit = ()
}

private[sources] final case class SnapshotCommitMessage(file: Option[String])
    extends WriterCommitMessage

/** Multi-file task message — the partitioned rolling writer commits one
  * file per (task, partition value). `emptyFallback` is task 0's
  * schema-bearing root file, used ONLY when the whole job produced no
  * routed files (an all-empty INSERT OVERWRITE must still ship one
  * file for readers to resolve a schema from); any other outcome
  * leaves it unreferenced and the staged-dir sweep removes it. */
private[sources] final case class SnapshotFilesCommitMessage(
    files: Seq[String], emptyFallback: Option[String] = None)
    extends WriterCommitMessage

private[sources] object SnapshotWriteUtil {
  /** Files named by COMMITTED task messages (single- and multi-file).
    * Task 0's empty-batch fallback file counts only when NO task wrote
    * a real file — otherwise an empty input partition 0 would plant an
    * unrouted root file next to the partition directories. */
  def committedFiles(messages: Array[WriterCommitMessage]): Seq[String] = {
    val real = messages.toSeq.flatMap {
      case SnapshotCommitMessage(f)          => f.toSeq
      case SnapshotFilesCommitMessage(fs, _) => fs
      case _                                 => Nil
    }
    if (real.nonEmpty) real
    else messages.toSeq.flatMap {
      case SnapshotFilesCommitMessage(_, fb) => fb.toSeq
      case _                                 => Nil
    }.take(1)
  }

  /** Delete every file under `dir` (recursively — partition-routed
    * stages nest `__gpN=` dirs) whose NAME is not in `keep`, then prune
    * emptied subdirectories. File names are writer-unique (uuid), so
    * name identity is sufficient. */
  def sweepStaged(
      fs: org.apache.hadoop.fs.FileSystem, dir: Path, keep: Set[String]): Unit = {
    def walk(p: Path): Boolean = { // returns "anything kept below"
      var any = false
      fs.listStatus(p).foreach { s =>
        if (s.isDirectory) {
          if (walk(s.getPath)) any = true
          else fs.delete(s.getPath, true)
        } else if (keep.contains(s.getPath.getName)) any = true
        else fs.delete(s.getPath, false)
      }
      any
    }
    if (fs.exists(dir)) { walk(dir); () }
  }
}

/** Rolling PARTITIONED task writer: rows arrive locally sorted by the
  * partition source columns (the write's `requiredOrdering`), so each
  * transformed value is one contiguous run — the writer closes the
  * current file and opens the next under the new `__gpN=<value>`
  * directory when the derived value changes. An out-of-order row
  * (ordering not applied — defensive) simply opens another file in the
  * revisited directory; uuid file names never collide. */
private[sources] final class SnapshotPartitionedDataWriter(
    stagedDir: String, partitionId: Int, schema: StructType,
    spec: Seq[graft.store.PartitionSpec.PartField], conf: Configuration,
    eagerPartitionZero: Boolean = true,
    gen: Int = 0)
    extends DataWriter[InternalRow] {

  private val ords = spec.map(f => schema.fieldIndex(f.col)).toArray
  private val dts = spec.map(f => schema(f.col).dataType).toArray
  private var cur: SnapshotDataWriter = null
  private var curSuffix: String = null
  private val done = scala.collection.mutable.ArrayBuffer.empty[String]

  private def valueOf(row: InternalRow, i: Int): Option[String] = {
    val o = ords(i)
    if (row.isNullAt(o)) None
    else {
      val raw: Any = dts(i) match {
        case LongType | TimestampType | TimestampNTZType => row.getLong(o)
        case IntegerType | DateType                      => row.getInt(o)
        case ShortType                                   => row.getShort(o)
        case ByteType                                    => row.getByte(o)
        case BooleanType                                 => row.getBoolean(o)
        case StringType                                  => row.getUTF8String(o).toString
        case other => throw new UnsupportedOperationException(
          s"unsupported partition source type $other")
      }
      Some(graft.store.PartitionSpec.renderValue(spec(i), dts(i), raw))
    }
  }

  override def write(row: InternalRow): Unit = {
    val suffix = graft.store.PartitionSpec.dirSuffix(
      spec, spec.indices.map(i => valueOf(row, i)), gen)
    if (suffix != curSuffix) {
      closeCurrent()
      cur = new SnapshotDataWriter(s"$stagedDir/$suffix", partitionId, schema, conf,
        eagerPartitionZero = false)
      curSuffix = suffix
    }
    cur.write(row)
  }

  private def closeCurrent(): Unit = if (cur != null) {
    cur.commit() match {
      case SnapshotCommitMessage(Some(f)) => done += f
      case _                              => ()
    }
    cur = null
  }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    if (done.isEmpty && eagerPartitionZero && partitionId == 0) {
      // ALL-EMPTY batch write needs ONE schema-bearing file for readers
      // to resolve — but this task cannot know whether its SIBLINGS
      // wrote rows, so the root file ships as a FALLBACK the job-level
      // commit uses only when no task produced a routed file (an empty
      // input partition 0 must never plant an unrouted root file next
      // to real partition dirs)
      val w = new SnapshotDataWriter(stagedDir, partitionId, schema, conf)
      val fb = w.commit() match {
        case SnapshotCommitMessage(f) => f
        case _                        => None
      }
      SnapshotFilesCommitMessage(Nil, fb)
    } else SnapshotFilesCommitMessage(done.toSeq)
  }

  override def abort(): Unit = {
    // already-rolled files of this failed attempt stay in the staged
    // dir; the job-level sweep (no message from this task) removes them
    if (cur != null) cur.abort()
  }

  override def close(): Unit = if (cur != null) cur.close()
}
