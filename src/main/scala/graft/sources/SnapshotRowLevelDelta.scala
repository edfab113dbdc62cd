package graft.sources

import graft.store.{FileStats, SnapshotStore}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** MERGE-ON-READ row-level commands (`SupportsDelta` / `WriteDelta`) —
  * the O(delta) alternative to the copy-on-write plan: instead of
  * rewriting every touched FILE, one commit publishes
  *
  *  - a new SCOPED deletion vector holding the deleted/updated rows'
  *    KEYS (covering only the files that existed at the base version —
  *    re-inserted keys in the fresh files survive by construction), and
  *  - the inserted/updated rows as fresh appended files,
  *
  * so a 10-row MERGE against a 10 000-file table writes ~10 keys + one
  * small data file and moves nothing else. Reads pay the store's
  * merge-on-read price (columnar DV probe) until a compacting rewrite
  * materializes the DVs away — exactly the Iceberg/Delta MoR trade.
  *
  * Row identity is the table's KEY COLUMNS (`rowId()`): the session
  * conf `spark.graft.rowlevel.keys` (comma-separated), falling back to
  * the keys the table's existing DVs already use. Updates arrive as
  * delete+insert pairs (`representUpdateAsDeleteAndInsert`), which is
  * precisely the DV+append decomposition.
  *
  * Mode selection: `spark.graft.rowlevel.mode=merge-on-read` (default
  * `copy-on-write` — see [[SnapshotRowLevelOperation]]). Small, hot
  * deltas → merge-on-read; large rewrites → copy-on-write, which also
  * re-materializes accumulated DVs.
  */
private[sources] final class SnapshotDeltaOperation(
    tablePath: String,
    m: SnapshotStore.Manifest,
    tableSchema: StructType,
    cmd: Command,
    keyCols: Seq[String])
    extends RowLevelOperation with org.apache.spark.sql.connector.write.SupportsDelta {

  private def spark = SparkSession.active

  require(keyCols.nonEmpty,
    "merge-on-read needs row-identity key columns: set " +
      "spark.graft.rowlevel.keys=<c1,c2> (or use a table whose deletion " +
      "vectors already record keys)")
  keyCols.foreach(k => require(tableSchema.fieldNames.contains(k),
    s"row-identity key column '$k' is not in the table schema " +
      s"(${tableSchema.fieldNames.mkString(", ")})"))
  require(m.deletes.isEmpty || m.keyCols == keyCols,
    s"merge-on-read key columns $keyCols differ from the table's existing DV keys " +
      s"${m.keyCols} — one key identity per table")

  locally { // legacy table-wide DVs would re-delete MoR-inserted keys
    val unscoped = SnapshotStore.unscopedDvs(spark, m)
    if (unscoped.nonEmpty)
      throw new UnsupportedOperationException(
        s"graft-snapshot: merge-on-read $cmd on $tablePath refused: legacy deletion " +
          s"vector(s) without a file scope (${unscoped.mkString(", ")}) apply " +
          "table-wide — run a compacting INSERT OVERWRITE or Bucketing.compactCommit first")
  }

  /** Head pin, like the copy-on-write path: rewriting a time-travelled
    * snapshot would silently drop later commits. The DELETES list is
    * part of the identity — a concurrent DV-delete commit changes
    * neither data nor files, but a scan planned without its DV would
    * match (and re-insert as updates) rows that commit already
    * removed. */
  private[sources] val baseVersion: Long = {
    val v = SnapshotStore.currentVersion(spark, tablePath).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $tablePath"))
    val head = SnapshotStore.manifest(spark, tablePath, v)
    if (head.data != m.data || head.files != m.files || head.deletes != m.deletes)
      throw new IllegalStateException(
        s"graft-snapshot: $cmd must target the table head; $tablePath moved to " +
          s"version $v since this relation resolved (re-run the command)")
    v
  }

  override def command(): Command = cmd

  // a plain scan (NOT the group scan): the delta plan touches only
  // matched ROWS, so static row-group skipping is sound again — Spark
  // re-applies every residual
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(m, tableSchema, tablePath, options)

  override def rowId(): Array[NamedReference] =
    keyCols.map(org.apache.spark.sql.connector.expressions.Expressions.column).toArray

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes(): Array[NamedReference] = Array.empty

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder = {
    val op = this
    // key schema from the TABLE (a pure DELETE's write schema is empty
    // — only id rows flow)
    val keySchema = StructType(keyCols.map(k => tableSchema(k)))
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new SnapshotDeltaBatchWrite(tablePath, info.schema(), keySchema, op)
      }
    }
  }

  override def description(): String =
    s"graft-snapshot $cmd merge-on-read (base v$baseVersion, keys=${keyCols.mkString(",")})"
}

private[sources] final class SnapshotDeltaBatchWrite(
    tablePath: String, rowSchema: StructType, keySchema: StructType,
    op: SnapshotDeltaOperation)
    extends DeltaBatchWrite {

  private val spark = SparkSession.active
  private val token = java.util.UUID.randomUUID.toString.take(8)
  private val stagedDataDir = s"$tablePath/v=${op.baseVersion + 1}__$token"
  private val stagedDvDir = SnapshotStore.newDvDir(tablePath)

  private def conf = spark.sparkContext.hadoopConfiguration
  private def keyCols: Seq[String] =
    op.rowId().map(_.fieldNames.head).toSeq

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    Seq(stagedDataDir, stagedDvDir).foreach { d =>
      val p = new Path(d); p.getFileSystem(conf).mkdirs(p)
    }
    new SnapshotDeltaWriterFactory(stagedDataDir, stagedDvDir, rowSchema, keySchema,
      new SerializableHadoopConf(conf))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case d: SnapshotDeltaCommitMessage => d }
    val dataFiles = msgs.flatMap(_.dataFile).toSeq
    val dvFiles = msgs.flatMap(_.dvFile).toSeq
    val fs = new Path(stagedDataDir).getFileSystem(conf)
    // only committed-task files ship; strays are lost attempts
    def sweep(dir: String, keep: Seq[String]): Unit = {
      val names = keep.map(f => new Path(f).getName).toSet
      fs.listStatus(new Path(dir)).toSeq
        .filterNot(s => names.contains(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, s.isDirectory))
    }
    sweep(stagedDataDir, dataFiles)
    sweep(stagedDvDir, dvFiles)
    if (dataFiles.isEmpty && dvFiles.isEmpty) { // delta matched nothing
      abort(messages); return
    }

    val m = SnapshotStore.manifest(spark, tablePath, op.baseVersion)
    val base = SnapshotStore.dataFiles(spark, m)

    // Row-identity CONTRACT check: the scoped DV removes every base row
    // sharing a deleted key, so keys that don't uniquely identify rows
    // would silently delete unmatched siblings. Two matched rows
    // emitting the same key is proof of non-uniqueness — O(|DV|) to
    // detect, so always on. (The converse hole — a sibling that was
    // never matched — needs a base-table probe; opt in with
    // spark.graft.rowlevel.verifyUnique=true, one semi-join scan.)
    if (dvFiles.nonEmpty) {
      import org.apache.spark.sql.functions.{col, count_distinct, lit, struct, count}
      val dv = spark.read.schema(keySchema).parquet(dvFiles: _*)
      val r = dv.agg(count(lit(1)), count_distinct(struct(keyCols.map(col): _*))).head()
      val (nDel, nKeys) = (r.getLong(0), r.getLong(1))
      def refuse(extra: Long): Nothing = {
        abort(messages)
        throw new IllegalStateException(
          s"graft-snapshot: merge-on-read ${op.command()} on $tablePath refused: key " +
            s"columns (${keyCols.mkString(",")}) do not uniquely identify rows " +
            s"($extra base row(s) beyond the $nKeys matched key(s) share a deleted " +
            "key and would be silently removed) — use a unique row identity or " +
            "copy-on-write mode")
      }
      if (nDel != nKeys) refuse(nDel - nKeys)
      if (spark.conf.get("spark.graft.rowlevel.verifyUnique", "false").toBoolean) {
        val hit = spark.read.parquet(base: _*)
          .select(keyCols.map(col): _*)
          .join(dv.distinct(), keyCols, "left_semi").count()
        if (hit != nKeys) refuse(hit - nKeys)
      }
    }
    val deletes =
      if (dvFiles.isEmpty) { fs.delete(new Path(stagedDvDir), true); m.deletes }
      else {
        // scope = the BASE files only: the staged data files carry this
        // commit's fresh rows, which the new DV must never touch (what
        // makes delete+reinsert of the same key correct in one commit)
        SnapshotStore.recordDvScope(spark, stagedDvDir, base)
        m.deletes :+ stagedDvDir
      }
    val opName = op.command() match {
      case Command.MERGE  => "merge-mor"
      case Command.UPDATE => "update-mor"
      case Command.DELETE => "delete-mor"
    }
    // O(delta) sidecar too: base files' stats copy forward textually
    val stats = FileStats.sidecarFor(spark, tablePath, base ++ dataFiles, Some(m), m.statsExact)
    // layout tags survive a PURE-DELETE commit (file set unchanged — DV
    // filtering preserves both co-location and row order, exactly like
    // deleteKeysCommit); any staged file is unrouted/unsorted and drops
    // them rather than serving a stale promise
    val pureDelete = dataFiles.isEmpty
    val ok = SnapshotStore.tryPublishManifest(spark, tablePath, op.baseVersion + 1,
      SnapshotStore.Manifest("", deletes, keyCols, ts = System.currentTimeMillis(),
        files = base ++ dataFiles, op = opName, statsExact = m.statsExact,
        mixedSchema = m.mixedSchema, statsFile = stats,
        bucketCols = if (pureDelete) m.bucketCols else Nil,
        bucketN = if (pureDelete) m.bucketN else 0,
        sortCols = if (pureDelete) m.sortCols else Nil,
        bloomFile = m.bloomFile, // file-keyed: inherited entries stay valid
        partSpec = m.partSpec, ndvFile = m.ndvFile,
        partGen = m.partGen, partHist = m.partHist,
        renames = m.renames, droppedCols = m.droppedCols,
        widens = m.widens, schemaJson = m.schemaJson))
    if (!ok) {
      abort(messages)
      throw new java.util.ConcurrentModificationException(
        s"graft-snapshot: merge-on-read ${op.command()} on $tablePath lost to a " +
          s"concurrent commit of version ${op.baseVersion + 1} — re-run against the new head")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(stagedDataDir).getFileSystem(conf)
    Seq(stagedDataDir, stagedDvDir).foreach { d =>
      val p = new Path(d)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}

private[sources] final class SnapshotDeltaWriterFactory(
    stagedDataDir: String, stagedDvDir: String,
    rowSchema: StructType, keySchema: StructType, conf: SerializableHadoopConf)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new SnapshotDeltaWriterImpl(stagedDataDir, stagedDvDir, rowSchema, keySchema,
      partitionId, conf.conf)
}

/** Per-task delta writer: inserts append to a fresh data file, deletes
  * (and the delete half of updates) append their KEY row to a fresh
  * DV-key file. Both open lazily — an all-carry-over task leaves no
  * files at all. */
private[sources] final class SnapshotDeltaWriterImpl(
    stagedDataDir: String, stagedDvDir: String,
    rowSchema: StructType, keySchema: StructType,
    partitionId: Int, conf: org.apache.hadoop.conf.Configuration)
    extends DeltaWriter[InternalRow] {

  private val dataWriter = new SnapshotDataWriter(
    stagedDataDir, partitionId, rowSchema, conf, eagerPartitionZero = false)
  private val dvWriter = new SnapshotDataWriter(
    stagedDvDir, partitionId, keySchema, conf, eagerPartitionZero = false)

  override def insert(row: InternalRow): Unit = dataWriter.write(row)

  override def delete(meta: InternalRow, id: InternalRow): Unit = dvWriter.write(id)

  // representUpdateAsDeleteAndInsert=true means Spark splits updates
  // before they reach the writer; kept correct anyway for completeness
  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(meta, id); insert(row)
  }

  override def commit(): WriterCommitMessage = {
    val d = dataWriter.commit() match { case SnapshotCommitMessage(f) => f }
    val k = dvWriter.commit() match { case SnapshotCommitMessage(f) => f }
    SnapshotDeltaCommitMessage(d, k)
  }

  override def abort(): Unit = { dataWriter.abort(); dvWriter.abort() }
  override def close(): Unit = { dataWriter.close(); dvWriter.close() }
}

private[sources] final case class SnapshotDeltaCommitMessage(
    dataFile: Option[String], dvFile: Option[String]) extends WriterCommitMessage
