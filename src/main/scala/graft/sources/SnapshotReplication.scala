package graft.sources

import graft.store.SnapshotStore

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count}
import org.apache.spark.sql.streaming.StreamingQuery

/** Snapshot-table REPLICATION over the change feed — the cross-region /
  * cross-cluster mirror story, composed entirely from the engine's own
  * primitives:
  *
  * {{{
  *   SnapshotReplication.mirror(spark, sourceRoot, targetRoot, ckptDir)
  * }}}
  *
  * Each source commit arrives as one change-feed micro-batch and is
  * re-applied to the target through the SAME commit protocol the source
  * used: image batches (`_change_type='snapshot'` — a rewrite at the
  * source) become a fresh [[SnapshotStore.commit]]; insert batches
  * (`'insert'` — an append at the source, O(new-files) rows) become an
  * [[SnapshotStore.appendCommit]]; delete batches
  * (O(deleted-keys) key rows) become a [[SnapshotStore.deleteKeysCommit]]
  * — the mirror never rescans the table for a source delete. A batch
  * spanning several source commits applies them in version order.
  *
  * Delivery is foreachBatch at-least-once, and the mirror is REPLAY
  * IDEMPOTENT: every target commit records the source version it
  * applied (`src=` in the manifest, atomic with the data), and a
  * replayed batch skips versions at or below the target head's record
  * — appends and copy-on-write deltas apply exactly once; target
  * version numbers are the mirror's own monotone history. Image
  * commits materialize the source's deletion vectors away (the batch
  * carries live rows only), so a mirror can be denser than its source.
  */
object SnapshotReplication {

  def mirror(
      spark: SparkSession,
      sourceTable: String,
      targetTable: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.format("graft-snapshot")
      .option("path", sourceTable).option("changeFeed", "true").load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        // replay guard: every mirror commit records the SOURCE version it
        // applied (`src=` in the target manifest, atomic with the data),
        // so an at-least-once foreachBatch replay re-applies nothing —
        // without this, a crash between commit and checkpoint would
        // duplicate appended rows and re-add cow inserts
        // resolved through lastAppliedSrcV, not the bare head: a
        // maintenance commit or WAP publish on the TARGET between two
        // mirror batches must not reset (or fake) the cursor
        val applied = SnapshotStore.lastAppliedSrcV(s, targetTable)
        val versions = batch.select(col("_commit_version")).distinct()
          .collect().map(_.getLong(0)).sorted
          .filter(_ > applied)
        versions.foreach { v =>
          val rows = batch.filter(col("_commit_version") === v).cache()
          try {
            // a batch can MIX kinds (a merge-on-read commit carries
            // 'delete' keys AND 'insert' rows) — dispatch on the SET,
            // not the first row's kind
            val kinds = rows.select(col("_change_type")).distinct()
              .collect().map(_.getString(0)).toSet
            // key columns come from the SOURCE commit's manifest; if
            // the source was vacuumed past v before this batch applied
            // (crash replay), fall back to deriving them from the
            // batch itself — delete rows carry the key columns
            // populated and every other column null
            def keyColsOf(deleteRows: org.apache.spark.sql.DataFrame): Seq[String] =
              scala.util.Try(
                SnapshotStore.manifest(s, sourceTable, v).keyCols).getOrElse {
                val payload = deleteRows.drop("_change_type", "_commit_version")
                val counts = payload.select(payload.columns.map(c =>
                  count(col(c)).alias(c)).toIndexedSeq: _*).collect()(0)
                val derived =
                  payload.columns.toSeq.filter(c => counts.getLong(counts.fieldIndex(c)) > 0L)
                // the target's recorded DV keyCols are ORDER-significant
                // (deleteKeysCommit requires exact equality); prefer them
                // when they name the same column set
                val tgtKeys = SnapshotStore.currentVersion(s, targetTable)
                  .map(hv => SnapshotStore.manifest(s, targetTable, hv).keyCols)
                  .getOrElse(Nil)
                if (tgtKeys.nonEmpty && tgtKeys.toSet == derived.toSet) tgtKeys else derived
              }
            kinds match {
              case k if k.isEmpty => () // empty slice (replay boundaries)
              case k if k == Set("delete") =>
                val keyCols = keyColsOf(rows)
                SnapshotStore.deleteKeysCommit(s, targetTable, keyCols,
                  rows.select(keyCols.map(col): _*), srcV = v)
              case k if k == Set("insert") =>
                // pure append delta: mirror as an O(new-files) append
                SnapshotStore.appendCommit(
                  rows.drop("_change_type", "_commit_version"), targetTable, srcV = v)
              case k if k == Set("delete", "insert") =>
                // merge-on-read delta: deletes apply BEFORE the append
                // (the appended rows may re-carry deleted keys). Two
                // target commits; the delete half records srcV = v - 1
                // — NOT -1, which would reset the applied watermark and
                // make a crash-replay re-append earlier versions in the
                // same batch — and the append's srcV = v closes v out.
                // A crash between them replays only the delete
                // (idempotent: same keys union into the DV), then the
                // append.
                val deletes = rows.filter(col("_change_type") === "delete")
                val keyCols = keyColsOf(deletes)
                SnapshotStore.deleteKeysCommit(s, targetTable, keyCols,
                  deletes.select(keyCols.map(col): _*), srcV = v - 1)
                SnapshotStore.appendCommit(
                  rows.filter(col("_change_type") === "insert")
                    .drop("_change_type", "_commit_version"), targetTable, srcV = v)
              case k if k.subsetOf(Set("insert", "remove")) =>
                // copy-on-write delta: removed files' old rows + staged
                // files' new rows. The mirror applies multiset algebra
                // (state − removes + inserts; carry-over rows cancel) in
                // ONE rebase-safe commit. The mirror pays one shuffle
                // over its own copy — the WIRE cost stays O(touched
                // files); a file-mapped mirror that relinks untouched
                // target files is the next refinement.
                val removes = rows.filter(col("_change_type") === "remove")
                  .drop("_change_type", "_commit_version")
                val inserts = rows.filter(col("_change_type") === "insert")
                  .drop("_change_type", "_commit_version")
                SnapshotStore.commitTransform(s, targetTable, {
                  case Some(cur) => cur.exceptAll(removes).unionAll(inserts)
                  case None      => inserts
                }, srcV = v)
              case k =>
                // a full snapshot image — and ONLY that: an
                // unrecognized change type must fail loudly here, not
                // silently drop rows from the mirror (protocol
                // extensions surface as an error at the target)
                require(k == Set("snapshot"),
                  s"graft-snapshot mirror: unrecognized change-type set $k in source " +
                    s"version $v of $sourceTable — the mirror understands " +
                    "{snapshot}, {insert}, {delete}, {delete,insert}, {insert,remove}")
                SnapshotStore.commit(
                  rows.filter(col("_change_type") === "snapshot")
                    .drop("_change_type", "_commit_version"), targetTable, srcV = v)
            }
          } finally rows.unpersist()
        }
        ()
      }
      .start()

  /** PHYSICAL file-level mirroring — the scale-optimal replication for
    * exact copies: instead of re-materializing rows through the change
    * feed, copy each source version's FILES the target does not already
    * hold and publish a path-rewritten manifest under the SAME version
    * number. Because file-granular commits share files across versions,
    * the per-sync copy cost is O(new bytes since the last sync):
    *  - an append copies only the appended part files;
    *  - a copy-on-write MERGE/UPDATE/DELETE copies only the staged
    *    replacement files;
    *  - a delete commit copies only the tiny DV key file;
    *  - a full rewrite copies its own (genuinely new) files.
    * The mirror is a version-exact clone: `readVersion(target, v)` ≡
    * `readVersion(source, v)`, time travel and history included —
    * stronger than [[mirror]], whose target keeps its own version
    * numbers. Idempotent and resumable: existing same-length files are
    * skipped, and a CAS-lost marker publish (another syncer) is fine.
    * Driver-side sequential copy — on a real cluster hand the returned
    * file list to distcp and publish markers after; the MANIFEST logic
    * is identical. Returns the versions synced this call. */
  def syncFiles(
      spark: SparkSession,
      sourceTable: String,
      targetTable: String): Seq[Long] = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val srcRoot = new Path(sourceTable).toUri.getPath
    def rel(p: String): String = {
      val abs = new Path(p).toUri.getPath
      require(abs.startsWith(srcRoot + "/"),
        s"manifest path outside the source table root: $p")
      abs.stripPrefix(srcRoot + "/")
    }
    def copyMissing(srcPathStr: String): Unit = {
      val sp = new Path(srcPathStr)
      val sfs = sp.getFileSystem(conf)
      val entries =
        if (sfs.getFileStatus(sp).isDirectory)
          sfs.listStatus(sp).toSeq.filter(_.isFile).map(_.getPath)
        else Seq(sp)
      entries.foreach { f =>
        val dst = new Path(targetTable, rel(f.toString))
        val dfs = dst.getFileSystem(conf)
        val have = dfs.exists(dst) &&
          dfs.getFileStatus(dst).getLen == sfs.getFileStatus(f).getLen
        if (!have) {
          dfs.mkdirs(dst.getParent)
          FileUtil.copy(sfs, f, dfs, dst, false, true, conf)
        }
      }
    }
    val done = SnapshotStore.versions(spark, targetTable).toSet
    val todo = SnapshotStore.versions(spark, sourceTable).filterNot(done)
    todo.foreach { v =>
      val m = SnapshotStore.manifest(spark, sourceTable, v)
      if (m.files.nonEmpty) m.files.foreach(copyMissing)
      else copyMissing(m.data)
      m.deletes.foreach(copyMissing)
      // the stats sidecar mirrors too (path-rewritten inside), so the
      // clone plans from its manifest like the source does; a sidecar
      // that can't be read just drops — stats are an optimization
      val statsRewritten =
        if (m.statsFile.isEmpty) ""
        else
          try {
            val (exact, blocks) = graft.store.FileStats.readBlocks(spark, m.statsFile)
            val mapped = blocks.toSeq.map { case (path, block) =>
              val np = s"$targetTable/${rel(path)}"
              s"f=$np\n" + block.linesIterator.drop(1).mkString("", "\n", "\n")
            }
            graft.store.FileStats.write(spark, targetTable, exact, mapped)
          } catch { case _: java.io.IOException => "" }
      // the bloom index mirrors verbatim: its entries key by RELATIVE
      // dirName/fileName, so only the marker path needs the rewrite
      if (m.bloomFile.nonEmpty) copyMissing(m.bloomFile)
      // NDV sketches mirror like the bloom index (file-keyed entries)
      if (m.ndvFile.nonEmpty) copyMissing(m.ndvFile)
      val rewritten = m.copy(
        data = if (m.data.nonEmpty) s"$targetTable/${rel(m.data)}" else "",
        files = m.files.map(f => s"$targetTable/${rel(f)}"),
        deletes = m.deletes.map(d => s"$targetTable/${rel(d)}"),
        statsFile = statsRewritten,
        bloomFile = if (m.bloomFile.isEmpty) "" else s"$targetTable/${rel(m.bloomFile)}",
        ndvFile = if (m.ndvFile.isEmpty) "" else s"$targetTable/${rel(m.ndvFile)}")
      // same version number, same commit clock: a version-exact clone.
      // A false return = another syncer already published v — fine.
      SnapshotStore.tryPublishManifest(spark, targetTable, v, rewritten)
    }
    todo
  }
}
