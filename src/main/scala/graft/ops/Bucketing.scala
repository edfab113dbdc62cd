package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Bucketed-table co-location: pre-shuffle a table ONCE at write time so
  * every later join/aggregate on the bucket key plans with NO exchange —
  * the standard answer to "this fact⨝fact join shuffles 100 TB every
  * run". Both sides bucketed by their join key into the same bucket
  * count ⇒ Spark's `EnsureRequirements` sees compatible partitionings
  * and elides the shuffle on both sides; a groupBy on the key after the
  * join reuses it again (the `bk_bucketed_join` entry plans join + agg
  * with zero hash exchanges, pinned by `PlanShapeSpec`).
  *
  * This is the local-catalog form of the same design the IVF inverted
  * file and the silver date-partitioning use: move the shuffle to write
  * time, amortize it over every read.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session
    * catalog. Overwrites any previous table of that name. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Range-sorted parquet write: `repartitionByRange` + in-partition
    * sort clusters each sort-key range into contiguous row groups, so a
    * range predicate prunes at the ROW-GROUP level via parquet min/max
    * stats (the poor man's Z-order, exact for one dimension). At 100 TB
    * a date-range query then reads the few row groups whose stats
    * overlap the predicate instead of decoding every page — combine
    * with partitioning for directory-level pruning first.
    * `blockBytes` bounds the row-group size (smaller groups = finer
    * pruning, more footer overhead).
    *
    * Measured caveat (pinned in PlanShapeSpec): numeric sort keys prune
    * reliably; TIMESTAMP keys write correct min/max stats but the
    * vectorized reader does not group-skip on them in this Spark build
    * (NTZ-inferred columns) — sort on the epoch long (or a date int)
    * when range pruning is the goal. */
  // (see writeZOrdered below for the two-dimensional generalization)
  /** Compact a parquet directory's small files into ~`targetBytes`
    * outputs — the maintenance op every streaming/incremental sink needs
    * (a micro-batch sink at 100 TB/day leaves thousands of KB-files per
    * partition; scans then pay per-file open/footer cost and lose
    * row-group pruning). File count is derived from the INPUT's actual
    * bytes (Hadoop FS listing, no data read); rows move through ONE
    * round-robin repartition (deterministic count, no skewed coalesce
    * merging of adjacent tiny files onto one task). Returns
    * (files_before, files_after, bytes_total). */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inputDir: String,
      outputDir: String,
      targetBytes: Long): (Int, Int, Long) = {
    val path = new org.apache.hadoop.fs.Path(inputDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inputDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outputDir)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outputDir))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, outFiles, totalBytes)
  }

  /** [[compact]] against a [[graft.store.SnapshotStore]] table: read the
    * newest committed snapshot, rewrite it into ~`targetBytes` files as
    * the NEXT version, publish atomically. Compaction is pure
    * maintenance — the data is identical — so the one thing that
    * matters is that a concurrent reader never sees the half-built
    * rewrite; the commit marker guarantees it (an in-place `compact`
    * overwrite cannot). Returns (files_before, files_after,
    * bytes_total, committed_version). */
  def compactCommit(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      targetBytes: Long): (Int, Int, Long, Long) = {
    import graft.store.SnapshotStore
    val cur = SnapshotStore.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $table"))
    // resolve through dataFiles: file-granular heads (append/MERGE/CTAS
    // commits) have no single data dir — and compaction is exactly the
    // remedy those tables are pointed at when DVs accumulate
    val inFiles = SnapshotStore.dataFiles(spark, SnapshotStore.manifest(spark, table, cur))
      .map(new org.apache.hadoop.fs.Path(_))
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = inFiles.map(f => fs.getFileStatus(f).getLen).sum
    val files = inFiles
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val next = cur + 1
    val outDir = SnapshotStore.versionDir(table, next)
    // readVersion (not the raw dir) so pending deletion vectors are
    // materialized away by the rewrite, like any table format's
    // compaction. A BUCKETED table re-routes through its own hash
    // instead of round-robin, so the big-hammer path (the documented
    // remedy for DV-blocked appends) doesn't cost the table its
    // storage-partitioned-join layout.
    val mCur = SnapshotStore.manifest(spark, table, cur)
    val rows = SnapshotStore.readVersion(spark, table, cur)
    // PARTITION-AWARE: a transform-partitioned table compacts WITHIN
    // its partition directories (rows re-route through the same spec),
    // so the rewrite that materializes DVs away never costs the table
    // its partition pruning — same promise the bucket branch makes for
    // storage-partitioned joins.
    val routedPart = mCur.partSpec.nonEmpty &&
      mCur.partSpec.forall(f => rows.schema.fieldNames.contains(f.col))
    if (routedPart) {
      val (withCols, dirCols) =
        graft.store.PartitionSpec.withRoutingColumns(rows, mCur.partSpec, mCur.partGen)
      withCols.repartition(dirCols.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite").partitionBy(dirCols: _*).parquet(outDir)
    } else {
      (if (mCur.bucketN > 0)
         rows.repartition(mCur.bucketN,
           mCur.bucketCols.map(org.apache.spark.sql.functions.col): _*)
       else rows.repartition(nOut))
        .write.mode("overwrite").parquet(outDir)
    }
    // publish a full manifest (not a bare marker) so the compacted
    // table keeps footer-free planning: fresh sidecar, op recorded.
    // Partition-routed outputs publish FILE-granular (nested dirs have
    // no single-listing data dir).
    val outFileList =
      if (routedPart) SnapshotStore.listStagedFiles(spark, outDir)
      else SnapshotStore.dataFiles(spark, SnapshotStore.Manifest(outDir, Nil, Nil))
    val outStats = graft.store.FileStats.sidecarFor(spark, table,
      outFileList, None, SnapshotStore.writerStatsExact(spark))
    // a FULL rewrite re-routes every row under the CURRENT spec
    // generation — older generations' history heals away here
    val outManifest =
      if (routedPart)
        SnapshotStore.Manifest("", Nil, Nil, files = outFileList, op = "compact",
          statsExact = SnapshotStore.writerStatsExact(spark), statsFile = outStats,
          partSpec = mCur.partSpec, partGen = mCur.partGen,
          schemaJson = SnapshotStore.pinnedJson(rows.schema))
      else
        SnapshotStore.Manifest(outDir, Nil, Nil, op = "compact",
          statsExact = SnapshotStore.writerStatsExact(spark), statsFile = outStats,
          bucketCols = mCur.bucketCols, bucketN = mCur.bucketN,
          partSpec = mCur.partSpec, partGen = mCur.partGen,
          schemaJson = SnapshotStore.pinnedJson(rows.schema))
    if (!SnapshotStore.tryPublishManifest(spark, table, next, outManifest))
      throw new IllegalStateException(s"could not publish commit marker $next under $table")
    (files.size, outFileList.size, totalBytes, next)
  }

  /** INCREMENTAL compaction — the O(small-files) `OPTIMIZE` that
    * file-granular manifests make possible: files already at or above
    * `smallBytes` are RE-LINKED untouched (not a byte moves), and only
    * the sub-threshold files — the debris a streaming sink or frequent
    * small appends leave behind — are read, merged into ~`targetBytes`
    * outputs, and swapped into the manifest. On a 100 TB table where a
    * day's micro-batches left 10 000 tiny files next to 5 000 big ones,
    * this rewrites the tiny tail only; [[compactCommit]] (full rewrite)
    * remains the DV-materializing big hammer.
    *
    * SCOPED deletion vectors compose: the small tail reads through
    * [[graft.store.SnapshotStore.readFilesWithDvs]] (each file's own
    * DVs applied), so the merged outputs carry already-filtered rows —
    * partial DV materialization — while the re-linked big files keep
    * their DV coverage through the carried-forward delete lines.
    * Legacy UNSCOPED DVs (table-wide) still refuse: they would
    * re-apply to the merged rows forever — run [[compactCommit]]
    * instead (its full rewrite clears them).
    * Returns (files_rewritten, files_linked, files_after_merge,
    * committed_version); commits nothing when fewer than two small
    * files exist. */
  def compactSmallFilesCommit(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      smallBytes: Long,
      targetBytes: Long): (Int, Int, Int, Long) = {
    import graft.store.SnapshotStore
    val cur = SnapshotStore.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $table"))
    val m = SnapshotStore.manifest(spark, table, cur)
    val unscoped = SnapshotStore.unscopedDvs(spark, m)
    require(unscoped.isEmpty,
      s"incremental compaction on $table refused: legacy deletion vector(s) without " +
        s"a file scope (${unscoped.mkString(", ")}) apply table-wide and would " +
        "re-apply to the merged rows — run the full compactCommit (it materializes " +
        "DVs away)")
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = SnapshotStore.dataFiles(spark, m)
    val sized = all.map(f =>
      f -> fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)
    val (small, big) = sized.partition(_._2 < smallBytes)
    if (small.size < 2) return (0, all.size, all.size, cur)
    val smallTotal = small.map(_._2).sum
    val nOut = math.max(1, math.ceil(smallTotal.toDouble / targetBytes).toInt)
    val next = cur + 1
    val stageDir = s"$table/v=${next}__compact${java.util.UUID.randomUUID.toString.take(8)}"
    // the small tail reads with each file's own (scoped) DVs applied —
    // the merged outputs are DV-materialized; mergeSchema resolution
    // for evolved tables lives inside readFilesWithDvs
    val smallRows = SnapshotStore.readFilesWithDvs(spark, m, small.map(_._1))
    // BUCKETED tables compact without losing co-location: the small
    // tail re-routes through the SAME hash (rows land back in their
    // bucket = write partition = `part-<id>` name), so the merged
    // output is still one-bucket-per-file and the `bucket=` tag keeps
    // its storage-partitioned-join promise. PARTITION-TRANSFORMED
    // tables re-route through the spec the same way — the
    // streaming-ingest shape (small files accumulating inside day
    // dirs) compacts WITHIN partitions and keeps pruning. Unbucketed,
    // unpartitioned tables merge round-robin to the byte-derived
    // output count.
    val routedPart = m.partSpec.nonEmpty &&
      m.partSpec.forall(f => smallRows.schema.fieldNames.contains(f.col))
    if (routedPart) {
      val (withCols, dirCols) =
        graft.store.PartitionSpec.withRoutingColumns(smallRows, m.partSpec, m.partGen)
      withCols.repartition(dirCols.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite").partitionBy(dirCols: _*).parquet(stageDir)
    } else {
      (if (m.bucketN > 0)
         smallRows.repartition(m.bucketN,
           m.bucketCols.map(org.apache.spark.sql.functions.col): _*)
       else smallRows.repartition(nOut))
        .write.mode("overwrite").parquet(stageDir)
    }
    val staged =
      if (routedPart) SnapshotStore.listStagedFiles(spark, stageDir)
      else SnapshotStore.dataFiles(spark, SnapshotStore.Manifest(stageDir, Nil, Nil))
    // big files' stats copy forward; only the merged outputs' footers are read
    val stats = graft.store.FileStats.sidecarFor(
      spark, table, big.map(_._1) ++ staged, Some(m), m.statsExact)
    // DVs carry forward for the re-linked big files (scoped — the
    // merged-away small files' scope entries dangle harmlessly); the
    // staged outputs are DV-materialized and covered by none
    val ok = SnapshotStore.tryPublishManifest(spark, table, next,
      SnapshotStore.Manifest("", m.deletes, m.keyCols, ts = System.currentTimeMillis(),
        files = big.map(_._1) ++ staged, op = "compact-small",
        statsExact = m.statsExact, mixedSchema = m.mixedSchema, statsFile = stats,
        bucketCols = m.bucketCols, bucketN = m.bucketN, bloomFile = m.bloomFile,
        // big (old-generation) files survive → the spec history must
        // too, and so does the column name mapping
        partSpec = m.partSpec, ndvFile = m.ndvFile,
        partGen = m.partGen, partHist = m.partHist,
        renames = m.renames, droppedCols = m.droppedCols,
        widens = m.widens, schemaJson = m.schemaJson))
    if (!ok) {
      fs.delete(new org.apache.hadoop.fs.Path(stageDir), true)
      throw new java.util.ConcurrentModificationException(
        s"compactSmallFilesCommit lost the CAS race on $table version $next — " +
          "re-run against the new head")
    }
    (small.size, big.size, staged.size, next)
  }

  def writeRangeSorted(
      df: DataFrame,
      path: String,
      sortCol: String,
      partitions: Int = 8,
      blockBytes: Long = 8L * 1024 * 1024): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(partitions, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write
      .mode("overwrite")
      .option("parquet.block.size", blockBytes.toString)
      .parquet(path)
  }

  /** Linear map of a non-negative column with known domain max onto the
    * full `bits`-bit range — Z-order REQUIRES both dimensions at equal
    * bit width, or the wider column's high bits dominate the interleave
    * and the narrow dimension loses all clustering (measured: an
    * unnormalized 7-bit column next to an 11-bit one pruned nothing). */
  private def scaleToBits(c: Column, domainMax: Long, bits: Int): Column = {
    import org.apache.spark.sql.functions.{least, lit}
    least((c.cast("double") / domainMax * ((1L << bits) - 1)).cast("long"), lit((1L << bits) - 1))
  }

  /** Bit-interleaved Z-value of two non-negative integer columns, each
    * first normalized onto `bits` bits via its known domain max: rows
    * close in Z-value are close in BOTH dimensions. Pure codegen'd
    * shift/mask expression — no UDF. Domain maxima are caller-supplied
    * (table stats / partition metadata at scale), keeping the write path
    * free of driver-side aggregation. */
  def zValue(a: Column, maxA: Long, b: Column, maxB: Long, bits: Int = 16): Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    val an = scaleToBits(a, maxA, bits)
    val bn = scaleToBits(b, maxB, bits)
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(an, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftright(bn, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Z-ordered parquet write: cluster on the INTERLEAVED key of two
    * columns, so range predicates on EITHER dimension prune row groups
    * — the property a single-column sort only gives its own column.
    * Each dimension's locality is weaker than a dedicated sort (that is
    * the Z-order trade), but both stay far better than random layout.
    * The standard data-layout answer for a 100 TB fact queried by two
    * independent selective dimensions. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      maxA: Long,
      colB: String,
      maxB: Long,
      bits: Int = 16,
      partitions: Int = 8,
      blockBytes: Long = 8L * 1024 * 1024): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zValue(col(colA), maxA, col(colB), maxB, bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .mode("overwrite")
      .option("parquet.block.size", blockBytes.toString)
      .parquet(path)
  }
}
