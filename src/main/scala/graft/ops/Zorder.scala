package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) table clustering + file-level min-max data
  * skipping — the multi-dimensional answer to "my scans filter on two
  * columns but the layout can only sort by one".
  *
  * A linear sort gives perfect file pruning on its leading column and
  * none on any other; interleaving the bits of d columns gives every
  * column ~1/d of the locality, so a range predicate on ANY indexed
  * column maps to a bounded set of curve segments = a bounded set of
  * files. This is the same layout trick Delta/Iceberg `OPTIMIZE ZORDER
  * BY` applies; here it is built from first principles on plain
  * parquet:
  *
  *  1. [[zValue]] — a codegen'd bit-interleave expression (no UDF),
  *  2. [[writeZordered]] — range-partition + in-partition sort by the
  *     z-value, so each output file covers one tight curve segment,
  *  3. [[writeFileStats]] — a per-file min/max index table (the
  *     "poor man's Delta stats"), written under `_zindex` (the
  *     underscore prefix hides it from the data file index),
  *  4. [[skippingScan]] — prunes files whose [min,max] envelope
  *     misses the predicate BEFORE any data file opens, then re-applies
  *     the exact predicate to the surviving rows.
  *
  * Scale notes (100 TB):
  *  - The stats index is one row per file (≈ thousands of rows per PB
  *    at healthy file sizes); pruning it is a metadata-only query —
  *    this is exactly how lakehouse formats make 100 TB scans cheap
  *    when predicates are selective.
  *  - [[writeZordered]]'s range partitioning samples the z-value (a
  *    Spark RangePartitioner sample pass), then shuffles once; the
  *    in-file sort is per-partition. Cost is one extra shuffle at
  *    write time, paid back on every subsequent selective scan.
  *  - Parquet's own row-group min/max pushdown still applies INSIDE
  *    each surviving file and composes with this file-level pruning.
  *
  * Reference analog: the weather warehouse partitions bronze/silver by
  * date only (`bronze_to_silver.py`), so any city-scoped scan reads
  * every date partition in range; z-ordering (city, date) bounds both.
  */
object Zorder {

  /** Morton z-value of `cols`: bit-interleave the low `bits` bits of
    * each column (caller guarantees values are non-negative and fit —
    * mask/bucket upstream, e.g. `pmod(key, 1 << bits)`). Pure
    * shift/and/or expression tree, whole-stage-codegen friendly; the
    * per-column bit planes are disjoint so the combine is a plain sum. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val d = cols.size
    require(d >= 1, "zValue needs at least one column")
    require(bits >= 1 && bits * d <= 62, s"bits*dims must fit a long, got $bits*$d")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      k <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), k).bitwiseAND(lit(1L)), k * d + i)
    terms.reduce(_ + _)
  }

  /** Write `df` clustered by the Morton curve over `zCols` into
    * `numFiles` files: range-partition on the z-value (each file = one
    * contiguous curve segment) and sort inside each file (tight
    * parquet row-group envelopes too). Follow with [[writeFileStats]]
    * to enable [[skippingScan]]. */
  def writeZordered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      bits: Int,
      numFiles: Int): Unit = {
    val z = zValue(zCols.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Build the per-file min/max stats index for `statCols` over the
    * table at `path` and persist it under `<path>/_zindex` (hidden from
    * data scans by the underscore prefix). One scan of the table at
    * write time; columnar pruning keeps it to the indexed columns. */
  def writeFileStats(spark: SparkSession, path: String, statCols: Seq[String]): Unit = {
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).alias(s"min_$c"), max(col(c)).alias(s"max_$c"))
    } :+ count(lit(1)).alias("n_rows")
    spark.read.parquet(path)
      .select(input_file_name().alias("file") +: statCols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zindex")
  }

  /** The per-file stats index written by [[writeFileStats]]. Read by
    * EXPLICIT file list: handing Spark the underscore-named dir as a
    * root makes its listing log a spurious "All paths were ignored"
    * warning for every index read (the data still loads — base paths
    * are exempt from the hidden-file filter, their log line is not). */
  def fileStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(indexFiles(spark, s"$path/_zindex"): _*)

  /** Top-level parquet listing — ONE home: the store's dir-granular
    * manifest resolution (keeps the two filters from drifting). */
  private[ops] def indexFiles(spark: SparkSession, dir: String): Seq[String] =
    graft.store.SnapshotStore.dataFiles(
      spark, graft.store.SnapshotStore.Manifest(dir, Nil, Nil))

  /** Scan `path` reading ONLY files whose min/max envelope intersects
    * every `[lo, hi]` range in `ranges`, then re-apply the exact
    * predicate to surviving rows. File pruning happens on the index
    * table — no data file opens for a pruned file. Returns the
    * filtered rows; [[lastScanFiles]]-style observability comes from
    * [[selectFiles]], which this delegates to. */
  def skippingScan(
      spark: SparkSession,
      path: String,
      ranges: Map[String, (Long, Long)]): DataFrame = {
    val files = selectFiles(spark, path, ranges)
    val base =
      if (files.isEmpty)
        spark.read.parquet(path).limit(0) // degenerate: nothing qualifies
      else spark.read.parquet(files: _*)
    ranges.foldLeft(base) { case (d, (c, (lo, hi))) =>
      d.filter(col(c) >= lo && col(c) <= hi)
    }
  }

  /** Files whose stats envelope intersects every requested range —
    * the metadata-only half of [[skippingScan]], exposed for tests and
    * for prune-factor audits. */
  def selectFiles(
      spark: SparkSession,
      path: String,
      ranges: Map[String, (Long, Long)]): Seq[String] = {
    val pruned = ranges.foldLeft(fileStats(spark, path)) { case (d, (c, (lo, hi))) =>
      d.filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
    }
    pruned.select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** OPTIMIZE ZORDER for a [[graft.store.SnapshotStore]] table: rewrite
    * the current snapshot Morton-clustered on `zCols`, build its
    * `_zindex` stats, and publish the result as the next version with
    * atomic visibility — readers racing the rewrite keep the previous
    * complete snapshot until the marker lands, exactly like a lakehouse
    * `OPTIMIZE` job. Returns the committed version. The data layout is
    * the only change; rows are identical, so any reader logic is
    * unaffected and time travel still reaches the pre-optimize layout. */
  def optimizeCommit(
      spark: SparkSession,
      table: String,
      zCols: Seq[String],
      bits: Int,
      numFiles: Int): Long = {
    import graft.store.SnapshotStore
    val cur = SnapshotStore.read(spark, table)
    val next = SnapshotStore.currentVersion(spark, table).get + 1
    val dir = SnapshotStore.versionDir(table, next)
    writeZordered(cur, dir, zCols, bits, numFiles)
    writeFileStats(spark, dir, zCols)
    // full manifest (not a bare marker): the optimized layout keeps
    // footer-free planning through a fresh stats sidecar
    val outStats = graft.store.FileStats.sidecarFor(spark, table,
      SnapshotStore.dataFiles(spark, SnapshotStore.Manifest(dir, Nil, Nil)),
      None, SnapshotStore.writerStatsExact(spark))
    if (!SnapshotStore.tryPublishManifest(spark, table, next,
        SnapshotStore.Manifest(dir, Nil, Nil, op = "zorder",
          statsExact = SnapshotStore.writerStatsExact(spark), statsFile = outStats,
          schemaJson = SnapshotStore.pinnedJson(cur.schema))))
      throw new IllegalStateException(s"could not publish commit marker $next under $table")
    next
  }

  /** PARTITION-SCOPED OPTIMIZE (round 16 — the subset companion to
    * [[optimizeCommit]], which rewrites the whole current version): the
    * day-append shape accumulates a partition at a time, and
    * re-clustering yesterday's partition must not move the other 3 000
    * days' bytes. Only the files of ONE partition value of the current
    * spec rewrite (z-ordered within the partition, re-routed under the
    * SAME partition directory so pruning survives); every other file
    * keeps its exact path in a file-granular `keep ++ rewritten`
    * manifest — the REPLACE WHERE commit shape. The rewritten rows read
    * through their deletion vectors, so the fresh files are
    * DV-MATERIALIZED; a DV whose scope no longer intersects any kept
    * file drops from the manifest entirely.
    *
    * `fieldIdx` names the partition field of the CURRENT spec
    * generation; `value` is its directory-escaped value (as printed in
    * the file paths / `$partitions` table). Bucketed tables refuse —
    * z-ordering inside a bucket layout would break the
    * one-bucket-per-file promise. Returns the committed version. */
  def optimizePartitionCommit(
      spark: SparkSession,
      table: String,
      zCols: Seq[String],
      bits: Int,
      numFiles: Int,
      value: String,
      fieldIdx: Int = 0): Long = {
    import graft.store.SnapshotStore
    val cur = SnapshotStore.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $table"))
    val m = SnapshotStore.manifest(spark, table, cur)
    require(m.partSpec.nonEmpty,
      s"optimizePartitionCommit on $table: the table has no partition spec — " +
        "use optimizeCommit (full rewrite) or compactSmallFilesCommit")
    require(m.bucketN == 0,
      s"optimizePartitionCommit on $table refused: the table is bucketed — " +
        "z-ordering inside buckets would break the storage-partitioned-join layout")
    val unscoped = SnapshotStore.unscopedDvs(spark, m)
    require(unscoped.isEmpty,
      s"optimizePartitionCommit on $table refused: legacy unscoped deletion " +
        s"vector(s) (${unscoped.mkString(", ")}) apply table-wide — run the full " +
        "compactCommit first")
    val seg = s"${graft.store.PartitionSpec.dirColName(m.partGen, fieldIdx)}=$value"
    val all = SnapshotStore.dataFiles(spark, m)
    val (touched, kept) = all.partition(_.contains(s"/$seg/"))
    require(touched.nonEmpty,
      s"optimizePartitionCommit on $table: no files under partition '$seg'")
    val next = cur + 1
    val stageDir = s"$table/v=${next}__opt${java.util.UUID.randomUUID.toString.take(8)}"
    // DV-materialized read of just the partition, z-ordered within it,
    // re-routed under the SAME partition directory segment
    val rows = SnapshotStore.readFilesWithDvs(spark, m, touched)
    writeZordered(rows, s"$stageDir/$seg", zCols, bits, numFiles)
    val staged = SnapshotStore.listStagedFiles(spark, stageDir)
    // a DV whose scope intersects NO kept file has nothing left to
    // filter (its touched-file rows were just materialized) — clear it
    val keptKeys = kept.map(SnapshotStore.relFileKey).toSet
    val liveDvs = m.deletes.filter(dv =>
      SnapshotStore.dvScope(spark, dv).forall(_.exists(keptKeys)))
    val stats = graft.store.FileStats.sidecarFor(
      spark, table, kept ++ staged, Some(m), m.statsExact)
    val ok = SnapshotStore.tryPublishManifest(spark, table, next,
      SnapshotStore.Manifest("", liveDvs,
        if (liveDvs.nonEmpty) m.keyCols else Nil,
        ts = System.currentTimeMillis(),
        files = kept ++ staged, op = "zorder-partition",
        statsExact = m.statsExact && SnapshotStore.writerStatsExact(spark),
        mixedSchema = m.mixedSchema, statsFile = stats,
        // bloom/NDV sidecars are file-keyed: kept entries stay valid,
        // rewritten files are simply uncovered until re-analyze
        bloomFile = m.bloomFile, ndvFile = m.ndvFile,
        partSpec = m.partSpec, partGen = m.partGen, partHist = m.partHist,
        renames = m.renames, droppedCols = m.droppedCols,
        widens = m.widens, schemaJson = m.schemaJson))
    if (!ok) {
      val p = new Path(stageDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      throw new java.util.ConcurrentModificationException(
        s"optimizePartitionCommit lost the CAS race on $table version $next — " +
          "re-run against the new head")
    }
    next
  }

  /** Total file count of the table at `path` (for prune-factor audits). */
  def totalFiles(spark: SparkSession, path: String): Long = {
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(new Path(path)).count { s =>
      s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")
    }
  }
}
