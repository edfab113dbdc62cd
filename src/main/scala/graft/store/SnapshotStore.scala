package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-isolated plain-parquet tables: a minimal commit-log layout
  * that gives read-union-rewrite maintenance jobs (SCD2 merge, CDC
  * state, compaction) atomic visibility without an external table
  * format.
  *
  * Layout under a table root:
  * {{{
  *   <table>/v=<N>/part-*.parquet   immutable snapshot data (never edited)
  *   <table>/_commits/<N>           commit marker, created atomically
  * }}}
  *
  * The invariant that buys isolation: '''a version exists for readers
  * only once its marker file exists''', and the marker is published with
  * an atomic rename (temp file → final name), the same primitive Spark's
  * own streaming manifest log relies on. A writer builds `v=<N>` at
  * leisure — crash mid-write and the directory is an invisible orphan
  * that [[vacuum]] collects; a concurrent reader resolves the newest
  * MARKER, so it sees the previous complete snapshot until the instant
  * the new one is fully durable, and never a half-rewritten mix. This
  * generalizes the `state_v=<batchId>` scheme of
  * [[graft.streaming.Sinks]] (whose versions become visible by data-dir
  * listing — safe there only because the streaming checkpoint
  * serializes its single writer).
  *
  * Scale notes for the 100 TB shape:
  *  - Readers list `_commits/` (tiny marker files), never the data tree.
  *  - Each commit rewrites only what the job rewrites; history is
  *    retained until [[vacuum]], so long-running readers pinned to an
  *    old version keep a consistent view (keep ≥ 2 grace versions).
  *  - Concurrent WRITERS are last-marker-wins: serializing multi-writer
  *    commits needs a compare-and-swap the filesystem API lacks — run
  *    maintenance single-writer per table, as every table format's
  *    compaction job does anyway.
  *
  * Reference analog: the weather warehouse overwrites plain parquet in
  * place (`build_dimensions.py:93`), so an Athena query racing the Glue
  * rewrite can see a torn table — this store is the repo's answer to
  * that gap.
  */
object SnapshotStore {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(table: String) = s"$table/_commits"

  private def parseVersion(name: String): Option[Long] =
    // tolerate foreign files (temp markers, editor droppings): skip, don't die
    scala.util.Try(name.toLong).toOption

  /** All committed versions, ascending (empty if the table has none). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val dir = new Path(commitsDir(table))
    val f = fs(spark, table)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).toSeq
      .filter(_.isFile)
      .flatMap(s => parseVersion(s.getPath.getName))
      .sorted
  }

  /** Newest committed version, if any. */
  def currentVersion(spark: SparkSession, table: String): Option[Long] =
    versions(spark, table).lastOption

  def versionDir(table: String, v: Long): String = s"$table/v=$v"

  /** Read the newest committed snapshot. */
  def read(spark: SparkSession, table: String): DataFrame =
    currentVersion(spark, table)
      .map(v => readVersion(spark, table, v))
      .getOrElse(throw new IllegalStateException(s"no committed snapshot under $table"))

  /** Time travel: read one specific committed snapshot. */
  def readVersion(spark: SparkSession, table: String, v: Long): DataFrame = {
    require(versions(spark, table).contains(v), s"version $v is not committed under $table")
    spark.read.parquet(versionDir(table, v))
  }

  /** Write `df` as the next snapshot and publish it atomically. Returns
    * the committed version number. The data write (the long part) is
    * invisible to readers; visibility flips at the marker rename. */
  def commit(df: DataFrame, table: String): Long = {
    val spark = df.sparkSession
    val next = currentVersion(spark, table).map(_ + 1).getOrElse(0L)
    df.write.mode("overwrite").parquet(versionDir(table, next))
    publishMarker(spark, table, next)
    next
  }

  /** Publish the marker for a version whose data dir was written by the
    * caller (lets multi-step writers stage data their own way). */
  def publishMarker(spark: SparkSession, table: String, v: Long): Unit = {
    val f = fs(spark, table)
    val dir = new Path(commitsDir(table))
    f.mkdirs(dir)
    val tmp = new Path(dir, s".tmp_$v")
    val out = f.create(tmp, true)
    try out.write(versionDir(table, v).getBytes("UTF-8"))
    finally out.close()
    // atomic on HDFS and local fs: the marker appears whole or not at all
    if (!f.rename(tmp, new Path(dir, v.toString)))
      throw new IllegalStateException(s"could not publish commit marker $v under $table")
  }

  /** Retention GC: drop all but the newest `keep` committed snapshots,
    * plus any UNCOMMITTED orphan `v=` directory below the current
    * version (an abandoned write that crashed before its marker).
    * Returns the deleted version numbers. Keep ≥ 2 to leave a grace
    * snapshot for in-flight readers of the previous version. */
  def vacuum(spark: SparkSession, table: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val committed = versions(spark, table)
    if (committed.isEmpty) return Seq.empty
    val current = committed.last
    val f = fs(spark, table)
    val root = new Path(table)
    val dataVersions = f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.stripPrefix("v=") }
      .flatMap(parseVersion)
    val doomedCommitted = committed.dropRight(keep)
    val orphans = dataVersions.filterNot(committed.contains).filter(_ < current)
    val doomed = (doomedCommitted ++ orphans).distinct.sorted
    doomed.foreach { v =>
      f.delete(new Path(versionDir(table, v)), true)
      f.delete(new Path(commitsDir(table), v.toString), false)
    }
    doomed
  }
}
