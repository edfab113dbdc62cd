package graft.ops

import graft.store.{FileStats, SnapshotStore}

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** DV-DENSITY-AWARE compaction scheduling — the read-side complement
  * of merge-on-read: MoR keeps commits O(delta) by accumulating scoped
  * deletion vectors, and "compaction is the remediation" was until now
  * a documented contract enforced by nobody. [[run]] MEASURES the
  * density (DV key rows vs live table rows — both from METADATA only:
  * DV parquet footers' row counts + the stats sidecar's group rows, no
  * data page is read) and triggers the compacting rewrite when the
  * table crosses the bound, so a MoR-heavy table self-heals instead of
  * paying the probe cost forever.
  *
  * Decision receipts land in the result rows AND the table's history
  * (`op=compact` on trigger), so `CALL system.maintenance(t)` in a
  * nightly job is the whole scheduling story. At 100 TB the check
  * costs O(DV files + 1 sidecar read) on the driver — independent of
  * table bytes. */
object Maintenance {

  final case class Receipt(
      dvRows: Long, tableRows: Long, density: Double,
      action: String, version: Long)

  /** DV key rows recorded in the manifest's DV files — footer row
    * counts only. */
  def dvRows(spark: SparkSession, m: SnapshotStore.Manifest): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    m.deletes.flatMap { d =>
      val p = new Path(d)
      val f = p.getFileSystem(conf)
      if (!f.exists(p)) Nil
      else if (f.getFileStatus(p).isDirectory)
        f.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      else Seq(p)
    }.map { p =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Physical rows of the manifest's data files from the stats sidecar
    * (one cached read); files absent from the sidecar fall back to
    * their own footer row counts. */
  def tableRows(spark: SparkSession, m: SnapshotStore.Manifest): Long = {
    val entries =
      if (m.statsFile.isEmpty) Map.empty[String, FileStats.Entry]
      else
        try FileStats.read(spark, m.statsFile).entries
        catch { case scala.util.control.NonFatal(_) => Map.empty[String, FileStats.Entry] }
    val conf = spark.sparkContext.hadoopConfiguration
    SnapshotStore.dataFiles(spark, m).map { f =>
      entries.get(f) match {
        case Some(e) => e.groups.map(_.rows).sum
        case None =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
          try r.getRecordCount finally r.close()
      }
    }.sum
  }

  /** Measure density; compact (full rewrite — materializes every DV
    * away) when `dvRows / tableRows > maxDvRatio`. `targetBytes` sizes
    * the rewrite's output files. Returns the receipt; on trigger the
    * committed version appears in the table's `$history` as the
    * compaction op. */
  def run(
      spark: SparkSession,
      table: String,
      maxDvRatio: Double = 0.1,
      targetBytes: Long = 128L << 20): Receipt = {
    require(maxDvRatio > 0.0, s"maxDvRatio must be positive, got $maxDvRatio")
    val cur = SnapshotStore.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $table"))
    val m = SnapshotStore.manifest(spark, table, cur)
    if (m.deletes.isEmpty)
      return Receipt(0L, -1L, 0.0, "none (no deletion vectors)", cur)
    val dv = dvRows(spark, m)
    val rows = tableRows(spark, m)
    val density = if (rows <= 0L) 1.0 else dv.toDouble / rows
    if (density <= maxDvRatio)
      Receipt(dv, rows, density, s"none (density below $maxDvRatio)", cur)
    else {
      Bucketing.compactCommit(spark, table, targetBytes)
      // the rewrite replaced every file, voiding NDV sketch coverage —
      // refresh the previously analyzed columns in the same maintenance
      // pass so CBO estimates survive the self-heal
      val refreshed: Seq[String] =
        if (m.ndvFile.isEmpty) Nil
        else
          try {
            // column names only — never materialize the sketch bytes
            // on the driver just to list the analyzed columns
            val cols = spark.read.parquet(m.ndvFile).select("col")
              .distinct().collect().map(_.getString(0)).toSeq.sorted
            if (cols.nonEmpty) NdvStats.analyzeCommit(spark, table, cols)
            cols
          } catch { case scala.util.control.NonFatal(_) => Nil }
      val note =
        if (refreshed.isEmpty) "compacted (deletion vectors materialized away)"
        else "compacted (deletion vectors materialized away; NDV re-analyzed: " +
          refreshed.mkString(",") + ")"
      Receipt(dv, rows, density, note,
        SnapshotStore.currentVersion(spark, table).getOrElse(cur))
    }
  }
}
