package graft.ops

import org.apache.spark.sql.DataFrame

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
}
