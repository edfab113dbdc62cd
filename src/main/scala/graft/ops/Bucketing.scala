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
}
