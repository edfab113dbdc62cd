package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory.
  *
  * Every entry point (Verify, Bench, Pipeline, tests) builds its session
  * here so session-level flags live in exactly one place (round-1 ADVICE:
  * `spark.sql.legacy.parquet.nanosAsLong` was buried inside a reader and
  * made table reads ordering-dependent).
  *
  * Scale notes (100 TB / 1000-executor target):
  *  - shuffle partitions follow the core count locally; on a real cluster
  *    AQE coalescing (`spark.sql.adaptive.enabled`, on by default in
  *    Spark 4) re-sizes post-shuffle partitions, so the static number only
  *    sets the upper bound for the map side.
  *  - the session timezone is pinned UTC so timestamp→string/date
  *    conversions are deterministic across environments.
  */
object Sessions {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def local(appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Legacy data generations stored events.ts as INT64 TIMESTAMP(NANOS),
      // which Spark's vectorized reader rejects without this flag; with it,
      // NANOS columns load as Long and Tables.events derives the epochs.
      // Current data is timestamp[us] (flag is a no-op there) — kept so
      // either generation loads.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // partitioned overwrites replace only the partitions present in the
      // incoming batch (idempotent re-runs), never the whole table
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // catalog tables (bucketed-join demo) land in a temp warehouse,
      // never the working directory
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
