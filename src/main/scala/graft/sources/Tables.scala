package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (`TESTDATA.md`).
  *
  * All tables are single parquet files under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning; the only
  * normalization happens on `events`, whose `ts` column's physical type
  * has varied across data generations (INT64 TIMESTAMP(NANOS) in early
  * rounds, timestamp[us] since r8). [[events]] adapts to whatever Spark
  * loads. `spark.sql.legacy.parquet.nanosAsLong` stays set (in
  * [[graft.Sessions]] and defensively here) so a legacy NANOS file loads
  * as Long instead of failing the footer parse; it is a no-op on
  * timestamp[us] data.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // defensive re-assert so the read is safe from ANY session, not
      // just ones built through graft.Sessions (idempotent): legacy
      // NANOS footers need the flag to load at all. The UTC timezone
      // concern lives in [[events]], scoped to analysis of that frame —
      // a plain table() read must not mutate the caller's session TZ.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` normalized, adaptively on the *loaded* type:
    *   - `ts_us`     : epoch microseconds (long) — matches DuckDB `epoch_us(ts)`
    *   - `ts_ms`     : epoch milliseconds (long) — matches DuckDB `epoch_ms(ts)`
    *   - `event_time`: TimestampType at microsecond precision (session TZ UTC)
    *
    * The generated data's physical type has drifted across driver rounds
    * (INT64 TIMESTAMP(NANOS) → timestamp[us]), so the reader branches on
    * what Spark actually loaded instead of assuming a physical layout:
    *   - TimestampType / TimestampNTZType (timestamp[us] parquet): derive
    *     the epochs with `unix_micros`/`unix_millis`. NTZ is first cast to
    *     TimestampType — the session TZ is pinned UTC ([[graft.Sessions]]),
    *     so the naive value is interpreted exactly as DuckDB's `epoch_us`
    *     interprets it.
    *   - LongType (legacy INT64 nanos surfaced via
    *     `spark.sql.legacy.parquet.nanosAsLong`): integer `DIV`. Exact
    *     truncating division; all test timestamps are 2024+, so truncation
    *     == floor.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        // The NTZ→timestamp cast interprets the naive value in the
        // SESSION timezone, and ResolveTimeZone bakes that zone into the
        // Cast at ANALYSIS time (Dataset creation is eagerly analyzed).
        // Pin UTC only while this frame is built and restore the
        // caller's setting after: the derived columns stay UTC-correct
        // forever (the zone travels with the resolved Cast), and a
        // caller who deliberately runs a non-UTC session keeps it.
        // synchronized: two threads interleaving set/restore on the
        // SHARED session conf could capture "UTC" as the prior value
        // and leave the session permanently pinned to UTC
        Tables.synchronized {
          val prior = s.conf.getOption("spark.sql.session.timeZone")
          s.conf.set("spark.sql.session.timeZone", "UTC")
          try {
            val t = col("ts").cast(TimestampType)
            raw
              .withColumn("ts_us", unix_micros(t))
              .withColumn("ts_ms", unix_millis(t))
              .withColumn("event_time", t)
          } finally prior match {
            case Some(tz) => s.conf.set("spark.sql.session.timeZone", tz)
            case None     => s.conf.unset("spark.sql.session.timeZone")
          }
        }
      case LongType =>
        raw
          .withColumn("ts_us", expr("ts DIV 1000"))
          .withColumn("ts_ms", expr("ts DIV 1000000"))
          .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as unsupported type $other; expected timestamp or long(nanos)")
    }
  }
}
