package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (`TESTDATA.md`).
  *
  * All tables are single parquet files under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning; the only
  * normalization happens on `events`, whose `ts` column is physically
  * INT64 TIMESTAMP(NANOS) parquet — a type Spark's vectorized reader
  * rejects unless `spark.sql.legacy.parquet.nanosAsLong` is set (done
  * once at session build in [[graft.Sessions]]; re-asserted here so the
  * read is safe from any session).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") // defensive: footer parse needs the flag (idempotent)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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

  /** `events` with `ts` normalized:
    *   - `ts`        : raw epoch nanoseconds (long)
    *   - `ts_us`     : epoch microseconds (long) — matches DuckDB `epoch_us(ts)`
    *   - `ts_ms`     : epoch milliseconds (long) — matches DuckDB `epoch_ms(ts)`
    *   - `event_time`: TimestampType at microsecond precision (session TZ UTC)
    *
    * `DIV` is exact integer division (truncation toward zero); all test
    * timestamps are 2024+, so truncation == floor. Pre-epoch (negative)
    * nanos would need floor semantics — documented assumption, see ADVICE r1.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
      .withColumn("ts_ms", expr("ts DIV 1000000"))
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
}
