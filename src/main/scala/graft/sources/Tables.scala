package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (`TESTDATA.md`).
  *
  * All tables are single parquet files under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning; the only
  * normalization happens on `events`, whose `ts` column is physically
  * INT64 TIMESTAMP(NANOS) parquet — a type Spark's vectorized reader
  * rejects. We read it as raw nanoseconds (legacy flag) and expose both
  * the epoch-millis value and a proper microsecond TimestampType column.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` normalized:
    *   - `ts`       : raw epoch nanoseconds (long)
    *   - `ts_ms`    : epoch milliseconds (long) — matches DuckDB `epoch_ms(ts)`
    *   - `event_time`: TimestampType at microsecond precision (session TZ is UTC)
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Runtime conf; must be set before the parquet footer is parsed.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts_ms", expr("ts DIV 1000000"))
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
  }
}
