package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming → warehouse sinks: land micro-batches as catalog-queryable
  * parquet with replay-idempotent writes.
  *
  * Structured Streaming's file sink is already exactly-once via its own
  * manifest log, but the manifest is only honored by Spark readers. This
  * sink instead makes the DATA itself idempotent — each micro-batch owns a
  * `batch_id=<n>` partition written with dynamic partition overwrite — so
  * any parquet reader (DuckDB, Trino, the reference's Athena) sees
  * exactly-once output even after a crash-replay, with no manifest
  * required. The same pattern is how the batch pipeline makes re-runs safe
  * (see `BronzeToSilver`'s idempotent dynamic-partition overwrite;
  * reference analog: re-runnable Glue jobs, `bronze_to_silver.py`).
  */
object Sinks {

  /** Land ONE micro-batch in its own `batch_id=<n>` partition. Dynamic
    * partition overwrite means a replayed batch (crash between the data
    * write and the checkpoint commit) REWRITES its partition rather than
    * appending duplicates — idempotence from path layout alone. Writes
    * only the replayed batch's partition: at 100 TB of accumulated
    * history a replay touches one partition, never the table. */
  def writeBatchIdempotent(df: DataFrame, batchId: Long, path: String): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** foreachBatch parquet sink with per-batch idempotent overwrite and
    * optional catalog registration (the streaming analog of
    * `Pipeline.catalogWarehouse`): the first batch creates an external
    * table over `path` (schema + partitioning inferred from the layout),
    * and every batch registers ONLY its own partition with `ALTER TABLE
    * ADD PARTITION` — O(1) catalog work per batch, where `MSCK REPAIR`
    * would re-list the whole (eventually enormous) directory tree each
    * trigger. */
  def idempotentParquetSink(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      tableName: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        writeBatchIdempotent(df, batchId, path)
        tableName.foreach { t =>
          val s = df.sparkSession
          if (!s.catalog.tableExists(t)) {
            s.sql(s"CREATE TABLE $t USING parquet LOCATION '$path'")
          }
          s.sql(s"ALTER TABLE $t ADD IF NOT EXISTS PARTITION (batch_id=$batchId)")
          s.catalog.refreshTable(t)
        }
      }
      .start()
}
