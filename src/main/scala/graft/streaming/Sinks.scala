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
  /** foreachBatch CDC upsert sink — a streaming MATERIALIZED VIEW of
    * "current state per key" over a changelog stream. Each micro-batch
    * folds into the previous state with
    * [[graft.ops.ChangeData.applyChangelog]] (latest version wins,
    * tombstones drop keys) and writes a fresh immutable
    * `state_v=<batchId>` directory; [[readState]] serves the highest
    * version. Crash-replay is idempotent by construction: a replayed
    * batch rebuilds exactly its own version directory from the same
    * immutable inputs (previous state + replayed data).
    *
    * Assumes per-key versions arrive non-decreasing ACROSS batches
    * (watermark-ordered upstream): a compacted state does not retain
    * tombstones, so late out-of-order rows older than a processed
    * delete would resurrect the key.
    *
    * Scale note: the state is rewritten whole per batch (simple,
    * atomic). At 100 TB, hash-shard the state by key and rewrite only
    * shards containing batch keys — the fold is per-key, so the layout
    * supports it unchanged; superseded versions are GC'd by retention. */
  def upsertStateSink(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      deleteOp: String = "D",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        applyBatchUpsert(df, batchId, path, keyCols, versionCol, opCol, deleteOp)
      }
      .start()

  /** One micro-batch of the upsert fold (exposed for replay testing). */
  def applyBatchUpsert(
      df: DataFrame,
      batchId: Long,
      path: String,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      deleteOp: String): Unit = {
    val spark = df.sparkSession
    val unioned = latestStateDir(spark, path, before = Some(batchId))
      .map(prev => spark.read.parquet(prev).unionByName(df))
      .getOrElse(df)
    graft.ops.ChangeData.applyChangelog(unioned, keyCols, versionCol, opCol, deleteOp)
      .write.mode("overwrite").parquet(s"$path/state_v=$batchId")
  }

  /** The current materialized state: the highest `state_v` version. */
  def readState(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(latestStateDir(spark, path, before = None).getOrElse(
      throw new IllegalStateException(s"no state_v=* directory under $path")))

  /** Deterministic shard of a key tuple: Murmur3 hash (fixed seed — the
    * SAME key lands in the SAME shard in every batch) mod `shards`. */
  def shardOf(keyCols: Seq[String], shards: Int): org.apache.spark.sql.Column =
    pmod(hash(keyCols.map(col): _*), lit(shards))

  /** HASH-SHARDED upsert fold — the 100 TB shape of [[applyBatchUpsert]].
    *
    * The unsharded sink rewrites the WHOLE state every micro-batch
    * (simple, atomic — fine while state ≪ batch cadence × IO budget).
    * At 100 TB of state that rewrite is the bottleneck, and it's
    * unnecessary: a fold is per-key, so a batch only changes the keys
    * it carries. This variant partitions state into `shards` by key
    * hash, each shard independently versioned
    * (`shard=<s>/state_v=<batchId>`), and a micro-batch:
    *
    *  1. computes the DISTINCT shards its keys touch (≤ `shards` rows
    *     to the driver — bounded, never data-sized);
    *  2. for each touched shard, folds batch-shard rows into that
    *     shard's latest state and writes ONE new shard version;
    *  3. leaves untouched shards' files entirely alone.
    *
    * A batch touching k of S shards rewrites k/S of the state. Readers
    * ([[readStateSharded]]) union each shard's LATEST version — one
    * multi-path parquet read. Crash-replay stays idempotent per shard:
    * a replayed batch rebuilds exactly its own `state_v=<batchId>`
    * shard dirs from the same immutable inputs (shard membership is
    * deterministic). [[vacuumState]] applies per shard directory.
    *
    * Returns the touched shard ids (diagnostics / tests). */
  def applyBatchUpsertSharded(
      df: DataFrame,
      batchId: Long,
      path: String,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      deleteOp: String,
      shards: Int): Seq[Int] = {
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = df.sparkSession
    val withShard = df.withColumn("__shard", shardOf(keyCols, shards))
    // bounded driver relation: at most `shards` rows
    val touched = withShard.select("__shard").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    touched.foreach { s =>
      val shardPath = s"$path/shard=$s"
      val batchShard = withShard.filter(col("__shard") === s).drop("__shard")
      val unioned = latestStateDir(spark, shardPath, before = Some(batchId))
        .map(prev => spark.read.parquet(prev).unionByName(batchShard))
        .getOrElse(batchShard)
      graft.ops.ChangeData.applyChangelog(unioned, keyCols, versionCol, opCol, deleteOp)
        .write.mode("overwrite").parquet(s"$shardPath/state_v=$batchId")
    }
    touched
  }

  /** Current materialized state of a sharded sink: union of every
    * shard's latest version, as ONE multi-path parquet read. */
  def readStateSharded(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root))
      throw new IllegalStateException(s"no sharded state under $path")
    val latest = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard="))
      .flatMap(st => latestStateDir(spark, st.getPath.toString, before = None))
    if (latest.isEmpty)
      throw new IllegalStateException(s"no shard has a state_v=* version under $path")
    spark.read.parquet(latest: _*)
  }

  /** foreachBatch CDC upsert sink over sharded state — same contract as
    * [[upsertStateSink]], O(touched shards / shards) rewrite per batch. */
  def upsertStateSinkSharded(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      deleteOp: String = "D",
      shards: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        applyBatchUpsertSharded(df, batchId, path, keyCols, versionCol, opCol, deleteOp, shards)
        ()
      }
      .start()

  /** Safe parse of a `state_v=<N>` directory name. Non-numeric entries
    * (a leftover temp dir from an interrupted write, a foreign file
    * someone dropped in) are skipped — maintenance ops like
    * [[vacuumState]] must degrade to ignoring a stray entry, not die
    * on a NumberFormatException. */
  private def parseStateVersion(name: String): Option[Long] =
    if (name.startsWith("state_v="))
      scala.util.Try(name.stripPrefix("state_v=").toLong).toOption
    else None

  private def latestStateDir(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      before: Option[Long]): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val versions = fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .flatMap(parseStateVersion)
      .filter(v => before.forall(v < _))
    if (versions.isEmpty) None else Some(s"$path/state_v=${versions.max}")
  }

  /** Retention GC for the versioned state sink: delete all but the
    * newest `keep` `state_v=` directories. The maintenance half of the
    * upsert sink's contract — each micro-batch writes a NEW immutable
    * state version (that immutability is what makes crash-replay
    * idempotent), so an unbounded stream accumulates unbounded
    * superseded versions; at 100 TB of state the GC is what keeps the
    * footprint O(keep × state), not O(batches × state). Keeps ≥ 1
    * version always (the readable current state), never touches the
    * newest, and returns the deleted version numbers. Safe to run
    * concurrently with readers of the LATEST version; `keep > 1` leaves
    * grace versions for in-flight readers of the previous one. */
  def vacuumState(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      keep: Int = 2): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val versions = fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .flatMap(parseStateVersion)
      .sorted
    val doomed = versions.dropRight(keep)
    doomed.foreach(v => fs.delete(new org.apache.hadoop.fs.Path(s"$path/state_v=$v"), true))
    doomed
  }

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
