package graft.ops

import graft.store.SnapshotStore

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** NDV (distinct-count) column statistics for snapshot tables —
  * PER-FILE, MERGEABLE HLL sketches (Apache DataSketches, the library
  * Spark's own `hll_sketch_agg` uses), published as a manifest surface
  * (`ndvfile=` marker line) exactly like the Bloom index:
  *
  *  - [[analyzeCommit]] runs ONE distributed pass over the current
  *    snapshot (`CALL system.analyze(table, columns)`), aggregates an
  *    HLL sketch per (file, column), and commits the sketch parquet as
  *    the next version — data untouched.
  *  - Entries are FILE-keyed (`dirName/fileName`), so appends and
  *    row-level commits carry the surface forward verbatim: inherited
  *    files keep their sketches, fresh files simply have none yet.
  *  - The DSv2 scan's `estimateStatistics` UNIONS the kept files'
  *    sketches per column (sketch union = exact distinct-set union,
  *    the whole point of HLL mergeability) and reports V2
  *    `ColumnStatistics.distinctCount`, which Spark's CBO
  *    (`spark.sql.cbo.enabled`) folds into join cardinality and
  *    reorder decisions — join ordering over snapshot tables stops
  *    guessing from row counts alone.
  *
  * 100 TB shape: the analyze pass is O(data) ONCE (schedule with
  * maintenance); the sidecar write is parallel (no single-task
  * funnel). At plan time a sidecar up to
  * `spark.graft.ndv.driverBytesMax` (default 32 MB, ~10⁴ files ×
  * probed columns) is parsed once on the driver and LRU-cached; a
  * BIGGER sidecar is never materialized on the driver at all — the
  * per-column union runs as a distributed `hll_union_agg` job over
  * the sidecar parquet and only ONE (estimate, nulls) row per column
  * comes back. Estimates are ±~1.6% at lgK=12 — far inside the 10%
  * CBO usefulness bound. */
object NdvStats {

  val LgK = 12

  /** One distributed pass: per-(file, column) HLL sketches over the
    * CURRENT snapshot's files, committed as the next version. Returns
    * the committed version. */
  def analyzeCommit(spark: SparkSession, table: String, cols: Seq[String]): Long = {
    require(cols.nonEmpty, "analyzeCommit needs at least one column")
    val cur = SnapshotStore.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $table"))
    val m = SnapshotStore.manifest(spark, table, cur)
    val files = SnapshotStore.dataFiles(spark, m)
    val reader =
      if (m.mixedSchema) spark.read.option("mergeSchema", "true") else spark.read
    val raw = reader.parquet(files: _*)
    cols.foreach(c => require(raw.schema.fieldNames.contains(c),
      s"analyze column '$c' is not in the table schema"))
    val out = s"$table/_ndv/n_${java.util.UUID.randomUUID.toString.take(8)}"
    cols.map { c =>
      raw
        // file identity = dirName/fileName, mirror-stable
        // (SnapshotStore.relFileKey) — partition-routed files keep
        // their immediate parent dir in the key like every other
        // file-keyed surface
        .select(regexp_extract(input_file_name(), "([^/]+/[^/]+)$", 1).alias("file"),
          raw(c))
        .groupBy(col("file"))
        // nulls ride along exactly (CBO's join estimation requires a
        // null count next to the distinct count — hasCountStats)
        .agg(hll_sketch_agg(raw(c), lit(LgK)).alias("sketch"),
          (count(lit(1)) - count(raw(c))).alias("nulls"))
        .select(col("file"), lit(c).alias("col"), col("sketch"), col("nulls"))
    }.reduce(_ unionAll _)
      // PARALLEL sidecar write — the shuffle already distributed the
      // (file, column) rows; funneling them through one task
      // (`coalesce(1)`, pre-round-14) made every large-table analyze
      // tail on a single writer. AQE's partition coalescing keeps the
      // file count proportionate at small scale.
      .write.mode("overwrite").parquet(out)
    val next = cur + 1
    if (!SnapshotStore.tryPublishManifest(spark, table, next,
        m.copy(ts = 0L, op = "analyze", srcV = -1L, ndvFile = out)))
      throw new IllegalStateException(
        s"analyzeCommit lost the CAS race on $table v$next — re-run against the new head")
    next
  }

  // ---- plan-time resolution ------------------------------------------

  /** Sketch entries PARSED ON THE DRIVER since JVM start (test pin:
    * the distributed path must never move it). */
  val driverEntriesLoaded = new java.util.concurrent.atomic.AtomicLong
  /** Distributed per-column union JOBS run since JVM start (test pin:
    * the driver path must never move it). */
  val distributedUnions = new java.util.concurrent.atomic.AtomicLong

  private def lru[K, V](cap: Int): java.util.Map[K, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, V](16, 0.75f, /* accessOrder = */ true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size() > cap
      })

  /** Sidecar parse cache (JVM-wide by ndv-file path — immutable once a
    * marker references it): (fileKey, col) → (serialized sketch,
    * nulls). LRU-evicted (access order, capacity 64), never a blunt
    * clear(): hot tables' sidecars stay warm while cold ones age out —
    * the same policy as the Bloom column cache. */
  private val cache = lru[String, Map[(String, String), (Array[Byte], Long)]](64)
  /** Sidecar byte sizes (immutable once written — safe to cache). */
  private val sizeCache = lru[String, java.lang.Long](256)
  /** Distributed union results: (ndvFile, md5 of the sorted file-key
    * set) → per-column estimates. Bounded; repeated planning of the
    * same snapshot never re-runs the job. */
  private val distCache = lru[(String, String), Map[String, (Long, Long)]](64)

  def sketches(
      spark: SparkSession, ndvFile: String): Map[(String, String), (Array[Byte], Long)] = {
    val hit = cache.get(ndvFile)
    if (hit != null) return hit
    val loaded = spark.read.parquet(ndvFile).collect().toSeq.flatMap { r =>
      Option(r.getAs[Array[Byte]]("sketch")).map { b =>
        driverEntriesLoaded.incrementAndGet()
        ((r.getAs[String]("file"), r.getAs[String]("col")),
          (b, r.getAs[Long]("nulls")))
      }
    }.toMap
    cache.put(ndvFile, loaded)
    loaded
  }

  private def sidecarBytes(spark: SparkSession, ndvFile: String): Long = {
    val hit = sizeCache.get(ndvFile)
    if (hit != null) return hit.longValue()
    val p = new org.apache.hadoop.fs.Path(ndvFile)
    val sz = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
    sizeCache.put(ndvFile, java.lang.Long.valueOf(sz))
    sz
  }

  /** Distinct-count + null-count estimates per column over exactly
    * `files`, from the union of their per-file sketches. A column is
    * reported ONLY when every file has a sketch (a partial union would
    * silently underestimate NDV for CBO — worse than no estimate).
    *
    * Routing: a sidecar within `spark.graft.ndv.driverBytesMax`
    * (default 32 MB) is parsed once on the driver and unioned in
    * process (the hot path — O(probed tables) small parquet reads per
    * JVM); a bigger sidecar runs the union DISTRIBUTEDLY
    * (`hll_union_agg` over the sidecar parquet, kept-file set shipped
    * as a broadcast semi-join) and only one merged (estimate, nulls)
    * row per column reaches the driver — plan-time driver memory stays
    * O(columns) no matter how many files the table has. */
  def estimates(
      spark: SparkSession,
      ndvFile: String,
      files: Seq[String]): Map[String, (Long, Long)] = {
    if (ndvFile.isEmpty || files.isEmpty) return Map.empty
    val keys = files.map(SnapshotStore.relFileKey).distinct
    val driverBytesMax = spark.conf.get(
      "spark.graft.ndv.driverBytesMax", (32L << 20).toString).toLong
    try {
      if (sidecarBytes(spark, ndvFile) <= driverBytesMax)
        driverEstimates(spark, ndvFile, keys)
      else
        distributedEstimates(spark, ndvFile, keys)
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  private def driverEstimates(
      spark: SparkSession, ndvFile: String, keys: Seq[String]): Map[String, (Long, Long)] = {
    val sk = sketches(spark, ndvFile)
    sk.keysIterator.map(_._2).toSet.toSeq.flatMap { (c: String) =>
      val parts = keys.map(fk => sk.get((fk, c)))
      if (parts.exists(_.isEmpty)) None // uncovered file → no estimate
      else {
        val u = new org.apache.datasketches.hll.Union(LgK)
        parts.flatten.foreach { case (b, _) =>
          u.update(org.apache.datasketches.hll.HllSketch.heapify(b)) }
        Some(c -> ((math.max(0L, math.round(u.getResult.getEstimate)),
          parts.flatten.map(_._2).sum)))
      }
    }.toMap
  }

  private def distributedEstimates(
      spark: SparkSession, ndvFile: String, keys: Seq[String]): Map[String, (Long, Long)] = {
    val setKey = {
      val md = java.security.MessageDigest.getInstance("MD5")
      keys.sorted.foreach(k => md.update(k.getBytes("UTF-8")))
      java.util.Base64.getEncoder.encodeToString(md.digest())
    }
    val hit = distCache.get((ndvFile, setKey))
    if (hit != null) return hit
    distributedUnions.incrementAndGet()
    // kept-file set as a broadcast semi-join build side: the driver
    // already holds the file list, so shipping it is O(paths); the
    // sidecar (the big side) streams through executors and never
    // lands on the driver
    val keysDf = spark.createDataset(keys)(org.apache.spark.sql.Encoders.STRING)
      .toDF("file")
    val rows = spark.read.parquet(ndvFile)
      .filter(col("sketch").isNotNull)
      .join(broadcast(keysDf), Seq("file"), "inner")
      .groupBy(col("col"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true))).alias("ndv"),
        sum(col("nulls")).alias("nulls"),
        count(lit(1)).alias("nfiles"))
      .collect()
    val n = keys.size.toLong
    val out = rows.iterator.flatMap { r =>
      // full coverage only — same contract as the driver path
      if (r.getAs[Long]("nfiles") != n) None
      else Some(r.getAs[String]("col") ->
        ((math.max(0L, r.getAs[Long]("ndv")), r.getAs[Long]("nulls"))))
    }.toMap
    distCache.put((ndvFile, setKey), out)
    out
  }
}
