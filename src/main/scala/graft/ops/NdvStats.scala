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
  * maintenance); planning reads one small sketch parquet per table
  * version and unions O(kept files × probed columns) sketches of a
  * few KB each. Estimates are ±~1.6% at lgK=12 — far inside the 10%
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
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
    val next = cur + 1
    if (!SnapshotStore.tryPublishManifest(spark, table, next,
        m.copy(ts = 0L, op = "analyze", srcV = -1L, ndvFile = out)))
      throw new IllegalStateException(
        s"analyzeCommit lost the CAS race on $table v$next — re-run against the new head")
    next
  }

  /** Sketch parse cache (JVM-wide by ndv-file path — immutable once a
    * marker references it): (fileKey, col) → serialized sketch. */
  private val cache = scala.collection.concurrent.TrieMap
    .empty[String, Map[(String, String), (Array[Byte], Long)]]

  def sketches(
      spark: SparkSession, ndvFile: String): Map[(String, String), (Array[Byte], Long)] =
    cache.getOrElseUpdate(ndvFile, {
      if (cache.size > 64) cache.clear()
      spark.read.parquet(ndvFile).collect().toSeq.flatMap { r =>
        Option(r.getAs[Array[Byte]]("sketch")).map(b =>
          ((r.getAs[String]("file"), r.getAs[String]("col")),
            (b, r.getAs[Long]("nulls"))))
      }.toMap
    })

  /** Distinct-count estimates per column over exactly `files`, from
    * the union of their sketches. A column is reported ONLY when every
    * file has a sketch (a partial union would silently underestimate
    * NDV for CBO — worse than no estimate). */
  def estimates(
      spark: SparkSession,
      ndvFile: String,
      files: Seq[String]): Map[String, (Long, Long)] = {
    if (ndvFile.isEmpty || files.isEmpty) return Map.empty
    val sk =
      try sketches(spark, ndvFile)
      catch { case scala.util.control.NonFatal(_) => return Map.empty }
    val keys = files.map(SnapshotStore.relFileKey)
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
}
