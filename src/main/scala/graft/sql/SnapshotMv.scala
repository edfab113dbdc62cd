package graft.sql

import java.net.{URLDecoder, URLEncoder}

import scala.util.{Failure, Success, Try}

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ChangeData
import graft.store.SnapshotStore

/** INCREMENTALLY-MAINTAINED materialized aggregates over snapshot
  * tables — the composition of the row-granular change feed (round 16)
  * with the re-aggregable summary-state algebra
  * ([[graft.ops.ChangeData.aggState]]): `refresh` advances the MV from
  * the base version it reflects to the current one by reading ONLY the
  * changed rows, never rescanning the base table.
  *
  * The MV is itself a snapshot table whose rows are `groupCols ++ (n,
  * sum_/cnt_/min_/max_<measure>…)` — the same state schema
  * [[MaterializedAgg]] registers for automatic query rewrite, so a
  * refreshed MV can be `register`ed and dashboard aggregates rewrite to
  * it transparently. A `_mv` sidecar under the MV root records which
  * base table + version the summary reflects (table-level metadata like
  * `_constraints`: atomic tmp+rename swap, untouched by vacuum).
  *
  * REFRESH ALGEBRA per change-feed row kind (the batch feed's contract,
  * [[graft.sources.SnapshotStream]]):
  *  - `insert` → `+state`; `remove` (CoW pre-image) → `−state`.
  *  - `delete` (merge-on-read DV keys; key columns only) → pre-image
  *    rows are fetched by semi-joining the keys against the commit's
  *    PREDECESSOR version — O(deleted keys) with file skipping, never a
  *    full rescan — then `−state`.
  *  - `snapshot` (a true rewrite) → the delta algebra has no base to
  *    stand on; fall back to ONE full rebuild (reported in the result).
  *
  * `sum`/`cnt`/`n` subtract exactly. `min`/`max` are NOT incrementally
  * maintainable under deletion in general: a group recomputes from the
  * base (restricted to that group by semi-join) ONLY when some removed
  * value TIES the group's current bound — a removed value strictly
  * inside `(min, max)` provably cannot move either bound, so those
  * groups stay algebraic. Groups whose `n` reaches 0 vanish.
  *
  * At 100 TB: a daily 0.1 % churn refresh reads ~0.1 % of the table
  * (the sidecar'd changed rows) plus the affected-group slices for
  * bound hits, and commits one new MV version (MV size = group
  * cardinality — the summary a dashboard scans instead of the fact
  * table). Exact-sum workloads should use integral measures (cents),
  * as everywhere else in the engine: float sums re-associate.
  *
  * Reference scope: the reference rebuilds its gold marts from scratch
  * each run (`scripts/glue/gold_job.py:1-120` recomputes every
  * aggregate); this surface is the beyond-parity path that keeps the
  * same marts fresh without the rebuild. */
object SnapshotMv {

  /** What the `_mv` sidecar records. */
  final case class MvMeta(
      baseTable: String,
      groupCols: Seq[String],
      measureCols: Seq[String],
      baseVersion: Long)

  /** One create/refresh outcome. `mode` ∈ full | incremental | noop;
    * `recomputedGroups` counts groups whose min/max bound a removal
    * hit (each recomputed from its base slice, not the delta). */
  final case class RefreshResult(
      mvVersion: Long,
      mode: String,
      fromVersion: Long,
      toVersion: Long,
      recomputedGroups: Long)

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")

  def metaFile(mvTable: String): Path = new Path(s"$mvTable/_mv")

  def meta(spark: SparkSession, mvTable: String): Option[MvMeta] = {
    val p = metaFile(mvTable)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val kv = text.linesIterator.flatMap { l =>
      l.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    for {
      base <- kv.get("base")
      g <- kv.get("groups")
      ms <- kv.get("measures")
      v <- kv.get("version").flatMap(_.toLongOption)
    } yield MvMeta(dec(base),
      g.split(",").toSeq.filter(_.nonEmpty).map(dec),
      ms.split(",").toSeq.filter(_.nonEmpty).map(dec), v)
  }

  private def writeMeta(spark: SparkSession, mvTable: String, m: MvMeta): Unit = {
    val p = metaFile(mvTable)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".tmp_mv_${java.util.UUID.randomUUID.toString.take(12)}")
    val out = f.create(tmp, true)
    try out.write(
      (s"base=${enc(m.baseTable)}\n" +
        s"groups=${m.groupCols.map(enc).mkString(",")}\n" +
        s"measures=${m.measureCols.map(enc).mkString(",")}\n" +
        s"version=${m.baseVersion}\n").getBytes("UTF-8"))
    finally out.close()
    val fc = FileContext.getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, Options.Rename.OVERWRITE)
  }

  /** Build the summary at the base's CURRENT version (one aggregate
    * over the base — the only full scan the MV ever needs), commit it
    * as the MV table's next version, and record the reflected base
    * version in the `_mv` sidecar. */
  def create(
      spark: SparkSession,
      baseTable: String,
      mvTable: String,
      groupCols: Seq[String],
      measureCols: Seq[String]): RefreshResult = {
    require(groupCols.nonEmpty && measureCols.nonEmpty,
      "an aggregate MV needs at least one group column and one measure")
    val v = SnapshotStore.currentVersion(spark, baseTable).getOrElse(
      throw new IllegalArgumentException(
        s"$baseTable is not a snapshot table (no committed version)"))
    val state = ChangeData.aggState(
      SnapshotStore.readVersion(spark, baseTable, v), groupCols, measureCols)
    val mvV = SnapshotStore.commit(state, mvTable)
    writeMeta(spark, mvTable, MvMeta(baseTable, groupCols, measureCols, v))
    register(spark, mvTable)
    RefreshResult(mvV, "full", -1L, v, 0L)
  }

  /** Register (or re-register, e.g. in a fresh session) this MV for
    * transparent query rewrite: DSv2 scans of the base whose pinned
    * manifest matches the version the `_mv` sidecar records re-target
    * onto the summary ([[graft.plans.AggMvRewriteRule]]). Freshness is
    * checked at rewrite time against the sidecar, so registration
    * never goes stale — a lagging MV simply stops matching until the
    * next [[refresh]]. */
  def register(spark: SparkSession, mvTable: String): MaterializedAgg.AggMv = {
    val m = meta(spark, mvTable).getOrElse(throw new IllegalArgumentException(
      s"$mvTable has no _mv sidecar — create() the MV first"))
    val mv = MaterializedAgg.AggMv(
      m.baseTable, mvTable, m.groupCols, m.measureCols, snapshot = true)
    MaterializedAgg.register(mv)
    mv
  }

  private def fullRebuild(
      spark: SparkSession, mvTable: String, m: MvMeta,
      from: Long, to: Long): RefreshResult = {
    val state = ChangeData.aggState(
      SnapshotStore.readVersion(spark, m.baseTable, to), m.groupCols, m.measureCols)
    val mvV = SnapshotStore.commit(state, mvTable)
    writeMeta(spark, mvTable, m.copy(baseVersion = to))
    RefreshResult(mvV, "full", from, to, 0L)
  }

  /** Null-safe conjunction over the group columns (group keys may hold
    * nulls — `groupBy` keeps a null group, so the merge must too). */
  private def nsCond(l: DataFrame, r: DataFrame, cols: Seq[String]): Column =
    cols.map(c => l(c) <=> r(c)).reduce(_ && _)

  /** Advance the MV to the base table's current version by folding the
    * batch change feed `(reflected, current]` into the stored state.
    * Reads O(changed rows + bound-hit group slices); commits one new MV
    * version. Falls back to ONE full rebuild when the range contains a
    * true rewrite (`snapshot` images), the predecessor of a delete
    * commit was vacuumed, or the feed declines (live column renames). */
  def refresh(spark: SparkSession, mvTable: String): RefreshResult = {
    val m = meta(spark, mvTable).getOrElse(throw new IllegalArgumentException(
      s"$mvTable has no _mv sidecar — create() the MV first"))
    val v1 = SnapshotStore.currentVersion(spark, m.baseTable).getOrElse(
      throw new IllegalStateException(s"base table ${m.baseTable} has vanished"))
    val v0 = m.baseVersion
    if (v1 == v0)
      return RefreshResult(
        SnapshotStore.currentVersion(spark, mvTable).getOrElse(-1L), "noop", v0, v1, 0L)
    require(v1 > v0, s"MV reflects version $v0 but the base head is $v1 — the base " +
      "table was reset; drop and recreate the MV")

    Try {
      spark.read.format("graft-snapshot")
        .option("path", m.baseTable)
        .option("changeFeed", "true")
        .option("startingVersion", (v0 + 1).toString)
        .option("endingVersion", v1.toString)
        .load()
    } match {
      case Failure(_) => fullRebuild(spark, mvTable, m, v0, v1) // feed declined
      case Success(changes) =>
        changes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try incrementalFold(spark, mvTable, m, v0, v1, changes)
        finally changes.unpersist()
    }
  }

  private def incrementalFold(
      spark: SparkSession, mvTable: String, m: MvMeta,
      v0: Long, v1: Long, changes: DataFrame): RefreshResult = {
    // one tiny aggregate decides the shape of the whole refresh: which
    // change kinds are present, and which versions carry key-only
    // 'delete' rows needing a pre-image lookup
    val kinds = changes.groupBy(col("_change_type"), col("_commit_version"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    if (kinds.exists(_._1 == "snapshot"))
      return fullRebuild(spark, mvTable, m, v0, v1)
    if (kinds.isEmpty) { // metadata-only commits: nothing to fold
      writeMeta(spark, mvTable, m.copy(baseVersion = v1))
      return RefreshResult(
        SnapshotStore.currentVersion(spark, mvTable).getOrElse(-1L),
        "incremental", v0, v1, 0L)
    }

    val dataCols = changes.columns.dropRight(2) // strip the CDC meta columns
    val inserts = changes.filter(col("_change_type") === "insert")
      .select(dataCols.map(col): _*)
    val cowRemoves = changes.filter(col("_change_type") === "remove")
      .select(dataCols.map(col): _*)

    // merge-on-read 'delete' rows carry ONLY the row-level keys; the
    // pre-images live in the commit's PREDECESSOR version (a DV'd key
    // is gone from every later version, so each lookup is exact)
    val deleteVersions = kinds.filter(_._1 == "delete").map(_._2).distinct.sorted
    val deletePre: Seq[DataFrame] = deleteVersions.map { dv =>
      val keyCols = SnapshotStore.manifest(spark, m.baseTable, dv).keyCols
      require(keyCols.nonEmpty,
        s"version $dv emits 'delete' rows but records no key columns")
      val keys = changes
        .filter(col("_change_type") === "delete" && col("_commit_version") === dv)
        .select(keyCols.map(col): _*)
      Try(SnapshotStore.readVersion(spark, m.baseTable, dv - 1)).toOption.map(
        _.select(dataCols.map(col): _*).join(keys, keyCols.toSeq, "left_semi"))
        .orNull // predecessor vacuumed → signal full rebuild below
    }
    if (deletePre.contains(null))
      return fullRebuild(spark, mvTable, m, v0, v1)
    val removes = deletePre.foldLeft(cowRemoves)(_ unionByName _)

    val g = m.groupCols
    val ms = m.measureCols
    // BOTH states derive from the same persisted feed DataFrame, so the
    // join below is a self-join to Spark — suffix EVERY column (group
    // keys included) so no attribute is ambiguous
    def suffixed(df: DataFrame, sfx: String): DataFrame =
      df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + sfx))
    val insSt = suffixed(ChangeData.aggState(inserts, g, ms), "_ins")
    val remSt = suffixed(ChangeData.aggState(removes, g, ms), "_rem")

    val delta = insSt.join(remSt,
        g.map(c => col(c + "_ins") <=> col(c + "_rem")).reduce(_ && _), "full_outer")
      .select(
        g.map(c => coalesce(col(c + "_ins"), col(c + "_rem")).alias(c)) ++
          insSt.columns.filterNot(c => g.exists(c == _ + "_ins")).map(col) ++
          remSt.columns.filterNot(c => g.exists(c == _ + "_rem")).map(col): _*)

    val old = SnapshotStore.read(spark, mvTable)
    val joined = old.join(delta, nsCond(old, delta, g), "full_outer")
      .select(
        g.map(c => coalesce(old(c), delta(c)).alias(c)) ++
          old.columns.filterNot(g.contains).map(c => old(c).alias(c + "_old")) ++
          delta.columns.filterNot(g.contains).map(delta(_)): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def z(c: Column): Column = coalesce(c, lit(0L))
      // a removal can only move a bound it TIES; strictly-inside
      // removals keep min/max algebraic. A bound hit — or state the
      // algebra cannot explain (removals from a group the MV never
      // saw) — recomputes that group from its base slice.
      val anomaly = col("n_old").isNull && z(col("n_rem")) > 0
      val boundHit = ms.map { c =>
        (z(col(s"cnt_${c}_rem")) > 0) &&
          coalesce(col(s"min_${c}_rem") <= col(s"min_${c}_old") ||
            col(s"max_${c}_rem") >= col(s"max_${c}_old"), lit(true))
      }.reduce(_ || _)
      val recompute = coalesce(anomaly || boundHit, lit(false))

      val nNew = (z(col("n_old")) + z(col("n_ins")) - z(col("n_rem"))).alias("n")
      val stateCols: Seq[Column] = nNew +: ms.flatMap { c =>
        val cntNew = z(col(s"cnt_${c}_old")) + z(col(s"cnt_${c}_ins")) -
          z(col(s"cnt_${c}_rem"))
        Seq(
          when(cntNew === 0, lit(null)).otherwise(
            coalesce(col(s"sum_${c}_old"), lit(0)) +
              coalesce(col(s"sum_${c}_ins"), lit(0)) -
              coalesce(col(s"sum_${c}_rem"), lit(0))).alias(s"sum_$c"),
          cntNew.alias(s"cnt_$c"),
          when(cntNew === 0, lit(null)).otherwise(
            least(col(s"min_${c}_old"), col(s"min_${c}_ins"))).alias(s"min_$c"),
          when(cntNew === 0, lit(null)).otherwise(
            greatest(col(s"max_${c}_old"), col(s"max_${c}_ins"))).alias(s"max_$c"))
      }
      val algebraic = joined.filter(!recompute)
        .select(g.map(col) ++ stateCols: _*)
        .filter(col("n") > 0)

      val recompKeys = joined.filter(recompute).select(g.map(col): _*)
      val nRecomp = recompKeys.count()
      val result =
        if (nRecomp == 0) algebraic
        else {
          val base = SnapshotStore.readVersion(spark, m.baseTable, v1)
          val slice = base.join(recompKeys, nsCond(base, recompKeys, g), "left_semi")
          algebraic.unionByName(ChangeData.aggState(slice, g, ms))
        }
      // canonical column order: the MV schema is part of the contract
      val ordered = result.select(
        ((g :+ "n") ++ ms.flatMap(c =>
          Seq(s"sum_$c", s"cnt_$c", s"min_$c", s"max_$c"))).map(col): _*)
      val mvV = SnapshotStore.commit(ordered, mvTable)
      writeMeta(spark, mvTable, m.copy(baseVersion = v1))
      RefreshResult(mvV, "incremental", v0, v1, nRecomp)
    } finally joined.unpersist()
  }
}
