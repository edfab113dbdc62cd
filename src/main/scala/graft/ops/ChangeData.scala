package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data operators: changelog application (CDC upsert/delete
  * compaction) and snapshot diffing — the table-maintenance half of a
  * warehouse that the reference delegates to full rewrites
  * (`bronze_to_silver.py:95-101` re-appends whole days).
  *
  * Scale notes (100 TB):
  *   - [[applyChangelog]] is ONE partial+final aggregate keyed by the
  *     primary key — `max(struct(version, payload))` combines map-side,
  *     so the shuffle carries one row per (map task × key), not one row
  *     per change. A window `row_number` would sort every partition;
  *     the agg form never sorts.
  *   - [[snapshotDiff]] is one shuffle per side on the key (plain equi
  *     join); payload comparison rides an md5 digest computed in the
  *     map stage, so wide payloads never cross the network twice.
  */
object ChangeData {

  /** Compact a changelog to current state: keep the latest version per
    * key, drop keys whose latest operation is a delete.
    *
    * @param changes    changelog rows (any schema)
    * @param keyCols    primary-key columns
    * @param versionCol monotone version column (commit ts, LSN); ties
    *                   broken by the remaining payload's struct order,
    *                   so pass a unique version for full determinism
    * @param opCol      operation column; rows where it equals
    *                   `deleteOp` are tombstones
    */
  def applyChangelog(
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val payload = changes.columns.filterNot(keyCols.contains)
    // latest = lexicographic max over (version, payload...): a single
    // partial-aggregable max, no per-key sort anywhere in the plan
    val latest = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(col(versionCol) +: payload.filterNot(_ == versionCol).map(col): _*))
        .alias("__latest"))
    val restored = keyCols.map(col) ++
      (versionCol +: payload.filterNot(_ == versionCol)).map(c => col(s"__latest.$c").alias(c))
    latest
      .select(restored: _*)
      .filter(col(opCol) =!= deleteOp)
      .select(changes.columns.map(col): _*)
  }

  /** Diff two snapshots of the same table: one row per key present in
    * either side, with `diff_status` ∈ added | removed | changed |
    * unchanged. Non-key columns are compared via an md5 digest of the
    * payload struct's JSON form (computed narrow, pre-shuffle; JSON
    * keeps field boundaries and null-vs-empty distinct, where a bare
    * concat would alias ("ab","c") with ("a","bc")). */
  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    def digest(df: DataFrame): Column = {
      val payload = df.columns.filterNot(keyCols.contains).sorted
      md5(to_json(struct(payload.map(c => col(c).alias(c)): _*)))
    }
    val b = before.select(keyCols.map(col) :+ digest(before).alias("__h_before"): _*)
    val a = after.select(keyCols.map(col) :+ digest(after).alias("__h_after"): _*)
    b.join(a, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__h_before").isNull, lit("added"))
          .when(col("__h_after").isNull, lit("removed"))
          .when(col("__h_before") =!= col("__h_after"), lit("changed"))
          .otherwise(lit("unchanged"))
          .alias("diff_status"): _*)
  }
}
