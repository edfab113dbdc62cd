package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col}
import org.apache.spark.sql.types.StructType

/** COLUMN NAME MAPPING resolution (`ALTER TABLE ... RENAME/DROP
  * COLUMN`, round 14 — the Iceberg-style metadata-only column
  * evolution, name-mapped instead of field-id'd):
  *
  *  - A RENAME is one manifest commit: data files are untouched, the
  *    manifest records `rename=<logical>:<older names...>`. Files
  *    written BEFORE the rename carry an old physical name; files
  *    written after carry the logical name. Readers bind per FILE:
  *    the logical column resolves to whichever alias that file
  *    actually has (exactly one — renaming onto an existing name is
  *    refused, as is re-adding a retired name).
  *  - A DROP is one manifest commit: the physical column (and every
  *    alias it ever had) joins `dropcols=`, disappearing from the
  *    logical schema. Re-ADDing a retired name is refused — the old
  *    files still hold values that would silently resurface.
  *  - A FULL REWRITE (compaction, INSERT OVERWRITE) materializes the
  *    mapping: every output file carries the logical names, and the
  *    fresh manifest starts with an empty mapping.
  *
  * ONE home for the resolution rules — the engine read path
  * ([[SnapshotStore.readVersion]]) and the DSv2 scan binding must
  * never disagree on what a logical column means. */
object ColumnMapping {

  def active(m: SnapshotStore.Manifest): Boolean =
    m.renames.nonEmpty || m.droppedCols.nonEmpty

  /** physical alias → logical name. */
  def aliasOf(m: SnapshotStore.Manifest): Map[String, String] =
    m.renames.flatMap { case (l, as) => as.map(_ -> l) }.toMap

  /** The LOGICAL schema over a merged physical schema: drops retired
    * columns, folds every alias into its logical name (first
    * occurrence keeps the position), renames the survivor. */
  def logicalSchema(base: StructType, m: SnapshotStore.Manifest): StructType = {
    if (!active(m)) return base
    val alias = aliasOf(m)
    val dropped = m.droppedCols.toSet
    val out = scala.collection.mutable.LinkedHashMap.empty[String, org.apache.spark.sql.types.StructField]
    base.fields.foreach { f =>
      if (!dropped.contains(f.name)) {
        val logical = alias.getOrElse(f.name, f.name)
        if (!out.contains(logical)) out(logical) = f.copy(name = logical)
      }
    }
    StructType(out.values.toSeq)
  }

  /** Engine-level logical view of a physically-mixed frame (read with
    * mergeSchema, so a renamed column appears as DISJOINT physical
    * columns — the logical value is their coalesce: exactly one of
    * them is non-null-capable per row because no file carries two
    * aliases of the same column). Preserves logical field order. */
  def applyToFrame(df: DataFrame, m: SnapshotStore.Manifest): DataFrame = {
    if (!active(m)) return df
    val present = df.schema.fieldNames.toSet
    var out = df
    m.renames.foreach { case (l, as) =>
      val have = as.filter(present)
      if (have.nonEmpty) {
        val parts = (if (present.contains(l)) Seq(l) else Nil) ++ have
        out =
          if (parts.size == 1) out.withColumnRenamed(parts.head, l)
          else out.withColumn(l, coalesce(parts.map(col): _*))
      }
    }
    val logical = logicalSchema(df.schema, m)
    out.select(logical.fieldNames.map(col).toSeq: _*)
  }
}
