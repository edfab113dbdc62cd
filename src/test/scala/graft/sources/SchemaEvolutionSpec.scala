package graft.sources

import graft.SparkSuite
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Parquet schema evolution: a corpus written over months grows columns
  * (a new quality signal, a new provenance field). The lake must read
  * old + new batches as ONE table — old rows null-filled for new
  * columns — without rewriting history. */
class SchemaEvolutionSpec extends SparkSuite {

  import spark.implicits._

  test("mergeSchema unifies old and new batches; old rows null-fill added columns") {
    val root = Files.createTempDirectory("graft-evolve").toString
    // batch 1: original schema
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$root/batch=1")
    // batch 2: adds a quality column
    Seq((3L, "gamma", 0.9), (4L, "delta", 0.2)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$root/batch=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.sorted === Array("batch", "doc_id", "quality", "text"))
    assert(merged.count() === 4)
    // old rows surface the new column as null — filterable, not a crash
    assert(merged.filter(col("quality").isNull).count() === 2)
    assert(merged.filter(col("quality") > 0.5).select("doc_id").head().getLong(0) === 3L)

    // default read (no mergeSchema) picks ONE footer's schema — the
    // documented reason corpus tables must be read with mergeSchema (or
    // a declared schema) once they evolve
    val anyOne = spark.read.parquet(root)
    assert(anyOne.columns.length <= merged.columns.length)
  }

  test("ALTER TABLE ADD COLUMNS evolves through an empty schema=mixed append") {
    val wh = Files.createTempDirectory("evolve-wh").toString
    val cat = "gevolvecat"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      graft.store.SnapshotStore.commit(
        Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"), s"$wh/ns/docs")
      spark.sql(s"ALTER TABLE $cat.ns.docs ADD COLUMNS (quality DOUBLE, lang STRING)")
      // old rows read NULL for the new columns; schema union resolved
      val evolved = spark.sql(s"SELECT * FROM $cat.ns.docs")
      assert(evolved.columns.sorted === Array("doc_id", "lang", "quality", "text"))
      assert(evolved.count() === 2)
      assert(evolved.filter(col("quality").isNull).count() === 2)
      // the widened schema accepts full-width INSERTs
      spark.sql(s"INSERT INTO $cat.ns.docs VALUES (3L, 'gamma', 0.9, 'en')")
      assert(spark.sql(s"SELECT lang FROM $cat.ns.docs WHERE doc_id = 3").head().getString(0) === "en")
      // the manifest is marked evolved, and history gained the empty append
      val head = graft.store.SnapshotStore.currentVersion(spark, s"$wh/ns/docs").get
      assert(graft.store.SnapshotStore.manifest(spark, s"$wh/ns/docs", head).mixedSchema)
      // DROP COLUMN is metadata-only (column name mapping): the column
      // disappears logically; old files keep their bytes but stop binding
      spark.sql(s"ALTER TABLE $cat.ns.docs DROP COLUMN lang")
      assert(spark.sql(s"SELECT * FROM $cat.ns.docs").columns.sorted ===
        Array("doc_id", "quality", "text"))
      // re-adding a retired name is refused — old bytes would resurface
      val recycled = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.ns.docs ADD COLUMNS (lang STRING)")
      }
      assert(recycled.getMessage.contains("retired"), recycled.getMessage)
      // narrowing / non-widening type changes / defaults keep the refusal
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.ns.docs ALTER COLUMN quality TYPE STRING")
      }
      assert(e.getMessage.contains("full rewrite"), e.getMessage)
      val dup = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.ns.docs ADD COLUMNS (text STRING)")
      }
      assert(dup.getMessage.toLowerCase.contains("exist"), dup.getMessage)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }
}
