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
}
