package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: for every corpus document, the
  * fraction of its word n-gram shingles that appear anywhere in a
  * benchmark (eval-set) corpus. The standard pre-training hygiene check —
  * documents above a threshold are quarantined before training.
  *
  * Scale shape: shingling is the native codegen'd
  * [[graft.functions.WordShingles]] (distinct shingles per doc by
  * construction). The benchmark's distinct shingle set is built once; the
  * corpus side is an exploded (doc, shingle) stream joined left-semi
  * against it — when the benchmark is eval-set-sized (it always is:
  * benchmarks are MBs, corpora are TBs) Spark broadcasts it and the scan
  * never shuffles. The per-doc hit count is a partial-aggregated groupBy
  * on doc id. Joining on the shingle STRING keeps the result exactly
  * reproducible in the DuckDB oracle (`ct_ngram_overlap`); an engine
  * that wanted smaller shuffles would hash shingles to 64-bit first.
  */
object Contamination {

  /** Per-document overlap: (doc id, n_shingles, n_contaminated,
    * overlap_ratio in [0,1]). Documents shorter than `n` words collapse
    * to one whole-text shingle (exact-containment check). */
  def ngramOverlap(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 3): DataFrame = {
    val shingled = corpus.select(
      col(idCol).alias("doc_id"),
      graft.functions.native.wordShingles(col(textCol), n).alias("__sh"))
    val benchShingles = benchmark
      .select(explode(graft.functions.native.wordShingles(col(benchTextCol), n)).alias("__shingle"))
      .distinct()

    val hits = shingled
      .select(col("doc_id"), explode(col("__sh")).alias("__shingle"))
      .join(broadcast(benchShingles), Seq("__shingle"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).alias("n_contaminated"))

    shingled
      .select(col("doc_id"), size(col("__sh")).alias("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn(
        "overlap_ratio",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 4))
  }

  /** Bloom-prefiltered contamination sweep: the GPT-3-style hygiene
    * pass, restructured for the 100 TB corpus side. The benchmark's
    * distinct shingles build ONE Bloom filter (a bounded driver-side
    * sketch — benchmarks are MBs); every corpus document probes the
    * broadcast filter with a codegen'd `exists` over its own shingle
    * array, and only documents with ≥ 1 maybe-hit ever reach the
    * explode + join. At pre-training scale almost every document is
    * clean, so the expensive exploded (doc, shingle) stream shrinks
    * from corpus-sized to suspected-sized BEFORE any shuffle — the scan
    * itself stays narrow.
    *
    * EXACT by construction: Bloom filters have no false negatives, and
    * the trailing inner join against the real benchmark shingle set
    * discards the false positives — the output is identical to
    * [[ngramOverlap]] restricted to `n_contaminated >= 1`, which is
    * what the DuckDB oracle (`ct_bloom_decontam`) replays.
    *
    * Returns (doc_id, n_shingles, n_contaminated, overlap_ratio) for
    * contaminated documents only. */
  def bloomDecontaminate(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 3,
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    val spark = corpus.sparkSession
    val benchShingles = benchmark
      .select(explode(graft.functions.native.wordShingles(col(benchTextCol), n)).alias("__shingle"))
      .distinct()
    val shingled = corpus.select(
      col(idCol).alias("doc_id"),
      graft.functions.native.wordShingles(col(textCol), n).alias("__sh"))

    val bloom = RuntimeFilter.buildBloom(benchShingles, "__shingle", expectedItems, numBits)
    // empty benchmark → nothing can be contaminated
    if (bloom == null) return shingled.select(
      col("doc_id"), size(col("__sh")).alias("n_shingles"),
      lit(0L).alias("n_contaminated"), lit(0.0).alias("overlap_ratio")).limit(0)

    val suspects = shingled.where(
      exists(col("__sh"), s => RuntimeFilter.mightContainBroadcast(spark, bloom, s)))

    suspects
      .select(col("doc_id"), size(col("__sh")).alias("n_shingles"), explode(col("__sh")).alias("__shingle"))
      .join(broadcast(benchShingles), Seq("__shingle"), "left_semi")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).alias("n_contaminated"))
      .withColumn("overlap_ratio",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 4))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"), col("overlap_ratio"))
  }

  /** Contaminated-document ids at/above `threshold` overlap. */
  def contaminatedIds(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      threshold: Double,
      n: Int = 3): DataFrame =
    ngramOverlap(corpus, idCol, textCol, benchmark, benchTextCol, n)
      .filter(col("overlap_ratio") >= threshold)
      .select(col("doc_id"))
}
