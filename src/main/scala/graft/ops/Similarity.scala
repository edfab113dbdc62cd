package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k of a bounded query set against the
  *    full corpus. The query side is broadcast, so the corpus is scanned
  *    once with no shuffle of the big side; per-query ranking is a
  *    windowed top-k on (query, similarity). Linear in corpus size —
  *    the right baseline, and the oracle for recall measurements.
  *  - [[lshTopK]]: random-hyperplane LSH. Each vector gets a `planes`-bit
  *    signature sliced into bands; candidates co-bucket in ≥1 band
  *    (equi-join on band hash — crossJoin-free). At 100 TB the bucket join
  *    shuffles only (band, hash, id, vec) pairs, and the per-bucket
  *    candidate verification is bounded by bucket occupancy.
  *
  * All arithmetic is double-precision via higher-order functions
  * (`zip_with`/`aggregate`), matching a DuckDB `list_cosine_similarity`
  * oracle bit-for-bit on sequential summation.
  */
object Similarity {

  /** Dot product of two numeric array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (s, x) => s + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array columns (cast to double first). */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (l2norm(ad) * l2norm(bd))
  }

  /** Exact top-k neighbors for each query id. Queries (small) are
    * broadcast against the corpus; ties broken by neighbor id for
    * determinism. Output: (q_id, n_id, rnk, sim). */
  def bruteTopK(corpus: DataFrame, idCol: String, vecCol: String, queryIds: Seq[Long], k: Int): DataFrame = {
    val n = corpus.select(
      col(idCol).alias("n_id"),
      col(vecCol).cast("array<double>").alias("__nv"))
    val q = broadcast(
      n.filter(col("n_id").isin(queryIds: _*))
        .select(col("n_id").alias("q_id"), col("__nv").alias("__qv")))
    val scored = q
      .join(n, col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("__qv"), col("__nv")) / (l2norm(col("__qv")) * l2norm(col("__nv"))))
    scored
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d weight =
    * a zero-mean value derived from xxhash64 — no RNG state, identical
    * across sessions/executors. */
  private def planeWeight(p: Column, d: Column): Column =
    (pmod(xxhash64(p, d), lit(2000001L)) - 1000000L).cast("double")

  /** `planes`-bit random-hyperplane signature of a vector column, as an
    * array of 0/1 longs. */
  def rhpSignature(vec: Column, planes: Int): Column =
    transform(
      sequence(lit(0), lit(planes - 1)),
      p =>
        when(
          aggregate(
            zip_with(vec.cast("array<double>"),
              transform(sequence(lit(0), size(vec) - 1), d => planeWeight(p, d)),
              (x, w) => x * w),
            lit(0.0d),
            (s, x) => s + x) >= 0,
          lit(1L)
        ).otherwise(lit(0L))
    )

  /** ANN top-k via random-hyperplane LSH: vectors co-bucket when a band of
    * their bit signatures matches; exact cosine ranks candidates.
    * Recall rises with `bands` (more buckets per vector). */
  def lshTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int,
      planes: Int = 32,
      bands: Int = 8): DataFrame = {
    val rows = planes / bands
    val sigged = corpus.select(
      col(idCol).alias("__id"),
      col(vecCol).cast("array<double>").alias("__v"),
      rhpSignature(col(vecCol), planes).alias("__sig"))

    val banded = sigged.select(
      col("__id"),
      col("__v"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(b.alias("band"), xxhash64(concat_ws(",", slice(col("__sig"), b * rows + 1, lit(rows))), b).alias("bh"))
        )).alias("__b"))
      .select(col("__id"), col("__v"), col("__b.band"), col("__b.bh"))

    val qSide = banded
      .filter(col("__id").isin(queryIds: _*))
      .select(col("__id").alias("q_id"), col("__v").alias("__qv"), col("band"), col("bh"))
    val cands = qSide
      .join(banded.select(col("__id").alias("n_id"), col("__v").alias("__nv"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id", "__qv", "__nv")
      .dropDuplicates("q_id", "n_id")

    cands
      .withColumn("sim", dot(col("__qv"), col("__nv")) / (l2norm(col("__qv")) * l2norm(col("__nv"))))
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH bucketing (no query
    * set: all-to-all within buckets only). */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 32,
      bands: Int = 8): DataFrame = {
    val rows = planes / bands
    val banded = corpus
      .select(
        col(idCol).alias("__id"),
        col(vecCol).cast("array<double>").alias("__v"),
        rhpSignature(col(vecCol), planes).alias("__sig"))
      .select(col("__id"), col("__v"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.alias("band"), xxhash64(concat_ws(",", slice(col("__sig"), b * rows + 1, lit(rows))), b).alias("bh")))).alias("__b"))
      .select(col("__id"), col("__v"), col("__b.band"), col("__b.bh"))

    val a = banded.select(col("band"), col("bh"), col("__id").alias("id1"), col("__v").alias("__v1"))
    val b = banded.select(col("band"), col("bh"), col("__id").alias("id2"), col("__v").alias("__v2"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .withColumn("sim", dot(col("__v1"), col("__v2")) / (l2norm(col("__v1")) * l2norm(col("__v2"))))
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), round(col("sim"), 4).alias("sim"))
  }
}
