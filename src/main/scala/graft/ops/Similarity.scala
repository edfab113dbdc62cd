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
  *  - [[lshTopK]] / [[cosineNearDupPairs]]: random-hyperplane LSH. Each
  *    vector gets a `planes`-bit signature sliced into bands; candidates
  *    co-bucket in ≥1 band (equi-join on band hash — crossJoin-free). At
  *    100 TB the bucket join shuffles only (band, hash, id, vec) tuples,
  *    and the per-bucket candidate verification is bounded by bucket
  *    occupancy, tuned by bits-per-band (default 8 bits ⇒ 1/256 random
  *    collision rate per band).
  *
  * Efficiency notes: vectors are L2-normalized once in a projection
  * before any join, so per-pair verification is a single dot product.
  * The hyperplane matrix is a plan-time literal — signature evaluation is
  * pure arithmetic, no per-row hashing.
  *
  * All arithmetic is double-precision via higher-order functions
  * (`zip_with`/`aggregate`), matching a DuckDB `list_cosine_similarity`
  * oracle on sequential summation.
  */
object Similarity {

  /** Dot product of two numeric array columns, computed in double.
    * Higher-order-function reference implementation; the pipelines below
    * use the codegen'd [[graft.functions.DotProduct]] (bit-identical:
    * same sequential fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (s, x) => s + x)

  private[ops] def fdot(a: Column, b: Column): Column = graft.functions.native.dotProduct(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array columns (cast to double first). */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (l2norm(ad) * l2norm(bd))
  }

  /** Exact top-k neighbors for each query id. Queries (small) are
    * broadcast against the corpus; ties broken by neighbor id for
    * determinism. Output: (q_id, rnk, n_id, sim).
    *
    * The cosine is computed as dot/(|a|·|b|) per pair — NOT from
    * pre-normalized vectors — so the floating-point result is
    * bit-identical to a DuckDB `list_cosine_similarity` oracle. */
  def bruteTopK(corpus: DataFrame, idCol: String, vecCol: String, queryIds: Seq[Long], k: Int): DataFrame = {
    val n = corpus.select(
      col(idCol).alias("n_id"),
      col(vecCol).cast("array<double>").alias("__nv"))
    val q = broadcast(
      n.filter(col("n_id").isin(queryIds: _*))
        .select(col("n_id").alias("q_id"), col("__nv").alias("__qv")))
    val scored = q
      .join(n, col("q_id") =!= col("n_id"))
      .withColumn("sim",
        fdot(col("__qv"), col("__nv")) / (sqrt(fdot(col("__qv"), col("__qv"))) * sqrt(fdot(col("__nv"), col("__nv")))))
    scored
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** Deterministic pseudo-random hyperplane matrix: a fixed
    * SplitMix64-style integer recurrence (no RNG state, identical across
    * sessions/executors) mapped to zero-mean doubles. Generated at plan
    * time: the planes ride in the plan as literals, so signature
    * evaluation does arithmetic only — no per-row hashing. */
  def planeMatrix(planes: Int, dims: Int): Seq[Seq[Double]] = {
    var state = 0x243F6A8885A308D3L // fixed seed (pi digits)
    def next(): Long = {
      state += -7046029254386353131L // SplitMix64 golden gamma
      var z = state
      z = (z ^ (z >>> 30)) * -4658895280553007687L
      z = (z ^ (z >>> 27)) * -7723592293110705685L
      z ^ (z >>> 31)
    }
    Seq.fill(planes)(Seq.fill(dims)(next().toDouble / Long.MaxValue.toDouble))
  }

  /** `planes`-bit random-hyperplane signature of a vector column, as an
    * array of 0/1 longs. `dims` must match the embedding width. The
    * per-plane projection runs through the native [[graft.functions.DotProduct]]
    * (compiled inner loop) instead of zip_with+aggregate lambdas — one
    * virtual call per plane rather than ~2·dims interpreted calls. */
  def rhpSignature(vec: Column, planes: Int, dims: Int): Column = {
    val m = typedlit(planeMatrix(planes, dims))
    val vd = vec.cast("array<double>")
    transform(
      sequence(lit(0), lit(planes - 1)),
      p => when(fdot(vd, element_at(m, p + 1)) >= 0, lit(1L)).otherwise(lit(0L))
    )
  }

  /** (id, normalized vector, band, band hash) rows: the bucketed LSH
    * representation both ANN entry points join on. Vectors are
    * L2-normalized here, once, so downstream similarity is `dot` only. */
  private def bandedSignatures(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int,
      bands: Int,
      dims: Int): DataFrame = {
    val rows = planes / bands
    corpus
      .select(col(idCol).alias("__id"), col(vecCol).cast("array<double>").alias("__v0"))
      .select(
        col("__id"),
        // native normalize: one compiled loop per row (the HOF form
        // re-evaluated the norm's dot product once per element), and NULL
        // for zero vectors — dropped explicitly below instead of leaking
        // NaN similarities past the threshold/rank filters
        graft.functions.native.l2normalize(col("__v0")).alias("__v"),
        rhpSignature(col("__v0"), planes, dims).alias("__sig"))
      .filter(col("__v").isNotNull)
      .select(col("__id"), col("__v"), col("__sig"), explode(sequence(lit(0), lit(bands - 1))).alias("band"))
      .withColumn("bh", xxhash64(concat_ws(",", slice(col("__sig"), col("band") * rows + 1, lit(rows))), col("band")))
      .drop("__sig")
  }

  /** ANN top-k via random-hyperplane LSH: vectors co-bucket when a band of
    * their bit signatures matches; exact cosine (dot of normalized
    * vectors) ranks candidates. Recall rises with `bands`. */
  def lshTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int,
      planes: Int = 64,
      bands: Int = 16,
      dims: Int = 64): DataFrame = {
    val banded = bandedSignatures(corpus, idCol, vecCol, planes, bands, dims)
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
      .withColumn("sim", fdot(col("__qv"), col("__nv")))
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH bucketing (no query
    * set: all-to-all within buckets only). Identical vectors always
    * co-bucket (identical signatures), so exact-copy recall is 1.0. */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 64,
      bands: Int = 8,
      dims: Int = 64): DataFrame = {
    val banded = bandedSignatures(corpus, idCol, vecCol, planes, bands, dims)
    val a = banded.select(col("band"), col("bh"), col("__id").alias("id1"), col("__v").alias("__v1"))
    val b = banded.select(col("band"), col("bh"), col("__id").alias("id2"), col("__v").alias("__v2"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .withColumn("sim", fdot(col("__v1"), col("__v2")))
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), round(col("sim"), 4).alias("sim"))
  }
}
