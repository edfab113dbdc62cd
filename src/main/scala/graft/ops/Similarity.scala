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
  *    co-bucket in ≥1 band. Candidate generation is
  *    groupBy(bucket)+collect_list of ids — NOT a bucket self-join (a
  *    self-join re-evaluates the whole signature subtree once per side,
  *    the lesson already recorded at [[Dedup.lshCandidatePairs]]) — and
  *    buckets above `maxBucket` are dropped by a windowed count BEFORE
  *    any id list materializes, so a degenerate corpus (thousands of
  *    identical embeddings, dedup's expected input) is bounded by
  *    construction instead of exploding O(n²) in one bucket. The count
  *    window and the groupBy hash-partition on the same (band, hash) key:
  *    one exchange total, the cap is free. Only (id, band, hash) tuples
  *    ride that shuffle — vectors never do.
  *
  * Verification joins the raw vectors back by id for surviving candidate
  * pairs only (LSH-bounded, never n²) and computes the exact per-pair
  * cosine as dot/(|a|·|b|) — NOT from pre-normalized vectors — so the
  * floating-point result is bit-identical to a DuckDB
  * `list_cosine_similarity` oracle (sequential summation), the same
  * contract [[bruteTopK]] keeps.
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
    rankTopK(scored, k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** Per-query top-k selection + rank for (q_id, n_id, sim) scored rows:
    * the native partial-merging grouped top-k ([[graft.ops.TopK
    * .nativePerGroup]]) reduces every map partition to ≤ k rows per
    * query BEFORE the exchange, then `row_number` ranks the ≤ k
    * survivors riding the same clustered distribution (zero extra
    * exchanges, sorts of k rows). The former `row_number`-window-only
    * form shuffled EVERY scored candidate row of a query into one task
    * and sorted the lot — per-query candidate volume is corpus-bound
    * (brute force: the whole corpus), the textbook single-reducer wall
    * at 100 TB. Identical output: the order (sim desc, n_id asc) is
    * total, so "k first under the order, then rank them" ≡ "rank all,
    * keep rnk ≤ k". */
  private[ops] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    TopK.nativePerGroup(
      scored.select(col("q_id"), col("n_id"), col("sim")),
      Seq("q_id"), Seq(("sim", true), ("n_id", false)), k)
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))))

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

  /** (id, band, band hash) LSH bucket keys — the ONLY columns that ride
    * the bucket shuffle (no vector payload: at 100 TB shuffling a
    * 64-double embedding once per band multiplies shuffle bytes ~8×; ids
    * are joined back to vectors only for surviving candidates). Zero
    * vectors have no direction and are dropped here, so no NaN similarity
    * can leak past threshold/rank filters downstream. The signature is
    * projected BEFORE the band explode, so it is an attribute through the
    * Generate and is computed once per row, never once per band
    * (CollapseProject inlines multiply-referenced expressions into
    * generator lambdas — measured lesson, see [[Dedup.lshCandidatePairs]]). */
  private def bandedKeys(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int,
      bands: Int,
      dims: Int): DataFrame = {
    val rows = planes / bands
    corpus
      .select(col(idCol).alias("__id"), col(vecCol).cast("array<double>").alias("__v0"))
      .filter(fdot(col("__v0"), col("__v0")) > 0)
      .select(col("__id"), rhpSignature(col("__v0"), planes, dims).alias("__sig"))
      .select(col("__id"), col("__sig"), explode(sequence(lit(0), lit(bands - 1))).alias("band"))
      .select(
        col("__id"),
        col("band"),
        xxhash64(concat_ws(",", slice(col("__sig"), col("band") * rows + 1, lit(rows))), col("band")).alias("bh"))
  }

  /** Raw double vectors keyed for verification join-back. */
  private def vectors(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).alias("__vid"), col(vecCol).cast("array<double>").alias("__vec"))

  /** Exact per-pair cosine for candidate (id1, id2) pairs: raw vectors
    * joined back by id, similarity = dot/(|a|·|b|) — the DuckDB
    * `list_cosine_similarity`-parity form. */
  private def pairCosine(pairs: DataFrame, corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = vectors(corpus, idCol, vecCol)
    pairs
      .join(v.select(col("__vid").alias("id1"), col("__vec").alias("__v1")), Seq("id1"))
      .join(v.select(col("__vid").alias("id2"), col("__vec").alias("__v2")), Seq("id2"))
      .withColumn("sim",
        fdot(col("__v1"), col("__v2")) /
          (sqrt(fdot(col("__v1"), col("__v1"))) * sqrt(fdot(col("__v2"), col("__v2")))))
  }

  /** ANN top-k via random-hyperplane LSH: vectors co-bucket when a band of
    * their bit signatures matches; exact cosine ranks candidates. Recall
    * rises with `bands`. Buckets above `maxBucket` are dropped before the
    * per-bucket id lists materialize (see object doc) — a bucket that hot
    * is a mass-duplicate cluster, the near-dup path's job, not top-k's. */
  def lshTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int,
      planes: Int = 64,
      bands: Int = 16,
      dims: Int = 64,
      maxBucket: Int = 1000): DataFrame = {
    val keys = bandedKeys(corpus, idCol, vecCol, planes, bands, dims)
    val cands = keys
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("__bn") <= maxBucket)
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(col("__id")).alias("__ids"))
      .withColumn("__qs", array_intersect(col("__ids"), typedlit(queryIds)))
      .filter(size(col("__qs")) > 0)
      .select(explode(col("__qs")).alias("q_id"), col("__ids"))
      .select(col("q_id"), explode(col("__ids")).alias("n_id"))
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")

    rankTopK(
      pairCosine(
        cands.select(col("q_id").alias("id1"), col("n_id").alias("id2")),
        corpus, idCol, vecCol)
        .select(col("id1").alias("q_id"), col("id2").alias("n_id"), col("sim")),
      k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** Multi-probe ANN top-k: like [[lshTopK]] but each query probes, per
    * band, its own bucket PLUS every bucket at Hamming distance 1 on the
    * band slice (flip one of the `planes/bands` bits) — the classic
    * multi-probe LSH recall boost (Lv et al., VLDB'07) without adding
    * hash tables. Candidate rule: ∃ band with hamming(q_slice, n_slice)
    * ≤ 1; verification is exact cosine, so extra probes only ADD
    * recall, never change a surfaced pair's score.
    *
    * Scale shape: the corpus side computes (id, band, bh) keys exactly
    * once ([[bandedKeys]] — no vector payload); the query side expands
    * to |Q|·bands·(rows+1) probe keys and is BROADCAST, so candidate
    * generation is a map-side hash join — the big side never shuffles
    * at all (better than the collect_list path when |Q| is bounded).
    * The `maxBucket` occupancy cap is applied to corpus keys by the
    * same one-exchange windowed count as [[lshTopK]]. */
  def multiProbeLshTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int,
      planes: Int = 64,
      bands: Int = 16,
      dims: Int = 64,
      maxBucket: Int = 1000): DataFrame = {
    val rows = planes / bands
    val capped = bandedKeys(corpus, idCol, vecCol, planes, bands, dims)
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("__bn") <= maxBucket)
      .select(col("__id").alias("n_id"), col("band"), col("bh"))
    val probes = corpus
      .select(col(idCol).alias("q_id"), col(vecCol).cast("array<double>").alias("__v0"))
      .filter(col("q_id").isin(queryIds: _*) && fdot(col("__v0"), col("__v0")) > 0)
      .select(col("q_id"), rhpSignature(col("__v0"), planes, dims).alias("__sig"))
      .select(col("q_id"), col("__sig"),
        explode(sequence(lit(0), lit(bands - 1))).alias("band"))
      .select(col("q_id"), col("band"),
        slice(col("__sig"), col("band") * rows + 1, lit(rows)).alias("__bs"))
      // probe 0 = the slice itself; probe f≥1 = bit f flipped
      .select(col("q_id"), col("band"), col("__bs"),
        explode(sequence(lit(0), lit(rows))).alias("__f"))
      .select(col("q_id"), col("band"),
        when(col("__f") === 0, col("__bs"))
          .otherwise(transform(col("__bs"),
            (x, i) => when(i === col("__f") - 1, lit(1L) - x).otherwise(x)))
          .alias("__ps"))
      .select(col("q_id"), col("band"),
        xxhash64(concat_ws(",", col("__ps")), col("band")).alias("bh"))
    val cands = broadcast(probes)
      .join(capped, Seq("band", "bh"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"))
      .distinct()
    rankTopK(
      pairCosine(
        cands.select(col("q_id").alias("id1"), col("n_id").alias("id2")),
        corpus, idCol, vecCol)
        .select(col("id1").alias("q_id"), col("id2").alias("n_id"), col("sim")),
      k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** FILTERED vector search, exact form — top-k among ONLY the corpus
    * rows satisfying `eligible` (the metadata-filter + ANN combination
    * every retrieval stack needs). PRE-filter semantics: the predicate
    * restricts the candidate set BEFORE ranking, so exactly k eligible
    * neighbors come back whenever k exist. The tempting alternative —
    * post-filtering an unfiltered top-k — returns fewer than k (or
    * zero) eligible rows when the filter is selective: the well-known
    * filtered-ANN recall hole this operator exists to avoid. Queries
    * are looked up in the UNFILTERED corpus (a query need not satisfy
    * its own filter). Same broadcast-queries + per-group-heap shape as
    * [[bruteTopK]]; the filter is a narrow scan predicate, pushable to
    * parquet when `eligible` references scan columns. */
  def filteredTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      eligible: Column,
      queryIds: Seq[Long],
      k: Int): DataFrame = {
    val base = corpus.select(
      col(idCol).alias("n_id"),
      col(vecCol).cast("array<double>").alias("__nv"),
      eligible.alias("__ok"))
    val q = broadcast(
      base.filter(col("n_id").isin(queryIds: _*))
        .select(col("n_id").alias("q_id"), col("__nv").alias("__qv")))
    val n = base.filter(col("__ok")).select(col("n_id"), col("__nv"))
    rankTopK(
      q.join(n, col("q_id") =!= col("n_id"))
        .withColumn("sim",
          fdot(col("__qv"), col("__nv")) /
            (sqrt(fdot(col("__qv"), col("__qv"))) * sqrt(fdot(col("__nv"), col("__nv"))))),
      k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** Scale path for filtered search: [[multiProbeLshTopK]]'s broadcast
    * probe join with the predicate PUSHED BELOW bucketing — only
    * eligible rows compute band keys at all, so bucket occupancy,
    * candidate volume, and the verify join all shrink by the filter's
    * selectivity. (Post-filtering an ANN result would instead have to
    * re-probe with a widening k until enough eligible rows survive.)
    * Probe side still draws queries from the unfiltered corpus. Same
    * recall character as multi-probe LSH, now over the eligible
    * sub-corpus; surviving pairs carry exact cosines, so extra probes
    * only add recall. */
  def filteredMultiProbeTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      eligible: Column,
      queryIds: Seq[Long],
      k: Int,
      planes: Int = 64,
      bands: Int = 16,
      dims: Int = 64,
      maxBucket: Int = 1000): DataFrame = {
    val rows = planes / bands
    val capped = bandedKeys(corpus.filter(eligible), idCol, vecCol, planes, bands, dims)
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("__bn") <= maxBucket)
      .select(col("__id").alias("n_id"), col("band"), col("bh"))
    val probes = corpus
      .select(col(idCol).alias("q_id"), col(vecCol).cast("array<double>").alias("__v0"))
      .filter(col("q_id").isin(queryIds: _*) && fdot(col("__v0"), col("__v0")) > 0)
      .select(col("q_id"), rhpSignature(col("__v0"), planes, dims).alias("__sig"))
      .select(col("q_id"), col("__sig"),
        explode(sequence(lit(0), lit(bands - 1))).alias("band"))
      .select(col("q_id"), col("band"),
        slice(col("__sig"), col("band") * rows + 1, lit(rows)).alias("__bs"))
      .select(col("q_id"), col("band"), col("__bs"),
        explode(sequence(lit(0), lit(rows))).alias("__f"))
      .select(col("q_id"), col("band"),
        when(col("__f") === 0, col("__bs"))
          .otherwise(transform(col("__bs"),
            (x, i) => when(i === col("__f") - 1, lit(1L) - x).otherwise(x)))
          .alias("__ps"))
      .select(col("q_id"), col("band"),
        xxhash64(concat_ws(",", col("__ps")), col("band")).alias("bh"))
    val cands = broadcast(probes)
      .join(capped, Seq("band", "bh"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"))
      .distinct()
    rankTopK(
      pairCosine(
        cands.select(col("q_id").alias("id1"), col("n_id").alias("id2")),
        corpus, idCol, vecCol)
        .select(col("id1").alias("q_id"), col("id2").alias("n_id"), col("sim")),
      k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** Occupancy-scaled bits-per-band: enough hyperplanes per band that the
    * expected bucket occupancy stays ~`targetOccupancy` regardless of
    * corpus size (the LSH geometry contract: buckets/band = 2^bits must
    * grow with n or in-bucket candidate pairs grow quadratically — at
    * fixed 8-bit geometry a 210k-vector corpus means ~820 ids/bucket and
    * hundreds of millions of pairs, which is how the sf10 ladder point
    * originally failed). Clamped to [8, 24] bits: at least the legacy
    * 256-bucket floor, at most 16M buckets (beyond which signature cost
    * dominates and occupancy is already ≪ 1). */
  def occupancyScaledBits(n: Long, targetOccupancy: Int = 8): Int = {
    val need = math.ceil(math.log(math.max(2.0, n.max(1L).toDouble / targetOccupancy)) /
      math.log(2.0)).toInt
    math.min(24, math.max(8, need))
  }

  /** Embedding-cosine near-duplicate pairs via LSH bucketing (no query
    * set: all-to-all within buckets only). Identical vectors always
    * co-bucket (identical signatures), so exact-copy recall is 1.0 at ANY
    * geometry. Candidate pairs come from one groupBy(bucket)+collect_list
    * pass with the `maxBucket` occupancy cap applied by a windowed count
    * sharing that same exchange — the [[Dedup.lshCandidatePairs]] shape
    * exactly. Audit what a cap would drop with [[lshBucketStats]].
    *
    * `planes = 0` (the default) means AUTO geometry: one count() over the
    * corpus picks [[occupancyScaledBits]] bits per band, keeping `bands`
    * independent OR-amplification rounds while bucket count tracks corpus
    * size — constant occupancy from sf0.01 to the sf10 ladder and beyond.
    * Recall for non-identical pairs at sim ≥ threshold is governed by
    * bands × bits as usual; pass explicit `planes` to pin geometry (the
    * ann_lsh entries do, because their oracles replay the signature). */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 0,
      bands: Int = 8,
      dims: Int = 64,
      maxBucket: Int = 1000): DataFrame = {
    val nPlanes =
      if (planes > 0) planes
      else bands * occupancyScaledBits(corpus.count())
    val keys = bandedKeys(corpus, idCol, vecCol, nPlanes, bands, dims)
    val cands = keys
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("__bn") > 1 && col("__bn") <= maxBucket)
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(col("__id")).alias("__ids"))
      .select(explode(Dedup.pairCombinations(col("__ids"))).alias("__p"))
      .select(col("__p.id1"), col("__p.id2"))
      .distinct()
    pairCosine(cands, corpus, idCol, vecCol)
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), round(col("sim"), 4).alias("sim"))
  }

  /** Bucket-occupancy audit for the vector LSH paths: per-bucket sizes,
    * descending — the loud counterpart to the silent `maxBucket` drop,
    * mirroring [[Dedup.lshBucketStats]]. */
  def lshBucketStats(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int = 64,
      bands: Int = 8,
      dims: Int = 64): DataFrame =
    bandedKeys(corpus, idCol, vecCol, planes, bands, dims)
      .groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).alias("bucket_size"))
      .orderBy(col("bucket_size").desc)
}
