package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for corpus construction — the data
  * mixing primitive of a training-data pipeline (keep 100% of high
  * quality, 20% of low, 5% of junk, reproducibly).
  *
  * The keep decision hashes a stable per-row key: `md5(key)`'s first 4
  * hex digits, compared lexicographically against `floor(rate · 16^4)`
  * rendered as fixed-width hex. Fixed-width lowercase hex compares
  * lexicographically exactly like the underlying 16-bit integer, so the
  * rule is reproducible in ANY engine with md5 — the DuckDB oracle
  * replays it verbatim (`sm_stratified`). Resolution is 1/65536 ≈
  * 0.0015%, plenty for mixing rates.
  *
  * Scale shape: a narrow filter — no shuffle, no RNG state, no
  * driver coordination; re-running on any subset of a 100 TB corpus
  * keeps exactly the same rows. This is why hash-sampling (not
  * `df.sample`, whose seed interacts with partitioning) is the standard
  * at scale.
  */
object Sampling {

  /** True iff `key` falls inside the keep-fraction `rate` of hash space. */
  def hashKeep(key: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else substring(md5(key.cast("string")), 1, 4) < lit(f"${(rate * 65536).toLong}%04x")
  }

  /** Uniform deterministic sample: keep `rate` of rows by `key`. */
  def sample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(hashKeep(key, rate))

  /** The key's position in [0,1) hash space (16-bit resolution), the
    * per-row uniform variate every deterministic sampler compares
    * against — portable to any engine with md5. */
  def hashUnit(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("double") / 65536.0

  /** WEIGHTED deterministic sample: each row carries its own keep
    * probability (clamped to [0,1]) — quality-proportional mixing
    * ("keep docs in proportion to their quality score") as one narrow
    * filter. Same reproducibility contract as [[sample]]: the decision
    * depends only on (key, probability), never on partitioning or RNG
    * state, so any engine and any subset of the corpus agree row for
    * row. */
  def weightedSample(df: DataFrame, key: Column, prob: Column): DataFrame =
    df.filter(hashUnit(key) < least(greatest(prob, lit(0.0)), lit(1.0)))

  /** Deterministic UPSAMPLING: replicate each row `weight` times in
    * expectation — `floor(w)` whole copies plus one more iff the row's
    * hash variate falls under `frac(w)` (deterministic Bernoulli). The
    * training-mix half that [[weightedSample]] can't do: epoch-style
    * repetition of high-value sources (w > 1) in the same pass that
    * downsamples the rest (w < 1). Narrow (explode of a per-row
    * sequence), no shuffle; `copy_n` numbers the replicas so downstream
    * dedup/shuffling can still tell them apart. */
  def upsample(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val w = greatest(weight, lit(0.0))
    val copies = (floor(w).cast("long") +
      when(hashUnit(key) < (w - floor(w)), 1L).otherwise(0L)).alias("__n")
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("copy_n", explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  /** Deterministic MIXTURE construction: exactly `targets(stratum)` rows
    * per stratum (or all rows, if fewer), chosen as the stratum's
    * smallest hash variates — the "take n_i docs from source i" recipe a
    * training mix specifies. One shuffle keyed by stratum (the ranking
    * window); selection is stable under corpus growth ONLY in
    * distribution (a new doc can displace a ranked one — by design: the
    * mix quota, not the membership, is the contract). */
  def mixture(
      df: DataFrame,
      strata: Column,
      key: Column,
      targets: Map[String, Long]): DataFrame = {
    val quota = targets.foldLeft(when(lit(false), lit(0L))) { case (acc, (s, n)) =>
      acc.when(strata === s, n)
    }.otherwise(lit(0L))
    df.withColumn("__q", quota)
      .filter(col("__q") > 0)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(strata).orderBy(hashUnit(key), key.cast("string"))))
      .filter(col("__rk") <= col("__q"))
      .drop("__q", "__rk")
  }

  /** Stratified deterministic sample: per-stratum keep rates, unlisted
    * strata get `defaultRate`. One narrow filter, no shuffle. */
  def stratifiedSample(
      df: DataFrame,
      strata: Column,
      rates: Map[String, Double],
      key: Column,
      defaultRate: Double = 0.0): DataFrame = {
    val keep = rates.foldLeft(when(lit(false), lit(true))) { case (acc, (s, r)) =>
      acc.when(strata === s, hashKeep(key, r))
    }.otherwise(hashKeep(key, defaultRate))
    df.filter(keep)
  }
}
