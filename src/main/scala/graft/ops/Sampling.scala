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

  /** Deterministic train/validation/test assignment: label each row by
    * where its hash variate falls among the cumulative `fractions`
    * boundaries (e.g. `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`).
    * The boundaries are rendered as fixed-width hex (same 16-bit
    * contract as [[hashKeep]]), so the assignment is exact, total, and
    * replayable in any engine with md5 — the property that makes a
    * split TRUSTWORTHY at 100 TB: no RNG, no partitioning dependence,
    * adding or removing other rows never flips an existing row's split,
    * and train/test leakage is structurally impossible (one key ⇒ one
    * label). A narrow projection — no shuffle. */
  def split(df: DataFrame, key: Column, fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got $fractions")
    val bucket = substring(md5(key.cast("string")), 1, 4)
    val cuts = fractions.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val ladder = fractions.init.zip(cuts).foldLeft(when(lit(false), lit(""))) {
      case (acc, ((label, _), cum)) =>
        // a cumulative cut ≥ 1.0 covers ALL remaining rows — rendering
        // it as hex would produce 5-char "10000", which breaks the
        // 4-char lexicographic compare (the hashKeep ≥1.0 guard, here)
        if (cum >= 1.0) acc.when(lit(true), label)
        else acc.when(bucket < lit(f"${(cum * 65536).toLong}%04x"), label)
    }.otherwise(fractions.last._1)
    df.withColumn("split", ladder)
  }

  /** Deterministic corpus shuffle + shard: the "global shuffle" every
    * training run needs, without a global sort. Each row's shard is its
    * hash bucket (`h32 mod nShards`) and its position within the shard
    * is its rank in (hash, key) order — together a reproducible
    * pseudo-random permutation of the corpus, decorrelated from the
    * ingest order. One exchange (on shard) + per-shard sort; no stage
    * ever sees a global ordering, so the plan scales with
    * corpus/nShards per task — pick nShards so a shard fits a task
    * (at 100 TB that's thousands of shards, exactly how training-data
    * shards are sized anyway). Replayable in any engine with md5:
    * adding a doc never reorders earlier shards' relative order beyond
    * its own insertion point (position shifts are confined to the one
    * shard the new doc hashes into). */
  def shuffleShards(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("__h"), key)))
      .drop("__h")
  }

  /** Weighted sampling WITHOUT replacement, exactly `k` per group
    * (Efraimidis–Spirakis priority sampling, log form): each row draws
    * its deterministic uniform variate u from hash space and competes on
    * priority `ln(u)/w` — the k largest priorities per group are a
    * weight-proportional sample without replacement. [[weightedSample]]
    * thins by EXPECTED rate; this guarantees the exact quota (the "give
    * me exactly 10k docs per source, weighted by quality" op).
    *
    * u is `(h16 + 0.5)/65536` — strictly inside (0, 1), so `ln` is
    * finite and the rule replays in any engine with md5 (the DuckDB
    * oracle re-derives the same priorities bit-for-bit: identical IEEE
    * inputs, identical `ln`/divide). Rows with non-positive weight are
    * excluded (they'd get priority −∞ anyway).
    *
    * Scale shape: priorities are a narrow projection; the per-group
    * top-k runs on the NATIVE grouped top-k operator
    * ([[graft.ops.TopK.nativePerGroup]]) — per-partition bounded heaps,
    * ONE exchange carrying ≤ k·partitions rows per group, no sort, no
    * window. */
  def prioritySample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      groupCol: String,
      k: Int): DataFrame = {
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 4), 16, 10)
      .cast("double") + 0.5) / 65536.0
    val scored = df
      .filter(col(weightCol) > 0)
      .withColumn("__priority", log(u) / col(weightCol))
    TopK.nativePerGroup(scored, Seq(groupCol),
      Seq(("__priority", true), (keyCol, false)), k)
      .drop("__priority")
  }

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
    * smallest (hash variate, key) pairs — the "take n_i docs from
    * source i" recipe a training mix specifies. Selection is stable
    * under corpus growth only in distribution (a new doc can displace a
    * ranked one — by design: the quota, not the membership, is the
    * contract).
    *
    * Scale shape — distributed exact selection, NOT a per-stratum
    * `row_number` (a window partitioned by a handful of sources puts a
    * whole 100 TB stratum on one task): (1) one partial+final aggregate
    * histograms hash-variate buckets per stratum (strata × 4096 rows —
    * collected, bounded model); (2) the driver finds each stratum's
    * boundary bucket; (3) rows below the boundary keep by a narrow
    * filter, and ONLY the boundary bucket's rows (≈ stratum/4096) pay a
    * ranking window. Result is identical to the global rank — the
    * bucket is a prefix of the (h, key) sort order. */
  def mixture(
      df: DataFrame,
      strata: Column,
      key: Column,
      targets: Map[String, Long],
      buckets: Int = 4096): DataFrame = {
    val quota = targets.foldLeft(when(lit(false), lit(0L))) { case (acc, (s, n)) =>
      acc.when(strata === s, n)
    }.otherwise(lit(0L))
    val withH = df
      .withColumn("__q", quota)
      .filter(col("__q") > 0)
      .withColumn("__h", hashUnit(key))
      .withColumn("__b", floor(col("__h") * buckets).cast("int"))
    val hist = withH.groupBy(strata.alias("__s"), col("__b"))
      .agg(count(lit(1)).alias("__c"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // per stratum: boundary bucket b* where the cumulative count reaches
    // the quota, and the residual rank to take inside it
    val bounds: Map[String, (Int, Long)] = targets.map { case (s, n) =>
      var cum = 0L; var b = 0; var boundary = buckets; var residual = 0L
      while (b < buckets && boundary == buckets) {
        val c = hist.getOrElse((s, b), 0L)
        if (cum + c >= n) { boundary = b; residual = n - cum }
        cum += c; b += 1
      }
      // quota not reached: keep the whole stratum
      s -> (if (boundary == buckets) (buckets, Long.MaxValue) else (boundary, residual))
    }
    val boundaryB = targets.keys.foldLeft(when(lit(false), lit(-1))) { (acc, s) =>
      acc.when(strata === s, bounds(s)._1)
    }.otherwise(lit(-1))
    val residualN = targets.keys.foldLeft(when(lit(false), lit(0L))) { (acc, s) =>
      acc.when(strata === s, bounds(s)._2)
    }.otherwise(lit(0L))
    val below = withH.filter(col("__b") < boundaryB)
    val atBoundary = withH.filter(col("__b") === boundaryB)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(strata, col("__b")).orderBy(col("__h"), key.cast("string"))))
      .filter(col("__rk") <= residualN)
      .drop("__rk")
    below.unionByName(atBoundary).drop("__q", "__h", "__b")
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

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    * score every RAW document by how much more likely its hashed-n-gram
    * bag is under a TARGET corpus' unigram model than under the raw
    * corpus' own, then keep the top `keepFrac` by that importance
    * weight. The standard trick for skewing a web-scale crawl toward a
    * high-quality target domain (e.g. Wikipedia-like text) without a
    * learned classifier.
    *
    * Features are words hashed into `buckets` bins via the first 8 hex
    * digits of `md5` (portable: any engine with md5 replays the exact
    * binning). Both models use add-1 smoothing over the `buckets` bins;
    * a document's log-weight is
    * `Σ_tokens log p̂_target(bin) − log p̂_raw(bin)`.
    * Selection compares the 4-dp integer image of the weight
    * (`round(logw·10⁴)` as a long) against the corpus `1 − keepFrac`
    * quantile of the same image — exact integer percentile
    * interpolation, the same cross-engine-deterministic cut as
    * [[TextAnalysis.lmQualityBuckets]].
    *
    * Returns raw documents only:
    * `(id, n_tokens, logw, selected)`.
    *
    * Scale shape (100 TB): per-doc bin multiplicities first (one
    * exchange of `(doc, bin, count)` rows — bins are ints, text never
    * shuffles), both models reduce to `buckets`-sized aggregates
    * (partial-aggregable counts), the per-bin log-ratio table is
    * broadcast back (≤ `buckets` rows), and the cut point is ONE exact
    * percentile over doc-count rows broadcast as a scalar. No global
    * sort, no window, no driver-side loop.
    */
  def dsirSelect(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 256,
      keepFrac: Double = 0.25): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(keepFrac > 0.0 && keepFrac < 1.0, s"keepFrac must be in (0,1), got $keepFrac")
    val words = docs.select(
      col(idCol),
      isTarget.alias("__tgt"),
      explode(Dedup.wordTokens(col(textCol))).alias("__word"))
    // per-doc WORD multiplicities first (the bigram-LM discipline), so
    // the md5 binning runs once per DISTINCT (doc, word) — never once
    // per token occurrence. The bin is computed inline on those rows
    // (round-17): the former vocabulary broadcast-lookup evaluated the
    // whole tokenize+aggregate chain TWICE (once under the vocab
    // distinct, once as the join's stream side), cost a full
    // distinct-words shuffle plus a broadcast build — and a corpus-scale
    // vocabulary does not broadcast at 100 TB at all. One md5 of a short
    // word per row is cheaper than the join probe it replaces, and the
    // binning function is unchanged, so buckets are identical.
    val perDocWord = words.groupBy(col(idCol), col("__tgt"), col("__word"))
      .agg(count(lit(1)).alias("__m"))
    // persisted: consumed by the bucket model AND the score join —
    // without the cache the tokenize + two-shuffle chain runs twice
    // (and a third time through the percentile cut below). Tracked so
    // the harness releases it after the consuming action.
    val perDoc = QueryCaches.track(perDocWord
      .select(
        col(idCol), col("__tgt"),
        pmod(conv(substring(md5(col("__word")), 1, 8), 16, 10).cast("long"), lit(buckets))
          .alias("__b"),
        col("__m"))
      .groupBy(col(idCol), col("__tgt"), col("__b"))
      .agg(sum(col("__m")).alias("__m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val model = perDoc
      .groupBy(col("__b"))
      .agg(
        sum(when(col("__tgt"), col("__m")).otherwise(0L)).alias("__ct"),
        sum(when(!col("__tgt"), col("__m")).otherwise(0L)).alias("__cr"))
      .agg(
        collect_list(struct(col("__b"), col("__ct"), col("__cr"))).alias("__rows"),
        sum(col("__ct")).alias("__nt"),
        sum(col("__cr")).alias("__nr"))
      .select(
        explode(col("__rows")).alias("__r"),
        col("__nt"), col("__nr"))
      .select(
        col("__r.__b").alias("__b"),
        (log((col("__r.__ct") + 1).cast("double") / (col("__nt") + buckets))
          - log((col("__r.__cr") + 1).cast("double") / (col("__nr") + buckets)))
          .alias("__lam"))
    // persisted: the percentile cut and the final selection both read it;
    // tracked so the harness releases it after the consuming action
    val scored = QueryCaches.track(perDoc
      .filter(!col("__tgt"))
      .join(broadcast(model), Seq("__b"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__m")).cast("long").alias("n_tokens"),
        round(sum(col("__m") * col("__lam")), 4).alias("logw"))
      .withColumn("__s4", round(col("logw") * 10000).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cut = scored.agg(
      percentile(col("__s4"), lit(1.0 - keepFrac)).alias("__cut"))
    scored
      .crossJoin(broadcast(cut))
      .select(
        col(idCol),
        col("n_tokens"),
        col("logw"),
        (col("__s4").cast("double") >= col("__cut")).alias("selected"))
  }
}
