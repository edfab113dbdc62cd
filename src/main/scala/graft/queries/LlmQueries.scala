package graft.queries

import graft.ops.{Contamination, Dedup, Ivf, Multimodal, Quantization, Redaction, Sampling, Similarity, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness queries for the training-data-pipeline operators: dedup
  * (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
  * text analysis, multimodal plumbing.
  *
  * The synthetic corpus contains no duplicates, so dup-bearing queries
  * build a deterministic augmented corpus IN the query (original docs ∪
  * exact copies ∪ one-token-mutated copies) — both engines construct the
  * same corpus, so the oracle checks the dedup logic, not the fixture.
  */
object LlmQueries {

  type Q = (SparkSession, String) => DataFrame

  /** documents ∪ exact copies of doc_id%10==0 (id+1000000000). */
  private def withExactCopies(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionAll(
      docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 1000000000).alias("doc_id"), col("text")))

  /** odd-id originals ∪ near-copies of doc_id%10==5 (id+2000000000, one token
    * appended) — the near-duplicate corpus. */
  private def nearDupCorpus(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("text"))
      .unionAll(
        docs.filter(pmod(col("doc_id"), lit(10)) === 5)
          .select((col("doc_id") + 2000000000L).alias("doc_id"),
            concat(col("text"), lit(" zqxmutation")).alias("text")))

  /** Exact-duplicate groups via digest hash-groupBy
    * ([[graft.ops.Dedup.exactDupGroups]]). */
  val ddExact: Q = (s, d) =>
    Dedup.exactDupGroups(withExactCopies(Tables.documents(s, d)), "doc_id", "text")
      .select(col("text_md5"), col("dup_count").cast("long").alias("dup_count"), col("keeper_id"))
      .orderBy(col("text_md5"))

  /** MinHash-LSH candidate generation verified by exact text equality —
    * identical texts always collide in every band, so LSH recall on exact
    * dups is 1.0 and the result must equal the oracle's exact self-join.
    * No crossJoin anywhere: candidates come from band-hash buckets. */
  val ddMinhashLsh: Q = (s, d) => {
    val docs = withExactCopies(Tables.documents(s, d))
    val cands = Dedup.lshCandidatePairs(docs, "doc_id", "text")
    val texts = docs.select(col("doc_id"), md5(col("text")).alias("__h"))
    cands
      .join(texts.withColumnRenamed("doc_id", "id1").withColumnRenamed("__h", "__h1"), Seq("id1"))
      .join(texts.withColumnRenamed("doc_id", "id2").withColumnRenamed("__h", "__h2"), Seq("id2"))
      .filter(col("__h1") === col("__h2"))
      .select(col("id1"), col("id2"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Near-dup detection: LSH candidates → exact word-3-gram Jaccard ≥ 0.8
    * ([[graft.ops.Dedup.nearDupPairs]]). The oracle computes the full
    * quadratic Jaccard over the (small) corpus; LSH parameters are sized
    * so recall at J≥0.8 is 1.0 on this corpus — verified, not assumed. */
  val ddNearDupJaccard: Q = (s, d) =>
    Dedup.nearDupPairs(nearDupCorpus(Tables.documents(s, d)), "doc_id", "text", 0.8)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).alias("jaccard"))
      .orderBy(col("id1"), col("id2"))

  /** EXACT set-similarity join ([[graft.ops.Dedup.prefixFilterJoin]]):
    * the lossless AllPairs/PPJoin complement to the MinHash-LSH path —
    * recall 1.0 by the prefix-filter theorem, so the brute-force
    * quadratic Jaccard IS its oracle, not an approximation of it.
    * Candidates come from rarest-first prefix buckets, never all-pairs. */
  val ddSsjoinPrefix: Q = (s, d) =>
    Dedup.prefixFilterJoin(nearDupCorpus(Tables.documents(s, d)), "doc_id", "text", 0.7)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).alias("jaccard"))
      .orderBy(col("id1"), col("id2"))

  /** Incremental dedup ([[graft.ops.Dedup.incrementalNearDupPairs]]):
    * the mutated +2000000000 copies play the NEW daily batch, the odd-id
    * originals the ingested history — every planted near-dup pair
    * crosses batch×history, the exact steady-state scenario. The oracle
    * is the full quadratic Jaccard restricted to pairs touching the
    * batch (history-internal pairs are declared already-known and never
    * recomputed). */
  val ddIncremental: Q = (s, d) => {
    val corpus = nearDupCorpus(Tables.documents(s, d))
    Dedup.incrementalNearDupPairs(
      corpus.filter(col("doc_id") < 2000000000L),
      corpus.filter(col("doc_id") >= 2000000000L),
      "doc_id", "text", 0.8)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).alias("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Fuzzy entity matching ([[graft.ops.Dedup.editDistancePairs]]):
    * distinct part names, 4-char prefix block, Levenshtein ≤ 4 with the
    * thresholded (early-exit) variant. The oracle replays block + full
    * edit distance in DuckDB. */
  val ddEditDist: Q = (s, d) =>
    Dedup.editDistancePairs(Tables.part(s, d).select(col("p_name")), "p_name",
      blockLen = 4, maxDist = 4)
      .select(col("name1"), col("name2"), col("dist").cast("int").alias("dist"))
      .orderBy(col("name1"), col("name2"))

  /** Near-dup pairs → transitive clusters → keeper per cluster
    * ([[graft.ops.Clustering]]): the step that turns pair detection into
    * corpus-dedup semantics (A~B, B~C ⇒ one cluster, keep min id). The
    * oracle recomputes components as a recursive-CTE transitive closure
    * over the same full-quadratic Jaccard pair set. */
  val ddCluster: Q = (s, d) =>
    graft.ops.Clustering.clusterAssignments(
      Dedup.nearDupPairs(nearDupCorpus(Tables.documents(s, d)), "doc_id", "text", 0.8)
        .select(col("id1"), col("id2")))
      .select(col("id").alias("doc_id"), col("cluster_id"), col("is_keeper"))
      .orderBy(col("doc_id"))

  /** CP1: the composed training-corpus construction pipeline — quality
    * gate (native single-pass score) ∧ token-length bounds (native
    * single-scan count) → exact dedup (digest groupBy keeper semi-join)
    * → deterministic 50% hash sample. All four stages are the engine's
    * own operators chained exactly as a corpus build would run them; the
    * whole plan is one scan + one dedup shuffle + narrow filters. */
  val cpCorpusClean: Q = (s, d) => {
    // raw score for the threshold and TRUNCATED (not rounded) for the
    // report: the raw double is bit-identical across engines, while
    // round's half-way ties are not (Spark decimal-repr vs DuckDB binary
    // — observed 1-ulp divergence at sf0.1)
    val qraw = graft.functions.native.qualityScoreRaw(col("text"))
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        (floor(qraw * 10000) / 10000).alias("quality_score"),
        TextAnalysis.tokenCount(col("text")).alias("n_tokens"))
      .filter(qraw >= 0.4 && col("n_tokens").between(20, 2000))
    val keepIds = Dedup.exactDedupIds(scored, "doc_id", "text")
    graft.ops.Sampling.sample(
      scored.join(keepIds, Seq("doc_id"), "left_semi"), col("doc_id"), 0.5)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end corpus dedup: near-dup pairs → connected components →
    * drop every non-keeper ([[graft.ops.Clustering.dropNonKeepers]]) —
    * what a training-data pipeline actually ships: the corpus with one
    * representative per near-dup cluster, unpaired rows untouched. The
    * oracle recomputes components with a recursive CTE and anti-joins
    * the non-keepers. */
  val ddCorpusDedup: Q = (s, d) => {
    val corpus = nearDupCorpus(Tables.documents(s, d))
    val pairs = Dedup.nearDupPairs(corpus, "doc_id", "text", 0.8)
      .select(col("id1"), col("id2"))
    graft.ops.Clustering.dropNonKeepers(corpus, "doc_id", pairs)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** IVF ANN over k-means-REFINED centroids ([[graft.ops.Ivf
    * .trainCentroids]], 3 spherical Lloyd rounds) with a full probe:
    * deterministically identical to exact search whatever the centroids
    * converge to, so it shares the brute-force oracle — while executing
    * the train → assign → probe path end-to-end. Partial-probe recall
    * with trained centroids is covered in `SimilaritySpec`. */
  val annIvfTrained: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val cents = graft.ops.Ivf.trainCentroids(emb, "vec_id", "embedding", nCells = 16, iterations = 3)
    graft.ops.Ivf.topK(emb, "vec_id", "embedding", Seq(0L, 1L, 2L, 3L, 4L), 3,
      nCells = 16, nProbe = 16, centroids = Some(cents))
      .select(col("q_id"), col("rnk"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** PERSISTED IVF index with a PARTIAL probe ([[graft.ops.Ivf]]
    * writeIndex/searchIndex): the index is built to disk partitioned by
    * cell, and the search reads only the 4-of-16 probed cell
    * directories (partition-pruned, pinned in PlanShapeSpec). Unlike
    * `ann_ivf_topk` (full probe ⇒ exact ⇒ brute oracle), this entry's
    * DuckDB oracle replays the ENTIRE IVF contract in SQL: seed
    * centroids, argmax cell assignment, per-query probe ranking, and
    * the pruned-cell cosine top-k — partial-probe semantics verified
    * value-for-value. */
  val annIvfDisk: Q = (s, d) => {
    val idx = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_idx_${Integer.toHexString(d.hashCode)}"
    Ivf.writeIndex(Tables.embeddings(s, d), "vec_id", "embedding", idx, nCells = 16)
    Ivf.searchIndex(s, idx, Seq(0L, 1L, 2L, 3L, 4L), 3, nProbe = 4)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** SimHash near-dup audit: signature of each mutated near-copy joined
    * back to its original, plus the Hamming distance between them. Uses
    * the portable md5-based 48-bit signature ([[Dedup.simhashPortable]])
    * so EVERY value — both signatures and the distance — is replayed
    * bit-for-bit by the DuckDB oracle. The xxhash64 production kernel
    * ([[Dedup.simhash64]], much cheaper per token at scale) is pinned to
    * this portable variant by a classification-agreement property in
    * DedupSpec. */
  val ddSimhash: Q = (s, d) => {
    val base = Tables.documents(s, d).filter(col("doc_id") < 1000)
    val corpus = base.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("text"))
      .unionAll(
        base.filter(pmod(col("doc_id"), lit(10)) === 5)
          .select((col("doc_id") + 2000000000L).alias("doc_id"),
            concat(col("text"), lit(" zqxmutation")).alias("text")))
    val sigs = corpus.select(
      col("doc_id"), Dedup.simhashPortable(col("text")).alias("sig"))
    val orig = sigs.filter(col("doc_id") < 2000000000L)
      .select(col("doc_id").alias("orig_id"), col("sig").alias("orig_sig"))
    sigs.filter(col("doc_id") >= 2000000000L)
      .select((col("doc_id") - 2000000000L).alias("orig_id"), col("sig").alias("mut_sig"))
      .join(orig, Seq("orig_id"))
      .select(col("orig_id"), col("orig_sig"), col("mut_sig"),
        Dedup.hamming64(col("orig_sig"), col("mut_sig")).alias("hamming"))
      .orderBy(col("orig_id"))
  }

  /** SimHash BANDED near-dup detection ([[Dedup.simhashBandPairs]]):
    * candidates from band-slice bucket collisions (pigeonhole recall
    * 1.0 within Hamming ≤ bands−1; never an all-pairs join), verified
    * by exact Hamming ≤ 6. The DuckDB oracle replays signatures, the
    * agree-on-any-band candidate rule, and the Hamming filter. */
  val ddSimhashBand: Q = (s, d) => {
    val base = Tables.documents(s, d).filter(col("doc_id") < 2000)
    val corpus = base.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("text"))
      .unionAll(
        base.filter(pmod(col("doc_id"), lit(10)) === 5)
          .select((col("doc_id") + 2000000000L).alias("doc_id"),
            concat(col("text"), lit(" zqxmutation")).alias("text")))
    Dedup.simhashBandPairs(corpus, "doc_id", "text")
      .orderBy(col("id1"), col("id2"))
  }

  /** Brute-force cosine top-k ([[graft.ops.Similarity.bruteTopK]]) —
    * the exact baseline, vs a DuckDB list_cosine_similarity oracle. */
  val annBruteTopK: Q = (s, d) =>
    Similarity.bruteTopK(Tables.embeddings(s, d), "vec_id", "embedding", Seq(0L, 1L, 2L, 3L, 4L), 3)
      .select(col("q_id"), col("rnk"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))

  /** FILTERED vector search ([[graft.ops.Similarity.filteredTopK]]):
    * top-k among only even-label vectors — pre-filter semantics, so
    * every query returns exactly k ELIGIBLE neighbors (post-filtering
    * an unfiltered top-k would leave recall holes). The scale path
    * ([[graft.ops.Similarity.filteredMultiProbeTopK]], filter pushed
    * below bucketing) is pinned against this exact form in
    * `SimilaritySpec`. */
  val annFilteredTopK: Q = (s, d) =>
    Similarity.filteredTopK(
      Tables.embeddings(s, d), "vec_id", "embedding",
      eligible = pmod(col("label"), lit(2)) === 0, Seq(0L, 1L, 2L, 3L, 4L), 3)
      .orderBy(col("q_id"), col("rnk"))

  /** LSH-bucketed ANN ([[graft.ops.Similarity.lshTopK]]) — the scale
    * path. Fully oracled: the hyperplane matrix is a deterministic
    * plan-time literal, so the DuckDB oracle recomputes sign signatures,
    * band buckets and the exact cosine rank from the same values. */
  val annLshTopK: Q = (s, d) =>
    Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding", Seq(0L, 1L, 2L, 3L, 4L), 3)
      .select(col("q_id"), col("rnk"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))

  /** Multi-probe LSH ANN ([[Similarity.multiProbeLshTopK]]): per band the
    * query probes its own bucket plus every 1-bit-flip bucket, so the
    * candidate rule widens to hamming ≤ 1 on the band slice — strictly
    * more recall than `ann_lsh_topk` at the same table count. Oracle
    * replays the rule as an elementwise slice compare. */
  val annMplshTopK: Q = (s, d) =>
    Similarity.multiProbeLshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
      Seq(0L, 1L, 2L, 3L, 4L), 3)
      .select(col("q_id"), col("rnk"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))

  /** IVF ANN ([[graft.ops.Ivf]]) with a full probe: deterministically
    * identical to exact search (every cell scanned), so it shares the
    * brute-force oracle — the partial-probe scale path is covered by the
    * recall tests. */
  val annIvfTopK: Q = (s, d) =>
    graft.ops.Ivf.topK(Tables.embeddings(s, d), "vec_id", "embedding",
      Seq(0L, 1L, 2L, 3L, 4L), 3, nCells = 16, nProbe = 16)
      .select(col("q_id"), col("rnk"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))

  /** Embedding-cosine near-dup pairs over corpus ∪ exact vector copies
    * (vec_id%20==0 → +1000000000): every planted pair has cosine 1.0 and LSH
    * buckets identical signatures together, so recall is exact.
    * Replicas via explode, not unionAll: a union child constraining the
    * pruned vector column trips Spark's Union constraint-rewrite bug
    * (key not found: embedding#N) in PruneFilters once table stats make
    * the optimizer revisit the union — first seen at the sf10 ladder
    * point; the explode form has no Union node (same fix as
    * `dd_semantic_dedup`). */
  val cosNearDup: Q = (s, d) => {
    val corpus = Tables.embeddings(s, d).select(
        explode(when(pmod(col("vec_id"), lit(20)) === 0, array(lit(0L), lit(1000000000L)))
          .otherwise(array(lit(0L)))).alias("__off"),
        col("vec_id"), col("embedding"))
      .select((col("vec_id") + col("__off")).alias("vec_id"), col("embedding"))
    Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.95)
      .select(col("id1"), col("id2"), col("sim"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Semantic corpus dedup (the SemDeDup shape) end-to-end over the
    * EMBEDDING space: LSH-bucketed exact-cosine near-dup pairs
    * ([[graft.ops.Similarity.cosineNearDupPairs]], plane matrix
    * replayed in the oracle) → connected components (pointer jumping,
    * [[graft.ops.Clustering]]) → drop non-keepers. The embedding
    * analog of `dd_corpus_dedup`: duplicates that share no text
    * n-grams but sit at cosine ≥ 0.95 collapse to one representative.
    * Scale shape: candidate pairs from banded hyperplane buckets
    * (never all-pairs), O(log n) pointer-jumping rounds. */
  val ddSemanticDedup: Q = (s, d) => {
    // replicas via explode, not unionAll: the components path evaluates
    // through Dataset.rdd, whose extra optimizer round trips a Union
    // constraint-rewrite bug (key not found: embedding#N) when a union
    // child constrains the pruned vector column — the explode form has
    // no Union node and survives every execution path
    def corpus() = Tables.embeddings(s, d).select(
        explode(when(pmod(col("vec_id"), lit(20)) === 0, array(lit(0L), lit(1000000000L)))
          .otherwise(array(lit(0L)))).alias("__off"),
        col("vec_id"), col("embedding"))
      .select((col("vec_id") + col("__off")).alias("vec_id"), col("embedding"))
    val pairs = Similarity.cosineNearDupPairs(corpus(), "vec_id", "embedding", 0.95)
      .select(col("id1"), col("id2"))
    graft.ops.Clustering.dropNonKeepers(corpus().select(col("vec_id")), "vec_id", pairs)
      .select(col("vec_id"))
      .orderBy(col("vec_id"))
  }

  /** Text profile: token/word counts, ratios, language ID
    * ([[graft.ops.TextAnalysis.profile]] columns with SQL-expressible
    * definitions). */
  val txProfile: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"), TextAnalysis.words(col("text")).alias("__w"))
      .select(
        col("doc_id"),
        size(col("__w")).alias("n_words"),
        TextAnalysis.tokenCount(col("text")).alias("n_tokens"),
        round(TextAnalysis.punctRatio(col("text")), 4).alias("punct_ratio"),
        round(TextAnalysis.stopwordRatioFromParts(col("__w")), 4).alias("stopword_ratio"),
        TextAnalysis.langIdFromParts(col("__w")).alias("lang_pred"))
      .orderBy(col("doc_id"))

  /** Quality scoring + bucketing over the whole corpus. The score is the
    * native single-pass [[graft.functions.QualityScoreRaw]] (one compiled
    * scan per doc; the HOF form ran several interpreted lambda passes) —
    * bit-identical to `qualityScoreFromParts`, pinned by
    * `TextAnalysisSpec`. */
  val txQuality: Q = (s, d) => {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.native.qualityScore(col("text")).alias("quality_score"))
    scored
      .groupBy(TextAnalysis.qualityBucket(col("quality_score")).alias("quality_bucket"))
      .agg(count(lit(1)).alias("n"), round(avg(col("quality_score")), 4).alias("avg_score"))
      .orderBy(col("quality_bucket"))
  }

  /** Cross-engine document fingerprint (positional rolling hash
    * [[graft.ops.TextAnalysis.charFingerprint]]). */
  val txFingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), TextAnalysis.charFingerprint(col("text")).alias("fingerprint"))
      .orderBy(col("doc_id"))

  /** Multimodal plumbing: binary payload + metadata + frame-sample counts
    * ([[graft.ops.Multimodal]]). Payload bytes are UTF-8 text standing in
    * for media; schema/partitioning/explode shapes are the real thing. */
  val mmBinaryMeta: Q = (s, d) => {
    val media = Multimodal.attachPayload(
      Tables.documents(s, d).filter(col("doc_id") < 100), "doc_id", "text", "fake/utf8")
    val frames = Multimodal.frameSample(media, frameBytes = 64, stride = 32)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).alias("n_frames"))
    media
      .join(frames, Seq("media_id"))
      .select(col("media_id"), col("media_type"), col("n_bytes"), col("digest"),
        col("n_frames").cast("long").alias("n_frames"))
      .orderBy(col("media_id"))
  }

  /** Resize stage ([[graft.ops.Multimodal.resize]]): stub byte decimation
    * with metadata refresh — the corpus is pure ASCII, so the DuckDB
    * oracle reproduces the decimated payload digest character-wise. */
  val mmResize: Q = (s, d) => {
    implicit val sp: SparkSession = s
    Multimodal.resize(
      Multimodal.attachPayload(Tables.documents(s, d).filter(col("doc_id") < 100), "doc_id", "text", "fake/utf8"),
      factor = 4)
      .select(col("media_id"), col("media_type"), col("n_bytes_resized"), col("digest"))
      .orderBy(col("media_id"))
  }

  /** Stubbed feature extraction through the typed mapPartitions batch
    * path. The stub features are deterministic byte statistics over
    * pure-ASCII payloads, so DuckDB reproduces byte mean/variance exactly
    * from `ascii()` — a full value oracle, not rows-only. */
  val mmFeatures: Q = (s, d) => {
    implicit val sp: SparkSession = s
    Multimodal.extractFeatures(
      Multimodal.attachPayload(Tables.documents(s, d).filter(col("doc_id") < 50), "doc_id", "text", "fake/utf8"))
      .toDF()
      .select(
        col("media_id"),
        col("n_bytes"),
        round(element_at(col("features"), 4), 4).alias("byte_mean"),
        round(element_at(col("features"), 5), 4).alias("byte_var"))
      .orderBy(col("media_id"))
  }

  /** REAL audio decode ([[graft.ops.Multimodal.decodeAudioFeatures]]):
    * deterministic 16-bit mono WAV payloads are synthesized per doc
    * (real RIFF bytes through the JDK's own WAVE writer), then decoded
    * back through `javax.sound.sampled` into exact signal moments. The
    * oracle replays the generating sample formula in SQL — every
    * statistic accumulates in exact integers with one final division,
    * so equality proves the decode path recovers the PCM bit-for-bit. */
  val mmAudio: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d).filter(col("doc_id") < 50)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { k =>
        val n = (800 + (k % 5) * 200).toInt
        val smp = Array.tabulate(n)(i => (((k * 31 + i.toLong * 17) % 2001) - 1000).toShort)
        (k, "audio/wav", Multimodal.wavBytes(smp, 8000))
      })
      .toDF("media_id", "media_type", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("digest", md5(col("payload")))
    Multimodal.extractFeatures(media)(s).toDF()
      .select(
        col("media_id"),
        element_at(col("features"), 1).cast("int").alias("sample_rate"),
        element_at(col("features"), 2).cast("int").alias("channels"),
        element_at(col("features"), 3).cast("long").alias("n_frames"),
        round(element_at(col("features"), 4), 6).alias("duration_s"),
        round(element_at(col("features"), 5), 6).alias("peak"),
        round(element_at(col("features"), 6), 6).alias("rms"),
        round(element_at(col("features"), 7), 6).alias("mean"),
        round(element_at(col("features"), 8), 6).alias("zcr"))
      .orderBy(col("media_id"))
  }

  /** REAL animated-media frame sampling ([[Multimodal.decodeGifFrames]]):
    * each media item is an animated GIF (the one animated container the
    * JDK can both write and parse) of doc_id-derived constant-gray
    * frames; the engine decodes the frame SEQUENCE and keeps every 2nd
    * frame. GIF is lossless-indexed, so the oracle replays frame count,
    * geometry, and per-frame gray means from the generating formula —
    * equality proves bit-exact multi-frame recovery. */
  val mmFrames: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d).filter(col("doc_id") < 40)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { k =>
        val nFrames = (k % 3 + 2).toInt
        val frames = (0 until nFrames).map(f =>
          Multimodal.grayFrame(8, 8, ((k * 31 + f * 17) % 256).toInt))
        (k, "image/gif-anim", Multimodal.gifBytes(frames))
      })
      .toDF("media_id", "media_type", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("digest", md5(col("payload")))
    Multimodal.sampleFrames(media, stride = 2)(s)
      .select(col("media_id"), col("frame_idx"), col("width"), col("height"),
        col("gray_mean"), col("n_frames"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** PII redaction over documents with deterministically planted PII
    * (the synthetic corpus itself is clean, so both engines append the
    * same email/IP/phone suffix before redacting — the oracle checks the
    * patterns and replacement, not the fixture). */
  val txRedact: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .withColumn("txt",
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0.0."), pmod(col("doc_id"), lit(250)).cast("string"),
          lit(" call +1 555 0100")))
      .select(
        col("doc_id"),
        Redaction.emailCount(col("txt")).alias("n_emails"),
        Redaction.ipCount(col("txt")).alias("n_ips"),
        Redaction.phoneCount(col("txt")).alias("n_phones"),
        Redaction.redactPii(col("txt")).alias("redacted"))
      .orderBy(col("doc_id"))

  /** Repetition quality signals (word-level + bigram-level). */
  val txRepetition: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(
        col("doc_id"),
        round(TextAnalysis.repetitionRatio(col("text")), 4).alias("word_rep"),
        round(TextAnalysis.dupNgramRatio(col("text"), 2), 4).alias("bigram_rep"))
      .orderBy(col("doc_id"))

  /** Deterministic stratified sampling by length stratum (md5 hash-space
    * keep rule — reproducible in any engine, the 100 TB mixing primitive). */
  val smStratified: Q = (s, d) => {
    val stratum = when(length(col("text")) >= 400, "long")
      .when(length(col("text")) >= 150, "mid")
      .otherwise("short")
    Sampling.stratifiedSample(
      Tables.documents(s, d).withColumn("stratum", stratum),
      col("stratum"),
      Map("long" -> 1.0, "mid" -> 0.5, "short" -> 0.125),
      col("doc_id"))
      .select(col("doc_id"), col("stratum"))
      .orderBy(col("doc_id"))
  }

  /** Weighted deterministic sampling ([[graft.ops.Sampling
    * .weightedSample]]): each doc kept with probability proportional to
    * its length (length/400, capped at 1) — the quality-proportional
    * mixing rule, decided by the doc's OWN hash position so the sample
    * is reproducible in any engine and on any corpus subset. */
  val smWeighted: Q = (s, d) =>
    Sampling.weightedSample(
      Tables.documents(s, d),
      col("doc_id"),
      least(col("n_chars") / 400.0, lit(1.0)))
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Deterministic upsampling ([[graft.ops.Sampling.upsample]]): epoch-
    * style replication by per-row weight (floor copies + hash-Bernoulli
    * remainder) — the mix half weighted DOWNsampling can't express. */
  val smUpsample: Q = (s, d) =>
    Sampling.upsample(
      Tables.documents(s, d).select(col("doc_id")),
      col("doc_id"),
      pmod(col("doc_id"), lit(3)) + lit(0.5))
      .orderBy(col("doc_id"), col("copy_n"))

  /** Deterministic mixture construction ([[graft.ops.Sampling.mixture]]):
    * exact per-source quotas filled by smallest hash variates — "take
    * n_i docs from source i", the training-mix recipe as one windowed
    * pass. */
  val smMixture: Q = (s, d) =>
    Sampling.mixture(
      Tables.documents(s, d).select(col("doc_id"),
        when(col("n_chars") >= 400, "long")
          .when(col("n_chars") >= 150, "mid")
          .otherwise("short").alias("stratum")),
      col("stratum"), col("doc_id"),
      Map("long" -> 40L, "mid" -> 25L, "short" -> 10L))
      .orderBy(col("doc_id"))

  /** The SQL-registration path of the native expressions end-to-end:
    * a SQL-TEXT query through the `SparkSessionExtensions.injectFunction`
    * names (`token_count`, `word_shingles`, `dot_product`) — proving a
    * pure-SQL user gets the same codegen'd kernels the column API uses.
    * Oracle recomputes each from portable SQL. */
  val f18SqlNative: Q = (s, d) => {
    Tables.documents(s, d).createOrReplaceTempView("graft_docs_sqlfn")
    s.sql("""
      SELECT doc_id,
             token_count(text) AS n_tokens,
             CAST(size(word_shingles(text, 3)) AS INT) AS n_shingles,
             round(dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)), 1) AS dot
      FROM graft_docs_sqlfn WHERE doc_id < 50 ORDER BY doc_id""")
  }

  /** Benchmark-contamination check: corpus docs vs a benchmark slice
    * (doc_id % 50 == 0 ⇒ those corpus docs are fully contaminated by
    * construction; the rest measure incidental trigram overlap). */
  val ctNgramOverlap: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Contamination.ngramOverlap(
      docs.filter(col("doc_id") < 300), "doc_id", "text",
      docs.filter(pmod(col("doc_id"), lit(50)) === 0), "text")
      .orderBy(col("doc_id"))
  }

  /** Bloom-prefiltered benchmark decontamination
    * ([[Contamination.bloomDecontaminate]]): the corpus probes a
    * broadcast Bloom of the benchmark's shingles BEFORE any explode or
    * shuffle — clean documents (the overwhelming majority at scale)
    * never leave the scan. Exact: no false negatives + trailing exact
    * join, so the oracle is the plain n-gram join restricted to
    * contaminated docs. */
  val ctBloomDecontam: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Contamination.bloomDecontaminate(
      docs.filter(pmod(col("doc_id"), lit(97)) =!= 13), "doc_id", "text",
      docs.filter(pmod(col("doc_id"), lit(97)) === 13), "text")
      .orderBy(col("doc_id"))
  }

  /** Gopher document-quality rules ([[TextAnalysis.gopherRules]], Rae
    * et al. 2021 appendix A): per-rule booleans + conjunction, every
    * signal column replayed by the oracle. */
  val txGopherRules: Q = (s, d) =>
    TextAnalysis.gopherRules(
      Tables.documents(s, d).filter(col("doc_id") < 300), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Trained language ID ([[TextAnalysis.trainedLangId]]): frequency
    * profiles learned from the labeled corpus, integer-exact scoring so
    * the argmax replays bit-for-bit in DuckDB. */
  val txLangidTrained: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    TextAnalysis.trainedLangId(
      docs, "doc_id", "text", "lang", docs.filter(col("doc_id") < 300))
      .orderBy(col("doc_id"))
  }

  /** Portable SimHash (md5-based): the signature itself is the verified
    * value — DuckDB recomputes all 48 bits from the same md5 token
    * hashes, closing the "SimHash has no value oracle" gap (the
    * xxhash64 production variant stays rows-only by nature). */
  val ddSimhashMd5: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), Dedup.simhashPortable(col("text")).alias("simhash"))
      .orderBy(col("doc_id"))

  /** Content-defined chunking ([[TextAnalysis.contentDefinedChunks]]):
    * rolling-hash boundaries make chunk identity stable under edits —
    * the chunk-level dedup precondition fixed-stride chunking can't
    * give. Oracle replays boundary rule, slices, and digests. */
  val g7CdcChunk: Q = (s, d) =>
    TextAnalysis.contentDefinedChunks(
      Tables.documents(s, d).filter(col("doc_id") < 500), "doc_id", "text")
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Chunk-overlap near-dup detection ([[Dedup.chunkOverlapPairs]]):
    * the dedup application of content-defined chunking — each mutated
    * near-copy (suffix edit) shares every chunk of its original except
    * the last, so the pair surfaces by shared-chunk count with no
    * pairwise text comparison anywhere. Oracle replays chunk digests
    * and the shared-count rule. */
  val ddChunkOverlap: Q = (s, d) => {
    val base = Tables.documents(s, d).filter(col("doc_id") < 1000)
    val corpus = base.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("text"))
      .unionAll(
        base.filter(pmod(col("doc_id"), lit(10)) === 5)
          .select((col("doc_id") + 2000000000L).alias("doc_id"),
            concat(col("text"), lit(" zqxmutation")).alias("text")))
    Dedup.chunkOverlapPairs(corpus, "doc_id", "text")
      .orderBy(col("id1"), col("id2"))
  }

  /** Span-dedup corpus: originals ∪ copies of doc_id%5==0 with one
    * unique marker token inserted at the midpoint (id+3e9). A copy
    * shares two long token runs with its original — the two halves —
    * so span detection must find TWO islands per pair member, not one,
    * exercising the interval merge on both sides. */
  private def spanCorpus(docs: DataFrame): DataFrame = {
    val w = Dedup.wordTokens(col("text"))
    val m = floor(size(w).cast("double") / 2).cast("int")
    docs.select(col("doc_id"), col("text")).unionAll(
      docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(
          (col("doc_id") + 3000000000L).alias("doc_id"),
          concat_ws(" ",
            concat(
              slice(w, lit(1), m),
              array(concat(lit("zqins"), col("doc_id").cast("string"))),
              slice(w, m + 1, size(w) - m))).alias("text")))
  }

  /** Exact-substring duplicated spans
    * ([[graft.ops.Dedup.duplicatedSpans]], Lee et al. 2021 at 8-gram
    * granularity) over the mid-insert span corpus: each original/copy
    * pair shares its two halves, so both members report their halves as
    * duplicated spans (minus the grams straddling the insertion point)
    * while unpaired docs stay clean. */
  val ddSubstringSpans: Q = (s, d) =>
    Dedup.duplicatedSpans(spanCorpus(Tables.documents(s, d)), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** DSIR importance selection ([[graft.ops.Sampling.dsirSelect]], Xie
    * et al. 2023): hashed-unigram importance weights of every non-`en`
    * document against the `en` target model; top quartile selected. */
  val smDsir: Q = (s, d) =>
    Sampling.dsirSelect(
      Tables.documents(s, d), "doc_id", "text", isTarget = col("lang") === "en")
      .orderBy(col("doc_id"))

  /** C4-battery corpus: deterministic punctuation re-synthesis (a '.'
    * after every `doc_id%5+3`-th token) plus policy-phrase / brace
    * injections on doc_id%13==0 / %17==0 — the raw corpus has no
    * punctuation, so rule outcomes would be constant without it. */
  private def punctuatedCorpus(docs: DataFrame): DataFrame = {
    val w = Dedup.wordTokens(col("text"))
    val m = (pmod(col("doc_id"), lit(5)) + 3).cast("int")
    val punct = concat_ws(" ",
      zip_with(w, sequence(lit(1), size(w)),
        (t, i) => concat(t, when(pmod(i, m) === 0, lit(".")).otherwise(lit("")))))
    docs.select(
      col("doc_id"),
      concat(
        punct,
        when(pmod(col("doc_id"), lit(13)) === 0, lit(" lorem ipsum")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(17)) === 0, lit(" {code}")).otherwise(lit("")))
        .alias("text"))
  }

  /** C4 cleaning battery ([[graft.ops.TextAnalysis.c4Rules]], Raffel et
    * al. 2020) over the punctuated corpus: sentence-structure and
    * policy-phrase rules vary per document by construction. */
  val txC4Rules: Q = (s, d) =>
    TextAnalysis.c4Rules(punctuatedCorpus(Tables.documents(s, d)), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Corpus token-count histogram (the length-distribution audit every
    * mixing plan starts from): docs per 20-token bucket + bucket token
    * mass. */
  val txTokenHist: Q = (s, d) =>
    Tables.documents(s, d)
      .select(TextAnalysis.tokenCount(col("text")).alias("__tok"))
      .groupBy((floor(col("__tok") / 20) * 20).cast("int").alias("bucket_lo"))
      .agg(count(lit(1)).alias("n_docs"), sum(col("__tok")).alias("total_tokens"))
      .orderBy(col("bucket_lo"))

  /** Bigram language-model fluency score per document
    * ([[graft.ops.TextAnalysis.bigramLmScore]]): add-one-smoothed
    * self-trained model, the kenlm-style gibberish filter. Narrow bigram
    * extraction (index transform over each row's token array — no token
    * shuffle); the oracle replays the identical model in SQL. */
  val txBigramLm: Q = (s, d) =>
    TextAnalysis.bigramLmScore(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** CCNet-style perplexity partitioning
    * ([[graft.ops.TextAnalysis.lmQualityBuckets]]): corpus terciles of
    * the bigram-LM score — head (most fluent) / middle / tail. */
  val txPplBuckets: Q = (s, d) =>
    TextAnalysis.lmQualityBuckets(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("avg_logp"), col("ppl_bucket"))
      .orderBy(col("doc_id"))

  /** TF-IDF term weights ([[graft.ops.TextAnalysis.tfidf]]) — the
    * classic relevance/keyword-extraction weighting, model replayed in
    * SQL. */
  val txTfidf: Q = (s, d) =>
    TextAnalysis.tfidf(Tables.documents(s, d), "doc_id", "text")
      .filter(col("doc_id") < 30)
      .orderBy(col("doc_id"), col("term"))

  /** Product-quantization recall CONTRACT ([[graft.ops.Pq]]): each
    * query's EXACT nearest neighbor (hash-verified against the DuckDB
    * brute oracle) must appear in the PQ asymmetric-distance top-10 —
    * the recall bar a 32×-compressed ANN index has to clear before it
    * can replace full-precision vectors. Deterministic training
    * (seeded, tie-broken) keeps the contract bit stable. */
  val eqPqRecall: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 1)
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("n_id").alias("top1_id"))
    // code resolution scales with corpus size or the top-10 contract
    // decays as rank crowding grows (graft.ops.Pq.resolutionScaledKsub)
    val pq = graft.ops.Pq.adcTopK(emb, "vec_id", "embedding", qids, 10,
      ksub = graft.ops.Pq.resolutionScaledKsub(emb.count()))
      .select(col("q_id"), col("n_id"))
    exact
      .join(pq.withColumnRenamed("n_id", "pq_id"), Seq("q_id"), "left")
      .groupBy(col("q_id"), col("top1_id"))
      .agg(max((col("pq_id") === col("top1_id")).cast("int")).cast("int").alias("in_pq_top10"))
      .orderBy(col("q_id"))
  }

  /** IVF-PQ recall CONTRACT ([[graft.ops.Ivf.pqTopK]]): the composed
    * production index — coarse cells bound WHERE to look (half the
    * cells probed here), PQ codes bound WHAT is read — must still place
    * each query's exact nearest neighbor in its top-10. `SimilaritySpec`
    * additionally pins full-probe ≡ plain-PQ exact equality. */
  val annIvfPqRecall: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 1)
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("n_id").alias("top1_id"))
    val ivfpq = graft.ops.Ivf.pqTopK(emb, "vec_id", "embedding", qids, 10, nCells = 32, nProbe = 16,
      ksub = graft.ops.Pq.resolutionScaledKsub(emb.count()))
      .select(col("q_id"), col("n_id").alias("pq_id"))
    exact
      .join(ivfpq, Seq("q_id"), "left")
      .groupBy(col("q_id"), col("top1_id"))
      .agg(max((col("pq_id") === col("top1_id")).cast("int")).cast("int").alias("in_ivfpq_top10"))
      .orderBy(col("q_id"))
  }

  /** Per-vector int8 quantization audit: scale + max reconstruction
    * error (bounded by scale/2 by construction). */
  val eqQuantize: Q = (s, d) =>
    Quantization.reconstructionError(
      Tables.embeddings(s, d).filter(col("vec_id") < 200), "vec_id", "embedding")
      .select(
        col("vec_id"),
        round(col("scale"), 6).alias("scale"),
        round(col("max_err"), 6).alias("max_err"))
      .orderBy(col("vec_id"))

  // ------------------------------------------------------------ oracle SQL

  private val exactCopiesSql =
    """(SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)"""

  private val nearDupCorpusSql =
    """(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL SELECT doc_id + 2000000000 AS doc_id, text || ' zqxmutation' AS text
        FROM documents WHERE doc_id % 10 = 5)"""

  /** Word-3-gram shingle set in DuckDB, matching
    * [[graft.ops.Dedup.shingles]]: lowercase whitespace tokens, 3-gram
    * join by space, distinct; short docs collapse to one shingle. */
  private val shinglesSql =
    """list_distinct(list_transform(
         range(1, greatest(len(w) - 2, 1) + 1),
         i -> concat_ws(' ', w[i], w[i+1], w[i+2])))"""

  private[queries] def wordsSqlOf(expr: String): String =
    "list_filter(str_split_regex(lower(" + expr + "), '\\s+'), x -> len(x) > 0)"

  private[queries] val wordsSql = wordsSqlOf("text")

  /** 48-bit portable SimHash of `textExpr` in DuckDB — replays
    * [[graft.ops.Dedup.simhashPortable]] bit-for-bit: md5 token hashes
    * (first 60 bits hex-parsed), a ±1 sign vote per bit, disjoint-bit
    * sum assembling the signature word. */
  private def simhashSql(textExpr: String): String = {
    val hs = "list_transform(" + wordsSqlOf(textExpr) +
      ", x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT))"
    s"""CAST(list_sum(list_transform(range(0, 48), j ->
          CASE WHEN list_sum(list_transform($hs,
                 h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
               THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"""
  }

  /** [[graft.functions.QualityScoreRaw]]'s composite quality score in
    * DuckDB — raw (bit-identical IEEE arithmetic) and rounded to 4 dp
    * (shared by tx_quality and cp_corpus_clean). */
  private[queries] val qualityScoreRawSql =
    s"""(least(CAST(len(text) AS DOUBLE) / 400.0, 1.0) * 0.3
             + least(CAST(len($wordsSql) AS DOUBLE) / 80.0, 1.0) * 0.3
             + least(CAST(len(list_filter($wordsSql,
                   x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                 / len($wordsSql) * 5.0, 1.0) * 0.3
             + (1.0 - least(CAST(len(text) - len(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                 / len(text) * 5.0, 1.0)) * 0.1)"""

  private val qualityScoreSql = s"round($qualityScoreRawSql, 4)"

  /** [[graft.ops.Similarity.lshTopK]]'s 64×64 hyperplane matrix as a
    * DuckDB list-of-lists literal. The matrix is a deterministic
    * plan-time constant (fixed-seed SplitMix64 recurrence), so the
    * oracle reproduces the EXACT signatures the engine computes —
    * `Double.toString` is shortest-round-trip, so the doubles survive
    * the SQL text bit-for-bit. */
  private lazy val lshPlanesSql: String =
    graft.ops.Similarity.planeMatrix(64, 64)
      .map(_.mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  val oracles: Map[String, String] = Map(
    "dd_substring_spans" ->
      s"""WITH base AS (SELECT doc_id, $wordsSql AS w FROM documents),
              corpus AS (
                SELECT doc_id, w FROM base
                UNION ALL
                SELECT doc_id + 3000000000 AS doc_id,
                       w[1:CAST(len(w) // 2 AS INT)]
                         || ['zqins' || CAST(doc_id AS VARCHAR)]
                         || w[CAST(len(w) // 2 AS INT) + 1:len(w)] AS w
                FROM base WHERE doc_id % 5 = 0),
              g AS (SELECT doc_id, unnest(list_transform(
                      range(1, greatest(len(w) - 7, 0) + 1),
                      i -> {'pos': i, 'h': md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' '))})) AS s
                    FROM corpus),
              g2 AS (SELECT doc_id, s.pos AS pos, s.h AS h FROM g),
              dup AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
                                     FROM g2 GROUP BY 1) WHERE nd >= 2),
              hits AS (SELECT doc_id, pos, pos + 7 AS e FROM g2 JOIN dup USING (h)),
              isl AS (SELECT doc_id, pos, e,
                        CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                             THEN 1 ELSE 0 END AS ni
                      FROM hits),
              isl2 AS (SELECT doc_id, pos, e,
                         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
                       FROM isl),
              sp AS (SELECT doc_id, island, min(pos) AS s, max(e) AS e
                     FROM isl2 GROUP BY 1, 2),
              agg AS (SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS dup_toks
                      FROM sp GROUP BY 1)
          SELECT c.doc_id AS doc_id,
                 CAST(len(c.w) AS INT) AS n_tokens,
                 CAST(coalesce(a.n_spans, 0) AS INT) AS n_dup_spans,
                 CAST(coalesce(a.dup_toks, 0) AS BIGINT) AS dup_tokens,
                 round(CAST(coalesce(a.dup_toks, 0) AS DOUBLE) / len(c.w), 4) AS dup_frac,
                 (CAST(coalesce(a.dup_toks, 0) AS DOUBLE) / len(c.w) <= 0.2) AS keep
          FROM corpus c LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""",
    "sm_dsir" ->
      s"""WITH toks AS (SELECT doc_id, lang = 'en' AS tgt, unnest($wordsSql) AS word
                        FROM documents),
              b AS (SELECT doc_id, tgt,
                      CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) % 256 AS bin
                    FROM toks),
              pd AS (SELECT doc_id, tgt, bin, count(*) AS m FROM b GROUP BY 1, 2, 3),
              mdl AS (SELECT bin,
                        sum(CASE WHEN tgt THEN m ELSE 0 END) AS ct,
                        sum(CASE WHEN NOT tgt THEN m ELSE 0 END) AS cr
                      FROM pd GROUP BY 1),
              tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM mdl),
              lam AS (SELECT bin,
                        ln((ct + 1.0) / (nt + 256)) - ln((cr + 1.0) / (nr + 256)) AS lam
                      FROM mdl CROSS JOIN tot),
              sc AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_tokens,
                       round(sum(m * lam), 4) AS logw
                     FROM pd JOIN lam USING (bin) WHERE NOT tgt GROUP BY 1),
              s4 AS (SELECT *, CAST(round(logw * 10000) AS BIGINT) AS s4 FROM sc),
              cut AS (SELECT quantile_cont(s4, 0.75) AS c FROM s4)
          SELECT doc_id, n_tokens, logw, (CAST(s4 AS DOUBLE) >= c) AS selected
          FROM s4 CROSS JOIN cut ORDER BY doc_id""",
    "tx_c4_rules" ->
      s"""WITH base AS (SELECT doc_id, $wordsSql AS w FROM documents),
              pc AS (SELECT doc_id,
                       concat(
                         array_to_string(list_transform(range(1, len(w) + 1),
                           i -> concat(w[CAST(i AS INT)],
                                       CASE WHEN i % (doc_id % 5 + 3) = 0
                                            THEN '.' ELSE '' END)), ' '),
                         CASE WHEN doc_id % 13 = 0 THEN ' lorem ipsum' ELSE '' END,
                         CASE WHEN doc_id % 17 = 0 THEN ' {code}' ELSE '' END) AS text
                     FROM base),
              t AS (SELECT doc_id, lower(text) AS tl, $wordsSql AS w2 FROM pc),
              m AS (SELECT doc_id,
                      CAST(len(w2) AS INT) AS n_words,
                      CAST(len(list_filter(list_transform(str_split_regex(tl, '[.!?]'),
                             s -> trim(s)), s -> len(s) > 0)) AS INT) AS n_sent,
                      len(tl) - len(regexp_replace(tl, '[.!?]', '', 'g')) AS n_marks,
                      (contains(tl, '{') OR contains(tl, '}')) AS has_brace,
                      (contains(tl, 'lorem ipsum') OR contains(tl, 'click here')
                        OR contains(tl, 'terms of use')) AS has_bad
                    FROM t)
          SELECT doc_id, n_words, n_sent AS n_sentences,
                 round(CASE WHEN n_sent > 0
                            THEN CAST(least(n_marks, n_sent) AS DOUBLE) / n_sent
                            ELSE 0.0 END, 4) AS terminal_sentence_frac,
                 has_brace, has_bad AS has_bad_phrase,
                 (n_sent >= 3) AS r_min_sentences,
                 (n_words >= 5) AS r_min_words,
                 (NOT has_brace) AS r_no_brace,
                 (NOT has_bad) AS r_no_bad_phrase,
                 ((n_sent >= 3) AND (n_words >= 5) AND (NOT has_brace)
                   AND (NOT has_bad)) AS keep
          FROM m ORDER BY doc_id""",
    "dd_exact" ->
      s"""SELECT md5(text) AS text_md5, CAST(count(*) AS BIGINT) AS dup_count,
                 CAST(min(doc_id) AS BIGINT) AS keeper_id
          FROM $exactCopiesSql GROUP BY 1 HAVING count(*) > 1 ORDER BY text_md5""",
    "dd_minhash_lsh" ->
      s"""SELECT a.doc_id AS id1, b.doc_id AS id2
          FROM $exactCopiesSql a JOIN $exactCopiesSql b
            ON a.text = b.text AND a.doc_id < b.doc_id
          ORDER BY id1, id2""",
    "dd_neardup_jaccard" ->
      s"""WITH sh AS (
            SELECT doc_id, $shinglesSql AS s
            FROM (SELECT doc_id, $wordsSql AS w FROM $nearDupCorpusSql t))
          SELECT a.doc_id AS id1, b.doc_id AS id2,
                 round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
          ORDER BY id1, id2""",
    "dd_ssjoin_prefix" ->
      s"""WITH sh AS (
            SELECT doc_id, $shinglesSql AS s
            FROM (SELECT doc_id, $wordsSql AS w FROM $nearDupCorpusSql t))
          SELECT a.doc_id AS id1, b.doc_id AS id2,
                 round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.7
          ORDER BY id1, id2""",
    "dd_editdist" ->
      """SELECT a.p_name AS name1, b.p_name AS name2,
                CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
         FROM (SELECT DISTINCT p_name FROM part) a
         JOIN (SELECT DISTINCT p_name FROM part) b
           ON substr(a.p_name, 1, 4) = substr(b.p_name, 1, 4)
          AND a.p_name < b.p_name
         WHERE levenshtein(a.p_name, b.p_name) <= 4
         ORDER BY name1, name2""",
    "dd_incremental" ->
      s"""WITH sh AS (
            SELECT doc_id, $shinglesSql AS s
            FROM (SELECT doc_id, $wordsSql AS w FROM $nearDupCorpusSql t))
          SELECT a.doc_id AS id1, b.doc_id AS id2,
                 round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE (a.doc_id >= 2000000000 OR b.doc_id >= 2000000000)
            AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
          ORDER BY id1, id2""",
    "dd_cluster" ->
      s"""WITH RECURSIVE
            t AS (SELECT doc_id, $wordsSql AS w FROM $nearDupCorpusSql t0),
            sh AS (SELECT doc_id, $shinglesSql AS s FROM t),
            pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2
                   FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                   WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            e AS (SELECT id1 AS src, id2 AS dst FROM pr
                  UNION SELECT id2, id1 FROM pr),
            walk(id, r) AS (
              SELECT src, src FROM e
              UNION
              SELECT w.id, e2.dst FROM walk w JOIN e e2 ON e2.src = w.r)
          SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id,
                 (id = min(r)) AS is_keeper
          FROM walk GROUP BY id ORDER BY doc_id""",
    "dd_corpus_dedup" ->
      s"""WITH RECURSIVE
            c AS (SELECT doc_id, text FROM $nearDupCorpusSql t0),
            t AS (SELECT doc_id, $wordsSql AS w FROM c),
            sh AS (SELECT doc_id, $shinglesSql AS s FROM t),
            pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2
                   FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                   WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            e AS (SELECT id1 AS src, id2 AS dst FROM pr
                  UNION SELECT id2, id1 FROM pr),
            walk(id, r) AS (
              SELECT src, src FROM e
              UNION
              SELECT w.id, e2.dst FROM walk w JOIN e e2 ON e2.src = w.r),
            nonk AS (SELECT id FROM walk GROUP BY id HAVING id <> min(r))
          SELECT doc_id FROM c
          WHERE doc_id NOT IN (SELECT id FROM nonk)
          ORDER BY doc_id""",
    "ann_ivf_trained" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              scored AS (
                SELECT q.vec_id AS q_id, n.vec_id AS n_id,
                       list_cosine_similarity(q.e, n.e) AS s
                FROM v q JOIN v n ON q.vec_id < 5 AND q.vec_id <> n.vec_id),
              ranked AS (
                SELECT q_id, n_id, s,
                       row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rnk
                FROM scored)
         SELECT q_id, CAST(rnk AS INT) AS rnk, n_id, round(s, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk""",
    "ann_filtered_topk" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              scored AS (
                SELECT q.vec_id AS q_id, n.vec_id AS n_id,
                       list_cosine_similarity(q.e, n.e) AS s
                FROM v q JOIN v n ON q.vec_id < 5 AND q.vec_id <> n.vec_id
                WHERE n.label % 2 = 0),
              ranked AS (
                SELECT q_id, n_id, s,
                       row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rnk
                FROM scored)
         SELECT q_id, CAST(rnk AS INT) AS rnk, n_id, round(s, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk""",
    "ann_brute_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              scored AS (
                SELECT q.vec_id AS q_id, n.vec_id AS n_id,
                       list_cosine_similarity(q.e, n.e) AS s
                FROM v q JOIN v n ON q.vec_id < 5 AND q.vec_id <> n.vec_id),
              ranked AS (
                SELECT q_id, n_id, s,
                       row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rnk
                FROM scored)
         SELECT q_id, CAST(rnk AS INT) AS rnk, n_id, round(s, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk""",
    "ann_ivf_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              scored AS (
                SELECT q.vec_id AS q_id, n.vec_id AS n_id,
                       list_cosine_similarity(q.e, n.e) AS s
                FROM v q JOIN v n ON q.vec_id < 5 AND q.vec_id <> n.vec_id),
              ranked AS (
                SELECT q_id, n_id, s,
                       row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rnk
                FROM scored)
         SELECT q_id, CAST(rnk AS INT) AS rnk, n_id, round(s, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk""",
    // Full IVF replay: seed centroids = first 16 vec_ids; cell = argmax
    // cosine vs centroids (cosine of raw vectors ≡ dot of normalized,
    // which is what the Spark side computes); probes = top-4 cells per
    // query; candidates = vectors assigned to probed cells; rank by
    // cosine desc, id tie-break. Same tie-break (cell asc) everywhere.
    "ann_ivf_disk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              cents AS (SELECT vec_id AS cell, e AS cv FROM v ORDER BY vec_id LIMIT 16),
              asg AS (
                SELECT v.vec_id, v.e, c.cell,
                       row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY list_cosine_similarity(v.e, c.cv) DESC, c.cell) AS rk
                FROM v CROSS JOIN cents c),
              a AS (SELECT vec_id, e, cell FROM asg WHERE rk = 1),
              q AS (SELECT vec_id AS q_id, e AS qe FROM a WHERE vec_id < 5),
              pb AS (
                SELECT q.q_id, q.qe, c.cell,
                       row_number() OVER (PARTITION BY q.q_id
                         ORDER BY list_cosine_similarity(q.qe, c.cv) DESC, c.cell) AS prk
                FROM q CROSS JOIN cents c),
              pr AS (SELECT q_id, qe, cell FROM pb WHERE prk <= 4),
              scored AS (
                SELECT pr.q_id, a.vec_id AS n_id,
                       list_cosine_similarity(pr.qe, a.e) AS s
                FROM pr JOIN a ON a.cell = pr.cell
                WHERE a.vec_id <> pr.q_id),
              ranked AS (
                SELECT q_id, n_id, s,
                       row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rnk
                FROM scored)
         SELECT q_id, CAST(rnk AS INT) AS rnk, n_id, round(s, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk""",
    // Candidate rule: same band slice of the sign signature (bucket-hash
    // equality in Spark ⟺ slice equality — xxhash64 only compresses the
    // key); verification = exact cosine, ranked desc with id tie-break.
    // 16 bands × 4 rows over 64 planes, queries vec_id < 5, k = 3 —
    // the declared query's exact parameters.
    "ann_lsh_topk" ->
      s"""WITH m AS (SELECT $lshPlanesSql AS pl),
              v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              nz AS (SELECT vec_id, e FROM v WHERE list_dot_product(e, e) > 0),
              s AS (SELECT vec_id,
                           list_transform(range(1, 65),
                             p -> CASE WHEN list_dot_product(e, pl[CAST(p AS INT)]) >= 0
                                       THEN 1 ELSE 0 END) AS sig
                    FROM nz, m),
              b AS (SELECT vec_id, band,
                           array_to_string(sig[CAST(band*4+1 AS INT) : CAST(band*4+4 AS INT)], ',') AS bkey
                    FROM s, (SELECT unnest(range(0, 16)) AS band) bands),
              cand AS (SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
                       FROM b q JOIN b n ON q.band = n.band AND q.bkey = n.bkey
                       WHERE q.vec_id < 5 AND q.vec_id <> n.vec_id),
              scored AS (SELECT c.q_id, c.n_id, list_cosine_similarity(qv.e, nv.e) AS sim
                         FROM cand c
                         JOIN v qv ON qv.vec_id = c.q_id
                         JOIN v nv ON nv.vec_id = c.n_id),
              ranked AS (SELECT q_id, n_id, sim,
                                row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rnk
                         FROM scored)
         SELECT q_id, CAST(rnk AS INT) AS rnk, n_id, round(sim, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk""",
    // Multi-probe rule: candidate iff SOME band's 4-bit slice differs in
    // ≤ 1 position (probe 0 = exact bucket, probes 1..4 = one flipped
    // bit). Same planes/bands/queries/k as ann_lsh_topk.
    "ann_mplsh_topk" ->
      s"""WITH m AS (SELECT $lshPlanesSql AS pl),
              v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              nz AS (SELECT vec_id, e FROM v WHERE list_dot_product(e, e) > 0),
              s AS (SELECT vec_id,
                           list_transform(range(1, 65),
                             p -> CASE WHEN list_dot_product(e, pl[CAST(p AS INT)]) >= 0
                                       THEN 1 ELSE 0 END) AS sig
                    FROM nz, m),
              b AS (SELECT vec_id, band,
                           sig[CAST(band*4+1 AS INT) : CAST(band*4+4 AS INT)] AS bs
                    FROM s, (SELECT unnest(range(0, 16)) AS band) bands),
              cand AS (SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
                       FROM b q JOIN b n ON q.band = n.band
                       WHERE q.vec_id < 5 AND q.vec_id <> n.vec_id
                         AND len(list_filter(range(1, 5),
                               i -> q.bs[CAST(i AS INT)] <> n.bs[CAST(i AS INT)])) <= 1),
              scored AS (SELECT c.q_id, c.n_id, list_cosine_similarity(qv.e, nv.e) AS sim
                         FROM cand c
                         JOIN v qv ON qv.vec_id = c.q_id
                         JOIN v nv ON nv.vec_id = c.n_id),
              ranked AS (SELECT q_id, n_id, sim,
                                row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rnk
                         FROM scored)
         SELECT q_id, CAST(rnk AS INT) AS rnk, n_id, round(sim, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk""",
    "cos_near_dup" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
                    UNION ALL
                    SELECT vec_id + 1000000000 AS vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings WHERE vec_id % 20 = 0)
         SELECT a.vec_id AS id1, b.vec_id AS id2,
                round(list_cosine_similarity(a.e, b.e), 4) AS sim
         FROM c a JOIN c b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.e, b.e) >= 0.95
         ORDER BY id1, id2""",
    "dd_semantic_dedup" ->
      """WITH RECURSIVE
            c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
                  UNION ALL
                  SELECT vec_id + 1000000000 AS vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings WHERE vec_id % 20 = 0),
            pr AS (SELECT a.vec_id AS id1, b.vec_id AS id2
                   FROM c a JOIN c b ON a.vec_id < b.vec_id
                   WHERE list_cosine_similarity(a.e, b.e) >= 0.95),
            e AS (SELECT id1 AS src, id2 AS dst FROM pr
                  UNION SELECT id2, id1 FROM pr),
            walk(id, r) AS (
              SELECT src, src FROM e
              UNION
              SELECT w.id, e2.dst FROM walk w JOIN e e2 ON e2.src = w.r),
            nonk AS (SELECT id FROM walk GROUP BY id HAVING id <> min(r))
          SELECT vec_id FROM c
          WHERE vec_id NOT IN (SELECT id FROM nonk)
          ORDER BY vec_id""",
    "tx_profile" ->
      s"""SELECT doc_id,
                 CAST(len($wordsSql) AS INT) AS n_words,
                 CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_tokens,
                 round(CAST(len(text) - len(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                       / len(text), 4) AS punct_ratio,
                 round(CAST(len(list_filter($wordsSql,
                         x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                       / len($wordsSql), 4) AS stopword_ratio,
                 CASE WHEN len(list_filter($wordsSql,
                        x -> x IN ('the','a','of','and','to','in','is','it','that','for')))
                      + len(list_filter($wordsSql,
                        x -> x IN ('el','la','de','que','y','en','un','los','se','no')))
                      + len(list_filter($wordsSql,
                        x -> x IN ('der','die','und','das','ist','ein','zu','den','mit','nicht')))
                      + len(list_filter($wordsSql,
                        x -> x IN ('le','la','et','les','des','un','une','du','est','pour'))) = 0 THEN 'und'
                      WHEN len(list_filter($wordsSql,
                        x -> x IN ('the','a','of','and','to','in','is','it','that','for')))
                        >= greatest(
                             len(list_filter($wordsSql, x -> x IN ('el','la','de','que','y','en','un','los','se','no'))),
                             len(list_filter($wordsSql, x -> x IN ('der','die','und','das','ist','ein','zu','den','mit','nicht'))),
                             len(list_filter($wordsSql, x -> x IN ('le','la','et','les','des','un','une','du','est','pour')))) THEN 'en'
                      WHEN len(list_filter($wordsSql, x -> x IN ('el','la','de','que','y','en','un','los','se','no')))
                        >= greatest(
                             len(list_filter($wordsSql, x -> x IN ('der','die','und','das','ist','ein','zu','den','mit','nicht'))),
                             len(list_filter($wordsSql, x -> x IN ('le','la','et','les','des','un','une','du','est','pour')))) THEN 'es'
                      WHEN len(list_filter($wordsSql, x -> x IN ('der','die','und','das','ist','ein','zu','den','mit','nicht')))
                        >= len(list_filter($wordsSql, x -> x IN ('le','la','et','les','des','un','une','du','est','pour'))) THEN 'de'
                      ELSE 'fr' END AS lang_pred
          FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    "cp_corpus_clean" ->
      s"""WITH q AS (SELECT doc_id, text, $qualityScoreRawSql AS qraw,
                 CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_tokens
               FROM documents),
          f AS (SELECT * FROM q WHERE qraw >= 0.4 AND n_tokens BETWEEN 20 AND 2000),
          k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(text))
         SELECT doc_id, n_tokens, floor(qraw * 10000) / 10000 AS quality_score FROM f
         WHERE doc_id IN (SELECT doc_id FROM k)
           AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
         ORDER BY doc_id""",
    "tx_quality" ->
      s"""WITH q AS (
            SELECT doc_id, $qualityScoreSql AS quality_score
            FROM documents)
          SELECT CASE WHEN quality_score >= 0.75 THEN 'high'
                      WHEN quality_score >= 0.5 THEN 'medium'
                      WHEN quality_score >= 0.25 THEN 'low'
                      ELSE 'junk' END AS quality_bucket,
                 CAST(count(*) AS BIGINT) AS n,
                 round(avg(quality_score), 4) AS avg_score
          FROM q GROUP BY 1 ORDER BY 1""",
    "tx_fingerprint" ->
      """SELECT doc_id,
                CAST(list_sum(list_transform(range(1, len(text) + 1),
                       i -> i * ascii(substr(text, CAST(i AS INT), 1)))) % 1000000007 AS BIGINT) AS fingerprint
         FROM documents WHERE doc_id < 200 ORDER BY doc_id""",
    "dd_simhash" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents
                        WHERE doc_id < 1000 AND doc_id % 10 = 5),
              s AS (SELECT doc_id AS orig_id,
                           ${simhashSql("text")} AS orig_sig,
                           ${simhashSql("text || ' zqxmutation'")} AS mut_sig
                    FROM base)
          SELECT orig_id, orig_sig, mut_sig,
                 CAST(bit_count(xor(orig_sig, mut_sig)) AS INT) AS hamming
          FROM s ORDER BY orig_id""",
    // Chunk digests over the near-dup corpus (same CDC replay as
    // g7_cdc_chunk, digest-only), then pairs by shared-digest count.
    // count(DISTINCT digest) ⇔ Spark's one-pair-per-digest emission
    // when a digest repeats inside one document.
    "dd_chunk_overlap" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
              corpus AS (
                SELECT doc_id, text FROM base WHERE doc_id % 2 = 1
                UNION ALL
                SELECT doc_id + 2000000000 AS doc_id, text || ' zqxmutation' AS text
                FROM base WHERE doc_id % 10 = 5),
              t AS (SELECT doc_id, list_filter(str_split_regex(text, '\s+'), x -> len(x) > 0) AS w
                    FROM corpus),
              t2 AS (SELECT doc_id, w, len(w) AS n,
                            list_filter(range(1, len(w) + 1), i ->
                              CAST(concat('0x', substr(md5(w[CAST(i AS INT)]), 1, 15)) AS BIGINT) % 16 = 0) AS b
                     FROM t WHERE len(w) > 0),
              s AS (SELECT doc_id, w, n,
                           list_concat([CAST(1 AS BIGINT)],
                             list_transform(list_filter(b, p -> p < n), p -> p + 1)) AS st,
                           list_concat(list_filter(b, p -> p < n), [n]) AS en
                    FROM t2),
              chunks AS (SELECT doc_id,
                                unnest(list_transform(range(1, len(st) + 1), i ->
                                  md5(array_to_string(
                                    w[CAST(st[CAST(i AS INT)] AS INT):CAST(en[CAST(i AS INT)] AS INT)], ' ')))) AS dig
                         FROM s)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
                CAST(count(DISTINCT a.dig) AS BIGINT) AS shared_chunks
         FROM chunks a JOIN chunks b ON a.dig = b.dig AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(DISTINCT a.dig) >= 3
         ORDER BY id1, id2""",
    // Content-defined chunking replay: same tokenization (no lowering —
    // chunk digests keep case), md5-derived boundary rule, 1-based
    // end-inclusive slices, digests of space-joined token runs.
    "g7_cdc_chunk" ->
      """WITH t AS (SELECT doc_id, list_filter(str_split_regex(text, '\s+'), x -> len(x) > 0) AS w
                    FROM documents WHERE doc_id < 500),
              t2 AS (SELECT doc_id, w, len(w) AS n,
                            list_filter(range(1, len(w) + 1), i ->
                              CAST(concat('0x', substr(md5(w[CAST(i AS INT)]), 1, 15)) AS BIGINT) % 16 = 0) AS b
                     FROM t WHERE len(w) > 0),
              s AS (SELECT doc_id, w, n,
                           list_concat([CAST(1 AS BIGINT)],
                             list_transform(list_filter(b, p -> p < n), p -> p + 1)) AS st,
                           list_concat(list_filter(b, p -> p < n), [n]) AS en
                    FROM t2),
              c AS (SELECT doc_id,
                           unnest(list_transform(range(1, len(st) + 1), i ->
                             {'idx': i - 1,
                              'tok': en[CAST(i AS INT)] - st[CAST(i AS INT)] + 1,
                              'dig': md5(array_to_string(
                                       w[CAST(st[CAST(i AS INT)] AS INT):CAST(en[CAST(i AS INT)] AS INT)], ' '))})) AS u
                    FROM s)
         SELECT doc_id, CAST(u.idx AS INT) AS chunk_idx,
                CAST(u.tok AS INT) AS chunk_tokens, u.dig AS chunk_digest
         FROM c ORDER BY doc_id, chunk_idx""",
    "dd_simhash_band" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
              corpus AS (
                SELECT doc_id, text FROM base WHERE doc_id % 2 = 1
                UNION ALL
                SELECT doc_id + 2000000000 AS doc_id, text || ' zqxmutation' AS text
                FROM base WHERE doc_id % 10 = 5),
              s AS (SELECT doc_id, ${simhashSql("text")} AS sig FROM corpus),
              p AS (
                SELECT a.doc_id AS id1, b.doc_id AS id2,
                       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
                FROM s a JOIN s b ON a.doc_id < b.doc_id
                WHERE ((a.sig >> 0) & 4095) = ((b.sig >> 0) & 4095)
                   OR ((a.sig >> 12) & 4095) = ((b.sig >> 12) & 4095)
                   OR ((a.sig >> 24) & 4095) = ((b.sig >> 24) & 4095)
                   OR ((a.sig >> 36) & 4095) = ((b.sig >> 36) & 4095))
          SELECT id1, id2, hamming FROM p WHERE hamming <= 6
          ORDER BY id1, id2""",
    "dd_simhash_md5" ->
      s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents WHERE doc_id < 100),
               h AS (SELECT doc_id, list_transform(w,
                       x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)) AS hs FROM t)
          SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 48), j ->
                   CASE WHEN list_sum(list_transform(hs,
                          h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                        THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
          FROM h ORDER BY doc_id""",
    "tx_token_hist" ->
      """WITH t AS (
           SELECT len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS tok
           FROM documents)
         SELECT CAST(FLOOR(tok / 20) * 20 AS INT) AS bucket_lo,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS total_tokens
         FROM t GROUP BY 1 ORDER BY 1""",
    "ann_ivfpq_recall" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              scored AS (
                SELECT q.vec_id AS q_id, n.vec_id AS n_id,
                       list_cosine_similarity(q.e, n.e) AS s
                FROM v q JOIN v n ON q.vec_id < 5 AND q.vec_id <> n.vec_id),
              ranked AS (
                SELECT q_id, n_id,
                       row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rnk
                FROM scored)
         SELECT q_id, n_id AS top1_id, CAST(1 AS INT) AS in_ivfpq_top10
         FROM ranked WHERE rnk = 1 ORDER BY q_id""",
    "eq_pq_recall" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              scored AS (
                SELECT q.vec_id AS q_id, n.vec_id AS n_id,
                       list_cosine_similarity(q.e, n.e) AS s
                FROM v q JOIN v n ON q.vec_id < 5 AND q.vec_id <> n.vec_id),
              ranked AS (
                SELECT q_id, n_id,
                       row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rnk
                FROM scored)
         SELECT q_id, n_id AS top1_id, CAST(1 AS INT) AS in_pq_top10
         FROM ranked WHERE rnk = 1 ORDER BY q_id""",
    "tx_tfidf" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
         tf AS (
           SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
         dfq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS nd FROM documents)
         SELECT doc_id, term, tf,
                round(tf * ln(CAST(nd AS DOUBLE) / dfc), 4) AS tfidf
         FROM tf JOIN dfq USING (term) CROSS JOIN n
         WHERE doc_id < 30 ORDER BY doc_id, term""",
    "tx_bigram_lm" ->
      """WITH toks AS (
           SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         bi AS (
           SELECT doc_id, unnest(list_transform(range(1, len(t)),
                    i -> {'w': t[i], 'w2': t[i + 1]})) AS b
           FROM toks),
         bi2 AS (SELECT doc_id, b.w AS w, b.w2 AS w2 FROM bi),
         uni AS (
           SELECT w, count(*) AS c1
           FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
           GROUP BY 1),
         big AS (SELECT w, w2, count(*) AS c12 FROM bi2 GROUP BY 1, 2),
         v AS (SELECT count(*) AS vsize FROM uni)
         SELECT doc_id,
                round(avg(ln((c12 + 1.0) / (c1 + vsize))), 4) AS avg_logp,
                CAST(count(*) AS BIGINT) AS n_bigrams
         FROM bi2 JOIN big USING (w, w2) JOIN uni USING (w) CROSS JOIN v
         GROUP BY doc_id ORDER BY doc_id""",
    "tx_ppl_buckets" ->
      """WITH toks AS (
           SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         bi AS (
           SELECT doc_id, unnest(list_transform(range(1, len(t)),
                    i -> {'w': t[i], 'w2': t[i + 1]})) AS b
           FROM toks),
         bi2 AS (SELECT doc_id, b.w AS w, b.w2 AS w2 FROM bi),
         uni AS (
           SELECT w, count(*) AS c1
           FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
           GROUP BY 1),
         big AS (SELECT w, w2, count(*) AS c12 FROM bi2 GROUP BY 1, 2),
         v AS (SELECT count(*) AS vsize FROM uni),
         scored AS (
           SELECT doc_id, round(avg(ln((c12 + 1.0) / (c1 + vsize))), 4) AS avg_logp
           FROM bi2 JOIN big USING (w, w2) JOIN uni USING (w) CROSS JOIN v
           GROUP BY doc_id),
         s4 AS (SELECT doc_id, avg_logp,
                       CAST(round(avg_logp * 10000) AS BIGINT) AS s4
                FROM scored),
         b AS (SELECT quantile_cont(s4, [1.0/3, 2.0/3]) AS qb FROM s4)
         SELECT doc_id, avg_logp,
                CASE WHEN s4 <= qb[1] THEN 'tail'
                     WHEN s4 <= qb[2] THEN 'middle'
                     ELSE 'head' END AS ppl_bucket
         FROM s4 CROSS JOIN b
         ORDER BY doc_id""",
    "eq_quantize" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings WHERE vec_id < 200),
              s AS (SELECT vec_id, e,
                           greatest(list_max(list_transform(e, x -> abs(x))), 1e-12) / 127.0 AS scale
                    FROM v),
              q AS (SELECT vec_id, e, scale,
                           list_transform(e, x -> CAST(round(x / scale) AS INT)) AS qv
                    FROM s)
         SELECT vec_id,
                round(scale, 6) AS scale,
                round(list_max(list_transform(range(1, len(e) + 1),
                        i -> abs(e[i] - qv[i] * scale))), 6) AS max_err
         FROM q ORDER BY vec_id""",
    "tx_redact" ->
      s"""WITH t AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com from 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
                        || ' call +1 555 0100' AS txt
            FROM documents WHERE doc_id < 100)
          SELECT doc_id,
                 CAST(len(regexp_extract_all(txt, '${Redaction.EmailPattern}')) AS INT) AS n_emails,
                 CAST(len(regexp_extract_all(txt, '${Redaction.Ipv4Pattern}')) AS INT) AS n_ips,
                 CAST(len(regexp_extract_all(txt, '${Redaction.PhonePattern}')) AS INT) AS n_phones,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(txt, '${Redaction.EmailPattern}', '[EMAIL]', 'g'),
                     '${Redaction.Ipv4Pattern}', '[IP]', 'g'),
                   '${Redaction.PhonePattern}', '[PHONE]', 'g') AS redacted
          FROM t ORDER BY doc_id""",
    "tx_repetition" ->
      s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents WHERE doc_id < 100),
               g AS (SELECT doc_id, w,
                            list_transform(range(1, greatest(len(w) - 1, 1) + 1),
                              i -> concat_ws(' ', w[i], w[i+1])) AS bg
                     FROM t)
          SELECT doc_id,
                 round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS word_rep,
                 round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 4) AS bigram_rep
          FROM g ORDER BY doc_id""",
    "f18_sql_native" ->
      s"""SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT)
                   AS n_tokens,
                 CAST(len((SELECT $shinglesSql FROM (SELECT $wordsSql AS w))) AS INT)
                   AS n_shingles,
                 32.0 AS dot
          FROM documents WHERE doc_id < 50 ORDER BY doc_id""",
    "sm_upsample" ->
      """WITH t AS (
           SELECT doc_id, (doc_id % 3) + 0.5 AS w,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                    / 65536.0 AS h
           FROM documents),
         n AS (SELECT doc_id,
                      CAST(floor(w) AS BIGINT)
                        + CASE WHEN h < w - floor(w) THEN 1 ELSE 0 END AS n
               FROM t)
         SELECT doc_id, CAST(u.x AS BIGINT) AS copy_n
         FROM n, unnest(list_transform(range(1, CAST(n.n AS INT) + 1), y -> y)) AS u(x)
         WHERE n.n > 0 ORDER BY doc_id, copy_n""",
    "sm_mixture" ->
      """WITH t AS (
           SELECT doc_id,
                  CASE WHEN n_chars >= 400 THEN 'long'
                       WHEN n_chars >= 150 THEN 'mid'
                       ELSE 'short' END AS stratum,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                    / 65536.0 AS h
           FROM documents),
         r AS (SELECT doc_id, stratum,
                      row_number() OVER (PARTITION BY stratum
                                         ORDER BY h, CAST(doc_id AS VARCHAR)) AS rk
               FROM t)
         SELECT doc_id, stratum FROM r
         WHERE (stratum = 'long' AND rk <= 40)
            OR (stratum = 'mid' AND rk <= 25)
            OR (stratum = 'short' AND rk <= 10)
         ORDER BY doc_id""",
    "sm_weighted" ->
      """SELECT doc_id, n_chars FROM documents
         WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) / 65536.0
               < least(n_chars / 400.0, 1.0)
         ORDER BY doc_id""",
    "sm_stratified" ->
      """WITH t AS (
           SELECT doc_id,
                  CASE WHEN len(text) >= 400 THEN 'long'
                       WHEN len(text) >= 150 THEN 'mid'
                       ELSE 'short' END AS stratum
           FROM documents)
         SELECT doc_id, stratum FROM t
         WHERE (stratum = 'long')
            OR (stratum = 'mid' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
            OR (stratum = 'short' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '2000')
         ORDER BY doc_id""",
    "ct_ngram_overlap" ->
      s"""WITH cw AS (SELECT doc_id, $wordsSql AS w FROM documents WHERE doc_id < 300),
               c AS (SELECT doc_id, $shinglesSql AS s FROM cw),
               e AS (SELECT doc_id, unnest(s) AS sh FROM c),
               bw AS (SELECT $wordsSql AS w FROM documents WHERE doc_id % 50 = 0),
               b AS (SELECT DISTINCT unnest($shinglesSql) AS sh FROM bw),
               h AS (SELECT e.doc_id, count(*) AS n_hit FROM e JOIN b USING (sh) GROUP BY e.doc_id)
          SELECT c.doc_id AS doc_id,
                 CAST(len(c.s) AS INT) AS n_shingles,
                 CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_contaminated,
                 round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / len(c.s), 4) AS overlap_ratio
          FROM c LEFT JOIN h ON c.doc_id = h.doc_id
          ORDER BY c.doc_id""",
    "ct_bloom_decontam" ->
      s"""WITH cw AS (SELECT doc_id, $wordsSql AS w FROM documents WHERE doc_id % 97 <> 13),
               c AS (SELECT doc_id, $shinglesSql AS s FROM cw),
               e AS (SELECT doc_id, unnest(s) AS sh FROM c),
               bw AS (SELECT $wordsSql AS w FROM documents WHERE doc_id % 97 = 13),
               b AS (SELECT DISTINCT unnest($shinglesSql) AS sh FROM bw),
               h AS (SELECT e.doc_id, count(*) AS n_hit FROM e JOIN b USING (sh) GROUP BY e.doc_id)
          SELECT c.doc_id AS doc_id,
                 CAST(len(c.s) AS INT) AS n_shingles,
                 CAST(h.n_hit AS BIGINT) AS n_contaminated,
                 round(CAST(h.n_hit AS DOUBLE) / len(c.s), 4) AS overlap_ratio
          FROM c JOIN h ON c.doc_id = h.doc_id
          ORDER BY c.doc_id""",
    "tx_langid_trained" ->
      s"""WITH toks AS (SELECT lang, unnest($wordsSql) AS word FROM documents),
               tf AS (SELECT lang, word, count(*) AS tf FROM toks GROUP BY 1, 2),
               tot AS (SELECT lang, sum(tf) AS n_lang FROM tf GROUP BY 1),
               model AS (SELECT word, tf.lang, (tf * 1000000000) // n_lang AS w_scaled
                         FROM tf JOIN tot USING (lang)),
               dt AS (SELECT doc_id, lang AS lang_true, unnest($wordsSql) AS word
                      FROM documents WHERE doc_id < 300),
               sc AS (SELECT doc_id, lang_true, m.lang AS lang,
                             CAST(sum(w_scaled) AS BIGINT) AS score
                      FROM dt JOIN model m USING (word) GROUP BY 1, 2, 3),
               r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                                  ORDER BY score DESC, lang) AS rn FROM sc)
          SELECT doc_id, lang_true, lang AS pred_lang, score
          FROM r WHERE rn = 1 ORDER BY doc_id""",
    "tx_gopher_rules" ->
      s"""WITH t AS (SELECT doc_id, text, $wordsSql AS w,
                            str_split(text, chr(10)) AS ls
                     FROM documents WHERE doc_id < 300),
              m AS (SELECT doc_id,
                           CAST(len(w) AS INT) AS n_words,
                           CASE WHEN len(w) > 0
                                THEN CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w)
                                ELSE 0.0 END AS mean_word_len,
                           CASE WHEN len(w) > 0
                                THEN CAST((len(text) - len(replace(text, '#', '')))
                                     + CAST(floor((len(text) - len(replace(text, '...', ''))) / 3.0) AS INT)
                                     AS DOUBLE) / len(w)
                                ELSE 0.0 END AS symbol_ratio,
                           CASE WHEN len(w) > 0
                                THEN CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w)
                                ELSE 0.0 END AS frac_alpha_words,
                           CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                                s -> list_contains(w, s))) AS INT) AS n_required_stopwords,
                           CAST(len(list_filter(ls, l -> starts_with(ltrim(l), '- ')
                                OR starts_with(ltrim(l), '* ')
                                OR starts_with(ltrim(l), '•'))) AS DOUBLE) / len(ls) AS bullet_line_frac,
                           CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...'))) AS DOUBLE)
                             / len(ls) AS ellipsis_line_frac
                    FROM t)
         SELECT doc_id, n_words, mean_word_len, symbol_ratio, frac_alpha_words,
                n_required_stopwords, bullet_line_frac, ellipsis_line_frac,
                (n_words BETWEEN 50 AND 100000) AS r_word_count,
                (mean_word_len BETWEEN 3.0 AND 10.0) AS r_mean_word_len,
                (symbol_ratio < 0.1) AS r_symbol_ratio,
                (bullet_line_frac < 0.9) AS r_bullet_lines,
                (ellipsis_line_frac < 0.3) AS r_ellipsis_lines,
                (frac_alpha_words >= 0.8) AS r_alpha_words,
                (n_required_stopwords >= 2) AS r_stop_words,
                ((n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
                 AND (symbol_ratio < 0.1) AND (bullet_line_frac < 0.9)
                 AND (ellipsis_line_frac < 0.3) AND (frac_alpha_words >= 0.8)
                 AND (n_required_stopwords >= 2)) AS keep
         FROM m ORDER BY doc_id""",
    "mm_features" ->
      """WITH b AS (
           SELECT doc_id,
                  len(text) AS n,
                  list_transform(range(1, len(text) + 1),
                    i -> ascii(substr(text, CAST(i AS INT), 1))) AS bytes
           FROM documents WHERE doc_id < 50
         )
         SELECT CAST(doc_id AS BIGINT) AS media_id,
                CAST(n AS BIGINT) AS n_bytes,
                CASE WHEN n = 0 THEN 0.0
                     ELSE round(CAST(list_sum(bytes) AS DOUBLE) / n, 4) END AS byte_mean,
                CASE WHEN n = 0 THEN 0.0
                     ELSE round(CAST(list_sum(list_transform(bytes, x -> x * x)) AS DOUBLE) / n
                                - (CAST(list_sum(bytes) AS DOUBLE) / n)
                                  * (CAST(list_sum(bytes) AS DOUBLE) / n), 4) END AS byte_var
         FROM b ORDER BY media_id""",
    "mm_audio" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 50),
         s AS (SELECT doc_id,
                 list_transform(range(0, 800 + (doc_id % 5) * 200),
                                i -> (doc_id * 31 + i * 17) % 2001 - 1000) AS smp
               FROM d),
         m AS (SELECT doc_id, len(smp) AS n,
                 list_sum(smp) AS ssum,
                 list_sum(list_transform(smp, x -> x * x)) AS ssq,
                 list_max(list_transform(smp, x -> abs(x))) AS pk,
                 list_sum(list_transform(range(2, len(smp) + 1),
                   j -> CASE WHEN (smp[j] < 0) <> (smp[j - 1] < 0)
                        THEN 1 ELSE 0 END)) AS zc
               FROM s)
         SELECT CAST(doc_id AS BIGINT) AS media_id,
                CAST(8000 AS INT) AS sample_rate,
                CAST(1 AS INT) AS channels,
                CAST(n AS BIGINT) AS n_frames,
                round(n / 8000.0, 6) AS duration_s,
                round(pk / 32768.0, 6) AS peak,
                round(sqrt(CAST(ssq AS DOUBLE) / n) / 32768.0, 6) AS rms,
                round((CAST(ssum AS DOUBLE) / n) / 32768.0, 6) AS mean,
                round(CAST(zc AS DOUBLE) / (n - 1), 6) AS zcr
         FROM m ORDER BY media_id""",
    "mm_resize" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id, 'fake/utf8;resized/4' AS media_type,
                CAST((len(text) + 3) // 4 AS BIGINT) AS n_bytes_resized,
                md5(array_to_string(list_transform(range(1, len(text) + 1, 4),
                      i -> substr(text, CAST(i AS INT), 1)), '')) AS digest
         FROM documents WHERE doc_id < 100 ORDER BY media_id""",
    "mm_frames" ->
      """WITH m AS (SELECT doc_id AS media_id, doc_id % 3 + 2 AS nf
                    FROM documents WHERE doc_id < 40),
              f AS (SELECT media_id, nf, unnest(range(0, nf)) AS fi FROM m)
         SELECT media_id, CAST(fi AS INT) AS frame_idx,
                8 AS width, 8 AS height,
                CAST((media_id * 31 + fi * 17) % 256 AS DOUBLE) AS gray_mean,
                CAST(nf AS INT) AS n_frames
         FROM f WHERE fi % 2 = 0
         ORDER BY media_id, frame_idx""",
    "mm_binary_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id, 'fake/utf8' AS media_type,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS digest,
                CAST(((greatest(octet_length(encode(text)) - 63, 1) - 1) // 32) + 1 AS BIGINT) AS n_frames
         FROM documents WHERE doc_id < 100 ORDER BY media_id"""
  )

  val queries: Map[String, Q] = Map(
    "dd_exact" -> ddExact,
    "dd_minhash_lsh" -> ddMinhashLsh,
    "dd_neardup_jaccard" -> ddNearDupJaccard,
    "dd_ssjoin_prefix" -> ddSsjoinPrefix,
    "dd_incremental" -> ddIncremental,
    "dd_editdist" -> ddEditDist,
    "dd_cluster" -> ddCluster,
    "dd_corpus_dedup" -> ddCorpusDedup,
    "cp_corpus_clean" -> cpCorpusClean,
    "dd_simhash" -> ddSimhash,
    "dd_simhash_band" -> ddSimhashBand,
    "g7_cdc_chunk" -> g7CdcChunk,
    "dd_chunk_overlap" -> ddChunkOverlap,
    "ann_brute_topk" -> annBruteTopK,
    "ann_ivf_topk" -> annIvfTopK,
    "ann_ivf_trained" -> annIvfTrained,
    "ann_ivf_disk" -> annIvfDisk,
    "ann_lsh_topk" -> annLshTopK,
    "ann_mplsh_topk" -> annMplshTopK,
    "cos_near_dup" -> cosNearDup,
    "dd_semantic_dedup" -> ddSemanticDedup,
    "tx_profile" -> txProfile,
    "tx_quality" -> txQuality,
    "tx_fingerprint" -> txFingerprint,
    "tx_redact" -> txRedact,
    "tx_repetition" -> txRepetition,
    "tx_token_hist" -> txTokenHist,
    "dd_simhash_md5" -> ddSimhashMd5,
    "sm_stratified" -> smStratified,
    "sm_weighted" -> smWeighted,
    "sm_upsample" -> smUpsample,
    "f18_sql_native" -> f18SqlNative,
    "sm_mixture" -> smMixture,
    "ct_ngram_overlap" -> ctNgramOverlap,
    "ct_bloom_decontam" -> ctBloomDecontam,
    "tx_gopher_rules" -> txGopherRules,
    "dd_substring_spans" -> ddSubstringSpans,
    "sm_dsir" -> smDsir,
    "tx_c4_rules" -> txC4Rules,
    "ann_filtered_topk" -> annFilteredTopK,
    "tx_langid_trained" -> txLangidTrained,
    "eq_quantize" -> eqQuantize,
    "tx_bigram_lm" -> txBigramLm,
    "tx_ppl_buckets" -> txPplBuckets,
    "tx_tfidf" -> txTfidf,
    "eq_pq_recall" -> eqPqRecall,
    "ann_ivfpq_recall" -> annIvfPqRecall,
    "mm_binary_meta" -> mmBinaryMeta,
    "mm_resize" -> mmResize,
    "mm_features" -> mmFeatures,
    "mm_audio" -> mmAudio,
    "mm_frames" -> mmFrames
  )
}
