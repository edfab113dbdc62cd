package graft.queries

import graft.ops.{Packing, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-construction queries (round 7): BM25 retrieval scoring,
  * sliding-window chunking, greedy sequence packing — the
  * example-construction stages of an LLM training-data pipeline, each
  * with a full DuckDB oracle (packing replays the greedy recurrence as
  * a recursive CTE).
  */
object CorpusQueries {

  type Q = (SparkSession, String) => DataFrame

  /** TX: Okapi BM25 ([[graft.ops.TextAnalysis.bm25]]) — model statistics
    * (df, dl, avgdl, N) over the FULL corpus, output restricted to
    * doc_id < 30 for the oracle. */
  val txBm25: Q = (s, d) =>
    TextAnalysis.bm25(Tables.documents(s, d), "doc_id", "text")
      .filter(col("doc_id") < 30)
      .orderBy(col("doc_id"), col("term"))

  /** G6: sliding-window chunking ([[graft.ops.TextAnalysis.chunk]]),
    * 32-token windows advancing 24 (8-token overlap). Narrow generator
    * — chunks come from each row's own token array. */
  val g6Chunk: Q = (s, d) =>
    TextAnalysis.chunk(
      Tables.documents(s, d).filter(col("doc_id") < 50), "doc_id", "text",
      size = 32, stride = 24)
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** CP: greedy sequence packing ([[graft.ops.Packing.packGreedy]]) —
    * documents packed into 128-token bins per source in doc_id order.
    * The oracle replays the greedy recurrence as a recursive CTE; the
    * engine's mapPartitions form must agree bin-for-bin. */
  val cpPack: Q = (s, d) =>
    Packing.packGreedy(
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").alias("n_tokens")),
      groupCol = "source", idCol = "doc_id", lenCol = "n_tokens", budget = 128L)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("bin_id"), col("bin_fill"))
      .orderBy(col("source"), col("doc_id"))

  val oracles: Map[String, String] = Map(
    "tx_bm25" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
         tf AS (
           SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
         dfq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
         sc AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                       CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl)
         SELECT doc_id, term, tf,
                round(ln(1 + (n - dfc + 0.5) / (dfc + 0.5)) *
                      tf * (1.2 + 1.0) /
                      (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 4) AS bm25
         FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN sc
         WHERE doc_id < 30 ORDER BY doc_id, term""",
    "g6_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
                    FROM documents WHERE doc_id < 50),
              c AS (SELECT doc_id,
                           unnest(list_transform(
                             range(0, 1 + CAST(ceil(greatest(len(tk) - 32, 0) / 24.0) AS BIGINT)),
                             i -> {'idx': i, 'ch': tk[i * 24 + 1 : i * 24 + 32]})) AS u
                    FROM t)
         SELECT doc_id, CAST(u.idx AS INT) AS chunk_idx,
                CAST(len(u.ch) AS INT) AS chunk_tokens,
                array_to_string(u.ch, ' ') AS chunk_text
         FROM c ORDER BY doc_id, chunk_idx""",
    "cp_pack" ->
      """WITH RECURSIVE d AS (
           SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           FROM documents),
         p AS (
           SELECT source, doc_id, n_tokens, rn,
                  CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.source, d.doc_id, d.n_tokens, d.rn,
                  CASE WHEN p.bin_fill + d.n_tokens > 128 THEN p.bin_id + 1
                       ELSE p.bin_id END,
                  CASE WHEN p.bin_fill + d.n_tokens > 128 THEN d.n_tokens
                       ELSE p.bin_fill + d.n_tokens END
           FROM d JOIN p ON d.source = p.source AND d.rn = p.rn + 1)
         SELECT source, doc_id, n_tokens, bin_id, bin_fill
         FROM p ORDER BY source, doc_id""",
    "cp_shard" ->
      """WITH h AS (
           SELECT doc_id,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hh
           FROM documents)
         SELECT doc_id, CAST(hh % 8 AS INT) AS shard,
                CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS INT) AS pos
         FROM h ORDER BY shard, pos""",
    "tx_encode" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
                  unnest(range(1, len(string_split(lower(text), ' ')) + 1)) AS pos
           FROM documents),
         ag AS (
           SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
           FROM toks GROUP BY 1),
         top AS (SELECT * FROM ag ORDER BY tf DESC, term LIMIT 200),
         vocab AS (
           SELECT CAST(row_number() OVER (ORDER BY tf DESC, term) AS INT) AS term_id, term
           FROM top)
         SELECT t.doc_id,
                CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(count(*) FILTER (WHERE v.term_id IS NULL) AS BIGINT) AS n_oov,
                round(CAST(count(*) FILTER (WHERE v.term_id IS NULL) AS DOUBLE)
                      / count(*), 4) AS oov_rate,
                md5(string_agg(CAST(coalesce(v.term_id, 0) AS VARCHAR), ','
                    ORDER BY t.pos)) AS ids_md5
         FROM toks t LEFT JOIN vocab v USING (term)
         GROUP BY t.doc_id
         ORDER BY doc_id""",
    "tx_vocab" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
         ag AS (
           SELECT term, CAST(count(*) AS BIGINT) AS tf,
                  CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM toks GROUP BY 1),
         top AS (SELECT * FROM ag ORDER BY tf DESC, term LIMIT 200)
         SELECT CAST(row_number() OVER (ORDER BY tf DESC, term) AS INT) AS term_id,
                term, tf, df
         FROM top ORDER BY term_id"""
  )

  /** CP: deterministic corpus shuffle + shard
    * ([[graft.ops.Sampling.shuffleShards]]) — hash-bucket shards with
    * in-shard pseudo-random positions; one exchange, no global sort. */
  val cpShard: Q = (s, d) =>
    graft.ops.Sampling.shuffleShards(
      Tables.documents(s, d).select(col("doc_id")), col("doc_id"), 8)
      .orderBy(col("shard"), col("pos"))

  /** TX: exact top-200 vocabulary with dense ids
    * ([[graft.ops.TextAnalysis.vocabulary]]). */
  val txVocab: Q = (s, d) =>
    TextAnalysis.vocabulary(Tables.documents(s, d), "doc_id", "text", 200)
      .orderBy(col("term_id"))

  /** TX: encode the corpus against its own induced top-200 vocabulary
    * ([[graft.ops.TextAnalysis.encodeWithVocab]]) — order-preserving
    * token-id sequences (digested for compare) + per-doc OOV rate. */
  val txEncode: Q = (s, d) =>
    TextAnalysis.encodeWithVocab(Tables.documents(s, d), "doc_id", "text", 200)
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("oov_rate"), 4).alias("oov_rate"),
        md5(concat_ws(",", col("token_ids"))).alias("ids_md5"))
      .orderBy(col("doc_id"))

  val queries: Map[String, Q] = Map(
    "tx_bm25" -> txBm25,
    "g6_chunk" -> g6Chunk,
    "cp_pack" -> cpPack,
    "cp_shard" -> cpShard,
    "tx_vocab" -> txVocab,
    "tx_encode" -> txEncode
  )
}
