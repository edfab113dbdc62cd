package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the step the rest of the text layer presupposes: [[TextAnalysis
  * .vocabulary]] induces a word vocab and [[TextAnalysis.encodeWithVocab]]
  * applies one; this learns the subword merge table itself.
  *
  * Scale shape (the part that matters at 100 TB): BPE training never
  * iterates over the corpus. ONE corpus-sized aggregate builds the
  * (word, freq) table — vocab-sized, millions of rows at web scale —
  * and every merge iteration runs on that table alone: an adjacent-pair
  * count (one partial-aggregable groupBy on a vocab-sized frame), a
  * 1-row argmax action to pick the merge (bounded driver state, the
  * same contract as the k-means centroid collects in [[Ivf]]), and a
  * narrow greedy-merge rewrite of each word's symbol array. Lineage is
  * truncated per round exactly like [[Graph]]'s iterations.
  *
  * ENCODING a document is then a vocab-sized broadcast join, not a
  * per-doc merge loop: training already produced the final segmentation
  * of every trained word, so [[bpeEncode]] tokenizes, joins word →
  * subword segments, and restores order — the per-document work is
  * narrow and the merge table never re-executes. Out-of-vocabulary
  * words fall back to character symbols (merge replay without the
  * learned table would not be deterministic against a different corpus
  * slice anyway).
  *
  * Merge selection is deterministic: max count, ties broken by
  * lexicographic (left, right) — the property the golden test pins. */
object Bpe {

  /** One learned merge: rank k merged (left, right) occurring
    * `count`-weighted times at selection. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  private def charSymbols(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1)))

  /** Greedy left-to-right single-pass merge of adjacent (l, r) in a
    * symbol array — the standard BPE application order. Expressed as a
    * higher-order fold (no UDF): the accumulator carries the rebuilt
    * array and a skip flag for the consumed right symbol. */
  private[ops] def mergePair(sym: Column, l: String, r: String): Column =
    aggregate(
      sequence(lit(1), size(sym)),
      struct(
        array().cast("array<string>").alias("out"),
        lit(false).alias("skip")),
      (acc, i) => {
        val cur = element_at(sym, i)
        val nxt = try_element_at(sym, i + lit(1)) // null past the end
        when(acc("skip"),
          struct(acc("out").alias("out"), lit(false).alias("skip")))
          .when(cur === l && nxt === r,
            struct(concat(acc("out"), array(lit(l + r))).alias("out"), lit(true).alias("skip")))
          .otherwise(
            struct(concat(acc("out"), array(cur)).alias("out"), lit(false).alias("skip")))
      },
      acc => acc("out"))

  /** Train `numMerges` BPE merges over the corpus. Returns the ordered
    * merge table and the trained word → subword-segments frame (the
    * broadcast side of [[bpeEncode]]). Stops early when no adjacent
    * pair remains with count ≥ `minCount`. */
  def bpeTrain(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L): (Seq[Merge], DataFrame) = {
    val wordFreq = docs
      .select(explode(Dedup.wordTokens(col(textCol))).alias("word"))
      .groupBy(col("word")).agg(count(lit(1)).alias("freq"))

    var syms = wordFreq
      .select(col("word"), col("freq"), charSymbols(col("word")).alias("sym"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]

    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val top = syms
        // guard: sequence(1, 0) is DESCENDING in Spark, so single-symbol
        // words must short-circuit to an empty pair list
        .select(col("freq"), explode(
          when(size(col("sym")) > 1,
            transform(sequence(lit(1), size(col("sym")) - 1), i =>
              struct(
                element_at(col("sym"), i).alias("l"),
                element_at(col("sym"), i + lit(1)).alias("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>"))).alias("p"))
        .groupBy(col("p.l").alias("l"), col("p.r").alias("r"))
        .agg(sum(col("freq")).alias("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty || top.head.getAs[Long]("cnt") < minCount) done = true
      else {
        val (l, r, c) = (top.head.getAs[String]("l"), top.head.getAs[String]("r"), top.head.getAs[Long]("cnt"))
        merges += Merge(k, l, r, c)
        val prev = syms
        syms = syms
          .withColumn("sym", when(array_contains(col("sym"), l), mergePair(col("sym"), l, r))
            .otherwise(col("sym"))) // cheap guard: most words don't contain l at all
          .localCheckpoint(true)
        prev.unpersist()
        k += 1
      }
    }
    (merges.toSeq, syms.select(col("word"), col("sym").alias("segments")))
  }

  /** Encode documents with a trained segmentation: tokenize, broadcast
    * join word → segments (OOV words fall back to character symbols),
    * restore token order per document, flatten. One doc-keyed regroup
    * is the only shuffle; the merge table never re-executes. */
  def bpeEncode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      segments: DataFrame): DataFrame = {
    val toks = docs.select(
      col(idCol).alias("doc_id"),
      posexplode(Dedup.wordTokens(col(textCol))).as(Seq("pos", "word")))
    toks
      .join(broadcast(segments), Seq("word"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("segments"), charSymbols(col("word"))).alias("toks"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("toks")))).alias("ordered"))
      .select(col("doc_id"),
        flatten(transform(col("ordered"), o => o("toks"))).alias("tokens"))
  }
}
