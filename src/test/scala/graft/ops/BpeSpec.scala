package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** BPE merge training: the canonical Sennrich worked example, greedy
  * application semantics, and encode-by-join with OOV fallback. */
class BpeSpec extends SparkSuite {

  import spark.implicits._

  /** The Sennrich et al. (2016) example vocabulary, expanded to raw
    * text so training sees the standard frequencies:
    * low×5, lower×2, newest×6, widest×3. */
  private def sennrichCorpus = Seq(
    (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
  ).toDF("doc_id", "text")

  test("bpeTrain reproduces the canonical merges with deterministic tie-breaks") {
    val (merges, segments) = Bpe.bpeTrain(sennrichCorpus, "doc_id", "text", numMerges = 4)
    // pair counts at round 0: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, (w,e)=8, ...
    // ties resolve lexicographically: (e,s) before (s,t), (l,o) before (o,w)
    assert(merges.map(m => (m.left, m.right, m.count)) === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
    val seg = segments.collect()
      .map(r => r.getAs[String]("word") -> r.getSeq[String](r.fieldIndex("segments"))).toMap
    assert(seg("low") === Seq("low"))
    assert(seg("lower") === Seq("low", "e", "r"))
    assert(seg("newest") === Seq("n", "e", "w", "est"))
    assert(seg("widest") === Seq("w", "i", "d", "est"))
  }

  test("mergePair is greedy left-to-right: overlapping runs merge non-overlapping") {
    val got = Seq(Tuple1(Seq("a", "a", "a", "a", "a")))
      .toDF("sym")
      .select(Bpe.mergePair(col("sym"), "a", "a").alias("m"))
      .head().getSeq[String](0)
    assert(got === Seq("aa", "aa", "a"))
    // adjacent different pairs: every occurrence merges
    val got2 = Seq(Tuple1(Seq("l", "r", "l", "r")))
      .toDF("sym")
      .select(Bpe.mergePair(col("sym"), "l", "r").alias("m"))
      .head().getSeq[String](0)
    assert(got2 === Seq("lr", "lr"))
  }

  test("bpeEncode joins trained segments in order; OOV words fall back to characters") {
    val (_, segments) = Bpe.bpeTrain(sennrichCorpus, "doc_id", "text", numMerges = 4)
    val docs = Seq((10L, "newest low zap")).toDF("doc_id", "text")
    val got = Bpe.bpeEncode(docs, "doc_id", "text", segments)
      .head().getSeq[String](1)
    assert(got === Seq("n", "e", "w", "est", "low", "z", "a", "p"))
  }

  test("merge count is monotone non-increasing in symbols: each round strictly shrinks total symbols") {
    val (merges, segments) = Bpe.bpeTrain(sennrichCorpus, "doc_id", "text", numMerges = 10)
    // every selected merge had count >= minCount and ranks are dense
    assert(merges.map(_.rank) === merges.indices.toSeq)
    assert(merges.forall(_.count >= 2L))
    // segmentation round-trips: concatenating segments restores the word
    segments.collect().foreach { r =>
      assert(r.getSeq[String](r.fieldIndex("segments")).mkString === r.getAs[String]("word"))
    }
  }
}
