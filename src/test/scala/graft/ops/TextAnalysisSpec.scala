package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSuite {

  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.alias("v")).head().get(0)

  test("tokenCount: letter runs, digit runs, punctuation marks") {
    assert(one(TextAnalysis.tokenCount(col("text")), "ab c1 d!") === 5) // ab, c, 1, d, !
    assert(one(TextAnalysis.tokenCount(col("text")), "hello world") === 2)
    assert(one(TextAnalysis.tokenCount(col("text")), "x2.5") === 4) // x, 2, ., 5
  }

  test("native tokenCount is bit-identical to the regex count on the documents corpus + edge cases") {
    val edge = Seq(
      "", " \t\n\f\r ", "héllo wörld", "a b", // NBSP is NOT a separator: counts as a mark
      "😀x😀", // supplementary chars: one mark each
      "mixed 123abc!@# end", "...", "a1b2c3", "ümlaut\nnewline\ttab"
    ).toDF("text")
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").select("text").union(edge)
    val diff = docs.select(
      TextAnalysis.tokenCount(col("text")).alias("fast"),
      TextAnalysis.tokenCountRegex(col("text")).alias("slow"))
      .filter(!(col("fast") <=> col("slow")))
    assert(diff.count() === 0)
    assert(one(TextAnalysis.tokenCount(col("text")), null) === null)
  }

  test("native CDC chunk kernel is bit-identical to the HOF reference form") {
    // contentDefinedChunks evaluates through the codegen'd kernel
    // (functions.CdcChunks); the HOF pipeline stays the replayable
    // reference the DuckDB oracle mirrors — every (chunk_idx,
    // chunk_tokens, chunk_digest) row must match value-for-value,
    // including edge shapes (empty, whitespace-only, single token,
    // case-sensitivity, unicode, a doc whose LAST token is a boundary)
    val edge = Seq(
      (100L, ""), (101L, "   \t \n "), (102L, "one"),
      (103L, "Case SENSITIVE case sensitive"), (104L, "naïve café × tokens"),
      (105L, ("w1 " * 200).trim)
    ).toDF("doc_id", "text")
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text")).unionByName(edge)
    val native = TextAnalysis.contentDefinedChunks(docs, "doc_id", "text")
    val hof = TextAnalysis.contentDefinedChunksHof(docs, "doc_id", "text")
    assert(native.exceptAll(hof).count() === 0)
    assert(hof.exceptAll(native).count() === 0)
    assert(native.count() > docs.count(), "fixture must actually chunk")
  }

  test("bigramLmScore matches a hand computation on a tiny corpus") {
    // guards the single-explode restructure: unigram counts derive from
    // the same per-doc aggregate as the bigram model (null-w2 marker
    // rows), so spell the whole model out by hand once.
    // corpus: d1 = "a b a", d2 = "b b", d3 = "c" (no bigrams -> no row)
    val docs = Seq((1L, "a b a"), (2L, "b b"), (3L, "c")).toDF("doc_id", "text")
    // unigrams: a=2, b=3, c=1 -> |V| = 3
    // bigrams: d1: (a,b) (b,a); d2: (b,b)
    // c12: (a,b)=1 (b,a)=1 (b,b)=1; c1: a=2, b=3
    val lp = Map(
      ("a", "b") -> math.log(2.0 / 5.0), // (1+1)/(2+3)
      ("b", "a") -> math.log(2.0 / 6.0), // (1+1)/(3+3)
      ("b", "b") -> math.log(2.0 / 6.0))
    val want = Map(
      1L -> (BigDecimal((lp(("a", "b")) + lp(("b", "a"))) / 2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 2L),
      2L -> (BigDecimal(lp(("b", "b")))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 1L))
    val got = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.keySet === Set(1L, 2L), got.toString) // d3 has no bigrams
    want.foreach { case (id, (logp, n)) =>
      assert(math.abs(got(id)._1 - logp) < 1e-9 && got(id)._2 === n,
        s"doc $id: got ${got(id)}, want ($logp, $n)")
    }
  }

  test("word stats") {
    assert(one(TextAnalysis.wordCount(col("text")), "the  quick   fox") === 3)
    assert(one(TextAnalysis.avgWordLen(col("text")), "ab abcd") === 3.0)
    assert(one(TextAnalysis.punctRatio(col("text")), "ab!?") === 0.5)
  }

  test("langId picks the dominant stopword language with fixed tie-break") {
    assert(one(TextAnalysis.langId(col("text")), "the cat is in the house and it is warm") === "en")
    assert(one(TextAnalysis.langId(col("text")), "el perro y la casa en un pueblo") === "es")
    assert(one(TextAnalysis.langId(col("text")), "der hund und die katze ist ein tier") === "de")
    assert(one(TextAnalysis.langId(col("text")), "xyzzy qwerty plugh") === "und")
  }

  test("langIdNgram scores frequent character trigrams") {
    assert(one(TextAnalysis.langIdNgram(col("text")), "the thing and the motion of things") === "en")
    assert(one(TextAnalysis.langIdNgram(col("text")), "la situación de el pueblo entre montañas") === "es")
    assert(one(TextAnalysis.langIdNgram(col("text")), "qqq zzz xxx") === "und")
  }

  test("charFingerprint matches an independent Scala computation") {
    val text = "spark data!"
    val expected = text.zipWithIndex.map { case (ch, i) => (i + 1).toLong * ch.toLong }.sum % 1000000007L
    assert(one(TextAnalysis.charFingerprint(col("text")), text) === expected)
  }

  test("quality score is in [0,1] and monotone-ish in substance") {
    val junk = one(TextAnalysis.qualityScore(col("text")), "!!! ??? ..").asInstanceOf[Double]
    val good = one(TextAnalysis.qualityScore(col("text")),
      ("the quick brown fox jumps over the lazy dog and runs to the river " * 8)).asInstanceOf[Double]
    assert(junk >= 0.0 && junk <= 1.0 && good >= 0.0 && good <= 1.0)
    assert(good > junk)
  }

  test("native quality score is bit-identical to the higher-order form") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the river",
      "!!! ??? ..",
      "",
      "   \t  \n ",
      "Crème brûlée!! 42 the of and",
      "a",
      ("for it is that the " * 40) + "tail",
      "no4stop-words;here: 100% punct+digits!!"
    ).toDF("text")
    val both = texts.select(
      graft.functions.native.qualityScore(col("text")).alias("fast"),
      TextAnalysis.qualityScoreFromParts(col("text"), TextAnalysis.words(col("text"))).alias("ref"))
    both.collect().foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1), s"mismatch: $r")
    }
    // and on a real corpus slice, every document agrees exactly
    val docs = graft.sources.Tables.documents(spark, sf())
      .limit(300)
      .select(
        graft.functions.native.qualityScore(col("text")).alias("fast"),
        TextAnalysis.qualityScoreFromParts(col("text"), TextAnalysis.words(col("text"))).alias("ref"))
    assert(docs.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("profile emits all columns in one pass") {
    val prof = TextAnalysis.profile(Seq((1L, "the quick brown fox")).toDF("id", "text"), "text")
    val cols = prof.columns.toSet
    assert(Set("n_words", "n_tokens", "avg_word_len", "punct_ratio", "stopword_ratio",
      "lang_pred", "quality_score", "quality_bucket", "fingerprint").subsetOf(cols))
    assert(prof.head().getAs[String]("lang_pred") === "en")
  }

  test("sourceDivergence matches hand-computed entropy / cross-entropy / KL on a tiny corpus") {
    // A: "a a b" (S=3), B: "b" (S=1); global a=2, b=2, g_n=4
    val docs = Seq(("A", "a a b"), ("B", "b")).toDF("source", "text")
    val got = TextAnalysis.sourceDivergence(docs, "source", "text")
      .orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // H(A) = ln3 − (2/3)ln2 = 0.6365; H(A,q) = −ln(1/2) = 0.6931; KL = 0.0566
    assert(got(0) === (("A", 2L, 3L, 0.6365, 0.6931, 0.0566)), got(0).toString)
    // B is a point mass: H = 0; cross-entropy = KL = ln 2
    assert(got(1) === (("B", 1L, 1L, 0.0, 0.6931, 0.6931)), got(1).toString)
  }

  test("vocabulary: tf/df exact, dense ids in (tf desc, term) order") {
    val docs = Seq((1L, "b a a"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabulary(docs, "doc_id", "text", 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // a and b tie on tf=2 → term order breaks the tie; df: a in 1 doc, b in 2
    assert(got.toSeq === Seq((1, "a", 2L, 1L), (2, "b", 2L, 2L)), got.mkString(","))
  }

  test("trainedLangId: learned profiles classify held-in docs; shared words don't flip the argmax") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog ate the food", "en"),
      (3L, "le chat mange le poisson", "fr"),
      (4L, "le chien et le chat", "fr"),
      // 'data' appears in both languages — shared evidence cancels out
      (5L, "the data cat", "en"),
      (6L, "le data chat", "fr")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.trainedLangId(docs, "doc_id", "text", "lang", docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang_true"), r.getAs[String]("pred_lang"))).toMap
    got.foreach { case (id, (t, p)) => assert(t === p, s"doc $id predicted $p, labeled $t") }
    assert(got.size === 6)
  }
}
