package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Redaction, sampling, contamination, repetition — the corpus-hygiene
  * operators. */
class CorpusOpsSpec extends SparkSuite {

  import spark.implicits._

  test("redaction masks emails, IPs and phones and counts each class") {
    val df = Seq((1L, "mail me at a.b@x.io or 10.0.0.1, tel +44 20 7946 0958 end"))
      .toDF("id", "text")
    val r = df.select(
      Redaction.redactPii(col("text")).alias("r"),
      Redaction.emailCount(col("text")).alias("e"),
      Redaction.ipCount(col("text")).alias("i"),
      Redaction.phoneCount(col("text")).alias("p")).head()
    assert(r.getString(0) === "mail me at [EMAIL] or [IP], tel [PHONE] end")
    assert(r.getInt(1) === 1 && r.getInt(2) === 1 && r.getInt(3) === 1)
  }

  test("redaction leaves clean text untouched") {
    val clean = "no personal data in this sentence at all"
    val out = Seq((1L, clean)).toDF("id", "text")
      .select(Redaction.redactPii(col("text"))).head().getString(0)
    assert(out === clean)
  }

  test("hash sampling is deterministic and lands near the rate") {
    val ids = spark.range(10000).toDF("id")
    val kept = Sampling.sample(ids, col("id"), 0.5)
    val n = kept.count()
    assert(n > 4700 && n < 5300, s"kept $n of 10000 at rate 0.5")
    // deterministic: the same rows every time, regardless of partitioning
    val again = Sampling.sample(ids.repartition(7), col("id"), 0.5)
    assert(kept.exceptAll(again).count() === 0 && again.exceptAll(kept).count() === 0)
    assert(Sampling.sample(ids, col("id"), 1.0).count() === 10000)
    assert(Sampling.sample(ids, col("id"), 0.0).count() === 0)
  }

  test("split partitions every row into exactly one label, near the fractions, subset-stable") {
    val ids = spark.range(10000).toDF("id")
    val labeled = Sampling.split(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byLabel = labeled.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.values.sum === 10000L, "total: every row labeled exactly once")
    assert(byLabel("train") > 7700 && byLabel("train") < 8300, s"train ${byLabel("train")}")
    assert(byLabel("val") > 800 && byLabel("val") < 1200, s"val ${byLabel("val")}")
    assert(byLabel("test") > 800 && byLabel("test") < 1200, s"test ${byLabel("test")}")
    // subset stability: dropping other rows never flips a surviving row's
    // label — the anti-leakage property of hash splits
    val subset = Sampling.split(ids.filter(col("id") % 3 === 0), col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val joined = labeled.alias("a").join(subset.alias("b"), "id")
      .filter(col("a.split") =!= col("b.split"))
    assert(joined.count() === 0L)
  }

  test("priority sample: exact k per group, ≡ the window-rank reference, partitioning-invariant") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.range(2000).toDF("id")
      .withColumn("grp", (col("id") % 7).cast("string"))
      .withColumn("w", (col("id") % 13) + lit(1.0))
    val got = Sampling.prioritySample(docs, "id", "w", "grp", 10)
      .select(col("grp"), col("id"))
    val counts = got.groupBy("grp").count().collect().map(_.getLong(1))
    assert(counts.length === 7 && counts.forall(_ === 10L), "exactly k per group")
    // reference: same priorities ranked by a window
    val u = (conv(substring(md5(col("id").cast("string")), 1, 4), 16, 10)
      .cast("double") + 0.5) / 65536.0
    val ref = docs.withColumn("pr", log(u) / col("w"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("pr").desc, col("id"))))
      .filter(col("rk") <= 10).select(col("grp"), col("id"))
    assert(got.exceptAll(ref).count() === 0 && ref.exceptAll(got).count() === 0)
    // deterministic under repartitioning (heap merge order can't matter)
    val again = Sampling.prioritySample(docs.repartition(11), "id", "w", "grp", 10)
      .select(col("grp"), col("id"))
    assert(got.exceptAll(again).count() === 0 && again.exceptAll(got).count() === 0)
  }

  test("split with a full-weight label and zero-weight tail labels every row (1.0 boundary)") {
    val ids = spark.range(1000).toDF("id")
    val labeled = Sampling.split(ids, col("id"), Seq("train" -> 1.0, "test" -> 0.0))
    // cumulative 1.0 must not render as 5-char hex "10000" (which the
    // 4-char compare would mislabel ~94% of rows into the empty tail)
    assert(labeled.filter(col("split") === "train").count() === 1000L)
  }

  test("split covers every row for arbitrary fraction vectors (fuzz, seeded)") {
    val rnd = new scala.util.Random(11)
    val ids = spark.range(2000).toDF("id")
    (1 to 5).foreach { _ =>
      val k = 2 + rnd.nextInt(4)
      val raw = Seq.fill(k)(rnd.nextDouble() + 0.01)
      val fracs = raw.zipWithIndex.map { case (w, i) => s"s$i" -> w / raw.sum }
      // normalize the last fraction so the vector sums to exactly 1.0
      val exact = fracs.init :+ (fracs.last._1 -> (1.0 - fracs.init.map(_._2).sum))
      val labeled = Sampling.split(ids, col("id"), exact)
      assert(labeled.filter(col("split").isNull || col("split") === "").count() === 0L)
      assert(labeled.count() === 2000L)
      val labels = labeled.select(col("split")).distinct().collect().map(_.getString(0)).toSet
      assert(labels.subsetOf(exact.map(_._1).toSet))
    }
  }

  test("priority sample with constant weights degenerates to the k largest hash variates") {
    val docs = spark.range(500).toDF("id").withColumn("grp", lit("g")).withColumn("w", lit(2.5))
    val got = Sampling.prioritySample(docs, "id", "w", "grp", 25)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // ln(u)/w is monotone INCREASING in u for constant w>0 (ln u < 0,
    // closer to 0 is larger): top-k priorities = k LARGEST u
    val want = spark.range(500).toDF("id")
      .withColumn("u", conv(substring(md5(col("id").cast("string")), 1, 4), 16, 10).cast("double"))
      .orderBy(col("u").desc, col("id")).limit(25)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got === want)
  }

  test("shuffleShards is a permutation: every row once, contiguous positions, repartition-invariant") {
    val ids = spark.range(3000).toDF("id")
    val sharded = Sampling.shuffleShards(ids, col("id"), 5)
    assert(sharded.count() === 3000L)
    assert(sharded.select(col("id")).distinct().count() === 3000L)
    val perShard = sharded.groupBy(col("shard"))
      .agg(count(lit(1)).alias("n"), min(col("pos")).alias("lo"), max(col("pos")).alias("hi"))
      .collect()
    perShard.foreach { r =>
      assert(r.getInt(2) === 1 && r.getInt(3).toLong === r.getLong(1),
        s"shard ${r.getInt(0)}: pos must be contiguous 1..n")
    }
    val again = Sampling.shuffleShards(ids.repartition(13), col("id"), 5)
    assert(sharded.exceptAll(again).count() === 0 && again.exceptAll(sharded).count() === 0)
  }

  test("stratified sampling applies per-stratum rates") {
    val df = spark.range(10000).toDF("id")
      .withColumn("stratum", when(col("id") % 2 === 0, "keep_all").otherwise("half"))
    val kept = Sampling.stratifiedSample(
      df, col("stratum"), Map("keep_all" -> 1.0, "half" -> 0.5), col("id"))
    assert(kept.filter(col("stratum") === "keep_all").count() === 5000)
    val h = kept.filter(col("stratum") === "half").count()
    assert(h > 2300 && h < 2700, s"half stratum kept $h of 5000")
  }

  test("mixture fills exact quotas via bucketed selection, ≡ the naive global rank, short strata kept whole") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "src")
    val targets = Map("a" -> 100L, "b" -> 2000L, "c" -> 7L) // b's quota exceeds its 1000 rows
    val got = Sampling.mixture(df, col("src"), col("id"), targets, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc === Map("a" -> 100, "b" -> 1000, "c" -> 7), bySrc.toString)
    // identical to the naive per-stratum global rank
    val naive = df
      .withColumn("__rk", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(Sampling.hashUnit(col("id")), col("id").cast("string"))))
      .filter(
        (col("src") === "a" && col("__rk") <= 100) ||
        (col("src") === "b" && col("__rk") <= 2000) ||
        (col("src") === "c" && col("__rk") <= 7))
      .select(col("id"), col("src"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSet === naive.toSet)
  }

  test("upsample replicates by expectation: whole copies always, fractional by hash; zero weight drops") {
    val df = (0L until 2000L).map(i => (i, i % 2)).toDF("id", "grp")
    // weight 0 for odd grp, 2.5 for even grp
    val out = Sampling.upsample(df, col("id"),
      when(col("grp") === 0, 2.5).otherwise(0.0))
    val n = out.count()
    assert(out.filter(col("grp") === 1).count() === 0)
    // 1000 even rows × E[copies]=2.5 → expect ~2500, hash-deterministic
    assert(n > 2300 && n < 2700, s"n=$n")
    assert(out.groupBy("id").count().agg(org.apache.spark.sql.functions.max("count"))
      .head().getLong(0) === 3L) // 2.5 → never more than 3 copies
    assert(Sampling.upsample(df, col("id"),
      when(col("grp") === 0, 2.5).otherwise(0.0)).count() === n) // deterministic
  }

  test("contamination: benchmark members score 1.0, disjoint docs 0.0, partial in between") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma delta unseen tokens here")
    ).toDF("doc_id", "text")
    val benchmark = Seq("alpha beta gamma delta epsilon zeta").toDF("text")
    val got = Contamination.ngramOverlap(corpus, "doc_id", "text", benchmark, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("overlap_ratio")).toMap
    assert(got(1L) === 1.0) // verbatim benchmark member
    assert(got(2L) === 0.0) // disjoint vocabulary
    assert(got(3L) > 0.0 && got(3L) < 1.0) // shares the leading trigrams only
    assert(Contamination.contaminatedIds(corpus, "doc_id", "text", benchmark, "text", 0.9)
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("bloomDecontaminate equals the exact n-gram join restricted to contaminated docs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma delta unseen tokens here"),
      (4L, "seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val benchmark = Seq("alpha beta gamma delta epsilon zeta").toDF("text")
    val exact = Contamination.ngramOverlap(corpus, "doc_id", "text", benchmark, "text")
      .filter(col("n_contaminated") >= 1)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_shingles"),
        r.getAs[Long]("n_contaminated"), r.getAs[Double]("overlap_ratio"))).toSet
    val bloomed = Contamination.bloomDecontaminate(corpus, "doc_id", "text", benchmark, "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_shingles"),
        r.getAs[Long]("n_contaminated"), r.getAs[Double]("overlap_ratio"))).toSet
    assert(bloomed === exact, "bloom prefilter must not change the exact result")
    assert(bloomed.map(_._1) === Set(1L, 3L), "clean docs never appear")
    // empty benchmark → empty result, not a null-probe crash
    assert(Contamination.bloomDecontaminate(
      corpus, "doc_id", "text", benchmark.limit(0), "text").count() === 0)
  }

  test("gopherRules: each published rule fires on its designed violation") {
    val wc50 = (1 to 50).map(i => s"word$i").mkString(" ") // 50 tokens, all alpha, len>3
    val docs = Seq(
      // passes everything: 50+ words, mean len in [3,10], 2 required stopwords
      (1L, s"the cat sat with a dog $wc50"),
      (2L, "too short to keep"),                                // word count < 50
      (3L, s"the of ${(1 to 60).map(_ => "zz").mkString(" ")}"), // mean word len 2 < 3
      (4L, s"the cat sat with a dog ${(1 to 50).map(_ => "#x#").mkString(" ")}"), // symbol ratio
      (5L, s"the cat sat with a dog $wc50\n" + (1 to 20).map(_ => "- bullet line").mkString("\n")),
      (6L, s"the cat sat with a dog $wc50\n" + (1 to 20).map(_ => "trailing line...").mkString("\n")),
      (7L, s"the of ${(1 to 60).map(i => s"$i$i$i$i").mkString(" ")}"), // numerals: alpha frac < 0.8
      (8L, wc50 + " " + wc50)                                   // no required stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"))
    assert(!got(2L).getAs[Boolean]("r_word_count") && !got(2L).getAs[Boolean]("keep"))
    assert(!got(3L).getAs[Boolean]("r_mean_word_len"))
    assert(!got(4L).getAs[Boolean]("r_symbol_ratio"))
    assert(!got(5L).getAs[Boolean]("r_bullet_lines"),
      s"bullet frac ${got(5L).getAs[Double]("bullet_line_frac")}")
    assert(!got(6L).getAs[Boolean]("r_ellipsis_lines"))
    assert(!got(7L).getAs[Boolean]("r_alpha_words"))
    assert(!got(8L).getAs[Boolean]("r_stop_words"))
    // the one passing doc really passed every rule, not just the conjunction
    val r1 = got(1L)
    Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_bullet_lines",
      "r_ellipsis_lines", "r_alpha_words", "r_stop_words")
      .foreach(c => assert(r1.getAs[Boolean](c), c))
  }

  test("repetition: templated text scores high, natural prose low") {
    val df = Seq(
      (1L, "spam spam spam spam"),
      (2L, "all these words appear exactly once")
    ).toDF("doc_id", "text")
    val got = df.select(
      col("doc_id"),
      TextAnalysis.repetitionRatio(col("text")).alias("w"),
      TextAnalysis.dupNgramRatio(col("text"), 2).alias("b"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === 0.75) // 1 distinct of 4
    assert(got(1L)._2 === 1.0 - 1.0 / 3.0) // "spam spam" ×3 → 1 distinct of 3
    assert(got(2L)._1 === 0.0 && got(2L)._2 === 0.0)
  }

  test("duplicatedSpans: cross-doc runs merge into maximal islands; intra-doc repeats don't count") {
    val docs = Seq(
      (1L, "a b c d e f g h"),           // shares a..e with 2
      (2L, "x y a b c d e z w q"),       // the shared run sits mid-doc
      (3L, "p q r s t u v"),             // clean
      (4L, "a1 b1 c1 m1 m2 m3 u1 v1 w1"), // two disjoint shared runs with 5
      (5L, "a1 b1 c1 n1 n2 n3 u1 v1 w1"),
      (6L, "z1 z2 z3 z1 z2 z3 k1 k2 k3") // intra-doc repeat only — not a dup
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc1: grams "a b c","b c d","c d e" dup → one island covering pos 1..5
    assert(got(1L).getAs[Int]("n_dup_spans") === 1)
    assert(got(1L).getAs[Long]("dup_tokens") === 5L)
    assert(got(1L).getAs[Double]("dup_frac") === 0.625)
    assert(!got(1L).getAs[Boolean]("keep"))
    // doc2: same three grams at pos 3..5 → island pos 3..7
    assert(got(2L).getAs[Int]("n_dup_spans") === 1)
    assert(got(2L).getAs[Long]("dup_tokens") === 5L)
    // doc3: untouched
    assert(got(3L).getAs[Int]("n_dup_spans") === 0)
    assert(got(3L).getAs[Long]("dup_tokens") === 0L)
    assert(got(3L).getAs[Boolean]("keep"))
    // docs 4/5: two disjoint 3-token islands each (head + tail), 6 dup tokens of 9
    for (id <- Seq(4L, 5L)) {
      assert(got(id).getAs[Int]("n_dup_spans") === 2, s"doc $id")
      assert(got(id).getAs[Long]("dup_tokens") === 6L, s"doc $id")
      assert(!got(id).getAs[Boolean]("keep"), s"doc $id")
    }
    // doc6: the repeated run exists only within ONE document — minDocs
    // counts distinct docs, so nothing is flagged
    assert(got(6L).getAs[Int]("n_dup_spans") === 0)
    assert(got(6L).getAs[Boolean]("keep"))
  }

  test("dsirSelect: target-like raw docs outrank raw-like ones; top keepFrac selected") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "tgt"),
      (2L, "alpha beta alpha gamma", "tgt"),
      (3L, "delta gamma beta alpha", "tgt"),
      (11L, "alpha beta alpha beta", "raw"),  // pure target vocabulary
      (12L, "red blue red blue", "raw"),      // pure raw vocabulary
      (13L, "green yellow green yellow", "raw"),
      (14L, "gamma delta gamma delta", "raw") // pure target vocabulary
    ).toDF("doc_id", "text", "kind")
    val got = Sampling.dsirSelect(
      docs, "doc_id", "text", isTarget = col("kind") === "tgt", keepFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet === Set(11L, 12L, 13L, 14L)) // raw docs only
    assert(got.values.forall(_.getAs[Long]("n_tokens") === 4L))
    // target-vocabulary docs carry strictly higher importance weights
    assert(got(11L).getAs[Double]("logw") > got(12L).getAs[Double]("logw"))
    assert(got(14L).getAs[Double]("logw") > got(13L).getAs[Double]("logw"))
    val selected = got.filter(_._2.getAs[Boolean]("selected")).keySet
    assert(selected === Set(11L, 14L), s"got $selected")
  }

  test("c4Rules: each rule fires on its designed violation") {
    val docs = Seq(
      (1L, "one two three four. five six seven. eight nine ten."), // keeps
      (2L, "too short"),                                  // <5 words, 1 sentence
      (3L, "a b c. lorem ipsum text. more words here."),  // policy phrase
      (4L, "code { x } one two. three four five. six seven eight.") // brace
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4Rules(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"))
    assert(got(1L).getAs[Int]("n_sentences") === 3)
    assert(got(1L).getAs[Double]("terminal_sentence_frac") === 1.0)
    assert(!got(2L).getAs[Boolean]("r_min_words") && !got(2L).getAs[Boolean]("r_min_sentences"))
    assert(!got(3L).getAs[Boolean]("r_no_bad_phrase") && !got(3L).getAs[Boolean]("keep"))
    assert(!got(4L).getAs[Boolean]("r_no_brace") && !got(4L).getAs[Boolean]("keep"))
  }
}
