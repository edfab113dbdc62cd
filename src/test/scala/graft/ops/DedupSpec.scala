package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
    (4L, "completely different content about spark query engines and columnar formats"),
    (5L, "another unrelated document mentioning calendars dimensions and weather data")
  ).toDF("doc_id", "text")

  test("exact dedup finds the duplicate group and keeps the smallest id") {
    val groups = Dedup.exactDupGroups(docs, "doc_id", "text").collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("dup_count") === 2L)
    assert(groups.head.getAs[Long]("keeper_id") === 1L)
    assert(Dedup.exactDedupIds(docs, "doc_id", "text").count() === 4)
  }

  test("identical texts have identical minhash signatures; near-dups mostly agree") {
    val sigs = docs
      .select(col("doc_id"), Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 64).alias("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    val agree14 = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(agree13 > 32, s"near-dup agreement $agree13 should be high") // J≈0.71
    assert(agree14 < 16, s"unrelated agreement $agree14 should be low")
  }

  test("LSH near-dup pipeline finds exact and near pairs above threshold, nothing else") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)) && keys.contains((1L, 3L)) && keys.contains((2L, 3L)))
    assert(keys.size === 3)
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 === 1.0)
  }

  test("incremental dedup ≡ full near-dup restricted to batch-touching pairs; history-internal pairs never re-emitted") {
    val hist = docs // ids 1-5 already ingested (1~2~3 are known dups)
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog near the river bank today"), // dup of 1/2
      (12L, "fresh batch document with entirely novel content about incremental indexes")
    ).toDF("doc_id", "text")
    val inc = Dedup.incrementalNearDupPairs(hist, batch, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.nearDupPairs(hist.unionByName(batch), "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (a, b) => a >= 11L || b >= 11L }
    assert(inc === expected, s"inc=$inc expected=$expected")
    assert(inc.contains((1L, 11L)) && inc.contains((3L, 11L)))
    assert(!inc.contains((1L, 2L)), "history-internal pair must not be re-emitted")
  }

  test("editDistancePairs property: within-block pairs match a brute-force Levenshtein on random strings") {
    import org.scalacheck.Gen
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val gen = for {
      prefix <- Gen.oneOf("abc", "abd", "xyz")
      tail <- Gen.listOfN(4, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    } yield prefix + tail
    val names = Gen.listOfN(60, gen).sample.get.distinct
    val got = Dedup.editDistancePairs(names.toDF("s"), "s", blockLen = 3, maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val expected = (for {
      a <- names; b <- names
      if a < b && a.take(3) == b.take(3) && lev(a, b) <= 3
    } yield (a, b, lev(a, b))).toSet
    assert(got === expected,
      s"missing=${expected.diff(got).take(3)} extra=${got.diff(expected).take(3)}")
  }

  test("LSH bucket cap bounds a degenerate boilerplate corpus; exact pass still catches it") {
    // 1,000 identical boilerplate docs: every band-bucket they land in has
    // 1,000 members — uncapped, that is one giant collect_list buffer and
    // ~500k quadratic pairs PER BAND
    val boiler = (100L until 1100L)
      .map(i => (i, "please accept our terms and conditions before continuing to the site"))
      .toDF("doc_id", "text")
    val corpus = docs.union(boiler)
    val pairs = Dedup.lshCandidatePairs(corpus, "doc_id", "text", maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // oversized buckets are dropped before materializing: no boilerplate
    // pair survives, the small corpus's candidates are untouched
    assert(pairs.forall { case (a, b) => a < 100L && b < 100L })
    assert(pairs.map(p => (p._1, p._2)).toSet.contains((1L, 2L)))
    // the replicated text is still caught — by the exact digest pass,
    // which is why the two passes run together in practice
    val groups = Dedup.exactDupGroups(corpus, "doc_id", "text").collect()
    assert(groups.exists(g => g.getAs[Long]("dup_count") === 1000L && g.getAs[Long]("keeper_id") === 100L))
    // audit surface: the stats report the degenerate occupancy loudly
    val top = Dedup.lshBucketStats(corpus, "doc_id", "text").head()
    assert(top.getAs[Long]("bucket_size") === 1000L)
  }

  test("simhash: identical → hamming 0; near-dup close; unrelated far") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).alias("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) === 0)
    assert(ham(sigs(1L), sigs(3L)) < 16)
    assert(ham(sigs(1L), sigs(4L)) > 16)
  }

  test("xxhash64 fast path agrees with the portable oracle signature on near-dup classification") {
    // dd_simhash's declared entry uses the portable md5 signature (the
    // one DuckDB can replay); this property pins the cheaper xxhash64
    // production kernel to it: both must rank identical pairs at 0,
    // near-dups below the duplicate threshold, and unrelated pairs above
    // it — scaled to each signature's width (64 vs 48 bits).
    val sigs = docs.select(
        col("doc_id"),
        Dedup.simhash64(col("text")).alias("fast"),
        Dedup.simhashPortable(col("text")).alias("portable"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val pairs = Seq((1L, 2L, "identical"), (1L, 3L, "near"), (1L, 4L, "far"), (1L, 5L, "far"))
    for ((a, b, kind) <- pairs) {
      val fastH = ham(sigs(a)._1, sigs(b)._1)
      val portH = ham(sigs(a)._2, sigs(b)._2)
      // duplicate-call thresholds at 1/4 of the signature width
      val (fastDup, portDup) = (fastH <= 16, portH <= 12)
      assert(fastDup === portDup, s"pair ($a,$b) [$kind]: fast=$fastH/64 portable=$portH/48 disagree")
      if (kind == "identical") assert(fastH === 0 && portH === 0)
    }
  }

  test("native simhash kernel is bit-identical to the HOF reference form") {
    // the declared entries evaluate through the codegen'd kernel
    // (functions.SimHashPortable); the HOF pipeline is the replayable
    // reference the DuckDB oracle mirrors — every signature must match
    // bit-for-bit, including edge shapes (empty text, pure whitespace,
    // unicode, repeated tokens)
    val edge = Seq(
      (100L, ""), (101L, "   \t \n "), (102L, "one"),
      (103L, "Matching CASE Matching case"), (104L, "naïve café × tokens"),
      (105L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    ).toDF("doc_id", "text")
    val both = docs.unionByName(edge).select(
      col("doc_id"),
      Dedup.simhashPortable(col("text")).alias("native"),
      Dedup.simhashPortableHof(col("text")).alias("hof"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"doc ${r.getLong(0)}: native ${r.getLong(1)} != hof ${r.getLong(2)}")
    }
    assert(rows.length === docs.count() + 6)
  }

  test("simhash banding: identical docs pair at hamming 0; pigeonhole recall within bands-1; unrelated pairs excluded") {
    val pairs = Dedup.simhashBandPairs(docs, "doc_id", "text", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // exact duplicates (1,2) always collide in EVERY band, distance 0
    assert(pairs.get((1L, 2L)).contains(0))
    // near-dup (1,3): one changed word -> small distance; pigeonhole
    // guarantees the candidate whenever hamming <= bands-1 = 3, and the
    // mutation here stays within the verify threshold
    assert(pairs.contains((1L, 3L)), pairs.toString)
    assert(pairs((1L, 3L)) <= 12)
    // unrelated docs are far apart: even if a band slice collides by
    // chance, the exact Hamming verification drops them
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((4L, 5L)), pairs.toString)
  }

  test("chunk overlap surfaces a suffix-edited near-dup; unrelated docs share nothing") {
    val r = new scala.util.Random(7)
    val body = (1 to 300).map(_ => ('a' + r.nextInt(26)).toChar.toString * (1 + r.nextInt(4))).mkString(" ")
    val other = (1 to 300).map(_ => ('A' + r.nextInt(26)).toChar.toString * (1 + r.nextInt(4))).mkString(" ")
    val corpus = Seq((1L, body), (2L, body + " suffixedit"), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Dedup.chunkOverlapPairs(corpus, "doc_id", "text")
      .collect().map(re => (re.getLong(0), re.getLong(1)) -> re.getLong(2)).toMap
    val nChunks = graft.ops.TextAnalysis.contentDefinedChunks(corpus.limit(1), "doc_id", "text").count()
    // the suffix edit disturbs only the tail region (the last chunk,
    // plus possibly the penultimate when the final boundary shifts or a
    // digest repeats): nearly all chunks stay shared
    assert(pairs.get((1L, 2L)).exists(_ >= nChunks - 2), s"pairs=$pairs nChunks=$nChunks")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)), pairs.toString)
  }

  test("prefixFilterJoin property: exactly the brute-force Jaccard pairs on a random corpus") {
    // lossless claim: recall 1.0 AND precision 1.0 vs the quadratic
    // reference, on a corpus of seeded mutations at varied distances
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    def doc() = Vector.fill(12 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = Vector.fill(30)(doc())
    val corpus = bases.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      bases.take(10).zipWithIndex.map { case (t, i) =>
        // mutate: append 1-3 tokens
        (100L + i, t + " " + Vector.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
    val df = corpus.toDF("doc_id", "text")
    val tau = 0.5
    def shingleSet(t: String): Set[String] = {
      val w = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (if (w.length <= 3) Seq(w.mkString(" "))
       else w.sliding(3).map(_.mkString(" ")).toSeq).toSet
    }
    val expected = (for {
      (i, a) <- corpus; (j, b) <- corpus
      if i < j
      sa = shingleSet(a); sb = shingleSet(b)
      inter = (sa & sb).size
      jac = inter.toDouble / (sa | sb).size
      if jac >= tau
    } yield (i, j)).toSet
    val got = Dedup.prefixFilterJoin(df, "doc_id", "text", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected,
      s"missing=${expected.diff(got).take(5)} extra=${got.diff(expected).take(5)}")
    assert(expected.nonEmpty, "fixture must plant at least one qualifying pair")
  }

  test("prefixFilterJoin candidate budget: trips on a boilerplate cluster, transparent when under budget") {
    // 40 docs sharing one boilerplate body (pairwise Jaccard ≈ 1) — the
    // corpus shape that generates pairs quadratically
    val boiler = (1L to 40L).map(i =>
      (i, s"shared boilerplate header text repeated across the whole corpus item $i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.prefixFilterJoin(boiler, "doc_id", "text", 0.5, maxCandidatePairs = 100L)
    }
    assert(e.getMessage.contains("candidate pairs") && e.getMessage.contains("nearDupPairs"))
    // a sufficient budget changes nothing: identical pairs to the unguarded run
    val free = Dedup.prefixFilterJoin(boiler, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = Dedup.prefixFilterJoin(boiler, "doc_id", "text", 0.5,
      maxCandidatePairs = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded === free && free.nonEmpty)
  }

  test("adversarial realistic corpus: budget refuses the exact join, the LSH twin still answers") {
    // The shape the budget exists for — not a degenerate one-text-replicated
    // corpus but a REALISTIC one: a licence template replicated with small
    // per-doc field substitutions (holder, year), mixed into genuinely
    // distinct docs. Each cluster doc's rarest-first prefix starts with its
    // own unique shingles (df=1) but must continue into SHARED template
    // shingles (prefix length ≈ 0.2·n+1 exceeds the unique tail), so the
    // shared-prefix buckets hold the whole cluster and candidates grow
    // quadratically in cluster size while the corpus looks innocent.
    val template = "permission is hereby granted free of charge to any person obtaining a copy " +
      "of this software and associated documentation files to deal in the software without " +
      "restriction including without limitation the rights to use copy modify merge publish " +
      "distribute sublicense and sell copies subject to the following conditions"
    val cluster = (1L to 150L).map(i =>
      (i, s"$template copyright holder number $i year ${1990 + (i % 30)}"))
    val distinctDocs = (1001L to 1050L).map(i =>
      (i, s"document $i discusses topic ${i * 7 % 97} with unique vocabulary " +
        s"item${i}a item${i}b item${i}c item${i}d item${i}e item${i}f item${i}g item${i}h"))
    val corpus = (cluster ++ distinctDocs).toDF("doc_id", "text")

    val e = intercept[IllegalStateException] {
      Dedup.prefixFilterJoin(corpus, "doc_id", "text", 0.8, maxCandidatePairs = 5000L)
    }
    assert(e.getMessage.contains("candidate pairs") && e.getMessage.contains("nearDupPairs"),
      e.getMessage)

    // the remediation the refusal names works on the SAME corpus: the LSH
    // twin answers with bounded buckets and surfaces the cluster — and
    // nothing but the cluster — at the same threshold
    val lsh = Dedup.nearDupPairs(corpus, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty && lsh.forall { case (a, b) => a <= 150L && b <= 150L },
      s"expected only intra-cluster pairs, got ${lsh.filterNot { case (a, b) => a <= 150L && b <= 150L }.take(5)}")
    assert(lsh.size > 5000, s"cluster should pair quadratically, got ${lsh.size}")
  }

  test("prefixFilterJoin agrees with nearDupPairs verification values where both find the pair") {
    val exact = Dedup.prefixFilterJoin(docs, "doc_id", "text", 0.6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Dedup.nearDupPairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // LSH candidates ⊆ exact result; Jaccard values identical on the overlap
    assert(lsh.keySet.subsetOf(exact.keySet))
    lsh.foreach { case (k, v) => assert(math.abs(exact(k) - v) < 1e-12) }
  }

  test("jaccard expression is exact") {
    val j = spark.range(1)
      .select(Dedup.jaccard(array(lit("a"), lit("b"), lit("c")), array(lit("b"), lit("c"), lit("d"))).alias("j"))
      .head().getDouble(0)
    assert(j === 0.5)
  }
}
