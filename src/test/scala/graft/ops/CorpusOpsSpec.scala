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

  test("stratified sampling applies per-stratum rates") {
    val df = spark.range(10000).toDF("id")
      .withColumn("stratum", when(col("id") % 2 === 0, "keep_all").otherwise("half"))
    val kept = Sampling.stratifiedSample(
      df, col("stratum"), Map("keep_all" -> 1.0, "half" -> 0.5), col("id"))
    assert(kept.filter(col("stratum") === "keep_all").count() === 5000)
    val h = kept.filter(col("stratum") === "half").count()
    assert(h > 2300 && h < 2700, s"half stratum kept $h of 5000")
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
}
