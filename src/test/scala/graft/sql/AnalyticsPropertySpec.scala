package graft.sql

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the bucketing/derivation ladders (SURVEY §5 item 4). */
class AnalyticsPropertySpec extends SparkSuite {

  /** Scala mirror of Analytics.horizonBucket for property comparison. */
  private def bucketOf(h: Double): String =
    if (h <= 24) "0-24 hours"
    else if (h <= 48) "24-48 hours"
    else if (h <= 72) "48-72 hours"
    else "72+ hours"

  test("horizon bucketing is total and matches the reference ladder on random inputs") {
    import spark.implicits._
    val gen = Gen.chooseNum(-10.0, 200.0)
    val samples = Gen.listOfN(300, gen).sample.get :+ 24.0 :+ 48.0 :+ 72.0 :+ 0.0
    val got = samples.toDF("h")
      .select(col("h"), Analytics.horizonBucket(col("h")).alias("b"))
      .collect().map(r => r.getDouble(0) -> r.getString(1))
    got.foreach { case (h, b) => assert(b === bucketOf(h), s"horizon $h") }
  }

  test("accuracy category is monotone in |error| and aligned with the accuracy flag") {
    import spark.implicits._
    val errs = (0 to 120).map(_ * 0.1)
    val df = errs.toDF("e").select(
      col("e"),
      when(col("e") <= 1, "Excellent").when(col("e") <= 3, "Good")
        .when(col("e") <= 5, "Fair").otherwise("Poor").alias("cat"))
    val order = Map("Excellent" -> 0, "Good" -> 1, "Fair" -> 2, "Poor" -> 3)
    val cats = df.orderBy("e").collect().map(r => order(r.getString(1)))
    assert(cats.sameElements(cats.sorted), "category must be monotone in error")
  }

  test("driver smoke: flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every declared query has an oracle") {
    // a queries() entry without oracleSql silently downgrades to the
    // driver's rows-only check — this test makes forgetting an oracle a
    // build failure instead of a quiet correctness-coverage hole
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }
}
