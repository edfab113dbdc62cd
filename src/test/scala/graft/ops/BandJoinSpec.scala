package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BandJoinSpec extends SparkSuite {

  /** Deterministic pseudo-random event set: ids 0..n-1, key = id % 7,
    * epoch spread via a hash-ish recurrence (seconds scale). */
  private def mkEvents(n: Int, idName: String, epochName: String) = {
    spark.range(n).toDF("id")
      .select(
        col("id").alias(idName),
        pmod(col("id"), lit(7)).alias("k"),
        pmod(col("id") * 2654435761L, lit(250000L)).alias(epochName))
  }

  test("bucketed band join ≡ naive theta join on every pair (tolerance 3600)") {
    val l = mkEvents(400, "lid", "le")
    val r = mkEvents(400, "rid", "re")
    val naive = BandJoin.naive(l, r, Seq("k"), l("le"), r("re"), 3600L)
      .select(col("lid"), col("rid"))
    val bucketed = BandJoin.bucketed(l, r, Seq("k"), "le", "re", 3600L)
      .select(col("lid"), col("rid"))
    assert(naive.count() > 0) // non-vacuous
    assert(bucketed.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(bucketed).count() === 0)
  }

  test("saltedBucketed ≡ bucketed on random data AND on a planted hot (key × window)") {
    val l = mkEvents(400, "lid", "le")
    val r = mkEvents(400, "rid", "re")
    val plain = BandJoin.bucketed(l, r, Seq("k"), "le", "re", 3600L)
      .select(col("lid"), col("rid"))
    val salted = BandJoin.saltedBucketed(l, r, Seq("k"), "le", "re", 3600L,
      leftSaltCols = Seq("lid"), saltBuckets = 8)
      .select(col("lid"), col("rid"))
    assert(plain.count() > 0)
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)

    // hot key: 500 left rows of ONE (key, hour) — under the plain join
    // they all hash to one partition; salting must spread them WITHOUT
    // changing the matched pairs
    val hotL = spark.range(500).select(
      col("id").alias("lid"), lit(0L).alias("k"), (col("id") % 3600L).alias("le"))
    val hotR = spark.range(20).select(
      (col("id") + 1000L).alias("rid"), lit(0L).alias("k"), (col("id") * 180L).alias("re"))
    val hotPlain = BandJoin.bucketed(hotL, hotR, Seq("k"), "le", "re", 3600L)
      .select(col("lid"), col("rid"))
    val hotSalted = BandJoin.saltedBucketed(hotL, hotR, Seq("k"), "le", "re", 3600L,
      leftSaltCols = Seq("lid"), saltBuckets = 8)
      .select(col("lid"), col("rid"))
    assert(hotSalted.exceptAll(hotPlain).count() === 0)
    assert(hotPlain.exceptAll(hotSalted).count() === 0)
    // the salted plan spreads the hot key: the join's left shuffle keys
    // must include the salt column
    val p = hotSalted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p.take(2000))
  }

  test("band edge: pairs exactly at the tolerance are excluded (strict <)") {
    import spark.implicits._
    val l = Seq((1L, 0L, 0L)).toDF("lid", "k", "le")
    val r = Seq((2L, 0L, 3600L), (3L, 0L, 3599L), (4L, 0L, -3600L)).toDF("rid", "k", "re")
    val got = BandJoin.bucketed(l, r, Seq("k"), "le", "re", 3600L)
      .select("rid").collect().map(_.getLong(0)).sorted
    assert(got === Array(3L)) // only |Δ| = 3599 qualifies
  }

  test("asOf keeps exactly the nearest in-band match per left row") {
    import spark.implicits._
    val l = Seq((1L, 0L, 1000L), (2L, 0L, 50000L)).toDF("lid", "k", "le")
    val r = Seq((10L, 0L, 400L), (11L, 0L, 1200L), (12L, 0L, 3000L)).toDF("rid", "k", "re")
    val got = BandJoin.asOf(l, r, Seq("k"), "le", "re", 3600L, Seq("lid"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got === Map(1L -> 11L)) // |1000-1200|=200 beats 600 and 2000; lid 2 has no in-band match
  }

  test("asOf tie-break prefers the earlier right epoch") {
    import spark.implicits._
    val l = Seq((1L, 0L, 1000L)).toDF("lid", "k", "le")
    val r = Seq((10L, 0L, 900L), (11L, 0L, 1100L)).toDF("rid", "k", "re")
    val got = BandJoin.asOf(l, r, Seq("k"), "le", "re", 3600L, Seq("lid"))
      .select("rid").collect().map(_.getLong(0))
    assert(got === Array(10L)) // both |Δ|=100; earlier epoch wins
  }

  test("one-to-many semantics: every in-band observation matches, not just the nearest") {
    import spark.implicits._
    val l = Seq((1L, 0L, 1000L)).toDF("lid", "k", "le")
    val r = Seq((10L, 0L, 500L), (11L, 0L, 1500L), (12L, 0L, 999999L)).toDF("rid", "k", "re")
    val got = BandJoin.bucketed(l, r, Seq("k"), "le", "re", 3600L).count()
    assert(got === 2)
  }
}
