package graft.etl

import graft.SparkSuite
import graft.model.FixedClock
import org.apache.spark.sql.functions._

class DimensionsSpec extends SparkSuite {

  private val clock = FixedClock("2024-06-01 00:00:00")

  test("C2/S5: calendar has 1096 rows for the reference range with correct attributes") {
    val cal = Dimensions.buildDimDate(spark).cache()
    assert(cal.count() === 1096) // 2024 is a leap year: 366 + 365 + 365
    val leap = cal.filter(col("full_date") === "2024-02-29").head()
    assert(leap.getAs[Int]("date_key") === 20240229)
    assert(leap.getAs[String]("day_name") === "Thursday")
    assert(leap.getAs[Int]("quarter") === 1)
    val jan1 = cal.filter(col("full_date") === "2024-01-01").head()
    assert(jan1.getAs[Int]("day_of_week") === 2) // Monday in Spark numbering (1=Sunday)
    assert(!jan1.getAs[Boolean]("is_weekend"))
    val sat = cal.filter(col("full_date") === "2024-01-06").head()
    assert(sat.getAs[Boolean]("is_weekend"))
  }

  test("C1: SCD2 initial load invariants — dense unique keys, one current version per natural key") {
    import spark.implicits._
    val attrs = Seq(("b", 2), ("a", 1), ("c", 3)).toDF("name", "attr")
    val dim = Dimensions.scd2InitialLoad(attrs, "k", Seq(col("name")), clock).cache()
    assert(dim.select("k").collect().map(_.getInt(0)).sorted === Array(1, 2, 3))
    assert(dim.filter(col("name") === "a").head().getInt(dim.columns.indexOf("k")) === 1) // ordered by name
    assert(dim.filter(col("is_current") === true).count() === 3)
    assert(dim.groupBy("name").count().filter(col("count") > 1).count() === 0)
    val row = dim.filter(col("name") === "b").head()
    assert(row.getAs[java.sql.Date]("effective_from_date").toString === "2024-06-01")
    assert(row.getAs[java.sql.Date]("effective_to_date").toString === "9999-12-31")
    assert(row.getAs[Int]("version") === 1)
  }

  test("C1+: SCD2 merge expires changed rows, inserts new versions, keeps history") {
    import spark.implicits._
    val clock0 = FixedClock("2024-06-01 00:00:00")
    val clock1 = FixedClock("2024-07-01 00:00:00")
    val dim0 = Dimensions.scd2InitialLoad(
      Seq(("alpha", "A"), ("beta", "B"), ("gamma", "C")).toDF("name", "attr"),
      "k", Seq(col("name")), clock0)

    val attrs1 = Seq(("alpha", "A2"), ("beta", "B"), ("delta", "D")).toDF("name", "attr")
    val merged = Dimensions.scd2Merge(dim0, attrs1, Seq("name"), "k", Seq("name"), clock1).cache()

    // one current row per key; gamma (absent from attrs) keeps its version
    assert(merged.filter(col("is_current") === true).count() === 4) // alpha v2, beta v1, gamma v1, delta v1
    val alpha = merged.filter(col("name") === "alpha").orderBy("version").collect()
    assert(alpha.length === 2)
    assert(alpha(0).getAs[String]("attr") === "A" && !alpha(0).getAs[Boolean]("is_current"))
    assert(alpha(0).getAs[java.sql.Date]("effective_to_date").toString === "2024-07-01")
    assert(alpha(1).getAs[String]("attr") === "A2" && alpha(1).getAs[Boolean]("is_current"))
    assert(alpha(1).getAs[Int]("version") === 2)
    // new surrogate keys start above the existing max
    val maxOld = dim0.agg(org.apache.spark.sql.functions.max("k")).head().getInt(0)
    val newKeys = merged.filter(col("version") === 2 || col("name") === "delta")
      .select("k").collect().map(_.getInt(0))
    assert(newKeys.forall(_ > maxOld))
    // no overlapping validity intervals per key
    val overlaps = merged.as("a").join(merged.as("b"),
      col("a.name") === col("b.name") && col("a.k") =!= col("b.k") &&
        col("a.effective_from_date") < col("b.effective_to_date") &&
        col("b.effective_from_date") < col("a.effective_to_date")).count()
    assert(overlaps === 0)
    // idempotent re-merge with same attrs: nothing changes
    val again = Dimensions.scd2Merge(merged, attrs1, Seq("name"), "k", Seq("name"), FixedClock("2024-08-01 00:00:00"))
    assert(again.count() === merged.count())
    assert(again.filter(col("is_current") === true).count() === 4)
  }

  test("timezone name CASE covers the reference's 8 offsets") {
    import spark.implicits._
    val df = Seq(-18000L, 0L, 32400L, 36000L, 19800L, 14400L, -10800L, 12345L)
      .toDF("off")
      .select(col("off"), Dimensions.timezoneName(col("off")).alias("tz"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(-18000L) === "EST" && m(0L) === "GMT" && m(32400L) === "JST")
    assert(m(36000L) === "AEST" && m(19800L) === "IST" && m(14400L) === "GST")
    assert(m(-10800L) === "BRT" && m(12345L) === "UTC")
  }

  test("Keys.scalableSurrogate assigns unique ids without a global sort") {
    val df = spark.range(1000).toDF("x").repartition(8)
    val keyed = Keys.scalableSurrogate(df, "sk")
    assert(keyed.select("sk").distinct().count() === 1000)
  }
}
