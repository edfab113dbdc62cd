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
