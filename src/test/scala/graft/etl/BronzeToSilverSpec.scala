package graft.etl

import graft.{SparkSuite, WeatherFixtures}
import graft.model.{FixedClock, Schemas}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class BronzeToSilverSpec extends SparkSuite {

  private lazy val bronzeRoot = WeatherFixtures.standard(Files.createTempDirectory("graft-bronze"))
  private val clock = FixedClock("2024-01-01 07:00:00")

  private lazy val currentBronze = BronzeToSilver.readBronze(
    spark, s"$bronzeRoot/raw/current/*/*/*/*/*.json", Some(Schemas.currentBronze))
  private lazy val currentSilver = BronzeToSilver.currentSilver(currentBronze, clock)

  test("S1/P1: current flatten produces the 24-column silver schema") {
    val cols = currentSilver.columns.toSet
    assert(Set("location_name", "country_code", "temperature_celsius", "wind_gust_mps",
      "weather_condition", "observation_date", "is_daytime", "heat_index_category",
      "sunrise_time", "sunset_time").subsetOf(cols))
  }

  test("C5: data-quality gate drops out-of-range temperature and humidity") {
    val names = currentSilver.select("location_name").collect().map(_.getString(0)).toSet
    assert(names === Set("London", "Tokyo")) // BadTemp (99°C) and BadHum (150%) gone
  }

  test("S1-robustness: a corrupt bronze file null-rows through PERMISSIVE and is dropped by the DQ gate") {
    // a malformed extractor payload must not fail the 100 TB batch: the
    // permissive reader turns it into an all-null row and the C5 gate
    // (null + range filters) drops it, so the good files still land
    val root = WeatherFixtures.standard(Files.createTempDirectory("graft-corrupt"))
    java.nio.file.Files.writeString(
      root.resolve("raw/current/year=2024/month=01/day=01/hour=06/corrupt.json"),
      "{ this is : not json,,, \"name\": tru")
    val bronze = BronzeToSilver.readBronze(
      spark, s"$root/raw/current/*/*/*/*/*.json", Some(Schemas.currentBronze))
    // PERMISSIVE: the corrupt file parses to one all-null row, no throw
    assert(bronze.count() === 5) // 4 fixture docs + 1 corrupt null row
    assert(bronze.filter(col("city_name").isNull).count() === 1)
    val silver = BronzeToSilver.currentSilver(bronze, clock)
    val names = silver.select("location_name").collect().map(_.getString(0)).toSet
    assert(names === Set("London", "Tokyo")) // same survivors as the clean corpus
  }

  test("P2/P3: nested and array access flatten the right values") {
    val london = currentSilver.filter(col("location_name") === "London").head()
    assert(london.getAs[Double]("temperature_celsius") === 10.0)
    assert(london.getAs[String]("weather_condition") === "Clouds")
    assert(london.getAs[String]("weather_description") === "desc Clouds")
    assert(london.getAs[Double]("latitude") === 51.5)
  }

  test("P9: heat index category ladder") {
    val byCity = currentSilver.select("location_name", "heat_index_category")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byCity("London") === "Cold") // feels_like 8.0
    assert(byCity("Tokyo") === "High Heat") // feels_like 33.0
  }

  test("P6: is_daytime from sunrise/sunset band") {
    // obs 06:00 UTC; sunrise 08:00 → not daytime
    val london = currentSilver.filter(col("location_name") === "London").head()
    assert(!london.getAs[Boolean]("is_daytime"))
  }

  test("P12: wind.gust guard — explicit schema always has the field; inferred schema without gust falls back to 0.0") {
    assert(currentSilver.filter(col("location_name") === "London").head().getAs[Double]("wind_gust_mps") === 3.5)

    // inferred read of a gust-less payload exercises the probe path
    val dir = Files.createTempDirectory("graft-nogust")
    WeatherFixtures.writeBronze(dir, "current", "data_1.json", Seq(
      WeatherFixtures.currentJson("NoGust", "XX", 15.0, 15.0, 50, "2024-01-01T06:00:00", "b1", gust = None)))
    val inferred = BronzeToSilver.readBronze(spark, s"$dir/raw/current/*/*/*/*/*.json", None)
    val silver = BronzeToSilver.currentSilver(inferred, clock)
    assert(silver.head().getAs[Double]("wind_gust_mps") === 0.0)
  }

  test("G1/C4: forecast explode yields one row per point with rounded horizon hours") {
    val fb = BronzeToSilver.readBronze(
      spark, s"$bronzeRoot/raw/forecast/*/*/*/*/*.json", Some(Schemas.forecastBronze))
    val silver = BronzeToSilver.forecastSilver(fb, clock)
    assert(silver.count() === 8) // 2 cities × 4 points
    val horizons = silver.filter(col("location_name") === "London")
      .select("forecast_horizon_hours").collect().map(_.getDouble(0)).sorted
    assert(horizons === Array(0.5, 27.0, 51.0, 100.0))
  }

  test("F4: processed_timestamp comes from the injected clock") {
    val ts = currentSilver.select("processed_timestamp").head().getTimestamp(0).toString
    assert(ts === "2024-01-01 07:00:00.0")
  }
}
