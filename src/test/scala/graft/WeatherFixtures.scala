package graft

import java.nio.file.{Files, Path}

/** Deterministic bronze-layer JSON fixtures shaped like the reference's
  * extractor output (`weather_extractor_lambda.py:109-126`): OpenWeather
  * current + forecast payloads annotated with extraction metadata, laid
  * out under `raw/{current,forecast}/year=/month=/day=/hour=/`.
  */
object WeatherFixtures {

  /** One current-weather payload. `gust` optional (schema-evolution case). */
  def currentJson(
      city: String,
      country: String,
      temp: Double,
      feelsLike: Double,
      humidity: Long,
      extractionTs: String,
      batchId: String,
      condition: String = "Clear",
      gust: Option[Double] = Some(3.5),
      timezone: Long = 0L,
      sunrise: Long = 1704096000L, // 2024-01-01 08:00:00 UTC
      sunset: Long = 1704127200L // 2024-01-01 16:40:00 UTC
  ): String = {
    val gustPart = gust.map(g => s""""gust": $g, """).getOrElse("")
    s"""{
       |  "city_name": "$city", "country": "$country",
       |  "extraction_timestamp": "$extractionTs", "batch_id": "$batchId", "data_type": "current",
       |  "coord": {"lat": 51.5, "lon": -0.12},
       |  "main": {"temp": $temp, "feels_like": $feelsLike, "temp_min": ${temp - 1}, "temp_max": ${temp + 1},
       |           "pressure": 1012, "humidity": $humidity},
       |  "wind": {"speed": 4.1, ${gustPart}"deg": 80},
       |  "clouds": {"all": 20},
       |  "visibility": 10000,
       |  "weather": [{"id": 800, "main": "$condition", "description": "desc $condition", "icon": "01d"}],
       |  "timezone": $timezone,
       |  "sys": {"sunrise": $sunrise, "sunset": $sunset}
       |}""".stripMargin
  }

  /** One forecast payload with `points` (dt, temp, condition) entries. */
  def forecastJson(
      city: String,
      country: String,
      extractionTs: String,
      batchId: String,
      points: Seq[(Long, Double, String)]): String = {
    val list = points
      .map { case (dt, temp, cond) =>
        s"""{"dt": $dt,
           |  "main": {"temp": $temp, "feels_like": ${temp - 0.5}, "pressure": 1011, "humidity": 60},
           |  "wind": {"speed": 3.0, "deg": 120},
           |  "clouds": {"all": 40},
           |  "pop": 0.2,
           |  "weather": [{"id": 500, "main": "$cond", "description": "desc $cond", "icon": "10d"}]}""".stripMargin
      }
      .mkString("[", ",", "]")
    s"""{
       |  "city_name": "$city", "country": "$country",
       |  "extraction_timestamp": "$extractionTs", "batch_id": "$batchId", "data_type": "forecast",
       |  "list": $list
       |}""".stripMargin
  }

  /** Write a bronze batch file (a JSON array of payloads, matching
    * `save_to_s3`'s `json.dumps(list)` shape) into the partitioned
    * layout. Returns the bronze root. */
  def writeBronze(root: Path, dataType: String, fileName: String, payloads: Seq[String]): Path = {
    val dir = root.resolve(s"raw/$dataType/year=2024/month=01/day=01/hour=06")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(fileName), payloads.mkString("[", ",", "]"))
    root
  }

  /** Standard two-city, one-batch bronze fixture. Current obs at
    * 2024-01-01 06:00; forecasts created at the same time for
    * +0.5 h (band-join match) / +27 h / +51 h / +100 h. */
  def standard(root: Path): Path = {
    val ts = "2024-01-01T06:00:00"
    val batch = "20240101_060000"
    writeBronze(
      root,
      "current",
      "data_1.json",
      Seq(
        currentJson("London", "GB", temp = 10.0, feelsLike = 8.0, humidity = 70, extractionTs = ts, batchId = batch,
          condition = "Clouds"),
        currentJson("Tokyo", "JP", temp = 28.0, feelsLike = 33.0, humidity = 55, extractionTs = ts, batchId = batch,
          condition = "Clear", timezone = 32400L),
        // DQ-gate victims: null-ish temp via out-of-range, bad humidity
        currentJson("BadTemp", "XX", temp = 99.0, feelsLike = 99.0, humidity = 50, extractionTs = ts, batchId = batch),
        currentJson("BadHum", "XX", temp = 20.0, feelsLike = 20.0, humidity = 150, extractionTs = ts, batchId = batch)
      )
    )
    val base = 1704088800L // 2024-01-01 06:00:00 UTC
    def pts(tempBias: Double): Seq[(Long, Double, String)] = Seq(
      (base + 1800, 10.5 + tempBias, "Clouds"), // 06:30 — within 1 h of the 06:00 obs
      (base + 27 * 3600, 12.0 + tempBias, "Rain"),
      (base + 51 * 3600, 13.0 + tempBias, "Clear"),
      (base + 100 * 3600, 14.0 + tempBias, "Clear")
    )
    writeBronze(
      root,
      "forecast",
      "data_1.json",
      Seq(
        forecastJson("London", "GB", ts, batch, pts(0.0)),
        forecastJson("Tokyo", "JP", ts, batch, pts(15.0))
      )
    )
    root
  }
}
