package graft.ingest

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSuite
import graft.etl.BronzeToSilver
import graft.model.{FixedClock, Schemas}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.time.LocalDateTime
import org.apache.spark.sql.functions._

/** S6 fetch half: REST extraction against a loopback stub server — the
  * network boundary the reference crosses with `requests.get`
  * (`weather_extractor_lambda.py:26-58`), closed end-to-end: HTTP fetch →
  * annotate → bronze batch file → S1 scan → silver. */
class RestIngestSpec extends SparkSuite {

  private def rawCurrent(temp: Double): String =
    s"""{
       |  "coord": {"lat": 51.5, "lon": -0.12},
       |  "main": {"temp": $temp, "feels_like": 8.0, "temp_min": 9.0, "temp_max": 11.0,
       |           "pressure": 1012, "humidity": 70},
       |  "wind": {"speed": 4.1, "gust": 3.5, "deg": 80},
       |  "clouds": {"all": 20},
       |  "visibility": 10000,
       |  "weather": [{"id": 800, "main": "Clouds", "description": "overcast", "icon": "01d"}],
       |  "timezone": 0,
       |  "sys": {"sunrise": 1704096000, "sunset": 1704127200}
       |}""".stripMargin

  private val rawForecast =
    """{
      |  "list": [{"dt": 1704090600,
      |    "main": {"temp": 10.5, "feels_like": 10.0, "pressure": 1011, "humidity": 60},
      |    "wind": {"speed": 3.0, "deg": 120},
      |    "clouds": {"all": 40},
      |    "pop": 0.2,
      |    "weather": [{"id": 500, "main": "Rain", "description": "light rain", "icon": "10d"}]}]
      |}""".stripMargin

  private def serve(h: HttpExchange, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    h.sendResponseHeaders(200, bytes.length)
    h.getResponseBody.write(bytes)
    h.close()
  }

  test("annotate injects the extraction metadata into the payload object") {
    val out = RestIngest.annotate(
      """{"a": 1}""", RestIngest.City("London", 51.5, -0.12, "GB"),
      "current", LocalDateTime.of(2024, 1, 1, 6, 0, 0)).get
    assert(out.contains(""""city_name": "London""""))
    assert(out.contains(""""batch_id": "20240101_060000""""))
    assert(out.contains(""""data_type": "current""""))
    assert(out.contains(""""a": 1"""))
    assert(RestIngest.annotate("not json", RestIngest.City("X", 0, 0, "XX"), "current",
      LocalDateTime.of(2024, 1, 1, 6, 0, 0)).isEmpty)
  }

  test("HTTP fetch → bronze → silver end-to-end on a loopback stub") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/weather", (h: HttpExchange) => serve(h, rawCurrent(10.0)))
    server.createContext("/forecast", (h: HttpExchange) => serve(h, rawForecast))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val root = Files.createTempDirectory("graft-rest").toString
      val ts = LocalDateTime.of(2024, 1, 1, 6, 0, 0)
      val cities = RestIngest.defaultCities.take(2) // New York, London

      val res = RestIngest.extractBatch(new HttpFetcher(2), base, root, ts, cities)
      assert(res.currentRecords === 2 && res.forecastRecords === 2)
      assert(res.currentFile.nonEmpty && res.forecastFile.nonEmpty)

      // the landed bronze is exactly what the S1 scan + silver stage expect
      val bronze = BronzeToSilver.readBronze(
        spark, s"$root/raw/current/*/*/*/*/*.json", Some(Schemas.currentBronze))
      val silver = BronzeToSilver.currentSilver(bronze, FixedClock("2024-01-01 07:00:00"))
      assert(silver.count() === 2)
      assert(silver.select("location_name").collect().map(_.getString(0)).sorted
        === Array("London", "New York"))
      assert(silver.filter(col("batch_id") === "20240101_060000").count() === 2)
    } finally server.stop(0)
  }

  test("fetched bronze feeds the whole pipeline: fetch → bronze → silver → gold → analytics") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/weather", (h: HttpExchange) => serve(h, rawCurrent(10.0)))
    server.createContext("/forecast", (h: HttpExchange) => serve(h, rawForecast))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val root = Files.createTempDirectory("graft-rest3").toString
      RestIngest.extractBatch(
        new HttpFetcher(2), base, root, LocalDateTime.of(2024, 1, 1, 6, 0, 0),
        RestIngest.defaultCities.take(2))
      // materialized, unregistered: full gold build without touching the
      // session's demo views
      graft.Pipeline.run(
        spark,
        graft.Pipeline.Layout(root, s"$root/silver", s"$root/gold"),
        FixedClock("2024-01-01 07:00:00"),
        materializeGold = true,
        registerViews = false)
      val acc = spark.read.parquet(s"$root/gold/fact_forecast_accuracy")
      // one +0.5 h forecast point per city within the ±1 h band
      assert(acc.count() === 2)
      val q1 = graft.sql.Analytics.accuracyByHorizon(acc).collect()
      assert(q1.length === 1 && q1.head.getAs[String]("horizon_bucket") === "0-24 hours")
    } finally server.stop(0)
  }

  test("a failing endpoint skips its records without failing the batch") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/weather", (h: HttpExchange) => serve(h, rawCurrent(12.0)))
    // no /forecast context → 404 → Fetcher returns None → skipped
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val root = Files.createTempDirectory("graft-rest2").toString
      val res = RestIngest.extractBatch(
        new HttpFetcher(2), base, root, LocalDateTime.of(2024, 1, 2, 6, 0, 0),
        RestIngest.defaultCities.take(3))
      assert(res.currentRecords === 3)
      assert(res.forecastRecords === 0 && res.forecastFile.isEmpty)
    } finally server.stop(0)
  }
}
