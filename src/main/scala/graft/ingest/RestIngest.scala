package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Path
import java.time.{Duration, LocalDateTime}
import java.time.format.DateTimeFormatter

/** S6, fetch half: the REST→bronze extractor analog of the reference's
  * Lambda (`weather_extractor_lambda.py:26-58` fetch, `:109-126` payload
  * annotation, `:128-130` bronze write). The network boundary is a
  * pluggable [[Fetcher]]: production uses [[HttpFetcher]] (JDK
  * HttpClient, no extra dependencies); tests run against a loopback stub
  * server. A failed fetch skips the city and the batch continues,
  * matching the reference's per-city `if current:` tolerance.
  *
  * Ingest is pure JVM I/O — one driver-side (or external-scheduler-side)
  * process writing row-ish JSON documents. The engine's distributed work
  * starts at the S1 scan; fetching 8 cities/day needs no cluster.
  */
trait Fetcher {
  /** Fetch a URL; None on any error (timeout, non-2xx, refused). */
  def get(url: String): Option[String]
}

/** JDK HttpClient fetcher with the reference's 10 s timeout
  * (`weather_extractor_lambda.py:37`). */
final class HttpFetcher(timeoutSeconds: Long = 10) extends Fetcher {
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds))
    .build()

  override def get(url: String): Option[String] =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(timeoutSeconds))
        .GET()
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 200 && resp.statusCode() < 300) Some(resp.body()) else None
    } catch { case _: Exception => None }
}

object RestIngest {

  final case class City(name: String, lat: Double, lon: Double, country: String)

  /** The reference's city set (`weather_extractor_lambda.py:12-21`). */
  val defaultCities: Seq[City] = Seq(
    City("New York", 40.7128, -74.0060, "US"),
    City("London", 51.5074, -0.1278, "GB"),
    City("Tokyo", 35.6762, 139.6503, "JP"),
    City("Sydney", -33.8688, 151.2093, "AU"),
    City("Mumbai", 19.0760, 72.8777, "IN"),
    City("Dubai", 25.2048, 55.2708, "AE"),
    City("São Paulo", -23.5505, -46.6333, "BR"),
    City("Toronto", 43.6532, -79.3832, "CA")
  )

  final case class BatchResult(
      batchId: String,
      currentFile: Option[Path],
      forecastFile: Option[Path],
      currentRecords: Int,
      forecastRecords: Int)

  private val batchFmt = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")

  /** Inject the extraction metadata fields into a fetched JSON object
    * (`weather_extractor_lambda.py:109-126`), textually — ingest treats
    * payloads as opaque documents; parsing is the silver stage's job. */
  private[ingest] def annotate(
      payload: String,
      city: City,
      dataType: String,
      ts: LocalDateTime): Option[String] = {
    val open = payload.indexOf('{')
    if (open < 0) None
    else {
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      val meta =
        s""""extraction_timestamp": "${ts.format(DateTimeFormatter.ISO_LOCAL_DATE_TIME)}",
           | "batch_id": "${ts.format(batchFmt)}",
           | "data_type": "$dataType",
           | "city_name": "${esc(city.name)}",
           | "country": "${esc(city.country)}",""".stripMargin
      Some(payload.substring(0, open + 1) + meta + payload.substring(open + 1))
    }
  }

  /** One extraction batch: fetch current + forecast for every city from
    * `baseUrl` (`/weather`, `/forecast` endpoints, metric units — the
    * reference's URL scheme), annotate, and land both batch files in the
    * Hive-partitioned bronze layout via [[BronzeWriter]]. */
  def extractBatch(
      fetcher: Fetcher,
      baseUrl: String,
      bronzeRoot: String,
      ts: LocalDateTime,
      cities: Seq[City] = defaultCities,
      apiKey: String = ""): BatchResult = {
    def fetchAll(endpoint: String, dataType: String): Seq[String] =
      cities.flatMap { c =>
        fetcher.get(s"$baseUrl/$endpoint?lat=${c.lat}&lon=${c.lon}&units=metric&appid=$apiKey")
          .flatMap(annotate(_, c, dataType, ts))
      }
    val current = fetchAll("weather", "current")
    val forecast = fetchAll("forecast", "forecast")
    BatchResult(
      ts.format(batchFmt),
      if (current.nonEmpty) Some(BronzeWriter.writeBatch(bronzeRoot, "current", ts, current)) else None,
      if (forecast.nonEmpty) Some(BronzeWriter.writeBatch(bronzeRoot, "forecast", ts, forecast)) else None,
      current.size,
      forecast.size)
  }
}
