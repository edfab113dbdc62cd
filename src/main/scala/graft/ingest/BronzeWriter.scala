package graft.ingest

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** S6: the ingest analog of the reference's extractor Lambda
  * (`weather_extractor_lambda.py:60-80`) with the network boundary
  * removed: given already-fetched payload JSON strings, writes one batch
  * file per data type into the Hive-partitioned bronze layout
  * (`raw/{type}/year=/month=/day=/hour=/data_{batchId}.json`, key scheme
  * from `weather_extractor_lambda.py:67`), which is exactly what the S1
  * scan (batch or streaming) consumes.
  *
  * Pure JVM I/O, no Spark: ingest writes row-ish JSON documents, the
  * engine's job starts at the scan.
  */
object BronzeWriter {

  private val keyFmt = DateTimeFormatter.ofPattern("'year='yyyy/'month='MM/'day='dd/'hour='HH")
  private val batchFmt = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")

  /** Returns the written file path. `payloads` are single-document JSON
    * strings; the batch file is a JSON array of them (matching
    * `json.dumps(list)` in the reference). */
  def writeBatch(
      bronzeRoot: String,
      dataType: String,
      extractionTime: LocalDateTime,
      payloads: Seq[String]): Path = {
    val batchId = extractionTime.format(batchFmt)
    val dir = Paths.get(bronzeRoot, "raw", dataType, extractionTime.format(keyFmt))
    Files.createDirectories(dir)
    val file = dir.resolve(s"data_$batchId.json")
    Files.writeString(file, payloads.mkString("[", ",", "]"))
    file
  }
}
