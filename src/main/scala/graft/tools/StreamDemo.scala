package graft.tools

import graft.Sessions
import graft.ingest.BronzeWriter
import graft.model.FixedClock
import graft.streaming.StreamingBronzeToSilver
import java.nio.file.Files
import java.time.LocalDateTime

/** End-to-end drive of the incremental streaming pipeline: ingest a
  * bronze batch (S6 analog), run the AvailableNow stream, show what
  * landed, ingest another batch, run again (dev/demo tool). */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-stream-demo")
    val root = Files.createTempDirectory("graft-stream-demo")

    def payload(city: String, ts: String, temp: Double) =
      s"""{"city_name": "$city", "country": "XX", "extraction_timestamp": "$ts",
         |"batch_id": "b", "data_type": "current", "coord": {"lat": 1.0, "lon": 2.0},
         |"main": {"temp": $temp, "feels_like": $temp, "temp_min": $temp, "temp_max": $temp,
         |"pressure": 1000, "humidity": 50}, "wind": {"speed": 1.0, "deg": 10},
         |"clouds": {"all": 0}, "visibility": 9000,
         |"weather": [{"id": 800, "main": "Clear", "description": "clear", "icon": "01d"}],
         |"timezone": 0, "sys": {"sunrise": 1704096000, "sunset": 1704127200}}""".stripMargin

    BronzeWriter.writeBatch(root.toString, "current", LocalDateTime.of(2024, 1, 1, 6, 0),
      Seq(payload("Alpha", "2024-01-01T06:00:00", 11.0), payload("Beta", "2024-01-01T06:00:00", 22.0)))

    def runOnce(tag: String): Unit = {
      val q = StreamingBronzeToSilver.run(
        spark, s"$root/raw/current/*/*/*/*/*.json", s"$root/silver", s"$root/ckpt",
        FixedClock("2024-01-01 07:00:00"))
      q.awaitTermination()
      val out = spark.read.parquet(s"$root/silver")
      println(s"[demo] after $tag: ${out.count()} silver rows")
      out.select("location_name", "temperature_celsius", "observation_date", "heat_index_category")
        .orderBy("location_name").show(10, truncate = false)
    }

    runOnce("batch 1")
    runOnce("batch 1 re-run (idempotent)")
    BronzeWriter.writeBatch(root.toString, "current", LocalDateTime.of(2024, 1, 2, 6, 0),
      Seq(payload("Gamma", "2024-01-02T06:00:00", 33.0)))
    runOnce("batch 2 (delta only)")
    spark.stop()
  }
}
