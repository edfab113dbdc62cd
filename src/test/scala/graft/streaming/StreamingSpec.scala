package graft.streaming

import graft.{SparkSuite, WeatherFixtures}
import graft.ingest.BronzeWriter
import graft.model.FixedClock
import java.nio.file.Files
import java.time.LocalDateTime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSuite {

  test("S1-streaming: AvailableNow file stream lands silver incrementally and idempotently") {
    val root = Files.createTempDirectory("graft-stream")
    WeatherFixtures.standard(root)
    val silver = s"$root/silver/current_weather"
    val ckpt = s"$root/ckpt"
    val clock = FixedClock("2024-01-01 07:00:00")

    val q1 = StreamingBronzeToSilver.run(
      spark, s"$root/raw/current/*/*/*/*/*.json", silver, ckpt, clock)
    q1.awaitTermination()
    assert(spark.read.parquet(silver).count() === 2) // DQ gate drops 2 of 4

    // re-run with no new files: checkpoint makes it a no-op (idempotent)
    val q2 = StreamingBronzeToSilver.run(
      spark, s"$root/raw/current/*/*/*/*/*.json", silver, ckpt, clock)
    q2.awaitTermination()
    assert(spark.read.parquet(silver).count() === 2)

    // new bronze batch (via the S6 ingest analog) → only the delta lands
    BronzeWriter.writeBatch(
      root.toString, "current", LocalDateTime.of(2024, 1, 2, 6, 0, 0),
      Seq(WeatherFixtures.currentJson(
        "Paris", "FR", 12.0, 11.0, 60, "2024-01-02T06:00:00", "20240102_060000")))
    val q3 = StreamingBronzeToSilver.run(
      spark, s"$root/raw/current/*/*/*/*/*.json", silver, ckpt, clock)
    q3.awaitTermination()
    val out = spark.read.parquet(silver)
    assert(out.count() === 3)
    assert(out.filter(col("location_name") === "Paris").count() === 1)
  }

  test("windowed counts with watermark work on batch relations too") {
    val counts = EventStreams.windowedCounts(
      graft.sources.Tables.events(spark, sf()), "1 hour", "2 hours")
    val total = counts.agg(sum("n")).head().getLong(0)
    assert(total === 1000) // every event in exactly one tumbling window
    assert(counts.select("event_type").distinct().count() === 5)
  }

  test("flatMapGroupsWithState sessionization: gap splits sessions, aggregates are exact") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val events = Seq(
      EventStreams.Event(1L, ts(0), "click", 1.0),
      EventStreams.Event(1L, ts(10), "click", 2.0),
      EventStreams.Event(1L, ts(120), "view", 3.0), // 110-min gap → new session
      EventStreams.Event(2L, ts(5), "click", 5.0)
    ).toDS()
    val sessions = EventStreams.sessionize(events, gapMinutes = 30)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length === 3)
    assert(sessions(0).n_events === 2 && sessions(0).value_sum === 3.0)
    assert(sessions(1).n_events === 1 && sessions(1).value_sum === 3.0)
    assert(sessions(2).user_id === 2L && sessions(2).n_events === 1)
  }

  test("sessionization over a MemoryStream micro-batch emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    input.addData(
      EventStreams.Event(7L, ts(0), "click", 1.0),
      EventStreams.Event(7L, ts(5), "click", 1.5),
      EventStreams.Event(8L, ts(0), "view", 4.0))
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("graft_sessions").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_sessions").as[EventStreams.UserSession]
      .collect().sortBy(_.user_id)
    assert(got.length === 2)
    assert(got(0).user_id === 7L && got(0).n_events === 2)
  }
}
