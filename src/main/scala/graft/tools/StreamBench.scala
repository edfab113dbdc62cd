package graft.tools

import graft.Sessions
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming throughput/latency harness: drives the three headline
  * stateful operators (st1 windowed counts, st5 sessionization, st8
  * grouped top-k) through MemoryStream micro-batches and reports
  * rows/sec, mean batch latency, and state-store rows — plus a 10×
  * input run per operator to demonstrate BOUNDED state (the state row
  * count must track keys/windows, not input volume; the same property
  * `StreamingSpec` asserts).
  *
  * Methodology notes: MemoryStream isolates operator cost from source
  * IO (the point is state-machine throughput, not parquet read speed);
  * each `addData` + `processAllAvailable` is one micro-batch, timed
  * around the blocking call; state rows come from the engine's own
  * `stateOperators.numRowsTotal` progress metric. Event times advance
  * across batches so watermarks move and eviction actually runs.
  *
  * Usage: `sbt "runMain graft.tools.StreamBench [rowsPerBatch] [batches]"`
  * (defaults 50000 × 10). Prints one JSON line per measured run.
  */
object StreamBench {

  final case class TopEvent(event_type: String, event_id: Long, value: Double)

  private val types = Array("click", "view", "purchase", "refund", "scroll")
  private val t0 = 1704067200000L // 2024-01-01 00:00 UTC

  /** Deterministic event batch: `n` rows spread over `spanMinutes` of
    * event time starting at `offsetMin`, 500 users, 5 types. */
  private def eventBatch(n: Int, offsetMin: Int, spanMinutes: Int): Seq[EventStreams.Event] =
    (0 until n).map { i =>
      val minute = offsetMin + (i.toLong * spanMinutes / n).toInt
      EventStreams.Event(
        user_id = i % 500,
        event_time = new java.sql.Timestamp(t0 + minute * 60000L + (i % 60) * 1000L),
        event_type = types(i % types.length),
        value = (i % 1000) / 10.0)
    }

  private final case class RunResult(
      rows: Long, totalSec: Double, meanBatchMs: Double, maxBatchMs: Double, stateRows: Long)

  /** Feed `batches` micro-batches into a started query, timing each
    * blocking drain. */
  private def drive[A](
      input: MemoryStream[A],
      q: StreamingQuery,
      mkBatch: Int => Seq[A],
      batches: Int): RunResult = {
    var rows = 0L
    val times = (0 until batches).map { b =>
      val data = mkBatch(b)
      rows += data.size
      val start = System.nanoTime()
      input.addData(data)
      q.processAllAvailable()
      (System.nanoTime() - start) / 1e6
    }
    val stateRows = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    q.stop()
    RunResult(rows, times.sum / 1000.0, times.sum / times.length, times.max, stateRows)
  }

  def main(args: Array[String]): Unit = {
    val rowsPerBatch = args.headOption.map(_.toInt).getOrElse(50000)
    val batches = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = Sessions.local("graft-streambench")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sparkContext.setLogLevel("ERROR")

    def report(name: String, scale: String, r: RunResult): Unit =
      println(
        f"""{"bench":"$name","scale":"$scale","rows":${r.rows},"rows_per_sec":${(r.rows / r.totalSec).round},""" +
          f""""mean_batch_ms":${r.meanBatchMs}%.1f,"max_batch_ms":${r.maxBatchMs}%.1f,"state_rows":${r.stateRows}}""")

    // Each batch advances event time by 10 minutes -> watermark chases
    // the data and windows/sessions close as the run proceeds.
    def st1(n: Int, tag: String): RunResult = {
      val input = MemoryStream[EventStreams.Event]
      val q = EventStreams.windowedCounts(input.toDF(), "10 minutes", "5 minutes")
        .writeStream.format("noop").outputMode("update").start()
      drive(input, q, b => eventBatch(n, b * 10, 10), batches)
    }
    def st5(n: Int, tag: String): RunResult = {
      val input = MemoryStream[EventStreams.Event]
      val q = EventStreams.sessionize(input.toDS(), gapMinutes = 5, watermarkDelay = "1 minute")
        .writeStream.format("noop").outputMode("append").start()
      drive(input, q, b => eventBatch(n, b * 10, 10), batches)
    }
    def st8(n: Int, tag: String): RunResult = {
      val input = MemoryStream[TopEvent]
      val q = EventStreams.groupedTopK(input.toDF(), k = 10)
        .writeStream.format("noop").outputMode("update").start()
      drive(input, q,
        b => (0 until n).map(i => TopEvent(types(i % 5), b.toLong * n + i, (i % 100000) / 7.0)),
        batches)
    }

    for ((name, f) <- Seq[(String, (Int, String) => RunResult)](
        ("st1_windowed_counts", st1), ("st5_session_window", st5), ("st8_grouped_topk", st8))) {
      val base = f(rowsPerBatch, "1x")
      report(name, "1x", base)
      val big = f(rowsPerBatch * 10, "10x")
      report(name, "10x", big)
      val ratio = if (base.stateRows == 0) 0.0 else big.stateRows.toDouble / base.stateRows
      println(f"""{"bench":"$name","state_growth_at_10x":$ratio%.2f}""")
    }
    spark.stop()
  }
}
