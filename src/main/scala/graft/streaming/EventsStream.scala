package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the events stream — the always-on version of
  * the reference's daily batch pull (main.py's per-day append loop becomes a
  * watermarked continuous aggregation).
  *
  * Every transform here is identical in batch and streaming (the watermark
  * is applied only when the source is streaming), so the batch oracle
  * queries validate the streaming logic too.
  */
object EventsStream {

  /** Tumbling-window aggregate per event type: 1-hour windows, 1-hour
    * watermark for late data. State is bounded by (windows in watermark ×
    * event types) — constant per key at any scale.
    */
  def windowedAgg(events: DataFrame): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", "1 hour") else events
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("total"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("total"))
  }

  /** Daily OHLCV bars maintained continuously — the streaming face of
    * Ohlc.dailyBars (identical aggregate functions), with a 1-day watermark
    * bounding state to the open day per entity.
    */
  def streamingBars(events: DataFrame): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", "1 day") else events
    src
      .groupBy(col("user_id"), window(col("ts"), "1 day").as("w"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("volume"))
      .select(col("user_id"), col("w.start").cast("date").as("d"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
  }

  case class Ev(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(nEvents: Long, total: Double, startMs: Long, lastMs: Long)
  case class SessionOut(user_id: Long, n_events: Long, total_value: Double, duration_sec: Double)

  /** Sessionization with explicit state: a session closes after `gapSec` of
    * event-time inactivity — either inline (the key's next event arrives
    * past the gap) or via event-time timeout once the watermark passes the
    * gap. Event-time (not processing-time) timeout matters operationally:
    * batches trigger only on data/watermark progress, so an idle stream is
    * idle — no busy empty-batch loop. State per user is O(1).
    */
  def sessionize(events: Dataset[Ev], gapSec: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", "10 seconds") else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.nEvents, s.total, (s.lastMs - s.startMs) / 1000.0))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapSec * 1000 =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, total = s.total + e.value, lastMs = t))
                case Some(s) =>
                  closed += SessionOut(userId, s.nEvents, s.total, (s.lastMs - s.startMs) / 1000.0)
                  cur = Some(SessionState(1, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (streaming) {
                // must stay ahead of the current watermark or Spark rejects it
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(math.max(s.lastMs + gapSec * 1000, wm + 1))
              }
            }
            closed.result().iterator
          }
        })
  }
}
