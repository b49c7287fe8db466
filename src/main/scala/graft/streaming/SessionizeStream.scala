package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit per-key state
  * (`flatMapGroupsWithState`) — the one streaming construct the built-in
  * windowed aggregates can't express: session boundaries depend on the
  * DATA (inter-event gaps), not on wall-aligned windows.
  *
  * State per user = the open session (start, last ts, count, sum). A
  * micro-batch's events fold in event-time order; a gap > `gapMinutes`
  * closes the open session and emits it (append mode). An event-time
  * timeout closes idle sessions once the watermark passes last_ts + gap, so
  * state is bounded by the number of concurrently-active users — the 100 TB
  * posture for this operator (state ∝ active keys, not history).
  *
  * Equivalence with the batch window-function form
  * ([[graft.ops.Sessions.sessionize]]) is spec-tested on identical input.
  */
object SessionizeStream {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Timestamp, lastTs: Timestamp, n: Long,
                          total: Double)
  case class Session(user_id: Long, session_start: Timestamp, n_events: Long,
                     total_value: Double)

  /** Exact microseconds of a Timestamp — gap comparisons must match the
    * batch form's unix_micros precision, not Timestamp.getTime's
    * millisecond truncation (a 1800.0004 s gap would otherwise split in
    * batch but merge here).
    */
  private[streaming] def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("value").cast("double"))
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last_ts + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.n, round2(s.total)))
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = micros(e.ts)
              open match {
                case Some(s) if t - micros(s.lastTs) <= gapMicros =>
                  open = Some(SessionState(s.start,
                    if (t > micros(s.lastTs)) e.ts else s.lastTs,
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(user, s.start, s.n, round2(s.total))
                  open = Some(SessionState(e.ts, e.ts, 1L, e.value))
                case None =>
                  open = Some(SessionState(e.ts, e.ts, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close once the watermark clears last_ts + gap; timeout is
              // a ms API, so ceil the microsecond deadline
              state.setTimeoutTimestamp(
                Math.floorDiv(micros(s.lastTs) + gapMicros + 999L, 1000L))
            }
            closed.result().iterator
          }
      }
  }

  private[streaming] def round2(v: Double): Double =
    math.round(v * 100.0) / 100.0
}
