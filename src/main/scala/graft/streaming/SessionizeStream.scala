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
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: Timestamp, n_events: Long,
                     total_value: Double)

  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
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
            Iterator.single(
              Session(user, new Timestamp(s.start), s.n, round2(s.total)))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  open = Some(SessionState(s.start, math.max(s.lastTs, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(user, new Timestamp(s.start), s.n,
                    round2(s.total))
                  open = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close the session once the watermark clears last_ts + gap
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  private def round2(v: Double): Double = math.round(v * 100.0) / 100.0
}
