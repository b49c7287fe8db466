package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import SessionizeStream.{micros, round2, Event, Session, SessionState}

/** Sessionization on the Spark-4 `transformWithState` API — the same
  * semantics as [[SessionizeStream]] (gap-closed data-driven sessions)
  * rebuilt on the successor to `flatMapGroupsWithState`, exercising the
  * parts the running-totals processor doesn't: EVENT-TIME timers
  * (`registerTimer`/`handleExpiredTimer`) close idle sessions when the
  * watermark passes last_ts + gap, replacing `GroupStateTimeout`.
  *
  * Why the new API matters at 100 TB: per-variable RocksDB state instead
  * of one opaque heap blob, explicit timer management (one close timer
  * per key, deleted and re-armed as the session extends), and declarative
  * TTL — state stays ∝ concurrently-active users with spill-safe storage.
  *
  * Batch equivalence (against [[graft.ops.Sessions]]'s window-function
  * form) is spec-tested on identical input, like every streaming operator
  * here.
  */
object SessionizeTws {

  /** Gap-closed session processor: ValueState holds the open session; a
    * single event-time timer per key (re-armed on every extension) closes
    * it once the watermark passes last_ts + gap.
    */
  class SessionProcessor(gapMicros: Long)
      extends StatefulProcessor[Long, Event, Session] {
    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState](
        "open", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => micros(e.ts))
      var out = List.empty[Session]
      var cur = if (open.exists()) Some(open.get()) else None
      sorted.foreach { e =>
        val t = micros(e.ts)
        cur = cur match {
          case Some(s) if t - micros(s.lastTs) > gapMicros =>
            out ::= Session(user, s.start, s.n, round2(s.total))
            Some(SessionState(e.ts, e.ts, 1L, e.value))
          case Some(s) =>
            // lastTs never regresses: a late-but-in-watermark event from a
            // later micro-batch must not rewind the session clock (the
            // batch form sorts globally; the max-guard is its equivalent)
            Some(SessionState(s.start,
              if (t > micros(s.lastTs)) e.ts else s.lastTs,
              s.n + 1, s.total + e.value))
          case None =>
            Some(SessionState(e.ts, e.ts, 1L, e.value))
        }
      }
      cur.foreach { s =>
        open.update(s)
        // one live close-timer per key: drop the stale one, re-arm at the
        // new idle deadline; timers are a ms API, so CEIL the microsecond
        // deadline — flooring would close up to 999 µs early and split a
        // gap that is exactly gapMicros (same discipline as
        // SessionizeStream's setTimeoutTimestamp)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(
          Math.floorDiv(micros(s.lastTs) + gapMicros + 999L, 1000L))
      }
      out.reverseIterator
    }

    override def handleExpiredTimer(
        user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] =
      if (open.exists()) {
        val s = open.get()
        open.clear()
        Iterator.single(Session(user, s.start, s.n, round2(s.total)))
      } else Iterator.empty
  }

  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("value").cast("double"))
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMinutes * 60L * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
