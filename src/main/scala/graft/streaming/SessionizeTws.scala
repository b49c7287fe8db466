package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import SessionizeStream.{micros, round2, Event, Session, SessionState}

/** Sessionization on the Spark-4 `transformWithState` API — the same
  * semantics as [[SessionizeStream]] (gap-closed data-driven sessions)
  * rebuilt on the successor to `flatMapGroupsWithState`, exercising the
  * parts the running-totals processor doesn't: EVENT-TIME timers
  * (`registerTimer`/`handleExpiredTimer`) close idle sessions when the
  * watermark passes last_ts + gap, replacing `GroupStateTimeout`.
  *
  * Emission is FULLY DEFERRED to the timer: `handleInputRows` only folds
  * events into a buffered list of pending session aggregates; nothing is
  * emitted until the watermark STRICTLY passes a session's
  * `last_ts + gap`, at which point no in-watermark late event can bridge
  * its trailing gap (any accepted future event has ts ≥ watermark
  * > last_ts + gap). Eager mid-batch emission is wrong in append mode: a
  * late-but-in-watermark event in a later micro-batch may bridge a gap the
  * current batch saw, merging what looked like two sessions into one —
  * exactly the case the batch window-function form handles by sorting
  * globally, and the case the spec's user-4 scenario pins.
  *
  * The state is a list of pending session AGGREGATES, not raw events:
  * late events can only MERGE sessions (extra events never increase a
  * gap), never split them, so (start, last_ts, n, sum) per pending
  * session is sufficient — folding a batch is an interval-merge over
  * (pending ++ incoming-as-singletons) sorted by start. State per key is
  * therefore ∝ sessions inside the watermark delay, not events — with
  * per-variable RocksDB storage, explicit timer management (one close
  * timer per key, re-armed as sessions extend), this is the 100 TB
  * posture: state ∝ concurrently-active users, spill-safe, and
  * late-data-correct.
  *
  * Batch equivalence (against [[graft.ops.Sessions]]'s window-function
  * form) is spec-tested on identical input, including a cross-batch
  * in-watermark late event that bridges two provisional sessions.
  */
object SessionizeTws {

  /** Gap-closed session processor: ListState holds pending session
    * aggregates (sorted by start, pairwise gaps > gap); a single
    * event-time timer per key fires when the watermark clears the
    * earliest pending session's close deadline.
    */
  class SessionProcessor(gapMicros: Long)
      extends StatefulProcessor[Long, Event, Session] {
    @transient private var pending: ListState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getListState[SessionState](
        "pending", Encoders.product[SessionState], TTLConfig.NONE)

    /** Interval-merge: sort by start, fold left, merging whenever the next
      * session starts within `gapMicros` of the running session's last
      * event — the exact partition the batch form's global sort produces,
      * because every intra-session event chain already has gaps ≤ gap.
      */
    private def mergeSorted(ss: Seq[SessionState]): List[SessionState] =
      ss.sortBy(s => (micros(s.start), micros(s.lastTs)))
        .foldLeft(List.empty[SessionState]) {
          case (prev :: rest, s)
              if micros(s.start) - micros(prev.lastTs) <= gapMicros =>
            SessionState(prev.start,
              if (micros(s.lastTs) > micros(prev.lastTs)) s.lastTs
              else prev.lastTs,
              prev.n + s.n, prev.total + s.total) :: rest
          case (acc, s) => s :: acc
        }.reverse

    /** First ms tick STRICTLY after last_ts + gap: timers are a ms API, so
      * when this fires the watermark (≥ the timer) exceeds last_ts + gap
      * by at least 1 µs — an event exactly AT last_ts + gap (which still
      * merges, the batch split condition is strict >) can no longer be
      * admitted, so the session is final.
      */
    private def closeDeadlineMs(s: SessionState): Long =
      Math.floorDiv(micros(s.lastTs) + gapMicros, 1000L) + 1L

    override def handleInputRows(
        user: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      val incoming =
        rows.map(e => SessionState(e.ts, e.ts, 1L, e.value)).toSeq
      if (incoming.nonEmpty) {
        val merged = mergeSorted(pending.get().toSeq ++ incoming)
        pending.put(merged.toArray)
        // one live close-timer per key, armed at the EARLIEST pending
        // deadline; later sessions get their timers re-armed as earlier
        // ones flush
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(merged.map(closeDeadlineMs).min)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      val wmMicros = timerValues.getCurrentWatermarkInMs() * 1000L
      val all = pending.get().toSeq
      val (closed, still) =
        all.partition(s => micros(s.lastTs) + gapMicros < wmMicros)
      if (still.isEmpty) pending.clear() else pending.put(still.toArray)
      if (still.nonEmpty) getHandle.registerTimer(
        still.map(closeDeadlineMs).min)
      closed.iterator.map(s => Session(user, s.start, s.n, round2(s.total)))
    }
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
