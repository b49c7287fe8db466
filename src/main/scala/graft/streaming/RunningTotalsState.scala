package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Spark-4-native arbitrary state (`transformWithState`, SPARK-46815): a
  * per-key running (count, sum) processor — the "running metrics" shape of
  * the reference's live dashboard counters (its ClickHouse dashboards
  * re-aggregate on read; here the engine carries the running state) on the
  * successor API to `mapGroupsWithState`.
  *
  * Why this API at scale: state lives in a per-partition RocksDB store
  * (spillable, changelog-checkpointed, not heap-bound like the HDFS-backed
  * map), TTL is declarative per state variable, and the processor can hold
  * several independently-typed state variables — the properties that keep
  * million-key running state viable on a 1000-executor cluster.
  *
  * The TTL is a real retention bound (reference analogue: its 365-day
  * ClickHouse TTL): keys idle past the bound drop their state instead of
  * growing it forever.
  */
object RunningTotalsState {

  /** Per-user running totals processor: ValueState[(count, sum)] updated
    * per micro-batch, emitting the post-batch running value for every key
    * that saw input (update-mode semantics).
    */
  class RunningTotals(ttl: TTLConfig)
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.product[(Long, Double)], ttl)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      var (c, s) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { r => c += 1; s += r._2 }
      totals.update((c, s))
      Iterator.single((key, c, s))
    }
  }

  /** (user_id, value) stream → (user_id, running count, running sum),
    * one row per key per micro-batch that touched it.
    */
  def runningTotals(events: Dataset[(Long, Double)],
                    ttl: TTLConfig = TTLConfig.NONE)
      : Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningTotals(ttl), TimeMode.None(),
        OutputMode.Update())
  }
}
