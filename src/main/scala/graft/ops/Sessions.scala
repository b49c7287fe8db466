package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sessionization over the events stream: consecutive events of a user
  * belong to one session while gaps stay under `gapMinutes`. The batch form
  * is the classic two-window program — new-session flags via lag, session
  * ids via running sum — with a single shuffle on user_id reused by both
  * windows and the final group-by (same partitioning key, Catalyst plans
  * one exchange). The streaming form with custom state lives in
  * [[graft.streaming.SessionizeStream]]; the two are equivalence-tested.
  */
object Sessions {

  def sessionize(spark: SparkSession, sfDir: String,
                 gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    // exact microsecond integers on both engines (unix_micros / epoch_us):
    // unix_timestamp would truncate to whole seconds and disagree with a
    // fractional-second oracle on gaps crossing the 1800 s boundary
    val gapMicros = gapMinutes * 60L * 1000000L
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("new_s",
        when(lag("ts", 1).over(byUser).isNull ||
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(byUser))
            > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_s").over(byUser))
      .groupBy("user_id", "sid")
      .agg(
        min("ts").as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("user_id", "sid")
  }

  /** The same sessionization via Spark's built-in `session_window`
    * (dynamic-gap event-time windows, usable identically in batch and
    * Structured Streaming): one hash aggregate that MERGES overlapping
    * [ts, ts+gap) windows per key — no lag/cumsum window pass at all, and
    * in streaming the state store holds one entry per open session.
    * Window end = last event + gap (half-open, so an event landing
    * exactly `gap` after the previous one opens a NEW session — the
    * oracle mirrors with `>=`).
    */
  def sessionWindows(spark: SparkSession, sfDir: String,
                     gapMinutes: Int = 30): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  /** Ordered event-SEQUENCE matching within sessions — MATCH_RECOGNIZE
    * re-expressed with engine-portable primitives: each session reduces
    * to its ordered event-initial string (deterministic (ts, event_id)
    * order), and subsequence patterns become `LIKE '%v%c%p%'` scans over
    * those strings. One row out with the session counts per funnel
    * pattern (any / saw view / view→click / view→click→purchase in
    * order / purchase-first), all integers. Plan shape: the session
    * labeling reuses the single user-keyed shuffle every session op here
    * shares; the ordered reduction is one `array_sort(collect_list)` per
    * session (bounded by session length, row-local after the session
    * aggregate); the pattern scan is a row-local LIKE over the tiny
    * per-session strings. At 100 TB nothing is global: sessions are
    * user-bounded, strings are session-bounded, and the final aggregate
    * is a 1-row combine.
    */
  def sessionPatternCounts(spark: SparkSession, sfDir: String,
                           gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapMicros = gapMinutes * 60L * 1000000L
    val strs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_s",
        when(lag("ts", 1).over(byUser).isNull ||
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(byUser))
            > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_s").over(byUser))
      .groupBy("user_id", "sid")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("i")))),
        x => x.getField("i")), "").as("es"))
    def n(pat: String) =
      sum(when(col("es").like(pat), lit(1L)).otherwise(lit(0L))).cast("long")
    strs.agg(
      count(lit(1)).as("n_sessions"),
      n("%v%").as("n_view"),
      n("%v%c%").as("n_view_click"),
      n("%v%c%p%").as("n_view_click_purchase"),
      n("p%").as("n_purchase_first"))
  }
}
