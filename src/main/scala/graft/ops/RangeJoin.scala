package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval/range join — pairs within a time tolerance of each other, per
  * key. Spark has no first-class range-join operator; a naive inequality
  * join executes as a per-key cross product (O(n²) inside each key group —
  * ruinous here, where single users own thousands of events at scale).
  *
  * Implemented by BUCKETIZATION (preference (a): compose existing ops):
  * floor event time to tolerance-sized buckets, equi-join on (key, bucket)
  * with one side probing its own bucket and both neighbours, then filter
  * the exact predicate. Every true pair lands in one of the three bucket
  * alignments (|Δt| ≤ tol spans at most adjacent buckets), so the result
  * is exact while the join stays a shuffled-hash/sort-merge EQUI-join. At
  * 100 TB the fan-out is a constant 3× on one side, and shuffling on
  * (key, bucket) — not key alone — also spreads hot keys across
  * partitions, bounding skew.
  *
  * All time arithmetic is exact integer microseconds (`unix_micros` here,
  * `epoch_us` in the DuckDB oracle) — no floating-point timestamps.
  */
object RangeJoin {

  /** Pairs of events by the same user within `tolSeconds` of each other
    * (unordered pairs, reported once with event_a < event_b). Returns
    * (event_a, event_b, delta_us).
    */
  def eventPairsWithin(spark: SparkSession, sfDir: String,
                       tolSeconds: Long = 3600L): DataFrame = {
    val tolUs = tolSeconds * 1000000L
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    val probe = base
      .withColumn("b", expr(s"us div $tolUs"))
      // probe own bucket and both neighbours: covers every |Δ| ≤ tol pair
      .withColumn("pb", explode(array(col("b") - 1, col("b"), col("b") + 1)))
      .select(col("event_id").as("event_a"), col("user_id"),
        col("us").as("us_a"), col("pb"))
    val build = base
      .select(col("event_id").as("event_b"), col("user_id").as("uid_b"),
        col("us").as("us_b"), expr(s"us div $tolUs").as("bb"))
    probe.join(build,
        col("user_id") === col("uid_b") && col("pb") === col("bb") &&
          col("event_a") < col("event_b"))
      .filter(abs(col("us_a") - col("us_b")) <= tolUs)
      .select(col("event_a"), col("event_b"),
        abs(col("us_a") - col("us_b")).as("delta_us"))
      .orderBy("event_a", "event_b")
  }

  /** The SAME pairs through the custom [[graft.plans.RangeJoinExec]] band
    * join — preference tier (c): both sides shuffle ONCE on the bare user
    * key (no 3× bucket fan-out, no post-filter) and the per-partition
    * sliding-window merge emits each in-band pair exactly once. Registered
    * against the IDENTICAL DuckDB oracle as [[eventPairsWithin]], so the
    * hash gate proves the physical operator equivalent to the composed
    * form; the exchange-elision and co-partition contracts are
    * spec-asserted (RangeJoinSpec).
    */
  def eventPairsWithinCustom(spark: SparkSession, sfDir: String,
                             tolSeconds: Long = 3600L): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // installs the strategy
    val tolUs = tolSeconds * 1000000L
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    val a = base.select(col("event_id").as("event_a"),
      col("user_id"), col("us").as("us_a"))
    val b = base.select(col("event_id").as("event_b"),
      col("user_id").as("uid_b"), col("us").as("us_b"))
    graft.plans.RangeJoinApi
      .rangeJoin(a, b, "user_id", "uid_b", "us_a", "us_b", tolUs)
      // unordered pairs once: the band join emits both orientations
      .filter(col("event_a") < col("event_b"))
      .select(col("event_a"), col("event_b"),
        abs(col("us_a") - col("us_b")).as("delta_us"))
      .orderBy("event_a", "event_b")
  }
}
