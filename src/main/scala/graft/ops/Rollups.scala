package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Reference-parity analytics (SURVEY.md §2.4 A1-A7) expressed over the
  * driver's `events` table, which plays the role of the reference's
  * `analytics.sales_orders` (event_type ≙ category/status, value ≙
  * total_amount, ts ≙ order_timestamp; see FIXTURES.md §B).
  *
  * Each query is a declarative DataFrame program: Catalyst handles column
  * pruning and predicate pushdown into the parquet scan, and the hourly/daily
  * group-bys are single-shuffle partial-aggregate plans (map-side combine
  * before exchange) — the shape that scales linearly with input on a real
  * cluster.
  */
object Rollups {

  /** A1 (`clickhouse/init/01_init.sql:63-74`): filtered hourly group-by
    * rollup — the hourly materialized-view semantics, batch form.
    * Filter → date_trunc bucket → grouped count/sum. The filter is pushed to
    * the scan; the aggregate is partial+final around one hash exchange.
    */
  def hourlyRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type").as("event_type"))
      .agg(
        count(lit(1)).as("order_count"),
        round(sum("value"), 2).as("total_revenue"))
      .orderBy("hour", "event_type")

  /** A2 (`01_init.sql:77-87`): filtered daily group-by rollup (daily MV
    * semantics; the reference keys by (date, region), here (date,
    * event_type)).
    */
  def dailyRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") =!= "error")
      .groupBy(to_date(col("ts")).as("date"), col("event_type"))
      .agg(
        count(lit(1)).as("order_count"),
        round(sum("value"), 2).as("total_revenue"))
      .orderBy("date", "event_type")

  /** A3 (`01_init.sql:44-58` SummingMergeTree): read-side compaction of a
    * partial-aggregate rollup. We materialize block-local partials (grouped
    * by an extra sub-key, like the MV's per-insert-block partials) and fold
    * them with a second groupBy.sum — additive re-aggregation semantics.
    * Both aggregations are partial+final; the second one is cheap because
    * the partials table is tiny.
    */
  def rollupCompact(spark: SparkSession, sfDir: String): DataFrame = {
    val partials = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"),
        // per-"insert-block" sub-key: partials for the same (hour, type)
        // land in distinct rows, as SummingMergeTree sees them pre-merge
        (col("event_id") % 7).as("block"))
      .agg(count(lit(1)).as("pc"), sum("value").as("pv"))
    partials
      .groupBy(col("hour"), col("event_type"))
      .agg(
        sum("pc").as("order_count"),
        round(sum("pv"), 2).as("total_revenue"))
      .orderBy("hour", "event_type")
  }

  /** A4 (dashboard tiles "Total Order"/"Total Revenue",
    * Sample_Dashboard.png): global count + sum, no grouping — a single
    * partial-aggregate pass, one row out.
    */
  def globalTotals(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .agg(
        count(lit(1)).as("total_orders"),
        round(sum("value"), 2).as("total_revenue"))

  /** A5 (dashboard donut "Sales by Category"): share-of-total via an
    * empty-frame window over the aggregated (tiny) result — the window runs
    * over the handful of groups, never the raw data.
    */
  def shareOfTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val byType = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(sum("value").as("rev"))
    // pct is a ratio of two *rounded* sums — never round a ratio directly:
    // engines differ in ulps on raw float aggregates, and rounding a ratio
    // at a .xx5 boundary flips between them. Dividing identical rounded
    // doubles is IEEE-deterministic on both sides.
    byType
      .withColumn("total", round(sum("rev").over(Window.partitionBy()), 2))
      .select(
        col("event_type"),
        round(col("rev"), 2).as("revenue"),
        (round(col("rev"), 2) * 100.0 / col("total")).as("pct"))
      .orderBy("event_type")
  }

  /** A6 (dashboard bar "Sales by Region", descending): grouped sum with a
    * presentation sort. Sort keys include the group key for determinism.
    */
  def revenueByTypeDesc(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(round(sum("value"), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("event_type"))

  /** A7 (dashboard "Hourly Sales Trend"): multi-measure hourly time series
    * over all events (unfiltered, unlike A1).
    */
  def hourlyTrend(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("orders"),
        round(sum("value"), 2).as("revenue"),
        // avg as rounded-sum / count (not round(avg)): deterministic across
        // engines — see shareOfTotal for the ulp/rounding rationale
        (round(sum("value"), 2) / count(lit(1))).as("avg_value"))
      .orderBy("hour")

  /** P6+P7 (`01_init.sql:66-73`): the MV's filter+project shape on raw rows.
    * `.explain` shows PushedFilters: [EqualTo(event_type,purchase)] and a
    * 4-column ReadSchema — the scan never materializes unused columns.
    */
  def filterProject(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id"),
        round(col("value"), 2).as("value"))
      .orderBy("event_id")

  /** Approximate distinct users per event type (HyperLogLog++, 1.5% rsd)
    * next to the exact count — the approx operator a 100 TB engine uses
    * where exact countDistinct would shuffle every distinct key. No oracle:
    * DuckDB's HLL implementation produces different estimates by design,
    * so the driver records a rows-only check; the spec suite asserts the
    * estimate lands within the configured error of exact.
    */
  def approxDistinctUsers(spark: SparkSession, sfDir: String): DataFrame =
    // no spread: measured 2.1 s with a pre-aggregate repartition vs 1.5 s
    // letting the partial sketch fold map-side on the single-split scan —
    // the narrow shuffle costs more than 32-way sketch parallelism buys
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.015).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy("event_type")

  /** The HASH-GATED surface of [[approxDistinctUsers]]: sketch internals
    * aren't cross-engine comparable, but the ERROR CONTRACT is — emit the
    * exact count plus the 3·rsd bounded-error boolean, so the DuckDB
    * oracle (exact count, literal TRUE) pins "the estimate exists and
    * lands in bound" to values. A sketch drifting out of bound flips the
    * boolean and fails the hash; ApproxSpec still asserts the tighter
    * distributional claim on the raw estimates.
    */
  def approxDistinctUsersGated(spark: SparkSession, sfDir: String): DataFrame =
    approxDistinctUsers(spark, sfDir)
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users").cast("double") * (3 * 0.015)).as("approx_ok"))
      .orderBy("event_type")

  /** F14 / events.props: JSON field extraction. Uses get_json_object
    * (codegen'd path over the string column); the oracle uses a regexp so
    * the DuckDB side needs no JSON extension.
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    // no spread: the props shuffle costs more than the single-task parse
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        // integer sum / integer count: exact operands, deterministic quotient
        (sum("k").cast("double") / count(lit(1))).as("avg_k"))
      .orderBy("event_type")

  /** Sliding-window trend: 2-hour windows sliding by 1 hour (the reference
    * has tumbling buckets only, §2.5 — this is the generalization a trend
    * dashboard needs). `window(ts, 2h, 1h)` expands each row into its two
    * covering windows BEFORE the shuffle, so the plan stays one partial+
    * final aggregate around a single exchange — the row fan-out is the
    * window overlap factor (2×), constant in data size.
    */
  def slidingTrend(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_orders"), round(sum("value"), 2).as("revenue"))
      .select(col("window.start").as("window_start"),
        col("n_orders"), col("revenue"))
      .orderBy("window_start")

  /** Pivot (crosstab): daily revenue with one column per event type — the
    * dashboard matrix view. Expressed as conditional aggregates rather
    * than `Dataset.pivot`: the built-in pivot (even with a fixed value
    * list) plans two stacked hash aggregations — groupBy(date, type) then
    * pivot over date, two exchanges — where conditional sums need ONE
    * exchange, and no value-inference collect job runs either way.
    */
  def pivotDailyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("date"))
      .agg(
        round(sum(when(col("event_type") === types.head, col("value"))), 2)
          .as(types.head),
        types.tail.map(t =>
          round(sum(when(col("event_type") === t, col("value"))), 2).as(t)): _*)
      .orderBy("date")
  }

  /** Seasonality profile: purchase volume by (day-of-week × hour-of-day) —
    * the periodic view next to the chronological A7 trend (staffing/alert
    * baselines read this shape). Both period keys are ENGINE-NEUTRAL
    * integer arithmetic on epoch microseconds — `dow = (days + 4) % 7`
    * (0 = Sunday; 1970-01-01 was a Thursday) and
    * `hour = (µs mod day) div hour` — because the engines' native
    * dayofweek() disagree on numbering (Spark 1=Sunday, DuckDB
    * 0=Sunday). share_ppm is integer count cross-division. One
    * partial-aggregating shuffle on ≤168 keys.
    */
  def seasonalProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val cell = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .withColumn("dow",
        expr("((unix_micros(ts) div 86400000000) + 4) % 7"))
      .withColumn("hour",
        expr("(unix_micros(ts) % 86400000000) div 3600000000"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
          .as("revenue"))
    val total = cell.agg(sum("n_orders").as("total_orders"))
    cell.crossJoin(broadcast(total))
      .select(col("dow").cast("long").as("dow"), col("hour"),
        col("n_orders"), col("revenue"),
        expr("n_orders * 1000000 div total_orders").as("share_ppm"))
      .orderBy("dow", "hour")
  }
}
