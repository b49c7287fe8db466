package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** AS-OF (point-in-time) join — the feature-store primitive the builder
  * brief lists among operators Spark lacks natively: for each left row,
  * the single right row with the greatest timestamp ≤ the left timestamp,
  * per key.
  *
  * Implemented by COMPOSITION (preference (a) — no custom plan node
  * needed): tag and union both sides, then one carry-forward window
  * (`last(payload, ignoreNulls)` over rows-unbounded-preceding) per key in
  * time order. One hash shuffle on the key, a per-partition sort, zero
  * range fan-out — the scalable pattern (an inequality theta-join would
  * cross-product inside key groups; this is linear in rows). At 100 TB the
  * same plan holds: shuffle by key, sort by (t, side) within partitions.
  *
  * Right side is pre-deduplicated to one row per (key, t) so tie handling
  * is engine-independent; ordering puts right rows before left rows at
  * equal t, giving `>=` (inclusive) as-of semantics — matching DuckDB's
  * native ASOF JOIN, which is the oracle.
  */
object AsOf {

  /** Each event joined to the user's latest order at-or-before the event
    * time: `events ASOF LEFT JOIN orders ON user_id = o_custkey AND
    * ts >= o_orderdate`.
    */
  def eventsAsOfOrders(spark: SparkSession, sfDir: String): DataFrame = {
    // one row per (custkey, orderdate): keep the max orderkey, its price
    val orders = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max_by(
        struct(col("o_orderkey"), col("o_totalprice")), col("o_orderkey"))
        .as("o"))
      .select(col("o_custkey").as("key"),
        // orders carry TIMESTAMP_NTZ; unify on session-TZ TIMESTAMP (UTC)
        col("o_orderdate").cast("timestamp").as("t"),
        col("o.o_orderkey").as("o_orderkey"),
        col("o.o_totalprice").as("o_totalprice"))
      .withColumn("side", lit(0))
    val events = Tables.events(spark, sfDir)
      .select(col("user_id").as("key"), col("ts").cast("timestamp").as("t"),
        col("event_id"), col("event_type"))
      .withColumn("side", lit(1))

    val unioned = orders
      .withColumn("event_id", lit(null).cast("long"))
      .withColumn("event_type", lit(null).cast("string"))
      .select("key", "t", "side", "event_id", "event_type",
        "o_orderkey", "o_totalprice")
      .unionByName(events
        .withColumn("o_orderkey", lit(null).cast("long"))
        .withColumn("o_totalprice", lit(null).cast("double"))
        .select("key", "t", "side", "event_id", "event_type",
          "o_orderkey", "o_totalprice"))

    // carry the latest order forward in (t, side) order: at equal t the
    // order row (side 0) sorts first, so the event at t sees it (>= match)
    val w = Window.partitionBy("key").orderBy("t", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_orderkey", last("o_orderkey", ignoreNulls = true).over(w))
      .withColumn("asof_price", last("o_totalprice", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("key").as("user_id"), col("t").as("ts"),
        col("event_type"), col("asof_orderkey"), col("asof_price"))
      .orderBy("event_id")
  }

  /** The SAME as-of query through the custom plan node
    * ([[graft.plans.AsOfJoin]] → [[graft.plans.AsOfJoinExec]], preference
    * tier (c)): no union, no window — each side shuffles once in its own
    * schema and the sorted per-partition streams merge with an O(1)
    * forward pointer. Registered against the IDENTICAL DuckDB ASOF-JOIN
    * oracle as [[eventsAsOfOrders]], so the hash gate proves the custom
    * physical operator equivalent to both the composed form and the
    * native reference semantics.
    */
  def eventsAsOfOrdersCustom(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // installs the strategy
    val orders = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max_by(
        struct(col("o_orderkey"), col("o_totalprice")), col("o_orderkey"))
        .as("o"))
      .select(col("o_custkey").as("key"),
        col("o_orderdate").cast("timestamp").as("t"),
        col("o.o_orderkey").as("o_orderkey"),
        col("o.o_totalprice").as("o_totalprice"))
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    graft.plans.AsOfJoinApi
      .asofJoin(events, orders, "user_id", "key", "ts", "t")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("o_orderkey").as("asof_orderkey"),
        col("o_totalprice").as("asof_price"))
      .orderBy("event_id")
  }

  /** Self-table as-of through the custom node: each PURCHASE joined to the
    * same user's latest at-or-before VIEW — the exact-join sibling of the
    * windowed last-touch attribution (which buckets and aggregates; this
    * emits the matched row pair itself, the shape a feature-store
    * backfill writes). Right side deduped to one view per (user, ts)
    * with the max event_id, so tie handling is part of the definition.
    * Same DuckDB ASOF LEFT JOIN oracle discipline as
    * [[eventsAsOfOrders]].
    */
  def purchasesAsOfViews(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val ev = Tables.events(spark, sfDir)
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"),
        col("ts").cast("timestamp").as("v_ts"))
      .agg(max("event_id").as("view_event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"))
    graft.plans.AsOfJoinApi
      .asofJoin(purchases, views, "user_id", "v_user", "ts", "v_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("view_event_id"), col("v_ts").as("view_ts"))
      .orderBy("event_id")
  }
}
