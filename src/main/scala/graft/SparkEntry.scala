package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered in [[queries]]
  * as `(SparkSession, sfDir) => DataFrame`; SQL-expressible ones carry a
  * DuckDB oracle in [[oracleSql]] with identical column names and ordering.
  */
object SparkEntry {

  /** Flagship query on sf=0.001 — the reference's hourly MV rollup
    * (`clickhouse/init/01_init.sql:63-74`) over the events table; driver
    * smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Rollups.hourlyRollup(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rollup_hourly" -> (Rollups.hourlyRollup _),
    "rollup_daily" -> (Rollups.dailyRollup _),
    "rollup_compact" -> (Rollups.rollupCompact _),
    "global_totals" -> (Rollups.globalTotals _),
    "share_of_total" -> (Rollups.shareOfTotal _),
    "revenue_by_type_desc" -> (Rollups.revenueByTypeDesc _),
    "hourly_trend" -> (Rollups.hourlyTrend _),
    "filter_project" -> (Rollups.filterProject _),
    "json_extract" -> (Rollups.jsonExtract _)
  )

  def oracleSql: Map[String, String] = Map(
    "rollup_hourly" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
        |count(*) AS order_count, round(sum(value), 2) AS total_revenue
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rollup_daily" ->
      """SELECT (ts::DATE) AS date, event_type,
        |count(*) AS order_count, round(sum(value), 2) AS total_revenue
        |FROM events WHERE event_type <> 'error'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rollup_compact" ->
      """SELECT hour, event_type, sum(pc) AS order_count,
        |round(sum(pv), 2) AS total_revenue
        |FROM (
        |  SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
        |         event_id % 7 AS block, count(*) AS pc, sum(value) AS pv
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "global_totals" ->
      """SELECT count(*) AS total_orders, round(sum(value), 2) AS total_revenue
        |FROM events""".stripMargin,
    "share_of_total" ->
      """SELECT event_type, round(rev, 2) AS revenue,
        |round(rev, 2) * 100.0 / round(sum(rev) OVER (), 2) AS pct
        |FROM (SELECT event_type, sum(value) AS rev FROM events GROUP BY 1)
        |ORDER BY event_type""".stripMargin,
    "revenue_by_type_desc" ->
      """SELECT event_type, round(sum(value), 2) AS revenue
        |FROM events GROUP BY 1 ORDER BY revenue DESC, event_type ASC""".stripMargin,
    "hourly_trend" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, count(*) AS orders,
        |round(sum(value), 2) AS revenue,
        |round(sum(value), 2) / count(*) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "filter_project" ->
      """SELECT event_id, ts::TIMESTAMP AS ts, user_id, round(value, 2) AS value
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "json_extract" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |CAST(sum(k) AS DOUBLE) / count(*) AS avg_k
        |FROM (SELECT event_type,
        |      CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
        |      FROM events)
        |WHERE k IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
