package graft

import org.apache.spark.sql.functions._

import graft.gen.SalesGen

/** Generator invariants from SURVEY.md §1.4. */
class GenSpec extends SparkSpec {

  private lazy val orders = SalesGen.orders(spark, 2000).cache()

  test("total_amount = round(q*p*(1-d/100), 2) for every row") {
    val bad = orders.filter(
      abs(col("total_amount") -
        round(col("quantity") * col("unit_price") *
          (lit(1.0) - col("discount_percent") / 100.0), 2)) > 1e-9)
    assert(bad.count() === 0)
  }

  test("customer pool is closed (CUST-0001..CUST-0500) and region is " +
       "functionally dependent on customer_id") {
    val ids = orders.select("customer_id").distinct()
    assert(ids.count() <= 500)
    assert(ids.filter(!col("customer_id").rlike("^CUST-0[0-5][0-9][0-9]$"))
      .count() === 0)
    val fd = orders.groupBy("customer_id")
      .agg(countDistinct("region").as("n")).filter(col("n") > 1)
    assert(fd.count() === 0)
  }

  test("order_status weighted ~3/5 completed; quantity in 1..5") {
    val n = orders.count().toDouble
    val completed = orders.filter(col("order_status") === "completed").count()
    assert(completed / n > 0.5 && completed / n < 0.7)
    val qs = orders.agg(min("quantity"), max("quantity")).head()
    assert(qs.getInt(0) >= 1 && qs.getInt(1) <= 5)
  }

  test("order_id format ORD-2026-NNNNN with natural collisions") {
    assert(orders.filter(!col("order_id").rlike("^ORD-2026-\\d{5}$"))
      .count() === 0)
    // 2000 draws from 90k ids: collisions essentially certain (birthday)
    assert(orders.select("order_id").distinct().count() < 2000)
  }

  test("timestamps confined to the generator day (UTC)") {
    val r = orders.agg(
      min(to_date(col("order_timestamp"))), max(to_date(col("order_timestamp"))))
      .head()
    assert(r.getDate(0).toString === SalesGen.Day)
    assert(r.getDate(1).toString === SalesGen.Day)
  }

  test("generation is deterministic and partitioning-independent") {
    val a = SalesGen.orders(spark, 500).orderBy("_gen_id").collect()
    val b = graft.gen.SalesGen.enrich(spark,
      spark.range(500).repartition(13).toDF("id"), keepId = true)
      .orderBy("_gen_id").collect()
    assert(a.sameElements(b))
  }

  test("rate-source stream (S4) produces valid orders at the configured pace") {
    val q = SalesGen.orderStream(spark, rowsPerSecond = 200)
      .writeStream
      .format("memory").queryName("rate_orders")
      .outputMode("append")
      .start()
    try {
      // let the rate source emit a couple of micro-batches
      val deadline = System.nanoTime() + 15L * 1000000000L
      var n = 0L
      while (n == 0 && System.nanoTime() < deadline) {
        Thread.sleep(500)
        q.processAllAvailable()
        n = spark.table("rate_orders").count()
      }
      assert(n > 0, "rate source produced no rows within 15s")
      // same field derivation as the batch generator: spot-check invariants
      val bad = spark.table("rate_orders").filter(
        !col("order_id").rlike("^ORD-2026-\\d{5}$") ||
          !col("customer_id").rlike("^CUST-\\d{4}$") ||
          col("quantity") < 1 || col("quantity") > 5)
      assert(bad.count() === 0)
    } finally q.stop()
  }
}
