package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic sales-order generator mirroring the reference
  * producer's distributions (`producers/sales_producer.py:96-138`, SURVEY.md
  * §1.4) — NOT its implementation. The reference draws from Python `random`
  * in a driver-side loop; here every field is a pure hash of the row id
  * (Murmur3 via `hash(id, salt)`), so the data is:
  *
  *   - fully deterministic regardless of partitioning / parallelism (no
  *     `rand(seed)`, whose stream depends on partition layout),
  *   - distributed — `spark.range(n)` scales to any row count with no
  *     driver loop,
  *   - identical between the batch and streaming variants.
  *
  * Dimension enrichment is expressed the way the reference's in-memory
  * pools really behave (SURVEY.md §2.3 J1): the order stream broadcast-hash-
  * joins a 500-row customer dim (sticky region,
  * `sales_producer.py:77-86`) and a 30-product catalog
  * (`sales_producer.py:26-67`).
  *
  * Distribution shape preserved (values are our own):
  *   - closed customer pool CUST-0001…CUST-0500, region functionally
  *     dependent on customer_id;
  *   - 30 products in 5 categories with fixed unit prices;
  *   - quantity uniform 1–5 (`sales_producer.py:107`);
  *   - order_status weighted 3/5 completed (`sales_producer.py:71`);
  *   - discount weighted toward 0;
  *   - total_amount = round(q*p*(1-d/100), 2) (`sales_producer.py:111-113`);
  *   - order_id = ORD-2026-NNNNN with NNNNN in [10000,99999] — collisions
  *     occur by design (birthday bound, SURVEY.md §1.4);
  *   - timestamps confined to one UTC day (`sales_producer.py:134-137`).
  */
object SalesGen {

  val Day = "2026-01-17"
  private val dayEpochSeconds: Long =
    java.time.LocalDate.parse(Day).atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond

  private val categories =
    Seq("Electronics", "Fashion", "Home", "Beauty", "Sports")
  private val regions = Seq(
    "Bangkok", "Central", "East", "North", "Northeast", "South", "West")
  private val payments =
    Seq("credit_card", "debit_card", "bank_transfer", "e_wallet", "cod")
  private val reps = Seq("Rep-A", "Rep-B", "Rep-C", "Rep-D", "Rep-E")

  /** Murmur3 of (row id, salt) folded into [0, m). */
  private def h(id: Column, salt: Int, m: Int): Column =
    pmod(hash(id, lit(salt)), lit(m))

  /** Inverse-CDF weighted pick over cumulative percent thresholds
    * (SURVEY.md §2.8 F13): e.g. weights 60/15/15/10 → thresholds
    * 60,75,90. Deterministic per row id.
    */
  private def weighted(id: Column, salt: Int,
                       choices: Seq[(String, Int)]): Column = {
    val u = h(id, salt, 100)
    val cum = choices.scanLeft(0)(_ + _._2).tail
    choices.zip(cum).init.foldRight(lit(choices.last._1): Column) {
      case (((v, _), c), rest) => when(u < c, v).otherwise(rest)
    }
  }

  /** 30-product catalog: product_id, product_name, category, unit_price.
    * Fixed prices per product, 6 products per category.
    */
  def productDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 30).map { i =>
      val cat = categories(i / 6)
      (f"PROD-${i + 1}%03d", s"$cat Item ${i % 6 + 1}", cat,
        math.round((9.99 + i * 137.0 % 990) * 100) / 100.0)
    }.toDF("product_id", "product_name", "category", "unit_price")
  }

  /** 500-customer pool with sticky region + name/email. */
  def customerDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (1 to 500).map { i =>
      val region = regions(i % regions.size)
      (f"CUST-$i%04d", s"Customer $i", f"cust$i%04d@example.com", region)
    }.toDF("customer_id", "customer_name", "customer_email", "region")
  }

  /** `n` deterministic orders as a typed wide DataFrame (the producer's
    * output shape, pre-serialization). The two dim joins are broadcast
    * (dims are tiny and static) — at 100 TB the fact side streams through
    * map-side hash joins with zero shuffle.
    */
  def orders(spark: SparkSession, n: Long): DataFrame =
    enrich(spark, spark.range(n).toDF("id"), keepId = true)

  /** The same orders serialized exactly as the reference producer ships
    * them (`sales_producer.py:134-137,162`): one JSON object per row in a
    * `value` column, timestamp ISO-8601 with a literal 'Z'.
    */
  def ordersJson(spark: SparkSession, n: Long): DataFrame =
    orders(spark, n)
      .drop("_gen_id")
      .withColumn("order_timestamp",
        date_format(col("order_timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .select(to_json(struct(col("*"))).as("value"))

  /** Streaming variant on the `rate` source (S4): ~`rowsPerSecond`
    * orders/sec, same per-id field derivation, so a streaming run is
    * row-for-row comparable with `orders(spark, n)` on the same id range.
    * Stream-static broadcast joins against the dims are supported by
    * Structured Streaming.
    */
  def orderStream(spark: SparkSession, rowsPerSecond: Int = 20): DataFrame = {
    val raw = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(col("value").as("id"))
    enrich(spark, raw)
  }

  /** Shared enrichment: any DataFrame with an `id` column → full order
    * rows. Used by both batch and streaming variants; `keepId` appends the
    * source id as `_gen_id` (stable row key for tests).
    */
  private[graft] def enrich(spark: SparkSession, ids: DataFrame,
                            keepId: Boolean = false): DataFrame = {
    val id = col("id")
    val enriched = ids
      .withColumn("order_id",
        format_string("ORD-2026-%05d", h(id, 1, 90000) + 10000))
      .withColumn("customer_id", format_string("CUST-%04d", h(id, 2, 500) + 1))
      .withColumn("product_id", format_string("PROD-%03d", h(id, 3, 30) + 1))
      .withColumn("quantity", (h(id, 4, 5) + 1).cast("int"))
      .withColumn("discount_percent",
        weighted(id, 5, Seq("0" -> 50, "5" -> 20, "10" -> 15, "15" -> 10,
          "20" -> 5)).cast("double"))
      .withColumn("payment_method",
        weighted(id, 6, Seq(payments(0) -> 35, payments(1) -> 20,
          payments(2) -> 15, payments(3) -> 20, payments(4) -> 10)))
      .withColumn("sales_rep", element_at(
        array(reps.map(lit): _*), (h(id, 7, reps.size) + 1).cast("int")))
      .withColumn("order_status",
        weighted(id, 8, Seq("completed" -> 60, "pending" -> 15,
          "shipped" -> 15, "cancelled" -> 10)))
      .withColumn("order_timestamp",
        timestamp_seconds(lit(dayEpochSeconds) + h(id, 9, 86400)))
      .join(broadcast(customerDim(spark)), "customer_id")
      .join(broadcast(productDim(spark)), "product_id")
      .withColumn("total_amount",
        round(col("quantity") * col("unit_price") *
          (lit(1.0) - col("discount_percent") / 100.0), 2))
      .select((Seq("order_id", "customer_id", "customer_name",
        "customer_email", "product_id", "product_name", "category",
        "quantity", "unit_price", "discount_percent", "total_amount",
        "payment_method", "region", "sales_rep", "order_status",
        "order_timestamp").map(col) ++
        (if (keepId) Seq(id.as("_gen_id")) else Nil)): _*)
    enriched
  }
}
