package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas for the engine.
  *
  * The sales-order event schema mirrors the reference's ClickHouse DDL
  * (`clickhouse/init/01_init.sql:7-26`) field-for-field and the producer's
  * JSON payload (`producers/sales_producer.py:118-138`). See SURVEY.md §1.3
  * for the type-mapping rationale (UInt32→Int, Float64→Double,
  * DateTime64(3)→Timestamp).
  */
object Schemas {

  /** Typed row for the ingestion boundary, where per-field defaults and
    * coercion (reference `consumers/kafka_to_clickhouse.py:88-105`) are most
    * naturally expressed. All relational work downstream uses DataFrame.
    */
  final case class SalesOrder(
      order_id: String,
      customer_id: String,
      customer_name: String,
      customer_email: String,
      product_id: String,
      product_name: String,
      category: String,
      quantity: Int,
      unit_price: Double,
      discount_percent: Double,
      total_amount: Double,
      payment_method: String,
      region: String,
      sales_rep: String,
      order_status: String,
      order_timestamp: java.sql.Timestamp
  )

  /** StructType used by `from_json` on the Kafka/JSON-lines value. Fields
    * absent from a message parse to null and are defaulted by
    * [[graft.ingest.Ingest.coerceAndDefault]] (reference
    * `kafka_to_clickhouse.py:88-105`). `order_timestamp` stays STRING here
    * because the producer emits ISO-8601 with a literal 'Z' suffix
    * (`producers/sales_producer.py:134-137`) which we parse with a fallback
    * (`kafka_to_clickhouse.py:82-86`).
    */
  val salesOrderJsonSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("customer_id", StringType),
    StructField("customer_name", StringType),
    StructField("customer_email", StringType),
    StructField("product_id", StringType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("quantity", IntegerType),
    StructField("unit_price", DoubleType),
    StructField("discount_percent", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("payment_method", StringType),
    StructField("region", StringType),
    StructField("sales_rep", StringType),
    StructField("order_status", StringType),
    StructField("order_timestamp", StringType)
  ))

  /** At-rest schema of the raw sales_orders table (reference
    * `01_init.sql:7-26`), including the engine-populated `_ingested_at`
    * audit column (`01_init.sql:25` `DateTime DEFAULT now()`).
    */
  val salesOrderTableSchema: StructType = StructType(
    salesOrderJsonSchema.fields.map {
      case StructField("order_timestamp", _, _, m) =>
        StructField("order_timestamp", TimestampType, nullable = true, m)
      case f => f
    } :+ StructField("_ingested_at", TimestampType)
  )
}
