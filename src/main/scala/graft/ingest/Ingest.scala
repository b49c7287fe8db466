package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.Schemas

/** Ingestion stages (SURVEY.md §2.2 P1-P5) as composable
  * `DataFrame => DataFrame` transforms, mirroring the reference consumer's
  * hand-rolled per-message logic (`consumers/kafka_to_clickhouse.py:80-105`)
  * with declarative, codegen-friendly Column expressions. The same stages
  * serve batch (JSON-lines files) and Structured Streaming (Kafka value
  * bytes) — a DataFrame transform doesn't care which.
  */
object Ingest {

  /** P1 (`kafka_to_clickhouse.py:53`): JSON deserialize. `value` may be
    * binary (Kafka) or string (file source); cast handles both. Malformed
    * JSON yields a row of nulls (PERMISSIVE), matching the reference's
    * skip-on-error posture (`kafka_to_clickhouse.py:175-178`).
    */
  def fromJsonLines(df: DataFrame, schema: StructType, valueCol: String = "value"): DataFrame =
    df.select(from_json(col(valueCol).cast("string"), schema).as("o"))
      .select("o.*")

  /** P5 (`kafka_to_clickhouse.py:82-86`): ISO-8601-with-literal-'Z' parse
    * with fallback to ingestion time on malformed input — `try_to_timestamp`
    * returns null (not error) on bad input even under Spark 4's default
    * ANSI mode, so `coalesce` reproduces the reference's try/except.
    */
  def parseTimestampZ(c: Column): Column =
    coalesce(try_to_timestamp(regexp_replace(c, "Z$", "")), current_timestamp())

  /** P3+P4 (`kafka_to_clickhouse.py:88-105`): per-field defaulting and
    * coercion for the sales-order event. from_json already returns typed
    * columns (or null); this stage applies the reference's defaults.
    */
  def coerceAndDefault(df: DataFrame): DataFrame = {
    val stringDefaults = Seq(
      "order_id", "customer_id", "customer_name", "customer_email",
      "product_id", "product_name", "category", "payment_method",
      "region", "sales_rep")
    val withStrings = stringDefaults.foldLeft(df) { (d, f) =>
      d.withColumn(f, coalesce(col(f), lit("")))
    }
    withStrings
      .withColumn("quantity", coalesce(col("quantity").cast("int"), lit(1)))
      .withColumn("unit_price", coalesce(col("unit_price").cast("double"), lit(0.0)))
      // DDL-level DEFAULT 0 (`01_init.sql:18`)
      .withColumn("discount_percent", coalesce(col("discount_percent").cast("double"), lit(0.0)))
      .withColumn("total_amount", coalesce(col("total_amount").cast("double"), lit(0.0)))
      .withColumn("order_status", coalesce(col("order_status"), lit("unknown")))
  }

  /** `_ingested_at DateTime DEFAULT now()` (`01_init.sql:25`). */
  def withIngestedAt(df: DataFrame): DataFrame =
    df.withColumn("_ingested_at", current_timestamp())

  /** Full ingest pipeline: JSON value column → typed, defaulted, audited
    * sales-order rows (the reference's EP2 consumer path, SURVEY.md §3).
    */
  def ingestSalesOrders(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    val parsed = fromJsonLines(raw, Schemas.salesOrderJsonSchema, valueCol)
    val coerced = coerceAndDefault(parsed)
      .withColumn("order_timestamp", parseTimestampZ(col("order_timestamp")))
    withIngestedAt(coerced)
  }

  /** T6 hardening beyond the reference (which silently skips bad messages,
    * `kafka_to_clickhouse.py:175-178`): split the stream into (good, dead)
    * — malformed JSON goes to a dead-letter frame carrying the raw value
    * and a rejection timestamp instead of degrading into an all-default
    * row. Both frames are lazy views over one pass; works identically for
    * batch and streaming inputs.
    */
  def ingestWithDeadLetter(raw: DataFrame, valueCol: String = "value"): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schemaWithCorrupt = StructType(
      Schemas.salesOrderJsonSchema.fields :+ StructField("_corrupt", StringType))
    val parsed = raw.select(
      col(valueCol).cast("string").as("raw"),
      from_json(col(valueCol).cast("string"), schemaWithCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("o"))
    val good = parsed.filter(col("o._corrupt").isNull)
      .select("o.*").drop("_corrupt")
    val goodCoerced = withIngestedAt(
      coerceAndDefault(good)
        .withColumn("order_timestamp", parseTimestampZ(col("order_timestamp"))))
    val dead = parsed.filter(col("o._corrupt").isNotNull)
      .select(col("raw"), current_timestamp().as("_rejected_at"))
    (goodCoerced, dead)
  }
}
