package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ingest.Ingest

/** Oracle-checked exercise of the ingestion stages (SURVEY.md §2.2 P1-P5):
  * serialize orders to JSON lines exactly as the reference producer does
  * (ISO-8601 timestamp + literal 'Z', `producers/sales_producer.py:134-137,
  * 162`), push them through the full parse/coerce/timestamp-fallback
  * pipeline (`consumers/kafka_to_clickhouse.py:80-105`), and aggregate. A
  * lossless round-trip means the result equals the same aggregate computed
  * directly on the source table — which is exactly what the DuckDB oracle
  * computes.
  */
object IngestQueries {

  private val ordersJsonSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", StringType), // ISO+'Z' string, parsed by P5
    StructField("o_orderpriority", StringType)
  ))

  def ingestRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    // JSON encode + parse is the dominant row-local cost (see Tables.spread)
    val json = Tables.spread(Tables.orders(spark, sfDir)).select(
      to_json(struct(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
          .as("o_orderdate"),
        col("o_orderpriority"))).as("value"))
    val parsed = Ingest.fromJsonLines(json, ordersJsonSchema)
      .withColumn("o_orderdate", Ingest.parseTimestampZ(col("o_orderdate")))
    parsed
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        Num.moneySum(col("o_totalprice")).as("sum_price"),
        max(col("o_orderdate")).as("max_date"))
      .orderBy("o_orderpriority")
  }
}
