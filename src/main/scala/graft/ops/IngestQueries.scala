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

  /** Orders serialized to the reference producer's wire shape and parsed
    * back through the full P1-P5 pipeline — the EP2 leg, shared by the
    * round-trip aggregate and the composed ETL query.
    */
  private def reingested(spark: SparkSession, sfDir: String): DataFrame = {
    // JSON encode + parse is the dominant row-local cost (see Tables.spread)
    val json = Tables.spread(Tables.orders(spark, sfDir)).select(
      to_json(struct(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
          .as("o_orderdate"),
        col("o_orderpriority"))).as("value"))
    Ingest.fromJsonLines(json, ordersJsonSchema)
      .withColumn("o_orderdate", Ingest.parseTimestampZ(col("o_orderdate")))
  }

  def ingestRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    reingested(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        Num.moneySum(col("o_totalprice")).as("sum_price"),
        max(col("o_orderdate")).as("max_date"))
      .orderBy("o_orderpriority")
  }

  /** The reference's full pipeline composed as ONE dataflow (EP2 + EP3):
    * wire-format ingest → broadcast star enrichment
    * (customer ⋈ nation ⋈ region) → regional revenue rollup → rank +
    * share-of-total. Every dimension join broadcasts, the fact stream
    * shuffles once for the rollup, and the rank/share windows run on the
    * 5-row regional aggregate — the same stage layout a 100 TB run
    * would want.
    */
  def salesEtlPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_regionkey")
    val r = Tables.region(spark, sfDir)
    val regional = reingested(spark, sfDir)
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(
        count(lit(1)).as("n_orders"),
        Num.moneySum(col("o_totalprice")).as("revenue"))
    // global windows over the 5-row regional aggregate — bounded by the
    // region dimension's cardinality, never fed raw rows
    regional
      .withColumn("rnk", rank().over(
        Window.orderBy(desc("revenue"), asc("region"))))
      .withColumn("revenue_share_pct",
        col("revenue") * 100.0 / sum("revenue").over(Window.partitionBy()))
      .orderBy("rnk")
  }
}
