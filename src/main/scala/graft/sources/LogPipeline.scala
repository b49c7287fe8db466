package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}

/** The reference's full Kafka round trip (S1 consume → P1-P5 ingest → S3
  * produce, `kafka_to_clickhouse.py:50-58` + `sales_producer.py:160-165`)
  * executed END-TO-END through the custom DataSource V2 log
  * ([[GraftLog]]) as an oracle-checked query — the engine API path the
  * Kafka connector implements, actually running: offset tracking,
  * admission-controlled micro-batches, `planInputPartitions`, and the
  * sink's transactional epoch commit.
  */
object LogPipeline {

  private[graft] val eventJsonSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val topicCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String, Int), (String, Long)]

  /** Fixture scaffolding (memoized like the other streaming fixtures): the
    * events table produced into a `nParts`-partition topic, keyed by
    * user_id — what `sales_producer.py` does to Kafka. The one driver-side
    * action (count) sizes the per-trigger admission so the drain always
    * takes ~`nBatches` micro-batches regardless of scale factor.
    */
  private def stagedTopic(spark: SparkSession, sfDir: String,
                          nParts: Int): (String, Long) =
    topicCache.getOrElseUpdate((spark, sfDir, nParts), {
      val d = java.nio.file.Files
        .createTempDirectory("graft_dsv2_topic").toString
      val events = graft.Tables.events(spark, sfDir)
      GraftLog.stageTopic(events, d, nParts, col("user_id"))
      (d, events.count())
    })

  /** The BATCH read of the same topic (Kafka's `spark.read.format("kafka")`
    * backfill analogue — capability BATCH_READ on the same table): one
    * scan over the snapshot segment list through the same offset-ranged
    * readers the stream uses. The per-partition digest pins the
    * key-partitioned staging (partition = user_id mod nParts), the DENSE
    * offset assignment (max_offset = n_records − 1), and the payload
    * values — so a batch/stream read-path divergence flips the hash.
    */
  def dsv2BatchRead(spark: SparkSession, sfDir: String,
                    nParts: Int = 4): DataFrame = {
    val (topicDir, _) = stagedTopic(spark, sfDir, nParts)
    spark.read.format(GraftLog.format).option("path", topicDir).load()
      .select(col("partition"), col("offset"),
        from_json(col("value"), eventJsonSchema,
          Map("timestampFormat" -> GraftLog.timestampFormat)).as("e"))
      .groupBy(col("partition"))
      .agg(count(lit(1)).as("n_records"),
        max("offset").as("max_offset"),
        countDistinct(col("e.user_id")).as("n_users"),
        round(sum(col("e.value").cast("decimal(18,6)")).cast("double"), 2)
          .as("total_value"))
      .orderBy("partition")
  }

  /** Source → ingest → sink → read-back, aggregated to the hourly×type
    * rollup: `maxRecordsPerTrigger` forces ~`nBatches` admission-bounded
    * micro-batches; every record crosses the custom source's offset-ranged
    * readers AND the custom sink's manifest-committed segments, so a lost
    * batch, a replayed batch, or a leaked uncommitted attempt file each
    * flip the driver's hash. The pipeline is stateless (parse + project) —
    * delivery accounting lives in the source/sink contract, which is the
    * thing under test.
    */
  def dsv2IngestRollup(spark: SparkSession, sfDir: String,
                       nParts: Int = 4, nBatches: Int = 5): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_dsv2_run").toString
    val outDir = s"$tmp/sink"
    val ckptDir = s"$tmp/ckpt"
    val (topicDir, total) = stagedTopic(spark, sfDir, nParts)
    val perTrigger = math.max(1L, total / nBatches)

    val raw = spark.readStream
      .format(GraftLog.format)
      .option("path", topicDir)
      .option("maxRecordsPerTrigger", perTrigger)
      .load()
    // P1/P4/P5 over the wire value, then back to the producer shape (S3)
    val parsed = raw.select(
      from_json(col("value"), eventJsonSchema,
        Map("timestampFormat" -> GraftLog.timestampFormat)).as("e"))
      .select(col("e.*"))
    val query = parsed
      .select(to_json(struct(parsed.columns.map(col): _*),
        Map("timestampFormat" -> GraftLog.timestampFormat)).as("value"))
      .writeStream
      .format(GraftLog.format)
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    GraftLog.readCommitted(spark, outDir)
      .select(from_json(col("value"), eventJsonSchema,
        Map("timestampFormat" -> GraftLog.timestampFormat)).as("e"))
      .select(col("e.*"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
          .as("total_value"))
      .orderBy("hour", "event_type")
  }
}
