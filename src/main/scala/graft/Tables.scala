package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Uniform access to the driver-provided parquet tables
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §B).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Older fixture generations wrote events.ts as parquet TIMESTAMP(NANOS),
    // which the Spark reader rejects ([PARQUET_TYPE_ILLEGAL]) unless read as
    // LONG; newer generations write TIMESTAMP(MICROS) without a timezone,
    // which reads as TIMESTAMP_NTZ. Normalize both to session-TZ TimestampType
    // (every entry point pins spark.sql.session.timeZone=UTC, so the NTZ→LTZ
    // cast is instant-preserving and matches the old nanos-epoch semantics).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos since epoch → TimestampType (µs). `div` keeps integer math.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    } else df
  }

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Undo the fixture's single-split artifact for compute-heavy map-side
    * stages. Each testdata table is ONE parquet file with ONE row group,
    * and Spark parallelizes parquet scans only at row-group boundaries —
    * so without an explicit spread, every row-local transform chained on a
    * scan (shingling, per-shingle digests, JSON encode/decode, vector
    * folds) executes as a single task no matter how many cores exist
    * (measured 4× on the embedding near-dup sweep at local[32]).
    *
    * Use ONLY in operators whose dominant cost is row-local compute, not
    * before plain aggregates: partial aggregation belongs BEFORE the
    * exchange (map-side combine), and a production multi-split scan makes
    * this a redundant narrow-ish shuffle.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Register every testdata table as a temp view, enabling the ad-hoc
    * `spark.sql` surface (the reference's Metabase/EP3 query path and its
    * declared-but-missing query CLI — SURVEY.md §0).
    */
  def registerAll(s: SparkSession, d: String): Unit =
    names.foreach(n => table(s, d, n).createOrReplaceTempView(n))

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
