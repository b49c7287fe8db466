package graft.storage

import java.time.{Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's at-rest layout for the raw orders table — the Spark-native
  * equivalent of the reference's MergeTree declaration
  * (`clickhouse/init/01_init.sql:27-31`):
  *
  *   - `PARTITION BY toYYYYMM(order_timestamp)` → hive-style `month=yyyyMM`
  *     parquet partitions; Catalyst prunes them on read (time-ranged
  *     queries never list, let alone read, out-of-range months);
  *   - `ORDER BY (order_timestamp, order_id)` + index_granularity → rows
  *     sorted within each written file, so parquet row-group min/max stats
  *     are tight and predicate pushdown skips granules the same way CK's
  *     sparse primary index does;
  *   - `TTL order_timestamp + INTERVAL 365 DAY` → [[applyRetention]], a
  *     metadata-only partition drop (no row scan — deleting a month is one
  *     directory remove, exactly CK's partition-level TTL fast path).
  *
  * At 100 TB: monthly partitions keep file listing bounded; within a month,
  * writes shard by input parallelism; sortWithinPartitions costs one local
  * sort, no shuffle.
  */
object Storage {

  private val MonthFmt = DateTimeFormatter.ofPattern("yyyyMM")

  /** Append a batch of order rows in the canonical layout. `month` is an
    * int yyyyMM — the same value domain as ClickHouse's `toYYYYMM`
    * (UInt32), and what hive partition type inference yields on read.
    */
  def writeRaw(orders: DataFrame, path: String): Unit =
    orders
      .withColumn("month",
        date_format(col("order_timestamp"), "yyyyMM").cast("int"))
      // leading with the partition column matters: the dynamic-partition
      // writer requires task rows ordered by partition cols and would
      // otherwise inject its own UNSTABLE sort by month, destroying the
      // (ts, id) order; with month first, our ordering satisfies the
      // requirement and the writer adds no sort
      .sortWithinPartitions("month", "order_timestamp", "order_id")
      .write
      .mode("append")
      .partitionBy("month")
      .parquet(path)

  /** Read the raw table; `month` comes back as a partition column usable in
    * pruning predicates.
    */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** TTL retention (`01_init.sql:30`): drop whole month partitions whose
    * LAST instant is older than `retainDays` before `now`. Partition-level
    * semantics (CK's `ttl_only_drop_parts` posture): a month is dropped only
    * when every possible row in it has expired. Returns the dropped month
    * ids.
    */
  def applyRetention(spark: SparkSession, path: String, retainDays: Int,
                     now: Instant): Seq[String] = {
    val cutoffDate = LocalDate.ofInstant(now, ZoneOffset.UTC).minusDays(retainDays)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val dropped = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("month="))
      .filter { s =>
        val month = s.getPath.getName.stripPrefix("month=")
        val firstOfMonth = LocalDate.parse(month + "01",
          DateTimeFormatter.ofPattern("yyyyMMdd"))
        // last instant of the month must be expired
        firstOfMonth.plusMonths(1).minusDays(1).isBefore(cutoffDate)
      }
    dropped.foreach(s => fs.delete(s.getPath, true))
    dropped.map(_.getPath.getName.stripPrefix("month="))
  }

  /** Month id for an instant (UTC) — the partition a row lands in. */
  def monthOf(ts: Instant): String =
    LocalDate.ofInstant(ts, ZoneOffset.UTC).format(MonthFmt)

  /** Small-file compaction for one month partition — the maintenance op
    * every streaming-append layout needs (each micro-batch lands its own
    * files; CK runs background merges for the same reason,
    * `01_init.sql:27-31`). Reads ONLY the target partition (pruned scan),
    * rewrites it as `targetFiles` sorted files, and swaps it atomically
    * via dynamic partition overwrite — other months are never listed,
    * read, or touched. At 100 TB this runs per-partition on whatever
    * cadence write amplification warrants; cost is one local sort, no
    * shuffle beyond the coalesce.
    */
  def compactMonth(spark: SparkSession, path: String, month: Int,
                   targetFiles: Int = 1): Unit = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      spark.read.parquet(path)
        .filter(col("month") === month)
        .repartition(targetFiles)
        .sortWithinPartitions("month", "order_timestamp", "order_id")
        .write
        .mode("overwrite")
        .partitionBy("month")
        .parquet(path)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
