package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.gen.SalesGen
import graft.storage.Storage

/** Storage layout semantics: yyyyMM partitioning + pruning, within-file
  * sort order, partition-level TTL.
  */
class StorageSpec extends SparkSpec {

  /** Generator day ±N months: shift order_timestamp to spread rows over
    * several month partitions.
    */
  private def monthSpread(n: Long) =
    SalesGen.orders(spark, n)
      .withColumn("order_timestamp",
        col("order_timestamp") +
          expr("make_interval(0, CAST(_gen_id % 4 AS INT), 0, 0, 0, 0, 0)"))
      .drop("_gen_id")

  test("writeRaw lands hive month partitions and pruning reads only one") {
    val dir = Files.createTempDirectory("raw").toString
    Storage.writeRaw(monthSpread(800), dir)
    val all = Storage.readRaw(spark, dir)
    val months = all.select("month").distinct().collect().map(_.getInt(0))
    assert(months.length === 4)

    val pruned = all.filter(col("month") === months.min)
    // physical plan must prune at the partition level, not post-filter
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("month"))
    // inputFiles ignores pruning; the scan's selected partitions are the
    // real thing
    assert(scan.selectedPartitions.partitionCount === 1)
    val fullScan = all.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(fullScan.selectedPartitions.partitionCount === 4)
  }

  test("rows are sorted by (order_timestamp, order_id) within each file") {
    val dir = Files.createTempDirectory("sorted").toString
    Storage.writeRaw(monthSpread(500), dir)
    // capture file + scan position BEFORE any window exchange —
    // monotonically_increasing_id() reflects scan order only when projected
    // directly over the scan
    val tagged = Storage.readRaw(spark, dir)
      .withColumn("file", input_file_name())
      .withColumn("seq", monotonically_increasing_id())
    val out = tagged
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("file"))
          .orderBy("order_timestamp", "order_id")))
      .withColumn("natural", row_number().over(
        Window.partitionBy(col("file")).orderBy("seq")))
    assert(out.filter(col("rn") =!= col("natural")).count() === 0)
  }

  test("retention drops only fully-expired month partitions") {
    val dir = Files.createTempDirectory("ttl").toString
    Storage.writeRaw(monthSpread(400), dir)
    val before = Storage.readRaw(spark, dir)
    val months = before.select("month").distinct()
      .collect().map(_.getInt(0)).sorted
    val keptCount = before.filter(col("month") =!= months.head).count()

    // cutoff chosen so exactly the oldest month is fully expired:
    // months are 2026-01..2026-04; now = 2027-02-15, retain 365d →
    // cutoff 2026-02-15 → only 202601's last day (Jan 31) < cutoff
    val dropped = Storage.applyRetention(spark, dir, 365,
      Instant.parse("2027-02-15T00:00:00Z"))
    assert(dropped === Seq(months.head.toString))

    val after = Storage.readRaw(spark, dir)
    assert(after.count() === keptCount)
    assert(after.select("month").distinct().count() === months.length - 1)
  }

  test("compaction merges a month's small files in place; other months " +
       "and row order survive") {
    val dir = Files.createTempDirectory("compact").toString
    // two appends = at least two files per touched partition
    Storage.writeRaw(monthSpread(300), dir)
    Storage.writeRaw(monthSpread(300), dir)
    val before = Storage.readRaw(spark, dir)
    val beforeTotal = before.count()
    val months = before.select("month").distinct()
      .collect().map(_.getInt(0)).sorted
    val target = months.head
    def filesIn(m: Int) = new java.io.File(s"$dir/month=$m")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesIn(target) >= 2)
    val otherFiles = months.tail.map(m => m -> filesIn(m)).toMap
    Storage.compactMonth(spark, dir, target)
    val after = Storage.readRaw(spark, dir)
    assert(after.count() === beforeTotal)
    assert(filesIn(target) === 1)
    // untouched partitions keep their exact file layout
    assert(months.tail.map(m => m -> filesIn(m)).toMap === otherFiles)
    // within-file (ts, id) order holds in the compacted file
    val w = Window.partitionBy(input_file_name())
      .orderBy("order_timestamp", "order_id")
    val disorder = after.filter(col("month") === target)
      .withColumn("rn", row_number().over(w))
      .withColumn("expected",
        row_number().over(Window.partitionBy(input_file_name())
          .orderBy(monotonically_increasing_id())))
      .filter(col("rn") =!= col("expected"))
    assert(disorder.count() === 0)
  }

  test("batch-sink compaction merges batch=<id> trees by target size; " +
       "row multiset and data columns survive, provenance drops") {
    val dir = Files.createTempDirectory("bsink").toString + "/sink"
    // simulate a drain: 5 micro-batches, several small files each
    (0 until 5).foreach { b =>
      spark.range(b * 100, (b + 1) * 100)
        .select(col("id").as("doc_id"), (col("id") * 7).as("val"))
        .repartition(3)
        .write.parquet(s"$dir/batch=$b")
    }
    val before = spark.read.parquet(dir)
    val beforeSum = before.agg(sum("val")).collect()(0).getLong(0)
    val beforeRows = before.count()
    // huge target → everything merges into one file
    val (nBefore, nAfter, rows) =
      Storage.compactBatchSink(spark, dir, targetFileBytes = 1L << 30)
    assert(nBefore === 15)
    assert(nAfter === 1)
    assert(rows === beforeRows)
    val after = spark.read.parquet(dir)
    assert(after.count() === beforeRows)
    assert(after.agg(sum("val")).collect()(0).getLong(0) === beforeSum)
    // batch provenance is gone post-merge (merged parts are merged)
    assert(!after.columns.contains("batch"))
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("batch=")))
    // tiny target → file count tracks bytes: more than one output file
    val (_, nSplit, rows2) =
      Storage.compactBatchSink(spark, dir, targetFileBytes = 1024)
    assert(nSplit > 1)
    assert(rows2 === beforeRows)
    assert(spark.read.parquet(dir).count() === beforeRows)
  }

  test("schema evolution: a new column appends and old files read as null") {
    val dir = Files.createTempDirectory("evolve").toString
    val v1 = monthSpread(100)
    Storage.writeRaw(v1, dir)
    Storage.writeRaw(monthSpread(100)
      .withColumn("coupon_code", concat(lit("CP-"), col("order_id"))), dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("coupon_code"))
    assert(merged.count() === 200)
    // old rows surface the new column as null; new rows carry it
    assert(merged.filter(col("coupon_code").isNull).count() === 100)
    assert(merged.filter(col("coupon_code").startsWith("CP-")).count() === 100)
  }

  test("ORC round-trip: the raw order frame survives the second columnar " +
       "format byte-identically (schema + every value)") {
    // format breadth (S5/S6): same frame written parquet AND orc, read
    // back, and compared value-for-value — both formats are first-class
    // Spark sinks, so switching costs exactly `.format("orc")`
    val dir = Files.createTempDirectory("orc_rt").toString
    val src = SalesGen.orders(spark, 500L).drop("_gen_id")
    src.write.mode("overwrite").parquet(s"$dir/p")
    src.write.mode("overwrite").orc(s"$dir/o")
    val p = spark.read.parquet(s"$dir/p")
    val o = spark.read.orc(s"$dir/o")
    assert(o.schema === p.schema)
    val ordCols = p.columns.map(col)
    val a = p.orderBy(ordCols: _*).collect()
    val b = o.orderBy(ordCols: _*).collect()
    assert(a.length === 500 && b.length === 500)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("retention is a no-op when nothing is expired, and on empty dirs") {
    val dir = Files.createTempDirectory("ttl2").toString
    Storage.writeRaw(monthSpread(100), dir)
    assert(Storage.applyRetention(spark, dir, 365,
      Instant.parse("2026-06-01T00:00:00Z")).isEmpty)
    assert(Storage.applyRetention(spark, "/tmp/does-not-exist-xyz", 365,
      Instant.now()).isEmpty)
  }

  test("z-order layout yields compact per-file ranges on BOTH dimensions; " +
       "a single-key sort only on its leading key") {
    val dir = Files.createTempDirectory("zorder").toString
    val lin = Files.createTempDirectory("linear").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("user_id").cast("double").as("u"),
        unix_timestamp(col("ts")).cast("double").as("t"))
    Storage.zorderWrite(ev, "u", "t", dir, 16)
    ev.repartitionByRange(16, col("t")).sortWithinPartitions("t")
      .write.mode("overwrite").parquet(lin)

    // per-file (max-min) width of each dimension, as a fraction of the
    // global range — what parquet footer min/max pruning actually sees
    def widths(path: String): (Double, Double) = {
      val g = ev.agg(max("u") - min("u"), max("t") - min("t")).head
      val (gu, gt) = (g.getDouble(0), g.getDouble(1))
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("u") - min("u")).as("wu"), (max("t") - min("t")).as("wt"))
        .agg(avg("wu"), avg("wt")).head
      (perFile.getDouble(0) / gu, perFile.getDouble(1) / gt)
    }
    val (zu, zt) = widths(dir)
    val (lu, lt) = widths(lin)
    // z-curve: both dimensions compact (each file a small rectangle)
    assert(zu < 0.6, s"z-order user width $zu")
    assert(zt < 0.6, s"z-order time width $zt")
    // time-sorted layout: time tight but user unclustered (full range)
    assert(lt < 0.2, s"linear time width $lt")
    assert(lu > 0.9, s"linear user width $lu — events would have to " +
      "arrive user-clustered for this to fail")
  }
}
