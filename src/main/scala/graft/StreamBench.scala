package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.gen.SalesGen
import graft.streaming.StreamAssembly

/** Streaming ingest micro-benchmark: N generated JSON orders through the
  * full EP2 path (parse → coerce → hourly rollup, update-mode state) in
  * micro-batches of `batch`. Prints one JSON line with orders/sec —
  * comparable to the reference's operating point (20-50 orders/sec
  * producer, 500-row batches; BASELINE.md).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_N", "100000").toInt
    val batch = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCH", "10000").toInt
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val jsons = SalesGen.ordersJson(spark, n).collect().map(_.getString(0))
    val stream = MemoryStream[String]
    val rollup = StreamAssembly.hourlyRollupStream(
      StreamAssembly.ingest(stream.toDF()))
    val q = rollup.writeStream
      .format("memory").queryName("bench_rollup")
      .outputMode("complete")
      .start()
    val t0 = System.nanoTime()
    jsons.grouped(batch).foreach { b =>
      stream.addData(b)
      q.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val keys = spark.table("bench_rollup").count()
    q.stop()
    println(s"""{"metric":"stream_ingest","orders":$n,"batch":$batch,""" +
      s""""sec":$secs,"orders_per_sec":${(n / secs).toLong},"rollup_keys":$keys}""")
    spark.stop()
  }
}
