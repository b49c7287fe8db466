package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.gen.SalesGen
import graft.streaming.StreamAssembly

/** T4 delivery semantics: a checkpointed streaming query restarted over
  * the same source must produce each input row exactly once — the strict
  * upgrade over the reference's auto-commit at-least-once. Also covers the
  * streaming generator path (stream-static broadcast enrichment).
  */
class StreamRestartSpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed file-source ingest is exactly-once across a restart") {
    val srcDir = Files.createTempDirectory("eo_src")
    val outDir = Files.createTempDirectory("eo_out").toString
    val ckDir = Files.createTempDirectory("eo_ck").toString
    val jsons = SalesGen.ordersJson(spark, 200).collect().map(_.getString(0))

    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(srcDir.toString, name),
        lines.mkString("\n").getBytes("UTF-8"), StandardOpenOption.CREATE)

    def start() = StreamAssembly.startRawSink(
      StreamAssembly.ingest(
        spark.readStream.text(srcDir.toString).select(col("value"))),
      outDir, ckDir)

    writeFile("batch1.json", jsons.take(120))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(outDir).count() === 120)

    // restart from the same checkpoint; only the new file may be consumed
    writeFile("batch2.json", jsons.drop(120))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() === 200) // no replays, no losses
    // every generated order appears exactly once (order_id collides by
    // design, so count per full row instead)
    val dupes = out.groupBy(out.columns.map(col): _*)
      .count().filter(col("count") > 1)
    assert(dupes.count() === 0)
  }

  test("streaming generator enrichment (stream-static broadcast join) " +
       "matches the batch generator row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val ids = MemoryStream[Long]
    val enriched = SalesGen.enrich(spark, ids.toDF().toDF("id"))
    val q = enriched.writeStream
      .format("memory").queryName("gen_stream")
      .outputMode("append")
      .start()
    try {
      ids.addData(0L until 100L: _*)
      q.processAllAvailable()
      val got = spark.table("gen_stream")
      val want = SalesGen.orders(spark, 100).drop("_gen_id")
      assert(got.count() === 100)
      assert(got.exceptAll(want).count() === 0)
    } finally q.stop()
  }
}
