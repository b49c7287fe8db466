package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The TopK Aggregator's streaming claim, executed: the same typed
  * aggregate runs inside a streaming update-mode groupByKey, where the
  * window-rank formulation (global sort + filter) is not expressible —
  * and converges to the batch answer once all data has arrived.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAgg in streaming update mode converges to the batch top-k") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      ("a", 10.0, 1L), ("a", 30.0, 2L), ("a", 20.0, 3L), ("a", 40.0, 4L),
      ("b", 5.0, 5L), ("b", 15.0, 6L), ("b", 2.0, 7L),
      ("c", 1.0, 8L)
    )
    val agg = new graft.ops.TopK.TopKAgg(2).toColumn
    val stream = MemoryStream[(String, Double, Long)]
    val q = stream.toDS()
      .groupByKey(_._1)
      .mapValues { case (_, score, id) => (score, id) }
      .agg(agg.name("topk"))
      .toDF("seg", "topk")
      .writeStream
      .format("memory").queryName("topk_state")
      .outputMode("update")
      .start()
    try {
      val (b1, b2) = data.splitAt(4)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      // update mode emits one row per changed key per batch: keep the last
      val got = spark.table("topk_state").as[(String, Seq[(Double, Long)])]
        .collect().groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      val want = Map(
        "a" -> Seq((40.0, 4L), (30.0, 2L)),
        "b" -> Seq((15.0, 6L), (5.0, 5L)),
        "c" -> Seq((1.0, 8L)))
      assert(got === want)
    } finally q.stop()
  }
}
