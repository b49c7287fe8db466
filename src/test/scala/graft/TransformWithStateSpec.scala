package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.RunningTotalsState

/** `transformWithState` operators vs their batch forms: running totals ≡
  * one-shot groupBy, timer-based sessions ≡ window-function sessions. Runs
  * on the RocksDB state store provider (required by the API, and the store
  * we'd run at scale).
  */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  /** Every transformWithState query needs the RocksDB provider; set it for
    * the test body and restore whatever was configured before.
    */
  private def withRocksDBProvider[T](body: => T): T = {
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body
    finally saved match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  test("running totals across micro-batches equal the batch aggregate") {
    withRocksDBProvider {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, Double)]
      val q = RunningTotalsState.runningTotals(stream.toDS())
        .toDF("user_id", "n", "total")
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      val batch1 = Seq((1L, 10.0), (2L, 5.0), (1L, 2.5))
      val batch2 = Seq((2L, 1.0), (3L, 7.0), (2L, 2.0), (1L, 0.5))
      try {
        stream.addData(batch1); q.processAllAvailable()
        stream.addData(batch2); q.processAllAvailable()
      } finally q.stop()
      // last emission per key == batch groupBy over the union
      val finalRows = spark.table("tws_out")
        .groupBy("user_id")
        .agg(max(struct(col("n"), col("total"))).as("last"))
        .select(col("user_id"), col("last.n"), col("last.total"))
        .as[(Long, Long, Double)].collect()
        .map { case (u, n, t) => u -> (n, t) }.toMap
      val expected = (batch1 ++ batch2).groupBy(_._1).map {
        case (u, rows) => u -> (rows.size.toLong, rows.map(_._2).sum) }
      assert(finalRows.keySet === expected.keySet)
      expected.foreach { case (u, (n, t)) =>
        val (gn, gt) = finalRows(u)
        assert(gn === n)
        assert(math.abs(gt - t) < 1e-9)
      }
      // keys seen in both batches emitted twice, with non-decreasing counts
      val u1 = spark.table("tws_out").filter(col("user_id") === 1L)
        .orderBy("n").as[(Long, Long, Double)].collect()
      assert(u1.length === 2 && u1(0)._2 === 2L && u1(1)._2 === 3L)
    }
  }

  test("timer-based transformWithState sessions == window-function " +
       "batch sessions, including an out-of-order cross-batch event") {
    withRocksDBProvider {
      val events = Seq(
        (1L, 0, 10.0), (1L, 10, 20.0), (1L, 25, 5.0),   // session A
        (1L, 70, 7.5), (1L, 80, 2.5),                   // session B (gap 45)
        (2L, 5, 1.0), (2L, 30, 2.0), (2L, 55, 3.0),     // chained ≤30-min
        (3L, 40, 99.0)
      ).map { case (u, m, v) =>
        (u, new Timestamp(1700000000000L + m * 60000L), v) }
      // user 4: batch 2 delivers a LATE (in-watermark) event at minute 40
      // after batch 1 already advanced the session to minute 60 — lastTs
      // must not rewind, so the minute-85 event (gap 25 from 60) still
      // merges into ONE session; a rewound clock would split at gap 45
      val lateB1 = Seq((4L, 20, 1.0), (4L, 60, 2.0))
        .map { case (u, m, v) =>
          (u, new Timestamp(1700000000000L + m * 60000L), v) }
      val lateB2 = Seq((4L, 40, 4.0), (4L, 85, 8.0))
        .map { case (u, m, v) =>
          (u, new Timestamp(1700000000000L + m * 60000L), v) }
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, Timestamp, Double)]
      val q = graft.streaming.SessionizeTws.sessionize(
          stream.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30)
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("append").start()
      try {
        val (b1, b2) = events.sortBy(_._2.getTime).splitAt(5)
        stream.addData(b1 ++ lateB1); q.processAllAvailable()
        stream.addData(b2 ++ lateB2); q.processAllAvailable()
        // watermark-advancing sentinel closes every open session via timers
        stream.addData(Seq((99L,
          new Timestamp(1700000000000L + 100L * 3600000L), 0.0)))
        q.processAllAvailable()
      } finally q.stop()
      val byUser = Window.partitionBy("user_id").orderBy("ts")
      val want = (events ++ lateB1 ++ lateB2).toDF("user_id", "ts", "value")
        .withColumn("new_s",
          when(lag("ts", 1).over(byUser).isNull ||
            unix_timestamp(col("ts")) -
              unix_timestamp(lag("ts", 1).over(byUser)) > 1800, 1L)
            .otherwise(0L))
        .withColumn("sid", sum("new_s").over(byUser))
        .groupBy("user_id", "sid")
        .agg(min("ts").as("session_start"), count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .select("user_id", "session_start", "n_events", "total_value")
      val got = spark.table("tws_sessions")
        .filter(col("user_id") =!= 99L)
        .select("user_id", "session_start", "n_events", "total_value")
      assert(got.count() === want.count())
      assert(got.exceptAll(want).count() === 0)
    }
  }
}
