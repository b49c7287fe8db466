package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.SessionizeStream

/** Custom-state streaming sessionization vs the batch window-function
  * form — identical sessions on identical input.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  /** (user, minuteOffset, value) fixture: user 1 has two sessions split by
    * a 45-min gap; user 2 one session; user 3 a single event.
    */
  private val events = Seq(
    (1L, 0, 10.0), (1L, 10, 20.0), (1L, 25, 5.0),  // session A: 3 events
    (1L, 70, 7.5), (1L, 80, 2.5),                  // session B: 2 events
    (2L, 5, 1.0), (2L, 30, 2.0), (2L, 55, 3.0),    // chained ≤30-min gaps
    (3L, 40, 99.0)
  ).map { case (u, m, v) =>
    (u, new Timestamp(1700000000000L + m * 60000L), v)
  }

  private def batchSessions = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events.toDF("user_id", "ts", "value")
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
  }

  test("flatMapGroupsWithState sessions == window-function sessions") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val sessions = SessionizeStream.sessionize(
      stream.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30)
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .start()
    try {
      // two micro-batches, in event-time order; then a watermark-advancing
      // sentinel far in the future so every open session times out
      val (b1, b2) = events.sortBy(_._2.getTime).splitAt(5)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      stream.addData(Seq((99L,
        new Timestamp(1700000000000L + 100L * 3600000L), 0.0)))
      q.processAllAvailable()
      // one more empty-ish pass lets timed-out state flush
      stream.addData(Seq((99L,
        new Timestamp(1700000000000L + 101L * 3600000L), 0.0)))
      q.processAllAvailable()

      val got = spark.table("sessions_out")
        .filter(col("user_id") =!= 99L)
        .select("user_id", "session_start", "n_events", "total_value")
      val want = batchSessions
      assert(got.count() === 4)
      assert(got.exceptAll(want).count() === 0)
    } finally q.stop()
  }

  test("streaming session_window aggregate == batch session_window") {
    implicit val sqlCtx = spark.sqlContext
    def sessionAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("total_value"))
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val q = sessionAgg(stream.toDF().toDF("user_id", "ts", "value"))
      .writeStream
      .format("memory").queryName("sw_out")
      .outputMode("complete")
      .start()
    try {
      val (b1, b2) = events.sortBy(_._2.getTime).splitAt(5)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val got = spark.table("sw_out")
      val want = sessionAgg(events.toDF("user_id", "ts", "value"))
      assert(got.count() === 4)
      assert(got.exceptAll(want).count() === 0)
      // and both agree with the lag/cumsum formulation
      assert(got.exceptAll(batchSessions).count() === 0)
    } finally q.stop()
  }
}
