package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.plans.AsOfJoinApi.asofJoin

/** Semantics of the custom as-of plan node (graft.plans.AsOfJoin):
  * inclusive time match, latest-wins, null-extension on miss, null keys
  * never match — plus exact equivalence with the composed union+window
  * form on the real fixture (both are also hash-gated against the same
  * DuckDB ASOF JOIN oracle; this spec pins the edge semantics the fixture
  * may not exercise).
  */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val right = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 11:00:00"), 200L)
    ).toDF("rkey", "rt", "payload")
  }

  private def run(leftRows: Seq[(Long, Timestamp, String)]) = {
    import spark.implicits._
    val left = leftRows.toDF("lkey", "lt", "tag")
    asofJoin(left, right, "lkey", "rkey", "lt", "rt")
      .select("tag", "payload").collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
  }

  test("latest at-or-before right row wins; equal timestamps match " +
       "inclusively; misses null-extend") {
    val out = run(Seq(
      (1L, ts("2024-01-01 09:00:00"), "before_all"),
      (1L, ts("2024-01-01 10:00:00"), "tie_inclusive"),
      (1L, ts("2024-01-01 11:59:59"), "between"),
      (1L, ts("2024-01-01 13:00:00"), "after_all"),
      (2L, ts("2024-01-01 11:00:00"), "other_key_tie"),
      (3L, ts("2024-01-01 23:00:00"), "no_right_rows")))
    assert(out("before_all") === -1L)
    assert(out("tie_inclusive") === 100L)
    assert(out("between") === 100L)
    assert(out("after_all") === 101L)
    assert(out("other_key_tie") === 200L)
    assert(out("no_right_rows") === -1L)
  }

  test("null left keys and null left times never match") {
    import spark.implicits._
    val left = Seq(
      (Some(1L), Some(ts("2024-01-01 13:00:00")), "ok"),
      (None, Some(ts("2024-01-01 13:00:00")), "null_key"),
      (Some(1L), None, "null_time")
    ).toDF("lkey", "lt", "tag")
    val out = asofJoin(left, right, "lkey", "rkey", "lt", "rt")
      .select("tag", "payload").collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out("ok") === 101L)
    assert(out("null_key") === -1L)
    assert(out("null_time") === -1L)
  }

  test("custom plan node and composed union+window form agree row-for-row " +
       "on the fixture") {
    val sf = "/root/testdata/sf0.001"
    val a = ops.AsOf.eventsAsOfOrders(spark, sf).collect().toSeq
    val b = ops.AsOf.eventsAsOfOrdersCustom(spark, sf).collect().toSeq
    assert(a.size === b.size)
    a.zip(b).foreach { case (x: Row, y: Row) => assert(x === y) }
  }

  test("custom as-of agrees with an in-memory reference on randomized " +
       "data (fixed seed, 8 keys, duplicate times, missing keys)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val leftRows = (1 to 300).map { i =>
      (rnd.nextInt(8).toLong,
        new Timestamp(rnd.nextInt(100000).toLong * 1000L), s"L$i")
    }
    // right side keys 0..5 only (6,7 always miss); dedup per (key, time)
    // keep-max-payload — the documented right-side contract
    val rawRight = (1 to 200).map { i =>
      (rnd.nextInt(6).toLong,
        new Timestamp(rnd.nextInt(100000).toLong * 1000L), i.toLong)
    }
    val dedupR = rawRight.groupBy(r => (r._1, r._2))
      .map { case (_, g) => g.maxBy(_._3) }.toSeq
    def expected(l: (Long, Timestamp, String)): Long =
      dedupR.filter(r => r._1 == l._1 && !r._2.after(l._2)) match {
        case s if s.isEmpty => -1L
        case ms => ms.maxBy(_._2.getTime)._3
      }
    val left = leftRows.toDF("lkey", "lt", "tag")
    val right = dedupR.toDF("rkey", "rt", "payload")
    val got = asofJoin(left, right, "lkey", "rkey", "lt", "rt")
      .select("tag", "payload").collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    leftRows.foreach { l =>
      assert(got(l._3) === expected(l), s"row ${l._3} key ${l._1} t ${l._2}")
    }
  }

  test("string keys order correctly through the interpreted ordering " +
       "(UTF8String comparisons, not just longs)") {
    import spark.implicits._
    val left = Seq(
      ("alpha", ts("2024-01-01 12:00:00"), "a_mid"),
      ("beta", ts("2024-01-01 09:00:00"), "b_early"),
      ("gamma", ts("2024-01-01 12:00:00"), "c_missing"))
      .toDF("lkey", "lt", "tag")
    val right = Seq(
      ("alpha", ts("2024-01-01 10:00:00"), 1L),
      ("alpha", ts("2024-01-01 11:00:00"), 2L),
      ("beta", ts("2024-01-01 10:00:00"), 3L))
      .toDF("rkey", "rt", "payload")
    val out = asofJoin(left, right, "lkey", "rkey", "lt", "rt")
      .select("tag", "payload").collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out("a_mid") === 2L)
    assert(out("b_early") === -1L)
    assert(out("c_missing") === -1L)
  }

  test("over bucketed tables the as-of join runs EXCHANGE-FREE — the " +
       "co-location win the window-over-union form cannot express") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    graft.functions.GraftFunctions.register(spark)
    Seq("asof_b_events", "asof_b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists())
        dir.listFiles().foreach(_.delete())
      dir.delete()
    }
    val sf = "/root/testdata/sf0.001"
    Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"))
      .write.bucketBy(8, "user_id").sortBy("user_id", "ts")
      .mode("overwrite").saveAsTable("asof_b_events")
    Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("okey"))
      .agg(max(col("o_orderdate").cast("timestamp")).as("ot"),
        max("o_orderkey").as("okeymax"))
      .write.bucketBy(8, "okey").sortBy("okey", "ot")
      .mode("overwrite").saveAsTable("asof_b_orders")
    val df = graft.plans.AsOfJoinApi.asofJoin(
      spark.table("asof_b_events"), spark.table("asof_b_orders"),
      "user_id", "okey", "ts", "ot")
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(flatten)
    }
    val plan = flatten(df.queryExecution.executedPlan)
    assert(plan.exists(_.isInstanceOf[graft.plans.AsOfJoinExec]))
    assert(plan.count(_.isInstanceOf[ShuffleExchangeExec]) === 0)
  }

  test("the physical plan is AsOfJoinExec fed by one exchange+sort per " +
       "side — no window, no union") {
    val df = ops.AsOf.eventsAsOfOrdersCustom(spark, "/root/testdata/sf0.001")
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange
            .ReusedExchangeExec => Seq(r.child)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(flatten)
    }
    val plan = flatten(df.queryExecution.executedPlan)
    assert(plan.exists(_.isInstanceOf[graft.plans.AsOfJoinExec]))
    assert(!plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]))
    assert(!plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.UnionExec]))
  }
}
