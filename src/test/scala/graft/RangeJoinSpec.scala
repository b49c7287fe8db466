package graft

import org.apache.spark.sql.functions._

/** Bucketized range join is EXACT: same pairs as the naive inequality
  * join (which Spark executes as a per-key cross product), and the
  * train/val/test split is total, disjoint, with stable proportions.
  */
class RangeJoinSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("bucketized range join == naive inequality self-join") {
    val tolUs = 3600L * 1000000L
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    val naive = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.us") - col("b.us")) <= tolUs)
      .select(col("a.event_id").as("event_a"), col("b.event_id").as("event_b"),
        abs(col("a.us") - col("b.us")).as("delta_us"))
    val bucketized = graft.ops.RangeJoin.eventPairsWithin(spark, sf)
    assert(bucketized.count() > 0)
    assert(bucketized.exceptAll(naive).isEmpty && naive.exceptAll(bucketized).isEmpty)
  }

  test("custom band-join plan node == bucketized form, both directions") {
    val custom = graft.ops.RangeJoin.eventPairsWithinCustom(spark, sf)
    val bucketized = graft.ops.RangeJoin.eventPairsWithin(spark, sf)
    assert(custom.count() > 0)
    assert(custom.exceptAll(bucketized).isEmpty &&
      bucketized.exceptAll(custom).isEmpty)
  }

  test("pre-partitioned children join exchange-free through RangeJoinExec " +
       "(EnsureRequirements elides both exchanges)") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    val a = e.select(col("event_id").as("event_a"),
      col("user_id"), col("us").as("us_a")).repartition(4, col("user_id"))
    val b = e.select(col("event_id").as("event_b"),
      col("user_id").as("uid_b"), col("us").as("us_b"))
      .repartition(4, col("uid_b"))
    val j = graft.plans.RangeJoinApi
      .rangeJoin(a, b, "user_id", "uid_b", "us_a", "us_b", 3600000000L)
    j.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(flatten)
    }
    val plan = flatten(j.queryExecution.executedPlan)
    assert(plan.exists(_.isInstanceOf[graft.plans.RangeJoinExec]))
    // the ONLY exchanges are the two explicit repartitions — the node's
    // ClusteredDistribution requirement is satisfied by them, so
    // EnsureRequirements inserts none of its own (just the two sorts)
    val exchanges = plan.collect {
      case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => x
    }
    assert(exchanges.length === 2,
      s"expected only the 2 explicit repartitions, got ${exchanges.length}")
  }

  test("RangeJoinApi rejects unusable inputs at construction") {
    import spark.implicits._
    val a = Seq((1L, 10L)).toDF("k", "us_a")
    val b = Seq((1, 20L)).toDF("kb", "us_b") // Int key vs Long key
    intercept[IllegalArgumentException] {
      graft.plans.RangeJoinApi.rangeJoin(a, b, "k", "kb", "us_a", "us_b", 1L)
    }
    val c = Seq((1L, 1.5)).toDF("kb", "us_b") // double time, not micros
    intercept[IllegalArgumentException] {
      graft.plans.RangeJoinApi.rangeJoin(a, c, "k", "kb", "us_a", "us_b", 1L)
    }
    val m = Seq((Map(1 -> 2), 3L)).toDF("kb", "us_b") // unorderable key
    val ml = Seq((Map(1 -> 2), 3L)).toDF("k", "us_a")
    intercept[IllegalArgumentException] {
      graft.plans.RangeJoinApi.rangeJoin(ml, m, "k", "kb", "us_a", "us_b", 1L)
    }
  }

  test("train/test split is total, disjoint, and roughly 80/10/10") {
    val total = Tables.documents(spark, sf).count()
    val r = graft.ops.TrainingSets.trainTestSplit(spark, sf)
      .groupBy("split").agg(sum("n_docs").as("n")).collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(r.values.sum === total)                    // total (every doc in exactly one split)
    assert(r.keySet === Set("train", "val", "test"))
    val frac = r("train").toDouble / total
    assert(frac > 0.7 && frac < 0.9)
  }
}
