package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** AQE's runtime skew-join split — the engine mechanism a 100 TB shuffle
  * join leans on FIRST (before the manual [[graft.ops.Skew.saltedJoin]]
  * escape hatch): a synthetic hot key owning ~90% of the probe side must
  * make AQE split its oversized shuffle partition into parallel subreads,
  * without changing a single joined value.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => Nil
    }
    p +: (p.children ++ p.subqueries ++ nested).flatMap(flatten)
  }

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot key's shuffle partition at runtime and the " +
       "joined values match the skew-handling-off plan exactly") {
    // key 0 owns 100k of 130k probe rows (~12 MB with padding); 50 cold
    // keys share the rest. The build side is one row per key.
    // incompressible padding (shuffle partition sizes are post-compression
    // bytes — a constant pad would compress below the skew threshold)
    val left = spark.range(130000)
      .select(
        when(col("id") < 100000, 0L).otherwise(col("id") % 50 + 1).as("k"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string")),
          md5((col("id") + 2).cast("string")),
          md5((col("id") + 3).cast("string"))).as("pad"))
    val right = (0L to 50L).toDF("k").withColumn("v", col("k") * 2)
    def run(skewEnabled: Boolean): (Long, Long, Seq[SparkPlan]) = {
      val df = withConfs(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> skewEnabled.toString,
        // keep AQE from collapsing everything into one partition, and make
        // the ~12 MB hot partition qualify as skewed (> threshold AND
        // > factor × median)
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        // sum(length(pad)) keeps the incompressible payload from being
        // column-pruned out of the shuffle (a bare k would compress to
        // nothing and nothing would qualify as skewed)
        val j = left.join(right, "k")
          .agg(count(lit(1)), sum("v"), sum(length(col("pad"))))
        val agg = j.collect()(0)
        // inspect the EXECUTED adaptive plan (the join runs inside this
        // query's stages; an unexecuted sibling frame would still show the
        // initial, un-skew-split plan)
        (agg.getLong(0), agg.getLong(1),
          flatten(j.queryExecution.executedPlan))
      }
      df
    }
    val (nOn, sumOn, planOn) = run(skewEnabled = true)
    val (nOff, sumOff, _) = run(skewEnabled = false)
    // value equality: the split changes placement, never the result
    assert(nOn === 130000L && nOn === nOff && sumOn === sumOff)
    // the join really was a shuffle join, and AQE marked it skew-handled
    val smj = planOn.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "expected a sort-merge join under AQE")
    assert(smj.exists(_.isSkewJoin),
      "AQE did not apply the skew-join split to the hot partition")
    // the probe side's shuffle read carries skew-split partition specs
    val skewReads = planOn.collect {
      case r: AQEShuffleReadExec if r.hasSkewedPartition => r
    }
    assert(skewReads.nonEmpty,
      "expected an AQEShuffleRead with skewed-partition subreads")
  }
}
