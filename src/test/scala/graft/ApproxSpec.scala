package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct lands within its configured relative error of the
  * exact count (no cross-engine oracle exists for HLL estimates — this
  * spec is the correctness evidence).
  */
class ApproxSpec extends SparkSpec {

  test("approx quantiles land within 1% relative rank error of exact") {
    val r = graft.ops.TrainingSets
      .approxValueQuantiles(spark, "/root/testdata/sf0.01")
      .withColumn("err50",
        abs(col("p50_approx") - col("p50_exact")) / abs(col("p50_exact")))
      .withColumn("err99",
        abs(col("p99_approx") - col("p99_exact")) / abs(col("p99_exact")))
    assert(r.count() > 0)
    // value distribution is smooth; 1/accuracy rank error ⇒ small value error
    assert(r.filter(col("err50") > 0.05 || col("err99") > 0.05).count() === 0)
  }

  test("HLL estimate within 3*rsd of exact on every event type") {
    val r = graft.ops.Rollups
      .approxDistinctUsers(spark, "/root/testdata/sf0.01")
      .withColumn("err",
        abs(col("approx_users") - col("exact_users")) /
          col("exact_users").cast("double"))
    assert(r.count() > 0)
    assert(r.filter(col("err") > 3 * 0.015).count() === 0)
  }

  test("per-day HLL sketches merged over the 30-day spine stay in bound " +
       "on every horizon (the gated booleans never go false)") {
    val r = graft.ops.Analytics
      .rollingActiveUsersHll(spark, "/root/testdata/sf0.01")
    assert(r.count() > 0)
    assert(r.filter(!col("dau_ok") || !col("wau_ok") || !col("mau_ok"))
      .count() === 0)
  }
}
