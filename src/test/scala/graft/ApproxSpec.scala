package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct lands within its configured relative error of the
  * exact count (no cross-engine oracle exists for HLL estimates — this
  * spec is the correctness evidence).
  */
class ApproxSpec extends SparkSpec {

  test("HLL estimate within 3*rsd of exact on every event type") {
    val r = graft.ops.Rollups
      .approxDistinctUsers(spark, "/root/testdata/sf0.01")
      .withColumn("err",
        abs(col("approx_users") - col("exact_users")) /
          col("exact_users").cast("double"))
    assert(r.count() > 0)
    assert(r.filter(col("err") > 3 * 0.015).count() === 0)
  }
}
