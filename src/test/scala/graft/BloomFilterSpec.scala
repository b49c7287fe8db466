package graft

import org.apache.spark.sql.functions._

/** The 100 TB shuffle-join guard: Spark's runtime bloom-filter injection
  * (SPARK-32268) builds a bloom filter from the selective (filtered) side
  * of a shuffle join and semi-filters the large side BEFORE its shuffle —
  * the engine-level equivalent of the hand-written bloom pushdown a
  * native engine would ship. This spec pins that the feature engages on
  * our star-schema shape, so a config regression (or a plan rewrite that
  * breaks the injection pattern) is caught at test time.
  *
  * Thresholds are lowered to fixture scale: in production the defaults
  * (10 MB creation side / 10 GB application side) gate the same rewrite.
  */
class BloomFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("runtime bloom filter injects might_contain on the probe side " +
       "of a selective shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val o = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_totalprice")
      val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("might_contain"),
        s"runtime bloom filter not injected:\n$planStr")
      assert(joined.collect().head.getLong(0) > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
