package graft

import org.apache.spark.sql.functions._

/** Privacy guarantees the redaction queries must actually deliver (the
  * oracle proves value parity; these pin the properties that make the
  * output safe to release).
  */
class PrivacySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("redaction: no digits survive masking, pseudonyms stay unique") {
    val red = graft.ops.Privacy.piiRedact(spark, sf).cache()
    val n = Tables.customer(spark, sf).count()
    assert(red.count() === n)
    assert(red.filter(col("masked_name").rlike("[0-9]")).count() === 0)
    // pseudonymization must not merge subjects (48-bit space, no collision)
    assert(red.select("pseudonym").distinct().count() === n)
    // generalization: every band is a 500-multiple
    assert(red.filter(pmod(col("acctbal_band"), lit(500.0)) =!= 0.0 &&
      pmod(col("acctbal_band"), lit(500.0)) =!= -0.0).count() === 0)
    red.unpersist()
  }

  test("k-anonymity audit: group sizes cover every subject, flag is n<k") {
    val audit = graft.ops.Privacy.kAnonymity(spark, sf, k = 5)
    val total = audit.agg(sum("n")).head.getLong(0)
    assert(total === Tables.customer(spark, sf).count())
    assert(audit.filter(
      (col("n") < 5 && col("under_k") =!= 1) ||
        (col("n") >= 5 && col("under_k") =!= 0)).count() === 0)
  }

  test("keep-latest dedup equals the window keep-newest formulation") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
    val w = Window.partitionBy("user_id")
      .orderBy(desc("ts"), desc("event_id"))
    val viaWindow = ev
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        round(col("value"), 2).as("last_value"))
    val viaArgmax = graft.ops.Dedup.dedupLatest(spark, sf)
    assert(viaArgmax.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaArgmax).isEmpty)
  }

  test("weighted sample: acceptance tracks the length-proportional rate") {
    val docs = Tables.documents(spark, sf)
    val sampled = graft.ops.TrainingSets.weightedSample(spark, sf)
      .agg(sum("n_sampled")).head.getLong(0)
    // E[accepted] = sum(n_chars)/1000; md5 coins are near-uniform, so the
    // realized count sits within a loose 15% of it (deterministic fixture)
    val expected = docs.agg(sum("n_chars")).head.getLong(0) / 1000.0
    assert(math.abs(sampled - expected) <= 0.15 * expected,
      s"sampled=$sampled expected≈$expected")
  }
}
