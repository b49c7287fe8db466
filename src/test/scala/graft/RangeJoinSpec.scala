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
