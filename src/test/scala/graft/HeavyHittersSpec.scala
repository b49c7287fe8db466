package graft

import org.apache.spark.sql.functions._

/** Misra-Gries guarantee under real counter eviction: with k counters far
  * below the key cardinality, every item with frequency > N/k must
  * survive the sketch whatever order partitions merge in, and the
  * two-pass query must equal the exact threshold answer.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG sketch retains all > N/k items despite eviction; " +
       "two-pass output is exact") {
    // skewed stream: 'hot' = 400 of 1000 items, 'warm' = 100, the rest
    // spread thinly across 50 cold keys — k=8 forces eviction (59 keys)
    val items = Seq.fill(400)("hot") ++ Seq.fill(100)("warm") ++
      (0 until 500).map(i => s"cold${i % 50}")
    val ds = spark.createDataset(scala.util.Random.shuffle(items))
      .repartition(7) // arbitrary partitioning: merge order must not matter
    val agg = new graft.ops.HeavyHitters.MisraGries(8).toColumn
    val sketch = ds.groupByKey(_ => 0).agg(agg.name("mg"))
      .collect().head._2
    // N/k = 125: 'hot' (400) must survive; 'warm' (100) may or may not
    assert(sketch.contains("hot"))
    assert(sketch.size <= 8)

    // two-pass exactness on the documents corpus vs a plain exact count
    val sf = "/root/testdata/sf0.01"
    val got = graft.ops.HeavyHitters.heavyHitterTokens(spark, sf)
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
    val total = toks.count()
    val want = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") * 1000L >= lit(total) * 34L)
    assert(got.count() === want.count())
    assert(got.select("token", "n")
      .exceptAll(want.select(col("w"), col("n"))).count() === 0)
    assert(got.count() > 0)
  }
}
