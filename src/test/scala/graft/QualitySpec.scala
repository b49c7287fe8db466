package graft

import org.apache.spark.sql.functions._

/** Invariants of the profiling / rebalancing / Q21 ops beyond the value
  * parity the oracle proves.
  */
class QualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("data profile: one row per column, consistent with the table") {
    val ev = Tables.events(spark, sf)
    val prof = graft.ops.Quality.dataProfile(spark, sf).cache()
    assert(prof.count() === 5)
    val n = ev.count()
    assert(prof.filter(col("n_rows") =!= n).count() === 0)
    // the fixture is constraint-clean: no nulls anywhere
    assert(prof.filter(col("n_nulls") =!= 0).count() === 0)
    // event_id is the unique key — profiling must see full cardinality
    assert(prof.filter(col("column") === "event_id")
      .head.getAs[Long]("n_distinct") === n)
    // string columns carry no numeric range; numeric ones always do
    assert(prof.filter(col("column").isin("event_type", "props") &&
      (col("min_num").isNotNull || col("max_num").isNotNull)).count() === 0)
    assert(prof.filter(col("column").isin("event_id", "user_id", "value") &&
      (col("min_num").isNull || col("max_num") < col("min_num")))
      .count() === 0)
    prof.unpersist()
  }

  test("corpus rebalance: every lang shrinks toward the minority size") {
    val reb = graft.ops.TrainingSets.corpusRebalance(spark, sf).cache()
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(reb.count() === langs)
    assert(reb.filter(col("n_after") > col("n_before")).count() === 0)
    val nMin = reb.agg(min("n_before")).head.getLong(0)
    // md5-coin acceptance is binomial around n_min — bound the spread
    assert(reb.filter(abs(col("n_after") - nMin) > 0.25 * nMin)
      .count() === 0, "every lang's sampled size stays near the target")
    reb.unpersist()
  }

  test("q21 aggregate rewrite equals the naive EXISTS formulation") {
    Tables.registerAll(spark, sf)
    val naive = spark.sql(
      """WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l
        |  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, count(*) AS numwait
        |FROM late t JOIN supplier ON t.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = t.l_orderkey
        |    AND l2.l_suppkey <> t.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late u
        |    WHERE u.l_orderkey = t.l_orderkey AND u.l_suppkey <> t.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
    val fast = graft.ops.StarQueries.q21WaitingSuppliers(spark, sf)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }
}
