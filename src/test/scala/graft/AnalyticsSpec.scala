package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the behavioral-analytics ops (values are
  * oracle-checked; these pin the semantics that make the numbers
  * meaningful).
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("funnel stages shrink monotonically and ratios stay in [0,1]") {
    val r = graft.ops.Analytics.funnelConversion(spark, sf).head
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p && p >= 0)
    assert(v > c, "funnel window should be selective on this fixture")
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
  }

  test("cohort retention: offset-0 count equals cohort size and no " +
       "offset exceeds it") {
    val ret = graft.ops.Analytics.cohortRetention(spark, sf)
      .groupBy("cohort")
      .agg(
        max(when(col("day_offset") === 0, col("n_users"))).as("day0"),
        max("n_users").as("peak"))
    assert(ret.filter(col("day0").isNull || col("peak") > col("day0"))
      .count() === 0)
  }

  test("scd2 history: intervals tile each user's stream exactly") {
    val ev = Tables.events(spark, sf)
    val hist = graft.ops.Analytics.scd2UserHistory(spark, sf).cache()
    // conservation: island sizes sum back to the user's event count
    val perUser = hist.groupBy("user_id")
      .agg(sum("n_events").as("n"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_open"))
    val evCounts = ev.groupBy("user_id").agg(count(lit(1)).as("n_ev"))
    assert(perUser.join(evCounts, "user_id")
      .filter(col("n") =!= col("n_ev") || col("n_open") =!= 1)
      .count() === 0, "each user: islands tile the stream, one open version")
    // adjacency: valid_to equals the NEXT island's valid_from
    val nxt = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("seg_id")
    assert(hist.withColumn("nf", lead("valid_from", 1).over(nxt))
      .filter(!(col("valid_to") <=> col("nf"))).count() === 0)
    // no two adjacent islands share a state (else they'd be one island)
    assert(hist.withColumn("ns", lead("state", 1).over(nxt))
      .filter(col("ns").isNotNull && col("ns") === col("state"))
      .count() === 0)
    hist.unpersist()
  }

  test("tukey outliers: fences ordered, counts partition the stream") {
    val out = graft.ops.Analytics.outlierEvents(spark, sf)
    assert(out.filter(col("lo_fence") >= col("hi_fence")).count() === 0)
    val ev = Tables.events(spark, sf)
    val inFence = ev.join(out.select("event_type", "lo_fence", "hi_fence"),
        "event_type")
      .filter(col("value") >= col("lo_fence") &&
        col("value") <= col("hi_fence"))
      .groupBy("event_type").agg(count(lit(1)).as("n_in"))
    val total = ev.groupBy("event_type").agg(count(lit(1)).as("n_all"))
    assert(out.join(inFence, "event_type").join(total, "event_type")
      .filter(col("n_outliers") + col("n_in") =!= col("n_all"))
      .count() === 0)
  }

  test("repetition signals: shares within (0,1], top gram count consistent") {
    val rep = graft.ops.TextAnalysis.repetitionSignals(spark, sf)
    assert(rep.filter(
      col("top_2gram_share") <= 0 || col("top_2gram_share") > 1 ||
        col("dup_word_fraction") < 0 || col("dup_word_fraction") >= 1 ||
        col("top_2gram_n") < 1).count() === 0)
    assert(rep.count() === Tables.documents(spark, sf).count())
  }

  test("length histogram partitions the corpus exactly") {
    val h = graft.ops.TextAnalysis.lengthHistogram(spark, sf)
      .agg(sum("n_docs"), sum("sum_chars")).head
    val d = Tables.documents(spark, sf)
      .agg(count(lit(1)), sum("n_chars")).head
    assert(h.getLong(0) === d.getLong(0))
    assert(h.getLong(1) === d.getLong(1))
  }

  test("gapfill: complete hourly spine, counts conserved, LOCF never null") {
    val g = graft.ops.Analytics.gapfillLocf(spark, sf)
    // spine completeness: per type, rows == hours between its min and max
    val spine = g.groupBy("event_type")
      .agg(count(lit(1)).as("rows"),
        ((unix_timestamp(max("h")) - unix_timestamp(min("h"))) / 3600 + 1)
          .as("hours")).collect()
    spine.foreach(r => assert(r.getAs[Long]("rows").toDouble
      === r.getAs[Double]("hours")))
    // event mass conserved; fills marked and non-null after the first hour
    val total = g.agg(sum("n_events")).head.getLong(0)
    assert(total === Tables.events(spark, sf).count())
    assert(g.filter(col("revenue_locf").isNull).count() === 0)
    assert(g.filter(col("is_gap") === 1 && col("n_events") =!= 0)
      .count() === 0)
  }
}
