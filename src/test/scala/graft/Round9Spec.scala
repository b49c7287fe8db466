package graft

import org.apache.spark.sql.functions._

/** Properties of the round-9 operators: the n-gram novelty profile, the
  * early/late value-drift report, and the end-to-end streaming queries'
  * batch equivalence at spec scale (their value-level gate is the DuckDB
  * oracle at sf0.01; these pin the invariants the oracle can't state).
  */
class Round9Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ngram novelty: bins partition the eligible corpus, duplicated " +
       "counts are bounded by totals, and accounting is exact") {
    val out = graft.ops.Dedup.ngramNovelty(spark, sf).collect()
    // bins are integer deciles of a fraction in [0, 1]
    assert(out.forall(r => r.getLong(0) >= 0L && r.getLong(0) <= 10L))
    out.foreach(r => assert(r.getLong(3) <= r.getLong(2),
      s"bin ${r.getLong(0)}: dup > total"))
    // every >=3-word doc lands in exactly one bin
    val eligible = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3).count()
    assert(out.map(_.getLong(1)).sum === eligible)
    // corpus-level shingle accounting matches an independent recompute
    val sh = Tables.documents(spark, sf)
      .select(explode(graft.ops.Dedup.shingleCol(col("text"))).as("s"))
    assert(out.map(_.getLong(2)).sum === sh.count())
    val dupTotal = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .agg(sum("df")).collect()(0).getLong(0)
    assert(out.map(_.getLong(3)).sum === dupTotal)
  }

  test("value drift: cross-multiplied scores sum to ZERO within every " +
       "event type (p_early and p_late are both distributions)") {
    val df = graft.ops.Analytics.valueDrift(spark, sf)
    val sums = df.groupBy("event_type")
      .agg(sum("drift_scaled").as("s"), sum("n_early").as("ne"),
        sum("n_late").as("nl")).collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      assert(r.getLong(1) === 0L, s"${r.getString(0)}: drift must telescope")
      // the midpoint split sees both halves populated for every type
      assert(r.getLong(2) > 0L && r.getLong(3) > 0L)
    }
    // every event is accounted exactly once
    val total = df.agg(sum(col("n_early") + col("n_late")))
      .collect()(0).getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("vocab coverage: thresholds are monotone and accounting is exact") {
    val r = graft.ops.CorpusStats.vocabCoverage(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (vocab, total) = (row.getLong(0), row.getLong(1))
    val (r50, r90, r99) = (row.getLong(2), row.getLong(3), row.getLong(4))
    assert(r50 <= r90 && r90 <= r99 && r99 <= vocab)
    assert(r50 >= 1L)
    // totals match an independent recompute of the token stream
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    assert(total === toks.count())
    assert(vocab === toks.distinct().count())
  }

  test("rolling active users: DAU <= WAU <= MAU, day spine complete") {
    val out = graft.ops.Analytics.rollingActiveUsers(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
    }
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(out.forall(_.getLong(3) <= users))
    val days = Tables.events(spark, sf)
      .select(to_date(col("ts"))).distinct().count()
    assert(out.length.toLong === days)
  }

  test("stream TWS sessions == batch sessionization on the full fixture") {
    val got = graft.streaming.StreamAssembly
      .streamSessionsTws(spark, sf)
    val want = graft.ops.Sessions.sessionize(spark, sf)
      .select("user_id", "session_start", "n_events", "total_value")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0L)
  }

  test("watermarked evicting stream join == batch interval join " +
       "(time-ordered replay means eviction drops only unmatchable state)") {
    val got = graft.streaming.StreamAssembly
      .streamJoinFollowupsWatermarked(spark, sf)
    val p = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_type"))
    val want = p.as("a").join(p.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") > col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        (col("a.user_id") % 16).cast("long").as("user_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("a.user_id")).as("n_users"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0L)
  }
}
