package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral analytics over the `events` stream — the funnel and cohort
  * views a realtime dashboard (the reference's Metabase surface, SURVEY.md
  * §3 EP3) serves next after the rollup tiles. Both are deterministic
  * integer-count programs: stage membership is defined by min-timestamps
  * (a pure function of the event set), ratios are double quotients of
  * exact counts.
  */
object Analytics {

  /** Robust per-type value statistics via ORDER statistics rather than
    * moments: the mode of the coarse value bucket (floor(value/10), ties
    * to the LOWEST bucket — an explicit argmax over (count, -bucket), so
    * the tie policy is part of the definition, not an engine accident) and
    * the discrete median (the element at position (n+1) div 2 of the
    * sorted multiset — percentile_disc semantics, defined identically on
    * both engines via row_number so no interpolation ever runs). Mode is
    * two partial-aggregating shuffles on bounded keys; the median window
    * partitions by event_type — fine for bounded type cardinality, and at
    * unbounded-key scale the same statistic comes from the mergeable
    * sketch path (`approx_value_quantiles`).
    */
  def robustStats(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"),
        floor(col("value") / 10.0).cast("long").as("bucket"))
    val mode = e.groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("event_type")
      .agg(max(struct(col("cnt"), (-col("bucket")).as("nb"))).as("best"))
      .select(col("event_type"), (-col("best.nb")).as("mode_bucket"),
        col("best.cnt").as("mode_count"))
    val w = Window.partitionBy("event_type").orderBy("value")
    val med = e
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max("n").as("n"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("value")))
          .as("median_disc"))
    mode.join(med, "event_type")
      .select(col("event_type"), col("n"), col("mode_bucket"),
        col("mode_count"), col("median_disc"))
      .orderBy("event_type")
  }

  /** RANGE-frame window battery — the value-based frame type the rest of
    * the window surface doesn't exercise (rows frames in `window_battery`,
    * unbounded in `share_of_total`): per event, activity in the TRAILING
    * HOUR of the same user via `rangeBetween` over exact epoch
    * MICROSECONDS (`unix_micros` ≡ the oracle's `epoch_us` — whole-second
    * truncation would disagree on sub-second gaps). Peers (equal
    * timestamps) are all in-frame by RANGE semantics, so the result is
    * deterministic under ties. One user-keyed exchange; frame evaluation
    * is the standard sliding two-pointer over each partition.
    */
  def windowRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_trailing_hour"),
        round(sum(col("value").cast("decimal(18,6)")).over(w)
          .cast("double"), 2).as("sum_trailing_hour"))
      .orderBy("event_id")
  }

  /** Equi-depth (quantile-bucketed) histogram of value per event type:
    * bucket = (k·(rn−1)) div n over the value-ordered row_number — row
    * assignment among EQUAL values is arbitrary, but swapping equal values
    * across a boundary leaves every bucket's multiset unchanged, so
    * count/min/max/sum are all deterministic. The complement of
    * `length_histogram`'s equi-width buckets; sums fold as DECIMAL
    * (order-independent) before the 2-decimal present.
    */
  def equidepthHistogram(spark: SparkSession, sfDir: String,
                         k: Int = 4): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("value")
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("bucket", expr(s"($k * (rn - 1)) div n"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("value").as("vmin"),
        max("value").as("vmax"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
          .as("sum_value"))
      .orderBy("event_type", "bucket")
  }

  /** Distributed global ranking — dense total order over the whole corpus
    * WITHOUT a single-partition global window (the standard
    * `row_number() OVER (ORDER BY …)` funnels every row through one task;
    * at 100 TB that is the job that never finishes). Two-phase
    * bucket-offset ranking instead, the external-sort discipline:
    *
    *   1. bucket rows by the ORDER key's coarse value (here `n_chars` —
    *      bounded cardinality; any range-bucketing of the key works);
    *      count per bucket; prefix-sum the counts into bucket offsets
    *      (the cumsum window runs over BUCKET-COUNT rows, not data rows —
    *      safe on one partition at any corpus size);
    *   2. broadcast the offsets back and rank locally WITHIN each bucket
    *      (window partitioned by bucket — parallel across buckets, each
    *      bounded); global_rank = bucket offset + local rank.
    *
    * Reported as a per-decile digest (count, id checksum, char mass) so
    * the oracle pins every rank without shipping 100 TB of ranked rows;
    * the full ranked frame is the pre-aggregation interior. Tie order is
    * total and explicit: (n_chars, doc_id).
    */
  def globalRankDocs(spark: SparkSession, sfDir: String,
                     deciles: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val offsets = docs.groupBy("n_chars").agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum("cnt").over(
          Window.orderBy("n_chars").rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
    // corpus total rides out of the same bucket-count frame as a 1-row
    // broadcast — no driver-side count() action in the query path
    val total = offsets.agg(max(col("offset") + col("cnt")).as("total"))
    val ranked = docs
      .join(broadcast(offsets.select(col("n_chars"), col("offset"))),
        Seq("n_chars"))
      .withColumn("local_rank", row_number().over(
        Window.partitionBy("n_chars").orderBy("doc_id")).cast("long"))
      .withColumn("global_rank", col("offset") + col("local_rank"))
    ranked
      .crossJoin(broadcast(total))
      .withColumn("decile",
        expr(s"($deciles * (global_rank - 1)) div total"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        min("global_rank").as("min_rank"), max("global_rank").as("max_rank"),
        sum("doc_id").as("id_sum"), sum("n_chars").as("sum_chars"))
      .orderBy("decile")
  }

  /** view → click → purchase funnel: a user advances a stage when the
    * stage's event occurs within `window` after their entry into the
    * previous stage (entry = the MIN qualifying timestamp, so membership
    * is order-independent and engine-portable). One row out: stage counts
    * + conversion ratios. The 12-hour default is tuned to the fixture's
    * event density so each stage is genuinely selective (150 → 37 → 7 at
    * sf0.01), not a vacuous all-pass.
    *
    * Scale shape: three user-keyed partial-min aggregates and two
    * user-keyed joins — everything shuffles on user_id once per stage and
    * the stage frames shrink monotonically; no window over the raw event
    * stream, no cross-stage re-scan beyond the per-stage filters.
    */
  def funnelConversion(spark: SparkSession, sfDir: String,
                       window: String = "12 hours"): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val win = expr(s"INTERVAL $window")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") >= col("t_view") && col("ts") <= col("t_view") + win)
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") >= col("t_click") && col("ts") <= col("t_click") + win)
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
      .select(col("n_view"), col("n_view_click"), col("n_full_funnel"),
        (col("n_view_click").cast("double") / col("n_view"))
          .as("click_through"),
        (col("n_full_funnel").cast("double") / col("n_view_click"))
          .as("purchase_through"))
  }

  /** RFM segmentation: each purchasing user scored by Recency (days since
    * last purchase, vs the corpus max day), Frequency (purchase count),
    * and Monetary (purchase value sum), each cut into quartiles — the
    * classic CRM segmentation matrix. Quartile semantics are EXACTLY
    * `ntile(4)` over a total order (metric + user_id tiebreak) — the
    * registered oracle keeps the ntile form, so the hash proves the
    * distributed rewrite below.
    *
    * Scale shape: NO unpartitioned window ever touches the per-user frame
    * (`ntile` over all users funnels the corpus' entire user population
    * through one task — the job that never finishes at 100 TB). Instead,
    * each metric gets a [[globalRankDocs]]-style bucket-offset global
    * rank: bucket by the metric's coarse value (recency day / frequency
    * count / floor(monetary) — all bounded-cardinality), prefix-sum the
    * per-bucket counts into offsets (a window over BUCKET-COUNT rows
    * only), broadcast the offsets back, rank locally within each bucket
    * in parallel, and map global_rank → quartile with ntile's exact
    * bucket arithmetic (`rem = N mod 4` leading buckets get
    * `ceil(N/4)` rows). Three bucket-keyed exchanges replace three
    * global sorts.
    */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
    val maxDay = p.agg(max(to_date(col("ts"))).as("max_day"))
    // DECIMAL(18,6) money arithmetic: exact and associative, so per-user
    // and per-segment sums are engine-identical regardless of fold order
    val perUser = p.groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast("decimal(18,6)")).as("monetary"))
      .crossJoin(broadcast(maxDay))
      .select(col("user_id"),
        datediff(col("max_day"), col("last_day")).cast("long").as("recency"),
        col("frequency"), col("monetary"))
    // ntile(4)'s exact bucket split as rank arithmetic: the first
    // (N mod 4) tiles hold ceil(N/4) rows, the rest floor(N/4)
    def ntile4(rank: String, total: String): Column = expr(
      s"""CASE WHEN $rank <= ($total % 4) * (($total div 4) + 1)
         |  THEN ($rank - 1) div (($total div 4) + 1) + 1
         |  ELSE ($total % 4) +
         |    ($rank - ($total % 4) * (($total div 4) + 1) - 1)
         |      div ($total div 4) + 1 END""".stripMargin).cast("int")
    val withM = perUser
      .withColumn("m_bucket", floor(col("monetary")).cast("long"))
    val metrics = Seq("recency", "frequency", "m_bucket")
    // ONE grouping-sets aggregate yields all three metrics' bucket-count
    // frames through a single (reusable) exchange — three separate
    // groupBys would each recompute the per-user subtree
    val sets = withM.groupingSets(metrics.map(m => Seq(col(m))),
        metrics.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    // bucket offsets per metric: the prefix-sum window runs over the
    // BUCKET-COUNT slice only; `asc` flips it so rank 1 is the best
    def offsetsFor(bucket: String, asc: Boolean): DataFrame = {
      val b = col(bucket)
      sets.filter(metrics.map(m =>
          if (m == bucket) col(m).isNotNull else col(m).isNull)
          .reduce(_ && _))
        .withColumn("offset", coalesce(sum("cnt").over(
          Window.orderBy(if (asc) b.asc else b.desc).rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
        .select(b, col("offset"))
    }
    // N is the same for every metric: one tiny agg over one slice
    val total = sets.filter(col("recency").isNotNull)
      .agg(sum("cnt").cast("long").as("total"))
    // broadcast the offsets back; rank locally WITHIN each bucket
    // (parallel across buckets); global rank = offset + local rank
    def quartile(df: DataFrame, bucket: String, asc: Boolean,
                 inBucket: Seq[Column], out: String): DataFrame =
      df.join(broadcast(offsetsFor(bucket, asc)), Seq(bucket))
        .withColumn("lr", row_number().over(
          Window.partitionBy(bucket).orderBy(inBucket: _*)).cast("long"))
        .withColumn(out, ntile4("(offset + lr)", "total"))
        .drop("offset", "lr")
    val seg =
      quartile(
        quartile(
          quartile(withM.crossJoin(broadcast(total)),
            "recency", asc = true, Seq(col("user_id").asc), "r_q"),
          "frequency", asc = false,
          Seq(col("user_id").asc), "f_q"),
        "m_bucket", asc = false,
        Seq(col("monetary").desc, col("user_id").asc), "m_q")
    seg.groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"),
        round(sum("monetary").cast("double"), 2).as("total_monetary"))
      .orderBy("r_q", "f_q", "m_q")
  }

  /** Cohort retention: users grouped by first-activity day (their cohort),
    * counted on each later active day as an offset from the cohort day —
    * the classic retention triangle. The (user, day) frame is
    * pre-distincted so the final count is a plain count; cohort assignment
    * is a user-keyed min. Two shuffles total (user_id, then
    * (cohort, offset)), both with map-side combine.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = ud.groupBy("user_id").agg(min("day").as("cohort"))
    ud.join(cohorts, "user_id")
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  /** SCD type-2 history: collapse each user's event stream into validity
    * intervals of consecutive equal states (gaps-and-islands), each island
    * carrying valid_from / valid_to (the next island's start; null = the
    * open current version) — how a warehouse versions a slowly-changing
    * dimension from a change stream. Island ids come from a running sum of
    * change markers; ties on ts break on event_id, so intervals are a pure
    * function of the event set.
    *
    * Scale shape: two window passes over the SAME user_id partitioning
    * (lag + running sum — one shuffle, one sort, both windows ride it),
    * one island groupBy, then a lead over the (much smaller) island frame.
    */
  def scd2UserHistory(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prev = lag("event_type", 1).over(byUser)
    val marked = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type")
      .withColumn("chg",
        when(prev.isNull || prev =!= col("event_type"), 1).otherwise(0))
    val islands = marked
      .withColumn("seg_id", sum("chg").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seg_id")
      .agg(min("event_type").as("state"), // constant within an island
        min("ts").as("valid_from"), count(lit(1)).as("n_events"))
    islands
      .withColumn("valid_to", lead("valid_from", 1).over(
        Window.partitionBy("user_id").orderBy("seg_id")))
      .select("user_id", "seg_id", "state", "valid_from", "valid_to",
        "n_events")
      .orderBy("user_id", "seg_id")
  }

  /** Event transition matrix — the user-flow analysis behind every
    * product funnel dashboard: consecutive event pairs per user (by event
    * time, event_id tiebreak), counted into a from→to matrix with the
    * transition share reported in exact integer parts-per-million
    * (`n·1e6 div from_total` — a float probability would hang the hash
    * on division rounding).
    *
    * Scale shape: one user-keyed window pass (lead — single shuffle +
    * sort), one (from, to) aggregate over the bounded type×type frame,
    * per-from totals re-aggregated from that tiny frame and broadcast
    * back.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type")
      .agg(sum("n").cast("long").as("from_total"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n").cast("long").as("n"),
        expr("(n * 1000000) div from_total").as("ppm"))
      .orderBy("from_type", "to_type")
  }

  /** Conversion latency distribution: for each user whose first purchase
    * is AT or after their first view (>= — a same-instant conversion
    * lands in bucket 0, matching the oracle), full days between first
    * view and first purchase, bucketed. All arithmetic is exact
    * integer microsecond differences; two user-keyed min-aggregates and
    * one bounded histogram aggregate.
    */
  def conversionLatency(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def firstOf(t: String, out: String) =
      ev.filter(col("event_type") === t)
        .groupBy("user_id").agg(min("ts").as(out))
    firstOf("view", "first_view")
      .join(firstOf("purchase", "first_purchase"), Seq("user_id"))
      .filter(col("first_purchase") >= col("first_view"))
      // integer div, not `/`: Spark's `/` is double division, and a
      // quotient landing a hair under a day boundary would truncate
      // differently than the oracle's integer floor-div
      .select((unix_micros(col("first_purchase")) -
        unix_micros(col("first_view"))).as("us"))
      .select(expr("us div 86400000000").as("days_to_convert"))
      .groupBy("days_to_convert")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("days_to_convert")
  }

  /** Rolling active users — the DAU/WAU/MAU engagement report: for every
    * observed day, the distinct users active that day, in the trailing 7
    * days, and in the trailing 30 days. The (user, day) frame joins a
    * BROADCAST day spine (bounded: one row per distinct day) on the
    * 30-day containment condition; the three horizons are conditional
    * distinct counts over that one fanned frame — never three separate
    * scans.
    *
    * Scale shape: the fan-out is |user-days| × ≤30 with a broadcast
    * nested-loop against the tiny spine (non-equi by nature, build side
    * = days only); one aggregate exchange on day. The exact multi-
    * distinct aggregate expands ×3 pre-shuffle — at corpus scale the
    * standard swap is per-day HLL sketches merged across the window
    * (approx_count_distinct, mergeable = the scale path), keeping the
    * identical spine-join shape.
    */
  def rollingActiveUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("uday"), col("user_id"))
      .distinct()
    val days = ud.select(col("uday").as("wday")).distinct()
    ud.join(broadcast(days),
        col("uday") <= col("wday") &&
          col("uday") >= date_sub(col("wday"), 29))
      .groupBy(col("wday").as("day"))
      .agg(
        countDistinct(when(col("uday") === col("wday"), col("user_id")))
          .as("dau"),
        countDistinct(when(col("uday") >= date_sub(col("wday"), 6),
          col("user_id"))).as("wau"),
        countDistinct(col("user_id")).as("mau"))
      .orderBy("day")
  }

  /** The 100 TB form of [[rollingActiveUsers]]: per-day MERGEABLE HLL
    * sketches (Datasketches `hll_sketch_agg`) union-merged over the same
    * broadcast 30-day spine. The sketch frame entering the spine join has
    * ONE ROW PER DAY (a few KB each) — at any corpus size the fan-out is
    * days×30 sketch merges, not user-days×30 row replays, which is why
    * engagement tiers at scale run on sketches. Hash-gated via the error
    * contract ([[graft.ops.Rollups.approxDistinctUsersGated]]'s pattern):
    * the emitted dau/wau/mau are the EXACT counts, each alongside a
    * boolean pinning the sketch estimate within 5%+5 of it (Datasketches
    * HLL at lgK=12 is ~1.6% rsd; the slack absorbs small-count modes), so
    * the oracle is the exact SQL plus literal TRUEs and an out-of-bound
    * sketch flips the hash. At deployment the exact arm drops away and
    * only the sketch arm runs (per-day sketches persist and re-merge for
    * any horizon without rescanning history).
    */
  def rollingActiveUsersHll(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("uday"), col("user_id"))
      .groupBy("uday")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val days = daily.select(col("uday").as("wday"))
    val est = daily.join(broadcast(days),
        col("uday") <= col("wday") &&
          col("uday") >= date_sub(col("wday"), 29))
      .groupBy(col("wday"))
      .agg(
        hll_sketch_estimate(hll_union_agg(
          when(col("uday") === col("wday"), col("sk")))).as("dau_est"),
        hll_sketch_estimate(hll_union_agg(
          when(col("uday") >= date_sub(col("wday"), 6), col("sk"))))
          .as("wau_est"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("mau_est"))
      .withColumnRenamed("wday", "day")
    def ok(est: String, exact: String): Column =
      (abs(col(est) - col(exact)) <=
        col(exact).cast("double") * 0.05 + 5).as(s"${exact}_ok")
    rollingActiveUsers(spark, sfDir).join(est, "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        ok("dau_est", "dau"), ok("wau_est", "wau"), ok("mau_est", "mau"))
      .orderBy("day")
  }

  /** Point-in-time (PIT) state lookup — the feature-store join every
    * leakage-aware training pipeline needs: for each purchase, find the
    * user's [[scd2UserHistory]] state that was valid one hour BEFORE the
    * purchase timestamp (a training feature must come from the version
    * valid at lookup time, never a later one — the temporal analogue of
    * the leakage-safe split). Purchases whose lookup instant precedes the
    * user's first island report state 'none'.
    *
    * Scale shape: the SCD2 interval frame is islands-per-user (small);
    * the PIT join is a user-keyed equi-join with a row-local interval
    * containment filter — one shuffle per side, never an interval×event
    * cross product, because intervals within a user partition the
    * timeline so each probe matches AT MOST one version row.
    */
  def pitStateLookup(spark: SparkSession, sfDir: String,
                     lag: String = "1 hour"): DataFrame = {
    val hist = scd2UserHistory(spark, sfDir)
      .select(col("user_id").as("h_user"), col("state"),
        col("valid_from"), col("valid_to"))
    val probes = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"),
        (col("ts") - expr(s"INTERVAL $lag")).as("at"))
    probes.join(hist,
        col("user_id") === col("h_user") &&
          col("at") >= col("valid_from") &&
          (col("valid_to").isNull || col("at") < col("valid_to")),
        "left_outer")
      .groupBy(coalesce(col("state"), lit("none")).as("prior_state"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct("user_id").as("n_users"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
          .as("total_value"))
      .orderBy("prior_state")
  }

  /** Anomaly report: Tukey-fence outliers per event_type (value outside
    * [q1 - 1.5·IQR, q3 + 1.5·IQR]). Quartiles are exact interpolated
    * percentiles (≡ DuckDB quantile_cont, the same parity already proven
    * by value_quantiles); fences are deterministic IEEE arithmetic on
    * them; outlier min/max are selections, not arithmetic. Shape: one
    * tiny per-type aggregate broadcast back over the scan — two passes,
    * zero fact shuffles.
    */
  def outlierEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val q = ev.groupBy("event_type").agg(
      expr("percentile(value, 0.25)").as("q1"),
      expr("percentile(value, 0.75)").as("q3"))
    val lo = col("q1") - (col("q3") - col("q1")) * 1.5
    val hi = col("q3") + (col("q3") - col("q1")) * 1.5
    ev.join(broadcast(q), "event_type")
      .withColumn("lo_fence", lo)
      .withColumn("hi_fence", hi)
      .filter(col("value") < col("lo_fence") ||
        col("value") > col("hi_fence"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_outliers"),
        min("value").as("min_outlier"), max("value").as("max_outlier"),
        min("lo_fence").as("lo_fence"), min("hi_fence").as("hi_fence"))
      .orderBy("event_type")
  }

  /** Time-series resampling with LOCF (last observation carried forward):
    * regularize each event type's hourly revenue series onto a complete
    * hourly spine, carrying the last seen value across the ~7% of hours
    * with no events. The spine is generated per key from its own
    * [min, max] hour range (`sequence` + explode — rows materialize
    * map-side, never on the driver), the actual series left-joins onto it,
    * and the carry-forward is one `last(_, ignoreNulls)` pass over the
    * per-key hour order.
    *
    * Scale shape: the spine is |keys| × hours — tiny next to the event
    * scan; everything shuffles once on the (bounded-cardinality) type key,
    * and the window runs inside that same partitioning. At 100 TB you'd
    * gap-fill per (key, day) partition exactly the same way.
    */
  def gapfillLocf(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_events"),
        graft.ops.Num.moneySum(col("value")).as("revenue"))
    val spine = hourly.groupBy("event_type")
      .agg(min("h").as("lo"), max("h").as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "h"), "left_outer")
      .select(col("event_type"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("revenue").isNull, lit(1)).otherwise(lit(0)).as("is_gap"),
        last(col("revenue"), ignoreNulls = true).over(w).as("revenue_locf"))
      .orderBy("event_type", "h")
  }

  /** Distribution drift between the first and second half of the event
    * timeline — the train/serve skew check every production pipeline runs
    * before trusting a model on fresh data. Each event lands in an early/
    * late half (split at the midpoint of the observed time range) and a
    * fixed-width value bin; the report compares the two halves' bin
    * histograms per event type.
    *
    * Drift is scored ENGINE-EXACTLY without a single float ratio: the
    * per-bin score is the cross-multiplied proportion difference
    * `n_early·total_late − n_late·total_early` (the numerator of
    * p_early − p_late over a common denominator) — pure BIGINT
    * arithmetic, so the sign and relative magnitude carry the PSI-style
    * signal while the hash stays portable. (A PSI with `ln` would hang
    * the gate on libm rounding.)
    *
    * Scale shape: one scan → one (type, bin) aggregate with both halves
    * as conditional sums (map-side combine); per-type totals re-aggregate
    * the tiny binned frame and broadcast back. Nothing ever shuffles on
    * more than the (type, bin) key space.
    */
  /** Bin width shared with the registered DuckDB oracle (interpolated into
    * the SQL — the KmeansK pattern — so operator and oracle cannot drift).
    */
  val ValueDriftBinWidth: Int = 10

  def valueDrift(spark: SparkSession, sfDir: String,
                 binWidth: Int = ValueDriftBinWidth): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("value"))
    val mid = ev.agg(((min(unix_micros(col("ts"))) +
      max(unix_micros(col("ts")))).cast("long")).as("mn_mx"))
      .select(expr("mn_mx div 2").as("mid"))
    val binned = ev.crossJoin(broadcast(mid))
      .withColumn("late",
        (unix_micros(col("ts")) > col("mid")).cast("int"))
      .withColumn("bin",
        floor(col("value") / lit(binWidth.toDouble)).cast("long"))
      .groupBy("event_type", "bin")
      .agg(sum(lit(1) - col("late")).as("n_early"),
        sum(col("late")).as("n_late"))
    val totals = binned.groupBy("event_type")
      .agg(sum("n_early").as("total_early"),
        sum("n_late").as("total_late"))
    binned.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("bin"),
        col("n_early").cast("long").as("n_early"),
        col("n_late").cast("long").as("n_late"),
        (col("n_early") * col("total_late") -
          col("n_late") * col("total_early")).cast("long")
          .as("drift_scaled"))
      .orderBy("event_type", "bin")
  }

  /** Per-day discrete value percentiles of purchases (p50/p90) — the
    * daily-SLA percentile dashboard. Order statistics, not interpolation:
    * the reported number is an actual element of the day's multiset
    * (position (n+1) div 2 resp. ceil(9n/10) of the sorted values), so
    * both engines surface the IDENTICAL stored double and the gate needs
    * no rounding at all — no arithmetic ever touches the value. One
    * day-partitioned window (bounded per-day rows) + one aggregate; at
    * unbounded per-key cardinality the sketch path
    * (`approx_value_quantiles`) is the stated swap.
    */
  def dailyValuePercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("day").orderBy("value")
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"), col("value"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("day"))
        .cast("long"))
      .groupBy("day")
      .agg(max("n").as("n_purchases"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("value")))
          .as("p50"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("value")))
          .as("p90"))
      .orderBy("day")
  }

  /** Error-burst detection: hours whose error share exceeds the corpus
    * error share by ≥ `factorNum/factorDen` (default 1.5×), compared in
    * EXACT cross-multiplied integers — `n_err·T·den ≥ num·E·n_tot` — so
    * the alert threshold carries no float ratio. The excess is reported
    * scaled by the same products. One bounded hourly aggregate plus a
    * broadcast 1-row global; the alerting shape of a rate-anomaly
    * monitor (the value-outlier sibling is [[outlierEvents]]).
    */
  def errorBurstHours(spark: SparkSession, sfDir: String,
                      factorNum: Int = 3, factorDen: Int = 2): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(when(col("event_type") === "error", lit(1L))
        .otherwise(lit(0L))).as("n_err"),
        count(lit(1)).as("n_tot"))
    val glob = hourly.agg(sum("n_err").as("err_total"),
      sum("n_tot").as("all_total"))
    hourly.crossJoin(broadcast(glob))
      .withColumn("excess_scaled",
        (col("n_err") * col("all_total") * factorDen -
          col("err_total") * col("n_tot") * factorNum).cast("long"))
      .filter(col("excess_scaled") >= 0)
      .select(col("hour"), col("n_err").cast("long").as("n_err"),
        col("n_tot").cast("long").as("n_tot"), col("excess_scaled"))
      .orderBy("hour")
  }

  /** User activity histogram: users bucketed by their total event count —
    * the engagement-depth distribution (its long tail is what justifies
    * the skew handling elsewhere). Two bounded aggregates, all integers.
    */
  def userActivityHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("n_events")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("n_events")

  /** Month-over-month revenue growth: monthly purchase totals with the
    * previous month's delta in EXACT integer cents (decimal sums ×100 —
    * no float ratio in the gate; a growth percentage is the reader's
    * division). The lag window is global but runs over the MONTH frame
    * only (≤ tens of rows at any horizon) — the same bounded-frame
    * discipline as the Zipf rank window, never over the event stream.
    */
  def momGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val monthly = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("month", col("ts")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("value").cast("decimal(18,6)")) * 100).cast("long")
          .as("cents"))
    val w = Window.orderBy("month")
    monthly
      .withColumn("prev_cents", lag("cents", 1).over(w))
      .select(col("month"), col("n_orders"),
        (col("cents").cast("double") / 100).as("revenue"),
        (col("cents") - col("prev_cents")).as("delta_cents"))
      .orderBy("month")
  }

  /** Inter-purchase gap histogram: the distribution of whole-day gaps
    * between a user's CONSECUTIVE distinct purchase days — the
    * frequency/renewal profile behind repurchase-cycle dashboards. One
    * user-partitioned lag window over distinct (user, day) rows and a
    * bounded histogram aggregate; all integers.
    */
  def purchaseGapHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val days = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("gap_days",
        datediff(col("day"), lag("day", 1).over(w)).cast("long"))
      .filter(col("gap_days").isNotNull)
      .groupBy("gap_days")
      .agg(count(lit(1)).as("n_gaps"))
      .orderBy("gap_days")
  }

  /** New-vs-returning purchase split per day — the acquisition/retention
    * dashboard tile: a purchase is "new" when it lands on its user's
    * FIRST purchase day (min day per user — a pure function of the event
    * set, order-independent), "returning" after it. One user-keyed
    * min-aggregate broadcast back onto the purchase stream, then one
    * bounded daily aggregate; all integers.
    */
  def newVsReturning(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val first = p.groupBy("user_id").agg(min("day").as("first_day"))
    p.join(broadcast(first), Seq("user_id"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("day") === col("first_day"), lit(1L)).otherwise(lit(0L)))
          .cast("long").as("n_new"),
        sum(when(col("day") > col("first_day"), lit(1L)).otherwise(lit(0L)))
          .cast("long").as("n_returning"),
        countDistinct(when(col("day") === col("first_day"), col("user_id")))
          .as("n_new_users"))
      .orderBy("day")
  }

  /** Market-basket affinity: support counts of BRAND pairs co-purchased
    * inside one order (the association-rule support statistic, the first
    * stage of any basket/recommendation miner). Per-order distinct
    * brands are bounded by the order's line count (≤7 in TPC-H shape),
    * so the pair fan-out is a constant ≤21 per order — linear in orders,
    * never corpus-quadratic — and the top-k is a sort-limit
    * (TakeOrderedAndProject), the same discipline as the token-pair
    * miners. All integers.
    */
  def basketAffinity(spark: SparkSession, sfDir: String,
                     k: Int = 20): DataFrame = {
    val baskets = Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("b"))
      .distinct()
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.okey") === col("b.okey") && col("a.b") < col("b.b"))
      .groupBy(col("a.b").as("brand_a"), col("b.b").as("brand_b"))
      .agg(count(lit(1)).as("support"))
    pairs.orderBy(desc("support"), asc("brand_a"), asc("brand_b"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("support"), asc("brand_a"), asc("brand_b")))
        .cast("long"))
      .select(col("rank"), col("brand_a"), col("brand_b"), col("support"))
      .orderBy("rank")
  }

  /** Revenue concentration (Pareto view): how much of total order revenue
    * the top decile of customers carries. The global descending rank over
    * per-customer revenue uses the bucket-offset two-phase pattern
    * ([[globalRankDocs]]) — bucket counts broadcast as prefix offsets,
    * ranks assigned inside bucket-partitioned windows — so the
    * per-customer frame NEVER funnels through a single partition (the
    * rfm-ntile mistake this repo already retired). All gate values are
    * exact: revenue sums in DECIMAL (2-decimal fixture prices), the share
    * as integer cents cross-multiplied to ppm with floor division. The
    * ×1e6 ppm arithmetic stays far below 2⁶³ at fixture scale; a
    * web-scale ledger would widen to DECIMAL for the ppm step.
    */
  def paretoConcentration(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev"))
    val bucketed = rev.withColumn("bucket",
      floor(col("rev") / lit(10000)).cast("long"))
    val offsets = bucketed.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum("cnt").over(
          Window.orderBy(desc("bucket")).rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
    val total = offsets.agg(max(col("offset") + col("cnt")).as("n_customers"))
    bucketed
      .join(broadcast(offsets.select("bucket", "offset")), Seq("bucket"))
      .withColumn("local_rank", row_number().over(
        Window.partitionBy("bucket")
          .orderBy(desc("rev"), asc("o_custkey"))).cast("long"))
      .withColumn("global_rank", col("offset") + col("local_rank"))
      .crossJoin(broadcast(total))
      .withColumn("top_n", expr("(n_customers + 9) div 10"))
      .agg(
        max("n_customers").as("n_customers"),
        max("top_n").as("top_n"),
        (sum(when(col("global_rank") <= col("top_n"), col("rev"))
          .otherwise(lit(0))) * 100).cast("long").as("top_cents"),
        (sum(col("rev")) * 100).cast("long").as("total_cents"))
      .select(col("n_customers"), col("top_n"),
        (col("top_cents").cast("double") / 100).as("top_revenue"),
        (col("total_cents").cast("double") / 100).as("total_revenue"),
        // int128-wide ppm: top_cents·1e6 overflows BIGINT at the 20×
        // rehearsal's revenue volume (found by the sf2f gate); DECIMAL
        // DIV is exact integer floor division and returns LONG, the
        // oracle goes through HUGEINT — identical values at any scale
        expr("CAST(CAST(top_cents AS DECIMAL(38,0)) * 1000000" +
          " DIV total_cents AS BIGINT)").as("share_ppm"))
  }

  /** Last-touch attribution: every purchase is credited to the user's most
    * recent NON-purchase event within `windowMin` minutes (the channel
    * that "drove" it), or to `direct` if none. The deterministic total
    * order is (ts, event_id) — ties in event time resolve identically in
    * both engines, so the credited row is a pure function of the event
    * set. Revenue sums in DECIMAL(18,6) then rounds, per the float-parity
    * rules. Plan shape: one per-user window pass (a single keyed shuffle
    * on user_id, the same partitioning every per-user analytic here
    * shares) carrying a running `last(..., ignoreNulls)` over the
    * 1-PRECEDING frame — no self-join, no per-purchase probe; then a
    * bounded-key (≤ #event types + 1) aggregate. At 100 TB the window
    * partitions by user (millions of keys, bounded per-user rows) — never
    * a global window.
    */
  def attributionLastTouch(spark: SparkSession, sfDir: String,
                           windowMin: Int = 30): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = events
      .withColumn("touch_ts",
        last(when(col("event_type") =!= "purchase", col("ts")),
          ignoreNulls = true).over(w))
      .withColumn("touch_type",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
    touched
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("touch_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("touch_ts")) <=
            windowMin * 60000000L,
          col("touch_type")).otherwise(lit("direct")))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
          .as("revenue"))
      .orderBy("channel")
  }

  /** Per-type OLS trend of event value over time — the ClickHouse
    * `simpleLinearRegression` surface (public aggregate-function docs;
    * the reference's engine family exposes it natively), re-expressed
    * as ONE partial-aggregable pass: x = hour offset from the corpus
    * min, y = value in exact micro-units, and the five sufficient
    * statistics (n, Σx, Σy, Σxy, Σx²) accumulate in DECIMAL(38,0) so
    * the closed-form slope/intercept are pure integer arithmetic.
    *
    * Float discipline: `floor(value * 1e6)` is one IEEE multiply + a
    * floor — bit-identical cross-engine; every ratio is a sign-split
    * nonnegative integral division (negative-operand DIV semantics
    * differ across engines), so the gate hashes exact BIGINTs. The
    * denominator n·Σx²−(Σx)² is ≥ 0 by Cauchy–Schwarz; a zero
    * denominator (single-hour type) reports NULL.
    *
    * Scale shape: map-side partial aggregation into #event_type rows;
    * the 1-row corpus-min frame is broadcast. Nothing here grows with
    * the corpus except the one scan.
    */
  def linregValueTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    linregSolve(linregPartials(ev, linregEpoch(ev))).orderBy("event_type")
  }

  /** The corpus epoch the OLS x-axis counts hours from — in the
    * streaming drain this is frozen from the STATIC table before the
    * drain starts, which is what makes the partials additive across
    * any micro-batch slicing.
    */
  private[graft] def linregEpoch(ev: DataFrame): DataFrame =
    ev.agg(min(unix_micros(col("ts"))).as("t0"))

  /** The five OLS sufficient statistics per event_type — a pure
    * partial aggregate (map-side combinable, and ADDITIVE across
    * independent slices of the input: the streaming drain appends one
    * partials row-set per micro-batch and the final fold is exact).
    */
  private[graft] def linregPartials(ev: DataFrame,
                                    t0: DataFrame): DataFrame =
    ev.select(col("event_type"), col("ts"), col("value"))
      .crossJoin(broadcast(t0))
      .select(col("event_type"),
        expr("CAST((unix_micros(ts) - t0) DIV 3600000000 " +
          "AS DECIMAL(38,0))").as("x"),
        expr("CAST(FLOOR(value * 1e6) AS DECIMAL(38,0))").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))

  /** Closed-form solve over (possibly re-aggregated) sufficient
    * statistics: sign-split nonnegative integral divisions only.
    */
  private[graft] def linregSolve(sums: DataFrame): DataFrame =
    sums
      .select(col("event_type"), col("n").cast("long").as("n"),
        expr("n * sxy - sx * sy").as("num"),
        expr("n * sxx - sx * sx").as("den"),
        expr("sy * sxx - sx * sxy").as("inum"))
      .select(col("event_type"), col("n"),
        expr("""CASE WHEN den = 0 THEN NULL
          WHEN num >= 0 THEN CAST(num * 1000000 DIV den AS BIGINT)
          ELSE -CAST((-num) * 1000000 DIV den AS BIGINT) END""")
          .as("slope_ppm"),
        expr("""CASE WHEN den = 0 THEN NULL
          WHEN inum >= 0 THEN CAST(inum DIV den AS BIGINT)
          ELSE -CAST((-inum) DIV den AS BIGINT) END""")
          .as("icept_micro"))

  /** Two-proportion z-test between synthetic experiment arms — the
    * experimentation-analytics staple (standard two-sample proportion
    * test; ClickHouse ships it as `proportionsZTest`), exact to the
    * last integer: arms are user-id parity, the outcome is "user
    * converted" (≥ 1 purchase event), and the squared z statistic
    *
    *   z² = (c₁n₂ − c₂n₁)² · N / (n₁ · n₂ · C · (N−C))
    *
    * (C = c₁+c₂, N = n₁+n₂, pooled-variance form) is evaluated as the
    * documented two-floor composition — first the proportion gap
    * dp_ppm = ⌊10⁶·|c₁n₂−c₂n₁|/(n₁n₂)⌋, then
    * z2_ppm = ⌊dp_ppm²·n₁n₂·N / (C·(N−C)·10⁶)⌋ — so every intermediate
    * stays inside DECIMAL(38,0) to ~10⁹ users (the naive single
    * expression squares c·n and overflows past ~10⁷). No float enters
    * the gate. Raw counts are reported alongside so the reader can
    * recompute any convention they prefer.
    *
    * Scale shape: one groupBy(user) to per-user conversion flags
    * (map-side partial on the counts), then a 2-row arm rollup — the
    * z² arithmetic runs on a single row.
    */
  def abProportionZtest(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
      .withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
    perUser.groupBy()
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 0, col("converted")).otherwise(0L))
          .as("conv_a"),
        sum(when(col("arm") === 1, col("converted")).otherwise(0L))
          .as("conv_b"))
      .withColumn("dp_ppm",
        expr("""CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
          ELSE CAST(abs(CAST(conv_a AS DECIMAL(38,0)) * n_b
              - CAST(conv_b AS DECIMAL(38,0)) * n_a) * 1000000
            DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) END"""))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        col("dp_ppm"),
        expr("""CASE WHEN n_a = 0 OR n_b = 0
            OR conv_a + conv_b = 0
            OR conv_a + conv_b = n_a + n_b THEN NULL
          ELSE CAST(CAST(dp_ppm AS DECIMAL(38,0)) * dp_ppm
            * n_a * n_b * (n_a + n_b)
            DIV (CAST(conv_a + conv_b AS DECIMAL(38,0))
              * (n_a + n_b - conv_a - conv_b) * 1000000)
            AS BIGINT) END""").as("z2_ppm"))
  }

  /** CUSUM change-point scan over hourly event volume (Page 1954 —
    * the classic sequential change detector): deviations from the
    * first-half baseline accumulate, so a sustained rate shift shows
    * as a monotone CUSUM ramp while noise mean-reverts. Exact
    * integers throughout: the per-hour deviation is scaled by the
    * baseline count (d_h = c_h·n_base − S_base — no floored mean, no
    * remainder drift), the CUSUM is its prefix sum, and every window
    * runs over the HOURLY frame above the aggregate boundary (the
    * corpus shuffles once into per-hour counts).
    */
  def cusumHourlyShift(spark: SparkSession, sfDir: String): DataFrame = {
    val hours = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val wAll = Window.orderBy("hour")
    val ranked = hours
      .withColumn("rn", row_number().over(wAll).cast("long"))
      .withColumn("n_hours", count(lit(1)).over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val base = ranked.filter(col("rn") <= expr("n_hours DIV 2"))
      .agg(count(lit(1)).as("n_base"), sum("n_events").as("s_base"))
    ranked.crossJoin(broadcast(base))
      .withColumn("dev_scaled",
        col("n_events") * col("n_base") - col("s_base"))
      .withColumn("cusum_scaled",
        sum("dev_scaled").over(wAll.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .select(col("hour"), col("n_events"), col("dev_scaled"),
        col("cusum_scaled"))
      .orderBy("hour")
  }

  /** Benford first-digit conformance audit over event values — the
    * classic data-quality / anomaly screen (Benford 1938; Newcomb
    * 1881): natural multi-scale monetary data follows
    * P(d) = log₁₀(1 + 1/d), and synthetic, capped, or fabricated
    * values don't. The nine Benford probabilities are public constants
    * hardcoded in ppm (301030 … 45757), so the whole audit is exact
    * integer arithmetic: per first digit (from the decimal rendering
    * of the cent value — no float log), observed count, expected count
    * in milli-units (n·p_ppm DIV 1000), and the χ²-style deviation
    * term (obs·10⁶ − n·p_ppm)²·1000 DIV (n·p_ppm·10⁶) summed into a
    * conformance score on every row. One corpus pass into a 9-row
    * frame.
    */
  def benfordValues(spark: SparkSession, sfDir: String): DataFrame = {
    val pPpm = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
      8 -> 51153L, 9 -> 45757L)
    val bTab = pPpm.toSeq.sortBy(_._1)
      .map { case (d, p) => s"($d, ${p}L)" }
      .mkString("VALUES ", ", ", " AS b(digit, p_ppm)")
    val digits = Tables.events(spark, sfDir)
      .select(expr("CAST(FLOOR(value * 100) AS BIGINT)").as("yc"))
      .filter(col("yc") > 0)
      .select(expr("CAST(substring(CAST(yc AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("obs"))
      // 9-row frame, four downstream consumers: checkpoint so the
      // corpus scans once (the chi2 contingency-table discipline)
      .localCheckpoint(true)
    val n = digits.agg(sum("obs").as("nn"))
    val bench = spark.sql(s"SELECT * FROM ($bTab)")
      .select(col("digit").cast("long").as("digit"), col("p_ppm"))
    val scored = bench
      .join(digits, Seq("digit"), "left_outer")
      .na.fill(0L, Seq("obs"))
      .crossJoin(broadcast(n))
      .select(col("digit"), col("obs"),
        expr("CAST(CAST(nn AS DECIMAL(38,0)) * p_ppm DIV 1000 AS BIGINT)")
          .as("exp_milli"),
        expr("""CAST((CAST(obs AS DECIMAL(38,0)) * 1000000
          - CAST(nn AS DECIMAL(38,0)) * p_ppm)
          * (CAST(obs AS DECIMAL(38,0)) * 1000000
          - CAST(nn AS DECIMAL(38,0)) * p_ppm) * 1000
          DIV (CAST(nn AS DECIMAL(38,0)) * p_ppm * 1000000)
          AS BIGINT)""").as("dev_scaled"))
    scored
      .crossJoin(broadcast(scored.agg(sum("dev_scaled").as("score"))))
      .orderBy("digit")
  }

  /** Mann–Whitney U rank-sum test between the arms (ClickHouse ships
    * it as `mannWhitneyUTest`) — the nonparametric member of the
    * experiment battery, entirely in exact integers: work with DOUBLED
    * ranks so tie-averaged ranks stay integral (a value with `b`
    * observations below it and `e` ties has doubled average rank
    * 2b + e + 1), giving 2U = ΣW₂ − n(n+1) exactly. Reported with the
    * rank-biserial effect size r = (U_b − U_a)/(n_a·n_b) in signed
    * ppm, and the identity U₂ₐ + U₂ᵦ = 2·n_a·n_b holds exactly
    * (spec-pinned).
    *
    * Scale shape: one corpus pass groups by value-in-cents; the prefix
    * window runs over the DISTINCT-VALUE frame (above the aggregate
    * boundary — the rankCorrelation bucket-offset discipline), never
    * the corpus. On a bounded price grid that frame is tiny; for
    * pathological continuous values the cents quantization IS the
    * documented statistic.
    */
  def mannWhitneyValue(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(pmod(col("user_id"), lit(2)).cast("int").as("arm"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("yc"))
    val byVal = ev.groupBy("yc")
      .agg(count(lit(1)).as("e"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("e_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("e_b"))
    val w = Window.orderBy("yc")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byVal
      .withColumn("below", coalesce(sum("e").over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("below") + col("e") + 1)
    ranked.agg(
        sum("e_a").cast("decimal(38,0)").as("n_a"),
        sum("e_b").cast("decimal(38,0)").as("n_b"),
        sum(expr("CAST(e_a AS DECIMAL(38,0)) * r2")).as("w2_a"),
        sum(expr("CAST(e_b AS DECIMAL(38,0)) * r2")).as("w2_b"))
      .select(
        col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        expr("CAST(w2_a - n_a * (n_a + 1) AS BIGINT)").as("u2_a"),
        expr("CAST(w2_b - n_b * (n_b + 1) AS BIGINT)").as("u2_b"))
      .withColumn("rbc_ppm",
        expr("""CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
          WHEN u2_b >= u2_a THEN
            CAST(CAST(u2_b AS DECIMAL(38,0)) * 1000000 -
              CAST(u2_a AS DECIMAL(38,0)) * 1000000 AS DECIMAL(38,0))
              DIV (CAST(n_a AS DECIMAL(38,0)) * n_b * 2)
          ELSE -((CAST(u2_a AS DECIMAL(38,0)) * 1000000 -
              CAST(u2_b AS DECIMAL(38,0)) * 1000000)
              DIV (CAST(n_a AS DECIMAL(38,0)) * n_b * 2)) END""")
          .cast("long"))
  }

  /** Chi-squared independence test over the (event_type × arm)
    * contingency table — the categorical sibling of the z/t pair
    * (standard Pearson χ²; the "did assignment skew the event mix"
    * guardrail every A/B readout starts with). Exact per cell:
    *
    *   χ² = Σ (Oᵢⱼ·N − Rᵢ·Cⱼ)² / (Rᵢ·Cⱼ·N)
    *
    * each term floored to ppm in DECIMAL(38,0) (the squared numerator
    * ×10⁶ stays inside 38 digits to ~10⁸ events; past that the ppm
    * scale drops one decade — the BM25 quantizer's one-constant
    * change) and summed exactly —
    * the table is #types × 2, so the solve runs on a broadcast-sized
    * frame; the single corpus pass partial-aggregates into it.
    * Reported per cell (obs, exp_milli, cell ppm) plus the total on
    * every row, so the gate pins the full decomposition. The cell
    * frame is the FULL #types × 2 grid — a (type, arm) cell with zero
    * events still contributes its nonzero expected-count term
    * (Rᵢ·Cⱼ/N)²-style mass to χ², so observed cells left-join onto the
    * type-axis × {0,1} cross (the Benford/NB full-grid idiom) with
    * obs coalesced to 0.
    */
  def chi2TypeByArm(spark: SparkSession, sfDir: String): DataFrame = {
    // eagerly checkpointed: four downstream consumers (cells, row
    // margins, column margins, grand total) would otherwise each
    // re-plan the corpus scan — the table is #types × 2 rows
    val observed = Tables.events(spark, sfDir)
      .select(col("event_type"),
        pmod(col("user_id"), lit(2)).cast("int").as("arm"))
      .groupBy("event_type", "arm")
      .agg(count(lit(1)).cast("decimal(38,0)").as("o"))
      .localCheckpoint(true)
    // the completed grid is checkpointed too: its four consumers (cells,
    // both margins, grand total) plan against the #types × 2 leaf
    val cells = observed.select("event_type").distinct()
      .crossJoin(spark.range(2).select(col("id").cast("int").as("arm")))
      .join(broadcast(observed), Seq("event_type", "arm"), "left")
      .select(col("event_type"), col("arm"),
        coalesce(col("o"), lit(0).cast("decimal(38,0)")).as("o"))
      .localCheckpoint(true)
    val rows = cells.groupBy("event_type")
      .agg(sum("o").as("r"))
    val colsT = cells.groupBy("arm").agg(sum("o").as("c"))
    val n = cells.agg(sum("o").as("nn"))
    val scored = cells
      .join(broadcast(rows), "event_type")
      .join(broadcast(colsT), "arm")
      .crossJoin(broadcast(n))
      .select(col("event_type"), col("arm").cast("long").as("arm"),
        col("o").cast("long").as("obs"),
        // expected count in milli-units: R*C*1000 DIV N (nonneg);
        // NULL-guarded like linregSolve — a fully empty arm (C = 0)
        // would otherwise hit engine-divergent division by zero
        expr("""CASE WHEN r * c = 0 THEN NULL
          ELSE CAST(r * c * 1000 DIV nn AS BIGINT) END""").as("exp_milli"),
        expr("""CASE WHEN r * c = 0 THEN NULL
          ELSE CAST((o * nn - r * c) * (o * nn - r * c) * 1000000
            DIV (r * c * nn) AS BIGINT) END""").as("cell_ppm"))
    val total = scored.agg(sum("cell_ppm").as("chi2_ppm"))
    scored.crossJoin(broadcast(total))
      .orderBy("event_type", "arm")
  }

  /** Welch's unequal-variance t-test between the experiment arms —
    * the continuous-metric sibling of [[abProportionZtest]] (ClickHouse
    * ships it as `welchTTest`): arms by user parity, metric = event
    * value in exact integer cents, squared statistic
    *
    *   t² = (m₁−m₂)² / (v₁/n₁ + v₂/n₂),  v unbiased
    *
    * as the documented three-floor integer composition — per-arm
    * standard-error terms floor first (aᵤ = ⌊(n·Q−S²)/(n²(n−1))⌋,
    * cents², ≤ 1-cent² floor loss each), the mean gap floors to
    * micro-cents ppm, then t2_ppm = ⌊dm_ppm² / ((aᵤ+bᵤ)·10⁶)⌋ — every
    * intermediate stays inside DECIMAL(38,0) to ~10⁹ users (the naive
    * single expression needs ~10⁵⁰). Per-user totals aggregate first
    * (the unit of randomization is the user, the standard A/B
    * correction for within-user correlation), so pass 1 is one
    * user-keyed groupBy and pass 2 a 2-row arm rollup.
    */
  def welchTtestValue(spark: SparkSession, sfDir: String): DataFrame = {
    // per-user total as a DECIMAL sum of per-event floored cents — a
    // double sum would be fold-order exposed, a per-event floor is one
    // IEEE multiply
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(FLOOR(value * 100) AS DECIMAL(38,0))"))
        .as("yc"))
      .withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
    welchSolve(perUser.groupBy("arm")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("yc").as("s"), sum(expr("yc * yc")).as("q")))
  }

  /** The Welch solve over per-arm sufficient statistics (arm, n, s, q)
    * — shared by the batch test and the streaming monitor, whose
    * per-batch partials fold to the identical frame by additivity.
    */
  private[graft] def welchSolve(arms: DataFrame): DataFrame =
    arms
      .groupBy()
      .agg(
        max(when(col("arm") === 0, col("n"))).as("n_a"),
        max(when(col("arm") === 1, col("n"))).as("n_b"),
        max(when(col("arm") === 0, col("s"))).as("s_a"),
        max(when(col("arm") === 1, col("s"))).as("s_b"),
        max(when(col("arm") === 0, col("q"))).as("q_a"),
        max(when(col("arm") === 1, col("q"))).as("q_b"))
      .select(
        col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        expr("""CASE WHEN n_a IS NULL OR n_b IS NULL THEN NULL
          ELSE CAST(abs(s_a * n_b - s_b * n_a) * 1000000
            DIV (n_a * n_b) AS BIGINT) END""").as("dm_ppm"),
        expr("""CASE WHEN n_a IS NULL OR n_a < 2 THEN NULL
          ELSE CAST((n_a * q_a - s_a * s_a)
            DIV (n_a * n_a * (n_a - 1)) AS BIGINT) END""").as("se_a"),
        expr("""CASE WHEN n_b IS NULL OR n_b < 2 THEN NULL
          ELSE CAST((n_b * q_b - s_b * s_b)
            DIV (n_b * n_b * (n_b - 1)) AS BIGINT) END""").as("se_b"))
      .withColumn("t2_ppm",
        expr("""CASE WHEN se_a IS NULL OR se_b IS NULL
            OR se_a + se_b = 0 THEN NULL
          ELSE CAST(CAST(dm_ppm AS DECIMAL(38,0)) * dm_ppm
            DIV ((CAST(se_a AS DECIMAL(38,0)) + se_b) * 1000000)
            AS BIGINT) END"""))

  /** Per-type higher-moment profile — the ClickHouse `skewPop` /
    * `kurtPop` surface (public aggregate-function docs) in the repo's
    * hash-exact dialect. Two passes: (1) n and Σy per type (y = exact
    * integer cents), broadcast back; (2) centered power sums D2/D3/D4
    * about the SIGN-SPLIT-FLOORED integer mean — a pinned, documented
    * variant of the population moments (the ≤1-cent mean shift is far
    * below the audit's resolution, and every quantity stays an exact
    * integer both engines agree on).
    *
    * Reported: `var_centi2` = ⌊D2/n⌋; `m3_over_m2_ppm` =
    * sign-split ⌊10⁶·D3/D2⌋ (the skew direction/magnitude proxy; the
    * exact skewness needs m2^1.5 — a sqrt, not hash-portable); and
    * `kurt_ppm` = ⌊⌊10⁶·D4/D2⌋·n/D2⌋, a two-floor composition of
    * n·m4/m2² that keeps every intermediate under DECIMAL(38,0) at any
    * corpus size (n·D4·10⁶ alone overflows 38 digits past ~10⁷ rows).
    * Scale shape: both passes are map-side partial aggregations into
    * #event_type rows; the mean frame is broadcast.
    */
  def momentsByType(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(FLOOR(value * 100) AS DECIMAL(38,0))").as("yc"))
    val means = ev.groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"), sum("yc").as("s1"))
      .withColumn("mean_centi",
        expr("""CASE WHEN s1 >= 0 THEN CAST(s1 DIV n AS BIGINT)
          ELSE -CAST((-s1) DIV n AS BIGINT) END"""))
      .select(col("event_type"), col("n"), col("mean_centi"))
    ev.join(broadcast(means), Seq("event_type"))
      .withColumn("d", expr("yc - mean_centi"))
      .groupBy("event_type")
      .agg(max("n").as("n"), max("mean_centi").as("mean_centi"),
        sum(expr("d * d")).as("d2"),
        sum(expr("d * d * d")).as("d3"),
        sum(expr("d * d * d * d")).as("d4"))
      .select(col("event_type"), col("n").cast("long").as("n"),
        col("mean_centi"),
        expr("CAST(d2 DIV n AS BIGINT)").as("var_centi2"),
        expr("""CASE WHEN d2 = 0 THEN NULL
          WHEN d3 >= 0 THEN CAST(d3 * 1000000 DIV d2 AS BIGINT)
          ELSE -CAST((-d3) * 1000000 DIV d2 AS BIGINT) END""")
          .as("m3_over_m2_ppm"),
        expr("""CASE WHEN d2 = 0 THEN NULL
          ELSE CAST((d4 * 1000000 DIV d2) * n DIV d2 AS BIGINT) END""")
          .as("kurt_ppm"))
      .orderBy("event_type")
  }
}
