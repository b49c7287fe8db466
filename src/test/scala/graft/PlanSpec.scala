package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Physical-plan regressions guard: the properties that make these queries
  * scale (pushdown, pruning, broadcast, minimal shuffles) are asserted so a
  * refactor can't silently trade them away. Complements the value-level
  * oracle checks.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Execute (AQE finalizes the plan lazily), then flatten through the
    * adaptive wrapper and query-stage leaf nodes that `collect` won't
    * descend into.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Nil
    }
    p +: (p.children ++ p.subqueries ++ nested).flatMap(flatten)
  }

  private def planOf(name: String, dir: String = sf): Seq[SparkPlan] = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    flatten(df.queryExecution.executedPlan)
  }

  test("filter_project pushes the predicate into the parquet scan and prunes columns") {
    val scan = planOf("filter_project").collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.metadata("PushedFilters").contains("EqualTo(event_type,purchase)"))
    // 17-column table read as only the 5 needed
    assert(scan.requiredSchema.fields.length <= 5)
  }

  test("q5 star join broadcasts every dimension — no sort-merge join, " +
       "fact side streams map-side") {
    val plan = planOf("q5_region_revenue")
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(bhj.size === 5) // orders, customer, supplier, nation, region
    assert(smj.isEmpty)
  }

  test("q3 pushes both date filters to the scans") {
    val scans = planOf("q3_top_unshipped").collect {
      case f: FileSourceScanExec => f.metadata("PushedFilters")
    }
    assert(scans.exists(_.contains("LessThan(o_orderdate")))
    assert(scans.exists(_.contains("GreaterThan(l_shipdate")))
  }

  test("rollup_hourly is a single-shuffle aggregate (plus presentation sort)") {
    val shuffles = planOf("rollup_hourly").collect {
      case s: ShuffleExchangeExec => s
    }
    // one hash exchange for the groupBy, one range exchange for orderBy
    assert(shuffles.size === 2)
  }

  test("dedup_exact is a single-shuffle hash aggregate") {
    val shuffles = planOf("dedup_exact").collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.size === 2) // agg exchange + presentation sort
  }

  test("range join stays an equi-join — no cartesian/nested-loop product") {
    val plan = planOf("range_join_pairs")
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
    assert(!plan.exists(_.getClass.getSimpleName.contains("BroadcastNestedLoop")))
  }

  test("IVF probes via broadcasts; the corpus side never shuffles for a join") {
    val plan = planOf("sim_ivf")
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
    // the only shuffle joins allowed are none: cell probe is a broadcast
    // semi-join, centroids/query are tiny broadcasts (BNLJ over 1-16 rows)
    assert(plan.exists {
      case j: BroadcastHashJoinExec => j.joinType.sql == "LEFT SEMI"
      case _ => false
    })
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]))
  }

  test("sliding window expands rows pre-shuffle: one agg exchange only") {
    val shuffles = planOf("sliding_trend").collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.size === 2) // agg exchange + presentation sort
  }

  test("pivot with fixed values runs no inference job and one agg exchange") {
    val shuffles = planOf("pivot_daily_revenue").collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.size === 2) // agg exchange + presentation sort
  }

  test("contamination check is a semi-join, never a pair enumeration") {
    val plan = planOf("contamination_check")
    val semis = plan.collect {
      case j: BroadcastHashJoinExec if j.joinType.sql == "LEFT SEMI" => j
      case j: SortMergeJoinExec if j.joinType.sql == "LEFT SEMI" => j
      case j => j
    }.filter(_.toString.contains("LeftSemi"))
    assert(semis.nonEmpty)
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
  }

  test("EXISTS lateness query is a left-semi hash join on the order key") {
    val plan = planOf("exists_late_ship")
    assert(plan.exists(_.toString.contains("LeftSemi")))
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
    assert(!plan.exists(_.getClass.getSimpleName.contains("BroadcastNestedLoop")))
  }

  test("q1: codegen'd partial agg above the spread; filter still reaches " +
       "the scan below it") {
    val plan = planOf("q1_pricing_summary")
    val spans = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty)
    // the partial HashAggregate must be codegen-LOCAL to a span (direct
    // child chain, not merely printed through an exchange boundary)
    def localChain(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.getClass.getSimpleName +: (p match {
        case _: org.apache.spark.sql.execution.InputAdapter => Nil
        case _ => p.children.flatMap(localChain)
      })
    assert(spans.exists(w => localChain(w.child).exists(_.contains("HashAggregate"))))
    // and the date predicate is pushed into the parquet scan even though a
    // round-robin spread sits between scan and aggregate
    val scan = plan.collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.metadata("PushedFilters").contains("l_shipdate"))
    assert(plan.exists(_.toString.contains("RoundRobinPartitioning")))
  }

  test("composed sales ETL broadcasts all dims; fact shuffles once for the rollup") {
    val plan = planOf("sales_etl_pipeline")
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size === 3) // customer, nation, region
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]))
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
  }

  test("session_windows is one session aggregate — no lag/cumsum window pass") {
    val plan = planOf("session_windows")
    assert(!plan.exists(_.getClass.getSimpleName.contains("Window")))
    // session merge + presentation sort; no extra exchanges
    assert(plan.collect { case s: ShuffleExchangeExec => s }.size <= 2)
  }

  test("q7 broadcasts both nation-tagged key maps; no cartesian") {
    // sf0.01: the nation pair has no trade rows at sf0.001 and AQE's
    // empty-relation propagation would erase the joins under test
    val plan = planOf("q7_nation_volume", "/root/testdata/sf0.01")
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    // cust→nation and supp→nation maps broadcast (+ their inner nation
    // joins, which AQE may also broadcast); never a cartesian product
    assert(bhj.size >= 2)
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
  }

  test("q8 keeps the region membership a semi-join and the share one agg pass") {
    val plan = planOf("q8_market_share")
    assert(plan.exists(_.toString.contains("LeftSemi")))
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
    // conditional-sum share: exactly one aggregate exchange over the fact
    // (plus the presentation sort) — NOT two joined aggregations
    val aggExchanges = plan.collect { case s: ShuffleExchangeExec => s }
    assert(aggExchanges.size <= 3)
  }

  test("q17's correlated-avg decorrelates to one per-part aggregate, " +
       "broadcast back — no per-row re-scan, no cartesian") {
    val plan = planOf("q17_small_quantity")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size >= 2)
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]))
  }

  test("q22's never-ordered check is a left-anti join with a date-pruned " +
       "build side") {
    val plan = planOf("q22_idle_rich_customers")
    assert(plan.exists(_.toString.contains("LeftAnti")))
    // orders scan must carry the date pushdown, not filter post-join
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.exists(_.metadata("PushedFilters")
      .contains("GreaterThanOrEqual(o_orderdate")))
  }

  test("shard assignment is a row-local hash + one aggregate exchange — " +
       "a scan, not a sort") {
    val plan = planOf("shard_assignment")
    assert(!plan.exists(_.getClass.getSimpleName.contains("Window")))
    // agg exchange + presentation sort only; a global-sort implementation
    // would add a range-partitioning exchange
    assert(plan.collect { case s: ShuffleExchangeExec => s }.size <= 2)
  }

  test("target mix sampling never shuffles the corpus: quota lands by " +
       "broadcast, filter is row-local") {
    val plan = planOf("target_mix_sample")
    val corpusShuffles = plan.collect { case s: ShuffleExchangeExec => s }
    // the only exchanges aggregate tiny per-source frames (the counts
    // branch twice — it feeds both N* and the quota —, the global argmin,
    // the final report, and the presentation sort); the documents scan
    // itself feeds the row-local filter map-side, never a corpus exchange
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty)
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]))
    assert(corpusShuffles.size <= 5)
  }

  test("q18's HAVING aggregate filters before the joins — both join sides " +
       "broadcast, top-100 is TakeOrdered, no sort-merge join") {
    val plan = planOf("q18_large_volume", "/root/testdata/sf0.01")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size >= 2)
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]))
    assert(plan.exists(_.getClass.getSimpleName.contains("TakeOrdered")))
  }

  test("q2's decorrelated min joins back by broadcast — no cartesian, " +
       "no sort-merge join") {
    val plan = planOf("q2_min_cost_supplier", "/root/testdata/sf0.01")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size >= 3)
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]))
  }

  test("q16 runs the single-distinct count without an Expand and keeps the " +
       "complaint exclusion a broadcast anti join") {
    val plan = planOf("q16_supplier_counts", "/root/testdata/sf0.01")
    assert(!plan.exists(_.getClass.getSimpleName.contains("Expand")))
    assert(plan.exists(_.toString.contains("LeftAnti")))
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]))
  }

  test("q20's nested quantity thresholds reuse one pruned scan — semi " +
       "joins, date pushdown, no sort-merge join") {
    val plan = planOf("q20_excess_shippers", "/root/testdata/sf0.01")
    assert(plan.exists(_.toString.contains("LeftSemi")))
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]))
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.exists(_.metadata("PushedFilters")
      .contains("GreaterThanOrEqual(l_shipdate")))
  }

  test("q11's global total reuses the per-part aggregate exchange — " +
       "lineitem is never scanned twice") {
    val plan = planOf("q11_important_parts", "/root/testdata/sf0.01")
    val lineitemScans = plan.collect {
      case f: FileSourceScanExec
        if f.metadata("Location").contains("lineitem") => f
    }
    // flatten descends into ReusedExchangeExec children, so a reused scan
    // appears twice in the flattened list but only once with distinct ids
    assert(lineitemScans.map(_.id).distinct.size <= 1 ||
      plan.exists(_.isInstanceOf[ReusedExchangeExec]))
  }

  test("bigram LM scoring broadcasts the model both ways — the token " +
       "stream joins map-side, one per-doc aggregate exchange") {
    val plan = planOf("text_bigram_lm")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size === 2)
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]))
  }

  test("embedding quantization is a row-local scan — the only exchange is " +
       "the presentation sort") {
    val plan = planOf("embedding_quantize")
    assert(plan.collect { case s: ShuffleExchangeExec => s }.size <= 1)
    assert(!plan.exists(_.getClass.getSimpleName.contains("Window")))
  }

  test("incremental dedup probes history by hash joins — no cartesian, " +
       "exact probe is a semi join") {
    val df = SparkEntry.queries("dedup_incremental")(spark, sf)
    df.collect()
    assert(!flatten(df.queryExecution.executedPlan)
      .exists(_.getClass.getSimpleName.contains("Cartesian")))
    // the semi is asserted on the optimized logical plan: AQE stage
    // re-planning moves the physical node between broadcast stages
    val logicalJoins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType
    }
    assert(logicalJoins.exists(_.toString == "LeftSemi"))
  }

  test("tfidf joins tf⋈df WITHOUT broadcasting the vocab-sized df table " +
       "(open-vocab posture) and every rank window is partitioned") {
    val plan = planOf("tfidf_terms")
    // the term-keyed join is a shuffle join (shuffled-hash per hint); the
    // only broadcast is the 1-row corpus total
    assert(plan.exists(_.getClass.getSimpleName.contains("ShuffledHashJoin")))
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "no unpartitioned window over the vocab×lang frame")
    // phase-1 salted window partitions by (lang, salt) — 2 keys
    assert(windows.exists(_.partitionSpec.length == 2))
  }

  test("token_zipf / vocab_coverage rank the vocab via bucket offsets — " +
       "global windows see only the distinct-freq bucket-count frame") {
    Seq("token_zipf", "vocab_coverage").foreach { q =>
      val plan = planOf(q)
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.exists(_.partitionSpec.nonEmpty),
        s"$q: per-token local rank window is freq-partitioned")
      // global windows may consume the distinct-freq bucket frame only —
      // never a frame carrying per-token rows (cnt may be pruned away)
      windows.filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(!w.output.map(_.name).contains("token"),
          s"$q: global window consumed the token frame: ${w.output.map(_.name)}")
      }
    }
  }

  test("rank_correlation ranks both metrics via bucket offsets — no " +
       "unpartitioned window consumes the document frame") {
    val plan = planOf("rank_correlation")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.count(_.partitionSpec.nonEmpty) >= 2,
      "both local-rank windows are metric-bucket-partitioned")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.output.map(_.name).contains("cnt"))
      assert(!w.output.map(_.name).contains("doc_id"),
        "global prefix-sum windows see bucket counts, never documents")
    }
  }

  test("kmeans broadcasts the centroid axis — never a cartesian or " +
       "sort-merge join; the corpus shuffles only for argmin/update aggs") {
    val plan = planOf("kmeans_clusters")
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty)
    // both assignment rounds join centroids via a broadcast nested loop
    // (k-row build side under a crossJoin hint)
    assert(plan.exists(_.getClass.getSimpleName
      .contains("BroadcastNestedLoopJoin")))
  }

  test("global rank never funnels data rows through one partition: the " +
       "only single-partition exchanges carry bucket counts, and the " +
       "data-row window is partitioned by bucket") {
    val df = SparkEntry.queries("global_rank_docs")(spark, sf)
    df.collect()
    val plan = flatten(df.queryExecution.executedPlan)
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the per-bucket local-rank window (over data rows) is partitioned;
    // only the bucket-count cumsum window may be global
    assert(windows.exists(_.partitionSpec.nonEmpty))
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      // global window input must be the aggregated bucket frame, i.e.
      // its output carries the count column, not document payloads
      assert(w.output.map(_.name).contains("cnt"))
    }
  }

  test("rfm quartiles never run an unpartitioned window over the " +
       "per-user frame — no ntile; global windows see bucket counts only") {
    val plan = planOf("rfm_segments")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(!windows.exists(_.windowExpression.mkString.contains("ntile")))
    // per-metric local ranks are bucket-partitioned (parallel);
    // any global window is the bucket-count prefix sum
    assert(windows.count(_.partitionSpec.nonEmpty) === 3)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.output.map(_.name).contains("cnt"))
      assert(!w.output.map(_.name).contains("monetary"))
    }
  }

  test("token co-occurrence top-k is a sort-limit (TakeOrderedAndProject)" +
       " — the pair frame never feeds a global row_number window") {
    val plan = planOf("token_cooccurrence")
    assert(plan.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.TakeOrderedAndProjectExec]))
    // the only window (rank-over-result) runs above the k-row limit
    plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach { w =>
      assert(flatten(w).exists(p =>
        p.isInstanceOf[
          org.apache.spark.sql.execution.TakeOrderedAndProjectExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.GlobalLimitExec]))
    }
  }

  test("bpe pair top-k is a sort-limit — the pair-count frame never feeds" +
       " a global row_number window") {
    val plan = planOf("bpe_pair_counts")
    assert(plan.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.TakeOrderedAndProjectExec]))
    plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach { w =>
      assert(flatten(w).exists(p =>
        p.isInstanceOf[
          org.apache.spark.sql.execution.TakeOrderedAndProjectExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.GlobalLimitExec]))
    }
  }

  test("last-touch attribution windows partition by user — no " +
       "unpartitioned window anywhere in the plan") {
    val plan = planOf("attribution_last_touch")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty))
  }

  test("session pattern matching windows partition by user — no " +
       "unpartitioned window over the event stream") {
    val plan = planOf("session_pattern_counts")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty))
  }

  test("fk integrity audits via broadcast anti joins — no sort-merge " +
       "join anywhere in the plan") {
    val plan = planOf("fk_integrity")
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]))
    assert(plan.exists(p =>
      p.isInstanceOf[org.apache.spark.sql.execution.joins
        .BroadcastHashJoinExec] ||
      p.isInstanceOf[org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec]))
  }

  test("pareto concentration ranks via bucket offsets — any global " +
       "window sees only bucket counts, never the per-customer frame") {
    val plan = planOf("pareto_concentration")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.exists(_.partitionSpec.nonEmpty))
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.output.map(_.name).contains("cnt"))
      assert(!w.output.map(_.name).contains("rev"))
    }
  }

  test("vocab growth's only global window consumes the nBuckets-row " +
       "bucket frame, never the token stream") {
    val plan = planOf("vocab_growth")
    plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.filter(_.partitionSpec.isEmpty).foreach { w =>
      val names = w.output.map(_.name)
      assert(names.contains("n_tokens") || names.contains("new_types"))
      assert(!names.contains("token"))
    }
  }

  test("exact-substring dedup is inverted-index shaped: semi-join probe, " +
       "no pair enumeration, no windows") {
    // the duplicated-position core is memoized behind an eager
    // checkpoint, so the inverted-index structure lives in the BUILD
    // plan; consumers expose a projection over the checkpointed leaf
    val build = graft.ops.Dedup.duplicatedPositionsBuild(
      spark, sf, graft.ops.Dedup.SpanK)
    build.collect()
    val plan = flatten(build.queryExecution.executedPlan)
    assert(!plan.exists(_.getClass.getSimpleName.contains("Cartesian")))
    assert(!plan.exists(_.getClass.getSimpleName.contains("BroadcastNestedLoop")))
    // the duplicated-gram probe is a LEFT SEMI join on the gram key
    assert(plan.exists {
      case j: BroadcastHashJoinExec => j.joinType.sql == "LEFT SEMI"
      case j if j.getClass.getSimpleName.contains("ShuffledHashJoin") ||
                j.isInstanceOf[SortMergeJoinExec] =>
        j.asInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]
          .joinType.sql == "LEFT SEMI"
      case _ => false
    })
    assert(!plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]))
    // consumer side: still no pair enumeration and no windows, and it
    // reads the memoized core as a checkpointed leaf (never a re-scan)
    graft.ops.Memo.clearAll()
    val consumer = planOf("dedup_exact_substring")
    assert(!consumer.exists(_.getClass.getSimpleName.contains("Cartesian")))
    assert(!consumer.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]))
    assert(consumer.exists(_.getClass.getSimpleName.contains("RDDScan")),
      "expected the memoized duplicated-position checkpoint leaf")
  }

  test("span histogram's island window is doc-partitioned — never global") {
    val plan = planOf("dedup_span_histogram")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
  }

  test("multimodal decode queries prune the documents scan to doc_id; " +
       "memoized fingerprint/vector queries consume the checkpoint, " +
       "not a re-scan") {
    graft.ops.Memo.clearAll()
    // uncached path: the luminance pipeline must read ONLY doc_id of
    // the 5-column documents table (payload synthesis is row-local)
    val scans = planOf("mm_bmp_luminance").collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    scans.foreach(s =>
      assert(s.requiredSchema.fieldNames.toSeq === Seq("doc_id")))
    // memoized paths: after the fingerprint/vector checkpoint
    // materializes, its consumers read the checkpointed blocks — no
    // second decode pass, no parquet re-scan (the cross-query memo)
    Seq("mm_image_neardup", "mm_image_dedup_survivors",
        "mm_audio_neardup", "mm_video_neardup", "mm_ann_topk",
        "mm_ann_recall")
      .foreach { name =>
        val plan = planOf(name)
        withClue(s"[$name] ") {
          assert(!plan.exists(_.isInstanceOf[FileSourceScanExec]))
          assert(plan.exists(_.getClass.getSimpleName.contains("RDDScan")))
        }
      }
  }

  /** Wholesale plan-shape pin for the most expensive non-streaming
    * queries (the BENCH top tier): the invariants that make them
    * scale, asserted together so a refactor can't silently regress a
    * plan the sf0.001 spec corpus is too small to expose by timing.
    *
    * Per query: (1) no shuffle-based cartesian product ever (broadcast
    * nested-loop against k-row/1-row constant frames is by-intent and
    * stays allowed); (2) any UNPARTITIONED window runs above an
    * aggregate or limit boundary — i.e. over a bucket-count/top-k
    * frame, never over a data-scale frame; (3) no Scala UDFs — every
    * expression stays codegen-able; (4) the shuffle-exchange count
    * stays at or under its pinned ceiling (the count each plan has
    * today), so new hidden exchanges fail loudly. Memo state is
    * cleared first: pins hold for the COLD plan.
    */
  test("top-tier bench queries hold their scale invariants wholesale: " +
       "no cartesian, bounded unpartitioned windows, no UDFs, " +
       "pinned exchange ceilings") {
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    import org.apache.spark.sql.execution.window.WindowExec
    val ceilings = Map(
      "curation_pipeline" -> 3,
      "lsh_recall_eval" -> 7,
      "knn_label_purity" -> 3,
      "bpe_tokenize_stats" -> 2,
      "dedup_exact_substring" -> 6,
      "dedup_span_histogram" -> 11,
      "basket_affinity" -> 3,
      "q21_waiting_suppliers" -> 3,
      "sales_etl_pipeline" -> 3,
      "dedup_clusters_star" -> 4,
      "curation_pipeline_semantic" -> 13,
      "semdedup" -> 16,
      // 13 since the two-level fold (r13): the per-fingerprint window
      // became coarse-range suffix + fine within-range so a dominant
      // fingerprint never serializes one task — the 6 extra exchanges
      // are all on the slim (f, doc_id, h) frame keyed by (f, range)
      // (range aggregate, range-suffix window, the offset join's two
      // sides), the deliberate price of bounding every window
      // partition at 2^RangeShift rows
      "mm_image_neardup" -> 13,
      "mm_audio_neardup" -> 13,
      "mm_video_neardup" -> 13,
      // r12 additions: simhash's distinct-fingerprint fold (corpus
      // frame shuffles once; the rest are distinct-hash-sized) and the
      // sampled-stratum audits (same shapes as their full siblings —
      // the stratum filter is row-local)
      "dedup_simhash" -> 6,
      "lsh_recall_sampled" -> 7,
      "knn_purity_sampled" -> 3,
      // 8 since r13: the brute-force ground truth is a salt-keyed
      // shuffle_hash block join (2 slim shuffles) instead of a pinned
      // corpus broadcast
      "ann_probe_recall_sampled" -> 8,
      // PQ tier: the exchanges are the two argmin combines, the
      // codebook-sized training mean, the codes-wide pivot and query
      // tables of the adcScores kernel, and the final per-vector fold —
      // all slim (codes/codebook-sized); the ADC candidate frame itself
      // never shuffles (the kernel's whole point)
      "pq_code_stats" -> 6,
      "pq_ann_topk" -> 9,
      "pq_recall" -> 9,
      // r13 composed IVF-PQ: the trained model (cents/codebook/codes)
      // is Memo-materialized once, so every query plans against slim
      // RDD leaves — the remaining exchanges are the query-side window
      // + argmin combines and (for the fleet audits) the salt-keyed
      // block joins; the candidate frame itself never shuffles
      "ivfpq_topk" -> 2,
      "ivfpq_cell_stats" -> 2,
      "ivfpq_distortion" -> 2,
      // rerank (IVFADC+R): +1 over ivfpq_topk — the bounded top-R
      // candidate frame's single-partition limit; the raw-vector
      // re-rank itself joins broadcast-side (no corpus exchange)
      "ivfpq_rerank_topk" -> 3,
      // +2 over the probe audits: the per-query top-R window and the
      // fleet·R re-rank equi-join — both on slim candidate frames
      "ivfpq_rerank_recall" -> 18,
      "ivfpq_rerank_recall_sampled" -> 18,
      // 16: the ADC block join and the exact ground truth are both
      // salt-keyed shuffle_hash joins now — deterministic at every
      // scale (the earlier 8–9 was AQE broadcast-demoting them at spec
      // size); all the added exchanges carry salt-split slim frames
      "ivfpq_probe_recall" -> 16,
      "ivfpq_probe_recall_sampled" -> 16,
      "mm_image_dedup_survivors" -> 3,
      "mm_ann_topk" -> 6,
      "quality_lm_ppx" -> 7,
      "sampling_temperature_mix" -> 5,
      "quality_filter_funnel" -> 2,
      "bm25_topk" -> 9,
      "rrf_fusion" -> 9,
      "text_entropy_bands" -> 14,
      "kl_source_drift" -> 7,
      "preference_pairs" -> 7,
      "dedup_embedding_lsh_capped" -> 5,
      // train + score fused in one lazy plan: every exchange carries
      // a partial-aggregated token-bucket frame (docs×buckets /
      // classes×buckets keys) or a model-sized frame — raw corpus
      // rows never cross a shuffle (the streaming probe serves the
      // memoized model instead and scores at 5 exchanges)
      "nb_langid_classifier" -> 12,
      // same fused train+score shape plus one per-source window
      // (partition-local sort, the CCNet per-shard bucket operation)
      "nb_quality_tertiles" -> 12,
      // r14 additions. silhouette rides the shared 2-round Lloyd
      // assignment (the semdedup family); its OWN stages add only the
      // per-cluster stat folds — every post-kmeans exchange carries a
      // k-row or (k×dim)-row frame
      "silhouette_sq" -> 17,
      // Gram fold (4096-key partial agg) + mean/collect stages; the
      // power rounds plan against the checkpointed 4096-row leaf
      "pca_power_component" -> 4,
      // salt-keyed block join (2 slim shuffles) + unpivoted argmax +
      // final width rollup
      "mrl_truncation_recall" -> 4,
      // corpus appears only in the pool TakeOrdered; greedy rounds run
      // on checkpointed pool-sized leaves
      "mmr_diversified_topk" -> 1,
      // bounded-key sufficient-statistic rollups over events
      "linreg_value_trend" -> 3,
      "moments_by_type" -> 3,
      "ab_proportion_ztest" -> 2,
      // probe-side prefix window + inverted-index join + the two
      // doc-level verification joins — all on shingle/candidate frames
      "dedup_containment" -> 8,
      // the annProbe family shape (salt-keyed exact side) with the
      // label predicate pushed into both sides; +2 for the EXPLICIT
      // label shuffle join in both consuming branches (labels is
      // corpus-cardinality — never a broadcast at index scale;
      // unhinted, the planner flipped this join on memory-pressure-
      // dependent cached-leaf estimates and the pin was flaky). The
      // remaining broadcasts are the explicit cents sides, so this
      // count is the deterministic maximum — joins can only flip
      // DOWN from here
      "ann_filtered_recall" -> 10,
      // user-keyed pass + 2-row arm rollup
      "welch_ttest_value" -> 3,
      // one corpus pass into the checkpointed #types x 2 table; every
      // later exchange carries table-sized margin frames
      "chi2_type_by_arm" -> 8,
      // value-keyed aggregate; the prefix window sits above it on the
      // distinct-value frame
      "mannwhitney_value" -> 2,
      // one pass into the checkpointed 9-digit frame; solve on tiny
      // broadcast joins
      "benford_values" -> 4,
      // corpus shuffles once into hourly counts; the rank/prefix
      // windows run over that bounded frame
      "cusum_hourly_shift" -> 4,
      // r15 NN-descent graph: the finished graph is Memo-checkpointed
      // (the ivfpq model convention), so the serving plan is the final
      // projection over the slim edge leaf; inside the build every
      // round's window/join stages plan against the previous round's
      // checkpointed k·n integer-row leaf
      "knn_graph_build" -> 1,
      // + the salt-keyed brute-force stratum side (the recall-audit
      // family's exact-side shape)
      "knn_graph_recall" -> 5,
      // bm25 core (postings-bounded tf/dl aggregates) + per-query
      // rank/ideal windows over candidate frames + fleet-row folds
      "retrieval_ndcg" -> 6,
      // greedy descent: every hop plans against the previous hop's
      // checkpointed beam leaf (beam-bounded windows + equi-joins);
      // the serving graph is a Memo leaf
      "graph_search" -> 1,
      // + the salt-keyed exact stratum side
      "graph_search_recall" -> 5,
      // NB train+score fused plan + the two-phase bucket-offset decile
      // rank (offset cumsum over range-count rows, per-range window)
      "nb_calibration" -> 7,
      // r16 warm fold: the accreted seed scoring, the insert descent
      // and the refinement round all checkpoint — the final plan is
      // the projection + presentation sort over the slim edge leaf
      "knn_graph_warm_rebuild" -> 1,
      // the delete-tier folds are projections over eagerly-built
      // checkpointed edge frames, like the warm rebuild above
      "knn_graph_warm_rebuild_live" -> 1,
      "knn_graph_rebuild_deleted" -> 1,
      // bloom audit: train-shingle distinct + position distinct (both
      // bounded), test-shingle per-doc and per-lang folds — the filter
      // side is always the broadcast
      "bloom_contamination" -> 7,
      // hier serving: the two descents run eagerly against checkpointed
      // leaves; the gated frame is a projection + presentation sort
      "graph_search_hier" -> 1,
      "cms_heavy_audit" -> 6,
      // privacy triad: QI-tuple aggregates + broadcast spines only
      "l_diversity" -> 3,
      "t_closeness" -> 6,
      // r16 PQ refresh: the old-assignment argmin combine, the
      // cell-keyed decimal-mean pair, the re-code argmin combines and
      // the two churn-report folds — every exchange carries a
      // model-bounded or 8-int-per-vector code frame, the raw corpus
      // never shuffles
      "ivfpq_warm_refresh" -> 7,
      // r17 accreted recall pair: two checkpointed descent leaves join
      // one checkpointed exact side; the final frame is two 1-row aggs
      "graph_serve_accreted_recall" -> 6,
      // r17 post-fold hier serve: fold, refreshed upper layer and both
      // descents all checkpoint — the gated frame is the projection +
      // presentation sort over the final beam leaf
      "graph_serve_folded_hier" -> 1,
      // r17 fold-decision loop: two serving branches filtered on the
      // one-row broadcast decision + the masked-late rollup + sort
      "graph_fold_decision" -> 4,
      // r17 KMV audit: the distinct-hash exchange + the exact-distinct
      // side + two 1-row agg folds; the bottom-k itself is a
      // TakeOrderedAndProject (no full sort, no exchange)
      "kmv_distinct_shingles" -> 5,
      // r18 tower serve: every level's descent checkpoints eagerly —
      // the gated frame is projection + presentation sort over the
      // final beam leaf (the hier discipline)
      "graph_search_tower" -> 1,
      // r18 tower recall: two checkpointed beam leaves vs the shared
      // checkpointed exact side, two 1-row agg folds + union
      "graph_tower_recall" -> 6,
      // r18 tower stats: one count pair per level over checkpointed
      // edge leaves + the level union + presentation sort
      "graph_tower_stats" -> 6,
      // r18 branched fold: only the chosen branch's rollup survives
      // (masked-late best + presentation sort)
      "graph_fold_decision_branched" -> 2,
      // r18 persist serves: the loaded-artifact descent checkpoints
      // per hop like every descent; the PQ probe keeps its cell-keyed
      // agg chain (codes-wide agg, query tables, best, sort)
      "graph_index_persist_serve" -> 1,
      "pq_index_persist_serve" -> 5,
      // r18 multi-probe: bucket-size agg + probe expansion joins +
      // pair distinct + verify joins + presentation sort
      "dedup_embedding_lsh_multiprobe" -> 5,
      "lsh_multiprobe_recall" -> 10,
      // r18 DP release: one corpus groupBy + the ladder projections
      // (no exchange) + presentation sort
      "dp_noisy_counts" -> 3)
    val aggOrLimit = Set("HashAggregateExec", "ObjectHashAggregateExec",
      "SortAggregateExec", "TakeOrderedAndProjectExec", "GlobalLimitExec",
      "CollectLimitExec", "LocalLimitExec")
    val violations = ceilings.toSeq.sortBy(_._1).flatMap {
      case (name, maxExchanges) =>
        graft.ops.Memo.clearAll()
        val plan = planOf(name)
        val bad = Seq.newBuilder[String]
        if (plan.exists(
            _.getClass.getSimpleName.contains("CartesianProduct")))
          bad += "shuffle-based cartesian product"
        plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
          .foreach { w =>
            if (!flatten(w.child).exists(n =>
                aggOrLimit(n.getClass.getSimpleName)))
              bad += "unpartitioned window over non-aggregate-bounded frame"
          }
        if (plan.exists(_.expressions.exists(
            _.exists(_.isInstanceOf[ScalaUDF]))))
          bad += "ScalaUDF in the plan"
        val n = plan.count(_.isInstanceOf[ShuffleExchangeExec])
        info(s"$name: $n exchanges (ceiling $maxExchanges)")
        if (n > maxExchanges)
          bad += s"shuffle exchanges grew: $n > pinned $maxExchanges"
        bad.result().map(v => s"[$name] $v")
    }
    assert(violations.isEmpty, violations.mkString("; "))
  }

  /** Build the INITIAL physical plan with auto-broadcast and AQE off —
    * the corpus-scale simulation: at 100 TB no size estimate clears the
    * broadcast threshold, so the only broadcasts left are the PINNED
    * hints, and those must all be bounded frames. (The executed-plan
    * tests above run at spec scale where AQE legitimately broadcasts
    * everything small; this helper asserts what the plan degrades to
    * when nothing is small.)
    */
  private def corpusScalePlan(name: String): Seq[SparkPlan] = {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.ops.Memo.clearAll()
      val df = SparkEntry.queries(name)(spark, sf)
      // executedPlan (NOT sparkPlan — exchanges are only inserted by
      // the preparation rules); with AQE off this is static, nothing
      // runs
      flatten(df.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("dedup_simhash at corpus scale: the ONLY pinned broadcast is the " +
       "distinct-pair matched frame; the per-doc expansion is a salted " +
       "shuffle join") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    // the pair core is memoized behind an eager checkpoint, so the
    // broadcast discipline lives in the BUILD plan: inspect it under
    // the same corpus-scale confs (no auto-broadcast, no AQE) — the
    // static executedPlan, nothing runs
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val plan = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      flatten(graft.ops.Dedup.simhashPairFrameBuild(spark, sf, 3)
        .queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
    assert(bcasts.size == 1,
      s"expected exactly the matched-pairs broadcast, found ${bcasts.size}")
    // the broadcast subtree must be the matched union (distinct-pair-
    // sized), never a frame still carrying per-doc ids: the per-doc
    // frames expose doc_a/doc_b columns, the matched frame only (f, g,
    // hamming)
    val bcastCols = bcasts.head.output.map(_.name).toSet
    assert(!bcastCols.contains("doc_a") && !bcastCols.contains("doc_b"),
      s"pinned broadcast carries a per-doc frame: $bcastCols")
    // the doc expansion joins on (g, salt) as a shuffle join
    assert(plan.collect { case j: SortMergeJoinExec => j }
      .exists(j => j.leftKeys.size == 2))
    // the consumer's corpus-scale plan is a projection over the
    // checkpointed leaf: zero broadcasts survive to the gated query
    val consumer = corpusScalePlan("dedup_simhash")
    assert(consumer.exists(_.getClass.getSimpleName.contains("RDDScan")),
      "expected the memoized pair-frame checkpoint leaf")
  }

  test("fleet recall audits at corpus scale: no cartesian, and every " +
       "nested-loop join is a pinned bounded-frame broadcast") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    // pq_probe_recall: the ADC block join and the brute-force ground
    // truth are both salt-keyed equi-joins now — zero nested loops
    val pq = corpusScalePlan("pq_probe_recall")
    assert(!pq.exists(
      _.getClass.getSimpleName.contains("CartesianProduct")))
    assert(!pq.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "pq_probe_recall grew an unkeyed cross product")
    // ann_probe_recall: the only nested loops are the 16-row
    // centroid-axis crossJoins (bounded by construction; the assigned
    // frame's cross is planned once per consumer pre-AQE, hence 3)
    val ann = corpusScalePlan("ann_probe_recall")
    assert(!ann.exists(
      _.getClass.getSimpleName.contains("CartesianProduct")))
    assert(ann.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) <= 3)
  }
}
