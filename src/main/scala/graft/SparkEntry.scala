package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered in [[queries]]
  * as `(SparkSession, sfDir) => DataFrame`; SQL-expressible ones carry a
  * DuckDB oracle in [[oracleSql]] with identical column names and ordering.
  */
object SparkEntry {

  /** Flagship query on sf=0.001 — the reference's hourly MV rollup
    * (`clickhouse/init/01_init.sql:63-74`) over the events table; driver
    * smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Rollups.hourlyRollup(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rollup_hourly" -> (Rollups.hourlyRollup _),
    "rollup_daily" -> (Rollups.dailyRollup _),
    "rollup_compact" -> (Rollups.rollupCompact _),
    "global_totals" -> (Rollups.globalTotals _),
    "share_of_total" -> (Rollups.shareOfTotal _),
    "revenue_by_type_desc" -> (Rollups.revenueByTypeDesc _),
    "hourly_trend" -> (Rollups.hourlyTrend _),
    "filter_project" -> (Rollups.filterProject _),
    "json_extract" -> (Rollups.jsonExtract _),
    "q1_pricing_summary" -> (StarQueries.q1PricingSummary _),
    "q3_top_unshipped" -> (StarQueries.q3TopUnshipped _),
    "q5_region_revenue" -> (StarQueries.q5RegionRevenue _),
    "top_orders" -> (StarQueries.topOrders _),
    "window_top_per_customer" -> (StarQueries.windowTopPerCustomer _),
    "window_battery" -> (StarQueries.windowBattery _),
    "cube_counts" -> (StarQueries.cubeCounts _),
    "window_daily_delta" -> (StarQueries.windowDailyDelta _),
    "set_ops_counts" -> (StarQueries.setOpsCounts _),
    "distinct_counts" -> (StarQueries.distinctCounts _),
    "scalar_funcs" -> (StarQueries.scalarFuncs _),
    "ingest_roundtrip" -> (IngestQueries.ingestRoundtrip _),
    "sales_etl_pipeline" -> (IngestQueries.salesEtlPipeline _),
    "dedup_exact" -> (Dedup.dedupExact _),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "dedup_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "dedup_minhash" -> ((s, d) => Dedup.minhashPairs(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_simhash_digest" -> ((s, d) => Dedup.simhashDigest(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Dedup.embeddingNearDups(s, d)),
    "sim_topk_bruteforce" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "sim_ann_lsh" -> ((s, d) => Similarity.annTopK(s, d)),
    "text_token_counts" -> (TextAnalysis.tokenCounts _),
    "text_quality" -> (TextAnalysis.qualityScores _),
    "text_langid" -> (TextAnalysis.langIdConfusion _),
    "text_fingerprint" -> (TextAnalysis.fingerprints _),
    "mm_decode_stats" -> (graft.multimodal.Multimodal.decodeStats _),
    "mm_frame_counts" -> ((s, d) => graft.multimodal.Multimodal.frameCounts(s, d)),
    "mm_resize_stats" -> (graft.multimodal.Multimodal.resizeStats _),
    "sessions" -> ((s, d) => Sessions.sessionize(s, d)),
    "semi_anti_counts" -> (StarQueries.semiAntiCounts _),
    "outer_join_order_stats" -> (StarQueries.outerJoinOrderStats _),
    "stream_partials_hourly" ->
      ((s, d) => graft.streaming.StreamAssembly.streamPartialsHourly(s, d)),
    "stream_sessions_tws" ->
      ((s, d) => graft.streaming.StreamAssembly.streamSessionsTws(s, d)),
    // the SAME TWS drain killed after its 2nd micro-batch's sink write
    // (before the checkpoint commit) and resumed from checkpoint — the
    // RocksDB state-store recovery path gated against the identical
    // batch oracle
    "stream_tws_restart" ->
      ((s, d) => graft.streaming.StreamAssembly
        .streamSessionsTws(s, d, crashAfterBatches = 2)),
    "stream_join_wm_evicting" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamJoinFollowupsWatermarked(s, d)),
    "stream_session_windows" ->
      ((s, d) => graft.streaming.StreamAssembly.streamSessionWindows(s, d)),
    "stream_join_left_outer" ->
      ((s, d) => graft.streaming.StreamAssembly.streamJoinLeftOuter(s, d)),
    "stream_join_full_outer" ->
      ((s, d) => graft.streaming.StreamAssembly.streamJoinFullOuter(s, d)),
    "stream_update_upsert" ->
      ((s, d) => graft.streaming.StreamAssembly.streamUpdateUpsert(s, d)),
    "stream_dedup_window" ->
      ((s, d) => graft.streaming.StreamAssembly.streamDedupWindow(s, d)),
    "stream_sliding_counts" ->
      ((s, d) => graft.streaming.StreamAssembly.streamSlidingCounts(s, d)),
    "stream_static_enrich" ->
      ((s, d) => graft.streaming.StreamAssembly.streamStaticEnrich(s, d)),
    "stream_join_left_semi" ->
      ((s, d) => graft.streaming.StreamAssembly.streamJoinLeftSemi(s, d)),
    "stream_union_sources" ->
      ((s, d) => graft.streaming.StreamAssembly.streamUnionSources(s, d)),
    "stream_dedup_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamDedupProbe(s, d)),
    "stream_ann_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamAnnProbe(s, d)),
    "stream_substr_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamSubstrProbe(s, d)),
    "ann_probe_recall" -> ((s, d) => Similarity.annProbeRecall(s, d)),
    "stream_pq_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamPqProbe(s, d)),
    "stream_pq_index_append" ->
      ((s, d) => graft.streaming.StreamAssembly.streamPqIndexAppend(s, d)),
    "stream_nb_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamNbProbe(s, d)),
    "stream_centroid_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamCentroidProbe(s, d)),
    "stream_curation_verdict" ->
      ((s, d) => graft.streaming.StreamAssembly.streamCurationVerdict(s, d)),
    "ann_probe_recall_sampled" ->
      ((s, d) => Similarity.annProbeRecallSampled(s, d)),
    "stream_media_decode" ->
      ((s, d) => graft.streaming.StreamAssembly.streamMediaDecode(s, d)),
    "stream_sessions_dynamic_gap" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamSessionsDynamicGap(s, d)),
    "rollup_grouping_sets" -> (StarQueries.rollupGroupingSets _),
    "part_promo_share" -> (StarQueries.partPromoShare _),
    "dedup_embedding_lsh" -> ((s, d) => Dedup.embeddingNearDupsLsh(s, d)),
    "dedup_embedding_lsh_capped" ->
      ((s, d) => Dedup.embeddingNearDupsLshCapped(s, d)),
    "lsh_capped_recall" -> ((s, d) => Dedup.lshCappedRecallEval(s, d)),
    // multi-probe LSH (r18): flip one band bit per probe against the
    // cap-filtered stored buckets — bounded (1+bandBits)x candidate
    // growth buys back fine-band recall; priced next to the capped row
    "dedup_embedding_lsh_multiprobe" ->
      ((s, d) => Dedup.embeddingNearDupsLshMultiprobe(s, d)),
    "lsh_multiprobe_recall" ->
      ((s, d) => Dedup.lshMultiprobeRecallEval(s, d)),
    // seeded-Laplace DP count release (r18): md5-coin uniform through
    // the PortableLn inverse CDF, ε in exact integer micro-units —
    // the privacy progression's final letter, hash-gated end to end
    "dp_noisy_counts" -> ((s, d) => Privacy.dpNoisyCounts(s, d)),
    "approx_distinct_users" -> (Rollups.approxDistinctUsersGated _),
    "topk_per_segment" -> ((s, d) => TopK.topOrdersPerSegment(s, d)),
    "asof_events_orders" -> (AsOf.eventsAsOfOrders _),
    "asof_custom_plan" -> (AsOf.eventsAsOfOrdersCustom _),
    "asof_last_view" -> (AsOf.purchasesAsOfViews _),
    "range_join_pairs" -> ((s, d) => RangeJoin.eventPairsWithin(s, d)),
    "range_join_custom_plan" ->
      ((s, d) => RangeJoin.eventPairsWithinCustom(s, d)),
    "train_test_split" -> (TrainingSets.trainTestSplit _),
    "value_quantiles" -> (TrainingSets.valueQuantiles _),
    "stratified_sample" -> ((s, d) => TrainingSets.stratifiedSample(s, d)),
    "group_cap" -> ((s, d) => TrainingSets.groupCap(s, d)),
    "pack_sequences" -> ((s, d) => TrainingSets.packSequences(s, d)),
    "contamination_check" -> ((s, d) => TrainingSets.contaminationCheck(s, d)),
    "sim_ivf" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "sliding_trend" -> (Rollups.slidingTrend _),
    "pivot_daily_revenue" -> (Rollups.pivotDailyRevenue _),
    "salted_user_counts" -> ((s, d) => Skew.saltedUserCounts(s, d)),
    "text_repetition" -> (TextAnalysis.repetitionSignals _),
    "text_rarity" -> ((s, d) => TextAnalysis.unigramRarity(s, d)),
    "session_windows" -> ((s, d) => Sessions.sessionWindows(s, d)),
    "dedup_rate_by_source" -> (Dedup.dedupRateBySource _),
    "heavy_hitter_tokens" -> ((s, d) => HeavyHitters.heavyHitterTokens(s, d)),
    "length_histogram" -> ((s, d) => TextAnalysis.lengthHistogram(s, d)),
    "funnel_conversion" -> ((s, d) => Analytics.funnelConversion(s, d)),
    "cohort_retention" -> (Analytics.cohortRetention _),
    "rfm_segments" -> (Analytics.rfmSegments _),
    "exists_late_ship" -> (StarQueries.existsLateShipPriority _),
    "scalar_subquery_big_orders" -> (StarQueries.scalarSubqueryBigOrders _),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(s, d)),
    "dedup_clusters_star" -> (Dedup.dedupClustersStar _),
    "curation_pipeline" -> (TrainingSets.curationPipeline _),
    "curation_pipeline_semantic" ->
      (TrainingSets.curationPipelineSemantic _),
    "q10_returned_items" -> (StarQueries.q10ReturnedItems _),
    "q19_or_predicate" -> (StarQueries.q19OrPredicateRevenue _),
    "dedup_latest" -> (Dedup.dedupLatest _),
    "pii_redact" -> (Privacy.piiRedact _),
    "k_anonymity" -> ((s, d) => Privacy.kAnonymity(s, d)),
    // the k-anonymity follow-on: sensitive-value diversity per QI class
    "l_diversity" -> ((s, d) => Privacy.lDiversity(s, d)),
    // and ITS follow-on: class-vs-global sensitive-distribution skew
    "t_closeness" -> ((s, d) => Privacy.tCloseness(s, d)),
    "scd2_user_history" -> (Analytics.scd2UserHistory _),
    "pit_state_lookup" -> ((s, d) => Analytics.pitStateLookup(s, d)),
    "rolling_active_users" -> (Analytics.rollingActiveUsers _),
    "rolling_active_users_hll" -> (Analytics.rollingActiveUsersHll _),
    "event_transitions" -> (Analytics.eventTransitions _),
    "conversion_latency" -> (Analytics.conversionLatency _),
    "outlier_events" -> (Analytics.outlierEvents _),
    "weighted_sample" -> (TrainingSets.weightedSample _),
    "corpus_rebalance" -> (TrainingSets.corpusRebalance _),
    "data_profile" -> (Quality.dataProfile _),
    "q21_waiting_suppliers" -> (StarQueries.q21WaitingSuppliers _),
    "q7_nation_volume" -> ((s, d) => StarQueries.q7NationVolume(s, d)),
    "q8_market_share" -> ((s, d) => StarQueries.q8MarketShare(s, d)),
    "q13_custdist" -> (StarQueries.q13CustDist _),
    "q17_small_quantity" -> ((s, d) => StarQueries.q17SmallQuantityRevenue(s, d)),
    "q22_idle_rich_customers" ->
      ((s, d) => StarQueries.q22IdleRichCustomers(s, d)),
    "shard_assignment" -> ((s, d) => TrainingSets.shardAssignment(s, d)),
    "gapfill_locf" -> (Analytics.gapfillLocf _),
    "q6_forecast_revenue" -> (StarQueries.q6ForecastRevenue _),
    "q15_top_supplier" -> (StarQueries.q15TopSupplier _),
    "target_mix_sample" -> ((s, d) => TrainingSets.targetMixSample(s, d)),
    "dsir_importance" -> ((s, d) => TrainingSets.dsirImportance(s, d)),
    "nb_langid_classifier" ->
      ((s, d) => TrainingSets.nbLangidClassifier(s, d)),
    "nb_quality_tertiles" ->
      ((s, d) => TrainingSets.nbQualityTertiles(s, d)),
    "nb_calibration" -> ((s, d) => TrainingSets.nbCalibration(s, d)),
    "q18_large_volume" -> ((s, d) => StarQueries.q18LargeVolume(s, d)),
    "q9_product_profit" -> ((s, d) => StarQueries.q9ProductProfit(s, d)),
    "q11_important_parts" -> ((s, d) => StarQueries.q11ImportantParts(s, d)),
    "q12_ship_lag" -> (StarQueries.q12ShipLagPriority _),
    "q16_supplier_counts" -> (StarQueries.q16SupplierCounts _),
    "q2_min_cost_supplier" -> ((s, d) => StarQueries.q2MinCostSupplier(s, d)),
    "q20_excess_shippers" -> ((s, d) => StarQueries.q20ExcessShippers(s, d)),
    "dedup_survivors" -> (Dedup.dedupSurvivors _),
    "fuzzy_name_pairs" -> ((s, d) => Dedup.fuzzyNamePairs(s, d)),
    "dedup_source_matrix" -> (Dedup.dedupSourceMatrix _),
    "token_zipf" -> (CorpusStats.tokenZipf _),
    "text_bigram_lm" -> ((s, d) => CorpusStats.bigramLm(s, d)),
    "embedding_quantize" -> (Similarity.embeddingQuantize _),
    "doc_chunks" -> ((s, d) => TrainingSets.docChunks(s, d)),
    "contamination_fraction" ->
      ((s, d) => TrainingSets.contaminationFraction(s, d)),
    "dedup_incremental" -> (Dedup.dedupIncremental _),
    "embedding_contamination" ->
      ((s, d) => Similarity.embeddingContamination(s, d)),
    "array_funcs" -> (TextAnalysis.arrayFuncs _),
    "collect_sources" -> (TextAnalysis.collectSources _),
    "stream_join_followups" ->
      ((s, d) => graft.streaming.StreamAssembly.streamJoinFollowups(s, d)),
    "robust_stats" -> (Analytics.robustStats _),
    "tfidf_terms" -> ((s, d) => CorpusStats.tfidfTerms(s, d)),
    "window_range_frame" -> (Analytics.windowRangeFrame _),
    "equidepth_histogram" -> ((s, d) => Analytics.equidepthHistogram(s, d)),
    "dedup_triangles" -> (Dedup.dedupTriangles _),
    "table_checksum" -> (Quality.tableChecksum _),
    "token_cooccurrence" -> ((s, d) => CorpusStats.tokenCooccurrence(s, d)),
    "vocab_coverage" -> (CorpusStats.vocabCoverage _),
    "dup_degree_histogram" -> (Dedup.dupDegreeHistogram _),
    "ngram_novelty" -> ((s, d) => Dedup.ngramNovelty(s, d)),
    "dedup_exact_substring" -> ((s, d) => Dedup.exactSubstringSpans(s, d)),
    "dedup_span_histogram" ->
      ((s, d) => Dedup.duplicatedSpanHistogram(s, d)),
    "value_drift" -> ((s, d) => Analytics.valueDrift(s, d)),
    "linreg_value_trend" -> ((s, d) => Analytics.linregValueTrend(s, d)),
    "stream_trend_partials" ->
      ((s, d) => graft.streaming.StreamAssembly.streamTrendPartials(s, d)),
    "moments_by_type" -> ((s, d) => Analytics.momentsByType(s, d)),
    "ab_proportion_ztest" -> ((s, d) => Analytics.abProportionZtest(s, d)),
    "welch_ttest_value" -> ((s, d) => Analytics.welchTtestValue(s, d)),
    "chi2_type_by_arm" -> ((s, d) => Analytics.chi2TypeByArm(s, d)),
    "mannwhitney_value" -> ((s, d) => Analytics.mannWhitneyValue(s, d)),
    "benford_values" -> ((s, d) => Analytics.benfordValues(s, d)),
    "cusum_hourly_shift" -> ((s, d) => Analytics.cusumHourlyShift(s, d)),
    "stream_ab_monitor" ->
      ((s, d) => graft.streaming.StreamAssembly.streamAbMonitor(s, d)),
    "kmeans_clusters" -> ((s, d) => Similarity.kmeansClusters(s, d)),
    "cluster_quality" -> ((s, d) => Similarity.clusterQuality(s, d)),
    "silhouette_sq" -> ((s, d) => Similarity.silhouetteSq(s, d)),
    "pca_power_component" -> ((s, d) => Similarity.pcaPowerComponent(s, d)),
    "mrl_truncation_recall" ->
      ((s, d) => Similarity.mrlTruncationRecall(s, d)),
    "ann_filtered_recall" -> ((s, d) => Similarity.annFilteredRecall(s, d)),
    "knn_graph_build" -> ((s, d) => KnnGraph.knnGraphBuild(s, d)),
    "knn_graph_recall" -> ((s, d) => KnnGraph.knnGraphRecall(s, d)),
    "graph_search" -> ((s, d) => KnnGraph.graphSearch(s, d)),
    "graph_search_recall" -> ((s, d) => KnnGraph.graphSearchRecall(s, d)),
    // hierarchical (2-layer HNSW-shape) serving: descend the md5-coin
    // upper layer, enter the base layer at per-query winners — recall
    // at the same hop budget strictly above the flat descent's
    "graph_search_hier" -> ((s, d) => KnnGraph.graphSearchHier(s, d)),
    "graph_search_hier_recall" ->
      ((s, d) => KnnGraph.graphSearchHierRecall(s, d)),
    // the log-depth entry TOWER (HNSW proper, r18): levels nest by
    // salted md5 coins, queries descend level-by-level, entry cost
    // stays flat as the index grows; recall audited against the
    // 2-layer hier row at identical base hops, geometry per level
    "graph_search_tower" -> ((s, d) => KnnGraph.graphSearchTower(s, d)),
    "graph_tower_recall" -> ((s, d) => KnnGraph.graphTowerRecall(s, d)),
    "graph_tower_stats" -> ((s, d) => KnnGraph.graphTowerStats(s, d)),
    // build once, WRITE, serve from the LOADED artifact — the
    // MergeTree durability contract on the index tier (r18): one gate
    // per model-bearing family, rows bit-identical to the in-session
    // serve (Round18Spec proves it with the memo tier killed)
    "graph_index_persist_serve" ->
      ((s, d) => KnnGraph.graphIndexPersistServe(s, d)),
    "pq_index_persist_serve" ->
      ((s, d) => Similarity.pqIndexPersistServe(s, d)),
    "stream_graph_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamGraphProbe(s, d)),
    "stream_graph_insert" ->
      ((s, d) => graft.streaming.StreamAssembly.streamGraphInsert(s, d)),
    // the READ side of the index write paths: queries served from the
    // frozen base ∪ the drained batch=<id> segments (the MergeTree
    // "reads see the union of parts" contract on the index tier)
    "stream_graph_serve_accreted" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamGraphServeAccreted(s, d)),
    "stream_pq_serve_accreted" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamPqServeAccreted(s, d)),
    // the FOLD that completes the lifecycle: segments + base seed a
    // warm NN-descent rebuild over the merged population (1 round vs
    // log_k n from random init)
    "knn_graph_warm_rebuild" ->
      ((s, d) => KnnGraph.knnGraphWarmRebuild(s, d)),
    // operational health of the accreted index: insert fan-in per
    // attachment vertex + what the K-bound evicts (= when to fold)
    "graph_attach_stats" ->
      ((s, d) => KnnGraph.graphAttachStats(s, d)),
    // recall at identical hops on the ACCRETED index (r17): flat
    // min-id entries vs the hier upper layer, priced against one
    // exact pass — the measurement behind composing hier entries
    // into the lifecycle serving paths
    "graph_serve_accreted_recall" ->
      ((s, d) => KnnGraph.graphServeAccretedRecall(s, d)),
    // the DELETE letter of the lifecycle: tombstone segments drained
    // per micro-batch (deletes are data — CK lightweight DELETE),
    // masked serving on both families, and the physical fold
    "stream_graph_serve_deleted" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamGraphServeDeleted(s, d)),
    "stream_pq_serve_deleted" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamPqServeDeleted(s, d)),
    "knn_graph_rebuild_deleted" ->
      ((s, d) => KnnGraph.knnGraphRebuildDeleted(s, d)),
    // the production rolling fold: one warm round absorbing pending
    // inserts AND deletes together (edges to tombstones vanish in the
    // live-population scoring join; the exchange re-stitches)
    "knn_graph_warm_rebuild_live" ->
      ((s, d) => KnnGraph.knnGraphWarmRebuildLive(s, d)),
    // post-fold hier serving (r17): the fold's serving product — the
    // folded graph + fresh long-range links + the REFRESHED upper
    // layer over live merged (entries keep sampling what the index
    // now holds, retiring the upper-layer staleness item)
    "graph_serve_folded_hier" ->
      ((s, d) => KnnGraph.graphServeFoldedHier(s, d)),
    // the fold-scheduling loop EXECUTED (r17): stats → fold-vs-serve
    // decision on the documented eviction tolerance → post-decision
    // canary serving rows, one deterministic plan, no driver collect
    "graph_fold_decision" ->
      ((s, d) => KnnGraph.graphFoldDecision(s, d)),
    // the PRODUCTION branch form (r18): the one-row decision collected
    // driver-side (bounded at any scale), ONLY the chosen branch
    // executed — same rows as the gated both-branch loop, half the work
    "graph_fold_decision_branched" ->
      ((s, d) => KnnGraph.graphFoldDecisionBranched(s, d)),
    // the full-CRUD read path: reads see base ∪ inserts ∖ deletes —
    // the index state between folds, both pending letters visible
    "stream_graph_serve_full" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamGraphServeFull(s, d)),
    "stream_pq_serve_full" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamPqServeFull(s, d)),
    // the LSH family's lifecycle: signature segments appended row-
    // locally (nothing to train — the planes are a pure function), and
    // bucket-join serving over base ∪ segments (purely additive index)
    "stream_lsh_index_append" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamLshIndexAppend(s, d)),
    "stream_lsh_serve_accreted" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamLshServeAccreted(s, d)),
    // the LSH delete letter (r17): tombstones anti-joined at scan —
    // bucket caps are live-population properties — plus the full-CRUD
    // read (base ∖ deletes ∪ segments), closing three-family symmetry
    "stream_lsh_serve_deleted" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamLshServeDeleted(s, d)),
    "stream_lsh_serve_full" ->
      ((s, d) =>
        graft.streaming.StreamAssembly.streamLshServeFull(s, d)),
    // Bloom membership tier: the bounded-filter decontamination audit
    // (bloom vs exact hits, fp priced) and its at-ingest serving drain
    "bloom_contamination" ->
      ((s, d) => TrainingSets.bloomContamination(s, d)),
    "stream_bloom_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamBloomProbe(s, d)),
    // count-min tier: the point-count sketch audit (est ≥ exact, the
    // overestimate priced) and per-micro-batch partials merged by SUM
    "cms_heavy_audit" ->
      ((s, d) => HeavyHitters.cmsHeavyAudit(s, d)),
    "stream_cms_partials" ->
      ((s, d) => graft.streaming.StreamAssembly.streamCmsPartials(s, d)),
    // bounded-state streaming heavy hitters: per-batch MG counters, the
    // merged candidate superset recounted exactly — output DETERMINISTIC
    // (equal to the batch two-pass) despite order-dependent sketch state
    "stream_mg_partials" ->
      ((s, d) => graft.streaming.StreamAssembly.streamMgPartials(s, d)),
    // KMV bottom-k: the distinct-shingle count (what sizes the Bloom
    // filter) estimated from k rows of state, the estimator
    // integer-exact, error priced against the exact count
    "kmv_distinct_shingles" ->
      ((s, d) => HeavyHitters.kmvDistinctShingles(s, d)),
    // per-micro-batch bottom-k sample partials: k rows per batch at any
    // batch size, merged by re-taking the global bottom-k (exact)
    "stream_sample_partials" ->
      ((s, d) => graft.streaming.StreamAssembly.streamSamplePartials(s, d)),
    // the PQ fold: refresh the frozen coarse axis over base + inserted
    // (decimal-exact Lloyd round), re-code, report exact churn
    "ivfpq_warm_refresh" ->
      ((s, d) => Similarity.ivfpqWarmRefresh(s, d)),
    "stream_pca_drift" ->
      ((s, d) => graft.streaming.StreamAssembly.streamPcaDrift(s, d)),
    "semdedup" -> ((s, d) => Similarity.semDedup(s, d)),
    "leakage_safe_split" -> (TrainingSets.leakageSafeSplit _),
    "kfold_assignment" -> ((s, d) => TrainingSets.kfoldAssignment(s, d)),
    "text_clean" -> (TextAnalysis.textClean _),
    "dup_pagerank" -> ((s, d) => Dedup.dupPageRank(s, d)),
    "global_rank_docs" -> ((s, d) => Analytics.globalRankDocs(s, d)),
    "hybrid_search" -> ((s, d) => Similarity.hybridSearch(s, d)),
    "knn_label_purity" -> (Similarity.knnLabelPurity _),
    "knn_purity_sampled" ->
      ((s, d) => Similarity.knnLabelPuritySampled(s, d)),
    "label_centroid_affinity" -> (Similarity.labelCentroidAffinity _),
    "centroid_classifier" -> (Similarity.centroidClassifier _),
    "minhash_recall_eval" -> ((s, d) => Dedup.minhashRecallEval(s, d)),
    "lsh_recall_eval" -> ((s, d) => Dedup.lshRecallEval(s, d)),
    "lsh_recall_sampled" -> ((s, d) => Dedup.lshRecallSampled(s, d)),
    "ivf_recall" -> ((s, d) => Similarity.ivfRecall(s, d)),
    "pq_code_stats" -> ((s, d) => Similarity.pqCodeStats(s, d)),
    "pq_ann_topk" -> ((s, d) => Similarity.pqAnnTopK(s, d)),
    "pq_recall" -> ((s, d) => Similarity.pqRecall(s, d)),
    "pq_distortion" -> ((s, d) => Similarity.pqDistortion(s, d)),
    "pq_probe_recall" -> ((s, d) => Similarity.pqProbeRecall(s, d)),
    "pq_probe_recall_sampled" ->
      ((s, d) => Similarity.pqProbeRecallSampled(s, d)),
    "ivfpq_topk" -> ((s, d) => Similarity.ivfpqTopK(s, d)),
    "ivfpq_cell_stats" -> ((s, d) => Similarity.ivfpqCellStats(s, d)),
    "ivfpq_distortion" -> ((s, d) => Similarity.ivfpqDistortion(s, d)),
    "ivfpq_probe_recall" -> ((s, d) => Similarity.ivfpqProbeRecall(s, d)),
    "ivfpq_probe_recall_sampled" ->
      ((s, d) => Similarity.ivfpqProbeRecallSampled(s, d)),
    "ivfpq_rerank_topk" -> ((s, d) => Similarity.ivfpqRerankTopK(s, d)),
    "ivfpq_rerank_recall" -> ((s, d) => Similarity.ivfpqRerankRecall(s, d)),
    "ivfpq_rerank_recall_sampled" ->
      ((s, d) => Similarity.ivfpqRerankRecallSampled(s, d)),
    "fk_integrity" -> (Quality.fkIntegrity _),
    "pareto_concentration" -> (Analytics.paretoConcentration _),
    "dataset_card" -> (Quality.datasetCard _),
    "session_pattern_counts" -> ((s, d) => Sessions.sessionPatternCounts(s, d)),
    "seasonal_profile" -> (Rollups.seasonalProfile _),
    "daily_value_percentiles" -> (Analytics.dailyValuePercentiles _),
    "error_burst_hours" -> ((s, d) => Analytics.errorBurstHours(s, d)),
    "new_vs_returning" -> (Analytics.newVsReturning _),
    "mom_growth" -> (Analytics.momGrowth _),
    "rank_correlation" -> (CorpusStats.rankCorrelation _),
    "fulfilment_span" -> (StarQueries.fulfilmentSpan _),
    "order_size_histogram" -> (StarQueries.orderSizeHistogram _),
    "customer_recency_histogram" ->
      (StarQueries.customerRecencyHistogram _),
    "discount_bands" -> (StarQueries.discountBands _),
    "user_activity_histogram" -> (Analytics.userActivityHistogram _),
    "purchase_gap_histogram" -> (Analytics.purchaseGapHistogram _),
    "basket_affinity" -> ((s, d) => Analytics.basketAffinity(s, d)),
    "bpe_pair_counts" -> ((s, d) => CorpusStats.bpePairCounts(s, d)),
    "bpe_train_merges" -> ((s, d) => CorpusStats.bpeTrainMerges(s, d)),
    "bpe_tokenize_stats" -> ((s, d) => CorpusStats.bpeTokenizeStats(s, d)),
    "bpe_compression_by_source" ->
      ((s, d) => CorpusStats.bpeCompressionBySource(s, d)),
    "vocab_growth" -> ((s, d) => CorpusStats.vocabGrowth(s, d)),
    "attribution_last_touch" ->
      ((s, d) => Analytics.attributionLastTouch(s, d)),
    "stream_dedup_replay" ->
      ((s, d) => graft.streaming.StreamAssembly.streamDedupReplay(s, d)),
    "stream_late_drop" ->
      ((s, d) => graft.streaming.StreamAssembly.streamLateDrop(s, d)),
    "dsv2_ingest_rollup" ->
      ((s, d) => graft.sources.LogPipeline.dsv2IngestRollup(s, d)),
    "dsv2_batch_read" ->
      ((s, d) => graft.sources.LogPipeline.dsv2BatchRead(s, d)),
    "mm_bmp_luminance" ->
      ((s, d) => graft.multimodal.Multimodal.bmpLuminance(s, d)),
    "mm_wav_energy" ->
      ((s, d) => graft.multimodal.Multimodal.wavEnergy(s, d)),
    "mm_avi_frames" ->
      ((s, d) => graft.multimodal.Multimodal.aviFrameLuminance(s, d)),
    "mm_image_neardup" ->
      ((s, d) => graft.multimodal.Multimodal.imageNearDups(s, d)),
    "mm_ann_topk" ->
      ((s, d) => graft.multimodal.Multimodal.mediaAnnTopK(s, d)),
    "mm_audio_neardup" ->
      ((s, d) => graft.multimodal.Multimodal.audioNearDups(s, d)),
    "mm_video_neardup" ->
      ((s, d) => graft.multimodal.Multimodal.videoNearDups(s, d)),
    "mm_image_dedup_survivors" ->
      ((s, d) => graft.multimodal.Multimodal.imageDedupSurvivors(s, d)),
    "mm_ann_recall" ->
      ((s, d) => graft.multimodal.Multimodal.mediaAnnRecall(s, d)),
    // hash-gated via the error contract (exact values + bounded-error
    // booleans); raw-sketch accuracy additionally spec-asserted (ApproxSpec)
    "approx_value_quantiles" ->
      ((s, d) => TrainingSets.approxValueQuantilesGated(s, d)),
    "quality_lm_ppx" -> ((s, d) => CorpusStats.lmPerplexityBands(s, d)),
    "sampling_temperature_mix" ->
      ((s, d) => TrainingSets.temperatureMix(s, d)),
    "quality_filter_funnel" ->
      ((s, d) => TextAnalysis.qualityFilterFunnel(s, d)),
    "stream_quality_gate" ->
      ((s, d) => graft.streaming.StreamAssembly.streamQualityGate(s, d)),
    "embedding_dim_stats" ->
      ((s, d) => Similarity.embeddingDimStats(s, d)),
    "bm25_topk" -> ((s, d) => ops.Retrieval.bm25TopK(s, d)),
    "retrieval_ndcg" -> ((s, d) => ops.Retrieval.retrievalNdcg(s, d)),
    "rrf_fusion" -> ((s, d) => ops.Retrieval.rrfFusion(s, d)),
    "mmr_diversified_topk" ->
      ((s, d) => ops.Retrieval.mmrDiversifiedTopk(s, d)),
    "stream_bm25_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamBm25Probe(s, d)),
    "stream_kl_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamKlProbe(s, d)),
    "stream_image_probe" ->
      ((s, d) => graft.streaming.StreamAssembly.streamImageProbe(s, d)),
    "embedding_jl_distortion" ->
      ((s, d) => Similarity.embeddingJlDistortion(s, d)),
    "shard_mix_entropy" ->
      ((s, d) => TrainingSets.shardMixEntropy(s, d)),
    "text_entropy_bands" -> ((s, d) => CorpusStats.textEntropyBands(s, d)),
    "kl_source_drift" -> ((s, d) => CorpusStats.klSourceDrift(s, d)),
    "preference_pairs" -> ((s, d) => TrainingSets.preferencePairs(s, d))
  )

  /** Shared NB-classifier oracle CTE stack (nb_langid_classifier and
    * stream_nb_probe — one replay of the training + scoring
    * arithmetic, two (train, score) populations): model trained on
    * `trainPred` docs (Laplace-smoothed priors + full-grid hashed-
    * bucket likelihoods, each through its own PortableLn ladder
    * floored to micro-nats), every `scorePred` doc argmax-classified
    * with exact integer scores. Ends with `pred` =
    * (doc_id, true_lang, pred_lang).
    */
  private def nbOracleCtes(trainPred: String, scorePred: String,
                           classExpr: String = "lang",
                           label: String = "lang"): String = {
    val nB = ops.TrainingSets.NbBuckets
    // keep-column named `cls`, not `s` — the ladder's internal
    // stages project x/e/s/u and a keep column `s` would collide
    val (likCtes, likOut) = functions.PortableLn.sqlCtes(
      "nl", "grid", Seq("cls", "b"),
      s"(c_sb + 1)::DOUBLE / (c_s + $nB)::DOUBLE", "lnx")
    val (priCtes, priOut) = functions.PortableLn.sqlCtes(
      "np", "classes, dtot", Seq("cls"),
      "(d_s + 1)::DOUBLE / (d_tot + n_classes)::DOUBLE", "lnx")
    s"""WITH tok AS (SELECT doc_id, $label AS lbl, $classExpr AS cls,
      |    ('0x' || substr(md5(w), 1, 8))::BIGINT % $nB AS b
      |  FROM (SELECT doc_id, lang, source,
      |      unnest(string_split(text, ' ')) AS w FROM documents)),
      |classes AS (SELECT $classExpr AS cls, CAST(count(*) AS BIGINT) AS d_s
      |  FROM documents WHERE $trainPred GROUP BY 1),
      |dtot AS (SELECT CAST(sum(d_s) AS BIGINT) AS d_tot,
      |    CAST(count(*) AS BIGINT) AS n_classes FROM classes),
      |cnt AS (SELECT cls, b, CAST(count(*) AS BIGINT) AS c_sb
      |  FROM tok WHERE $trainPred GROUP BY 1, 2),
      |ctot AS (SELECT cls, CAST(sum(c_sb) AS BIGINT) AS c_s
      |  FROM cnt GROUP BY 1),
      |grid AS (SELECT c.cls, g.b, COALESCE(n.c_sb, 0) AS c_sb, t.c_s
      |  FROM classes c CROSS JOIN range(0, $nB) g(b)
      |  LEFT JOIN cnt n ON n.cls = c.cls AND n.b = g.b
      |  JOIN ctot t ON t.cls = c.cls),
      |$likCtes,
      |lik AS (SELECT cls AS s, b, CAST(floor(lnx * 1e6) AS BIGINT) AS lw
      |  FROM $likOut),
      |$priCtes,
      |prior AS (SELECT cls AS s, CAST(floor(lnx * 1e6) AS BIGINT) AS pw
      |  FROM $priOut),
      |tdb AS (SELECT doc_id, lbl, b, CAST(count(*) AS BIGINT) AS c
      |  FROM tok WHERE $scorePred GROUP BY 1, 2, 3),
      |sc AS (SELECT t.doc_id, t.lbl, l.s,
      |    CAST(sum(t.c * l.lw) AS BIGINT) AS ll
      |  FROM tdb t JOIN lik l USING (b) GROUP BY 1, 2, 3),
      |scp AS (SELECT c.doc_id, c.lbl, c.s, (c.ll + p.pw) AS score
      |  FROM sc c JOIN prior p USING (s)),
      |pred AS (SELECT doc_id, lbl, s AS pred_cls FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY score DESC, s ASC) AS rn
      |  FROM scp) WHERE rn = 1)""".stripMargin
  }

  /** The md5 train-split coin of [[ops.TrainingSets.NbTrainPct]], as a
    * DuckDB predicate fragment. */
  private val nbCoin =
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100"

  /** Shared DuckDB CTE body: 3-gram shingles → exact-Jaccard-0.8 pairs.
    * The pair definition lives in exactly one place: the label CTE extends
    * it with the recursive transitive closure (dedup_clusters,
    * dedup_clusters_star, dedup_rate_by_source, curation_pipeline), and
    * the pair-level oracles (dedup_incremental, dedup_triangles,
    * dup_degree_histogram) use it directly.
    */
  private val nearDupPairsBody: String =
    """tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |   for i in range(1, len(ws)-1)])) AS s
      |  FROM tok WHERE len(ws) >= 3),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    count(*) AS shared
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (SELECT doc_a, doc_b
      |  FROM shared JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8)"""
      .stripMargin

  /** The 2-round Lloyd assignment CTE (seed → assign → decimal-exact
    * centroid mean → re-assign), shared by the kmeans_clusters and
    * semdedup oracles — `a2` is (vec_id, cid, dist), `e` keeps the
    * embeddings. Mirrors Similarity.kmeansAssign step for step.
    */
  /** Unrolled BPE merge-round CTE chain shared by the training-table and
    * tokenize-stats oracles. Every w{i} is referenced twice (pair scan +
    * next merge) — without MATERIALIZED, DuckDB inlines the chain into a
    * 2^rounds plan. Literal arithmetic stays integer/VARCHAR throughout.
    */
  private def bpeLoopCtes(rounds: Int): String = {
    val b = new StringBuilder
    b.append(
      """WITH w0 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS cnt,
        |  '|' || array_to_string(string_split(w, ''), '||') || '|' AS s
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w
        |    FROM documents) WHERE len(w) >= 1 GROUP BY w)""".stripMargin)
    for (i <- 1 to rounds) {
      b.append(s""",
        |p$i AS MATERIALIZED (SELECT syms[u.i] AS l, syms[u.i + 1] AS r,
        |    CAST(sum(cnt) AS BIGINT) AS n
        |  FROM (SELECT cnt, string_split(trim(s, '|'), '||') AS syms
        |    FROM w${i - 1}) s$i,
        |    UNNEST(generate_series(1, len(syms) - 1)) AS u(i)
        |  GROUP BY 1, 2),
        |b$i AS MATERIALIZED (
        |  SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
        |w$i AS MATERIALIZED (SELECT cnt,
        |  replace(s, '|' || b.l || '||' || b.r || '|',
        |    '|' || b.l || b.r || '|') AS s FROM w${i - 1}, b$i b)"""
        .stripMargin)
    }
    b.toString
  }

  /** Shared exact-substring CTE prefix: tokenized docs (≥ SpanK tokens),
    * positioned k-grams, cross-doc-duplicated grams, and the DISTINCT
    * (doc_id, p) covered-position frame — consumed by the span-coverage
    * and run-histogram oracles.
    */
  private val substrCovCtes: String = {
    val k = ops.Dedup.SpanK; val km1 = k - 1
    s"""WITH tok AS (SELECT doc_id, source,
      |    string_split(text, ' ') AS ws FROM documents),
      |d AS (SELECT doc_id, source, len(ws) AS n_tok, ws
      |  FROM tok WHERE len(ws) >= $k),
      |g AS (SELECT doc_id, n_tok, u.i AS start,
      |    array_to_string(ws[u.i : u.i + $km1], ' ') AS gram
      |  FROM d, UNNEST(generate_series(1, n_tok - $km1)) AS u(i)),
      |dup AS (SELECT gram FROM (
      |  SELECT gram, count(DISTINCT doc_id) AS dn FROM g GROUP BY 1)
      |  WHERE dn >= 2),
      |cov AS (SELECT DISTINCT doc_id, v.p
      |  FROM g, UNNEST(generate_series(start, start + $km1)) AS v(p)
      |  WHERE gram IN (SELECT gram FROM dup))""".stripMargin
  }

  /** The 56-bit image dHash recomputed arithmetically from doc_id
    * (every sampled pixel's channels are affine mod-256 forms; sample
    * indices are the same integer floor divisions the Spark-side
    * nearest-neighbor grid uses) — shared CTE prefix of the near-dup
    * audit and the survivor action, so the fingerprint definition lives
    * in exactly one place. Yields `dh(doc_id, dhash)`.
    */
  private val imageDhashCtes: String = {
    val rows = graft.multimodal.Multimodal.DhashGridRows
    val cols = graft.multimodal.Multimodal.DhashGridCols
    s"""WITH img AS (SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |bit AS (SELECT doc_id, rr.r * ${cols - 1} + cc.c AS j
      |  FROM img, range(0, $rows) rr(r), range(0, ${cols - 1}) cc(c)
      |  WHERE 299 * ((doc_id * 3 + (rr.r * h // $rows) + (cc.c * w // $cols)) % 256)
      |      + 587 * ((doc_id * 2 + (rr.r * h // $rows) + (cc.c * w // $cols)) % 256)
      |      + 114 * ((doc_id + (rr.r * h // $rows) + (cc.c * w // $cols)) % 256)
      |      > 299 * ((doc_id * 3 + (rr.r * h // $rows) + ((cc.c + 1) * w // $cols)) % 256)
      |      + 587 * ((doc_id * 2 + (rr.r * h // $rows) + ((cc.c + 1) * w // $cols)) % 256)
      |      + 114 * ((doc_id + (rr.r * h // $rows) + ((cc.c + 1) * w // $cols)) % 256)),
      |dh AS (SELECT i.doc_id,
      |    CAST(coalesce(sum(1::BIGINT << b.j), 0) AS BIGINT) AS dhash
      |  FROM img i LEFT JOIN bit b USING (doc_id) GROUP BY 1)"""
      .stripMargin
  }

  /** The media block-vector IVF pipeline recomputed arithmetically from
    * doc_id (4×4 block luminance sums — exact integers in DOUBLE — then
    * the sim_ivf cell scheme with Multimodal's cell/probe constants) —
    * shared CTE prefix of the ANN query and its recall audit. Yields
    * `nr(doc_id, vec, nrm)`, `assigned(doc_id, vec, nrm, cell)`,
    * `qcells(cid)`.
    */
  private val mediaIvfCtes: String = {
    val cells = graft.multimodal.Multimodal.MmAnnCells
    val probe = graft.multimodal.Multimodal.MmAnnProbe
    s"""WITH img AS (SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (SELECT doc_id,
      |    (rr.r * 4 // h) * 4 + (cc.c * 4 // w) AS b,
      |    299 * ((doc_id * 3 + rr.r + cc.c) % 256)
      |      + 587 * ((doc_id * 2 + rr.r + cc.c) % 256)
      |      + 114 * ((doc_id + rr.r + cc.c) % 256) AS luma
      |  FROM img, range(0, 11) rr(r), range(0, 17) cc(c)
      |  WHERE rr.r < h AND cc.c < w),
      |blk AS (SELECT doc_id, b, CAST(sum(luma) AS DOUBLE) AS v
      |  FROM px GROUP BY 1, 2),
      |vv AS (SELECT doc_id, list(v ORDER BY b) AS vec FROM blk GROUP BY 1),
      |nr AS (SELECT doc_id, vec,
      |    sqrt(list_sum([vec[i] * vec[i] for i in range(1, 17)])) AS nrm
      |  FROM vv),
      |cents AS (SELECT doc_id AS cid, vec AS c_vec, nrm AS c_nrm
      |  FROM nr WHERE doc_id < ${3 * cells}),
      |scored AS (SELECT n.doc_id, n.vec, n.nrm, c.cid,
      |    list_sum([n.vec[i] * c.c_vec[i] for i in range(1, 17)])
      |      / (n.nrm * c.c_nrm) AS ccos
      |  FROM nr n, cents c),
      |assigned AS (SELECT doc_id, vec, nrm, cid AS cell FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY ccos DESC, cid ASC) AS rn
      |  FROM scored) WHERE rn = 1),
      |qcells AS (SELECT cid FROM scored WHERE doc_id = 0
      |  ORDER BY ccos DESC, cid ASC LIMIT $probe)""".stripMargin
  }

  /** Real-codec decode totals recomputed arithmetically from doc_id —
    * shared by the batch query and its streaming partial-fold sibling
    * (identical output contract, so one oracle serves both).
    */
  private val mmDecodeStatsSql: String =
    """WITH m AS (SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |    ELSE 'video' END AS media_type,
      |  CASE doc_id % 3 WHEN 0 THEN 8 + doc_id % 9 WHEN 1 THEN 0
      |    ELSE 8 + doc_id % 5 END AS w,
      |  CASE doc_id % 3 WHEN 0 THEN 4 + doc_id % 7 WHEN 1 THEN 0
      |    ELSE 4 + doc_id % 4 END AS h,
      |  CASE doc_id % 3 WHEN 1 THEN 1 ELSE 3 END AS ch,
      |  CASE doc_id % 3 WHEN 0 THEN 0
      |    WHEN 1 THEN (64 + doc_id % 100) // 8
      |    ELSE (2 + doc_id % 5) * (20 + doc_id % 30) END AS dur,
      |  CASE doc_id % 3
      |    WHEN 0 THEN ((8 + doc_id % 9) * 3 + 3) // 4 * 4 * (4 + doc_id % 7)
      |    WHEN 1 THEN 2 * (64 + doc_id % 100)
      |    ELSE (2 + doc_id % 5) * (((8 + doc_id % 5) * 3 + 3) // 4 * 4)
      |      * (4 + doc_id % 4) END AS bl
      |  FROM documents)
      |SELECT media_type, count(*) AS n,
      |CAST(sum(w) AS BIGINT) AS sum_width,
      |CAST(sum(h) AS BIGINT) AS sum_height,
      |CAST(sum(ch) AS BIGINT) AS sum_channels,
      |CAST(sum(dur) AS BIGINT) AS sum_duration_ms,
      |CAST(sum(bl) AS BIGINT) AS sum_body_len
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared IVF-probe CTE bundle (stream_ann_probe / ann_probe_recall):
    * even-half index + centroids, static cell assignment, odd-half
    * queries, nProbe=4 cell ranking, and `ivf1` = the per-query
    * exact-cosine top-1 within the probed cells.
    */
  private val annProbeCtes: String = annProbeCtesWith("")

  /** [[annProbeCtes]] with an extra predicate on the query half — the
    * sampled-stratum audit appends the md5 stratum coin. */
  private def annProbeCtesWith(qsExtra: String): String =
    ("""WITH nrm AS (SELECT vec_id, embedding,
      |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |                 for i in range(1, 65)])) AS nrm
      |  FROM embeddings),
      |idx AS (SELECT * FROM nrm WHERE vec_id % 2 = 0),
      |cents AS (SELECT vec_id AS cid, embedding AS c_emb, nrm AS c_nrm
      |  FROM idx WHERE vec_id < 32),
      |iscored AS (SELECT i.vec_id, i.embedding, i.nrm, c.cid,
      |  list_sum([i.embedding[j]::DOUBLE * c.c_emb[j]::DOUBLE
      |            for j in range(1, 65)]) / (i.nrm * c.c_nrm) AS ccos
      |  FROM idx i, cents c),
      |assigned AS (SELECT vec_id AS m_id, embedding AS m_emb,
      |    nrm AS m_nrm, cid AS cell FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
      |  FROM iscored) WHERE rn = 1),
      |qs AS (SELECT * FROM nrm WHERE vec_id % 2 = 1""" + qsExtra + """),
      |qscored AS (SELECT q.vec_id AS q_id, q.embedding AS q_emb,
      |  q.nrm AS q_nrm, c.cid,
      |  list_sum([q.embedding[j]::DOUBLE * c.c_emb[j]::DOUBLE
      |            for j in range(1, 65)]) / (q.nrm * c.c_nrm) AS ccos
      |  FROM qs q, cents c),
      |qcells AS (SELECT q_id, q_emb, q_nrm, cid AS probe_cell FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY ccos DESC, cid ASC) AS rn
      |  FROM qscored) WHERE rn <= 4),
      |cand AS (SELECT qc.q_id, a.m_id,
      |  list_sum([qc.q_emb[j]::DOUBLE * a.m_emb[j]::DOUBLE
      |            for j in range(1, 65)]) / (qc.q_nrm * a.m_nrm) AS cosine
      |  FROM qcells qc JOIN assigned a ON a.cell = qc.probe_cell),
      |ivf1 AS (SELECT q_id, m_id, cosine FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY cosine DESC, m_id ASC) AS rn
      |  FROM cand) WHERE rn = 1)""").stripMargin

  /** PQ CTE prefix shared by the three pq_* oracles: sub-vector split,
    * fixed-seed codebook, one decimal-exact Lloyd refinement round
    * (the kmeansAssignCte discipline, per subspace), per-(vector,
    * subspace) L2 via the SAME x·x − 2·x·c + c·c decomposition as
    * Similarity.pqModel (so the doubles hash bit-identically), argmin
    * codes against the refined codebook. Constants interpolated from
    * Similarity (the KmeansK anti-drift pattern).
    */
  private val pqCtes: String = {
    val m = ops.Similarity.PqSubspaces
    val d = ops.Similarity.PqSubDim
    val kc = ops.Similarity.PqCentroids
    s"""WITH sub AS (SELECT vec_id, t.s AS s,
      |    [embedding[t.s * $d + i]::DOUBLE for i in range(1, ${d + 1})] AS sv
      |  FROM embeddings, range(0, $m) t(s)),
      |cb0 AS (SELECT s, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < $kc),
      |ds0 AS (SELECT u.vec_id, u.s, c.cid,
      |    list_sum([u.sv[i] * u.sv[i] for i in range(1, ${d + 1})])
      |  - 2 * list_sum([u.sv[i] * c.cv[i] for i in range(1, ${d + 1})])
      |  + list_sum([c.cv[i] * c.cv[i] for i in range(1, ${d + 1})]) AS dist
      |  FROM sub u JOIN cb0 c USING (s)),
      |codes0 AS (SELECT vec_id, s, cid FROM (
      |  SELECT vec_id, s, cid, row_number() OVER (
      |    PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn FROM ds0)
      |  WHERE rn = 1),
      |m1 AS (SELECT u.s, k.cid, g.i AS pos,
      |    CAST(SUM(CAST(u.sv[g.i] AS DECIMAL(30,15))) AS DOUBLE)
      |      / COUNT(*) AS comp
      |  FROM sub u JOIN codes0 k ON k.vec_id = u.vec_id AND k.s = u.s,
      |    range(1, ${d + 1}) g(i)
      |  GROUP BY u.s, k.cid, g.i),
      |cb AS (SELECT s, cid, list(comp ORDER BY pos) AS cv
      |  FROM m1 GROUP BY 1, 2),
      |ds AS (SELECT u.vec_id, u.s, c.cid,
      |    list_sum([u.sv[i] * u.sv[i] for i in range(1, ${d + 1})])
      |  - 2 * list_sum([u.sv[i] * c.cv[i] for i in range(1, ${d + 1})])
      |  + list_sum([c.cv[i] * c.cv[i] for i in range(1, ${d + 1})]) AS dist
      |  FROM sub u JOIN cb c USING (s)),
      |codes AS (SELECT vec_id, s, cid, dist FROM (
      |  SELECT vec_id, s, cid, dist, row_number() OVER (
      |    PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn FROM ds)
      |  WHERE rn = 1),
      |qtab AS (SELECT c.s, c.cid,
      |    list_sum([q.sv[i] * q.sv[i] for i in range(1, ${d + 1})])
      |  - 2 * list_sum([q.sv[i] * c.cv[i] for i in range(1, ${d + 1})])
      |  + list_sum([c.cv[i] * c.cv[i] for i in range(1, ${d + 1})]) AS qd
      |  FROM cb c JOIN sub q ON q.s = c.s AND q.vec_id = 0),
      |adck AS (SELECT k.vec_id,
      |    ${(0 until m).map(i =>
             s"max(CASE WHEN k.s = $i THEN t.qd END)").mkString("\n  + ")}
      |      AS adc_dist
      |  FROM codes k JOIN qtab t ON t.s = k.s AND t.cid = k.cid
      |  WHERE k.vec_id <> 0 GROUP BY k.vec_id)""".stripMargin
  }

  /** Shared even-half-trained PQ probe CTE stack (stream_pq_probe and
    * pq_probe_recall): codebook trained on the even index half, coded
    * index, odd-probe distance tables, per-(probe, index) ADC sums in
    * `adc`. */
  private val pqProbeCtes: String = pqProbeCtesWith("")

  /** [[pqProbeCtes]] with an extra predicate on the odd probe fleet —
    * the sampled fleet audit appends the md5 stratum coin. */
  private def pqProbeCtesWith(qtExtra: String): String = {
    val m = ops.Similarity.PqSubspaces
    val d = ops.Similarity.PqSubDim
    s"""WITH sub AS (SELECT vec_id, t.s AS s,
        |    [embedding[t.s * $d + i]::DOUBLE for i in range(1, ${d + 1})] AS sv
        |  FROM embeddings, range(0, $m) t(s)),
        |sube AS (SELECT * FROM sub WHERE vec_id % 2 = 0),
        |cb0 AS (SELECT s, vec_id AS cid, sv AS cv FROM sube
        |  WHERE vec_id < 32),
        |ds0 AS (SELECT u.vec_id, u.s, c.cid,
        |    list_sum([u.sv[i] * u.sv[i] for i in range(1, ${d + 1})])
        |  - 2 * list_sum([u.sv[i] * c.cv[i] for i in range(1, ${d + 1})])
        |  + list_sum([c.cv[i] * c.cv[i] for i in range(1, ${d + 1})]) AS dist
        |  FROM sube u JOIN cb0 c USING (s)),
        |codes0 AS (SELECT vec_id, s, cid FROM (
        |  SELECT vec_id, s, cid, row_number() OVER (
        |    PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn
        |  FROM ds0) WHERE rn = 1),
        |m1 AS (SELECT u.s, k.cid, g.i AS pos,
        |    CAST(SUM(CAST(u.sv[g.i] AS DECIMAL(30,15))) AS DOUBLE)
        |      / COUNT(*) AS comp
        |  FROM sube u JOIN codes0 k ON k.vec_id = u.vec_id AND k.s = u.s,
        |    range(1, ${d + 1}) g(i)
        |  GROUP BY u.s, k.cid, g.i),
        |cbe AS (SELECT s, cid, list(comp ORDER BY pos) AS cv
        |  FROM m1 GROUP BY 1, 2),
        |dse AS (SELECT u.vec_id, u.s, c.cid,
        |    list_sum([u.sv[i] * u.sv[i] for i in range(1, ${d + 1})])
        |  - 2 * list_sum([u.sv[i] * c.cv[i] for i in range(1, ${d + 1})])
        |  + list_sum([c.cv[i] * c.cv[i] for i in range(1, ${d + 1})]) AS dist
        |  FROM sube u JOIN cbe c USING (s)),
        |codese AS (SELECT vec_id, s, cid FROM (
        |  SELECT vec_id, s, cid, row_number() OVER (
        |    PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn
        |  FROM dse) WHERE rn = 1),
        |qt AS (SELECT o.vec_id AS q_id, c.s, c.cid,
        |    list_sum([o.sv[i] * o.sv[i] for i in range(1, ${d + 1})])
        |  - 2 * list_sum([o.sv[i] * c.cv[i] for i in range(1, ${d + 1})])
        |  + list_sum([c.cv[i] * c.cv[i] for i in range(1, ${d + 1})]) AS qd
        |  FROM sub o JOIN cbe c ON c.s = o.s
        |  WHERE o.vec_id % 2 = 1$qtExtra),
        |adc AS (SELECT q.q_id, k.vec_id AS m_id,
        |    ${(0 until m).map(i =>
               s"max(CASE WHEN k.s = $i THEN q.qd END)").mkString("\n  + ")}
        |      AS adc_dist
        |  FROM codese k JOIN qt q ON q.s = k.s AND q.cid = k.cid
        |  GROUP BY 1, 2)""".stripMargin
  }

  /** Composed IVF-PQ CTE stack (ivfpq_* oracles and the restructured
    * stream_pq_probe): one-Lloyd-round coarse quantizer (the
    * kmeansAssignCte discipline), per-vector RESIDUAL against the final
    * cell centroid (exact IEEE subtraction after ::DOUBLE widening —
    * the same zip_with fold as Similarity.coarseQuantize), residual
    * sub-vector codebook trained with the pqCtes discipline, coded
    * index carrying its cell, then the query fleet's per-probed-cell
    * residual distance tables and the cell-keyed 8-term ADC chain.
    * Every double is the identical left-to-right fold the Spark side
    * computes, so the gate hashes bit-for-bit.
    *
    * @param idxWhere      predicate suffix on the index corpus ("" = full)
    * @param cellSeedBound seed threshold for the coarse centroids
    *                      (IvfPqCells full / 2·IvfPqCells even-half —
    *                      distinct from the codebook bound so the
    *                      production-geometry override keeps codebook
    *                      size fixed while cells scale ∝ √n)
    * @param cbSeedBound   seed threshold for the residual codebook
    *                      (PqCentroids full / 2·PqCentroids even-half)
    * @param qWhere        predicate selecting the query fleet
    * @param candWhere     extra predicate on ADC candidates ("" = none)
    */
  private def ivfpqCteStack(idxWhere: String, cellSeedBound: Int,
                            cbSeedBound: Int,
                            qWhere: String, candWhere: String): String = {
    val m = ops.Similarity.PqSubspaces
    val d = ops.Similarity.PqSubDim
    val nProbe = ops.Similarity.IvfPqProbe
    s"""WITH e AS (SELECT vec_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS sq
      |  FROM embeddings$idxWhere),
      |g0 AS (SELECT vec_id AS cid, embedding AS cemb, sq AS csq
      |  FROM e WHERE vec_id < $cellSeedBound),
      |gd0 AS (SELECT e.vec_id, c.cid,
      |    e.sq + c.csq - 2 * list_sum([e.embedding[i]::DOUBLE *
      |      c.cemb[i]::DOUBLE for i in range(1, 65)]) AS dist
      |  FROM e, g0 c),
      |ga0 AS (SELECT vec_id, cid FROM (
      |  SELECT vec_id, cid, row_number() OVER (
      |    PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM gd0)
      |  WHERE rn = 1),
      |gm1 AS (SELECT a.cid, g.i AS pos,
      |    CAST(SUM(CAST(e.embedding[g.i]::DOUBLE AS DECIMAL(30,15)))
      |      AS DOUBLE) / COUNT(*) AS comp
      |  FROM ga0 a JOIN e USING (vec_id), range(1, 65) g(i)
      |  GROUP BY 1, 2),
      |gc1 AS (SELECT cid, list(comp ORDER BY pos) AS cemb
      |  FROM gm1 GROUP BY 1),
      |gcs AS (SELECT cid, cemb,
      |  list_sum([cemb[i] * cemb[i] for i in range(1, 65)]) AS csq
      |  FROM gc1),
      |gd1 AS (SELECT e.vec_id, c.cid,
      |    e.sq + c.csq - 2 * list_sum([e.embedding[i]::DOUBLE * c.cemb[i]
      |                                 for i in range(1, 65)]) AS dist
      |  FROM e, gcs c),
      |cells AS (SELECT vec_id, cid AS cell FROM (
      |  SELECT vec_id, cid, row_number() OVER (
      |    PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM gd1)
      |  WHERE rn = 1),
      |resid AS (SELECT e.vec_id, x.cell,
      |    [e.embedding[i]::DOUBLE - c.cemb[i] for i in range(1, 65)] AS r
      |  FROM e JOIN cells x USING (vec_id) JOIN gcs c ON c.cid = x.cell),
      |rsub AS (SELECT vec_id, cell, t.s AS s,
      |    [r[t.s * $d + i] for i in range(1, ${d + 1})] AS sv
      |  FROM resid, range(0, $m) t(s)),
      |rcb0 AS (SELECT s, vec_id AS cid, sv AS cv FROM rsub
      |  WHERE vec_id < $cbSeedBound),
      |rds0 AS (SELECT u.vec_id, u.s, c.cid,
      |    list_sum([u.sv[i] * u.sv[i] for i in range(1, ${d + 1})])
      |  - 2 * list_sum([u.sv[i] * c.cv[i] for i in range(1, ${d + 1})])
      |  + list_sum([c.cv[i] * c.cv[i] for i in range(1, ${d + 1})]) AS dist
      |  FROM rsub u JOIN rcb0 c USING (s)),
      |rk0 AS (SELECT vec_id, s, cid FROM (
      |  SELECT vec_id, s, cid, row_number() OVER (
      |    PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn
      |  FROM rds0) WHERE rn = 1),
      |rm1 AS (SELECT u.s, k.cid, g.i AS pos,
      |    CAST(SUM(CAST(u.sv[g.i] AS DECIMAL(30,15))) AS DOUBLE)
      |      / COUNT(*) AS comp
      |  FROM rsub u JOIN rk0 k ON k.vec_id = u.vec_id AND k.s = u.s,
      |    range(1, ${d + 1}) g(i)
      |  GROUP BY 1, 2, 3),
      |rcb AS (SELECT s, cid, list(comp ORDER BY pos) AS cv
      |  FROM rm1 GROUP BY 1, 2),
      |rds AS (SELECT u.vec_id, u.cell, u.s, c.cid,
      |    list_sum([u.sv[i] * u.sv[i] for i in range(1, ${d + 1})])
      |  - 2 * list_sum([u.sv[i] * c.cv[i] for i in range(1, ${d + 1})])
      |  + list_sum([c.cv[i] * c.cv[i] for i in range(1, ${d + 1})]) AS dist
      |  FROM rsub u JOIN rcb c USING (s)),
      |rcodes AS (SELECT vec_id, cell, s, cid, dist FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn
      |  FROM rds) WHERE rn = 1),
      |qsrc AS (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS sq
      |  FROM embeddings WHERE $qWhere),
      |qcd AS (SELECT q.q_id, q.embedding, c.cid, c.cemb,
      |    q.sq + c.csq - 2 * list_sum([q.embedding[i]::DOUBLE * c.cemb[i]
      |                                 for i in range(1, 65)]) AS dist
      |  FROM qsrc q, gcs c),
      |qc AS (SELECT q_id, cid AS cell,
      |    [embedding[i]::DOUBLE - cemb[i] for i in range(1, 65)] AS qr
      |  FROM (SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY dist, cid) AS rn FROM qcd)
      |  WHERE rn <= $nProbe),
      |qrs AS (SELECT q_id, cell, t.s AS s,
      |    [qr[t.s * $d + i] for i in range(1, ${d + 1})] AS rv
      |  FROM qc, range(0, $m) t(s)),
      |qt AS (SELECT q.q_id, q.cell, c.s, c.cid,
      |    list_sum([q.rv[i] * q.rv[i] for i in range(1, ${d + 1})])
      |  - 2 * list_sum([q.rv[i] * c.cv[i] for i in range(1, ${d + 1})])
      |  + list_sum([c.cv[i] * c.cv[i] for i in range(1, ${d + 1})]) AS qd
      |  FROM qrs q JOIN rcb c USING (s)),
      |adc AS (SELECT q.q_id, k.vec_id AS m_id,
      |    ${(0 until m).map(i =>
             s"max(CASE WHEN k.s = $i THEN q.qd END)").mkString("\n  + ")}
      |      AS adc_dist
      |  FROM rcodes k JOIN qt q
      |    ON q.cell = k.cell AND q.s = k.s AND q.cid = k.cid$candWhere
      |  GROUP BY 1, 2)""".stripMargin
  }

  /** Full-corpus IVF-PQ stack, query = vector 0 (ivfpq_topk,
    * ivfpq_distortion, ivfpq_cell_stats). */
  private val ivfpqCtes: String = ivfpqCteStack(
    "", ops.Similarity.IvfPqCells, ops.Similarity.PqCentroids,
    "vec_id = 0", "\n  WHERE k.vec_id <> 0")

  /** Even-half index, odd probe fleet (ivfpq_probe_recall and the
    * restructured stream_pq_probe); `qExtra` appends the md5 stratum
    * coin for the sampled audit. */
  private def ivfpqProbeCtesWith(qExtra: String): String = ivfpqCteStack(
    " WHERE vec_id % 2 = 0", 2 * ops.Similarity.IvfPqCells,
    2 * ops.Similarity.PqCentroids,
    "vec_id % 2 = 1" + qExtra, "")

  private val ivfpqProbeCtes: String = ivfpqProbeCtesWith("")

  /** The accreted-PQ serving oracle ([[graft.streaming.StreamAssembly
    * .streamPqServeAccreted]]): code the insert fleet (vec_id ≡ 1
    * mod 4) against the frozen even-half IVFADC model — the
    * stream_pq_index_append chain on a different fleet — union those
    * codes with the base even codes, and ADC-score the query fleet
    * (≡ 3 mod 4) over the combined index. Coding and ADC are pure
    * per-row functions of the frozen model, so this batch replay is
    * bit-identical to the drained base ∪ segment read.
    */
  /** CTE chain coding the insert fleet (vec_id ≡ 1 mod 4) against the
    * FROZEN even-half model — yields `isrc2` (the fleet with its sq)
    * plus `icell`/`icodes` (its cell assignment and residual codes);
    * shared by the accreted-PQ serving oracle and the warm-refresh
    * oracle. Expects the `gcs`/`rcb` model CTEs in scope.
    */
  private def insertCodesCtes: String = {
    val m = ops.Similarity.PqSubspaces
    val d = ops.Similarity.PqSubDim
    s""",
      |isrc2 AS (SELECT vec_id, embedding,
      |    list_sum([embedding[k]::DOUBLE * embedding[k]::DOUBLE
      |              for k in range(1, 65)]) AS sq
      |  FROM embeddings WHERE vec_id % 4 = 1),
      |icd AS (SELECT i.vec_id, i.embedding, c.cid, c.cemb,
      |    i.sq + c.csq - 2 * list_sum([i.embedding[k]::DOUBLE * c.cemb[k]
      |                                 for k in range(1, 65)]) AS dist
      |  FROM isrc2 i, gcs c),
      |icell AS (SELECT vec_id, cid AS cell,
      |    [embedding[k]::DOUBLE - cemb[k] for k in range(1, 65)] AS qr
      |  FROM (SELECT *, row_number() OVER (
      |    PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM icd)
      |  WHERE rn = 1),
      |isub AS (SELECT vec_id, cell, t.s AS s,
      |    [qr[t.s * $d + k] for k in range(1, ${d + 1})] AS sv
      |  FROM icell, range(0, $m) t(s)),
      |ids2 AS (SELECT u.vec_id, u.cell, u.s, c.cid,
      |    list_sum([u.sv[k] * u.sv[k] for k in range(1, ${d + 1})])
      |  - 2 * list_sum([u.sv[k] * c.cv[k] for k in range(1, ${d + 1})])
      |  + list_sum([c.cv[k] * c.cv[k] for k in range(1, ${d + 1})]) AS dist
      |  FROM isub u JOIN rcb c USING (s)),
      |icodes AS (SELECT vec_id, cell, s, cid FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn
      |  FROM ids2) WHERE rn = 1)""".stripMargin
  }

  private def pqServeAccretedSql: String = {
    val m = ops.Similarity.PqSubspaces
    ivfpqCteStack(" WHERE vec_id % 2 = 0", 2 * ops.Similarity.IvfPqCells,
      2 * ops.Similarity.PqCentroids, "vec_id % 4 = 3", "") +
      insertCodesCtes + s""",
      |allc AS (SELECT vec_id, cell, s, cid FROM rcodes
      |  UNION ALL SELECT vec_id, cell, s, cid FROM icodes),
      |adc2 AS (SELECT q.q_id, k.vec_id AS m_id,
      |    ${(0 until m).map(i =>
             s"max(CASE WHEN k.s = $i THEN q.qd END)").mkString("\n  + ")}
      |      AS adc_dist
      |  FROM allc k JOIN qt q
      |    ON q.cell = k.cell AND q.s = k.s AND q.cid = k.cid
      |  GROUP BY 1, 2)
      |SELECT q_id AS vec_id, m_id AS match_id, adc_dist FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY adc_dist ASC, m_id ASC) AS rn
      |  FROM adc2) WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  /** The PQ warm-refresh oracle ([[ops.Similarity.ivfpqWarmRefresh]]):
    * one decimal-exact Lloyd refresh of the FROZEN coarse axis over the
    * merged (even ∪ inserted) population, full re-code of everything
    * against the refreshed centroids (residual codebook kept — the
    * standard production refresh), and the exact-integer churn report:
    * how many vectors changed cells, how many codes changed per
    * subspace.
    */
  private def ivfpqWarmRefreshSql: String = {
    val m = ops.Similarity.PqSubspaces
    val d = ops.Similarity.PqSubDim
    ivfpqCteStack(" WHERE vec_id % 2 = 0", 2 * ops.Similarity.IvfPqCells,
      2 * ops.Similarity.PqCentroids, "vec_id = 0", "") +
      insertCodesCtes + s""",
      |e2 AS MATERIALIZED (SELECT vec_id, embedding, sq FROM e
      |  UNION ALL SELECT vec_id, embedding, sq FROM isrc2),
      |oldcell AS MATERIALIZED (SELECT vec_id, cell FROM cells
      |  UNION ALL SELECT vec_id, cell FROM icell),
      |gm2 AS (SELECT oc.cell AS cid, g.i AS pos,
      |    CAST(SUM(CAST(u.embedding[g.i]::DOUBLE AS DECIMAL(30,15)))
      |      AS DOUBLE) / COUNT(*) AS comp
      |  FROM oldcell oc JOIN e2 u USING (vec_id), range(1, 65) g(i)
      |  GROUP BY 1, 2),
      |gc2 AS (SELECT cid, list(comp ORDER BY pos) AS cemb
      |  FROM gm2 GROUP BY 1),
      |gcs2 AS MATERIALIZED (SELECT cid, cemb,
      |  list_sum([cemb[i] * cemb[i] for i in range(1, 65)]) AS csq
      |  FROM gc2),
      |nd2 AS (SELECT u.vec_id, c.cid,
      |    u.sq + c.csq - 2 * list_sum([u.embedding[i]::DOUBLE * c.cemb[i]
      |                                 for i in range(1, 65)]) AS dist
      |  FROM e2 u, gcs2 c),
      |cells2 AS MATERIALIZED (SELECT vec_id, cid AS cell FROM (
      |  SELECT vec_id, cid, row_number() OVER (
      |    PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM nd2)
      |  WHERE rn = 1),
      |nmv AS (SELECT count(*) AS n_cell_moved
      |  FROM cells2 n JOIN oldcell o USING (vec_id)
      |  WHERE n.cell <> o.cell),
      |resid3 AS (SELECT u.vec_id, x.cell,
      |    [u.embedding[i]::DOUBLE - c.cemb[i] for i in range(1, 65)] AS r
      |  FROM e2 u JOIN cells2 x USING (vec_id)
      |  JOIN gcs2 c ON c.cid = x.cell),
      |rsub3 AS (SELECT vec_id, cell, t.s AS s,
      |    [r[t.s * $d + i] for i in range(1, ${d + 1})] AS sv
      |  FROM resid3, range(0, $m) t(s)),
      |rds3 AS (SELECT u.vec_id, u.s, c.cid,
      |    list_sum([u.sv[i] * u.sv[i] for i in range(1, ${d + 1})])
      |  - 2 * list_sum([u.sv[i] * c.cv[i] for i in range(1, ${d + 1})])
      |  + list_sum([c.cv[i] * c.cv[i] for i in range(1, ${d + 1})]) AS dist
      |  FROM rsub3 u JOIN rcb c USING (s)),
      |codes3 AS MATERIALIZED (SELECT vec_id, s, cid FROM (
      |  SELECT vec_id, s, cid, row_number() OVER (
      |    PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn
      |  FROM rds3) WHERE rn = 1),
      |oldc AS (SELECT vec_id, s, cid FROM rcodes
      |  UNION ALL SELECT vec_id, s, cid FROM icodes)
      |SELECT CAST(n.s AS BIGINT) AS s, count(*) AS n_vectors,
      |  CAST(sum(CASE WHEN n.cid <> o.cid THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_code_changed,
      |  (SELECT n_cell_moved FROM nmv) AS n_cell_moved
      |FROM codes3 n JOIN oldc o ON o.vec_id = n.vec_id AND o.s = n.s
      |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Greedy graph-descent CTE stack (graph_search / stream_graph_probe
    * / graph_search_recall oracles): the even-half NN-descent graph
    * ([[knnGraphCteStack]]) + the odd query fleet descending it —
    * fixed min-id entry, [[ops.KnnGraph.SearchHops]] unrolled hops
    * (neighbor expansion ∪ frontier, exact rescoring, beam-bounded
    * row_number), replaying [[ops.KnnGraph.greedySearch]] bit-for-bit.
    * `qExtra` appends the md5 stratum coin for the recall audit.
    */
  private def graphDescentCtes(qExtra: String): String =
    knnGraphCteStack(" WHERE vec_id % 2 = 0") + s""",
      |serve AS MATERIALIZED (SELECT src, dst FROM gfin
      |  UNION SELECT src, dst FROM init),
      |qsrc AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS q_sq
      |  FROM embeddings WHERE vec_id % 2 = 1$qExtra)""".stripMargin +
      descentStack("", "e", "serve", "qsrc")

  /** One greedy-descent hop stack over arbitrary index / edge / fleet
    * CTEs, every generated CTE name prefixed `p` so two descents can
    * coexist in one statement (the accreted-serving oracle runs the
    * INSERT fleet's descent and then the QUERY fleet's descent over
    * base ∪ segments). Expects `idxCte(vec_id, embedding, sq)`,
    * `serveCte(src, dst)`, `qsrcCte(q_id, embedding, q_sq)`; yields
    * `${p}f0..${p}fH` with the beam at `rn <= SearchBeam`.
    */
  private def descentDistSql: String =
    "q.q_sq + ev.sq - 2 * list_sum([q.embedding[i]::DOUBLE *" +
      "\n  ev.embedding[i]::DOUBLE for i in range(1, 65)])"

  private def descentHopsSql(p: String, idxCte: String, serveCte: String,
                             qsrcCte: String): String = {
    val b = ops.KnnGraph.SearchBeam
    (1 to ops.KnnGraph.SearchHops).map { h =>
      s""",
        |${p}h${h}x AS MATERIALIZED (SELECT DISTINCT q_id, v FROM (
        |  SELECT f.q_id, g.dst AS v FROM ${p}f${h - 1} f
        |    JOIN $serveCte g ON g.src = f.v
        |  UNION ALL SELECT q_id, v FROM ${p}f${h - 1})),
        |${p}f$h AS MATERIALIZED (SELECT q_id, v, dist, rn FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY dist, v) AS rn FROM (
        |    SELECT x.q_id, x.v, $descentDistSql AS dist
        |    FROM ${p}h${h}x x JOIN $idxCte ev ON ev.vec_id = x.v
        |    JOIN $qsrcCte q ON q.q_id = x.q_id))
        |  WHERE rn <= $b)""".stripMargin
    }.mkString
  }

  private def descentStack(p: String, idxCte: String, serveCte: String,
                           qsrcCte: String): String = {
    val b = ops.KnnGraph.SearchBeam
    s""",
      |${p}entry AS (SELECT vec_id AS v FROM $idxCte
      |  ORDER BY vec_id LIMIT ${ops.KnnGraph.SearchEntries}),
      |${p}f0 AS MATERIALIZED (SELECT q_id, v, dist, rn FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY dist, v) AS rn FROM (
      |    SELECT q.q_id, ev.vec_id AS v, $descentDistSql AS dist
      |    FROM $qsrcCte q, ${p}entry x JOIN $idxCte ev ON ev.vec_id = x.v))
      |  WHERE rn <= $b)""".stripMargin +
      descentHopsSql(p, idxCte, serveCte, qsrcCte)
  }

  /** [[descentStack]] from a PER-QUERY entry CTE `(q_id, v)` — the
    * hierarchical oracle's base-layer descent enters at the upper
    * layer's winners instead of the global min-id entries.
    */
  private def descentStackFrom(p: String, idxCte: String, serveCte: String,
                               qsrcCte: String,
                               entryCte: String): String = {
    val b = ops.KnnGraph.SearchBeam
    s""",
      |${p}f0 AS MATERIALIZED (SELECT q_id, v, dist, rn FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY dist, v) AS rn FROM (
      |    SELECT x.q_id, x.v, $descentDistSql AS dist
      |    FROM $entryCte x JOIN $idxCte ev ON ev.vec_id = x.v
      |    JOIN $qsrcCte q ON q.q_id = x.q_id))
      |  WHERE rn <= $b)""".stripMargin +
      descentHopsSql(p, idxCte, serveCte, qsrcCte)
  }

  /** The hierarchical-serving CTE stack ([[ops.KnnGraph
    * .graphSearchHier]]): the base-layer even graph (unprefixed) + the
    * md5-coin upper-layer graph (prefix `x`) + both serve edge sets +
    * the odd query fleet (`qExtra` appends the stratum coin) + the
    * upper descent (`u`, standard entries over the small layer) + the
    * base descent (`z`) entering at each query's upper winners.
    */
  private def hierDescentCtes(qExtra: String): String =
    knnGraphCteStack(" WHERE vec_id % 2 = 0") + s""",
      |serve AS MATERIALIZED (SELECT src, dst FROM gfin
      |  UNION SELECT src, dst FROM init),
      |qsrc AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS q_sq
      |  FROM embeddings WHERE vec_id % 2 = 1$qExtra)""".stripMargin +
      hierEntryStage("qsrc") +
      descentStackFrom("z", "e", "serve", "qsrc", "zent")

  /** The hierarchical ENTRY stage as CTEs (the oracle twin of
    * [[ops.KnnGraph.hierEntries]]): build the md5-coin upper layer's
    * own graph + long-range links (prefix `x`), run fleet `qsrcCte`'s
    * standard descent over it (prefix `u`), and keep each query's
    * [[ops.KnnGraph.SearchEntries]] best upper vertices as `zent` —
    * the per-query base-layer entries every lifecycle serving oracle
    * continues from (r17: the accreted / delete-masked / full-CRUD
    * serves all enter here).
    */
  private def hierEntryStage(qsrcCte: String,
      upperWhere: String = " WHERE vec_id % 2 = 0",
      stackPfx: String = "x", descPfx: String = "u",
      entCte: String = "zent"): String = {
    val coin = " AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT" +
      s" % 100 < ${ops.KnnGraph.HierPct}"
    ",\n" + knnGraphCteStack(upperWhere + coin, stackPfx,
        withKw = false) + s""",
      |${stackPfx}serve AS MATERIALIZED (SELECT src, dst FROM ${stackPfx}gfin
      |  UNION SELECT src, dst FROM ${stackPfx}init)""".stripMargin +
      descentStack(descPfx, s"${stackPfx}e", s"${stackPfx}serve",
        qsrcCte) + s""",
      |$entCte AS (SELECT q_id, v FROM ${descPfx}f${ops.KnnGraph.SearchHops}
      |  WHERE rn <= ${ops.KnnGraph.SearchEntries})""".stripMargin
  }

  /** Membership coin for tower level `t` (the oracle twin of
    * [[ops.KnnGraph.towerCoin]]): level-1 coin = the standing hier
    * coin; each deeper level conjoins one salted md5 coin.
    */
  private def towerCoinSql(t: Int): String =
    (1 to t).map {
      case 1 => " AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))" +
        s"::BIGINT % 100 < ${ops.KnnGraph.HierPct}"
      case s => s" AND ('0x' || substr(md5('t$s:' || vec_id::VARCHAR)," +
        s" 1, 8))::BIGINT % 100 < ${ops.KnnGraph.HierPct}"
    }.mkString

  /** The tower ENTRY stages as CTEs (the oracle twin of
    * [[ops.KnnGraph.graphSearchTower]]'s level loop): for each level
    * from the top down, that level's own graph stack (prefix `y{t}`) +
    * the fleet's descent over it (prefix `w{t}` — min-id entries at
    * the top, the level above's winners below), each level's
    * [[ops.KnnGraph.SearchEntries]] best as `w{t}ent`. Returns the CTE
    * text and the FINAL entry CTE name the base descent continues from.
    */
  private def towerEntryStages(qsrcCte: String): (String, String) = {
    val sb = new StringBuilder
    var entCte: String = null
    for (t <- ops.KnnGraph.TowerLevels to 1 by -1) {
      val pfx = s"y$t"
      val dp = s"w$t"
      sb.append(",\n" + knnGraphCteStack(
        " WHERE vec_id % 2 = 0" + towerCoinSql(t), pfx, withKw = false))
      sb.append(s""",
        |${pfx}serve AS MATERIALIZED (SELECT src, dst FROM ${pfx}gfin
        |  UNION SELECT src, dst FROM ${pfx}init)""".stripMargin)
      sb.append(
        if (entCte == null)
          descentStack(dp, s"${pfx}e", s"${pfx}serve", qsrcCte)
        else
          descentStackFrom(dp, s"${pfx}e", s"${pfx}serve", qsrcCte, entCte))
      entCte = s"${dp}ent"
      sb.append(s""",
        |$entCte AS (SELECT q_id, v FROM ${dp}f${ops.KnnGraph.SearchHops}
        |  WHERE rn <= ${ops.KnnGraph.SearchEntries})""".stripMargin)
    }
    (sb.toString, entCte)
  }

  /** The tower-serving CTE stack ([[ops.KnnGraph.graphSearchTower]]):
    * base even graph + odd fleet (`qExtra` appends the stratum coin) +
    * the level-by-level entry stages + the base descent (prefix `z`)
    * entering at the lowest level's winners.
    */
  private def towerDescentCtes(qExtra: String): String = {
    val (stages, entCte) = towerEntryStages("qsrc")
    knnGraphCteStack(" WHERE vec_id % 2 = 0") + s""",
      |serve AS MATERIALIZED (SELECT src, dst FROM gfin
      |  UNION SELECT src, dst FROM init),
      |qsrc AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS q_sq
      |  FROM embeddings WHERE vec_id % 2 = 1$qExtra)""".stripMargin +
      stages +
      descentStackFrom("z", "e", "serve", "qsrc", entCte)
  }

  /** The accreted-graph serving oracle ([[graft.streaming
    * .StreamAssembly.streamGraphServeAccreted]]): replay the insert
    * fleet's (vec_id ≡ 1 mod 4) NSW descent of the frozen even graph,
    * materialize its fan-out-bounded beam as the segment rows, derive
    * the k-bounded back-links, and run the query fleet's
    * (vec_id ≡ 3 mod 4) descent over base ∪ segment edges and the
    * accreted (even ∪ inserted) population — everything stateless, so
    * this batch replay is bit-identical to the drained engine path.
    */
  private def graphServeAccretedSql: String =
    accretedGraphPrefix + s""",
      |aq AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS q_sq
      |  FROM embeddings WHERE vec_id % 4 = 3)""".stripMargin +
      hierEntryStage("aq") +
      descentStackFrom("a", "aidx", "aserve", "aq", "zent") + s"""
      |SELECT q_id AS vec_id, v AS match_id,
      |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
      |FROM af${ops.KnnGraph.SearchHops} WHERE rn = 1
      |ORDER BY vec_id""".stripMargin

  /** The accreted-serving recall-at-identical-hops oracle
    * ([[ops.KnnGraph.graphServeAccretedRecall]]): the stratum fleet
    * descends the accreted graph twice — flat min-id entries (`a`)
    * and hier entries (`z` via the upper stage) — and both top-1s are
    * priced against one exact pass over the accreted population.
    */
  private def graphServeAccretedRecallSql: String = {
    val h = ops.KnnGraph.SearchHops
    def countsFrom(g: String, variant: String): String =
      s"""SELECT '$variant' AS variant,
        |  CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN g_id = bf_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_top1_match,
        |  CASE WHEN count(*) = 0 THEN NULL
        |    ELSE CAST(sum(CASE WHEN g_id = bf_id THEN 1 ELSE 0 END)::HUGEINT
        |      * 1000000 // count(*) AS BIGINT) END AS recall_ppm
        |FROM $g JOIN bf USING (q_id)""".stripMargin
    accretedGraphPrefix + s""",
      |aqs AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS q_sq
      |  FROM embeddings WHERE vec_id % 4 = 3
      |    AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT
      |      % 100 < 20)""".stripMargin +
      descentStack("a", "aidx", "aserve", "aqs") +
      hierEntryStage("aqs") +
      descentStackFrom("z", "aidx", "aserve", "aqs", "zent") + s""",
      |bf AS MATERIALIZED (SELECT q_id, m_id AS bf_id FROM (
      |  SELECT q.q_id, ev.vec_id AS m_id, row_number() OVER (
      |    PARTITION BY q.q_id ORDER BY
      |      q.q_sq + ev.sq - 2 * list_sum([q.embedding[i]::DOUBLE *
      |        ev.embedding[i]::DOUBLE for i in range(1, 65)]),
      |      ev.vec_id) AS rn
      |  FROM aqs q, aidx ev) WHERE rn = 1),
      |gflat AS (SELECT q_id, v AS g_id FROM af$h WHERE rn = 1),
      |ghier AS (SELECT q_id, v AS g_id FROM zf$h WHERE rn = 1)
      |SELECT * FROM (
      |${countsFrom("gflat", "flat")}
      |UNION ALL
      |${countsFrom("ghier", "hier")})
      |ORDER BY variant""".stripMargin
  }

  /** The fold-decision oracle ([[ops.KnnGraph.graphFoldDecision]]):
    * the attachment stats reduced to the one-row decision (`dec`), the
    * fold branch (combined fold + fresh bidirectional links +
    * refreshed live upper layer, prefix g), the serve-on branch
    * (accreted graph + frozen-even hier entries + late tombstone mask,
    * prefix t), each gated by the decision scalar — the whole loop
    * replayed, including the decision.
    */
  private def graphFoldDecisionSql: String = {
    val h = ops.KnnGraph.SearchHops
    val k = ops.KnnGraph.K
    val stratum = " AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))" +
      "::BIGINT % 100 < 20"
    warmLiveFoldCtes + ",\n" +
      initEdgesSql("l", "lidx") + s""",
      |lserve AS MATERIALIZED (SELECT src, dst FROM w1
      |  UNION SELECT dst, src FROM w1
      |  UNION SELECT src, dst FROM linit),
      |dec AS (SELECT CASE WHEN sum(CASE WHEN fan_in > $k
      |      THEN fan_in - $k ELSE 0 END)
      |      >= ${ops.KnnGraph.FoldEvictThreshold}
      |    THEN 1 ELSE 0 END AS fold_due
      |  FROM (SELECT nbr, count(*) AS fan_in FROM seg GROUP BY 1)),
      |fq AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS q_sq
      |  FROM embeddings WHERE vec_id % 4 = 3$stratum)""".stripMargin +
      hierEntryStage("fq",
        " WHERE ((vec_id % 2 = 0 AND vec_id % 8 <> 6)" +
          " OR vec_id % 4 = 1)") +
      descentStackFrom("g", "lidx", "lserve", "fq", "zent") +
      hierEntryStage("fq", " WHERE vec_id % 2 = 0",
        "x2", "u2", "zent2") +
      descentStackFrom("t", "aidx", "aserve", "fq", "zent2") + s"""
      |SELECT q_id AS vec_id, v AS match_id,
      |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u,
      |  CAST(1 AS BIGINT) AS fold_due
      |FROM gf$h WHERE rn = 1 AND (SELECT fold_due FROM dec) = 1
      |UNION ALL
      |SELECT q_id AS vec_id, v AS match_id,
      |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u,
      |  CAST(0 AS BIGINT) AS fold_due
      |FROM (SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY dist, v) AS rn2
      |  FROM tf$h WHERE v % 8 <> 6) mx
      |WHERE rn2 = 1 AND (SELECT fold_due FROM dec) = 0
      |ORDER BY vec_id""".stripMargin
  }

  /** Shared accreted-index CTE prefix (base even graph → insert-fleet
    * descent → segments + derived back-links → accreted edge set
    * `aserve` + accreted population `aidx`) — the serving oracle and
    * the warm-rebuild oracle both continue from here.
    */
  private def accretedGraphPrefix: String = {
    val h = ops.KnnGraph.SearchHops
    knnGraphCteStack(" WHERE vec_id % 2 = 0") + s""",
      |serve AS MATERIALIZED (SELECT src, dst FROM gfin
      |  UNION SELECT src, dst FROM init),
      |isrc AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS q_sq
      |  FROM embeddings WHERE vec_id % 4 = 1)""".stripMargin +
      descentStack("i", "e", "serve", "isrc") + s""",
      |seg AS MATERIALIZED (SELECT q_id AS vec_id, v AS nbr,
      |    CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
      |  FROM if$h WHERE rn <= ${ops.KnnGraph.InsertFanout}),
      |rev AS (SELECT nbr AS src, vec_id AS dst FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY nbr ORDER BY dist_u, vec_id) AS rr FROM seg)
      |  WHERE rr <= ${ops.KnnGraph.K}),
      |aserve AS MATERIALIZED (SELECT src, dst FROM serve
      |  UNION SELECT vec_id, nbr FROM seg
      |  UNION SELECT src, dst FROM rev),
      |aidx AS MATERIALIZED (SELECT vec_id, embedding, sq FROM e
      |  UNION ALL SELECT q_id, embedding, q_sq FROM isrc)""".stripMargin
  }

  /** 56-plane (7 bands × 8 bits) LSH signature + norm CTE over an
    * `embeddings` slice — the production banding of
    * [[ops.Dedup.embeddingNearDupsLshCapped]], shared by the LSH
    * index-lifecycle oracles. Plane signs derive from md5("p,d")
    * first-byte parity in both engines; per-plane dots fold in dim
    * order, so signatures are bit-identical.
    */
  private def lshIndexSigsSql(where: String): String = {
    val bb = graft.streaming.StreamAssembly.LshIndexBandBits
    val nb = graft.streaming.StreamAssembly.LshIndexBands
    s"""sigs AS (SELECT vec_id, embedding,
      |  list_sum([
      |    CASE WHEN list_sum([
      |      CASE WHEN (('0x' || substr(md5(p::VARCHAR || ',' ||
      |        (i-1)::VARCHAR), 1, 2))::INT & 1) = 0
      |      THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
      |      for i in range(1, 65)]) > 0
      |    THEN (1::BIGINT << p) ELSE 0 END
      |    for p in range(0, ${bb * nb})])::BIGINT AS sig,
      |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |                 for i in range(1, 65)])) AS nrm
      |  FROM embeddings$where)""".stripMargin
  }

  /** The accreted-LSH serving oracle ([[graft.streaming.StreamAssembly
    * .streamLshServeAccreted]]): band the accreted signature set (even
    * base ∪ the ≡ 1 mod 4 insert fleet — signatures are pure row
    * functions, so the segment replay is the same expression), skip
    * overfull buckets, candidates from the (band, bucket) equi-join of
    * the ≡ 3 mod 4 query fleet, exact-cosine top-1.
    */
  private def lshServeAccretedSql: String =
    lshServeSql("vec_id % 2 = 0 OR vec_id % 4 = 1")

  /** The delete-masked LSH oracle ([[graft.streaming.StreamAssembly
    * .streamLshServeDeleted]]): the scan-side mask — tombstoned base
    * rows (vec_id ≡ 6 mod 8) excluded BEFORE banding, so bucket caps
    * are live-population properties (the inequivalence-with-late-mask
    * note on the engine side).
    */
  private def lshServeDeletedSql: String =
    lshServeSql("vec_id % 2 = 0 AND vec_id % 8 <> 6")

  /** The full-CRUD LSH oracle ([[graft.streaming.StreamAssembly
    * .streamLshServeFull]]): (base ∖ tombstones) ∪ the ≡ 1 mod 4
    * insert fleet's signatures.
    */
  private def lshServeFullSql: String =
    lshServeSql("(vec_id % 2 = 0 AND vec_id % 8 <> 6) OR vec_id % 4 = 1")

  /** Shared LSH bucket-join serving oracle over an index slice: band
    * the live signature set, skip overfull buckets, candidates from
    * the (band, bucket) equi-join of the ≡ 3 mod 4 fleet, exact-cosine
    * top-1 — signatures are pure row functions, so the segment/mask
    * replay is just this WHERE.
    */
  private def lshServeSql(idxWhere: String): String = {
    val bb = graft.streaming.StreamAssembly.LshIndexBandBits
    val nb = graft.streaming.StreamAssembly.LshIndexBands
    s"""WITH ${lshIndexSigsSql("")},
      |idx AS (SELECT vec_id, sig FROM sigs
      |  WHERE $idxWhere),
      |banded AS (SELECT vec_id, bd.band,
      |    (sig >> (bd.band * $bb)) & ${(1 << bb) - 1} AS bucket
      |  FROM idx, range(0, $nb) bd(band)),
      |kept AS (SELECT banded.* FROM banded
      |  JOIN (SELECT band, bucket FROM banded GROUP BY 1, 2
      |        HAVING count(*) <= ${ops.Dedup.LshBucketCap})
      |    USING (band, bucket)),
      |q AS (SELECT vec_id AS q_id, sig FROM sigs WHERE vec_id % 4 = 3),
      |qb AS (SELECT q_id, bd.band,
      |    (sig >> (bd.band * $bb)) & ${(1 << bb) - 1} AS bucket
      |  FROM q, range(0, $nb) bd(band)),
      |cand AS (SELECT DISTINCT qb.q_id, k.vec_id AS m_id
      |  FROM qb JOIN kept k USING (band, bucket)),
      |scored AS (SELECT c.q_id, c.m_id,
      |    list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
      |              for i in range(1, 65)]) / (a.nrm * b.nrm) AS cosine
      |  FROM cand c JOIN sigs a ON a.vec_id = c.q_id
      |  JOIN sigs b ON b.vec_id = c.m_id)
      |SELECT q_id AS vec_id, m_id AS match_id, cosine FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY cosine DESC, m_id ASC) AS rn
      |  FROM scored) WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  /** The distinct word-8-gram list comprehension over a `ws`
    * (string_split) column — the `word_shingles(text, 8)` twin, shared
    * by the Bloom-tier oracles (contamination_check inlines the same
    * expression).
    */
  // single-line on purpose: embedded into stripMargin templates, where a
  // continuation line starting with "||" would lose its first pipe
  private val gram8Sql: String =
    "list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]" +
      "||' '||ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7] " +
      "for i in range(1, len(ws) - 6)])"

  /** md5 Bloom position of hash `i` for shingle column `s` — the
    * engine's [[ops.TrainingSets]] draw replayed.
    */
  private def bloomPosSql(i: String, s: String): String =
    s"('0x' || substr(md5($i::VARCHAR || '#' || $s), 1, " +
      s"${ops.TrainingSets.BloomHexChars}))::BIGINT" +
      s" % ${ops.TrainingSets.BloomBits}"

  /** The Bloom-decontamination oracle ([[ops.TrainingSets
    * .bloomContamination]]): train-shingle positions → the filter's
    * distinct bit set; each test shingle's k positions probed; bloom
    * vs exact hit/fp counts per lang, doc-level flag counts.
    */
  private def bloomContaminationSql: String = {
    val k = ops.TrainingSets.BloomHashes
    s"""WITH d AS (SELECT doc_id, lang, text,
      |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
      |  FROM documents),
      |sp AS (SELECT doc_id, lang,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
      |  string_split(text, ' ') AS ws FROM d),
      |sh AS (SELECT doc_id, lang, split, unnest($gram8Sql) AS s
      |  FROM sp WHERE len(ws) >= 8),
      |tr AS (SELECT DISTINCT s FROM sh WHERE split = 'train'),
      |pos AS (SELECT DISTINCT ${bloomPosSql("h.i", "s")} AS pos
      |  FROM tr, range(0, $k) h(i)),
      |ts AS (SELECT doc_id, lang, s FROM sh WHERE split = 'test'),
      |pr AS (SELECT doc_id, lang, s,
      |    ${bloomPosSql("h.i", "s")} AS p
      |  FROM ts, range(0, $k) h(i)),
      |hb AS (SELECT doc_id, lang, s,
      |    sum(CASE WHEN p IN (SELECT pos FROM pos) THEN 1 ELSE 0 END) = $k
      |      AS bloom_hit
      |  FROM pr GROUP BY 1, 2, 3),
      |tg AS (SELECT hb.*, (s IN (SELECT s FROM tr)) AS ex FROM hb)
      |SELECT lang,
      |  count(DISTINCT doc_id) AS n_test_docs,
      |  count(*) AS n_test_shingles,
      |  CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bloom_hits,
      |  CAST(sum(CASE WHEN ex THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_exact_hits,
      |  CAST(sum(CASE WHEN bloom_hit AND NOT ex THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_false_pos,
      |  count(DISTINCT CASE WHEN bloom_hit THEN doc_id END)
      |    AS n_docs_flagged_bloom,
      |  count(DISTINCT CASE WHEN ex THEN doc_id END)
      |    AS n_docs_flagged_exact
      |FROM tg GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The streaming Bloom-probe oracle ([[graft.streaming
    * .StreamAssembly.streamBloomProbe]]): the filter over the even-doc
    * half's shingles, every odd doc's shingles probed, per-doc verdict
    * — everything doc-local given the position set, so the batch
    * replay is bit-identical to the drained frame.
    */
  private def streamBloomProbeSql: String = {
    val k = ops.TrainingSets.BloomHashes
    s"""WITH ev AS (SELECT string_split(text, ' ') AS ws FROM documents
      |  WHERE doc_id % 2 = 0),
      |evs AS (SELECT DISTINCT unnest($gram8Sql) AS s
      |  FROM ev WHERE len(ws) >= 8),
      |pos AS (SELECT DISTINCT ${bloomPosSql("h.i", "s")} AS pos
      |  FROM evs, range(0, $k) h(i)),
      |od AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE doc_id % 2 = 1),
      |osh AS (SELECT doc_id, unnest($gram8Sql) AS s
      |  FROM od WHERE len(ws) >= 8),
      |pr AS (SELECT doc_id, s, ${bloomPosSql("h.i", "s")} AS p
      |  FROM osh, range(0, $k) h(i)),
      |hb AS (SELECT doc_id, s,
      |    CASE WHEN sum(CASE WHEN p IN (SELECT pos FROM pos)
      |      THEN 1 ELSE 0 END) = $k THEN 1 ELSE 0 END AS bh
      |  FROM pr GROUP BY 1, 2),
      |agg AS (SELECT doc_id, count(*) AS ns, sum(bh) AS nh
      |  FROM hb GROUP BY 1)
      |SELECT o.doc_id,
      |  CAST(coalesce(a.ns, 0) AS BIGINT) AS n_shingles,
      |  CAST(coalesce(a.nh, 0) AS BIGINT) AS n_hit_shingles,
      |  CAST(CASE WHEN coalesce(a.nh, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
      |    AS flagged
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) o
      |LEFT JOIN agg a USING (doc_id)
      |ORDER BY o.doc_id""".stripMargin
  }

  /** The delete-masked graph-serving oracle ([[graft.streaming
    * .StreamAssembly.streamGraphServeDeleted]]): the query fleet
    * (vec_id ≡ 3 mod 4) descends the frozen even graph UNCHANGED
    * (tombstoned vertices still route — the Lucene/CK-mask posture),
    * and the mask applies at result time: the final beam drops
    * tombstoned members (vec_id ≡ 6 mod 8, the drained fixture) and
    * the best live member answers. A fully-tombstoned beam drops the
    * query on both engines.
    */
  private def graphServeDeletedSql: String =
    knnGraphCteStack(" WHERE vec_id % 2 = 0") + s""",
      |serve AS MATERIALIZED (SELECT src, dst FROM gfin
      |  UNION SELECT src, dst FROM init),
      |dq AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS q_sq
      |  FROM embeddings WHERE vec_id % 4 = 3)""".stripMargin +
      hierEntryStage("dq") +
      descentStackFrom("d", "e", "serve", "dq", "zent") + s"""
      |SELECT q_id AS vec_id, v AS match_id,
      |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
      |FROM (SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY dist, v) AS rn2
      |  FROM df${ops.KnnGraph.SearchHops} WHERE v % 8 <> 6) t
      |WHERE rn2 = 1 ORDER BY vec_id""".stripMargin

  /** The warm-rebuild oracle ([[ops.KnnGraph.warmRebuildOf]]): score
    * the accreted edge set once over the merged population, keep each
    * vertex's k best, then ONE NN-descent round — the same general-
    * neighbor exchange the cold build unrolls, seeded from converged
    * neighborhoods instead of the md5 draw.
    */
  private def knnGraphWarmRebuildSql: String =
    accretedGraphPrefix + s""",
      |w0s AS MATERIALIZED (SELECT p.src, p.dst,
      |  a.sq + b.sq - 2 * list_sum([a.embedding[i]::DOUBLE *
      |    b.embedding[i]::DOUBLE for i in range(1, 65)]) AS dist
      |  FROM (SELECT src, dst FROM aserve WHERE src <> dst) p
      |  JOIN aidx a ON a.vec_id = p.src
      |  JOIN aidx b ON b.vec_id = p.dst),
      |w0 AS MATERIALIZED (SELECT src, dst, dist, rn AS rank FROM (
      |  SELECT src, dst, dist, row_number() OVER (
      |    PARTITION BY src ORDER BY dist, dst) AS rn FROM w0s)
      |  WHERE rn <= ${ops.KnnGraph.K}),
      |""".stripMargin + knnRoundSql("w0", "w1", "aidx") + """
      |SELECT src AS vec_id, rank, dst AS nbr,
      |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
      |FROM w1 ORDER BY vec_id, rank""".stripMargin

  /** The CMS oracles ([[ops.HeavyHitters.cmsHeavyAudit]] /
    * [[graft.streaming.StreamAssembly.streamCmsPartials]]): the d×w
    * grid over the token stream, exact top-k tokens, min-over-rows
    * point estimates, integer overestimate. `where` slices the corpus
    * (the partials gate runs the odd half; per-cell sums commute, so
    * the single-pass replay equals the merged micro-batch partials).
    */
  private def cmsAuditSql(where: String): String = {
    val d = ops.HeavyHitters.CmsDepth
    val w = ops.HeavyHitters.CmsWidth
    s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS w
      |  FROM documents$where),
      |g AS (SELECT h.i AS i,
      |    ('0x' || substr(md5(h.i::VARCHAR || '#' || w), 1, 8))::BIGINT
      |      % $w AS pos,
      |    count(*) AS cnt
      |  FROM t, range(0, $d) h(i) GROUP BY 1, 2),
      |ex AS (SELECT w AS token, count(*) AS exact FROM t GROUP BY 1
      |  ORDER BY exact DESC, token LIMIT 50),
      |pr AS (SELECT token, exact, h.i AS i,
      |    ('0x' || substr(md5(h.i::VARCHAR || '#' || token), 1, 8))::BIGINT
      |      % $w AS pos
      |  FROM ex, range(0, $d) h(i)),
      |est AS (SELECT token, min(cnt) AS cms_est
      |  FROM pr JOIN g USING (i, pos) GROUP BY 1)
      |SELECT e.token, e.exact, s.cms_est,
      |  s.cms_est - e.exact AS overestimate
      |FROM ex e JOIN est s USING (token)
      |ORDER BY exact DESC, token""".stripMargin
  }

  /** The full-CRUD graph-serving oracle ([[graft.streaming
    * .StreamAssembly.streamGraphServeFull]]): the accreted-serving
    * replay (insert fleet's descent → segments + back-links, query
    * fleet over base ∪ segments) with the delete mask applied to the
    * final beam — reads see base ∪ inserts ∖ deletes.
    */
  private def graphServeFullSql: String =
    accretedGraphPrefix + s""",
      |aq AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS q_sq
      |  FROM embeddings WHERE vec_id % 4 = 3)""".stripMargin +
      hierEntryStage("aq") +
      descentStackFrom("a", "aidx", "aserve", "aq", "zent") + s"""
      |SELECT q_id AS vec_id, v AS match_id,
      |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
      |FROM (SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY dist, v) AS rn2
      |  FROM af${ops.KnnGraph.SearchHops} WHERE v % 8 <> 6) t
      |WHERE rn2 = 1 ORDER BY vec_id""".stripMargin

  /** The full-CRUD PQ-serving oracle ([[graft.streaming.StreamAssembly
    * .streamPqServeFull]]): ADC over (base codes ∖ tombstones) ∪
    * insert-fleet codes.
    */
  private def pqServeFullSql: String = {
    val m = ops.Similarity.PqSubspaces
    ivfpqCteStack(" WHERE vec_id % 2 = 0", 2 * ops.Similarity.IvfPqCells,
      2 * ops.Similarity.PqCentroids, "vec_id % 4 = 3", "") +
      insertCodesCtes + s""",
      |allc AS (SELECT vec_id, cell, s, cid FROM rcodes
      |  WHERE vec_id % 8 <> 6
      |  UNION ALL SELECT vec_id, cell, s, cid FROM icodes),
      |adc2 AS (SELECT q.q_id, k.vec_id AS m_id,
      |    ${(0 until m).map(i =>
             s"max(CASE WHEN k.s = $i THEN q.qd END)").mkString("\n  + ")}
      |      AS adc_dist
      |  FROM allc k JOIN qt q
      |    ON q.cell = k.cell AND q.s = k.s AND q.cid = k.cid
      |  GROUP BY 1, 2)
      |SELECT q_id AS vec_id, m_id AS match_id, adc_dist FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY adc_dist ASC, m_id ASC) AS rn
      |  FROM adc2) WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  /** The combined-fold oracle ([[ops.KnnGraph.knnGraphWarmRebuildLive]]):
    * the same accreted seed scored over the LIVE population (edges
    * touching a tombstoned vertex vanish in the inner joins — no edge
    * surgery), one refinement round over the live index.
    */
  private def knnGraphWarmRebuildLiveSql: String =
    warmLiveFoldCtes + """
      |SELECT src AS vec_id, rank, dst AS nbr,
      |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
      |FROM w1 ORDER BY vec_id, rank""".stripMargin

  /** The combined-fold CTE stack shared by the fold gate and the
    * post-fold hier serve: the accreted prefix, the live population
    * `lidx`, the accreted seed scored over it (edges touching a
    * tombstoned vertex vanish in the joins), one refinement round —
    * the folded edge list as `w1`.
    */
  private def warmLiveFoldCtes: String =
    accretedGraphPrefix + s""",
      |lidx AS MATERIALIZED (SELECT vec_id, embedding, sq FROM aidx
      |  WHERE vec_id % 8 <> 6),
      |w0s AS MATERIALIZED (SELECT p.src, p.dst,
      |  a.sq + b.sq - 2 * list_sum([a.embedding[i]::DOUBLE *
      |    b.embedding[i]::DOUBLE for i in range(1, 65)]) AS dist
      |  FROM (SELECT src, dst FROM aserve WHERE src <> dst) p
      |  JOIN lidx a ON a.vec_id = p.src
      |  JOIN lidx b ON b.vec_id = p.dst),
      |w0 AS MATERIALIZED (SELECT src, dst, dist, rn AS rank FROM (
      |  SELECT src, dst, dist, row_number() OVER (
      |    PARTITION BY src ORDER BY dist, dst) AS rn FROM w0s)
      |  WHERE rn <= ${ops.KnnGraph.K}),
      |""".stripMargin + knnRoundSql("w0", "w1", "lidx")

  /** The post-fold hierarchical-serving oracle ([[ops.KnnGraph
    * .graphServeFoldedHier]]): the combined fold (`w1`), fresh
    * md5-random long-range links over the live population, the
    * REFRESHED upper layer built over live merged (base survivors ∪
    * inserts — same md5 coin), the fleet's upper descent picking
    * entries, and the base descent over the folded serve edges.
    */
  private def graphServeFoldedHierSql: String = {
    val h = ops.KnnGraph.SearchHops
    warmLiveFoldCtes + ",\n" +
      initEdgesSql("l", "lidx") + s""",
      |lserve AS MATERIALIZED (SELECT src, dst FROM w1
      |  UNION SELECT dst, src FROM w1
      |  UNION SELECT src, dst FROM linit),
      |fq AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
      |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |              for i in range(1, 65)]) AS q_sq
      |  FROM embeddings WHERE vec_id % 4 = 3)""".stripMargin +
      hierEntryStage("fq",
        " WHERE ((vec_id % 2 = 0 AND vec_id % 8 <> 6)" +
          " OR vec_id % 4 = 1)") +
      descentStackFrom("g", "lidx", "lserve", "fq", "zent") + s"""
      |SELECT q_id AS vec_id, v AS match_id,
      |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
      |FROM gf$h WHERE rn = 1
      |ORDER BY vec_id""".stripMargin
  }

  /** NN-descent k-NN-graph CTE stack (knn_graph_* oracles): md5-seeded
    * init lists, then [[ops.KnnGraph.Rounds]] unrolled refinement
    * rounds — general-neighbor self-join, exact rescoring, per-vertex
    * top-k — replaying [[ops.KnnGraph.graph]] bit-for-bit (same md5
    * draw, same double fold, same (dist, dst) ties). Every CTE is
    * MATERIALIZED: round r+1 references round r four times and DuckDB
    * would otherwise re-expand the subtree exponentially (the
    * pca_power_component lesson). Yields the final graph as `gfin`.
    */
  private val knnGraphCtes: String = knnGraphCteStack("")

  /** [[knnGraphCtes]] with a predicate on the graph's index population
    * (the serving tier builds over the even half).
    */
  /** One NN-descent refinement round as CTEs (general neighbors →
    * candidates → exact rescore over `eCte` → per-vertex top-k) —
    * shared by the cold-build stack and the warm-rebuild oracle.
    */
  private def knnRoundSql(prev: String, cur: String,
                          eCte: String): String =
    s"""${cur}g AS MATERIALIZED (SELECT src, dst FROM $prev
       |  UNION ALL SELECT dst, src FROM $prev),
       |${cur}c AS MATERIALIZED (
       |  SELECT a.dst AS src, b.dst AS dst
       |  FROM ${cur}g a JOIN ${cur}g b ON a.src = b.src
       |  WHERE a.dst <> b.dst
       |  UNION
       |  SELECT src, dst FROM $prev),
       |${cur}s AS MATERIALIZED (SELECT p.src, p.dst,
       |  a.sq + b.sq - 2 * list_sum([a.embedding[i]::DOUBLE *
       |    b.embedding[i]::DOUBLE for i in range(1, 65)]) AS dist
       |  FROM ${cur}c p JOIN $eCte a ON a.vec_id = p.src
       |  JOIN $eCte b ON b.vec_id = p.dst),
       |$cur AS MATERIALIZED (SELECT src, dst, dist, rn AS rank FROM (
       |  SELECT src, dst, dist, row_number() OVER (
       |    PARTITION BY src ORDER BY dist, dst) AS rn FROM ${cur}s)
       |  WHERE rn <= ${ops.KnnGraph.K})""".stripMargin

  /** `pfx` prefixes every generated CTE name so two independent graph
    * builds can coexist in one statement (the hierarchical oracle
    * builds the base-layer graph AND the upper-layer graph); `withKw`
    * drops the leading WITH for a continuation stack.
    */
  /** The md5-random init / long-range-link CTEs over an arbitrary
    * population CTE `eCte(vec_id, embedding, sq)` — the
    * [[ops.KnnGraph.initEdges]] replay (dense rank via the md5 bucket
    * order, neighbor j of vertex i at rank md5("i,j") mod n), split
    * out of [[knnGraphCteStack]] so the folded-serve oracle can give
    * the LIVE population fresh long-range links without rebuilding a
    * whole graph stack. Yields `${pfx}init(src, dst)`.
    */
  private def initEdgesSql(pfx: String, eCte: String): String =
    s"""${pfx}nn AS (SELECT count(*) AS n FROM $eCte),
       |${pfx}ranked AS MATERIALIZED (SELECT vec_id, row_number() OVER (
       |    ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT
       |      % ${ops.KnnGraph.RankBuckets}, vec_id) - 1 AS rnk
       |  FROM $eCte),
       |${pfx}init AS MATERIALIZED (
       |  SELECT DISTINCT d.src, r.vec_id AS dst FROM (
       |  SELECT $eCte.vec_id AS src,
       |    ('0x' || substr(md5($eCte.vec_id::VARCHAR || ',' ||
       |      j.j::VARCHAR), 1, 8))::BIGINT % ${pfx}nn.n AS rnk
       |  FROM $eCte, range(0, ${ops.KnnGraph.K}) j(j), ${pfx}nn) d
       |  JOIN ${pfx}ranked r USING (rnk)
       |  WHERE r.vec_id <> d.src)""".stripMargin

  private def knnGraphCteStack(idxWhere: String, pfx: String = "",
                               withKw: Boolean = true): String = {
    val k = ops.KnnGraph.K
    val rounds = (1 to ops.KnnGraph.Rounds)
      .map(r => knnRoundSql(if (r == 1) s"${pfx}r0" else s"${pfx}r${r - 1}",
        s"${pfx}r$r", s"${pfx}e"))
    val names = s"${pfx}r0" +:
      (1 to ops.KnnGraph.Rounds).map(r => s"${pfx}r$r")
    val kw = if (withKw) "WITH " else ""
    s"""$kw${pfx}e AS MATERIALIZED (SELECT vec_id, embedding,
       |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
       |              for i in range(1, 65)]) AS sq
       |  FROM embeddings$idxWhere),
       |""".stripMargin +
      initEdgesSql(pfx, s"${pfx}e") + s""",
       |${pfx}r0s AS MATERIALIZED (SELECT p.src, p.dst,
       |  a.sq + b.sq - 2 * list_sum([a.embedding[i]::DOUBLE *
       |    b.embedding[i]::DOUBLE for i in range(1, 65)]) AS dist
       |  FROM ${pfx}init p JOIN ${pfx}e a ON a.vec_id = p.src
       |  JOIN ${pfx}e b ON b.vec_id = p.dst),
       |${pfx}r0 AS MATERIALIZED (SELECT src, dst, dist, rn AS rank FROM (
       |  SELECT src, dst, dist, row_number() OVER (
       |    PARTITION BY src ORDER BY dist, dst) AS rn FROM ${pfx}r0s)
       |  WHERE rn <= $k),
       |${rounds.mkString(",\n")},
       |${pfx}gfin AS MATERIALIZED (SELECT * FROM ${names.last})"""
      .stripMargin
  }

  /** The composed-path fleet-recall tail over the ivfpq probe stack:
    * per-probe ADC argmin, exact-L2 ground truth over the full even
    * half (`bfExtra` appends the stratum coin), the probed-cell
    * membership of the exact winner, and the null-safe final counts
    * (a probe whose cells hold no candidates has no adc row — LEFT
    * join from the ground-truth side keeps it counted as a miss).
    */
  private def ivfpqRecallTail(bfExtra: String): String =
    ivfpqRecallCompare(
      """adc1 AS (SELECT q_id, m_id AS adc_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY adc_dist ASC, m_id ASC) AS rn
        |  FROM adc) WHERE rn = 1)""".stripMargin, bfExtra)

  /** The IVFADC+R tail: ADC keeps its top-R per probe, ONLY those R
    * candidates join raw embeddings for the exact-L2 argmin (the
    * re-rank stage), then the same ground-truth compare as
    * [[ivfpqRecallTail]].
    */
  private def ivfpqRerankTail(bfExtra: String, r: Int): String =
    ivfpqRecallCompare(
      s"""rcand AS (SELECT q_id, m_id FROM (
        |  SELECT q_id, m_id, row_number() OVER (
        |    PARTITION BY q_id ORDER BY adc_dist ASC, m_id ASC) AS rn
        |  FROM adc) WHERE rn <= $r),
        |rr AS (SELECT c.q_id, c.m_id,
        |    list_sum([o.embedding[i]::DOUBLE * o.embedding[i]::DOUBLE
        |      for i in range(1, 65)])
        |  - 2 * list_sum([o.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |      for i in range(1, 65)])
        |  + list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |      for i in range(1, 65)]) AS d
        |  FROM rcand c JOIN embeddings b ON b.vec_id = c.m_id
        |    JOIN embeddings o ON o.vec_id = c.q_id),
        |adc1 AS (SELECT q_id, m_id AS adc_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY d ASC, m_id ASC) AS rn
        |  FROM rr) WHERE rn = 1)""".stripMargin, bfExtra)

  /** Shared ground-truth compare over a `adc1(q_id, adc_id)` best-
    * candidate CTE: exact-L2 brute force over the full even index, the
    * probed-cell membership of the exact winner, null-safe final
    * counts.
    */
  private def ivfpqRecallCompare(bestCte: String, bfExtra: String): String =
    s""",
      |$bestCte,
      |bfd AS (SELECT o.vec_id AS q_id, b.vec_id AS b_id,
      |    list_sum([o.embedding[i]::DOUBLE * o.embedding[i]::DOUBLE
      |      for i in range(1, 65)])
      |  - 2 * list_sum([o.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
      |      for i in range(1, 65)])
      |  + list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
      |      for i in range(1, 65)]) AS d
      |  FROM embeddings o JOIN embeddings b
      |    ON o.vec_id % 2 = 1 AND b.vec_id % 2 = 0$bfExtra),
      |bf1 AS (SELECT q_id, b_id AS bf_id FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY q_id ORDER BY d ASC, b_id ASC) AS rn
      |  FROM bfd) WHERE rn = 1),
      |bfc AS (SELECT b.q_id, x.cell FROM bf1 b
      |  JOIN cells x ON x.vec_id = b.bf_id),
      |probed AS (SELECT DISTINCT q_id, cell FROM qt),
      |inprobed AS (SELECT c.q_id, 1 AS hit FROM bfc c
      |  JOIN probed p ON p.q_id = c.q_id AND p.cell = c.cell)
      |SELECT count(*) AS n_queries,
      |  CAST(sum(CASE WHEN a.adc_id IS NOT NULL AND a.adc_id = b.bf_id
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_top1_match,
      |  CAST(sum(CASE WHEN a.adc_id IS NULL OR a.adc_id <> b.bf_id
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
      |  CAST(sum(COALESCE(i.hit, 0)) AS BIGINT) AS n_bf_in_probed
      |FROM bf1 b LEFT JOIN adc1 a USING (q_id)
      |  LEFT JOIN inprobed i USING (q_id)""".stripMargin

  private val kmeansAssignCte: String =
    s"""WITH e AS (SELECT vec_id, embedding,
      |  list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |            for i in range(1, 65)]) AS sq
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, embedding AS cemb, sq AS csq
      |  FROM e WHERE vec_id < ${ops.Similarity.KmeansK}),
      |d1 AS (SELECT e.vec_id, c.cid,
      |  e.sq + c.csq - 2 * list_sum([e.embedding[i]::DOUBLE *
      |    c.cemb[i]::DOUBLE for i in range(1, 65)]) AS dist
      |  FROM e, c0 c),
      |a1 AS (SELECT vec_id, cid FROM (
      |  SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |  FROM d1) WHERE rn = 1),
      |m1 AS (SELECT a1.cid, g.i AS pos,
      |  CAST(SUM(CAST(e.embedding[g.i]::DOUBLE AS DECIMAL(30,15)))
      |    AS DOUBLE) / COUNT(*) AS comp
      |  FROM a1 JOIN e USING (vec_id), range(1, 65) g(i)
      |  GROUP BY a1.cid, g.i),
      |c1 AS (SELECT cid, list(comp ORDER BY pos) AS cemb
      |  FROM m1 GROUP BY cid),
      |c1s AS (SELECT cid, cemb,
      |  list_sum([cemb[i] * cemb[i] for i in range(1, 65)]) AS csq
      |  FROM c1),
      |d2 AS (SELECT e.vec_id, c.cid,
      |  e.sq + c.csq - 2 * list_sum([e.embedding[i]::DOUBLE * c.cemb[i]
      |                               for i in range(1, 65)]) AS dist
      |  FROM e, c1s c),
      |a2 AS (SELECT vec_id, cid, dist FROM (
      |  SELECT vec_id, cid, dist,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |  FROM d2) WHERE rn = 1)""".stripMargin

  private val nearDupLabelCte: String =
    "WITH RECURSIVE " + nearDupPairsBody +
    """,
      |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs),
      |reach(a, b) AS (SELECT a, b FROM edges
      |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |lab AS (SELECT a AS node, least(a, min(b)) AS label
      |  FROM reach GROUP BY a)""".stripMargin

  /** The cluster aggregate both CC algorithms must produce (same
    * fixpoint, so star contraction reuses the propagation oracle).
    */
  private val clustersFromLabels: String = nearDupLabelCte +
    """
      |SELECT label AS cluster, count(*) AS n_members, max(node) AS max_doc
      |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin

  def oracleSql: Map[String, String] = oracleSqlBase +
    // the custom-plan as-of runs against the IDENTICAL oracle as the
    // composed form — one SQL text, two engine implementations behind it
    ("asof_custom_plan" -> oracleSqlBase("asof_events_orders"))

  /** simpleLinearRegression parity: five DECIMAL sufficient
    * statistics, closed-form slope/intercept as sign-split nonnegative
    * integral divisions (floor(value*1e6) is one IEEE multiply).
    * Shared by the batch query and its additive-partials streaming
    * drain, whose folded result is bit-identical by construction.
    */
  private lazy val linregTrendSql: String =
    ("""WITH t0 AS (SELECT min(CAST(epoch_us(ts::TIMESTAMP) AS BIGINT))
        |    AS t0 FROM events),
        |xy AS (SELECT event_type,
        |  CAST((CAST(epoch_us(ts::TIMESTAMP) AS BIGINT)
        |    - (SELECT t0 FROM t0)) // 3600000000 AS HUGEINT) AS x,
        |  CAST(floor(value * 1e6) AS HUGEINT) AS y FROM events),
        |s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |  sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |  sum(x * x) AS sxx FROM xy GROUP BY 1),
        |d AS (SELECT event_type, n, n * sxy - sx * sy AS num,
        |  n * sxx - sx * sx AS den, sy * sxx - sx * sxy AS inum FROM s)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN den = 0 THEN NULL
        |    WHEN num >= 0 THEN CAST(num * 1000000 // den AS BIGINT)
        |    ELSE -CAST((-num) * 1000000 // den AS BIGINT) END AS slope_ppm,
        |  CASE WHEN den = 0 THEN NULL
        |    WHEN inum >= 0 THEN CAST(inum // den AS BIGINT)
        |    ELSE -CAST((-inum) // den AS BIGINT) END AS icept_micro
        |FROM d ORDER BY event_type""".stripMargin)

  /** Power-iteration CTE stack shared by the PCA oracle and the
    * streaming drift probe's replay: quantize -> center -> Gram ->
    * PcaRounds max-abs-normalized rounds, all MATERIALIZED (inlined
    * CTEs re-expand the Gram subtree exponentially). `where` filters
    * the training rows (the drift model trains on the even half).
    */
  private def pcaPowerCtes(where: String): String =
    (s"""WITH x AS (SELECT vec_id, g.i AS i,
      |  CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1e6) AS HUGEINT)
      |    AS xq
      |  FROM embeddings, range(1, 65) g(i)$where),
      |mu AS (SELECT i, CASE WHEN sum(xq) >= 0
      |    THEN sum(xq) // count(*)
      |    ELSE -((-sum(xq)) // count(*)) END AS mu
      |  FROM x GROUP BY 1),
      |c AS (SELECT x.vec_id, x.i, x.xq - mu.mu AS c
      |  FROM x JOIN mu ON x.i = mu.i),
      |g AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.c * b.c) AS g
      |  FROM c a JOIN c b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      |v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS v
      |  FROM range(1, 65) g(i))""".stripMargin +
    (1 to ops.Similarity.PcaRounds).map { k =>
      val pv = s"v${k - 1}"
      s""",
      |w$k AS MATERIALIZED (SELECT g.i AS i, sum(g.g * $pv.v) AS w
      |  FROM g JOIN $pv ON g.j = $pv.i GROUP BY 1),
      |m$k AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w$k),
      |v$k AS MATERIALIZED (SELECT i, CASE WHEN w >= 0
      |    THEN CAST(w * 1000000 // (SELECT m FROM m$k) AS HUGEINT)
      |    ELSE -CAST((-w) * 1000000 // (SELECT m FROM m$k) AS HUGEINT)
      |    END AS v FROM w$k)""".stripMargin
    }.mkString)

  /** The TWS sessionizer's batch oracle (window-function
    * sessionization), shared verbatim by the crash-recovery sibling
    * `stream_tws_restart` — the recovered drain must hash identically.
    */
  private val twsSessionsOracle: String =
    """WITH g AS (SELECT user_id, ts, value,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |       OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts) OVER w::TIMESTAMP)
      |          > 1800000000
      |  THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts, value,
      |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT)
      |    AS sid FROM g)
      |SELECT user_id, min(ts)::TIMESTAMP AS session_start,
      |count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "rollup_hourly" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
        |count(*) AS order_count, round(sum(value), 2) AS total_revenue
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rollup_daily" ->
      """SELECT (ts::DATE) AS date, event_type,
        |count(*) AS order_count, round(sum(value), 2) AS total_revenue
        |FROM events WHERE event_type <> 'error'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // CAST(sum(int) AS BIGINT) throughout: DuckDB widens integer sum() to
    // HUGEINT (int128) while Spark emits BIGINT; values are equal but the
    // driver hashes the byte encoding, so the cast is required for parity.
    "rollup_compact" ->
      """SELECT hour, event_type, CAST(sum(pc) AS BIGINT) AS order_count,
        |round(sum(pv), 2) AS total_revenue
        |FROM (
        |  SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
        |         event_id % 7 AS block, count(*) AS pc, sum(value) AS pv
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "global_totals" ->
      """SELECT count(*) AS total_orders, round(sum(value), 2) AS total_revenue
        |FROM events""".stripMargin,
    "share_of_total" ->
      """SELECT event_type, round(rev, 2) AS revenue,
        |round(rev, 2) * 100.0 / round(sum(rev) OVER (), 2) AS pct
        |FROM (SELECT event_type, sum(value) AS rev FROM events GROUP BY 1)
        |ORDER BY event_type""".stripMargin,
    "revenue_by_type_desc" ->
      """SELECT event_type, round(sum(value), 2) AS revenue
        |FROM events GROUP BY 1 ORDER BY revenue DESC, event_type ASC""".stripMargin,
    "hourly_trend" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, count(*) AS orders,
        |round(sum(value), 2) AS revenue,
        |round(sum(value), 2) / count(*) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "filter_project" ->
      """SELECT event_id, ts::TIMESTAMP AS ts, user_id, round(value, 2) AS value
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "json_extract" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |CAST(sum(k) AS DOUBLE) / count(*) AS avg_k
        |FROM (SELECT event_type,
        |      CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
        |      FROM events)
        |WHERE k IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |sum(l_quantity) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |sum(l_quantity) / count(*) AS avg_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price,
        |CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_top_unshipped" ->
      """SELECT l_orderkey, o_orderdate::TIMESTAMP AS o_orderdate, o_orderpriority,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |AND o_orderdate < TIMESTAMP '1998-06-01'
        |AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate::TIMESTAMP AS o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "window_top_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        |  FROM orders WHERE o_totalprice > 300000.0
        |) WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "window_battery" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER win AS INT) AS rn,
        |  CAST(rank() OVER win AS INT) AS rnk,
        |  CAST(dense_rank() OVER win AS INT) AS drnk,
        |  CAST(ntile(4) OVER win AS INT) AS quartile,
        |  percent_rank() OVER win AS pct_rank,
        |  cume_dist() OVER win AS cume,
        |  lag(o_totalprice) OVER win AS prev_price,
        |  lead(o_totalprice) OVER win AS next_price,
        |  first_value(o_totalprice) OVER winf AS top_price,
        |  last_value(o_totalprice) OVER winf AS bottom_price
        |  FROM orders WHERE o_orderstatus = 'F'
        |  WINDOW win AS (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey),
        |  winf AS (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "cube_counts" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "window_daily_delta" ->
      """SELECT date, revenue, prev_revenue, revenue - prev_revenue AS delta FROM (
        |  SELECT o_orderdate::DATE AS date,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  lag(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 1)
        |    OVER (ORDER BY o_orderdate::DATE) AS prev_revenue
        |  FROM orders GROUP BY 1
        |) ORDER BY date""".stripMargin,
    "set_ops_counts" ->
      """WITH b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 200000.0)
        |SELECT
        |(SELECT count(*) FROM (SELECT k FROM b UNION SELECT k FROM big)) AS n_union,
        |(SELECT count(*) FROM (SELECT k FROM b INTERSECT SELECT k FROM big)) AS n_intersect,
        |(SELECT count(*) FROM (SELECT k FROM b EXCEPT SELECT k FROM big)) AS n_except""".stripMargin,
    "distinct_counts" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
        |count(*) AS n_orders FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "scalar_funcs" ->
      """SELECT o_orderkey,
        |date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
        |o_orderdate::DATE AS order_date,
        |CAST(year(o_orderdate) AS INT) AS y,
        |CAST(month(o_orderdate) AS INT) AS m,
        |strftime(o_orderdate, '%Y%m') AS yyyymm,
        |(o_orderdate + INTERVAL 365 DAY)::TIMESTAMP AS ttl_expiry,
        |upper(o_orderpriority) AS prio_upper,
        |substring(o_orderpriority, 1, 1) AS prio_code,
        |CAST(length(o_orderstatus) AS INT) AS status_len,
        |concat('ORD-', lpad(CAST(o_orderkey AS VARCHAR), 10, '0')) AS order_tag,
        |round(o_totalprice, 2) AS price_rounded
        |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin,
    "ingest_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
        |max(o_orderdate)::TIMESTAMP AS max_date
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |count(*) AS n_copies FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)])) AS s
        |  FROM tok WHERE len(ws) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
        |FROM shared JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    // containment brute-forced: the prefix filter is recall-lossless by
    // the prefix theorem, so the oracle needs no filtering; the score
    // and threshold are exact integers
    "dedup_containment" ->
      (s"""WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |   for i in range(1, len(ws)-1)])) AS s
        |  FROM tok WHERE len(ws) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS shared
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a AS contained, doc_b AS container,
        |  CAST(sa.n AS BIGINT) AS n_contained, shared,
        |  CAST(shared * 1000000 // sa.n AS BIGINT) AS containment_ppm
        |FROM shared JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE (sa.n < sb.n OR (sa.n = sb.n AND doc_a < doc_b))
        |  AND shared * 1000000 // sa.n >= ${ops.Dedup.ContainTauPpm}
        |ORDER BY contained, container""".stripMargin),
    "dedup_minhash" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)])) AS s
        |  FROM tok WHERE len(ws) >= 3),
        |hx AS (SELECT doc_id,
        |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS h1,
        |  (('0x' || substr(md5(s), 13, 12))::BIGINT | 1) AS h2 FROM sh),
        |h AS (SELECT doc_id, i, min(h1 + i * h2) AS minh
        |  FROM hx, range(0, 12) t(i) GROUP BY 1, 2),
        |bs AS (SELECT doc_id, (i // 2) AS band,
        |  string_agg(minh::VARCHAR, '|' ORDER BY i) AS bsig
        |  FROM h GROUP BY doc_id, (i // 2)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bs a JOIN bs b ON a.band = b.band AND a.bsig = b.bsig
        |  AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |shared AS (SELECT doc_a, doc_b, count(*) AS shared FROM cand
        |  JOIN sh sa ON sa.doc_id = doc_a
        |  JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |CAST(shared AS DOUBLE) / (za.n + zb.n - shared) AS jaccard
        |FROM shared JOIN sizes za ON doc_a = za.doc_id
        |JOIN sizes zb ON doc_b = zb.doc_id
        |WHERE CAST(shared AS DOUBLE) / (za.n + zb.n - shared) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    // incremental ExactSubstr: odd half streamed as "today's crawl", even
    // half is the static history gram index; per-doc coverage depends only
    // on the static index (stateless probe), so the batch odd-vs-even
    // probe IS the oracle
    "stream_substr_probe" -> {
      val k = ops.Dedup.SpanK; val km1 = k - 1
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |d AS (SELECT doc_id, len(ws) AS n_tok, ws
        |  FROM tok WHERE len(ws) >= $k AND doc_id % 2 = 1),
        |hd AS (SELECT doc_id, len(ws) AS n_tok, ws
        |  FROM tok WHERE len(ws) >= $k AND doc_id % 2 = 0),
        |hist AS (SELECT DISTINCT
        |    array_to_string(ws[u.i : u.i + $km1], ' ') AS gram
        |  FROM hd, UNNEST(generate_series(1, n_tok - $km1)) AS u(i)),
        |g AS (SELECT doc_id, u.i AS start,
        |    array_to_string(ws[u.i : u.i + $km1], ' ') AS gram
        |  FROM d, UNNEST(generate_series(1, n_tok - $km1)) AS u(i)),
        |cov AS (SELECT DISTINCT doc_id, v.p
        |  FROM g, UNNEST(generate_series(start, start + $km1)) AS v(p)
        |  WHERE gram IN (SELECT gram FROM hist))
        |SELECT d.doc_id, CAST(d.n_tok AS BIGINT) AS n_tok,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_dup_tok
        |FROM d LEFT JOIN (SELECT doc_id, count(*) AS n FROM cov
        |  GROUP BY 1) c USING (doc_id)
        |ORDER BY doc_id""".stripMargin
    },
    // online probe: odd half streamed, even half is the static banded
    // index; per-doc result independent of batch boundaries (stateless
    // probe), so the batch band join IS the oracle
    "stream_dedup_probe" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)])) AS s
        |  FROM tok WHERE len(ws) >= 3),
        |hx AS (SELECT doc_id,
        |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS h1,
        |  (('0x' || substr(md5(s), 13, 12))::BIGINT | 1) AS h2 FROM sh),
        |h AS (SELECT doc_id, i, min(h1 + i * h2) AS minh
        |  FROM hx, range(0, 12) t(i) GROUP BY 1, 2),
        |bs AS (SELECT doc_id, (i // 2) AS band,
        |  string_agg(minh::VARCHAR, '|' ORDER BY i) AS bsig
        |  FROM h GROUP BY doc_id, (i // 2))
        |SELECT s.doc_id,
        |  CAST(count(DISTINCT i.doc_id) AS BIGINT) AS n_index_matches,
        |  CAST(min(i.doc_id) AS BIGINT) AS first_match
        |FROM bs s JOIN bs i ON s.band = i.band AND s.bsig = i.bsig
        |  AND s.doc_id % 2 = 1 AND i.doc_id % 2 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_simhash" ->
      """WITH tok AS (SELECT DISTINCT doc_id, w FROM
        |  (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)),
        |h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM tok),
        |bits AS (SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS v
        |  FROM h, range(0, 32) t(j) GROUP BY 1, 2),
        |fp AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
        |    AS simhash FROM bits GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY 1, 2""".stripMargin,
    "dedup_simhash_digest" ->
      """WITH tok AS (SELECT DISTINCT doc_id, w FROM
        |  (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)),
        |h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM tok),
        |bits AS (SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS v
        |  FROM h, range(0, 32) t(j) GROUP BY 1, 2),
        |fp AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
        |    AS simhash FROM bits GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
        |SELECT doc_a % 64 AS bucket, count(*) AS n_pairs,
        |CAST(sum(hamming) AS BIGINT) AS sum_hamming,
        |CAST(sum(('0x' || substr(md5(doc_a::VARCHAR || ',' || doc_b::VARCHAR
        |  || ',' || hamming::VARCHAR), 1, 8))::BIGINT) AS BIGINT) AS checksum,
        |min(doc_b) AS min_doc_b, max(doc_b) AS max_doc_b
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_embedding_cosine" ->
      """WITH e AS (SELECT vec_id, embedding,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |          for i in range(1, 65)]) / (a.nrm * b.nrm) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |      for i in range(1, 65)]) / (a.nrm * b.nrm) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    "sim_topk_bruteforce" ->
      """WITH q AS (SELECT embedding AS q_emb,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS q_nrm
        |  FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |list_sum([e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE
        |          for i in range(1, 65)]) /
        |(sqrt(list_sum([e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
        |                for i in range(1, 65)])) * q.q_nrm) AS cosine
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    // LSH plane signs derive from md5("p,d") first-byte parity in BOTH
    // engines; per-plane dots fold in dim order, so signatures (and thus
    // the banded any-band-agrees candidate set) are bit-identical.
    "sim_ann_lsh" ->
      """WITH sigs AS (SELECT vec_id, label, embedding,
        |  list_sum([
        |    CASE WHEN list_sum([
        |      CASE WHEN (('0x' || substr(md5(p::VARCHAR || ',' ||
        |        (i-1)::VARCHAR), 1, 2))::INT & 1) = 0
        |      THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
        |      for i in range(1, 65)]) > 0
        |    THEN (1::BIGINT << p) ELSE 0 END
        |    for p in range(0, 63)])::BIGINT AS sig
        |  FROM embeddings),
        |q AS (SELECT embedding AS q_emb, sig AS q_sig,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS q_nrm
        |  FROM sigs WHERE vec_id = 0)
        |SELECT s.vec_id, s.label,
        |list_sum([s.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE
        |          for i in range(1, 65)]) /
        |(sqrt(list_sum([s.embedding[i]::DOUBLE * s.embedding[i]::DOUBLE
        |                for i in range(1, 65)])) * q.q_nrm) AS cosine
        |FROM sigs s, q WHERE s.vec_id <> 0
        |  AND list_sum([CASE WHEN ((xor(s.sig, q.q_sig) >> (3*t)) & 7) = 0
        |                THEN 1 ELSE 0 END for t in range(0, 21)]) > 0
        |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    // banded LSH: 63 planes in 21 bands of 3; a candidate pair agrees on
    // at least one 3-bit band (the Spark side emits each such pair exactly
    // once, so the single any-band-agrees join is set-identical)
    "dedup_embedding_lsh" ->
      """WITH sigs AS (SELECT vec_id, embedding,
        |  list_sum([
        |    CASE WHEN list_sum([
        |      CASE WHEN (('0x' || substr(md5(p::VARCHAR || ',' ||
        |        (i-1)::VARCHAR), 1, 2))::INT & 1) = 0
        |      THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
        |      for i in range(1, 65)]) > 0
        |    THEN (1::BIGINT << p) ELSE 0 END
        |    for p in range(0, 63)])::BIGINT AS sig,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |          for i in range(1, 65)]) / (a.nrm * b.nrm) AS cosine
        |FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
        |  AND list_sum([CASE WHEN ((xor(a.sig, b.sig) >> (3*t)) & 7) = 0
        |                THEN 1 ELSE 0 END for t in range(0, 21)]) > 0
        |WHERE list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |                for i in range(1, 65)]) / (a.nrm * b.nrm) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    // bounded-work banding replay: the production 7×8-bit scheme (256
    // buckets/band), buckets above the cap skipped (exact integer bucket
    // counts both engines), pair set deduped via DISTINCT over the
    // capped candidate volume (shared CTE builder with its recall audit)
    "dedup_embedding_lsh_capped" ->
      s"""WITH $lshCappedCoreSql
        |SELECT vec_a, vec_b, cosine FROM capped
        |ORDER BY vec_a, vec_b""".stripMargin,
    // capped-scheme confusion matrix vs the brute-force ground truth —
    // same capped CTEs, the lsh_recall_eval audit shape plus integer
    // recall ppm
    "lsh_capped_recall" ->
      s"""WITH $lshCappedCoreSql,
        |exact AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
        |  WHERE list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |                  for i in range(1, 65)]) / (a.nrm * b.nrm) >= 0.4),
        |ne AS (SELECT count(*) AS n_exact FROM exact),
        |nc AS (SELECT count(*) AS n_cand FROM capped),
        |ntp AS (SELECT count(*) AS tp FROM capped c
        |  JOIN exact e ON c.vec_a = e.vec_a AND c.vec_b = e.vec_b)
        |SELECT CAST(n_exact AS BIGINT) AS n_exact,
        |CAST(n_cand AS BIGINT) AS n_cand, CAST(tp AS BIGINT) AS tp,
        |CAST(n_exact - tp AS BIGINT) AS fn,
        |CAST(CASE WHEN n_exact = 0 THEN 1000000
        |     ELSE (tp * 1000000) // n_exact END AS BIGINT) AS recall_ppm
        |FROM ne, nc, ntp""".stripMargin,
    // multi-probe banding replay: home bucket + one flipped band bit
    // per probe, targets cap-filtered, pairs canonicalized before the
    // DISTINCT (asymmetric probe relation), exact-cosine verify
    "dedup_embedding_lsh_multiprobe" ->
      s"""WITH $lshMultiprobeCoreSql
        |SELECT vec_a, vec_b, cosine FROM multi
        |ORDER BY vec_a, vec_b""".stripMargin,
    // capped vs multiprobe confusion rows against ONE exact ground
    // truth: what the bounded (1+bandBits)x probe growth buys
    "lsh_multiprobe_recall" ->
      s"""WITH $lshMultiprobeCoreSql,
        |exact AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
        |  WHERE list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |                  for i in range(1, 65)]) / (a.nrm * b.nrm) >= 0.4),
        |ne AS (SELECT count(*) AS n_exact FROM exact),
        |ncc AS (SELECT count(*) AS n_cand FROM capped),
        |tpc AS (SELECT count(*) AS tp FROM capped c
        |  JOIN exact e ON c.vec_a = e.vec_a AND c.vec_b = e.vec_b),
        |ncm AS (SELECT count(*) AS n_cand FROM multi),
        |tpm AS (SELECT count(*) AS tp FROM multi m
        |  JOIN exact e ON m.vec_a = e.vec_a AND m.vec_b = e.vec_b)
        |SELECT * FROM (
        |SELECT 'capped' AS variant, CAST(n_exact AS BIGINT) AS n_exact,
        |  CAST(n_cand AS BIGINT) AS n_cand, CAST(tp AS BIGINT) AS tp,
        |  CAST(n_exact - tp AS BIGINT) AS fn,
        |  CAST(CASE WHEN n_exact = 0 THEN 1000000
        |       ELSE (tp * 1000000) // n_exact END AS BIGINT) AS recall_ppm
        |FROM ne, ncc, tpc
        |UNION ALL
        |SELECT 'multiprobe', CAST(n_exact AS BIGINT),
        |  CAST(n_cand AS BIGINT), CAST(tp AS BIGINT),
        |  CAST(n_exact - tp AS BIGINT),
        |  CAST(CASE WHEN n_exact = 0 THEN 1000000
        |       ELSE (tp * 1000000) // n_exact END AS BIGINT)
        |FROM ne, ncm, tpm)
        |ORDER BY variant""".stripMargin,
    "text_token_counts" ->
      """SELECT doc_id, lang,
        |CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
        |CAST(len(list_distinct(string_split(text,' '))) AS INT) AS n_distinct_tokens,
        |CAST(length(text) AS INT) AS n_chars_measured,
        |CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subword_est
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH base AS (SELECT doc_id, text, string_split(text,' ') AS ws FROM documents)
        |SELECT doc_id,
        |CAST(len(ws) AS INT) AS n_tokens,
        |len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is'], w)))::DOUBLE / len(ws) AS stopword_ratio,
        |len(list_distinct(ws))::DOUBLE / len(ws) AS distinct_ratio,
        |(length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')))::DOUBLE / length(text) AS punct_ratio,
        |length(text)::DOUBLE / len(ws) AS avg_token_len,
        |(len(list_distinct(ws))::DOUBLE / len(ws)) * 0.5 +
        |least(len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is'], w)))::DOUBLE / len(ws) * 2.0, 1.0) * 0.3 +
        |(CASE WHEN len(ws) BETWEEN 20 AND 1000 THEN 0.2 ELSE 0.0 END) AS quality_score
        |FROM base ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH base AS (SELECT doc_id, lang, string_split(text,' ') AS ws FROM documents),
        |pred AS (SELECT lang,
        |  CASE WHEN len(list_filter(ws, w -> list_contains(['the','a','of','and'], w)))::DOUBLE / len(ws) >= 0.05 THEN 'en'
        |       WHEN len(list_filter(ws, w -> list_contains(['table','row','column','value'], w)))::DOUBLE / len(ws) >= 0.15 THEN 'data'
        |       ELSE 'other' END AS predicted
        |  FROM base)
        |SELECT lang, predicted, count(*) AS n FROM pred
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_fingerprint" ->
      """SELECT md5(array_to_string(string_split_regex(lower(text), '\s+'), ' '))
        |  AS fingerprint,
        |min(doc_id) AS first_doc, count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // Multimodal generic plumbing over the REAL codecs (BMP doc_id%3=0,
    // WAV =1, AVI =2): dims / sample counts / frame geometry are affine
    // mod forms of doc_id (Multimodal.bmpWidthOf etc.), so the oracle
    // verifies the Spark-side encode→sniff→format-walk→decode round-trip
    // without seeing bytes. image: w=8+id%9, h=4+id%7, ch=3, dur=0,
    // body=rowSize(w)*h. audio: n=64+id%100 PCM-16 @8kHz → ch=1,
    // dur=n//8 ms, body=2n. video: w=8+id%5, h=4+id%4, nf=2+id%5,
    // msPf=20+id%30 → ch=3, dur=nf*msPf, body=nf*rowSize(w)*h.
    "mm_decode_stats" -> mmDecodeStatsSql,
    // the SAME totals arrived at through the streaming path: per-batch
    // real-codec decode partials folded on readback ⇒ identical oracle
    "stream_media_decode" -> mmDecodeStatsSql,
    // kept frames = ceil(nf/step), last ts = last kept index × msPf
    "mm_frame_counts" -> {
      val step = graft.multimodal.Multimodal.AviSampleStep
      s"""SELECT doc_id,
        |CAST(((2 + doc_id % 5) + $step - 1) // $step AS BIGINT) AS n_frames,
        |CAST(((((2 + doc_id % 5) + $step - 1) // $step - 1) * $step)
        |  * (20 + doc_id % 30) AS BIGINT) AS last_frame_ms
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id""".stripMargin
    },
    "mm_resize_stats" ->
      """WITH m AS (SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS media_type,
        |  CASE doc_id % 3 WHEN 0 THEN 224 WHEN 1 THEN 0
        |    ELSE 8 + doc_id % 5 END AS w,
        |  CASE doc_id % 3 WHEN 0 THEN 224 WHEN 1 THEN 0
        |    ELSE 4 + doc_id % 4 END AS h
        |  FROM documents)
        |SELECT media_type, count(*) AS n,
        |CAST(sum(w) AS BIGINT) AS sum_width,
        |CAST(sum(h) AS BIGINT) AS sum_height
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "sessions" ->
      """WITH g AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts) OVER w::TIMESTAMP)
        |          > 1800000000
        |  THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, value,
        |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT)
        |    AS sid FROM g)
        |SELECT user_id, sid, min(ts)::TIMESTAMP AS session_start,
        |count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "semi_anti_counts" ->
      """WITH wb AS (SELECT c_mktsegment, count(*) AS n_with_big_order
        |  FROM customer c WHERE EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0)
        |  GROUP BY 1),
        |wo AS (SELECT c_mktsegment, count(*) AS n_without_orders
        |  FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey)
        |  GROUP BY 1)
        |SELECT coalesce(wb.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
        |coalesce(n_with_big_order, 0) AS n_with_big_order,
        |coalesce(n_without_orders, 0) AS n_without_orders
        |FROM wb FULL OUTER JOIN wo USING (c_mktsegment)
        |ORDER BY 1""".stripMargin,
    "outer_join_order_stats" ->
      """SELECT c_mktsegment,
        |count(DISTINCT c_custkey) AS n_customers,
        |count(o_custkey) AS n_orders,
        |count(CASE WHEN o_custkey IS NULL THEN 1 END)
        |  AS n_customers_no_orders,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the built-in streaming session_window aggregate drains the same
    // sentinel-flushed staged stream as stream_sessions_tws; its oracle is
    // the SAME window-function SQL the batch session_windows query checks
    // against (>= split mirrors the half-open window contract)
    "stream_session_windows" ->
      """WITH o AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |    OR epoch_us(ts) - epoch_us(lag(ts) OVER
        |      (PARTITION BY user_id ORDER BY ts)) >= 1800000000
        |  THEN 1 ELSE 0 END AS new_s FROM events),
        |s AS (SELECT user_id, ts, value, sum(new_s) OVER
        |  (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, min(ts)::TIMESTAMP AS session_start,
        |(max(ts) + INTERVAL 30 MINUTE)::TIMESTAMP AS session_end,
        |count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // the watermarked (state-EVICTING) stream-stream join replays the
    // events table in time order, so no row is late, correct eviction only
    // drops unmatchable state (2 h delay > 30 min tolerance), and the
    // batch join is the exact oracle — this pins the eviction machinery
    // itself to values (the unwatermarked sibling pins join semantics)
    "stream_join_wm_evicting" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase')
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |CAST(a.user_id % 16 AS BIGINT) AS user_bucket,
        |count(*) AS n_pairs, count(DISTINCT a.user_id) AS n_users
        |FROM p a JOIN p b ON a.user_id = b.user_id
        |  AND epoch_us(b.ts::TIMESTAMP) > epoch_us(a.ts::TIMESTAMP)
        |  AND epoch_us(b.ts::TIMESTAMP)
        |      <= epoch_us(a.ts::TIMESTAMP) + 1800000000
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // the LEFT OUTER stream-stream join: null rows may only emit once the
    // watermark proves no match can arrive; the sentinel-flushed drain
    // makes the batch LEFT JOIN exact (tolerance interpolated from
    // StreamAssembly.JoinTolMin — operator and oracle share the constant)
    "stream_join_left_outer" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT a.user_id AS user_a, b.event_id AS event_b
        |  FROM p a LEFT JOIN p b ON a.user_id = b.user_id
        |    AND epoch_us(b.ts::TIMESTAMP) > epoch_us(a.ts::TIMESTAMP)
        |    AND epoch_us(b.ts::TIMESTAMP) <= epoch_us(a.ts::TIMESTAMP)
        |      + ${graft.streaming.StreamAssembly.JoinTolMin * 60000000L})
        |SELECT CAST(user_a % 16 AS BIGINT) AS user_bucket,
        |  count(*) AS n_rows,
        |  CAST(count(event_b) AS BIGINT) AS n_matched,
        |  CAST(count(*) - count(event_b) AS BIGINT) AS n_unmatched,
        |  count(DISTINCT user_a) AS n_users
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // the FULL OUTER stream-stream join: null rows on BOTH sides are
    // watermark-gated; the sentinel flush makes the batch FULL JOIN exact
    "stream_join_full_outer" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT a.user_id AS user_a, a.event_id AS event_a,
        |    b.user_id AS user_b, b.event_id AS event_b
        |  FROM p a FULL JOIN p b ON a.user_id = b.user_id
        |    AND epoch_us(b.ts::TIMESTAMP) > epoch_us(a.ts::TIMESTAMP)
        |    AND epoch_us(b.ts::TIMESTAMP) <= epoch_us(a.ts::TIMESTAMP)
        |      + ${graft.streaming.StreamAssembly.JoinTolMin * 60000000L})
        |SELECT CAST(coalesce(user_a, user_b) % 16 AS BIGINT) AS user_bucket,
        |  count(*) AS n_rows,
        |  CAST(sum(CASE WHEN event_a IS NOT NULL AND event_b IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  CAST(sum(CASE WHEN event_b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_no_followup,
        |  CAST(sum(CASE WHEN event_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_no_prior
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // update-mode running totals upserted into a keyed sink; the
    // keep-latest readback must equal the plain batch aggregate
    "stream_update_upsert" ->
      """SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
        |count(*) AS n_events,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // chained stateful pipeline: replayed-twice events deduped then
    // day-windowed in ONE streaming query; DISTINCT → GROUP BY is exact
    "stream_dedup_window" ->
      """WITH d AS (SELECT DISTINCT event_id, ts, event_type, value
        |  FROM events)
        |SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
        |count(*) AS n_events,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS total_value
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // dynamic-gap sessions: the session end is the running MAX of
    // per-event ts + gap(event) deadlines; an event starting at or past
    // that max opens a new session (the fixed-gap oracle's >= boundary)
    "stream_sessions_dynamic_gap" -> {
      val pUs = graft.streaming.StreamAssembly.DynGapPurchaseMin * 60000000L
      val dUs = graft.streaming.StreamAssembly.DynGapDefaultMin * 60000000L
      s"""WITH e AS (SELECT user_id, event_id, ts, value,
        |    epoch_us(ts::TIMESTAMP) AS t,
        |    CASE WHEN event_type = 'purchase' THEN $pUs
        |      ELSE $dUs END AS gap_us
        |  FROM events),
        |m AS (SELECT *, max(t + gap_us) OVER (PARTITION BY user_id
        |    ORDER BY t, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM e),
        |s AS (SELECT *, CAST(sum(CASE WHEN prev_end IS NULL
        |      OR t >= prev_end THEN 1 ELSE 0 END) OVER (
        |    PARTITION BY user_id ORDER BY t, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM m)
        |SELECT user_id, min(ts)::TIMESTAMP AS session_start,
        |  count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |    AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
    },
    // LEFT SEMI stream-stream join: the batch EXISTS subquery mirrors
    // the semi state's emit-once-iff-matched contract exactly
    "stream_join_left_semi" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |s AS (SELECT a.user_id, a.event_id FROM p a
        |  WHERE EXISTS (SELECT 1 FROM p b WHERE b.user_id = a.user_id
        |    AND epoch_us(b.ts::TIMESTAMP) > epoch_us(a.ts::TIMESTAMP)
        |    AND epoch_us(b.ts::TIMESTAMP) <= epoch_us(a.ts::TIMESTAMP)
        |      + ${graft.streaming.StreamAssembly.JoinTolMin * 60000000L}))
        |SELECT CAST(user_id % 16 AS BIGINT) AS user_bucket,
        |  count(*) AS n_rows, count(DISTINCT user_id) AS n_users
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // two disjoint staged sources union back to exactly the events
    // table, so the plain batch aggregate is the oracle
    "stream_union_sources" ->
      """SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
        |count(*) AS n_events,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // sliding windows reconstructed exactly: Spark aligns slide
    // boundaries to absolute epoch microseconds, so each event's 4
    // overlapping 1-day/6-hour windows are floor(epoch_us/slide)·slide
    // − k·slide for k in 0..3 — pure integer arithmetic in both engines
    "stream_sliding_counts" ->
      """WITH k(k) AS (VALUES (0), (1), (2), (3)),
        |w AS (SELECT make_timestamp(
        |    ((epoch_us(ts::TIMESTAMP) // 21600000000) - k) * 21600000000)
        |      AS win_start,
        |    event_type, value
        |  FROM events, k)
        |SELECT win_start, event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |    AS total_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // stream-static enrichment: the per-batch broadcast join is
    // stateless, so the batch join + aggregate is the exact oracle
    "stream_static_enrich" ->
      """SELECT date_trunc('day', e.ts)::TIMESTAMP AS day, c.c_mktsegment,
        |  count(*) AS n_events,
        |  round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |    AS total_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the transformWithState timer sessionizer drains deterministically
    // (watermark wider than the fixture span + far-future sentinel fires
    // every close timer), so the batch window-function sessionization IS
    // its oracle — this pins the Spark-4 stateful API's late-event merge
    // semantics to values, not just specs
    "stream_sessions_tws" -> twsSessionsOracle,
    // crash-recovery sibling: a drain killed and resumed mid-stream must
    // land on the byte-identical session table
    "stream_tws_restart" -> twsSessionsOracle,
    // the streaming micro-batch partials path compacts to exactly the batch
    // hourly rollup (counts + DECIMAL(18,6) sums are additive), so the batch
    // SQL IS its oracle
    "stream_partials_hourly" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
        |count(*) AS order_count,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS total_revenue
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rollup_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |sum(l_quantity) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "part_promo_share" ->
      """SELECT
        |CAST(sum(CAST(CASE WHEN p_type LIKE 'PROMO%'
        |  THEN l_extendedprice*(1-l_discount) ELSE 0 END AS DECIMAL(18,6)))
        |  AS DOUBLE) AS promo_revenue,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6)))
        |  AS DOUBLE) AS total_revenue,
        |CAST(sum(CAST(CASE WHEN p_type LIKE 'PROMO%'
        |  THEN l_extendedprice*(1-l_discount) ELSE 0 END AS DECIMAL(18,6)))
        |  AS DOUBLE) * 100.0 /
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6)))
        |  AS DOUBLE) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |  AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin,
    "topk_per_segment" ->
      """WITH ranked AS (SELECT c_mktsegment, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, o_orderkey, o_totalprice FROM ranked
        |WHERE rk <= 3 ORDER BY c_mktsegment, o_orderkey""".stripMargin,
    // DuckDB's native ASOF JOIN is the oracle for the composed
    // union+carry-forward-window implementation
    "asof_events_orders" ->
      """WITH ords AS (SELECT o_custkey, o_orderdate,
        |  max(o_orderkey) AS o_orderkey,
        |  arg_max(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts::TIMESTAMP AS ts, e.event_type,
        |o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_price
        |FROM events e ASOF LEFT JOIN ords o
        |  ON e.user_id = o.o_custkey
        |  AND e.ts::TIMESTAMP >= o.o_orderdate::TIMESTAMP
        |ORDER BY event_id""".stripMargin,
    // self-table as-of via the custom node; view side deduped per
    // (user, ts) with max event_id so ties are definitional
    "asof_last_view" ->
      """WITH vd AS (SELECT user_id AS v_user, ts AS v_ts,
        |  max(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts::TIMESTAMP AS ts,
        |vd.view_event_id, vd.v_ts::TIMESTAMP AS view_ts
        |FROM p ASOF LEFT JOIN vd
        |  ON p.user_id = vd.v_user
        |  AND p.ts::TIMESTAMP >= vd.v_ts::TIMESTAMP
        |ORDER BY p.event_id""".stripMargin,
    "range_join_pairs" ->
      """SELECT a.event_id AS event_a, b.event_id AS event_b,
        |abs(epoch_us(a.ts::TIMESTAMP) - epoch_us(b.ts::TIMESTAMP)) AS delta_us
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND a.event_id < b.event_id
        |  AND abs(epoch_us(a.ts::TIMESTAMP) - epoch_us(b.ts::TIMESTAMP))
        |      <= 3600000000
        |ORDER BY 1, 2""".stripMargin,
    // the custom band-join plan node, gated against the IDENTICAL oracle
    // as its composed (bucket-fan-out) sibling
    "range_join_custom_plan" ->
      """SELECT a.event_id AS event_a, b.event_id AS event_b,
        |abs(epoch_us(a.ts::TIMESTAMP) - epoch_us(b.ts::TIMESTAMP)) AS delta_us
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND a.event_id < b.event_id
        |  AND abs(epoch_us(a.ts::TIMESTAMP) - epoch_us(b.ts::TIMESTAMP))
        |      <= 3600000000
        |ORDER BY 1, 2""".stripMargin,
    "train_test_split" ->
      """SELECT CASE
        |  WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80
        |    THEN 'train'
        |  WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90
        |    THEN 'val'
        |  ELSE 'test' END AS split,
        |lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "value_quantiles" ->
      """SELECT event_type,
        |quantile_cont(value, 0.5) AS p50,
        |quantile_cont(value, 0.9) AS p90,
        |quantile_cont(value, 0.99) AS p99,
        |min(value) AS vmin, max(value) AS vmax
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled,
        |CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 20
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "group_cap" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 50 ORDER BY lang, rk""".stripMargin,
    "pack_sequences" ->
      """WITH d AS (SELECT lang, doc_id,
        |    ceil(n_chars / 4.0)::BIGINT AS est FROM documents),
        |c AS (SELECT lang, est, sum(est) OVER (
        |    PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT lang, CAST((cum - est) // 2048 AS BIGINT) AS bin,
        |count(*) AS n_docs, CAST(sum(est) AS BIGINT) AS sum_est_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "contamination_check" ->
      """WITH d AS (SELECT doc_id, lang, text,
        |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents),
        |sp AS (SELECT doc_id, lang,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  string_split(text, ' ') AS ws FROM d),
        |sh AS (SELECT doc_id, lang, split, unnest(list_distinct(
        |  [ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]
        |   ||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7]
        |   for i in range(1, len(ws) - 6)])) AS s
        |  FROM sp WHERE len(ws) >= 8),
        |tr AS (SELECT DISTINCT s FROM sh WHERE split = 'train'),
        |cont AS (SELECT lang, count(DISTINCT doc_id) AS n_contaminated
        |  FROM sh WHERE split = 'test' AND s IN (SELECT s FROM tr)
        |  GROUP BY 1)
        |SELECT t.lang, t.n_test, coalesce(c.n_contaminated, 0) AS n_contaminated
        |FROM (SELECT lang, count(*) AS n_test FROM sp
        |      WHERE split = 'test' GROUP BY 1) t
        |LEFT JOIN cont c ON t.lang = c.lang
        |ORDER BY t.lang""".stripMargin,
    "sim_ivf" ->
      """WITH nrm AS (SELECT vec_id, label, embedding,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, embedding AS c_emb, nrm AS c_nrm
        |  FROM nrm WHERE vec_id < 16),
        |scored AS (SELECT n.vec_id, n.label, n.embedding, n.nrm, c.cid,
        |  list_sum([n.embedding[i]::DOUBLE * c.c_emb[i]::DOUBLE
        |            for i in range(1, 65)]) / (n.nrm * c.c_nrm) AS ccos
        |  FROM nrm n, cents c),
        |assigned AS (SELECT vec_id, label, embedding, nrm, cid AS cell FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM scored) WHERE rn = 1),
        |qcells AS (SELECT cid FROM scored WHERE vec_id = 0
        |  ORDER BY ccos DESC, cid ASC LIMIT 4),
        |q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM nrm WHERE vec_id = 0)
        |SELECT a.vec_id, a.label,
        |list_sum([a.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE
        |          for i in range(1, 65)]) / (a.nrm * q.q_nrm) AS cosine
        |FROM assigned a, q
        |WHERE a.vec_id <> 0 AND a.cell IN (SELECT cid FROM qcells)
        |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    // online IVF probe: odd half streamed, even half indexed; stateless
    // per-batch probe ⇒ the batch IVF top-1 over the two halves is the
    // oracle; cosine doubles hash via the vec_dot fold precedent
    "stream_ann_probe" -> (annProbeCtes +
      "\nSELECT q_id AS vec_id, m_id AS match_id, cosine FROM ivf1 " +
      "ORDER BY vec_id"),
    // fleet-level probe recall: every odd query's IVF top-1 vs its exact
    // brute-force top-1 over the even half; counts only
    "ann_probe_recall" -> (annProbeCtes +
      """,
        |bfcand AS (SELECT q.vec_id AS q_id, a.m_id,
        |  list_sum([q.embedding[j]::DOUBLE * a.m_emb[j]::DOUBLE
        |            for j in range(1, 65)]) / (q.nrm * a.m_nrm) AS cosine
        |  FROM qs q, assigned a),
        |bf AS (SELECT q_id, m_id AS bf_id, cosine AS bf_cos FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cosine DESC, m_id ASC) AS rn
        |  FROM bfcand) WHERE rn = 1)
        |SELECT count(*) AS n_queries,
        |  CAST(sum(CASE WHEN i.m_id = b.bf_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top1_match,
        |  CAST(sum(CASE WHEN i.m_id <> b.bf_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_missed,
        |  CAST(sum(CASE WHEN b.bf_cos - i.cosine <= 1e-2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_within_1pt
        |FROM ivf1 i JOIN bf b USING (q_id)""".stripMargin),
    // the sampled-stratum execution of the same audit: queries further
    // restricted by the md5 coin (the stratified_sample idiom), index
    // untouched
    "ann_probe_recall_sampled" -> (annProbeCtesWith(
      " AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 100 < 20") +
      """,
        |bfcand AS (SELECT q.vec_id AS q_id, a.m_id,
        |  list_sum([q.embedding[j]::DOUBLE * a.m_emb[j]::DOUBLE
        |            for j in range(1, 65)]) / (q.nrm * a.m_nrm) AS cosine
        |  FROM qs q, assigned a),
        |bf AS (SELECT q_id, m_id AS bf_id, cosine AS bf_cos FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cosine DESC, m_id ASC) AS rn
        |  FROM bfcand) WHERE rn = 1)
        |SELECT count(*) AS n_queries,
        |  CAST(sum(CASE WHEN i.m_id = b.bf_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top1_match,
        |  CAST(sum(CASE WHEN i.m_id <> b.bf_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_missed,
        |  CAST(sum(CASE WHEN b.bf_cos - i.cosine <= 1e-2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_within_1pt
        |FROM ivf1 i JOIN bf b USING (q_id)""".stripMargin),
    "sliding_trend" ->
      """WITH x AS (SELECT value, unnest([date_trunc('hour', ts),
        |  date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
        |  FROM events WHERE event_type = 'purchase')
        |SELECT ws::TIMESTAMP AS window_start, count(*) AS n_orders,
        |round(sum(value), 2) AS revenue
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "pivot_daily_revenue" ->
      """SELECT ts::DATE AS date,
        |round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        |round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
        |round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        |round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "salted_user_counts" ->
      """SELECT e.user_id, count(*) AS n_pairs,
        |round(sum(o.o_totalprice), 2) AS sum_price
        |FROM events e JOIN orders o ON e.user_id = o.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the JSON wire round-trip is lossless, so the oracle computes the
    // enrich+rollup+rank directly on the source tables
    "sales_etl_pipeline" ->
      """WITH reg AS (SELECT r_name AS region, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |  FROM orders o JOIN customer c ON o_custkey = c_custkey
        |  JOIN nation n ON c_nationkey = n_nationkey
        |  JOIN region r ON n_regionkey = r_regionkey
        |  GROUP BY 1)
        |SELECT region, n_orders, revenue,
        |CAST(rank() OVER (ORDER BY revenue DESC, region) AS INT) AS rnk,
        |revenue * 100.0 / sum(revenue) OVER () AS revenue_share_pct
        |FROM reg ORDER BY rnk""".stripMargin,
    // exact two-pass heavy hitters: the MG sketch only gates candidates,
    // so the oracle is the plain exact threshold query
    "heavy_hitter_tokens" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tot AS (SELECT count(*) AS total FROM t)
        |SELECT w AS token, count(*) AS n,
        |CAST(count(*) AS DOUBLE) / total AS share
        |FROM t, tot GROUP BY w, total
        |HAVING count(*) * 1000 >= total * 34
        |ORDER BY n DESC, token""".stripMargin,
    "text_rarity" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |dfr AS (SELECT w, count(*) AS df FROM t GROUP BY 1)
        |SELECT doc_id, count(*) AS n_tokens,
        |CAST(sum(df) AS DOUBLE) / count(*) AS avg_token_df,
        |CAST(min(df) AS BIGINT) AS min_token_df
        |FROM t JOIN dfr ON t.w = dfr.w
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // session_window's half-open [ts, last+gap) windows: an event exactly
    // `gap` after the previous one opens a NEW session, hence >= here
    "session_windows" ->
      """WITH o AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |    OR epoch_us(ts) - epoch_us(lag(ts) OVER
        |      (PARTITION BY user_id ORDER BY ts)) >= 1800000000
        |  THEN 1 ELSE 0 END AS new_s FROM events),
        |s AS (SELECT user_id, ts, value, sum(new_s) OVER
        |  (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, min(ts)::TIMESTAMP AS session_start,
        |(max(ts) + INTERVAL 30 MINUTE)::TIMESTAMP AS session_end,
        |count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "dedup_rate_by_source" -> (nearDupLabelCte +
      """,
        |drops AS (SELECT node AS doc_id FROM lab WHERE node <> label)
        |SELECT source, count(*) AS n_docs,
        |CAST(sum(CASE WHEN drops.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_near_dup,
        |CAST(sum(CASE WHEN drops.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |  AS DOUBLE) / count(*) AS near_dup_rate
        |FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    // Spark's argmax = min(struct(-count, gram)): count DESC, gram ASC —
    // mirrored here by the row_number ordering
    "text_repetition" ->
      """WITH sized AS (SELECT doc_id, string_split(text, ' ') AS ws,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |g AS (SELECT doc_id, n_tokens, n_distinct,
        |  unnest(list_transform(range(1, n_tokens),
        |    i -> ws[i] || ' ' || ws[i+1])) AS g
        |  FROM sized),
        |c AS (SELECT doc_id, n_tokens, n_distinct, g, count(*) AS c
        |  FROM g GROUP BY 1, 2, 3, 4),
        |top AS (SELECT *, row_number() OVER
        |  (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn FROM c)
        |SELECT doc_id, n_tokens, g AS top_2gram,
        |CAST(c AS BIGINT) AS top_2gram_n,
        |CAST(c AS DOUBLE) / (n_tokens - 1) AS top_2gram_share,
        |CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens AS dup_word_fraction
        |FROM top WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "length_histogram" ->
      """SELECT (n_chars // 50) * 50 AS bucket, count(*) AS n_docs,
        |min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "funnel_conversion" ->
      """WITH v AS (SELECT user_id, min(ts) AS tv FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |    AND e.ts >= v.tv AND e.ts <= v.tv + INTERVAL 12 HOUR
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |    AND e.ts >= c.tc AND e.ts <= c.tc + INTERVAL 12 HOUR
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |(SELECT count(*) FROM c) AS n_view_click,
        |(SELECT count(*) FROM p) AS n_full_funnel,
        |CAST((SELECT count(*) FROM c) AS DOUBLE) /
        |  (SELECT count(*) FROM v) AS click_through,
        |CAST((SELECT count(*) FROM p) AS DOUBLE) /
        |  (SELECT count(*) FROM c) AS purchase_through""".stripMargin,
    "rfm_segments" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |mx AS (SELECT max(ts::DATE) AS max_day FROM p),
        |pu AS (SELECT user_id,
        |  CAST(datediff('day', max(ts::DATE), (SELECT max_day FROM mx))
        |    AS BIGINT) AS recency,
        |  count(*) AS frequency,
        |  sum(CAST(value AS DECIMAL(18,6))) AS monetary
        |  FROM p GROUP BY user_id),
        |seg AS (SELECT *,
        |  CAST(ntile(4) OVER (ORDER BY recency, user_id) AS INT) AS r_q,
        |  CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_q,
        |  CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS INT) AS m_q
        |  FROM pu)
        |SELECT r_q, f_q, m_q, count(*) AS n_users,
        |round(CAST(sum(monetary) AS DOUBLE), 2) AS total_monetary
        |FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "cohort_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |ch AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY 1)
        |SELECT cohort, CAST(datediff('day', cohort, day) AS BIGINT)
        |  AS day_offset, count(*) AS n_users
        |FROM ud JOIN ch ON ud.user_id = ch.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the exact string Spark executes — parity by construction
    "scalar_subquery_big_orders" -> StarQueries.scalarSubqueryBigOrdersSql,
    "exists_late_ship" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6)))
        |  AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q19_or_predicate" ->
      """SELECT count(*) AS n_lines,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6)))
        |  AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    // keep-latest read of a ReplacingMergeTree: one row per key, max
    // (ts, event_id) version — the row_number formulation is the oracle
    // for the engine's single-pass max(struct(...)) argmax
    "dedup_latest" ->
      """SELECT user_id, ts::TIMESTAMP AS last_ts, event_id AS last_event_id,
        |event_type AS last_event_type, value AS last_value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "pii_redact" ->
      """SELECT 'cust_' || substr(md5(c_custkey::VARCHAR), 1, 12) AS pseudonym,
        |regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
        |(floor(c_acctbal / 500.0) * 500.0)::DOUBLE AS acctbal_band,
        |c_nationkey, c_mktsegment
        |FROM customer ORDER BY pseudonym""".stripMargin,
    "k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |(floor(c_acctbal / 500.0) * 500.0)::DOUBLE AS acctbal_band,
        |count(*) AS n,
        |CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS under_k
        |FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // sensitive-value diversity per QI class: distinct segments +
    // dominant-value share (exact integer ppm), classes under l flagged
    "l_diversity" ->
      """WITH s AS (SELECT c_nationkey,
        |  (floor(c_acctbal / 500.0) * 500.0)::DOUBLE AS acctbal_band,
        |  c_mktsegment, count(*) AS sn
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT c_nationkey, acctbal_band,
        |CAST(sum(sn) AS BIGINT) AS n,
        |count(*) AS l_distinct,
        |CAST(max(sn) AS BIGINT) AS top_sens,
        |CAST(max(sn)::HUGEINT * 1000000 // sum(sn) AS BIGINT)
        |  AS top_share_ppm,
        |CASE WHEN count(*) < 3 THEN 1 ELSE 0 END AS under_l
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // class-vs-global total-variation skew of the sensitive attribute,
    // exact by cross-multiplication: 1/2 sum |sn*N - gn*n| as ppm of n*N
    "t_closeness" ->
      """WITH b AS (SELECT c_nationkey,
        |  (floor(c_acctbal / 500.0) * 500.0)::DOUBLE AS acctbal_band,
        |  c_mktsegment FROM customer),
        |g AS (SELECT c_mktsegment, count(*) AS gn FROM b GROUP BY 1),
        |nn AS (SELECT sum(gn) AS corpus_n FROM g),
        |c AS (SELECT c_nationkey, acctbal_band, count(*) AS n
        |  FROM b GROUP BY 1, 2),
        |cs AS (SELECT c_nationkey, acctbal_band, c_mktsegment,
        |  count(*) AS sn FROM b GROUP BY 1, 2, 3),
        |spine AS (SELECT c.c_nationkey, c.acctbal_band, c.n,
        |  g.c_mktsegment, g.gn, nn.corpus_n
        |  FROM c CROSS JOIN g CROSS JOIN nn),
        |sp AS (SELECT spine.c_nationkey, spine.acctbal_band, spine.n,
        |  spine.gn, spine.corpus_n, coalesce(cs.sn, 0) AS sn
        |  FROM spine LEFT JOIN cs
        |    ON cs.c_nationkey = spine.c_nationkey
        |    AND cs.acctbal_band = spine.acctbal_band
        |    AND cs.c_mktsegment = spine.c_mktsegment)
        |SELECT c_nationkey, acctbal_band, CAST(n AS BIGINT) AS n,
        |CAST(sum(abs(sn::HUGEINT * corpus_n - gn::HUGEINT * n)) * 1000000
        |  // (2 * n::HUGEINT * max(corpus_n)) AS BIGINT) AS t_ppm,
        |CASE WHEN CAST(sum(abs(sn::HUGEINT * corpus_n - gn::HUGEINT * n))
        |    * 1000000 // (2 * n::HUGEINT * max(corpus_n)) AS BIGINT)
        |  > 300000 THEN 1 ELSE 0 END AS over_t
        |FROM sp GROUP BY c_nationkey, acctbal_band, n
        |ORDER BY 1, 2""".stripMargin,
    "scd2_user_history" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN lag(event_type) OVER w IS NULL
        |    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |i AS (SELECT user_id, event_type, ts,
        |  CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_id FROM m),
        |g AS (SELECT user_id, seg_id, min(event_type) AS state,
        |  min(ts) AS valid_from, count(*) AS n_events
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, seg_id, state, valid_from::TIMESTAMP AS valid_from,
        |lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg_id)::TIMESTAMP
        |  AS valid_to,
        |n_events
        |FROM g ORDER BY user_id, seg_id""".stripMargin,
    // from→to transition matrix; shares as integer ppm (n·1e6 div total)
    "event_transitions" ->
      """WITH p AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts::TIMESTAMP, event_id) AS to_type
        |  FROM events),
        |g AS (SELECT from_type, to_type, count(*) AS n FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_total
        |  FROM g GROUP BY 1)
        |SELECT g.from_type, g.to_type, CAST(n AS BIGINT) AS n,
        |CAST(n * 1000000 // from_total AS BIGINT) AS ppm
        |FROM g JOIN t ON g.from_type = t.from_type
        |ORDER BY 1, 2""".stripMargin,
    // first-view → first-purchase latency histogram in exact integer
    // microsecond floor-division
    "conversion_latency" ->
      """WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT user_id, min(ts) AS first_purchase FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT CAST((epoch_us(first_purchase::TIMESTAMP)
        |  - epoch_us(first_view::TIMESTAMP)) // 86400000000 AS BIGINT)
        |  AS days_to_convert, count(*) AS n_users
        |FROM v JOIN p ON v.user_id = p.user_id
        |WHERE first_purchase::TIMESTAMP >= first_view::TIMESTAMP
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // DAU/WAU/MAU: one fanned (user-day × day-spine) frame, three
    // conditional distinct counts — all exact integers
    "rolling_active_users" ->
      """WITH ud AS (SELECT DISTINCT ts::DATE AS uday, user_id FROM events),
        |days AS (SELECT DISTINCT uday AS wday FROM ud),
        |f AS (SELECT d.wday, u.user_id, u.uday FROM days d JOIN ud u
        |  ON u.uday <= d.wday AND u.uday >= d.wday - INTERVAL 29 DAY)
        |SELECT wday AS day,
        |count(DISTINCT CASE WHEN uday = wday THEN user_id END) AS dau,
        |count(DISTINCT CASE WHEN uday >= wday - INTERVAL 6 DAY
        |  THEN user_id END) AS wau,
        |count(DISTINCT user_id) AS mau
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // the sketch arm (per-day HLLs union-merged over the spine) is pinned
    // via the error contract: exact counts + in-bound booleans
    "rolling_active_users_hll" ->
      """WITH ud AS (SELECT DISTINCT ts::DATE AS uday, user_id FROM events),
        |days AS (SELECT DISTINCT uday AS wday FROM ud),
        |f AS (SELECT d.wday, u.user_id, u.uday FROM days d JOIN ud u
        |  ON u.uday <= d.wday AND u.uday >= d.wday - INTERVAL 29 DAY)
        |SELECT wday AS day,
        |count(DISTINCT CASE WHEN uday = wday THEN user_id END) AS dau,
        |count(DISTINCT CASE WHEN uday >= wday - INTERVAL 6 DAY
        |  THEN user_id END) AS wau,
        |count(DISTINCT user_id) AS mau,
        |TRUE AS dau_ok, TRUE AS wau_ok, TRUE AS mau_ok
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // PIT lookup against the SCD2 intervals: the probe instant is
    // ts - 1 hour; intervals partition each user's timeline so the left
    // join matches at most one version row per purchase
    "pit_state_lookup" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN lag(event_type) OVER w IS NULL
        |    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |i AS (SELECT user_id, event_type, ts,
        |  CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_id FROM m),
        |g AS (SELECT user_id, seg_id, min(event_type) AS state,
        |  min(ts) AS valid_from, count(*) AS n_events
        |  FROM i GROUP BY 1, 2),
        |hist AS (SELECT user_id AS h_user, state, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg_id)
        |    AS valid_to FROM g),
        |p AS (SELECT user_id, value, ts - INTERVAL 1 HOUR AS at
        |  FROM events WHERE event_type = 'purchase')
        |SELECT coalesce(h.state, 'none') AS prior_state,
        |count(*) AS n_purchases,
        |count(DISTINCT p.user_id) AS n_users,
        |round(CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS total_value
        |FROM p LEFT JOIN hist h ON p.user_id = h.h_user
        |  AND p.at >= h.valid_from
        |  AND (h.valid_to IS NULL OR p.at < h.valid_to)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact interpolated quartiles (quantile_cont ≡ Spark percentile, the
    // parity value_quantiles already proves); fences are deterministic
    // IEEE arithmetic on them, outlier min/max are selections
    "outlier_events" ->
      """WITH q AS (SELECT event_type, quantile_cont(value, 0.25) AS q1,
        |  quantile_cont(value, 0.75) AS q3 FROM events GROUP BY 1),
        |f AS (SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo_fence,
        |  q3 + (q3 - q1) * 1.5 AS hi_fence FROM q)
        |SELECT e.event_type, count(*) AS n_outliers,
        |min(e.value) AS min_outlier, max(e.value) AS max_outlier,
        |min(f.lo_fence) AS lo_fence, min(f.hi_fence) AS hi_fence
        |FROM events e JOIN f ON e.event_type = f.event_type
        |WHERE e.value < f.lo_fence OR e.value > f.hi_fence
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "weighted_sample" ->
      """SELECT lang, count(*) AS n_sampled,
        |CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000
        |      < n_chars
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "corpus_rebalance" ->
      """WITH c AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY 1),
        |m AS (SELECT min(n_before) AS n_min FROM c)
        |SELECT d.lang, c.n_before, count(*) AS n_after,
        |CAST(count(*) AS DOUBLE) / c.n_before AS keep_rate
        |FROM documents d JOIN c ON d.lang = c.lang, m
        |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
        |      % c.n_before < m.n_min
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "data_profile" ->
      """SELECT * FROM (
        |SELECT 'event_id' AS "column", count(*) AS n_rows,
        |  count(*) - count(event_id) AS n_nulls,
        |  count(DISTINCT event_id) AS n_distinct,
        |  min(event_id)::DOUBLE AS min_num, max(event_id)::DOUBLE AS max_num
        |  FROM events
        |UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id),
        |  count(DISTINCT user_id), min(user_id)::DOUBLE, max(user_id)::DOUBLE
        |  FROM events
        |UNION ALL SELECT 'event_type', count(*), count(*) - count(event_type),
        |  count(DISTINCT event_type), NULL::DOUBLE, NULL::DOUBLE FROM events
        |UNION ALL SELECT 'value', count(*), count(*) - count(value),
        |  count(DISTINCT value), min(value), max(value) FROM events
        |UNION ALL SELECT 'props', count(*), count(*) - count(props),
        |  count(DISTINCT props), NULL::DOUBLE, NULL::DOUBLE FROM events
        |) ORDER BY "column"""".stripMargin,
    // EXISTS/NOT-EXISTS formulation here vs the engine's aggregate
    // rewrite: the hash check doubles as an equivalence proof
    "q21_waiting_suppliers" ->
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
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q7_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
        |CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |  AS DOUBLE) AS volume
        |FROM (SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    l_extendedprice, l_discount
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  WHERE (nc.n_name = 'NATION_2' AND ns.n_name = 'NATION_7')
        |     OR (nc.n_name = 'NATION_7' AND ns.n_name = 'NATION_2'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // share = quotient of the two exact decimal sums (never a rounded
    // ratio) — both engines divide identical doubles
    "q8_market_share" ->
      """WITH f AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    l_extendedprice * (1 - l_discount) AS volume,
        |    sn.n_name AS supp_nation
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE o_custkey IN (SELECT c_custkey FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey
        |    WHERE r_name = 'AFRICA'))
        |SELECT o_year, nation_volume, total_volume,
        |  nation_volume / total_volume AS mkt_share
        |FROM (SELECT o_year,
        |  CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_2' THEN volume
        |    ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS nation_volume,
        |  CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS total_volume
        |  FROM f GROUP BY 1)
        |ORDER BY o_year""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // decorrelated CTE form with the engine's exact-operand threshold
    // arithmetic (decimal sum + count, never an order-dependent avg)
    "q17_small_quantity" ->
      """WITH l AS (SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#12'),
        |agg AS (SELECT l_partkey AS agg_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
        |    count(*) AS cnt_qty
        |  FROM l GROUP BY 1)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |    / 7.0 AS avg_yearly,
        |  count(*) AS n_lines
        |FROM l JOIN agg ON l_partkey = agg_partkey
        |WHERE CAST(l_quantity AS DECIMAL(18,6)) * 5 * cnt_qty
        |      < sum_qty""".stripMargin,
    "q22_idle_rich_customers" ->
      """WITH t AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
        |    AS DOUBLE) / count(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT n_name, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey, t
        |WHERE c_acctbal > t.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    // view + scalar max subquery; revenue equality is exact (decimal sum)
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no,
        |  (SELECT max(total_revenue) AS m FROM rev) t
        |WHERE total_revenue = t.m
        |ORDER BY s_suppkey""".stripMargin,
    // quantities are whole-number doubles: their sums are exact in both
    // engines, no decimal cast needed; o_orderkey completes the tie-break
    "q18_large_volume" ->
      """WITH big AS (SELECT l_orderkey AS big_okey,
        |    sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250.0)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum_qty
        |FROM orders JOIN big ON o_orderkey = big_okey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,6)))
        |    AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    // HAVING against a scalar fraction of the global total: both engines
    // compare the same exact decimal-sum doubles
    "q11_important_parts" ->
      """WITH v AS (SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE) AS value
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_3')
        |  GROUP BY 1)
        |SELECT l_partkey, value
        |FROM v, (SELECT CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |  AS t FROM v)
        |WHERE value > 0.002 * t
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_ship_lag" ->
      """SELECT CASE
        |    WHEN datediff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) <= 30 THEN 'FAST'
        |    WHEN datediff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) <= 90 THEN 'NORMAL'
        |    ELSE 'SLOW' END AS ship_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 17, 25, 33, 41, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |    WHERE s_name LIKE '%7')
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // the correlated min subquery in decorrelated form; the min-equality
    // compares bit-identical row-local double divisions
    "q2_min_cost_supplier" ->
      """WITH p AS (SELECT p_partkey, p_name FROM part
        |  WHERE p_type = 'LARGE'),
        |rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'AFRICA'),
        |offers AS (SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS supp_cost
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM p)
        |    AND l_suppkey IN (SELECT s_suppkey FROM rs)
        |  GROUP BY 1, 2),
        |mc AS (SELECT l_partkey AS mc_partkey, min(supp_cost) AS min_cost
        |  FROM offers GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey2, p_name,
        |  supp_cost
        |FROM offers JOIN mc ON l_partkey = mc_partkey
        |  AND supp_cost = min_cost
        |JOIN rs ON l_suppkey = s_suppkey
        |JOIN p ON l_partkey = p_partkey
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey2
        |LIMIT 100""".stripMargin,
    "q20_excess_shippers" ->
      """WITH p AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
        |l97 AS (SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM p)),
        |ps AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        |  FROM l97 GROUP BY 1, 2),
        |pp AS (SELECT l_partkey AS pp_partkey, sum(supp_qty) AS part_qty
        |  FROM ps GROUP BY 1),
        |ex AS (SELECT DISTINCT l_suppkey FROM ps
        |  JOIN pp ON l_partkey = pp_partkey
        |  WHERE supp_qty > 0.3 * part_qty)
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5'
        |  AND s_suppkey IN (SELECT l_suppkey FROM ex)
        |ORDER BY s_name""".stripMargin,
    "token_zipf" ->
      """WITH c AS (SELECT token, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token
        |    FROM documents)
        |  WHERE length(token) > 0 GROUP BY 1),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY freq DESC, token)
        |    AS INT) AS rank, token, freq FROM c)
        |SELECT rank, token, freq, freq * rank AS freq_rank
        |FROM r ORDER BY rank""".stripMargin,
    // integer log2 floors via binary-string length: exact in both engines
    "text_bigram_lm" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |bi AS (SELECT doc_id, unnest(
        |    [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tok WHERE len(ws) >= 2),
        |m12 AS (SELECT bg, count(*) AS cbg FROM bi GROUP BY 1),
        |m1 AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS cw
        |  FROM bi GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum((length(bin(cbg)) - 1) - (length(bin(cw)) - 1))
        |    AS BIGINT) AS lp2_sum,
        |  CAST(sum(CASE WHEN cbg <= 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_rare
        |FROM bi JOIN m12 USING (bg)
        |JOIN m1 ON split_part(bg, ' ', 1) = m1.w1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // floor-based round-half-up (round() ties break differently across
    // engines); folds are left-to-right double sums = Spark's aggregate
    "embedding_quantize" ->
      """WITH e AS (SELECT vec_id, label, embedding,
        |    list_max([abs(embedding[i]::DOUBLE) for i in range(1, 65)])
        |      AS max_abs
        |  FROM embeddings),
        |q AS (SELECT vec_id, label, embedding, max_abs,
        |    [CAST(floor(embedding[i]::DOUBLE * (127.0 / max_abs) + 0.5)
        |      AS BIGINT) for i in range(1, 65)] AS qv
        |  FROM e)
        |SELECT vec_id, label, max_abs,
        |  CAST(list_sum([abs(qv[i]) for i in range(1, 65)]) AS BIGINT)
        |    AS sum_q_abs,
        |  list_sum([(embedding[i]::DOUBLE - (qv[i] * max_abs) / 127.0)
        |            * (embedding[i]::DOUBLE - (qv[i] * max_abs) / 127.0)
        |            for i in range(1, 65)]) / len(embedding) AS mse
        |FROM q ORDER BY vec_id""".stripMargin,
    "doc_chunks" ->
      """WITH d AS (SELECT doc_id, lang,
        |    greatest(ceil(n_chars / 4.0)::BIGINT, 1) AS est FROM documents),
        |ch AS (SELECT doc_id, lang, est, unnest(range(0, est, 96)) AS start
        |  FROM d)
        |SELECT lang, count(*) AS n_chunks,
        |CAST(sum(least(128, est - start)) AS BIGINT) AS sum_chunk_tokens,
        |count(DISTINCT doc_id) AS n_docs,
        |CAST(max(least(128, est - start)) AS BIGINT) AS max_chunk_len
        |FROM ch GROUP BY 1 ORDER BY 1""".stripMargin,
    "contamination_fraction" ->
      """WITH d AS (SELECT doc_id, lang, text,
        |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents),
        |sp AS (SELECT doc_id, lang,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  string_split(text, ' ') AS ws FROM d),
        |sh AS (SELECT doc_id, lang, split, unnest(list_distinct(
        |  [ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]
        |   ||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7]
        |   for i in range(1, len(ws) - 6)])) AS s
        |  FROM sp WHERE len(ws) >= 8),
        |tr AS (SELECT DISTINCT s FROM sh WHERE split = 'train'),
        |te AS (SELECT h.doc_id, h.lang, count(*) AS n_total,
        |    count(t.s) AS shared
        |  FROM sh h LEFT JOIN tr t ON h.s = t.s
        |  WHERE h.split = 'test' GROUP BY 1, 2)
        |SELECT lang,
        |CAST(least(9, (shared * 10) // n_total) AS BIGINT) AS decile,
        |count(*) AS n_docs
        |FROM te GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_incremental" -> ("WITH " + nearDupPairsBody +
      """,
        |k AS (SELECT (max(doc_id) * 4) // 5 AS k FROM documents),
        |hist AS (SELECT DISTINCT md5(text) AS h FROM documents, k
        |  WHERE doc_id < k.k),
        |batch AS (SELECT doc_id, source, md5(text) AS h FROM documents, k
        |  WHERE doc_id >= k.k),
        |nd AS (SELECT DISTINCT doc_b AS doc_id FROM pairs, k
        |  WHERE doc_a < k.k AND doc_b >= k.k)
        |SELECT source, count(*) AS n_new,
        |CAST(sum(CASE WHEN h IN (SELECT h FROM hist) THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_exact_dup,
        |CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM nd) THEN 1 ELSE 0
        |  END) AS BIGINT) AS n_near_dup
        |FROM batch GROUP BY 1 ORDER BY 1""".stripMargin),
    "embedding_contamination" ->
      """WITH e AS (SELECT vec_id, label, embedding,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS nrm,
        |  ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 100 AS bk
        |  FROM embeddings),
        |tr AS (SELECT embedding AS t_emb, nrm AS t_nrm FROM e WHERE bk < 80),
        |te AS (SELECT vec_id, label, embedding, nrm FROM e WHERE bk >= 80),
        |leak AS (SELECT DISTINCT a.vec_id FROM te a JOIN tr b
        |  ON list_sum([a.embedding[i]::DOUBLE * b.t_emb[i]::DOUBLE
        |      for i in range(1, 65)]) / (a.nrm * b.t_nrm) >= 0.4)
        |SELECT label, count(*) AS n_test,
        |CAST(sum(CASE WHEN vec_id IN (SELECT vec_id FROM leak) THEN 1
        |  ELSE 0 END) AS BIGINT) AS n_leaked
        |FROM te GROUP BY 1 ORDER BY 1""".stripMargin,
    "array_funcs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents)
        |SELECT doc_id,
        |CAST(len(ws) AS INT) AS n_tokens,
        |CAST(len(list_distinct(ws)) AS INT) AS n_distinct,
        |list_sort(ws)[1] AS first_sorted,
        |list_sort(ws)[len(ws)] AS last_sorted,
        |CAST(coalesce(list_position(ws, 'the'), 0) AS BIGINT) AS pos_the,
        |CAST(list_contains(ws, 'data') AS INT) AS has_data,
        |array_to_string(ws[2:4], '_') AS mid3,
        |CAST(len(list_distinct([x for x in ws
        |  if x NOT IN ('the', 'a', 'of')])) AS INT) AS n_except_stop,
        |CAST(len(list_distinct([x for x in ws
        |  if x IN ('the', 'a', 'of')])) AS INT) AS n_stop_kinds
        |FROM d ORDER BY doc_id""".stripMargin,
    "collect_sources" ->
      """WITH ds AS (SELECT DISTINCT lang, source FROM documents),
        |a1 AS (SELECT lang, count(*) AS n_sources,
        |    string_agg(source, ',' ORDER BY source) AS sources_csv
        |  FROM ds GROUP BY 1),
        |a2 AS (SELECT lang, count(*) AS n_docs,
        |    array_to_string(list_sort(list(doc_id))[1:3], ',')
        |      AS first_doc_ids
        |  FROM documents GROUP BY 1)
        |SELECT a1.lang, n_sources, sources_csv, first_doc_ids, n_docs
        |FROM a1 JOIN a2 ON a1.lang = a2.lang ORDER BY a1.lang""".stripMargin,
    "stream_join_followups" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase')
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |count(*) AS n_pairs, count(DISTINCT a.user_id) AS n_users
        |FROM p a JOIN p b ON a.user_id = b.user_id
        |  AND epoch_us(b.ts::TIMESTAMP) > epoch_us(a.ts::TIMESTAMP)
        |  AND epoch_us(b.ts::TIMESTAMP)
        |      <= epoch_us(a.ts::TIMESTAMP) + 1800000000
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_triangles" -> ("WITH " + nearDupPairsBody +
      """,
        |w AS (SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
        |  FROM pairs e1 JOIN pairs e2 ON e1.doc_b = e2.doc_a),
        |tri AS (SELECT a, b, c FROM w
        |  WHERE EXISTS (SELECT 1 FROM pairs e3
        |    WHERE e3.doc_a = w.a AND e3.doc_b = w.c)),
        |tn AS (SELECT count(DISTINCT n) AS n_tri_nodes FROM (
        |  SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)),
        |nd AS (SELECT count(DISTINCT n) AS n_nodes FROM (
        |  SELECT doc_a AS n FROM pairs UNION ALL SELECT doc_b FROM pairs))
        |SELECT (SELECT count(*) FROM tri) AS n_triangles,
        |(SELECT n_tri_nodes FROM tn) AS n_tri_nodes,
        |(SELECT count(*) FROM pairs) AS n_edges,
        |(SELECT n_nodes FROM nd) AS n_nodes""".stripMargin),
    "token_cooccurrence" ->
      """WITH toks AS (SELECT doc_id, unnest(list_distinct(
        |    string_split(text, ' '))) AS w FROM documents),
        |t2 AS (SELECT * FROM toks WHERE length(w) > 0),
        |p AS (SELECT a.w AS w1, b.w AS w2, count(*) AS n_docs
        |  FROM t2 a JOIN t2 b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY 1, 2)
        |SELECT CAST(rank AS BIGINT) AS rank, w1, w2, n_docs
        |FROM (SELECT w1, w2, n_docs, row_number() OVER (
        |  ORDER BY n_docs DESC, w1 ASC, w2 ASC) AS rank FROM p)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // coverage thresholds compare cum·100 >= total·pct in exact integers
    "vocab_coverage" ->
      """WITH c AS (SELECT w AS token, count(*) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0 GROUP BY 1),
        |t AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM c),
        |r AS (SELECT token, freq,
        |  CAST(row_number() OVER o AS BIGINT) AS rank,
        |  CAST(sum(freq) OVER (o ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM c WINDOW o AS (ORDER BY freq DESC, token ASC))
        |SELECT max(rank) AS vocab_size, max(cum) AS total_tokens,
        |min(CASE WHEN cum * 100 >= total * 50 THEN rank END) AS r50,
        |min(CASE WHEN cum * 100 >= total * 90 THEN rank END) AS r90,
        |min(CASE WHEN cum * 100 >= total * 99 THEN rank END) AS r99
        |FROM r, t""".stripMargin,
    "dup_degree_histogram" -> ("WITH " + nearDupPairsBody +
      """,
        |deg AS (SELECT n, count(*) AS degree FROM (
        |  SELECT doc_a AS n FROM pairs
        |  UNION ALL SELECT doc_b FROM pairs) GROUP BY 1)
        |SELECT degree, count(*) AS n_nodes
        |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin),
    // corpus-internal duplicated-shingle profile; integer decile buckets
    // ((10·n_dup) div n_sh) keep the gate float-free
    "ngram_novelty" ->
      ("""WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |   for i in range(1, len(ws)-1)])) AS s
        |  FROM tok WHERE len(ws) >= 3),
        |perdoc AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |dup AS (SELECT s FROM (
        |  SELECT s, count(*) AS df FROM sh GROUP BY 1) WHERE df >= 2),
        |dupdoc AS (SELECT doc_id, count(*) AS n_dup FROM sh
        |  WHERE s IN (SELECT s FROM dup) GROUP BY 1),
        |j AS (SELECT p.doc_id, p.n_sh, coalesce(d.n_dup, 0) AS n_dup
        |  FROM perdoc p LEFT JOIN dupdoc d ON p.doc_id = d.doc_id)
        |SELECT (""".stripMargin + s"${ops.Dedup.NgramNoveltyBins}" +
      """ * n_dup) // n_sh AS bin, count(*) AS n_docs,
        |CAST(sum(n_sh) AS BIGINT) AS total_shingles,
        |CAST(sum(n_dup) AS BIGINT) AS dup_shingles
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin),
    // Lee-et-al exact-substring span coverage: a token position is
    // duplicated iff some SpanK-window covering it appears verbatim in
    // another doc; all outputs exact integer counts (float-free gate)
    "dedup_exact_substring" -> (substrCovCtes +
      """,
        |per AS (SELECT doc_id, count(*) AS n_dup_tok FROM cov GROUP BY 1)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN coalesce(p.n_dup_tok, 0) > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_dup,
        |  CAST(sum(coalesce(p.n_dup_tok, 0)) AS BIGINT) AS dup_tokens,
        |  CAST(sum(d.n_tok) AS BIGINT) AS total_tokens
        |FROM d LEFT JOIN per p ON d.doc_id = p.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    // duplicated-run length distribution over the same covered positions
    // (gaps-and-islands per doc: island = p − rank(p))
    "dedup_span_histogram" -> (substrCovCtes +
      """,
        |runs AS (SELECT doc_id,
        |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        |  FROM cov),
        |r2 AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS run_len
        |  FROM runs GROUP BY 1, 2),
        |perlen AS (SELECT run_len, count(*) AS n_runs
        |  FROM r2 GROUP BY 1),
        |perdoc AS (SELECT run_len, count(*) AS n_docs_longest FROM (
        |  SELECT doc_id, max(run_len) AS run_len FROM r2 GROUP BY 1)
        |  GROUP BY 1)
        |SELECT run_len, CAST(n_runs AS BIGINT) AS n_runs,
        |  CAST(coalesce(n_docs_longest, 0) AS BIGINT) AS n_docs_longest
        |FROM perlen LEFT JOIN perdoc USING (run_len)
        |ORDER BY run_len""".stripMargin),
    // early/late drift scored as the exact integer cross-multiplied
    // proportion difference — no float ratio in the gate
    "value_drift" ->
      ("""WITH mid AS (SELECT (CAST(epoch_us(min(ts)::TIMESTAMP) AS BIGINT)
        |    + CAST(epoch_us(max(ts)::TIMESTAMP) AS BIGINT)) // 2 AS mid
        |  FROM events),
        |b AS (SELECT event_type,
        |  CAST(floor(value / """.stripMargin +
      s"${ops.Analytics.ValueDriftBinWidth}.0" +
      """) AS BIGINT) AS bin,
        |  CASE WHEN CAST(epoch_us(ts::TIMESTAMP) AS BIGINT)
        |    > (SELECT mid FROM mid) THEN 1 ELSE 0 END AS late
        |  FROM events),
        |g AS (SELECT event_type, bin,
        |  CAST(sum(1 - late) AS BIGINT) AS n_early,
        |  CAST(sum(late) AS BIGINT) AS n_late
        |  FROM b GROUP BY 1, 2),
        |t AS (SELECT event_type,
        |  CAST(sum(n_early) AS BIGINT) AS total_early,
        |  CAST(sum(n_late) AS BIGINT) AS total_late
        |  FROM g GROUP BY 1)
        |SELECT g.event_type, g.bin, n_early, n_late,
        |CAST(n_early * total_late - n_late * total_early AS BIGINT)
        |  AS drift_scaled
        |FROM g JOIN t ON g.event_type = t.event_type
        |ORDER BY 1, 2""".stripMargin),
    // simpleLinearRegression parity: five DECIMAL sufficient statistics,
    // closed-form slope/intercept as sign-split nonnegative integral
    // divisions (floor(value*1e6) is one IEEE multiply — bit-identical)
    "linreg_value_trend" -> linregTrendSql,
    // the streaming drain folds additive partials to the SAME sufficient
    // statistics, so its oracle IS the batch oracle
    "stream_trend_partials" -> linregTrendSql,
    // two-proportion z-test: arms by user parity, conversion flags from
    // one bounded groupBy; z-squared as the documented two-floor
    // integer composition (dp_ppm first, then the pooled-variance form)
    "ab_proportion_ztest" ->
      ("""WITH u AS (SELECT user_id,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS converted,
        |  user_id % 2 AS arm FROM events GROUP BY user_id),
        |s AS (SELECT
        |  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT)
        |    AS n_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT)
        |    AS n_b,
        |  CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
        |    AS HUGEINT) AS conv_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
        |    AS HUGEINT) AS conv_b FROM u),
        |d AS (SELECT *, CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |  ELSE abs(conv_a * n_b - conv_b * n_a) * 1000000
        |    // (n_a * n_b) END AS dp_ppm FROM s)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(conv_a AS BIGINT) AS conv_a,
        |  CAST(conv_b AS BIGINT) AS conv_b,
        |  CAST(dp_ppm AS BIGINT) AS dp_ppm,
        |  CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0
        |    OR conv_a + conv_b = n_a + n_b THEN NULL
        |  ELSE CAST(dp_ppm * dp_ppm * n_a * n_b * (n_a + n_b)
        |    // ((conv_a + conv_b) * (n_a + n_b - conv_a - conv_b)
        |      * 1000000) AS BIGINT) END AS z2_ppm
        |FROM d""".stripMargin),
    // CUSUM over hourly volume: first-half baseline, count-scaled
    // deviations (no floored mean), prefix sum over the hourly frame
    "cusum_hourly_shift" ->
      ("""WITH h AS (SELECT date_trunc('hour', ts::TIMESTAMP) AS hour,
        |  CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY hour) AS rn,
        |  count(*) OVER () AS n_hours FROM h),
        |b AS (SELECT CAST(count(*) AS BIGINT) AS n_base,
        |  CAST(sum(n_events) AS BIGINT) AS s_base
        |  FROM r WHERE rn <= n_hours // 2)
        |SELECT r.hour, r.n_events,
        |  r.n_events * b.n_base - b.s_base AS dev_scaled,
        |  CAST(sum(r.n_events * b.n_base - b.s_base) OVER (
        |    ORDER BY r.hour ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS BIGINT) AS cusum_scaled
        |FROM r, b ORDER BY hour""".stripMargin),
    // Benford audit: first digit from the decimal rendering (no float
    // log); the nine probabilities are hardcoded public ppm constants
    "benford_values" ->
      ("""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(value * 100)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM events WHERE CAST(floor(value * 100) AS BIGINT) > 0),
        |o AS (SELECT digit, CAST(count(*) AS HUGEINT) AS obs
        |  FROM d GROUP BY 1),
        |n AS (SELECT sum(obs) AS nn FROM o),
        |b(digit, p_ppm) AS (VALUES (1, 301030), (2, 176091),
        |  (3, 124939), (4, 96910), (5, 79181), (6, 66947),
        |  (7, 57992), (8, 51153), (9, 45757)),
        |s AS (SELECT b.digit, COALESCE(o.obs, 0) AS obs,
        |  CAST(n.nn * b.p_ppm // 1000 AS BIGINT) AS exp_milli,
        |  CAST((COALESCE(o.obs, 0) * CAST(1000000 AS HUGEINT)
        |      - n.nn * b.p_ppm)
        |    * (COALESCE(o.obs, 0) * CAST(1000000 AS HUGEINT)
        |      - n.nn * b.p_ppm) * 1000
        |    // (n.nn * b.p_ppm * 1000000) AS BIGINT) AS dev_scaled
        |  FROM b LEFT JOIN o ON b.digit = o.digit, n),
        |t AS (SELECT CAST(sum(dev_scaled) AS BIGINT) AS score FROM s)
        |SELECT CAST(s.digit AS BIGINT) AS digit,
        |  CAST(s.obs AS BIGINT) AS obs, s.exp_milli, s.dev_scaled,
        |  t.score
        |FROM s, t ORDER BY digit""".stripMargin),
    // Mann-Whitney with DOUBLED ranks (tie averages stay integral:
    // 2b + e + 1); the prefix window runs over the distinct-value frame
    "mannwhitney_value" ->
      ("""WITH ev AS (SELECT user_id % 2 AS arm,
        |  CAST(floor(value * 100) AS BIGINT) AS yc FROM events),
        |bv AS (SELECT yc, CAST(count(*) AS HUGEINT) AS e,
        |  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT)
        |    AS e_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT)
        |    AS e_b
        |  FROM ev GROUP BY 1),
        |rk AS (SELECT *, coalesce(sum(e) OVER (ORDER BY yc
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  CAST(0 AS HUGEINT)) AS below FROM bv),
        |s AS (SELECT sum(e_a) AS n_a, sum(e_b) AS n_b,
        |  sum(e_a * (2 * below + e + 1)) AS w2_a,
        |  sum(e_b * (2 * below + e + 1)) AS w2_b FROM rk)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(w2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
        |  CAST(w2_b - n_b * (n_b + 1) AS BIGINT) AS u2_b,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |    WHEN w2_b - n_b * (n_b + 1) >= w2_a - n_a * (n_a + 1) THEN
        |      CAST(((w2_b - n_b * (n_b + 1)) - (w2_a - n_a * (n_a + 1)))
        |        * 1000000 // (n_a * n_b * 2) AS BIGINT)
        |    ELSE
        |      -CAST(((w2_a - n_a * (n_a + 1)) - (w2_b - n_b * (n_b + 1)))
        |        * 1000000 // (n_a * n_b * 2) AS BIGINT) END AS rbc_ppm
        |FROM s""".stripMargin),
    // Pearson chi-squared over the (type x arm) contingency table:
    // every cell term is one exact integer floor, the total an exact
    // BIGINT sum
    "chi2_type_by_arm" ->
      ("""WITH obs0 AS (SELECT event_type, user_id % 2 AS arm,
        |  CAST(count(*) AS HUGEINT) AS o FROM events GROUP BY 1, 2),
        |cells AS (SELECT g.event_type, g.arm,
        |    coalesce(obs0.o, CAST(0 AS HUGEINT)) AS o
        |  FROM (SELECT DISTINCT event_type, a.arm FROM obs0,
        |        (SELECT CAST(0 AS BIGINT) AS arm
        |         UNION ALL SELECT CAST(1 AS BIGINT)) a) g
        |  LEFT JOIN obs0 USING (event_type, arm)),
        |r AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
        |c AS (SELECT arm, sum(o) AS c FROM cells GROUP BY 1),
        |n AS (SELECT sum(o) AS nn FROM cells),
        |s AS (SELECT cells.event_type, cells.arm,
        |  CAST(cells.o AS BIGINT) AS obs,
        |  CASE WHEN r.r * c.c = 0 THEN NULL
        |    ELSE CAST(r.r * c.c * 1000 // n.nn AS BIGINT) END AS exp_milli,
        |  CASE WHEN r.r * c.c = 0 THEN NULL
        |    ELSE CAST((cells.o * n.nn - r.r * c.c)
        |      * (cells.o * n.nn - r.r * c.c) * 1000000
        |      // (r.r * c.c * n.nn) AS BIGINT) END AS cell_ppm
        |  FROM cells JOIN r USING (event_type) JOIN c USING (arm), n),
        |t AS (SELECT CAST(sum(cell_ppm) AS BIGINT) AS chi2_ppm FROM s)
        |SELECT s.event_type, s.arm, s.obs, s.exp_milli, s.cell_ppm,
        |  t.chi2_ppm
        |FROM s, t ORDER BY event_type, arm""".stripMargin),
    // the streaming monitor's grain is the EVENT (per-user totals are
    // not batch-additive); same three-floor Welch solve
    "stream_ab_monitor" ->
      ("""WITH a AS (SELECT user_id % 2 AS arm,
        |  CAST(count(*) AS HUGEINT) AS n,
        |  sum(CAST(floor(value * 100) AS HUGEINT)) AS s,
        |  sum(CAST(floor(value * 100) AS HUGEINT)
        |    * CAST(floor(value * 100) AS HUGEINT)) AS q
        |  FROM events GROUP BY 1),
        |w AS (SELECT
        |  max(CASE WHEN arm = 0 THEN n END) AS n_a,
        |  max(CASE WHEN arm = 1 THEN n END) AS n_b,
        |  max(CASE WHEN arm = 0 THEN s END) AS s_a,
        |  max(CASE WHEN arm = 1 THEN s END) AS s_b,
        |  max(CASE WHEN arm = 0 THEN q END) AS q_a,
        |  max(CASE WHEN arm = 1 THEN q END) AS q_b FROM a),
        |d AS (SELECT CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_b AS BIGINT) AS n_b,
        |  CASE WHEN n_a IS NULL OR n_b IS NULL THEN NULL
        |    ELSE CAST(abs(s_a * n_b - s_b * n_a) * 1000000
        |      // (n_a * n_b) AS BIGINT) END AS dm_ppm,
        |  CASE WHEN n_a IS NULL OR n_a < 2 THEN NULL
        |    ELSE CAST((n_a * q_a - s_a * s_a)
        |      // (n_a * n_a * (n_a - 1)) AS BIGINT) END AS se_a,
        |  CASE WHEN n_b IS NULL OR n_b < 2 THEN NULL
        |    ELSE CAST((n_b * q_b - s_b * s_b)
        |      // (n_b * n_b * (n_b - 1)) AS BIGINT) END AS se_b
        |  FROM w)
        |SELECT n_a, n_b, dm_ppm, se_a, se_b,
        |  CASE WHEN se_a IS NULL OR se_b IS NULL
        |      OR se_a + se_b = 0 THEN NULL
        |    ELSE CAST(CAST(dm_ppm AS HUGEINT) * dm_ppm
        |      // ((CAST(se_a AS HUGEINT) + se_b) * 1000000)
        |      AS BIGINT) END AS t2_ppm
        |FROM d""".stripMargin),
    // Welch t-squared: per-user cent totals, per-arm sums, the
    // documented three-floor composition (SE terms, then the mean gap,
    // then the ratio)
    "welch_ttest_value" ->
      ("""WITH u AS (SELECT user_id,
        |  sum(CAST(floor(value * 100) AS HUGEINT)) AS yc,
        |  user_id % 2 AS arm FROM events GROUP BY user_id),
        |a AS (SELECT arm, CAST(count(*) AS HUGEINT) AS n,
        |  sum(yc) AS s, sum(yc * yc) AS q FROM u GROUP BY 1),
        |w AS (SELECT
        |  max(CASE WHEN arm = 0 THEN n END) AS n_a,
        |  max(CASE WHEN arm = 1 THEN n END) AS n_b,
        |  max(CASE WHEN arm = 0 THEN s END) AS s_a,
        |  max(CASE WHEN arm = 1 THEN s END) AS s_b,
        |  max(CASE WHEN arm = 0 THEN q END) AS q_a,
        |  max(CASE WHEN arm = 1 THEN q END) AS q_b FROM a),
        |d AS (SELECT CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_b AS BIGINT) AS n_b,
        |  CASE WHEN n_a IS NULL OR n_b IS NULL THEN NULL
        |    ELSE CAST(abs(s_a * n_b - s_b * n_a) * 1000000
        |      // (n_a * n_b) AS BIGINT) END AS dm_ppm,
        |  CASE WHEN n_a IS NULL OR n_a < 2 THEN NULL
        |    ELSE CAST((n_a * q_a - s_a * s_a)
        |      // (n_a * n_a * (n_a - 1)) AS BIGINT) END AS se_a,
        |  CASE WHEN n_b IS NULL OR n_b < 2 THEN NULL
        |    ELSE CAST((n_b * q_b - s_b * s_b)
        |      // (n_b * n_b * (n_b - 1)) AS BIGINT) END AS se_b
        |  FROM w)
        |SELECT n_a, n_b, dm_ppm, se_a, se_b,
        |  CASE WHEN se_a IS NULL OR se_b IS NULL
        |      OR se_a + se_b = 0 THEN NULL
        |    ELSE CAST(CAST(dm_ppm AS HUGEINT) * dm_ppm
        |      // ((CAST(se_a AS HUGEINT) + se_b) * 1000000)
        |      AS BIGINT) END AS t2_ppm
        |FROM d""".stripMargin),
    // skewPop/kurtPop parity: centered power sums about the floored
    // integer-cent mean; kurt is the documented two-floor composition
    // that keeps every intermediate inside 38 digits at any n
    "moments_by_type" ->
      ("""WITH ev AS (SELECT event_type,
        |  CAST(floor(value * 100) AS HUGEINT) AS yc FROM events),
        |m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |  sum(yc) AS s1 FROM ev GROUP BY 1),
        |mm AS (SELECT event_type, n,
        |  CASE WHEN s1 >= 0 THEN CAST(s1 // n AS BIGINT)
        |    ELSE -CAST((-s1) // n AS BIGINT) END AS mean_centi FROM m),
        |c AS (SELECT ev.event_type, mm.n, mm.mean_centi,
        |  ev.yc - mm.mean_centi AS d
        |  FROM ev JOIN mm ON ev.event_type = mm.event_type),
        |p AS (SELECT event_type, max(n) AS n,
        |  max(mean_centi) AS mean_centi,
        |  sum(d * d) AS d2, sum(d * d * d) AS d3,
        |  sum(d * d * d * d) AS d4 FROM c GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n, mean_centi,
        |  CAST(d2 // n AS BIGINT) AS var_centi2,
        |  CASE WHEN d2 = 0 THEN NULL
        |    WHEN d3 >= 0 THEN CAST(d3 * 1000000 // d2 AS BIGINT)
        |    ELSE -CAST((-d3) * 1000000 // d2 AS BIGINT) END
        |    AS m3_over_m2_ppm,
        |  CASE WHEN d2 = 0 THEN NULL
        |    ELSE CAST((d4 * 1000000 // d2) * n // d2 AS BIGINT) END
        |    AS kurt_ppm
        |FROM p ORDER BY event_type""".stripMargin),
    // iterative float k-means made engine-portable: distances are the same
    // left-to-right double folds as everywhere else, centroid means and the
    // WCSS report sum in DECIMAL (exact, order-free); the reported wcss is
    // quantized to 6 places on BOTH sides so an oracle-engine list_sum fold
    // difference (double noise) cannot flip the hash — see
    // Similarity.kmeansClusters scaladoc. k is interpolated from
    // Similarity.KmeansK so operator and oracle cannot drift.
    "kmeans_clusters" -> (kmeansAssignCte +
      """
        |SELECT cid AS cluster, COUNT(*) AS n,
        |  CAST(round(SUM(CAST(dist AS DECIMAL(30,12))), 6)
        |       AS DECIMAL(38,6)) AS wcss
        |FROM a2 GROUP BY cid ORDER BY cluster""".stripMargin),
    // Davies–Bouldin audit over the SAME clustering: dist and centroid
    // separations floored to BIGINT micro-units at source, then the
    // scatter mean (integer DIV), the (S_i+S_j)/M² ratio (DECIMAL
    // cross-multiplied ppm) and the worst-partner argmax are all exact
    "cluster_quality" -> (kmeansAssignCte +
      """,
        |per AS (SELECT cid, count(*) AS n,
        |  CAST(sum(CAST(floor(dist * 1e6) AS BIGINT)) AS BIGINT) AS sd
        |  FROM a2 GROUP BY 1),
        |ps AS (SELECT cid, n, sd // n AS scatter_u FROM per),
        |m AS (SELECT a.cid AS cid, b.cid AS partner,
        |  CAST(floor((a.csq + b.csq - 2 * list_sum([a.cemb[i] * b.cemb[i]
        |    for i in range(1, 65)])) * 1e6) AS BIGINT) AS m2u
        |  FROM c1s a, c1s b WHERE a.cid <> b.cid),
        |r AS (SELECT m.cid, m.partner, pa.n, pa.scatter_u,
        |  CASE WHEN m2u <= 0 THEN NULL
        |    ELSE CAST((pa.scatter_u + pb.scatter_u)::HUGEINT * 1000000
        |      // m2u AS BIGINT) END AS ratio_ppm
        |  FROM m JOIN ps pa ON pa.cid = m.cid
        |  JOIN ps pb ON pb.cid = m.partner)
        |SELECT cid AS cluster, n, scatter_u, partner AS worst_partner,
        |  ratio_ppm AS db_ratio_ppm
        |FROM (SELECT *, row_number() OVER (PARTITION BY cid
        |    ORDER BY ratio_ppm DESC, partner DESC) AS rn FROM r)
        |WHERE rn = 1 ORDER BY cluster""".stripMargin),
    // squared-distance silhouette via per-cluster sufficient statistics
    // (n_B|x|^2 - 2 x.S_B + Q_B replaces every pairwise distance); the
    // per-(point, cluster) means floor to micro-units at source, the
    // ratio is a sign-split nonnegative integer DIV
    "silhouette_sq" -> (kmeansAssignCte +
      """,
        |pt AS (SELECT a2.vec_id, a2.cid, e.embedding, e.sq
        |  FROM a2 JOIN e USING (vec_id)),
        |st AS (SELECT cid, count(*) AS cn,
        |  CAST(sum(CAST(sq AS DECIMAL(30,12))) AS DOUBLE) AS qsum
        |  FROM pt GROUP BY 1),
        |sv AS (SELECT pt.cid, g.i AS pos,
        |  CAST(SUM(CAST(pt.embedding[g.i]::DOUBLE AS DECIMAL(30,15)))
        |    AS DOUBLE) AS sv
        |  FROM pt, range(1, 65) g(i) GROUP BY 1, 2),
        |svl AS (SELECT cid, list(sv ORDER BY pos) AS svec
        |  FROM sv GROUP BY 1),
        |bc AS (SELECT st.cid AS bcid, st.cn, st.qsum, svl.svec
        |  FROM st JOIN svl ON svl.cid = st.cid),
        |dd AS (SELECT pt.vec_id, pt.cid, bc.bcid,
        |  CASE WHEN pt.cid = bc.bcid THEN bc.cn - 1 ELSE bc.cn END AS den,
        |  CAST(floor(((CAST(bc.cn AS DOUBLE) * pt.sq -
        |    2 * list_sum([pt.embedding[i]::DOUBLE * bc.svec[i]
        |      for i in range(1, 65)]) + bc.qsum) /
        |    CAST(CASE WHEN pt.cid = bc.bcid THEN bc.cn - 1 ELSE bc.cn END
        |      AS DOUBLE)) * 1e6) AS BIGINT) AS du
        |  FROM pt, bc
        |  WHERE NOT (pt.cid = bc.bcid AND bc.cn = 1)),
        |ab AS (SELECT vec_id, cid,
        |  max(CASE WHEN cid = bcid THEN du END) AS a_u,
        |  min(CASE WHEN cid <> bcid THEN du END) AS b_u
        |  FROM dd GROUP BY 1, 2),
        |sp AS (SELECT cid,
        |  CASE WHEN greatest(a_u, b_u) <= 0 THEN 0
        |    WHEN b_u >= a_u
        |      THEN (b_u - a_u) * 1000000 // greatest(a_u, b_u)
        |    ELSE -((a_u - b_u) * 1000000 // greatest(a_u, b_u)) END
        |    AS s_ppm
        |  FROM ab WHERE a_u IS NOT NULL)
        |SELECT cid AS cluster, count(*) AS n,
        |  CAST(sum(s_ppm) AS BIGINT) AS sum_s_ppm,
        |  CAST(min(s_ppm) AS BIGINT) AS min_s_ppm,
        |  CAST(max(s_ppm) AS BIGINT) AS max_s_ppm
        |FROM sp GROUP BY 1 ORDER BY cluster""".stripMargin),
    // filtered vector search: the annProbe CTE stack with the label
    // predicate threaded through probe and exact sides; the left join
    // surfaces empty-probe queries
    "ann_filtered_recall" ->
      ("""WITH nrm AS MATERIALIZED (SELECT vec_id, embedding, label,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |idx AS MATERIALIZED (SELECT * FROM nrm WHERE vec_id % 2 = 0),
        |cents AS (SELECT vec_id AS cid, embedding AS c_emb,
        |  nrm AS c_nrm FROM idx WHERE vec_id < 32),
        |iscored AS (SELECT i.vec_id, i.embedding, i.nrm, i.label, c.cid,
        |  list_sum([i.embedding[j]::DOUBLE * c.c_emb[j]::DOUBLE
        |            for j in range(1, 65)]) / (i.nrm * c.c_nrm) AS ccos
        |  FROM idx i, cents c),
        |assigned AS MATERIALIZED (SELECT vec_id AS m_id,
        |    embedding AS m_emb, nrm AS m_nrm, label AS m_label,
        |    cid AS cell FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM iscored) WHERE rn = 1),
        |qs AS MATERIALIZED (SELECT * FROM nrm WHERE vec_id % 2 = 1
        |  AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT
        |    % 100 < 20),
        |qscored AS (SELECT q.vec_id AS q_id, q.embedding AS q_emb,
        |  q.nrm AS q_nrm, q.label AS q_label, c.cid,
        |  list_sum([q.embedding[j]::DOUBLE * c.c_emb[j]::DOUBLE
        |            for j in range(1, 65)]) / (q.nrm * c.c_nrm) AS ccos
        |  FROM qs q, cents c),
        |qcells AS (SELECT q_id, q_emb, q_nrm, q_label,
        |  cid AS probe_cell FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM qscored) WHERE rn <= 4),
        |cand AS (SELECT qc.q_id, a.m_id,
        |  list_sum([qc.q_emb[j]::DOUBLE * a.m_emb[j]::DOUBLE
        |            for j in range(1, 65)]) / (qc.q_nrm * a.m_nrm)
        |    AS cosine
        |  FROM qcells qc JOIN assigned a ON a.cell = qc.probe_cell
        |    AND a.m_label = qc.q_label),
        |ivf1 AS (SELECT q_id, m_id AS ivf_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cosine DESC, m_id ASC) AS rn
        |  FROM cand) WHERE rn = 1),
        |bfcand AS (SELECT q.vec_id AS q_id, a.m_id,
        |  list_sum([q.embedding[j]::DOUBLE * a.m_emb[j]::DOUBLE
        |            for j in range(1, 65)]) / (q.nrm * a.m_nrm) AS cosine
        |  FROM qs q JOIN assigned a ON a.m_label = q.label),
        |bf AS (SELECT q_id, m_id AS bf_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cosine DESC, m_id ASC) AS rn
        |  FROM bfcand) WHERE rn = 1),
        |agg AS (SELECT count(*) AS n_queries,
        |  CAST(sum(CASE WHEN i.ivf_id IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_empty_probe,
        |  CAST(sum(CASE WHEN i.ivf_id = b.bf_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top1_match
        |  FROM bf b LEFT JOIN ivf1 i USING (q_id))
        |SELECT n_queries, n_empty_probe, n_top1_match,
        |  CAST(n_top1_match * 1000000 // n_queries AS BIGINT)
        |    AS recall_ppm
        |FROM agg""".stripMargin),
    // NN-descent k-NN graph: md5-seeded init + unrolled refinement
    // rounds (general-neighbor self-join, exact rescore, per-vertex
    // top-k), distances floored to micro-units at source
    "knn_graph_build" -> (knnGraphCtes +
      """
        |SELECT src AS vec_id, rank, dst AS nbr,
        |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
        |FROM gfin ORDER BY vec_id, rank""".stripMargin),
    // graph recall vs the brute-force true k-NN of the md5-coin 20%
    // stratum (pct-quadratic ground truth BY DEFINITION — the
    // recall-audit family)
    "knn_graph_recall" -> (knnGraphCtes +
      s""",
        |q AS MATERIALIZED (SELECT vec_id AS q_id, embedding, sq FROM e
        |  WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT
        |    % 100 < 20),
        |bf AS MATERIALIZED (SELECT q_id, m_id FROM (
        |  SELECT q.q_id, m.vec_id AS m_id, row_number() OVER (
        |    PARTITION BY q.q_id ORDER BY
        |      q.sq + m.sq - 2 * list_sum([q.embedding[i]::DOUBLE *
        |        m.embedding[i]::DOUBLE for i in range(1, 65)]),
        |      m.vec_id) AS rn
        |  FROM q, e m WHERE m.vec_id <> q.q_id)
        |  WHERE rn <= ${ops.KnnGraph.K}),
        |j AS (SELECT bf.q_id, bf.m_id,
        |  CASE WHEN g.src IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM bf LEFT JOIN gfin g
        |    ON g.src = bf.q_id AND g.dst = bf.m_id)
        |SELECT CAST(${ops.KnnGraph.K} AS BIGINT) AS k,
        |  count(DISTINCT q_id) AS n_queries, count(*) AS n_true,
        |  CAST(sum(hit) AS BIGINT) AS n_hit,
        |  CASE WHEN count(*) = 0 THEN NULL
        |    ELSE CAST(sum(hit)::HUGEINT * 1000000 // count(*) AS BIGINT)
        |    END AS recall_ppm
        |FROM j""".stripMargin),
    // greedy graph-descent serving: odd fleet descends the frozen
    // even-half NN-descent graph (fixed entry, unrolled hops, beam
    // windows) — the replay is bit-identical to KnnGraph.greedySearch
    "graph_search" -> (graphDescentCtes("") +
      s"""
        |SELECT q_id AS vec_id, v AS match_id,
        |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
        |FROM f${ops.KnnGraph.SearchHops} WHERE rn = 1
        |ORDER BY vec_id""".stripMargin),
    // the online probe drains to the identical rows (stateless, the
    // batch descent IS the oracle)
    "stream_graph_probe" -> (graphDescentCtes("") +
      s"""
        |SELECT q_id AS vec_id, v AS match_id,
        |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
        |FROM f${ops.KnnGraph.SearchHops} WHERE rn = 1
        |ORDER BY vec_id""".stripMargin),
    // the graph-index WRITE path: each incoming vector's appended edge
    // list is its final descent beam (NSW insertion against the frozen
    // base graph) — stateless, so the batch descent replays it exactly
    "stream_graph_insert" -> (graphDescentCtes("") +
      s"""
        |SELECT q_id AS vec_id, rn AS rank, v AS nbr,
        |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
        |FROM f${ops.KnnGraph.SearchHops}
        |WHERE rn <= ${ops.KnnGraph.InsertFanout}
        |ORDER BY vec_id, rank""".stripMargin),
    // serving from the ACCRETED graph index: insert fleet's descent →
    // segments (+ derived k-bounded back-links), query fleet descends
    // base ∪ segments over the even ∪ inserted population
    "stream_graph_serve_accreted" -> (graphServeAccretedSql),
    // serving from the ACCRETED PQ index: insert fleet coded against
    // the frozen model, queries ADC-scored over base ∪ appended codes
    "stream_pq_serve_accreted" -> (pqServeAccretedSql),
    // the warm fold: accreted edges seed one NN-descent round over the
    // merged population
    "knn_graph_warm_rebuild" -> (knnGraphWarmRebuildSql),
    // the PQ fold: one decimal-exact Lloyd refresh of the frozen coarse
    // axis over base ∪ inserted, full re-code, exact integer churn
    "ivfpq_warm_refresh" -> (ivfpqWarmRefreshSql),
    // delete-masked graph serving: descent unchanged (tombstones still
    // route), mask applied to the final beam, best live member answers
    "stream_graph_serve_deleted" -> (graphServeDeletedSql),
    // delete-masked PQ serving: tombstoned code rows anti-joined at
    // scan (mask pushdown — ADC is per-row pure, early ≡ late mask)
    "stream_pq_serve_deleted" -> (ivfpqCteStack(
      " WHERE vec_id % 2 = 0", 2 * ops.Similarity.IvfPqCells,
      2 * ops.Similarity.PqCentroids, "vec_id % 4 = 3",
      "\n  WHERE k.vec_id % 8 <> 6") + """
        |SELECT q_id AS vec_id, m_id AS match_id, adc_dist FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY adc_dist ASC, m_id ASC) AS rn
        |  FROM adc) WHERE rn = 1 ORDER BY vec_id""".stripMargin),
    // the LSH write path: incoming vectors signed row-locally against
    // the frozen deterministic planes, appended as (vec_id, sig) rows
    "stream_lsh_index_append" ->
      (s"""WITH ${lshIndexSigsSql(" WHERE vec_id % 2 = 1")}
        |SELECT vec_id, sig FROM sigs ORDER BY vec_id""".stripMargin),
    // bucket-join serving over the accreted signature set — inserted
    // vectors findable the moment their segment lands (additive index)
    "stream_lsh_serve_accreted" -> (lshServeAccretedSql),
    // the LSH delete letter: scan-side tombstone mask (bucket caps are
    // live-population properties), and the full-CRUD read
    "stream_lsh_serve_deleted" -> (lshServeDeletedSql),
    "stream_lsh_serve_full" -> (lshServeFullSql),
    // Bloom decontamination audit: bounded m-bit filter vs the exact
    // semi-join, fp overcount priced per lang in exact integers
    "bloom_contamination" -> (bloomContaminationSql),
    // the at-ingest Bloom gate: per-doc membership verdict against the
    // frozen even-half filter — batch replay is bit-identical
    "stream_bloom_probe" -> (streamBloomProbeSql),
    // CMS point-count audit over the full corpus token stream
    "cms_heavy_audit" -> (cmsAuditSql("")),
    // micro-batch CMS partials merged by per-cell SUM — linearity makes
    // the single-pass replay equal the merged grid
    "stream_cms_partials" -> (cmsAuditSql(" WHERE doc_id % 2 = 1")),
    // MG partials: the merged candidate superset + exact recount yields
    // the SAME rows as the batch two-pass — so the plain heavy-hitter
    // SQL over the odd half IS the oracle (sketch state never leaks
    // into the answer)
    "stream_mg_partials" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE doc_id % 2 = 1),
        |tot AS (SELECT count(*) AS total FROM t)
        |SELECT w AS token, count(*) AS n,
        |CAST(count(*) AS DOUBLE) / total AS share
        |FROM t, tot GROUP BY w, total
        |HAVING count(*) * 1000 >= total * 34
        |ORDER BY n DESC, token""".stripMargin,
    // KMV: bottom-k of the distinct 48-bit shingle hashes; D-hat =
    // (k-1)*2^48 / h_k in integer division, err in integer ppm (the
    // knob interpolates like every other, so the engines cannot
    // diverge when GRAFT_KMV_K is set)
    "kmv_distinct_shingles" -> {
      val k = ops.HeavyHitters.KmvK
      val num = (BigInt(k) - 1) * (BigInt(1) << 48)
      s"""WITH sp AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT unnest($gram8Sql) AS s
        |  FROM sp WHERE len(ws) >= 8),
        |hs AS (SELECT DISTINCT
        |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS h FROM sh),
        |bot AS (SELECT h FROM hs ORDER BY h LIMIT $k),
        |sk AS (SELECT count(*) AS k_eff, max(h) AS h_k FROM bot),
        |ex AS (SELECT count(DISTINCT s) AS d_exact FROM sh),
        |est AS (SELECT k_eff, h_k, d_exact,
        |  CASE WHEN k_eff < $k THEN k_eff
        |       ELSE $num // h_k END AS d_est
        |  FROM sk, ex)
        |SELECT $k::BIGINT AS k, k_eff, h_k, d_est, d_exact,
        |  CASE WHEN d_exact = 0 THEN 0
        |       ELSE (abs(d_est - d_exact) * 1000000) // d_exact
        |  END AS err_ppm
        |FROM est""".stripMargin
    },
    // bottom-k sample partials: merging per-batch bottom-k's equals the
    // single-pass bottom-k exactly, so the plain sort-limit over the
    // staged half is the oracle (sketch slicing never leaks)
    "stream_sample_partials" ->
      """SELECT doc_id, source, md5('smp' || doc_id::VARCHAR) AS prio
        |FROM documents WHERE doc_id % 2 = 1
        |ORDER BY prio LIMIT 200""".stripMargin,
    // the combined fold: accreted seed scored over the live population,
    // one refinement round absorbs inserts and deletes together
    "knn_graph_warm_rebuild_live" -> (knnGraphWarmRebuildLiveSql),
    // post-fold hier serving: fold + fresh long links + refreshed
    // upper layer + both descents, replayed end to end
    "graph_serve_folded_hier" -> (graphServeFoldedHierSql),
    // the fold-scheduling loop: decision + both branches, the chosen
    // one's canary rows emitted — replayed end to end
    "graph_fold_decision" -> (graphFoldDecisionSql),
    // the branched production form returns the IDENTICAL rows (the
    // branch executes what the gated loop's decision filter keeps), so
    // the same replay is its oracle — the equivalence the spec proves
    // is exactly what lets one SQL serve both
    "graph_fold_decision_branched" -> (graphFoldDecisionSql),
    // tower serving: every level's build + descent replayed, the base
    // descent entering at the lowest level's winners
    "graph_search_tower" -> (towerDescentCtes("") + s"""
        |SELECT q_id AS vec_id, v AS match_id,
        |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
        |FROM zf${ops.KnnGraph.SearchHops} WHERE rn = 1
        |ORDER BY vec_id""".stripMargin),
    // tower vs 2-layer hier at identical base hops, one ground truth
    "graph_tower_recall" -> {
      val h = ops.KnnGraph.SearchHops
      val strat = " AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))" +
        "::BIGINT % 100 < 20"
      val (stages, entCte) = towerEntryStages("qsrc")
      def countsFrom(g: String, variant: String): String =
        s"""SELECT '$variant' AS variant,
          |  CAST(count(*) AS BIGINT) AS n_queries,
          |  CAST(sum(CASE WHEN g_id = bf_id THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_top1_match,
          |  CASE WHEN count(*) = 0 THEN NULL
          |    ELSE CAST(sum(CASE WHEN g_id = bf_id THEN 1 ELSE 0 END)
          |      ::HUGEINT * 1000000 // count(*) AS BIGINT) END
          |    AS recall_ppm
          |FROM $g JOIN bf USING (q_id)""".stripMargin
      knnGraphCteStack(" WHERE vec_id % 2 = 0") + s""",
        |serve AS MATERIALIZED (SELECT src, dst FROM gfin
        |  UNION SELECT src, dst FROM init),
        |qsrc AS MATERIALIZED (SELECT vec_id AS q_id, embedding,
        |    list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |              for i in range(1, 65)]) AS q_sq
        |  FROM embeddings WHERE vec_id % 2 = 1$strat)""".stripMargin +
        hierEntryStage("qsrc") +
        descentStackFrom("v", "e", "serve", "qsrc", "zent") +
        stages +
        descentStackFrom("z", "e", "serve", "qsrc", entCte) + s""",
        |bf AS MATERIALIZED (SELECT q_id, m_id AS bf_id FROM (
        |  SELECT q.q_id, ev.vec_id AS m_id, row_number() OVER (
        |    PARTITION BY q.q_id ORDER BY
        |      q.q_sq + ev.sq - 2 * list_sum([q.embedding[i]::DOUBLE *
        |        ev.embedding[i]::DOUBLE for i in range(1, 65)]),
        |      ev.vec_id) AS rn
        |  FROM qsrc q, e ev) WHERE rn = 1),
        |ghier AS (SELECT q_id, v AS g_id FROM vf$h WHERE rn = 1),
        |gtower AS (SELECT q_id, v AS g_id FROM zf$h WHERE rn = 1)
        |SELECT * FROM (
        |${countsFrom("ghier", "hier")}
        |UNION ALL
        |${countsFrom("gtower", "tower")})
        |ORDER BY variant""".stripMargin
    },
    // per-level tower geometry: population + serving edge counts
    "graph_tower_stats" -> {
      val levels = 1 to ops.KnnGraph.TowerLevels
      val stacks = levels.map(t =>
        ",\n" + knnGraphCteStack(
          " WHERE vec_id % 2 = 0" + towerCoinSql(t), s"y$t",
          withKw = false) + s""",
          |y${t}serve AS MATERIALIZED (SELECT src, dst FROM y${t}gfin
          |  UNION SELECT src, dst FROM y${t}init)""".stripMargin).mkString
      knnGraphCteStack(" WHERE vec_id % 2 = 0") + s""",
        |serve AS MATERIALIZED (SELECT src, dst FROM gfin
        |  UNION SELECT src, dst FROM init)""".stripMargin + stacks + s"""
        |SELECT * FROM (
        |SELECT CAST(0 AS BIGINT) AS level,
        |  (SELECT count(*) FROM e) AS n_vertices,
        |  (SELECT count(*) FROM serve) AS n_serve_edges
        |${levels.map(t => s"UNION ALL SELECT CAST($t AS BIGINT), " +
            s"(SELECT count(*) FROM y${t}e), " +
            s"(SELECT count(*) FROM y${t}serve)").mkString("\n")})
        |ORDER BY level""".stripMargin
    },
    // persist-serve: the loaded artifacts ARE the in-session model
    // frames bit-for-bit (parquet round-trip + manifest check), so the
    // stratum hier-serve replay is the oracle
    "graph_index_persist_serve" -> (hierDescentCtes(
      " AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT" +
        " % 100 < 20") + s"""
        |SELECT q_id AS vec_id, v AS match_id,
        |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
        |FROM zf${ops.KnnGraph.SearchHops} WHERE rn = 1
        |ORDER BY vec_id""".stripMargin),
    "pq_index_persist_serve" -> (ivfpqProbeCtesWith(
      " AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT" +
        " % 100 < 20") + """
        |SELECT q_id AS vec_id, m_id AS match_id, adc_dist FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY adc_dist ASC, m_id ASC) AS rn
        |  FROM adc) WHERE rn = 1 ORDER BY vec_id""".stripMargin),
    // the full-CRUD read paths: base ∪ inserts ∖ deletes in one query
    "stream_graph_serve_full" -> (graphServeFullSql),
    "stream_pq_serve_full" -> (pqServeFullSql),
    // the physical delete fold: cold rebuild over the live population
    // only — after the fold no edge touches a deleted vertex
    "knn_graph_rebuild_deleted" -> (knnGraphCteStack(
      " WHERE vec_id % 2 = 0 AND vec_id % 8 <> 6") + """
        |SELECT src AS vec_id, rank, dst AS nbr,
        |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
        |FROM gfin ORDER BY vec_id, rank""".stripMargin),
    // accreted-index health: insert fan-in over attachment vertices and
    // the links the K-bound evicts (the fold-scheduling signal)
    "graph_attach_stats" -> (accretedGraphPrefix + s""",
      |fan AS (SELECT nbr, count(*) AS fan_in FROM seg GROUP BY 1)
      |SELECT count(*) AS n_attach_vertices,
      |  CAST(sum(fan_in) AS BIGINT) AS n_links,
      |  CAST(max(fan_in) AS BIGINT) AS max_fan_in,
      |  CAST(sum(CASE WHEN fan_in > ${ops.KnnGraph.K} THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_overflow_vertices,
      |  CAST(sum(CASE WHEN fan_in > ${ops.KnnGraph.K}
      |    THEN fan_in - ${ops.KnnGraph.K} ELSE 0 END)
      |    AS BIGINT) AS n_evicted_links,
      |  (SELECT count(DISTINCT vec_id) FROM seg) AS n_inserts
      |FROM fan""".stripMargin),
    // accreted-index recall at identical hops: flat vs hier entries,
    // one exact pass (the r17 composition's measured justification)
    "graph_serve_accreted_recall" -> (graphServeAccretedRecallSql),
    // serving recall: stratum greedy top-1 vs exact brute-force top-1
    // over the even index (prices the bounded-beam descent)
    "graph_search_recall" -> (graphDescentCtes(
      " AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT" +
        " % 100 < 20") +
      s""",
        |bf AS MATERIALIZED (SELECT q_id, m_id AS bf_id FROM (
        |  SELECT q.q_id, ev.vec_id AS m_id, row_number() OVER (
        |    PARTITION BY q.q_id ORDER BY
        |      q.q_sq + ev.sq - 2 * list_sum([q.embedding[i]::DOUBLE *
        |        ev.embedding[i]::DOUBLE for i in range(1, 65)]),
        |      ev.vec_id) AS rn
        |  FROM qsrc q, e ev) WHERE rn = 1),
        |g1 AS (SELECT q_id, v AS g_id
        |  FROM f${ops.KnnGraph.SearchHops} WHERE rn = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN g_id = bf_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_top1_match,
        |  CASE WHEN count(*) = 0 THEN NULL
        |    ELSE CAST(sum(CASE WHEN g_id = bf_id THEN 1 ELSE 0 END)::HUGEINT
        |      * 1000000 // count(*) AS BIGINT) END AS recall_ppm
        |FROM g1 JOIN bf USING (q_id)""".stripMargin),
    // hierarchical serving: upper-layer descent picks per-query entries,
    // base descent refines — both layers' builds + both descents replayed
    "graph_search_hier" -> (hierDescentCtes("") + s"""
        |SELECT q_id AS vec_id, v AS match_id,
        |  CAST(floor(dist * 1e6) AS BIGINT) AS dist_u
        |FROM zf${ops.KnnGraph.SearchHops} WHERE rn = 1
        |ORDER BY vec_id""".stripMargin),
    // the hier recall audit — directly comparable to graph_search_recall
    // at identical hops/beam: what the smart entries buy
    "graph_search_hier_recall" -> (hierDescentCtes(
      " AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT" +
        " % 100 < 20") +
      s""",
        |bf AS MATERIALIZED (SELECT q_id, m_id AS bf_id FROM (
        |  SELECT q.q_id, ev.vec_id AS m_id, row_number() OVER (
        |    PARTITION BY q.q_id ORDER BY
        |      q.q_sq + ev.sq - 2 * list_sum([q.embedding[i]::DOUBLE *
        |        ev.embedding[i]::DOUBLE for i in range(1, 65)]),
        |      ev.vec_id) AS rn
        |  FROM qsrc q, e ev) WHERE rn = 1),
        |g1 AS (SELECT q_id, v AS g_id
        |  FROM zf${ops.KnnGraph.SearchHops} WHERE rn = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN g_id = bf_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_top1_match,
        |  CASE WHEN count(*) = 0 THEN NULL
        |    ELSE CAST(sum(CASE WHEN g_id = bf_id THEN 1 ELSE 0 END)::HUGEINT
        |      * 1000000 // count(*) AS BIGINT) END AS recall_ppm
        |FROM g1 JOIN bf USING (q_id)""".stripMargin),
    // Matryoshka truncation-recall curve: per prefix width, the sampled
    // stratum's prefix-cosine top-1 vs the full-width exact top-1; the
    // prefix folds are the same left-to-right list_sum both engines
    "mrl_truncation_recall" ->
      ("""WITH qs AS MATERIALIZED (SELECT vec_id AS q_id,
        |    embedding AS qemb FROM embeddings
        |  WHERE vec_id % 2 = 1 AND
        |    ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT
        |      % 100 < 20),
        |idx AS MATERIALIZED (SELECT vec_id AS m_id, embedding AS memb
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |w(width) AS (VALUES """.stripMargin +
      ops.Similarity.MrlWidths.map(p => s"($p)").mkString(", ") +
      """),
        |scored AS MATERIALIZED (SELECT q.q_id, i.m_id, w.width,
        |  list_sum([q.qemb[j]::DOUBLE * i.memb[j]::DOUBLE
        |            for j in range(1, w.width + 1)])
        |  / (sqrt(list_sum([q.qemb[j]::DOUBLE * q.qemb[j]::DOUBLE
        |            for j in range(1, w.width + 1)]))
        |   * sqrt(list_sum([i.memb[j]::DOUBLE * i.memb[j]::DOUBLE
        |            for j in range(1, w.width + 1)]))) AS cos
        |  FROM qs q, idx i, w),
        |t1 AS MATERIALIZED (SELECT q_id, width, m_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id, width ORDER BY cos DESC, m_id ASC) AS rn
        |  FROM scored) WHERE rn = 1),
        |fw AS (SELECT q_id, m_id AS full_id FROM t1
        |  WHERE width = """.stripMargin +
      s"${ops.Similarity.MrlWidths.max})" +
      """
        |SELECT CAST(t1.width AS BIGINT) AS width,
        |  count(*) AS n_queries,
        |  CAST(sum(CASE WHEN t1.m_id = fw.full_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top1_match,
        |  CAST(sum(CASE WHEN t1.m_id = fw.full_id THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS recall_ppm
        |FROM t1 JOIN fw USING (q_id)
        |GROUP BY 1 ORDER BY width""".stripMargin),
    // top principal component by power iteration on the exact integer
    // Gram matrix: micro-quantized, centered about the floored integer
    // mean, PcaRounds max-abs-normalized rounds unrolled as CTEs —
    // every iterate is an exact HUGEINT both engines agree on
    "pca_power_component" -> (pcaPowerCtes("") +
      s""",
        |wf AS MATERIALIZED (SELECT g.i AS i,
        |  sum(g.g * v${ops.Similarity.PcaRounds}.v) AS w
        |  FROM g JOIN v${ops.Similarity.PcaRounds}
        |    ON g.j = v${ops.Similarity.PcaRounds}.i GROUP BY 1),
        |mf AS (SELECT max(abs(w)) AS m FROM wf),
        |tr AS (SELECT sum(g) AS t FROM g WHERE i = j)
        |SELECT CAST(vz.i - 1 AS BIGINT) AS dim,
        |  CAST(vz.v AS BIGINT) AS loading_ppm,
        |  CAST((SELECT m FROM mf) // (SELECT t FROM tr) AS BIGINT)
        |    AS var_explained_ppm
        |FROM v${ops.Similarity.PcaRounds} vz
        |ORDER BY dim""".stripMargin),
    // the drift probe's model is the SAME power iteration trained on
    // the even history half; projections are row-local integer folds,
    // per-label means sign-split truncating divisions
    "stream_pca_drift" -> (pcaPowerCtes(" WHERE vec_id % 2 = 0") +
      s""",
        |vv AS (SELECT list(v ORDER BY i) AS vv
        |  FROM v${ops.Similarity.PcaRounds}),
        |proj AS MATERIALIZED (SELECT e.vec_id, e.label,
        |  list_sum([CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e6)
        |      AS HUGEINT) * vv.vv[i] for i in range(1, 65)]) AS p
        |  FROM embeddings e, vv),
        |agg_in AS (SELECT label, CAST(count(*) AS HUGEINT) AS n_in,
        |  sum(p) AS sp_in FROM proj WHERE vec_id % 2 = 1 GROUP BY 1),
        |agg_h AS (SELECT label, CAST(count(*) AS HUGEINT) AS n_hist,
        |  sum(p) AS sp_hist FROM proj WHERE vec_id % 2 = 0 GROUP BY 1),
        |m AS (SELECT a.label, CAST(a.n_in AS BIGINT) AS n_in,
        |  CASE WHEN a.sp_in >= 0 THEN CAST(a.sp_in // a.n_in AS BIGINT)
        |    ELSE -CAST((-a.sp_in) // a.n_in AS BIGINT) END AS mean_in,
        |  CAST(h.n_hist AS BIGINT) AS n_hist,
        |  CASE WHEN h.sp_hist >= 0
        |    THEN CAST(h.sp_hist // h.n_hist AS BIGINT)
        |    ELSE -CAST((-h.sp_hist) // h.n_hist AS BIGINT) END
        |    AS mean_hist
        |  FROM agg_in a JOIN agg_h h USING (label))
        |SELECT label, n_in, mean_in, n_hist, mean_hist,
        |  mean_in - mean_hist AS shift
        |FROM m ORDER BY label""".stripMargin),
    // SemDeDup over the SAME 2-round Lloyd assignment (kmeansAssignCte):
    // within-cluster cosine ≥ tau against any lower vec_id drops a
    // vector; the cosine is the same left-to-right list_sum fold both
    // engines evaluate bit-identically
    "semdedup" -> (kmeansAssignCte +
      s""",
        |v AS (SELECT a2.vec_id, a2.cid, e.embedding, sqrt(e.sq) AS nrm
        |  FROM a2 JOIN e USING (vec_id)),
        |dup AS (SELECT DISTINCT b.cid, b.vec_id FROM v a JOIN v b
        |  ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  AND list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |               for i in range(1, 65)]) / (a.nrm * b.nrm)
        |      >= ${ops.Similarity.SemDedupTau})
        |SELECT v.cid AS cluster, count(*) AS n,
        |  CAST(sum(CASE WHEN dup.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped,
        |  CAST(count(*) - sum(CASE WHEN dup.vec_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM v LEFT JOIN dup
        |  ON v.cid = dup.cid AND v.vec_id = dup.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    // group-aware split: the coin is drawn on the near-dup cluster label
    // (nearDupLabelCte's fixpoint), so components never straddle splits
    "leakage_safe_split" -> (nearDupLabelCte +
      """,
        |g AS (SELECT d.doc_id, d.n_chars,
        |    coalesce(lab.label, d.doc_id) AS grp
        |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.node)
        |SELECT CASE
        |  WHEN ('0x' || substr(md5(grp::VARCHAR), 1, 8))::BIGINT % 100 < 80
        |    THEN 'train'
        |  WHEN ('0x' || substr(md5(grp::VARCHAR), 1, 8))::BIGINT % 100 < 90
        |    THEN 'val'
        |  ELSE 'test' END AS split,
        |count(*) AS n_docs, count(DISTINCT grp) AS n_groups,
        |CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin),
    "kfold_assignment" ->
      """SELECT ('0x' || substr(md5(doc_id::VARCHAR || ':fold'), 1, 8))::BIGINT
        |    % 5 AS fold,
        |count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
        |CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_clean" ->
      """WITH c AS (SELECT lang, text,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS cleaned
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |CAST(sum(CASE WHEN cleaned <> text THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_changed,
        |CAST(sum(length(text)) AS BIGINT) AS sum_len_raw,
        |CAST(sum(length(cleaned)) AS BIGINT) AS sum_len_clean,
        |CAST(sum(len(string_split(cleaned, ' '))) AS BIGINT)
        |  AS sum_tokens_clean
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // integer PageRank (micro-units, floor division) — exact, associative,
    // parallelism-independent; see Dedup.dupPageRank scaladoc
    "dup_pagerank" -> ("WITH " + nearDupPairsBody +
      """,
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
        |r0 AS (SELECT node, deg, CAST(1000000 AS BIGINT) AS rank FROM deg),
        |r1 AS (SELECT d.node, d.deg,
        |    150000 + (85 * CAST(coalesce(sum(r.rank // r.deg), 0)
        |      AS BIGINT)) // 100 AS rank
        |  FROM deg d LEFT JOIN edges e ON e.dst = d.node
        |  LEFT JOIN r0 r ON r.node = e.src GROUP BY d.node, d.deg),
        |r2 AS (SELECT d.node, d.deg,
        |    150000 + (85 * CAST(coalesce(sum(r.rank // r.deg), 0)
        |      AS BIGINT)) // 100 AS rank
        |  FROM deg d LEFT JOIN edges e ON e.dst = d.node
        |  LEFT JOIN r1 r ON r.node = e.src GROUP BY d.node, d.deg),
        |r3 AS (SELECT d.node, d.deg,
        |    150000 + (85 * CAST(coalesce(sum(r.rank // r.deg), 0)
        |      AS BIGINT)) // 100 AS rank
        |  FROM deg d LEFT JOIN edges e ON e.dst = d.node
        |  LEFT JOIN r2 r ON r.node = e.src GROUP BY d.node, d.deg)
        |SELECT node, deg, rank FROM r3 ORDER BY rank DESC, node"""
        .stripMargin),
    // two-stage retrieve-then-rerank; reuses the shared shingle CTE (only
    // the CTEs the final select reaches are evaluated)
    "hybrid_search" -> ("WITH " + nearDupPairsBody +
      """,
        |qs AS (SELECT s FROM sh WHERE doc_id = 7),
        |cand AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM sh JOIN qs USING (s) WHERE sh.doc_id <> 7 GROUP BY 1),
        |e AS (SELECT vec_id, embedding,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |qe AS (SELECT embedding AS qemb, nrm AS qnrm FROM e WHERE vec_id = 7)
        |SELECT c.doc_id, n_shared,
        |list_sum([e.embedding[i]::DOUBLE * qe.qemb[i]::DOUBLE
        |          for i in range(1, 65)]) / (e.nrm * qe.qnrm) AS cosine
        |FROM cand c JOIN e ON e.vec_id = c.doc_id, qe
        |ORDER BY cosine DESC, c.doc_id LIMIT 10""".stripMargin),
    // the oracle uses the single-partition global window the operator
    // exists to avoid — fine single-node, the thing that dies at 100 TB
    "global_rank_docs" ->
      """WITH r AS (SELECT doc_id, n_chars,
        |  row_number() OVER (ORDER BY n_chars, doc_id) AS global_rank
        |  FROM documents)
        |SELECT (10 * (global_rank - 1))
        |    // (SELECT count(*) FROM documents) AS decile,
        |count(*) AS n_docs,
        |min(global_rank) AS min_rank, max(global_rank) AS max_rank,
        |CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "table_checksum" ->
      """SELECT source, count(*) AS n_rows,
        |CAST(sum(('0x' || substr(md5(doc_id::VARCHAR || '|' || text),
        |  1, 8))::BIGINT) AS BIGINT) AS checksum,
        |min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "robust_stats" ->
      """WITH e AS (SELECT event_type, value,
        |    CAST(floor(value / 10.0) AS BIGINT) AS bucket FROM events),
        |m AS (SELECT event_type, bucket, count(*) AS cnt FROM e GROUP BY 1, 2),
        |md AS (SELECT event_type, bucket AS mode_bucket, cnt AS mode_count
        |  FROM (SELECT event_type, bucket, cnt, row_number() OVER (
        |    PARTITION BY event_type ORDER BY cnt DESC, bucket ASC) AS rk
        |    FROM m)
        |  WHERE rk = 1),
        |r AS (SELECT event_type, value, row_number() OVER (
        |    PARTITION BY event_type ORDER BY value) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n FROM e),
        |mm AS (SELECT event_type, max(n) AS n,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS median_disc
        |  FROM r GROUP BY 1)
        |SELECT md.event_type, n, mode_bucket, mode_count, median_disc
        |FROM md JOIN mm ON md.event_type = mm.event_type
        |ORDER BY md.event_type""".stripMargin,
    "tfidf_terms" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    unnest(string_split(text, ' ')) AS term FROM documents),
        |t2 AS (SELECT * FROM toks WHERE length(term) > 0),
        |dfr AS (SELECT term, count(DISTINCT doc_id) AS df FROM t2 GROUP BY 1),
        |tfr AS (SELECT lang, term, count(*) AS tf FROM t2 GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n_total FROM documents),
        |s AS (SELECT lang, term, tf, df,
        |    tf * ((1000 * n_total) // df) AS score
        |  FROM tfr JOIN dfr USING (term), n)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, term, tf, df,
        |CAST(score AS BIGINT) AS score
        |FROM (SELECT lang, term, tf, df, score, row_number() OVER (
        |  PARTITION BY lang ORDER BY score DESC, term ASC) AS rk FROM s)
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,
    "window_range_frame" ->
      """SELECT event_id, user_id,
        |count(*) OVER w AS n_trailing_hour,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 2)
        |  AS sum_trailing_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_us(ts::TIMESTAMP)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "equidepth_histogram" ->
      """WITH r AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n FROM events)
        |SELECT event_type, CAST((4 * (rn - 1)) // n AS BIGINT) AS bucket,
        |count(*) AS n_rows, min(value) AS vmin, max(value) AS vmax,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS sum_value
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "gapfill_locf" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    count(*) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |  FROM events GROUP BY 1, 2),
        |spine AS (SELECT event_type,
        |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM (SELECT event_type, min(h) AS lo, max(h) AS hi
        |    FROM hourly GROUP BY 1))
        |SELECT s.event_type, s.h,
        |  coalesce(n_events, 0) AS n_events,
        |  CASE WHEN revenue IS NULL THEN 1 ELSE 0 END AS is_gap,
        |  last_value(revenue IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS revenue_locf
        |FROM spine s LEFT JOIN hourly USING (event_type, h)
        |ORDER BY 1, 2""".stripMargin,
    "shard_assignment" ->
      """SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 16
        |  AS shard,
        |count(*) AS n_docs,
        |CAST(sum(ceil(n_chars / 4.0)::BIGINT) AS BIGINT) AS sum_est_tokens,
        |min(md5(doc_id::VARCHAR)) AS md5_lo,
        |max(md5(doc_id::VARCHAR)) AS md5_hi
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // weights forced to DOUBLE: DuckDB's 0.4 literal is DECIMAL, and
    // decimal vs double division diverges at floor boundaries (25/0.2 is
    // 125 exact but 124.99... in binary) — both engines must floor the
    // same IEEE doubles
    "target_mix_sample" ->
      """WITH w(source, weight) AS (VALUES
        |  ('src0', 0.4::DOUBLE), ('src1', 0.3::DOUBLE),
        |  ('src2', 0.2::DOUBLE), ('src3', 0.1::DOUBLE)),
        |c AS (SELECT d.source, count(*) AS n_avail FROM documents d
        |  GROUP BY 1),
        |j AS (SELECT c.source, n_avail, weight FROM c JOIN w USING (source)),
        |n AS (SELECT min(CAST(floor(n_avail / weight) AS BIGINT)) AS n_star
        |  FROM j),
        |q AS (SELECT source, n_avail,
        |  CAST(floor(weight * n_star) AS BIGINT) AS n_keep FROM j, n)
        |SELECT d.source, q.n_avail, q.n_keep, count(*) AS n_kept,
        |  CAST(sum(ceil(n_chars / 4.0)::BIGINT) AS BIGINT) AS sum_est_tokens
        |FROM documents d JOIN q ON d.source = q.source
        |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
        |      % q.n_avail < q.n_keep
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // DSIR n=1 estimator replayed in SQL: the per-bucket log term is
    // PortableLn (same staged +-*/ pipeline both engines — a native ln
    // differs across libms in the last ulp and flips rounding at a
    // boundary, the r8 driver-env hash-fail), then FLOORED to BIGINT
    // micro-nats (floor(lnx * 1e6)) at the source in BOTH engines, so
    // every downstream product/sum/compare is exact integer
    // arithmetic (the TrainingSets scaladoc documents the same gate).
    // Bucket count and
    // target-source set interpolate from the same constants the
    // operator uses (TrainingSets.DsirBuckets / DsirTargetSources — the
    // KmeansK anti-drift pattern).
    "dsir_importance" -> {
      val nB = ops.TrainingSets.DsirBuckets
      val tgt = ops.TrainingSets.DsirTargetSources
        .map(s => s"'$s'").mkString(", ")
      val (plCtes, plOut) = functions.PortableLn.sqlCtes(
        "pl", "model, tot", Seq("b"),
        s"((cnt_tgt + 1) * (tot_raw + $nB))::DOUBLE / " +
          s"((cnt_raw + 1) * (tot_tgt + $nB))::DOUBLE", "lnx")
      s"""WITH tb AS (SELECT doc_id, source,
        |    ('0x' || substr(md5(w), 1, 8))::BIGINT % $nB AS b
        |  FROM (SELECT doc_id, source,
        |      unnest(string_split(text, ' ')) AS w FROM documents)),
        |model AS (SELECT b, CAST(count(*) AS BIGINT) AS cnt_raw,
        |    CAST(sum(CASE WHEN source IN ($tgt) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cnt_tgt
        |  FROM tb GROUP BY b),
        |tot AS (SELECT CAST(sum(cnt_raw) AS BIGINT) AS tot_raw,
        |    CAST(sum(cnt_tgt) AS BIGINT) AS tot_tgt FROM model),
        |$plCtes,
        |term AS (SELECT b, CAST(floor(lnx * 1e6) AS BIGINT) AS lw
        |  FROM $plOut),
        |db AS (SELECT doc_id, source, b, CAST(count(*) AS BIGINT) AS c
        |  FROM tb GROUP BY 1, 2, 3),
        |dw AS (SELECT doc_id, any_value(source) AS source,
        |    CAST(sum(c * lw) AS BIGINT) AS logw
        |  FROM db JOIN term USING (b) GROUP BY doc_id)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN logw > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_upweighted,
        |  CAST(sum(logw) AS BIGINT) AS total_logw_micro
        |FROM dw GROUP BY source ORDER BY source""".stripMargin
    },
    // seeded-Laplace DP counts: u from 48 md5 bits (+1/2 keeps it off
    // 0 and 1/2, w = 1-2|u-1/2| is an integer over 2^48 — exact in a
    // double both engines), inverse CDF through the PortableLn ladder,
    // noise floored to integer micro-units at source; ε interpolates
    // from Privacy.DpEpsMicro (the KmeansK anti-drift pattern)
    "dp_noisy_counts" -> {
      val eps = ops.Privacy.DpEpsMicro
      val two48 = 1L << 48
      val (plCtes, plOut) = functions.PortableLn.sqlCtes(
        "pl", "wsrc", Seq("source", "n_docs", "sgn"), "w", "lnw")
      s"""WITH counts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source),
        |hs AS (SELECT source, n_docs,
        |    ('0x' || substr(md5('dp:' || source), 1, 12))::BIGINT AS h
        |  FROM counts),
        |wsrc AS (SELECT source, n_docs,
        |    CASE WHEN (2 * h + 1 - $two48) > 0 THEN 1e0
        |         ELSE (0e0 - 1e0) END AS sgn,
        |    CAST($two48 - abs(2 * h + 1 - $two48) AS DOUBLE)
        |      / ${two48}e0 AS w
        |  FROM hs),
        |$plCtes,
        |noise AS (SELECT source, n_docs,
        |    CAST(floor((((0e0 - (1e6 / ${eps}e0)) * sgn) * lnw) * 1e6)
        |      AS BIGINT) AS noise_u
        |  FROM $plOut)
        |SELECT source, CAST($eps AS BIGINT) AS eps_micro, n_docs,
        |  noise_u, n_docs * 1000000 + noise_u AS noisy_u
        |FROM noise ORDER BY source""".stripMargin
    },
    // trained multinomial NB language-ID: Laplace-smoothed priors +
    // per-(class, hashed-bucket) likelihoods, each through its own
    // PortableLn ladder floored to micro-nats; all scoring is exact
    // integer arithmetic, argmax ties break to the first class
    "nb_langid_classifier" -> {
      val pct = ops.TrainingSets.NbTrainPct
      nbOracleCtes(s"$nbCoin < $pct", s"$nbCoin >= $pct") + """
        |SELECT lbl AS true_lang, pred_cls AS pred_lang,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // the trained model served at ingest: even-half-trained NB
    // classifier replayed, every odd doc argmax-classified per-doc
    "stream_nb_probe" -> (nbOracleCtes(
      "doc_id % 2 = 0", "doc_id % 2 = 1") + """
      |SELECT doc_id, lbl AS true_lang, pred_cls AS pred_lang FROM pred
      |ORDER BY doc_id""".stripMargin),
    // the composed arrival-time curation chain: Gopher gates →
    // exact-dup probe vs the historical half → trained language
    // filter, one verdict per incoming doc (first match wins)
    "stream_curation_verdict" -> (nbOracleCtes(
      "doc_id % 2 = 0", "doc_id % 2 = 1") + ",\n" +
      funnelFirstFailCtes("WHERE doc_id % 2 = 1") + """
      |,
      |dup AS (SELECT DISTINCT o.doc_id FROM documents o
      |  JOIN documents e ON e.doc_id % 2 = 0
      |    AND md5(e.text) = md5(o.text)
      |  WHERE o.doc_id % 2 = 1),
      |v AS (SELECT ff.doc_id,
      |    CASE WHEN ff.fs > 0 THEN 'gate' || ff.fs
      |      WHEN d.doc_id IS NOT NULL THEN 'duplicate'
      |      WHEN p.pred_cls <> p.lbl THEN 'lang_mismatch'
      |      ELSE 'kept' END AS verdict
      |  FROM ff LEFT JOIN dup d USING (doc_id)
      |  JOIN pred p USING (doc_id))
      |SELECT doc_id, verdict FROM v ORDER BY doc_id""".stripMargin),
    // GPT-3 quality filter, CCNet-bucketed: binary hq/lq NB margin per
    // doc (exact integer log-odds), head/middle/tail tertiles per
    // source by ntile over the (margin DESC, doc_id) total order
    "nb_quality_tertiles" -> {
      val pct = ops.TrainingSets.NbTrainPct
      val cls = "CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT" +
        " % 2 = 0 THEN 'hq' ELSE 'lq' END"
      nbOracleCtes(s"$nbCoin < $pct", "TRUE", cls, "source") + """
        |,
        |m AS (SELECT doc_id, lbl AS source,
        |    max(CASE WHEN s = 'hq' THEN score END)
        |      - max(CASE WHEN s = 'lq' THEN score END) AS margin
        |  FROM scp GROUP BY 1, 2),
        |tt AS (SELECT source, margin, CAST(ntile(3) OVER (
        |    PARTITION BY source ORDER BY margin DESC, doc_id ASC)
        |  AS BIGINT) AS tertile FROM m)
        |SELECT source, tertile, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(margin) AS BIGINT) AS sum_margin_micro
        |FROM tt GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // reliability histogram: HELD-OUT margin deciles x observed true-hq
    // share (exact integers; deciles from a global integer rank — the
    // oracle's plain window replays the engine's two-phase bucket rank)
    "nb_calibration" -> {
      val pct = ops.TrainingSets.NbTrainPct
      val cls = "CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT" +
        " % 2 = 0 THEN 'hq' ELSE 'lq' END"
      nbOracleCtes(s"$nbCoin < $pct", s"NOT ($nbCoin < $pct)",
        cls, "source") + """
        |,
        |m AS (SELECT doc_id, lbl,
        |    max(CASE WHEN s = 'hq' THEN score END)
        |      - max(CASE WHEN s = 'lq' THEN score END) AS margin
        |  FROM scp GROUP BY 1, 2),
        |mh AS (SELECT doc_id, margin,
        |    CASE WHEN ('0x' || substr(md5(lbl), 1, 8))::BIGINT % 2 = 0
        |      THEN 1 ELSE 0 END AS is_hq
        |  FROM m),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM mh),
        |rk AS (SELECT mh.*, row_number() OVER (
        |    ORDER BY margin DESC, doc_id ASC) AS rn FROM mh),
        |d AS (SELECT CAST((10 * (rn - 1)) // t.total AS BIGINT)
        |    AS decile, margin, is_hq
        |  FROM rk, t)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(is_hq) AS BIGINT) AS n_hq,
        |  CAST(sum(is_hq)::HUGEINT * 1000000 // count(*) AS BIGINT)
        |    AS hq_share_ppm,
        |  CAST(min(margin) AS BIGINT) AS min_margin_micro,
        |  CAST(max(margin) AS BIGINT) AS max_margin_micro
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // transitive closure via recursive CTE mirrors the engine's iterative
    // min-label propagation (identical fixpoint: cluster = min member id)
    "dedup_clusters" -> clustersFromLabels,
    // cross-source matrix over the shared near-dup pair definition (the
    // recursive-closure tail of the CTE goes unreferenced — DuckDB only
    // evaluates the CTEs the final select reaches)
    "dedup_source_matrix" -> (nearDupLabelCte +
      """,
        |m AS (SELECT least(da.source, db.source) AS source_x,
        |    greatest(da.source, db.source) AS source_y
        |  FROM pairs JOIN documents da ON doc_a = da.doc_id
        |  JOIN documents db ON doc_b = db.doc_id)
        |SELECT source_x, source_y, count(*) AS n_pairs
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // blocked edit-distance fuzzy match: block key = last name token, so
    // the quadratic verify runs within blocks only
    "fuzzy_name_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name,
        |    split_part(p_name, ' ', -1) AS block
        |  FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
        |FROM n a JOIN n b ON a.block = b.block AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    // survivor selection over the same label fixpoint: best doc (longest,
    // doc_id tie-break) kept per cluster, dropped chars accounted
    "dedup_survivors" -> (nearDupLabelCte +
      """,
        |d AS (SELECT label, node, n_chars,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY n_chars DESC, node) AS rn
        |  FROM lab JOIN documents ON node = doc_id)
        |SELECT label AS cluster, count(*) AS n_members,
        |  max(CASE WHEN rn = 1 THEN node END) AS survivor_doc,
        |  max(CASE WHEN rn = 1 THEN n_chars END) AS chars_kept,
        |  CAST(sum(CASE WHEN rn <> 1 THEN n_chars ELSE 0 END) AS BIGINT)
        |    AS chars_dropped
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin),
    // same fixpoint as dedup_clusters (star contraction == propagation)
    "dedup_clusters_star" -> clustersFromLabels,
    "curation_pipeline" -> (nearDupLabelCte +
      """,
        |exact_keep AS (SELECT min(doc_id) AS doc_id
        |  FROM documents GROUP BY md5(text)),
        |kept AS (SELECT d.doc_id, d.n_chars,
        |    ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 100
        |      AS bucket
        |  FROM documents d
        |  JOIN exact_keep k ON d.doc_id = k.doc_id
        |  JOIN tok t ON d.doc_id = t.doc_id
        |  WHERE d.doc_id NOT IN
        |      (SELECT node FROM lab WHERE node <> label)
        |    AND len(t.ws) >= 5
        |    AND len(list_distinct(t.ws))::DOUBLE / len(t.ws) >= 0.3)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |count(*) AS n_docs,
        |CAST(sum(ceil(n_chars / 4.0)::BIGINT) AS BIGINT) AS sum_est_tokens
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin),
    // curation with the semantic gate chained in: near-dup CC CTEs and
    // the kmeans/SemDeDup CTEs share one WITH RECURSIVE (names disjoint);
    // drop iff either gate fires
    "curation_pipeline_semantic" -> (nearDupLabelCte + "," +
      kmeansAssignCte.stripPrefix("WITH ") +
      s""",
        |v AS (SELECT a2.vec_id, a2.cid, e.embedding, sqrt(e.sq) AS nrm
        |  FROM a2 JOIN e USING (vec_id)),
        |sdup AS (SELECT DISTINCT b.vec_id FROM v a JOIN v b
        |  ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  AND list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |               for i in range(1, 65)]) / (a.nrm * b.nrm)
        |      >= ${ops.Similarity.SemDedupTau}),
        |exact_keep AS (SELECT min(doc_id) AS doc_id
        |  FROM documents GROUP BY md5(text)),
        |kept AS (SELECT d.doc_id, d.n_chars,
        |    ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 100
        |      AS bucket
        |  FROM documents d
        |  JOIN exact_keep k ON d.doc_id = k.doc_id
        |  JOIN tok t ON d.doc_id = t.doc_id
        |  WHERE d.doc_id NOT IN
        |      (SELECT node FROM lab WHERE node <> label)
        |    AND d.doc_id NOT IN (SELECT vec_id FROM sdup)
        |    AND len(t.ws) >= 5
        |    AND len(list_distinct(t.ws))::DOUBLE / len(t.ws) >= 0.3)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |count(*) AS n_docs,
        |CAST(sum(ceil(n_chars / 4.0)::BIGINT) AS BIGINT) AS sum_est_tokens
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin),
    "order_size_histogram" ->
      """SELECT n_lines, count(*) AS n_orders FROM (
        |  SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // recency vs the corpus max order date — no wall clock in the gate
    "customer_recency_histogram" ->
      """WITH l AS (SELECT o_custkey, max(o_orderdate::DATE) AS last_order
        |  FROM orders GROUP BY 1),
        |a AS (SELECT max(last_order) AS anchor FROM l)
        |SELECT CAST((anchor - last_order) // 30 AS BIGINT) AS recency_bin,
        |count(*) AS n_customers
        |FROM l, a GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact integer day sums; the mean is the reader's division
    "fulfilment_span" ->
      """WITH po AS (SELECT l_orderkey, min(l_shipdate) AS first_ship,
        |  max(l_shipdate) AS last_ship FROM lineitem GROUP BY 1)
        |SELECT o_orderstatus, count(*) AS n_orders,
        |CAST(sum(first_ship::DATE - o_orderdate::DATE) AS BIGINT)
        |  AS sum_start_lag_days,
        |CAST(sum(last_ship::DATE - first_ship::DATE) AS BIGINT)
        |  AS sum_span_days,
        |CAST(max(last_ship::DATE - first_ship::DATE) AS BIGINT)
        |  AS max_span_days
        |FROM orders JOIN po ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // band = floor(d·100 + 0.5); revenue per q1's row-cast discipline
    "discount_bands" ->
      """SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
        |  AS discount_pct,
        |count(*) AS n_lines,
        |CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |  AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // Spearman over deterministic (metric, doc_id) ranks; ρ as exact ppm
    "rank_correlation" ->
      """WITH m AS (SELECT doc_id, n_chars,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |    AS n_types
        |  FROM documents),
        |r AS (SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
        |    AS r_chars,
        |  CAST(row_number() OVER (ORDER BY n_types, doc_id) AS BIGINT)
        |    AS r_types
        |  FROM m)
        |SELECT count(*) AS n,
        |CAST(sum((r_chars - r_types) * (r_chars - r_types)) AS BIGINT)
        |  AS sum_d2,
        |CAST(1000000 - (6::HUGEINT * CAST(sum((r_chars - r_types) *
        |  (r_chars - r_types)) AS BIGINT) * 1000000)
        |  // (count(*)::HUGEINT * (count(*)::HUGEINT * count(*) - 1))
        |  AS BIGINT) AS rho_ppm
        |FROM r""".stripMargin,
    "user_activity_histogram" ->
      """SELECT n_events, count(*) AS n_users FROM (
        |  SELECT user_id, count(*) AS n_events FROM events GROUP BY 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // month deltas in exact integer cents; lag over the month frame only
    "mom_growth" ->
      """WITH m AS (SELECT date_trunc('month', ts)::TIMESTAMP AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT month, n_orders,
        |CAST(cents AS DOUBLE) / 100 AS revenue,
        |CAST(cents - lag(cents) OVER (ORDER BY month) AS BIGINT)
        |  AS delta_cents
        |FROM m ORDER BY month""".stripMargin,
    // whole-day gaps between consecutive distinct purchase days per user
    "purchase_gap_histogram" ->
      """WITH d AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events
        |  WHERE event_type = 'purchase'),
        |g AS (SELECT CAST(day - lag(day) OVER (PARTITION BY user_id
        |  ORDER BY day) AS BIGINT) AS gap_days FROM d)
        |SELECT gap_days, count(*) AS n_gaps FROM g
        |WHERE gap_days IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // "new" = a purchase on its user's min purchase day — order-free
    "new_vs_returning" ->
      """WITH p AS (SELECT ts::DATE AS day, user_id FROM events
        |  WHERE event_type = 'purchase'),
        |f AS (SELECT user_id, min(day) AS first_day FROM p GROUP BY 1)
        |SELECT day, count(*) AS n_purchases,
        |CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_new,
        |CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_returning,
        |count(DISTINCT CASE WHEN day = first_day THEN p.user_id END)
        |  AS n_new_users
        |FROM p JOIN f ON p.user_id = f.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-order distinct brand pairs; deterministic (support, a, b) rank
    "basket_affinity" ->
      """WITH bk AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |p AS (SELECT a.b AS brand_a, b.b AS brand_b, count(*) AS support
        |  FROM bk a JOIN bk b ON a.okey = b.okey AND a.b < b.b
        |  GROUP BY 1, 2),
        |r AS (SELECT brand_a, brand_b, support,
        |  CAST(row_number() OVER (ORDER BY support DESC,
        |    brand_a ASC, brand_b ASC) AS BIGINT) AS rank FROM p)
        |SELECT rank, brand_a, brand_b, support FROM r
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // order statistics: the reported percentile IS an element of the
    // day's multiset — no arithmetic, no rounding needed
    "daily_value_percentiles" ->
      """WITH r AS (SELECT ts::DATE AS day, value,
        |  CAST(row_number() OVER (PARTITION BY ts::DATE ORDER BY value)
        |    AS BIGINT) AS rn,
        |  CAST(count(*) OVER (PARTITION BY ts::DATE) AS BIGINT) AS n
        |  FROM events WHERE event_type = 'purchase')
        |SELECT day, max(n) AS n_purchases,
        |max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
        |max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // alert threshold in exact cross-multiplied integers — no float ratio
    "error_burst_hours" ->
      """WITH h AS (SELECT date_trunc('hour', ts)::TIMESTAMP AS hour,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_err,
        |  count(*) AS n_tot
        |  FROM events GROUP BY 1),
        |g AS (SELECT CAST(sum(n_err) AS BIGINT) AS err_total,
        |  CAST(sum(n_tot) AS BIGINT) AS all_total FROM h)
        |SELECT hour, n_err, n_tot,
        |CAST(n_err * all_total * 2 - err_total * n_tot * 3 AS BIGINT)
        |  AS excess_scaled
        |FROM h, g
        |WHERE n_err * all_total * 2 - err_total * n_tot * 3 >= 0
        |ORDER BY hour""".stripMargin,
    // dow/hour from engine-neutral integer epoch arithmetic (native
    // dayofweek() numbering differs between engines)
    "seasonal_profile" ->
      """WITH c AS (SELECT
        |  ((epoch_us(ts::TIMESTAMP) // 86400000000) + 4) % 7 AS dow,
        |  (epoch_us(ts::TIMESTAMP) % 86400000000) // 3600000000 AS hour,
        |  value
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT dow, hour, count(*) AS n_orders,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |    AS revenue
        |  FROM c GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total_orders FROM g)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
        |n_orders, revenue,
        |n_orders * 1000000 // total_orders AS share_ppm
        |FROM g, t ORDER BY 1, 2""".stripMargin,
    // MATCH_RECOGNIZE-lite: ordered per-session initial strings +
    // subsequence LIKE scans; (ts, event_id) order is deterministic
    "session_pattern_counts" ->
      """WITH g AS (SELECT user_id, ts, event_id,
        |  substr(event_type, 1, 1) AS i,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts) OVER w::TIMESTAMP)
        |          > 1800000000
        |  THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, event_id, i,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        |strs AS (SELECT user_id, sid,
        |  string_agg(i, '' ORDER BY ts, event_id) AS es
        |  FROM s GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        |CAST(sum(CASE WHEN es LIKE '%v%' THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_view,
        |CAST(sum(CASE WHEN es LIKE '%v%c%' THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_view_click,
        |CAST(sum(CASE WHEN es LIKE '%v%c%p%' THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_view_click_purchase,
        |CAST(sum(CASE WHEN es LIKE 'p%' THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_purchase_first
        |FROM strs""".stripMargin,
    // one-row corpus card; near-dup membership from the recursive-CTE
    // label fixpoint (same lab CTE as the cluster oracles)
    "dataset_card" -> (nearDupLabelCte +
      """,
        |base AS (SELECT count(*) AS n_docs,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
        |    AS exact_dup_docs,
        |  CAST(sum(ceil(n_chars / 4.0)::BIGINT) AS BIGINT) AS est_tokens
        |  FROM documents),
        |tk AS (SELECT count(*) AS total_tokens,
        |  count(DISTINCT t) AS vocab_size FROM (
        |  SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE length(t) > 0),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS near_dup_docs
        |  FROM lab WHERE node <> label)
        |SELECT n_docs, n_sources, n_langs, total_tokens, vocab_size,
        |est_tokens, exact_dup_docs, near_dup_docs
        |FROM base, tk, nd""".stripMargin),
    // top-decile revenue share; cents are exact BIGINTs, share in ppm by
    // integer floor division, the /100.0 display divisions single IEEE ops
    "pareto_concentration" ->
      """WITH rev AS (SELECT o_custkey,
        |  sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        |  FROM orders GROUP BY 1),
        |n AS (SELECT count(*) AS n_customers FROM rev),
        |r AS (SELECT rev, row_number() OVER (
        |  ORDER BY rev DESC, o_custkey ASC) AS rk FROM rev),
        |agg AS (SELECT
        |  CAST(sum(CASE WHEN rk <= (SELECT (n_customers + 9) // 10 FROM n)
        |    THEN rev ELSE 0 END) * 100 AS BIGINT) AS top_cents,
        |  CAST(sum(rev) * 100 AS BIGINT) AS total_cents FROM r)
        |SELECT (SELECT n_customers FROM n) AS n_customers,
        |(SELECT (n_customers + 9) // 10 FROM n) AS top_n,
        |CAST(top_cents AS DOUBLE) / 100 AS top_revenue,
        |CAST(total_cents AS DOUBLE) / 100 AS total_revenue,
        |CAST(top_cents::HUGEINT * 1000000 // total_cents AS BIGINT)
        |  AS share_ppm
        |FROM agg""".stripMargin,
    // per-relation anti-join orphan counts, all integers
    "fk_integrity" ->
      """WITH r1 AS (SELECT 'lineitem.orderkey->orders' AS relation,
        |  count(*) AS n_child,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dangling,
        |  count(DISTINCT CASE WHEN o_orderkey IS NULL
        |    THEN l_orderkey END) AS n_dangling_keys
        |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey),
        |r2 AS (SELECT 'lineitem.partkey->part', count(*),
        |  CAST(sum(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  count(DISTINCT CASE WHEN p_partkey IS NULL THEN l_partkey END)
        |  FROM lineitem LEFT JOIN part ON l_partkey = p_partkey),
        |r3 AS (SELECT 'lineitem.suppkey->supplier', count(*),
        |  CAST(sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  count(DISTINCT CASE WHEN s_suppkey IS NULL THEN l_suppkey END)
        |  FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey),
        |r4 AS (SELECT 'orders.custkey->customer', count(*),
        |  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  count(DISTINCT CASE WHEN c_custkey IS NULL THEN o_custkey END)
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey),
        |r5 AS (SELECT 'customer.nationkey->nation', count(*),
        |  CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  count(DISTINCT CASE WHEN n_nationkey IS NULL
        |    THEN c_nationkey END)
        |  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
        |UNION ALL SELECT * FROM r5 ORDER BY 1""".stripMargin,
    // IVF∩BF top-k overlap; both sets deterministic, recall in ppm
    // product quantization: fixed-seed sub-vector codebooks, argmin
    // codes, ADC search — the oracle replays the identical
    // x·x − 2·x·c + c·c arithmetic (shared pqCtes prefix)
    "pq_code_stats" -> (pqCtes +
      """
        |SELECT CAST(s AS BIGINT) AS subspace, cid,
        |  count(*) AS n_vectors,
        |  CAST(min(vec_id) AS BIGINT) AS first_vec
        |FROM codes GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "pq_ann_topk" -> (pqCtes +
      """
        |SELECT vec_id, adc_dist FROM adck
        |ORDER BY adc_dist ASC, vec_id ASC LIMIT 10""".stripMargin),
    "pq_recall" -> (pqCtes +
      """,
        |q64 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |ex AS (SELECT e.vec_id FROM embeddings e, q64 q
        |  WHERE e.vec_id <> 0
        |  ORDER BY list_sum([e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
        |      for i in range(1, 65)])
        |    - 2 * list_sum([e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE
        |      for i in range(1, 65)])
        |    + list_sum([q.qe[i]::DOUBLE * q.qe[i]::DOUBLE
        |      for i in range(1, 65)]) ASC, e.vec_id ASC
        |  LIMIT 10),
        |topadc AS (SELECT vec_id FROM adck
        |  ORDER BY adc_dist ASC, vec_id ASC LIMIT 10),
        |ov AS (SELECT count(*) AS n_overlap FROM topadc JOIN ex USING (vec_id))
        |SELECT CAST(10 AS BIGINT) AS k,
        |  CAST(n_overlap AS BIGINT) AS n_overlap,
        |  n_overlap * 1000000 // 10 AS recall_ppm
        |FROM ov""".stripMargin),
    "pq_distortion" -> (pqCtes +
      """
        |SELECT CAST(s AS BIGINT) AS subspace, COUNT(*) AS n_vectors,
        |  CAST(round(SUM(CAST(dist AS DECIMAL(30,12))), 6)
        |       AS DECIMAL(38,6)) AS distortion
        |FROM codes GROUP BY 1 ORDER BY 1""".stripMargin),
    // the ONLINE IVF-PQ probe, COMPOSED path (r13): even-half coarse
    // quantizer + residual codebook, odd probes ADC-scored against the
    // probed cells' codes only — the oracle replays coarse training,
    // residual coding, cell ranking and the cell-keyed 8-term ADC chain
    "stream_pq_probe" -> (ivfpqProbeCtes + """
        |SELECT q_id AS vec_id, m_id AS match_id, adc_dist FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY adc_dist ASC, m_id ASC) AS rn
        |  FROM adc) WHERE rn = 1 ORDER BY vec_id""".stripMargin),
    // streaming index maintenance: each incoming (odd) vector coded
    // against the FROZEN even-half model — nearest coarse cell (rn=1
    // of the same qcd ranking the probe uses), residual, per-subspace
    // nearest residual codeword — the oracle replays training + the
    // identical assignment folds; all-integer output
    "stream_pq_index_append" -> (ivfpqProbeCtes + s"""
        |,qcell AS (SELECT q_id AS vec_id, cid AS cell,
        |    [embedding[i]::DOUBLE - cemb[i] for i in range(1, 65)] AS qr
        |  FROM (SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY dist, cid) AS rn FROM qcd)
        |  WHERE rn = 1),
        |qsub2 AS (SELECT vec_id, cell, t.s AS s,
        |    [qr[t.s * ${ops.Similarity.PqSubDim} + i]
        |     for i in range(1, ${ops.Similarity.PqSubDim + 1})] AS sv
        |  FROM qcell, range(0, ${ops.Similarity.PqSubspaces}) t(s)),
        |qds2 AS (SELECT u.vec_id, u.cell, u.s, c.cid,
        |    list_sum([u.sv[i] * u.sv[i]
        |      for i in range(1, ${ops.Similarity.PqSubDim + 1})])
        |  - 2 * list_sum([u.sv[i] * c.cv[i]
        |      for i in range(1, ${ops.Similarity.PqSubDim + 1})])
        |  + list_sum([c.cv[i] * c.cv[i]
        |      for i in range(1, ${ops.Similarity.PqSubDim + 1})]) AS dist
        |  FROM qsub2 u JOIN rcb c USING (s))
        |SELECT vec_id, cell, CAST(s AS BIGINT) AS s, cid FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn
        |  FROM qds2) WHERE rn = 1
        |ORDER BY vec_id, s""".stripMargin),
    // fleet-level compressed-index recall: every odd probe's ADC top-1
    // vs its exact-L2 top-1 over the same even index, integer counts
    "pq_probe_recall" -> (pqProbeCtes + """,
        |adc1 AS (SELECT q_id, m_id AS adc_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY adc_dist ASC, m_id ASC) AS rn
        |  FROM adc) WHERE rn = 1),
        |bfd AS (SELECT o.vec_id AS q_id, b.vec_id AS b_id,
        |    list_sum([o.embedding[i]::DOUBLE * o.embedding[i]::DOUBLE
        |      for i in range(1, 65)])
        |  - 2 * list_sum([o.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |      for i in range(1, 65)])
        |  + list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |      for i in range(1, 65)]) AS d
        |  FROM embeddings o JOIN embeddings b
        |    ON o.vec_id % 2 = 1 AND b.vec_id % 2 = 0),
        |bf1 AS (SELECT q_id, b_id AS bf_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY d ASC, b_id ASC) AS rn
        |  FROM bfd) WHERE rn = 1)
        |SELECT count(*) AS n_queries,
        |  CAST(sum(CASE WHEN a.adc_id = b.bf_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top1_match,
        |  CAST(sum(CASE WHEN a.adc_id <> b.bf_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_missed
        |FROM adc1 a JOIN bf1 b USING (q_id)""".stripMargin),
    // the sampled fleet audit: probe stratum only; codebook, coded
    // index and the exact ground-truth pool stay the full even half
    "pq_probe_recall_sampled" -> (pqProbeCtesWith(
      "\n        |  AND ('0x' || substr(md5(o.vec_id::VARCHAR), 1, 8))::BIGINT % 100 < 20".stripMargin) + """,
        |adc1 AS (SELECT q_id, m_id AS adc_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY adc_dist ASC, m_id ASC) AS rn
        |  FROM adc) WHERE rn = 1),
        |bfd AS (SELECT o.vec_id AS q_id, b.vec_id AS b_id,
        |    list_sum([o.embedding[i]::DOUBLE * o.embedding[i]::DOUBLE
        |      for i in range(1, 65)])
        |  - 2 * list_sum([o.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |      for i in range(1, 65)])
        |  + list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |      for i in range(1, 65)]) AS d
        |  FROM embeddings o JOIN embeddings b
        |    ON o.vec_id % 2 = 1 AND b.vec_id % 2 = 0
        |    AND ('0x' || substr(md5(o.vec_id::VARCHAR), 1, 8))::BIGINT
        |      % 100 < 20),
        |bf1 AS (SELECT q_id, b_id AS bf_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY d ASC, b_id ASC) AS rn
        |  FROM bfd) WHERE rn = 1)
        |SELECT count(*) AS n_queries,
        |  CAST(sum(CASE WHEN a.adc_id = b.bf_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top1_match,
        |  CAST(sum(CASE WHEN a.adc_id <> b.bf_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_missed
        |FROM adc1 a JOIN bf1 b USING (q_id)""".stripMargin),
    // composed IVF-PQ (IVFADC): trained coarse quantizer, residual
    // codebook, cell-probed ADC — the full production search replayed
    "ivfpq_topk" -> (ivfpqCtes + """
        |SELECT m_id AS vec_id, adc_dist FROM adc
        |ORDER BY adc_dist ASC, vec_id ASC LIMIT 10""".stripMargin),
    "ivfpq_cell_stats" -> (ivfpqCtes + """
        |SELECT cell, count(*) AS n_vectors,
        |  CAST(min(vec_id) AS BIGINT) AS first_vec
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin),
    // distortion_micro: per-row floor to BIGINT micro-units BEFORE the
    // sum (the dsir/bm25 floor discipline) — the residual chain runs
    // through the coarse centroid's decimal→double conversion, which
    // can differ by 1 ulp between engines (Spark BigDecimal rounds
    // once, DuckDB's int128-scaled decimal double-rounds); flooring at
    // the source absorbs it, a raw decimal sum of the doubles does not
    "ivfpq_distortion" -> (ivfpqCtes + """
        |SELECT CAST(s AS BIGINT) AS subspace, COUNT(*) AS n_vectors,
        |  CAST(SUM(CAST(floor(dist * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS distortion_micro
        |FROM rcodes GROUP BY 1 ORDER BY 1""".stripMargin),
    // composed-path fleet recall: residual-ADC top-1 over the probed
    // cells vs exact-L2 top-1 over the FULL even index, plus the IVF
    // ceiling (was the exact winner's cell probed?); a query with no
    // candidates in its probed cells is a miss on both engines
    "ivfpq_probe_recall" -> (ivfpqProbeCtes +
      ivfpqRecallTail("")),
    "ivfpq_probe_recall_sampled" -> (ivfpqProbeCtesWith(
      "\n  AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 100 < 20") +
      ivfpqRecallTail(
        "\n    AND ('0x' || substr(md5(o.vec_id::VARCHAR), 1, 8))::BIGINT % 100 < 20")),
    // IVFADC+R: the exact re-rank of the ADC top-R — exact_dist is a
    // pure raw-float fold (q·q − 2·q·b + b·b), no centroid chain, so
    // the doubles hash directly
    "ivfpq_rerank_topk" -> (ivfpqCtes + s"""
        |,rcand AS (SELECT m_id FROM adc
        |  ORDER BY adc_dist ASC, m_id ASC LIMIT ${ops.Similarity.IvfPqRerankR})
        |SELECT b.vec_id,
        |    q.sq
        |  - 2 * list_sum([q.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |      for i in range(1, 65)])
        |  + list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |      for i in range(1, 65)]) AS exact_dist
        |FROM rcand c JOIN embeddings b ON b.vec_id = c.m_id, qsrc q
        |ORDER BY exact_dist ASC, b.vec_id ASC LIMIT 10""".stripMargin),
    "ivfpq_rerank_recall" -> (ivfpqProbeCtes +
      ivfpqRerankTail("", ops.Similarity.IvfPqRerankR)),
    "ivfpq_rerank_recall_sampled" -> (ivfpqProbeCtesWith(
      "\n  AND ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 100 < 20") +
      ivfpqRerankTail(
        "\n    AND ('0x' || substr(md5(o.vec_id::VARCHAR), 1, 8))::BIGINT % 100 < 20",
        ops.Similarity.IvfPqRerankR)),

    "ivf_recall" ->
      """WITH nrm AS (SELECT vec_id, label, embedding,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, embedding AS c_emb, nrm AS c_nrm
        |  FROM nrm WHERE vec_id < 16),
        |scored AS (SELECT n.vec_id, n.embedding, n.nrm, c.cid,
        |  list_sum([n.embedding[i]::DOUBLE * c.c_emb[i]::DOUBLE
        |            for i in range(1, 65)]) / (n.nrm * c.c_nrm) AS ccos
        |  FROM nrm n, cents c),
        |assigned AS (SELECT vec_id, embedding, nrm, cid AS cell FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM scored) WHERE rn = 1),
        |qcells AS (SELECT cid FROM scored WHERE vec_id = 0
        |  ORDER BY ccos DESC, cid ASC LIMIT 4),
        |qv AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM nrm
        |  WHERE vec_id = 0),
        |ivf AS (SELECT a.vec_id FROM assigned a, qv q
        |  WHERE a.vec_id <> 0 AND a.cell IN (SELECT cid FROM qcells)
        |  ORDER BY list_sum([a.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE
        |    for i in range(1, 65)]) / (a.nrm * q.q_nrm) DESC, a.vec_id ASC
        |  LIMIT 10),
        |bf AS (SELECT e.vec_id FROM nrm e, qv q WHERE e.vec_id <> 0
        |  ORDER BY list_sum([e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE
        |    for i in range(1, 65)]) / (e.nrm * q.q_nrm) DESC, e.vec_id ASC
        |  LIMIT 10),
        |ov AS (SELECT count(*) AS n_overlap FROM ivf
        |  JOIN bf ON ivf.vec_id = bf.vec_id)
        |SELECT CAST(10 AS BIGINT) AS k,
        |CAST(n_overlap AS BIGINT) AS n_overlap,
        |CAST(n_overlap * 1000000 // 10 AS BIGINT) AS recall_ppm
        |FROM ov""".stripMargin,
    // hyperplane-LSH banding audit: same sigs CTE as dedup_embedding_lsh,
    // exact set from the brute-force cosine, integer confusion counts
    "lsh_recall_eval" ->
      """WITH sigs AS (SELECT vec_id, embedding,
        |  list_sum([
        |    CASE WHEN list_sum([
        |      CASE WHEN (('0x' || substr(md5(p::VARCHAR || ',' ||
        |        (i-1)::VARCHAR), 1, 2))::INT & 1) = 0
        |      THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
        |      for i in range(1, 65)]) > 0
        |    THEN (1::BIGINT << p) ELSE 0 END
        |    for p in range(0, 63)])::BIGINT AS sig,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
        |  AND list_sum([CASE WHEN ((xor(a.sig, b.sig) >> (3*t)) & 7) = 0
        |                THEN 1 ELSE 0 END for t in range(0, 21)]) > 0),
        |exact AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
        |  WHERE list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |                  for i in range(1, 65)]) / (a.nrm * b.nrm) >= 0.4),
        |ne AS (SELECT count(*) AS n_exact FROM exact),
        |nc AS (SELECT count(*) AS n_cand FROM cand),
        |ntp AS (SELECT count(*) AS tp FROM cand c
        |  JOIN exact e ON c.vec_a = e.vec_a AND c.vec_b = e.vec_b)
        |SELECT CAST(n_exact AS BIGINT) AS n_exact,
        |CAST(n_cand AS BIGINT) AS n_cand, CAST(tp AS BIGINT) AS tp,
        |CAST(n_exact - tp AS BIGINT) AS fn,
        |CAST(n_cand - tp AS BIGINT) AS fp
        |FROM ne, nc, ntp""".stripMargin,
    // the sampled-stratum execution: pairs restricted by the SMALLER
    // endpoint's md5 coin on both the candidate and ground-truth sides
    "lsh_recall_sampled" ->
      """WITH sigs AS (SELECT vec_id, embedding,
        |  list_sum([
        |    CASE WHEN list_sum([
        |      CASE WHEN (('0x' || substr(md5(p::VARCHAR || ',' ||
        |        (i-1)::VARCHAR), 1, 2))::INT & 1) = 0
        |      THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
        |      for i in range(1, 65)]) > 0
        |    THEN (1::BIGINT << p) ELSE 0 END
        |    for p in range(0, 63)])::BIGINT AS sig,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS nrm,
        |  ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 100
        |    AS coin
        |  FROM embeddings),
        |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
        |  AND a.coin < 20
        |  AND list_sum([CASE WHEN ((xor(a.sig, b.sig) >> (3*t)) & 7) = 0
        |                THEN 1 ELSE 0 END for t in range(0, 21)]) > 0),
        |exact AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
        |  AND a.coin < 20
        |  WHERE list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |                  for i in range(1, 65)]) / (a.nrm * b.nrm) >= 0.4),
        |ne AS (SELECT count(*) AS n_exact FROM exact),
        |nc AS (SELECT count(*) AS n_cand FROM cand),
        |ntp AS (SELECT count(*) AS tp FROM cand c
        |  JOIN exact e ON c.vec_a = e.vec_a AND c.vec_b = e.vec_b)
        |SELECT CAST(n_exact AS BIGINT) AS n_exact,
        |CAST(n_cand AS BIGINT) AS n_cand, CAST(tp AS BIGINT) AS tp,
        |CAST(n_exact - tp AS BIGINT) AS fn,
        |CAST(n_cand - tp AS BIGINT) AS fp
        |FROM ne, nc, ntp""".stripMargin,
    // LSH banding audit: candidates vs exact ground truth, all-integer
    // confusion counts (same banding + verification CTEs as dedup_minhash
    // and dedup_ngram_jaccard)
    "minhash_recall_eval" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |   for i in range(1, len(ws)-1)])) AS s
        |  FROM tok WHERE len(ws) >= 3),
        |hx AS (SELECT doc_id,
        |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS h1,
        |  (('0x' || substr(md5(s), 13, 12))::BIGINT | 1) AS h2 FROM sh),
        |h AS (SELECT doc_id, i, min(h1 + i * h2) AS minh
        |  FROM hx, range(0, 12) t(i) GROUP BY 1, 2),
        |bs AS (SELECT doc_id, (i // 2) AS band,
        |  string_agg(minh::VARCHAR, '|' ORDER BY i) AS bsig
        |  FROM h GROUP BY doc_id, (i // 2)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bs a JOIN bs b ON a.band = b.band AND a.bsig = b.bsig
        |  AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |allp AS (SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
        |  count(*) AS shared FROM sh sa
        |  JOIN sh sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id
        |  GROUP BY 1, 2),
        |exact AS (SELECT doc_a, doc_b FROM allp
        |  JOIN sizes za ON doc_a = za.doc_id
        |  JOIN sizes zb ON doc_b = zb.doc_id
        |  WHERE CAST(shared AS DOUBLE) / (za.n + zb.n - shared) >= 0.8),
        |ne AS (SELECT count(*) AS n_exact FROM exact),
        |nc AS (SELECT count(*) AS n_cand FROM cand),
        |ntp AS (SELECT count(*) AS tp FROM cand c
        |  JOIN exact e ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b)
        |SELECT CAST(n_exact AS BIGINT) AS n_exact,
        |CAST(n_cand AS BIGINT) AS n_cand, CAST(tp AS BIGINT) AS tp,
        |CAST(n_exact - tp AS BIGINT) AS fn,
        |CAST(n_cand - tp AS BIGINT) AS fp
        |FROM ne, nc, ntp""".stripMargin,
    // per-label integer centroid sums and their pairwise dots — all BIGINT
    "label_centroid_affinity" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_max([abs(embedding[i]::DOUBLE) for i in range(1, 65)])
        |      AS max_abs, embedding
        |  FROM embeddings),
        |q AS (SELECT vec_id, label,
        |    [CAST(floor(embedding[i]::DOUBLE * (127.0 / max_abs) + 0.5)
        |      AS BIGINT) for i in range(1, 65)] AS qv
        |  FROM e),
        |x AS (SELECT label, i AS pos, CAST(sum(qv[i]) AS BIGINT) AS s
        |  FROM q, (SELECT unnest(range(1, 65)) AS i) GROUP BY 1, 2),
        |n AS (SELECT label, count(*) AS n FROM q GROUP BY 1)
        |SELECT a.label AS label_a, b.label AS label_b,
        |na.n AS n_a, nb.n AS n_b,
        |CAST(sum(a.s * b.s) AS BIGINT) AS dot_q
        |FROM x a JOIN x b ON a.pos = b.pos AND a.label <= b.label
        |JOIN n na ON na.label = a.label
        |JOIN n nb ON nb.label = b.label
        |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin,
    // the online centroid probe is batch-boundary-independent, so the
    // oracle is the batch rescore: train on the even-vec_id half,
    // classify the streamed odd half, one row per incoming vector
    "stream_centroid_probe" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_max([abs(embedding[i]::DOUBLE) for i in range(1, 65)])
        |      AS max_abs, embedding
        |  FROM embeddings),
        |q AS (SELECT vec_id, label,
        |    [CAST(floor(embedding[i]::DOUBLE * (127.0 / max_abs) + 0.5)
        |      AS BIGINT) for i in range(1, 65)] AS qv
        |  FROM e),
        |x AS (SELECT label, i AS pos, CAST(sum(qv[i]) AS BIGINT) AS s
        |  FROM q, (SELECT unnest(range(1, 65)) AS i)
        |  WHERE vec_id % 2 = 0 GROUP BY 1, 2),
        |c AS (SELECT label AS clabel, list(s ORDER BY pos) AS cv
        |  FROM x GROUP BY 1),
        |cm AS (SELECT clabel, cv,
        |    CAST(list_sum([cv[i] * cv[i] for i in range(1, 65)]) AS BIGINT)
        |      AS m
        |  FROM c),
        |sc AS (SELECT h.vec_id, h.label AS true_label, cm.clabel,
        |    CAST(list_sum([h.qv[i] * cm.cv[i] for i in range(1, 65)])
        |      AS DOUBLE) / sqrt(CAST(cm.m AS DOUBLE)) AS score
        |  FROM q h, cm WHERE h.vec_id % 2 = 1)
        |SELECT vec_id, true_label, clabel AS pred_label FROM (
        |  SELECT vec_id, true_label, clabel, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY score DESC, clabel DESC) AS rn
        |  FROM sc) WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,
    // Rocchio nearest-centroid over quantized embeddings: the train
    // count cancels in cos(v, s/n), so the rank key d/sqrt(m) is ONE
    // sqrt + ONE division of exact BIGINTs — engine-identical
    "centroid_classifier" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_max([abs(embedding[i]::DOUBLE) for i in range(1, 65)])
        |      AS max_abs, embedding
        |  FROM embeddings),
        |q AS (SELECT vec_id, label,
        |    [CAST(floor(embedding[i]::DOUBLE * (127.0 / max_abs) + 0.5)
        |      AS BIGINT) for i in range(1, 65)] AS qv,
        |    ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 100
        |      AS bk
        |  FROM e),
        |x AS (SELECT label, i AS pos, CAST(sum(qv[i]) AS BIGINT) AS s
        |  FROM q, (SELECT unnest(range(1, 65)) AS i)
        |  WHERE bk < 80 GROUP BY 1, 2),
        |c AS (SELECT label AS clabel, list(s ORDER BY pos) AS cv
        |  FROM x GROUP BY 1),
        |cm AS (SELECT clabel, cv,
        |    CAST(list_sum([cv[i] * cv[i] for i in range(1, 65)]) AS BIGINT)
        |      AS m
        |  FROM c),
        |sc AS (SELECT h.vec_id, h.label AS true_label, cm.clabel,
        |    CAST(list_sum([h.qv[i] * cm.cv[i] for i in range(1, 65)])
        |      AS DOUBLE) / sqrt(CAST(cm.m AS DOUBLE)) AS score
        |  FROM q h, cm WHERE h.bk >= 80),
        |p AS (SELECT vec_id, true_label, clabel AS pred_label FROM (
        |  SELECT vec_id, true_label, clabel, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY score DESC, clabel DESC) AS rn
        |  FROM sc) WHERE rn = 1)
        |SELECT true_label, pred_label, count(*) AS n
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // 1-NN over int8-quantized vectors; the rank key sign(d)·d²/n is ONE
    // IEEE division of exact BIGINTs — engine-identical, no fold order
    "knn_label_purity" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_max([abs(embedding[i]::DOUBLE) for i in range(1, 65)])
        |      AS max_abs, embedding
        |  FROM embeddings),
        |q AS (SELECT vec_id, label,
        |    [CAST(floor(embedding[i]::DOUBLE * (127.0 / max_abs) + 0.5)
        |      AS BIGINT) for i in range(1, 65)] AS qv
        |  FROM e),
        |qn AS (SELECT vec_id, label, qv,
        |    CAST(list_sum([qv[i] * qv[i] for i in range(1, 65)]) AS BIGINT)
        |      AS nq
        |  FROM q),
        |p AS (SELECT a.vec_id AS a_id, a.label AS a_label,
        |    b.vec_id AS b_id, b.label AS b_label, b.nq AS b_nq,
        |    CAST(list_sum([a.qv[i] * b.qv[i] for i in range(1, 65)])
        |      AS BIGINT) AS d
        |  FROM qn a JOIN qn b ON a.vec_id <> b.vec_id),
        |s AS (SELECT a_id, a_label, b_label,
        |    CASE WHEN d >= 0
        |      THEN CAST(d * d AS DOUBLE) / CAST(b_nq AS DOUBLE)
        |      ELSE -(CAST(d * d AS DOUBLE) / CAST(b_nq AS DOUBLE)) END
        |      AS score, b_id
        |  FROM p),
        |nn AS (SELECT a_label, b_label FROM (SELECT a_label, b_label,
        |    row_number() OVER (PARTITION BY a_id
        |      ORDER BY score DESC, b_id ASC) AS rn FROM s)
        |  WHERE rn = 1)
        |SELECT a_label AS label, count(*) AS n_vecs,
        |CAST(sum(CASE WHEN a_label = b_label THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_nn_match
        |FROM nn GROUP BY 1 ORDER BY 1""".stripMargin,
    // the sampled-stratum execution: anchors restricted by the md5
    // coin, neighbor pool untouched
    "knn_purity_sampled" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_max([abs(embedding[i]::DOUBLE) for i in range(1, 65)])
        |      AS max_abs, embedding
        |  FROM embeddings),
        |q AS (SELECT vec_id, label,
        |    [CAST(floor(embedding[i]::DOUBLE * (127.0 / max_abs) + 0.5)
        |      AS BIGINT) for i in range(1, 65)] AS qv
        |  FROM e),
        |qn AS (SELECT vec_id, label, qv,
        |    CAST(list_sum([qv[i] * qv[i] for i in range(1, 65)]) AS BIGINT)
        |      AS nq
        |  FROM q),
        |p AS (SELECT a.vec_id AS a_id, a.label AS a_label,
        |    b.vec_id AS b_id, b.label AS b_label, b.nq AS b_nq,
        |    CAST(list_sum([a.qv[i] * b.qv[i] for i in range(1, 65)])
        |      AS BIGINT) AS d
        |  FROM qn a JOIN qn b ON a.vec_id <> b.vec_id
        |  AND ('0x' || substr(md5(a.vec_id::VARCHAR), 1, 8))::BIGINT
        |    % 100 < 20),
        |s AS (SELECT a_id, a_label, b_label,
        |    CASE WHEN d >= 0
        |      THEN CAST(d * d AS DOUBLE) / CAST(b_nq AS DOUBLE)
        |      ELSE -(CAST(d * d AS DOUBLE) / CAST(b_nq AS DOUBLE)) END
        |      AS score, b_id
        |  FROM p),
        |nn AS (SELECT a_label, b_label FROM (SELECT a_label, b_label,
        |    row_number() OVER (PARTITION BY a_id
        |      ORDER BY score DESC, b_id ASC) AS rn FROM s)
        |  WHERE rn = 1)
        |SELECT a_label AS label, count(*) AS n_vecs,
        |CAST(sum(CASE WHEN a_label = b_label THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_nn_match
        |FROM nn GROUP BY 1 ORDER BY 1""".stripMargin,
    // first BPE merge iteration: integer pair counts, deterministic
    // (n DESC, pair ASC) tiebreak
    "bpe_pair_counts" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |p AS (SELECT pair, count(*) AS n FROM (
        |  SELECT unnest([substring(w, i, 2) for i in range(1, length(w))])
        |    AS pair
        |  FROM w WHERE length(w) >= 2) GROUP BY 1),
        |r AS (SELECT pair, n, CAST(row_number() OVER (
        |  ORDER BY n DESC, pair ASC) AS BIGINT) AS rank FROM p)
        |SELECT rank, pair, n FROM r WHERE rank <= 25
        |ORDER BY rank""".stripMargin,
    // FULL BPE training replayed as unrolled CTE rounds (the 2-round
    // Lloyd precedent): same delimiter-wrapped symbol strings, same
    // greedy left-to-right replace, same (n DESC, l, r) argmax —
    // generated from CorpusStats.BpeMergeRounds so the sides can't drift
    "bpe_train_merges" -> {
      val rounds = ops.CorpusStats.BpeMergeRounds
      bpeLoopCtes(rounds) +
        "\nSELECT * FROM (" +
        (1 to rounds).map { i =>
          s"SELECT CAST($i AS BIGINT) AS rank, l || ' ' || r AS pair, n FROM b$i"
        }.mkString("\n  UNION ALL ") +
        ") ORDER BY rank"
    },
    // the trained tokenizer applied back: tokens-per-word histogram over
    // the post-merge word frame (chars = len(s) − 2·tokens)
    "bpe_tokenize_stats" -> {
      val rounds = ops.CorpusStats.BpeMergeRounds
      bpeLoopCtes(rounds) +
        s""",
          |tw AS (SELECT cnt,
          |  CAST(len(string_split(trim(s, '|'), '||')) AS BIGINT)
          |    AS tokens_per_word,
          |  CAST(length(s) - 2 * len(string_split(trim(s, '|'), '||'))
          |    AS BIGINT) AS n_chars
          |  FROM w$rounds)
          |SELECT tokens_per_word, count(*) AS n_words,
          |CAST(sum(cnt) AS BIGINT) AS n_occurrences,
          |CAST(sum(cnt * n_chars) AS BIGINT) AS char_mass,
          |CAST(sum(cnt * tokens_per_word) AS BIGINT) AS token_mass
          |FROM tw GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // tokenizer fertility by domain: the post-merge word frame's symbol
    // strings invert to the original words (merges concatenate, never
    // alter chars), joined against per-(source, word) counts — all
    // integers, one floor-division ppm
    "bpe_compression_by_source" -> {
      val rounds = ops.CorpusStats.BpeMergeRounds
      bpeLoopCtes(rounds) +
        s""",
          |wt AS (SELECT replace(s, '|', '') AS word,
          |  CAST(len(string_split(trim(s, '|'), '||')) AS BIGINT) AS tpw
          |  FROM w$rounds),
          |sw AS (SELECT source, w AS word, CAST(count(*) AS BIGINT) AS c
          |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
          |    FROM documents) WHERE length(w) >= 1 GROUP BY 1, 2),
          |j AS (SELECT source, c, tpw,
          |    CAST(length(word) AS BIGINT) AS chars
          |  FROM sw JOIN wt USING (word)),
          |a AS (SELECT source,
          |    CAST(sum(c) AS BIGINT) AS n_word_occurrences,
          |    CAST(sum(c * chars) AS BIGINT) AS char_mass,
          |    CAST(sum(c * tpw) AS BIGINT) AS token_mass
          |  FROM j GROUP BY source)
          |SELECT source, n_word_occurrences, char_mass, token_mass,
          |  CAST((char_mass * 1000000) // token_mass AS BIGINT)
          |    AS chars_per_token_ppm
          |FROM a ORDER BY source""".stripMargin
    },
    // Heaps'-law growth: all integers; bucket = (doc_id*10) div n_total,
    // clamped so the max doc_id lands in the last bucket
    "vocab_growth" ->
      """WITH nd AS (SELECT count(*) AS n_total FROM documents),
        |tok AS (SELECT doc_id, w AS token FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents) WHERE length(w) > 0),
        |vol AS (SELECT least((doc_id * 10) // n_total, 9) AS bucket,
        |  count(*) AS n_tokens, count(DISTINCT doc_id) AS n_docs
        |  FROM tok, nd GROUP BY 1),
        |fo AS (SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY 1),
        |nt AS (SELECT least((first_doc * 10) // n_total, 9) AS bucket,
        |  count(*) AS new_types FROM fo, nd GROUP BY 1)
        |SELECT CAST(v.bucket AS BIGINT) AS bucket,
        |CAST(n_docs AS BIGINT) AS n_docs,
        |CAST(n_tokens AS BIGINT) AS n_tokens,
        |CAST(coalesce(new_types, 0) AS BIGINT) AS new_types,
        |CAST(sum(n_tokens) OVER (ORDER BY v.bucket
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        |CAST(sum(coalesce(new_types, 0)) OVER (ORDER BY v.bucket
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
        |FROM vol v LEFT JOIN nt ON v.bucket = nt.bucket
        |ORDER BY 1""".stripMargin,
    // last-touch credit over the (ts, event_id) total order; revenue in
    // DECIMAL then rounded, per the float-parity rules
    "attribution_last_touch" ->
      """WITH t AS (SELECT user_id, ts, event_id, event_type, value,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN ts END
        |    IGNORE NULLS) OVER w AS touch_ts,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |    IGNORE NULLS) OVER w AS touch_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT CASE WHEN touch_ts IS NOT NULL
        |  AND epoch_us(ts::TIMESTAMP) - epoch_us(touch_ts::TIMESTAMP)
        |      <= 1800000000
        |  THEN touch_type ELSE 'direct' END AS channel,
        |count(*) AS n_purchases,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS revenue
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the staged stream replays every event twice; a leaky dedup doubles
    // every count, so the plain batch aggregate IS the oracle
    "stream_dedup_replay" ->
      """SELECT event_type, count(*) AS n_events,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the globally-oldest event arrives after the watermark passed it and
    // MUST be dropped — the oracle aggregates events excluding exactly it
    "stream_late_drop" ->
      """WITH excl AS (SELECT event_id FROM events
        |  ORDER BY ts, event_id LIMIT 1)
        |SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
        |count(*) AS n_events,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS total_value
        |FROM events WHERE event_id NOT IN (SELECT event_id FROM excl)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // every record crosses the custom DSv2 source (offset-ranged admission-
    // bounded micro-batches) and sink (manifest-committed epochs); a lost
    // or doubled batch, or a leaked uncommitted attempt file, flips counts
    "dsv2_ingest_rollup" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
        |count(*) AS n_events,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the BATCH read path of the custom topic: the digest pins the
    // user_id-keyed partition assignment AND dense per-partition offsets
    "dsv2_batch_read" ->
      """SELECT CAST(user_id % 4 AS INT) AS partition,
        |count(*) AS n_records,
        |CAST(count(*) - 1 AS BIGINT) AS max_offset,
        |count(DISTINCT user_id) AS n_users,
        |round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |  AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the Spark side decodes REAL BMP bytes (bottom-up BGR rows + padding);
    // the oracle recomputes each pixel arithmetically from doc_id
    "mm_bmp_luminance" ->
      """WITH img AS (SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (SELECT doc_id,
        |    (doc_id * 3 + rr.r + cc.c) % 256 AS red,
        |    (doc_id * 2 + rr.r + cc.c) % 256 AS green,
        |    (doc_id + rr.r + cc.c) % 256 AS blue
        |  FROM img, range(0, 11) rr(r), range(0, 17) cc(c)
        |  WHERE rr.r < h AND cc.c < w)
        |SELECT CAST(doc_id % 10 AS BIGINT) AS bucket,
        |  count(DISTINCT doc_id) AS n_images,
        |  CAST(count(*) AS BIGINT) AS sum_pixels,
        |  CAST(sum(299 * red + 587 * green + 114 * blue) AS BIGINT)
        |    AS sum_luma_milli
        |FROM px GROUP BY 1 ORDER BY 1""".stripMargin,
    // the Spark side dHashes DECODED pixels (8×8 grid, 56-bit gradient
    // signs) and bands the self-join; the oracle recomputes every sampled
    // pixel arithmetically and brute-forces the same Hamming-≤h pairs
    // (banding is exact for h < bands by pigeonhole)
    "mm_image_neardup" -> {
      val h = graft.multimodal.Multimodal.DhashMaxHamming
      s"""$imageDhashCtes,
        |pr AS (SELECT a.doc_id AS da,
        |    bit_count(xor(a.dhash, b.dhash)) AS hm
        |  FROM dh a JOIN dh b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.dhash, b.dhash)) <= $h)
        |SELECT CAST(da % 10 AS BIGINT) AS bucket,
        |  count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN hm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(sum(hm) AS BIGINT) AS sum_hamming,
        |  CAST(max(hm) AS INT) AS max_hamming
        |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // the STREAMING image probe: odd half's arithmetically-recomputed
    // fingerprints brute-forced against the even half's (banding is
    // exact for h < bands, so the drained band join matches this)
    "stream_image_probe" -> {
      val h = graft.multimodal.Multimodal.DhashMaxHamming
      s"""$imageDhashCtes,
        |pr AS (SELECT o.doc_id, b.doc_id AS idoc,
        |    bit_count(xor(o.dhash, b.dhash)) AS hm
        |  FROM dh o JOIN dh b
        |    ON o.doc_id % 6 = 3 AND b.doc_id % 6 = 0
        |    AND bit_count(xor(o.dhash, b.dhash)) <= $h)
        |SELECT doc_id,
        |  CAST(count(DISTINCT idoc) AS BIGINT) AS n_index_matches,
        |  CAST(min(idoc) AS BIGINT) AS first_match,
        |  CAST(min(hm) AS BIGINT) AS min_hamming
        |FROM pr GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // the dedup ACTION on the same fingerprint CTE: group by full hash
    // (Hamming 0 ⇔ equal hash), keep-min survivor, bucketed shrink report
    "mm_image_dedup_survivors" ->
      s"""$imageDhashCtes,
        |sv AS (SELECT dhash, min(doc_id) AS survivor FROM dh GROUP BY 1)
        |SELECT CAST(d.doc_id % 10 AS BIGINT) AS bucket,
        |  count(*) AS n_images,
        |  CAST(sum(CASE WHEN d.doc_id = s.survivor THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_survivors,
        |  CAST(sum(CASE WHEN d.doc_id <> s.survivor THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped
        |FROM dh d JOIN sv s USING (dhash)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the video sibling: per-frame grid dHash over decoded AVI frames
    // folded by per-bit strict majority; the oracle recomputes every
    // sampled pixel, frame bit and majority vote arithmetically, then
    // brute-forces the same Hamming-≤h pair rollup
    "mm_video_neardup" -> {
      val rows = graft.multimodal.Multimodal.DhashGridRows
      val cols = graft.multimodal.Multimodal.DhashGridCols
      val h = graft.multimodal.Multimodal.DhashMaxHamming
      s"""WITH vid AS (SELECT doc_id, 8 + doc_id % 5 AS w,
        |    4 + doc_id % 4 AS h, 2 + doc_id % 5 AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fbit AS (SELECT doc_id, nf, ff.f AS f,
        |    rr.r * ${cols - 1} + cc.c AS j
        |  FROM vid, range(0, 6) ff(f), range(0, $rows) rr(r),
        |    range(0, ${cols - 1}) cc(c)
        |  WHERE ff.f < nf
        |  AND 299 * ((doc_id * 3 + ff.f * 5 + (rr.r * h // $rows) + (cc.c * w // $cols)) % 256)
        |    + 587 * ((doc_id * 2 + ff.f * 3 + (rr.r * h // $rows) + (cc.c * w // $cols)) % 256)
        |    + 114 * ((doc_id + ff.f + (rr.r * h // $rows) + (cc.c * w // $cols)) % 256)
        |    > 299 * ((doc_id * 3 + ff.f * 5 + (rr.r * h // $rows) + ((cc.c + 1) * w // $cols)) % 256)
        |    + 587 * ((doc_id * 2 + ff.f * 3 + (rr.r * h // $rows) + ((cc.c + 1) * w // $cols)) % 256)
        |    + 114 * ((doc_id + ff.f + (rr.r * h // $rows) + ((cc.c + 1) * w // $cols)) % 256)),
        |mb AS (SELECT doc_id, j FROM fbit
        |  GROUP BY doc_id, j, nf HAVING 2 * count(*) > nf),
        |vh AS (SELECT v.doc_id,
        |    CAST(coalesce(sum(1::BIGINT << m.j), 0) AS BIGINT) AS vhash
        |  FROM vid v LEFT JOIN mb m USING (doc_id) GROUP BY 1),
        |pr AS (SELECT a.doc_id AS da,
        |    bit_count(xor(a.vhash, b.vhash)) AS hm
        |  FROM vh a JOIN vh b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.vhash, b.vhash)) <= $h)
        |SELECT CAST(da % 10 AS BIGINT) AS bucket,
        |  count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN hm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(sum(hm) AS BIGINT) AS sum_hamming,
        |  CAST(max(hm) AS INT) AS max_hamming
        |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // the audio sibling: 1-D energy-delta fingerprint over decoded int16
    // samples; the oracle recomputes every sample arithmetically and
    // brute-forces the same Hamming-≤h pairs
    "mm_audio_neardup" -> {
      val nb = graft.multimodal.Multimodal.AudioHashBlocks
      val h = graft.multimodal.Multimodal.DhashMaxHamming
      s"""WITH au AS (SELECT doc_id, 64 + doc_id % 100 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |s AS (SELECT doc_id, n, ii.i AS i,
        |    (doc_id * 31 + ii.i * 7) % 65536 - 32768 AS v
        |  FROM au, range(0, 164) ii(i) WHERE ii.i < n),
        |eb AS (SELECT doc_id, (i * $nb) // n AS b,
        |    CAST(sum(v * v) AS BIGINT) AS e
        |  FROM s GROUP BY 1, 2),
        |bit AS (SELECT a.doc_id, a.b AS j FROM eb a JOIN eb b2
        |  ON b2.doc_id = a.doc_id AND b2.b = a.b + 1 WHERE a.e > b2.e),
        |ah AS (SELECT au.doc_id,
        |    CAST(coalesce(sum(1::BIGINT << bit.j), 0) AS BIGINT) AS ahash
        |  FROM au LEFT JOIN bit USING (doc_id) GROUP BY 1),
        |pr AS (SELECT a.doc_id AS da,
        |    bit_count(xor(a.ahash, b.ahash)) AS hm
        |  FROM ah a JOIN ah b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.ahash, b.ahash)) <= $h)
        |SELECT CAST(da % 10 AS BIGINT) AS bucket,
        |  count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN hm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(sum(hm) AS BIGINT) AS sum_hamming,
        |  CAST(max(hm) AS INT) AS max_hamming
        |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // media → feature vector → IVF: the oracle recomputes the 4×4 block
    // luminance sums per pixel (exact integers in DOUBLE), then replays
    // the sim_ivf cell scheme; cosine doubles hash via the vec_dot fold
    // precedent
    "mm_ann_topk" -> {
      val k = graft.multimodal.Multimodal.MmAnnK
      s"""$mediaIvfCtes,
        |q AS (SELECT vec AS q_vec, nrm AS q_nrm FROM nr WHERE doc_id = 0)
        |SELECT a.doc_id,
        |  list_sum([a.vec[i] * q.q_vec[i] for i in range(1, 17)])
        |    / (a.nrm * q.q_nrm) AS cosine
        |FROM assigned a, q
        |WHERE a.doc_id <> 0 AND a.cell IN (SELECT cid FROM qcells)
        |ORDER BY cosine DESC, doc_id ASC LIMIT $k""".stripMargin
    },
    // IVF∩BF top-k overlap on the media vectors — the approximation
    // audit, recall as an exact ppm integer (the ivf_recall pattern)
    "mm_ann_recall" -> {
      val k = graft.multimodal.Multimodal.MmAnnK
      s"""$mediaIvfCtes,
        |q AS (SELECT vec AS q_vec, nrm AS q_nrm FROM nr WHERE doc_id = 0),
        |ivf AS (SELECT a.doc_id FROM assigned a, q
        |  WHERE a.doc_id <> 0 AND a.cell IN (SELECT cid FROM qcells)
        |  ORDER BY list_sum([a.vec[i] * q.q_vec[i] for i in range(1, 17)])
        |    / (a.nrm * q.q_nrm) DESC, a.doc_id ASC LIMIT $k),
        |bf AS (SELECT e.doc_id FROM nr e, q WHERE e.doc_id <> 0
        |  ORDER BY list_sum([e.vec[i] * q.q_vec[i] for i in range(1, 17)])
        |    / (e.nrm * q.q_nrm) DESC, e.doc_id ASC LIMIT $k),
        |ov AS (SELECT count(*) AS n_overlap FROM ivf
        |  JOIN bf ON ivf.doc_id = bf.doc_id)
        |SELECT CAST($k AS BIGINT) AS k,
        |CAST(n_overlap AS BIGINT) AS n_overlap,
        |CAST(n_overlap * 1000000 // $k AS BIGINT) AS recall_ppm
        |FROM ov""".stripMargin
    },
    // the hash pins the sketch ERROR CONTRACT: exact count + in-bound
    // boolean (sketch estimates themselves aren't cross-engine comparable)
    "approx_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |TRUE AS approx_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "approx_value_quantiles" ->
      """SELECT event_type, count(*) AS n, TRUE AS p50_ok, TRUE AS p99_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the Spark side walks REAL RIFF chunks back to int16 samples; sum_rate
    // pins the fmt-chunk parse (8000 Hz per clip)
    "mm_wav_energy" ->
      """WITH au AS (SELECT doc_id, 64 + doc_id % 100 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |s AS (SELECT doc_id, (doc_id * 31 + ii.i * 7) % 65536 - 32768 AS v
        |  FROM au, range(0, 164) ii(i) WHERE ii.i < n)
        |SELECT CAST(doc_id % 10 AS BIGINT) AS bucket,
        |  count(DISTINCT doc_id) AS n_clips,
        |  CAST(count(*) AS BIGINT) AS sum_samples,
        |  CAST(sum(v * v) AS BIGINT) AS sum_energy,
        |  CAST(count(DISTINCT doc_id) * 8000 AS BIGINT) AS sum_rate
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // the Spark side walks a REAL RIFF AVI back (avih header, strf gate,
    // '00db' DIB frames) and samples every AviSampleStep-th frame; the
    // oracle recomputes each sampled frame's pixels AND the avih-derived
    // timestamp sum arithmetically from doc_id
    "mm_avi_frames" ->
      s"""WITH vid AS (SELECT doc_id, 8 + doc_id % 5 AS w, 4 + doc_id % 4 AS h,
        |    2 + doc_id % 5 AS nf, 20 + doc_id % 30 AS ms_pf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT doc_id, w, h, ms_pf, ff.f AS f
        |  FROM vid, range(0, 7) ff(f)
        |  WHERE ff.f < nf
        |    AND ff.f % ${graft.multimodal.Multimodal.AviSampleStep} = 0),
        |pf AS (SELECT doc_id, f, min(ms_pf * f) AS frame_ms,
        |    count(*) AS npx,
        |    sum(299 * ((doc_id * 3 + f * 5 + rr.r + cc.c) % 256)
        |      + 587 * ((doc_id * 2 + f * 3 + rr.r + cc.c) % 256)
        |      + 114 * ((doc_id + f + rr.r + cc.c) % 256)) AS luma
        |  FROM fr, range(0, 8) rr(r), range(0, 13) cc(c)
        |  WHERE rr.r < h AND cc.c < w GROUP BY 1, 2)
        |SELECT CAST(doc_id % 10 AS BIGINT) AS bucket,
        |  count(DISTINCT doc_id) AS n_videos,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(frame_ms) AS BIGINT) AS sum_frame_ms,
        |  CAST(sum(npx) AS BIGINT) AS sum_pixels,
        |  CAST(sum(luma) AS BIGINT) AS sum_luma_milli
        |FROM pf GROUP BY 1 ORDER BY 1""".stripMargin,
    // CCNet perplexity bands replayed in SQL: one PortableLn per MODEL
    // bigram (same staged +-*/ pipeline both engines), negated-floored to
    // BIGINT micro-nats at the source, so per-doc sums, the integer-
    // division average, and the band CASE are all exact integer
    // arithmetic; band cutoffs interpolate from the same constants the
    // operator uses (CorpusStats.LmPpxHeadMicro / LmPpxMiddleMicro)
    "quality_lm_ppx" -> {
      val head = ops.CorpusStats.LmPpxHeadMicro
      val mid = ops.CorpusStats.LmPpxMiddleMicro
      val (plCtes, plOut) = functions.PortableLn.sqlCtes(
        "pl", "m12 JOIN m1 ON split_part(m_bg, ' ', 1) = m_w1, voc",
        Seq("m_bg"),
        "(c12 + 1)::DOUBLE / (c1 + v)::DOUBLE", "lnx")
      s"""WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |  FROM documents),
        |bi AS (SELECT doc_id, source, unnest(
        |    [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tok WHERE len(ws) >= 2),
        |m12 AS (SELECT bg AS m_bg, CAST(count(*) AS BIGINT) AS c12
        |  FROM bi GROUP BY 1),
        |m1 AS (SELECT split_part(m_bg, ' ', 1) AS m_w1,
        |    CAST(sum(c12) AS BIGINT) AS c1 FROM m12 GROUP BY 1),
        |voc AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM
        |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
        |$plCtes,
        |term AS (SELECT m_bg,
        |    CAST(0 - floor(lnx * 1e6) AS BIGINT) AS nll_micro
        |  FROM $plOut),
        |sc AS (SELECT doc_id, any_value(source) AS source,
        |    CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(nll_micro) AS BIGINT) AS nll_sum
        |  FROM bi JOIN term ON bg = m_bg GROUP BY doc_id),
        |bands AS (SELECT source, n_bigrams, nll_sum,
        |    CASE WHEN nll_sum // n_bigrams < $head THEN 'head'
        |      WHEN nll_sum // n_bigrams < $mid THEN 'middle'
        |      ELSE 'tail' END AS band
        |  FROM sc)
        |SELECT source, band, count(*) AS n_docs,
        |  CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
        |  CAST(sum(nll_sum) AS BIGINT) AS sum_nll_micro
        |FROM bands GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // temperature mixture at alpha = 1/2: the only non-integer op is ONE
    // IEEE sqrt per source (correctly rounded by the 754 spec in every
    // engine), floored to BIGINT immediately — shares, quotas, epoch
    // factors, and the md5 acceptance coin are exact integers after it
    "sampling_temperature_mix" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_avail,
        |    CAST(floor(sqrt(count(*))) AS BIGINT) AS w_isqrt
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(w_isqrt) AS BIGINT) AS tot_w,
        |    CAST(sum(n_avail) AS BIGINT) AS tot_avail FROM c),
        |q AS (SELECT lang, n_avail, w_isqrt,
        |    CAST((w_isqrt * 1000000) // tot_w AS BIGINT) AS share_ppm
        |  FROM c, t),
        |q2 AS (SELECT q.*, CAST(least(
        |      (share_ppm * (t.tot_avail // 2)) // 1000000, n_avail)
        |    AS BIGINT) AS n_quota FROM q, t),
        |q3 AS (SELECT q2.*,
        |    CAST((n_quota * 1000000) // n_avail AS BIGINT) AS epochs_ppm
        |  FROM q2)
        |SELECT d.lang, q3.n_avail, q3.w_isqrt, q3.share_ppm, q3.n_quota,
        |  q3.epochs_ppm, count(*) AS n_kept,
        |  CAST(sum(ceil(n_chars / 4.0)::BIGINT) AS BIGINT) AS sum_est_tokens
        |FROM documents d JOIN q3 ON d.lang = q3.lang
        |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
        |      % q3.n_avail < q3.n_quota
        |GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY 1""".stripMargin,
    // Gopher funnel replayed in SQL: identical integer cross-multiplied
    // gates, first-failing-stage attribution, then the one aggregate row
    // unpivoted as UNION ALL arms (Spark unpivots via stack); gate
    // thresholds interpolate from TextAnalysis.FunnelMinTokens/MaxTokens
    // per-dimension audit under the shared SQ8 scheme: scale computed
    // ONCE per vector ((127/max_abs) then v*scale+0.5 — the op ORDER is
    // pinned on both sides, correctly-rounded IEEE ops on identical bits),
    // floored to integers at the source; all gated stats are integer
    "embedding_dim_stats" ->
      """WITH e AS (SELECT vec_id, embedding,
        |    127e0 / list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS scale
        |  FROM embeddings),
        |u AS (SELECT unnest([{'dim': i - 1,
        |      'qx': floor(CAST(embedding[i] AS DOUBLE) * scale + 5e-1)}
        |    for i in range(1, 1 + len(embedding))]) AS s
        |  FROM e),
        |q AS (SELECT CAST(s.dim AS BIGINT) AS dim,
        |    CAST(s.qx AS BIGINT) AS qx FROM u),
        |a AS (SELECT dim, count(*) AS n_vecs,
        |    CAST(sum(qx) AS BIGINT) AS sum_q,
        |    CAST(sum(qx * qx) AS BIGINT) AS sum_q2,
        |    CAST(sum(CASE WHEN qx = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_zero,
        |    min(qx) AS min_q, max(qx) AS max_q
        |  FROM q GROUP BY 1)
        |SELECT dim, n_vecs, sum_q, sum_q2, n_zero, min_q, max_q,
        |  CAST(n_vecs * sum_q2 - sum_q * sum_q AS BIGINT) AS var_num
        |FROM a ORDER BY dim""".stripMargin,
    "quality_filter_funnel" -> funnelOracle(""),
    // the STREAMING probe folds per-batch partial funnel aggregates into
    // the identical presentation — same SQL builder, one WHERE apart
    // (only the odd half streams in)
    "stream_quality_gate" -> funnelOracle("WHERE doc_id % 2 = 1"),
    // quantized BM25 replay: idf is PortableLn of the exact-integer
    // quotient (2N+2)/(2df+1) floored to micro-nats; the tf saturation
    // is the k1=6/5, b=3/4 form cross-multiplied to pure BIGINT (dl/avgdl
    // pre-quantized to ppm by one integer floor-division) — so score and
    // the top-k boundary are exact integers in both engines. Query terms
    // and k interpolate from Retrieval.Bm25QueryTerms/Bm25K.
    "bm25_topk" ->
      s"""WITH ${bm25CoreSql()}
        |SELECT doc_id, source, n_terms_hit, score_micro FROM agg
        |ORDER BY score_micro DESC, doc_id LIMIT ${ops.Retrieval.Bm25K}"""
        .stripMargin,
    // ranking-quality audit: per-fleet-query nDCG@k (graded pseudo-
    // qrels = #query terms matched) + MRR of the first full match;
    // rank discounts are the precomputed NdcgWeightsPpm literals, so
    // neither engine evaluates a transcendental at query time
    "retrieval_ndcg" -> {
      val k = ops.Retrieval.NdcgK
      val qvals = ops.Retrieval.NdcgQueries
        .flatMap { case (q, ws) => ws.map(w => s"($q, '$w')") }
        .mkString(", ")
      val wvals = ops.Retrieval.NdcgWeightsPpm.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
      val (plCtes, plOut) = functions.PortableLn.sqlCtes(
        "pl", "dfreq, corpus", Seq("w"),
        "(n_docs * 2 + 2)::DOUBLE / (df * 2 + 1)::DOUBLE", "lnx")
      s"""WITH qt(qid, w) AS (VALUES $qvals),
        |wt(rnk, wppm) AS (VALUES $wvals),
        |ql AS (SELECT qid, CAST(count(*) AS BIGINT) AS qlen
        |  FROM qt GROUP BY 1),
        |ts AS (SELECT doc_id, w FROM (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0),
        |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS sum_dl FROM (SELECT doc_id,
        |      count(*) AS dl FROM ts GROUP BY doc_id)),
        |dfreq AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM ts JOIN (SELECT DISTINCT w FROM qt) q USING (w)
        |  GROUP BY w),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |  FROM ts GROUP BY doc_id),
        |tf AS (SELECT qt.qid, ts.doc_id, ts.w,
        |    CAST(count(*) AS BIGINT) AS tf
        |  FROM ts JOIN qt USING (w) GROUP BY 1, 2, 3),
        |$plCtes,
        |idf AS (SELECT w, CAST(floor(lnx * 1e6) AS BIGINT) AS idf_micro
        |  FROM $plOut),
        |sc AS (SELECT tf.qid, tf.doc_id,
        |    22 * ((idf_micro * tf.tf * 1000000) //
        |      (10 * tf.tf * 1000000 + 3000000 +
        |       9 * ((dl.dl * n_docs * 1000000) // sum_dl))) AS term_score
        |  FROM tf JOIN idf USING (w) JOIN dl USING (doc_id), corpus),
        |agg AS MATERIALIZED (SELECT qid, doc_id,
        |    CAST(count(*) AS BIGINT) AS gain,
        |    CAST(sum(term_score) AS BIGINT) AS score_micro
        |  FROM sc GROUP BY 1, 2),
        |rk AS (SELECT qid, doc_id, gain, rn FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY score_micro DESC, doc_id) AS rn
        |  FROM agg) WHERE rn <= $k),
        |dcg AS (SELECT qid, CAST(sum(gain * wppm) AS BIGINT) AS dcg_ppm
        |  FROM rk JOIN wt ON wt.rnk = rk.rn GROUP BY 1),
        |irk AS (SELECT qid, gain, rn FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY gain DESC, doc_id) AS rn
        |  FROM agg) WHERE rn <= $k),
        |idcg AS (SELECT qid, CAST(sum(gain * wppm) AS BIGINT) AS idcg_ppm
        |  FROM irk JOIN wt ON wt.rnk = irk.rn GROUP BY 1),
        |nc AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_cand
        |  FROM agg GROUP BY 1),
        |ff AS (SELECT rk.qid, CAST(min(rn) AS BIGINT) AS first_full_rank
        |  FROM rk JOIN ql USING (qid) WHERE rk.gain = ql.qlen GROUP BY 1)
        |SELECT CAST(ql.qid AS BIGINT) AS qid, ql.qlen,
        |  coalesce(nc.n_cand, 0) AS n_cand,
        |  coalesce(dcg.dcg_ppm, 0) AS dcg_ppm,
        |  coalesce(idcg.idcg_ppm, 0) AS idcg_ppm,
        |  CASE WHEN coalesce(idcg.idcg_ppm, 0) = 0 THEN NULL
        |    ELSE CAST(dcg.dcg_ppm::HUGEINT * 1000000 // idcg.idcg_ppm
        |      AS BIGINT) END AS ndcg_ppm,
        |  ff.first_full_rank,
        |  CAST(CASE WHEN ff.first_full_rank IS NULL THEN 0
        |    ELSE 1000000 // ff.first_full_rank END AS BIGINT) AS rr_ppm
        |FROM ql LEFT JOIN nc USING (qid) LEFT JOIN dcg USING (qid)
        |LEFT JOIN idcg USING (qid) LEFT JOIN ff USING (qid)
        |ORDER BY qid""".stripMargin
    },
    // RRF replay over the SAME bm25 core CTEs (one definition, two
    // greedy MMR unrolled: each selection round is a CTE over the
    // materialized 50-candidate pool and its pairwise sim frame; the
    // score is two IEEE multiplies on the shared cosine folds
    "mmr_diversified_topk" -> {
      val k = ops.Retrieval.MmrK
      val pool = ops.Retrieval.MmrPool
      val qid = ops.Retrieval.MmrQueryId
      val rounds = (2 to k).map { r =>
        val sel = (1 until r).map(i => s"SELECT m_id FROM s$i")
          .mkString(" UNION ALL ")
        s""",
        |s$r AS (SELECT $r AS rank, c.m_id, c.rel,
        |  0.5 * c.rel - 0.5 * max(s.sim) AS score
        |  FROM pool c JOIN sims s ON s.a_id = c.m_id
        |  WHERE s.b_id IN ($sel) AND c.m_id NOT IN ($sel)
        |  GROUP BY c.m_id, c.rel
        |  ORDER BY score DESC, c.m_id LIMIT 1)""".stripMargin
      }.mkString
      val unions = (1 to k).map(i => s"SELECT * FROM s$i")
        .mkString(" UNION ALL ")
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding,
        |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |                 for i in range(1, 65)])) AS nrm
        |  FROM embeddings),
        |q AS (SELECT embedding AS qemb, nrm AS qnrm FROM e
        |  WHERE vec_id = $qid),
        |pool AS MATERIALIZED (SELECT e.vec_id AS m_id, e.embedding,
        |  e.nrm,
        |  list_sum([e.embedding[j]::DOUBLE * q.qemb[j]::DOUBLE
        |            for j in range(1, 65)]) / (e.nrm * q.qnrm) AS rel
        |  FROM e, q WHERE e.vec_id <> $qid
        |  ORDER BY rel DESC, m_id ASC LIMIT $pool),
        |sims AS MATERIALIZED (SELECT a.m_id AS a_id, b.m_id AS b_id,
        |  list_sum([a.embedding[j]::DOUBLE * b.embedding[j]::DOUBLE
        |            for j in range(1, 65)]) / (a.nrm * b.nrm) AS sim
        |  FROM pool a, pool b WHERE a.m_id <> b.m_id),
        |s1 AS (SELECT 1 AS rank, m_id, rel, rel AS score FROM pool
        |  ORDER BY rel DESC, m_id LIMIT 1)""".stripMargin + rounds +
      s"""
        |SELECT CAST(rank AS BIGINT) AS rank, m_id, rel, score
        |FROM ($unions) ORDER BY rank""".stripMargin
    },
    // oracles) plus the sim_topk_bruteforce cosine arm; reciprocals are
    // integer floor-divisions, ranks are row_numbers over total orders
    "rrf_fusion" -> {
      val k = ops.Retrieval.Bm25K
      val c = ops.Retrieval.RrfC
      val qid = ops.Retrieval.RrfQueryId
      s"""WITH ${bm25CoreSql()},
        |lexr AS (SELECT doc_id, row_number() OVER
        |    (ORDER BY score_micro DESC, doc_id) AS rank_lex
        |  FROM agg ORDER BY score_micro DESC, doc_id LIMIT $k),
        |e AS (SELECT vec_id, embedding,
        |    sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
        |      for i in range(1, 65)])) AS nrm FROM embeddings),
        |vq AS (SELECT embedding AS qemb, nrm AS qnrm FROM e
        |  WHERE vec_id = $qid),
        |cos AS (SELECT e.vec_id AS doc_id,
        |    list_sum([e.embedding[i]::DOUBLE * vq.qemb[i]::DOUBLE
        |      for i in range(1, 65)]) / (e.nrm * vq.qnrm) AS cosine
        |  FROM e, vq WHERE e.vec_id <> $qid),
        |vecr AS (SELECT doc_id, row_number() OVER
        |    (ORDER BY cosine DESC, doc_id) AS rank_vec
        |  FROM cos ORDER BY cosine DESC, doc_id LIMIT $k),
        |f AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
        |    rank_lex, rank_vec
        |  FROM lexr l FULL JOIN vecr v ON l.doc_id = v.doc_id)
        |SELECT doc_id, rank_lex, rank_vec,
        |  CAST(coalesce(1000000 // ($c + rank_lex), 0) +
        |       coalesce(1000000 // ($c + rank_vec), 0) AS BIGINT) AS rrf_ppm
        |FROM f ORDER BY rrf_ppm DESC, doc_id LIMIT $k""".stripMargin
    },
    // per-doc Shannon entropy replay: ln only of DISTINCT integer token
    // tallies (PortableLn, floored to micro-nats), then H·len =
    // Σ c·(lnL−lnc) and the half-nat band id are exact BIGINT arithmetic
    // (floor is monotone, so every difference and DIV is nonnegative)
    "text_entropy_bands" -> {
      val (plCtes, plOut) = functions.PortableLn.sqlCtes(
        "pl", "vals", Seq("v"), "v::DOUBLE", "lnx")
      s"""WITH tt AS (SELECT doc_id, w FROM (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0),
        |cnts AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |  FROM tt GROUP BY 1, 2),
        |lens AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS len
        |  FROM cnts GROUP BY 1),
        |vals AS (SELECT DISTINCT c AS v FROM cnts
        |  UNION SELECT DISTINCT len AS v FROM lens),
        |$plCtes,
        |lnv AS (SELECT v, CAST(floor(lnx * 1e6) AS BIGINT) AS ln_micro
        |  FROM $plOut),
        |ent AS (SELECT cnts.doc_id, lens.len,
        |    CAST(sum(c * (l2.ln_micro - l1.ln_micro)) AS BIGINT)
        |      AS ent_scaled
        |  FROM cnts JOIN lnv l1 ON cnts.c = l1.v
        |  JOIN lens ON cnts.doc_id = lens.doc_id
        |  JOIN lnv l2 ON lens.len = l2.v
        |  GROUP BY 1, 2),
        |b AS (SELECT len, ent_scaled // len AS per_tok_micro,
        |    (ent_scaled // len) // ${ops.CorpusStats.EntropyBandMicro}
        |      AS band
        |  FROM ent)
        |SELECT band, count(*) AS n_docs,
        |  CAST(sum(len) AS BIGINT) AS sum_tokens,
        |  min(per_tok_micro) AS min_ent_micro,
        |  max(per_tok_micro) AS max_ent_micro
        |FROM b GROUP BY band ORDER BY band""".stripMargin
    },
    // pairwise smoothed-KL replay: same md5 bucket model (KlBuckets),
    // dense grid zero-filled, one PortableLn per (pair, bucket) floored
    // to micro-nats; the divergence stays an UNNORMALIZED integer sum
    // next to its smoothed mass (see the operator scaladoc for why the
    // division is left to the reader)
    "kl_source_drift" -> {
      val nB = ops.CorpusStats.KlBuckets
      val (plCtes, plOut) = functions.PortableLn.sqlCtes(
        "pl", "px", Seq("source_a", "source_b", "ca", "na"),
        s"((ca + 1) * (nb_tot + $nB))::DOUBLE / " +
          s"((cb + 1) * (na + $nB))::DOUBLE", "lnx")
      s"""WITH tb AS (SELECT source,
        |    ('0x' || substr(md5(w), 1, 8))::BIGINT % $nB AS b
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents) WHERE length(w) > 0),
        |cnt AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c
        |  FROM tb GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |  FROM cnt GROUP BY 1),
        |grid AS (SELECT ns.source, ns.n, r.b,
        |    CAST(coalesce(cnt.c, 0) AS BIGINT) AS c
        |  FROM ns CROSS JOIN range(0, $nB) r(b)
        |  LEFT JOIN cnt ON cnt.source = ns.source AND cnt.b = r.b),
        |px AS (SELECT a.source AS source_a, q.source AS source_b,
        |    a.c AS ca, a.n AS na, q.c AS cb, q.n AS nb_tot
        |  FROM grid a JOIN grid q
        |    ON a.b = q.b AND a.source <> q.source),
        |$plCtes,
        |terms AS (SELECT source_a, source_b, na,
        |    (ca + 1) * CAST(floor(lnx * 1e6) AS BIGINT) AS t
        |  FROM $plOut)
        |SELECT source_a, source_b,
        |  CAST(any_value(na) + $nB AS BIGINT) AS n_smoothed_a,
        |  CAST(sum(t) AS BIGINT) AS kl_scaled_micro
        |FROM terms GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // the STREAMING probe scores the odd half against the even-half
    // frozen model — same SQL builder, the two slice filters apart
    "stream_bm25_probe" ->
      s"""WITH ${bm25CoreSql("WHERE doc_id % 2 = 0", "WHERE doc_id % 2 = 1")}
        |SELECT doc_id, source, n_terms_hit, score_micro FROM agg
        |ORDER BY doc_id""".stripMargin,
    // STREAMING drift-alarm replay: incoming = odd-half (source, bucket)
    // counts (the drained additive partials fold to exactly these),
    // history = the frozen even-half bucket distribution, dense-filled;
    // same smoothed-KL quantization contract as kl_source_drift
    "stream_kl_probe" -> {
      val nB = ops.CorpusStats.KlBuckets
      val (plCtes, plOut) = functions.PortableLn.sqlCtes(
        "pl", "px", Seq("source", "c", "n"), "xx", "lnx")
      s"""WITH tbi AS (SELECT source,
        |    ('0x' || substr(md5(w), 1, 8))::BIGINT % $nB AS b
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE doc_id % 2 = 1) WHERE length(w) > 0),
        |inc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c
        |  FROM tbi GROUP BY 1, 2),
        |tbh AS (SELECT ('0x' || substr(md5(w), 1, 8))::BIGINT % $nB AS b
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE doc_id % 2 = 0) WHERE length(w) > 0),
        |hist0 AS (SELECT b, CAST(count(*) AS BIGINT) AS ch
        |  FROM tbh GROUP BY b),
        |hist AS (SELECT r.b, CAST(coalesce(hist0.ch, 0) AS BIGINT) AS ch
        |  FROM range(0, $nB) r(b) LEFT JOIN hist0 USING (b)),
        |nh AS (SELECT CAST(sum(ch) AS BIGINT) AS n_h FROM hist),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |  FROM inc GROUP BY source),
        |grid AS (SELECT ns.source, ns.n, r.b,
        |    CAST(coalesce(inc.c, 0) AS BIGINT) AS c
        |  FROM ns CROSS JOIN range(0, $nB) r(b)
        |  LEFT JOIN inc ON inc.source = ns.source AND inc.b = r.b),
        |px AS (SELECT g.source, g.c, g.n,
        |    ((g.c + 1) * (n_h + $nB))::DOUBLE /
        |      ((h.ch + 1) * (g.n + $nB))::DOUBLE AS xx
        |  FROM grid g JOIN hist h ON g.b = h.b, nh),
        |$plCtes,
        |terms AS (SELECT source, n,
        |    (c + 1) * CAST(floor(lnx * 1e6) AS BIGINT) AS t
        |  FROM $plOut)
        |SELECT source, CAST(any_value(n) + $nB AS BIGINT) AS n_smoothed,
        |  CAST(sum(t) AS BIGINT) AS kl_scaled_micro
        |FROM terms GROUP BY source ORDER BY source""".stripMargin
    },
    // JL audit replay: the ±1 sign matrix derives from md5("p,d")
    // first-byte parity in BOTH engines (the sim_ann_lsh precedent);
    // projections and cosines are dim-ordered double folds, the band id
    // floors identical doubles — exact histogram
    "embedding_jl_distortion" -> {
      val m = ops.Similarity.JlDims
      s"""WITH pr AS (SELECT vec_id, embedding,
        |  [list_sum([CASE WHEN (('0x' || substr(md5(p::VARCHAR || ',' ||
        |      (i-1)::VARCHAR), 1, 2))::INT & 1) = 0
        |    THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
        |    for i in range(1, 65)]) for p in range(0, $m)] AS proj
        |  FROM embeddings),
        |j AS (SELECT a.vec_id,
        |  list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |    for i in range(1, 65)]) /
        |  (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
        |    for i in range(1, 65)])) *
        |   sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
        |    for i in range(1, 65)]))) AS cos64,
        |  list_sum([a.proj[i] * b.proj[i] for i in range(1, ${m + 1})]) /
        |  (sqrt(list_sum([a.proj[i] * a.proj[i] for i in range(1, ${m + 1})])) *
        |   sqrt(list_sum([b.proj[i] * b.proj[i] for i in range(1, ${m + 1})])))
        |    AS cos16
        |  FROM pr a JOIN pr b ON b.vec_id = a.vec_id + 1)
        |SELECT CAST(floor((cos16 - cos64) * 20e0) AS BIGINT) AS band,
        |  count(*) AS n_pairs,
        |  min(vec_id) AS first_pair, max(vec_id) AS last_pair
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // shard shuffle-quality replay: same md5 shard coin as
    // shard_assignment, the text_entropy_bands distinct-count ln
    // discipline at the (shard, source) grain
    "shard_mix_entropy" -> {
      val (plCtes, plOut) = functions.PortableLn.sqlCtes(
        "pl", "vals", Seq("v"), "v::DOUBLE", "lnx")
      s"""WITH sh AS (SELECT
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 16
        |      AS shard, source FROM documents),
        |cnt AS (SELECT shard, source, CAST(count(*) AS BIGINT) AS c
        |  FROM sh GROUP BY 1, 2),
        |tot AS (SELECT shard, CAST(sum(c) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_sources FROM cnt GROUP BY 1),
        |vals AS (SELECT DISTINCT c AS v FROM cnt
        |  UNION SELECT DISTINCT n_docs AS v FROM tot),
        |$plCtes,
        |lnv AS (SELECT v, CAST(floor(lnx * 1e6) AS BIGINT) AS ln_micro
        |  FROM $plOut),
        |ent AS (SELECT cnt.shard, tot.n_docs, tot.n_sources,
        |    CAST(sum(c * (l2.ln_micro - l1.ln_micro)) AS BIGINT)
        |      AS mix_ent_scaled
        |  FROM cnt JOIN lnv l1 ON cnt.c = l1.v
        |  JOIN tot ON cnt.shard = tot.shard
        |  JOIN lnv l2 ON tot.n_docs = l2.v
        |  GROUP BY 1, 2, 3)
        |SELECT shard, n_docs, n_sources, mix_ent_scaled,
        |  mix_ent_scaled // n_docs AS per_doc_mix_micro
        |FROM ent ORDER BY shard""".stripMargin
    },
    // contrastive pair mining replay: integer lexical-diversity score,
    // two rank directions with mirrored doc_id tie-breaks, extremes
    // paired on (source, rank) with the exact-integer sanity predicates
    "preference_pairs" -> {
      val k = ops.TrainingSets.PrefPairsPerSource
      s"""WITH tt AS (SELECT doc_id, source, w FROM (SELECT doc_id, source,
        |    unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0),
        |s AS (SELECT doc_id, any_value(source) AS source,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT w) AS BIGINT) AS n_types
        |  FROM tt GROUP BY doc_id),
        |sc AS (SELECT doc_id, source,
        |    (n_types * 1000000) // n_tokens AS score FROM s),
        |best AS (SELECT source, row_number() OVER (PARTITION BY source
        |    ORDER BY score DESC, doc_id ASC) AS pair_rank,
        |    doc_id AS chosen_doc, score AS chosen_score FROM sc),
        |worst AS (SELECT source, row_number() OVER (PARTITION BY source
        |    ORDER BY score ASC, doc_id DESC) AS pair_rank,
        |    doc_id AS rejected_doc, score AS rejected_score FROM sc)
        |SELECT b.source, b.pair_rank, chosen_doc, rejected_doc,
        |  CAST(chosen_score - rejected_score AS BIGINT) AS margin_micro
        |FROM best b JOIN worst w
        |  ON b.source = w.source AND b.pair_rank = w.pair_rank
        |WHERE b.pair_rank <= $k AND chosen_doc <> rejected_doc
        |  AND chosen_score > rejected_score
        |ORDER BY b.source, b.pair_rank""".stripMargin
    }
  )

  /** Quantized-BM25 DuckDB core (through the per-doc `agg` CTE): the
    * PortableLn idf ladder over the |Q|-term df frame, the
    * cross-multiplied integer tf saturation, ppm-quantized dl/avgdl.
    * Parameterized by the MODEL slice (idf + corpus stats) and the
    * SCORED slice (tf + doc length) — both empty reproduces the batch
    * self-scored corpus; the streaming probe freezes the model on the
    * history half. One definition serves bm25_topk, the rrf_fusion
    * lexical arm and stream_bm25_probe so the scoring cannot drift
    * between their oracles. Query terms interpolate from
    * Retrieval.Bm25QueryTerms.
    */
  private def bm25CoreSql(modelWhere: String = "",
                          scoreWhere: String = ""): String = {
    val q = ops.Retrieval.Bm25QueryTerms.map(t => s"('$t')").mkString(", ")
    val (plCtes, plOut) = functions.PortableLn.sqlCtes(
      "pl", "dfreq, corpus", Seq("w"),
      "(n_docs * 2 + 2)::DOUBLE / (df * 2 + 1)::DOUBLE", "lnx")
    s"""q(w) AS (VALUES $q),
      |tm AS (SELECT doc_id, w FROM (SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS w FROM documents $modelWhere)
      |  WHERE length(w) > 0),
      |ts AS (SELECT doc_id, source, w FROM (SELECT doc_id, source,
      |    unnest(string_split(text, ' ')) AS w FROM documents $scoreWhere)
      |  WHERE length(w) > 0),
      |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(dl) AS BIGINT) AS sum_dl FROM (SELECT doc_id,
      |      count(*) AS dl FROM tm GROUP BY doc_id)),
      |dfreq AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM tm JOIN q USING (w) GROUP BY w),
      |dl AS (SELECT doc_id, any_value(source) AS source,
      |    CAST(count(*) AS BIGINT) AS dl FROM ts GROUP BY doc_id),
      |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      |  FROM ts JOIN q USING (w) GROUP BY 1, 2),
      |$plCtes,
      |idf AS (SELECT w, CAST(floor(lnx * 1e6) AS BIGINT) AS idf_micro
      |  FROM $plOut),
      |sc AS (SELECT tf.doc_id, dl.source,
      |    22 * ((idf_micro * tf.tf * 1000000) //
      |      (10 * tf.tf * 1000000 + 3000000 +
      |       9 * ((dl.dl * n_docs * 1000000) // sum_dl))) AS term_score
      |  FROM tf JOIN idf USING (w) JOIN dl USING (doc_id), corpus),
      |agg AS (SELECT doc_id, any_value(source) AS source,
      |    CAST(count(*) AS BIGINT) AS n_terms_hit,
      |    CAST(sum(term_score) AS BIGINT) AS score_micro
      |  FROM sc GROUP BY doc_id)""".stripMargin
  }

  /** Capped-bucket LSH DuckDB core (through the verified `capped` pair
    * CTE): 7×8-bit signatures (p = 63 stays out of play — int64 sign
    * bit), overfull buckets skipped via a bucket-count HAVING, DISTINCT
    * pair dedup, exact-cosine verification. One definition serves
    * dedup_embedding_lsh_capped and lsh_capped_recall. Cap interpolates
    * from Dedup.LshBucketCap.
    */
  private def lshCappedCoreSql: String =
    s"""sigs AS (SELECT vec_id, embedding,
      |  list_sum([
      |    CASE WHEN list_sum([
      |      CASE WHEN (('0x' || substr(md5(p::VARCHAR || ',' ||
      |        (i-1)::VARCHAR), 1, 2))::INT & 1) = 0
      |      THEN embedding[i]::DOUBLE ELSE -embedding[i]::DOUBLE END
      |      for i in range(1, 65)]) > 0
      |    THEN (1::BIGINT << p) ELSE 0 END
      |    for p in range(0, 56)])::BIGINT AS sig,
      |  sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |                 for i in range(1, 65)])) AS nrm
      |  FROM embeddings),
      |banded AS (SELECT vec_id, bd.band,
      |    (sig >> (bd.band * 8)) & 255 AS bucket
      |  FROM sigs, range(0, 7) bd(band)),
      |capok AS (SELECT band, bucket FROM banded GROUP BY 1, 2
      |  HAVING count(*) <= ${ops.Dedup.LshBucketCap}),
      |kept AS (SELECT banded.* FROM banded JOIN capok USING (band, bucket)),
      |cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      |  FROM kept x JOIN kept y
      |    ON x.band = y.band AND x.bucket = y.bucket
      |    AND x.vec_id < y.vec_id),
      |capped AS (SELECT vec_a, vec_b, cosine FROM (
      |  SELECT vec_a, vec_b,
      |    list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
      |              for i in range(1, 65)]) / (a.nrm * b.nrm) AS cosine
      |  FROM cand JOIN sigs a ON vec_a = a.vec_id
      |  JOIN sigs b ON vec_b = b.vec_id)
      |  WHERE cosine >= 0.4)""".stripMargin

  /** Multi-probe LSH DuckDB core ([[ops.Dedup
    * .embeddingNearDupsLshMultiprobe]]): the capped core's signatures
    * and cap-filtered home buckets, PLUS the probe expansion — home
    * bucket + one flipped bit per band bit, probed only into
    * cap-surviving cells — pairs canonicalized (least, greatest)
    * before the DISTINCT because the probe relation is asymmetric.
    * Emits BOTH verified pair sets (`capped` home-home, `multi`
    * probed) so the recall audit prices them against one ground truth.
    */
  private def lshMultiprobeCoreSql: String = {
    lshCappedCoreSql + s""",
      |probes AS (SELECT p.vec_id, p.band, p.bucket FROM (
      |    SELECT b.vec_id, b.band,
      |      CASE WHEN t.j = 8 THEN b.bucket
      |           ELSE xor(b.bucket, 1::BIGINT << t.j) END AS bucket
      |    FROM banded b, range(0, 9) t(j)) p
      |  JOIN capok USING (band, bucket)),
      |mcand AS (SELECT DISTINCT least(x.vec_id, y.vec_id) AS vec_a,
      |    greatest(x.vec_id, y.vec_id) AS vec_b
      |  FROM probes x JOIN kept y
      |    ON x.band = y.band AND x.bucket = y.bucket
      |    AND x.vec_id <> y.vec_id),
      |multi AS (SELECT vec_a, vec_b, cosine FROM (
      |  SELECT vec_a, vec_b,
      |    list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
      |              for i in range(1, 65)]) / (a.nrm * b.nrm) AS cosine
      |  FROM mcand JOIN sigs a ON vec_a = a.vec_id
      |  JOIN sigs b ON vec_b = b.vec_id)
      |  WHERE cosine >= 0.4)""".stripMargin
  }

  /** The Gopher-funnel DuckDB replay, parameterized by the corpus slice:
    * identical integer cross-multiplied gates, first-failing-stage
    * attribution, the one aggregate row unpivoted as UNION ALL arms
    * (Spark unpivots via stack); gate thresholds interpolate from
    * TextAnalysis.FunnelMinTokens/MaxTokens. One builder serves the batch
    * funnel and the streaming probe so the gate definitions cannot drift
    * between their oracles.
    */
  /** The per-doc first-failing-gate CTE chain (sized → … → ff, where
    * ff carries doc_id + fs = first failed stage, 0 = survivor) —
    * shared by the funnel oracles and the composed curation-verdict
    * replay. Starts mid-WITH (caller supplies the `WITH`).
    */
  private def funnelFirstFailCtes(where: String): String = {
      val minT = ops.TextAnalysis.FunnelMinTokens
      val maxT = ops.TextAnalysis.FunnelMaxTokens
      val stop = ops.TextAnalysis.stopwords
        .map(s => s"'$s'").mkString(", ")
      s"""sized AS (SELECT doc_id, n_chars, length(text) AS len,
        |    string_split(text, ' ') AS ws FROM documents $where),
        |s2 AS (SELECT doc_id, n_chars, len,
        |    CAST(len(ws) AS BIGINT) AS nt,
        |    CAST(len(list_distinct(ws)) AS BIGINT) AS nd,
        |    CAST(len(list_intersect(list_distinct(ws), [$stop]))
        |      AS BIGINT) AS nsk
        |  FROM sized),
        |g AS (SELECT doc_id, unnest(
        |    [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS g
        |  FROM sized WHERE len(ws) >= 2),
        |cg AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
        |top AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS topn
        |  FROM cg GROUP BY 1),
        |f AS (SELECT s2.doc_id, n_chars, len, nt, nd, nsk,
        |    coalesce(topn, 0) AS tn,
        |    (nt >= $minT AND nt <= $maxT) AS g1,
        |    (len >= nt * 5 AND len <= nt * 6) AS g2,
        |    (nsk > 0) AS g3,
        |    ((nt - nd) * 5 <= nt * 3) AS g4,
        |    (coalesce(topn, 0) * 16 <= nt - 1) AS g5
        |  FROM s2 LEFT JOIN top USING (doc_id)),
        |ff AS (SELECT *, CASE WHEN NOT g1 THEN 1 WHEN NOT g2 THEN 2
        |    WHEN NOT g3 THEN 3 WHEN NOT g4 THEN 4 WHEN NOT g5 THEN 5
        |    ELSE 0 END AS fs FROM f)""".stripMargin
  }

  private def funnelOracle(where: String): String = {
      s"""WITH ${funnelFirstFailCtes(where)},
        |a AS (SELECT CAST(count(*) AS BIGINT) AS total,
        |    CAST(sum(CASE WHEN fs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        |    CAST(sum(CASE WHEN fs = 2 THEN 1 ELSE 0 END) AS BIGINT) AS k2,
        |    CAST(sum(CASE WHEN fs = 3 THEN 1 ELSE 0 END) AS BIGINT) AS k3,
        |    CAST(sum(CASE WHEN fs = 4 THEN 1 ELSE 0 END) AS BIGINT) AS k4,
        |    CAST(sum(CASE WHEN fs = 5 THEN 1 ELSE 0 END) AS BIGINT) AS k5,
        |    CAST(sum(CASE WHEN fs = 0 THEN ceil(n_chars / 4.0)::BIGINT
        |      ELSE 0 END) AS BIGINT) AS st
        |  FROM ff)
        |SELECT CAST(1 AS BIGINT) AS stage, 'tokens_range' AS gate,
        |  total AS n_in, k1 AS n_killed, total - k1 AS n_out,
        |  CAST(0 AS BIGINT) AS sum_est_tokens FROM a
        |UNION ALL SELECT 2, 'avg_word_len', total - k1, k2,
        |  total - k1 - k2, 0 FROM a
        |UNION ALL SELECT 3, 'stopword_hit', total - k1 - k2, k3,
        |  total - k1 - k2 - k3, 0 FROM a
        |UNION ALL SELECT 4, 'dup_word_frac', total - k1 - k2 - k3, k4,
        |  total - k1 - k2 - k3 - k4, 0 FROM a
        |UNION ALL SELECT 5, 'top_2gram_share', total - k1 - k2 - k3 - k4,
        |  k5, total - k1 - k2 - k3 - k4 - k5, 0 FROM a
        |UNION ALL SELECT 6, 'survivors',
        |  total - k1 - k2 - k3 - k4 - k5, 0,
        |  total - k1 - k2 - k3 - k4 - k5, st FROM a
        |ORDER BY stage""".stripMargin
  }
}
