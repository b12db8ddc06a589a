package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Metastore, Pipeline, Relational, Text}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) + §6 (oracle rules). */
object SparkEntry {

  /** Flagship: the metastore-style ranked search (the reference's core
    * capability) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Metastore.qRankTfidf(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 metastore search surface
    "ms_filter_term"       -> ((s, d) => Metastore.filterTerm(s, d)),
    "ms_filter_multivalue" -> ((s, d) => Metastore.filterMultivalue(s, d)),
    "ms_filter_analyzed"   -> ((s, d) => Metastore.filterAnalyzed(s, d)),
    "ms_filter_multifield" -> ((s, d) => Metastore.filterMultifield(s, d)),
    "ms_filter_inner"      -> ((s, d) => Metastore.filterInner(s, d)),
    "ms_visibility_anon"   -> ((s, d) => Metastore.visibilityAnon(s, d)),
    "ms_visibility_auth"   -> ((s, d) => Metastore.visibilityAuth(s, d)),
    "ms_q_match"           -> ((s, d) => Metastore.qMatch(s, d)),
    "ms_q_match_stemmed"   -> ((s, d) => Metastore.qMatchStemmed(s, d)),
    "ms_q_rank_tfidf"      -> ((s, d) => Metastore.qRankTfidf(s, d)),
    "ms_hybrid_rrf"        -> ((s, d) => Metastore.hybridRrf(s, d)),
    "ms_paginate"          -> ((s, d) => Metastore.paginate(s, d)),
    "ms_summary"           -> ((s, d) => Metastore.summary(s, d)),
    "ms_facets"            -> ((s, d) => Metastore.facetsQ(s, d)),
    "ms_highlight"         -> ((s, d) => Metastore.highlightQ(s, d)),
    "ms_suggest"           -> ((s, d) => Metastore.suggestQ(s, d)),
    "ms_more_like_this"    -> ((s, d) => Metastore.moreLikeThisQ(s, d)),
    "ms_phrase"            -> ((s, d) => Metastore.phraseQ(s, d)),
    "ms_fuzzy"             -> ((s, d) => Metastore.fuzzyQ(s, d)),
    "ms_wildcard"          -> ((s, d) => Metastore.wildcardQ(s, d)),
    "ms_bm25"              -> ((s, d) => Metastore.bm25Q(s, d)),
    "ms_bool_minmatch"     -> ((s, d) => Metastore.boolMinMatchQ(s, d)),
    "ms_filter_negation"   -> ((s, d) => Metastore.filterNegation(s, d)),
    "ms_dis_max"           -> ((s, d) => Metastore.disMaxQ(s, d)),
    "ms_range_filter"      -> ((s, d) => Metastore.rangeFilterQ(s, d)),
    "ms_date_histogram"    -> ((s, d) => Metastore.dateHistogramQ(s, d)),
    "ms_date_range_agg"    -> ((s, d) => Metastore.dateRangeAggQ(s, d)),
    "ms_stats_bucket"      -> ((s, d) => Metastore.statsBucketQ(s, d)),
    "ms_multi_terms_agg"   -> ((s, d) => Metastore.multiTermsAggQ(s, d)),
    "ms_range_agg"         -> ((s, d) => Metastore.rangeAggQ(s, d)),
    "ms_filters_agg"       -> ((s, d) => Metastore.filtersAggQ(s, d)),
    "ms_histogram_agg"     -> ((s, d) => Metastore.histogramAggQ(s, d)),
    "ms_significant_terms" -> ((s, d) => Metastore.significantTermsQ(s, d)),
    "ms_span_near"         -> ((s, d) => Metastore.spanNearQ(s, d)),
    "ms_phrase_prefix"     -> ((s, d) => Metastore.phrasePrefixQ(s, d)),
    "ms_percolate"         -> ((s, d) => Metastore.percolateQ(s, d)),
    "ms_terms_agg_stats"   -> ((s, d) => Metastore.termsAggStatsQ(s, d)),
    "ms_decay_recency"     -> ((s, d) => Metastore.decayRecencyQ(s, d)),
    "ms_query_string"      -> ((s, d) => Metastore.queryStringQuery(s, d)),
    "ms_span_first"        -> ((s, d) => Metastore.spanFirstQ(s, d)),
    "ms_span_not"          -> ((s, d) => Metastore.spanNotQ(s, d)),
    "ms_span_or"           -> ((s, d) => Metastore.spanOrQ(s, d)),
    "ms_terms_lookup"      -> ((s, d) => Metastore.termsLookupQ(s, d)),
    "ms_regexp"            -> ((s, d) => Metastore.regexpQ(s, d)),
    "ms_common_terms"      -> ((s, d) => Metastore.commonTermsQ(s, d)),
    "ms_random_score"      -> ((s, d) => Metastore.randomScoreQ(s, d)),
    "ms_did_you_mean"      -> ((s, d) => Metastore.didYouMeanQ(s, d)),
    "ms_rank_eval"         -> ((s, d) => Metastore.rankEvalQ(s, d)),
    "ms_msearch"           -> ((s, d) => Metastore.msearchQ(s, d)),
    "ms_nested_aggs"       -> ((s, d) => Metastore.nestedAggsQ(s, d)),
    "ms_post_filter"       -> ((s, d) => Metastore.postFilterQ(s, d)),
    "ms_composite_agg"     -> ((s, d) => Metastore.compositeAggQ(s, d)),
    "ms_top_hits"          -> ((s, d) => Metastore.topHitsQ(s, d)),
    "ms_terms_set"         -> ((s, d) => Metastore.termsSetQ(s, d)),
    "ms_adjacency_matrix"  -> ((s, d) => Metastore.adjacencyMatrixQ(s, d)),
    "ms_pipeline_aggs"     -> ((s, d) => Metastore.pipelineAggsQ(s, d)),
    "ms_terms_error"       -> ((s, d) => Metastore.termsErrorQ(s, d)),
    "ms_field_stats"       -> ((s, d) => Metastore.fieldStatsQ(s, d)),
    "q_rate_limit"         -> ((s, d) => operators.Temporal.qRateLimit(s, d)),
    "ms_rollover_plan"     -> ((s, d) => Metastore.rolloverPlanQ(s, d)),
    "ms_phrase_slop"       -> ((s, d) => Metastore.phraseSlopQ(s, d)),
    "ms_knn"               -> ((s, d) => Metastore.knnQ(s, d)),
    "q_rank_shift"         -> ((s, d) => Relational.qRankShift(s, d)),
    "q_adoption"           -> ((s, d) => Relational.qAdoption(s, d)),
    "q_discount_impact"    -> ((s, d) => Relational.qDiscountImpact(s, d)),
    "ann_probe_sweep"      -> ((s, d) => Pipeline.annProbeSweep(s, d)),
    "ann_pq_error"         -> ((s, d) => Pipeline.annPqError(s, d)),
    "ann_sq_error"         -> ((s, d) => Pipeline.annSqError(s, d)),
    "q_max_gap"            -> ((s, d) => operators.Temporal.qMaxGap(s, d)),
    "q_seasonal_decompose" -> ((s, d) => operators.Temporal.qSeasonalDecompose(s, d)),
    "txt_vocab_overlap"    -> ((s, d) => Text.vocabOverlap(s, d)),
    "ms_rank_feature"      -> ((s, d) => Metastore.rankFeatureQ(s, d)),
    "ms_events_filter"     -> ((s, d) => Metastore.eventsFilter(s, d)),
    "ms_events_sort"       -> ((s, d) => Metastore.eventsSort(s, d)),
    "ms_events_visibility" -> ((s, d) => Metastore.eventsVisibility(s, d)),
    // §2.2 relational / OLAP core
    "q1_agg"           -> ((s, d) => Relational.q1Agg(s, d)),
    "q3_join_topk"     -> ((s, d) => Relational.q3JoinTopk(s, d)),
    "q5_multijoin"     -> ((s, d) => Relational.q5MultiJoin(s, d)),
    "q6_filter_agg"    -> ((s, d) => Relational.q6FilterAgg(s, d)),
    "q4_order_priority" -> ((s, d) => Relational.q4OrderPriority(s, d)),
    "q10_returned"     -> ((s, d) => Relational.q10Returned(s, d)),
    "q13_custdist"     -> ((s, d) => Relational.q13CustDist(s, d)),
    "q14_promo"        -> ((s, d) => Relational.q14Promo(s, d)),
    "q2_min_cost_supp" -> ((s, d) => Relational.q2MinCostSupp(s, d)),
    "q9_profit"        -> ((s, d) => Relational.q9Profit(s, d)),
    "q12_ship_priority" -> ((s, d) => Relational.q12ShipPriority(s, d)),
    "q15_top_supplier" -> ((s, d) => Relational.q15TopSupplier(s, d)),
    "q16_supp_variety" -> ((s, d) => Relational.q16SuppVariety(s, d)),
    "q17_small_qty"    -> ((s, d) => Relational.q17SmallQty(s, d)),
    "q18_large_orders" -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "q19_disjunctive"  -> ((s, d) => Relational.q19Disjunctive(s, d)),
    "q20_dominant_supp" -> ((s, d) => Relational.q20DominantSupp(s, d)),
    "q21_late_supplier" -> ((s, d) => Relational.q21LateSupplier(s, d)),
    "q22_idle_rich"    -> ((s, d) => Relational.q22IdleRich(s, d)),
    "q_window_running" -> ((s, d) => Relational.qWindowRunning(s, d)),
    "q_rollup"         -> ((s, d) => Relational.qRollup(s, d)),
    "q_semi_anti"      -> ((s, d) => Relational.qSemiAnti(s, d)),
    "q_in_subquery"    -> ((s, d) => Relational.qInSubquery(s, d)),
    "q_histogram"      -> ((s, d) => Relational.qHistogram(s, d)),
    "q_histogram_log"  -> ((s, d) => Relational.qHistogramLog(s, d)),
    "q_gini"           -> ((s, d) => Relational.qGini(s, d)),
    "q_decay"          -> ((s, d) => Relational.qDecay(s, d)),
    "q_quantile_hist"  -> ((s, d) => Relational.qQuantileHist(s, d)),
    "q_freq_cms"       -> ((s, d) => Relational.qFreqCms(s, d)),
    "q_approx_distinct_hll" -> ((s, d) => Relational.qApproxDistinctHll(s, d)),
    "q_chisq"          -> ((s, d) => Relational.qChisq(s, d)),
    "q_anova"          -> ((s, d) => Relational.qAnova(s, d)),
    "q_kruskal"        -> ((s, d) => Relational.qKruskal(s, d)),
    "q_cramers_v"      -> ((s, d) => Relational.qCramersV(s, d)),
    "q_benford"        -> ((s, d) => Relational.qBenford(s, d)),
    "q_kmv_overlap"    -> ((s, d) => Relational.qKmvOverlap(s, d)),
    "q_stats"          -> ((s, d) => Relational.qStats(s, d)),
    "q_regression"     -> ((s, d) => Relational.qRegression(s, d)),
    "q_rfm"            -> ((s, d) => Relational.qRfm(s, d)),
    "q_set_ops"        -> ((s, d) => Relational.qSetOps(s, d)),
    "q_scalar_subquery" -> ((s, d) => Relational.qScalarSubquery(s, d)),
    "q_topk_per_group" -> ((s, d) => Relational.qTopkPerGroup(s, d)),
    "q_topk_native"    -> ((s, d) => Relational.qTopkNative(s, d)),
    "q_distinct"       -> ((s, d) => Relational.qDistinct(s, d)),
    "q_string_agg"     -> ((s, d) => Relational.qStringAgg(s, d)),
    "q_mode"           -> ((s, d) => Relational.qMode(s, d)),
    "q_grouping_id"    -> ((s, d) => Relational.qGroupingId(s, d)),
    "q_percentile_cont" -> ((s, d) => Relational.qPercentileCont(s, d)),
    "q_percentile_disc" -> ((s, d) => Relational.qPercentileDisc(s, d)),
    "q_winsorize"       -> ((s, d) => Relational.qWinsorize(s, d)),
    "q_lorenz"          -> ((s, d) => Relational.qLorenz(s, d)),
    "q_abc_analysis"    -> ((s, d) => Relational.qAbcAnalysis(s, d)),
    "q_bollinger"       -> ((s, d) => operators.Temporal.qBollinger(s, d)),
    "q_event_regex"     -> ((s, d) => operators.Temporal.qEventRegex(s, d)),
    "ms_boosting"       -> ((s, d) => Metastore.boostingQ(s, d)),
    "ms_pinned"         -> ((s, d) => Metastore.pinnedQ(s, d)),
    "ann_mmr"           -> ((s, d) => Pipeline.annMmr(s, d)),
    "ann_knn_classify"  -> ((s, d) => Pipeline.annKnnClassify(s, d)),
    "q_weighted_median" -> ((s, d) => Relational.qWeightedMedian(s, d)),
    "q_hhi"             -> ((s, d) => Relational.qHhi(s, d)),
    "q_lateral_explode" -> ((s, d) => Text.lateralExplode(s, d)),
    "q_mode_rolling"    -> ((s, d) => operators.Temporal.qModeRolling(s, d)),
    "ms_score_explain"  -> ((s, d) => Metastore.scoreExplain(s, d)),
    "q_unpivot"        -> ((s, d) => Relational.qUnpivot(s, d)),
    "q_outlier_mad"    -> ((s, d) => Relational.qOutlierMad(s, d)),
    "q_outlier_iqr"    -> ((s, d) => Relational.qOutlierIqr(s, d)),
    "q_harmonic_mean"  -> ((s, d) => Relational.qHarmonicMean(s, d)),
    "q_entropy"        -> ((s, d) => Relational.qEntropy(s, d)),
    "q_moving_minmax"  -> ((s, d) => operators.Temporal.qMovingMinmax(s, d)),
    "q_interp_linear"  -> ((s, d) => operators.Temporal.qInterpLinear(s, d)),
    "q_prop_ztest"     -> ((s, d) => operators.Temporal.qPropZtest(s, d)),
    "q_cumulative_uniques" -> ((s, d) => operators.Temporal.qCumulativeUniques(s, d)),
    "q_order_gap_stats" -> ((s, d) => operators.Temporal.qOrderGapStats(s, d)),
    "q_new_vs_returning" -> ((s, d) => operators.Temporal.qNewVsReturning(s, d)),
    "q_full_outer"     -> ((s, d) => Relational.qFullOuter(s, d)),
    "q_set_ops_all"    -> ((s, d) => Relational.qSetOpsAll(s, d)),
    "q_profile"        -> ((s, d) => Relational.qProfile(s, d)),
    "q_gap_fill"       -> ((s, d) => Relational.qGapFill(s, d)),
    "q_approx_distinct" -> ((s, d) => Relational.qApproxDistinct(s, d)),
    "q_approx_distinct_kmv" -> ((s, d) => Relational.qApproxDistinctKmv(s, d)),
    "q_quantile_kll" -> ((s, d) => Relational.qQuantileKll(s, d)),
    "q_bitmap_distinct" -> ((s, d) => Relational.qBitmapDistinct(s, d)),
    "q_vwap"            -> ((s, d) => Relational.qVwap(s, d)),
    "q_bitmap_distinct_roaring" -> ((s, d) => Relational.qBitmapDistinctRoaring(s, d)),
    "q_pivot"        -> ((s, d) => Relational.qPivot(s, d)),
    "q_cube"         -> ((s, d) => Relational.qCube(s, d)),
    "q_outer_join"   -> ((s, d) => Relational.qOuterJoin(s, d)),
    "q_window_funcs" -> ((s, d) => Relational.qWindowFuncs(s, d)),
    "q_string_funcs" -> ((s, d) => Relational.qStringFuncs(s, d)),
    "q_json_extract" -> ((s, d) => Relational.qJsonExtract(s, d)),
    "q_time_funcs"   -> ((s, d) => Relational.qTimeFuncs(s, d)),
    "q_asof_join"    -> ((s, d) => operators.Temporal.qAsofJoin(s, d)),
    "q_asof_forward" -> ((s, d) => operators.Temporal.qAsofForward(s, d)),
    "q_concurrency"  -> ((s, d) => operators.Temporal.qConcurrency(s, d)),
    "q_range_join"   -> ((s, d) => operators.Temporal.qRangeJoin(s, d)),
    "q_funnel"       -> ((s, d) => operators.Temporal.qFunnel(s, d)),
    "q_funnel3"      -> ((s, d) => operators.Temporal.qFunnel3(s, d)),
    "q_interval_coverage" -> ((s, d) => operators.Temporal.qIntervalCoverage(s, d)),
    "q_markov"       -> ((s, d) => operators.Temporal.qMarkov(s, d)),
    "q_scd2"         -> ((s, d) => operators.Temporal.qScd2(s, d)),
    "q_percentiles"  -> ((s, d) => Relational.qPercentiles(s, d)),
    "q_weighted_sample" -> ((s, d) => Relational.qWeightedSample(s, d)),
    "q_window_range"    -> ((s, d) => Relational.qWindowRange(s, d)),
    "txt_keywords"      -> ((s, d) => Text.keywords(s, d)),
    "q_grouping_sets"   -> ((s, d) => Relational.qGroupingSets(s, d)),
    "stream_sliding_agg" -> ((s, d) => Pipeline.streamSlidingAgg(s, d)),
    // §2.5 text analysis
    "txt_token_count" -> ((s, d) => Text.tokenCount(s, d)),
    "txt_novelty"     -> ((s, d) => Text.novelty(s, d)),
    "txt_hapax"       -> ((s, d) => Text.hapax(s, d)),
    "txt_source_drift" -> ((s, d) => Text.sourceDrift(s, d)),
    "txt_burstiness"  -> ((s, d) => Text.burstiness(s, d)),
    "txt_quality"     -> ((s, d) => Text.quality(s, d)),
    "txt_langid"      -> ((s, d) => Text.langId(s, d)),
    "txt_fingerprint" -> ((s, d) => Text.fingerprintQ(s, d)),
    "txt_term_stats"  -> ((s, d) => Text.termStats(s, d)),
    "txt_zipf"        -> ((s, d) => Text.zipf(s, d)),
    "txt_oov_rate"    -> ((s, d) => Text.oovRate(s, d)),
    "txt_char_trigrams" -> ((s, d) => Text.charTrigrams(s, d)),
    "pipe_index_merge" -> ((s, d) => Text.indexMerge(s, d)),
    // §2.3 dedup
    "dedup_exact"         -> ((s, d) => Pipeline.dedupExact(s, d)),
    "dedup_exact_keep"    -> ((s, d) => Pipeline.dedupExactKeep(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Pipeline.dedupNgramJaccard(s, d)),
    "dedup_minhash_lsh"   -> ((s, d) => Pipeline.dedupMinhashLsh(s, d)),
    "dedup_lsh_sweep"     -> ((s, d) => Pipeline.dedupLshSweep(s, d)),
    "dedup_simhash"       -> ((s, d) => Pipeline.dedupSimhash(s, d)),
    "dedup_span"          -> ((s, d) => Pipeline.dedupSpan(s, d)),
    "dedup_levenshtein"   -> ((s, d) => Pipeline.dedupLevenshtein(s, d)),
    "dedup_embedding"     -> ((s, d) => Pipeline.dedupEmbedding(s, d)),
    "dedup_embedding_ivf" -> ((s, d) => Pipeline.dedupEmbeddingIvf(s, d)),
    "dedup_cluster"       -> ((s, d) => Pipeline.dedupCluster(s, d)),
    "pipe_dedup_incremental" -> ((s, d) => Pipeline.dedupIncremental(s, d)),
    "pipe_cluster_merge" -> ((s, d) => Pipeline.clusterMerge(s, d)),
    "ann_kmeans_step"  -> ((s, d) => Pipeline.annKmeansStep(s, d)),
    "ann_cell_purity"  -> ((s, d) => Pipeline.annCellPurity(s, d)),
    "ann_sim_hist"     -> ((s, d) => Pipeline.annSimHist(s, d)),
    "ann_dim_stats"    -> ((s, d) => Pipeline.annDimStats(s, d)),
    "ann_outlier_dist" -> ((s, d) => Pipeline.annOutlierDist(s, d)),
    "ann_centroid"        -> ((s, d) => Pipeline.annCentroid(s, d)),
    // §2.4 similarity search
    "ann_brute_topk" -> ((s, d) => Pipeline.annBruteTopk(s, d)),
    "ann_lsh_topk"   -> ((s, d) => Pipeline.annLshTopk(s, d)),
    "ann_ivf_topk"   -> ((s, d) => Pipeline.annIvfTopk(s, d)),
    "ann_hnsw_topk"   -> ((s, d) => Pipeline.annHnswTopk(s, d)),
    "ann_hnsw_visited" -> ((s, d) => Pipeline.annHnswVisited(s, d)),
    "ann_nn_descent"  -> ((s, d) => Pipeline.annNnDescent(s, d)),
    "ann_nn_descent_recall" -> ((s, d) => Pipeline.annNnDescentRecall(s, d)),
    "ann_descent_topk" -> ((s, d) => Pipeline.annDescentTopk(s, d)),
    "ann_descent_visited" -> ((s, d) => Pipeline.annDescentVisited(s, d)),
    "ann_descent_insert" -> ((s, d) => Pipeline.annDescentInsert(s, d)),
    "q7_volume"        -> ((s, d) => Relational.q7Volume(s, d)),
    "q8_share"         -> ((s, d) => Relational.q8Share(s, d)),
    "q_pagerank"       -> ((s, d) => operators.Graph.pagerank(s, d)),
    "q_katz"           -> ((s, d) => operators.Graph.katz(s, d)),
    "q_hits"           -> ((s, d) => operators.Graph.hits(s, d)),
    "q_apsp"           -> ((s, d) => operators.Graph.apsp(s, d)),
    "q_mst"            -> ((s, d) => operators.Graph.mst(s, d)),
    "q_cheapest_route" -> ((s, d) => operators.Graph.cheapestRoute(s, d)),
    "q_forecast_naive" -> ((s, d) => operators.Temporal.qForecastNaive(s, d)),
    "q_cohort_ltv"     -> ((s, d) => operators.Temporal.qCohortLtv(s, d)),
    "q_assortativity"  -> ((s, d) => operators.Graph.assortativity(s, d)),
    "q_closeness"      -> ((s, d) => operators.Graph.closeness(s, d)),
    "q_graph_diameter" -> ((s, d) => operators.Graph.graphDiameter(s, d)),
    "q_adamic_adar"    -> ((s, d) => operators.Graph.adamicAdar(s, d)),
    "q_avg_nbr_deg"    -> ((s, d) => operators.Graph.avgNeighborDegree(s, d)),
    "q_bfs"            -> ((s, d) => operators.Graph.bfs(s, d)),
    "q_triangle_count" -> ((s, d) => operators.Graph.triangleCounts(s, d)),
    "q_witness_count" -> ((s, d) => operators.Graph.witnessCount(s, d)),
    "q_bridges" -> ((s, d) => operators.Graph.bridges(s, d)),
    "q_ktruss" -> ((s, d) => operators.Graph.ktruss(s, d)),
    "q_common_neighbors" -> ((s, d) => operators.Graph.commonNeighbors(s, d)),
    "q_components"     -> ((s, d) => operators.Graph.components(s, d)),
    "q_degree_dist"    -> ((s, d) => operators.Graph.degreeDist(s, d)),
    "q_clustering_coeff" -> ((s, d) => operators.Graph.clusteringCoeff(s, d)),
    "q_resource_alloc" -> ((s, d) => operators.Graph.resourceAlloc(s, d)),
    "q_kcore"          -> ((s, d) => operators.Graph.kcore(s, d)),
    "q_label_prop"     -> ((s, d) => operators.Graph.labelProp(s, d)),
    "q_modularity"     -> ((s, d) => operators.Graph.modularity(s, d)),
    "q_betweenness"    -> ((s, d) => operators.Graph.betweenness(s, d)),
    "q_betweenness_sampled" -> ((s, d) => operators.Graph.betweennessSampled(s, d)),
    "q_seq_pairs"      -> ((s, d) => operators.Temporal.qSeqPairs(s, d)),
    "dedup_containment" -> ((s, d) => Pipeline.dedupContainment(s, d)),
    "dedup_containment_minhash" -> ((s, d) => Pipeline.dedupContainmentMinhash(s, d)),
    "ann_rq_topk"      -> ((s, d) => Pipeline.annRqTopk(s, d)),
    "ann_rq_error"     -> ((s, d) => Pipeline.annRqError(s, d)),
    "q_scc"            -> ((s, d) => operators.Graph.scc(s, d)),
    "q_item_sim"       -> ((s, d) => operators.Graph.itemSim(s, d)),
    "ms_synonyms"      -> ((s, d) => Metastore.synonymsQ(s, d)),
    "ms_function_score" -> ((s, d) => Metastore.functionScoreQ(s, d)),
    "q_basket_rules"   -> ((s, d) => operators.Graph.basketRules(s, d)),
    "q_skyline"    -> ((s, d) => Relational.qSkyline(s, d)),
    "q_fuzzy_join" -> ((s, d) => Relational.qFuzzyJoin(s, d)),
    "txt_pii_scrub" -> ((s, d) => Text.piiScrub(s, d)),
    "txt_readability" -> ((s, d) => Text.readability(s, d)),
    "txt_kappa" -> ((s, d) => Text.kappa(s, d)),
    "q_sample_stratified" -> ((s, d) => Relational.qSampleStratified(s, d)),
    "q_correlated_subquery" -> ((s, d) => Relational.qCorrelatedSubquery(s, d)),
    "txt_bigrams" -> ((s, d) => Text.bigrams(s, d)),
    "txt_cooccurrence" -> ((s, d) => Text.cooccurrence(s, d)),
    "txt_collocations" -> ((s, d) => Text.collocations(s, d)),
    "txt_minhash_sketch" -> ((s, d) => Text.minhashSketch(s, d)),
    "ann_pair_sim"   -> ((s, d) => Pipeline.annPairSim(s, d)),
    "ann_range_search" -> ((s, d) => Pipeline.annRangeSearch(s, d)),
    "ann_sq_topk"      -> ((s, d) => Pipeline.annSqTopk(s, d)),
    "ann_recall_eval"  -> ((s, d) => Pipeline.annRecallEval(s, d)),
    "ann_pq_topk"      -> ((s, d) => Pipeline.annPqTopk(s, d)),
    "ann_ivf_pq_topk"  -> ((s, d) => Pipeline.annIvfPqTopk(s, d)),
    "pipe_contamination_bloom" -> ((s, d) => Pipeline.contaminationBloom(s, d)),
    // §2.6 multimodal
    "mm_decode_meta"  -> ((s, d) => Pipeline.mmDecodeMeta(s, d)),
    "mm_resize"       -> ((s, d) => Pipeline.mmResize(s, d)),
    "mm_frame_sample" -> ((s, d) => Pipeline.mmFrameSample(s, d)),
    "mm_features"     -> ((s, d) => Pipeline.mmFeatures(s, d)),
    "mm_feat_topk"    -> ((s, d) => Pipeline.mmFeatTopk(s, d)),
    "mm_audio_window" -> ((s, d) => Pipeline.mmAudioWindow(s, d)),
    "mm_scene_detect" -> ((s, d) => Pipeline.mmSceneDetect(s, d)),
    "mm_modality"     -> ((s, d) => Pipeline.mmModality(s, d)),
    // §2.7 streaming (batch-equivalent plans; streaming pinned in specs)
    "stream_window_agg" -> ((s, d) => Pipeline.streamWindowAgg(s, d)),
    "stream_quantile"   -> ((s, d) => Pipeline.streamQuantile(s, d)),
    "stream_sessionize" -> ((s, d) => Pipeline.streamSessionize(s, d)),
    "stream_dedup"      -> ((s, d) => Pipeline.streamDedup(s, d)),
    "stream_dedup_within" -> ((s, d) => Pipeline.streamDedupWithin(s, d)),
    "stream_latest_state_ttl" -> ((s, d) => Pipeline.streamLatestStateTtl(s, d)),
    "stream_seq_pairs_ttl" -> ((s, d) => Pipeline.streamSeqPairsTtl(s, d)),
    "stream_rate_limit" -> ((s, d) => Pipeline.streamRateLimit(s, d)),
    "stream_rate_limit_ttl" -> ((s, d) => Pipeline.streamRateLimitTtl(s, d)),
    "stream_cdc_compact" -> ((s, d) => Pipeline.streamCdcCompact(s, d)),
    "stream_attr_left"  -> ((s, d) => Pipeline.streamAttrLeft(s, d)),
    "stream_uniques"    -> ((s, d) => Pipeline.streamUniques(s, d)),
    "stream_join"       -> ((s, d) => Pipeline.streamJoin(s, d)),
    "stream_attribution" -> ((s, d) => Pipeline.streamAttribution(s, d)),
    "stream_latest_state" -> ((s, d) => Pipeline.streamLatestState(s, d)),
    "stream_kmv_uniques"  -> ((s, d) => Pipeline.streamKmvUniques(s, d)),
    "stream_seq_pairs"    -> ((s, d) => Pipeline.streamSeqPairs(s, d)),
    "stream_cdc_tombstone" -> ((s, d) => Pipeline.streamCdcTombstone(s, d)),
    "stream_late_audit"   -> ((s, d) => Pipeline.streamLateAudit(s, d)),
    "stream_late_audit_ttl" -> ((s, d) => Pipeline.streamLateAuditTtl(s, d)),
    "stream_funnel"       -> ((s, d) => Pipeline.streamFunnel(s, d)),
    "stream_session_window" -> ((s, d) => Pipeline.streamSessionWindow(s, d)),
    "pipe_clean_corpus" -> ((s, d) => Pipeline.cleanCorpus(s, d)),
    "pipe_dedup_corpus" -> ((s, d) => Pipeline.dedupCorpus(s, d)),
    "pipe_pack_sequences" -> ((s, d) => Pipeline.packSequences(s, d)),
    "pipe_contamination"  -> ((s, d) => Pipeline.contamination(s, d)),
    "pipe_quota_sample"   -> ((s, d) => Pipeline.quotaSample(s, d)),
    "pipe_merge_stats"    -> ((s, d) => Pipeline.mergeStats(s, d)),
    "pipe_mix_weights"    -> ((s, d) => Pipeline.mixWeights(s, d)),
    "pipe_curriculum"     -> ((s, d) => Pipeline.curriculum(s, d)),
    "pipe_temperature"    -> ((s, d) => Pipeline.temperature(s, d)),
    "pipe_span_mask"      -> ((s, d) => Pipeline.spanMask(s, d)),
    "pipe_split_leakage"  -> ((s, d) => Pipeline.splitLeakage(s, d)),
    "q_harmonic_centrality" -> ((s, d) => operators.Graph.harmonic(s, d)),
    "pipe_oversample"     -> ((s, d) => Pipeline.pipeOversample(s, d)),
    "pipe_split"          -> ((s, d) => Pipeline.splitAssign(s, d)),
    "pipe_reshard"        -> ((s, d) => Pipeline.reshardAudit(s, d)),
    "pipe_dataset_diff"   -> ((s, d) => Pipeline.datasetDiff(s, d)),
    "ms_collapse"         -> ((s, d) => Metastore.collapseQ(s, d)),
    "pipe_chunk"          -> ((s, d) => Pipeline.chunk(s, d)),
    "pipe_dq_report"      -> ((s, d) => Pipeline.dqReport(s, d)),
    "pipe_freshness"      -> ((s, d) => Pipeline.freshness(s, d)),
    "pipe_dataset_card"   -> ((s, d) => Pipeline.datasetCard(s, d)),
    "pipe_epoch_shuffle"  -> ((s, d) => Pipeline.epochShuffle(s, d)),
    "pipe_interleave"     -> ((s, d) => Pipeline.interleave(s, d)),
    "pipe_dedup_eval"     -> ((s, d) => Pipeline.dedupEval(s, d)),
    "txt_rarity"          -> ((s, d) => Text.rarity(s, d)),
    "q_paths"             -> ((s, d) => operators.Temporal.qPaths(s, d)),
    "q_changepoint"       -> ((s, d) => operators.Temporal.qChangepoint(s, d)),
    "stream_topk"         -> ((s, d) => Pipeline.streamTopk(s, d)),
    "stream_spike"        -> ((s, d) => Pipeline.streamSpike(s, d)),
    "txt_bpe_apply"       -> ((s, d) => Text.bpeApply(s, d)),
    "txt_bpe_pairs"       -> ((s, d) => Text.bpePairs(s, d)),
    "txt_bpe_train"       -> ((s, d) => Text.bpeTrain(s, d)),
    "q_window_dist"       -> ((s, d) => Relational.qWindowDist(s, d)),
    "q_retention"         -> ((s, d) => operators.Temporal.qRetention(s, d)),
    "q_cohort_matrix"     -> ((s, d) => operators.Temporal.qCohortMatrix(s, d)),
    "q_ab_lift"           -> ((s, d) => operators.Temporal.qAbLift(s, d)),
    "q_streaks"           -> ((s, d) => operators.Temporal.qStreaks(s, d)),
    "q_sessionize"        -> ((s, d) => operators.Temporal.qSessionize(s, d)),
    "q_dau_mau"           -> ((s, d) => operators.Temporal.qDauMau(s, d)),
    "q_xcorr"             -> ((s, d) => operators.Temporal.qXcorr(s, d)),
    "q_granger"           -> ((s, d) => operators.Temporal.qGranger(s, d)),
    "q_corr_matrix"       -> ((s, d) => operators.Temporal.qCorrMatrix(s, d)),
    "q_emd"               -> ((s, d) => operators.Temporal.qEmd(s, d)),
    "q_audience_overlap"  -> ((s, d) => operators.Temporal.qAudienceOverlap(s, d)),
    "q_locf"              -> ((s, d) => operators.Temporal.qLocf(s, d)),
    "q_rolling_median"    -> ((s, d) => operators.Temporal.qRollingMedian(s, d)),
    "q_survival"          -> ((s, d) => operators.Temporal.qSurvival(s, d)),
    "q_attribution"       -> ((s, d) => operators.Temporal.qAttribution(s, d)),
    "q_bootstrap"         -> ((s, d) => operators.Temporal.qBootstrap(s, d)),
    "q_runs_test"         -> ((s, d) => operators.Temporal.qRunsTest(s, d)),
    "q_ewma"              -> ((s, d) => operators.Temporal.qEwma(s, d)),
    "q_twap"              -> ((s, d) => operators.Temporal.qTwap(s, d)),
    "q_seasonality"       -> ((s, d) => operators.Temporal.qSeasonality(s, d)),
    "q_growth_accounting" -> ((s, d) => operators.Temporal.qGrowthAccounting(s, d)),
    "q_rolling_corr"      -> ((s, d) => operators.Temporal.qRollingCorr(s, d)),
    "q_holt"              -> ((s, d) => operators.Temporal.qHolt(s, d)),
    "q_anomaly_dow"       -> ((s, d) => operators.Temporal.qAnomalyDow(s, d)),
    "q_calendar_grid"     -> ((s, d) => operators.Temporal.qCalendarGrid(s, d)),
    "q_duplicate_audit"   -> ((s, d) => Relational.qDuplicateAudit(s, d)),
    "q_power_users"       -> ((s, d) => Relational.qPowerUsers(s, d)),
    "q_pareto"            -> ((s, d) => Relational.qPareto(s, d)),
    "q_did"               -> ((s, d) => operators.Temporal.qDid(s, d)),
    "q_srm"               -> ((s, d) => operators.Temporal.qSrm(s, d)),
    "q_dispersion"        -> ((s, d) => operators.Temporal.qDispersion(s, d)),
    "q_t_closeness"       -> ((s, d) => Pipeline.qTCloseness(s, d)),
    "q_error_budget"      -> ((s, d) => operators.Temporal.qErrorBudget(s, d)),
    "q_key_skew"          -> ((s, d) => Relational.qKeySkew(s, d)),
    "q_moments"           -> ((s, d) => Relational.qMoments(s, d)),
    "ms_cross_fields"     -> ((s, d) => Metastore.crossFieldsQ(s, d)),
    "q_ntile"             -> ((s, d) => Relational.qNtile(s, d)),
    "q_theil_sen"         -> ((s, d) => operators.Temporal.qTheilSen(s, d)),
    "q_control_chart"     -> ((s, d) => operators.Temporal.qControlChart(s, d)),
    "q_cusum"             -> ((s, d) => operators.Temporal.qCusum(s, d)),
    "ann_filtered"        -> ((s, d) => Pipeline.annFiltered(s, d)),
    "pipe_token_budget"   -> ((s, d) => Pipeline.tokenBudget(s, d)),
    "ms_search_after"     -> ((s, d) => Metastore.searchAfterQ(s, d)),
    "ms_rescore"          -> ((s, d) => Metastore.rescoreQ(s, d)),
    "q_asof_nearest"      -> ((s, d) => operators.Temporal.qAsofNearest(s, d)),
    "q_funnel_window"     -> ((s, d) => operators.Temporal.qFunnelWindow(s, d)),
    "q_ttest"             -> ((s, d) => operators.Temporal.qTtest(s, d)),
    "q_ks_test"           -> ((s, d) => operators.Temporal.qKsTest(s, d)),
    "q_spearman"          -> ((s, d) => operators.Temporal.qSpearman(s, d)),
    "q_kendall"           -> ((s, d) => operators.Temporal.qKendall(s, d)),
    "q_autocorr"          -> ((s, d) => operators.Temporal.qAutocorr(s, d)),
    "q_wow_growth"        -> ((s, d) => operators.Temporal.qWowGrowth(s, d)),
    "q_mannwhitney"       -> ((s, d) => operators.Temporal.qMannWhitney(s, d)),
    "mm_patchify"         -> ((s, d) => Pipeline.mmPatchify(s, d)),
    "mm_decode_bmp"       -> ((s, d) => Pipeline.mmDecodeBmp(s, d)),
    "mm_decode_wav"       -> ((s, d) => Pipeline.mmDecodeWav(s, d)),
    "mm_decode_png"       -> ((s, d) => Pipeline.mmDecodePng(s, d)),
    "mm_decode_gif"       -> ((s, d) => Pipeline.mmDecodeGif(s, d)),
    "mm_decode_qoi"       -> ((s, d) => Pipeline.mmDecodeQoi(s, d)),
    "mm_decode_tga"       -> ((s, d) => Pipeline.mmDecodeTga(s, d)),
    "pipe_perplexity_bucket" -> ((s, d) => Pipeline.pipePerplexityBucket(s, d)),
    "pipe_tokenizer_fertility" -> ((s, d) => Pipeline.pipeTokenizerFertility(s, d)),
    "pipe_shard_skew"     -> ((s, d) => Pipeline.pipeShardSkew(s, d)),
    "pipe_near_dup_rate_by_source" -> ((s, d) => Pipeline.pipeNearDupRateBySource(s, d)),
    "pipe_cluster_reps"   -> ((s, d) => Pipeline.pipeClusterReps(s, d)),
    "pipe_length_curve"   -> ((s, d) => Pipeline.pipeLengthCurve(s, d)),
    "pipe_dedup_bytes_saved" -> ((s, d) => Pipeline.pipeDedupBytesSaved(s, d)),
    "pipe_dedup_threshold_curve" -> ((s, d) => Pipeline.pipeDedupThresholdCurve(s, d)),
    "pipe_dedup_rate_by_source" -> ((s, d) => Pipeline.pipeDedupRateBySource(s, d)),
    "mm_decode_mulaw"     -> ((s, d) => Pipeline.mmDecodeMulaw(s, d)),
    "mm_decode_ppm"       -> ((s, d) => Pipeline.mmDecodePpm(s, d)),
    "mm_decode_adpcm"     -> ((s, d) => Pipeline.mmDecodeAdpcm(s, d)),
    "mm_thumbnail"        -> ((s, d) => Pipeline.mmThumbnail(s, d)),
    "pipe_quality_curve"  -> ((s, d) => Pipeline.pipeQualityCurve(s, d)),
    "q_k_anonymity"       -> ((s, d) => Pipeline.qKAnonymity(s, d)),
    "q_l_diversity"       -> ((s, d) => Pipeline.qLDiversity(s, d)),
    "pipe_class_balance"  -> ((s, d) => Pipeline.pipeClassBalance(s, d)),
    "pipe_dup_cluster_stats" -> ((s, d) => Pipeline.pipeDupClusterStats(s, d)),
    "txt_bigram_lm"       -> ((s, d) => Text.bigramLm(s, d)),
    "txt_kneser_ney"      -> ((s, d) => Text.kneserNey(s, d)),
    "txt_surprisal"       -> ((s, d) => Text.surprisal(s, d)),
    "txt_code_detect"     -> ((s, d) => Text.codeDetect(s, d)),
    "mm_decode_jpeg"      -> ((s, d) => Pipeline.mmDecodeJpeg(s, d)),
    "mm_phash"            -> ((s, d) => Pipeline.mmPhash(s, d)),
    "mm_sobel"            -> ((s, d) => Pipeline.mmSobel(s, d)),
    "mm_integral_image"   -> ((s, d) => Pipeline.mmIntegral(s, d)),
    "mm_box_blur"         -> ((s, d) => Pipeline.mmBoxBlur(s, d)),
    "mm_hist_eq"          -> ((s, d) => Pipeline.mmHistEq(s, d)),
    "mm_audio_stats"      -> ((s, d) => Pipeline.mmAudioStats(s, d)),
    "mm_decode_png_idx"   -> ((s, d) => Pipeline.mmDecodePngIdx(s, d)),
    "txt_heaps"           -> ((s, d) => Text.heaps(s, d)),
    "txt_char_entropy"    -> ((s, d) => Text.charEntropy(s, d)),
    "q_bridge_analysis"   -> ((s, d) => Relational.qBridgeAnalysis(s, d)),
    "q_linreg_multi"      -> ((s, d) => Relational.qLinregMulti(s, d)),
    "q_ship_latency"      -> ((s, d) => Relational.qShipLatency(s, d)),
    "q_backlog"           -> ((s, d) => Relational.qBacklog(s, d)),
    "txt_diversity"       -> ((s, d) => Text.diversity(s, d)),
    "txt_repetition"      -> ((s, d) => Text.repetition(s, d)),
    "txt_bigram_coverage" -> ((s, d) => Text.bigramCoverage(s, d)),
    "q_multi_distinct"  -> ((s, d) => Pipeline.multiDistinct(s, d)),
  )

  /** DuckDB-equivalent SQL per query key (driver correctness gate).
    * Parity rules in SURVEY.md §6: DECIMAL-exact sums cast to DOUBLE,
    * identical aliases, deterministic total order.
    */
  def oracleSql: Map[String, String] =
    Metastore.oracles ++ Text.oracles ++ Pipeline.oracles ++
      operators.Temporal.oracles ++ operators.Graph.oracles ++ Map(
    "q_gini" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
        |  FROM orders GROUP BY o_custkey),
        |j AS (
        |  SELECT s.o_custkey, s.cents, c.c_mktsegment
        |  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
        |r AS (
        |  SELECT c_mktsegment, cents,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY cents, o_custkey) AS BIGINT) AS i
        |  FROM j)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST((1000000 * (sum(CAST(cents AS HUGEINT) * (2 * i - 1))
        |          - CAST(count(*) AS HUGEINT) * sum(CAST(cents AS HUGEINT))))
        |    // (CAST(count(*) AS HUGEINT) * sum(CAST(cents AS HUGEINT))) AS BIGINT) AS gini_x1e6
        |FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_kruskal" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |j AS (SELECT s.cents, c.c_mktsegment
        |  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
        |vc AS (
        |  SELECT cents, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(count(*)) OVER (ORDER BY cents) AS BIGINT) AS cum
        |  FROM j GROUP BY cents),
        |cell AS (
        |  SELECT cents, c_mktsegment, CAST(count(*) AS BIGINT) AS cnt_gs
        |  FROM j GROUP BY 1, 2),
        |g AS (
        |  SELECT c_mktsegment, CAST(sum(cnt_gs) AS BIGINT) AS n_g,
        |    CAST(sum(cnt_gs * (2 * (vc.cum - vc.cnt + 1) + vc.cnt - 1)) AS BIGINT) AS s2_g
        |  FROM cell JOIN vc USING (cents) GROUP BY 1),
        |t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_groups, CAST(sum(n_g) AS BIGINT) AS n,
        |    sum((CAST(s2_g AS HUGEINT) * s2_g) // n_g) AS a
        |  FROM g)
        |SELECT n, n_groups,
        |  CAST((CAST(3000000 AS HUGEINT) * a) // (n * (n + 1))
        |    - 3 * (n + 1) * 1000000 AS BIGINT) AS h_x1e6
        |FROM t""".stripMargin,

    "q_anova" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |j AS (SELECT s.cents, c.c_mktsegment
        |      FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
        |g AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_g,
        |        CAST(sum(cents) AS BIGINT) AS s_g,
        |        sum(CAST(cents AS HUGEINT) * cents) AS q_g
        |      FROM j GROUP BY c_mktsegment),
        |gm AS (SELECT *, (s_g * 100) // n_g AS m_g_x100 FROM g),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |        CAST(sum(n_g) AS BIGINT) AS n_total,
        |        CAST(sum(s_g) AS BIGINT) AS sum_cents,
        |        sum(q_g) AS ssq,
        |        sum(CAST(n_g AS HUGEINT) * m_g_x100 * m_g_x100) AS sb_raw
        |      FROM gm),
        |d AS (SELECT *, (sum_cents * 100) // n_total AS m_x100 FROM t),
        |f AS (SELECT k, n_total, sum_cents, ssq,
        |        sb_raw - CAST(n_total AS HUGEINT) * m_x100 * m_x100 AS ssb,
        |        ssq * 10000 - sb_raw AS ssw
        |      FROM d)
        |SELECT k, n_total, sum_cents,
        |  CAST(ssq // 1000000000000000000 AS BIGINT) AS ssq_hi,
        |  CAST(ssq % 1000000000000000000 AS BIGINT) AS ssq_lo,
        |  CAST(sign(ssb) AS INT) AS ssb_sign,
        |  CAST(abs(ssb) // 1000000000000000000 AS BIGINT) AS ssb_x1e4_abs_hi,
        |  CAST(abs(ssb) % 1000000000000000000 AS BIGINT) AS ssb_x1e4_abs_lo,
        |  CAST(ssw // 1000000000000000000 AS BIGINT) AS ssw_x1e4_hi,
        |  CAST(ssw % 1000000000000000000 AS BIGINT) AS ssw_x1e4_lo,
        |  CAST(ssb * (n_total - k) * 1000 // (ssw * (k - 1)) AS BIGINT) AS f_x1e3
        |FROM f""".stripMargin,

    "q_cramers_v" ->
      """WITH e AS (SELECT event_type,
        |             CAST(value >= 100.0 AS INTEGER) AS hi FROM events),
        |cells AS (SELECT event_type, hi, CAST(count(*) AS BIGINT) AS o
        |          FROM e GROUP BY event_type, hi),
        |rm AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r
        |       FROM cells GROUP BY event_type),
        |cm AS (SELECT hi, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY hi),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n_total FROM cells),
        |chi AS (SELECT cells.event_type, cells.hi,
        |          CAST((CAST(cells.o AS HUGEINT) * t.n_total
        |              - CAST(rm.r AS HUGEINT) * cm.c)
        |            * (CAST(cells.o AS HUGEINT) * t.n_total
        |              - CAST(rm.r AS HUGEINT) * cm.c) * 1000000
        |            // (CAST(t.n_total AS HUGEINT) * rm.r * cm.c) AS BIGINT) AS chi_x1e6,
        |          t.n_total
        |        FROM cells JOIN rm USING (event_type) JOIN cm USING (hi) CROSS JOIN t),
        |a AS (SELECT CAST(sum(chi_x1e6) AS BIGINT) AS chi2_x1e6,
        |        CAST(max(n_total) AS BIGINT) AS n,
        |        CAST(count(DISTINCT event_type) AS BIGINT) AS r,
        |        CAST(count(DISTINCT hi) AS BIGINT) AS c
        |      FROM chi)
        |SELECT chi2_x1e6, n, r, c, least(r - 1, c - 1) AS dof_min,
        |  (chi2_x1e6 * 1000) // (n * least(r - 1, c - 1)) AS v2_x1e9
        |FROM a""".stripMargin,

    "q_chisq" ->
      """WITH e AS (SELECT event_type,
        |             CAST(value >= 100.0 AS INTEGER) AS hi FROM events),
        |cells AS (SELECT event_type, hi, CAST(count(*) AS BIGINT) AS o
        |          FROM e GROUP BY event_type, hi),
        |rm AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r
        |       FROM cells GROUP BY event_type),
        |cm AS (SELECT hi, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY hi),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n_total FROM cells),
        |j AS (SELECT cells.event_type, cells.hi, cells.o, rm.r, cm.c, t.n_total,
        |        CAST(cells.o AS HUGEINT) * t.n_total
        |          - CAST(rm.r AS HUGEINT) * cm.c AS dev
        |      FROM cells JOIN rm USING (event_type) JOIN cm USING (hi) CROSS JOIN t)
        |SELECT event_type, hi, o, r, c, n_total,
        |  CAST(CAST(r AS HUGEINT) * c * 1000000 // n_total AS BIGINT) AS exp_x1e6,
        |  CAST(dev * dev * 1000000
        |    // (CAST(n_total AS HUGEINT) * r * c) AS BIGINT) AS chi_x1e6
        |FROM j ORDER BY event_type, hi""".stripMargin,

    "q_approx_distinct_hll" ->
      """WITH m AS (SELECT l_returnflag,
        |  xor(l_partkey * 2654435761, (l_partkey * 2654435761) // 65536)
        |    % 4294967296 AS x1 FROM lineitem),
        |h AS (SELECT l_returnflag,
        |  xor(x1 * 1779033703, (x1 * 1779033703) // 65536) % 4294967296 AS h
        |  FROM m),
        |b AS (SELECT l_returnflag, h % 64 AS bucket, h // 64 AS rest FROM h),
        |r AS (SELECT l_returnflag, bucket,
        |        max(CASE WHEN rest = 0 THEN 27 ELSE 27 - length(bin(rest)) END) AS rho
        |      FROM b GROUP BY l_returnflag, bucket),
        |flags AS (SELECT DISTINCT l_returnflag FROM lineitem),
        |grid AS (SELECT l_returnflag, g.i AS bucket
        |         FROM flags, range(0, 64) g(i)),
        |f AS (SELECT grid.l_returnflag, coalesce(r.rho, 0) AS rho
        |      FROM grid LEFT JOIN r
        |        ON grid.l_returnflag = r.l_returnflag AND grid.bucket = r.bucket),
        |s AS (SELECT l_returnflag,
        |        sum(CAST(1 AS BIGINT) << (50 - rho)) AS ssum
        |      FROM f GROUP BY l_returnflag),
        |x AS (SELECT l_returnflag,
        |        CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
        |        CAST(count(*) AS BIGINT) AS n_rows
        |      FROM lineitem GROUP BY l_returnflag)
        |SELECT s.l_returnflag,
        |  CAST(CAST(709376 AS HUGEINT) * 4096 * 1125899906842624
        |    // CAST(ssum AS HUGEINT) // 1000000 AS BIGINT) AS est_distinct,
        |  x.exact_distinct, x.n_rows
        |FROM s JOIN x USING (l_returnflag) ORDER BY l_returnflag""".stripMargin,

    "q_quantile_hist" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |cells AS (SELECT cents // 1000000 AS bin, CAST(count(*) AS BIGINT) AS n
        |          FROM c GROUP BY bin),
        |cum AS (SELECT bin, CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cum FROM cells),
        |tot AS (SELECT max(cum) AS n_total FROM cum),
        |ps AS (SELECT unnest([25, 50, 75, 90, 99]) AS p),
        |r AS (SELECT p, n_total, CAST((p * n_total + 99) // 100 AS BIGINT) AS rank
        |      FROM ps CROSS JOIN tot)
        |SELECT r.p, r.n_total, r.rank,
        |  min(cum.bin) * 1000000 AS est_lo_cents,
        |  (min(cum.bin) + 1) * 1000000 - 1 AS est_hi_cents
        |FROM r JOIN cum ON cum.cum >= r.rank
        |GROUP BY r.p, r.n_total, r.rank
        |ORDER BY r.p""".stripMargin,

    "q_freq_cms" ->
      """WITH h AS (
        |  SELECT k, cell, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT unnest([0, 1, 2]) AS k,
        |      unnest([
        |        ((o_custkey * 2654435761 + 1) % 2147483647) % 4096,
        |        ((o_custkey * 2246822519 + 7) % 2147483647) % 4096,
        |        ((o_custkey * 3266489917 + 13) % 2147483647) % 4096]) AS cell
        |    FROM orders) GROUP BY k, cell),
        |p AS (SELECT CAST(range AS BIGINT) AS probe_key FROM range(1, 21)),
        |e AS (
        |  SELECT probe_key, least(
        |    coalesce((SELECT n FROM h WHERE k = 0
        |      AND cell = ((probe_key * 2654435761 + 1) % 2147483647) % 4096), 0),
        |    coalesce((SELECT n FROM h WHERE k = 1
        |      AND cell = ((probe_key * 2246822519 + 7) % 2147483647) % 4096), 0),
        |    coalesce((SELECT n FROM h WHERE k = 2
        |      AND cell = ((probe_key * 3266489917 + 13) % 2147483647) % 4096), 0)) AS est
        |  FROM p),
        |x AS (SELECT o_custkey AS probe_key, CAST(count(*) AS BIGINT) AS exact
        |      FROM orders WHERE o_custkey <= 20 GROUP BY o_custkey)
        |SELECT e.probe_key, e.est, coalesce(x.exact, 0) AS exact,
        |  e.est - coalesce(x.exact, 0) AS overcount
        |FROM e LEFT JOIN x USING (probe_key) ORDER BY probe_key""".stripMargin,

    "q_decay" ->
      s"""WITH o AS (
         |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS y,
         |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |m AS (SELECT max(y) AS max_y FROM o),
         |j AS (
         |  SELECT o.cents, o.y, m.max_y, c.c_mktsegment
         |  FROM o CROSS JOIN m
         |  JOIN customer c ON o.o_custkey = c.c_custkey),
         |g AS (
         |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
         |    sum(cents) AS sc,
         |    sum(cents * (${Relational.decayCaseSql})) AS dc
         |  FROM j GROUP BY c_mktsegment)
         |SELECT c_mktsegment, n_orders,
         |  CAST(sc // 1000000000000000000 AS BIGINT) AS spend_cents_hi,
         |  CAST(sc % 1000000000000000000 AS BIGINT) AS spend_cents_lo,
         |  CAST(dc // 1000000000000000000 AS BIGINT) AS decayed_x64_hi,
         |  CAST(dc % 1000000000000000000 AS BIGINT) AS decayed_x64_lo,
         |  CAST((dc * 15625) // sc AS BIGINT) AS recency_x1e6
         |FROM g ORDER BY c_mktsegment""".stripMargin,

    "q_benford" -> {
      s"""WITH d AS (
         |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
         |  FROM orders),
         |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit)
         |SELECT digit, n, CAST(n * 10000 // sum(n) OVER () AS BIGINT) AS share_x1e4,
         |  ${Relational.benfordCaseSql} AS benford_x1e4
         |FROM g ORDER BY digit""".stripMargin
    },

    "q_histogram_log" ->
      """WITH c AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders)
        |SELECT CAST(length(bin(cents)) AS INT) AS log2_bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(cents) AS lo_cents, max(cents) AS hi_cents
        |FROM c GROUP BY log2_bucket ORDER BY log2_bucket""".stripMargin,

    "q_kmv_overlap" ->
      """WITH li AS (
        |  SELECT CAST(year(l_shipdate) AS INT) AS y,
        |    (l_partkey * 2654435761) % 4294967296 AS h
        |  FROM lineitem),
        |a AS (SELECT DISTINCT h FROM li WHERE y = 1995),
        |b AS (SELECT DISTINCT h FROM li WHERE y = 1996),
        |u AS (SELECT h FROM a UNION SELECT h FROM b),
        |su AS (SELECT h FROM u ORDER BY h LIMIT 64),
        |th AS (SELECT max(h) AS theta, CAST(count(*) AS BIGINT) AS k FROM su),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS inter_in_window
        |  FROM su WHERE su.h IN (SELECT h FROM a) AND su.h IN (SELECT h FROM b)),
        |ex AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
        |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
        |  (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b USING (h)) AS exact_inter)
        |SELECT th.k, th.theta,
        |  ((th.k - 1) * 4294967296) // th.theta AS est_union,
        |  m.inter_in_window,
        |  m.inter_in_window * 1000000 // th.k AS jaccard_x1e6,
        |  m.inter_in_window * (((th.k - 1) * 4294967296) // th.theta) // th.k AS est_inter,
        |  ex.n_a, ex.n_b, ex.exact_inter
        |FROM th, m, ex""".stripMargin,

    "q_regression" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_quantity * 100 + 0.5) AS HUGEINT) AS x,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM t GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS dxx, n * syy - sy * sy AS dyy
        |  FROM m)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST((1000000 * num) // dxx AS BIGINT) AS slope_x1e6,
        |  CAST((((1000000 * num) // dxx) * num) // dyy AS BIGINT) AS r2_x1e6
        |FROM d ORDER BY l_returnflag""".stripMargin,

    "q_rfm" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS day,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |mx AS (SELECT max(day) AS now_day FROM o),
        |r AS (
        |  SELECT o_custkey, min(mx.now_day - day) AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(cents) AS BIGINT) AS monetary_cents
        |  FROM o CROSS JOIN mx GROUP BY o_custkey)
        |SELECT o_custkey, recency_days, frequency, monetary_cents,
        |  CASE WHEN recency_days <= 90 AND frequency >= 10 THEN 'champion'
        |       WHEN recency_days <= 90 THEN 'recent'
        |       WHEN frequency >= 10 THEN 'loyal_lapsed'
        |       ELSE 'hibernating' END AS segment
        |FROM r ORDER BY o_custkey""".stripMargin,

    "q7_volume" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey, CAST(year(l_shipdate) AS INT) AS ship_year,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |      (10000 - CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS vol
        |  FROM lineitem)
        |SELECT CAST(c.c_nationkey AS BIGINT) AS c_nation,
        |  CAST(s.s_nationkey AS BIGINT) AS s_nation, ship_year,
        |  CAST(CAST(sum(CAST(vol AS HUGEINT)) AS HUGEINT) // 10000 AS BIGINT) AS volume_cents,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM li
        |JOIN orders o ON li.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON li.l_suppkey = s.s_suppkey
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_share" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey, CAST(year(l_shipdate) AS INT) AS ship_year,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |      (10000 - CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS vol
        |  FROM lineitem),
        |j AS (
        |  SELECT ship_year,
        |    CASE WHEN s.s_nationkey = 3 THEN vol END AS nat_vol, vol
        |  FROM li
        |  JOIN orders o ON li.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN supplier s ON li.l_suppkey = s.s_suppkey
        |  WHERE n.n_regionkey = 0)
        |SELECT ship_year,
        |  CAST(COALESCE(sum(CAST(nat_vol AS HUGEINT)), 0) // 10000 AS BIGINT) AS nation_cents,
        |  CAST(sum(CAST(vol AS HUGEINT)) // 10000 AS BIGINT) AS total_cents,
        |  CAST((COALESCE(sum(CAST(nat_vol AS HUGEINT)), 0) * 1000000)
        |    // sum(CAST(vol AS HUGEINT)) AS BIGINT) AS share_x1e6
        |FROM j GROUP BY ship_year ORDER BY ship_year""".stripMargin,

    "q_window_dist" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cum_dist,
        |  CAST(dense_rank() OVER w AS INT) AS drank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
        |ORDER BY c_custkey""".stripMargin,

    "q_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c, p_size
        |  FROM part)
        |SELECT a.p_partkey, a.p_name, a.price_c, a.p_size
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price_c <= a.price_c AND b.p_size <= a.p_size
        |    AND (b.price_c < a.price_c OR b.p_size < a.p_size))
        |ORDER BY a.p_partkey""".stripMargin,

    "q_fuzzy_join" ->
      """SELECT c_custkey, s_suppkey,
        |  CAST(c_nationkey AS BIGINT) AS nationkey,
        |  CAST(levenshtein(c_name, s_name) AS INT) AS lev
        |FROM customer JOIN supplier ON c_nationkey = s_nationkey
        |WHERE levenshtein(c_name, s_name) <= 6
        |ORDER BY c_custkey, s_suppkey""".stripMargin,

    "q_duplicate_audit" ->
      """WITH keys AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM orders GROUP BY 1, 2)
        |SELECT k AS multiplicity, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(k) AS BIGINT) AS n_orders
        |FROM keys GROUP BY k ORDER BY multiplicity""".stripMargin,

    "q_power_users" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM spend),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |          CAST(sum(cents) AS BIGINT) AS total_cents FROM spend),
        |br AS (SELECT unnest([1, 5, 10]) AS pct)
        |SELECT CAST(br.pct AS BIGINT) AS pct,
        |  greatest(1, (t.n_users * br.pct) // 100) AS k_users,
        |  t.n_users, t.total_cents,
        |  r.cum_cents AS top_cents,
        |  CAST(CAST(r.cum_cents AS HUGEINT) * 10000 // t.total_cents AS BIGINT) AS share_x1e4
        |FROM br CROSS JOIN tot t
        |JOIN ranked r ON r.rn = greatest(1, (t.n_users * br.pct) // 100)
        |ORDER BY pct""".stripMargin,

    "q_adoption" ->
      """WITH fs AS (
        |  SELECT l_partkey,
        |    min(epoch_us(o_orderdate) // 86400000000 // 30) AS month
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY l_partkey),
        |m AS (SELECT month, CAST(count(*) AS BIGINT) AS n_new
        |      FROM fs GROUP BY month),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part)
        |SELECT month, n_new,
        |  CAST(sum(n_new) OVER (ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_active,
        |  (CAST(sum(n_new) OVER (ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) * 1000000)
        |    // c.n_parts AS coverage_ppm
        |FROM m CROSS JOIN c ORDER BY month""".stripMargin,

    "q_rank_shift" ->
      """WITH li AS (
        |  SELECT p.p_brand,
        |    CASE WHEN o.o_orderdate >= TIMESTAMP '1995-02-01' THEN 1 ELSE 0 END AS m2,
        |    CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100 + 0.5)
        |      AS BIGINT) AS cents
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o.o_orderdate < TIMESTAMP '1995-03-01'),
        |g AS (
        |  SELECT p_brand,
        |    CAST(sum(CASE WHEN m2 = 0 THEN cents ELSE 0 END) AS BIGINT) AS rev1,
        |    CAST(sum(CASE WHEN m2 = 1 THEN cents ELSE 0 END) AS BIGINT) AS rev2
        |  FROM li GROUP BY p_brand),
        |r AS (
        |  SELECT p_brand, rev1, rev2,
        |    CAST(row_number() OVER (ORDER BY rev1 DESC, p_brand) AS BIGINT) AS rank1,
        |    CAST(row_number() OVER (ORDER BY rev2 DESC, p_brand) AS BIGINT) AS rank2
        |  FROM g)
        |SELECT p_brand, rev1, rev2, rank1, rank2, rank1 - rank2 AS shift
        |FROM r ORDER BY rank2""".stripMargin,

    "q_ship_latency" ->
      """WITH ls AS (
        |  SELECT l_orderkey, max(l_shipdate) AS last_ship
        |  FROM lineitem GROUP BY l_orderkey),
        |lat AS (
        |  SELECT o.o_orderpriority AS prio,
        |    (epoch_us(ls.last_ship) - epoch_us(o.o_orderdate)) // 86400000000 AS days
        |  FROM orders o JOIN ls ON o.o_orderkey = ls.l_orderkey),
        |lb AS (SELECT prio, days, length(bin(greatest(days, 1))) AS bucket FROM lat),
        |h AS (
        |  SELECT prio,
        |    array_to_string(list_sort(list(
        |      lpad(CAST(bucket AS VARCHAR), 2, '0') || ':' || CAST(c AS VARCHAR))), ',')
        |      AS hist_csv
        |  FROM (SELECT prio, bucket, CAST(count(*) AS BIGINT) AS c
        |        FROM lb GROUP BY prio, bucket)
        |  GROUP BY prio),
        |s AS (
        |  SELECT prio, CAST(count(*) AS BIGINT) AS n_orders,
        |    (CAST(sum(days) AS BIGINT) * 100) // CAST(count(*) AS BIGINT)
        |      AS mean_days_x100,
        |    CAST(max(days) AS BIGINT) AS max_days
        |  FROM lat GROUP BY prio)
        |SELECT s.prio, s.n_orders, s.mean_days_x100, s.max_days, h.hist_csv
        |FROM s JOIN h USING (prio) ORDER BY s.prio""".stripMargin,

    "q_backlog" ->
      """WITH placed AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS opened
        |  FROM orders GROUP BY day),
        |done AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS closed FROM (
        |    SELECT l_orderkey,
        |      max(epoch_us(l_shipdate) // 86400000000) AS day
        |    FROM lineitem GROUP BY l_orderkey)
        |  GROUP BY day),
        |g AS (
        |  SELECT coalesce(p.day, d.day) AS day,
        |    coalesce(p.opened, 0) AS opened, coalesce(d.closed, 0) AS closed
        |  FROM placed p FULL OUTER JOIN done d ON p.day = d.day)
        |SELECT day, CAST(opened AS BIGINT) AS opened,
        |  CAST(closed AS BIGINT) AS closed,
        |  CAST(sum(opened) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_opened,
        |  CAST(sum(closed) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_closed,
        |  CAST(sum(opened) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  - CAST(sum(closed) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
        |FROM g ORDER BY day""".stripMargin,

    "q_linreg_multi" ->
      """WITH po AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS x1,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2
        |  FROM lineitem GROUP BY l_orderkey),
        |b AS (
        |  SELECT o.o_orderpriority AS prio,
        |    CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y,
        |    po.x1, po.x2
        |  FROM orders o JOIN po ON o.o_orderkey = po.l_orderkey),
        |m AS (
        |  SELECT prio, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1) AS BIGINT) // CAST(count(*) AS BIGINT) AS m1,
        |    CAST(sum(x2) AS BIGINT) // CAST(count(*) AS BIGINT) AS m2,
        |    CAST(sum(y) AS BIGINT) // CAST(count(*) AS BIGINT) AS my
        |  FROM b GROUP BY prio),
        |s AS (
        |  SELECT b.prio, m.n,
        |    sum(CAST(b.x1 - m.m1 AS HUGEINT) * (b.x1 - m.m1)) AS s11,
        |    sum(CAST(b.x2 - m.m2 AS HUGEINT) * (b.x2 - m.m2)) AS s22,
        |    sum(CAST(b.x1 - m.m1 AS HUGEINT) * (b.x2 - m.m2)) AS s12,
        |    sum(CAST(b.x1 - m.m1 AS HUGEINT) * (b.y - m.my)) AS s1y,
        |    sum(CAST(b.x2 - m.m2 AS HUGEINT) * (b.y - m.my)) AS s2y
        |  FROM b JOIN m USING (prio) GROUP BY b.prio, m.n),
        |d AS (
        |  SELECT prio, n, s11 * s22 - s12 * s12 AS det,
        |    s1y * s22 - s2y * s12 AS n1, s2y * s11 - s1y * s12 AS n2
        |  FROM s)
        |SELECT prio, n,
        |  CAST(CASE WHEN det > 0 THEN
        |    (abs(n1) // det) * 1000000 + ((abs(n1) % det) * 1000000) // det
        |  ELSE 0 END AS BIGINT) AS b1_abs_x1e6,
        |  CAST(CASE WHEN det > 0 THEN sign(n1) ELSE 0 END AS INT) AS b1_sign,
        |  CAST(CASE WHEN det > 0 THEN
        |    (abs(n2) // det) * 1000000 + ((abs(n2) % det) * 1000000) // det
        |  ELSE 0 END AS BIGINT) AS b2_abs_x1e6,
        |  CAST(CASE WHEN det > 0 THEN sign(n2) ELSE 0 END AS INT) AS b2_sign
        |FROM d ORDER BY prio""".stripMargin,

    "q_bridge_analysis" ->
      """WITH li AS (
        |  SELECT p.p_brand,
        |    CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END AS p1,
        |    CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100 + 0.5)
        |      AS BIGINT) AS cents,
        |    CAST(l.l_quantity AS BIGINT) AS qty
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o.o_orderdate < TIMESTAMP '1997-01-01'),
        |g AS (
        |  SELECT p_brand,
        |    CAST(sum(CASE WHEN p1 = 0 THEN qty ELSE 0 END) AS BIGINT) AS qty0,
        |    CAST(sum(CASE WHEN p1 = 1 THEN qty ELSE 0 END) AS BIGINT) AS qty1,
        |    CAST(sum(CASE WHEN p1 = 0 THEN cents ELSE 0 END) AS BIGINT) AS rev0_c,
        |    CAST(sum(CASE WHEN p1 = 1 THEN cents ELSE 0 END) AS BIGINT) AS rev1_c
        |  FROM li GROUP BY p_brand)
        |SELECT p_brand, qty0, qty1, rev0_c, rev1_c,
        |  rev1_c - rev0_c AS delta_c,
        |  rev0_c // qty0 AS unit0_c,
        |  (qty1 - qty0) * (rev0_c // qty0) AS volume_effect_c,
        |  (rev1_c - rev0_c) - (qty1 - qty0) * (rev0_c // qty0) AS price_mix_effect_c
        |FROM g WHERE qty0 > 0 ORDER BY p_brand""".stripMargin,

    "q_discount_impact" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS gross_revenue,
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |    AS discount_given,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS net_revenue,
        |  CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
        |      * 10000 AS HUGEINT) * 10000
        |    // CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS HUGEINT)
        |    AS BIGINT) AS disc_rate_x1e4
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_moments" ->
      """WITH x AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(floor(o_totalprice) AS BIGINT) // 100 AS x
        |  FROM orders),
        |m AS (SELECT prio, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS xbar
        |      FROM x GROUP BY prio),
        |c AS (SELECT x.prio, m.n, m.xbar, x.x - m.xbar AS c
        |      FROM x JOIN m USING (prio)),
        |s AS (
        |  SELECT prio, n, xbar,
        |    sum(CAST(c AS HUGEINT) * c) AS m2,
        |    sum(CAST(c AS HUGEINT) * c * c) AS m3,
        |    sum(CAST(c AS HUGEINT) * c * c * c) AS m4
        |  FROM c GROUP BY prio, n, xbar)
        |SELECT prio, n, xbar,
        |  CAST(m2 // n AS BIGINT) AS var_u,
        |  CAST(CASE WHEN m2 > 0 THEN
        |    ((abs(m3) * 1000000 // m2) * (abs(m3) * 1000000 // m2) * n) // m2
        |  ELSE 0 END AS BIGINT) AS skew2_x1e12,
        |  CAST(sign(m3) AS INT) AS skew_sign,
        |  CAST(CASE WHEN m2 > 0 THEN (n * (m4 * 1000000 // m2)) // m2
        |  ELSE 0 END AS BIGINT) AS kurt_x1e6
        |FROM s ORDER BY prio""".stripMargin,

    "q_key_skew" ->
      """WITH keys AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY l_partkey),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |        CAST(count(*) AS BIGINT) AS n_keys,
        |        CAST(max(cnt) AS BIGINT) AS max_cnt FROM keys)
        |SELECT l_partkey, cnt,
        |  (cnt * 1000000) // t.n_rows AS share_ppm,
        |  CAST(CAST(t.max_cnt AS HUGEINT) * t.n_keys * 100 // t.n_rows AS BIGINT)
        |    AS skew_x100
        |FROM keys CROSS JOIN t
        |ORDER BY cnt DESC, l_partkey LIMIT 10""".stripMargin,

    "q_pareto" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM spend),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |          CAST(sum(cents) AS BIGINT) AS total_cents FROM spend),
        |br AS (SELECT CAST(unnest([50, 80, 90]) AS BIGINT) AS pct),
        |k AS (
        |  SELECT br.pct, t.n_users, t.total_cents,
        |    CAST(min(r.rn) AS BIGINT) AS k_users
        |  FROM br CROSS JOIN tot t
        |  JOIN ranked r ON r.cum_cents * 100 >= t.total_cents * br.pct
        |  GROUP BY br.pct, t.n_users, t.total_cents)
        |SELECT k.pct, k.n_users, k.total_cents, k.k_users,
        |  (k.k_users * 10000) // k.n_users AS k_pop_x1e4,
        |  r2.cum_cents,
        |  CAST(CAST(r2.cum_cents AS HUGEINT) * 10000 // k.total_cents AS BIGINT)
        |    AS share_x1e4
        |FROM k JOIN ranked r2 ON r2.rn = k.k_users
        |ORDER BY k.pct""".stripMargin,

    "q_ntile" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |d AS (SELECT cents, CAST(ntile(10) OVER (ORDER BY cents, o_orderkey) AS INT) AS decile FROM o)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n_orders,
        |  min(cents) AS min_cents, max(cents) AS max_cents,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM d GROUP BY decile ORDER BY decile""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q_outer_join" ->
      """SELECT c_custkey, c_mktsegment,
        |  count(o_orderkey) AS n_orders,
        |  COALESCE(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(epoch_us(o_orderdate)) OVER wd AS prev_us,
        |  lead(epoch_us(o_orderdate)) OVER wd AS next_us,
        |  CAST(ntile(4) OVER wd AS INT) AS quartile,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank
        |FROM orders
        |WINDOW wd AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  lower(p_brand) AS lbrand,
        |  substr(p_type, 1, 5) AS type_prefix,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_brand || '#' || p_type AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
        |      / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
        |  FROM orders
        |) WHERE o_totalprice > cust_avg ORDER BY o_orderkey""".stripMargin,

    "q_sample_stratified" ->
      """SELECT c_custkey, c_mktsegment, rn FROM (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS INT) AS rn
        |  FROM customer
        |) WHERE rn % 7 = 1 ORDER BY c_custkey""".stripMargin,

    "q_time_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join_topk" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1994-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1995-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q10_returned" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q13_custdist" ->
      """WITH pc AS (
        |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_promo" ->
      """WITH s AS (
        |  SELECT
        |    sum(CASE WHEN p_type = 'ECONOMY'
        |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |        ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS promo,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS total
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1995-03-01'
        |    AND l_shipdate < TIMESTAMP '1995-04-01')
        |SELECT
        |  CAST(CAST(promo * 10000 AS HUGEINT) * 10000
        |    // CAST(total * 10000 AS HUGEINT) AS BIGINT) AS promo_share_x1e4,
        |  CAST(promo AS DOUBLE) AS promo_revenue,
        |  CAST(total AS DOUBLE) AS total_revenue
        |FROM s""".stripMargin,

    "q2_min_cost_supp" ->
      """WITH cost AS (
        |  SELECT p_partkey, l_suppkey,
        |    min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |        // CAST(l_quantity AS BIGINT)) AS cost_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 10 AND p_type = 'SMALL'
        |  GROUP BY 1, 2),
        |minc AS (SELECT p_partkey, min(cost_cents) AS min_cents FROM cost GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, cost_cents
        |FROM cost
        |JOIN minc USING (p_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE cost_cents = min_cents AND r_name = 'EUROPE'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "q9_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |         - CAST(p_retailprice * l_quantity * 0.8 AS DECIMAL(18,4)))
        |    AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,

    "q12_ship_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY l_linestatus""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE r = (SELECT max(r) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_supp_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 = 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_small_qty" ->
      """WITH pa AS (
        |  SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sq,
        |    count(*) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue
        |FROM lineitem l
        |JOIN part ON l.l_partkey = p_partkey
        |JOIN pa ON pa.l_partkey = l.l_partkey
        |WHERE p_brand = 'Brand#5'
        |  AND CAST(l_quantity AS BIGINT) * 2 * n < sq""".stripMargin,

    "q18_large_orders" ->
      """WITH oq AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  epoch_us(o_orderdate) AS o_date_us, o_totalprice, sum_qty
        |FROM oq
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q19_disjunctive" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#10' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_dominant_supp" ->
      """WITH vol AS (
        |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS sq
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2),
        |tot AS (SELECT l_partkey, sum(sq) AS tq FROM vol GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_dominated
        |FROM vol JOIN tot USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE sq * 2 > tq
        |GROUP BY 1, 2
        |ORDER BY n_dominated DESC, s_suppkey LIMIT 100""".stripMargin,

    "q21_late_supplier" ->
      """WITH f AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |g AS (
        |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS ns,
        |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nl,
        |    max(CASE WHEN late THEN l_suppkey END) AS late_supp
        |  FROM f GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM g JOIN supplier ON late_supp = s_suppkey
        |WHERE ns >= 2 AND nl = 1
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q22_idle_rich" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_name, c_acctbal,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |pos AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pos,
        |    CAST(sum(cents) AS BIGINT) AS sum_pos
        |  FROM cust WHERE c_acctbal > 0)
        |SELECT right(c_name, 1) AS check_digit,
        |  CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM cust, pos
        |WHERE right(c_name, 1) IN ('1', '3', '5', '7', '9')
        |  AND cents * n_pos > sum_pos
        |  AND c_custkey NOT IN (
        |    SELECT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY check_digit""".stripMargin,

    "q6_filter_agg" ->
      """SELECT COALESCE(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01'
        |  AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q_semi_anti" ->
      """SELECT * FROM (
        |  SELECT 'with_orders' AS kind, count(*) AS n FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  UNION ALL
        |  SELECT 'without_orders' AS kind, count(*) AS n FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |) ORDER BY kind""".stripMargin,

    "q_in_subquery" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_histogram" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders)
        |SELECT cents // 2500000 AS bin, count(*) AS n,
        |  min(cents) AS lo_cents, max(cents) AS hi_cents
        |FROM c GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_stats" ->
      """WITH c AS (
        |  SELECT o_orderstatus,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(19,0)) AS cents
        |  FROM orders),
        |a AS (
        |  SELECT o_orderstatus, count(*) AS n,
        |    sum(cents) AS sum_c, sum(cents * cents) AS sumsq_c
        |  FROM c GROUP BY o_orderstatus)
        |SELECT o_orderstatus, n,
        |  CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
        |  (CAST(n AS DOUBLE) * CAST(sumsq_c AS DOUBLE) - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_cents
        |FROM a ORDER BY o_orderstatus""".stripMargin,

    "q_set_ops" ->
      """SELECT c_custkey FROM (
        |  (
        |    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |     INTERSECT
        |     SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000.0)
        |    UNION ALL
        |    SELECT c_custkey FROM customer WHERE c_acctbal < 0
        |  )
        |  EXCEPT
        |  (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |   INTERSECT
        |   SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |) ORDER BY c_custkey""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice
        |FROM part
        |WHERE p_retailprice > (
        |  SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "q_topk_per_group" ->
      """SELECT p_brand, rk, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rk
        |  FROM part
        |) WHERE rk <= 3
        |ORDER BY p_brand, rk""".stripMargin,

    "q_topk_native" ->
      """SELECT p_brand, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part
        |) WHERE rk <= 3
        |ORDER BY p_brand, p_retailprice DESC, p_partkey""".stripMargin,

    "q_distinct" ->
      """SELECT c_mktsegment,
        |  count(DISTINCT c_nationkey) AS n_nations,
        |  count(*) AS n_customers
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    // q_approx_distinct intentionally omitted: HLL estimate (rows-only check).

    "q_vwap" ->
      """SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  (CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) * 100)
        |    // CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vwap_cents_x100
        |FROM lineitem GROUP BY ym ORDER BY ym""".stripMargin,

    "q_bitmap_distinct" ->
      """SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY ym ORDER BY ym""".stripMargin,
    "q_bitmap_distinct_roaring" ->
      """SELECT o_orderpriority,
        |  CAST(count(DISTINCT list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split_regex(CAST(o_custkey AS VARCHAR), ''), c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * 31 + b) % 1000000007)) AS BIGINT) AS n_distinct_keys,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_approx_distinct_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |    (l_partkey * 2654435761) % 4294967296 AS h FROM lineitem),
        |rk AS (SELECT l_returnflag, h,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
        |       FROM h),
        |agg AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_h FROM h GROUP BY 1),
        |kth AS (SELECT l_returnflag, h AS h_k FROM rk WHERE rk = 64),
        |nr AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows
        |       FROM lineitem GROUP BY 1)
        |SELECT nr.l_returnflag, nr.n_rows,
        |  CASE WHEN a.n_h < 64 THEN a.n_h
        |       ELSE (63 * 4294967296) // greatest(k.h_k, 1) END AS est_distinct
        |FROM nr JOIN agg a ON nr.l_returnflag = a.l_returnflag
        |LEFT JOIN kth k ON nr.l_returnflag = k.l_returnflag
        |ORDER BY nr.l_returnflag""".stripMargin,

    // replays the deterministic level-sampling rule: level = trailing
    // zeros of the content hash, L = min level with <= 256 survivors,
    // quantiles = order statistics of the surviving sample
    "q_quantile_kll" ->
      """WITH r AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
        |    (((l_orderkey * 40503 + l_linenumber * 7919 + l_partkey) % 2147483648)
        |      * 2654435761) % 4294967296 AS h
        |  FROM lineitem),
        |lv AS (SELECT l_returnflag, v,
        |         CASE WHEN h = 0 THEN 32 ELSE bit_count((h & -h) - 1) END AS lvl
        |       FROM r),
        |lsel AS (
        |  SELECT l_returnflag, CAST(min(L) AS BIGINT) AS lvl FROM (
        |    SELECT lv.l_returnflag, g.L,
        |      sum(CASE WHEN lv.lvl >= g.L THEN 1 ELSE 0 END) AS c
        |    FROM lv, range(0, 34) g(L) GROUP BY 1, 2)
        |  WHERE c <= 256 GROUP BY 1),
        |rk AS (
        |  SELECT lv.l_returnflag, lv.v,
        |    row_number() OVER (PARTITION BY lv.l_returnflag ORDER BY lv.v) AS rk,
        |    count(*) OVER (PARTITION BY lv.l_returnflag) AS n_samp
        |  FROM lv JOIN lsel s ON lv.l_returnflag = s.l_returnflag
        |  WHERE lv.lvl >= s.lvl),
        |agg AS (
        |  SELECT l_returnflag, CAST(max(n_samp) AS BIGINT) AS n_samp,
        |    CAST(min(CASE WHEN rk = greatest(1, (n_samp * 50 + 99) // 100) THEN v END) AS BIGINT) AS p50_cents,
        |    CAST(min(CASE WHEN rk = greatest(1, (n_samp * 90 + 99) // 100) THEN v END) AS BIGINT) AS p90_cents,
        |    CAST(min(CASE WHEN rk = greatest(1, (n_samp * 99 + 99) // 100) THEN v END) AS BIGINT) AS p99_cents
        |  FROM rk GROUP BY 1),
        |nr AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows
        |       FROM lineitem GROUP BY 1)
        |SELECT nr.l_returnflag, nr.n_rows, s.lvl,
        |  coalesce(a.n_samp, CAST(0 AS BIGINT)) AS n_samp,
        |  coalesce(a.n_samp, CAST(0 AS BIGINT)) * (CAST(1 AS BIGINT) << s.lvl) AS est_n,
        |  a.p50_cents, a.p90_cents, a.p99_cents
        |FROM nr JOIN lsel s ON nr.l_returnflag = s.l_returnflag
        |LEFT JOIN agg a ON nr.l_returnflag = a.l_returnflag
        |ORDER BY nr.l_returnflag""".stripMargin,

    "q_string_agg" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  string_agg(c_name, '|' ORDER BY c_name) AS names
        |FROM customer WHERE c_acctbal < 0.0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_mode" ->
      """SELECT l_returnflag, mode_qty, n FROM (
        |  SELECT l_returnflag, l_quantity AS mode_qty, n,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY n DESC, l_quantity ASC) AS rk
        |  FROM (SELECT l_returnflag, l_quantity, CAST(count(*) AS BIGINT) AS n
        |        FROM lineitem GROUP BY 1, 2))
        |WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,

    "q_gap_fill" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |                 CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1),
        |cal AS (SELECT CAST(unnest(generate_series(
        |          CAST((SELECT min(d) FROM daily) AS TIMESTAMP),
        |          CAST((SELECT max(d) FROM daily) AS TIMESTAMP),
        |          INTERVAL 1 DAY)) AS DATE) AS d)
        |SELECT strftime(cal.d, '%Y-%m-%d') AS day,
        |  COALESCE(daily.n, CAST(0 AS BIGINT)) AS n_orders,
        |  CAST(CASE WHEN daily.n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
        |FROM cal LEFT JOIN daily ON cal.d = daily.d
        |ORDER BY day""".stripMargin,

    "q_profile" ->
      """WITH b AS (SELECT *, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |           FROM customer),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
        |SELECT p.column_name, n.n, p.n_null, p.n_distinct, p.min_s, p.max_s
        |FROM (
        |  SELECT 'c_custkey' AS column_name,
        |    CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_s, CAST(max(c_custkey) AS VARCHAR) AS max_s
        |  FROM b
        |  UNION ALL
        |  SELECT 'c_name',
        |    CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_name) AS BIGINT),
        |    min(c_name), max(c_name) FROM b
        |  UNION ALL
        |  SELECT 'c_mktsegment',
        |    CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |    min(c_mktsegment), max(c_mktsegment) FROM b
        |  UNION ALL
        |  SELECT 'c_acctbal_cents',
        |    CAST(sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT cents) AS BIGINT),
        |    CAST(min(cents) AS VARCHAR), CAST(max(cents) AS VARCHAR) FROM b
        |) p CROSS JOIN n
        |ORDER BY p.column_name""".stripMargin,

    "q_set_ops_all" ->
      """WITH f AS (SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'),
        |o AS (SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O'),
        |ex AS (SELECT 'except_all' AS op, l_partkey, CAST(count(*) AS BIGINT) AS n
        |       FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM o) GROUP BY 2),
        |ia AS (SELECT 'intersect_all' AS op, l_partkey, CAST(count(*) AS BIGINT) AS n
        |       FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM o) GROUP BY 2)
        |SELECT op, l_partkey, n
        |FROM (SELECT * FROM ex UNION ALL SELECT * FROM ia)
        |ORDER BY op, l_partkey""".stripMargin,

    "q_full_outer" ->
      """WITH od AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |              CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1),
        |sd AS (SELECT CAST(l_shipdate AS DATE) AS d,
        |         CAST(count(*) AS BIGINT) AS n_ships FROM lineitem GROUP BY 1)
        |SELECT strftime(COALESCE(od.d, sd.d), '%Y-%m-%d') AS day,
        |  COALESCE(n_orders, CAST(0 AS BIGINT)) AS n_orders,
        |  COALESCE(n_ships, CAST(0 AS BIGINT)) AS n_ships
        |FROM od FULL OUTER JOIN sd ON od.d = sd.d
        |ORDER BY day""".stripMargin,

    "q_outlier_mad" ->
      """WITH c AS (SELECT o_orderstatus,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |m AS (SELECT o_orderstatus,
        |  CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS med2 FROM c GROUP BY 1),
        |d AS (SELECT c.o_orderstatus, m.med2, abs(2 * c.cents - m.med2) AS dev2
        |      FROM c JOIN m USING (o_orderstatus)),
        |md AS (SELECT o_orderstatus,
        |  CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4 FROM d GROUP BY 1)
        |SELECT d.o_orderstatus, min(d.med2) AS med2, min(md.mad4) AS mad4,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN 2 * d.dev2 > 3 * md.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        |FROM d JOIN md USING (o_orderstatus)
        |GROUP BY d.o_orderstatus ORDER BY d.o_orderstatus""".stripMargin,

    "q_grouping_id" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,

    "q_percentile_cont" ->
      """SELECT l_returnflag,
        |  quantile_cont(CAST(l_quantity * 100 AS BIGINT), 0.5) AS median_cents,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_lorenz" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |j AS (SELECT s.o_custkey, s.cents, c.c_mktsegment
        |      FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
        |r AS (
        |  SELECT c_mktsegment, cents,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY cents, o_custkey) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
        |  FROM j),
        |d AS (
        |  SELECT c_mktsegment, ((rn - 1) * 10) // n AS decile,
        |    CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(cents) AS BIGINT) AS cents
        |  FROM r GROUP BY c_mktsegment, ((rn - 1) * 10) // n),
        |c AS (
        |  SELECT c_mktsegment, decile, n_customers, cents,
        |    CAST(sum(cents) OVER (PARTITION BY c_mktsegment ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
        |    CAST(sum(cents) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS seg_cents
        |  FROM d)
        |SELECT c_mktsegment, decile, n_customers, cents,
        |  CAST(CAST(cum_cents AS HUGEINT) * 1000000 // seg_cents AS BIGINT) AS cum_share_ppm
        |FROM c ORDER BY c_mktsegment, decile""".stripMargin,

    "q_abc_analysis" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY l_partkey),
        |r AS (
        |  SELECT l_partkey, cents,
        |    CAST(row_number() OVER (ORDER BY cents DESC, l_partkey) AS BIGINT) AS rk,
        |    CAST(COALESCE(sum(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bef,
        |    CAST(sum(cents) OVER () AS BIGINT) AS total
        |  FROM rev),
        |cl AS (
        |  SELECT *,
        |    CASE WHEN CAST(bef AS HUGEINT) * 100 < CAST(total AS HUGEINT) * 70 THEN 'A'
        |         WHEN CAST(bef AS HUGEINT) * 100 < CAST(total AS HUGEINT) * 90 THEN 'B'
        |         ELSE 'C' END AS abc_class
        |  FROM r)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(CAST(sum(cents) AS HUGEINT) * 1000000 // max(total) AS BIGINT) AS share_ppm,
        |  min(rk) AS min_rank, max(rk) AS max_rank
        |FROM cl GROUP BY abc_class ORDER BY abc_class""".stripMargin,

    "q_winsorize" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |j AS (SELECT s.cents, c.c_mktsegment
        |      FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
        |r AS (
        |  SELECT c_mktsegment, cents,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents) AS rk,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM j),
        |lims AS (
        |  SELECT c_mktsegment,
        |    CAST(max(CASE WHEN rk = (n * 10 + 99) // 100 THEN cents END) AS BIGINT) AS lo_cents,
        |    CAST(max(CASE WHEN rk = (n * 90 + 99) // 100 THEN cents END) AS BIGINT) AS hi_cents
        |  FROM r GROUP BY c_mktsegment)
        |SELECT j.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  l.lo_cents, l.hi_cents,
        |  CAST(sum(CASE WHEN j.cents < l.lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
        |  CAST(sum(CASE WHEN j.cents > l.hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
        |  (CAST(sum(j.cents) AS BIGINT) * 100) // count(*) AS mean_x100,
        |  (CAST(sum(least(greatest(j.cents, l.lo_cents), l.hi_cents)) AS BIGINT) * 100)
        |    // count(*) AS wmean_x100
        |FROM j JOIN lims l USING (c_mktsegment)
        |GROUP BY j.c_mktsegment, l.lo_cents, l.hi_cents
        |ORDER BY j.c_mktsegment""".stripMargin,

    // percentile_disc semantics pinned as explicit integer rank math:
    // the discrete p-percentile is the value at sorted rank ceil(p*n)
    // = (n*k + 99) // 100 for p = k/100 — engine-independent, no float
    "q_percentile_disc" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, cents,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM c)
        |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(CASE WHEN rk = (n * 25 + 99) // 100 THEN cents END) AS BIGINT) AS p25_cents,
        |  CAST(max(CASE WHEN rk = (n * 50 + 99) // 100 THEN cents END) AS BIGINT) AS p50_cents,
        |  CAST(max(CASE WHEN rk = (n * 75 + 99) // 100 THEN cents END) AS BIGINT) AS p75_cents
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_outlier_iqr" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, cents,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM c),
        |q AS (
        |  SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
        |    CAST(max(CASE WHEN rk = (n * 25 + 99) // 100 THEN cents END) AS BIGINT) AS q1_cents,
        |    CAST(max(CASE WHEN rk = (n * 75 + 99) // 100 THEN cents END) AS BIGINT) AS q3_cents
        |  FROM r GROUP BY o_orderpriority)
        |SELECT c.o_orderpriority, q.n, q.q1_cents, q.q3_cents,
        |  q.q3_cents - q.q1_cents AS iqr_cents,
        |  CAST(sum(CASE WHEN 2 * c.cents < 2 * q.q1_cents - 3 * (q.q3_cents - q.q1_cents)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN 2 * c.cents > 2 * q.q3_cents + 3 * (q.q3_cents - q.q1_cents)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST((sum(CASE WHEN 2 * c.cents < 2 * q.q1_cents - 3 * (q.q3_cents - q.q1_cents)
        |       THEN 1 ELSE 0 END)
        |   + sum(CASE WHEN 2 * c.cents > 2 * q.q3_cents + 3 * (q.q3_cents - q.q1_cents)
        |       THEN 1 ELSE 0 END)) * 10000 // max(q.n) AS BIGINT) AS outlier_rate_x1e4
        |FROM c JOIN q USING (o_orderpriority)
        |GROUP BY c.o_orderpriority, q.n, q.q1_cents, q.q3_cents
        |ORDER BY c.o_orderpriority""".stripMargin,

    "q_harmonic_mean" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST((sum(cents) * 100) // count(*) AS BIGINT) AS am_cents_x100,
        |  CAST(CAST(count(*) AS HUGEINT) * 1000000000000 * 100
        |    // sum(1000000000000 // cents) AS BIGINT) AS hm_cents_x100
        |FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_entropy" ->
      """WITH cls AS (
        |  SELECT c.c_mktsegment, o.o_orderpriority, CAST(count(*) AS BIGINT) AS c
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT c_mktsegment, o_orderpriority, c,
        |    CAST(sum(c) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
        |  FROM cls)
        |SELECT c_mktsegment, CAST(max(n) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  (max(c) * 10000) // max(n) AS modal_share_x1e4,
        |  CAST(sum(c * (length(bin(n // c)) - 1)) * 100 // max(n) AS BIGINT)
        |    AS entropy_bits_x100
        |FROM g GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_moving_minmax" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, rev_cents,
        |  CAST(min(rev_cents) OVER w AS BIGINT) AS min7_cents,
        |  CAST(max(rev_cents) OVER w AS BIGINT) AS max7_cents,
        |  CAST(max(rev_cents) OVER w - min(rev_cents) OVER w AS BIGINT) AS range7_cents,
        |  CAST(CASE WHEN rev_cents = max(rev_cents) OVER w THEN 1 ELSE 0 END AS INT) AS at_high,
        |  CAST(CASE WHEN rev_cents = min(rev_cents) OVER w THEN 1 ELSE 0 END AS INT) AS at_low
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,

    "q_interp_linear" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT event_type, unnest(range(lo, hi + 1)) AS day FROM (
        |    SELECT event_type, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1)),
        |grid AS (
        |  SELECT cal.event_type, cal.day, d.rev_cents
        |  FROM cal LEFT JOIN daily d ON d.event_type = cal.event_type AND d.day = cal.day),
        |anch AS (
        |  SELECT event_type, day, rev_cents,
        |    last_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wb AS pd,
        |    last_value(rev_cents IGNORE NULLS) OVER wb AS pv,
        |    first_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wf AS nd,
        |    first_value(rev_cents IGNORE NULLS) OVER wf AS nv
        |  FROM grid
        |  WINDOW wb AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, day,
        |  CAST(CASE
        |    WHEN rev_cents IS NOT NULL THEN rev_cents
        |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |      pv + CASE WHEN nv < pv THEN -(abs(nv - pv) * (day - pd) // (nd - pd))
        |                ELSE abs(nv - pv) * (day - pd) // (nd - pd) END
        |    WHEN pv IS NOT NULL THEN pv
        |    ELSE nv END AS BIGINT) AS rev_filled_cents,
        |  CASE WHEN rev_cents IS NOT NULL THEN 'actual'
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
        |       WHEN pv IS NOT NULL THEN 'locf'
        |       ELSE 'bocf' END AS fill_src
        |FROM anch ORDER BY event_type, day""".stripMargin,

    "q_cumulative_uniques" ->
      """WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
        |fd AS (SELECT user_id, min(day) AS first_day FROM ev GROUP BY 1),
        |nu AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
        |       FROM fd GROUP BY 1),
        |da AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |       FROM ev GROUP BY 1),
        |j AS (SELECT coalesce(da.day, nu.day) AS day,
        |        coalesce(nu.new_users, 0) AS new_users,
        |        coalesce(da.dau, 0) AS dau
        |      FROM da FULL OUTER JOIN nu ON nu.day = da.day)
        |SELECT day, new_users, dau,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM j ORDER BY day""".stripMargin,

    "q_order_gap_stats" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |      AS od
        |  FROM orders),
        |g AS (
        |  SELECT o_custkey,
        |    od - lag(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey) AS gap
        |  FROM o)
        |SELECT CAST(length(bin(gap)) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(min(gap) AS BIGINT) AS min_gap_days,
        |  CAST(max(gap) AS BIGINT) AS max_gap_days,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        |FROM g WHERE gap IS NOT NULL AND gap > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_new_vs_returning" ->
      """WITH o AS (
        |  SELECT o_custkey, substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS month
        |  FROM orders),
        |fm AS (SELECT o_custkey, min(month) AS fm FROM o GROUP BY 1)
        |SELECT o.month, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN o.month = fm.fm THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN o.month <> fm.fm THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_returning,
        |  CAST(count(DISTINCT CASE WHEN o.month = fm.fm THEN o.o_custkey END) AS BIGINT)
        |    AS n_new_customers,
        |  CAST(sum(CASE WHEN o.month = fm.fm THEN 1 ELSE 0 END) * 10000
        |    // count(*) AS BIGINT) AS new_share_x1e4
        |FROM o JOIN fm USING (o_custkey)
        |GROUP BY o.month ORDER BY o.month""".stripMargin,

    "q_prop_ztest" ->
      """WITH s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN event_type = 'click' AND value >= 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS x1,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN event_type = 'view' AND value >= 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS x2
        |  FROM events WHERE event_type IN ('click', 'view'))
        |SELECT n1, x1, n2, x2,
        |  CAST(CAST(x1 * n2 - x2 * n1 AS HUGEINT) * (x1 * n2 - x2 * n1)
        |    * (n1 + n2) * 1000000
        |    // (CAST(n1 AS HUGEINT) * n2 * (x1 + x2) * (n1 + n2 - x1 - x2))
        |    AS BIGINT) AS z2_x1e6,
        |  (x1 * 10000) // n1 AS rate1_x1e4,
        |  (x2 * 10000) // n2 AS rate2_x1e4,
        |  CAST(CASE WHEN CAST(CAST(x1 * n2 - x2 * n1 AS HUGEINT) * (x1 * n2 - x2 * n1)
        |    * (n1 + n2) * 1000000
        |    // (CAST(n1 AS HUGEINT) * n2 * (x1 + x2) * (n1 + n2 - x1 - x2)) AS BIGINT)
        |    > 3841459 THEN 1 ELSE 0 END AS INT) AS significant_95
        |FROM s""".stripMargin,

    "q_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |bp AS (SELECT l_returnflag, price_cents, CAST(sum(w) AS BIGINT) AS pw
        |       FROM li GROUP BY l_returnflag, price_cents),
        |tot AS (SELECT l_returnflag, CAST(sum(w) AS BIGINT) AS total_weight
        |        FROM li GROUP BY l_returnflag),
        |cum AS (SELECT l_returnflag, price_cents,
        |          CAST(sum(pw) OVER (PARTITION BY l_returnflag ORDER BY price_cents
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
        |        FROM bp)
        |SELECT c.l_returnflag, t.total_weight,
        |  CAST(min(c.price_cents) AS BIGINT) AS wmedian_cents
        |FROM cum c JOIN tot t ON t.l_returnflag = c.l_returnflag
        |WHERE c.cw * 2 >= t.total_weight
        |GROUP BY c.l_returnflag, t.total_weight
        |ORDER BY c.l_returnflag""".stripMargin,

    "q_hhi" ->
      """WITH rev AS (
        |  SELECT CAST(s.s_nationkey AS BIGINT) AS nationkey, s.s_suppkey,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY nationkey, s.s_suppkey),
        |tot AS (SELECT nationkey, CAST(sum(rev) AS BIGINT) AS trev,
        |          CAST(count(*) AS BIGINT) AS n_supp
        |        FROM rev GROUP BY nationkey),
        |bp AS (SELECT r.nationkey, t.n_supp,
        |         CAST((CAST(r.rev AS HUGEINT) * 10000) // t.trev AS BIGINT) AS bp
        |       FROM rev r JOIN tot t ON t.nationkey = r.nationkey)
        |SELECT nationkey, n_supp, CAST(sum(bp * bp) AS BIGINT) AS hhi_x1e8
        |FROM bp GROUP BY nationkey, n_supp ORDER BY nationkey""".stripMargin,

    "q_unpivot" ->
      """SELECT l_returnflag, k, v FROM (
        |  SELECT l_returnflag,
        |    CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
        |    CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt
        |  FROM lineitem GROUP BY 1)
        |UNPIVOT (v FOR k IN (f_cnt, o_cnt))
        |ORDER BY l_returnflag, k""".stripMargin,

    "q_weighted_sample" ->
      """SELECT p_brand, p_partkey, wt, cum FROM (
        |  SELECT p_brand, p_partkey, CAST(p_size AS BIGINT) AS wt,
        |    CAST(sum(p_size) OVER (PARTITION BY p_brand ORDER BY p_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM part)
        |WHERE cum // 97 > (cum - wt) // 97
        |ORDER BY p_partkey""".stripMargin,

    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, o_day, n_last30, spend_last30 FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS o_day,
        |    CAST(count(*) OVER w AS BIGINT) AS n_last30,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_last30
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
        |               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |) ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderstatus, pct, cents_q FROM (
        |  SELECT o_orderstatus, CAST(25 AS BIGINT) AS pct,
        |    quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.25) AS cents_q
        |  FROM orders GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT o_orderstatus, CAST(50 AS BIGINT),
        |    quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.5)
        |  FROM orders GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT o_orderstatus, CAST(75 AS BIGINT),
        |    quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.75)
        |  FROM orders GROUP BY o_orderstatus
        |) ORDER BY o_orderstatus, pct""".stripMargin,
  )
}
