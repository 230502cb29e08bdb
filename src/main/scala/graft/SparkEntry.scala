package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Medallion, Pipeline, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY §2 inventory) to DataFrame builders;
  * `oracleSql` holds the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01. Column names AND value-determinism rules are documented
  * in [[graft.queries.Relational]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueBySegment(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_filter_sort_limit" -> (Relational.filterSortLimit _),
    "q03_join_revenue_by_segment" -> (Relational.revenueBySegment _),
    "q04_left_join_customer_orders" -> (Relational.customerOrderSummary _),
    "q05_exists_open_orders" -> (Relational.customersWithOpenOrders _),
    "q06_not_exists_no_orders" -> (Relational.customersWithoutOrders _),
    "q07_having_supplier_volume" -> (Relational.supplierVolumeHaving _),
    "q08_distinct_projection" -> (Relational.distinctSegmentsByNation _),
    "q09_union_all" -> (Relational.unionOrderFlags _),
    "q10_quality_checks" -> (Relational.qualityReport _),
    "q11_pivot" -> (Relational.pivotPriorityByStatus _),
    "q12_running_totals" -> (Relational.runningCustomerSpend _),
    "q13_lag_lead" -> (Relational.monthlyRevenueLagLead _),
    "q14_time_series_gaps" -> (Relational.orderDateGaps _),
    "q15_cohort_retention" -> (Relational.cohortRetention _),
    "q16_top_k" -> (Relational.topCustomers _),
    "q17_dedup_latest" -> (Relational.latestOrderPerCustomer _),
    "q18_scalar_functions" -> (Relational.scalarSurface _),
    "q19_date_rollup" -> (Relational.dateRollup _),
    "q20_percentiles" -> (Relational.quantityPercentiles _),
    "q21_merge_classify" -> (Relational.mergeClassification _),
    "q22_incremental_load" -> (Relational.incrementalOrders _),
    "q23_upsert" -> (Relational.upsertCustomers _),
    "q24_soft_delete" -> (Relational.softDeleteNegativeBalances _),
    "q25_share_of_total" -> (Relational.segmentRevenueShare _),
    "q26_row_hash" -> (Relational.rowHashNation _),
    "q27_graph_traversal" -> (Pipeline.graphReachability _),
    "q28_event_windowed_agg" -> (Pipeline.eventHourlyRollup _),
    "q29_event_sessionization" -> (Pipeline.eventSessions _),
    "q30_dedup_exact" -> (Pipeline.dedupExact _),
    "q31_token_stats" -> (Pipeline.tokenStats _),
    "q32_text_quality" -> (Pipeline.textQuality _),
    "q33_lang_id" -> (Pipeline.langIdConfusion _),
    "q34_dedup_minhash_lsh" -> (Pipeline.dedupMinhash _),
    "q35_dedup_simhash" -> (Pipeline.dedupSimhash _),
    "q36_ngram_jaccard" -> (Pipeline.ngramJaccardPairs _),
    "q38_embedding_neardup" -> (Pipeline.embeddingNearDupExact _),
    "q39_knn_ivf" -> (Pipeline.knnIvfSeeded _),
    "q37_fingerprint" -> (Pipeline.fingerprints _),
    "q40_knn_brute_force" -> (Pipeline.knnBruteForce _),
    "q41_knn_lsh" -> (Pipeline.knnLsh _),
    "q42_vector_stats" -> (Pipeline.vectorStats _),
    "q43_json_extract" -> (Pipeline.jsonExtract _),
    "q44_pagination" -> (Pipeline.paginatedCustomers _),
    "q45_soft_delete_convention" -> (Pipeline.activeCustomersBySegment _),
    "q46_merge_delete" -> (Relational.mergeWithDelete _),
    "q47_upsert_guard" -> (Relational.upsertWithGuard _),
    "q48_conflict_skip" -> (Relational.conflictSkipNewCustomers _),
    "q49_batch_update" -> (Relational.batchUpdateBalances _),
    "q50_multimodal_features" -> (Pipeline.multimodalFeatures _),
    "q51_constraint_violations" -> (Relational.constraintViolations _),
    "q52_dup_clusters" -> (Pipeline.dupClusters _),
    "q53_dedup_corpus" -> (Pipeline.dedupCorpusBySource _),
    "q54_contamination" -> (Pipeline.contaminationCheck _),
    "q55_repetition_quality" -> (Pipeline.repetitionQuality _),
    "q56_stratified_sample" -> (Pipeline.stratifiedSampleBySource _),
    "q57_sequence_packing" -> (Pipeline.sequencePacking _),
    "q58_doc_frequency" -> (Pipeline.docFrequencyTop _),
    "q59_pii_redaction" -> (Pipeline.piiRedaction _),
    "q60_token_df_score" -> (Pipeline.tokenDfScore _),
    "q61_frame_sample" -> (Pipeline.frameSampleMetadata _),
    "q62_asof_join" -> (Pipeline.purchaseAsofClick _),
    "q63_range_join" -> (Pipeline.eventValueBands _),
    "q64_incremental_dedup" -> (Pipeline.incrementalDedup _),
    "q65_curation_pipeline" -> (Pipeline.curationPipeline _),
    "q66_curation_funnel" -> (Pipeline.curationFunnel _),
    "q67_embedding_neardup_lsh" -> (Pipeline.embeddingNearDupLsh _),
    "q68_semantic_dedup" -> (Pipeline.semanticDedup _),
    "q69_vector_quantization" -> (Pipeline.vectorQuantization _),
    "q70_incremental_embedding_dedup" -> (Pipeline.incrementalEmbeddingDedup _),
    "q71_corpus_mixture" -> (Pipeline.corpusMixture _),
    "q72_corpus_diff" -> (Pipeline.corpusDiff _),
    "q73_top_ngrams" -> (Pipeline.topNgrams _),
    "q74_chunk_dedup" -> (Pipeline.chunkDedup _),
    "q75_keyword_extract" -> (Pipeline.keywords _),
    "q76_silver_sales" -> (Medallion.silverSales _),
    "q77_gold_customer_analytics" -> (Medallion.goldCustomerAnalytics _),
    "q78_silver_products" -> (Medallion.silverProducts _),
    "q79_silver_erp_customers" -> (Medallion.silverErpCustomers _),
    "q80_knn_join" -> (Pipeline.knnJoinAll _),
    "q81_target_affinity" -> (Pipeline.targetAffinityScores _),
    "q82_corpus_report" -> (Pipeline.corpusHealthReport _),
    "q83_cluster_sample" -> (Pipeline.clusterBalancedSample _),
    "q84_winnowing_neardup" -> (Pipeline.winnowingNearDup _),
    "q85_ngram_novelty" -> (Pipeline.ngramNoveltyScores _),
    "q86_token_budget_sample" -> (Pipeline.tokenBudgetBySource _),
    "q87_length_percentiles" -> (Pipeline.lengthProfileBySource _),
    "q88_embedding_contamination" -> (Pipeline.embeddingContaminationReport _),
    "q89_temperature_mixture" -> (Pipeline.temperatureMixtureSample _),
    "q90_cross_source_dup" -> (Pipeline.crossSourceDupMatrix _),
    "q91_incremental_winnowing" -> (Pipeline.incrementalWinnowingDedup _),
    "q92_cluster_diversity" -> (Pipeline.clusterDiversityReport _),
    "q93_truncation_impact" -> (Pipeline.truncationImpactReport _),
    "q94_knn_ivf_trained" -> (Pipeline.knnIvfTrained _),
    "q95_incremental_simhash" -> (Pipeline.incrementalSimhashDedup _),
    "q96_dedup_savings" -> (Pipeline.dedupSavingsReport _),
    "q97_streaming_admission" -> (Pipeline.streamingNearDupAdmission _),
    "q98_streaming_token_budget" -> (Pipeline.streamingTokenBudgetAdmission _),
    "q99_boilerplate_removal" -> (Pipeline.boilerplateRemoval _),
    "q100_incremental_clusters" -> (Pipeline.incrementalClusters _),
    "q101_bloom_incremental_dedup" -> (Pipeline.bloomIncrementalDedup _),
    "q102_knn_pq" -> (Pipeline.knnPq _),
    "q103_event_funnel" -> (Pipeline.eventFunnel _),
    "q104_context_windows" -> (Pipeline.contextWindows _),
    "q105_leakage_proof_split" -> (Pipeline.leakageProofSplit _),
    "q106_frequent_grams" -> (Pipeline.frequentGrams _),
    "q107_salted_join" -> (Relational.saltedSupplierRevenue _),
    "q108_key_skew_profile" -> (Relational.orderKeySkew _),
    "q109_streaming_frequent_grams" -> (Pipeline.streamingFrequentGrams _),
    "q110_soft_dedup_weights" -> (Pipeline.softDedup _),
    "q111_epoch_schedule" -> (Pipeline.epochSchedule _),
    "q112_decontaminate" -> (Pipeline.decontaminatedCorpus _),
    "q113_neardup_decontaminate" -> (Pipeline.nearDupDecontaminated _),
    "q114_streaming_curation_funnel" -> (Pipeline.streamingCurationFunnel _),
    "q115_streaming_corpus_report" -> (Pipeline.streamingCorpusReport _),
    "q116_streaming_curate" -> (Pipeline.streamingCurate _),
    "q117_streaming_exact_dedup" -> (Pipeline.streamingExactDedup _),
    "q118_canonical_selection" -> (Pipeline.canonicalSelection _),
    "q119_streaming_embedding_dedup" -> (Pipeline.streamingEmbeddingDedup _),
    "q120_span_decontaminate" -> (Pipeline.spanDecontaminated _),
    "q121_index_refresh_loop" -> (Pipeline.indexRefreshLoop _),
    "q122_streaming_event_dedup" -> (Pipeline.streamingEventDedup _),
    "q123_streaming_bronze_ingest" -> (Pipeline.streamingBronzeIngest _),
    "q124_curriculum_order" -> (Pipeline.curriculumSchedule _),
    "q125_embedding_index_refresh" -> (Pipeline.embeddingIndexRefreshLoop _),
    "q126_corpus_manifest" -> (Pipeline.corpusManifestReport _),
    "q127_checkpointed_refresh" -> (Pipeline.checkpointedRefreshLoop _),
    "q128_stream_restart_recovery" -> (Pipeline.streamingEventDedupRestart _),
    "q129_compacted_refresh" -> (Pipeline.compactedRefreshLoop _),
    "q130_embedding_checkpointed_refresh" -> (Pipeline.checkpointedEmbeddingRefresh _),
    "q131_training_shards" -> (Pipeline.trainingShardManifest _),
    "q132_distribution_drift" -> (Pipeline.corpusDriftReport _),
    "q133_corpus_similarity" -> (Pipeline.corpusSimilarityMatrix _),
    "q134_daily_production_run" -> (Pipeline.dailyProductionRun _),
    "q135_mmr_rerank" -> (Pipeline.mmrDiverseNeighbors _),
    "q136_hard_negatives" -> (Pipeline.hardNegativePairs _),
    "q137_bpe_merges" -> (Pipeline.bpeMergeTable _),
    "q138_cms_frequency" -> (Pipeline.cmsTokenFrequencyReport _),
    "q139_matryoshka_rerank" -> (Pipeline.matryoshkaNeighbors _),
    "q140_bpe_compression" -> (Pipeline.bpeCompressionBySource _),
    "q141_bm25_retrieval" -> (Pipeline.bm25Retrieval _),
    "q142_bm25_refreshed_probe" -> (Pipeline.bm25RefreshedProbe _),
    "q143_semdedup_clusters" -> (Pipeline.semDedupClustered _),
    "q144_quantized_retrieval" -> (Pipeline.quantizedRetrieval _),
    "q145_hybrid_retrieval" -> (Pipeline.hybridRetrieval _),
    "q146_calibration_drift" -> (Pipeline.calibrationDriftReport _),
    "q147_streaming_quantized_dedup" -> (Pipeline.streamingQuantizedDedup _),
    "q148_ivf_sq8_retrieval" -> (Pipeline.ivfSq8Retrieval _),
    "q149_pooled_chunk_embeddings" -> (Pipeline.pooledChunkEmbeddings _),
    "q150_pooled_retrieval" -> (Pipeline.pooledRetrieval _),
    "q151_binary_retrieval" -> (Pipeline.binaryRetrieval _),
    "q152_bm25_after_deletes" -> (Pipeline.bm25AfterDeletes _),
    "q153_phrase_search" -> (Pipeline.phraseMatches _),
    "q154_pagerank_centrality" -> (Pipeline.pagerankCentrality _),
    "q155_orc_interchange" -> (Pipeline.orcInterchange _),
    "q156_streaming_attribution" -> (Pipeline.streamingAttribution _),
    "q157_streaming_session_windows" -> (Pipeline.streamingSessionWindows _),
    "q158_hll_cardinality" -> (Pipeline.hllCardinalityReport _),
    "q159_fuzzy_dup_pairs" -> (Pipeline.fuzzyDupPairs _),
    "q160_bucketed_join" -> (Pipeline.bucketedColocatedJoin _),
    "q161_revenue_rollup" -> (Pipeline.revenueRollup _),
    "q162_trailing_window" -> (Pipeline.trailingWindowActivity _),
    "q163_balance_ranks" -> (Pipeline.segmentBalanceRanks _),
    "q164_streaming_sliding_windows" -> (Pipeline.streamingSlidingCounts _),
    "q165_gap_fill_forward" -> (Pipeline.gapFillForward _),
    "q166_shipping_cube" -> (Pipeline.shippingCube _),
    "q167_cohort_set_ops" -> (Pipeline.customerYearSetOps _),
    "q168_triangle_clustering" -> (Pipeline.triangleCentrality _),
    "q169_running_distinct" -> (Pipeline.runningDistinctTypes _),
    "q170_bag_set_ops" -> (Pipeline.orderMultiplicitySetOps _),
    "q171_lsh_triangles" -> (Pipeline.lshTriangleCommunities _),
    "q172_embedding_components" -> (Pipeline.embeddingComponents _),
    "q173_scd2_dimension" -> (Pipeline.scdDimensionBuild _),
    "q174_point_in_time_join" -> (Pipeline.purchaseStateAttribution _),
    "q175_incremental_gold_refresh" -> (Pipeline.incrementalGoldRefresh _),
    "q176_exact_outliers" -> (Pipeline.valueOutliers _),
    "q177_markov_transitions" -> (Pipeline.eventTransitionMatrix _),
    "q178_topn_other_rollup" -> (Pipeline.topNationsOtherRollup _),
    "q179_grouping_sets" -> (Pipeline.shippingGroupingSets _),
    "q180_rfm_segments" -> (Pipeline.rfmSegments _),
    "q181_market_basket" -> (Pipeline.marketBasketLift _),
    "q182_order_histogram" -> (Pipeline.orderTotalHistogram _),
    "q183_mad_outliers" -> ((s, d) => Pipeline.madOutliers(s, d)),
    "q184_abc_classification" -> (Pipeline.abcClassification _),
    "q185_json_props_rollup" -> (Pipeline.propsJsonRollup _),
    "q186_activity_streaks" -> (Pipeline.activityStreaks _),
    "q187_exact_correlation" -> (Pipeline.exactCorrelation _),
    "q188_chi_square_cells" -> (Pipeline.eventDowContingency _),
    "q189_approx_percentile_cert" -> (Pipeline.approxPercentileCertification _),
    "q190_streaming_pit_enrichment" -> (Pipeline.streamingPitEnrichment _),
    "q191_state_dwell" -> (Pipeline.stateDwellReport _),
    "q192_pivot_roundtrip" -> (Pipeline.pivotRoundtrip _),
    "q193_ordered_string_agg" -> (Pipeline.regionNationList _),
    "q194_discrete_quantiles" -> (Pipeline.discreteQuantiles _),
    "q195_value_mode" -> (Pipeline.valueMode _),
    "q196_yoy_growth" -> (Pipeline.yearOverYearGrowth _),
    "q197_mad_outliers_approx" -> (Pipeline.madOutliersApproxCert _),
    "q198_scd2_incremental_apply" -> (Pipeline.scdIncrementalApply _),
    "q199_image_decode" -> (Pipeline.imageDecodeStats _),
    "q200_lsh_kcore" -> (Pipeline.lshKCore _),
    "q201_funnel" -> (Pipeline.funnelSteps _),
    "q202_approx_distinct" -> (Pipeline.approxDistinctCert _),
    "q203_retention_matrix" -> (Pipeline.retentionTriangle _),
    "q204_forward_asof" -> (Pipeline.nextPurchaseAttribution _),
    "q205_session_windows" -> (Pipeline.batchSessionWindows _),
    "q206_trimmed_mean" -> (Pipeline.trimmedMean _),
    "q207_rolling_active_users" -> (Pipeline.rollingActiveUsers _),
    "q208_rank_sum_test" -> (Pipeline.rankSumTest _),
    "q209_equidepth_histogram" -> (Pipeline.equiDepthHistogram _),
    "q210_streaming_scd2_maintenance" -> (Pipeline.streamingScdMaintenance _),
    "q211_interval_overlap_join" -> (Pipeline.stateSessionOverlap _),
    "q212_feature_scaling" -> (Pipeline.featureScaling _),
    "q213_snapshot_diff" -> (Pipeline.dimensionSnapshotDiff _),
    "q214_image_resize" -> (Pipeline.imageResizeStats _),
    "q215_funnel_latency" -> (Pipeline.funnelLatency _),
    "q216_skyline" -> (Pipeline.priceQuantitySkyline _),
    "q217_penny_proration" -> (Pipeline.pennyProration _),
    "q218_weighted_median" -> (Pipeline.weightedMedianPrice _),
    "q219_revenue_gini" -> (Pipeline.revenueGini _),
    "q220_rank_shift" -> (Pipeline.rankShiftReport _),
    "q221_cluster_labels" -> (Pipeline.clusterLabels _),
    "q222_activity_spikes" -> (Pipeline.activitySpikes _),
    "q223_jpeg_decode" -> (Pipeline.jpegDecodeCert _),
    "q224_price_octiles" -> (Pipeline.priceOctiles _),
    "q225_ewma_revenue" -> (Pipeline.ewmaDailyRevenue _),
    "q226_editdist_dedup" -> (Pipeline.editDistanceNameDedup _),
    "q227_winsorized_revenue" -> (Pipeline.winsorizedRevenue _),
    "q228_column_drift" -> (Pipeline.columnDrift _),
    "q229_nearest_asof" -> (Pipeline.nearestErrorContext _),
    "q230_orphan_audit" -> (Pipeline.orphanAudit _),
    "q231_fiscal_rollup" -> (Pipeline.fiscalQuarterRollup _),
    "q232_order_reconciliation" -> (Pipeline.orderReconciliation _),
    "q233_quantile_normalize" -> (Pipeline.quantileNormalizedRevenue _),
    "q234_new_vs_returning" -> (Pipeline.newVsReturningPurchasers _),
    "q235_event_debounce" -> (Pipeline.debouncedEvents _),
    "q236_observed_metrics" -> (Pipeline.observedMetricsReport _),
    "q237_correlated_subquery" -> (Pipeline.correlatedSubqueryScreen _),
    "q238_shared_spans" -> (Pipeline.sharedSpanReport _),
    "q239_subquery_rewrites" -> (Pipeline.subqueryRewriteScreen _),
    "q240_bigram_surprisal" -> (Pipeline.bigramSurprisalReport _),
    "q241_span_coverage" -> (Pipeline.sharedSpanCoverageReport _),
    "q242_span_removal" -> (Pipeline.spanRemovalRewrite _),
    "q243_incremental_spans" -> (Pipeline.incrementalSharedSpans _),
    "q244_audio_decode" -> (Pipeline.audioDecodeStats _),
    "q245_existence_flags" -> (Pipeline.existenceFlagScreen _),
    "q246_sql_pivot" -> (Pipeline.sqlTextPivot _),
    "q247_sql_unpivot" -> (Pipeline.sqlTextUnpivot _),
    "q248_join_hints" -> (Pipeline.joinHintScreen _),
    "q249_streaming_spans" -> (Pipeline.streamingSharedSpans _),
    "q250_sql_recursive" -> (Pipeline.sqlTextRecursiveTraversal _),
    "q251_span_cap_report" -> (Pipeline.spanCapReport _),
    "q252_video_decode" -> (Pipeline.videoDecodeStats _),
    "q253_span_admission" -> (Pipeline.streamingSpanAdmission _),
    "q254_span_index_fold" -> (Pipeline.spanIndexFold _),
    "q255_frame_samples" -> (Pipeline.aviFrameSampleReport _),
    "q256_self_repetition" -> (Pipeline.selfRepetitionScreen _),
    "q257_span_lifecycle" -> (Pipeline.streamingSpanLifecycle _),
    "q258_sql_recursive_fixpoint" -> (Pipeline.sqlTextRecursiveFixpoint _),
    "q259_image_phash_dedup" -> (Pipeline.imagePerceptualDedup _),
    "q260_mjpeg_video" -> (Pipeline.mjpegVideoScreen _),
    "q261_image_incremental_dedup" -> (Pipeline.imageIncrementalDedup _),
    "q262_streaming_image_admission" -> (Pipeline.streamingImageAdmission _),
    "q263_image_fp_cap_report" -> (Pipeline.imageFingerprintCapScreen _),
    "q264_audio_fp_dedup" -> (Pipeline.audioPerceptualDedup _),
    "q265_fp_band_saturation" -> (Pipeline.fingerprintBandSaturationScreen _),
    "q266_video_clip_dedup" -> (Pipeline.videoClipDedup _),
    "q267_streaming_audio_admission" -> (Pipeline.streamingAudioAdmission _),
    "q268_image_dhash128_dedup" -> (Pipeline.imagePerceptualDedup128 _),
  )

  /** The decodable-video CTE shared by the q252/q255 oracles: geometry
    * and frame count of every fixture AVI, straight from the closed-form
    * pattern (factored once so the two oracles cannot drift from the
    * encoder's formulas).
    */
  private val aviVideoCte: String =
    raw"""v AS (
      |  SELECT doc_id AS media_id,
      |    CAST(3 + doc_id % 5 AS INTEGER) AS n,
      |    CAST(8 + ((doc_id % 9) // 3) * 4 AS INTEGER) AS w,
      |    CAST(6 + (doc_id % 2) * 2 AS INTEGER) AS h
      |  FROM documents WHERE doc_id % 3 = 2 AND doc_id % 17 <> 0)""".stripMargin

  /** The supplier→nation→region WITH RECURSIVE traversal oracle — shared
    * VERBATIM by q27 (the iterative driver-loop traversal) and q250 (the
    * same walk as literal Spark recursive-CTE SQL text), so all three
    * recursion engines are pinned to one answer.
    */
  private val q27TraversalOracle: String =
    """WITH RECURSIVE edges AS (
      |  SELECT 'supplier/' || CAST(s_suppkey AS VARCHAR) AS src, 'nation/' || CAST(s_nationkey AS VARCHAR) AS dst FROM supplier
      |  UNION ALL
      |  SELECT 'nation/' || CAST(n_nationkey AS VARCHAR), 'region/' || CAST(n_regionkey AS VARCHAR) FROM nation),
      |walk AS (
      |  SELECT 'supplier/' || CAST(s_suppkey AS VARCHAR) AS seed, 'supplier/' || CAST(s_suppkey AS VARCHAR) AS node, 0 AS depth FROM supplier
      |  UNION ALL
      |  SELECT w.seed, e.dst, w.depth + 1 FROM walk w JOIN edges e ON w.node = e.src WHERE w.depth < 5)
      |SELECT seed, node, MIN(depth) AS depth FROM walk WHERE depth > 0
      |GROUP BY seed, node ORDER BY seed, node""".stripMargin

  /** Shared gram prefix for EVERY span-family oracle (q238/q241/q243/
    * q249/q251/q253/q254): normalized tokens → positioned 8-gram Sha60
    * hashes. Ends with CTE `grams(doc_id, pos, h)` and keeps
    * `toksrc(doc_id, toks)` visible — factored once so the family's
    * tokenization cannot drift between oracles.
    */
  /** Shared q259/q261/q262 oracle prefix: the dHash fixture's id
    * arithmetic replayed in SQL — media variants (original + planted
    * copies; garbage rows excluded, they hash to null Spark-side),
    * closed-form 8-level cells (DuckDB xor() mirrors the Scala Long
    * xor-multiply mix), difference bits, and the per-band 16-bit values.
    * Ends with CTEs `bits(media_id, m, b)` and
    * `bandvals(media_id, band, bv)`; keeps `imgs(d)` visible.
    */
  private val dhashBitsCtes: String =
    raw"""imgs AS (SELECT doc_id AS d FROM documents WHERE doc_id % 101 = 0 AND doc_id > 0),
         |media AS (
         |  SELECT d, d AS media_id, 0 AS variant FROM imgs
         |  UNION ALL SELECT d, -(4*d+1), 0 FROM imgs
         |  UNION ALL SELECT d, -(4*d+2), 0 FROM imgs
         |  UNION ALL SELECT d, -(4*d+3), 1 FROM imgs
         |  UNION ALL SELECT d, -(4*d), 2 FROM imgs WHERE d % 2 = 0),
         |ck AS (SELECT k FROM generate_series(0, 71) g(k)),
         |lev_a AS (
         |  SELECT m.media_id, m.variant, ck.k,
         |    (m.d * 2654435761 + ck.k * 40503) % 2147483647 AS x1
         |  FROM media m, ck),
         |lev_b AS (SELECT media_id, variant, k, xor(x1, x1 // 65536) AS x2 FROM lev_a),
         |lev_c AS (SELECT media_id, variant, k, (x2 * 2246822519) % 2147483629 AS x3 FROM lev_b),
         |lev0 AS (SELECT media_id, variant, k, xor(x3, x3 // 8192) % 8 AS lv FROM lev_c),
         |levels AS (
         |  SELECT media_id, k,
         |    CASE WHEN variant = 1 AND k IN (29, 59) THEN xor(lv, 1)
         |         WHEN variant = 2 AND (k // 9) IN (2, 3, 6, 7) AND (k % 9) % 2 = 1 THEN (lv + 4) % 8
         |         ELSE lv END AS lv
         |  FROM lev0),
         |bits AS (
         |  SELECT a.media_id, (a.k // 9) * 8 + (a.k % 9) AS m,
         |    CASE WHEN b.lv > a.lv THEN 1 ELSE 0 END AS b
         |  FROM levels a JOIN levels b
         |    ON a.media_id = b.media_id AND b.k = a.k + 1
         |  WHERE a.k % 9 < 8),
         |bandvals AS (
         |  SELECT media_id, m // 16 AS band,
         |    STRING_AGG(CAST(b AS VARCHAR), '' ORDER BY m) AS bv
         |  FROM bits GROUP BY media_id, m // 16)""".stripMargin

  private val spanGramCtes: String =
    raw"""toksrc AS (
         |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks FROM documents),
         |pg AS (
         |  SELECT doc_id, toks, unnest(generate_series(1, CAST(len(toks) AS INTEGER) - 7)) AS pos
         |  FROM toksrc WHERE len(toks) >= 8),
         |grams AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    CAST(('0x' || substring(sha256(array_to_string(toks[pos:pos+7], ' ')), 1, 15)) AS BIGINT) AS h
         |  FROM pg)""".stripMargin

  /** Shared q238/q241 oracle prefix: normalized tokens → positioned
    * 8-gram Sha60 hashes → capped anchor self-join → diagonal islands.
    * Ends with CTE `spans(id_a, pos_a, id_b, pos_b, span_tokens)` and
    * keeps `toksrc(doc_id, toks)` visible for token counts.
    */
  private val spanCtes: String =
    spanGramCtes + ",\n" +
    raw"""okh AS (SELECT h FROM grams GROUP BY h HAVING count(*) BETWEEN 2 AND 50),
         |anch AS (
         |  SELECT a.doc_id AS id_a, a.pos AS pos_a, b.doc_id AS id_b, b.pos AS pos_b
         |  FROM grams a JOIN grams b ON a.h = b.h AND a.doc_id < b.doc_id
         |  JOIN okh ON okh.h = a.h),
         |runs AS (
         |  SELECT id_a, id_b, pos_a, pos_b, pos_a - pos_b AS diag,
         |    pos_a - row_number() OVER (PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS run
         |  FROM anch),
         |spans AS (
         |  SELECT id_a, CAST(MIN(pos_a) AS BIGINT) AS pos_a,
         |    id_b, CAST(MIN(pos_b) AS BIGINT) AS pos_b,
         |    CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
         |  FROM runs GROUP BY id_a, id_b, diag, run)""".stripMargin

  /** The q243 delta→corpus span oracle — shared VERBATIM by q249
    * (through-the-stream twin): span detection distributes over the
    * delta, so the streamed union must equal the batch result exactly.
    */
  private val q243SpanOracle: String =
    "WITH " + spanGramCtes + ",\n" +
    raw"""cg AS (SELECT * FROM grams WHERE doc_id % 10 <> 0),
         |dg AS (SELECT * FROM grams WHERE doc_id % 10 = 0),
         |okh AS (SELECT h FROM cg GROUP BY h HAVING count(*) <= 50),
         |anch AS (
         |  SELECT d.doc_id AS delta_id, d.pos AS dpos, c.doc_id AS corpus_id, c.pos AS cpos
         |  FROM dg d JOIN cg c ON d.h = c.h JOIN okh ON okh.h = d.h),
         |runs AS (
         |  SELECT delta_id, corpus_id, dpos, cpos, dpos - cpos AS diag,
         |    dpos - row_number() OVER (PARTITION BY delta_id, corpus_id, dpos - cpos ORDER BY dpos) AS run
         |  FROM anch)
         |SELECT delta_id, CAST(MIN(dpos) AS BIGINT) AS delta_pos,
         |  corpus_id, CAST(MIN(cpos) AS BIGINT) AS corpus_pos,
         |  CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
         |FROM runs GROUP BY delta_id, corpus_id, diag, run
         |ORDER BY delta_id, corpus_id, delta_pos, corpus_pos""".stripMargin

  /** Frequent-trigram heavy-hitter oracle (exact semantics of the
    * Misra–Gries sketch + recount composition), parameterized by the
    * relative-frequency divisor `k` — shared by q106 (batch) and q109
    * (through-the-stream) so the gram construction cannot drift between
    * the two certifications.
    */
  private def freqGramsOracleSql(k: Int): String =
    raw"""WITH toks AS (
         |  SELECT string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |idx AS (
         |  SELECT t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i FROM toks),
         |grams AS (
         |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram FROM idx),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM grams)
         |SELECT gram, CAST(COUNT(*) AS BIGINT) AS gram_count
         |FROM grams GROUP BY gram
         |HAVING COUNT(*) * $k > (SELECT n FROM tot)
         |ORDER BY gram_count DESC, gram""".stripMargin

  /** The q32 quality-score formula (TextFunctions.qualityScore replicated in
    * DuckDB SQL), shared by every oracle that computes or gates on the
    * score — q32, q82, q111, q114, q115, q116, and the q65/q66 curation
    * chain — so a threshold or stop-word change cannot silently
    * desynchronize one copy from the rest.
    */
  private val qualityScoreSql: String =
    """0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) + 0.4 * (1.0 - CASE WHEN CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) > 0.0 THEN CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|is|are|of|and|or|to|in)\b')) AS DOUBLE) / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) ELSE 0.0 END) + 0.2 * (1.0 - CASE WHEN CAST(length(text) AS DOUBLE) > 0.0 THEN CAST(len(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) ELSE 0.0 END)"""

  def oracleSql: Map[String, String] = Map(
    // Decimal→double finals of scale ≥ 4 go through a VARCHAR hop: DuckDB's
    // direct DECIMAL(38,s)→DOUBLE cast is not correctly rounded once the
    // scaled integer exceeds 2^53 (first bites at sf1: q01 sum_charge's
    // 52,070,921,267.512730 came out ...512726), while both Spark's
    // Decimal.toDouble and DuckDB's VARCHAR→DOUBLE parse round correctly.
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
        |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q03_join_revenue_by_segment" ->
      """SELECT c_mktsegment,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_left_join_customer_orders" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), CAST(0 AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q05_exists_open_orders" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q06_not_exists_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '1998-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q07_having_supplier_volume" ->
      """SELECT * FROM (
        |  SELECT l_suppkey, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_qty, COUNT(*) AS n_items
        |  FROM lineitem GROUP BY l_suppkey)
        |WHERE total_qty > 1000 ORDER BY l_suppkey""".stripMargin,
    "q08_distinct_projection" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q09_union_all" ->
      """SELECT 'high_value' AS flag, o_orderkey FROM orders WHERE o_totalprice > 250000.0
        |UNION ALL
        |SELECT 'urgent' AS flag, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY flag, o_orderkey""".stripMargin,
    "q10_quality_checks" ->
      """WITH agg AS (
        |  SELECT COUNT(*) AS total_rows,
        |    COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS c_null,
        |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS c_dup1,
        |    COUNT(*) - COUNT(DISTINCT (o_custkey, o_orderdate)) AS c_dup2,
        |    COUNT(CASE WHEN o_totalprice < 1000.0 OR o_totalprice > 400000.0 THEN 1 END) AS c_range
        |  FROM orders),
        |checks AS (
        |  SELECT 'null_check_o_totalprice' AS check_name, c_null AS issue_count, total_rows FROM agg
        |  UNION ALL SELECT 'duplicate_check_o_orderkey', c_dup1, total_rows FROM agg
        |  UNION ALL SELECT 'duplicate_check_o_custkey_o_orderdate', c_dup2, total_rows FROM agg
        |  UNION ALL SELECT 'range_check_o_totalprice', c_range, total_rows FROM agg),
        |scored AS (
        |  SELECT check_name, issue_count, total_rows,
        |    ROUND(100.0 * CAST(issue_count AS DOUBLE) / CAST(total_rows AS DOUBLE), 2) AS issue_percentage
        |  FROM checks)
        |SELECT check_name, issue_count, total_rows, issue_percentage,
        |  CASE WHEN issue_count = 0 THEN 'PASS' WHEN issue_percentage <= 5.0 THEN 'WARNING' ELSE 'FAIL' END AS check_status
        |FROM scored ORDER BY issue_percentage DESC, check_name""".stripMargin,
    "q11_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) AS DOUBLE) AS "1-URGENT",
        |  CAST(CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) AS DOUBLE) AS "2-HIGH",
        |  CAST(CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) AS DOUBLE) AS "3-MEDIUM",
        |  CAST(CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) AS DOUBLE) AS "4-NOT SPECIFIED",
        |  CAST(CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) AS DOUBLE) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q12_running_totals" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DECIMAL(38,2)) AS DOUBLE) AS running_total,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE) AS running_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey, EXTRACT(YEAR FROM o_orderdate) ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "q13_lag_lead" ->
      """WITH monthly AS (
        |  SELECT o_orderstatus, date_trunc('month', o_orderdate) AS month,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS revenue
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, month,
        |  CAST(revenue AS DOUBLE) AS revenue,
        |  CAST(LAG(revenue, 1) OVER w AS DOUBLE) AS prev_revenue,
        |  CAST(LEAD(revenue, 1) OVER w AS DOUBLE) AS next_revenue,
        |  CAST(revenue - LAG(revenue, 1) OVER w AS DOUBLE) AS revenue_delta,
        |  ROUND(100.0 * (CAST(revenue AS DOUBLE) - CAST(LAG(revenue, 1) OVER w AS DOUBLE)) / NULLIF(CAST(LAG(revenue, 1) OVER w AS DOUBLE), 0), 2) AS pct_change
        |FROM monthly WINDOW w AS (PARTITION BY o_orderstatus ORDER BY month)
        |ORDER BY o_orderstatus, month""".stripMargin,
    "q14_time_series_gaps" ->
      """WITH activity AS (SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS activity_date FROM orders),
        |gaps AS (
        |  SELECT o_custkey, activity_date AS gap_start,
        |    LEAD(activity_date) OVER (PARTITION BY o_custkey ORDER BY activity_date) AS gap_end
        |  FROM activity)
        |SELECT o_custkey, gap_start, gap_end, date_diff('day', gap_start, gap_end) AS gap_days
        |FROM gaps WHERE date_diff('day', gap_start, gap_end) > 60
        |ORDER BY o_custkey, gap_start""".stripMargin,
    "q15_cohort_retention" ->
      """WITH base AS (
        |  SELECT o_custkey,
        |    date_trunc('month', MIN(o_orderdate) OVER (PARTITION BY o_custkey)) AS cohort_month,
        |    date_trunc('month', o_orderdate) AS activity_month
        |  FROM orders),
        |ret AS (
        |  SELECT cohort_month, CAST(date_diff('month', cohort_month, activity_month) AS INTEGER) AS period_number,
        |    COUNT(DISTINCT o_custkey) AS active_entities
        |  FROM base GROUP BY 1, 2),
        |sized AS (
        |  SELECT *, MAX(CASE WHEN period_number = 0 THEN active_entities END) OVER (PARTITION BY cohort_month) AS cohort_size
        |  FROM ret)
        |SELECT cohort_month, period_number, active_entities, cohort_size,
        |  ROUND(100.0 * CAST(active_entities AS DOUBLE) / CAST(cohort_size AS DOUBLE), 2) AS retention_pct
        |FROM sized ORDER BY cohort_month, period_number""".stripMargin,
    "q16_top_k" ->
      """SELECT o_custkey, c_name, total_spend FROM (
        |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total_spend
        |  FROM orders GROUP BY o_custkey) s
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_spend DESC, o_custkey LIMIT 10""".stripMargin,
    "q17_dedup_latest" ->
      """SELECT o_custkey, o_orderkey, order_date, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q18_scalar_functions" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000.0 THEN 'low' WHEN o_totalprice < 200000.0 THEN 'mid' ELSE 'high' END AS price_band,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
        |  CAST(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.05 AS DECIMAL(4,2)) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS fee,
        |  CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER) AS priority_rank
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q19_date_rollup" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
        |  COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q20_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q21_merge_classify" ->
      """WITH source AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0),
        |target AS (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
        |SELECT merge_action, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN t.c_custkey IS NULL THEN 'INSERT' ELSE 'UPDATE' END AS merge_action
        |  FROM source s LEFT JOIN target t ON s.c_custkey = t.c_custkey)
        |GROUP BY merge_action ORDER BY merge_action""".stripMargin,
    "q22_incremental_load" ->
      """SELECT order_date, o_orderkey, o_custkey FROM (
        |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date
        |  FROM orders WHERE o_orderdate > TIMESTAMP '1999-06-01 00:00:00'
        |  ORDER BY o_orderdate, o_orderkey LIMIT 1000)
        |ORDER BY order_date, o_orderkey""".stripMargin,
    "q23_upsert" ->
      """WITH target AS (SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey % 2 = 0),
        |source AS (SELECT c_custkey, UPPER(c_name) AS c_name, c_mktsegment FROM customer WHERE c_custkey % 3 = 0)
        |SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
        |FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q24_soft_delete" ->
      """SELECT c_custkey, c_acctbal, (c_acctbal < 0) AS is_deleted
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q25_share_of_total" ->
      """WITH seg AS (
        |  SELECT c_mktsegment, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS segment_revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment),
        |tot AS (SELECT CAST(SUM(segment_revenue) AS DECIMAL(38,2)) AS total_revenue FROM seg)
        |SELECT c_mktsegment, segment_revenue, total_revenue,
        |  CAST(segment_revenue AS DOUBLE) / CAST(total_revenue AS DOUBLE) AS revenue_share
        |FROM seg, tot ORDER BY c_mktsegment""".stripMargin,
    "q26_row_hash" ->
      """SELECT n_nationkey, sha256(concat_ws('|',
        |  concat_ws('=', 'n_name', COALESCE(CAST(n_name AS VARCHAR), '')),
        |  concat_ws('=', 'n_nationkey', COALESCE(CAST(n_nationkey AS VARCHAR), '')),
        |  concat_ws('=', 'n_regionkey', COALESCE(CAST(n_regionkey AS VARCHAR), '')))) AS row_hash
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q27_graph_traversal" -> q27TraversalOracle,
    "q28_event_windowed_agg" ->
      """SELECT date_trunc('hour', ts) AS event_hour, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q29_event_sessionization" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts_sec FROM events),
        |flagged AS (
        |  SELECT user_id,
        |    CASE WHEN LAG(ts_sec) OVER w IS NULL OR date_diff('second', LAG(ts_sec) OVER w, ts_sec) > 1800 THEN 1 ELSE 0 END AS is_new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        |SELECT user_id, COUNT(*) AS n_events, CAST(SUM(is_new_session) AS BIGINT) AS n_sessions
        |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q30_dedup_exact" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_hash,
        |  MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    "q31_token_stats" ->
      """SELECT lang, n_docs, total_tokens, total_subword_tokens,
        |  CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_tokens
        |FROM (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
        |    CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_subword_tokens
        |  FROM documents GROUP BY lang)
        |ORDER BY lang""".stripMargin,
    "q32_text_quality" ->
      raw"""SELECT doc_id, n_tokens, stopword_hits, punct_chars, quality_score,
        |  CASE WHEN quality_score >= 0.8 THEN 'high' WHEN quality_score >= 0.5 THEN 'medium' ELSE 'low' END AS quality_label
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_tokens,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|is|are|of|and|or|to|in)\b')) AS INTEGER) AS stopword_hits,
        |    CAST(len(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS INTEGER) AS punct_chars,
        |    $qualityScoreSql AS quality_score
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q33_lang_id" ->
      """WITH scored AS (
        |  SELECT lang,
        |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS cjk,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|mit)\b')) AS s_de,
        |    len(regexp_extract_all(lower(text), '\b(the|is|of|and|that|with|for|this)\b')) AS s_en,
        |    len(regexp_extract_all(lower(text), '\b(el|los|las|una|está|por|con|para)\b')) AS s_es,
        |    len(regexp_extract_all(lower(text), '\b(le|les|des|est|dans|pour|avec|une)\b')) AS s_fr
        |  FROM documents),
        |pred AS (
        |  SELECT lang,
        |    CASE WHEN cjk > 0 THEN 'zh'
        |         WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
        |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
        |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
        |         WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
        |         ELSE 'und' END AS predicted_lang
        |  FROM scored)
        |SELECT lang, predicted_lang, COUNT(*) AS n_docs FROM pred
        |GROUP BY lang, predicted_lang ORDER BY lang, predicted_lang""".stripMargin,
    "q34_dedup_minhash_lsh" ->
      (dupClusterCtes +
        "SELECT id_a, id_b, jaccard FROM dup ORDER BY id_a, id_b"),
    "q35_dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS sh
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id, list_transform(sh, s -> CAST(('0x' || substring(sha256(s), 1, 15)) AS BIGINT)) AS hs
        |  FROM toks),
        |fps AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 60), b ->
        |      CASE WHEN 2 * len(list_filter(hs, h -> ((h >> b) & 1) = 1)) > len(hs)
        |           THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fp
        |  FROM hashed),
        |blocked AS (
        |  SELECT f.doc_id, f.fp, q.q, (f.fp >> CAST(q.q * 16 AS INTEGER)) & 65535 AS qh
        |  FROM fps f, (SELECT unnest(range(0, 4)) AS q) q),
        |capped AS (
        |  SELECT * FROM (
        |    SELECT doc_id, fp, q, qh, count(*) OVER (PARTITION BY q, qh) AS bs FROM blocked)
        |  WHERE bs <= 200)
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, bit_count(xor(a.fp, b.fp)) AS hamming
        |FROM capped a JOIN capped b ON a.q = b.q AND a.qh = b.qh AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 16
        |ORDER BY id_a, id_b""".stripMargin,
    "q37_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '),
        |        t -> CAST(('0x' || substring(sha256(t), 1, 15)) AS BIGINT) % 2147483647)),
        |    (acc, h) -> (acc * 31 + h) % 2147483647) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q41_knn_lsh" ->
      """WITH dims AS (SELECT CAST(len(embedding) AS INTEGER) AS d FROM embeddings LIMIT 1),
        |planes AS (
        |  SELECT list(sgn ORDER BY p) AS allsigns FROM (
        |    SELECT t.p, list_transform(range(0, dims.d), i ->
        |      CASE WHEN CAST(('0x' || substring(sha256(CAST(t.p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
        |           THEN 1.0 ELSE -1.0 END) AS sgn
        |    FROM range(0, 16) t(p), dims)),
        |sigs AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_sum(list_transform(range(0, 16), p ->
        |      CASE WHEN list_reduce(list_prepend(0.0, list_transform(list_zip(embedding, allsigns[CAST(p AS INTEGER)+1]),
        |             z -> CAST(z[1] AS DOUBLE) * z[2])), (a, b) -> a + b) >= 0.0
        |           THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
        |  FROM embeddings, planes),
        |q AS (SELECT embedding AS qv, sig AS qsig FROM sigs WHERE vec_id = 0)
        |SELECT vec_id, cosine_sim FROM (
        |  SELECT s.vec_id,
        |    list_reduce(list_transform(list_zip(s.embedding, q.qv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)
        |    / (sqrt(list_reduce(list_transform(s.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
        |       * sqrt(list_reduce(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))) AS cosine_sim,
        |    bit_count(xor(s.sig, q.qsig)) AS bd
        |  FROM sigs s, q WHERE s.vec_id <> 0)
        |WHERE bd <= 6
        |ORDER BY cosine_sim DESC, vec_id LIMIT 10""".stripMargin,
    "q36_ngram_jaccard" ->
      """WITH toksrc AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks FROM documents),
        |sets AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
        |      ELSE list_transform(generate_series(1, CAST(len(toks) AS INTEGER) - 1), i -> toks[i] || ' ' || toks[i + 1]) END) AS bset
        |  FROM toksrc),
        |pairs AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents)
        |SELECT id_a, id_b, n_intersect, n_union,
        |  CAST(n_intersect AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard
        |FROM (
        |  SELECT p.id_a, p.id_b,
        |    CAST(len(list_intersect(a.bset, b.bset)) AS INTEGER) AS n_intersect,
        |    CAST(len(list_distinct(list_concat(a.bset, b.bset))) AS INTEGER) AS n_union
        |  FROM pairs p JOIN sets a ON p.id_a = a.doc_id JOIN sets b ON p.id_b = b.doc_id)
        |ORDER BY id_a""".stripMargin,
    "q38_embedding_neardup" ->
      """WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50)
        |SELECT id_a, id_b, cosine_sim FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_reduce(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
        |    / (sqrt(list_reduce(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
        |       * sqrt(list_reduce(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))) AS cosine_sim
        |  FROM sub a, sub b WHERE a.vec_id < b.vec_id)
        |WHERE cosine_sim >= 0.25 ORDER BY id_a, id_b""".stripMargin,
    "q40_knn_brute_force" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, cosine_sim FROM (
        |  SELECT e.vec_id,
        |    list_reduce(list_transform(list_zip(e.embedding, q.qv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)
        |    / (sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
        |       * sqrt(list_reduce(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))) AS cosine_sim
        |  FROM embeddings e, q WHERE e.vec_id <> 0)
        |ORDER BY cosine_sim DESC, vec_id LIMIT 10""".stripMargin,
    "q39_knn_ivf" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |sims AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    list_reduce(list_transform(list_zip(e.embedding, c.cv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)
        |    / (sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
        |       * sqrt(list_reduce(list_transform(c.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))) AS s
        |  FROM embeddings e, c),
        |probe AS (
        |  SELECT cid FROM (
        |    SELECT c.cid,
        |      list_reduce(list_transform(list_zip(c.cv, q.qv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)
        |      / (sqrt(list_reduce(list_transform(c.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
        |         * sqrt(list_reduce(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))) AS sq
        |    FROM c, q)
        |  ORDER BY sq DESC, cid LIMIT 2),
        |assign AS (
        |  SELECT vec_id, embedding FROM (
        |    SELECT vec_id, embedding, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM sims)
        |  WHERE rn = 1 AND cid IN (SELECT cid FROM probe))
        |SELECT vec_id, cosine_sim FROM (
        |  SELECT a.vec_id,
        |    list_reduce(list_transform(list_zip(a.embedding, q.qv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a2, b2) -> a2 + b2)
        |    / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a2, b2) -> a2 + b2))
        |       * sqrt(list_reduce(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a2, b2) -> a2 + b2))) AS cosine_sim
        |  FROM assign a, q WHERE a.vec_id <> 0)
        |ORDER BY cosine_sim DESC, vec_id LIMIT 10""".stripMargin,
    "q42_vector_stats" ->
      """SELECT label, n_vectors, min_norm, max_norm, total_norm,
        |  total_norm / CAST(n_vectors AS DOUBLE) AS avg_norm
        |FROM (
        |  SELECT label, COUNT(*) AS n_vectors, MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
        |    CAST(CAST(CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS total_norm
        |  FROM (
        |    SELECT label, sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
        |    FROM embeddings)
        |  GROUP BY label)
        |ORDER BY label""".stripMargin,
    "q43_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q44_pagination" ->
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey LIMIT 50 OFFSET 100""".stripMargin,
    "q45_soft_delete_convention" ->
      """SELECT c_mktsegment, COUNT(*) AS n_active FROM customer
        |WHERE NOT (c_acctbal < 0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q46_merge_delete" ->
      """WITH target AS (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0),
        |source AS (SELECT c_custkey, UPPER(c_name) AS c_name, c_acctbal FROM customer WHERE c_custkey % 3 = 0)
        |SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal
        |FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
        |WHERE NOT (s.c_custkey IS NOT NULL AND t.c_custkey IS NOT NULL AND t.c_acctbal < 0)
        |ORDER BY c_custkey""".stripMargin,
    "q47_upsert_guard" ->
      """WITH target AS (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0),
        |source AS (SELECT c_custkey, UPPER(c_name) AS c_name, c_acctbal FROM customer WHERE c_custkey % 3 = 0)
        |SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL AND (t.c_custkey IS NULL OR t.c_acctbal < 0)
        |       THEN s.c_name ELSE t.c_name END AS c_name,
        |  CASE WHEN s.c_custkey IS NOT NULL AND (t.c_custkey IS NULL OR t.c_acctbal < 0)
        |       THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal
        |FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q48_conflict_skip" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey % 3 = 0
        |  AND c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
        |ORDER BY c_custkey""".stripMargin,
    "q49_batch_update" ->
      """SELECT c_custkey,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q50_multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_length,
        |  sha256(text) AS content_sha256
        |FROM documents ORDER BY media_id""".stripMargin,
    "q51_constraint_violations" ->
      """SELECT constraint_name, violations FROM (
        |  SELECT 'pk_orders' AS constraint_name,
        |    CAST((SELECT COUNT(*) FILTER (WHERE cnt > 1)
        |            + COALESCE(SUM(cnt) FILTER (WHERE o_orderkey IS NULL), 0)
        |          FROM (SELECT o_orderkey, COUNT(*) AS cnt FROM orders GROUP BY o_orderkey) g) AS BIGINT) AS violations
        |  UNION ALL
        |  SELECT 'uq_orders_custkey',
        |    CAST((SELECT COUNT(*) FILTER (WHERE cnt > 1)
        |          FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) g) AS BIGINT)
        |  UNION ALL
        |  SELECT 'nn_orders_orderdate',
        |    CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) AS BIGINT)
        |  UNION ALL
        |  SELECT 'pk_lineitem',
        |    CAST((SELECT COUNT(*) FILTER (WHERE cnt > 1)
        |            + COALESCE(SUM(cnt) FILTER (WHERE l_orderkey IS NULL OR l_linenumber IS NULL), 0)
        |          FROM (SELECT l_orderkey, l_linenumber, COUNT(*) AS cnt FROM lineitem GROUP BY 1, 2) g) AS BIGINT)
        |) t ORDER BY constraint_name""".stripMargin,
    "q52_dup_clusters" ->
      (dupClusterCtes +
        """SELECT c.doc_id, c.cluster_id, s.cluster_size
          |FROM comp c
          |JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          |      FROM comp GROUP BY cluster_id) s USING (cluster_id)
          |ORDER BY c.doc_id""".stripMargin),
    "q53_dedup_corpus" ->
      (dupClusterCtes +
        """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          |FROM documents
          |WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
          |GROUP BY source ORDER BY source""".stripMargin),
    "q54_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, CAST(len(t) AS INTEGER)), i -> t[i] || ' ' || t[i+1])) AS bgs
        |  FROM toks),
        |train AS (SELECT DISTINCT unnest(bgs) AS gram FROM bg WHERE doc_id % 17 <> 0),
        |ev AS (SELECT doc_id, unnest(bgs) AS gram FROM bg WHERE doc_id % 17 = 0)
        |SELECT ev.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_ngrams,
        |  CAST(COUNT(tr.gram) AS BIGINT) AS n_contaminated,
        |  CAST(COUNT(tr.gram) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS contamination_rate
        |FROM ev LEFT JOIN train tr ON ev.gram = tr.gram
        |GROUP BY ev.doc_id ORDER BY ev.doc_id""".stripMargin,
    "q55_repetition_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, t,
        |    list_transform(range(1, CAST(len(t) AS INTEGER)), i -> t[i] || ' ' || t[i+1]) AS bg
        |  FROM toks),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS distinct_token_ratio,
        |    CASE WHEN len(bg) > 0 THEN
        |      CAST(list_max(list_transform(list_distinct(bg), x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)
        |        / CAST(len(bg) AS DOUBLE)
        |    ELSE CAST(0 AS DOUBLE) END AS top_bigram_frac
        |  FROM m)
        |SELECT doc_id, n_tokens, distinct_token_ratio, top_bigram_frac,
        |  CASE WHEN distinct_token_ratio < 0.3 OR (top_bigram_frac > 0.18 AND n_tokens >= 20)
        |    THEN 'repetitive' ELSE 'ok' END AS repetition_label
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q56_stratified_sample" ->
      """SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT), doc_id
        |    ) AS BIGINT) AS sample_rank
        |  FROM documents) ranked
        |WHERE sample_rank <= 5 ORDER BY source, sample_rank""".stripMargin,
    "q57_sequence_packing" ->
      """WITH x AS (
        |  SELECT source AS stratum, doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |y AS (
        |  SELECT stratum, doc_id, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM x)
        |SELECT stratum,
        |  CAST(FLOOR(CAST(cum_tokens - n_tokens AS DOUBLE) / 512.0) AS BIGINT) AS bin_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM y GROUP BY stratum, bin_id ORDER BY stratum, bin_id""".stripMargin,
    "q58_doc_frequency" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS df_count FROM (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))) AS token
        |  FROM documents) u
        |GROUP BY token ORDER BY df_count DESC, token LIMIT 20""".stripMargin,
    "q59_pii_redaction" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or 555-867-530' || CAST(doc_id % 10 AS VARCHAR)
        |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS s
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(s, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(s,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted_text
        |FROM aug ORDER BY doc_id""".stripMargin,
    "q60_token_df_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |inst AS (SELECT doc_id, unnest(t) AS token FROM toks),
        |dfreq AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df_count FROM (
        |    SELECT doc_id, unnest(list_distinct(t)) AS token FROM toks) u
        |  GROUP BY token)
        |SELECT i.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_token_instances,
        |  CAST(SUM(d.df_count) AS BIGINT) AS sum_df,
        |  CAST(SUM(d.df_count) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_token_df
        |FROM inst i JOIN dfreq d USING (token)
        |GROUP BY i.doc_id ORDER BY i.doc_id""".stripMargin,
    "q61_frame_sample" ->
      """SELECT media_id, frame_index,
        |  sha256(text || ':' || CAST(frame_index AS VARCHAR)) AS frame_sha256
        |FROM (
        |  SELECT doc_id AS media_id, text,
        |    unnest(range(0, 1 + (strlen(text) % 7))) AS frame_index
        |  FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY media_id, frame_index""".stripMargin,
    "q62_asof_join" ->
      """WITH p AS (
        |  -- CAST to microsecond TIMESTAMP: Spark's events.ts is ns-parquet
        |  -- floored to micros, and a DuckDB that preserves TIMESTAMP_NS
        |  -- would otherwise match/dedup at a different precision
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'),
        |c0 AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'click'),
        |c AS (
        |  SELECT event_id, user_id, ts FROM (
        |    SELECT c0.*, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM c0) WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
        |  c.event_id AS click_id, c.ts AS click_ts,
        |  CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT) AS secs_since_click
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q63_range_join" ->
      """WITH bands(band_id, lo, hi) AS (VALUES
        |  (CAST(0 AS BIGINT), 0.0, 1.0), (1, 1.0, 5.0), (2, 5.0, 20.0), (3, 20.0, 50.0),
        |  (4, 50.0, 100.0), (5, 100.0, 200.0), (6, 200.0, 350.0), (7, 350.0, 500.0))
        |SELECT band_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_value
        |FROM events e JOIN bands b
        |  ON e.value >= CAST(b.lo AS DOUBLE) AND e.value < CAST(b.hi AS DOUBLE)
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q64_incremental_dedup" ->
      ("WITH " + lshPrefixCtes("documents") + ",\n" +
        """cbuck AS (
          |  SELECT band, bkey, list(doc_id) AS cids
          |  FROM banded WHERE doc_id % 10 <> 0
          |  GROUP BY band, bkey HAVING count(*) <= 50),
          |cand AS (
          |  SELECT DISTINCT d.doc_id AS delta_id, unnest(cb.cids) AS corpus_id
          |  FROM banded d JOIN cbuck cb ON d.band = cb.band AND d.bkey = cb.bkey
          |  WHERE d.doc_id % 10 = 0)
          |SELECT delta_id, corpus_id, jaccard FROM (
          |  SELECT p.delta_id, p.corpus_id,
          |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
          |  FROM cand p JOIN sigs a ON p.delta_id = a.doc_id JOIN sigs b ON p.corpus_id = b.doc_id)
          |WHERE jaccard >= 0.5 ORDER BY delta_id, corpus_id""".stripMargin),
    "q65_curation_pipeline" ->
      (curationChainCtes +
        """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens
          |FROM exact
          |WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
          |GROUP BY source ORDER BY source""".stripMargin),
    "q66_curation_funnel" ->
      (curationChainCtes +
        """SELECT
          |  CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_input,
          |  CAST((SELECT COUNT(*) FROM gated) AS BIGINT) AS n_after_gate,
          |  CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_after_exact,
          |  CAST((SELECT COUNT(*) FROM exact
          |        WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)) AS BIGINT) AS n_after_neardup""".stripMargin),
    // replicates the FULL LSH pipeline of Dedup.embeddingNearDuplicates: the
    // Sha60-derived ±1 sign matrix (same "p:i" convention as q41), per-vector
    // signature packing, bucket-size cap, same-bucket pair join, cosine gate
    "q67_embedding_neardup_lsh" ->
      ("WITH " + embLshCtes + "\n" +
        """SELECT id_a, id_b, cosine_sim FROM epairs
          |ORDER BY id_a, id_b""".stripMargin),
    // q67's pair pipeline closed under transitivity (recursive reachability,
    // cluster_id = component minimum — mirrors Dedup.duplicateClusters), one
    // canonical vector per cluster, surviving vectors per label
    "q68_semantic_dedup" ->
      ("WITH RECURSIVE " + embLshCtes + ",\n" +
        """edges AS (SELECT id_a AS src, id_b AS dst FROM epairs UNION SELECT id_b, id_a FROM epairs),
          |reach AS (
          |  SELECT src AS id, src AS r FROM edges
          |  UNION
          |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON reach.id = e.src WHERE reach.r < e.dst),
          |comp AS MATERIALIZED (SELECT id AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
          |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors
          |FROM embeddings
          |WHERE vec_id NOT IN (SELECT vec_id FROM comp WHERE vec_id <> cluster_id)
          |GROUP BY label ORDER BY label""".stripMargin),
    // synthetic v2 (drop %11, amend %5 text, re-add %13 under new ids)
    // diffed against v1 on normalized content hashes
    "q72_corpus_diff" ->
      """WITH v2 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT -(doc_id + 1), text FROM documents WHERE doc_id % 13 = 0),
        |h1 AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h, TRUE AS present FROM documents),
        |h2 AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h, TRUE AS present FROM v2)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs FROM (
        |  SELECT CASE WHEN h1.present IS NULL THEN 'added' WHEN h2.present IS NULL THEN 'removed'
        |              WHEN h1.h IS NOT DISTINCT FROM h2.h THEN 'unchanged' ELSE 'changed' END AS status
        |  FROM h1 FULL JOIN h2 ON h1.doc_id = h2.doc_id)
        |GROUP BY status ORDER BY status""".stripMargin,
    // trigrams: sliding 3-token windows over the normalized token list;
    // docs with <3 tokens contribute none (empty generate_series)
    "q73_top_ngrams" ->
      """WITH toks AS (
        |  SELECT string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |idx AS (
        |  SELECT t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i FROM toks),
        |grams AS (
        |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram FROM idx)
        |SELECT gram, COUNT(*) AS gram_count FROM grams
        |GROUP BY gram ORDER BY gram_count DESC, gram LIMIT 20""".stripMargin,
    // consecutive 20-token chunks per doc (last partial); a chunk is
    // duplicated when its content occurs in >1 DISTINCT document, so
    // within-doc repetition does not count
    "q74_chunk_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, t, unnest(generate_series(0, (len(t) - 1) // 20)) AS k FROM toks),
        |chunks AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_slice(t, k * 20 + 1, k * 20 + 20), ' ')) AS chunk_hash
        |  FROM idx),
        |freq AS (
        |  SELECT chunk_hash, COUNT(*) AS nd
        |  FROM (SELECT DISTINCT doc_id, chunk_hash FROM chunks) GROUP BY chunk_hash)
        |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |  CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_chunk_frac
        |FROM chunks c JOIN freq f USING (chunk_hash)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    // tf/df keyword score: integer-exact IEEE division (no log), ties by
    // token — (score, token) is unique per doc, so ROW_NUMBER is stable
    "q75_keyword_extract" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |inst AS (SELECT doc_id, unnest(t) AS token FROM toks),
        |tf AS (
        |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM inst GROUP BY doc_id, token),
        |dfreq AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df_count
        |  FROM (SELECT DISTINCT doc_id, token FROM inst) GROUP BY token),
        |ranked AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df_count,
        |    CAST(tf.tf AS DOUBLE) / CAST(dfreq.df_count AS DOUBLE) AS score,
        |    CAST(ROW_NUMBER() OVER (
        |      PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf AS DOUBLE) / CAST(dfreq.df_count AS DOUBLE) DESC, tf.token
        |    ) AS BIGINT) AS keyword_rank
        |  FROM tf JOIN dfreq USING (token))
        |SELECT doc_id, keyword_rank, token, tf, df_count, score FROM ranked
        |WHERE keyword_rank <= 3 ORDER BY doc_id, keyword_rank""".stripMargin,
    // corpus bucket index (capped ids per signature) probed by the delta
    // split — replicates Dedup.embeddingIncrementalDuplicates stage by stage
    "q70_incremental_embedding_dedup" ->
      ("WITH " + embSigCtes + ",\n" +
        s"""cbuck AS (
          |  SELECT sig, list(vec_id) AS cids
          |  FROM esigs WHERE vec_id % 10 <> 0
          |  GROUP BY sig HAVING count(*) <= 200),
          |cand AS (
          |  SELECT d.vec_id AS delta_id, d.embedding AS dvec, unnest(cb.cids) AS corpus_id
          |  FROM esigs d JOIN cbuck cb ON d.sig = cb.sig
          |  WHERE d.vec_id % 10 = 0)
          |SELECT delta_id, corpus_id, cosine_sim FROM (
          |  SELECT p.delta_id, p.corpus_id,
          |    ${cosineSql("p.dvec", "c.embedding")} AS cosine_sim
          |  FROM cand p JOIN embeddings c ON p.corpus_id = c.vec_id)
          |WHERE cosine_sim >= 0.25 ORDER BY delta_id, corpus_id""".stripMargin),
    // the stream's admitted sink is the COMPLEMENT of q70's match set:
    // delta vectors with no capped-bucket cosine match in the corpus
    "q119_streaming_embedding_dedup" ->
      ("WITH " + embSigCtes + ",\n" +
        s"""cbuck AS (
          |  SELECT sig, list(vec_id) AS cids
          |  FROM esigs WHERE vec_id % 10 <> 0
          |  GROUP BY sig HAVING count(*) <= 200),
          |dup AS (
          |  SELECT DISTINCT delta_id FROM (
          |    SELECT p.delta_id,
          |      ${cosineSql("p.dvec", "c.embedding")} AS cosine_sim
          |    FROM (SELECT d.vec_id AS delta_id, d.embedding AS dvec, unnest(cb.cids) AS corpus_id
          |          FROM esigs d JOIN cbuck cb ON d.sig = cb.sig
          |          WHERE d.vec_id % 10 = 0) p
          |    JOIN embeddings c ON p.corpus_id = c.vec_id)
          |  WHERE cosine_sim >= 0.25)
          |SELECT vec_id FROM embeddings
          |WHERE vec_id % 10 = 0 AND vec_id NOT IN (SELECT delta_id FROM dup)
          |ORDER BY vec_id""".stripMargin),
    // per-source weight join + two Sha60 hash predicates (keep-threshold,
    // split bucket) — replicates Curation.weightedSourceSample + hashSplit
    "q71_corpus_mixture" ->
      """WITH w(src, keep) AS (VALUES
        |  ('src0', 1000), ('src1', 1000), ('src2', 1000), ('src3', 1000), ('src4', 1000), ('src5', 1000),
        |  ('src6', 500), ('src7', 500), ('src8', 500), ('src9', 500), ('src10', 500), ('src11', 500),
        |  ('src12', 100), ('src13', 100), ('src14', 100), ('src15', 100), ('src16', 100), ('src17', 100)),
        |sampled AS (
        |  SELECT d.*,
        |    CAST(('0x' || substring(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM documents d JOIN w ON d.source = w.src
        |  WHERE CAST(('0x' || substring(sha256('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < w.keep)
        |SELECT source,
        |  CASE WHEN h % 100 < 90 THEN 'train' WHEN h % 100 < 95 THEN 'val' ELSE 'test' END AS split,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens
        |FROM sampled
        |GROUP BY source, split ORDER BY source, split""".stripMargin,
    // floor(v·127 + 0.5), not round(): floor is defined identically in both
    // engines while round's half-way ties differ — see VectorFunctions
    "q69_vector_quantization" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding, x ->
        |      CAST(floor(greatest(-1.0, least(1.0, CAST(x AS DOUBLE))) * 127.0 + 0.5) AS INTEGER)) AS qvec
        |  FROM embeddings)
        |SELECT vec_id,
        |  array_to_string(qvec, ',') AS qcsv,
        |  CAST(list_sum(list_transform(qvec, v -> CAST(v AS BIGINT))) AS BIGINT) AS q_sum,
        |  list_max(list_transform(list_zip(embedding, qvec),
        |    p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) / 127.0))) AS max_abs_err
        |FROM q ORDER BY vec_id""".stripMargin,
    // q76-q79 certify the silver cleaning rules + gold KPI build against the
    // reference's OWN dirty CSVs (FIXTURES.md §1) — read_csv(all_varchar)
    // mirrors the Spark side's explicit all-string schema exactly
    "q76_silver_sales" ->
      ("WITH " + silverSalesCtes + "\n" +
        """SELECT sls_ord_num, sls_prd_key, sls_cust_id, sls_order_dt, sls_ship_dt,
          |  sls_due_dt, sls_sales, sls_quantity, sls_price
          |FROM ssilver""".stripMargin),
    "q77_gold_customer_analytics" ->
      ("WITH " + silverSalesCtes + ",\n" +
        """craw AS (
          |  SELECT * FROM read_csv('/root/reference/datasets/source_crm/cust_info.csv', header=true, all_varchar=true)),
          |ctyped AS (
          |  SELECT CAST(cst_id AS BIGINT) AS cst_id,
          |    trim(cst_firstname) AS cst_firstname, trim(cst_lastname) AS cst_lastname,
          |    CASE WHEN upper(trim(cst_gndr)) IN ('M', 'MALE') THEN 'Male'
          |         WHEN upper(trim(cst_gndr)) IN ('F', 'FEMALE') THEN 'Female'
          |         ELSE 'n/a' END AS cst_gndr,
          |    CAST(cst_create_date AS DATE) AS cst_create_date
          |  FROM craw WHERE cst_id IS NOT NULL),
          |cdedup AS (
          |  SELECT cst_id, cst_firstname, cst_lastname, cst_gndr FROM (
          |    SELECT ctyped.*, row_number() OVER (
          |      PARTITION BY cst_id ORDER BY cst_create_date DESC NULLS LAST) AS rn
          |    FROM ctyped) WHERE rn = 1),
          |percust AS (
          |  SELECT sls_cust_id, SUM(sls_sales) AS lv,
          |    CAST(COUNT(DISTINCT sls_ord_num) AS BIGINT) AS tor,
          |    MAX(sls_order_dt) AS lod
          |  FROM ssilver WHERE sls_order_dt IS NOT NULL GROUP BY sls_cust_id)
          |SELECT c.cst_id AS customer_key,
          |  concat_ws(' ', c.cst_firstname, c.cst_lastname) AS customer_name,
          |  c.cst_gndr AS gender,
          |  CAST(COALESCE(p.lv, 0) AS BIGINT) AS lifetime_value,
          |  CAST(COALESCE(p.tor, 0) AS BIGINT) AS total_orders,
          |  COALESCE(CAST(p.lv AS DOUBLE) / CAST(p.tor AS DOUBLE), 0.0) AS avg_order_value,
          |  p.lod AS last_order_date,
          |  CASE WHEN COALESCE(p.lv, 0) >= 10000 THEN 'VIP'
          |       WHEN COALESCE(p.lv, 0) >= 1000 THEN 'Regular'
          |       WHEN COALESCE(p.lv, 0) > 0 THEN 'Occasional'
          |       ELSE 'Prospect' END AS customer_segment
          |FROM cdedup c LEFT JOIN percust p ON c.cst_id = p.sls_cust_id""".stripMargin),
    "q78_silver_products" ->
      """WITH praw AS (
        |  SELECT * FROM read_csv('/root/reference/datasets/source_crm/prd_info.csv', header=true, all_varchar=true))
        |SELECT CAST(prd_id AS BIGINT) AS prd_id,
        |  replace(substr(prd_key, 1, 5), '-', '_') AS cat_id,
        |  substr(prd_key, 7) AS prd_key,
        |  trim(prd_nm) AS prd_nm,
        |  COALESCE(CAST(prd_cost AS DOUBLE), 0.0) AS prd_cost,
        |  CASE WHEN upper(trim(prd_line)) = 'M' THEN 'Mountain'
        |       WHEN upper(trim(prd_line)) = 'R' THEN 'Road'
        |       WHEN upper(trim(prd_line)) = 'S' THEN 'Other Sales'
        |       WHEN upper(trim(prd_line)) = 'T' THEN 'Touring'
        |       ELSE 'n/a' END AS prd_line,
        |  CAST(prd_start_dt AS DATE) AS prd_start_dt,
        |  CAST(prd_end_dt AS DATE) AS prd_end_dt
        |FROM praw""".stripMargin,
    "q79_silver_erp_customers" ->
      """WITH eraw AS (
        |  SELECT * FROM read_csv('/root/reference/datasets/source_erp/CUST_AZ12.csv', header=true, all_varchar=true)),
        |ecust AS (
        |  SELECT CASE WHEN trim(CID) LIKE 'NAS%' THEN substr(trim(CID), 4) ELSE trim(CID) END AS cid,
        |    CASE WHEN CAST(BDATE AS DATE) > DATE '2026-01-01' THEN NULL ELSE CAST(BDATE AS DATE) END AS bdate,
        |    CASE WHEN upper(trim(GEN)) IN ('M', 'MALE') THEN 'Male'
        |         WHEN upper(trim(GEN)) IN ('F', 'FEMALE') THEN 'Female'
        |         ELSE 'n/a' END AS gen
        |  FROM eraw),
        |lraw AS (
        |  SELECT * FROM read_csv('/root/reference/datasets/source_erp/LOC_A101.csv', header=true, all_varchar=true)),
        |eloc AS (
        |  SELECT replace(trim(CID), '-', '') AS cid,
        |    CASE WHEN upper(trim(CNTRY)) IN ('DE', 'GERMANY') THEN 'Germany'
        |         WHEN upper(trim(CNTRY)) IN ('US', 'USA', 'UNITED STATES') THEN 'United States'
        |         WHEN CNTRY IS NULL OR trim(CNTRY) = '' THEN 'n/a'
        |         ELSE array_to_string(list_transform(string_split(trim(CNTRY), ' '),
        |           s -> CASE WHEN length(s) = 0 THEN s ELSE upper(s[1]) || lower(s[2:]) END), ' ')
        |    END AS cntry
        |  FROM lraw)
        |SELECT c.cid, c.bdate, c.gen, l.cntry
        |FROM ecust c LEFT JOIN eloc l ON c.cid = l.cid""".stripMargin,
    // kNN self-join: q67's signature/bucket CTEs at threshold -1 (every
    // in-bucket pair), symmetrized, per-vector top-5 by cosine desc / id
    "q80_knn_join" ->
      ("WITH " + embSigCtes + ",\n" +
        s"""capped AS (
          |  SELECT vec_id, embedding, sig FROM (
          |    SELECT vec_id, embedding, sig, count(*) OVER (PARTITION BY sig) AS bs FROM esigs)
          |  WHERE bs <= 200),
          |apairs AS (
          |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |    ${cosineSql("a.embedding", "b.embedding")} AS cosine_sim
          |  FROM capped a JOIN capped b ON a.sig = b.sig AND a.vec_id < b.vec_id),
          |sym AS (
          |  SELECT id_a AS vec_id, id_b AS neighbor_id, cosine_sim FROM apairs
          |  UNION ALL
          |  SELECT id_b, id_a, cosine_sim FROM apairs)
          |SELECT vec_id, knn_rank, neighbor_id, cosine_sim FROM (
          |  SELECT sym.*, CAST(row_number() OVER (
          |    PARTITION BY vec_id ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS knn_rank
          |  FROM sym)
          |WHERE knn_rank <= 5 ORDER BY vec_id, knn_rank""".stripMargin),
    // integral df-sum affinity: distinct tokens per doc, vocabulary df split
    // by target membership, BIGINT sums, one final division
    "q81_target_affinity" ->
      """WITH inst AS (
        |  SELECT doc_id, source = 'src0' AS is_target,
        |    unnest(list_distinct(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))) AS token
        |  FROM documents),
        |dfc AS (
        |  SELECT token,
        |    CAST(count(*) AS BIGINT) AS df_all,
        |    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS df_target
        |  FROM inst GROUP BY token)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(df_target) AS BIGINT) AS sum_df_target,
        |  CAST(SUM(df_all) AS BIGINT) AS sum_df_all,
        |  CAST(SUM(df_target) AS DOUBLE) / CAST(SUM(df_all) AS DOUBLE) AS affinity
        |FROM inst JOIN dfc USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // all-count aggregation (no float accumulation); rates are single final
    // divisions; quality formula mirrors the q65 'qs' expression exactly
    "q82_corpus_report" ->
      raw"""WITH scored AS (
        |  SELECT source, text,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_toks,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS chash,
        |    $qualityScoreSql AS qs
        |  FROM documents)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS total_tokens,
        |  CAST(count(DISTINCT chash) AS BIGINT) AS n_distinct_contents,
        |  CAST(count(CASE WHEN qs >= 0.5 THEN 1 END) AS BIGINT) AS n_quality_pass,
        |  CAST(count(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 END) AS BIGINT) AS n_empty,
        |  1.0 - CAST(count(DISTINCT chash) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_rate,
        |  CAST(count(CASE WHEN qs >= 0.5 THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS quality_pass_rate
        |FROM scored GROUP BY source ORDER BY source""".stripMargin,
    // q39's argmax centroid assignment (ties -> lowest cid) over ALL vectors,
    // then the q56 hash-rank stratified cut per cluster
    "q83_cluster_sample" ->
      (s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
        |sims AS (
        |  SELECT e.vec_id, c.cid,
        |    ${cosineSql("e.embedding", "c.cv")} AS s
        |  FROM embeddings e, c),
        |assign AS (
        |  SELECT vec_id, cid AS centroid_id FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM sims)
        |  WHERE rn = 1)
        |SELECT centroid_id, sample_rank, vec_id FROM (
        |  SELECT CAST(centroid_id AS INTEGER) AS centroid_id, vec_id,
        |    CAST(row_number() OVER (
        |      PARTITION BY centroid_id
        |      ORDER BY CAST(('0x' || substring(sha256(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT), vec_id
        |    ) AS BIGINT) AS sample_rank
        |  FROM assign)
        |WHERE sample_rank <= 25 ORDER BY centroid_id, sample_rank""".stripMargin),
    // winnowing (MOSS): trigram sha60 hashes mod 2^31-1, min of each
    // 4-window (single min when fewer than 4 hashes), pair count via the
    // capped fingerprint inverted index, containment vs the smaller set
    "q84_winnowing_neardup" ->
      ("WITH " + winnowCtes + ",\n" +
        """ex AS (SELECT doc_id, unnest(fp) AS f FROM fps),
        |okf AS (SELECT f FROM ex GROUP BY f HAVING COUNT(*) BETWEEN 2 AND 50),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM ex a JOIN ex b ON a.f = b.f AND a.doc_id < b.doc_id
        |  JOIN okf ON okf.f = a.f
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp FROM fps WHERE len(fp) > 0)
        |SELECT id_a, id_b, n_shared, overlap FROM (
        |  SELECT s.id_a, s.id_b, s.n_shared,
        |    CAST(s.n_shared AS DOUBLE) / CAST(LEAST(sa.n_fp, sb.n_fp) AS DOUBLE) AS overlap
        |  FROM shared s JOIN sizes sa ON s.id_a = sa.doc_id JOIN sizes sb ON s.id_b = sb.doc_id)
        |WHERE overlap >= 0.5 ORDER BY id_a, id_b""".stripMargin),
    // delta (doc_id % 10 = 0) probes the corpus fingerprint index (cap on
    // the corpus side); containment over the DELTA side's fingerprints
    "q91_incremental_winnowing" ->
      ("WITH " + winnowCtes + ",\n" +
        """exc AS (SELECT doc_id AS corpus_id, unnest(fp) AS f FROM fps WHERE doc_id % 10 <> 0),
        |okf AS (SELECT f FROM exc GROUP BY f HAVING COUNT(*) <= 50),
        |exd AS (SELECT doc_id AS delta_id, unnest(fp) AS f FROM fps WHERE doc_id % 10 = 0),
        |shared AS (
        |  SELECT d.delta_id, c.corpus_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM exd d JOIN exc c ON d.f = c.f
        |  JOIN okf ON okf.f = d.f
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp FROM fps WHERE len(fp) > 0)
        |SELECT delta_id, corpus_id, n_shared, overlap FROM (
        |  SELECT s.delta_id, s.corpus_id, s.n_shared,
        |    CAST(s.n_shared AS DOUBLE) / CAST(sz.n_fp AS DOUBLE) AS overlap
        |  FROM shared s JOIN sizes sz ON s.delta_id = sz.doc_id)
        |WHERE overlap >= 0.3 ORDER BY delta_id, corpus_id""".stripMargin),
    // q91's winnowing probe with the eval set (doc_id % 17 = 0) as the
    // delta: train docs holding >= 30% of an eval doc's fingerprints drop
    "q120_span_decontaminate" ->
      ("WITH " + winnowCtes + ",\n" +
        """exc AS (SELECT doc_id AS corpus_id, unnest(fp) AS f FROM fps WHERE doc_id % 17 <> 0),
        |okf AS (SELECT f FROM exc GROUP BY f HAVING COUNT(*) <= 50),
        |exd AS (SELECT doc_id AS delta_id, unnest(fp) AS f FROM fps WHERE doc_id % 17 = 0),
        |shared AS (
        |  SELECT d.delta_id, c.corpus_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM exd d JOIN exc c ON d.f = c.f
        |  JOIN okf ON okf.f = d.f
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp FROM fps WHERE len(fp) > 0),
        |bad AS (
        |  SELECT DISTINCT corpus_id FROM (
        |    SELECT s.corpus_id,
        |      CAST(s.n_shared AS DOUBLE) / CAST(sz.n_fp AS DOUBLE) AS overlap
        |    FROM shared s JOIN sizes sz ON s.delta_id = sz.doc_id)
        |  WHERE overlap >= 0.3)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM documents
        |WHERE doc_id % 17 <> 0 AND doc_id NOT IN (SELECT corpus_id FROM bad)
        |GROUP BY source ORDER BY source""".stripMargin),
    // the two-day refresh loop FROM SCRATCH: day-1 admission (exact NOT
    // EXISTS on normalized text + q97's capped LSH probe) against the
    // day-0 population, then day-2 admission against indexes REBUILT over
    // population ∪ admitted₁ — so a refresh-vs-rebuild divergence in the
    // engine (resurrected over-cap bucket, stale count, missed fold)
    // changes this set. Day 2 includes RE-FETCHES of every day-1 doc under
    // negative ids (exact copy at -2id-1, odd; near copy with a marker
    // token at -2id-2, even — families disjoint for ANY source id):
    // re-fetches of day-1 ADMITTED docs are rejected only
    // if the fold really happened (exact copy ↔ content-hash fold, near
    // copy ↔ MinHash fold), so a no-op fold provably changes the answer.
    // Final clusters = recursive CC over LSH pairs among the day-2
    // admitted docs (their pairs to older docs are empty BY ADMISSION, so
    // the folded labeling restricted to them is exactly this)
    "q121_index_refresh_loop" ->
      ("WITH RECURSIVE " +
        raw"""alldocs AS (
          |  SELECT doc_id, text, source FROM documents
          |  UNION ALL SELECT -doc_id * 2 - 1, text, source
          |    FROM documents WHERE doc_id % 10 = 5
          |  UNION ALL SELECT -doc_id * 2 - 2, text || ' q121refetch', source
          |    FROM documents WHERE doc_id % 10 = 5),
          |""".stripMargin + lshPrefixCtes("alldocs") + ",\n" +
        raw"""nrm AS (
          |  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
          |  FROM alldocs),
          |ex0 AS (SELECT DISTINCT t FROM nrm
          |        WHERE doc_id >= 0 AND doc_id % 10 <> 0 AND doc_id % 10 <> 5),
          |b0 AS (
          |  SELECT band, bkey, list(doc_id) AS cids
          |  FROM banded WHERE doc_id >= 0 AND doc_id % 10 <> 0 AND doc_id % 10 <> 5
          |  GROUP BY band, bkey HAVING count(*) <= 50),
          |m1 AS (
          |  SELECT DISTINCT delta_id FROM (
          |    SELECT p.delta_id,
          |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
          |    FROM (
          |      SELECT DISTINCT d.doc_id AS delta_id, unnest(cb.cids) AS corpus_id
          |      FROM banded d JOIN b0 cb ON d.band = cb.band AND d.bkey = cb.bkey
          |      WHERE d.doc_id >= 0 AND d.doc_id % 10 = 5) p
          |    JOIN sigs a ON p.delta_id = a.doc_id JOIN sigs b ON p.corpus_id = b.doc_id)
          |  WHERE jaccard >= 0.5),
          |a1 AS (
          |  SELECT doc_id FROM nrm n WHERE doc_id >= 0 AND doc_id % 10 = 5
          |    AND NOT EXISTS (SELECT 1 FROM ex0 WHERE ex0.t = n.t)
          |    AND doc_id NOT IN (SELECT delta_id FROM m1)),
          |pop1 AS (
          |  SELECT doc_id FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 10 <> 5
          |  UNION ALL SELECT doc_id FROM a1),
          |ex1 AS (SELECT DISTINCT t FROM nrm JOIN pop1 USING (doc_id)),
          |b1 AS (
          |  SELECT band, bkey, list(doc_id) AS cids
          |  FROM banded JOIN pop1 USING (doc_id)
          |  GROUP BY band, bkey HAVING count(*) <= 50),
          |m2 AS (
          |  SELECT DISTINCT delta_id FROM (
          |    SELECT p.delta_id,
          |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
          |    FROM (
          |      SELECT DISTINCT d.doc_id AS delta_id, unnest(cb.cids) AS corpus_id
          |      FROM banded d JOIN b1 cb ON d.band = cb.band AND d.bkey = cb.bkey
          |      WHERE (d.doc_id >= 0 AND d.doc_id % 10 = 0) OR d.doc_id < 0) p
          |    JOIN sigs a ON p.delta_id = a.doc_id JOIN sigs b ON p.corpus_id = b.doc_id)
          |  WHERE jaccard >= 0.5),
          |a2 AS (
          |  SELECT doc_id FROM nrm n
          |  WHERE ((doc_id >= 0 AND doc_id % 10 = 0) OR doc_id < 0)
          |    AND NOT EXISTS (SELECT 1 FROM ex1 WHERE ex1.t = n.t)
          |    AND doc_id NOT IN (SELECT delta_id FROM m2)),
          |b2 AS (
          |  SELECT band, bkey, list_sort(list(doc_id)) AS ids
          |  FROM banded JOIN a2 USING (doc_id)
          |  GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 50),
          |c2 AS (
          |  SELECT DISTINCT pr.a AS id_a, pr.b AS id_b FROM (
          |    SELECT UNNEST(flatten(list_transform(range(1, CAST(len(ids) AS INTEGER)), i ->
          |      list_transform(ids[i+1:], x -> {'a': ids[i], 'b': x})))) AS pr
          |    FROM b2)),
          |d2 AS (
          |  SELECT id_a, id_b FROM (
          |    SELECT p.id_a, p.id_b,
          |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
          |    FROM c2 p JOIN sigs a ON p.id_a = a.doc_id JOIN sigs b ON p.id_b = b.doc_id)
          |  WHERE jaccard >= 0.5),
          |edges AS (SELECT id_a AS src, id_b AS dst FROM d2 UNION SELECT id_b, id_a FROM d2),
          |reach AS (
          |  SELECT src AS id, src AS r FROM edges
          |  UNION
          |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON reach.id = e.src WHERE reach.r < e.dst),
          |comp AS MATERIALIZED (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
          |csz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          |        FROM comp GROUP BY cluster_id)
          |SELECT a2.doc_id, doc.source,
          |  COALESCE(c.cluster_id, a2.doc_id) AS cluster_id,
          |  COALESCE(s.cluster_size, CAST(1 AS BIGINT)) AS cluster_size
          |FROM a2 JOIN alldocs doc USING (doc_id)
          |LEFT JOIN comp c USING (doc_id)
          |LEFT JOIN csz s ON c.cluster_id = s.cluster_id
          |ORDER BY a2.doc_id""".stripMargin),
    // from-scratch recompute of q127's THREE-day admission cascade (the
    // q121 oracle construction, one more day, no label tier): each day's
    // population = previous population + its admitted delta; exact gate =
    // normalized-text existence, near gate = capped-bucket candidates +
    // jaccard >= 0.5. Checkpointing is invisible to the oracle BY DESIGN —
    // refresh-from-read-back must equal the rebuild, so a lost/corrupted
    // round-trip diverges from this recompute. EVERY day's admitted set is
    // part of the answer (see the q127 scaladoc: a re-crawl fixture
    // self-heals, so the last day alone would mask a day-1 fold bug —
    // DuckDB-probed; with all three days emitted, every per-day per-tier
    // fold probe changes the output: baseline 41 rows; day-1 fold 55,
    // hash-only 47, minhash-only 45; day-2 fold 57, hash-only 46,
    // minhash-only 50).
    "q127_checkpointed_refresh" -> checkpointedRefreshOracleSql,
    // identical oracle to q127 BY CONSTRUCTION: q129 runs the same loop
    // with every checkpoint compacted to tombstone-only count sidecars
    // (expanded on read-back) — compaction is a pure storage optimization,
    // so any observable difference from the rebuild is a bug. A simulated
    // lost-tombstone corruption changes this output (DuckDB-probed; see
    // the q129 scaladoc).
    "q129_compacted_refresh" -> checkpointedRefreshOracleSql,
    // batch implementation of dropDuplicatesWithinWatermark's COMPLETE
    // state machine over the q122 arrival fixture (NOT a frozen id list),
    // with no arrivals-per-key cap: a recursive per-key fold over arrival
    // order. Per batch, watermark = max prior-batch ts - 1h; a row is
    // LATE (dropped, state untouched) if ts < its batch's watermark;
    // otherwise it is dropped iff the key holds SURVIVING state — state =
    // the most recent ADMITTED arrival's ts, surviving iff its expiry
    // (ts + 1h) >= that SAME current-batch watermark. (Eviction runs at
    // the previous batch's END with the watermark ADVANCED by that batch,
    // so there is no lag relative to an arrival's own watermark — the r9
    // model's "removal lags one batch" reading was indistinguishable on
    // the 4-batch fixture; the batch-6 duplicate disambiguated it against
    // the real executor.) Shared verbatim by q128: a mid-stream restart
    // must reproduce the single-lifetime answer exactly.
    "q122_streaming_event_dedup" -> eventDedupOracleSql,
    // identical oracle to q122 BY CONSTRUCTION: q128 replays the same
    // sequenced drops but kills the query after batch 4 and restarts from
    // the checkpoint — recovery is correct exactly when the output is
    // indistinguishable from one query lifetime
    "q128_stream_restart_recovery" -> eventDedupOracleSql,
    // per-arrival-batch ingest stats: drop k carries the event_id % 4 = k
    // slice, so any lost/duplicated/bled row shifts a count or an id range
    "q123_streaming_bronze_ingest" ->
      """SELECT CAST(event_id % 4 + 1 AS INTEGER) AS batch_seq,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  min(event_id) AS min_event_id,
        |  max(event_id) AS max_event_id
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // order-insensitive XOR fold of the q98-convention Sha60 over
    // "<id>:<normalized text>"; '<null>' marker keeps NULL text distinct
    // from '' in the digest
    "q126_corpus_manifest" ->
      raw"""SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(SUM(len(regexp_extract_all(text, '\S+'))), 0) AS BIGINT) AS n_tokens,
        |  CAST(bit_xor(CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':' ||
        |    COALESCE(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), '<null>')), 1, 15)) AS BIGINT)) AS BIGINT) AS content_digest
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // q111's epoch expansion with the seed-keyed Sha60 order key (the q98
    // rank-hash convention: first 15 hex chars of sha256 as BIGINT)
    "q124_curriculum_order" ->
      (curriculumKeyCtes + "\n" +
        "SELECT doc_id, epoch_idx, order_key FROM k ORDER BY epoch_idx, order_key, doc_id"),
    // q124's schedule rolled up per (epoch, top-3-bits-of-key shard):
    // counts, key ranges, and the order-insensitive XOR key digest — what
    // the read-back of q131's shard files must reproduce exactly
    "q131_training_shards" ->
      (curriculumKeyCtes + "\n" +
        """SELECT epoch_idx, CAST(order_key >> 57 AS INTEGER) AS shard,
          |  CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  min(order_key) AS min_key,
          |  max(order_key) AS max_key,
          |  CAST(bit_xor(order_key) AS BIGINT) AS key_digest
          |FROM k GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // per-source TVD over integer log2 token-count buckets between the
    // corpus and the simulated re-crawl (src0-6 truncate: long docs
    // vanish; src15-19 double their text; src7-14 untouched — probed:
    // tvd 0.36-0.50 vs exactly 0, both perturbation arms load-bearing).
    // All arithmetic integer until the single final division.
    "q132_distribution_drift" ->
      raw"""WITH older AS (SELECT source, text FROM documents),
        |newer AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 20 >= 15 THEN text || ' ' || text ELSE text END AS text
        |  FROM documents WHERE NOT (n_chars > 300 AND doc_id % 20 < 7)),
        |ho AS (
        |  SELECT source, length(bin(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT))) AS bucket,
        |    count(*) AS n_old
        |  FROM older GROUP BY 1, 2),
        |hn AS (
        |  SELECT source, length(bin(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT))) AS bucket,
        |    count(*) AS n_new
        |  FROM newer GROUP BY 1, 2),
        |h AS (
        |  SELECT COALESCE(ho.source, hn.source) AS source,
        |    COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
        |  FROM ho FULL OUTER JOIN hn ON ho.source = hn.source AND ho.bucket = hn.bucket),
        |tot AS (SELECT source, SUM(n_old) AS t_old, SUM(n_new) AS t_new FROM h GROUP BY 1)
        |SELECT h.source,
        |  CAST(MAX(t_old) AS BIGINT) AS n_old, CAST(MAX(t_new) AS BIGINT) AS n_new,
        |  CASE WHEN MAX(t_old) = 0 OR MAX(t_new) = 0 THEN 1.0
        |       ELSE CAST(SUM(ABS(n_new * t_old - n_old * t_new)) AS DOUBLE)
        |            / CAST(2 * MAX(t_old) * MAX(t_new) AS DOUBLE) END AS tvd,
        |  CASE WHEN MAX(t_old) = 0 OR MAX(t_new) = 0 THEN TRUE
        |       ELSE SUM(ABS(n_new * t_old - n_old * t_new)) * 1000
        |            > 100 * 2 * MAX(t_old) * MAX(t_new) END AS drifted
        |FROM h JOIN tot ON h.source = tot.source
        |GROUP BY h.source ORDER BY h.source""".stripMargin,
    // per-source corpus MinHash sketch over TRIGRAM shingles (per-doc
    // distinct), pairwise matches via the (component, value) equi-join —
    // the same hash family as the per-doc minhash oracles
    "q133_corpus_similarity" ->
      raw"""WITH t0 AS (
        |  SELECT source, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT source, unnest(list_distinct(CASE WHEN len(tk) < 3 THEN []
        |    ELSE list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END)) AS s
        |  FROM t0),
        |base AS (
        |  SELECT source, CAST(('0x' || substring(sha256(s), 1, 15)) AS BIGINT) % 2147483647 AS h
        |  FROM sh),
        |sk AS (
        |  SELECT source, j, MIN(((2*j + 1) * h + 104729 * (j + 1)) % 2147483647) AS m
        |  FROM base, (SELECT unnest(range(0, 16)) AS j) t
        |  GROUP BY source, j)
        |SELECT a.source AS corpus_a, b.source AS corpus_b,
        |  CAST(count(*) AS BIGINT) AS matching_components,
        |  CAST(count(*) AS DOUBLE) / 16.0 AS jaccard_est
        |FROM sk a JOIN sk b ON a.j = b.j AND a.m = b.m AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the MMR greedy replayed as a recursive CTE carrying the chosen set:
    // seed = most relevant candidate; each step picks argmax of
    // 0.5·simq − 0.5·max-sim-to-chosen over the unchosen pool (ties by
    // id) — identical fold arithmetic to the Spark side, so the selection
    // is bit-reproducible
    "q135_mmr_rerank" ->
      (s"""WITH RECURSIVE qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        |cand AS (
        |  SELECT vec_id AS id, embedding, ${cosineSql("embedding", "qv.q")} AS simq
        |  FROM embeddings, qv WHERE vec_id <> 0
        |  ORDER BY simq DESC, vec_id LIMIT 20),
        |pair AS (
        |  SELECT a.id AS a, b.id AS b, ${cosineSql("a.embedding", "b.embedding")} AS sim
        |  FROM cand a JOIN cand b ON a.id <> b.id),
        |sel AS (
        |  SELECT CAST(1 AS BIGINT) AS mmr_rank, c.id, c.simq, [c.id] AS chosen
        |  FROM (SELECT id, simq FROM cand ORDER BY simq DESC, id LIMIT 1) c
        |  UNION ALL
        |  SELECT s.mmr_rank + 1, n.id, n.simq, list_append(s.chosen, n.id)
        |  FROM sel s JOIN LATERAL (
        |    SELECT c.id, c.simq,
        |      0.5 * c.simq - 0.5 * (SELECT MAX(p.sim) FROM pair p
        |        WHERE p.a = c.id AND list_contains(s.chosen, p.b)) AS score
        |    FROM cand c
        |    WHERE NOT list_contains(s.chosen, c.id)
        |    ORDER BY score DESC, c.id
        |    LIMIT 1) n ON TRUE
        |  WHERE s.mmr_rank < 5)
        |SELECT mmr_rank, id AS vec_id, simq AS relevance FROM sel ORDER BY mmr_rank""".stripMargin),
    // q80's capped-bucket kNN pipeline with labels joined and the
    // different-label filter applied BEFORE ranking
    "q136_hard_negatives" ->
      ("WITH " + embSigCtes + ",\n" +
        s"""capped AS (
          |  SELECT vec_id, embedding, sig FROM (
          |    SELECT vec_id, embedding, sig, count(*) OVER (PARTITION BY sig) AS bs FROM esigs)
          |  WHERE bs <= 200),
          |apairs AS (
          |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |    ${cosineSql("a.embedding", "b.embedding")} AS cosine_sim
          |  FROM capped a JOIN capped b ON a.sig = b.sig AND a.vec_id < b.vec_id),
          |sym AS (
          |  SELECT id_a AS vec_id, id_b AS neighbor_id, cosine_sim FROM apairs
          |  UNION ALL
          |  SELECT id_b, id_a, cosine_sim FROM apairs),
          |lab AS (SELECT vec_id, label FROM embeddings),
          |neg AS (
          |  SELECT s.vec_id, la.label AS anchor_label, s.neighbor_id,
          |    lb.label AS neighbor_label, s.cosine_sim
          |  FROM sym s JOIN lab la ON s.vec_id = la.vec_id
          |  JOIN lab lb ON s.neighbor_id = lb.vec_id
          |  WHERE la.label <> lb.label)
          |SELECT vec_id, anchor_label, neg_rank, neighbor_id, neighbor_label, cosine_sim FROM (
          |  SELECT neg.*, CAST(row_number() OVER (
          |    PARTITION BY vec_id ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS neg_rank
          |  FROM neg)
          |WHERE neg_rank <= 3 ORDER BY vec_id, neg_rank""".stripMargin),
    "q137_bpe_merges" -> bpeOracleSql(10),
    "q140_bpe_compression" -> bpeCompressionOracleSql(10),
    "q141_bm25_retrieval" -> bm25OracleSql(Seq("dup", "join"), 15),
    "q142_bm25_refreshed_probe" -> bm25OracleSql(Seq("dup", "scan"), 12),
    // BM25 after index deletions: the oracle rebuilds from scratch over
    // the SURVIVING corpus — deletion ≡ rebuild is the certified claim
    "q152_bm25_after_deletes" ->
      bm25OracleSql(Seq("filter", "window"), 12, docFilter = "doc_id % 7 <> 3"),
    // PageRank: 5 unrolled integer fixed-point iterations over the
    // symmetrized exact-threshold pair graph
    "q154_pagerank_centrality" -> pageRankOracleSql(5),
    // ORC interchange: the oracle reads the ORIGINAL parquet — equality
    // certifies the ORC write+read round-trip the Spark side took
    "q155_orc_interchange" ->
      """SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS ship_month,
        |  COUNT(*) AS n_items,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // hopping windows: every event replicated into its 4 overlapping
    // epoch-aligned windows by integer microsecond arithmetic
    "q164_streaming_sliding_windows" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS m FROM events),
        |w AS (
        |  SELECT make_timestamp(m - m % 900000000 - k.k * 900000000) AS window_start,
        |    event_type
        |  FROM e, (SELECT unnest(generate_series(0, 3)) AS k) k)
        |SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n_events
        |FROM w GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // time-RANGE frame: trailing 1-hour per-user window, inclusive
    // bounds on both engines
    "q162_trailing_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_trailing_1h,
        |  max(value) OVER w AS max_value_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // ranking family: singleton peer groups via the custkey tiebreak make
    // percent_rank/cume_dist rational arithmetic engine-identical
    "q163_balance_ranks" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(ntile(4) OVER w AS BIGINT) AS balance_quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume_d
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    // naive canonical a<b<c three-way self-join — certifies the oriented
    // wedge algorithm finds every triangle exactly once
    "q168_triangle_clustering" -> triangleOracleSql,
    "q171_lsh_triangles" -> lshTriangleOracleSql,
    "q172_embedding_components" -> embeddingComponentsOracleSql,
    // DuckDB's NATIVE count(DISTINCT) OVER certifies the first-occurrence
    // flag + running-sum rewrite (Spark has no distinct window aggregate)
    "q169_running_distinct" ->
      """SELECT event_id, user_id,
        |  count(DISTINCT event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_distinct_types
        |FROM events ORDER BY event_id""".stripMargin,
    // EXCEPT ALL / INTERSECT ALL carry multiset multiplicity on both engines
    "q170_bag_set_ops" ->
      """SELECT 'surplus' AS op, o_custkey, CAST(count(*) AS BIGINT) AS multiplicity FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001) GROUP BY 1, 2
        |UNION ALL
        |SELECT 'matched' AS op, o_custkey, CAST(count(*) AS BIGINT) AS multiplicity FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001) GROUP BY 1, 2
        |ORDER BY op, o_custkey""".stripMargin,
    // SCD2 build: no-op suppression (lag), then version intervals (lead);
    // ordering pinned by (ts, event_id) on both engines. SHARED VERBATIM by
    // q198 (incremental scd2Apply must equal the full rebuild exactly).
    "q173_scd2_dimension" -> scd2BuildOracleSql,
    "q198_scd2_incremental_apply" -> scd2BuildOracleSql,
    "q210_streaming_scd2_maintenance" -> scd2BuildOracleSql,
    // point-in-time attribution: DuckDB's NATIVE ASOF LEFT JOIN against
    // the recomputed version table certifies the union+window formulation.
    // SHARED VERBATIM by q190 (the same join run through the stream path —
    // stream-static enrichment must equal the batch backfill exactly).
    "q174_point_in_time_join" -> pitJoinOracleSql,
    "q190_streaming_pit_enrichment" -> pitJoinOracleSql,
    // approx_percentile rank-error certification: exact quartiles hash
    // bit-for-bit (dyadic interpolation on integer cents); approx_ok is
    // Spark-computed, the oracle asserts TRUE
    "q189_approx_percentile_cert" ->
      """WITH v AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |q AS (
        |  SELECT event_type,
        |    quantile_cont(cents, 0.25) AS q25,
        |    quantile_cont(cents, 0.5) AS q50,
        |    quantile_cont(cents, 0.75) AS q75
        |  FROM v GROUP BY 1)
        |SELECT event_type, CAST(0.25 AS DOUBLE) AS pctile, q25 AS exact_value, TRUE AS approx_ok FROM q
        |UNION ALL
        |SELECT event_type, CAST(0.5 AS DOUBLE), q50, TRUE FROM q
        |UNION ALL
        |SELECT event_type, CAST(0.75 AS DOUBLE), q75, TRUE FROM q
        |ORDER BY event_type, pctile""".stripMargin,
    // dwell = exact integer-µs interval lengths over the recomputed SCD2
    // version table; avg is the terminal BIGINT/BIGINT double
    "q191_state_dwell" ->
      ("WITH " + scd2SuppressionCtes + ",\n" +
      """ver AS (
        |  SELECT user_id, state, ts AS effective_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
        |  FROM v),
        |d AS (
        |  SELECT state, epoch_us(effective_to) - epoch_us(effective_from) AS dwell_us
        |  FROM ver WHERE effective_to IS NOT NULL)
        |SELECT state, COUNT(*) AS n_closed_versions,
        |  CAST(SUM(dwell_us) AS BIGINT) AS total_dwell_us,
        |  CAST(CAST(SUM(dwell_us) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_dwell_us
        |FROM d GROUP BY state ORDER BY state""".stripMargin),
    // the unpivoted roundtrip must equal the DIRECT long-form aggregate
    "q192_pivot_roundtrip" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS total_price
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // LISTAGG with pinned order: DuckDB's native ordered string_agg vs
    // Spark's array_sort(collect_list) composition
    "q193_ordered_string_agg" ->
      """SELECT r_name, COUNT(*) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    // YoY: calendar-offset lag with an explicit year-1 guard (a gap year
    // yields null growth); exact-decimal deltas parse to double via the
    // VARCHAR convention
    "q196_yoy_growth" ->
      """WITH y AS (
        |  SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        |  FROM orders GROUP BY 1, 2),
        |l AS (
        |  SELECT y.*,
        |    lag(order_year) OVER w AS prev_year,
        |    lag(rev) OVER w AS prev_rev
        |  FROM y WINDOW w AS (PARTITION BY o_orderpriority ORDER BY order_year))
        |SELECT o_orderpriority, order_year,
        |  CAST(CAST(CAST(rev AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue,
        |  CASE WHEN prev_year = order_year - 1
        |    THEN CAST(CAST(CAST(rev - prev_rev AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) END AS yoy_delta,
        |  CASE WHEN prev_year = order_year - 1
        |    THEN CAST(CAST(CAST(rev - prev_rev AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
        |         / CAST(CAST(CAST(prev_rev AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) END AS yoy_growth
        |FROM l ORDER BY o_orderpriority, order_year""".stripMargin,
    // DISC quantiles: both engines compute the rank target with the SAME
    // integer formula — no double 0.9 near an integer boundary
    "q194_discrete_quantiles" ->
      """WITH v AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events),
        |r AS (
        |  SELECT event_type, value_cents,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY value_cents, event_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM v)
        |SELECT event_type, pctile, value_cents
        |FROM r JOIN (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)) ps(pctile, num, den)
        |  ON rn = (num * n + den - 1) // den
        |ORDER BY event_type, pctile""".stripMargin,
    // mode with the tie rule PINNED (count desc, value asc) — DuckDB's
    // native mode() leaves ties unspecified
    "q195_value_mode" ->
      """WITH f AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS value_cents,
        |    COUNT(*) AS n_occurrences
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY event_type
        |    ORDER BY n_occurrences DESC, value_cents ASC) AS rn
        |  FROM f)
        |SELECT event_type, value_cents AS mode_cents, n_occurrences
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // approx-MAD swap-in certification: exact flag counts hash-match the
    // DuckDB recomputation; the sketch rank-error and flag-set-difference
    // verdicts are Spark-computed, oracle-asserted TRUE (the q189
    // convention — DuckDB cannot replay Spark's sketch)
    "q197_mad_outliers_approx" ->
      """WITH v AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med FROM v GROUP BY 1),
        |d AS (
        |  SELECT v.event_type, abs(CAST(cents AS DOUBLE) - med) AS ad
        |  FROM v JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN ad > 3 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_flags_exact,
        |  TRUE AS med_rank_ok, TRUE AS mad_rank_ok, TRUE AS flags_match_ok
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY event_type""".stripMargin,
    // REAL PNG decode certification: the oracle predicts width/height and
    // per-channel pixel SUMS arithmetically from doc_id (closed-form fixture
    // pixels) — a hash match proves javax.imageio's encode → decode
    // roundtrip returned every pixel exactly
    "q199_image_decode" ->
      """WITH ids AS (SELECT doc_id AS d FROM documents WHERE doc_id % 3 = 0),
        |dims AS (SELECT d, 8 + d % 9 AS w, 8 + d % 7 AS h FROM ids)
        |SELECT d AS media_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(list_sum(flatten(list_transform(generate_series(0, CAST(h - 1 AS INTEGER)), y ->
        |    list_transform(generate_series(0, CAST(w - 1 AS INTEGER)), x -> (d + x + y) % 256)))) AS BIGINT) AS r_sum,
        |  CAST(list_sum(flatten(list_transform(generate_series(0, CAST(h - 1 AS INTEGER)), y ->
        |    list_transform(generate_series(0, CAST(w - 1 AS INTEGER)), x -> (2 * d + 3 * x + 5 * y) % 256)))) AS BIGINT) AS g_sum,
        |  CAST(list_sum(flatten(list_transform(generate_series(0, CAST(h - 1 AS INTEGER)), y ->
        |    list_transform(generate_series(0, CAST(w - 1 AS INTEGER)), x -> (7 * d + 11 * x + 13 * y) % 256)))) AS BIGINT) AS b_sum
        |FROM dims ORDER BY media_id""".stripMargin,
    // k-core by unrolled peeling (fixpoint: any depth ≥ the true peel depth
    // is exact; Spark pins maxIter to the same unroll and throws past it)
    "q200_lsh_kcore" -> lshKCoreOracleSql,
    // ordered funnel: chained earliest-at-or-after CTEs; pct is a terminal
    // BIGINT/BIGINT double division on both engines
    "q201_funnel" ->
      ("WITH " + funnelReachCtes + ",\n" +
      """n AS (SELECT
        |  (SELECT count(*) FROM s0) AS n0, (SELECT count(*) FROM s1) AS n1,
        |  (SELECT count(*) FROM s2) AS n2, (SELECT count(*) FROM s3) AS n3)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step_index, 'signup' AS step_name,
        |    n0 AS n_users, CAST(n0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS pct_of_first FROM n
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'view', n1,
        |    CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE) FROM n
        |  UNION ALL SELECT CAST(3 AS BIGINT), 'click', n2,
        |    CAST(n2 AS DOUBLE) / CAST(n0 AS DOUBLE) FROM n
        |  UNION ALL SELECT CAST(4 AS BIGINT), 'purchase', n3,
        |    CAST(n3 AS DOUBLE) / CAST(n0 AS DOUBLE) FROM n)
        |ORDER BY step_index""".stripMargin),
    // exact distinct hash-matched; the HLL++ ±10% verdict is Spark-computed,
    // oracle-asserted TRUE (the q189/q197 convention)
    "q202_approx_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  TRUE AS approx_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // daily retention triangle: first-event cohort day, distinct active
    // (user, offset) cells, pct as terminal double division
    "q203_retention_matrix" ->
      """WITH p AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS pd
        |  FROM events),
        |c AS (SELECT user_id, min(pd) AS cohort FROM p GROUP BY 1),
        |m AS (SELECT DISTINCT p.user_id, c.cohort, p.pd - c.cohort AS offs
        |      FROM p JOIN c USING (user_id)),
        |cells AS (SELECT cohort, offs, CAST(count(*) AS BIGINT) AS n_active
        |          FROM m GROUP BY 1, 2),
        |sz AS (SELECT cohort, n_active AS cohort_size FROM cells WHERE offs = 0)
        |SELECT cohort AS cohort_period, offs AS period_offset, n_active,
        |  cohort_size,
        |  CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention_pct
        |FROM cells JOIN sz USING (cohort) ORDER BY 1, 2""".stripMargin,
    // forward as-of: min next-purchase ts per error, then the smallest
    // event_id among purchases AT that ts (the Spark rightOrdCols pin)
    "q204_forward_asof" ->
      """WITH err AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |pur AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |nx AS (
        |  SELECT e.event_id AS eid, min(p.ts) AS pts
        |  FROM err e JOIN pur p ON e.user_id = p.user_id AND p.ts >= e.ts
        |  GROUP BY 1),
        |pick AS (
        |  SELECT n.eid, n.pts, min(p.event_id) AS pid
        |  FROM nx n
        |  JOIN err e ON e.event_id = n.eid
        |  JOIN pur p ON p.user_id = e.user_id AND p.ts = n.pts
        |  GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts,
        |  k.pid AS next_purchase_id, k.pts AS next_purchase_ts,
        |  epoch_us(k.pts) - epoch_us(e.ts) AS us_to_purchase,
        |  p2.cents AS purchase_cents
        |FROM err e
        |LEFT JOIN pick k ON k.eid = e.event_id
        |LEFT JOIN pur p2 ON p2.event_id = k.pid
        |ORDER BY e.event_id""".stripMargin,
    // batch session windows vs gap-islands: a gap of EXACTLY the 6-hour
    // threshold starts a new session on both engines (Spark session_window
    // merges only on strict overlap → the flag is diff >= gap, not >)
    "q205_session_windows" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 21600000000
        |    THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |                  ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // exact trimmed mean: identical integer rank/trim formulas (n div 10),
    // ties pinned by event_id; one terminal BIGINT/BIGINT double division
    "q206_trimmed_mean" ->
      """WITH v AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT event_type, cents,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM v)
        |SELECT event_type,
        |  max(n) AS n_total,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(cents) AS BIGINT) AS trimmed_sum_cents,
        |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE) AS trimmed_mean_cents
        |FROM r WHERE rn > n // 10 AND rn <= n - n // 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // rolling distinct: brute-force day-stab recomputation — quadratic in
    // DuckDB, which is exactly the shape the Spark operator avoids
    "q207_rolling_active_users" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
        |  FROM events),
        |days AS (
        |  SELECT CAST(unnest(generate_series(0, (SELECT max(d) FROM a))) AS BIGINT) AS day)
        |SELECT day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
        |FROM days LEFT JOIN a ON a.d BETWEEN day - 6 AND day
        |GROUP BY day ORDER BY day""".stripMargin,
    // exact Mann–Whitney: doubled tie-averaged ranks keep everything BIGINT;
    // identical rank/U algebra on both engines, no float in the statistic
    "q208_rank_sum_test" ->
      """WITH v AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |pv AS (
        |  SELECT cents,
        |    CAST(count(*) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cp
        |  FROM v GROUP BY 1),
        |r AS (
        |  SELECT cents, c, cp,
        |    CAST(coalesce(SUM(c) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS smaller
        |  FROM pv),
        |agg AS (
        |  SELECT CAST(SUM(cp) AS BIGINT) AS n_purchase,
        |    CAST(SUM(c - cp) AS BIGINT) AS n_click,
        |    CAST(SUM(cp * (2 * (smaller + 1) + c - 1)) AS BIGINT) AS two_r1
        |  FROM r)
        |SELECT n_purchase, n_click, two_r1,
        |  two_r1 - n_purchase * (n_purchase + 1) AS two_u1,
        |  n_purchase * n_click AS two_mean_u,
        |  (two_r1 - n_purchase * (n_purchase + 1)) > n_purchase * n_click
        |    AS purchase_shifted_high
        |FROM agg""".stripMargin,
    // equi-depth histogram: identical integer bin formula ((rn-1)*8 div n),
    // ties pinned by event_id; boundaries are exact integer cents
    "q209_equidepth_histogram" ->
      """WITH v AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT event_type, cents,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM v)
        |SELECT event_type, ((rn - 1) * 8) // n AS bin,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(cents) AS lo_cents, max(cents) AS hi_cents
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // keyed interval-overlap join: SCD2 versions x 6h sessions per user,
    // half-open on both sides (session closed end promoted by +1 us);
    // exact integer-us overlap lengths
    "q211_interval_overlap_join" ->
      ("WITH " + scd2SuppressionCtes + ",\n" +
      """ver AS (
        |  SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
        |    state, ts AS effective_from, lead(ts) OVER w AS effective_to
        |  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 21600000000
        |    THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |                  ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m),
        |sess AS (
        |  SELECT user_id, min(ts) AS session_start,
        |    max(ts) + INTERVAL 1 microsecond AS send_excl,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM s GROUP BY user_id, sid)
        |SELECT ver.user_id, ver.version, ver.state,
        |  sess.session_start, sess.n_events,
        |  epoch_us(least(coalesce(ver.effective_to, TIMESTAMP '9999-01-01'),
        |                 sess.send_excl)) -
        |    epoch_us(greatest(ver.effective_from, sess.session_start)) AS overlap_us
        |FROM ver JOIN sess ON ver.user_id = sess.user_id
        |  AND ver.effective_from < sess.send_excl
        |  AND (ver.effective_to IS NULL OR sess.session_start < ver.effective_to)
        |ORDER BY 1, 2, 4""".stripMargin),
    // feature scaling: exact integer min/max + dyadic quartiles on integer
    // cents -> each scaled double is one IEEE division of exact numbers;
    // degenerate groups null, never Inf/NaN
    "q212_feature_scaling" ->
      """WITH v AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |st AS (
        |  SELECT event_type, min(cents) AS mn, max(cents) AS mx,
        |    quantile_cont(cents, 0.25) AS q1,
        |    quantile_cont(cents, 0.5) AS med,
        |    quantile_cont(cents, 0.75) AS q3
        |  FROM v GROUP BY 1)
        |SELECT event_id, v.event_type, cents,
        |  CASE WHEN mx > mn THEN
        |    CAST(cents - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE) END AS minmax_scaled,
        |  CASE WHEN q3 > q1 THEN
        |    (CAST(cents AS DOUBLE) - med) / (q3 - q1) END AS robust_scaled
        |FROM v JOIN st USING (event_type)
        |ORDER BY event_id""".stripMargin,
    // snapshot diff: two as-of interval filters over the recomputed SCD2
    // version table, FULL JOIN, classify; REMOVED is structurally
    // impossible for an SCD2 build and the oracle would expose one
    "q213_snapshot_diff" ->
      ("WITH " + scd2SuppressionCtes + ",\n" +
      """ver AS (
        |  SELECT user_id, state, ts AS effective_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
        |  FROM v),
        |b AS (SELECT user_id, state AS state_before FROM ver
        |      WHERE effective_from <= TIMESTAMP '2024-01-02 00:00:00'
        |        AND (effective_to IS NULL OR effective_to > TIMESTAMP '2024-01-02 00:00:00')),
        |a AS (SELECT user_id, state AS state_after FROM ver
        |      WHERE effective_from <= TIMESTAMP '2024-01-20 00:00:00'
        |        AND (effective_to IS NULL OR effective_to > TIMESTAMP '2024-01-20 00:00:00'))
        |SELECT coalesce(b.user_id, a.user_id) AS user_id,
        |  state_before, state_after,
        |  CASE WHEN state_before IS NULL THEN 'ADDED'
        |       WHEN state_after IS NULL THEN 'REMOVED'
        |       WHEN state_before <> state_after THEN 'CHANGED'
        |       ELSE 'UNCHANGED' END AS op
        |FROM b FULL JOIN a ON b.user_id = a.user_id
        |ORDER BY 1""".stripMargin),
    // real resize chain: the oracle names every resized pixel via the SAME
    // integer-division sampling formula (srcX = x'*w // 8) and sums channels
    // arithmetically -- a hash match proves decode -> resample -> encode ->
    // decode returned every pixel exactly
    "q214_image_resize" ->
      """WITH ids AS (SELECT doc_id AS d FROM documents WHERE doc_id % 3 = 0),
        |dims AS (SELECT d, 8 + d % 9 AS w, 8 + d % 7 AS h FROM ids),
        |px AS (
        |  SELECT d,
        |    flatten(list_transform(generate_series(0, 11), y2 ->
        |      list_transform(generate_series(0, 11), x2 ->
        |        [(d + (x2 * w) // 12 + (y2 * h) // 12) % 256,
        |         (2 * d + 3 * ((x2 * w) // 12) + 5 * ((y2 * h) // 12)) % 256,
        |         (7 * d + 11 * ((x2 * w) // 12) + 13 * ((y2 * h) // 12)) % 256]))) AS ps
        |  FROM dims)
        |SELECT d AS media_id,
        |  CAST(12 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
        |  CAST(list_sum(list_transform(ps, p -> p[1])) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(ps, p -> p[2])) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(ps, p -> p[3])) AS BIGINT) AS b_sum
        |FROM px ORDER BY media_id""".stripMargin,
    // funnel latency: same chained reach CTEs as q201; exact integer-us
    // deltas, dyadic quartiles (exact 0.25-multiples on integers)
    "q215_funnel_latency" ->
      ("WITH " + funnelReachCtes + ",\n" +
      """lat AS (
        |  SELECT epoch_us(s3.t) - epoch_us(s0.t) AS us_to_convert
        |  FROM s3 JOIN s0 ON s3.u = s0.u)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  min(us_to_convert) AS min_us,
        |  quantile_cont(us_to_convert, 0.25) AS q1_us,
        |  quantile_cont(us_to_convert, 0.5) AS med_us,
        |  quantile_cont(us_to_convert, 0.75) AS q3_us,
        |  max(us_to_convert) AS max_us
        |FROM lat""".stripMargin),
    // skyline: same dominance algebra recomputed independently (per-x min,
    // suffix-min over quantity DESC, strict frontier test); all-integer
    "q216_skyline" ->
      """WITH p AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |  FROM lineitem),
        |pairs AS (
        |  SELECT qty, price_cents, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM p GROUP BY 1, 2),
        |perx AS (SELECT qty, min(price_cents) AS miny FROM pairs GROUP BY 1),
        |f AS (
        |  SELECT qty, miny,
        |    min(miny) OVER (ORDER BY qty DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_right
        |  FROM perx)
        |SELECT pairs.qty AS qty, pairs.price_cents, pairs.n_rows
        |FROM pairs JOIN f ON pairs.qty = f.qty AND pairs.price_cents = f.miny
        |WHERE best_right IS NULL OR f.miny < best_right
        |ORDER BY 1""".stripMargin,
    // largest-remainder proration: identical integer div/mod algebra and
    // the same (remainder desc, linenumber) penny ranking on both engines.
    // Integer division is PINNED rather than spelled `//`: base is
    // (t*q - (t*q % s)) / s — the numerator is exactly divisible, both it
    // and the quotient are far below 2^53, so the one float division is
    // IEEE-exact and the BIGINT cast lossless on every DuckDB version;
    // `//`'s flooring behavior never enters (round-13 advice: q217 was the
    // one driver-red row, and `//` was the only engine-version-sensitive
    // operator in its algebra)
    "q217_penny_proration" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |o AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS target
        |  FROM orders),
        |j AS (
        |  SELECT l_orderkey, l_linenumber, qty, target,
        |    SUM(qty) OVER (PARTITION BY l_orderkey) AS sumqty
        |  FROM li JOIN o ON l_orderkey = o_orderkey),
        |b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST((target * qty - ((target * qty) % sumqty)) / sumqty AS BIGINT) AS base,
        |    (target * qty) % sumqty AS rem,
        |    target - SUM(CAST((target * qty - ((target * qty) % sumqty)) / sumqty AS BIGINT))
        |      OVER (PARTITION BY l_orderkey) AS leftover
        |  FROM j),
        |r AS (
        |  SELECT l_orderkey, l_linenumber, base, leftover,
        |    CAST(row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY rem DESC, l_linenumber) AS BIGINT) AS rn
        |  FROM b)
        |SELECT l_orderkey, l_linenumber,
        |  base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS alloc_cents
        |FROM r ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // weighted median: per-(flag, price) weight aggregate, per-flag
    // cumulative weights, min price with 2*cum >= total -- all integer
    "q218_weighted_median" ->
      """WITH p AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, price_cents, w,
        |    CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS total
        |  FROM p)
        |SELECT l_returnflag, max(total) AS total_qty,
        |  min(price_cents) AS weighted_median_cents
        |FROM c WHERE cum * 2 >= total GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact Gini: ranks tie-pinned by custkey; numerator/denominator in
    // HUGEINT, parsed to double via the q187 VARCHAR convention
    "q219_revenue_gini" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT c_mktsegment, c_custkey, rev
        |  FROM rev JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT c_mktsegment, rev,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY rev, c_custkey) AS BIGINT) AS i,
        |    CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
        |  FROM j),
        |a AS (
        |  SELECT c_mktsegment, max(n) AS n_customers,
        |    SUM(CAST(rev AS HUGEINT)) AS sx,
        |    SUM(CAST(i * rev AS HUGEINT)) AS six
        |  FROM r GROUP BY 1)
        |SELECT c_mktsegment, n_customers,
        |  CAST(CAST(2 * six - (n_customers + 1) * sx AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(CAST(n_customers AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) AS gini
        |FROM a ORDER BY 1""".stripMargin,
    // rank shift: identical per-year exact-revenue ranks (ties pinned by
    // custkey), inner join across years, top-20 climbers
    "q220_rank_shift" ->
      """WITH rev AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_custkey,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders
        |  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT yr, o_custkey,
        |    CAST(row_number() OVER (PARTITION BY yr
        |      ORDER BY rev DESC, o_custkey) AS BIGINT) AS rnk
        |  FROM rev)
        |SELECT a.o_custkey, a.rnk AS rank_1996, b.rnk AS rank_1997,
        |  a.rnk - b.rnk AS rank_gain
        |FROM r a JOIN r b ON a.o_custkey = b.o_custkey
        |WHERE a.yr = 1996 AND b.yr = 1997
        |ORDER BY rank_gain DESC, a.o_custkey LIMIT 20""".stripMargin,
    // c-TF-IDF cluster labels: exact BIGINT doc-frequency counts, ONE
    // double division per lift, ties pinned by term; shares the q52
    // cluster CTE chain verbatim
    "q221_cluster_labels" ->
      (dupClusterCtes +
        """, lblt AS (
          |  SELECT c.cluster_id, d.doc_id,
          |    unnest(list_distinct(string_split(regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g'), ' '))) AS term
          |  FROM documents d JOIN comp c USING (doc_id)),
          |ct AS (SELECT cluster_id, term, CAST(count(*) AS BIGINT) AS n_ct
          |       FROM lblt GROUP BY 1, 2),
          |nt AS (SELECT term, CAST(count(*) AS BIGINT) AS n_t FROM lblt GROUP BY 1),
          |nc AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_c FROM comp GROUP BY 1),
          |ntot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM comp),
          |scored AS (
          |  SELECT ct.cluster_id, ct.term, ct.n_ct,
          |    CAST(ct.n_ct * n_total AS DOUBLE) /
          |      CAST(nc.n_c * nt.n_t AS DOUBLE) AS lift
          |  FROM ct JOIN nt USING (term) JOIN nc USING (cluster_id), ntot
          |  WHERE ct.n_ct >= 2),
          |r AS (
          |  SELECT cluster_id, term, n_ct, lift,
          |    CAST(row_number() OVER (PARTITION BY cluster_id
          |      ORDER BY lift DESC, term) AS BIGINT) AS term_rank
          |  FROM scored)
          |SELECT cluster_id, term_rank, term, n_ct AS n_docs_with_term, lift
          |FROM r WHERE term_rank <= 3
          |ORDER BY cluster_id, term_rank""".stripMargin),
    // spike detection: 280*n > 41*sum7 cross-multiplied (no float ratio;
    // the 2.5% margin fires BOTH branches at every gate scale — probed);
    // RANGE frame over day values, partial trailing windows verdict null
    "q222_activity_spikes" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT day, n_events,
        |    CAST(SUM(n_events) OVER w AS BIGINT) AS sum7,
        |    CAST(COUNT(n_events) OVER w AS BIGINT) AS n7
        |  FROM daily
        |  WINDOW w AS (ORDER BY day RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT day, n_events,
        |  CASE WHEN n7 = 7 THEN sum7 END AS trailing7_sum,
        |  CASE WHEN n7 = 7 THEN n_events * 280 > sum7 * 41 END AS is_spike
        |FROM t ORDER BY day""".stripMargin,
    // mixed-codec decode: every cell closed-form from doc_id — dims from
    // the pattern formulas, PNG bit-exact, JPEG within the probed bound
    // (exact_pixels projected out for JPEG: per-row codec artifact)
    "q223_jpeg_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime_type,
        |  CAST(8 + doc_id % 9 AS BIGINT) AS width,
        |  CAST(8 + doc_id % 7 AS BIGINT) AS height,
        |  TRUE AS decode_ok,
        |  CASE WHEN doc_id % 3 = 0 THEN TRUE END AS png_exact,
        |  TRUE AS err_within_bound
        |FROM documents WHERE doc_id % 3 IN (0, 1)
        |ORDER BY media_id""".stripMargin,
    // correlated scalar subqueries: the same SQL text modulo the view name
    // — DuckDB decorrelates too, so the row certifies the rewrite, not
    // per-row re-execution
    "q237_correlated_subquery" ->
      """WITH v AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o.o_orderkey, o.cents,
        |  (SELECT CAST(count(*) AS BIGINT) FROM v i
        |   WHERE i.o_custkey = o.o_custkey) AS n_cust_orders,
        |  (SELECT CAST(sum(cents) AS BIGINT) FROM v i
        |   WHERE i.o_custkey = o.o_custkey) AS cust_total_cents
        |FROM v o
        |WHERE o.cents * 2 * (SELECT count(*) FROM v i
        |                     WHERE i.o_custkey = o.o_custkey)
        |    > 3 * (SELECT sum(cents) FROM v i
        |           WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,
    // cross-document repeated substrings: 8-gram Sha60 anchors (identical
    // 60-bit sha256-prefix hash both engines), capped buckets, diagonal
    // islands — maximal shared spans fall out of the run groupBy exactly
    "q238_shared_spans" ->
      ("WITH " + spanCtes + "\n" +
        """SELECT id_a, pos_a, id_b, pos_b, span_tokens
          |FROM spans ORDER BY id_a, id_b, pos_a, pos_b""".stripMargin),
    // span coverage: intervals from both pair sides, merged by the
    // sort + running-max island pass; exact integer union length, one
    // double division per doc
    // coverage oracle is the POSITION-SET definition (count of distinct
    // covered token positions), not a mirror of Spark's running-max
    // interval union — a genuinely independent algorithm, and immune to
    // the tie-heavy-window nondeterminism observed in DuckDB at sf1
    // (identical intervals repeated dozens of times occasionally made the
    // windowed union double-count one document per run)
    "q241_span_coverage" ->
      ("WITH " + spanCtes + ",\n" +
        """iv AS (
          |  SELECT id_a AS doc_id, pos_a AS s, pos_a + span_tokens AS e FROM spans
          |  UNION ALL
          |  SELECT id_b, pos_b, pos_b + span_tokens FROM spans),
          |cov AS (
          |  SELECT doc_id, CAST(COUNT(DISTINCT p) AS BIGINT) AS covered FROM (
          |    SELECT doc_id, unnest(generate_series(s, e - 1)) AS p FROM iv)
          |  GROUP BY 1),
          |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM toksrc)
          |SELECT nt.doc_id, nt.n_tokens,
          |  COALESCE(cov.covered, CAST(0 AS BIGINT)) AS covered_tokens,
          |  CAST(COALESCE(cov.covered, CAST(0 AS BIGINT)) AS DOUBLE)
          |    / CAST(nt.n_tokens AS DOUBLE) AS dup_fraction
          |FROM nt LEFT JOIN cov ON nt.doc_id = cov.doc_id
          |ORDER BY nt.doc_id""".stripMargin),
    // projected existence flags: EXISTS/IN in the SELECT list — the same
    // text runs on both engines; Catalyst's side is plan-audited to
    // ExistenceJoin (boolean-attaching semi-join, no per-row subquery)
    "q245_existence_flags" ->
      """SELECT c.c_custkey,
        |  EXISTS (SELECT 1 FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND o.o_orderstatus = 'O') AS has_open,
        |  EXISTS (SELECT 1 FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND o.o_orderpriority = '1-URGENT') AS has_urgent,
        |  c.c_custkey IN (SELECT o_custkey FROM orders
        |                  WHERE o_totalprice > 350000) AS has_big
        |FROM customer c
        |ORDER BY c.c_custkey""".stripMargin,
    // SQL-text PIVOT: the oracle is the CASE-per-column aggregation the
    // clause desugars to; NULLIF keeps the absent-combo convention
    // identical (Spark pivot yields NULL for absent combos, never 0)
    "q246_sql_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN cents END) AS BIGINT) AS open_total_cents,
        |  NULLIF(CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT), 0) AS open_n,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN cents END) AS BIGINT) AS filled_total_cents,
        |  NULLIF(CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT), 0) AS filled_n,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN cents END) AS BIGINT) AS pending_total_cents,
        |  NULLIF(CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT), 0) AS pending_n
        |FROM (SELECT o_orderpriority, o_orderstatus,
        |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // spans through the stream: the batch q243 oracle verbatim — span
    // detection distributes over the delta, so stream must equal batch
    "q249_streaming_spans" -> q243SpanOracle,
    // Spark-native WITH RECURSIVE: the q27 oracle verbatim — the rCTE
    // text, the iterative driver loop, and DuckDB pinned to one answer
    "q250_sql_recursive" -> q27TraversalOracle,
    // span-index fold: the q243 oracle VERBATIM — the true-count sidecar
    // makes the two-generation fold equal the from-scratch rebuild
    "q254_span_index_fold" -> q243SpanOracle,
    // streaming span admission: delta-side coverage as COUNT(DISTINCT
    // covered position) — independent of Spark's interval union — and
    // the verdict as the same integer cross-multiply
    "q253_span_admission" ->
      ("WITH " + spanGramCtes + ",\n" +
        raw"""cg AS (SELECT * FROM grams WHERE doc_id % 10 <> 0),
           |dg AS (SELECT * FROM grams WHERE doc_id % 10 = 0),
           |okh AS (SELECT h FROM cg GROUP BY h HAVING count(*) <= 50),
           |anch AS (
           |  SELECT d.doc_id AS did, d.pos AS dpos, c.doc_id AS cid, c.pos AS cpos
           |  FROM dg d JOIN cg c ON d.h = c.h JOIN okh ON okh.h = d.h),
           |runs AS (
           |  SELECT did, cid, dpos, dpos - cpos AS diag,
           |    dpos - row_number() OVER (PARTITION BY did, cid, dpos - cpos ORDER BY dpos) AS run
           |  FROM anch),
           |spans AS (
           |  SELECT did, MIN(dpos) AS s, MIN(dpos) + COUNT(*) + 7 AS e
           |  FROM runs GROUP BY did, cid, diag, run),
           |cov AS (
           |  SELECT did, CAST(COUNT(DISTINCT p) AS BIGINT) AS covered FROM (
           |    SELECT did, unnest(generate_series(s, e - 1)) AS p FROM spans)
           |  GROUP BY did),
           |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM toksrc WHERE doc_id % 10 = 0)
           |SELECT nt.doc_id, nt.n_tokens,
           |  COALESCE(cov.covered, CAST(0 AS BIGINT)) AS covered_tokens,
           |  CAST(COALESCE(cov.covered, CAST(0 AS BIGINT)) AS DOUBLE)
           |    / CAST(nt.n_tokens AS DOUBLE) AS dup_fraction,
           |  COALESCE(cov.covered, CAST(0 AS BIGINT)) * 100 < nt.n_tokens * 50 AS admitted
           |FROM nt LEFT JOIN cov ON nt.doc_id = cov.did
           |ORDER BY nt.doc_id""".stripMargin),
    // MJPEG-in-AVI: every verdict named in closed form — header stats
    // exact, within_bound true for solid ramps (probed max deviation 1 at
    // q0.95), false for the over-compressed checkerboards (probed min 34
    // at q0.25 vs the 16 bound), null stats for the non-AVI rows
    "q260_mjpeg_video" ->
      raw"""SELECT doc_id AS media_id,
           |  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(3 + doc_id % 5 AS BIGINT) END AS n_frames,
           |  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(8 + ((doc_id % 9) // 3) * 4 AS BIGINT) END AS width,
           |  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(6 + (doc_id % 2) * 2 AS BIGINT) END AS height,
           |  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(10 AS BIGINT) END AS fps,
           |  doc_id % 17 <> 0 AS decode_ok,
           |  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE doc_id % 13 <> 0 END AS within_bound
           |FROM documents WHERE doc_id % 3 = 2
           |ORDER BY media_id""".stripMargin,
    // UNION-distinct rCTE migration contract: the oracle runs the user's
    // ORIGINAL no-depth-cap UNION form — DuckDB terminates it at the
    // dedup fixpoint on the cyclic graph — while the Spark side runs the
    // documented UNION ALL + cap + DISTINCT rewrite (Spark 4.1 rejects
    // the UNION form; RecursiveSqlSpec pins the exact error condition)
    "q258_sql_recursive_fixpoint" ->
      """WITH RECURSIVE edges AS (
        |  SELECT DISTINCT user_id % 16 AS src, (user_id % 16 * 7 + 3) % 16 AS dst
        |  FROM events),
        |seeds AS (
        |  SELECT DISTINCT user_id % 16 AS seed FROM events WHERE user_id % 3 = 0),
        |walk AS (
        |  SELECT seed, seed AS node FROM seeds
        |  UNION
        |  SELECT w.seed, e.dst FROM walk w JOIN edges e ON w.node = e.src)
        |SELECT seed, node FROM walk ORDER BY seed, node""".stripMargin,
    // image perceptual near-dup: the WHOLE pixel→cells→bits→bands→cap→
    // Hamming pipeline replayed from the id arithmetic (closed-form cell
    // levels; xor steps are DuckDB xor()); banding and bucket cap are
    // replicated, not idealized, so the LSH recall contract is certified
    "q259_image_phash_dedup" ->
      ("WITH " + dhashBitsCtes + ",\n" +
      raw"""okv AS (SELECT band, bv FROM bandvals GROUP BY band, bv HAVING count(*) <= 200),
           |cand AS (
           |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
           |  FROM bandvals a
           |  JOIN okv ON a.band = okv.band AND a.bv = okv.bv
           |  JOIN bandvals b ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id),
           |ham AS (
           |  SELECT id_a, id_b, CAST(SUM(ABS(x.b - y.b)) AS BIGINT) AS hamming
           |  FROM cand JOIN bits x ON x.media_id = id_a
           |  JOIN bits y ON y.media_id = id_b AND y.m = x.m
           |  GROUP BY id_a, id_b)
           |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 8
           |ORDER BY id_a, id_b""".stripMargin),
    // incremental image near-dup: delta (re-crawled copies) probes the
    // CORPUS-side capped band index — same bit machinery, asymmetric join
    "q261_image_incremental_dedup" ->
      ("WITH " + dhashBitsCtes + ",\n" +
      raw"""cb AS (SELECT * FROM bandvals WHERE media_id >= 0),
           |db AS (SELECT * FROM bandvals WHERE media_id < 0),
           |okv AS (SELECT band, bv FROM cb GROUP BY band, bv HAVING count(*) <= 200),
           |cand AS (
           |  SELECT DISTINCT d.media_id AS delta_id, c.media_id AS corpus_id
           |  FROM db d JOIN okv ON d.band = okv.band AND d.bv = okv.bv
           |  JOIN cb c ON c.band = d.band AND c.bv = d.bv),
           |ham AS (
           |  SELECT delta_id, corpus_id, CAST(SUM(ABS(x.b - y.b)) AS BIGINT) AS hamming
           |  FROM cand JOIN bits x ON x.media_id = delta_id
           |  JOIN bits y ON y.media_id = corpus_id AND y.m = x.m
           |  GROUP BY delta_id, corpus_id)
           |SELECT delta_id, corpus_id, hamming FROM ham WHERE hamming <= 8
           |ORDER BY delta_id, corpus_id""".stripMargin),
    // streaming image admission: the q261 probe's verdict per arriving
    // row — garbage rows (-(4d), odd d) are decodable=false/null, every
    // hashed row gets an is_duplicate boolean from the banded+capped
    // probe (IN over an empty/missing match is FALSE, matching the
    // Spark side's coalesce(false))
    "q262_streaming_image_admission" ->
      ("WITH " + dhashBitsCtes + ",\n" +
      raw"""cb AS (SELECT * FROM bandvals WHERE media_id >= 0),
           |db AS (SELECT * FROM bandvals WHERE media_id < 0),
           |okv AS (SELECT band, bv FROM cb GROUP BY band, bv HAVING count(*) <= 200),
           |cand AS (
           |  SELECT DISTINCT d.media_id AS delta_id, c.media_id AS corpus_id
           |  FROM db d JOIN okv ON d.band = okv.band AND d.bv = okv.bv
           |  JOIN cb c ON c.band = d.band AND c.bv = d.bv),
           |ham AS (
           |  SELECT delta_id, CAST(SUM(ABS(x.b - y.b)) AS BIGINT) AS hamming
           |  FROM cand JOIN bits x ON x.media_id = delta_id
           |  JOIN bits y ON y.media_id = corpus_id AND y.m = x.m
           |  GROUP BY delta_id, corpus_id),
           |dup AS (SELECT DISTINCT delta_id FROM ham WHERE hamming <= 8),
           |allneg AS (
           |  SELECT -(4*d+1) AS media_id, true AS dec FROM imgs
           |  UNION ALL SELECT -(4*d+2), true FROM imgs
           |  UNION ALL SELECT -(4*d+3), true FROM imgs
           |  UNION ALL SELECT -(4*d), d % 2 = 0 FROM imgs)
           |SELECT media_id, dec AS decodable,
           |  CASE WHEN dec THEN media_id IN (SELECT delta_id FROM dup) ELSE NULL END AS is_duplicate
           |FROM allneg ORDER BY media_id""".stripMargin),
    // fingerprint cap diagnostics: the q251 "no silent caps" rule on the
    // image tier — block-bucket stats at cap 4 (even-d families are over
    // by construction, odd-d at the cap; pert band-1/3 values far under)
    "q263_image_fp_cap_report" ->
      ("WITH " + dhashBitsCtes + ",\n" +
      raw"""bc AS (SELECT band, bv, CAST(count(*) AS BIGINT) AS bs FROM bandvals GROUP BY band, bv)
           |SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM bc) AS n_blocks,
           |  (SELECT max(bs) FROM bc) AS max_bucket,
           |  (SELECT CAST(coalesce(sum(CASE WHEN bs > 4 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM bc) AS n_dropped_blocks,
           |  (SELECT CAST(coalesce(sum(CASE WHEN bs > 4 THEN bs ELSE 0 END), 0) AS BIGINT) FROM bc) AS dropped_occurrences,
           |  (SELECT CAST(COUNT(DISTINCT b.media_id) AS BIGINT)
           |     FROM bandvals b JOIN bc ON b.band = bc.band AND b.bv = bc.bv AND bc.bs > 4) AS affected_ids""".stripMargin),
    // audio perceptual near-dup: waveform -> |amplitude| window sums ->
    // difference bits -> bands/cap/Hamming, all replayed over the
    // closed-form slope-keyed |sawtooth| — the oracle checks the window
    // POOLING arithmetic itself, with gain copies exact by construction
    "q264_audio_fp_dedup" ->
      raw"""WITH aud AS (SELECT doc_id AS d FROM documents WHERE doc_id % 103 = 0 AND doc_id > 0),
           |media AS (
           |  SELECT d, d AS media_id, 1 AS gain, 0 AS pert FROM aud
           |  UNION ALL SELECT d, -(4*d+1), 2, 0 FROM aud
           |  UNION ALL SELECT d, -(4*d+2), 3, 0 FROM aud
           |  UNION ALL SELECT d, -(4*d+3), 1, 1 FROM aud
           |  UNION ALL SELECT d, -(4*d), 1, 2 FROM aud WHERE d % 2 = 0),
           |samp AS (
           |  SELECT m.media_id, m.d, m.gain, m.pert,
           |    unnest(generate_series(0, CAST(799 + m.d % 401 AS INTEGER))) AS i
           |  FROM media m),
           |vals AS (
           |  SELECT media_id,
           |    (i * 65) // (800 + d % 401) AS w,
           |    ABS((31 * d + (17 + 2 * (d % 23)) * i) % 4096 - 2048) * gain
           |      * (CASE WHEN pert = 1 AND (i * 65) // (800 + d % 401) IN (29, 59) THEN 3
           |              WHEN pert = 2 AND ((i * 65) // (800 + d % 401)) % 2 = 1
           |                AND (((i * 65) // (800 + d % 401)) BETWEEN 17 AND 31
           |                  OR ((i * 65) // (800 + d % 401)) BETWEEN 49 AND 63) THEN 3
           |              ELSE 1 END) AS a
           |  FROM samp),
           |ws AS (SELECT media_id, w, CAST(SUM(a) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
           |       FROM vals GROUP BY media_id, w),
           |bits AS (
           |  SELECT a.media_id, a.w AS m, CASE WHEN b.s * a.c > a.s * b.c THEN 1 ELSE 0 END AS b
           |  FROM ws a JOIN ws b ON b.media_id = a.media_id AND b.w = a.w + 1
           |  WHERE a.w < 64),
           |bandvals AS (
           |  SELECT media_id, m // 16 AS band,
           |    STRING_AGG(CAST(b AS VARCHAR), '' ORDER BY m) AS bv
           |  FROM bits GROUP BY media_id, m // 16),
           |okv AS (SELECT band, bv FROM bandvals GROUP BY band, bv HAVING count(*) <= 200),
           |cand AS (
           |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
           |  FROM bandvals a
           |  JOIN okv ON a.band = okv.band AND a.bv = okv.bv
           |  JOIN bandvals b ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id),
           |ham AS (
           |  SELECT id_a, id_b, CAST(SUM(ABS(x.b - y.b)) AS BIGINT) AS hamming
           |  FROM cand JOIN bits x ON x.media_id = id_a
           |  JOIN bits y ON y.media_id = id_b AND y.m = x.m
           |  GROUP BY id_a, id_b)
           |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 8
           |ORDER BY id_a, id_b""".stripMargin,
    // band-saturation mitigation: the closed-form 8-quarter fixture
    // replayed from scratch — xor-multiply mix -> quarter adjustments
    // (twin bit flip, flood codewords) -> BOTH band geometries (4x16 over
    // quarters 0-3, 4x32 over quarter pairs) -> global bucket counts ->
    // cap 4 -> per-quarter Hamming. Even-d families saturate every
    // 64-bit band the pair shares (7 members > cap) and must vanish from
    // the fp64 path; the fp128 path must find every family's pair
    "q265_fp_band_saturation" ->
      raw"""WITH fams AS (SELECT doc_id AS d FROM documents WHERE doc_id % 53 = 11 AND doc_id > 0),
           |mem AS (
           |  SELECT d, CASE WHEN role = 0 THEN d ELSE -(8*d + role) END AS mid, role
           |  FROM fams, generate_series(0, 6) g(role)
           |  WHERE role <= CASE WHEN d % 2 = 0 THEN 6 ELSE 3 END),
           |qk AS (SELECT k FROM generate_series(0, 7) g(k)),
           |seeds AS (
           |  SELECT m.d, m.mid, m.role, qk.k,
           |    CASE WHEN qk.k >= 4 AND m.role >= 2 THEN 8*m.d + m.role ELSE m.d END AS seed
           |  FROM mem m, qk),
           |mx1 AS (SELECT mid, role, k, (seed * 2654435761 + k * 40503) % 2147483647 AS x1 FROM seeds),
           |mx2 AS (SELECT mid, role, k, xor(x1, x1 // 65536) AS x2 FROM mx1),
           |mx3 AS (SELECT mid, role, k, (x2 * 2246822519) % 2147483629 AS x3 FROM mx2),
           |base AS (SELECT mid, role, k, xor(x3, x3 // 8192) % 65536 AS bv FROM mx3),
           |q AS (
           |  SELECT mid, k,
           |    CASE WHEN k = 1 AND role = 1 THEN xor(bv, 1)
           |         WHEN k = 1 AND role >= 2 THEN xor(bv,
           |           CASE role WHEN 2 THEN 255 WHEN 3 THEN 65280 WHEN 4 THEN 65535
           |                     WHEN 5 THEN 3855 ELSE 61680 END)
           |         ELSE bv END AS qv
           |  FROM base),
           |bcnt64 AS (SELECT k, qv, COUNT(*) AS n FROM q WHERE k < 4 GROUP BY 1, 2),
           |pairs64 AS (
           |  SELECT DISTINCT a.mid AS id_a, b.mid AS id_b
           |  FROM q a JOIN q b ON a.k = b.k AND a.qv = b.qv AND a.mid < b.mid
           |  JOIN bcnt64 c ON c.k = a.k AND c.qv = a.qv
           |  WHERE a.k < 4 AND c.n <= 4),
           |ham64 AS (
           |  SELECT p.id_a, p.id_b, SUM(bit_count(xor(qa.qv, qb.qv))) AS hamming
           |  FROM pairs64 p
           |  JOIN q qa ON qa.mid = p.id_a AND qa.k < 4
           |  JOIN q qb ON qb.mid = p.id_b AND qb.k = qa.k
           |  GROUP BY 1, 2),
           |bands128 AS (
           |  SELECT mid, k // 2 AS bk,
           |    SUM(qv * CASE WHEN k % 2 = 0 THEN 1 ELSE 65536 END) AS bv
           |  FROM q GROUP BY 1, 2),
           |bcnt128 AS (SELECT bk, bv, COUNT(*) AS n FROM bands128 GROUP BY 1, 2),
           |pairs128 AS (
           |  SELECT DISTINCT a.mid AS id_a, b.mid AS id_b
           |  FROM bands128 a JOIN bands128 b ON a.bk = b.bk AND a.bv = b.bv AND a.mid < b.mid
           |  JOIN bcnt128 c ON c.bk = a.bk AND c.bv = a.bv
           |  WHERE c.n <= 4),
           |ham128 AS (
           |  SELECT p.id_a, p.id_b, SUM(bit_count(xor(qa.qv, qb.qv))) AS hamming
           |  FROM pairs128 p
           |  JOIN q qa ON qa.mid = p.id_a
           |  JOIN q qb ON qb.mid = p.id_b AND qb.k = qa.k
           |  GROUP BY 1, 2),
           |allp AS (
           |  SELECT 'fp64' AS path, id_a, id_b, CAST(hamming AS BIGINT) AS hamming
           |  FROM ham64 WHERE hamming <= 3
           |  UNION ALL
           |  SELECT 'fp128', id_a, id_b, CAST(hamming AS BIGINT) FROM ham128 WHERE hamming <= 3)
           |SELECT path, id_a, id_b, hamming FROM allp
           |ORDER BY path, id_a, id_b""".stripMargin,
    // video clip near-dup: closed-form cell levels -> per-frame dHash
    // bits -> per-bit MAJORITY over the clip -> bands/cap/Hamming, all
    // replayed from the id arithmetic — container-independence (raw AVI
    // vs MJPEG encode the same levels) makes the cross-container pairs
    // land at Hamming 0 in both engines
    "q266_video_clip_dedup" ->
      raw"""WITH vids AS (SELECT doc_id AS d FROM documents WHERE doc_id % 109 = 0 AND doc_id > 0),
           |media AS (
           |  SELECT d, d AS media_id, 0 AS v FROM vids
           |  UNION ALL SELECT d, -(4*d+1), 1 FROM vids
           |  UNION ALL SELECT d, -(4*d+2), 2 FROM vids
           |  UNION ALL SELECT d, -(4*d+3), 3 FROM vids
           |  UNION ALL SELECT d, -(4*d), 4 FROM vids WHERE d % 2 = 0),
           |fr AS (
           |  SELECT media_id, d, v, unnest(generate_series(0, CAST(4 + 2*(d % 3) AS INTEGER))) AS t
           |  FROM media),
           |ck AS (SELECT k FROM generate_series(0, 71) g(k)),
           |lv1 AS (
           |  SELECT f.media_id, f.d, f.v, f.t, ck.k,
           |    ((31*f.d + f.t) * 2654435761 + ck.k * 40503) % 2147483647 AS x1
           |  FROM fr f, ck),
           |lv2 AS (SELECT media_id, d, v, t, k, xor(x1, x1 // 65536) AS x2 FROM lv1),
           |lv3 AS (SELECT media_id, d, v, t, k, (x2 * 2246822519) % 2147483629 AS x3 FROM lv2),
           |lvm AS (SELECT media_id, d, v, t, k, xor(x3, x3 // 8192) % 4 AS m4 FROM lv3),
           |adj AS (
           |  SELECT media_id, d, t, k,
           |    2 * xor(
           |      CASE WHEN v = 2 AND k IN (29, 59) THEN xor(m4, 1) ELSE m4 END,
           |      CASE WHEN ((v = 2 AND t = 0) OR v IN (3, 4))
           |             AND (k // 9) IN (2, 3, 6, 7) AND (k % 9) % 2 = 1
           |           THEN 2 ELSE 0 END) + (k % 2) AS lv
           |  FROM lvm),
           |bits AS (
           |  SELECT a.media_id, a.d, a.t, (a.k // 9) * 8 + (a.k % 9) AS m,
           |    CASE WHEN b.lv > a.lv THEN 1 ELSE 0 END AS b
           |  FROM adj a JOIN adj b
           |    ON a.media_id = b.media_id AND a.t = b.t AND b.k = a.k + 1
           |  WHERE a.k % 9 < 8),
           |maj AS (
           |  SELECT media_id, m,
           |    CASE WHEN 2 * SUM(b) > MAX(5 + 2*(d % 3)) THEN 1 ELSE 0 END AS b
           |  FROM bits GROUP BY media_id, m),
           |bandvals AS (
           |  SELECT media_id, m // 16 AS band,
           |    STRING_AGG(CAST(b AS VARCHAR), '' ORDER BY m) AS bv
           |  FROM maj GROUP BY media_id, m // 16),
           |okv AS (SELECT band, bv FROM bandvals GROUP BY band, bv HAVING count(*) <= 200),
           |cand AS (
           |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
           |  FROM bandvals a
           |  JOIN okv ON a.band = okv.band AND a.bv = okv.bv
           |  JOIN bandvals b ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id),
           |ham AS (
           |  SELECT id_a, id_b, CAST(SUM(ABS(x.b - y.b)) AS BIGINT) AS hamming
           |  FROM cand JOIN maj x ON x.media_id = id_a
           |  JOIN maj y ON y.media_id = id_b AND y.m = x.m
           |  GROUP BY id_a, id_b)
           |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 8
           |ORDER BY id_a, id_b""".stripMargin,
    // streaming audio admission: the q264 waveform->windows->bits chain,
    // split corpus/arriving — arriving fingerprints probe the capped
    // corpus band index for an at-arrival verdict; odd-family text rows
    // are the undecodable (false, null) branch
    "q267_streaming_audio_admission" ->
      raw"""WITH aud AS (SELECT doc_id AS d FROM documents WHERE doc_id % 103 = 0 AND doc_id > 0),
           |media AS (
           |  SELECT d, d AS media_id, 1 AS gain, 0 AS pert FROM aud
           |  UNION ALL SELECT d, -(4*d+1), 2, 0 FROM aud
           |  UNION ALL SELECT d, -(4*d+2), 3, 0 FROM aud
           |  UNION ALL SELECT d, -(4*d+3), 1, 1 FROM aud
           |  UNION ALL SELECT d, -(4*d), 1, 2 FROM aud WHERE d % 2 = 0),
           |samp AS (
           |  SELECT m.media_id, m.d, m.gain, m.pert,
           |    unnest(generate_series(0, CAST(799 + m.d % 401 AS INTEGER))) AS i
           |  FROM media m),
           |vals AS (
           |  SELECT media_id,
           |    (i * 65) // (800 + d % 401) AS w,
           |    ABS((31 * d + (17 + 2 * (d % 23)) * i) % 4096 - 2048) * gain
           |      * (CASE WHEN pert = 1 AND (i * 65) // (800 + d % 401) IN (29, 59) THEN 3
           |              WHEN pert = 2 AND ((i * 65) // (800 + d % 401)) % 2 = 1
           |                AND (((i * 65) // (800 + d % 401)) BETWEEN 17 AND 31
           |                  OR ((i * 65) // (800 + d % 401)) BETWEEN 49 AND 63) THEN 3
           |              ELSE 1 END) AS a
           |  FROM samp),
           |ws AS (SELECT media_id, w, CAST(SUM(a) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
           |       FROM vals GROUP BY media_id, w),
           |bits AS (
           |  SELECT a.media_id, a.w AS m, CASE WHEN b.s * a.c > a.s * b.c THEN 1 ELSE 0 END AS b
           |  FROM ws a JOIN ws b ON b.media_id = a.media_id AND b.w = a.w + 1
           |  WHERE a.w < 64),
           |bandvals AS (
           |  SELECT media_id, m // 16 AS band,
           |    STRING_AGG(CAST(b AS VARCHAR), '' ORDER BY m) AS bv
           |  FROM bits GROUP BY media_id, m // 16),
           |corpusbv AS (SELECT * FROM bandvals WHERE media_id >= 0),
           |okv AS (SELECT band, bv FROM corpusbv GROUP BY band, bv HAVING count(*) <= 200),
           |arrbv AS (SELECT * FROM bandvals WHERE media_id < 0),
           |cand AS (
           |  SELECT DISTINCT a.media_id AS aid, c.media_id AS cid
           |  FROM arrbv a
           |  JOIN okv ON a.band = okv.band AND a.bv = okv.bv
           |  JOIN corpusbv c ON c.band = a.band AND c.bv = a.bv),
           |ham AS (
           |  SELECT aid, cid, SUM(ABS(x.b - y.b)) AS hamming
           |  FROM cand JOIN bits x ON x.media_id = aid
           |  JOIN bits y ON y.media_id = cid AND y.m = x.m
           |  GROUP BY aid, cid),
           |dup AS (SELECT DISTINCT aid FROM ham WHERE hamming <= 8),
           |arrivals AS (
           |  SELECT -(4*d + r.r) AS media_id FROM aud, generate_series(1, 3) r(r)
           |  UNION ALL SELECT -(4*d) FROM aud),
           |dec AS (SELECT media_id FROM media WHERE media_id < 0)
           |SELECT a.media_id,
           |  (dec.media_id IS NOT NULL) AS decodable,
           |  CASE WHEN dec.media_id IS NULL THEN NULL
           |       ELSE (dup.aid IS NOT NULL) END AS is_duplicate
           |FROM arrivals a
           |LEFT JOIN dec ON dec.media_id = a.media_id
           |LEFT JOIN dup ON dup.aid = a.media_id
           |ORDER BY a.media_id""".stripMargin,
    // 128-bit image near-dup: the q259 replay doubled to the 9x16 grid —
    // closed-form 8-level cells -> 144 cells -> 128 difference bits ->
    // 4x32-bit band values -> cap -> Hamming, certifying the mitigation's
    // image-tier producer including its banding
    "q268_image_dhash128_dedup" ->
      raw"""WITH imgs AS (SELECT doc_id AS d FROM documents WHERE doc_id % 113 = 0 AND doc_id > 0),
           |media AS (
           |  SELECT d, d AS media_id, 0 AS variant FROM imgs
           |  UNION ALL SELECT d, -(4*d+1), 0 FROM imgs
           |  UNION ALL SELECT d, -(4*d+2), 0 FROM imgs
           |  UNION ALL SELECT d, -(4*d+3), 1 FROM imgs
           |  UNION ALL SELECT d, -(4*d), 2 FROM imgs WHERE d % 2 = 0),
           |ck AS (SELECT k FROM generate_series(0, 143) g(k)),
           |lev_a AS (
           |  SELECT m.media_id, m.variant, ck.k,
           |    (m.d * 2654435761 + ck.k * 40503) % 2147483647 AS x1
           |  FROM media m, ck),
           |lev_b AS (SELECT media_id, variant, k, xor(x1, x1 // 65536) AS x2 FROM lev_a),
           |lev_c AS (SELECT media_id, variant, k, (x2 * 2246822519) % 2147483629 AS x3 FROM lev_b),
           |lev0 AS (SELECT media_id, variant, k, xor(x3, x3 // 8192) % 8 AS lv FROM lev_c),
           |levels AS (
           |  SELECT media_id, k,
           |    CASE WHEN variant = 1 AND k IN (47, 122) THEN xor(lv, 1)
           |         WHEN variant = 2 AND (k // 9) IN (5, 6, 13, 14) AND (k % 9) % 2 = 1 THEN (lv + 4) % 8
           |         ELSE lv END AS lv
           |  FROM lev0),
           |bits AS (
           |  SELECT a.media_id, (a.k // 9) * 8 + (a.k % 9) AS m,
           |    CASE WHEN b.lv > a.lv THEN 1 ELSE 0 END AS b
           |  FROM levels a JOIN levels b
           |    ON a.media_id = b.media_id AND b.k = a.k + 1
           |  WHERE a.k % 9 < 8),
           |bandvals AS (
           |  SELECT media_id, m // 32 AS band,
           |    SUM(CAST(b AS BIGINT) << (m % 32)) AS bv
           |  FROM bits GROUP BY media_id, m // 32),
           |okv AS (SELECT band, bv FROM bandvals GROUP BY band, bv HAVING count(*) <= 200),
           |cand AS (
           |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
           |  FROM bandvals a
           |  JOIN okv ON a.band = okv.band AND a.bv = okv.bv
           |  JOIN bandvals b ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id),
           |ham AS (
           |  SELECT id_a, id_b, CAST(SUM(ABS(x.b - y.b)) AS BIGINT) AS hamming
           |  FROM cand JOIN bits x ON x.media_id = id_a
           |  JOIN bits y ON y.media_id = id_b AND y.m = x.m
           |  GROUP BY id_a, id_b)
           |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 8
           |ORDER BY id_a, id_b""".stripMargin,
    // composed streaming span lifecycle: the two-stage cascade recomputed
    // from scratch — batch-1 verdicts against the corpus-only index, then
    // batch-2 verdicts against the index REBUILT over corpus ∪ admitted₁
    // (fold ≡ rebuild is q254's certified invariant, so the rebuild IS the
    // fold's oracle); re-fetches ride the negated ids, coverage is
    // COUNT(DISTINCT position), verdicts integer cross-multiplies
    "q257_span_lifecycle" ->
      raw"""WITH toksrc AS (
           |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks FROM documents
           |  UNION ALL
           |  SELECT -doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks FROM documents WHERE doc_id % 10 = 5),
           |pg AS (
           |  SELECT doc_id, toks, unnest(generate_series(1, CAST(len(toks) AS INTEGER) - 7)) AS pos
           |  FROM toksrc WHERE len(toks) >= 8),
           |grams AS (
           |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           |    CAST(('0x' || substring(sha256(array_to_string(toks[pos:pos+7], ' ')), 1, 15)) AS BIGINT) AS h
           |  FROM pg),
           |cg AS (SELECT * FROM grams WHERE doc_id >= 0 AND doc_id % 10 NOT IN (0, 5)),
           |b1g AS (SELECT * FROM grams WHERE doc_id >= 0 AND doc_id % 10 = 5),
           |b2g AS (SELECT * FROM grams WHERE doc_id < 0 OR doc_id % 10 = 0),
           |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM toksrc),
           |okh0 AS (SELECT h FROM cg GROUP BY h HAVING count(*) <= 50),
           |anch1 AS (
           |  SELECT d.doc_id AS did, d.pos AS dpos, c.doc_id AS cid, c.pos AS cpos
           |  FROM b1g d JOIN cg c ON d.h = c.h JOIN okh0 ON okh0.h = d.h),
           |runs1 AS (
           |  SELECT did, cid, dpos, dpos - cpos AS diag,
           |    dpos - row_number() OVER (PARTITION BY did, cid, dpos - cpos ORDER BY dpos) AS run
           |  FROM anch1),
           |spans1 AS (SELECT did, MIN(dpos) AS s, MIN(dpos) + COUNT(*) + 7 AS e FROM runs1 GROUP BY did, cid, diag, run),
           |cov1 AS (
           |  SELECT did, CAST(COUNT(DISTINCT p) AS BIGINT) AS covered FROM (
           |    SELECT did, unnest(generate_series(s, e - 1)) AS p FROM spans1) GROUP BY did),
           |v1 AS (
           |  SELECT nt.doc_id, nt.n_tokens, COALESCE(cov1.covered, CAST(0 AS BIGINT)) AS covered
           |  FROM nt LEFT JOIN cov1 ON nt.doc_id = cov1.did
           |  WHERE nt.doc_id >= 0 AND nt.doc_id % 10 = 5),
           |adm1 AS (SELECT doc_id FROM v1 WHERE covered * 100 < n_tokens * 50),
           |ig AS (SELECT * FROM cg UNION ALL SELECT g.* FROM b1g g JOIN adm1 ON g.doc_id = adm1.doc_id),
           |okh1 AS (SELECT h FROM ig GROUP BY h HAVING count(*) <= 50),
           |anch2 AS (
           |  SELECT d.doc_id AS did, d.pos AS dpos, c.doc_id AS cid, c.pos AS cpos
           |  FROM b2g d JOIN ig c ON d.h = c.h JOIN okh1 ON okh1.h = d.h),
           |runs2 AS (
           |  SELECT did, cid, dpos, dpos - cpos AS diag,
           |    dpos - row_number() OVER (PARTITION BY did, cid, dpos - cpos ORDER BY dpos) AS run
           |  FROM anch2),
           |spans2 AS (SELECT did, MIN(dpos) AS s, MIN(dpos) + COUNT(*) + 7 AS e FROM runs2 GROUP BY did, cid, diag, run),
           |cov2 AS (
           |  SELECT did, CAST(COUNT(DISTINCT p) AS BIGINT) AS covered FROM (
           |    SELECT did, unnest(generate_series(s, e - 1)) AS p FROM spans2) GROUP BY did),
           |v2 AS (
           |  SELECT nt.doc_id, nt.n_tokens, COALESCE(cov2.covered, CAST(0 AS BIGINT)) AS covered
           |  FROM nt LEFT JOIN cov2 ON nt.doc_id = cov2.did
           |  WHERE nt.doc_id < 0 OR nt.doc_id % 10 = 0),
           |sel AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
           |SELECT doc_id, n_tokens, covered AS covered_tokens,
           |  CAST(covered AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_fraction,
           |  covered * 100 < n_tokens * 50 AS admitted
           |FROM sel ORDER BY doc_id""".stripMargin,
    // intra-doc repetition: 4-gram anchors (the 8-gram prefix is a
    // different gram length, hence a local prefix), within-doc cap 20,
    // coverage as COUNT(DISTINCT position) — independent of Spark's
    // interval union
    "q256_self_repetition" ->
      raw"""WITH toksrc AS (
           |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks FROM documents),
           |pg AS (
           |  SELECT doc_id, toks, unnest(generate_series(1, CAST(len(toks) AS INTEGER) - 3)) AS pos
           |  FROM toksrc WHERE len(toks) >= 4),
           |grams AS (
           |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           |    CAST(('0x' || substring(sha256(array_to_string(toks[pos:pos+3], ' ')), 1, 15)) AS BIGINT) AS h
           |  FROM pg),
           |okb AS (SELECT doc_id, h FROM grams GROUP BY doc_id, h HAVING count(*) BETWEEN 2 AND 20),
           |g2 AS (SELECT g.doc_id, g.pos, g.h FROM grams g JOIN okb ON g.doc_id = okb.doc_id AND g.h = okb.h),
           |anch AS (
           |  SELECT a.doc_id, a.pos AS pa, b.pos AS pb
           |  FROM g2 a JOIN g2 b ON a.doc_id = b.doc_id AND a.h = b.h AND a.pos < b.pos),
           |runs AS (
           |  SELECT doc_id, pa, pb, pb - pa AS diag,
           |    pa - row_number() OVER (PARTITION BY doc_id, pb - pa ORDER BY pa) AS run
           |  FROM anch),
           |spans AS (
           |  SELECT doc_id, MIN(pa) AS s_a, MIN(pb) AS s_b,
           |    CAST(COUNT(*) + 3 AS BIGINT) AS sp
           |  FROM runs GROUP BY doc_id, diag, run),
           |ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS repeated_spans FROM spans GROUP BY doc_id),
           |iv AS (
           |  SELECT doc_id, s_a AS s, s_a + sp AS e FROM spans
           |  UNION ALL
           |  SELECT doc_id, s_b, s_b + sp FROM spans),
           |cov AS (
           |  SELECT doc_id, CAST(COUNT(DISTINCT p) AS BIGINT) AS covered FROM (
           |    SELECT doc_id, unnest(generate_series(s, e - 1)) AS p FROM iv)
           |  GROUP BY doc_id),
           |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM toksrc)
           |SELECT nt.doc_id, nt.n_tokens,
           |  COALESCE(ns.repeated_spans, CAST(0 AS BIGINT)) AS repeated_spans,
           |  COALESCE(cov.covered, CAST(0 AS BIGINT)) AS covered_tokens,
           |  CAST(COALESCE(cov.covered, CAST(0 AS BIGINT)) AS DOUBLE)
           |    / CAST(nt.n_tokens AS DOUBLE) AS rep_fraction
           |FROM nt LEFT JOIN ns ON nt.doc_id = ns.doc_id
           |LEFT JOIN cov ON nt.doc_id = cov.doc_id
           |ORDER BY nt.doc_id""".stripMargin,
    // real AVI frame sampling: every 2nd frame's channel sums in closed
    // form; undecodable (% 17 = 0) blobs fan out to nothing
    "q255_frame_samples" ->
      ("WITH " + aviVideoCte + ",\n" +
       """pf AS (SELECT media_id, w, h,
        |         unnest(generate_series(0, n - 1)) AS f FROM v),
        |sampled AS (SELECT * FROM pf WHERE f % 2 = 0),
        |pfx AS (SELECT media_id, w, h, f,
        |          unnest(generate_series(0, w - 1)) AS x FROM sampled),
        |pxy AS (SELECT media_id, w, h, f, x,
        |          unnest(generate_series(0, h - 1)) AS y FROM pfx)
        |SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(SUM((media_id * 7 + f * 3 + x * 11 + y * 5) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((media_id * 5 + f * 11 + x * 7 + y * 3) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((media_id * 3 + f * 7 + x * 5 + y * 11) % 256) AS BIGINT) AS sum_b
        |FROM pxy GROUP BY media_id, f
        |ORDER BY media_id, frame_idx""".stripMargin),
    // real AVI decode: every statistic named from the closed-form pixel
    // pattern (fps as the literal 10); the doc_id % 17 = 0 rows carry
    // non-AVI bytes and must come back with null stats
    "q252_video_decode" ->
      ("WITH " + aviVideoCte + ",\n" +
       """pf AS (SELECT media_id, n, w, h,
        |         unnest(generate_series(0, n - 1)) AS f FROM v),
        |pfx AS (SELECT media_id, n, w, h, f,
        |          unnest(generate_series(0, w - 1)) AS x FROM pf),
        |pxy AS (SELECT media_id, n, w, h, f, x,
        |          unnest(generate_series(0, h - 1)) AS y FROM pfx),
        |ch AS (
        |  SELECT media_id,
        |    (media_id * 3 + f * 7 + x * 5 + y * 11) % 256 AS b,
        |    (media_id * 5 + f * 11 + x * 7 + y * 3) % 256 AS g,
        |    (media_id * 7 + f * 3 + x * 11 + y * 5) % 256 AS r
        |  FROM pxy),
        |agg AS (
        |  SELECT media_id,
        |    CAST(SUM(r) AS BIGINT) AS sum_r,
        |    CAST(SUM(g) AS BIGINT) AS sum_g,
        |    CAST(SUM(b) AS BIGINT) AS sum_b,
        |    CAST(LEAST(MIN(r), MIN(g), MIN(b)) AS BIGINT) AS min_px,
        |    CAST(GREATEST(MAX(r), MAX(g), MAX(b)) AS BIGINT) AS max_px
        |  FROM ch GROUP BY media_id),
        |allv AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 2)
        |SELECT allv.media_id,
        |  CAST(v.n AS BIGINT) AS n_frames,
        |  CAST(v.w AS BIGINT) AS width,
        |  CAST(v.h AS BIGINT) AS height,
        |  CASE WHEN v.media_id IS NOT NULL THEN CAST(10 AS BIGINT) END AS fps,
        |  agg.sum_r, agg.sum_g, agg.sum_b, agg.min_px, agg.max_px
        |FROM allv LEFT JOIN v ON allv.media_id = v.media_id
        |LEFT JOIN agg ON allv.media_id = agg.media_id
        |ORDER BY allv.media_id""".stripMargin),
    // span bucket-cap diagnostics at cap 2 (every branch fires at every
    // scale — the fixture's max 8-gram bucket is 3-4); DuckDB SUM over
    // integers is HUGEINT, hence the BIGINT casts
    "q251_span_cap_report" ->
      ("WITH " + spanGramCtes + ",\n" +
        raw"""b AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS bs FROM grams GROUP BY h)
           |SELECT s.n_grams, s.max_bucket, s.n_dropped_grams, s.dropped_occurrences, a.affected_docs
           |FROM
           |  (SELECT CAST(COUNT(*) AS BIGINT) AS n_grams, MAX(bs) AS max_bucket,
           |     CAST(COALESCE(SUM(CASE WHEN bs > 2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped_grams,
           |     CAST(COALESCE(SUM(CASE WHEN bs > 2 THEN bs ELSE 0 END), 0) AS BIGINT) AS dropped_occurrences
           |   FROM b) s,
           |  (SELECT CAST(COUNT(DISTINCT g.doc_id) AS BIGINT) AS affected_docs
           |   FROM grams g JOIN b ON g.h = b.h AND b.bs > 2) a""".stripMargin),
    // join-strategy hint: results are strategy-invariant, so the oracle
    // is the plain join; the hint's EFFECT is plan-audited Spark-side
    "q248_join_hints" ->
      """SELECT n.n_name,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS balance_cents
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,
    // SQL-text UNPIVOT: the oracle is the UNION ALL the clause desugars
    // to; the WHERE mirrors UNPIVOT's default null-row exclusion
    "q247_sql_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |      THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS open_cents,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS filled_cents,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'P'
        |      THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS pending_cents
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, status, cents FROM (
        |  SELECT o_orderpriority, 'O' AS status, open_cents AS cents FROM wide
        |  UNION ALL
        |  SELECT o_orderpriority, 'F', filled_cents FROM wide
        |  UNION ALL
        |  SELECT o_orderpriority, 'P', pending_cents FROM wide)
        |WHERE cents IS NOT NULL
        |ORDER BY o_orderpriority, status""".stripMargin,
    // real WAV decode: the oracle names every statistic from the
    // closed-form sample pattern (and the sample rate as a literal), so a
    // container/codec bug on the Spark side cannot cancel out
    "q244_audio_decode" ->
      """WITH a AS (
        |  SELECT doc_id AS media_id, 800 + doc_id % 401 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |s AS (
        |  SELECT media_id, n, ((31 * media_id + 17 * i) % 4096) - 2048 AS v
        |  FROM (SELECT media_id, n,
        |          unnest(generate_series(0, CAST(n AS INTEGER) - 1)) AS i
        |        FROM a))
        |SELECT media_id,
        |  CAST(16000 AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(SUM(v) AS BIGINT) AS sum_samples,
        |  CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(SUM(v * v) AS BIGINT) AS sum_sq,
        |  CAST(MIN(v) AS BIGINT) AS min_sample,
        |  CAST(MAX(v) AS BIGINT) AS max_sample,
        |  sqrt(CAST(SUM(v * v) AS DOUBLE) / CAST(n AS DOUBLE)) AS rms
        |FROM s GROUP BY media_id, n ORDER BY media_id""".stripMargin,
    // span removal: covered positions from the id_b side expand through
    // generate_series, anti-join kills them, ordered string_agg reassembles
    "q242_span_removal" ->
      ("WITH " + spanCtes + ",\n" +
        """cover AS (
          |  SELECT DISTINCT doc_id, pos FROM (
          |    SELECT id_b AS doc_id,
          |      unnest(generate_series(pos_b, pos_b + span_tokens - 1)) AS pos
          |    FROM spans)),
          |tk AS (
          |  SELECT doc_id, toks, unnest(generate_series(1, CAST(len(toks) AS INTEGER))) AS pos
          |  FROM toksrc),
          |tok AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, toks[pos] AS tok FROM tk),
          |kept AS (
          |  SELECT t.doc_id, t.pos, t.tok FROM tok t
          |  ANTI JOIN cover c ON t.doc_id = c.doc_id AND t.pos = c.pos),
          |agg AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
          |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
          |  FROM kept GROUP BY 1),
          |rm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rm FROM cover GROUP BY 1)
          |SELECT COALESCE(agg.doc_id, rm.doc_id) AS doc_id,
          |  COALESCE(agg.n_kept, CAST(0 AS BIGINT)) + COALESCE(rm.n_rm, CAST(0 AS BIGINT)) AS n_tokens,
          |  COALESCE(rm.n_rm, CAST(0 AS BIGINT)) AS n_removed,
          |  COALESCE(agg.clean_text, '') AS clean_text
          |FROM agg FULL OUTER JOIN rm ON agg.doc_id = rm.doc_id
          |ORDER BY doc_id""".stripMargin),
    // incremental spans: delta grams probe the corpus-side-capped corpus
    // gram index; same diagonal-island construction as q238. The SAME
    // oracle text serves q249 (through-the-stream twin): span detection
    // distributes over the delta, so stream must equal batch exactly.
    "q243_incremental_spans" -> q243SpanOracle,
    // bigram surprisal: per-gram floor-log2 in EXACT integer arithmetic
    // (length(bin(den // num)) - 1 — bin() agrees across engines where
    // libm ln does not), one double division per doc at output
    "q240_bigram_surprisal" ->
      raw"""WITH toksrc AS (
           |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks FROM documents),
           |pg AS (
           |  SELECT doc_id, toks, unnest(generate_series(1, CAST(len(toks) AS INTEGER) - 1)) AS i
           |  FROM toksrc WHERE len(toks) >= 2),
           |dg AS (
           |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, CAST(count(*) AS BIGINT) AS m
           |  FROM pg GROUP BY 1, 2, 3),
           |cb AS (SELECT w1, w2, CAST(SUM(m) AS BIGINT) AS c_big FROM dg GROUP BY 1, 2),
           |cp AS (SELECT w1, CAST(SUM(c_big) AS BIGINT) AS c_pre FROM cb GROUP BY 1),
           |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS vocab FROM cb),
           |scored AS (
           |  SELECT dg.doc_id, CAST(SUM(dg.m) AS BIGINT) AS n_grams,
           |    CAST(SUM(dg.m * (CAST(length(bin((cp.c_pre + v.vocab) // (cb.c_big + 1))) AS BIGINT) - 1)) AS BIGINT) AS surprisal_bits
           |  FROM dg JOIN cb ON dg.w1 = cb.w1 AND dg.w2 = cb.w2
           |  JOIN cp ON dg.w1 = cp.w1 CROSS JOIN v
           |  GROUP BY 1),
           |tot AS (SELECT CAST(SUM(surprisal_bits) AS BIGINT) AS t_bits,
           |               CAST(SUM(n_grams) AS BIGINT) AS t_grams FROM scored)
           |SELECT d.doc_id,
           |  COALESCE(s.n_grams, CAST(0 AS BIGINT)) AS n_grams,
           |  COALESCE(s.surprisal_bits, CAST(0 AS BIGINT)) AS surprisal_bits,
           |  CASE WHEN s.n_grams > 0
           |    THEN CAST(s.surprisal_bits AS DOUBLE) / CAST(s.n_grams AS DOUBLE) END AS mean_bits,
           |  CASE WHEN s.n_grams > 0 THEN
           |    CASE WHEN s.surprisal_bits * tot.t_grams > tot.t_bits * s.n_grams
           |         THEN 'high_surprisal' ELSE 'typical' END END AS verdict
           |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id CROSS JOIN tot
           |ORDER BY d.doc_id""".stripMargin,
    // the full EXISTS / NOT EXISTS / IN / NOT IN surface: the oracle runs
    // the same text modulo view names (DuckDB rewrites to semi/anti joins
    // exactly as Catalyst must — certified by PlanAuditSpec on our side)
    "q239_subquery_rewrites" ->
      """SELECT c.c_custkey, c.c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'O')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT'
        |                    AND o.o_orderstatus = 'F')
        |  AND c.c_custkey IN (SELECT o_custkey FROM orders
        |                      WHERE o_orderpriority = '1-URGENT')
        |  AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
        |                          WHERE o_orderstatus = 'P'
        |                            AND o_custkey IS NOT NULL)
        |ORDER BY c.c_custkey""".stripMargin,
    // observed metrics: the monitoring API must report exactly what a
    // dedicated aggregation computes
    "q236_observed_metrics" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
        |  CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM orders""".stripMargin,
    // new vs returning: first-seen day per user, day-grain classification
    "q234_new_vs_returning" ->
      """WITH pd AS (
        |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
        |  FROM events WHERE event_type = 'purchase'),
        |fs AS (SELECT u, MIN(d) AS f FROM pd GROUP BY 1)
        |SELECT d AS day, CAST(count(*) AS BIGINT) AS n_active,
        |  CAST(SUM(CASE WHEN d = f THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN d <> f THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
        |FROM pd JOIN fs USING (u) GROUP BY 1 ORDER BY 1""".stripMargin,
    // debounce: the oracle can't run a sequential fold, so it walks
    // PRECOMPUTED successor pointers (first event >= t + gap — an argmin
    // computed non-recursively) with pure pointer-chasing recursion
    "q235_event_debounce" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id AS k, ts, epoch_us(ts) AS t, event_id AS o,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events),
        |nxt AS (
        |  SELECT a.k, a.rn, MIN(b.rn) AS nrn
        |  FROM ev a JOIN ev b ON a.k = b.k AND b.t >= a.t + 21600000000
        |  GROUP BY a.k, a.rn),
        |keep AS (
        |  SELECT k, rn FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT n.k, n.nrn FROM keep j JOIN nxt n ON n.k = j.k AND n.rn = j.rn)
        |SELECT ev.o AS event_id, ev.k AS user_id, ev.ts
        |FROM keep JOIN ev USING (k, rn)
        |ORDER BY event_id""".stripMargin,
    // quantile normalization: identical rank algebra, the rounded target
    // position via floor-division (operands far below the 2^53 boundary
    // where float floor could diverge from integer div), inverse CDF as a
    // rank-interval join
    "q233_quantile_normalize" ->
      """WITH v AS (
        |  SELECT o_orderkey, c_mktsegment,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT o_orderkey, c_mktsegment, cents,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY cents, o_orderkey) AS BIGINT) AS i,
        |    CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS ng,
        |    CAST((SELECT count(*) FROM v) AS BIGINT) AS n
        |  FROM v),
        |k AS (
        |  SELECT o_orderkey, c_mktsegment, cents,
        |    CASE WHEN ng = 1 THEN CAST(floor((n - 1) / 2.0) AS BIGINT)
        |      ELSE CAST(floor(((i - 1) * (n - 1) * 2 + (ng - 1)) /
        |        CAST(2 * (ng - 1) AS DOUBLE)) AS BIGINT) END AS k
        |  FROM r),
        |c AS (SELECT cents AS gv, CAST(count(*) AS BIGINT) AS gc FROM v GROUP BY 1),
        |cc AS (
        |  SELECT gv, gc,
        |    CAST(SUM(gc) OVER (ORDER BY gv ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM c)
        |SELECT k.o_orderkey, k.c_mktsegment, k.cents, cc.gv AS norm_cents
        |FROM k JOIN cc ON k.k >= cc.cum - cc.gc AND k.k < cc.cum
        |ORDER BY o_orderkey""".stripMargin,
    // orphan audit: one anti-join per relation, exact counts; the partial
    // parent simulates the mid-backfill state, the full one stays clean
    "q230_orphan_audit" ->
      """WITH lo AS (
        |  SELECT l_orderkey AS k FROM lineitem
        |  WHERE l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 <> 0)),
        |oc AS (
        |  SELECT o_custkey AS k FROM orders
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |SELECT 'lineitem->orders_partial' AS relation,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child_rows,
        |  CAST(count(*) AS BIGINT) AS n_orphan_rows,
        |  CAST(count(DISTINCT k) AS BIGINT) AS n_orphan_keys
        |FROM lo
        |UNION ALL
        |SELECT 'orders->customer',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
        |FROM oc
        |ORDER BY relation""".stripMargin,
    // fiscal rollup: FY opens Feb 1 — integer month arithmetic only
    "q231_fiscal_rollup" ->
      """SELECT
        |  CAST(CASE WHEN month(o_orderdate) >= 2 THEN year(o_orderdate)
        |    ELSE year(o_orderdate) - 1 END AS BIGINT) AS fiscal_year,
        |  CAST(floor(((month(o_orderdate) - 2 + 12) % 12) / 3) + 1 AS BIGINT)
        |    AS fiscal_quarter,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // reconciliation: fixed-association per-line product rounded to cents
    // once, error buckets by integer cross-multiplication
    // row-gated buckets: headers at o_orderkey % 7 = 0 (with lines) are
    // restated to the recomputed total, so `exact` is a real output row;
    // each remaining bucket row exists only where the fixture fires it
    "q232_order_reconciliation" ->
      """WITH r AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 + l_tax) * (1 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS rec
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS hdr
        |  FROM orders),
        |j AS (
        |  SELECT r.rec,
        |    CASE WHEN o.o_orderkey % 7 = 0 AND r.rec IS NOT NULL
        |         THEN r.rec ELSE o.hdr END AS tot
        |  FROM o FULL OUTER JOIN r ON o.o_orderkey = r.l_orderkey)
        |SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_orders FROM (
        |  SELECT CASE
        |    WHEN tot IS NULL THEN 'lines_without_header'
        |    WHEN rec IS NULL THEN 'header_without_lines'
        |    WHEN rec = tot THEN 'exact'
        |    WHEN abs(rec - tot) * 100 <= tot THEN 'within_1pct'
        |    WHEN abs(rec - tot) * 10 <= tot THEN 'within_10pct'
        |    ELSE 'beyond_10pct' END AS verdict
        |  FROM j)
        |GROUP BY verdict ORDER BY verdict""".stripMargin,
    // nearest as-of: backward/forward extrema per left row, side decided
    // by exact integer-us distance (ties backward), payload id pinned by
    // each direction's own tie convention (backward max, forward min)
    "q229_nearest_asof" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'error' AND event_id % 5 = 0),
        |j AS (
        |  SELECT l.event_id AS eid,
        |    max(CASE WHEN r.ts <= l.ts THEN r.ts END) AS bts,
        |    min(CASE WHEN r.ts >= l.ts THEN r.ts END) AS fts
        |  FROM l LEFT JOIN r ON l.user_id = r.user_id
        |  GROUP BY 1),
        |d AS (
        |  SELECT l.event_id AS eid, l.user_id, l.ts, j.bts, j.fts,
        |    CASE
        |      WHEN j.bts IS NULL AND j.fts IS NULL THEN NULL
        |      WHEN j.fts IS NULL THEN 'backward'
        |      WHEN j.bts IS NULL THEN 'forward'
        |      WHEN epoch_us(l.ts) - epoch_us(j.bts) <= epoch_us(j.fts) - epoch_us(l.ts)
        |        THEN 'backward' ELSE 'forward' END AS side
        |  FROM l JOIN j ON j.eid = l.event_id),
        |pick AS (
        |  SELECT d.eid,
        |    CASE WHEN d.side = 'backward' THEN max(r.event_id)
        |      ELSE min(r.event_id) END AS rid
        |  FROM d JOIN r ON r.user_id = d.user_id
        |    AND r.ts = CASE WHEN d.side = 'backward' THEN d.bts ELSE d.fts END
        |  GROUP BY d.eid, d.side)
        |SELECT d.eid AS event_id, d.user_id, d.ts,
        |  p.rid AS nearest_error_id,
        |  CASE WHEN d.side = 'backward' THEN d.bts ELSE d.fts END AS nearest_error_ts,
        |  d.side AS asof_side,
        |  CASE WHEN d.side IS NOT NULL THEN
        |    abs(epoch_us(CASE WHEN d.side = 'backward' THEN d.bts ELSE d.fts END)
        |        - epoch_us(d.ts)) END AS us_apart
        |FROM d LEFT JOIN pick p ON p.eid = d.eid
        |ORDER BY event_id""".stripMargin,
    // edit-distance join: the SAME deletion-neighborhood blocking +
    // levenshtein verification (unit-cost distance on both engines)
    "q226_editdist_dedup" ->
      """WITH s AS (
        |  SELECT MIN(c_custkey) AS id, c_name AS nm FROM customer
        |  WHERE c_name IS NOT NULL GROUP BY c_name),
        |vars AS (
        |  SELECT id, nm, unnest(list_append(
        |    list_transform(range(1, CAST(len(nm) AS INTEGER) + 1),
        |      i -> substring(nm, 1, CAST(i AS INTEGER) - 1) ||
        |           substring(nm, CAST(i AS INTEGER) + 1)),
        |    nm)) AS v
        |  FROM s),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS na, b.nm AS nb
        |  FROM vars a JOIN vars b ON a.v = b.v AND a.id < b.id)
        |SELECT id_a, id_b, CAST(levenshtein(na, nb) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(na, nb) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    // octiles: quantile_cont at eighths — dyadic fractions on integer
    // cents interpolate exactly on both engines
    "q224_price_octiles" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(c) AS BIGINT) AS min_cents, CAST(max(c) AS BIGINT) AS max_cents,
        |  quantile_cont(c, 0.125) AS p18, quantile_cont(c, 0.25) AS p28,
        |  quantile_cont(c, 0.375) AS p38, quantile_cont(c, 0.5) AS p48,
        |  quantile_cont(c, 0.625) AS p58, quantile_cont(c, 0.75) AS p68,
        |  quantile_cont(c, 0.875) AS p78
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    // dyadic EWMA: integer bit-shift kernel weights, HUGEINT weighted sum,
    // terminal /255 via the VARCHAR convention; full-kernel days only
    "q225_ewma_revenue" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |g AS (
        |  SELECT d.day AS t, k.k FROM daily d, (SELECT unnest(range(0, 8)) AS k) k),
        |j AS (
        |  SELECT g.t,
        |    SUM(CASE WHEN d2.rev IS NULL THEN 0 ELSE 1 END) AS nd,
        |    SUM(CAST(COALESCE(d2.rev, 0) AS HUGEINT) *
        |        (CAST(1 AS HUGEINT) << CAST(7 - g.k AS INTEGER))) AS wsum
        |  FROM g LEFT JOIN daily d2 ON g.t - g.k = d2.day
        |  GROUP BY g.t),
        |mn AS (SELECT MIN(day) AS mnd FROM daily)
        |SELECT t AS day,
        |  CASE WHEN t - 7 >= mnd
        |    THEN CAST(CAST(wsum AS VARCHAR) AS DOUBLE) / 255.0 END AS ewma_cents,
        |  CASE WHEN t - 7 >= mnd THEN CAST(nd AS BIGINT) END AS n_active_days
        |FROM j, mn ORDER BY day""".stripMargin,
    // winsorized mean: dyadic octile band, clipping on 8x-scaled BIGINTs,
    // one exact-integer double division
    "q227_winsorized_revenue" ->
      """WITH v AS (
        |  SELECT c_mktsegment,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |s AS (
        |  SELECT c_mktsegment,
        |    CAST(quantile_cont(cents, 0.125) * 8 AS BIGINT) AS lo8,
        |    CAST(quantile_cont(cents, 0.875) * 8 AS BIGINT) AS hi8
        |  FROM v GROUP BY 1)
        |SELECT v.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN cents * 8 < lo8 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(SUM(CASE WHEN cents * 8 > hi8 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        |  CAST(SUM(LEAST(GREATEST(cents * 8, lo8), hi8)) AS DOUBLE) /
        |    CAST(count(*) * 8 AS DOUBLE) AS winsorized_mean_cents
        |FROM v JOIN s USING (c_mktsegment)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // column drift: per-column null-safe inequality counts between the
    // cut snapshot and the restated full table, unpivoted
    "q228_column_drift" ->
      """WITH b AS (
        |  SELECT o_orderkey, o_orderstatus AS s1, o_totalprice AS p1,
        |    o_orderpriority AS pr1, o_custkey AS c1
        |  FROM orders WHERE o_orderdate <= DATE '1996-01-02'),
        |a AS (
        |  SELECT o_orderkey, o_orderstatus AS s2,
        |    o_totalprice + CASE WHEN o_orderkey % 7 = 0
        |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS p2,
        |    o_orderpriority AS pr2,
        |    CASE WHEN o_orderkey % 5 = 0 THEN CAST(0 AS BIGINT)
        |      ELSE o_custkey END AS c2
        |  FROM orders),
        |j AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN s1 IS DISTINCT FROM s2 THEN 1 ELSE 0 END) AS BIGINT) AS ds,
        |    CAST(SUM(CASE WHEN p1 IS DISTINCT FROM p2 THEN 1 ELSE 0 END) AS BIGINT) AS dp,
        |    CAST(SUM(CASE WHEN pr1 IS DISTINCT FROM pr2 THEN 1 ELSE 0 END) AS BIGINT) AS dpr,
        |    CAST(SUM(CASE WHEN c1 IS DISTINCT FROM c2 THEN 1 ELSE 0 END) AS BIGINT) AS dc
        |  FROM b JOIN a USING (o_orderkey))
        |SELECT u.column_name, u.n_changed, j.n AS n_common
        |FROM j, (
        |  SELECT 'o_orderstatus' AS column_name, ds AS n_changed FROM j
        |  UNION ALL SELECT 'o_totalprice', dp FROM j
        |  UNION ALL SELECT 'o_orderpriority', dpr FROM j
        |  UNION ALL SELECT 'o_custkey', dc FROM j) u
        |ORDER BY column_name""".stripMargin,
    // incremental fold ≡ rebuild: the oracle recomputes the aggregate from
    // the whole fact table from scratch
    "q175_incremental_gold_refresh" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // exact-integer z-score: identical cross-multiplied HUGEINT test —
    // no float enters the verdict on either engine
    "q176_exact_outliers" ->
      """WITH v AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events),
        |s AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(value_cents) AS HUGEINT) AS s1,
        |    CAST(sum(CAST(value_cents AS HUGEINT) * value_cents) AS HUGEINT) AS s2
        |  FROM v GROUP BY event_type HAVING count(*) >= 2)
        |SELECT v.event_id, v.event_type, v.value_cents,
        |  CASE WHEN s.n * v.value_cents - s.s1 > 0 THEN 'high' ELSE 'low' END AS side
        |FROM v JOIN s ON v.event_type = s.event_type
        |WHERE (s.n * v.value_cents - s.s1) * (s.n * v.value_cents - s.s1) * (s.n - 1)
        |    > 9 * s.n * (s.n * s.s2 - s.s1 * s.s1)
        |ORDER BY v.event_id""".stripMargin,
    // Markov transitions: BIGINT counts, one terminal BIGINT/BIGINT division
    "q177_markov_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |t AS (
        |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
        |  FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n_transitions,
        |  CAST(n_transitions AS DOUBLE) /
        |    CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE) AS p_transition
        |FROM t ORDER BY prev_type, next_type""".stripMargin,
    // top-N + OTHER: rank over the aggregated nation frame, regroup
    "q178_topn_other_rollup" ->
      """WITH rev AS (
        |  SELECT n_name, COUNT(*) AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_amt
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |rk AS (
        |  SELECT rev.*, CAST(row_number() OVER (ORDER BY rev_amt DESC, n_name) AS BIGINT) AS rk
        |  FROM rev)
        |SELECT CASE WHEN rk <= 5 THEN n_name ELSE 'OTHER' END AS nation_group,
        |  CAST(sum(n_orders) AS BIGINT) AS n_orders,
        |  CAST(CAST(CAST(sum(rev_amt) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue,
        |  min(rk) AS group_rank
        |FROM rk GROUP BY 1 ORDER BY group_rank""".stripMargin,
    // asymmetric GROUPING SETS (both 1-D margins, no grand total);
    // GROUPING bitmask convention shared with the q166 CUBE certification
    "q179_grouping_sets" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year, l_returnflag,
        |  CAST(GROUPING(year(l_shipdate), l_returnflag) AS BIGINT) AS level,
        |  COUNT(*) AS n_items,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((year(l_shipdate), l_returnflag), (year(l_shipdate)), (l_returnflag))
        |ORDER BY 3, 1, 2""".stripMargin,
    // RFM quintiles: identical ntile bucket-fill semantics, ties pinned
    "q180_rfm_segments" ->
      """WITH base AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-08-02') AS BIGINT) AS recency_days,
        |    COUNT(*) AS frequency,
        |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS mon
        |  FROM orders GROUP BY o_custkey),
        |s AS (
        |  SELECT o_custkey, recency_days, frequency,
        |    CAST(CAST(CAST(mon AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS monetary,
        |    CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS BIGINT) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS BIGINT) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY mon ASC, o_custkey) AS BIGINT) AS m_score
        |  FROM base)
        |SELECT o_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        |       WHEN f_score >= 4 THEN 'loyal'
        |       WHEN m_score >= 4 THEN 'big_spender'
        |       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
        |       WHEN r_score <= 2 THEN 'hibernating'
        |       ELSE 'regular' END AS segment
        |FROM s ORDER BY o_custkey""".stripMargin,
    // association rules: all-BIGINT support/frequency products, one
    // terminal double division
    "q181_market_basket" ->
      """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM i),
        |f AS (SELECT l_partkey, COUNT(*) AS nf FROM i GROUP BY 1),
        |p AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
        |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT p.part_a, p.part_b, p.support,
        |  CAST(p.support * (SELECT n_orders FROM n) AS DOUBLE)
        |    / CAST(fa.nf * fb.nf AS DOUBLE) AS lift
        |FROM p
        |JOIN f fa ON fa.l_partkey = p.part_a
        |JOIN f fb ON fb.l_partkey = p.part_b
        |ORDER BY part_a, part_b""".stripMargin,
    // equi-width histogram: floor division is IEEE-identical; share is
    // the exact BIGINT/BIGINT double
    "q182_order_histogram" ->
      """WITH b AS (
        |  SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin_id, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |t AS (SELECT COUNT(*) AS total FROM orders)
        |SELECT bin_id, bin_id * 50000 AS bin_lo, (bin_id + 1) * 50000 AS bin_hi, n_orders,
        |  CAST(n_orders AS DOUBLE) / CAST((SELECT total FROM t) AS DOUBLE) AS share
        |FROM b ORDER BY bin_id""".stripMargin,
    // MAD outliers: integer cents -> every median/MAD an exact 0.5
    // multiple (bit-stable interpolation, the q20 parity)
    "q183_mad_outliers" ->
      """WITH v AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events),
        |med AS (SELECT event_type, quantile_cont(value_cents, 0.5) AS med FROM v GROUP BY 1),
        |d AS (
        |  SELECT v.event_id, v.event_type, v.value_cents, med.med,
        |    abs(v.value_cents - med.med) AS absdev
        |  FROM v JOIN med ON v.event_type = med.event_type),
        |mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value_cents,
        |  CASE WHEN CAST(d.value_cents AS DOUBLE) > d.med THEN 'high' ELSE 'low' END AS side
        |FROM d JOIN mad ON d.event_type = mad.event_type
        |WHERE d.absdev > 3.0 * mad.mad
        |ORDER BY d.event_id""".stripMargin,
    // ABC thresholds by exact decimal cross-multiplication inside width
    // 18+2 so neither engine leaves exact decimals
    "q184_abc_classification" ->
      """WITH rev AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS revenue
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT SUM(revenue) AS total FROM rev),
        |c AS (
        |  SELECT l_partkey, revenue,
        |    SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM rev)
        |SELECT c.l_partkey,
        |  CAST(CAST(CAST(c.revenue AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue,
        |  CAST(CAST(CAST(c.cum AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS cum_revenue,
        |  CASE WHEN CAST(c.cum AS DECIMAL(18,2)) * 5 <= CAST((SELECT total FROM t) AS DECIMAL(18,2)) * 4 THEN 'A'
        |       WHEN CAST(c.cum AS DECIMAL(18,2)) * 20 <= CAST((SELECT total FROM t) AS DECIMAL(18,2)) * 19 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM c ORDER BY l_partkey""".stripMargin,
    // JSON path extraction == json_extract_string; null-propagating casts
    "q185_json_props_rollup" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // gaps-and-islands: day − row_number() island key; longest streak,
    // ties to the earliest start
    "q186_activity_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |isl AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
        |  FROM days),
        |streaks AS (
        |  SELECT user_id, COUNT(*) AS streak_days,
        |    MIN(day) AS streak_start, MAX(day) AS streak_end
        |  FROM isl GROUP BY user_id, grp),
        |best AS (
        |  SELECT streaks.*, row_number() OVER (PARTITION BY user_id
        |    ORDER BY streak_days DESC, streak_start ASC) AS rn
        |  FROM streaks)
        |SELECT user_id, streak_days, streak_start, streak_end
        |FROM best WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // Pearson r from EXACT integer sufficient statistics; the three
    // assembled integers parse to double via VARCHAR (q166 convention)
    "q187_exact_correlation" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS sxy,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_items,
        |  CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
        |    / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
        |       * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE))) AS pearson_r
        |FROM s ORDER BY l_returnflag""".stripMargin,
    // per-cell chi-square contributions: expected from exact BIGINT
    // margins, square by multiplication (no libm pow), NO float total
    "q188_chi_square_cells" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, COUNT(*) AS observed
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, SUM(observed) AS r FROM cells GROUP BY 1),
        |ct AS (SELECT dow, SUM(observed) AS c FROM cells GROUP BY 1),
        |n AS (SELECT SUM(observed) AS n FROM cells)
        |SELECT cells.event_type, cells.dow, cells.observed,
        |  CAST(rt.r * ct.c AS DOUBLE) / CAST((SELECT n FROM n) AS DOUBLE) AS expected,
        |  (CAST(cells.observed AS DOUBLE) - CAST(rt.r * ct.c AS DOUBLE) / CAST((SELECT n FROM n) AS DOUBLE))
        |    * (CAST(cells.observed AS DOUBLE) - CAST(rt.r * ct.c AS DOUBLE) / CAST((SELECT n FROM n) AS DOUBLE))
        |    / (CAST(rt.r * ct.c AS DOUBLE) / CAST((SELECT n FROM n) AS DOUBLE)) AS chi_contrib
        |FROM cells
        |JOIN rt ON rt.event_type = cells.event_type
        |JOIN ct ON ct.dow = cells.dow
        |ORDER BY cells.event_type, cells.dow""".stripMargin,
    // per-user calendar densify (generate_series == Spark sequence) +
    // IGNORE NULLS forward carry; count coalesced to BIGINT zero
    "q165_gap_fill_forward" ->
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n, max(value) AS mx
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |cal AS (
        |  SELECT user_id,
        |    unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
        |  FROM d GROUP BY user_id),
        |j AS (SELECT cal.user_id, cal.day, d.n, d.mx
        |      FROM cal LEFT JOIN d ON cal.user_id = d.user_id AND cal.day = d.day)
        |SELECT user_id, day, CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
        |  last_value(mx IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_max
        |FROM j ORDER BY user_id, day""".stripMargin,
    // CUBE margins: detail, per-year, per-flag, grand total — one pass,
    // GROUPING bitmask separates margin NULLs from data NULLs
    "q166_shipping_cube" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year, l_returnflag,
        |  CAST(GROUPING(year(l_shipdate), l_returnflag) AS BIGINT) AS level,
        |  COUNT(*) AS n_items,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY CUBE (year(l_shipdate), l_returnflag)
        |ORDER BY 3, 1, 2""".stripMargin,
    // INTERSECT/EXCEPT carry SQL DISTINCT set semantics on both engines
    "q167_cohort_set_ops" ->
      """SELECT 'retained' AS op, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001)
        |UNION ALL
        |SELECT 'churned' AS op, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001)
        |ORDER BY op, o_custkey""".stripMargin,
    // ROLLUP subtotals: region -> nation -> grand total in one pass;
    // GROUPING bitmask disambiguates subtotal rows from NULL keys
    "q161_revenue_rollup" ->
      """SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS BIGINT) AS level,
        |  COUNT(*) AS n_orders,
        |  CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS total_revenue
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN orders ON o_custkey = c_custkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY 3, 1, 2""".stripMargin,
    // bucketed co-located join: the oracle joins the ORIGINAL parquet —
    // equality certifies the bucketed write+read round trip; the
    // exchange-free plan shape is spec-asserted
    "q160_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // fuzzy duplicate pairs: 8-token prefix keys, first-token blocking
    // with the 200-cap, exact integer levenshtein gate at <= 6
    "q159_fuzzy_dup_pairs" ->
      raw"""WITH k AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(
        |      string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '), 1, 8), ' ') AS key
        |  FROM documents),
        |b AS (SELECT doc_id, key, string_split(key, ' ')[1] AS blk FROM k),
        |capped AS (
        |  SELECT doc_id, key, blk FROM (
        |    SELECT doc_id, key, blk, count(*) OVER (PARTITION BY blk) AS bs FROM b)
        |  WHERE bs <= 200)
        |SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
        |  CAST(levenshtein(a.key, b2.key) AS BIGINT) AS edit_distance
        |FROM capped a JOIN capped b2 ON a.blk = b2.blk AND a.doc_id < b2.doc_id
        |WHERE levenshtein(a.key, b2.key) <= 6
        |ORDER BY id_a, id_b""".stripMargin,
    // deterministic HLL: sha60 buckets, rank via length(bin(rest))
    // integer arithmetic, raw estimate with the ascending-bucket pinned
    // fold of exact dyadic terms; exact count(distinct) alongside
    "q158_hll_cardinality" ->
      raw"""WITH t0 AS (
        |  SELECT source, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT source, unnest(CASE WHEN len(tk) < 3 THEN []
        |    ELSE list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS s
        |  FROM t0),
        |h AS (
        |  SELECT source, s, CAST(('0x' || substring(sha256('hll:' || s), 1, 15)) AS BIGINT) AS hv
        |  FROM sh),
        |br AS (SELECT source, hv % 64 AS bucket, hv // 64 AS rest FROM h),
        |rho AS (
        |  SELECT source, bucket,
        |    CASE WHEN rest = 0 THEN CAST(55 AS BIGINT)
        |         ELSE CAST(54 - length(bin(rest)) + 1 AS BIGINT) END AS rho
        |  FROM br),
        |regs AS (SELECT source, bucket, max(rho) AS register FROM rho GROUP BY 1, 2),
        |spine AS (
        |  SELECT s.source, g.b AS bucket
        |  FROM (SELECT DISTINCT source FROM documents) s,
        |       (SELECT unnest(generate_series(0, 63)) AS b) g),
        |fr AS (
        |  SELECT sp.source, sp.bucket, COALESCE(r.register, 0) AS register
        |  FROM spine sp LEFT JOIN regs r ON sp.source = r.source AND sp.bucket = r.bucket),
        |est AS (
        |  SELECT source,
        |    CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |      / list_reduce(
        |          list(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << register) AS DOUBLE) ORDER BY bucket),
        |          (a, b) -> a + b) AS hll_estimate,
        |    CAST(count(*) FILTER (register = 0) AS BIGINT) AS n_zero
        |  FROM fr GROUP BY source),
        |ex AS (SELECT source, CAST(count(DISTINCT s) AS BIGINT) AS exact_distinct FROM sh GROUP BY source)
        |SELECT e.source, ex.exact_distinct, e.hll_estimate, e.n_zero
        |FROM est e JOIN ex ON e.source = ex.source
        |ORDER BY e.source""".stripMargin,
    // stream-stream attribution: the converged left interval join — the
    // batch recompute certifies the stream because the fixture's
    // watermark delay (2h) exceeds the attribution window (1h) and drops
    // arrive in event-time order, so no valid match is ever evicted
    "q156_streaming_attribution" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id AS pu, ts AS pts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, c.user_id, c.click_ts, p.purchase_id, p.purchase_value
        |FROM c LEFT JOIN p
        |  ON c.user_id = p.pu AND p.pts >= c.click_ts AND p.pts <= c.click_ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    // native session_window sessions: batch gap-islands recompute with
    // Spark's BOUNDARY-INCLUSIVE merge rule (an event at exactly
    // prev + gap still merges — spec-pinned in StreamingSpec); only
    // ts > prev + gap starts a new session; session_end = last event + gap
    "q157_streaming_session_windows" ->
      """WITH l AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN pts IS NULL OR ts > pts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM l),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  user_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // exact phrase search: positions re-derived via generate_subscripts
    // (1-based, matching the index's posexplode+1), adjacency as
    // pos-minus-offset equi-joins — occurrence rows with positions
    "q153_phrase_search" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS ts
        |  FROM documents),
        |inst AS (SELECT doc_id, unnest(ts) AS token, generate_subscripts(ts, 1) AS pos FROM toks),
        |m0 AS (SELECT doc_id, pos AS start_pos FROM inst WHERE token = 'stream'),
        |m1 AS (SELECT doc_id, pos - 1 AS start_pos FROM inst WHERE token = 'table'),
        |m2 AS (SELECT doc_id, pos - 2 AS start_pos FROM inst WHERE token = 'hash')
        |SELECT m0.doc_id, CAST(m0.start_pos AS BIGINT) AS match_pos
        |FROM m0 JOIN m1 USING (doc_id, start_pos) JOIN m2 USING (doc_id, start_pos)
        |ORDER BY doc_id, match_pos""".stripMargin,
    // binary (1-bit) retrieval: sign-bit packing (32 bits per word — no
    // word touches the BIGINT sign bit), Hamming coarse top-50 via
    // XOR + popcount, exact cosine re-rank of the riders to top-10
    "q151_binary_retrieval" ->
      s"""WITH b AS (
        |  SELECT vec_id, embedding,
        |    list_transform(generate_series(0, 1), w ->
        |      CAST(list_reduce(list_transform(generate_series(1, 32),
        |        j -> CASE WHEN embedding[w * 32 + j] > CAST(0 AS DOUBLE)
        |                  THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE CAST(0 AS BIGINT) END),
        |        (x, y) -> x + y) AS BIGINT)) AS words
        |  FROM embeddings),
        |q AS (SELECT words AS qw, embedding AS qv FROM b WHERE vec_id = 0),
        |ham AS (
        |  SELECT vec_id, embedding,
        |    CAST(bit_count(xor(words[1], qw[1])) + bit_count(xor(words[2], qw[2])) AS BIGINT) AS hamming
        |  FROM b, q WHERE vec_id <> 0),
        |cand AS (SELECT vec_id, embedding, hamming FROM ham ORDER BY hamming, vec_id LIMIT 50),
        |rr AS (
        |  SELECT c.vec_id, c.hamming, ${cosineSql("c.embedding", "q.qv")} AS cosine_sim
        |  FROM cand c, q
        |  ORDER BY cosine_sim DESC, c.vec_id LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY cosine_sim DESC, vec_id) AS BIGINT) AS b_rank,
        |  vec_id, hamming, cosine_sim
        |FROM rr ORDER BY b_rank""".stripMargin,
    // pooled-space retrieval: q149's means reassembled per group, exact
    // cosine top-10 (group 0 holds the query chunk and is excluded)
    "q150_pooled_retrieval" ->
      s"""WITH pooled AS (
        |  SELECT group_id, dim,
        |    CAST(SUM(CAST(round(CAST(x AS DOUBLE) * 1073741824.0) AS DECIMAL(38,0))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) / 1073741824.0 AS m
        |  FROM (
        |    SELECT vec_id // 10 AS group_id,
        |      unnest(generate_series(0, len(embedding) - 1)) AS dim,
        |      unnest(embedding) AS x
        |    FROM embeddings)
        |  GROUP BY group_id, dim),
        |docs AS (SELECT group_id, list(m ORDER BY dim) AS vec FROM pooled GROUP BY group_id),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT group_id, cosine_sim FROM (
        |  SELECT d.group_id,
        |    ${cosineSql("d.vec", "q.qv")} AS cosine_sim
        |  FROM docs d, q WHERE d.group_id <> 0)
        |ORDER BY cosine_sim DESC, group_id LIMIT 10""".stripMargin,
    // fixed-point mean pooling (the certified k-means mean arithmetic) of
    // 10-chunk groups, long format — every component hash-certified
    "q149_pooled_chunk_embeddings" ->
      """SELECT group_id, dim,
        |  CAST(SUM(CAST(round(CAST(x AS DOUBLE) * 1073741824.0) AS DECIMAL(38,0))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) / 1073741824.0 AS pooled,
        |  CAST(COUNT(*) AS BIGINT) AS n_chunks
        |FROM (
        |  SELECT vec_id // 10 AS group_id,
        |    unnest(generate_series(0, len(embedding) - 1)) AS dim,
        |    unnest(embedding) AS x
        |  FROM embeddings)
        |GROUP BY group_id, dim
        |ORDER BY group_id, dim""".stripMargin,
    // IVF-SQ8: q39's seeded assignment + 2-probe pruning, with probed
    // lists scored by the shared int8 encode's integer dot
    "q148_ivf_sq8_retrieval" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |pd AS (
        |  SELECT unnest(generate_series(0, len(embedding) - 1)) AS dim, unnest(embedding) AS x
        |  FROM embeddings),
        |p2 AS (SELECT dim, min(CAST(x AS DOUBLE)) AS mn, max(CAST(x AS DOUBLE)) AS mx FROM pd GROUP BY dim),
        |prm AS (SELECT list(mn ORDER BY dim) AS mins, list(mx ORDER BY dim) AS maxs FROM p2),
        |sims AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    ${cosineSql("e.embedding", "c.cv")} AS s
        |  FROM embeddings e, c),
        |assign AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT vec_id, embedding, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM sims)
        |  WHERE rn = 1),
        |probe AS (
        |  SELECT cid FROM (
        |    SELECT c.cid, ${cosineSql("c.cv", "q.qv")} AS sq FROM c, q)
        |  ORDER BY sq DESC, cid LIMIT 2),
        |qc AS (
        |  SELECT list_transform(generate_series(1, len(q.qv)), i -> ${quantCodeSql("q.qv[i]")}) AS qcodes
        |  FROM q, prm),
        |scored AS (
        |  SELECT a.vec_id, a.cid,
        |    CAST(list_reduce(
        |      list_transform(generate_series(1, len(a.embedding)),
        |        i -> ${quantCodeSql("a.embedding[i]")} * qc.qcodes[i]),
        |      (x, y) -> x + y) AS BIGINT) AS qscore
        |  FROM assign a, qc, prm
        |  WHERE a.cid IN (SELECT cid FROM probe) AND a.vec_id <> 0),
        |top AS (SELECT vec_id, cid, qscore FROM scored ORDER BY qscore DESC, vec_id LIMIT 15)
        |SELECT CAST(row_number() OVER (ORDER BY qscore DESC, vec_id) AS BIGINT) AS sq_rank,
        |  vec_id, CAST(cid AS INTEGER) AS centroid_id, qscore
        |FROM top ORDER BY sq_rank""".stripMargin,
    // streaming quantized admission: corpus-slice calibration, int8 codes,
    // 8-plane Sha60 buckets with the 200-cap, admitted = arrivals with NO
    // same-bucket corpus row at integer code dot >= 30000
    "q147_streaming_quantized_dedup" ->
      ("WITH " + embSigCtes + ",\n" +
        s"""cd AS (
          |  SELECT unnest(generate_series(0, len(embedding) - 1)) AS dim, unnest(embedding) AS x
          |  FROM embeddings WHERE vec_id % 10 <> 0),
          |p2 AS (SELECT dim, min(CAST(x AS DOUBLE)) AS mn, max(CAST(x AS DOUBLE)) AS mx FROM cd GROUP BY dim),
          |prm AS (SELECT list(mn ORDER BY dim) AS mins, list(mx ORDER BY dim) AS maxs FROM p2),
          |corpcap AS (
          |  SELECT vec_id, embedding, sig FROM (
          |    SELECT vec_id, embedding, sig, count(*) OVER (PARTITION BY sig) AS bs
          |    FROM esigs WHERE vec_id % 10 <> 0)
          |  WHERE bs <= 200),
          |ccodes AS (
          |  SELECT sig, list_transform(generate_series(1, len(embedding)), i -> ${quantCodeSql("embedding[i]")}) AS codes
          |  FROM corpcap, prm),
          |arr AS (SELECT vec_id, embedding, sig FROM esigs WHERE vec_id % 10 = 0),
          |acodes AS (
          |  SELECT vec_id, sig, list_transform(generate_series(1, len(embedding)), i -> ${quantCodeSql("embedding[i]")}) AS codes
          |  FROM arr, prm),
          |hits AS (
          |  SELECT DISTINCT a.vec_id FROM acodes a JOIN ccodes c ON a.sig = c.sig
          |  WHERE CAST(list_reduce(list_transform(list_zip(a.codes, c.codes), z -> z[1] * z[2]),
          |    (x, y) -> x + y) AS BIGINT) >= CAST(30000 AS BIGINT))
          |SELECT vec_id FROM arr WHERE vec_id NOT IN (SELECT vec_id FROM hits)
          |ORDER BY vec_id""".stripMargin),
    // calibration drift: old = base-slice min/max, new = FULL-corpus
    // min/max from scratch (base ∪ delta = corpus, so this certifies the
    // mergeable-params fold); 0-based dims to match posexplode
    "q146_calibration_drift" ->
      """WITH db AS (
        |  SELECT unnest(generate_series(0, len(embedding) - 1)) AS dim, unnest(embedding) AS x
        |  FROM embeddings WHERE vec_id % 4 <> 1),
        |b AS (SELECT dim, min(CAST(x AS DOUBLE)) AS mn, max(CAST(x AS DOUBLE)) AS mx FROM db GROUP BY dim),
        |df AS (
        |  SELECT unnest(generate_series(0, len(embedding) - 1)) AS dim, unnest(embedding) AS x
        |  FROM embeddings),
        |f AS (SELECT dim, min(CAST(x AS DOUBLE)) AS mn, max(CAST(x AS DOUBLE)) AS mx FROM df GROUP BY dim)
        |SELECT CAST(b.dim AS BIGINT) AS dim, b.mn AS old_min, b.mx AS old_max,
        |  f.mn AS new_min, f.mx AS new_max,
        |  CAST(CASE WHEN f.mn < b.mn OR f.mx > b.mx THEN 1 ELSE 0 END AS BIGINT) AS drifted
        |FROM b JOIN f ON b.dim = f.dim
        |ORDER BY dim""".stripMargin,
    // RRF hybrid fusion: BM25 top-20 (lexical arm, the shared q141 CTE
    // chain) + exact cosine top-20 (semantic arm, the q40 arithmetic),
    // 1/(60+rank) contributions folded in retriever order
    "q145_hybrid_retrieval" ->
      s"""WITH ${bm25CoreCtes(Seq("dup", "merge"))},
        |lex AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
        |  FROM agg ORDER BY score DESC, doc_id LIMIT 20),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |sem AS (
        |  SELECT vec_id AS doc_id, CAST(row_number() OVER (ORDER BY cs DESC, vec_id) AS BIGINT) AS r
        |  FROM (
        |    SELECT e.vec_id, ${cosineSql("e.embedding", "q.qv")} AS cs
        |    FROM embeddings e, q WHERE e.vec_id <> 0)
        |  ORDER BY cs DESC, doc_id LIMIT 20),
        |contribs AS (
        |  SELECT doc_id, 0 AS src,
        |    CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(r AS DOUBLE)) AS c FROM lex
        |  UNION ALL
        |  SELECT doc_id, 1 AS src,
        |    CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(r AS DOUBLE)) AS c FROM sem),
        |fused AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS sources,
        |    list_reduce(list(c ORDER BY src), (a, b) -> a + b) AS rrf_score
        |  FROM contribs GROUP BY doc_id)
        |SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rrf_rank,
        |  doc_id, sources, rrf_score
        |FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,
    // int8 quantized retrieval: per-dim min/max calibration, the clamped
    // floor encode mirrored expression-for-expression, integer-dot coarse
    // ranking (exact, order-free), exact cosine joined for the winners
    "q144_quantized_retrieval" -> {
      def code(x: String): String = quantCodeSql(x)
      s"""WITH dims AS (
        |  SELECT unnest(generate_series(1, len(embedding))) AS dim, unnest(embedding) AS x
        |  FROM embeddings),
        |p AS (
        |  SELECT dim, min(CAST(x AS DOUBLE)) AS mn, max(CAST(x AS DOUBLE)) AS mx
        |  FROM dims GROUP BY dim),
        |prm AS (SELECT list(mn ORDER BY dim) AS mins, list(mx ORDER BY dim) AS maxs FROM p),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |qc AS (
        |  SELECT list_transform(generate_series(1, len(q.qv)), i -> ${code("q.qv[i]")}) AS qcodes
        |  FROM q, prm),
        |scored AS (
        |  SELECT e.vec_id,
        |    CAST(list_reduce(
        |      list_transform(generate_series(1, len(e.embedding)),
        |        i -> ${code("e.embedding[i]")} * qc.qcodes[i]),
        |      (a, b) -> a + b) AS BIGINT) AS qscore
        |  FROM embeddings e, prm, qc WHERE e.vec_id <> 0),
        |top AS (SELECT vec_id, qscore FROM scored ORDER BY qscore DESC, vec_id LIMIT 15)
        |SELECT CAST(row_number() OVER (ORDER BY t.qscore DESC, t.vec_id) AS BIGINT) AS q_rank,
        |  t.vec_id, t.qscore,
        |  ${cosineSql("e.embedding", "q.qv")} AS cosine_sim
        |FROM top t JOIN embeddings e ON t.vec_id = e.vec_id, q
        |ORDER BY q_rank""".stripMargin
    },
    // SemDeDup: q39's seeded nearest-centroid assignment (ties -> lowest
    // cid), per-cluster id-capped membership, then the one-pass pairwise
    // prune — dropped_by = min lower-id tau-similar same-cluster member
    "q143_semdedup_clusters" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
        |sims AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    ${cosineSql("e.embedding", "c.cv")} AS s
        |  FROM embeddings e, c),
        |assign AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT vec_id, embedding, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM sims)
        |  WHERE rn = 1),
        |capped AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT vec_id, embedding, cid,
        |      row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS cr
        |    FROM assign)
        |  WHERE cr <= 1000),
        |dropped AS (
        |  SELECT b.vec_id AS dup_id, min(a.vec_id) AS dropper
        |  FROM capped a JOIN capped b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= CAST(0.45 AS DOUBLE)
        |  GROUP BY b.vec_id)
        |SELECT s.vec_id, CAST(s.cid AS INTEGER) AS cluster_id,
        |  CAST(CASE WHEN d.dropper IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
        |  CAST(coalesce(d.dropper, -1) AS BIGINT) AS dropped_by
        |FROM assign s LEFT JOIN dropped d ON s.vec_id = d.dup_id
        |ORDER BY s.vec_id""".stripMargin,
    // the d×w counter grid rebuilt from scratch over the distinct-token
    // frame; estimates = min over the 4 rows at each probe's buckets
    "q138_cms_frequency" ->
      """WITH tc AS (
        |  SELECT token, count(*) AS cnt FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents)
        |  GROUP BY 1),
        |probes AS (SELECT token, cnt FROM tc ORDER BY cnt DESC, token LIMIT 20),
        |sk AS (
        |  SELECT j AS row_id,
        |    CAST(('0x' || substring(sha256('cms:' || CAST(j AS VARCHAR) || ':' || token), 1, 15)) AS BIGINT) % 32 AS bucket,
        |    CAST(sum(cnt) AS BIGINT) AS counter
        |  FROM tc, range(0, 4) t(j) GROUP BY 1, 2),
        |est AS (
        |  SELECT p.token, min(s.counter) AS cms_estimate
        |  FROM probes p, range(0, 4) t(j)
        |  JOIN sk s ON s.row_id = t.j
        |   AND s.bucket = CAST(('0x' || substring(sha256('cms:' || CAST(t.j AS VARCHAR) || ':' || p.token), 1, 15)) AS BIGINT) % 32
        |  GROUP BY 1)
        |SELECT p.token, p.cnt AS true_count, e.cms_estimate
        |FROM probes p JOIN est e ON p.token = e.token
        |ORDER BY true_count DESC, p.token""".stripMargin,
    // the two-stage funnel replayed: prefix-16 coarse top-50, exact
    // full-dimension re-rank to 10 — same fold arithmetic at both stages
    "q139_matryoshka_rerank" ->
      s"""WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        |coarse AS (
        |  SELECT vec_id, embedding,
        |    ${cosineSql("list_slice(embedding, 1, 16)", "list_slice(qv.q, 1, 16)")} AS coarse_sim
        |  FROM embeddings, qv WHERE vec_id <> 0
        |  ORDER BY coarse_sim DESC, vec_id LIMIT 50)
        |SELECT c.vec_id, c.coarse_sim, ${cosineSql("c.embedding", "qv.q")} AS cosine_sim
        |FROM coarse c, qv ORDER BY cosine_sim DESC, vec_id LIMIT 10""".stripMargin,
    // the one-day production capstone recomputed from scratch: exact +
    // near-dup admission of the % 10 = 5 delta (refreshDayCtes), the
    // 0.75 quality gate, the curriculum epoch tiers and seed-42 keys,
    // rolled up as the per-shard manifest q134's read-back must reproduce
    "q134_daily_production_run" ->
      ("WITH " + lshPrefixCtes("documents") + ",\n" +
        raw"""nrm AS (
          |  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
          |  FROM documents),
          |pop0 AS (SELECT doc_id FROM documents WHERE doc_id % 10 <> 5),
          |""".stripMargin +
        refreshDayCtes(0, "doc_id % 10 = 5") + ",\n" +
        s"""q AS (
          |  SELECT d.doc_id, $qualityScoreSql AS quality_score
          |  FROM documents d JOIN a1 USING (doc_id)),
          |e AS (
          |  SELECT doc_id,
          |    CAST(CASE WHEN quality_score >= 0.8 THEN 3
          |              WHEN quality_score >= 0.5 THEN 2 ELSE 1 END AS BIGINT) AS n_epochs
          |  FROM q WHERE quality_score >= 0.75),
          |s AS (
          |  SELECT doc_id, CAST(unnest(generate_series(1, n_epochs)) AS BIGINT) AS epoch_idx
          |  FROM e),
          |k AS (
          |  SELECT doc_id, epoch_idx,
          |    CAST(('0x' || substring(sha256('cur:42:' || CAST(epoch_idx AS VARCHAR)
          |      || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS order_key
          |  FROM s)
          |SELECT epoch_idx, CAST(order_key >> 57 AS INTEGER) AS shard,
          |  CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  min(order_key) AS min_key,
          |  max(order_key) AS max_key,
          |  CAST(bit_xor(order_key) AS BIGINT) AS key_digest
          |FROM k GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // the q121 two-day cascade on the embedding tier: day-1 admission
    // (q119's capped-bucket cosine probe) against the day-0 population,
    // day-2 admission against buckets REBUILT over population ∪ admitted₁
    "q125_embedding_index_refresh" ->
      ("WITH " + embSigCtes + ",\n" + embPop0Cte + ",\n" +
        embDayCtes(0, 200, "vec_id % 10 = 5") + ",\n" +
        embDayCtes(1, 200, "vec_id % 10 = 0") + "\n" +
        "SELECT vec_id FROM a2 ORDER BY vec_id"),
    // the q125 two-day embedding cascade recomputed from scratch, at the
    // q130 bucket cap (2 — chosen so 57 of the 194 day-0 hyperplane
    // buckets are genuine over-cap tombstones at sf0.01; q125's cap 200
    // never binds on this corpus, which would make the compaction and
    // tombstone-retention surface vacuous). Day 2 additionally RE-FETCHES
    // every delta-1 vector as an exact copy under -2*id-1 (identical
    // signature, cosine 1.0 with its original) — at cap 2 the fold's
    // effect on the plain day-2 delta vanishes (DuckDB-probed: fold-blind
    // oracle identical without the re-fetches), while a re-fetch of an
    // admitted vector is rejected exactly when the fold actually landed
    // its original in a live bucket. BOTH days' admitted sets are emitted
    // (the q127 lesson: per-day outputs make each fold and each
    // round-trip unmaskable).
    "q130_embedding_checkpointed_refresh" ->
      ("WITH " +
        """allvecs AS (
          |  SELECT vec_id, embedding FROM embeddings
          |  UNION ALL SELECT -vec_id * 2 - 1, embedding
          |    FROM embeddings WHERE vec_id % 10 = 5),
          |""".stripMargin + embSigCtesFrom("allvecs") + ",\n" + embPop0Cte + ",\n" +
        embDayCtes(0, 2, "vec_id >= 0 AND vec_id % 10 = 5") + ",\n" +
        embDayCtes(1, 2, "(vec_id >= 0 AND vec_id % 10 = 0) OR vec_id < 0") + "\n" +
        """SELECT CAST(1 AS INTEGER) AS day, vec_id FROM a1
          |UNION ALL SELECT CAST(2 AS INTEGER), vec_id FROM a2
          |ORDER BY day, vec_id""".stripMargin),
    // q83's argmax assignment rolled up per label; Simpson index as a
    // sequential fold over cid-ordered shares (only +,x,/ on doubles -> no
    // libm log whose ulps differ between engines)
    "q92_cluster_diversity" ->
      (s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
        |sims AS (
        |  SELECT e.vec_id, e.label, c.cid,
        |    ${cosineSql("e.embedding", "c.cv")} AS s
        |  FROM embeddings e, c),
        |assign AS (
        |  SELECT vec_id, label, cid FROM (
        |    SELECT vec_id, label, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM sims)
        |  WHERE rn = 1),
        |counts AS (SELECT label, cid, CAST(COUNT(*) AS BIGINT) AS n FROM assign GROUP BY 1, 2),
        |roll AS (
        |  SELECT label,
        |    CAST(SUM(n) AS BIGINT) AS n_vecs,
        |    CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |    CAST(MAX(n) AS BIGINT) AS max_n,
        |    list(n ORDER BY cid) AS dist
        |  FROM counts GROUP BY label)
        |SELECT label, n_vecs, n_clusters,
        |  CAST(max_n AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS top_share,
        |  CAST(1 AS DOUBLE) - list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(dist, x ->
        |      (CAST(x AS DOUBLE) / CAST(n_vecs AS DOUBLE)) * (CAST(x AS DOUBLE) / CAST(n_vecs AS DOUBLE)))),
        |    (a, b) -> a + b) AS simpson
        |FROM roll ORDER BY label""".stripMargin),
    // integer token sums under each candidate cap — all-BIGINT arithmetic
    "q93_truncation_impact" ->
      """WITH x AS (
        |  SELECT source, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(LEAST(n_tokens, 64)) AS BIGINT) AS kept_64,
        |  CAST(COUNT(CASE WHEN n_tokens > 64 THEN 1 END) AS BIGINT) AS cut_docs_64,
        |  CAST(SUM(LEAST(n_tokens, 128)) AS BIGINT) AS kept_128,
        |  CAST(COUNT(CASE WHEN n_tokens > 128 THEN 1 END) AS BIGINT) AS cut_docs_128,
        |  CAST(SUM(LEAST(n_tokens, 256)) AS BIGINT) AS kept_256,
        |  CAST(COUNT(CASE WHEN n_tokens > 256 THEN 1 END) AS BIGINT) AS cut_docs_256
        |FROM x GROUP BY source ORDER BY source""".stripMargin,
    // bigram-hash novelty of the doc_id % 5 <> 0 slice against the
    // doc_id % 5 = 0 reference vocabulary
    "q85_ngram_novelty" ->
      """WITH toksrc AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks FROM documents),
        |gh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) < 2 THEN CAST([] AS BIGINT[])
        |      ELSE list_transform(generate_series(1, CAST(len(toks) AS INTEGER) - 1),
        |        i -> CAST(('0x' || substring(sha256(toks[i] || ' ' || toks[i+1]), 1, 15)) AS BIGINT) % 2147483647) END) AS gs
        |  FROM toksrc),
        |ref AS (SELECT DISTINCT unnest(gs) AS g FROM gh WHERE doc_id % 5 = 0),
        |ex AS (SELECT doc_id, unnest(gs) AS g FROM gh WHERE doc_id % 5 <> 0),
        |seen AS (
        |  SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_seen
        |  FROM ex e JOIN ref r ON e.g = r.g GROUP BY e.doc_id),
        |tot AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams FROM gh WHERE doc_id % 5 <> 0)
        |SELECT t.doc_id, t.n_grams, CAST(COALESCE(s.n_seen, 0) AS BIGINT) AS n_seen,
        |  CASE WHEN t.n_grams > 0
        |       THEN CAST(1 AS DOUBLE) - CAST(COALESCE(s.n_seen, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
        |       ELSE CAST(0 AS DOUBLE) END AS novelty
        |FROM tot t LEFT JOIN seen s ON t.doc_id = s.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // hash-rank running token total per source, kept while the tokens
    // BEFORE a document are under the 1000-token budget (window SUM is
    // HUGEINT in DuckDB -> cast back to BIGINT)
    "q86_token_budget_sample" ->
      """WITH x AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS rk
        |  FROM documents),
        |y AS (
        |  SELECT doc_id, source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM x)
        |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM y WHERE cum_tokens - n_tokens < 1000
        |ORDER BY source, cum_tokens, doc_id""".stripMargin,
    // dyadic fractions only (1/4, 1/2, 3/4, 7/8): the interpolation on
    // integer counts is exact in both engines (the q20 rule)
    "q87_length_percentiles" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
        |  quantile_cont(n_tokens, 0.25) AS p25,
        |  quantile_cont(n_tokens, 0.5) AS p50,
        |  quantile_cont(n_tokens, 0.75) AS p75,
        |  quantile_cont(n_tokens, 0.875) AS p875,
        |  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
        |FROM (SELECT source, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,
    // q70's candidate pipeline (eval = vec_id % 10 = 0 probing the corpus
    // bucket index), reduced to the best match per eval item
    // (cosine desc, corpus id asc — bit-identical cosines across engines)
    "q88_embedding_contamination" ->
      ("WITH " + embSigCtes + ",\n" +
        s"""cbuck AS (
          |  SELECT sig, list(vec_id) AS cids
          |  FROM esigs WHERE vec_id % 10 <> 0
          |  GROUP BY sig HAVING count(*) <= 200),
          |cand AS (
          |  SELECT d.vec_id AS eval_id, d.embedding AS dvec, unnest(cb.cids) AS corpus_id
          |  FROM esigs d JOIN cbuck cb ON d.sig = cb.sig
          |  WHERE d.vec_id % 10 = 0),
          |scored AS (
          |  SELECT p.eval_id, p.corpus_id AS match_id,
          |    ${cosineSql("p.dvec", "c.embedding")} AS cosine_sim
          |  FROM cand p JOIN embeddings c ON p.corpus_id = c.vec_id),
          |kept AS (SELECT * FROM scored WHERE cosine_sim >= 0.25)
          |SELECT eval_id, match_id, max_cosine FROM (
          |  SELECT eval_id, match_id, cosine_sim AS max_cosine,
          |    row_number() OVER (PARTITION BY eval_id ORDER BY cosine_sim DESC, match_id) AS rn
          |  FROM kept)
          |WHERE rn = 1 ORDER BY eval_id""".stripMargin),
    // alpha=0.5 temperature quotas: integer sqrt-credits (ONE double op per
    // source, floored), integer credit total, integer division — no float
    // accumulation whose order could differ between engines
    "q89_temperature_mixture" ->
      """WITH counts AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
        |credits AS (
        |  SELECT source, CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000.0) AS BIGINT) AS credits
        |  FROM counts),
        |quotas AS (
        |  SELECT source,
        |    CAST((CAST(200 AS BIGINT) * credits) // (SELECT CAST(SUM(credits) AS BIGINT) FROM credits) AS BIGINT) AS quota
        |  FROM credits),
        |ranked AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT), doc_id
        |    ) AS BIGINT) AS sample_rank
        |  FROM documents)
        |SELECT r.doc_id, r.source, r.sample_rank, q.quota
        |FROM ranked r JOIN quotas q ON r.source = q.source
        |WHERE r.sample_rank <= q.quota
        |ORDER BY r.source, r.sample_rank""".stripMargin,
    // distinct (normalized-content-hash, source) pairs self-joined on the
    // hash with source_a < source_b — the same pair set the Spark side
    // enumerates from each hash's sorted source set. The fixture mirrors
    // every doc_id % 5 == 0 document under <source>_mirror (real cross-source
    // dupes) and NULLs out doc_id % 13 == 0 text (the equi-join drops NULL
    // hashes; the Spark side filters NULL text before grouping).
    "q90_cross_source_dup" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, source || '_mirror',
        |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END AS text
        |  FROM documents WHERE doc_id % 5 = 0),
        |hs AS (
        |  SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h, source
        |  FROM docs)
        |SELECT a.source AS source_a, b.source AS source_b, CAST(COUNT(*) AS BIGINT) AS n_shared_contents
        |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q94_knn_ivf_trained" -> kmeansIvfOracleSql(k = 4, iters = 2, nProbe = 2, topK = 10),
    // the q35 simhash CTEs with the q64 corpus/delta split: delta quarter-
    // blocks probe the corpus block index, capped count-first on the corpus
    // side (HAVING <= 200), full-Hamming verify at <= 16
    "q95_incremental_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS sh
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id, list_transform(sh, s -> CAST(('0x' || substring(sha256(s), 1, 15)) AS BIGINT)) AS hs
        |  FROM toks),
        |fps AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 60), b ->
        |      CASE WHEN 2 * len(list_filter(hs, h -> ((h >> b) & 1) = 1)) > len(hs)
        |           THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fp
        |  FROM hashed),
        |blockedc AS (
        |  SELECT f.doc_id, f.fp, q.q, (f.fp >> CAST(q.q * 16 AS INTEGER)) & 65535 AS qh
        |  FROM fps f, (SELECT unnest(range(0, 4)) AS q) q WHERE f.doc_id % 10 <> 0),
        |okb AS (SELECT q, qh FROM blockedc GROUP BY q, qh HAVING COUNT(*) <= 200),
        |blockedd AS (
        |  SELECT f.doc_id, f.fp, q.q, (f.fp >> CAST(q.q * 16 AS INTEGER)) & 65535 AS qh
        |  FROM fps f, (SELECT unnest(range(0, 4)) AS q) q WHERE f.doc_id % 10 = 0)
        |SELECT DISTINCT d.doc_id AS delta_id, c.doc_id AS corpus_id,
        |  bit_count(xor(d.fp, c.fp)) AS hamming
        |FROM blockedd d
        |JOIN blockedc c ON d.q = c.q AND d.qh = c.qh
        |JOIN okb ON okb.q = c.q AND okb.qh = c.qh
        |WHERE bit_count(xor(d.fp, c.fp)) <= 16
        |ORDER BY delta_id, corpus_id""".stripMargin,
    // the q52 recursive cluster CTEs rolled up twice: per cluster (size,
    // dropped docs/tokens for non-canonical members), then per cluster size
    "q96_dedup_savings" ->
      (dupClusterCtes +
        """SELECT cluster_size,
          |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
          |  CAST(SUM(docs_dropped) AS BIGINT) AS n_docs_dropped,
          |  CAST(SUM(toks_dropped) AS BIGINT) AS tokens_dropped
          |FROM (
          |  SELECT c.cluster_id,
          |    CAST(COUNT(*) AS BIGINT) AS cluster_size,
          |    CAST(SUM(CASE WHEN c.doc_id <> c.cluster_id THEN t.n_toks ELSE 0 END) AS BIGINT) AS toks_dropped,
          |    CAST(SUM(CASE WHEN c.doc_id <> c.cluster_id THEN 1 ELSE 0 END) AS BIGINT) AS docs_dropped
          |  FROM comp c
          |  JOIN (SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_toks FROM documents) t
          |    USING (doc_id)
          |  GROUP BY c.cluster_id)
          |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin),
    // the stream path's admitted set == arriving docs minus q64's matched
    // delta ids (same LSH family, same ≤50 bucket cap on the corpus index);
    // docs with no shingles (null/empty text) can match nothing → admitted
    "q97_streaming_admission" ->
      ("WITH " + lshPrefixCtes("documents") + ",\n" +
        """cbuck AS (
          |  SELECT band, bkey, list(doc_id) AS cids
          |  FROM banded WHERE doc_id % 10 <> 0
          |  GROUP BY band, bkey HAVING count(*) <= 50),
          |cand AS (
          |  SELECT DISTINCT d.doc_id AS delta_id, unnest(cb.cids) AS corpus_id
          |  FROM banded d JOIN cbuck cb ON d.band = cb.band AND d.bkey = cb.bkey
          |  WHERE d.doc_id % 10 = 0),
          |matched AS (
          |  SELECT DISTINCT delta_id FROM (
          |    SELECT p.delta_id,
          |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
          |    FROM cand p JOIN sigs a ON p.delta_id = a.doc_id JOIN sigs b ON p.corpus_id = b.doc_id)
          |  WHERE jaccard >= 0.5)
          |SELECT doc_id, source FROM documents
          |WHERE doc_id % 10 = 0 AND doc_id NOT IN (SELECT delta_id FROM matched)
          |ORDER BY doc_id""".stripMargin),
    // single-drop stream == the q86 batch rule verbatim (per-source
    // (sha60 rank, id) order, admit while the budget is not yet exhausted)
    "q98_streaming_token_budget" ->
      """WITH x AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS rk
        |  FROM documents),
        |y AS (
        |  SELECT doc_id, source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM x)
        |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM y WHERE cum_tokens - n_tokens < 1000
        |ORDER BY source, cum_tokens, doc_id""".stripMargin,
    // boilerplate-chunk removal: q74's chunk convention (20 normalized
    // tokens, md5-keyed df), chunks in >2 distinct docs dropped, text
    // rebuilt from survivors in chunk order (string_agg ORDER BY k ≡
    // Spark's index-filter HOF rebuild); a fully-boilerplate doc keeps its
    // row with '' text
    "q99_boilerplate_removal" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, t, unnest(generate_series(0, (len(t) - 1) // 20)) AS k FROM toks),
        |chunks AS (
        |  SELECT doc_id, k, array_to_string(list_slice(t, k * 20 + 1, k * 20 + 20), ' ') AS chunk
        |  FROM idx),
        |hashes AS (SELECT doc_id, k, chunk, md5(chunk) AS chunk_hash FROM chunks),
        |freq AS (
        |  SELECT chunk_hash, COUNT(*) AS nd
        |  FROM (SELECT DISTINCT doc_id, chunk_hash FROM hashes) GROUP BY chunk_hash),
        |bp AS (SELECT chunk_hash FROM freq WHERE nd > 2),
        |kept AS (
        |  SELECT doc_id, k, chunk FROM hashes
        |  WHERE chunk_hash NOT IN (SELECT chunk_hash FROM bp)),
        |agg AS (
        |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY k) AS clean_text,
        |    CAST(COUNT(*) AS BIGINT) AS n_chunks_kept
        |  FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks FROM hashes GROUP BY doc_id)
        |SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
        |  COALESCE(a.n_chunks_kept, 0) AS n_chunks_kept,
        |  t.n_chunks - COALESCE(a.n_chunks_kept, 0) AS n_chunks_dropped
        |FROM tot t LEFT JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    // incremental cluster maintenance: the oracle certifies the merge ≡
    // full-recompute invariant by re-clustering the UNION pair set (corpus
    // LSH pairs + delta LSH pairs + q64 cross probe — each side's bucket
    // cap applies to ITS OWN doc population, the incremental pipeline's
    // semantics) with the q52 recursive closure
    "q100_incremental_clusters" ->
      ("WITH RECURSIVE " + lshPrefixCtes("documents") + ",\n" +
        """cbkts AS (
          |  SELECT band, bkey, list_sort(list(doc_id)) AS ids
          |  FROM banded WHERE doc_id % 10 <> 0
          |  GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 50),
          |ccand AS (
          |  SELECT DISTINCT pr.a AS id_a, pr.b AS id_b FROM (
          |    SELECT UNNEST(flatten(list_transform(range(1, CAST(len(ids) AS INTEGER)), i ->
          |      list_transform(ids[i+1:], x -> {'a': ids[i], 'b': x})))) AS pr
          |    FROM cbkts)),
          |dbkts AS (
          |  SELECT band, bkey, list_sort(list(doc_id)) AS ids
          |  FROM banded WHERE doc_id % 10 = 0
          |  GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 50),
          |dcand AS (
          |  SELECT DISTINCT pr.a AS id_a, pr.b AS id_b FROM (
          |    SELECT UNNEST(flatten(list_transform(range(1, CAST(len(ids) AS INTEGER)), i ->
          |      list_transform(ids[i+1:], x -> {'a': ids[i], 'b': x})))) AS pr
          |    FROM dbkts)),
          |xbuck AS (
          |  SELECT band, bkey, list(doc_id) AS cids
          |  FROM banded WHERE doc_id % 10 <> 0
          |  GROUP BY band, bkey HAVING count(*) <= 50),
          |xcand AS (
          |  SELECT DISTINCT d.doc_id AS id_a, unnest(cb.cids) AS id_b
          |  FROM banded d JOIN xbuck cb ON d.band = cb.band AND d.bkey = cb.bkey
          |  WHERE d.doc_id % 10 = 0),
          |allcand AS (
          |  SELECT id_a, id_b FROM ccand
          |  UNION SELECT id_a, id_b FROM dcand
          |  UNION SELECT id_a, id_b FROM xcand),
          |dup AS (
          |  SELECT id_a, id_b FROM (
          |    SELECT p.id_a, p.id_b,
          |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
          |    FROM allcand p JOIN sigs a ON p.id_a = a.doc_id JOIN sigs b ON p.id_b = b.doc_id)
          |  WHERE jaccard >= 0.5),
          |edges AS (SELECT id_a AS src, id_b AS dst FROM dup UNION SELECT id_b, id_a FROM dup),
          |reach AS (
          |  SELECT src AS id, src AS r FROM edges
          |  UNION
          |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON reach.id = e.src WHERE reach.r < e.dst),
          |comp AS MATERIALIZED (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
          |SELECT c.doc_id, c.cluster_id, s.cluster_size
          |FROM comp c
          |JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          |      FROM comp GROUP BY cluster_id) s USING (cluster_id)
          |ORDER BY c.doc_id""".stripMargin),
    "q101_bloom_incremental_dedup" ->
      """WITH corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
        |delta AS (
        |  SELECT doc_id, text, source, n_chars FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text, source, n_chars
        |  FROM corpus WHERE doc_id % 25 = 1),
        |cn AS (
        |  SELECT DISTINCT regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
        |  FROM corpus)
        |SELECT d.doc_id, d.source, d.n_chars FROM delta d
        |WHERE NOT EXISTS (SELECT 1 FROM cn
        |  WHERE cn.t = regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g'))
        |ORDER BY d.doc_id""".stripMargin,
    "q102_knn_pq" ->
      pqOracleSql(numSub = 8, subDim = 8, codes = 16, iters = 2, topK = 10),
    // stage windows use the default RANGE frame (ts-peers included) and
    // STRICT prev < ts progression — tie-order independent in both engines
    "q103_event_funnel" ->
      """WITH s0 AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts) AS q0
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, ts, event_type, q0,
        |    min(CASE WHEN event_type = 'click' AND q0 < ts THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts) AS q1
        |  FROM s0),
        |s2 AS (
        |  SELECT user_id, q0, q1,
        |    min(CASE WHEN event_type = 'purchase' AND q1 < ts THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts) AS q2
        |  FROM s1),
        |per AS (
        |  SELECT user_id, min(q0) AS t0, min(q1) AS t1, min(q2) AS t2
        |  FROM s2 GROUP BY user_id),
        |c AS (SELECT count(t0) AS n0, count(t1) AS n1, count(t2) AS n2 FROM per)
        |SELECT * FROM (
        |  SELECT 0 AS stage_idx, 'view' AS stage, n0 AS n_users,
        |    CAST(NULL AS DOUBLE) AS pct_of_prev FROM c
        |  UNION ALL SELECT 1, 'click', n1,
        |    CASE WHEN n0 > 0 THEN CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE) END FROM c
        |  UNION ALL SELECT 2, 'purchase', n2,
        |    CASE WHEN n1 > 0 THEN CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END FROM c)
        |ORDER BY stage_idx""".stripMargin,
    // last window ends at the doc's end (list slicing clamps in both
    // engines); docs of <= 30 tokens yield exactly one window
    "q104_context_windows" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) <= 30 THEN 1
        |         ELSE CAST(1 + ((len(toks) - 30 + 20 - 1) // 20) AS INTEGER) END AS nw
        |  FROM t)
        |SELECT doc_id, window_idx,
        |  CAST(len(toks[window_idx * 20 + 1 : window_idx * 20 + 30]) AS BIGINT) AS n_tokens,
        |  array_to_string(toks[window_idx * 20 + 1 : window_idx * 20 + 30], ' ') AS window_text
        |FROM (SELECT doc_id, toks, CAST(unnest(range(0, nw)) AS INTEGER) AS window_idx FROM w)
        |ORDER BY doc_id, window_idx""".stripMargin,
    // split bucket hashed on the q52 cluster id (own id when unclustered):
    // near-dup pairs can never straddle train/val/test
    "q105_leakage_proof_split" ->
      (dupClusterCtes +
        """SELECT doc_id,
          |  CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
          |FROM (
          |  SELECT d.doc_id,
          |    CAST(('0x' || substring(sha256('split:' || CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS h
          |  FROM documents d LEFT JOIN comp c USING (doc_id))
          |ORDER BY doc_id""".stripMargin),
    // exact semantics of the sketch+recount composition: every trigram with
    // count strictly above 1/5000 of all trigram instances, exact counts
    "q106_frequent_grams" -> freqGramsOracleSql(k = 5000),
    // the plain join IS the oracle: salting must be result-invisible
    "q107_salted_join" ->
      """SELECT s_nationkey,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q108_key_skew_profile" ->
      """WITH c AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS key_count
        |  FROM orders GROUP BY o_custkey),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(key_count) AS BIGINT) AS total_rows,
        |    CAST(quantile_cont(key_count, 0.5) AS DOUBLE) AS median_count
        |  FROM c)
        |SELECT o_custkey, key_count, n_keys, total_rows, median_count,
        |  CAST(key_count AS DOUBLE) / median_count AS skew_ratio
        |FROM c, s ORDER BY key_count DESC, o_custkey LIMIT 10""".stripMargin,
    // stream path: the micro-batched sketch + recount must equal the exact
    // batch answer — same form as q106, k = 4000
    "q109_streaming_frequent_grams" -> freqGramsOracleSql(k = 4000),
    // weight = 1/cluster_size (1.0 unclustered): each near-dup cluster
    // contributes one document-equivalent of training mass in expectation
    "q110_soft_dedup_weights" ->
      (dupClusterCtes +
        """SELECT d.doc_id,
          |  CAST(COALESCE(s.cluster_size, 1) AS BIGINT) AS cluster_size,
          |  CAST(1 AS DOUBLE) / CAST(COALESCE(s.cluster_size, 1) AS DOUBLE) AS weight
          |FROM documents d
          |LEFT JOIN comp c ON d.doc_id = c.doc_id
          |LEFT JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          |           FROM comp GROUP BY cluster_id) s
          |  ON c.cluster_id = s.cluster_id
          |ORDER BY d.doc_id""".stripMargin),
    // q32's quality tiers decide the epoch count (>=0.8 -> 3, >=0.5 -> 2)
    "q111_epoch_schedule" ->
      raw"""WITH q AS (
        |  SELECT doc_id,
        |    $qualityScoreSql AS quality_score
        |  FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN quality_score >= 0.8 THEN 3
        |              WHEN quality_score >= 0.5 THEN 2 ELSE 1 END AS BIGINT) AS n_epochs
        |  FROM q)
        |SELECT doc_id, n_epochs, CAST(unnest(generate_series(1, n_epochs)) AS BIGINT) AS epoch_idx
        |FROM e ORDER BY doc_id, epoch_idx""".stripMargin,
    // the decontamination ACTION on q54's split: drop training docs with
    // >= 90% distinct-bigram overlap vs the eval vocabulary; docs too short
    // for a bigram are kept (nothing to leak)
    "q112_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, source, text,
        |    string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |ev AS (SELECT * FROM toks WHERE doc_id % 17 = 0),
        |tr AS (SELECT * FROM toks WHERE doc_id % 17 <> 0),
        |evocab AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, CAST(len(t) AS INTEGER)), i -> t[i] || ' ' || t[i+1]))) AS gram
        |  FROM ev),
        |tg AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, CAST(len(t) AS INTEGER)), i -> t[i] || ' ' || t[i+1]))) AS gram
        |  FROM tr),
        |rate AS (
        |  SELECT tg.doc_id, COUNT(*) AS n, COUNT(e.gram) AS c
        |  FROM tg LEFT JOIN evocab e USING (gram) GROUP BY tg.doc_id),
        |bad AS (SELECT doc_id FROM rate WHERE CAST(c AS DOUBLE) / CAST(n AS DOUBLE) >= 0.9)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens
        |FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        |GROUP BY source ORDER BY source""".stripMargin,
    // q64's incremental LSH probe with the eval set (doc_id % 17 = 0) as the
    // delta; train docs matched at jaccard >= 0.5 are dropped
    "q113_neardup_decontaminate" ->
      ("WITH " + lshPrefixCtes("documents") + ",\n" +
        """cbuck AS (
          |  SELECT band, bkey, list(doc_id) AS cids
          |  FROM banded WHERE doc_id % 17 <> 0
          |  GROUP BY band, bkey HAVING count(*) <= 50),
          |cand AS (
          |  SELECT DISTINCT d.doc_id AS delta_id, unnest(cb.cids) AS corpus_id
          |  FROM banded d JOIN cbuck cb ON d.band = cb.band AND d.bkey = cb.bkey
          |  WHERE d.doc_id % 17 = 0),
          |bad AS (
          |  SELECT DISTINCT corpus_id FROM (
          |    SELECT p.corpus_id,
          |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
          |    FROM cand p JOIN sigs a ON p.delta_id = a.doc_id JOIN sigs b ON p.corpus_id = b.doc_id)
          |  WHERE jaccard >= 0.5)
          |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          |FROM documents
          |WHERE doc_id % 17 <> 0 AND doc_id NOT IN (SELECT corpus_id FROM bad)
          |GROUP BY source ORDER BY source""".stripMargin),
    // the stream's final complete-mode row must equal the whole-corpus gate
    // attrition (q66's first stages: quality >= 0.5, distinct ratio >= 0.3)
    "q114_streaming_curation_funnel" ->
      raw"""WITH scored AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t,
        |    $qualityScoreSql AS qs
        |  FROM documents)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
        |  CAST(COUNT(*) FILTER (WHERE qs >= 0.5) AS BIGINT) AS n_after_quality,
        |  CAST(COUNT(*) FILTER (WHERE qs >= 0.5
        |    AND CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) >= 0.3) AS BIGINT) AS n_curated
        |FROM scored""".stripMargin,
    // the stream's final complete-mode rows must equal the whole-corpus
    // per-source statistics (q82's count columns)
    "q115_streaming_corpus_report" ->
      raw"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(SUM(len(regexp_extract_all(text, '\S+'))), 0) AS BIGINT) AS total_tokens,
        |  CAST(COUNT(CASE WHEN
        |    $qualityScoreSql >= 0.5 THEN 1 END) AS BIGINT) AS n_quality_pass,
        |  CAST(COUNT(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 END) AS BIGINT) AS n_empty
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // the stream's append-mode survivors must equal the batch gate rows:
    // quality >= 0.5, distinct ratio >= 0.3, q33's language CASE, q59's mask
    "q116_streaming_curate" ->
      raw"""WITH scored AS (
        |  SELECT doc_id, source, text,
        |    string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t,
        |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS cjk,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|mit)\b')) AS s_de,
        |    len(regexp_extract_all(lower(text), '\b(the|is|of|and|that|with|for|this)\b')) AS s_en,
        |    len(regexp_extract_all(lower(text), '\b(el|los|las|una|está|por|con|para)\b')) AS s_es,
        |    len(regexp_extract_all(lower(text), '\b(le|les|des|est|dans|pour|avec|une)\b')) AS s_fr,
        |    $qualityScoreSql AS quality_score
        |  FROM documents)
        |SELECT doc_id, source,
        |  CASE WHEN cjk > 0 THEN 'zh'
        |       WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |       WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
        |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
        |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
        |       ELSE 'fr' END AS predicted_lang,
        |  quality_score,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS text
        |FROM scored
        |WHERE quality_score >= 0.5
        |  AND CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) >= 0.3
        |ORDER BY doc_id""".stripMargin,
    // per cluster: the member with the highest q32 quality score, ties by id
    "q118_canonical_selection" ->
      (dupClusterCtes +
        raw"""SELECT cluster_id, doc_id AS canonical_id, quality_score AS canonical_quality FROM (
             |  SELECT c.cluster_id, c.doc_id,
             |    $qualityScoreSql AS quality_score,
             |    row_number() OVER (PARTITION BY c.cluster_id
             |      ORDER BY $qualityScoreSql DESC, c.doc_id) AS rn
             |  FROM comp c JOIN documents USING (doc_id))
             |WHERE rn = 1 ORDER BY cluster_id""".stripMargin),
    // NOT EXISTS (not NOT IN): anti-join null-key semantics must match
    "q117_streaming_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h
        |  FROM documents WHERE doc_id % 10 <> 0)
        |SELECT doc_id, source FROM documents d
        |WHERE doc_id % 10 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM corpus c
        |  WHERE c.h = md5(regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g')))
        |ORDER BY doc_id""".stripMargin,
  )

  /** Shared q76/q77 oracle prefix: the silver.crm_sales cleaning rules
    * (Silver.cleanCrmSales) replicated stage by stage over the raw CSV —
    * trim keys, cast numerics, 0-sentinel yyyymmdd dates, sales repair to
    * qty × |price| on null/non-positive/mismatch, price back-derivation.
    * Ends with CTE `ssilver(sls_ord_num … sls_price)`.
    */
  private val silverSalesCtes: String =
    """sraw AS (
      |  SELECT * FROM read_csv('/root/reference/datasets/source_crm/sales_details.csv', header=true, all_varchar=true)),
      |styped AS (
      |  SELECT trim(sls_ord_num) AS sls_ord_num, trim(sls_prd_key) AS sls_prd_key,
      |    CAST(sls_cust_id AS BIGINT) AS sls_cust_id,
      |    sls_order_dt AS od, sls_ship_dt AS sd, sls_due_dt AS dd,
      |    CAST(sls_sales AS BIGINT) AS raw_sales,
      |    CAST(sls_quantity AS BIGINT) AS qty,
      |    CAST(sls_price AS BIGINT) AS raw_price
      |  FROM sraw),
      |sfixed AS (
      |  SELECT sls_ord_num, sls_prd_key, sls_cust_id,
      |    CASE WHEN od IS NULL OR CAST(od AS BIGINT) <= 0 OR length(od) != 8
      |         THEN NULL ELSE CAST(try_strptime(od, '%Y%m%d') AS DATE) END AS sls_order_dt,
      |    CASE WHEN sd IS NULL OR CAST(sd AS BIGINT) <= 0 OR length(sd) != 8
      |         THEN NULL ELSE CAST(try_strptime(sd, '%Y%m%d') AS DATE) END AS sls_ship_dt,
      |    CASE WHEN dd IS NULL OR CAST(dd AS BIGINT) <= 0 OR length(dd) != 8
      |         THEN NULL ELSE CAST(try_strptime(dd, '%Y%m%d') AS DATE) END AS sls_due_dt,
      |    CASE WHEN raw_sales IS NULL OR raw_sales <= 0 OR raw_sales != qty * abs(raw_price)
      |         THEN qty * abs(raw_price) ELSE raw_sales END AS sls_sales,
      |    qty AS sls_quantity, raw_price
      |  FROM styped),
      |ssilver AS (
      |  SELECT sls_ord_num, sls_prd_key, sls_cust_id, sls_order_dt, sls_ship_dt, sls_due_dt,
      |    sls_sales, sls_quantity,
      |    CAST(CASE WHEN raw_price IS NULL OR raw_price <= 0
      |         THEN CAST(sls_sales AS DOUBLE) / CAST((CASE WHEN sls_quantity != 0 THEN sls_quantity END) AS DOUBLE)
      |         ELSE CAST(raw_price AS DOUBLE) END AS DOUBLE) AS sls_price
      |  FROM sfixed)""".stripMargin

  /** q94 oracle: the trained-k-means IVF probe, with each Lloyd iteration
    * unrolled as an assign→means→centroid CTE triple. Replicates
    * Similarity.kmeansCentroids term for term: every-step-th seeding by id,
    * argmax assignment (ties → lowest cid), and the fixed-point centroid
    * mean — round(x·2³⁰) summed as DECIMAL(38,0), divided back out — whose
    * integer summation is order-independent, making the trained centroids
    * (and the probe ranking over them) bit-identical across engines. Empty
    * clusters COALESCE to their previous centroid, as in the Scala loop.
    */
  private def kmeansIvfOracleSql(k: Int, iters: Int, nProbe: Int, topK: Int): String = {
    def iterCtes(i: Int): String = {
      val prev = s"c${i - 1}"
      s"""assign$i AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT e.vec_id, e.embedding, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosineSql("e.embedding", "c.cv")} DESC, c.cid) AS rn
         |    FROM embeddings e, $prev c)
         |  WHERE rn = 1),
         |means$i AS (
         |  SELECT cid, dim,
         |    CAST(SUM(CAST(round(CAST(x AS DOUBLE) * 1073741824.0) AS DECIMAL(38,0))) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) / 1073741824.0 AS m
         |  FROM (SELECT cid, unnest(generate_series(1, len(embedding))) AS dim, unnest(embedding) AS x FROM assign$i)
         |  GROUP BY cid, dim),
         |c$i AS (
         |  SELECT s.cid, COALESCE(nc.cv, s.cv) AS cv
         |  FROM $prev s LEFT JOIN (SELECT cid, list(m ORDER BY dim) AS cv FROM means$i GROUP BY cid) nc
         |    ON s.cid = nc.cid)""".stripMargin
    }
    s"""WITH stepn AS (SELECT GREATEST(COUNT(*) // $k, 1) AS step FROM embeddings),
       |c0 AS (
       |  SELECT CAST(rn - 1 AS INTEGER) AS cid, list_transform(cv, v -> CAST(v AS DOUBLE)) AS cv FROM (
       |    SELECT row_number() OVER (ORDER BY vec_id) AS rn, embedding AS cv
       |    FROM embeddings, stepn WHERE vec_id % stepn.step = 0
       |    ORDER BY vec_id LIMIT $k)),
       |${(1 to iters).map(iterCtes).mkString(",\n")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT cid FROM (
       |    SELECT c.cid, ${cosineSql("c.cv", "q.qv")} AS sq FROM c$iters c, q)
       |  ORDER BY sq DESC, cid LIMIT $nProbe),
       |fassign AS (
       |  SELECT vec_id, embedding FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosineSql("e.embedding", "c.cv")} DESC, c.cid) AS rn
       |    FROM embeddings e, c$iters c)
       |  WHERE rn = 1 AND cid IN (SELECT cid FROM probe))
       |SELECT vec_id, cosine_sim FROM (
       |  SELECT a.vec_id, ${cosineSql("a.embedding", "q.qv")} AS cosine_sim
       |  FROM fassign a, q WHERE a.vec_id <> 0)
       |ORDER BY cosine_sim DESC, vec_id LIMIT $topK""".stripMargin
  }

  /** DuckDB replica of the q102 PQ pipeline: per-subspace fixed-point
    * k-means (all subspaces as one (sub, code) codebook relation), encode,
    * and ADC ranking. Fold orders mirror the Spark side exactly: per-pair
    * squared-L2 is a left fold FROM 0.0 in dim order; the ADC sum is a
    * left fold over the subspace-ordered distance list WITHOUT a seed
    * (Spark reduces d0+d1+… left-associatively).
    */
  private def pqOracleSql(
      numSub: Int, subDim: Int, codes: Int, iters: Int, topK: Int): String = {
    def l2sq(a: String, b: String): String =
      s"""list_reduce(list_prepend(0.0, list_transform(list_zip($a, $b), z -> (z[1] - z[2]) * (z[1] - z[2]))), (x, y) -> x + y)"""
    def assignFrom(book: String): String =
      s"""SELECT vec_id, sub, sv, code FROM (
         |    SELECT v.vec_id, v.sub, v.sv, b.code,
         |      row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY ${l2sq("v.sv", "b.cv")} ASC, b.code) AS rn
         |    FROM subv v JOIN $book b ON v.sub = b.sub)
         |  WHERE rn = 1""".stripMargin
    def iterCtes(i: Int): String = {
      val prev = s"b${i - 1}"
      s"""assign$i AS (
         |  ${assignFrom(prev)}),
         |means$i AS (
         |  SELECT sub, code, dim,
         |    CAST(SUM(CAST(round(x * 1073741824.0) AS DECIMAL(38,0))) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) / 1073741824.0 AS m
         |  FROM (SELECT sub, code, unnest(generate_series(1, len(sv))) AS dim, unnest(sv) AS x FROM assign$i)
         |  GROUP BY sub, code, dim),
         |b$i AS (
         |  SELECT p.sub, p.code, COALESCE(nc.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN (SELECT sub, code, list(m ORDER BY dim) AS cv FROM means$i GROUP BY sub, code) nc
         |    ON p.sub = nc.sub AND p.code = nc.code)""".stripMargin
    }
    s"""WITH subs AS (SELECT CAST(unnest(range(0, $numSub)) AS INTEGER) AS sub),
       |stepn AS (SELECT GREATEST(COUNT(*) // $codes, 1) AS step FROM embeddings),
       |seeds AS (
       |  SELECT CAST(rn - 1 AS INTEGER) AS code, cv FROM (
       |    SELECT row_number() OVER (ORDER BY vec_id) AS rn,
       |      list_transform(embedding, v -> CAST(v AS DOUBLE)) AS cv
       |    FROM embeddings, stepn WHERE vec_id % stepn.step = 0
       |    ORDER BY vec_id LIMIT $codes)),
       |b0 AS (
       |  SELECT t.sub, s.code, s.cv[t.sub * $subDim + 1 : t.sub * $subDim + $subDim] AS cv
       |  FROM seeds s, subs t),
       |subv AS (
       |  SELECT e.vec_id, t.sub,
       |    list_transform(e.embedding[t.sub * $subDim + 1 : t.sub * $subDim + $subDim], v -> CAST(v AS DOUBLE)) AS sv
       |  FROM embeddings e, subs t),
       |${(1 to iters).map(iterCtes).mkString(",\n")},
       |vcodes AS (
       |  ${assignFrom(s"b$iters")}),
       |q AS (
       |  SELECT t.sub,
       |    list_transform(e.embedding[t.sub * $subDim + 1 : t.sub * $subDim + $subDim], v -> CAST(v AS DOUBLE)) AS qs
       |  FROM embeddings e, subs t WHERE e.vec_id = 0),
       |dtab AS (
       |  SELECT b.sub, b.code, ${l2sq("q.qs", "b.cv")} AS d
       |  FROM b$iters b JOIN q ON b.sub = q.sub)
       |SELECT vec_id, adc_dist FROM (
       |  SELECT c.vec_id, list_reduce(list(t.d ORDER BY c.sub), (x, y) -> x + y) AS adc_dist
       |  FROM vcodes c JOIN dtab t ON c.sub = t.sub AND c.code = t.code
       |  WHERE c.vec_id <> 0
       |  GROUP BY c.vec_id)
       |ORDER BY adc_dist ASC, vec_id LIMIT $topK""".stripMargin
  }

  /** q137 oracle: from-scratch BPE merge induction over the word-frequency
    * table. Per step `k`: `best{k}` is the argmax pair (count desc, then
    * lhs/rhs ascending) over the symbols AFTER merges 1..k−1; `app{k}` is a
    * recursive CTE replaying the greedy left-to-right merge fold per word
    * (the same (emitted-prefix, pending-symbol) state machine as the Spark
    * `aggregate` fold); `syms{k}` flushes the pending symbol. The
    * MATERIALIZED hints are load-bearing: without them DuckDB re-inlines
    * the entire prefix pipeline into every iteration of every downstream
    * recursion and the query never finishes.
    */
  private def bpeCtes(n: Int): String = {
    def step(k: Int): String =
      s"""best$k AS MATERIALIZED (
        |  SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS c FROM (
        |    SELECT unnest(syms[1:len(syms)-1]) AS lhs, unnest(syms[2:len(syms)]) AS rhs, freq
        |    FROM syms${k - 1} WHERE len(syms) >= 2)
        |  GROUP BY 1, 2 ORDER BY c DESC, lhs, rhs LIMIT 1),
        |app$k AS (
        |  SELECT word, freq, syms, 1 AS i, CAST([] AS VARCHAR[]) AS out, CAST(NULL AS VARCHAR) AS pend
        |  FROM syms${k - 1}
        |  UNION ALL
        |  SELECT a.word, a.freq, a.syms, a.i + 1,
        |    CASE WHEN a.pend IS NULL THEN a.out
        |         WHEN a.pend = b.lhs AND a.syms[a.i] = b.rhs THEN list_append(a.out, a.pend || a.syms[a.i])
        |         ELSE list_append(a.out, a.pend) END,
        |    CASE WHEN a.pend IS NULL THEN a.syms[a.i]
        |         WHEN a.pend = b.lhs AND a.syms[a.i] = b.rhs THEN NULL
        |         ELSE a.syms[a.i] END
        |  FROM app$k a, best$k b WHERE a.i <= len(a.syms)),
        |syms$k AS MATERIALIZED (
        |  SELECT word, freq,
        |    CASE WHEN pend IS NULL THEN out ELSE list_append(out, pend) END AS syms
        |  FROM app$k WHERE i = len(syms) + 1)""".stripMargin
    """WITH RECURSIVE words AS MATERIALIZED (
      |  SELECT w AS word, count(*) AS freq FROM (
      |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents)
      |  GROUP BY 1),
      |syms0 AS MATERIALIZED (SELECT word, freq, regexp_extract_all(word, '[a-z0-9]') AS syms FROM words),
      |""".stripMargin +
      (1 to n).map(step).mkString(",\n")
  }

  /** BM25 oracle, shared by q141 (direct build) and q142 (refreshed-index
    * probe — the oracle rebuilds from the FULL corpus from scratch, which
    * is exactly what certifies refresh ≡ rebuild). Mirrors
    * [[graft.operators.Retrieval.bm25Probe]]'s arithmetic contract:
    * rational idf (no `ln` — libm is not bit-stable across engines), every
    * literal cast to DOUBLE (DuckDB types bare literals DECIMAL), and the
    * per-doc sum folded in ascending-token order via `list_reduce` (the
    * first element serves as init; `0.0 + c` ≡ `c` so it matches Spark's
    * zero-seeded `aggregate` fold bit-for-bit). The CTE chain (ending in
    * `agg(doc_id, matched_terms, score)`) lives in [[bm25CoreCtes]],
    * reused VERBATIM by q141/q142 (direct/refreshed probes) and q145
    * (the lexical arm of the hybrid fusion) so the scoring arithmetic
    * cannot drift between certifications.
    */
  private def bm25CoreCtes(terms: Seq[String], docFilter: String = "TRUE"): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    raw"""toks AS (
      |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS ts
      |  FROM documents WHERE $docFilter),
      |stats AS (SELECT count(*) AS n_docs, sum(len(ts)) AS total_tokens FROM toks),
      |inst AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS token FROM toks),
      |post AS (
      |  SELECT doc_id, dl, token, count(*) AS tf FROM inst
      |  WHERE token IN ($termList) GROUP BY 1, 2, 3),
      |dfc AS (SELECT token, count(*) AS df_count FROM post GROUP BY 1),
      |contrib AS (
      |  SELECT p.doc_id, p.token,
      |    ((CAST(s.n_docs - d.df_count AS DOUBLE) + CAST(0.5 AS DOUBLE))
      |      / (CAST(d.df_count AS DOUBLE) + CAST(0.5 AS DOUBLE)))
      |    * ((CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
      |      / (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |         * ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE)
      |            * (CAST(p.dl AS DOUBLE)
      |               / (CAST(s.total_tokens AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))) AS contrib
      |  FROM post p JOIN dfc d USING (token), stats s),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS matched_terms,
      |    list_reduce(list(contrib ORDER BY token), (a, b) -> a + b) AS score
      |  FROM contrib GROUP BY doc_id)""".stripMargin
  }

  /** The int8 encode mirrored expression-for-expression from
    * [[graft.operators.Quantize.codesCol]] — expects `prm(mins, maxs)` in
    * scope and a 1-based index binding `i`. Shared by q144 and q147 so
    * the encode arithmetic cannot drift between certifications.
    */
  private def quantCodeSql(x: String): String =
    s"""(CASE WHEN prm.maxs[i] = prm.mins[i] THEN CAST(0 AS BIGINT)
       |      ELSE CAST(least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
       |        floor((CAST($x AS DOUBLE) - prm.mins[i])
       |          * (CAST(255 AS DOUBLE) / (prm.maxs[i] - prm.mins[i]))
       |          + CAST(0.5 AS DOUBLE)))) AS BIGINT) END - CAST(128 AS BIGINT))""".stripMargin

  private def bm25OracleSql(terms: Seq[String], k: Int, docFilter: String = "TRUE"): String =
    s"""WITH ${bm25CoreCtes(terms, docFilter)}
      |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bm25_rank,
      |  doc_id, matched_terms, score
      |FROM agg ORDER BY score DESC, doc_id LIMIT $k""".stripMargin

  /** q154 oracle: integer fixed-point PageRank with the iterations
    * UNROLLED as chained CTEs (standard SQL forbids aggregation inside a
    * recursive CTE term, so a from-scratch replay unrolls — the bpeCtes
    * precedent). Mirrors [[graft.operators.Graph.pageRank]]'s update rule
    * exactly: all BIGINT, floor division only. The edge list is
    * symmetrized, so no node is dangling and the implementation's
    * `dangling // n` term is identically zero — omitted here rather than
    * folded in as `+ 0`.
    */
  private def pageRankOracleSql(iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      s"""r$k AS (
        |  SELECT nd.u, CAST((15 * (1000000000000 // nn.n)) // 100
        |      + (85 * COALESCE(i.s, 0)) // 100 AS BIGINT) AS r
        |  FROM nodes nd
        |  LEFT JOIN (
        |    SELECT e.v AS u, sum(r.r // o.d) AS s
        |    FROM e JOIN r${k - 1} r ON e.u = r.u JOIN odeg o ON e.u = o.u
        |    GROUP BY e.v) i ON nd.u = i.u, nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (
      |  SELECT a.vec_id AS ia, b.vec_id AS ib
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE a.vec_id < 500 AND b.vec_id < 500
      |    AND ${cosineSql("a.embedding", "b.embedding")} >= CAST(0.25 AS DOUBLE)),
      |e AS (SELECT ia AS u, ib AS v FROM p UNION ALL SELECT ib, ia FROM p),
      |nodes AS (SELECT DISTINCT u FROM e),
      |odeg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY u),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |r0 AS (SELECT u, CAST(1000000000000 // nn.n AS BIGINT) AS r FROM nodes, nn),
      |$iters
      |SELECT CAST(row_number() OVER (ORDER BY r.r DESC, r.u) AS BIGINT) AS pr_rank,
      |  r.u AS vec_id, r.r AS pr_score, o.d AS out_degree
      |FROM r$iterations r JOIN odeg o ON r.u = o.u
      |ORDER BY pr_rank""".stripMargin
  }

  /** Shared q201/q215 funnel reach CTEs (s0..s3): the chained
    * earliest-at-or-after step timestamps both the count certification and
    * the latency certification build on — one copy, matching the shared
    * Scala core (`Behavior.funnelUserTimes`), so the reach rule cannot
    * drift between the two oracles.
    */
  private def funnelReachCtes: String =
    """s0 AS (
      |  SELECT user_id AS u, min(ts) AS t FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s1 AS (
      |  SELECT e.user_id AS u, min(e.ts) AS t FROM events e
      |  JOIN s0 ON e.user_id = s0.u
      |  WHERE e.event_type = 'view' AND e.ts >= s0.t GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id AS u, min(e.ts) AS t FROM events e
      |  JOIN s1 ON e.user_id = s1.u
      |  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id AS u, min(e.ts) AS t FROM events e
      |  JOIN s2 ON e.user_id = s2.u
      |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1)""".stripMargin

  /** Shared SCD2 suppression CTE prefix (src → flt → v): the
    * no-op-suppressed change stream EVERY SCD2 oracle builds on; the
    * (ts, event_id) tie-break matches `Scd.scd2Build`. One copy — the five
    * oracle families (build/apply/stream, PIT/stream-PIT, dwell, overlap,
    * snapshot diff) cannot drift from each other.
    */
  private def scd2SuppressionCtes: String =
    """src AS (
      |  SELECT user_id, ts, event_id, event_type AS state
      |  FROM events WHERE event_type <> 'purchase'),
      |flt AS (
      |  SELECT user_id, ts, event_id, state,
      |    lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM src),
      |v AS (SELECT user_id, ts, event_id, state FROM flt
      |      WHERE prev IS NULL OR prev <> state)""".stripMargin

  /** Shared q173/q198/q210 oracle: the SCD2 dimension recomputed from the
    * FULL change stream from scratch — the batch build (q173), the
    * incremental apply over a Jan-21 split (q198), and the per-micro-batch
    * streaming fold (q210) must ALL equal it exactly (fold ≡ rebuild for
    * the versioned dimension, batch and stream).
    */
  private def scd2BuildOracleSql: String =
    "WITH " + scd2SuppressionCtes + "\n" +
      """SELECT user_id,
      |  CAST(row_number() OVER w AS BIGINT) AS version,
      |  state,
      |  ts AS effective_from,
      |  lead(ts) OVER w AS effective_to,
      |  (lead(ts) OVER w) IS NULL AS is_current
      |FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** Shared q174/q190 oracle: the SCD2 version table recomputed from
    * scratch, point-in-time-joined to purchases with DuckDB's NATIVE
    * `ASOF LEFT JOIN` — batch operator (q174) and the stream-static
    * enrichment path (q190) must both equal it exactly.
    */
  private def pitJoinOracleSql: String =
    "WITH " + scd2SuppressionCtes + ",\n" +
      """ver AS (
      |  SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version, state,
      |    ts AS effective_from, lead(ts) OVER w AS effective_to
      |  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
      |SELECT f.event_id, f.user_id, f.ts, f.value,
      |  ver.version AS dim_version, ver.state, ver.effective_from, ver.effective_to
      |FROM f ASOF LEFT JOIN ver
      |  ON f.user_id = ver.user_id AND f.ts >= ver.effective_from
      |ORDER BY f.event_id""".stripMargin

  /** q168 oracle: NAIVE canonical triangle count — the same
    * cosine-threshold pair CTE as [[pageRankOracleSql]] (q154), then a
    * plain `a<b<c` three-way self-join over the canonical (lo,hi) pairs:
    * (p1: a–b) ⋈ (p2: b–c) ⋈ (p3: a–c) enumerates every triangle exactly
    * once because the pair list already stores each edge with
    * `ia < ib`. Degrees come from the symmetrized edge list; the
    * coefficient divides the two exact BIGINTs as doubles — identical
    * arithmetic to [[graft.operators.Graph.triangleCounts]]. Equality
    * against the oriented-wedge implementation certifies the orientation
    * finds every triangle exactly once (and never twice).
    */
  private def triangleOracleSql: String =
    s"""WITH p AS (
      |  SELECT a.vec_id AS ia, b.vec_id AS ib
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE a.vec_id < 500 AND b.vec_id < 500
      |    AND ${cosineSql("a.embedding", "b.embedding")} >= CAST(0.25 AS DOUBLE)),
      |e AS (SELECT ia AS u, ib AS v FROM p UNION ALL SELECT ib, ia FROM p),
      |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY u),
      |t AS (
      |  SELECT p1.ia AS a, p1.ib AS b, p2.ib AS c
      |  FROM p p1
      |  JOIN p p2 ON p2.ia = p1.ib
      |  JOIN p p3 ON p3.ia = p1.ia AND p3.ib = p2.ib),
      |corners AS (
      |  SELECT a AS u FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t),
      |tcnt AS (SELECT u, CAST(count(*) AS BIGINT) AS n_triangles FROM corners GROUP BY u)
      |SELECT d.u AS vec_id, d.degree,
      |  COALESCE(tc.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
      |  CASE WHEN d.degree >= 2
      |    THEN CAST(COALESCE(tc.n_triangles, CAST(0 AS BIGINT)) * 2 AS DOUBLE)
      |         / CAST(d.degree * (d.degree - 1) AS DOUBLE)
      |    ELSE CAST(0 AS DOUBLE) END AS clustering
      |FROM deg d LEFT JOIN tcnt tc ON d.u = tc.u
      |ORDER BY vec_id""".stripMargin

  private def bpeOracleSql(n: Int): String =
    bpeCtes(n) + "\n" +
      (1 to n).map(k =>
        s"SELECT CAST($k AS BIGINT) AS step, lhs, rhs, c AS pair_count FROM best$k")
        .mkString(" UNION ALL ") +
      " ORDER BY step"

  /** q140 oracle: segment the vocabulary with the SAME recursive-CTE
    * machinery (10 trained merges applied), then account the corpus word
    * stream against that vocab dimension per source.
    */
  private def bpeCompressionOracleSql(n: Int): String =
    bpeCtes(n) + s""",
      |seg AS MATERIALIZED (
      |  SELECT word, CAST(length(word) AS BIGINT) AS chars, CAST(len(syms) AS BIGINT) AS seglen
      |  FROM syms$n),
      |docw AS (
      |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents)
      |SELECT d.source, count(*) AS word_count,
      |  CAST(sum(s.chars) AS BIGINT) AS char_count,
      |  CAST(sum(s.seglen) AS BIGINT) AS bpe_token_count
      |FROM docw d JOIN seg s ON d.word = s.word
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB cosine-similarity SQL over two list expressions — the ONE copy
    * of the determinism-critical fold (CAST placement, sequential
    * list_reduce) every embedding oracle composes.
    */
  private def cosineSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (x, y) -> x + y)
       |      / (sqrt(list_reduce(list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
       |         * sqrt(list_reduce(list_transform($b, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)))""".stripMargin

  /** Shared oracle CTE prefix for every hyperplane-LSH oracle: Sha60 ±1
    * sign matrix (8 planes) and packed per-vector signatures —
    * `esigs(vec_id, embedding, sig)`. q67/q68/q70 compose from it.
    */
  /** Shared q84/q91 oracle prefix: normalized tokens → trigram Sha60 hashes
    * mod 2³¹−1 → winnowed fingerprint set (4-window minima; single global
    * min below 4 hashes). Ends with CTE `fps(doc_id, fp)`.
    */
  private val winnowCtes: String =
    """toksrc AS (
      |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks FROM documents),
      |hseq AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) < 3 THEN CAST([] AS BIGINT[])
      |      ELSE list_transform(generate_series(1, CAST(len(toks) AS INTEGER) - 2),
      |        i -> CAST(('0x' || substring(sha256(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT) % 2147483647) END AS hs
      |  FROM toksrc),
      |fps AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
      |         WHEN len(hs) < 4 THEN [list_min(hs)]
      |         ELSE list_distinct(list_transform(generate_series(1, CAST(len(hs) AS INTEGER) - 3), i -> list_min(hs[i:i+3]))) END AS fp
      |  FROM hseq)""".stripMargin

  /** [[embSigCtes]] over an arbitrary (vec_id, embedding) source CTE —
    * q130's fixture extends the embeddings table with re-fetch copies, so
    * the signature construction takes its source like [[lshPrefixCtes]].
    */
  private def embSigCtesFromPlanes(src: String, nPlanes: Int): String =
    s"""dims AS (SELECT CAST(len(embedding) AS INTEGER) AS d FROM $src LIMIT 1),
      |planes AS (
      |  SELECT list(sgn ORDER BY p) AS allsigns FROM (
      |    SELECT t.p, list_transform(range(0, dims.d), i ->
      |      CASE WHEN CAST(('0x' || substring(sha256(CAST(t.p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
      |           THEN 1.0 ELSE -1.0 END) AS sgn
      |    FROM range(0, $nPlanes) t(p), dims)),
      |esigs AS (
      |  SELECT vec_id, embedding,
      |    CAST(list_sum(list_transform(range(0, $nPlanes), p ->
      |      CASE WHEN list_reduce(list_prepend(0.0, list_transform(list_zip(embedding, allsigns[CAST(p AS INTEGER)+1]),
      |             z -> CAST(z[1] AS DOUBLE) * z[2])), (a, b) -> a + b) >= 0.0
      |           THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
      |  FROM $src, planes)""".stripMargin

  private def embSigCtesFrom(src: String): String = embSigCtesFromPlanes(src, 8)

  /** [[embSigCtesFromPlanes]] with the plane count TUNED to the corpus the
    * way [[graft.operators.Dedup.tunePlanes]] tunes it — `min p ∈ [2,53]
    * with cap·2^p ≥ count(*)`, plus one slack plane — as pure integer SQL
    * (`cap * (1::BIGINT << p) >= n`, no float log2 whose boundary rounding
    * could diverge between engines). The plane-signs and signature CTEs
    * are identical to the static variant; they just read `np` from the
    * tuning CTE instead of a compiled-in literal.
    */
  private def embSigCtesTuned(src: String, cap: Int): String =
    s"""nplanes AS MATERIALIZED (
      |  SELECT CAST(MIN(p) + 1 AS INTEGER) AS np FROM range(2, 54) t(p)
      |  WHERE $cap * (CAST(1 AS BIGINT) << CAST(p AS INTEGER)) >= (SELECT count(*) FROM $src)),
      |dims AS (SELECT CAST(len(embedding) AS INTEGER) AS d FROM $src LIMIT 1),
      |planes AS (
      |  SELECT list(sgn ORDER BY p) AS allsigns FROM (
      |    SELECT t.p, list_transform(range(0, dims.d), i ->
      |      CASE WHEN CAST(('0x' || substring(sha256(CAST(t.p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
      |           THEN 1.0 ELSE -1.0 END) AS sgn
      |    FROM range(0, 62) t(p), dims, nplanes WHERE t.p < nplanes.np)),
      |esigs AS (
      |  SELECT vec_id, embedding,
      |    CAST(list_sum(list_transform(range(0, CAST(np AS BIGINT)), p ->
      |      CASE WHEN list_reduce(list_prepend(0.0, list_transform(list_zip(embedding, allsigns[CAST(p AS INTEGER)+1]),
      |             z -> CAST(z[1] AS DOUBLE) * z[2])), (a, b) -> a + b) >= 0.0
      |           THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
      |  FROM $src, planes, nplanes)""".stripMargin

  /** [[embLshCtesAt]] with the tuned plane count ([[embSigCtesTuned]]). */
  private def embLshCtesTuned(cap: Int, minCosine: String): String =
    embSigCtesTuned("embeddings", cap) + ",\n" +
      s"""capped AS (
      |  SELECT vec_id, embedding, sig FROM (
      |    SELECT vec_id, embedding, sig, count(*) OVER (PARTITION BY sig) AS bs FROM esigs)
      |  WHERE bs <= $cap),
      |epairs AS (
      |  SELECT id_a, id_b, cosine_sim FROM (
      |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |      ${cosineSql("a.embedding", "b.embedding")} AS cosine_sim
      |    FROM capped a JOIN capped b ON a.sig = b.sig AND a.vec_id < b.vec_id)
      |  WHERE cosine_sim >= CAST($minCosine AS DOUBLE))""".stripMargin

  private val embSigCtes: String = embSigCtesFrom("embeddings")

  /** Continuation of [[embSigCtes]] for q67/q68: bucket cap 200 and
    * same-bucket pairs at cosine ≥ 0.25 — `epairs(id_a, id_b, cosine_sim)`.
    */
  private val embLshCtes: String =
    embSigCtes + ",\n" +
      s"""capped AS (
        |  SELECT vec_id, embedding, sig FROM (
        |    SELECT vec_id, embedding, sig, count(*) OVER (PARTITION BY sig) AS bs FROM esigs)
        |  WHERE bs <= 200),
        |epairs AS (
        |  SELECT id_a, id_b, cosine_sim FROM (
        |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |      ${cosineSql("a.embedding", "b.embedding")} AS cosine_sim
        |    FROM capped a JOIN capped b ON a.sig = b.sig AND a.vec_id < b.vec_id)
        |  WHERE cosine_sim >= 0.25)""".stripMargin

  /** Parameterized twin of [[embLshCtes]] for the graph-tier queries
    * (q171/q172): the SAME hyperplane family (Sha60 sign matrix — plane p,
    * dim i), plane count and cosine threshold as arguments. q171 densifies
    * to 4 planes / τ = 0.1 so the pair graph actually has triangles;
    * q172 keeps 8 planes / τ = 0.1 where components chain past direct
    * edges (sizes up to 9 at max degree 5 — probed, transitivity is
    * load-bearing). Ends with `epairs(id_a, id_b, cosine_sim)`.
    */
  private def embLshCtesAt(nPlanes: Int, minCosine: String): String =
    embSigCtesFromPlanes("embeddings", nPlanes) + ",\n" +
      s"""capped AS (
      |  SELECT vec_id, embedding, sig FROM (
      |    SELECT vec_id, embedding, sig, count(*) OVER (PARTITION BY sig) AS bs FROM esigs)
      |  WHERE bs <= 200),
      |epairs AS (
      |  SELECT id_a, id_b, cosine_sim FROM (
      |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |      ${cosineSql("a.embedding", "b.embedding")} AS cosine_sim
      |    FROM capped a JOIN capped b ON a.sig = b.sig AND a.vec_id < b.vec_id)
      |  WHERE cosine_sim >= CAST($minCosine AS DOUBLE))""".stripMargin

  /** q171 oracle: [[triangleOracleSql]]'s naive canonical triangle join,
    * but the pair source is the CERTIFIED LSH generator (q67's CTE family
    * at τ = 0.1 with the plane count TUNED by the same integer scan as
    * [[graft.operators.Dedup.tunePlanes]]) instead of the bounded cosine
    * cartesian — the green row makes "the graph tier composes with the
    * dup pair generators" an executed fact, not a scaladoc claim, at a
    * plane count that stays non-vacuous as the corpus grows (the fixed
    * 4-plane version was empty at sf1 — every bucket over the cap).
    */
  private def lshTriangleOracleSql: String =
    "WITH " + embLshCtesTuned(200, "0.1") + ",\n" +
      s"""p AS (SELECT id_a AS ia, id_b AS ib FROM epairs),
      |e AS (SELECT ia AS u, ib AS v FROM p UNION ALL SELECT ib, ia FROM p),
      |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY u),
      |t AS (
      |  SELECT p1.ia AS a, p1.ib AS b, p2.ib AS c
      |  FROM p p1
      |  JOIN p p2 ON p2.ia = p1.ib
      |  JOIN p p3 ON p3.ia = p1.ia AND p3.ib = p2.ib),
      |corners AS (
      |  SELECT a AS u FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t),
      |tcnt AS (SELECT u, CAST(count(*) AS BIGINT) AS n_triangles FROM corners GROUP BY u)
      |SELECT d.u AS vec_id, d.degree,
      |  COALESCE(tc.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
      |  CASE WHEN d.degree >= 2
      |    THEN CAST(COALESCE(tc.n_triangles, CAST(0 AS BIGINT)) * 2 AS DOUBLE)
      |         / CAST(d.degree * (d.degree - 1) AS DOUBLE)
      |    ELSE CAST(0 AS DOUBLE) END AS clustering
      |FROM deg d LEFT JOIN tcnt tc ON d.u = tc.u
      |ORDER BY vec_id""".stripMargin

  /** q172 oracle: recursive reachability closure over the 8-plane /
    * τ = 0.1 LSH pair graph — `comp` assigns every paired vector the
    * MINIMUM reachable id, exactly [[graft.operators.Dedup.duplicateClusters]]'
    * contract, then component sizes join back. The same recursive-CTE
    * pattern as the q52 MinHash cluster oracle, on the embedding graph.
    */
  private def embeddingComponentsOracleSql: String =
    "WITH RECURSIVE " + embLshCtesAt(8, "0.1") + ",\n" +
      s"""edges AS (SELECT id_a AS src, id_b AS dst FROM epairs UNION SELECT id_b, id_a FROM epairs),
      |reach AS (
      |  SELECT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON reach.id = e.src WHERE reach.r < e.dst),
      |comp AS MATERIALIZED (SELECT id AS vec_id, MIN(r) AS component_id FROM reach GROUP BY id),
      |sizes AS (SELECT component_id, CAST(count(*) AS BIGINT) AS component_size FROM comp GROUP BY component_id)
      |SELECT c.vec_id, c.component_id, s.component_size
      |FROM comp c JOIN sizes s ON c.component_id = s.component_id
      |ORDER BY c.vec_id""".stripMargin

  /** q200 oracle: the 3-core by UNROLLED peeling over the 8-plane / τ = 0.1
    * LSH pair graph — 32 generated peel rounds (each: sub-k-degree node set,
    * then the edge set minus those nodes on either endpoint). Peeling is a
    * monotone fixpoint, so any unroll depth ≥ the graph's true peel depth
    * (4 at sf0.01, 2 at sf1, probed) yields exactly the k-core; the Spark
    * side pins
    * `maxIter` to the same 32 and THROWS beyond it, so the two engines can
    * only ever agree or fail loudly — never silently diverge.
    */
  private def lshKCoreOracleSql: String = {
    val k = 3
    val rounds = 32
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and e_i
    // references e_{i-1} three times (directly + twice via b_i) — an
    // inlined chain expands 3^rounds references to the base parquet
    val peels = (1 to rounds).map { i =>
      s"""b$i AS MATERIALIZED (SELECT u FROM e${i - 1} GROUP BY u HAVING count(*) < $k),
         |e$i AS MATERIALIZED (
         |  SELECT u, v FROM e${i - 1}
         |  WHERE u NOT IN (SELECT u FROM b$i) AND v NOT IN (SELECT u FROM b$i))""".stripMargin
    }.mkString(",\n")
    "WITH " + embLshCtesAt(8, "0.1") + ",\n" +
      s"""e0 AS MATERIALIZED (
         |  SELECT id_a AS u, id_b AS v FROM epairs
         |  UNION ALL SELECT id_b, id_a FROM epairs),
         |""".stripMargin + peels + s"""
         |SELECT u AS vec_id, CAST(count(*) AS BIGINT) AS core_degree
         |FROM e$rounds GROUP BY u ORDER BY vec_id""".stripMargin
  }

  /** Shared oracle CTE chain for q65/q66: the curation gate (quality score +
    * distinct-token ratio), PII masking, exact dedup, then the MinHash
    * cluster chain over the surviving set — mirrors
    * [[graft.operators.Curation.curateCorpus]] stage for stage.
    */
  private lazy val curationChainCtes: String =
    raw"""WITH RECURSIVE scored AS (
      |  SELECT doc_id, source, text,
      |    string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t,
      |    $qualityScoreSql AS qs
      |  FROM documents),
      |gated AS (
      |  SELECT doc_id, source,
      |    regexp_replace(regexp_replace(regexp_replace(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |      '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
      |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS text
      |  FROM scored
      |  WHERE qs >= 0.5
      |    AND CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) >= 0.3),
      |exact AS (
      |  SELECT doc_id, source, text FROM (
      |    SELECT gated.*, row_number() OVER (
      |      PARTITION BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
      |      ORDER BY doc_id) AS rn
      |    FROM gated) WHERE rn = 1),
      |""".stripMargin +
      lshPrefixCtes("exact") + ",\n" + lshClusterCtes + "\n"

  /** Shared oracle CTE chain for q52/q53: the q34 MinHash+LSH pair pipeline
    * closed under transitivity with a recursive reachability CTE —
    * `comp(doc_id, cluster_id)` mirrors
    * [[graft.operators.Dedup.duplicateClusters]] (cluster_id = component
    * minimum).
    */
  /** Shared oracle CTE prefix for every MinHash oracle: tokenize `src` and
    * derive sha256-prefix base hashes, 16-hash MinHash signatures, and
    * 4-band keys. Parameterized by the source relation so the hash family /
    * band layout lives in ONE place — q34, q52/q53, q64, and q65 all compose
    * from it.
    */
  /** The q122/q128 oracle: dropDuplicatesWithinWatermark's state machine
    * as a RECURSIVE per-key fold over the arrival fixture (arrival_batch,
    * key, minutes-after-T0) — see the oracleSql comment at the q122 entry
    * for the transition rules. `st` carries (admitted, state_ts) along
    * each key's arrival sequence; an arrival can consult only the fold
    * state, never a global first-occurrence shortcut, which is what makes
    * re-created state (admit → evict → re-admit → duplicate → evict →
    * re-admit) exact.
    */
  private val eventDedupOracleSql: String =
    """WITH RECURSIVE f AS (
      |  SELECT CAST(v.b AS INTEGER) AS arrival_batch,
      |    CAST(v.id AS BIGINT) AS event_id,
      |    TIMESTAMP '2026-01-01 10:00:00' + v.m * INTERVAL 1 MINUTE AS ts
      |  FROM (VALUES
      |    (1, 1, 0), (1, 2, 0), (1, 3, 0), (1, 4, 0),
      |    (2, 1, 30), (2, 2, 30), (2, 5, 300), (2, 6, 300),
      |    (3, 7, 360), (3, 5, 330),
      |    (4, 3, 330), (4, 4, 330), (4, 6, 345), (4, 8, 120),
      |    (5, 3, 345), (5, 9, 600),
      |    (6, 3, 580),
      |    (7, 3, 590), (7, 9, 605)) v(b, id, m)),
      |wm AS (
      |  SELECT b.arrival_batch,
      |    (SELECT max(ts) FROM f WHERE f.arrival_batch < b.arrival_batch)
      |      - INTERVAL 1 HOUR AS wmk
      |  FROM (SELECT DISTINCT arrival_batch FROM f) b),
      |arr AS (
      |  SELECT f.*,
      |    row_number() OVER (PARTITION BY event_id ORDER BY arrival_batch) AS seq
      |  FROM f),
      |st AS (
      |  SELECT a.event_id, a.seq, a.arrival_batch,
      |    (w.wmk IS NULL OR a.ts >= w.wmk) AS admitted,
      |    CASE WHEN (w.wmk IS NULL OR a.ts >= w.wmk) THEN a.ts END AS state_ts
      |  FROM arr a JOIN wm w ON w.arrival_batch = a.arrival_batch
      |  WHERE a.seq = 1
      |  UNION ALL
      |  SELECT a.event_id, a.seq, a.arrival_batch,
      |    CASE WHEN (w.wmk IS NOT NULL AND a.ts < w.wmk) THEN FALSE
      |         WHEN s.state_ts IS NOT NULL
      |           AND (w.wmk IS NULL OR s.state_ts + INTERVAL 1 HOUR >= w.wmk)
      |           THEN FALSE
      |         ELSE TRUE END,
      |    CASE WHEN (w.wmk IS NOT NULL AND a.ts < w.wmk) THEN s.state_ts
      |         WHEN s.state_ts IS NOT NULL
      |           AND (w.wmk IS NULL OR s.state_ts + INTERVAL 1 HOUR >= w.wmk)
      |           THEN s.state_ts
      |         ELSE a.ts END
      |  FROM st s
      |  JOIN arr a ON a.event_id = s.event_id AND a.seq = s.seq + 1
      |  JOIN wm w ON w.arrival_batch = a.arrival_batch)
      |SELECT s.arrival_batch, s.event_id, e.event_type
      |FROM st s JOIN events e ON e.event_id = s.event_id
      |WHERE s.admitted
      |ORDER BY s.arrival_batch, s.event_id""".stripMargin

  /** The q124/q131 curriculum schedule: quality-tiered epoch counts,
    * per-epoch expansion, and the seed-42 Sha60 order key —
    * `k(doc_id, epoch_idx, order_key)`.
    */
  private def curriculumKeyCtes: String =
    raw"""WITH q AS (
      |  SELECT doc_id,
      |    $qualityScoreSql AS quality_score
      |  FROM documents),
      |e AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN quality_score >= 0.8 THEN 3
      |              WHEN quality_score >= 0.5 THEN 2 ELSE 1 END AS BIGINT) AS n_epochs
      |  FROM q),
      |s AS (
      |  SELECT doc_id, CAST(unnest(generate_series(1, n_epochs)) AS BIGINT) AS epoch_idx
      |  FROM e),
      |k AS (
      |  SELECT doc_id, epoch_idx,
      |    CAST(('0x' || substring(sha256('cur:42:' || CAST(epoch_idx AS VARCHAR)
      |      || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS order_key
      |  FROM s)""".stripMargin

  private val embPop0Cte: String =
    "pop0 AS (SELECT vec_id FROM esigs WHERE vec_id >= 0 AND vec_id % 10 <> 0 AND vec_id % 10 <> 5)"

  /** One day of the q125/q130 embedding-refresh oracle — the vector twin
    * of [[refreshDayCtes]]: capped buckets over `pop$k`, the cosine-gated
    * near-dup verdict for the day-(k+1) delta, the admitted set
    * `a${k + 1}`, and the grown population `pop${k + 1}`. References only
    * `esigs` (which carries every fixture vector), never the embeddings
    * table directly — so one construction serves q125's plain fixture and
    * q130's re-fetch-extended one.
    */
  private def embDayCtes(k: Int, cap: Int, deltaCond: String): String =
    s"""b$k AS (
       |  SELECT sig, list(vec_id) AS cids
       |  FROM esigs JOIN pop$k USING (vec_id)
       |  GROUP BY sig HAVING count(*) <= $cap),
       |m${k + 1} AS (
       |  SELECT DISTINCT delta_id FROM (
       |    SELECT p.delta_id,
       |      ${cosineSql("p.dvec", "c.embedding")} AS cosine_sim
       |    FROM (SELECT d.vec_id AS delta_id, d.embedding AS dvec, unnest(cb.cids) AS corpus_id
       |          FROM esigs d JOIN b$k cb ON d.sig = cb.sig
       |          WHERE ${deltaCond.replace("vec_id", "d.vec_id")}) p
       |    JOIN esigs c ON p.corpus_id = c.vec_id)
       |  WHERE cosine_sim >= 0.25),
       |a${k + 1} AS (
       |  SELECT vec_id FROM esigs
       |  WHERE ($deltaCond) AND vec_id NOT IN (SELECT delta_id FROM m${k + 1})),
       |pop${k + 1} AS (SELECT vec_id FROM pop$k UNION ALL SELECT vec_id FROM a${k + 1})""".stripMargin

  /** The q127/q129 oracle: from-scratch recompute of the three-day
    * admission cascade (built from [[refreshDayCtes]]; day partition and
    * re-fetch id scheme documented at Pipeline.checkpointedRefreshLoop).
    */
  private val checkpointedRefreshOracleSql: String =
    "WITH " +
      raw"""alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT -doc_id * 4 - 1, text
        |    FROM documents WHERE doc_id % 10 = 5
        |  UNION ALL SELECT -doc_id * 4 - 2, text || ' q127refetch'
        |    FROM documents WHERE doc_id % 10 = 5
        |  UNION ALL SELECT -doc_id * 4 - 3, text
        |    FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL SELECT -doc_id * 4 - 4, text || ' q127refetch'
        |    FROM documents WHERE doc_id % 10 = 0),
        |""".stripMargin + lshPrefixCtes("alldocs") + ",\n" +
      raw"""nrm AS (
        |  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
        |  FROM alldocs),
        |pop0 AS (
        |  SELECT doc_id FROM alldocs
        |  WHERE doc_id >= 0 AND doc_id % 10 NOT IN (0, 3, 5)),
        |""".stripMargin +
      refreshDayCtes(0, "doc_id >= 0 AND doc_id % 10 = 5") + ",\n" +
      refreshDayCtes(1,
        "(doc_id >= 0 AND doc_id % 10 = 0) OR (doc_id < 0 AND (-doc_id) % 4 IN (1, 2))") + ",\n" +
      refreshDayCtes(2,
        "(doc_id >= 0 AND doc_id % 10 = 3) OR (doc_id < 0 AND (-doc_id) % 4 IN (3, 0))") + "\n" +
      """SELECT CAST(1 AS INTEGER) AS day, doc_id FROM a1
        |UNION ALL SELECT CAST(2 AS INTEGER), doc_id FROM a2
        |UNION ALL SELECT CAST(3 AS INTEGER), doc_id FROM a3
        |ORDER BY day, doc_id""".stripMargin

  /** One day of the q127/q129 refresh-cascade oracle: given `pop$k`
    * (the day-k population CTE), emit the exact-text and capped-bucket
    * gates over it, the near-dup verdict for the day-(k+1) delta
    * (`deltaCond`, a predicate on doc_id), the admitted set `a${k+1}`,
    * and the grown population `pop${k+1}` — so the 3-day oracle is one
    * construction repeated, not three hand-kept copies.
    */
  private def refreshDayCtes(k: Int, deltaCond: String): String =
    raw"""ex$k AS (SELECT DISTINCT t FROM nrm JOIN pop$k USING (doc_id)),
         |b$k AS (
         |  SELECT band, bkey, list(doc_id) AS cids
         |  FROM banded JOIN pop$k USING (doc_id)
         |  GROUP BY band, bkey HAVING count(*) <= 50),
         |m${k + 1} AS (
         |  SELECT DISTINCT delta_id FROM (
         |    SELECT p.delta_id,
         |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
         |    FROM (
         |      SELECT DISTINCT d.doc_id AS delta_id, unnest(cb.cids) AS corpus_id
         |      FROM banded d JOIN b$k cb ON d.band = cb.band AND d.bkey = cb.bkey
         |      WHERE ${deltaCond.replace("doc_id", "d.doc_id")}) p
         |    JOIN sigs a ON p.delta_id = a.doc_id JOIN sigs b ON p.corpus_id = b.doc_id)
         |  WHERE jaccard >= 0.5),
         |a${k + 1} AS (
         |  SELECT doc_id FROM nrm n WHERE ($deltaCond)
         |    AND NOT EXISTS (SELECT 1 FROM ex$k WHERE ex$k.t = n.t)
         |    AND doc_id NOT IN (SELECT delta_id FROM m${k + 1})),
         |pop${k + 1} AS (SELECT doc_id FROM pop$k UNION ALL SELECT doc_id FROM a${k + 1})""".stripMargin

  private def lshPrefixCtes(src: String): String =
    raw"""toks AS (
         |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS sh
         |  FROM $src),
         |hashed AS (
         |  SELECT doc_id, sh,
         |    list_transform(sh, s -> CAST(('0x' || substring(sha256(s), 1, 15)) AS BIGINT) % 2147483647) AS hs
         |  FROM toks WHERE len(sh) > 0),
         |sigs AS (
         |  SELECT doc_id, sh,
         |    list_transform(range(0, 16), j ->
         |      list_min(list_transform(hs, h -> ((2*j + 1) * h + 104729 * (j + 1)) % 2147483647))) AS sig
         |  FROM hashed),
         |banded AS (
         |  SELECT s.doc_id, b.band,
         |    array_to_string(list_slice(s.sig, b.band * 4 + 1, b.band * 4 + 4), '_') AS bkey
         |  FROM sigs s, (SELECT unnest(range(0, 4)) AS band) b)""".stripMargin

  /** Self-join continuation of [[lshPrefixCtes]]: capped buckets, in-bucket
    * candidate pairs, jaccard-verified duplicate pairs, and the recursive
    * connected-components closure (`comp(doc_id, cluster_id)`), mirroring
    * [[graft.operators.Dedup.duplicateClusters]].
    *
    * The closure is PRUNED to min-monotone label propagation: a candidate
    * label `r` only propagates across an edge to a node GREATER than `r`
    * (`WHERE reach.r < e.dst`). The component minimum `m` is smaller than
    * every other member, so it propagates along every path unimpeded and
    * still reaches every node — `MIN(r)` per id is provably unchanged —
    * while labels that are not the minimum stop early instead of
    * enumerating the full reachable set. On the 20k-doc corpus this cut
    * the closure from 26.9M rows / 273 s to interactive (the full
    * transitive closure is quadratic in the giant component; every
    * cluster-chain oracle shares this recursion). `comp` is MATERIALIZED:
    * consumers reference it 2–3 times and DuckDB inlines plain CTEs.
    */
  private val lshClusterCtes: String =
    """buckets AS (
      |  SELECT band, bkey, list_sort(list(doc_id)) AS ids
      |  FROM banded GROUP BY band, bkey
      |  HAVING count(*) BETWEEN 2 AND 50),
      |cand AS (
      |  SELECT DISTINCT pr.a AS id_a, pr.b AS id_b FROM (
      |    SELECT UNNEST(flatten(list_transform(range(1, CAST(len(ids) AS INTEGER)), i ->
      |      list_transform(ids[i+1:], x -> {'a': ids[i], 'b': x})))) AS pr
      |    FROM buckets)),
      |dup AS (
      |  SELECT id_a, id_b, jaccard FROM (
      |    SELECT p.id_a, p.id_b,
      |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
      |    FROM cand p JOIN sigs a ON p.id_a = a.doc_id JOIN sigs b ON p.id_b = b.doc_id)
      |  WHERE jaccard >= 0.5),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM dup UNION SELECT id_b, id_a FROM dup),
      |reach AS (
      |  SELECT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON reach.id = e.src WHERE reach.r < e.dst),
      |comp AS MATERIALIZED (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  private val dupClusterCtes: String =
    "WITH RECURSIVE " + lshPrefixCtes("documents") + ",\n" + lshClusterCtes + "\n"
}
