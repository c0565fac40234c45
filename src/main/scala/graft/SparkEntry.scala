package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.multimodal.Multimodal
import graft.operators.{Curation, Dedup, Extended, Profile, Relational, Similarity, Skew, TextAnalysis}
import graft.sources.Dims
import graft.streaming.Events

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a same-name, same-column-alias DuckDB oracle
  * in `oracleSql` (the driver hash-compares values after sorting columns by
  * name). Non-SQL-expressible operators ship without an oracle and get the
  * weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pivot_monthly_qty"    -> Relational.pivotMonthlyQty _,
    "q2_shipment_cond_counts" -> Relational.shipmentCondCounts _,
    "q3_top1_day_per_part"    -> Relational.top1DayPerPart _,
    "q4_events_monthly"       -> Relational.eventsMonthlyMetrics _,
    "q5_revenue_by_nation"    -> Relational.revenueByNation _,
    "q6_returnflag_pct"       -> Relational.returnflagPctPerPart _,
    "q7_best_part"            -> Relational.bestPerformingPart _,
    "q8_watermark_max"        -> Relational.watermarkMaxKey _,
    "q9_holiday_pivot"        -> Extended.holidayPivot _,
    "q10_anti_join"           -> Extended.customersWithoutOrders _,
    "q11_semi_join"           -> Extended.customersWithUrgentOrders _,
    "q12_set_ops"             -> Extended.setOpsCustkeys _,
    "q13_distinct_aggs"       -> Extended.distinctAggs _,
    "q14_revenue_rollup"      -> Extended.revenueRollup _,
    "q15_window_suite"        -> Extended.windowSuite _,
    "q16_scalar_suite"        -> Extended.scalarSuite _,
    "q17_approx_distinct"     -> Extended.approxDistinctParts _,
    // text analysis
    "t1_text_stats"           -> TextAnalysis.textStats _,
    "t2_lang_id"              -> TextAnalysis.langIdPerDoc _,
    "t3_quality_by_source"    -> TextAnalysis.qualityBySource _,
    // dedup family
    "d1_exact_dedup"          -> Dedup.exactDedupGroups _,
    "d2_ngram_jaccard"        -> ((s: SparkSession, d: String) => Dedup.ngramJaccardPairs(s, d)),
    "d3_minhash_lsh"          -> ((s: SparkSession, d: String) => Dedup.minhashLshPairs(s, d)),
    "d4_simhash"              -> Dedup.simhashSignatures _,
    "d9_simhash_pairs"        -> ((s: SparkSession, d: String) => Dedup.simhashNearDupPairsAuto(s, d)),
    "t10_lang_confusion"      -> TextAnalysis.langConfusionMatrix _,
    // every sizing parameter in the registry derives from corpus
    // statistics (r6): d5/d13 banding from the corpus count, s3/s5/d14
    // cells from count x labels, s2/s6/s7 buckets from the count — the
    // DuckDB twins replay each derivation as a scalar subquery, and the
    // derivations collapse to the r5 pinned configs at gate scale
    // (asserted in DedupSpec/Round6Spec)
    "d5_embedding_neardup"    -> ((s: SparkSession, d: String) =>
                                   Dedup.embeddingNearDupPairs(s, d)),
    // similarity search
    "s1_ann_topk"             -> ((s: SparkSession, d: String) => Similarity.annMultiIndexTopK(s, d)),
    "s2_ann_lsh_topk"         -> ((s: SparkSession, d: String) => Similarity.annLshTopK(s, d)),
    "s3_ann_ivf_topk"         -> ((s: SparkSession, d: String) => Similarity.annIvfTopK(s, d)),
    // s16/s17 (r13): the persisted cell-partitioned IVF index — s3's
    // probe against stored centroids + assignments (identical output,
    // same oracle; partition-pruned corpus scan), and the quantizer's
    // drift audit / rebuild policy (the d30 convention on the second
    // index family)
    "s16_ivf_indexed"         -> ((s: SparkSession, d: String) => Similarity.annIvfIndexed(s, d)),
    "s17_ivf_drift"           -> ((s: SparkSession, d: String) => Similarity.ivfDriftAudit(s, d)),
    // s18/s19 (r13): the persisted PQ index — s6's probe against stored
    // codebook + codes + buckets (identical output, same oracle; the
    // per-probe codebook learn and corpus re-encode gone), and the
    // codec's distortion drift audit / rebuild policy (the d30/s17
    // convention on the third index family — the integrand is
    // DISTRIBUTION drift, the only way a fixed-size codebook ages)
    "s18_pq_indexed"          -> ((s: SparkSession, d: String) => Similarity.annPqIndexed(s, d)),
    "s19_pq_drift"            -> ((s: SparkSession, d: String) => Similarity.pqDriftAudit(s, d)),
    // s20 (r13): the corpus sanity gate before any quantizer/index build
    // — the t28/m2 encoding-sanity convention on the vector modality
    // (severity-ladder counts + clean-survivor norm statistics)
    "s20_vector_sanity"       -> ((s: SparkSession, d: String) => Similarity.vectorSanityReport(s, d)),
    // streaming-shaped (batch twins of the Structured Streaming plans)
    "st1_windowed_counts"     -> Events.windowedCounts _,
    "st2_sessionize"          -> Events.sessionize _,
    "st4_session_window"      -> Events.sessionWindows _,
    // multimodal binary plumbing
    "m1_binary_features"      -> Multimodal.binaryFeatures _,
    "m2_format_stats"         -> Multimodal.formatStats _,
    // batch 2 extensions
    "q18_salted_revenue"      -> Skew.saltedCustomerRevenue _,
    "q19_percentiles"         -> Extended.valuePercentiles _,
    "q4b_daily_pivot"         -> Events.dailyTypePivot _,
    "st3_sliding_windows"     -> Events.slidingWindowCounts _,
    "t4_bpe_tokens"           -> TextAnalysis.bpeTokenStats _,
    "t5_rolling_fingerprint"  -> TextAnalysis.rollingFingerprint _,
    "t6_char_ngram_lang"      -> TextAnalysis.charNgramLangId _,
    "q23_correlated_subq"     -> Extended.correlatedSubqueries _,
    "t7_token_frequencies"    -> TextAnalysis.tokenFrequencies _,
    "q24_orders_profile"      -> Profile.ordersProfile _,
    "q25_bloom_prefilter"     -> Extended.bloomPrefilteredJoin _,
    "q26_bottomk_sample"      -> Extended.bottomKSamples _,
    "q27_string_suite"        -> Extended.stringSuite _,
    "q28_stats_suite"         -> Extended.statsSuite _,
    "d6_neardup_clusters"     -> ((s: SparkSession, d: String) => Dedup.nearDupClusters(s, d)),
    "d7_deduped_corpus"       -> ((s: SparkSession, d: String) => Dedup.dedupedCorpus(s, d)),
    "q20_asof_signup"         -> Events.asofSignup _,
    "q21_json_props"          -> Events.jsonPropStats _,
    "q22_trailing_spend"      -> Extended.trailingSpend _,
    // batch 3 extensions (round 2)
    "t8_tfidf"                -> ((s: SparkSession, d: String) => TextAnalysis.tfidfTopTerms(s, d)),
    "t9_repetition"           -> ((s: SparkSession, d: String) => TextAnalysis.repetitionStats(s, d)),
    "d8_decontaminate"        -> ((s: SparkSession, d: String) => Dedup.decontaminate(s, d)),
    "q29_range_join"          -> Events.purchasesWithRecentClicks _,
    "q30_unpivot"             -> Extended.unpivotQtyByFlag _,
    "q31_argmax"              -> Extended.argmaxSuite _,
    "q32_cube"                -> Extended.cubeQtyRevenue _,
    "q33_hash_sample"         -> Extended.hashSampledOrderStats _,
    "q34_approx_percentiles"  -> Extended.approxPercentileContract _,
    "q35_funnel"              -> Events.clickToPurchaseFunnel _,
    "q37_dim_dates"           -> ((s: SparkSession, _: String) =>
                                   Dims.dimDates(s).orderBy("calendar_dt")),
    "q38_array_agg"           -> Extended.arrayAggSuite _,
    "q40_asof_next"           -> Events.asofNextSignup _,
    "q41_native_pivot"        -> Extended.nativePivotQty _,
    "q42_bag_ops"             -> Extended.bagSetOps _,
    "q43_latest_per_key"      -> Events.latestEventPerKey _,
    "q44_supplier_revenue"    -> Extended.supplierNationRevenue _,
    "q45_asof_within"         -> Events.asofSignupWithin _,
    "q46_grouping_sets"       -> Extended.groupingSetsRevenue _,
    "q47_event_transitions"   -> Events.eventTransitionMatrix _,
    "q48_regression_suite"    -> Extended.regressionSuite _,
    "q49_expectations"        -> Extended.dataExpectations _,
    "st5_window_topk"         -> ((s: SparkSession, d: String) => Events.windowTopTypes(s, d)),
    "d10_dup_ngram_frac"      -> ((s: SparkSession, d: String) => Dedup.dupNgramFraction(s, d)),
    "d11_incremental_dedup"   -> ((s: SparkSession, d: String) => Dedup.incrementalDedup(s, d)),
    "t14_mixture_sample"      -> TextAnalysis.mixtureSample _,
    "s4_quantize_int8"        -> Similarity.quantizeInt8 _,
    "t12_pii_scrub"           -> TextAnalysis.piiScrub _,
    "t13_quality_filter"      -> ((s: SparkSession, d: String) => TextAnalysis.qualityFilterVerdicts(s, d)),
    "t11_length_buckets"      -> TextAnalysis.lengthCurriculumBuckets _,
    "q39_regex_suite"         -> Extended.regexSuite _,
    "q36_histogram"           -> ((s: SparkSession, d: String) => Extended.priceHistogram(s, d)),
    "m3_frame_samples"        -> Multimodal.frameSampleStats _,
    "m4_typed_moments"        -> Multimodal.typedFormatMoments _,
    // batch 5 extensions (round 4)
    "t15_doc_chunks"          -> ((s: SparkSession, d: String) => TextAnalysis.chunkDocuments(s, d)),
    "t16_seq_packing"         -> ((s: SparkSession, d: String) => TextAnalysis.sequencePackingPlan(s, d)),
    "t17_source_cap"          -> ((s: SparkSession, d: String) => TextAnalysis.sourceCap(s, d)),
    // d13/d14 register their AUTO-scaling forms (r6): the sizing
    // derivations are deterministic functions of corpus counts, so the
    // DuckDB twins replay them as scalar subqueries — the graded surface
    // is the scale path; the pinned r5 forms survive as DedupSpec
    // gate-scale baselines
    "d13_auto_banded"         -> ((s: SparkSession, d: String) =>
                                   Dedup.incrementalEmbeddingDedup(s, d, bandBits = 0)),
    // batch 6 extensions (round 5)
    "d12_incremental_dedup_indexed" -> ((s: SparkSession, d: String) =>
                                   Dedup.incrementalDedupIndexed(s, d)),
    "t18_token_entropy"       -> TextAnalysis.tokenEntropy _,
    "t19_passage_dedup"       -> ((s: SparkSession, d: String) => TextAnalysis.passageDedup(s, d)),
    "s5_two_stage_ann"        -> ((s: SparkSession, d: String) => Similarity.annTwoStageTopK(s, d)),
    "d14_auto_cells"          -> ((s: SparkSession, d: String) => Dedup.semanticDedupAuto(s, d)),
    "d15_source_overlap"      -> ((s: SparkSession, d: String) => Dedup.sourceOverlapMatrix(s, d)),
    "d16_split_leakage"       -> ((s: SparkSession, d: String) => Dedup.trainTestSplitLeakage(s, d)),
    "t20_lm_perplexity"       -> ((s: SparkSession, d: String) => TextAnalysis.ngramLmPerplexity(s, d)),
    "s6_pq_ann"               -> ((s: SparkSession, d: String) => Similarity.annPqTopK(s, d)),
    "m5_perceptual_hash"      -> Multimodal.perceptualHashes _,
    "t21_zipf_fit"            -> ((s: SparkSession, d: String) => TextAnalysis.zipfFit(s, d)),
    "t22_vocab_growth"        -> ((s: SparkSession, d: String) => TextAnalysis.vocabGrowth(s, d)),
    "s7_lsh_rerank"           -> ((s: SparkSession, d: String) => Similarity.annLshRerankTopK(s, d)),
    // batch 7 extensions (round 6): the duplication modes the Jaccard/
    // min-id family misses — near-subset pairs, quality-ranked survivors,
    // and media clusters over perceptual fingerprints
    "d17_containment_dedup"   -> ((s: SparkSession, d: String) => Dedup.containmentPairs(s, d)),
    "d18_quality_survivors"   -> ((s: SparkSession, d: String) => Dedup.qualitySurvivors(s, d)),
    "m6_media_dedup_clusters" -> ((s: SparkSession, d: String) => Multimodal.mediaDedupClustersAuto(s, d)),
    "t23_dsir_weights"        -> ((s: SparkSession, d: String) => TextAnalysis.dsirWeights(s, d)),
    "t24_ccnet_cut"           -> ((s: SparkSession, d: String) => TextAnalysis.ccnetPerplexityCut(s, d)),
    // batch 8 extensions (round 6): the pre-model rule battery, diversified
    // ANN serving, and the jaccard-vs-containment audit that justifies
    // running both dedup surfaces
    "t25_gopher_rules"        -> ((s: SparkSession, d: String) => TextAnalysis.gopherRules(s, d)),
    "s8_diversified_topk"     -> ((s: SparkSession, d: String) => Similarity.annDiversifiedTopK(s, d)),
    "d19_dedup_audit"         -> ((s: SparkSession, d: String) => Dedup.dedupAudit(s, d)),
    "t26_heavy_hitters"       -> ((s: SparkSession, d: String) => TextAnalysis.heavyHitters(s, d)),
    "s9_radius_search"        -> ((s: SparkSession, d: String) => Similarity.annRadiusSearch(s, d)),
    "q50_cohort_retention"    -> ((s: SparkSession, d: String) => Events.cohortRetention(s, d)),
    // batch 9 extensions (round 7): filtered/hybrid retrieval, an audited
    // k-means step, the fuzzier normalized dedup key, readability /
    // charset / distribution-shift text signals, the audio frame-energy
    // expression, and a sort-based skyline
    "s10_filtered_ann"        -> ((s: SparkSession, d: String) => Similarity.annFilteredTopK(s, d)),
    "s11_kmeans_step"         -> ((s: SparkSession, d: String) => Similarity.kmeansStep(s, d)),
    "d20_normalized_dedup"    -> Dedup.normalizedDedupGroups _,
    "t27_readability"         -> TextAnalysis.readability _,
    "t28_char_classes"        -> TextAnalysis.charClassProfile _,
    "t29_source_kl"           -> TextAnalysis.sourceKlDivergence _,
    "m7_audio_energy"         -> Multimodal.audioEnergyProfile _,
    "q51_part_skyline"        -> Extended.partSkyline _,
    // batch 10 extensions (round 7): positional span dedup, first-
    // occurrence event dedup (streaming twin in StreamingSpec), decayed
    // spend, token burstiness, and scene-change keyframe selection
    "d21_shared_spans"        -> ((s: SparkSession, d: String) => Dedup.longestSharedSpan(s, d)),
    "st6_event_dedup"         -> Events.eventDedup _,
    "q52_ewma_spend"          -> Extended.ewmaSpend _,
    "t30_burstiness"          -> ((s: SparkSession, d: String) => TextAnalysis.tokenBurstiness(s, d)),
    "m8_keyframes"            -> ((s: SparkSession, d: String) => Multimodal.keyframes(s, d)),
    // batch 11 extensions (round 7): cluster-quality audit over the
    // near-dup graph, hourly volume anomaly alerts, and audio silence trim
    "d22_cluster_cohesion"    -> ((s: SparkSession, d: String) => Dedup.clusterCohesion(s, d)),
    "q53_hourly_anomaly"      -> Events.hourlyAnomaly _,
    "m9_silence_trim"         -> Multimodal.silenceTrim _,
    // batch 12 extensions (round 7): temperature mixture weights, the
    // vocabulary coverage curve, centroid silhouette, spend deciles
    // (Lorenz), sweep-line peak concurrency, stream-static enrichment
    // (streaming twin in StreamingSpec), and the audio clipping audit
    "t31_temp_mixture"        -> ((s: SparkSession, d: String) => TextAnalysis.temperatureMixture(s, d)),
    "t32_coverage_curve"      -> ((s: SparkSession, d: String) => TextAnalysis.coverageCurve(s, d)),
    "s12_silhouette"          -> Similarity.labelSilhouette _,
    "q54_spend_deciles"       -> ((s: SparkSession, d: String) => Extended.spendDeciles(s, d)),
    "q55_max_concurrency"     -> ((s: SparkSession, d: String) => Extended.maxConcurrency(s, d)),
    "st7_enriched_counts"     -> Events.enrichedWindowCounts _,
    "m10_audio_clipping"      -> Multimodal.audioClipping _,
    "s13_index_quality"       -> ((s: SparkSession, d: String) => Similarity.indexQualityReport(s, d)),
    // batch 13 extensions (round 7): the dedup token-budget report, the
    // sessionized engagement KPI, and the payload-entropy screen
    "d23_effective_tokens"    -> Dedup.effectiveTokens _,
    "q56_bounce_rate"         -> Events.bounceRate _,
    "m11_byte_entropy"        -> Multimodal.byteEntropyProfile _,
    // batch 14 (round 8): the real-pixel GIF frame decode, registered —
    // the r7 verdict's one remaining stub-backed m-family row
    "m12_pixel_frames"        -> Multimodal.pixelFrameStats _,
    // batch 15 (round 8): threshold sensitivity, shot boundaries, the
    // ordered funnel, the serving recall curve, and the disorder audit
    "d24_threshold_sweep"     -> ((s: SparkSession, d: String) => Dedup.thresholdSweep(s, d)),
    "m13_shot_boundaries"     -> Multimodal.shotBoundaries _,
    "q57_funnel"              -> Extended.funnel _,
    "s14_recall_curve"        -> ((s: SparkSession, d: String) => Similarity.recallCurve(s, d)),
    "st8_disorder_audit"      -> ((s: SparkSession, d: String) => Events.disorderAudit(s, d)),
    // batch 16 (round 9): the quality damage curve (d24's sweep pattern
    // for the curation cut), cluster-size distribution, SCD2 interval
    // reconstruction, and the level-crossing audio screen
    "t33_quality_sweep"       -> ((s: SparkSession, d: String) =>
                                   TextAnalysis.qualityThresholdSweep(s, d)),
    "d25_cluster_sizes"       -> ((s: SparkSession, d: String) =>
                                   Dedup.clusterSizeDistribution(s, d)),
    "q58_scd2_intervals"      -> Extended.scd2Intervals _,
    "m14_level_crossings"     -> Multimodal.audioLevelCrossings _,
    "q59_locf_impute"         -> Extended.lastObservationCarriedForward _,
    "st9_funnel_stages"       -> Events.funnelStagesStateful _,
    "s15_quant_impact"        -> ((s: SparkSession, d: String) =>
                                   Similarity.quantizationImpact(s, d)),
    "q60_error_context"       -> Extended.errorContext _,
    "d26_auto_config"         -> Dedup.autoConfigReport _,
    "d27_incremental_containment" -> ((s: SparkSession, d: String) =>
                                   Dedup.incrementalContainmentDedup(s, d)),
    "d28_incremental_containment_indexed" -> ((s: SparkSession, d: String) =>
                                   Dedup.incrementalContainmentIndexed(s, d)),
    "d29_band_occupancy"      -> Dedup.bandOccupancyAudit _,
    "m15_gradient_hash"       -> Multimodal.gradientHashes _,
    "m16_media_band_occupancy" -> ((s: SparkSession, d: String) =>
      Multimodal.mediaBandOccupancyAudit(s, d)),
    "m17_curvature_hash"      -> Multimodal.curvatureHashes _,
    "st10_attribution"        -> ((s: SparkSession, d: String) =>
      Events.attributedPairs(s, d)),
    "st11_attribution_outer"  -> ((s: SparkSession, d: String) =>
      Events.attributionOuter(s, d)),
    "d30_order_drift"         -> ((s: SparkSession, d: String) =>
      Dedup.indexOrderDriftAudit(s, d)),
    "t34_curation_funnel"     -> ((s: SparkSession, d: String) =>
      Curation.curationFunnel(s, d)),
    "t35_token_budget"        -> ((s: SparkSession, d: String) =>
      TextAnalysis.tokenBudgetCurve(s, d)),
    "m18_media_indexed"       -> ((s: SparkSession, d: String) =>
      Multimodal.incrementalMediaIndexed(s, d)),
    "m19_media_drift"         -> ((s: SparkSession, d: String) =>
      Multimodal.mediaIndexDriftAudit(s, d)),
    "s21_modality_coverage"   -> ((s: SparkSession, d: String) =>
      Similarity.modalityCoverageAudit(s, d)),
    "m20_media_incremental"   -> ((s: SparkSession, d: String) =>
      Multimodal.incrementalMediaPlanted(s, d)),
    "s22_ivfpq_ann"           -> ((s: SparkSession, d: String) =>
      Similarity.annIvfPqIndexed(s, d)),
    "s23_ivfpq_drift"         -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqDriftAudit(s, d)),
  )

  /** DuckDB-runnable ANSI SQL twin for each query (same column aliases). */
  def oracleSql: Map[String, String] = Map(
    "q1_pivot_monthly_qty" ->
      (1 to 12).map(m =>
        f"CAST(sum(CASE WHEN month(l_shipdate) = $m THEN l_quantity ELSE 0 END) AS DOUBLE) AS qty_m$m%02d")
        .mkString("SELECT ", ", ", " FROM lineitem"),

    "q2_shipment_cond_counts" -> """
      SELECT
        count(CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) >= 60 THEN 1 END) AS tt_late_shipments,
        count(CASE WHEN o_orderstatus = 'O' AND CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) >= 30 THEN 1 END) AS tt_open_late_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",

    "q3_top1_day_per_part" -> """
      WITH g AS (
        SELECT l_partkey, CAST(l_shipdate AS DATE) AS ship_day, count(*) AS day_count
        FROM lineitem GROUP BY 1, 2),
      r AS (
        SELECT g.*, row_number() OVER (
          PARTITION BY l_partkey ORDER BY day_count DESC, ship_day ASC) AS rn
        FROM g)
      SELECT l_partkey, ship_day, day_count FROM r WHERE rn = 1 ORDER BY l_partkey""",

    "q4_events_monthly" -> """
      SELECT
        strftime(ts, '%Y-%m') AS year_month,
        round(avg(CASE WHEN dayofweek(ts) = 6 THEN 1.0 ELSE 0.0 END), 2) AS sat_share,
        round(avg(CASE WHEN dayofweek(ts) = 0 THEN 1.0 ELSE 0.0 END), 2) AS sun_share,
        round(avg(CASE WHEN dayofweek(ts) = 6 THEN value ELSE 0.0 END), 2) AS sat_mean_value,
        round(avg(CASE WHEN dayofweek(ts) = 0 THEN value ELSE 0.0 END), 2) AS sun_mean_value,
        count(CASE WHEN dayofweek(ts) = 6 THEN 1 END) AS sat_events,
        count(CASE WHEN dayofweek(ts) = 0 THEN 1 END) AS sun_events
      FROM events GROUP BY 1 ORDER BY year_month""",

    "q5_revenue_by_nation" -> """
      SELECT r_name, n_name,
        round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q6_returnflag_pct" -> """
      SELECT l_partkey,
        round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_returned,
        round(CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_acked,
        round(CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_none,
        count(*) AS n_items
      FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""",

    "q7_best_part" -> """
      WITH g AS (
        SELECT l_partkey, CAST(l_shipdate AS DATE) AS ship_day, count(*) AS day_count
        FROM lineitem GROUP BY 1, 2),
      ms AS (
        SELECT l_partkey AS ms_partkey, ship_day FROM (
          SELECT g.*, row_number() OVER (
            PARTITION BY l_partkey ORDER BY day_count DESC, ship_day ASC) AS rn
          FROM g) WHERE rn = 1),
      fp AS (
        SELECT l_partkey AS fp_partkey,
          round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_returned,
          round(CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_clean,
          count(*) AS tt_items
        FROM lineitem GROUP BY 1),
      pp AS (
        SELECT l_partkey AS pp_partkey,
          round(CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_urgent,
          round(CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_low
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1)
      SELECT p_partkey, p_name,
        ship_day AS most_shipped_day,
        CAST(COALESCE(pct_clean, 0) AS DOUBLE) AS pct_clean,
        CAST(COALESCE(pct_returned, 0) AS DOUBLE) AS pct_returned,
        CAST(COALESCE(pct_urgent, 0) AS DOUBLE) AS pct_urgent,
        CAST(COALESCE(pct_low, 0) AS DOUBLE) AS pct_low,
        CAST(COALESCE(tt_items, 0) AS BIGINT) AS tt_items
      FROM part
      LEFT JOIN ms ON p_partkey = ms_partkey
      LEFT JOIN fp ON p_partkey = fp_partkey
      LEFT JOIN pp ON p_partkey = pp_partkey
      ORDER BY pct_clean DESC, pct_urgent DESC, tt_items DESC, p_partkey ASC
      LIMIT 1""",

    "q8_watermark_max" -> """
      SELECT CAST(COALESCE(max(CAST(o_orderkey AS BIGINT)), 0) AS BIGINT) AS max_key
      FROM orders""",

    "q9_holiday_pivot" -> {
      val pivots = (1 to 12).map(m =>
        f"CAST(round(sum(CASE WHEN month_of_the_year_num = $m THEN o_totalprice ELSE 0 END), 2) AS DOUBLE) AS tt_order_hol_$m%02d")
        .mkString(", ")
      s"""WITH ${Dims.dimDatesSqlCte},
      j AS (
        SELECT o_totalprice, month_of_the_year_num
        FROM orders LEFT JOIN dim_dates ON CAST(o_orderdate AS DATE) = calendar_dt
        WHERE year_num = 1998 AND day_of_the_week_num BETWEEN 2 AND 6
          AND working_day = 'false')
      SELECT DATE '2026-01-01' AS ingestion_date, $pivots FROM j"""
    },

    "q10_anti_join" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
      ORDER BY c_custkey""",

    "q11_semi_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
      ORDER BY c_custkey""",

    "q12_set_ops" -> """
      SELECT o_custkey FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
      ) t ORDER BY o_custkey""",

    "q13_distinct_aggs" -> """
      SELECT l_returnflag,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty,
        count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q14_revenue_rollup" -> """
      SELECT r_name, n_name,
        CAST(round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS DOUBLE) AS revenue,
        CAST(GROUPING(r_name) AS INT) AS g_region,
        CAST(GROUPING(n_name) AS INT) AS g_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY g_region, g_nation, r_name, n_name""",

    "q15_window_suite" -> """
      WITH b AS (
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_day,
               round(o_totalprice, 2) AS price
        FROM orders)
      SELECT o_custkey, o_orderkey, order_day, price,
        CAST(row_number() OVER seq AS BIGINT) AS rn,
        CAST(rank() OVER byprice AS BIGINT) AS rnk,
        CAST(dense_rank() OVER byprice AS BIGINT) AS drnk,
        lag(price, 1) OVER seq AS prev_price,
        lead(price, 1) OVER seq AS next_price,
        round(sum(price) OVER (PARTITION BY o_custkey ORDER BY order_day, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
        round(price / sum(price) OVER (PARTITION BY o_custkey) * 100.0, 2) AS pct_of_cust,
        CAST(ntile(4) OVER byprice AS BIGINT) AS quartile,
        round(percent_rank() OVER bypriceasc, 4) AS pct_rank,
        round(cume_dist() OVER bypriceasc, 4) AS cume,
        first_value(price) OVER (PARTITION BY o_custkey ORDER BY order_day, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_spend,
        last_value(price) OVER (PARTITION BY o_custkey ORDER BY order_day, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS latest_spend,
        nth_value(price, 2) OVER (PARTITION BY o_custkey ORDER BY order_day, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_spend
      FROM b
      WINDOW
        seq AS (PARTITION BY o_custkey ORDER BY order_day, o_orderkey),
        byprice AS (PARTITION BY o_custkey ORDER BY price DESC, o_orderkey),
        bypriceasc AS (PARTITION BY o_custkey ORDER BY price ASC, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",

    "q16_scalar_suite" -> """
      SELECT o_orderkey,
        CAST(o_orderdate AS DATE) AS order_day,
        CAST(o_orderdate AS DATE) + 15 AS due_day,
        CAST(DATE '2002-01-01' - CAST(o_orderdate AS DATE) AS INT) AS age_days,
        strftime(o_orderdate, '%Y-%m') AS order_month,
        CAST(year(o_orderdate) AS INT) AS order_year,
        CAST(quarter(o_orderdate) AS INT) AS order_quarter,
        CASE WHEN o_totalprice >= 200000.0 THEN 'high'
             WHEN o_totalprice >= 100000.0 THEN 'mid'
             ELSE 'low' END AS price_band,
        COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_default,
        round(o_totalprice / 7.0, 3) AS weekly_rate
      FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""",

    "t1_text_stats" -> TextStatsOracleSql,

    // t12: identical PII regexes, counts + nested masking replace.
    "t12_pii_scrub" -> {
      import graft.operators.TextAnalysis.{EmailRx, Ipv4Rx, PhoneRx}
      s"""WITH n AS (SELECT doc_id, lower(text) AS t FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '$EmailRx')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t, '$PhoneRx')) AS BIGINT) AS n_phones,
        CAST(len(regexp_extract_all(t, '$Ipv4Rx')) AS BIGINT) AS n_ips,
        CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
          '$EmailRx', '<email>', 'g'), '$PhoneRx', '<phone>', 'g'),
          '$Ipv4Rx', '<ip>', 'g')) AS BIGINT) AS masked_len,
        md5(regexp_replace(regexp_replace(regexp_replace(t,
          '$EmailRx', '<email>', 'g'), '$PhoneRx', '<phone>', 'g'),
          '$Ipv4Rx', '<ip>', 'g')) AS masked_md5
      FROM n ORDER BY doc_id"""
    },

    // t13: the composite filter over the t1 + t9 oracle metrics.
    "t13_quality_filter" -> s"""
      WITH t1 AS ($TextStatsOracleSql),
      t9 AS ($RepetitionOracleSql),
      j AS (
        SELECT t1.doc_id, t1.n_tokens, t1.quality_score, t9.top_trigram_ratio,
          CASE WHEN t1.n_tokens < 10 THEN 'too_short'
               WHEN t1.n_tokens > 100000 THEN 'too_long'
               WHEN t1.quality_score < 0.3 THEN 'low_quality'
               WHEN t9.top_trigram_ratio > 0.2 THEN 'repetitive'
               ELSE 'kept' END AS reject_reason
        FROM t1 JOIN t9 ON t1.doc_id = t9.doc_id)
      SELECT doc_id, n_tokens, quality_score, top_trigram_ratio,
        reject_reason = 'kept' AS kept, reject_reason
      FROM j ORDER BY doc_id""",

    // t17: rank on the ROUNDED t1 quality score (cross-engine stable, t1
    // hash-matches) with a doc_id tie-break; cap matches the Scala default.
    "t17_source_cap" -> s"""
      WITH t1 AS ($TextStatsOracleSql),
      s AS (
        SELECT d.doc_id, d.source, t1.quality_score,
          row_number() OVER (PARTITION BY d.source
            ORDER BY t1.quality_score DESC, d.doc_id ASC) AS src_rank
        FROM documents d JOIN t1 ON d.doc_id = t1.doc_id)
      SELECT doc_id, source, quality_score, CAST(src_rank AS BIGINT) AS src_rank,
        src_rank <= 10 AS kept
      FROM s ORDER BY doc_id""",

    "t2_lang_id" -> LangIdOracleSql,

    // t10: confusion matrix over the t2 per-doc predictions.
    "t10_lang_confusion" -> s"""
      WITH t2 AS ($LangIdOracleSql),
      g AS (
        SELECT lang_declared, lang_pred, count(*) AS n_docs
        FROM t2 GROUP BY 1, 2),
      t AS (SELECT lang_declared, sum(n_docs) AS tot FROM g GROUP BY 1)
      SELECT g.lang_declared, g.lang_pred, CAST(g.n_docs AS BIGINT) AS n_docs,
        round(CAST(g.n_docs AS DOUBLE) / t.tot * 100.0 + 0.000000001, 4)
          AS pct_of_declared
      FROM g JOIN t USING (lang_declared) ORDER BY lang_declared, lang_pred""",

    "t3_quality_by_source" -> s"""
      WITH n AS (
        SELECT lang, source, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
        FROM documents),
      tk AS (SELECT lang, source, norm, string_split(norm, ' ') AS toks FROM n),
      m AS (
        SELECT lang, source,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          round(CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1), 4) AS ttr,
          round(CAST(len(list_filter(toks, t -> list_contains($StopSqlList, t))) AS DOUBLE)
            / greatest(len(toks), 1), 4) AS swr
        FROM tk),
      q AS (
        SELECT lang, source, n_tokens,
          round(least(CAST(n_tokens AS DOUBLE) / 500.0, 1.0) * 0.4
            + ttr * 0.3 + (1.0 - swr) * 0.3 + 0.000000001, 4) AS q
        FROM m)
      SELECT lang, source, round(avg(q) + 0.000000001, 4) AS avg_quality,
        round(avg(n_tokens), 2) AS avg_tokens, count(*) AS n_docs
      FROM q GROUP BY lang, source ORDER BY lang, source""",

    "d1_exact_dedup" -> """
      WITH f AS (
        SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents)
      SELECT min(doc_id) AS survivor_id, count(*) AS n_copies
      FROM f GROUP BY fp ORDER BY survivor_id""",

    "d2_ngram_jaccard" -> JaccardPairsSql,
    // d3 shares d2's oracle: LSH candidates are verified with exact Jaccard,
    // and at the planted near-dup similarity (j≈0.99) the per-pair miss
    // probability is (1-0.99^4)^8 ≈ 5e-12.
    "d3_minhash_lsh" -> JaccardPairsSql,

    // full replay of the banded-LSH pipeline: the same %.9f hyperplane
    // literals give bit-identical 24-bit signatures, the same band split
    // gives the same candidate set, and the pre-normalized dot (sequential
    // list_sum ≡ the fused array_dot loop) verifies it identically.
    // d5 (r6): banding derives from the corpus count like d13 — the same
    // scalar-subquery sizing, 63-bit flat signature, and dynamic band
    // extraction; only the pair predicate differs (all id_a < id_b pairs
    // instead of the cross-parity probe).
    "d5_embedding_neardup" -> s"""
      WITH prm0 AS (
        SELECT greatest(${graft.operators.Dedup.EmbBandBits},
          CAST(round(ln(CAST(greatest(count(*), 1) AS DOUBLE)
                        / ${graft.operators.Dedup.EmbTargetBucket})
                     / ln(2), 0) AS INT)) AS bits
        FROM embeddings),
      prm AS (SELECT bits,
                least(${graft.operators.Dedup.EmbBands}, 63 // bits) AS nbands
              FROM prm0),
      n0 AS (
        SELECT vec_id, embedding,
          (${graft.functions.VectorFunctions.hyperplaneBucketDuckSqlFlat(
            "embedding", 64, 63)}) AS sig,
          sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      nv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS ne, sig
             FROM n0),
      bands AS (
        SELECT vec_id, band, (sig >> (band * bits)) & ((1::BIGINT << bits) - 1) AS bkey
        FROM nv CROSS JOIN prm
        CROSS JOIN (SELECT unnest(range(0, ${graft.operators.Dedup.EmbBands})) AS band) bb
        WHERE band < nbands),
      cand AS (
        SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
      p AS (
        SELECT c.ia, c.ib, a.ne AS ea, b.ne AS eb
        FROM cand c JOIN nv a ON a.vec_id = c.ia JOIN nv b ON b.vec_id = c.ib),
      u AS (SELECT ia, ib, unnest(range(1, len(ea) + 1)) AS i, ea, eb FROM p),
      s AS (SELECT ia, ib, sum(ea[i] * eb[i]) AS dot FROM u GROUP BY 1, 2)
      SELECT ia AS id_a, ib AS id_b, round(dot, 4) AS cos_sim
      FROM s WHERE dot >= 0.45 ORDER BY id_a, id_b""",

    // d13 auto (r6): the registered form derives its banding from the
    // corpus count — the oracle replays the sizing as a scalar subquery
    // over the SAME count (ln/ln spelled exactly like deriveBandBits, with
    // the max(3,·) floor masking any sub-3 rounding divergence), computes
    // a 63-bit signature (the widest any derivation can use; band
    // extraction reads only bits < nbands*bits, so unused high bits are
    // inert), and verifies candidates cross-parity like the r5 pinned d13.
    "d13_auto_banded" -> s"""
      WITH prm0 AS (
        SELECT greatest(${graft.operators.Dedup.EmbBandBits},
          CAST(round(ln(CAST(greatest(count(*), 1) AS DOUBLE)
                        / ${graft.operators.Dedup.EmbTargetBucket})
                     / ln(2), 0) AS INT)) AS bits
        FROM embeddings),
      prm AS (SELECT bits,
                least(${graft.operators.Dedup.EmbBands}, 63 // bits) AS nbands
              FROM prm0),
      n0 AS (
        SELECT vec_id, embedding,
          (${graft.functions.VectorFunctions.hyperplaneBucketDuckSqlFlat(
            "embedding", 64, 63)}) AS sig,
          sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      nv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS ne, sig
             FROM n0),
      bands AS (
        SELECT vec_id, band, (sig >> (band * bits)) & ((1::BIGINT << bits) - 1) AS bkey
        FROM nv CROSS JOIN prm
        CROSS JOIN (SELECT unnest(range(0, ${graft.operators.Dedup.EmbBands})) AS band) bb
        WHERE band < nbands),
      cand AS (
        SELECT DISTINCT a.vec_id AS batch_id, b.vec_id AS corpus_id
        FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.vec_id % 2 = 1 AND b.vec_id % 2 = 0),
      p AS (
        SELECT c.batch_id, c.corpus_id, a.ne AS ea, b.ne AS eb
        FROM cand c JOIN nv a ON a.vec_id = c.batch_id JOIN nv b ON b.vec_id = c.corpus_id),
      u AS (SELECT batch_id, corpus_id, unnest(range(1, len(ea) + 1)) AS i, ea, eb FROM p),
      s AS (SELECT batch_id, corpus_id, sum(ea[i] * eb[i]) AS dot FROM u GROUP BY 1, 2)
      SELECT batch_id, corpus_id, round(dot, 4) AS cos_sim
      FROM s WHERE dot >= 0.45 ORDER BY batch_id, corpus_id""",

    // d14 auto (r6): subBits derives from (count, distinct labels) as a
    // scalar subquery (the deriveSubBits spelling verbatim; the max(0,·)
    // floor masks sub-zero rounding divergence). Seed cells are
    // label·2^sb + (16-bit hyperplane bucket & (2^sb - 1)) — the same
    // plane-prefix property as d5's banding makes the masked 16-bit
    // bucket identical to Spark's sb-bit bucket for any sb <= 16 (sb = 16
    // needs a ~10^12-vector corpus). Centroids, argmax assignment, and
    // the keep-first within-cell prune replay the pinned d14 tail.
    "d14_auto_cells" -> (IvfAssignAutoCtesSql + s""",
      pr AS (
        SELECT a.vec_id AS u, b.vec_id AS v, a.cent_id AS cell
        FROM assigned a JOIN assigned b
          ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id),
      pe AS (
        SELECT pr.u, pr.v, pr.cell, ea.embedding AS ea, eb.embedding AS eb
        FROM pr JOIN e ea ON ea.vec_id = pr.u JOIN e eb ON eb.vec_id = pr.v),
      pu AS (SELECT u, v, cell, unnest(range(1, len(ea) + 1)) AS i, ea, eb FROM pe),
      ps AS (
        SELECT u, v, cell,
          sum(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)) AS dot,
          sum(CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE)) AS na,
          sum(CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)) AS nb
        FROM pu GROUP BY 1, 2, 3),
      pc AS (SELECT u, v, cell, dot / (sqrt(na) * sqrt(nb)) AS cs FROM ps),
      fl AS (SELECT * FROM pc WHERE cs >= 0.45),
      rk AS (SELECT *, row_number() OVER (PARTITION BY v ORDER BY u) AS rn FROM fl)
      SELECT v AS vec_id, cell, u AS pruned_by, round(cs, 4) AS cos_sim
      FROM rk WHERE rn = 1 ORDER BY vec_id"""),

    // s1 (r7): multi-index exact top-k — the IVF candidate CTEs (the
    // registered s3's auto-sized quantizer, verbatim) UNIONed with the
    // LSH candidate CTEs (the shared s2-family fragment, "l"-prefixed to
    // dodge the `prm` name collision), then exact cosine top-k over the
    // deduplicated union. SQL UNION (not UNION ALL) replays the Spark
    // side's .distinct().
    "s1_ann_topk" -> (IvfAssignAutoCtesSql + s""",
      prb AS (
        SELECT query_id, cent_id FROM (
          SELECT vec_id AS query_id, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS r
          FROM ac WHERE vec_id % 50 = 0) WHERE r <= ${graft.operators.Similarity.IvfNProbe}),
      icand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM prb p JOIN assigned a ON p.cent_id = a.cent_id
        WHERE a.vec_id <> p.query_id),""" + LshCandCtesSqlPrefixed("l") + s""",
      allc AS (
        SELECT query_id, neighbor_id FROM lcand
        UNION
        SELECT query_id, neighbor_id FROM icand),
      pairs AS (
        SELECT allc.query_id, allc.neighbor_id, eq.embedding AS qe, en.embedding AS ne
        FROM allc
        JOIN e eq ON eq.vec_id = allc.query_id
        JOIN e en ON en.vec_id = allc.neighbor_id),
      pu AS (SELECT query_id, neighbor_id, unnest(range(1, len(qe) + 1)) AS i, qe, ne FROM pairs),
      ps AS (
        SELECT query_id, neighbor_id,
          sum(CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
          sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS na,
          sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nb
        FROM pu GROUP BY 1, 2),
      pc AS (SELECT query_id, neighbor_id, dot / (sqrt(na) * sqrt(nb)) AS cos FROM ps),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM pc)
      SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, round(cos, 4) AS cos_sim
      FROM r WHERE rnk <= ${graft.operators.Similarity.TopK} ORDER BY query_id, rnk"""),

    "st1_windowed_counts" -> """
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
        event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "st5_window_topk" -> """
      WITH c AS (
        SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
          event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY window_start
          ORDER BY n_events DESC, event_type ASC) AS rnk
        FROM c)
      SELECT window_start, event_type, CAST(n_events AS BIGINT) AS n_events,
        CAST(rnk AS BIGINT) AS rnk
      FROM r WHERE rnk <= 3 ORDER BY window_start, rnk""",

    "st2_sessionize" -> """
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e),
      n AS (SELECT *, CASE WHEN prev_ts IS NULL
                            OR date_diff('second', prev_ts, ts) > 1800
                      THEN 1 ELSE 0 END AS ns FROM l),
      s AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM n)
      SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
        count(*) AS n_events, round(sum(value), 2) AS total_value,
        CAST(date_diff('microsecond', min(ts), max(ts)) // 60000000 AS BIGINT) AS duration_min
      FROM s GROUP BY 1, 2 ORDER BY user_id, session_seq""",

    "m1_binary_features" -> """
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        sha256(text) AS content_sha256
      FROM documents ORDER BY doc_id""",

    "q18_salted_revenue" -> """
      SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend,
        count(*) AS n_rows
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""",

    "q19_percentiles" -> """
      SELECT event_type,
        round(quantile_cont(value, 0.25), 4) AS p25,
        round(quantile_cont(value, 0.5), 4) AS p50,
        round(quantile_cont(value, 0.75), 4) AS p75,
        round(quantile_cont(value, 0.95), 4) AS p95,
        count(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q4b_daily_pivot" -> {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val cols = types.flatMap(t => Seq(
        s"count(CASE WHEN event_type = '$t' THEN 1 END) AS n_$t",
        s"round(sum(CASE WHEN event_type = '$t' THEN value ELSE 0.0 END), 2) AS val_$t"))
        .mkString(", ")
      s"""SELECT CAST(ts AS DATE) AS day, $cols
          FROM events GROUP BY 1 ORDER BY day"""
    },

    "st3_sliding_windows" -> """
      WITH offs AS (SELECT unnest([0, 1, 2, 3]) AS k),
      e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      w AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes'
                 AS window_start,
               event_type, value
        FROM e, offs)
      SELECT window_start, event_type, count(*) AS n_events,
        round(sum(value), 2) AS total_value
      FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "t4_bpe_tokens" -> """
      WITH p AS (
        SELECT doc_id,
          regexp_extract_all(lower(trim(text)), ' ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+')
            AS pieces
        FROM documents)
      SELECT doc_id, CAST(len(pieces) AS BIGINT) AS n_pieces,
        round(CAST(len(array_to_string(pieces, '')) AS DOUBLE)
          / greatest(len(pieces), 1), 4) AS avg_piece_len
      FROM p ORDER BY doc_id""",

    "t6_char_ngram_lang" -> {
      val hits = graft.operators.TextAnalysis.CharTrigramProfiles.map { case (lang, p) =>
        val lst = p.mkString("['", "', '", "']")
        s"CAST(len(list_filter(tris, t -> list_contains($lst, t))) AS BIGINT) AS tri_$lang"
      }.mkString(",\n          ")
      val langs = graft.operators.TextAnalysis.CharTrigramProfiles.map(_._1)
      val bestExpr = langs.map(l => s"tri_$l").mkString("greatest(", ", ", ")")
      val caseArms = langs.map(l =>
        s"WHEN tri_$l = best AND best > 0 THEN '$l'").mkString("\n             ")
      s"""WITH n AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
        FROM documents),
      tt AS (
        SELECT doc_id,
          list_transform(range(1, length(norm) - 1), i -> substr(norm, CAST(i AS INT), 3)) AS tris
        FROM n),
      h AS (
        SELECT doc_id,
          $hits
        FROM tt),
      b AS (SELECT *, $bestExpr AS best FROM h)
      SELECT doc_id,
        CASE $caseArms
             ELSE 'und' END AS tri_lang_pred,
        ${langs.map(l => s"tri_$l").mkString(", ")}
      FROM b ORDER BY doc_id"""
    },

    "q23_correlated_subq" -> """
      SELECT c_custkey, c_name,
        (SELECT round(coalesce(sum(o_totalprice), 0), 2) FROM orders
         WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995) AS spend_1995
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey""",

    "d6_neardup_clusters" -> NearDupClustersSql,
    "d17_containment_dedup" -> ContainmentPairsSql,
    "d18_quality_survivors" -> QualitySurvivorsSql,
    "d27_incremental_containment" -> IncrementalContainmentSql,
    // d28: identical contract to d27 — the index changes WHERE the corpus
    // frames come from (bucketed tables, frozen corpus-df order), never
    // which pairs clear the exact containment verify
    "d28_incremental_containment_indexed" -> IncrementalContainmentSql,
    // d30: the shared shingle CTEs, positioned under (df asc, shingle
    // STRING asc) — the engine's hashed tie-break would diverge — with
    // the frozen order's df over the even (build) half and unseen
    // shingles at df 0, exactly the append path's left-join-default-0
    "d30_order_drift" -> OrderDriftSql,

    // d29: the 13-bit band layout replayed from the d4 signature oracle
    // (at gate scale the derived extra width is 0 — pinned by d26 and
    // the Round10Spec coupling test); Σ C(s,2) in integer division
    "d29_band_occupancy" -> s"""
      WITH sig AS ($SimHashOracleSql),
      bd AS (SELECT unnest(range(0, 4)) AS band),
      bands AS (
        SELECT s.doc_id, bd.band,
          (s.simhash >> CAST(13 * bd.band AS INT)) & 8191 AS bkey
        FROM sig s CROSS JOIN bd),
      occ AS (SELECT band, bkey, count(*) AS c FROM bands GROUP BY 1, 2)
      SELECT CAST(band AS BIGINT) AS band,
        CAST(count(*) AS BIGINT) AS n_buckets,
        CAST(max(c) AS BIGINT) AS max_occupancy,
        CAST(sum(c * (c - 1) // 2) AS BIGINT) AS collision_rows
      FROM occ GROUP BY 1 ORDER BY 1""",

    // m15: the 53-block gradient hash replayed with the same integer
    // cross-multiplication as the Scala expression (s_{j+1}·len_j >
    // s_j·len_{j+1}) — no float division on either engine
    "m15_gradient_hash" -> s"""
      WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
      b AS (
        SELECT doc_id,
          list_transform(range(1, length(h) // 2 + 1),
            i -> ('0x' || substr(h, CAST(2 * i - 1 AS INT), 2))::BIGINT) AS bytes
        FROM hx),
      t AS (SELECT doc_id, bytes, len(bytes) AS L FROM b),
      gbits AS (
        SELECT doc_id, L,
          CAST(list_sum(list_transform(range(0, 52), j ->
            CASE WHEN CAST(coalesce(list_sum(list_slice(bytes,
                          (j + 1) * L // 53 + 1, (j + 2) * L // 53)), 0)
                       AS BIGINT)
                      * ((j + 1) * L // 53 - j * L // 53)
                    > CAST(coalesce(list_sum(list_slice(bytes,
                          j * L // 53 + 1, (j + 1) * L // 53)), 0)
                       AS BIGINT)
                      * ((j + 2) * L // 53 - (j + 1) * L // 53)
                 THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS ghash
        FROM t)
      SELECT doc_id, CAST(L AS BIGINT) AS byte_len,
        coalesce(ghash, 0) AS ghash
      FROM gbits ORDER BY doc_id""",

    // m17: the 54-block curvature hash replayed with the division-free
    // triple cross-multiplication (s_{j+2}·l_{j+1}·l_j + s_j·l_{j+2}·
    // l_{j+1} > 2·s_{j+1}·l_{j+2}·l_j) — integers on both engines
    "m17_curvature_hash" -> s"""
      WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
      b AS (
        SELECT doc_id,
          list_transform(range(1, length(h) // 2 + 1),
            i -> ('0x' || substr(h, CAST(2 * i - 1 AS INT), 2))::BIGINT) AS bytes
        FROM hx),
      t AS (SELECT doc_id, bytes, len(bytes) AS L FROM b),
      cbits AS (
        SELECT doc_id, L,
          CAST(list_sum(list_transform(range(0, 52), j ->
            CASE WHEN CAST(coalesce(list_sum(list_slice(bytes,
                          (j + 2) * L // 54 + 1, (j + 3) * L // 54)), 0)
                       AS BIGINT)
                      * ((j + 2) * L // 54 - (j + 1) * L // 54)
                      * ((j + 1) * L // 54 - j * L // 54)
                    + CAST(coalesce(list_sum(list_slice(bytes,
                          j * L // 54 + 1, (j + 1) * L // 54)), 0)
                       AS BIGINT)
                      * ((j + 3) * L // 54 - (j + 2) * L // 54)
                      * ((j + 2) * L // 54 - (j + 1) * L // 54)
                    > 2 * CAST(coalesce(list_sum(list_slice(bytes,
                          (j + 1) * L // 54 + 1, (j + 2) * L // 54)), 0)
                       AS BIGINT)
                      * ((j + 3) * L // 54 - (j + 2) * L // 54)
                      * ((j + 1) * L // 54 - j * L // 54)
                 THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS chash
        FROM t)
      SELECT doc_id, CAST(L AS BIGINT) AS byte_len,
        coalesce(chash, 0) AS chash
      FROM cbits ORDER BY doc_id""",

    "q25_bloom_prefilter" -> """
      WITH urgent AS (
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
      SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS urgent_open_revenue,
        count(*) AS n_items
      FROM lineitem JOIN urgent ON l_orderkey = o_orderkey""",

    "q27_string_suite" -> """
      SELECT c_custkey,
        upper(c_name) AS name_upper,
        lower(c_mktsegment) AS segment_lower,
        substr(c_name, 1, 8) AS name_prefix,
        lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        reverse(c_name) AS name_rev,
        CAST(length(c_name) AS BIGINT) AS name_len,
        CAST(strpos(c_name, 'Customer') AS BIGINT) AS pos_customer,
        CAST(levenshtein(c_name, reverse(c_name)) AS BIGINT) AS lev_to_rev,
        concat_ws('|', c_mktsegment, c_name) AS seg_name
      FROM customer WHERE c_custkey % 10 = 0 ORDER BY c_custkey""",

    "q28_stats_suite" -> """
      SELECT l_returnflag,
        round(stddev_samp(l_extendedprice) + 0.000000001, 2) AS price_stddev,
        round(var_samp(l_quantity) + 0.000000001, 4) AS qty_var,
        round(corr(l_quantity, l_extendedprice) + 0.000000001, 6) AS qty_price_corr,
        round(covar_samp(l_discount, l_tax) + 0.000000001, 8) AS disc_tax_covar,
        round(skewness(l_extendedprice)
          * (count(*) - 2) / sqrt(count(*) * (count(*) - 1.0))
          + 0.000000001, 4) AS price_skew,
        count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q48_regression_suite" -> """
      SELECT l_returnflag,
        round(regr_slope(l_extendedprice, CAST(l_quantity AS DOUBLE))
          + 0.000000001, 4) AS slope,
        round(regr_intercept(l_extendedprice, CAST(l_quantity AS DOUBLE))
          + 0.000000001, 4) AS intercept,
        round(regr_r2(l_extendedprice, CAST(l_quantity AS DOUBLE))
          + 0.000000001, 6) AS r2,
        round(regr_avgx(l_extendedprice, CAST(l_quantity AS DOUBLE))
          + 0.000000001, 4) AS avg_qty,
        CAST(regr_count(l_extendedprice, CAST(l_quantity AS DOUBLE)) AS BIGINT)
          AS n_pairs
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q49_expectations" -> """
      WITH s AS (
        SELECT count(*) AS n, count(DISTINCT o_orderkey) AS n_keys,
          sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
          sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos_price
        FROM orders),
      r AS (
        SELECT count(*) AS n_orphans FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      SELECT check_name, metric, passed FROM (
        SELECT 'orderkey_unique' AS check_name,
          CAST(n - n_keys AS DOUBLE) AS metric, n = n_keys AS passed
        FROM s
        UNION ALL
        SELECT 'custkey_complete', CAST(null_cust AS DOUBLE), null_cust = 0 FROM s
        UNION ALL
        SELECT 'totalprice_positive', CAST(nonpos_price AS DOUBLE), nonpos_price = 0 FROM s
        UNION ALL
        SELECT 'custkey_in_customer', CAST(n_orphans AS DOUBLE), n_orphans = 0 FROM r)
      ORDER BY check_name""",

    "q24_orders_profile" -> """
      SELECT count(*) AS n_rows,
        count(CASE WHEN o_custkey IS NULL THEN 1 END) AS custkey_nulls,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
        CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
        round(min(o_totalprice), 4) AS price_min,
        round(max(o_totalprice), 4) AS price_max,
        round(avg(o_totalprice), 4) AS price_avg,
        min(CAST(o_orderdate AS DATE)) AS first_order_day,
        max(CAST(o_orderdate AS DATE)) AS last_order_day
      FROM orders""",

    "t7_token_frequencies" -> """
      WITH tk AS (
        SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        FROM documents)
      SELECT token, count(*) AS freq FROM tk
      GROUP BY token ORDER BY freq DESC, token ASC LIMIT 50""",

    "d7_deduped_corpus" -> s"""
      $NearDupClustersCtes
      , roots AS (
        SELECT doc, min(other) AS root FROM reach GROUP BY doc),
      losers AS (SELECT doc FROM roots WHERE doc <> root)
      SELECT doc_id, lang, source, n_chars FROM documents
      WHERE doc_id NOT IN (SELECT doc FROM losers)
      ORDER BY doc_id""",

    "q20_asof_signup" -> """
      WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      s AS (SELECT user_id AS s_user, CAST(ts AS TIMESTAMP) AS signup_ts
            FROM events WHERE event_type = 'signup')
      SELECT event_id, e.user_id, e.ts, s.signup_ts,
        CAST(date_diff('microsecond', s.signup_ts, e.ts) // 1000000 AS BIGINT)
          AS secs_since_signup
      FROM e ASOF LEFT JOIN s ON e.user_id = s.s_user AND e.ts >= s.signup_ts
      ORDER BY event_id""",

    // q45: tolerance-bounded as-of — the most-recent-within-window signup
    // IS max(signup_ts) over (ts - 1h, ts], so the replay is a filtered
    // groupBy-max re-joined to the left side (left outer for unmatched).
    "q45_asof_within" -> """
      WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      s AS (SELECT user_id AS s_user, CAST(ts AS TIMESTAMP) AS signup_ts
            FROM events WHERE event_type = 'signup'),
      m AS (
        SELECT e.event_id, max(s.signup_ts) AS signup_ts
        FROM e JOIN s ON e.user_id = s.s_user
          AND s.signup_ts <= e.ts
          AND date_diff('microsecond', s.signup_ts, e.ts) <= 3600000000
        GROUP BY e.event_id)
      SELECT e.event_id, e.user_id, e.ts, m.signup_ts,
        CAST(date_diff('microsecond', m.signup_ts, e.ts) // 1000000 AS BIGINT)
          AS secs_since_signup
      FROM e LEFT JOIN m USING (event_id) ORDER BY event_id""",

    "q21_json_props" -> """
      WITH k AS (
        SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events)
      SELECT event_type, round(avg(k), 4) AS avg_k,
        CAST(sum(k) AS BIGINT) AS sum_k, count(k) AS n_with_k
      FROM k GROUP BY event_type ORDER BY event_type""",

    "q22_trailing_spend" -> """
      WITH o AS (
        SELECT o_custkey, o_orderkey,
          CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS day_num,
          round(o_totalprice, 2) AS price
        FROM orders)
      SELECT o_custkey, o_orderkey, day_num, price,
        round(sum(price) OVER (PARTITION BY o_custkey ORDER BY day_num
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
      FROM o ORDER BY o_custkey, o_orderkey""",

    // t8: tf·ln(N/df) over whitespace tokens; same +1e-9 rounding nudge.
    "t8_tfidf" -> """
      WITH tk AS (
        SELECT doc_id,
          unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
      sc AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
          tf.tf * ln(n.n_docs / df.df) AS raw
        FROM tf JOIN df USING (term) CROSS JOIN n),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY raw DESC, term ASC) AS rnk
        FROM sc)
      SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
        CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        round(raw + 0.000000001, 4) AS tfidf
      FROM r WHERE rnk <= 5 ORDER BY doc_id, rnk""",

    // t9: Gopher-style repetition metrics — top-trigram share + duplicate
    // physical lines.
    "t9_repetition" -> RepetitionOracleSql,

    // d8: 8-gram overlap of training docs against the doc_id%20=0 "eval"
    // subset.
    "d8_decontaminate" -> """
      WITH tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      idx AS (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i FROM tk
              WHERE len(t) >= 8),
      sh AS (SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
               t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS s
             FROM idx),
      ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
      tr AS (SELECT doc_id, count(*) AS n_ngrams FROM sh WHERE doc_id % 20 <> 0 GROUP BY 1),
      shared AS (
        SELECT sh.doc_id, count(*) AS n_shared
        FROM sh JOIN ev USING (s) WHERE sh.doc_id % 20 <> 0 GROUP BY 1)
      SELECT s.doc_id, CAST(s.n_shared AS BIGINT) AS n_shared,
        round(CAST(s.n_shared AS DOUBLE) / t.n_ngrams + 0.000000001, 4)
          AS contamination_frac
      FROM shared s JOIN tr t USING (doc_id) ORDER BY doc_id""",

    // q29: exact range-join semantics (the Spark side buckets; the oracle
    // states the plain interval predicate).
    "q29_range_join" -> """
      WITH e AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts AS cts FROM e WHERE event_type = 'click'),
      j AS (
        SELECT p.event_id, count(c.cts) AS n
        FROM p LEFT JOIN c ON p.user_id = c.user_id
          AND c.cts >= p.ts - INTERVAL 30 MINUTE AND c.cts < p.ts
        GROUP BY 1)
      SELECT p.event_id, p.user_id, p.ts,
        CAST(coalesce(j.n, 0) AS BIGINT) AS n_recent_clicks
      FROM p JOIN j USING (event_id) ORDER BY event_id""",

    // q30: melt replayed as UNION ALL of the wide columns.
    "q30_unpivot" -> """
      WITH w AS (
        SELECT l_linestatus,
          CAST(round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 2) AS DOUBLE) AS qty_r,
          CAST(round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END), 2) AS DOUBLE) AS qty_a,
          CAST(round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END), 2) AS DOUBLE) AS qty_n
        FROM lineitem GROUP BY 1)
      SELECT l_linestatus, 'R' AS l_returnflag, qty_r AS total_qty FROM w
      UNION ALL SELECT l_linestatus, 'A', qty_a FROM w
      UNION ALL SELECT l_linestatus, 'N', qty_n FROM w
      ORDER BY l_linestatus, l_returnflag""",

    // q31: lexicographic struct max/min ≡ DuckDB struct aggregate.
    "q31_argmax" -> """
      SELECT l_returnflag,
        CAST(max(struct_pack(p := l_extendedprice, k := l_orderkey)).k AS BIGINT)
          AS priciest_orderkey,
        CAST(min(struct_pack(p := l_extendedprice, k := l_orderkey)).k AS BIGINT)
          AS cheapest_orderkey,
        round(max(l_extendedprice), 2) AS max_price,
        round(min(l_extendedprice), 2) AS min_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q32_cube" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS DOUBLE) AS revenue,
        count(*) AS n_items,
        CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        CAST(GROUPING(l_linestatus) AS INT) AS g_status
      FROM lineitem
      GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status, l_returnflag, l_linestatus""",

    "q46_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS DOUBLE) AS revenue,
        count(*) AS n_items,
        CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        CAST(GROUPING(l_linestatus) AS INT) AS g_status
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
        (l_linestatus), ())
      ORDER BY g_flag, g_status, l_returnflag, l_linestatus""",

    // q47: same lead window, same (ts, event_id) tiebreak, same
    // share-of-source rounding nudge as t10.
    "q47_event_transitions" -> """
      WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events),
      n AS (
        SELECT event_type,
          lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS next_type
        FROM e),
      c AS (
        SELECT event_type, next_type, count(*) AS n_transitions
        FROM n WHERE next_type IS NOT NULL GROUP BY 1, 2)
      SELECT event_type, next_type, CAST(n_transitions AS BIGINT) AS n_transitions,
        round(n_transitions / (sum(n_transitions)
          OVER (PARTITION BY event_type)) * 100.0 + 0.000000001, 4) AS pct_of_type
      FROM c ORDER BY event_type, next_type""",

    "d11_incremental_dedup" -> IncrementalDedupSql,
    // d12 is d11's production-shape twin: same contract, corpus side read
    // from the persisted bucketed index — the oracle is identical
    "d12_incremental_dedup_indexed" -> IncrementalDedupSql,

    // d10: document frequency of distinct word 8-grams, replayed over the
    // string shingles (the Spark side hashes them; counts are identical).
    "d10_dup_ngram_frac" -> """
      WITH tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 6, 1))) AS i FROM tk),
      sh AS (SELECT DISTINCT doc_id,
        t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]||' '||t[i+5]||' '||t[i+6]||' '||t[i+7] AS s
        FROM idx),
      dfq AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
      agg AS (
        SELECT sh.doc_id, count(*) AS n_ngrams,
          sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_dup
        FROM sh JOIN dfq USING (s) GROUP BY 1)
      SELECT doc_id, CAST(n_ngrams AS BIGINT) AS n_ngrams,
        CAST(n_dup AS BIGINT) AS n_dup,
        round(n_dup / greatest(n_ngrams, 1) + 0.000000001, 4) AS dup_frac
      FROM agg ORDER BY doc_id""",

    // t14: the sampling decision is the portable hash52 against a
    // rate-derived threshold — the whole query replays exactly.
    "t14_mixture_sample" -> s"""
      WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
      t AS (SELECT sum(n_lang) AS total, count(*) AS n_langs FROM c),
      r AS (SELECT lang, n_lang,
              least(1.0, (CAST(total AS DOUBLE) / n_langs) / n_lang) AS rate
            FROM c CROSS JOIN t),
      k AS (
        SELECT d.lang, r.rate,
          (${graft.functions.TextFunctions.hash52Sql("CAST(doc_id AS VARCHAR)")} % 1000000
            < floor(r.rate * 1000000)) AS keep
        FROM documents d JOIN r ON d.lang = r.lang)
      SELECT lang, count(*) AS n_docs,
        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        round(max(rate) + 0.000000001, 6) AS sample_rate
      FROM k GROUP BY lang ORDER BY lang""",

    // t15: chunk fan-out replays exactly — same tokenizer, same window
    // arithmetic, same portable hash over the space-joined chunk.
    "t15_doc_chunks" -> ("""
      WITH tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents),
      ch AS (
        SELECT doc_id, toks,
          unnest(range(0,
            greatest(CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT), 0) + 1)) AS chunk_idx
        FROM tk),
      sl AS (
        SELECT doc_id, chunk_idx,
          list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32) AS chunk
        FROM ch)
      SELECT doc_id, chunk_idx,
        CAST(len(chunk) AS BIGINT) AS n_tokens,
        """ + graft.functions.TextFunctions.hash52Sql("array_to_string(chunk, ' ')") +
      """ AS chunk_hash
      FROM sl ORDER BY doc_id, chunk_idx"""),

    // t16: the exclusive window cumsum is deterministic under the unique
    // (source, doc_id) order, so bin assignment replays exactly.
    "t16_seq_packing" -> """
      WITH tk AS (
        SELECT source, doc_id,
          len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n_tokens
        FROM documents),
      b AS (
        SELECT source, doc_id, n_tokens,
          CAST(floor(COALESCE(SUM(n_tokens) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT) AS bin
        FROM tk)
      SELECT source, bin, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
        round(sum(n_tokens) / 512.0 + 0.000000001, 4) AS fill_ratio
      FROM b GROUP BY 1, 2 ORDER BY 1, 2""",

    // s4: the 6dp-rounded per-dimension grid pins the quantizer across
    // engines; reconstruction arithmetic mirrors term-for-term.
    "s4_quantize_int8" -> """
      WITH e AS (SELECT vec_id, embedding FROM embeddings),
      u AS (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i, embedding FROM e),
      x AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM u),
      d AS (SELECT i, round(min(x), 6) AS lo, round(max(x), 6) AS hi FROM x GROUP BY 1),
      q AS (
        SELECT vec_id, x.i, x.x,
          CASE WHEN hi = lo THEN lo
               ELSE lo + round((x.x - lo) / (hi - lo) * 255.0, 0) / 255.0 * (hi - lo)
          END AS recon
        FROM x JOIN d ON x.i = d.i),
      a AS (SELECT vec_id, max(abs(x - recon)) AS mx, avg(abs(x - recon)) AS mn
            FROM q GROUP BY 1)
      SELECT vec_id, round(mx + 0.000000001, 6) AS max_abs_err,
        round(mn + 0.000000001, 6) AS mean_abs_err
      FROM a ORDER BY vec_id""",

    // q33: the sample membership predicate is the portable hash52.
    "q33_hash_sample" -> s"""
      SELECT o_orderstatus, count(*) AS n_sampled,
        round(sum(o_totalprice), 2) AS sampled_spend,
        round(avg(o_totalprice), 2) AS avg_price
      FROM orders
      WHERE ${graft.functions.TextFunctions.hash52Sql("CAST(o_orderkey AS VARCHAR)")} % 100 < 5
      GROUP BY 1 ORDER BY 1""",

    // q34: exact anchors + the sketch's rank-error contract as booleans.
    "q34_approx_percentiles" -> """
      SELECT event_type,
        round(quantile_cont(value, 0.5), 4) AS p50_exact,
        round(quantile_cont(value, 0.95), 4) AS p95_exact,
        true AS p50_ok, true AS p95_ok,
        count(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""",

    // st4: session_window semantics — a new session starts when the gap is
    // >= 30 min in exact microseconds (st2's declarative form floors to
    // seconds and uses strict >; the boundary rules differ by design and
    // both are pinned).
    "st4_session_window" -> """
      WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      l AS (
        SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM e),
      n AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                        OR date_diff('microsecond', prev_ts, ts) >= 1800000000
                  THEN 1 ELSE 0 END AS ns FROM l),
      s AS (
        SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS seq FROM n)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM s GROUP BY user_id, seq ORDER BY user_id, session_start""",

    "q35_funnel" -> """
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      fc AS (
        SELECT user_id, min(ts) AS first_click FROM e
        WHERE event_type = 'click' GROUP BY 1),
      p AS (SELECT user_id AS pu, ts AS pts FROM e WHERE event_type = 'purchase'),
      j AS (
        SELECT fc.user_id, fc.first_click, min(p.pts) AS first_purchase_after
        FROM fc LEFT JOIN p ON fc.user_id = p.pu AND p.pts >= fc.first_click
        GROUP BY 1, 2)
      SELECT user_id, first_click, first_purchase_after,
        first_purchase_after IS NOT NULL AS converted,
        CAST(date_diff('microsecond', first_click, first_purchase_after) // 1000000
          AS BIGINT) AS secs_to_convert
      FROM j ORDER BY user_id""",

    // q37: the generated date dim itself — distributed sequence+explode
    // generation vs DuckDB generate_series, row for row.
    "q37_dim_dates" -> s"""
      WITH ${Dims.dimDatesSqlCte}
      SELECT calendar_dt, CAST(year_num AS INT) AS year_num,
        CAST(month_of_the_year_num AS INT) AS month_of_the_year_num,
        CAST(day_of_the_week_num AS INT) AS day_of_the_week_num,
        working_day
      FROM dim_dates ORDER BY calendar_dt""",

    "q44_supplier_revenue" -> """
      WITH a AS (
        SELECT n_name,
          round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS supp_revenue,
          CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY n_name),
      t AS (SELECT sum(supp_revenue) AS total FROM a)
      SELECT n_name, supp_revenue, n_suppliers,
        round(supp_revenue / total * 100.0 + 0.000000001, 4) AS pct_of_total
      FROM a CROSS JOIN t ORDER BY n_name""",

    "q43_latest_per_key" -> """
      WITH r AS (
        SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
          row_number() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, event_type, event_id, ts AS latest_ts,
        round(value, 2) AS latest_value
      FROM r WHERE rn = 1 ORDER BY user_id, event_type""",

    // t11: boundary = the element of rank ⌈q·n⌉ (what Spark's GK summary
    // returns exactly while n ≤ its accuracy), replayed with an explicit
    // row_number; ties bin to the lower bucket on both sides.
    "t11_length_buckets" -> """
      WITH n AS (
        SELECT doc_id,
          CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
            AS BIGINT) AS n_tokens
        FROM documents),
      r AS (
        SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) AS rnk,
          count(*) OVER () AS cnt
        FROM n),
      b AS (
        SELECT
          max(CASE WHEN rnk = CAST(ceil(0.25 * cnt) AS BIGINT) THEN n_tokens END) AS b1,
          max(CASE WHEN rnk = CAST(ceil(0.50 * cnt) AS BIGINT) THEN n_tokens END) AS b2,
          max(CASE WHEN rnk = CAST(ceil(0.75 * cnt) AS BIGINT) THEN n_tokens END) AS b3
        FROM r),
      bk AS (
        SELECT n_tokens,
          CAST(1 + CASE WHEN n_tokens > b1 THEN 1 ELSE 0 END
                 + CASE WHEN n_tokens > b2 THEN 1 ELSE 0 END
                 + CASE WHEN n_tokens > b3 THEN 1 ELSE 0 END AS BIGINT) AS bucket
        FROM n CROSS JOIN b)
      SELECT bucket, count(*) AS n_docs,
        min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
        round(avg(n_tokens), 2) AS avg_tokens
      FROM bk GROUP BY bucket ORDER BY bucket""",

    "q41_native_pivot" -> """
      SELECT l_linestatus,
        CAST(round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS DOUBLE) AS qty_r,
        CAST(round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS DOUBLE) AS qty_a,
        CAST(round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS DOUBLE) AS qty_n
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q42_bag_ops" -> """
      WITH e AS (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
      i AS (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
      g AS (
        SELECT 'except_all' AS op, o_custkey, count(*) AS n FROM e GROUP BY 2
        UNION ALL
        SELECT 'intersect_all' AS op, o_custkey, count(*) AS n FROM i GROUP BY 2)
      SELECT op, o_custkey, CAST(n AS BIGINT) AS n
      FROM g ORDER BY op, o_custkey""",

    // q40: DuckDB ASOF with <= picks the nearest FOLLOWING right row.
    "q40_asof_next" -> """
      WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      s AS (SELECT user_id AS s_user, CAST(ts AS TIMESTAMP) AS signup_ts
            FROM events WHERE event_type = 'signup')
      SELECT event_id, e.user_id, e.ts, s.signup_ts AS next_signup_ts,
        CAST(date_diff('microsecond', e.ts, s.signup_ts) // 1000000 AS BIGINT)
          AS secs_until_signup
      FROM e ASOF LEFT JOIN s ON e.user_id = s.s_user AND e.ts <= s.signup_ts
      ORDER BY event_id""",

    "q38_array_agg" -> """
      WITH g AS (
        SELECT o_custkey, list(o_orderkey ORDER BY o_orderkey) AS keys
        FROM orders WHERE o_custkey % 100 = 0 GROUP BY 1)
      SELECT o_custkey,
        CAST(len(keys) AS BIGINT) AS n_orders,
        keys[1] AS first_key,
        keys[-1] AS last_key,
        array_to_string(keys[1:3], ',') AS first3_csv,
        list_contains(keys, o_custkey) AS has_own_key,
        array_to_string(keys, ',') AS keys_csv
      FROM g ORDER BY o_custkey""",

    "q39_regex_suite" -> """
      SELECT c_custkey,
        regexp_extract(c_name, '([0-9]+)$', 1) AS name_digits,
        regexp_extract(c_name, '^([A-Za-z]+)', 1) AS name_word,
        CAST(len(regexp_extract_all(c_name, '[0-9]')) AS BIGINT) AS n_digits,
        regexp_matches(c_name, '^Customer#[0-9]+$') AS canonical_form,
        regexp_replace(c_name, '(0+)([1-9])', '\2', 'g') AS unpadded
      FROM customer WHERE c_custkey % 10 = 0 ORDER BY c_custkey""",

    "q36_histogram" -> """
      WITH b AS (
        SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket FROM orders),
      g AS (SELECT bucket, count(*) AS n_orders FROM b GROUP BY 1),
      t AS (SELECT count(*) AS total FROM orders)
      SELECT bucket, round(bucket * 50000.0, 2) AS bucket_low, n_orders,
        round(CAST(n_orders AS DOUBLE) / total * 100.0 + 0.000000001, 4)
          AS pct_of_orders
      FROM g CROSS JOIN t ORDER BY bucket""",

    // m3 (real frames since r9): closed-form replay of the strided REAL
    // GIF decode — the m12 pixel contract (phash = 2^52 − 2^(2s)) at
    // m3's own stride and (n_sampled, sum_hash) column surface.
    "m3_frame_samples" -> s"""
      WITH f AS (
        SELECT doc_id,
          CAST(unnest(range(0, 2 + doc_id % 7,
            ${graft.multimodal.Multimodal.FrameSampleStride})) AS BIGINT) AS i
        FROM documents),
      sp AS (
        SELECT doc_id, i,
          1 + (doc_id * 5 + i * 3) % ${graft.multimodal.Multimodal.PixelSplitMod} AS s
        FROM f),
      p AS (
        SELECT doc_id,
          (CAST(1 AS BIGINT) << 52) - (CAST(1 AS BIGINT) << CAST(2 * s AS INT))
            AS phash
        FROM sp)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
        CAST(sum(phash) AS BIGINT) AS sum_hash
      FROM p GROUP BY doc_id ORDER BY doc_id""",

    // d4: per-bit majority over hash52 of tokens — hash52 is reproduced by
    // ('0x' || md5-prefix)::BIGINT, so the full 52-bit signature matches.
    "d4_simhash" -> SimHashOracleSql,

    // d9: banding gives EXACT recall for hamming <= 3 (pigeonhole over 4
    // bands), so the oracle can state the semantics as a brute-force
    // all-pairs hamming filter — equal sets by construction.
    "d9_simhash_pairs" -> s"""
      WITH sig AS ($SimHashOracleSql),
      p AS (
        SELECT a.doc_id AS ia, a.simhash AS sa, b.doc_id AS ib, b.simhash AS sb
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
      SELECT ia AS id_a, ib AS id_b,
        CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
      FROM p WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY id_a, id_b""",

    // q17: HLL estimate has no cross-engine oracle; the *contract* does —
    // the query outputs the exact count plus a 5%-tolerance boolean, the
    // oracle returns the exact count plus literal true.
    "q17_approx_distinct" -> """
      SELECT l_returnflag,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
        true AS approx_within_5pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // q26: bottom-k by the portable hash52 ≡ row_number over the same hash.
    "q26_bottomk_sample" -> s"""
      WITH h AS (
        SELECT o_orderpriority, o_orderkey,
          ${graft.functions.TextFunctions.hash52Sql("CAST(o_orderkey AS VARCHAR)")} AS hk
        FROM orders),
      r AS (
        SELECT o_orderpriority, o_orderkey,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY hk) AS rn
        FROM h)
      SELECT o_orderpriority, CAST(rn AS BIGINT) AS rnk,
        CAST(o_orderkey AS BIGINT) AS sample_key
      FROM r WHERE rn <= 5 ORDER BY o_orderpriority, rnk""",

    // t5: the Rabin–Karp polynomial mod 2^61-1, replayed over the UTF-8
    // bytes (hex(encode(..)) → byte list) with HUGEINT intermediates.
    "t5_rolling_fingerprint" -> s"""
      WITH n AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
        FROM documents),
      hx AS (SELECT doc_id, hex(encode(norm)) AS h FROM n),
      b AS (SELECT doc_id, ${RollingHashBytesSql("h")} AS bytes FROM hx)
      SELECT doc_id, ${RollingHashReduceSql("bytes")} AS fingerprint64
      FROM b ORDER BY doc_id""",

    // m2: the decode stub derives dimensions from the same rolling hash —
    // fully replayable in SQL.
    "m2_format_stats" -> s"""
      WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
      b AS (SELECT doc_id, ${RollingHashBytesSql("h")} AS bytes FROM hx),
      r AS (SELECT doc_id, ${RollingHashReduceSql("bytes")} AS hsh FROM b),
      d AS (SELECT doc_id,
          64 + (hsh % 1024) AS width,
          64 + ((hsh // 1024) % 1024) AS height,
          1 + ((hsh // 1048576) % 16) AS n_frames,
          CASE WHEN hsh % 2 = 0 THEN 'img' ELSE 'vid' END AS format
        FROM r)
      SELECT format, count(*) AS n_media,
        round(avg(width), 2) AS avg_width,
        round(avg(height), 2) AS avg_height,
        CAST(max(n_frames) AS INT) AS max_frames
      FROM d GROUP BY format ORDER BY format""",

    // m4: the typed Welford Aggregator's (n, mean, M2) reduce to plain
    // avg/var_samp — same format derivation as m2.
    "m4_typed_moments" -> s"""
      WITH hx AS (SELECT doc_id, octet_length(encode(text)) AS blen,
          hex(encode(text)) AS h FROM documents),
      b AS (SELECT doc_id, blen, ${RollingHashBytesSql("h")} AS bytes FROM hx),
      r AS (SELECT doc_id, blen, ${RollingHashReduceSql("bytes")} AS hsh FROM b),
      d AS (SELECT doc_id, blen,
          CASE WHEN hsh % 2 = 0 THEN 'img' ELSE 'vid' END AS format
        FROM r)
      SELECT format, count(*) AS n_media,
        round(avg(CAST(blen AS DOUBLE)) + 0.000000001, 4) AS mean_len,
        round(var_samp(CAST(blen AS DOUBLE)) + 0.000000001, 4) AS var_len
      FROM d GROUP BY format ORDER BY format""",

    // s2: identical hyperplane literals → identical buckets → identical
    // candidate sets; scoring mirrors the proven s1 oracle.
    // s2 (r6): bucket bits derive from the corpus count — LshCandCtesSql
    // replays deriveLshBits as a scalar subquery (gate scale: the floor
    // 8, identical to the r5 pinned registration); exact in-candidate
    // cosine ranking as before.
    "s2_ann_lsh_topk" -> ("WITH e AS (SELECT vec_id, embedding FROM embeddings)," +
      LshCandCtesSql + s""",
      j AS (
        SELECT cand.query_id, cand.neighbor_id, eq.embedding AS qe, en.embedding AS ne
        FROM cand
        JOIN e eq ON eq.vec_id = cand.query_id
        JOIN e en ON en.vec_id = cand.neighbor_id),
      u AS (SELECT query_id, neighbor_id, unnest(range(1, len(qe) + 1)) AS i, qe, ne FROM j),
      s AS (
        SELECT query_id, neighbor_id,
          sum(CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
          sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS na,
          sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nb
        FROM u GROUP BY 1, 2),
      c AS (SELECT query_id, neighbor_id, dot / (sqrt(na) * sqrt(nb)) AS cos FROM s),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM c)
      SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, round(cos, 4) AS cos_sim
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""),

    // s3: full IVF replay — 6dp-rounded per-label centroids pin the
    // assignment argmax across engines; candidate scoring mirrors s1.
    "s3_ann_ivf_topk" -> IvfTopKOracleSql,

    // s16: the persisted cell-partitioned index probe — identical
    // output contract to s3 (same quantizer derivation, same assignment
    // argmax, same exact-cosine rerank; the index only changes WHERE the
    // assignment lives), so the oracle is s3's verbatim — the d27/d28
    // same-oracle precedent applied to ANN.
    "s16_ivf_indexed" -> IvfTopKOracleSql,

    // s17: the IVF drift audit — candidate volume when every vector is
    // assigned (and every query probes) under the build-half-frozen
    // quantizer vs s3's fresh quantizer; the threshold interpolates the
    // Scala constant so operator and twin cannot desync.
    "s17_ivf_drift" -> ("WITH e AS (SELECT vec_id, embedding FROM embeddings)," +
      IvfAssignCtesUnder("", "TRUE") + "," +
      IvfAssignCtesUnder("f", "vec_id % 2 = 0") + s""",
      prb AS (
        SELECT query_id, cent_id FROM (
          SELECT vec_id AS query_id, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS r
          FROM ac WHERE vec_id % 50 = 0) WHERE r <= ${graft.operators.Similarity.IvfNProbe}),
      fprb AS (
        SELECT query_id, cent_id FROM (
          SELECT vec_id AS query_id, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS r
          FROM fac WHERE vec_id % 50 = 0) WHERE r <= ${graft.operators.Similarity.IvfNProbe}),
      vol AS (
        SELECT count(*) AS fresh_candidate_rows
        FROM prb p JOIN assigned a ON p.cent_id = a.cent_id
        WHERE a.vec_id <> p.query_id),
      fvol AS (
        SELECT count(*) AS frozen_candidate_rows
        FROM fprb p JOIN fassigned a ON p.cent_id = a.cent_id
        WHERE a.vec_id <> p.query_id),
      rep AS (
        SELECT CAST(frozen_candidate_rows AS BIGINT) AS frozen_candidate_rows,
          CAST(fresh_candidate_rows AS BIGINT) AS fresh_candidate_rows,
          CASE WHEN fresh_candidate_rows = 0 AND frozen_candidate_rows = 0
                 THEN CAST(1.0 AS DOUBLE)
               WHEN fresh_candidate_rows = 0
                 THEN round(greatest(
                   CAST(${graft.operators.Similarity.IvfDriftRebuildRatio}
                     AS DOUBLE),
                   CAST(frozen_candidate_rows AS DOUBLE)), 4)
               ELSE round(CAST(frozen_candidate_rows AS DOUBLE)
                 / CAST(fresh_candidate_rows AS DOUBLE), 4) END AS drift_ratio
        FROM fvol, vol)
      SELECT frozen_candidate_rows, fresh_candidate_rows, drift_ratio,
        CAST(CASE WHEN drift_ratio >=
          ${graft.operators.Similarity.IvfDriftRebuildRatio} THEN 1 ELSE 0 END
          AS BIGINT) AS rebuild_recommended
      FROM rep"""),

    // t18: identical distributive decomposition H = log2(n) − (Σ c·log2 c)/n,
    // so only the two group-bys (term counts, per-doc rollup) replay.
    "t18_token_entropy" -> """
      WITH tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      tf AS (SELECT doc_id, unnest(t) AS tok FROM tk),
      c AS (SELECT doc_id, tok, count(*) AS c FROM tf GROUP BY 1, 2),
      a AS (SELECT doc_id, sum(c) AS n, count(*) AS nd, sum(c * log2(c)) AS sl
            FROM c GROUP BY 1)
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(nd AS BIGINT) AS n_distinct,
        round(log2(n) - sl / n + 0.000000001, 4) AS entropy,
        round(CASE WHEN nd > 1 THEN (log2(n) - sl / n) / log2(nd) ELSE 1.0 END
          + 0.000000001, 4) AS evenness
      FROM a ORDER BY doc_id""",

    // t19: t15's chunk CTE at stride = chunkSize, then the keep-first
    // owner join — min(doc_id) per chunk hash is order-free, so the
    // replay is exact.
    "t19_passage_dedup" -> ("""
      WITH tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents),
      ch AS (
        SELECT doc_id, toks,
          unnest(range(0,
            greatest(CAST(ceil((len(toks) - 32) / 32.0) AS BIGINT), 0) + 1)) AS chunk_idx
        FROM tk),
      sl AS (
        SELECT doc_id, chunk_idx,
          list_slice(toks, chunk_idx * 32 + 1, chunk_idx * 32 + 32) AS chunk
        FROM ch),
      h AS (
        SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_tokens,
          """ + graft.functions.TextFunctions.hash52Sql("array_to_string(chunk, ' ')") +
      """ AS chunk_hash
        FROM sl),
      o AS (SELECT chunk_hash, min(doc_id) AS owner_doc FROM h GROUP BY 1),
      j AS (SELECT h.*, o.owner_doc FROM h JOIN o USING (chunk_hash))
      SELECT doc_id,
        CAST(count(*) AS BIGINT) AS n_chunks,
        CAST(sum(CASE WHEN owner_doc < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        CAST(sum(CASE WHEN owner_doc < doc_id THEN 0 ELSE n_tokens END) AS BIGINT) AS kept_tokens,
        round(sum(CASE WHEN owner_doc < doc_id THEN 1 ELSE 0 END) / count(*)
          + 0.000000001, 4) AS dup_frac
      FROM j GROUP BY 1 ORDER BY doc_id"""),

    // s5 (r6): candidate-driven — s3's IVF probe CTEs produce the
    // candidate set (IvfAssignAutoCtesSql + prb/cand replay the registered
    // s3's auto-sized cells and probes verbatim), the s4 reconstruction
    // grid feeds the 6dp-rounded coarse ranking over candidates only, and
    // the float vectors feed the exact rerank.
    "s5_two_stage_ann" -> (IvfAssignAutoCtesSql + s""",
      prb AS (
        SELECT query_id, cent_id FROM (
          SELECT vec_id AS query_id, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS r
          FROM ac WHERE vec_id % 50 = 0) WHERE r <= ${graft.operators.Similarity.IvfNProbe}),
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM prb p JOIN assigned a ON p.cent_id = a.cent_id
        WHERE a.vec_id <> p.query_id),
      u AS (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i, embedding FROM e),
      x AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM u),
      d AS (SELECT i, round(min(x), 6) AS lo, round(max(x), 6) AS hi FROM x GROUP BY 1),
      rc AS (
        SELECT vec_id, x.i,
          CASE WHEN hi = lo THEN lo
               ELSE lo + round((x.x - lo) / (hi - lo) * 255.0, 0) / 255.0 * (hi - lo)
          END AS recon
        FROM x JOIN d ON x.i = d.i),
      cs AS (
        SELECT cand.query_id, cand.neighbor_id,
          sum(a.recon * b.recon) AS dot,
          sum(a.recon * a.recon) AS na,
          sum(b.recon * b.recon) AS nb
        FROM cand
        JOIN rc a ON a.vec_id = cand.query_id
        JOIN rc b ON b.vec_id = cand.neighbor_id AND a.i = b.i
        GROUP BY 1, 2),
      co AS (SELECT query_id, neighbor_id,
               round(dot / (sqrt(na) * sqrt(nb)), 6) AS coarse FROM cs),
      short AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY coarse DESC, neighbor_id) AS crnk
          FROM co)
        WHERE crnk <= ${graft.operators.Similarity.RerankShortlist}),
      pairs AS (
        SELECT short.query_id, short.neighbor_id, eq.embedding AS qe, en.embedding AS ne
        FROM short
        JOIN e eq ON eq.vec_id = short.query_id
        JOIN e en ON en.vec_id = short.neighbor_id),
      pu AS (SELECT query_id, neighbor_id, unnest(range(1, len(qe) + 1)) AS i, qe, ne
             FROM pairs),
      ps AS (
        SELECT query_id, neighbor_id,
          sum(CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
          sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS na,
          sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nb
        FROM pu GROUP BY 1, 2),
      pc AS (SELECT query_id, neighbor_id, dot / (sqrt(na) * sqrt(nb)) AS cos FROM ps),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM pc)
      SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, round(cos, 4) AS cos_sim
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""),

    // d15: string shingles replay the xxhash64 ones — distinct-per-source
    // counts are hash-blind (collision odds ~|shingles|²/2⁶⁴, the d2/d8
    // bound), so the overlap matrix is identical.
    "d15_source_overlap" -> """
      WITH tk AS (
        SELECT source,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents),
      g AS (SELECT source, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i, toks
            FROM tk),
      shi AS (SELECT DISTINCT source, array_to_string(list_slice(toks, i, i + 7), ' ') AS s
              FROM g),
      tot AS (SELECT source, count(*) AS tot FROM shi GROUP BY 1),
      pairs AS (
        SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared_ngrams
        FROM shi a JOIN shi b ON a.s = b.s AND a.source < b.source
        GROUP BY 1, 2)
      SELECT source_a, source_b, CAST(n_shared_ngrams AS BIGINT) AS n_shared_ngrams,
        round(n_shared_ngrams / (ta.tot + tb.tot - n_shared_ngrams) + 0.000000001, 4)
          AS jaccard
      FROM pairs
      JOIN tot ta ON ta.source = pairs.source_a
      JOIN tot tb ON tb.source = pairs.source_b
      ORDER BY source_a, source_b""",

    // d16: the split hash is the portable 52-bit md5 prefix, replayed
    // verbatim; leakage counts distinct shared 8-grams (string-based, like
    // d8's oracle).
    "d16_split_leakage" -> ("""
      WITH tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks,
          CASE WHEN """ +
      graft.functions.TextFunctions.hash52Sql("'split:' || CAST(doc_id AS VARCHAR)") +
      """ % 10 = 0 THEN 'test' ELSE 'train' END AS split
        FROM documents),
      g AS (SELECT doc_id, split, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i,
              toks FROM tk),
      shi AS (SELECT DISTINCT doc_id, split,
                array_to_string(list_slice(toks, i, i + 7), ' ') AS s FROM g),
      te AS (SELECT DISTINCT s FROM shi WHERE split = 'test'),
      tr AS (SELECT doc_id, count(*) AS n_shared
             FROM shi JOIN te USING (s) WHERE split = 'train' GROUP BY 1)
      SELECT tk.doc_id, tk.split,
        CAST(coalesce(tr.n_shared, 0) AS BIGINT) AS n_shared,
        (tk.split = 'test' OR coalesce(tr.n_shared, 0) = 0) AS kept
      FROM tk LEFT JOIN tr ON tk.doc_id = tr.doc_id
      ORDER BY tk.doc_id"""),

    // t20: the bigram LM replays exactly — integer counts, one smoothing
    // formula, log2/power over identical double quotients (the t8/t18
    // cross-engine libm regime, pinned by the 1e-9 nudge + rounding).
    "t20_lm_perplexity" -> s"""
      WITH $LmNllCtesSql
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        round(avg(nll) + 0.000000001, 4) AS avg_nll_bits,
        round(power(2, avg(nll)) + 0.000000001, 2) AS ppl
      FROM sc GROUP BY 1 ORDER BY doc_id""",

    // t24: per-source perplexity terciles — t20's per-doc ppl (shared CTE
    // body, so the model spelling stays in lockstep), then t11's explicit
    // rank-⌈q·n⌉ boundary replay PER SOURCE and the two-comparison cut.
    "t24_ccnet_cut" -> s"""
      WITH $LmNllCtesSql,
      doc AS (
        SELECT doc_id, round(power(2, avg(nll)) + 0.000000001, 2) AS ppl
        FROM sc GROUP BY 1),
      ps AS (
        SELECT d.doc_id, documents.source, d.ppl
        FROM doc d JOIN documents USING (doc_id)),
      r AS (
        SELECT source, ppl,
          row_number() OVER (PARTITION BY source ORDER BY ppl) AS rnk,
          count(*) OVER (PARTITION BY source) AS cnt
        FROM ps),
      b AS (
        SELECT source,
          max(CASE WHEN rnk = CAST(ceil((1.0 / 3) * cnt) AS BIGINT) THEN ppl END) AS b1,
          max(CASE WHEN rnk = CAST(ceil((2.0 / 3) * cnt) AS BIGINT) THEN ppl END) AS b2
        FROM r GROUP BY source),
      ct AS (
        SELECT ps.doc_id, ps.source, ps.ppl,
          1 + CASE WHEN ps.ppl > b.b1 THEN 1 ELSE 0 END
            + CASE WHEN ps.ppl > b.b2 THEN 1 ELSE 0 END AS c
        FROM ps JOIN b ON ps.source = b.source)
      SELECT doc_id, source, ppl,
        CASE c WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS cut
      FROM ct ORDER BY doc_id""",

    // t23: the hashed-bigram bucket ids replay through the portable hash52,
    // both bucket models are exact integer-count ratios, and the per-doc
    // log-ratio sum carries t20's 1e-9 nudge before the round.
    "t23_dsir_weights" -> s"""
      WITH tk AS (
        SELECT doc_id, source,
          string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
        FROM documents),
      bi AS (
        SELECT doc_id, source, toks[i] || ' ' || toks[i + 1] AS bigram
        FROM (SELECT doc_id, source, toks, unnest(range(1, len(toks))) AS i FROM tk)),
      db AS (
        SELECT doc_id, source,
          ${graft.functions.TextFunctions.hash52Sql("bigram")} % 1024 AS b,
          count(*) AS n
        FROM bi GROUP BY 1, 2, 3),
      model AS (
        SELECT b,
          sum(CASE WHEN source = 'src1' THEN n ELSE 0 END) AS nt,
          sum(CASE WHEN source <> 'src1' THEN n ELSE 0 END) AS nr
        FROM db GROUP BY 1),
      tot AS (SELECT CAST(sum(nt) AS DOUBLE) AS tt,
                     CAST(sum(nr) AS DOUBLE) AS tr FROM model),
      sc AS (
        SELECT doc_id, n,
          n * (ln((nt + 0.5) / (tt + 512.0)) - ln((nr + 0.5) / (tr + 512.0))) AS lr
        FROM db JOIN model USING (b) CROSS JOIN tot
        WHERE source <> 'src1')
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        round(sum(lr) + 0.000000001, 4) AS log_weight
      FROM sc GROUP BY 1 ORDER BY doc_id""",

    // t25: every rule is a scalar over the same normalized token list the
    // t18/t23 oracles use; `passes` compares the ROUNDED ratios on both
    // sides so 4dp pins the rule boundaries across engines.
    "t25_gopher_rules" -> """
      WITH nm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        FROM documents),
      tk AS (SELECT doc_id, norm, string_split(norm, ' ') AS t FROM nm),
      m AS (
        SELECT doc_id,
          len(t) AS nw,
          greatest(len(t), 1) AS n,
          len(replace(norm, ' ', '')) AS totlen,
          len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
          len(list_intersect(list_distinct(t),
            ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS n_stop,
          len(regexp_extract_all(norm, '#'))
            + len(regexp_extract_all(norm, '\.\.\.')) AS n_sym
        FROM tk),
      r AS (
        SELECT doc_id,
          CAST(nw AS BIGINT) AS n_words,
          round(CAST(totlen AS DOUBLE) / n + 0.000000001, 4) AS mean_word_len,
          round(CAST(n_alpha AS DOUBLE) / n + 0.000000001, 4) AS frac_alpha,
          round(CAST(n_sym AS DOUBLE) / n + 0.000000001, 4) AS symbol_ratio,
          CAST(n_stop AS BIGINT) AS n_stop_kinds
        FROM m)
      SELECT doc_id, n_words, mean_word_len, frac_alpha, symbol_ratio, n_stop_kinds,
        (n_words BETWEEN 50 AND 100000) AS rule_words,
        (mean_word_len BETWEEN 3.0 AND 10.0) AS rule_word_len,
        (symbol_ratio < 0.1) AS rule_symbols,
        (frac_alpha >= 0.8) AS rule_alpha,
        (n_stop_kinds >= 2) AS rule_stops,
        (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
          AND (symbol_ratio < 0.1) AND (frac_alpha >= 0.8)
          AND (n_stop_kinds >= 2) AS passes
      FROM r ORDER BY doc_id""",

    // t26: the Misra-Gries guarantee makes the sketch's candidate set
    // sufficient for count >= ceil(n/k) and the exact verify pass removes
    // its false positives, so the deterministic output replays as a plain
    // grouped-count threshold; ceil is exact integer arithmetic. k is
    // interpolated from the Scala default so operator and oracle cannot
    // desync (ADVICE r6).
    "t26_heavy_hitters" -> s"""
      WITH tk AS (
        SELECT unnest(string_split(
          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS token
        FROM documents),
      tot AS (SELECT count(*) AS n FROM tk),
      c AS (SELECT token, count(*) AS cnt FROM tk GROUP BY 1)
      SELECT token, CAST(cnt AS BIGINT) AS cnt,
        round(CAST(cnt AS DOUBLE) / n + 0.000000001, 4) AS freq
      FROM c CROSS JOIN tot
      WHERE cnt >= (n + ${graft.operators.TextAnalysis.HeavyHittersK - 1})
                   // ${graft.operators.TextAnalysis.HeavyHittersK}
      ORDER BY cnt DESC, token""",

    // s9: s2's candidate + cosine CTEs verbatim, then the radius filter
    // on the 4dp-ROUNDED cosine (both engines — the boundary pin) with
    // the radius interpolated from the Scala default (ADVICE r6) — no
    // window, no top-k.
    "s9_radius_search" -> ("WITH e AS (SELECT vec_id, embedding FROM embeddings)," +
      LshCandCtesSql + s""",
      j AS (
        SELECT cand.query_id, cand.neighbor_id, eq.embedding AS qe, en.embedding AS ne
        FROM cand
        JOIN e eq ON eq.vec_id = cand.query_id
        JOIN e en ON en.vec_id = cand.neighbor_id),
      u AS (SELECT query_id, neighbor_id, unnest(range(1, len(qe) + 1)) AS i, qe, ne FROM j),
      s AS (
        SELECT query_id, neighbor_id,
          sum(CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
          sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS na,
          sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nb
        FROM u GROUP BY 1, 2),
      c AS (SELECT query_id, neighbor_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim
            FROM s)
      SELECT query_id, neighbor_id, cos_sim
      FROM c WHERE cos_sim >= ${graft.operators.Similarity.RadiusDefault}
      ORDER BY query_id, neighbor_id"""),

    // q50: the (user, day) distinct makes the rollup's count(*) the
    // distinct-user count; retention joins back the offset-0 row.
    "q50_cohort_retention" -> """
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      f AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY 1),
      a AS (SELECT DISTINCT user_id, d FROM e),
      g AS (
        SELECT cohort_day, date_diff('day', cohort_day, d) AS day_offset,
          count(*) AS n_users
        FROM a JOIN f USING (user_id) GROUP BY 1, 2),
      c AS (SELECT cohort_day, n_users AS cohort_n FROM g WHERE day_offset = 0)
      SELECT g.cohort_day, CAST(g.day_offset AS BIGINT) AS day_offset,
        CAST(g.n_users AS BIGINT) AS n_users,
        round(CAST(g.n_users AS DOUBLE) / cohort_n + 0.000000001, 4) AS retention
      FROM g JOIN c USING (cohort_day) ORDER BY 1, 2""",

    // s8: s2's candidate + cosine CTEs verbatim, then the label-cap window
    // (lr <= 2 per neighbor label) before the global top-k window.
    "s8_diversified_topk" -> ("WITH e AS (SELECT vec_id, embedding FROM embeddings)," +
      LshCandCtesSql + s""",
      j AS (
        SELECT cand.query_id, cand.neighbor_id, eq.embedding AS qe, en.embedding AS ne
        FROM cand
        JOIN e eq ON eq.vec_id = cand.query_id
        JOIN e en ON en.vec_id = cand.neighbor_id),
      u AS (SELECT query_id, neighbor_id, unnest(range(1, len(qe) + 1)) AS i, qe, ne FROM j),
      s AS (
        SELECT query_id, neighbor_id,
          sum(CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
          sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS na,
          sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nb
        FROM u GROUP BY 1, 2),
      c AS (SELECT query_id, neighbor_id, dot / (sqrt(na) * sqrt(nb)) AS cos FROM s),
      lab AS (
        SELECT c.query_id, c.neighbor_id, el.label, c.cos,
          row_number() OVER (PARTITION BY c.query_id, el.label
                             ORDER BY c.cos DESC, c.neighbor_id) AS lr
        FROM c JOIN embeddings el ON el.vec_id = c.neighbor_id),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM lab WHERE lr <= 2)
      SELECT query_id, neighbor_id, label, CAST(rnk AS BIGINT) AS rnk, round(cos, 4) AS cos_sim
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""),

    // d19: the shared shingle CTEs emit both raw metrics per candidate
    // pair; classification and the class rollup replay directly.
    "d19_dedup_audit" -> (ShingleCtesSql + """,
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      m AS (
        SELECT id_a, id_b,
          CAST(shared AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE) AS containment,
          CAST(shared AS DOUBLE) / CAST(ca.n + cb.n - shared AS DOUBLE) AS jaccard
        FROM pairs
        JOIN cnt ca ON id_a = ca.doc_id
        JOIN cnt cb ON id_b = cb.doc_id),
      f AS (
        SELECT CASE WHEN jaccard >= 0.8 THEN 'both' ELSE 'containment_only' END AS relation,
          jaccard, containment
        FROM m WHERE containment >= 0.8)
      SELECT relation, CAST(count(*) AS BIGINT) AS n_pairs,
        round(avg(jaccard) + 0.000000001, 4) AS avg_jaccard,
        round(avg(containment) + 0.000000001, 4) AS avg_containment
      FROM f GROUP BY 1 ORDER BY 1"""),

    // m5: the 52-bit block-mean aHash replays exactly — the bit test is an
    // integer cross-multiplication (sum_j*L > total*len_j), so no float
    // division can round differently between engines.
    "m5_perceptual_hash" -> s"""
      WITH $PhashCteBody
      SELECT doc_id, CAST(L AS BIGINT) AS byte_len, phash
      FROM bits ORDER BY doc_id""",

    // m6: exact hamming pairs at radius 7 (the banded multi-index retrieval
    // is exact by pigeonhole, so the O(n²) oracle join is semantically
    // identical), then d6's recursive reachability CC.
    "m6_media_dedup_clusters" -> s"""
      WITH RECURSIVE $PhashCteBody,
      jp AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bits a JOIN bits b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 7),
      e AS (SELECT id_a AS src, id_b AS dst FROM jp
            UNION SELECT id_b, id_a FROM jp),
      nodes AS (SELECT DISTINCT src AS doc FROM e),
      reach(doc, other) AS (
        SELECT doc, doc FROM nodes
        UNION
        SELECT r.doc, e.dst FROM reach r JOIN e ON r.other = e.src)
      SELECT doc AS doc_id, min(other) AS cluster_root
      FROM reach GROUP BY doc ORDER BY doc_id""",

    // m16: the 8-chunk radius-7 band layout replayed from the m5 phash
    // oracle (at gate scale the derived extra width is 0 — pinned by d26
    // and the Round10Spec coupling test); chunk j spans bits
    // ⌊52j/8⌋..⌊52(j+1)/8⌋, Σ C(s,2) in integer division
    "m16_media_band_occupancy" -> s"""
      WITH $PhashCteBody,
      bd AS (SELECT unnest(range(0, 8)) AS band),
      bands AS (
        SELECT b.doc_id, bd.band,
          (b.phash >> CAST((bd.band * 52) // 8 AS INT)) &
            ((1::BIGINT << CAST(((bd.band + 1) * 52) // 8
                                - (bd.band * 52) // 8 AS INT)) - 1) AS bkey
        FROM bits b CROSS JOIN bd),
      occ AS (SELECT band, bkey, count(*) AS c FROM bands GROUP BY 1, 2)
      SELECT CAST(band AS BIGINT) AS band,
        CAST(count(*) AS BIGINT) AS n_buckets,
        CAST(max(c) AS BIGINT) AS max_occupancy,
        CAST(sum(c * (c - 1) // 2) AS BIGINT) AS collision_rows
      FROM occ GROUP BY 1 ORDER BY 1""",

    // m18: banded multi-index retrieval at radius 7 is exact by pigeonhole,
    // so the oracle is the plain all-ordered-pairs cross join at the
    // replayed 52-bit aHash — the gate-scale frozen width is 0 (the d26
    // coupling pin), the same contract under which m6 gets its 52-bit
    // oracle; wider corpora verify over the combined signature, m6's own
    // width semantic.
    "m18_media_indexed" -> s"""
      WITH $PhashCteBody
      SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
        CAST(bit_count(xor(b.phash, c.phash)) AS BIGINT) AS hamming
      FROM bits b JOIN bits c
        ON b.doc_id <> c.doc_id
       AND bit_count(xor(b.phash, c.phash)) <= 7
      ORDER BY batch_id, corpus_id""",

    // m19: at gate scale the build half and the full corpus both derive
    // extra = 0 (the d26 coupling pin m6 rides), so ONE replayed m16-style
    // Σ C(s,2) volume feeds both policy columns — the ratio formula, its
    // empty-corpus floor, and the interpolated threshold still replay.
    "m19_media_drift" -> s"""
      WITH $PhashCteBody,
      bd AS (SELECT unnest(range(0, 8)) AS band),
      bands AS (
        SELECT b.doc_id, bd.band,
          (b.phash >> CAST((bd.band * 52) // 8 AS INT)) &
            ((1::BIGINT << CAST(((bd.band + 1) * 52) // 8
                                - (bd.band * 52) // 8 AS INT)) - 1) AS bkey
        FROM bits b CROSS JOIN bd),
      occ AS (SELECT band, bkey, count(*) AS c FROM bands GROUP BY 1, 2),
      vol AS (SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) AS v
              FROM occ),
      rep AS (
        SELECT frozen_collision_rows, fresh_collision_rows,
          CASE WHEN fresh_collision_rows = 0 AND frozen_collision_rows = 0
                 THEN CAST(1.0 AS DOUBLE)
               WHEN fresh_collision_rows = 0
                 THEN round(greatest(
                   CAST(${graft.multimodal.Multimodal.MediaDriftRebuildRatio}
                     AS DOUBLE),
                   CAST(frozen_collision_rows AS DOUBLE)), 4)
               ELSE round(CAST(frozen_collision_rows AS DOUBLE) /
                          CAST(fresh_collision_rows AS DOUBLE), 4)
          END AS drift_ratio
        FROM (SELECT v AS frozen_collision_rows, v AS fresh_collision_rows
              FROM vol))
      SELECT frozen_collision_rows, fresh_collision_rows, drift_ratio,
        CAST(CASE WHEN drift_ratio >=
          ${graft.multimodal.Multimodal.MediaDriftRebuildRatio} THEN 1 ELSE 0
          END AS BIGINT) AS rebuild_recommended
      FROM rep""",

    // m20: the incremental batch-vs-corpus probe with planted cross-split
    // twins — corpus = even half (the indexed side), batch = odd half
    // UNION the even half re-keyed past the plant offset (each re-keyed
    // doc retrieves its original at hamming 0, so the gate frame is
    // non-empty with probe/corpus id sets disjoint). Banded retrieval at
    // radius 7 is exact by pigeonhole and the frozen width is 0 at gate
    // scales (the d26 coupling pin), so the twin is the plain 52-bit
    // batch×corpus cross join — m18's oracle contract on disjoint sides.
    "m20_media_incremental" -> s"""
      WITH $PhashCteBody,
      corpus AS (SELECT doc_id, phash FROM bits WHERE doc_id % 2 = 0),
      batch AS (
        SELECT doc_id, phash FROM bits WHERE doc_id % 2 <> 0
        UNION ALL
        SELECT doc_id + ${graft.multimodal.Multimodal.MediaPlantOffset},
          phash
        FROM bits WHERE doc_id % 2 = 0)
      SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
        CAST(bit_count(xor(b.phash, c.phash)) AS BIGINT) AS hamming
      FROM batch b JOIN corpus c
        ON b.doc_id <> c.doc_id
       AND bit_count(xor(b.phash, c.phash)) <= 7
      ORDER BY batch_id, corpus_id""",

    // t21: the DuckDB twin ranks with a plain global window (oracle-side
    // single partitions are fine); ranks are identical to the broadcast-
    // offset spelling, and regr_* replays the plain-sums OLS.
    "t21_zipf_fit" -> """
      WITH tk AS (
        SELECT unnest(string_split(
          regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        FROM documents),
      tf AS (SELECT token, count(*) AS freq FROM tk GROUP BY 1),
      rk AS (
        SELECT freq,
          row_number() OVER (ORDER BY freq DESC, token ASC) AS rnk
        FROM tf),
      xy AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y,
               freq FROM rk)
      SELECT CAST(count(*) AS BIGINT) AS n_vocab,
        CAST(sum(freq) AS BIGINT) AS n_tokens,
        round(regr_slope(y, x) + 0.000000001, 4) AS zipf_slope,
        round(regr_intercept(y, x) + 0.000000001, 4) AS intercept,
        round(regr_r2(y, x) + 0.000000001, 4) AS r2
      FROM xy""",

    // t22: t11's rank-ceil replay of the percentile_approx decile
    // boundaries over the distinct doc ids, then the first-decile-per-token
    // cumulative counts.
    "t22_vocab_growth" -> {
      val bDefs = (1 to 9).map(i =>
        s"max(CASE WHEN rnk = CAST(ceil(0.$i * cnt) AS BIGINT) THEN doc_id END) AS b$i")
        .mkString(", ")
      val bucketExpr = (1 to 9)
        .map(i => s"CASE WHEN doc_id > b$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""
      WITH tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
        FROM documents),
      r AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rnk,
          count(*) OVER () AS cnt
        FROM (SELECT DISTINCT doc_id FROM documents)),
      b AS (SELECT $bDefs FROM r),
      fb AS (
        SELECT token, min(bucket) AS first_bucket FROM (
          SELECT ($bucketExpr) AS bucket, unnest(toks) AS token
          FROM tk CROSS JOIN b)
        GROUP BY 1),
      d AS (SELECT unnest(range(0, 10)) AS decile)
      SELECT CAST(d.decile AS BIGINT) AS decile,
        CAST(coalesce(sum(CASE WHEN fb.first_bucket = d.decile THEN 1 END), 0)
          AS BIGINT) AS new_tokens,
        CAST(coalesce(sum(CASE WHEN fb.first_bucket <= d.decile THEN 1 END), 0)
          AS BIGINT) AS vocab_size
      FROM d CROSS JOIN fb GROUP BY 1 ORDER BY 1"""
    },

    // s7: s2's candidate CTEs (the shared dynamic-bucket LshCandCtesSql,
    // identical hyperplane literals and deriveLshBits sizing) + s5's int8
    // recon feeding the 6dp coarse rank over candidates only + the exact
    // rerank replay.
    "s7_lsh_rerank" -> {
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),""" +
      LshCandCtesSql + s""",
      u AS (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i, embedding FROM e),
      x AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM u),
      dm AS (SELECT i, round(min(x), 6) AS lo, round(max(x), 6) AS hi FROM x GROUP BY 1),
      rc AS (
        SELECT vec_id, x.i,
          CASE WHEN hi = lo THEN lo
               ELSE lo + round((x.x - lo) / (hi - lo) * 255.0, 0) / 255.0 * (hi - lo)
          END AS recon
        FROM x JOIN dm ON x.i = dm.i),
      cs AS (
        SELECT cand.query_id, cand.neighbor_id,
          sum(a.recon * b.recon) AS dot,
          sum(a.recon * a.recon) AS na,
          sum(b.recon * b.recon) AS nb
        FROM cand
        JOIN rc a ON a.vec_id = cand.query_id
        JOIN rc b ON b.vec_id = cand.neighbor_id AND a.i = b.i
        GROUP BY 1, 2),
      co AS (SELECT query_id, neighbor_id,
               round(dot / (sqrt(na) * sqrt(nb)), 6) AS coarse FROM cs),
      short AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY coarse DESC, neighbor_id) AS crnk
          FROM co)
        WHERE crnk <= ${graft.operators.Similarity.RerankShortlist}),
      pairs AS (
        SELECT short.query_id, short.neighbor_id, eq.embedding AS qe, en.embedding AS ne
        FROM short
        JOIN e eq ON eq.vec_id = short.query_id
        JOIN e en ON en.vec_id = short.neighbor_id),
      pu AS (SELECT query_id, neighbor_id, unnest(range(1, len(qe) + 1)) AS i, qe, ne
             FROM pairs),
      ps AS (
        SELECT query_id, neighbor_id,
          sum(CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
          sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS na,
          sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nb
        FROM pu GROUP BY 1, 2),
      pc AS (SELECT query_id, neighbor_id, dot / (sqrt(na) * sqrt(nb)) AS cos FROM ps),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM pc)
      SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, round(cos, 4) AS cos_sim
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""
    },

    // s6 (r6): candidate-driven PQ — s2's LSH candidate CTEs (identical
    // hyperplane literals to s7) bound the coarse stage; the PQ replay is
    // unchanged: sign-bit-seeded per-subspace codebooks with 6dp-rounded
    // means, argmin-L2 assignment on 6dp-rounded distances (row_number
    // ORDER BY d2, bkt replays the max-of-negated-struct), codebook
    // reconstruction, then the coarse/rerank tail over candidates only.
    // s6 and s18 share one oracle: the persisted-index probe is the
    // SAME query with the codebook learn + corpus encode amortized into
    // the index build (the d27/d28/s16 same-oracle precedent).
    "s6_pq_ann" -> PqAnnOracleSql,
    "s18_pq_indexed" -> PqAnnOracleSql,

    // s22: the IVF-PQ composition — the s17 cell/probe CTEs (full-corpus
    // build) supply cand(query_id, neighbor_id), the shared PQ tail does
    // coarse + rerank; the twin therefore replays candidate geometry,
    // codebook, ADC shortlist, and exact top-k end-to-end.
    "s22_ivfpq_ann" -> ("WITH e AS (SELECT vec_id, embedding FROM embeddings)," +
      IvfAssignCtesUnder("", "TRUE") + s""",
      prb AS (
        SELECT query_id, cent_id FROM (
          SELECT vec_id AS query_id, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS r
          FROM ac WHERE vec_id % 50 = 0) WHERE r <= ${graft.operators.Similarity.IvfNProbe}),
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM prb p JOIN assigned a ON p.cent_id = a.cent_id
        WHERE a.vec_id <> p.query_id),""" + PqCoarseRerankTailSql),

    // s19: the PQ distortion drift policy — frozen (label < 5 build)
    // vs fresh codebook, both priced on the full corpus in exact
    // integer micro-units (see PqDistortionCtes).
    "s19_pq_drift" -> ("WITH " + PqSubvectorCteSql + "," +
      PqDistortionCtes("f", "label < 5") + "," +
      PqDistortionCtes("g", "TRUE") + s""",
      rep AS (
        SELECT ftot.du AS frozen_distortion_u6, gtot.du AS fresh_distortion_u6,
          CASE WHEN gtot.du = 0 AND ftot.du = 0 THEN CAST(1.0 AS DOUBLE)
               WHEN gtot.du = 0
                 THEN round(greatest(
                   CAST(${graft.operators.Similarity.PqDriftRebuildRatio}
                     AS DOUBLE),
                   CAST(ftot.du AS DOUBLE)), 4)
               ELSE round(CAST(ftot.du AS DOUBLE) / CAST(gtot.du AS DOUBLE), 4)
          END AS drift_ratio
        FROM ftot, gtot)
      SELECT frozen_distortion_u6, fresh_distortion_u6, drift_ratio,
        CAST(CASE WHEN drift_ratio >=
          ${graft.operators.Similarity.PqDriftRebuildRatio} THEN 1 ELSE 0 END
          AS BIGINT) AS rebuild_recommended
      FROM rep"""),

    // s23: the composed IVF-PQ drift policy — the s17 cell/probe CTEs
    // price frozen-vs-fresh candidate volume and the s19 distortion CTEs
    // price frozen-vs-fresh codebook distortion, with the SAME
    // vec_id % 2 = 0 build corpus for BOTH frozen components (one build
    // event froze them together); the row composes both three-branch
    // ratios with the either-trips verdict, and both thresholds
    // interpolate the Scala constants so operator and twin cannot
    // desync.
    "s23_ivfpq_drift" -> ("WITH e AS (SELECT vec_id, embedding FROM embeddings)," +
      IvfAssignCtesUnder("", "TRUE") + "," +
      IvfAssignCtesUnder("f", "vec_id % 2 = 0") + "," +
      PqSubvectorCteSql + "," +
      PqDistortionCtes("zf", "vec_id % 2 = 0") + "," +
      PqDistortionCtes("zg", "TRUE") + s""",
      prb AS (
        SELECT query_id, cent_id FROM (
          SELECT vec_id AS query_id, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS r
          FROM ac WHERE vec_id % 50 = 0) WHERE r <= ${graft.operators.Similarity.IvfNProbe}),
      fprb AS (
        SELECT query_id, cent_id FROM (
          SELECT vec_id AS query_id, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS r
          FROM fac WHERE vec_id % 50 = 0) WHERE r <= ${graft.operators.Similarity.IvfNProbe}),
      vol AS (
        SELECT count(*) AS fresh_candidate_rows
        FROM prb p JOIN assigned a ON p.cent_id = a.cent_id
        WHERE a.vec_id <> p.query_id),
      fvol AS (
        SELECT count(*) AS frozen_candidate_rows
        FROM fprb p JOIN fassigned a ON p.cent_id = a.cent_id
        WHERE a.vec_id <> p.query_id),
      rep AS (
        SELECT CAST(frozen_candidate_rows AS BIGINT) AS frozen_candidate_rows,
          CAST(fresh_candidate_rows AS BIGINT) AS fresh_candidate_rows,
          CAST(zftot.du AS BIGINT) AS frozen_distortion_u6,
          CAST(zgtot.du AS BIGINT) AS fresh_distortion_u6,
          CASE WHEN fresh_candidate_rows = 0 AND frozen_candidate_rows = 0
                 THEN CAST(1.0 AS DOUBLE)
               WHEN fresh_candidate_rows = 0
                 THEN round(greatest(
                   CAST(${graft.operators.Similarity.IvfDriftRebuildRatio}
                     AS DOUBLE),
                   CAST(frozen_candidate_rows AS DOUBLE)), 4)
               ELSE round(CAST(frozen_candidate_rows AS DOUBLE)
                 / CAST(fresh_candidate_rows AS DOUBLE), 4)
          END AS cell_drift_ratio,
          CASE WHEN zgtot.du = 0 AND zftot.du = 0 THEN CAST(1.0 AS DOUBLE)
               WHEN zgtot.du = 0
                 THEN round(greatest(
                   CAST(${graft.operators.Similarity.PqDriftRebuildRatio}
                     AS DOUBLE),
                   CAST(zftot.du AS DOUBLE)), 4)
               ELSE round(CAST(zftot.du AS DOUBLE) / CAST(zgtot.du AS DOUBLE), 4)
          END AS code_drift_ratio
        FROM fvol, vol, zftot, zgtot)
      SELECT frozen_candidate_rows, fresh_candidate_rows, cell_drift_ratio,
        CAST(CASE WHEN cell_drift_ratio >=
          ${graft.operators.Similarity.IvfDriftRebuildRatio} THEN 1 ELSE 0 END
          AS BIGINT) AS cell_rebuild,
        frozen_distortion_u6, fresh_distortion_u6, code_drift_ratio,
        CAST(CASE WHEN code_drift_ratio >=
          ${graft.operators.Similarity.PqDriftRebuildRatio} THEN 1 ELSE 0 END
          AS BIGINT) AS code_rebuild,
        CAST(CASE WHEN cell_drift_ratio >=
            ${graft.operators.Similarity.IvfDriftRebuildRatio}
          OR code_drift_ratio >=
            ${graft.operators.Similarity.PqDriftRebuildRatio}
          THEN 1 ELSE 0 END AS BIGINT) AS rebuild_recommended
      FROM rep"""),

    // s20: the severity ladder spelled as mutually-exclusive CASE rungs
    // (each vector counted at its FIRST failure), 6dp per-vector norms
    // summed through exact integer micro-units — the whole row replays
    // bit-for-bit; the driver corpus is wholly clean, so the ladder's
    // detection is proven on the planted fixture in PqIndexSpec.
    "s20_vector_sanity" -> """
      WITH v AS (
        SELECT embedding,
          (embedding IS NULL) AS nullvec,
          (embedding IS NOT NULL AND len(embedding) <> 64) AS wrongdim,
          (embedding IS NOT NULL AND len(embedding) = 64
            AND len(list_filter(embedding, x -> x IS NULL)) > 0) AS nullentry
        FROM embeddings),
      w AS (
        SELECT *,
          (NOT nullvec AND NOT wrongdim AND NOT nullentry
            AND len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE))
                  OR isinf(CAST(x AS DOUBLE)))) > 0) AS nonfinite
        FROM v),
      c AS (
        SELECT *, (NOT nullvec AND NOT wrongdim AND NOT nullentry
          AND NOT nonfinite) AS clean FROM w),
      n AS (
        SELECT clean, nullvec, wrongdim, nullentry, nonfinite,
          CASE WHEN clean THEN round(sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) END AS norm
        FROM c)
      SELECT CAST(count(*) AS BIGINT) AS n_vectors,
        CAST(coalesce(sum(CASE WHEN nullvec THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null_vec,
        CAST(coalesce(sum(CASE WHEN wrongdim THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_wrong_dim,
        CAST(coalesce(sum(CASE WHEN nullentry THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null_entries,
        CAST(coalesce(sum(CASE WHEN nonfinite THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nonfinite,
        CAST(coalesce(sum(CASE WHEN clean THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_clean,
        CAST(coalesce(sum(CASE WHEN clean AND norm = 0.0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_zero_norm,
        CAST(coalesce(sum(CASE WHEN clean AND abs(norm - 1.0) <= 0.01 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_near_unit,
        round(coalesce(min(norm), 0.0), 6) AS min_norm,
        round(coalesce(max(norm), 0.0), 6) AS max_norm,
        round(CAST(coalesce(sum(CAST(round(norm * 1000000) AS BIGINT)), 0) AS DOUBLE)
            / 1000000 / CAST(greatest(sum(CASE WHEN clean THEN 1 ELSE 0 END), 1) AS DOUBLE)
            + 0.000000001, 4) AS avg_norm
      FROM n""",

    // s21: row/distinct-id counts, both orphan anti-joins, and the
    // doc→vector coverage the pairing can achieve — a REAL finding at
    // sf0.1 (2,000 of 5,000 docs carry vectors); empty corpus floors
    // coverage vacuously to 100.0 (the gate must pass a first run).
    "s21_modality_coverage" -> """
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
        (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM documents) AS n_doc_ids,
        (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_vectors,
        (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) FROM embeddings) AS n_vec_ids,
        (SELECT CAST(count(*) AS BIGINT) FROM
          (SELECT DISTINCT doc_id FROM documents) d WHERE NOT EXISTS
          (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)) AS docs_without_vector,
        (SELECT CAST(count(*) AS BIGINT) FROM
          (SELECT DISTINCT vec_id FROM embeddings) e WHERE NOT EXISTS
          (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)) AS vectors_without_doc,
        CASE WHEN (SELECT count(DISTINCT doc_id) FROM documents) = 0
             THEN CAST(100.0 AS DOUBLE)
             ELSE round(CAST((SELECT count(DISTINCT doc_id) FROM documents)
                 - (SELECT count(*) FROM
                     (SELECT DISTINCT doc_id FROM documents) d WHERE NOT EXISTS
                     (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id))
               AS DOUBLE)
               / CAST((SELECT count(DISTINCT doc_id) FROM documents) AS DOUBLE)
               * 100.0 + 0.000000001, 4) END AS coverage_pct""",

    // s10: s2's candidate + cosine CTEs with the tenant predicate applied
    // at the candidate join (neighbor label = query label), before any
    // scoring — the pre-filter strategy the Spark plan uses.
    "s10_filtered_ann" -> ("WITH e AS (SELECT vec_id, embedding, label FROM embeddings)," +
      LshCandCtesSql + s""",
      j AS (
        SELECT cand.query_id, cand.neighbor_id, en.label AS label,
          eq.embedding AS qe, en.embedding AS ne
        FROM cand
        JOIN e eq ON eq.vec_id = cand.query_id
        JOIN e en ON en.vec_id = cand.neighbor_id
        WHERE en.label = eq.label),
      u AS (SELECT query_id, neighbor_id, label, unnest(range(1, len(qe) + 1)) AS i, qe, ne FROM j),
      s AS (
        SELECT query_id, neighbor_id, label,
          sum(CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
          sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS na,
          sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nb
        FROM u GROUP BY 1, 2, 3),
      c AS (SELECT query_id, neighbor_id, label, dot / (sqrt(na) * sqrt(nb)) AS cos FROM s),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM c)
      SELECT query_id, neighbor_id, label, CAST(rnk AS BIGINT) AS rnk, round(cos, 4) AS cos_sim
      FROM r WHERE rnk <= ${graft.operators.Similarity.TopK} ORDER BY query_id, rnk"""),

    // s11: full Lloyd-step replay — deterministic lowest-vec_id seeds,
    // 6dp-rounded d² before the argmin (ties -> lowest cent_id), 6dp
    // per-dimension means, nudge+4dp presentation rounds.
    "s11_kmeans_step" -> s"""
      WITH seeds AS (
        SELECT vec_id AS cent_id, embedding AS cv
        FROM embeddings ORDER BY vec_id LIMIT ${graft.operators.Similarity.KmeansK}),
      d AS (
        SELECT e.vec_id, e.embedding, s.cent_id,
          round(list_sum(list_transform(range(1, len(e.embedding) + 1),
            i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE))
               * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE)))), 6) AS d2
        FROM embeddings e CROSS JOIN seeds s),
      asg AS (
        SELECT vec_id, embedding, cent_id, d2 FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
          FROM d) WHERE rn = 1),
      nm AS (
        SELECT cent_id, pos, round(avg(CAST(embedding[pos] AS DOUBLE)), 6) AS m
        FROM (SELECT cent_id, unnest(range(1, len(embedding) + 1)) AS pos, embedding FROM asg)
        GROUP BY 1, 2),
      nv AS (SELECT cent_id, list(m ORDER BY pos) AS nv FROM nm GROUP BY 1),
      st AS (
        SELECT cent_id, CAST(count(*) AS BIGINT) AS n_members,
          round(sum(d2) + 0.000000001, 4) AS inertia
        FROM asg GROUP BY 1)
      SELECT st.cent_id, st.n_members, st.inertia,
        round(sqrt(list_sum(list_transform(range(1, len(nv.nv) + 1),
            i -> (nv.nv[i] - CAST(seeds.cv[i] AS DOUBLE))
               * (nv.nv[i] - CAST(seeds.cv[i] AS DOUBLE))))) + 0.000000001, 4)
          AS centroid_shift
      FROM st JOIN nv USING (cent_id) JOIN seeds USING (cent_id)
      ORDER BY cent_id""",

    // d20: both dedup keys are md5 of deterministic normalizations, so the
    // whole query replays as one grouped aggregate.
    "d20_normalized_dedup" -> """
      WITH k AS (
        SELECT doc_id,
          md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_exact,
          md5(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'))) AS fp_norm
        FROM documents)
      SELECT min(doc_id) AS survivor_id, CAST(count(*) AS BIGINT) AS n_copies,
        CAST(count(DISTINCT fp_exact) AS BIGINT) AS n_exact_variants
      FROM k GROUP BY fp_norm ORDER BY survivor_id""",

    // t27: three regex counts are integers; the FK formula replays in the
    // same operation order with the standard nudge+4dp round.
    "t27_readability" -> """
      WITH n AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        FROM documents),
      c AS (
        SELECT doc_id,
          CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_words,
          greatest(CAST(len(regexp_extract_all(norm, '[.!?]+')) AS BIGINT), 1) AS n_sentences,
          CAST(len(regexp_extract_all(norm, '[aeiouy]+')) AS BIGINT) AS n_syllables
        FROM n)
      SELECT doc_id, n_words, n_sentences, n_syllables,
        round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
            + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE))
            - 15.59 + 0.000000001, 4) AS fk_grade
      FROM c ORDER BY doc_id""",

    // t28: class counts as length-differences after class-strip, ratios
    // rounded BEFORE the verdict comparison on both engines.
    "t28_char_classes" -> """
      WITH n AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        FROM documents),
      c AS (
        SELECT doc_id,
          CAST(length(norm) AS BIGINT) AS n_chars,
          CAST(length(norm) - length(regexp_replace(norm, '[a-z]', '', 'g')) AS BIGINT) AS n_letters,
          CAST(length(norm) - length(regexp_replace(norm, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
          CAST(length(norm) - length(regexp_replace(norm, ' ', '', 'g')) AS BIGINT) AS n_spaces
        FROM n),
      r AS (
        SELECT doc_id, n_chars,
          round(n_letters / CAST(greatest(n_chars, 1) AS DOUBLE) + 0.000000001, 4) AS letter_ratio,
          round(n_digits / CAST(greatest(n_chars, 1) AS DOUBLE) + 0.000000001, 4) AS digit_ratio,
          round(n_spaces / CAST(greatest(n_chars, 1) AS DOUBLE) + 0.000000001, 4) AS space_ratio,
          round((n_chars - n_letters - n_digits - n_spaces)
              / CAST(greatest(n_chars, 1) AS DOUBLE) + 0.000000001, 4) AS other_ratio
        FROM c)
      SELECT doc_id, n_chars, letter_ratio, digit_ratio, space_ratio, other_ratio,
        CASE WHEN letter_ratio >= 0.6 AND other_ratio <= 0.1
             THEN 'clean' ELSE 'suspect' END AS verdict
      FROM r ORDER BY doc_id""",

    // t29: the KL term's log argument is one double division of integer
    // cross-products, spelled in the same order as the Spark column.
    "t29_source_kl" -> """
      WITH tk AS (
        SELECT source,
          unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
        FROM documents),
      tf AS (SELECT source, t, CAST(count(*) AS BIGINT) AS cnt_s FROM tk GROUP BY 1, 2),
      ps AS (SELECT source, CAST(sum(cnt_s) AS BIGINT) AS tot_s,
               CAST(count(*) AS BIGINT) AS n_terms FROM tf GROUP BY 1),
      co AS (SELECT t, CAST(sum(cnt_s) AS BIGINT) AS cnt FROM tf GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM co)
      SELECT tf.source, ps.tot_s AS n_tokens, ps.n_terms,
        round(sum(CAST(cnt_s AS DOUBLE) / CAST(tot_s AS DOUBLE)
            * ln((CAST(cnt_s AS DOUBLE) * CAST(tot AS DOUBLE))
                / (CAST(tot_s AS DOUBLE) * CAST(cnt AS DOUBLE))))
          + 0.000000001, 4) AS kl_vs_corpus
      FROM tf JOIN co USING (t) JOIN ps USING (source) CROSS JOIN tot
      GROUP BY 1, 2, 3 ORDER BY 1""",

    // m7: the frame-energy sums replay integer-exact from the same UTF-8
    // bytes (hex + list slicing); peak tie-break is first occurrence on
    // both engines (array_position / list_position).
    "m7_audio_energy" -> s"""
      WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
      b AS (SELECT doc_id, ${RollingHashBytesSql("h")} AS bytes FROM hx),
      f AS (SELECT doc_id, bytes, CAST(len(bytes) AS BIGINT) AS L FROM b),
      e AS (
        SELECT doc_id,
          CAST((L + ${graft.expressions.PcmFrameEnergies.FrameLen} - 1)
               // ${graft.expressions.PcmFrameEnergies.FrameLen} AS BIGINT) AS n_frames,
          list_transform(
            range(0, (L + ${graft.expressions.PcmFrameEnergies.FrameLen} - 1)
                     // ${graft.expressions.PcmFrameEnergies.FrameLen}),
            fi -> CAST(list_sum(list_transform(
                bytes[CAST(fi * ${graft.expressions.PcmFrameEnergies.FrameLen} + 1 AS BIGINT)
                      :CAST(least((fi + 1) * ${graft.expressions.PcmFrameEnergies.FrameLen}, L) AS BIGINT)],
                x -> (x - 128) * (x - 128))) AS BIGINT)) AS en
        FROM f)
      SELECT doc_id, n_frames,
        CAST(coalesce(list_sum(en), 0) AS BIGINT) AS total_energy,
        CASE WHEN n_frames > 0 THEN CAST(list_position(en, list_max(en)) - 1 AS BIGINT) END
          AS peak_frame,
        CASE WHEN n_frames > 0 THEN CAST(list_max(en) AS BIGINT) END AS peak_energy
      FROM e ORDER BY doc_id""",

    // q51: the oracle keeps the O(n²) NOT EXISTS dominance spelling to pin
    // that the engine's bounded-domain plan computes the same frontier.
    "q51_part_skyline" -> """
      SELECT p1.p_partkey, p1.p_size, CAST(p1.p_retailprice AS DOUBLE) AS price
      FROM part p1
      WHERE NOT EXISTS (
        SELECT 1 FROM part p2
        WHERE CAST(p2.p_retailprice AS DOUBLE) <= CAST(p1.p_retailprice AS DOUBLE)
          AND p2.p_size >= p1.p_size
          AND (CAST(p2.p_retailprice AS DOUBLE) < CAST(p1.p_retailprice AS DOUBLE)
               OR p2.p_size > p1.p_size))
      ORDER BY p1.p_size DESC, p1.p_partkey""",

    // d21: windows group by their STRING here vs the rolling combination
    // of per-token xxhash64 values in the engine (WindowHashes) — the d10
    // collision contract; min/max owner replaces count-distinct, and the
    // run length is plain gaps-and-islands (pos - rn).
    "d21_shared_spans" -> s"""
      WITH tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      w AS (
        SELECT doc_id, t, unnest(range(1,
          greatest(len(t) - ${graft.operators.Dedup.SpanWindowTokens - 2}, 1))) AS i
        FROM tk),
      w2 AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
          array_to_string(t[i:i + ${graft.operators.Dedup.SpanWindowTokens - 1}], ' ') AS s
        FROM w),
      g AS (SELECT s, min(doc_id) AS mn, max(doc_id) AS mx FROM w2 GROUP BY 1),
      f AS (
        SELECT w2.doc_id, w2.pos, (g.mn < w2.doc_id OR g.mx > w2.doc_id) AS shared
        FROM w2 JOIN g USING (s)),
      r AS (
        SELECT doc_id, pos,
          row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        FROM f WHERE shared),
      isl AS (SELECT doc_id, count(*) AS run FROM r GROUP BY doc_id, pos - rn),
      mr AS (SELECT doc_id, max(run) AS max_run FROM isl GROUP BY 1),
      tot AS (
        SELECT doc_id, count(*) AS n_windows,
          count(*) FILTER (WHERE shared) AS n_shared
        FROM f GROUP BY 1)
      SELECT tot.doc_id, CAST(n_windows AS BIGINT) AS n_windows,
        CAST(n_shared AS BIGINT) AS n_shared,
        CAST(coalesce(max_run, 0) AS BIGINT) AS max_run,
        CAST(CASE WHEN coalesce(max_run, 0) > 0
          THEN coalesce(max_run, 0) + ${graft.operators.Dedup.SpanWindowTokens - 1}
          ELSE 0 END AS BIGINT) AS max_span_tokens
      FROM tot LEFT JOIN mr USING (doc_id)
      ORDER BY doc_id""",

    // st6: first occurrence per (user, type) in (ts, event_id) order.
    "st6_event_dedup" -> """
      WITH r AS (
        SELECT user_id, event_type, ts, event_id,
          row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS rn,
          count(*) OVER (PARTITION BY user_id, event_type) AS n
        FROM events)
      SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id,
        CAST(n - 1 AS BIGINT) AS n_dups
      FROM r WHERE rn = 1
      ORDER BY user_id, event_type""",

    // q52: ages in integer microseconds on both engines (unix_micros /
    // epoch_us), λ interpolated from the one Scala constant.
    "q52_ewma_spend" -> s"""
      WITH p AS (
        SELECT user_id, value, epoch_us(ts) AS us
        FROM events WHERE event_type = 'purchase'),
      a AS (SELECT max(us) AS anchor_us FROM p)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
        round(sum(value), 2) AS total_spend,
        round(sum(value * exp(-${graft.operators.Extended.EwmaLambdaPerDay}
                 * CAST(anchor_us - us AS DOUBLE) / 86400000000.0))
          / sum(exp(-${graft.operators.Extended.EwmaLambdaPerDay}
                 * CAST(anchor_us - us AS DOUBLE) / 86400000000.0))
          + 0.000000001, 4) AS ewma_spend
      FROM p CROSS JOIN a GROUP BY user_id ORDER BY user_id""",

    // t30: zeros never materialize — mean and E[c²] come from the counts
    // that exist plus the N scalar; both engines divide exact integers as
    // doubles, so the variance arithmetic is bit-identical.
    "t30_burstiness" -> s"""
      WITH tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM tk),
      pc AS (SELECT doc_id, unnest(t) AS token FROM tk),
      c AS (SELECT token, doc_id, count(*) AS c FROM pc GROUP BY 1, 2),
      agg AS (SELECT token, sum(c) AS total, sum(c * c) AS sumsq,
        count(*) AS n_docs_with FROM c GROUP BY 1)
      SELECT token, CAST(total AS BIGINT) AS total,
        CAST(n_docs_with AS BIGINT) AS n_docs_with,
        round((CAST(sumsq AS DOUBLE) / n_docs
               - (CAST(total AS DOUBLE) / n_docs) * (CAST(total AS DOUBLE) / n_docs))
              / (CAST(total AS DOUBLE) / n_docs) + 0.000000001, 4) AS burstiness
      FROM agg CROSS JOIN nd
      ORDER BY total DESC, token ASC
      LIMIT ${graft.operators.TextAnalysis.BurstinessTopN}""",

    // m8: m7's byte/frame CTEs verbatim, then lag-diff + rank — integer
    // arithmetic end-to-end, earliest frame wins ties on both engines.
    "m8_keyframes" -> s"""
      WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
      b AS (SELECT doc_id, ${RollingHashBytesSql("h")} AS bytes FROM hx),
      f AS (SELECT doc_id, bytes, CAST(len(bytes) AS BIGINT) AS L FROM b),
      e AS (
        SELECT doc_id,
          CAST((L + ${graft.expressions.PcmFrameEnergies.FrameLen} - 1)
               // ${graft.expressions.PcmFrameEnergies.FrameLen} AS BIGINT) AS n_frames,
          list_transform(
            range(0, (L + ${graft.expressions.PcmFrameEnergies.FrameLen} - 1)
                     // ${graft.expressions.PcmFrameEnergies.FrameLen}),
            fi -> CAST(list_sum(list_transform(
                bytes[CAST(fi * ${graft.expressions.PcmFrameEnergies.FrameLen} + 1 AS BIGINT)
                      :CAST(least((fi + 1) * ${graft.expressions.PcmFrameEnergies.FrameLen}, L) AS BIGINT)],
                x -> (x - 128) * (x - 128))) AS BIGINT)) AS en
        FROM f),
      x AS (SELECT doc_id, unnest(range(0, n_frames)) AS fi, en FROM e),
      y AS (SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        CAST(en[CAST(fi + 1 AS BIGINT)] AS BIGINT) AS energy FROM x),
      d AS (
        SELECT doc_id, frame_idx, energy,
          CAST(abs(energy - coalesce(lag(energy) OVER (
            PARTITION BY doc_id ORDER BY frame_idx), 0)) AS BIGINT) AS diff_energy
        FROM y),
      r AS (
        SELECT doc_id, frame_idx, energy, diff_energy,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY diff_energy DESC, frame_idx) AS rnk
        FROM d)
      SELECT doc_id, frame_idx, energy, diff_energy, CAST(rnk AS BIGINT) AS rnk
      FROM r WHERE rnk <= ${graft.multimodal.Multimodal.KeyframesPerDoc}
      ORDER BY doc_id, rnk""",

    // d22: d6's recursive-reach CTEs verbatim, plus the ROUNDED exact
    // Jaccard per edge (the d2/d3 oracle contract); cohesion aggregates
    // bind on the rounded pair values on both engines.
    "d22_cluster_cohesion" -> s"""
      $NearDupClustersCtes,
      cl AS (SELECT doc AS doc_id, min(other) AS cluster_root
             FROM reach GROUP BY doc),
      jr AS (
        SELECT id_a, id_b,
          round(CAST(shared AS DOUBLE)
                / CAST(ca.n + cb.n - shared AS DOUBLE), 4) AS jaccard
        FROM prs
        JOIN cnt ca ON id_a = ca.doc_id
        JOIN cnt cb ON id_b = cb.doc_id
        WHERE CAST(shared AS DOUBLE)
              / CAST(ca.n + cb.n - shared AS DOUBLE) >= 0.8),
      ed AS (SELECT cl.cluster_root, jaccard
             FROM jr JOIN cl ON jr.id_a = cl.doc_id),
      sz AS (SELECT cluster_root, count(*) AS n_docs FROM cl GROUP BY 1),
      ag AS (
        SELECT cluster_root, count(*) AS n_edges,
          round(avg(jaccard) + 0.000000001, 4) AS avg_jaccard,
          round(min(jaccard), 4) AS min_jaccard
        FROM ed GROUP BY 1)
      SELECT ag.cluster_root, CAST(sz.n_docs AS BIGINT) AS n_docs,
        CAST(n_edges AS BIGINT) AS n_edges, avg_jaccard, min_jaccard,
        round(CAST(n_edges AS DOUBLE) * 2
              / CAST(sz.n_docs * (sz.n_docs - 1) AS DOUBLE)
              + 0.000000001, 4) AS density
      FROM ag JOIN sz USING (cluster_root)
      ORDER BY cluster_root""",

    // q53: integer hourly counts make mean exact; the alert binds on the
    // 4dp-rounded z on both engines, threshold interpolated.
    "q53_hourly_anomaly" -> s"""
      WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
          count(*) AS n_events
        FROM events GROUP BY 1, 2),
      m AS (
        SELECT event_type, avg(n_events) AS mean_events,
          stddev_pop(n_events) AS sd
        FROM hourly GROUP BY 1),
      z AS (
        SELECT h.event_type, h.hour, CAST(h.n_events AS BIGINT) AS n_events,
          round(m.mean_events + 0.000000001, 4) AS mean_events,
          round((h.n_events - m.mean_events) / m.sd + 0.000000001, 4) AS z
        FROM hourly h JOIN m USING (event_type))
      SELECT event_type, hour, n_events, mean_events, z FROM z
      WHERE abs(z) >= ${graft.streaming.Events.AnomalyZThreshold}
      ORDER BY event_type, hour""",

    // m9: m7's byte/frame CTEs verbatim; loud-frame indexes via the same
    // transform-then-filter shape, threshold interpolated.
    "m9_silence_trim" -> s"""
      WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
      b AS (SELECT doc_id, ${RollingHashBytesSql("h")} AS bytes FROM hx),
      f AS (SELECT doc_id, bytes, CAST(len(bytes) AS BIGINT) AS L FROM b),
      e AS (
        SELECT doc_id,
          CAST((L + ${graft.expressions.PcmFrameEnergies.FrameLen} - 1)
               // ${graft.expressions.PcmFrameEnergies.FrameLen} AS BIGINT) AS n_frames,
          list_transform(
            range(0, (L + ${graft.expressions.PcmFrameEnergies.FrameLen} - 1)
                     // ${graft.expressions.PcmFrameEnergies.FrameLen}),
            fi -> CAST(list_sum(list_transform(
                bytes[CAST(fi * ${graft.expressions.PcmFrameEnergies.FrameLen} + 1 AS BIGINT)
                      :CAST(least((fi + 1) * ${graft.expressions.PcmFrameEnergies.FrameLen}, L) AS BIGINT)],
                x -> (x - 128) * (x - 128))) AS BIGINT)) AS en
        FROM f),
      l AS (
        SELECT doc_id, n_frames,
          list_filter(
            list_transform(range(0, n_frames),
              fi -> CASE WHEN en[CAST(fi + 1 AS BIGINT)] >
                ${graft.multimodal.Multimodal.SilenceEnergyPerSample *
                  graft.expressions.PcmFrameEnergies.FrameLen}
                THEN fi END),
            x -> x IS NOT NULL) AS loud
        FROM e)
      SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        CAST(len(loud) AS BIGINT) AS n_loud,
        CASE WHEN len(loud) > 0 THEN CAST(loud[1] AS BIGINT) END AS first_loud,
        CASE WHEN len(loud) > 0 THEN CAST(loud[-1] AS BIGINT) END AS last_loud
      FROM l ORDER BY doc_id""",

    // t31: α and the token budget interpolate from the one Scala constant
    // pair; shares t21's tokenization spelling.
    "t31_temp_mixture" -> s"""
      WITH tk AS (
        SELECT source, len(string_split(
          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS n
        FROM documents),
      per AS (SELECT source, count(*) AS n_docs, sum(n) AS n_tokens
              FROM tk GROUP BY 1),
      tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot_tokens,
                sum(pow(CAST(n_tokens AS DOUBLE),
                    ${graft.operators.TextAnalysis.MixtureAlpha})) AS tot_pow
              FROM per)
      SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        CAST(n_tokens AS BIGINT) AS n_tokens,
        round(CAST(n_tokens AS DOUBLE) / tot_tokens + 0.000000001, 6) AS raw_share,
        round(pow(CAST(n_tokens AS DOUBLE),
            ${graft.operators.TextAnalysis.MixtureAlpha}) / tot_pow
          + 0.000000001, 6) AS temp_weight,
        round(${graft.operators.TextAnalysis.MixtureBudgetTokens}
          * (pow(CAST(n_tokens AS DOUBLE),
              ${graft.operators.TextAnalysis.MixtureAlpha}) / tot_pow)
          / CAST(n_tokens AS DOUBLE) + 0.000000001, 4) AS effective_epochs
      FROM per CROSS JOIN tot ORDER BY source""",

    // t32: t21's global (freq DESC, token ASC) rank replay, summed at the
    // CoverageKs checkpoints.
    "t32_coverage_curve" -> s"""
      WITH tk AS (
        SELECT unnest(string_split(
          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS token
        FROM documents),
      tf AS (SELECT token, count(*) AS freq FROM tk GROUP BY 1),
      tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS tot,
                CAST(count(*) AS BIGINT) AS vocab FROM tf),
      rk AS (SELECT token, freq,
               row_number() OVER (ORDER BY freq DESC, token ASC) AS rnk
             FROM tf),
      ks AS (SELECT unnest([${graft.operators.TextAnalysis.CoverageKs.mkString(", ")}]) AS k)
      SELECT CAST(k AS BIGINT) AS k, vocab,
        CAST(count(*) AS BIGINT) AS top_types,
        CAST(sum(freq) AS BIGINT) AS covered_tokens,
        round(sum(freq) / tot + 0.000000001, 6) AS coverage
      FROM rk CROSS JOIN ks CROSS JOIN tot
      WHERE rnk <= k GROUP BY k, vocab, tot ORDER BY k""",

    // s12: per-label 6dp centroid means (the s3 quantizer spelling), the
    // n×k cosine pass, then a = own-label distance / b = nearest other,
    // with b := a when no other label exists.
    "s12_silhouette" -> """
      WITH ue AS (
        SELECT vec_id, CAST(label AS INT) AS cl,
          unnest(range(1, len(embedding) + 1)) AS i, embedding
        FROM embeddings),
      cpos AS (SELECT cl, i, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
               FROM ue GROUP BY 1, 2),
      cent AS (SELECT cl, list(m ORDER BY i) AS cv FROM cpos GROUP BY 1),
      acu AS (
        SELECT vec_id, label, cl,
          unnest(range(1, len(embedding) + 1)) AS i, embedding, cv
        FROM embeddings CROSS JOIN cent),
      acs AS (
        SELECT vec_id, label, cl,
          sum(CAST(embedding[i] AS DOUBLE) * cv[i]) AS dot,
          sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS na,
          sum(cv[i] * cv[i]) AS nb
        FROM acu GROUP BY 1, 2, 3),
      d AS (SELECT vec_id, label, cl,
              1.0 - round(dot / (sqrt(na) * sqrt(nb)), 6) AS dd FROM acs),
      ab AS (
        SELECT vec_id, label,
          max(CASE WHEN cl = CAST(label AS INT) THEN dd END) AS a,
          min(CASE WHEN cl <> CAST(label AS INT) THEN dd END) AS braw
        FROM d GROUP BY 1, 2),
      s AS (SELECT vec_id, label, a, coalesce(braw, a) AS b FROM ab)
      SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
        round(avg(CASE WHEN greatest(a, b) <= 0 THEN 0.0
                  ELSE (b - a) / greatest(a, b) END) + 0.000000001, 4)
          AS mean_silhouette,
        round(avg(a) + 0.000000001, 4) AS mean_intra,
        round(avg(b) + 0.000000001, 4) AS mean_nearest_other
      FROM s GROUP BY label ORDER BY label""",

    // q54: t22's rank-ceil replay of the percentile_approx boundaries over
    // per-customer spend, then the Lorenz rollup; boundary ties land in
    // the lower bucket on both engines (strict >).
    "q54_spend_deciles" -> {
      val b = graft.operators.Extended.DecileBuckets
      val bDefs = (1 until b).map(i =>
        s"max(CASE WHEN rnk = CAST(ceil(cnt * $i.0 / $b) AS BIGINT) THEN spend END) AS b$i")
        .mkString(", ")
      val bucketExpr = (1 until b)
        .map(i => s"CASE WHEN spend > b$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""
      WITH sp AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
                  FROM orders GROUP BY 1),
      r AS (SELECT spend, row_number() OVER (ORDER BY spend) AS rnk,
              count(*) OVER () AS cnt FROM sp),
      bo AS (SELECT $bDefs FROM r),
      tot AS (SELECT sum(spend) AS tot FROM sp),
      d AS (SELECT spend, CAST($bucketExpr AS BIGINT) AS decile
            FROM sp CROSS JOIN bo),
      g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
              round(sum(spend), 2) AS total_spend,
              round(sum(spend) / tot + 0.000000001, 6) AS share
            FROM d CROSS JOIN tot GROUP BY decile, tot)
      SELECT decile, n_customers, total_spend, share,
        round(sum(share) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
          + 0.000000001, 6) AS cum_share
      FROM g ORDER BY decile"""
    },

    // q55: the same sweep-line — deltas ordered (t, delta) so releases
    // precede acquisitions at an instant; peak instant = min t among
    // peak-valued rows (deterministic under intra-tie permutation, see
    // the operator scaladoc).
    "q55_max_concurrency" -> s"""
      WITH ev AS (SELECT event_type, ts, CAST(ts AS DATE) AS day FROM events),
      u AS (
        SELECT event_type, day, ts AS t, 1 AS delta FROM ev
        UNION ALL
        SELECT event_type, day,
          least(ts + INTERVAL ${graft.operators.Extended.ConcurrencySessionSeconds} SECOND,
                CAST(day + 1 AS TIMESTAMP)) AS t,
          -1 AS delta FROM ev),
      c AS (SELECT event_type, day, t,
              sum(delta) OVER (PARTITION BY event_type, day
                ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS cur
            FROM u),
      m AS (SELECT event_type, day, max(cur) AS mx FROM c GROUP BY 1, 2),
      n AS (SELECT event_type, day, count(*) AS n_deltas FROM u GROUP BY 1, 2)
      SELECT c.event_type, c.day, CAST(m.mx AS BIGINT) AS max_concurrent,
        min(c.t) AS peak_ts, CAST(n.n_deltas // 2 AS BIGINT) AS n_events
      FROM c JOIN m USING (event_type, day) JOIN n USING (event_type, day)
      WHERE c.cur = m.mx
      GROUP BY c.event_type, c.day, m.mx, n.n_deltas
      ORDER BY c.event_type, c.day""",

    // st7: the stream-static enrichment's batch twin — left join keeps
    // unmatched users as 'none'.
    "st7_enriched_counts" -> """
      WITH dim AS (
        SELECT c_custkey AS user_id, n_name AS nation
        FROM customer JOIN nation ON c_nationkey = n_nationkey)
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
        coalesce(nation, 'none') AS nation,
        CAST(count(*) AS BIGINT) AS n_events,
        round(sum(value), 2) AS total_value
      FROM events LEFT JOIN dim USING (user_id)
      GROUP BY 1, 2 ORDER BY window_start, nation""",

    // m10: the m7 byte decode, then the rail comparison — threshold and
    // flag level interpolate from the Scala constants.
    "m10_audio_clipping" -> s"""
      WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
      b AS (SELECT doc_id, ${RollingHashBytesSql("h")} AS bytes FROM hx),
      c AS (SELECT doc_id, CAST(len(bytes) AS BIGINT) AS n_samples,
              CAST(coalesce(len(list_filter(bytes,
                x -> abs(CAST(x AS BIGINT) - 128)
                     >= ${graft.expressions.PcmClipCount.ClipThreshold})), 0)
                AS BIGINT) AS n_clipped
            FROM b),
      f AS (SELECT doc_id, n_samples, n_clipped,
              round(CAST(n_clipped AS DOUBLE) / greatest(n_samples, 1)
                + 0.000000001, 6) AS clip_fraction
            FROM c)
      SELECT doc_id, n_samples, n_clipped, clip_fraction,
        clip_fraction > ${graft.multimodal.Multimodal.ClipFlagFraction} AS clipped
      FROM f ORDER BY doc_id""",

    // s13: the s1 truth stack (multi-index exact rank 1) + the s2 serving
    // rank replayed from the SAME `lcand` CTE, left-joined per query.
    "s13_index_quality" -> (IndexQualityCtesSql + s"""
      SELECT tr.query_id, tr.true_nn,
        CAST(fnd.found_rank AS BIGINT) AS found_rank,
        round(coalesce(CAST(1.0 AS DOUBLE) / fnd.found_rank, 0) + 0.000000001, 4)
          AS reciprocal_rank
      FROM tr LEFT JOIN fnd ON fnd.query_id = tr.query_id
      ORDER BY tr.query_id"""),

    // s14: the s13 truth/served CTEs rolled up into recall@k at the grid
    // values (shared fragment — one cosine spelling for both twins).
    "s14_recall_curve" -> (IndexQualityCtesSql + s""",
      ks AS (SELECT unnest([${graft.operators.Similarity.RecallKs.mkString(", ")}]) AS k)
      SELECT CAST(ks.k AS BIGINT) AS k,
        CAST(count(*) AS BIGINT) AS n_queries,
        CAST(count(*) FILTER (WHERE fnd.found_rank <= ks.k) AS BIGINT) AS n_hits,
        round(CAST(count(*) FILTER (WHERE fnd.found_rank <= ks.k) AS DOUBLE)
          / count(*) + 0.000000001, 4) AS recall
      FROM tr LEFT JOIN fnd ON fnd.query_id = tr.query_id
      CROSS JOIN ks
      GROUP BY ks.k ORDER BY k"""),


    // d23: d6's cluster CTEs for the loser set; token counts come from an
    // independent full-corpus pass (the cluster CTEs' tokenization may
    // skip shingle-short docs, and the report must count EVERY document).
    "d23_effective_tokens" -> s"""
      $NearDupClustersCtes
      , roots AS (SELECT doc, min(other) AS root FROM reach GROUP BY doc),
      losers AS (SELECT doc FROM roots WHERE doc <> root),
      tc AS (
        SELECT doc_id,
          CAST(len(string_split(
            regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
            AS BIGINT) AS n,
          doc_id IN (SELECT doc FROM losers) AS lost
        FROM documents)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(coalesce(sum(CASE WHEN NOT lost THEN 1 ELSE 0 END), 0) AS BIGINT)
          AS n_docs_kept,
        CAST(coalesce(sum(n), 0) AS BIGINT) AS n_tokens,
        CAST(coalesce(sum(CASE WHEN NOT lost THEN n ELSE 0 END), 0) AS BIGINT)
          AS n_tokens_kept,
        round(CAST(coalesce(sum(CASE WHEN NOT lost THEN 1 ELSE 0 END), 0) AS DOUBLE)
          / greatest(count(*), 1) + 0.000000001, 6) AS doc_kept_frac,
        round(CAST(coalesce(sum(CASE WHEN NOT lost THEN n ELSE 0 END), 0) AS DOUBLE)
          / greatest(coalesce(sum(n), 0), 1) + 0.000000001, 6) AS token_kept_frac
      FROM tc""",

    // q56: st2's session CTEs verbatim, rolled up per day of
    // session_start; total_value re-rounds the per-session 2dp sums.
    "q56_bounce_rate" -> """
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e),
      n AS (SELECT *, CASE WHEN prev_ts IS NULL
                            OR date_diff('second', prev_ts, ts) > 1800
                      THEN 1 ELSE 0 END AS ns FROM l),
      s AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM n),
      g AS (
        SELECT user_id, session_seq, min(ts) AS session_start,
          count(*) AS n_events, round(sum(value), 2) AS total_value,
          CAST(date_diff('microsecond', min(ts), max(ts)) // 60000000 AS BIGINT)
            AS duration_min
        FROM s GROUP BY 1, 2)
      SELECT CAST(session_start AS DATE) AS day,
        CAST(count(*) AS BIGINT) AS n_sessions,
        CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        round(avg(duration_min) + 0.000000001, 4) AS avg_duration_min,
        round(sum(total_value), 2) AS total_value,
        round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*) + 0.000000001, 6) AS bounce_rate
      FROM g GROUP BY 1 ORDER BY 1""",

    // m11: the m7 byte decode → per-byte histogram → Shannon bits; the
    // verdict binds on the rounded value, threshold interpolated.
    "m11_byte_entropy" -> s"""
      WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
      b AS (SELECT doc_id, ${RollingHashBytesSql("h")} AS bytes FROM hx),
      u AS (SELECT doc_id, unnest(bytes) AS v FROM b),
      cnt AS (SELECT doc_id, v, count(*) AS c FROM u GROUP BY 1, 2),
      tot AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM cnt GROUP BY 1),
      h AS (
        SELECT cnt.doc_id,
          -sum((c / n) * ln(c / n)) / ln(CAST(2 AS DOUBLE)) AS hb
        FROM cnt JOIN tot USING (doc_id) GROUP BY 1)
      SELECT d.doc_id,
        CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
        round(coalesce(hb, 0) + 0.000000001, 6) AS entropy_bits,
        round(coalesce(hb, 0) + 0.000000001, 6)
          < ${graft.multimodal.Multimodal.LowEntropyBits} AS low_entropy
      FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
      ORDER BY d.doc_id""",

    // m12: the REAL GIF decode's stats replayed in closed form — the
    // fixture pixels are deterministic in (doc_id, frame_idx), so
    // mean_lum = (s·dark + (H−s)·bright)/H and phash = 2^52 − 2^(2s)
    // exactly (pixel-exactness proven by the m3-real-frames contract in
    // MultimodalSpec); geometry/shade/stride constants interpolate from
    // the one set of Scala definitions.
    "m12_pixel_frames" -> s"""
      WITH f AS (
        SELECT doc_id,
          CAST(unnest(range(0, 2 + doc_id % 7,
            ${graft.multimodal.Multimodal.PixelStride})) AS BIGINT) AS i
        FROM documents),
      sp AS (
        SELECT doc_id, i,
          1 + (doc_id * 5 + i * 3) % ${graft.multimodal.Multimodal.PixelSplitMod} AS s
        FROM f),
      p AS (
        SELECT doc_id, i,
          (s * ${graft.multimodal.Multimodal.PixelDark}.0 +
           (${graft.multimodal.Multimodal.PixelH} - s) *
             ${graft.multimodal.Multimodal.PixelBright}.0)
            / ${graft.multimodal.Multimodal.PixelH} AS mean_lum,
          (CAST(1 AS BIGINT) << 52) - (CAST(1 AS BIGINT) << CAST(2 * s AS INT))
            AS phash
        FROM sp)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
        round(avg(mean_lum) + 0.000000001, 4) AS avg_lum,
        CAST(sum(phash) AS BIGINT) AS sum_phash,
        CAST(count(DISTINCT phash) AS BIGINT) AS n_distinct_phash
      FROM p GROUP BY doc_id ORDER BY doc_id""",

    // d24: the d2/d3 exact-pair CTEs run once at the grid FLOOR; every
    // grid row filters on the 4dp-rounded jaccard (boundary pin). The
    // endpoint-unnest trick mirrors the engine: each pair contributes
    // two endpoint rows, so pairs = count/2 and affected = distinct.
    "d24_threshold_sweep" -> (ShingleCtesSql + s""",
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      j AS (
        SELECT id_a, id_b,
          round(CAST(shared AS DOUBLE) / CAST(ca.n + cb.n - shared AS DOUBLE), 4) AS jaccard
        FROM pairs
        JOIN cnt ca ON id_a = ca.doc_id
        JOIN cnt cb ON id_b = cb.doc_id
        WHERE CAST(shared AS DOUBLE) / CAST(ca.n + cb.n - shared AS DOUBLE)
          >= ${graft.operators.Dedup.ThresholdSweep.min}),
      u AS (SELECT jaccard, unnest([id_a, id_b]) AS doc_id FROM j),
      nd AS (SELECT count(*) AS n FROM documents),
      ks AS (SELECT unnest([${graft.operators.Dedup.ThresholdSweep.mkString(", ")}]) AS threshold)
      SELECT ks.threshold AS threshold,
        CAST(count(u.doc_id) / 2 AS BIGINT) AS n_pairs,
        CAST(count(DISTINCT u.doc_id) AS BIGINT) AS n_docs_affected,
        round(CAST(count(DISTINCT u.doc_id) AS DOUBLE) / nd.n + 0.000000001, 6)
          AS frac_affected
      FROM ks CROSS JOIN nd LEFT JOIN u ON u.jaccard >= ks.threshold
      GROUP BY ks.threshold, nd.n ORDER BY threshold"""),

    // m13: the m12 closed-form frame math plus a per-doc lag — deltas
    // bind on the 4dp-rounded value like the engine.
    "m13_shot_boundaries" -> s"""
      WITH f AS (
        SELECT doc_id,
          CAST(unnest(range(0, 2 + doc_id % 7,
            ${graft.multimodal.Multimodal.PixelStride})) AS BIGINT) AS i
        FROM documents),
      sp AS (
        SELECT doc_id, i,
          1 + (doc_id * 5 + i * 3) % ${graft.multimodal.Multimodal.PixelSplitMod} AS s
        FROM f),
      p AS (
        SELECT doc_id, i,
          (s * ${graft.multimodal.Multimodal.PixelDark}.0 +
           (${graft.multimodal.Multimodal.PixelH} - s) *
             ${graft.multimodal.Multimodal.PixelBright}.0)
            / ${graft.multimodal.Multimodal.PixelH} AS ml
        FROM sp),
      d AS (
        SELECT doc_id, i, ml,
          round(abs(ml - lag(ml) OVER (PARTITION BY doc_id ORDER BY i))
            + 0.000000001, 4) AS delta
        FROM p)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
        CAST(count(delta) AS BIGINT) AS n_transitions,
        CAST(count(*) FILTER (WHERE delta > ${graft.multimodal.Multimodal.ShotDeltaThreshold}) AS BIGINT) AS n_cuts,
        round(coalesce(max(delta), 0.0), 4) AS max_delta
      FROM d GROUP BY doc_id ORDER BY doc_id""",

    // q57: min-timestamp stage chaining with strict > on both hops —
    // ties at the same instant do not convert on either engine.
    "q57_funnel" -> """
      WITH ev AS (
        SELECT user_id, event_type, ts, CAST(ts AS DATE) AS day FROM events),
      v AS (SELECT user_id, day, min(ts) AS t_view FROM ev
            WHERE event_type = 'view' GROUP BY 1, 2),
      c AS (SELECT e.user_id, e.day, min(e.ts) AS t_click
            FROM ev e JOIN v USING (user_id, day)
            WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1, 2),
      p AS (SELECT e.user_id, e.day, min(e.ts) AS t_purchase
            FROM ev e JOIN c USING (user_id, day)
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1, 2)
      SELECT v.day, CAST(count(*) AS BIGINT) AS n_viewers,
        CAST(count(c.t_click) AS BIGINT) AS n_clicked,
        CAST(count(p.t_purchase) AS BIGINT) AS n_purchased,
        round(CAST(count(p.t_purchase) AS DOUBLE) / count(*) + 0.000000001, 6)
          AS conversion
      FROM v LEFT JOIN c USING (user_id, day) LEFT JOIN p USING (user_id, day)
      GROUP BY v.day ORDER BY v.day""",

    // st8: per-user running-max lateness in integer microseconds —
    // bit-for-bit cross-engine (the q52 epoch_us convention); grace
    // interpolated from the one Scala constant.
    "st8_disorder_audit" -> s"""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      r AS (
        SELECT user_id, event_id, us,
          greatest(max(us) OVER (PARTITION BY user_id ORDER BY event_id
            ROWS UNBOUNDED PRECEDING) - us, 0) AS late_us
        FROM e)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        CAST(count(*) FILTER (WHERE late_us >
          ${graft.streaming.Events.DisorderGraceSeconds} * 1000000) AS BIGINT) AS n_late,
        CAST(max(late_us) AS BIGINT) AS max_lateness_us
      FROM r GROUP BY user_id ORDER BY user_id""",

    // t34: the curation funnel — each stage's SQL is the corresponding
    // operator's own oracle shape (t1/t9/t2 per-doc reports; d1's
    // fingerprint-min; d2/d6's exact-Jaccard pairs + recursive reach,
    // here restricted to the stage-4 survivors; d8's 8-gram CTEs with a
    // strict any-shared gate; t17's rounded-score window), composed in
    // sequence. The Spark side's PPJoin is exact (equals the all-pairs
    // baseline by theorem + test), so the oracle states the plain
    // quadratic form and the sets agree exactly.
    "t34_curation_funnel" -> s"""
      WITH RECURSIVE
      t1 AS ($TextStatsOracleSql),
      t9 AS ($RepetitionOracleSql),
      t2 AS ($LangIdOracleSql),
      base AS (
        SELECT d.doc_id, d.source, t1.n_tokens, t1.quality_score,
          t1.fingerprint, t9.top_trigram_ratio,
          t2.lang_pred = t2.lang_declared AS lang_ok
        FROM documents d
        JOIN t1 ON d.doc_id = t1.doc_id
        JOIN t9 ON d.doc_id = t9.doc_id
        JOIN t2 ON d.doc_id = t2.doc_id),
      s1 AS (SELECT * FROM base WHERE doc_id % 20 <> 0),
      s2 AS (SELECT * FROM s1 WHERE lang_ok),
      s3 AS (SELECT * FROM s2
             WHERE n_tokens >= 10 AND n_tokens <= 100000
               AND quality_score >= 0.3 AND top_trigram_ratio <= 0.2),
      s4 AS (SELECT * FROM s3 WHERE doc_id IN (
               SELECT min(doc_id) FROM s3 GROUP BY fingerprint)),
      ntk AS (
        SELECT d.doc_id,
          string_split(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'), ' ') AS t
        FROM documents d JOIN s4 ON d.doc_id = s4.doc_id),
      nidx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM ntk),
      nsh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM nidx),
      ncnt AS (SELECT doc_id, count(*) AS n FROM nsh GROUP BY 1),
      nprs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM nsh a JOIN nsh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      njp AS (
        SELECT id_a, id_b FROM nprs
        JOIN ncnt ca ON id_a = ca.doc_id
        JOIN ncnt cb ON id_b = cb.doc_id
        WHERE CAST(shared AS DOUBLE) / CAST(ca.n + cb.n - shared AS DOUBLE)
          >= ${graft.operators.Curation.NearDupThreshold}),
      ne AS (SELECT id_a AS src, id_b AS dst FROM njp
             UNION SELECT id_b, id_a FROM njp),
      nnodes AS (SELECT DISTINCT src AS doc FROM ne),
      nreach(doc, other) AS (
        SELECT doc, doc FROM nnodes
        UNION
        SELECT r.doc, ne.dst FROM nreach r JOIN ne ON r.other = ne.src),
      nlosers AS (
        SELECT doc FROM (SELECT doc, min(other) AS root FROM nreach GROUP BY doc)
        WHERE doc <> root),
      s5 AS (SELECT * FROM s4 WHERE doc_id NOT IN (SELECT doc FROM nlosers)),
      dtk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      didx AS (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i FROM dtk
               WHERE len(t) >= 8),
      dsh AS (SELECT DISTINCT doc_id,
                t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS s
              FROM didx),
      dev AS (SELECT DISTINCT s FROM dsh WHERE doc_id % 20 = 0),
      contaminated AS (
        SELECT DISTINCT dsh.doc_id
        FROM dsh JOIN dev USING (s) JOIN s5 ON dsh.doc_id = s5.doc_id),
      s6 AS (SELECT * FROM s5 WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      s7 AS (SELECT * FROM (
               SELECT s6.*, row_number() OVER (PARTITION BY source
                 ORDER BY quality_score DESC, doc_id ASC) AS rnk FROM s6)
             WHERE rnk <= ${graft.operators.Curation.CapPerSource})
      SELECT stage, n_docs, n_tokens FROM (
        SELECT '0_base' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM base
        UNION ALL SELECT '1_holdout', CAST(count(*) AS BIGINT),
          CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s1
        UNION ALL SELECT '2_lang_id', CAST(count(*) AS BIGINT),
          CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s2
        UNION ALL SELECT '3_quality', CAST(count(*) AS BIGINT),
          CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s3
        UNION ALL SELECT '4_exact_dedup', CAST(count(*) AS BIGINT),
          CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s4
        UNION ALL SELECT '5_near_dup', CAST(count(*) AS BIGINT),
          CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s5
        UNION ALL SELECT '6_decontaminated', CAST(count(*) AS BIGINT),
          CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s6
        UNION ALL SELECT '7_source_cap', CAST(count(*) AS BIGINT),
          CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s7
      ) ORDER BY stage""",

    // t35: greedy budget-prefix selection under the (rounded-quality
    // DESC, doc_id ASC) total order. The oracle's plain global window
    // replays the Spark side's broadcast-offset two-level running sum;
    // grid fractions interpolate from the Scala side (t33 convention).
    // Budget = floor(frac * total) computed in-query; empty-kept rows
    // coalesce to 0 on both sides.
    "t35_token_budget" -> s"""
      WITH t1 AS ($TextStatsOracleSql),
      o AS (
        SELECT doc_id, n_tokens, quality_score,
          sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id ASC
            ROWS UNBOUNDED PRECEDING) AS run
        FROM t1),
      tot AS (SELECT coalesce(sum(n_tokens), 0) AS nt FROM t1),
      g AS (SELECT unnest([${graft.operators.TextAnalysis.TokenBudgetGrid
        .mkString(", ")}]) AS frac)
      SELECT CAST(g.frac AS DOUBLE) AS budget_frac,
        CAST(floor(g.frac * tot.nt) AS BIGINT) AS budget_tokens,
        CAST(coalesce(count(*) FILTER (
          WHERE o.run <= floor(g.frac * tot.nt)), 0) AS BIGINT) AS kept_docs,
        CAST(coalesce(sum(o.n_tokens) FILTER (
          WHERE o.run <= floor(g.frac * tot.nt)), 0) AS BIGINT) AS kept_tokens,
        CAST(coalesce(min(o.quality_score) FILTER (
          WHERE o.run <= floor(g.frac * tot.nt)), 0.0) AS DOUBLE) AS cut_quality
      FROM g CROSS JOIN tot LEFT JOIN o ON true
      GROUP BY g.frac, tot.nt ORDER BY budget_frac""",

    // t33: the d24 grid-left-join shape over the t1 quality score; grid
    // values and the 4dp score binding interpolate from the Scala side.
    "t33_quality_sweep" -> s"""
      WITH t1 AS ($TextStatsOracleSql),
      tot AS (SELECT count(*) AS nd, coalesce(sum(n_tokens), 0) AS nt FROM t1),
      ks AS (SELECT unnest([${graft.operators.TextAnalysis.QualitySweep.mkString(", ")}])
               AS threshold),
      k AS (
        SELECT ks.threshold,
          count(t1.doc_id) AS n_docs_kept,
          coalesce(sum(t1.n_tokens), 0) AS n_tokens_kept
        FROM ks LEFT JOIN t1 ON t1.quality_score >= ks.threshold
        GROUP BY ks.threshold)
      SELECT k.threshold AS threshold,
        CAST(n_docs_kept AS BIGINT) AS n_docs_kept,
        CAST(n_tokens_kept AS BIGINT) AS n_tokens_kept,
        round(CAST(n_docs_kept AS DOUBLE) / tot.nd + 0.000000001, 6) AS doc_kept_frac,
        round(CAST(n_tokens_kept AS DOUBLE) / tot.nt + 0.000000001, 6) AS token_kept_frac
      FROM k CROSS JOIN tot ORDER BY threshold""",

    // d25: d6's cluster CTEs, then two size-grouped rollups.
    "d25_cluster_sizes" -> s"""
      $NearDupClustersCtes,
      cl AS (SELECT doc AS doc_id, min(other) AS cluster_root
             FROM reach GROUP BY doc),
      cs AS (SELECT cluster_root, CAST(count(*) AS BIGINT) AS cluster_size
             FROM cl GROUP BY 1)
      SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        CAST(cluster_size * count(*) AS BIGINT) AS n_docs
      FROM cs GROUP BY cluster_size ORDER BY cluster_size""",

    // q58: identical (ts, event_id) arrival order in both engines; the
    // repeat-collapse filter and the episode lead are the same two
    // windows.
    "q58_scd2_intervals" -> """
      WITH l AS (
        SELECT user_id, event_id, ts, event_type,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev_type
        FROM events),
      ep AS (
        SELECT user_id, event_id, ts, event_type FROM l
        WHERE prev_type IS NULL OR prev_type <> event_type),
      iv AS (
        SELECT user_id, event_type AS state, ts AS valid_from,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS valid_to
        FROM ep)
      SELECT user_id, state, valid_from, valid_to,
        valid_to IS NULL AS is_current
      FROM iv ORDER BY user_id, valid_from""",

    // m14: the m10 byte decode, then pairwise level comparisons — level
    // and flag rate interpolate from the Scala constants.
    "m14_level_crossings" -> s"""
      WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
      b AS (SELECT doc_id, ${RollingHashBytesSql("h")} AS bytes FROM hx),
      c AS (SELECT doc_id, CAST(len(bytes) AS BIGINT) AS n_samples,
              CAST(coalesce(len(list_filter(range(2, len(bytes) + 1),
                i -> (bytes[i] < ${graft.expressions.PcmLevelCrossings.CrossLevel})
                  <> (bytes[i - 1] < ${graft.expressions.PcmLevelCrossings.CrossLevel}))), 0)
                AS BIGINT) AS n_crossings
            FROM b),
      f AS (SELECT doc_id, n_samples, n_crossings,
              round(CAST(n_crossings AS DOUBLE) / greatest(n_samples - 1, 1)
                + 0.000000001, 6) AS crossing_rate
            FROM c)
      SELECT doc_id, n_samples, n_crossings, crossing_rate,
        crossing_rate > ${graft.multimodal.Multimodal.HighFreqRate} AS high_freq
      FROM f ORDER BY doc_id""",

    // q59: IGNORE NULLS running last_value over the identical
    // (ts, event_id) arrival order; the carried value is untouched
    // (no arithmetic), so it is bit-identical across engines.
    "q59_locf_impute" -> """
      WITH e AS (
        SELECT user_id, event_id, event_type, ts,
          CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
        FROM events),
      f AS (
        SELECT user_id, event_id, event_type,
          last_value(purchase_value IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS last_purchase_value
        FROM e)
      SELECT user_id, event_id, last_purchase_value,
        event_type <> 'purchase' AND last_purchase_value IS NOT NULL AS imputed
      FROM f ORDER BY user_id, event_id""",

    // st9: the q57 CTE chain at per-(user, day) granularity — the same
    // strict min-timestamp stage logic the state machine replays.
    "st9_funnel_stages" -> """
      WITH ev AS (
        SELECT user_id, event_type, ts, CAST(ts AS DATE) AS day FROM events),
      v AS (SELECT user_id, day, min(ts) AS t_view FROM ev
            WHERE event_type = 'view' GROUP BY 1, 2),
      c AS (SELECT e.user_id, e.day, min(e.ts) AS t_click
            FROM ev e JOIN v USING (user_id, day)
            WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1, 2),
      p AS (SELECT e.user_id, e.day, min(e.ts) AS t_purchase
            FROM ev e JOIN c USING (user_id, day)
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1, 2)
      SELECT v.user_id, v.day,
        c.t_click IS NOT NULL AS clicked,
        p.t_purchase IS NOT NULL AS purchased
      FROM v LEFT JOIN c USING (user_id, day) LEFT JOIN p USING (user_id, day)
      ORDER BY user_id, day""",

    // st10: the attribution pair multiset — an equi-join on user with the
    // interval as a residual predicate; the lag is integer microseconds
    // (epoch_us both engines) so the twin is exact.
    "st10_attribution" -> s"""
      WITH e AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events),
      c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
            FROM e WHERE event_type = 'click'),
      p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
            FROM e WHERE event_type = 'purchase')
      SELECT c.user_id, c.click_id, p.purchase_id, c.click_ts, p.purchase_ts,
        epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS lag_us
      FROM c JOIN p ON c.user_id = p.user_id
        AND p.purchase_ts >= c.click_ts
        AND p.purchase_ts < c.click_ts
              + INTERVAL ${Events.AttributionWindowMinutes} MINUTE
      ORDER BY c.click_id, p.purchase_id""",

    // st11: the left-outer face of st10 — every purchase keeps a row;
    // organic purchases carry NULL click columns. Null lag stays NULL on
    // both engines (epoch_us of NULL is NULL).
    "st11_attribution_outer" -> s"""
      WITH e AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events),
      c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
            FROM e WHERE event_type = 'click'),
      p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
            FROM e WHERE event_type = 'purchase')
      SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts,
        epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS lag_us
      FROM p LEFT JOIN c ON p.user_id = c.user_id
        AND p.purchase_ts >= c.click_ts
        AND p.purchase_ts < c.click_ts
              + INTERVAL ${Events.AttributionWindowMinutes} MINUTE
      ORDER BY p.purchase_id, c.click_id NULLS FIRST""",

    // s15: the s13 candidate/cosine CTEs (one cosine spelling), plus the
    // s4 grid replay ranked at 6dp — the same pre-rank rounding the
    // engine applies, so the int8 pick is pinned across engines.
    // d26: each derivation replayed from the same corpus counts;
    // floor(x + 0.5) spells math.round (SQL round differs on negative
    // halves).
    "d26_auto_config" -> """
      WITH ne AS (SELECT count(*) AS n, count(DISTINCT label) AS nl FROM embeddings)
      SELECT * FROM (
        SELECT 'd5_emb_band_bits' AS param, CAST(n AS BIGINT) AS input_n,
          greatest(3, CAST(floor(log2(CAST(greatest(n, 1) AS DOUBLE) / 60.0) + 0.5)
            AS BIGINT)) AS derived_value
        FROM ne
        UNION ALL
        SELECT 's2_lsh_bucket_bits', CAST(n AS BIGINT),
          least(30, greatest(8,
            CAST(floor(log2(CAST(greatest(n, 1) AS DOUBLE) / 60.0) + 0.5) AS BIGINT)))
        FROM ne
        UNION ALL
        SELECT 's3_ivf_sub_bits', CAST(n AS BIGINT),
          CASE WHEN n <= 0 THEN 0
               ELSE greatest(0, CAST(floor(log2(sqrt(CAST(n AS DOUBLE)) / 2.0
                 / greatest(nl, 1)) + 0.5) AS BIGINT)) END
        FROM ne
        UNION ALL
        -- d9/m6 extra band bits: ceil(log2 n) spelled in INTEGERS (count
        -- of powers of two below n — float log2 misrounds at exact
        -- powers), minus the 13-bit key unit, floored at 0; d9 caps at
        -- 13 (the second hash52's slot width), m6 at 12 (6 gradient +
        -- 6 curvature funding bits since r11)
        SELECT 'd9_simhash_extra_band_bits', CAST(nd.n AS BIGINT),
          least(13, greatest(0,
            (SELECT CAST(count(*) AS BIGINT) FROM range(0, 63) t(i)
             WHERE (CAST(1 AS BIGINT) << CAST(i AS INT)) < nd.n) - 13))
        FROM (SELECT greatest(count(*), 1) AS n FROM documents) nd
        UNION ALL
        SELECT 'm6_phash_extra_band_bits', CAST(nd.n AS BIGINT),
          least(12, greatest(0,
            (SELECT CAST(count(*) AS BIGINT) FROM range(0, 63) t(i)
             WHERE (CAST(1 AS BIGINT) << CAST(i AS INT)) < nd.n) - 13))
        FROM (SELECT greatest(count(*), 1) AS n FROM documents) nd
        UNION ALL
        -- streaming watermark delay: the GLOBAL running-max lateness
        -- under event_id arrival order (Spark's watermark is one value
        -- across all keys — r12; st8 keeps the per-user form as the
        -- per-key audit), plus the one-tick margin the st8 boundary
        -- caveat prescribes. RANGE frame = the engine's tie-determinism
        SELECT 'st_watermark_delay_us',
          (SELECT CAST(count(*) AS BIGINT) FROM events),
          (SELECT coalesce(max(late_us), 0) + 1 FROM (
             SELECT greatest(
                 max(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   ORDER BY event_id
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - epoch_us(CAST(ts AS TIMESTAMP)), 0) AS late_us
             FROM events) lt)
        UNION ALL
        -- stateful shuffle partitions: busiest 70-min (60-min match
        -- window + 600-s st8 grace) click+purchase horizon, one store
        -- per 2^16 state rows (the r11-measured instance-overhead
        -- crossover), clamped to [1, 32]. 8 aligned cells (7 PRECEDING),
        -- not 7: any 70-min interval intersects at most 8 aligned
        -- 10-min cells, so the aligned max is a covering upper bound
        SELECT 'st_shuffle_partitions', h.rows,
          CAST(least(32, greatest(1, (h.rows + 65535) // 65536)) AS BIGINT)
        FROM (
          SELECT CAST(coalesce(max(s), 0) AS BIGINT) AS rows FROM (
            SELECT sum(c) OVER (
                ORDER BY cell RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) s
            FROM (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 600000000 AS cell,
                    count(*) AS c
                  FROM events
                  WHERE event_type IN ('click', 'purchase')
                  GROUP BY 1) cells) slid) h
        UNION ALL
        -- st9 funnel partitions: busiest calendar-adjacent-2-day
        -- distinct-user key count (the funnel's live (user, day) state
        -- bound, measured 0.85-0.86x of actual peak at three soak
        -- scales), through the same store-per-2^16 clamp. Summing two
        -- days' distincts errs high on both-day users - sizing must
        SELECT 'st9_funnel_partitions', k.rows,
          CAST(least(32, greatest(1, (k.rows + 65535) // 65536)) AS BIGINT)
        FROM (
          SELECT CAST(coalesce(max(s), 0) AS BIGINT) AS rows FROM (
            SELECT sum(k) OVER (
                ORDER BY dn RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) s
            FROM (SELECT date_diff('day', DATE '1970-01-01',
                      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS dn,
                    count(DISTINCT user_id) AS k
                  FROM events GROUP BY 1) pd) slid) k)
      ORDER BY param""",

    // q60: q58's interval CTEs over the non-error stream, then DuckDB's
    // native ASOF for the point-in-time pick (tie-free: per-user event
    // times are strictly increasing in this corpus).
    "q60_error_context" -> """
      WITH a AS (
        SELECT user_id, event_id, ts, event_type FROM events
        WHERE event_type <> 'error'),
      l AS (
        SELECT user_id, ts, event_type,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev_type
        FROM a),
      iv AS (
        SELECT user_id AS i_user, event_type AS state, ts AS valid_from
        FROM l WHERE prev_type IS NULL OR prev_type <> event_type),
      err AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        WHERE event_type = 'error'),
      j AS (
        SELECT err.user_id, iv.state, err.ts, iv.valid_from
        FROM err ASOF LEFT JOIN iv
          ON err.user_id = iv.i_user AND err.ts >= iv.valid_from)
      SELECT coalesce(state, 'none') AS context,
        CAST(count(*) AS BIGINT) AS n_errors,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        round(avg((epoch_us(ts) - epoch_us(valid_from)) // 1000000)
          + 0.000000001, 4) AS avg_secs_in_state
      FROM j GROUP BY 1 ORDER BY context""",

    "s15_quant_impact" -> (IndexQualityCtesSql + s""",
      trc AS (
        SELECT query_id, neighbor_id AS true_nn, cos AS true_cos_raw FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rnk
          FROM pc) WHERE rnk = 1),
      u2 AS (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i, embedding FROM e),
      x2 AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM u2),
      d2 AS (SELECT i, round(min(x), 6) AS lo, round(max(x), 6) AS hi FROM x2 GROUP BY 1),
      rq AS (
        SELECT vec_id, x2.i,
          CASE WHEN hi = lo THEN lo
               ELSE lo + round((x2.x - lo) / (hi - lo) * 255.0, 0) / 255.0 * (hi - lo)
          END AS r
        FROM x2 JOIN d2 ON x2.i = d2.i),
      ru AS (
        SELECT allc.query_id, allc.neighbor_id, q.i, q.r AS qr, n.r AS nr
        FROM allc
        JOIN rq q ON q.vec_id = allc.query_id
        JOIN rq n ON n.vec_id = allc.neighbor_id AND n.i = q.i),
      rs AS (
        SELECT query_id, neighbor_id,
          sum(qr * nr) AS dot, sum(qr * qr) AS na, sum(nr * nr) AS nb
        FROM ru GROUP BY 1, 2),
      rc AS (SELECT query_id, neighbor_id,
               round(dot / (sqrt(na) * sqrt(nb)), 6) AS qcos FROM rs),
      ipick AS (
        SELECT query_id, neighbor_id AS int8_nn FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY qcos DESC, neighbor_id) AS rnk
          FROM rc) WHERE rnk = 1),
      pickc AS (
        SELECT ip.query_id, ip.int8_nn, pc.cos AS pick_cos_raw
        FROM ipick ip JOIN pc ON pc.query_id = ip.query_id
          AND pc.neighbor_id = ip.int8_nn)
      SELECT t.query_id, t.true_nn, p.int8_nn,
        t.true_nn = p.int8_nn AS agree,
        round(t.true_cos_raw, 4) AS true_cos,
        round(p.pick_cos_raw, 4) AS int8_pick_cos,
        round(round(t.true_cos_raw, 4) - round(p.pick_cos_raw, 4)
          + 0.000000001, 4) AS regret
      FROM trc t JOIN pickc p USING (query_id) ORDER BY query_id"""),
  )

  /** The s2/s6/s7 dynamic-bucket LSH candidate CTEs: `lb` replays
    * deriveLshBits as a scalar subquery over the corpus count, the bucket
    * masks a static LshMaxBits-plane signature (plane PREFIXES are
    * identical for any bits <= LshMaxBits — the d13/d14 masking trick),
    * and the hamming-1 probe set enumerates dynamically from `lb`.
    * Fragment assumes it follows a WITH; exposes `eb` (vec_id, bucket)
    * and `cand` (query_id, neighbor_id).
    */
  private def LshCandCtesSql: String = LshCandCtesSqlPrefixed("")

  /** The s2-family LSH candidate CTE fragment with every CTE name
    * prefixed by `p` — lets a twin that ALSO instantiates the IVF CTEs
    * (whose names collide on `prm`) carry both candidate generators in
    * one WITH (the r7 s1 multi-index twin). `p = ""` is the shared
    * spelling every s2-family twin has used since r6.
    */
  private def LshCandCtesSqlPrefixed(p: String): String = s"""
      ${p}prm AS (
        SELECT least(${graft.operators.Similarity.LshMaxBits},
          greatest(${graft.operators.Similarity.LshBits},
            CAST(round(ln(CAST(greatest(count(*), 1) AS DOUBLE)
                          / ${graft.operators.Similarity.LshTargetBucket})
                       / ln(2), 0) AS INT))) AS lb
        FROM embeddings),
      ${p}eb AS (
        SELECT vec_id,
          (${graft.functions.VectorFunctions.hyperplaneBucketDuckSqlFlat(
             "embedding", 64, graft.operators.Similarity.LshMaxBits)})
            & ((1::BIGINT << lb) - 1) AS bucket
        FROM embeddings CROSS JOIN ${p}prm),
      ${p}probes AS (
        SELECT unnest(list_append(
          list_transform(range(0, lb), p -> 1::BIGINT << p), 0::BIGINT)) AS p
        FROM ${p}prm),
      ${p}qp AS (
        SELECT vec_id AS query_id, xor(bucket, p) AS bucket
        FROM ${p}eb CROSS JOIN ${p}probes WHERE vec_id % 50 = 0),
      ${p}cand AS (
        SELECT ${p}qp.query_id, ${p}eb.vec_id AS neighbor_id
        FROM ${p}qp JOIN ${p}eb ON ${p}qp.bucket = ${p}eb.bucket
        WHERE ${p}eb.vec_id <> ${p}qp.query_id)"""

  /** The r6 AUTO coarse-quantizer replay, shared by the s3/s5/d14
    * oracles: `sb` replays deriveSubBits as a scalar subquery over
    * (count, distinct labels); seed cells are label·2^sb + a masked
    * 16-bit hyperplane bucket (plane PREFIXES are identical for any
    * sb <= 16, so the mask reproduces Spark's sb-bit bucket exactly;
    * sb = 16 needs a ~10^12-vector corpus); then 6dp centroid means and
    * the argmax assignment. Starts its own WITH; exposes `e`
    * (vec_id, embedding), `ac` (vec × centroid cosines), `assigned`.
    */
  private def IvfAssignAutoCtesSql: String =
    "WITH e AS (SELECT vec_id, embedding FROM embeddings)," +
      IvfAssignCtesUnder("", "TRUE")

  /** The full IVF top-k oracle — shared verbatim by s3 (recompute form)
    * and s16 (persisted-index form): identical output contract.
    */
  private def IvfTopKOracleSql: String = IvfAssignAutoCtesSql + s""",
      prb AS (
        SELECT query_id, cent_id FROM (
          SELECT vec_id AS query_id, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS r
          FROM ac WHERE vec_id % 50 = 0) WHERE r <= ${graft.operators.Similarity.IvfNProbe}),
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM prb p JOIN assigned a ON p.cent_id = a.cent_id
        WHERE a.vec_id <> p.query_id),
      pairs AS (
        SELECT c.query_id, c.neighbor_id, q.embedding AS qe, n2.embedding AS ne
        FROM cand c
        JOIN e q ON q.vec_id = c.query_id
        JOIN e n2 ON n2.vec_id = c.neighbor_id),
      u AS (SELECT query_id, neighbor_id, unnest(range(1, len(qe) + 1)) AS i, qe, ne FROM pairs),
      s AS (
        SELECT query_id, neighbor_id,
          sum(CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
          sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS na,
          sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nb
        FROM u GROUP BY 1, 2),
      c AS (SELECT query_id, neighbor_id, dot / (sqrt(na) * sqrt(nb)) AS cos FROM s),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM c)
      SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, round(cos, 4) AS cos_sim
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""

  /** s6's full oracle — shared verbatim by s18 (the persisted-index
    * probe has the identical output contract).
    */
  private def PqAnnOracleSql: String = {
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),""" +
      LshCandCtesSql + "," + PqCoarseRerankTailSql
  }

  /** The PQ coarse+rerank tail over any `cand(query_id, neighbor_id)`
    * CTE: learn the s6 codebook over `e`, reconstruct both pair sides,
    * coarse-shortlist at 6dp, exact-rerank to top-5 — shared verbatim by
    * the LSH-candidate twins (s6/s18) and the IVF-candidate one (s22),
    * so the three registered forms provably share one coarse metric.
    */
  private def PqCoarseRerankTailSql: String = {
      s"""
      sv AS (
        SELECT vec_id, sub, list_slice(embedding, sub * 8 + 1, sub * 8 + 8) AS sv
        FROM (SELECT vec_id, unnest(range(0, 8)) AS sub, embedding FROM e)),
      bk AS (
        SELECT vec_id, sub, sv,
            CASE WHEN CAST(sv[1] AS DOUBLE) > 0 THEN 1 ELSE 0 END
          + CASE WHEN CAST(sv[2] AS DOUBLE) > 0 THEN 2 ELSE 0 END
          + CASE WHEN CAST(sv[3] AS DOUBLE) > 0 THEN 4 ELSE 0 END
          + CASE WHEN CAST(sv[4] AS DOUBLE) > 0 THEN 8 ELSE 0 END AS bkt
        FROM sv),
      cm AS (
        SELECT sub, bkt, pos, round(avg(CAST(sv[pos] AS DOUBLE)), 6) AS mc
        FROM (SELECT sub, bkt, unnest(range(1, 9)) AS pos, sv FROM bk)
        GROUP BY 1, 2, 3),
      cvb AS (SELECT sub, bkt, list(mc ORDER BY pos) AS cv FROM cm GROUP BY 1, 2),
      dd AS (
        SELECT vec_id, sub, bkt,
          round(sum((CAST(sv[pos] AS DOUBLE) - cv[pos])
                  * (CAST(sv[pos] AS DOUBLE) - cv[pos])), 6) AS d2
        FROM (SELECT b.vec_id, b.sub, c.bkt, unnest(range(1, 9)) AS pos, b.sv, c.cv
              FROM bk b JOIN cvb c ON b.sub = c.sub)
        GROUP BY 1, 2, 3),
      asg AS (
        SELECT vec_id, sub, bkt FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, bkt) AS rn
          FROM dd) WHERE rn = 1),
      rv AS (
        SELECT a.vec_id, flatten(list(c.cv ORDER BY a.sub)) AS rv
        FROM asg a JOIN cvb c ON a.sub = c.sub AND a.bkt = c.bkt GROUP BY 1),
      cu2 AS (
        SELECT cand.query_id, cand.neighbor_id,
          unnest(range(1, 65)) AS i, a.rv AS qrv, b.rv AS nrv
        FROM cand
        JOIN rv a ON a.vec_id = cand.query_id
        JOIN rv b ON b.vec_id = cand.neighbor_id),
      cs AS (
        SELECT query_id, neighbor_id,
          sum(qrv[i] * nrv[i]) AS dot,
          sum(qrv[i] * qrv[i]) AS na,
          sum(nrv[i] * nrv[i]) AS nb
        FROM cu2 GROUP BY 1, 2),
      co AS (SELECT query_id, neighbor_id,
               round(dot / (sqrt(na) * sqrt(nb)), 6) AS coarse FROM cs),
      short AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY coarse DESC, neighbor_id) AS crnk
          FROM co)
        WHERE crnk <= ${graft.operators.Similarity.RerankShortlist}),
      pairs AS (
        SELECT short.query_id, short.neighbor_id, eq.embedding AS qe, en.embedding AS ne
        FROM short
        JOIN e eq ON eq.vec_id = short.query_id
        JOIN e en ON en.vec_id = short.neighbor_id),
      pu AS (SELECT query_id, neighbor_id, unnest(range(1, len(qe) + 1)) AS i, qe, ne
             FROM pairs),
      ps AS (
        SELECT query_id, neighbor_id,
          sum(CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
          sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS na,
          sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nb
        FROM pu GROUP BY 1, 2),
      pc AS (SELECT query_id, neighbor_id, dot / (sqrt(na) * sqrt(nb)) AS cos FROM ps),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM pc)
      SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, round(cos, 4) AS cos_sim
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""
  }

  /** The full corpus's per-(vector, subspace) slices — the distortion
    * integrand's domain, shared by both sides of the s19 audit.
    */
  private def PqSubvectorCteSql: String = s"""
      pqsv AS (
        SELECT vec_id, sub, list_slice(embedding, sub * 8 + 1, sub * 8 + 8) AS sv
        FROM (SELECT vec_id, unnest(range(0, 8)) AS sub, embedding FROM embeddings))"""

  /** PQ codebook learned over `where`'s rows (the s6 codebook CTEs
    * verbatim: 4 leading sign bits seed 16 entries per subspace,
    * 6dp-rounded means) + the total quantization distortion it inflicts
    * on the FULL corpus, in exact integer micro-units: per (vector,
    * subspace) the argmin entry's 6dp-rounded squared L2 — the same
    * rounded metric the encode assigns by — ×10⁶ to BIGINT before the
    * sum, so the total is order-free and engine-exact (a double total's
    * low bits would wobble across partial-sum orders). `p` prefixes the
    * CTE names so one query holds the frozen and fresh codebooks at
    * once; `${p}tot.du` carries the result.
    */
  private def PqDistortionCtes(p: String, where: String): String = s"""
      ${p}bk AS (
        SELECT sub, sv,
            CASE WHEN CAST(sv[1] AS DOUBLE) > 0 THEN 1 ELSE 0 END
          + CASE WHEN CAST(sv[2] AS DOUBLE) > 0 THEN 2 ELSE 0 END
          + CASE WHEN CAST(sv[3] AS DOUBLE) > 0 THEN 4 ELSE 0 END
          + CASE WHEN CAST(sv[4] AS DOUBLE) > 0 THEN 8 ELSE 0 END AS bkt
        FROM (SELECT sub, list_slice(embedding, sub * 8 + 1, sub * 8 + 8) AS sv
              FROM (SELECT unnest(range(0, 8)) AS sub, embedding
                    FROM embeddings WHERE $where))),
      ${p}cm AS (
        SELECT sub, bkt, pos, round(avg(CAST(sv[pos] AS DOUBLE)), 6) AS mc
        FROM (SELECT sub, bkt, unnest(range(1, 9)) AS pos, sv FROM ${p}bk)
        GROUP BY 1, 2, 3),
      ${p}cvb AS (SELECT sub, bkt, list(mc ORDER BY pos) AS cv FROM ${p}cm GROUP BY 1, 2),
      ${p}dd AS (
        SELECT vec_id, sub, bkt,
          round(sum((CAST(sv[pos] AS DOUBLE) - cv[pos])
                  * (CAST(sv[pos] AS DOUBLE) - cv[pos])), 6) AS d2
        FROM (SELECT a.vec_id, a.sub, c.bkt, unnest(range(1, 9)) AS pos, a.sv, c.cv
              FROM pqsv a JOIN ${p}cvb c ON a.sub = c.sub)
        GROUP BY 1, 2, 3),
      ${p}dm AS (
        SELECT vec_id, sub, CAST(round(min(d2) * 1000000) AS BIGINT) AS du
        FROM ${p}dd GROUP BY 1, 2),
      ${p}tot AS (SELECT CAST(sum(du) AS BIGINT) AS du FROM ${p}dm)"""

  /** The IVF quantizer + assignment CTEs under a BUILD predicate —
    * subBits and centroids derive from `buildPred`'s rows only, while
    * the assignment covers the full corpus (`e`, which the caller's
    * WITH must declare first). `p` prefixes every CTE name so a query
    * can hold two quantizers at once (s17 prices frozen vs fresh).
    * With (`""`, `"TRUE"`) this is exactly the shared
    * [[IvfAssignAutoCtesSql]] the s1/s3/s16/d14 oracles replay.
    */
  private def IvfAssignCtesUnder(p: String, buildPred: String): String = s"""
      ${p}prm AS (
        SELECT CASE WHEN count(*) <= 0 THEN 0
               ELSE greatest(0, CAST(round(
                 ln(sqrt(CAST(count(*) AS DOUBLE)) / CAST(2 AS DOUBLE)
                    / CAST(greatest(count(DISTINCT label), 1) AS DOUBLE))
                 / ln(2), 0) AS INT)) END AS sb
        FROM embeddings WHERE $buildPred),
      ${p}cm0 AS (
        SELECT vec_id, embedding,
          CAST(label AS INT) * (1 << sb)
            + ((${graft.functions.VectorFunctions.hyperplaneBucketDuckSql(
                 "embedding", 64, 16)}) & ((1 << sb) - 1)) AS cell
        FROM embeddings CROSS JOIN ${p}prm WHERE $buildPred),
      ${p}ue AS (SELECT vec_id, cell, unnest(range(1, len(embedding) + 1)) AS i, embedding
             FROM ${p}cm0),
      ${p}cpos AS (
        SELECT cell AS cent_id, i AS pos, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
        FROM ${p}ue GROUP BY 1, 2),
      ${p}cent AS (SELECT cent_id, list(m ORDER BY pos) AS cv FROM ${p}cpos GROUP BY 1),
      ${p}acu AS (
        SELECT vec_id, cent_id, unnest(range(1, len(embedding) + 1)) AS i, embedding, cv
        FROM e CROSS JOIN ${p}cent),
      ${p}acs AS (
        SELECT vec_id, cent_id,
          sum(CAST(embedding[i] AS DOUBLE) * cv[i]) AS dot,
          sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS na,
          sum(cv[i] * cv[i]) AS nb
        FROM ${p}acu GROUP BY 1, 2),
      ${p}ac AS (SELECT vec_id, cent_id, dot / (sqrt(na) * sqrt(nb)) AS cc FROM ${p}acs),
      ${p}assigned AS (
        SELECT vec_id, cent_id FROM (
          SELECT vec_id, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS r
          FROM ${p}ac) WHERE r = 1)"""

  /** DuckDB fragment: hex string column `h` → list of UTF-8 byte values
    * (HUGEINT, for overflow-free polynomial accumulation).
    */
  private def RollingHashBytesSql(h: String): String =
    s"""list_transform(range(1, length($h) // 2 + 1),
        i -> CAST(('0x' || substr($h, CAST(2 * i - 1 AS INT), 2))::BIGINT AS HUGEINT))"""

  /** DuckDB fragment: Rabin–Karp fold of a byte list — mirrors
    * [[graft.expressions.RollingHash.hashBytes]] (B=257, P=2^61-1).
    */
  private def RollingHashReduceSql(bytes: String): String =
    s"""CAST(list_reduce(list_prepend(0::HUGEINT, $bytes),
        (a, x) -> (a * 257 + x) % 2305843009213693951) AS BIGINT)"""

  /** t1's full oracle — shared with t13's composite filter. */
  private def TextStatsOracleSql: String = s"""
      WITH n AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
        FROM documents),
      tk AS (SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM n),
      m AS (
        SELECT doc_id, norm, toks,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens
        FROM tk),
      r AS (
        SELECT doc_id, n_tokens, n_distinct_tokens,
          round(CAST(n_distinct_tokens AS DOUBLE) / greatest(n_tokens, 1), 4) AS type_token_ratio,
          round(CAST(length(replace(norm, ' ', '')) AS DOUBLE) / greatest(n_tokens, 1), 4) AS avg_token_len,
          round(CAST(len(list_filter(toks, t -> list_contains($StopSqlList, t))) AS DOUBLE)
            / greatest(n_tokens, 1), 4) AS stopword_ratio,
          md5(norm) AS fingerprint
        FROM m)
      SELECT doc_id, n_tokens, n_distinct_tokens, type_token_ratio, avg_token_len,
        stopword_ratio,
        round(least(CAST(n_tokens AS DOUBLE) / 500.0, 1.0) * 0.4
          + type_token_ratio * 0.3 + (1.0 - stopword_ratio) * 0.3 + 0.000000001, 4) AS quality_score,
        fingerprint
      FROM r ORDER BY doc_id"""

  /** t9's full oracle — shared with t13's composite filter. */
  private val RepetitionOracleSql: String = """
      WITH tk AS (
        SELECT doc_id, text,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tk
              WHERE len(t) >= 3),
      g AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g FROM idx),
      gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
      tri AS (
        SELECT doc_id,
          round(CAST(max(c) AS DOUBLE) / sum(c) + 0.000000001, 4) AS top_trigram_ratio
        FROM gc GROUP BY 1),
      ln0 AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM documents),
      l AS (
        SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
          round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines)
            + 0.000000001, 4) AS dup_line_frac
        FROM ln0)
      SELECT l.doc_id, l.n_lines, l.dup_line_frac,
        COALESCE(tri.top_trigram_ratio, 0.0) AS top_trigram_ratio
      FROM l LEFT JOIN tri ON l.doc_id = tri.doc_id ORDER BY l.doc_id"""

  /** d4's full oracle — shared with d9's brute-force pair replay. */
  private val SimHashOracleSql: String = s"""
      WITH tk AS (
        SELECT doc_id,
          unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t
        FROM documents),
      h AS (SELECT doc_id, ${graft.functions.TextFunctions.hash52Sql("t")} AS h FROM tk),
      bits AS (SELECT unnest(range(0, ${graft.operators.Dedup.SimHashBits})) AS bit),
      v AS (
        SELECT doc_id, bit, sum((h >> bit) & 1) AS ones, count(*) AS n
        FROM h CROSS JOIN bits GROUP BY 1, 2)
      SELECT doc_id,
        CAST(sum(CASE WHEN ones * 2 > n THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
          AS simhash
      FROM v GROUP BY doc_id ORDER BY doc_id"""

  /** t2's full oracle — shared with t10's confusion matrix. */
  private def LangIdOracleSql: String = s"""
      WITH tk AS (
        SELECT doc_id, lang AS lang_declared,
          string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
        FROM documents),
      h AS (
        SELECT doc_id, lang_declared,
          $LangHitsSql
        FROM tk),
      b AS (SELECT *, greatest(hits_en, hits_de, hits_es, hits_fr) AS best FROM h)
      SELECT doc_id, lang_declared,
        CASE WHEN hits_en = best AND best > 0 THEN 'en'
             WHEN hits_de = best AND best > 0 THEN 'de'
             WHEN hits_es = best AND best > 0 THEN 'es'
             WHEN hits_fr = best AND best > 0 THEN 'fr'
             ELSE 'und' END AS lang_pred,
        hits_en, hits_de, hits_es, hits_fr
      FROM b ORDER BY doc_id"""

  /** DuckDB list literal of TextFunctions.Stopwords. */
  private def StopSqlList: String =
    graft.functions.TextFunctions.Stopwords.mkString("['", "', '", "']")

  /** hits_<lang> columns mirroring TextFunctions.LangMarkers. */
  private def LangHitsSql: String =
    graft.functions.TextFunctions.LangMarkers.map { case (lang, m) =>
      val lst = m.mkString("['", "', '", "']")
      s"CAST(len(list_filter(toks, t -> list_contains($lst, t))) AS BIGINT) AS hits_$lang"
    }.mkString(",\n          ")

  /** The s13/s14 shared fragment: s1's multi-index truth (exact rank-1
    * over LSH ∪ IVF candidates) and the s2 serving ranks, BOTH drawing
    * their cosines from the single `pc` CTE (ADVICE r7 — one cosine
    * spelling). Ends at `fnd` (query_id, found_rank ≤ TopK); each twin
    * appends its own rollup.
    */
  private def IndexQualityCtesSql: String = IvfAssignAutoCtesSql + s""",
      prb AS (
        SELECT query_id, cent_id FROM (
          SELECT vec_id AS query_id, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS r
          FROM ac WHERE vec_id % 50 = 0) WHERE r <= ${graft.operators.Similarity.IvfNProbe}),
      icand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM prb p JOIN assigned a ON p.cent_id = a.cent_id
        WHERE a.vec_id <> p.query_id),""" + LshCandCtesSqlPrefixed("l") + s""",
      allc AS (
        SELECT query_id, neighbor_id FROM lcand
        UNION
        SELECT query_id, neighbor_id FROM icand),
      pairs AS (
        SELECT allc.query_id, allc.neighbor_id, eq.embedding AS qe, en.embedding AS ne
        FROM allc
        JOIN e eq ON eq.vec_id = allc.query_id
        JOIN e en ON en.vec_id = allc.neighbor_id),
      pu AS (SELECT query_id, neighbor_id, unnest(range(1, len(qe) + 1)) AS i, qe, ne FROM pairs),
      ps AS (
        SELECT query_id, neighbor_id,
          sum(CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
          sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS na,
          sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nb
        FROM pu GROUP BY 1, 2),
      pc AS (SELECT query_id, neighbor_id, dot / (sqrt(na) * sqrt(nb)) AS cos FROM ps),
      tr AS (
        SELECT query_id, neighbor_id AS true_nn FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
          FROM pc) WHERE rnk = 1),
      lr AS (
        SELECT pc.query_id, pc.neighbor_id,
          row_number() OVER (PARTITION BY pc.query_id
            ORDER BY pc.cos DESC, pc.neighbor_id) AS rnk
        FROM pc JOIN lcand USING (query_id, neighbor_id)),
      fnd AS (
        SELECT tr.query_id, min(lr.rnk) AS found_rank
        FROM tr JOIN lr ON lr.query_id = tr.query_id
          AND lr.neighbor_id = tr.true_nn
        WHERE lr.rnk <= ${graft.operators.Similarity.TopK}
        GROUP BY 1)"""

  /** Connected components over the near-dup pair graph via a recursive
    * reachability CTE (DuckDB) — root = min reachable doc_id. Shared by the
    * d6 and d7 oracles.
    */
  private val NearDupClustersCtes: String = """
      WITH RECURSIVE tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tk),
      sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      prs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      jp AS (
        SELECT id_a, id_b
        FROM prs
        JOIN cnt ca ON id_a = ca.doc_id
        JOIN cnt cb ON id_b = cb.doc_id
        WHERE CAST(shared AS DOUBLE) / CAST(ca.n + cb.n - shared AS DOUBLE) >= 0.8),
      e AS (SELECT id_a AS src, id_b AS dst FROM jp
            UNION SELECT id_b, id_a FROM jp),
      nodes AS (SELECT DISTINCT src AS doc FROM e),
      reach(doc, other) AS (
        SELECT doc, doc FROM nodes
        UNION
        SELECT r.doc, e.dst FROM reach r JOIN e ON r.other = e.src)"""

  private val NearDupClustersSql: String = s"""
      $NearDupClustersCtes
      SELECT doc AS doc_id, min(other) AS cluster_root
      FROM reach GROUP BY doc ORDER BY doc_id"""

  /** d18: d6's cluster CTEs (same pair graph — minhash-verify IS exact
    * Jaccard), then per-cluster quality rank: most tokens wins, doc_id
    * ascending tie-break — the same (n_tokens DESC, doc_id ASC) window
    * both engines order identically because both operands are integers.
    */
  private val QualitySurvivorsSql: String = s"""
      $NearDupClustersCtes,
      cl AS (SELECT doc AS doc_id, min(other) AS cluster_root
             FROM reach GROUP BY doc),
      nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM tk),
      rk AS (
        SELECT cl.cluster_root, cl.doc_id, nt.n_tokens,
          row_number() OVER (PARTITION BY cl.cluster_root
                             ORDER BY nt.n_tokens DESC, cl.doc_id ASC) AS rn,
          count(*) OVER (PARTITION BY cl.cluster_root) AS n_members
        FROM cl JOIN nt USING (doc_id))
      SELECT cluster_root, doc_id AS survivor_id,
        n_tokens AS survivor_tokens, CAST(n_members AS BIGINT) AS n_members
      FROM rk WHERE rn = 1 ORDER BY cluster_root"""

  /** t20/t24 shared bigram-LM CTE body (tk/bi/cb/cw/v/sc): ONE spelling of
    * the tokenization + add-k model + per-bigram nll, so the perplexity
    * score and the cut built on it can never drift apart. No leading WITH
    * (callers compose it).
    */
  private val LmNllCtesSql: String = """tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents),
      bi AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tk)),
      cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
      cw AS (SELECT w1, sum(cb) AS cw FROM cb GROUP BY 1),
      v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
            FROM (SELECT unnest(toks) AS tok FROM tk)),
      sc AS (
        SELECT doc_id, -log2((cb.cb + 0.5) / (cw.cw + 0.5 * v.v)) AS nll
        FROM bi JOIN cb USING (w1, w2) JOIN cw USING (w1) CROSS JOIN v)"""

  /** m5/m6: bytes → 52 block means → bit per block, all in integer
    * arithmetic. No leading WITH so m6 can prepend RECURSIVE.
    */
  private val PhashCteBody: String = """hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
      b AS (
        SELECT doc_id,
          list_transform(range(1, length(h) // 2 + 1),
            i -> ('0x' || substr(h, CAST(2 * i - 1 AS INT), 2))::BIGINT) AS bytes
        FROM hx),
      t AS (SELECT doc_id, bytes, len(bytes) AS L,
              CAST(list_sum(bytes) AS BIGINT) AS total FROM b),
      bits AS (
        SELECT doc_id, L,
          CAST(list_sum(list_transform(range(0, 52), j ->
            CASE WHEN CAST(coalesce(list_sum(list_slice(bytes, j * L // 52 + 1,
                                                        (j + 1) * L // 52)), 0)
                       AS BIGINT) * L
                      > total * ((j + 1) * L // 52 - j * L // 52)
                 THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS phash
        FROM t)"""

  /** Shared word-trigram shingle CTE block (tk/idx/sh/cnt) — ONE spelling
    * of the normalization + n-gram definition for every Jaccard oracle
    * (d2, d3, d11); editing the shingle rule here keeps them in lockstep.
    */
  private val ShingleCtesSql: String = """
      WITH tk AS (
        SELECT doc_id,
          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tk),
      sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)"""

  /** Exact n-gram Jaccard pairs (j >= 0.8) — oracle for both d2 and d3. */
  private val JaccardPairsSql: String = ShingleCtesSql + """,
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      j AS (
        SELECT id_a, id_b,
          CAST(shared AS DOUBLE) / CAST(ca.n + cb.n - shared AS DOUBLE) AS jaccard
        FROM pairs
        JOIN cnt ca ON id_a = ca.doc_id
        JOIN cnt cb ON id_b = cb.doc_id)
      SELECT id_a, id_b, round(jaccard, 4) AS jaccard
      FROM j WHERE jaccard >= 0.8 ORDER BY id_a, id_b"""

  /** d17: exact containment pairs — the shared shingle CTEs with the
    * min-size normalizer replacing the union-size one.
    */
  private val ContainmentPairsSql: String = ShingleCtesSql + """,
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      c AS (
        SELECT id_a, id_b,
          CAST(shared AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE) AS containment
        FROM pairs
        JOIN cnt ca ON id_a = ca.doc_id
        JOIN cnt cb ON id_b = cb.doc_id)
      SELECT id_a, id_b, round(containment, 4) AS containment
      FROM c WHERE containment >= 0.8 ORDER BY id_a, id_b"""

  /** d27: d17's exact-containment contract restricted to
    * batch(odd)×corpus(even) pairs — the prefix/positional machinery is
    * recall-exact, so the twin states the semantics directly.
    */
  private val IncrementalContainmentSql: String = ShingleCtesSql + """,
      pairs AS (
        SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s
        WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        GROUP BY 1, 2),
      c AS (
        SELECT batch_id, corpus_id,
          CAST(shared AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE) AS containment
        FROM pairs
        JOIN cnt ca ON batch_id = ca.doc_id
        JOIN cnt cb ON corpus_id = cb.doc_id)
      SELECT batch_id, corpus_id, round(containment, 4) AS containment
      FROM c WHERE containment >= 0.8 ORDER BY batch_id, corpus_id"""

  /** d30: prefix-filter candidate volume under the frozen (even-half)
    * vs fresh (whole-corpus) df order — Σ_s prefixCount·fullCount from
    * per-shingle histograms, the same closed form the Spark side prices
    * (no pair materialized in either engine) — folded into ONE policy
    * row: both volumes, their ratio, and the rebuild verdict at the
    * derived 2× threshold (`Dedup.DriftRebuildRatio`). The empty floor
    * is (0, 0, 0, 1.0, 0) in both engines.
    */
  private val OrderDriftSql: String = ShingleCtesSql + s""",
      dfz AS (SELECT s, count(*) AS df FROM sh WHERE doc_id % 2 = 0 GROUP BY 1),
      dff AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
      posz AS (
        SELECT sh.doc_id, sh.s,
          row_number() OVER (PARTITION BY sh.doc_id
            ORDER BY coalesce(d.df, 0), sh.s) - 1 AS j,
          count(*) OVER (PARTITION BY sh.doc_id) AS n
        FROM sh LEFT JOIN dfz d USING (s)),
      posf AS (
        SELECT sh.doc_id, sh.s,
          row_number() OVER (PARTITION BY sh.doc_id
            ORDER BY d.df, sh.s) - 1 AS j,
          count(*) OVER (PARTITION BY sh.doc_id) AS n
        FROM sh JOIN dff d USING (s)),
      volz AS (
        SELECT coalesce(sum(pcnt), 0) AS prefix_rows,
          coalesce(sum(pcnt * fcnt), 0) AS candidate_rows
        FROM (SELECT s, count(*) AS fcnt,
                sum(CASE WHEN j < n - ceil(n * 0.8 - 0.000000001) + 1
                    THEN 1 ELSE 0 END) AS pcnt
              FROM posz GROUP BY 1)),
      volf AS (
        SELECT coalesce(sum(pcnt), 0) AS prefix_rows,
          coalesce(sum(pcnt * fcnt), 0) AS candidate_rows
        FROM (SELECT s, count(*) AS fcnt,
                sum(CASE WHEN j < n - ceil(n * 0.8 - 0.000000001) + 1
                    THEN 1 ELSE 0 END) AS pcnt
              FROM posf GROUP BY 1))
      , ratio AS (
        SELECT CAST(volf.prefix_rows AS BIGINT) AS prefix_rows,
          CAST(volz.candidate_rows AS BIGINT) AS frozen_candidate_rows,
          CAST(volf.candidate_rows AS BIGINT) AS fresh_candidate_rows,
          CASE WHEN volf.candidate_rows = 0 AND volz.candidate_rows = 0
                 THEN CAST(1.0 AS DOUBLE)
               WHEN volf.candidate_rows = 0
                 THEN round(greatest(
                   CAST(${graft.operators.Dedup.DriftRebuildRatio} AS DOUBLE),
                   CAST(volz.candidate_rows AS DOUBLE)), 4)
               ELSE round(CAST(volz.candidate_rows AS DOUBLE) /
                          CAST(volf.candidate_rows AS DOUBLE), 4)
          END AS drift_ratio
        FROM volz, volf)
      SELECT prefix_rows, frozen_candidate_rows, fresh_candidate_rows,
        drift_ratio,
        CAST(CASE WHEN drift_ratio >=
          ${graft.operators.Dedup.DriftRebuildRatio} THEN 1 ELSE 0 END
          AS BIGINT) AS rebuild_recommended
      FROM ratio"""

  /** d11: the same exact-Jaccard contract restricted to
    * batch(odd)×corpus(even) pairs — LSH banding is recall machinery,
    * verified output is exact (same reasoning as d3 sharing d2's oracle).
    */
  private val IncrementalDedupSql: String = ShingleCtesSql + """,
      pairs AS (
        SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s
          AND a.doc_id % 2 <> 0 AND b.doc_id % 2 = 0
        GROUP BY 1, 2),
      j AS (
        SELECT batch_id, corpus_id,
          shared / (ca.n + cb.n - shared) AS jaccard
        FROM pairs
        JOIN cnt ca ON ca.doc_id = batch_id
        JOIN cnt cb ON cb.doc_id = corpus_id)
      SELECT batch_id, corpus_id, round(jaccard, 4) AS jaccard
      FROM j WHERE jaccard >= 0.8 ORDER BY batch_id, corpus_id"""
}
