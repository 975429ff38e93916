package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, Corpus, Dedup, Filters, Multimodal, Similarity, TextAnalysis, TimeSeries}
import graft.streaming.StreamingStats
import graft.queries.{RefOracle, RefQueries}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears here as a named
  * query over the shared fixtures, with (where SQL-expressible) a DuckDB
  * oracle that must hash-match.
  */
object SparkEntry {

  /** Flagship query (the pipeline's daily-stats aggregation, SURVEY §2.9)
    * on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.statsDaily(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_overview" -> (RefQueries.q01Overview _),
    "q02_top_posts" -> (RefQueries.q02TopPosts _),
    "q03_by_hour" -> (RefQueries.q03ByHour _),
    "q04_by_weekday" -> (RefQueries.q04ByWeekday _),
    "q05_active_authors" -> (RefQueries.q05ActiveAuthors _),
    "q06_content_types" -> (RefQueries.q06ContentTypes _),
    "q07_engagement" -> (RefQueries.q07Engagement _),
    "q08_comment_coverage" -> (RefQueries.q08CommentCoverage _),
    "q09_top_commenters" -> (RefQueries.q09TopCommenters _),
    "q10_daily_trends" -> (RefQueries.q10DailyTrends _),
    "q11_title_text" -> (RefQueries.q11TitleText _),
    "q12_correlation" -> (RefQueries.q12Correlation _),
    "q13_weekly" -> (RefQueries.q13Weekly _),
    "q14_quality" -> (RefQueries.q14Quality _),
    "q15_performance_view" -> (RefQueries.q15PerformanceView _),
    "stats_daily" -> (RefQueries.statsDaily _),
    "transform_posts" -> (RefQueries.transformPosts _),
    // extension tier: text analysis over the documents table
    "ta_tokens" -> (TextAnalysis.taTokens _),
    "ta_quality" -> (TextAnalysis.taQuality _),
    "ta_langid" -> (TextAnalysis.taLangId _),
    "ta_fingerprint" -> (TextAnalysis.taFingerprint _),
    "ta_keywords" -> (TextAnalysis.taKeywords _),
    "ta_rarity" -> (TextAnalysis.taRarity _),
    "ta_colloc" -> (TextAnalysis.taColloc _),
    "ta_readability" -> (TextAnalysis.taReadability _),
    "ta_ngram_lm" -> (TextAnalysis.taNgramLm _),
    "ta_ttr" -> (TextAnalysis.taTtr _),
    "ta_entropy" -> (TextAnalysis.taEntropy _),
    "ta_zipf" -> (TextAnalysis.taZipf _),
    // extension tier: deduplication family
    "dd_exact" -> (Dedup.ddExact _),
    "dd_minhash" -> (Dedup.ddMinhash _),
    "dd_minhash_lsh" -> (Dedup.ddMinhashLsh _),
    "dd_clusters" -> (Dedup.ddClusters _),
    // same semantics via large-star/small-star (adversarial-graph
    // fallback) — hash-verified against the same recursive-CTE oracle
    "dd_clusters_star" -> (Dedup.ddClustersStar _),
    "dd_simhash" -> (Dedup.ddSimhash _),
    "dd_simhash_pairs" -> (Dedup.ddSimhashPairs _),
    "dd_ngram_jaccard" -> (Dedup.ddNgramJaccard _),
    "dd_containment" -> (Dedup.ddContainment _),
    "dd_embed_cosine" -> (Dedup.ddEmbedCosine _),
    "dd_spans" -> (Dedup.ddSpans _),
    "dd_incremental" -> (Dedup.ddIncremental _),
    // extension tier: similarity search
    "sim_bruteforce_topk" -> (Similarity.simBruteforceTopk _),
    "sim_lsh_ann" -> (Similarity.simLshAnn _),
    "sim_ivf_ann" -> (Similarity.simIvfAnn _),
    "sim_quantize" -> (Similarity.simQuantize _),
    "sim_kmeans" -> (Similarity.simKmeans _),
    "sim_recall" -> (Similarity.simRecall _),
    "sim_pq" -> (Similarity.simPq _),
    "sim_mips" -> (Similarity.simMips _),
    // extension tier: multimodal columns
    "mm_ingest" -> (Multimodal.mmIngest _),
    "mm_features" -> (Multimodal.mmFeatures _),
    "mm_decode_stub" -> (Multimodal.mmDecodeStub _),
    "mm_phash" -> (Multimodal.mmPhash _),
    "mm_near_dup" -> (Multimodal.mmNearDup _),
    "mm_clusters" -> (Multimodal.mmClusters _),
    "mm_frames" -> (Multimodal.mmFrames _),
    // streaming tier: batch twin of the watermarked windowed agg,
    // plus gap-based sessionization (lag + running-flag windows)
    "ev_daily_stats" -> (StreamingStats.evDailyStats _),
    "ev_sessions" -> (StreamingStats.evSessions _),
    "ev_session_stats" -> (TimeSeries.evSessionStats _),
    "ev_rolling" -> (TimeSeries.evRolling _),
    "ev_asof" -> (TimeSeries.evAsof _),
    "ev_funnel" -> (TimeSeries.evFunnel _),
    "ev_funnel_time" -> (TimeSeries.evFunnelTime _),
    "ev_range_join" -> (TimeSeries.evRangeJoin _),
    "ev_retention" -> (TimeSeries.evRetention _),
    "ev_anomaly" -> (TimeSeries.evAnomaly _),
    "ev_mad" -> (TimeSeries.evMad _),
    "ev_forecast" -> (TimeSeries.evForecast _),
    "ev_active_users" -> (TimeSeries.evActiveUsers _),
    "ev_paths" -> (TimeSeries.evPaths _),
    // executed by the custom TopKPerGroup physical operator — the
    // oracle row hash-verifies the whole custom-plan ladder
    "ev_topk" -> (TimeSeries.evTopk _),
    "ev_json" -> (Analytics.evJson _),
    "ev_abtest" -> (Analytics.evAbtest _),
    "ev_seasonality" -> (Analytics.evSeasonality _),
    "ev_cube" -> (Analytics.evCube _),
    // extension tier: warehouse/profiling analytics
    "wh_scd2" -> (Analytics.whScd2 _),
    // incremental apply: hash-verified EQUAL to the full rebuild
    "wh_scd2_apply" -> (Analytics.whScd2Apply _),
    "wh_snapshot" -> (Analytics.whSnapshot _),
    "wh_churn" -> (Analytics.whChurn _),
    "prof_summary" -> (Analytics.profSummary _),
    // approx twin: HLL sketch, not oracle-hashable — no oracleSql
    // entry (driver records rows-only); AnalyticsSpec pins the ≤2%
    // error bound + single-scan/no-Expand plan vs the exact twin
    "prof_summary_approx" -> (Analytics.profSummaryApprox _),
    "prof_corr" -> (Analytics.profCorr _),
    "prof_hist" -> (Analytics.profHist _),
    // frequent-values profile on the custom TopKPerGroup operator
    "prof_topk" -> (Analytics.profTopk _),
    "prof_drift" -> (Analytics.profDrift _),
    "prof_mi" -> (Analytics.profMi _),
    "prof_fd" -> (Analytics.profFd _),
    "prof_moments" -> (Analytics.profMoments _),
    "prof_benford" -> (Analytics.profBenford _),
    "prof_outliers" -> (Analytics.profOutliers _),
    "wh_dq" -> (Analytics.whDq _),
    // extension tier: corpus preparation
    "cp_split" -> (Corpus.cpSplit _),
    "cp_normalize" -> (Corpus.cpNormalize _),
    "cp_pack" -> (Corpus.cpPack _),
    "cp_pack_sharded" -> (Corpus.cpPackSharded _),
    "cp_mix" -> (Corpus.cpMix _),
    "cp_decontam" -> (Corpus.cpDecontam _),
    // bloom pre-filter twin: hash-verified EQUAL to cp_decontam
    "cp_decontam_bloom" -> (Corpus.cpDecontamBloom _),
    "cp_vocab" -> (Corpus.cpVocab _),
    "cp_stats" -> (Corpus.cpStats _),
    "cp_truncation" -> (Corpus.cpTruncation _),
    // approx twin: quantile sketch, value-typed percentiles — no
    // oracleSql entry; CorpusSpec pins the rank-error contract
    "cp_stats_approx" -> (Corpus.cpStatsApprox _),
    "cp_sample" -> (Corpus.cpSample _),
    // approx twin: sketch-thresholded stratified sample — selected SET
    // equals cp_sample exactly (CorpusSpec pins it); rows-only because
    // the mechanism (approx_percentile cuts) is engine-specific
    "cp_sample_approx" -> (Corpus.cpSampleApprox _),
    "cp_curate" -> (Corpus.cpCurate _),
    // quality-priority survivor election on the custom TopK plan (k=1)
    "cp_elect" -> (Corpus.cpElect _),
    "cp_scrub_spans" -> (Corpus.cpScrubSpans _),
    "cp_shuffle" -> (Corpus.cpShuffle _),
    // extension tier: quality filtering + scrubbing
    "qf_decide" -> (Filters.qfDecide _),
    "qf_redact" -> (Filters.qfRedact _),
    "qf_repetition" -> (Filters.qfRepetition _),
    // perplexity-bracket decisions on lmCore's exact integers
    "qf_lm_filter" -> (Filters.qfLmFilter _)
  )

  def oracleSql: Map[String, String] = Map(
    "q01_overview" -> RefOracle.q01,
    "q02_top_posts" -> RefOracle.q02,
    "q03_by_hour" -> RefOracle.q03,
    "q04_by_weekday" -> RefOracle.q04,
    "q05_active_authors" -> RefOracle.q05,
    "q06_content_types" -> RefOracle.q06,
    "q07_engagement" -> RefOracle.q07,
    "q08_comment_coverage" -> RefOracle.q08,
    "q09_top_commenters" -> RefOracle.q09,
    "q10_daily_trends" -> RefOracle.q10,
    "q11_title_text" -> RefOracle.q11,
    "q12_correlation" -> RefOracle.q12,
    "q13_weekly" -> RefOracle.q13,
    "q14_quality" -> RefOracle.q14,
    "q15_performance_view" -> RefOracle.q15,
    "stats_daily" -> RefOracle.statsDaily,
    "transform_posts" -> RefOracle.transformPosts,
    "ta_tokens" -> TextAnalysis.taTokensSql,
    "ta_quality" -> TextAnalysis.taQualitySql,
    "ta_langid" -> TextAnalysis.taLangIdSql,
    "ta_fingerprint" -> TextAnalysis.taFingerprintSql,
    "ta_keywords" -> TextAnalysis.taKeywordsSql,
    "ta_rarity" -> TextAnalysis.taRaritySql,
    "ta_colloc" -> TextAnalysis.taCollocSql,
    "ta_readability" -> TextAnalysis.taReadabilitySql,
    "ta_ngram_lm" -> TextAnalysis.taNgramLmSql,
    "ta_ttr" -> TextAnalysis.taTtrSql,
    "ta_entropy" -> TextAnalysis.taEntropySql,
    "ta_zipf" -> TextAnalysis.taZipfSql,
    "dd_exact" -> Dedup.ddExactSql,
    "dd_minhash" -> Dedup.ddMinhashSql,
    "dd_minhash_lsh" -> Dedup.ddMinhashLshSql,
    "dd_clusters" -> Dedup.ddClustersSql,
    "dd_clusters_star" -> Dedup.ddClustersSql,
    "dd_simhash" -> Dedup.ddSimhashSql,
    "dd_simhash_pairs" -> Dedup.ddSimhashPairsSql,
    "dd_ngram_jaccard" -> Dedup.ddNgramJaccardSql,
    "dd_containment" -> Dedup.ddContainmentSql,
    "dd_embed_cosine" -> Dedup.ddEmbedCosineSql,
    "dd_spans" -> Dedup.ddSpansSql,
    "dd_incremental" -> Dedup.ddIncrementalSql,
    "sim_bruteforce_topk" -> Similarity.simBruteforceTopkSql,
    "sim_lsh_ann" -> Similarity.simLshAnnSql,
    "sim_ivf_ann" -> Similarity.simIvfAnnSql,
    "sim_quantize" -> Similarity.simQuantizeSql,
    "sim_kmeans" -> Similarity.simKmeansSql,
    "sim_recall" -> Similarity.simRecallSql,
    "sim_pq" -> Similarity.simPqSql,
    "sim_mips" -> Similarity.simMipsSql,
    "mm_ingest" -> Multimodal.mmIngestSql,
    "mm_features" -> Multimodal.mmFeaturesSql,
    "mm_decode_stub" -> Multimodal.mmDecodeStubSql,
    "mm_phash" -> Multimodal.mmPhashSql,
    "mm_near_dup" -> Multimodal.mmNearDupSql,
    "mm_clusters" -> Multimodal.mmClustersSql,
    "mm_frames" -> Multimodal.mmFramesSql,
    "ev_daily_stats" -> StreamingStats.evDailyStatsSql,
    "ev_sessions" -> StreamingStats.evSessionsSql,
    "ev_session_stats" -> TimeSeries.evSessionStatsSql,
    "ev_rolling" -> TimeSeries.evRollingSql,
    "ev_asof" -> TimeSeries.evAsofSql,
    "ev_funnel" -> TimeSeries.evFunnelSql,
    "ev_funnel_time" -> TimeSeries.evFunnelTimeSql,
    "ev_range_join" -> TimeSeries.evRangeJoinSql,
    "ev_retention" -> TimeSeries.evRetentionSql,
    "ev_anomaly" -> TimeSeries.evAnomalySql,
    "ev_mad" -> TimeSeries.evMadSql,
    "ev_forecast" -> TimeSeries.evForecastSql,
    "ev_active_users" -> TimeSeries.evActiveUsersSql,
    "ev_paths" -> TimeSeries.evPathsSql,
    "ev_topk" -> TimeSeries.evTopkSql,
    "ev_json" -> Analytics.evJsonSql,
    "ev_abtest" -> Analytics.evAbtestSql,
    "ev_seasonality" -> Analytics.evSeasonalitySql,
    "ev_cube" -> Analytics.evCubeSql,
    "wh_scd2" -> Analytics.whScd2Sql,
    "wh_scd2_apply" -> Analytics.whScd2ApplySql,
    "wh_snapshot" -> Analytics.whSnapshotSql,
    "wh_churn" -> Analytics.whChurnSql,
    "prof_summary" -> Analytics.profSummarySql,
    "prof_corr" -> Analytics.profCorrSql,
    "prof_hist" -> Analytics.profHistSql,
    "prof_topk" -> Analytics.profTopkSql,
    "prof_drift" -> Analytics.profDriftSql,
    "prof_mi" -> Analytics.profMiSql,
    "prof_fd" -> Analytics.profFdSql,
    "prof_moments" -> Analytics.profMomentsSql,
    "prof_benford" -> Analytics.profBenfordSql,
    "prof_outliers" -> Analytics.profOutliersSql,
    "wh_dq" -> Analytics.whDqSql,
    "cp_split" -> Corpus.cpSplitSql,
    "cp_normalize" -> Corpus.cpNormalizeSql,
    "cp_pack" -> Corpus.cpPackSql,
    "cp_pack_sharded" -> Corpus.cpPackShardedSql,
    "cp_mix" -> Corpus.cpMixSql,
    "cp_decontam" -> Corpus.cpDecontamSql,
    "cp_decontam_bloom" -> Corpus.cpDecontamBloomSql,
    "cp_vocab" -> Corpus.cpVocabSql,
    "cp_stats" -> Corpus.cpStatsSql,
    "cp_truncation" -> Corpus.cpTruncationSql,
    "cp_sample" -> Corpus.cpSampleSql,
    "cp_curate" -> Corpus.cpCurateSql,
    "cp_elect" -> Corpus.cpElectSql,
    "cp_scrub_spans" -> Corpus.cpScrubSpansSql,
    "cp_shuffle" -> Corpus.cpShuffleSql,
    "qf_decide" -> Filters.qfDecideSql,
    "qf_redact" -> Filters.qfRedactSql,
    "qf_repetition" -> Filters.qfRepetitionSql,
    "qf_lm_filter" -> Filters.qfLmFilterSql
  )
}
