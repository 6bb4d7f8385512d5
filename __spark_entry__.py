"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator family from SURVEY.md §2
(+ training-data-pipeline ops), each (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents, alias-matched
column-for-column with the Spark results.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chemharmony_spark import queries as Q  # noqa: E402

_PREPARED: set[str] = set()


def _prepare(spark: SparkSession) -> None:
    """Make any externally-created SparkSession able to run our queries:

    - time arithmetic (events ``ts`` long-nanos view, date rendering) assumes
      a UTC session timezone — pin it (runtime-settable);
    - pandas_udf/mapInPandas queries unpickle ``chemharmony_spark`` inside
      Python workers — ship the package via addPyFile so a session created
      without our PYTHONPATH still resolves it.
    """
    # applicationId is unique per SparkContext — unlike id(spark), which the
    # allocator can reuse after a stopped session is collected
    key = spark.sparkContext.applicationId
    if key in _PREPARED:
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import shutil
    import tempfile

    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "chemharmony_spark")
    zip_base = os.path.join(tempfile.gettempdir(), "chemharmony_spark_pkg")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(zip_base, "zip",
                            root_dir=os.path.dirname(pkg_dir),
                            base_dir="chemharmony_spark")
    spark.sparkContext.addPyFile(zip_path)
    _PREPARED.add(key)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _prepare(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The harmonize dataflow (the reference's headline job, 80_harmonize.py):
    canonical JSON payloads -> md5 content ids -> broadcast re-key joins ->
    global activity ids. Oracle-checked as q41.
    """
    _prepare(spark)
    return Q.q41_harmonize_shape(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _wrap(v) for k, v in _raw_queries().items()}


def _raw_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": Q.q01_pricing_summary,
        "q02_top_orders": Q.q02_top_orders,
        "q03_region_revenue": Q.q03_region_revenue,
        "q04_filter_predicates": Q.q04_filter_predicates,
        "q05_recode": Q.q05_recode,
        "q06_regex_strip_cast": Q.q06_regex_strip_cast,
        "q07_distinct": Q.q07_distinct,
        "q08_pivot_counts": Q.q08_pivot_counts,
        "q09_melt": Q.q09_melt,
        "q10_window_rownumber": Q.q10_window_rownumber,
        "q11_keep_unique_keys": Q.q11_keep_unique_keys,
        "q12_window_median": Q.q12_window_median,
        "q13_discordance": Q.q13_discordance,
        "q14_having_floor": Q.q14_having_floor,
        "q15_conditional_sum": Q.q15_conditional_sum,
        "q16_group_min_two_level": Q.q16_group_min_two_level,
        "q17_count_distinct": Q.q17_count_distinct,
        "q18_union_by_name": Q.q18_union_by_name,
        "q19_intersect_except": Q.q19_intersect_except,
        "q20_grid_negatives": Q.q20_grid_negatives,
        "q21_semi_anti_join": Q.q21_semi_anti_join,
        "q22_left_join_histogram": Q.q22_left_join_histogram,
        "q23_full_outer_consistency": Q.q23_full_outer_consistency,
        "q24_group_id_md5": Q.q24_group_id_md5,
        "q25_content_id_json": Q.q25_content_id_json,
        "q26_stratified_sample": Q.q26_stratified_sample,
        "q27_json_extract": Q.q27_json_extract,
        "q28_tumbling_window": Q.q28_tumbling_window,
        "q29_sessionize": Q.q29_sessionize,
        "q30_dedup_exact": Q.q30_dedup_exact,
        "q31_text_quality": Q.q31_text_quality,
        "q32_langid": Q.q32_langid,
        "q33_fingerprint_rollup": Q.q33_fingerprint_rollup,
        "q34_minhash_signatures": Q.q34_minhash_signatures,
        "q35_lsh_band_counts": Q.q35_lsh_band_counts,
        "q36_jaccard_near_dups": Q.q36_jaccard_near_dups,
        "q37_simhash": Q.q37_simhash,
        "q38_cosine_topk": Q.q38_cosine_topk,
        "q39_multimodal_meta": Q.q39_multimodal_meta,
        "q40_ann_lsh": Q.q40_ann_lsh,
        "q41_harmonize_shape": Q.q41_harmonize_shape,
        "q42_median_binarize": Q.q42_median_binarize,
        "q43_balanced_class_floor": Q.q43_balanced_class_floor,
        "q44_char_ngram_jaccard": Q.q44_char_ngram_jaccard,
        "q45_simhash_hamming": Q.q45_simhash_hamming,
        "q46_embedding_near_dups": Q.q46_embedding_near_dups,
        "q47_ann_ivf": Q.q47_ann_ivf,
        "q48_winnowing_fingerprints": Q.q48_winnowing_fingerprints,
        "q49_corpus_curation": Q.q49_corpus_curation,
        "q50_asof_join": Q.q50_asof_join,
        "q51_range_join": Q.q51_range_join,
        "q52_repetition_filters": Q.q52_repetition_filters,
        "q53_grouped_topk": Q.q53_grouped_topk,
        "q54_rollup": Q.q54_rollup,
        "q55_doc_chunking": Q.q55_doc_chunking,
        "q56_sequence_packing": Q.q56_sequence_packing,
        "q57_centroid_outliers": Q.q57_centroid_outliers,
        "q58_grouped_percentiles": Q.q58_grouped_percentiles,
        "q59_funnel": Q.q59_funnel,
        "q60_cohort_retention": Q.q60_cohort_retention,
        "q61_pii_redaction": Q.q61_pii_redaction,
        "q62_containment_dedup": Q.q62_containment_dedup,
        "q63_heavy_hitters": Q.q63_heavy_hitters,
        "q64_tfidf": Q.q64_tfidf,
        "q65_small_quantity_revenue": Q.q65_small_quantity_revenue,
        "q66_exists_anti_pattern": Q.q66_exists_anti_pattern,
        "q67_hash_sample": Q.q67_hash_sample,
        "q68_bigram_lm_quality": Q.q68_bigram_lm_quality,
        "q69_dedup_clusters": Q.q69_dedup_clusters,
        "q70_scd2_history": Q.q70_scd2_history,
        "q71_rolling_stats": Q.q71_rolling_stats,
        "q72_rank_family": Q.q72_rank_family,
        "q73_first_last_events": Q.q73_first_last_events,
        "q74_grouping_sets": Q.q74_grouping_sets,
        "q75_typed_json_parse": Q.q75_typed_json_parse,
        "q76_resample_forward_fill": Q.q76_resample_forward_fill,
        "q77_edit_distance_rerank": Q.q77_edit_distance_rerank,
        "q78_calendar_rollup": Q.q78_calendar_rollup,
        "q79_media_near_dups": Q.q79_media_near_dups,
        "q80_corpus_splits": Q.q80_corpus_splits,
        "q81_winsorize": Q.q81_winsorize,
        "q82_prefix_filter_join": Q.q82_prefix_filter_join,
        "q83_weighted_sample": Q.q83_weighted_sample,
        "q84_value_histogram": Q.q84_value_histogram,
        "q85_asof_forward": Q.q85_asof_forward,
        "q86_grouped_regression": Q.q86_grouped_regression,
        "q87_token_entropy": Q.q87_token_entropy,
        "q88_streaks": Q.q88_streaks,
        "q89_majority_vote": Q.q89_majority_vote,
        "q90_cube": Q.q90_cube,
        "q91_markov_transitions": Q.q91_markov_transitions,
        "q92_chisq_contingency": Q.q92_chisq_contingency,
        "q93_keep_best_dedup": Q.q93_keep_best_dedup,
        "q94_inverted_index": Q.q94_inverted_index,
        "q95_quantile_binning": Q.q95_quantile_binning,
        "q96_snapshot_diff": Q.q96_snapshot_diff,
        "q97_max_concurrency": Q.q97_max_concurrency,
        "q98_decayed_popularity": Q.q98_decayed_popularity,
        "q99_path_trigrams": Q.q99_path_trigrams,
        "q100_profile_table": Q.q100_profile_table,
        "q101_wow_growth": Q.q101_wow_growth,
        "q102_bloom_pruned_join": Q.q102_bloom_pruned_join,
        "q103_basket_pairs": Q.q103_basket_pairs,
        "q104_funnel": Q.q104_funnel,
        "q105_triangle_count": Q.q105_triangle_count,
        "q106_rfm_segments": Q.q106_rfm_segments,
        "q107_mad_outliers": Q.q107_mad_outliers,
        "q108_skew_profile": Q.q108_skew_profile,
        "q109_pmi_pairs": Q.q109_pmi_pairs,
        "q110_constraint_audit": Q.q110_constraint_audit,
        "q111_incremental_agg": Q.q111_incremental_agg,
        "q112_pagerank": Q.q112_pagerank,
        "q113_decontamination": Q.q113_decontamination,
        "q114_mixture_sample": Q.q114_mixture_sample,
        "q115_semantic_cluster_dedup": Q.q115_semantic_cluster_dedup,
        "q116_edit_distance_join": Q.q116_edit_distance_join,
        "q117_rollup_revenue": Q.q117_rollup_revenue,
        "q118_pareto_frontier": Q.q118_pareto_frontier,
        "q119_twap": Q.q119_twap,
        "q120_group_auc": Q.q120_group_auc,
        "q121_calibration_bins": Q.q121_calibration_bins,
        "q122_merge_upsert": Q.q122_merge_upsert,
        "q123_dedup_pipeline": Q.q123_dedup_pipeline,
        "q124_last_touch_attribution": Q.q124_last_touch_attribution,
        "q125_quantile_normalize": Q.q125_quantile_normalize,
        "q126_kcore": Q.q126_kcore,
        "q127_psi_drift": Q.q127_psi_drift,
        "q128_model_metrics": Q.q128_model_metrics,
        "q129_entity_resolution": Q.q129_entity_resolution,
        "q130_cohort_retention": Q.q130_cohort_retention,
        "q131_weighted_median": Q.q131_weighted_median,
        "q132_grouped_mode": Q.q132_grouped_mode,
        "q133_inactivity_gaps": Q.q133_inactivity_gaps,
        "q134_bm25_topk": Q.q134_bm25_topk,
        "q135_dsir_weights": Q.q135_dsir_weights,
        "q136_split_leakage_audit": Q.q136_split_leakage_audit,
        "q137_hopping_window": Q.q137_hopping_window,
        "q138_ohlc_bars": Q.q138_ohlc_bars,
        "q139_cusum_alarms": Q.q139_cusum_alarms,
        "q140_jsd_source_similarity": Q.q140_jsd_source_similarity,
        "q141_scd2_intervals": Q.q141_scd2_intervals,
        "q142_rrf_fusion": Q.q142_rrf_fusion,
        "q143_interpolation_resample": Q.q143_interpolation_resample,
        "q144_cumulative_distinct": Q.q144_cumulative_distinct,
        "q145_percentile_cont": Q.q145_percentile_cont,
        "q146_label_propagation": Q.q146_label_propagation,
        "q147_seasonal_baseline": Q.q147_seasonal_baseline,
        "q148_hhi_concentration": Q.q148_hhi_concentration,
        "q149_embedding_moments": Q.q149_embedding_moments,
        "q150_interval_merge": Q.q150_interval_merge,
        "q151_topk_with_others": Q.q151_topk_with_others,
        "q152_ab_test": Q.q152_ab_test,
        "q153_benford_digits": Q.q153_benford_digits,
        "q154_knn_classify": Q.q154_knn_classify,
        "q155_degree_powerlaw": Q.q155_degree_powerlaw,
        "q156_trend_forecast": Q.q156_trend_forecast,
        "q157_funnel_latency": Q.q157_funnel_latency,
        "q158_user_features": Q.q158_user_features,
        "q159_langid_confusion": Q.q159_langid_confusion,
        "q160_lsh_recall_audit": Q.q160_lsh_recall_audit,
        "q161_ks_test": Q.q161_ks_test,
        "q162_rare_category_collapse": Q.q162_rare_category_collapse,
        "q163_k_anonymity": Q.q163_k_anonymity,
        "q164_media_dedup_clusters": Q.q164_media_dedup_clusters,
        "q165_cross_perplexity": Q.q165_cross_perplexity,
        "q166_vocab_overlap": Q.q166_vocab_overlap,
        "q167_item_similarity": Q.q167_item_similarity,
        "q168_link_prediction": Q.q168_link_prediction,
        "q169_readability": Q.q169_readability,
        "q170_duplicate_payments": Q.q170_duplicate_payments,
        "q171_cycle_time": Q.q171_cycle_time,
        "q172_boilerplate_lines": Q.q172_boilerplate_lines,
        "q173_window_funnel": Q.q173_window_funnel,
        "q174_pareto_8020": Q.q174_pareto_8020,
        "q175_zscore_normalize": Q.q175_zscore_normalize,
        "q176_rolling_active_users": Q.q176_rolling_active_users,
        "q177_association_rules": Q.q177_association_rules,
        "q178_ewma_smoothing": Q.q178_ewma_smoothing,
        "q179_lsh_bucket_skew": Q.q179_lsh_bucket_skew,
        "q180_cohort_ltv": Q.q180_cohort_ltv,
        "q181_zipf_fit": Q.q181_zipf_fit,
        "q182_cross_source_dups": Q.q182_cross_source_dups,
        "q183_gini_index": Q.q183_gini_index,
        "q184_mann_whitney": Q.q184_mann_whitney,
        "q185_kaplan_meier": Q.q185_kaplan_meier,
        "q186_clustering_coefficient": Q.q186_clustering_coefficient,
        "q187_proration": Q.q187_proration,
        "q188_autocorrelation": Q.q188_autocorrelation,
        "q189_lexical_diversity": Q.q189_lexical_diversity,
        "q190_throttle_dedup": Q.q190_throttle_dedup,
        "q191_g2_collocations": Q.q191_g2_collocations,
        "q192_max_drawdown": Q.q192_max_drawdown,
        "q193_weekday_anova": Q.q193_weekday_anova,
        "q194_fano_burstiness": Q.q194_fano_burstiness,
        "q195_sequential_patterns": Q.q195_sequential_patterns,
        "q196_session_stats": Q.q196_session_stats,
        "q197_lloyd_iteration": Q.q197_lloyd_iteration,
        "q198_bfs_distance": Q.q198_bfs_distance,
        "q199_sorted_neighborhood": Q.q199_sorted_neighborhood,
        "q200_degree_assortativity": Q.q200_degree_assortativity,
        "q201_theil_sen": Q.q201_theil_sen,
        "q202_skipgram_pmi": Q.q202_skipgram_pmi,
        "q203_reco_precision": Q.q203_reco_precision,
        "q204_hill_estimator": Q.q204_hill_estimator,
        "q205_seasonal_decomposition": Q.q205_seasonal_decomposition,
        "q206_time_in_state": Q.q206_time_in_state,
        "q207_lateness_audit": Q.q207_lateness_audit,
        "q208_markov_stationary": Q.q208_markov_stationary,
        "q209_modularity": Q.q209_modularity,
        "q210_golden_record": Q.q210_golden_record,
        "q211_bloom_fpp": Q.q211_bloom_fpp,
        "q212_revenue_recognition": Q.q212_revenue_recognition,
        "q213_quantile_shift": Q.q213_quantile_shift,
        "q214_source_balancing": Q.q214_source_balancing,
        "q215_peak_detection": Q.q215_peak_detection,
        "q216_simpson_reversal": Q.q216_simpson_reversal,
        "q217_tfidf_keywords": Q.q217_tfidf_keywords,
        "q218_outlier_ensemble": Q.q218_outlier_ensemble,
        "q219_knee_point": Q.q219_knee_point,
        "q220_range_bounds": Q.q220_range_bounds,
        "q221_ess_weights": Q.q221_ess_weights,
        "q222_audience_overlap": Q.q222_audience_overlap,
        "q223_price_volume_decomposition": Q.q223_price_volume_decomposition,
        "q224_backlog_curve": Q.q224_backlog_curve,
        "q225_new_vs_returning": Q.q225_new_vs_returning,
        "q226_power_analysis": Q.q226_power_analysis,
        "q227_shingle_originality": Q.q227_shingle_originality,
        "q228_milestone_timing": Q.q228_milestone_timing,
        "q229_learning_curve": Q.q229_learning_curve,
        "q230_silhouette": Q.q230_silhouette,
        "q231_dedup_impact": Q.q231_dedup_impact,
        "q232_ndcg": Q.q232_ndcg,
        "q233_spearman": Q.q233_spearman,
        "q234_kendall_tau": Q.q234_kendall_tau,
        "q235_cohens_kappa": Q.q235_cohens_kappa,
        "q236_mutual_information": Q.q236_mutual_information,
        "q237_littles_law": Q.q237_littles_law,
        "q238_forecast_backtest": Q.q238_forecast_backtest,
        "q239_threshold_sensitivity": Q.q239_threshold_sensitivity,
        "q240_weekly_median_trend": Q.q240_weekly_median_trend,
        "q241_retention_halflife": Q.q241_retention_halflife,
        "q242_cuped": Q.q242_cuped,
        "q243_bootstrap_ci": Q.q243_bootstrap_ci,
        "q244_segment_migration": Q.q244_segment_migration,
        "q245_calendar_anomalies": Q.q245_calendar_anomalies,
        "q246_purchase_cadence": Q.q246_purchase_cadence,
        "q247_inequality_trend": Q.q247_inequality_trend,
        "q248_hll_distinct": Q.q248_hll_distinct,
        "q249_countmin_heavy": Q.q249_countmin_heavy,
        "q250_interval_overlap_join": Q.q250_interval_overlap_join,
        "q251_power_iteration": Q.q251_power_iteration,
        "q252_mrr_waterfall": Q.q252_mrr_waterfall,
        "q253_frame_sampling": Q.q253_frame_sampling,
        "q254_l_diversity": Q.q254_l_diversity,
        "q255_fifo_matching": Q.q255_fifo_matching,
        "q256_holt_linear": Q.q256_holt_linear,
        "q257_rolling_regression_slope": Q.q257_rolling_regression_slope,
        "q258_mutual_nearest_neighbors": Q.q258_mutual_nearest_neighbors,
        "q259_minibatch_assignment": Q.q259_minibatch_assignment,
        "q260_truncation_audit": Q.q260_truncation_audit,
        "q261_neardup_diff_tokens": Q.q261_neardup_diff_tokens,
        "q262_salted_skew_join": Q.q262_salted_skew_join,
        "q263_bigram_coverage": Q.q263_bigram_coverage,
        "q264_kadane_revenue_window": Q.q264_kadane_revenue_window,
        "q265_weighted_jaccard": Q.q265_weighted_jaccard,
        "q266_lsh_cost_estimator": Q.q266_lsh_cost_estimator,
        "q267_diff_in_diff": Q.q267_diff_in_diff,
        "q268_compaction_planner": Q.q268_compaction_planner,
        "q269_zorder_audit": Q.q269_zorder_audit,
        "q270_user_entropy": Q.q270_user_entropy,
        "q271_fk_integrity_sweep": Q.q271_fk_integrity_sweep,
        "q272_share_of_parent": Q.q272_share_of_parent,
        "q273_dedup_bias_audit": Q.q273_dedup_bias_audit,
        "q274_order_fill_rate": Q.q274_order_fill_rate,
        "q275_oov_audit": Q.q275_oov_audit,
        "q276_supplier_concentration": Q.q276_supplier_concentration,
        "q277_result_fingerprint": Q.q277_result_fingerprint,
        "q278_qlm_dirichlet": Q.q278_qlm_dirichlet,
        "q279_blocking_quality": Q.q279_blocking_quality,
        "q280_changepoint_binseg": Q.q280_changepoint_binseg,
        "q281_join_cardinality_estimate": Q.q281_join_cardinality_estimate,
        "q282_dawid_skene_step": Q.q282_dawid_skene_step,
        "q283_rbo_rankings": Q.q283_rbo_rankings,
        "q284_neyman_allocation": Q.q284_neyman_allocation,
        "q285_source_minhash_union": Q.q285_source_minhash_union,
        "q286_markov_accuracy": Q.q286_markov_accuracy,
        "q287_t_closeness": Q.q287_t_closeness,
        "q288_sax_motifs": Q.q288_sax_motifs,
        "q289_position_attribution": Q.q289_position_attribution,
        "q290_eb_shrinkage": Q.q290_eb_shrinkage,
        "q291_holt_winters": Q.q291_holt_winters,
        "q292_hmm_forward": Q.q292_hmm_forward,
        "q293_ecod_outliers": Q.q293_ecod_outliers,
        "q294_bm25_prf": Q.q294_bm25_prf,
        "q295_absorbing_conversion": Q.q295_absorbing_conversion,
        "q296_negative_sampling": Q.q296_negative_sampling,
        "q297_bpe_first_merges": Q.q297_bpe_first_merges,
        "q298_ransac_line": Q.q298_ransac_line,
        "q299_nucleus_vocab": Q.q299_nucleus_vocab,
        "q300_hll_set_algebra": Q.q300_hll_set_algebra,
        "q301_embedding_homophily": Q.q301_embedding_homophily,
        "q302_chi2_keywords": Q.q302_chi2_keywords,
        "q303_woe_iv": Q.q303_woe_iv,
        "q304_sort_key_advisor": Q.q304_sort_key_advisor,
        "q305_ndv_correlation": Q.q305_ndv_correlation,
        "q306_ktruss_support": Q.q306_ktruss_support,
        "q307_heavy_hitter_churn": Q.q307_heavy_hitter_churn,
        "q308_shuffle_cost_model": Q.q308_shuffle_cost_model,
        "q309_loo_target_encoding": Q.q309_loo_target_encoding,
        "q310_hard_negative_mining": Q.q310_hard_negative_mining,
        "q311_markov_entropy_rate": Q.q311_markov_entropy_rate,
        "q312_fellegi_sunter": Q.q312_fellegi_sunter,
        "q313_dedup_threshold_f1": Q.q313_dedup_threshold_f1,
        "q314_late_data_impact": Q.q314_late_data_impact,
        "q315_kcenter_seeds": Q.q315_kcenter_seeds,
        "q316_ranker_agreement": Q.q316_ranker_agreement,
        "q317_char_entropy_budget": Q.q317_char_entropy_budget,
        "q318_wasserstein_drift": Q.q318_wasserstein_drift,
        "q319_quantile_treatment_effect": Q.q319_quantile_treatment_effect,
        "q320_heaps_law": Q.q320_heaps_law,
        "q321_mmr_rerank": Q.q321_mmr_rerank,
        "q322_wilson_interval": Q.q322_wilson_interval,
        "q323_srm_guardrail": Q.q323_srm_guardrail,
        "q324_topic_coherence": Q.q324_topic_coherence,
        "q325_mix_shift_decomposition": Q.q325_mix_shift_decomposition,
        "q326_chao1_richness": Q.q326_chao1_richness,
        "q327_mcnemar_model_compare": Q.q327_mcnemar_model_compare,
        "q328_fleiss_kappa": Q.q328_fleiss_kappa,
        "q329_log_odds_keywords": Q.q329_log_odds_keywords,
        "q330_covariate_balance_smd": Q.q330_covariate_balance_smd,
        "q331_ips_offpolicy": Q.q331_ips_offpolicy,
        "q332_info_gain_screening": Q.q332_info_gain_screening,
        "q333_brier_decomposition": Q.q333_brier_decomposition,
        "q334_conformal_calibration": Q.q334_conformal_calibration,
        "q335_map_at_k": Q.q335_map_at_k,
        "q336_burrows_delta": Q.q336_burrows_delta,
        "q337_cochran_armitage": Q.q337_cochran_armitage,
        "q338_propensity_strata_ate": Q.q338_propensity_strata_ate,
        "q339_jackknife_ratio_se": Q.q339_jackknife_ratio_se,
        "q340_shapley_attribution": Q.q340_shapley_attribution,
        "q341_logrank_test": Q.q341_logrank_test,
        "q342_chatterjee_xi": Q.q342_chatterjee_xi,
        "q343_mantel_haenszel": Q.q343_mantel_haenszel,
        "q344_theil_decomposition": Q.q344_theil_decomposition,
        "q345_minhash_error_audit": Q.q345_minhash_error_audit,
        "q346_fs_em_step": Q.q346_fs_em_step,
        "q347_consistent_hash_moves": Q.q347_consistent_hash_moves,
        "q348_ucb1_arms": Q.q348_ucb1_arms,
        "q349_token_fertility": Q.q349_token_fertility,
        "q350_threshold_percolation": Q.q350_threshold_percolation,
        "q351_cdc_chunk_dedup": Q.q351_cdc_chunk_dedup,
        "q352_hits_scores": Q.q352_hits_scores,
        "q353_simhash_bit_balance": Q.q353_simhash_bit_balance,
        "q354_coec_position_bias": Q.q354_coec_position_bias,
        "q355_topk_stability": Q.q355_topk_stability,
        "q356_quality_gate_funnel": Q.q356_quality_gate_funnel,
        "q357_peeking_audit": Q.q357_peeking_audit,
        "q358_partition_advisor": Q.q358_partition_advisor,
        "q359_auc_delong_ci": Q.q359_auc_delong_ci,
        "q360_bernstein_bound": Q.q360_bernstein_bound,
        "q361_kish_ess": Q.q361_kish_ess,
        "q362_qini_uplift": Q.q362_qini_uplift,
        "q363_feature_hash_collisions": Q.q363_feature_hash_collisions,
        "q364_topical_outliers": Q.q364_topical_outliers,
        "q365_pinball_loss": Q.q365_pinball_loss,
        "q366_lincoln_petersen": Q.q366_lincoln_petersen,
        "q367_catalog_coverage": Q.q367_catalog_coverage,
        "q368_positivity_overlap": Q.q368_positivity_overlap,
        "q369_box_pierce": Q.q369_box_pierce,
        "q370_pr_auc": Q.q370_pr_auc,
        "q371_hash_uniformity_ks": Q.q371_hash_uniformity_ks,
        "q372_cramers_v": Q.q372_cramers_v,
        "q373_kruskal_wallis": Q.q373_kruskal_wallis,
        "q374_bh_fdr": Q.q374_bh_fdr,
        "q375_page_hinkley": Q.q375_page_hinkley,
        "q376_bradley_terry": Q.q376_bradley_terry,
        "q377_yules_k": Q.q377_yules_k,
        "q378_sprt": Q.q378_sprt,
        "q379_brown_forsythe": Q.q379_brown_forsythe,
        "q380_fairness_gaps": Q.q380_fairness_gaps,
        "q381_pacf": Q.q381_pacf,
        "q382_cochrans_q": Q.q382_cochrans_q,
        "q383_cliffs_delta": Q.q383_cliffs_delta,
        "q384_runs_test": Q.q384_runs_test,
        "q385_kupiec_pof": Q.q385_kupiec_pof,
        "q386_hurst_rs": Q.q386_hurst_rs,
        "q387_join_strategy_advisor": Q.q387_join_strategy_advisor,
        "q388_price_elasticity": Q.q388_price_elasticity,
        "q389_fisher_price_index": Q.q389_fisher_price_index,
        "q390_kneser_ney_continuation": Q.q390_kneser_ney_continuation,
        "q391_gumbel_block_maxima": Q.q391_gumbel_block_maxima,
        "q392_session_timeout_sensitivity":
            Q.q392_session_timeout_sensitivity,
        "q393_negbin_fit": Q.q393_negbin_fit,
        "q394_taylors_law": Q.q394_taylors_law,
        "q395_term_burstiness": Q.q395_term_burstiness,
        "q396_v_measure": Q.q396_v_measure,
        "q397_permutation_test": Q.q397_permutation_test,
        "q398_partial_correlation": Q.q398_partial_correlation,
        "q399_weibull_fit": Q.q399_weibull_fit,
        "q400_source_loo_value": Q.q400_source_loo_value,
        "q401_youden_j": Q.q401_youden_j,
        "q402_mcc": Q.q402_mcc,
        "q403_stump_split": Q.q403_stump_split,
        "q404_friedman_test": Q.q404_friedman_test,
        "q405_ipf_raking_step": Q.q405_ipf_raking_step,
        "q406_ngram_novelty_decay": Q.q406_ngram_novelty_decay,
        "q407_forecast_mase": Q.q407_forecast_mase,
        "q408_two_way_anova": Q.q408_two_way_anova,
        "q409_mann_kendall": Q.q409_mann_kendall,
        "q410_jarque_bera": Q.q410_jarque_bera,
        "q411_bowker_symmetry": Q.q411_bowker_symmetry,
        "q412_haar_energy": Q.q412_haar_energy,
        "q413_granger_lite": Q.q413_granger_lite,
        "q414_mood_scale": Q.q414_mood_scale,
        "q415_vif": Q.q415_vif,
        "q416_durbin_watson": Q.q416_durbin_watson,
        "q417_cooks_distance": Q.q417_cooks_distance,
        "q418_krippendorff_binary": Q.q418_krippendorff_binary,
        "q419_xbar_r_chart": Q.q419_xbar_r_chart,
        "q420_holm_bonferroni": Q.q420_holm_bonferroni,
        "q421_tail_dependence": Q.q421_tail_dependence,
        "q422_pps_systematic": Q.q422_pps_systematic,
        "q423_lognormal_fit": Q.q423_lognormal_fit,
        "q424_abc_xyz": Q.q424_abc_xyz,
        "q425_interrupted_ts": Q.q425_interrupted_ts,
        "q426_icc_design_effect": Q.q426_icc_design_effect,
        "q427_histogram_bin_advisor": Q.q427_histogram_bin_advisor,
        "q428_by_fdr": Q.q428_by_fdr,
        "q429_gains_curve": Q.q429_gains_curve,
        "q430_chow_test": Q.q430_chow_test,
        "q431_distribution_overlap": Q.q431_distribution_overlap,
        "q432_meta_fixed_effect": Q.q432_meta_fixed_effect,
        "q433_dominant_period": Q.q433_dominant_period,
        "q434_rake_keywords": Q.q434_rake_keywords,
        "q435_weekday_strength": Q.q435_weekday_strength,
        "q436_xcorr_peak": Q.q436_xcorr_peak,
        "q437_calibration_slope": Q.q437_calibration_slope,
        "q438_msttr": Q.q438_msttr,
        "q439_end_digit_bias": Q.q439_end_digit_bias,
        "q440_interorder_burstiness": Q.q440_interorder_burstiness,
        "q441_crk_concentration": Q.q441_crk_concentration,
        "q442_median_polish": Q.q442_median_polish,
        "q443_theil_u2": Q.q443_theil_u2,
        "q444_lorenz_asymmetry": Q.q444_lorenz_asymmetry,
        "q445_hoover_index": Q.q445_hoover_index,
        "q446_atkinson2": Q.q446_atkinson2,
        "q447_middle_band_share": Q.q447_middle_band_share,
        "q448_mad_outliers": Q.q448_mad_outliers,
        "q449_llr_collocations": Q.q449_llr_collocations,
        "q450_ngram_overlap_decay": Q.q450_ngram_overlap_decay,
        "q451_split_balance_audit": Q.q451_split_balance_audit,
        "q452_vocab_overlap_matrix": Q.q452_vocab_overlap_matrix,
        "q453_int8_quantization_audit": Q.q453_int8_quantization_audit,
        "q454_knn_hubness": Q.q454_knn_hubness,
        "q455_pq_distortion_audit": Q.q455_pq_distortion_audit,
    }


_DEC = "DECIMAL(18,2)"
_DISC = "(CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))"
_REV = f"CAST(SUM(CAST(l_extendedprice AS {_DEC}) * {_DISC}) AS DOUBLE)"

# shared text-normalization fragments (must mirror operators/text.py exactly)
# explicit [ \t\n\r] whitespace class, mirroring operators/text.py
# normalize_text exactly (regex \\s differs between Java and RE2 on \\x0B)
_NORM = ("trim(regexp_replace(regexp_replace(lower(text),"
         " '[^a-z0-9 \t\n\r]', '', 'g'), '[ \t\n\r]+', ' ', 'g'))")
_TOKS = f"list_filter(string_split({_NORM}, ' '), x -> x != '')"
_HEXV = "(instr('0123456789abcdef', {c}) - 1)"

# RBO@50 geometric tail weights as a DuckDB list literal; repr() round-trips
# each Python float to the identical IEEE double on parse
_RBO_TAIL_SQL = "[" + ", ".join(repr(v) for v in Q._RBO_TAIL) + "]"


_LANGID_CTES = f"""
            t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            scores AS (
              SELECT doc_id,
                list_contains(toks,'der')::INT + list_contains(toks,'und')::INT
                  + list_contains(toks,'die')::INT + list_contains(toks,'nicht')::INT AS de,
                list_contains(toks,'the')::INT + list_contains(toks,'and')::INT
                  + list_contains(toks,'of')::INT + list_contains(toks,'is')::INT AS en,
                list_contains(toks,'el')::INT + list_contains(toks,'los')::INT
                  + list_contains(toks,'que')::INT + list_contains(toks,'de')::INT AS es,
                list_contains(toks,'le')::INT + list_contains(toks,'les')::INT
                  + list_contains(toks,'des')::INT + list_contains(toks,'est')::INT AS fr,
                list_contains(toks,'de')::INT + list_contains(toks,'shi')::INT
                  + list_contains(toks,'le')::INT + list_contains(toks,'bu')::INT AS zh
              FROM t),
            longf AS (
              SELECT doc_id, lang, score
              FROM scores UNPIVOT (score FOR lang IN (de, en, es, fr, zh))),
            lpred AS (
              SELECT doc_id,
                     CASE WHEN score > 0 THEN lang ELSE 'und' END
                       AS pred_lang,
                     score AS pred_score FROM longf
              QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, lang) = 1)
"""


_AHASH_PAIRS_SQL = """
            WITH codes AS (
              SELECT doc_id,
                     [ord(substr(text, p, 1))
                      for p in generate_series(1, length(text))] AS cs,
                     length(text) AS n
              FROM documents),
            sums AS (
              SELECT doc_id, cs, n,
                     CAST(list_aggregate(cs, 'sum') AS BIGINT) AS total
              FROM codes WHERE n > 0),
            -- np.array_split semantics: first (n % 64) cells get an extra
            -- element; cell i (0-based) starts at i*q + least(i, r)
            hashes AS (
              SELECT doc_id,
                     CAST(list_aggregate(
                       [CASE WHEN (CASE WHEN i < (n % 64)
                                        THEN (n // 64) + 1
                                        ELSE (n // 64) END) > 0
                                  AND CAST(COALESCE(list_aggregate(
                                        cs[(i * (n // 64) + least(i, n % 64) + 1):
                                           (i * (n // 64) + least(i, n % 64)
                                            + (CASE WHEN i < (n % 64)
                                                    THEN (n // 64) + 1
                                                    ELSE (n // 64) END))],
                                        'sum'), 0) AS HUGEINT) * n
                                      > CAST(total AS HUGEINT)
                                        * (CASE WHEN i < (n % 64)
                                                THEN (n // 64) + 1
                                                ELSE (n // 64) END)
                             THEN CAST(1 AS HUGEINT) << (63 - i)
                             ELSE CAST(0 AS HUGEINT) END
                        for i in generate_series(0, 63)], 'sum') AS HUGEINT)
                       AS uval
              FROM sums),
            signed AS (
              SELECT doc_id,
                     CAST(CASE WHEN uval >= CAST(1 AS HUGEINT) << 63
                               THEN uval - (CAST(1 AS HUGEINT) << 64)
                               ELSE uval END AS BIGINT) AS ahash
              FROM hashes)
            SELECT l.doc_id AS a, r.doc_id AS b,
                   CAST(bit_count(xor(l.ahash, r.ahash)) AS INTEGER)
                     AS hamming
            FROM signed l JOIN signed r ON l.doc_id < r.doc_id
            WHERE bit_count(xor(l.ahash, r.ahash)) <= 10
"""


def _pcont_expr(name: str, num: int, den: int) -> str:
    """SQL for one exact continuous percentile over the `ranked` CTE
    (columns rn, n, value) — mirrors operators.core.grouped_percentile_cont:
    lo = 1 + (n-1)*num div den, frac = ((n-1)*num % den) / den, linear
    interpolation between the bracketing row ranks."""
    lo = f"(1 + (((n - 1) * {num}) // {den}))"
    hi = f"least({lo} + 1, n)"
    v_lo = f"MIN(CASE WHEN rn = {lo} THEN value END)"
    v_hi = f"MIN(CASE WHEN rn = {hi} THEN value END)"
    frac = f"(CAST(MIN(((n - 1) * {num}) % {den}) AS DOUBLE) / {den}.0)"
    return f"({v_lo} + ({v_hi} - {v_lo}) * {frac}) AS {name}"


def _hex4(expr: str, start: int) -> str:
    """SQL for int value of 4 hex chars of md5 expr at 1-based ``start``."""
    parts = [
        f"{_HEXV.format(c=f'substr({expr}, {start + i}, 1)')} * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(parts) + ")"


# mutual-nearest-neighbor pair CTE chain (shared by q258 and the q301
# homophily audit; mirrors the q258 triangle-block argmax pipeline)
_MNN_CTES = """
            dv AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS l
              FROM embeddings),
            nrm AS MATERIALIZED (
              SELECT vec_id, l,
                     sqrt(list_reduce(list_transform(l, x -> x * x),
                                      (a, b) -> a + b)) AS nn
              FROM dv),
            pairs AS MATERIALIZED (
              SELECT a.vec_id AS a, b.vec_id AS b,
                     list_reduce(
                       [a.l[i] * b.l[i]
                        for i in generate_series(1, len(a.l))],
                       (x, y) -> x + y) / (a.nn * b.nn) AS sim
              FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id),
            both_ AS (
              SELECT a AS node, b AS nbr, sim FROM pairs
              UNION ALL
              SELECT b AS node, a AS nbr, sim FROM pairs),
            best AS (
              SELECT node, nbr AS best_nbr, sim FROM (
                SELECT node, nbr, sim,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY sim DESC, nbr) AS rn
                FROM both_)
              WHERE rn = 1),
            mnn AS (
              SELECT f.node AS a, f.best_nbr AS b, f.sim
              FROM best f JOIN best r
                ON r.node = f.best_nbr AND r.best_nbr = f.node
              WHERE f.node < f.best_nbr)
"""

# winnowing-containment pair CTE chain (shared by q62 and the q69
# cluster rollup; mirrors operators/text.py::winnowing_fingerprints with
# k=5, w=4 and the q62 containment >= 0.6 gate)
_CONTAIN_CTES = f"""
            g AS (
              SELECT doc_id, source, norm, length(norm) AS L
              FROM (SELECT doc_id, source, {_NORM} AS norm FROM documents)),
            h AS (
              SELECT doc_id, source,
                     list_transform(range(1, L - 5 + 2),
                       i -> {_hex4("md5(substr(norm, i, 5))", 1)}) AS hashes
              FROM g),
            m AS MATERIALIZED (
              SELECT doc_id, source,
                     CASE WHEN len(hashes) >= 4 THEN
                       list_sort(list_distinct(
                         list_transform(range(1, len(hashes) - 4 + 2),
                           j -> list_aggregate(hashes[j:j+3], 'min'))))
                     WHEN len(hashes) >= 1 THEN
                       [list_aggregate(hashes, 'min')]
                     ELSE [] END AS fps
              FROM h),
            ex AS MATERIALIZED (SELECT doc_id, source, unnest(fps) AS f FROM m),
            shared AS (
              SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_shared
              FROM ex a JOIN ex b
                ON a.f = b.f AND a.source = b.source AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            sizes AS (SELECT doc_id, CAST(len(fps) AS INTEGER) AS nf FROM m),
            cpairs AS MATERIALIZED (
              SELECT da, db, n_shared, sa.nf AS nf_a, sb.nf AS nf_b,
                     greatest(n_shared / sa.nf, n_shared / sb.nf) AS containment
              FROM shared
              JOIN sizes sa ON sa.doc_id = da
              JOIN sizes sb ON sb.doc_id = db
              WHERE greatest(n_shared / sa.nf, n_shared / sb.nf) >= 0.6)
"""

_SIG_SQL = f"""
    SELECT doc_id AS id, band,
           MIN(md5(band::VARCHAR || ':' || shingle)) AS minhash
    FROM (
      SELECT doc_id, unnest(shingles) AS shingle FROM (
        SELECT doc_id,
               CASE WHEN len(toks) >= 3
                    THEN list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    ELSE [] END AS shingles
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents))),
      (SELECT unnest([0, 1, 2, 3]) AS band)
    GROUP BY doc_id, band
"""


def _pagerank_sql(iters: int = 4) -> str:
    """Unrolled-CTE PageRank matching queries.q112_pagerank: 4 fixed
    iterations of pure-integer micro-unit updates (rank div degree,
    85%-damped sum), so the trajectory is bit-identical to the Spark loop.
    Unrolled because the recursive term would need a GROUP BY; with a
    fixed iteration count the chain of CTEs IS the ANSI spelling."""
    ctes = [
        "b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """e0 AS MATERIALIZED (
          SELECT a.l_partkey AS p1, c.l_partkey AS p2
          FROM b a JOIN b c
            ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2)""",
        """sym AS (SELECT p1, p2 FROM e0
                   UNION ALL SELECT p2 AS p1, p1 AS p2 FROM e0)""",
        """deg AS (SELECT p1 AS node, CAST(COUNT(*) AS BIGINT) AS deg
                   FROM sym GROUP BY 1)""",
        "nodes AS (SELECT node FROM deg)",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)",
    ]
    for k in range(iters):
        ctes.append(f"""c{k} AS (
          SELECT e.p2 AS node, SUM(r.r // d.deg) AS s
          FROM sym e
          JOIN r{k} r ON r.node = e.p1
          JOIN deg d ON d.node = e.p1
          GROUP BY 1)""")
        ctes.append(f"""r{k + 1} AS (
          SELECT n.node,
                 CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT)
                   AS r
          FROM nodes n LEFT JOIN c{k} c ON c.node = n.node)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank_micro FROM r{iters} ORDER BY node"
    )


def _lpa_ctes(iters: int = 3) -> str:
    """CTE block for deterministic label propagation (final labels in
    ``l{iters}``) — shared by q146 and the q209 modularity oracle."""
    ctes = [
        "b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """e0 AS MATERIALIZED (
          SELECT a.l_partkey AS p1, c.l_partkey AS p2
          FROM b a JOIN b c
            ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2)""",
        """sym AS MATERIALIZED (SELECT p1, p2 FROM e0
                   UNION ALL SELECT p2 AS p1, p1 AS p2 FROM e0)""",
        "l0 AS (SELECT DISTINCT p1 AS node, p1 AS lbl FROM sym)",
    ]
    for k in range(iters):
        ctes.append(f"""n{k} AS (
          SELECT s.p1 AS node, l.lbl, COUNT(*) AS n
          FROM sym s JOIN l{k} l ON l.node = s.p2
          GROUP BY 1, 2)""")
        ctes.append(f"""l{k + 1} AS MATERIALIZED (
          SELECT node, lbl FROM n{k}
          QUALIFY ROW_NUMBER() OVER (PARTITION BY node
                                     ORDER BY n DESC, lbl) = 1)""")
    return ",\n".join(ctes)


def _lpa_sql(iters: int = 3) -> str:
    """Unrolled-CTE deterministic label propagation matching
    queries.q146_label_propagation: per round each node takes the most
    frequent neighbor label, smallest label on ties — integer counts +
    a fixed tie-break, so the trajectory replays exactly."""
    return (
        "WITH " + _lpa_ctes(iters)
        + f"\nSELECT node, lbl FROM l{iters} ORDER BY node"
    )


def _knn_curve_sql() -> str:
    """Per-fraction 5-NN accuracy mirroring q229_learning_curve: the q38
    cosine fold + vote/pick windows, repeated for the 25/50/100% modulo
    train subsets and UNION ALL'd."""
    parts = [
        """e AS MATERIALIZED (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
                  label
           FROM embeddings)""",
        """q AS (SELECT vec_id AS qid, v AS qv, label AS true_label
                 FROM e WHERE vec_id < 50)""",
    ]
    finals = []
    for pct, cond in ((25, "vec_id % 4 = 1"),
                      (50, "vec_id % 4 IN (1, 2)"),
                      (100, "TRUE")):
        t = f"t{pct}"
        parts.append(
            f"""{t} AS MATERIALIZED (
               SELECT vec_id, v, label FROM e
               WHERE vec_id >= 50 AND ({cond}))"""
        )
        parts.append(
            f"""s{pct} AS (
               SELECT qid, true_label, {t}.vec_id AS nid,
                      {t}.label AS nlabel,
                      list_reduce(list_transform(list_zip(qv, v),
                                                 x -> x[1] * x[2]),
                                  (a, b) -> a + b)
                      / (sqrt(list_reduce(list_transform(qv, x -> x * x),
                                          (a, b) -> a + b))
                         * sqrt(list_reduce(list_transform(v, x -> x * x),
                                            (a, b) -> a + b))) AS sim
               FROM q, {t})"""
        )
        parts.append(
            f"""k{pct} AS (
               SELECT qid, true_label, nlabel FROM s{pct}
               QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY sim DESC, nid) <= 5)"""
        )
        parts.append(
            f"""v{pct} AS (
               SELECT qid, true_label, nlabel, COUNT(*) AS votes
               FROM k{pct} GROUP BY 1, 2, 3)"""
        )
        parts.append(
            f"""p{pct} AS (
               SELECT qid, true_label, nlabel AS pred_label FROM v{pct}
               QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY votes DESC, nlabel) = 1)"""
        )
        finals.append(
            f"""SELECT {pct} AS frac_pct,
                   (SELECT COUNT(*) FROM {t}) AS n_train,
                   COUNT(*) AS n_queries,
                   CAST(SUM(CASE WHEN pred_label = true_label
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_correct,
                   CAST(SUM(CASE WHEN pred_label = true_label
                                 THEN 1 ELSE 0 END) * 1000000
                        // COUNT(*) AS BIGINT) AS acc_ppm
            FROM p{pct}"""
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(finals)


def _stationary_sql(iters: int = 8) -> str:
    """Unrolled integer power iteration matching q208_markov_stationary:
    ppm transition matrix + ``iters`` truncating-div steps."""
    ctes = [
        """ev AS (SELECT user_id, event_id, event_type,
                         epoch_us(ts) AS us FROM events)""",
        """seq AS (SELECT event_type AS src,
                          LEAD(event_type) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS dst
                   FROM ev)""",
        """trans AS MATERIALIZED (
           SELECT src, dst,
                  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY src)
                       AS BIGINT) AS p_ppm
           FROM (SELECT src, dst, COUNT(*) AS n FROM seq
                 WHERE dst IS NOT NULL GROUP BY 1, 2))""",
        """d0 AS (SELECT DISTINCT src AS s,
                   CAST(1000000 // (SELECT COUNT(DISTINCT src) FROM trans)
                        AS BIGINT) AS d_ppm
                  FROM trans)""",
    ]
    for k in range(iters):
        ctes.append(f"""d{k + 1} AS MATERIALIZED (
          SELECT dst AS s,
                 CAST(SUM(d_ppm * p_ppm) // 1000000 AS BIGINT) AS d_ppm
          FROM trans JOIN d{k} ON d{k}.s = trans.src GROUP BY 1)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT s AS event_type, d_ppm AS stationary_ppm FROM d{iters}"
    )


def _pq_oracle(dims=64, n_subspaces=8, n_codes=16, iters=2, quant=1 << 20):
    """Mirror similarity.pq_compress(trainer='lloyd') + the q455 audit in
    DuckDB: md5-sampled seeds, per-iteration (argmin by squared-L2 fold
    with (d2, code) tie-break; integer-quantized exact mean update),
    final assignment d2 doubles as the per-subspace reconstruction SSE
    (identical IEEE fold to the Spark zip_with over reconstructed
    slices)."""
    sub_len = dims // n_subspaces
    qd = repr(float(quant))
    dist = ("list_reduce(list_transform(list_zip(t.sub, c.cent), "
            "p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b)")

    def arms(src, out):
        return " UNION ALL ".join(
            f"SELECT vec_id, {s} AS subspace,"
            f" (v)[{s * sub_len + 1}:{(s + 1) * sub_len}] AS {out} FROM {src}"
            for s in range(n_subspaces)
        )

    def assign(cb):
        return (
            f"SELECT vec_id, subspace, sub, code, d2 FROM ("
            f" SELECT t.vec_id, t.subspace, t.sub, c.code, {dist} AS d2,"
            f" ROW_NUMBER() OVER (PARTITION BY t.vec_id, t.subspace"
            f" ORDER BY {dist}, c.code) AS rn"
            f" FROM subs t JOIN {cb} c ON t.subspace = c.subspace)"
            f" WHERE rn = 1"
        )

    sums = ", ".join(
        f"SUM(CAST(trunc(sub[{i + 1}] * {qd}) AS BIGINT)) AS s{i}"
        for i in range(sub_len)
    )
    comps = ", ".join(
        f"CAST(s{i} AS DOUBLE) / n / {qd}" for i in range(sub_len)
    )
    ctes = [
        "e AS MATERIALIZED (SELECT vec_id,"
        " list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)",
        f"sd AS (SELECT vec_id, v FROM e"
        f" ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_codes})",
        f"subs AS MATERIALIZED ({arms('e', 'sub')})",
        f"c0 AS (SELECT subspace, CAST(vec_id AS BIGINT) AS code,"
        f" sub AS cent FROM ({arms('sd', 'sub')}))",
    ]
    for it in range(1, iters + 1):
        ctes.append(f"a{it} AS ({assign(f'c{it - 1}')})")
        ctes.append(
            f"u{it} AS (SELECT subspace, code, COUNT(*) AS n, {sums}"
            f" FROM a{it} GROUP BY 1, 2)"
        )
        ctes.append(
            f"c{it} AS (SELECT subspace, code, [{comps}] AS cent FROM u{it})"
        )
    ctes.append(f"af AS MATERIALIZED ({assign(f'c{iters}')})")
    ctes.append(
        "sse AS (SELECT subspace,"
        " CAST(floor(CAST(CAST(SUM(CAST(floor(d2 * 1000000000.0) AS BIGINT))"
        " AS BIGINT) AS DOUBLE) / 1000) AS BIGINT) AS sse_micro_total"
        " FROM af GROUP BY 1)"
    )
    ctes.append(
        "use_ AS (SELECT subspace, code, CAST(COUNT(*) AS BIGINT) AS cnt"
        " FROM af GROUP BY 1, 2)"
    )
    ctes.append(
        "cu AS (SELECT subspace, MAX(cnt) AS modal_n,"
        " CAST(SUM(cnt) AS BIGINT) AS n_vec,"
        " CAST(COUNT(*) AS BIGINT) AS codes_used FROM use_ GROUP BY 1)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT subspace, sse_micro_total, codes_used,"
          " CAST(modal_n * 1000000 // n_vec AS BIGINT) AS modal_share_ppm"
          " FROM sse JOIN cu USING (subspace)"
    )


def _kmeans_oracle(dims: int = 64, n_cells: int = 8, iters: int = 2,
                   quant: int = 1 << 20, threshold: float = 0.25) -> str:
    """Mirror similarity.lloyd_kmeans + cluster_pruned_pairs (q115):
    md5-sampled seeds, per-iteration (assign by squared-L2 fold with
    (dist, cell_id) tie-break; update = integer-quantized exact mean),
    then in-cell cosine pairs. Every step is the same IEEE/integer
    arithmetic the Spark plan performs, so values hash-match."""
    dist = ("list_reduce(list_transform(list_zip(e.v, c.cent), "
            "p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b)")

    def assign(cent_cte: str) -> str:
        return (
            f"SELECT vec_id, v, cell_id FROM ("
            f" SELECT e.vec_id, e.v, c.cell_id,"
            f" ROW_NUMBER() OVER (PARTITION BY e.vec_id"
            f" ORDER BY {dist}, c.cell_id) AS rn"
            f" FROM e, {cent_cte} c) WHERE rn = 1"
        )

    sums = ", ".join(
        f"SUM(CAST(trunc(v[{i + 1}] * {quant}.0) AS BIGINT)) AS s{i}"
        for i in range(dims)
    )
    comps = ", ".join(
        f"CAST(s{i} AS DOUBLE) / n / {quant}.0" for i in range(dims)
    )
    ctes = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v"
        " FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cell_id, v AS cent FROM e"
        f" ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_cells})",
    ]
    for it in range(1, iters + 1):
        ctes.append(f"a{it} AS ({assign(f'c{it - 1}')})")
        ctes.append(
            f"u{it} AS (SELECT cell_id, COUNT(*) AS n, {sums}"
            f" FROM a{it} GROUP BY cell_id)"
        )
        ctes.append(f"c{it} AS (SELECT cell_id, [{comps}] AS cent FROM u{it})")
    ctes.append(f"af AS ({assign(f'c{iters}')})")
    dot = ("list_reduce(list_transform(list_zip(x.v, y.v),"
           " p -> p[1] * p[2]), (a, b) -> a + b)")
    nrm = ("sqrt(list_reduce(list_transform({s}.v, q -> q * q),"
           " (a, b) -> a + b))")
    cos = f"{dot} / ({nrm.format(s='x')} * {nrm.format(s='y')})"
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT cell_id, a, b, sim FROM (
          SELECT x.cell_id, x.vec_id AS a, y.vec_id AS b, {cos} AS sim
          FROM af x JOIN af y
            ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id)
        WHERE sim >= {threshold}"""
    )


# BY-FDR harmonic constant: H_25 in nanos — the same driver-side Python
# expression queries.q428_by_fdr evaluates, so both engines compare against
# the identical integer literal
_H25_NANO = int(sum(1.0 / i for i in range(1, 26)) * 1_000_000_000)


def _q397_sql() -> str:
    """64 md5-salted pseudo-permutations as conditional sums in ONE
    aggregate — mirrors queries.q397_permutation_test expression for
    expression (parity of the first md5 hex char selects the null
    group)."""
    n_perm = 64
    cols = []
    for i in range(n_perm):
        g = (f"((instr('0123456789abcdef', substr(md5('p{i}:' || "
             f"CAST(o_custkey AS VARCHAR)), 1, 1)) - 1) % 2)")
        cols.append(
            f"CAST(SUM(CASE WHEN {g} = 1 THEN cents END) AS BIGINT)"
            f" AS s{i}"
        )
        cols.append(
            f"CAST(SUM(CASE WHEN {g} = 1 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS n{i}"
        )
    def dm(s1, n1):
        return (
            f"CAST(floor(abs(CAST({s1} AS DOUBLE)"
            f" / CAST({n1} AS DOUBLE)"
            f" - CAST(s_all - {s1} AS DOUBLE)"
            f" / CAST(n_all - {n1} AS DOUBLE)) / 100.0 * 1000000)"
            f" AS BIGINT)"
        )
    ge = " + ".join(
        f"(CASE WHEN {dm(f's{i}', f'n{i}')} >= {dm('s_obs', 'n_obs')}"
        f" THEN 1 ELSE 0 END)"
        for i in range(n_perm)
    )
    wide_cols = ",\n                   ".join(cols)
    return f"""
        WITH cust AS (
          SELECT c_custkey,
                 CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                   AS g
          FROM customer
          WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        obs AS (
          SELECT g, o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents
          FROM orders o JOIN cust c ON o.o_custkey = c.c_custkey),
        wide AS (
          SELECT CAST(SUM(CASE WHEN g = 1 THEN cents END) AS BIGINT)
                   AS s_obs,
                 CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_obs,
                 CAST(SUM(cents) AS BIGINT) AS s_all,
                 CAST(COUNT(*) AS BIGINT) AS n_all,
                   {wide_cols}
          FROM obs)
        SELECT n_all AS n,
               {dm('s_obs', 'n_obs')} AS obs_diff_micro,
               ({ge}) AS n_null_ge,
               CAST(floor((({ge}) + 1) * 1000000 / 65) AS BIGINT)
                 AS p_micro
        FROM wide
    """



def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": f"""
            SELECT *, sum_qty / count_order AS avg_qty FROM (
              SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_base_price,
                {_REV} AS sum_disc_price,
                COUNT(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus)
        """,
        "q02_top_orders": f"""
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                   {_REV} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "q03_region_revenue": f"""
            SELECT r_name, n_name, {_REV} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "q04_filter_predicates": f"""
            SELECT l_returnflag, COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS qty
            FROM lineitem
            WHERE l_returnflag IN ('A','R')
              AND l_quantity BETWEEN 10 AND 20
              AND l_shipdate IS NOT NULL
            GROUP BY l_returnflag
        """,
        "q05_recode": """
            SELECT CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled'
                        WHEN 'P' THEN 'pending' ELSE 'other' END AS status,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        """,
        "q06_regex_strip_cast": """
            SELECT CAST(regexp_replace(o_orderpriority, '[^0-9]', '', 'g') AS DOUBLE)
                     AS prio_num,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        """,
        "q07_distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "q08_pivot_counts": """
            SELECT o_orderpriority,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
            FROM orders GROUP BY o_orderpriority
        """,
        "q09_melt": f"""
            SELECT metric, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS total
            FROM (
              SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', l_extendedprice FROM lineitem
              UNION ALL
              SELECT 'l_discount', l_discount FROM lineitem
            ) WHERE value IS NOT NULL
            GROUP BY metric
        """,
        "q10_window_rownumber": """
            SELECT o_custkey, o_orderkey, rn FROM (
              SELECT o_custkey, o_orderkey,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey) AS rn
              FROM orders)
            WHERE rn <= 3
        """,
        "q11_keep_unique_keys": """
            SELECT o_custkey, o_orderkey FROM (
              SELECT o_custkey, o_orderkey,
                     COUNT(*) OVER (PARTITION BY o_custkey) AS c
              FROM orders)
            WHERE c = 1
        """,
        "q12_window_median": """
            SELECT l_partkey, median(l_quantity) AS med_qty
            FROM lineitem GROUP BY l_partkey
        """,
        "q13_discordance": """
            SELECT l_partkey, MIN(l_returnflag) AS flag, COUNT(*) AS n
            FROM lineitem GROUP BY l_partkey
            HAVING COUNT(DISTINCT l_returnflag) = 1
        """,
        "q14_having_floor": """
            SELECT l_partkey, COUNT(*) AS n FROM lineitem
            GROUP BY l_partkey HAVING COUNT(*) > 320
        """,
        "q15_conditional_sum": """
            SELECT l_returnflag,
                   COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_hi_disc,
                   COUNT(*) FILTER (WHERE l_discount <= 0.05) AS n_lo_disc
            FROM lineitem GROUP BY l_returnflag
        """,
        "q16_group_min_two_level": """
            SELECT l_partkey, MIN(cnt) AS mincnt FROM (
              SELECT l_partkey, l_returnflag, COUNT(*) AS cnt
              FROM lineitem GROUP BY l_partkey, l_returnflag)
            GROUP BY l_partkey
        """,
        "q17_count_distinct": """
            SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS nsupp
            FROM lineitem GROUP BY l_partkey
        """,
        "q18_union_by_name": """
            SELECT bucket, COUNT(*) AS n FROM (
              SELECT o_orderkey, 'open' AS bucket FROM orders WHERE o_orderstatus = 'O'
              UNION ALL
              SELECT o_orderkey, 'filled' FROM orders WHERE o_orderstatus = 'F')
            GROUP BY bucket
        """,
        "q19_intersect_except": """
            SELECT nk, 'both' AS op FROM (
              SELECT c_nationkey AS nk FROM customer
              INTERSECT SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT nk, 'cust_only' AS op FROM (
              SELECT c_nationkey AS nk FROM customer
              EXCEPT SELECT s_nationkey FROM supplier)
        """,
        "q20_grid_negatives": """
            WITH obs AS (
              SELECT n_name, o_orderstatus, COUNT(*) AS n
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name, o_orderstatus),
            grid AS (
              SELECT n_name, o_orderstatus
              FROM (SELECT DISTINCT n_name FROM nation),
                   (SELECT DISTINCT o_orderstatus FROM orders))
            SELECT g.n_name, g.o_orderstatus, COALESCE(obs.n, 0) AS n
            FROM grid g LEFT JOIN obs USING (n_name, o_orderstatus)
        """,
        "q21_semi_anti_join": """
            SELECT 'with_orders' AS bucket, COUNT(*) AS n FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            UNION ALL
            SELECT 'without_orders', COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "q22_left_join_histogram": """
            SELECT n_orders, COUNT(*) AS n_customers FROM (
              SELECT COALESCE(cnt, 0) AS n_orders
              FROM customer
              LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt
                         FROM orders GROUP BY o_custkey) o
                ON c_custkey = o.o_custkey)
            GROUP BY n_orders
        """,
        "q23_full_outer_consistency": """
            SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
                   COALESCE(ncust, 0) AS ncust, COALESCE(nsupp, 0) AS nsupp
            FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS ncust
                  FROM customer GROUP BY 1) c
            FULL OUTER JOIN
                 (SELECT s_nationkey AS nationkey, COUNT(*) AS nsupp
                  FROM supplier GROUP BY 1) s
            USING (nationkey)
        """,
        "q24_group_id_md5": """
            SELECT l_returnflag, l_linestatus,
                   md5(concat_ws(chr(31), COALESCE(l_returnflag, ''),
                                  COALESCE(l_linestatus, ''))) AS gid
            FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
        """,
        "q25_content_id_json": """
            SELECT p_partkey, data, md5(data) AS cid FROM (
              SELECT p_partkey,
                     to_json(struct_pack(p_brand := p_brand, p_size := p_size,
                                         p_type := p_type))::VARCHAR AS data
              FROM part)
        """,
        "q26_stratified_sample": """
            SELECT l_returnflag, l_orderkey, l_linenumber FROM (
              SELECT l_returnflag, l_orderkey, l_linenumber,
                     ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY md5(concat_ws('|', COALESCE(l_orderkey::VARCHAR, ''),
                                    COALESCE(l_linenumber::VARCHAR, '')))) AS rn
              FROM lineitem)
            WHERE rn <= 5
        """,
        "q27_json_extract": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   MIN(k) AS min_k, MAX(k) AS max_k
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
                  FROM events)
            GROUP BY event_type
        """,
        "q28_tumbling_window": f"""
            SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
                   event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "q29_sessionize": """
            WITH flagged AS (
              SELECT user_id, ts,
                     CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                            OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            numbered AS (
              SELECT user_id,
                     SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM flagged)
            SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM numbered GROUP BY user_id
        """,
        "q30_dedup_exact": f"""
            SELECT fp, MIN(id) AS keeper_id, COUNT(*) AS n_docs FROM (
              SELECT doc_id AS id, md5({_NORM}) AS fp FROM documents)
            GROUP BY fp
        """,
        "q31_text_quality": f"""
            SELECT doc_id, n_tokens, n_chars_obs, alnum_ratio,
                   CASE WHEN n_tokens > 0 THEN
                     list_reduce(list_transform(toks, x -> len(x)),
                                 (a, b) -> a + b) / n_tokens
                   END AS avg_token_len,
                   n_bpe_tokens
            FROM (
              SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n_tokens,
                     length(text) AS n_chars_obs,
                     CASE WHEN length(text) > 0 THEN
                       length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                         / length(text) END AS alnum_ratio,
                     CAST(len(regexp_extract_all(
                       text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                       AS INTEGER) AS n_bpe_tokens
              FROM documents)
        """,
        "q32_langid": f"""
            WITH {_LANGID_CTES}
            SELECT doc_id, pred_lang, pred_score FROM lpred
        """,
        "q33_fingerprint_rollup": f"""
            SELECT source, COUNT(*) AS n_docs,
                   COUNT(DISTINCT md5({_NORM})) AS n_fingerprints
            FROM documents GROUP BY source
        """,
        "q34_minhash_signatures": _SIG_SQL,
        "q35_lsh_band_counts": f"""
            WITH sig AS ({_SIG_SQL}),
            pairs AS (
              SELECT DISTINCT l.band, l.id AS a, r.id AS b
              FROM sig l JOIN sig r
                ON l.band = r.band AND l.minhash = r.minhash AND l.id < r.id)
            SELECT band, COUNT(*) AS n_pairs FROM pairs GROUP BY band
        """,
        "q36_jaccard_near_dups": f"""
            WITH sig AS ({_SIG_SQL}),
            cands AS (
              SELECT DISTINCT l.id AS a, r.id AS b
              FROM sig l JOIN sig r
                ON l.band = r.band AND l.minhash = r.minhash AND l.id < r.id),
            words AS (
              SELECT DISTINCT doc_id AS id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            sizes AS (SELECT id, COUNT(*) AS nw FROM words GROUP BY id),
            inter AS (
              SELECT a, b, COUNT(*) AS n_inter
              FROM cands
              JOIN words wa ON wa.id = a
              JOIN words wb ON wb.id = b AND wb.word = wa.word
              GROUP BY a, b)
            SELECT a, b, n_inter, sa.nw AS na, sb.nw AS nb,
                   n_inter / (sa.nw + sb.nw - n_inter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.id = a
            JOIN sizes sb ON sb.id = b
            ORDER BY jaccard DESC, a, b
            LIMIT 20
        """,
        "q37_simhash": f"""
            WITH words AS (
              SELECT DISTINCT doc_id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            h AS (SELECT doc_id, {_hex4("md5(word)", 1)} AS h16 FROM words),
            bits AS (
              SELECT doc_id, j,
                     SUM(((h16 // CAST(power(2, j) AS BIGINT)) % 2) * 2 - 1) AS s
              FROM h, (SELECT unnest(range(0, 16)) AS j)
              GROUP BY doc_id, j)
            SELECT doc_id AS id,
                   CAST(SUM(CASE WHEN s > 0
                                 THEN CAST(power(2, j) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id
        """,
        "q38_cosine_topk": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> x::DOUBLE) AS v
                       FROM embeddings),
            q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
            scored AS (
              SELECT qid AS query_id, e.vec_id AS neighbor_id,
                     list_reduce(list_transform(list_zip(qv, v),
                                                x -> x[1] * x[2]),
                                 (a, b) -> a + b)
                       / (sqrt(list_reduce(list_transform(qv, x -> x * x),
                                           (a, b) -> a + b))
                          * sqrt(list_reduce(list_transform(v, x -> x * x),
                                             (a, b) -> a + b))) AS sim
              FROM e, q WHERE e.vec_id != qid)
            SELECT query_id, neighbor_id, rank, sim FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "q39_multimodal_meta": f"""
            SELECT doc_id, n_bytes, width, height,
                   CASE fmt_idx WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                                WHEN 2 THEN 'webp' ELSE 'gif' END AS format
            FROM (
              SELECT doc_id,
                     CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                     CAST({_hex4("md5(text)", 1)} % 640 AS INTEGER) AS width,
                     CAST({_hex4("md5(text)", 5)} % 480 AS INTEGER) AS height,
                     {_HEXV.format(c="substr(md5(text), 9, 1)")} % 4 AS fmt_idx
              FROM documents)
        """,
        # q40/q47: approximate-NN operators, but every ingredient is
        # deterministic (md5-derived hyperplanes/centroid sample, sequential
        # left-fold float arithmetic) so DuckDB reproduces them bit-for-bit
        # the same way q38/q79 do. Recall vs brute force is additionally
        # asserted in tests/test_similarity.py.
        "q40_ann_lsh": f"""
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> x::DOUBLE) AS v
                       FROM embeddings),
            planes AS (
              SELECT p, list_transform(range(64), d ->
                       ((({_HEXV.format(c="substr(md5('p' || p || ':' || d), 1, 1)")})
                         % 2) * 2 - 1)::DOUBLE) AS coefs
              FROM (SELECT unnest(range(64)) AS p)),
            sigs AS (
              SELECT vec_id, p // 4 AS tbl,
                     string_agg(CASE WHEN dotp >= 0 THEN '1' ELSE '0' END,
                                '' ORDER BY p) AS bucket
              FROM (SELECT vec_id, p,
                           list_reduce(list_transform(list_zip(v, coefs),
                                                      x -> x[1] * x[2]),
                                       (a, b) -> a + b) AS dotp
                    FROM e CROSS JOIN planes)
              GROUP BY vec_id, p // 4),
            cand AS (
              SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
              FROM sigs q JOIN sigs c
                ON q.tbl = c.tbl AND q.bucket = c.bucket
              WHERE q.vec_id < 10 AND c.vec_id != q.vec_id),
            scored AS (
              SELECT query_id, neighbor_id,
                     list_reduce(list_transform(list_zip(eq.v, ec.v),
                                                x -> x[1] * x[2]),
                                 (a, b) -> a + b)
                       / (sqrt(list_reduce(list_transform(eq.v, x -> x * x),
                                           (a, b) -> a + b))
                          * sqrt(list_reduce(list_transform(ec.v, x -> x * x),
                                             (a, b) -> a + b))) AS sim
              FROM cand JOIN e eq ON eq.vec_id = query_id
                        JOIN e ec ON ec.vec_id = neighbor_id)
            SELECT query_id, neighbor_id, rank, sim FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "q41_harmonize_shape": """
            WITH cust AS (
              SELECT c_custkey,
                     md5(to_json(struct_pack(c_mktsegment := c_mktsegment,
                                             c_name := c_name,
                                             c_nationkey := c_nationkey))::VARCHAR)
                       AS sid
              FROM customer),
            part_t AS (
              SELECT p_partkey,
                     md5(to_json(struct_pack(p_brand := p_brand,
                                             p_size := p_size,
                                             p_type := p_type))::VARCHAR) AS pid
              FROM part),
            raw AS (
              SELECT DISTINCT o_custkey, l_partkey,
                     CASE WHEN l_returnflag = 'R' THEN 'positive'
                          ELSE 'negative' END AS value
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
            SELECT DISTINCT sid, pid, value,
                   md5(concat_ws('', sid, pid, value)) AS aid
            FROM raw
            JOIN cust ON o_custkey = c_custkey
            JOIN part_t ON l_partkey = p_partkey
        """,
        "q42_median_binarize": """
            WITH collapsed AS (
              SELECT l_suppkey, l_partkey, median(l_quantity) AS medvalue
              FROM lineitem GROUP BY l_suppkey, l_partkey),
            th AS (
              SELECT *, quantile_cont(medvalue, 0.5)
                          OVER (PARTITION BY l_partkey) AS t
              FROM collapsed)
            SELECT l_suppkey, l_partkey, medvalue,
                   CASE WHEN medvalue <= t THEN 'positive'
                        ELSE 'negative' END AS value
            FROM th
        """,
        "q43_balanced_class_floor": """
            WITH collapsed AS (
              SELECT l_suppkey, l_partkey, median(l_quantity) AS medvalue
              FROM lineitem GROUP BY l_suppkey, l_partkey),
            th AS (
              SELECT *, quantile_cont(medvalue, 0.5)
                          OVER (PARTITION BY l_partkey) AS t
              FROM collapsed),
            labeled AS (
              SELECT l_partkey,
                     CASE WHEN medvalue <= t THEN 'positive'
                          ELSE 'negative' END AS value
              FROM th),
            kept AS (
              SELECT l_partkey FROM labeled GROUP BY l_partkey
              HAVING COUNT(*) FILTER (WHERE value = 'positive') > 2
                 AND COUNT(*) FILTER (WHERE value = 'negative') > 2)
            SELECT l_partkey, COUNT(*) AS n,
                   CAST(COUNT(*) FILTER (WHERE value = 'positive') AS BIGINT)
                     AS n_pos
            FROM labeled
            WHERE l_partkey IN (SELECT l_partkey FROM kept)
            GROUP BY l_partkey
        """,
        "q44_char_ngram_jaccard": f"""
            WITH docs AS (
              SELECT doc_id, source, {_NORM} AS norm FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, source, unnest(
                list_distinct(list_transform(
                  range(1, greatest(length(norm) - 2, 0) + 1),
                  i -> substr(norm, i, 3)))) AS g
              FROM docs),
            sizes AS (SELECT doc_id, COUNT(*) AS ng FROM grams GROUP BY doc_id),
            inter AS (
              SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS n_inter
              FROM grams ga
              JOIN grams gb ON ga.source = gb.source AND ga.g = gb.g
                           AND ga.doc_id < gb.doc_id
              GROUP BY ga.doc_id, gb.doc_id)
            SELECT a, b, n_inter / (sa.ng + sb.ng - n_inter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            ORDER BY jaccard DESC, a, b
            LIMIT 10
        """,
        "q48_winnowing_fingerprints": f"""
            WITH g AS (
              SELECT doc_id, norm, length(norm) AS L
              FROM (SELECT doc_id, {_NORM} AS norm FROM documents)),
            h AS (
              SELECT doc_id,
                     list_transform(range(1, L - 5 + 2),
                       i -> {_hex4("md5(substr(norm, i, 5))", 1)}) AS hashes
              FROM g),
            m AS (
              SELECT doc_id,
                     CASE WHEN len(hashes) >= 4 THEN
                       list_sort(list_distinct(
                         list_transform(range(1, len(hashes) - 4 + 2),
                           j -> list_aggregate(hashes[j:j+3], 'min'))))
                     WHEN len(hashes) >= 1 THEN
                       [list_aggregate(hashes, 'min')]
                     ELSE [] END AS fps
              FROM h)
            SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fp,
                   fps[1] AS min_fp, fps[len(fps)] AS max_fp
            FROM m
        """,
        "q49_corpus_curation": f"""
            WITH fps AS (
              SELECT doc_id, md5({_NORM}) AS fp FROM documents),
            keepers AS (
              SELECT MIN(doc_id) AS doc_id FROM fps GROUP BY fp),
            kept AS (
              SELECT d.doc_id, d.text FROM documents d
              JOIN keepers k ON d.doc_id = k.doc_id),
            feats AS (
              SELECT doc_id, text, {_TOKS} AS toks,
                     len({_TOKS}) AS n_tokens,
                     length(text) AS n_chars_obs,
                     CASE WHEN length(text) > 0 THEN
                       length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                         / length(text) END AS alnum_ratio
              FROM kept),
            curated AS (
              SELECT * FROM feats
              WHERE n_tokens >= 10 AND alnum_ratio >= 0.8 AND n_chars_obs >= 50),
            scores AS (
              SELECT doc_id,
                list_contains(toks,'der')::INT + list_contains(toks,'und')::INT
                  + list_contains(toks,'die')::INT + list_contains(toks,'nicht')::INT AS de,
                list_contains(toks,'the')::INT + list_contains(toks,'and')::INT
                  + list_contains(toks,'of')::INT + list_contains(toks,'is')::INT AS en,
                list_contains(toks,'el')::INT + list_contains(toks,'los')::INT
                  + list_contains(toks,'que')::INT + list_contains(toks,'de')::INT AS es,
                list_contains(toks,'le')::INT + list_contains(toks,'les')::INT
                  + list_contains(toks,'des')::INT + list_contains(toks,'est')::INT AS fr,
                list_contains(toks,'de')::INT + list_contains(toks,'shi')::INT
                  + list_contains(toks,'le')::INT + list_contains(toks,'bu')::INT AS zh
              FROM curated),
            pred AS (
              SELECT doc_id,
                     CASE WHEN score > 0 THEN lang ELSE 'und' END
                       AS pred_lang
              FROM scores UNPIVOT (score FOR lang IN (de, en, es, fr, zh))
              QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, lang) = 1)
            SELECT pred_lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                   MIN(c.doc_id) AS min_doc_id
            FROM curated c JOIN pred USING (doc_id)
            GROUP BY pred_lang
        """,
        "q45_simhash_hamming": f"""
            WITH words AS (
              SELECT DISTINCT doc_id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            h AS (SELECT doc_id, {_hex4("md5(word)", 1)} AS h16 FROM words),
            bits AS (
              SELECT doc_id, j,
                     SUM(((h16 // CAST(power(2, j) AS BIGINT)) % 2) * 2 - 1) AS s
              FROM h, (SELECT unnest(range(0, 16)) AS j)
              GROUP BY doc_id, j),
            sig AS (
              SELECT b.doc_id AS id, d.source,
                     CAST(SUM(CASE WHEN s > 0
                                   THEN CAST(power(2, j) AS BIGINT)
                                   ELSE 0 END) AS BIGINT) AS simhash
              FROM bits b JOIN documents d ON d.doc_id = b.doc_id
              GROUP BY b.doc_id, d.source)
            SELECT sa.source, sa.id AS a, sb.id AS b,
                   CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER)
                     AS hamming
            FROM sig sa JOIN sig sb
              ON sa.source = sb.source AND sa.id < sb.id
            WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 6
        """,
        "q46_embedding_near_dups": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> x::DOUBLE) AS v
                       FROM embeddings),
            scored AS (
              SELECT ea.vec_id AS a, eb.vec_id AS b,
                     list_reduce(list_transform(list_zip(ea.v, eb.v),
                                                x -> x[1] * x[2]),
                                 (p, q) -> p + q)
                       / (sqrt(list_reduce(list_transform(ea.v, x -> x * x),
                                           (p, q) -> p + q))
                          * sqrt(list_reduce(list_transform(eb.v, x -> x * x),
                                             (p, q) -> p + q))) AS sim
              FROM e ea JOIN e eb ON ea.vec_id < eb.vec_id)
            SELECT a, b, sim FROM scored WHERE sim >= 0.25
        """,
        "q47_ann_ivf": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> x::DOUBLE) AS v
                       FROM embeddings),
            cents AS (
              SELECT vec_id AS cell_id, v AS centroid
              FROM e ORDER BY md5(vec_id::VARCHAR) LIMIT 16),
            csims AS (
              SELECT e.vec_id, cell_id,
                     list_reduce(list_transform(list_zip(v, centroid),
                                                x -> x[1] * x[2]),
                                 (a, b) -> a + b)
                       / (sqrt(list_reduce(list_transform(v, x -> x * x),
                                           (a, b) -> a + b))
                          * sqrt(list_reduce(list_transform(centroid, x -> x * x),
                                             (a, b) -> a + b))) AS csim
              FROM e CROSS JOIN cents),
            corpus_cells AS (
              SELECT vec_id AS neighbor_id, cell_id FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY csim DESC, cell_id) AS crank
                FROM csims)
              WHERE crank <= 3),
            query_cells AS (
              SELECT vec_id AS query_id, cell_id FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY csim DESC, cell_id) AS crank
                FROM csims WHERE vec_id < 10)
              WHERE crank <= 6),
            cand AS (
              SELECT DISTINCT query_id, neighbor_id
              FROM corpus_cells JOIN query_cells USING (cell_id)
              WHERE neighbor_id != query_id),
            scored AS (
              SELECT query_id, neighbor_id,
                     list_reduce(list_transform(list_zip(eq.v, ec.v),
                                                x -> x[1] * x[2]),
                                 (a, b) -> a + b)
                       / (sqrt(list_reduce(list_transform(eq.v, x -> x * x),
                                           (a, b) -> a + b))
                          * sqrt(list_reduce(list_transform(ec.v, x -> x * x),
                                             (a, b) -> a + b))) AS sim
              FROM cand JOIN e eq ON eq.vec_id = query_id
                        JOIN e ec ON ec.vec_id = neighbor_id)
            SELECT query_id, neighbor_id, rank, sim FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "q50_asof_join": """
            SELECT c.user_id, c.event_id, epoch_us(c.ts) AS ts,
                   c.value AS click_value,
                   epoch_us(p.ts) AS last_buy_ts,
                   p.value AS last_buy_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "q51_range_join": """
            WITH iv AS (SELECT user_id, epoch_us(ts) AS w_start,
                               epoch_us(ts) + 3600000000 AS w_end
                        FROM events WHERE event_type = 'purchase'),
                 pt AS (SELECT user_id, epoch_us(ts) AS pt, value FROM events)
            SELECT iv.user_id, iv.w_start,
                   COUNT(*) AS n_in_window, MAX(pt.value) AS max_value
            FROM pt JOIN iv
              ON pt.user_id = iv.user_id
             AND iv.w_start <= pt.pt AND pt.pt < iv.w_end
            GROUP BY 1, 2
        """,
        "q52_repetition_filters": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g AS (
              SELECT doc_id, toks,
                     CASE WHEN len(toks) >= 2 THEN
                       [array_to_string(toks[i:i+1], ' ')
                        for i in generate_series(1, len(toks) - 1)]
                     ELSE []::VARCHAR[] END AS grams
              FROM t),
            counts AS (
              SELECT doc_id, gram, COUNT(*) AS c
              FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
              GROUP BY doc_id, gram),
            tops AS (
              SELECT doc_id, MAX(c) AS top_c, COUNT(*) AS n_distinct
              FROM counts GROUP BY doc_id)
            SELECT g.doc_id,
                   len(toks) AS n_tokens,
                   len(grams) AS n_ngrams,
                   COALESCE(n_distinct, 0) AS n_distinct_ngrams,
                   COALESCE(top_c, 0) AS top_ngram_count,
                   CASE WHEN len(grams) > 0
                        THEN top_c / len(grams) END AS top_ngram_frac,
                   CASE WHEN len(grams) > 0
                        THEN (len(grams) - n_distinct) / len(grams)
                        END AS dup_ngram_frac,
                   CASE WHEN len(toks) > 0
                        THEN len(list_distinct(toks)) / len(toks)
                        END AS unique_token_ratio,
                   CASE WHEN len(toks) > 0 THEN
                     len(list_filter(toks, x -> list_contains(
                       ['a','an','and','in','is','of','the','to'], x)))
                       / len(toks) END AS stopword_ratio
            FROM g LEFT JOIN tops ON g.doc_id = tops.doc_id
        """,
        "q53_grouped_topk": """
            SELECT n_name, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (
                     PARTITION BY n_name
                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            QUALIFY rank <= 3
        """,
        "q54_rollup": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
                   COUNT(*) AS n_rows,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "q55_doc_chunking": f"""
            WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
            c AS (
              SELECT doc_id, source,
                     CASE WHEN len(toks) > 0 THEN
                       [toks[(i * 50 + 1):least((i + 1) * 50, len(toks))]
                        for i in generate_series(0, (len(toks) - 1) // 50)]
                     ELSE []::VARCHAR[][] END AS chunks
              FROM t),
            e AS (
              SELECT doc_id, source,
                     CAST(generate_subscripts(chunks, 1) - 1 AS BIGINT)
                       AS chunk_idx,
                     unnest(chunks) AS ctoks
              FROM c)
            SELECT doc_id, source, chunk_idx,
                   CAST(len(ctoks) AS INTEGER) AS n_chunk_tokens,
                   md5(array_to_string(ctoks, ' ')) AS chunk_hash
            FROM e
        """,
        "q56_sequence_packing": f"""
            WITH d AS (
              SELECT doc_id, len({_TOKS}) AS n_tokens,
                     md5(CAST(doc_id AS VARCHAR)) AS h
              FROM documents),
            cum AS (
              SELECT doc_id, n_tokens,
                     SUM(n_tokens) OVER (ORDER BY h
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM d)
            SELECT CAST(floor((cum - n_tokens) / 1000.0) AS BIGINT) AS bin,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
                   MIN(doc_id) AS min_doc_id
            FROM cum GROUP BY 1
        """,
        "q57_centroid_outliers": """
            WITH base AS (
              SELECT vec_id, label,
                     [CAST(floor(x * 1000000.0) AS BIGINT)
                      for x in list_transform(embedding, e -> CAST(e AS DOUBLE))]
                       AS qi
              FROM embeddings),
            ex AS (
              SELECT label, generate_subscripts(qi, 1) AS pos,
                     unnest(qi) AS qv
              FROM base),
            cent AS (
              SELECT label, pos, CAST(SUM(qv) AS BIGINT) AS cs
              FROM ex GROUP BY label, pos),
            carr AS (
              SELECT label, list(cs ORDER BY pos) AS cs_arr
              FROM cent GROUP BY label),
            scored AS (
              SELECT vec_id, b.label,
                     list_reduce(
                       [CAST(qi[i] AS HUGEINT) * CAST(cs_arr[i] AS HUGEINT)
                        for i in generate_series(1, len(qi))],
                       (p, q) -> p + q) AS dot,
                     list_reduce(
                       [CAST(qi[i] AS HUGEINT) * CAST(qi[i] AS HUGEINT)
                        for i in generate_series(1, len(qi))],
                       (p, q) -> p + q) AS n1,
                     list_reduce(
                       [CAST(cs_arr[i] AS HUGEINT) * CAST(cs_arr[i] AS HUGEINT)
                        for i in generate_series(1, len(cs_arr))],
                       (p, q) -> p + q) AS n2
              FROM base b JOIN carr ON b.label = carr.label)
            SELECT vec_id, label, cos_micro, cos_micro < 100000 AS is_outlier
            FROM (
              SELECT vec_id, label,
                     CAST(floor(CAST(dot AS DOUBLE)
                       / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))
                       * 1000000) AS BIGINT) AS cos_micro
              FROM scored)
        """,
        "q58_grouped_percentiles": """
            WITH ranked AS (
              SELECT event_type, value,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY value) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events)
            SELECT event_type,
                   MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                            THEN value END) AS p50,
                   MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.9 * n) AS BIGINT))
                            THEN value END) AS p90,
                   MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
                            THEN value END) AS p99
            FROM ranked GROUP BY event_type
        """,
        "q59_funnel": """
            WITH t1 AS (
              SELECT user_id, MIN(epoch_us(ts)) AS t_view
              FROM events WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (
              SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
              FROM events e JOIN t1 ON e.user_id = t1.user_id
              WHERE e.event_type = 'click' AND epoch_us(e.ts) >= t1.t_view
              GROUP BY e.user_id),
            t3 AS (
              SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
              FROM events e JOIN t2 ON e.user_id = t2.user_id
              WHERE e.event_type = 'purchase'
                AND epoch_us(e.ts) >= t2.t_click
              GROUP BY e.user_id)
            SELECT (SELECT COUNT(*) FROM t1) AS n_view,
                   (SELECT COUNT(*) FROM t2) AS n_click_after_view,
                   (SELECT COUNT(*) FROM t3) AS n_purchase_after_click
        """,
        "q60_cohort_retention": """
            WITH cohorts AS (
              SELECT user_id,
                     CAST(floor(MIN(epoch_us(ts)) / 604800000000.0) AS BIGINT)
                       AS cohort_week
              FROM events WHERE event_type = 'signup' GROUP BY user_id),
            active AS (
              SELECT user_id,
                     CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT)
                       AS week
              FROM events)
            SELECT cohort_week, week - cohort_week AS week_offset,
                   COUNT(DISTINCT a.user_id) AS n_users
            FROM active a JOIN cohorts c ON a.user_id = c.user_id
            WHERE week >= cohort_week
            GROUP BY 1, 2
        """,
        "q61_pii_redaction": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
                     AS INTEGER) AS n_email,
                   CAST(len(regexp_extract_all(text, 'https?://[^\\s]+'))
                     AS INTEGER) AS n_url,
                   CAST(len(regexp_extract_all(text,
                     '\\+?[0-9][0-9()\\- ]{7,}[0-9]')) AS INTEGER) AS n_phone,
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                     '<EMAIL>', 'g'),
                     'https?://[^\\s]+', '<URL>', 'g'),
                     '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g'))
                     AS redacted_hash
            FROM documents
        """,
        "q62_containment_dedup": f"""
            WITH {_CONTAIN_CTES}
            SELECT * FROM cpairs
        """,
        "q63_heavy_hitters": f"""
            WITH toks AS (
              SELECT source, unnest({_TOKS}) AS token FROM documents),
            counts AS (
              SELECT source, token, COUNT(*) AS n
              FROM toks GROUP BY source, token)
            SELECT source, token, n,
                   CAST(ROW_NUMBER() OVER (PARTITION BY source
                                           ORDER BY n DESC, token)
                        AS INTEGER) AS rank
            FROM counts
            QUALIFY rank <= 10
        """,
        "q64_tfidf": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
            tf AS (
              SELECT doc_id, token, COUNT(*) AS tf
              FROM toks GROUP BY doc_id, token),
            dfreq AS (
              SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
            n AS (SELECT COUNT(*) AS n_docs FROM documents)
            SELECT doc_id, token, tf, df,
                   CAST(floor(tf * ln(CAST(n_docs AS DOUBLE) / df) * 1000000)
                        AS BIGINT) AS tfidf_micro
            FROM tf JOIN dfreq USING (token), n
        """,
        "q65_small_quantity_revenue": """
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                             AS DOUBLE) / 7.0 AS avg_yearly
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#13'
              AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = p_partkey)
        """,
        "q66_exists_anti_pattern": """
            SELECT c_custkey, c_name
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
              AND NOT EXISTS (SELECT 1 FROM orders o2
                              WHERE o2.o_custkey = c.c_custkey
                                AND o2.o_orderpriority = '1-URGENT')
        """,
        "q67_hash_sample": f"""
            SELECT o_orderpriority, COUNT(*) AS n_sampled,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM (
              SELECT o_orderpriority, o_orderkey,
                     {_hex4("md5(CAST(o_orderkey AS VARCHAR))", 1)} AS h
              FROM orders)
            WHERE h < 4096
            GROUP BY o_orderpriority
        """,
        "q68_bigram_lm_quality": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(toks) >= 2 THEN
                       [{{'w1': toks[i], 'w2': toks[i+1]}}
                        for i in generate_series(1, len(toks) - 1)]
                     ELSE [] END) AS gg
              FROM t),
            pairs AS (SELECT doc_id, gg.w1 AS w1, gg.w2 AS w2 FROM g),
            c12 AS (SELECT w1, w2, COUNT(*) AS c12
                    FROM pairs GROUP BY w1, w2),
            c1 AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
            terms AS (
              SELECT doc_id,
                     CAST(floor(ln(CAST(c12.c12 AS DOUBLE)
                                   / CAST(c1.c1 AS DOUBLE)) * 1000000)
                          AS BIGINT) AS term
              FROM pairs JOIN c12 USING (w1, w2) JOIN c1 USING (w1))
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   CAST(SUM(term) AS BIGINT) AS sum_lp_micro,
                   CAST(floor(CAST(SUM(term) AS BIGINT)
                              / CAST(COUNT(*) AS BIGINT)) AS BIGINT)
                     AS avg_lp_micro
            FROM terms GROUP BY doc_id
        """,
        "q69_dedup_clusters": f"""
            WITH RECURSIVE {_CONTAIN_CTES},
            sym AS MATERIALIZED (
              SELECT da AS a, db AS b FROM cpairs
              UNION
              SELECT db AS a, da AS b FROM cpairs),
            nodes AS (SELECT DISTINCT a AS node FROM sym),
            reach AS (
              SELECT node, node AS peer FROM nodes
              UNION
              SELECT r.node, s.b AS peer
              FROM reach r JOIN sym s ON r.peer = s.a),
            comp AS (
              SELECT node, MIN(peer) AS component FROM reach GROUP BY node)
            SELECT component, COUNT(*) AS n_members,
                   md5(string_agg(CAST(node AS VARCHAR), ','
                                  ORDER BY node)) AS members_hash
            FROM comp GROUP BY component
        """,
        "q70_scd2_history": """
            WITH ev AS (
              SELECT user_id, event_type, epoch_us(ts) AS us, event_id
              FROM events),
            marked AS (
              SELECT *,
                     CASE WHEN LAG(event_type) OVER w IS NULL
                            OR LAG(event_type) OVER w <> event_type
                          THEN 1 ELSE 0 END AS chg
              FROM ev
              WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
            segged AS (
              SELECT *,
                     SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS seg
              FROM marked),
            runs AS (
              SELECT user_id, seg, MIN(event_type) AS event_type,
                     MIN(us) AS valid_from, COUNT(*) AS n_events
              FROM segged GROUP BY user_id, seg)
            SELECT user_id, CAST(seg AS BIGINT) AS seg, event_type,
                   valid_from,
                   LEAD(valid_from) OVER (PARTITION BY user_id
                                          ORDER BY valid_from) AS valid_to,
                   n_events
            FROM runs
        """,
        "q71_rolling_stats": """
            SELECT user_id, event_id,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                     AS mov_sum,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                     / COUNT(*) OVER w AS mov_avg,
                   COUNT(*) OVER w AS frame_n
            FROM (SELECT user_id, event_id, epoch_us(ts) AS us, value
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "q72_rank_family": """
            SELECT event_type, event_id,
                   RANK() OVER wv AS rnk,
                   DENSE_RANK() OVER wv AS drnk,
                   PERCENT_RANK() OVER wv AS prnk,
                   CUME_DIST() OVER wv AS cdist,
                   CAST(NTILE(4) OVER wt AS INTEGER) AS quartile
            FROM events
            WINDOW wv AS (PARTITION BY event_type ORDER BY value),
                   wt AS (PARTITION BY event_type ORDER BY value, event_id)
        """,
        "q73_first_last_events": """
            WITH per_row AS (
              SELECT user_id,
                     FIRST_VALUE(event_type) OVER w AS first_type,
                     LAST_VALUE(event_type) OVER w AS last_type,
                     NTH_VALUE(event_type, 2) OVER w AS second_type
              FROM (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
                    FROM events)
              WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND UNBOUNDED FOLLOWING))
            SELECT user_id, MIN(first_type) AS first_type,
                   MIN(last_type) AS last_type,
                   MIN(second_type) AS second_type
            FROM per_row GROUP BY user_id
        """,
        "q74_grouping_sets": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
                   COUNT(*) AS n_rows,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), (l_linestatus))
        """,
        "q75_typed_json_parse": """
            SELECT CAST(floor(k / 10.0) AS BIGINT) AS bucket,
                   COUNT(*) AS n,
                   CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_bad,
                   MIN(k) AS min_k, MAX(k) AS max_k
            FROM (SELECT CAST(json_extract_string(props, '$.k') AS INTEGER)
                           AS k
                  FROM events)
            GROUP BY bucket
        """,
        "q76_resample_forward_fill": """
            WITH ev AS (
              SELECT user_id, epoch_us(ts) AS us, value, event_id
              FROM events),
            slots AS (
              SELECT user_id, CAST(floor(us / 3600000000.0) AS BIGINT)
                       AS slot, us, value, event_id
              FROM ev),
            slot_val AS (
              SELECT user_id, slot, value AS slot_value
              FROM slots
              QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, slot
                                         ORDER BY us DESC, event_id DESC) = 1),
            span AS (
              SELECT user_id,
                     CAST(floor(MIN(us) / 3600000000.0) AS BIGINT) AS s0,
                     CAST(floor(MAX(us) / 3600000000.0) AS BIGINT) AS s1
              FROM ev GROUP BY user_id),
            grid AS (
              SELECT user_id, unnest(generate_series(s0, s1)) AS slot
              FROM span)
            SELECT g.user_id, g.slot,
                   LAST_VALUE(sv.slot_value IGNORE NULLS) OVER (
                     PARTITION BY g.user_id ORDER BY g.slot
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS filled_value,
                   sv.slot_value IS NOT NULL AS is_observed
            FROM grid g
            LEFT JOIN slot_val sv
              ON sv.user_id = g.user_id AND sv.slot = g.slot
        """,
        "q77_edit_distance_rerank": f"""
            WITH sig AS ({_SIG_SQL}),
            cands AS (
              SELECT DISTINCT l.id AS a, r.id AS b
              FROM sig l JOIN sig r
                ON l.band = r.band AND l.minhash = r.minhash AND l.id < r.id),
            norms AS (SELECT doc_id, {_NORM} AS norm FROM documents)
            SELECT a, b,
                   levenshtein(na.norm, nb.norm) AS dist,
                   CAST(length(na.norm) AS INTEGER) AS len_a,
                   CAST(length(nb.norm) AS INTEGER) AS len_b,
                   1 - levenshtein(na.norm, nb.norm)
                       / greatest(length(na.norm), length(nb.norm)) AS sim
            FROM cands
            JOIN norms na ON na.doc_id = a
            JOIN norms nb ON nb.doc_id = b
        """,
        "q78_calendar_rollup": f"""
            SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                   CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
                   CAST(month(o_orderdate) AS INTEGER) AS mo,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS {_DEC})) AS DOUBLE)
                     AS revenue
            FROM orders
            GROUP BY 1, 2, 3
        """,
        "q79_media_near_dups": _AHASH_PAIRS_SQL,
        "q80_corpus_splits": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            c AS (
              SELECT doc_id,
                     CASE WHEN len(toks) > 0 THEN
                       [toks[(i * 50 + 1):least((i + 1) * 50, len(toks))]
                        for i in generate_series(0, (len(toks) - 1) // 50)]
                     ELSE []::VARCHAR[][] END AS chunks
              FROM t),
            e AS (SELECT doc_id, unnest(chunks) AS ctoks FROM c),
            assigned AS (
              SELECT doc_id, len(ctoks) AS nct,
                     ({_hex4("md5('split:' || CAST(doc_id AS VARCHAR))", 1)}
                      * 65536.0
                      + {_hex4("md5('split:' || CAST(doc_id AS VARCHAR))", 5)})
                     / 4294967296.0 AS u
              FROM e)
            SELECT CASE WHEN u < 0.8 THEN 'train'
                        WHEN u < 0.9 THEN 'val'
                        ELSE 'test' END AS split,
                   COUNT(*) AS n_chunks,
                   CAST(SUM(nct) AS BIGINT) AS n_tokens,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM assigned GROUP BY 1
        """,
        "q81_winsorize": """
            WITH ranked AS (
              SELECT event_type, event_id, value,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY value) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events),
            bounds AS (
              SELECT event_type,
                     MAX(CASE WHEN rn = greatest(1,
                           CAST(ceil(0.05 * n) AS BIGINT))
                         THEN value END) AS p05,
                     MAX(CASE WHEN rn = greatest(1,
                           CAST(ceil(0.95 * n) AS BIGINT))
                         THEN value END) AS p95
              FROM ranked GROUP BY event_type),
            capped AS (
              SELECT e.event_type, e.value,
                     least(greatest(e.value, b.p05), b.p95) AS v_cap,
                     b.p05, b.p95
              FROM events e JOIN bounds b ON e.event_type = b.event_type)
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN value != v_cap THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_clipped,
                   CAST(SUM(CAST(v_cap AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_capped,
                   MIN(p05) AS p05, MIN(p95) AS p95
            FROM capped GROUP BY event_type
        """,
        "q82_prefix_filter_join": f"""
            WITH words AS (
              SELECT DISTINCT doc_id AS id, unnest(toks) AS w
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            freq AS (SELECT w, COUNT(*) AS df FROM words GROUP BY w),
            ordered AS (
              SELECT id, w,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY df, w) AS pos,
                     COUNT(*) OVER (PARTITION BY id) AS nw
              FROM words JOIN freq USING (w)),
            prefix AS (
              SELECT id, w FROM ordered
              WHERE pos <= nw - CAST(ceil(0.8 * nw) AS BIGINT) + 1),
            cands AS (
              SELECT DISTINCT l.id AS a, r.id AS b
              FROM prefix l JOIN prefix r
                ON l.w = r.w AND l.id < r.id),
            sizes AS (SELECT id, COUNT(*) AS nw FROM words GROUP BY id),
            inter AS (
              SELECT a, b, COUNT(*) AS n_inter
              FROM cands
              JOIN words wa ON wa.id = a
              JOIN words wb ON wb.id = b AND wb.w = wa.w
              GROUP BY a, b)
            SELECT a, b,
                   CAST(n_inter AS INTEGER) AS n_inter,
                   CAST(sa.nw AS INTEGER) AS na,
                   CAST(sb.nw AS INTEGER) AS nb,
                   n_inter / (sa.nw + sb.nw - n_inter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.id = a
            JOIN sizes sb ON sb.id = b
            WHERE n_inter / (sa.nw + sb.nw - n_inter) >= 0.8
        """,
        "q83_weighted_sample": f"""
            WITH keyed AS (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     ln(({_hex4("md5('ws:' || CAST(o_orderkey AS VARCHAR))", 1)}
                         * 65536.0
                         + {_hex4("md5('ws:' || CAST(o_orderkey AS VARCHAR))", 5)}
                         + 1) / 4294967297.0)
                       / o_totalprice AS es_key
              FROM orders WHERE o_totalprice > 0)
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (
                     PARTITION BY o_orderpriority
                     ORDER BY es_key DESC, o_orderkey) AS INTEGER) AS rank
            FROM keyed
            QUALIFY rank <= 5
        """,
        "q84_value_histogram": """
            SELECT event_type,
                   CAST(CASE WHEN value < 0.0 THEN 0
                             WHEN value >= 100.0 THEN 21
                             ELSE floor(value / 5.0) + 1 END AS BIGINT)
                     AS bucket,
                   COUNT(*) AS n,
                   MIN(value) AS lo, MAX(value) AS hi
            FROM events
            GROUP BY 1, 2
        """,
        "q85_asof_forward": """
            SELECT c.user_id, c.event_id, epoch_us(c.ts) AS ts,
                   c.value AS click_value,
                   epoch_us(p.ts) AS next_buy_ts,
                   p.value AS next_buy_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts <= p.ts
        """,
        "q86_grouped_regression": """
            WITH stats AS (
              SELECT l_returnflag, COUNT(*) AS n,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
                     SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))
                         * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
                     SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
              FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, n,
                   CAST(sx AS DOUBLE) AS sum_x,
                   CAST(sy AS DOUBLE) AS sum_y,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
                   (CAST(sy AS DOUBLE)
                    - (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE))
                      * CAST(sx AS DOUBLE)) / n AS intercept,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
            FROM stats
        """,
        "q87_token_entropy": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g AS (
              SELECT doc_id, tok, COUNT(*) AS c
              FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
              GROUP BY doc_id, tok),
            counts AS (
              SELECT doc_id, list(c ORDER BY tok) AS cs
              FROM g GROUP BY doc_id)
            SELECT t.doc_id,
                   CAST(len(t.toks) AS INTEGER) AS n_tokens,
                   CASE WHEN len(t.toks) > 0 THEN
                     CAST(floor((ln(CAST(len(t.toks) AS DOUBLE))
                       - list_reduce(
                           list_transform(counts.cs,
                             c -> CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))),
                           (a, b) -> a + b) / len(t.toks)) * 1000000)
                       AS BIGINT)
                   END AS entropy_micro,
                   CASE WHEN len(t.toks) > 0 THEN
                     CAST(floor((ln(CAST(len(t.toks) AS DOUBLE))
                       - list_reduce(
                           list_transform(counts.cs,
                             c -> CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))),
                           (a, b) -> a + b) / len(t.toks)) * 1000000)
                       AS BIGINT) < 2000000
                   END AS is_low_entropy
            FROM t LEFT JOIN counts ON t.doc_id = counts.doc_id
        """,
        "q88_streaks": """
            WITH r AS (
              SELECT user_id, event_type, epoch_us(ts) AS ts, event_id,
                     CASE WHEN lag(event_type) OVER w IS NULL
                            OR lag(event_type) OVER w <> event_type
                          THEN 1 ELSE 0 END AS new_run
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            ), runs AS (
              SELECT user_id, event_type, ts,
                     SUM(new_run) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS run_seq
              FROM r)
            SELECT user_id, CAST(run_seq AS BIGINT) AS run_seq, event_type,
                   COUNT(*) AS streak_len,
                   MIN(ts) AS start_ts, MAX(ts) AS end_ts
            FROM runs GROUP BY 1, 2, 3
        """,
        "q89_majority_vote": """
            WITH votes AS (
              SELECT l_partkey, l_returnflag, COUNT(*) AS n
              FROM lineitem GROUP BY 1, 2)
            SELECT l_partkey, l_returnflag AS label, n AS n_votes,
                   CAST(SUM(n) OVER (PARTITION BY l_partkey) AS BIGINT)
                     AS n_total,
                   CAST(n AS DOUBLE)
                     / CAST(SUM(n) OVER (PARTITION BY l_partkey) AS DOUBLE)
                     AS share
            FROM votes
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY l_partkey ORDER BY n DESC, l_returnflag) = 1
        """,
        "q90_cube": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag) * 2
                        + GROUPING(l_linestatus) AS BIGINT) AS gid,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_price
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "q91_markov_transitions": """
            WITH seq AS (
              SELECT event_type AS src,
                     lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS dst
              FROM events),
            trans AS (
              SELECT src, dst, COUNT(*) AS n FROM seq
              WHERE dst IS NOT NULL GROUP BY 1, 2),
            totals AS (SELECT src, SUM(n) AS n_src FROM trans GROUP BY 1)
            SELECT t.src, t.dst, t.n, CAST(tt.n_src AS BIGINT) AS n_src,
                   CAST(t.n AS DOUBLE) / CAST(tt.n_src AS DOUBLE) AS prob
            FROM trans t JOIN totals tt ON t.src = tt.src
        """,
        "q92_chisq_contingency": """
            WITH cells AS (
              SELECT lang, source, COUNT(*) AS o
              FROM documents GROUP BY 1, 2),
            rt AS (SELECT lang, SUM(o) AS rt FROM cells GROUP BY 1),
            ct AS (SELECT source, SUM(o) AS ct FROM cells GROUP BY 1),
            nn AS (SELECT SUM(o) AS nn FROM cells)
            SELECT cells.lang, cells.source, cells.o,
                   CAST(floor((CAST(rt.rt * ct.ct AS DOUBLE)
                               / CAST(nn.nn AS DOUBLE)) * 1000000) AS BIGINT)
                     AS e_micro,
                   CAST(floor((
                     (CAST(cells.o AS DOUBLE)
                      - CAST(rt.rt * ct.ct AS DOUBLE) / CAST(nn.nn AS DOUBLE))
                     * (CAST(cells.o AS DOUBLE)
                      - CAST(rt.rt * ct.ct AS DOUBLE) / CAST(nn.nn AS DOUBLE))
                     / (CAST(rt.rt * ct.ct AS DOUBLE) / CAST(nn.nn AS DOUBLE))
                   ) * 1000000) AS BIGINT) AS contrib_micro
            FROM cells
            JOIN rt ON cells.lang = rt.lang
            JOIN ct ON cells.source = ct.source
            CROSS JOIN nn
        """,
        "q93_keep_best_dedup": f"""
            WITH keyed AS (
              SELECT doc_id, n_chars,
                     md5(substr({_NORM}, 1, 64)) AS dup_key
              FROM documents)
            SELECT dup_key, doc_id, n_chars,
                   COUNT(*) OVER (PARTITION BY dup_key) AS group_size
            FROM keyed
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY dup_key ORDER BY n_chars DESC, doc_id) = 1
        """,
        "q94_inverted_index": f"""
            WITH pairs AS (
              SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok
              FROM documents),
            keep AS (
              SELECT tok, COUNT(*) AS df FROM pairs
              GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 500)
            SELECT p.tok, keep.df,
                   list(p.doc_id ORDER BY p.doc_id) AS postings
            FROM pairs p JOIN keep ON p.tok = keep.tok
            GROUP BY p.tok, keep.df
        """,
        "q95_quantile_binning": """
            WITH ranked AS (
              SELECT event_type, value,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY value) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events),
            bounds AS (
              SELECT event_type,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.25 * n) AS BIGINT))
                              THEN value END) AS p25,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                              THEN value END) AS p50,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.75 * n) AS BIGINT))
                              THEN value END) AS p75
              FROM ranked GROUP BY event_type)
            SELECT e.event_id, e.event_type, e.value,
                   1 + CAST(e.value > b.p25 AS INTEGER)
                     + CAST(e.value > b.p50 AS INTEGER)
                     + CAST(e.value > b.p75 AS INTEGER) AS bucket
            FROM events e JOIN bounds b ON e.event_type = b.event_type
        """,
        "q96_snapshot_diff": """
            WITH ev AS (
              SELECT user_id, event_type, value, epoch_us(ts) AS ts, event_id
              FROM events),
            lims AS (SELECT (MIN(ts) + MAX(ts)) // 2 AS cutoff FROM ev),
            old AS (
              SELECT user_id, event_type AS old_type, value AS old_value
              FROM ev CROSS JOIN lims
              WHERE ts < cutoff
              QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) = 1),
            new AS (
              SELECT user_id, event_type AS new_type, value AS new_value
              FROM ev
              QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) = 1)
            SELECT new.user_id, old.old_type, old.old_value,
                   new.new_type, new.new_value,
                   CASE WHEN old.old_type IS NULL THEN 'insert'
                        WHEN old.old_type <> new.new_type
                          OR old.old_value <> new.new_value THEN 'update'
                        ELSE 'unchanged' END AS change
            FROM new LEFT JOIN old ON new.user_id = old.user_id
        """,
        "q97_max_concurrency": """
            WITH buys AS (
              SELECT user_id, epoch_us(ts) AS ts, event_id
              FROM events WHERE event_type = 'purchase'),
            deltas AS (
              SELECT user_id, ts AS t, 1 AS delta, event_id FROM buys
              UNION ALL
              SELECT user_id, ts + 3600000000 AS t, -1 AS delta, event_id
              FROM buys),
            swept AS (
              SELECT user_id,
                     SUM(delta) OVER (PARTITION BY user_id
                                      ORDER BY t, delta, event_id
                                      ROWS UNBOUNDED PRECEDING) AS open_now
              FROM deltas)
            SELECT user_id,
                   CAST(COUNT(*) / 2 AS BIGINT) AS n_windows,
                   CAST(MAX(open_now) AS BIGINT) AS max_concurrent
            FROM swept GROUP BY user_id
        """,
        "q98_decayed_popularity": """
            WITH mx AS (SELECT MAX(CAST(l_shipdate AS DATE)) AS maxd
                        FROM lineitem),
            weighted AS (
              SELECT l_partkey,
                     date_diff('day', CAST(l_shipdate AS DATE), maxd) // 7
                       AS k
              FROM lineitem CROSS JOIN mx)
            SELECT l_partkey, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN k <= 40
                             THEN CAST(1 AS BIGINT) << CAST(40 - k AS INTEGER)
                             ELSE 0 END) AS BIGINT) AS pop_scaled,
                   CAST(SUM(CASE WHEN k <= 40
                             THEN CAST(1 AS BIGINT) << CAST(40 - k AS INTEGER)
                             ELSE 0 END) AS BIGINT) / 1099511627776.0
                     AS pop_score
            FROM weighted GROUP BY l_partkey
        """,
        "q99_path_trigrams": """
            WITH seq AS (
              SELECT event_type AS s1,
                     lead(event_type, 1) OVER w AS s2,
                     lead(event_type, 2) OVER w AS s3
              FROM events
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id))
            SELECT s1 || '>' || s2 || '>' || s3 AS path, COUNT(*) AS n
            FROM seq WHERE s2 IS NOT NULL AND s3 IS NOT NULL
            GROUP BY 1
            ORDER BY n DESC, path
            LIMIT 20
        """,
        "q100_profile_table": """
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS qty_nulls,
                   COUNT(DISTINCT l_quantity) AS qty_ndv,
                   MIN(l_quantity) AS qty_min,
                   MAX(l_quantity) AS qty_max,
                   CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS flag_nulls,
                   COUNT(DISTINCT l_returnflag) AS flag_ndv,
                   MIN(l_returnflag) AS flag_min,
                   MAX(l_returnflag) AS flag_max,
                   COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS ship_ndv,
                   strftime(MIN(CAST(l_shipdate AS DATE)), '%Y-%m-%d')
                     AS ship_min,
                   strftime(MAX(CAST(l_shipdate AS DATE)), '%Y-%m-%d')
                     AS ship_max
            FROM lineitem
        """,
        "q101_wow_growth": """
            WITH weekly AS (
              SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
                     SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(8,4))
                            - CAST(l_discount AS DECIMAL(8,4)))) AS rev_dec
              FROM lineitem GROUP BY 1),
            lagged AS (
              SELECT week, rev_dec,
                     lag(rev_dec) OVER (ORDER BY week) AS prev_dec
              FROM weekly)
            SELECT strftime(week, '%Y-%m-%d') AS week,
                   CAST(rev_dec AS DOUBLE) AS revenue,
                   CAST(prev_dec AS DOUBLE) AS prev_revenue,
                   CAST(rev_dec - prev_dec AS DOUBLE)
                     / CAST(prev_dec AS DOUBLE) AS wow_growth
            FROM lagged
        """,
        "q102_bloom_pruned_join": """
            SELECT l_returnflag,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(8,4))
                               - CAST(l_discount AS DECIMAL(8,4))))
                        AS DOUBLE) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY 1
            ORDER BY 1
        """,
        "q103_basket_pairs": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS p1, c.l_partkey AS p2,
                   COUNT(*) AS n_orders
            FROM b a JOIN b c
              ON a.l_orderkey = c.l_orderkey
             AND a.l_partkey < c.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= 2
            ORDER BY n_orders DESC, p1, p2
        """,
        "q104_funnel": """
            WITH e AS (
              SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id)
                       AS rn
              FROM events),
            s1 AS (SELECT user_id, MIN(rn) AS r1 FROM e
                   WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, MIN(e.rn) AS r2
                   FROM e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.rn > s1.r1
                   GROUP BY 1),
            s3 AS (SELECT e.user_id, MIN(e.rn) AS r3
                   FROM e JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.rn > s2.r2
                   GROUP BY 1)
            SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS step1_view,
                   CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS step2_click,
                   CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
                     AS step3_purchase
        """,
        "q105_triangle_count": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            edges AS (
              SELECT a.l_partkey AS p1, c.l_partkey AS p2
              FROM b a JOIN b c
                ON a.l_orderkey = c.l_orderkey
               AND a.l_partkey < c.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
            FROM edges e1
            JOIN edges e2 ON e1.p2 = e2.p1
            WHERE EXISTS (SELECT 1 FROM edges e3
                          WHERE e3.p1 = e1.p1 AND e3.p2 = e2.p2)
            ORDER BY a, b, c
        """,
        "q106_rfm_segments": """
            WITH per AS (
              SELECT o_custkey,
                     CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                               (SELECT CAST(MAX(o_orderdate) AS DATE)
                                  FROM orders)) AS INT)
                       AS recency,
                     CAST(COUNT(*) AS BIGINT) AS frequency,
                     SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon_dec
              FROM orders GROUP BY 1),
            rk AS (
              SELECT per.*,
                     ROW_NUMBER() OVER (ORDER BY recency) AS rr,
                     ROW_NUMBER() OVER (ORDER BY frequency) AS fr,
                     ROW_NUMBER() OVER (ORDER BY mon_dec) AS mr,
                     COUNT(*) OVER () AS n
              FROM per),
            bounds AS (
              SELECT
                MAX(CASE WHEN rr = greatest(1, CAST(ceil(0.25*n) AS BIGINT))
                         THEN recency END) AS r25,
                MAX(CASE WHEN rr = greatest(1, CAST(ceil(0.50*n) AS BIGINT))
                         THEN recency END) AS r50,
                MAX(CASE WHEN rr = greatest(1, CAST(ceil(0.75*n) AS BIGINT))
                         THEN recency END) AS r75,
                MAX(CASE WHEN fr = greatest(1, CAST(ceil(0.25*n) AS BIGINT))
                         THEN frequency END) AS f25,
                MAX(CASE WHEN fr = greatest(1, CAST(ceil(0.50*n) AS BIGINT))
                         THEN frequency END) AS f50,
                MAX(CASE WHEN fr = greatest(1, CAST(ceil(0.75*n) AS BIGINT))
                         THEN frequency END) AS f75,
                MAX(CASE WHEN mr = greatest(1, CAST(ceil(0.25*n) AS BIGINT))
                         THEN mon_dec END) AS m25,
                MAX(CASE WHEN mr = greatest(1, CAST(ceil(0.50*n) AS BIGINT))
                         THEN mon_dec END) AS m50,
                MAX(CASE WHEN mr = greatest(1, CAST(ceil(0.75*n) AS BIGINT))
                         THEN mon_dec END) AS m75
              FROM rk)
            SELECT o_custkey, recency, frequency,
                   CAST(mon_dec AS DOUBLE) AS monetary,
                   CAST(4 - ((recency > r25)::INT + (recency > r50)::INT
                             + (recency > r75)::INT) AS INT) AS r_score,
                   CAST(1 + ((frequency > f25)::INT + (frequency > f50)::INT
                             + (frequency > f75)::INT) AS INT) AS f_score,
                   CAST(1 + ((mon_dec > m25)::INT + (mon_dec > m50)::INT
                             + (mon_dec > m75)::INT) AS INT) AS m_score,
                   CAST((4 - ((recency > r25)::INT + (recency > r50)::INT
                              + (recency > r75)::INT)) * 100
                        + (1 + ((frequency > f25)::INT + (frequency > f50)::INT
                                + (frequency > f75)::INT)) * 10
                        + (1 + ((mon_dec > m25)::INT + (mon_dec > m50)::INT
                                + (mon_dec > m75)::INT)) AS INT) AS segment
            FROM per CROSS JOIN bounds
        """,
        "q107_mad_outliers": """
            WITH ranked AS (
              SELECT event_id, event_type, value,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY value) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events),
            med AS (
              SELECT event_type,
                     MAX(CASE WHEN rn = greatest(1,
                           CAST(ceil(0.5 * n) AS BIGINT))
                         THEN value END) AS med
              FROM ranked GROUP BY 1),
            dev AS (
              SELECT e.event_id, e.event_type, e.value, m.med,
                     abs(e.value - m.med) AS absdev
              FROM events e JOIN med m USING (event_type)),
            dranked AS (
              SELECT dev.*,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY absdev) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM dev),
            mad AS (
              SELECT event_type,
                     MAX(CASE WHEN rn = greatest(1,
                           CAST(ceil(0.5 * n) AS BIGINT))
                         THEN absdev END) AS mad
              FROM dranked GROUP BY 1)
            SELECT d.event_id, d.event_type, d.value, d.med, a.mad
            FROM dev d JOIN mad a USING (event_type)
            WHERE d.absdev > 3.0 * a.mad
            ORDER BY d.event_type, d.event_id
        """,
        "q108_skew_profile": """
            WITH counts AS (
              SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
            ranked AS (
              SELECT n,
                     ROW_NUMBER() OVER (ORDER BY n) AS rn,
                     COUNT(*) OVER () AS nk
              FROM counts),
            stats AS (
              SELECT
                MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.5*nk) AS BIGINT))
                         THEN n END) AS p50_rows,
                MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.99*nk) AS BIGINT))
                         THEN n END) AS p99_rows,
                CAST(COUNT(*) AS BIGINT) AS n_keys,
                CAST(SUM(n) AS BIGINT) AS total_rows
              FROM ranked),
            top AS (
              SELECT user_id, n,
                     ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rank
              FROM counts
              ORDER BY n DESC, user_id LIMIT 10)
            SELECT CAST(rank AS INT) AS rank, user_id,
                   n AS n_rows,
                   CAST(n * 1000000 // total_rows AS BIGINT) AS share_ppm,
                   n_keys, total_rows, p50_rows, p99_rows
            FROM top CROSS JOIN stats
            ORDER BY rank
        """,
        "q109_pmi_pairs": """
            WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem),
            marg AS (SELECT l_partkey AS p, CAST(COUNT(*) AS BIGINT) AS m
                     FROM bp GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM orders),
            pairs AS (
              SELECT a.l_partkey AS p1, c.l_partkey AS p2,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM bp a JOIN bp c
                ON a.l_orderkey = c.l_orderkey
               AND a.l_partkey < c.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT p1, p2, n AS n_pair, m1.m AS m1, m2.m AS m2,
                   CAST(floor(1000000.0 * ln(
                        CAST(n * t AS DOUBLE)
                        / CAST(m1.m * m2.m AS DOUBLE))) AS BIGINT)
                     AS pmi_micro
            FROM pairs
            JOIN marg m1 ON m1.p = pairs.p1
            JOIN marg m2 ON m2.p = pairs.p2
            CROSS JOIN tot
            ORDER BY p1, p2
        """,
        "q110_constraint_audit": """
            WITH checks AS (
              SELECT 'complete_custkey' AS "check",
                     CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0
                              END) AS BIGINT) AS violations
              FROM orders
              UNION ALL
              SELECT 'unique_orderkey',
                     CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c - 1 END), 0)
                          AS BIGINT)
              FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
              UNION ALL
              SELECT 'ref_lineitem_orderkey', CAST(COUNT(*) AS BIGINT)
              FROM lineitem
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
              UNION ALL
              SELECT 'range_totalprice_pos',
                     CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0
                              END) AS BIGINT)
              FROM orders
              UNION ALL
              SELECT 'domain_orderstatus',
                     CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                              THEN 1 ELSE 0 END) AS BIGINT)
              FROM orders)
            SELECT "check", violations, violations = 0 AS passed
            FROM checks ORDER BY "check"
        """,
        "q111_incremental_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_qty,
                   CAST(COUNT(*) AS BIGINT) AS count_rows
            FROM lineitem
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q112_pagerank": _pagerank_sql(),
        "q113_decontamination": f"""
            WITH g AS (
              SELECT doc_id, source, norm, length(norm) AS L
              FROM (SELECT doc_id, source, {_NORM} AS norm FROM documents)),
            h AS (
              SELECT doc_id, source,
                     list_transform(range(1, L - 5 + 2),
                       i -> {_hex4("md5(substr(norm, i, 5))", 1)}) AS hashes
              FROM g),
            m AS MATERIALIZED (
              SELECT doc_id, source,
                     CASE WHEN len(hashes) >= 4 THEN
                       list_sort(list_distinct(
                         list_transform(range(1, len(hashes) - 4 + 2),
                           j -> list_aggregate(hashes[j:j+3], 'min'))))
                     WHEN len(hashes) >= 1 THEN
                       [list_aggregate(hashes, 'min')]
                     ELSE [] END AS fps
              FROM h),
            ex AS MATERIALIZED (
              SELECT doc_id, source, CAST(len(fps) AS BIGINT) AS nf,
                     unnest(fps) AS f
              FROM m),
            eval_fps AS (
              SELECT DISTINCT f FROM ex WHERE source IN ('src0', 'src1'))
            SELECT doc_id, source, COUNT(*) AS n_shared, nf,
                   COUNT(*) * 1000000 // nf AS shared_ppm
            FROM ex JOIN eval_fps USING (f)
            WHERE source NOT IN ('src0', 'src1')
            GROUP BY doc_id, source, nf
            HAVING COUNT(*) >= 3
        """,
        "q114_mixture_sample": f"""
            WITH d AS (
              SELECT doc_id, source, len({_TOKS}) AS n_tokens,
                     md5(CAST(doc_id AS VARCHAR)) AS h
              FROM documents),
            cum AS (
              SELECT doc_id, source, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY source ORDER BY h
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM d)
            SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum
            FROM cum WHERE cum - n_tokens < 500
        """,
        "q115_semantic_cluster_dedup": _kmeans_oracle(),
        "q116_edit_distance_join": """
            SELECT x.c_custkey AS a, y.c_custkey AS b,
                   levenshtein(x.c_name, y.c_name) AS dist
            FROM customer x JOIN customer y
              ON x.c_custkey < y.c_custkey
             AND abs(length(x.c_name) - length(y.c_name)) <= 2
            WHERE x.c_custkey < 300 AND y.c_custkey < 300
              AND levenshtein(x.c_name, y.c_name) <= 2
        """,
        "q117_rollup_revenue": f"""
            SELECT COALESCE(r_name, 'ALL') AS region,
                   COALESCE(n_name, 'ALL') AS nation,
                   CAST(SUM(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_orders,
                   CAST(GROUPING(r_name) AS INT) AS g_region,
                   CAST(GROUPING(n_name) AS INT) AS g_nation
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, n_name)
        """,
        "q118_pareto_frontier": """
            SELECT p_partkey, p_name,
                   p_retailprice AS price, p_size AS size
            FROM part a
            WHERE NOT EXISTS (
              SELECT 1 FROM part b
              WHERE b.p_retailprice <= a.p_retailprice
                AND b.p_size >= a.p_size
                AND (b.p_retailprice < a.p_retailprice
                     OR b.p_size > a.p_size))
        """,
        "q119_twap": f"""
            WITH iv AS (
              SELECT user_id,
                     lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                       - epoch_us(ts) AS dt,
                     CAST(CAST(value AS {_DEC}) * 100 AS BIGINT) AS vc
              FROM events)
            SELECT user_id,
                   COUNT(*) AS n_intervals,
                   CAST(SUM(dt) AS BIGINT) AS span_us,
                   (CAST(SUM(vc * dt) AS DOUBLE)
                      / CAST(SUM(dt) AS DOUBLE)) / 100.0 AS twap
            FROM iv
            WHERE dt IS NOT NULL
            GROUP BY user_id
            HAVING SUM(dt) > 0
        """,
        "q120_group_auc": """
            WITH base AS (
              SELECT CAST(EXTRACT(year FROM ts) AS INT) AS yr, value,
                     CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
              FROM events),
            cnt AS (
              SELECT yr, value, SUM(pos) AS npos, SUM(1 - pos) AS nneg
              FROM base GROUP BY yr, value),
            cum AS (
              SELECT yr, npos, nneg,
                     SUM(nneg) OVER (PARTITION BY yr ORDER BY value
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) - nneg AS below
              FROM cnt)
            SELECT yr, CAST(SUM(npos) AS BIGINT) AS npos,
                   CAST(SUM(nneg) AS BIGINT) AS nneg,
                   CAST(SUM(npos * (2 * below + nneg)) AS DOUBLE)
                     / CAST(2 * SUM(npos) * SUM(nneg) AS DOUBLE) AS auc
            FROM cum GROUP BY yr
        """,
        "q121_calibration_bins": f"""
            SELECT CAST(LEAST(FLOOR(value / 50.0), 9) AS INT) AS bin,
                   COUNT(*) AS n,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS BIGINT) AS npos,
                   CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) / COUNT(*)
                     AS mean_value,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     / COUNT(*) AS pos_rate
            FROM events
            GROUP BY 1
        """,
        "q122_merge_upsert": f"""
            WITH base AS (
              SELECT o_orderkey, CAST(o_totalprice AS {_DEC}) AS bprice,
                     o_orderstatus AS bstatus
              FROM orders WHERE o_orderkey % 10 <> 0),
            delta AS (
              SELECT o_orderkey, CAST(o_totalprice AS {_DEC}) AS dprice,
                     'R' AS dstatus
              FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
            SELECT COALESCE(b.o_orderkey, d.o_orderkey) AS o_orderkey,
                   CAST(COALESCE(dprice, bprice) AS DOUBLE) AS price,
                   COALESCE(dstatus, bstatus) AS status,
                   CASE WHEN bprice IS NOT NULL AND dprice IS NOT NULL
                          THEN 'update'
                        WHEN bprice IS NULL THEN 'insert'
                        ELSE 'keep' END AS action
            FROM base b FULL OUTER JOIN delta d USING (o_orderkey)
        """,
        "q123_dedup_pipeline": f"""
            WITH RECURSIVE words AS MATERIALIZED (
              SELECT DISTINCT doc_id AS id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            sizes AS (SELECT id, COUNT(*) AS nw FROM words GROUP BY id),
            inter AS (
              SELECT wa.id AS a, wb.id AS b, COUNT(*) AS n_inter
              FROM words wa
              JOIN words wb ON wb.word = wa.word AND wa.id < wb.id
              GROUP BY 1, 2),
            pairs AS MATERIALIZED (
              SELECT a, b FROM inter
              JOIN sizes sa ON sa.id = a
              JOIN sizes sb ON sb.id = b
              WHERE n_inter / (sa.nw + sb.nw - n_inter) >= 0.6),
            sym AS MATERIALIZED (
              SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
            nodes AS (SELECT DISTINCT a AS node FROM sym),
            reach AS (
              SELECT node, node AS peer FROM nodes
              UNION
              SELECT r.node, s.b AS peer
              FROM reach r JOIN sym s ON r.peer = s.a),
            comps AS (SELECT node, MIN(peer) AS component
                      FROM reach GROUP BY node),
            lab AS (
              SELECT d.doc_id, d.source, d.n_chars,
                     COALESCE(c.component, d.doc_id) AS component
              FROM documents d LEFT JOIN comps c ON c.node = d.doc_id),
            win AS (
              SELECT source,
                     CASE WHEN ROW_NUMBER() OVER (
                            PARTITION BY component
                            ORDER BY n_chars DESC, doc_id) = 1
                          THEN 1 ELSE 0 END AS keep
              FROM lab)
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(keep) AS BIGINT) AS n_kept,
                   CAST(COUNT(*) - SUM(keep) AS BIGINT) AS n_removed
            FROM win GROUP BY source
        """,
        "q124_last_touch_attribution": f"""
            WITH tagged AS (
              SELECT ts, event_type, value,
                     last_value(CASE WHEN event_type <> 'purchase'
                                     THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS channel
              FROM events)
            SELECT CAST(EXTRACT(year FROM ts) AS INT) AS yr,
                   COALESCE(channel, 'none') AS channel,
                   COUNT(*) AS n_purchases,
                   CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS revenue
            FROM tagged
            WHERE event_type = 'purchase'
            GROUP BY 1, 2
        """,
        "q125_quantile_normalize": """
            WITH cnt AS (
              SELECT value, COUNT(*) AS cnt FROM events GROUP BY value),
            cum AS (
              SELECT value, cnt,
                     SUM(cnt) OVER (ORDER BY value
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum,
                     SUM(cnt) OVER () AS n
              FROM cnt)
            SELECT e.event_id, e.value,
                   CAST(2 * (cum - cnt) + cnt AS DOUBLE)
                     / CAST(2 * n AS DOUBLE) AS pct
            FROM events e JOIN cum USING (value)
        """,
        "q126_kcore": """
            WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e0 AS MATERIALIZED (
              SELECT a.l_partkey AS p1, c.l_partkey AS p2
              FROM b a JOIN b c
                ON a.l_orderkey = c.l_orderkey
               AND a.l_partkey < c.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            d1 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
                     SELECT p1 AS node FROM e0
                     UNION ALL SELECT p2 FROM e0) GROUP BY node),
            k1 AS MATERIALIZED (SELECT node FROM d1 WHERE deg >= 3),
            e1 AS MATERIALIZED (SELECT p1, p2 FROM e0
                   WHERE p1 IN (SELECT node FROM k1)
                     AND p2 IN (SELECT node FROM k1)),
            d2 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
                     SELECT p1 AS node FROM e1
                     UNION ALL SELECT p2 FROM e1) GROUP BY node),
            k2 AS MATERIALIZED (SELECT node FROM d2 WHERE deg >= 3),
            e2 AS MATERIALIZED (SELECT p1, p2 FROM e1
                   WHERE p1 IN (SELECT node FROM k2)
                     AND p2 IN (SELECT node FROM k2)),
            d3 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
                     SELECT p1 AS node FROM e2
                     UNION ALL SELECT p2 FROM e2) GROUP BY node),
            k3 AS MATERIALIZED (SELECT node FROM d3 WHERE deg >= 3),
            e3 AS MATERIALIZED (SELECT p1, p2 FROM e2
                   WHERE p1 IN (SELECT node FROM k3)
                     AND p2 IN (SELECT node FROM k3)),
            d4 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
                     SELECT p1 AS node FROM e3
                     UNION ALL SELECT p2 FROM e3) GROUP BY node),
            k4 AS MATERIALIZED (SELECT node FROM d4 WHERE deg >= 3),
            e4 AS (SELECT p1, p2 FROM e3
                   WHERE p1 IN (SELECT node FROM k4)
                     AND p2 IN (SELECT node FROM k4))
            SELECT node, COUNT(*) AS deg FROM (
              SELECT p1 AS node FROM e4
              UNION ALL SELECT p2 FROM e4) GROUP BY node
        """,
        "q127_psi_drift": """
            WITH base AS (
              SELECT event_type,
                     CAST(LEAST(FLOOR(value / 50.0), 9) AS INT) AS bin,
                     CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 1 ELSE 0 END
                       AS is_ref
              FROM events),
            cnt AS (
              SELECT event_type, bin,
                     CAST(SUM(is_ref) AS BIGINT) AS a,
                     CAST(SUM(1 - is_ref) AS BIGINT) AS b
              FROM base GROUP BY event_type, bin),
            tot AS (
              SELECT event_type, bin, a, b,
                     CAST(SUM(a) OVER (PARTITION BY event_type) AS BIGINT) AS ta,
                     CAST(SUM(b) OVER (PARTITION BY event_type) AS BIGINT) AS tb
              FROM cnt)
            SELECT event_type,
                   CAST(MAX(ta) AS BIGINT) AS n_ref,
                   CAST(MAX(tb) AS BIGINT) AS n_cur,
                   CAST(SUM(CASE WHEN a > 0 AND b > 0 THEN
                     CAST(FLOOR(((a / ta - b / tb)
                                 * ln((a * tb) / (b * ta))) * 1000000.0)
                          AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS psi_micro
            FROM tot GROUP BY event_type
        """,
        "q128_model_metrics": """
            WITH terms AS (
              SELECT CAST(EXTRACT(year FROM ts) AS INT) AS yr,
                     CAST(FLOOR((value / 500.0
                                 - CASE WHEN event_type = 'purchase'
                                        THEN 1.0 ELSE 0.0 END)
                                * (value / 500.0
                                   - CASE WHEN event_type = 'purchase'
                                          THEN 1.0 ELSE 0.0 END)
                                * 1e9) AS BIGINT) AS sq,
                     CAST(FLOOR(-(CASE WHEN event_type = 'purchase'
                                       THEN ln(value / 500.0)
                                       ELSE ln(1.0 - value / 500.0) END)
                                * 1000000.0) AS BIGINT) AS ll
              FROM events)
            SELECT yr, COUNT(*) AS n,
                   CAST(SUM(sq) AS BIGINT) AS brier_nano_sum,
                   CAST(SUM(ll) AS BIGINT) AS logloss_micro_sum,
                   CAST(CAST(SUM(sq) AS BIGINT) AS DOUBLE) / COUNT(*) / 1e9
                     AS brier,
                   CAST(CAST(SUM(ll) AS BIGINT) AS DOUBLE) / COUNT(*) / 1e6
                     AS logloss
            FROM terms GROUP BY yr
        """,
        "q129_entity_resolution": """
            WITH RECURSIVE pt AS MATERIALIZED (
              SELECT p_partkey, p_name FROM part),
            pairs AS MATERIALIZED (
              SELECT x.p_partkey AS a, y.p_partkey AS b
              FROM pt x JOIN pt y
                ON x.p_partkey < y.p_partkey
               AND abs(length(x.p_name) - length(y.p_name)) <= 2
              WHERE levenshtein(x.p_name, y.p_name) <= 2),
            sym AS MATERIALIZED (
              SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
            nodes AS (SELECT DISTINCT a AS node FROM sym),
            reach AS (
              SELECT node, node AS peer FROM nodes
              UNION
              SELECT r.node, s.b AS peer
              FROM reach r JOIN sym s ON r.peer = s.a),
            comps AS (SELECT node, MIN(peer) AS component
                      FROM reach GROUP BY node),
            lab AS (
              SELECT c.p_partkey, c.p_name,
                     COALESCE(p.component, c.p_partkey) AS entity
              FROM pt c LEFT JOIN comps p ON p.node = c.p_partkey)
            SELECT entity, COUNT(*) AS n_members,
                   MAX(CASE WHEN rn = 1 THEN p_name END) AS canonical_name
            FROM (SELECT entity, p_name,
                         ROW_NUMBER() OVER (PARTITION BY entity
                                            ORDER BY p_partkey) AS rn
                  FROM lab)
            GROUP BY entity
        """,
        "q130_cohort_retention": """
            WITH um AS (
              SELECT user_id,
                     CAST(date_diff('day', DATE '2024-01-01',
                                    CAST(ts AS DATE)) AS INT) AS m,
                     COUNT(*) AS n_events
              FROM events GROUP BY 1, 2),
            aged AS (
              SELECT user_id,
                     MIN(m) OVER (PARTITION BY user_id) AS cohort_m,
                     m
              FROM um)
            SELECT cohort_m, m - cohort_m AS age_days,
                   COUNT(*) AS n_users
            FROM aged GROUP BY 1, 2
        """,
        "q131_weighted_median": """
            WITH fact AS (
              SELECT p_brand, l_extendedprice AS v,
                     CAST(l_quantity AS BIGINT) AS wt
              FROM lineitem JOIN part ON l_partkey = p_partkey),
            cnt AS (
              SELECT p_brand, v, CAST(SUM(wt) AS BIGINT) AS w
              FROM fact GROUP BY p_brand, v),
            cum AS (
              SELECT p_brand, v, w,
                     CAST(SUM(w) OVER (PARTITION BY p_brand ORDER BY v
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS cum,
                     CAST(SUM(w) OVER (PARTITION BY p_brand) AS BIGINT) AS tw
              FROM cnt)
            SELECT p_brand, v AS weighted_median, tw AS total_weight
            FROM cum
            WHERE 2 * cum >= tw AND 2 * (cum - w) < tw
        """,
        "q132_grouped_mode": """
            WITH cnt AS (
              SELECT event_type, EXTRACT(hour FROM ts) AS h, COUNT(*) AS n
              FROM events GROUP BY 1, 2)
            SELECT event_type,
                   CAST(h AS INT) AS modal_hour,
                   n AS n_at_mode
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                               ORDER BY n DESC, h) AS rn
                  FROM cnt)
            WHERE rn = 1
        """,
        "q133_inactivity_gaps": """
            WITH seq AS (
              SELECT user_id, epoch_us(ts) AS us,
                     lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS nxt
              FROM events)
            SELECT user_id, us AS gap_start_us, nxt AS gap_end_us,
                   (nxt - us) / 3600000000.0 AS gap_hours
            FROM seq
            WHERE nxt - us > 21600000000
        """,
        "q134_bm25_topk": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
            tf AS MATERIALIZED (
              SELECT doc_id, token, COUNT(*) AS tf
              FROM toks GROUP BY 1, 2),
            dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
                   FROM tf GROUP BY 1),
            dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
            stats AS (SELECT COUNT(*) AS n_docs,
                             CAST(SUM(dl) AS BIGINT) AS total_tokens
                      FROM dl),
            qterms AS (
              SELECT token, df FROM dfreq
              QUALIFY ROW_NUMBER() OVER (ORDER BY df DESC, token) <= 5),
            scored AS (
              SELECT tf.doc_id,
                     CAST(floor(
                       ln(1.0 + ((CAST(n_docs - df AS DOUBLE) + 0.5)
                                 / (CAST(df AS DOUBLE) + 0.5)))
                       * ((CAST(tf AS DOUBLE) * 2.2)
                          / (CAST(tf AS DOUBLE)
                             + 1.2 * (0.25 + 0.75
                                      * (CAST(dl * n_docs AS DOUBLE)
                                         / total_tokens))))
                       * 1000000) AS BIGINT) AS s_micro
              FROM tf JOIN qterms USING (token) JOIN dl USING (doc_id), stats)
            SELECT doc_id, COUNT(*) AS n_terms,
                   CAST(SUM(s_micro) AS BIGINT) AS score_micro
            FROM scored GROUP BY doc_id
            ORDER BY score_micro DESC, doc_id
            LIMIT 20
        """,
        "q135_dsir_weights": f"""
            WITH tokb AS (
              SELECT doc_id, lang, ({_hex4("md5(token)", 1)} % 1024) AS bucket
              FROM (SELECT doc_id, lang, unnest({_TOKS}) AS token
                    FROM documents)),
            dbt AS MATERIALIZED (
              SELECT doc_id, lang, bucket, COUNT(*) AS n
              FROM tokb GROUP BY 1, 2, 3),
            model AS MATERIALIZED (
              SELECT bucket, CAST(SUM(n) AS BIGINT) AS cr,
                     CAST(SUM(CASE WHEN lang = 'en' THEN n ELSE 0 END)
                          AS BIGINT) AS ct
              FROM dbt GROUP BY 1),
            tots AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr,
                            CAST(SUM(ct) AS BIGINT) AS tt
                     FROM model),
            weights AS (
              SELECT bucket,
                     CAST(floor(
                       ln(CAST((ct + 1) * (tr + 1024) AS DOUBLE)
                          / CAST((cr + 1) * (tt + 1024) AS DOUBLE))
                       * 1000000) AS BIGINT) AS w_micro
              FROM model, tots)
            SELECT doc_id, lang, CAST(SUM(n) AS BIGINT) AS n_tokens,
                   CAST(SUM(n * w_micro) AS BIGINT) AS weight_micro
            FROM dbt JOIN weights USING (bucket)
            GROUP BY doc_id, lang
        """,
        "q136_split_leakage_audit": f"""
            WITH g AS (
              SELECT doc_id,
                     CASE WHEN u < 0.8 THEN 'train'
                          WHEN u < 0.9 THEN 'val'
                          ELSE 'test' END AS split,
                     norm, length(norm) AS L
              FROM (
                SELECT doc_id,
                       ({_hex4("md5('split:' || CAST(doc_id AS VARCHAR))", 1)}
                        * 65536.0
                        + {_hex4("md5('split:' || CAST(doc_id AS VARCHAR))", 5)})
                       / 4294967296.0 AS u,
                       {_NORM} AS norm
                FROM documents)),
            h AS (
              SELECT doc_id, split,
                     list_transform(range(1, L - 5 + 2),
                       i -> {_hex4("md5(substr(norm, i, 5))", 1)}) AS hashes
              FROM g),
            m AS MATERIALIZED (
              SELECT doc_id, split,
                     CASE WHEN len(hashes) >= 4 THEN
                       list_sort(list_distinct(
                         list_transform(range(1, len(hashes) - 4 + 2),
                           j -> list_aggregate(hashes[j:j+3], 'min'))))
                     WHEN len(hashes) >= 1 THEN
                       [list_aggregate(hashes, 'min')]
                     ELSE [] END AS fps
              FROM h),
            ex AS MATERIALIZED (
              SELECT doc_id, split, unnest(fps) AS f FROM m),
            tfps AS (SELECT DISTINCT f FROM ex WHERE split = 'train'),
            leaked AS (
              SELECT split, COUNT(*) AS n_leaked FROM (
                SELECT DISTINCT e.split, e.doc_id
                FROM ex e JOIN tfps USING (f)
                WHERE e.split <> 'train')
              GROUP BY 1),
            base AS (SELECT split, COUNT(*) AS n_docs
                     FROM m WHERE split <> 'train' GROUP BY 1)
            SELECT base.split, n_docs,
                   COALESCE(n_leaked, 0) AS n_leaked,
                   (COALESCE(n_leaked, 0) * 1000000) // n_docs AS leaked_ppm
            FROM base LEFT JOIN leaked USING (split)
        """,
        "q137_hopping_window": """
            SELECT ((epoch_us(ts) // 900000000) - k) * 900000000
                     AS window_start_us,
                   event_type, COUNT(*) AS n
            FROM events, (SELECT unnest(range(4)) AS k)
            GROUP BY 1, 2
        """,
        "q138_ohlc_bars": """
            SELECT event_type,
                   epoch_us(ts) - (epoch_us(ts) % 3600000000)
                     AS hr_start_us,
                   (min(struct_pack(us := epoch_us(ts), eid := event_id,
                                    v := value))).v AS open,
                   max(value) AS high,
                   min(value) AS low,
                   (max(struct_pack(us := epoch_us(ts), eid := event_id,
                                    v := value))).v AS close,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     AS volume
            FROM events
            GROUP BY 1, 2
        """,
        "q139_cusum_alarms": """
            -- recursive CTE, NOT list_reduce: DuckDB 1.0.0 corrupts
            -- STRUCT fold accumulators when the reduce vectorizes over a
            -- full table (q190 precedent), and a scalar-encoded state
            -- would truncate the double S each step. The walk advances
            -- every user one event per iteration — exact IEEE doubles,
            -- depth = max events per user.
            WITH RECURSIVE e AS MATERIALIZED (
              SELECT user_id, value AS v,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS i
              FROM events),
            n AS MATERIALIZED (
              SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1),
            walk AS (
              SELECT user_id, 0 AS i, CAST(0.0 AS DOUBLE) AS s,
                     0 AS n_alarms
              FROM n
              UNION ALL
              SELECT w.user_id, w.i + 1,
                     CASE WHEN greatest(0.0, w.s + (e.v - 60.0)) > 500.0
                          THEN 0.0
                          ELSE greatest(0.0, w.s + (e.v - 60.0)) END,
                     w.n_alarms
                       + CASE WHEN greatest(0.0, w.s + (e.v - 60.0)) > 500.0
                              THEN 1 ELSE 0 END
              FROM walk w JOIN e ON e.user_id = w.user_id
                               AND e.i = w.i + 1)
            SELECT w.user_id, n.n_events, w.n_alarms,
                   CAST(floor(w.s * 1000000) AS BIGINT) AS final_s_micro
            FROM walk w JOIN n ON n.user_id = w.user_id
                              AND w.i = n.n_events
        """,
        "q140_jsd_source_similarity": f"""
            WITH sb AS MATERIALIZED (
              SELECT source, ({_hex4("md5(token)", 1)} % 1024) AS bucket,
                     COUNT(*) AS n
              FROM (SELECT source, unnest({_TOKS}) AS token FROM documents)
              GROUP BY 1, 2),
            tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS t
                    FROM sb GROUP BY 1),
            pairs AS (
              SELECT a.source AS src_a, a.t AS ta,
                     b.source AS src_b, b.t AS tb
              FROM tot a JOIN tot b ON a.source < b.source),
            grid AS (
              SELECT src_a, ta, src_b, tb, CAST(r.range AS INT) AS bucket
              FROM pairs, range(1024) r),
            j AS (
              SELECT g.src_a, g.src_b,
                     CAST(COALESCE(x.n, 0) AS DOUBLE) / g.ta AS p,
                     CAST(COALESCE(y.n, 0) AS DOUBLE) / g.tb AS q,
                     COALESCE(x.n, 0) AS ca, COALESCE(y.n, 0) AS cb
              FROM grid g
              LEFT JOIN sb x ON x.source = g.src_a AND x.bucket = g.bucket
              LEFT JOIN sb y ON y.source = g.src_b AND y.bucket = g.bucket)
            SELECT src_a, src_b,
                   CAST(SUM(CAST(floor(
                     (CASE WHEN ca > 0
                           THEN p * ln((2.0 * p) / (p + q))
                           ELSE 0.0 END
                      + CASE WHEN cb > 0
                             THEN q * ln((2.0 * q) / (p + q))
                             ELSE 0.0 END) * 500000) AS BIGINT))
                     AS BIGINT) AS jsd_micro
            FROM j GROUP BY 1, 2
        """,
        "q141_scd2_intervals": """
            WITH e AS (
              SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY epoch_us(ts), event_id)
                       AS prev_type
              FROM events),
            r AS (
              SELECT *, SUM(CASE WHEN prev_type IS NULL
                                   OR prev_type <> event_type
                                 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS run_id
              FROM e),
            runs AS (
              SELECT user_id, run_id, MIN(event_type) AS event_type,
                     MIN(us) AS valid_from_us, COUNT(*) AS n_events
              FROM r GROUP BY 1, 2)
            SELECT user_id, event_type, valid_from_us,
                   COALESCE(lead(valid_from_us)
                              OVER (PARTITION BY user_id
                                    ORDER BY valid_from_us),
                            -1) AS valid_to_us,
                   n_events
            FROM runs
        """,
        "q142_rrf_fusion": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
            tf AS MATERIALIZED (
              SELECT doc_id, token, COUNT(*) AS tf
              FROM toks GROUP BY 1, 2),
            dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
                   FROM tf GROUP BY 1),
            dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
            stats AS (SELECT COUNT(*) AS n_docs,
                             CAST(SUM(dl) AS BIGINT) AS total_tokens
                      FROM dl),
            qterms AS (
              SELECT token, df FROM dfreq
              QUALIFY ROW_NUMBER() OVER (ORDER BY df DESC, token) <= 5),
            matches AS (
              SELECT tf.doc_id,
                     CAST(floor(
                       ln(1.0 + ((CAST(n_docs - df AS DOUBLE) + 0.5)
                                 / (CAST(df AS DOUBLE) + 0.5)))
                       * ((CAST(tf AS DOUBLE) * 2.2)
                          / (CAST(tf AS DOUBLE)
                             + 1.2 * (0.25 + 0.75
                                      * (CAST(dl * n_docs AS DOUBLE)
                                         / total_tokens))))
                       * 1000000) AS BIGINT) AS s_micro,
                     tf
              FROM tf JOIN qterms USING (token) JOIN dl USING (doc_id),
                   stats),
            per_doc AS MATERIALIZED (
              SELECT doc_id, CAST(SUM(s_micro) AS BIGINT) AS bm25_micro,
                     CAST(SUM(tf) AS BIGINT) AS tf_total
              FROM matches GROUP BY 1),
            ra AS (
              SELECT doc_id,
                     CAST(ROW_NUMBER() OVER (ORDER BY bm25_micro DESC,
                                             doc_id) AS INT) AS rank_bm25
              FROM per_doc QUALIFY rank_bm25 <= 100),
            rb AS (
              SELECT doc_id,
                     CAST(ROW_NUMBER() OVER (ORDER BY tf_total DESC,
                                             doc_id) AS INT) AS rank_tf
              FROM per_doc QUALIFY rank_tf <= 100)
            SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
                   COALESCE(rank_bm25, -1) AS rank_bm25,
                   COALESCE(rank_tf, -1) AS rank_tf,
                   CAST(CASE WHEN rank_bm25 IS NOT NULL
                             THEN 1000000 // (60 + rank_bm25) ELSE 0 END
                        + CASE WHEN rank_tf IS NOT NULL
                               THEN 1000000 // (60 + rank_tf) ELSE 0 END
                        AS BIGINT) AS rrf_micro
            FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
            ORDER BY rrf_micro DESC, doc_id
            LIMIT 20
        """,
        "q143_interpolation_resample": """
            WITH e AS (
              SELECT user_id, event_id, value, epoch_us(ts) AS us
              FROM events),
            span AS (
              SELECT user_id,
                     (MIN(us) + 3599999999) // 3600000000 AS g0,
                     MAX(us) // 3600000000 AS g1
              FROM e GROUP BY 1),
            grid AS (
              SELECT user_id,
                     unnest(range(g0, g1 + 1)) * 3600000000 AS us
              FROM span WHERE g0 <= g1),
            pts AS (
              SELECT user_id, us, 0 AS kind, event_id, value FROM e
              UNION ALL
              SELECT user_id, us, 1 AS kind, NULL::BIGINT AS event_id,
                     NULL::DOUBLE AS value
              FROM grid),
            m AS (
              SELECT *,
                     last_value(CASE WHEN kind = 0
                                     THEN struct_pack(t := us, v := value)
                                END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY us, kind, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS p,
                     first_value(CASE WHEN kind = 0
                                      THEN struct_pack(t := us, v := value)
                                 END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY us, kind, event_id
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS nx
              FROM pts)
            SELECT user_id, us AS slot_us,
                   CAST(floor(
                     CASE WHEN p.t = us THEN p.v
                          ELSE p.v + (nx.v - p.v)
                               * (CAST(us - p.t AS DOUBLE)
                                  / CAST(nx.t - p.t AS DOUBLE)) END
                     * 1000000) AS BIGINT) AS interp_micro
            FROM m
            WHERE kind = 1 AND p.t IS NOT NULL AND nx.t IS NOT NULL
        """,
        "q144_cumulative_distinct": """
            WITH e AS (
              SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
                     CASE WHEN ROW_NUMBER()
                              OVER (PARTITION BY user_id, event_type
                                    ORDER BY epoch_us(ts), event_id) = 1
                          THEN 1 ELSE 0 END AS first_seen
              FROM events)
            SELECT user_id, us, event_id,
                   CAST(SUM(first_seen)
                          OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT)
                     AS n_types_so_far
            FROM e
        """,
        "q145_percentile_cont": f"""
            WITH ranked AS (
              SELECT event_type, value,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY value) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events)
            SELECT event_type,
                   {_pcont_expr("p25", 1, 4)},
                   {_pcont_expr("p50", 1, 2)},
                   {_pcont_expr("p90", 9, 10)}
            FROM ranked GROUP BY event_type
        """,
        "q146_label_propagation": _lpa_sql(3),
        "q147_seasonal_baseline": """
            WITH cnt AS (
              SELECT event_type,
                     ((epoch_us(ts) // 3600000000) + 72) % 168 AS how,
                     COUNT(*) AS obs
              FROM events GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS total
                    FROM cnt GROUP BY 1)
            SELECT event_type, how, obs,
                   CAST((obs * 168 - total) * 1000000 // total AS BIGINT)
                     AS dev_ppm
            FROM cnt JOIN tot USING (event_type)
        """,
        "q148_hhi_concentration": """
            WITH per_cust AS (
              SELECT c_nationkey, c_custkey,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                   AS BIGINT)) AS BIGINT) AS cents
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1, 2),
            tot AS (SELECT c_nationkey,
                           CAST(SUM(cents) AS BIGINT) AS total_cents
                    FROM per_cust GROUP BY 1),
            shares AS (
              SELECT p.c_nationkey,
                     cents * 1000000 // total_cents AS share_ppm
              FROM per_cust p JOIN tot USING (c_nationkey))
            SELECT n_name AS nation,
                   COUNT(*) AS n_customers,
                   CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT)
                     AS hhi_ppm
            FROM shares JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "q149_embedding_moments": """
            WITH base AS (
              SELECT label,
                     [CAST(floor(CAST(e AS DOUBLE) * 1000000) AS BIGINT)
                      for e in embedding] AS qi
              FROM embeddings),
            ex AS (
              SELECT label, generate_subscripts(qi, 1) - 1 AS dim,
                     unnest(qi) AS qv
              FROM base),
            stats AS (
              SELECT label, dim, COUNT(*) AS n,
                     CAST(SUM(qv) AS BIGINT) AS s,
                     SUM(CAST(qv AS HUGEINT) * CAST(qv AS HUGEINT)) AS ss
              FROM ex GROUP BY 1, 2)
            SELECT label, CAST(dim AS INT) AS dim, n,
                   CAST(CASE WHEN s >= 0 THEN s // n
                             ELSE -((-s) // n) END AS BIGINT) AS mean_micro,
                   CAST(floor(
                     CAST(n * ss - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)
                          AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                     / 1000000.0) AS BIGINT) AS var_micro
            FROM stats
        """,
        "q150_interval_merge": """
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s, event_id,
                     epoch_us(ts) + 1800000000 AS e
              FROM events),
            marked AS (
              SELECT user_id, s, e,
                     CASE WHEN s > COALESCE(
                            MAX(e) OVER (PARTITION BY user_id
                                         ORDER BY s, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), -1)
                          THEN 1 ELSE 0 END AS new_island,
                     event_id
              FROM iv),
            isl AS (
              SELECT user_id, s, e,
                     SUM(new_island) OVER (PARTITION BY user_id
                                           ORDER BY s, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS island
              FROM marked),
            merged AS (
              SELECT user_id, island, MIN(s) AS is_, MAX(e) AS ie
              FROM isl GROUP BY 1, 2)
            SELECT user_id, COUNT(*) AS n_intervals,
                   CAST(SUM(ie - is_) AS BIGINT) AS covered_us
            FROM merged GROUP BY 1
        """,
        "q151_topk_with_others": """
            WITH per_nation AS MATERIALIZED (
              SELECT n_name,
                     SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY 1),
            top AS (
              SELECT n_name, rev FROM per_nation
              QUALIFY ROW_NUMBER() OVER (ORDER BY rev DESC, n_name) <= 5)
            SELECT n_name AS nation, CAST(rev AS DOUBLE) AS revenue,
                   CAST(1 AS BIGINT) AS n_nations
            FROM top
            UNION ALL
            SELECT 'OTHER' AS nation,
                   CAST(SUM(rev) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_nations
            FROM per_nation
            WHERE n_name NOT IN (SELECT n_name FROM top)
        """,
        "q152_ab_test": """
            WITH per_user AS (
              SELECT user_id,
                     CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                        THEN 1 ELSE 0 END) * 5 >= COUNT(*)
                          THEN 1 ELSE 0 END AS converted
              FROM events GROUP BY 1),
            arms AS (
              SELECT user_id % 2 AS arm, COUNT(*) AS n,
                     CAST(SUM(converted) AS BIGINT) AS conv
              FROM per_user GROUP BY 1),
            a AS (SELECT n AS na, conv AS ca FROM arms WHERE arm = 0),
            b AS (SELECT n AS nb, conv AS cb FROM arms WHERE arm = 1)
            SELECT na, ca, nb, cb,
                   CAST(ca * 1000000 // na AS BIGINT) AS rate_a_ppm,
                   CAST(cb * 1000000 // nb AS BIGINT) AS rate_b_ppm,
                   CASE WHEN sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                            * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                            * (1.0 / na + 1.0 / nb)) > 0.0
                        THEN CAST(floor(
                     (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                     / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                            * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                            * (1.0 / na + 1.0 / nb))
                     * 1000000) AS BIGINT) END AS z_micro
            FROM a, b
        """,
        "q153_benford_digits": """
            WITH cnt AS MATERIALIZED (
              SELECT CAST(substr(regexp_replace(
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                       '[^1-9]', '', 'g'), 1, 1) AS INT) AS d,
                     COUNT(*) AS n
              FROM orders GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cnt),
            ex AS (SELECT * FROM (VALUES
                     (1, 301029), (2, 176091), (3, 124938), (4, 96910),
                     (5, 79181), (6, 66946), (7, 57991), (8, 51152),
                     (9, 45757)) e(d, exp_ppm))
            SELECT d, n,
                   CAST(n * 1000000 // t AS BIGINT) AS obs_ppm,
                   exp_ppm,
                   CAST((n * 1000000 // t - exp_ppm)
                        * (n * 1000000 // t - exp_ppm)
                        // exp_ppm AS BIGINT) AS dev
            FROM cnt JOIN ex USING (d), tot
        """,
        "q154_knn_classify": """
            WITH e AS (SELECT vec_id, label,
                              list_transform(embedding, x -> x::DOUBLE) AS v
                       FROM embeddings),
            q AS (SELECT vec_id AS qid, label AS tlabel, v AS qv
                  FROM e WHERE vec_id < 50),
            t AS (SELECT vec_id, label, v FROM e WHERE vec_id >= 50),
            scored AS (
              SELECT qid, t.vec_id AS nid, t.label AS nlabel,
                     list_reduce(list_transform(list_zip(qv, v),
                                                x -> x[1] * x[2]),
                                 (a, b) -> a + b)
                       / (sqrt(list_reduce(list_transform(qv, x -> x * x),
                                           (a, b) -> a + b))
                          * sqrt(list_reduce(list_transform(v, x -> x * x),
                                             (a, b) -> a + b))) AS sim
              FROM t, q),
            top AS (
              SELECT qid, nlabel FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                             ORDER BY sim DESC, nid) AS rank
                FROM scored)
              WHERE rank <= 5),
            votes AS (SELECT qid, nlabel, COUNT(*) AS votes
                      FROM top GROUP BY 1, 2),
            pred AS (
              SELECT qid, nlabel, votes FROM votes
              QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY votes DESC, nlabel) = 1)
            SELECT p.qid AS query_id, p.nlabel AS pred_label, p.votes,
                   q2.tlabel AS true_label,
                   p.nlabel = q2.tlabel AS correct
            FROM pred p JOIN q q2 ON q2.qid = p.qid
        """,
        "q155_degree_powerlaw": """
            WITH b AS MATERIALIZED (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e0 AS MATERIALIZED (
              SELECT a.l_partkey AS p1, c.l_partkey AS p2
              FROM b a JOIN b c
                ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            sym AS (SELECT p1, p2 FROM e0
                    UNION ALL SELECT p2 AS p1, p1 AS p2 FROM e0),
            deg AS (SELECT p1, COUNT(*) AS degree FROM sym GROUP BY 1),
            hist AS (SELECT degree, COUNT(*) AS n_nodes
                     FROM deg GROUP BY 1),
            pts AS (
              SELECT CAST(floor(ln(CAST(degree AS DOUBLE)) * 1000000)
                          AS BIGINT) AS x,
                     CAST(floor(ln(CAST(n_nodes AS DOUBLE)) * 1000000)
                          AS BIGINT) AS y
              FROM hist),
            s AS (
              SELECT COUNT(*) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
                     SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
              FROM pts)
            SELECT n,
                   CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) * 1000000) AS BIGINT) AS slope_micro,
                   CAST(floor((CAST(sy AS DOUBLE)
                               - CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) * CAST(sx AS DOUBLE)) / n)
                        AS BIGINT) AS intercept_micro
            FROM s
        """,
        "q156_trend_forecast": """
            WITH cnt AS MATERIALIZED (
              SELECT event_type, epoch_us(ts) // 3600000000 AS h,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            span AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
                     FROM cnt GROUP BY 1),
            grid AS (SELECT event_type, h0, h1,
                            unnest(range(h0, h1 + 1)) AS h
                     FROM span),
            series AS (
              SELECT g.event_type, g.h1, g.h - g.h0 AS x,
                     COALESCE(c.n, 0) AS y
              FROM grid g LEFT JOIN cnt c
                ON c.event_type = g.event_type AND c.h = g.h),
            s AS (
              SELECT event_type, COUNT(*) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
                     SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
              FROM series GROUP BY 1)
            SELECT event_type, n,
                   CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) * 1000000) AS BIGINT) AS slope_micro,
                   CAST(floor(((CAST(sy AS DOUBLE) - CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) * CAST(sx AS DOUBLE)) / n) * 1000000) AS BIGINT)
                     AS intercept_micro,
                   CAST(floor((((CAST(sy AS DOUBLE) - CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) * CAST(sx AS DOUBLE)) / n) + CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) * CAST(n AS DOUBLE))
                              * 1000000) AS BIGINT) AS next_hour_micro
            FROM s
        """,
        "q157_funnel_latency": """
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                       FROM events),
            fv AS (SELECT user_id, MIN(us) AS v0 FROM e
                   WHERE event_type = 'view' GROUP BY 1),
            lat AS (
              SELECT e.user_id, MIN(us) - MIN(v0) AS latency_us
              FROM e JOIN fv USING (user_id)
              WHERE event_type = 'purchase' AND us > v0
              GROUP BY 1),
            ranked AS (
              SELECT latency_us,
                     ROW_NUMBER() OVER (ORDER BY latency_us) AS rn,
                     COUNT(*) OVER () AS n
              FROM lat)
            SELECT MAX(CASE WHEN rn = greatest(1,
                         CAST(ceil(0.25 * n) AS BIGINT))
                            THEN latency_us END) AS p25_us,
                   MAX(CASE WHEN rn = greatest(1,
                         CAST(ceil(0.5 * n) AS BIGINT))
                            THEN latency_us END) AS p50_us,
                   MAX(CASE WHEN rn = greatest(1,
                         CAST(ceil(0.9 * n) AS BIGINT))
                            THEN latency_us END) AS p90_us
            FROM ranked
        """,
        "q158_user_features": """
            SELECT user_id,
                   COUNT(*) AS n_events,
                   COUNT(DISTINCT event_type) AS n_types,
                   COUNT(DISTINCT epoch_us(ts) // 86400000000)
                     AS active_days,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_value,
                   MIN(epoch_us(ts)) AS first_us,
                   MAX(epoch_us(ts)) AS last_us,
                   MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_purchases,
                   CAST(COUNT(*) * 1000000
                        // COUNT(DISTINCT epoch_us(ts) // 86400000000)
                        AS BIGINT) AS events_per_day_ppm
            FROM events GROUP BY user_id
        """,
        "q159_langid_confusion": f"""
            WITH {_LANGID_CTES},
            cells AS MATERIALIZED (
              SELECT d.lang, p.pred_lang, COUNT(*) AS n
              FROM documents d JOIN lpred p USING (doc_id)
              GROUP BY 1, 2),
            tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS t
                    FROM cells GROUP BY 1)
            SELECT cells.lang AS actual, pred_lang AS predicted, n,
                   CAST(n * 1000000 // t AS BIGINT) AS share_ppm
            FROM cells JOIN tot USING (lang)
        """,
        "q160_lsh_recall_audit": f"""
            WITH sig AS ({_SIG_SQL}),
            words AS MATERIALIZED (
              SELECT DISTINCT doc_id AS id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            sizes AS (SELECT id, COUNT(*) AS nw FROM words GROUP BY id),
            inter AS MATERIALIZED (
              SELECT wa.id AS a, wb.id AS b, COUNT(*) AS n_inter
              FROM words wa JOIN words wb
                ON wb.word = wa.word AND wa.id < wb.id
              GROUP BY 1, 2),
            truth AS MATERIALIZED (
              SELECT a, b FROM inter
              JOIN sizes sa ON sa.id = a
              JOIN sizes sb ON sb.id = b
              WHERE n_inter / (sa.nw + sb.nw - n_inter) >= 0.8),
            cands AS MATERIALIZED (
              SELECT DISTINCT l.id AS a, r.id AS b
              FROM sig l JOIN sig r
                ON l.band = r.band AND l.minhash = r.minhash
               AND l.id < r.id),
            hits AS MATERIALIZED (
              SELECT c.a, c.b FROM cands c
              JOIN inter i ON i.a = c.a AND i.b = c.b
              JOIN sizes sa ON sa.id = c.a
              JOIN sizes sb ON sb.id = c.b
              WHERE n_inter / (sa.nw + sb.nw - n_inter) >= 0.8),
            found AS (SELECT t.a FROM truth t
                      JOIN hits h ON h.a = t.a AND h.b = t.b)
            SELECT (SELECT COUNT(*) FROM truth) AS n_true,
                   (SELECT COUNT(*) FROM cands) AS n_lsh_candidates,
                   (SELECT COUNT(*) FROM hits) AS n_lsh_verified,
                   (SELECT COUNT(*) FROM found) AS n_found,
                   CAST((SELECT COUNT(*) FROM found) * 1000000
                        // (SELECT COUNT(*) FROM truth) AS BIGINT)
                     AS recall_ppm
        """,
        "q161_ks_test": """
            WITH cnt AS (
              SELECT value,
                     CAST(SUM(CASE WHEN event_type = 'view'
                                   THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                     CAST(SUM(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END) AS BIGINT) AS c2
              FROM events
              WHERE event_type IN ('view', 'purchase')
              GROUP BY 1),
            cum AS (
              SELECT value,
                     SUM(c1) OVER (ORDER BY value
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum1,
                     SUM(c2) OVER (ORDER BY value
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum2
              FROM cnt),
            tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                           CAST(SUM(c2) AS BIGINT) AS n2
                    FROM cnt)
            SELECT n1, n2,
                   CAST(floor(
                     CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                     * 1000000) AS BIGINT) AS d_ppm
            FROM cum, tot
            GROUP BY n1, n2
        """,
        "q162_rare_category_collapse": """
            WITH hist AS (
              SELECT p_type, COUNT(*) AS n FROM part GROUP BY 1)
            SELECT CASE WHEN n < 10 THEN 'OTHER' ELSE p_type END
                     AS category,
                   CAST(SUM(n) AS BIGINT) AS n_parts,
                   COUNT(*) AS n_merged_types
            FROM hist
            GROUP BY 1
        """,
        "q163_k_anonymity": """
            WITH g AS (
              SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
              FROM customer GROUP BY 1, 2)
            SELECT COUNT(*) AS n_groups,
                   CAST(SUM(n) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_unsafe_groups,
                   CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                     AS n_suppressed_rows,
                   CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) * 1000000
                        // SUM(n) AS BIGINT) AS suppressed_ppm
            FROM g
        """,
        "q164_media_dedup_clusters": f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({_AHASH_PAIRS_SQL}),
            sym AS MATERIALIZED (
              SELECT a, b FROM pairs
              UNION
              SELECT b AS a, a AS b FROM pairs),
            nodes AS (SELECT DISTINCT a AS node FROM sym),
            reach AS (
              SELECT node, node AS peer FROM nodes
              UNION
              SELECT r.node, s.b AS peer
              FROM reach r JOIN sym s ON r.peer = s.a),
            comp AS (
              SELECT node, MIN(peer) AS component FROM reach GROUP BY node)
            SELECT component, COUNT(*) AS n_members,
                   md5(string_agg(CAST(node AS VARCHAR), ','
                                  ORDER BY node)) AS members_hash
            FROM comp GROUP BY component
        """,
        "q165_cross_perplexity": f"""
            WITH dw AS MATERIALIZED (
              SELECT doc_id, source, w, COUNT(*) AS c
              FROM (SELECT doc_id, source, unnest({_TOKS}) AS w
                    FROM documents)
              GROUP BY 1, 2, 3),
            ref AS (
              SELECT w, CAST(SUM(c) AS BIGINT) AS ca
              FROM dw
              WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
              GROUP BY 1),
            ta AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta FROM ref),
            vocab AS (SELECT COUNT(DISTINCT w) AS v FROM dw),
            terms AS (
              SELECT d.w,
                     CAST(floor(
                       ln(CAST(COALESCE(ca, 0) + 1 AS DOUBLE) / (ta + v))
                       * 1000000) AS BIGINT) AS term
              FROM (SELECT DISTINCT w FROM dw) d
              LEFT JOIN ref USING (w), ta, vocab)
            SELECT doc_id, source, CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(SUM(c * term) AS BIGINT) AS logprob_micro
            FROM dw JOIN terms USING (w)
            GROUP BY 1, 2
        """,
        "q166_vocab_overlap": f"""
            WITH sw AS MATERIALIZED (
              SELECT DISTINCT source, w
              FROM (SELECT source, unnest({_TOKS}) AS w FROM documents)),
            sizes AS (SELECT source, COUNT(*) AS nv FROM sw GROUP BY 1),
            shared AS (
              SELECT l.source AS src_a, r.source AS src_b,
                     COUNT(*) AS n_shared
              FROM sw l JOIN sw r
                ON l.w = r.w AND l.source < r.source
              GROUP BY 1, 2)
            SELECT src_a, src_b, n_shared,
                   sa.nv AS na, sb.nv AS nb,
                   CAST(n_shared * 1000000 // (sa.nv + sb.nv - n_shared)
                        AS BIGINT) AS jaccard_ppm
            FROM shared
            JOIN sizes sa ON sa.source = src_a
            JOIN sizes sb ON sb.source = src_b
        """,
        "q167_item_similarity": """
            WITH b AS MATERIALIZED (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            sized AS (SELECT l_orderkey FROM b GROUP BY 1
                      HAVING COUNT(*) >= 2),
            bb AS MATERIALIZED (
              SELECT b.l_orderkey, l_partkey FROM b
              JOIN sized USING (l_orderkey)),
            pairs AS (
              SELECT x.l_partkey AS p1, y.l_partkey AS p2,
                     COUNT(*) AS nij
              FROM bb x JOIN bb y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_partkey < y.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            freq AS (SELECT l_partkey AS item, COUNT(*) AS ni
                     FROM bb GROUP BY 1),
            sym AS (
              SELECT p1, p2, nij FROM pairs
              UNION ALL
              SELECT p2 AS p1, p1 AS p2, nij FROM pairs),
            scored AS (
              SELECT s.p1 AS item, s.p2 AS neighbor, nij,
                     CAST(floor(
                       CAST(nij AS DOUBLE)
                       / sqrt(CAST(fa.ni AS DOUBLE) * fb.ni)
                       * 1000000) AS BIGINT) AS sim_micro
              FROM sym s
              JOIN freq fa ON fa.item = s.p1
              JOIN freq fb ON fb.item = s.p2)
            SELECT item, neighbor, nij, sim_micro,
                   CAST(rank AS INTEGER) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY item
                                               ORDER BY sim_micro DESC,
                                                        neighbor) AS rank
                  FROM scored)
            WHERE rank <= 5
        """,
        "q168_link_prediction": """
            WITH b AS MATERIALIZED (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e0 AS MATERIALIZED (
              SELECT a.l_partkey AS p1, c.l_partkey AS p2
              FROM b a JOIN b c
                ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            sym AS MATERIALIZED (
              SELECT p1, p2 FROM e0
              UNION ALL SELECT p2 AS p1, p1 AS p2 FROM e0),
            deg AS (SELECT p1, COUNT(*) AS deg FROM sym GROUP BY 1),
            wedges AS (
              SELECT l.p2 AS a, r.p2 AS b, COUNT(*) AS n_common
              FROM sym l JOIN sym r
                ON l.p1 = r.p1 AND l.p2 < r.p2
              GROUP BY 1, 2),
            cand AS (
              SELECT w.* FROM wedges w
              WHERE NOT EXISTS (SELECT 1 FROM e0
                                WHERE e0.p1 = w.a AND e0.p2 = w.b))
            SELECT a, b, n_common,
                   CAST(n_common * 1000000 // (da.deg + db.deg - n_common)
                        AS BIGINT) AS jaccard_ppm
            FROM cand
            JOIN deg da ON da.p1 = a
            JOIN deg db ON db.p1 = b
            ORDER BY jaccard_ppm DESC, a, b
            LIMIT 20
        """,
        "q169_readability": f"""
            WITH base AS (
              SELECT doc_id, text, {_TOKS} AS toks FROM documents),
            m AS (
              SELECT doc_id,
                     len(toks) AS n_words,
                     greatest(1, CAST(regexp_extract_all(text, '[.!?]+')
                                      .len() AS INT)) AS n_sents,
                     CAST(list_aggregate(
                       list_transform(toks,
                         w -> greatest(1,
                              CAST(len(regexp_extract_all(w, '[aeiouy]+'))
                                   AS INT))),
                       'sum') AS INT) AS n_syllables
              FROM base
              WHERE len(toks) > 0)
            SELECT doc_id, n_words, n_sents, n_syllables,
                   CAST(floor(
                     (206.835
                      - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                      - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
                     * 1000) AS BIGINT) AS flesch_milli
            FROM m
        """,
        "q170_duplicate_payments": """
            WITH ev AS (
              SELECT user_id, event_id,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents,
                     epoch_us(ts) AS us
              FROM events),
            l AS (
              SELECT *, lag(us) OVER w AS prev_us,
                     lag(event_id) OVER w AS prev_id
              FROM ev
              WINDOW w AS (PARTITION BY user_id, cents
                           ORDER BY us, event_id))
            SELECT user_id, cents, prev_id AS first_event_id,
                   event_id AS dup_event_id, us - prev_us AS gap_us
            FROM l WHERE us - prev_us <= 604800000000
        """,
        "q171_cycle_time": """
            WITH g AS (
              SELECT o_orderpriority,
                     CAST(CAST(l_shipdate AS DATE)
                          - CAST(o_orderdate AS DATE) AS INTEGER) AS days
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            ranked AS (
              SELECT o_orderpriority, days,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                        ORDER BY days) AS rn,
                     COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
              FROM g)
            SELECT o_orderpriority,
                   MAX(CASE WHEN rn = greatest(1,
                         CAST(ceil(0.5 * n) AS BIGINT))
                            THEN days END) AS p50,
                   MAX(CASE WHEN rn = greatest(1,
                         CAST(ceil(0.9 * n) AS BIGINT))
                            THEN days END) AS p90,
                   MAX(CASE WHEN rn = greatest(1,
                         CAST(ceil(0.99 * n) AS BIGINT))
                            THEN days END) AS p99
            FROM ranked GROUP BY 1
        """,
        "q172_boilerplate_lines": """
            WITH ds AS MATERIALIZED (
              SELECT DISTINCT doc_id, md5(s) AS h
              FROM (
                SELECT doc_id,
                       unnest(list_filter(
                         list_transform(string_split(text, '.'),
                                        s -> trim(lower(s))),
                         s -> length(s) >= 20)) AS s
                FROM documents)),
            common AS (SELECT h FROM ds GROUP BY h HAVING COUNT(*) >= 5),
            per_doc AS (SELECT doc_id, COUNT(*) AS n_sents
                        FROM ds GROUP BY 1),
            bp AS (SELECT doc_id, COUNT(*) AS n_boiler
                   FROM ds JOIN common USING (h) GROUP BY 1)
            SELECT doc_id, n_sents, COALESCE(n_boiler, 0) AS n_boiler,
                   CAST((COALESCE(n_boiler, 0) * 1000000) // n_sents
                        AS BIGINT) AS boiler_ppm
            FROM per_doc LEFT JOIN bp USING (doc_id)
        """,
        "q173_window_funnel": """
            WITH seq AS (
              SELECT user_id,
                     list(struct_pack(us := epoch_us(ts),
                                      eid := event_id,
                                      et := event_type)
                          ORDER BY epoch_us(ts), event_id) AS sq
              FROM events GROUP BY 1),
            folded AS (
              SELECT user_id,
                     list_reduce(
                       list_transform(sq, e -> struct_pack(
                         t0 := CASE WHEN e.et = 'view'
                                    THEN e.us ELSE CAST(0 AS BIGINT) END,
                         stage := CASE WHEN e.et = 'view'
                                       THEN 1 ELSE 0 END,
                         us := e.us, et := e.et)),
                       (acc, x) -> struct_pack(
                         t0 := CASE WHEN acc.stage = 0 AND x.et = 'view'
                                    THEN x.us ELSE acc.t0 END,
                         stage := CASE
                           WHEN acc.stage = 0 AND x.et = 'view' THEN 1
                           WHEN acc.stage = 1 AND x.et = 'click'
                                AND x.us - acc.t0 <= 604800000000 THEN 2
                           WHEN acc.stage = 2 AND x.et = 'purchase'
                                AND x.us - acc.t0 <= 604800000000 THEN 3
                           ELSE acc.stage END,
                         us := x.us, et := x.et)) AS st
              FROM seq)
            SELECT CAST(SUM(CASE WHEN st.stage >= 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS s1_view,
                   CAST(SUM(CASE WHEN st.stage >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS s2_click,
                   CAST(SUM(CASE WHEN st.stage >= 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS s3_purchase_7d
            FROM folded
        """,
        "q174_pareto_8020": """
            WITH per_cust AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            keyed AS (
              SELECT o_custkey, cents,
                     -cents * 1000000000 + o_custkey AS ord
              FROM per_cust),
            cum AS (
              SELECT *, CAST(SUM(cents) OVER (ORDER BY ord
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_cents
              FROM keyed),
            tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t,
                           COUNT(*) AS n_customers
                    FROM per_cust),
            r AS (SELECT * FROM cum, tot WHERE cum_cents * 5 >= t * 4)
            SELECT n_customers,
                   n_customers - COUNT(*) + 1 AS n_top,
                   CAST((n_customers - COUNT(*) + 1) * 1000000
                        // n_customers AS BIGINT) AS top_share_ppm,
                   CAST(MIN(cum_cents) * 1000000 // MIN(t) AS BIGINT)
                     AS revenue_share_ppm
            FROM r GROUP BY n_customers
        """,
        "q175_zscore_normalize": """
            WITH ev AS (
              SELECT event_type, event_id,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
              FROM events),
            stats AS (
              SELECT event_type, COUNT(*) AS n,
                     CAST(SUM(cents) AS BIGINT) AS s,
                     SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
                       AS ss
              FROM ev GROUP BY 1)
            SELECT event_type, event_id,
                   CASE WHEN CAST(n * ss - CAST(s AS HUGEINT)
                                  * CAST(s AS HUGEINT) AS DOUBLE) > 0.0
                        THEN CAST(floor(
                          (CAST(cents AS DOUBLE) * n - s)
                          / sqrt(CAST(n * ss - CAST(s AS HUGEINT)
                                       * CAST(s AS HUGEINT) AS DOUBLE))
                          * 1000000) AS BIGINT)
                   END AS z_micro
            FROM ev JOIN stats USING (event_type)
        """,
        "q176_rolling_active_users": """
            WITH ud AS MATERIALIZED (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events),
            dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
            expanded AS (
              SELECT user_id, day + k AS wend
              FROM ud, (SELECT unnest(range(7)) AS k)),
            wau AS (SELECT wend, COUNT(DISTINCT user_id) AS wau
                    FROM expanded GROUP BY 1)
            SELECT day, dau, wau,
                   CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
            FROM dau JOIN wau ON day = wend
        """,
        "q177_association_rules": """
            WITH baskets AS MATERIALIZED (
              SELECT l_orderkey,
                     list_sort(list(DISTINCT l_partkey)) AS parts
              FROM lineitem GROUP BY 1),
            nbt AS (SELECT COUNT(*) AS nb FROM baskets),
            bb AS MATERIALIZED (
              SELECT l_orderkey, unnest(parts) AS item FROM baskets),
            freq AS (SELECT item, COUNT(*) AS ni FROM bb GROUP BY 1),
            pairs AS (
              SELECT x.item AS p1, y.item AS p2, COUNT(*) AS nij
              FROM bb x JOIN bb y
                ON x.l_orderkey = y.l_orderkey AND x.item < y.item
              GROUP BY 1, 2 HAVING COUNT(*) >= 3)
            SELECT p1, p2, nij,
                   CAST(nij * 1000000 // nb AS BIGINT) AS support_ppm,
                   CAST(nij * 1000000 // fa.ni AS BIGINT) AS conf_ppm,
                   -- HUGEINT: the three-count product overflows BIGINT at
                   -- scale (mirrors the Spark side's DECIMAL(38,0))
                   CAST(CAST(nij AS HUGEINT) * nb * 1000000
                        // (CAST(fa.ni AS HUGEINT) * fb.ni) AS BIGINT)
                     AS lift_ppm
            FROM pairs
            JOIN freq fa ON fa.item = p1
            JOIN freq fb ON fb.item = p2, nbt
            ORDER BY lift_ppm DESC, p1, p2
            LIMIT 20
        """,
        "q178_ewma_smoothing": """
            WITH cnt AS MATERIALIZED (
              SELECT event_type, epoch_us(ts) // 3600000000 AS h,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            span AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
                     FROM cnt GROUP BY 1),
            grid AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS h
                     FROM span),
            series AS (
              SELECT g.event_type,
                     list(CAST(COALESCE(c.n, 0) AS DOUBLE)
                          ORDER BY g.h) AS seq
              FROM grid g LEFT JOIN cnt c
                ON c.event_type = g.event_type AND c.h = g.h
              GROUP BY 1)
            SELECT event_type,
                   CAST(len(seq) AS INTEGER) AS n_hours,
                   CAST(floor(list_reduce(seq,
                     (acc, x) -> acc + 0.3 * (x - acc)) * 1000000)
                     AS BIGINT) AS level_micro
            FROM series
        """,
        "q179_lsh_bucket_skew": f"""
            WITH sig AS ({_SIG_SQL}),
            buckets AS (
              SELECT band, minhash, COUNT(*) AS c
              FROM sig GROUP BY 1, 2)
            SELECT band,
                   COUNT(*) AS n_buckets,
                   CAST(MAX(c) AS BIGINT) AS max_bucket,
                   CAST(SUM(CASE WHEN c > 16 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_fat,
                   CAST(SUM(c * (c - 1) // 2) AS BIGINT)
                     AS n_candidate_pairs
            FROM buckets GROUP BY band
        """,
        "q180_cohort_ltv": """
            WITH ev AS (
              SELECT user_id, value,
                     epoch_us(ts) // 604800000000 AS wk
              FROM events),
            first AS (SELECT user_id, MIN(wk) AS cohort
                      FROM ev GROUP BY 1),
            aged AS (
              SELECT cohort, wk - cohort AS age_weeks,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
              FROM ev JOIN first USING (user_id)),
            cell AS (
              SELECT cohort, age_weeks,
                     CAST(SUM(cents) AS BIGINT) AS cents,
                     COUNT(*) AS n_events
              FROM aged GROUP BY 1, 2)
            SELECT cohort, age_weeks, n_events,
                   CAST(SUM(cents) OVER (PARTITION BY cohort
                                         ORDER BY age_weeks
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT)
                     AS cum_cents
            FROM cell
        """,
        "q181_zipf_fit": f"""
            WITH wc AS (
              SELECT w, COUNT(*) AS c
              FROM (SELECT unnest({_TOKS}) AS w FROM documents)
              GROUP BY 1),
            ranked AS (
              SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w)
                             AS BIGINT) AS rank
              FROM wc
              QUALIFY rank <= 1000),
            pts AS (
              SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000)
                          AS BIGINT) AS x,
                     CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000)
                          AS BIGINT) AS y
              FROM ranked),
            s AS (
              SELECT COUNT(*) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
                     SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
              FROM pts)
            SELECT n, CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) * 1000000) AS BIGINT) AS slope_micro
            FROM s
        """,
        "q182_cross_source_dups": f"""
            WITH sig AS ({_SIG_SQL}),
            cands AS (
              SELECT DISTINCT l.id AS a, r.id AS b
              FROM sig l JOIN sig r
                ON l.band = r.band AND l.minhash = r.minhash
               AND l.id < r.id),
            words AS (
              SELECT DISTINCT doc_id AS id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            sizes AS (SELECT id, COUNT(*) AS nw FROM words GROUP BY id),
            hits AS (
              SELECT a, b FROM (
                SELECT c.a, c.b, COUNT(*) AS n_inter
                FROM cands c
                JOIN words wa ON wa.id = c.a
                JOIN words wb ON wb.id = c.b AND wb.word = wa.word
                GROUP BY 1, 2) i
              JOIN sizes sa ON sa.id = i.a
              JOIN sizes sb ON sb.id = i.b
              WHERE n_inter / (sa.nw + sb.nw - n_inter) >= 0.8)
            SELECT least(da.source, db.source) AS src_a,
                   greatest(da.source, db.source) AS src_b,
                   COUNT(*) AS n_dup_pairs
            FROM hits
            JOIN documents da ON da.doc_id = a
            JOIN documents db ON db.doc_id = b
            GROUP BY 1, 2
        """,
        "q183_gini_index": """
            WITH spend AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            x AS (
              SELECT c_nationkey, cents, c_custkey
              FROM customer JOIN spend ON c_custkey = o_custkey),
            ranked AS (
              SELECT c_nationkey, cents,
                     CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                             ORDER BY cents, c_custkey)
                          AS BIGINT) AS i
              FROM x),
            s AS (
              SELECT c_nationkey, COUNT(*) AS n_customers,
                     CAST(SUM(cents) AS BIGINT) AS sx,
                     SUM(CAST(i AS HUGEINT) * CAST(cents AS HUGEINT)) AS six
              FROM ranked GROUP BY 1)
            SELECT c_nationkey, n_customers,
                   CAST(floor(
                     CAST(2 * six - (CAST(n_customers AS HUGEINT) + 1)
                          * CAST(sx AS HUGEINT) AS DOUBLE)
                     / CAST(CAST(n_customers AS HUGEINT)
                            * CAST(sx AS HUGEINT) AS DOUBLE)
                     * 1000000) AS BIGINT) AS gini_ppm
            FROM s
        """,
        "q184_mann_whitney": """
            WITH cust AS (
              SELECT c_custkey,
                     CASE WHEN c_mktsegment = 'BUILDING' THEN 1
                          ELSE 0 END AS g
              FROM customer
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
            obs AS (
              SELECT g,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
              FROM orders JOIN cust ON o_custkey = c_custkey),
            byval AS (
              SELECT cents, CAST(SUM(g) AS BIGINT) AS n1v,
                     COUNT(*) AS nv
              FROM obs GROUP BY 1),
            ranked AS (
              SELECT n1v, nv,
                     COALESCE(SUM(nv) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cumb
              FROM byval),
            s AS (
              SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
                     CAST(SUM(nv - n1v) AS BIGINT) AS n2,
                     SUM(CAST(n1v AS HUGEINT)
                         * CAST(2 * cumb + nv + 1 AS HUGEINT)) AS r1x2,
                     SUM(CAST(nv AS HUGEINT) * CAST(nv AS HUGEINT)
                         * CAST(nv AS HUGEINT) - CAST(nv AS HUGEINT))
                       AS ties
              FROM ranked)
            SELECT n1, n2,
                   CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT)
                     AS u1_x2,
                   CAST(floor(
                     CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1)
                          - CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
                     / (2 * sqrt(
                         CAST(CAST(n1 AS HUGEINT) * n2
                              * ((CAST(n1 + n2 AS HUGEINT) + 1)
                                 * (n1 + n2) * (n1 + n2 - 1) - ties)
                              AS DOUBLE)
                         / CAST(12 * CAST(n1 + n2 AS HUGEINT)
                                * (n1 + n2 - 1) AS DOUBLE)))
                     * 1000000) AS BIGINT) AS z_micro
            FROM s
        """,
        "q185_kaplan_meier": """
            WITH per_user AS (
              SELECT user_id, epoch_us(MIN(ts)) AS t0,
                     epoch_us(MIN(CASE WHEN event_type = 'purchase'
                                        AND value >= 95
                                       THEN ts END)) AS td
              FROM events GROUP BY 1),
            horizon AS (SELECT epoch_us(MAX(ts)) AS tmax FROM events),
            dur AS MATERIALIZED (
              SELECT CASE WHEN td IS NOT NULL
                          THEN (td - t0) // 86400000000
                          ELSE (tmax - t0) // 86400000000 END AS day,
                     CASE WHEN td IS NOT NULL THEN 1 ELSE 0 END
                       AS observed
              FROM per_user, horizon),
            n_total AS (SELECT COUNT(*) AS n FROM dur),
            byday AS (
              SELECT day, CAST(SUM(observed) AS BIGINT) AS d,
                     COUNT(*) AS leaving
              FROM dur GROUP BY 1),
            risk AS (
              SELECT day, d,
                     n - COALESCE(SUM(leaving) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS at_risk
              FROM byday, n_total
              QUALIFY d > 0),
            terms AS (
              SELECT day, d, at_risk,
                     CAST(floor(ln(1.0 - CAST(d AS DOUBLE)
                                   / CAST(at_risk AS DOUBLE))
                                * 1000000) AS BIGINT) AS t_micro
              FROM risk WHERE d < at_risk)
            SELECT day, d, CAST(at_risk AS BIGINT) AS at_risk,
                   CAST(SUM(t_micro) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS ln_surv_micro
            FROM terms
        """,
        "q186_clustering_coefficient": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            edges AS MATERIALIZED (
              SELECT a.l_partkey AS p1, c.l_partkey AS p2
              FROM b a JOIN b c
                ON a.l_orderkey = c.l_orderkey
               AND a.l_partkey < c.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            tri AS MATERIALIZED (
              SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
              FROM edges e1
              JOIN edges e2 ON e1.p2 = e2.p1
              WHERE EXISTS (SELECT 1 FROM edges e3
                            WHERE e3.p1 = e1.p1 AND e3.p2 = e2.p2)),
            corners AS (
              SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri),
            ntri AS (SELECT node, COUNT(*) AS n_tri FROM corners
                     GROUP BY 1),
            ends AS (
              SELECT p1 AS node FROM edges
              UNION ALL SELECT p2 FROM edges),
            deg AS (SELECT node, COUNT(*) AS deg FROM ends GROUP BY 1)
            SELECT deg.node, deg, COALESCE(n_tri, 0) AS n_tri,
                   CAST(2 * CAST(COALESCE(n_tri, 0) AS HUGEINT) * 1000000
                        // (deg * (deg - 1)) AS BIGINT) AS coeff_ppm
            FROM deg LEFT JOIN ntri ON deg.node = ntri.node
            WHERE deg >= 2
        """,
        "q187_proration": """
            WITH ord AS (
              SELECT o_orderkey,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS t_cents
              FROM orders WHERE o_orderkey % 50 = 0),
            li AS (
              SELECT l_orderkey, l_linenumber, t_cents,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS w
              FROM lineitem JOIN ord ON l_orderkey = o_orderkey),
            staged AS (
              SELECT l_orderkey, l_linenumber, t_cents, w,
                     SUM(w) OVER (PARTITION BY l_orderkey) AS tw,
                     CAST(CAST(t_cents AS HUGEINT) * w
                          // SUM(w) OVER (PARTITION BY l_orderkey)
                          AS BIGINT) AS base
              FROM li),
            remd AS (
              SELECT *,
                     CAST(CAST(t_cents AS HUGEINT) * w
                          - CAST(base AS HUGEINT) * tw AS BIGINT) AS rem
              FROM staged),
            ranked AS (
              SELECT l_orderkey, l_linenumber, base,
                     t_cents - SUM(base) OVER (PARTITION BY l_orderkey)
                       AS leftover,
                     ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                        ORDER BY rem DESC, l_linenumber)
                       AS rn
              FROM remd)
            SELECT l_orderkey, l_linenumber,
                   CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END
                        AS BIGINT) AS alloc_cents
            FROM ranked
        """,
        "q188_autocorrelation": """
            WITH cnt AS MATERIALIZED (
              SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
              FROM events GROUP BY 1),
            span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM cnt),
            grid AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM span),
            d AS MATERIALIZED (
              SELECT g.day, COALESCE(c.c, 0) AS c
              FROM grid g LEFT JOIN cnt c ON c.day = g.day),
            xk AS (
              SELECT day, c AS x, unnest(range(1, 8)) AS lag FROM d),
            pairs AS (
              SELECT lag, x, y.c AS y
              FROM xk JOIN d y ON y.day = xk.day + xk.lag),
            s AS (
              SELECT lag, COUNT(*) AS n_pairs,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     SUM(CAST(x AS HUGEINT) * y) AS sxy,
                     SUM(CAST(x AS HUGEINT) * x) AS sxx,
                     SUM(CAST(y AS HUGEINT) * y) AS syy
              FROM pairs GROUP BY 1)
            SELECT CAST(lag AS INT) AS lag, n_pairs,
                   CAST(floor(
                     CAST(n_pairs * sxy - CAST(sx AS HUGEINT) * sy
                          AS DOUBLE)
                     / (sqrt(CAST(n_pairs * sxx
                                  - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                        * sqrt(CAST(n_pairs * syy
                                    - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                     * 1000000) AS BIGINT) AS r_micro
            FROM s
        """,
        "q189_lexical_diversity": f"""
            WITH wc AS (
              SELECT source, w, COUNT(*) AS c
              FROM (SELECT source, unnest({_TOKS}) AS w FROM documents)
              GROUP BY 1, 2),
            per AS (
              SELECT source,
                     CAST(SUM(c) AS BIGINT) AS n_tokens,
                     COUNT(*) AS n_types,
                     CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hapax
              FROM wc GROUP BY 1)
            SELECT source, n_tokens, n_types, n_hapax,
                   CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_ppm,
                   CAST(n_hapax * 1000000 // n_types AS BIGINT)
                     AS hapax_ppm
            FROM per
        """,
        "q190_throttle_dedup": """
            -- accumulator is ONE BIGINT (last_us * 1000 + kept): DuckDB
            -- 1.0.0 list_reduce corrupts STRUCT accumulators when the
            -- fold runs vectorized over many rows (row-filtered runs are
            -- fine, full-table runs are not) -- scalar state sidesteps it
            WITH per AS (
              SELECT user_id, event_type,
                     list(epoch_us(ts) ORDER BY epoch_us(ts)) AS sq,
                     COUNT(*) AS n_raw
              FROM events GROUP BY 1, 2),
            folded AS (
              SELECT event_type, n_raw,
                     list_reduce(
                       list_transform(sq, x -> x * 1000 + 1),
                       (acc, x) -> CASE
                         WHEN x // 1000 - acc // 1000 >= 300000000
                         THEN x + (acc % 1000)
                         ELSE acc END) AS st
              FROM per)
            SELECT event_type,
                   CAST(SUM(n_raw) AS BIGINT) AS n_raw,
                   CAST(SUM(st % 1000) AS BIGINT) AS n_kept
            FROM folded GROUP BY 1
        """,
        "q191_g2_collocations": f"""
            WITH t AS (SELECT {_TOKS} AS toks FROM documents),
            g AS (
              SELECT unnest(CASE WHEN len(toks) >= 2 THEN
                       [{{'w1': toks[i], 'w2': toks[i+1]}}
                        for i in generate_series(1, len(toks) - 1)]
                     ELSE [] END) AS gg
              FROM t),
            pairs AS MATERIALIZED (
              SELECT gg.w1 AS w1, gg.w2 AS w2 FROM g),
            c12 AS (SELECT w1, w2, COUNT(*) AS c12
                    FROM pairs GROUP BY 1, 2),
            c1 AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY 1),
            c2 AS (SELECT w2, COUNT(*) AS c2 FROM pairs GROUP BY 1),
            tot AS (SELECT COUNT(*) AS nn FROM pairs),
            scored AS (
              SELECT w1, w2, c12,
                     CAST(floor(2 * (
                       (CASE WHEN c12 > 0 THEN CAST(c12 AS DOUBLE)
                          * ln(CAST(c12 AS DOUBLE) * CAST(nn AS DOUBLE)
                               / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
                          ELSE 0.0 END)
                       + (CASE WHEN c1 - c12 > 0
                          THEN CAST(c1 - c12 AS DOUBLE)
                          * ln(CAST(c1 - c12 AS DOUBLE) * CAST(nn AS DOUBLE)
                               / (CAST(c1 AS DOUBLE)
                                  * CAST(nn - c2 AS DOUBLE)))
                          ELSE 0.0 END)
                       + (CASE WHEN c2 - c12 > 0
                          THEN CAST(c2 - c12 AS DOUBLE)
                          * ln(CAST(c2 - c12 AS DOUBLE) * CAST(nn AS DOUBLE)
                               / (CAST(nn - c1 AS DOUBLE)
                                  * CAST(c2 AS DOUBLE)))
                          ELSE 0.0 END)
                       + (CASE WHEN nn - c1 - c2 + c12 > 0
                          THEN CAST(nn - c1 - c2 + c12 AS DOUBLE)
                          * ln(CAST(nn - c1 - c2 + c12 AS DOUBLE)
                               * CAST(nn AS DOUBLE)
                               / (CAST(nn - c1 AS DOUBLE)
                                  * CAST(nn - c2 AS DOUBLE)))
                          ELSE 0.0 END)
                     ) * 1000000) AS BIGINT) AS g2_micro
              FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), tot)
            SELECT w1, w2, c12, g2_micro
            FROM scored
            ORDER BY g2_micro DESC, w1, w2
            LIMIT 20
        """,
        "q192_max_drawdown": """
            WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            cumc AS (
              SELECT day,
                     SUM(cents) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM daily),
            curve AS MATERIALIZED (
              SELECT day, cum,
                     MAX(cum) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - cum AS dd
              FROM cumc),
            mx AS (SELECT MAX(dd) AS max_dd FROM curve)
            SELECT COUNT(*) AS n_trough_days,
                   CAST(MAX(max_dd) AS BIGINT) AS max_drawdown_cents,
                   strftime(MIN(day), '%Y-%m-%d') AS trough_day
            FROM curve, mx
            WHERE dd = max_dd
        """,
        "q193_weekday_anova": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS dnum,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            stats AS (
              SELECT (dnum + 4) % 7 AS dow, COUNT(*) AS ng,
                     CAST(SUM(cents) AS BIGINT) AS sg,
                     SUM(CAST(cents AS HUGEINT) * cents) AS ssg
              FROM daily GROUP BY 1),
            one AS (
              SELECT list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                          / CAST(ng AS DOUBLE) ORDER BY dow) AS terms,
                     CAST(SUM(ng) AS BIGINT) AS n,
                     CAST(SUM(sg) AS BIGINT) AS s,
                     SUM(ssg) AS ss,
                     COUNT(*) AS k
              FROM stats)
            SELECT n, k,
                   CAST(floor(
                     ((list_reduce(terms, (acc, x) -> acc + x)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      / CAST(k - 1 AS DOUBLE))
                     / ((CAST(ss AS DOUBLE)
                         - list_reduce(terms, (acc, x) -> acc + x))
                        / CAST(n - k AS DOUBLE))
                     * 1000000) AS BIGINT) AS f_micro
            FROM one
        """,
        "q194_fano_burstiness": """
            WITH cnt AS MATERIALIZED (
              SELECT event_type, epoch_us(ts) // 3600000000 AS h,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            span AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
                     FROM cnt GROUP BY 1),
            grid AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS h
                     FROM span),
            filled AS (
              SELECT g.event_type, COALESCE(c.n, 0) AS n
              FROM grid g LEFT JOIN cnt c
                ON c.event_type = g.event_type AND c.h = g.h),
            s AS (
              SELECT event_type, COUNT(*) AS n_hours,
                     CAST(SUM(n) AS BIGINT) AS sc,
                     SUM(CAST(n AS HUGEINT) * n) AS ssc
              FROM filled GROUP BY 1)
            SELECT event_type, n_hours,
                   CAST(sc * 1000000 // n_hours AS BIGINT) AS mean_micro,
                   CAST(floor(
                     CAST(n_hours * ssc - CAST(sc AS HUGEINT) * sc
                          AS DOUBLE)
                     / CAST(CAST(n_hours AS HUGEINT) * (n_hours - 1)
                            AS DOUBLE)
                     / (CAST(sc AS DOUBLE) / CAST(n_hours AS DOUBLE))
                     * 1000000) AS BIGINT) AS fano_micro
            FROM s
        """,
        "q195_sequential_patterns": """
            WITH ev AS (
              SELECT user_id, event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     epoch_us(ts) AS us
              FROM events),
            ft AS MATERIALIZED (
              SELECT user_id, day, event_type, MIN(us) AS fus
              FROM ev GROUP BY 1, 2, 3),
            tot AS (
              SELECT COUNT(*) AS n_sessions
              FROM (SELECT DISTINCT user_id, day FROM ft)),
            hits AS (
              SELECT a.event_type AS t_a, b.event_type AS t_b,
                     COUNT(*) AS n_hits
              FROM ft a JOIN ft b
                ON a.user_id = b.user_id AND a.day = b.day
               AND a.event_type != b.event_type AND a.fus < b.fus
              GROUP BY 1, 2)
            SELECT t_a, t_b, n_hits,
                   CAST(n_hits * 1000000 // n_sessions AS BIGINT)
                     AS support_ppm
            FROM hits, tot
        """,
        "q196_session_stats": """
            WITH ev AS (
              SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                     epoch_us(ts) AS us
              FROM events),
            sess AS MATERIALIZED (
              SELECT user_id, day, COUNT(*) AS n_events,
                     MAX(us) - MIN(us) AS dur_us
              FROM ev GROUP BY 1, 2),
            tot AS (
              SELECT COUNT(*) AS n_sessions,
                     CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_bounce,
                     CAST(SUM(dur_us) AS BIGINT) AS sum_dur
              FROM sess),
            ranked AS (
              SELECT dur_us,
                     ROW_NUMBER() OVER (ORDER BY dur_us, user_id, day)
                       AS rn
              FROM sess),
            med AS (
              SELECT dur_us AS median_dur_us
              FROM ranked, tot
              WHERE rn = CAST(ceil(n_sessions / 2.0) AS BIGINT))
            SELECT n_sessions,
                   CAST(n_bounce * 1000000 // n_sessions AS BIGINT)
                     AS bounce_ppm,
                   CAST(sum_dur // n_sessions AS BIGINT) AS mean_dur_us,
                   median_dur_us
            FROM tot, med
        """,
        "q197_lloyd_iteration": """
            WITH seeds AS (
              SELECT embedding, md5(CAST(vec_id AS VARCHAR)) AS h
              FROM embeddings ORDER BY h LIMIT 16),
            cent AS MATERIALIZED (
              SELECT ROW_NUMBER() OVER (ORDER BY h) AS cid,
                     embedding AS cv
              FROM seeds),
            scored AS (
              SELECT vec_id, embedding, cid, cv,
                     list_reduce(list_transform(
                       list_zip(
                         list_transform(embedding,
                                        x -> CAST(x AS DOUBLE)),
                         list_transform(cv, x -> CAST(x AS DOUBLE))),
                       p -> (p[1] - p[2]) * (p[1] - p[2])),
                       (a, b) -> a + b) AS d2
              FROM embeddings, cent),
            assigned AS MATERIALIZED (
              SELECT vec_id, cid, embedding, cv
              FROM scored
              QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY d2, cid) = 1),
            by_dim AS (
              SELECT cid, p.dim AS dim, p.xq AS xq, p.sq AS sq
              FROM (
                SELECT cid,
                       unnest([{'dim': i - 1,
                                'xq': CAST(floor(CAST(embedding[i]
                                       AS DOUBLE) * 1000000) AS BIGINT),
                                'sq': CAST(floor(CAST(cv[i] AS DOUBLE)
                                       * 1000000) AS BIGINT)}
                               for i in generate_series(1,
                                         len(embedding))]) AS p
                FROM assigned)),
            upd AS (
              SELECT cid, dim, COUNT(*) AS n,
                     CASE WHEN SUM(xq) >= 0
                          THEN CAST(SUM(xq) AS BIGINT) // COUNT(*)
                          ELSE -((-CAST(SUM(xq) AS BIGINT)) // COUNT(*))
                     END AS mean_q,
                     MIN(sq) AS sq
              FROM by_dim GROUP BY 1, 2)
            SELECT cid,
                   CAST(MIN(n) AS BIGINT) AS n_members,
                   CAST(SUM(abs(mean_q - sq)) AS BIGINT) AS shift_q,
                   md5(string_agg(CAST(mean_q AS VARCHAR), ','
                                  ORDER BY dim)) AS centroid_hash
            FROM upd GROUP BY cid
        """,
        "q198_bfs_distance": """
            WITH RECURSIVE b AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            edges0 AS MATERIALIZED (
              SELECT a.l_partkey AS p1, c.l_partkey AS p2
              FROM b a JOIN b c
                ON a.l_orderkey = c.l_orderkey
               AND a.l_partkey < c.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            sym AS MATERIALIZED (
              SELECT p1, p2 FROM edges0
              UNION ALL SELECT p2, p1 FROM edges0),
            deg AS (SELECT p1, COUNT(*) AS deg FROM sym GROUP BY 1),
            seed AS (SELECT p1 AS node FROM deg
                     ORDER BY deg DESC, p1 LIMIT 1),
            walk AS (
              SELECT node, 0 AS dist FROM seed
              UNION
              SELECT s.p2, w.dist + 1
              FROM walk w JOIN sym s ON s.p1 = w.node
              WHERE w.dist < 4),
            mind AS (SELECT node, MIN(dist) AS dist FROM walk GROUP BY 1)
            SELECT dist, COUNT(*) AS n_nodes,
                   MIN(node) AS min_node, MAX(node) AS max_node
            FROM mind GROUP BY 1
        """,
        "q199_sorted_neighborhood": f"""
            WITH t AS (
              SELECT doc_id, {_NORM} AS norm, {_TOKS} AS toks
              FROM documents),
            ranked AS MATERIALIZED (
              SELECT doc_id, toks,
                     ROW_NUMBER() OVER (ORDER BY substr(norm, 1, 40),
                                        doc_id) AS rn
              FROM t),
            pairs AS (
              SELECT l.doc_id AS a, r.doc_id AS b,
                     len(list_intersect(list_distinct(l.toks),
                                        list_distinct(r.toks))) AS ii,
                     len(list_distinct(l.toks))
                       + len(list_distinct(r.toks)) AS uu
              FROM ranked l JOIN ranked r
                ON r.rn BETWEEN l.rn + 1 AND l.rn + 3)
            SELECT a, b,
                   CAST(CAST(ii AS BIGINT) * 1000000
                        // CAST(uu - ii AS BIGINT) AS BIGINT)
                     AS jaccard_ppm
            FROM pairs
            WHERE uu > ii AND ii * 2 >= uu - ii
        """,
        "q200_degree_assortativity": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            edges0 AS MATERIALIZED (
              SELECT a.l_partkey AS p1, c.l_partkey AS p2
              FROM b a JOIN b c
                ON a.l_orderkey = c.l_orderkey
               AND a.l_partkey < c.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            sym AS MATERIALIZED (
              SELECT p1, p2 FROM edges0
              UNION ALL SELECT p2, p1 FROM edges0),
            deg AS MATERIALIZED (
              SELECT p1, COUNT(*) AS deg FROM sym GROUP BY 1),
            pts AS (
              SELECT da.deg AS xa, db.deg AS xb
              FROM sym
              JOIN deg da ON da.p1 = sym.p1
              JOIN deg db ON db.p1 = sym.p2),
            s AS (
              SELECT COUNT(*) AS n_edges,
                     CAST(SUM(xa) AS BIGINT) AS sx,
                     CAST(SUM(xb) AS BIGINT) AS sy,
                     SUM(CAST(xa AS HUGEINT) * xb) AS sxy,
                     SUM(CAST(xa AS HUGEINT) * xa) AS sxx,
                     SUM(CAST(xb AS HUGEINT) * xb) AS syy
              FROM pts)
            SELECT n_edges,
                   CAST(floor(
                     CAST(n_edges * sxy - CAST(sx AS HUGEINT) * sy
                          AS DOUBLE)
                     / (sqrt(CAST(n_edges * sxx
                                  - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                        * sqrt(CAST(n_edges * syy
                                    - CAST(sy AS HUGEINT) * sy
                                    AS DOUBLE)))
                     * 1000000) AS BIGINT) AS assortativity_micro
            FROM s
        """,
        "q201_theil_sen": """
            WITH daily AS MATERIALIZED (
              SELECT date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS d,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS c
              FROM orders GROUP BY 1),
            slopes AS MATERIALIZED (
              SELECT a.d AS di, b.d AS dj,
                     CASE WHEN (b.c - a.c) >= 0
                          THEN (b.c - a.c) * 1000000 // (b.d - a.d)
                          ELSE -((-(b.c - a.c)) * 1000000 // (b.d - a.d))
                     END AS s_micro
              FROM daily a JOIN daily b ON b.d > a.d),
            tot AS (SELECT COUNT(*) AS n_pairs FROM slopes),
            ranked AS (
              SELECT s_micro,
                     ROW_NUMBER() OVER (ORDER BY s_micro, di, dj) AS rn
              FROM slopes)
            SELECT n_pairs, s_micro AS median_slope_micro
            FROM ranked, tot
            WHERE rn = CAST(ceil(n_pairs / 2.0) AS BIGINT)
        """,
        "q202_skipgram_pmi": f"""
            WITH t AS MATERIALIZED (
              SELECT {_TOKS} AS toks FROM documents),
            pairs AS MATERIALIZED (
              SELECT gg.w1 AS w1, gg.w2 AS w2 FROM (
                SELECT unnest(CASE WHEN len(toks) >= 2 THEN
                  flatten([[{{'w1': least(toks[i], toks[i+o]),
                             'w2': greatest(toks[i], toks[i+o])}}
                    for o in generate_series(1,
                              least(2, len(toks) - i))]
                    for i in generate_series(1, len(toks) - 1)])
                  ELSE [] END) AS gg
                FROM t)),
            uni AS MATERIALIZED (SELECT unnest(toks) AS w FROM t),
            cw AS (SELECT w, COUNT(*) AS cw FROM uni GROUP BY 1),
            tot AS (
              SELECT (SELECT COUNT(*) FROM uni) AS tt,
                     (SELECT COUNT(*) FROM pairs) AS pp),
            cab AS (
              SELECT w1, w2, COUNT(*) AS cab
              FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 5),
            j AS (
              SELECT w1, w2, cab, ca.cw AS ca, cb.cw AS cb, tt, pp
              FROM cab
              JOIN cw ca ON ca.w = w1
              JOIN cw cb ON cb.w = w2, tot)
            SELECT w1, w2, cab,
                   CAST(floor(ln(
                     CAST(cab AS DOUBLE) * CAST(tt AS DOUBLE)
                     * CAST(tt AS DOUBLE)
                     / (CAST(pp AS DOUBLE) * CAST(ca AS DOUBLE)
                        * CAST(cb AS DOUBLE))) * 1000000) AS BIGINT)
                     AS pmi_micro
            FROM j
            ORDER BY pmi_micro DESC, w1, w2
            LIMIT 20
        """,
        "q203_reco_precision": """
            WITH b AS MATERIALIZED (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            train AS (SELECT * FROM b WHERE l_orderkey % 4 != 0),
            test AS MATERIALIZED (
              SELECT * FROM b WHERE l_orderkey % 4 = 0),
            tp AS (
              SELECT x.l_partkey AS item, y.l_partkey AS rec,
                     COUNT(*) AS cooc
              FROM train x JOIN train y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_partkey != y.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            recs AS (
              SELECT item, rec FROM (
                SELECT item, rec,
                       ROW_NUMBER() OVER (PARTITION BY item
                                          ORDER BY cooc DESC, rec) AS rn
                FROM tp)
              WHERE rn <= 3),
            multi AS (SELECT l_orderkey FROM test
                      GROUP BY 1 HAVING COUNT(*) >= 2),
            cases AS MATERIALIZED (
              SELECT t.l_orderkey, t.l_partkey AS item
              FROM test t JOIN multi USING (l_orderkey)),
            hits AS MATERIALIZED (
              SELECT DISTINCT c.l_orderkey, c.item
              FROM cases c
              JOIN recs r ON r.item = c.item
              JOIN test t2 ON t2.l_orderkey = c.l_orderkey
                          AND t2.l_partkey = r.rec)
            SELECT (SELECT COUNT(*) FROM cases) AS n_cases,
                   (SELECT COUNT(*) FROM hits) AS n_hits,
                   CAST((SELECT COUNT(*) FROM hits) * 1000000
                        // (SELECT COUNT(*) FROM cases) AS BIGINT)
                     AS hitrate_ppm
        """,
        "q204_hill_estimator": """
            WITH top AS MATERIALIZED (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                     o_orderkey
              FROM orders ORDER BY cents DESC, o_orderkey LIMIT 100),
            xk AS (SELECT MIN(cents) AS xk FROM top),
            terms AS (
              SELECT CAST(floor(ln(CAST(cents AS DOUBLE)
                                   / CAST(xk AS DOUBLE)) * 1000000)
                          AS BIGINT) AS t
              FROM top, xk WHERE cents > xk)
            SELECT COUNT(*) AS n_tail,
                   CAST(SUM(t) // COUNT(*) AS BIGINT) AS gamma_micro,
                   CAST(1000000000000 // (SUM(t) // COUNT(*)) AS BIGINT)
                     AS alpha_micro
            FROM terms
        """,
        "q205_seasonal_decomposition": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS d,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS c
              FROM orders GROUP BY 1),
            ma AS MATERIALIZED (
              SELECT d, c,
                     COUNT(*) OVER w AS nw,
                     CAST(SUM(c) OVER w AS BIGINT) AS sw
              FROM daily
              WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING
                           AND 3 FOLLOWING)),
            det AS (
              SELECT d, c - sw // 7 AS det, (d + 4) % 7 AS dow
              FROM ma WHERE nw = 7),
            seas AS (
              SELECT dow, COUNT(*) AS n_days,
                     CAST(SUM(det) AS BIGINT) AS sdet,
                     SUM(CAST(det AS HUGEINT) * det) AS ssdet
              FROM det GROUP BY 1)
            SELECT dow, n_days,
                   CASE WHEN sdet >= 0
                        THEN CAST(sdet // n_days AS BIGINT)
                        ELSE CAST(-((-sdet) // n_days) AS BIGINT)
                   END AS seasonal_cents,
                   CAST(floor(
                     CAST(n_days * ssdet - CAST(sdet AS HUGEINT) * sdet
                          AS DOUBLE)
                     / CAST(CAST(n_days AS HUGEINT) * (n_days - 1)
                            AS DOUBLE)) AS BIGINT) AS resid_var_floor
            FROM seas
        """,
        "q206_time_in_state": """
            WITH ev AS (
              SELECT user_id, event_id, event_type,
                     epoch_us(ts) AS us
              FROM events),
            iv AS (
              SELECT event_type,
                     LEAD(us) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) - us AS dur
              FROM ev),
            per AS MATERIALIZED (
              SELECT event_type, COUNT(*) AS n_intervals,
                     CAST(SUM(dur) AS BIGINT) AS total_us
              FROM iv WHERE dur IS NOT NULL GROUP BY 1),
            tot AS (SELECT CAST(SUM(total_us) AS BIGINT) AS gt FROM per)
            SELECT event_type, n_intervals, total_us,
                   CAST(CAST(total_us AS HUGEINT) * 1000000 // gt
                        AS BIGINT) AS share_ppm
            FROM per, tot
        """,
        "q207_lateness_audit": """
            WITH ev AS (
              SELECT event_id, event_type, epoch_us(ts) AS us
              FROM events),
            late AS (
              SELECT event_type,
                     MAX(us) OVER (PARTITION BY event_type
                       ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - us AS lateness
              FROM ev)
            SELECT event_type, COUNT(*) AS n_events,
                   CAST(SUM(CASE WHEN lateness > 3600000000
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_late_1h,
                   CAST(MAX(lateness) AS BIGINT) AS max_lateness_us
            FROM late GROUP BY 1
        """,
        "q208_markov_stationary": _stationary_sql(8),
        "q209_modularity": f"""
            WITH {_lpa_ctes(3)},
            labeled AS MATERIALIZED (
              SELECT s.p1, s.p2, la.lbl AS la, lb.lbl AS lb
              FROM sym s
              JOIN l3 la ON la.node = s.p1
              JOIN l3 lb ON lb.node = s.p2),
            m2t AS (SELECT COUNT(*) AS m2 FROM labeled),
            sin AS (SELECT COUNT(*) AS s_in FROM labeled
                    WHERE la = lb),
            degc AS (
              SELECT COUNT(*) AS n_communities,
                     SUM(CAST(dc AS HUGEINT) * dc) AS s_deg2
              FROM (SELECT la, COUNT(*) AS dc FROM labeled GROUP BY 1))
            SELECT n_communities, m2,
                   CAST(floor(
                     CAST(CAST(m2 AS HUGEINT) * s_in - s_deg2 AS DOUBLE)
                     / CAST(CAST(m2 AS HUGEINT) * m2 AS DOUBLE)
                     * 1000000) AS BIGINT) AS q_micro
            FROM degc, m2t, sin
        """,
        "q210_golden_record": f"""
            WITH RECURSIVE sig AS ({_SIG_SQL}),
            cands AS (
              SELECT DISTINCT l.id AS a, r.id AS b
              FROM sig l JOIN sig r
                ON l.band = r.band AND l.minhash = r.minhash
               AND l.id < r.id),
            words AS (
              SELECT DISTINCT doc_id AS id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            sizes AS (SELECT id, COUNT(*) AS nw FROM words GROUP BY id),
            hits AS MATERIALIZED (
              SELECT a, b FROM (
                SELECT c.a, c.b, COUNT(*) AS n_inter
                FROM cands c
                JOIN words wa ON wa.id = c.a
                JOIN words wb ON wb.id = c.b AND wb.word = wa.word
                GROUP BY 1, 2) i
              JOIN sizes sa ON sa.id = i.a
              JOIN sizes sb ON sb.id = i.b
              WHERE n_inter / (sa.nw + sb.nw - n_inter) >= 0.8),
            sym AS MATERIALIZED (
              SELECT a, b FROM hits
              UNION SELECT b AS a, a AS b FROM hits),
            nodes AS (SELECT DISTINCT a AS node FROM sym),
            reach AS (
              SELECT node, node AS peer FROM nodes
              UNION
              SELECT r.node, s.b AS peer
              FROM reach r JOIN sym s ON r.peer = s.a),
            comp AS (
              SELECT node, MIN(peer) AS component FROM reach
              GROUP BY node),
            members AS MATERIALIZED (
              SELECT component, d.doc_id, d.source, d.lang, d.n_chars
              FROM comp JOIN documents d ON d.doc_id = comp.node),
            best_src AS (
              SELECT component, source AS canon_source FROM (
                SELECT component, source,
                       ROW_NUMBER() OVER (PARTITION BY component
                         ORDER BY nsrc DESC, source) AS rn
                FROM (SELECT component, source, COUNT(*) AS nsrc
                      FROM members GROUP BY 1, 2))
              WHERE rn = 1),
            best_lang AS (
              SELECT component, lang AS canon_lang FROM (
                SELECT component, lang,
                       ROW_NUMBER() OVER (PARTITION BY component
                         ORDER BY nlang DESC, lang) AS rn
                FROM (SELECT component, lang, COUNT(*) AS nlang
                      FROM members GROUP BY 1, 2))
              WHERE rn = 1),
            rep AS (
              SELECT component, doc_id AS rep_doc_id,
                     n_chars AS max_chars FROM (
                SELECT component, doc_id, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY component
                         ORDER BY n_chars DESC, doc_id) AS rn
                FROM members)
              WHERE rn = 1),
            sz AS (SELECT component, COUNT(*) AS n_members
                   FROM members GROUP BY 1)
            SELECT sz.component, n_members, canon_source, canon_lang,
                   rep_doc_id, max_chars
            FROM sz
            JOIN best_src USING (component)
            JOIN best_lang USING (component)
            JOIN rep USING (component)
            WHERE n_members >= 2
        """,
        "q211_bloom_fpp": f"""
            WITH train AS (
              SELECT p_partkey FROM part WHERE p_partkey % 4 != 0),
            probe AS MATERIALIZED (
              SELECT p_partkey FROM part WHERE p_partkey % 4 = 0),
            bits AS MATERIALIZED (
              SELECT DISTINCT unnest([
                {_hex4("md5('b:' || CAST(p_partkey AS VARCHAR))", 1)} % 16384,
                {_hex4("md5('b:' || CAST(p_partkey AS VARCHAR))", 5)} % 16384,
                {_hex4("md5('b:' || CAST(p_partkey AS VARCHAR))", 9)} % 16384
              ]) AS bit
              FROM train),
            probes AS (
              SELECT p_partkey, unnest([
                {_hex4("md5('b:' || CAST(p_partkey AS VARCHAR))", 1)} % 16384,
                {_hex4("md5('b:' || CAST(p_partkey AS VARCHAR))", 5)} % 16384,
                {_hex4("md5('b:' || CAST(p_partkey AS VARCHAR))", 9)} % 16384
              ]) AS bit
              FROM probe),
            pos AS (
              SELECT COUNT(*) AS n_fp FROM (
                SELECT p_partkey FROM probes JOIN bits USING (bit)
                GROUP BY p_partkey HAVING COUNT(*) = 3))
            SELECT (SELECT COUNT(*) FROM bits) AS n_bits_set,
                   (SELECT COUNT(*) FROM probe) AS n_probes,
                   n_fp,
                   CAST((SELECT COUNT(*) FROM bits) * 1000000 // 16384
                        AS BIGINT) AS fill_ppm,
                   CAST(n_fp * 1000000
                        // (SELECT COUNT(*) FROM probe) AS BIGINT)
                     AS fpp_ppm
            FROM pos
        """,
        "q212_revenue_recognition": """
            WITH li AS (
              SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                     least(CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) AS od,
                     least(abs(date_diff('day',
                                   CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE))) + 1,
                           90) AS nd
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            spread AS (
              SELECT cents, nd, od, unnest(range(0, nd)) AS i FROM li),
            alloc AS (
              SELECT strftime(od + CAST(i AS INT), '%Y-%m') AS month,
                     cents // nd
                       + CASE WHEN i < cents % nd THEN 1 ELSE 0 END AS c
              FROM spread)
            SELECT month,
                   CAST(SUM(c) AS BIGINT) AS recognized_cents,
                   COUNT(*) AS n_day_slices
            FROM alloc GROUP BY 1
        """,
        "q213_quantile_shift": """
            WITH cust AS (
              SELECT c_custkey, c_mktsegment AS seg FROM customer
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
            obs AS (
              SELECT seg,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
              FROM orders JOIN cust ON o_custkey = c_custkey),
            ranked AS (
              SELECT seg, cents,
                     ROW_NUMBER() OVER (PARTITION BY seg
                                        ORDER BY cents) AS rn,
                     COUNT(*) OVER (PARTITION BY seg) AS n
              FROM obs),
            per AS (
              SELECT seg,
                """ + ",\n                ".join(
                    f"MAX(CASE WHEN rn = greatest(1, CAST(ceil("
                    f"CAST({d / 10} AS DOUBLE) * n) AS BIGINT)) "
                    f"THEN cents END) AS p{d * 10}"
                    for d in range(1, 10)
                ) + """
              FROM ranked GROUP BY seg),
            melted AS (
              SELECT seg, u.decile AS decile, u.v AS v FROM (
                SELECT seg, unnest([
                """ + ",\n                ".join(
                    f"{{'decile': {d * 10}, 'v': p{d * 10}}}"
                    for d in range(1, 10)
                ) + """
                ]) AS u
                FROM per))
            SELECT a.decile,
                   a.v AS building_cents,
                   b.v AS machinery_cents,
                   CAST(a.v - b.v AS BIGINT) AS shift_cents
            FROM melted a JOIN melted b ON a.decile = b.decile
            WHERE a.seg = 'BUILDING' AND b.seg = 'MACHINERY'
        """,
        "q214_source_balancing": f"""
            WITH docs AS (SELECT doc_id, source FROM documents),
            per AS MATERIALIZED (
              SELECT source, COUNT(*) AS n_docs FROM docs GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
                           COUNT(*) AS k FROM per),
            rates AS MATERIALIZED (
              SELECT source, n_docs,
                     least(1000000,
                           (nn // k) * 1000000 // n_docs) AS keep_ppm
              FROM per, tot),
            kept AS (
              SELECT source, COUNT(*) AS n_kept
              FROM docs JOIN rates USING (source)
              WHERE CAST({_hex4(
                  "md5('s:' || CAST(doc_id AS VARCHAR))", 1)} AS BIGINT)
                    * 1000000 < keep_ppm * 65536
              GROUP BY 1)
            SELECT source, n_docs,
                   CAST(keep_ppm AS BIGINT) AS keep_ppm,
                   CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept
            FROM rates LEFT JOIN kept USING (source)
        """,
        "q215_peak_detection": """
            WITH cnt AS MATERIALIZED (
              SELECT event_type, epoch_us(ts) // 3600000000 AS h,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            span AS (
              SELECT event_type, MIN(h) AS h0, MAX(h) AS h1,
                     CAST(SUM(n) AS BIGINT) AS tot,
                     MAX(h) - MIN(h) + 1 AS nh
              FROM cnt GROUP BY 1),
            grid AS (
              SELECT event_type, tot, nh,
                     unnest(range(h0, h1 + 1)) AS h
              FROM span),
            filled AS (
              SELECT g.event_type, g.tot, g.nh, g.h,
                     COALESCE(c.n, 0) AS n
              FROM grid g LEFT JOIN cnt c
                ON c.event_type = g.event_type AND c.h = g.h),
            sm AS (
              SELECT event_type, h, tot, nh,
                     COUNT(*) OVER w AS nw,
                     CAST(SUM(n) OVER w * 1000000 AS BIGINT) AS sm3
              FROM filled
              WINDOW w AS (PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)),
            pk AS MATERIALIZED (
              SELECT event_type, h, sm3 FROM (
                SELECT event_type, h, sm3, tot, nh,
                       LAG(sm3) OVER pw AS pv,
                       LEAD(sm3) OVER pw AS nx
                FROM sm WHERE nw = 3
                WINDOW pw AS (PARTITION BY event_type ORDER BY h))
              WHERE pv IS NOT NULL AND nx IS NOT NULL
                AND sm3 > pv AND sm3 > nx
                AND sm3 * nh > 6000000 * tot),
            tops AS (
              SELECT event_type, sm3 AS top_sm3, h AS top_h
              FROM pk
              QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY sm3 DESC, h) = 1),
            cnts AS (SELECT event_type, COUNT(*) AS n_peaks
                     FROM pk GROUP BY 1)
            SELECT event_type, n_peaks,
                   CAST(top_sm3 AS BIGINT) AS top_sm3,
                   CAST(top_h AS BIGINT) AS top_h
            FROM cnts JOIN tops USING (event_type)
        """,
        "q216_simpson_reversal": """
            WITH cust AS (
              SELECT c_custkey, c_nationkey,
                     CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS bal
              FROM customer),
            spend AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS sp
              FROM orders GROUP BY 1),
            x AS (SELECT c_nationkey, bal, sp
                  FROM cust JOIN spend ON c_custkey = o_custkey),
            per AS MATERIALIZED (
              SELECT * FROM (
                SELECT c_nationkey, COUNT(*) AS n,
                       CAST(SUM(bal) AS BIGINT) AS sx,
                       CAST(SUM(sp) AS BIGINT) AS sy,
                       SUM(CAST(bal AS HUGEINT) * sp) AS sxy,
                       SUM(CAST(bal AS HUGEINT) * bal) AS sxx,
                       SUM(CAST(sp AS HUGEINT) * sp) AS syy
                FROM x GROUP BY 1)
              WHERE n >= 3),
            nat AS (
              SELECT c_nationkey,
                     CAST(floor(
                       CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - CAST(sx AS HUGEINT) * sx
                                    AS DOUBLE))
                          * sqrt(CAST(n * syy - CAST(sy AS HUGEINT) * sy
                                      AS DOUBLE)))
                       * 1000000) AS BIGINT) AS rn
              FROM per),
            pooled AS (
              SELECT CAST(floor(
                       CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - CAST(sx AS HUGEINT) * sx
                                    AS DOUBLE))
                          * sqrt(CAST(n * syy - CAST(sy AS HUGEINT) * sy
                                      AS DOUBLE)))
                       * 1000000) AS BIGINT) AS overall_r_micro
              FROM (
                SELECT CAST(SUM(n) AS BIGINT) AS n,
                       CAST(SUM(sx) AS BIGINT) AS sx,
                       CAST(SUM(sy) AS BIGINT) AS sy,
                       SUM(sxy) AS sxy, SUM(sxx) AS sxx,
                       SUM(syy) AS syy
                FROM per))
            SELECT COUNT(*) AS n_nations,
                   CAST(MIN(overall_r_micro) AS BIGINT)
                     AS overall_r_micro,
                   CAST(SUM(CASE WHEN rn > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_positive,
                   CAST(SUM(CASE WHEN rn < 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_negative,
                   CAST(SUM(CASE WHEN CAST(rn AS HUGEINT)
                                      * overall_r_micro < 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_reversed
            FROM nat, pooled
        """,
        "q217_tfidf_keywords": f"""
            WITH tall AS MATERIALIZED (
              SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
            dfx AS MATERIALIZED (
              SELECT token, COUNT(*) AS df
              FROM (SELECT DISTINCT doc_id, token FROM tall)
              GROUP BY 1),
            nd AS (SELECT COUNT(*) AS n_docs FROM documents),
            tf AS (
              SELECT doc_id, token, COUNT(*) AS tf
              FROM tall WHERE doc_id % 25 = 0 GROUP BY 1, 2),
            scored AS (
              SELECT doc_id, token,
                     CAST(floor(tf * ln(CAST(n_docs AS DOUBLE) / df)
                                * 1000000) AS BIGINT) AS tfidf_micro
              FROM tf JOIN dfx USING (token), nd)
            SELECT doc_id, rank, token, tfidf_micro FROM (
              SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY tfidf_micro DESC, token) AS INT) AS rank
              FROM scored)
            WHERE rank <= 3
        """,
        "q218_outlier_ensemble": """
            WITH per AS MATERIALIZED (
              SELECT user_id, COUNT(*) AS m_events,
                     CAST(SUM(c) AS BIGINT) AS m_spend,
                     MAX(c) AS m_max
              FROM (SELECT user_id,
                           CAST(CAST(value AS DECIMAL(18,2)) * 100
                                AS BIGINT) AS c
                    FROM events)
              GROUP BY 1),
            melted AS (
              SELECT u.metric AS metric, u.v AS v FROM (
                SELECT unnest([
                  {'metric': 'events', 'v': m_events},
                  {'metric': 'spend', 'v': m_spend},
                  {'metric': 'maxv', 'v': m_max}]) AS u
                FROM per)),
            ranked AS (
              SELECT metric, v,
                     ROW_NUMBER() OVER (PARTITION BY metric
                                        ORDER BY v) AS rn,
                     COUNT(*) OVER (PARTITION BY metric) AS n
              FROM melted),
            b AS (
              SELECT
                MAX(CASE WHEN metric = 'events' AND rn = greatest(1,
                  CAST(ceil(CAST(0.95 AS DOUBLE) * n) AS BIGINT))
                  THEN v END) AS events,
                MAX(CASE WHEN metric = 'spend' AND rn = greatest(1,
                  CAST(ceil(CAST(0.95 AS DOUBLE) * n) AS BIGINT))
                  THEN v END) AS spend,
                MAX(CASE WHEN metric = 'maxv' AND rn = greatest(1,
                  CAST(ceil(CAST(0.95 AS DOUBLE) * n) AS BIGINT))
                  THEN v END) AS maxv
              FROM ranked)
            SELECT n_flags, COUNT(*) AS n_users FROM (
              SELECT (CASE WHEN m_events > events THEN 1 ELSE 0 END
                      + CASE WHEN m_spend > spend THEN 1 ELSE 0 END
                      + CASE WHEN m_max > maxv THEN 1 ELSE 0 END)
                       AS n_flags
              FROM per, b)
            GROUP BY 1
        """,
        "q219_knee_point": """
            WITH spend AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            ranked AS MATERIALIZED (
              SELECT cents,
                     CAST(ROW_NUMBER() OVER (ORDER BY cents DESC,
                                             o_custkey) AS BIGINT) AS i,
                     CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum
              FROM spend),
            tot AS (SELECT MAX(i) AS n, MAX(cum) AS s FROM ranked),
            d AS MATERIALIZED (
              SELECT i, cum, n, s,
                     abs(CAST(n AS HUGEINT) * cum
                         - CAST(s AS HUGEINT) * i) AS dist
              FROM ranked, tot),
            best AS (SELECT MAX(dist) AS bd FROM d)
            SELECT i AS knee_rank, n,
                   CAST(CAST(cum AS HUGEINT) * 1000000 // s AS BIGINT)
                     AS cum_share_ppm
            FROM d, best
            WHERE dist = bd
            QUALIFY ROW_NUMBER() OVER (ORDER BY i) = 1
        """,
        "q220_range_bounds": """
            WITH o AS MATERIALIZED (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
              FROM orders),
            ranked AS (
              SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
                     COUNT(*) OVER () AS n
              FROM o),
            sel AS (
              SELECT greatest(1, CAST(ceil(CAST(k AS DOUBLE) / 32 * n)
                                      AS BIGINT)) AS r
              FROM (SELECT unnest(range(1, 32)) AS k),
                   (SELECT COUNT(*) AS n FROM o)),
            bvals AS (
              SELECT list_sort(list(cents)) AS bs
              FROM ranked JOIN sel ON rn = r)
            SELECT bucket, COUNT(*) AS n_rows FROM (
              SELECT len(list_filter(bs, x -> x < cents)) AS bucket
              FROM o, bvals)
            GROUP BY 1
        """,
        "q221_ess_weights": """
            WITH per AS MATERIALIZED (
              SELECT source, COUNT(*) AS n_docs
              FROM documents GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
                           COUNT(*) AS k FROM per),
            rates AS (
              SELECT source, n_docs,
                     least(1000000,
                           (nn // k) * 1000000 // n_docs) AS w
              FROM per, tot),
            s AS (
              SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
                     SUM(CAST(n_docs AS HUGEINT) * w) AS sw,
                     SUM(CAST(n_docs AS HUGEINT) * w * w) AS sw2
              FROM rates)
            SELECT n,
                   CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                              / CAST(sw2 AS DOUBLE) * 1000000) AS BIGINT)
                     AS ess_micro,
                   CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                              / CAST(sw2 AS DOUBLE) / CAST(n AS DOUBLE)
                              * 1000000) AS BIGINT) AS ess_ratio_ppm
            FROM s
        """,
        "q222_audience_overlap": """
            WITH ud AS MATERIALIZED (
              SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS day
              FROM events),
            sizes AS MATERIALIZED (
              SELECT day, COUNT(*) AS na FROM ud GROUP BY 1),
            inter AS (
              SELECT a.day AS day, COUNT(*) AS nboth
              FROM ud a JOIN ud b
                ON a.user_id = b.user_id AND a.day = b.day + 1
              GROUP BY 1)
            SELECT day, na, nb, nboth,
                   CAST(nboth * 1000000 // (na + nb - nboth) AS BIGINT)
                     AS jaccard_ppm
            FROM inter
            JOIN sizes USING (day)
            JOIN (SELECT day + 1 AS day, na AS nb FROM sizes) p
              USING (day)
        """,
        "q223_price_volume_decomposition": """
            WITH li AS (
              SELECT l_partkey,
                     strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS m,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                     CAST(l_quantity AS BIGINT) AS units
              FROM lineitem
              WHERE strftime(CAST(l_shipdate AS DATE), '%Y-%m')
                    IN ('1995-03', '1995-04')),
            per AS MATERIALIZED (
              SELECT l_partkey, m,
                     CAST(SUM(cents) AS BIGINT) AS v,
                     CAST(SUM(units) AS BIGINT) AS q
              FROM li GROUP BY 1, 2),
            pb AS (
              SELECT m1.l_partkey, v1, q1, v2, q2,
                     v1 * 1000000 // q1 AS p1,
                     v2 * 1000000 // q2 AS p2
              FROM (SELECT l_partkey, v AS v1, q AS q1 FROM per
                    WHERE m = '1995-03') m1
              JOIN (SELECT l_partkey, v AS v2, q AS q2 FROM per
                    WHERE m = '1995-04') m2 USING (l_partkey)),
            eff AS (
              SELECT COUNT(*) AS n_common_parts,
                     SUM(CAST(q2 - q1 AS HUGEINT) * p1) AS vol_x,
                     SUM(CAST(p2 - p1 AS HUGEINT) * q2) AS prc_x
              FROM pb),
            t AS (
              SELECT CAST(SUM(CASE WHEN m = '1995-03' THEN v END)
                          AS BIGINT) AS rev1,
                     CAST(SUM(CASE WHEN m = '1995-04' THEN v END)
                          AS BIGINT) AS rev2
              FROM per)
            SELECT n_common_parts, rev1, rev2,
                   CASE WHEN vol_x >= 0
                        THEN CAST(vol_x // 1000000 AS BIGINT)
                        ELSE CAST(-((-vol_x) // 1000000) AS BIGINT)
                   END AS volume_effect_cents,
                   CASE WHEN prc_x >= 0
                        THEN CAST(prc_x // 1000000 AS BIGINT)
                        ELSE CAST(-((-prc_x) // 1000000) AS BIGINT)
                   END AS price_effect_cents,
                   rev2 - rev1
                   - (CASE WHEN vol_x >= 0
                           THEN CAST(vol_x // 1000000 AS BIGINT)
                           ELSE CAST(-((-vol_x) // 1000000) AS BIGINT)
                      END)
                   - (CASE WHEN prc_x >= 0
                           THEN CAST(prc_x // 1000000 AS BIGINT)
                           ELSE CAST(-((-prc_x) // 1000000) AS BIGINT)
                      END) AS mix_residual_cents
            FROM eff, t
        """,
        "q224_backlog_curve": """
            WITH orders0 AS MATERIALIZED (
              SELECT o_orderkey,
                     date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS bd
              FROM orders),
            done AS (
              SELECT greatest(cd, bd) AS cd FROM (
                SELECT l_orderkey,
                       MAX(date_diff('day', DATE '1970-01-01',
                                     CAST(l_shipdate AS DATE))) AS cd
                FROM lineitem GROUP BY 1) d
              JOIN orders0 ON l_orderkey = o_orderkey),
            booked AS (SELECT bd, COUNT(*) AS nb FROM orders0
                       GROUP BY 1),
            comp AS (SELECT cd, COUNT(*) AS nc FROM done GROUP BY 1),
            span AS (
              SELECT (SELECT MIN(bd) FROM booked) AS d0,
                     greatest((SELECT MAX(bd) FROM booked),
                              (SELECT MAX(cd) FROM comp)) AS d1),
            grid AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM span),
            daily AS (
              SELECT day, COALESCE(nb, 0) AS nb, COALESCE(nc, 0) AS nc
              FROM grid
              LEFT JOIN booked ON bd = day
              LEFT JOIN comp ON cd = day),
            curve AS MATERIALIZED (
              SELECT day,
                     CAST(SUM(nb) OVER w - SUM(nc) OVER w AS BIGINT)
                       AS backlog
              FROM daily
              WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW)),
            mx AS (SELECT MAX(backlog) AS peak FROM curve)
            SELECT MIN(day) AS peak_day,
                   CAST(MAX(peak) AS BIGINT) AS peak_backlog,
                   COUNT(*) AS n_peak_days
            FROM curve, mx WHERE backlog = peak
        """,
        "q225_new_vs_returning": """
            WITH ud AS MATERIALIZED (
              SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS day
              FROM events),
            first AS (SELECT user_id, MIN(day) AS fd FROM ud
                      GROUP BY 1),
            tagged AS (
              SELECT day,
                     CASE WHEN day = fd THEN 1 ELSE 0 END AS is_new
              FROM ud JOIN first USING (user_id))
            SELECT day, COUNT(*) AS dau,
                   CAST(SUM(is_new) AS BIGINT) AS n_new,
                   CAST(COUNT(*) - SUM(is_new) AS BIGINT)
                     AS n_returning,
                   CAST(SUM(is_new) * 1000000 // COUNT(*) AS BIGINT)
                     AS new_share_ppm
            FROM tagged GROUP BY 1
        """,
        "q226_power_analysis": """
            WITH base AS (
              SELECT COUNT(*) AS n_events,
                     CAST(SUM(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_purchase
              FROM events),
            p AS (
              SELECT n_events, n_purchase,
                     CAST(n_purchase AS DOUBLE)
                       / CAST(n_events AS DOUBLE) AS p0
              FROM base),
            q AS (SELECT *, p0 * 1.05 AS p1 FROM p),
            f AS (
              SELECT *,
                     1.959964 * sqrt(2.0 * p0 * (1.0 - p0))
                     + 0.841621 * sqrt(p0 * (1.0 - p0)
                                       + p1 * (1.0 - p1)) AS num
              FROM q)
            SELECT n_events, n_purchase,
                   CAST(floor(p0 * 1000000) AS BIGINT) AS p0_ppm,
                   CAST(ceil((num * num)
                             / ((p1 - p0) * (p1 - p0))) AS BIGINT)
                     AS n_per_arm
            FROM f
        """,
        "q227_shingle_originality": f"""
            WITH t AS (SELECT source, {_TOKS} AS toks FROM documents),
            sh AS (
              SELECT source, unnest(
                CASE WHEN len(toks) >= 5 THEN
                  [md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       || ' ' || toks[i+3] || ' ' || toks[i+4])
                   for i in generate_series(1, len(toks) - 4)]
                ELSE [] END) AS sh
              FROM t),
            ss AS MATERIALIZED (
              SELECT DISTINCT source, sh FROM sh),
            owners AS (
              SELECT sh, COUNT(*) AS n_sources FROM ss GROUP BY 1)
            SELECT source, COUNT(*) AS n_shingles,
                   CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_exclusive,
                   CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END)
                        * 1000000 // COUNT(*) AS BIGINT)
                     AS originality_ppm
            FROM ss JOIN owners USING (sh)
            GROUP BY source
        """,
        "q228_milestone_timing": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            curve AS MATERIALIZED (
              SELECT day,
                     CAST(SUM(cents) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum
              FROM daily),
            tot AS (SELECT MAX(cum) AS total FROM curve),
            k AS (
              SELECT day, cum, total,
                     unnest([1, 2, 3]) AS kq
              FROM curve, tot),
            crossed AS (
              SELECT * FROM k
              WHERE CAST(cum AS HUGEINT) * 4
                    >= CAST(total AS HUGEINT) * kq)
            SELECT CAST(kq * 25 AS INT) AS milestone_pct,
                   MIN(day) AS first_day,
                   CAST(MIN(total) AS BIGINT) AS total_cents
            FROM crossed GROUP BY kq
        """,
        "q229_learning_curve": _knn_curve_sql(),
        "q230_silhouette": """
            WITH seeds AS (
              SELECT embedding, md5(CAST(vec_id AS VARCHAR)) AS h
              FROM embeddings ORDER BY h LIMIT 16),
            cent AS MATERIALIZED (
              SELECT ROW_NUMBER() OVER (ORDER BY h) AS cid,
                     embedding AS cv
              FROM seeds),
            scored AS (
              SELECT vec_id, cid,
                     list_reduce(list_transform(
                       list_zip(
                         list_transform(embedding,
                                        x -> CAST(x AS DOUBLE)),
                         list_transform(cv, x -> CAST(x AS DOUBLE))),
                       p -> (p[1] - p[2]) * (p[1] - p[2])),
                       (a, b) -> a + b) AS d2
              FROM embeddings, cent),
            ranked AS MATERIALIZED (
              SELECT vec_id, cid, d2,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY d2, cid) AS rn
              FROM scored),
            a AS (SELECT vec_id, cid AS cluster, sqrt(d2) AS da
                  FROM ranked WHERE rn = 1),
            b AS (SELECT vec_id, sqrt(d2) AS db
                  FROM ranked WHERE rn = 2),
            s AS (
              SELECT cluster,
                     CAST(floor((db - da) / greatest(da, db)
                                * 1000000) AS BIGINT) AS s_micro
              FROM a JOIN b USING (vec_id))
            SELECT cluster, COUNT(*) AS n_members,
                   CASE WHEN SUM(s_micro) >= 0
                        THEN CAST(SUM(s_micro) // COUNT(*) AS BIGINT)
                        ELSE CAST(-((-SUM(s_micro)) // COUNT(*))
                                  AS BIGINT)
                   END AS mean_sil_micro
            FROM s GROUP BY 1
        """,
        "q231_dedup_impact": f"""
            WITH RECURSIVE sig AS ({_SIG_SQL}),
            cands AS (
              SELECT DISTINCT l.id AS a, r.id AS b
              FROM sig l JOIN sig r
                ON l.band = r.band AND l.minhash = r.minhash
               AND l.id < r.id),
            words AS (
              SELECT DISTINCT doc_id AS id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            sizes AS (SELECT id, COUNT(*) AS nw FROM words GROUP BY id),
            hits AS MATERIALIZED (
              SELECT a, b FROM (
                SELECT c.a, c.b, COUNT(*) AS n_inter
                FROM cands c
                JOIN words wa ON wa.id = c.a
                JOIN words wb ON wb.id = c.b AND wb.word = wa.word
                GROUP BY 1, 2) i
              JOIN sizes sa ON sa.id = i.a
              JOIN sizes sb ON sb.id = i.b
              WHERE n_inter / (sa.nw + sb.nw - n_inter) >= 0.8),
            sym AS MATERIALIZED (
              SELECT a, b FROM hits
              UNION SELECT b AS a, a AS b FROM hits),
            nodes AS (SELECT DISTINCT a AS node FROM sym),
            reach AS (
              SELECT node, node AS peer FROM nodes
              UNION
              SELECT r.node, s.b AS peer
              FROM reach r JOIN sym s ON r.peer = s.a),
            comp AS (
              SELECT node, MIN(peer) AS component FROM reach
              GROUP BY node),
            members AS (
              SELECT component, d.doc_id, d.n_chars
              FROM comp JOIN documents d ON d.doc_id = comp.node),
            clusters AS (
              SELECT component, COUNT(*) AS sz,
                     CAST(SUM(n_chars) AS BIGINT) AS chars,
                     MAX(n_chars) AS keep_chars
              FROM members GROUP BY 1),
            near AS (
              SELECT COUNT(*) AS n_clusters,
                     CAST(SUM(sz) AS BIGINT) AS n_clustered_docs,
                     CAST(SUM(chars - keep_chars) AS BIGINT)
                       AS chars_saved
              FROM clusters),
            nd AS (SELECT COUNT(*) AS n_docs,
                          CAST(SUM(n_chars) AS BIGINT) AS total_chars
                   FROM documents),
            ex AS (SELECT COUNT(DISTINCT md5({_NORM})) AS n_exact_unique
                   FROM documents)
            SELECT n_docs, n_exact_unique, n_clusters,
                   n_clustered_docs,
                   CAST(n_docs - n_clustered_docs + n_clusters AS BIGINT)
                     AS n_after_near_dedup,
                   total_chars, chars_saved,
                   CAST(chars_saved * 1000000 // total_chars AS BIGINT)
                     AS saved_ppm
            FROM nd, ex, near
        """,
        "q232_ndcg": """
            WITH e AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(embedding, x -> x::DOUBLE) AS v,
                     label
              FROM embeddings),
            q AS (SELECT vec_id AS qid, v AS qv, label AS qlabel
                  FROM e WHERE vec_id < 50),
            t AS (SELECT vec_id, v, label FROM e WHERE vec_id >= 50),
            scored AS (
              SELECT qid, qlabel, t.vec_id AS nid, t.label AS nlabel,
                     list_reduce(list_transform(list_zip(qv, v),
                                                x -> x[1] * x[2]),
                                 (a, b) -> a + b)
                     / (sqrt(list_reduce(list_transform(qv, x -> x * x),
                                         (a, b) -> a + b))
                        * sqrt(list_reduce(list_transform(v, x -> x * x),
                                           (a, b) -> a + b))) AS sim
              FROM q, t),
            topk AS (
              SELECT qid, qlabel, nlabel,
                     CAST(ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY sim DESC, nid) AS BIGINT) AS rank
              FROM scored
              QUALIFY rank <= 5),
            rel AS (
              SELECT qid AS query_id, rank,
                     CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END AS rel
              FROM topk),
            per AS (
              SELECT query_id,
                     CAST(SUM(rel) AS BIGINT) AS n_rel,
                     SUM(CAST(rel AS DOUBLE)
                         / ln(CAST(rank AS DOUBLE) + 1.0)) AS dcg
              FROM rel GROUP BY 1)
            SELECT query_id, n_rel,
                   CAST(floor(dcg / list_reduce(
                     list_transform(range(1, CAST(n_rel AS INT) + 1),
                       i -> 1.0 / ln(CAST(i AS DOUBLE) + 1.0)),
                     (a, b) -> a + b) * 1000000) AS BIGINT)
                     AS ndcg_micro
            FROM per WHERE n_rel > 0
        """,
        "q233_spearman": """
            WITH cust AS (
              SELECT c_custkey,
                     CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS bal
              FROM customer),
            spend AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS sp
              FROM orders GROUP BY 1),
            x AS (SELECT c_custkey, bal, sp
                  FROM cust JOIN spend ON c_custkey = o_custkey),
            ranked AS (
              SELECT CAST(ROW_NUMBER() OVER (ORDER BY bal, c_custkey)
                          AS BIGINT) AS r1,
                     CAST(ROW_NUMBER() OVER (ORDER BY sp, c_custkey)
                          AS BIGINT) AS r2
              FROM x),
            s AS (
              SELECT COUNT(*) AS n,
                     SUM(CAST(r1 - r2 AS HUGEINT) * (r1 - r2)) AS sd2
              FROM ranked)
            SELECT n,
                   CAST(floor((1.0 - CAST(6 * sd2 AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT)
                            * (CAST(n AS HUGEINT) * n - 1) AS DOUBLE))
                     * 1000000) AS BIGINT) AS rho_micro
            FROM s
        """,
        "q234_kendall_tau": """
            WITH cust AS (
              SELECT c_custkey,
                     CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS bal
              FROM customer),
            spend AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS sp
              FROM orders GROUP BY 1),
            x AS MATERIALIZED (
              SELECT c_custkey AS k, bal, sp
              FROM cust JOIN spend ON c_custkey = o_custkey),
            pairs AS (
              SELECT CAST(sign(a.bal - b.bal) * sign(a.sp - b.sp)
                          AS BIGINT) AS s
              FROM x a JOIN x b ON b.k > a.k),
            agg AS (
              SELECT COUNT(*) AS n_pairs,
                     CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_concordant,
                     CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_discordant
              FROM pairs)
            SELECT n_pairs, n_concordant, n_discordant,
                   CASE WHEN n_concordant >= n_discordant
                        THEN CAST(CAST(n_concordant - n_discordant
                                       AS HUGEINT) * 1000000 // n_pairs
                                  AS BIGINT)
                        ELSE CAST(-((CAST(n_discordant - n_concordant
                                          AS HUGEINT) * 1000000)
                                    // n_pairs) AS BIGINT)
                   END AS tau_micro
            FROM agg
        """,
        "q235_cohens_kappa": f"""
            WITH {_LANGID_CTES},
            cells AS MATERIALIZED (
              SELECT d.lang, p.pred_lang, COUNT(*) AS n
              FROM documents d JOIN lpred p ON d.doc_id = p.doc_id
              GROUP BY 1, 2),
            rows_ AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS r
                      FROM cells GROUP BY 1),
            cols_ AS (SELECT pred_lang, CAST(SUM(n) AS BIGINT) AS c
                      FROM cells GROUP BY 1),
            rc AS (
              SELECT CAST(SUM(COALESCE(r, 0) * COALESCE(c, 0))
                          AS HUGEINT) AS pe_num
              FROM rows_ FULL JOIN cols_ ON lang = pred_lang),
            tot AS (
              SELECT CAST(SUM(n) AS BIGINT) AS nn,
                     CAST(SUM(CASE WHEN lang = pred_lang THEN n
                                   ELSE 0 END) AS BIGINT) AS diag
              FROM cells)
            SELECT nn AS n_docs, diag AS n_agree,
                   CAST(floor(
                     CAST(CAST(nn AS HUGEINT) * diag - pe_num AS DOUBLE)
                     / CAST(CAST(nn AS HUGEINT) * nn - pe_num AS DOUBLE)
                     * 1000000) AS BIGINT) AS kappa_micro
            FROM tot, rc
        """,
        "q236_mutual_information": """
            WITH cells AS MATERIALIZED (
              SELECT o_orderstatus, o_orderpriority, COUNT(*) AS nab
              FROM orders GROUP BY 1, 2),
            ra AS (SELECT o_orderstatus, CAST(SUM(nab) AS BIGINT) AS na
                   FROM cells GROUP BY 1),
            rb AS (SELECT o_orderpriority,
                          CAST(SUM(nab) AS BIGINT) AS nb
                   FROM cells GROUP BY 1),
            nn AS (SELECT CAST(SUM(nab) AS BIGINT) AS n FROM cells),
            j AS (
              SELECT nab, na, nb, n,
                     CAST(floor(
                       CAST(nab AS DOUBLE) / CAST(n AS DOUBLE)
                       * ln(CAST(nab AS DOUBLE) * CAST(n AS DOUBLE)
                            / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
                       * 1000000) AS BIGINT) AS term
              FROM cells
              JOIN ra USING (o_orderstatus)
              JOIN rb USING (o_orderpriority), nn)
            SELECT MIN(n) AS n_orders, COUNT(*) AS n_cells,
                   CAST(SUM(term) AS BIGINT) AS mi_micro
            FROM j
        """,
        "q237_littles_law": """
            WITH orders0 AS MATERIALIZED (
              SELECT o_orderkey,
                     date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS bd
              FROM orders),
            done AS MATERIALIZED (
              SELECT bd, greatest(cd0, bd) AS cd FROM (
                SELECT l_orderkey,
                       MAX(date_diff('day', DATE '1970-01-01',
                                     CAST(l_shipdate AS DATE))) AS cd0
                FROM lineitem GROUP BY 1) d
              JOIN orders0 ON l_orderkey = o_orderkey),
            stats AS (
              SELECT COUNT(*) AS n_orders,
                     CAST(SUM(cd - bd) AS BIGINT) AS sum_cycle,
                     MIN(bd) AS d0, MAX(cd) AS d1
              FROM done)
            SELECT n_orders,
                   CAST(d1 - d0 + 1 AS BIGINT) AS n_days,
                   CAST(n_orders * 1000000 // (d1 - d0 + 1) AS BIGINT)
                     AS lambda_micro,
                   CAST(CAST(sum_cycle AS HUGEINT) * 1000000
                        // n_orders AS BIGINT) AS w_micro,
                   CAST(CAST(sum_cycle AS HUGEINT) * 1000000
                        // (d1 - d0 + 1) AS BIGINT) AS l_pred_micro
            FROM stats
        """,
        "q238_forecast_backtest": """
            WITH daily AS MATERIALIZED (
              SELECT date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            cutoff AS (SELECT MAX(day) - 27 AS cut FROM daily),
            tagged AS MATERIALIZED (
              SELECT day, cents, cut, (day + 4) % 7 AS dow
              FROM daily, cutoff),
            model AS (
              SELECT dow,
                     CASE WHEN SUM(cents) >= 0
                          THEN CAST(SUM(cents) AS BIGINT) // COUNT(*)
                          ELSE -((-CAST(SUM(cents) AS BIGINT))
                                 // COUNT(*))
                     END AS pred
              FROM tagged WHERE day < cut GROUP BY 1),
            holdout AS (
              SELECT t.cents, m.pred
              FROM tagged t JOIN model m USING (dow)
              WHERE t.day >= t.cut)
            SELECT COUNT(*) AS n_days_eval,
                   CAST(SUM(cents) AS BIGINT) AS actual_cents,
                   CAST(CAST(SUM(abs(cents - pred)) AS HUGEINT)
                        * 1000000 // CAST(SUM(cents) AS BIGINT)
                        AS BIGINT) AS wape_ppm
            FROM holdout
        """,
        "q239_threshold_sensitivity": f"""
            WITH sig AS ({_SIG_SQL}),
            cands AS (
              SELECT DISTINCT l.id AS a, r.id AS b
              FROM sig l JOIN sig r
                ON l.band = r.band AND l.minhash = r.minhash
               AND l.id < r.id),
            words AS (
              SELECT DISTINCT doc_id AS id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            sizes AS (SELECT id, COUNT(*) AS nw FROM words GROUP BY id),
            pairs AS MATERIALIZED (
              SELECT a, b,
                     n_inter / (sa.nw + sb.nw - n_inter) AS jaccard
              FROM (
                SELECT c.a, c.b, COUNT(*) AS n_inter
                FROM cands c
                JOIN words wa ON wa.id = c.a
                JOIN words wb ON wb.id = c.b AND wb.word = wa.word
                GROUP BY 1, 2) i
              JOIN sizes sa ON sa.id = i.a
              JOIN sizes sb ON sb.id = i.b
              WHERE n_inter / (sa.nw + sb.nw - n_inter) >= 0.7)
            SELECT CAST(t * 100 AS INT) AS threshold_pct,
                   CAST(SUM(CASE WHEN jaccard >= t THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pairs,
                   CAST(COUNT(DISTINCT CASE WHEN jaccard >= t
                                            THEN a END) AS BIGINT)
                     AS n_left_docs
            FROM pairs, (SELECT unnest([0.7, 0.8, 0.9]) AS t)
            GROUP BY 1
        """,
        "q240_weekly_median_trend": """
            WITH o AS MATERIALIZED (
              SELECT date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) // 7 AS wk,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
              FROM orders),
            ranked AS (
              SELECT wk, cents,
                     ROW_NUMBER() OVER (PARTITION BY wk
                                        ORDER BY cents) AS rn,
                     COUNT(*) OVER (PARTITION BY wk) AS n
              FROM o),
            med AS (
              SELECT wk,
                     MAX(CASE WHEN rn = greatest(1,
                       CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT))
                       THEN cents END) AS median_cents
              FROM ranked GROUP BY 1),
            cnt AS (SELECT wk, COUNT(*) AS n_orders FROM o GROUP BY 1)
            SELECT wk, n_orders, median_cents
            FROM cnt JOIN med USING (wk)
        """,
        "q241_retention_halflife": """
            WITH ev AS (
              SELECT user_id, event_type, epoch_us(ts) AS us
              FROM events),
            cohorts AS (
              SELECT user_id,
                     CAST(floor(MIN(us) / 604800000000) AS BIGINT) AS cw
              FROM ev WHERE event_type = 'signup' GROUP BY 1),
            active AS (
              SELECT user_id,
                     CAST(floor(us / 604800000000) AS BIGINT) AS wk
              FROM ev),
            pooled AS MATERIALIZED (
              SELECT o, COUNT(*) AS n FROM (
                SELECT DISTINCT user_id, wk - cw AS o
                FROM active JOIN cohorts USING (user_id)
                WHERE wk >= cw)
              GROUP BY 1),
            base AS (SELECT n AS n0 FROM pooled WHERE o = 0),
            pts AS (
              SELECT CAST(o AS BIGINT) AS x,
                     CAST(floor(ln(CAST(n AS DOUBLE)
                                   / CAST(n0 AS DOUBLE)) * 1000000)
                          AS BIGINT) AS y
              FROM pooled, base WHERE o >= 1),
            s AS (
              SELECT COUNT(*) AS n_pts,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     SUM(CAST(x AS HUGEINT) * y) AS sxy,
                     SUM(CAST(x AS HUGEINT) * x) AS sxx
              FROM pts),
            f AS (
              SELECT n_pts,
                     CAST(n_pts * sxy - CAST(sx AS HUGEINT) * sy
                          AS DOUBLE)
                     / CAST(n_pts * sxx - CAST(sx AS HUGEINT) * sx
                            AS DOUBLE) AS sl
              FROM s)
            SELECT n_pts,
                   CAST(floor(sl) AS BIGINT) AS slope_micro_per_week,
                   CAST(floor(-693147.180559945 / sl * 1000000)
                        AS BIGINT) AS halflife_micro_weeks
            FROM f
        """,
        "q242_cuped": """
            WITH ev AS (
              SELECT user_id,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents,
                     epoch_us(ts) AS us
              FROM events),
            mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
            per AS (
              SELECT user_id,
                     CAST(SUM(CASE WHEN us < mid THEN cents ELSE 0 END)
                          AS BIGINT) AS x,
                     CAST(SUM(CASE WHEN us >= mid THEN cents ELSE 0 END)
                          AS BIGINT) AS y
              FROM ev, mid GROUP BY 1),
            s AS (
              SELECT COUNT(*) AS n_users,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     SUM(CAST(x AS HUGEINT) * y) AS sxy,
                     SUM(CAST(x AS HUGEINT) * x) AS sxx,
                     SUM(CAST(y AS HUGEINT) * y) AS syy
              FROM per),
            f AS (
              SELECT n_users,
                     CAST(n_users * sxy - CAST(sx AS HUGEINT) * sy
                          AS DOUBLE) AS cov,
                     CAST(n_users * sxx - CAST(sx AS HUGEINT) * sx
                          AS DOUBLE) AS vx,
                     CAST(n_users * syy - CAST(sy AS HUGEINT) * sy
                          AS DOUBLE) AS vy
              FROM s),
            g AS (
              SELECT n_users, cov / vx AS theta,
                     cov / sqrt(vx) / sqrt(vy) AS rho
              FROM f)
            SELECT n_users,
                   CAST(floor(theta * 1000000) AS BIGINT)
                     AS theta_micro,
                   CAST(floor(rho * rho * 1000000) AS BIGINT)
                     AS var_reduction_ppm
            FROM g
        """,
        "q243_bootstrap_ci": f"""
            WITH daily AS (
              SELECT date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            pos AS MATERIALIZED (
              SELECT cents,
                     CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT)
                       AS p
              FROM daily),
            nt AS (SELECT COUNT(*) AS n FROM pos),
            rr AS (SELECT unnest(range(1, 33)) AS r),
            ii AS (SELECT r, n, unnest(range(1, n + 1)) AS i
                   FROM rr, nt),
            idx AS (
              SELECT r,
                     CAST({_hex4(
                         "md5('b' || ':' || CAST(r AS VARCHAR)"
                         " || ':' || CAST(i AS VARCHAR))", 1)}
                          AS BIGINT) % n + 1 AS p
              FROM ii),
            means AS MATERIALIZED (
              SELECT r, CAST(SUM(cents) AS BIGINT) // COUNT(*) AS m
              FROM idx JOIN pos USING (p) GROUP BY r),
            ranked AS (
              SELECT m, ROW_NUMBER() OVER (ORDER BY m, r) AS rk
              FROM means),
            overall AS (
              SELECT CAST(SUM(cents) AS BIGINT) // COUNT(*)
                       AS mean_cents
              FROM pos)
            SELECT mean_cents,
                   (SELECT CAST(m AS BIGINT) FROM ranked WHERE rk = 2)
                     AS ci_lo_cents,
                   (SELECT CAST(m AS BIGINT) FROM ranked WHERE rk = 31)
                     AS ci_hi_cents
            FROM overall
        """,
        "q244_segment_migration": """
            WITH o AS (
              SELECT o_custkey,
                     year(CAST(o_orderdate AS DATE)) AS yr,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
              FROM orders
              WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)),
            per AS MATERIALIZED (
              SELECT o_custkey, yr, CAST(SUM(cents) AS BIGINT) AS sp
              FROM o GROUP BY 1, 2),
            ranked AS (
              SELECT yr, sp,
                     ROW_NUMBER() OVER (PARTITION BY yr ORDER BY sp)
                       AS rn,
                     COUNT(*) OVER (PARTITION BY yr) AS n
              FROM per),
            bounds AS (
              SELECT yr,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(
                       CAST(0.25 AS DOUBLE) * n) AS BIGINT))
                       THEN sp END) AS p25,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(
                       CAST(0.5 AS DOUBLE) * n) AS BIGINT))
                       THEN sp END) AS p50,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(
                       CAST(0.75 AS DOUBLE) * n) AS BIGINT))
                       THEN sp END) AS p75
              FROM ranked GROUP BY 1),
            binned AS (
              SELECT o_custkey, per.yr,
                     (CASE WHEN sp > p25 THEN 1 ELSE 0 END
                      + CASE WHEN sp > p50 THEN 1 ELSE 0 END
                      + CASE WHEN sp > p75 THEN 1 ELSE 0 END + 1) AS q
              FROM per JOIN bounds ON per.yr = bounds.yr)
            SELECT a.q AS q_from, b.q AS q_to,
                   COUNT(*) AS n_customers
            FROM (SELECT o_custkey, q FROM binned WHERE yr = 1996) a
            JOIN (SELECT o_custkey, q FROM binned WHERE yr = 1997) b
              USING (o_custkey)
            GROUP BY 1, 2
        """,
        "q245_calendar_anomalies": """
            WITH daily AS MATERIALIZED (
              SELECT day, cents, (day + 4) % 7 AS dow FROM (
                SELECT date_diff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS day,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                                * 100) AS BIGINT) AS cents
                FROM orders GROUP BY 1)),
            base AS (
              SELECT dow,
                     CASE WHEN SUM(cents) >= 0
                          THEN CAST(SUM(cents) AS BIGINT) // COUNT(*)
                          ELSE -((-CAST(SUM(cents) AS BIGINT))
                                 // COUNT(*))
                     END AS expect
              FROM daily GROUP BY 1),
            dev AS (
              SELECT day, daily.dow AS dow, cents, expect,
                     CASE WHEN (cents - expect) >= 0
                          THEN CAST(cents - expect AS HUGEINT) * 1000000
                               // expect
                          ELSE -((CAST(expect - cents AS HUGEINT)
                                  * 1000000) // expect)
                     END AS resid_ppm
              FROM daily JOIN base ON daily.dow = base.dow)
            SELECT strftime(DATE '1970-01-01'
                            + CAST(day AS INT), '%Y-%m-%d') AS date,
                   dow, cents, expect,
                   CAST(resid_ppm AS BIGINT) AS resid_ppm
            FROM dev
            ORDER BY abs(resid_ppm) DESC, day
            LIMIT 10
        """,
        "q246_purchase_cadence": """
            WITH ev AS (
              SELECT user_id, event_id, epoch_us(ts) AS us
              FROM events WHERE event_type = 'purchase'),
            gaps AS MATERIALIZED (
              SELECT CAST(floor((us - pl) / 86400000000.0 * 1000)
                          AS BIGINT) AS gap_milli_days
              FROM (SELECT us,
                           LAG(us) OVER (PARTITION BY user_id
                                         ORDER BY us, event_id) AS pl
                    FROM ev)
              WHERE pl IS NOT NULL),
            ranked AS (
              SELECT gap_milli_days,
                     ROW_NUMBER() OVER (ORDER BY gap_milli_days) AS rn,
                     COUNT(*) OVER () AS n
              FROM gaps)
            SELECT (SELECT COUNT(*) FROM gaps) AS n_intervals,
                   MAX(CASE WHEN rn = greatest(1, CAST(ceil(
                     CAST(0.25 AS DOUBLE) * n) AS BIGINT))
                     THEN gap_milli_days END) AS p25_milli_days,
                   MAX(CASE WHEN rn = greatest(1, CAST(ceil(
                     CAST(0.5 AS DOUBLE) * n) AS BIGINT))
                     THEN gap_milli_days END) AS p50_milli_days,
                   MAX(CASE WHEN rn = greatest(1, CAST(ceil(
                     CAST(0.75 AS DOUBLE) * n) AS BIGINT))
                     THEN gap_milli_days END) AS p75_milli_days
            FROM ranked
        """,
        "q247_inequality_trend": """
            WITH spend AS (
              SELECT year(CAST(o_orderdate AS DATE)) AS yr, o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1, 2),
            ranked AS (
              SELECT yr, cents,
                     CAST(ROW_NUMBER() OVER (PARTITION BY yr
                       ORDER BY cents, o_custkey) AS BIGINT) AS i
              FROM spend),
            s AS (
              SELECT yr, COUNT(*) AS n_customers,
                     CAST(SUM(cents) AS BIGINT) AS sx,
                     SUM(CAST(i AS HUGEINT) * cents) AS six
              FROM ranked GROUP BY 1)
            SELECT yr, n_customers,
                   CAST(floor(
                     CAST(2 * six - (CAST(n_customers AS HUGEINT) + 1)
                          * CAST(sx AS HUGEINT) AS DOUBLE)
                     / CAST(CAST(n_customers AS HUGEINT)
                            * CAST(sx AS HUGEINT) AS DOUBLE)
                     * 1000000) AS BIGINT) AS gini_ppm
            FROM s
        """,
        "q248_hll_distinct": f"""
            WITH h AS (
              SELECT event_type,
                     md5(CAST(user_id AS VARCHAR)) AS hh
              FROM events),
            br AS (
              SELECT event_type,
                     ({_HEXV.format(c='substr(hh, 1, 1)')} * 16
                      + {_HEXV.format(c='substr(hh, 2, 1)')}) % 64 AS bucket,
                     CAST(((((({_HEXV.format(c='substr(hh, 3, 1)')}) * 16
                      + {_HEXV.format(c='substr(hh, 4, 1)')}) * 16
                      + {_HEXV.format(c='substr(hh, 5, 1)')}) * 16
                      + {_HEXV.format(c='substr(hh, 6, 1)')}) * 16
                      + {_HEXV.format(c='substr(hh, 7, 1)')}) * 16
                      + {_HEXV.format(c='substr(hh, 8, 1)')} AS BIGINT) AS v
              FROM h),
            pb AS (
              SELECT event_type, bucket,
                     MAX(CASE WHEN v = 0 THEN 25
                              ELSE 25 - length(bin(v)) END) AS m
              FROM br GROUP BY 1, 2),
            z AS (
              SELECT event_type,
                     CAST(SUM(CAST(1 AS BIGINT) << (25 - m)) AS BIGINT)
                       + (64 - COUNT(*)) * CAST(33554432 AS BIGINT) AS z
              FROM pb GROUP BY 1),
            ex AS (
              SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
              FROM events GROUP BY 1)
            SELECT ex.event_type, ex.n_exact,
                   CAST(floor(0.709 * 4096.0 * 33554432.0
                              / CAST(z.z AS DOUBLE) * 1000000) AS BIGINT)
                     AS hll_est_micro
            FROM ex JOIN z ON ex.event_type = z.event_type
        """,
        "q249_countmin_heavy": f"""
            WITH rows_ AS (
              SELECT r.range AS r,
                     md5(concat(CAST(r.range AS VARCHAR), ':',
                                CAST(user_id AS VARCHAR))) AS hh
              FROM events, range(4) r),
            sketch AS (
              SELECT r,
                     {_HEXV.format(c='substr(hh, 1, 1)')} * 16
                       + {_HEXV.format(c='substr(hh, 2, 1)')} AS c,
                     COUNT(*) AS cnt
              FROM rows_ GROUP BY 1, 2),
            users AS (
              SELECT user_id, COUNT(*) AS n_true FROM events GROUP BY 1),
            keys_ AS (
              SELECT u.user_id, u.n_true, r.range AS r,
                     md5(concat(CAST(r.range AS VARCHAR), ':',
                                CAST(u.user_id AS VARCHAR))) AS hh
              FROM users u, range(4) r),
            est AS (
              SELECT k.user_id,
                     CAST(MIN(s.cnt) AS BIGINT) AS cm_est,
                     CAST(MIN(k.n_true) AS BIGINT) AS n_true
              FROM keys_ k JOIN sketch s
                ON s.r = k.r
               AND s.c = {_HEXV.format(c='substr(k.hh, 1, 1)')} * 16
                         + {_HEXV.format(c='substr(k.hh, 2, 1)')}
              GROUP BY 1)
            SELECT user_id, cm_est, n_true, cm_est - n_true AS overcount
            FROM est
            ORDER BY cm_est DESC, user_id
            LIMIT 20
        """,
        "q250_interval_overlap_join": """
            WITH ends AS (
              SELECT l_orderkey, MAX(epoch_us(l_shipdate)) AS end_us
              FROM lineitem GROUP BY 1),
            win AS (
              SELECT o_orderkey, o_custkey,
                     epoch_us(o_orderdate) AS start_us, end_us
              FROM orders JOIN ends ON o_orderkey = l_orderkey),
            ov AS (
              SELECT a.o_custkey,
                     least(a.end_us, b.end_us)
                       - greatest(a.start_us, b.start_us) AS ov_us
              FROM win a JOIN win b
                ON a.o_custkey = b.o_custkey
               AND a.o_orderkey < b.o_orderkey)
            SELECT o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs,
                   CAST(SUM(ov_us // 86400000000 + 1) AS BIGINT)
                     AS total_overlap_days
            FROM ov WHERE ov_us >= 0
            GROUP BY 1
        """,
        "q251_power_iteration": """
            WITH dv AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS l
              FROM embeddings),
            y1 AS (
              SELECT vec_id, l,
                     list_reduce(l, (a, b) -> a + b) AS y
              FROM dv),
            s1 AS MATERIALIZED (
              SELECT e.pos AS pos, SUM(e.q) AS s FROM (
                SELECT unnest(
                         [struct_pack(pos := i - 1,
                            q := CAST(trunc((y * l[i]) * 1048576.0) AS BIGINT))
                          for i in generate_series(1, len(l))]) AS e
                FROM y1)
              GROUP BY 1),
            m1 AS (SELECT MAX(abs(s)) AS m FROM s1),
            v1 AS MATERIALIZED (
              SELECT list(CAST(s AS DOUBLE) / CAST(m AS DOUBLE)
                          ORDER BY pos) AS vl
              FROM s1, m1),
            y2 AS (
              SELECT vec_id, l,
                     list_reduce(
                       [l[i] * vl[i] for i in generate_series(1, len(l))],
                       (a, b) -> a + b) AS y
              FROM dv, v1),
            s2 AS MATERIALIZED (
              SELECT e.pos AS pos, SUM(e.q) AS s FROM (
                SELECT unnest(
                         [struct_pack(pos := i - 1,
                            q := CAST(trunc((y * l[i]) * 1048576.0) AS BIGINT))
                          for i in generate_series(1, len(l))]) AS e
                FROM y2)
              GROUP BY 1),
            m2 AS (SELECT MAX(abs(s)) AS m FROM s2)
            SELECT CAST(e.pos AS INT) AS pos,
                   CAST(floor(CAST(s AS DOUBLE) / CAST(m AS DOUBLE)
                              * 1000000) AS BIGINT) AS v_micro
            FROM (SELECT pos, s FROM s2) e, m2
        """,
        "q252_mrr_waterfall": """
            WITH rev AS MATERIALIZED (
              SELECT o_custkey,
                     year(CAST(o_orderdate AS DATE)) * 12
                       + month(CAST(o_orderdate AS DATE)) - 1 AS midx,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1, 2),
            bounds AS (
              SELECT o_custkey, MIN(midx) AS mn, MAX(midx) AS mx
              FROM rev GROUP BY 1),
            spine AS (
              SELECT o_custkey,
                     unnest(generate_series(mn, mx)) AS midx
              FROM bounds),
            filled AS (
              SELECT s.o_custkey, s.midx,
                     COALESCE(r.cents, 0) AS cents
              FROM spine s LEFT JOIN rev r
                ON r.o_custkey = s.o_custkey AND r.midx = s.midx),
            lagged AS (
              SELECT midx, cents,
                     lag(cents) OVER (PARTITION BY o_custkey
                                      ORDER BY midx) AS prev
              FROM filled),
            cl AS (
              SELECT midx,
                     CASE WHEN prev IS NULL THEN cents ELSE 0 END AS nw,
                     CASE WHEN prev = 0 AND cents > 0
                          THEN cents ELSE 0 END AS rs,
                     CASE WHEN prev > 0 AND cents > prev
                          THEN cents - prev ELSE 0 END AS expn,
                     CASE WHEN prev > cents AND cents > 0
                          THEN prev - cents ELSE 0 END AS ctr,
                     CASE WHEN prev > 0 AND cents = 0
                          THEN prev ELSE 0 END AS ch
              FROM lagged)
            SELECT midx // 12 AS yr, midx % 12 + 1 AS mo,
                   CAST(SUM(nw) AS BIGINT) AS new_cents,
                   CAST(SUM(rs) AS BIGINT) AS resurrected_cents,
                   CAST(SUM(expn) AS BIGINT) AS expansion_cents,
                   CAST(SUM(ctr) AS BIGINT) AS contraction_cents,
                   CAST(SUM(ch) AS BIGINT) AS churned_cents
            FROM cl GROUP BY 1, 2
        """,
        "q253_frame_sampling": """
            WITH d AS (
              SELECT doc_id, source, text, length(text) AS len,
                     greatest(length(text) // 4, 1) AS step
              FROM documents),
            fr AS (
              SELECT source, CAST(j.range AS INT) AS frame_idx,
                     substr(text, CAST(j.range * step + 1 AS BIGINT),
                            CAST(step AS BIGINT)) AS frame
              FROM d, range(4) j)
            SELECT source, frame_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_frames,
                   CAST(SUM(length(frame)) AS BIGINT) AS total_bytes,
                   CAST(COUNT(DISTINCT md5(frame)) AS BIGINT)
                     AS n_distinct_frames
            FROM fr GROUP BY 1, 2
        """,
        "q254_l_diversity": """
            SELECT c_nationkey, c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS k_size,
                   CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0)
                                            AS BIGINT)) AS BIGINT)
                     AS l_diversity,
                   CASE WHEN COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0)
                                                 AS BIGINT)) < 3
                        THEN 1 ELSE 0 END AS suppress
            FROM customer GROUP BY 1, 2
        """,
        "q255_fifo_matching": """
            WITH li AS MATERIALIZED (
              SELECT l_partkey, l_returnflag,
                     CAST(l_quantity AS BIGINT) AS qty,
                     epoch_us(l_shipdate) AS us, l_orderkey, l_linenumber
              FROM lineitem WHERE l_returnflag IN ('R', 'A')),
            lots AS (
              SELECT l_partkey, l_returnflag,
                     SUM(qty) OVER (PARTITION BY l_partkey, l_returnflag
                                    ORDER BY us, l_orderkey, l_linenumber
                                    ROWS UNBOUNDED PRECEDING) - qty AS lo,
                     SUM(qty) OVER (PARTITION BY l_partkey, l_returnflag
                                    ORDER BY us, l_orderkey, l_linenumber
                                    ROWS UNBOUNDED PRECEDING) AS hi
              FROM li),
            matched AS (
              SELECT s.l_partkey,
                     least(s.hi, d.hi) - greatest(s.lo, d.lo) AS m
              FROM lots s JOIN lots d
                ON s.l_partkey = d.l_partkey
               AND s.l_returnflag = 'R' AND d.l_returnflag = 'A'
              WHERE least(s.hi, d.hi) - greatest(s.lo, d.lo) > 0),
            per_part AS (
              SELECT l_partkey, COUNT(*) AS n_match_pairs,
                     SUM(m) AS matched_qty
              FROM matched GROUP BY 1),
            totals AS (
              SELECT l_partkey,
                     SUM(CASE WHEN l_returnflag = 'R' THEN qty ELSE 0 END)
                       AS supply_qty,
                     SUM(CASE WHEN l_returnflag = 'A' THEN qty ELSE 0 END)
                       AS demand_qty
              FROM li GROUP BY 1)
            SELECT t.l_partkey,
                   CAST(supply_qty AS BIGINT) AS supply_qty,
                   CAST(demand_qty AS BIGINT) AS demand_qty,
                   CAST(COALESCE(n_match_pairs, 0) AS BIGINT)
                     AS n_match_pairs,
                   CAST(COALESCE(matched_qty, 0) AS BIGINT) AS matched_qty,
                   CAST(supply_qty - COALESCE(matched_qty, 0) AS BIGINT)
                     AS leftover_supply,
                   CAST(demand_qty - COALESCE(matched_qty, 0) AS BIGINT)
                     AS unfilled_demand
            FROM totals t LEFT JOIN per_part p ON t.l_partkey = p.l_partkey
        """,
        "q256_holt_linear": """
            WITH RECURSIVE daily AS MATERIALIZED (
              SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM events GROUP BY 1, 2),
            seq AS MATERIALIZED (
              SELECT event_type, cents,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY day) AS i
              FROM daily),
            n AS MATERIALIZED (
              SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1),
            walk AS (
              SELECT event_type, 0 AS i, CAST(0.0 AS DOUBLE) AS l,
                     CAST(0.0 AS DOUBLE) AS b
              FROM n
              UNION ALL
              SELECT w.event_type, w.i + 1,
                     CASE WHEN w.i = 0 THEN CAST(s.cents AS DOUBLE) / 100.0
                          WHEN w.i = 1 THEN CAST(s.cents AS DOUBLE) / 100.0
                          ELSE 0.3 * (CAST(s.cents AS DOUBLE) / 100.0)
                               + 0.7 * (w.l + w.b) END,
                     CASE WHEN w.i = 0 THEN 0.0
                          WHEN w.i = 1
                          THEN CAST(s.cents AS DOUBLE) / 100.0 - w.l
                          ELSE 0.1 * ((0.3 * (CAST(s.cents AS DOUBLE)
                                              / 100.0)
                                       + 0.7 * (w.l + w.b)) - w.l)
                               + 0.9 * w.b END
              FROM walk w JOIN seq s ON s.event_type = w.event_type
                                    AND s.i = w.i + 1)
            SELECT w.event_type, n.n_days,
                   CAST(floor(w.l * 1000000) AS BIGINT) AS level_micro,
                   CAST(floor(w.b * 1000000) AS BIGINT) AS trend_micro,
                   CAST(floor((w.l + 7.0 * w.b) * 1000000) AS BIGINT)
                     AS forecast7_micro
            FROM walk w JOIN n ON n.event_type = w.event_type
                              AND w.i = n.n_days
        """,
        "q257_rolling_regression_slope": """
            WITH daily AS (
              SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM events GROUP BY 1, 2),
            sums AS (
              SELECT event_type, day,
                     COUNT(*) OVER w AS n,
                     SUM(CAST(day AS HUGEINT)) OVER w AS sx,
                     SUM(CAST(cents AS HUGEINT)) OVER w AS sy,
                     SUM(CAST(day AS HUGEINT) * cents) OVER w AS sxy,
                     SUM(CAST(day AS HUGEINT) * day) OVER w AS sxx
              FROM daily
              WINDOW w AS (PARTITION BY event_type ORDER BY day
                           RANGE BETWEEN 27 PRECEDING AND CURRENT ROW))
            SELECT event_type, day, CAST(n AS BIGINT) AS n,
                   CAST(floor(
                     CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                     * 1000000) AS BIGINT) AS slope_micro
            FROM sums WHERE n >= 14
        """,
        "q258_mutual_nearest_neighbors": f"""
            WITH {_MNN_CTES}
            SELECT a, b,
                   CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
            FROM mnn
        """,
        "q259_minibatch_assignment": """
            WITH assigned AS (
              SELECT source,
                     (row_number() OVER (
                        PARTITION BY source
                        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                      - 1) % 16 AS batch
              FROM documents),
            per_bs AS (
              SELECT batch, source, COUNT(*) AS n
              FROM assigned GROUP BY 1, 2)
            SELECT batch,
                   CAST(SUM(n) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_sources,
                   CAST(floor(CAST(MAX(n) AS DOUBLE)
                              / CAST(SUM(n) AS DOUBLE) * 1000000)
                        AS BIGINT) AS max_source_share_ppm
            FROM per_bs GROUP BY 1
        """,
        "q260_truncation_audit": f"""
            WITH per AS (
              SELECT source, len({_TOKS}) AS nt,
                     least(len({_TOKS}), 128) AS kt,
                     CASE WHEN len({_TOKS}) > 128 THEN 1 ELSE 0 END AS tr
              FROM documents)
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(tr) AS BIGINT) AS n_truncated,
                   CAST(SUM(nt) AS BIGINT) AS total_tokens,
                   CAST(SUM(kt) AS BIGINT) AS kept_tokens,
                   CAST(floor(CAST(SUM(nt) - SUM(kt) AS DOUBLE)
                              / CAST(SUM(nt) AS DOUBLE) * 1000000)
                        AS BIGINT) AS dropped_ppm
            FROM per GROUP BY 1
        """,
        "q261_neardup_diff_tokens": f"""
            WITH toks AS MATERIALIZED (
              SELECT doc_id, list_distinct({_TOKS}) AS ws
              FROM documents),
            nonempty AS (SELECT * FROM toks WHERE len(ws) > 0),
            pairs AS (
              SELECT a.doc_id AS a, b.doc_id AS b, a.ws AS wa, b.ws AS wb,
                     len(list_intersect(a.ws, b.ws)) AS ni,
                     len(a.ws) AS na, len(b.ws) AS nb
              FROM nonempty a JOIN nonempty b ON a.doc_id < b.doc_id),
            verified AS (
              SELECT a, b, wa, wb
              FROM pairs
              WHERE CAST(ni AS DOUBLE) / (na + nb - ni) >= 0.6),
            sample AS (
              SELECT wa, wb FROM verified
              ORDER BY md5(concat(CAST(a AS VARCHAR), ':',
                                  CAST(b AS VARCHAR))), a, b
              LIMIT 1000),
            diff AS (
              SELECT unnest(list_concat(
                       list_filter(wa, x -> NOT list_contains(wb, x)),
                       list_filter(wb, x -> NOT list_contains(wa, x))))
                       AS token
              FROM sample)
            SELECT token, CAST(COUNT(*) AS BIGINT) AS n
            FROM diff GROUP BY 1
            ORDER BY n DESC, token
            LIMIT 20
        """,
        "q262_salted_skew_join": """
            WITH dim AS (
              SELECT user_id, user_id % 8 AS segment
              FROM (SELECT user_id FROM events GROUP BY 1))
            SELECT d.segment,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS cents
            FROM events e JOIN dim d ON e.user_id = d.user_id
            GROUP BY 1
        """,
        "q263_bigram_coverage": f"""
            WITH t AS (
              SELECT source,
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7') AS tr,
                     {_TOKS} AS toks
              FROM documents),
            grams AS MATERIALIZED (
              SELECT source, tr,
                     unnest(CASE WHEN len(toks) >= 2 THEN
                       [concat(toks[i], ' ', toks[i+1])
                        for i in generate_series(1, len(toks) - 1)]
                     ELSE [] END) AS g
              FROM t),
            train_vocab AS (SELECT DISTINCT g FROM grams WHERE tr),
            test AS (
              SELECT DISTINCT source, g FROM grams WHERE NOT tr),
            tot AS (
              SELECT source, COUNT(*) AS n_test_bigrams
              FROM test GROUP BY 1),
            cov AS (
              SELECT source, COUNT(*) AS nc
              FROM test SEMI JOIN train_vocab USING (g)
              GROUP BY 1)
            SELECT t.source, CAST(t.n_test_bigrams AS BIGINT)
                     AS n_test_bigrams,
                   CAST(floor(CAST(COALESCE(c.nc, 0) AS DOUBLE)
                              / CAST(t.n_test_bigrams AS DOUBLE)
                              * 1000000) AS BIGINT) AS covered_ppm
            FROM tot t LEFT JOIN cov c ON t.source = c.source
        """,
        "q264_kadane_revenue_window": """
            WITH RECURSIVE daily AS MATERIALIZED (
              SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM events GROUP BY 1, 2),
            seq AS MATERIALIZED (
              SELECT event_type, cents,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY day) AS i
              FROM daily),
            n AS MATERIALIZED (
              SELECT event_type, COUNT(*) AS n_days,
                     CAST(SUM(cents) AS HUGEINT) AS total
              FROM daily GROUP BY 1),
            walk AS (
              SELECT event_type,
                     0 AS i,
                     CAST(-1000000000000000000 AS HUGEINT) AS cur,
                     CAST(-1000000000000000000 AS HUGEINT) AS best
              FROM n
              UNION ALL
              SELECT w.event_type, w.i + 1,
                     greatest(CAST(s.cents AS HUGEINT) * n.n_days
                                - n.total,
                              w.cur + (CAST(s.cents AS HUGEINT) * n.n_days
                                       - n.total)),
                     greatest(w.best,
                       greatest(CAST(s.cents AS HUGEINT) * n.n_days
                                  - n.total,
                                w.cur + (CAST(s.cents AS HUGEINT)
                                         * n.n_days - n.total)))
              FROM walk w
              JOIN n ON n.event_type = w.event_type
              JOIN seq s ON s.event_type = w.event_type
                        AND s.i = w.i + 1)
            SELECT w.event_type, n.n_days, CAST(w.best AS BIGINT) AS best_run_scaled
            FROM walk w JOIN n ON n.event_type = w.event_type
                              AND w.i = n.n_days
        """,
        "q265_weighted_jaccard": f"""
            WITH toksets AS MATERIALIZED (
              SELECT doc_id, list_distinct({_TOKS}) AS ws, {_TOKS} AS toks
              FROM documents),
            nonempty AS (SELECT * FROM toksets WHERE len(ws) > 0),
            verified AS (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM nonempty a JOIN nonempty b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
                    / (len(a.ws) + len(b.ws)
                       - len(list_intersect(a.ws, b.ws))) >= 0.6),
            counts AS MATERIALIZED (
              SELECT doc_id,
                     map_from_entries(
                       list(struct_pack(k := tok, v := c))) AS m
              FROM (
                SELECT doc_id, tok, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(toks) AS tok FROM toksets)
                GROUP BY 1, 2)
              GROUP BY 1),
            scored AS (
              SELECT v.a, v.b,
                     list_sum(list_transform(
                       list_distinct(list_concat(map_keys(ca.m),
                                                 map_keys(cb.m))),
                       k -> least(
                         COALESCE(list_extract(map_extract(ca.m, k), 1), 0),
                         COALESCE(list_extract(map_extract(cb.m, k), 1), 0))
                     )) AS smin,
                     list_sum(list_transform(
                       list_distinct(list_concat(map_keys(ca.m),
                                                 map_keys(cb.m))),
                       k -> greatest(
                         COALESCE(list_extract(map_extract(ca.m, k), 1), 0),
                         COALESCE(list_extract(map_extract(cb.m, k), 1), 0))
                     )) AS smax
              FROM verified v
              JOIN counts ca ON ca.doc_id = v.a
              JOIN counts cb ON cb.doc_id = v.b)
            SELECT a, b, CAST(smin AS BIGINT) AS smin,
                   CAST(smax AS BIGINT) AS smax,
                   CAST(floor(CAST(smin AS DOUBLE) / CAST(smax AS DOUBLE)
                              * 1000000) AS BIGINT) AS wj_ppm
            FROM scored
            ORDER BY wj_ppm DESC, a, b
            LIMIT 20
        """,
        "q266_lsh_cost_estimator": f"""
            WITH sig8 AS (
              SELECT doc_id AS id, band,
                     MIN(md5(band::VARCHAR || ':' || shingle)) AS minhash
              FROM (
                SELECT doc_id, unnest(shingles) AS shingle FROM (
                  SELECT doc_id,
                         CASE WHEN len(toks) >= 3
                              THEN list_transform(range(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i+1]
                                        || ' ' || toks[i+2])
                              ELSE [] END AS shingles
                  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents))),
                (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band)
              GROUP BY doc_id, band),
            sizes AS (
              SELECT band, minhash, COUNT(*) AS nb
              FROM sig8 GROUP BY 1, 2),
            mass AS (
              SELECT band,
                     CAST(nb * (nb - 1) / 2 AS BIGINT) AS pairs
              FROM sizes),
            nd AS (SELECT COUNT(*) AS n FROM documents),
            configs AS (SELECT unnest([2, 4, 8]) AS n_bands)
            SELECT c.n_bands,
                   CAST(SUM(m.pairs) AS BIGINT) AS est_candidate_pairs,
                   CAST(floor(CAST(SUM(m.pairs) AS DOUBLE)
                              / CAST(nd.n AS DOUBLE) * 1000)
                        AS BIGINT) AS pairs_per_kdoc
            FROM configs c
            LEFT JOIN mass m ON m.band < c.n_bands, nd
            GROUP BY c.n_bands, nd.n
        """,
        "q267_diff_in_diff": """
            WITH cells AS (
              SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7') AS treated,
                     epoch_us(ts) // 86400000000 >= 19738 AS post,
                     CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            flat AS (
              SELECT concat(CASE WHEN treated THEN 't' ELSE 'c' END,
                            CASE WHEN post THEN '_post' ELSE '_pre' END)
                       AS cell,
                     CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) AS mean
              FROM cells),
            agg AS (
              SELECT SUM(CASE WHEN cell = 't_pre' THEN mean END) AS t_pre,
                     SUM(CASE WHEN cell = 't_post' THEN mean END) AS t_post,
                     SUM(CASE WHEN cell = 'c_pre' THEN mean END) AS c_pre,
                     SUM(CASE WHEN cell = 'c_post' THEN mean END) AS c_post
              FROM flat)
            SELECT CAST(floor(t_pre * 10000) AS BIGINT) AS t_pre_c100,
                   CAST(floor(t_post * 10000) AS BIGINT) AS t_post_c100,
                   CAST(floor(c_pre * 10000) AS BIGINT) AS c_pre_c100,
                   CAST(floor(c_post * 10000) AS BIGINT) AS c_post_c100,
                   CAST(floor(((t_post - t_pre) - (c_post - c_pre))
                              * 10000) AS BIGINT) AS did_c100
            FROM agg
        """,
        "q268_compaction_planner": """
            WITH per AS (
              SELECT source, COUNT(*) AS n_docs,
                     CAST(SUM(octet_length(encode(text))) AS BIGINT)
                       AS total_bytes
              FROM documents GROUP BY 1)
            SELECT source, n_docs, total_bytes,
                   (total_bytes + 1048576 - 1) // 1048576 AS n_files,
                   (n_docs + ((total_bytes + 1048576 - 1) // 1048576) - 1)
                     // ((total_bytes + 1048576 - 1) // 1048576)
                     AS rows_per_file
            FROM per
        """,
        "q269_zorder_audit": """
            WITH base AS (
              SELECT user_id % 256 AS u,
                     (epoch_us(ts) // 86400000000) % 256 AS d
              FROM events),
            zz AS (
              SELECT u, d,
                     ((u // 1) % 2) * 1 + ((u // 2) % 2) * 4
                     + ((u // 4) % 2) * 16 + ((u // 8) % 2) * 64
                     + ((u // 16) % 2) * 256 + ((u // 32) % 2) * 1024
                     + ((u // 64) % 2) * 4096 + ((u // 128) % 2) * 16384
                     + 2 * (((d // 1) % 2) * 1 + ((d // 2) % 2) * 4
                     + ((d // 4) % 2) * 16 + ((d // 8) % 2) * 64
                     + ((d // 16) % 2) * 256 + ((d // 32) % 2) * 1024
                     + ((d // 64) % 2) * 4096 + ((d // 128) % 2) * 16384)
                       AS z
              FROM base)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN u BETWEEN 40 AND 80
                                  AND d BETWEEN 18 AND 33
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_box,
                   CAST(SUM(CASE WHEN z BETWEEN 1608 AND 6402
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_zrange,
                   CAST(floor(
                     CAST(SUM(CASE WHEN z BETWEEN 1608 AND 6402
                                   THEN 1 ELSE 0 END)
                          - SUM(CASE WHEN u BETWEEN 40 AND 80
                                      AND d BETWEEN 18 AND 33
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(greatest(SUM(CASE WHEN z BETWEEN 1608
                                               AND 6402
                                              THEN 1 ELSE 0 END), 1)
                            AS DOUBLE)
                     * 1000000) AS BIGINT) AS false_positive_ppm
            FROM zz
        """,
        "q270_user_entropy": """
            WITH counts AS (
              SELECT user_id, event_type, COUNT(*) AS c
              FROM events GROUP BY 1, 2),
            per AS (
              SELECT user_id,
                     list(struct_pack(t := event_type, c := c)
                          ORDER BY event_type, c) AS seq,
                     CAST(SUM(c) AS BIGINT) AS n_events
              FROM counts GROUP BY 1)
            SELECT user_id, n_events,
                   CAST(floor(list_sum(list_transform(seq,
                       x -> -(CAST(x.c AS DOUBLE)
                              / CAST(n_events AS DOUBLE))
                            * ln(CAST(x.c AS DOUBLE)
                                 / CAST(n_events AS DOUBLE))))
                     * 1000000) AS BIGINT) AS entropy_micro
            FROM per
        """,
        "q271_fk_integrity_sweep": """
            WITH rels AS (
              SELECT 'li->orders' AS relationship,
                     (SELECT COUNT(*) FROM lineitem) AS n_child,
                     (SELECT COUNT(*) FROM lineitem l
                      ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey)
                       AS n_orphans
              UNION ALL
              SELECT 'li->part',
                     (SELECT COUNT(*) FROM lineitem),
                     (SELECT COUNT(*) FROM lineitem l
                      ANTI JOIN part p ON l.l_partkey = p.p_partkey)
              UNION ALL
              SELECT 'li->supplier',
                     (SELECT COUNT(*) FROM lineitem),
                     (SELECT COUNT(*) FROM lineitem l
                      ANTI JOIN supplier s ON l.l_suppkey = s.s_suppkey)
              UNION ALL
              SELECT 'ord->customer',
                     (SELECT COUNT(*) FROM orders),
                     (SELECT COUNT(*) FROM orders o
                      ANTI JOIN customer c ON o.o_custkey = c.c_custkey)
              UNION ALL
              SELECT 'cust->nation',
                     (SELECT COUNT(*) FROM customer),
                     (SELECT COUNT(*) FROM customer c
                      ANTI JOIN nation n ON c.c_nationkey = n.n_nationkey)
              UNION ALL
              SELECT 'nation->region',
                     (SELECT COUNT(*) FROM nation),
                     (SELECT COUNT(*) FROM nation n
                      ANTI JOIN region r ON n.n_regionkey = r.r_regionkey))
            SELECT relationship, CAST(n_child AS BIGINT) AS n_child,
                   CAST(n_orphans AS BIGINT) AS n_orphans
            FROM rels
        """,
        "q272_share_of_parent": """
            WITH base AS (
              SELECT r.r_name, n.n_name,
                     CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              GROUP BY 1, 2)
            SELECT r_name, n_name, cents,
                   CAST(floor(CAST(cents AS DOUBLE)
                     / CAST(SUM(cents) OVER (PARTITION BY r_name)
                            AS DOUBLE) * 1000000) AS BIGINT)
                     AS share_of_region_ppm,
                   CAST(floor(CAST(SUM(cents) OVER (PARTITION BY r_name)
                              AS DOUBLE)
                     / CAST(SUM(cents) OVER () AS DOUBLE) * 1000000)
                     AS BIGINT) AS region_share_ppm
            FROM base
        """,
        "q273_dedup_bias_audit": """
            WITH keepers AS (
              SELECT MIN(doc_id) AS doc_id
              FROM documents
              GROUP BY md5(trim(regexp_replace(regexp_replace(
                lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))),
            flagged AS (
              SELECT d.source, d.n_chars,
                     CASE WHEN k.doc_id IS NULL THEN 0 ELSE 1 END AS kept
              FROM documents d
              LEFT JOIN keepers k ON d.doc_id = k.doc_id)
            SELECT source,
                   CAST(SUM(kept) AS BIGINT) AS n_kept,
                   CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_removed,
                   CAST(floor(
                     CAST(SUM(CASE WHEN kept = 1 THEN n_chars END)
                          AS DOUBLE)
                     / CAST(SUM(kept) AS DOUBLE) * 1000) AS BIGINT)
                     AS kept_mean_chars_milli,
                   CAST(floor(
                     CAST(SUM(CASE WHEN kept = 0 THEN n_chars END)
                          AS DOUBLE)
                     / CAST(greatest(COUNT(*) - SUM(kept), 1) AS DOUBLE)
                     * 1000) AS BIGINT) AS removed_mean_chars_milli
            FROM flagged GROUP BY 1
        """,
        "q274_order_fill_rate": """
            WITH fs AS (
              SELECT l_orderkey, MIN(epoch_us(l_shipdate)) AS first_us
              FROM lineitem GROUP BY 1),
            j AS (
              SELECT o_orderpriority,
                     first_us - epoch_us(o_orderdate) AS lag_us
              FROM orders JOIN fs ON o_orderkey = l_orderkey)
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CASE WHEN lag_us <= 604800000000
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_within_7d,
                   CAST(floor(
                     CAST(SUM(CASE WHEN lag_us <= 604800000000
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) * 1000000) AS BIGINT)
                     AS fill_rate_ppm,
                   CAST(floor(
                     (CAST(SUM(lag_us) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE))
                     / 86400000000.0 * 1000) AS BIGINT)
                     AS mean_lag_milli_days
            FROM j GROUP BY 1
        """,
        "q275_oov_audit": f"""
            WITH per_src AS MATERIALIZED (
              SELECT source, tok, COUNT(*) AS c
              FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1, 2),
            vocab AS (
              SELECT tok FROM (
                SELECT tok, CAST(SUM(c) AS BIGINT) AS n
                FROM per_src GROUP BY 1)
              ORDER BY n DESC, tok LIMIT 1000),
            flagged AS (
              SELECT p.source, p.c,
                     CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
              FROM per_src p LEFT JOIN vocab v ON p.tok = v.tok)
            SELECT source,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN oov = 1 THEN c ELSE 0 END)
                        AS BIGINT) AS n_oov,
                   CAST(floor(
                     CAST(SUM(CASE WHEN oov = 1 THEN c ELSE 0 END)
                          AS DOUBLE)
                     / CAST(SUM(c) AS DOUBLE) * 1000000) AS BIGINT)
                     AS oov_ppm
            FROM flagged GROUP BY 1
        """,
        "q276_supplier_concentration": """
            WITH ps AS (
              SELECT l_partkey, l_suppkey,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
              FROM lineitem GROUP BY 1, 2),
            per AS (
              SELECT l_partkey, COUNT(*) AS n_suppliers,
                     SUM(q) AS total_q, MAX(q) AS top_q
              FROM ps GROUP BY 1)
            SELECT l_partkey, CAST(n_suppliers AS BIGINT) AS n_suppliers,
                   CAST(floor(CAST(top_q AS DOUBLE)
                              / CAST(total_q AS DOUBLE) * 1000000)
                        AS BIGINT) AS top_share_ppm,
                   CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END
                     AS single_source
            FROM per
        """,
        "q277_result_fingerprint": """
            WITH base AS (
              SELECT r.r_name,
                     CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              GROUP BY 1),
            rendered AS (
              SELECT concat(r_name, '=', CAST(cents AS VARCHAR)) AS row_
              FROM base)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   md5(list_aggregate(list_sort(list(row_)), 'string_agg',
                                      '|')) AS result_fingerprint
            FROM rendered
        """,
        "q278_qlm_dirichlet": f"""
            WITH tf AS MATERIALIZED (
              SELECT doc_id, tok, COUNT(*) AS tf
              FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1, 2),
            dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
                   FROM tf GROUP BY 1),
            ctf AS MATERIALIZED (
              SELECT tok, CAST(SUM(tf) AS BIGINT) AS ctf
              FROM tf GROUP BY 1),
            tot AS (SELECT CAST(SUM(ctf) AS BIGINT) AS t FROM ctf),
            qt AS (SELECT tok, ctf FROM ctf ORDER BY ctf DESC, tok LIMIT 5),
            q AS MATERIALIZED (
              SELECT tok,
                     1000.0 * (CAST(ctf AS DOUBLE) / CAST(t AS DOUBLE))
                       AS mup
              FROM qt, tot),
            qs AS (SELECT CAST(SUM(CAST(floor(ln(mup) * 1000000) AS BIGINT))
                        AS BIGINT) AS s_const FROM q),
            adj AS (
              SELECT doc_id,
                     CAST(SUM(CAST(floor(
                       ln((CAST(tf AS DOUBLE) + mup) / mup) * 1000000)
                       AS BIGINT)) AS BIGINT) AS adj
              FROM tf JOIN q ON tf.tok = q.tok GROUP BY 1)
            SELECT dl.doc_id AS doc_id,
                   s_const
                   - 5 * CAST(floor(ln(CAST(dl AS DOUBLE) + 1000.0)
                                    * 1000000) AS BIGINT)
                   + COALESCE(adj, 0) AS score_micro
            FROM dl CROSS JOIN qs LEFT JOIN adj ON dl.doc_id = adj.doc_id
            ORDER BY score_micro DESC, dl.doc_id LIMIT 20
        """,
        "q279_blocking_quality": f"""
            WITH keyed AS MATERIALIZED (
              SELECT substr(array_to_string({_TOKS}, ' '), 1, 40) AS bag,
                     n_chars // 100 AS blk
              FROM documents),
            t AS (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS true_pairs
                  FROM (SELECT COUNT(*) AS n FROM keyed GROUP BY bag)),
            c AS (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS cand_pairs
                  FROM (SELECT COUNT(*) AS n FROM keyed GROUP BY blk)),
            m AS (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT)
                    AS matched_pairs
                  FROM (SELECT COUNT(*) AS n FROM keyed GROUP BY bag, blk)),
            d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM keyed)
            SELECT n_docs, true_pairs, cand_pairs, matched_pairs,
                   CAST(floor((1.0 - CAST(cand_pairs AS DOUBLE)
                        / CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE))
                        * 1000000) AS BIGINT) AS reduction_ppm,
                   CASE WHEN true_pairs > 0 THEN
                     CAST(floor(CAST(matched_pairs AS DOUBLE)
                          / CAST(true_pairs AS DOUBLE) * 1000000) AS BIGINT)
                   END AS completeness_ppm
            FROM d, t, c, m
        """,
        "q280_changepoint_binseg": """
            WITH daily AS MATERIALIZED (
              SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     COUNT(*) AS y
              FROM events GROUP BY 1, 2),
            cur AS (
              SELECT event_type, day,
                     CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                             ORDER BY day) AS BIGINT) AS i,
                     CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS sl,
                     CAST(SUM(y) OVER (PARTITION BY event_type)
                       AS BIGINT) AS s,
                     CAST(COUNT(*) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n
              FROM daily),
            scored AS (
              SELECT event_type, day, n,
                     CAST(floor((CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                                   / CAST(i AS DOUBLE)
                                 + CAST(s - sl AS DOUBLE)
                                   * CAST(s - sl AS DOUBLE)
                                   / CAST(n - i AS DOUBLE)
                                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                   / CAST(n AS DOUBLE)) * 1000000)
                       AS BIGINT) AS gain_micro,
                     CAST(floor(CAST(sl AS DOUBLE) / CAST(i AS DOUBLE)
                                * 1000000) AS BIGINT) AS left_mean_micro,
                     CAST(floor(CAST(s - sl AS DOUBLE)
                                / CAST(n - i AS DOUBLE)
                                * 1000000) AS BIGINT) AS right_mean_micro
              FROM cur WHERE i < n)
            SELECT event_type, day AS split_day, n AS n_days,
                   gain_micro, left_mean_micro, right_mean_micro
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY gain_micro DESC, day) AS rn FROM scored)
            WHERE rn = 1
        """,
        "q281_join_cardinality_estimate": """
            WITH a1 AS (SELECT l_orderkey AS k, COUNT(*) AS nl
                        FROM lineitem GROUP BY 1),
            b1 AS (SELECT o_orderkey AS k, COUNT(*) AS nr
                   FROM orders GROUP BY 1),
            s1 AS (SELECT CAST(SUM(nl) AS BIGINT) AS n_left,
                          CAST(COUNT(*) AS BIGINT) AS ndv_left FROM a1),
            r1 AS (SELECT CAST(SUM(nr) AS BIGINT) AS n_right,
                          CAST(COUNT(*) AS BIGINT) AS ndv_right FROM b1),
            j1 AS (SELECT CAST(SUM(CAST(nl AS HUGEINT) * nr) AS BIGINT) AS actual_rows
                   FROM a1 JOIN b1 USING (k)),
            p1 AS (SELECT 'lineitem_orders' AS join_name, n_left, n_right,
                          ndv_left, ndv_right,
                          CAST(CAST(n_left AS HUGEINT) * n_right
                               // greatest(ndv_left, ndv_right) AS BIGINT)
                            AS est_rows,
                          actual_rows
                   FROM s1, r1, j1),
            a2 AS (SELECT o_custkey AS k, COUNT(*) AS nl
                   FROM orders GROUP BY 1),
            b2 AS (SELECT c_custkey AS k, COUNT(*) AS nr
                   FROM customer GROUP BY 1),
            s2 AS (SELECT CAST(SUM(nl) AS BIGINT) AS n_left,
                          CAST(COUNT(*) AS BIGINT) AS ndv_left FROM a2),
            r2 AS (SELECT CAST(SUM(nr) AS BIGINT) AS n_right,
                          CAST(COUNT(*) AS BIGINT) AS ndv_right FROM b2),
            j2 AS (SELECT CAST(SUM(CAST(nl AS HUGEINT) * nr) AS BIGINT) AS actual_rows
                   FROM a2 JOIN b2 USING (k)),
            p2 AS (SELECT 'orders_customer' AS join_name, n_left, n_right,
                          ndv_left, ndv_right,
                          CAST(CAST(n_left AS HUGEINT) * n_right
                               // greatest(ndv_left, ndv_right) AS BIGINT)
                            AS est_rows,
                          actual_rows
                   FROM s2, r2, j2),
            a3 AS (SELECT l_partkey AS k, COUNT(*) AS nl
                   FROM lineitem GROUP BY 1),
            b3 AS (SELECT p_partkey AS k, COUNT(*) AS nr
                   FROM part GROUP BY 1),
            s3 AS (SELECT CAST(SUM(nl) AS BIGINT) AS n_left,
                          CAST(COUNT(*) AS BIGINT) AS ndv_left FROM a3),
            r3 AS (SELECT CAST(SUM(nr) AS BIGINT) AS n_right,
                          CAST(COUNT(*) AS BIGINT) AS ndv_right FROM b3),
            j3 AS (SELECT CAST(SUM(CAST(nl AS HUGEINT) * nr) AS BIGINT) AS actual_rows
                   FROM a3 JOIN b3 USING (k)),
            p3 AS (SELECT 'lineitem_part' AS join_name, n_left, n_right,
                          ndv_left, ndv_right,
                          CAST(CAST(n_left AS HUGEINT) * n_right
                               // greatest(ndv_left, ndv_right) AS BIGINT)
                            AS est_rows,
                          actual_rows
                   FROM s3, r3, j3)
            SELECT join_name, n_left, n_right, ndv_left, ndv_right,
                   est_rows, actual_rows,
                   CAST(floor(greatest(
                     CAST(est_rows AS DOUBLE) / CAST(actual_rows AS DOUBLE),
                     CAST(actual_rows AS DOUBLE) / CAST(est_rows AS DOUBLE))
                     * 1000000) AS BIGINT) AS q_error_ppm
            FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                  UNION ALL SELECT * FROM p3)
        """,
        "q282_dawid_skene_step": """
            WITH votes AS MATERIALIZED (
              SELECT l_orderkey AS item, l_suppkey % 7 AS annotator,
                     MIN(l_returnflag) AS label
              FROM lineitem GROUP BY 1, 2),
            mvc AS (SELECT item, label, COUNT(*) AS c
                    FROM votes GROUP BY 1, 2),
            mv AS MATERIALIZED (
              SELECT item, label AS mv_label FROM (
                SELECT item, label,
                       ROW_NUMBER() OVER (PARTITION BY item
                                          ORDER BY c DESC, label) AS rn
                FROM mvc)
              WHERE rn = 1),
            rel AS MATERIALIZED (
              SELECT annotator,
                     CAST(floor(ln(
                       (CAST(agree + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))
                       / (1.0 - CAST(agree + 1 AS DOUBLE)
                                / CAST(n + 2 AS DOUBLE)))
                       * 1000000) AS BIGINT) AS w_micro
              FROM (SELECT annotator, COUNT(*) AS n,
                           SUM(CASE WHEN v.label = m.mv_label
                               THEN 1 ELSE 0 END) AS agree
                    FROM votes v JOIN mv m USING (item) GROUP BY 1)),
            sc AS (SELECT v.item, v.label, CAST(SUM(w_micro) AS BIGINT)
                     AS score
                   FROM votes v JOIN rel r ON v.annotator = r.annotator
                   GROUP BY 1, 2),
            ref AS (SELECT item, label AS refined_label FROM (
                      SELECT item, label,
                             ROW_NUMBER() OVER (PARTITION BY item
                               ORDER BY score DESC, label) AS rn
                      FROM sc)
                    WHERE rn = 1)
            SELECT mv_label, refined_label, CAST(COUNT(*) AS BIGINT)
              AS n_items
            FROM mv JOIN ref USING (item) GROUP BY 1, 2
        """,
        "q283_rbo_rankings": f"""
            WITH rev AS MATERIALIZED (
              SELECT year(l_shipdate) AS yr, l_partkey,
                     CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(8,4))
                          - CAST(l_discount AS DECIMAL(8,4)))
                       * 100)) AS BIGINT) AS cents
              FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
              GROUP BY 1, 2),
            a AS (SELECT l_partkey, rnk FROM (
                    SELECT l_partkey,
                           CAST(ROW_NUMBER() OVER (ORDER BY cents DESC,
                             l_partkey) AS BIGINT) AS rnk
                    FROM rev WHERE yr = 1995) WHERE rnk <= 50),
            b AS (SELECT l_partkey, rnk FROM (
                    SELECT l_partkey,
                           CAST(ROW_NUMBER() OVER (ORDER BY cents DESC,
                             l_partkey) AS BIGINT) AS rnk
                    FROM rev WHERE yr = 1996) WHERE rnk <= 50),
            j AS (SELECT greatest(a.rnk, b.rnk) AS m
                  FROM a JOIN b USING (l_partkey))
            SELECT CAST(COUNT(*) AS BIGINT) AS n_joint,
                   CAST(SUM(CAST(floor(
                     list_extract({_RBO_TAIL_SQL}, CAST(m AS INT))
                     * 1000000000) AS BIGINT)) AS BIGINT) AS rbo_nano
            FROM j
        """,
        "q284_neyman_allocation": """
            WITH sp AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            seg AS MATERIALIZED (
              SELECT sp.o_custkey, c.c_mktsegment, sp.cents
              FROM sp JOIN customer c ON sp.o_custkey = c.c_custkey),
            mom AS (
              SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_pop,
                     CAST(SUM(cents) AS BIGINT) AS s,
                     SUM(CAST(cents AS HUGEINT) * cents) AS ss
              FROM seg GROUP BY 1),
            wts AS MATERIALIZED (
              SELECT c_mktsegment, n_pop,
                     CAST(floor(sqrt(
                       CAST(ss AS DOUBLE) / CAST(n_pop AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n_pop AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n_pop AS DOUBLE))))
                       AS BIGINT) AS sd_floor,
                     CAST(floor(CAST(n_pop AS DOUBLE) * sqrt(
                       CAST(ss AS DOUBLE) / CAST(n_pop AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n_pop AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n_pop AS DOUBLE))))
                       AS BIGINT) AS wi
              FROM mom),
            wtot AS (SELECT CAST(SUM(wi) AS BIGINT) AS w FROM wts),
            alloc AS MATERIALIZED (
              SELECT c_mktsegment, n_pop, sd_floor,
                     least(1000 * wi // w, n_pop) AS alloc
              FROM wts, wtot),
            rk AS (
              SELECT c_mktsegment, cents,
                     ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY md5(CAST(o_custkey AS VARCHAR)),
                                o_custkey) AS rn
              FROM seg),
            st AS (
              SELECT rk.c_mktsegment, CAST(COUNT(*) AS BIGINT)
                       AS n_sampled,
                     CAST(SUM(cents) // COUNT(*) AS BIGINT)
                       AS sample_mean_cents
              FROM rk JOIN alloc a ON rk.c_mktsegment = a.c_mktsegment
              WHERE rn <= a.alloc GROUP BY 1)
            SELECT a.c_mktsegment, n_pop, sd_floor,
                   CAST(alloc AS BIGINT) AS alloc,
                   COALESCE(n_sampled, 0) AS n_sampled, sample_mean_cents
            FROM alloc a LEFT JOIN st ON a.c_mktsegment = st.c_mktsegment
        """,
        "q285_source_minhash_union": f"""
            WITH srctok AS MATERIALIZED (
              SELECT DISTINCT source, unnest({_TOKS}) AS token
              FROM documents),
            comp AS MATERIALIZED (
              SELECT source, h,
                     MIN(md5(CAST(h AS VARCHAR) || ':' || token)) AS mh
              FROM (SELECT source, token, unnest(range(0, 64)) AS h
                    FROM srctok)
              GROUP BY 1, 2),
            est AS (
              SELECT a.source AS source_a, b.source AS source_b,
                     SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)
                       AS n_agree
              FROM comp a JOIN comp b
                ON a.h = b.h AND a.source < b.source
              GROUP BY 1, 2),
            sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                      FROM srctok GROUP BY 1),
            inter AS (
              SELECT x.source AS source_a, y.source AS source_b,
                     CAST(COUNT(*) AS BIGINT) AS inter
              FROM srctok x JOIN srctok y
                ON x.token = y.token AND x.source < y.source
              GROUP BY 1, 2),
            grid AS (
              SELECT sa.source AS source_a, sb.source AS source_b,
                     sa.n AS na, sb.n AS nb
              FROM sizes sa JOIN sizes sb ON sa.source < sb.source)
            SELECT source_a, source_b, inter, est_ppm, exact_ppm,
                   CAST(abs(est_ppm - exact_ppm) AS BIGINT) AS abs_err_ppm
            FROM (
              SELECT g.source_a, g.source_b,
                     COALESCE(i.inter, 0) AS inter,
                     CAST(floor(CAST(n_agree AS DOUBLE) / 64.0 * 1000000)
                       AS BIGINT) AS est_ppm,
                     CAST(floor(CAST(COALESCE(i.inter, 0) AS DOUBLE)
                       / CAST(na + nb - COALESCE(i.inter, 0) AS DOUBLE)
                       * 1000000) AS BIGINT) AS exact_ppm
              FROM grid g
              LEFT JOIN inter i ON g.source_a = i.source_a
                                AND g.source_b = i.source_b
              JOIN est e ON g.source_a = e.source_a
                         AND g.source_b = e.source_b)
        """,
        "q286_markov_accuracy": """
            WITH seq AS MATERIALIZED (
              SELECT user_id, src, dst, i, n FROM (
                SELECT user_id, event_type AS src,
                       LEAD(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS dst,
                       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS BIGINT) AS i,
                       CAST(COUNT(*) OVER (PARTITION BY user_id)
                         AS BIGINT) AS n
                FROM events)
              WHERE dst IS NOT NULL),
            tc AS (SELECT src, dst, COUNT(*) AS c FROM seq
                   WHERE i + 1 <= (7 * n) // 10 GROUP BY 1, 2),
            pred AS (SELECT src, dst AS predicted FROM (
                       SELECT src, dst,
                              ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY c DESC, dst) AS rn
                       FROM tc) WHERE rn = 1)
            SELECT s.src, CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN s.dst = p.predicted
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
                   CAST(1000000 * CAST(SUM(CASE WHEN s.dst = p.predicted
                        THEN 1 ELSE 0 END) AS BIGINT) // COUNT(*)
                        AS BIGINT) AS acc_ppm
            FROM seq s LEFT JOIN pred p ON s.src = p.src
            WHERE s.i + 1 > (7 * s.n) // 10
            GROUP BY 1
        """,
        "q287_t_closeness": """
            WITH gc AS MATERIALIZED (
              SELECT c.c_mktsegment, o.o_orderpriority, o.o_orderstatus,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2, 3),
            groups AS (SELECT c_mktsegment, o_orderpriority,
                              CAST(SUM(c) AS BIGINT) AS gn
                       FROM gc GROUP BY 1, 2),
            sg AS (SELECT o_orderstatus, CAST(SUM(c) AS BIGINT) AS sc
                   FROM gc GROUP BY 1),
            tot AS (SELECT CAST(SUM(sc) AS BIGINT) AS t FROM sg),
            globd AS MATERIALIZED (
              SELECT o_orderstatus,
                     CAST(SUM(sc) OVER (ORDER BY o_orderstatus
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) / CAST(t AS DOUBLE) AS cum_q
              FROM sg, tot),
            grid AS (
              SELECT g.c_mktsegment, g.o_orderpriority, g.gn,
                     d.o_orderstatus, d.cum_q,
                     COALESCE(gc.c, 0) AS c0
              FROM groups g CROSS JOIN globd d
              LEFT JOIN gc ON gc.c_mktsegment = g.c_mktsegment
                AND gc.o_orderpriority = g.o_orderpriority
                AND gc.o_orderstatus = d.o_orderstatus),
            terms AS (
              SELECT c_mktsegment, o_orderpriority, gn,
                     CAST(floor(abs(
                       CAST(SUM(c0) OVER (PARTITION BY c_mktsegment,
                           o_orderpriority ORDER BY o_orderstatus
                           ROWS BETWEEN UNBOUNDED PRECEDING AND
                           CURRENT ROW) AS DOUBLE)
                         / CAST(gn AS DOUBLE)
                       - cum_q) * 1000000) AS BIGINT) AS term_micro
              FROM grid)
            SELECT c_mktsegment, o_orderpriority,
                   MAX(gn) AS n_orders,
                   CAST(SUM(term_micro) // (COUNT(*) - 1) AS BIGINT)
                     AS t_close_micro,
                   CASE WHEN CAST(SUM(term_micro) // (COUNT(*) - 1)
                        AS BIGINT) > 200000 THEN 1 ELSE 0 END AS flagged
            FROM terms GROUP BY 1, 2
        """,
        "q288_sax_motifs": """
            WITH daily AS MATERIALIZED (
              SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM events GROUP BY 1, 2),
            stats AS (
              SELECT event_type, day, cents,
                     CAST(SUM(cents) OVER (PARTITION BY event_type)
                       AS BIGINT) AS s,
                     SUM(CAST(cents AS HUGEINT) * cents)
                       OVER (PARTITION BY event_type) AS ss,
                     CAST(COUNT(*) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n
              FROM daily),
            symd AS MATERIALIZED (
              SELECT event_type, day,
                     CASE
                       WHEN (CAST(cents AS DOUBLE)
                             - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                            / sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                            < -0.6745 THEN 'a'
                       WHEN (CAST(cents AS DOUBLE)
                             - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                            / sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                            < 0.0 THEN 'b'
                       WHEN (CAST(cents AS DOUBLE)
                             - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                            / sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                            < 0.6745 THEN 'c'
                       ELSE 'd' END AS sym
              FROM stats),
            tri AS (
              SELECT event_type,
                     sym || LEAD(sym, 1) OVER (PARTITION BY event_type
                       ORDER BY day)
                         || LEAD(sym, 2) OVER (PARTITION BY event_type
                       ORDER BY day) AS motif,
                     LEAD(sym, 2) OVER (PARTITION BY event_type
                       ORDER BY day) AS third
              FROM symd),
            cnt AS (SELECT event_type, motif, CAST(COUNT(*) AS BIGINT)
                      AS n
                    FROM tri WHERE third IS NOT NULL GROUP BY 1, 2)
            SELECT event_type, motif, n, rank FROM (
              SELECT event_type, motif, n,
                     CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY n DESC, motif) AS BIGINT) AS rank
              FROM cnt)
            WHERE rank <= 3
        """,
        "q289_position_attribution": """
            WITH base AS MATERIALIZED (
              SELECT user_id, ts, event_id, event_type,
                     COALESCE(SUM(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS seg
              FROM events),
            conv AS (
              SELECT user_id, ts, event_id, event_type, seg,
                     MAX(CASE WHEN event_type = 'purchase' THEN 1
                         ELSE 0 END) OVER (PARTITION BY user_id, seg)
                       AS has_purchase
              FROM base),
            pos AS (
              SELECT event_type,
                     CAST(ROW_NUMBER() OVER (PARTITION BY user_id, seg
                       ORDER BY ts, event_id) AS BIGINT) AS p,
                     CAST(COUNT(*) OVER (PARTITION BY user_id, seg)
                       AS BIGINT) AS m
              FROM conv
              WHERE has_purchase = 1 AND event_type <> 'purchase')
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
                   CAST(SUM(CASE WHEN m = 1 THEN 1000000
                                 WHEN m = 2 THEN 500000
                                 WHEN p = 1 OR p = m THEN 400000
                                 ELSE 200000 // (m - 2) END)
                        AS BIGINT) AS credit_ppm
            FROM pos GROUP BY 1
        """,
        "q290_eb_shrinkage": """
            WITH per AS MATERIALIZED (
              SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1
                          ELSE 0 END) AS BIGINT) AS x
              FROM lineitem GROUP BY 1),
            mom AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(CAST(floor(CAST(x AS DOUBLE)
                       / CAST(n AS DOUBLE) * 1000000000) AS BIGINT))
                       AS BIGINT) AS sr_nano,
                     CAST(SUM(CAST(floor((CAST(x AS DOUBLE)
                         / CAST(n AS DOUBLE))
                       * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                       * 1000000000) AS BIGINT)) AS BIGINT) AS srr_nano
              FROM per),
            prior AS (
              SELECT (CAST(sr_nano AS DOUBLE) / CAST(k AS DOUBLE)
                      / 1000000000.0)
                     * ((CAST(sr_nano AS DOUBLE) / CAST(k AS DOUBLE)
                         / 1000000000.0)
                        * (1.0 - CAST(sr_nano AS DOUBLE)
                           / CAST(k AS DOUBLE) / 1000000000.0)
                        / (CAST(srr_nano AS DOUBLE) / CAST(k AS DOUBLE)
                           / 1000000000.0
                           - (CAST(sr_nano AS DOUBLE) / CAST(k AS DOUBLE)
                              / 1000000000.0)
                             * (CAST(sr_nano AS DOUBLE)
                                / CAST(k AS DOUBLE) / 1000000000.0))
                        - 1.0) AS alpha,
                     (1.0 - CAST(sr_nano AS DOUBLE) / CAST(k AS DOUBLE)
                      / 1000000000.0)
                     * ((CAST(sr_nano AS DOUBLE) / CAST(k AS DOUBLE)
                         / 1000000000.0)
                        * (1.0 - CAST(sr_nano AS DOUBLE)
                           / CAST(k AS DOUBLE) / 1000000000.0)
                        / (CAST(srr_nano AS DOUBLE) / CAST(k AS DOUBLE)
                           / 1000000000.0
                           - (CAST(sr_nano AS DOUBLE) / CAST(k AS DOUBLE)
                              / 1000000000.0)
                             * (CAST(sr_nano AS DOUBLE)
                                / CAST(k AS DOUBLE) / 1000000000.0))
                        - 1.0) AS beta
              FROM mom)
            SELECT l_partkey, n, x,
                   1000000 * x // n AS raw_ppm,
                   CAST(floor((CAST(x AS DOUBLE) + alpha)
                        / (CAST(n AS DOUBLE) + alpha + beta) * 1000000)
                        AS BIGINT) AS shrunk_ppm
            FROM per, prior
        """,
        "q291_holt_winters": """
            WITH RECURSIVE daily AS MATERIALIZED (
              SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM events GROUP BY 1, 2),
            seq AS MATERIALIZED (
              SELECT event_type, cents,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY day) - 1 AS i
              FROM daily),
            n AS MATERIALIZED (
              SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1),
            walk AS (
              SELECT event_type, 0 AS i,
                     CAST(0.0 AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b,
                     CAST(0.0 AS DOUBLE) AS s0, CAST(0.0 AS DOUBLE) AS s1,
                     CAST(0.0 AS DOUBLE) AS s2, CAST(0.0 AS DOUBLE) AS s3,
                     CAST(0.0 AS DOUBLE) AS s4, CAST(0.0 AS DOUBLE) AS s5,
                     CAST(0.0 AS DOUBLE) AS s6
              FROM n
              UNION ALL
              SELECT w.event_type, w.i + 1,
                     CASE WHEN w.i = 0 THEN CAST(s.cents AS DOUBLE) / 100.0
                          ELSE 0.3 * (CAST(s.cents AS DOUBLE) / 100.0
                                 - CASE w.i % 7 WHEN 0 THEN w.s0
                                   WHEN 1 THEN w.s1 WHEN 2 THEN w.s2
                                   WHEN 3 THEN w.s3 WHEN 4 THEN w.s4
                                   WHEN 5 THEN w.s5 ELSE w.s6 END)
                               + 0.7 * (w.l + w.b) END AS l,
                     CASE WHEN w.i = 0 THEN CAST(0.0 AS DOUBLE)
                          ELSE 0.05 * ((0.3 * (CAST(s.cents AS DOUBLE)
                                 / 100.0
                                 - CASE w.i % 7 WHEN 0 THEN w.s0
                                   WHEN 1 THEN w.s1 WHEN 2 THEN w.s2
                                   WHEN 3 THEN w.s3 WHEN 4 THEN w.s4
                                   WHEN 5 THEN w.s5 ELSE w.s6 END)
                               + 0.7 * (w.l + w.b)) - w.l)
                               + 0.95 * w.b END AS b,
                     CASE WHEN w.i % 7 = 0 THEN
                       0.2 * (CAST(s.cents AS DOUBLE) / 100.0
                         - (CASE WHEN w.i = 0
                            THEN CAST(s.cents AS DOUBLE) / 100.0
                            ELSE 0.3 * (CAST(s.cents AS DOUBLE) / 100.0
                                   - CASE w.i % 7 WHEN 0 THEN w.s0
                                     WHEN 1 THEN w.s1 WHEN 2 THEN w.s2
                                     WHEN 3 THEN w.s3 WHEN 4 THEN w.s4
                                     WHEN 5 THEN w.s5 ELSE w.s6 END)
                                 + 0.7 * (w.l + w.b) END))
                       + 0.8 * w.s0 ELSE w.s0 END AS s0,
                     CASE WHEN w.i % 7 = 1 THEN
                       0.2 * (CAST(s.cents AS DOUBLE) / 100.0
                         - (CASE WHEN w.i = 0
                            THEN CAST(s.cents AS DOUBLE) / 100.0
                            ELSE 0.3 * (CAST(s.cents AS DOUBLE) / 100.0
                                   - CASE w.i % 7 WHEN 0 THEN w.s0
                                     WHEN 1 THEN w.s1 WHEN 2 THEN w.s2
                                     WHEN 3 THEN w.s3 WHEN 4 THEN w.s4
                                     WHEN 5 THEN w.s5 ELSE w.s6 END)
                                 + 0.7 * (w.l + w.b) END))
                       + 0.8 * w.s1 ELSE w.s1 END AS s1,
                     CASE WHEN w.i % 7 = 2 THEN
                       0.2 * (CAST(s.cents AS DOUBLE) / 100.0
                         - (CASE WHEN w.i = 0
                            THEN CAST(s.cents AS DOUBLE) / 100.0
                            ELSE 0.3 * (CAST(s.cents AS DOUBLE) / 100.0
                                   - CASE w.i % 7 WHEN 0 THEN w.s0
                                     WHEN 1 THEN w.s1 WHEN 2 THEN w.s2
                                     WHEN 3 THEN w.s3 WHEN 4 THEN w.s4
                                     WHEN 5 THEN w.s5 ELSE w.s6 END)
                                 + 0.7 * (w.l + w.b) END))
                       + 0.8 * w.s2 ELSE w.s2 END AS s2,
                     CASE WHEN w.i % 7 = 3 THEN
                       0.2 * (CAST(s.cents AS DOUBLE) / 100.0
                         - (CASE WHEN w.i = 0
                            THEN CAST(s.cents AS DOUBLE) / 100.0
                            ELSE 0.3 * (CAST(s.cents AS DOUBLE) / 100.0
                                   - CASE w.i % 7 WHEN 0 THEN w.s0
                                     WHEN 1 THEN w.s1 WHEN 2 THEN w.s2
                                     WHEN 3 THEN w.s3 WHEN 4 THEN w.s4
                                     WHEN 5 THEN w.s5 ELSE w.s6 END)
                                 + 0.7 * (w.l + w.b) END))
                       + 0.8 * w.s3 ELSE w.s3 END AS s3,
                     CASE WHEN w.i % 7 = 4 THEN
                       0.2 * (CAST(s.cents AS DOUBLE) / 100.0
                         - (CASE WHEN w.i = 0
                            THEN CAST(s.cents AS DOUBLE) / 100.0
                            ELSE 0.3 * (CAST(s.cents AS DOUBLE) / 100.0
                                   - CASE w.i % 7 WHEN 0 THEN w.s0
                                     WHEN 1 THEN w.s1 WHEN 2 THEN w.s2
                                     WHEN 3 THEN w.s3 WHEN 4 THEN w.s4
                                     WHEN 5 THEN w.s5 ELSE w.s6 END)
                                 + 0.7 * (w.l + w.b) END))
                       + 0.8 * w.s4 ELSE w.s4 END AS s4,
                     CASE WHEN w.i % 7 = 5 THEN
                       0.2 * (CAST(s.cents AS DOUBLE) / 100.0
                         - (CASE WHEN w.i = 0
                            THEN CAST(s.cents AS DOUBLE) / 100.0
                            ELSE 0.3 * (CAST(s.cents AS DOUBLE) / 100.0
                                   - CASE w.i % 7 WHEN 0 THEN w.s0
                                     WHEN 1 THEN w.s1 WHEN 2 THEN w.s2
                                     WHEN 3 THEN w.s3 WHEN 4 THEN w.s4
                                     WHEN 5 THEN w.s5 ELSE w.s6 END)
                                 + 0.7 * (w.l + w.b) END))
                       + 0.8 * w.s5 ELSE w.s5 END AS s5,
                     CASE WHEN w.i % 7 = 6 THEN
                       0.2 * (CAST(s.cents AS DOUBLE) / 100.0
                         - (CASE WHEN w.i = 0
                            THEN CAST(s.cents AS DOUBLE) / 100.0
                            ELSE 0.3 * (CAST(s.cents AS DOUBLE) / 100.0
                                   - CASE w.i % 7 WHEN 0 THEN w.s0
                                     WHEN 1 THEN w.s1 WHEN 2 THEN w.s2
                                     WHEN 3 THEN w.s3 WHEN 4 THEN w.s4
                                     WHEN 5 THEN w.s5 ELSE w.s6 END)
                                 + 0.7 * (w.l + w.b) END))
                       + 0.8 * w.s6 ELSE w.s6 END AS s6
              FROM walk w JOIN seq s
                ON s.event_type = w.event_type AND s.i = w.i)
            SELECT w.event_type, CAST(n.n_days AS BIGINT) AS n_days,
                   CAST(floor(w.l * 1000000) AS BIGINT) AS level_micro,
                   CAST(floor(w.b * 1000000) AS BIGINT) AS trend_micro,
                   CAST(floor(w.s0 * 1000000) AS BIGINT) AS s0_micro,
                   CAST(floor(w.s1 * 1000000) AS BIGINT) AS s1_micro,
                   CAST(floor(w.s2 * 1000000) AS BIGINT) AS s2_micro,
                   CAST(floor(w.s3 * 1000000) AS BIGINT) AS s3_micro,
                   CAST(floor(w.s4 * 1000000) AS BIGINT) AS s4_micro,
                   CAST(floor(w.s5 * 1000000) AS BIGINT) AS s5_micro,
                   CAST(floor(w.s6 * 1000000) AS BIGINT) AS s6_micro
            FROM walk w JOIN n ON w.event_type = n.event_type
                              AND w.i = n.n_days
        """,
        "q292_hmm_forward": """
            WITH RECURSIVE seq AS MATERIALIZED (
              SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) - 1 AS i
              FROM events),
            n AS MATERIALIZED (
              SELECT user_id, COUNT(*) AS n_events
              FROM events GROUP BY 1),
            walk AS (
              SELECT user_id, 0 AS i, CAST(0.0 AS DOUBLE) AS a0,
                     CAST(0.0 AS DOUBLE) AS a1, CAST(0.0 AS DOUBLE) AS ll
              FROM n
              UNION ALL
              SELECT w.user_id, w.i + 1,
                     (CASE WHEN w.i = 0 THEN 0.5 *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.3
                          WHEN 'click' THEN 0.3 WHEN 'purchase' THEN 0.1
                          WHEN 'signup' THEN 0.15 WHEN 'error' THEN 0.15
                          ELSE 0.01 END AS DOUBLE)
                      ELSE (w.a0 * 0.9 + w.a1 * 0.2) *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.3
                          WHEN 'click' THEN 0.3 WHEN 'purchase' THEN 0.1
                          WHEN 'signup' THEN 0.15 WHEN 'error' THEN 0.15
                          ELSE 0.01 END AS DOUBLE) END)
                     / ((CASE WHEN w.i = 0 THEN 0.5 *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.3
                          WHEN 'click' THEN 0.3 WHEN 'purchase' THEN 0.1
                          WHEN 'signup' THEN 0.15 WHEN 'error' THEN 0.15
                          ELSE 0.01 END AS DOUBLE)
                      ELSE (w.a0 * 0.9 + w.a1 * 0.2) *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.3
                          WHEN 'click' THEN 0.3 WHEN 'purchase' THEN 0.1
                          WHEN 'signup' THEN 0.15 WHEN 'error' THEN 0.15
                          ELSE 0.01 END AS DOUBLE) END)
                      + (CASE WHEN w.i = 0 THEN 0.5 *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.1
                          WHEN 'click' THEN 0.2 WHEN 'purchase' THEN 0.05
                          WHEN 'signup' THEN 0.05 WHEN 'error' THEN 0.6
                          ELSE 0.01 END AS DOUBLE)
                      ELSE (w.a0 * 0.1 + w.a1 * 0.8) *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.1
                          WHEN 'click' THEN 0.2 WHEN 'purchase' THEN 0.05
                          WHEN 'signup' THEN 0.05 WHEN 'error' THEN 0.6
                          ELSE 0.01 END AS DOUBLE) END)) AS a0,
                     (CASE WHEN w.i = 0 THEN 0.5 *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.1
                          WHEN 'click' THEN 0.2 WHEN 'purchase' THEN 0.05
                          WHEN 'signup' THEN 0.05 WHEN 'error' THEN 0.6
                          ELSE 0.01 END AS DOUBLE)
                      ELSE (w.a0 * 0.1 + w.a1 * 0.8) *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.1
                          WHEN 'click' THEN 0.2 WHEN 'purchase' THEN 0.05
                          WHEN 'signup' THEN 0.05 WHEN 'error' THEN 0.6
                          ELSE 0.01 END AS DOUBLE) END)
                     / ((CASE WHEN w.i = 0 THEN 0.5 *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.3
                          WHEN 'click' THEN 0.3 WHEN 'purchase' THEN 0.1
                          WHEN 'signup' THEN 0.15 WHEN 'error' THEN 0.15
                          ELSE 0.01 END AS DOUBLE)
                      ELSE (w.a0 * 0.9 + w.a1 * 0.2) *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.3
                          WHEN 'click' THEN 0.3 WHEN 'purchase' THEN 0.1
                          WHEN 'signup' THEN 0.15 WHEN 'error' THEN 0.15
                          ELSE 0.01 END AS DOUBLE) END)
                      + (CASE WHEN w.i = 0 THEN 0.5 *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.1
                          WHEN 'click' THEN 0.2 WHEN 'purchase' THEN 0.05
                          WHEN 'signup' THEN 0.05 WHEN 'error' THEN 0.6
                          ELSE 0.01 END AS DOUBLE)
                      ELSE (w.a0 * 0.1 + w.a1 * 0.8) *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.1
                          WHEN 'click' THEN 0.2 WHEN 'purchase' THEN 0.05
                          WHEN 'signup' THEN 0.05 WHEN 'error' THEN 0.6
                          ELSE 0.01 END AS DOUBLE) END)) AS a1,
                     w.ll + ln(
                       (CASE WHEN w.i = 0 THEN 0.5 *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.3
                          WHEN 'click' THEN 0.3 WHEN 'purchase' THEN 0.1
                          WHEN 'signup' THEN 0.15 WHEN 'error' THEN 0.15
                          ELSE 0.01 END AS DOUBLE)
                      ELSE (w.a0 * 0.9 + w.a1 * 0.2) *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.3
                          WHEN 'click' THEN 0.3 WHEN 'purchase' THEN 0.1
                          WHEN 'signup' THEN 0.15 WHEN 'error' THEN 0.15
                          ELSE 0.01 END AS DOUBLE) END)
                      + (CASE WHEN w.i = 0 THEN 0.5 *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.1
                          WHEN 'click' THEN 0.2 WHEN 'purchase' THEN 0.05
                          WHEN 'signup' THEN 0.05 WHEN 'error' THEN 0.6
                          ELSE 0.01 END AS DOUBLE)
                      ELSE (w.a0 * 0.1 + w.a1 * 0.8) *
                        CAST(CASE s.event_type WHEN 'view' THEN 0.1
                          WHEN 'click' THEN 0.2 WHEN 'purchase' THEN 0.05
                          WHEN 'signup' THEN 0.05 WHEN 'error' THEN 0.6
                          ELSE 0.01 END AS DOUBLE) END)) AS ll
              FROM walk w JOIN seq s
                ON s.user_id = w.user_id AND s.i = w.i)
            SELECT w.user_id, CAST(n.n_events AS BIGINT) AS n_events,
                   CAST(floor(w.ll * 1000000) AS BIGINT) AS ll_micro,
                   CAST(floor(w.a1 * 1000000) AS BIGINT)
                     AS p_bursty_micro
            FROM walk w JOIN n ON w.user_id = n.user_id
                              AND w.i = n.n_events
        """,
        "q293_ecod_outliers": """
            WITH dims AS MATERIALIZED (
              SELECT vec_id,
                     generate_subscripts(embedding, 1) - 1 AS dim,
                     unnest(embedding) AS val
              FROM embeddings),
            ranked AS (
              SELECT vec_id,
                     CAST(ROW_NUMBER() OVER (PARTITION BY dim
                       ORDER BY val, vec_id) AS BIGINT) AS r,
                     CAST(COUNT(*) OVER (PARTITION BY dim) AS BIGINT) AS n
              FROM dims)
            SELECT vec_id,
                   CAST(SUM(CAST(floor(greatest(
                     -ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)),
                     -ln(CAST(n - r + 1 AS DOUBLE) / CAST(n AS DOUBLE)))
                     * 1000000) AS BIGINT)) AS BIGINT) AS ecod_micro
            FROM ranked GROUP BY 1
            ORDER BY ecod_micro DESC, vec_id LIMIT 20
        """,
        "q294_bm25_prf": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
            tf AS MATERIALIZED (
              SELECT doc_id, token, COUNT(*) AS tf
              FROM toks GROUP BY 1, 2),
            dl AS MATERIALIZED (
              SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
              FROM tf GROUP BY 1),
            dfreq AS MATERIALIZED (
              SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
            stats AS (SELECT COUNT(*) AS n_docs,
                             CAST(SUM(dl) AS BIGINT) AS total_tokens
                      FROM dl),
            q1 AS MATERIALIZED (
              SELECT token, df FROM dfreq
              QUALIFY ROW_NUMBER() OVER (ORDER BY df DESC, token) <= 5),
            s1 AS (
              SELECT tf.doc_id,
                     CAST(floor(
                       ln(1.0 + ((CAST(n_docs - df AS DOUBLE) + 0.5)
                                 / (CAST(df AS DOUBLE) + 0.5)))
                       * ((CAST(tf AS DOUBLE) * 2.2)
                          / (CAST(tf AS DOUBLE)
                             + 1.2 * (0.25 + 0.75
                                      * (CAST(dl * n_docs AS DOUBLE)
                                         / total_tokens))))
                       * 1000000) AS BIGINT) AS s_micro
              FROM tf JOIN q1 USING (token) JOIN dl USING (doc_id), stats),
            top10 AS MATERIALIZED (
              SELECT doc_id FROM (
                SELECT doc_id, CAST(SUM(s_micro) AS BIGINT) AS score_micro
                FROM s1 GROUP BY doc_id)
              QUALIFY ROW_NUMBER() OVER (ORDER BY score_micro DESC,
                                         doc_id) <= 10),
            fb AS MATERIALIZED (
              SELECT token FROM (
                SELECT tf.token,
                       CAST(SUM(CAST(floor(CAST(tf AS DOUBLE)
                         / CAST(dl AS DOUBLE) * 1000000) AS BIGINT))
                         AS BIGINT) AS w_micro
                FROM tf JOIN top10 USING (doc_id) JOIN dl USING (doc_id)
                WHERE tf.token NOT IN (SELECT token FROM q1)
                GROUP BY tf.token)
              QUALIFY ROW_NUMBER() OVER (ORDER BY w_micro DESC,
                                         token) <= 5),
            q2 AS (
              SELECT d.token, d.df
              FROM dfreq d
              JOIN (SELECT token FROM q1 UNION ALL SELECT token FROM fb) u
                ON d.token = u.token),
            s2 AS (
              SELECT tf.doc_id,
                     CAST(floor(
                       ln(1.0 + ((CAST(n_docs - df AS DOUBLE) + 0.5)
                                 / (CAST(df AS DOUBLE) + 0.5)))
                       * ((CAST(tf AS DOUBLE) * 2.2)
                          / (CAST(tf AS DOUBLE)
                             + 1.2 * (0.25 + 0.75
                                      * (CAST(dl * n_docs AS DOUBLE)
                                         / total_tokens))))
                       * 1000000) AS BIGINT) AS s_micro
              FROM tf JOIN q2 USING (token) JOIN dl USING (doc_id), stats)
            SELECT doc_id, COUNT(*) AS n_terms,
                   CAST(SUM(s_micro) AS BIGINT) AS score_micro
            FROM s2 GROUP BY doc_id
            ORDER BY score_micro DESC, doc_id
            LIMIT 20
        """,
        "q295_absorbing_conversion": """
            WITH RECURSIVE seq AS MATERIALIZED (
              SELECT event_type AS src,
                     LEAD(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS dst
              FROM events),
            per AS MATERIALIZED (
              SELECT src, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN dst = 'purchase' THEN 1 ELSE 0
                          END) AS BIGINT) AS n_pur,
                     CAST(SUM(CASE WHEN dst = 'click' THEN 1 ELSE 0
                          END) AS BIGINT) AS n_0,
                     CAST(SUM(CASE WHEN dst = 'error' THEN 1 ELSE 0
                          END) AS BIGINT) AS n_1,
                     CAST(SUM(CASE WHEN dst = 'signup' THEN 1 ELSE 0
                          END) AS BIGINT) AS n_2,
                     CAST(SUM(CASE WHEN dst = 'view' THEN 1 ELSE 0
                          END) AS BIGINT) AS n_3
              FROM seq WHERE src <> 'purchase' GROUP BY 1),
            m AS MATERIALIZED (
              SELECT
                MAX(CASE WHEN src = 'click' THEN CAST(n_pur AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS b0,
                MAX(CASE WHEN src = 'click' THEN CAST(n_0 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q00,
                MAX(CASE WHEN src = 'click' THEN CAST(n_1 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q01,
                MAX(CASE WHEN src = 'click' THEN CAST(n_2 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q02,
                MAX(CASE WHEN src = 'click' THEN CAST(n_3 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q03,
                MAX(CASE WHEN src = 'error' THEN CAST(n_pur AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS b1,
                MAX(CASE WHEN src = 'error' THEN CAST(n_0 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q10,
                MAX(CASE WHEN src = 'error' THEN CAST(n_1 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q11,
                MAX(CASE WHEN src = 'error' THEN CAST(n_2 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q12,
                MAX(CASE WHEN src = 'error' THEN CAST(n_3 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q13,
                MAX(CASE WHEN src = 'signup' THEN CAST(n_pur AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS b2,
                MAX(CASE WHEN src = 'signup' THEN CAST(n_0 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q20,
                MAX(CASE WHEN src = 'signup' THEN CAST(n_1 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q21,
                MAX(CASE WHEN src = 'signup' THEN CAST(n_2 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q22,
                MAX(CASE WHEN src = 'signup' THEN CAST(n_3 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q23,
                MAX(CASE WHEN src = 'view' THEN CAST(n_pur AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS b3,
                MAX(CASE WHEN src = 'view' THEN CAST(n_0 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q30,
                MAX(CASE WHEN src = 'view' THEN CAST(n_1 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q31,
                MAX(CASE WHEN src = 'view' THEN CAST(n_2 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q32,
                MAX(CASE WHEN src = 'view' THEN CAST(n_3 AS DOUBLE)
                    / CAST(n AS DOUBLE) END) AS q33
              FROM per),
            walk AS (
              SELECT 0 AS i, CAST(0.0 AS DOUBLE) AS v0,
                     CAST(0.0 AS DOUBLE) AS v1, CAST(0.0 AS DOUBLE) AS v2,
                     CAST(0.0 AS DOUBLE) AS v3
              UNION ALL
              SELECT w.i + 1,
                     m.b0 + (m.q00 * w.v0 + m.q01 * w.v1
                             + m.q02 * w.v2 + m.q03 * w.v3) AS v0,
                     m.b1 + (m.q10 * w.v0 + m.q11 * w.v1
                             + m.q12 * w.v2 + m.q13 * w.v3) AS v1,
                     m.b2 + (m.q20 * w.v0 + m.q21 * w.v1
                             + m.q22 * w.v2 + m.q23 * w.v3) AS v2,
                     m.b3 + (m.q30 * w.v0 + m.q31 * w.v1
                             + m.q32 * w.v2 + m.q33 * w.v3) AS v3
              FROM walk w, m WHERE w.i < 40)
            SELECT src AS state, n,
                   CAST(floor(CAST(n_pur AS DOUBLE) / CAST(n AS DOUBLE)
                        * 1000000) AS BIGINT) AS direct_micro,
                   CAST(floor(CASE src WHEN 'click' THEN v0
                        WHEN 'error' THEN v1 WHEN 'signup' THEN v2
                        ELSE v3 END * 1000000) AS BIGINT) AS conv_micro
            FROM per, (SELECT v0, v1, v2, v3 FROM walk WHERE i = 40) f
        """,
        "q296_negative_sampling": f"""
            WITH cnt AS (
              SELECT tok AS token, COUNT(*) AS c
              FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1),
            vocab AS (
              SELECT token, CAST(c AS BIGINT) AS c FROM cnt
              QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC, token) <= 1000),
            wv AS (
              SELECT token, c,
                     CAST(floor(sqrt(CAST(c AS DOUBLE))
                          * sqrt(sqrt(CAST(c AS DOUBLE))) * 1000)
                       AS BIGINT) AS wi
              FROM vocab),
            iv AS MATERIALIZED (
              SELECT token, c, wi,
                     CAST(SUM(wi) OVER (ORDER BY c DESC, token
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS hi
              FROM wv),
            iv2 AS (SELECT token, c, wi, hi, hi - wi AS lo FROM iv),
            tot AS (SELECT CAST(MAX(hi) AS BIGINT) AS w_total FROM iv),
            tr AS (
              SELECT t, (h * w_total) // 4294967296 AS target, w_total
              FROM (SELECT r.range AS t,
                           (((instr('0123456789abcdef', substr(md5('neg:' || CAST(t AS VARCHAR)), 1, 1)) - 1) * 4096 + (instr('0123456789abcdef', substr(md5('neg:' || CAST(t AS VARCHAR)), 2, 1)) - 1) * 256 + (instr('0123456789abcdef', substr(md5('neg:' || CAST(t AS VARCHAR)), 3, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5('neg:' || CAST(t AS VARCHAR)), 4, 1)) - 1) * 1) * CAST(65536 AS BIGINT) + ((instr('0123456789abcdef', substr(md5('neg:' || CAST(t AS VARCHAR)), 5, 1)) - 1) * 4096 + (instr('0123456789abcdef', substr(md5('neg:' || CAST(t AS VARCHAR)), 6, 1)) - 1) * 256 + (instr('0123456789abcdef', substr(md5('neg:' || CAST(t AS VARCHAR)), 7, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5('neg:' || CAST(t AS VARCHAR)), 8, 1)) - 1) * 1)) AS h
                    FROM range(10000) r), tot),
            bt AS (SELECT t, (target * 256) // w_total AS bucket, target
                   FROM tr),
            ib AS (
              SELECT token, lo, hi,
                     unnest(generate_series((lo * 256) // w_total,
                                            ((hi - 1) * 256) // w_total))
                       AS bucket
              FROM iv2, tot),
            drawn AS (
              SELECT token, CAST(COUNT(*) AS BIGINT) AS n_drawn
              FROM bt JOIN ib ON bt.bucket = ib.bucket
              WHERE bt.target >= ib.lo AND bt.target < ib.hi
              GROUP BY 1)
            SELECT token, c,
                   (wi * 1000000) // w_total AS expected_ppm,
                   COALESCE(n_drawn, 0) AS n_drawn,
                   COALESCE(n_drawn, 0) * 100 AS drawn_ppm,
                   CAST(abs(COALESCE(n_drawn, 0) * 100
                        - (wi * 1000000) // w_total) AS BIGINT) AS dev_ppm
            FROM iv2 LEFT JOIN drawn USING (token), tot
            ORDER BY n_drawn DESC, token LIMIT 20
        """,
        "q297_bpe_first_merges": f"""
            WITH wc AS (
              SELECT tok AS token, COUNT(*) AS c
              FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1),
            pairs AS (
              SELECT c, substr(token, CAST(i AS INTEGER), 2) AS pair
              FROM (SELECT token, c,
                           unnest(generate_series(1, length(token) - 1))
                             AS i
                    FROM wc)
              WHERE length(token) >= 2)
            SELECT pair, CAST(SUM(c) AS BIGINT) AS n_occurrences,
                   CAST(COUNT(*) AS BIGINT) AS n_positions
            FROM pairs GROUP BY 1
            ORDER BY n_occurrences DESC, pair LIMIT 20
        """,
        "q298_ransac_line": """
            WITH daily AS MATERIALIZED (
              SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM events GROUP BY 1, 2),
            ranked AS MATERIALIZED (
              SELECT event_type, day, cents,
                     CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY day) AS BIGINT) AS i,
                     CAST(COUNT(*) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n,
                     CAST(SUM(cents) OVER (PARTITION BY event_type)
                       AS BIGINT) AS s
              FROM daily),
            dims AS (SELECT event_type, MAX(n) AS n, MAX(s) AS s
                     FROM ranked GROUP BY 1),
            seeds AS (SELECT r.range AS k FROM range(20) r),
            hsh AS (
              SELECT k,
                     ((instr('0123456789abcdef', substr(md5('ra:'
                        || CAST(k AS VARCHAR)), 1, 1)) - 1) * 4096
                      + (instr('0123456789abcdef', substr(md5('ra:'
                        || CAST(k AS VARCHAR)), 2, 1)) - 1) * 256
                      + (instr('0123456789abcdef', substr(md5('ra:'
                        || CAST(k AS VARCHAR)), 3, 1)) - 1) * 16
                      + (instr('0123456789abcdef', substr(md5('ra:'
                        || CAST(k AS VARCHAR)), 4, 1)) - 1))
                     * CAST(65536 AS BIGINT)
                     + ((instr('0123456789abcdef', substr(md5('ra:'
                        || CAST(k AS VARCHAR)), 5, 1)) - 1) * 4096
                      + (instr('0123456789abcdef', substr(md5('ra:'
                        || CAST(k AS VARCHAR)), 6, 1)) - 1) * 256
                      + (instr('0123456789abcdef', substr(md5('ra:'
                        || CAST(k AS VARCHAR)), 7, 1)) - 1) * 16
                      + (instr('0123456789abcdef', substr(md5('ra:'
                        || CAST(k AS VARCHAR)), 8, 1)) - 1)) AS h1,
                     ((instr('0123456789abcdef', substr(md5('rb:'
                        || CAST(k AS VARCHAR)), 1, 1)) - 1) * 4096
                      + (instr('0123456789abcdef', substr(md5('rb:'
                        || CAST(k AS VARCHAR)), 2, 1)) - 1) * 256
                      + (instr('0123456789abcdef', substr(md5('rb:'
                        || CAST(k AS VARCHAR)), 3, 1)) - 1) * 16
                      + (instr('0123456789abcdef', substr(md5('rb:'
                        || CAST(k AS VARCHAR)), 4, 1)) - 1))
                     * CAST(65536 AS BIGINT)
                     + ((instr('0123456789abcdef', substr(md5('rb:'
                        || CAST(k AS VARCHAR)), 5, 1)) - 1) * 4096
                      + (instr('0123456789abcdef', substr(md5('rb:'
                        || CAST(k AS VARCHAR)), 6, 1)) - 1) * 256
                      + (instr('0123456789abcdef', substr(md5('rb:'
                        || CAST(k AS VARCHAR)), 7, 1)) - 1) * 16
                      + (instr('0123456789abcdef', substr(md5('rb:'
                        || CAST(k AS VARCHAR)), 8, 1)) - 1)) AS h2
              FROM seeds),
            cand AS (
              SELECT d.event_type, h.k, d.n, d.s,
                     h.h1 % d.n + 1 AS ia,
                     CASE WHEN h.h2 % (d.n - 1) + 1 >= h.h1 % d.n + 1
                          THEN h.h2 % (d.n - 1) + 2
                          ELSE h.h2 % (d.n - 1) + 1 END AS ja
              FROM dims d CROSS JOIN hsh h),
            models AS (
              SELECT c.event_type, c.k, c.n, c.s,
                     CAST(p2.cents - p1.cents AS DOUBLE)
                       / CAST(p2.day - p1.day AS DOUBLE) AS slope,
                     CAST(p1.cents AS DOUBLE)
                       - (CAST(p2.cents - p1.cents AS DOUBLE)
                          / CAST(p2.day - p1.day AS DOUBLE))
                         * CAST(p1.day AS DOUBLE) AS icept
              FROM cand c
              JOIN ranked p1 ON p1.event_type = c.event_type
                            AND p1.i = c.ia
              JOIN ranked p2 ON p2.event_type = c.event_type
                            AND p2.i = c.ja),
            scored AS (
              SELECT m.event_type, m.k, m.slope, m.icept,
                     CAST(SUM(CASE WHEN abs(CAST(r.cents AS DOUBLE)
                            - (m.slope * CAST(r.day AS DOUBLE)
                               + m.icept))
                          <= 0.1 * abs(CAST(m.s AS DOUBLE)
                                       / CAST(m.n AS DOUBLE))
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
              FROM models m JOIN ranked r
                ON r.event_type = m.event_type
              GROUP BY 1, 2, 3, 4)
            SELECT event_type, k, n_inliers,
                   CAST(floor(slope * 1000000) AS BIGINT) AS slope_micro,
                   CAST(floor(icept * 1000000) AS BIGINT) AS icept_micro
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY n_inliers DESC, k) AS rn FROM scored)
            WHERE rn = 1
        """,
        "q299_nucleus_vocab": f"""
            WITH stc AS (
              SELECT source, tok AS token, COUNT(*) AS c
              FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1, 2),
            cum AS (
              SELECT source, c,
                     CAST(SUM(c) OVER (PARTITION BY source
                       ORDER BY c DESC, token
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum,
                     CAST(SUM(c) OVER (PARTITION BY source)
                       AS BIGINT) AS total,
                     CAST(COUNT(*) OVER (PARTITION BY source)
                       AS BIGINT) AS vocab
              FROM stc),
            marked AS (
              SELECT source, total, vocab,
                     CASE WHEN (cum - c) * 10 < 9 * total THEN 1 ELSE 0
                       END AS in_nuc,
                     c * (CASE WHEN (cum - c) * 10 < 9 * total THEN 1
                          ELSE 0 END) AS nuc_mass
              FROM cum)
            SELECT source, MAX(vocab) AS vocab_size,
                   CAST(SUM(in_nuc) AS BIGINT) AS nucleus_size,
                   MAX(total) AS n_tokens,
                   CAST(SUM(in_nuc) AS BIGINT) * 1000000 // MAX(vocab)
                     AS nucleus_share_ppm,
                   CAST(SUM(nuc_mass) AS BIGINT) * 1000000 // MAX(total)
                     AS mass_captured_ppm
            FROM marked GROUP BY 1
        """,
        "q300_hll_set_algebra": """
            WITH h AS (
              SELECT CASE WHEN event_type = 'purchase' THEN 'A'
                     ELSE 'B' END AS s,
                     user_id, md5(CAST(user_id AS VARCHAR)) AS hh
              FROM events WHERE event_type IN ('purchase', 'error')),
            br AS (
              SELECT s, user_id,
                     ((instr('0123456789abcdef', substr(hh, 1, 1)) - 1)
                      * 16
                      + (instr('0123456789abcdef', substr(hh, 2, 1)) - 1))
                      % 64 AS bucket,
                     CAST((((((instr('0123456789abcdef',
                        substr(hh, 3, 1)) - 1) * 16
                      + (instr('0123456789abcdef', substr(hh, 4, 1)) - 1))
                        * 16
                      + (instr('0123456789abcdef', substr(hh, 5, 1)) - 1))
                        * 16
                      + (instr('0123456789abcdef', substr(hh, 6, 1)) - 1))
                        * 16
                      + (instr('0123456789abcdef', substr(hh, 7, 1)) - 1))
                        * 16
                      + (instr('0123456789abcdef', substr(hh, 8, 1)) - 1)
                      AS BIGINT) AS v
              FROM h),
            pb AS MATERIALIZED (
              SELECT s, bucket,
                     MAX(CASE WHEN v = 0 THEN 25
                         ELSE 25 - length(bin(v)) END) AS m
              FROM br GROUP BY 1, 2),
            za AS (
              SELECT s,
                     CAST(SUM(CAST(1 AS BIGINT) << (25 - m)) AS BIGINT)
                       + (64 - COUNT(*)) * CAST(33554432 AS BIGINT) AS z
              FROM pb GROUP BY 1),
            zu AS (
              SELECT CAST(SUM(CAST(1 AS BIGINT) << (25 - m)) AS BIGINT)
                       + (64 - COUNT(*)) * CAST(33554432 AS BIGINT) AS z
              FROM (SELECT bucket, MAX(m) AS m FROM pb GROUP BY 1)),
            est AS (
              SELECT
                MAX(CASE WHEN s = 'A' THEN
                  CAST(floor(0.709 * 4096.0 * 33554432.0
                       / CAST(z AS DOUBLE) * 1000000) AS BIGINT) END)
                  AS est_a_micro,
                MAX(CASE WHEN s = 'B' THEN
                  CAST(floor(0.709 * 4096.0 * 33554432.0
                       / CAST(z AS DOUBLE) * 1000000) AS BIGINT) END)
                  AS est_b_micro
              FROM za),
            estu AS (
              SELECT CAST(floor(0.709 * 4096.0 * 33554432.0
                     / CAST(z AS DOUBLE) * 1000000) AS BIGINT)
                     AS est_union_micro
              FROM zu),
            ex AS (
              SELECT
                MAX(CASE WHEN s = 'A' THEN n END) AS exact_a,
                MAX(CASE WHEN s = 'B' THEN n END) AS exact_b
              FROM (SELECT s, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                      AS n FROM h GROUP BY 1)),
            exu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
                      AS exact_union FROM h)
            SELECT est_a_micro, est_b_micro, est_union_micro,
                   exact_a, exact_b, exact_union,
                   est_a_micro + est_b_micro - est_union_micro
                     AS est_inter_micro,
                   exact_a + exact_b - exact_union AS exact_inter
            FROM est, estu, ex, exu
        """,
        "q301_embedding_homophily": f"""
            WITH {_MNN_CTES},
            lab AS (SELECT vec_id, label FROM embeddings),
            obs AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                     CAST(SUM(CASE WHEN la.label = lb.label THEN 1
                          ELSE 0 END) AS BIGINT) AS n_same
              FROM mnn JOIN lab la ON mnn.a = la.vec_id
                       JOIN lab lb ON mnn.b = lb.vec_id),
            marg AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS nl
                     FROM lab GROUP BY 1),
            base AS (
              SELECT CAST(SUM(nl * (nl - 1)) AS BIGINT) * 1000000
                       // (CAST(SUM(nl) AS BIGINT)
                           * (CAST(SUM(nl) AS BIGINT) - 1))
                       AS expected_ppm
              FROM marg)
            SELECT n_pairs, n_same,
                   n_same * 1000000 // n_pairs AS observed_ppm,
                   expected_ppm,
                   n_same * 1000000 // n_pairs - expected_ppm AS lift_ppm
            FROM obs, base
        """,
        "q302_chi2_keywords": f"""
            WITH stc AS MATERIALIZED (
              SELECT source, tok AS token, CAST(COUNT(*) AS BIGINT) AS a
              FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1, 2),
            tok AS (SELECT token, CAST(SUM(a) AS BIGINT) AS ct
                    FROM stc GROUP BY 1),
            srcs AS (SELECT source, CAST(SUM(a) AS BIGINT) AS ns
                     FROM stc GROUP BY 1),
            tot AS (SELECT CAST(SUM(ns) AS BIGINT) AS nn FROM srcs),
            cells AS (
              SELECT stc.source, stc.token, stc.a, ct, ns, nn
              FROM stc JOIN tok USING (token) JOIN srcs USING (source),
                   tot
              WHERE stc.a >= 5 AND stc.a * nn > ct * ns),
            scored AS (
              SELECT source, token, a,
                     CAST(floor(
                       CAST(nn AS DOUBLE)
                       * ((CAST(a AS DOUBLE) * CAST(nn - ct - ns + a
                             AS DOUBLE)
                           - CAST(ct - a AS DOUBLE)
                             * CAST(ns - a AS DOUBLE))
                          * (CAST(a AS DOUBLE) * CAST(nn - ct - ns + a
                               AS DOUBLE)
                             - CAST(ct - a AS DOUBLE)
                               * CAST(ns - a AS DOUBLE)))
                       / ((CAST(a AS DOUBLE) + CAST(ct - a AS DOUBLE))
                          * (CAST(ns - a AS DOUBLE)
                             + CAST(nn - ct - ns + a AS DOUBLE))
                          * (CAST(a AS DOUBLE) + CAST(ns - a AS DOUBLE))
                          * (CAST(ct - a AS DOUBLE)
                             + CAST(nn - ct - ns + a AS DOUBLE)))
                       * 1000) AS BIGINT) AS chi2_milli
              FROM cells)
            SELECT source, token, a, chi2_milli, rank FROM (
              SELECT source, token, a, chi2_milli,
                     CAST(ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY chi2_milli DESC, token) AS BIGINT)
                       AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "q303_woe_iv": """
            WITH base AS MATERIALIZED (
              SELECT c.c_mktsegment, o.o_orderpriority,
                     CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END
                       AS bad
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
            lv AS (
              SELECT 'c_mktsegment' AS feature, c_mktsegment AS level,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(bad) AS BIGINT) AS n_bad
              FROM base GROUP BY 2
              UNION ALL
              SELECT 'o_orderpriority', o_orderpriority,
                     CAST(COUNT(*) AS BIGINT), CAST(SUM(bad) AS BIGINT)
              FROM base GROUP BY 2),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt,
                           CAST(SUM(bad) AS BIGINT) AS bt FROM base),
            enr AS (
              SELECT feature, level, n, n_bad,
                     CAST(floor(ln(
                       (CAST(n - n_bad AS DOUBLE)
                        / CAST(nt - bt AS DOUBLE))
                       / (CAST(n_bad AS DOUBLE) / CAST(bt AS DOUBLE)))
                       * 1000000) AS BIGINT) AS woe_micro,
                     CAST(floor(
                       (CAST(n - n_bad AS DOUBLE)
                        / CAST(nt - bt AS DOUBLE)
                        - CAST(n_bad AS DOUBLE) / CAST(bt AS DOUBLE))
                       * 1000000) AS BIGINT) AS share_diff_micro
              FROM lv, tot)
            SELECT feature, level, n, n_bad, woe_micro,
                   CAST(SUM(share_diff_micro * woe_micro)
                        OVER (PARTITION BY feature) AS BIGINT) AS iv_pico
            FROM enr
        """,
        "q304_sort_key_advisor": """
            WITH o AS MATERIALIZED (
              SELECT o_orderkey, o_custkey,
                     date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS od,
                     CAST(o_totalprice AS DECIMAL(18,2)) AS op
              FROM orders),
            r1 AS (
              SELECT od,
                     CAST(ROW_NUMBER() OVER (ORDER BY od, o_orderkey)
                       AS BIGINT) AS rn,
                     CAST(COUNT(*) OVER () AS BIGINT) AS n
              FROM o),
            g1 AS (SELECT (rn - 1) * 64 // n AS rg, MIN(od) AS lo_od,
                            MAX(od) AS hi_od
                     FROM r1 GROUP BY 1),
            p1 AS (SELECT 'o_orderdate' AS sort_key,
                            CAST(COUNT(*) AS BIGINT) AS n_groups,
                            CAST(SUM(CASE WHEN hi_od < date_diff('day',
                                   DATE '1970-01-01', DATE '1995-01-01')
                                 OR lo_od > date_diff('day',
                                   DATE '1970-01-01', DATE '1995-12-31')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned
                     FROM g1),
            r2 AS (
              SELECT od,
                     CAST(ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey)
                       AS BIGINT) AS rn,
                     CAST(COUNT(*) OVER () AS BIGINT) AS n
              FROM o),
            g2 AS (SELECT (rn - 1) * 64 // n AS rg, MIN(od) AS lo_od,
                            MAX(od) AS hi_od
                     FROM r2 GROUP BY 1),
            p2 AS (SELECT 'o_custkey' AS sort_key,
                            CAST(COUNT(*) AS BIGINT) AS n_groups,
                            CAST(SUM(CASE WHEN hi_od < date_diff('day',
                                   DATE '1970-01-01', DATE '1995-01-01')
                                 OR lo_od > date_diff('day',
                                   DATE '1970-01-01', DATE '1995-12-31')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned
                     FROM g2),
            r3 AS (
              SELECT od,
                     CAST(ROW_NUMBER() OVER (ORDER BY op, o_orderkey)
                       AS BIGINT) AS rn,
                     CAST(COUNT(*) OVER () AS BIGINT) AS n
              FROM o),
            g3 AS (SELECT (rn - 1) * 64 // n AS rg, MIN(od) AS lo_od,
                            MAX(od) AS hi_od
                     FROM r3 GROUP BY 1),
            p3 AS (SELECT 'o_totalprice' AS sort_key,
                            CAST(COUNT(*) AS BIGINT) AS n_groups,
                            CAST(SUM(CASE WHEN hi_od < date_diff('day',
                                   DATE '1970-01-01', DATE '1995-01-01')
                                 OR lo_od > date_diff('day',
                                   DATE '1970-01-01', DATE '1995-12-31')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned
                     FROM g3)
            SELECT sort_key, n_groups, n_pruned,
                   n_pruned * 1000000 // n_groups AS pruned_ppm
            FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                  UNION ALL SELECT * FROM p3)
        """,
        "q305_ndv_correlation": """
            WITH dp1 AS MATERIALIZED (
              SELECT DISTINCT CAST(l_orderkey AS VARCHAR) || ':'
                     || CAST(l_partkey AS VARCHAR) AS pk FROM lineitem),
            e1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndv_pair
                     FROM dp1),
            z1 AS (
              SELECT CAST(SUM(CAST(1 AS BIGINT) << (25 - m)) AS BIGINT)
                       + (64 - COUNT(*)) * CAST(33554432 AS BIGINT) AS z
              FROM (
                SELECT bucket, MAX(CASE WHEN v = 0 THEN 25
                           ELSE 25 - length(bin(v)) END) AS m
                FROM (
                  SELECT ((instr('0123456789abcdef', substr(hh, 1, 1)) - 1) * 16
                          + (instr('0123456789abcdef', substr(hh, 2, 1)) - 1)) % 64 AS bucket,
                         CAST(((((((instr('0123456789abcdef', substr(hh, 3, 1)) - 1) * 16
                      + (instr('0123456789abcdef', substr(hh, 4, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 5, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 6, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 7, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 8, 1)) - 1)) AS BIGINT) AS v
                  FROM (SELECT md5(pk) AS hh FROM dp1))
                GROUP BY 1)),
            s1 AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv_a,
                            CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv_b,
                            CAST(COUNT(*) AS BIGINT) AS n_rows
                     FROM lineitem),
            p1 AS (SELECT 'orderkey_partkey' AS pair, ndv_a, ndv_b, n_rows,
                            ndv_pair,
                            least(ndv_a * ndv_b, n_rows)
                              AS independence_est,
                            ndv_pair * 1000000
                              // least(ndv_a * ndv_b, n_rows)
                              AS correlation_ppm,
                            CAST(floor(0.709 * 4096.0 * 33554432.0
                                 / CAST(z AS DOUBLE) * 1000000) AS BIGINT)
                              AS hll_est_micro
                     FROM s1, e1, z1),
            dp2 AS MATERIALIZED (
              SELECT DISTINCT CAST(l_partkey AS VARCHAR) || ':'
                     || CAST(l_suppkey AS VARCHAR) AS pk FROM lineitem),
            e2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndv_pair
                     FROM dp2),
            z2 AS (
              SELECT CAST(SUM(CAST(1 AS BIGINT) << (25 - m)) AS BIGINT)
                       + (64 - COUNT(*)) * CAST(33554432 AS BIGINT) AS z
              FROM (
                SELECT bucket, MAX(CASE WHEN v = 0 THEN 25
                           ELSE 25 - length(bin(v)) END) AS m
                FROM (
                  SELECT ((instr('0123456789abcdef', substr(hh, 1, 1)) - 1) * 16
                          + (instr('0123456789abcdef', substr(hh, 2, 1)) - 1)) % 64 AS bucket,
                         CAST(((((((instr('0123456789abcdef', substr(hh, 3, 1)) - 1) * 16
                      + (instr('0123456789abcdef', substr(hh, 4, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 5, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 6, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 7, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 8, 1)) - 1)) AS BIGINT) AS v
                  FROM (SELECT md5(pk) AS hh FROM dp2))
                GROUP BY 1)),
            s2 AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv_a,
                            CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS ndv_b,
                            CAST(COUNT(*) AS BIGINT) AS n_rows
                     FROM lineitem),
            p2 AS (SELECT 'partkey_suppkey' AS pair, ndv_a, ndv_b, n_rows,
                            ndv_pair,
                            least(ndv_a * ndv_b, n_rows)
                              AS independence_est,
                            ndv_pair * 1000000
                              // least(ndv_a * ndv_b, n_rows)
                              AS correlation_ppm,
                            CAST(floor(0.709 * 4096.0 * 33554432.0
                                 / CAST(z AS DOUBLE) * 1000000) AS BIGINT)
                              AS hll_est_micro
                     FROM s2, e2, z2),
            dp3 AS MATERIALIZED (
              SELECT DISTINCT CAST(l_returnflag AS VARCHAR) || ':'
                     || CAST(l_linestatus AS VARCHAR) AS pk FROM lineitem),
            e3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndv_pair
                     FROM dp3),
            z3 AS (
              SELECT CAST(SUM(CAST(1 AS BIGINT) << (25 - m)) AS BIGINT)
                       + (64 - COUNT(*)) * CAST(33554432 AS BIGINT) AS z
              FROM (
                SELECT bucket, MAX(CASE WHEN v = 0 THEN 25
                           ELSE 25 - length(bin(v)) END) AS m
                FROM (
                  SELECT ((instr('0123456789abcdef', substr(hh, 1, 1)) - 1) * 16
                          + (instr('0123456789abcdef', substr(hh, 2, 1)) - 1)) % 64 AS bucket,
                         CAST(((((((instr('0123456789abcdef', substr(hh, 3, 1)) - 1) * 16
                      + (instr('0123456789abcdef', substr(hh, 4, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 5, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 6, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 7, 1)) - 1)) * 16
                      + (instr('0123456789abcdef', substr(hh, 8, 1)) - 1)) AS BIGINT) AS v
                  FROM (SELECT md5(pk) AS hh FROM dp3))
                GROUP BY 1)),
            s3 AS (SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS ndv_a,
                            CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS ndv_b,
                            CAST(COUNT(*) AS BIGINT) AS n_rows
                     FROM lineitem),
            p3 AS (SELECT 'returnflag_linestatus' AS pair, ndv_a, ndv_b, n_rows,
                            ndv_pair,
                            least(ndv_a * ndv_b, n_rows)
                              AS independence_est,
                            ndv_pair * 1000000
                              // least(ndv_a * ndv_b, n_rows)
                              AS correlation_ppm,
                            CAST(floor(0.709 * 4096.0 * 33554432.0
                                 / CAST(z AS DOUBLE) * 1000000) AS BIGINT)
                              AS hll_est_micro
                     FROM s3, e3, z3)
            SELECT * FROM p1
            UNION ALL SELECT * FROM p2
            UNION ALL SELECT * FROM p3
        """,
        "q306_ktruss_support": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey
                       FROM lineitem),
            edges AS MATERIALIZED (
              SELECT a.l_partkey AS p1, c.l_partkey AS p2
              FROM b a JOIN b c
                ON a.l_orderkey = c.l_orderkey
               AND a.l_partkey < c.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            tri AS (
              SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
              FROM edges e1
              JOIN edges e2 ON e1.p2 = e2.p1
              WHERE EXISTS (SELECT 1 FROM edges e3
                            WHERE e3.p1 = e1.p1 AND e3.p2 = e2.p2)),
            credits AS (
              SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS support
              FROM (SELECT a AS p1, b AS p2 FROM tri
                    UNION ALL SELECT b, c FROM tri
                    UNION ALL SELECT a, c FROM tri)
              GROUP BY 1, 2),
            supported AS (
              SELECT COALESCE(c.support, 0) AS s
              FROM edges e LEFT JOIN credits c
                ON e.p1 = c.p1 AND e.p2 = c.p2)
            SELECT s, CAST(COUNT(*) AS BIGINT) AS n_edges,
                   CAST(SUM(CASE WHEN s >= 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS in_3truss,
                   CAST(SUM(CASE WHEN s >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS in_4truss
            FROM supported GROUP BY 1
        """,
        "q307_heavy_hitter_churn": f"""
            WITH cnt AS MATERIALIZED (
              SELECT h, tok AS token, CAST(COUNT(*) AS BIGINT) AS c
              FROM (
                SELECT ((instr('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                        * 16
                        + (instr('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
                        % 2 AS h,
                       unnest({_TOKS}) AS tok
                FROM documents)
              GROUP BY 1, 2),
            a AS (SELECT token, c AS c0,
                         CAST(ROW_NUMBER() OVER (ORDER BY c DESC, token)
                           AS BIGINT) AS r0
                  FROM cnt WHERE h = 0
                  QUALIFY r0 <= 20),
            bb AS (SELECT token, c AS c1,
                          CAST(ROW_NUMBER() OVER (ORDER BY c DESC, token)
                            AS BIGINT) AS r1
                   FROM cnt WHERE h = 1
                   QUALIFY r1 <= 20)
            SELECT COALESCE(a.token, bb.token) AS token,
                   COALESCE(c0, 0) AS count_a,
                   COALESCE(c1, 0) AS count_b,
                   r0, r1,
                   CASE WHEN r0 IS NULL THEN 'entered'
                        WHEN r1 IS NULL THEN 'exited'
                        ELSE 'stayed' END AS status,
                   COALESCE(r0 - r1, 0) AS rank_delta
            FROM a FULL OUTER JOIN bb ON a.token = bb.token
        """,
        "q308_shuffle_cost_model": """
            WITH lk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                               CAST(SUM(8 + 8) AS BIGINT) AS bytes
                        FROM lineitem),
            ok_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                           CAST(SUM(8 + strlen(
                             CAST(o_orderdate AS VARCHAR))) AS BIGINT)
                             AS bytes
                    FROM orders),
            oc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                          CAST(SUM(8 + 8) AS BIGINT) AS bytes
                   FROM orders),
            ck AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                          CAST(SUM(8 + strlen(
                            CAST(c_mktsegment AS VARCHAR))) AS BIGINT)
                            AS bytes
                   FROM customer),
            lp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                          CAST(SUM(8 + 8) AS BIGINT) AS bytes
                   FROM lineitem),
            pk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                          CAST(SUM(8 + strlen(
                            CAST(p_brand AS VARCHAR))) AS BIGINT)
                            AS bytes
                   FROM part),
            rows_ AS (
              SELECT 'lineitem_orders' AS join_name,
                     lk.n_rows AS n_left, ok_.n_rows AS n_right,
                     lk.bytes AS left_bytes, ok_.bytes AS right_bytes
              FROM lk, ok_
              UNION ALL
              SELECT 'orders_customer', oc.n_rows, ck.n_rows,
                     oc.bytes, ck.bytes
              FROM oc, ck
              UNION ALL
              SELECT 'lineitem_part', lp.n_rows, pk.n_rows,
                     lp.bytes, pk.bytes
              FROM lp, pk)
            SELECT join_name, n_left, n_right, left_bytes, right_bytes,
                   CASE WHEN least(left_bytes, right_bytes) < 10485760
                        THEN 'broadcast' ELSE 'shuffle' END AS strategy,
                   CASE WHEN least(left_bytes, right_bytes) < 10485760
                        THEN least(left_bytes, right_bytes)
                        ELSE left_bytes + right_bytes END
                     AS exchange_bytes
            FROM rows_
        """,
        "q309_loo_target_encoding": """
            WITH base AS MATERIALIZED (
              SELECT c.c_mktsegment,
                     CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END
                       AS bad
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
            lv AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS nl,
                          CAST(SUM(bad) AS BIGINT) AS bl
                   FROM base GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt,
                           CAST(SUM(bad) AS BIGINT) AS bt FROM base)
            SELECT b.c_mktsegment, b.bad AS own_outcome,
                   CAST(floor(
                     (CAST(bl - b.bad AS DOUBLE)
                      + 20.0 * (CAST(bt AS DOUBLE) / CAST(nt AS DOUBLE)))
                     / (CAST(nl - 1 AS DOUBLE) + 20.0)
                     * 1000000) AS BIGINT) AS enc_micro,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM base b JOIN lv ON b.c_mktsegment = lv.c_mktsegment, tot
            GROUP BY 1, 2, 3
        """,
        "q310_hard_negative_mining": f"""
            WITH {_MNN_CTES},
            lab AS (SELECT vec_id, label FROM embeddings)
            SELECT p.a, p.b, la.label AS la, lb.label AS lb,
                   CAST(floor(p.sim * 1000000) AS BIGINT) AS sim_micro
            FROM pairs p
            JOIN lab la ON p.a = la.vec_id
            JOIN lab lb ON p.b = lb.vec_id
            WHERE la.label <> lb.label
            ORDER BY sim_micro DESC, p.a, p.b LIMIT 20
        """,
        "q311_markov_entropy_rate": """
            WITH seq AS (
              SELECT src, dst FROM (
                SELECT event_type AS src,
                       LEAD(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS dst
                FROM events)
              WHERE dst IS NOT NULL),
            tc AS MATERIALIZED (
              SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
              FROM seq GROUP BY 1, 2),
            per_src AS (SELECT src, CAST(SUM(c) AS BIGINT) AS ns
                        FROM tc GROUP BY 1),
            tot AS (SELECT CAST(SUM(ns) AS BIGINT) AS nt FROM per_src)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(CAST(floor(
                     (-((CAST(ns AS DOUBLE) / CAST(nt AS DOUBLE))
                        * ((CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))
                           * ln(CAST(c AS DOUBLE) / CAST(ns AS DOUBLE)))))
                     * 1000000000000) AS BIGINT)) AS BIGINT)
                     AS entropy_rate_pico
            FROM tc JOIN per_src USING (src), tot
        """,
        "q312_fellegi_sunter": f"""
            WITH keyed AS MATERIALIZED (
              SELECT doc_id, lang, source, n_chars // 100 AS cb,
                     substr(array_to_string({_TOKS}, ' '), 1, 40) AS bag
              FROM documents),
            mp AS (
              SELECT x.lang AS la, y.lang AS lb, x.source AS sa,
                     y.source AS sb, x.cb AS ca, y.cb AS cbb
              FROM keyed x JOIN keyed y
                ON x.bag = y.bag AND x.doc_id < y.doc_id),
            rk AS (
              SELECT lang, source, cb,
                     CAST(ROW_NUMBER() OVER (ORDER BY
                       md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                       AS r,
                     CAST(COUNT(*) OVER () AS BIGINT) AS n
              FROM keyed),
            up AS (
              SELECT l.lang AS la, r2.lang AS lb, l.source AS sa,
                     r2.source AS sb, l.cb AS ca, r2.cb AS cbb
              FROM (SELECT lang, source, cb, r AS k FROM rk
                    WHERE r <= n // 2) l
              JOIN (SELECT lang, source, cb, r - n // 2 AS k FROM rk
                    WHERE r > n // 2) r2
                ON l.k = r2.k),
            ms AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END)
                          AS BIGINT) AS ag_lang,
                     CAST(SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END)
                          AS BIGINT) AS ag_source,
                     CAST(SUM(CASE WHEN ca = cbb THEN 1 ELSE 0 END)
                          AS BIGINT) AS ag_len
              FROM mp),
            us AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END)
                          AS BIGINT) AS ag_lang,
                     CAST(SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END)
                          AS BIGINT) AS ag_source,
                     CAST(SUM(CASE WHEN ca = cbb THEN 1 ELSE 0 END)
                          AS BIGINT) AS ag_len
              FROM up)
            SELECT 'lang' AS field,
                     ms.n AS n_matches, us.n AS n_nonmatches,
                     CAST(floor((CAST(ms.ag_lang + 1 AS DOUBLE) / CAST(ms.n + 2 AS DOUBLE)) * 1000000) AS BIGINT) AS m_ppm,
                     CAST(floor((CAST(us.ag_lang + 1 AS DOUBLE) / CAST(us.n + 2 AS DOUBLE)) * 1000000) AS BIGINT) AS u_ppm,
                     CAST(floor(ln((CAST(ms.ag_lang + 1 AS DOUBLE) / CAST(ms.n + 2 AS DOUBLE)) / (CAST(us.ag_lang + 1 AS DOUBLE) / CAST(us.n + 2 AS DOUBLE))) * 1000000) AS BIGINT)
                       AS w_agree_micro,
                     CAST(floor(ln((1.0 - (CAST(ms.ag_lang + 1 AS DOUBLE) / CAST(ms.n + 2 AS DOUBLE))) / (1.0 - (CAST(us.ag_lang + 1 AS DOUBLE) / CAST(us.n + 2 AS DOUBLE))))
                          * 1000000) AS BIGINT) AS w_disagree_micro
              FROM ms, us
            UNION ALL SELECT 'source' AS field,
                     ms.n AS n_matches, us.n AS n_nonmatches,
                     CAST(floor((CAST(ms.ag_source + 1 AS DOUBLE) / CAST(ms.n + 2 AS DOUBLE)) * 1000000) AS BIGINT) AS m_ppm,
                     CAST(floor((CAST(us.ag_source + 1 AS DOUBLE) / CAST(us.n + 2 AS DOUBLE)) * 1000000) AS BIGINT) AS u_ppm,
                     CAST(floor(ln((CAST(ms.ag_source + 1 AS DOUBLE) / CAST(ms.n + 2 AS DOUBLE)) / (CAST(us.ag_source + 1 AS DOUBLE) / CAST(us.n + 2 AS DOUBLE))) * 1000000) AS BIGINT)
                       AS w_agree_micro,
                     CAST(floor(ln((1.0 - (CAST(ms.ag_source + 1 AS DOUBLE) / CAST(ms.n + 2 AS DOUBLE))) / (1.0 - (CAST(us.ag_source + 1 AS DOUBLE) / CAST(us.n + 2 AS DOUBLE))))
                          * 1000000) AS BIGINT) AS w_disagree_micro
              FROM ms, us
            UNION ALL SELECT 'len_bucket' AS field,
                     ms.n AS n_matches, us.n AS n_nonmatches,
                     CAST(floor((CAST(ms.ag_len + 1 AS DOUBLE) / CAST(ms.n + 2 AS DOUBLE)) * 1000000) AS BIGINT) AS m_ppm,
                     CAST(floor((CAST(us.ag_len + 1 AS DOUBLE) / CAST(us.n + 2 AS DOUBLE)) * 1000000) AS BIGINT) AS u_ppm,
                     CAST(floor(ln((CAST(ms.ag_len + 1 AS DOUBLE) / CAST(ms.n + 2 AS DOUBLE)) / (CAST(us.ag_len + 1 AS DOUBLE) / CAST(us.n + 2 AS DOUBLE))) * 1000000) AS BIGINT)
                       AS w_agree_micro,
                     CAST(floor(ln((1.0 - (CAST(ms.ag_len + 1 AS DOUBLE) / CAST(ms.n + 2 AS DOUBLE))) / (1.0 - (CAST(us.ag_len + 1 AS DOUBLE) / CAST(us.n + 2 AS DOUBLE))))
                          * 1000000) AS BIGINT) AS w_disagree_micro
              FROM ms, us
        """,
        "q313_dedup_threshold_f1": f"""
            WITH toks AS MATERIALIZED (
              SELECT doc_id, list_distinct({_TOKS}) AS ws,
                     substr(array_to_string({_TOKS}, ' '), 1, 40) AS bag
              FROM documents),
            pairs AS MATERIALIZED (
              SELECT a.doc_id AS a, b.doc_id AS b,
                     CAST(floor(
                       CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
                       / CAST(len(a.ws) + len(b.ws)
                              - len(list_intersect(a.ws, b.ws))
                              AS DOUBLE) * 1000000) AS BIGINT) AS jm
              FROM toks a JOIN toks b ON a.doc_id < b.doc_id
              WHERE len(a.ws) > 0 AND len(b.ws) > 0),
            cand AS (SELECT * FROM pairs WHERE jm >= 500000),
            truth AS MATERIALIZED (
              SELECT x.doc_id AS a, y.doc_id AS b
              FROM toks x JOIN toks y
                ON x.bag = y.bag AND x.doc_id < y.doc_id),
            lab AS (
              SELECT p.jm, CASE WHEN t.a IS NULL THEN 0 ELSE 1 END AS t
              FROM cand p LEFT JOIN truth t
                ON p.a = t.a AND p.b = t.b),
            nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM truth),
            th AS (SELECT unnest([50, 60, 70, 80, 90])
                     AS threshold_pct),
            agg AS (
              SELECT threshold_pct,
                     CAST(SUM(CASE WHEN jm >= threshold_pct * 10000
                          AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                     CAST(SUM(CASE WHEN jm >= threshold_pct * 10000
                          AND t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp
              FROM th, lab GROUP BY 1)
            SELECT CAST(threshold_pct AS INT) AS threshold_pct, tp, fp,
                   nt - tp AS fn,
                   CASE WHEN tp + fp > 0
                        THEN CAST(CAST(tp AS HUGEINT) * 1000000
                                  // (tp + fp) AS BIGINT) ELSE 0 END
                     AS precision_ppm,
                   CASE WHEN nt > 0
                        THEN CAST(CAST(tp AS HUGEINT) * 1000000
                                  // nt AS BIGINT) ELSE 0 END
                     AS recall_ppm,
                   CASE WHEN 2 * tp + fp + (nt - tp) > 0
                        THEN CAST(2 * CAST(tp AS HUGEINT) * 1000000
                                  // (2 * tp + fp + (nt - tp)) AS BIGINT)
                        ELSE 0 END AS f1_ppm
            FROM agg, nt
        """,
        "q314_late_data_impact": """
            WITH base AS (
              SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
                     (((instr('0123456789abcdef', substr(md5('lag:' || CAST(event_id AS VARCHAR)), 1, 1)) - 1) * 4096 + (instr('0123456789abcdef', substr(md5('lag:' || CAST(event_id AS VARCHAR)), 2, 1)) - 1) * 256 + (instr('0123456789abcdef', substr(md5('lag:' || CAST(event_id AS VARCHAR)), 3, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5('lag:' || CAST(event_id AS VARCHAR)), 4, 1)) - 1) * 1) * CAST(65536 AS BIGINT) + ((instr('0123456789abcdef', substr(md5('lag:' || CAST(event_id AS VARCHAR)), 5, 1)) - 1) * 4096 + (instr('0123456789abcdef', substr(md5('lag:' || CAST(event_id AS VARCHAR)), 6, 1)) - 1) * 256 + (instr('0123456789abcdef', substr(md5('lag:' || CAST(event_id AS VARCHAR)), 7, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5('lag:' || CAST(event_id AS VARCHAR)), 8, 1)) - 1) * 1)) % 121 AS lag_s
              FROM events)
            SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n_all,
                   CAST(SUM(CASE WHEN lag_s <= 60 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_on_time,
                   CAST(COUNT(*) AS BIGINT)
                     - CAST(SUM(CASE WHEN lag_s <= 60 THEN 1 ELSE 0
                            END) AS BIGINT) AS n_late,
                   (CAST(COUNT(*) AS BIGINT)
                    - CAST(SUM(CASE WHEN lag_s <= 60 THEN 1 ELSE 0
                           END) AS BIGINT)) * 1000000
                     // CAST(COUNT(*) AS BIGINT) AS late_ppm
            FROM base GROUP BY 1, 2
        """,
        "q315_kcenter_seeds": """
            WITH dv AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS l
              FROM embeddings),
            nrm AS MATERIALIZED (
              SELECT vec_id, l,
                     sqrt(list_reduce(list_transform(l, x -> x * x),
                                      (a, b) -> a + b)) AS nn
              FROM dv),
            c1 AS (
              SELECT vec_id AS c_id, l, nn, 1 AS round,
                     CAST(0 AS BIGINT) AS dist_micro
              FROM nrm ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
              LIMIT 1),
            cs2 AS (
              SELECT c_id, l, nn, round, dist_micro FROM c1),
            d2 AS (
              SELECT e.vec_id, MIN(CAST(floor((1.0 - list_reduce([e.l[i] * c.l[i] for i in generate_series(1, len(e.l))], (x, y) -> x + y) / (e.nn * c.nn)) * 1000000) AS BIGINT)) AS dmin
              FROM nrm e, cs2 c GROUP BY 1),
            p2 AS (SELECT vec_id, dmin FROM d2
                     ORDER BY dmin DESC, vec_id LIMIT 1),
            c2 AS (
              SELECT n.vec_id AS c_id, n.l, n.nn, 2 AS round,
                     p.dmin AS dist_micro
              FROM nrm n JOIN p2 p ON n.vec_id = p.vec_id),
            cs3 AS (
              SELECT c_id, l, nn, round, dist_micro FROM c1
              UNION ALL SELECT c_id, l, nn, round, dist_micro FROM c2),
            d3 AS (
              SELECT e.vec_id, MIN(CAST(floor((1.0 - list_reduce([e.l[i] * c.l[i] for i in generate_series(1, len(e.l))], (x, y) -> x + y) / (e.nn * c.nn)) * 1000000) AS BIGINT)) AS dmin
              FROM nrm e, cs3 c GROUP BY 1),
            p3 AS (SELECT vec_id, dmin FROM d3
                     ORDER BY dmin DESC, vec_id LIMIT 1),
            c3 AS (
              SELECT n.vec_id AS c_id, n.l, n.nn, 3 AS round,
                     p.dmin AS dist_micro
              FROM nrm n JOIN p3 p ON n.vec_id = p.vec_id),
            cs4 AS (
              SELECT c_id, l, nn, round, dist_micro FROM c1
              UNION ALL SELECT c_id, l, nn, round, dist_micro FROM c2
              UNION ALL SELECT c_id, l, nn, round, dist_micro FROM c3),
            d4 AS (
              SELECT e.vec_id, MIN(CAST(floor((1.0 - list_reduce([e.l[i] * c.l[i] for i in generate_series(1, len(e.l))], (x, y) -> x + y) / (e.nn * c.nn)) * 1000000) AS BIGINT)) AS dmin
              FROM nrm e, cs4 c GROUP BY 1),
            p4 AS (SELECT vec_id, dmin FROM d4
                     ORDER BY dmin DESC, vec_id LIMIT 1),
            c4 AS (
              SELECT n.vec_id AS c_id, n.l, n.nn, 4 AS round,
                     p.dmin AS dist_micro
              FROM nrm n JOIN p4 p ON n.vec_id = p.vec_id),
            cs5 AS (
              SELECT c_id, l, nn, round, dist_micro FROM c1
              UNION ALL SELECT c_id, l, nn, round, dist_micro FROM c2
              UNION ALL SELECT c_id, l, nn, round, dist_micro FROM c3
              UNION ALL SELECT c_id, l, nn, round, dist_micro FROM c4),
            d5 AS (
              SELECT e.vec_id, MIN(CAST(floor((1.0 - list_reduce([e.l[i] * c.l[i] for i in generate_series(1, len(e.l))], (x, y) -> x + y) / (e.nn * c.nn)) * 1000000) AS BIGINT)) AS dmin
              FROM nrm e, cs5 c GROUP BY 1),
            p5 AS (SELECT vec_id, dmin FROM d5
                     ORDER BY dmin DESC, vec_id LIMIT 1),
            c5 AS (
              SELECT n.vec_id AS c_id, n.l, n.nn, 5 AS round,
                     p.dmin AS dist_micro
              FROM nrm n JOIN p5 p ON n.vec_id = p.vec_id),
            allc AS MATERIALIZED (
              SELECT c_id, l, nn, round, dist_micro FROM c1
              UNION ALL SELECT c_id, l, nn, round, dist_micro FROM c2
              UNION ALL SELECT c_id, l, nn, round, dist_micro FROM c3
              UNION ALL SELECT c_id, l, nn, round, dist_micro FROM c4
              UNION ALL SELECT c_id, l, nn, round, dist_micro FROM c5),
            rad AS (
              SELECT CAST(MAX(dmin) AS BIGINT) AS radius_micro FROM (
                SELECT e.vec_id, MIN(CAST(floor((1.0 - list_reduce([e.l[i] * c.l[i] for i in generate_series(1, len(e.l))], (x, y) -> x + y) / (e.nn * c.nn)) * 1000000) AS BIGINT)) AS dmin
                FROM nrm e, allc c GROUP BY 1))
            SELECT c_id, round, dist_micro, radius_micro
            FROM allc, rad
        """,
        "q316_ranker_agreement": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
            tf AS MATERIALIZED (
              SELECT doc_id, token, COUNT(*) AS tf
              FROM toks GROUP BY 1, 2),
            dl AS MATERIALIZED (
              SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
              FROM tf GROUP BY 1),
            dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
            stats AS (SELECT COUNT(*) AS n_docs,
                             CAST(SUM(dl) AS BIGINT) AS total_tokens
                      FROM dl),
            qterms AS (
              SELECT token, df FROM dfreq
              QUALIFY ROW_NUMBER() OVER (ORDER BY df DESC, token) <= 5),
            s134 AS (
              SELECT tf.doc_id,
                     CAST(floor(
                       ln(1.0 + ((CAST(n_docs - df AS DOUBLE) + 0.5)
                                 / (CAST(df AS DOUBLE) + 0.5)))
                       * ((CAST(tf AS DOUBLE) * 2.2)
                          / (CAST(tf AS DOUBLE)
                             + 1.2 * (0.25 + 0.75
                                      * (CAST(dl * n_docs AS DOUBLE)
                                         / total_tokens))))
                       * 1000000) AS BIGINT) AS s_micro
              FROM tf JOIN qterms USING (token) JOIN dl USING (doc_id),
                   stats),
            a AS (
              SELECT doc_id,
                     CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC,
                       doc_id) AS BIGINT) AS ra
              FROM (SELECT doc_id, CAST(SUM(s_micro) AS BIGINT)
                      AS score_micro
                    FROM s134 GROUP BY doc_id)
              QUALIFY ra <= 20),
            ctf AS MATERIALIZED (
              SELECT token AS tok, CAST(SUM(tf) AS BIGINT) AS ctf
              FROM tf GROUP BY 1),
            tot AS (SELECT CAST(SUM(ctf) AS BIGINT) AS t FROM ctf),
            qt AS (SELECT tok, ctf FROM ctf ORDER BY ctf DESC, tok
                   LIMIT 5),
            q_ AS MATERIALIZED (
              SELECT tok,
                     1000.0 * (CAST(ctf AS DOUBLE) / CAST(t AS DOUBLE))
                       AS mup
              FROM qt, tot),
            qs AS (SELECT CAST(SUM(CAST(floor(ln(mup) * 1000000)
                        AS BIGINT)) AS BIGINT) AS s_const FROM q_),
            adj AS (
              SELECT doc_id,
                     CAST(SUM(CAST(floor(
                       ln((CAST(tf AS DOUBLE) + mup) / mup) * 1000000)
                       AS BIGINT)) AS BIGINT) AS adj
              FROM tf JOIN q_ ON tf.token = q_.tok GROUP BY 1),
            b AS (
              SELECT doc_id,
                     CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC,
                       doc_id) AS BIGINT) AS rb
              FROM (
                SELECT dl.doc_id AS doc_id,
                       s_const
                       - 5 * CAST(floor(ln(CAST(dl AS DOUBLE) + 1000.0)
                                        * 1000000) AS BIGINT)
                       + COALESCE(adj, 0) AS score_micro
                FROM dl CROSS JOIN qs
                LEFT JOIN adj ON dl.doc_id = adj.doc_id)
              QUALIFY rb <= 20),
            j AS (SELECT greatest(a.ra, b.rb) AS m
                  FROM a JOIN b USING (doc_id))
            SELECT CAST(COUNT(*) AS BIGINT) AS n_joint,
                   CAST(SUM(CAST(floor(
                     list_extract({_RBO_TAIL_SQL}, CAST(m AS INT))
                     * 1000000000) AS BIGINT)) AS BIGINT) AS rbo_nano
            FROM j
        """,
        "q317_char_entropy_budget": """
            WITH chars AS MATERIALIZED (
              SELECT source, ch, CAST(COUNT(*) AS BIGINT) AS c
              FROM (
                SELECT source, substr(text, CAST(i AS INTEGER), 1) AS ch
                FROM (SELECT source, text,
                             unnest(generate_series(1, length(text)))
                               AS i
                      FROM documents))
              WHERE ch <> '' GROUP BY 1, 2),
            per_src AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
                        FROM chars GROUP BY 1),
            nats AS (
              SELECT source, MAX(n) AS n_chars,
                     CAST(COUNT(*) AS BIGINT) AS alphabet,
                     CAST(SUM(CAST(floor(
                       (-((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                          * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))))
                       * 1000000000000) AS BIGINT)) AS BIGINT)
                       AS nats_pico
              FROM chars JOIN per_src USING (source) GROUP BY 1)
            SELECT source, n_chars, alphabet,
                   CAST(floor(CAST(nats_pico AS DOUBLE)
                        / 0.6931471805599453 / 1000000.0) AS BIGINT)
                     AS bits_per_char_micro,
                   CAST(floor(CAST(nats_pico AS DOUBLE)
                        / 0.6931471805599453 / 1000000000000.0 / 8.0
                        * CAST(n_chars AS DOUBLE)) AS BIGINT)
                     AS min_bytes
            FROM nats
        """,
        "q318_wasserstein_drift": """
            WITH sv AS MATERIALIZED (
              SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
              FROM documents GROUP BY 1, 2),
            gv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS gc
                   FROM sv GROUP BY 1),
            ng AS (SELECT CAST(SUM(gc) AS BIGINT) AS ng FROM gv),
            ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns
                   FROM sv GROUP BY 1),
            gcum AS (
              SELECT v,
                     CAST(SUM(gc) OVER (ORDER BY v ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS gcum,
                     LEAD(v) OVER (ORDER BY v) AS v_next
              FROM gv),
            grid AS (
              SELECT ns.source, ns.ns, g.v, g.gcum, g.v_next,
                     COALESCE(sv.c, 0) AS c0
              FROM ns CROSS JOIN gcum g
              LEFT JOIN sv ON sv.source = ns.source AND sv.v = g.v),
            terms AS (
              SELECT source, ns,
                     CASE WHEN v_next IS NOT NULL THEN
                       CAST(floor(abs(
                         CAST(SUM(c0) OVER (PARTITION BY source
                           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS DOUBLE)
                         / CAST(ns AS DOUBLE)
                         - CAST(gcum AS DOUBLE) / CAST(ng AS DOUBLE))
                         * CAST(v_next - v AS DOUBLE) * 1000000)
                         AS BIGINT)
                     ELSE 0 END AS t
              FROM grid, ng)
            SELECT source, MAX(ns) AS n_docs,
                   CAST(SUM(t) AS BIGINT) AS w1_micro
            FROM terms GROUP BY 1
        """,
        "q319_quantile_treatment_effect": """
            WITH armed AS MATERIALIZED (
              SELECT ((instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                        - 1) * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))
                        - 1)) % 2 AS arm,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
              FROM orders),
            ranked AS (
              SELECT arm, cents,
                     ROW_NUMBER() OVER (PARTITION BY arm
                                        ORDER BY cents) AS rn,
                     COUNT(*) OVER (PARTITION BY arm) AS n
              FROM armed),
            qrow AS (
              SELECT arm,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.1 AS DOUBLE) * n) AS BIGINT)) THEN cents END) AS p10,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.2 AS DOUBLE) * n) AS BIGINT)) THEN cents END) AS p20,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.3 AS DOUBLE) * n) AS BIGINT)) THEN cents END) AS p30,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.4 AS DOUBLE) * n) AS BIGINT)) THEN cents END) AS p40,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT)) THEN cents END) AS p50,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.6 AS DOUBLE) * n) AS BIGINT)) THEN cents END) AS p60,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.7 AS DOUBLE) * n) AS BIGINT)) THEN cents END) AS p70,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.8 AS DOUBLE) * n) AS BIGINT)) THEN cents END) AS p80,
                     MAX(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.9 AS DOUBLE) * n) AS BIGINT)) THEN cents END) AS p90
              FROM ranked GROUP BY arm),
            long AS (
              SELECT arm, 'p10' AS decile, p10 AS q_cents FROM qrow
              UNION ALL SELECT arm, 'p20' AS decile, p20 AS q_cents FROM qrow
              UNION ALL SELECT arm, 'p30' AS decile, p30 AS q_cents FROM qrow
              UNION ALL SELECT arm, 'p40' AS decile, p40 AS q_cents FROM qrow
              UNION ALL SELECT arm, 'p50' AS decile, p50 AS q_cents FROM qrow
              UNION ALL SELECT arm, 'p60' AS decile, p60 AS q_cents FROM qrow
              UNION ALL SELECT arm, 'p70' AS decile, p70 AS q_cents FROM qrow
              UNION ALL SELECT arm, 'p80' AS decile, p80 AS q_cents FROM qrow
              UNION ALL SELECT arm, 'p90' AS decile, p90 AS q_cents FROM qrow)
            SELECT a.decile, a.q_cents AS q_a_cents,
                   b.q_cents AS q_b_cents,
                   b.q_cents - a.q_cents AS qte_cents
            FROM (SELECT decile, q_cents FROM long WHERE arm = 0) a
            JOIN (SELECT decile, q_cents FROM long WHERE arm = 1) b
              USING (decile)
        """,
        "q320_heaps_law": f"""
            WITH toks AS MATERIALIZED (
              SELECT doc_id // 50 AS batch, unnest({_TOKS}) AS token
              FROM documents),
            occ AS (SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_occ
                    FROM toks GROUP BY 1),
            firsts AS (
              SELECT fb, CAST(COUNT(*) AS BIGINT) AS n_new
              FROM (SELECT token, MIN(batch) AS fb FROM toks GROUP BY 1)
              GROUP BY 1),
            series AS (
              SELECT o.batch,
                     CAST(SUM(o.n_occ) OVER (ORDER BY o.batch ROWS
                       BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_n,
                     CAST(SUM(COALESCE(f.n_new, 0)) OVER (ORDER BY
                       o.batch ROWS BETWEEN UNBOUNDED PRECEDING AND
                       CURRENT ROW) AS BIGINT) AS cum_v
              FROM occ o LEFT JOIN firsts f ON o.batch = f.fb),
            pts AS (
              SELECT cum_n, cum_v,
                     CAST(floor(ln(CAST(cum_n AS DOUBLE)) * 1000000)
                       AS BIGINT) AS x,
                     CAST(floor(ln(CAST(cum_v AS DOUBLE)) * 1000000)
                       AS BIGINT) AS y
              FROM series),
            s AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
                     CAST(SUM(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
                     CAST(MAX(cum_n) AS BIGINT) AS total_tokens,
                     CAST(MAX(cum_v) AS BIGINT) AS vocab
              FROM pts)
            SELECT n AS n_batches, total_tokens, vocab,
                   CAST(floor(
                     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * 1000000) AS BIGINT) AS heaps_exponent_micro,
                   CAST(floor(
                     (CAST(sy AS DOUBLE)
                      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE)) AS BIGINT) AS icept_micro
            FROM s
        """,
        "q321_mmr_rerank": """
            WITH dv AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS l
              FROM embeddings),
            nrm AS MATERIALIZED (
              SELECT vec_id, l,
                     sqrt(list_reduce(list_transform(l, x -> x * x),
                                      (a, b) -> a + b)) AS nn
              FROM dv),
            qv AS (SELECT l AS qv, nn AS qn FROM nrm WHERE vec_id = 0),
            cands AS MATERIALIZED (
              SELECT vec_id, l, nn, rel_micro FROM (
                SELECT e.vec_id, e.l, e.nn,
                       CAST(floor(list_reduce([e.l[i] * q.qv[i] for i in generate_series(1, len(e.l))], (x, y) -> x + y) / (e.nn * q.qn) * 1000000)
                         AS BIGINT) AS rel_micro
                FROM nrm e CROSS JOIN qv q WHERE e.vec_id <> 0)
              ORDER BY rel_micro DESC, vec_id LIMIT 20),
            s1 AS (
              SELECT vec_id, l, nn, rel_micro, 1 AS rank,
                     7 * rel_micro AS mmr_decimicro
              FROM cands ORDER BY rel_micro DESC, vec_id LIMIT 1),
            sel2 AS (
              SELECT vec_id, l, nn, rel_micro, rank, mmr_decimicro FROM s1),
            m2 AS (
              SELECT c.vec_id, c.rel_micro, MAX(CAST(floor(list_reduce([c.l[i] * s.l[i] for i in generate_series(1, len(c.l))], (x, y) -> x + y) / (c.nn * s.nn) * 1000000) AS BIGINT)) AS max_sim
              FROM cands c CROSS JOIN sel2 s
              WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
              GROUP BY 1, 2),
            p2 AS (
              SELECT vec_id, rel_micro,
                     7 * rel_micro - 3 * max_sim AS mmr_decimicro
              FROM m2 ORDER BY mmr_decimicro DESC, vec_id LIMIT 1),
            s2 AS (
              SELECT c.vec_id, c.l, c.nn, c.rel_micro, 2 AS rank,
                     p2.mmr_decimicro
              FROM cands c JOIN p2 USING (vec_id)),
            sel3 AS (
              SELECT vec_id, l, nn, rel_micro, rank, mmr_decimicro FROM s1
              UNION ALL SELECT vec_id, l, nn, rel_micro, rank, mmr_decimicro FROM s2),
            m3 AS (
              SELECT c.vec_id, c.rel_micro, MAX(CAST(floor(list_reduce([c.l[i] * s.l[i] for i in generate_series(1, len(c.l))], (x, y) -> x + y) / (c.nn * s.nn) * 1000000) AS BIGINT)) AS max_sim
              FROM cands c CROSS JOIN sel3 s
              WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
              GROUP BY 1, 2),
            p3 AS (
              SELECT vec_id, rel_micro,
                     7 * rel_micro - 3 * max_sim AS mmr_decimicro
              FROM m3 ORDER BY mmr_decimicro DESC, vec_id LIMIT 1),
            s3 AS (
              SELECT c.vec_id, c.l, c.nn, c.rel_micro, 3 AS rank,
                     p3.mmr_decimicro
              FROM cands c JOIN p3 USING (vec_id)),
            sel4 AS (
              SELECT vec_id, l, nn, rel_micro, rank, mmr_decimicro FROM s1
              UNION ALL SELECT vec_id, l, nn, rel_micro, rank, mmr_decimicro FROM s2
              UNION ALL SELECT vec_id, l, nn, rel_micro, rank, mmr_decimicro FROM s3),
            m4 AS (
              SELECT c.vec_id, c.rel_micro, MAX(CAST(floor(list_reduce([c.l[i] * s.l[i] for i in generate_series(1, len(c.l))], (x, y) -> x + y) / (c.nn * s.nn) * 1000000) AS BIGINT)) AS max_sim
              FROM cands c CROSS JOIN sel4 s
              WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
              GROUP BY 1, 2),
            p4 AS (
              SELECT vec_id, rel_micro,
                     7 * rel_micro - 3 * max_sim AS mmr_decimicro
              FROM m4 ORDER BY mmr_decimicro DESC, vec_id LIMIT 1),
            s4 AS (
              SELECT c.vec_id, c.l, c.nn, c.rel_micro, 4 AS rank,
                     p4.mmr_decimicro
              FROM cands c JOIN p4 USING (vec_id)),
            sel5 AS (
              SELECT vec_id, l, nn, rel_micro, rank, mmr_decimicro FROM s1
              UNION ALL SELECT vec_id, l, nn, rel_micro, rank, mmr_decimicro FROM s2
              UNION ALL SELECT vec_id, l, nn, rel_micro, rank, mmr_decimicro FROM s3
              UNION ALL SELECT vec_id, l, nn, rel_micro, rank, mmr_decimicro FROM s4),
            m5 AS (
              SELECT c.vec_id, c.rel_micro, MAX(CAST(floor(list_reduce([c.l[i] * s.l[i] for i in generate_series(1, len(c.l))], (x, y) -> x + y) / (c.nn * s.nn) * 1000000) AS BIGINT)) AS max_sim
              FROM cands c CROSS JOIN sel5 s
              WHERE c.vec_id NOT IN (SELECT vec_id FROM sel5)
              GROUP BY 1, 2),
            p5 AS (
              SELECT vec_id, rel_micro,
                     7 * rel_micro - 3 * max_sim AS mmr_decimicro
              FROM m5 ORDER BY mmr_decimicro DESC, vec_id LIMIT 1),
            s5 AS (
              SELECT c.vec_id, c.l, c.nn, c.rel_micro, 5 AS rank,
                     p5.mmr_decimicro
              FROM cands c JOIN p5 USING (vec_id))
            SELECT rank, vec_id, rel_micro, mmr_decimicro FROM s1
            UNION ALL SELECT rank, vec_id, rel_micro, mmr_decimicro FROM s2
            UNION ALL SELECT rank, vec_id, rel_micro, mmr_decimicro FROM s3
            UNION ALL SELECT rank, vec_id, rel_micro, mmr_decimicro FROM s4
            UNION ALL SELECT rank, vec_id, rel_micro, mmr_decimicro FROM s5
        """,
        "q322_wilson_interval": """
            WITH agg AS (
              SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS s
              FROM events GROUP BY 1)
            SELECT event_type, n, s,
                   CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                        * 1000000) AS BIGINT) AS p_ppm,
                   CAST(floor((
                     (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                      + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE)))
                     / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))
                     - 1.96 * sqrt(
                         (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         / CAST(n AS DOUBLE)
                         + 1.96 * 1.96 / (4.0 * CAST(n AS DOUBLE)
                                          * CAST(n AS DOUBLE)))
                       / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)))
                     * 1000000) AS BIGINT) AS lo_micro,
                   CAST(floor((
                     (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                      + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE)))
                     / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))
                     + 1.96 * sqrt(
                         (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         / CAST(n AS DOUBLE)
                         + 1.96 * 1.96 / (4.0 * CAST(n AS DOUBLE)
                                          * CAST(n AS DOUBLE)))
                       / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)))
                     * 1000000) AS BIGINT) AS hi_micro
            FROM agg
        """,
        "q323_srm_guardrail": """
            WITH arms AS (
              SELECT DISTINCT
                     ((instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                      * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1))
                      % 2 AS arm,
                     user_id
              FROM events),
            agg AS (
              SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS na,
                     CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS nb
              FROM arms)
            SELECT na, nb,
                   CAST(floor(CAST(na - nb AS DOUBLE)
                        * CAST(na - nb AS DOUBLE)
                        / CAST(na + nb AS DOUBLE) * 1000000) AS BIGINT)
                     AS chi2_micro,
                   CASE WHEN CAST(na - nb AS DOUBLE)
                        * CAST(na - nb AS DOUBLE)
                        / CAST(na + nb AS DOUBLE)
                        > 3.841458820694124 THEN 1 ELSE 0 END
                     AS srm_flagged,
                   abs(na - nb) * 1000000 // (na + nb) AS imbalance_ppm
            FROM agg
        """,
        "q324_topic_coherence": f"""
            WITH stc0 AS MATERIALIZED (
              SELECT source, tok AS token, CAST(COUNT(*) AS BIGINT) AS a
              FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1, 2),
            tok0 AS (SELECT token, CAST(SUM(a) AS BIGINT) AS ct
                     FROM stc0 GROUP BY 1),
            srcs0 AS (SELECT source, CAST(SUM(a) AS BIGINT) AS ns
                      FROM stc0 GROUP BY 1),
            tot0 AS (SELECT CAST(SUM(ns) AS BIGINT) AS nn FROM srcs0),
            cells0 AS (
              SELECT stc0.source, stc0.token, stc0.a, ct, ns, nn
              FROM stc0 JOIN tok0 USING (token)
                   JOIN srcs0 USING (source), tot0
              WHERE stc0.a >= 5 AND stc0.a * nn > ct * ns),
            scored0 AS (
              SELECT source, token,
                     CAST(floor(
                       CAST(nn AS DOUBLE)
                       * ((CAST(a AS DOUBLE) * CAST(nn - ct - ns + a
                             AS DOUBLE)
                           - CAST(ct - a AS DOUBLE)
                             * CAST(ns - a AS DOUBLE))
                          * (CAST(a AS DOUBLE) * CAST(nn - ct - ns + a
                               AS DOUBLE)
                             - CAST(ct - a AS DOUBLE)
                               * CAST(ns - a AS DOUBLE)))
                       / ((CAST(a AS DOUBLE) + CAST(ct - a AS DOUBLE))
                          * (CAST(ns - a AS DOUBLE)
                             + CAST(nn - ct - ns + a AS DOUBLE))
                          * (CAST(a AS DOUBLE) + CAST(ns - a AS DOUBLE))
                          * (CAST(ct - a AS DOUBLE)
                             + CAST(nn - ct - ns + a AS DOUBLE)))
                       * 1000) AS BIGINT) AS chi2_milli
              FROM cells0),
            kw AS MATERIALIZED (
              SELECT source, token FROM (
                SELECT source, token,
                       ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY chi2_milli DESC, token) AS rank
                FROM scored0)
              WHERE rank <= 5),
            dt AS MATERIALIZED (
              SELECT DISTINCT doc_id, tok AS token
              FROM (SELECT doc_id, unnest({_TOKS}) AS tok
                    FROM documents)
              WHERE tok IN (SELECT DISTINCT token FROM kw)),
            nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
                   FROM documents),
            occ AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS nw
                    FROM dt GROUP BY 1),
            co AS (
              SELECT a.token AS w1, b.token AS w2,
                     CAST(COUNT(*) AS BIGINT) AS n12
              FROM dt a JOIN dt b USING (doc_id)
              WHERE a.token < b.token
              GROUP BY 1, 2),
            grid AS (
              SELECT x.source, x.token AS w1, y.token AS w2
              FROM kw x JOIN kw y USING (source)
              WHERE x.token < y.token),
            joined AS (
              SELECT g.source, COALESCE(co.n12, 0) AS c12,
                     o1.nw AS n1, o2.nw AS n2, nd.n_docs
              FROM grid g
              JOIN occ o1 ON g.w1 = o1.token
              JOIN occ o2 ON g.w2 = o2.token
              LEFT JOIN co ON g.w1 = co.w1 AND g.w2 = co.w2
              CROSS JOIN nd),
            terms AS (
              SELECT source,
                     CASE WHEN c12 = 0 THEN CAST(-1000000 AS BIGINT)
                          ELSE CAST(floor(
                            ln((CAST(c12 AS DOUBLE)
                                * CAST(n_docs AS DOUBLE))
                               / (CAST(n1 AS DOUBLE)
                                  * CAST(n2 AS DOUBLE)))
                            / (-ln(CAST(c12 AS DOUBLE)
                                   / CAST(n_docs AS DOUBLE)))
                            * 1000000) AS BIGINT) END AS t
              FROM joined)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CASE WHEN SUM(t) >= 0
                        THEN CAST(SUM(t) AS BIGINT) // COUNT(*)
                        ELSE -(CAST(-SUM(t) AS BIGINT) // COUNT(*))
                   END AS mean_npmi_micro
            FROM terms GROUP BY 1
        """,
        "q325_mix_shift_decomposition": """
            WITH base AS (
              SELECT c.c_mktsegment,
                     CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT)
                       AS yr,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                          AS BIGINT) AS cents
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE year(CAST(o.o_orderdate AS DATE)) IN (1995, 1996)
              GROUP BY 1, 2),
            tot AS (SELECT yr, CAST(SUM(n) AS BIGINT) AS ny
                    FROM base GROUP BY 1),
            wide AS (
              SELECT c_mktsegment,
                     MAX(CASE WHEN yr = 1995 THEN n END) AS n1,
                     MAX(CASE WHEN yr = 1995 THEN cents END) AS c1,
                     MAX(CASE WHEN yr = 1995 THEN ny END) AS t1,
                     MAX(CASE WHEN yr = 1996 THEN n END) AS n2,
                     MAX(CASE WHEN yr = 1996 THEN cents END) AS c2,
                     MAX(CASE WHEN yr = 1996 THEN ny END) AS t2
              FROM base JOIN tot USING (yr)
              GROUP BY 1)
            SELECT c_mktsegment,
                   CAST(floor(CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                        * 1000000) AS BIGINT) AS w1_ppm,
                   CAST(floor(CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE)
                        * 1000000) AS BIGINT) AS w2_ppm,
                   CAST(floor(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        * 1000) AS BIGINT) AS r1_millicents,
                   CAST(floor(CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                        * 1000) AS BIGINT) AS r2_millicents,
                   CAST(floor(CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                        * (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                           - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                        * 1000) AS BIGINT) AS rate_effect_milli,
                   CAST(floor((CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE)
                        - CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                        * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                        * 1000) AS BIGINT) AS mix_effect_milli,
                   CAST(floor((CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE)
                        - CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                        * (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                           - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                        * 1000) AS BIGINT) AS interaction_milli
            FROM wide
        """,
        "q326_chao1_richness": f"""
            WITH stc AS (
              SELECT source, tok AS token, CAST(COUNT(*) AS BIGINT) AS c
              FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1, 2),
            per AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
                     CAST(SUM(c) AS BIGINT) AS n_tokens,
                     CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS f1,
                     CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                          AS BIGINT) AS f2
              FROM stc GROUP BY 1)
            SELECT source, vocab, n_tokens, f1, f2,
                   CAST(floor((CAST(vocab AS DOUBLE)
                        + CASE WHEN f2 > 0
                          THEN CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE)
                               / (2.0 * CAST(f2 AS DOUBLE))
                          ELSE CAST(f1 AS DOUBLE)
                               * (CAST(f1 AS DOUBLE) - 1.0)
                               / (2.0 * (CAST(f2 AS DOUBLE) + 1.0))
                          END)
                        * 1000) AS BIGINT) AS chao1_milli,
                   CAST(floor((1.0 - CAST(f1 AS DOUBLE)
                        / CAST(n_tokens AS DOUBLE))
                        * 1000000) AS BIGINT) AS coverage_ppm
            FROM per
        """,
        "q327_mcnemar_model_compare": """
            WITH cells AS (
              SELECT CASE WHEN (CASE WHEN CAST(o_totalprice
                                  AS DECIMAL(18,2)) > 150000
                                THEN 1 ELSE 0 END)
                          = (CASE WHEN o_orderstatus = 'F'
                             THEN 1 ELSE 0 END) THEN 1 ELSE 0 END AS ar,
                     CASE WHEN (CASE WHEN o_orderpriority IN
                                  ('1-URGENT', '2-HIGH')
                                THEN 1 ELSE 0 END)
                          = (CASE WHEN o_orderstatus = 'F'
                             THEN 1 ELSE 0 END) THEN 1 ELSE 0 END AS br
              FROM orders),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(ar) AS BIGINT) AS a_right,
                     CAST(SUM(br) AS BIGINT) AS b_right,
                     CAST(SUM(CASE WHEN ar = 1 AND br = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS b_cell,
                     CAST(SUM(CASE WHEN ar = 0 AND br = 1
                              THEN 1 ELSE 0 END) AS BIGINT) AS c_cell
              FROM cells)
            SELECT n, b_cell, c_cell,
                   a_right * 1000000 // n AS acc_a_ppm,
                   b_right * 1000000 // n AS acc_b_ppm,
                   CAST(floor(
                     (CAST(abs(b_cell - c_cell) AS DOUBLE) - 1.0)
                     * (CAST(abs(b_cell - c_cell) AS DOUBLE) - 1.0)
                     / CAST(b_cell + c_cell AS DOUBLE)
                     * 1000000) AS BIGINT) AS chi2_micro,
                   CASE WHEN (CAST(abs(b_cell - c_cell) AS DOUBLE) - 1.0)
                        * (CAST(abs(b_cell - c_cell) AS DOUBLE) - 1.0)
                        / CAST(b_cell + c_cell AS DOUBLE)
                        > 3.841458820694124 THEN 1 ELSE 0 END
                     AS significant
            FROM agg
        """,
        "q328_fleiss_kappa": f"""
            WITH votes AS (
              SELECT (CASE WHEN n_chars >= 800 THEN 1 ELSE 0 END
                      + CASE WHEN len({_TOKS}) >= 150 THEN 1 ELSE 0 END
                      + CASE WHEN len(list_distinct({_TOKS})) * 2
                             >= len({_TOKS}) THEN 1 ELSE 0 END) AS n1
              FROM documents),
            per AS (
              SELECT n1, n1 * (n1 - 1) + (3 - n1) * (2 - n1) AS pairnum
              FROM votes),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(n1) AS BIGINT) AS votes1,
                     CAST(SUM(pairnum) AS BIGINT) AS pairsum
              FROM per)
            SELECT n_docs, votes1,
                   CAST(floor(CAST(pairsum AS DOUBLE)
                        / (CAST(n_docs AS DOUBLE) * 6.0)
                        * 1000000) AS BIGINT) AS pbar_micro,
                   CAST(floor(
                     ((CAST(votes1 AS DOUBLE)
                      / (CAST(n_docs AS DOUBLE) * 3.0))
                     * (CAST(votes1 AS DOUBLE)
                        / (CAST(n_docs AS DOUBLE) * 3.0))
                     + (1.0 - CAST(votes1 AS DOUBLE)
                        / (CAST(n_docs AS DOUBLE) * 3.0))
                       * (1.0 - CAST(votes1 AS DOUBLE)
                          / (CAST(n_docs AS DOUBLE) * 3.0)))
                     * 1000000) AS BIGINT) AS pe_micro,
                   CAST(floor(
                     (CAST(pairsum AS DOUBLE)
                      / (CAST(n_docs AS DOUBLE) * 6.0)
                      - ((CAST(votes1 AS DOUBLE)
                          / (CAST(n_docs AS DOUBLE) * 3.0))
                         * (CAST(votes1 AS DOUBLE)
                            / (CAST(n_docs AS DOUBLE) * 3.0))
                         + (1.0 - CAST(votes1 AS DOUBLE)
                            / (CAST(n_docs AS DOUBLE) * 3.0))
                           * (1.0 - CAST(votes1 AS DOUBLE)
                              / (CAST(n_docs AS DOUBLE) * 3.0))))
                     / (1.0 - ((CAST(votes1 AS DOUBLE)
                          / (CAST(n_docs AS DOUBLE) * 3.0))
                         * (CAST(votes1 AS DOUBLE)
                            / (CAST(n_docs AS DOUBLE) * 3.0))
                         + (1.0 - CAST(votes1 AS DOUBLE)
                            / (CAST(n_docs AS DOUBLE) * 3.0))
                           * (1.0 - CAST(votes1 AS DOUBLE)
                              / (CAST(n_docs AS DOUBLE) * 3.0))))
                     * 1000000) AS BIGINT) AS kappa_micro
            FROM agg
        """,
        "q329_log_odds_keywords": f"""
            WITH stc AS MATERIALIZED (
              SELECT source, tok AS token, CAST(COUNT(*) AS BIGINT) AS y
              FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1, 2),
            tok AS (SELECT token, CAST(SUM(y) AS BIGINT) AS yw
                    FROM stc GROUP BY 1),
            srcs AS (SELECT source, CAST(SUM(y) AS BIGINT) AS ns
                     FROM stc GROUP BY 1),
            tot AS (SELECT CAST(SUM(ns) AS BIGINT) AS nn FROM srcs),
            j AS (
              SELECT stc.source, stc.token, stc.y, yw, ns, nn
              FROM stc JOIN tok USING (token)
                   JOIN srcs USING (source), tot
              WHERE stc.y >= 5),
            scored AS (
              SELECT source, token, y,
                     CAST(floor(
                       (ln((CAST(y AS DOUBLE)
                            + 1000.0 * CAST(yw AS DOUBLE)
                              / CAST(nn AS DOUBLE))
                           / (CAST(ns AS DOUBLE) + 1000.0
                              - CAST(y AS DOUBLE)
                              - 1000.0 * CAST(yw AS DOUBLE)
                                / CAST(nn AS DOUBLE)))
                        - ln((CAST(yw - y AS DOUBLE)
                              + 1000.0 * CAST(yw AS DOUBLE)
                                / CAST(nn AS DOUBLE))
                             / (CAST(nn - ns AS DOUBLE) + 1000.0
                                - CAST(yw - y AS DOUBLE)
                                - 1000.0 * CAST(yw AS DOUBLE)
                                  / CAST(nn AS DOUBLE))))
                       / sqrt(1.0 / (CAST(y AS DOUBLE)
                                     + 1000.0 * CAST(yw AS DOUBLE)
                                       / CAST(nn AS DOUBLE))
                              + 1.0 / (CAST(yw - y AS DOUBLE)
                                       + 1000.0 * CAST(yw AS DOUBLE)
                                         / CAST(nn AS DOUBLE)))
                       * 1000000) AS BIGINT) AS z_micro
              FROM j)
            SELECT source, token, y, z_micro, rank FROM (
              SELECT source, token, y, z_micro,
                     CAST(ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY z_micro DESC, token) AS BIGINT) AS rank
              FROM scored)
            WHERE rank <= 3
        """,
        "q330_covariate_balance_smd": """
            WITH pu AS (
              SELECT user_id,
                     CAST(COUNT(*) AS BIGINT) AS c_events,
                     CAST(SUM(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS c_purch,
                     CAST(SUM(CAST(floor(value * 1000000) AS BIGINT))
                          AS BIGINT) AS c_value
              FROM events GROUP BY 1),
            pa AS (
              SELECT ((instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                      * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1))
                      % 2 AS arm,
                     c_events, c_purch, c_value
              FROM pu),
            arms AS (
              SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                     SUM(CAST(c_events AS HUGEINT)) AS s_events,
                     SUM(CAST(c_events AS HUGEINT)
                         * CAST(c_events AS HUGEINT)) AS q_events,
                     SUM(CAST(c_purch AS HUGEINT)) AS s_purch,
                     SUM(CAST(c_purch AS HUGEINT)
                         * CAST(c_purch AS HUGEINT)) AS q_purch,
                     SUM(CAST(c_value AS HUGEINT)) AS s_value,
                     SUM(CAST(c_value AS HUGEINT)
                         * CAST(c_value AS HUGEINT)) AS q_value
              FROM pa GROUP BY 1),
            one AS (
              SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
                     MAX(CASE WHEN arm = 1 THEN n END) AS n1,
                     MAX(CASE WHEN arm = 0 THEN s_events END) AS s_e0,
                     MAX(CASE WHEN arm = 1 THEN s_events END) AS s_e1,
                     MAX(CASE WHEN arm = 0 THEN q_events END) AS q_e0,
                     MAX(CASE WHEN arm = 1 THEN q_events END) AS q_e1,
                     MAX(CASE WHEN arm = 0 THEN s_purch END) AS s_p0,
                     MAX(CASE WHEN arm = 1 THEN s_purch END) AS s_p1,
                     MAX(CASE WHEN arm = 0 THEN q_purch END) AS q_p0,
                     MAX(CASE WHEN arm = 1 THEN q_purch END) AS q_p1,
                     MAX(CASE WHEN arm = 0 THEN s_value END) AS s_v0,
                     MAX(CASE WHEN arm = 1 THEN s_value END) AS s_v1,
                     MAX(CASE WHEN arm = 0 THEN q_value END) AS q_v0,
                     MAX(CASE WHEN arm = 1 THEN q_value END) AS q_v1
              FROM arms),
            stats AS (
              SELECT 'events' AS covariate, n0, n1,
                     CAST(s_e0 AS DOUBLE) AS sa, CAST(q_e0 AS DOUBLE) AS qa,
                     CAST(s_e1 AS DOUBLE) AS sb, CAST(q_e1 AS DOUBLE) AS qb
              FROM one
              UNION ALL
              SELECT 'purch', n0, n1,
                     CAST(s_p0 AS DOUBLE), CAST(q_p0 AS DOUBLE),
                     CAST(s_p1 AS DOUBLE), CAST(q_p1 AS DOUBLE)
              FROM one
              UNION ALL
              SELECT 'value', n0, n1,
                     CAST(s_v0 AS DOUBLE), CAST(q_v0 AS DOUBLE),
                     CAST(s_v1 AS DOUBLE), CAST(q_v1 AS DOUBLE)
              FROM one),
            calc AS (
              SELECT covariate, n0 AS n_a, n1 AS n_b,
                     sa / CAST(n0 AS DOUBLE) AS ma,
                     sb / CAST(n1 AS DOUBLE) AS mb,
                     (qa - sa * sa / CAST(n0 AS DOUBLE))
                       / (CAST(n0 AS DOUBLE) - 1.0) AS va,
                     (qb - sb * sb / CAST(n1 AS DOUBLE))
                       / (CAST(n1 AS DOUBLE) - 1.0) AS vb
              FROM stats)
            SELECT covariate, n_a, n_b,
                   CAST(floor(ma * 1000000) AS BIGINT) AS mean_a_micro,
                   CAST(floor(mb * 1000000) AS BIGINT) AS mean_b_micro,
                   CAST(floor((ma - mb) / sqrt((va + vb) / 2.0)
                        * 1000000) AS BIGINT) AS smd_micro,
                   CASE WHEN abs((ma - mb) / sqrt((va + vb) / 2.0)) > 0.1
                        THEN 1 ELSE 0 END AS imbalanced
            FROM calc
        """,
        "q331_ips_offpolicy": """
            WITH t AS (
              SELECT CASE WHEN event_type =
                          (CASE WHEN value > 50.0
                           THEN 'click' ELSE 'view' END)
                     THEN 1 ELSE 0 END AS m,
                     25200 // (((instr('0123456789abcdef',
                        substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1)
                      * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1))
                      % 9 + 1) AS w,
                     CAST(floor(value * 1000000) AS BIGINT) AS r
              FROM events),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     SUM(CAST(m * w AS HUGEINT)) AS sw,
                     SUM(CAST(m * w * r AS HUGEINT)) AS swr
              FROM t)
            SELECT n,
                   CAST(sw AS BIGINT) AS sum_w_scaled,
                   CAST(floor(CAST(swr AS DOUBLE)
                        / (CAST(n AS DOUBLE) * 25200.0)) AS BIGINT)
                     AS ips_value_micro,
                   CAST(floor(CAST(swr AS DOUBLE) / CAST(sw AS DOUBLE))
                        AS BIGINT) AS snips_value_micro,
                   CAST(floor(CAST(sw AS DOUBLE)
                        / (CAST(n AS DOUBLE) * 25200.0) * 1000000)
                        AS BIGINT) AS eff_sample_ppm
            FROM agg
        """,
        "q332_info_gain_screening": """
            WITH base AS MATERIALIZED (
              SELECT c.c_mktsegment, o.o_orderpriority,
                     CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END
                       AS bad
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
            lv AS (
              SELECT 'c_mktsegment' AS feature, c_mktsegment AS level,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(bad) AS BIGINT) AS n_bad
              FROM base GROUP BY 2
              UNION ALL
              SELECT 'o_orderpriority', o_orderpriority,
                     CAST(COUNT(*) AS BIGINT), CAST(SUM(bad) AS BIGINT)
              FROM base GROUP BY 2),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt,
                           CAST(SUM(bad) AS BIGINT) AS bt FROM base),
            lw AS (
              SELECT feature,
                     CAST(floor(
                       CAST(n AS DOUBLE) / CAST(nt AS DOUBLE)
                       * (-(CASE WHEN CAST(n_bad AS DOUBLE)
                                      / CAST(n AS DOUBLE) > 0.0
                                 AND CAST(n_bad AS DOUBLE)
                                      / CAST(n AS DOUBLE) < 1.0
                            THEN (CAST(n_bad AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                                 * ln(CAST(n_bad AS DOUBLE)
                                      / CAST(n AS DOUBLE))
                            ELSE 0.0 END
                          + CASE WHEN 1.0 - CAST(n_bad AS DOUBLE)
                                      / CAST(n AS DOUBLE) > 0.0
                                 AND 1.0 - CAST(n_bad AS DOUBLE)
                                      / CAST(n AS DOUBLE) < 1.0
                            THEN (1.0 - CAST(n_bad AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                                 * ln(1.0 - CAST(n_bad AS DOUBLE)
                                      / CAST(n AS DOUBLE))
                            ELSE 0.0 END))
                       * 1000000000) AS BIGINT) AS w_nano,
                     nt, bt
              FROM lv, tot),
            per AS (
              SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_levels,
                     CAST(SUM(w_nano) AS BIGINT) AS cond_entropy_nano,
                     MAX(nt) AS nt, MAX(bt) AS bt
              FROM lw GROUP BY 1)
            SELECT feature, n_levels,
                   CAST(floor(
                     (-(CASE WHEN CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE) > 0.0
                             AND CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE) < 1.0
                        THEN (CAST(bt AS DOUBLE) / CAST(nt AS DOUBLE))
                             * ln(CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE))
                        ELSE 0.0 END
                      + CASE WHEN 1.0 - CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE) > 0.0
                             AND 1.0 - CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE) < 1.0
                        THEN (1.0 - CAST(bt AS DOUBLE)
                              / CAST(nt AS DOUBLE))
                             * ln(1.0 - CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE))
                        ELSE 0.0 END))
                     * 1000000000) AS BIGINT) AS entropy_nano,
                   cond_entropy_nano,
                   CAST(floor(
                     (-(CASE WHEN CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE) > 0.0
                             AND CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE) < 1.0
                        THEN (CAST(bt AS DOUBLE) / CAST(nt AS DOUBLE))
                             * ln(CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE))
                        ELSE 0.0 END
                      + CASE WHEN 1.0 - CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE) > 0.0
                             AND 1.0 - CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE) < 1.0
                        THEN (1.0 - CAST(bt AS DOUBLE)
                              / CAST(nt AS DOUBLE))
                             * ln(1.0 - CAST(bt AS DOUBLE)
                                  / CAST(nt AS DOUBLE))
                        ELSE 0.0 END))
                     * 1000000000) AS BIGINT) - cond_entropy_nano
                     AS info_gain_nano
            FROM per
        """,
        "q333_brier_decomposition": """
            WITH b AS (
              SELECT ((instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                        - 1) * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))
                        - 1)) % 10 AS k,
                     CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
              FROM orders),
            bins AS (
              SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k,
                     CAST(SUM(y) AS BIGINT) AS s_k
              FROM b GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_k) AS BIGINT) AS n,
                           CAST(SUM(s_k) AS BIGINT) AS s FROM bins),
            terms AS (
              SELECT n, s,
                     CAST(floor(
                       (CAST(n_k AS DOUBLE)
                          * ((CAST(k AS DOUBLE) + 0.5) / 10.0)
                          * ((CAST(k AS DOUBLE) + 0.5) / 10.0)
                        - 2.0 * ((CAST(k AS DOUBLE) + 0.5) / 10.0)
                          * CAST(s_k AS DOUBLE)
                        + CAST(s_k AS DOUBLE))
                       * 1000000000) AS BIGINT) AS bt,
                     CAST(floor(
                       CAST(n_k AS DOUBLE)
                       * ((CAST(k AS DOUBLE) + 0.5) / 10.0
                          - CAST(s_k AS DOUBLE) / CAST(n_k AS DOUBLE))
                       * ((CAST(k AS DOUBLE) + 0.5) / 10.0
                          - CAST(s_k AS DOUBLE) / CAST(n_k AS DOUBLE))
                       * 1000000000) AS BIGINT) AS rt,
                     CAST(floor(
                       CAST(n_k AS DOUBLE)
                       * (CAST(s_k AS DOUBLE) / CAST(n_k AS DOUBLE)
                          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(s_k AS DOUBLE) / CAST(n_k AS DOUBLE)
                          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       * 1000000000) AS BIGINT) AS st
              FROM bins, tot)
            SELECT n, s,
                   CAST(SUM(bt) AS BIGINT) // n AS brier_nano,
                   CAST(SUM(rt) AS BIGINT) // n AS reliability_nano,
                   CAST(SUM(st) AS BIGINT) // n AS resolution_nano,
                   CAST(floor(
                     CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                     * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                     * 1000000000) AS BIGINT) AS uncertainty_nano
            FROM terms GROUP BY 1, 2
        """,
        "q334_conformal_calibration": """
            WITH sc AS (
              SELECT ((instr('0123456789abcdef',
                        substr(md5(CAST(event_id AS VARCHAR)), 1, 1))
                        - 1) * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(event_id AS VARCHAR)), 2, 1))
                        - 1)) % 2 AS coin,
                     CAST(floor(abs(value - 50.0) * 1000000) AS BIGINT)
                       AS r
              FROM events),
            cal AS (SELECT r FROM sc WHERE coin = 0),
            kk AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
                     CAST(ceil(0.9 * CAST(COUNT(*) + 1 AS DOUBLE))
                          AS BIGINT) AS k
              FROM cal),
            ranked AS (
              SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn FROM cal),
            qh AS (
              SELECT n_cal, k, r AS q_micro
              FROM ranked, kk WHERE rn = k)
            SELECT n_cal, k, q_micro,
                   CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN r <= q_micro THEN 1 ELSE 0 END)
                        AS BIGINT) * 1000000
                     // CAST(COUNT(*) AS BIGINT) AS coverage_ppm
            FROM (SELECT r FROM sc WHERE coin = 1), qh
            GROUP BY 1, 2, 3
        """,
        "q335_map_at_k": """
            WITH e AS (
              SELECT vec_id, label,
                     list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings),
            q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
                  FROM e WHERE vec_id < 5),
            scored AS (
              SELECT query_id, qlabel, e.vec_id AS neighbor_id,
                     CASE WHEN e.label = qlabel THEN 1 ELSE 0 END AS rel,
                     list_reduce(list_transform(list_zip(qv, v),
                                                x -> x[1] * x[2]),
                                 (a, b) -> a + b)
                       / (sqrt(list_reduce(list_transform(qv,
                                                          x -> x * x),
                                           (a, b) -> a + b))
                          * sqrt(list_reduce(list_transform(v,
                                                            x -> x * x),
                                             (a, b) -> a + b))) AS sim
              FROM e, q WHERE e.vec_id != query_id),
            ranked AS (
              SELECT query_id, qlabel, rel,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rank
              FROM scored),
            top AS (
              SELECT query_id, qlabel, rel, rank,
                     SUM(rel) OVER (PARTITION BY query_id
                       ORDER BY rank) AS cum
              FROM ranked WHERE rank <= 10),
            terms AS (
              SELECT query_id, qlabel, rel,
                     CASE WHEN rel = 1
                          THEN CAST(floor(CAST(cum AS DOUBLE) / rank
                                    * 1000000000) AS BIGINT)
                          ELSE 0 END AS term
              FROM top),
            perq AS (
              SELECT query_id, qlabel,
                     CAST(SUM(rel) AS BIGINT) AS hits10,
                     CAST(SUM(term) AS BIGINT) AS ap_num_nano
              FROM terms GROUP BY 1, 2),
            rc AS (SELECT label AS qlabel,
                          CAST(COUNT(*) AS BIGINT) AS n_label
                   FROM embeddings GROUP BY 1)
            SELECT query_id, hits10, n_label - 1 AS r_total,
                   ap_num_nano // least(n_label - 1, 10) AS ap_nano
            FROM perq JOIN rc USING (qlabel)
        """,
        "q336_burrows_delta": f"""
            WITH stc AS MATERIALIZED (
              SELECT source, tok AS token, CAST(COUNT(*) AS BIGINT) AS y
              FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1, 2),
            top AS (
              SELECT token FROM (
                SELECT token, CAST(SUM(y) AS BIGINT) AS ct
                FROM stc GROUP BY 1)
              ORDER BY ct DESC, token LIMIT 20),
            srcs AS (SELECT source, CAST(SUM(y) AS BIGINT) AS ns
                     FROM stc GROUP BY 1),
            f AS MATERIALIZED (
              SELECT s.source, t.token,
                     COALESCE(stc.y, 0) * 1000000 // s.ns AS f_ppm
              FROM srcs s CROSS JOIN top t
              LEFT JOIN stc ON stc.source = s.source
                           AND stc.token = t.token),
            dist AS (
              SELECT token, CAST(COUNT(*) AS BIGINT) AS ns_count,
                     CAST(SUM(f_ppm) AS BIGINT) AS sf,
                     CAST(SUM(f_ppm * f_ppm) AS BIGINT) AS qf
              FROM f GROUP BY 1),
            z AS (
              SELECT source, token,
                     (CAST(f_ppm AS DOUBLE)
                      - CAST(sf AS DOUBLE) / CAST(ns_count AS DOUBLE))
                     / sqrt((CAST(qf AS DOUBLE)
                             - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE)
                               / CAST(ns_count AS DOUBLE))
                            / (CAST(ns_count AS DOUBLE) - 1.0)) AS z
              FROM f JOIN dist USING (token)),
            pairs AS (
              SELECT a.source AS src_a, b.source AS src_b,
                     CAST(floor(abs(a.z - b.z) * 1000000000) AS BIGINT)
                       AS dz
              FROM z a JOIN z b USING (token)
              WHERE a.source < b.source)
            SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(dz) AS BIGINT) // COUNT(*) AS delta_nano
            FROM pairs GROUP BY 1, 2
        """,
        "q337_cochran_armitage": """
            WITH agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS r,
                     CAST(SUM(CAST(substr(o_orderpriority, 1, 1)
                                   AS BIGINT)
                              * CASE WHEN o_orderstatus = 'F'
                                THEN 1 ELSE 0 END) AS BIGINT) AS sty,
                     CAST(SUM(CAST(substr(o_orderpriority, 1, 1)
                                   AS BIGINT)) AS BIGINT) AS st,
                     CAST(SUM(CAST(substr(o_orderpriority, 1, 1)
                                   AS BIGINT)
                              * CAST(substr(o_orderpriority, 1, 1)
                                     AS BIGINT)) AS BIGINT) AS stt
              FROM orders)
            SELECT n, r,
                   CAST(floor((CAST(sty AS DOUBLE)
                        - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                          * CAST(st AS DOUBLE)) * 1000000) AS BIGINT)
                     AS t_stat_micro,
                   CAST(floor((CAST(sty AS DOUBLE)
                        - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                          * CAST(st AS DOUBLE))
                        / sqrt(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                               * (1.0 - CAST(r AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                               * (CAST(stt AS DOUBLE)
                                  - CAST(st AS DOUBLE)
                                    * CAST(st AS DOUBLE)
                                    / CAST(n AS DOUBLE)))
                        * 1000000) AS BIGINT) AS z_micro,
                   CASE WHEN abs((CAST(sty AS DOUBLE)
                        - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                          * CAST(st AS DOUBLE))
                        / sqrt(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                               * (1.0 - CAST(r AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                               * (CAST(stt AS DOUBLE)
                                  - CAST(st AS DOUBLE)
                                    * CAST(st AS DOUBLE)
                                    / CAST(n AS DOUBLE))))
                        > 1.959963984540054 THEN 1 ELSE 0 END
                     AS trend_significant
            FROM agg
        """,
        "q338_propensity_strata_ate": """
            WITH cells AS (
              SELECT (((instr('0123456789abcdef',
                         substr(md5(CAST(o_orderkey AS VARCHAR)), 3, 1))
                         - 1) * 16
                       + (instr('0123456789abcdef',
                         substr(md5(CAST(o_orderkey AS VARCHAR)), 4, 1))
                         - 1)) % 100) // 20 AS stratum,
                     ((instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                        - 1) * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))
                        - 1)) % 2 AS t,
                     CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
              FROM orders),
            cagg AS (
              SELECT stratum, t, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(y) AS BIGINT) AS s
              FROM cells GROUP BY 1, 2),
            strat AS (
              SELECT stratum, CAST(SUM(n) AS BIGINT) AS n_k,
                     MAX(CASE WHEN t = 1 THEN n END) AS n1,
                     MAX(CASE WHEN t = 1 THEN s END) AS s1,
                     MAX(CASE WHEN t = 0 THEN n END) AS n0,
                     MAX(CASE WHEN t = 0 THEN s END) AS s0
              FROM cagg GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_k) AS BIGINT) AS n_total
                    FROM strat),
            per AS (
              SELECT stratum, n_k,
                     CAST(floor(
                       (CAST(n_k AS DOUBLE) / CAST(n_total AS DOUBLE))
                       * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                          - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                       * 1000000000) AS BIGINT) AS term_nano
              FROM strat, tot)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                   CAST(SUM(n_k) AS BIGINT) AS n_units,
                   CAST(SUM(term_nano) AS BIGINT) AS ate_nano
            FROM per
        """,
        "q339_jackknife_ratio_se": """
            WITH buckets AS (
              SELECT ((instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                        - 1) * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))
                        - 1)) % 10 AS g,
                     CAST(COUNT(*) AS BIGINT) AS c_i,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS s_i
              FROM orders GROUP BY 1),
            tot AS (SELECT CAST(SUM(c_i) AS BIGINT) AS c,
                           CAST(SUM(s_i) AS BIGINT) AS s FROM buckets),
            loo AS (
              SELECT g,
                     CAST(floor(CAST(s - s_i AS DOUBLE)
                          / CAST(c - c_i AS DOUBLE) * 1000000)
                          AS BIGINT) AS theta_micro,
                     c, s
              FROM buckets, tot),
            agg AS (
              SELECT c, s, CAST(COUNT(*) AS BIGINT) AS n_groups,
                     CAST(SUM(theta_micro) AS BIGINT) AS sum_theta,
                     SUM(CAST(theta_micro AS HUGEINT)
                         * CAST(theta_micro AS HUGEINT)) AS sum_theta_sq
              FROM loo GROUP BY 1, 2)
            SELECT n_groups,
                   CAST(floor(CAST(s AS DOUBLE) / CAST(c AS DOUBLE)
                        * 1000000) AS BIGINT) AS theta_micro_full,
                   sum_theta // n_groups AS jk_mean_micro,
                   CAST(floor(sqrt(
                     (CAST(n_groups AS DOUBLE) - 1.0)
                     / CAST(n_groups AS DOUBLE)
                     * (CAST(sum_theta_sq AS DOUBLE)
                        - CAST(sum_theta AS DOUBLE)
                          * CAST(sum_theta AS DOUBLE)
                          / CAST(n_groups AS DOUBLE))))
                     AS BIGINT) AS jk_se_micro
            FROM agg
        """,
        "q340_shapley_attribution": """
            WITH pu AS (
              SELECT user_id,
                     list_sort(list(DISTINCT event_type)
                               FILTER (WHERE event_type != 'purchase'))
                       AS touchset,
                     MAX(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS converted
              FROM events GROUP BY 1),
            sets AS (
              SELECT touchset, CAST(len(touchset) AS BIGINT) AS set_size,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(converted) AS BIGINT) AS n_conv
              FROM pu WHERE len(touchset) > 0
              GROUP BY 1, 2),
            credit AS (
              SELECT unnest(touchset) AS channel, set_size, n, n_conv,
                     CAST(CAST(n_conv AS HUGEINT) * 1000000000
                          // (CAST(n AS HUGEINT) * set_size) AS BIGINT)
                       AS credit_nano
              FROM sets)
            SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_sets,
                   CAST(SUM(n) AS BIGINT) AS n_users,
                   CAST(SUM(n_conv) AS BIGINT) AS n_conversions,
                   CAST(SUM(credit_nano) AS BIGINT) AS shapley_nano
            FROM credit GROUP BY 1
        """,
        "q341_logrank_test": """
            WITH pu AS (
              SELECT user_id,
                     ((instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                      * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1))
                      % 2 AS arm,
                     MIN(epoch_us(ts)) AS t0,
                     MIN(CASE WHEN event_type = 'error'
                         THEN epoch_us(ts) END) AS td,
                     MAX(epoch_us(ts)) AS tmax
              FROM events GROUP BY 1, 2),
            dur AS (
              SELECT arm,
                     CASE WHEN td IS NOT NULL
                          THEN (td - t0) // 86400000000
                          ELSE (tmax - t0) // 86400000000 END AS day,
                     CASE WHEN td IS NOT NULL THEN 1 ELSE 0 END
                       AS observed
              FROM pu),
            byarm AS (
              SELECT arm, day, CAST(SUM(observed) AS BIGINT) AS d,
                     CAST(COUNT(*) AS BIGINT) AS leaving
              FROM dur GROUP BY 1, 2),
            totals AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm
                       FROM dur GROUP BY 1),
            grid AS (SELECT DISTINCT day FROM byarm),
            filled AS (
              SELECT t.arm, g.day, t.n_arm,
                     COALESCE(b.d, 0) AS d,
                     COALESCE(b.leaving, 0) AS leaving
              FROM grid g CROSS JOIN totals t
              LEFT JOIN byarm b ON b.arm = t.arm AND b.day = g.day),
            risk AS (
              SELECT arm, day, d,
                     n_arm - COALESCE(SUM(leaving) OVER (
                       PARTITION BY arm ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS at_risk
              FROM filled),
            byday AS (
              SELECT day,
                     CAST(SUM(CASE WHEN arm = 1 THEN d END) AS BIGINT)
                       AS d1,
                     CAST(SUM(CASE WHEN arm = 1 THEN at_risk END)
                          AS BIGINT) AS r1,
                     CAST(SUM(d) AS BIGINT) AS dt,
                     CAST(SUM(at_risk) AS BIGINT) AS nt
              FROM risk GROUP BY 1),
            terms AS (
              SELECT COALESCE(d1, 0) AS o1,
                     CAST(floor(CAST(dt AS DOUBLE)
                          * CAST(COALESCE(r1, 0) AS DOUBLE)
                          / CAST(nt AS DOUBLE) * 1000000000) AS BIGINT)
                       AS e1_nano,
                     CAST(floor(CAST(dt AS DOUBLE)
                          * (CAST(COALESCE(r1, 0) AS DOUBLE)
                             / CAST(nt AS DOUBLE))
                          * (1.0 - CAST(COALESCE(r1, 0) AS DOUBLE)
                             / CAST(nt AS DOUBLE))
                          * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
                          / (CAST(nt AS DOUBLE) - 1.0)
                          * 1000000000) AS BIGINT) AS v_nano
              FROM byday WHERE dt > 0 AND nt > 1),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_death_days,
                     CAST(SUM(o1) AS BIGINT) AS o1,
                     CAST(SUM(e1_nano) AS BIGINT) AS e1_nano,
                     CAST(SUM(v_nano) AS BIGINT) AS v_nano
              FROM terms)
            SELECT n_death_days, o1,
                   e1_nano // 1000 AS e1_micro,
                   CAST(floor(
                     ((CAST(o1 AS DOUBLE) * 1000000000.0
                       - CAST(e1_nano AS DOUBLE)) / 1000000000.0)
                     / sqrt(CAST(v_nano AS DOUBLE) / 1000000000.0)
                     * 1000000) AS BIGINT) AS z_micro,
                   CASE WHEN abs(
                     ((CAST(o1 AS DOUBLE) * 1000000000.0
                       - CAST(e1_nano AS DOUBLE)) / 1000000000.0)
                     / sqrt(CAST(v_nano AS DOUBLE) / 1000000000.0))
                     > 1.959963984540054 THEN 1 ELSE 0 END
                     AS significant
            FROM agg
        """,
        "q342_chatterjee_xi": """
            WITH r AS (
              SELECT event_type, event_id, epoch_us(ts) AS us,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY value, event_id) AS r
              FROM events),
            l AS (
              SELECT event_type, r,
                     LAG(r) OVER (PARTITION BY event_type
                       ORDER BY us, event_id) AS r_prev
              FROM r),
            per AS (
              SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(abs(r - r_prev)) AS BIGINT) AS jump_sum
              FROM l GROUP BY 1)
            SELECT event_type, n, jump_sum,
                   CAST(floor((1.0 - 3.0 * CAST(jump_sum AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0))
                        * 1000000) AS BIGINT) AS xi_micro
            FROM per
        """,
        "q343_mantel_haenszel": """
            WITH cells AS (
              SELECT r.r_name,
                     ((instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                        - 1) * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))
                        - 1)) % 2 AS e,
                     CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                   JOIN nation n ON c.c_nationkey = n.n_nationkey
                   JOIN region r ON n.n_regionkey = r.r_regionkey),
            ag AS (
              SELECT r_name,
                     CAST(SUM(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0
                              END) AS BIGINT) AS a,
                     CAST(SUM(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0
                              END) AS BIGINT) AS b,
                     CAST(SUM(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0
                              END) AS BIGINT) AS c,
                     CAST(SUM(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0
                              END) AS BIGINT) AS d
              FROM cells GROUP BY 1),
            terms AS (
              SELECT CAST(floor(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                          / CAST(a + b + c + d AS DOUBLE)
                          * 1000000000) AS BIGINT) AS num_nano,
                     CAST(floor(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                          / CAST(a + b + c + d AS DOUBLE)
                          * 1000000000) AS BIGINT) AS den_nano
              FROM ag),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                     CAST(SUM(num_nano) AS BIGINT) AS num_nano,
                     CAST(SUM(den_nano) AS BIGINT) AS den_nano
              FROM terms)
            SELECT n_strata, num_nano, den_nano,
                   CAST(floor(CAST(num_nano AS DOUBLE)
                        / CAST(den_nano AS DOUBLE) * 1000000) AS BIGINT)
                     AS or_micro,
                   CAST(floor(ln(CAST(num_nano AS DOUBLE)
                        / CAST(den_nano AS DOUBLE)) * 1000000)
                        AS BIGINT) AS ln_or_micro
            FROM agg
        """,
        "q344_theil_decomposition": """
            WITH base AS MATERIALIZED (
              SELECT c.c_mktsegment,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
            seg AS (
              SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_g,
                     CAST(SUM(cents) AS BIGINT) AS s_g
              FROM base GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                           CAST(SUM(s_g) AS BIGINT) AS s FROM seg),
            rws AS (
              SELECT b.c_mktsegment, seg.n_g, seg.s_g,
                     CAST(floor(
                       (CAST(b.cents AS DOUBLE)
                        / (CAST(seg.s_g AS DOUBLE)
                           / CAST(seg.n_g AS DOUBLE)))
                       * ln(CAST(b.cents AS DOUBLE)
                            / (CAST(seg.s_g AS DOUBLE)
                               / CAST(seg.n_g AS DOUBLE)))
                       * 1000000000) AS BIGINT) AS t_nano
              FROM base b JOIN seg USING (c_mktsegment)),
            rg AS (
              SELECT c_mktsegment, n_g, s_g,
                     CAST(SUM(t_nano) AS BIGINT) AS tg_sum_nano
              FROM rws GROUP BY 1, 2, 3)
            SELECT c_mktsegment, n_g,
                   CAST(floor(CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE)
                        * 1000000) AS BIGINT) AS share_ppm,
                   CAST(floor((CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))
                        / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        * 1000000) AS BIGINT) AS mean_ratio_ppm,
                   CAST(floor(CAST(tg_sum_nano AS DOUBLE)
                        / CAST(n_g AS DOUBLE)) AS BIGINT)
                     AS theil_within_nano,
                   CAST(floor(CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE)
                        * ((CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))
                           / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                        * ln((CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))
                             / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                        * 1000000000) AS BIGINT) AS between_term_nano,
                   CAST(floor(CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE)
                        * ((CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))
                           / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                        * (CAST(tg_sum_nano AS DOUBLE)
                           / CAST(n_g AS DOUBLE))) AS BIGINT)
                     AS within_term_nano
            FROM rg, tot
        """,
        "q345_minhash_error_audit": f"""
            WITH sig4 AS MATERIALIZED ({_SIG_SQL}),
            sig16 AS MATERIALIZED (
              SELECT doc_id AS id, band,
                     MIN(md5(band::VARCHAR || ':' || shingle)) AS minhash
              FROM (
                SELECT doc_id, unnest(shingles) AS shingle FROM (
                  SELECT doc_id,
                         CASE WHEN len(toks) >= 3
                              THEN list_transform(range(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i+1]
                                        || ' ' || toks[i+2])
                              ELSE [] END AS shingles
                  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents))),
                (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11,
                                12, 13, 14, 15]) AS band)
              GROUP BY doc_id, band),
            cands AS MATERIALIZED (
              SELECT l.id AS a, r.id AS b
              FROM sig4 l JOIN sig4 r
                ON l.band = r.band AND l.minhash = r.minhash
              WHERE l.id < r.id
              GROUP BY 1, 2),
            agr AS (
              SELECT c.a, c.b,
                     CAST(SUM(CASE WHEN sa.minhash = sb.minhash
                              THEN 1 ELSE 0 END) AS BIGINT) AS agree
              FROM cands c
              JOIN sig16 sa ON sa.id = c.a
              JOIN sig16 sb ON sb.id = c.b AND sb.band = sa.band
              GROUP BY 1, 2),
            sh AS (
              SELECT doc_id, list_distinct(shingles) AS ss
              FROM (
                SELECT doc_id,
                       CASE WHEN len(toks) >= 3
                            THEN list_transform(range(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i+1]
                                      || ' ' || toks[i+2])
                            ELSE [] END AS shingles
                FROM (SELECT doc_id, {_TOKS} AS toks FROM documents))
              WHERE len(shingles) > 0),
            exact AS (
              SELECT agree,
                     CAST(len(list_intersect(sa.ss, sb.ss)) AS BIGINT)
                       * 1000000
                       // (CAST(len(sa.ss) + len(sb.ss) AS BIGINT)
                           - CAST(len(list_intersect(sa.ss, sb.ss))
                                  AS BIGINT)) AS j_ppm
              FROM agr
              JOIN sh sa ON sa.doc_id = agr.a
              JOIN sh sb ON sb.doc_id = agr.b)
            SELECT agree, agree * 62500 AS est_ppm,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(j_ppm) AS BIGINT) // COUNT(*)
                     AS mean_exact_ppm,
                   CAST(SUM(abs(agree * 62500 - j_ppm)) AS BIGINT)
                     // COUNT(*) AS mae_ppm
            FROM exact GROUP BY 1, 2
        """,
        "q346_fs_em_step": """
            WITH cust AS MATERIALIZED (
              SELECT c_custkey, c_mktsegment, c_nationkey,
                     CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents,
                     c_custkey % 10 AS lastd
              FROM customer),
            pats AS (
              SELECT CASE WHEN a.c_nationkey = b.c_nationkey
                     THEN 1 ELSE 0 END AS a1,
                     CASE WHEN abs(a.bal_cents - b.bal_cents) < 50000
                     THEN 1 ELSE 0 END AS a2,
                     CASE WHEN a.lastd = b.lastd THEN 1 ELSE 0 END AS a3,
                     CAST(COUNT(*) AS BIGINT) AS n_g
              FROM cust a JOIN cust b
                ON a.c_mktsegment = b.c_mktsegment
              WHERE a.c_custkey < b.c_custkey
              GROUP BY 1, 2, 3),
            g AS (
              SELECT a1, a2, a3, n_g,
                     CAST(floor(
                       (0.1 * (CASE WHEN a1 = 1 THEN 0.9
                               ELSE 1.0 - 0.9 END)
                            * (CASE WHEN a2 = 1 THEN 0.9
                               ELSE 1.0 - 0.9 END)
                            * (CASE WHEN a3 = 1 THEN 0.9
                               ELSE 1.0 - 0.9 END))
                       / ((0.1 * (CASE WHEN a1 = 1 THEN 0.9
                                  ELSE 1.0 - 0.9 END)
                               * (CASE WHEN a2 = 1 THEN 0.9
                                  ELSE 1.0 - 0.9 END)
                               * (CASE WHEN a3 = 1 THEN 0.9
                                  ELSE 1.0 - 0.9 END))
                          + (0.9 * (CASE WHEN a1 = 1 THEN 0.1
                                    ELSE 1.0 - 0.1 END)
                                 * (CASE WHEN a2 = 1 THEN 0.1
                                    ELSE 1.0 - 0.1 END)
                                 * (CASE WHEN a3 = 1 THEN 0.1
                                    ELSE 1.0 - 0.1 END)))
                       * CAST(n_g AS DOUBLE) * 1000000000)
                       AS BIGINT) AS gn_nano,
                     CAST(floor(
                       (1.0 - (0.1 * (CASE WHEN a1 = 1 THEN 0.9
                                      ELSE 1.0 - 0.9 END)
                                   * (CASE WHEN a2 = 1 THEN 0.9
                                      ELSE 1.0 - 0.9 END)
                                   * (CASE WHEN a3 = 1 THEN 0.9
                                      ELSE 1.0 - 0.9 END))
                          / ((0.1 * (CASE WHEN a1 = 1 THEN 0.9
                                     ELSE 1.0 - 0.9 END)
                                  * (CASE WHEN a2 = 1 THEN 0.9
                                     ELSE 1.0 - 0.9 END)
                                  * (CASE WHEN a3 = 1 THEN 0.9
                                     ELSE 1.0 - 0.9 END))
                             + (0.9 * (CASE WHEN a1 = 1 THEN 0.1
                                       ELSE 1.0 - 0.1 END)
                                    * (CASE WHEN a2 = 1 THEN 0.1
                                       ELSE 1.0 - 0.1 END)
                                    * (CASE WHEN a3 = 1 THEN 0.1
                                       ELSE 1.0 - 0.1 END))))
                       * CAST(n_g AS DOUBLE) * 1000000000)
                       AS BIGINT) AS vn_nano
              FROM pats),
            agg AS (
              SELECT CAST(SUM(n_g) AS BIGINT) AS n_pairs,
                     CAST(SUM(gn_nano) AS BIGINT) AS gn,
                     CAST(SUM(vn_nano) AS BIGINT) AS vn,
                     CAST(SUM(CASE WHEN a1 = 1 THEN gn_nano ELSE 0 END)
                          AS BIGINT) AS gn_a1,
                     CAST(SUM(CASE WHEN a1 = 1 THEN vn_nano ELSE 0 END)
                          AS BIGINT) AS vn_a1,
                     CAST(SUM(CASE WHEN a2 = 1 THEN gn_nano ELSE 0 END)
                          AS BIGINT) AS gn_a2,
                     CAST(SUM(CASE WHEN a2 = 1 THEN vn_nano ELSE 0 END)
                          AS BIGINT) AS vn_a2,
                     CAST(SUM(CASE WHEN a3 = 1 THEN gn_nano ELSE 0 END)
                          AS BIGINT) AS gn_a3,
                     CAST(SUM(CASE WHEN a3 = 1 THEN vn_nano ELSE 0 END)
                          AS BIGINT) AS vn_a3
              FROM g)
            SELECT 'a1' AS field, n_pairs,
                   CAST(floor(CAST(gn_a1 AS DOUBLE) / CAST(gn AS DOUBLE)
                        * 1000000) AS BIGINT) AS m_ppm,
                   CAST(floor(CAST(vn_a1 AS DOUBLE) / CAST(vn AS DOUBLE)
                        * 1000000) AS BIGINT) AS u_ppm,
                   CAST(floor(CAST(gn AS DOUBLE)
                        / (CAST(n_pairs AS DOUBLE) * 1000000000.0)
                        * 1000000) AS BIGINT) AS p_match_ppm
            FROM agg
            UNION ALL
            SELECT 'a2', n_pairs,
                   CAST(floor(CAST(gn_a2 AS DOUBLE) / CAST(gn AS DOUBLE)
                        * 1000000) AS BIGINT),
                   CAST(floor(CAST(vn_a2 AS DOUBLE) / CAST(vn AS DOUBLE)
                        * 1000000) AS BIGINT),
                   CAST(floor(CAST(gn AS DOUBLE)
                        / (CAST(n_pairs AS DOUBLE) * 1000000000.0)
                        * 1000000) AS BIGINT)
            FROM agg
            UNION ALL
            SELECT 'a3', n_pairs,
                   CAST(floor(CAST(gn_a3 AS DOUBLE) / CAST(gn AS DOUBLE)
                        * 1000000) AS BIGINT),
                   CAST(floor(CAST(vn_a3 AS DOUBLE) / CAST(vn AS DOUBLE)
                        * 1000000) AS BIGINT),
                   CAST(floor(CAST(gn AS DOUBLE)
                        / (CAST(n_pairs AS DOUBLE) * 1000000000.0)
                        * 1000000) AS BIGINT)
            FROM agg
        """,
        "q347_consistent_hash_moves": f"""
            WITH vn AS (
              SELECT n.node, v.vnode,
                     md5('n' || CAST(n.node AS VARCHAR) || ':v'
                         || CAST(v.vnode AS VARCHAR)) AS h
              FROM (SELECT unnest(range(0, 9)) AS node) n,
                   (SELECT unnest(range(0, 16)) AS vnode) v),
            enc AS (
              SELECT node,
                     (({_hex4('h', 1)} * 65536 + {_hex4('h', 5)}) * 16
                      + node) AS e
              FROM vn),
            r8 AS (SELECT list_sort(list(e)) AS ring8 FROM enc
                   WHERE node < 8),
            r9 AS (SELECT list_sort(list(e)) AS ring9 FROM enc),
            keys AS (
              SELECT ({_hex4("md5(CAST(o_orderkey AS VARCHAR))", 1)}
                      * 65536
                      + {_hex4("md5(CAST(o_orderkey AS VARCHAR))", 5)})
                     * 16 AS pos
              FROM orders),
            asg AS (
              SELECT (CASE WHEN len(list_filter(ring8, x -> x >= pos))
                           > 0
                      THEN list_min(list_filter(ring8, x -> x >= pos))
                      ELSE list_min(ring8) END) % 16 AS from_node,
                     (CASE WHEN len(list_filter(ring9, x -> x >= pos))
                           > 0
                      THEN list_min(list_filter(ring9, x -> x >= pos))
                      ELSE list_min(ring9) END) % 16 AS to_node
              FROM keys, r8, r9)
            SELECT from_node, to_node, CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM asg GROUP BY 1, 2
        """,
        "q348_ucb1_arms": """
            WITH arms AS (
              SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(floor(value / 500.0 * 1000000)
                                   AS BIGINT)) AS BIGINT) AS r_micro_sum
              FROM events GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM arms)
            SELECT event_type, n,
                   CAST(floor(CAST(r_micro_sum AS DOUBLE)
                        / (CAST(n AS DOUBLE) * 1000000.0)
                        * 1000000) AS BIGINT) AS mean_r_micro,
                   CAST(floor(sqrt(2.0 * ln(CAST(n_total AS DOUBLE))
                        / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
                     AS bonus_micro,
                   CAST(floor((CAST(r_micro_sum AS DOUBLE)
                        / (CAST(n AS DOUBLE) * 1000000.0)
                        + sqrt(2.0 * ln(CAST(n_total AS DOUBLE))
                               / CAST(n AS DOUBLE)))
                        * 1000000) AS BIGINT) AS ucb_micro
            FROM arms, tot
        """,
        "q349_token_fertility": f"""
            WITH per AS (
              SELECT lang, len({_TOKS}) AS nt,
                     len(list_distinct({_TOKS})) AS nd,
                     n_chars AS nc
              FROM documents),
            ag AS (
              SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(nt) AS BIGINT) AS n_tokens,
                     CAST(SUM(nd) AS BIGINT) AS n_distinct,
                     CAST(SUM(nc) AS BIGINT) AS n_chars
              FROM per GROUP BY 1)
            SELECT lang, n_docs, n_tokens,
                   n_tokens * 1000000 // n_docs AS tokens_per_doc_ppm,
                   n_chars * 1000000 // n_tokens AS chars_per_token_ppm,
                   n_distinct * 1000000 // n_tokens AS ttr_ppm
            FROM ag
        """,
        "q350_threshold_percolation": f"""
            WITH RECURSIVE words AS MATERIALIZED (
              SELECT DISTINCT doc_id AS id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            sizes AS (SELECT id, COUNT(*) AS nw FROM words GROUP BY id),
            inter AS (
              SELECT wa.id AS a, wb.id AS b,
                     CAST(COUNT(*) AS BIGINT) AS ni
              FROM words wa
              JOIN words wb ON wb.word = wa.word AND wa.id < wb.id
              GROUP BY 1, 2),
            pairs AS MATERIALIZED (
              SELECT a, b,
                     ni * 1000000 // (sa.nw + sb.nw - ni) AS j_ppm
              FROM inter
              JOIN sizes sa ON sa.id = a
              JOIN sizes sb ON sb.id = b
              WHERE ni * 1000000 // (sa.nw + sb.nw - ni) >= 500000),
            ths AS (SELECT unnest([500000, 700000, 900000]) AS th),
            sym AS MATERIALIZED (
              SELECT th, a, b FROM pairs, ths WHERE j_ppm >= th
              UNION
              SELECT th, b, a FROM pairs, ths WHERE j_ppm >= th),
            nodes AS (SELECT DISTINCT th, a AS node FROM sym),
            reach AS (
              SELECT th, node, node AS peer FROM nodes
              UNION
              SELECT r.th, r.node, s.b AS peer
              FROM reach r JOIN sym s ON s.th = r.th AND s.a = r.peer),
            comps AS (SELECT th, node, MIN(peer) AS component
                      FROM reach GROUP BY 1, 2),
            cs AS (SELECT th, component, CAST(COUNT(*) AS BIGINT) AS sz
                   FROM comps GROUP BY 1, 2),
            est AS (
              SELECT th, CAST(SUM(sz) AS BIGINT) AS n_nodes,
                     CAST(COUNT(*) AS BIGINT) AS n_components,
                     CAST(MAX(sz) AS BIGINT) AS max_component
              FROM cs GROUP BY 1),
            ecnt AS (
              SELECT t.th, CAST(COUNT(*) AS BIGINT) AS n_edges
              FROM ths t JOIN pairs p ON p.j_ppm >= t.th
              GROUP BY 1)
            SELECT CAST(e.th AS BIGINT) AS th_ppm, e.n_edges,
                   s.n_nodes, s.n_components, s.max_component
            FROM ecnt e JOIN est s ON s.th = e.th
        """,
        "q351_cdc_chunk_dedup": f"""
            WITH toks AS MATERIALIZED (
              SELECT doc_id, source, ord - 1 AS pos, tok,
                     CASE WHEN (instr('0123456789abcdef',
                                substr(md5(tok), 1, 1)) - 1) % 16 = 0
                          THEN 1 ELSE 0 END AS bflag
              FROM (SELECT doc_id, source, unnest({_TOKS}) AS tok,
                           generate_subscripts({_TOKS}, 1) AS ord
                    FROM documents)),
            cid AS (
              SELECT doc_id, source, pos, tok,
                     COALESCE(SUM(bflag) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS chunk_id
              FROM toks),
            chunks AS MATERIALIZED (
              SELECT doc_id, source, chunk_id,
                     md5(string_agg(tok, ' ' ORDER BY pos)) AS chash,
                     CAST(COUNT(*) AS BIGINT) AS n_tok
              FROM cid GROUP BY 1, 2, 3),
            occ AS (SELECT chash, CAST(COUNT(*) AS BIGINT) AS n_copies
                    FROM chunks GROUP BY 1)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN n_copies >= 2 THEN n_tok
                            ELSE 0 END) AS BIGINT) AS dedupable_tokens,
                   CAST(SUM(CASE WHEN n_copies >= 2 THEN n_tok
                            ELSE 0 END) AS BIGINT) * 1000000
                     // CAST(SUM(n_tok) AS BIGINT) AS dedupable_ppm
            FROM chunks JOIN occ USING (chash) GROUP BY 1
        """,
        "q352_hits_scores": """
            WITH edges AS MATERIALIZED (
              SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey),
            a1r AS (SELECT part,
                           CAST(COUNT(*) AS BIGINT) * 1000000 AS score
                    FROM edges GROUP BY 1),
            a1 AS (SELECT part, score * 1000000
                          // (SELECT MAX(score) FROM a1r) AS score
                   FROM a1r),
            h1r AS (SELECT cust, CAST(SUM(a1.score) AS BIGINT) AS score
                    FROM edges JOIN a1 USING (part) GROUP BY 1),
            h1 AS (SELECT cust, score * 1000000
                          // (SELECT MAX(score) FROM h1r) AS score
                   FROM h1r),
            a2r AS (SELECT part, CAST(SUM(h1.score) AS BIGINT) AS score
                    FROM edges JOIN h1 USING (cust) GROUP BY 1),
            a2 AS (SELECT part, score * 1000000
                          // (SELECT MAX(score) FROM a2r) AS score
                   FROM a2r),
            h2r AS (SELECT cust, CAST(SUM(a2.score) AS BIGINT) AS score
                    FROM edges JOIN a2 USING (part) GROUP BY 1),
            h2 AS (SELECT cust, score * 1000000
                          // (SELECT MAX(score) FROM h2r) AS score
                   FROM h2r)
            SELECT * FROM (
              SELECT 'hub' AS role, cust AS node_id, score
              FROM h2 ORDER BY score DESC, cust LIMIT 10)
            UNION ALL
            SELECT * FROM (
              SELECT 'authority' AS role, part AS node_id, score
              FROM a2 ORDER BY score DESC, part LIMIT 10)
        """,
        "q353_simhash_bit_balance": f"""
            WITH words AS (
              SELECT DISTINCT doc_id, unnest(toks) AS word
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
            h AS (SELECT doc_id, {_hex4("md5(word)", 1)} AS h16
                  FROM words),
            bits AS (
              SELECT doc_id, j,
                     SUM(((h16 // CAST(power(2, j) AS BIGINT)) % 2)
                         * 2 - 1) AS s
              FROM h, (SELECT unnest(range(0, 16)) AS j)
              GROUP BY doc_id, j),
            perbit AS (
              SELECT j AS bit, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS ones
              FROM bits GROUP BY 1)
            SELECT CAST(bit AS BIGINT) AS bit, ones,
                   ones * 1000000 // n AS ones_ppm,
                   CAST(floor(
                     (2.0 * CAST(ones AS DOUBLE) - CAST(n AS DOUBLE))
                     / sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
                     AS z_micro,
                   CASE WHEN abs(
                     (2.0 * CAST(ones AS DOUBLE) - CAST(n AS DOUBLE))
                     / sqrt(CAST(n AS DOUBLE))) > 3.89
                   THEN 1 ELSE 0 END AS skewed
            FROM perbit
        """,
        "q354_coec_position_bias": """
            WITH base AS MATERIALIZED (
              SELECT least(CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS BIGINT), 10)
                       AS pos,
                     CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                       AS clicked,
                     least(CAST(floor(value / 50.0) AS BIGINT), 9)
                       AS item
              FROM events),
            pc AS (
              SELECT pos,
                     CAST(SUM(clicked) AS BIGINT) * 1000000
                       // CAST(COUNT(*) AS BIGINT) AS ctr_ppm
              FROM base GROUP BY 1)
            SELECT item, CAST(COUNT(*) AS BIGINT) AS n_impressions,
                   CAST(SUM(clicked) AS BIGINT) AS n_clicks,
                   CAST(SUM(ctr_ppm) AS BIGINT) AS expected_clicks_ppm,
                   CAST(CAST(SUM(clicked) AS HUGEINT) * 1000000000000
                        // CAST(SUM(ctr_ppm) AS HUGEINT) AS BIGINT)
                     AS coec_ppm
            FROM base JOIN pc USING (pos) GROUP BY 1
        """,
        "q355_topk_stability": f"""
            WITH tc AS MATERIALIZED (
              SELECT ((instr('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                      * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
                      % 2 AS half,
                     tok AS token, CAST(COUNT(*) AS BIGINT) AS c
              FROM (SELECT doc_id, unnest({_TOKS}) AS tok
                    FROM documents)
              GROUP BY 1, 2),
            t0 AS (SELECT token FROM tc WHERE half = 0
                   ORDER BY c DESC, token LIMIT 20),
            t1 AS (SELECT token FROM tc WHERE half = 1
                   ORDER BY c DESC, token LIMIT 20),
            inter AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common
                      FROM t0 JOIN t1 USING (token))
            SELECT 20 AS k, n_common,
                   n_common * 1000000 // (40 - n_common) AS jaccard_ppm,
                   n_common * 1000000 // 20 AS overlap_ppm
            FROM inter
        """,
        "q356_quality_gate_funnel": f"""
            WITH v AS (
              SELECT source,
                     CASE WHEN n_chars < 200 THEN 'r1_too_short'
                          WHEN len({_TOKS}) < 30 THEN 'r2_few_tokens'
                          WHEN len(list_distinct({_TOKS})) * 10
                               < len({_TOKS}) * 3
                            THEN 'r3_repetitive'
                          WHEN length(regexp_replace(text, '[^0-9]',
                                                     '', 'g')) * 10
                               > n_chars * 3
                            THEN 'r4_numeric_heavy'
                          ELSE 'kept' END AS verdict,
                     CAST(len({_TOKS}) AS BIGINT) AS nt
              FROM documents)
            SELECT source, verdict, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(nt) AS BIGINT) AS n_tokens
            FROM v GROUP BY 1, 2
        """,
        "q357_peeking_audit": """
            WITH daily AS (
              SELECT ((instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                      * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1))
                      % 2 AS arm,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS s
              FROM events GROUP BY 1, 2),
            cum AS (
              SELECT arm, day,
                     CAST(SUM(n) OVER (PARTITION BY arm ORDER BY day)
                          AS BIGINT) AS cn,
                     CAST(SUM(s) OVER (PARTITION BY arm ORDER BY day)
                          AS BIGINT) AS cs
              FROM daily),
            byday AS (
              SELECT day,
                     MAX(CASE WHEN arm = 0 THEN cn END) AS n0,
                     MAX(CASE WHEN arm = 0 THEN cs END) AS s0,
                     MAX(CASE WHEN arm = 1 THEN cn END) AS n1,
                     MAX(CASE WHEN arm = 1 THEN cs END) AS s1
              FROM cum GROUP BY 1),
            f AS (
              SELECT * FROM byday
              WHERE n0 IS NOT NULL AND n1 IS NOT NULL
                AND s0 + s1 > 0 AND s0 + s1 < n0 + n1)
            SELECT day, n0 + n1 AS n_total,
                   CAST(floor(
                     (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                     / sqrt((CAST(s0 + s1 AS DOUBLE)
                             / CAST(n0 + n1 AS DOUBLE))
                            * (1.0 - CAST(s0 + s1 AS DOUBLE)
                               / CAST(n0 + n1 AS DOUBLE))
                            * (1.0 / CAST(n0 AS DOUBLE)
                               + 1.0 / CAST(n1 AS DOUBLE)))
                     * 1000000) AS BIGINT) AS z_micro,
                   CASE WHEN abs(
                     (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                     / sqrt((CAST(s0 + s1 AS DOUBLE)
                             / CAST(n0 + n1 AS DOUBLE))
                            * (1.0 - CAST(s0 + s1 AS DOUBLE)
                               / CAST(n0 + n1 AS DOUBLE))
                            * (1.0 / CAST(n0 AS DOUBLE)
                               + 1.0 / CAST(n1 AS DOUBLE))))
                     > 1.959963984540054 THEN 1 ELSE 0 END
                     AS naive_reject,
                   CASE WHEN abs(
                     (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                     / sqrt((CAST(s0 + s1 AS DOUBLE)
                             / CAST(n0 + n1 AS DOUBLE))
                            * (1.0 - CAST(s0 + s1 AS DOUBLE)
                               / CAST(n0 + n1 AS DOUBLE))
                            * (1.0 / CAST(n0 AS DOUBLE)
                               + 1.0 / CAST(n1 AS DOUBLE))))
                     > 2.413 THEN 1 ELSE 0 END AS pocock_reject
            FROM f
        """,
        "q358_partition_advisor": """
            WITH p1 AS (SELECT event_type AS k,
                               CAST(COUNT(*) AS BIGINT) AS n
                        FROM events GROUP BY 1),
            a1 AS (SELECT 'event_type' AS candidate,
                          CAST(COUNT(*) AS BIGINT) AS ndv,
                          CAST(SUM(n) AS BIGINT) AS n_rows,
                          CAST(MAX(n) AS BIGINT) AS max_rows FROM p1),
            p2 AS (SELECT epoch_us(ts) // 86400000000 AS k,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM events GROUP BY 1),
            a2 AS (SELECT 'event_day', CAST(COUNT(*) AS BIGINT),
                          CAST(SUM(n) AS BIGINT),
                          CAST(MAX(n) AS BIGINT) FROM p2),
            p3 AS (SELECT user_id % 256 AS k,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM events GROUP BY 1),
            a3 AS (SELECT 'user_bucket_256', CAST(COUNT(*) AS BIGINT),
                          CAST(SUM(n) AS BIGINT),
                          CAST(MAX(n) AS BIGINT) FROM p3),
            u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2
                  UNION ALL SELECT * FROM a3)
            SELECT candidate, ndv,
                   max_rows * 1000000 // n_rows AS max_share_ppm,
                   CASE WHEN ndv < 10 OR ndv > 10000
                             OR max_rows * 1000000 // n_rows > 200000
                        THEN 'rejected' ELSE 'viable' END AS verdict
            FROM u
        """,
        "q359_auc_delong_ci": """
            WITH vals AS MATERIALIZED (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS s,
                     CAST(COUNT(*) AS BIGINT) AS cnt,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS cpos
              FROM orders GROUP BY 1),
            cum AS (
              SELECT s, cnt, cpos, cnt - cpos AS cneg,
                     CAST(SUM(cnt) OVER w AS BIGINT) AS ca,
                     CAST(SUM(cpos) OVER w AS BIGINT) AS cp,
                     CAST(SUM(cnt - cpos) OVER w AS BIGINT) AS cn
              FROM vals
              WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)),
            tot AS (SELECT CAST(SUM(cpos) AS BIGINT) AS n1,
                           CAST(SUM(cnt - cpos) AS BIGINT) AS n0
                    FROM vals),
            base AS (
              SELECT s, cpos, cneg, n1, n0,
                     2 * (ca - cnt) + cnt + 1 AS ra2,
                     2 * (cp - cpos) + cpos + 1 AS rp2,
                     2 * (cn - cneg) + cneg + 1 AS rn2
              FROM cum, tot),
            aucv AS (
              SELECT SUM(CAST(cpos AS HUGEINT)
                         * CAST(ra2 - rp2 AS HUGEINT)) AS num2,
                     MAX(n1) AS n1, MAX(n0) AS n0
              FROM base),
            a AS (SELECT CAST(num2 AS DOUBLE)
                         / (2.0 * CAST(n1 AS DOUBLE)
                            * CAST(n0 AS DOUBLE)) AS auc
                  FROM aucv),
            dev AS (
              SELECT auc,
                     CAST(floor(CAST(cpos AS DOUBLE)
                          * (CAST(ra2 - rp2 AS DOUBLE)
                             / (2.0 * CAST(n0 AS DOUBLE)) - auc)
                          * (CAST(ra2 - rp2 AS DOUBLE)
                             / (2.0 * CAST(n0 AS DOUBLE)) - auc)
                          * 1000000000.0) AS BIGINT) AS d10_nano,
                     CAST(floor(CAST(cneg AS DOUBLE)
                          * (1.0 - CAST(ra2 - rn2 AS DOUBLE)
                             / (2.0 * CAST(n1 AS DOUBLE)) - auc)
                          * (1.0 - CAST(ra2 - rn2 AS DOUBLE)
                             / (2.0 * CAST(n1 AS DOUBLE)) - auc)
                          * 1000000000.0) AS BIGINT) AS d01_nano
              FROM base, a),
            ag AS (
              SELECT auc, CAST(SUM(d10_nano) AS BIGINT) AS s10_nano,
                     CAST(SUM(d01_nano) AS BIGINT) AS s01_nano
              FROM dev GROUP BY 1)
            SELECT n1, n0,
                   CAST(floor(auc * 1000000) AS BIGINT) AS auc_micro,
                   CAST(floor(sqrt(
                     CAST(s10_nano AS DOUBLE) / 1000000000.0
                       / (CAST(n1 AS DOUBLE) - 1.0)
                       / CAST(n1 AS DOUBLE)
                     + CAST(s01_nano AS DOUBLE) / 1000000000.0
                       / (CAST(n0 AS DOUBLE) - 1.0)
                       / CAST(n0 AS DOUBLE))
                     * 1000000) AS BIGINT) AS se_micro,
                   CAST(floor((auc - 1.959963984540054 * sqrt(
                     CAST(s10_nano AS DOUBLE) / 1000000000.0
                       / (CAST(n1 AS DOUBLE) - 1.0)
                       / CAST(n1 AS DOUBLE)
                     + CAST(s01_nano AS DOUBLE) / 1000000000.0
                       / (CAST(n0 AS DOUBLE) - 1.0)
                       / CAST(n0 AS DOUBLE)))
                     * 1000000) AS BIGINT) AS lo_micro,
                   CAST(floor((auc + 1.959963984540054 * sqrt(
                     CAST(s10_nano AS DOUBLE) / 1000000000.0
                       / (CAST(n1 AS DOUBLE) - 1.0)
                       / CAST(n1 AS DOUBLE)
                     + CAST(s01_nano AS DOUBLE) / 1000000000.0
                       / (CAST(n0 AS DOUBLE) - 1.0)
                       / CAST(n0 AS DOUBLE)))
                     * 1000000) AS BIGINT) AS hi_micro
            FROM ag, tot
        """,
        "q360_bernstein_bound": """
            WITH agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(floor(value / 500.0 * 1000000)
                                   AS BIGINT)) AS BIGINT) AS s,
                     SUM(CAST(CAST(floor(value / 500.0 * 1000000)
                              AS BIGINT) AS HUGEINT)
                         * CAST(CAST(floor(value / 500.0 * 1000000)
                                AS BIGINT) AS HUGEINT)) AS q
              FROM events),
            calc AS (
              SELECT n,
                     CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
                       AS mean,
                     (CAST(q AS DOUBLE) / 1000000000000.0
                      - (CAST(s AS DOUBLE) / 1000000.0)
                        * (CAST(s AS DOUBLE) / 1000000.0)
                        / CAST(n AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1.0) AS var
              FROM agg)
            SELECT n,
                   CAST(floor(mean * 1000000) AS BIGINT) AS mean_micro,
                   CAST(floor(var * 1000000) AS BIGINT) AS var_micro,
                   CAST(floor((sqrt(2.0 * var * ln(40.0)
                        / CAST(n AS DOUBLE))
                        + 7.0 * ln(40.0)
                          / (3.0 * (CAST(n AS DOUBLE) - 1.0)))
                        * 1000000) AS BIGINT) AS eb_radius_micro,
                   CAST(floor(sqrt(ln(40.0) / (2.0 * CAST(n AS DOUBLE)))
                        * 1000000) AS BIGINT)
                     AS hoeffding_radius_micro,
                   CASE WHEN sqrt(2.0 * var * ln(40.0)
                          / CAST(n AS DOUBLE))
                          + 7.0 * ln(40.0)
                            / (3.0 * (CAST(n AS DOUBLE) - 1.0))
                        < sqrt(ln(40.0) / (2.0 * CAST(n AS DOUBLE)))
                        THEN 1 ELSE 0 END AS eb_tighter
            FROM calc
        """,
        "q361_kish_ess": """
            WITH t AS (
              SELECT CASE WHEN event_type =
                          (CASE WHEN value > 50.0
                           THEN 'click' ELSE 'view' END)
                     THEN 1 ELSE 0 END
                     * (25200 // (((instr('0123456789abcdef',
                        substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1)
                      * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1))
                      % 9 + 1)) AS mw
              FROM events),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     SUM(CAST(mw AS HUGEINT)) AS sw,
                     SUM(CAST(mw AS HUGEINT) * CAST(mw AS HUGEINT))
                       AS sww
              FROM t)
            SELECT n,
                   CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                        / CAST(sww AS DOUBLE) * 1000) AS BIGINT)
                     AS ess_milli,
                   CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                        / CAST(sww AS DOUBLE) / CAST(n AS DOUBLE)
                        * 1000000) AS BIGINT) AS ess_ratio_ppm
            FROM agg
        """,
        "q362_qini_uplift": """
            WITH cells AS (
              SELECT (((instr('0123456789abcdef',
                         substr(md5(CAST(o_orderkey AS VARCHAR)), 3, 1))
                         - 1) * 16
                       + (instr('0123456789abcdef',
                         substr(md5(CAST(o_orderkey AS VARCHAR)), 4, 1))
                         - 1)) % 100) // 10 AS decile,
                     ((instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                        - 1) * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))
                        - 1)) % 2 AS t,
                     CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
              FROM orders),
            dec AS (
              SELECT decile,
                     CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS nt,
                     CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END)
                          AS BIGINT) AS yt,
                     CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS nc,
                     CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END)
                          AS BIGINT) AS yc
              FROM cells GROUP BY 1),
            cum AS (
              SELECT decile,
                     CAST(SUM(nt) OVER w AS BIGINT) AS nt_cum,
                     CAST(SUM(yt) OVER w AS BIGINT) AS yt_cum,
                     CAST(SUM(nc) OVER w AS BIGINT) AS nc_cum,
                     CAST(SUM(yc) OVER w AS BIGINT) AS yc_cum
              FROM dec
              WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW))
            SELECT decile, nt_cum, nc_cum, yt_cum, yc_cum,
                   CAST(floor((CAST(yt_cum AS DOUBLE)
                        - CAST(yc_cum AS DOUBLE)
                          * CAST(nt_cum AS DOUBLE)
                          / CAST(nc_cum AS DOUBLE))
                        * 1000) AS BIGINT) AS qini_milli
            FROM cum
        """,
        "q363_feature_hash_collisions": f"""
            WITH vocab AS MATERIALIZED (
              SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS c
              FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
              GROUP BY 1),
            hashed AS (
              SELECT token, c,
                     ({_hex4("md5(token)", 1)} * 65536
                      + {_hex4("md5(token)", 5)}) AS h
              FROM vocab),
            pb1 AS (SELECT h % 1024 AS b,
                           CAST(COUNT(*) AS BIGINT) AS n_tok,
                           CAST(SUM(c) AS BIGINT) AS mass
                    FROM hashed GROUP BY 1),
            s1 AS (
              SELECT CAST(1024 AS INT) AS dims,
                     CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS buckets_used,
                     CAST(SUM(CASE WHEN n_tok >= 2 THEN n_tok
                              ELSE 0 END) AS BIGINT) AS collided_tokens,
                     CAST(SUM(mass) AS BIGINT) AS total_mass,
                     CAST(SUM(CASE WHEN n_tok >= 2 THEN mass
                              ELSE 0 END) AS BIGINT) AS collided_mass
              FROM pb1),
            pb2 AS (SELECT h % 16384 AS b,
                           CAST(COUNT(*) AS BIGINT) AS n_tok,
                           CAST(SUM(c) AS BIGINT) AS mass
                    FROM hashed GROUP BY 1),
            s2 AS (
              SELECT CAST(16384 AS INT) AS dims,
                     CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS buckets_used,
                     CAST(SUM(CASE WHEN n_tok >= 2 THEN n_tok
                              ELSE 0 END) AS BIGINT) AS collided_tokens,
                     CAST(SUM(mass) AS BIGINT) AS total_mass,
                     CAST(SUM(CASE WHEN n_tok >= 2 THEN mass
                              ELSE 0 END) AS BIGINT) AS collided_mass
              FROM pb2),
            u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
            SELECT dims, n_tokens, buckets_used, collided_tokens,
                   collided_mass * 1000000 // total_mass
                     AS collided_mass_ppm,
                   n_tokens * 1000000 // dims AS load_factor_ppm
            FROM u
        """,
        "q364_topical_outliers": f"""
            WITH dt AS MATERIALIZED (
              SELECT doc_id, source, tok AS token,
                     CAST(COUNT(*) AS BIGINT) AS cd
              FROM (SELECT doc_id, source, unnest({_TOKS}) AS tok
                    FROM documents)
              GROUP BY 1, 2, 3),
            stc AS MATERIALIZED (
              SELECT source, token, CAST(SUM(cd) AS BIGINT) AS cs
              FROM dt GROUP BY 1, 2),
            snorm AS (
              SELECT source,
                     SUM(CAST(cs AS HUGEINT) * CAST(cs AS HUGEINT))
                       AS ns2
              FROM stc GROUP BY 1),
            pd AS (
              SELECT doc_id, dt.source,
                     SUM(CAST(cd AS HUGEINT) * CAST(cs AS HUGEINT))
                       AS dot,
                     SUM(CAST(cd AS HUGEINT) * CAST(cd AS HUGEINT))
                       AS nd2
              FROM dt JOIN stc USING (source, token)
              GROUP BY 1, 2),
            scored AS (
              SELECT pd.source, doc_id,
                     CAST(floor(CAST(dot AS DOUBLE)
                          / (sqrt(CAST(nd2 AS DOUBLE))
                             * sqrt(CAST(ns2 AS DOUBLE)))
                          * 1000000) AS BIGINT) AS cos_micro
              FROM pd JOIN snorm USING (source))
            SELECT source, doc_id, cos_micro, rank FROM (
              SELECT source, doc_id, cos_micro,
                     CAST(ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY cos_micro, doc_id) AS BIGINT) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "q365_pinball_loss": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            base AS (
              SELECT day, rev,
                     LAG(rev, 7) OVER (ORDER BY day) AS f50
              FROM daily),
            f AS (SELECT * FROM base WHERE f50 IS NOT NULL),
            l10 AS (
              SELECT CAST(floor(greatest(
                       0.1 * CAST(rev - f50 * 8 / 10 AS DOUBLE),
                       (0.1 - 1.0) * CAST(rev - f50 * 8 / 10 AS DOUBLE))
                       / 1000.0) AS BIGINT) AS l FROM f),
            l50 AS (
              SELECT CAST(floor(greatest(
                       0.5 * CAST(rev - f50 * 10 / 10 AS DOUBLE),
                       (0.5 - 1.0) * CAST(rev - f50 * 10 / 10
                                          AS DOUBLE))
                       / 1000.0) AS BIGINT) AS l FROM f),
            l90 AS (
              SELECT CAST(floor(greatest(
                       0.9 * CAST(rev - f50 * 12 / 10 AS DOUBLE),
                       (0.9 - 1.0) * CAST(rev - f50 * 12 / 10
                                          AS DOUBLE))
                       / 1000.0) AS BIGINT) AS l FROM f)
            SELECT 'p10' AS quantile, CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(l) AS BIGINT) // COUNT(*)
                     AS pinball_millicents
            FROM l10
            UNION ALL
            SELECT 'p50', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(l) AS BIGINT) // COUNT(*) FROM l50
            UNION ALL
            SELECT 'p90', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(l) AS BIGINT) // COUNT(*) FROM l90
        """,
        "q366_lincoln_petersen": """
            WITH pu AS (
              SELECT user_id,
                     MAX(CASE WHEN ((instr('0123456789abcdef',
                        substr(md5(CAST(event_id AS VARCHAR)), 1, 1))
                        - 1) * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(event_id AS VARCHAR)), 2, 1))
                        - 1)) % 2 = 0 THEN 1 ELSE 0 END) AS in1,
                     MAX(CASE WHEN ((instr('0123456789abcdef',
                        substr(md5(CAST(event_id AS VARCHAR)), 1, 1))
                        - 1) * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(event_id AS VARCHAR)), 2, 1))
                        - 1)) % 2 = 1 THEN 1 ELSE 0 END) AS in2
              FROM events GROUP BY 1),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
                     CAST(SUM(in1) AS BIGINT) AS n1,
                     CAST(SUM(in2) AS BIGINT) AS n2,
                     CAST(SUM(CASE WHEN in1 = 1 AND in2 = 1
                              THEN 1 ELSE 0 END) AS BIGINT) AS m
              FROM pu)
            SELECT n_true, n1, n2, m,
                   CAST(floor((CAST(n1 + 1 AS DOUBLE)
                        * CAST(n2 + 1 AS DOUBLE)
                        / CAST(m + 1 AS DOUBLE) - 1.0)
                        * 1000) AS BIGINT) AS n_hat_milli,
                   CAST(floor((CAST(n1 + 1 AS DOUBLE)
                        * CAST(n2 + 1 AS DOUBLE)
                        / CAST(m + 1 AS DOUBLE) - 1.0)
                        / CAST(n_true AS DOUBLE) * 1000000) AS BIGINT)
                     AS ratio_ppm
            FROM agg
        """,
        "q367_catalog_coverage": """
            WITH b AS MATERIALIZED (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            sized AS (SELECT l_orderkey FROM b GROUP BY 1
                      HAVING COUNT(*) >= 2),
            bb AS MATERIALIZED (
              SELECT b.l_orderkey, l_partkey FROM b
              JOIN sized USING (l_orderkey)),
            pairs AS (
              SELECT x.l_partkey AS p1, y.l_partkey AS p2,
                     COUNT(*) AS nij
              FROM bb x JOIN bb y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_partkey < y.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            freq AS (SELECT l_partkey AS item, COUNT(*) AS ni
                     FROM bb GROUP BY 1),
            sym AS (
              SELECT p1, p2, nij FROM pairs
              UNION ALL
              SELECT p2 AS p1, p1 AS p2, nij FROM pairs),
            scored AS (
              SELECT s.p1 AS item, s.p2 AS neighbor,
                     CAST(floor(
                       CAST(nij AS DOUBLE)
                       / sqrt(CAST(fa.ni AS DOUBLE) * fb.ni)
                       * 1000000) AS BIGINT) AS sim_micro
              FROM sym s
              JOIN freq fa ON fa.item = s.p1
              JOIN freq fb ON fb.item = s.p2),
            recs AS MATERIALIZED (
              SELECT neighbor AS item FROM (
                SELECT item, neighbor,
                       ROW_NUMBER() OVER (PARTITION BY item
                         ORDER BY sim_micro DESC, neighbor) AS rank
                FROM scored)
              WHERE rank <= 5),
            pop AS (SELECT l_partkey AS item,
                           CAST(COUNT(*) AS BIGINT) AS n
                    FROM lineitem GROUP BY 1),
            catalog AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_catalog,
                               CAST(SUM(n) AS BIGINT) AS n_purchases
                        FROM pop),
            cov AS (SELECT CAST(COUNT(DISTINCT item) AS BIGINT)
                             AS n_recommended FROM recs),
            nov AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_slots,
                     CAST(SUM(CAST(floor(
                       -ln(CAST(n AS DOUBLE)
                           / CAST(n_purchases AS DOUBLE))
                       * 1000000) AS BIGINT)) AS BIGINT) AS tsum
              FROM recs JOIN pop USING (item), catalog)
            SELECT n_catalog, n_recommended,
                   n_recommended * 1000000 // n_catalog
                     AS coverage_ppm,
                   n_slots, tsum // n_slots AS novelty_micro
            FROM cov, catalog, nov
        """,
        "q368_positivity_overlap": """
            WITH cells AS (
              SELECT (((instr('0123456789abcdef',
                         substr(md5(CAST(o_orderkey AS VARCHAR)), 3, 1))
                         - 1) * 16
                       + (instr('0123456789abcdef',
                         substr(md5(CAST(o_orderkey AS VARCHAR)), 4, 1))
                         - 1)) % 100) // 20 AS stratum,
                     ((instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                        - 1) * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))
                        - 1)) % 2 AS t
              FROM orders),
            ag AS (
              SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(t) AS BIGINT) AS n_treated
              FROM cells GROUP BY 1)
            SELECT stratum, n, n_treated,
                   n_treated * 1000000 // n AS treated_share_ppm,
                   CASE WHEN n_treated * 1000000 // n < 100000
                          OR n_treated * 1000000 // n > 900000
                        THEN 1 ELSE 0 END AS overlap_violation
            FROM ag
        """,
        "q369_box_pierce": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            resid AS MATERIALIZED (
              SELECT day, CAST(rev - f AS DOUBLE) / 100.0 AS e
              FROM (SELECT day, rev, LAG(rev, 7) OVER (ORDER BY day)
                      AS f FROM daily)
              WHERE f IS NOT NULL),
            stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                             CAST(SUM(CAST(floor(e) AS BIGINT))
                                  AS BIGINT) AS se_floor
                      FROM resid),
            centered AS MATERIALIZED (
              SELECT day,
                     e - CAST(se_floor AS DOUBLE) / CAST(n AS DOUBLE)
                       AS d
              FROM resid, stats),
            den AS (SELECT CAST(SUM(CAST(floor(d * d / 1000000.0)
                                    AS BIGINT)) AS BIGINT) AS den_sum
                    FROM centered),
            n1 AS (SELECT 1 AS lag,
                          CAST(SUM(CAST(floor(d * dl / 1000000.0)
                                   AS BIGINT)) AS BIGINT) AS num_sum
                   FROM (SELECT d, LAG(d, 1) OVER (ORDER BY day) AS dl
                         FROM centered)
                   WHERE dl IS NOT NULL),
            n2 AS (SELECT 2,
                          CAST(SUM(CAST(floor(d * dl / 1000000.0)
                                   AS BIGINT)) AS BIGINT)
                   FROM (SELECT d, LAG(d, 2) OVER (ORDER BY day) AS dl
                         FROM centered)
                   WHERE dl IS NOT NULL),
            n3 AS (SELECT 3,
                          CAST(SUM(CAST(floor(d * dl / 1000000.0)
                                   AS BIGINT)) AS BIGINT)
                   FROM (SELECT d, LAG(d, 3) OVER (ORDER BY day) AS dl
                         FROM centered)
                   WHERE dl IS NOT NULL),
            n4 AS (SELECT 4,
                          CAST(SUM(CAST(floor(d * dl / 1000000.0)
                                   AS BIGINT)) AS BIGINT)
                   FROM (SELECT d, LAG(d, 4) OVER (ORDER BY day) AS dl
                         FROM centered)
                   WHERE dl IS NOT NULL),
            n5 AS (SELECT 5,
                          CAST(SUM(CAST(floor(d * dl / 1000000.0)
                                   AS BIGINT)) AS BIGINT)
                   FROM (SELECT d, LAG(d, 5) OVER (ORDER BY day) AS dl
                         FROM centered)
                   WHERE dl IS NOT NULL),
            nums AS (SELECT * FROM n1 UNION ALL SELECT * FROM n2
                     UNION ALL SELECT * FROM n3 UNION ALL
                     SELECT * FROM n4 UNION ALL SELECT * FROM n5),
            per AS (
              SELECT lag,
                     CAST(floor(CAST(num_sum AS DOUBLE)
                          / CAST(den_sum AS DOUBLE) * 1000000)
                          AS BIGINT) AS r_micro,
                     CAST(floor(CAST(n AS DOUBLE)
                          * (CAST(num_sum AS DOUBLE)
                             / CAST(den_sum AS DOUBLE))
                          * (CAST(num_sum AS DOUBLE)
                             / CAST(den_sum AS DOUBLE))
                          * 1000000) AS BIGINT) AS q_term_micro
              FROM nums, den, stats)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_lags,
                   CAST(SUM(q_term_micro) AS BIGINT) AS q_stat_micro,
                   CAST(MAX(CASE WHEN lag = 1 THEN r_micro END)
                        AS BIGINT) AS r1_micro,
                   CASE WHEN CAST(SUM(q_term_micro) AS BIGINT)
                        > 11070498 THEN 1 ELSE 0 END
                     AS residual_signal
            FROM per
        """,
        "q370_pr_auc": """
            WITH vals AS MATERIALIZED (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS s,
                     CAST(COUNT(*) AS BIGINT) AS cnt,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS cpos
              FROM orders GROUP BY 1),
            cum AS (
              SELECT s, cnt, cpos,
                     CAST(SUM(cnt) OVER w AS BIGINT) AS ca,
                     CAST(SUM(cpos) OVER w AS BIGINT) AS cp
              FROM vals
              WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)),
            tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                           CAST(SUM(cpos) AS BIGINT) AS n1 FROM vals),
            terms AS (
              SELECT n, n1,
                     CAST(floor(
                       CAST(cpos AS DOUBLE) / CAST(n1 AS DOUBLE)
                       * (CAST(n1 - (cp - cpos) AS DOUBLE)
                          / CAST(n - (ca - cnt) AS DOUBLE))
                       * 1000000000) AS BIGINT) AS t
              FROM cum, tot)
            SELECT n, n1, CAST(SUM(t) AS BIGINT) AS ap_nano,
                   n1 * 1000000 // n AS baseline_ppm
            FROM terms GROUP BY 1, 2
        """,
        "q371_hash_uniformity_ks": """
            WITH bins AS (
              SELECT ((instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                      * 16
                      + (instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1))
                       AS b,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM events GROUP BY 1),
            cum AS (
              SELECT b, CAST(SUM(c) OVER (ORDER BY b) AS BIGINT) AS cum
              FROM bins),
            tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM bins),
            agg AS (
              SELECT n,
                     CAST(MAX(abs(cum * 256 - (b + 1) * n)) AS BIGINT)
                       AS max_dev
              FROM cum, tot GROUP BY 1)
            SELECT n,
                   CAST(floor(CAST(max_dev AS DOUBLE)
                        / (256.0 * CAST(n AS DOUBLE)) * 1000000)
                        AS BIGINT) AS d_micro,
                   CAST(floor(1.36 / sqrt(CAST(n AS DOUBLE)) * 1000000)
                        AS BIGINT) AS crit_micro,
                   CASE WHEN CAST(max_dev AS DOUBLE)
                        / (256.0 * CAST(n AS DOUBLE))
                        > 1.36 / sqrt(CAST(n AS DOUBLE))
                        THEN 1 ELSE 0 END AS non_uniform
            FROM agg
        """,
        "q372_cramers_v": """
            WITH cells AS MATERIALIZED (
              SELECT c.c_mktsegment, o.o_orderpriority,
                     CAST(COUNT(*) AS BIGINT) AS o
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2),
            rowm AS (SELECT c_mktsegment, CAST(SUM(o) AS BIGINT) AS rm
                     FROM cells GROUP BY 1),
            colm AS (SELECT o_orderpriority,
                            CAST(SUM(o) AS BIGINT) AS cm
                     FROM cells GROUP BY 1),
            tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
            terms AS (
              SELECT n,
                     CAST(floor(
                       (CAST(o AS DOUBLE)
                        - CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       * (CAST(o AS DOUBLE)
                          - CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                            / CAST(n AS DOUBLE))
                       / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       * 1000000000) AS BIGINT) AS t
              FROM cells JOIN rowm USING (c_mktsegment)
                   JOIN colm USING (o_orderpriority), tot)
            SELECT n, CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(SUM(t) AS BIGINT) // 1000 AS chi2_micro,
                   CAST(floor(sqrt(
                     CAST(SUM(t) AS DOUBLE) / 1000000000.0
                     / (CAST(n AS DOUBLE) * 4.0)) * 1000000) AS BIGINT)
                     AS cramers_v_micro
            FROM terms GROUP BY 1
        """,
        "q373_kruskal_wallis": """
            WITH obs AS (
              SELECT c.c_mktsegment AS seg,
                     CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
              FROM orders o JOIN customer c
                ON o.o_custkey = c.c_custkey),
            byval AS (
              SELECT cents, CAST(COUNT(*) AS BIGINT) AS nv,
                     CAST(SUM(CASE WHEN seg = 'AUTOMOBILE'
                              THEN 1 ELSE 0 END) AS BIGINT) AS g0,
                     CAST(SUM(CASE WHEN seg = 'BUILDING'
                              THEN 1 ELSE 0 END) AS BIGINT) AS g1,
                     CAST(SUM(CASE WHEN seg = 'FURNITURE'
                              THEN 1 ELSE 0 END) AS BIGINT) AS g2,
                     CAST(SUM(CASE WHEN seg = 'HOUSEHOLD'
                              THEN 1 ELSE 0 END) AS BIGINT) AS g3,
                     CAST(SUM(CASE WHEN seg = 'MACHINERY'
                              THEN 1 ELSE 0 END) AS BIGINT) AS g4
              FROM obs GROUP BY 1),
            ranked AS (
              SELECT *,
                     COALESCE(CAST(SUM(nv) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS BIGINT), 0) AS cumb
              FROM byval),
            s AS (
              SELECT CAST(SUM(nv) AS BIGINT) AS n,
                     CAST(SUM(nv * nv * nv - nv) AS BIGINT) AS ties,
                     CAST(SUM(g0) AS BIGINT) AS ng0,
                     CAST(SUM(g1) AS BIGINT) AS ng1,
                     CAST(SUM(g2) AS BIGINT) AS ng2,
                     CAST(SUM(g3) AS BIGINT) AS ng3,
                     CAST(SUM(g4) AS BIGINT) AS ng4,
                     CAST(SUM(g0 * (2 * cumb + nv + 1)) AS BIGINT)
                       AS r0,
                     CAST(SUM(g1 * (2 * cumb + nv + 1)) AS BIGINT)
                       AS r1,
                     CAST(SUM(g2 * (2 * cumb + nv + 1)) AS BIGINT)
                       AS r2,
                     CAST(SUM(g3 * (2 * cumb + nv + 1)) AS BIGINT)
                       AS r3,
                     CAST(SUM(g4 * (2 * cumb + nv + 1)) AS BIGINT)
                       AS r4
              FROM ranked),
            h AS (
              SELECT n, ng0, ng1, ng2, ng3, ng4,
                     (CAST(floor(3.0 * CAST(r0 AS DOUBLE)
                        * CAST(r0 AS DOUBLE)
                        / (CAST(ng0 AS DOUBLE) * CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) + 1.0))
                        * 1000000) AS BIGINT)
                      + CAST(floor(3.0 * CAST(r1 AS DOUBLE)
                        * CAST(r1 AS DOUBLE)
                        / (CAST(ng1 AS DOUBLE) * CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) + 1.0))
                        * 1000000) AS BIGINT)
                      + CAST(floor(3.0 * CAST(r2 AS DOUBLE)
                        * CAST(r2 AS DOUBLE)
                        / (CAST(ng2 AS DOUBLE) * CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) + 1.0))
                        * 1000000) AS BIGINT)
                      + CAST(floor(3.0 * CAST(r3 AS DOUBLE)
                        * CAST(r3 AS DOUBLE)
                        / (CAST(ng3 AS DOUBLE) * CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) + 1.0))
                        * 1000000) AS BIGINT)
                      + CAST(floor(3.0 * CAST(r4 AS DOUBLE)
                        * CAST(r4 AS DOUBLE)
                        / (CAST(ng4 AS DOUBLE) * CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) + 1.0))
                        * 1000000) AS BIGINT))
                     - 3 * (n + 1) * 1000000 AS h_micro,
                     1.0 - CAST(ties AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))
                       AS c_corr
              FROM s)
            SELECT n,
                   ng0 AS n_automobile, ng1 AS n_building,
                   ng2 AS n_furniture, ng3 AS n_household,
                   ng4 AS n_machinery,
                   h_micro,
                   CAST(floor(c_corr * 1000000) AS BIGINT) AS c_ppm,
                   CAST(floor(CAST(h_micro AS DOUBLE) / c_corr)
                        AS BIGINT) AS h_adj_micro,
                   CASE WHEN floor(CAST(h_micro AS DOUBLE) / c_corr)
                        > 9487729 THEN 1 ELSE 0 END AS significant
            FROM h
        """,
        "q374_bh_fdr": """
            WITH per AS (
              SELECT n.n_name,
                     CAST(COUNT(*) AS BIGINT) AS n_i,
                     CAST(SUM(CASE WHEN o.o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS x_i
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_i) AS BIGINT) AS n,
                           CAST(SUM(x_i) AS BIGINT) AS x FROM per),
            scored AS (
              SELECT n_name, n_i, x_i,
                     CAST(least(1000000.0, floor(2000000.0 / (1.0 +
                       (CAST(x_i AS DOUBLE) - CAST(n_i AS DOUBLE)
                        * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))
                       * (CAST(x_i AS DOUBLE) - CAST(n_i AS DOUBLE)
                          * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))
                       / (CAST(n_i AS DOUBLE)
                          * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 - CAST(x AS DOUBLE)
                                   / CAST(n AS DOUBLE))))))
                       AS BIGINT) AS p_micro
              FROM per, tot),
            ranked AS (
              SELECT n_name, n_i, x_i, p_micro,
                     ROW_NUMBER() OVER (ORDER BY p_micro, n_name)
                       AS rank
              FROM scored),
            k AS (
              SELECT COALESCE(MAX(CASE WHEN p_micro * 25
                       <= rank * 50000 THEN rank END), 0) AS k
              FROM ranked)
            SELECT n_name, n_i, x_i, p_micro, rank,
                   CASE WHEN rank <= k THEN 1 ELSE 0 END AS rejected
            FROM ranked, k
        """,
        "q375_page_hinkley": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            pre AS (
              SELECT day,
                     CAST(rev AS DOUBLE) / 100.0 AS x,
                     CAST(CAST(SUM(rev) OVER w AS BIGINT) AS DOUBLE)
                       / 100.0 AS cx,
                     CAST(COUNT(*) OVER w AS BIGINT) AS t
              FROM daily
              WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW)),
            terms AS (
              SELECT day,
                     CAST(floor((x - cx / CAST(t AS DOUBLE))
                          * 1000000) AS BIGINT) AS term
              FROM pre),
            m AS (
              SELECT day,
                     CAST(SUM(term) OVER w AS BIGINT) AS m
              FROM terms
              WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW)),
            gapped AS (
              SELECT day,
                     m - CAST(MIN(m) OVER (ORDER BY day ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS gap
              FROM m)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(CASE WHEN gap > 50000000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
                   MIN(CASE WHEN gap > 50000000000 THEN day END)
                     AS first_alarm_day,
                   CAST(MAX(gap) AS BIGINT) AS max_gap_micro
            FROM gapped
        """,
        "q376_bradley_terry": """
            WITH per AS (
              SELECT l.l_orderkey AS ok, s.s_nationkey AS nk,
                     CAST(SUM(CAST(CAST(l.l_extendedprice
                                        AS DECIMAL(18,2)) * 100
                                   AS BIGINT)) AS BIGINT) AS cents
              FROM lineitem l JOIN supplier s
                ON l.l_suppkey = s.s_suppkey
              GROUP BY 1, 2),
            games AS (
              SELECT a.nk AS na, b.nk AS nb,
                     CASE WHEN a.cents >= b.cents THEN 1 ELSE 0 END
                       AS wa
              FROM per a JOIN per b
                ON a.ok = b.ok AND a.nk < b.nk),
            pair AS MATERIALIZED (
              SELECT na, nb, CAST(COUNT(*) AS BIGINT) AS n_g,
                     CAST(SUM(wa) AS BIGINT) AS w_a
              FROM games GROUP BY 1, 2),
            tot AS MATERIALIZED (
              SELECT nk, CAST(SUM(n_g) AS BIGINT) AS t_i,
                     CAST(SUM(w) AS BIGINT) AS w_i
              FROM (SELECT na AS nk, n_g, w_a AS w FROM pair
                    UNION ALL
                    SELECT nb AS nk, n_g, n_g - w_a AS w FROM pair)
              GROUP BY 1),
            w0 AS (
              SELECT nk,
                     (2.0 * (CAST(w_i AS DOUBLE) + 0.5))
                       / (CAST(t_i AS DOUBLE) + 1.0) AS w0
              FROM tot),
            sym AS (
              SELECT na AS nk, nb AS op, n_g FROM pair
              UNION ALL
              SELECT nb AS nk, na AS op, n_g FROM pair),
            den AS (
              SELECT s.nk,
                     CAST(SUM(CAST(floor(CAST(s.n_g AS DOUBLE)
                       / (wi.w0 + wj.w0) * 1000000000) AS BIGINT))
                       AS BIGINT) AS d_nano
              FROM sym s
              JOIN w0 wi ON s.nk = wi.nk
              JOIN w0 wj ON s.op = wj.nk
              GROUP BY 1)
            SELECT n.n_name, t.t_i AS games, t.w_i AS wins,
                   CAST(floor(CAST(t.w_i AS DOUBLE)
                        / (CAST(d.d_nano AS DOUBLE) / 1e9)
                        * 1000000) AS BIGINT) AS w1_micro
            FROM tot t
            JOIN den d ON t.nk = d.nk
            JOIN nation n ON t.nk = n.n_nationkey
        """,
        "q377_yules_k": f"""
            WITH stc AS (
              SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
              FROM (SELECT source, unnest({_TOKS}) AS w FROM documents)
              GROUP BY 1, 2),
            per AS (
              SELECT source,
                     CAST(COUNT(*) AS BIGINT) AS vocab,
                     CAST(SUM(c) AS BIGINT) AS n_tokens,
                     CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
                          AS HUGEINT) AS sc2,
                     CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS f1
              FROM stc GROUP BY 1)
            SELECT source, vocab, n_tokens, f1,
                   CAST((CAST(10000000000 AS HUGEINT)
                         * (sc2 - CAST(n_tokens AS HUGEINT)))
                        // (CAST(n_tokens AS HUGEINT)
                            * CAST(n_tokens AS HUGEINT))
                        AS BIGINT) AS yules_k_micro,
                   f1 * 1000000 // n_tokens AS hapax_ppm
            FROM per
        """,
        "q378_sprt": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS x
              FROM orders GROUP BY 1),
            cum AS (
              SELECT day,
                     CAST(SUM(x) OVER w AS BIGINT) AS cx,
                     CAST(SUM(n) OVER w AS BIGINT) AS cn
              FROM daily
              WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW)),
            scored AS (
              SELECT day,
                     CAST(floor((CAST(cx AS DOUBLE) * ln(0.55 / 0.45)
                       + CAST(cn - cx AS DOUBLE) * ln(0.45 / 0.55))
                       * 1000000) AS BIGINT) AS llr_micro,
                     CASE WHEN CAST(cx AS DOUBLE) * ln(0.55 / 0.45)
                            + CAST(cn - cx AS DOUBLE) * ln(0.45 / 0.55)
                            > ln(19.0) THEN 1
                          WHEN CAST(cx AS DOUBLE) * ln(0.55 / 0.45)
                            + CAST(cn - cx AS DOUBLE) * ln(0.45 / 0.55)
                            < -ln(19.0) THEN -1
                          ELSE 0 END AS hit
              FROM cum)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   MIN(CASE WHEN hit = 1 THEN day END) AS first_h1_day,
                   MIN(CASE WHEN hit = -1 THEN day END)
                     AS first_h0_day,
                   CAST(SUM(CASE WHEN hit <> 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_boundary_days,
                   arg_max(llr_micro, day) AS final_llr_micro
            FROM scored
        """,
        "q379_brown_forsythe": """
            WITH obs AS MATERIALIZED (
              SELECT c.c_mktsegment,
                     CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
              FROM orders o JOIN customer c
                ON o.o_custkey = c.c_custkey),
            med AS (
              SELECT c_mktsegment,
                     CAST(median(cents) * 2 AS BIGINT) AS med2
              FROM obs GROUP BY 1),
            z AS (
              SELECT obs.c_mktsegment,
                     abs(2 * cents - med2) AS z2
              FROM obs JOIN med USING (c_mktsegment)),
            g AS (
              SELECT c_mktsegment,
                     CAST(COUNT(*) AS BIGINT) AS n_g,
                     CAST(SUM(z2) AS BIGINT) AS s1,
                     CAST(SUM(CAST(z2 AS HUGEINT) * CAST(z2 AS HUGEINT))
                          AS HUGEINT) AS s2
              FROM z GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                           CAST(SUM(s1) AS BIGINT) AS s1_all FROM g),
            terms AS (
              SELECT n,
                     CAST(floor(CAST(n_g AS DOUBLE)
                       * (CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE)
                          - CAST(s1_all AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE)
                          - CAST(s1_all AS DOUBLE) / CAST(n AS DOUBLE))
                       / 1e6) AS BIGINT) AS bt,
                     CAST(floor((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                         / CAST(n_g AS DOUBLE))
                       / 1e6) AS BIGINT) AS wt
              FROM g, tot),
            s AS (
              SELECT n, CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(bt) AS BIGINT) AS ssb_u,
                     CAST(SUM(wt) AS BIGINT) AS ssw_u
              FROM terms GROUP BY 1)
            SELECT n, k, ssb_u, ssw_u,
                   CAST(floor(CAST(ssb_u AS DOUBLE)
                        * CAST(n - 5 AS DOUBLE)
                        / (CAST(ssw_u AS DOUBLE) * 4.0)
                        * 1000000) AS BIGINT) AS f_micro,
                   CASE WHEN CAST(floor(CAST(ssb_u AS DOUBLE)
                          * CAST(n - 5 AS DOUBLE)
                          / (CAST(ssw_u AS DOUBLE) * 4.0)
                          * 1000000) AS BIGINT) > 2371900
                        THEN 1 ELSE 0 END AS heteroscedastic
            FROM s
        """,
        "q380_fairness_gaps": """
            WITH obs AS MATERIALIZED (
              SELECT c.c_mktsegment,
                     CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                     CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END
                       AS y
              FROM orders o JOIN customer c
                ON o.o_custkey = c.c_custkey),
            med AS (SELECT CAST(median(cents) * 2 AS BIGINT) AS med2
                    FROM obs),
            conf AS (
              SELECT c_mktsegment,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN 2 * cents > med2
                              THEN 1 ELSE 0 END) AS BIGINT) AS np,
                     CAST(SUM(y) AS BIGINT) AS ny,
                     CAST(SUM(CASE WHEN 2 * cents > med2
                              THEN y ELSE 0 END) AS BIGINT) AS tp,
                     CAST(SUM(CASE WHEN 2 * cents > med2
                              THEN 1 - y ELSE 0 END) AS BIGINT) AS fp
              FROM obs, med GROUP BY 1),
            rates AS (
              SELECT c_mktsegment,
                     np * 1000000 // n AS ppr_ppm,
                     tp * 1000000 // ny AS tpr_ppm,
                     fp * 1000000 // (n - ny) AS fpr_ppm
              FROM conf)
            SELECT MAX(ppr_ppm) - MIN(ppr_ppm) AS dp_gap_ppm,
                   MAX(tpr_ppm) - MIN(tpr_ppm) AS eo_tpr_gap_ppm,
                   MAX(fpr_ppm) - MIN(fpr_ppm) AS eo_fpr_gap_ppm,
                   MIN(ppr_ppm) * 1000000 // MAX(ppr_ppm)
                     AS di_ratio_ppm,
                   arg_min(c_mktsegment, ppr_ppm) AS least_favored,
                   arg_max(c_mktsegment, ppr_ppm) AS most_favored
            FROM rates
        """,
        "q381_pacf": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            base AS MATERIALIZED (
              SELECT day, CAST(rev AS DOUBLE) / 100.0 AS e FROM daily),
            stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                             CAST(SUM(CAST(floor(e) AS BIGINT))
                                  AS BIGINT) AS se_floor
                      FROM base),
            centered AS MATERIALIZED (
              SELECT day,
                     e - CAST(se_floor AS DOUBLE) / CAST(n AS DOUBLE)
                       AS d
              FROM base, stats),
            den AS (SELECT CAST(SUM(CAST(floor(d * d / 1000000.0)
                                    AS BIGINT)) AS BIGINT) AS den_sum
                    FROM centered),
            n1 AS (SELECT CAST(SUM(CAST(floor(d * dl / 1000000.0)
                                   AS BIGINT)) AS BIGINT) AS num1
                   FROM (SELECT d, LAG(d, 1) OVER (ORDER BY day) AS dl
                         FROM centered)
                   WHERE dl IS NOT NULL),
            n2 AS (SELECT CAST(SUM(CAST(floor(d * dl / 1000000.0)
                                   AS BIGINT)) AS BIGINT) AS num2
                   FROM (SELECT d, LAG(d, 2) OVER (ORDER BY day) AS dl
                         FROM centered)
                   WHERE dl IS NOT NULL),
            n3 AS (SELECT CAST(SUM(CAST(floor(d * dl / 1000000.0)
                                   AS BIGINT)) AS BIGINT) AS num3
                   FROM (SELECT d, LAG(d, 3) OVER (ORDER BY day) AS dl
                         FROM centered)
                   WHERE dl IS NOT NULL),
            r AS (
              SELECT CAST(num1 AS DOUBLE) / CAST(den_sum AS DOUBLE)
                       AS r1,
                     CAST(num2 AS DOUBLE) / CAST(den_sum AS DOUBLE)
                       AS r2,
                     CAST(num3 AS DOUBLE) / CAST(den_sum AS DOUBLE)
                       AS r3
              FROM n1, n2, n3, den),
            dl AS (
              SELECT r1, r2, r3,
                     (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22,
                     r1 * (1.0 - r2) / (1.0 - r1 * r1) AS p21
              FROM r)
            SELECT CAST(floor(r1 * 1000000) AS BIGINT) AS pacf1_micro,
                   CAST(floor(p22 * 1000000) AS BIGINT) AS pacf2_micro,
                   CAST(floor((r3 - p21 * r2 - p22 * r1)
                        / (1.0 - p21 * r1 - p22 * r2) * 1000000)
                        AS BIGINT) AS pacf3_micro
            FROM dl
        """,
        "q382_cochrans_q": """
            WITH per AS (
              SELECT o_custkey,
                     MAX(CASE WHEN year(CAST(o_orderdate AS DATE))
                         = 1993 THEN 1 ELSE 0 END) AS x1993,
                     MAX(CASE WHEN year(CAST(o_orderdate AS DATE))
                         = 1994 THEN 1 ELSE 0 END) AS x1994,
                     MAX(CASE WHEN year(CAST(o_orderdate AS DATE))
                         = 1995 THEN 1 ELSE 0 END) AS x1995
              FROM orders GROUP BY 1),
            s AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
                     CAST(SUM(x1993) AS BIGINT) AS c1,
                     CAST(SUM(x1994) AS BIGINT) AS c2,
                     CAST(SUM(x1995) AS BIGINT) AS c3,
                     CAST(SUM(x1993 + x1994 + x1995) AS BIGINT) AS sr,
                     CAST(SUM((x1993 + x1994 + x1995)
                              * (x1993 + x1994 + x1995)) AS BIGINT)
                       AS sr2
              FROM per)
            SELECT n_subjects, c1, c2, c3,
                   CAST(floor(CAST(2 * (3 * (c1*c1 + c2*c2 + c3*c3)
                          - (c1 + c2 + c3) * (c1 + c2 + c3))
                        AS DOUBLE)
                        / CAST(3 * sr - sr2 AS DOUBLE)
                        * 1000000) AS BIGINT) AS q_micro,
                   CASE WHEN CAST(floor(CAST(2 * (3 * (c1*c1 + c2*c2
                          + c3*c3) - (c1 + c2 + c3) * (c1 + c2 + c3))
                        AS DOUBLE)
                        / CAST(3 * sr - sr2 AS DOUBLE)
                        * 1000000) AS BIGINT) > 5991465
                        THEN 1 ELSE 0 END AS significant
            FROM s
        """,
        "q383_cliffs_delta": """
            WITH cust AS (
              SELECT c_custkey,
                     CASE WHEN c_mktsegment = 'BUILDING'
                          THEN 1 ELSE 0 END AS g
              FROM customer
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
            obs AS (
              SELECT g,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
              FROM orders o JOIN cust c ON o.o_custkey = c.c_custkey),
            byval AS (
              SELECT cents, CAST(SUM(g) AS BIGINT) AS n1v,
                     CAST(COUNT(*) AS BIGINT) AS nv
              FROM obs GROUP BY 1),
            ranked AS (
              SELECT n1v, nv,
                     COALESCE(CAST(SUM(nv) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS BIGINT), 0) AS cumb
              FROM byval),
            s AS (
              SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
                     CAST(SUM(nv - n1v) AS BIGINT) AS n2,
                     CAST(SUM(CAST(n1v AS HUGEINT)
                          * (2 * cumb + nv + 1)) AS HUGEINT) AS r1x2
              FROM ranked)
            , f AS (
              SELECT n1, n2,
                     (CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE)
                      * (CAST(n1 AS DOUBLE) + 1.0)) AS u1x2
              FROM s)
            SELECT n1, n2,
                   CAST(floor((u1x2 / (CAST(n1 AS DOUBLE)
                        * CAST(n2 AS DOUBLE)) - 1.0) * 1000000)
                        AS BIGINT) AS delta_micro,
                   CAST(floor(u1x2 / (2.0 * CAST(n1 AS DOUBLE)
                        * CAST(n2 AS DOUBLE)) * 1000000)
                        AS BIGINT) AS a12_micro,
                   CASE WHEN abs(u1x2 / (CAST(n1 AS DOUBLE)
                          * CAST(n2 AS DOUBLE)) - 1.0) < 0.147
                          THEN 'negligible'
                        WHEN abs(u1x2 / (CAST(n1 AS DOUBLE)
                          * CAST(n2 AS DOUBLE)) - 1.0) < 0.33
                          THEN 'small'
                        WHEN abs(u1x2 / (CAST(n1 AS DOUBLE)
                          * CAST(n2 AS DOUBLE)) - 1.0) < 0.474
                          THEN 'medium'
                        ELSE 'large' END AS magnitude
            FROM f
        """,
        "q384_runs_test": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            med AS (SELECT CAST(median(rev) * 2 AS BIGINT) AS med2
                    FROM daily),
            signed AS (
              SELECT day,
                     CASE WHEN 2 * rev > med2 THEN 1 ELSE 0 END AS s
              FROM daily, med),
            runs AS (
              SELECT s,
                     CASE WHEN LAG(s, 1) OVER (ORDER BY day) IS NULL
                            OR LAG(s, 1) OVER (ORDER BY day) <> s
                          THEN 1 ELSE 0 END AS new_run
              FROM signed),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(s) AS BIGINT) AS n1,
                     CAST(SUM(1 - s) AS BIGINT) AS n0,
                     CAST(SUM(new_run) AS BIGINT) AS r
              FROM runs)
            SELECT n, n1, n0, r,
                   CAST(floor((2.0 * CAST(n1 AS DOUBLE)
                        * CAST(n0 AS DOUBLE) / CAST(n AS DOUBLE)
                        + 1.0) * 1000000) AS BIGINT) AS er_micro,
                   CAST(floor((CAST(r AS DOUBLE)
                        - (2.0 * CAST(n1 AS DOUBLE)
                           * CAST(n0 AS DOUBLE) / CAST(n AS DOUBLE)
                           + 1.0))
                        / sqrt(2.0 * CAST(n1 AS DOUBLE)
                          * CAST(n0 AS DOUBLE)
                          * (2.0 * CAST(n1 AS DOUBLE)
                             * CAST(n0 AS DOUBLE) - CAST(n AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                             * (CAST(n AS DOUBLE) - 1.0)))
                        * 1000000) AS BIGINT) AS z_micro,
                   CASE WHEN abs((CAST(r AS DOUBLE)
                          - (2.0 * CAST(n1 AS DOUBLE)
                             * CAST(n0 AS DOUBLE) / CAST(n AS DOUBLE)
                             + 1.0))
                          / sqrt(2.0 * CAST(n1 AS DOUBLE)
                            * CAST(n0 AS DOUBLE)
                            * (2.0 * CAST(n1 AS DOUBLE)
                               * CAST(n0 AS DOUBLE)
                               - CAST(n AS DOUBLE))
                            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                               * (CAST(n AS DOUBLE) - 1.0))))
                          > 1.96
                        THEN 1 ELSE 0 END AS nonrandom
            FROM agg
        """,
        "q385_kupiec_pof": """
            WITH daily AS MATERIALIZED (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            ranked AS (
              SELECT rev,
                     ROW_NUMBER() OVER (ORDER BY rev, day) AS rk
              FROM daily),
            n_total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                        FROM daily),
            thr AS (
              SELECT rev AS var_floor
              FROM ranked, n_total
              WHERE rk = CAST(ceil(0.05 * n) AS BIGINT)),
            x AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN rev <= var_floor
                              THEN 1 ELSE 0 END) AS BIGINT) AS x,
                     CAST(MIN(var_floor) AS BIGINT) AS var_floor
              FROM daily, thr)
            SELECT n, x, var_floor,
                   CAST(floor(-2.0 * (
                     (CAST(n AS DOUBLE) - CAST(x AS DOUBLE)) * ln(0.95)
                     + CAST(x AS DOUBLE) * ln(0.05)
                     - ((CAST(n AS DOUBLE) - CAST(x AS DOUBLE))
                        * ln(1.0 - CAST(x AS DOUBLE)
                             / CAST(n AS DOUBLE))
                        + CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE)
                             / CAST(n AS DOUBLE))))
                     * 1000000) AS BIGINT) AS lr_micro,
                   CASE WHEN CAST(floor(-2.0 * (
                       (CAST(n AS DOUBLE) - CAST(x AS DOUBLE))
                         * ln(0.95)
                       + CAST(x AS DOUBLE) * ln(0.05)
                       - ((CAST(n AS DOUBLE) - CAST(x AS DOUBLE))
                          * ln(1.0 - CAST(x AS DOUBLE)
                               / CAST(n AS DOUBLE))
                          + CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE)
                               / CAST(n AS DOUBLE))))
                       * 1000000) AS BIGINT) > 3841459
                        THEN 1 ELSE 0 END AS reject_model
            FROM x
        """,
        "q386_hurst_rs": """
            WITH daily AS MATERIALIZED (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            pre16 AS (
              SELECT day // 16 AS b, rev,
                     CAST(SUM(rev) OVER w AS BIGINT) AS crev,
                     CAST(COUNT(*) OVER w AS BIGINT) AS t
              FROM daily
              WINDOW w AS (PARTITION BY day // 16 ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)),
            g16 AS (
              SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt,
                     CAST(SUM(rev) AS BIGINT) AS s1,
                     CAST(SUM(CAST(rev AS HUGEINT)
                          * CAST(rev AS HUGEINT)) AS HUGEINT) AS s2
              FROM pre16 GROUP BY 1),
            pb16 AS (
              SELECT p.b, g.cnt, g.s1, g.s2,
                     CAST(g.s1 AS DOUBLE) / CAST(g.cnt AS DOUBLE)
                       AS mu,
                     MAX(CAST(p.crev AS DOUBLE) - CAST(p.t AS DOUBLE)
                         * (CAST(g.s1 AS DOUBLE)
                            / CAST(g.cnt AS DOUBLE))) AS mx,
                     MIN(CAST(p.crev AS DOUBLE) - CAST(p.t AS DOUBLE)
                         * (CAST(g.s1 AS DOUBLE)
                            / CAST(g.cnt AS DOUBLE))) AS mn
              FROM pre16 p JOIN g16 g ON p.b = g.b
              WHERE g.cnt = 16
              GROUP BY 1, 2, 3, 4, 5),
            a16 AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k16,
                     CAST(SUM(CAST(floor((mx - mn) / 100.0
                       / (sqrt(CAST(s2 AS DOUBLE)
                               / CAST(cnt AS DOUBLE) - mu * mu)
                          / 100.0)
                       * 1000000) AS BIGINT)) AS BIGINT) AS srs16
              FROM pb16),
            pre64 AS (
              SELECT day // 64 AS b, rev,
                     CAST(SUM(rev) OVER w AS BIGINT) AS crev,
                     CAST(COUNT(*) OVER w AS BIGINT) AS t
              FROM daily
              WINDOW w AS (PARTITION BY day // 64 ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)),
            g64 AS (
              SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt,
                     CAST(SUM(rev) AS BIGINT) AS s1,
                     CAST(SUM(CAST(rev AS HUGEINT)
                          * CAST(rev AS HUGEINT)) AS HUGEINT) AS s2
              FROM pre64 GROUP BY 1),
            pb64 AS (
              SELECT p.b, g.cnt, g.s1, g.s2,
                     CAST(g.s1 AS DOUBLE) / CAST(g.cnt AS DOUBLE)
                       AS mu,
                     MAX(CAST(p.crev AS DOUBLE) - CAST(p.t AS DOUBLE)
                         * (CAST(g.s1 AS DOUBLE)
                            / CAST(g.cnt AS DOUBLE))) AS mx,
                     MIN(CAST(p.crev AS DOUBLE) - CAST(p.t AS DOUBLE)
                         * (CAST(g.s1 AS DOUBLE)
                            / CAST(g.cnt AS DOUBLE))) AS mn
              FROM pre64 p JOIN g64 g ON p.b = g.b
              WHERE g.cnt = 64
              GROUP BY 1, 2, 3, 4, 5),
            a64 AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k64,
                     CAST(SUM(CAST(floor((mx - mn) / 100.0
                       / (sqrt(CAST(s2 AS DOUBLE)
                               / CAST(cnt AS DOUBLE) - mu * mu)
                          / 100.0)
                       * 1000000) AS BIGINT)) AS BIGINT) AS srs64
              FROM pb64)
            SELECT k16, k64,
                   CAST(floor(CAST(srs16 AS DOUBLE)
                        / CAST(k16 AS DOUBLE)) AS BIGINT)
                     AS rs16_micro,
                   CAST(floor(CAST(srs64 AS DOUBLE)
                        / CAST(k64 AS DOUBLE)) AS BIGINT)
                     AS rs64_micro,
                   CAST(floor(ln((CAST(srs64 AS DOUBLE)
                          / CAST(k64 AS DOUBLE))
                        / (CAST(srs16 AS DOUBLE)
                           / CAST(k16 AS DOUBLE)))
                        / ln(4.0) * 1000000) AS BIGINT)
                     AS hurst_micro
            FROM a16, a64
        """,
        "q387_join_strategy_advisor": """
            WITH st AS (
              SELECT 'lineitem' AS t, CAST(COUNT(*) AS BIGINT) AS rows_,
                     CAST(SUM(strlen(CAST(l_orderkey AS VARCHAR))
                       + strlen(CAST(l_partkey AS VARCHAR))
                       + strlen(CAST(l_suppkey AS VARCHAR))
                       + strlen(CAST(CAST(l_extendedprice
                           AS DECIMAL(18,2)) AS VARCHAR)))
                       AS BIGINT) AS bytes_
              FROM lineitem
              UNION ALL
              SELECT 'orders', CAST(COUNT(*) AS BIGINT),
                     CAST(SUM(strlen(CAST(o_orderkey AS VARCHAR))
                       + strlen(CAST(o_custkey AS VARCHAR))
                       + strlen(CAST(CAST(o_totalprice
                           AS DECIMAL(18,2)) AS VARCHAR)))
                       AS BIGINT)
              FROM orders
              UNION ALL
              SELECT 'customer', CAST(COUNT(*) AS BIGINT),
                     CAST(SUM(strlen(CAST(c_custkey AS VARCHAR))
                       + strlen(CAST(c_nationkey AS VARCHAR))
                       + strlen(CAST(c_mktsegment AS VARCHAR)))
                       AS BIGINT)
              FROM customer
              UNION ALL
              SELECT 'part', CAST(COUNT(*) AS BIGINT),
                     CAST(SUM(strlen(CAST(p_partkey AS VARCHAR))
                       + strlen(CAST(p_type AS VARCHAR))
                       + strlen(CAST(p_brand AS VARCHAR)))
                       AS BIGINT)
              FROM part
              UNION ALL
              SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
                     CAST(SUM(strlen(CAST(s_suppkey AS VARCHAR))
                       + strlen(CAST(s_nationkey AS VARCHAR)))
                       AS BIGINT)
              FROM supplier
              UNION ALL
              SELECT 'nation', CAST(COUNT(*) AS BIGINT),
                     CAST(SUM(strlen(CAST(n_nationkey AS VARCHAR))
                       + strlen(CAST(n_name AS VARCHAR)))
                       AS BIGINT)
              FROM nation),
            edges(big, small) AS (VALUES
              ('lineitem', 'orders'), ('lineitem', 'part'),
              ('lineitem', 'supplier'), ('orders', 'customer'),
              ('customer', 'nation'))
            SELECT l.t || ' JOIN ' || r.t AS join_edge,
                   l.rows_ AS n_rows_big, r.rows_ AS n_rows_small,
                   CASE WHEN least(l.bytes_, r.bytes_) < 10485760
                        THEN 'broadcast' ELSE 'shuffle' END
                     AS strategy,
                   least(l.bytes_, r.bytes_) * 32
                     AS broadcast_moved_bytes,
                   l.bytes_ + r.bytes_ AS shuffle_moved_bytes,
                   CASE WHEN least(l.bytes_, r.bytes_) < 10485760
                        THEN l.bytes_ + r.bytes_
                             - least(l.bytes_, r.bytes_) * 32
                        ELSE 0 END AS savings_bytes
            FROM edges e
            JOIN st l ON l.t = e.big
            JOIN st r ON r.t = e.small
        """,
        "q388_price_elasticity": """
            WITH t AS (
              SELECT p.p_brand,
                     CAST(floor(ln(CAST(CAST(l.l_extendedprice
                         AS DECIMAL(18,2)) AS DOUBLE)
                       / CAST(l.l_quantity AS DOUBLE))
                       * 1000000000) AS BIGINT) AS x,
                     CAST(floor(ln(CAST(l.l_quantity AS DOUBLE))
                       * 1000000000) AS BIGINT) AS y,
                     CAST(floor(ln(CAST(CAST(l.l_extendedprice
                         AS DECIMAL(18,2)) AS DOUBLE)
                       / CAST(l.l_quantity AS DOUBLE))
                       * ln(CAST(CAST(l.l_extendedprice
                         AS DECIMAL(18,2)) AS DOUBLE)
                       / CAST(l.l_quantity AS DOUBLE))
                       * 1000000000) AS BIGINT) AS xx,
                     CAST(floor(ln(CAST(CAST(l.l_extendedprice
                         AS DECIMAL(18,2)) AS DOUBLE)
                       / CAST(l.l_quantity AS DOUBLE))
                       * ln(CAST(l.l_quantity AS DOUBLE))
                       * 1000000000) AS BIGINT) AS xy
              FROM lineitem l JOIN part p
                ON l.l_partkey = p.p_partkey),
            g AS (
              SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                     CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                     CAST(SUM(CAST(xx AS HUGEINT)) AS HUGEINT) AS sxx,
                     CAST(SUM(CAST(xy AS HUGEINT)) AS HUGEINT) AS sxy
              FROM t GROUP BY 1),
            f AS (
              SELECT p_brand, n,
                     (CAST(n AS DOUBLE)
                        * (CAST(sxy AS DOUBLE) / 1e9)
                      - (CAST(sx AS DOUBLE) / 1e9)
                        * (CAST(sy AS DOUBLE) / 1e9))
                     / (CAST(n AS DOUBLE)
                          * (CAST(sxx AS DOUBLE) / 1e9)
                        - (CAST(sx AS DOUBLE) / 1e9)
                          * (CAST(sx AS DOUBLE) / 1e9)) AS slope
              FROM g)
            SELECT p_brand, n,
                   CAST(floor(slope * 1000000) AS BIGINT)
                     AS elasticity_micro,
                   CASE WHEN CAST(floor(slope * 1000000) AS BIGINT)
                        < -1000000 THEN 1 ELSE 0 END AS elastic
            FROM f
        """,
        "q389_fisher_price_index": """
            WITH per AS MATERIALIZED (
              SELECT year(CAST(l_shipdate AS DATE)) AS yr, l_partkey,
                     CAST(SUM(CAST(CAST(l_extendedprice
                         AS DECIMAL(18,2)) * 100 AS BIGINT))
                       AS BIGINT) AS spend,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS qty
              FROM lineitem GROUP BY 1, 2),
            base AS (
              SELECT l_partkey, spend AS spend0, qty AS qty0
              FROM per WHERE yr = 1995),
            j AS (
              SELECT p.yr,
                     CAST(floor(CAST(p.spend AS DOUBLE)
                       * CAST(b.qty0 AS DOUBLE)
                       / CAST(p.qty AS DOUBLE) * 1000000) AS BIGINT)
                       AS lnum,
                     CAST(b.spend0 AS HUGEINT) * 1000000 AS lden,
                     CAST(p.spend AS HUGEINT) * 1000000 AS pnum,
                     CAST(floor(CAST(b.spend0 AS DOUBLE)
                       * CAST(p.qty AS DOUBLE)
                       / CAST(b.qty0 AS DOUBLE) * 1000000) AS BIGINT)
                       AS pden
              FROM per p JOIN base b ON p.l_partkey = b.l_partkey
              WHERE p.yr <> 1995),
            g AS (
              SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_parts,
                     CAST(SUM(CAST(lnum AS HUGEINT)) AS HUGEINT)
                       AS ln_,
                     CAST(SUM(lden) AS HUGEINT) AS ld_,
                     CAST(SUM(pnum) AS HUGEINT) AS pn_,
                     CAST(SUM(CAST(pden AS HUGEINT)) AS HUGEINT)
                       AS pd_
              FROM j GROUP BY 1)
            SELECT yr, n_parts,
                   CAST(floor(CAST(ln_ AS DOUBLE)
                        / CAST(ld_ AS DOUBLE) * 1000000) AS BIGINT)
                     AS laspeyres_ppm,
                   CAST(floor(CAST(pn_ AS DOUBLE)
                        / CAST(pd_ AS DOUBLE) * 1000000) AS BIGINT)
                     AS paasche_ppm,
                   CAST(floor(sqrt((CAST(ln_ AS DOUBLE)
                          / CAST(ld_ AS DOUBLE))
                        * (CAST(pn_ AS DOUBLE)
                           / CAST(pd_ AS DOUBLE))) * 1000000)
                        AS BIGINT) AS fisher_ppm
            FROM g
        """,
        "q390_kneser_ney_continuation": f"""
            WITH toks AS MATERIALIZED (
              SELECT doc_id, pos - 1 AS pos, w
              FROM (SELECT doc_id,
                           generate_subscripts(arr, 1) AS pos,
                           unnest(arr) AS w
                    FROM (SELECT doc_id, {_TOKS} AS arr
                          FROM documents))),
            bigrams AS MATERIALIZED (
              SELECT DISTINCT n.w AS prev, t.w
              FROM toks t
              JOIN (SELECT doc_id, pos + 1 AS pos, w FROM toks) n
                ON t.doc_id = n.doc_id AND t.pos = n.pos),
            cont AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_ctx
                     FROM bigrams GROUP BY 1),
            uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
                    FROM toks GROUP BY 1),
            tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT)
                            FROM bigrams) AS n_bi,
                           (SELECT CAST(COUNT(*) AS BIGINT)
                            FROM toks) AS n_tok),
            ranked AS (
              SELECT u.w, u.c, COALESCE(ct.n_ctx, 0) AS n_ctx,
                     n_bi, n_tok,
                     ROW_NUMBER() OVER (ORDER BY u.c DESC, u.w) AS rk
              FROM uni u LEFT JOIN cont ct ON u.w = ct.w, tot)
            SELECT w, c, n_ctx,
                   c * 1000000 // n_tok AS mle_ppm,
                   n_ctx * 1000000 // n_bi AS cont_ppm,
                   (c * 1000000 // n_tok) - (n_ctx * 1000000 // n_bi)
                     AS overweight_ppm
            FROM ranked WHERE rk <= 20
        """,
        "q391_gumbel_block_maxima": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            blocks AS (
              SELECT day // 32 AS b, CAST(MAX(rev) AS BIGINT) AS mx,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM daily GROUP BY 1),
            s AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(mx) AS BIGINT) AS s1,
                     CAST(SUM(CAST(mx AS HUGEINT)
                          * CAST(mx AS HUGEINT)) AS HUGEINT) AS s2
              FROM blocks WHERE cnt = 32),
            f AS (
              SELECT k,
                     CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) / 100.0
                       AS mean,
                     sqrt((CAST(s2 AS DOUBLE) / CAST(k AS DOUBLE)
                           / 10000.0
                           - (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)
                              / 100.0)
                             * (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)
                                / 100.0)) * 6.0)
                       / 3.141592653589793 AS beta
              FROM s)
            SELECT k,
                   CAST(floor(mean) AS BIGINT) AS mean_max_usd,
                   CAST(floor(beta) AS BIGINT) AS beta_usd,
                   CAST(floor(mean - 0.5772156649015329 * beta)
                        AS BIGINT) AS mu_usd,
                   CAST(floor(mean - 0.5772156649015329 * beta
                        - beta * ln(-ln(1.0 - 1.0 / 100.0)))
                        AS BIGINT) AS return_level_100_usd
            FROM f
        """,
        "q392_session_timeout_sensitivity": """
            WITH gaps AS (
              SELECT user_id,
                     epoch_ns(ts)
                       - lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY epoch_ns(ts))
                       AS gap_ns
              FROM events),
            agg AS (
              SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
                       AS n_users,
                     CAST(COUNT(*) AS BIGINT) AS n_events,
                     CAST(SUM(CASE WHEN gap_ns > 5 * 60000000000
                              THEN 1 ELSE 0 END) AS BIGINT) AS brk5,
                     CAST(SUM(CASE WHEN gap_ns > 15 * 60000000000
                              THEN 1 ELSE 0 END) AS BIGINT) AS brk15,
                     CAST(SUM(CASE WHEN gap_ns > 30 * 60000000000
                              THEN 1 ELSE 0 END) AS BIGINT) AS brk30,
                     CAST(SUM(CASE WHEN gap_ns > 60 * 60000000000
                              THEN 1 ELSE 0 END) AS BIGINT) AS brk60
              FROM gaps)
            SELECT n_users, n_events,
                   n_users + brk5 AS sessions_5m,
                   n_users + brk15 AS sessions_15m,
                   n_users + brk30 AS sessions_30m,
                   n_users + brk60 AS sessions_60m,
                   ((n_users + brk15) - (n_users + brk60)) * 1000000
                     // (n_users + brk30) AS sensitivity_ppm
            FROM agg
        """,
        "q393_negbin_fit": """
            WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2),
            g AS (
              SELECT event_type,
                     CAST(COUNT(*) AS BIGINT) AS n_days,
                     CAST(SUM(c) AS BIGINT) AS s1,
                     CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
                          AS HUGEINT) AS s2
              FROM daily GROUP BY 1),
            f AS (
              SELECT event_type, n_days,
                     CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE) AS m,
                     CAST(s2 AS DOUBLE) / CAST(n_days AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
                         * (CAST(s1 AS DOUBLE)
                            / CAST(n_days AS DOUBLE)) AS var
              FROM g)
            SELECT event_type, n_days,
                   CAST(floor(m * 1000000) AS BIGINT) AS mean_micro,
                   CAST(floor(var * 1000000) AS BIGINT) AS var_micro,
                   CASE WHEN var > m THEN 1 ELSE 0 END
                     AS overdispersed,
                   CASE WHEN var > m THEN CAST(floor(m * m
                        / (var - m) * 1000000) AS BIGINT) END
                     AS nb_r_micro,
                   CASE WHEN var > m THEN CAST(floor(m / var
                        * 1000000) AS BIGINT) END AS nb_p_micro
            FROM f
        """,
        "q394_taylors_law": """
            WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2),
            g AS (
              SELECT event_type,
                     CAST(COUNT(*) AS BIGINT) AS n_days,
                     CAST(SUM(c) AS BIGINT) AS s1,
                     CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
                          AS HUGEINT) AS s2
              FROM daily GROUP BY 1),
            f AS (
              SELECT CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE) AS m,
                     CAST(s2 AS DOUBLE) / CAST(n_days AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
                         * (CAST(s1 AS DOUBLE)
                            / CAST(n_days AS DOUBLE)) AS var
              FROM g),
            t AS (
              SELECT CAST(floor(ln(m) * 1000000000) AS BIGINT) AS x,
                     CAST(floor(ln(var) * 1000000000) AS BIGINT) AS y,
                     CAST(floor(ln(m) * ln(m) * 1000000000)
                          AS BIGINT) AS xx,
                     CAST(floor(ln(m) * ln(var) * 1000000000)
                          AS BIGINT) AS xy
              FROM f WHERE var > 0),
            s AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(xx) AS BIGINT) AS sxx,
                     CAST(SUM(xy) AS BIGINT) AS sxy
              FROM t),
            r AS (
              SELECT k,
                     (CAST(k AS DOUBLE)
                        * (CAST(sxy AS DOUBLE) / 1e9)
                      - (CAST(sx AS DOUBLE) / 1e9)
                        * (CAST(sy AS DOUBLE) / 1e9))
                     / (CAST(k AS DOUBLE)
                          * (CAST(sxx AS DOUBLE) / 1e9)
                        - (CAST(sx AS DOUBLE) / 1e9)
                          * (CAST(sx AS DOUBLE) / 1e9)) AS b,
                     CAST(sx AS DOUBLE) / 1e9 AS sxd,
                     CAST(sy AS DOUBLE) / 1e9 AS syd
              FROM s)
            SELECT k,
                   CAST(floor(b * 1000000) AS BIGINT) AS slope_micro,
                   CAST(floor((syd - b * sxd) / CAST(k AS DOUBLE)
                        * 1000000) AS BIGINT) AS intercept_micro,
                   CASE WHEN CAST(floor(b * 1000000) AS BIGINT)
                        > 1500000 THEN 1 ELSE 0 END AS bursty
            FROM r
        """,
        "q395_term_burstiness": f"""
            WITH dt AS (
              SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
              FROM (SELECT doc_id, unnest({_TOKS}) AS w
                    FROM documents)
              GROUP BY 1, 2),
            term AS (
              SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
                     CAST(SUM(c) AS BIGINT) AS cf
              FROM dt GROUP BY 1),
            nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
                   FROM documents),
            ranked AS (
              SELECT w, df, cf, n_docs,
                     ROW_NUMBER() OVER (ORDER BY df DESC, w) AS rk
              FROM term, nd)
            SELECT w, df, cf,
                   cf * 1000000 // df AS burstiness_ppm,
                   df * 1000000 // n_docs AS doc_rate_ppm
            FROM ranked WHERE rk <= 20
        """,
        "q396_v_measure": """
            WITH cells AS MATERIALIZED (
              SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
              FROM documents GROUP BY 1, 2),
            rowm AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rm
                     FROM cells GROUP BY 1),
            colm AS (SELECT source, CAST(SUM(o) AS BIGINT) AS cm
                     FROM cells GROUP BY 1),
            tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
            hl AS (SELECT CAST(SUM(CAST(floor(CAST(rm AS DOUBLE)
                     * ln(CAST(rm AS DOUBLE) / CAST(n AS DOUBLE))
                     / 1e3) AS BIGINT)) AS BIGINT) AS sl
                   FROM rowm, tot),
            hs AS (SELECT CAST(SUM(CAST(floor(CAST(cm AS DOUBLE)
                     * ln(CAST(cm AS DOUBLE) / CAST(n AS DOUBLE))
                     / 1e3) AS BIGINT)) AS BIGINT) AS ss
                   FROM colm, tot),
            hj AS (SELECT CAST(SUM(CAST(floor(CAST(o AS DOUBLE)
                     * ln(CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                     / 1e3) AS BIGINT)) AS BIGINT) AS sj
                   FROM cells, tot),
            f AS (
              SELECT n,
                     1.0 - (-CAST(sj AS DOUBLE) - -CAST(ss AS DOUBLE))
                       / (-CAST(sl AS DOUBLE)) AS hom,
                     1.0 - (-CAST(sj AS DOUBLE) - -CAST(sl AS DOUBLE))
                       / (-CAST(ss AS DOUBLE)) AS com
              FROM hl, hs, hj, tot)
            SELECT n,
                   CAST(floor(hom * 1000000) AS BIGINT)
                     AS homogeneity_micro,
                   CAST(floor(com * 1000000) AS BIGINT)
                     AS completeness_micro,
                   CAST(floor(2.0 * hom * com / (hom + com)
                        * 1000000) AS BIGINT) AS v_measure_micro
            FROM f
        """,
        "q397_permutation_test": _q397_sql(),
        "q398_partial_correlation": """
            WITH t AS (
              SELECT CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)
                       AS x,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS y,
                     CAST(l_quantity AS BIGINT) AS z
              FROM lineitem),
            mom AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                     CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                     CAST(SUM(CAST(z AS HUGEINT)) AS HUGEINT) AS sz,
                     CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                          AS HUGEINT) AS sxx,
                     CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                          AS HUGEINT) AS syy,
                     CAST(SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT))
                          AS HUGEINT) AS szz,
                     CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                          AS HUGEINT) AS sxy,
                     CAST(SUM(CAST(x AS HUGEINT) * CAST(z AS HUGEINT))
                          AS HUGEINT) AS sxz,
                     CAST(SUM(CAST(y AS HUGEINT) * CAST(z AS HUGEINT))
                          AS HUGEINT) AS syz
              FROM t),
            r AS (
              SELECT n,
                     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)
                                 * CAST(sy AS DOUBLE))) AS rxy,
                     (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                               - CAST(sz AS DOUBLE)
                                 * CAST(sz AS DOUBLE))) AS rxz,
                     (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                               - CAST(sz AS DOUBLE)
                                 * CAST(sz AS DOUBLE))) AS ryz
              FROM mom)
            SELECT n,
                   CAST(floor(rxy * 1000000) AS BIGINT) AS r_xy_micro,
                   CAST(floor(rxz * 1000000) AS BIGINT) AS r_xz_micro,
                   CAST(floor(ryz * 1000000) AS BIGINT) AS r_yz_micro,
                   CAST(floor((rxy - rxz * ryz)
                        / sqrt((1.0 - rxz * rxz)
                               * (1.0 - ryz * ryz)) * 1000000)
                        AS BIGINT) AS partial_r_micro
            FROM r
        """,
        "q399_weibull_fit": """
            WITH byval AS (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents,
                     CAST(COUNT(*) AS BIGINT) AS nv
              FROM orders GROUP BY 1),
            cum AS (
              SELECT cents, CAST(SUM(nv) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS r
              FROM byval),
            tot AS (SELECT CAST(SUM(nv) AS BIGINT) AS n FROM byval),
            t AS (
              SELECT CAST(floor(ln(CAST(cents AS DOUBLE) / 100.0)
                       * 1000000000) AS BIGINT) AS x,
                     CAST(floor(ln(-ln(1.0 - (CAST(r AS DOUBLE) - 0.3)
                       / (CAST(n AS DOUBLE) + 0.4)))
                       * 1000000000) AS BIGINT) AS y,
                     CAST(floor(ln(CAST(cents AS DOUBLE) / 100.0)
                       * ln(CAST(cents AS DOUBLE) / 100.0)
                       * 1000000000) AS BIGINT) AS xx,
                     CAST(floor(ln(CAST(cents AS DOUBLE) / 100.0)
                       * ln(-ln(1.0 - (CAST(r AS DOUBLE) - 0.3)
                         / (CAST(n AS DOUBLE) + 0.4)))
                       * 1000000000) AS BIGINT) AS xy
              FROM cum, tot),
            s AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                     CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                     CAST(SUM(CAST(xx AS HUGEINT)) AS HUGEINT) AS sxx,
                     CAST(SUM(CAST(xy AS HUGEINT)) AS HUGEINT) AS sxy
              FROM t),
            f AS (
              SELECT k,
                     (CAST(k AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                      - (CAST(sx AS DOUBLE) / 1e9)
                        * (CAST(sy AS DOUBLE) / 1e9))
                     / (CAST(k AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                        - (CAST(sx AS DOUBLE) / 1e9)
                          * (CAST(sx AS DOUBLE) / 1e9)) AS shape,
                     CAST(sx AS DOUBLE) / 1e9 AS sxd,
                     CAST(sy AS DOUBLE) / 1e9 AS syd
              FROM s)
            SELECT k,
                   CAST(floor(shape * 1000000) AS BIGINT)
                     AS shape_micro,
                   CAST(floor(-((syd - shape * sxd)
                        / CAST(k AS DOUBLE)) / shape * 1000000)
                        AS BIGINT) AS ln_lambda_micro,
                   CASE WHEN CAST(floor(shape * 1000000) AS BIGINT)
                        > 1000000 THEN 1 ELSE 0 END
                     AS wear_out_regime
            FROM f
        """,
        "q400_source_loo_value": """
            WITH per AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
                     CAST(SUM(CASE WHEN length(text) > 0 THEN
                       CAST(floor(
                       length(regexp_replace(text,
                         '[^a-zA-Z0-9 ]', '', 'g')) / length(text)
                       * 1000000) AS BIGINT) END) AS BIGINT) AS sum_s
              FROM documents GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n,
                           CAST(SUM(sum_s) AS BIGINT) AS sum_all
                    FROM per)
            SELECT source, n_s,
                   CAST(floor(CAST(sum_all AS DOUBLE)
                        / CAST(n AS DOUBLE)) AS BIGINT)
                     AS mean_all_ppm,
                   CAST(floor(CAST(sum_all - sum_s AS DOUBLE)
                        / CAST(n - n_s AS DOUBLE)) AS BIGINT)
                     AS mean_loo_ppm,
                   CAST(floor(CAST(sum_all - sum_s AS DOUBLE)
                        / CAST(n - n_s AS DOUBLE)
                        - CAST(sum_all AS DOUBLE) / CAST(n AS DOUBLE))
                        AS BIGINT) AS delta_ppm,
                   CASE WHEN CAST(sum_all - sum_s AS DOUBLE)
                          / CAST(n - n_s AS DOUBLE)
                          > CAST(sum_all AS DOUBLE) / CAST(n AS DOUBLE)
                        THEN 1 ELSE 0 END AS drags_quality
            FROM per, tot
        """,
        "q401_youden_j": """
            WITH vals AS (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS s,
                     CAST(COUNT(*) AS BIGINT) AS cnt,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS cpos
              FROM orders GROUP BY 1),
            cum AS (
              SELECT s,
                     COALESCE(CAST(SUM(cnt) OVER w AS BIGINT), 0)
                       AS ca,
                     COALESCE(CAST(SUM(cpos) OVER w AS BIGINT), 0)
                       AS cp
              FROM vals
              WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED
                           PRECEDING AND 1 PRECEDING)),
            tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                           CAST(SUM(cpos) AS BIGINT) AS n1
                    FROM vals),
            scored AS (
              SELECT s, n, n1,
                     CAST(floor((CAST(n1 - cp AS DOUBLE)
                          / CAST(n1 AS DOUBLE)
                        - CAST((n - n1) - (ca - cp) AS DOUBLE)
                          / CAST(n - n1 AS DOUBLE)) * 1000000)
                          AS BIGINT) AS j_micro
              FROM cum, tot),
            mx AS (SELECT MAX(j_micro) AS mx FROM scored)
            SELECT n, n1,
                   CAST(MIN(s) AS BIGINT) AS best_threshold_cents,
                   CAST(MAX(j_micro) AS BIGINT) AS best_j_micro
            FROM scored, mx
            WHERE j_micro = mx
            GROUP BY 1, 2
        """,
        "q402_mcc": """
            WITH obs AS MATERIALIZED (
              SELECT c.c_mktsegment,
                     CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents,
                     CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END
                       AS y
              FROM orders o JOIN customer c
                ON o.o_custkey = c.c_custkey),
            med AS (SELECT CAST(median(cents) * 2 AS BIGINT) AS med2
                    FROM obs),
            conf AS (
              SELECT c_mktsegment,
                     CAST(SUM(CASE WHEN 2 * cents > med2
                              THEN y ELSE 0 END) AS BIGINT) AS tp,
                     CAST(SUM(CASE WHEN 2 * cents > med2
                              THEN 1 - y ELSE 0 END) AS BIGINT) AS fp,
                     CAST(SUM(CASE WHEN 2 * cents > med2
                              THEN 0 ELSE y END) AS BIGINT) AS fn,
                     CAST(SUM(CASE WHEN 2 * cents > med2
                              THEN 0 ELSE 1 - y END) AS BIGINT) AS tn
              FROM obs, med GROUP BY 1)
            SELECT c_mktsegment, tp, fp, fn, tn,
                   CAST(floor(CAST(CAST(tp AS HUGEINT)
                          * CAST(tn AS HUGEINT)
                        - CAST(fp AS HUGEINT) * CAST(fn AS HUGEINT)
                        AS DOUBLE)
                        / sqrt(CAST(tp + fp AS DOUBLE)
                          * CAST(tp + fn AS DOUBLE)
                          * CAST(tn + fp AS DOUBLE)
                          * CAST(tn + fn AS DOUBLE))
                        * 1000000) AS BIGINT) AS mcc_micro
            FROM conf
        """,
        "q403_stump_split": """
            WITH vals AS (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS s,
                     CAST(COUNT(*) AS BIGINT) AS cnt,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS cpos
              FROM orders GROUP BY 1),
            cum AS (
              SELECT s,
                     CAST(SUM(cnt) OVER w AS BIGINT) AS ca,
                     CAST(SUM(cpos) OVER w AS BIGINT) AS cp
              FROM vals
              WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW)),
            tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                           CAST(SUM(cpos) AS BIGINT) AS n1
                    FROM vals),
            scored AS (
              SELECT s, n, n1,
                     CAST(floor((2.0 * (CAST(n1 AS DOUBLE)
                            / CAST(n AS DOUBLE))
                          * (1.0 - CAST(n1 AS DOUBLE)
                             / CAST(n AS DOUBLE))
                        - (CAST(ca AS DOUBLE) / CAST(n AS DOUBLE)
                           * (2.0 * (CAST(cp AS DOUBLE)
                              / CAST(ca AS DOUBLE))
                              * (1.0 - CAST(cp AS DOUBLE)
                                 / CAST(ca AS DOUBLE)))
                           + (CAST(n AS DOUBLE) - CAST(ca AS DOUBLE))
                             / CAST(n AS DOUBLE)
                             * (2.0 * (CAST(n1 - cp AS DOUBLE)
                                / (CAST(n AS DOUBLE)
                                   - CAST(ca AS DOUBLE)))
                                * (1.0 - CAST(n1 - cp AS DOUBLE)
                                   / (CAST(n AS DOUBLE)
                                      - CAST(ca AS DOUBLE))))))
                        * 1000000000) AS BIGINT) AS gain_nano
              FROM cum, tot WHERE ca < n),
            mx AS (SELECT MAX(gain_nano) AS mx FROM scored)
            SELECT n, n1,
                   CAST(MIN(s) AS BIGINT) AS best_split_cents,
                   CAST(MAX(gain_nano) AS BIGINT) AS best_gain_nano
            FROM scored, mx
            WHERE gain_nano = mx
            GROUP BY 1, 2
        """,
        "q404_friedman_test": """
            WITH cell AS (
              SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                       AS m,
                     c.c_mktsegment,
                     CAST(SUM(CAST(CAST(o_totalprice
                         AS DECIMAL(18,2)) * 100 AS BIGINT))
                       AS BIGINT) AS rev
              FROM orders o JOIN customer c
                ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2),
            r2 AS (
              SELECT m, c_mktsegment,
                     2 * RANK() OVER (PARTITION BY m ORDER BY rev)
                       + CAST(COUNT(*) OVER (PARTITION BY m, rev)
                              AS BIGINT) - 1 AS r2
              FROM cell),
            per_seg AS (
              SELECT c_mktsegment,
                     CAST(SUM(r2) AS BIGINT) AS r2_sum,
                     CAST(COUNT(*) AS BIGINT) AS n_m
              FROM r2 GROUP BY 1),
            s AS (
              SELECT CAST(MIN(n_m) AS BIGINT) AS n,
                     CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(CAST(r2_sum AS HUGEINT)
                          * CAST(r2_sum AS HUGEINT)) AS HUGEINT)
                       AS sr2
              FROM per_seg)
            SELECT n, k,
                   CAST(floor((12.0 * (CAST(sr2 AS DOUBLE) / 4.0)
                        / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                           * (CAST(k AS DOUBLE) + 1.0))
                        - 3.0 * CAST(n AS DOUBLE)
                          * (CAST(k AS DOUBLE) + 1.0))
                        * 1000000) AS BIGINT) AS chi2_micro,
                   CASE WHEN CAST(floor((12.0
                          * (CAST(sr2 AS DOUBLE) / 4.0)
                          / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                             * (CAST(k AS DOUBLE) + 1.0))
                          - 3.0 * CAST(n AS DOUBLE)
                            * (CAST(k AS DOUBLE) + 1.0))
                          * 1000000) AS BIGINT) > 9487729
                        THEN 1 ELSE 0 END AS significant
            FROM s
        """,
        "q405_ipf_raking_step": """
            WITH cells AS MATERIALIZED (
              SELECT c.c_mktsegment, o.o_orderpriority,
                     CAST(COUNT(*) AS BIGINT) AS o
              FROM orders o JOIN customer c
                ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2),
            rowm AS (SELECT c_mktsegment, CAST(SUM(o) AS BIGINT)
                       AS rm FROM cells GROUP BY 1),
            tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                           CAST(COUNT(DISTINCT c_mktsegment)
                                AS BIGINT) AS nr,
                           CAST(COUNT(DISTINCT o_orderpriority)
                                AS BIGINT) AS nc
                    FROM cells),
            stepped AS (
              SELECT c.c_mktsegment, c.o_orderpriority, t.n, t.nc,
                     CAST(c.o AS DOUBLE)
                       * (CAST(t.n AS DOUBLE) / CAST(t.nr AS DOUBLE))
                       / CAST(r.rm AS DOUBLE) AS w1
              FROM cells c
              JOIN rowm r ON c.c_mktsegment = r.c_mktsegment, tot t),
            colm AS (
              SELECT o_orderpriority,
                     CAST(SUM(CAST(floor(w1 * 1000) AS BIGINT))
                          AS BIGINT) AS cm_milli
              FROM stepped GROUP BY 1)
            SELECT s.c_mktsegment, s.o_orderpriority,
                   CAST(floor(s.w1 * (CAST(s.n AS DOUBLE)
                          / CAST(s.nc AS DOUBLE))
                        / (CAST(c.cm_milli AS DOUBLE) / 1e3)
                        * 1000) AS BIGINT) AS raked_count_milli
            FROM stepped s
            JOIN colm c ON s.o_orderpriority = c.o_orderpriority
        """,
        "q406_ngram_novelty_decay": f"""
            WITH sh AS MATERIALIZED (
              SELECT DISTINCT doc_id, g
              FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(toks) >= 5 THEN
                    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     || ' ' || toks[i+3] || ' ' || toks[i+4]
                     for i in generate_series(1, len(toks) - 4)]
                  ELSE [] END) AS g
                FROM (SELECT doc_id, {_TOKS} AS toks
                      FROM documents))),
            first AS (
              SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_doc
              FROM sh GROUP BY 1),
            per_doc AS (
              SELECT s.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_shingles,
                     CAST(SUM(CASE WHEN f.first_doc < s.doc_id
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
              FROM sh s JOIN first f ON s.g = f.g
              GROUP BY 1),
            nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
                   FROM per_doc),
            decile AS (
              SELECT (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) * 10
                       // n_docs AS decile,
                     n_shingles, n_seen
              FROM per_doc, nd)
            SELECT decile,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_shingles) AS BIGINT) AS shingles,
                   CAST(SUM(n_seen) AS BIGINT) * 1000000
                     // CAST(SUM(n_shingles) AS BIGINT)
                     AS dup_share_ppm
            FROM decile GROUP BY 1
        """,
        "q407_forecast_mase": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            lagged AS (
              SELECT day, rev,
                     LAG(rev, 7) OVER (ORDER BY day) AS f7,
                     LAG(rev, 1) OVER (ORDER BY day) AS f1
              FROM daily),
            agg AS (
              SELECT CAST(SUM(CASE WHEN f7 IS NOT NULL
                       THEN abs(rev - f7) END) AS BIGINT) AS sae7,
                     CAST(SUM(CASE WHEN f7 IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n7,
                     CAST(SUM(CASE WHEN f1 IS NOT NULL
                       THEN abs(rev - f1) END) AS BIGINT) AS sae1,
                     CAST(SUM(CASE WHEN f1 IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                     CAST(SUM(CASE WHEN f7 IS NOT NULL
                       THEN CAST(floor(CAST(abs(rev - f7) AS DOUBLE)
                         / (CAST(abs(rev) + abs(f7) AS DOUBLE) / 2.0)
                         * 1000000) AS BIGINT) END) AS BIGINT)
                       AS smape_sum
              FROM lagged)
            SELECT n7, n1,
                   CAST(floor((CAST(sae7 AS DOUBLE)
                          / CAST(n7 AS DOUBLE))
                        / (CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                        * 1000000) AS BIGINT) AS mase_ppm,
                   CAST(floor(CAST(smape_sum AS DOUBLE)
                        / CAST(n7 AS DOUBLE)) AS BIGINT)
                     AS smape_micro,
                   CASE WHEN (CAST(sae7 AS DOUBLE)
                          / CAST(n7 AS DOUBLE))
                          / (CAST(sae1 AS DOUBLE)
                             / CAST(n1 AS DOUBLE)) < 1.0
                        THEN 1 ELSE 0 END AS beats_naive
            FROM agg
        """,
        "q408_two_way_anova": """
            WITH cells AS MATERIALIZED (
              SELECT c.c_mktsegment AS a, o.o_orderpriority AS b,
                     CAST(COUNT(*) AS BIGINT) AS n_ab,
                     CAST(SUM(CAST(CAST(o.o_totalprice
                         AS DECIMAL(18,2)) * 100 AS BIGINT))
                       AS BIGINT) AS s_ab,
                     CAST(SUM(CAST(CAST(CAST(o.o_totalprice
                         AS DECIMAL(18,2)) * 100 AS BIGINT)
                         AS HUGEINT)
                       * CAST(CAST(CAST(o.o_totalprice
                         AS DECIMAL(18,2)) * 100 AS BIGINT)
                         AS HUGEINT)) AS HUGEINT) AS ss_ab
              FROM orders o JOIN customer c
                ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2),
            am AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a,
                          CAST(SUM(s_ab) AS BIGINT) AS s_a
                   FROM cells GROUP BY 1),
            bm AS (SELECT b, CAST(SUM(n_ab) AS BIGINT) AS n_b,
                          CAST(SUM(s_ab) AS BIGINT) AS s_b
                   FROM cells GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n,
                           CAST(SUM(s_ab) AS BIGINT) AS s,
                           CAST(SUM(ss_ab) AS HUGEINT) AS ss
                    FROM cells),
            terms AS (
              SELECT n,
                     CAST(floor(CAST(n_ab AS DOUBLE)
                       * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                            / 100.0
                          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                            / 100.0)
                       * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                            / 100.0
                          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                            / 100.0)) AS BIGINT) AS ta,
                     CAST(floor(CAST(n_ab AS DOUBLE)
                       * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                            / 100.0
                          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                            / 100.0)
                       * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                            / 100.0
                          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                            / 100.0)) AS BIGINT) AS tb,
                     CAST(floor(CAST(n_ab AS DOUBLE)
                       * (CAST(s_ab AS DOUBLE) / CAST(n_ab AS DOUBLE)
                            / 100.0
                          - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                            / 100.0
                          - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                            / 100.0
                          + CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                            / 100.0)
                       * (CAST(s_ab AS DOUBLE) / CAST(n_ab AS DOUBLE)
                            / 100.0
                          - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                            / 100.0
                          - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                            / 100.0
                          + CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                            / 100.0)) AS BIGINT) AS tab,
                     CAST(floor(CAST(ss_ab AS DOUBLE) / 10000.0
                       - CAST(n_ab AS DOUBLE)
                         * (CAST(s_ab AS DOUBLE)
                            / CAST(n_ab AS DOUBLE) / 100.0)
                         * (CAST(s_ab AS DOUBLE)
                            / CAST(n_ab AS DOUBLE) / 100.0))
                       AS BIGINT) AS tw
              FROM cells
              JOIN am USING (a) JOIN bm USING (b), tot),
            s2 AS (
              SELECT n, CAST(COUNT(*) AS BIGINT) AS n_cells,
                     CAST(SUM(ta) AS BIGINT) AS ss_a,
                     CAST(SUM(tb) AS BIGINT) AS ss_b,
                     CAST(SUM(tab) AS BIGINT) AS ss_ab_u,
                     CAST(SUM(tw) AS BIGINT) AS ss_w
              FROM terms GROUP BY 1)
            SELECT n, n_cells, ss_a, ss_b, ss_ab_u,
                   CAST(floor((CAST(ss_ab_u AS DOUBLE) / 16.0)
                        / (CAST(ss_w AS DOUBLE)
                           / CAST(n - 25 AS DOUBLE))
                        * 1000000) AS BIGINT)
                     AS f_interaction_micro,
                   CASE WHEN CAST(floor((CAST(ss_ab_u AS DOUBLE)
                          / 16.0)
                          / (CAST(ss_w AS DOUBLE)
                             / CAST(n - 25 AS DOUBLE))
                          * 1000000) AS BIGINT) > 1644000
                        THEN 1 ELSE 0 END
                     AS interaction_significant
            FROM s2
        """,
        "q409_mann_kendall": """
            WITH weekly AS MATERIALIZED (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) // 7 AS wk,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            s_stat AS (
              SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                                   WHEN b.rev < a.rev THEN -1
                                   ELSE 0 END) AS BIGINT) AS s
              FROM weekly a JOIN weekly b ON a.wk < b.wk),
            ties AS (
              SELECT CAST(SUM(t) AS BIGINT) AS n,
                     CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                       AS tie_term
              FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                    FROM weekly GROUP BY rev)),
            f AS (
              SELECT s, n, tie_term,
                     (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                      * (2.0 * CAST(n AS DOUBLE) + 5.0)
                      - CAST(tie_term AS DOUBLE)) / 18.0 AS var
              FROM s_stat, ties)
            SELECT n, s,
                   CAST(floor(var) AS BIGINT) AS var_floor,
                   CAST(floor(CASE WHEN s > 0
                          THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var)
                        WHEN s < 0
                          THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var)
                        ELSE 0.0 END * 1000000) AS BIGINT)
                     AS z_micro,
                   CASE WHEN abs(CASE WHEN s > 0
                          THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var)
                        WHEN s < 0
                          THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var)
                        ELSE 0.0 END) > 1.96
                        THEN 1 ELSE 0 END AS trend
            FROM f
        """,
        "q410_jarque_bera": """
            WITH t AS (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS c
              FROM orders),
            mom AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(c AS HUGEINT)) AS HUGEINT) AS s1,
                     CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
                          AS HUGEINT) AS s2,
                     CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
                          * CAST(c AS HUGEINT)) AS HUGEINT) AS s3,
                     CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
                          * CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
                          AS HUGEINT) AS s4
              FROM t),
            f AS (
              SELECT n,
                     CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1e2
                       AS r1,
                     CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) / 1e4
                       AS r2,
                     CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) / 1e6
                       AS r3,
                     CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) / 1e8
                       AS r4
              FROM mom),
            g AS (
              SELECT n,
                     r2 - r1 * r1 AS m2,
                     r3 - 3.0 * r1 * r2 + 2.0 * r1 * r1 * r1 AS m3,
                     r4 - 4.0 * r1 * r3 + 6.0 * r1 * r1 * r2
                       - 3.0 * r1 * r1 * r1 * r1 AS m4
              FROM f),
            h AS (
              SELECT n,
                     m3 / (m2 * sqrt(m2)) AS skew,
                     m4 / (m2 * m2) - 3.0 AS kurt
              FROM g)
            SELECT n,
                   CAST(floor(skew * 1000000) AS BIGINT)
                     AS skew_micro,
                   CAST(floor(kurt * 1000000) AS BIGINT)
                     AS ex_kurtosis_micro,
                   CAST(floor(CAST(n AS DOUBLE) / 6.0
                        * (skew * skew + kurt * kurt / 4.0) * 1000)
                        AS BIGINT) AS jb_milli,
                   CASE WHEN CAST(n AS DOUBLE) / 6.0
                          * (skew * skew + kurt * kurt / 4.0)
                          > 5.991465 THEN 1 ELSE 0 END AS non_normal
            FROM h
        """,
        "q411_bowker_symmetry": """
            WITH per AS MATERIALIZED (
              SELECT o_custkey,
                     year(CAST(o_orderdate AS DATE)) AS yr,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS sp
              FROM orders
              WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)
              GROUP BY 1, 2),
            ranked AS (
              SELECT yr, sp,
                     ROW_NUMBER() OVER (PARTITION BY yr ORDER BY sp)
                       AS rnk,
                     COUNT(*) OVER (PARTITION BY yr) AS n_yr
              FROM per),
            bounds AS (
              SELECT yr,
                     MAX(CASE WHEN rnk = CAST(ceil(0.25 * n_yr)
                       AS BIGINT) THEN sp END) AS p25,
                     MAX(CASE WHEN rnk = CAST(ceil(0.5 * n_yr)
                       AS BIGINT) THEN sp END) AS p50,
                     MAX(CASE WHEN rnk = CAST(ceil(0.75 * n_yr)
                       AS BIGINT) THEN sp END) AS p75
              FROM ranked GROUP BY 1),
            binned AS (
              SELECT p.o_custkey, p.yr,
                     CASE WHEN p.sp > b.p25 THEN 1 ELSE 0 END
                     + CASE WHEN p.sp > b.p50 THEN 1 ELSE 0 END
                     + CASE WHEN p.sp > b.p75 THEN 1 ELSE 0 END
                     + 1 AS q
              FROM per p JOIN bounds b ON p.yr = b.yr),
            mat AS MATERIALIZED (
              SELECT a.q AS qf, b.q AS qt,
                     CAST(COUNT(*) AS BIGINT) AS m
              FROM (SELECT o_custkey, q FROM binned WHERE yr = 1996) a
              JOIN (SELECT o_custkey, q FROM binned WHERE yr = 1997) b
                ON a.o_custkey = b.o_custkey
              GROUP BY 1, 2),
            up AS (SELECT qf AS i, qt AS j, m AS n_ij FROM mat
                   WHERE qf < qt),
            dn AS (SELECT qt AS i, qf AS j, m AS n_ji FROM mat
                   WHERE qf > qt),
            pairs AS (
              SELECT COALESCE(u.i, d.i) AS i, COALESCE(u.j, d.j) AS j,
                     COALESCE(n_ij, 0) AS n_ij,
                     COALESCE(n_ji, 0) AS n_ji
              FROM up u FULL JOIN dn d ON u.i = d.i AND u.j = d.j),
            st AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                     CAST(SUM(CAST(floor(CAST(n_ij - n_ji AS DOUBLE)
                       * CAST(n_ij - n_ji AS DOUBLE)
                       / CAST(n_ij + n_ji AS DOUBLE) * 1000000)
                       AS BIGINT)) AS BIGINT) AS chi2_micro,
                     CAST(SUM(n_ij + n_ji) AS BIGINT) AS n_movers
              FROM pairs)
            SELECT n_pairs, n_movers, chi2_micro,
                   CASE WHEN chi2_micro > 12591587 THEN 1 ELSE 0 END
                     AS asymmetric
            FROM st
        """,
        "q412_haar_energy": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            idx AS (
              SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS t, rev
              FROM daily),
            l1 AS MATERIALIZED (
              SELECT t // 2 AS t,
                     CAST(SUM(CASE WHEN t % 2 = 0 THEN rev
                              ELSE 0 END) AS BIGINT)
                     - CAST(SUM(CASE WHEN t % 2 = 1 THEN rev
                              ELSE 0 END) AS BIGINT) AS d,
                     CAST(SUM(rev) AS BIGINT) AS a
              FROM idx GROUP BY t // 2
              HAVING COUNT(*) = 2),
            e1 AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n1,
                     CAST(SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT))
                          AS HUGEINT) AS e1
              FROM l1),
            l2 AS (
              SELECT t // 2 AS t,
                     CAST(SUM(CASE WHEN t % 2 = 0 THEN a
                              ELSE 0 END) AS BIGINT)
                     - CAST(SUM(CASE WHEN t % 2 = 1 THEN a
                              ELSE 0 END) AS BIGINT) AS d
              FROM l1 GROUP BY t // 2
              HAVING COUNT(*) = 2),
            e2 AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n2,
                     CAST(SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT))
                          AS HUGEINT) AS e2
              FROM l2)
            SELECT n1, n2,
                   CAST(floor(CAST(e1 AS DOUBLE)
                        / (CAST(e1 AS DOUBLE) + CAST(e2 AS DOUBLE))
                        * 1000000) AS BIGINT) AS level1_share_ppm,
                   CAST(floor(CAST(e2 AS DOUBLE)
                        / (CAST(e1 AS DOUBLE) + CAST(e2 AS DOUBLE))
                        * 1000000) AS BIGINT) AS level2_share_ppm
            FROM e1, e2
        """,
        "q413_granger_lite": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM orders GROUP BY 1),
            rows_ AS (
              SELECT CAST(floor(CAST(rev AS DOUBLE) / 100.0)
                       AS BIGINT) AS y,
                     CAST(floor(CAST(LAG(rev, 1) OVER (ORDER BY day)
                       AS DOUBLE) / 100.0) AS BIGINT) AS x1,
                     CAST(CAST(LAG(cnt, 1) OVER (ORDER BY day)
                       AS DOUBLE) AS BIGINT) AS x2
              FROM daily),
            t AS (SELECT y, x1, x2 FROM rows_ WHERE x1 IS NOT NULL),
            mom AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                     CAST(SUM(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
                     CAST(SUM(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
                     CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                          AS HUGEINT) AS syy,
                     CAST(SUM(CAST(x1 AS HUGEINT)
                          * CAST(x1 AS HUGEINT)) AS HUGEINT) AS s11,
                     CAST(SUM(CAST(x2 AS HUGEINT)
                          * CAST(x2 AS HUGEINT)) AS HUGEINT) AS s22,
                     CAST(SUM(CAST(x1 AS HUGEINT)
                          * CAST(y AS HUGEINT)) AS HUGEINT) AS s1y,
                     CAST(SUM(CAST(x2 AS HUGEINT)
                          * CAST(y AS HUGEINT)) AS HUGEINT) AS s2y,
                     CAST(SUM(CAST(x1 AS HUGEINT)
                          * CAST(x2 AS HUGEINT)) AS HUGEINT) AS s12
              FROM t),
            cmom AS (
              SELECT n,
                     CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       AS cyy,
                     CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)
                       * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                       AS c11,
                     CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)
                       * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                       AS c22,
                     CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       AS c1y,
                     CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       AS c2y,
                     CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                       * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                       AS c12
              FROM mom),
            fit AS (
              SELECT n, cyy, c1y, c2y, c11, c22, c12,
                     cyy - c1y * c1y / c11 AS rss_r,
                     (c22 * c1y - c12 * c2y)
                       / (c11 * c22 - c12 * c12) AS b1,
                     (c11 * c2y - c12 * c1y)
                       / (c11 * c22 - c12 * c12) AS b2
              FROM cmom),
            ff AS (
              SELECT n, b2,
                     (rss_r - (cyy - b1 * c1y - b2 * c2y))
                       / ((cyy - b1 * c1y - b2 * c2y)
                          / (CAST(n AS DOUBLE) - 3.0)) AS f_stat
              FROM fit)
            SELECT n,
                   CAST(floor(b2 * 1000000) AS BIGINT)
                     AS beta_cnt_micro,
                   CAST(floor(f_stat * 1000000) AS BIGINT)
                     AS f_micro,
                   CASE WHEN CAST(floor(f_stat * 1000000) AS BIGINT)
                        > 3841459 THEN 1 ELSE 0 END
                     AS granger_signal
            FROM ff
        """,
        "q414_mood_scale": """
            WITH cust AS (
              SELECT c_custkey,
                     CASE WHEN c_mktsegment = 'BUILDING'
                          THEN 1 ELSE 0 END AS g
              FROM customer
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
            obs AS (
              SELECT g,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents
              FROM orders o JOIN cust c ON o.o_custkey = c.c_custkey),
            byval AS (
              SELECT cents, CAST(SUM(g) AS BIGINT) AS n1v,
                     CAST(COUNT(*) AS BIGINT) AS nv
              FROM obs GROUP BY 1),
            ranked AS (
              SELECT n1v, nv,
                     COALESCE(CAST(SUM(nv) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS BIGINT), 0) AS cumb
              FROM byval),
            tot AS (SELECT CAST(SUM(nv) AS BIGINT) AS n FROM byval),
            s AS (
              SELECT n,
                     CAST(SUM(n1v) AS BIGINT) AS n1,
                     CAST(SUM(nv - n1v) AS BIGINT) AS n2,
                     CAST(SUM(CAST(n1v AS HUGEINT)
                          * CAST(2 * cumb + nv - n AS HUGEINT)
                          * CAST(2 * cumb + nv - n AS HUGEINT))
                          AS HUGEINT) AS m4x
              FROM ranked, tot GROUP BY 1)
            SELECT n, n1, n2,
                   CAST(floor((CAST(m4x AS DOUBLE) / 4.0
                        - CAST(n1 AS DOUBLE)
                          * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                             - 1.0) / 12.0)
                        / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                          * (CAST(n AS DOUBLE) + 1.0)
                          * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                             - 4.0) / 180.0)
                        * 1000000) AS BIGINT) AS z_micro,
                   CASE WHEN abs((CAST(m4x AS DOUBLE) / 4.0
                          - CAST(n1 AS DOUBLE)
                            * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                               - 1.0) / 12.0)
                          / sqrt(CAST(n1 AS DOUBLE)
                            * CAST(n2 AS DOUBLE)
                            * (CAST(n AS DOUBLE) + 1.0)
                            * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                               - 4.0) / 180.0)) > 1.96
                        THEN 1 ELSE 0 END AS scale_differs
            FROM s
        """,
        "q415_vif": """
            WITH t AS (
              SELECT CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)
                       AS x,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS y,
                     CAST(l_quantity AS BIGINT) AS z
              FROM lineitem),
            mom AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                     CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                     CAST(SUM(CAST(z AS HUGEINT)) AS HUGEINT) AS sz,
                     CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                          AS HUGEINT) AS sxx,
                     CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                          AS HUGEINT) AS syy,
                     CAST(SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT))
                          AS HUGEINT) AS szz,
                     CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                          AS HUGEINT) AS sxy,
                     CAST(SUM(CAST(x AS HUGEINT) * CAST(z AS HUGEINT))
                          AS HUGEINT) AS sxz,
                     CAST(SUM(CAST(y AS HUGEINT) * CAST(z AS HUGEINT))
                          AS HUGEINT) AS syz
              FROM t),
            cm AS (
              SELECT n,
                     CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                       * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                       AS cxx,
                     CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       AS cyy,
                     CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)
                       * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE)
                       AS czz,
                     CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       AS cxy,
                     CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE)
                       * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE)
                       AS cxz,
                     CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE)
                       * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE)
                       AS cyz
              FROM mom),
            r AS (
              SELECT n,
                     (((czz * cxy - cyz * cxz)
                         / (cyy * czz - cyz * cyz)) * cxy
                      + ((cyy * cxz - cyz * cxy)
                         / (cyy * czz - cyz * cyz)) * cxz) / cxx
                       AS r2x,
                     (((czz * cxy - cxz * cyz)
                         / (cxx * czz - cxz * cxz)) * cxy
                      + ((cxx * cyz - cxz * cxy)
                         / (cxx * czz - cxz * cxz)) * cyz) / cyy
                       AS r2y,
                     (((cyy * cxz - cxy * cyz)
                         / (cxx * cyy - cxy * cxy)) * cxz
                      + ((cxx * cyz - cxy * cxz)
                         / (cxx * cyy - cxy * cxy)) * cyz) / czz
                       AS r2z
              FROM cm)
            SELECT n,
                   CAST(floor(1.0 / (1.0 - r2x) * 1000000) AS BIGINT)
                     AS vif_discount_micro,
                   CAST(floor(1.0 / (1.0 - r2y) * 1000000) AS BIGINT)
                     AS vif_price_micro,
                   CAST(floor(1.0 / (1.0 - r2z) * 1000000) AS BIGINT)
                     AS vif_quantity_micro
            FROM r
        """,
        "q416_durbin_watson": """
            WITH daily AS MATERIALIZED (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            mom AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(day AS HUGEINT)) AS HUGEINT) AS sx,
                     CAST(SUM(CAST(rev AS HUGEINT)) AS HUGEINT) AS sy,
                     CAST(SUM(CAST(day AS HUGEINT)
                          * CAST(day AS HUGEINT)) AS HUGEINT) AS sxx,
                     CAST(SUM(CAST(day AS HUGEINT)
                          * CAST(rev AS HUGEINT)) AS HUGEINT) AS sxy
              FROM daily),
            fit AS (
              SELECT n,
                     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       AS b,
                     CAST(sx AS DOUBLE) AS sxd,
                     CAST(sy AS DOUBLE) AS syd
              FROM mom),
            resid AS (
              SELECT day,
                     CAST(floor((CAST(rev AS DOUBLE)
                       - ((syd - b * sxd) / CAST(n AS DOUBLE)
                          + b * CAST(day AS DOUBLE))) / 100.0)
                       AS BIGINT) AS e
              FROM daily, fit),
            lagged AS (
              SELECT e, LAG(e, 1) OVER (ORDER BY day) AS el
              FROM resid),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN el IS NOT NULL THEN
                       CAST(e - el AS HUGEINT)
                       * CAST(e - el AS HUGEINT) END) AS HUGEINT)
                       AS num,
                     CAST(SUM(CAST(e AS HUGEINT)
                          * CAST(e AS HUGEINT)) AS HUGEINT) AS den
              FROM lagged)
            SELECT n,
                   CAST(floor(CAST(num AS DOUBLE)
                        / CAST(den AS DOUBLE) * 1000000) AS BIGINT)
                     AS dw_micro,
                   CASE WHEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                          < 1.5 THEN 'positive_autocorr'
                        WHEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                          > 2.5 THEN 'negative_autocorr'
                        ELSE 'clean' END AS verdict
            FROM agg
        """,
        "q417_cooks_distance": """
            WITH daily AS MATERIALIZED (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            mom AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(day AS HUGEINT)) AS HUGEINT) AS sx,
                     CAST(SUM(CAST(rev AS HUGEINT)) AS HUGEINT) AS sy,
                     CAST(SUM(CAST(day AS HUGEINT)
                          * CAST(day AS HUGEINT)) AS HUGEINT) AS sxx,
                     CAST(SUM(CAST(day AS HUGEINT)
                          * CAST(rev AS HUGEINT)) AS HUGEINT) AS sxy,
                     CAST(SUM(CAST(rev AS HUGEINT)
                          * CAST(rev AS HUGEINT)) AS HUGEINT) AS syy
              FROM daily),
            fit AS (
              SELECT n,
                     CAST(n AS DOUBLE) AS nd,
                     CAST(sx AS DOUBLE) AS sx,
                     CAST(sy AS DOUBLE) AS sy,
                     CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                       AS sxxc,
                     CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                       AS syyc,
                     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       AS b
              FROM mom),
            scored AS (
              SELECT day,
                     CAST(rev AS DOUBLE)
                       - ((sy - b * sx) / nd
                          + b * CAST(day AS DOUBLE)) AS e,
                     1.0 / nd + (CAST(day AS DOUBLE) - sx / nd)
                       * (CAST(day AS DOUBLE) - sx / nd)
                       / (sxxc / nd) AS h,
                     ((syyc - b * b * sxxc) / nd) / (nd - 2.0) AS s2
              FROM daily, fit),
            ranked AS (
              SELECT day,
                     CAST(floor(e * e * h
                       / (2.0 * s2 * (1.0 - h) * (1.0 - h))
                       * 1000000000) AS BIGINT) AS d_nano
              FROM scored)
            SELECT ROW_NUMBER() OVER (ORDER BY d_nano DESC, day)
                     AS rk,
                   day, d_nano
            FROM ranked
            ORDER BY d_nano DESC, day LIMIT 5
        """,
        "q418_krippendorff_binary": """
            WITH t AS (
              SELECT CASE WHEN length(text) > 0
                            AND length(regexp_replace(text,
                       '[^a-zA-Z0-9 ]', '', 'g')) / length(text)
                       >= 0.8 THEN 1 ELSE 0 END AS a,
                     CASE WHEN len(list_filter(string_split(
                       regexp_replace(lower(CAST(text AS VARCHAR)),
                         '[^a-z0-9]+', ' ', 'g'), ' '),
                       x -> x != '')) >= 50 THEN 1 ELSE 0 END AS b
              FROM documents),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(a) AS BIGINT) AS na1,
                     CAST(SUM(b) AS BIGINT) AS nb1,
                     CAST(SUM(CASE WHEN a <> b THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_dis
              FROM t)
            SELECT n, na1, nb1, n_dis,
                   CAST(floor((1.0 - (CAST(n_dis AS DOUBLE)
                          / CAST(n AS DOUBLE))
                        / (2.0 * CAST(na1 + nb1 AS DOUBLE)
                           * (2.0 * CAST(n AS DOUBLE)
                              - CAST(na1 + nb1 AS DOUBLE))
                           / (2.0 * CAST(n AS DOUBLE)
                              * (2.0 * CAST(n AS DOUBLE) - 1.0))))
                        * 1000000) AS BIGINT) AS alpha_micro
            FROM agg
        """,
        "q419_xbar_r_chart": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            grp AS MATERIALIZED (
              SELECT day // 7 AS wk,
                     CAST(COUNT(*) AS BIGINT) AS cnt,
                     CAST(SUM(rev) AS BIGINT) AS s,
                     CAST(MAX(rev) - MIN(rev) AS BIGINT) AS r
              FROM daily GROUP BY 1
              HAVING COUNT(*) = 7),
            lims AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(s) AS BIGINT) AS ss,
                     CAST(SUM(r) AS BIGINT) AS sr
              FROM grp),
            flagged AS (
              SELECT wk,
                     CAST(g.s AS DOUBLE) / 7.0 AS xbar,
                     CAST(g.r AS DOUBLE) AS rr,
                     CAST(ss AS DOUBLE) / (7.0 * CAST(k AS DOUBLE))
                       + 0.419 * (CAST(sr AS DOUBLE)
                                  / CAST(k AS DOUBLE)) AS ux,
                     CAST(ss AS DOUBLE) / (7.0 * CAST(k AS DOUBLE))
                       - 0.419 * (CAST(sr AS DOUBLE)
                                  / CAST(k AS DOUBLE)) AS lx,
                     1.924 * (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
                       AS ur,
                     0.076 * (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
                       AS lr
              FROM grp g, lims)
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(CASE WHEN xbar > ux OR xbar < lx
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS mean_breaches,
                   CAST(SUM(CASE WHEN rr > ur OR rr < lr
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS range_breaches,
                   CAST(floor(MIN(ux)) AS BIGINT) AS ucl_x_floor,
                   CAST(floor(MIN(ur)) AS BIGINT) AS ucl_r_floor
            FROM flagged
        """,
        "q420_holm_bonferroni": """
            WITH per AS (
              SELECT n.n_name,
                     CAST(COUNT(*) AS BIGINT) AS n_i,
                     CAST(SUM(CASE WHEN o.o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS x_i
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_i) AS BIGINT) AS n,
                           CAST(SUM(x_i) AS BIGINT) AS x FROM per),
            scored AS (
              SELECT n_name,
                     CAST(least(1000000.0, floor(2000000.0 / (1.0 +
                       (CAST(x_i AS DOUBLE) - CAST(n_i AS DOUBLE)
                        * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))
                       * (CAST(x_i AS DOUBLE) - CAST(n_i AS DOUBLE)
                          * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))
                       / (CAST(n_i AS DOUBLE)
                          * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 - CAST(x AS DOUBLE)
                                   / CAST(n AS DOUBLE))))))
                       AS BIGINT) AS p_micro
              FROM per, tot),
            ranked AS (
              SELECT n_name, p_micro,
                     ROW_NUMBER() OVER (ORDER BY p_micro, n_name)
                       AS rank
              FROM scored),
            flagged AS (
              SELECT n_name, p_micro, rank,
                     CASE WHEN p_micro * (25 - rank + 1) <= 50000
                          THEN 1 ELSE 0 END AS ok
              FROM ranked)
            SELECT n_name, p_micro, rank,
                   MIN(ok) OVER (ORDER BY p_micro, n_name
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS rejected
            FROM flagged
        """,
        "q421_tail_dependence": """
            WITH per AS MATERIALIZED (
              SELECT l_orderkey,
                     CAST(SUM(CAST(CAST(l_extendedprice
                         AS DECIMAL(18,2)) * 100 AS BIGINT))
                       AS BIGINT) AS cents,
                     CAST(COUNT(*) AS BIGINT) AS n_lines
              FROM lineitem GROUP BY 1),
            nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per),
            tx95 AS (SELECT cents AS x95 FROM (
                SELECT cents, ROW_NUMBER() OVER (ORDER BY cents,
                  l_orderkey) AS rk FROM per), nt
              WHERE rk = CAST(ceil(0.95 * n) AS BIGINT)),
            ty95 AS (SELECT n_lines AS y95 FROM (
                SELECT n_lines, ROW_NUMBER() OVER (ORDER BY n_lines,
                  l_orderkey) AS rk FROM per), nt
              WHERE rk = CAST(ceil(0.95 * n) AS BIGINT)),
            tx99 AS (SELECT cents AS x99 FROM (
                SELECT cents, ROW_NUMBER() OVER (ORDER BY cents,
                  l_orderkey) AS rk FROM per), nt
              WHERE rk = CAST(ceil(0.99 * n) AS BIGINT)),
            ty99 AS (SELECT n_lines AS y99 FROM (
                SELECT n_lines, ROW_NUMBER() OVER (ORDER BY n_lines,
                  l_orderkey) AS rk FROM per), nt
              WHERE rk = CAST(ceil(0.99 * n) AS BIGINT)),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN cents > x95 THEN 1 ELSE 0 END)
                          AS BIGINT) AS nx95,
                     CAST(SUM(CASE WHEN cents > x95
                              AND n_lines > y95 THEN 1 ELSE 0 END)
                          AS BIGINT) AS nxy95,
                     CAST(SUM(CASE WHEN cents > x99 THEN 1 ELSE 0 END)
                          AS BIGINT) AS nx99,
                     CAST(SUM(CASE WHEN cents > x99
                              AND n_lines > y99 THEN 1 ELSE 0 END)
                          AS BIGINT) AS nxy99
              FROM per, tx95, ty95, tx99, ty99)
            SELECT n, nx95, nxy95,
                   nxy95 * 1000000 // nx95 AS lambda95_ppm,
                   nx99, nxy99,
                   CASE WHEN nx99 > 0 THEN nxy99 * 1000000 // nx99
                     END AS lambda99_ppm
            FROM agg
        """,
        "q422_pps_systematic": """
            WITH orders_v AS (
              SELECT o_orderkey,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents
              FROM orders),
            cum AS (
              SELECT o_orderkey, cents,
                     CAST(SUM(cents) OVER (ORDER BY o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS cum
              FROM orders_v),
            tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total
                    FROM orders_v)
            SELECT o_orderkey, cents,
                   (40 * cum + total) // (2 * total)
                   - (40 * (cum - cents) + total) // (2 * total)
                     AS n_hits
            FROM cum, tot
            WHERE (40 * cum + total) // (2 * total)
                  - (40 * (cum - cents) + total) // (2 * total) > 0
            ORDER BY o_orderkey
        """,
        "q423_lognormal_fit": """
            WITH vals AS MATERIALIZED (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents
              FROM orders),
            t AS (
              SELECT CAST(floor(ln(CAST(cents AS DOUBLE) / 100.0)
                       * 1000000000) AS BIGINT) AS l,
                     CAST(floor(ln(CAST(cents AS DOUBLE) / 100.0)
                       * ln(CAST(cents AS DOUBLE) / 100.0)
                       * 1000000000) AS BIGINT) AS ll,
                     cents
              FROM vals),
            mom AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(l AS HUGEINT)) AS HUGEINT) AS sl,
                     CAST(SUM(CAST(ll AS HUGEINT)) AS HUGEINT)
                       AS sll,
                     CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT)
                       AS sc
              FROM t),
            med AS (
              SELECT cents AS med_cents FROM (
                SELECT cents, ROW_NUMBER() OVER (ORDER BY cents)
                  AS rk FROM vals),
                (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals)
              WHERE rk = CAST(ceil(CAST(n AS DOUBLE) / 2) AS BIGINT)),
            f AS (
              SELECT n,
                     CAST(sl AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)
                       AS mu,
                     CAST(sll AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)
                       - (CAST(sl AS DOUBLE) / 1e9
                          / CAST(n AS DOUBLE))
                         * (CAST(sl AS DOUBLE) / 1e9
                            / CAST(n AS DOUBLE)) AS var,
                     ln(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)
                        / 100.0)
                       - ln(CAST(med_cents AS DOUBLE) / 100.0) AS gap
              FROM mom, med)
            SELECT n,
                   CAST(floor(mu * 1000000) AS BIGINT)
                     AS mu_ln_micro,
                   CAST(floor(sqrt(var) * 1000000) AS BIGINT)
                     AS sigma_ln_micro,
                   CAST(floor(gap * 1000000) AS BIGINT)
                     AS ln_mean_med_gap_micro,
                   CAST(floor(var / 2.0 * 1000000) AS BIGINT)
                     AS half_sigma2_micro,
                   CAST(floor(abs(gap - var / 2.0) * 1000000)
                        AS BIGINT) AS lognormal_misfit_micro
            FROM f
        """,
        "q424_abc_xyz": """
            WITH rev AS MATERIALIZED (
              SELECT l_partkey,
                     CAST(SUM(CAST(CAST(l_extendedprice
                         AS DECIMAL(18,2)) * 100 AS BIGINT))
                       AS BIGINT) AS cents
              FROM lineitem GROUP BY 1),
            ranked AS (
              SELECT l_partkey, cents,
                     ROW_NUMBER() OVER (ORDER BY cents DESC,
                       l_partkey) AS rk
              FROM rev),
            cum AS (
              SELECT l_partkey,
                     CAST(SUM(cents) OVER (ORDER BY rk
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS cum
              FROM ranked),
            tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total
                    FROM rev),
            abc AS (
              SELECT l_partkey,
                     CASE WHEN cum * 100 <= total * 80 THEN 'A'
                          WHEN cum * 100 <= total * 95 THEN 'B'
                          ELSE 'C' END AS abc
              FROM cum, tot),
            monthly AS (
              SELECT l_partkey,
                     strftime(CAST(l_shipdate AS DATE), '%Y-%m')
                       AS m,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS d
              FROM lineitem GROUP BY 1, 2),
            cv AS (
              SELECT l_partkey,
                     CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(d) AS BIGINT) AS s1,
                     CAST(SUM(CAST(d AS HUGEINT)
                          * CAST(d AS HUGEINT)) AS HUGEINT) AS s2
              FROM monthly GROUP BY 1),
            xyz AS (
              SELECT l_partkey,
                     CASE WHEN sqrt(CAST(s2 AS DOUBLE)
                            / CAST(k AS DOUBLE)
                            - (CAST(s1 AS DOUBLE)
                               / CAST(k AS DOUBLE))
                              * (CAST(s1 AS DOUBLE)
                                 / CAST(k AS DOUBLE)))
                            / (CAST(s1 AS DOUBLE)
                               / CAST(k AS DOUBLE)) < 0.5 THEN 'X'
                          WHEN sqrt(CAST(s2 AS DOUBLE)
                            / CAST(k AS DOUBLE)
                            - (CAST(s1 AS DOUBLE)
                               / CAST(k AS DOUBLE))
                              * (CAST(s1 AS DOUBLE)
                                 / CAST(k AS DOUBLE)))
                            / (CAST(s1 AS DOUBLE)
                               / CAST(k AS DOUBLE)) < 1.0 THEN 'Y'
                          ELSE 'Z' END AS xyz
              FROM cv)
            SELECT a.abc, x.xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM abc a JOIN xyz x ON a.l_partkey = x.l_partkey
            GROUP BY 1, 2
        """,
        "q425_interrupted_ts": """
            WITH daily AS MATERIALIZED (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            brk AS (
              SELECT day AS brk FROM (
                SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rk
                FROM daily),
                (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily)
              WHERE rk = CAST(ceil(CAST(n AS DOUBLE) / 2)
                              AS BIGINT)),
            mom AS (
              SELECT CAST(MIN(brk) AS BIGINT) AS brk,
                     CAST(SUM(CASE WHEN day < brk THEN 1 ELSE 0 END)
                          AS BIGINT) AS n0,
                     CAST(SUM(CASE WHEN day < brk THEN
                       CAST(day AS HUGEINT) END) AS HUGEINT) AS sx0,
                     CAST(SUM(CASE WHEN day < brk THEN
                       CAST(rev AS HUGEINT) END) AS HUGEINT) AS sy0,
                     CAST(SUM(CASE WHEN day < brk THEN
                       CAST(day AS HUGEINT) * CAST(day AS HUGEINT)
                       END) AS HUGEINT) AS sxx0,
                     CAST(SUM(CASE WHEN day < brk THEN
                       CAST(day AS HUGEINT) * CAST(rev AS HUGEINT)
                       END) AS HUGEINT) AS sxy0,
                     CAST(SUM(CASE WHEN day >= brk THEN 1 ELSE 0 END)
                          AS BIGINT) AS n1,
                     CAST(SUM(CASE WHEN day >= brk THEN
                       CAST(day AS HUGEINT) END) AS HUGEINT) AS sx1,
                     CAST(SUM(CASE WHEN day >= brk THEN
                       CAST(rev AS HUGEINT) END) AS HUGEINT) AS sy1,
                     CAST(SUM(CASE WHEN day >= brk THEN
                       CAST(day AS HUGEINT) * CAST(day AS HUGEINT)
                       END) AS HUGEINT) AS sxx1,
                     CAST(SUM(CASE WHEN day >= brk THEN
                       CAST(day AS HUGEINT) * CAST(rev AS HUGEINT)
                       END) AS HUGEINT) AS sxy1
              FROM daily, brk),
            fit AS (
              SELECT brk, n0, n1,
                     (CAST(n0 AS DOUBLE) * CAST(sxy0 AS DOUBLE)
                      - CAST(sx0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
                     / (CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
                        - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE))
                       AS b0,
                     CAST(sx0 AS DOUBLE) AS sx0d,
                     CAST(sy0 AS DOUBLE) AS sy0d,
                     (CAST(n1 AS DOUBLE) * CAST(sxy1 AS DOUBLE)
                      - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
                     / (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
                        - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
                       AS b1,
                     CAST(sx1 AS DOUBLE) AS sx1d,
                     CAST(sy1 AS DOUBLE) AS sy1d
              FROM mom)
            SELECT brk, n0, n1,
                   CAST(floor(b0 * 1000) AS BIGINT)
                     AS slope_pre_millicents,
                   CAST(floor(b1 * 1000) AS BIGINT)
                     AS slope_post_millicents,
                   CAST(floor((b1 - b0) * 1000) AS BIGINT)
                     AS slope_change_millicents,
                   CAST(floor((((sy1d - b1 * sx1d)
                          / CAST(n1 AS DOUBLE)
                          + b1 * CAST(brk AS DOUBLE))
                        - ((sy0d - b0 * sx0d) / CAST(n0 AS DOUBLE)
                           + b0 * CAST(brk AS DOUBLE))) / 100.0)
                        AS BIGINT) AS level_jump_usd
            FROM fit
        """,
        "q426_icc_design_effect": """
            WITH per AS (
              SELECT o_custkey,
                     CAST(COUNT(*) AS BIGINT) AS n_i,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS x_i
              FROM orders GROUP BY 1),
            s AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(n_i) AS BIGINT) AS n,
                     CAST(SUM(x_i) AS BIGINT) AS x,
                     CAST(SUM(CAST(n_i AS HUGEINT)
                          * CAST(n_i AS HUGEINT)) AS HUGEINT) AS sn2,
                     CAST(SUM(CAST(floor(CAST(x_i AS DOUBLE)
                       * CAST(x_i AS DOUBLE) / CAST(n_i AS DOUBLE)
                       * 1000000) AS BIGINT)) AS BIGINT) AS sxx_micro
              FROM per),
            f AS (
              SELECT k, n,
                     (CAST(sxx_micro AS DOUBLE) / 1e6
                      - CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                        / CAST(n AS DOUBLE))
                     / (CAST(k AS DOUBLE) - 1.0) AS msb,
                     (CAST(x AS DOUBLE)
                      - CAST(sxx_micro AS DOUBLE) / 1e6)
                     / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
                       AS msw,
                     (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE)
                        / CAST(n AS DOUBLE))
                     / (CAST(k AS DOUBLE) - 1.0) AS n0
              FROM s),
            g AS (
              SELECT k, n,
                     (msb - msw) / (msb + (n0 - 1.0) * msw) AS icc
              FROM f)
            SELECT k, n,
                   CAST(floor(icc * 1000000) AS BIGINT) AS icc_micro,
                   CAST(floor((1.0 + (CAST(n AS DOUBLE)
                          / CAST(k AS DOUBLE) - 1.0) * icc)
                        * 1000000) AS BIGINT) AS deff_micro,
                   CAST(floor(CAST(n AS DOUBLE)
                        / (1.0 + (CAST(n AS DOUBLE)
                           / CAST(k AS DOUBLE) - 1.0) * icc))
                        AS BIGINT) AS effective_n
            FROM g
        """,
        "q427_histogram_bin_advisor": """
            WITH vals AS MATERIALIZED (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents
              FROM orders),
            mom AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT)
                       AS s1,
                     CAST(SUM(CAST(cents AS HUGEINT)
                          * CAST(cents AS HUGEINT)) AS HUGEINT)
                       AS s2,
                     CAST(MIN(cents) AS BIGINT) AS lo,
                     CAST(MAX(cents) AS BIGINT) AS hi
              FROM vals),
            q1t AS (SELECT cents AS q1 FROM (
                SELECT cents, ROW_NUMBER() OVER (ORDER BY cents)
                  AS rk FROM vals),
                (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals)
              WHERE rk = CAST(ceil(0.25 * n) AS BIGINT)),
            q3t AS (SELECT cents AS q3 FROM (
                SELECT cents, ROW_NUMBER() OVER (ORDER BY cents)
                  AS rk FROM vals),
                (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals)
              WHERE rk = CAST(ceil(0.75 * n) AS BIGINT)),
            c0 AS (
              SELECT n, s1, s2, lo, hi, q1, q3,
                     sqrt(sqrt(CAST(n AS DOUBLE))) AS t
              FROM mom, q1t, q3t),
            c1 AS (SELECT *, (2.0 * t + CAST(n AS DOUBLE)
                     / (t * t)) / 3.0 AS t1 FROM c0),
            c2 AS (SELECT *, (2.0 * t1 + CAST(n AS DOUBLE)
                     / (t1 * t1)) / 3.0 AS t2 FROM c1),
            c3 AS (SELECT *, (2.0 * t2 + CAST(n AS DOUBLE)
                     / (t2 * t2)) / 3.0 AS t3 FROM c2),
            c4 AS (SELECT *, (2.0 * t3 + CAST(n AS DOUBLE)
                     / (t3 * t3)) / 3.0 AS cbrt_n FROM c3),
            f AS (
              SELECT n,
                     1.0 + ln(CAST(n AS DOUBLE)) / ln(2.0)
                       AS sturges,
                     CAST(hi - lo AS DOUBLE) AS rng,
                     3.49 * sqrt(CAST(s2 AS DOUBLE)
                       / CAST(n AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                       / cbrt_n AS w_scott,
                     2.0 * CAST(q3 - q1 AS DOUBLE) / cbrt_n AS w_fd
              FROM c4)
            SELECT n,
                   CAST(floor(sturges) AS BIGINT) AS sturges_bins,
                   CAST(floor(rng / w_scott) AS BIGINT)
                     AS scott_bins,
                   CAST(floor(rng / w_fd) AS BIGINT) AS fd_bins,
                   CAST(floor(w_scott) AS BIGINT)
                     AS scott_width_cents,
                   CAST(floor(w_fd) AS BIGINT) AS fd_width_cents
            FROM f
        """,
        "q428_by_fdr": f"""
            WITH per AS (
              SELECT n.n_name,
                     CAST(COUNT(*) AS BIGINT) AS n_i,
                     CAST(SUM(CASE WHEN o.o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS x_i
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_i) AS BIGINT) AS n,
                           CAST(SUM(x_i) AS BIGINT) AS x FROM per),
            scored AS (
              SELECT n_name,
                     CAST(least(1000000.0, floor(2000000.0 / (1.0 +
                       (CAST(x_i AS DOUBLE) - CAST(n_i AS DOUBLE)
                        * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))
                       * (CAST(x_i AS DOUBLE) - CAST(n_i AS DOUBLE)
                          * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))
                       / (CAST(n_i AS DOUBLE)
                          * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 - CAST(x AS DOUBLE)
                                   / CAST(n AS DOUBLE))))))
                       AS BIGINT) AS p_micro
              FROM per, tot),
            ranked AS (
              SELECT n_name, p_micro,
                     ROW_NUMBER() OVER (ORDER BY p_micro, n_name)
                       AS rank
              FROM scored),
            flagged AS (
              SELECT n_name, p_micro, rank,
                     CASE WHEN CAST(p_micro AS HUGEINT) * 25
                            * CAST({_H25_NANO} AS HUGEINT)
                          <= CAST(rank AS HUGEINT) * 50000
                            * CAST(1000000000 AS HUGEINT)
                          THEN 1 ELSE 0 END AS ok
              FROM ranked),
            kk AS (SELECT COALESCE(MAX(CASE WHEN ok = 1 THEN rank
                     END), 0) AS k FROM flagged)
            SELECT n_name, p_micro, rank,
                   CASE WHEN rank <= k THEN 1 ELSE 0 END AS rejected
            FROM flagged, kk
        """,
        "q429_gains_curve": """
            WITH vals AS (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS s,
                     CAST(COUNT(*) AS BIGINT) AS cnt,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS cpos
              FROM orders GROUP BY 1),
            cum AS (
              SELECT s, cnt, cpos,
                     CAST(SUM(cnt) OVER w AS BIGINT) AS ca,
                     CAST(SUM(cpos) OVER w AS BIGINT) AS cp
              FROM vals
              WINDOW w AS (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW)),
            tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                           CAST(SUM(cpos) AS BIGINT) AS n1
                    FROM vals),
            j AS (
              SELECT least(9, (ca - 1) * 10 // n) AS decile,
                     ca, cp, n, n1
              FROM cum, tot),
            per AS (
              SELECT decile, n, n1,
                     CAST(MAX(ca) AS BIGINT) AS cum_n,
                     CAST(MAX(cp) AS BIGINT) AS cum_pos
              FROM j GROUP BY 1, 2, 3)
            SELECT decile, cum_n, cum_pos,
                   cum_pos * 1000000 // n1 AS gain_ppm,
                   (cum_pos * 1000000 // n1)
                     - (cum_n * 1000000 // n) AS lift_vs_random_ppm
            FROM per
        """,
        "q430_chow_test": """
            WITH daily AS MATERIALIZED (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            brk AS (
              SELECT day AS brk FROM (
                SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rk
                FROM daily),
                (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily)
              WHERE rk = CAST(ceil(CAST(n AS DOUBLE) / 2)
                              AS BIGINT)),
            j AS (
              SELECT day, rev // 100 AS r, day < brk AS pre
              FROM daily, brk),
            agg AS (
              SELECT
                CAST(SUM(CASE WHEN pre THEN 1 ELSE 0 END) AS BIGINT)
                  AS n0,
                CAST(SUM(CASE WHEN pre THEN CAST(day AS HUGEINT)
                  END) AS HUGEINT) AS sx0,
                CAST(SUM(CASE WHEN pre THEN CAST(r AS HUGEINT)
                  END) AS HUGEINT) AS sy0,
                CAST(SUM(CASE WHEN pre THEN CAST(day AS HUGEINT)
                  * CAST(day AS HUGEINT) END) AS HUGEINT) AS sxx0,
                CAST(SUM(CASE WHEN pre THEN CAST(day AS HUGEINT)
                  * CAST(r AS HUGEINT) END) AS HUGEINT) AS sxy0,
                CAST(SUM(CASE WHEN pre THEN CAST(r AS HUGEINT)
                  * CAST(r AS HUGEINT) END) AS HUGEINT) AS syy0,
                CAST(SUM(CASE WHEN NOT pre THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN NOT pre THEN CAST(day AS HUGEINT)
                  END) AS HUGEINT) AS sx1,
                CAST(SUM(CASE WHEN NOT pre THEN CAST(r AS HUGEINT)
                  END) AS HUGEINT) AS sy1,
                CAST(SUM(CASE WHEN NOT pre THEN CAST(day AS HUGEINT)
                  * CAST(day AS HUGEINT) END) AS HUGEINT) AS sxx1,
                CAST(SUM(CASE WHEN NOT pre THEN CAST(day AS HUGEINT)
                  * CAST(r AS HUGEINT) END) AS HUGEINT) AS sxy1,
                CAST(SUM(CASE WHEN NOT pre THEN CAST(r AS HUGEINT)
                  * CAST(r AS HUGEINT) END) AS HUGEINT) AS syy1,
                CAST(SUM(CASE WHEN TRUE THEN 1 ELSE 0 END) AS BIGINT)
                  AS np,
                CAST(SUM(CASE WHEN TRUE THEN CAST(day AS HUGEINT)
                  END) AS HUGEINT) AS sxp,
                CAST(SUM(CASE WHEN TRUE THEN CAST(r AS HUGEINT)
                  END) AS HUGEINT) AS syp,
                CAST(SUM(CASE WHEN TRUE THEN CAST(day AS HUGEINT)
                  * CAST(day AS HUGEINT) END) AS HUGEINT) AS sxxp,
                CAST(SUM(CASE WHEN TRUE THEN CAST(day AS HUGEINT)
                  * CAST(r AS HUGEINT) END) AS HUGEINT) AS sxyp,
                CAST(SUM(CASE WHEN TRUE THEN CAST(r AS HUGEINT)
                  * CAST(r AS HUGEINT) END) AS HUGEINT) AS syyp
              FROM j),
            f AS (
              SELECT np,
                ((CAST(np AS DOUBLE) * CAST(syyp AS DOUBLE)
                  - CAST(syp AS DOUBLE) * CAST(syp AS DOUBLE))
                 - (CAST(np AS DOUBLE) * CAST(sxyp AS DOUBLE)
                    - CAST(sxp AS DOUBLE) * CAST(syp AS DOUBLE))
                   * (CAST(np AS DOUBLE) * CAST(sxyp AS DOUBLE)
                      - CAST(sxp AS DOUBLE) * CAST(syp AS DOUBLE))
                   / (CAST(np AS DOUBLE) * CAST(sxxp AS DOUBLE)
                      - CAST(sxp AS DOUBLE) * CAST(sxp AS DOUBLE)))
                / CAST(np AS DOUBLE) AS rp,
                ((CAST(n0 AS DOUBLE) * CAST(syy0 AS DOUBLE)
                  - CAST(sy0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
                 - (CAST(n0 AS DOUBLE) * CAST(sxy0 AS DOUBLE)
                    - CAST(sx0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
                   * (CAST(n0 AS DOUBLE) * CAST(sxy0 AS DOUBLE)
                      - CAST(sx0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
                   / (CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
                      - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE)))
                / CAST(n0 AS DOUBLE) AS r0,
                ((CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE)
                  - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
                 - (CAST(n1 AS DOUBLE) * CAST(sxy1 AS DOUBLE)
                    - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
                   * (CAST(n1 AS DOUBLE) * CAST(sxy1 AS DOUBLE)
                      - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
                   / (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
                      - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)))
                / CAST(n1 AS DOUBLE) AS r1
              FROM agg)
            SELECT np AS n,
                   CAST(floor(((rp - r0 - r1) / 2.0)
                        / ((r0 + r1) / (CAST(np AS DOUBLE) - 4.0))
                        * 1000000) AS BIGINT) AS f_micro,
                   CASE WHEN CAST(floor(((rp - r0 - r1) / 2.0)
                          / ((r0 + r1)
                             / (CAST(np AS DOUBLE) - 4.0))
                          * 1000000) AS BIGINT) > 2995732
                        THEN 1 ELSE 0 END AS structural_break
            FROM f
        """,
        "q431_distribution_overlap": """
            WITH cust AS (
              SELECT c_custkey,
                     CASE WHEN c_mktsegment = 'BUILDING'
                          THEN 1 ELSE 0 END AS g
              FROM customer
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
            obs AS (
              SELECT g,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents
              FROM orders o JOIN cust c ON o.o_custkey = c.c_custkey),
            byval AS (
              SELECT cents, CAST(SUM(g) AS BIGINT) AS n1v,
                     CAST(COUNT(*) AS BIGINT) AS nv
              FROM obs GROUP BY 1),
            cum AS (
              SELECT n1v, nv,
                     CAST(SUM(nv) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS ca
              FROM byval),
            tot AS (SELECT CAST(SUM(nv) AS BIGINT) AS n,
                           CAST(SUM(n1v) AS BIGINT) AS n1
                    FROM byval),
            binned AS (
              SELECT least(19, (ca - 1) * 20 // n) AS b,
                     n1v, nv - n1v AS n0v, n, n1
              FROM cum, tot),
            per AS (
              SELECT b, n, n1,
                     CAST(SUM(n1v) AS BIGINT) AS c1,
                     CAST(SUM(n0v) AS BIGINT) AS c0
              FROM binned GROUP BY 1, 2, 3),
            s AS (
              SELECT n, n1, CAST(COUNT(*) AS BIGINT) AS n_bins,
                     CAST(SUM(CAST(floor(abs(
                       CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       - CAST(c0 AS DOUBLE)
                         / CAST(n - n1 AS DOUBLE)) * 1000000)
                       AS BIGINT)) AS BIGINT) AS tv_sum_micro
              FROM per GROUP BY 1, 2)
            SELECT n, n1, n_bins, tv_sum_micro,
                   1000000 - tv_sum_micro // 2 AS overlap_ppm
            FROM s
        """,
        "q432_meta_fixed_effect": """
            WITH per AS MATERIALIZED (
              SELECT c.c_mktsegment,
                     CAST(COUNT(*) AS BIGINT) AS n_i,
                     CAST(SUM(CASE WHEN o.o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS x_i
              FROM orders o JOIN customer c
                ON o.o_custkey = c.c_custkey
              GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_i) AS BIGINT) AS n,
                           CAST(SUM(x_i) AS BIGINT) AS x FROM per),
            t AS (
              SELECT
                CAST(floor((CAST(n_i AS DOUBLE)
                    / ((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(x AS DOUBLE)
                                / CAST(n AS DOUBLE))))
                  * (CAST(x_i AS DOUBLE) / CAST(n_i AS DOUBLE)
                     - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                  * 1000) AS BIGINT) AS wd_milli,
                CAST(floor((CAST(n_i AS DOUBLE)
                    / ((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(x AS DOUBLE)
                                / CAST(n AS DOUBLE))))
                  * (CAST(x_i AS DOUBLE) / CAST(n_i AS DOUBLE)
                     - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(x_i AS DOUBLE) / CAST(n_i AS DOUBLE)
                     - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                  * 1000000) AS BIGINT) AS wdd_micro,
                CAST(floor(CAST(n_i AS DOUBLE)
                    / ((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(x AS DOUBLE)
                                / CAST(n AS DOUBLE)))) AS BIGINT)
                  AS w_floor
              FROM per, tot),
            s AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(wd_milli) AS BIGINT) AS swd,
                     CAST(SUM(wdd_micro) AS BIGINT) AS swdd,
                     CAST(SUM(w_floor) AS BIGINT) AS sw
              FROM t),
            f AS (
              SELECT k,
                     (CAST(swd AS DOUBLE) / 1e3)
                       / CAST(sw AS DOUBLE) AS pooled,
                     CAST(swdd AS DOUBLE) / 1e6
                       - (CAST(swd AS DOUBLE) / 1e3)
                         * (CAST(swd AS DOUBLE) / 1e3)
                         / CAST(sw AS DOUBLE) AS q_stat
              FROM s)
            SELECT k,
                   CAST(floor(pooled * 1000000) AS BIGINT)
                     AS pooled_dev_micro,
                   CAST(floor(q_stat * 1000000) AS BIGINT)
                     AS q_micro,
                   CAST(floor(greatest(0.0, (q_stat - 4.0) / q_stat)
                        * 1000000) AS BIGINT) AS i2_micro,
                   CASE WHEN CAST(floor(q_stat * 1000000) AS BIGINT)
                        > 9487729 THEN 1 ELSE 0 END
                     AS heterogeneous
            FROM f
        """,
        "q433_dominant_period": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            base AS MATERIALIZED (
              SELECT day, CAST(rev AS DOUBLE) / 100.0 AS e
              FROM daily),
            stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                             CAST(SUM(CAST(floor(e) AS BIGINT))
                                  AS BIGINT) AS se_floor
                      FROM base),
            centered AS MATERIALIZED (
              SELECT day,
                     e - CAST(se_floor AS DOUBLE) / CAST(n AS DOUBLE)
                       AS d
              FROM base, stats),
            den AS (SELECT CAST(SUM(CAST(floor(d * d / 1000000.0)
                                    AS BIGINT)) AS BIGINT) AS den_sum
                    FROM centered),
            lags AS (SELECT unnest(generate_series(2, 30)) AS lag),
            lshift AS (
              SELECT l.lag, c.day - l.lag AS day, c.d AS dl
              FROM centered c, lags l),
            joined AS (
              SELECT s.lag,
                     CAST(floor(c.d * s.dl / 1000000.0) AS BIGINT)
                       AS nu
              FROM centered c JOIN lshift s ON c.day = s.day),
            per_lag AS (
              SELECT lag, CAST(SUM(nu) AS BIGINT) AS num_sum
              FROM joined GROUP BY 1),
            scored AS (
              SELECT lag,
                     CAST(floor(CAST(num_sum AS DOUBLE)
                          / CAST(den_sum AS DOUBLE) * 1000000)
                          AS BIGINT) AS acf_micro
              FROM per_lag, den)
            SELECT ROW_NUMBER() OVER (ORDER BY acf_micro DESC, lag)
                     AS rk,
                   lag, acf_micro
            FROM scored
            ORDER BY acf_micro DESC, lag LIMIT 3
        """,
        "q434_rake_keywords": f"""
            WITH toks AS (
              SELECT doc_id, generate_subscripts(arr, 1) - 1 AS pos,
                     unnest(arr) AS w
              FROM (SELECT doc_id, {_TOKS} AS arr FROM documents)),
            seg AS (
              SELECT doc_id, pos, w,
                     SUM(CASE WHEN w IN ('a', 'an', 'and', 'in', 'is', 'of', 'the', 'to') THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS pid
              FROM toks),
            kept AS (SELECT * FROM seg WHERE w NOT IN ('a', 'an', 'and', 'in', 'is', 'of', 'the', 'to')),
            phrases AS MATERIALIZED (
              SELECT doc_id, pid,
                     string_agg(w, ' ' ORDER BY pos) AS phrase,
                     CAST(COUNT(*) AS BIGINT) AS plen
              FROM kept GROUP BY 1, 2),
            words AS (
              SELECT plen, unnest(string_split(phrase, ' ')) AS w
              FROM phrases),
            stats AS (
              SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
                     CAST(SUM(plen) AS BIGINT) AS deg
              FROM words GROUP BY 1),
            wscore AS (
              SELECT w, deg * 1000000 // freq AS ws_micro
              FROM stats),
            pw AS (
              SELECT p.phrase, s.ws_micro
              FROM (SELECT phrase,
                           unnest(string_split(phrase, ' ')) AS w
                    FROM phrases) p
              JOIN wscore s ON p.w = s.w),
            scored AS (
              SELECT phrase,
                     CAST(SUM(ws_micro) AS BIGINT) AS score_micro
              FROM pw GROUP BY 1)
            SELECT ROW_NUMBER() OVER (ORDER BY score_micro DESC,
                     phrase) AS rk,
                   phrase, score_micro
            FROM scored
            ORDER BY score_micro DESC, phrase LIMIT 10
        """,
        "q435_weekday_strength": """
            WITH daily AS MATERIALIZED (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            wd AS (
              SELECT day % 7 AS dow,
                     CAST(COUNT(*) AS BIGINT) AS n_d,
                     CAST(SUM(rev) AS BIGINT) AS s_d
              FROM daily GROUP BY 1),
            tot AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(rev) AS BIGINT) AS s,
                     CAST(SUM(CAST(rev AS HUGEINT)
                          * CAST(rev AS HUGEINT)) AS HUGEINT) AS ss
              FROM daily),
            s2 AS (
              SELECT n, s, ss,
                     CAST(SUM(CAST(floor(CAST(n_d AS DOUBLE)
                       * (CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE)
                            / 100.0
                          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                            / 100.0)
                       * (CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE)
                            / 100.0
                          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                            / 100.0)) AS BIGINT)) AS BIGINT) AS ssb
              FROM wd, tot GROUP BY 1, 2, 3)
            SELECT n, ssb AS ssb_usd2,
                   CAST(floor(CAST(ss AS DOUBLE) / 10000.0
                        - CAST(n AS DOUBLE)
                          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                             / 100.0)
                          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                             / 100.0)) AS BIGINT) AS sst_usd2,
                   CAST(floor(CAST(ssb AS DOUBLE)
                        / (CAST(ss AS DOUBLE) / 10000.0
                           - CAST(n AS DOUBLE)
                             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                                / 100.0)
                             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                                / 100.0)) * 1000000) AS BIGINT)
                     AS weekday_strength_ppm
            FROM s2
        """,
        "q436_xcorr_peak": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM orders GROUP BY 1),
            base AS MATERIALIZED (
              SELECT day, CAST(rev AS DOUBLE) / 100.0 AS y,
                     CAST(cnt AS DOUBLE) AS x
              FROM daily),
            stats AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(floor(y) AS BIGINT)) AS BIGINT)
                       AS sy_floor,
                     CAST(SUM(CAST(floor(x) AS BIGINT)) AS BIGINT)
                       AS sx_floor
              FROM base),
            centered AS MATERIALIZED (
              SELECT day,
                     y - CAST(sy_floor AS DOUBLE) / CAST(n AS DOUBLE)
                       AS dy,
                     x - CAST(sx_floor AS DOUBLE) / CAST(n AS DOUBLE)
                       AS dx
              FROM base, stats),
            dens AS (
              SELECT CAST(SUM(CAST(floor(dy * dy / 1000.0)
                       AS BIGINT)) AS BIGINT) AS dyy,
                     CAST(SUM(CAST(floor(dx * dx * 1e6)
                       AS BIGINT)) AS BIGINT) AS dxx
              FROM centered),
            lags AS (SELECT unnest(generate_series(-7, 7)) AS lag),
            shifted AS (
              SELECT l.lag, c.day - l.lag AS day, c.dx AS dxs
              FROM centered c, lags l),
            joined AS (
              SELECT s.lag,
                     CAST(floor(c.dy * s.dxs) AS BIGINT) AS nu
              FROM centered c JOIN shifted s ON c.day = s.day),
            per_lag AS (
              SELECT lag, CAST(SUM(nu) AS BIGINT) AS num_sum
              FROM joined GROUP BY 1),
            scored AS (
              SELECT lag,
                     CAST(floor(CAST(num_sum AS DOUBLE)
                          / (sqrt(CAST(dyy AS DOUBLE) * 1000.0)
                             * sqrt(CAST(dxx AS DOUBLE) / 1e6))
                          * 1000000) AS BIGINT) AS xcorr_micro
              FROM per_lag, dens)
            SELECT ROW_NUMBER() OVER (ORDER BY xcorr_micro DESC,
                     lag) AS rk,
                   lag, xcorr_micro
            FROM scored
            ORDER BY xcorr_micro DESC, lag LIMIT 3
        """,
        "q437_calibration_slope": """
            WITH vals AS (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS s,
                     CAST(COUNT(*) AS BIGINT) AS cnt,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN 1 ELSE 0 END) AS BIGINT) AS cpos
              FROM orders GROUP BY 1),
            cum AS (
              SELECT s, cnt, cpos,
                     CAST(SUM(cnt) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS ca
              FROM vals),
            tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vals),
            binned AS (
              SELECT least(9, (ca - 1) * 10 // n) AS b,
                     cnt, cpos, ca
              FROM cum, tot),
            per AS (
              SELECT b,
                     CAST(SUM(cnt) AS BIGINT) AS n_b,
                     CAST(SUM(cpos) AS BIGINT) AS x_b,
                     CAST(SUM((2 * ca - cnt + 1) * cnt) AS BIGINT)
                       AS rs2_sum
              FROM binned GROUP BY 1),
            t AS (
              SELECT CAST(floor(CAST(rs2_sum AS DOUBLE)
                       / (2.0 * CAST(n_b AS DOUBLE))
                       / CAST(n AS DOUBLE) * 1000000000) AS BIGINT)
                       AS x,
                     CAST(floor(CAST(x_b AS DOUBLE)
                       / CAST(n_b AS DOUBLE) * 1000000000) AS BIGINT)
                       AS y,
                     CAST(floor((CAST(rs2_sum AS DOUBLE)
                       / (2.0 * CAST(n_b AS DOUBLE))
                       / CAST(n AS DOUBLE))
                       * (CAST(rs2_sum AS DOUBLE)
                          / (2.0 * CAST(n_b AS DOUBLE))
                          / CAST(n AS DOUBLE)) * 1000000000)
                       AS BIGINT) AS xx,
                     CAST(floor((CAST(rs2_sum AS DOUBLE)
                       / (2.0 * CAST(n_b AS DOUBLE))
                       / CAST(n AS DOUBLE))
                       * (CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                       * 1000000000) AS BIGINT) AS xy
              FROM per, tot),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(xx) AS BIGINT) AS sxx,
                     CAST(SUM(xy) AS BIGINT) AS sxy
              FROM t),
            f AS (
              SELECT k,
                     (CAST(k AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                      - (CAST(sx AS DOUBLE) / 1e9)
                        * (CAST(sy AS DOUBLE) / 1e9))
                     / (CAST(k AS DOUBLE)
                          * (CAST(sxx AS DOUBLE) / 1e9)
                        - (CAST(sx AS DOUBLE) / 1e9)
                          * (CAST(sx AS DOUBLE) / 1e9)) AS slope,
                     CAST(sx AS DOUBLE) / 1e9 AS sxd,
                     CAST(sy AS DOUBLE) / 1e9 AS syd
              FROM agg)
            SELECT k,
                   CAST(floor(slope * 1000000) AS BIGINT)
                     AS slope_micro,
                   CAST(floor((syd - slope * sxd)
                        / CAST(k AS DOUBLE) * 1000000) AS BIGINT)
                     AS intercept_micro,
                   CASE WHEN abs(CAST(floor(slope * 1000000)
                          AS BIGINT) - 1000000) < 200000
                        THEN 1 ELSE 0 END AS well_calibrated
            FROM f
        """,
        "q438_msttr": f"""
            WITH toks AS (
              SELECT source, doc_id,
                     (generate_subscripts(arr, 1) - 1) // 100
                       AS chunk,
                     unnest(arr) AS w
              FROM (SELECT source, doc_id, {_TOKS} AS arr
                    FROM documents)),
            per_chunk AS (
              SELECT source, doc_id, chunk,
                     CAST(COUNT(*) AS BIGINT) AS n_tok,
                     CAST(COUNT(DISTINCT w) AS BIGINT) AS n_typ
              FROM toks GROUP BY 1, 2, 3),
            ttr AS (
              SELECT source, n_typ * 1000000 // n_tok AS ttr_ppm
              FROM per_chunk WHERE n_tok = 100)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(ttr_ppm) AS BIGINT) // COUNT(*)
                     AS msttr_ppm
            FROM ttr GROUP BY 1
        """,
        "q439_end_digit_bias": """
            WITH cells AS (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) % 100 AS dd,
                     CAST(COUNT(*) AS BIGINT) AS o
              FROM orders GROUP BY 1),
            tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
            s AS (
              SELECT n, CAST(COUNT(*) AS BIGINT) AS n_cells,
                     CAST(SUM(CAST(floor(
                       (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) / 100.0)
                       * (CAST(o AS DOUBLE)
                          - CAST(n AS DOUBLE) / 100.0)
                       / (CAST(n AS DOUBLE) / 100.0) * 1000000)
                       AS BIGINT)) AS BIGINT) AS chi2_micro
              FROM cells, tot GROUP BY 1)
            SELECT n, n_cells, chi2_micro,
                   CASE WHEN chi2_micro > 123225221 THEN 1 ELSE 0 END
                     AS biased
            FROM s
        """,
        "q440_interorder_burstiness": """
            WITH gaps AS (
              SELECT o_custkey,
                     day - LAG(day) OVER (PARTITION BY o_custkey
                       ORDER BY day, o_orderkey) AS gap
              FROM (SELECT o_custkey, o_orderkey,
                           date_diff('day', DATE '1992-01-01',
                                     CAST(o_orderdate AS DATE))
                             AS day
                    FROM orders)),
            per AS (
              SELECT c.c_mktsegment,
                     CAST(COUNT(*) AS BIGINT) AS n_gaps,
                     CAST(SUM(gap) AS BIGINT) AS s1,
                     CAST(SUM(CAST(gap AS HUGEINT)
                          * CAST(gap AS HUGEINT)) AS HUGEINT) AS s2
              FROM gaps g JOIN customer c
                ON g.o_custkey = c.c_custkey
              WHERE gap IS NOT NULL
              GROUP BY 1)
            SELECT c_mktsegment, n_gaps,
                   CAST(floor(CAST(s1 AS DOUBLE)
                        / CAST(n_gaps AS DOUBLE) * 1000) AS BIGINT)
                     AS mean_gap_millidays,
                   CAST(floor((sqrt(CAST(s2 AS DOUBLE)
                          / CAST(n_gaps AS DOUBLE)
                          - (CAST(s1 AS DOUBLE)
                             / CAST(n_gaps AS DOUBLE))
                            * (CAST(s1 AS DOUBLE)
                               / CAST(n_gaps AS DOUBLE)))
                        - CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                        / (sqrt(CAST(s2 AS DOUBLE)
                            / CAST(n_gaps AS DOUBLE)
                            - (CAST(s1 AS DOUBLE)
                               / CAST(n_gaps AS DOUBLE))
                              * (CAST(s1 AS DOUBLE)
                                 / CAST(n_gaps AS DOUBLE)))
                           + CAST(s1 AS DOUBLE)
                             / CAST(n_gaps AS DOUBLE))
                        * 1000000) AS BIGINT) AS burstiness_micro
            FROM per
        """,
        "q441_crk_concentration": """
            WITH per AS MATERIALIZED (
              SELECT o_custkey,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT)
                       AS cents
              FROM orders GROUP BY 1),
            tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total
                    FROM per),
            top AS (
              SELECT cents,
                     ROW_NUMBER() OVER (ORDER BY cents DESC,
                       o_custkey) AS rk
              FROM per QUALIFY rk <= 8),
            agg AS (
              SELECT CAST(MIN(total) AS BIGINT) AS total,
                     CAST(SUM(CASE WHEN rk <= 1 THEN cents END)
                          AS BIGINT) AS c1,
                     CAST(SUM(CASE WHEN rk <= 4 THEN cents END)
                          AS BIGINT) AS c4,
                     CAST(SUM(CASE WHEN rk <= 8 THEN cents END)
                          AS BIGINT) AS c8
              FROM top, tot)
            SELECT c1 * 1000000 // total AS cr1_ppm,
                   c4 * 1000000 // total AS cr4_ppm,
                   c8 * 1000000 // total AS cr8_ppm
            FROM agg
        """,
        "q442_median_polish": """
            WITH cells AS MATERIALIZED (
              SELECT c.c_mktsegment, o.o_orderpriority,
                     CAST(SUM(CAST(CAST(o.o_totalprice
                         AS DECIMAL(18,2)) * 100 AS BIGINT))
                       AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) / 100.0 AS v
              FROM orders o JOIN customer c
                ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2),
            rowmed AS (
              SELECT c_mktsegment, median(v) AS rm
              FROM cells GROUP BY 1),
            step1 AS MATERIALIZED (
              SELECT c.c_mktsegment, c.o_orderpriority,
                     c.v - r.rm AS v1
              FROM cells c JOIN rowmed r
                ON c.c_mktsegment = r.c_mktsegment),
            colmed AS (
              SELECT o_orderpriority, median(v1) AS cm
              FROM step1 GROUP BY 1),
            resid AS (
              SELECT CAST(floor((s.v1 - cm.cm) * 1000000) AS BIGINT)
                       AS resid_micro
              FROM step1 s JOIN colmed cm
                ON s.o_orderpriority = cm.o_orderpriority)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(MAX(abs(resid_micro)) AS BIGINT)
                     AS max_abs_resid_micro,
                   CAST(SUM(abs(resid_micro)) AS BIGINT)
                     AS sum_abs_resid_micro
            FROM resid
        """,
        "q443_theil_u2": """
            WITH daily AS (
              SELECT date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            lagged AS (
              SELECT rev,
                     LAG(rev, 7) OVER (ORDER BY day) AS f7,
                     LAG(rev, 1) OVER (ORDER BY day) AS f1
              FROM daily),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(rev - f7 AS HUGEINT)
                          * CAST(rev - f7 AS HUGEINT)) AS HUGEINT)
                       AS sse7,
                     CAST(SUM(CAST(rev - f1 AS HUGEINT)
                          * CAST(rev - f1 AS HUGEINT)) AS HUGEINT)
                       AS sse1
              FROM lagged WHERE f7 IS NOT NULL)
            SELECT n,
                   CAST(floor(sqrt(CAST(sse7 AS DOUBLE)
                        / CAST(sse1 AS DOUBLE)) * 1000000) AS BIGINT)
                     AS u2_micro,
                   CASE WHEN sqrt(CAST(sse7 AS DOUBLE)
                          / CAST(sse1 AS DOUBLE)) < 1.0
                        THEN 1 ELSE 0 END AS beats_naive
            FROM agg
        """,
        "q444_lorenz_asymmetry": """
            WITH per AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT)
                       AS cents
              FROM orders GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                           CAST(SUM(cents) AS BIGINT) AS total
                    FROM per),
            agg AS (
              SELECT CAST(MIN(k) AS BIGINT) AS k,
                     CAST(MIN(total) AS BIGINT) AS total,
                     CAST(SUM(CASE WHEN CAST(cents AS HUGEINT)
                            * CAST(k AS HUGEINT)
                            < CAST(total AS HUGEINT)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
                     CAST(SUM(CASE WHEN CAST(cents AS HUGEINT)
                            * CAST(k AS HUGEINT)
                            < CAST(total AS HUGEINT)
                          THEN cents END) AS BIGINT) AS mass_below
              FROM per, tot)
            SELECT k, n_below,
                   CAST(floor((CAST(n_below AS DOUBLE)
                        / CAST(k AS DOUBLE)
                        + CAST(mass_below AS DOUBLE)
                          / CAST(total AS DOUBLE)) * 1000000)
                        AS BIGINT) AS lorenz_asymmetry_micro,
                   CASE WHEN CAST(n_below AS DOUBLE)
                          / CAST(k AS DOUBLE)
                          + CAST(mass_below AS DOUBLE)
                            / CAST(total AS DOUBLE) > 1.0
                          THEN 'whale_driven'
                        WHEN CAST(n_below AS DOUBLE)
                          / CAST(k AS DOUBLE)
                          + CAST(mass_below AS DOUBLE)
                            / CAST(total AS DOUBLE) < 1.0
                          THEN 'long_tail_driven'
                        ELSE 'symmetric' END AS regime
            FROM agg
        """,
        "q445_hoover_index": """
            WITH per AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT)
                       AS cents
              FROM orders GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                           CAST(SUM(cents) AS BIGINT) AS total
                    FROM per),
            agg AS (
              SELECT CAST(MIN(k) AS BIGINT) AS k,
                     CAST(MIN(total) AS BIGINT) AS total,
                     CAST(SUM(abs(CAST(cents AS HUGEINT)
                          * CAST(k AS HUGEINT)
                          - CAST(total AS HUGEINT))) AS HUGEINT)
                       AS sdev_k
              FROM per, tot)
            SELECT k,
                   CAST(floor(CAST(sdev_k AS DOUBLE)
                        / (CAST(k AS DOUBLE) * 2.0
                           * CAST(total AS DOUBLE)) * 1000000)
                        AS BIGINT) AS hoover_ppm
            FROM agg
        """,
        "q446_atkinson2": """
            WITH per AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT)
                       AS cents
              FROM orders GROUP BY 1),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(cents) AS BIGINT) AS total,
                     CAST(SUM(CAST(floor(1e9
                       / CAST(cents AS DOUBLE)) AS BIGINT))
                       AS BIGINT) AS sinv_nano
              FROM per)
            SELECT k,
                   CAST(floor(CAST(k AS DOUBLE)
                        / (CAST(sinv_nano AS DOUBLE) / 1e9))
                        AS BIGINT) AS harmonic_mean_cents,
                   CAST(floor(CAST(total AS DOUBLE)
                        / CAST(k AS DOUBLE)) AS BIGINT)
                     AS mean_cents,
                   CAST(floor((1.0 - (CAST(k AS DOUBLE)
                          / (CAST(sinv_nano AS DOUBLE) / 1e9))
                        / (CAST(total AS DOUBLE)
                           / CAST(k AS DOUBLE))) * 1000000)
                        AS BIGINT) AS atkinson2_micro
            FROM agg
        """,
        "q447_middle_band_share": """
            WITH per AS MATERIALIZED (
              SELECT o_custkey,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT)) AS BIGINT)
                       AS cents
              FROM orders GROUP BY 1),
            med AS (
              SELECT cents AS med FROM (
                SELECT cents, ROW_NUMBER() OVER (ORDER BY cents,
                  o_custkey) AS rk FROM per),
                (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM per)
              WHERE rk = CAST(ceil(CAST(k AS DOUBLE) / 2)
                              AS BIGINT)),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(MIN(med) AS BIGINT) AS median_cents,
                     CAST(SUM(CASE WHEN 4 * cents >= 3 * med
                              AND 4 * cents <= 5 * med
                              THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_band
              FROM per, med)
            SELECT k, median_cents, n_band,
                   n_band * 1000000 // k AS middle_share_ppm
            FROM agg
        """,
        "q448_mad_outliers": """
            WITH per AS MATERIALIZED (
              SELECT o_orderpriority AS priority,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents
              FROM orders),
            med AS (
              SELECT cents AS med FROM (
                SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rk
                FROM per),
                (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM per)
              WHERE rk = CAST(ceil(CAST(k AS DOUBLE) / 2) AS BIGINT)),
            dev AS MATERIALIZED (
              SELECT priority, med, abs(cents - med) AS d
              FROM per, med),
            mad AS (
              SELECT d AS mad FROM (
                SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS rk FROM dev),
                (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM dev)
              WHERE rk = CAST(ceil(CAST(k AS DOUBLE) / 2) AS BIGINT))
            SELECT priority,
                   CAST(MIN(med) AS BIGINT) AS median_cents,
                   CAST(MIN(mad) AS BIGINT) AS mad_cents,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN d * 10000 > mad * 44478
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
                   CAST(SUM(CASE WHEN d * 10000 > mad * 44478
                            THEN 1 ELSE 0 END) AS BIGINT)
                     * 1000000 // CAST(COUNT(*) AS BIGINT) AS out_ppm
            FROM dev, mad
            GROUP BY priority
        """,
        "q449_llr_collocations": f"""
            WITH t AS (SELECT {_TOKS} AS toks FROM documents),
            bg AS MATERIALIZED (
              SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM (
                SELECT toks[i] AS w1, toks[i + 1] AS w2
                FROM t, unnest(range(1, len(toks))) AS u(i)
                WHERE len(toks) >= 2)
              GROUP BY 1, 2),
            m1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
                   FROM bg GROUP BY 1),
            m2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2
                   FROM bg GROUP BY 1),
            nn AS (SELECT CAST(SUM(c12) AS BIGINT) AS nn FROM bg),
            j AS (
              SELECT bg.w1, bg.w2, bg.c12, m1.c1, m2.c2, nn.nn
              FROM bg JOIN m1 USING (w1) JOIN m2 USING (w2), nn
              WHERE bg.c12 >= 5),
            s AS (
              SELECT w1, w2, c12, c1, c2,
                     2.0 * (
                       (CASE WHEN c12 > 0 THEN CAST(c12 AS DOUBLE)
                         * ln((CAST(c12 AS DOUBLE) * CAST(nn AS DOUBLE))
                              / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
                        ELSE 0.0 END)
                       + (CASE WHEN c1 - c12 > 0
                          THEN CAST(c1 - c12 AS DOUBLE)
                           * ln((CAST(c1 - c12 AS DOUBLE)
                                 * CAST(nn AS DOUBLE))
                                / (CAST(c1 AS DOUBLE)
                                   * (CAST(nn AS DOUBLE)
                                      - CAST(c2 AS DOUBLE))))
                          ELSE 0.0 END)
                       + (CASE WHEN c2 - c12 > 0
                          THEN CAST(c2 - c12 AS DOUBLE)
                           * ln((CAST(c2 - c12 AS DOUBLE)
                                 * CAST(nn AS DOUBLE))
                                / ((CAST(nn AS DOUBLE)
                                    - CAST(c1 AS DOUBLE))
                                   * CAST(c2 AS DOUBLE)))
                          ELSE 0.0 END)
                       + (CASE WHEN nn - c1 - c2 + c12 > 0
                          THEN CAST(nn - c1 - c2 + c12 AS DOUBLE)
                           * ln((CAST(nn - c1 - c2 + c12 AS DOUBLE)
                                 * CAST(nn AS DOUBLE))
                                / ((CAST(nn AS DOUBLE)
                                    - CAST(c1 AS DOUBLE))
                                   * (CAST(nn AS DOUBLE)
                                      - CAST(c2 AS DOUBLE))))
                          ELSE 0.0 END)
                     ) AS llr
              FROM j)
            SELECT w1, w2, c12, c1, c2,
                   CAST(floor(llr * 1000000) AS BIGINT) AS llr_micro
            FROM s
            ORDER BY llr_micro DESC, w1, w2
            LIMIT 20
        """,
        "q450_ngram_overlap_decay": f"""
            WITH d AS MATERIALIZED (
              SELECT source, {_TOKS} AS toks FROM documents),
            ev2 AS MATERIALIZED (
              SELECT DISTINCT g FROM (
                SELECT unnest(CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks) - 2 + 2), i -> toks[i] || ' ' || toks[i + 1]) ELSE [] END) AS g
                FROM d WHERE source IN ('src0', 'src1'))),
            tr2 AS MATERIALIZED (
              SELECT DISTINCT g FROM (
                SELECT unnest(CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks) - 2 + 2), i -> toks[i] || ' ' || toks[i + 1]) ELSE [] END) AS g
                FROM d WHERE source NOT IN ('src0', 'src1'))),
            ev3 AS MATERIALIZED (
              SELECT DISTINCT g FROM (
                SELECT unnest(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 3 + 2), i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) ELSE [] END) AS g
                FROM d WHERE source IN ('src0', 'src1'))),
            tr3 AS MATERIALIZED (
              SELECT DISTINCT g FROM (
                SELECT unnest(CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 3 + 2), i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) ELSE [] END) AS g
                FROM d WHERE source NOT IN ('src0', 'src1'))),
            ev5 AS MATERIALIZED (
              SELECT DISTINCT g FROM (
                SELECT unnest(CASE WHEN len(toks) >= 5 THEN list_transform(range(1, len(toks) - 5 + 2), i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] || ' ' || toks[i + 4]) ELSE [] END) AS g
                FROM d WHERE source IN ('src0', 'src1'))),
            tr5 AS MATERIALIZED (
              SELECT DISTINCT g FROM (
                SELECT unnest(CASE WHEN len(toks) >= 5 THEN list_transform(range(1, len(toks) - 5 + 2), i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] || ' ' || toks[i + 4]) ELSE [] END) AS g
                FROM d WHERE source NOT IN ('src0', 'src1'))),
            rows_ AS (
              SELECT 2 AS n,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM ev2) AS n_eval,
                     (SELECT CAST(COUNT(*) AS BIGINT)
                      FROM ev2 WHERE g IN (SELECT g FROM tr2)) AS n_shared
              UNION ALL
              SELECT 3 AS n,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM ev3) AS n_eval,
                     (SELECT CAST(COUNT(*) AS BIGINT)
                      FROM ev3 WHERE g IN (SELECT g FROM tr3)) AS n_shared
              UNION ALL
              SELECT 5 AS n,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM ev5) AS n_eval,
                     (SELECT CAST(COUNT(*) AS BIGINT)
                      FROM ev5 WHERE g IN (SELECT g FROM tr5)) AS n_shared)
            SELECT n, n_eval, n_shared,
                   n_shared * 1000000 // n_eval AS shared_ppm
            FROM rows_
        """,
        "q451_split_balance_audit": """
            WITH cells AS MATERIALIZED (
              SELECT CASE
                       WHEN ((instr('0123456789abcdef',
                               substr(md5(CAST(o_orderkey AS VARCHAR)),
                                      1, 1)) - 1) * 16
                             + (instr('0123456789abcdef',
                                 substr(md5(CAST(o_orderkey AS VARCHAR)),
                                        2, 1)) - 1)) % 10 < 8
                       THEN 'train'
                       WHEN ((instr('0123456789abcdef',
                               substr(md5(CAST(o_orderkey AS VARCHAR)),
                                      1, 1)) - 1) * 16
                             + (instr('0123456789abcdef',
                                 substr(md5(CAST(o_orderkey AS VARCHAR)),
                                        2, 1)) - 1)) % 10 = 8
                       THEN 'val' ELSE 'test' END AS split,
                     o_orderpriority AS priority,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM orders GROUP BY 1, 2),
            ns AS (SELECT split, CAST(SUM(n) AS BIGINT) AS n_s
                   FROM cells GROUP BY 1),
            np_ AS (SELECT priority, CAST(SUM(n) AS BIGINT) AS n_p
                    FROM cells GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells)
            SELECT split, priority, n,
                   CAST(abs(CAST(n AS HUGEINT) * nn - CAST(n_s AS HUGEINT) * n_p)
                        * 1000000 // (CAST(n_s AS HUGEINT) * n_p) AS BIGINT)
                     AS dev_ppm
            FROM cells JOIN ns USING (split) JOIN np_ USING (priority), tot
        """,
        "q452_vocab_overlap_matrix": f"""
            WITH st AS MATERIALIZED (
              SELECT DISTINCT source, tok FROM (
                SELECT source, unnest({_TOKS}) AS tok FROM documents)),
            sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv
                      FROM st GROUP BY 1),
            inter AS (
              SELECT a.source AS sa, b.source AS sb,
                     CAST(COUNT(*) AS BIGINT) AS n_inter
              FROM st a JOIN st b
                ON a.tok = b.tok AND a.source < b.source
              GROUP BY 1, 2)
            SELECT sa, sb, n_inter, x.nv AS na, y.nv AS nb,
                   n_inter * 1000000 // (x.nv + y.nv - n_inter)
                     AS jaccard_ppm
            FROM inter
            JOIN sizes x ON x.source = sa
            JOIN sizes y ON y.source = sb
        """,
        "q453_int8_quantization_audit": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> x::DOUBLE) AS v
                       FROM embeddings),
            w AS (
              SELECT vec_id, v,
                     list_reduce(list_transform(v, x -> abs(x)),
                                 (a, b) -> greatest(a, b)) AS m
              FROM e),
            s AS (
              SELECT vec_id,
                     m / 127.0 AS scale,
                     list_reduce(list_transform(v,
                       x -> (x - floor(x / (m / 127.0) + 0.5)
                                 * (m / 127.0))
                            * (x - floor(x / (m / 127.0) + 0.5)
                                   * (m / 127.0))),
                       (a, b) -> a + b) AS sse,
                     list_reduce(list_transform(v,
                       x -> abs(x - floor(x / (m / 127.0) + 0.5)
                                    * (m / 127.0))),
                       (a, b) -> greatest(a, b)) AS maxe
              FROM w WHERE m > 0)
            SELECT vec_id,
                   CAST(floor(scale * 1000000000) AS BIGINT) AS scale_nano,
                   CAST(floor(sse * 1000000000) AS BIGINT) AS sse_nano,
                   CAST(floor(maxe * 1000000000) AS BIGINT)
                     AS max_err_nano
            FROM s
        """,
        "q454_knn_hubness": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> x::DOUBLE) AS v
                       FROM embeddings),
            s AS (
              SELECT a.vec_id AS src, b.vec_id AS dst,
                     CAST(floor(
                       list_reduce(list_transform(list_zip(a.v, b.v),
                                                   x -> x[1] * x[2]),
                                   (p, q) -> p + q)
                       / (sqrt(list_reduce(list_transform(a.v, x -> x * x),
                                           (p, q) -> p + q))
                          * sqrt(list_reduce(list_transform(b.v,
                                                            x -> x * x),
                                             (p, q) -> p + q)))
                       * 1000000) AS BIGINT) AS sim_micro
              FROM e a JOIN e b ON a.vec_id != b.vec_id),
            top5 AS (
              SELECT src, dst FROM (
                SELECT src, dst,
                       ROW_NUMBER() OVER (PARTITION BY src
                         ORDER BY sim_micro DESC, dst) AS rk
                FROM s)
              WHERE rk <= 5),
            indeg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_deg
                      FROM top5 GROUP BY 1),
            alln AS (
              SELECT e.vec_id, COALESCE(i.in_deg, 0) AS in_deg
              FROM e LEFT JOIN indeg i ON i.dst = e.vec_id)
            SELECT in_deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM alln GROUP BY 1
        """,
        "q455_pq_distortion_audit": _pq_oracle(),
    }
