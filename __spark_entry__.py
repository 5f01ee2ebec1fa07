"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in citybikedatawarehouse_spark/plans/ — one
registered entry per operator from SURVEY.md section 2 (and the
section 2.4 north-star extensions). This module only re-exports the
registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may load this file from any CWD; the engine package
# lives next to it
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from citybikedatawarehouse_spark.plans.catalog import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's correctness sweep records the FIRST 50 entries of
# this dict, in dict order — so dict order decides which queries
# reach the hard gate each round. Round-12 priority order (per the
# round-11 VERDICT's explicit ask, item 5 — keep the rotation
# honest, least-recently-driver-verified first):
#   1. the new round-12 queries (q292 streaming CDC source, q293
#      CDC replication, q294 cluster evolution) — driver rows the
#      round they ship,
#   2. the round-6 evidence block, now stalest (q129-q158,
#      q100-q105, q28/q28b, q32-q39, q108 — 47 queries, driver rows
#      6 rounds old), filling the 50-slot gate exactly,
#   3. then the rest in ascending evidence freshness, with the 50
#      queries CORRECTNESS_r11 just proved (q287-q291, the r05
#      remainder block) at the very tail — freshest evidence last.
# All registered queries are re-proven locally at sf0.01 against
# DuckDB every round regardless of sweep position (driver-style
# full sweeps, scripts/full_sweep.py — see PERFORMANCE.md).
# Every name is asserted against the registry at import time (see
# the assert after the list).
_SWEEP_PRIORITY = [
    "q292_fl_changes_stream", "q293_fl_replicate",
    "q294_fl_set_zorder",
    "q129_retention_cohorts",
    "q130_gap_fill_interp", "q131_outlier_mad", "q132_pii_scrub",
    "q133_copurchase_pagerank", "q134_random_projection",
    "q135_pca_power_iteration", "q136_winsorized_stats",
    "q137_event_transitions", "q138_knn_label_audit",
    "q139_label_prototype_margin", "q140_conversion_latency",
    "q141_snapshot_diff", "q142_incremental_agg_merge", "q143_bpe_merges",
    "q144_ab_test", "q145_ewma_revenue", "q146_corr_suite",
    "q147_kaplan_meier", "q148_trend_forecast", "q149_cusum_changepoint",
    "q150_cross_source_overlap", "q151_length_drift_psi",
    "q152_knn_label_audit_ann", "q153_association_rules",
    "q154_session_paths", "q155_multisignal_dedup_audit",
    "q156_product_health_e2e", "q157_pca_two_components",
    "q158_bigram_logprob", "q100_scalar_subquery",
    "q101_correlated_exists", "q102_in_subquery", "q103_cte_pipeline",
    "q104_above_group_avg", "q105_smoke_limit", "q28_percentiles",
    "q28b_approx_aggregates", "q32_date_parts", "q33_time_parts",
    "q34_epoch_duration", "q35_tumbling_window", "q36_sliding_window",
    "q37_sessionization", "q38_asof_join", "q39_asof_join_bucketed",
    "q108_scd2_merge", "q159_bpe_encode", "q160_semantic_decontaminate",
    "q161_cluster_safe_split", "q162_temperature_mixture",
    "q163_cdc_chunk_dedup", "q164_dsir_resample", "q165_ivfpq_topk",
    "q166_lexical_diversity", "q167_index_drift", "q168_key_skew_audit",
    "q169_entity_match", "q170_lasttouch_attribution",
    "q171_geo_neighbor_pairs", "q172_lateral_topn", "q173_rolling_wau",
    "q174_equidepth_bins", "q175_cohort_ltv",
    "q176_triangle_participation", "q177_rater_agreement",
    "q178_cluster_purity", "q179_copurchase_communities",
    "q180_linear_attribution", "q181_rfm_segments",
    "q182_ngram_containment", "q183_mann_whitney", "q184_chi_squared",
    "q185_dow_seasonality", "q186_trade_flows", "q187_segment_trend",
    "q188_source_jsd", "q189_graph_stats", "q190_kcore", "q191_ann_recall",
    "q192_audio_windows", "q193_revenue_streaks",
    "q194_quality_canonicals", "q195_phrase_search", "q196_collocations",
    "q197_link_prediction", "q198_supplier_hhi", "q199_ship_latency",
    "q200_return_rates", "q201_dup_cluster_census", "q202_discount_bands",
    "q203_seasonal_anomalies", "q204_growth_accounting", "q205_stickiness",
    "q206_abc_classification", "q207_windowed_funnel",
    "q208_purchase_gaps", "q209_table_health", "q210_key_skew_census",
    "q211_silhouette", "q212_sorted_neighborhood",
    "q213_order_count_distribution", "q214_large_volume_customers",
    "q215_bfs_reach", "q216_item_similarity", "q217_theil_sen_trend",
    "q218_revenue_deciles", "q219_gate_bias_audit",
    "q220_purchase_sequences", "q221_forecast_backtest",
    "q222_mutual_information", "q223_contribution_rollup",
    "q224_similarity_histogram", "q225_novelty_curve",
    "q226_bm25_snippets", "q227_top_supplier",
    "q228_small_quantity_revenue", "q229_disjunctive_revenue",
    "q230_sole_supplier_orders", "q231_rich_idle_customers",
    "q232_market_share", "q233_parttype_profit",
    "q234_symspell_fuzzy_join", "q235_mmr_rerank", "q236_kcenter_coreset",
    "q237_hitrate_eval", "q238_calibration_curve",
    "q239_textrank_keywords", "q240_markov_attribution",
    "q241_gdpr_cascade_audit", "q242_weighted_quantiles",
    "q243_countmin_heavy_hitters", "q244_hll_distinct",
    "q245_bloom_screen", "q246_cuped_ab", "q247_bootstrap_ci",
    "q248_target_encoding", "q249_model_auc", "q250_learning_curve",
    "q251_pareto_frontier", "q252_cdc_apply", "q253_ndcg_at_10",
    "q254_ipf_mixture", "q255_column_stats", "q256_fd_audit",
    "q257_joinsize_estimate", "q258_benford_audit", "q77_zorder_key",
    "q48_array_agg", "q61_ngram_jaccard", "q68_tfidf_topterms",
    "q69_decontaminate", "q49_posexplode", "q91_running_totals_batch",
    "q47_conditionals", "q56_map_ops", "q57_struct_ops",
    "q66_quality_filter_pipeline", "q67_stratified_sample",
    "q73_embedding_stats", "q81_multimodal_features", "q59_cross_join",
    "q106_salted_aggregate", "q80_multimodal_decode",
    "q90_stream_dedup_batch", "q107_salted_join", "q58_unpivot",
    "q45_math_suite", "q46_datetime_suite", "q109_compaction",
    "q63_simhash_neardup", "q78_embedding_quantize", "q84_dataset_split",
    "q259_simpson_audit", "q260_revenue_deciles_ranged",
    "q261_histogram_quantiles", "q262_triangle_sample_estimate",
    "q263_filtered_ann_topk", "q264_ivm_join_view",
    "q265_grouped_hll_distinct", "q266_cdc_extract",
    "q267_interval_islands", "q268_k_anonymity", "q269_watermark_lateness",
    "q270_bucket_digest_diff", "q271_variant_shred", "q272_pysource_scan",
    "q273_scd2_pit_lookup", "q274_udtf_chunks", "q275_kmv_overlap",
    "q276_kmv_overlap_matrix", "q277_rolling_hll_distinct",
    "q278_zonemap_prune", "q279_feature_hashing", "q280_time_travel",
    "q281_zorder_zonemap_prune", "q282_sampled_aggregate",
    "q283_manifest_pruned_read", "q284_stream_manifest_sink",
    "q285_filelist_merge", "q286_filelist_delete_mor",
    "q85_repetition_filter", "q86_incremental_dedup",
    "q87_unigram_logprob", "q79_matryoshka_truncate", "q89_split_leakage",
    "q98_length_buckets", "q62_minhash_lsh", "q64_dedup_clusters",
    "q74_ivf_ann_topk", "q82_frame_sample", "q70_cosine_topk",
    "q71_cosine_neardup", "q72_lsh_ann_topk", "q26_sort_limit_topk",
    "q56b_text_normalize", "q52_token_count", "q60_exact_dedup",
    "q43_haversine", "q54_language_id", "q29_pk_uniqueness",
    "q40_dim_build", "q42_fact_derived_keys", "q53_quality_score",
    "q10_distinct_dedup", "q25_agg_stats", "q09_anti_join",
    "q30_fk_orphans", "q12_union_all", "q15_except", "q22_rollup",
    "q17_window_topk_per_group", "q08_semi_join", "q02_filter_pushdown",
    "q18_window_running_sum", "q55_fingerprint", "q27_pivot",
    "q33b_promo_revenue_share", "q31_range_join", "q01_pricing_summary",
    "q03_topk_revenue", "q04_exists_priority", "q05_region_volume",
    "q06_predicate_revenue", "q07_left_join_enrich",
    "q11_keyed_dedup_first", "q13_union_distinct", "q287_schema_evolution",
    "q288_fl_changes", "q289_fl_restore", "q290_fl_optimize",
    "q291_fl_constraints", "q14_intersect", "q16_except_all",
    "q19_window_lag_lead", "q20_window_rank_suite", "q21_cube",
    "q23_grouping_sets", "q24_count_distinct", "q32b_shipmode_priority",
    "q34b_nation_trade_volume", "q35b_returned_item_ranking",
    "q36b_large_order_customers", "q41_date_dim_build",
    "q44_speed_coercion", "q50_string_funcs", "q51_json_extract",
    "q65_winnow_fingerprint", "q110_pack_segments", "q111_bm25_topk",
    "q112_doc_chunks", "q113_weighted_sample", "q114_ngram_novelty",
    "q115_hard_negatives", "q116_dedup_rate_by_source",
    "q117_semantic_dedup_hier", "q118_hybrid_rrf", "q119_hot_ngrams",
    "q120_moving_avg_range", "q121_gap_fill_locf", "q122_word_entropy",
    "q123_embedding_dim_stats", "q124_chunk_dedup_pipeline",
    "q125_curriculum_buckets", "q88_semantic_dedup", "q97_mixture_sample",
    "q83_sequence_pack", "q92_curation_e2e", "q75_kmeans",
    "q76_ivf_kmeans_topk", "q93_hier_kmeans", "q94_hier_ivf_topk",
    "q95_pq_encode", "q96_pq_adc_topk", "q126_positive_pairs",
    "q127_source_quota_filter", "q128_funnel_conversion",
]

# a stale/renamed entry must fail HERE, at import time, not as a
# KeyError mid-sweep that takes the whole gate down
_unknown = set(_SWEEP_PRIORITY) - set(QUERIES)
assert not _unknown, f"_SWEEP_PRIORITY names not in registry: {_unknown}"
assert len(_SWEEP_PRIORITY) == len(set(_SWEEP_PRIORITY)), (
    "_SWEEP_PRIORITY has duplicates"
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2,
    in driver-sweep priority order (see _SWEEP_PRIORITY)."""
    ordered = {n: QUERIES[n] for n in _SWEEP_PRIORITY}
    # safety: anything registered but not in the priority list still
    # ships (appended at the end) rather than silently disappearing
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (absent -> rows-only check)."""
    return dict(ORACLES)
