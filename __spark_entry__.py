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
# reach the hard gate each round. Round-5 priority order (per the
# round-4 VERDICT's explicit ask, item 3):
#   1. the 24 queries whose newest driver evidence was still
#      CORRECTNESS_r01 after round 4 — the head slots were promised
#      to them; after this sweep no query's driver evidence is older
#      than r04,
#   2. queries NEW or CHANGED in round 5 — together with cohort 1
#      this fills the 50 slots EXACTLY (slot 50 = q96):
#      new: q110 pack-then-split segments, q111 BM25, q112 chunking,
#      q113 weighted sampling, q114 trigram novelty, q115 hard
#      negatives, q116 dedup-rate audit, q117 hierarchical semantic
#      dedup, q118 hybrid RRF, q119 hot trigrams, q120 RANGE-frame
#      moving average, q121 gap-fill LOCF, q122 word entropy, q123
#      embedding dim stats (clamped-residue std), q124 chunk-dedup
#      pipeline, q125 curriculum buckets;
#      changed: q88 (anchor cap + checkpointed fit input), q97
#      (explicit floor both engines), q83/q92 (pack_assignments
#      carries `cum`), q75/q76/q93-q96 (warning-free seed numbering;
#      q96 also the pinned ADC broadcast) — changed code must
#      re-face the official gate,
#   3. everything else, least-recently-verified first (r02/r03
#      evidence, then the r04-verified block). All 164 queries were
#      re-proven locally at sf0.01 against DuckDB this round
#      regardless of sweep position (driver-style full sweeps, 0
#      fails — see PERFORMANCE.md round-5 end-state).
# Every name is asserted against the registry at import time (see
# the assert after the list).
_SWEEP_PRIORITY = [
    # -- 1. the r01-evidence cohort (deferred from r04, head slots) --
    "q01_pricing_summary", "q03_topk_revenue", "q04_exists_priority",
    "q05_region_volume", "q06_predicate_revenue", "q07_left_join_enrich",
    "q11_keyed_dedup_first", "q13_union_distinct", "q14_intersect",
    "q16_except_all", "q19_window_lag_lead", "q20_window_rank_suite",
    "q21_cube", "q23_grouping_sets", "q24_count_distinct",
    "q32b_shipmode_priority", "q34b_nation_trade_volume",
    "q35b_returned_item_ranking", "q36b_large_order_customers",
    "q41_date_dim_build", "q44_speed_coercion", "q50_string_funcs",
    "q51_json_extract", "q65_winnow_fingerprint",
    # -- 2. new or changed in round 5 --
    "q110_pack_segments", "q111_bm25_topk", "q112_doc_chunks",
    "q113_weighted_sample", "q114_ngram_novelty",
    "q115_hard_negatives", "q116_dedup_rate_by_source",
    "q117_semantic_dedup_hier", "q118_hybrid_rrf", "q119_hot_ngrams",
    "q120_moving_avg_range", "q121_gap_fill_locf",
    "q122_word_entropy", "q123_embedding_dim_stats",
    "q124_chunk_dedup_pipeline", "q125_curriculum_buckets",
    "q88_semantic_dedup", "q97_mixture_sample",
    "q83_sequence_pack", "q92_curation_e2e",
    "q75_kmeans", "q76_ivf_kmeans_topk",
    "q93_hier_kmeans", "q94_hier_ivf_topk",
    "q95_pq_encode", "q96_pq_adc_topk",
    # -- late-round-5 additions, deliberately PAST slot 50: placing
    # them in section 2 would push the changed q95/q96 out of the
    # hard gate. All are locally sf0.01-parity-proven; they take
    # head slots in the ROUND-6 sweep as never-driver-verified --
    "q126_positive_pairs", "q127_source_quota_filter",
    # analytics suite (funnel/retention/interp/outliers/PII/
    # pagerank/winsorize + JL projection and PCA power iteration)
    "q128_funnel_conversion", "q129_retention_cohorts",
    "q130_gap_fill_interp", "q131_outlier_mad", "q132_pii_scrub",
    "q133_copurchase_pagerank", "q134_random_projection",
    "q135_pca_power_iteration", "q136_winsorized_stats",
    "q137_event_transitions", "q138_knn_label_audit",
    "q139_label_prototype_margin", "q140_conversion_latency",
    "q141_snapshot_diff", "q142_incremental_agg_merge",
    "q143_bpe_merges", "q144_ab_test", "q145_ewma_revenue",
    "q146_corr_suite", "q147_kaplan_meier", "q148_trend_forecast",
    "q149_cusum_changepoint", "q150_cross_source_overlap",
    "q151_length_drift_psi", "q152_knn_label_audit_ann",
    "q153_association_rules", "q154_session_paths",
    "q155_multisignal_dedup_audit", "q156_product_health_e2e",
    "q157_pca_two_components", "q158_bigram_logprob",
    # -- 3. least-recently-verified (r02/r03 evidence) --
    "q77_zorder_key", "q48_array_agg",
    "q61_ngram_jaccard", "q38_asof_join", "q39_asof_join_bucketed",
    "q68_tfidf_topterms", "q69_decontaminate",
    "q49_posexplode", "q91_running_totals_batch",
    "q47_conditionals", "q56_map_ops", "q57_struct_ops",
    "q66_quality_filter_pipeline", "q67_stratified_sample",
    "q73_embedding_stats",
    # ---- slot-50 boundary falls in this r03 block ----
    "q32_date_parts", "q33_time_parts",
    "q81_multimodal_features", "q59_cross_join",
    "q106_salted_aggregate", "q28b_approx_aggregates",
    "q80_multimodal_decode", "q35_tumbling_window",
    "q90_stream_dedup_batch", "q36_sliding_window", "q107_salted_join",
    "q34_epoch_duration", "q28_percentiles", "q37_sessionization",
    "q58_unpivot", "q45_math_suite", "q105_smoke_limit",
    "q46_datetime_suite", "q102_in_subquery",
    "q101_correlated_exists", "q100_scalar_subquery",
    "q104_above_group_avg", "q103_cte_pipeline",
    "q108_scd2_merge", "q109_compaction", "q63_simhash_neardup",
    # -- r04-verified block (freshest evidence, tail) --
    "q78_embedding_quantize", "q84_dataset_split",
    "q85_repetition_filter", "q86_incremental_dedup",
    "q87_unigram_logprob", "q79_matryoshka_truncate",
    "q89_split_leakage", "q98_length_buckets",
    "q62_minhash_lsh", "q64_dedup_clusters", "q74_ivf_ann_topk",
    "q82_frame_sample",
    "q70_cosine_topk", "q71_cosine_neardup", "q72_lsh_ann_topk",
    "q26_sort_limit_topk", "q56b_text_normalize", "q52_token_count",
    "q60_exact_dedup", "q43_haversine", "q54_language_id",
    "q29_pk_uniqueness", "q40_dim_build", "q42_fact_derived_keys",
    "q53_quality_score", "q10_distinct_dedup", "q25_agg_stats",
    "q09_anti_join", "q30_fk_orphans", "q12_union_all", "q15_except",
    "q22_rollup", "q17_window_topk_per_group", "q08_semi_join",
    "q02_filter_pushdown", "q18_window_running_sum", "q55_fingerprint",
    "q27_pivot", "q33b_promo_revenue_share", "q31_range_join",
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
