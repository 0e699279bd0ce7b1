"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`ed_clickhouse_spark.suite` — every operator from
SURVEY.md §2 is a named query there with (where SQL-expressible) a DuckDB
oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ed_clickhouse_spark.suite import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver checks the first ~50 registry entries per round, so ordering
# decides coverage when the check is capped. Priority (sets regenerated
# from CORRECTNESS_r01/r02.json at the start of round 3):
#   1. queries with NO correctness row in any round (new) — first;
#   2. queries whose only row is the round-1 run (stale green);
#   3. queries re-verified in round 2 (freshest green) — last.
_R2_CHECKED = {
    "q12_collect_sets", "q26_theta_join", "q27_topk_per_group",
    "q28_lag_gap", "q29_running_sum", "q30_ntile_rank", "q31_sessionize",
    "q32_funnel", "q33_first_last_value", "q34_union_all_envelope",
    "q35_intersect", "q36_except", "q37_array_ops", "q38_explode_tokens",
    "q39_lang_stats", "q40_quality_score", "q41_token_counts",
    "q42_fingerprint_dups", "q43_language_id", "q48_ann_cosine_topk",
    "q49_embedding_stats", "q50_ann_lsh", "q51_stats_moments",
    "q52_correlation", "q53_exists_subquery", "q65_nn_all_vectors",
    "q67_higher_order_fns", "q73_shipping_priority", "q74_returned_items",
    "q75_large_volume_customers", "q76_full_outer_join", "q77_date_format",
    "q78_try_cast", "q79_nth_value", "q80_heavy_hitters",
    "q81_train_split", "q82_repetition_score", "q83_pii_scrub",
    "q84_length_histogram", "q85_mixture_weights", "q86_sequence_packing",
    "q87_ann_ivf", "q88_filtered_ann", "q89_decontamination",
    "q90_quality_filter", "q91_stratified_sample", "q92_ngram_topk",
    "q93_retention", "q94_sequence_match", "q95_window_funnel",
}
_R1_CHECKED = {
    "q01_pricing_summary", "q02_filter_project", "q03_top_orders",
    "q04_daily_revenue", "q05_events_dau", "q06_approx_distinct",
    "q07_quantiles", "q08_argmax", "q09_rollup", "q10_cube_grouping",
    "q11_conditional_agg", "q13_pivot", "q14_time_window",
    "q15_string_funcs", "q16_datetime_funcs", "q17_json_extract",
    "q18_case_when", "q19_math_funcs", "q20_star_join_revenue",
    "q21_semi_join", "q22_anti_join", "q23_left_join_agg", "q24_asof_join",
    "q25_range_join", "q44_dedup_exact", "q45_jaccard_pairs",
    "q46_minhash_lsh", "q47_simhash", "q54_in_subquery",
    "q55_scalar_subquery", "q56_cte_share", "q57_event_transitions",
    "q58_percent_rank", "q59_string_extra", "q60_distinct_pairs",
    "q61_grouping_sets", "q62_session_window", "q63_unpivot",
    "q64_range_frame", "q66_map_functions", "q68_calendar_gapfill",
    "q69_posexplode", "q70_bitwise", "q71_crypto_hash",
    "q72_sliding_window",
}


# Within the never-checked rank, order by FEATURE DIVERSITY: ~109
# round-3 queries have no driver row yet and the per-round check caps
# around 50, so the first ~50 should span every distinctive new family
# (dialect, MergeTree engines, states, LLM capstones, search, stats,
# product analytics, TPC-H) rather than run in numeric registration
# order. Queries not listed follow in registration order.
_R3_PRIORITY = [
    # ClickHouse dialect end-to-end
    "q201_ch_any_join", "q202_ch_agg_spellings", "q203_ch_monitoring",
    "q205_ch_if_combinators", "q206_ch_event_analytics",
    "q207_dd_quantile_sketch",
    "q196_sql_vector_search", "q156_ch_dialect",
    "q162_ch_dialect_sample_totals", "q177_ch_dialect_fill",
    "q111_with_totals", "q112_sample_clause",
    # MergeTree engine family + states + dictionaries
    "q105_replacing_final", "q106_summing_merge", "q192_collapsing_final",
    "q193_versioned_collapsing", "q103_uniq_merge", "q110_dict_get",
    "q107_sum_map", "q161_quantiles_exact", "q159_topk_weighted",
    # LLM-pipeline capstones
    "q180_intake_pipeline", "q181_chunk_decontamination",
    "q165_semantic_clusters", "q172_semantic_decontamination",
    "q96_dedup_clusters", "q97_dedup_survivors", "q101_repeated_passages",
    "q102_source_overlap", "q100_weighted_sample", "q131_chunking",
    "q133_weighted_quantile", "q134_lm_quality", "q135_quantization",
    "q136_shard_assignment", "q152_zipf_slope", "q197_token_budget_mixture",
    "q198_temperature_mixture",
    # search
    "q98_bm25_search", "q99_posting_stats", "q204_hybrid_search_rrf",
    # statistics family
    "q126_entropy", "q127_cramers_v", "q128_welch_ttest",
    "q142_mann_whitney", "q144_ks_test", "q148_auc", "q150_student_ttest",
    "q153_linear_regression", "q169_corr_matrix",
    # product analytics + sequences
    "q178_sliding_dau", "q183_cohort_retention_matrix", "q184_session_depth",
    "q185_top_paths", "q187_last_touch_attribution",
    "q194_sequence_match_times", "q195_funnel_strict_dedup",
    # TPC-H closure + ops monitoring
    "q175_local_supplier_volume", "q176_forecast_revenue_change",
    "q125_market_share", "q199_duplicate_rate_by_source",
    "q200_fulfillment_lead_time",
]
_R3_IDX = {k: i for i, k in enumerate(_R3_PRIORITY)}


def _ordered(mapping: dict) -> dict:
    def rank(k: str):
        if k in _R2_CHECKED:
            return (2, 0)
        if k in _R1_CHECKED:
            return (1, 0)
        return (0, _R3_IDX.get(k, len(_R3_PRIORITY)))  # never checked — first

    # Python's sort is stable: registration order is kept within a rank.
    keys = sorted(mapping, key=rank)
    return {k: mapping[k] for k in keys}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for approximate/hash-based
    ops — the driver records the weaker rows-only check for those)."""
    return _ordered(dict(ORACLES))
