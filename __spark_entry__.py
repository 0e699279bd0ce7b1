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
# decides coverage when the check is capped.  Regenerated for round 6 from
# CORRECTNESS_r01..r05.json (stalest-green-first):
#   0. the two queries new this round (no driver row yet);
#   1. the 22 queries whose only driver row is from round 1 (stalest);
#   2. the round-2 cohort (the ~26 remaining window slots land here;
#      the rest heads round 7's window);
#   3. round-3, then round-4, then round-5 cohorts (freshest last).
_R6_NEW = [
    "q217_sequence_count_adjacent", "q218_star_apply_monitoring",
    "q219_sequence_count_deadline", "q220_funnel_exact_depth",
]

_LAST_R1 = {
    "q14_time_window", "q15_string_funcs", "q16_datetime_funcs",
    "q17_json_extract", "q18_case_when", "q19_math_funcs",
    "q20_star_join_revenue", "q21_semi_join", "q22_anti_join",
    "q23_left_join_agg", "q24_asof_join", "q25_range_join",
    "q44_dedup_exact", "q45_jaccard_pairs", "q46_minhash_lsh",
    "q47_simhash", "q66_map_functions", "q68_calendar_gapfill",
    "q69_posexplode", "q70_bitwise", "q71_crypto_hash",
    "q72_sliding_window",
}
_LAST_R2 = {
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
_LAST_R3 = {
    "q100_weighted_sample", "q101_repeated_passages",
    "q102_source_overlap", "q103_uniq_merge", "q107_sum_map",
    "q110_dict_get", "q126_entropy", "q127_cramers_v", "q128_welch_ttest",
    "q131_chunking", "q133_weighted_quantile", "q134_lm_quality",
    "q135_quantization", "q136_shard_assignment", "q142_mann_whitney",
    "q144_ks_test", "q148_auc", "q150_student_ttest", "q152_zipf_slope",
    "q153_linear_regression", "q156_ch_dialect", "q159_topk_weighted",
    "q161_quantiles_exact", "q162_ch_dialect_sample_totals",
    "q165_semantic_clusters", "q169_corr_matrix",
    "q172_semantic_decontamination", "q177_ch_dialect_fill",
    "q180_intake_pipeline", "q181_chunk_decontamination",
    "q196_sql_vector_search", "q197_token_budget_mixture",
    "q198_temperature_mixture", "q201_ch_any_join",
    "q202_ch_agg_spellings", "q203_ch_monitoring",
    "q204_hybrid_search_rrf", "q205_ch_if_combinators",
    "q206_ch_event_analytics", "q207_dd_quantile_sketch",
    "q96_dedup_clusters", "q97_dedup_survivors", "q98_bm25_search",
    "q99_posting_stats",
}
_LAST_R4 = {
    "q104_approx_quantiles", "q105_replacing_final", "q106_summing_merge",
    "q108_delta_sum", "q109_interval_union", "q111_with_totals",
    "q112_sample_clause", "q113_funnel_strict_order",
    "q114_max_intersections", "q115_order_priority",
    "q116_priority_by_linestatus", "q117_customer_distribution",
    "q118_promo_revenue", "q119_top_supplier", "q120_small_qty_revenue",
    "q121_disjunctive_revenue", "q122_waiting_suppliers",
    "q129_moving_window_aggs", "q130_gapfill_interpolate",
    "q132_url_functions", "q143_rank_corr", "q145_sequence_count",
    "q146_theils_u", "q147_bounding_ratio", "q149_skew_kurt",
    "q151_avg_weighted", "q157_group_bit", "q158_min_max_map",
    "q160_sequence_next_node", "q163_contingency",
    "q164_nonneg_derivative", "q166_array_enumerate_uniq",
    "q167_group_array_sample", "q168_exponential_moving_average",
    "q178_sliding_dau", "q179_median_abs_deviation",
    "q183_cohort_retention_matrix", "q184_session_depth", "q185_top_paths",
    "q186_time_to_conversion", "q187_last_touch_attribution",
    "q188_funnel_report", "q189_cohort_arpu",
    "q190_basket_size_distribution", "q192_collapsing_final",
    "q193_versioned_collapsing", "q208_sql_sequence_times",
    "q209_passage_excision", "q210_char_entropy",
    "q211_sample_offset_panels",
}
# everything else with a driver row was checked in round 5 (freshest)

_R6_NEW_IDX = {k: i for i, k in enumerate(_R6_NEW)}


def _ordered(mapping: dict) -> dict:
    def rank(k: str):
        if k in _R6_NEW_IDX:
            return (0, _R6_NEW_IDX[k])
        if k in _LAST_R1:
            return (1, 0)  # stalest green
        if k in _LAST_R2:
            return (2, 0)
        if k in _LAST_R3:
            return (3, 0)
        if k in _LAST_R4:
            return (4, 0)
        return (5, 0)  # round-5 green, freshest
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
