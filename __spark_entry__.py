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
# decides coverage when the check is capped.  Round-7 rotation is fully
# data-driven: each query's latest driver-checked round (regenerated from
# CORRECTNESS_r01..r06.json), ordered stalest-green-first; queries with no
# driver row yet (new this round) sort before everything else; registration
# order breaks ties (Python's sort is stable).  After r6 the histogram is
# {r2: 26, r3: 44, r4: 50, r5: 50, r6: 50} — the r7 window takes the whole
# r2 cohort plus the 24 stalest r3 entries, leaving no green older than r3.
_LATEST_CHECKED_ROUND = {
    "q01_pricing_summary": 5, "q02_filter_project": 5, "q03_top_orders": 5,
    "q04_daily_revenue": 5, "q05_events_dau": 5, "q06_approx_distinct": 5,
    "q07_quantiles": 5, "q08_argmax": 5, "q09_rollup": 5,
    "q100_weighted_sample": 3, "q101_repeated_passages": 3, "q102_source_overlap": 3,
    "q103_uniq_merge": 3, "q104_approx_quantiles": 4, "q105_replacing_final": 4,
    "q106_summing_merge": 4, "q107_sum_map": 3, "q108_delta_sum": 4,
    "q109_interval_union": 4, "q10_cube_grouping": 5, "q110_dict_get": 3,
    "q111_with_totals": 4, "q112_sample_clause": 4, "q113_funnel_strict_order": 4,
    "q114_max_intersections": 4, "q115_order_priority": 4, "q116_priority_by_linestatus": 4,
    "q117_customer_distribution": 4, "q118_promo_revenue": 4, "q119_top_supplier": 4,
    "q11_conditional_agg": 5, "q120_small_qty_revenue": 4, "q121_disjunctive_revenue": 4,
    "q122_waiting_suppliers": 4, "q123_idle_customers": 5, "q124_volume_shipping": 5,
    "q125_market_share": 5, "q126_entropy": 3, "q127_cramers_v": 3,
    "q128_welch_ttest": 3, "q129_moving_window_aggs": 4, "q12_collect_sets": 6,
    "q130_gapfill_interpolate": 4, "q131_chunking": 3, "q132_url_functions": 4,
    "q133_weighted_quantile": 3, "q134_lm_quality": 3, "q135_quantization": 3,
    "q136_shard_assignment": 3, "q137_topk_values": 5, "q138_value_histogram": 5,
    "q139_any_join": 5, "q13_pivot": 5, "q140_running_difference": 5,
    "q141_pq_ann": 5, "q142_mann_whitney": 3, "q143_rank_corr": 4,
    "q144_ks_test": 3, "q145_sequence_count": 4, "q146_theils_u": 4,
    "q147_bounding_ratio": 4, "q148_auc": 3, "q149_skew_kurt": 4,
    "q14_time_window": 6, "q150_student_ttest": 3, "q151_avg_weighted": 4,
    "q152_zipf_slope": 3, "q153_linear_regression": 3, "q154_lttb_downsample": 5,
    "q155_ngram_distance": 5, "q156_ch_dialect": 3, "q157_group_bit": 4,
    "q158_min_max_map": 4, "q159_topk_weighted": 3, "q15_string_funcs": 6,
    "q160_sequence_next_node": 4, "q161_quantiles_exact": 3, "q162_ch_dialect_sample_totals": 3,
    "q163_contingency": 4, "q164_nonneg_derivative": 4, "q165_semantic_clusters": 3,
    "q166_array_enumerate_uniq": 4, "q167_group_array_sample": 4, "q168_exponential_moving_average": 4,
    "q169_corr_matrix": 3, "q16_datetime_funcs": 6, "q170_max_intersections_position": 5,
    "q171_uniq_up_to": 5, "q172_semantic_decontamination": 3, "q173_count_substrings": 5,
    "q174_transform_map": 5, "q175_local_supplier_volume": 5, "q176_forecast_revenue_change": 5,
    "q177_ch_dialect_fill": 3, "q178_sliding_dau": 4, "q179_median_abs_deviation": 4,
    "q17_json_extract": 6, "q180_intake_pipeline": 3, "q181_chunk_decontamination": 3,
    "q182_conditional_argmax": 5, "q183_cohort_retention_matrix": 4, "q184_session_depth": 4,
    "q185_top_paths": 4, "q186_time_to_conversion": 4, "q187_last_touch_attribution": 4,
    "q188_funnel_report": 4, "q189_cohort_arpu": 4, "q18_case_when": 6,
    "q190_basket_size_distribution": 4, "q191_supplier_concentration": 5, "q192_collapsing_final": 4,
    "q193_versioned_collapsing": 4, "q194_sequence_match_times": 5, "q195_funnel_strict_dedup": 5,
    "q196_sql_vector_search": 3, "q197_token_budget_mixture": 3, "q198_temperature_mixture": 3,
    "q199_duplicate_rate_by_source": 5, "q19_math_funcs": 6, "q200_fulfillment_lead_time": 5,
    "q201_ch_any_join": 3, "q202_ch_agg_spellings": 3, "q203_ch_monitoring": 3,
    "q204_hybrid_search_rrf": 3, "q205_ch_if_combinators": 3, "q206_ch_event_analytics": 3,
    "q207_dd_quantile_sketch": 3, "q208_sql_sequence_times": 4, "q209_passage_excision": 4,
    "q20_star_join_revenue": 6, "q210_char_entropy": 4, "q211_sample_offset_panels": 4,
    "q212_ab_test_ztest": 5, "q213_foreach_centroids": 5, "q214_date_corner_report": 5,
    "q215_vocab_combinators": 5, "q216_json_props_profile": 5, "q217_sequence_count_adjacent": 6,
    "q218_star_apply_monitoring": 6, "q219_sequence_count_deadline": 6, "q21_semi_join": 6,
    "q220_funnel_exact_depth": 6, "q22_anti_join": 6, "q23_left_join_agg": 6,
    "q24_asof_join": 6, "q25_range_join": 6, "q26_theta_join": 6,
    "q27_topk_per_group": 2, "q28_lag_gap": 2, "q29_running_sum": 2,
    "q30_ntile_rank": 2, "q31_sessionize": 2, "q32_funnel": 2,
    "q33_first_last_value": 2, "q34_union_all_envelope": 2, "q35_intersect": 2,
    "q36_except": 2, "q37_array_ops": 2, "q38_explode_tokens": 2,
    "q39_lang_stats": 2, "q40_quality_score": 2, "q41_token_counts": 2,
    "q42_fingerprint_dups": 2, "q43_language_id": 2, "q44_dedup_exact": 6,
    "q45_jaccard_pairs": 6, "q46_minhash_lsh": 6, "q47_simhash": 6,
    "q48_ann_cosine_topk": 6, "q49_embedding_stats": 2, "q50_ann_lsh": 2,
    "q51_stats_moments": 6, "q52_correlation": 6, "q53_exists_subquery": 6,
    "q54_in_subquery": 5, "q55_scalar_subquery": 5, "q56_cte_share": 5,
    "q57_event_transitions": 5, "q58_percent_rank": 5, "q59_string_extra": 5,
    "q60_distinct_pairs": 5, "q61_grouping_sets": 5, "q62_session_window": 5,
    "q63_unpivot": 5, "q64_range_frame": 5, "q65_nn_all_vectors": 2,
    "q66_map_functions": 6, "q67_higher_order_fns": 6, "q68_calendar_gapfill": 6,
    "q69_posexplode": 6, "q70_bitwise": 6, "q71_crypto_hash": 6,
    "q72_sliding_window": 6, "q73_shipping_priority": 2, "q74_returned_items": 2,
    "q75_large_volume_customers": 2, "q76_full_outer_join": 6, "q77_date_format": 6,
    "q78_try_cast": 6, "q79_nth_value": 6, "q80_heavy_hitters": 2,
    "q81_train_split": 6, "q82_repetition_score": 6, "q83_pii_scrub": 6,
    "q84_length_histogram": 6, "q85_mixture_weights": 6, "q86_sequence_packing": 6,
    "q87_ann_ivf": 2, "q88_filtered_ann": 2, "q89_decontamination": 6,
    "q90_quality_filter": 6, "q91_stratified_sample": 6, "q92_ngram_topk": 6,
    "q93_retention": 6, "q94_sequence_match": 6, "q95_window_funnel": 6,
    "q96_dedup_clusters": 3, "q97_dedup_survivors": 3, "q98_bm25_search": 3,
    "q99_posting_stats": 3,
}


def _ordered(mapping: dict) -> dict:
    keys = sorted(mapping, key=lambda k: _LATEST_CHECKED_ROUND.get(k, -1))
    return {k: mapping[k] for k in keys}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for approximate/hash-based
    ops — the driver records the weaker rows-only check for those)."""
    return _ordered(dict(ORACLES))
