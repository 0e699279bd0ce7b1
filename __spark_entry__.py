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


# The round-1 driver checked exactly the first 50 registry entries, so
# ordering decides coverage when the per-round check is capped. Anything
# WITHOUT a green CORRECTNESS_r01 row — the 30 then-unchecked queries
# (q12/q67 ERRed, so they re-check first too) plus any query added
# after round 1 — goes first; the 48 with green r01
# rows follow, so a capped run still re-verifies as many as fit.
_R1_CHECKED = {
    "q01_pricing_summary", "q02_filter_project", "q03_top_orders",
    "q04_daily_revenue", "q05_events_dau", "q06_approx_distinct",
    "q07_quantiles", "q08_argmax", "q09_rollup", "q10_cube_grouping",
    "q11_conditional_agg", "q13_pivot",
    "q14_time_window", "q15_string_funcs", "q16_datetime_funcs",
    "q17_json_extract", "q18_case_when", "q19_math_funcs",
    "q20_star_join_revenue", "q21_semi_join", "q22_anti_join",
    "q23_left_join_agg", "q24_asof_join", "q25_range_join",
    "q44_dedup_exact", "q45_jaccard_pairs", "q46_minhash_lsh",
    "q47_simhash", "q51_stats_moments", "q52_correlation",
    "q53_exists_subquery", "q54_in_subquery", "q55_scalar_subquery",
    "q56_cte_share", "q57_event_transitions", "q58_percent_rank",
    "q59_string_extra", "q60_distinct_pairs", "q61_grouping_sets",
    "q62_session_window", "q63_unpivot", "q64_range_frame",
    "q66_map_functions", "q68_calendar_gapfill",
    "q69_posexplode", "q70_bitwise", "q71_crypto_hash", "q72_sliding_window",
}


def _ordered(mapping: dict) -> dict:
    first = [k for k in mapping if k not in _R1_CHECKED]
    rest = [k for k in mapping if k in _R1_CHECKED]
    return {k: mapping[k] for k in first + rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for approximate/hash-based
    ops — the driver records the weaker rows-only check for those)."""
    return _ordered(dict(ORACLES))
