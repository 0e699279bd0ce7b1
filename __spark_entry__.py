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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for approximate/hash-based
    ops — the driver records the weaker rows-only check for those)."""
    return dict(ORACLES)
