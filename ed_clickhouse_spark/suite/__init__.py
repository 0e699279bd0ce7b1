"""The t2 query suite: named queries + their DuckDB oracle SQL twins.

Each query is registered with :func:`query`; ``__spark_entry__.py`` simply
re-exports :data:`QUERIES` / :data:`ORACLES`. A query without an oracle
(approximate or hash-dependent ops) gets the driver's weaker rows-only
check — keep those to a minimum.

Determinism rules (so the driver's order-insensitive value-hash matches):
  * alias every computed column identically in Spark and SQL;
  * sums/avgs over doubles go through DECIMAL(18,2|4) so partial-agg order
    cannot perturb low bits, then cast back to double;
  * any LIMIT/top-k is preceded by a total order with a unique tiebreaker;
  * floating results that involve real float math (cosine, ratios) are
    rounded to a fixed scale in BOTH engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable and its oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from ed_clickhouse_spark.suite import (  # noqa: F401
        q_advanced,
        q_aggregates,
        q_chagg,
        q_ddl,
        q_dialect,
        q_dedup,
        q_events,
        q_functions,
        q_functions2,
        q_joins,
        q_llm,
        q_llm2,
        q_misc,
        q_search,
        q_similarity,
        q_stats,
        q_stats2,
        q_similarity2,
        q_setops,
        q_text,
        q_tpch,
        q_tpch2,
        q_windows,
    )


_load_all()
