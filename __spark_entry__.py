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
# decides coverage when the check is capped.  The rotation is fully
# data-driven and SELF-UPDATING: each query's latest driver-checked round
# is read from the CORRECTNESS_r*.json files next to this file at import
# time, and queries sort stalest-green-first; queries with no driver row
# yet (new this round) sort before everything else; registration order
# breaks ties (Python's sort is stable).  No per-round regeneration
# needed — the next round's files reorder the window automatically.


def _latest_checked_rounds(here: str | None = None) -> dict[str, int]:
    import glob
    import json
    import os
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    # Track, per query, the NUMERIC round of its most recent row and
    # whether that row was red. Files are ordered by the parsed round
    # number (lexicographic glob order would put r10 before r2), and a
    # green row only clears a red verdict when it comes from a
    # strictly newer round.
    seen_round: dict[str, int] = {}
    seen_red: dict[str, bool] = {}
    paths = []
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if m:
            paths.append((int(m.group(1)), path))
    for rnd, path in sorted(paths):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue  # a malformed round file must not break the driver
        for name, row in rows.items():
            if rnd < seen_round.get(name, -(10**9)):
                continue
            # a red LATEST row (hard error, row/hash mismatch) must
            # sort FIRST — before never-checked queries — so the
            # driver confirms a fix the very next round instead of
            # rotating the failure to the back of the queue.
            # rows-only-by-design entries ("no_oracle") are green.
            is_red = isinstance(row, dict) and (
                (row.get("err") not in (None, "no_oracle"))
                or row.get("rows_match") is False
                or row.get("hash_match") is False
            )
            seen_round[name] = rnd
            seen_red[name] = is_red
    return {
        name: (_RED if seen_red[name] else rnd)
        for name, rnd in seen_round.items()
    }


_RED = -2  # sorts before never-checked (-1) and any real round (>=1)


_LATEST_CHECKED_ROUND = _latest_checked_rounds()


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
