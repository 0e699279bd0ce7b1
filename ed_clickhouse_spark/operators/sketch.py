"""Count-min sketch over a key column — mergeable frequency estimation
(Layer C; the sketch family next to HLL/minhash/simhash).

At 100 TB the exact token-frequency table may itself be too large to
materialize or too hot to shuffle; a count-min sketch is a fixed-size
(d x w) counter matrix with one-sided error: estimates never undercount
and overcount by at most eps * N with probability 1 - delta, where
w = ceil(e / eps), d = ceil(ln(1 / delta)).

Spark shape: explode keys -> d hash assignments per key (JVM xxhash64
with per-row seeds) -> ONE groupBy (row, bucket) producing at most d*w
rows regardless of input size — the partial counts combine map-side, so
the shuffle is bounded by the sketch dimensions, not the data. Point
queries join the (tiny, broadcast) sketch d times and take the min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cm_build(df: DataFrame, key_col: str, width: int = 2048, depth: int = 4) -> DataFrame:
    """Build the sketch: a DataFrame of (row, bucket, cnt), <= depth*width
    rows. Deterministic: hash_i(x) = xxhash64(x, seed=i) mod width."""
    # one pass over the input: emit all d (row, bucket) assignments per
    # key via explode (a union of d selects would scan the source d times)
    assignments = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width)).alias(
                        "bucket"
                    ),
                )
                for i in range(depth)
            ]
        )
    )
    return (
        df.select(assignments.alias("a"))
        .select("a.row", "a.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_query(sketch: DataFrame, keys: DataFrame, key_col: str, width: int = 2048, depth: int = 4) -> DataFrame:
    """Point-query estimated counts for each key in ``keys``:
    est = min over rows of sketch[row][hash_row(key)]. The sketch is
    broadcast (<= depth*width rows); keys never shuffle."""
    est = None
    out = keys
    for i in range(depth):
        s_i = sketch.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"__b{i}"), F.col("cnt").alias(f"__c{i}")
        )
        out = out.withColumn(
            f"__b{i}", F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width))
        ).join(
            # bounded: one sketch row per bucket (width is a constant)
            F.broadcast(s_i),
            f"__b{i}",
            "left",
        )
        c = F.coalesce(F.col(f"__c{i}"), F.lit(0))
        est = c if est is None else F.least(est, c)
    return out.select(key_col, est.alias("est_count")).withColumn(
        "est_count", F.col("est_count").cast("bigint")
    )


def hll_state(
    df: DataFrame, keys: list[str], entity_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group mergeable distinct-count state — ClickHouse
    ``uniqState`` ≙ Spark's DataSketches HLL aggregate. Returns one row
    per key group with a binary ``hll_state`` column that can be stored
    (the AggregatingMergeTree pattern: keep states in the rollup table,
    merge at read time) and re-aggregated to any coarser grouping
    WITHOUT rescanning the raw data."""
    return df.groupBy(*keys).agg(
        F.expr(f"hll_sketch_agg({entity_col}, {lg_k})").alias("hll_state")
    )


def hll_merge(state: DataFrame, keys: list[str]) -> DataFrame:
    """Merge stored HLL states up to a coarser grouping and estimate —
    ClickHouse ``uniqMerge``. ``keys`` must be a subset of the state's
    group columns; the shuffle carries one small sketch per input group,
    never the raw entity ids."""
    merged = F.expr("hll_sketch_estimate(hll_union_agg(hll_state))")
    if keys:
        return state.groupBy(*keys).agg(merged.alias("est_distinct"))
    return state.agg(merged.alias("est_distinct"))


def hll_set_estimates(
    state: DataFrame,
    set_col: str,
    set_a,
    set_b,
    keys: list[str] | None = None,
) -> DataFrame:
    """Distinct-set algebra from stored HLL states — the ClickHouse
    ``uniqTheta`` union/intersection use case (audience overlap: "users
    who did A and B") computed WITHOUT rescanning raw data. Input is a
    :func:`hll_state` frame grouped by (*keys, set_col); output per key:
    est_a, est_b, est_union (sketch-exact union) and est_intersect by
    inclusion-exclusion (|A|+|B|-|A∪B|, floored at 0 — IE over HLL has
    no error bound of its own; treat small intersections as noisy).
    Shuffles carry one sketch per group, never entity ids."""
    keys = keys or []
    cond_a = F.col(set_col) == set_a
    cond_b = F.col(set_col) == set_b
    both = state.filter(cond_a | cond_b)
    est = lambda c: F.expr(  # noqa: E731
        "hll_sketch_estimate(hll_union_agg(" + c + "))"
    )
    agged = both.groupBy(*keys).agg(
        est(f"CASE WHEN {set_col} = '{set_a}' THEN hll_state END").alias("est_a"),
        est(f"CASE WHEN {set_col} = '{set_b}' THEN hll_state END").alias("est_b"),
        est("hll_state").alias("est_union"),
    )
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
    )
    return agged.select(
        *keys,
        F.col("est_a").cast("bigint").alias("est_a"),
        F.col("est_b").cast("bigint").alias("est_b"),
        F.col("est_union").cast("bigint").alias("est_union"),
        inter.cast("bigint").alias("est_intersect"),
    )
