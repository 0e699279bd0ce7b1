"""Join operators beyond Spark's built-ins (SURVEY.md §2 B3).

The reference's schema is a star of event families sharing user/session
keys and content keys (``dto.proto:9-11``, ``migrations/006_…:20-21``);
these helpers cover the two join shapes Spark SQL has no primitive for:
as-of (latest-state-before) and bounded range joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "left",
    tiebreak: str | Column | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` keys.

    ``tiebreak`` resolves ties when several right rows share the same key
    AND timestamp: highest tiebreak value wins. Defaults to a stable hash
    of the carried right-side struct, so the winner is a deterministic
    function of row content, never of shuffle order. Pass the name of a
    unique column from ``right_cols`` (e.g. an event id) to pin a
    domain-meaningful rule.

    Implementation is the union+window pattern: tag both sides, union on a
    common schema, sort within each key by time, and carry the most recent
    right-side values forward with ``last(..., ignorenulls=True)``.

    Scale: ONE shuffle on ``on`` (the window partition), no O(n*m)
    expansion — vs. a naive range-join + row_number which shuffles both
    sides AND explodes intermediate pairs. Matches DuckDB ``ASOF JOIN``
    semantics (a right row with equal timestamp is eligible).
    """
    lcols = left.columns
    # the right row travels as ONE struct so last(ignorenulls) picks a
    # whole row atomically — carrying columns independently would stitch
    # values from different right rows whenever one column is null
    r_struct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols) + ">"
    )
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__is_left"),
        F.col(left_ts).alias("__ts"),
        null_struct.alias("__r"),
    )
    tagged_right = right.select(
        *[
            (F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__ts"),
        r_struct.alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Right rows sort before left rows at equal __ts so an equal-timestamp
    # right row is visible to the left row (ASOF '>=', DuckDB-compatible).
    # The third key orders equal-(key, ts) right rows deterministically;
    # last() then always carries the same winner.
    if tiebreak is None:
        tb = F.xxhash64(F.col("__r"))
    elif isinstance(tiebreak, str):
        tb = F.col(f"__r.{tiebreak}")
    else:
        tb = tiebreak
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), tb.asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "__is_left",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    )
    out = filled.filter(F.col("__is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())
    return out.select(*lcols, *[F.col(f"__m.{c}").alias(c) for c in right_cols])


def any_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    order_by: list | None = None,
    how: str = "left",
) -> DataFrame:
    """ClickHouse ``ANY JOIN``: at most ONE right-side row matches each
    key — CH picks an arbitrary one; here the match is made
    deterministic by ``order_by`` (first row per key in that order;
    default: the key itself, i.e. any stable representative).

    Spark has no first-match join, so the right side is reduced to one
    row per key FIRST (row_number window — WindowGroupLimit pushes the
    rank-1 filter into the sort, so no group fully materializes), then
    a plain equi-join. This also mirrors CH's performance rationale:
    the hash table holds one entry per key, and the join can never
    fan out left rows."""
    from pyspark.sql import Window as W

    order = order_by if order_by else [F.col(c) for c in on]
    w = W.partitionBy(*on).orderBy(*order)
    one = (
        right.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return left.join(one, on, how)


def range_join(
    left: DataFrame, right: DataFrame, on: list[str], cond: Column
) -> DataFrame:
    """Equi + range join: hash join on ``on`` keys with the range
    condition applied inside the join. Use when the equi keys are
    selective; for key-free interval joins use
    :func:`range_join_bucketed`."""
    jc = cond
    for k in on:
        jc = (left[k] == right[k]) & jc
    return left.join(right, jc)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    bucket_seconds: int,
) -> DataFrame:
    """Key-free interval join (``right_lo <= left_ts <= right_hi``) via
    time bucketing: the right side is replicated into every bucket its
    interval overlaps (``sequence`` + ``explode``), the left side maps to
    its single bucket, and the two equi-join on the bucket id.

    Scale: turns an O(n*m) broadcast-nested-loop into a co-partitioned
    hash join; replication factor = interval_len / bucket_seconds, so
    pick ``bucket_seconds`` ~ the typical interval length. Each (l, r)
    match is produced exactly once (the left row lives in one bucket).
    """
    lb = (F.unix_timestamp(F.col(left_ts)) / bucket_seconds).cast("bigint")
    rlo = (F.unix_timestamp(F.col(right_lo)) / bucket_seconds).cast("bigint")
    rhi = (F.unix_timestamp(F.col(right_hi)) / bucket_seconds).cast("bigint")
    lbk = left.withColumn("__bucket", lb)
    rbk = right.withColumn("__bucket", F.explode(F.sequence(rlo, rhi)))
    out = lbk.join(rbk, "__bucket").filter(
        (F.col(left_ts) >= F.col(right_lo)) & (F.col(left_ts) <= F.col(right_hi))
    )
    return out.drop("__bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi join: the (large, skewed) left side gets a
    random salt in [0, salt); the (smaller) right side is replicated
    ``salt`` times; the join key becomes (key, salt) so one hot key
    spreads over ``salt`` reducers.

    AQE's skew-join handling (on by default in session.py) covers most
    cases at runtime; use this when a single key is so hot that even a
    split partition exceeds executor memory, or when AQE is unavailable
    (e.g. inside some streaming foreachBatch plans). Cost: right side
    inflates by ``salt``; keep the right side the dimension table.

    Only inner/left are supported: right/full outer would emit every
    unmatched right row ``salt`` times (one per replica)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only, got {how!r}: the "
            "replicated right side would duplicate unmatched right rows"
        )
    l_salted = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(r_salted, [on, "__salt"], how)
    return out.drop("__salt")


def topk_per_group(
    df: DataFrame, keys: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group (row_number pattern). Pass a total order
    (include a unique tiebreaker) for deterministic output. Spark 3.5+
    inserts a WindowGroupLimit before the shuffle so only k rows per key
    per input partition move."""
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
