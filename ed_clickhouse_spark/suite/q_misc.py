"""Remaining odds and ends: full outer join, date formatting, try_cast
error handling, nth_value."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q76_full_outer_join",
    oracle="""
    WITH buyers AS (
      SELECT user_id, COUNT(*) AS n_purchases FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    clickers AS (
      SELECT user_id, COUNT(*) AS n_clicks FROM events
      WHERE event_type = 'click' GROUP BY user_id
    )
    SELECT COALESCE(b.user_id, c.user_id) AS user_id,
           COALESCE(b.n_purchases, 0) AS n_purchases,
           COALESCE(c.n_clicks, 0) AS n_clicks
    FROM buyers b FULL OUTER JOIN clickers c ON b.user_id = c.user_id
    """,
)
def q76_full_outer_join(spark, sf_dir):
    """Full outer join: union of two behavioral cohorts with zero-fill."""
    e = t(spark, sf_dir, "events")
    b = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    return (
        b.join(c, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        )
    )


@query(
    "q77_date_format",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m') AS month_key,
           strftime(ts, '%Y-%m-%d %H:%M') AS minute_key,
           CAST(ts AS DATE) AS d,
           to_timestamp(CAST(epoch(ts) AS BIGINT)) IS NOT NULL AS roundtrips
    FROM events WHERE event_id < 200
    """,
)
def q77_date_format(spark, sf_dir):
    """date_format (≙ ClickHouse formatDateTime / DuckDB strftime) +
    epoch round-trip."""
    e = t(spark, sf_dir, "events")
    return e.filter(F.col("event_id") < 200).select(
        "event_id",
        F.date_format("ts", "yyyy-MM").alias("month_key"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute_key"),
        F.col("ts").cast("date").alias("d"),
        F.timestamp_seconds(F.unix_timestamp("ts")).isNotNull().alias("roundtrips"),
    )


@query(
    "q78_try_cast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(lang AS INTEGER) AS lang_as_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT) AS n_chars_roundtrip,
           COALESCE(TRY_CAST(source AS DOUBLE), -1.0) AS src_num
    FROM documents WHERE doc_id < 100
    """,
)
def q78_try_cast(spark, sf_dir):
    """try_cast: malformed input -> NULL, not a runtime error (the ANSI-
    mode-safe ingestion idiom; ClickHouse toInt32OrNull family)."""
    d = t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.col("n_chars").cast("string").try_cast("bigint").alias("n_chars_roundtrip"),
        F.coalesce(F.col("source").try_cast("double"), F.lit(-1.0)).alias("src_num"),
    )


@query(
    "q79_nth_value",
    oracle="""
    SELECT DISTINCT user_id,
           NTH_VALUE(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_event,
           NTH_VALUE(value, 3)      OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_value
    FROM events
    """,
)
def q79_nth_value(spark, sf_dir):
    """nth_value over the full frame — each user's second event type and
    third event value."""
    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.nth_value("event_type", 2).over(w).alias("second_event"),
        F.nth_value("value", 3).over(w).alias("third_value"),
    ).distinct()


@query(
    "q103_uniq_merge",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct,
           true AS within_5pct
    FROM events GROUP BY event_type
    """,
)
def q103_uniq_merge(spark, sf_dir):
    """ClickHouse uniqState/uniqMerge parity: per (event_type, day) HLL
    states built once, then merged per event_type — the re-aggregatable
    distinct-users rollup. At 100 TB the states live in the rollup
    table; this query is the merge-at-read path (shuffle = one ~2KB
    sketch per group, never user ids).

    Tolerance-banded oracle (r8, verdict #7): the output carries the
    EXACT distinct count (cross-engine-checked against DuckDB's
    COUNT(DISTINCT)) plus a ``within_5pct`` band column that is true
    iff the merged-HLL estimate lands within 5% of it — ~3 sigma for
    the lg_k=12 sketch (RSE ≈ 1.6%), and deterministic: the sketch has
    no RNG, so the band either always holds on this data or never
    does. The driver's hash-match is now a real check on both the
    exact arm and the sketch's error, not rows-only. The exact arm
    exists only for the check; the production scale path remains the
    states."""
    from ed_clickhouse_spark.operators.sketch import hll_merge, hll_state

    e = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = hll_state(e, ["event_type", "day"], "user_id")
    merged = hll_merge(daily, ["event_type"])
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * F.lit(0.05)
        ).alias("within_5pct"),
    )


@query(
    "q104_approx_quantiles",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           true AS p50_ok, true AS p90_ok, true AS p99_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def q104_approx_quantiles(spark, sf_dir):
    """ClickHouse quantile()/quantiles() are approximate by default;
    this is the matching Spark surface (approx_percentile) over order
    totals per priority — the constant-memory path when exact q07-style
    percentiles would need a full sort at 100 TB.

    Tolerance-banded oracle (r8, verdict #7): approx_percentile's
    guarantee is on RANK (error <= n/accuracy = n/10000), so each
    output carries the group size n (cross-engine-checked) plus per-
    percentile booleans asserting the approximate value's actual rank —
    count of rows <= it, recomputed against the data — sits within
    10x slack of the target rank (greatest(2, 0.002*n)). The sketch is
    deterministic on fixed data, so the booleans are stable at every
    scale. The approx values stay the production output shape; the
    rank audit exists for the check."""
    o = t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    a = o.groupBy("o_orderpriority").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("q"),
        F.count("*").alias("n"),
    )
    # bounded: one row per priority (5 groups) carrying a 3-element
    # array — the approx-percentile frame is output-sized, never rows
    j = o.join(F.broadcast(a), "o_orderpriority")
    ranks = j.groupBy("o_orderpriority").agg(
        F.max("n").alias("n"),
        *[
            F.sum(
                F.when(F.col("o_totalprice") <= F.col("q")[i], 1).otherwise(0)
            ).alias(f"r{i}")
            for i in range(3)
        ],
    )

    def ok(i: int, p: float):
        tol = F.greatest(F.lit(2.0), F.col("n") * F.lit(0.002))
        return (
            F.abs(F.col(f"r{i}") - F.col("n") * F.lit(p)) <= tol
        ).alias(f"p{int(p * 100)}_ok")

    return ranks.select(
        "o_orderpriority", "n", ok(0, 0.5), ok(1, 0.9), ok(2, 0.99)
    )


@query(
    "q243_approx_distinct_audit",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           true AS within_15pct
    FROM events GROUP BY event_type
    """,
)
def q243_approx_distinct_audit(spark, sf_dir):
    """Driver-visible error band for q06's approx_count_distinct (r8):
    the exact distinct count per event type is cross-checked against
    DuckDB, and the band column holds iff Spark's HLL++ estimate
    (default rsd 0.05) lands within 15% (3 sigma) of it. q06 itself
    stays rows-only so its output shape remains the production one.
    Deterministic sketch — the band either always holds or never
    does."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id")
                - F.countDistinct("user_id")
            )
            <= F.countDistinct("user_id") * F.lit(0.15)
        ).alias("within_15pct"),
    )
