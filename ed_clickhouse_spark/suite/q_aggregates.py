"""Aggregation surface (SURVEY.md §2 B4, B6) + scan/filter/project (B2).

These are the queries the reference's MergeTree schema is built for
(reference ``migrations/*.sql``: ``ORDER BY (timestamp, event_name)`` fact
tables): time-range scans, group-by rollups, distinct users, quantiles,
argMax, conditional aggregates.

Scale notes: every query here is a scan -> partial agg -> exchange ->
final agg plan. Filters and column pruning push into the parquet reader
(verified via .explain: PushedFilters / ReadSchema); group-by cardinality
is small so the shuffle moves only partial-agg state, not rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import davg, dec, dsum, t

# --- B2+B4: the flagship (TPC-H Q1 shape on lineitem) -----------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """Filter -> groupBy -> 8 aggregates. Exercises pushdown + partial agg."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_filter_project",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 0.9, 2) AS DOUBLE) AS discounted
    FROM orders
    WHERE o_totalprice > 400000 AND o_orderpriority = '1-URGENT'
    """,
)
def q02_filter_project(spark, sf_dir):
    """Projection + conjunctive predicate; both push into the parquet scan."""
    o = t(spark, sf_dir, "orders")
    return o.filter((F.col("o_totalprice") > 400000) & (F.col("o_orderpriority") == "1-URGENT")).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(dec("o_totalprice") * F.lit("0.9").cast("decimal(2,1)"), 2).cast("double").alias("discounted"),
    )


@query(
    "q03_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q03_top_orders(spark, sf_dir):
    """Global top-k: Catalyst collapses sort+limit to TakeOrderedAndProject
    (no full sort, per-partition heaps -> driver merge)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@query(
    "q04_daily_revenue",
    oracle="""
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS order_day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def q04_daily_revenue(spark, sf_dir):
    """Time-bucketed rollup — the ClickHouse toStartOfDay idiom
    (reference schema orders by timestamp; SURVEY §2 B8-date)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("order_day")
    ).agg(dsum("o_totalprice", "revenue"), F.count("*").alias("n_orders"))


@query(
    "q05_events_dau",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(DISTINCT user_id) AS dau,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q05_events_dau(spark, sf_dir):
    """DAU: exact distinct users per day (reference envelope user_id,
    dto.proto:9). countDistinct = two-phase: partial distinct per
    partition, exchange on (day,user_id), final count."""
    e = t(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count("*").alias("n_events"),
        dsum("value", "total_value"),
    )


@query("q06_approx_distinct")  # approximate: no SQL oracle (HLL sketches differ)
def q06_approx_distinct(spark, sf_dir):
    """`uniq`-style approx distinct (ClickHouse idiom) — HLL++ sketch.
    At 100 TB this replaces exact countDistinct: partial sketches merge
    without re-shuffling raw user_ids. Rows-only driver check; the unit
    test asserts <5% error vs exact."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count("*").alias("n"),
    )


@query(
    "q07_quantiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           CAST(MIN(value) AS DOUBLE) AS min_v,
           CAST(MAX(value) AS DOUBLE) AS max_v
    FROM events
    GROUP BY event_type
    """,
)
def q07_quantiles(spark, sf_dir):
    """Exact interpolated percentiles (ClickHouse quantile()). Spark
    `percentile` matches DuckDB quantile_cont's linear interpolation.
    At 100 TB use approx_percentile instead (sketch-mergeable)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


@query(
    "q08_argmax",
    oracle="""
    SELECT user_id,
           arg_max(event_type, event_id) AS last_event_type,
           arg_max(value, event_id) AS last_value,
           MAX(event_id) AS last_event_id
    FROM events
    GROUP BY user_id
    """,
)
def q08_argmax(spark, sf_dir):
    """ClickHouse argMax ≙ Spark max_by — last event per user keyed by the
    unique event_id so the result is deterministic."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.max_by("value", "event_id").alias("last_value"),
        F.max("event_id").alias("last_event_id"),
    )


@query(
    "q09_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q09_rollup(spark, sf_dir):
    """Hierarchical subtotals (marketing rollups over the envelope's
    platform/os/device dimensions — SURVEY §2 B4)."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count("*").alias("n")
    )


@query(
    "q10_cube_grouping",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q10_cube_grouping(spark, sf_dir):
    """CUBE with grouping() disambiguation of the NULL subtotal rows."""
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        (F.grouping("o_orderstatus") + F.lit(2) * F.grouping("o_orderpriority")).cast("bigint").alias("gid"),
        F.count("*").alias("n"),
        dsum("o_totalprice", "revenue"),
    )


@query(
    "q11_conditional_agg",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_views,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE) AS purchase_value,
           COUNT(*) AS n_total
    FROM events
    GROUP BY user_id
    """,
)
def q11_conditional_agg(spark, sf_dir):
    """ClickHouse countIf/sumIf ≙ count(when(...)) / sum(when(...)).
    Exposed as SQL aliases countIf/sumIf too (functions.aliases)."""
    e = t(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    return e.groupBy("user_id").agg(
        F.count(F.when(is_p, 1)).alias("n_purchases"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_views"),
        F.coalesce(F.sum(F.when(is_p, dec("value"))), F.lit(0))
        .cast("double")
        .alias("purchase_value"),
        F.count("*").alias("n_total"),
    )


@query(
    "q12_collect_sets",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS event_types,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def q12_collect_sets(spark, sf_dir):
    """ClickHouse groupUniqArray ≙ collect_set (sorted for determinism).

    Output is serialized to a comma-joined string: the driver's
    canonicalizer sorts rows with pandas, and array-typed cells are
    unhashable there — scalar columns keep the hash-compare exact while
    still exercising collect_set end to end.
    """
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("event_types"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "q13_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events
    GROUP BY user_id
    """,
)
def q13_pivot(spark, sf_dir):
    """Pivot with an explicit value list (never let Spark scan for values
    at 100 TB — pass them)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .count()
        .na.fill(0, ["view", "click", "purchase", "signup", "error"])
    )


@query(
    "q14_time_window",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
    FROM events
    GROUP BY 1, 2
    """,
)
def q14_time_window(spark, sf_dir):
    """Tumbling time window (streaming-compatible shape: the same
    expression works under readStream + watermark — SURVEY §2 B9)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "v"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "v")
    )
