"""Scalar-function surface (SURVEY.md §2 B8): string, date/time, math,
JSON, conditional, hash.

Motivated by the reference's envelope columns — ``user_agent``,
``screen_resolution`` "WxH" parsing, version strings
(``migrations/002_…:3-17``), unix-seconds timestamps (``dto.proto:12``),
and the JSON-in-string ``event_details`` column (``migrations/006_…:33``).
All built-in JVM functions — no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import dec, dsum, t


@query(
    "q15_string_funcs",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_num,
           lower(c_mktsegment) AS seg_lower,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_mktsegment, '-', CAST(c_nationkey AS VARCHAR)) AS seg_nation
    FROM customer
    WHERE c_name LIKE 'Customer#%'
    """,
)
def q15_string_funcs(spark, sf_dir):
    """regexp_extract / case / substring / concat — the user_agent &
    screen_resolution parsing family (reference migrations/002:16-17)."""
    c = t(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("Customer#%")).select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("bigint").alias("name_num"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("seg_nation"),
    )


@query(
    "q16_datetime_funcs",
    oracle="""
    SELECT event_id,
           EXTRACT(year FROM ts) AS y,
           EXTRACT(month FROM ts) AS mo,
           EXTRACT(day FROM ts) AS d,
           EXTRACT(hour FROM ts) AS h,
           EXTRACT(minute FROM ts) AS mi,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           CAST(ts + INTERVAL 7 DAY AS TIMESTAMP) AS ts_plus_week,
           date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS days_since_epoch_start
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
    """,
)
def q16_datetime_funcs(spark, sf_dir):
    """toStartOfHour/date arithmetic family (ClickHouse spellings noted in
    SURVEY §2 B8). Range predicate on ts pushes to parquet min/max."""
    e = t(spark, sf_dir, "events")
    lo = F.lit("2024-01-05 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-12 00:00:00").cast("timestamp")
    return e.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).select(
        "event_id",
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("mo"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
        F.minute("ts").cast("bigint").alias("mi"),
        F.date_trunc("hour", "ts").alias("hour_start"),
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("ts_plus_week"),
        F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
    )


@query(
    "q17_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q17_json_extract(spark, sf_dir):
    """JSONExtractString ≙ get_json_object on the event_details-style
    JSON-in-string column (reference migrations/006:33)."""
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )


@query(
    "q18_case_when",
    oracle="""
    SELECT CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid' ELSE 'high' END AS band,
           CASE WHEN event_type IN ('purchase','signup') THEN 'conversion' ELSE 'engagement' END AS kind,
           COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS min_v,
           CAST(MAX(value) AS DOUBLE) AS max_v
    FROM events
    GROUP BY 1, 2
    """,
)
def q18_case_when(spark, sf_dir):
    """multiIf ≙ chained when/otherwise; isin ≙ IN."""
    e = t(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 50, "low").when(F.col("value") < 150, "mid").otherwise("high")
    ).alias("band")
    kind = (
        F.when(F.col("event_type").isin("purchase", "signup"), "conversion").otherwise("engagement")
    ).alias("kind")
    return e.groupBy(band, kind).agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


@query(
    "q19_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS net_price,
           CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_decile,
           CAST(GREATEST(l_tax, l_discount) AS DOUBLE) AS max_rate,
           CAST(LEAST(l_tax, l_discount) AS DOUBLE) AS min_rate,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE l_extendedprice / l_quantity END AS unit_price
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def q19_math_funcs(spark, sf_dir):
    """round/floor/least/greatest + safe division (try_divide ≙ the
    watch-percentage video_position/video_duration idiom,
    reference migrations/006:26-27)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        F.round(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), 2)
        .cast("double")
        .alias("net_price"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        # plain double division (identical operand bits in both engines);
        # try_divide gives NULL (not inf) on a zero denominator
        F.when(
            F.col("l_quantity") != 0, F.col("l_extendedprice") / F.col("l_quantity")
        ).alias("unit_price"),
    )
