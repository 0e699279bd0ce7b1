"""MergeTree engine-variant merge semantics as suite queries.

The reference provisions plain MergeTree tables
(migrations/002..011_*.up.sql — append-only facts), but ClickHouse
deployments routinely pair them with ReplacingMergeTree (latest-state
tables read with FINAL) and SummingMergeTree (pre-aggregated counters).
ddl.py translates those engines into read-time views; these queries prove
the semantics against a SQL oracle on the events table.

Scale: both are a single shuffle on the merge key — exactly the shuffle a
ClickHouse FINAL read pays — and the underlying append path stays
shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark import ddl
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t

_REPLACING_DDL = """
CREATE TABLE user_latest (
    user_id String,
    event_type String,
    ver String,
    value Float64,
    ts DateTime
) ENGINE = ReplacingMergeTree(ver)
ORDER BY (user_id, event_type);
"""

_SUMMING_DDL = """
CREATE TABLE daily_activity (
    day Date,
    event_type String,
    total Decimal(18, 2),
    n UInt64
) ENGINE = SummingMergeTree((total, n))
ORDER BY (day, event_type);
"""


@query(
    "q105_replacing_final",
    oracle="""
    SELECT user_id, event_type,
           CAST(value AS DECIMAL(18,2)) AS last_value,
           CAST(ts AS TIMESTAMP) AS last_ts
    FROM (
      SELECT user_id, event_type, value, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1 AND user_id <= 100
    """,
)
def q105_replacing_final(spark, sf_dir):
    """ReplacingMergeTree FINAL: latest event per (user_id, event_type).

    The events log plays the append-only table; ``ver`` is the
    (ts, event_id) pair serialized to one sortable string so the merge is
    fully deterministic under timestamp ties — the same trick a real
    deployment uses for a version column.  Runs through
    ddl.final_read on a parsed CREATE TABLE (ddl.py), i.e. the exact code
    path Engine.migrate provisions."""
    spec = ddl.parse_clickhouse_ddl(_REPLACING_DDL)
    e = t(spark, sf_dir, "events").where(F.col("user_id") <= 100)
    log = e.select(
        "user_id",
        "event_type",
        # zero-padded epoch + event_id: lexicographic == (ts, event_id) order
        F.concat_ws(
            "|",
            F.lpad(F.unix_timestamp("ts").cast("string"), 12, "0"),
            F.col("event_id").cast("string"),
        ).alias("ver"),
        "value",
        "ts",
    )
    fin = ddl.final_read(log, spec)
    return fin.select(
        "user_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


@query(
    "q106_summing_merge",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def q106_summing_merge(spark, sf_dir):
    """SummingMergeTree: counters collapse to one row per ORDER BY key.

    Each event becomes a (day, event_type, total=value, n=1) counter row;
    final_read sums the declared columns per key — the ClickHouse merge,
    expressed as one partial-aggregated shuffle."""
    spec = ddl.parse_clickhouse_ddl(_SUMMING_DDL)
    e = t(spark, sf_dir, "events")
    counters = e.select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("total"),
        F.lit(1).cast("long").alias("n"),
    )
    return ddl.final_read(counters, spec)
