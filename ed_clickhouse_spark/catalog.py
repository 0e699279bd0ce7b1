"""Table catalog: the driver's synthetic tables + view registration.

The reference delegates cataloging to ClickHouse's ``database`` config
(reference ``config/default.toml:35``); here the catalog is a plain
path->view mapping over parquet, registered as temp views so both the
DataFrame API and ``spark.sql`` see the same names the DuckDB oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every driver table from ``sf_dir`` and register temp views.

    Scans stay lazy — Catalyst prunes columns and pushes filters into the
    parquet reader per-query, so loading all tables up front costs nothing.
    """
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        df = read_table(spark, sf_dir, name)
        dfs[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return dfs


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table, normalizing nanosecond-precision timestamps.

    ``events.parquet`` stores TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as
    nanos-since-epoch bigint — convert to a microsecond timestamp
    (truncation matches DuckDB's TIMESTAMP_NS -> TIMESTAMP read).

    The conf is (re)set at runtime so queries work under ANY caller's
    SparkSession (the correctness driver builds its own, without our
    session.py defaults) — without it the parquet reader rejects the
    file outright."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer `div`, not `/`: epoch-nanos (~1.7e18) overflows the
        # 53-bit double mantissa and would corrupt microseconds
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # keep the original column order
        df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return df
