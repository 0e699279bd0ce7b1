"""SparkSession factory.

Tuned for the driver environment (local[32], single JVM) but every knob is
chosen to also be the right default on a real multi-executor cluster:
AQE handles runtime coalescing + skew joins, Arrow accelerates any
pandas-UDF boundary, and the session timezone is pinned to UTC so results
are byte-comparable with the DuckDB oracle (DuckDB timestamps are
UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ed_clickhouse_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions default to the core count — at cluster scale you
    would size this to ~2-3x total executor cores or simply rely on AQE
    coalescing from a higher initial value.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the driver's events.parquet stores TIMESTAMP(NANOS) which the
        # Spark parquet reader rejects; read as long and convert in catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # the ch_* SQL names chsql.translate emits for the DP string
    # metrics / base58 resolve on every engine session (idempotent)
    from ed_clickhouse_spark.functions.randdist import register_randdist
    from ed_clickhouse_spark.functions.strdist import register_strdist

    register_strdist(spark)
    register_randdist(spark)
    return spark
