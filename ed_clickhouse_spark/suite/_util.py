"""Shared helpers for suite queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one driver table (column pruning + pushdown apply)."""
    from ed_clickhouse_spark.catalog import read_table

    return read_table(spark, sf_dir, name)


def dec(col: str | Column, scale: int = 2) -> Column:
    """Cast a 2-dp double measure to exact decimal so sums are
    aggregation-order-independent (bit-identical to the DuckDB oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum of a 2-dp double, returned as double."""
    return F.sum(dec(col, scale)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, scale)).cast("double") / F.count(c)).alias(alias)
