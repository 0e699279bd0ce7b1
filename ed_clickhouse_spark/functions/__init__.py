"""ClickHouse-dialect function surface over Spark built-ins."""

from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

__all__ = ["register_sql_aliases"]
