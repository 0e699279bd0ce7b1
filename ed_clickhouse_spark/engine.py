"""Engine facade — the surface a user of the reference stack switches to.

The reference gives its users three things (SURVEY.md §0): an ingestion
service (NATS -> nine ClickHouse tables), DDL for those tables
(``migrations/*.sql``), and a ClickHouse SQL endpoint to query them.
:class:`Engine` packages the Spark-native equivalents of all three:

    eng = Engine(warehouse="/data/wh")
    eng.init()                        # ≙ running the migrations (EP3)
    q = eng.ingest(source_dir)        # ≙ the NATS->ClickHouse service (EP1)
    eng.sql("SELECT toStartOfDay(timestamp) d, count(*) FROM "
            "angulak_watch_events GROUP BY 1")          # ≙ EP2
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ed_clickhouse_spark.functions import register_sql_aliases
from ed_clickhouse_spark.session import get_spark
from ed_clickhouse_spark.sources.registry import DLQ_TABLE, FAMILIES, BY_TABLE
from ed_clickhouse_spark.streaming.pipeline import start_ingest


class Engine:
    """One warehouse of the nine event tables + DLQ, with the ClickHouse
    SQL vocabulary registered."""

    def __init__(self, warehouse: str, spark: SparkSession | None = None):
        self.warehouse = warehouse
        self.spark = spark or get_spark("ed_clickhouse_spark")
        register_sql_aliases(self.spark)

    # -- EP3: provisioning ------------------------------------------------
    def init(self) -> None:
        """Idempotently create all event tables (empty parquet layout) and
        register them as views — ≙ `CREATE TABLE IF NOT EXISTS` migrations
        (reference migrations/002..011)."""
        os.makedirs(self.warehouse, exist_ok=True)
        for fam in FAMILIES:
            path = os.path.join(self.warehouse, fam.table)
            if not os.path.exists(path):
                empty = self.spark.createDataFrame([], fam.table_schema)
                empty.write.mode("overwrite").parquet(path)
        self.refresh_views()

    def refresh_views(self) -> None:
        """(Re)register every existing table as a temp view."""
        for fam in FAMILIES:
            path = os.path.join(self.warehouse, fam.table)
            if os.path.exists(path):
                self.spark.read.parquet(path).createOrReplaceTempView(fam.table)
        dlq = os.path.join(self.warehouse, DLQ_TABLE)
        if os.path.exists(dlq):
            self.spark.read.parquet(dlq).createOrReplaceTempView("dlq")

    # -- EP1: ingestion ---------------------------------------------------
    def ingest(self, source_dir: str, checkpoint: str | None = None, **kw):
        """Start the streaming ingestion into this warehouse; returns the
        StreamingQuery (stop() for graceful shutdown ≙ ctrl-c drain)."""
        ckpt = checkpoint or os.path.join(self.warehouse, "_checkpoints", "ingest")
        return start_ingest(self.spark, source_dir, self.warehouse, ckpt, **kw)

    # -- EP2: query -------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Spark SQL over the event tables (ClickHouse spellings like
        toStartOfDay/JSONExtractString registered)."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        if name != "dlq" and name not in BY_TABLE:
            raise KeyError(f"unknown table {name!r}; known: {sorted(BY_TABLE)} + ['dlq']")
        path = os.path.join(self.warehouse, DLQ_TABLE if name == "dlq" else name)
        return self.spark.read.parquet(path)

    def rollup(self, table: str, dest: str, dims: list[str], aggs: dict[str, str]):
        """Materialized daily rollup over one event table (≙ a ClickHouse
        materialized view): returns an IncrementalRollup; call .refresh()
        after ingests. Only new/changed day partitions re-aggregate."""
        from ed_clickhouse_spark.operators.rollup import IncrementalRollup

        if table not in BY_TABLE:
            raise KeyError(f"unknown table {table!r}")
        return IncrementalRollup(
            self.spark,
            os.path.join(self.warehouse, table),
            os.path.join(self.warehouse, dest),
            dims=dims,
            aggs=aggs,
        )

    def ping(self) -> bool:
        """≙ the reference's ClickHouse /ping startup check
        (src/click_house.rs:46-59)."""
        return self.spark.sql("SELECT 1").collect()[0][0] == 1
