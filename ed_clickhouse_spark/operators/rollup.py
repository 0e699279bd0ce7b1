"""Incremental materialized rollups (the "hypertable rollup" operator).

ClickHouse deployments like the reference's pair raw MergeTree event
tables with materialized views that maintain pre-aggregated rollups
(daily counts per platform, watch-minutes per item, ...). Spark has no
materialized views; at 100 TB you cannot re-aggregate history on every
refresh either. This operator maintains a rollup table **incrementally
by partition**:

  * the source is a date-partitioned event table (the engine's write
    layout, ``sources/writer.py``);
  * a refresh lists source partitions and compares a per-partition
    fingerprint (file count + names) against the rollup's saved state —
    only new or changed days are re-aggregated;
  * results are written with dynamic partition overwrite, so refreshing
    a day is idempotent (late-arriving appends to an old day simply
    re-aggregate that day).

The aggregation spec is restricted to per-partition-closed expressions
(any groupBy within one day) — what makes per-day refresh sound without
cross-partition merge logic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATE_FILE = "_rollup_state.json"


class IncrementalRollup:
    """Maintain ``dest_path`` = groupBy(event_date, *dims).agg(*aggs)
    over a date-partitioned source, refreshing only changed days."""

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        dest_path: str,
        dims: list[str],
        aggs: dict[str, str],
        partition_col: str = "event_date",
    ):
        """``aggs``: output column -> SQL aggregate expression, e.g.
        {"n_events": "count(*)", "watch_s": "sum(video_position)"}."""
        self.spark = spark
        self.source_path = source_path
        self.dest_path = dest_path
        self.dims = dims
        self.aggs = aggs
        self.partition_col = partition_col

    # -- state ------------------------------------------------------------
    def _state_path(self) -> str:
        return os.path.join(self.dest_path, _STATE_FILE)

    def _load_state(self) -> dict[str, str]:
        try:
            with open(self._state_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def _save_state(self, state: dict[str, str]) -> None:
        os.makedirs(self.dest_path, exist_ok=True)
        with open(self._state_path(), "w") as f:
            json.dump(state, f, sort_keys=True)

    def _source_partitions(self) -> dict[str, str]:
        """partition value -> fingerprint (sorted data-file names).

        Driver-side directory listing: one cheap FS listing per refresh,
        no data read. At cloud-storage scale this is the same listing the
        parquet reader performs anyway."""
        out: dict[str, str] = {}
        prefix = f"{self.partition_col}="
        if not os.path.isdir(self.source_path):
            return out
        for entry in sorted(os.listdir(self.source_path)):
            if not entry.startswith(prefix):
                continue
            pdir = os.path.join(self.source_path, entry)
            files = sorted(
                f for f in os.listdir(pdir) if not f.startswith(("_", "."))
            )
            out[entry[len(prefix):]] = ",".join(files)
        return out

    # -- refresh ----------------------------------------------------------
    def refresh(self) -> list[str]:
        """Re-aggregate new/changed partitions; returns the partition
        values refreshed (empty list = rollup already current)."""
        state = self._load_state()
        current = self._source_partitions()
        dirty = [p for p, fp in current.items() if state.get(p) != fp]
        if not dirty:
            return []
        src = self.spark.read.parquet(self.source_path).filter(
            F.col(self.partition_col).isin(dirty)
        )
        agged = src.groupBy(self.partition_col, *self.dims).agg(
            *[F.expr(expr).alias(name) for name, expr in self.aggs.items()]
        )
        # dynamic overwrite replaces exactly the refreshed day partitions
        with _conf(self.spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
            (
                agged.write.mode("overwrite")
                .partitionBy(self.partition_col)
                .parquet(self.dest_path)
            )
        state.update({p: current[p] for p in dirty})
        self._save_state(state)
        return sorted(dirty)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.dest_path)


class _conf:
    """Temporarily set a runtime SQL conf (restored on exit)."""

    def __init__(self, spark: SparkSession, key: str, value: str):
        self.spark, self.key, self.value = spark, key, value

    def __enter__(self):
        try:
            self.prev = self.spark.conf.get(self.key)
        except Exception:
            self.prev = None
        self.spark.conf.set(self.key, self.value)

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset(self.key)
        else:
            self.spark.conf.set(self.key, self.prev)
