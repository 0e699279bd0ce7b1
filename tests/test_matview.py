"""Streaming materialized view (ClickHouse MV / AggregatingMergeTree
parity): insert-time partial states, read-time merge, lossless
compaction — verified end-to-end through the ingestion pipeline."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ed_clickhouse_spark.streaming.matview import StreamingMatView
from ed_clickhouse_spark.streaming.pipeline import start_ingest

from tests.test_ingest import _envelope


@pytest.fixture()
def mv_setup(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    mv = StreamingMatView(
        spark,
        str(tmp_path / "mv_login"),
        dims=["platform"],
        sums={"unix_timestamp(timestamp)": "sum_ts"},
        maxs={"unix_timestamp(timestamp)": "max_ts"},
        distinct_entity="user_id",
    )
    return src, wh, ckpt, mv


def _write_batch(src, fname, start, n, platform="web"):
    lines = []
    for i in range(start, start + n):
        ev = _envelope(i, "login", 1_700_000_000 + i)
        ev["platform"] = platform
        lines.append(json.dumps({"subject": "events.login", "payload": json.dumps(ev)}))
    with open(src / fname, "w") as f:
        f.write("\n".join(lines))


def test_matview_tracks_ingest_batches(spark, mv_setup):
    src, wh, ckpt, mv = mv_setup
    _write_batch(src, "b1.json", 0, 6, "web")
    _write_batch(src, "b2.json", 100, 4, "ios")
    q = start_ingest(
        spark, str(src), wh, ckpt,
        max_files_per_trigger=1,  # two separate micro-batches
        views={"login_events": [mv]},
    )
    q.processAllAvailable()
    q.stop()

    raw = spark.read.parquet(f"{wh}/login_events")
    expect = {
        (r["platform"]): (r["n"], r["d"])
        for r in raw.groupBy("platform")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("d"))
        .collect()
    }
    got = {
        r["platform"]: (r["n_rows"], r["est_distinct"])
        for r in mv.read().collect()
    }
    # small cardinalities: HLL estimate is exact
    assert got == expect
    # merge to the empty grouping (global) also works from states
    total = mv.read(keys=[]).collect()[0]
    assert total["n_rows"] == 10
    # sum/max states merged correctly vs direct aggregation
    direct = raw.agg(
        F.sum(F.unix_timestamp("timestamp")).alias("s"),
        F.max(F.unix_timestamp("timestamp")).alias("m"),
    ).collect()[0]
    assert total["sum_ts"] == direct["s"]
    assert total["max_ts"] == direct["m"]


def test_matview_compact_is_lossless(spark, mv_setup):
    src, wh, ckpt, mv = mv_setup
    _write_batch(src, "b1.json", 0, 5, "web")
    _write_batch(src, "b2.json", 50, 5, "web")
    _write_batch(src, "b3.json", 100, 5, "android")
    q = start_ingest(
        spark, str(src), wh, ckpt,
        max_files_per_trigger=1,
        views={"login_events": [mv]},
    )
    q.processAllAvailable()
    q.stop()

    before = {tuple(r) for r in mv.read().collect()}
    n_state_rows = spark.read.parquet(mv.dest_path).count()
    assert n_state_rows >= 3  # one partial row per (batch, platform)
    n_after = mv.compact()
    assert n_after == 2  # one row per platform
    assert {tuple(r) for r in mv.read().collect()} == before
    # states remain mergeable after compaction: append another batch
    mv.on_batch(spark.read.parquet(f"{wh}/login_events"))
    assert mv.read(keys=[]).collect()[0]["n_rows"] == 30
