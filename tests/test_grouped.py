"""Tests for grouped-map Pandas operators (B10) + Engine.rollup."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.grouped import resample_fill_per_group, zscore_per_group


def test_zscore_matches_window_formula(spark, sf_dir):
    from ed_clickhouse_spark.suite._util import t

    e = t(spark, sf_dir, "events").select(
        "user_id", F.col("value").cast("double").alias("value")
    )
    got = zscore_per_group(e, ["user_id"], "value")
    # cross-check against the pure-SQL window formula (sample stddev)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id")
    expected = e.withColumn(
        "zscore",
        (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w),
    )
    g = {(r["user_id"], r["value"]): r["zscore"] for r in got.collect()}
    x = {(r["user_id"], r["value"]): r["zscore"] for r in expected.collect()}
    assert set(g) == set(x)
    for k in g:
        assert abs(g[k] - x[k]) < 1e-9, k


def test_resample_ffill(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10.0),
        (1, "2024-01-01 00:02:00", 30.0),  # 1-minute gap at 00:01 -> ffill 10
        (2, "2024-01-01 05:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = resample_fill_per_group(df, ["user_id"], "ts", "value", 60)
    got = {
        (r["user_id"], str(r["ts"])): r["value"] for r in out.collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == 10.0
    assert got[(1, "2024-01-01 00:01:00")] == 10.0  # forward-filled
    assert got[(1, "2024-01-01 00:02:00")] == 30.0
    assert got[(2, "2024-01-01 05:00:00")] == 7.0


def test_engine_rollup(spark, tmp_path):
    from ed_clickhouse_spark.engine import Engine

    wh = str(tmp_path / "wh")
    src = tmp_path / "src"
    src.mkdir()
    eng = Engine(warehouse=wh, spark=spark)
    eng.init()
    ev = {"event_id": "e1", "event_name": "login", "user_id": "u1",
          "session_id": "s", "anonymous_id": "a", "timestamp": 1700000000,
          "service_origin": "t", "platform": "web", "platform_version": "1",
          "os_name": "l", "os_version": "6", "browser_name": "ff",
          "browser_version": "1", "device_type": "d",
          "screen_resolution": "1x1", "user_agent": "ua"}
    with open(src / "f.json", "w") as f:
        f.write(json.dumps({"subject": "events.login", "payload": json.dumps(ev)}))
    q = eng.ingest(str(src))
    q.processAllAvailable()
    q.stop()
    ru = eng.rollup("login_events", "login_daily", dims=["platform"],
                    aggs={"n": "count(*)"})
    assert ru.refresh() == ["2023-11-14"]
    assert ru.read().collect()[0]["n"] == 1
