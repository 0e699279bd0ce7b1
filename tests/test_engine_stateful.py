"""Tests for the Engine facade and the custom stateful streaming op."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from ed_clickhouse_spark.engine import Engine
from ed_clickhouse_spark.streaming.stateful import running_user_totals


def test_engine_init_ingest_query(spark, tmp_path):
    wh = str(tmp_path / "wh")
    src = tmp_path / "src"
    src.mkdir()
    eng = Engine(warehouse=wh, spark=spark)
    eng.init()
    assert eng.ping()
    # all nine tables exist, empty, with their declared schemas
    assert eng.table("login_events").count() == 0
    assert "genres" in eng.table("shahre_farang_item_events").columns

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
    eng.refresh_views()
    got = eng.sql(
        "SELECT toStartOfDay(timestamp) AS d, count(*) AS n FROM login_events GROUP BY 1"
    ).collect()
    assert got[0]["n"] == 1


def test_engine_unknown_table_errors(spark, tmp_path):
    eng = Engine(warehouse=str(tmp_path / "wh2"), spark=spark)
    try:
        eng.table("nope")
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "unknown table" in str(e)


def test_running_user_totals_stateful(spark, tmp_path):
    src = tmp_path / "ssrc"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    with open(src / "b1.json", "w") as f:
        for u, v in [(1, 10.0), (1, 5.0), (2, 1.0)]:
            f.write(json.dumps({"user_id": u, "value": v}) + "\n")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .start()
    )
    q.processAllAvailable()
    # second batch: state carries over across micro-batches
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"user_id": 1, "value": 2.5}) + "\n")
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT user_id, max(n_events) n, max(total_value) v FROM totals GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: (r["n"], r["v"]) for r in rows}
    assert got[1] == (3, 17.5)  # 10 + 5 from batch 1, +2.5 from batch 2
    assert got[2] == (1, 1.0)
