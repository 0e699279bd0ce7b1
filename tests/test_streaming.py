"""Streaming-semantics tests (SURVEY.md §2 B9): tumbling-window
aggregation under readStream with a watermark, late-data drop, and the
streaming twin of the batch session_window query."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_events(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_agg_with_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_events(
        src / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T10:01:00", "user_id": 1, "value": 10.0},
            {"event_id": 2, "ts": "2024-01-01T10:04:00", "user_id": 1, "value": 20.0},
            {"event_id": 3, "ts": "2024-01-01T10:07:00", "user_id": 2, "value": 5.0},
            # advance the watermark far enough to close the 10:00 windows
            {"event_id": 4, "ts": "2024-01-01T11:00:00", "user_id": 2, "value": 1.0},
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .trigger(processingTime="1 second")
        .start()
    )
    q.processAllAvailable()
    # late event: inside an already-closed window, older than the watermark
    _write_events(
        src / "b2.json",
        [{"event_id": 9, "ts": "2024-01-01T10:02:00", "user_id": 9, "value": 99.0}],
    )
    q.processAllAvailable()
    q.stop()
    out = {
        str(r["w"]["start"]): (r["n"], r["v"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    # appended (closed) windows reflect only on-time data; the late row
    # was dropped by the watermark (reference appends any lateness — our
    # ingestion path stays watermark-free; watermarks apply to STATEFUL
    # queries like this one, SURVEY §2 B9)
    assert out.get("2024-01-01 10:00:00") == (2, 30.0)
    assert out.get("2024-01-01 10:05:00") == (1, 5.0)


def test_streaming_dedup_by_event_id(spark, tmp_path):
    """The dedup upgrade the reference can't do (SURVEY §2 B9):
    dropDuplicates on event_id with a watermark suppresses at-least-once
    redeliveries across micro-batches within the watermark horizon."""
    src = tmp_path / "src"
    src.mkdir()
    _write_events(
        src / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 1, "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T10:01:00", "user_id": 1, "value": 2.0},
            {"event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 1, "value": 1.0},
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    # redelivery of event 1 in a LATER micro-batch is also suppressed
    _write_events(
        src / "b2.json",
        [
            {"event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 1, "value": 1.0},
            {"event_id": 3, "ts": "2024-01-01T10:05:00", "user_id": 2, "value": 3.0},
        ],
    )
    q.processAllAvailable()
    q.stop()
    ids = sorted(r["event_id"] for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert ids == [1, 2, 3]


def test_streaming_session_window(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_events(
        src / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 1, "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T10:10:00", "user_id": 1, "value": 1.0},
            {"event_id": 3, "ts": "2024-01-01T12:00:00", "user_id": 1, "value": 1.0},
            {"event_id": 4, "ts": "2024-01-02T00:00:00", "user_id": 2, "value": 1.0},
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    sess = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT user_id, w.start, n FROM sess_out").collect()
    closed = {(r["user_id"], str(r["start"])): r["n"] for r in rows}
    # user 1's first session (10:00+10:10) closed when the 12:00 event
    # advanced the watermark past its end
    assert closed.get((1, "2024-01-01 10:00:00")) == 2
