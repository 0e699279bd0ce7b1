"""End-to-end protobuf wire-format tests: hand-encoded descriptor set +
messages -> from_protobuf decode -> typed rows (the reference's actual
INSERT FORMAT Protobuf path, reference src/click_house.rs:75-78)."""

from __future__ import annotations

import pytest

from ed_clickhouse_spark.sources.decode import decode_protobuf
from ed_clickhouse_spark.sources.protodesc import build_descriptor_set, encode_event
from ed_clickhouse_spark.sources.registry import BY_SUBJECT

pytest.importorskip("pyspark.sql.protobuf")


@pytest.fixture(scope="module")
def desc_file(tmp_path_factory):
    return build_descriptor_set(str(tmp_path_factory.mktemp("desc") / "dto.desc"))


def _env(i: int) -> dict:
    return {
        "event_id": f"ev-{i}", "event_name": "item", "user_id": "u1",
        "session_id": "s1", "anonymous_id": "a1", "timestamp": 1_700_000_000 + i,
        "service_origin": "svc", "platform": "web", "platform_version": "1",
        "os_name": "linux", "os_version": "6", "browser_name": "ff",
        "browser_version": "120", "device_type": "desktop",
        "screen_resolution": "1x1", "user_agent": "ua",
    }


def test_protobuf_roundtrip_arrays_bools_ints(spark, desc_file):
    fam = BY_SUBJECT["events.shahrefarang.item"]
    ev = _env(1)
    ev.update({"item_id": "it9", "age_rating": 16, "is_dubbed": True,
               "is_exclusive": False, "has_subtitle": True,
               "genres": ["drama", "comedy"], "labels": [],
               "languages": ["fa", "en"], "categories": ["movie"],
               "reach_method": "search"})
    payload = encode_event(fam, ev)
    df = spark.createDataFrame([(payload,)], "payload binary")
    row = decode_protobuf(df, fam, desc_file).collect()[0]
    assert row["event_id"] == "ev-1"
    assert row["item_id"] == "it9"
    assert row["age_rating"] == 16
    assert row["is_dubbed"] is True and row["is_exclusive"] is False
    assert row["genres"] == ["drama", "comedy"]
    assert row["languages"] == ["fa", "en"]
    assert str(row["timestamp"]).startswith("2023-11-14")
    assert row["_corrupt"] is False


def test_protobuf_negative_int_roundtrip(spark, desc_file):
    # regression: negative varints hung the encoder and mis-decoded as 2^64-v
    fam = BY_SUBJECT["events.angulak.watch"]
    ev = _env(5)
    ev.update({"video_position": -1, "season_number": -42})
    payload = encode_event(fam, ev)
    row = decode_protobuf(
        spark.createDataFrame([(payload,)], "payload binary"), fam, desc_file
    ).collect()[0]
    assert row["video_position"] == -1
    assert row["season_number"] == -42


def test_protobuf_corrupt_payload_flagged(spark, desc_file):
    fam = BY_SUBJECT["events.login"]
    good = encode_event(fam, _env(2))
    junk = b"\xff\xff\xff\xff\xff"
    df = spark.createDataFrame([(good,), (junk,)], "payload binary")
    out = decode_protobuf(df, fam, desc_file)
    flags = {r["event_id"]: r["_corrupt"] for r in out.collect()}
    assert flags.get("ev-2") is False
    assert flags.get(None) is True  # junk decoded to null struct -> DLQ path
