"""Tests for ClickHouse-dialect aliases and multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ed_clickhouse_spark.functions.clickhouse import (
    argMax,
    countIf,
    has,
    multiIf,
    register_sql_aliases,
    sumIf,
    uniq,
)
from ed_clickhouse_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_decode,
    frame_sample_plan,
)


def test_python_aliases(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 5.0)], "k int, s string, v double"
    )
    row = df.groupBy("k").agg(
        countIf(F.col("s") == "a").alias("n_a"),
        sumIf("v", F.col("s") == "a").alias("v_a"),
        argMax("s", "v").alias("top_s"),
        uniq("s").alias("u"),
    ).filter(F.col("k") == 1).collect()[0]
    assert row["n_a"] == 1 and row["v_a"] == 10.0 and row["top_s"] == "b"


def test_multiif_and_has(spark):
    df = spark.createDataFrame([(5, ["x", "y"])], "v int, arr array<string>")
    r = df.select(
        multiIf(F.col("v") < 3, "lo", F.col("v") < 10, "mid", "hi").alias("band"),
        has("arr", "y").alias("h"),
    ).collect()[0]
    assert r["band"] == "mid" and r["h"] is True


def test_sql_alias_registration(spark):
    names = register_sql_aliases(spark)
    assert "toStartOfDay" in names and "JSONExtractString" in names
    got = spark.sql(
        "SELECT toStartOfDay(TIMESTAMP '2024-05-06 13:44:55') AS d,"
        "       JSONExtractString('{\"k\": \"v\"}', 'k') AS j,"
        "       intDiv(7, 2) AS q, hasAll(array('a','b','c'), array('a','c')) AS ha"
    ).collect()[0]
    assert str(got["d"]) == "2024-05-06 00:00:00"
    assert got["j"] == "v" and got["q"] == 3 and got["ha"] is True


def test_sql_alias_datetime_string_arith(spark):
    register_sql_aliases(spark)
    got = spark.sql(
        "SELECT toDate(TIMESTAMP '2024-03-05 10:11:12') AS d,"
        "       toStartOfMonth(TIMESTAMP '2024-03-05 10:11:12') AS m,"
        "       toDayOfWeek(TIMESTAMP '2024-03-05 10:11:12') AS dow,"  # Tue -> 2
        "       splitByChar('.', 'a.b.c') AS sp,"  # literal dot, not regex
        "       arrayStringConcat(array('x','y'), '-') AS aj,"
        "       replaceAll('aXbX', 'X', '_') AS rp,"
        "       positionCaseSensitive('hello', 'll') AS pos,"
        "       divide(7.0, 2.0) AS dv"
    ).collect()[0]
    assert str(got["d"]) == "2024-03-05" and str(got["m"]) == "2024-03-01"
    assert got["dow"] == 2 and got["sp"] == ["a", "b", "c"]
    assert got["aj"] == "x-y" and got["rp"] == "a_b_"
    assert got["pos"] == 3 and got["dv"] == 3.5


def _media_df(spark):
    rows = [
        Row(media_id=1, kind="image", mime="image/png", bytes=bytes(range(100)),
            meta=Row(width=10, height=10, duration_ms=None)),
        Row(media_id=2, kind="video", mime="video/mp4", bytes=b"\x00\x01\x02",
            meta=Row(width=640, height=480, duration_ms=3500)),
        Row(media_id=3, kind="image", mime="image/jpeg", bytes=None,
            meta=Row(width=None, height=None, duration_ms=None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_stub(spark):
    out = {r["media_id"]: r for r in extract_features(_media_df(spark)).collect()}
    assert out[1]["n_bytes"] == 100
    assert out[1]["feat"] == fake_decode(bytes(range(100)))
    assert len(out[1]["feat"]) == 8
    assert out[3]["feat"] is None  # null payload stays null, no crash


def test_frame_sample_plan(spark):
    out = frame_sample_plan(_media_df(spark), every_ms=1000).collect()
    assert sorted(r["sample_ms"] for r in out) == [0, 1000, 2000, 3000]


def test_extract_features_restores_arrow_batch_conf(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    extract_features(_media_df(spark), arrow_batch_rows=16).collect()
    assert spark.conf.get(key) == prev


def test_sql_alias_extended_surface(spark):
    """The round-3 spelling additions: date arithmetic, dateDiff units,
    string predicates/casts, array utilities."""
    register_sql_aliases(spark)
    got = spark.sql(
        "SELECT toQuarter(TIMESTAMP '2024-05-06 13:44:55') AS q,"
        "       toStartOfQuarter(TIMESTAMP '2024-05-06 13:44:55') AS sq,"
        "       addDays(TIMESTAMP '2024-02-28 12:00:00', 2) AS ad,"
        "       formatDateTime(TIMESTAMP '2024-05-06 13:44:55', 'yyyy/MM') AS fd,"
        # CH spellings that are Spark builtins already (case-insensitive):
        "       startsWith('clickhouse', 'click') AS sw,"
        "       endsWith('clickhouse', 'house') AS ew,"
        "       extractAll('a1b22c333', '[0-9]+') AS ea,"
        "       toInt64OrNull('nope') AS bad_cast,"
        "       toInt64('42') AS ok_cast,"
        "       arraySlice(array('a','b','c','d'), 2, 2) AS sl,"
        "       arrayUniq(array('x','y','x')) AS au,"
        "       indexOf(array('p','q','r'), 'q') AS io"
    ).collect()[0]
    assert got["q"] == 2 and str(got["sq"]) == "2024-04-01"
    assert str(got["ad"]) == "2024-03-01 12:00:00"
    assert got["fd"] == "2024/05"
    assert got["sw"] is True and got["ew"] is True
    assert got["ea"] == ["1", "22", "333"]
    assert got["bad_cast"] is None and got["ok_cast"] == 42
    assert got["sl"] == ["b", "c"] and got["au"] == 2 and got["io"] == 2


def test_sql_alias_array_numeric_surface(spark):
    """arrayDifference/arrayCumSum/arrayEnumerate/arrayCompact spellings."""
    register_sql_aliases(spark)
    got = spark.sql(
        "SELECT arrayDifference(array(3L, 7L, 5L)) AS ad,"
        "       arrayCumSum(array(1L, 2L, 3L)) AS cs,"
        "       arrayEnumerate(array('a','b','c')) AS en,"
        "       arrayCompact(array('a','a','b','a','a')) AS cp"
    ).collect()[0]
    assert got["ad"] == [0, 4, -2]
    assert got["cs"] == [1, 3, 6]
    assert got["en"] == [1, 2, 3]
    assert got["cp"] == ["a", "b", "a"]


def test_max_intersections_unit(spark):
    from ed_clickhouse_spark.operators.windows import max_intersections

    rows = [
        (1, 0, 10), (1, 5, 15), (1, 9, 12),   # three open at t=9
        (1, 20, 21),
        (2, 0, 5), (2, 5, 10),                # half-open: no overlap at t=5
    ]
    df = spark.createDataFrame(rows, ["g", "s", "e"])
    got = {r["g"]: r["max_concurrent"]
           for r in max_intersections(df, ["g"], "s", "e").collect()}
    assert got == {1: 3, 2: 1}


def test_geo_and_array_intersect_aliases(spark):
    register_sql_aliases(spark)
    got = spark.sql(
        "SELECT greatCircleDistance(-86.5813, 34.73, -86.52, 34.72) AS d,"
        "       arrayIntersect(array('a','b','c'), array('c','a','x')) AS ai"
    ).collect()[0]
    # ClickHouse documents this pair at ~5 km
    assert abs(got["d"] - 5700) < 300
    assert got["ai"] == ["a", "c"]


def test_sql_alias_array_folds_and_calendar(spark):
    register_sql_aliases(spark)
    r = spark.sql(
        "SELECT arraySum(array(1.0d, 2.0d, 3.5d)) s,"
        "       arrayAvg(array(2.0d, 4.0d)) a,"
        "       arrayProduct(array(2.0d, 3.0d)) p,"
        "       arrayMax(array(5.0d, 1.0d)) hi,"
        "       toYYYYMMDD(TIMESTAMP '2024-03-05 10:00:00') ymd,"
        "       addMonths(TIMESTAMP '2024-01-31 00:00:00', 1) am,"
        "       today() >= yesterday() ok"
    ).first()
    assert (r["s"], r["a"], r["p"], r["hi"]) == (6.5, 3.0, 6.0, 5.0)
    assert r["ymd"] == 20240305
    assert str(r["am"]).startswith("2024-02-29")  # month-end clamp, leap year
    assert r["ok"]


def test_sql_alias_json_siblings(spark):
    register_sql_aliases(spark)
    j = '{"a": 3, "b": 1.5, "c": true, "d": "x"}'
    r = spark.sql(
        f"SELECT JSONExtractInt('{j}', 'a') i, JSONExtractFloat('{j}', 'b') f,"
        f"       JSONExtractBool('{j}', 'c') bo, JSONExtractRaw('{j}', 'd') raw,"
        f"       JSONHas('{j}', 'a') has_a, JSONHas('{j}', 'z') has_z,"
        f"       JSONLength('{j}') n,"
        f"       formatReadableSize(1536.0d) kib, formatReadableSize(10.0d) b"
    ).first()
    assert (r["i"], r["f"], r["bo"], r["raw"]) == (3, 1.5, True, "x")
    assert r["has_a"] and not r["has_z"] and r["n"] == 4
    assert r["kib"] == "1.5 KiB" and r["b"] == "10 B"


def test_sql_alias_array_jaccard(spark):
    register_sql_aliases(spark)
    r = spark.sql(
        "SELECT arrayJaccardIndex(array('a','b','c'), array('b','c','d')) j,"
        "       arrayJaccardIndex(array('a'), array('a')) full"
    ).first()
    assert abs(r["j"] - 0.5) < 1e-9 and r["full"] == 1.0


def test_sql_alias_vector_distance_family(spark):
    """dotProduct / L1 / L2 / cosineDistance spellings fold JVM-side."""
    register_sql_aliases(spark)
    r = spark.sql(
        "SELECT dotProduct(array(1D,2D,3D), array(4D,5D,6D)) AS dp,"
        "       L1Distance(array(1D,2D), array(4D,6D)) AS l1,"
        "       L2Distance(array(0D,0D), array(3D,4D)) AS l2,"
        "       L2Norm(array(3D,4D)) AS n,"
        "       ROUND(cosineDistance(array(1D,0D), array(1D,0D)), 9) AS cd_same,"
        "       ROUND(cosineDistance(array(1D,0D), array(0D,1D)), 9) AS cd_orth"
    ).collect()[0]
    assert (r["dp"], r["l1"], r["l2"], r["n"]) == (32.0, 7.0, 5.0, 5.0)
    assert (r["cd_same"], r["cd_orth"]) == (0.0, 1.0)


def test_sql_alias_datediff_boundary_semantics(spark):
    """ClickHouse dateDiff counts unit-boundary crossings, not elapsed
    units — 23:59 -> 00:01 next day is 1 day, Jan 31 -> Feb 1 is 1 month."""
    register_sql_aliases(spark)
    r = spark.sql(
        "SELECT chDateDiff('day', TIMESTAMP '2024-01-01 23:59:00',"
        "                TIMESTAMP '2024-01-02 00:01:00') AS d,"
        "       chDateDiff('hour', TIMESTAMP '2024-01-01 10:59:00',"
        "                TIMESTAMP '2024-01-01 11:01:00') AS h,"
        "       chDateDiff('month', TIMESTAMP '2024-01-31 00:00:00',"
        "                TIMESTAMP '2024-02-01 00:00:00') AS m,"
        "       chDateDiff('year', TIMESTAMP '2023-12-31 23:59:59',"
        "                TIMESTAMP '2024-01-01 00:00:00') AS y"
    ).collect()[0]
    assert (r["d"], r["h"], r["m"], r["y"]) == (1, 1, 1, 1)


def test_sql_alias_array_membership_and_edits(spark):
    register_sql_aliases(spark)
    r = spark.sql(
        "SELECT has(array('a','b'), 'b') AS h,"
        "       hasAny(array('a','b'), array('x','b')) AS ha,"
        "       arrayPushBack(array('a'), 'b') AS pb,"
        "       arrayPopFront(array('a','b','c')) AS pf,"
        "       arrayPopBack(array('a')) AS empty_ok,"
        "       startswith('clickhouse', 'click') AS sw"
    ).collect()[0]
    assert r["h"] and r["ha"] and r["sw"]
    assert r["pb"] == ["a", "b"] and r["pf"] == ["b", "c"] and r["empty_ok"] == []


def test_dialect_rewrites_datediff_spelling(spark):
    """The ClickHouse camelCase dateDiff('unit', a, b) spelling reaches
    chDateDiff through the dialect translator (Spark's own 2-arg
    datediff stays untouched)."""
    from ed_clickhouse_spark.chsql import translate

    register_sql_aliases(spark)
    tr = translate(
        "SELECT dateDiff('day', TIMESTAMP '2024-01-01 23:59:00', "
        "TIMESTAMP '2024-01-02 00:01:00') AS d"
    )
    assert "chDateDiff(" in tr.sql and "dateDiff('day'" not in tr.sql
    assert spark.sql(tr.sql).collect()[0]["d"] == 1
    # lowercase Spark builtin untouched
    assert "datediff(" in translate("SELECT datediff(a, b) FROM t").sql


def test_sql_alias_geohash(spark):
    """geohashEncode/Decode — pure codegen interleaved bisection, pinned
    to the public test vectors; decode returns the cell center so a
    round-trip stays inside the cell."""
    register_sql_aliases(spark)
    r = spark.sql(
        "SELECT geohashEncode(-5.60302734375D, 42.60498046875D, 5) AS a,"
        "       geohashEncode(10.40744D, 57.64911D, 11) AS b,"
        "       geohashDecode('ezs42') AS da,"
        "       geohashDecode('u4pruydqqvj') AS db"
    ).collect()[0]
    assert r["a"] == "ezs42" and r["b"] == "u4pruydqqvj"
    assert r["da"] == [-5.60302734375, 42.60498046875]  # exact cell center
    assert abs(r["db"][0] - 10.40744) < 1e-4 and abs(r["db"][1] - 57.64911) < 1e-4
    # bucketing usage survives a round trip: re-encoding the decoded
    # center reproduces the geohash
    r2 = spark.sql(
        "SELECT geohashEncode(geohashDecode('ezs42')[0], geohashDecode('ezs42')[1], 5) AS g"
    ).collect()[0]
    assert r2["g"] == "ezs42"


def _bmp_bytes(width, height, pixels):
    """Minimal 24-bit BI_RGB BMP (bottom-up rows, 4-byte padded) from a
    row-major [(r,g,b), ...] pixel list — pure struct packing, no
    imaging library."""
    import struct

    stride = (width * 3 + 3) & ~3
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - len(row))
        body += row
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return bytes(hdr + dib + body)


def _ppm_bytes(width, height, pixels):
    body = b"".join(bytes(p) for p in pixels)
    return f"P6\n{width} {height}\n255\n".encode() + body


def test_decode_image_bmp_ppm_pixel_exact():
    """The built-in pure-Python codec round-trips pixels exactly for
    24-bit BMP (incl. row padding and bottom-up flip) and P6 PPM, and
    still refuses compressed formats loudly."""
    import pytest as _pytest

    from ed_clickhouse_spark.operators.multimodal import decode_image

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
          (10, 20, 30), (40, 50, 60), (70, 80, 90)]
    for payload in (_bmp_bytes(3, 2, px), _ppm_bytes(3, 2, px)):
        w, h, rgb = decode_image(payload)
        assert (w, h) == (3, 2)
        got = [(rgb[i], rgb[i + 1], rgb[i + 2]) for i in range(0, 18, 3)]
        assert got == px
    with _pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_extract_features_real_codec_end_to_end(spark):
    """bytes -> pixels -> features through the Spark plumbing with the
    REAL built-in codec (no injected fake): a solid red BMP and a solid
    gray PPM produce the exact channel means."""
    from ed_clickhouse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        image_features,
    )

    red = _bmp_bytes(4, 3, [(255, 0, 0)] * 12)
    gray = _ppm_bytes(2, 2, [(128, 128, 128)] * 4)
    rows = [
        (1, "image", "image/bmp", bytearray(red), (4, 3, None)),
        (2, "image", "image/x-portable-pixmap", bytearray(gray), (2, 2, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r["feat"]
        for r in extract_features(media, decoder=image_features).collect()
    }
    assert out[1][:5] == [4.0, 3.0, 1.0, 0.0, 0.0]
    assert out[2][0:2] == [2.0, 2.0]
    assert abs(out[2][2] - 128 / 255) < 1e-9
    assert out[1] == image_features(red)  # UDF path == direct call
