"""Unit tests for engine operators (joins, windows) on tiny in-memory
DataFrames — semantics pinned against hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
    salted_join,
    topk_per_group,
)
from ed_clickhouse_spark.operators.windows import funnel, sessionize


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "p1"), (1, ts("2024-01-01 12:00:00"), "p2"),
         (2, ts("2024-01-01 09:00:00"), "p3")],
        "user_id int, lts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:30:00"), "v1"), (1, ts("2024-01-01 11:00:00"), "v2"),
         (2, ts("2024-01-01 09:30:00"), "v_late")],
        "user_id int, rts timestamp, vid string",
    )
    out = asof_join(
        left, right, on=["user_id"], left_ts="lts", right_ts="rts",
        right_cols=["rts", "vid"],
    )
    got = {r["pid"]: r["vid"] for r in out.collect()}
    # p1 at 10:00 sees v1 (09:30); p2 at 12:00 sees v2 (11:00);
    # p3 at 09:00 predates all user-2 views -> null
    assert got == {"p1": "v1", "p2": "v2", "p3": None}


def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"))], "k int, lts timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "same")], "k int, rts timestamp, v string"
    )
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["v"])
    assert out.collect()[0]["v"] == "same"  # >= semantics, like DuckDB ASOF


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 08:00:00")), (1, ts("2024-01-01 11:00:00"))],
        "k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "x")], "k int, rts timestamp, v string"
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["v"], how="inner"
    )
    assert out.count() == 1


def test_asof_join_null_right_column_no_stitching(spark):
    # the matched right row's null column must stay null — not be filled
    # from an OLDER right row (regression: per-column carry-forward)
    left = spark.createDataFrame([(1, ts("2024-01-01 12:00:00"))], "k int, lts timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "a1", "b1"),
         (1, ts("2024-01-01 11:00:00"), None, "b2")],
        "k int, rts timestamp, a string, b string",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["a", "b"]
    ).collect()[0]
    assert out["b"] == "b2"
    assert out["a"] is None  # NOT "a1" — that row lost the as-of race


def test_asof_join_inner_keeps_match_with_null_first_col(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 12:00:00"))], "k int, lts timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 11:00:00"), None, "b")], "k int, rts timestamp, a string, b string"
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["a", "b"], how="inner",
    )
    assert out.count() == 1  # a match whose first col is null is still a match


def test_salted_join_rejects_outer(spark):
    import pytest

    df = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError, match="inner/left only"):
        salted_join(df, df, "k", how="full")


def test_range_join_bucketed_equals_naive(spark):
    left = spark.createDataFrame(
        [(i, ts(f"2024-01-01 {h:02d}:30:00")) for i, h in enumerate([0, 3, 7, 12, 23])],
        "lid int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(100, ts("2024-01-01 00:00:00"), ts("2024-01-01 04:00:00")),
         (200, ts("2024-01-01 06:00:00"), ts("2024-01-01 06:59:00")),
         (300, ts("2024-01-01 11:00:00"), ts("2024-01-02 00:00:00"))],
        "rid int, lo timestamp, hi timestamp",
    )
    naive = left.join(
        right, (F.col("lts") >= F.col("lo")) & (F.col("lts") <= F.col("hi"))
    ).select("lid", "rid")
    bucketed = range_join_bucketed(left, right, "lts", "lo", "hi", 3600).select("lid", "rid")
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, bucketed.collect()))


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "grp string, id int, v double",
    )
    out = topk_per_group(df, ["grp"], [F.col("v").desc(), F.col("id")], 2)
    got = sorted((r["grp"], r["id"]) for r in out.collect())
    assert got == [("a", 2), ("a", 3), ("b", 4)]


def test_sessionize_gap(spark):
    rows = [
        (1, ts("2024-01-01 10:00:00")),
        (1, ts("2024-01-01 10:10:00")),   # same session (gap 10m)
        (1, ts("2024-01-01 11:30:00")),   # new session (gap 80m > 30m)
        (2, ts("2024-01-01 09:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = sessionize(df, "user_id", "ts", 1800)
    per_user = (
        out.groupBy("user_id").agg(F.max("session_seq").alias("n")).collect()
    )
    assert {r["user_id"]: r["n"] for r in per_user} == {1: 2, 2: 1}


def test_funnel_order_matters(spark):
    rows = [
        # user 1: full ordered funnel
        (1, ts("2024-01-01 10:00:00"), "signup"),
        (1, ts("2024-01-01 10:05:00"), "view"),
        (1, ts("2024-01-01 10:10:00"), "purchase"),
        # user 2: purchase BEFORE signup/view -> only step 1+2 count
        (2, ts("2024-01-01 09:00:00"), "purchase"),
        (2, ts("2024-01-01 10:00:00"), "signup"),
        (2, ts("2024-01-01 10:05:00"), "view"),
        # user 3: signup only
        (3, ts("2024-01-01 10:00:00"), "signup"),
        # user 4: no funnel events at all -> absent from output
        (4, ts("2024-01-01 10:00:00"), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    out = funnel(df, "user_id", "ts", "event_type", ["signup", "view", "purchase"])
    got = {r["user_id"]: r["funnel_steps"] for r in out.collect()}
    assert got == {1: 3, 2: 2, 3: 1}


def test_funnel_step_name_with_quote(spark):
    # regression: step names were spliced into an expr string unescaped
    rows = [
        (1, ts("2024-01-01 10:00:00"), "sign'up"),
        (1, ts("2024-01-01 10:05:00"), "buy"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    out = funnel(df, "user_id", "ts", "event_type", ["sign'up", "buy"])
    assert out.collect()[0]["funnel_steps"] == 2


def test_funnel_strictly_after(spark):
    # view at the SAME timestamp as signup does not count (strict >)
    rows = [
        (1, ts("2024-01-01 10:00:00"), "signup"),
        (1, ts("2024-01-01 10:00:00"), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    out = funnel(df, "user_id", "ts", "event_type", ["signup", "view"])
    assert out.collect()[0]["funnel_steps"] == 1


def test_asof_join_tie_deterministic(spark):
    # several right rows share (key, ts): the carried row must be a
    # deterministic function of content, not shuffle order
    left = spark.createDataFrame([(1, 10)], "k int, lts int")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (1, 10, "c")], "k int, rts int, v string"
    )
    got = {
        asof_join(
            left.repartition(n), right.repartition(7 - n),
            on=["k"], left_ts="lts", right_ts="rts", right_cols=["v"],
        ).collect()[0]["v"]
        for n in (1, 2, 3)
    }
    assert len(got) == 1  # same winner regardless of partitioning
    # caller-pinned tiebreak: max v wins
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["v"], tiebreak="v",
    ).collect()[0]
    assert out["v"] == "c"


def test_funnel_window_constraint(spark):
    from ed_clickhouse_spark.operators.windows import funnel as _funnel

    rows = [
        # user 1: completes all 3 steps within the 1-hour window
        (1, ts("2024-01-01 10:00:00"), "signup"),
        (1, ts("2024-01-01 10:10:00"), "view"),
        (1, ts("2024-01-01 10:20:00"), "purchase"),
        # user 2: step 3 lands outside the window -> depth 2
        (2, ts("2024-01-01 10:00:00"), "signup"),
        (2, ts("2024-01-01 10:10:00"), "view"),
        (2, ts("2024-01-01 12:00:00"), "purchase"),
        # user 3: step 2 outside the window -> depth 1
        (3, ts("2024-01-01 10:00:00"), "signup"),
        (3, ts("2024-01-01 11:30:00"), "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    steps = ["signup", "view", "purchase"]
    got = {
        r["user_id"]: r["funnel_steps"]
        for r in _funnel(df, "user_id", "ts", "event_type", steps,
                         window_seconds=3600).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1}
    # without the window, all of user 2's steps count
    unwindowed = {
        r["user_id"]: r["funnel_steps"]
        for r in _funnel(df, "user_id", "ts", "event_type", steps).collect()
    }
    assert unwindowed[2] == 3


def test_retention_flags(spark):
    from ed_clickhouse_spark.operators.windows import retention as _retention

    rows = [
        # user 1: cohort 01-01, back on +1 and +7
        (1, ts("2024-01-01 09:00:00")), (1, ts("2024-01-01 17:00:00")),
        (1, ts("2024-01-02 09:00:00")), (1, ts("2024-01-08 09:00:00")),
        # user 2: cohort 01-03, back on +3 only
        (2, ts("2024-01-03 09:00:00")), (2, ts("2024-01-06 09:00:00")),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {r["user_id"]: r for r in
           _retention(df, "user_id", "ts", offsets=(1, 3, 7)).collect()}
    assert str(got[1]["cohort_date"]) == "2024-01-01"
    assert (got[1]["d1"], got[1]["d3"], got[1]["d7"]) == (True, False, True)
    assert (got[2]["d1"], got[2]["d3"], got[2]["d7"]) == (False, True, False)


def test_sequence_match_subsequence(spark):
    from ed_clickhouse_spark.operators.windows import sequence_match as _sm

    rows = [
        # user 1: a . b . c interleaved with noise -> matched
        (1, ts("2024-01-01 10:00:00"), "a"), (1, ts("2024-01-01 10:01:00"), "x"),
        (1, ts("2024-01-01 10:02:00"), "b"), (1, ts("2024-01-01 10:03:00"), "c"),
        # user 2: c before a,b -> not matched
        (2, ts("2024-01-01 10:00:00"), "c"), (2, ts("2024-01-01 10:01:00"), "a"),
        (2, ts("2024-01-01 10:02:00"), "b"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r["user_id"]: r["matched"]
           for r in _sm(df, "user_id", "ts", "event_type", ["a", "b", "c"]).collect()}
    assert got == {1: True, 2: False}


def test_delta_sum_counter_resets(spark):
    from ed_clickhouse_spark.operators.windows import delta_sum

    # counter 10->15->3->8: positive increments 5 + 5 (reset ignored)
    rows = [(1, i, v) for i, v in enumerate([10.0, 15.0, 3.0, 8.0])]
    rows += [(2, 0, 7.0)]  # single row: no increments
    df = spark.createDataFrame(rows, ["g", "seq", "v"])
    got = {r["g"]: r["delta_sum"] for r in delta_sum(df, ["g"], ["seq"], "v").collect()}
    assert got == {1: 10.0, 2: 0.0}


def test_interval_length_sum_overlaps_once(spark):
    from ed_clickhouse_spark.operators.windows import interval_length_sum

    rows = [
        (1, 0, 10), (1, 5, 15),   # overlap -> union [0,15) = 15
        (1, 20, 25),              # disjoint -> +5
        (1, 21, 23),              # fully contained -> +0
        (2, 0, 1),
    ]
    df = spark.createDataFrame(rows, ["g", "s", "e"])
    got = {r["g"]: r["covered"] for r in interval_length_sum(df, ["g"], "s", "e").collect()}
    assert got == {1: 20, 2: 1}


def test_sum_map_entries(spark):
    from pyspark.sql import functions as F

    from ed_clickhouse_spark.functions.clickhouse import sum_map_entries

    df = spark.createDataFrame(
        [(1, {"a": 1, "b": 2}), (1, {"b": 3, "c": 4}), (2, {"a": 5})],
        "g int, m map<string,int>",
    )
    got = {r["g"]: r["summed"] for r in sum_map_entries(df, ["g"], "m").collect()}
    assert got[1] == {"a": 1, "b": 5, "c": 4}
    assert got[2] == {"a": 5}


def test_uniq_up_to_and_any_last(spark):
    from pyspark.sql import functions as F

    from ed_clickhouse_spark.functions.clickhouse import anyLast, uniqUpTo

    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "z"), (2, "x")], ["g", "v"]
    )
    got = {
        r["g"]: r["u"]
        for r in df.groupBy("g").agg(uniqUpTo(F.col("v"), 2).alias("u")).collect()
    }
    assert got == {1: 3, 2: 1}  # capped at N+1 == 3
    last = (
        df.withColumn("v", F.when(F.col("v") == "z", None).otherwise(F.col("v")))
        .groupBy("g")
        .agg(anyLast(F.col("v")).alias("l"))
        .collect()
    )
    assert all(r["l"] is not None for r in last)


def test_funnel_strict_order(spark):
    from ed_clickhouse_spark.operators.windows import funnel_strict

    rows = [
        # user 1: a,b,c consecutive -> 3
        (1, ts("2024-01-01 10:00:00"), 1, "a"),
        (1, ts("2024-01-01 10:01:00"), 2, "b"),
        (1, ts("2024-01-01 10:02:00"), 3, "c"),
        # user 2: a, noise, b -> chain breaks after a -> 1
        (2, ts("2024-01-01 10:00:00"), 1, "a"),
        (2, ts("2024-01-01 10:01:00"), 2, "x"),
        (2, ts("2024-01-01 10:02:00"), 3, "b"),
        # user 3: no anchor -> 0
        (3, ts("2024-01-01 10:00:00"), 1, "b"),
        # user 4: a,b then noise -> 2
        (4, ts("2024-01-01 10:00:00"), 1, "a"),
        (4, ts("2024-01-01 10:01:00"), 2, "b"),
        (4, ts("2024-01-01 10:02:00"), 3, "x"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {
        r["user_id"]: r["funnel_steps"]
        for r in funnel_strict(
            df, "user_id", "ts", "event_id", "event_type", ["a", "b", "c"]
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 0, 4: 2}


def test_funnel_strict_dedup_interrupts(spark):
    """'strict_deduplication': a repeat of an already-matched condition
    strictly before the next step's candidate stops the chain there."""
    rows = [
        # dup A between B and C -> stops at 2
        ("u1", 0.0, "A"), ("u1", 1.0, "B"), ("u1", 2.0, "A"), ("u1", 3.0, "C"),
        # clean chain -> 3
        ("u2", 0.0, "A"), ("u2", 1.0, "B"), ("u2", 2.0, "C"),
        # dup A before B -> stops at 1
        ("u3", 0.0, "A"), ("u3", 1.0, "A"), ("u3", 2.0, "B"), ("u3", 3.0, "C"),
        # repeat lands exactly ON the candidate ts -> not strictly
        # before, chain continues
        ("u4", 0.0, "A"), ("u4", 1.0, "B"), ("u4", 2.0, "A"),
        ("u4", 2.0, "C"), ("u4", 9.0, "Z"),
    ]
    df = spark.createDataFrame(rows, "user string, ts double, ev string")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    base = {r["user"]: r["funnel_steps"]
            for r in funnel(df, "user", "ts", "ev", ["A", "B", "C"]).collect()}
    dd = {r["user"]: r["funnel_steps"]
          for r in funnel(df, "user", "ts", "ev", ["A", "B", "C"],
                          strict_dedup=True).collect()}
    assert base == {"u1": 3, "u2": 3, "u3": 3, "u4": 3}
    assert dd == {"u1": 2, "u2": 3, "u3": 1, "u4": 3}


def test_sequence_match_times_reanchors(spark):
    """(?t<=10) between A and B: the greedy earliest-A chain misses but a
    later A matches — exact semantics must re-anchor (the case the DP
    exists for)."""
    from ed_clickhouse_spark.operators.windows import sequence_match_times

    rows = [
        ("u1", 0.0, "A"), ("u1", 100.0, "A"), ("u1", 105.0, "B"),
        ("u2", 0.0, "A"), ("u2", 50.0, "B"),
        ("u3", 0.0, "B"), ("u3", 5.0, "A"),  # wrong order
    ]
    df = spark.createDataFrame(rows, "user string, ts double, ev string")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    got = {r["user"]: r["matched"]
           for r in sequence_match_times(
               df, "user", "ts", "ev", ["A", "B"], [("<=", 10)]
           ).collect()}
    assert got == {"u1": True, "u2": False, "u3": False}


def test_sequence_match_times_lower_bound(spark):
    """(?t>n) lower-bound gaps work too (ClickHouse supports all four
    comparison ops in (?t...))."""
    from ed_clickhouse_spark.operators.windows import sequence_match_times

    rows = [("u1", 0.0, "A"), ("u1", 5.0, "B"), ("u2", 0.0, "A"), ("u2", 50.0, "B")]
    df = spark.createDataFrame(rows, "user string, ts double, ev string")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    got = {r["user"]: r["matched"]
           for r in sequence_match_times(
               df, "user", "ts", "ev", ["A", "B"], [(">", 10)]
           ).collect()}
    assert got == {"u1": False, "u2": True}


def test_rrf_fuse_contributions_and_ties(spark):
    from ed_clickhouse_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    sem = spark.createDataFrame([(2, 1), (4, 2)], ["doc_id", "rank"])
    got = {r["doc_id"]: r for r in rrf_fuse([lex, sem], k=10, rrf_k=60).collect()}
    # doc 2 is in both lists: 1/62 + 1/61
    assert abs(got[2]["rrf"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    # doc 4 only semantic: 1/62 ; doc 1 only lexical: 1/61
    assert abs(got[4]["rrf"] - round(1 / 62, 6)) < 1e-9
    assert abs(got[1]["rrf"] - round(1 / 61, 6)) < 1e-9
    assert got[2]["rank_1"] == 2 and got[2]["rank_2"] == 1
    assert got[4]["rank_1"] is None
    # fused order: doc 2 (both) first
    order = [r["doc_id"] for r in rrf_fuse([lex, sem], k=10).collect()]
    assert order[0] == 2


def test_bm25_topk_empty_terms(spark):
    """An empty (or all-duplicate-collapsed-to-empty) query term list
    returns an empty, correctly-typed top-k instead of crashing the
    pivoted path (ADVICE r11: contribs[0] IndexError)."""
    from ed_clickhouse_spark.operators.search import bm25_topk

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    out = bm25_topk(df, [], k=5)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["doc_id", "bm25", "n_terms_hit"]
    assert dict(out.dtypes) == {
        "doc_id": "bigint", "bm25": "double", "n_terms_hit": "bigint"
    }


def test_time_decayed_recurrence_matches_sql_rewrite(spark):
    """The O(rows) applyInPandas recurrence (operators/windows.py:
    time_decayed — the 100 TB path) must agree with the chsql window
    rewrite (exact frame fold) on random data: two independent
    implementations cross-validating each other."""
    import random

    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.operators.windows import time_decayed

    rng = random.Random(77)
    rows = []
    base = 1_700_000_000
    for u in ("a", "b", "c"):
        t = base
        for _ in range(rng.randint(1, 25)):
            t += rng.randint(1, 5000)
            rows.append((u, float(t), rng.uniform(-5, 20)))
    df = spark.createDataFrame(rows, "u string, tsec double, v double").selectExpr(
        "u", "CAST(tsec AS TIMESTAMP) AS ts", "v"
    )
    df.createOrReplaceTempView("__td")
    want = {
        (r["u"], str(r["ts"])): (r["s"], r["c"], r["m"], r["a"])
        for r in spark.sql(
            translate(
                "SELECT u, ts,"
                " exponentialTimeDecayedSum(600)(v, ts) OVER w AS s,"
                " exponentialTimeDecayedCount(600)(ts) OVER w AS c,"
                " exponentialTimeDecayedMax(600)(v, ts) OVER w AS m,"
                " exponentialTimeDecayedAvg(600)(v, ts) OVER w AS a"
                " FROM __td WINDOW w AS (PARTITION BY u ORDER BY ts"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            ).sql
        ).collect()
    }
    got = time_decayed(df, ["u"], "ts", "v", 600).collect()
    assert len(got) == len(want)
    for r in got:
        w = want[(r["u"], str(r["ts"]))]
        assert r["decayed_sum"] == pytest.approx(w[0], rel=1e-9)
        assert r["decayed_count"] == pytest.approx(w[1], rel=1e-9)
        assert r["decayed_max"] == pytest.approx(w[2], rel=1e-9)
        assert r["decayed_avg"] == pytest.approx(w[3], rel=1e-9)


def test_time_decayed_survives_epoch_scale_spans(spark):
    """Decades-long spans with a tiny decay length: the rescaled
    recurrence must neither overflow nor NaN — old mass underflows to
    exactly the weights' own 0, and the newest event dominates."""
    from ed_clickhouse_spark.operators.windows import time_decayed

    rows = [
        ("u", 0.0, 7.0),
        ("u", 1.0e9, 3.0),  # ~31 years later, decay length 10 s
        ("u", 2.0e9, 5.0),
    ]
    df = spark.createDataFrame(rows, "u string, tsec double, v double").selectExpr(
        "u", "CAST(tsec AS TIMESTAMP) AS ts", "v"
    )
    out = {
        r["tsec"]: r
        for r in time_decayed(df, ["u"], "ts", "v", 10.0)
        .selectExpr("CAST(ts AS DOUBLE) AS tsec", "decayed_sum",
                    "decayed_count", "decayed_max", "decayed_avg")
        .collect()
    }
    assert out[2.0e9]["decayed_sum"] == pytest.approx(5.0)
    assert out[2.0e9]["decayed_count"] == pytest.approx(1.0)
    assert out[2.0e9]["decayed_max"] == pytest.approx(5.0)
    assert out[2.0e9]["decayed_avg"] == pytest.approx(5.0)
    assert out[0.0]["decayed_sum"] == pytest.approx(7.0)
