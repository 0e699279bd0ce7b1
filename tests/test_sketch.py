"""Count-min sketch bounds: never undercounts; overcount stays within
the eps*N guarantee with margin."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.sketch import cm_build, cm_query
from ed_clickhouse_spark.operators.text import tokens
from ed_clickhouse_spark.suite._util import t


def test_cm_sketch_bounds(spark, sf_dir):
    tok = t(spark, sf_dir, "documents").select(F.explode(tokens("text")).alias("token"))
    n_total = tok.count()
    width, depth = 2048, 4
    sketch = cm_build(tok, "token", width, depth).cache()
    assert sketch.count() <= width * depth
    truth = tok.groupBy("token").agg(F.count("*").alias("true_count"))
    est = cm_query(sketch, truth.select("token"), "token", width, depth)
    joined = est.join(truth, "token").collect()
    eps_n = (2.718 / width) * n_total
    for r in joined:
        assert r["est_count"] >= r["true_count"], r  # one-sided: never under
        assert r["est_count"] - r["true_count"] <= 3 * eps_n, r


def test_cm_sketch_unknown_key_small(spark):
    df = spark.createDataFrame([("a",)] * 100 + [("b",)] * 5, "k string")
    sk = cm_build(df, "k", width=1024, depth=4)
    q = spark.createDataFrame([("a",), ("b",), ("never-seen",)], "k string")
    got = {r["k"]: r["est_count"] for r in cm_query(sk, q, "k", 1024, 4).collect()}
    assert got["a"] >= 100 and got["b"] >= 5
    # with 2 distinct keys in 1024 buckets, collisions are ~impossible:
    assert got["a"] == 100 and got["b"] == 5 and got["never-seen"] == 0


def test_hll_state_merge_matches_exact_within_error(spark, sf_dir):
    """uniqState/uniqMerge parity: merging per-day states estimates the
    per-type distinct within HLL(lg_k=12) error (<2% typical, assert 5%);
    and merging ALL states matches a direct global sketch exactly."""
    from pyspark.sql import functions as F

    from ed_clickhouse_spark.operators.sketch import hll_merge, hll_state
    from ed_clickhouse_spark.suite._util import t

    e = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = hll_state(e, ["event_type", "day"], "user_id")
    merged = {
        r["event_type"]: r["est_distinct"]
        for r in hll_merge(daily, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(merged) == set(exact)
    for k, n in exact.items():
        assert abs(merged[k] - n) / n < 0.05, (k, merged[k], n)

    # merge-of-states == direct sketch over everything (mergeability)
    all_merged = hll_merge(daily, []).collect()[0]["est_distinct"]
    direct = e.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").alias("d")
    ).collect()[0]["d"]
    assert all_merged == direct


def test_approx_quantiles_within_tolerance(spark, sf_dir):
    """q104 became a tolerance-banded oracle query in r8: its output IS
    the rank audit (n + per-percentile booleans), so this test asserts
    every band holds AND separately pins approx_percentile's value
    error against the exact percentiles (the original tolerance)."""
    from pyspark.sql import functions as F

    from ed_clickhouse_spark.suite import QUERIES
    from ed_clickhouse_spark.suite._util import t

    for r in QUERIES["q104_approx_quantiles"](spark, sf_dir).collect():
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], r
    o = t(spark, sf_dir, "orders")
    both = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("e50"),
            F.expr(
                "approx_percentile(o_totalprice, 0.5, 10000)"
            ).alias("a50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("e90"),
            F.expr(
                "approx_percentile(o_totalprice, 0.9, 10000)"
            ).alias("a90"),
        )
        .collect()
    }
    for k, r in both.items():
        assert abs(r["a50"] - r["e50"]) / r["e50"] < 0.02
        assert abs(r["a90"] - r["e90"]) / r["e90"] < 0.02


def test_hll_set_estimates_overlap(spark):
    from pyspark.sql import functions as F

    from ed_clickhouse_spark.operators.sketch import hll_set_estimates, hll_state

    # A = users 0..599 (click), B = users 400..999 (error): |A∩B| = 200
    rows = spark.createDataFrame(
        [("click", u) for u in range(600)] + [("error", u) for u in range(400, 1000)],
        ["event_type", "user_id"],
    )
    st = hll_state(rows, ["event_type"], "user_id")
    r = hll_set_estimates(st, "event_type", "click", "error").collect()[0]
    assert abs(r["est_a"] - 600) / 600 < 0.05
    assert abs(r["est_b"] - 600) / 600 < 0.05
    assert abs(r["est_union"] - 1000) / 1000 < 0.05
    # inclusion-exclusion intersection: looser bound (errors compound)
    assert abs(r["est_intersect"] - 200) / 200 < 0.25


def test_streaming_topk_heavy_hitters(spark, tmp_path):
    """Three skewed micro-batches: the maintained state finds the true
    heavy hitters with one-sided estimates, answers from state only,
    and compaction is lossless."""
    from ed_clickhouse_spark.streaming.topk import StreamingTopK

    st = StreamingTopK(
        spark, str(tmp_path / "hh"), "tok", width=512, depth=4, m_candidates=10
    )
    true = {}
    for b in range(3):
        rows = []
        for i in range(40):
            tok = f"t{i}"
            # heavy keys t0/t1/t2 in every batch; t3 heavy in batch 2 only
            n = 50 if i < 3 else (60 if (i == 3 and b == 2) else 1 + (i + b) % 3)
            rows += [(tok,)] * n
            true[tok] = true.get(tok, 0) + n
        st.on_batch(spark.createDataFrame(rows, ["tok"]))

    got = {r["tok"]: r["est_count"] for r in st.topk(4).collect()}
    # the genuinely heavy keys are found
    assert set(got) == {"t0", "t1", "t2", "t3"}
    # CMS one-sided bound: never undercounts
    for tok, est in got.items():
        assert est >= true[tok]
    # compaction: bounded state, identical answers
    n_rows = st.compact()
    assert n_rows <= 512 * 4
    assert {r["tok"]: r["est_count"] for r in st.topk(4).collect()} == got
