"""Known-value tests for the statistical aggregates (entropy, Cramér's
V, Welch's t-test)."""

from __future__ import annotations

import math


def test_entropy_known_distributions(spark):
    from ed_clickhouse_spark.operators.stats import entropy

    rows = spark.createDataFrame(
        # group u: uniform over 4 values -> H = ln 4
        [("u", v) for v in ("a", "b", "c", "d")]
        # group k: constant -> H = 0
        + [("k", "x")] * 5,
        ["g", "v"],
    )
    got = {r["g"]: r["entropy"] for r in entropy(rows, "v", ["g"]).collect()}
    assert abs(got["u"] - math.log(4)) < 1e-6
    assert got["k"] == 0.0


def test_cramers_v_extremes(spark):
    from ed_clickhouse_spark.operators.stats import cramers_v

    # perfect dependence: b is a function of a -> V = 1
    dep = spark.createDataFrame(
        [("x", 1), ("x", 1), ("y", 2), ("y", 2), ("z", 3)], ["a", "b"]
    )
    assert cramers_v(dep, "a", "b").collect()[0]["v"] == 1.0
    # independence: every (a, b) cell equally filled -> V = 0
    ind = spark.createDataFrame(
        [(a, b) for a in ("x", "y") for b in (1, 2) for _ in range(3)], ["a", "b"]
    )
    assert cramers_v(ind, "a", "b").collect()[0]["v"] == 0.0


def test_welch_ttest_reference_value(spark):
    from ed_clickhouse_spark.operators.stats import welch_ttest

    # classic textbook shape: clearly separated means, unequal variance
    a = [3.0, 4.0, 5.0, 4.0, 4.0]
    b = [8.0, 10.0, 12.0, 10.0]
    rows = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], ["g", "v"]
    )
    r = welch_ttest(rows, "v", "g", "a", "b").collect()[0]
    assert r["n_a"] == 5 and r["n_b"] == 4
    assert abs(r["mean_a"] - 4.0) < 1e-9
    assert abs(r["mean_b"] - 10.0) < 1e-9
    # numpy/scipy-checked reference: t = (4-10)/sqrt(0.5/5 + 8/3/4)
    expect_t = (4.0 - 10.0) / math.sqrt(0.5 / 5 + (8.0 / 3.0) / 4)
    assert abs(r["t_stat"] - expect_t) < 1e-6
    assert r["t_stat"] < 0  # a < b
    assert r["df"] > 3  # Welch df between min(n)-1 and n_a+n_b-2
